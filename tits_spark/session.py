"""SparkSession factory with the engine's standard configuration.

Arrow execution is mandatory (SURVEY.md §1.3: the reference is
struct-of-arrays/SIMD throughout; our columnar path is Arrow), AQE is on
for skew-join splitting and small-partition coalescing (SURVEY.md §4).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Defaults sized for the sandbox (local[N], 128 GiB). On a real cluster
# these come from spark-submit conf; shuffle partitions should be
# ~2-3x total executor cores, and AQE coalesces the excess at runtime.
_DEFAULTS = {
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    # Arrow batch size for pandas UDFs: large batches amortize the
    # JVM<->Python transfer; per-series kernels want whole groups anyway.
    "spark.sql.execution.arrow.maxRecordsPerBatch": "65536",
    "spark.sql.shuffle.partitions": "32",
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
}


def get_spark(
    app_name: str = "tits_spark",
    cores: int | str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine SparkSession.

    ``cores`` sets local parallelism (int or "*"); defaults to
    $SPARK_GRAFT_CPUS or "*". In cluster mode the master comes from
    spark-submit and this argument is ignored by Spark.
    """
    builder = SparkSession.builder.appName(app_name)
    # cores="inherit" leaves the master to spark-submit (--master
    # local-cluster[...] or a real cluster manager); otherwise default
    # to local[N]
    if cores != "inherit":
        if cores is None:
            cores = os.environ.get("SPARK_GRAFT_CPUS", "*")
        builder = builder.master(f"local[{cores}]")
    conf = dict(_DEFAULTS)
    if shuffle_partitions is not None:
        conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
