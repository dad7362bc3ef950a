"""Supplementary per-phase scaling measurements + hardware probe.

Measures, at local[8] vs local[32] (same box, same input):
  - parquet scan + reduce          (sequential memory access)
  - rollup hash aggregation        (random memory access)
  - per-series kernel ACF (sacf)   (Arrow -> numpy in Python workers)
  - Gorilla block encode           (Python bit-packing in workers)
plus a pure-process numpy probe showing the box's intrinsic scaling
ceiling for scatter vs register-bound workloads.

Appends a markdown table to BENCH/PHASES.md.
"""

from __future__ import annotations

import datetime as dt
import multiprocessing as mp
import pathlib
import sys
import time

import numpy as np

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

INPUT = REPO / ".bench" / "transcripts_1000000"


def _probe_scatter(_):
    rng = np.random.Generator(np.random.PCG64(1))
    idx = rng.integers(0, 20_000_000, 5_000_000)
    tbl = np.zeros(20_000_000, dtype=np.int64)
    for _ in range(3):
        np.add.at(tbl, idx, 1)
    return None


def _probe_alu(_):
    x = 0
    for i in range(10**7):
        x += i * i
    return None


def probe(fn, workers: int) -> float:
    t0 = time.time()
    with mp.Pool(workers) as p:
        p.map(fn, range(workers))
    return (time.time() - t0) / workers  # sec per unit of work


def spark_phases(cores: int) -> dict[str, float]:
    from pyspark.sql import Window, functions as F

    from tits_spark.compression.gorilla import compress_partitions
    from tits_spark.operators.correlate import sacf_by_key
    from tits_spark.operators.rollup import rollup_from_raw
    from tits_spark.session import get_spark

    spark = get_spark(f"phase{cores}", cores=cores, shuffle_partitions=2 * cores,
                      extra_conf={"spark.sql.adaptive.enabled": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    tr = spark.read.parquet(str(INPUT))
    raw = tr.select("conv_id", "ts", F.length("text").cast("double").alias("value"))
    out: dict[str, float] = {}

    def best_of2(fn) -> float:
        # warm-up + measure: first pass pays page-cache/codegen costs
        fn()
        t0 = time.time()
        fn()
        return time.time() - t0

    out["scan_reduce"] = best_of2(
        lambda: tr.select(F.sum(F.length("text"))).collect()
    )
    out["rollup_agg"] = best_of2(
        lambda: rollup_from_raw(raw, "conv_id", "ts", "value", "1m")
        .write.format("noop").mode("overwrite").save()
    )

    # kernel phase on the smaller input (UDF-heavy; 1M convs would run long)
    tr_s = spark.read.parquet(str(REPO / ".bench" / "transcripts_100000"))
    t_sec = F.col("ts").cast("timestamp").cast("double")
    wo = Window.partitionBy("conv_id").orderBy("ts")
    gaps = (
        tr_s.select("conv_id", "ts")
        .withColumn("value", t_sec - F.lag(t_sec).over(wo))
        .filter(F.col("value").isNotNull())
        .select(F.col("conv_id").alias("key"), "ts", "value")
    )
    out["kernel_sacf"] = best_of2(
        lambda: sacf_by_key(gaps, nlags=8, tau=60.0, min_points=16)
        .write.format("noop").mode("overwrite").save()
    )

    raw_s = tr_s.select(F.col("conv_id").alias("key"), "ts", F.length("text").cast("double").alias("value"))
    out["gorilla_encode"] = best_of2(
        lambda: compress_partitions(raw_s).write.format("noop").mode("overwrite").save()
    )

    spark.stop()
    return out


def main() -> None:
    lo = spark_phases(8)
    hi = spark_phases(32)

    p_scatter_8 = probe(_probe_scatter, 8)
    p_scatter_32 = probe(_probe_scatter, 32)
    p_alu_8 = probe(_probe_alu, 8)
    p_alu_32 = probe(_probe_alu, 32)

    rows = []
    for k in lo:
        eff = lo[k] / hi[k] / 4
        rows.append(f"| {k} | {lo[k]:.1f} | {hi[k]:.1f} | {lo[k]/hi[k]:.2f}x | {eff:.2f} |")
    probe_scatter_eff = p_scatter_8 / p_scatter_32 / 4
    probe_alu_eff = p_alu_8 / p_alu_32 / 4

    md = f"""# BENCH/PHASES — per-phase core-scaling (local[8] -> local[32])

Generated {dt.datetime.now(dt.timezone.utc).isoformat(timespec="seconds")} by `python tools/phase_scaling.py`.

| phase | sec @8 | sec @32 | speedup | efficiency |
|---|---|---|---|---|
{chr(10).join(rows)}

Hardware probe (pure multiprocessing, no Spark): per-unit-of-work time
at 8 vs 32 workers.

| probe | eff @4x cores |
|---|---|
| random scatter (np.add.at — hash-agg access pattern) | {probe_scatter_eff:.2f} |
| register-bound ALU loop | {probe_alu_eff:.2f} |

Reading: phases whose working set streams (scan) or lives in Python
worker processes (kernel UDFs) scale near the ALU ceiling; the
hash-aggregation phase is bounded by the same single-box memory-system
ceiling the scatter probe shows. A real 4N-node cluster multiplies
memory bandwidth with node count, which one box cannot emulate.
"""
    (REPO / "BENCH").mkdir(exist_ok=True)
    (REPO / "BENCH" / "PHASES.md").write_text(md)
    print(md)


if __name__ == "__main__":
    main()
