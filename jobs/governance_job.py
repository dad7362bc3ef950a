"""spark-submit entry point for the data-governance report: Benford
first-digit conformance, k-anonymity / l-diversity over the QI class
lattice, freshness/staleness SLA accounting, and the isotonic hourly
calibration curve — the audit bundle a training-data release runs
before shipping a snapshot.

    spark-submit --py-files tits_spark.zip jobs/governance_job.py \\
        --input  /data/ticks        # parquet (key, ts, value)
        --output /data/governance   # parquet dir, one table per section
        [--sla-sec 86400] [--k-threshold 5]

The raw scan is persisted ONCE and shared by all four audits (the
screening_job discipline). Output layout:

    <output>/benford/     (key, n, n1..n9, chi2, mad_ppm)
    <output>/privacy/     one-row k-anonymity / l-diversity summary
    <output>/staleness/   (key, n_obs, span_us, n_violations, ...)
    <output>/isotonic/    (key, hour, n_obs, raw_micro, fit_micro)

Prints ONE JSON line:
    {"keys": N, "benford_worst_mad_ppm": M, "k_min": K,
     "stale_keys": S, "sec": T}
"""

from __future__ import annotations

import argparse
import json
import time


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--sla-sec", type=int, default=86400)
    ap.add_argument("--k-threshold", type=int, default=5)
    ap.add_argument("--cores", default="inherit")
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    args = ap.parse_args(argv)

    from pyspark.sql import functions as F

    from tits_spark.operators.benford import benford_audit
    from tits_spark.operators.isotonic import isotonic_hourly
    from tits_spark.operators.privacy import k_anonymity_report
    from tits_spark.operators.staleness import staleness_report
    from tits_spark.session import get_spark

    spark = get_spark(
        "tits_spark-governance",
        cores=args.cores,
        shuffle_partitions=args.shuffle_partitions,
    )
    spark.sparkContext.setLogLevel("WARN")

    t0 = time.perf_counter()
    raw = spark.read.parquet(args.input).select("key", "ts", "value").persist()

    benford_audit(raw).write.mode("overwrite").parquet(
        f"{args.output}/benford"
    )
    # the QI lattice audit expects the event shape; adapt the generic
    # (key, ts, value) scan with the key standing in for the subject
    k_anonymity_report(
        raw.select(
            F.col("key").alias("user_id"),
            F.col("key").alias("event_type"),
            "ts",
            "value",
        ),
        k_thresh=args.k_threshold,
    ).write.mode("overwrite").parquet(f"{args.output}/privacy")
    staleness_report(raw, sla_s=args.sla_sec).write.mode(
        "overwrite"
    ).parquet(f"{args.output}/staleness")
    isotonic_hourly(raw).write.mode("overwrite").parquet(
        f"{args.output}/isotonic"
    )
    raw.unpersist()

    ben = spark.read.parquet(f"{args.output}/benford")
    priv = spark.read.parquet(f"{args.output}/privacy").collect()
    stale = spark.read.parquet(f"{args.output}/staleness")
    worst = ben.agg(F.max("mad_ppm")).collect()[0][0]
    print(json.dumps({
        "keys": ben.count(),
        "benford_worst_mad_ppm": worst,
        "k_min": priv[0]["k_min"] if priv else None,
        "stale_keys": stale.filter(F.col("n_violations") > 0).count(),
        "sec": round(time.perf_counter() - t0, 3),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
