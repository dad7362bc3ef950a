"""spark-submit entry point for the per-key series HEALTH REPORT: the
robust/distributional family over one input of (key, ts, value) rows.

A production fleet asks, per key: where is this series centered and
how spread is it, robustly (Hodges-Lehmann + Qn — a single corrupt
1e12 print owns the mean but not a pairwise median); do its spikes
cluster (Ferro-Segers extremal index — isolated p999s debounce
differently from bursts); is its activity phase-locked to a time of
day (Rayleigh); does the weekday matter once weeks are blocked
(Friedman); and what is the honest CI for its mean given
autocorrelation (circular block bootstrap)? One row per key with all
of it.

    spark-submit --py-files tits_spark.zip jobs/health_job.py \\
        --input  /data/series           # parquet (key, ts, value)
        --output /data/health           # parquet out, one row per key
        [--exc-k 30] [--boot-reps 100] [--boot-block 25]

The key column must be integral (it feeds the bootstrap hash fold).
Prints ONE JSON line: {"keys": N, "rows": M, "sec": S}.
"""

from __future__ import annotations

import argparse
import json
import time


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--exc-k", type=int, default=30)
    ap.add_argument("--boot-reps", type=int, default=100)
    ap.add_argument("--boot-block", type=int, default=25)
    ap.add_argument("--cores", default="inherit")
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    args = ap.parse_args(argv)

    from pyspark.sql import functions as F

    from tits_spark.operators.bootstrap import block_bootstrap_mean
    from tits_spark.operators.circular import rayleigh_uniformity
    from tits_spark.operators.extremal import extremal_index
    from tits_spark.operators.friedman import friedman_weekday
    from tits_spark.operators.pairstats import robust_pair_stats
    from tits_spark.session import get_spark

    spark = get_spark(
        "tits_spark-health",
        cores=args.cores,
        shuffle_partitions=args.shuffle_partitions,
    )
    spark.sparkContext.setLogLevel("WARN")

    t0 = time.perf_counter()
    # five consumers of the same raw frame: persist it once (the
    # causality_job grid precedent)
    series = spark.read.parquet(args.input).persist()

    rb = robust_pair_stats(series).select(
        "key", "n_obs", "hl", "qn"
    )
    ex = extremal_index(series, k=args.exc_k).select(
        "key", F.col("u_cents").alias("exc_u_cents"), "theta"
    )
    ry = rayleigh_uniformity(series).select(
        "key", "rbar", F.col("z").alias("rayleigh_z")
    )
    fr = friedman_weekday(series).select(
        "key", "n_blocks", F.col("chi2").alias("weekday_chi2")
    )
    bb = block_bootstrap_mean(
        series, n_reps=args.boot_reps, block_len=args.boot_block
    ).select("key", "mean", "ci_lo", "ci_hi")

    out = (
        rb.join(ex, "key", "full")
        .join(ry, "key", "full")
        .join(fr, "key", "full")
        .join(bb, "key", "full")
    )
    out.write.mode("overwrite").parquet(args.output)
    series.unpersist()
    spark.catalog.clearCache()  # the bootstrap persists its prefix frame

    written = spark.read.parquet(args.output)
    print(json.dumps({
        "keys": written.select("key").distinct().count(),
        "rows": written.count(),
        "sec": round(time.perf_counter() - t0, 3),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
