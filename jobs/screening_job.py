"""spark-submit entry point for the nonparametric screening battery:
Mann-Whitney U, Cliff's delta / Vargha-Delaney A, Lepage
location-scale, Wald-Wolfowitz runs — weekend vs weekday per key —
plus the Benjamini-Hochberg FDR step-up across the key cross-section
on the battery's JB normality p-values.

The report a rollup pipeline runs before anyone acts on a per-key
alert: EFFECT SIZE (delta/A) next to SIGNIFICANCE (U, Lepage, runs),
with the multiple-testing correction applied cross-sectionally —
"150 keys, 9 below 0.05" means nothing without BH (7.5 expected by
chance at m = 150).

    spark-submit --py-files tits_spark.zip jobs/screening_job.py \\
        --input  /data/ticks        # parquet (key, ts, value)
        --output /data/screening    # parquet out, one row per key
        [--alpha 0.05]

The weekend/weekday flagged frame is built ONCE and persisted — the
four two-sample tests share it instead of re-scanning the raw four
times (the causality_job grid-persist discipline). Output columns:
key, n_a, n_b, u2, z_mw, cliffs_delta, vd_a, lepage, z_w, z_ab,
runs, z_runs, jb, p_jb, bh_rank, bh_m, bh_k_star, bh_reject.
Prints ONE JSON line: {"keys": N, "rejected": R, "sec": S}.
"""

from __future__ import annotations

import argparse
import json
import time


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--alpha", type=float, default=0.05)
    ap.add_argument("--cores", default="inherit")
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    args = ap.parse_args(argv)

    from pyspark.sql import functions as F

    from tits_spark.operators.cross_section import bh_fdr
    from tits_spark.operators.effect_size import cliffs_delta
    from tits_spark.operators.normality import jarque_bera
    from tits_spark.operators.rank_tests import mann_whitney
    from tits_spark.operators.ww_runs import lepage_test, ww_runs_test
    from tits_spark.session import get_spark

    spark = get_spark(
        "tits_spark-screening",
        cores=args.cores,
        shuffle_partitions=args.shuffle_partitions,
    )
    spark.sparkContext.setLogLevel("WARN")

    t0 = time.perf_counter()
    flagged = (
        spark.read.parquet(args.input)
        .select(
            "key",
            "ts",
            "value",
            F.dayofweek("ts").isin(1, 7).alias("is_a"),
        )
        .persist()
    )
    mw = mann_whitney(flagged).select(
        "key", "n_a", "n_b", "u2", F.col("z").alias("z_mw")
    )
    cd = cliffs_delta(flagged).select("key", "cliffs_delta", "vd_a")
    lp = lepage_test(flagged).select("key", "lepage", "z_w", "z_ab")
    ww = ww_runs_test(flagged).select(
        "key", "runs", F.col("z").alias("z_runs")
    )
    jb = jarque_bera(flagged).select(
        "key",
        F.col("jb").alias("stat"),
        F.round(F.exp(-F.col("jb") / F.lit(2.0)), 6).alias("p"),
    )
    bh = bh_fdr(jb, alpha=args.alpha).select(
        "key",
        F.col("stat").alias("jb"),
        F.col("p").alias("p_jb"),
        F.col("rnk").alias("bh_rank"),
        F.col("m").alias("bh_m"),
        F.col("k_star").alias("bh_k_star"),
        F.col("reject").alias("bh_reject"),
    )
    out = (
        mw.join(cd, "key", "full")
        .join(lp, "key", "full")
        .join(ww, "key", "full")
        .join(bh, "key", "full")
    )
    out.write.mode("overwrite").parquet(args.output)
    flagged.unpersist()

    written = spark.read.parquet(args.output)
    print(json.dumps({
        "keys": written.count(),
        "rejected": written.filter(F.col("bh_reject")).count(),
        "sec": round(time.perf_counter() - t0, 3),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
