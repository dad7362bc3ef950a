"""spark-submit entry point for the dependence family: 1-lag Granger
F-test + bidirectional binary transfer entropy + Engle-Granger
cointegration + Kendall tau-b + empirical tail dependence between two
irregular series per key, all on the shared one-scan LOCF bucket grid.

The reference's guess_lag answers "WHICH shift best aligns x and y"
(ref:guess_lag.c:336-357); this job answers the follow-up a
production pipeline asks next: "does x actually PREDICT y" — the
linear (Granger) and model-free (transfer entropy) tests over the
same tits-style gap-aware alignment.

    spark-submit --py-files tits_spark.zip jobs/causality_job.py \\
        --input  /data/ticks            # parquet (key, ts, value, series)
        --output /data/causality        # parquet out, one row per key
        [--x-side x] [--y-side y]       # values of the series column
        [--bucket-secs 3600]
        [--min-points 25]               # TE lattice minimum

Output columns: key, n_obs (Granger grid rows), b_ar, c_x, f_stat,
te_n_obs, te_xy, te_yx, eg_n_pairs, beta, alpha, gamma, df_t, kt_n_obs,
tau_b (Kendall tau-b rank dependence on the same grid), td_n_grid,
lambda_u, lambda_l (empirical tail dependence on the same grid).
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
    ap.add_argument("--x-side", default="x")
    ap.add_argument("--y-side", default="y")
    ap.add_argument("--bucket-secs", type=int, default=3600)
    ap.add_argument("--min-points", type=int, default=25)
    ap.add_argument("--cores", default="inherit")
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    args = ap.parse_args(argv)

    from pyspark.sql import functions as F

    from tits_spark.operators.cointegration import engle_granger
    from tits_spark.operators.granger import granger_1lag
    from tits_spark.operators.kendall import kendall_tau
    from tits_spark.operators.taildep import tail_dependence
    from tits_spark.operators.transfer_entropy import transfer_entropy
    from tits_spark.session import get_spark

    spark = get_spark(
        "tits_spark-causality",
        cores=args.cores,
        shuffle_partitions=args.shuffle_partitions,
    )
    spark.sparkContext.setLogLevel("WARN")

    t0 = time.perf_counter()
    ticks = spark.read.parquet(args.input)
    common = dict(
        x_side=args.x_side,
        y_side=args.y_side,
        bucket_secs=args.bucket_secs,
    )
    # all three tests consume the IDENTICAL alignment grid: build it
    # once, persist, and pass it through — the raw scan + grid shuffle
    # run a single time instead of three (at cluster scale this is the
    # materialized alignment table a production pipeline would write)
    from tits_spark.operators.granger import locf_bucket_grid

    grid = locf_bucket_grid(ticks, **common).persist()
    gr = granger_1lag(ticks, grid=grid, **common)
    te = transfer_entropy(
        ticks, min_points=args.min_points, grid=grid, **common
    ).select(
        "key",
        F.col("n_obs").alias("te_n_obs"),
        "te_xy",
        "te_yx",
    )
    eg = engle_granger(ticks, grid=grid, **common).select(
        "key",
        F.col("n_pairs").alias("eg_n_pairs"),
        "beta", "alpha", "gamma", "df_t",
    )
    kt = kendall_tau(ticks, grid=grid, **common).select(
        "key",
        F.col("n_obs").alias("kt_n_obs"),
        "tau_b",
    )
    td = tail_dependence(ticks, grid=grid, **common).select(
        "key",
        F.col("n_grid").alias("td_n_grid"),
        "lambda_u", "lambda_l",
    )
    out = (
        gr.join(te, "key", "full")
        .join(eg, "key", "full")
        .join(kt, "key", "full")
        .join(td, "key", "full")
    )
    out.write.mode("overwrite").parquet(args.output)
    grid.unpersist()

    written = spark.read.parquet(args.output)
    print(json.dumps({
        "keys": written.select("key").distinct().count(),
        "rows": written.count(),
        "sec": round(time.perf_counter() - t0, 3),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
