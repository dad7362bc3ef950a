"""spark-submit entry point for the per-key TAIL-RISK REPORT: the
extreme-value / volatility family over one input of (key, ts, value)
rows.

A production risk desk (or capacity planner) asks, per key: how heavy
is the tail and what does the GPD say about beyond-sample quantiles
(gpd_tail, PWM fit over the top exceedances); does the historical 99%
VaR actually hold out of sample (Kupiec POF backtest); is the variance
arriving smoothly or in jumps (BNS realized-vs-bipower decomposition);
what is the RUNNING conditional variance right now (GARCH(1,1)
filter); and is the event arrival rate itself clustering (ACD(1,1)
duration filter)? One row per key with all of it.

    spark-submit --py-files tits_spark.zip jobs/risk_job.py \\
        --input  /data/series           # parquet (key, ts, value)
        --output /data/risk             # parquet out, one row per key
        [--exc-k 50]                    # GPD exceedance count

All five consumers share ONE persisted input scan (the
health_job/causality_job precedent). Prints ONE JSON line:
{"keys": N, "rows": M, "sec": S}.
"""

from __future__ import annotations

import argparse
import json
import time


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--exc-k", type=int, default=50)
    ap.add_argument("--cores", default="inherit")
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    args = ap.parse_args(argv)

    from pyspark.sql import functions as F

    from tits_spark.operators.acd import acd_filter
    from tits_spark.operators.garch import garch_filter
    from tits_spark.operators.jumps import bns_jumps
    from tits_spark.operators.tail import gpd_pot
    from tits_spark.operators.var_backtest import kupiec_pof
    from tits_spark.session import get_spark

    spark = get_spark(
        "tits_spark-risk",
        cores=args.cores,
        shuffle_partitions=args.shuffle_partitions,
    )
    spark.sparkContext.setLogLevel("WARN")

    t0 = time.perf_counter()
    series = (
        spark.read.parquet(args.input)
        .select(F.col("key").cast("string").alias("key"), "ts", "value")
        .persist()
    )
    try:
        gpd = gpd_pot(series, k=args.exc_k).select(
            "key", F.col("u_cents").alias("gpd_u_cents"), "xi", "sigma_c"
        )
        pof = kupiec_pof(series).select(
            "key", "u_cents", "x_viol", "viol_rate", "lr_pof"
        )
        bns = bns_jumps(series).select("key", "n_ret", "rv", "rj")
        gar = garch_filter(series).select(
            "key", "var0", "s_last", "z2_mean"
        )
        acd = acd_filter(series).select(
            "key", "xbar", "psi_last", "eps_mean"
        )
        out = (
            gpd.join(pof, "key", "full")
            .join(bns, "key", "full")
            .join(gar, "key", "full")
            .join(acd, "key", "full")
        )
        out.write.mode("overwrite").parquet(args.output)
    finally:
        series.unpersist()

    written = spark.read.parquet(args.output)
    print(json.dumps({
        "keys": written.select("key").distinct().count(),
        "rows": written.count(),
        "sec": round(time.perf_counter() - t0, 3),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
