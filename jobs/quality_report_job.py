"""spark-submit entry point for the stream-quality report: the
continuation-10/11 battery over an event-shaped table in one pass —
one-step agreement (Cohen kappa + Gwet AC1), calibration of the
global hourly outcome forecast (Brier/Murphy), distribution drift vs
the pooled corpus (PSI), Western Electric zone-rule alerts, the
weekend/weekday rate comparison and the zero-inflation screen: the
per-key quality sheet an agent-traffic operator reviews weekly.

    spark-submit --py-files tits_spark.zip jobs/quality_report_job.py \\
        --input  /data/events       # parquet (user_id, ts, event_type, value, event_id)
        --output /data/quality      # parquet dir, one table per section
        [--outcome-type error] [--baseline-n 50]

The raw scan is persisted ONCE and shared by every section (the
governance_job discipline). Output layout:

    <output>/agreement/   (key, n_trans, n_agree, kappa, ac1)
    <output>/brier/       (key, n, s, reliability, resolution, ...)
    <output>/psi/         (key, n, n_bins, psi_ppb, psi)
    <output>/we_alerts/   (key, ts_us, value, dev, r1..r4)
    <output>/rates/       (key, n_days, rate_z, rate_ratio, ...)
    <output>/zeroinf/     (key, n_days, n_zero_days, zi_score, ...)

Prints ONE JSON line:
    {"keys": N, "mean_kappa": K, "worst_psi": P, "we_alert_rows": A,
     "surging_keys": R, "zero_inflated_keys": Z, "sec": T}
"""

from __future__ import annotations

import argparse
import json
import time


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--outcome-type", default="error")
    ap.add_argument("--baseline-n", type=int, default=50)
    ap.add_argument("--cores", default="inherit")
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    args = ap.parse_args(argv)

    from pyspark.sql import functions as F

    from tits_spark.operators.agreement import (
        transition_gwet_ac1,
        transition_kappa,
    )
    from tits_spark.operators.brier import hourly_error_brier
    from tits_spark.operators.drift import psi_vs_global
    from tits_spark.operators.poissonness import zero_inflation_daily
    from tits_spark.operators.ratecomp import weekend_rate_test
    from tits_spark.operators.western_electric import western_electric
    from tits_spark.session import get_spark

    spark = get_spark(
        "tits_spark-quality",
        cores=args.cores,
        shuffle_partitions=args.shuffle_partitions,
    )
    spark.sparkContext.setLogLevel("WARN")

    t0 = time.perf_counter()
    raw = spark.read.parquet(args.input).persist()

    kap = transition_kappa(raw)
    ac1 = transition_gwet_ac1(raw).select("key", "k_cats", "ac1")
    kap.join(ac1, "key").write.mode("overwrite").parquet(
        f"{args.output}/agreement"
    )
    hourly_error_brier(raw, outcome_type=args.outcome_type).write.mode(
        "overwrite"
    ).parquet(f"{args.output}/brier")
    psi_vs_global(
        raw.select(F.col("user_id").alias("key"), "value")
    ).write.mode("overwrite").parquet(f"{args.output}/psi")
    western_electric(raw, baseline_n=args.baseline_n).write.mode(
        "overwrite"
    ).parquet(f"{args.output}/we_alerts")
    weekend_rate_test(raw, key="user_id").write.mode("overwrite").parquet(
        f"{args.output}/rates"
    )
    zero_inflation_daily(raw, key="user_id").write.mode(
        "overwrite"
    ).parquet(f"{args.output}/zeroinf")
    raw.unpersist()

    agr = spark.read.parquet(f"{args.output}/agreement")
    psi = spark.read.parquet(f"{args.output}/psi")
    rates = spark.read.parquet(f"{args.output}/rates")
    zi = spark.read.parquet(f"{args.output}/zeroinf")
    print(json.dumps({
        "keys": agr.count(),
        "mean_kappa": round(
            (agr.agg(F.avg("kappa")).collect()[0][0] or 0.0), 6
        ),
        "worst_psi": round(
            (psi.agg(F.max("psi")).collect()[0][0] or 0.0), 6
        ),
        "we_alert_rows": spark.read.parquet(
            f"{args.output}/we_alerts"
        ).count(),
        "surging_keys": rates.filter(F.abs("rate_z") > 3).count(),
        "zero_inflated_keys": zi.filter(F.col("zi_score") > 6.63).count(),
        "sec": round(time.perf_counter() - t0, 3),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
