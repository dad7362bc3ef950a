"""spark-submit entry point for the data-quality profile gate.

    spark-submit --py-files tits_spark.zip jobs/profile_job.py \
        --input  /data/corpus \
        --output /data/profile \
        [--columns text,lang,source] \
        [--exact]            # force exact count_distinct everywhere
        [--approx text,source]  # sketch exactly these columns
        [--hll-p 12]

Default mode sketches every string column with the engine's
deterministic HLL (operators/profile.py) — the 100 TB-safe path: no
expand+exchange of unbounded distinct values, the register shuffle is
bounded by n_cols x 2^p rows. Prints one JSON line with the profile
rows (the table is one row per column, so it fits a log line) and
writes it as parquet to --output.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--columns", default=None,
                    help="comma-separated subset (default: all columns)")
    mode = ap.add_mutually_exclusive_group()
    mode.add_argument("--exact", action="store_true",
                      help="exact count_distinct everywhere (the expand "
                           "plan — safe only when no column is unbounded)")
    mode.add_argument("--approx", default=None,
                      help="comma-separated columns to sketch (default: "
                           "auto = every string column)")
    ap.add_argument("--hll-p", type=int, default=12)
    ap.add_argument("--cores", default="inherit")
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    args = ap.parse_args(argv)

    from tits_spark.operators.profile import data_profile
    from tits_spark.session import get_spark

    spark = get_spark(
        "tits-profile",
        cores=args.cores,
        shuffle_partitions=args.shuffle_partitions,
    )
    t0 = time.perf_counter()
    df = spark.read.parquet(args.input)
    cols = args.columns.split(",") if args.columns else None
    approx: str | bool | list[str]
    if args.exact:
        approx = False
    elif args.approx is not None:
        approx = args.approx.split(",")
    else:
        approx = "auto"
    prof = data_profile(df, cols, approx=approx, p=args.hll_p)
    prof.coalesce(1).write.mode("overwrite").parquet(args.output)
    rows = [r.asDict() for r in spark.read.parquet(args.output).collect()]
    print(json.dumps({
        "columns_profiled": len(rows),
        "sec": round(time.perf_counter() - t0, 3),
        "profile": rows,
    }, default=str))


if __name__ == "__main__":
    main(sys.argv[1:])
