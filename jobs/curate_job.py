"""spark-submit entry point for the training-data curation pipeline.

    spark-submit --py-files tits_spark.zip jobs/curate_job.py \
        --input   /data/documents \
        --output  /data/curated \
        --metrics /data/curation_metrics \
        [--quality-min 0.72] [--lang en] [--jaccard 0.12]

Runs quality gate -> language gate -> exact dedup -> MinHash-LSH
near-dup removal (operators/curate.py) over a documents table
(doc_id, text, ...), writes:

  <output>/decisions/   one row per input doc: (doc_id, quality,
                        lang_pred, stage)  — the full audit trail
  <output>/kept/        the curated documents (all input columns),
                        inner-joined on stage = 'kept'
  <metrics>/            per-stage counts + input/output checksums, one
                        row per stage, for pipeline lineage

and prints ONE JSON line with counts and wall time.

Optional post-gates over the kept set (off by default):

  --pii-max-per-kchar X   drop kept docs whose PII density (matches per
                          1000 chars, operators/pii.py) exceeds X, and
                          redact the survivors' text in <output>/kept
  --substr-dedup-len L    remove non-canonical duplicated L-token spans
                          from the survivors (operators/substring_dedup
                          ExactSubstr); rewrites text, records
                          n_tokens_removed

Both run on the already-curated survivors (cheapest-last: they only see
the kept fraction), and their counts land in the JSON line under
"post_gates" (the decisions/metrics tables keep the core four stages).
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
    ap.add_argument("--metrics", default=None)
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--quality-min", type=float, default=0.72)
    ap.add_argument("--lang", default="en")
    ap.add_argument("--num-hashes", type=int, default=8)
    ap.add_argument("--bands", type=int, default=4)
    ap.add_argument("--shingle-n", type=int, default=8)
    ap.add_argument("--jaccard", type=float, default=0.12)
    ap.add_argument("--max-doc-freq", type=int, default=1000)
    ap.add_argument("--pii-max-per-kchar", type=float, default=None)
    ap.add_argument("--substr-dedup-len", type=int, default=None)
    ap.add_argument("--cores", default="inherit")
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    ap.add_argument("--job-id", default=None)
    args = ap.parse_args(argv)

    from pyspark.sql import functions as F

    from tits_spark.operators.curate import curate_documents, curate_summary
    from tits_spark.session import get_spark

    spark = get_spark(
        "tits_spark-curate",
        cores=args.cores,
        shuffle_partitions=args.shuffle_partitions,
    )
    spark.sparkContext.setLogLevel("WARN")

    docs = spark.read.parquet(args.input)
    t0 = time.perf_counter()
    decisions = curate_documents(
        docs,
        id_col=args.id_col,
        text_col=args.text_col,
        quality_min=args.quality_min,
        lang=args.lang,
        num_hashes=args.num_hashes,
        bands=args.bands,
        shingle_n=args.shingle_n,
        jaccard_threshold=args.jaccard,
        max_doc_freq=args.max_doc_freq,
    ).cache()

    decisions.write.mode("overwrite").parquet(f"{args.output}/decisions")
    kept_ids = decisions.filter(F.col("stage") == "kept").select(args.id_col)
    kept = docs.join(kept_ids, args.id_col)

    counts = {r["stage"]: r["n_docs"] for r in curate_summary(decisions).collect()}
    n_in = sum(counts.values())

    if args.pii_max_per_kchar is not None:
        from tits_spark.operators.pii import PII_PATTERNS, pii_density, pii_scrub

        # cached for the two actions below (count + downstream write);
        # unpersisted after kept.write so in-process callers don't leak
        # executor storage for the rest of the session
        s = pii_scrub(kept, text_col=args.text_col).cache()
        keep_pred = pii_density(args.pii_max_per_kchar, args.text_col)
        counts["pii"] = s.filter(~keep_pred).count()
        drop_cols = [f"n_{name.lower()}" for name, _ in PII_PATTERNS] + ["n_pii"]
        kept = (
            s.filter(keep_pred)
            .drop(args.text_col, *drop_cols)
            .withColumnRenamed("text_clean", args.text_col)
        )

    if args.substr_dedup_len is not None:
        from tits_spark.operators.substring_dedup import exact_substring_dedup

        # NOTE: rewrites text as the normalized (lowercased-alphanumeric)
        # token stream — span removal is defined on tokens, not bytes
        dd = exact_substring_dedup(
            kept, length=args.substr_dedup_len,
            id_col=args.id_col, text_col=args.text_col,
        ).cache()
        counts["substr_touched"] = dd.filter(F.col("n_spans") > 0).count()
        kept = kept.drop(args.text_col).join(
            dd.select(
                args.id_col,
                F.col("text_dedup").alias(args.text_col),
                "n_tokens_removed",
            ),
            args.id_col,
        )

    kept.write.mode("overwrite").parquet(f"{args.output}/kept")
    if args.pii_max_per_kchar is not None:
        s.unpersist()
    if args.substr_dedup_len is not None:
        dd.unpersist()
    if args.metrics:
        job_id = args.job_id or f"curate-{int(time.time())}"
        summary = curate_summary(decisions).select(
            F.lit(job_id).alias("job_id"),
            "stage",
            "n_docs",
            F.lit(n_in).alias("n_input"),
            F.current_timestamp().alias("committed_at"),
        )
        summary.coalesce(1).write.mode("append").parquet(args.metrics)

    dt = time.perf_counter() - t0
    post = {
        k: counts.pop(k) for k in ("pii", "substr_touched") if k in counts
    }
    n_kept = counts.get("kept", 0) - post.get("pii", 0)
    decisions.unpersist()
    print(json.dumps({
        "docs_in": n_in,
        "kept": n_kept,
        "dropped_by_stage": {k: v for k, v in sorted(counts.items()) if k != "kept"},
        "post_gates": post,
        "sec": round(dt, 3),
        "docs_per_sec": round(n_in / dt, 1),
    }))


if __name__ == "__main__":
    main(sys.argv[1:])
