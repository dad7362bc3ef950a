"""ANN recall / candidate-cost evidence at non-toy scale.

Measures recall@k and mean candidate-set size for ``lsh_topk`` and
``ivf_topk`` against the exact ``cosine_topk`` ground truth, on a 50k+
vector deterministic clustered corpus (tits_spark.datagen.embeddings),
sweeping nbits / n_tables / nprobe. This answers the question the
operators' plan-shape tests cannot: do the default parameters give
*usable* recall beyond a few hundred vectors, and what does each
parameter buy per unit of rerank work?

Candidate-set size is the scale currency: rerank cost per query is
candidates x dim, so recall must be read against it (a method returning
the whole corpus as candidates trivially has recall 1.0).

Writes BENCH/ANN.md. Run: python tools/ann_bench.py [--n 50000]
[--queries 100] [--dim 64] [--k 10]
"""

from __future__ import annotations

import argparse
import datetime as dt
import pathlib
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from tits_spark.datagen.embeddings import generate_embeddings  # noqa: E402
from tits_spark.operators import similarity as S  # noqa: E402
from tits_spark.session import get_spark  # noqa: E402


def topk_sets(df, k):
    """{query_id: frozenset(top-k vec_ids)} from a (query_id, vec_id,
    rank) frame."""
    rows = df.filter(F.col("rank") <= k).select("query_id", "vec_id").collect()
    out: dict[int, set] = {}
    for r in rows:
        out.setdefault(r["query_id"], set()).add(r["vec_id"])
    return out


def recall_at_k(approx, truth, k):
    if not truth:
        return float("nan")
    per_q = [
        len(approx.get(q, set()) & t) / max(1, len(t)) for q, t in truth.items()
    ]
    return sum(per_q) / len(per_q)


def lsh_candidates_per_query(corpus, queries, nbits, n_tables, dim):
    planes = S.rademacher_planes(dim, nbits, n_tables)
    q = S.with_lsh_buckets(
        queries.select(F.col("vec_id").alias("query_id"), "embedding"),
        planes, "embedding",
    ).select("query_id", "tbl", "bucket")
    c = S.with_lsh_buckets(corpus, planes, "embedding").select(
        "vec_id", "tbl", "bucket")
    n_q = queries.count()
    n_cand = (
        c.join(F.broadcast(q), ["tbl", "bucket"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id")
        .distinct()
        .count()
    )
    return n_cand / max(1, n_q)


def ivf_candidates_per_query(corpus, queries, n_centroids, nprobe,
                             rebalance_max_share=None):
    C, lids = S.train_ivf_centroids(
        corpus, n_centroids, rebalance_max_share=rebalance_max_share)
    c = corpus.select(
        "vec_id", F.explode(S._assign_udf(C, lids, "embedding", top=1)).alias("list_id"))
    q = queries.select(
        F.col("vec_id").alias("query_id"),
        F.explode(S._assign_udf(C, lids, "embedding", top=nprobe)).alias("list_id"))
    n_q = queries.count()
    n_cand = (
        c.join(F.broadcast(q), "list_id")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id")
        .distinct()
        .count()
    )
    return n_cand / max(1, n_q)


def ivf_list_sizes(corpus, n_centroids, rebalance_max_share=None):
    """Final IVF list-size distribution: (max_share, p99_share, n_lists)
    — how well the (optionally re-balanced) quantizer spreads a skewed
    corpus across lists."""
    C, lids = S.train_ivf_centroids(
        corpus, n_centroids, rebalance_max_share=rebalance_max_share)
    sizes = (
        corpus.select(
            F.explode(S._assign_udf(C, lids, "embedding", top=1)).alias("list_id"))
        .groupBy("list_id").count().collect()
    )
    n_total = sum(r["count"] for r in sizes)
    shares = sorted((r["count"] / n_total for r in sizes), reverse=True)
    p99 = shares[max(0, int(0.01 * len(shares)) - 1)] if shares else 0.0
    return shares[0], p99, len(shares)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=50_000)
    ap.add_argument("--queries", type=int, default=100)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--skew", type=float, default=0.0,
                    help="also run an IVF section on a Zipf(s)-skewed "
                         "cluster corpus (0 = skip)")
    ap.add_argument("--assert-floors", action="store_true",
                    help="exit 1 unless lsh(8,8) and ivf(K=64,nprobe>=2) "
                         "recall meet the documented floors")
    args = ap.parse_args()

    spark = get_spark("ann-bench")
    all_vecs = generate_embeddings(
        spark, args.n + args.queries, dim=args.dim, n_clusters=50,
        sigma=0.05, seed=0,
    ).cache()
    corpus = all_vecs.filter(F.col("vec_id") < args.n).select("vec_id", "embedding")
    queries = all_vecs.filter(F.col("vec_id") >= args.n).select("vec_id", "embedding")
    corpus.count()  # materialize the cache before timing anything

    truth = topk_sets(S.cosine_topk(corpus, queries, k=args.k), args.k)

    lsh_rows = []
    for nbits in (8, 12, 16):
        for n_tables in (2, 4, 8):
            approx = topk_sets(
                S.lsh_topk(corpus, queries, k=args.k, nbits=nbits,
                           n_tables=n_tables, dim=args.dim),
                args.k,
            )
            rec = recall_at_k(approx, truth, args.k)
            cand = lsh_candidates_per_query(
                corpus, queries, nbits, n_tables, args.dim)
            lsh_rows.append((nbits, n_tables, rec, cand))
            print(f"lsh nbits={nbits} tables={n_tables} "
                  f"recall@{args.k}={rec:.3f} cand/q={cand:.0f}")

    ivf_rows = []
    for nprobe in (1, 2, 4, 8):
        approx = topk_sets(
            S.ivf_topk(corpus, queries, k=args.k, n_centroids=64,
                       nprobe=nprobe),
            args.k,
        )
        rec = recall_at_k(approx, truth, args.k)
        cand = ivf_candidates_per_query(corpus, queries, 64, nprobe)
        ivf_rows.append((64, nprobe, rec, cand))
        print(f"ivf K=64 nprobe={nprobe} "
              f"recall@{args.k}={rec:.3f} cand/q={cand:.0f}")

    skew_rows = []
    if args.skew > 0:
        skewed = generate_embeddings(
            spark, args.n + args.queries, dim=args.dim, n_clusters=50,
            sigma=0.05, seed=0, cluster_skew=args.skew,
        ).cache()
        s_corpus = skewed.filter(F.col("vec_id") < args.n).select(
            "vec_id", "embedding")
        s_queries = skewed.filter(F.col("vec_id") >= args.n).select(
            "vec_id", "embedding")
        # planted-cluster mass: how skewed the INPUT is
        top_cluster = (
            skewed.groupBy("cluster").count()
            .agg(F.max("count").alias("m")).first()["m"]
        ) / (args.n + args.queries)
        s_corpus.count()
        s_truth = topk_sets(S.cosine_topk(s_corpus, s_queries, k=args.k), args.k)
        # plain Lloyd (no cap) vs split-rebalanced (cap 5%): same
        # corpus, same K, same nprobe sweep
        for cap in (None, 0.05):
            max_share, p99_share, n_lists = ivf_list_sizes(s_corpus, 64, cap)
            # rebalanced lists are smaller, so its sweep extends to the
            # higher nprobe that buys recall back at bounded cost
            for nprobe in ((1, 2, 4) if cap is None else (2, 4, 6, 8)):
                approx = topk_sets(
                    S.ivf_topk(s_corpus, s_queries, k=args.k, n_centroids=64,
                               nprobe=nprobe, rebalance_max_share=cap),
                    args.k,
                )
                rec = recall_at_k(approx, s_truth, args.k)
                cand = ivf_candidates_per_query(s_corpus, s_queries, 64,
                                                nprobe, cap)
                skew_rows.append((args.skew, cap, nprobe, rec, cand,
                                  top_cluster, max_share, p99_share, n_lists))
                print(f"ivf-skew s={args.skew} cap={cap} nprobe={nprobe} "
                      f"recall@{args.k}={rec:.3f} cand/q={cand:.0f} "
                      f"max_list={max_share:.3f} (input top cluster "
                      f"{top_cluster:.3f})")

    md = [
        "# BENCH/ANN — recall vs candidate cost at non-toy scale\n\n",
        f"Generated {dt.datetime.now(dt.timezone.utc).isoformat(timespec='seconds')} "
        f"by `python tools/ann_bench.py --n {args.n} --queries {args.queries} "
        f"--dim {args.dim} --k {args.k}`.\n\n",
        f"Corpus: {args.n} vectors, dim {args.dim}, 50-cluster Gaussian "
        f"mixture, noise norm ~0.4 vs unit centers (sigma 0.05) — a\n"
        f"clustered corpus, the regime real embedding models produce. "
        f"(On an isotropic noise-dominated corpus — sigma 0.35 was\n"
        f"measured — every ANN method collapses toward random top-k; "
        f"that is a property of the data, not the index: nearest\n"
        f"neighbours at cosine ~0 carry no locality any bucketing can "
        f"exploit.) Deterministic counter-hash generator:\n"
        f"`tits_spark/datagen/embeddings.py`. {args.queries} held-out "
        f"queries from the same mixture. Ground truth = `cosine_topk` "
        f"(exact brute force). `cand/q` = mean exact-rerank candidates "
        f"per query — the per-query cost knob; the exact scan is "
        f"{args.n} cand/q by definition.\n\n",
        f"## lsh_topk (sign-LSH, recall@{args.k})\n\n",
        "| nbits | tables | recall | cand/q | corpus fraction |\n",
        "|---|---|---|---|---|\n",
    ]
    for nbits, ntab, rec, cand in lsh_rows:
        md.append(f"| {nbits} | {ntab} | {rec:.3f} | {cand:.0f} "
                  f"| {cand / args.n:.3f} |\n")
    md += [
        f"\n## ivf_topk (K=64 coarse quantizer, recall@{args.k})\n\n",
        "| K | nprobe | recall | cand/q | corpus fraction |\n",
        "|---|---|---|---|---|\n",
    ]
    for K, nprobe, rec, cand in ivf_rows:
        md.append(f"| {K} | {nprobe} | {rec:.3f} | {cand:.0f} "
                  f"| {cand / args.n:.3f} |\n")
    if skew_rows:
        s = skew_rows[0][0]
        top_cluster = skew_rows[0][5]
        plain_share = next(r[6] for r in skew_rows if r[1] is None)
        reb = [r for r in skew_rows if r[1] is not None]
        reb_share, reb_lists = (reb[0][6], reb[0][8]) if reb else (None, None)
        md += [
            f"\n## ivf_topk under skewed clusters (Zipf s={s}, K=64)\n\n",
            f"Input: same mixture but cluster membership drawn "
            f"Zipf(s={s}) — the heaviest planted cluster holds "
            f"{top_cluster:.1%} of the corpus. Plain Lloyd does NOT "
            f"re-balance it: max-dot-product assignment sends the whole "
            f"heavy cluster to its one nearest centroid, so the largest "
            f"list holds {plain_share:.1%} — rerank cost per query "
            f"scales with the input skew, not nprobe/K. "
            + (f"With split-rebalance (`rebalance_max_share=0.05`: "
               f"oversized cells are split into perturbed sub-centroids "
               f"and re-refined by ordinary Lloyd passes) the largest "
               f"list drops to {reb_share:.1%} across {reb_lists} "
               f"lists, restoring the bounded-cost contract.\n\n"
               if reb else "\n\n"),
            "| skew s | rebalance cap | nprobe | recall | cand/q | corpus fraction | max list share |\n",
            "|---|---|---|---|---|---|---|\n",
        ]
        for s, cap, nprobe, rec, cand, _tc, ms, _p99, _nl in skew_rows:
            md.append(f"| {s} | {cap if cap is not None else '—'} "
                      f"| {nprobe} | {rec:.3f} | {cand:.0f} "
                      f"| {cand / args.n:.3f} | {ms:.3f} |\n")
    md.append(
        "\nReading: recall rises with tables (LSH) / nprobe (IVF) at the "
        "price of a proportionally larger rerank set; nbits trades the "
        "opposite way (sharper buckets, fewer candidates, lower recall "
        "per table). The engine's defaults are chosen so the candidate "
        "fraction stays in the low percents while recall holds above the "
        "floor asserted in tests/test_ann_recall.py on this same "
        "generator.\n"
    )
    floors_ok = True
    if args.assert_floors:
        # the documented floors, checked at whatever --n was passed:
        # sign-LSH (nbits=8, 8 tables) >= 0.90 and IVF (K=64, nprobe=2)
        # >= 0.95 on the clustered corpus; on the skewed corpus the
        # REBALANCED IVF (cap=0.05, nprobe=6) must hold recall >= 0.90
        # AND its largest list must stay under 10% of the corpus
        # (expressed as 1-share >= 0.90)
        lsh88 = next(r for (b, t, r, _c) in lsh_rows if b == 8 and t == 8)
        ivf2 = next(r for (_K, p, r, _c) in ivf_rows if p == 2)
        checks = [("lsh(8,8)", lsh88, 0.90), ("ivf(64,2)", ivf2, 0.95)]
        reb6 = [r for r in skew_rows if r[1] is not None and r[2] == 6]
        if reb6:
            checks.append(("ivf-skew-rebalanced(64,6)", reb6[0][3], 0.90))
            checks.append(("ivf-skew-rebalanced max list < 0.10",
                           1.0 - reb6[0][6], 0.90))
        for name, got_v, floor in checks:
            ok = got_v >= floor
            floors_ok &= ok
            print(f"floor {name}: {got_v:.3f} >= {floor} -> "
                  f"{'ok' if ok else 'FAIL'}")
        md.append(
            f"\nFloors asserted at n={args.n}: " + "; ".join(
                f"{name} {'PASS' if got_v >= floor else 'FAIL'} "
                f"({got_v:.3f} vs {floor})" for name, got_v, floor in checks
            ) + ".\n"
        )
    (REPO / "BENCH" / "ANN.md").write_text("".join(md))
    print("wrote BENCH/ANN.md")
    if not floors_ok:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
