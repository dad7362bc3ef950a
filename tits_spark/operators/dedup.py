"""Deduplication operators for large-scale training-data pipelines.

All hot paths are built-in column expressions (hashing, explodes, joins,
aggregations) — no Python UDFs — so they scale to 100 TB document sets:

 - exact:        hash-groupBy on md5(text)
 - ngram Jaccard: shingle explode -> frequency-capped equi-join on
                  shingle -> |A∩B| / (|A|+|B|-|A∩B|)
 - MinHash+LSH:  per-doc signatures = numeric minima of independent
                  32-bit md5 windows, one wide aggregation pass (see
                  _minhash_wide), banded into LSH buckets, bucket-join
                  for candidates, exact-Jaccard verify
 - SimHash:      per-token hash bits -> per-bit majority vote

The md5-based hash family is chosen deliberately: it exists with
identical semantics in DuckDB, so every stage is oracle-checkable by the
driver's SQL cross-check. Swap ``xxhash64`` in for raw speed at cluster
scale (same plan shape).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dedup_exact(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact dedup: one keeper (min id) per distinct text.
    Returns (<id_col>, keeper_id, n_copies)."""
    h = F.md5(F.col(text_col)).alias("h")
    g = df.select(F.col(id_col), h)
    agg = g.groupBy("h").agg(
        F.min(id_col).alias("keeper_id"), F.count(F.lit(1)).alias("n_copies")
    )
    return g.join(agg, "h").select(id_col, "keeper_id", "n_copies")


def char_shingles(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 8,
    distinct: bool = True,
) -> DataFrame:
    """Character n-gram shingles per doc: (<id_col>, shingle).
    Pure column expr: substring over a sequence of offsets, exploded.

    ``distinct=True`` (default) gives set semantics — REQUIRED for
    Jaccard counting — at the price of a full shuffle of the exploded
    rows. Pass ``distinct=False`` for duplicate-insensitive consumers:
    MinHash's per-hash *min* is identical over multiset and set, so the
    wide signature aggregation skips the dedup shuffle entirely and its
    map-side partial min absorbs repeats for free.

    The input is routed through ``ensure_min_parallelism`` first: the
    explode amplifies per-row CPU ~100x, so byte-based file splitting
    (sized for the input) can leave the whole hash stage on one core
    when the corpus is small / few-file; the guard is a no-op at
    production scale."""
    from tits_spark.operators.skew import ensure_min_parallelism

    df = ensure_min_parallelism(df)
    txt = F.col(text_col)
    offs = F.sequence(F.lit(1), F.greatest(F.length(txt) - (n - 1), F.lit(1)))
    sh = (
        df.select(F.col(id_col), F.explode(offs).alias("off"), txt.alias("_t"))
        .select(id_col, F.substring(F.col("_t"), F.col("off"), n).alias("shingle"))
        .filter(F.length("shingle") == n)
    )
    return sh.distinct() if distinct else sh


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    threshold: float = 0.4,
    max_doc_freq: int = 1000,
) -> DataFrame:
    """Candidate near-dup pairs by character-n-gram Jaccard similarity.

    ``max_doc_freq`` drops shingles present in more than that many docs
    before the self-join — the standard guard against quadratic blowup
    on boilerplate shingles (at web scale this is what keeps the shuffle
    bounded; dropped shingles only *lower* estimated similarity, never
    create false positives above the exact value).
    Returns (id_a, id_b, n_common, n_a, n_b, jaccard) with id_a < id_b.
    """
    sh = char_shingles(df, id_col, text_col, n)
    # frequency cap as a LEFT ANTI join against the over-frequent
    # shingle set: the blacklist (boilerplate shared by > max_doc_freq
    # docs) is tiny relative to the corpus, so AQE broadcasts it and
    # the corpus-sized exploded frame is NOT shuffled for the cap —
    # the inner-join formulation shuffled all |shingle| rows a second
    # time just to drop the few hot ones. Counting FIRST (instead of
    # collect_list-then-filter) also bounds task memory: a web-scale
    # boilerplate shingle never materializes its doc list anywhere.
    blacklist = (
        sh.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df_"))
        .filter(F.col("df_") > max_doc_freq)
        .select("shingle")
    )
    sh = sh.join(blacklist, "shingle", "left_anti")
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))

    # pair generation by per-shingle doc-list combinations instead of
    # the shingle self-join (guide §2.4/§3): ONE exchange of the capped
    # (shingle, doc) rows replaces two join-side exchanges plus their
    # sort-merge sorts, and the explode subtree is executed once. Doc
    # lists are bounded by max_doc_freq, so the C(k,2) fan-out per
    # shingle is exactly the rows the self-join produced — never
    # doc x doc (plan asserted in tests/test_plans.py).
    grp = sh.groupBy("shingle").agg(F.collect_list(F.col(id_col)).alias("_ids"))
    common = (
        grp.select(F.explode("_ids").alias("id_a"), "_ids")
        .select("id_a", F.explode("_ids").alias("id_b"))
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("n_b"))
    jac = F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common"))
    return (
        common.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "n_common", "n_a", "n_b", "jaccard")
    )


def _minhash_wide(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int,
    shingle_n: int,
) -> DataFrame:
    """One row per doc with columns h0..h{num_hashes-1}: hash i is the
    min over shingles of an independent 32-bit value — the i%4-th 8-hex
    window of md5(prefix_{i//4} ∥ shingle). Two wins over the naive
    md5-per-(i, shingle) construction:

     - ONE pass over the shingle rows with ``num_hashes`` min-aggregates
       (no hash_idx row explode: the shuffle carries |docs| rows, not
       |docs| x num_hashes, and map-side partial min compacts each task
       to one row per doc);
     - ceil(num_hashes/4) md5 calls per shingle instead of num_hashes
       (md5 is the dominant CPU cost) — each md5 yields four disjoint
       32-bit windows, which are independent uniform hashes.

    Not the linear-permutation Broder scheme on purpose: 2-universal
    a*x+b mod p permutations of a shared base hash are measurably NOT
    min-wise independent — on the sf0.01 corpus they inflated LSH false
    candidates 2.6x (1782 vs 689 pairs, same 25 true near-dups), a
    quadratic-in-corpus cost at scale. Independent md5 windows match
    the ideal family (610 candidates, same 25 true)."""
    # distinct=False: min() is duplicate-insensitive, so skipping the
    # (doc, shingle) dedup removes a full shuffle of the exploded rows
    sh = char_shingles(df, id_col, text_col, shingle_n, distinct=False)
    n_md5 = (num_hashes + 3) // 4
    for j in range(n_md5):
        src = (
            F.col("shingle")
            if j == 0
            else F.concat(F.lit(f"{j}|"), F.col("shingle"))
        )
        sh = sh.withColumn(f"_m{j}", F.md5(src))
    # min over the HEX STRING windows, not their numeric values: md5's
    # fixed-width lowercase hex makes lexicographic order == numeric
    # order, so the per-row base-16 conversion (the dominant CPU after
    # md5 itself — |shingles| x num_hashes conv calls) moves below the
    # aggregation, where it runs once per (doc, hash) on the minima.
    aggs = []
    for i in range(num_hashes):
        j, w = divmod(i, 4)
        aggs.append(F.min(F.substring(F.col(f"_m{j}"), 1 + 8 * w, 8)).alias(f"_s{i}"))
    wide = sh.groupBy(id_col).agg(*aggs)
    return wide.select(
        id_col,
        *[
            F.conv(F.col(f"_s{i}"), 16, 10).cast("long").alias(f"h{i}")
            for i in range(num_hashes)
        ],
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    shingle_n: int = 8,
) -> DataFrame:
    """MinHash signature per doc: for hash i, the numeric min over
    shingles of the i-th independent 32-bit md5 window (see
    _minhash_wide for the hash-family rationale). Returns
    (<id_col>, hash_idx, minhash:long); computed via the single-pass
    wide aggregation, unpivoted only at the end."""
    wide = _minhash_wide(df, id_col, text_col, num_hashes, shingle_n)
    stack_args = ", ".join(f"{i}, h{i}" for i in range(num_hashes))
    return wide.select(
        id_col,
        F.expr(f"stack({num_hashes}, {stack_args}) AS (hash_idx, minhash)"),
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 8,
) -> DataFrame:
    """LSH candidate pairs: signatures split into ``bands`` bands of
    num_hashes/bands rows; docs sharing any full band collide.
    Returns distinct (id_a, id_b) with id_a < id_b — feed into
    ngram_jaccard_pairs-style exact verification."""
    # band keys straight off the wide one-row-per-doc signature: the
    # banding costs zero additional shuffles (the old per-(doc, band)
    # groupBy re-shuffled docs x num_hashes rows)
    band = minhash_band_table(df, id_col, text_col, num_hashes, bands, shingle_n)
    a = band.select(F.col(id_col).alias("id_a"), "band", "band_key")
    b = band.select(F.col(id_col).alias("id_b"), "band", "band_key")
    return (
        a.join(b, ["band", "band_key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def embedding_near_dups(
    emb: DataFrame,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    threshold: float = 0.95,
    nbits: int = 0,
    n_tables: int = 4,
    dim: int = 64,
) -> DataFrame:
    """Near-duplicate pairs by embedding cosine similarity.

    ``nbits == 0`` -> exact all-pairs (the correctness baseline; a
    shuffled self-join). ``nbits > 0`` -> sign-LSH bucketed candidates
    first (the 10^11-vector scale path: the same deterministic
    Rademacher buckets as similarity.lsh_topk, ONE equi-join on
    (tbl, bucket) across all hash tables), then exact cosine on
    candidates only.
    Returns (id_a, id_b, cosine) with id_a < id_b, cosine >= threshold.
    """
    from tits_spark.operators.similarity import (
        _dot, _norm, rademacher_planes, with_lsh_buckets,
    )

    dbl = lambda c: F.transform(F.col(c), lambda x: x.cast("double"))  # noqa: E731
    if nbits <= 0:
        a = emb.select(F.col(id_col).alias("id_a"), dbl(emb_col).alias("ea"))
        b = emb.select(F.col(id_col).alias("id_b"), dbl(emb_col).alias("eb"))
        pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    else:
        planes = rademacher_planes(dim, nbits, n_tables)
        bucketed = with_lsh_buckets(
            emb.select(F.col(id_col).alias("_id"), F.col(emb_col).alias("_raw")),
            planes, "_raw",
        )
        a = bucketed.select(
            F.col("_id").alias("id_a"), dbl("_raw").alias("ea"), "tbl", "bucket"
        )
        b = bucketed.select(
            F.col("_id").alias("id_b"), dbl("_raw").alias("eb"), "tbl", "bucket"
        )
        pairs = (
            a.join(b, ["tbl", "bucket"])
            .filter(F.col("id_a") < F.col("id_b"))
            .dropDuplicates(["id_a", "id_b"])
        )
    cos = _dot(F.col("ea"), F.col("eb")) / (_norm(F.col("ea")) * _norm(F.col("eb")))
    return (
        pairs.withColumn("cosine", cos)
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def simhash(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    nbits: int = 32,
) -> DataFrame:
    """Per-doc SimHash: tokens vote per bit, bit j of a token's hash =
    parity of the j-th hex digit of md5(token) (uniform over hex, and
    reproducible in ANSI SQL). Returns (<id_col>, simhash: long)."""
    tok = F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("tok")
    toks = df.select(F.col(id_col), tok).filter(F.length("tok") > 0)
    j = F.explode(F.sequence(F.lit(0), F.lit(nbits - 1))).alias("bit")
    bits = toks.select(id_col, F.md5("tok").alias("h"), j)
    vote = F.when(
        F.ascii(F.substring(F.col("h"), F.col("bit") + 1, 1)) % 2 == 1, 1
    ).otherwise(-1)
    return (
        bits.withColumn("v", vote)
        .groupBy(id_col, "bit")
        .agg(F.sum("v").alias("s"))
        .withColumn("bitval", F.when(F.col("s") > 0, F.lit(1)).otherwise(F.lit(0)))
        .groupBy(id_col)
        .agg(F.sum(F.col("bitval") * F.pow(F.lit(2.0), F.col("bit")).cast("long")).alias("simhash"))
    )


def simhash_fast(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    nbits: int = 32,
) -> DataFrame:
    """Scale-path SimHash: identical output contract to ``simhash`` but
    computed per document inside one Arrow-batched pandas_udf — each
    token is hashed once and the per-bit majority vote runs in numpy,
    so the tokens × nbits row explode (a 32x shuffle amplification at
    100 TB) never happens; the operator is a map-only projection.

    Bit convention matches the declarative twin exactly (and therefore
    its DuckDB oracle): tokens = java-\\s+ split of the space-trimmed
    text, bit j of a token = parity of ascii(md5(token)[j]), bit set
    when the vote sum is > 0. Docs with no tokens produce no row.

    Batch layout: tokens of the whole Arrow batch are flattened once,
    factorized to the batch's *unique* token set with pandas' hash-based
    factorize (no string sort), md5 runs once per unique token (digests
    concatenated and decoded by a single frombuffer), and the
    per-(doc, bit) majority vote is one ``np.add.reduceat`` over the
    doc-grouped token-bit rows — no per-document Python loop, no
    per-token dict bookkeeping (~2.5x the per-doc-loop formulation)."""
    import hashlib
    import itertools
    import re

    from pyspark.sql.functions import pandas_udf

    ws = re.compile(r"[ \t\n\x0b\f\r]+")  # java \s, as F.split(r"\s+") uses
    weights = (1 << np.arange(nbits, dtype=np.int64))

    def sig_batch(texts: pd.Series) -> pd.Series:
        tok_lists = [
            [t for t in ws.split((s or "").strip(" ")) if t] for s in texts
        ]
        lens = np.fromiter((len(l) for l in tok_lists), dtype=np.int64,
                           count=len(tok_lists))
        out = np.empty(len(texts), dtype=object)
        out[:] = None
        flat = list(itertools.chain.from_iterable(tok_lists))
        if flat:
            inv, uniq = pd.factorize(np.asarray(flat, dtype=object), sort=False)
            hexcat = b"".join(
                hashlib.md5(t.encode("utf-8")).hexdigest()[:nbits].encode()
                for t in uniq
            )
            # parity of each hex digit's ascii code -> 1/0 bit votes
            ones_bits = (np.frombuffer(hexcat, dtype=np.uint8)
                         .reshape(-1, nbits) % 2).astype(np.int32)
            starts = np.zeros(lens.size, dtype=np.int64)
            np.cumsum(lens[:-1], out=starts[1:])
            nz = lens > 0
            # doc-grouped segments: empty docs contribute no tokens, so
            # consecutive non-empty docs always have distinct starts
            # (reduceat's equal-start quirk cannot trigger)
            ones = np.add.reduceat(ones_bits[inv], starts[nz], axis=0)
            # vote sum = (+1 votes) - (-1 votes) = 2*ones - n_tokens
            votes = 2 * ones.astype(np.int64) - lens[nz, None]
            out[nz] = (votes > 0).astype(np.int64) @ weights
        return pd.Series(out, index=texts.index)

    from tits_spark.operators.skew import ensure_min_parallelism

    sig = pandas_udf(sig_batch, "long")
    # same CPU-amplification guard as char_shingles: the pandas_udf
    # hashes every token of every doc, so a small/few-file corpus must
    # not leave the whole batch on one core (no-op at scale)
    return (
        ensure_min_parallelism(df)
        .select(F.col(id_col), sig(F.col(text_col)).alias("simhash"))
        .filter(F.col("simhash").isNotNull())
    )


def simhash_near_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    nbits: int = 32,
    max_hamming: int = 3,
    band_bits: int = 8,
) -> DataFrame:
    """Near-dup pairs by SimHash: band the hash into nbits/band_bits
    chunks; by pigeonhole, any pair within ``max_hamming`` (< number of
    bands) shares at least one exact band -> equi-join on (band, chunk),
    then verify the true Hamming distance. Returns (id_a, id_b, hamming)."""
    sig = simhash_fast(df, id_col, text_col, nbits)
    nbands = nbits // band_bits
    chunk = F.explode(F.sequence(F.lit(0), F.lit(nbands - 1))).alias("band")
    banded = sig.select(id_col, "simhash", chunk).withColumn(
        "chunk",
        F.expr(f"shiftrightunsigned(simhash, band * {band_bits}) % {1 << band_bits}"),
    )
    a = banded.select(F.col(id_col).alias("id_a"), F.col("simhash").alias("sh_a"), "band", "chunk")
    b = banded.select(F.col(id_col).alias("id_b"), F.col("simhash").alias("sh_b"), "band", "chunk")
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        a.join(b, ["band", "chunk"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", ham.alias("hamming"))
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


def dedup_clusters(
    pairs: DataFrame,
    max_iter: int = 25,
    small_graph_edges: int = 2_000_000,
) -> DataFrame:
    """Duplicate clusters: connected components over a near-dup pair
    graph (e.g. from :func:`minhash_lsh_pairs` or
    :func:`simhash_near_pairs`). Returns one row per node:
    ``(doc_id, cluster_id, cluster_size)`` where ``cluster_id`` is the
    minimum doc_id reachable from the node — the canonical "keeper" of
    the duplicate cluster (SlimPajama/CCNet-style: keep one doc per
    component, drop the rest).

    Algorithm: distributed min-label propagation — each round every node
    adopts ``min(own label, neighbours' labels)`` via one equi-join +
    one hash aggregate, converging in O(graph diameter) rounds with an
    early exit when a round changes nothing. Near-dup graphs are dense
    small cliques (every member of a dup cluster collides with most
    others in some LSH band), so the diameter is tiny — 2-4 rounds in
    practice — and each round is shuffle-bounded by |E|, never
    all-pairs. Each round additionally pointer-jumps (every node
    shortcuts to its label's label — Shiloach-Vishkin style), which
    halves the remaining distance to the component minimum, so even
    adversarial path-shaped graphs converge in O(log n) rounds instead
    of O(diameter); cf. the same goal in large-star/small-star
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    SoCC'14). ``localCheckpoint`` truncates the lineage each round so
    the plan does not grow with iterations (the classic iterative-Spark
    footgun). Raises if ``max_iter`` rounds pass without convergence —
    silently returning partial labels would be a wrong answer.

    The reference has no graph analog; this is part of the
    training-pipeline surface the Spark engine adds on top of tits.
    """
    edges = pairs.select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    ).union(pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst")))
    edges = edges.localCheckpoint(eager=True)

    # Small-graph fast path (round 6, guide §1.2 "the distributed
    # algorithm"): each label-propagation round is 2 joins + an eager
    # checkpoint + a probe job — pure scheduler overhead when the edge
    # list is tiny (measured ~3s for a 600-edge graph). Below the cap
    # (2M directed edges ~ 32 MB) collect the already-materialized
    # checkpoint and run path-compressed union-find on the driver —
    # identical labels (min reachable id) by construction. The
    # distributed O(log n) loop below remains the at-scale path.
    n_edges = edges.count()  # metadata: checkpoint blocks already built
    if n_edges <= small_graph_edges:
        from pyspark.sql import types as T

        id_type = pairs.schema["id_a"].dataType
        schema = T.StructType([
            T.StructField("doc_id", id_type),
            T.StructField("cluster_id", id_type),
            T.StructField("cluster_size", T.LongType()),
        ])
        spark = pairs.sparkSession
        epdf = edges.toPandas()
        if not len(epdf):
            return spark.createDataFrame([], schema=schema)
        nodes = pd.unique(epdf[["src", "dst"]].to_numpy().ravel())
        idx = {v: i for i, v in enumerate(nodes)}
        parent = np.arange(len(nodes))

        def find(i: int) -> int:
            while parent[i] != i:
                parent[i] = parent[parent[i]]
                i = parent[i]
            return i

        for s, d in zip(epdf["src"].map(idx).to_numpy(),
                        epdf["dst"].map(idx).to_numpy()):
            rs, rd = find(s), find(d)
            if rs != rd:
                parent[rs] = rd
        roots = np.fromiter((find(i) for i in range(len(nodes))),
                            dtype=np.int64, count=len(nodes))
        lab: dict = {}
        for i, r in enumerate(roots):
            v = nodes[i]
            if r not in lab or v < lab[r]:
                lab[r] = v
        out = pd.DataFrame({
            "doc_id": nodes,
            "cluster_id": [lab[r] for r in roots],
        })
        out["cluster_size"] = out.groupby("cluster_id")["doc_id"].transform(
            "size"
        ).astype("int64")
        return spark.createDataFrame(out, schema=schema)

    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )
    converged = False
    for _ in range(max_iter):
        # one round: every node takes the min label over itself + neighbours
        prop = edges.join(
            labels.withColumnRenamed("node", "src"), "src"
        ).select(F.col("dst").alias("node"), "label")
        merged = (
            labels.unionByName(prop)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
        )
        # pointer jump: shortcut to the label's own label (the label is
        # always a node present in the table), halving the remaining
        # hop distance — O(log n) total rounds on any graph shape
        lut = merged.select(
            F.col("node").alias("label"), F.col("label").alias("_label2")
        )
        # the changed-flag is computed INSIDE the round's checkpoint job
        # (one extra equi-join against the previous labels, same node
        # key); the convergence probe below then only scans the already-
        # materialized checkpoint blocks with a limit-1 early exit — no
        # second join job per iteration
        new_labels = (
            merged.join(lut, "label", "left")
            .select(
                "node",
                F.least(F.col("label"), F.coalesce(F.col("_label2"), F.col("label"))).alias("label"),
            )
            .join(labels.withColumnRenamed("label", "_old"), "node")
            .select(
                "node", "label",
                (F.col("label") != F.col("_old")).alias("_chg"),
            )
            .localCheckpoint(eager=True)
        )
        changed = new_labels.filter(F.col("_chg")).limit(1).count()
        # superseded rounds' checkpoint blocks are RDD-level storage not
        # registered with the cache manager (unpersist() would be a
        # no-op); dropping the Python reference lets the ContextCleaner
        # GC them — O(log n) rounds bounds the transient pinning
        labels = new_labels.drop("_chg")
        if changed == 0:
            converged = True
            break
    if not converged:
        raise RuntimeError(
            f"dedup_clusters did not converge within max_iter={max_iter} "
            "rounds; raise max_iter (rounds needed ~ log2 of the largest "
            "component's diameter)"
        )

    sizes = labels.groupBy("label").agg(F.count("*").alias("cluster_size"))
    return labels.join(sizes, "label").select(
        F.col("node").alias("doc_id"),
        F.col("label").alias("cluster_id"),
        "cluster_size",
    )


def minhash_band_table(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 8,
) -> DataFrame:
    """The persistable LSH state: (doc_id, band, band_key) rows for a
    corpus. Write this once per corpus (bucketed/partitioned by
    band_key prefix at scale) and incremental ingestion never touches
    the corpus text again — see minhash_lsh_pairs_incremental."""
    rows = num_hashes // bands
    wide = _minhash_wide(df, id_col, text_col, num_hashes, shingle_n)
    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.array(
                            *[F.col(f"h{i}") for i in range(b * rows, (b + 1) * rows)]
                        )
                    ),
                    lambda x: x.cast("string"),
                ),
                "|",
            ).alias("band_key"),
        )
        for b in range(bands)
    ]
    return wide.select(
        F.col(id_col), F.explode(F.array(*band_structs)).alias("bk")
    ).select(
        id_col, F.col("bk.band").alias("band"), F.col("bk.band_key").alias("band_key")
    )


def minhash_lsh_pairs_incremental(
    new_docs: DataFrame,
    corpus_bands: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 8,
) -> DataFrame:
    """Continuous-ingestion dedup: candidate pairs for a NEW batch of
    documents against (a) the existing corpus via its persisted band
    table and (b) the batch itself — without recomputing or rereading
    any corpus text. At 10^12-doc scale this is the only affordable
    shape: per ingest, signature cost is O(|batch|), and the join
    against the corpus band table is an equi-join that partition-prunes
    if the band table is stored bucketed by (band, band_key).

    ``corpus_bands`` must come from :func:`minhash_band_table` with the
    SAME num_hashes/bands/shingle_n. Returns distinct (id_a, id_b),
    id_a < id_b, covering new-vs-corpus and new-vs-new pairs.
    """
    nb = minhash_band_table(new_docs, id_col, text_col, num_hashes, bands, shingle_n)
    a = nb.select(F.col(id_col).alias("id_a"), "band", "band_key")
    b_corpus = corpus_bands.select(F.col(id_col).alias("id_b"), "band", "band_key")
    b_new = nb.select(F.col(id_col).alias("id_b"), "band", "band_key")
    vs_corpus = a.join(b_corpus, ["band", "band_key"]).filter(
        F.col("id_a") != F.col("id_b")
    )
    vs_new = a.join(b_new, ["band", "band_key"]).filter(F.col("id_a") < F.col("id_b"))
    return (
        vs_corpus.select(
            F.least("id_a", "id_b").alias("id_a"),
            F.greatest("id_a", "id_b").alias("id_b"),
        )
        .unionByName(vs_new.select("id_a", "id_b"))
        .distinct()
    )


def source_ngram_overlap(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    n: int = 8,
) -> DataFrame:
    """Corpus-level n-gram overlap between GROUPS (sources/domains/
    snapshots): for every group pair, the exact shingle-set
    intersection, Jaccard, and directed containments — the standard
    "how much of source B is recycled from source A" contamination
    diagnostic at corpus granularity.

    Scale shape: one distinct over (group, shingle) — bounded by the
    corpus's distinct shingle space, not documents — then a shingle
    equi-join whose output is bounded by |pairs sharing a shingle|,
    aggregated to the tiny groups x groups frame. No doc-frequency cap
    here (the pair space is groups^2, not docs^2, so boilerplate can't
    blow it up). All outputs exact integers + identical single
    divisions — hash-exact oracle.
    """
    sh = char_shingles(df, id_col=group_col, text_col=text_col, n=n).select(
        F.col(group_col).alias("grp"), "shingle"
    ).distinct()
    sizes = sh.groupBy("grp").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.select(F.col("grp").alias("src_a"), "shingle")
    b = sh.select(F.col("grp").alias("src_b"), "shingle")
    common = (
        a.join(b, "shingle")
        .where(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("grp").alias("src_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("grp").alias("src_b"), F.col("n_sh").alias("n_b"))
    return (
        common.join(F.broadcast(sa), "src_a")
        .join(F.broadcast(sb), "src_b")
        .select(
            "src_a", "src_b", "n_common", "n_a", "n_b",
            (F.col("n_common")
             / (F.col("n_a") + F.col("n_b") - F.col("n_common"))).alias("jaccard"),
            (F.col("n_common") / F.col("n_a")).alias("containment_a"),
            (F.col("n_common") / F.col("n_b")).alias("containment_b"),
        )
    )
