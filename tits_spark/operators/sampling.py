"""Deterministic sampling operators for training-data curation.

A 100 TB curation pipeline cannot use ``df.sample()`` for anything that
must be reproducible or auditable: Spark's sampler is seeded per
partition, so the selected set changes with the partition layout (a
repartition, an AQE coalesce, or a cluster resize silently changes the
sample). These operators instead derive the keep/drop decision from a
deterministic integer hash of the row's id — the sample is a pure
function of the data, identical at any parallelism, restartable, and
expressible in ANSI SQL for the DuckDB oracle gate.

Hash: Knuth multiplicative hashing ``(((id mod 2^31) + seed) mod 2^31)
* 2654435761 mod 2^32`` (Fibonacci hashing constant, TAOCP vol 3
§6.4). Not
cryptographic — it doesn't need to be; it needs to be uniform-ish,
cheap, stable, and reproducible in any SQL dialect. The leading
``mod 2^31`` bounds the multiplicand so the product stays < 2^63 for
ANY int64 id (without it, ids beyond ~3.5e9 — certain at 10^11-doc
scale — overflow, wrapping silently or throwing under ANSI mode); the
cost is that ids exactly 2^31 apart share a sampling decision, which is
irrelevant for sampling purposes.

Scale notes:
 - ``hash_fraction_sample`` is a pure filter — no shuffle, survives
   predicate pushdown, costs one codegen'd comparison per row.
 - ``stratified_sample_exact`` is one window shuffle keyed by the
   strata columns (same shape as any per-group top-k); skewed strata
   behave like any skewed groupBy and are covered by AQE skew handling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

KNUTH = 2654435761  # 2^32 / phi, TAOCP vol 3
M31 = 1 << 31
M32 = 1 << 32


def sample_hash(id_col: str, seed: int = 0):
    """Deterministic uniform-ish hash of an integer id column into
    [0, 2^32), overflow-free for any int64 id. The id is folded mod
    2^31 BEFORE the seed is added (id + seed first could itself
    overflow at id near 2^63); seed must be < 2^31. Same formula the
    oracle SQL uses (identical for seed=0)."""
    folded = F.pmod(F.pmod(F.col(id_col), F.lit(M31)) + F.lit(seed), F.lit(M31))
    return F.pmod(folded * F.lit(KNUTH), F.lit(M32))


def hash_fraction_sample(
    df: DataFrame, fraction: float, id_col: str = "doc_id", seed: int = 0
) -> DataFrame:
    """Bernoulli-style sample keeping ~``fraction`` of rows,
    deterministically: a row is kept iff hash(id) < fraction * 2^32.
    Pure filter — no shuffle, no per-partition seeding, the same rows
    at any parallelism."""
    return df.filter(sample_hash(id_col, seed) < int(fraction * M32))


def stratified_sample_exact(
    df: DataFrame,
    strata_cols: list[str],
    k: int,
    id_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Exactly ``min(k, |stratum|)`` rows per stratum, chosen by the
    deterministic hash order (ties broken by id — total order, so the
    selection is unique). The distributed analog of per-stratum
    reservoir sampling, without the order-dependence: one window
    shuffle on the strata key."""
    w = Window.partitionBy(*strata_cols).orderBy(
        sample_hash(id_col, seed).asc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .drop("_rk")
    )


def domain_mix_exact(
    df: DataFrame,
    weights: dict[str, float],
    domain_col: str = "source",
    id_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Down-sample a multi-domain corpus to an exact target mixture
    with maximum retention — the "domain reweighting" step of a
    training-data pipeline (the deterministic analog of the sampling
    ratios in public recipes like The Pile / DoReMi): given target
    proportions ``weights`` (need not sum to 1 — they are normalized),
    keep ``k_d = floor(w_d * T)`` documents of domain ``d`` where
    ``T = min_d(count_d / w_d)`` is the largest total for which no
    domain is over-drawn. Domains absent from ``weights`` (weight 0)
    are dropped.

    Selection within a domain is by the deterministic Knuth-hash order
    (ties by id), so the output is a pure function of the data —
    identical at any parallelism, and expressible in ANSI SQL for the
    oracle gate.

    Plan shape at 100 TB: one hash aggregation for the per-domain
    counts (|domains| rows — these tiny frames use a single-partition
    window, which is bounded by the domain count, not the data); the
    per-domain quota joins back as a **broadcast**; the only data-sized
    shuffle is the per-domain row_number window, the same shape as any
    stratified top-k, with AQE handling skewed domains.
    """
    total_w = float(sum(weights.values()))
    wdf = F.broadcast(
        df.sparkSession.createDataFrame(
            [(d, w / total_w) for d, w in weights.items()], f"{domain_col} string, _w double"
        )
    )
    counts = df.groupBy(domain_col).agg(F.count(F.lit(1)).alias("_cnt"))
    quotas = (
        counts.join(wdf, domain_col)
        .withColumn(
            # bounded-global-window: T over the |domains|-row counts
            # frame (one row per distinct domain, already aggregated)
            "_T", F.min(F.col("_cnt") / F.col("_w")).over(Window.partitionBy())
        )
        .select(domain_col, F.floor(F.col("_w") * F.col("_T")).alias("_k"))
    )
    w = Window.partitionBy(domain_col).orderBy(
        sample_hash(id_col, seed).asc(), F.col(id_col).asc()
    )
    return (
        df.join(F.broadcast(quotas), domain_col)
        .withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= F.col("_k"))
        .drop("_rk", "_k")
    )


def weighted_sample_exact(
    df: DataFrame,
    k: int,
    weight_col: str,
    id_col: str = "doc_id",
    strata_cols: list[str] | None = None,
    seed: int = 0,
) -> DataFrame:
    """Weighted sampling WITHOUT replacement, deterministically: the
    Efraimidis–Spirakis A-ES scheme (IPL 2006, public algorithm) with
    the per-row uniform drawn from the Knuth hash instead of an RNG.
    Each row gets the key u^(1/w) — equivalently ln(u)/w, monotone in
    it — and the k largest keys win; inclusion probability is then
    proportional to weight, and the selection is a pure function of
    the data (same rows at any parallelism, restartable, SQL-matchable
    — the same audit argument as the module's other samplers).

    The key is floored to the integer 1e6 lattice before ranking so
    both engines order identical integers (a last-ulp libm difference
    in ln() can never flip an order). Ties break by id. Rows with
    weight <= 0 are excluded (they have probability 0).

    Global mode (``strata_cols=None``) plans orderBy().limit(k) —
    TakeOrderedAndProject, per-partition heaps + one merge, no global
    sort — then ranks the k-row frame. Strata mode is the usual
    per-group window top-k.

    Returns the input columns + (es_u6, rank).
    """
    u = (sample_hash(id_col, seed) + F.lit(1.0)) / F.lit(float(M32))
    es = F.floor(F.log(u) / F.col(weight_col) * 1e6).cast("long")
    scored = df.filter(F.col(weight_col) > 0).withColumn("es_u6", es)
    if strata_cols:
        w = Window.partitionBy(*strata_cols).orderBy(
            F.desc("es_u6"), F.asc(id_col)
        )
        return (
            scored.withColumn("rank", F.row_number().over(w).cast("int"))
            .filter(F.col("rank") <= int(k))
        )
    top = scored.orderBy(F.desc("es_u6"), F.asc(id_col)).limit(int(k))
    # bounded-global-window: ranks the limit(k) frame above (<= k rows
    # on one task by construction) — NEVER lift this window onto the
    # unbounded scored frame
    w = Window.orderBy(F.desc("es_u6"), F.asc(id_col))
    return top.withColumn("rank", F.row_number().over(w).cast("int"))
