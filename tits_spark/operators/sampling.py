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
