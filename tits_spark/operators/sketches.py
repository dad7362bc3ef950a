"""Deterministic distributed sketches: HyperLogLog, count-min, KMV.

The reference engine keeps per-key state tables sized by a hash of the
stream key (ref:hash.c:248-344, ref:tits.c series registry); at 10^12
turns the analogous "how many distinct X" / "which X are hot" questions
need sub-linear state.  This module implements the three classic
sketches as *pure relational aggregations* so they:

 - shuffle only the sketch, never the items: HLL carries at most
   ``groups x m`` register rows, CMS at most ``d x w`` counter rows,
   both with map-side partial aggregation (max / sum combine);
 - are **deterministic under any partitioning** — the usual float
   register-sum of 2^-M_j is order-dependent, so the HLL harmonic sum
   is computed in *integer* arithmetic (every term is the exact power
   2^(wmax - rho), summed as BIGINT) and only the final division is
   floating point, which is a single correctly-rounded IEEE op;
 - reproduce bit-identically in any SQL engine with ``md5`` — the
   item hash is the same 60-bit md5-prefix family the dedup/minhash
   operators standardized on (operators/dedup.py:15), so DuckDB
   oracles can re-derive every register and counter exactly.

Estimator constants (alpha_m, the scaled numerators) are computed once
in Python and embedded as double literals on both the Spark and the
oracle side, so both engines parse the identical decimal literal.

HLL follows Flajolet et al. 2007 (the m >= 128 alpha fit plus the
small-range linear-counting correction); CMS is Cormode & Muthukrishnan
2005 (one-sided overestimate, point query = min over d rows); KMV is
the k-minimum-values estimator of Bar-Yossef et al. 2002.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

H_BITS = 60  # 15 md5 hex chars -> nonnegative 60-bit BIGINT


def h60(col: Column) -> Column:
    """60-bit nonnegative hash of a string column (md5 prefix).

    Identical in DuckDB as ``('0x' || substr(md5(x), 1, 15))::BIGINT``.
    """
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


# --------------------------------------------------------------- HLL

def hll_alpha(m: int) -> float:
    """Bias-correction constant for m >= 128 (Flajolet et al. 2007)."""
    if m < 128:
        raise ValueError("hll requires p >= 7 (m >= 128)")
    return 0.7213 / (1.0 + 1.079 / m)


def hll_register_cols(item: Column, p: int) -> tuple[Column, Column]:
    """(reg, rho) expression pair for one item — the single source of
    the register/run-length math, shared by :func:`hll_registers` and
    callers that ride extra aggregates on the same scan (profile)."""
    m = 1 << p
    wmax = H_BITS - p + 1  # rho range: 1 .. wmax (wmax == all-zero rest)
    h = h60(item)
    rest = F.shiftright(h, p)
    rho = (
        F.when(rest == 0, F.lit(wmax))
        .otherwise(F.lit(wmax) - F.length(F.bin(rest)))
        .cast("int")
    )
    return h.bitwiseAND(m - 1), rho


def hll_registers(
    df: DataFrame, group: str, item: Column | str, p: int = 8
) -> DataFrame:
    """Per-(group, register) max run-length table — the HLL sketch.

    register = low ``p`` bits of the 60-bit hash; rho = 1 + number of
    leading zeros of the remaining ``60 - p`` bits.  One hash-aggregate
    shuffle; map-side combine keeps the exchange at <= groups x 2^p
    rows regardless of input size, and the register table is itself
    mergeable (max) across batches/days — the continuous-aggregate
    form of distinct counting.
    """
    it = F.col(item) if isinstance(item, str) else item
    reg, rho = hll_register_cols(it, p)
    return (
        df.where(it.isNotNull())
        .select(
            F.col(group).alias("grp"),
            reg.alias("reg"),
            rho.alias("rho"),
        )
        .groupBy("grp", "reg")
        .agg(F.max("rho").alias("rho"))
    )


def hll_estimate(
    regs: DataFrame,
    p: int = 8,
    group_cols: tuple[str, ...] = ("grp",),
    extra_aggs: list[Column] | None = None,
) -> DataFrame:
    """Cardinality estimate per group from a register table.

    The harmonic sum ``sum_j 2^-M_j`` is scaled by 2^wmax and summed as
    exact integers (absent registers contribute 2^wmax each), so the
    result is independent of aggregation order; for p=8 the total is
    <= 2^61 and cannot overflow BIGINT.  Small-range correction uses
    linear counting ``m * ln(m / zeros)`` when raw <= 2.5m.

    Columns: *group_cols, zeros, sum_scaled, hll_est.
    """
    m = 1 << p
    wmax = H_BITS - p + 1
    num = hll_alpha(m) * (m * m) * float(2**wmax)  # embedded as a literal
    agg = regs.groupBy(*group_cols).agg(
        F.sum(F.expr(f"CAST(power(2.0, {wmax} - rho) AS BIGINT)")).alias("s"),
        F.count("*").alias("nreg"),
        *(extra_aggs or []),
    )
    zeros = (F.lit(m) - F.col("nreg")).cast("long")
    total = F.col("s") + zeros * F.lit(2**wmax)
    raw = F.lit(num) / total.cast("double")
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double")),
    ).otherwise(raw)
    extras = agg.columns[len(group_cols) + 2:]  # extra_aggs outputs
    return agg.select(
        *group_cols, zeros.alias("zeros"), total.alias("sum_scaled"),
        est.alias("hll_est"), *extras,
    )


def hll_distinct(
    df: DataFrame, group: str, item: Column | str, p: int = 8
) -> DataFrame:
    """groupBy(group) approx-distinct(item) via the two stages above."""
    return hll_estimate(hll_registers(df, group, item, p), p)


# --------------------------------------------------------- count-min

def cms_counts(df: DataFrame, item: Column | str, d: int = 4, w: int = 64) -> DataFrame:
    """Count-min sketch: d x w counter grid over an item stream.

    Row r hashes item through md5('r|item'); w is a power of two so the
    bucket is a bit-mask.  The d-way explode happens map-side and the
    single shuffle carries at most d x w counter rows after partial
    aggregation — constant state no matter the stream size, and two
    sketches merge by adding counters (streaming/continuous form).
    """
    if w & (w - 1):
        raise ValueError("w must be a power of two")
    it = F.col(item) if isinstance(item, str) else item
    rows = (
        df.where(it.isNotNull())
        .select(it.alias("it"))
        .select("it", F.explode(F.array([F.lit(r) for r in range(d)])).alias("r"))
    )
    b = h60(F.concat_ws("|", F.col("r").cast("string"), F.col("it"))).bitwiseAND(w - 1)
    return (
        rows.select("r", b.alias("b"))
        .groupBy("r", "b")
        .agg(F.count("*").alias("cnt"))
    )


def cms_point(
    counts: DataFrame, candidates: DataFrame, item: str = "it",
    d: int = 4, w: int = 64,
) -> DataFrame:
    """Point-query the sketch for each candidate item: min over the d
    rows of the item's counter.  Candidates is expected small (the
    query set); the counter table is at most d x w rows, so Spark
    broadcasts it and the probe is shuffle-free on the sketch side.

    Columns: it, cms_cnt (>= true count, never under).
    """
    cand = candidates.select(F.col(item).alias("it")).distinct()
    cand = cand.select(
        "it", F.explode(F.array([F.lit(r) for r in range(d)])).alias("r")
    )
    b = h60(F.concat_ws("|", F.col("r").cast("string"), F.col("it"))).bitwiseAND(w - 1)
    cand = cand.withColumn("b", b)
    j = cand.join(F.broadcast(counts), ["r", "b"], "left")
    return j.groupBy("it").agg(
        F.min(F.coalesce("cnt", F.lit(0))).alias("cms_cnt")
    )


# --------------------------------------------------------------- KMV

def kmv_distinct(
    df: DataFrame, group: str, item: Column | str, k: int = 64
) -> DataFrame:
    """K-minimum-values distinct estimate per group.

    Distinct (group, hash) pairs, then the k smallest hashes per group
    (one window shuffle over the *distinct* table, which is already the
    deduped cardinality — bounded by true distinct count, not stream
    size).  With fewer than k distinct values the k-th minimum does not
    exist and the distinct set itself is exact, so the estimate falls
    back to the observed count; otherwise est = (k-1) * 2^60 / h_(k).

    Columns: grp, n_min (values kept), rk (k-th minimum hash),
    kmv_est.
    """
    it = F.col(item) if isinstance(item, str) else item
    num = float(k - 1) * float(2**H_BITS)  # embedded as a literal
    hashes = (
        df.where(it.isNotNull())
        .select(F.col(group).alias("grp"), h60(it).alias("h"))
        .distinct()
    )
    win = Window.partitionBy("grp").orderBy("h")
    ranked = hashes.withColumn("rn", F.row_number().over(win)).where(
        F.col("rn") <= k
    )
    agg = ranked.groupBy("grp").agg(
        F.max("h").alias("rk"), F.count("*").alias("n_min")
    )
    est = F.when(
        F.col("n_min") < k, F.col("n_min").cast("double")
    ).otherwise(F.lit(num) / F.col("rk").cast("double"))
    return agg.select("grp", "n_min", "rk", est.alias("kmv_est"))


# ------------------------------------------------------------- bloom

def bloom_registers(
    df: DataFrame, group: str, item: Column | str, m: int = 4096, k: int = 4
) -> DataFrame:
    """Per-(group, word) Bloom filter registers over an item stream.

    ``m`` bits (power of two) stored as ``m/32`` words per
    group; hash j of an item is the shared 60-bit md5 family over
    ``'j|item'`` masked to ``m`` (derivable bit-for-bit in any SQL
    engine). ONE hash-aggregate shuffle with map-side combine bounds
    the exchange at ``groups x m/32`` rows at any input size, and two
    register tables merge by ``bit_or`` — the same continuous-
    aggregate/streaming story as the HLL registers above. Membership
    is never under-reported (no false negatives); false-positive rate
    ~ (1 - e^(-k*n/m))^k.
    """
    if m & (m - 1) or m < 64:
        raise ValueError("m must be a power of two >= 64")
    it = F.col(item) if isinstance(item, str) else item
    rows = (
        df.where(it.isNotNull())
        .select(F.col(group).alias("grp"), it.alias("it"))
        .select(
            "grp", "it",
            F.explode(F.array([F.lit(j) for j in range(k)])).alias("j"),
        )
    )
    bit = h60(F.concat_ws("|", F.col("j").cast("string"), F.col("it"))).bitwiseAND(
        m - 1
    )
    return (
        rows.select("grp", bit.alias("_bit"))
        .select(
            "grp",
            F.expr("shiftright(_bit, 5)").alias("word"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(_bit & 31 AS INT))").alias(
                "mask"
            ),
        )
        .groupBy("grp", "word")
        .agg(F.expr("bit_or(mask)").alias("bits"))
    )


def bloom_probe(
    registers: DataFrame,
    candidates: DataFrame,
    group: str = "grp",
    item: str = "it",
    m: int = 4096,
    k: int = 4,
) -> DataFrame:
    """Probe (group, item) candidates against a register table:
    might_contain is true iff ALL k bits are set. The register table is
    bounded (groups x m/32 rows), so it broadcasts and the probe is
    shuffle-free on the register side.

    Columns: grp, it, might_contain.
    """
    cand = candidates.select(
        F.col(group).alias("grp"), F.col(item).alias("it")
    ).distinct()
    cand = cand.select(
        "grp", "it", F.explode(F.array([F.lit(j) for j in range(k)])).alias("j")
    )
    bit = h60(F.concat_ws("|", F.col("j").cast("string"), F.col("it"))).bitwiseAND(
        m - 1
    )
    cand = cand.select("grp", "it", bit.alias("_bit")).select(
        "grp", "it",
        F.expr("shiftright(_bit, 5)").alias("word"),
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(_bit & 31 AS INT))").alias("need"),
    )
    j = cand.join(F.broadcast(registers), ["grp", "word"], "left")
    hit = (
        F.coalesce(F.col("bits"), F.lit(0)).bitwiseAND(F.col("need")) == F.col("need")
    )
    return j.groupBy("grp", "it").agg(F.min(hit.cast("int")).cast("boolean").alias("might_contain"))
