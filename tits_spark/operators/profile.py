"""Data-quality profiling: per-column completeness, distinctness, and
extrema over the table — with a sketched distinct count for
unbounded-cardinality columns.

The standard pre-training data gate (the Deequ/Great-Expectations
shape): before a 100 TB corpus feeds a pipeline, every column gets
row count, null count, distinct count, and min/max. Spark-first
formulation:

 - count / null / min / max / exact-distinct run as ONE wide
   aggregate — one scan, partial+final everywhere; the exact
   count(DISTINCT) uses Spark's standard two-phase expand.
 - **approx mode (default for string columns)**: exact
   ``count_distinct`` on an unbounded column (e.g. multi-KB ``text``)
   plans an expand + exchange that shuffles every distinct value
   across the cluster — at 100 TB that is the profile's entire cost.
   Instead, string columns use the engine's own deterministic
   HyperLogLog (operators/sketches.py): a second, column-pruned scan
   stacks the approx columns into (col_name, value) rows map-side,
   aggregates HLL registers with map-side combine (exchange bounded by
   ``n_cols x 2^p`` rows regardless of input size), and the estimates
   broadcast-join back onto the profile. No full-value shuffle ever.

Output is long format (one row per column, values rendered to strings)
so heterogeneous column types coexist in one DataFrame. In exact mode
(``approx=False`` or no string columns selected) the schema is
(col_name, n_rows, n_null, n_distinct, min_s, max_s) — unchanged from
the original operator. When any column is sketched the schema gains
``n_distinct_est`` (double): exact columns carry ``n_distinct`` and a
NULL estimate; sketched columns carry a NULL ``n_distinct`` and the
HLL estimate rounded to 4dp (the same cross-engine-stable rendering
the hll_distinct oracle uses).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, TimestampNTZType, TimestampType

from tits_spark.operators.sketches import hll_estimate, hll_registers


def data_profile(
    df: DataFrame,
    columns: list[str] | None = None,
    approx: str | bool | list[str] = "auto",
    p: int = 12,
) -> DataFrame:
    """Per-column profile; see module docstring for the two modes.

    ``approx``: "auto" (default) sketches every *string and timestamp*
    column and keeps keys/enums/numerics exact; ``False``/``[]`` forces exact
    count_distinct everywhere (the original single-aggregate plan);
    a list names the columns to sketch explicitly. ``p`` is the HLL
    precision (m = 2^p registers; p=12 ≈ 1.6 % relative error).

    min/max are rendered with CAST(x AS STRING) — exact for integers
    and strings; floats use Spark's shortest-roundtrip rendering (same
    convention either side of the oracle gate). NULL-only columns
    render NULL extrema. ``n_distinct`` counts non-null distincts.
    """
    cols = columns or df.columns
    if approx == "auto":
        # strings AND timestamps: both are unbounded-cardinality (an
        # event-time column has ~one distinct value per row, so its
        # exact count_distinct shuffles the whole table too)
        unbounded = {
            f.name
            for f in df.schema.fields
            if isinstance(f.dataType, (StringType, TimestampType, TimestampNTZType))
        }
        approx_cols = [c for c in cols if c in unbounded]
    elif not approx:
        approx_cols = []
    else:
        approx_cols = [c for c in approx if c in cols]
    exact = [c for c in cols if c not in approx_cols]

    # The wide aggregate splits in two (guide §2.3 / §7.2): string
    # min/max makes the aggregation buffer variable-width, and MIXING
    # it with count_distinct rewrites the whole thing into a keyed
    # SortAggregate that fully SORTS every wide row (text payloads
    # included) before aggregating — measured as the dominant cost of
    # the bench profile.  Separating them keeps (a) a keys-free global
    # aggregate for count/null/min/max (no sort, strings fine) and
    # (b) a column-pruned two-phase hash aggregate per exact-distinct
    # column; the 1-row results cross-join for free.
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__null"),
            F.min(F.col(c)).cast("string").alias(f"{c}__min"),
            F.max(F.col(c)).cast("string").alias(f"{c}__max"),
        ]
    wide = df.agg(*aggs)
    if exact:
        dist = df.agg(
            *[F.count_distinct(F.col(c)).alias(f"{c}__dist") for c in exact]
        )
        wide = wide.crossJoin(dist)

    def dist_slot(c: str) -> str:
        return f"{c}__dist" if c in exact else "CAST(NULL AS BIGINT)"

    stacked = wide.select(
        F.expr(
            "stack({n}, {args}) as (col_name, n_rows, n_null, n_distinct, min_s, max_s)".format(
                n=len(cols),
                args=", ".join(
                    f"'{c}', __n, {c}__null, {dist_slot(c)}, {c}__min, {c}__max"
                    for c in cols
                ),
            )
        )
    )
    if not approx_cols:
        return stacked

    # second scan, pruned to the sketched columns only: stack to
    # (col_name, value) map-side, then the register aggregate — the one
    # exchange carries <= n_cols x 2^p register rows, never the values
    items = df.select(
        F.expr(
            "stack({n}, {args}) as (grp, it)".format(
                n=len(approx_cols),
                args=", ".join(f"'{c}', CAST({c} AS STRING)" for c in approx_cols),
            )
        )
    )
    est = hll_estimate(hll_registers(items, "grp", "it", p), p).select(
        F.col("grp").alias("col_name"),
        F.round("hll_est", 4).alias("__est"),
    )
    out = stacked.join(F.broadcast(est), "col_name", "left")
    is_approx = F.col("col_name").isin(approx_cols)
    return out.select(
        "col_name", "n_rows", "n_null", "n_distinct",
        F.when(is_approx, F.coalesce(F.col("__est"), F.lit(0.0)))
        .otherwise(F.lit(None).cast("double"))
        .alias("n_distinct_est"),
        "min_s", "max_s",
    )
