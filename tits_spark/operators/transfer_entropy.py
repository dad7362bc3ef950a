"""Binary transfer entropy between two irregular series on the shared
LOCF bucket grid — directed information flow x->y AND y->x in one
pass, the model-free complement of the linear Granger F-test
(operators/granger.py shares the identical grid).

Schreiber's transfer entropy (PRL 2000) with the Marschinski-Kantz
binary move discretization (Eur. Phys. J. B 2002): each side's grid
series becomes an up-move bit s_t = [v_t > v_{t-1}] (a pure lattice
comparison — no median, no float quantile), and

    TE(x->y) = sum_{y_t, y_{t-1}, x_{t-1}}  p(y_t, y_{t-1}, x_{t-1})
               * ln[ p(y_t | y_{t-1}, x_{t-1}) / p(y_t | y_{t-1}) ]

estimated by plug-in counts. Both directions come from ONE 16-cell
joint lattice (y_t, y_{t-1}, x_t, x_{t-1}): TE(x->y) marginalizes out
x_t, TE(y->x) marginalizes out y_t — so the whole operator is a
single hash aggregation per key (16 conditional sums), no second
shuffle, no UDF, no explode beyond the shared grid's bounded spine.

Exactness: every cell count and marginal is an exact int64 (sums of
disjoint conditional counts). The entropy is a FIXED left-associated
8-term double tree per direction — each term
``c * ln((c*ca)/(cab*cy))`` over exact-double integer inputs (counts
below 2^26 keep every product < 2^53, documented bound) — evaluated
identically by both engines, then one division by n and round(6) with
signed zero normalized. Zero cells contribute exactly 0.0 by guard,
not by 0*ln(0) evaluation.

Reference analog: the reference aligns asynchronous series onto a
shared grid before any cross-series statistic
(ref:/root/reference/src/guess_lag.c pairwise alignment); this is the
information-theoretic member of that family.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from tits_spark.operators.granger import locf_bucket_grid


def _te_terms(c3, marg_ctx, marg_tgt, marg_past) -> Column:
    """Fixed left-associated 8-term plug-in TE sum (nats, unscaled).

    ``c3[t, p, o]``: count of (target_now=t, target_past=p, other_past=o);
    ``marg_ctx[p, o]``, ``marg_tgt[t, p]``, ``marg_past[p]``: its exact
    integer marginals. Iteration order (t, p, o) each in (0, 1) is part
    of the cross-engine contract — the oracle SQL writes the same
    chain.
    """
    total = None
    for t in (0, 1):
        for p in (0, 1):
            for o in (0, 1):
                c = c3[(t, p, o)]
                cd = c.cast("double")
                ratio = (cd * marg_past[p].cast("double")) / (
                    marg_ctx[(p, o)].cast("double")
                    * marg_tgt[(t, p)].cast("double")
                )
                term = F.when(c > 0, cd * F.log(ratio)).otherwise(F.lit(0.0))
                total = term if total is None else total + term
    return total


def transfer_entropy(
    df: DataFrame,
    key: str = "key",
    ts: str = "ts",
    value: str = "value",
    series: str = "series",
    x_side: str = "x",
    y_side: str = "y",
    bucket_secs: int = 3600,
    min_points: int = 25,
    include_cells: bool = False,
    grid: DataFrame | None = None,
) -> DataFrame:
    """Per-key binary transfer entropy in both directions.

    Returns (key, n_obs, te_xy, te_yx): the joint-lattice sample count
    and the two directed plug-in estimates in nats (round 6). Rows
    enter the lattice when both sides have three consecutive resolved
    grid values (two moves each); keys below ``min_points`` samples
    are dropped (plug-in TE is meaningless on a near-empty 16-cell
    table). ``include_cells=True`` appends the 16 exact lattice counts
    m0..m15 (index yb*8 + ya*4 + xb*2 + xa) — the streaming twin's
    bit-exact comparison surface.
    """
    if grid is None:
        grid = locf_bucket_grid(
            df, key, ts, value, series, x_side, y_side, bucket_secs
        )
    wo = Window.partitionBy("key").orderBy("b")
    lagged = grid.select(
        "key",
        F.col("yc").alias("y0"),
        F.lag("yc", 1).over(wo).alias("y1"),
        F.lag("yc", 2).over(wo).alias("y2"),
        F.col("xc").alias("x0"),
        F.lag("xc", 1).over(wo).alias("x1"),
        F.lag("xc", 2).over(wo).alias("x2"),
    ).filter(
        F.col("y0").isNotNull() & F.col("y2").isNotNull()
        & F.col("x0").isNotNull() & F.col("x2").isNotNull()
    )
    st = lagged.select(
        "key",
        (F.col("y0") > F.col("y1")).cast("int").alias("yb"),
        (F.col("y1") > F.col("y2")).cast("int").alias("ya"),
        (F.col("x0") > F.col("x1")).cast("int").alias("xb"),
        (F.col("x1") > F.col("x2")).cast("int").alias("xa"),
    )
    cells = st.groupBy("key").agg(
        F.count(F.lit(1)).alias("n_obs"),
        *[
            F.sum(
                F.when(
                    (F.col("yb") == (i >> 3) & 1)
                    & (F.col("ya") == (i >> 2) & 1)
                    & (F.col("xb") == (i >> 1) & 1)
                    & (F.col("xa") == i & 1),
                    1,
                ).otherwise(0)
            ).alias(f"m{i}")
            for i in range(16)
        ],
    ).filter(F.col("n_obs") >= int(min_points))

    m = {
        (i >> 3 & 1, i >> 2 & 1, i >> 1 & 1, i & 1): F.col(f"m{i}")
        for i in range(16)
    }
    # x -> y: target y, marginalize out x_t (xb)
    c3_xy = {
        (t, p, o): m[(t, p, 0, o)] + m[(t, p, 1, o)]
        for t in (0, 1) for p in (0, 1) for o in (0, 1)
    }
    # y -> x: target x, marginalize out y_t (yb)
    c3_yx = {
        (t, p, o): m[(0, o, t, p)] + m[(1, o, t, p)]
        for t in (0, 1) for p in (0, 1) for o in (0, 1)
    }
    # r06: the marginal pyramids are aliased through two layered
    # projections instead of inlining each sum into all eight TE terms
    # (the welch_anova device — the inlined tree cost ~0.75 s of py4j
    # per call; operation trees and the documented left-association
    # are unchanged, the nodes are just shared).
    keep = ["key", "n_obs", *[f"m{i}" for i in range(16)]]
    l1 = cells.select(
        *keep,
        *[c3_xy[k].alias(f"_cxy{k[0]}{k[1]}{k[2]}") for k in c3_xy],
        *[c3_yx[k].alias(f"_cyx{k[0]}{k[1]}{k[2]}") for k in c3_yx],
    )
    c3_xy = {k: F.col(f"_cxy{k[0]}{k[1]}{k[2]}") for k in c3_xy}
    c3_yx = {k: F.col(f"_cyx{k[0]}{k[1]}{k[2]}") for k in c3_yx}
    ctx_xy = {
        (p, o): c3_xy[(0, p, o)] + c3_xy[(1, p, o)]
        for p in (0, 1) for o in (0, 1)
    }
    tgt_xy = {
        (t, p): c3_xy[(t, p, 0)] + c3_xy[(t, p, 1)]
        for t in (0, 1) for p in (0, 1)
    }
    ctx_yx = {
        (p, o): c3_yx[(0, p, o)] + c3_yx[(1, p, o)]
        for p in (0, 1) for o in (0, 1)
    }
    tgt_yx = {
        (t, p): c3_yx[(t, p, 0)] + c3_yx[(t, p, 1)]
        for t in (0, 1) for p in (0, 1)
    }
    l2 = l1.select(
        "*",
        *[ctx_xy[k].alias(f"_xxy{k[0]}{k[1]}") for k in ctx_xy],
        *[tgt_xy[k].alias(f"_txy{k[0]}{k[1]}") for k in tgt_xy],
        *[ctx_yx[k].alias(f"_xyx{k[0]}{k[1]}") for k in ctx_yx],
        *[tgt_yx[k].alias(f"_tyx{k[0]}{k[1]}") for k in tgt_yx],
    )
    ctx_xy = {k: F.col(f"_xxy{k[0]}{k[1]}") for k in ctx_xy}
    tgt_xy = {k: F.col(f"_txy{k[0]}{k[1]}") for k in tgt_xy}
    ctx_yx = {k: F.col(f"_xyx{k[0]}{k[1]}") for k in ctx_yx}
    tgt_yx = {k: F.col(f"_tyx{k[0]}{k[1]}") for k in tgt_yx}
    past_xy = {p: ctx_xy[(p, 0)] + ctx_xy[(p, 1)] for p in (0, 1)}
    past_yx = {p: ctx_yx[(p, 0)] + ctx_yx[(p, 1)] for p in (0, 1)}

    n = F.col("n_obs").cast("double")
    te_xy = _te_terms(c3_xy, ctx_xy, tgt_xy, past_xy) / n
    te_yx = _te_terms(c3_yx, ctx_yx, tgt_yx, past_yx) / n
    return l2.select(
        "key", "n_obs",
        (F.round(te_xy, 6) + F.lit(0.0)).alias("te_xy"),
        (F.round(te_yx, 6) + F.lit(0.0)).alias("te_yx"),
        *([f"m{i}" for i in range(16)] if include_cells else []),
    )
