"""Distribution drift per key: exact binned Wasserstein-1 (earth
mover) distance to the corpus distribution.

W1 between two empirical CDFs is the area between them,
integral |F_a(x) - F_g(x)| dx (Vallender 1974, public identity) — the
data-quality drift score that, unlike KL (operators/complexity.
kl_vs_global), is finite on disjoint supports and weights mistakes by
HOW FAR the mass moved.

Exactness device: on the dollar-bin lattice, scale both CDFs by the
two row counts —

    |cumA * nG - cumG * nA|  summed with the bin-gap weight dv

is pure BIGINT arithmetic (no fraction until the very last division
by nA * nG), so partial-agg order cannot move the result; past the
last populated bin both scaled CDFs cancel exactly. The lattice is
the same histogram discipline as operators/quantiles.py: constant
width regardless of input size.

Plan shape: ONE tiny global frame (bins x cumulative counts, window
over <= lattice-width rows), broadcast onto the key list — an
explicit bounded grid build of keys x bins rows (this is the one
sanctioned cross join in the package: its size is keys * lattice
width, data-independent per key) — then one left join of the per-key
bin counts and one ordered window per key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def w1_vs_global(
    df: DataFrame,
    key: str = "key",
    value: str = "value",
    bin_cents: int = 100,
) -> DataFrame:
    """Per-key binned W1 distance to the pooled corpus distribution.

    Returns (key, n, w1_u6): W1 in bin-width units on the floor-1e6
    lattice. Bins are floor(cents / bin_cents). The global
    distribution INCLUDES each key's own rows (the standard
    one-vs-rest-plus-self drift convention — cheap, and the bias
    vanishes as 1/n_keys)."""
    cents = F.round(F.col(value) * 100).cast("long")
    binned = df.select(
        F.col(key).alias("key"),
        F.floor(cents / int(bin_cents)).cast("long").alias("b"),
    )
    g = (
        binned.groupBy("b")
        .agg(F.count(F.lit(1)).alias("cg"))
    )
    # bounded-global-window: the global frame is at most the histogram
    # lattice width (value_range / bin_cents rows), data-independent
    wg = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, 0)
    wl = Window.orderBy("b")
    g = (
        g.withColumn("cumg", F.sum("cg").over(wg))
        .withColumn(
            "dv", F.coalesce(F.lead("b").over(wl) - F.col("b"), F.lit(0))
        )
    )
    ng = binned.count()
    keys = binned.groupBy("key").agg(F.count(F.lit(1)).alias("na"))
    grid = keys.crossJoin(F.broadcast(g.select("b", "cumg", "dv")))
    a = binned.groupBy("key", "b").agg(F.count(F.lit(1)).alias("ca"))
    wk = Window.partitionBy("key").orderBy("b").rowsBetween(
        Window.unboundedPreceding, 0
    )
    joined = (
        grid.join(a, ["key", "b"], "left")
        .withColumn("cuma", F.sum(F.coalesce("ca", F.lit(0))).over(wk))
    )
    term = (
        F.abs(
            F.col("cuma").cast("decimal(19,0)") * F.lit(int(ng))
            - F.col("cumg").cast("decimal(19,0)") * F.col("na")
        ).cast("decimal(38,0)")
        * F.col("dv")
    ).cast("decimal(38,0)")
    return (
        joined.groupBy("key")
        .agg(F.max("na").alias("na"), F.sum(term).alias("s"))
        .select(
            "key",
            F.col("na").cast("long").alias("n"),
            F.floor(
                F.col("s").cast("double")
                / (F.col("na").cast("double") * float(ng))
                * 1e6
            ).cast("long").alias("w1_u6"),
        )
    )


def psi_vs_global(
    df: DataFrame,
    key: str = "key",
    value: str = "value",
    bin_cents: int = 100,
    min_rows: int = 50,
) -> DataFrame:
    """Population Stability Index per key vs the pooled corpus on the
    same dollar-bin lattice as :func:`w1_vs_global` — the
    industry-standard scorecard drift readout (PSI < 0.1 stable,
    0.1-0.25 drifting, > 0.25 shifted) that completes the drift
    battery: W1 weighs *distance* moved, KL blows up on missing
    support, PSI is the banded report reviewers expect.

        PSI = sum_bins (p_b - q_b) * ln(p_b / q_b)

    with Laplace-smoothed shares p_b = (a_b + 1)/(n_a + B),
    q_b = (g_b + 1)/(n_g + B) over the B populated corpus bins (the
    smoothing makes every bin well-defined; both shares use the same
    B, so a key identical to the corpus scores ~0).  Every per-bin
    term is >= 0 (the two factors always share sign), so terms are
    floored to the integer ppb lattice — floor(1e9 * term) over the
    identical double tree on both engines — and summed as exact
    BIGINT; the readout is psi_ppb / 1e9 (floor device, no round).

    Plan shape: w1_vs_global's exactly — ONE bounded global bin frame
    broadcast onto the key list (the sanctioned keys x lattice-width
    grid), one left join of per-key bin counts, one hash agg.  No
    per-key window needed at all (PSI has no CDF).

    Returns (key, n, n_bins, psi_ppb, psi); keys under ``min_rows``
    drop.
    """
    cents = F.round(F.col(value) * 100).cast("long")
    binned = df.select(
        F.col(key).alias("key"),
        F.floor(cents / int(bin_cents)).cast("long").alias("b"),
    )
    g = binned.groupBy("b").agg(F.count(F.lit(1)).alias("cg"))
    ng = binned.count()
    nb = g.count()  # B: populated corpus bins (bounded lattice width)
    keys = (
        binned.groupBy("key")
        .agg(F.count(F.lit(1)).alias("na"))
        .filter(F.col("na") >= int(min_rows))
    )
    grid = keys.crossJoin(F.broadcast(g.select("b", "cg")))
    a = binned.groupBy("key", "b").agg(F.count(F.lit(1)).alias("ca"))
    joined = grid.join(a, ["key", "b"], "left")
    pa = (F.coalesce(F.col("ca"), F.lit(0)) + 1).cast("double") / (
        F.col("na") + F.lit(int(nb))
    ).cast("double")
    qa = (F.col("cg") + 1).cast("double") / F.lit(float(ng + nb))
    term = F.floor(F.lit(1e9) * ((pa - qa) * F.log(pa / qa))).cast("long")
    return (
        joined.groupBy("key")
        .agg(F.max("na").alias("na"), F.sum(term).alias("psi_ppb"))
        .select(
            "key",
            F.col("na").cast("long").alias("n"),
            F.lit(int(nb)).cast("long").alias("n_bins"),
            F.col("psi_ppb").cast("long").alias("psi_ppb"),
            (F.col("psi_ppb").cast("double") / F.lit(1e9)).alias("psi"),
        )
    )
