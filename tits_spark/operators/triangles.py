"""Exact triangle counting + local clustering coefficients.

The degree-orientation algorithm (Suri & Vassilvitskii, WWW'11 — the
standard MapReduce/Spark formulation): orient every undirected edge
from its (degree, id)-smaller endpoint to the larger one. The oriented
graph is acyclic and every out-neighborhood is small — a node of
degree d has at most O(sqrt(|E|)) out-edges — so the wedge self-join
(the quadratic step) is bounded by the sum of squared OUT-degrees,
not raw degrees: the hot-vertex blowup that kills the naive
wedge count on skewed graphs (a degree-10^6 hub contributes 10^12
naive wedges, but only its out-wedges here) is structurally capped.
Each triangle is then found exactly once, at its unique apex (the
(degree, id)-minimum vertex).

Plan: two equi-joins (wedge build + closing-edge probe) and two hash
aggs — no cartesian anywhere; everything shuffles on node keys. The
(degree, id) total order is compared tuple-wise inline, so no global
ranking window is needed (unbounded global windows are banned in this
repo outside k-row frames).

Per-node outputs: triangle count t_v and the local clustering
coefficient c_v = 2 * t_v / (d_v * (d_v - 1)) on the floor-1e6
lattice (exact integer inputs -> identical double on both engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from tits_spark.functions.exprs import epoch_us, floordiv


def chain_edges(
    df: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    event_col: str = "event_type",
    bucket_us: int = 3_600_000_000,
    links: int = 3,
) -> DataFrame:
    """Bounded-degree co-activity graph: within each (event_type,
    time-bucket) cell, users ordered by (first-seen ts, id) link to
    the next ``links`` users in the chain. Unlike a full within-cell
    clique (quadratic in cell size — the hot-cell blowup
    pagerank.coactivity_edges has to CAP away, emptying the graph when
    every cell is hot), each membership contributes <= 2*links edges
    at ANY cell size, so the graph stays non-trivial and linear in the
    input at every scale — sparsification by construction, not by
    filter. Returns symmetric distinct (src, dst)."""
    cells = (
        df.select(
            F.col(key).alias("_k"),
            F.col(event_col).alias("_et"),
            epoch_us(ts).alias("_u"),
        )
        .withColumn("_b", floordiv(F.col("_u"), int(bucket_us)))
        .groupBy("_k", "_et", "_b")
        .agg(F.min("_u").alias("_first"))
    )
    # all `links` leads in ONE window pass over one scan (a per-lead
    # derived frame would re-run the cells aggregation per link), then
    # one explode
    w = Window.partitionBy("_et", "_b").orderBy("_first", "_k")
    lead_cols = [
        F.lead("_k", i).over(w).alias(f"_n{i}") for i in range(1, int(links) + 1)
    ]
    leads = (
        cells.select("_k", *lead_cols)
        .select(
            "_k",
            F.explode(
                F.array(*[F.col(f"_n{i}") for i in range(1, int(links) + 1)])
            ).alias("_nxt"),
        )
        .filter(F.col("_nxt").isNotNull())
    )
    half = (
        leads.select(
            F.least("_k", "_nxt").alias("src"),
            F.greatest("_k", "_nxt").alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    return half.unionAll(
        half.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )


def triangle_counts(edges: DataFrame) -> DataFrame:
    """Count triangles per node over a SYMMETRIC edge list (src, dst)
    with no self-loops (e.g. pagerank.coactivity_edges). Returns
    (key, degree, n_tri, clustering_u6) for every node, zero-triangle
    nodes included; degree-<2 nodes report clustering 0."""
    # The edge list feeds degrees, both wedge sides, the closing-edge
    # probe and the final output join; without materialization Catalyst
    # replicates the whole upstream subtree (cells agg + window +
    # explode + distinct + union) ~12x in one plan (measured: q21
    # triangles 5.6s -> 2.9s). localCheckpoint (the dedup_clusters
    # device) computes it once and truncates the lineage; blocks are
    # GC'd when the frame goes out of scope.
    edges = edges.localCheckpoint(eager=True)
    deg = edges.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).cast("long").alias("d")
    )
    half = edges.filter(F.col("src") < F.col("dst"))
    da = deg.select(F.col("node").alias("src"), F.col("d").alias("da"))
    db = deg.select(F.col("node").alias("dst"), F.col("d").alias("db"))
    h = half.join(da, "src").join(db, "dst")
    # orient low (degree, id) -> high; ties in degree break on id
    lo_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("src") < F.col("dst"))
    )
    oriented = h.select(
        F.when(lo_first, F.col("src")).otherwise(F.col("dst")).alias("u"),
        F.when(lo_first, F.col("dst")).otherwise(F.col("src")).alias("v"),
        F.when(lo_first, F.col("db")).otherwise(F.col("da")).alias("dv"),
    )
    # numbered repartition before the wedge fan-out: the oriented edge
    # list is tiny in BYTES (what AQE's advisory-size coalescing sees)
    # but each row amplifies into out-degree^2 wedge work — without
    # this the whole quadratic stage lands on 1-2 tasks (the
    # guess_lag/holt numbered-repartition device; exempt from AQE
    # coalescing)
    nparts = edges.sparkSession.sparkContext.defaultParallelism
    oriented = oriented.repartition(nparts, "u")
    # wedges at the apex u: unordered out-pairs, ordered by (deg, id)
    e1 = oriented.select("u", F.col("v").alias("x"), F.col("dv").alias("dx"))
    e2 = oriented.select("u", F.col("v").alias("y"), F.col("dv").alias("dy"))
    wedges = e1.join(e2, "u").filter(
        (F.col("dx") < F.col("dy"))
        | ((F.col("dx") == F.col("dy")) & (F.col("x") < F.col("y")))
    )
    closing = oriented.select(F.col("u").alias("x"), F.col("v").alias("y"))
    # shuffle-hash, not sort-merge: the wedge side is out-degree^2-many
    # rows and sorting it dominates the stage (measured 2.8s -> 1.2s);
    # the closing side is |E| — too big to broadcast at scale, but its
    # per-partition hash table is exactly the SHJ build side (guide §3.1)
    tris = (
        wedges.join(closing.hint("shuffle_hash"), ["x", "y"])
        .select("u", "x", "y")
    )
    # each triangle credits all three corners — ONE explode, not three
    # unions (each union branch would re-execute the wedge join)
    corners = tris.select(
        F.explode(F.array(F.col("u"), F.col("x"), F.col("y"))).alias("node")
    )
    per_node = corners.groupBy("node").agg(
        F.count(F.lit(1)).cast("long").alias("n_tri")
    )
    out = deg.join(per_node, "node", "left").select(
        F.col("node").alias("key"),
        F.col("d").alias("degree"),
        F.coalesce(F.col("n_tri"), F.lit(0)).cast("long").alias("n_tri"),
    )
    cc = F.when(
        F.col("degree") >= 2,
        F.floor(
            (2.0 * F.col("n_tri")) / (F.col("degree") * (F.col("degree") - 1)) * 1e6
        ).cast("long"),
    ).otherwise(F.lit(0).cast("long"))
    return out.withColumn("clustering_u6", cc)
