"""Embedding-space label coherence — "how tight is each label's
cluster, and which members don't belong?" The quality-audit layer
over the similarity stack (operators/similarity.py does retrieval;
this scores the PARTITIONING): a training-data label whose members
scatter away from their own centroid is mislabeled, multi-modal, or
contaminated — exactly what a curation pass needs to rank before
sampling.

Per label L with members v_1..v_n and centroid c = mean(v_i), the
member-to-centroid cosines summarize the cluster: mean cosine =
coherence, min cosine = the worst outlier.

Spark-shaped exactness (float vector sums are order-dependent, so the
raw floats never enter an aggregation):

 - every component is quantized ONCE to the floor-1e4 lattice,
   q = floor(1e4 * x) — exact int64, identical cross-engine;
 - the centroid is represented by the component SUMS S_p = sum_i q_ip
   (exact int64; the 1/n scale cancels in the cosine), computed by one
   (label, pos) aggregate over the posexploded components;
 - per member, dot = sum_p q_p * S_p, |q|^2 = sum q^2, |S|^2 = sum S^2
   are exact (decimal(38,0) — at 10^12-row labels the dot's terms
   exceed int64), and cos = dot / sqrt(|q|^2 * |S|^2) is one double
   tree per member, quantized to the floor-1e9 lattice BEFORE the
   per-label mean (the mutual_info discipline);
 - a zero member (all components quantize to 0) or a zero centroid
   has no cosine: such members are COUNTED (n_zero) and excluded,
   the same exact-integer decision on both engines.

Plan shape: posexplode (map-side) -> one (label, pos) hash aggregate
(the centroid table: labels x dim rows, tiny) -> equi-join back on
(label, pos) -> one (vec) aggregate -> one (label) aggregate. All
equi-joins on bounded frames; no cartesian, no UDF, no window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEC = "decimal(38,0)"


def label_coherence(
    df: DataFrame,
    id_col: str = "vec_id",
    label_col: str = "label",
    emb_col: str = "embedding",
    min_members: int = 2,
) -> DataFrame:
    """Per-label centroid coherence over an array<float> column.

    Returns (label, n_vecs, n_zero, mean_cos_u9, min_cos_u9): member
    count, zero-member count, and the mean / minimum member-to-
    centroid cosine on the floor-1e9 lattice. Labels with fewer than
    ``min_members`` members drop."""
    comp = df.select(
        F.col(id_col).alias("vec"),
        F.col(label_col).alias("label"),
        F.posexplode(F.col(emb_col)).alias("pos", "x"),
    ).select(
        "vec",
        "label",
        "pos",
        F.floor(F.col("x").cast("double") * 1e4).cast("long").alias("q"),
    )
    cent = comp.groupBy("label", "pos").agg(F.sum("q").alias("s"))
    per_vec = (
        comp.join(cent, ["label", "pos"])
        .groupBy("label", "vec")
        .agg(
            F.sum(F.col("q").cast(DEC) * F.col("s")).alias("dot"),
            F.sum(F.col("q").cast(DEC) * F.col("q")).alias("q2"),
            F.sum(F.col("s").cast(DEC) * F.col("s")).alias("s2"),
        )
    )
    ok = (F.col("q2") > 0) & (F.col("s2") > 0)
    cosq = F.floor(
        F.col("dot").cast("double")
        / F.sqrt(F.col("q2").cast("double") * F.col("s2").cast("double"))
        * 1e9
    ).cast("long")
    scored = per_vec.select(
        "label", F.when(ok, cosq).alias("cq")
    )
    agg = (
        scored.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.sum(F.col("cq").isNull().cast("long")).alias("n_zero"),
            F.sum("cq").alias("_sc"),
            F.min("cq").alias("min_cos_u9"),
        )
        .filter(F.col("n_vecs") >= int(min_members))
    )
    n_ok = F.col("n_vecs") - F.col("n_zero")
    return agg.select(
        "label",
        F.col("n_vecs").cast("long").alias("n_vecs"),
        F.col("n_zero").cast("long").alias("n_zero"),
        F.when(
            n_ok > 0,
            F.floor(
                F.col("_sc").cast("double") / n_ok.cast("double")
            ).cast("long"),
        ).alias("mean_cos_u9"),
        F.col("min_cos_u9").cast("long").alias("min_cos_u9"),
    )
