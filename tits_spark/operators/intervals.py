"""Bucketized interval joins: point-in-interval and interval-overlap.

Spark has no native range/interval join, and the naive formulation
(`a JOIN b ON a.ts BETWEEN b.lo AND b.hi`) plans as a broadcast
nested-loop or cartesian product — quadratic and fatal at 100 TB. The
standard scale-out reformulation is temporal bucketing: quantize time
into fixed buckets, explode each interval to the buckets it covers,
and equi-join on the bucket key. The join is then an ordinary hash
shuffle whose fan-out is bounded by (interval span / bucket width),
and every Catalyst join optimization (AQE skew split, broadcast of a
small side) applies as usual.

Dedup discipline:
 - a point lives in exactly one bucket, so point-in-interval emits
   each qualifying (point, interval) pair exactly once — no distinct;
 - interval-overlap restricts the emit to the FIRST bucket both
   intervals share (`bucket == greatest(lo_bucket_a, lo_bucket_b)`),
   the classic duplicate-free trick, so no distinct there either.

All timestamp arithmetic is exact integer microseconds (epoch_us +
floordiv) — no float epoch, no DST surprises (session tz is pinned
UTC project-wide).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from tits_spark.functions.exprs import epoch_us, floordiv


def _bucket(col: Column, width_us: int) -> Column:
    return floordiv(epoch_us(col), width_us)


def _explode_buckets(
    lo: Column, hi: Column, width_us: int, max_buckets: int
) -> Column:
    """Array of bucket ids [bucket(lo) .. bucket(hi)], with a runtime
    guard: an interval covering more than ``max_buckets`` buckets
    raises instead of silently exploding the stage (a single year-long
    interval at 1-minute buckets is a 525k-row fan-out — almost always
    a caller bug; widen the bucket instead)."""
    b_lo, b_hi = floordiv(lo, width_us), floordiv(hi, width_us)
    n = b_hi - b_lo + 1
    return (
        F.when(
            n > max_buckets,
            F.raise_error(
                F.concat(
                    F.lit("interval spans "), n.cast("string"),
                    F.lit(f" buckets > max_buckets={max_buckets}; widen bucket_seconds"),
                )
            ).cast("array<long>"),
        )
        .when(
            n < 1,
            F.raise_error(F.lit("invalid interval: hi < lo")).cast("array<long>"),
        )
        .otherwise(F.sequence(b_lo, b_hi))
    )


def point_in_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str = "ts",
    lo: str = "start_ts",
    hi: str = "end_ts",
    bucket_seconds: int = 3600,
    max_buckets: int = 4096,
    keys: list[str] | None = None,
) -> DataFrame:
    """Inner join of each point to every interval containing it
    (``lo <= ts <= hi``, both ends inclusive).

    Returns points columns + interval columns (names must not collide
    apart from the join internals). One shuffle per side, keyed on the
    time bucket; each matched pair appears exactly once because a point
    belongs to exactly one bucket.

    ``keys``: entity columns present on BOTH sides that must also
    match (e.g. user_id). Folding them into the equi-join key matters
    at scale: without it every point in an hour collides with every
    interval touching that hour across ALL entities — the hash join's
    per-key bucket degenerates into a within-bucket cross product.
    """
    keys = list(keys or [])
    w_us = int(bucket_seconds) * 1_000_000
    p = points.withColumn("_b", _bucket(F.col(point_ts), w_us))
    iv = intervals.withColumn(
        "_b",
        F.explode(
            _explode_buckets(
                epoch_us(F.col(lo)), epoch_us(F.col(hi)), w_us, max_buckets
            )
        ),
    )
    joined = p.join(iv, ["_b", *keys]).filter(
        (F.col(point_ts) >= F.col(lo)) & (F.col(point_ts) <= F.col(hi))
    )
    return joined.drop("_b")


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_lo: str = "start_ts",
    left_hi: str = "end_ts",
    right_lo: str = "r_start_ts",
    right_hi: str = "r_end_ts",
    bucket_seconds: int = 3600,
    max_buckets: int = 4096,
    keys: list[str] | None = None,
) -> DataFrame:
    """Inner join of every overlapping interval pair
    (``left.lo <= right.hi AND right.lo <= left.hi``, closed ends).

    Both sides explode to their covered buckets and equi-join on the
    bucket; a pair is emitted only in the first bucket both cover
    (``greatest(lo_buckets)``), so the output is duplicate-free without
    a distinct/shuffle-dedup pass.

    ``keys``: entity columns present on BOTH sides folded into the
    equi-join key (same scale rationale as point_in_interval_join).
    """
    keys = list(keys or [])
    w_us = int(bucket_seconds) * 1_000_000
    lv = left.withColumn(
        "_b",
        F.explode(
            _explode_buckets(
                epoch_us(F.col(left_lo)), epoch_us(F.col(left_hi)), w_us, max_buckets
            )
        ),
    )
    rv = right.withColumn(
        "_b",
        F.explode(
            _explode_buckets(
                epoch_us(F.col(right_lo)), epoch_us(F.col(right_hi)), w_us, max_buckets
            )
        ),
    )
    joined = (
        lv.join(rv, ["_b", *keys])
        .filter(
            (F.col(left_lo) <= F.col(right_hi))
            & (F.col(right_lo) <= F.col(left_hi))
        )
        .filter(
            F.col("_b")
            == F.greatest(
                floordiv(epoch_us(F.col(left_lo)), w_us),
                floordiv(epoch_us(F.col(right_lo)), w_us),
            )
        )
    )
    return joined.drop("_b")


def window_join(
    left: DataFrame,
    right: DataFrame,
    id_col: str,
    key: str = "key",
    left_ts: str = "ts",
    right_ts: str = "ts",
    before_sec: float = 3600.0,
    after_sec: float = 0.0,
    value: str = "value",
    bucket_seconds: int = 3600,
    max_buckets: int = 4096,
) -> DataFrame:
    """kdb-style window join: for every left row, aggregate the right
    rows of the same ``key`` whose timestamp falls in
    ``[left_ts - before_sec, left_ts + after_sec]`` (both ends
    inclusive, exact integer-microsecond compares).

    Returns every left row (empty windows included) with
    ``n_w`` (matching right rows), ``cents_w`` (exact integer-cent sum
    of ``value``), and ``last_right_us`` (epoch µs of the newest
    matching right row, NULL when none) — all exact integers/copies,
    so the relational oracle matches bit-for-bit.

    Scale shape: the left row's window explodes to its covered time
    buckets (bounded by ``(before+after)/bucket_seconds + 2``, guarded
    by ``max_buckets``), the right side buckets once, and the match is
    a hash EQUI-join on (key, bucket) — never a range/cross join —
    followed by one aggregate on the left id and a broadcast-free left
    join back onto the left spine (co-partitioned on the id).
    """
    b_us = int(bucket_seconds) * 1_000_000
    lo = epoch_us(F.col(left_ts)) - F.lit(int(before_sec * 1_000_000))
    hi = epoch_us(F.col(left_ts)) + F.lit(int(after_sec * 1_000_000))
    l_exp = left.select(
        F.col(id_col).alias("_id"),
        F.col(key).alias("_k"),
        lo.alias("_lo"),
        hi.alias("_hi"),
        F.explode(_explode_buckets(lo, hi, b_us, max_buckets)).alias("_b"),
    )
    r = right.select(
        F.col(key).alias("_k"),
        epoch_us(F.col(right_ts)).alias("_rus"),
        F.round(F.col(value) * 100, 0).cast("long").alias("_rc"),
        _bucket(F.col(right_ts), b_us).alias("_b"),
    )
    matched = (
        l_exp.join(r, ["_k", "_b"])
        .where((F.col("_rus") >= F.col("_lo")) & (F.col("_rus") <= F.col("_hi")))
        .groupBy("_id")
        .agg(
            F.count(F.lit(1)).alias("n_w"),
            F.sum("_rc").alias("cents_w"),
            F.max("_rus").alias("last_right_us"),
        )
    )
    return (
        left.join(matched, left[id_col] == matched["_id"], "left")
        .drop("_id")
        .withColumn("n_w", F.coalesce("n_w", F.lit(0)))
        .withColumn("cents_w", F.coalesce("cents_w", F.lit(0)))
    )
