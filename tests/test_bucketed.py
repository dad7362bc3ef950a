"""Bucketed tables: the write-time shuffle makes join-time exchanges
disappear — the co-located-join contract asserted on the real plan."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from tits_spark.sources.bucketed import cojoin, write_bucketed


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_bucketed_join_has_no_exchange(spark):
    # tables land in the session's default warehouse dir and are
    # dropped in the finally block (warehouse.dir is a static conf)
    left = spark.range(0, 20_000).select(
        F.col("id").alias("conv_id"), (F.col("id") * 2).alias("a")
    )
    right = spark.range(0, 20_000).select(
        F.col("id").alias("conv_id"), (F.col("id") * 3).alias("b")
    )
    # disable broadcast so the join strategy question is real
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        write_bucketed(left, "bkt_left", "conv_id", n_buckets=8)
        write_bucketed(right, "bkt_right", "conv_id", n_buckets=8)
        joined = cojoin(spark, "bkt_left", "bkt_right", "conv_id")
        p = plan_of(joined)
        # co-located: no shuffle on either side
        assert " Exchange (" not in p and "Exchange hashpartitioning" not in p
        assert "SortMergeJoin" in p
        # and it computes the right thing
        row = joined.agg(
            F.count(F.lit(1)).alias("n"), F.sum(F.col("b") - F.col("a")).alias("s")
        ).first()
        assert row["n"] == 20_000
        assert row["s"] == sum(i for i in range(20_000))
        # contrast: the same join on plain (unbucketed) frames shuffles
        p_plain = plan_of(left.join(right, "conv_id"))
        assert "Exchange hashpartitioning" in p_plain or " Exchange (" in p_plain
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS bkt_left")
        spark.sql("DROP TABLE IF EXISTS bkt_right")
