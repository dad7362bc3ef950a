"""Per-conversation turn-stream statistics over the transcript schema
(conv_id, turn_idx, role, text, tool, ts) — the north-rule input
shape — plus an ordered-text checksum diff for migration validation.

conversation_stats answers the shape questions an agent-transcript
pipeline asks per conversation: how long, how interactive (role
alternation), how tool-heavy, how fast the assistant responds, how
much text. Everything lands on exact integer surfaces:

 - n_turns, n_roles, duration_us, n_alt / n_pairs (role alternation
   as exact counts + one division), tool_turns, token/char sums via
   the shared curation tokenizer;
 - p50_resp_us: the median user->assistant response gap as a COPIED
   order statistic at integer rank (n+1)//2 over the (gap, turn_idx)
   total order (var_backtest's device — no float quantile).

transcript_checksum reduces each conversation to ONE order-sensitive
digest of its turn texts — xxhash64 of (turn_idx, text) re-hashed
through a sorted array fold — so "per-turn text equality under
stable (conv_id, turn_idx) ordering" (the north-rule invariant, ref
tests/test_gorilla.py::test_text_equality*) becomes a comparable
column; transcript_diff anti-joins two tables' digests to list the
conversations whose ordered text differs (the migration-validation
readout a 10^12-turn backfill actually runs — digests, never the
text, cross the shuffle).

Plan shape (100 TB): conversation_stats is one (conv)-window chain +
one hash agg on hash(conv_id); the checksum is one hash agg over
xxhash64 values (sorted-array fold inside the agg, no window);
transcript_diff shuffles only (conv_id, digest) pairs. No Python, no
global windows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from tits_spark.functions.exprs import epoch_us, floordiv
from tits_spark.operators.text import _tokens


def conversation_stats(
    df: DataFrame,
    conv: str = "conv_id",
    turn: str = "turn_idx",
    role: str = "role",
    text: str = "text",
    tool: str = "tool",
    ts: str = "ts",
    responder: str = "assistant",
) -> DataFrame:
    """Per-conversation turn-stream statistics.

    Returns (conv_id, n_turns, n_roles, duration_us, n_pairs, n_alt,
    alt_rate, tool_turns, n_tokens, n_chars, n_resp, p50_resp_us)."""
    wo = Window.partitionBy("_c").orderBy("_i")
    wk = Window.partitionBy("_c")
    base = df.select(
        F.col(conv).alias("_c"),
        F.col(turn).alias("_i"),
        F.col(role).alias("_r"),
        F.col(text).alias("_t"),
        F.col(tool).alias("_tool"),
        epoch_us(ts).alias("_u"),
    )
    prev_r = F.lag("_r").over(wo)
    prev_u = F.lag("_u").over(wo)
    stepped = base.select(
        "_c",
        "_i",
        "_r",
        "_u",
        F.when(prev_r.isNotNull() & (prev_r != F.col("_r")), 1)
        .when(prev_r.isNotNull(), 0)
        .alias("_alt"),
        F.when(
            (F.col("_r") == responder)
            & prev_r.isNotNull()
            & (prev_r != responder),
            F.col("_u") - prev_u,
        ).alias("_resp"),
        F.size(_tokens(F.col("_t"))).cast("long").alias("_ntok"),
        F.length("_t").cast("long").alias("_nchr"),
        F.when(
            F.col("_tool").isNotNull() & (F.col("_tool") != ""), 1
        ).otherwise(0).alias("_tl"),
    )
    # median response gap: copied order statistic over (gap, turn)
    wr = Window.partitionBy("_c").orderBy(
        F.col("_resp").isNull(), F.asc("_resp"), F.asc("_i")
    )
    ranked = stepped.select(
        "*",
        F.row_number().over(wr).alias("_rk"),
        F.count("_resp").over(wk).alias("_nresp"),
    )
    med = F.max(
        F.when(
            F.col("_rk") == F.greatest(
                floordiv(F.col("_nresp") + 1, 2), F.lit(1)
            ),
            F.col("_resp"),
        )
    )
    agg = ranked.groupBy(F.col("_c").alias("conv_id")).agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.countDistinct("_r").alias("n_roles"),
        (F.max("_u") - F.min("_u")).alias("duration_us"),
        F.count("_alt").alias("n_pairs"),
        F.coalesce(F.sum("_alt"), F.lit(0)).alias("n_alt"),
        F.sum("_tl").alias("tool_turns"),
        F.sum("_ntok").alias("n_tokens"),
        F.sum("_nchr").alias("n_chars"),
        F.max("_nresp").alias("n_resp"),
        med.alias("p50_resp_us"),
    )
    alt_rate = F.when(
        F.col("n_pairs") > 0,
        F.round(
            F.col("n_alt").cast("double") / F.col("n_pairs").cast("double"),
            6,
        )
        + F.lit(0.0),
    )
    return agg.select(
        "conv_id",
        F.col("n_turns").cast("long").alias("n_turns"),
        F.col("n_roles").cast("long").alias("n_roles"),
        F.col("duration_us").cast("long").alias("duration_us"),
        F.col("n_pairs").cast("long").alias("n_pairs"),
        F.col("n_alt").cast("long").alias("n_alt"),
        alt_rate.alias("alt_rate"),
        F.col("tool_turns").cast("long").alias("tool_turns"),
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("n_chars").cast("long").alias("n_chars"),
        F.col("n_resp").cast("long").alias("n_resp"),
        F.col("p50_resp_us").cast("long").alias("p50_resp_us"),
    )


def transcript_checksum(
    df: DataFrame,
    conv: str = "conv_id",
    turn: str = "turn_idx",
    text: str = "text",
) -> DataFrame:
    """One order-sensitive digest per conversation: xxhash64 of each
    (turn_idx, text), folded in turn order through a sorted-struct
    array (collect_list + array_sort keeps the fold deterministic
    under any shuffle order). Returns (conv_id, n_turns, digest)."""
    h = F.xxhash64(F.col(turn), F.col(text))
    per = df.select(
        F.col(conv).alias("conv_id"),
        F.struct(F.col(turn).alias("i"), h.alias("h")).alias("s"),
    )
    folded = per.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.aggregate(
            F.array_sort(F.collect_list("s")),
            F.lit(0).cast("long"),
            lambda acc, s: F.xxhash64(acc, s["h"]),
        ).alias("digest"),
    )
    return folded.select(
        "conv_id", F.col("n_turns").cast("long").alias("n_turns"), "digest"
    )


def transcript_diff(
    a: DataFrame,
    b: DataFrame,
    conv: str = "conv_id",
    turn: str = "turn_idx",
    text: str = "text",
) -> DataFrame:
    """Conversations whose ordered turn text differs between two
    transcript tables (or that exist on one side only). Returns
    (conv_id, status) with status in {changed, only_a, only_b} —
    only digests cross the shuffle."""
    ca = transcript_checksum(a, conv, turn, text).select(
        "conv_id",
        F.col("n_turns").alias("na"),
        F.col("digest").alias("da"),
    )
    cb = transcript_checksum(b, conv, turn, text).select(
        "conv_id",
        F.col("n_turns").alias("nb"),
        F.col("digest").alias("db"),
    )
    j = ca.join(cb, "conv_id", "full")
    status = (
        F.when(F.col("da").isNull(), F.lit("only_b"))
        .when(F.col("db").isNull(), F.lit("only_a"))
        .when(
            (F.col("da") != F.col("db")) | (F.col("na") != F.col("nb")),
            F.lit("changed"),
        )
    )
    return j.select("conv_id", status.alias("status")).filter(
        F.col("status").isNotNull()
    )
