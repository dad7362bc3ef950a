"""Agent control-flow audits over the transcript schema (conv_id,
turn_idx, role, text, tool, ts) — the north-rule input shape: detect
the failure mode a 10^12-turn agent-transcript pipeline most wants
flagged, an agent STUCK IN A LOOP (retrying one tool forever, or
ping-ponging between two tools), plus the tool-mix concentration per
conversation.

tool_loop_audit reduces each conversation's tool-call subsequence
(turns whose tool is non-null/non-empty, in turn order) to exact
integer loop evidence:

  - n_tool_calls, n_tools     exact counts;
  - longest_run               longest consecutive same-tool run (the
                              lag-change -> run-id cumsum -> per-run
                              count device, sessionize's machinery);
  - n_self_repeats            adjacent same-tool pairs = sum over
                              runs of (len - 1);
  - ab_chain_max              longest ABAB alternation window: turn
                              i extends a 2-cycle when tool_i ==
                              tool_{i-2} AND tool_i != tool_{i-1};
                              a maximal block of k consecutive
                              extenders is an alternating window of
                              length k + 2 (0 when no extender —
                              self-runs are excluded by the !=
                              guard, so AAAA scores in longest_run,
                              not here);
  - top_tool, top_share_ppm   modal tool (count desc, name asc — a
                              deterministic total order) and its
                              integer floor-ppm share.

Everything is an exact integer or a deterministic argmax on one;
there is no float anywhere, so the DuckDB twin matches bit-for-bit.

Plan shape (100 TB): one scan -> one hash(conv) window chain (three
lags + two run-id cumsums share the single (conv)-partition sort) ->
a (conv, run) hash agg -> a (conv) hash agg, all on the same
hash(conv_id) exchange; per-conv state is bounded by the turn count.
No joins, no Python, no global windows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from tits_spark.functions.exprs import floordiv


def tool_loop_audit(
    df: DataFrame,
    conv: str = "conv_id",
    turn: str = "turn_idx",
    tool: str = "tool",
) -> DataFrame:
    """Per-conversation tool-call loop audit. Returns (conv_id,
    n_tool_calls, n_tools, longest_run, n_self_repeats, ab_chain_max,
    top_tool, top_share_ppm); conversations with no tool calls
    drop (no subsequence to audit)."""
    calls = df.filter(
        F.col(tool).isNotNull() & (F.col(tool) != "")
    ).select(
        F.col(conv).alias("_c"),
        F.col(turn).alias("_i"),
        F.col(tool).alias("_t"),
    )
    w = Window.partitionBy("_c").orderBy("_i")
    lag1 = F.lag("_t", 1).over(w)
    lag2 = F.lag("_t", 2).over(w)
    stepped = calls.select(
        "_c",
        "_i",
        "_t",
        F.when(lag1.isNull() | (lag1 != F.col("_t")), 1)
        .otherwise(0)
        .alias("_chg"),
        F.when(
            lag2.isNotNull() & (lag2 == F.col("_t")) & (lag1 != F.col("_t")),
            1,
        )
        .otherwise(0)
        .alias("_ab"),
    )
    runs = stepped.select(
        "_c",
        "_t",
        "_ab",
        F.sum("_chg").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias(
            "_rid"
        ),
        F.sum(1 - F.col("_ab"))
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("_aid"),
    )
    # per same-tool run: length; per alternation block: extender count
    per_run = runs.groupBy("_c", "_rid", "_t").agg(
        F.count(F.lit(1)).alias("_len"),
        F.lit(None).cast("long").alias("_abn"),
    )
    per_ab = runs.groupBy("_c", "_aid").agg(
        F.lit(None).cast("string").alias("_t"),
        F.lit(None).cast("long").alias("_len"),
        F.sum("_ab").alias("_abn"),
    )
    both = per_run.select(
        "_c", "_t", "_len", "_abn"
    ).unionByName(per_ab.select("_c", "_t", "_len", "_abn"))
    agg = both.groupBy(F.col("_c").alias("conv_id")).agg(
        F.sum("_len").cast("long").alias("n_tool_calls"),
        F.countDistinct("_t").cast("long").alias("n_tools"),
        F.max("_len").cast("long").alias("longest_run"),
        (F.sum("_len") - F.count("_len")).cast("long").alias(
            "n_self_repeats"
        ),
        F.coalesce(F.max("_abn"), F.lit(0)).cast("long").alias("_abm"),
    )
    # top tool needs (count desc, name asc): a second small agg over
    # the per-run frame collapsed to per-tool counts, same hash(conv)
    per_tool = per_run.groupBy("_c", "_t").agg(
        F.sum("_len").alias("_n")
    )
    wtop = Window.partitionBy("_c").orderBy(F.desc("_n"), F.asc("_t"))
    top = (
        per_tool.withColumn("_rk", F.row_number().over(wtop))
        .filter(F.col("_rk") == 1)
        .select(
            F.col("_c").alias("conv_id"),
            F.col("_t").alias("top_tool"),
            F.col("_n").alias("_topn"),
        )
    )
    out = agg.join(top, "conv_id")
    ab_max = F.when(F.col("_abm") > 0, F.col("_abm") + 2).otherwise(
        F.lit(0)
    )
    return out.select(
        "conv_id",
        "n_tool_calls",
        "n_tools",
        "longest_run",
        "n_self_repeats",
        ab_max.cast("long").alias("ab_chain_max"),
        "top_tool",
        floordiv(
            F.col("_topn") * F.lit(1_000_000), F.col("n_tool_calls")
        ).cast("long").alias("top_share_ppm"),
    )


def turn_depth_hazard(
    df: DataFrame,
    conv: str = "conv_id",
    turn: str = "turn_idx",
) -> DataFrame:
    """Discrete-time abandonment hazard by TURN DEPTH over the
    transcript corpus: at each observed conversation length k,

        n_ended(k)    conversations whose final turn is k    (exact)
        n_reached(k)  conversations with >= k turns (suffix sum)
        hazard_ppm    n_ended * 1e6 DIV n_reached             (exact)

    — the turn-index companion of survival_km's wall-clock hazard:
    "how likely is a conversation to END at this depth, given it got
    here", the curve a context-budget or session-timeout policy is
    actually tuned against. Returns one row per OBSERVED depth
    (depth, n_ended, n_reached, hazard_ppm) — the hazard between
    observed depths is zero by construction, so nothing is lost by
    not exploding the full 1..max range.

    Plan shape (100 TB): one scan -> per-conv max (hash agg, map-side
    partials) -> depth histogram (bounded by the longest conversation
    — the only frame a global window ever sees) -> one suffix-sum
    window + closed forms. No joins, no Python.
    """
    depths = df.groupBy(F.col(conv).alias("_c")).agg(
        F.max(turn).alias("_d")
    )
    hist = depths.groupBy(F.col("_d").alias("depth")).agg(
        F.count(F.lit(1)).cast("long").alias("n_ended")
    )
    wsuf = (
        # bounded-global-window: one row per DISTINCT conversation
        # depth (<= the longest conversation), post two hash aggs
        Window.orderBy(F.desc("depth"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    reached = hist.select(
        "depth",
        "n_ended",
        F.sum("n_ended").over(wsuf).cast("long").alias("n_reached"),
    )
    return reached.select(
        F.col("depth").cast("long").alias("depth"),
        "n_ended",
        "n_reached",
        floordiv(
            F.col("n_ended") * F.lit(1_000_000), F.col("n_reached")
        ).cast("long").alias("hazard_ppm"),
    ).orderBy("depth")
