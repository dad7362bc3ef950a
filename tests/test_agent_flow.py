"""Tool-loop audit: hand-computed fixtures (runs, ABAB chains, modal
tool), brute-force parity on random tool streams, no-tool drop."""

from __future__ import annotations

import datetime as dt

import numpy as np

from tits_spark.operators.agent_flow import tool_loop_audit

BASE = dt.datetime(2024, 5, 1)


def _df(spark, rows):
    return spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )


def _mk(conv, tools):
    return [
        (conv, i + 1, "assistant", f"t{i}", t, BASE + dt.timedelta(minutes=i))
        for i, t in enumerate(tools)
    ]


def _brute(tools):
    seq = [t for t in tools if t]
    n = len(seq)
    runs, cur = [], 1
    for i in range(1, n):
        if seq[i] == seq[i - 1]:
            cur += 1
        else:
            runs.append(cur)
            cur = 1
    runs.append(cur)
    ab_best = cur_ab = 0
    for i in range(2, n):
        if seq[i] == seq[i - 2] and seq[i] != seq[i - 1]:
            cur_ab += 1
            ab_best = max(ab_best, cur_ab)
        else:
            cur_ab = 0
    counts: dict[str, int] = {}
    for t in seq:
        counts[t] = counts.get(t, 0) + 1
    top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
    return {
        "n_tool_calls": n,
        "n_tools": len(counts),
        "longest_run": max(runs),
        "n_self_repeats": sum(r - 1 for r in runs),
        "ab_chain_max": ab_best + 2 if ab_best else 0,
        "top_tool": top[0],
        "top_share_ppm": top[1] * 10**6 // n,
    }


def test_tool_loops_fixtures(spark):
    rows = (
        _mk("stuck", ["grep"] * 6)  # one 6-run, no alternation
        + _mk("pingpong", ["read", "edit"] * 4)  # ABABABAB: chain 8
        + _mk("mixed", ["a", "a", "b", "a", "b", "c", "c", "c"])
        + _mk("notool", [None, "", None])
    )
    got = {r["conv_id"]: r for r in tool_loop_audit(_df(spark, rows)).collect()}
    assert "notool" not in got
    s = got["stuck"]
    assert (s["longest_run"], s["n_self_repeats"], s["ab_chain_max"]) == (
        6, 5, 0,
    )
    assert (s["top_tool"], s["top_share_ppm"]) == ("grep", 10**6)
    p = got["pingpong"]
    assert (p["longest_run"], p["ab_chain_max"], p["n_tools"]) == (1, 8, 3 - 1)
    # mixed: aab abccc -> runs [2,1,1,1,3]; ab flags at i=3 (a,b,a) and
    # i=4 (b,a,b) -> chain 2+2 = 4
    m = got["mixed"]
    assert (m["longest_run"], m["n_self_repeats"], m["ab_chain_max"]) == (
        3, 3, 4,
    )
    assert m["top_tool"] == "a" and m["top_share_ppm"] == 3 * 10**6 // 8


def test_tool_loops_brute_force_parity(spark):
    rng = np.random.default_rng(419)
    rows, keys = [], {}
    pool = ["grep", "read", "edit", "bash", None]
    for k in range(6):
        tools = [pool[i] for i in rng.integers(0, 5, 40)]
        if not any(tools):
            tools[0] = "grep"
        keys[f"c{k}"] = tools
        rows += _mk(f"c{k}", tools)
    got = {r["conv_id"]: r for r in tool_loop_audit(_df(spark, rows)).collect()}
    for k, tools in keys.items():
        want = _brute(tools)
        have = {f: got[k][f] for f in want}
        assert have == want, k


def test_turn_depth_hazard(spark):
    # conv lengths: 2, 2, 3, 5 -> depths {2:2, 3:1, 5:1}
    rows = (
        _mk("a", ["x", "y"])
        + _mk("b", ["x", "y"])
        + _mk("c", ["x", "y", "z"])
        + _mk("d", ["x", "y", "z", "x", "y"])
    )
    from tits_spark.operators.agent_flow import turn_depth_hazard

    out = {r["depth"]: r for r in turn_depth_hazard(_df(spark, rows)).collect()}
    assert set(out) == {2, 3, 5}
    assert (out[2]["n_ended"], out[2]["n_reached"]) == (2, 4)
    assert out[2]["hazard_ppm"] == 2 * 10**6 // 4
    assert (out[3]["n_ended"], out[3]["n_reached"]) == (1, 2)
    assert (out[5]["n_ended"], out[5]["n_reached"]) == (1, 1)
    assert out[5]["hazard_ppm"] == 10**6
