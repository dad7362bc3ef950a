"""Permutation entropy, value runs, transition counts."""

from __future__ import annotations

import datetime as dt
import math
from collections import Counter

import numpy as np
import pytest
from pyspark.sql import functions as F

from tits_spark.operators.complexity import permutation_entropy
from tits_spark.operators.events_analytics import transition_counts
from tits_spark.operators.windows import value_runs


def _mk(spark, series):
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (k, t0 + dt.timedelta(seconds=60 * i), float(x))
        for k, v in series.items()
        for i, x in enumerate(v)
    ]
    return spark.createDataFrame(rows, "key string, ts timestamp, value double")


def naive_pe(v, normalize=True):
    pats = Counter()
    for i in range(len(v) - 2):
        a, b, c = v[i], v[i + 1], v[i + 2]
        pats[(b < a, c < a, c < b)] += 1
    n = sum(pats.values())
    h = -sum((c / n) * math.log(c / n) for c in pats.values())
    return h / math.log(6) if normalize else h


def test_permutation_entropy(spark):
    rng = np.random.default_rng(19)
    noise = rng.normal(0, 1, 300)
    mono = np.arange(300.0)
    saw = np.tile([0.0, 1.0, 2.0], 100)
    df = _mk(spark, {"noise": noise, "mono": mono, "saw": saw})
    out = {r["key"]: r for r in permutation_entropy(df).collect()}
    assert out["mono"]["perm_entropy"] == 0.0       # one pattern only
    assert out["noise"]["perm_entropy"] > 0.95      # ~white noise
    for k, v in [("noise", noise), ("mono", mono), ("saw", saw)]:
        assert out[k]["n_windows"] == 298
        assert out[k]["perm_entropy"] == pytest.approx(
            round(naive_pe(list(v)), 6), abs=1e-9
        )


def test_value_runs(spark):
    vals = [1.0, 1.0, 2.0, 2.0, 2.0, 1.0, 3.0]
    df = _mk(spark, {"a": vals})
    runs = sorted(
        (r["run_start"], r["value"], r["n_obs"])
        for r in value_runs(df, ["key"], "ts", "value").collect()
    )
    assert [(v, n) for _, v, n in runs] == [(1.0, 2), (2.0, 3), (1.0, 1), (3.0, 1)]
    # runs tile the series: counts sum to n, starts are increasing
    assert sum(n for _, _, n in runs) == len(vals)


def test_transition_counts(spark):
    t0 = dt.datetime(2024, 1, 1)
    seq = ["a", "b", "a", "b", "c", "a"]
    rows = [("u1", t0 + dt.timedelta(seconds=i), s) for i, s in enumerate(seq)]
    rows += [("u2", t0, "a"), ("u2", t0 + dt.timedelta(seconds=1), "b")]
    df = spark.createDataFrame(rows, "key string, ts timestamp, event_type string")
    out = {
        (r["from_state"], r["to_state"]): (r["n"], r["p"])
        for r in transition_counts(df).collect()
    }
    assert out[("a", "b")] == (3, 1.0)              # a always -> b
    assert out[("b", "a")] == (1, 0.5) and out[("b", "c")] == (1, 0.5)
    assert out[("c", "a")] == (1, 1.0)
    assert sum(n for n, _ in out.values()) == 6      # 5 + 1 transitions


def test_kl_vs_global_matches_scipy_style(spark, events):
    """KL per user vs corpus, recomputed directly in numpy."""
    import numpy as np
    from pyspark.sql import functions as F

    from tits_spark.operators.complexity import kl_vs_global

    ev = events.select(F.col("user_id").alias("key"), "event_type")
    got = {r["key"]: r["kl"] for r in kl_vs_global(ev).collect()}
    pdf = ev.toPandas()
    g = pdf["event_type"].value_counts()
    q = g / g.sum()
    for k, grp in pdf.groupby("key"):
        p = grp["event_type"].value_counts() / len(grp)
        want = sum(pv * np.log(pv / q[cat]) for cat, pv in p.items())
        np.testing.assert_allclose(got[k], round(want, 6), atol=2e-6)
    # KL is non-negative
    assert all(v >= 0 for v in got.values())


def test_entropy_rate_deterministic_chain_zero(spark):
    """A strictly periodic a->b->a->b stream: next state is a
    deterministic function of the current one, so h_rate = 0 while
    h_marg = ln 2; predictability = 1."""
    import datetime as dt

    t0 = dt.datetime(2026, 1, 1)
    rows = [
        ("u1", t0 + dt.timedelta(seconds=i), i, "ab"[i % 2]) for i in range(20)
    ]
    df = spark.createDataFrame(
        rows, "key string, ts timestamp, event_id long, event_type string"
    )
    from tits_spark.operators.complexity import entropy_rate

    row = entropy_rate(df, order_tiebreak="event_id").collect()[0]
    assert row["n_trans"] == 19
    assert row["h_rate"] == 0.0
    assert row["h_marg"] > 0.6  # ~ln 2 up to the 9/10 split
    assert row["predictability"] == 1.0


def test_entropy_rate_matches_numpy(spark, events):
    """Conditional and marginal entropies recomputed directly."""
    import numpy as np
    from pyspark.sql import functions as F

    from tits_spark.operators.complexity import entropy_rate

    ev = events.select(
        F.col("user_id").alias("key"), "ts", "event_type", "event_id"
    )
    got = {
        r["key"]: r
        for r in entropy_rate(ev, order_tiebreak="event_id").collect()
    }
    pdf = ev.toPandas().sort_values(["key", "ts", "event_id"])
    for k, grp in pdf.groupby("key"):
        s = grp["event_type"].tolist()
        trans = list(zip(s[:-1], s[1:]))
        if not trans:
            assert k not in got
            continue
        from collections import Counter

        c = Counter(trans)
        t = len(trans)
        cf = Counter(x for x, _ in trans)
        ct = Counter(y for _, y in trans)
        hr = -sum(n / t * np.log(n / cf[i]) for (i, j), n in c.items())
        hm = -sum(n / t * np.log(ct[j] / t) for (i, j), n in c.items())
        assert got[k]["n_trans"] == t
        np.testing.assert_allclose(got[k]["h_rate"], round(hr, 6), atol=2e-6)
        np.testing.assert_allclose(got[k]["h_marg"], round(hm, 6), atol=2e-6)
        if round(hm, 6) > 0:
            np.testing.assert_allclose(
                got[k]["predictability"], round(1 - hr / hm, 6), atol=2e-6
            )
