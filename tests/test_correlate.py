"""Spark correlate operators vs the pure-numpy kernels and across the
two execution strategies (applyInPandas parity path vs declarative
band-join)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from tits_spark.functions import kernels as K
from tits_spark.operators.correlate import (
    acf_bandjoin,
    ar_fit_by_key,
    perio_by_key,
    sacf_by_key,
    xcor_pairs,
)


@pytest.fixture(scope="module")
def ev(spark):
    return (
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .select(F.col("user_id").cast("string").alias("key"), "ts", "value")
        .cache()
    )


def test_sacf_by_key_matches_kernel(spark, ev):
    got = sacf_by_key(ev, nlags=4, tau=3600.0).toPandas()
    pdf = ev.toPandas().sort_values(["key", "ts"], kind="stable")
    for key, grp in pdf.groupby("key"):
        if len(grp) < 8:
            continue
        t = grp["ts"].to_numpy().astype("datetime64[ns]").astype(np.int64) / 1e9
        want = K.sacf(t - t[0], grp["value"].to_numpy(np.float64), 4, 3600.0)
        sub = got[got["key"] == key].sort_values("lag")["acf"].to_numpy()
        assert np.allclose(sub, want, rtol=1e-9, atol=1e-12, equal_nan=True), key


def test_bandjoin_matches_udf_strategy(ev):
    a = sacf_by_key(ev, nlags=4, tau=3600.0).toPandas().set_index(["key", "lag"])
    b = acf_bandjoin(ev, nlags=4, tau=3600.0).toPandas().set_index(["key", "lag"])
    j = a.join(b, lsuffix="_u", rsuffix="_b", how="inner")
    assert len(j) == len(a)
    d = np.abs(j["acf_u"] - j["acf_b"])
    assert float(d.max()) < 1e-9


def test_xcor_pairs_recovers_shift(spark):
    # two keyed copies of one AR-ish series, second shifted +5 s on a
    # tau=1 s grid -> argmax at lag +5
    rng = np.random.Generator(np.random.PCG64(11))
    n = 4000
    t = np.cumsum(rng.exponential(1.0, n))
    y = np.convolve(rng.standard_normal(n), [1.0, 0.6, 0.3], mode="same")
    base = pd.Timestamp("2026-01-01").value
    pdf = pd.concat([
        pd.DataFrame({"key": "a", "ts": pd.to_datetime(base + (t * 1e9).astype(np.int64)), "value": y}),
        pd.DataFrame({"key": "b", "ts": pd.to_datetime(base + ((t + 5.0) * 1e9).astype(np.int64)), "value": y}),
    ])
    df = spark.createDataFrame(pdf, "key string, ts timestamp, value double")
    pairs = spark.createDataFrame([("a", "b")], "key1 string, key2 string")
    out = xcor_pairs(df, pairs, nlags=10, tau=1.0).toPandas().sort_values("lag")
    best = out.loc[out["xcf"].idxmax()]
    assert best["lag"] == 5
    assert best["xcf"] > 0.8


def test_ar_fit_shape(ev):
    out = ar_fit_by_key(ev, order=3, tau=3600.0).toPandas()
    assert set(out["coef_idx"]) == {0, 1, 2}
    assert not out["ar"].isna().any()


def test_pacf_matches_per_order_ar_fits(ev):
    from tits_spark.operators.correlate import pacf_by_key

    pacf = pacf_by_key(ev, order=3, tau=3600.0).toPandas()
    assert set(pacf["lag"]) == {1, 2, 3}
    # lag-k pacf == -(last coefficient of the order-k AR fit), per key
    for k in (1, 2, 3):
        ar_k = ar_fit_by_key(ev, order=k, tau=3600.0).toPandas()
        last = ar_k[ar_k["coef_idx"] == k - 1].set_index("key")["ar"]
        got = pacf[pacf["lag"] == k].set_index("key")["pacf"]
        assert np.allclose(got.sort_index(), -last.sort_index(), atol=1e-9)


def test_perio_finds_planted_frequency(spark):
    # y = sin(2*pi*4*t/span) on irregular t -> peak at freq_idx 3
    rng = np.random.Generator(np.random.PCG64(12))
    t = np.sort(rng.random(600)) * 1000.0
    y = np.sin(2 * np.pi * 4 * t / 1000.0) + 0.1 * rng.standard_normal(600)
    base = pd.Timestamp("2026-01-01").value
    pdf = pd.DataFrame({
        "key": "s", "ts": pd.to_datetime(base + (t * 1e9).astype(np.int64)), "value": y,
    })
    df = spark.createDataFrame(pdf, "key string, ts timestamp, value double")
    out = perio_by_key(df, nw=8).toPandas().sort_values("freq_idx")
    # span normalization maps the planted 4-cycles signal near freq_idx 3
    assert int(out.loc[out["power"].idxmax(), "freq_idx"]) in (2, 3, 4)


def test_ar_stationarity(spark):
    # stationary AR(1): y_t = 0.5 y_{t-1} + e -> root at z=2, stationary
    import numpy as np
    import pandas as pd
    from tits_spark.operators.correlate import ar_stationarity_by_key

    rng = np.random.Generator(np.random.PCG64(21))
    n = 5000
    y = np.zeros(n)
    e = rng.standard_normal(n)
    for i in range(1, n):
        y[i] = 0.5 * y[i - 1] + e[i]
    base = pd.Timestamp("2026-01-01").value
    pdf = pd.DataFrame({
        "key": "s",
        "ts": pd.to_datetime(base + (np.arange(n) * 1e9).astype(np.int64)),
        "value": y,
    })
    df = spark.createDataFrame(pdf, "key string, ts timestamp, value double")
    out = ar_stationarity_by_key(df, order=2, tau=1.0).toPandas()
    assert len(out) == 2
    assert bool(out["stationary"].iloc[0]) is True
    assert out["min_root_mod"].iloc[0] > 1.5  # root near 2 for AR(0.5)
    # fitted ar_1 ~ -0.5 (Levinson sign convention: y_t + a1 y_{t-1} = e)
    a1 = out.sort_values("coef_idx")["ar"].iloc[0]
    assert -0.6 < a1 < -0.4


def test_sacf_batched_matches_grouped(spark, ev):
    from tits_spark.operators.correlate import sacf_by_key_batched

    a = sacf_by_key(ev, nlags=4, tau=3600.0).toPandas().set_index(["key", "lag"]).sort_index()
    b = sacf_by_key_batched(ev, nlags=4, tau=3600.0).toPandas().set_index(["key", "lag"]).sort_index()
    assert len(a) == len(b)
    import numpy as np

    assert np.allclose(a["acf"].to_numpy(), b["acf"].to_numpy(), equal_nan=True)


def test_perio_declarative_matches_udf(spark, ev):
    from tits_spark.operators.correlate import perio_declarative

    import numpy as np

    a = perio_by_key(ev, nw=4).toPandas().set_index(["key", "freq_idx"]).sort_index()
    b = (
        perio_declarative(ev, nw=4).toPandas().set_index(["key", "freq_idx"]).sort_index()
    )
    j = a.join(b, lsuffix="_u", rsuffix="_d", how="inner")
    assert len(j) == len(a)
    rel = np.abs(j["power_u"] - j["power_d"]) / np.maximum(np.abs(j["power_d"]), 1e-9)
    assert float(rel.max()) < 1e-6


def test_xcf_bandjoin_matches_udf(spark, ev):
    from tits_spark.operators.correlate import xcf_bandjoin

    import numpy as np

    keys = [r["key"] for r in ev.select("key").distinct().orderBy("key").limit(2).collect()]
    pairs = spark.createDataFrame([(keys[0], keys[1])], "key1 string, key2 string")
    u = xcor_pairs(ev, pairs, nlags=5, tau=3600.0).toPandas().set_index("lag").sort_index()
    d = xcf_bandjoin(ev, keys[0], keys[1], nlags=5, tau=3600.0).toPandas().set_index("lag").sort_index()
    assert len(u) == len(d) == 11
    assert float(np.abs(u["xcf"] - d["xcf"]).max()) < 1e-9


def test_xcf_bandjoin_rejects_same_series():
    import pytest

    from tits_spark.operators.correlate import xcf_bandjoin

    with pytest.raises(ValueError, match="two distinct series"):
        xcf_bandjoin(None, "a", "a")


def test_forecast_ar_matches_manual_recursion(spark):
    import datetime as dt

    import numpy as np
    from pyspark.sql import functions as F

    from tits_spark.operators.correlate import ar_fit_by_key, forecast_ar

    rng = np.random.default_rng(13)
    t0 = dt.datetime(2024, 1, 1)
    rows = []
    for k, phi in [("a", 0.8), ("b", -0.5)]:
        y = [0.0]
        for _ in range(199):
            y.append(phi * y[-1] + rng.normal(0, 1))
        rows += [
            (k, t0 + dt.timedelta(seconds=60 * i), float(v) + 10.0)
            for i, v in enumerate(y)
        ]
    df = spark.createDataFrame(rows, "key string, ts timestamp, value double")
    got = {
        (r["key"], r["step"]): r["yhat"]
        for r in forecast_ar(df, order=3, horizon=5, tau=60.0).collect()
    }
    assert len(got) == 10
    # manual recursion from the SAME quantized coefficients and lasts
    coefs = {
        k: [None] * 3
        for k in ("a", "b")
    }
    for r in ar_fit_by_key(df, order=3, tau=60.0).collect():
        coefs[r["key"]][r["coef_idx"]] = round(r["ar"], 6)
    pdf = df.toPandas().sort_values(["key", "ts"])
    for k in ("a", "b"):
        v = pdf[pdf["key"] == k]["value"].to_numpy()
        mean = v.mean()
        lags = [v[-1] - mean, v[-2] - mean, v[-3] - mean]
        a = coefs[k]
        for s in range(1, 6):
            f = -(a[0] * lags[0] + a[1] * lags[1] + a[2] * lags[2])
            assert got[(k, s)] == pytest.approx(round(mean + f, 4), abs=2e-4), (k, s)
            lags = [f] + lags[:2]
    # AR(0.8) forecasts decay monotonically toward the mean
    mean_a = pdf[pdf["key"] == "a"]["value"].mean()
    dev = [abs(got[("a", s)] - mean_a) for s in range(1, 6)]
    assert all(dev[i] > dev[i + 1] for i in range(4))


def test_ljung_box_white_vs_persistent(spark):
    """White noise must score far below a strongly autocorrelated
    series, and Q must be non-negative with dof = nlags."""
    import numpy as np
    import pandas as pd

    from tits_spark.operators.correlate import ljung_box

    rng = np.random.default_rng(17)
    n = 400
    ts = pd.Timestamp("2026-01-01") + pd.to_timedelta(
        np.arange(n) * 3600, unit="s"
    )
    white = rng.normal(0, 1, n)
    ar = np.empty(n)
    ar[0] = 0.0
    for i in range(1, n):
        ar[i] = 0.9 * ar[i - 1] + rng.normal(0, 1)
    pdf = pd.concat(
        [
            pd.DataFrame({"key": 1, "ts": ts, "value": white}),
            pd.DataFrame({"key": 2, "ts": ts, "value": ar}),
        ],
        ignore_index=True,
    )
    df = spark.createDataFrame(pdf, "key long, ts timestamp, value double")
    out = {r["key"]: r for r in ljung_box(df, nlags=3).collect()}
    assert out[1]["dof"] == out[2]["dof"] == 3
    assert out[1]["q_stat"] >= 0 and out[2]["q_stat"] >= 0
    # kernel smoothing inflates the small-Q null slightly vs the
    # textbook chi2, so assert separation rather than the 7.81 quantile
    assert out[2]["q_stat"] > 10 * max(out[1]["q_stat"], 1.0)
    assert out[1]["q_stat"] < 30 and out[2]["q_stat"] > 100


def test_spectral_entropy_flat_vs_cyclic(spark):
    """A pure sinusoid concentrates spectral mass (entropy near 0 of
    the ln-nw scale); white noise spreads it (entropy near 1)."""
    import numpy as np
    import pandas as pd

    import __spark_entry__ as E

    rng = np.random.default_rng(23)
    n = 512
    ts = pd.Timestamp("2026-01-01") + pd.to_timedelta(np.arange(n) * 3600, unit="s")
    # t is span-normalized in the periodogram, so put the cycle ON the
    # integer frequency grid: 3 full cycles over the span
    cyc = np.sin(2 * np.pi * 3 * np.arange(n) / (n - 1))
    white = rng.normal(0, 1, n)
    pdf = pd.concat(
        [
            pd.DataFrame({"key": 1, "ts": ts, "value": cyc}),
            pd.DataFrame({"key": 2, "ts": ts, "value": white}),
        ],
        ignore_index=True,
    )
    df = spark.createDataFrame(pdf, "key long, ts timestamp, value double")

    from pyspark.sql import Window, functions as F
    from tits_spark.operators.correlate import perio_declarative

    out = perio_declarative(df, "key", "ts", "value", nw=8)
    p6 = out.select("key", F.round("power", 6).alias("p"))
    frac = F.col("p") / F.col("_tot")
    import math
    got = {
        r["key"]: r["se"]
        for r in (
            p6.withColumn("_tot", F.sum("p").over(Window.partitionBy("key")))
            .filter(F.col("p") > 0)
            .groupBy("key")
            .agg((-F.sum(frac * F.log(frac)) / math.log(8.0)).alias("se"))
            .collect()
        )
    }
    assert got[1] < 0.55 < got[2]
    assert 0 <= got[1] and got[2] <= 1.0001


def test_arch_effect_detected_on_garch_like_series(spark):
    """Volatility clustering (regime-switching variance) must score a
    much larger squared-series Q than homoskedastic noise."""
    import numpy as np
    import pandas as pd

    from tits_spark.operators.correlate import ljung_box

    rng = np.random.default_rng(31)
    n = 400
    ts = pd.Timestamp("2026-01-01") + pd.to_timedelta(np.arange(n) * 3600, unit="s")
    homo = rng.normal(0, 1, n)
    sigma = np.where((np.arange(n) // 50) % 2 == 0, 0.3, 3.0)  # clustered vol
    hetero = rng.normal(0, 1, n) * sigma
    pdf = pd.concat(
        [
            pd.DataFrame({"key": 1, "ts": ts, "value": homo}),
            pd.DataFrame({"key": 2, "ts": ts, "value": hetero}),
        ],
        ignore_index=True,
    )
    df = spark.createDataFrame(
        pdf, "key long, ts timestamp, value double"
    ).withColumn("v2", __import__("pyspark.sql.functions", fromlist=["col"]).col("value") ** 2)
    out = {r["key"]: r["q_stat"] for r in ljung_box(df, value="v2", nlags=3).collect()}
    assert out[2] > 10 * max(out[1], 1.0)


def test_turning_points_exact_small(spark):
    import pandas as pd
    from pyspark.sql import functions as F

    import __spark_entry__  # noqa: F401  (query uses the same algebra)

    rows = [
        (1, "00:00", 1.0), (1, "00:01", 3.0), (1, "00:02", 2.0),  # peak at 3
        (1, "00:03", 4.0),                                         # valley at 2
        (1, "00:04", 4.0),                                         # flat: no tp
        (1, "00:05", 1.0),
    ]
    pdf = pd.DataFrame(rows, columns=["key", "hm", "value"])
    pdf["ts"] = pd.to_datetime("2026-01-01 " + pdf["hm"])
    df = spark.createDataFrame(pdf[["key", "ts", "value"]])
    w = __import__("pyspark.sql.window", fromlist=["Window"]).Window.partitionBy("key").orderBy("ts")
    dp = F.col("value") - F.lag("value").over(w)
    dn = F.lead("value").over(w) - F.col("value")
    n_tp = (
        df.withColumn("_t", (dp * dn < 0).cast("long"))
        .agg(F.sum("_t"))
        .first()[0]
    )
    assert n_tp == 2  # peak at 3.0 and valley at 2.0; flat 4,4 breaks runs


def test_mixing_stats_persistent_vs_white(spark):
    """The AR(0.9) series must show a larger autocorrelation-time
    factor (smaller ESS) than white noise, and a finite positive
    half-life; both ESS values stay positive."""
    import numpy as np
    import pandas as pd

    import __spark_entry__ as E

    rng = np.random.default_rng(61)
    n = 400
    ts = pd.Timestamp("2026-01-01") + pd.to_timedelta(np.arange(n) * 3600, unit="s")
    white = rng.normal(0, 1, n)
    ar = np.empty(n)
    ar[0] = 0.0
    for i in range(1, n):
        ar[i] = 0.9 * ar[i - 1] + rng.normal(0, 1)
    pdf = pd.concat(
        [
            pd.DataFrame({"user_id": 1, "ts": ts, "value": white}),
            pd.DataFrame({"user_id": 2, "ts": ts, "value": ar}),
        ],
        ignore_index=True,
    )
    pdf["event_id"] = np.arange(len(pdf))
    pdf["event_type"] = "x"
    pdf["props"] = ""
    import tempfile
    d = tempfile.mkdtemp()
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(f"{d}/events.parquet")
    out = {r["key"]: r for r in E.q_mixing_stats(spark, d).collect()}
    assert out[2]["act_factor"] > 2 * out[1]["act_factor"]
    assert out[2]["ess"] < out[1]["ess"]
    assert out[2]["half_life_lags"] is not None and out[2]["half_life_lags"] > 1


def test_exp_fit_poisson_vs_regular(spark):
    """Exponential gaps fit well (small KS distance); a perfectly
    regular clock is maximally non-exponential."""
    import numpy as np
    import pandas as pd
    import tempfile

    import __spark_entry__ as E

    rng = np.random.default_rng(91)
    n = 2000
    ts0 = pd.Timestamp("2026-01-01")
    exp_gaps = rng.exponential(60.0, n)
    regular = np.full(n, 60.0)
    rows = []
    eid = 0
    for uid, gaps in ((1, exp_gaps), (2, regular)):
        t = ts0 + pd.to_timedelta(np.cumsum(gaps), unit="s").round("us")
        for x in t:
            rows.append((uid, eid, x, "x", 1.0, ""))
            eid += 1
    pdf = pd.DataFrame(
        rows, columns=["user_id", "event_id", "ts", "event_type", "value", "props"]
    )
    d = tempfile.mkdtemp()
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(f"{d}/events.parquet")
    out = {r["key"]: r for r in E.q_exp_fit(spark, d).collect()}
    assert out[1]["ks_d"] < 0.05          # good exponential fit
    assert out[2]["ks_d"] > 0.3           # clock-like, strongly rejected
    # rates recover ~1/60 Hz
    assert 0.013 < out[1]["rate_per_sec"] < 0.021
    assert abs(out[2]["rate_per_sec"] - 1 / 60) < 1e-4
