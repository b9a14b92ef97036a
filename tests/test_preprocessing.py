"""Preprocessing transformers: shape, semantics, and invertibility
(mirrors the reference's sklearn/scipy-equivalence strategy,
tests/test_preprocessing.py)."""

import numpy as np
import pytest
from pyspark.sql import functions as F


def _pdf(df):
    return df.toPandas().sort_values(["user_id", "ts"]).reset_index(drop=True)


def test_scale_roundtrip(events):
    from functime_spark.operators.preprocessing import scale

    t = scale()
    scaled = t.transform(events)
    stats = _pdf(scaled).groupby("user_id")["value"].agg(["mean", "std"])
    np.testing.assert_allclose(stats["mean"], 0, atol=1e-9)
    np.testing.assert_allclose(stats["std"], 1, atol=1e-9)
    back = _pdf(t.invert(scaled))
    orig = _pdf(events)
    np.testing.assert_allclose(back["value"], orig["value"], atol=1e-9)


def test_diff_invert(events):
    from functime_spark.operators.preprocessing import diff

    t = diff(order=1)
    d = t.transform(events)
    back = _pdf(t.invert(d))
    orig = _pdf(events)
    np.testing.assert_allclose(back["value"], orig["value"], atol=1e-9)


def test_diff_seasonal_invert(events):
    from functime_spark.operators.preprocessing import diff

    t = diff(order=1, sp=3)
    back = _pdf(t.invert(t.transform(events)))
    orig = _pdf(events)
    np.testing.assert_allclose(back["value"], orig["value"], atol=1e-9)


def test_log1p_roundtrip(events):
    from functime_spark.operators.preprocessing import log1p

    t = log1p()
    back = _pdf(t.invert(t.transform(events)))
    np.testing.assert_allclose(back["value"], _pdf(events)["value"], rtol=1e-12)


def test_lag_matches_pandas(events, events_pdf):
    from functime_spark.operators.preprocessing import lag

    out = _pdf(lag([1, 2]).transform(events))
    g = events_pdf.groupby("user_id")["value"]
    want = events_pdf.assign(l1=g.shift(1), l2=g.shift(2)).groupby("user_id").apply(
        lambda d: d.iloc[2:], include_groups=False
    )
    np.testing.assert_allclose(out["value__lag_1"], want["l1"].to_numpy())
    np.testing.assert_allclose(out["value__lag_2"], want["l2"].to_numpy())


def test_boxcox_roundtrip(events):
    from functime_spark.operators.preprocessing import boxcox

    t = boxcox()
    out = t.transform(events)
    back = _pdf(t.invert(out))
    np.testing.assert_allclose(back["value"], _pdf(events)["value"], rtol=1e-6)


def test_yeojohnson_roundtrip(events):
    from functime_spark.operators.preprocessing import yeojohnson

    t = yeojohnson()
    back = _pdf(t.invert(t.transform(events)))
    np.testing.assert_allclose(back["value"], _pdf(events)["value"], rtol=1e-6)


def test_detrend_linear(events):
    from functime_spark.operators.preprocessing import detrend

    t = detrend("linear")
    out = _pdf(t.transform(events))
    # residuals per entity are orthogonal to the time index
    for uid, grp in out.groupby("user_id"):
        r = grp["value"].to_numpy()
        i = np.arange(len(r))
        assert abs(np.polyfit(i, r, 1)[0]) < 1e-8
    back = _pdf(t.invert(t.transform(events)))
    np.testing.assert_allclose(back["value"], _pdf(events)["value"], atol=1e-8)


def test_impute_ffill(spark):
    from functime_spark.operators.preprocessing import impute

    df = spark.createDataFrame(
        [("a", 1, 1.0), ("a", 2, None), ("a", 3, 3.0), ("b", 1, None), ("b", 2, 5.0)],
        "entity string, time int, value double",
    )
    out = impute("ffill").transform(df).orderBy("entity", "time").collect()
    assert [r["value"] for r in out] == [1.0, 1.0, 3.0, None, 5.0]
    out = impute("bfill").transform(df).orderBy("entity", "time").collect()
    assert [r["value"] for r in out] == [1.0, 3.0, 3.0, 5.0, 5.0]


def test_impute_interpolate(spark):
    from functime_spark.operators.preprocessing import impute

    df = spark.createDataFrame(
        [("a", 1, 0.0), ("a", 2, None), ("a", 3, None), ("a", 4, 3.0)],
        "entity string, time int, value double",
    )
    out = impute("interpolate").transform(df).orderBy("time").collect()
    assert [r["value"] for r in out] == [0.0, 1.0, 2.0, 3.0]


def test_fractional_diff_weights():
    from functime_spark.operators.preprocessing import _ffd_weights

    w = _ffd_weights(0.5, None, 5)
    # w_k = -w_{k-1} (d - k + 1)/k with d = 0.5
    assert w[0] == 1.0
    assert w[1] == pytest.approx(-0.5)
    assert w[2] == pytest.approx(-0.125)


def test_resample_daily(events):
    from functime_spark.operators.preprocessing import resample

    out = _pdf(resample("1d", "sum", "ffill").transform(events))
    # grid is complete: every entity has every day
    counts = out.groupby("user_id")["ts"].count()
    assert counts.nunique() == 1
    assert out["value"].notna().all()


def test_trim(events, events_pdf):
    from functime_spark.operators.preprocessing import trim

    out = _pdf(trim("both").transform(events))
    starts = events_pdf.groupby("user_id")["ts"].min()
    ends = events_pdf.groupby("user_id")["ts"].max()
    assert out["ts"].min() >= starts.max()
    assert out["ts"].max() <= ends.min()


def test_one_hot_encode(spark):
    from functime_spark.operators.preprocessing import one_hot_encode

    df = spark.createDataFrame(
        [("a", 1, 1.0, "x"), ("a", 2, 2.0, "y"), ("b", 1, 3.0, "x")],
        "entity string, time int, value double, cat string",
    )
    enc = one_hot_encode()
    out = enc.transform(df)
    assert "cat__x" in out.columns and "cat__y" in out.columns
    with pytest.raises(ValueError):
        df_new = spark.createDataFrame(
            [("a", 3, 1.0, "z")], "entity string, time int, value double, cat string"
        )
        enc.transform_new(df_new).collect()


def test_boxcox_newton_matches_bracketing_search():
    """The grid+Newton lambda search (engine-stable fixed point) must
    find the same MLE the golden-section bounded search does."""
    import numpy as np

    from functime_spark.operators.preprocessing import (
        _boxcox_lmbd,
        _brent_bounded,
    )

    rng = np.random.default_rng(3)
    for _ in range(6):
        x = np.abs(rng.normal(rng.uniform(1, 50), rng.uniform(0.5, 20), 80)) + 0.01
        n = len(x)
        logx = np.log(x)
        s = logx.sum()

        def neg_llf(lmb):
            y = logx if abs(lmb) < 1e-19 else (np.power(x, lmb) - 1) / lmb
            v = y.var()
            return np.inf if v <= 0 else -((lmb - 1) * s - n / 2 * np.log(v))

        golden = _brent_bounded(neg_llf, -2.0, 2.0)
        newton = _boxcox_lmbd(x)
        if abs(golden) >= 1.999:  # optimum at the bound: both clamp
            assert abs(newton) >= 1.98
        else:
            assert abs(newton - golden) < 1e-6, (newton, golden)


def test_roll_freq_on_loaded_events_parquet(events):
    """roll(freq=...) must run on the events parquet as LOADED
    (TIMESTAMP_NTZ ts — unix_micros rejects NTZ without the cast
    branch; regression for the r2 AnalysisException). Values checked
    against a brute-force pandas replay of the RANGE frame
    [t-(w-1+shift)*u, t-shift*u]."""
    from functime_spark.operators.preprocessing import roll

    assert dict(events.dtypes)["ts"] == "timestamp_ntz"
    w = 4
    out = roll(window_sizes=[w], stats=["mean", "sum"], freq="1h").transform(events)
    assert out.count() == events.count()

    pdf = out.toPandas().sort_values(["user_id", "ts"]).reset_index(drop=True)
    uid = pdf["user_id"].iloc[0]
    ent = pdf[pdf["user_id"] == uid]
    src = (
        events.filter(F.col("user_id") == int(uid))
        .toPandas()
        .sort_values("ts")
        .reset_index(drop=True)
    )
    hour = np.timedelta64(3600, "s")
    shift = w
    for _, row in ent.iterrows():
        lo = row["ts"] - np.timedelta64((w - 1 + shift) * 3600, "s")
        hi = row["ts"] - np.timedelta64(shift * 3600, "s")
        mask = (src["ts"] >= lo) & (src["ts"] <= hi)
        vals = src.loc[mask, "value"]
        got_mean = row[f"value__rolling_mean_{w}"]
        got_sum = row[f"value__rolling_sum_{w}"]
        if len(vals) == 0:
            assert got_mean is None or np.isnan(got_mean)
            assert got_sum is None or np.isnan(got_sum)
        else:
            assert np.isclose(got_mean, vals.mean())
            assert np.isclose(got_sum, vals.sum())


def test_yeojohnson_newton_matches_bracketing_search():
    """The YJ grid+Newton fixed-point search (SQL-replayable) must land
    on the same MLE the bounded golden-section search finds — mirrors
    the Box-Cox guard. Boundary-clamped optima (|l| near the clamp)
    only need to agree on saturation."""
    import numpy as np

    from functime_spark.operators.preprocessing import (
        _brent_bounded,
        _yeojohnson_lmbd,
    )

    def brent_yj(x):
        x = np.asarray(x, dtype="float64")
        x = x[~np.isnan(x)]
        n = len(x)
        pos = x >= 0
        m = np.log1p(np.abs(x))
        sign_sum = (np.where(pos, m, -m)).sum()

        def _yj(lmb):
            y = np.empty_like(x)
            if abs(lmb) < 1e-19:
                y[pos] = m[pos]
            else:
                y[pos] = (np.power(x[pos] + 1, lmb) - 1) / lmb
            if abs(lmb - 2) < 1e-19:
                y[~pos] = -m[~pos]
            else:
                y[~pos] = -(np.power(-x[~pos] + 1, 2 - lmb) - 1) / (2 - lmb)
            return y

        def nll(l):
            var = _yj(l).var()
            return np.inf if var <= 0 else -(-n / 2 * np.log(var) + (l - 1) * sign_sum)

        return _brent_bounded(nll, -2.0, 2.0)

    rng = np.random.default_rng(11)
    for i in range(24):
        kind = i % 4
        if kind == 0:
            x = rng.gamma(2, 3, 80) - 5
        elif kind == 1:
            x = rng.standard_normal(80) * 10
        elif kind == 2:
            x = np.exp(rng.standard_normal(80)) - 0.5
        else:
            x = -np.exp(rng.standard_normal(80)) + 0.5
        newton, golden = _yeojohnson_lmbd(x), brent_yj(x)
        if abs(golden) >= 1.95:
            assert abs(newton) >= 1.95
        else:
            assert abs(newton - golden) < 1e-5, (i, newton, golden)


def test_clip_outliers_bounds_and_transform_new(spark):
    from functime_spark.operators.preprocessing import clip_outliers

    rows = [("e", i, float(i)) for i in range(1, 101)]
    df = spark.createDataFrame(rows, "entity string, t long, y double")
    tf = clip_outliers(lower=0.1, upper=0.9)
    out = {r["t"]: r["y"] for r in tf.transform(df).collect()}
    import numpy as np

    lo, hi = np.quantile(np.arange(1.0, 101.0), [0.1, 0.9])
    assert out[1] == pytest.approx(lo) and out[100] == pytest.approx(hi)
    assert out[50] == 50.0  # interior values untouched
    # fitted bounds apply to new rows (no refit)
    new = spark.createDataFrame(
        [("e", 200, 1e6), ("e", 201, -1e6)], "entity string, t long, y double"
    )
    got = {r["t"]: r["y"] for r in tf.transform_new(new).collect()}
    assert got[200] == pytest.approx(hi) and got[201] == pytest.approx(lo)
    with pytest.raises(NotImplementedError):
        tf.invert(df)


def test_detect_anomalies_flags_planted_spike(spark):
    import math

    from functime_spark.operators.evaluation import detect_anomalies

    rows = []
    for ent in ("a", "b"):
        for i in range(40):
            v = 10.0 + math.sin(i / 3.0)
            if ent == "a" and i == 30:
                v = 50.0  # planted spike
            rows.append((ent, i, v))
    df = spark.createDataFrame(rows, "entity string, ts long, value double")
    out = detect_anomalies(df, window=10, threshold=3.0).collect()
    flagged = [(r.entity, r.ts) for r in out if r.is_anomaly]
    assert ("a", 30) in flagged
    assert all(e != "b" for e, _ in flagged)
    # warmup rows score NULL and are never flagged
    warm = [r for r in out if r.ts < 5]
    assert all(r.zscore is None and not r.is_anomaly for r in warm)
    # the spike does not sit inside its own window (z is huge, not ~1)
    spike = [r for r in out if r.entity == "a" and r.ts == 30][0]
    assert spike.zscore > 10
