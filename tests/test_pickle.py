"""Fitted-model pickle round-trips (ref test_forecasting.py:71-86:
predict-after-unpickle must equal predict-before)."""

from __future__ import annotations

import pickle

import numpy as np
import pytest


def _frame_equal(a, b, keys):
    pa = a.toPandas().sort_values(keys).reset_index(drop=True)
    pb = b.toPandas().sort_values(keys).reset_index(drop=True)
    assert list(pa.columns) == list(pb.columns)
    for c in pa.columns:
        if pa[c].dtype.kind == "f":
            assert np.allclose(pa[c], pb[c], equal_nan=True), c
        else:
            assert (pa[c] == pb[c]).all(), c


@pytest.mark.parametrize(
    "kind", ["elastic_net", "naive", "snaive", "knn", "holt", "holt_winters"]
)
def test_forecaster_pickle_roundtrip(spark, kind):
    rng = np.random.default_rng(42)
    rows = [
        (e, t, float(i + rng.normal()))
        for i, (e, t) in enumerate(
            [(e, t) for e in ("a", "b") for t in range(12)]
        )
    ]
    y = spark.createDataFrame(rows, "entity string, time long, target double")

    if kind == "elastic_net":
        from functime_spark.forecasting.linear import elastic_net

        fc = elastic_net(freq="1i", lags=3, alpha=0.1, l1_ratio=0.5)
    elif kind == "naive":
        from functime_spark.forecasting.naive import naive

        fc = naive(freq="1i")
    elif kind == "snaive":
        from functime_spark.forecasting.naive import snaive

        fc = snaive(freq="1i", sp=4)
    elif kind == "holt":
        from functime_spark.forecasting.holt import holt

        fc = holt(freq="1i", alpha=0.4, beta=0.2, phi=0.9)
    elif kind == "holt_winters":
        from functime_spark.forecasting.hw import holt_winters

        fc = holt_winters(freq="1i", sp=4, alpha=0.3, beta=0.1, gamma=0.2)
    else:
        from functime_spark.forecasting.knn import knn

        fc = knn(freq="1i", lags=3, n_neighbors=3)

    fc.fit(y)
    before = fc.predict(3)
    restored = pickle.loads(pickle.dumps(fc))
    after = restored.predict(3)
    _frame_equal(before, after, ["entity", "time"])


def test_transformer_pickle_roundtrip(spark, events):
    from functime_spark.operators.preprocessing import scale

    t = scale()
    t.transform(events)
    frozen = pickle.loads(pickle.dumps(t))
    _frame_equal(
        t.transform_new(events), frozen.transform_new(events), ["user_id", "ts"]
    )


def test_elite_lasso_pickle_roundtrip(spark):
    """elite with the L1 stacker carries extra state (stacker coef
    tuple + checkpointed selection_rank frame + fitted bank) — all of
    it must survive the freeze/thaw round-trip."""
    import datetime
    import pickle

    from functime_spark.forecasting.elite import elite
    from functime_spark.forecasting.linear import linear_model
    from functime_spark.forecasting.naive import naive

    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        (e, t0 + datetime.timedelta(hours=i), 5.0 * e + 1.5 * i)
        for e in range(3)
        for i in range(30)
    ]
    y = spark.createDataFrame(rows, "user_id long, ts timestamp_ntz, value double")
    from functools import partial

    bank = {
        "naive": partial(naive, freq="1h"),
        "linear": partial(linear_model, freq="1h", lags=2),
    }
    fc = elite(
        freq="1h", lags=2, top_k=2, test_size=3, n_splits=2,
        bank=bank, ensemble_strategy="lasso",
    ).fit(y)
    before = fc.predict(3)
    restored = pickle.loads(pickle.dumps(fc))
    after = restored.predict(3)
    _frame_equal(before, after, ["user_id", "ts"])
