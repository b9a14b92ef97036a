"""End-to-end accuracy gates on the reference's real competition data.

Replays the reference's M4/M5 thresholds (test_forecasting.py:115-126:
mean SMAPE < 0.3 on M4, mean RMSSE < 2.0 on M5) against our
forecasters, using the public parquet fixtures shipped with the
reference (/root/reference/data — data, not code). These are the
"first real workload" gates: global AR fit over hundreds of series,
recursive multi-step predict, exogenous features on M5.

Measured baselines at the pinned configs (for regression context):
M4-weekly linear(lags=12) SMAPE ~0.050; M5 linear(lags=28)+X RMSSE
~0.80.
"""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

M4_DIR = "/root/reference/data"

pytestmark = pytest.mark.skipif(
    not os.path.exists(f"{M4_DIR}/m4_1w_train.parquet"),
    reason="reference data fixtures not present",
)


def _load_m4(spark, path: str):
    df = spark.read.parquet(path)
    e, t = df.columns[:2]
    v = [c for c in df.columns if c not in (e, t, "partition_id")][0]
    return df.select(
        F.regexp_replace(e, " ", "").alias(e),
        F.col(t).cast("long").alias(t),
        F.col(v).cast("double").alias(v),
    )


def _m4_dataset(spark, freq_tag: str):
    """(y_train, y_test) with test times offset past each train cutoff
    (reference conftest.py:97-106)."""
    y_train = _load_m4(spark, f"{M4_DIR}/m4_{freq_tag}_train.parquet")
    y_test = _load_m4(spark, f"{M4_DIR}/m4_{freq_tag}_test.parquet")
    e, t, v = y_train.columns
    cut = y_train.groupBy(e).agg(F.max(t).alias("__cutoff"))
    y_test = y_test.join(cut, on=e).select(
        e, (F.col(t) + F.col("__cutoff")).alias(t), v
    )
    return y_train, y_test


@pytest.mark.parametrize("freq_tag,fh", [("1w", 13), ("1y", 6)])
def test_m4_linear_smape(spark, freq_tag, fh):
    """Ref test_forecasting.py:115-118: global linear AR model,
    mean SMAPE across all series < 0.3."""
    from functime_spark.forecasting.linear import linear_model
    from functime_spark.operators.metrics import smape

    y_train, y_test = _m4_dataset(spark, freq_tag)
    pred = linear_model(freq="1i", lags=12).fit(y_train).predict(fh)
    s = smape(y_test, pred)
    score = s.agg(F.avg(s.columns[-1])).first()[0]
    assert score is not None and score < 0.3, f"M4 {freq_tag} smape={score}"


def test_m4_knn_smape(spark):
    """kNN forecaster on M4 yearly (small): same 0.3 gate."""
    from functime_spark.forecasting.knn import knn
    from functime_spark.operators.metrics import smape

    y_train, y_test = _m4_dataset(spark, "1y")
    pred = knn(freq="1i", lags=6, n_neighbors=5).fit(y_train).predict(6)
    s = smape(y_test, pred)
    score = s.agg(F.avg(s.columns[-1])).first()[0]
    assert score is not None and score < 0.3, f"M4 1y knn smape={score}"


def test_m5_linear_exogenous_rmsse(spark):
    """Ref test_forecasting.py:120-126 + conftest.py:226-287: M5
    Walmart sample, fh=28, exogenous calendar/event/snap features,
    mean RMSSE < 2.0."""
    from functime_spark.forecasting.linear import linear_model
    from functime_spark.operators.metrics import rmsse

    def load_y(p):
        df = spark.read.parquet(p)
        return df.select("id", "date", F.col(df.columns[2]).cast("double"))

    def load_x(p):
        df = spark.read.parquet(p)
        cols = [F.col("id"), F.col("date")]
        for c in df.columns[2:]:
            cols.append(F.col(c).cast("double").alias(c))
        return df.select(*cols)

    y_train = load_y(f"{M4_DIR}/m5_y_train_sample.parquet")
    y_test = load_y(f"{M4_DIR}/m5_y_test_sample.parquet")
    X_train = load_x(f"{M4_DIR}/m5_X_train_sample.parquet")
    X_test = load_x(f"{M4_DIR}/m5_X_test_sample.parquet")

    fc = linear_model(freq="1d", lags=28)
    pred = fc.fit(y_train, X=X_train).predict(28, X=X_test)
    s = rmsse(y_test, pred, y_train=y_train)
    score = s.agg(F.avg(s.columns[-1])).first()[0]
    assert score is not None and score < 2.0, f"M5 rmsse={score}"
