"""Censored / zero-inflated forecasters.

Mirrors functime forecasting/censored.py:32-118 + _regressors.py
CensoredRegressor (:100-148): a binary classifier predicts
P(y > threshold) on the lag features, two regressors fit the
above-/below-threshold subsets, and the forecast blends them:

    yhat = P(above) * f_above(X)  [+ P(below) * f_below(X) if threshold != 0]

Spark-first split:

- the classifier is a distributed MLlib ``LogisticRegression`` over the
  lag design matrix (one shuffle, JVM-side IRLS/L-BFGS) — the reference
  collects to a single-node ``HistGradientBoostingClassifier``;
- the two regressors are :class:`LinearBackend` normal-equation fits on
  the filtered subsets (same scan, two aggregate passes);
- recursive multi-step prediction runs as ONE Arrow pass: the logistic
  + two linear coefficient vectors are broadcast and the per-step blend
  is closed-form numpy, so fh steps cost zero extra Spark jobs.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from functime_spark.forecasting._ar import LinearBackend, make_reduction, make_y_lag
from functime_spark.forecasting.base import Forecaster


def _fit_logistic(design: DataFrame, feature_cols: list, label_col: str):
    """Distributed logistic fit -> (coef, intercept) numpy arrays."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import VectorAssembler

    assembled = VectorAssembler(
        inputCols=feature_cols, outputCol="__features", handleInvalid="skip"
    ).transform(design)
    lr = LogisticRegression(
        featuresCol="__features", labelCol=label_col, regParam=1e-6
    )
    model = lr.fit(assembled)
    return (
        np.asarray(model.coefficients.toArray(), dtype="float64"),
        float(model.intercept),
    )


class censored_model(Forecaster):
    """Two-regime blend around `threshold`. Ref censored.py:32-118."""

    def __init__(
        self,
        freq: str,
        lags: int = 12,
        threshold: float = 0.0,
        target_transform=None,
    ):
        super().__init__(freq=freq, lags=lags, target_transform=target_transform)
        self.threshold = threshold

    def _init_kwargs(self) -> dict:
        return {"freq": self.freq, "lags": self.lags, "threshold": self.threshold}

    def _fit(self, y: DataFrame, X: DataFrame | None = None):
        p = self.state["panel"]
        thr = float(self.threshold)
        design = make_reduction(y, self.lags, X).persist()
        feature_cols = [f"{p.target}__lag_{k}" for k in range(1, self.lags + 1)]

        labeled = design.withColumn(
            "__above", (F.col(p.target) > F.lit(thr)).cast("double")
        )
        self.state["clf"] = _fit_logistic(labeled, feature_cols, "__above")

        backend = LinearBackend()
        above = design.filter(F.col(p.target) > F.lit(thr))
        self.state["reg_above"] = backend.fit(above, feature_cols, p.target)
        if abs(thr) > 0:
            below = design.filter(F.col(p.target) <= F.lit(thr))
            self.state["reg_below"] = backend.fit(below, feature_cols, p.target)
        else:
            # zero-inflated: below-regime contributes 0 (ref
            # _regressors.py:124-132, 144-148)
            self.state["reg_below"] = None
        design.unpersist()
        self.state["y_lag"] = make_y_lag(y, self.lags).persist()

    def _predict_values(self, fh: int, X: DataFrame | None = None) -> DataFrame:
        y_lag = self.state["y_lag"]
        entity = y_lag.columns[0]
        entity_dtype = dict(y_lag.dtypes)[entity]
        lags = self.lags
        spark = y_lag.sparkSession
        payload = (
            self.state["clf"],
            self.state["reg_above"],
            self.state["reg_below"],
            float(self.threshold),
        )
        b = spark.sparkContext.broadcast(payload)

        def run(batches: Iterator) -> Iterator:
            import pandas as pd

            (wc, bc), (wa, ba), below, thr = b.value
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                ents = pdf[entity].to_numpy()
                buf = np.stack(
                    [np.asarray(v, dtype="float64")[-lags:] for v in pdf["__buf"]]
                )
                preds = np.empty((len(ents), fh), dtype="float64")
                for h in range(fh):
                    feats = buf[:, ::-1][:, :lags]
                    z = feats @ wc + bc
                    prob = 1.0 / (1.0 + np.exp(-np.clip(z, -500, 500)))
                    yhat = prob * (feats @ wa + ba)
                    if below is not None:
                        wb, bb = below
                        yhat = yhat + (1.0 - prob) * (feats @ wb + bb)
                    preds[:, h] = yhat
                    buf = np.concatenate([buf[:, 1:], yhat[:, None]], axis=1)
                yield pd.DataFrame(
                    {
                        entity: np.repeat(ents, fh),
                        "step": np.tile(np.arange(fh), len(ents)),
                        "__yhat": preds.ravel(),
                    }
                )

        schema = f"{entity} {entity_dtype}, step int, __yhat double"
        return y_lag.mapInPandas(run, schema=schema)


class zero_inflated_model(censored_model):
    """censored_model fixed at threshold=0. Ref censored.py:121-139."""

    def __init__(self, freq: str, lags: int = 12, target_transform=None):
        super().__init__(
            freq=freq, lags=lags, threshold=0.0, target_transform=target_transform
        )

    def _init_kwargs(self) -> dict:
        return {"freq": self.freq, "lags": self.lags}
