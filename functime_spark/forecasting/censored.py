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

from functime_spark.forecasting._ar import LinearBackend, make_reduction, make_y_lag, stack_buffers
from functime_spark.forecasting.base import Forecaster
from functime_spark.compat import broadcast_value


def _fit_logistic(
    design: DataFrame,
    feature_cols: list,
    label_col: str,
    clf_params: dict | None = None,
):
    """Distributed logistic fit -> (coef, intercept) numpy arrays.

    `clf_params` overrides the MLlib LogisticRegression config. The
    default (regParam=1e-6) is the robust production choice; the
    correctness gate passes regParam=0, standardization=False,
    tol=1e-12 so the optimum is the exact MLE — which the DuckDB
    oracle recomputes independently via Newton-IRLS in a recursive
    CTE and matches to ~1e-10."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import VectorAssembler

    assembled = VectorAssembler(
        inputCols=feature_cols, outputCol="__features", handleInvalid="skip"
    ).transform(design)
    params = {"regParam": 1e-6, **(clf_params or {})}
    polish = int(params.pop("polish_newton", 0))
    lr = LogisticRegression(
        featuresCol="__features", labelCol=label_col, **params
    )
    model = lr.fit(assembled)
    coef = np.asarray(model.coefficients.toArray(), dtype="float64")
    intercept = float(model.intercept)
    for _ in range(polish):
        coef, intercept = _newton_step(design, feature_cols, label_col, coef, intercept)
    return coef, intercept


def _newton_step(design, feature_cols, label_col, coef, intercept):
    """One exact Newton step on the UNregularized logistic loss:
    gradient X'(p-y) and Hessian X'WX accumulated as native Spark
    aggregates (one pass, map-side combined), (k+1)x(k+1) solve on the
    driver. L-BFGS stops at its tolerance (~1e-10 coefficient error);
    two polish steps land on the exact MLE to machine precision, which
    is what lets the DuckDB oracle replay the fit value-for-value."""
    cols = [F.col(c).cast("double") for c in feature_cols] + [F.lit(1.0)]
    z = F.lit(float(intercept))
    for w, c in zip(coef, cols):
        z = z + F.lit(float(w)) * c
    p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    resid = p - F.col(label_col).cast("double")
    wvar = p * (F.lit(1.0) - p)
    k = len(cols)
    aggs = [F.sum(resid * cols[i]).alias(f"g{i}") for i in range(k)]
    aggs += [
        F.sum(wvar * cols[i] * cols[j]).alias(f"h{i}_{j}")
        for i in range(k)
        for j in range(i, k)
    ]
    row = design.agg(*aggs).first()
    g = np.array([row[f"g{i}"] for i in range(k)])
    H = np.zeros((k, k))
    for i in range(k):
        for j in range(i, k):
            H[i, j] = H[j, i] = row[f"h{i}_{j}"]
    step = np.linalg.solve(H, g)
    new = np.concatenate([coef, [intercept]]) - step
    return new[:-1], float(new[-1])


class censored_model(Forecaster):
    """Two-regime blend around `threshold`. Ref censored.py:32-118."""

    def __init__(
        self,
        freq: str,
        lags: int = 12,
        threshold: float = 0.0,
        strategy: str = "recursive",
        max_horizons: int | None = None,
        target_transform=None,
        clf_params: dict | None = None,
    ):
        super().__init__(freq=freq, lags=lags, target_transform=target_transform)
        self.threshold = threshold
        self.strategy = strategy
        self.max_horizons = max_horizons
        self.clf_params = clf_params
        if strategy in ("direct", "ensemble") and max_horizons is None:
            raise ValueError("direct/ensemble strategy requires max_horizons")

    def _init_kwargs(self) -> dict:
        return {
            "freq": self.freq,
            "lags": self.lags,
            "threshold": self.threshold,
            "strategy": self.strategy,
            "max_horizons": self.max_horizons,
            "clf_params": self.clf_params,
        }

    def _fit_blend(self, design: DataFrame, feature_cols: list, target: str):
        """One (classifier, above-reg, below-reg) triple."""
        thr = float(self.threshold)
        labeled = design.withColumn(
            "__above", (F.col(target) > F.lit(thr)).cast("double")
        )
        clf = _fit_logistic(labeled, feature_cols, "__above", self.clf_params)
        backend = LinearBackend()
        above = design.filter(F.col(target) > F.lit(thr))
        reg_above = backend.fit(above, feature_cols, target)
        if abs(thr) > 0:
            below = design.filter(F.col(target) <= F.lit(thr))
            reg_below = backend.fit(below, feature_cols, target)
        else:
            # zero-inflated: below-regime contributes 0 (ref
            # _regressors.py:124-132, 144-148)
            reg_below = None
        return clf, reg_above, reg_below

    def _fit(self, y: DataFrame, X: DataFrame | None = None):
        p = self.state["panel"]
        # exogenous columns join every blend's feature list (the
        # reference's censored regressors fit the full design,
        # ref censored.py:34-76)
        x_cols = list(X.columns[2:]) if X is not None else []
        self.state["x_cols"] = x_cols
        if self.strategy in ("recursive", "ensemble"):
            design = make_reduction(y, self.lags, X).persist()
            cols = [
                f"{p.target}__lag_{k}" for k in range(1, self.lags + 1)
            ] + x_cols
            self.state["blend"] = self._fit_blend(design, cols, p.target)
            design.unpersist()
        if self.strategy in ("direct", "ensemble"):
            design = make_reduction(y, self.lags + self.max_horizons - 1, X).persist()
            blends = []
            for h in range(1, self.max_horizons + 1):
                cols = [
                    f"{p.target}__lag_{j}" for j in range(h, self.lags + h)
                ] + x_cols
                blends.append(self._fit_blend(design, cols, p.target))
            self.state["direct_blends"] = blends
            design.unpersist()
        self.state["y_lag"] = make_y_lag(y, self.lags).persist()
        self._cutoffs_from_y_lag()

    @staticmethod
    def _apply_blend(feats, blend, thr):
        (wc, bc), (wa, ba), below = blend
        z = feats @ wc + bc
        prob = 1.0 / (1.0 + np.exp(-np.clip(z, -500, 500)))
        yhat = prob * (feats @ wa + ba)
        if below is not None:
            wb, bb = below
            yhat = yhat + (1.0 - prob) * (feats @ wb + bb)
        return yhat

    def _predict_values(self, fh: int, X: DataFrame | None = None) -> DataFrame:
        from functime_spark.forecasting._ar import attach_future_x, mean_ensemble

        state = self.state["y_lag"]
        x_cols = self.state.get("x_cols") or []
        if x_cols:
            if X is None:
                raise ValueError(
                    "forecaster was fit with exogenous X; predict needs X_future"
                )
            state = attach_future_x(state, X, x_cols, fh, on_short=self._x_on_short)
        if self.strategy == "recursive":
            return self._predict_blend(fh, state, recursive=True)
        if self.strategy == "direct":
            return self._predict_blend(fh, state, recursive=False)
        return mean_ensemble(
            self._predict_blend(fh, state, recursive=True),
            self._predict_blend(fh, state, recursive=False),
        )

    def _predict_blend(self, fh: int, y_lag: DataFrame, recursive: bool) -> DataFrame:
        entity = y_lag.columns[0]
        entity_dtype = dict(y_lag.dtypes)[entity]
        lags = self.lags
        spark = y_lag.sparkSession
        thr = float(self.threshold)
        x_cols = self.state.get("x_cols") or []
        payload = (
            self.state["blend"] if recursive else self.state["direct_blends"]
        )
        b = broadcast_value(spark, (payload, thr, recursive, x_cols))
        apply_blend = censored_model._apply_blend

        def run(batches: Iterator) -> Iterator:
            import pandas as pd

            from functime_spark.forecasting._ar import _x_matrix

            blend_state, t, rec, x_names = b.value
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                ents = pdf[entity].to_numpy()
                buf = stack_buffers(pdf["__buf"], lags)
                xs = _x_matrix(pdf, x_names, fh, len(ents)) if x_names else None
                preds = np.empty((len(ents), fh), dtype="float64")
                for h in range(fh):
                    feats = buf[:, ::-1][:, :lags]
                    if x_names:
                        feats = np.hstack([feats, xs[:, h, :]])
                    if rec:
                        yhat = apply_blend(feats, blend_state, t)
                        preds[:, h] = yhat
                        buf = np.concatenate([buf[:, 1:], yhat[:, None]], axis=1)
                    else:
                        blend = blend_state[min(h, len(blend_state) - 1)]
                        preds[:, h] = apply_blend(feats, blend, t)
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

    def __init__(
        self,
        freq: str,
        lags: int = 12,
        strategy: str = "recursive",
        max_horizons: int | None = None,
        target_transform=None,
        clf_params: dict | None = None,
    ):
        super().__init__(
            freq=freq,
            lags=lags,
            threshold=0.0,
            strategy=strategy,
            max_horizons=max_horizons,
            target_transform=target_transform,
            clf_params=clf_params,
        )

    def _init_kwargs(self) -> dict:
        return {
            "freq": self.freq,
            "lags": self.lags,
            "strategy": self.strategy,
            "max_horizons": self.max_horizons,
            "clf_params": self.clf_params,
        }
