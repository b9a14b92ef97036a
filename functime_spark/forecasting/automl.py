"""auto_* forecasters: hyperparameter search with expanding-window CV.

Mirrors functime forecasting/automl.py:22-311 (FLAML CFO over lags x
model hyperparameters, scored by expanding-window CV — fit_cv
_ar.py:117-209, _evaluate.py:111-171). FLAML is not available here, so
the search is a deterministic low-discrepancy grid (lags x
regularization) evaluated by the same CV loop — trials are
driver-orchestrated Spark jobs, which at cluster scale parallelize
naturally (each trial is a distributed fit; concurrent trials can
share the cluster via FAIR scheduling).

The fitted result exposes `best_params_` and behaves as the winning
forecaster refit on the full panel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from functime_spark.forecasting.base import Forecaster
from functime_spark.forecasting.knn import knn
from functime_spark.forecasting.linear import (
    elastic_net,
    lasso,
    linear_model,
    ridge,
)
from functime_spark.forecasting.tree import gradient_boosted_model
from functime_spark.operators.metrics import smape


def _cv_score(maker, y: DataFrame, test_size: int, n_splits: int) -> float:
    """Mean panel SMAPE over expanding-window backtest splits."""
    fc = maker()
    preds = fc.backtest(y, test_size=test_size, n_splits=n_splits)
    merged = smape(y, preds.drop("split"))
    row = merged.agg(F.avg("smape").alias("s")).first()
    return float(row["s"]) if row["s"] is not None else float("inf")


class _auto_base(Forecaster):
    """Grid search driver. Subclasses define _space() and _family."""

    _family = linear_model

    def __init__(
        self,
        freq: str,
        min_lags: int = 3,
        max_lags: int = 12,
        test_size: int = 4,
        n_splits: int = 2,
        target_transform=None,
        **family_kwargs,
    ):
        super().__init__(freq=freq, lags=max_lags, target_transform=target_transform)
        self.min_lags = min_lags
        self.max_lags = max_lags
        self.test_size = test_size
        self.n_splits = n_splits
        self.family_kwargs = family_kwargs
        self.best_params_: dict = {}

    def _init_kwargs(self) -> dict:
        return {
            "freq": self.freq,
            "min_lags": self.min_lags,
            "max_lags": self.max_lags,
            "test_size": self.test_size,
            "n_splits": self.n_splits,
            **self.family_kwargs,
        }

    def _space(self) -> list:
        """List of param dicts to try (beyond lags)."""
        return [{}]

    def _lag_grid(self) -> list:
        lo, hi = self.min_lags, self.max_lags
        grid = sorted({lo, (lo + hi) // 2, hi})
        return [g for g in grid if g >= 1]

    def _fit(self, y: DataFrame, X: DataFrame | None = None):
        y = y.persist()
        best, best_score = None, float("inf")
        for lags in self._lag_grid():
            for params in self._space():
                kwargs = {
                    "freq": self.freq,
                    "lags": lags,
                    **params,
                    **self.family_kwargs,
                }
                try:
                    score = _cv_score(
                        lambda kw=kwargs: self._family(**kw),
                        y,
                        self.test_size,
                        self.n_splits,
                    )
                except Exception:
                    continue
                if score < best_score:
                    best, best_score = kwargs, score
        if best is None:  # degenerate panel: fall back to smallest config
            best = {"freq": self.freq, "lags": self._lag_grid()[0], **self.family_kwargs}
        self.best_params_ = best
        self.best_score_ = best_score
        inner = self._family(**best).fit(y, X)
        self.state.update(inner.state)
        self._inner = inner
        y.unpersist()

    def _predict_values(self, fh: int, X: DataFrame | None = None) -> DataFrame:
        return self._inner._predict_values(fh, X)


class auto_linear_model(_auto_base):
    """Ref automl.py auto_linear_model: search over lags."""

    _family = linear_model


class auto_lasso(_auto_base):
    _family = lasso

    def _space(self) -> list:
        return [{"alpha": a} for a in (0.1, 1.0)]


class auto_ridge(_auto_base):
    _family = ridge

    def _space(self) -> list:
        return [{"alpha": a} for a in (0.1, 1.0)]


class auto_elastic_net(_auto_base):
    _family = elastic_net

    def _space(self) -> list:
        return [{"alpha": 0.5, "l1_ratio": r} for r in (0.25, 0.75)]


class auto_knn(_auto_base):
    _family = knn

    def _space(self) -> list:
        return [{"n_neighbors": k} for k in (3, 5)]


class auto_lightgbm(_auto_base):
    """Ref automl.py:22-118 (FLAML lgbm); GBT backbone here."""

    _family = gradient_boosted_model

    def _space(self) -> list:
        return [
            {"max_iter": 10, "max_depth": 3},
            {"max_iter": 20, "max_depth": 5},
        ]


class _fixed_lag_cv(_auto_base):
    """Regularization-only CV at a FIXED lag count — the analog of the
    reference's sklearn *CV regressors (linear.py:10-203: LassoCV /
    RidgeCV / ElasticNetCV choose alpha internally; lags are a user
    parameter there, not searched)."""

    def __init__(
        self,
        freq: str,
        lags: int = 3,
        test_size: int = 4,
        n_splits: int = 2,
        target_transform=None,
        **family_kwargs,
    ):
        super().__init__(
            freq=freq,
            min_lags=lags,
            max_lags=lags,
            test_size=test_size,
            n_splits=n_splits,
            target_transform=target_transform,
            **family_kwargs,
        )

    def _init_kwargs(self) -> dict:
        return {
            "freq": self.freq,
            "lags": self.min_lags,
            "test_size": self.test_size,
            "n_splits": self.n_splits,
            **self.family_kwargs,
        }


class lasso_cv(_fixed_lag_cv):
    """Ref forecasting/linear.py:161-178 (LassoCV)."""

    _family = lasso

    def _space(self) -> list:
        return [{"alpha": a} for a in (0.01, 0.1, 1.0)]


class ridge_cv(_fixed_lag_cv):
    """Ref forecasting/linear.py (RidgeCV)."""

    _family = ridge

    def _space(self) -> list:
        return [{"alpha": a} for a in (0.01, 0.1, 1.0)]


class elastic_net_cv(_fixed_lag_cv):
    """Ref forecasting/linear.py (ElasticNetCV)."""

    _family = elastic_net

    def _space(self) -> list:
        return [
            {"alpha": a, "l1_ratio": r}
            for a in (0.1, 1.0)
            for r in (0.25, 0.75)
        ]


class flaml_lightgbm(auto_lightgbm):
    """Ref forecasting/lightgbm.py:80-137: FLAML-tuned LightGBM.
    FLAML/LightGBM are absent in this environment; the deterministic
    grid-CV over the GBT backbone covers the same contract (searchable
    boosted-tree forecaster behind the reference's export name)."""
