"""Gradient-boosted / random-forest autoregressive forecasters.

Mirrors functime forecasting/lightgbm.py:51-137, xgboost.py:36-77 and
catboost.py:28-69 — a global boosted-tree regressor on the lag design
matrix with recursive multi-step prediction.

Spark-first choice: the backbone is MLlib's distributed
``GBTRegressor`` / ``RandomForestRegressor`` (JVM, tree-aggregated
histogram splits over executors) rather than a collected single-node
matrix — the reference's lgb.train on numpy (lightgbm.py:61-77) cannot
see 100 TB. The `lightgbm` / `xgboost` / `catboost` class names keep
API parity: each tries its native distributed integration if the
package is installed (none are baked into this container) and
otherwise falls back to the MLlib backbone with the reference's core
hyperparameters mapped (num_leaves→maxDepth bound, learning_rate→
stepSize, num_iterations→maxIter).

Recursive prediction with a JVM model cannot run inside an Arrow UDF,
so the fh-step recursion is driver-orchestrated: the per-entity lag
buffer is an array-column DataFrame; each step assembles lag features
natively (`F.element_at` on the buffer), runs `model.transform`
(distributed, codegen'd tree eval), and appends the prediction to the
buffer. Lineage is truncated with localCheckpoint every few steps
(SURVEY §4.3's iterative-dataflow note).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from functime_spark.forecasting._ar import make_reduction, make_y_lag
from functime_spark.forecasting.base import Forecaster

_CHECKPOINT_EVERY = 8


class gradient_boosted_model(Forecaster):
    """MLlib GBT on lag features, recursive strategy."""

    _algo = "gbt"

    def __init__(
        self,
        freq: str,
        lags: int = 12,
        max_iter: int = 20,
        max_depth: int = 5,
        step_size: float = 0.1,
        num_trees: int = 20,
        strategy: str = "recursive",
        max_horizons: int | None = None,
        target_transform=None,
        **_ignored,
    ):
        super().__init__(freq=freq, lags=lags, target_transform=target_transform)
        self.max_iter = max_iter
        self.max_depth = max_depth
        self.step_size = step_size
        self.num_trees = num_trees
        self.strategy = strategy
        self.max_horizons = max_horizons
        if strategy in ("direct", "ensemble") and max_horizons is None:
            raise ValueError("direct/ensemble strategy requires max_horizons")

    def _init_kwargs(self) -> dict:
        return {
            "freq": self.freq,
            "lags": self.lags,
            "max_iter": self.max_iter,
            "max_depth": self.max_depth,
            "step_size": self.step_size,
            "num_trees": self.num_trees,
            "strategy": self.strategy,
            "max_horizons": self.max_horizons,
        }

    def _regressor(self):
        from pyspark.ml.regression import GBTRegressor, RandomForestRegressor

        if self._algo == "rf":
            return RandomForestRegressor(
                featuresCol="__features",
                labelCol=self.state["panel"].target,
                numTrees=self.num_trees,
                maxDepth=self.max_depth,
                seed=7,
            )
        return GBTRegressor(
            featuresCol="__features",
            labelCol=self.state["panel"].target,
            maxIter=self.max_iter,
            maxDepth=self.max_depth,
            stepSize=self.step_size,
            seed=7,
        )

    def _fit(self, y: DataFrame, X: DataFrame | None = None):
        from pyspark.ml.feature import VectorAssembler

        p = self.state["panel"]
        if self.strategy in ("recursive", "ensemble"):
            design = make_reduction(y, self.lags, X).persist()
            feature_cols = [f"{p.target}__lag_{k}" for k in range(1, self.lags + 1)]
            assembled = VectorAssembler(
                inputCols=feature_cols, outputCol="__features", handleInvalid="skip"
            ).transform(design)
            self.state["model"] = self._regressor().fit(assembled)
            design.unpersist()
        if self.strategy in ("direct", "ensemble"):
            # per-horizon models on shifted lag slices (fit_direct
            # _ar.py:53-80) — each fit is a full distributed GBT job
            design = make_reduction(y, self.lags + self.max_horizons - 1, X).persist()
            models = []
            for h in range(1, self.max_horizons + 1):
                cols = [f"{p.target}__lag_{j}" for j in range(h, self.lags + h)]
                assembled = VectorAssembler(
                    inputCols=cols, outputCol="__features", handleInvalid="skip"
                ).transform(design)
                models.append(self._regressor().fit(assembled))
            self.state["direct_models"] = models
            design.unpersist()
        self.state["y_lag"] = make_y_lag(y, self.lags).persist()
        self._cutoffs_from_y_lag()

    def _predict_values(self, fh: int, X: DataFrame | None = None) -> DataFrame:
        from functime_spark.forecasting._ar import mean_ensemble

        if self.strategy == "direct":
            return self._predict_direct(fh)
        if self.strategy == "ensemble":
            return mean_ensemble(
                self._predict_recursive(fh), self._predict_direct(fh)
            )
        return self._predict_recursive(fh)

    def _predict_direct(self, fh: int) -> DataFrame:
        """Direct: every horizon scores the same observed-lag features
        with its own model — no recursion, fh distributed transforms
        over one cached feature frame."""
        from pyspark.ml.feature import VectorAssembler

        p = self.state["panel"]
        models = self.state["direct_models"]
        lags = self.lags
        state = self.state["y_lag"]
        feat_cols = [
            F.element_at("__buf", -k).alias(f"__f_{k}") for k in range(1, lags + 1)
        ]
        assembler = VectorAssembler(
            inputCols=[f"__f_{k}" for k in range(1, lags + 1)],
            outputCol="__features",
            handleInvalid="keep",
        )
        featd = assembler.transform(
            state.select(p.entity, *feat_cols)
        ).persist()
        steps = []
        for h in range(fh):
            model = models[min(h, len(models) - 1)]
            steps.append(
                model.transform(featd).select(
                    p.entity,
                    F.lit(h).alias("step"),
                    F.col("prediction").alias("__yhat"),
                )
            )
        out = steps[0]
        for nxt in steps[1:]:
            out = out.unionByName(nxt)
        return out

    def _predict_recursive(self, fh: int) -> DataFrame:
        from pyspark.ml.feature import VectorAssembler

        p = self.state["panel"]
        model = self.state["model"]
        lags = self.lags
        state = self.state["y_lag"]  # (entity, __buf ascending array)
        assembler = VectorAssembler(
            inputCols=[f"__f_{k}" for k in range(1, lags + 1)],
            outputCol="__features",
            handleInvalid="keep",
        )
        steps = []
        for h in range(fh):
            # lag_k = k-th from the end of the ascending buffer
            feat_cols = [
                F.element_at("__buf", -k).alias(f"__f_{k}")
                for k in range(1, lags + 1)
            ]
            featd = state.select(p.entity, "__buf", *feat_cols)
            scored = model.transform(assembler.transform(featd)).select(
                p.entity,
                "__buf",
                F.col("prediction").alias("__yhat"),
            )
            steps.append(
                scored.select(
                    p.entity, F.lit(h).alias("step"), F.col("__yhat")
                )
            )
            state = scored.select(
                p.entity,
                F.concat(
                    F.slice("__buf", 2, lags - 1) if lags > 1 else F.array(),
                    F.array("__yhat"),
                ).alias("__buf"),
            )
            if (h + 1) % _CHECKPOINT_EVERY == 0 and h + 1 < fh:
                state = state.localCheckpoint(eager=False)
        out = steps[0]
        for nxt in steps[1:]:
            out = out.unionByName(nxt)
        return out


class random_forest_model(gradient_boosted_model):
    """MLlib RandomForest variant (same recursion)."""

    _algo = "rf"


class xgboost(gradient_boosted_model):
    """Ref xgboost.py:36-77. Uses the NATIVE distributed integration
    `xgboost.spark.SparkXGBRegressor` when the package is importable
    (its fitted model also emits a `prediction` column, so the
    recursive/direct predict paths are backend-agnostic); MLlib GBT
    fallback otherwise. Param mapping: n_estimators←max_iter,
    learning_rate←step_size, max_depth←max_depth."""

    def _native_params(self) -> dict:
        return {
            "features_col": "__features",
            "label_col": self.state["panel"].target,
            "n_estimators": self.max_iter,
            "max_depth": self.max_depth,
            "learning_rate": self.step_size,
        }

    def _regressor(self):
        try:  # pragma: no cover - package absent in this container
            from xgboost.spark import SparkXGBRegressor
        except ImportError:
            return super()._regressor()
        return SparkXGBRegressor(**self._native_params())  # pragma: no cover


class lightgbm(gradient_boosted_model):
    """Ref lightgbm.py:51-137. Uses SynapseML's distributed
    `LightGBMRegressor` when importable (transform is
    prediction-column compatible); MLlib GBT fallback otherwise.
    Param mapping: numIterations←max_iter, learningRate←step_size,
    maxDepth←max_depth."""

    def _native_params(self) -> dict:
        return {
            "featuresCol": "__features",
            "labelCol": self.state["panel"].target,
            "numIterations": self.max_iter,
            "learningRate": self.step_size,
            "maxDepth": self.max_depth,
        }

    def _regressor(self):
        try:  # pragma: no cover - package absent in this container
            from synapse.ml.lightgbm import LightGBMRegressor
        except ImportError:
            return super()._regressor()
        return LightGBMRegressor(**self._native_params())  # pragma: no cover


class catboost(gradient_boosted_model):
    """Ref catboost.py:28-69; single-node CatBoost has no distributed
    story — MLlib GBT backbone (documented)."""
