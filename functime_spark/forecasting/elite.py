"""`elite` ensemble forecaster: per-entity model selection + blending.

Mirrors functime forecasting/elite.py:25-389 — cross-validate a bank
of preset pipelines, rank them per entity, and blend the top-k per
entity (mean stacking); entities the bank cannot score fall back to
naive (ref elite.py:376-387).

Spark shape: every candidate's backtest and final forecast is a
DataFrame tagged with a `__model` column; scoring, per-entity ranking
(window top-k) and the final blend (semi-join on the selection table +
groupBy mean) are all native — the only driver-side loop is over the
handful of candidate models.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from functime_spark.forecasting.base import Forecaster
from functime_spark.forecasting.linear import linear_model, ridge
from functime_spark.forecasting.naive import naive, snaive
from functime_spark.operators.metrics import smape
from functime_spark.panel import panel_cols


def _default_bank(freq: str, sp: int, lags: int) -> dict:
    return {
        "naive": lambda: naive(freq=freq),
        "snaive": lambda: snaive(freq=freq, sp=sp),
        "linear": lambda: linear_model(freq=freq, lags=lags),
        "ridge": lambda: ridge(freq=freq, lags=lags),
    }


class elite(Forecaster):
    def __init__(
        self,
        freq: str,
        lags: int = 12,
        sp: int = 7,
        top_k: int = 2,
        test_size: int = 4,
        n_splits: int = 2,
        bank: dict | None = None,
        target_transform=None,
    ):
        super().__init__(freq=freq, lags=lags, target_transform=target_transform)
        self.sp = sp
        self.top_k = top_k
        self.test_size = test_size
        self.n_splits = n_splits
        self.bank = bank

    def _init_kwargs(self) -> dict:
        return {
            "freq": self.freq,
            "lags": self.lags,
            "sp": self.sp,
            "top_k": self.top_k,
            "test_size": self.test_size,
            "n_splits": self.n_splits,
        }

    def _fit(self, y: DataFrame, X: DataFrame | None = None):
        p = self.state["panel"]
        y = y.persist()
        bank = self.bank or _default_bank(self.freq, self.sp, self.lags)

        scores = None  # (entity, __model, smape)
        for name, maker in bank.items():
            try:
                preds = maker().backtest(
                    y, test_size=self.test_size, n_splits=self.n_splits
                )
            except Exception:
                continue
            s = smape(y, preds.drop("split")).withColumn("__model", F.lit(name))
            scores = s if scores is None else scores.unionByName(s)

        # per-entity top-k by smape; entities with no finite score get
        # the naive fallback (ref elite.py:376-387)
        # model name as secondary sort: equal-smape ties must resolve
        # the same way on every run (and in the correctness oracle)
        rank_w = Window.partitionBy(p.entity).orderBy("smape", "__model")
        selection = (
            scores.filter(F.col("smape").isNotNull() & ~F.isnan("smape"))
            .withColumn("__rank", F.row_number().over(rank_w))
            .filter(F.col("__rank") <= self.top_k)
            .select(p.entity, "__model")
        )
        all_entities = y.select(p.entity).distinct()
        covered = selection.select(p.entity).distinct()
        fallback = all_entities.join(covered, on=p.entity, how="left_anti").select(
            p.entity, F.lit("naive").alias("__model")
        )
        self.state["selection"] = selection.unionByName(fallback).persist()
        self.state["fitted_bank"] = {
            name: maker().fit(y) for name, maker in bank.items()
        }
        y.unpersist()

    def _predict_values(self, fh: int, X: DataFrame | None = None) -> DataFrame:
        p = self.state["panel"]
        preds = None
        for name, fc in self.state["fitted_bank"].items():
            d = fc._predict_values(fh).withColumn("__model", F.lit(name))
            preds = d if preds is None else preds.unionByName(d)
        chosen = preds.join(
            F.broadcast(self.state["selection"]), on=[p.entity, "__model"], how="inner"
        )
        return chosen.groupBy(p.entity, "step").agg(F.avg("__yhat").alias("__yhat"))
