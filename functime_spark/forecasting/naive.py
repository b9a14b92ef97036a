"""Naive and seasonal-naive forecasters.

Mirrors functime forecasting/naive.py and snaive.py. The reference's
horizontal concat of sorted frames (naive.py:57-59) is re-expressed as
an entity join — identical semantics, shuffle-free when the per-entity
state frame is broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from functime_spark.forecasting.base import Forecaster


class naive(Forecaster):
    """Last value carried forward. Ref naive.py:9-60."""

    def _fit(self, y: DataFrame, X: DataFrame | None = None):
        p = self.state["panel"]
        self.state["y_last"] = y.groupBy(p.entity).agg(
            F.max_by(p.target, p.time).alias("__last")
        )

    def _predict_values(self, fh: int, X: DataFrame | None = None) -> DataFrame:
        p = self.state["panel"]
        return self.state["y_last"].select(
            p.entity,
            F.explode(F.sequence(F.lit(0), F.lit(fh - 1))).alias("step"),
            F.col("__last").alias("__yhat"),
        )


class snaive(Forecaster):
    """Tile the last seasonal cycle. Ref snaive.py:9-64:
    prediction step i (0-based) = tail_sp[i mod sp]."""

    def __init__(self, freq: str, sp: int):
        super().__init__(freq=freq, lags=1)
        self.sp = sp

    def _init_kwargs(self) -> dict:
        return {"freq": self.freq, "sp": self.sp}

    def _fit(self, y: DataFrame, X: DataFrame | None = None):
        p = self.state["panel"]
        ow = (
            Window.partitionBy(p.entity)
            .orderBy(p.time)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        tail = F.slice(F.collect_list(p.target).over(ow), -self.sp, self.sp)
        self.state["y_tail"] = (
            y.withColumn("__tail", tail)
            .withColumn(
                "__rn",
                F.row_number().over(
                    Window.partitionBy(p.entity).orderBy(F.desc(p.time))
                ),
            )
            .filter(F.col("__rn") == 1)
            .select(p.entity, "__tail")
        )

    def _predict_values(self, fh: int, X: DataFrame | None = None) -> DataFrame:
        p = self.state["panel"]
        step = F.explode(F.sequence(F.lit(0), F.lit(fh - 1))).alias("step")
        rows = self.state["y_tail"].select(p.entity, step, "__tail")
        val = F.element_at(
            F.col("__tail"), (F.col("step") % F.size("__tail") + 1).cast("int")
        )
        return rows.select(p.entity, "step", val.alias("__yhat"))
