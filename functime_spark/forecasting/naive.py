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
from functime_spark.forecasting.ranges import explode_future_ranges, make_future_ranges


class naive(Forecaster):
    """Last value carried forward. Ref naive.py:9-60."""

    def _fit(self, y: DataFrame, X: DataFrame | None = None):
        p = self.state["panel"]
        self.state["y_last"] = y.groupBy(p.entity).agg(
            F.max_by(p.target, p.time).alias("__last")
        )

    def _predict(self, fh: int, X: DataFrame | None = None) -> DataFrame:
        p = self.state["panel"]
        futures = make_future_ranges(self.state["cutoffs"], fh, self.freq, p.time)
        rows = explode_future_ranges(futures)
        return (
            rows.join(F.broadcast(self.state["y_last"]), on=p.entity, how="left")
            .select(p.entity, p.time, F.col("__last").alias(p.target))
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
        tail = F.slice(
            F.collect_list(p.target).over(ow), -self.sp, self.sp
        )
        lasts = (
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
        self.state["y_tail"] = lasts

    def _predict(self, fh: int, X: DataFrame | None = None) -> DataFrame:
        p = self.state["panel"]
        futures = make_future_ranges(self.state["cutoffs"], fh, self.freq, p.time)
        rows = explode_future_ranges(futures)
        val = F.element_at(
            F.col("__tail"), (F.col("step") % F.size("__tail") + 1).cast("int")
        )
        return (
            rows.join(F.broadcast(self.state["y_tail"]), on=p.entity, how="left")
            .select(p.entity, p.time, val.alias(p.target))
        )
