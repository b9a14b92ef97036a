"""Standalone backtest entrypoint (ref backtesting.py:108-250).

The reference exposes both `Forecaster.backtest` and a functional
`backtest(forecaster, ...)`; this module provides the functional form
over the same distributed splitter machinery (every split trains and
predicts as Spark jobs; only the stacked prediction frame is returned).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from functime_spark.forecasting.base import Forecaster


def backtest(
    forecaster: Forecaster,
    y: DataFrame,
    test_size: int = 1,
    step_size: int = 1,
    n_splits: int = 5,
    window_size: int | None = None,
) -> DataFrame:
    """Refit-and-predict across expanding (or sliding, when
    `window_size` is set) windows; returns stacked predictions with a
    `split` column."""
    return forecaster.backtest(
        y,
        test_size=test_size,
        step_size=step_size,
        n_splits=n_splits,
        window_size=window_size,
    )
