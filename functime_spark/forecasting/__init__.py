"""Forecasters: naive family (pure DataFrame) + global AR models (MLlib)."""

from functime_spark.forecasting.base import Forecaster  # noqa: F401
from functime_spark.forecasting.linear import (  # noqa: F401
    elastic_net,
    lasso,
    linear_model,
    ridge,
)
from functime_spark.forecasting.naive import naive, snaive  # noqa: F401
from functime_spark.forecasting.ranges import make_future_ranges  # noqa: F401
