"""Panel operators: preprocessing transformers, CV splitters, metrics."""

from functime_spark.operators import preprocessing  # noqa: F401
