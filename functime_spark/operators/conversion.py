"""Wide/long panel conversion. Mirrors functime conversion.py."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def wide_to_long(df: DataFrame, entity_name: str, time_col: str, value_name: str = "value") -> DataFrame:
    """Unpivot wide (time, series1, series2, ...) into the panel layout.

    Ref conversion.py:7-52 → Spark `unpivot` (no shuffle; a generator
    projection)."""
    series_cols = [c for c in df.columns if c != time_col]
    out = df.unpivot(
        ids=[time_col],
        values=series_cols,
        variableColumnName=entity_name,
        valueColumnName=value_name,
    )
    return out.select(entity_name, time_col, value_name)


def long_to_wide(df: DataFrame) -> DataFrame:
    """Pivot panel (entity, time, value) into (time, entity1, entity2...).

    Ref conversion.py:55-97 → groupBy(time).pivot(entity).first(value);
    entity cardinality must be driver-manageable (same constraint as
    the reference's eager pivot)."""
    e, t, v = df.columns[:3]
    return df.groupBy(t).pivot(e).agg(F.first(v))
