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


def X_to_numpy(df: DataFrame) -> "object":
    """Collect feature columns to a Float32 matrix: NaN/inf scrubbed to
    null, then per-column mean-imputed. Ref conversion.py:100-135.

    Driver-bound by design (feeds single-node ML fits, exactly like the
    reference); at cluster scale prefer the distributed MLlib paths in
    forecasting/ that never materialize the matrix.
    """
    import numpy as np

    feat_cols = df.columns[2:]
    cleaned = df.select(
        *[
            F.when(
                F.isnan(F.col(c).cast("double")) | F.col(c).cast("double").isin(
                    float("inf"), float("-inf")
                ),
                None,
            )
            .otherwise(F.col(c).cast("double"))
            .alias(c)
            for c in feat_cols
        ]
    )
    pdf = cleaned.toPandas()
    mat = pdf.to_numpy(dtype="float64")
    means = np.nanmean(mat, axis=0)
    idx = np.where(np.isnan(mat))
    mat[idx] = np.take(means, idx[1])
    return mat.astype("float32")


def y_to_numpy(df: DataFrame) -> "object":
    """Target column as a Float32 vector (NaN/inf -> mean), same
    contract as X_to_numpy. Ref conversion.py:100-136."""
    e, t = df.columns[:2]
    v = df.columns[-1]
    return X_to_numpy(df.select(e, t, v)).ravel()


#: name-parity alias — the reference exposes this as df_to_ndarray
#: (ref conversion.py:100); a user switching engines keeps their call.
df_to_ndarray = X_to_numpy
