"""Future time-index generation per entity.

Mirrors functime ranges.py:9-46: given per-entity cutoffs (max time),
build the fh future timestamps. Native `F.sequence`/`transform` over
the small cutoffs frame — calendar frequencies (mo/q/y) use
add_months (calendar-aware, like Polars dt.offset_by), fixed
frequencies use interval arithmetic.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_FIXED_UNITS = {
    "s": "SECOND",
    "m": "MINUTE",
    "h": "HOUR",
    "d": "DAY",
    "w": "WEEK",
}


def strip_freq_alias(freq: str):
    m = re.fullmatch(r"(\d+)(mo|i|[a-z]+)", freq.lower())
    if not m:
        raise ValueError(f"unsupported frequency alias: {freq}")
    return int(m.group(1)), m.group(2)


def make_future_ranges(cutoffs: DataFrame, fh: int, freq: str, time_col: str = "time") -> DataFrame:
    """cutoffs: (entity, low). Returns (entity, array<time>) of length fh.

    Integer freq 'ki' mirrors the reference's int_ranges(low+1,
    low+fh+1, step=k) — ceil(fh/k) points; datetime freqs produce
    exactly fh points low+k, low+2k, ..."""
    entity = cutoffs.columns[0]
    low = F.col(cutoffs.columns[1])
    n, unit = strip_freq_alias(freq)
    if unit == "i":
        arr = F.sequence(
            (low + 1).cast("long"), (low + fh).cast("long"), F.lit(n).cast("long")
        )
    elif unit in _FIXED_UNITS:
        step = F.expr(f"INTERVAL {n} {_FIXED_UNITS[unit]}")
        arr = F.transform(
            F.sequence(F.lit(1), F.lit(fh)), lambda i: low + i.cast("int") * step
        )
    elif unit in ("mo", "q", "y"):
        months = {"mo": n, "q": 3 * n, "y": 12 * n}[unit]
        arr = F.transform(
            F.sequence(F.lit(1), F.lit(fh)),
            lambda i: F.add_months(low, i * months).cast(
                dict(cutoffs.dtypes)[cutoffs.columns[1]]
            ),
        )
    else:
        raise ValueError(f"unsupported frequency alias: {freq}")
    return cutoffs.select(F.col(entity), arr.alias(time_col))


def explode_future_ranges(futures: DataFrame) -> DataFrame:
    """(entity, array<time>) → (entity, step, time) with step 0-based."""
    entity, time_col = futures.columns
    return futures.select(
        entity, F.posexplode(time_col).alias("step", time_col)
    )
