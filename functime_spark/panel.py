"""Panel (long-format) conventions and window helpers.

The single core abstraction mirrors the reference's positional schema
(reference preprocessing.py:35, base/forecaster.py:179-183): column 0 is
the entity (series id), column 1 is the time column, remaining columns
are target/features. No index objects, no metadata class — a plain
pyspark DataFrame carries the panel.

Scale notes
-----------
The dominant physical pattern is *partition by entity, order by time*:
one shuffle co-locates each series, after which every window function
and grouped aggregate pipelines without further shuffles (Catalyst
reuses the child's hash-partitioning/ordering across same-keyed
windows). Entities are the embarrassingly-parallel axis, so a 100 TB
panel scales by adding executors, exactly like the reference's
per-series rayon parallelism scales by adding threads.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window, WindowSpec
from pyspark.sql import functions as F
from pyspark.sql.types import NumericType


@dataclass(frozen=True)
class Panel:
    """Resolved column roles for a panel DataFrame."""

    entity: str
    time: str
    values: tuple

    @property
    def target(self) -> str:
        return self.values[0]


def panel_cols(df: DataFrame) -> Panel:
    """Resolve (entity, time, values...) from the positional convention."""
    cols = df.columns
    if len(cols) < 3:
        raise ValueError(
            f"panel DataFrame needs >= 3 columns (entity, time, value...); got {cols}"
        )
    return Panel(entity=cols[0], time=cols[1], values=tuple(cols[2:]))


def ordered_window(entity: str, time: str) -> WindowSpec:
    """Per-entity time-ordered window — the workhorse spec (§2.5)."""
    return Window.partitionBy(entity).orderBy(time)


def entity_window(entity: str) -> WindowSpec:
    """Whole-series frame: per-entity, unordered (full-partition aggregates)."""
    return Window.partitionBy(entity)


def cumulative_window(entity: str, time: str) -> WindowSpec:
    return (
        Window.partitionBy(entity)
        .orderBy(time)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )


def trailing_window(entity: str, time: str, n_rows: int) -> WindowSpec:
    """Trailing row frame covering the current row and n_rows-1 predecessors."""
    return (
        Window.partitionBy(entity).orderBy(time).rowsBetween(-(n_rows - 1), 0)
    )


def numeric_cols(df: DataFrame, exclude: tuple = ()) -> list:
    """dtype-based selector ≙ reference's `cs.numeric()` (preprocessing.py:20)."""
    return [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, NumericType) and f.name not in exclude
    ]


def with_row_index(df: DataFrame, entity: str, time: str, name: str = "__idx") -> DataFrame:
    """Attach a per-entity 0..n-1 time index (reference `arg_sort().over`)."""
    return df.withColumn(name, F.row_number().over(ordered_window(entity, time)) - F.lit(1))


def colocate_by_entity(df: DataFrame, entity: str, time: str, num_partitions: int | None = None) -> DataFrame:
    """One explicit shuffle to co-locate each series, sorted within partitions.

    Mirrors the reference's pre-sort + set_sorted trick
    (preprocessing.py:197-204): later window specs over (entity, time)
    reuse this partitioning/ordering, so N downstream window ops cost
    one shuffle total instead of N.
    """
    parts = [entity]
    rep = df.repartition(num_partitions, *parts) if num_partitions else df.repartition(*parts)
    return rep.sortWithinPartitions(entity, time)
