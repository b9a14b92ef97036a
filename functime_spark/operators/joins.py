"""Time-series joins Spark lacks natively: as-of (backward) join.

The reference has no as-of join (all joins are equi — SURVEY §2.3);
this is part of the beyond-reference surface a time-series engine
needs (attach the latest slowly-changing value — a price, a rollup, a
config — to every observation).

Spark-first shape: NOT a per-row range probe. Union the two sides
with a source tag, run ONE per-entity window pass where every left
row picks up `last(right_value, ignorenulls=True)` over rows up to
itself, keep the left rows. One shuffle (the entity window), zero
join fan-out, no skew beyond what the entity axis already has — the
same trick works identically on a 1000-executor cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    tolerance=None,
    suffix: str = "_r",
) -> DataFrame:
    """Backward as-of join on the panel convention (col 0 = entity,
    col 1 = time): each left row gets the right row with the greatest
    right-time <= left-time for the same entity (ties at equal time
    match). Right value columns keep their names, `suffix`-renamed on
    clashes. ``tolerance``: a Column/interval expression — matches
    older than `left_time - tolerance` become NULL (pandas
    merge_asof semantics)."""
    le, lt = left.columns[:2]
    re_, rt = right.columns[:2]
    rvals = right.columns[2:]
    out_names = {
        c: (c + suffix if c in left.columns else c) for c in rvals
    }
    lcols = [F.col(c) for c in left.columns]
    l_tag = left.select(
        F.col(le).alias("__e"),
        F.col(lt).alias("__t"),
        F.lit(1).alias("__src"),
        *lcols,
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"__rv_{c}") for c in rvals],
        F.lit(None).cast(dict(right.dtypes)[rt]).alias("__rt"),
    )
    r_tag = right.select(
        F.col(re_).alias("__e"),
        F.col(rt).alias("__t"),
        F.lit(0).alias("__src"),
        *[F.lit(None).cast(t).alias(c) for c, t in left.dtypes],
        *[F.col(c).alias(f"__rv_{c}") for c in rvals],
        F.col(rt).alias("__rt"),
    )
    # right rows sort BEFORE left rows at equal times (src 0 < 1), so
    # an equal-time right row is visible to the left row's frame
    w = (
        Window.partitionBy("__e")
        .orderBy("__t", "__src")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = l_tag.unionByName(r_tag).select(
        "*",
        *[
            F.last(f"__rv_{c}", ignorenulls=True).over(w).alias(f"__f_{c}")
            for c in rvals
        ],
        F.last("__rt", ignorenulls=True).over(w).alias("__ft"),
    )
    out = filled.filter(F.col("__src") == 1)
    keep = F.lit(True)
    if tolerance is not None:
        keep = F.col("__ft") >= (F.col("__t") - tolerance)
    return out.select(
        *[F.col(c) for c in left.columns],
        *[
            F.when(keep, F.col(f"__f_{c}")).alias(out_names[c])
            for c in rvals
        ],
    )


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    bucket: str = "1d",
    how: str = "inner",
) -> DataFrame:
    """Range join: point rows to the interval rows containing them
    (entity equality + start <= t <= end, both ends inclusive).

    Spark has no native range join; the naive theta-join explodes into
    a broadcast-nested-loop. This is the bucketed reformulation: both
    sides map to fixed-width time buckets (points to one, intervals to
    every bucket they overlap via sequence+explode), meet in an
    EQUI-join on (entity, bucket) — hash-partitionable, AQE-skew-
    splittable — and the exact containment predicate filters the
    residue. Shuffle volume is |points| + |intervals| * avg_span/bucket
    instead of |points| x |intervals|. Pick ``bucket`` near the median
    interval span: wider buckets cut the explode factor, narrower
    buckets cut false candidate pairs."""
    from functime_spark.forecasting.ranges import strip_freq_alias

    pe, pt = points.columns[:2]
    ie, istart, iend = intervals.columns[:3]
    n, unit = strip_freq_alias(bucket)
    units_us = {
        "s": 1_000_000,
        "m": 60_000_000,
        "h": 3_600_000_000,
        "d": 86_400_000_000,
        "w": 604_800_000_000,
    }
    if unit not in units_us:
        raise ValueError(f"interval_join bucket must be s/m/h/d/w, got {bucket!r}")
    width = n * units_us[unit]

    def us(col):
        c = F.col(col)
        if dict(points.dtypes).get(col, dict(intervals.dtypes).get(col)) == (
            "timestamp_ntz"
        ):
            c = c.cast("timestamp_ltz")
        return F.unix_micros(c)

    p = points.withColumn("__b", F.floor(us(pt) / F.lit(width)))
    i = intervals.withColumn(
        "__b",
        F.explode(
            F.sequence(
                F.floor(us(istart) / F.lit(width)),
                F.floor(us(iend) / F.lit(width)),
            )
        ),
    )
    joined = p.join(
        i.withColumnRenamed(ie, pe),
        on=[pe, "__b"],
        how="inner",
    ).filter((F.col(pt) >= F.col(istart)) & (F.col(pt) <= F.col(iend)))
    out = joined.drop("__b")
    if how == "inner":
        return out
    raise ValueError(f"interval_join supports how='inner', got {how!r}")
