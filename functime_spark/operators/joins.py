"""Time-series joins Spark lacks natively: as-of and interval joins.

The reference has no as-of/range join (all its joins are equi —
SURVEY §2.3); these are part of the beyond-reference surface a
time-series engine needs (attach the latest slowly-changing value — a
price, a rollup, a config — to every observation; match events into
spans).

Spark-first shape for as-of: NOT a per-row range probe. Union the two
sides with a source tag, run ONE per-entity window pass where every
left row picks up `last(right_value, ignorenulls=True)` over rows up
to itself, keep the left rows. One shuffle (the entity window), zero
join fan-out, no skew beyond what the entity axis already has — the
same trick works identically on a 1000-executor cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    direction: str = "backward",
    tolerance=None,
    suffix: str = "_r",
    allow_exact_matches: bool = True,
) -> DataFrame:
    """As-of join on the panel convention (col 0 = entity, col 1 =
    time), pandas ``merge_asof`` directions:

    - ``backward`` (default): greatest right-time <= left-time;
    - ``forward``: smallest right-time >= left-time;
    - ``nearest``: whichever side is closer (ties -> backward).

    ``allow_exact_matches=False`` makes the comparisons strict
    (< / >), exactly like merge_asof — implemented purely by flipping
    which side wins the equal-time sort, so the plan is unchanged.
    Right value columns keep their names (`suffix`-renamed on
    clashes). ``tolerance``: a Column / interval expression — matches
    farther than it become NULL."""
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown asof direction {direction!r}")
    le, lt = left.columns[:2]
    re_, rt = right.columns[:2]
    rvals = right.columns[2:]
    out_names = {c: (c + suffix if c in left.columns else c) for c in rvals}
    l_tag = left.select(
        F.col(le).alias("__e"),
        F.col(lt).alias("__t"),
        F.lit(1).alias("__src"),
        *[F.col(c) for c in left.columns],
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
    union = l_tag.unionByName(r_tag)

    # backward: right rows sort BEFORE left at equal times (src 0 < 1)
    # so an equal-time right row is inside the trailing frame; forward
    # mirrors it (src desc) for the leading frame. Strict mode flips
    # both orderings, pushing equal-time right rows OUT of the frame.
    b_src = F.col("__src").asc() if allow_exact_matches else F.col("__src").desc()
    f_src = F.col("__src").desc() if allow_exact_matches else F.col("__src").asc()
    wb = (
        Window.partitionBy("__e")
        .orderBy(F.col("__t").asc(), b_src)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wf = (
        Window.partitionBy("__e")
        .orderBy(F.col("__t").asc(), f_src)
        .rowsBetween(0, Window.unboundedFollowing)
    )

    cols = ["*"]
    if direction in ("backward", "nearest"):
        cols += [
            F.last(f"__rv_{c}", ignorenulls=True).over(wb).alias(f"__b_{c}")
            for c in rvals
        ] + [F.last("__rt", ignorenulls=True).over(wb).alias("__bt")]
    if direction in ("forward", "nearest"):
        cols += [
            F.first(f"__rv_{c}", ignorenulls=True).over(wf).alias(f"__f_{c}")
            for c in rvals
        ] + [F.first("__rt", ignorenulls=True).over(wf).alias("__ft")]
    out = union.select(*cols).filter(F.col("__src") == 1)

    def _ok(side_t, back: bool):
        ok = side_t.isNotNull()
        if tolerance is not None:
            ok = ok & (
                side_t >= (F.col("__t") - tolerance)
                if back
                else side_t <= (F.col("__t") + tolerance)
            )
        return ok

    if direction == "backward":
        picked = {c: F.when(_ok(F.col("__bt"), True), F.col(f"__b_{c}")) for c in rvals}
    elif direction == "forward":
        picked = {c: F.when(_ok(F.col("__ft"), False), F.col(f"__f_{c}")) for c in rvals}
    else:
        b_ok = _ok(F.col("__bt"), True)
        f_ok = _ok(F.col("__ft"), False)
        # closer side wins; equal distance -> backward (pandas rule)
        use_b = b_ok & (
            ~f_ok
            | ((F.col("__t") - F.col("__bt")) <= (F.col("__ft") - F.col("__t")))
        )
        picked = {
            c: F.when(use_b, F.col(f"__b_{c}")).otherwise(
                F.when(f_ok, F.col(f"__f_{c}"))
            )
            for c in rvals
        }
    return out.select(
        *[F.col(c) for c in left.columns],
        *[picked[c].alias(out_names[c]) for c in rvals],
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

    def us(col, dtypes):
        c = F.col(col)
        if dtypes[col] == "timestamp_ntz":
            c = c.cast("timestamp_ltz")
        return F.unix_micros(c)

    p = points.withColumn(
        "__b", F.floor(us(pt, dict(points.dtypes)) / F.lit(width))
    )
    idt = dict(intervals.dtypes)
    i = intervals.withColumn(
        "__b",
        F.explode(
            F.sequence(
                F.floor(us(istart, idt) / F.lit(width)),
                F.floor(us(iend, idt) / F.lit(width)),
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
    if how == "left":
        # add back the unmatched points with null interval columns:
        # anti-join on the full left row (duplicate identical points
        # anti-join identically, so multiplicity is preserved)
        matched = out.select(*points.columns).distinct()
        unmatched = points.join(matched, on=list(points.columns), how="left_anti")
        icols = [c for c in i.columns if c not in (ie, "__b")]
        for c in icols:
            unmatched = unmatched.withColumn(
                c, F.lit(None).cast(dict(i.dtypes)[c])
            )
        return out.unionByName(unmatched)
    raise ValueError(f"interval_join supports how='inner'|'left', got {how!r}")
