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
