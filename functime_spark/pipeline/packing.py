"""Deterministic shard packing: assign documents to fixed-token-budget
training shards in stable doc_id order.

The naive formulation is a GLOBAL running token count —
``sum(tokens) over (order by doc_id)`` — which Spark executes as a
single-partition window (one task owns the whole corpus: the classic
100 TB bottleneck). This implements the distributed two-phase prefix
sum instead:

1. bucket documents by monotone id ranges (bucket boundaries from one
   tiny min/max aggregate);
2. per-bucket token totals -> driver-side exclusive prefix offsets
   (n_buckets rows — broadcast back);
3. within-bucket running sum (window partitioned BY BUCKET, ordered
   by id) + the bucket's offset = the exact global prefix.

Every stage is parallel across buckets; no task ever sees more than
1/n_buckets of the data. Shard id = floor(global_offset / budget) —
byte/token-budget shard layout for dataloader-friendly training runs.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_shards(
    docs: DataFrame,
    tokens_per_shard: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 64,
) -> DataFrame:
    """(id, n_tokens, start_offset, shard): exclusive global prefix
    of whitespace-token counts in id order; shard = start_offset // budget.

    Documents may straddle a shard boundary (floor semantics — the
    standard fixed-budget layout where a reader slices the leftover
    into the next shard)."""
    toks = F.size(F.filter(F.split(F.col(text_col), r"\s+"), lambda x: x != ""))
    base = docs.select(F.col(id_col), toks.cast("long").alias("n_tokens"))
    lo, hi = base.agg(F.min(id_col), F.max(id_col)).first()
    if lo is None:
        return base.select(
            id_col,
            "n_tokens",
            F.lit(0).cast("long").alias("start_offset"),
            F.lit(0).cast("long").alias("shard"),
        )
    width = max(1, math.ceil((hi - lo + 1) / n_buckets))
    bucketed = base.withColumn(
        "__bkt", ((F.col(id_col) - F.lit(lo)) / F.lit(width)).cast("long")
    )
    # phase 2: tiny per-bucket totals -> exclusive prefix on the driver
    totals = {
        r["__bkt"]: r["t"]
        for r in bucketed.groupBy("__bkt").agg(F.sum("n_tokens").alias("t")).collect()
    }
    run, prefix = 0, {}
    for b in sorted(totals):
        prefix[b] = run
        run += totals[b]
    spark = docs.sparkSession
    pre = spark.createDataFrame(
        [(int(b), int(p)) for b, p in prefix.items()], "__bkt long, __pre long"
    )
    # phase 3: within-bucket running sum + broadcast bucket offset
    w = (
        Window.partitionBy("__bkt")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    out = (
        bucketed.join(F.broadcast(pre), on="__bkt")
        .withColumn(
            "start_offset", F.col("__pre") + F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
        )
        .select(
            id_col,
            "n_tokens",
            "start_offset",
            F.floor(F.col("start_offset") / F.lit(tokens_per_shard)).alias("shard"),
        )
    )
    return out
