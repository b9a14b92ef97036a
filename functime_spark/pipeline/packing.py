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
from functime_spark.materialize import materialize


def pack_shards(
    docs: DataFrame,
    tokens_per_shard: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 64,
    bpe_merges: list | None = None,
    shuffle: bool = False,
) -> DataFrame:
    """(id, n_tokens, start_offset, shard): exclusive global prefix
    of token counts in id order; shard = start_offset // budget.

    Documents may straddle a shard boundary (floor semantics — the
    standard fixed-budget layout where a reader slices the leftover
    into the next shard).

    ``bpe_merges``: budget by exact BPE subword counts under a fitted
    merge list (pipeline.bpe.fit_bpe) instead of whitespace tokens —
    the layout then matches what the training dataloader actually
    consumes.

    ``shuffle=True``: pack in deterministic pseudo-random order —
    md5(id) replaces id as the packing key, so consecutive source
    documents land in different shards (the dataloader-shuffle a
    training run wants, with byte-reproducible layout). The two-phase
    prefix sum is unchanged; the hash key is uniform, so the id-range
    buckets balance even when source ids cluster."""
    if bpe_merges is not None:
        from functime_spark.pipeline.bpe import bpe_tokenize

        base = bpe_tokenize(docs, bpe_merges, text_col, id_col).select(
            F.col(id_col), F.col("n_bpe_tokens").alias("n_tokens")
        )
        # the tokenization pass feeds three plan branches (min/max agg,
        # per-bucket totals, final join) — materialize once or the whole
        # BPE pass re-executes per branch
        base = materialize(base)
    else:
        toks = F.size(
            F.filter(F.split(F.col(text_col), r"\s+"), lambda x: x != "")
        )
        base = docs.select(F.col(id_col), toks.cast("long").alias("n_tokens"))
    if shuffle:
        # deterministic pseudo-random packing key: 60-bit md5 prefix of
        # the id (same arithmetic as the dedup md5 hash variant, so the
        # oracle replays it byte-exactly)
        key = F.conv(
            F.substring(F.md5(F.col(id_col).cast("string")), 1, 15), 16, 10
        ).cast("long")
        base = base.withColumn("__key", key)
    else:
        base = base.withColumn("__key", F.col(id_col))
    lo, hi = base.agg(F.min("__key"), F.max("__key")).first()
    if lo is None:
        return base.select(
            id_col,
            "n_tokens",
            F.lit(0).cast("long").alias("start_offset"),
            F.lit(0).cast("long").alias("shard"),
        )
    width = max(1, math.ceil((hi - lo + 1) / n_buckets))
    bucketed = base.withColumn(
        "__bkt", ((F.col("__key") - F.lit(lo)) / F.lit(width)).cast("long")
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
        .orderBy("__key", id_col)
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


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = 128,
    overlap: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split documents into fixed-token training chunks with overlap:
    chunk c covers tokens [c*stride, c*stride + chunk_tokens) where
    stride = chunk_tokens - overlap. The trailing partial chunk is
    kept (dataloaders pad); zero-token docs emit no rows.

    Pure sequence/explode/slice Column algebra — each doc expands
    row-locally (no shuffle at all; chunking 100 TB is a map-only
    job), and the same list pipeline replays in the oracle.
    """
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap
    toks = F.filter(F.split(F.col(text_col), r"\s+"), lambda x: x != "")
    n = F.size(toks)
    # start offsets 0, stride, ... strictly below n
    starts = F.sequence(
        F.lit(0),
        F.greatest((n - 1) - ((n - 1) % stride), F.lit(0)),
        F.lit(stride),
    )
    exploded = docs.select(
        F.col(id_col),
        toks.alias("__toks"),
        n.alias("__n"),
        F.explode(starts).alias("__start"),
    ).filter(F.col("__start") < F.col("__n"))
    chunk = F.slice(F.col("__toks"), F.col("__start") + 1, chunk_tokens)
    return exploded.select(
        F.col(id_col),
        (F.col("__start") / stride).cast("long").alias("chunk_id"),
        F.array_join(chunk, " ").alias("chunk_text"),
        F.size(chunk).cast("long").alias("n_tokens"),
    )


def materialize_shards(
    docs: DataFrame,
    packed: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n\n",
) -> DataFrame:
    """(shard, n_docs, n_tokens, text): the actual training sequences
    — each shard's documents concatenated in offset order with a
    separator. Feed `pack_shards` output as ``packed``.

    One equi-join on id (docs never re-tokenize) + one groupBy(shard)
    whose per-group state is an array of (offset, id, text) structs
    sorted row-locally AFTER the aggregate — collect_list +
    array_sort, never a global sort. Ties (zero-token docs share an
    offset) break by id, matching the oracle's ORDER BY (so, doc_id).
    Shard token sums are budget-bounded by construction; a run of
    zero-token docs can still grow one group's doc count, like any
    degenerate-key aggregate."""
    j = packed.select(id_col, "start_offset", "shard", "n_tokens").join(
        docs.select(id_col, text_col), on=id_col
    )
    agg = j.groupBy("shard").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("n_tokens"),
        F.collect_list(
            F.struct(
                F.col("start_offset").alias("o"),
                F.col(id_col).alias("i"),
                F.col(text_col).alias("t"),
            )
        ).alias("__parts"),
    )
    text = F.array_join(
        F.transform(F.array_sort("__parts"), lambda s: s["t"]), sep
    )
    return agg.select("shard", "n_docs", "n_tokens", text.alias("text"))
