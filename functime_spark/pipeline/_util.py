"""Shared pipeline internals."""

from __future__ import annotations

from pyspark.sql import DataFrame


def _cluster_parallelism(df: DataFrame) -> int:
    """Target partition count for CPU-dense Python stages.

    max(defaultParallelism, shuffle.partitions): defaultParallelism
    alone undershoots a dynamic-allocation cluster that scales
    executors up after the plan is built, and sparkContext does not
    exist under Spark Connect — fall back to shuffle.partitions
    there."""
    spark = df.sparkSession
    try:
        # non-numeric values exist in the wild (e.g. 'auto' under
        # auto-optimized shuffle) — they must not crash the fallback
        shuffle_n = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    except (TypeError, ValueError):
        shuffle_n = 200
    try:
        return max(spark.sparkContext.defaultParallelism, shuffle_n)
    except Exception:  # Spark Connect: no sparkContext on the client
        return shuffle_n


def spread_groups(df: DataFrame, key_col: str) -> DataFrame:
    """Explicit hash repartition on the group key at cluster
    parallelism, ahead of a Python-kernel groupBy().applyInPandas.

    AQE coalesces the shuffle feeding a group-map stage by BYTES
    (minPartitionSize), and per-entity panels are tiny in bytes but
    heavy in Python CPU — byte-coalescing serializes the whole scipy
    stage onto one task (measured 3.5x on the sf0.1 UDF feature pass).
    A repartition with an EXPLICIT partition count is exempt from AQE
    coalescing, and the downstream groupBy reuses the hash
    partitioning, so this costs no extra exchange. Streaming frames
    pass through (stateful ops manage their own shuffle)."""
    if df.isStreaming:
        return df
    return df.repartition(_cluster_parallelism(df), key_col)


def spread_for_cpu(df: DataFrame, min_ratio: int = 4) -> DataFrame:
    """Rebalance a narrow input ahead of a CPU-dense projection.

    A compact parquet source (one row group) arrives as ONE partition,
    serializing work like the 32-lane minhash sweep or corpus
    tokenization onto a single core no matter the cluster size —
    parquet cannot split below row-group granularity, and AQE only
    rebalances SHUFFLE boundaries, not scan parallelism. Repartition
    only when the input's parallelism is at least `min_ratio`x below
    the cluster's: at real scale (thousands of input splits) this is
    a no-op with zero added shuffle; on narrow inputs the round-robin
    exchange of raw rows costs far less than the serialized
    projection. Streaming frames pass through untouched (no .rdd on a
    stream)."""
    if df.isStreaming:
        return df
    target = _cluster_parallelism(df)
    try:
        n_in = df.rdd.getNumPartitions()
    except Exception:  # Spark Connect: no RDD API on the client
        return df
    if n_in * min_ratio <= target:
        return df.repartition(target)
    return df
