"""Shared pipeline internals."""

from __future__ import annotations

from pyspark.sql import DataFrame


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
    n = df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(n, key_col)


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
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() * min_ratio <= target:
        return df.repartition(target)
    return df
