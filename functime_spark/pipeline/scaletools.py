"""Scale-engineering operators: skew diagnosis and mitigation.

At 100 TB the difference between a job that finishes and one that
doesn't is usually a handful of hot keys: one user with 10^9 events
turns a clean hash join into a single straggler task. These operators
make skew *observable* (`skew_report`, `heavy_hitters`), *survivable*
(`salted_join` — explicit salting for engines/paths where AQE's
runtime skew split doesn't apply, e.g. aggregations feeding a join, or
non-AQE clusters), and *cheap to measure* (`group_cardinality` with an
HLL scale path).

All outputs are deterministic and exactly replayable by the DuckDB
correctness oracles; the HLL path is the one documented approximate
escape hatch (bounded relative error, pytest-pinned).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def key_counts(df: DataFrame, keys: list) -> DataFrame:
    """Per-key row counts — one partially-aggregated hash aggregate
    (map-side combine shrinks the shuffle to one row per key per
    task). The substrate for both diagnosis operators below."""
    return df.groupBy(*keys).agg(F.count(F.lit(1)).alias("cnt"))


def skew_report(
    df: DataFrame,
    keys: list,
    percentiles: tuple = (0.5, 0.9, 0.99),
) -> DataFrame:
    """One-row key-distribution summary: key cardinality, total rows,
    max/mean per-key count, count percentiles, and the skew ratio
    (max/mean) — the number that predicts straggler tasks. A ratio
    near 1 means uniform keys; >> shuffle-partition count means one
    task owns the key.

    Two aggregate passes over a frame that is already one row per key
    — the second pass input is |keys| rows, negligible at any scale.
    Exact percentiles over per-key counts are safe here for the same
    reason (the aggregate runs over key cardinality, not row count);
    for billion-key frames pass a sketch via `approx=True`-style
    wrappers upstream instead."""
    counts = key_counts(df, keys)
    aggs = [
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.sum("cnt").cast("long").alias("total_rows"),
        F.max("cnt").cast("long").alias("max_count"),
        F.avg("cnt").alias("mean_count"),
    ]
    for p in percentiles:
        # %g keeps p50/p90/p99 stable and float-error-proof (int()
        # would truncate 0.57*100=56.999.. to 56) and gives sub-percent
        # values distinct names (0.999 -> p99_9, not a second p99)
        name = f"p{p * 100:g}_count".replace(".", "_")
        aggs.append(F.percentile("cnt", F.lit(float(p))).alias(name))
    out = counts.agg(*aggs)
    return out.withColumn(
        "skew_ratio", F.col("max_count") / F.col("mean_count")
    )


def heavy_hitters(df: DataFrame, keys: list, top_k: int = 10) -> DataFrame:
    """Top-k keys by row count, ties broken by key order — the rows a
    salting/broadcast decision is made from. One hash aggregate, then
    a global top-k (Spark's TakeOrdered: per-partition heap + driver
    merge of k rows — no global sort shuffle)."""
    counts = key_counts(df, keys)
    return counts.orderBy(
        F.desc("cnt"), *[F.asc(k) for k in keys]
    ).limit(top_k)


def _salt_expr(df: DataFrame, n_salts: int):
    """Deterministic per-row salt in [0, n_salts): pmod of a 64-bit
    hash of every hashable column. MAP-typed columns are excluded —
    xxhash64 rejects maps anywhere in a type — so the salt stays a
    drop-in for frames with payload maps; if NO column is hashable the
    row serializes through to_json instead (still deterministic)."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    def has_map(dt) -> bool:
        if isinstance(dt, MapType):
            return True
        if isinstance(dt, ArrayType):
            return has_map(dt.elementType)
        if isinstance(dt, StructType):
            return any(has_map(f.dataType) for f in dt.fields)
        return False

    hashable = [f.name for f in df.schema.fields if not has_map(f.dataType)]
    if hashable:
        h = F.xxhash64(*[F.col(c) for c in hashable])
    else:
        h = F.xxhash64(F.to_json(F.struct(*df.columns)))
    return F.pmod(h, F.lit(n_salts))


def salted_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-mitigating equi-join: the (big, possibly skewed) left side
    gets a deterministic salt in [0, n_salts); the right side is
    replicated once per salt value (explode over a `sequence` array —
    n_salts small copies, NOT a broadcast of the whole right side).
    The join key becomes (key, salt), so a hot key's rows spread over
    n_salts shuffle partitions instead of one straggler task.

    Result is row-identical to the plain join: every left row carries
    exactly one salt and the right side covers all salts, so inner and
    left semantics are preserved (including NULL keys never matching).

    The salt is `pmod(xxhash64(<all left columns>), n_salts)`: it must
    vary WITHIN a key's rows (a hash of the join key alone would send
    the hot key back to one partition), and hashing the full row keeps
    it deterministic — reruns and resumed jobs salt identically.

    Use when AQE skew-split can't help: pre-AQE clusters, skew in the
    partial-aggregate feeding the join, or sort-merge paths where the
    skewed side is the stream side.
    """
    # Right/full joins are NOT salt-preserving: an unmatched right row
    # exists once per salt copy, so it would surface n_salts times.
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi",
               "leftsemi", "left_anti", "leftanti"}
    if how.lower().replace("_", "") not in {a.replace("_", "") for a in allowed}:
        raise ValueError(
            f"salted_join preserves only left-sided semantics, got how={how!r}"
        )
    if n_salts < 1:
        raise ValueError(f"n_salts must be >= 1, got {n_salts}")
    # helper-column name that cannot shadow (and then silently drop)
    # a user column on either side
    salt = "__salt"
    while salt in left.columns or salt in right.columns:
        salt += "_"
    # The salt must vary within a key's rows — spray by a hash of the
    # WHOLE left row (all hashable columns), which is deterministic per
    # row and (for distinct rows) spreads a hot key across all salts.
    salted_l = left.withColumn(salt, _salt_expr(left, n_salts))
    salted_r = right.withColumn(
        salt,
        F.explode(F.sequence(F.lit(0).cast("long"), F.lit(n_salts - 1).cast("long"))),
    )
    joined = salted_l.join(
        salted_r,
        on=[
            salted_l[left_on] == salted_r[right_on],
            salted_l[salt] == salted_r[salt],
        ],
        how=how,
    )
    return joined.drop(salted_l[salt]).drop(salted_r[salt])


def group_cardinality(
    df: DataFrame,
    group_col: str,
    distinct_cols: list,
    approx: bool = False,
    rsd: float = 0.02,
) -> DataFrame:
    """Per-group distinct counts: row count plus COUNT(DISTINCT c) for
    each requested column. ``approx=True`` switches to HyperLogLog++
    (`approx_count_distinct`, relative error `rsd`) — the 100 TB path:
    exact multi-column distinct counts expand the aggregate into one
    shuffle per distinct column, while the HLL sketches merge in the
    single ordinary aggregate pass. Exact mode is the correctness
    oracle twin."""
    if approx:
        dcs = [
            F.approx_count_distinct(c, rsd).cast("long").alias(f"n_{c}")
            for c in distinct_cols
        ]
    else:
        dcs = [F.count_distinct(F.col(c)).cast("long").alias(f"n_{c}") for c in distinct_cols]
    return df.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"), *dcs
    )


def cms_sketch(
    df: DataFrame,
    col: str,
    width: int = 1024,
    depth: int = 4,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Count-Min sketch (Cormode/Muthukrishnan) over a string column:
    (d, bucket, cnt) rows, at most depth*width of them — BOUNDED state
    for frequency estimation regardless of key cardinality (the
    sketch twin of `heavy_hitters`/`key_counts`, the way
    `group_cardinality(approx=True)` twins exact distinct counts).

    One shuffle: each input row explodes into its `depth` (row, bucket)
    assignments row-locally (pmod of `_hash64(col, seed=d)`), then one
    hash aggregate. ``hash_fn='md5'`` makes every bucket assignment
    byte-replayable in SQL (the dedup-oracle discipline); xxhash64 is
    the production path. Estimates are the classic one-sided
    guarantee: est >= true, est <= true + e*N/width w.h.p.

    NULLs in ``col`` are dropped before hashing (a NULL hashes to a
    NULL bucket, which would inflate the sketch with counter rows no
    cms_estimate probe can ever reach); count nulls separately if the
    null rate matters."""
    if width < 2 or depth < 1:
        raise ValueError("need width >= 2 and depth >= 1")
    from functime_spark.pipeline.dedup import _hash64

    df = df.where(F.col(col).isNotNull())
    c = F.col(col)
    buckets = F.posexplode(
        F.array(
            *[
                F.pmod(_hash64(c, seed=d, hash_fn=hash_fn), F.lit(width))
                for d in range(depth)
            ]
        )
    )
    return (
        df.select(buckets.alias("d", "bucket"))
        .groupBy("d", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    probe: DataFrame,
    col: str,
    width: int = 1024,
    depth: int = 4,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Point-frequency estimates from a `cms_sketch`: for each probe
    value, min over the depth rows of its bucket counters (missing
    bucket -> 0). The SKETCH side broadcasts (<= depth*width rows by
    construction), so estimating any number of probes is a map-side
    join — the 100 TB shape: sketch once, probe forever. Hash
    parameters MUST match the sketch's. NULL probes are dropped (the
    sketch never counts nulls — see cms_sketch)."""
    from functime_spark.pipeline.dedup import _hash64

    probe = probe.where(F.col(col).isNotNull())
    c = F.col(col)
    exploded = probe.select(
        c.alias("__v"),
        F.posexplode(
            F.array(
                *[
                    F.pmod(_hash64(c, seed=d, hash_fn=hash_fn), F.lit(width))
                    for d in range(depth)
                ]
            )
        ).alias("d", "bucket"),
    )
    joined = exploded.join(F.broadcast(sketch), ["d", "bucket"], "left")
    return (
        joined.groupBy("__v")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est"))
        .select(F.col("__v").alias(col), "est")
    )
