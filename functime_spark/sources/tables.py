"""Table loaders over the driver-generated TPC-H-ish testdata.

All reads go through `spark.read.parquet` so predicate pushdown, column
pruning, and partition discovery stay with the DataSource V2 scan. At
100 TB the same call reads a hive-partitioned directory tree; nothing
here assumes single files.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(spark: SparkSession, sf_dir: str) -> dict:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def read_panel(
    spark: SparkSession,
    path: str,
    entity: str,
    time: str,
    values: list,
    format: str = "parquet",
    schema=None,
    **options,
) -> DataFrame:
    """Read a table and project into panel column order (entity, time,
    values).

    ``format``: parquet (default — columnar, pushdown/pruning at the
    scan), csv, or json. CSV/JSON accept an explicit ``schema`` (DDL
    string or StructType); without one, CSV infers with header=true
    (inference is an extra pass — pass a schema at scale) and the time
    column is cast to timestamp if it arrives as string. The
    projection narrows every format's scan; only parquet also skips
    row groups via pushed filters.
    """
    if format == "parquet":
        df = spark.read.options(**options).parquet(path)
    elif format == "csv":
        reader = spark.read.options(header="true", **options)
        df = reader.csv(path, schema=schema) if schema else reader.option(
            "inferSchema", "true"
        ).csv(path)
    elif format == "json":
        reader = spark.read.options(**options)
        df = reader.json(path, schema=schema) if schema else reader.json(path)
    elif format == "orc":
        df = spark.read.options(**options).orc(path)
    else:
        raise ValueError(f"unsupported panel source format: {format!r}")
    out = df.select(entity, time, *values)
    if dict(out.dtypes)[time] == "string":
        out = out.withColumn(time, F.col(time).cast("timestamp"))
    return out


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events with ts normalized to a microsecond timestamp.

    The parquet stores TIMESTAMP(NANOS); with
    `spark.sql.legacy.parquet.nanosAsLong` the scan yields epoch-nanos
    longs, converted here (floor-truncated to micros, matching how
    DuckDB narrows ns → its us-precision TIMESTAMP).
    """
    df = load_table(spark, sf_dir, "events")
    dtype = dict(df.dtypes)["ts"]
    if dtype == "bigint":
        # integer division — float division of int64 nanos loses
        # precision (double has 53 mantissa bits) and shifts ts by ~1us.
        # cast to NTZ (session tz is UTC) so every Spark version yields
        # the same canonical panel time dtype.
        df = df.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz")
        )
    elif dtype == "timestamp":
        # defensive: some reader configs yield LTZ; canonicalize to NTZ
        df = df.withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    return df


def events_panel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events as a panel: entity=user_id, time=ts, y=value."""
    return load_events(spark, sf_dir).select("user_id", "ts", "value")


def lineitem_panel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem as a panel: entity=l_suppkey, time=l_shipdate, y=l_extendedprice."""
    return read_panel(
        spark,
        os.path.join(sf_dir, "lineitem.parquet"),
        "l_suppkey",
        "l_shipdate",
        ["l_extendedprice"],
    )


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list | None = None,
    mode: str = "overwrite",
    format: str = "parquet",
    max_records_per_file: int | None = None,
) -> None:
    """Columnar sink; hive-style partition dirs when partition_cols
    given. ``format``: parquet (default) or orc — both give predicate
    pushdown and partition pruning on the read side.

    ``max_records_per_file`` splits oversized task outputs (Spark's
    maxRecordsPerFile): the guard against the other half of the
    small/giant-files problem when a skewed partition column funnels a
    big slice of a 100 TB corpus through one task. Pre-shuffling onto
    the partition columns (repartition before calling this) controls
    the small-files side — one task per hive dir instead of
    tasks x dirs fragments."""
    writer = df.write.mode(mode)
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.format(format).save(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list,
    n_buckets: int,
    path: str | None = None,
    mode: str = "overwrite",
    format: str = "parquet",
    sort: bool = True,
) -> None:
    """Bucketed managed/external table sink: pre-hash-partitions the
    data into ``n_buckets`` files per partition keyed on
    ``bucket_cols``, recorded in the catalog. Joins and aggregations
    between two tables bucketed on the same keys with the same bucket
    count then run SHUFFLE-FREE — at 100 TB this converts every
    repeated fact-to-fact join on the bucket key (the most expensive
    recurring exchange in a curation pipeline) into a zero-exchange
    sort-merge, paid once at write time.

    ``sort=True`` additionally sorts each bucket file on the bucket
    columns, so the downstream sort-merge join skips its sort as well
    (plan pins in tests/test_scaletools.py assert both).

    Requires a catalog (`saveAsTable`) — bucketing metadata can't live
    in bare parquet paths; pass ``path`` for an external table."""
    writer = df.write.mode(mode).format(format).bucketBy(n_buckets, *bucket_cols)
    if sort:
        writer = writer.sortBy(*bucket_cols)
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def parse_json_col(
    df: DataFrame,
    col: str,
    schema: str,
    drop_raw: bool = False,
) -> DataFrame:
    """Parse a JSON-string column into typed top-level columns via
    `from_json` with an explicit DDL schema ("k int, tag string").
    Event/crawl payload columns routinely ride as JSON strings; this
    keeps the parse JVM-side (Jackson inside whole-stage codegen — no
    Python, no extra pass) and, because the schema is explicit, lets
    Catalyst prune unreferenced fields instead of schema-inferring
    with an extra scan over 100 TB. Malformed rows parse to NULL
    fields (PERMISSIVE), never fail the job.

    A JSON field sharing a name with an existing column would emit a
    duplicate column (every later access by name becomes
    AMBIGUOUS_REFERENCE, and drop_raw would drop both) — refused
    up-front with a clear error instead."""
    from pyspark.sql.types import _parse_datatype_string

    field_names = [f.name for f in _parse_datatype_string(schema).fields]
    # match Spark's resolution: columns resolve case-INsensitively
    # unless spark.sql.caseSensitive is on, so 'ID' vs 'id' is a clash
    # on a default session even though the strings differ
    case_sensitive = (
        df.sparkSession.conf.get("spark.sql.caseSensitive", "false").lower()
        == "true"
    )
    norm = (lambda s: s) if case_sensitive else (lambda s: s.lower())
    existing = {norm(c) for c in df.columns} - ({norm(col)} if drop_raw else set())
    clash = [n for n in field_names if norm(n) in existing]
    if clash:
        raise ValueError(
            f"JSON fields {clash} collide with existing columns; rename "
            "them in the DDL schema (from_json keeps positional order) "
            "or drop/rename the originals first"
        )
    parsed = df.withColumn("__j", F.from_json(F.col(col), schema))
    if drop_raw:
        # drop the raw string BEFORE splatting __j so a JSON field
        # that reuses the raw column's name survives (drop-by-name
        # after the splat would remove both)
        parsed = parsed.drop(col)
    return parsed.select("*", "__j.*").drop("__j")
