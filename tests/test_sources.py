"""Source/sink helpers."""

from pyspark.sql import functions as F


def test_write_partitioned_max_records_per_file(spark, tmp_path):
    """maxRecordsPerFile must split a single task's output into
    multiple files (the giant-file guard for skewed partitions)."""
    import glob

    from functime_spark.sources.tables import write_partitioned

    df = spark.range(1000).coalesce(1).withColumn("v", F.col("id") * 2)
    path = str(tmp_path / "sized")
    write_partitioned(df, path, max_records_per_file=100)
    files = glob.glob(path + "/*.parquet")
    assert len(files) >= 10
    assert spark.read.parquet(path).count() == 1000


def test_parse_json_col_typed_and_permissive(spark):
    """Explicit-schema JSON parse: typed fields, malformed/missing ->
    NULL (PERMISSIVE), never a job failure; drop_raw removes the
    string column."""
    from functime_spark.sources.tables import parse_json_col

    df = spark.createDataFrame(
        [
            (1, '{"k": 7, "tag": "a"}'),
            (2, '{"k": null}'),
            (3, "not json"),
            (4, None),
        ],
        "id long, props string",
    )
    out = parse_json_col(df, "props", "k int, tag string", drop_raw=True)
    assert out.columns == ["id", "k", "tag"]
    rows = {r.id: (r.k, r.tag) for r in out.collect()}
    assert rows[1] == (7, "a")
    assert rows[2] == (None, None)
    assert rows[3] == (None, None)
    assert rows[4] == (None, None)


def test_parse_json_col_collisions(spark):
    """A JSON field named like an existing column must be refused
    (silent duplicate columns make every later by-name access
    AMBIGUOUS_REFERENCE); reusing the RAW column's name is fine when
    drop_raw=True — the extracted field takes the slot."""
    import pytest

    from functime_spark.sources.tables import parse_json_col

    df = spark.createDataFrame(
        [(1, '{"id": 5, "props": "x"}')], "id long, props string"
    )
    with pytest.raises(ValueError, match="collide"):
        parse_json_col(df, "props", "id int")
    # field named like the raw column: allowed with drop_raw, refused without
    out = parse_json_col(df, "props", "props string", drop_raw=True)
    assert out.columns == ["id", "props"]
    assert out.collect()[0]["props"] == "x"
    with pytest.raises(ValueError, match="collide"):
        parse_json_col(df, "props", "props string", drop_raw=False)
    # Spark resolves names case-INsensitively by default: a JSON field
    # 'ID' against existing column 'id' is the same AMBIGUOUS_REFERENCE
    # hazard and must hit the guard too
    with pytest.raises(ValueError, match="collide"):
        parse_json_col(df, "props", "ID int")
