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
