"""Physical-plan regression pins: shuffle counts, parquet pushdown,
codegen presence. A second shuffle sneaking into a panel operator is a
2x regression at 100 TB — fail here, not there."""

import pytest
from pyspark.sql import functions as F


def test_single_feature_is_one_shuffle(events):
    from functime_spark.functions.features import extract_features
    from functime_spark.plans import assert_max_exchanges, codegen_spans

    from functime_spark.plans import python_eval_nodes

    for feat in ["absolute_energy", "autocorrelation", "linear_trend"]:
        out = extract_features(events, [feat])
        assert_max_exchanges(out, 1)
        assert codegen_spans(out) >= 1
        assert python_eval_nodes(out) == []  # native tier stays JVM-side


def test_fused_native_features_single_shuffle(events):
    """The full 55-feature fusion is ONE shuffle: the up-front entity
    repartition satisfies every window spec (subkey windows included)
    and the final groupBy; distinct-aggregate features are expressed
    expand-free via first-occurrence windows."""
    from functime_spark.functions.features import extract_features
    from functime_spark.plans import assert_max_exchanges

    assert_max_exchanges(extract_features(events), 1)


def test_preprocessing_single_shuffle(events):
    from functime_spark.operators.preprocessing import diff, lag, roll, scale
    from functime_spark.plans import assert_max_exchanges

    for tf in [lag([1, 2, 3]), roll([4], ["mean", "std"]), scale(), diff(1)]:
        assert_max_exchanges(tf.transform(events), 1)


def test_parquet_pushdown_and_pruning(spark):
    # lineitem, not events: the session-scoped events fixture is
    # persisted, and Spark's cache manager would swap the parquet scan
    # for InMemoryTableScan (no PushedFilters to inspect)
    from functime_spark.plans import pushed_filters, read_schema_columns

    df = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    q = df.filter(F.col("l_suppkey") < 5).select("l_suppkey", "l_extendedprice")
    filters = pushed_filters(q)
    assert any("LessThan(l_suppkey" in f for fs in filters for f in fs)
    # column pruning: the 16-column lineitem file reads only what we use
    for cols in read_schema_columns(q):
        assert set(cols) <= {"l_suppkey", "l_extendedprice"}


def test_metrics_join_broadcasts_param_table(events):
    """Per-entity parameter joins must be broadcast, not shuffled."""
    from functime_spark.operators.preprocessing import scale
    from functime_spark.plans import count_exchanges, explain_str

    out = scale().transform(events)
    plan = explain_str(out, "simple")
    assert "BroadcastHashJoin" in plan or count_exchanges(out) <= 1
