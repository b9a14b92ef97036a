"""Scale tooling: skew diagnosis/mitigation and bucketed co-location.

The salted join must be ROW-IDENTICAL to the plain join (that is the
whole point — same answer, different physical spread); the bucketed
write must make the downstream self-join exchange-free (the plan pin
is the feature)."""

import pytest
from pyspark.sql import functions as F

from functime_spark.pipeline.scaletools import (
    group_cardinality,
    heavy_hitters,
    key_counts,
    salted_join,
    skew_report,
)


def _skewed_frames(spark):
    # key "hot" carries 60 of 75 rows; one NULL key on each side
    left_rows = [("hot", i * 1.0) for i in range(60)]
    left_rows += [(f"k{i}", float(i)) for i in range(14)]
    left_rows += [(None, -1.0)]
    left = spark.createDataFrame(left_rows, "k string, v double")
    right_rows = [("hot", "H"), ("k1", "A"), ("k3", "B"), ("zzz", "Z"), (None, "N")]
    right = spark.createDataFrame(right_rows, "rk string, tag string")
    return left, right


def _sorted_rows(df):
    return sorted(
        (tuple(r) for r in df.collect()),
        key=lambda t: tuple((v is None, str(v)) for v in t),
    )


@pytest.mark.parametrize("how", ["inner", "left"])
def test_salted_join_row_identical_to_plain_join(spark, how):
    left, right = _skewed_frames(spark)
    plain = left.join(right, on=left["k"] == right["rk"], how=how)
    salted = salted_join(left, right, "k", "rk", n_salts=4, how=how)
    assert salted.columns == plain.columns
    assert _sorted_rows(salted) == _sorted_rows(plain)


def test_salted_join_spreads_hot_key_over_salts(spark):
    # exercises the implementation's OWN salt expression — an inline
    # re-implementation would keep passing if the formula regressed to
    # hashing the key alone (the single-straggler bug)
    from functime_spark.pipeline.scaletools import _salt_expr

    left, right = _skewed_frames(spark)
    salted_l = left.withColumn("__salt", _salt_expr(left, 4))
    n_salts_used = (
        salted_l.filter(F.col("k") == "hot").select("__salt").distinct().count()
    )
    # 60 distinct hot rows over 4 salt values: all 4 salts in play
    assert n_salts_used == 4


def test_salted_join_handles_map_columns_and_name_clash(spark):
    # payload maps are unhashable by xxhash64 — the salt must skip
    # them; a pre-existing __salt column must survive untouched
    left = spark.createDataFrame(
        [("hot", 7, {"a": 1}), ("hot", 8, {"b": 2}), ("k1", 9, None)],
        "k string, __salt long, m map<string,int>",
    )
    right = spark.createDataFrame([("hot", "H"), ("k1", "A")], "rk string, tag string")
    plain = left.join(right, on=left["k"] == right["rk"], how="inner")
    salted = salted_join(left, right, "k", "rk", n_salts=4, how="inner")
    assert salted.columns == plain.columns  # __salt preserved
    assert sorted(
        (r["k"], r["__salt"], r["tag"]) for r in salted.collect()
    ) == sorted((r["k"], r["__salt"], r["tag"]) for r in plain.collect())


def test_salted_join_rejects_zero_salts(spark):
    left, right = _skewed_frames(spark)
    with pytest.raises(ValueError, match="n_salts"):
        salted_join(left, right, "k", "rk", n_salts=0)


def test_salted_join_replicates_right_once_per_salt(spark):
    left, right = _skewed_frames(spark)
    out = salted_join(left, right, "k", "rk", n_salts=8, how="inner")
    # inner result cardinality unchanged vs plain join
    plain_n = left.join(right, on=left["k"] == right["rk"], how="inner").count()
    assert out.count() == plain_n


@pytest.mark.parametrize("how", ["left_semi", "left_anti"])
def test_salted_join_semi_anti_identical(spark, how):
    left, right = _skewed_frames(spark)
    plain = left.join(right, on=left["k"] == right["rk"], how=how)
    salted = salted_join(left, right, "k", "rk", n_salts=4, how=how)
    assert _sorted_rows(salted) == _sorted_rows(plain)


@pytest.mark.parametrize("how", ["right", "full", "full_outer", "cross"])
def test_salted_join_rejects_right_sided(spark, how):
    # an unmatched right row exists once per salt copy — right/full
    # semantics are NOT salt-preserving, so they must be refused
    left, right = _skewed_frames(spark)
    with pytest.raises(ValueError, match="left-sided"):
        salted_join(left, right, "k", "rk", n_salts=4, how=how)


def test_skew_report_values(spark):
    left, _ = _skewed_frames(spark)
    row = skew_report(left, ["k"], percentiles=(0.5,)).collect()[0]
    # 16 keys: hot(60), k0..k13 (1 each), NULL (1)
    assert row.n_keys == 16
    assert row.total_rows == 75
    assert row.max_count == 60
    assert abs(row.mean_count - 75 / 16) < 1e-9
    assert row.p50_count == 1.0
    assert abs(row.skew_ratio - 60 / (75 / 16)) < 1e-9


def test_skew_report_percentile_names_float_safe(spark):
    # int(p*100) truncation gave p56 for 0.57 and duplicate p99 columns
    # for (0.99, 0.999); %g naming keeps each distinct and exact
    left, _ = _skewed_frames(spark)
    out = skew_report(left, ["k"], percentiles=(0.57, 0.99, 0.999))
    names = [c for c in out.columns if c.startswith("p") and c.endswith("_count")]
    assert names == ["p57_count", "p99_count", "p99_9_count"], names


def test_heavy_hitters_tie_break_by_key(spark):
    left, _ = _skewed_frames(spark)
    top = heavy_hitters(left.filter(F.col("k").isNotNull()), ["k"], top_k=3).collect()
    assert [(r.k, r.cnt) for r in top] == [("hot", 60), ("k0", 1), ("k1", 1)]


def test_key_counts_is_single_aggregate(spark):
    from functime_spark.plans.checks import count_exchanges

    left, _ = _skewed_frames(spark)
    assert count_exchanges(key_counts(left, ["k"])) <= 1


def test_group_cardinality_exact_vs_hll(spark):
    docs = spark.range(0, 2000).select(
        (F.col("id") % 4).cast("string").alias("grp"),
        (F.col("id") % 517).alias("u1"),
        (F.col("id") % 93).alias("u2"),
    )
    exact = {
        r.grp: r
        for r in group_cardinality(docs, "grp", ["u1", "u2"]).collect()
    }
    approx = {
        r.grp: r
        for r in group_cardinality(docs, "grp", ["u1", "u2"], approx=True).collect()
    }
    assert set(exact) == set(approx) == {"0", "1", "2", "3"}
    for g, e in exact.items():
        a = approx[g]
        assert a.n_rows == e.n_rows
        # HLL++ at rsd=0.02: allow 5x the nominal error bound
        assert abs(a.n_u1 - e.n_u1) <= max(3, 0.1 * e.n_u1)
        assert abs(a.n_u2 - e.n_u2) <= max(3, 0.1 * e.n_u2)


def test_bucketed_tables_join_without_exchange(spark, tmp_path):
    """The 100 TB payoff of write_bucketed: two tables bucketed on the
    same key/count sort-merge-join with ZERO Exchange and (sorted
    buckets) zero Sort above the scans."""
    from functime_spark.plans.checks import count_exchanges
    from functime_spark.sources.tables import write_bucketed

    df = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    for t in ("bt_a", "bt_b"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    write_bucketed(df, "bt_a", ["k"], 4, path=str(tmp_path / "bt_a"))
    write_bucketed(df, "bt_b", ["k"], 4, path=str(tmp_path / "bt_b"))
    try:
        a, b = spark.table("bt_a"), spark.table("bt_b")
        joined = a.join(b.withColumnRenamed("v", "v2"), on="k")
        assert count_exchanges(joined) == 0
        assert joined.count() == 1000
        # aggregation on the bucket key is exchange-free too
        assert count_exchanges(a.groupBy("k").agg(F.sum("v"))) == 0
    finally:
        for t in ("bt_a", "bt_b"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_cms_sketch_one_sided_and_exact_when_sparse(spark):
    """Count-Min sketch (r9): estimates are ALWAYS >= the true count
    (one-sided error, every probe); with width far above the
    cardinality estimates are exactly the true counts (no collisions
    to inflate them); the sketch table is bounded by depth*width rows
    regardless of key cardinality; bad params raise."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from functime_spark.pipeline.scaletools import cms_estimate, cms_sketch

    rows = [(f"k{i % 37}",) for i in range(2000)] + [("hot",)] * 500
    df = spark.createDataFrame(rows, "v string")
    truth = {
        r["v"]: r["c"]
        for r in df.groupBy("v").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    probe = df.select("v").distinct()

    # narrow sketch: collisions likely -> one-sided overestimates only
    sk = cms_sketch(df, "v", width=16, depth=3)
    assert sk.count() <= 3 * 16
    est = {r["v"]: r["est"] for r in
           cms_estimate(sk, probe, "v", width=16, depth=3).collect()}
    assert est.keys() == truth.keys()
    assert all(est[k] >= truth[k] for k in truth)

    # wide sketch: 38 keys over 4x4096 buckets -> exact with these
    # seeds (deterministic hashing; verified, not probabilistic)
    skw = cms_sketch(df, "v", width=4096, depth=4)
    estw = {r["v"]: r["est"] for r in
            cms_estimate(skw, probe, "v", width=4096, depth=4).collect()}
    assert estw == truth

    # unseen probe -> 0 (empty buckets coalesce)
    zero = cms_estimate(
        skw, spark.createDataFrame([("never",)], "v string"), "v",
        width=4096, depth=4,
    ).first()
    assert zero["est"] == 0

    with _pytest.raises(ValueError, match="width"):
        cms_sketch(df, "v", width=1)


def test_cms_sketch_drops_nulls(spark):
    """NULLs in the sketched column are filtered before hashing
    (ADVICE r9: a NULL hashes to a NULL bucket — unreachable counter
    rows); NULL probes are dropped too. The non-null counts are
    unaffected."""
    from pyspark.sql import functions as F

    from functime_spark.pipeline.scaletools import cms_estimate, cms_sketch

    df = spark.createDataFrame(
        [("a",)] * 3 + [(None,)] * 5 + [("b",)], "v string"
    )
    sk = cms_sketch(df, "v", width=64, depth=3)
    # no NULL-bucket rows, and total mass = depth * non-null rows
    assert sk.where(F.col("bucket").isNull()).count() == 0
    assert sk.agg(F.sum("cnt")).first()[0] == 3 * 4
    probe = spark.createDataFrame([("a",), ("b",), (None,)], "v string")
    est = {r["v"]: r["est"] for r in
           cms_estimate(sk, probe, "v", width=64, depth=3).collect()}
    assert est == {"a": 3, "b": 1}
