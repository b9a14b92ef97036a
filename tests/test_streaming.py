"""Structured Streaming operators: batch/stream symmetry and real
streaming execution through a file source + memory sink."""

import shutil

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def stream_dir(spark, tmp_path):
    """Small panel parquet dir to stream from."""
    rows = [
        (e, f"2024-01-01 {h:02d}:{m:02d}:00", float(10 * e + h))
        for e in range(3)
        for h in range(6)
        for m in (0, 30)
    ]
    df = spark.createDataFrame(
        rows, "entity int, ts string, y double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    path = str(tmp_path / "panel")
    df.repartition(2).write.parquet(path)
    yield path, df
    shutil.rmtree(path, ignore_errors=True)


def _run_stream(spark, stream_df, name):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append" if stream_df.isStreaming else "append")
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return spark.table(name)


def test_stream_resample_matches_batch(spark, stream_dir):
    from functime_spark.streaming import stream_resample

    path, batch_df = stream_dir
    batch = stream_resample(batch_df, "1h", "sum").toPandas()

    src = spark.readStream.schema(batch_df.schema).parquet(path)
    out = stream_resample(src, "1h", "sum", watermark="10 minutes")
    # complete mode: append would hold back the newest window until the
    # watermark passes it (correct streaming semantics, but this test
    # wants the full history to compare against batch)
    q = (
        out.writeStream.format("memory")
        .queryName("resample_t")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    streamed = spark.table("resample_t").toPandas()

    b = batch.sort_values(["entity", "ts"]).reset_index(drop=True)
    s = streamed.sort_values(["entity", "ts"]).reset_index(drop=True)
    assert len(b) == len(s) == 3 * 6
    assert (b["y"].to_numpy() == s["y"].to_numpy()).all()


def test_stream_rolling_stats_overlapping_windows(spark, stream_dir):
    from functime_spark.streaming import stream_rolling_stats

    _path, batch_df = stream_dir
    out = stream_rolling_stats(batch_df, "2h", "1h").toPandas()
    one = out[(out["entity"] == 0)].sort_values("window_start")
    # 2h windows sliding 1h over 6 hours of data -> 7 windows
    assert len(one) == 7
    mid = one.iloc[2]
    assert mid["n"] == 4  # two rows/hour x 2h window


def test_stream_cusum_detects_level_shift(spark, tmp_path):
    from functime_spark.streaming import stream_cusum

    rows = [("a", t, 0.0 + (t % 3) * 0.1 if t <= 60 else 30.0) for t in range(1, 81)]
    df = spark.createDataFrame(rows, "entity string, t long, y double")
    path = str(tmp_path / "cusum_src")
    df.write.parquet(path)

    src = spark.readStream.schema(df.schema).parquet(path)
    out = stream_cusum(src, threshold=5.0, warmup=30)
    q = (
        out.writeStream.format("memory")
        .queryName("cusum_t")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    cps = spark.table("cusum_t").toPandas()
    assert len(cps) >= 1
    assert (cps["direction"] == "up").any()
    assert cps["t"].min() > 60  # fires only after the level shift

    # batch twin (features_udf.cusum) agrees on the shift location
    from functime_spark.functions.features_udf import cusum

    batch_cp = cusum(df, threshold=5.0, warmup_period=30).toPandas()
    fired = batch_cp[batch_cp["event"] != 0]
    assert (fired["event"] == 1).any()
    assert fired["t"].min() > 60


def test_stream_exact_dedup_batch_and_stream(spark, tmp_path):
    """Same call dedups a batch frame and a real stream: duplicate
    (entity, ts) records collapse to the first arrival; state is
    bounded by the watermark."""
    import shutil

    from functime_spark.streaming import stream_exact_dedup

    rows = [
        (1, "2024-01-01 00:00:00", 1.0),
        (1, "2024-01-01 00:00:00", 1.0),  # exact duplicate record
        (1, "2024-01-01 01:00:00", 2.0),
        (2, "2024-01-01 00:00:00", 3.0),
        (2, "2024-01-01 00:00:00", 3.0),
        (2, "2024-01-01 00:00:00", 3.0),
    ]
    df = spark.createDataFrame(
        rows, "entity int, ts string, y double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    batch = stream_exact_dedup(df, ["entity", "ts"], "ts")
    assert batch.count() == 3

    path = str(tmp_path / "dedup_panel")
    df.repartition(2).write.parquet(path)
    try:
        sdf = spark.readStream.schema(df.schema).parquet(path)
        out = stream_exact_dedup(sdf, ["entity", "ts"], "ts")
        got = _run_stream(spark, out, "dedup_sink")
        assert got.count() == 3
        assert sorted(
            (r["entity"], r["y"]) for r in got.collect()
        ) == [(1, 1.0), (1, 2.0), (2, 3.0)]
    finally:
        shutil.rmtree(path, ignore_errors=True)


def test_stream_pii_scan_matches_batch(spark, tmp_path):
    """The corpus-scrub projections (pii_scan here, quality/url_stats
    by the same stateless-projection argument) run unchanged on a
    Structured Stream: file source -> memory sink equals the batch
    result row-for-row."""
    import shutil

    from functime_spark.pipeline.text import pii_scan

    rows = [
        (1, "mail a@b.io now"),
        (2, "call 555-123-4567 twice 555-123-4567"),
        (3, "clean"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    batch = {
        r["doc_id"]: (r["n_email"], r["n_phone"], r["has_pii"])
        for r in pii_scan(df).collect()
    }
    path = str(tmp_path / "docs_stream")
    df.repartition(2).write.parquet(path)
    try:
        sdf = spark.readStream.schema(df.schema).parquet(path)
        out = pii_scan(sdf)
        assert out.isStreaming
        got = {
            r["doc_id"]: (r["n_email"], r["n_phone"], r["has_pii"])
            for r in _run_stream(spark, out, "pii_sink").collect()
        }
        assert got == batch == {1: (1, 0, 1), 2: (0, 2, 1), 3: (0, 0, 0)}
    finally:
        shutil.rmtree(path, ignore_errors=True)


def test_sessionize_batch_and_stream(spark, tmp_path):
    """Session windows merge events < gap apart (and exactly-gap
    events — adjacent inclusive ranges join); the same call produces
    identical sessions on a batch frame and on a real stream."""
    import shutil

    from functime_spark.streaming import sessionize

    rows = [
        ("a", "2024-01-01 00:00:00", 1.0),
        ("a", "2024-01-01 00:10:00", 1.0),  # same session
        ("a", "2024-01-01 00:40:00", 1.0),  # exactly gap after -> merges
        ("a", "2024-01-01 02:00:00", 4.0),  # new session
        ("b", "2024-01-01 00:00:00", 2.0),
    ]
    df = spark.createDataFrame(
        rows, "entity string, ts string, y double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    expect = [("a", 3, 3.0), ("a", 1, 4.0), ("b", 1, 2.0)]

    batch = sessionize(df, gap="30m").orderBy("entity", "session_start")
    assert [
        (r["entity"], r["n_events"], r["y"]) for r in batch.collect()
    ] == expect

    path = str(tmp_path / "sess_panel")
    df.repartition(2).write.parquet(path)
    try:
        sdf = spark.readStream.schema(df.schema).parquet(path)
        out = sessionize(sdf, gap="30m")
        assert out.isStreaming
        # complete mode: append would hold sessions in the state store
        # until the watermark passes their end — with a finite fixture
        # no later event ever advances it past the final sessions
        q = (
            out.writeStream.format("memory")
            .queryName("sess_sink")
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.processAllAvailable()
        q.stop()
        got = (
            spark.table("sess_sink").orderBy("entity", "session_start").collect()
        )
        assert [(r["entity"], r["n_events"], r["y"]) for r in got] == expect
    finally:
        shutil.rmtree(path, ignore_errors=True)


def test_stream_lm_score_matches_batch(spark, tmp_path):
    """Scoring a document stream against a batch-fitted LM (broadcast
    count tables, stateless Arrow pass) must reproduce the batch join
    formulation's values."""
    import shutil

    from functime_spark.pipeline.lm import fit_ngram_lm, ngram_lm_score
    from functime_spark.streaming.ops import stream_lm_score

    docs = spark.createDataFrame(
        [(i, f"a b w{i % 5} a c w{i % 3} b") for i in range(40)],
        "doc_id long, text string",
    )
    path = str(tmp_path / "docs")
    docs.repartition(2).write.parquet(path)
    try:
        lm = fit_ngram_lm(docs)
        batch = {
            r["doc_id"]: r for r in ngram_lm_score(docs, lm=lm).collect()
        }
        sdf = spark.readStream.schema(docs.schema).parquet(path)
        out = _run_stream(spark, stream_lm_score(sdf, lm), "lm_scores")
        rows = out.collect()
        assert len(rows) == 40
        for r in rows:
            b = batch[r["doc_id"]]
            assert r["n_tokens"] == b["n_tokens"]
            assert r["cross_entropy"] == pytest.approx(
                b["cross_entropy"], abs=1e-9
            )
            assert r["perplexity"] == pytest.approx(b["perplexity"], rel=1e-9)
        # driver-state guard: the model dicts are bounded by the
        # (min_count-pruned) count tables; past max_model_rows the
        # collect must refuse with a pointer at min_count, not OOM
        with pytest.raises(ValueError, match="min_count"):
            stream_lm_score(sdf, lm, max_model_rows=3)
    finally:
        shutil.rmtree(path, ignore_errors=True)


def test_watermarked_refuses_ntz_on_non_utc_session(spark, tmp_path):
    """The NTZ->TIMESTAMP cast inside _watermarked is value-faithful
    only under a UTC session timezone; on any other zone it must fail
    loudly instead of silently shifting event times and window
    boundaries (these ops are public API beyond session.py)."""
    import pytest

    from functime_spark.streaming.ops import stream_resample

    df = spark.createDataFrame(
        [("a", 1, 2.0)], "user_id string, ts long, value double"
    ).select(
        "user_id",
        F.timestamp_seconds(F.col("ts")).cast("timestamp_ntz").alias("ts"),
        "value",
    )
    prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        with pytest.raises(ValueError, match="timezone"):
            stream_resample(df, "1h")
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
    assert stream_resample(df, "1h").count() == 1  # UTC restored: fine


def test_watermarked_ops_accept_timestamp_ntz(spark, tmp_path):
    """The NANOS-ingested events panel carries TIMESTAMP_NTZ, which
    Spark watermarks reject (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE) —
    the watermark helper must cast through TIMESTAMP (UTC session, so
    value-faithful) and emit time columns back as NTZ so batch and
    stream twins stay dtype- and row-identical."""
    import shutil

    from functime_spark.streaming.ops import sessionize, stream_resample

    rows = [("a", f"2024-01-0{d} 0{h}:{m:02d}:00", 1.0)
            for d in (1, 2, 3) for h in range(4) for m in (0, 20)]
    df = spark.createDataFrame(rows, "entity string, ts string, y double")
    df = df.withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    assert dict(df.dtypes)["ts"] == "timestamp_ntz"
    path = str(tmp_path / "ntz_panel")
    df.write.parquet(path)
    try:
        batch_rs = stream_resample(df, "1h", "sum", watermark="1 hour")
        assert dict(batch_rs.dtypes)["ts"] == "timestamp_ntz"
        sdf = spark.readStream.schema(df.schema).parquet(path)
        out = _run_stream(
            spark, stream_resample(sdf, "1h", "sum", watermark="1 hour"), "ntz_rs"
        )
        assert dict(out.dtypes)["ts"] == "timestamp_ntz"
        got = sorted(map(tuple, out.collect()))
        want = sorted(map(tuple, batch_rs.collect()))
        # append mode holds back windows the watermark hasn't closed:
        # the stream must emit a PREFIX of the batch result (values
        # identical where emitted) and only the tail may be pending
        assert got, "watermarked NTZ stream emitted nothing"
        assert set(got) <= set(want)
        assert len(got) >= len(want) - 2
        out2 = _run_stream(
            spark, sessionize(sdf, gap="30m", watermark="1 hour"), "ntz_sess"
        )
        assert dict(out2.dtypes)["session_start"] == "timestamp_ntz"
        got2 = set(map(tuple, out2.collect()))
        want2 = set(map(tuple, sessionize(df, gap="30m").collect()))
        assert got2 and got2 <= want2 and len(got2) >= len(want2) - 2
    finally:
        shutil.rmtree(path, ignore_errors=True)


def test_stream_dsir_score_matches_batch(spark, tmp_path):
    """dsir_score is a pure projection (model = plan constant), so the
    SAME function must run unchanged on a streaming frame and match
    the batch values row-for-row."""
    import shutil

    from functime_spark.pipeline.sampling import dsir_score, fit_dsir

    docs = spark.createDataFrame(
        [(i, f"tok{i % 7} tok{i % 3} common word here") for i in range(30)],
        "doc_id long, text string",
    )
    target = docs.filter(F.col("doc_id") % 3 == 0)
    path = str(tmp_path / "dsir_docs")
    docs.repartition(2).write.parquet(path)
    try:
        model = fit_dsir(docs, target, n_buckets=128)
        batch = {r["doc_id"]: r for r in dsir_score(docs, model).collect()}
        sdf = spark.readStream.schema(docs.schema).parquet(path)
        out = _run_stream(spark, dsir_score(sdf, model), "dsir_scores")
        rows = out.collect()
        assert len(rows) == 30
        for r in rows:
            b = batch[r["doc_id"]]
            assert r["n_feats"] == b["n_feats"]
            assert r["log_weight"] == pytest.approx(b["log_weight"], abs=1e-12)
    finally:
        shutil.rmtree(path, ignore_errors=True)


def test_stream_decontaminate_matches_batch(spark, tmp_path):
    import shutil

    from functime_spark.pipeline.decontaminate import benchmark_ngrams, ngram_overlap
    from functime_spark.streaming.ops import stream_decontaminate

    docs = spark.createDataFrame(
        [(i, " ".join(f"w{(i * 3 + j) % 40}" for j in range(12))) for i in range(30)],
        "doc_id long, text string",
    )
    bench = docs.filter(F.col("doc_id") % 5 == 0)
    path = str(tmp_path / "docs2")
    docs.repartition(2).write.parquet(path)
    try:
        batch = {
            r["doc_id"]: r
            for r in ngram_overlap(docs, bench, n=4, hash_fn="none").collect()
        }
        sdf = spark.readStream.schema(docs.schema).parquet(path)
        bg = benchmark_ngrams(bench, n=4)
        out = _run_stream(spark, stream_decontaminate(sdf, bg, n=4), "decon")
        rows = out.collect()
        assert len(rows) == 30
        for r in rows:
            b = batch[r["doc_id"]]
            assert (
                r["n_grams"],
                r["n_contaminated"],
                r["is_contaminated"],
            ) == (b["n_grams"], b["n_contaminated"], b["is_contaminated"])
            assert r["contamination"] == pytest.approx(b["contamination"])
    finally:
        shutil.rmtree(path, ignore_errors=True)


def test_stream_anomaly_matches_batch(spark, tmp_path):
    """Streaming z-score equals the batch detect_anomalies row-for-row
    when the stream delivers in time order (single source batch)."""
    import math

    from functime_spark.operators.evaluation import detect_anomalies
    from functime_spark.streaming.ops import stream_anomaly

    rows = []
    for ent in ("a", "b"):
        for i in range(40):
            v = 5.0 + math.sin(i / 2.0)
            if ent == "a" and i == 33:
                v = 40.0
            rows.append((ent, i, v))
    df = spark.createDataFrame(rows, "entity string, t long, y double")
    path = str(tmp_path / "anom_src")
    df.coalesce(1).write.parquet(path)

    src = spark.readStream.schema(df.schema).parquet(path)
    out = stream_anomaly(src, window=10, threshold=3.0)
    q = (
        out.writeStream.format("memory")
        .queryName("anom_t")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = (
        spark.table("anom_t")
        .toPandas()
        .sort_values(["entity", "t"])
        .reset_index(drop=True)
    )
    want = (
        detect_anomalies(df, window=10, threshold=3.0)
        .toPandas()
        .sort_values(["entity", "t"])
        .reset_index(drop=True)
    )
    assert len(got) == len(want) == 80
    assert (got["is_anomaly"] == want["is_anomaly"]).all()
    import numpy as _np

    a = got["zscore"].to_numpy(dtype=float)
    b = want["zscore"].to_numpy(dtype=float)
    mask = ~_np.isnan(a)
    assert (_np.isnan(a) == _np.isnan(b)).all()
    assert _np.allclose(a[mask], b[mask], atol=1e-9)
    flagged = got[got["is_anomaly"]]
    assert list(flagged["entity"]) == ["a"] and list(flagged["t"]) == [33]


def test_stream_minhash_dedup_matches_batch(spark, tmp_path):
    """The streaming near-dup pass must surface exactly the batch
    minhash_dedup pair set when arrival order == id order (the state
    keeps earlier arrivals, so id_a < id_b like the batch candidates)."""
    from functime_spark.pipeline.dedup import minhash_dedup
    from functime_spark.streaming import stream_minhash_dedup

    base = "the quick brown fox jumps over the lazy dog again and again today"
    rows = []
    for i in range(30):
        if i % 3 == 0:
            rows.append((i, base))  # exact/near dup cluster
        elif i % 3 == 1:
            rows.append((i, base.replace("dog", f"cat{i}")))
        else:
            rows.append((i, f"totally different text number {i} with unique words w{i} v{i}"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    batch_pairs = {
        (r.id_a, r.id_b)
        for r in minhash_dedup(docs, threshold=0.5).collect()
    }

    path = str(tmp_path / "mh_docs")
    docs.coalesce(1).write.parquet(path)
    src = spark.readStream.schema(docs.schema).parquet(path)
    out = stream_minhash_dedup(src, threshold=0.5)
    q = (
        out.writeStream.format("memory")
        .queryName("mh_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    stream_pairs = {
        (r.id_a, r.id_b) for r in spark.table("mh_stream").collect()
    }
    assert stream_pairs == batch_pairs
    assert len(batch_pairs) > 0


def test_stream_dhash_dedup_matches_batch(spark, tmp_path):
    """Streaming image near-dup (r9): the file-source run must surface
    exactly dhash_near_dups' pair set when arrival order == id order
    (earlier arrivals become id_a, like the batch a.id < b.id join);
    hamming values agree pairwise."""
    import numpy as np

    from functime_spark.pipeline.multimodal import dhash_near_dups
    from functime_spark.streaming import stream_dhash_dedup

    rng = np.random.default_rng(33)

    def ppm(arr):
        h, w = arr.shape
        return b"P5\n%d %d\n255\n" % (w, h) + arr.astype(np.uint8).tobytes()

    rows = []
    for i in range(10):
        base = rng.integers(0, 256, (16, 16)).astype(np.uint8)
        rows.append((i, "image", bytearray(ppm(base)), "{}"))
        if i < 3:  # planted near-dup with a higher id
            pert = (base.astype(np.int16) + rng.integers(-2, 3, (16, 16))).clip(
                0, 255
            ).astype(np.uint8)
            rows.append((100 + i, "image", bytearray(ppm(pert)), "{}"))
    media = spark.createDataFrame(
        rows, "media_id long, kind string, payload binary, meta string"
    )

    batch = {
        (r.id_a, r.id_b): r.hamming
        for r in dhash_near_dups(media, max_hamming=8).collect()
    }
    assert set(batch) >= {(i, 100 + i) for i in range(3)}

    path = str(tmp_path / "dhash_media")
    media.coalesce(1).write.parquet(path)
    src = spark.readStream.schema(media.schema).parquet(path)
    q = (
        stream_dhash_dedup(src, max_hamming=8)
        .writeStream.format("memory")
        .queryName("dhash_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    stream = {
        (r.id_a, r.id_b): r.hamming
        for r in spark.table("dhash_stream")
        .dropDuplicates(["id_a", "id_b"])
        .collect()
    }
    assert stream == batch

    # batch fallback: deduped pair set == dhash_near_dups on the same
    # static frame (whole-bucket drops included)
    fb = {
        (r.id_a, r.id_b): r.hamming
        for r in stream_dhash_dedup(media, max_hamming=8)
        .dropDuplicates(["id_a", "id_b"])
        .collect()
    }
    assert fb == batch


def test_gopher_filter_runs_on_stream(spark, tmp_path):
    """gopher_quality_filter is a pure projection since the
    array_distinct rewrite — it must run UNCHANGED on a streaming
    source and emit the same rows as batch."""
    from functime_spark.pipeline.text import gopher_quality_filter

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    batch = {
        (r.doc_id, r.passes)
        for r in gopher_quality_filter(docs).select("doc_id", "passes").collect()
    }

    path = str(tmp_path / "gopher_docs")
    docs.coalesce(1).write.parquet(path)
    src = spark.readStream.schema(docs.schema).parquet(path)
    out = gopher_quality_filter(src)
    q = (
        out.writeStream.format("memory")
        .queryName("gopher_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    stream = {
        (r.doc_id, r.passes)
        for r in spark.table("gopher_stream").select("doc_id", "passes").collect()
    }
    assert stream == batch and len(batch) > 0


def test_stream_minhash_batch_drops_oversize_buckets(spark):
    """Batch-mode stream_minhash_dedup must match minhash_dedup's
    whole-bucket drop for buckets over max_bucket_size — 600 identical
    docs land in one bucket per band and produce ZERO pairs in both."""
    from functime_spark.pipeline.dedup import minhash_dedup
    from functime_spark.streaming import stream_minhash_dedup

    docs = spark.createDataFrame(
        [(i, "same exact text repeated everywhere forever") for i in range(600)],
        "doc_id long, text string",
    )
    assert minhash_dedup(docs, threshold=0.5).count() == 0
    assert stream_minhash_dedup(docs, threshold=0.5).count() == 0


def test_hashed_features_and_bpe_run_on_stream(spark, tmp_path):
    """hashed_features and bpe_tokenize(engine='expr') are pure
    row-local projections — they must run UNCHANGED on a streaming
    source and emit the same rows as batch."""
    from functime_spark.pipeline.bpe import bpe_tokenize, fit_bpe
    from functime_spark.pipeline.similarity import hashed_features

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    merges = fit_bpe(docs, n_merges=6)
    batch_hv = {
        (r.doc_id, tuple(r.hashed_vec))
        for r in hashed_features(docs, dim=16).collect()
    }
    batch_bpe = {
        (r.doc_id, r.n_words, r.n_bpe_tokens)
        for r in bpe_tokenize(docs, merges, engine="expr").collect()
    }

    path = str(tmp_path / "hv_docs")
    docs.coalesce(1).write.parquet(path)
    src = spark.readStream.schema(docs.schema).parquet(path)
    for name, out in (
        ("hv_stream", hashed_features(src, dim=16)),
        ("bpe_stream", bpe_tokenize(src, merges, engine="expr")),
    ):
        q = (
            out.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.processAllAvailable()
        q.stop()
    stream_hv = {
        (r.doc_id, tuple(r.hashed_vec))
        for r in spark.table("hv_stream").collect()
    }
    stream_bpe = {
        (r.doc_id, r.n_words, r.n_bpe_tokens)
        for r in spark.table("bpe_stream").collect()
    }
    assert stream_hv == batch_hv and len(batch_hv) > 0
    assert stream_bpe == batch_bpe


def test_stream_dsir_score_matches_batch(spark, tmp_path):
    """dsir_score is a zero-shuffle projection with the model as a
    plan constant, so the SAME function must run unchanged on a real
    file-source stream and reproduce the batch values — the stream
    legality its docstring claims, proven here."""
    import shutil

    from functime_spark.pipeline.sampling import dsir_score, fit_dsir

    target = spark.createDataFrame(
        [(i, "clean formal prose sentence number %d" % i) for i in range(20)],
        "doc_id long, text string",
    )
    raw = spark.createDataFrame(
        [(i, f"raw web junk w{i % 7} clean prose w{i % 3}") for i in range(40)],
        "doc_id long, text string",
    )
    path = str(tmp_path / "raw")
    raw.repartition(2).write.parquet(path)
    try:
        model = fit_dsir(raw, target)
        batch = {r["doc_id"]: r for r in dsir_score(raw, model).collect()}
        sdf = spark.readStream.schema(raw.schema).parquet(path)
        out = _run_stream(spark, dsir_score(sdf, model), "dsir_scores")
        rows = out.collect()
        assert len(rows) == 40
        for r in rows:
            b = batch[r["doc_id"]]
            assert r["n_feats"] == b["n_feats"]
            assert r["log_weight"] == pytest.approx(b["log_weight"], abs=1e-9)
    finally:
        shutil.rmtree(path, ignore_errors=True)


def test_stream_media_decode_pipeline(spark, tmp_path):
    """The multimodal tier is stream-legal: extract_features_media
    (real JPEG decode inside mapInPandas) and extract_audio_features
    both run over a file-source stream and match their batch twins
    row-for-row — the streaming ingest shape of a media training-data
    pipeline."""
    import io
    import wave

    import numpy as np

    from functime_spark.pipeline.audio import extract_audio_features
    from functime_spark.pipeline.jpeg import encode_jpeg
    from functime_spark.pipeline.multimodal import extract_features_media

    h, w = 24, 32
    yy, xx = np.mgrid[0:h, 0:w]
    imgs = [
        np.clip(
            np.stack([xx * 200 / w + 9 * i, yy * 200 / h,
                      np.full((h, w), 40 + 7 * i)], axis=-1),
            0, 255,
        ).astype(np.uint8)
        for i in range(3)
    ]
    rate = 8000
    t = np.arange(rate) / rate

    def wav_bytes(freq):
        sig = (0.4 * np.sin(2 * np.pi * freq * t) * 32767).astype(np.int16)
        bio = io.BytesIO()
        with wave.open(bio, "wb") as wf:
            wf.setnchannels(1)
            wf.setsampwidth(2)
            wf.setframerate(rate)
            wf.writeframes(sig.tobytes())
        return bio.getvalue()

    media = spark.createDataFrame(
        [(i, "image", bytearray(encode_jpeg(img, quality=90)), "{}")
         for i, img in enumerate(imgs)]
        + [(10 + i, "audio", bytearray(wav_bytes(f)), "{}")
           for i, f in enumerate((500, 1500))],
        "media_id long, kind string, payload binary, meta string",
    )
    path = str(tmp_path / "media_src")
    media.write.parquet(path)
    src = spark.readStream.schema(media.schema).parquet(path)

    def drain(stream_df, name):
        q = (
            stream_df.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.processAllAvailable()
        q.stop()
        return spark.table(name)

    img_src = src.filter("kind = 'image'")
    streamed = drain(
        extract_features_media(img_src, dim=5, decoder="jpeg"), "media_feat_t"
    ).toPandas().sort_values("media_id").reset_index(drop=True)
    batch = (
        extract_features_media(media.filter("kind = 'image'"), dim=5,
                               decoder="jpeg")
        .toPandas().sort_values("media_id").reset_index(drop=True)
    )
    assert len(streamed) == 3
    for a, b in zip(streamed["feature"], batch["feature"]):
        np.testing.assert_allclose(list(a), list(b), rtol=0, atol=0)

    aud = drain(
        extract_audio_features(src.filter("kind = 'audio'"), decoder="wav"),
        "media_audio_t",
    ).toPandas().sort_values("media_id").reset_index(drop=True)
    assert len(aud) == 2
    assert abs(aud.loc[0, "spectral_centroid_hz"] - 500.0) < 5.0
    assert abs(aud.loc[1, "spectral_centroid_hz"] - 1500.0) < 5.0


def test_stream_media_decode_e2e(spark, tmp_path):
    """The media seam is streaming-compatible as-is (r8): a stateless
    mapInPandas decode runs unchanged on a readStream source — real
    Netpbm payloads decode mid-stream and the streamed features equal
    the batch run exactly."""
    import numpy as np

    from functime_spark.pipeline.multimodal import extract_features_media

    rng = np.random.default_rng(2)
    rows = []
    for i in range(12):
        px = rng.integers(0, 256, 16, dtype=np.uint8)
        rows.append((i, "image", bytearray(b"P5\n4 4\n255\n" + px.tobytes()), "{}"))
    df = spark.createDataFrame(
        rows, "media_id long, kind string, payload binary, meta string"
    )
    path = str(tmp_path / "media_stream")
    df.write.parquet(path)
    batch = {
        r["media_id"]: r["feature"]
        for r in extract_features_media(df, dim=4, decoder="ppm").collect()
    }

    sdf = spark.readStream.schema(df.schema).parquet(path)
    out = extract_features_media(sdf, dim=4, decoder="ppm")
    assert out.isStreaming
    q = (
        out.writeStream.format("memory")
        .queryName("media_stream_t")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    streamed = {
        r["media_id"]: r["feature"]
        for r in spark.table("media_stream_t").collect()
    }
    assert streamed.keys() == batch.keys()
    for k in batch:
        assert streamed[k] == batch[k]


def test_stream_minhash_overflow_markers(spark, tmp_path):
    """A streaming arrival landing in an already-full bucket must emit
    the overflow marker row (id_a == id_b, est_jaccard = -1.0) instead
    of vanishing (ADVICE r9): 5 identical docs with max_bucket_size=2
    admit ids 0/1 per band and mark 2/3/4; filtering est_jaccard >= 0
    leaves exactly the (0, 1) pair."""
    from functime_spark.streaming import stream_minhash_dedup

    docs = spark.createDataFrame(
        [(i, "same exact text repeated everywhere forever") for i in range(5)],
        "doc_id long, text string",
    )
    path = str(tmp_path / "mh_overflow")
    docs.coalesce(1).write.parquet(path)
    src = spark.readStream.schema(docs.schema).parquet(path)
    q = (
        stream_minhash_dedup(src, threshold=0.5, max_bucket_size=2)
        .writeStream.format("memory")
        .queryName("mh_overflow")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    out = spark.table("mh_overflow").collect()
    markers = {r.id_a for r in out if r.est_jaccard < 0}
    assert markers == {2, 3, 4}
    assert all(r.id_a == r.id_b for r in out if r.est_jaccard < 0)
    pairs = {(r.id_a, r.id_b) for r in out if r.est_jaccard >= 0}
    assert pairs == {(0, 1)}


def test_stream_dhash_overflow_markers(spark, tmp_path):
    """stream_dhash_dedup's overflow marker (hamming = -1) fires for
    arrivals a saturated band bucket can no longer compare or admit."""
    import numpy as np

    from functime_spark.streaming import stream_dhash_dedup

    arr = (np.arange(256).reshape(16, 16) % 256).astype(np.uint8)
    payload = b"P5\n16 16\n255\n" + arr.tobytes()
    media = spark.createDataFrame(
        [(i, "image", bytearray(payload), "{}") for i in range(5)],
        "media_id long, kind string, payload binary, meta string",
    )
    path = str(tmp_path / "dh_overflow")
    media.coalesce(1).write.parquet(path)
    src = spark.readStream.schema(media.schema).parquet(path)
    q = (
        stream_dhash_dedup(src, max_bucket_size=2)
        .writeStream.format("memory")
        .queryName("dh_overflow")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    out = spark.table("dh_overflow").collect()
    assert {r.id_a for r in out if r.hamming < 0} == {2, 3, 4}
    assert {(r.id_a, r.id_b) for r in out if r.hamming >= 0} == {(0, 1)}


def test_exif_ops_run_on_stream(spark, tmp_path):
    """extract_exif and normalize_orientation are stateless mapInPandas
    projections — they must run UNCHANGED on a streaming source and
    emit the same rows as batch (the gopher_filter contract for the
    r10 EXIF tier)."""
    import numpy as np

    from functime_spark.pipeline.jpeg import encode_jpeg
    from functime_spark.pipeline.multimodal import (
        extract_exif,
        insert_exif,
        normalize_orientation,
    )

    arr = (np.arange(64).reshape(8, 8) * 3 % 256).astype(np.uint8)
    base = encode_jpeg(arr)
    rows = [
        (1, "image", bytearray(insert_exif(base, make="A", orientation=6)),
         "{}"),
        (2, "image", bytearray(base), "{}"),
    ]
    media = spark.createDataFrame(
        rows, "media_id long, kind string, payload binary, meta string"
    )
    batch_exif = {
        (r["media_id"], r["exif_make"], r["exif_orientation"])
        for r in extract_exif(media).collect()
    }
    batch_norm = {
        (r["media_id"], r["width"], r["height"], r["orientation"],
         bytes(r["payload"]))
        for r in normalize_orientation(media, decoder="jpeg").collect()
    }

    path = str(tmp_path / "exif_media")
    media.coalesce(1).write.parquet(path)
    src = spark.readStream.schema(media.schema).parquet(path)
    for name, out in (
        ("exif_stream", extract_exif(src)),
        ("norm_stream", normalize_orientation(src, decoder="jpeg")),
    ):
        assert out.isStreaming
        q = (
            out.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.processAllAvailable()
        q.stop()
    stream_exif = {
        (r["media_id"], r["exif_make"], r["exif_orientation"])
        for r in spark.table("exif_stream").collect()
    }
    stream_norm = {
        (r["media_id"], r["width"], r["height"], r["orientation"],
         bytes(r["payload"]))
        for r in spark.table("norm_stream").collect()
    }
    assert stream_exif == batch_exif
    assert stream_norm == batch_norm


def test_stream_audio_dedup_matches_batch(spark, tmp_path):
    """Streaming audio near-dup (r11): the file-source run's
    aggregated match counts must equal audio_near_dups' n_matches
    when arrival order == id order (earlier arrivals become id_a,
    like the batch a.id < b.id join); the batch fallback agrees; a
    full bucket emits overflow markers instead of dropping silently."""
    import io
    import wave

    import numpy as np

    from functime_spark.pipeline.audio import audio_near_dups
    from functime_spark.streaming import stream_audio_dedup

    def wav(g):
        u = (np.arange(1000) * (104729 + 2741 * g)) % 65536
        v = np.where(u < 32768, u, u - 65536).astype("<i2")
        bio = io.BytesIO()
        with wave.open(bio, "wb") as wf:
            wf.setnchannels(1)
            wf.setsampwidth(2)
            wf.setframerate(8000)
            wf.writeframes(v.tobytes())
        return bio.getvalue()

    rows = [
        (i, "audio", bytearray(wav(g)), "{}")
        for i, g in [(1, 1), (2, 1), (3, 2), (4, 2), (5, 3)]
    ]
    media = spark.createDataFrame(
        rows, "media_id long, kind string, payload binary, meta string"
    )
    batch = {
        (r.id_a, r.id_b): r.n_matches
        for r in audio_near_dups(media, decoder="wav").collect()
    }
    assert set(batch) == {(1, 2), (3, 4)}

    path = str(tmp_path / "audio_media")
    media.coalesce(1).write.parquet(path)
    src = spark.readStream.schema(media.schema).parquet(path)
    q = (
        stream_audio_dedup(src, decoder="wav")
        .writeStream.format("memory")
        .queryName("audio_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    events = spark.table("audio_stream")
    assert events.filter("fp < 0").count() == 0  # no overflow here
    stream = {
        (r.id_a, r.id_b): r.cnt
        for r in events.groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter("cnt >= 5")
        .collect()
    }
    assert stream == batch

    # batch fallback agrees with the batch operator too
    fb = {
        (r.id_a, r.id_b): r.cnt
        for r in stream_audio_dedup(media, decoder="wav")
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter("cnt >= 5")
        .collect()
    }
    assert fb == batch

    # cap=1: every bucket holds one id; later arrivals emit markers
    marked = stream_audio_dedup(media, decoder="wav", max_bucket_size=1)
    # batch fallback DROPS oversized buckets whole (oracle parity),
    # so run the capped check through the streaming path
    q2 = (
        stream_audio_dedup(src, decoder="wav", max_bucket_size=1)
        .writeStream.format("memory")
        .queryName("audio_stream_capped")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q2.processAllAvailable()
    q2.stop()
    capped = spark.table("audio_stream_capped")
    assert capped.filter("fp = -1 AND id_a = id_b").count() > 0
    assert capped.filter("fp >= 0 AND id_a != id_b").count() == 0
    assert marked is not None
