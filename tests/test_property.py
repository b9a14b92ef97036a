"""Property-based invariants (hypothesis): transformer round-trips and
feature semantics vs numpy on generated series — the reference's
randomized-parametrization strategy (SURVEY §5), upgraded to real
property testing."""

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_SERIES = st.lists(
    st.floats(
        min_value=-1e4, max_value=1e4, allow_nan=False, allow_infinity=False
    ),
    min_size=6,
    max_size=40,
)

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _panel(spark, values):
    rows = [("e", t + 1, float(v)) for t, v in enumerate(values)]
    return spark.createDataFrame(rows, "entity string, t long, y double")


@settings(**_SETTINGS)
@given(values=_SERIES, order=st.integers(min_value=1, max_value=2))
def test_diff_invert_roundtrip(spark, values, order):
    from functime_spark.operators.preprocessing import diff

    if len(values) <= order + 1:
        return
    df = _panel(spark, values)
    tf = diff(order=order)
    back = (
        tf.invert(tf.transform(df))
        .toPandas()
        .sort_values("t")["y"]
        .to_numpy()
    )
    np.testing.assert_allclose(back, np.asarray(values), rtol=1e-9, atol=1e-6)


@settings(**_SETTINGS)
@given(values=_SERIES)
def test_scale_invert_roundtrip(spark, values):
    from functime_spark.operators.preprocessing import scale

    if np.std(values) == 0:
        return
    df = _panel(spark, values)
    tf = scale()
    back = (
        tf.invert(tf.transform(df)).toPandas().sort_values("t")["y"].to_numpy()
    )
    np.testing.assert_allclose(back, np.asarray(values), rtol=1e-9, atol=1e-6)


@settings(**_SETTINGS)
@given(values=_SERIES)
def test_log1p_invert_roundtrip(spark, values):
    from functime_spark.operators.preprocessing import log1p

    vals = [abs(v) for v in values]
    df = _panel(spark, vals)
    tf = log1p()
    back = (
        tf.invert(tf.transform(df)).toPandas().sort_values("t")["y"].to_numpy()
    )
    np.testing.assert_allclose(back, np.asarray(vals), rtol=1e-9, atol=1e-6)


@settings(**_SETTINGS)
@given(values=_SERIES)
def test_feature_semantics_vs_numpy(spark, values):
    from functime_spark.functions.features import extract_features

    df = _panel(spark, values)
    out = extract_features(
        df, ["absolute_energy", "mean_abs_change", "root_mean_square"]
    ).first()
    x = np.asarray(values)
    np.testing.assert_allclose(
        out["absolute_energy"], (x * x).sum(), rtol=1e-9
    )
    np.testing.assert_allclose(
        out["mean_abs_change"], np.abs(np.diff(x)).mean(), rtol=1e-9
    )
    np.testing.assert_allclose(
        out["root_mean_square"], np.sqrt((x * x).mean()), rtol=1e-9
    )


@settings(**_SETTINGS)
@given(
    values=_SERIES,
    test_size=st.integers(min_value=1, max_value=3),
)
def test_train_test_split_partition(spark, values, test_size):
    """Train + test = original panel, disjoint, test is the tail."""
    from functime_spark.operators.cross_validation import train_test_split

    df = _panel(spark, values)
    train, test = train_test_split(df, test_size=test_size)
    tr = train.toPandas().sort_values("t")
    te = test.toPandas().sort_values("t")
    assert len(tr) + len(te) == len(values)
    assert len(te) == min(test_size, len(values))
    if len(tr):
        assert tr["t"].max() < te["t"].min()


@settings(**_SETTINGS)
@given(
    values=st.lists(
        st.floats(min_value=-1e3, max_value=1e3, allow_nan=False, allow_infinity=False),
        min_size=35,
        max_size=120,
    ),
    scale=st.sampled_from([1e-2, 1.0, 1e3]),
)
def test_friedrich_matches_polyfit(values, scale):
    """The z-scored normal-equation friedrich solve is the same
    least-squares cubic np.polyfit computes on the raw bin means."""
    from functime_spark.functions.features_udf import friedrich_coefficients

    x = np.asarray(values) * scale
    got = friedrich_coefficients(x)
    delta, sig = np.diff(x), x[:-1]
    edges = np.quantile(x, np.linspace(0, 1, 31))
    which = np.clip(np.searchsorted(edges[1:-1], sig, side="left"), 0, 29)
    xs, ys = [], []
    for q in range(30):
        m = which == q
        if m.any():
            xs.append(sig[m].mean())
            ys.append(delta[m].mean())
    if len(xs) < 4 or np.std(xs) == 0.0:
        assert all(np.isnan(got))
        return
    exp = np.polyfit(xs, ys, 3)
    np.testing.assert_allclose(got, exp, rtol=1e-6, atol=1e-9)


@settings(**_SETTINGS)
@given(
    toks=st.lists(st.integers(min_value=0, max_value=30), min_size=1, max_size=60),
    budget=st.integers(min_value=1, max_value=100),
    n_buckets=st.integers(min_value=1, max_value=9),
)
def test_pack_shards_equals_serial_cumsum(spark, toks, budget, n_buckets):
    """Distributed two-phase prefix sum == the serial running sum for
    any id spacing, bucket count and token distribution."""
    from functime_spark.pipeline.packing import pack_shards

    rows = [(i * 3 + 1, " ".join("w" for _ in range(n)) if n else "") for i, n in enumerate(toks)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_tokens"], r["start_offset"], r["shard"])
        for r in pack_shards(docs, budget, n_buckets=n_buckets).collect()
    }
    run = 0
    for i, n in enumerate(toks):
        did = i * 3 + 1
        assert got[did] == (n, run, run // budget)
        run += n


@settings(**_SETTINGS)
@given(
    tokens=st.lists(st.integers(min_value=1, max_value=500), min_size=2, max_size=6),
    fracs=st.lists(st.floats(min_value=0.05, max_value=1.0), min_size=2, max_size=6),
)
def test_mix_weights_hit_target_shares(spark, tokens, fracs):
    """Kept token mixture matches the (normalized) target shares and
    no domain exceeds keep_frac 1."""
    from functime_spark.pipeline.sampling import domain_mix_weights

    k = min(len(tokens), len(fracs))
    tokens, fracs = tokens[:k], fracs[:k]
    total_f = sum(fracs)
    targets = {f"s{i}": f / total_f for i, f in enumerate(fracs)}
    rows = []
    did = 0
    for i, n in enumerate(tokens):
        rows.append((did, " ".join("w" for _ in range(n)), f"s{i}"))
        did += 1
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {r["source"]: r for r in domain_mix_weights(docs, targets).collect()}
    kept = {s: out[s]["est_tokens"] for s in targets}
    T = sum(kept.values())
    for s, f in targets.items():
        assert out[s]["keep_frac"] <= 1.0 + 1e-12
        assert kept[s] / T == pytest.approx(f, rel=1e-9)
    # the limiting domain keeps everything
    assert any(abs(out[s]["keep_frac"] - 1.0) < 1e-9 for s in targets)


@settings(**_SETTINGS)
@given(
    lts=st.lists(st.integers(min_value=0, max_value=50), min_size=1, max_size=12),
    rts=st.lists(st.integers(min_value=0, max_value=50), min_size=0, max_size=12),
    direction=st.sampled_from(["backward", "forward", "nearest"]),
    exact=st.booleans(),
)
def test_asof_join_matches_pandas_merge_asof(spark, lts, rts, direction, exact):
    """asof_join == pandas merge_asof for every direction on random
    integer-hour grids (duplicate right times deduped — merge_asof
    requires strictly sorted keys)."""
    import pandas as pd

    from functime_spark.operators.joins import asof_join

    from datetime import datetime, timedelta

    base = datetime(2024, 1, 1)
    t = lambda h: base + timedelta(hours=h)
    rts = sorted(set(rts))
    left = spark.createDataFrame(
        [("a", t(h)) for h in sorted(lts)], "e string, t timestamp"
    )
    right = spark.createDataFrame(
        [("a", t(h), float(h)) for h in rts], "e string, t timestamp, px double"
    ) if rts else spark.createDataFrame([], "e string, t timestamp, px double")
    got = {
        (r["t"], i): r["px"]
        for i, r in enumerate(
            asof_join(left, right, direction=direction,
                      allow_exact_matches=exact)
            .orderBy("t")
            .collect()
        )
    }
    lp = pd.DataFrame({"t": [t(h) for h in sorted(lts)]})
    rp = pd.DataFrame(
        {
            "t": pd.to_datetime([t(h) for h in rts]),
            "px": pd.Series([float(h) for h in rts], dtype=float),
        }
    )
    exp = pd.merge_asof(lp, rp, on="t", direction=direction,
                        allow_exact_matches=exact)
    for i, (ts_, px) in enumerate(zip(exp["t"], exp["px"])):
        g = got[(ts_.to_pydatetime(), i)]
        if pd.isna(px):
            assert g is None
        else:
            assert g == px


@settings(**_SETTINGS)
@given(
    lkeys=st.lists(
        st.one_of(st.integers(min_value=0, max_value=6), st.none()),
        min_size=1,
        max_size=40,
    ),
    rkeys=st.lists(
        st.one_of(st.integers(min_value=0, max_value=6), st.none()),
        min_size=0,
        max_size=12,
    ),
    n_salts=st.integers(min_value=1, max_value=5),
    how=st.sampled_from(["inner", "left"]),
)
def test_salted_join_equals_plain_join(spark, lkeys, rkeys, n_salts, how):
    """For ANY key multiset (dups, NULLs, unmatched, empty right) and
    ANY salt count, salted_join is row-identical to the plain join."""
    from functime_spark.pipeline.scaletools import salted_join

    left = spark.createDataFrame(
        [(k, float(i)) for i, k in enumerate(lkeys)], "k long, v double"
    )
    right = spark.createDataFrame(
        [(k, i * 10) for i, k in enumerate(rkeys)], "rk long, w long"
    )
    plain = left.join(right, on=left["k"] == right["rk"], how=how)
    salted = salted_join(left, right, "k", "rk", n_salts=n_salts, how=how)
    key = lambda t: tuple((v is None, str(v)) for v in t)
    assert sorted((tuple(r) for r in salted.collect()), key=key) == sorted(
        (tuple(r) for r in plain.collect()), key=key
    )


@settings(**_SETTINGS)
@given(
    docs=st.lists(
        st.tuples(
            st.text(alphabet="ab ", min_size=0, max_size=12),
            st.sampled_from(["cur", "web", "crawl", None]),
        ),
        min_size=1,
        max_size=25,
    )
)
def test_dedup_priority_matches_serial_replay(spark, docs):
    """exact_dedup_priority == a driver-side serial replay of the
    keep rule (rank by priority list then min id) for random corpora
    with duplicate texts, NULL sources, and unlisted sources."""
    from functime_spark.pipeline.dedup import exact_dedup_priority

    rows = [(i, t, s) for i, (t, s) in enumerate(docs)]
    frame = spark.createDataFrame(rows, "doc_id long, text string, source string")
    priority = ["cur", "web"]
    got = {
        r.doc_id: (r.source, r.n_copies)
        for r in exact_dedup_priority(frame, priority).collect()
    }
    exp = {}
    by_text = {}
    for i, t, s in rows:
        by_text.setdefault(t, []).append((i, s))
    for t, copies in by_text.items():
        rank = lambda s: priority.index(s) + 1 if s in priority else len(priority) + 1
        win = min(copies, key=lambda c: (rank(c[1]), c[0]))
        exp[win[0]] = (win[1], len(copies))
    assert got == exp


@settings(**_SETTINGS)
@given(
    texts=st.lists(
        st.text(alphabet="abc xyz", min_size=0, max_size=30),
        min_size=1,
        max_size=15,
    ),
    n_buckets=st.sampled_from([16, 64, 256]),
)
def test_dsir_self_target_is_exactly_zero(spark, texts, n_buckets):
    """DSIR identity: when the target IS the raw corpus, both bucket
    LMs coincide, so every per-bucket log-ratio — and therefore every
    document's log weight — is EXACTLY 0.0 (not just approximately:
    the two log terms are the same float). n_feats still counts the
    unigram+bigram stream."""
    from functime_spark.pipeline.sampling import dsir_weights

    d = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    rows = dsir_weights(d, d, n_buckets=n_buckets).collect()
    assert len(rows) == len(texts)
    for r in rows:
        assert r.log_weight == 0.0
        n_words = len([w for w in texts[r.doc_id].split() if w])
        assert r.n_feats == max(0, 2 * n_words - 1)


def test_translate_gbt_params_total_and_lossless():
    """Property: every input kwarg lands in exactly one of (backbone,
    mllib-extra, dropped) — nothing vanishes, nothing duplicates — and
    known-mapped names never fall into `dropped`."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from functime_spark.forecasting.tree import (
        _GBT_COLSAMPLE,
        _GBT_TO_BACKBONE,
        _GBT_TO_MLLIB,
        translate_gbt_params,
    )

    known = (
        sorted(_GBT_TO_BACKBONE) + sorted(_GBT_TO_MLLIB) + sorted(_GBT_COLSAMPLE)
        + ["num_leaves", "objective", "max_iter", "step_size", "num_trees"]
    )
    keys = st.sampled_from(known) | st.text(
        alphabet="abcdefghijklmnopqrstuvwxyz_", min_size=1, max_size=12
    )

    def value_for(k):
        if k in _GBT_COLSAMPLE:
            return st.floats(min_value=0.01, max_value=1.0, allow_nan=False)
        if k == "objective":
            return st.sampled_from(["regression", "l1", "quantile", "gamma"])
        return st.one_of(
            st.integers(min_value=1, max_value=512),
            st.floats(min_value=0.01, max_value=1.0, allow_nan=False),
        )

    pairs = keys.flatmap(lambda k: st.tuples(st.just(k), value_for(k)))

    @settings(max_examples=200, deadline=None)
    @given(st.lists(pairs, max_size=8).map(dict))
    def check(params):
        import warnings

        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            core, extra, dropped = translate_gbt_params(params)
        # accounted: every input key maps somewhere (num_leaves maps
        # into core iff no explicit depth; objective maps or drops)
        for k in params:
            if k == "num_leaves":
                assert ("max_depth" in core) or ("max_depth" in params) or (
                    "depth" in params
                )
            elif k in _GBT_TO_BACKBONE or k in ("max_iter", "step_size", "num_trees"):
                assert _GBT_TO_BACKBONE.get(k, k) in core
                assert k not in dropped
            elif k in _GBT_TO_MLLIB:
                assert _GBT_TO_MLLIB[k] in extra and k not in dropped
            elif k in _GBT_COLSAMPLE:
                assert "featureSubsetStrategy" in extra and k not in dropped
            elif k == "objective":
                assert ("lossType" in extra) != (k in dropped)
            else:
                assert k in dropped
        # core only ever holds backbone constructor names
        assert set(core) <= {"max_iter", "max_depth", "step_size", "num_trees"}

    check()


@given(
    word=st.text(alphabet="abc", min_size=1, max_size=9),
    probs=st.dictionaries(
        st.text(alphabet="abc", min_size=1, max_size=3),
        st.floats(min_value=1e-6, max_value=0.5),
        max_size=12,
    ),
)
@settings(max_examples=200, deadline=None)
def test_unigram_viterbi_is_optimal(word, probs):
    """Property referee for the unigram Viterbi kernel: over random
    piece tables and words, the DP's segmentation always (a) rebuilds
    the word exactly and (b) attains the brute-force maximum product
    over ALL segmentations into known pieces + UNK singles — with the
    IEEE-exact left-to-right multiply the engine and the SQL oracle
    both use."""
    from functime_spark.pipeline.unigram import UNK_P, viterbi_pieces

    def best_brute(w):
        if not w:
            return 1.0
        best = -1.0
        for l in range(1, min(3, len(w)) + 1):
            p = probs.get(w[:l])
            if p is None:
                if l != 1:
                    continue
                p = UNK_P
            cand = p * best_brute(w[l:])
            if cand > best:
                best = cand
        return best

    got = viterbi_pieces(word, probs, 3)
    assert "".join(got) == word
    score = 1.0
    for piece in got:
        score = score * probs.get(piece, UNK_P)
    # brute force folds tail-first (suffix recursion); the DP folds
    # prefix-first — compare within one ulp-scale tolerance
    brute = best_brute(word)
    assert score >= brute * (1 - 1e-12)
    assert score <= brute * (1 + 1e-12)
