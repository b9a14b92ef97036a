"""Corpus sampling and reporting operators.

Training-data pipelines downsample and re-balance corpora constantly
(per-language quotas, source mixing). Both operators here are
deterministic — hash-based sampling instead of rand() — so runs are
reproducible, resumable, and exactly replayable by the correctness
oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from functime_spark.materialize import materialize


def corpus_stats(
    docs: DataFrame,
    group_cols: tuple = ("lang", "source"),
    text_col: str = "text",
    rollup: bool = False,
) -> DataFrame:
    """Per-group corpus report: doc count, char totals/means/median,
    whitespace-token total. One hash aggregate — partial aggregation
    map-side, a group-key shuffle of pre-aggregated rows only.

    ``rollup=True`` adds the hierarchical subtotal rows (per lang, and
    the grand total) via grouping sets — still ONE aggregate pass;
    Spark expands the sets map-side, so the shuffle carries one
    pre-aggregated row per (set, key) not an extra scan per level."""
    t = F.col(text_col)
    n_toks = F.size(F.filter(F.split(t, r"\s+"), lambda x: x != F.lit("")))
    src = docs.select(
        *group_cols,
        F.length(t).alias("__chars"),
        n_toks.alias("__toks"),
    )
    grouped = src.rollup(*group_cols) if rollup else src.groupBy(*group_cols)
    return (
        grouped
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("__chars").alias("total_chars"),
            F.avg("__chars").alias("mean_chars"),
            F.median("__chars").alias("median_chars"),
            F.sum("__toks").cast("long").alias("total_tokens"),
        )
    )


def stratified_sample(
    docs: DataFrame,
    fractions: dict,
    strata_col: str = "lang",
    id_col: str = "doc_id",
    buckets: int = 10000,
) -> DataFrame:
    """Deterministic per-stratum sampling: keep a row iff
    md5-bucket(id) < fraction * buckets. Unlisted strata are dropped
    (fraction 0). Unlike `DataFrame.sample` this is reproducible
    across runs/partitionings, joinable (the same id always samples
    the same way), and a pure filter — no shuffle, full codegen,
    predicate evaluated at the scan."""
    bucket = F.pmod(
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 15), 16, 10
               ).cast("long"),
        F.lit(buckets),
    )
    cond = None
    for stratum, frac in fractions.items():
        hit = (F.col(strata_col) == stratum) & (bucket < int(round(frac * buckets)))
        cond = hit if cond is None else cond | hit
    return docs.filter(cond)


def _domain_token_counts(
    docs: DataFrame, strata_col: str, text_col: str
) -> DataFrame:
    """(strata, n_tokens) whitespace-token sums per domain — the ONE
    definition both mixture operators share (drift here would make
    them disagree on the same corpus). Materialized: the tiny frame
    feeds multiple plan branches in every caller, and without the cut
    the corpus token aggregate re-executes per branch (3 scans
    measured on domain_mix_weights)."""
    t = F.col(text_col)
    tok = F.size(F.filter(F.split(t, r"\s+"), lambda x: x != F.lit("")))
    cur = (
        docs.select(F.col(strata_col), tok.cast("long").alias("__t"))
        .groupBy(strata_col)
        .agg(F.sum("__t").cast("long").alias("n_tokens"))
    )
    return materialize(cur)


def domain_mix_weights(
    docs: DataFrame,
    target_fracs: dict,
    strata_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Downsample-only quota solve for a target token mixture
    (DoReMi-style domain re-balancing, applied as deterministic
    sampling rather than loss reweighting).

    Given target token shares f_d, the largest achievable kept total
    is T = min_d tokens_d / f_d (the limiting domain keeps 100%);
    every domain then keeps keep_frac_d = f_d * T / tokens_d. Domains
    not in ``target_fracs`` get 0. Two tiny aggregates (per-domain
    token sums, global min) + a broadcast scalar — nothing about the
    corpus ever re-shuffles."""
    cur = _domain_token_counts(docs, strata_col, text_col)
    spark = docs.sparkSession
    tgt = spark.createDataFrame(
        [(k, float(v)) for k, v in target_fracs.items()],
        f"{strata_col} string, target_frac double",
    )
    total_all = cur.agg(F.sum("n_tokens").alias("__tot"))
    joined = cur.join(F.broadcast(tgt), on=strata_col, how="left").na.fill(
        {"target_frac": 0.0}
    )
    kept_total = (
        joined.filter(F.col("target_frac") > 0)
        .agg(F.min(F.col("n_tokens") / F.col("target_frac")).alias("__T"))
    )
    return (
        joined.crossJoin(F.broadcast(kept_total))
        .crossJoin(F.broadcast(total_all))
        .select(
            strata_col,
            "n_tokens",
            (F.col("n_tokens") / F.col("__tot")).alias("current_frac"),
            "target_frac",
            F.when(F.col("target_frac") > 0,
                   F.least(
                       F.lit(1.0),
                       F.col("target_frac") * F.col("__T") / F.col("n_tokens"),
                   ))
            .otherwise(F.lit(0.0))
            .alias("keep_frac"),
        )
        .withColumn("est_tokens", F.col("keep_frac") * F.col("n_tokens"))
    )


def rebalance_sample(
    docs: DataFrame,
    target_fracs: dict,
    strata_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 10000,
) -> DataFrame:
    """Apply domain_mix_weights as a deterministic md5-bucket filter:
    the weights table is n_domains rows (one tiny collect), the corpus
    pass is the same zero-shuffle predicate as stratified_sample."""
    w = domain_mix_weights(docs, target_fracs, strata_col, text_col)
    fracs = {r[strata_col]: r["keep_frac"] for r in w.collect() if r["keep_frac"] > 0}
    return stratified_sample(docs, fracs, strata_col, id_col, buckets)


def vocab_stats(
    docs: DataFrame,
    text_col: str = "text",
    top_k: int = 100,
) -> DataFrame:
    """Top-k token vocabulary with Zipf diagnostics: (token, count,
    rank, zipf_slope) where zipf_slope is the log-log OLS slope of
    count vs rank over the top-k (a healthy natural-language corpus
    sits near -1; flat slopes flag boilerplate/template corpora).

    Scale shape: ONE explode+hash aggregate builds the vocabulary
    (map-side partial combine flattens the Zipf skew); the top-k cut
    is orderBy+limit — Spark's TakeOrdered, a per-partition partial
    top-k then a k-row driver merge, NOT a global sort shuffle. Ranks
    and the OLS fit run on the k-row frame (single tiny partition by
    construction). Ties break by token asc for determinism."""
    from pyspark.sql import Window

    toks = docs.select(
        F.explode(
            F.filter(F.split(F.col(text_col), r"\s+"), lambda x: x != F.lit(""))
        ).alias("token")
    )
    vocab = toks.groupBy("token").agg(F.count(F.lit(1)).alias("count"))
    top = vocab.orderBy(F.desc("count"), F.asc("token")).limit(top_k)
    # the k-row top frame feeds BOTH the ranked projection and the OLS
    # aggregate; un-cut, the corpus-wide explode+aggregate under it
    # would execute twice. eager=False: the cut happens at first
    # action, so merely CONSTRUCTING this frame doesn't run a job
    top = materialize(top, eager=False)
    w = Window.orderBy(F.desc("count"), F.asc("token"))
    ranked = top.withColumn("rank", F.row_number().over(w))
    lx = F.log(F.col("rank").cast("double"))
    ly = F.log(F.col("count").cast("double"))
    fit = ranked.agg(
        (
            (F.avg(lx * ly) - F.avg(lx) * F.avg(ly))
            / (F.avg(lx * lx) - F.avg(lx) * F.avg(lx))
        ).alias("zipf_slope")
    )
    return ranked.crossJoin(F.broadcast(fit)).select(
        "token", "count", "rank", "zipf_slope"
    )


def temperature_mix_weights(
    docs: DataFrame,
    alpha: float = 0.7,
    strata_col: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """Temperature-based domain mixture: sampling weight w_d
    proportional to tokens_d^alpha, normalized (the multilingual-
    pretraining standard — alpha < 1 upweights low-resource domains,
    alpha = 1 is proportional, alpha = 0 is uniform). Complements
    `domain_mix_weights` (explicit quota targets) with the implicit
    smoothed mixture used when no target is known.

    Output per domain: token count, current corpus share, the
    temperature weight, and the resulting upsample factor
    (weight / current share — a dataloader repeats each domain by
    that factor). One token aggregate + one scalar total broadcast —
    nothing about the corpus re-shuffles."""
    cur = _domain_token_counts(docs, strata_col, text_col)
    pw = F.pow(F.col("n_tokens").cast("double"), F.lit(float(alpha)))
    weighted = cur.select(strata_col, "n_tokens", pw.alias("__w"))
    tot = weighted.agg(
        F.sum("n_tokens").alias("__tot"), F.sum("__w").alias("__wtot")
    )
    return weighted.crossJoin(F.broadcast(tot)).select(
        strata_col,
        "n_tokens",
        (F.col("n_tokens") / F.col("__tot")).alias("current_frac"),
        (F.col("__w") / F.col("__wtot")).alias("weight"),
        (
            (F.col("__w") / F.col("__wtot"))
            / (F.col("n_tokens") / F.col("__tot"))
        ).alias("upsample_factor"),
    )


def _dsir_bucket_arr(text_col: str, n_buckets: int, hash_fn: str):
    """Per-row array of hashed unigram+bigram feature buckets — the
    ONE feature definition `fit_dsir` and `dsir_score` share (drift
    here would score against a differently-hashed model)."""
    from functime_spark.pipeline.dedup import _hash64

    # coalesce: NULL text must yield an EMPTY feature array (n_feats 0)
    # — F.size(NULL) is -1 under the repo's non-ANSI session
    ws = F.filter(
        F.split(F.coalesce(F.col(text_col), F.lit("")), r"\s+"),
        lambda x: x != "",
    )
    m = F.greatest(F.size(ws) - 1, F.lit(0))
    bi = F.zip_with(
        F.slice(ws, 1, m), F.slice(ws, 2, m),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    return F.transform(
        F.concat(ws, bi),
        lambda t: F.pmod(
            _hash64(t, seed=1, hash_fn=hash_fn), F.lit(n_buckets)
        ).cast("int"),
    )


def fit_dsir(
    docs: DataFrame,
    target: DataFrame,
    n_buckets: int = 4096,
    smoothing: float = 1.0,
    text_col: str = "text",
    hash_fn: str = "xxhash64",
) -> dict:
    """Fit the DSIR importance model (Xie et al. 2023): hashed-n-gram
    (unigram + bigram) bag-of-buckets LMs of a small ``target`` corpus
    vs the ``docs`` raw corpus, add-``smoothing`` estimated over
    ``n_buckets`` hash buckets. Returns
    {"log_ratios": [log p_target(b) - log p_raw(b)] * n_buckets, ...}
    — the model is one float per bucket, O(n_buckets) regardless of
    corpus size (the hashing trick's whole point), so it ships to any
    scorer as a plan constant or a broadcast.

    ONE hash aggregate per corpus (explode buckets -> count), each
    collected at <= n_buckets rows. ``hash_fn='md5'`` is the
    oracle-replayable variant (see dedup._hash64)."""
    import math

    def counts(df: DataFrame) -> dict:
        staged = df.select(
            _dsir_bucket_arr(text_col, n_buckets, hash_fn).alias("__b")
        )
        rows = (
            staged.select(F.explode("__b").alias("bkt"))
            .groupBy("bkt")
            .agg(F.count(F.lit(1)).alias("c"))
            .collect()
        )
        return {r["bkt"]: r["c"] for r in rows}

    ct, cr = counts(target), counts(docs)
    a = float(smoothing)
    ak = a * n_buckets
    t_tot, r_tot = float(sum(ct.values())), float(sum(cr.values()))
    log_ratios = [
        math.log((ct.get(b, 0) + a) / (t_tot + ak))
        - math.log((cr.get(b, 0) + a) / (r_tot + ak))
        for b in range(n_buckets)
    ]
    return {
        "log_ratios": log_ratios,
        "n_buckets": n_buckets,
        "smoothing": a,
        "hash_fn": hash_fn,
        "text_col": text_col,
    }


def dsir_score(
    docs: DataFrame,
    model: dict,
    id_col: str = "doc_id",
) -> DataFrame:
    """Score documents under a fitted DSIR model: log importance
    weight = left-to-right fold of the per-bucket log-ratios over the
    row's OWN feature array. A pure zero-shuffle projection — the
    model rides as a single array constant in the plan (n_buckets
    doubles; at 4096 that is 32 KB — for million-bucket models switch
    to a broadcast one-row frame), so the same expression is
    stream-legal with no state and no join.

    Output: (id, n_feats, log_weight); docs with no tokens get
    (0, 0.0)."""
    buckets = _dsir_bucket_arr(
        model["text_col"], model["n_buckets"], model["hash_fn"]
    )
    lr = F.lit([float(v) for v in model["log_ratios"]])
    staged = docs.select(F.col(id_col), buckets.alias("__b"))
    lw = F.aggregate(
        F.col("__b"),
        F.lit(0.0),
        lambda acc, b: acc + F.element_at(lr, b + 1),
    )
    return staged.select(
        F.col(id_col),
        F.coalesce(F.size("__b"), F.lit(0)).cast("long").alias("n_feats"),
        F.coalesce(lw, F.lit(0.0)).alias("log_weight"),
    )


def dsir_weights(
    docs: DataFrame,
    target: DataFrame,
    n_buckets: int = 4096,
    smoothing: float = 1.0,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Data Selection with Importance Resampling (DSIR, Xie et al.
    2023) end-to-end: fit the hashed-n-gram bucket models, score every
    document — log w(x) = sum_f [log p_target(bucket(f)) -
    log p_raw(bucket(f))]. Documents resampled proportional to
    exp(log_weight) approximate the target distribution; pair with
    `stratified_sample`-style deterministic cuts on the result.

    Scale shape: two count aggregates (each collected at <= n_buckets
    rows — that bounded table IS the model) + one zero-shuffle scoring
    projection. The raw corpus is read twice (count pass + scoring
    pass) — inherent to the estimator; both passes are full codegen."""
    model = fit_dsir(docs, target, n_buckets, smoothing, text_col, hash_fn)
    return dsir_score(docs, model, id_col)


def corpus_quantiles(
    docs: DataFrame,
    value_col: str = "n_chars",
    strata_col: str = "lang",
    qs: tuple = (0.25, 0.5, 0.75, 0.95),
    approx: bool = True,
) -> DataFrame:
    """Per-domain length quantiles: the distribution diagnostic
    behind length-based quality cuts.

    ONE hash aggregate either way. ``approx=True`` (the DEFAULT —
    bounded state is the scale-safe default) uses `percentile_approx`
    (GK-style mergeable bounded-memory sketch, ~O(accuracy) state per
    group regardless of group size). ``approx=False`` (opt-in, pinned
    explicitly by the `corpus_quantiles` gate query because only the
    exact path is value-oracle-comparable) uses exact `percentile`
    (linear interpolation — the R-7 definition both Spark and DuckDB's
    `quantile_cont` implement), whose reduce-side merge holds a whole
    group's values in one reducer's memory — with ~10 langs over
    100 TB that is billions of doubles per group. Map-side partial
    aggregation applies in both modes; never a global sort."""
    probs = F.array(*[F.lit(float(q)) for q in qs])
    if approx:
        pct = F.percentile_approx(F.col(value_col).cast("double"), probs)
    else:
        pct = F.percentile(F.col(value_col).cast("double"), probs)
    out = docs.groupBy(strata_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"), pct.alias("__qs")
    )
    cols = [
        F.element_at("__qs", i + 1).alias(f"q{int(round(q * 100))}")
        for i, q in enumerate(qs)
    ]
    return out.select(strata_col, "n_docs", *cols)


def split_corpus(
    docs: DataFrame,
    fracs: dict | None = None,
    id_col: str = "doc_id",
    buckets: int = 10_000,
) -> DataFrame:
    """Deterministic disjoint train/val/test split: every row gains a
    ``split`` label from its md5-bucket(id) against cumulative
    fraction boundaries. Reproducible across runs/partitionings and
    joinable (the same id always lands in the same split — the
    property `DataFrame.randomSplit` does NOT give you once data
    re-partitions), and a pure projection: zero shuffle, the predicate
    evaluates at the scan.

    ``fracs``: ordered {label: fraction} summing to <= 1; rows past
    the last boundary get the LAST label (so the default 98/1/1 is
    exactly exhaustive)."""
    if fracs is None:
        fracs = {"train": 0.98, "val": 0.01, "test": 0.01}
    bucket = F.pmod(
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 15), 16, 10
               ).cast("long"),
        F.lit(buckets),
    )
    labels = list(fracs)
    cum = 0.0
    expr = None
    for label, frac in fracs.items():
        cum += float(frac)
        hit = bucket < int(round(cum * buckets))
        expr = (
            F.when(hit, F.lit(label))
            if expr is None
            else expr.when(hit, F.lit(label))
        )
    return docs.withColumn("split", expr.otherwise(F.lit(labels[-1])))


def sample_per_group(
    docs: DataFrame,
    k: int,
    strata_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic cap of ``k`` docs per stratum: rank by the
    md5(id) key within the stratum and keep rank <= k — the same ids
    survive on every run and any partitioning (a seeded
    `sample_fraction` gives neither the exact count nor stability),
    which is what capped per-domain subsets for eval sets need.

    One shuffle on the stratum key; rank+filter is a per-group top-k
    window, never a global sort."""
    from pyspark.sql import Window

    key = F.conv(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 15), 16, 10
    ).cast("long")
    w = Window.partitionBy(strata_col).orderBy(key.asc(), F.col(id_col).asc())
    return (
        docs.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= k)
        .drop("__rk")
    )


def cluster_balanced_sample(
    emb: DataFrame,
    model,
    per_cluster: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Diversity-preserving corpus sampling (the DCLM / SemDeDup
    curation move): nearest-centroid assignment under a fitted k-means
    (`similarity.fit_kmeans`), then a deterministic per-cluster cap —
    so the sample keeps every region of embedding space instead of
    letting the head clusters swamp a uniform draw. Returns
    (id, cluster) for the kept rows.

    Composition of two scale-safe pieces: broadcast-centroid
    assignment (zero shuffle on the big side) + the md5-ranked
    per-group cap (one shuffle on the cluster key)."""
    from functime_spark.pipeline.similarity import assign_clusters

    asn = assign_clusters(emb, model, vec_col=vec_col, id_col=id_col).select(
        id_col, "cluster"
    )
    return sample_per_group(asn, per_cluster, strata_col="cluster", id_col=id_col)
