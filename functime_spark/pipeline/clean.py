"""One-call corpus cleaning: the standard pre-training data pipeline
composed from the individually-oracled stages.

Order follows common practice (Gopher/RefinedWeb/Dolma-style):
cheap row-local quality rules first (no shuffle), then exact dedup,
then near-dup (MinHash), then benchmark decontamination, then the
LM-perplexity tier cut — each stage shrinks the corpus before the
next, more expensive one runs.

Every underlying operator is value-verified against DuckDB in the
correctness gate; this module only composes them, and the attrition
report lets a pipeline owner see where documents die.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from functime_spark.materialize import materialize


def clean_corpus(
    docs: DataFrame,
    benchmark: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    use_gopher: bool = True,
    gopher_params: dict | None = None,
    normalize: bool = False,
    html_strip: bool = False,
    mojibake_max: float | None = None,
    languages: tuple | list | None = None,
    use_c4: bool = False,
    url_col: str | None = None,
    dedup: str = "minhash",
    minhash_threshold: float = 0.8,
    minhash_hash_fn: str = "xxhash64",
    span_dedup: str | None = None,
    span_k: int = 8,
    span_min_count: int = 2,
    decontaminate_n: int = 8,
    max_tier: int | None = None,
    n_tiers: int = 4,
    score_round: int | None = None,
    exact_tiers: bool = False,
    lm_order: int = 2,
) -> tuple:
    """Returns (clean_docs, report): the surviving documents and a
    per-stage attrition DataFrame (stage, docs_in, docs_out).

    Stages (each optional):
    -1. html — strip markup/entities (rewrites text_col; row-local,
       runs first so every later signal sees prose, not tags);
    0. normalize — unicode/whitespace canonicalization (rewrites
       text_col in place; row-local, run before anything hashes text);
    0a. mojibake — drop encoding-damaged docs (rate > mojibake_max
       double-encoded sequences per kchar);
    0b. url — URL-level dedup on `url_col` (cheapest dedup tier);
    0c. language — keep docs whose lexicon-detected language is in
       ``languages`` (row-local scoring + a semi join);
    1. gopher  — Rae et al. 2021 quality rules (row-local filter;
       ``gopher_params`` forwards threshold overrides, e.g.
       {"min_words": 10, "min_stopword_hits": 0} for short-form or
       non-English corpora the default English-stopword rule would
       drop wholesale);
    1b. c4     — Raffel et al. 2020 line/doc rules (rewrites text_col
       to the kept lines, drops lorem-ipsum/brace/thin docs);
    2. exact   — md5 exact dedup, keep min id;
    3. minhash — MinHash-LSH near-dup pairs -> keep cluster canonical;
    3b. span_dedup — cross-document repeated-SPAN removal (Lee et al.
       2022 discretized to word ``span_k``-grams): ``"keepfirst"``
       keeps the corpus-wide first copy of each duplicated span and
       scrubs the rest (the training-data semantics), ``"scrub"``
       removes every copy. Rewrites text_col; runs AFTER doc-level
       dedup so whole-document duplicates don't inflate span counts,
       and docs scrubbed to < span_k surviving tokens are NOT dropped
       (later stages — e.g. the perplexity tier — judge the residue);
    4. decontaminate — drop docs sharing word n-grams with `benchmark`;
    5. perplexity — keep tiers <= max_tier under the corpus n-gram LM:
       ``lm_order=2`` (default) scores with the interpolated bigram,
       ``lm_order=3`` with the interpolated trigram-with-backoff
       (ngram_lm3_score — the CCNet-grade filter; same tier contract,
       higher fit cost: one triple aggregate + five scoring joins).
       ``exact_tiers=False`` by default: tier cuts come from the
       bounded-state GK sketch — scale-safe; pass ``exact_tiers=True``
       for the exact-percentile cuts the value oracles replay.

    Each stage input is the previous stage's output, so expensive
    stages see an already-shrunk corpus. ONE action per stage: a
    stage's docs_in is the previous stage's already-counted docs_out,
    and each stage output is localCheckpoint-ed before counting — so
    stage k executes once, instead of the lazy chain re-running stages
    1..k-1 under every later count (quadratic re-execution at corpus
    scale)."""
    from functime_spark.pipeline.dedup import (
        dedup_keep_canonical,
        exact_dedup,
        minhash_dedup,
    )

    report = []
    cur = docs
    n_prev = docs.count()

    def step(name, nxt):
        nonlocal cur, n_prev
        nxt = materialize(nxt)
        n_out = nxt.count()
        report.append((name, n_prev, n_out))
        cur, n_prev = nxt, n_out

    if html_strip:
        from functime_spark.pipeline.text import strip_html

        stripped = strip_html(cur, text_col=text_col, id_col=id_col)
        step(
            "html_strip",
            cur.drop(text_col).join(
                stripped.select(id_col, F.col("text_clean").alias(text_col)),
                on=id_col,
            ),
        )
    if normalize:
        from functime_spark.pipeline.text import normalize_text

        normed = normalize_text(cur, text_col=text_col, id_col=id_col)
        step(
            "normalize",
            cur.drop(text_col).join(
                normed.select(id_col, F.col("text_norm").alias(text_col)),
                on=id_col,
            ),
        )
    if mojibake_max is not None:
        from functime_spark.pipeline.text import mojibake_scan

        flags = mojibake_scan(
            cur, text_col=text_col, id_col=id_col,
            max_hits_per_kchar=mojibake_max,
        )
        keep = flags.filter(F.col("is_mojibake") == 0).select(id_col)
        step("mojibake", cur.join(keep, on=id_col, how="left_semi"))
    if url_col is not None:
        from functime_spark.pipeline.text import dedup_by_url

        step(
            "url_dedup",
            dedup_by_url(cur, url_col=url_col, id_col=id_col).drop("url_canon"),
        )
    if languages:
        from functime_spark.pipeline.text import filter_by_language

        step(
            "language",
            filter_by_language(cur, languages, text_col=text_col, id_col=id_col),
        )
    if use_gopher:
        from functime_spark.pipeline.text import gopher_quality_filter

        flags = gopher_quality_filter(
            cur, text_col=text_col, id_col=id_col, **(gopher_params or {})
        )
        keep = flags.filter(F.col("passes") == 1).select(id_col)
        step("gopher", cur.join(keep, on=id_col, how="left_semi"))
    if use_c4:
        from functime_spark.pipeline.text import c4_quality_filter

        c4 = c4_quality_filter(cur, text_col=text_col, id_col=id_col)
        kept = c4.filter(F.col("keep")).select(
            id_col, F.col("text_clean").alias(text_col)
        )
        step("c4", cur.drop(text_col).join(kept, on=id_col))
    if dedup in ("exact", "minhash"):
        keep = exact_dedup(cur, text_col, id_col).select(id_col)
        step("exact_dedup", cur.join(keep, on=id_col, how="left_semi"))
    if dedup == "minhash":
        pairs = minhash_dedup(cur, text_col=text_col, id_col=id_col,
                              threshold=minhash_threshold,
                              hash_fn=minhash_hash_fn)
        step("minhash_dedup", dedup_keep_canonical(cur, pairs, id_col=id_col))
    if span_dedup is not None:
        if span_dedup not in ("scrub", "keepfirst"):
            raise ValueError(
                "span_dedup must be None, 'scrub' or 'keepfirst'; got "
                f"{span_dedup!r}"
            )
        from functime_spark.pipeline.dedup import scrub_duplicated_spans

        spans = scrub_duplicated_spans(
            cur, text_col=text_col, id_col=id_col, k=span_k,
            min_count=span_min_count,
            keep_first=(span_dedup == "keepfirst"),
        )
        step(
            "span_dedup",
            cur.drop(text_col).join(
                spans.select(id_col, text_col), on=id_col
            ),
        )
    if benchmark is not None:
        from functime_spark.pipeline.decontaminate import decontaminate

        step(
            "decontaminate",
            decontaminate(cur, benchmark, n=decontaminate_n,
                          text_col=text_col, id_col=id_col),
        )
    if max_tier is not None:
        from functime_spark.pipeline.lm import (
            ngram_lm3_score,
            ngram_lm_score,
            quality_tiers,
        )

        if lm_order not in (2, 3):
            raise ValueError(f"lm_order must be 2 or 3, got {lm_order}")
        scorer = ngram_lm_score if lm_order == 2 else ngram_lm3_score
        lm_scored = scorer(cur, text_col=text_col, id_col=id_col)
        if score_round is not None:
            # deterministic tiering across engines/runs: quantile cuts
            # over scores rounded first (summation-order float noise at
            # a cut boundary can otherwise flip a tier)
            lm_scored = lm_scored.withColumn(
                "cross_entropy",
                F.round(F.col("cross_entropy") + F.lit(1e-9), score_round),
            )
        scored = quality_tiers(lm_scored, n_tiers=n_tiers, exact=exact_tiers)
        keep = scored.filter(F.col("tier") <= max_tier).select(id_col)
        step("perplexity_tier", cur.join(keep, on=id_col, how="left_semi"))

    spark = docs.sparkSession
    rep = spark.createDataFrame(
        [(s, int(a), int(b)) for s, a, b in report],
        "stage string, docs_in long, docs_out long",
    )
    return cur, rep
