"""Benchmark decontamination: flag training documents that share word
n-grams with an evaluation/benchmark corpus.

Standard LM training-data hygiene (GPT-3 appendix C / PaLM / Dolma
style): a training document is contaminated when any (or more than
``max_overlap`` of) its word n-grams appear verbatim in a benchmark
set. The reference engine has no equivalent; this is part of the
beyond-reference training-data surface (SURVEY §7 stretch goals).

Scale design: benchmarks are MB-scale while the corpus is the 100 TB
side, so the distinct benchmark gram set rides as a BROADCAST probe
table (hashed to 64-bit by default to shrink the build side ~10x).
The corpus side is one n-gram explode -> broadcast inner probe (drops
every clean gram before any exchange) -> one groupBy(doc_id) shuffle
of hit rows only. No corpus self-join, and the full text never
shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from functime_spark.pipeline.dedup import _hash64
from functime_spark.materialize import materialize


def _word_ngrams(text_col, n: int):
    """Distinct word n-gram array; empty when the doc has < n words.

    Tokenization matches pipeline.text.tokens (split on whitespace,
    drop empties) so overlap composes with the quality operators.
    zip_with over n shifted slices, not transform(idx, i -> slice):
    the inlined token array would re-evaluate per element — O(n_grams
    * doc_len) per row (see dedup.shingles)."""
    words = F.filter(F.split(text_col, r"\s+"), lambda x: x != "")
    m = F.greatest(F.size(words) - (n - 1), F.lit(0))
    gram = F.slice(words, 1, m)
    for k in range(1, n):
        gram = F.zip_with(
            gram,
            F.slice(words, k + 1, m),
            lambda a, b: F.concat_ws(" ", a, b),
        )
    return F.when(F.size(words) >= n, F.array_distinct(gram)).otherwise(
        F.array().cast("array<string>")
    )


def benchmark_ngrams(
    benchmark: DataFrame, n: int = 8, text_col: str = "text"
) -> DataFrame:
    """Distinct word n-grams of the benchmark set: one column ``gram``."""
    return benchmark.select(
        F.explode(_word_ngrams(F.col(text_col), n)).alias("gram")
    ).distinct()


def ngram_overlap(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_overlap: float = 0.0,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Per-document contamination signals against a benchmark set.

    Returns (id, n_grams, n_contaminated, contamination,
    is_contaminated): distinct-gram counts, the contaminated fraction,
    and the verdict ``contamination > max_overlap`` (default: any hit
    flags). ``hash_fn``: "xxhash64" (prod), "md5" (oracle-replayable
    60-bit), or "none" (join on the raw gram string — exact, larger
    broadcast)."""
    bench = benchmark_ngrams(benchmark, n, text_col)
    per_doc = docs.select(
        F.col(id_col), _word_ngrams(F.col(text_col), n).alias("__grams")
    )
    # the gram arrays feed BOTH the totals projection and the probe
    # explode; cut the lineage so the n-gram construction (and the
    # corpus scan under it) runs once, not once per consumer
    per_doc = materialize(per_doc)
    totals = per_doc.select(id_col, F.size("__grams").alias("n_grams"))
    exploded = per_doc.select(id_col, F.explode("__grams").alias("gram"))
    if hash_fn == "none":
        probe, key = bench, "gram"
    else:
        probe = bench.select(
            _hash64(F.col("gram"), hash_fn=hash_fn).alias("__gh")
        ).distinct()
        exploded = exploded.select(
            id_col, _hash64(F.col("gram"), hash_fn=hash_fn).alias("__gh")
        )
        key = "__gh"
    hits = (
        exploded.join(F.broadcast(probe), on=key, how="inner")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_contaminated"))
    )
    out = totals.join(hits, on=id_col, how="left").select(
        id_col,
        F.col("n_grams").cast("long").alias("n_grams"),
        F.coalesce("n_contaminated", F.lit(0)).cast("long").alias("n_contaminated"),
    )
    frac = F.when(
        F.col("n_grams") > 0, F.col("n_contaminated") / F.col("n_grams")
    ).otherwise(F.lit(0.0))
    return out.select(
        id_col,
        "n_grams",
        "n_contaminated",
        frac.alias("contamination"),
        (frac > F.lit(max_overlap)).cast("int").alias("is_contaminated"),
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_overlap: float = 0.0,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Drop contaminated documents (anti-join on the flagged ids)."""
    flagged = ngram_overlap(
        docs, benchmark, n, text_col, id_col, max_overlap, hash_fn
    ).filter(F.col("is_contaminated") == 1)
    return docs.join(flagged.select(id_col), on=id_col, how="left_anti")
