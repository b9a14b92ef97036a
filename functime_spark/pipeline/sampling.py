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


def corpus_stats(
    docs: DataFrame,
    group_cols: tuple = ("lang", "source"),
    text_col: str = "text",
) -> DataFrame:
    """Per-group corpus report: doc count, char totals/means/median,
    whitespace-token total. One hash aggregate — partial aggregation
    map-side, a group-key shuffle of pre-aggregated rows only."""
    t = F.col(text_col)
    n_toks = F.size(F.filter(F.split(t, r"\s+"), lambda x: x != F.lit("")))
    return (
        docs.select(
            *group_cols,
            F.length(t).alias("__chars"),
            n_toks.alias("__toks"),
        )
        .groupBy(*group_cols)
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
