"""In-engine byte-pair encoding: train a merge list on the corpus'
word-frequency table, tokenize with a chain of literal replaces.

This replaces the chars/4 heuristic in `text.token_counts` with a real
(small) BPE when exact subword counts matter — e.g. token-budget shard
packing against a specific tokenizer family.

Scale design: the distributed work is exactly the two passes a real
BPE pipeline does —

- `fit_bpe`: ONE shuffle builds the word-frequency table; the top
  ``max_words`` rows (TakeOrdered — per-partition partial top-k, no
  global sort) come to the driver, where the merge loop runs over
  (word, count) pairs. BPE training is inherently a loop over a
  bounded frequency table, not the raw corpus, so the driver-side
  part is O(vocab), independent of corpus size.
- `bpe_tokenize`: map-only — each word becomes its space-joined
  character sequence and the merge list applies as a chain of literal
  replaces (JVM expressions, zero shuffle, stream-legal).

Merge-application semantics: this engine's BPE variant is defined
operationally as a greedy left-to-right literal ``replace`` of the
space-joined pair on the space-joined encoding — trainer, tokenizer
(both engines), and the DuckDB oracle replay all share that exact
primitive, so learned merges and subword counts agree byte-for-byte
by construction. (Canonical symbol-splice BPE differs on corner
cases — a replace can glue across a prior multi-char symbol boundary
— but splice semantics are not expressible as a bounded JVM/SQL
expression chain, and self-consistency is what token-budget packing
needs.)

Determinism: merges pick the (count DESC, pair ASC) argmax each
round and ties in the word cap break by (count DESC, word ASC), so
the whole fit replays in generated SQL — the correctness gate
value-verifies training AND tokenization end-to-end.

Note: pair symbols are plain space-joined strings, without the
classic end-of-word marker — merges cannot cross words because the
encoding is per word, which is the only property the marker buys at
this size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from functime_spark.compat import broadcast_value


def _word_counts(docs: DataFrame, text_col: str, max_words: int):
    toks = F.filter(F.split(F.col(text_col), r"\s+"), lambda x: x != "")
    return (
        docs.select(F.explode(toks).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("word"))
        .limit(max_words)
    )


def fit_bpe(
    docs: DataFrame,
    n_merges: int = 32,
    text_col: str = "text",
    max_words: int = 50_000,
) -> list:
    """Train a BPE merge list; returns ``["a b", "ab c", ...]`` in
    application order (each entry is the space-joined pair; applying
    it replaces the pair with its concatenation)."""
    rows = _word_counts(docs, text_col, max_words).collect()
    vocab = [[" ".join(r["word"]), int(r["cnt"])] for r in rows]
    merges: list = []
    for _ in range(n_merges):
        pair_counts: dict = {}
        for enc, cnt in vocab:
            syms = enc.split(" ")
            for a, b in zip(syms, syms[1:]):
                key = f"{a} {b}"
                pair_counts[key] = pair_counts.get(key, 0) + cnt
        if not pair_counts:
            break
        # (count DESC, pair ASC) — the same argmax the SQL replay takes
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        ab = best.replace(" ", "")
        # apply via the SAME greedy literal replace the tokenizer and
        # the oracle replay use — semantics identical by construction
        vocab = [[enc.replace(best, ab), cnt] for enc, cnt in vocab]
    return merges


def _encode_word(word_col, merges: list):
    """Space-joined characters, then the merge chain as literal
    replaces. replace() rewrites left-to-right non-overlapping — the
    identical primitive `fit_bpe` applies during training."""
    enc = F.trim(F.regexp_replace(word_col, "(.)", "$1 "))
    for m in merges:
        enc = F.replace(enc, F.lit(m), F.lit(m.replace(" ", "")))
    return enc


def bpe_tokenize(
    docs: DataFrame,
    merges: list,
    text_col: str = "text",
    id_col: str = "doc_id",
    engine: str = "auto",
) -> DataFrame:
    """(id, n_words, n_bpe_tokens): exact subword counts under the
    fitted merge list. Zero shuffle on either engine.

    ``engine``: 'expr' builds one literal replace per merge into the
    plan — pure codegen, ideal for the small vocabularies this module
    trains, but linear plan growth makes it wrong for a real
    tokenizer's thousands of merges; 'arrow' applies the broadcast
    merge list in a vectorized mapInPandas pass (plan size O(1) in
    the merge count). 'auto' switches to arrow above 64 merges. Both
    produce identical counts (pinned by test)."""
    if engine == "auto":
        engine = "expr" if len(merges) <= 64 else "arrow"
    if engine == "expr":
        # coalesce: NULL text must count as (0, 0) like the oracle's
        # LEFT JOIN/COALESCE — F.size(NULL) is -1 under legacy sizeOfNull
        txt = F.coalesce(F.col(text_col), F.lit(""))
        toks = F.filter(F.split(txt, r"\s+"), lambda x: x != "")
        base = docs.select(F.col(id_col), toks.alias("__ws"))
        enc = F.transform(F.col("__ws"), lambda w: _encode_word(w, merges))
        n_sub = F.aggregate(
            enc,
            F.lit(0).cast("long"),
            lambda acc, e: acc + F.size(F.split(e, " ")),
        )
        return base.select(
            F.col(id_col),
            F.size("__ws").cast("long").alias("n_words"),
            n_sub.alias("n_bpe_tokens"),
        )
    if engine != "arrow":
        raise ValueError(f"engine must be auto|expr|arrow, got {engine!r}")

    import re

    id_field = docs.select(id_col).schema.fields[0]
    out_schema = (
        f"{id_field.name} {id_field.dataType.simpleString()}, "
        "n_words bigint, n_bpe_tokens bigint"
    )
    bc = broadcast_value(docs.sparkSession, list(merges))
    # re.ASCII: Java/RE2 \s+ are ASCII-only — without it Python splits
    # on NBSP/U+2028 etc. and the two engines disagree on web text
    ws_re = re.compile(r"\s+", re.ASCII)

    def run(batches):
        import pandas as pd

        ms = [(m, m.replace(" ", "")) for m in bc.value]
        for pdf in batches:
            ids, nw, ns = [], [], []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                words = [w for w in ws_re.split(str(text or "")) if w]
                total = 0
                for w in words:
                    enc = " ".join(w)
                    for m, ab in ms:
                        if m in enc:
                            enc = enc.replace(m, ab)
                    total += len(enc.split(" "))
                ids.append(did)
                nw.append(len(words))
                ns.append(total)
            yield pd.DataFrame(
                {id_col: ids, "n_words": nw, "n_bpe_tokens": ns}
            )

    return docs.select(id_col, text_col).mapInPandas(run, schema=out_schema)


def bpe_vocab(merges: list, spark) -> DataFrame:
    """Tokenizer artifact export: the learned merge vocabulary as a
    (rank, token, pair) table — rank is 1-based application order,
    token the concatenated pair. Joinable against token-frequency
    tables and replayable by the SQL oracle (each rank is exactly the
    pair the training argmax picked that round)."""
    rows = [(i + 1, m.replace(" ", ""), m) for i, m in enumerate(merges)]
    return spark.createDataFrame(rows, "rank int, token string, pair string")
