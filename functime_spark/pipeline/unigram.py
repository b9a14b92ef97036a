"""In-engine unigram-LM (SentencePiece-style) subword tokenizer —
the second canonical tokenizer family next to BPE (bpe.py), after
Kudo 2018 ("Subword Regularization", the SentencePiece unigram
model): seed a piece vocabulary from substring counts, run hard-EM
(Viterbi) rounds over the corpus word table, prune to a target
vocabulary, tokenize by per-word Viterbi segmentation.

Scale design (the bpe.py discipline, distributed one step further):

- ``fit_unigram``: ONE shuffle builds the word-frequency table (the
  same bounded top-``max_words`` table BPE trains on — unigram
  training rides word frequencies, not the raw corpus). Seed counts
  are a pure expression explode + ONE hash aggregate, with only the
  O(seed_size + alphabet) winners collected (one union action). The
  hard-EM rounds then run driver-side over the collected word table
  (r11): it is bounded at ``max_words`` rows by construction, so the
  per-round Viterbi re-segmentation is local work on a small table —
  the corpus itself is only ever touched by the single word-count
  shuffle, regardless of em_rounds.
- ``unigram_tokenize``: map-only — per-doc Viterbi with the broadcast
  piece table, memoized per distinct word within each Arrow batch.

Determinism / oracle discipline: the Viterbi DP maximizes the
PRODUCT of piece probabilities (not the log-sum) precisely so every
comparison both engines make is built from the same IEEE-754
multiply/divide sequence — libm ``ln`` is not correctly rounded and
a ULP flip could change an argmax, but x*y and x/y are exact
operations with bit-identical results in numpy and DuckDB. Ties
(including products that underflow to 0.0 on pathological >300-char
words) break deterministically toward the SHORTEST candidate piece
(the DP scans lengths ascending with a strict ``>`` update; the SQL
replay's ``ORDER BY score DESC, l ASC`` picks the same winner).
Smoothing keeps every piece alive through EM: p = (c + alpha) /
(T + alpha*V) with integer c, T — the same expression both engines
evaluate on the same integers.

Reference parity: the reference repo has no subword tokenizer; this
module exists for the token-budget curation tier (pack_shards,
quality_tiers) and follows Kudo 2018 with hard-EM instead of
forward-backward EM (the E-step marginals differ, the API and the
prune-to-vocab contract don't).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from functime_spark.compat import broadcast_value

UNK_P = 1e-12  # floor prob for characters never seen at fit time


def _word_counts(
    docs: DataFrame, text_col: str, max_words: int, max_word_len: int
) -> DataFrame:
    """Bounded (word, cnt) training table: length-capped words by
    (cnt DESC, word ASC). The length cap drops URL/garbage outliers
    from TRAINING only (the tokenizer still segments them at
    inference); it is also what keeps the oracle's unrolled DP
    finite."""
    toks = F.filter(F.split(F.col(text_col), r"\s+"), lambda x: x != "")
    return (
        docs.select(F.explode(toks).alias("word"))
        .filter(F.length("word") <= max_word_len)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("word"))
        .limit(max_words)
    )


def _seed_counts(words: DataFrame, max_piece_len: int) -> DataFrame:
    """(tok, c) substring counts weighted by word frequency — every
    substring of length 1..max_piece_len of every training word, as
    ONE expression explode + ONE aggregate (no Python on the path)."""
    subs = F.flatten(
        F.transform(
            F.sequence(F.lit(0), F.length("word") - 1),
            lambda i: F.transform(
                F.sequence(
                    F.lit(1),
                    F.least(F.lit(max_piece_len), F.length("word") - i),
                ),
                lambda l: F.substring(F.col("word"), i + 1, l),
            ),
        )
    )
    return (
        words.select(F.explode(subs).alias("tok"), F.col("cnt"))
        .groupBy("tok")
        .agg(F.sum("cnt").alias("c"))
    )


def _smooth(counts: dict, vocab: list, alpha: float) -> dict:
    """p = (c + alpha) / (T + alpha*V) on exact integers — the same
    arithmetic the SQL replay performs."""
    total = sum(counts.get(t, 0) for t in vocab)
    denom = total + alpha * len(vocab)
    return {t: (counts.get(t, 0) + alpha) / denom for t in vocab}


def viterbi_pieces(
    word: str, probs: dict, max_piece_len: int, p_unk: float = UNK_P
) -> list:
    """Best segmentation of one word under piece probs (product
    space). Unknown single characters cost ``p_unk`` so any string
    segments. Ties break to the shortest piece (strict > update,
    lengths ascending)."""
    n = len(word)
    best = [0.0] * (n + 1)
    back = [0] * (n + 1)
    best[0] = 1.0
    for j in range(1, n + 1):
        bs, bl = -1.0, 1
        for l in range(1, min(max_piece_len, j) + 1):
            piece = word[j - l : j]
            p = probs.get(piece)
            if p is None:
                if l != 1:
                    continue
                p = p_unk
            cand = best[j - l] * p
            if cand > bs:
                bs, bl = cand, l
        best[j] = bs if bs > 0.0 else 0.0
        back[j] = bl
    pieces = []
    j = n
    while j > 0:
        pieces.append(word[j - back[j] : j])
        j -= back[j]
    pieces.reverse()
    return pieces


def fit_unigram(
    docs: DataFrame,
    vocab_size: int = 4096,
    max_piece_len: int = 4,
    em_rounds: int = 2,
    seed_size: int = 20_000,
    max_words: int = 50_000,
    max_word_len: int = 16,
    alpha: float = 0.1,
    text_col: str = "text",
) -> list:
    """Train a unigram-LM piece vocabulary; returns ``[(token, p),
    ...]`` sorted by (p DESC, token ASC) — the artifact
    ``unigram_tokenize`` and ``unigram_vocab`` consume.

    Seed = ALL single characters of the training words (coverage
    guarantee) + the top ``seed_size`` multi-char substrings by
    (count DESC, token ASC). Each EM round re-scores pieces by their
    hard-EM (Viterbi-path) expected counts; the final prune keeps
    single chars plus the best multi-char pieces up to
    ``vocab_size``, then re-smooths on the kept set."""
    from functime_spark.materialize import materialize

    words = materialize(
        _word_counts(docs, text_col, max_words, max_word_len)
    )
    # seed selection happens IN SPARK (TakeOrdered top-k + the tiny
    # single-char slice) — the raw substring count table can be
    # millions of rows on a real word table and must never reach the
    # driver; only O(seed_size + alphabet) rows do. r11: the two
    # slices collect as ONE union action (the substring aggregate's
    # exchange is reused across both branches) instead of a
    # materialize + two collects — per-action overhead dominated the
    # fit at bench scale.
    seeds = _seed_counts(words, max_piece_len)
    seed_rows = (
        seeds.filter(F.length("tok") == 1)
        .unionAll(
            seeds.filter(F.length("tok") > 1)
            .orderBy(F.desc("c"), F.asc("tok"))
            .limit(seed_size)
        )
        .collect()
    )
    singles = {
        r["tok"]: int(r["c"]) for r in seed_rows if len(r["tok"]) == 1
    }
    multis = [
        (r["tok"], int(r["c"])) for r in seed_rows if len(r["tok"]) > 1
    ]
    vocab = sorted(singles) + sorted(t for t, _ in multis)
    if not vocab:  # empty/whitespace-only corpus: no pieces to learn
        return []
    counts = dict(singles)
    counts.update(dict(multis))
    probs = _smooth(counts, vocab, alpha)

    # r11: the hard-EM rounds run DRIVER-SIDE over the collected word
    # table — it is bounded at max_words rows by construction (the
    # whole point of training on word frequencies, not the corpus), so
    # per-round Viterbi is O(max_words * max_word_len * max_piece_len)
    # local work with the identical arithmetic the distributed E-step
    # ran (same viterbi_pieces kernel, same integer M-step sums —
    # summation of integers is order-free). The previous shape paid a
    # mapInPandas + shuffle + collect Spark action per round to
    # re-segment a table that already fits in one hand.
    word_rows = [(str(r["word"]), int(r["cnt"])) for r in words.collect()]
    for _ in range(em_rounds):
        new_counts: dict = {}
        for w, cnt in word_rows:
            for piece in viterbi_pieces(w, probs, max_piece_len):
                new_counts[piece] = new_counts.get(piece, 0) + cnt
        counts = new_counts
        probs = _smooth(counts, vocab, alpha)

    # prune: singles always kept; multis by (p DESC, tok ASC) — p is
    # monotone in the count, so this is the (c DESC, tok ASC) order
    n_multi = max(0, vocab_size - len(singles))
    kept_multi = sorted(
        (t for t in vocab if len(t) > 1),
        key=lambda t: (-probs[t], t),
    )[:n_multi]
    kept = sorted(singles) + sorted(kept_multi)
    final = _smooth(counts, kept, alpha)
    return sorted(final.items(), key=lambda kv: (-kv[1], kv[0]))


def unigram_vocab(pieces: list, spark) -> DataFrame:
    """Tokenizer artifact export: (rank, token, p) — rank 1-based in
    (p DESC, token ASC) order, the exact order fit_unigram returns."""
    rows = [(i + 1, t, float(p)) for i, (t, p) in enumerate(pieces)]
    return spark.createDataFrame(rows, "rank int, token string, p double")


def unigram_tokenize(
    docs: DataFrame,
    pieces: list,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_piece_len: int = None,
) -> DataFrame:
    """(id, n_words, n_unigram_tokens, tokens_per_word): exact subword
    counts under the fitted vocabulary — map-only, piece table
    broadcast, per-word Viterbi memoized within each Arrow batch.
    ``tokens_per_word`` (fertility) is the quality_tiers composition
    hook: high-fertility docs segment badly under the corpus
    tokenizer (boilerplate, mojibake, foreign scripts) and
    ``quality_tiers(out, score_col='tokens_per_word')`` buckets them
    directly. NULL text counts as (0, 0, NULL) like the oracle's
    LEFT JOIN/COALESCE."""
    import re

    if max_piece_len is None:
        max_piece_len = max((len(t) for t, _ in pieces), default=1)
    id_field = docs.select(id_col).schema.fields[0]
    out_schema = (
        f"{id_field.name} {id_field.dataType.simpleString()}, "
        "n_words bigint, n_unigram_tokens bigint, tokens_per_word double"
    )
    bc = broadcast_value(
        docs.sparkSession, (dict(pieces), int(max_piece_len))
    )
    # re.ASCII: match the JVM-side \s+ used everywhere else (bpe.py)
    ws_re = re.compile(r"\s+", re.ASCII)

    def run(batches):
        import pandas as pd

        pr, mpl = bc.value
        memo: dict = {}
        for pdf in batches:
            ids, nw, nt, tpw = [], [], [], []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                words = [w for w in ws_re.split(str(text or "")) if w]
                total = 0
                for w in words:
                    n = memo.get(w)
                    if n is None:
                        n = len(viterbi_pieces(w, pr, mpl))
                        memo[w] = n
                    total += n
                ids.append(did)
                nw.append(len(words))
                nt.append(total)
                tpw.append(total / len(words) if words else None)
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "n_words": nw,
                    "n_unigram_tokens": nt,
                    "tokens_per_word": tpw,
                }
            )

    return docs.select(id_col, text_col).mapInPandas(run, schema=out_schema)
