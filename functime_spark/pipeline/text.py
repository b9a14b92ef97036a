"""Text analysis operators: language-ID, quality scoring, token
counting, document fingerprinting. All pure Column expressions —
whole-stage codegen over the corpus, no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: minimal stopword lexicons for the n-gram/stopword-hit language
#: heuristic (top function words per language)
LANG_LEXICONS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it", "that", "for"],
    "de": ["der", "die", "das", "und", "ist", "ein", "eine", "zu", "den", "von"],
    "fr": ["le", "la", "les", "et", "un", "une", "est", "de", "du", "que"],
    "es": ["el", "la", "los", "las", "y", "un", "una", "es", "de", "que"],
    "it": ["il", "la", "di", "e", "che", "un", "una", "per", "non", "sono"],
    "pt": ["o", "a", "de", "e", "que", "um", "uma", "para", "com", "os"],
    "nl": ["de", "het", "een", "en", "van", "ik", "te", "dat", "die", "niet"],
    "ru": ["и", "в", "не", "на", "я", "что", "он", "с", "как", "это"],
    "zh": ["的", "是", "了", "在", "我", "有", "和", "就", "不", "人"],
}


def tokens(text_col) -> F.Column:
    return F.split(text_col, r"\s+")


def language_id(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    keep_cols: tuple = (),
) -> DataFrame:
    """Stopword-hit language scoring: per language, the fraction of
    tokens found in its lexicon; predicted = argmax (ties break by
    language code order). ``keep_cols`` carries extra columns through
    (e.g. a declared-language column for confusion reporting)."""
    toks = tokens(F.col(text_col))
    out = docs.select(F.col(id_col), *keep_cols, toks.alias("__toks"))
    scores = {}
    for lang, lex in LANG_LEXICONS.items():
        lex_arr = F.array(*[F.lit(w) for w in lex])
        hits = F.size(F.filter("__toks", lambda t: F.array_contains(lex_arr, t)))
        scores[lang] = (hits / F.size("__toks")).alias(f"score_{lang}")
    out = out.select(id_col, *keep_cols, *scores.values())
    best = None
    best_lang = F.lit("und")
    for lang in sorted(LANG_LEXICONS):
        s = F.col(f"score_{lang}")
        if best is None:
            best, best_lang = s, F.when(s > 0, F.lit(lang)).otherwise(F.lit("und"))
        else:
            best_lang = F.when(s > best, F.lit(lang)).otherwise(best_lang)
            best = F.greatest(s, best)
    return out.withColumn("pred_lang", best_lang)


def lang_confusion(
    docs: DataFrame,
    declared_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Declared-vs-detected language agreement matrix: (declared,
    predicted, n_docs, frac_of_lang) — the standard crawl-metadata
    health check (mislabeled-language shards poison per-lang mixture
    weights and lexicon-trained filters).

    One language_id projection + one hash aggregate; the row-share
    window runs on the (n_langs x n_langs)-bounded count frame, never
    the corpus."""
    from pyspark.sql import Window

    pred = language_id(docs, text_col, id_col, keep_cols=(declared_col,))
    cnt = pred.groupBy(declared_col, "pred_lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    w = Window.partitionBy(declared_col)
    return cnt.withColumn(
        "frac_of_lang", F.col("n_docs") / F.sum("n_docs").over(w)
    )


def quality_scores(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Heuristic quality features: lengths, ratios, repetition.

    The standard pre-training quality-filter signals (length, symbol
    ratios, stopword density, type-token ratio)."""
    t = F.col(text_col)
    toks = tokens(t)
    n_chars = F.length(t)
    n_words = F.size(toks)
    n_uniq = F.size(F.array_distinct(toks))
    en_lex = F.array(*[F.lit(w) for w in LANG_LEXICONS["en"]])
    stop_hits = F.size(F.filter(toks, lambda x: F.array_contains(en_lex, x)))
    punct = n_chars - F.length(F.regexp_replace(t, r"[^\w\s]", ""))
    digits = n_chars - F.length(F.regexp_replace(t, r"[0-9]", ""))
    return docs.select(
        F.col(id_col),
        n_chars.cast("long").alias("n_chars"),
        n_words.cast("long").alias("n_words"),
        (n_chars / n_words).alias("mean_word_len"),
        (n_uniq / n_words).alias("type_token_ratio"),
        (stop_hits / n_words).alias("stopword_ratio"),
        (punct / n_chars).alias("punct_ratio"),
        (digits / n_chars).alias("digit_ratio"),
    )


def token_counts(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Whitespace tokens + a BPE-ish subword estimate.

    The subword count splits on whitespace, punctuation boundaries,
    and ~4-char chunks — a deterministic stand-in for a real BPE
    vocab (the usual chars/4 heuristic, exact per document)."""
    t = F.col(text_col)
    ws = F.size(tokens(t))
    pieces = F.size(
        F.filter(
            F.split(t, r"(\s+|(?=[^\w\s])|(?<=[^\w\s]))"), lambda x: F.length(x) > 0
        )
    )
    subword_est = F.aggregate(
        tokens(t),
        F.lit(0).cast("long"),
        lambda acc, w: acc + F.ceil(F.length(w) / F.lit(4.0)).cast("long"),
    )
    return docs.select(
        F.col(id_col),
        ws.cast("long").alias("n_whitespace_tokens"),
        pieces.cast("long").alias("n_punct_split_tokens"),
        subword_est.alias("n_subword_est"),
    )


def fingerprint(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 16,
) -> DataFrame:
    """Winnowing-style document fingerprint: min/max of the rolling
    hash over all `window`-char substrings (order-robust identity for
    near-exact matching).

    The hash is a polynomial codepoint fold mod 2^31-1 — pure native
    arithmetic (whole-stage codegen, engine-portable, value-verified
    against a DuckDB replay). 31 bits of space is ample for winnowing
    identity; swap in xxhash64 if a larger space is ever needed."""

    P = 2147483647
    Bw = pow(131, window, P)  # 131^w mod p, precomputed driver-side

    def codepoints(scol):
        return F.transform(
            F.filter(F.split(scol, ""), lambda ch: ch != F.lit("")),
            lambda ch: F.ascii(ch).cast("long"),
        )

    t = F.col(text_col)
    # materialize the codepoint array ONCE per row: referencing the
    # raw codepoints(t) expression inside the aggregate lambda would
    # re-run split+filter+transform for every element_at probe (O(n^2))
    docs = docs.withColumn("__codes", codepoints(t))
    codes = F.col("__codes")
    n = F.size(codes)
    # O(n) rolling recurrence (was O(n*w): re-hashing every substring):
    # H after char i = hash of the last min(i, w) chars;
    #   H' = pmod(H*131 + c_i - [i > w] * c_{i-w} * 131^w, p).
    # The window hashes are H at i in [w, n] (or i = n for short docs);
    # only their running min/max is carried — O(1) state, no array
    # build-up. Values are bit-identical to the per-substring fold (each
    # step is a residue mod p), so the DuckDB oracle replay still
    # matches. |H*131 + c - c*Bw| < 2^62 — no long overflow.
    idx = F.sequence(F.lit(1), F.greatest(n, F.lit(1)))
    init = F.struct(
        F.lit(0).cast("long").alias("h"),
        F.lit(None).cast("long").alias("mn"),
        F.lit(None).cast("long").alias("mx"),
    )

    def step(acc, i):
        c_in = F.coalesce(F.element_at(codes, i), F.lit(0).cast("long"))
        c_out = F.when(
            i > window, F.element_at(codes, (i - window).cast("int")) * F.lit(Bw)
        ).otherwise(F.lit(0).cast("long"))
        h = F.pmod(acc["h"] * 131 + c_in - c_out, F.lit(P))
        active = i >= F.least(F.lit(window), n)
        return F.struct(
            h.alias("h"),
            F.when(active, F.least(acc["mn"], h)).otherwise(acc["mn"]).alias("mn"),
            F.when(active, F.greatest(acc["mx"], h)).otherwise(acc["mx"]).alias("mx"),
        )

    full = F.aggregate(
        codes, F.lit(0).cast("long"), lambda acc, x: (acc * 131 + x) % F.lit(P)
    )
    # one column per aggregate: struct-field access re-evaluates its
    # base expression, so reading mn/mx straight off F.aggregate(...)
    # would run the whole scan once per field
    docs = docs.withColumn("__rolled", F.aggregate(idx, init, step))
    return docs.select(
        F.col(id_col),
        F.coalesce(F.col("__rolled.mn"), F.lit(0).cast("long")).alias("fp_min"),
        F.coalesce(F.col("__rolled.mx"), F.lit(0).cast("long")).alias("fp_max"),
        full.alias("fp_full"),
    )


#: Gopher quality-rule thresholds (Rae et al. 2021, "Scaling Language
#: Models: ... Gopher", table A1 — the standard pre-training document
#: filter). (min, max) or single-sided bounds.
GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_quality_filter(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 50,
    max_words: int = 100_000,
    min_stopword_hits: int = 2,
) -> DataFrame:
    """Per-document Gopher quality metrics + rule verdicts + overall
    `passes` flag. Defaults are the Rae et al. 2021 thresholds; the
    word-count window and the stopword floor are the knobs real
    pipelines tune per corpus (short-form or non-English slices fail
    the English-stopword rule wholesale), so those three are
    parameters — every other rule is fixed.

    Scale design: EVERY signal — including the within-doc repetition
    fractions — is a pure Column expression: whole-stage codegen, ZERO
    shuffle, and therefore directly usable on a stream. The duplicate-
    line identities make the explode+groupBy formulation unnecessary:
    over a doc's line multiset, sum(cnt) = n_lines and
    sum(cnt - 1) = n_lines - n_distinct, so
    dup_line_frac = (n - distinct) / n and
    dup_line_char_frac = (total_chars - distinct_chars) / total_chars
    with distinct taken via array_distinct — value-identical to the
    per-(doc, line) count aggregate (the oracle still replays the
    count form).
    """
    t = F.col(text_col)
    toks = F.filter(tokens(t), lambda x: x != F.lit(""))
    n_words = F.size(toks)
    n_chars = F.length(t)
    mean_word_len = (
        F.aggregate(toks, F.lit(0.0), lambda acc, x: acc + F.length(x)) / n_words
    )
    # symbols: '#' occurrences + '...' occurrences (ellipsis)
    n_hash = n_chars - F.length(F.regexp_replace(t, r"#", ""))
    n_ellipsis = (n_chars - F.length(F.regexp_replace(t, r"\.\.\.", ""))) / 3
    symbol_to_word = (n_hash + n_ellipsis) / n_words
    lines = F.split(t, r"\n")
    n_lines = F.size(lines)
    bullet_frac = (
        F.size(F.filter(lines, lambda l: F.trim(l).rlike(r"^[-*•]")))
        / n_lines
    )
    ellipsis_frac = (
        F.size(F.filter(lines, lambda l: F.rtrim(l).rlike(r"\.\.\.$"))) / n_lines
    )
    alpha_frac = (
        F.size(F.filter(toks, lambda x: x.rlike(r"[A-Za-z]"))) / n_words
    )
    stops = F.array(*[F.lit(w) for w in GOPHER_STOPWORDS])
    stop_hits = F.size(
        F.filter(stops, lambda s: F.array_contains(toks, s))
    )
    # repetition, row-locally: over the doc's line multiset,
    # sum(cnt) == n and sum(cnt - 1) == n - n_distinct, so the CCNet
    # count-aggregate fractions collapse to array_distinct identities
    def _sum_len(arr):
        return F.aggregate(arr, F.lit(0).cast("long"), lambda a, x: a + F.length(x))

    dlines = F.array_distinct(lines)
    # NULL text: size(split(NULL)) is -1 (legacy sizeOfNull), which
    # would alchemize into -0.0; the count-aggregate form (and the
    # oracle) yields NULL for such rows — keep that contract
    dup_line = F.when(
        t.isNotNull(), (n_lines - F.size(dlines)).cast("double") / n_lines
    )
    total_ch = _sum_len(lines)
    dup_char = F.when(
        t.isNotNull(), (total_ch - _sum_len(dlines)).cast("double") / total_ch
    )
    out = docs.select(
        F.col(id_col),
        n_words.cast("long").alias("n_words"),
        mean_word_len.alias("mean_word_len"),
        symbol_to_word.alias("symbol_to_word"),
        bullet_frac.alias("bullet_line_frac"),
        ellipsis_frac.alias("ellipsis_line_frac"),
        alpha_frac.alias("alpha_word_frac"),
        stop_hits.cast("int").alias("stopword_hits"),
        dup_line.alias("dup_line_frac"),
        dup_char.alias("dup_line_char_frac"),
    )
    passes = (
        F.col("n_words").between(int(min_words), int(max_words))
        & F.col("mean_word_len").between(3.0, 10.0)
        & (F.col("symbol_to_word") <= 0.1)
        & (F.col("bullet_line_frac") <= 0.9)
        & (F.col("ellipsis_line_frac") <= 0.3)
        & (F.col("alpha_word_frac") >= 0.8)
        & (F.col("stopword_hits") >= int(min_stopword_hits))
        & (F.col("dup_line_frac") <= 0.3)
        & (F.col("dup_line_char_frac") <= 0.2)
    )
    return out.withColumn("passes", passes)


#: PII detector patterns. Deliberately restricted to the regex subset
#: shared by Java regex (Spark) and RE2 (DuckDB/Go scanners): no
#: lookaround, no backreferences — so the same patterns run identically
#: in the engine and in downstream audit tooling. Word boundaries (\b)
#: are in both dialects.
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\+?\d{3}[-. ]\d{3}[-. ]\d{4}\b",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
    "credit_card": r"\b\d{4}[- ]\d{4}[- ]\d{4}[- ]\d{4}\b",
    "iban": r"\b[A-Z]{2}\d{2}[A-Z0-9]{11,30}\b",
}

#: redaction application order: most-specific first so an SSN is not
#: half-eaten by the phone pattern (the shapes are disjoint, but a
#: fixed order keeps redaction deterministic regardless)
_PII_REDACT_ORDER = ["email", "iban", "credit_card", "ssn", "phone", "ipv4"]


def pii_scan(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    redact: bool = False,
) -> DataFrame:
    """Per-document PII signal counts (emails, phone numbers, IPv4
    addresses, SSN-style ids) + a `has_pii` flag; optionally a
    `redacted` text column with each match replaced by a typed tag.

    The standard pre-training scrub pass (C4/Dolma-style regex PII
    sweep). Everything is `regexp_extract_all`/`regexp_replace` Column
    expressions — whole-stage codegen, zero shuffle, embarrassingly
    parallel over the corpus at any scale."""
    t = F.col(text_col)
    counts = {
        name: F.size(F.regexp_extract_all(t, F.lit(pat), F.lit(0)))
        for name, pat in PII_PATTERNS.items()
    }
    cols = [F.col(id_col)] + [
        counts[n].cast("long").alias(f"n_{n}") for n in PII_PATTERNS
    ]
    total = None
    for n in PII_PATTERNS:
        total = counts[n] if total is None else total + counts[n]
    cols.append((total > 0).cast("int").alias("has_pii"))
    if redact:
        red = t
        for name in _PII_REDACT_ORDER:
            red = F.regexp_replace(red, PII_PATTERNS[name], f"<{name.upper()}>")
        cols.append(red.alias("redacted"))
    return docs.select(*cols)


def ngram_repetition(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_ns: tuple = (2, 3, 4),
    dup_ns: tuple = (5,),
) -> DataFrame:
    """Gopher repetition signals (Rae et al. 2021 table A1): per doc,
    for n in `top_ns` the fraction of text characters covered by the
    single most-repeated word n-gram (count x len(ngram) / len(text)),
    and for n in `dup_ns` the fraction of n-gram characters belonging
    to n-grams that occur more than once (sum over dup n-grams of
    count x len / sum over all n-grams of count x len).

    Scale design: ZERO shuffle — the signals are within-document
    facts, so instead of exploding the corpus gram stream into a
    per-(doc, n, gram) count aggregate (a shuffle of ~|ns| x total
    token volume), each row sorts its OWN gram array and folds a
    run-length pass over it (F.aggregate with a finish lambda flushing
    the final run). max/sum over runs of count x len equal the grouped
    counts exactly, so the DuckDB oracle still replays the count
    formulation and value-matches. Docs with fewer than n words yield
    NULL signals for that n, as before. Map-only => stream-legal.
    """
    ns = sorted(set(top_ns) | set(dup_ns))
    t = F.col(text_col)
    toks = F.filter(tokens(t), lambda x: x != F.lit(""))
    base = docs.select(
        F.col(id_col), F.length(t).alias("__nchars"), toks.alias("__toks")
    )

    def run_stats(n):
        # sorted non-distinct gram list for this n (empty when the doc
        # is shorter than n words — sequence(1, 0) would descend)
        garr = F.when(
            F.size("__toks") >= n,
            F.array_sort(
                F.transform(
                    F.sequence(F.lit(1), F.size("__toks") - (n - 1)),
                    lambda i: F.array_join(F.slice("__toks", i, n), " "),
                )
            ),
        ).otherwise(F.array().cast("array<string>"))
        init = F.struct(
            F.lit(None).cast("string").alias("prev"),
            F.lit(0).cast("long").alias("cnt"),
            F.lit(0).cast("long").alias("top"),
            F.lit(0).cast("long").alias("dup"),
            F.lit(0).cast("long").alias("tot"),
        )

        def step(acc, g):
            same = acc["prev"].isNotNull() & (g == acc["prev"])
            run = acc["cnt"] * F.length(acc["prev"]).cast("long")
            flush = acc["prev"].isNotNull() & ~same
            return F.struct(
                g.alias("prev"),
                F.when(same, acc["cnt"] + 1)
                .otherwise(F.lit(1).cast("long"))
                .alias("cnt"),
                F.when(flush, F.greatest(acc["top"], run))
                .otherwise(acc["top"])
                .alias("top"),
                F.when(flush & (acc["cnt"] > 1), acc["dup"] + run)
                .otherwise(acc["dup"])
                .alias("dup"),
                F.when(flush, acc["tot"] + run).otherwise(acc["tot"]).alias("tot"),
            )

        def fin(acc):
            run = acc["cnt"] * F.length(acc["prev"]).cast("long")
            has = acc["prev"].isNotNull()
            return F.struct(
                F.when(has, F.greatest(acc["top"], run))
                .otherwise(acc["top"])
                .alias("top"),
                F.when(has & (acc["cnt"] > 1), acc["dup"] + run)
                .otherwise(acc["dup"])
                .alias("dup"),
                F.when(has, acc["tot"] + run).otherwise(acc["tot"]).alias("tot"),
            )

        return F.aggregate(garr, init, step, fin)

    # two-step select: the run-stats structs land as attributes first,
    # so the field reads below don't re-run the whole fold per field
    staged = base.select(
        F.col(id_col),
        F.col("__nchars"),
        *[run_stats(n).alias(f"__rs{n}") for n in ns],
    )
    out_cols = [F.col(id_col)]
    for n in top_ns:
        rs = F.col(f"__rs{n}")
        out_cols.append(
            F.when(rs["tot"] > 0, rs["top"] / F.col("__nchars")).alias(
                f"top_{n}gram_char_frac"
            )
        )
    for n in dup_ns:
        rs = F.col(f"__rs{n}")
        out_cols.append(
            F.when(rs["tot"] > 0, rs["dup"] / rs["tot"]).alias(
                f"dup_{n}gram_char_frac"
            )
        )
    return staged.select(*out_cols)


def ngram_diversity(
    docs: DataFrame,
    ns: tuple = (1, 2, 3),
    group_col: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """Corpus-level n-gram diversity per group: for each n, the count
    of distinct word n-grams over the total n-gram occurrences
    (distinct-n / total-n, the "distinct-n" diversity statistic).
    Low diversity at n=2/3 flags template-heavy, boilerplate, or
    model-generated slices that per-document repetition scores
    (`ngram_repetition` — within-doc only) cannot see.

    Unlike the within-doc signals this one genuinely needs the
    cross-doc gram stream: ONE explode of (n, gram) pairs feeding one
    aggregate — totals partial-aggregate map-side; the distinct count
    is Spark's standard two-phase distinct aggregate keyed on
    (group, n, gram). Grams build as zip_with over shifted slices of
    the per-row token array (O(doc_len), not O(grams x doc_len) —
    see dedup.shingles)."""
    words = F.filter(F.split(F.col(text_col), r"\s+"), lambda x: x != "")
    base = docs.select(F.col(group_col), words.alias("__w"))
    per_n = []
    for n in ns:
        m = F.greatest(F.size("__w") - (n - 1), F.lit(0))
        gram = F.slice("__w", 1, m)
        for k in range(1, n):
            gram = F.zip_with(
                gram,
                F.slice("__w", k + 1, m),
                lambda a, b: F.concat_ws(" ", a, b),
            )
        # one-arg lambda built by a factory: a default-arg closure
        # (lambda g, _n=n: ...) has arity 2, which F.transform reads
        # as the (element, index) variant and feeds the INDEX into _n
        def _tag(n_val):
            return lambda g: F.struct(
                F.lit(n_val).cast("int").alias("n"), g.alias("gram")
            )

        per_n.append(F.transform(gram, _tag(n)))
    exploded = base.select(
        group_col, F.explode(F.flatten(F.array(*per_n))).alias("__p")
    )
    return (
        exploded.groupBy(F.col(group_col), F.col("__p.n").alias("n"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("total_ngrams"),
            F.count_distinct(F.col("__p.gram")).cast("long").alias("distinct_ngrams"),
        )
        .withColumn(
            "diversity", F.col("distinct_ngrams") / F.col("total_ngrams")
        )
    )


#: domains a scrape pipeline would drop outright (placeholder list —
#: swap for a real blocklist asset at deploy time)
URL_BLOCKLIST = ["spam.example", "malware.test"]


def url_stats(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    blocklist: tuple | list | None = None,
) -> DataFrame:
    """Per-document URL signals: URL count, distinct-domain count,
    first domain, and a blocklisted-domain flag. Pure regexp Column
    expressions (codegen, zero shuffle) — the standard web-scrape
    routing signals (domain-level filtering/grouping)."""
    t = F.col(text_col)
    url_pat = r"https?://[A-Za-z0-9.-]+(/[^\s]*)?"
    dom_pat = r"https?://([A-Za-z0-9.-]+)"
    urls = F.regexp_extract_all(t, F.lit(url_pat), F.lit(0))
    domains = F.regexp_extract_all(t, F.lit(dom_pat), F.lit(1))
    blocked = F.array(
        *[F.lit(d) for d in (URL_BLOCKLIST if blocklist is None else blocklist)]
    )
    return docs.select(
        F.col(id_col),
        F.size(urls).cast("long").alias("n_urls"),
        F.size(F.array_distinct(domains)).cast("long").alias("n_domains"),
        F.when(F.size(domains) > 0, F.element_at(domains, 1)).alias("first_domain"),
        (
            F.size(F.filter(domains, lambda d: F.array_contains(blocked, d))) > 0
        ).cast("int").alias("has_blocked_domain"),
    )


def readability_scores(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Flesch reading-ease + Flesch-Kincaid grade per document.

    Syllables approximate as vowel-run count ([aeiouy]+ in the
    lowercased text — runs never span whitespace, so the total equals
    the per-word sum); sentences as terminal-punctuation runs
    (floored at 1). Three regexp_count expressions — whole-stage
    codegen, zero shuffle, and the exact same regexes replay in the
    oracle."""
    t = F.col(text_col)
    words = F.size(F.filter(F.split(t, r"\s+"), lambda x: x != ""))
    syllables = F.regexp_count(F.lower(t), F.lit(r"[aeiouy]+"))
    sentences = F.greatest(F.regexp_count(t, F.lit(r"[.!?]+")), F.lit(1))
    wps = words / sentences
    spw = syllables / words
    return docs.select(
        F.col(id_col),
        words.cast("long").alias("n_words"),
        sentences.cast("long").alias("n_sentences"),
        syllables.cast("long").alias("n_syllables"),
        (F.lit(206.835) - F.lit(1.015) * wps - F.lit(84.6) * spw).alias(
            "flesch_reading_ease"
        ),
        (F.lit(0.39) * wps + F.lit(11.8) * spw - F.lit(15.59)).alias(
            "fk_grade"
        ),
    )


#: (pattern, replacement) regexp chain shared verbatim by
#: normalize_text and its DuckDB oracle. All patterns are valid in
#: both Java regex and RE2. Order matters only for the control-char
#: strip (first).
NORMALIZE_RULES = (
    # CRLF / lone CR -> LF first so later rules see one newline form
    ("\r\n?", "\n"),
    # C0 controls except \t\n, plus DEL (\t folds into the
    # horizontal-whitespace collapse later)
    ("[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]", ""),
    # typographic punctuation -> ASCII
    ("[\u2018\u2019\u201a\u2032]", "'"),
    ("[\u201c\u201d\u201e\u2033]", '"'),
    ("[\u2010\u2011\u2012\u2013\u2014\u2015\u2212]", "-"),
    ("\u2026", "..."),
    # unicode space separators -> ASCII space
    ("[\u00a0\u1680\u2000-\u200a\u202f\u205f\u3000]", " "),
    # zero-width chars and BOM: drop
    ("[\u200b\u200c\u200d\ufeff]", ""),
    # collapse HORIZONTAL whitespace runs; newlines survive (line
    # structure feeds the line-level filters, e.g. c4_quality_filter)
    ("[^\\S\n]+", " "),
    # strip spaces hugging a newline, cap blank runs at one blank line
    (" ?\n ?", "\n"),
    ("\n{3,}", "\n\n"),
    # trim leading/trailing whitespace of the whole document
    ("^\\s+|\\s+$", ""),
)


def normalize_text(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lowercase: bool = False,
) -> DataFrame:
    """Pre-hash text normalization (the CCNet/RefinedWeb cleanup that
    runs before any dedup signature): strip C0/C1 control characters,
    fold typographic unicode punctuation to ASCII (curly quotes,
    en/em dashes, ellipsis, NBSP), collapse whitespace runs to a
    single space, and trim. Optional lowercasing for the dedup-key
    variant.

    Pure regexp_replace/replace Column chain — whole-stage codegen,
    zero shuffle, and every pattern is RE2-compatible so the exact
    chain replays in the DuckDB oracle. Emits the normalized text
    plus the char-delta so attrition is auditable.
    """
    t = F.col(text_col)
    # C0 controls except \t\n\r, plus DEL. (\t\n\r are folded by the
    # whitespace collapse below, so ordering is not observable.)
    for pat, rep in NORMALIZE_RULES:
        t = F.regexp_replace(t, pat, rep)
    if lowercase:
        t = F.lower(t)
    return docs.select(
        F.col(id_col),
        t.alias("text_norm"),
        (F.length(F.col(text_col)) - F.length(t)).cast("long").alias(
            "chars_removed"
        ),
    )


def c4_quality_filter(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words_per_line: int = 5,
    min_kept_lines: int = 3,
) -> DataFrame:
    """C4-style line/document filter (Raffel et al. 2020 §2.2): keep
    only lines that end in terminal punctuation, have >= 5 words, and
    do not mention javascript/cookies/privacy-policy boilerplate;
    drop whole documents that contain "lorem ipsum" or a curly brace,
    or retain fewer than 3 lines. Returns per-doc signals, the keep
    verdict, and the re-joined cleaned text.

    All array/lambda Column expressions over a line split — one
    codegen stage, no shuffle, no Python. The identical lambda chain
    replays in DuckDB via list_filter/list_transform.
    """
    lines = F.split(F.col(text_col), "\n")
    line_ok = lambda x: (
        x.rlike("[.!?\"']$")
        & (F.size(F.filter(F.split(x, " "), lambda w: w != ""))
           >= min_words_per_line)
        & ~F.lower(x).contains("javascript")
        & ~F.lower(x).contains("cookie")
        & ~F.lower(x).contains("privacy policy")
    )
    kept = F.filter(lines, line_ok)
    low = F.lower(F.col(text_col))
    has_lorem = low.contains("lorem ipsum")
    has_brace = F.col(text_col).contains("{")
    n_kept = F.size(kept)
    keep = (~has_lorem) & (~has_brace) & (n_kept >= min_kept_lines)
    return docs.select(
        F.col(id_col),
        F.size(lines).cast("long").alias("n_lines"),
        n_kept.cast("long").alias("n_kept_lines"),
        has_lorem.alias("has_lorem"),
        has_brace.alias("has_brace"),
        keep.alias("keep"),
        F.array_join(kept, "\n").alias("text_clean"),
    )


#: query parameters stripped by canonicalize_urls (tracking junk that
#: makes otherwise-identical crawl URLs distinct)
TRACKING_PARAMS = (
    "utm_source", "utm_medium", "utm_campaign", "utm_term",
    "utm_content", "fbclid", "gclid", "msclkid", "ref", "mc_cid",
    "mc_eid",
)


def canonicalize_urls(
    df: DataFrame,
    url_col: str = "url",
    out_col: str = "url_canon",
    tracking_params: tuple | list | None = None,
) -> DataFrame:
    """Crawl-URL canonicalization (the key for URL-level dedup before
    any content hashing): lowercase scheme+host, drop default ports
    (:80/:443), drop the fragment, strip tracking query params
    (TRACKING_PARAMS), sort the surviving params, and trim a trailing
    slash off the path. Everything is split/filter/array_sort/concat
    Column algebra — codegen only, no UDF, and the identical list
    pipeline replays in DuckDB.
    """
    u = F.col(url_col)
    no_frag = F.split(u, "#")[0]
    scheme = F.lower(F.split(no_frag, "://")[0])
    # everything after the FIRST '://' / '?': crawl URLs routinely embed
    # other URLs in query params (?u=https://b.com) or a second '?', so
    # last-occurrence extraction (substring_index ..., -1) mis-splits
    rest = F.when(
        F.instr(no_frag, "://") > 0,
        F.substr(no_frag, F.instr(no_frag, "://") + F.lit(3)),
    ).otherwise(no_frag)
    hostpath = F.substring_index(rest, "?", 1)
    query = F.when(
        F.instr(rest, "?") > 0, F.substr(rest, F.instr(rest, "?") + F.lit(1))
    ).otherwise(F.lit(""))
    host = F.lower(F.split(hostpath, "/")[0])
    # default-port strip is scheme-aware: http://x:443 and https://x:80
    # are NOT on their default ports and must stay distinct
    host = (
        F.when(scheme == "http", F.regexp_replace(host, ":80$", ""))
        .when(scheme == "https", F.regexp_replace(host, ":443$", ""))
        .otherwise(host)
    )
    # path = '/' + everything after the first '/' of host[:port]/path,
    # derived from the already-computed hostpath Column (no re-split of
    # the raw column — and no f-string SQL that breaks on names needing
    # backtick quoting)
    path = F.when(
        F.instr(hostpath, "/") > 0,
        F.substr(hostpath, F.instr(hostpath, "/")),
    ).otherwise(F.lit(""))
    path = F.regexp_replace(path, "/$", "")
    tracking = F.array(
        *[
            F.lit(p)
            for p in (TRACKING_PARAMS if tracking_params is None else tracking_params)
        ]
    )
    params = F.filter(
        F.split(query, "&"),
        lambda kv: (kv != "")
        & ~F.array_contains(tracking, F.split(kv, "=")[0]),
    )
    qs = F.array_join(F.array_sort(params), "&")
    canon = F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(qs != "", F.concat(F.lit("?"), qs)).otherwise(F.lit("")),
    )
    return df.withColumn(out_col, canon)


def dedup_by_url(
    docs: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
) -> DataFrame:
    """URL-level exact dedup: canonicalize, keep the lowest-id doc per
    canonical URL. One hash shuffle on the canonical string — the
    cheapest dedup tier, run before any content-based pass."""
    from pyspark.sql import Window

    canon = canonicalize_urls(docs, url_col=url_col)
    w = Window.partitionBy("url_canon").orderBy(id_col)
    return (
        canon.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


#: scripts profiled by script_profile. Java regex needs the Is- prefix
#: for script properties; RE2 (the oracle) uses the bare name.
SCRIPTS = (
    "Latin", "Cyrillic", "Greek", "Arabic", "Han", "Hangul",
    "Hebrew", "Devanagari", "Thai", "Hiragana", "Katakana",
)


def script_profile(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document Unicode-script census: character counts per script
    (Latin/Cyrillic/Greek/Arabic/Han/Hangul), the non-whitespace
    total, and the dominant script (most chars; first in SCRIPTS
    order on ties, 'other' when nothing matches). One regexp_count
    per script — codegen only, no shuffle. The scale companion to
    language_id: script mix is the cheap first router for
    multilingual corpora."""
    t = F.col(text_col)
    counts = {
        s: F.regexp_count(t, F.lit(r"\p{Is%s}" % s)).cast("long")
        for s in SCRIPTS
    }
    total = F.regexp_count(t, F.lit(r"\S")).cast("long")
    # Two-stage projection: counts first, argmax over the materialized
    # columns second. A chained-when argmax over the raw regexp_count
    # expressions re-nests every count into the next branch — the
    # generated processNext() passes Java's 64 KB method limit and the
    # whole stage falls back to interpreted eval (observed on this
    # exact query). The array-struct max keeps each codegen method
    # small and guarantees each regexp evaluates exactly once.
    base = docs.select(
        F.col(id_col),
        *[counts[s].alias(f"n_{s.lower()}") for s in SCRIPTS],
        total.alias("n_nonspace"),
    )
    # max of (count, -index): equal counts pick the smaller index —
    # the same strictly-greater-keeps-first-of-ties rule as before
    pairs = F.array(
        *[
            F.struct(
                F.col(f"n_{s.lower()}").alias("n"),
                F.lit(-i).alias("ni"),
            )
            for i, s in enumerate(SCRIPTS)
        ]
    )
    mx = F.array_max(pairs)
    names = F.array(*[F.lit(s.lower()) for s in SCRIPTS])
    dom = F.when(
        mx["n"] > 0, F.element_at(names, -mx["ni"] + 1)
    ).otherwise(F.lit("other"))
    return base.withColumn("dominant_script", dom)


#: (pattern, replacement) chain for strip_html, applied in order.
#: RE2-compatible (no backreferences/lookarounds) so the identical
#: chain replays in the DuckDB oracle. Script/style blocks go first
#: (their text content is code, not prose), then comments, then tags,
#: then the common entities.
HTML_RULES = (
    (r"(?is)<script\b[^>]*>.*?</script>", " "),
    (r"(?is)<style\b[^>]*>.*?</style>", " "),
    (r"(?s)<!--.*?-->", " "),
    (r"(?s)<[^>]+>", " "),
    (r"&nbsp;", " "),
    (r"&lt;", "<"),
    (r"&gt;", ">"),
    (r"&quot;", "\""),
    (r"&#39;", "'"),
    # &amp; LAST, like every standard unescaper: running it earlier
    # double-unescapes text that legitimately contains '&amp;lt;'
    (r"&amp;", "&"),
    (r"\s+", " "),
)


def strip_html(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """HTML-to-text for crawl corpora: drop script/style blocks and
    comments, strip tags, unescape the common entities, collapse
    whitespace. A real extraction stack (trafilatura/jusText) does
    boilerplate removal too — this is the in-engine, zero-dependency
    tier that runs at full scan speed.

    Pure regexp chain — codegen, zero shuffle; emits text_clean plus
    markup_chars (how much was removed) for attrition auditing."""
    t = F.col(text_col)
    for pat, rep in HTML_RULES:
        t = F.regexp_replace(t, pat, rep)
    t = F.trim(t)
    return docs.select(
        F.col(id_col),
        t.alias("text_clean"),
        (F.length(F.col(text_col)) - F.length(t)).cast("long").alias(
            "markup_chars"
        ),
    )


#: mojibake indicators: UTF-8 bytes decoded as Latin-1/Windows-1252 —
#: each is the double-encoded form of a common character (e-acute,
#: curly quotes/dashes, u-umlaut, NBSP...), the high-frequency
#: casualties in web crawls. Spelled as escapes because several
#: contain C1 control characters.
MOJIBAKE_PATTERNS = (
    "\u00c3\u00a9",  # e-acute as 'A-tilde copyright'
    "\u00c3\u00a8",
    "\u00c3\u00bc",
    "\u00c3\u00a4",
    "\u00c3\u00b6",
    "\u00c3\u0178",
    "\u00c3\u00b1",
    "\u00c3\u00a7",
    "\u00e2\u20ac\u2122",  # right single quote
    "\u00e2\u20ac\u0153",  # left double quote
    "\u00e2\u20ac\u009d",  # right double quote (C1 control tail)
    "\u00e2\u20ac\u201c",  # en dash
    "\u00e2\u20ac\u201d",  # em dash
    "\u00e2\u20ac\u00a6",  # ellipsis
    "\u00c2\u00a0",         # NBSP
)


def mojibake_scan(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hits_per_kchar: float = 1.0,
) -> DataFrame:
    """Encoding-damage detector: count double-encoded UTF-8 sequences
    (the mojibake family above) per document and flag docs whose rate
    exceeds ``max_hits_per_kchar`` hits per 1000 chars — the standard
    signal for a crawl segment decoded with the wrong charset.

    Zero shuffle: one literal-replace length-delta per pattern, summed
    JVM-side; every step replays exactly in SQL."""
    t = F.col(text_col)
    hits = F.lit(0).cast("long")
    for pat in MOJIBAKE_PATTERNS:
        # occurrences = length delta / pattern length (literal replace)
        hits = hits + (
            (F.length(t) - F.length(F.replace(t, F.lit(pat), F.lit(""))))
            / F.lit(len(pat))
        ).cast("long")
    rate = F.when(
        F.length(t) > 0, hits.cast("double") * 1000.0 / F.length(t)
    ).otherwise(F.lit(0.0))
    return docs.select(
        F.col(id_col),
        hits.alias("mojibake_hits"),
        rate.alias("hits_per_kchar"),
        (rate > F.lit(max_hits_per_kchar)).cast("int").alias("is_mojibake"),
    )


def domain_stats(
    docs: DataFrame,
    url_col: str = "url",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-domain curation report (the FineWeb-style loop: decide
    keep/boost/drop at the registered-host level): doc count, exact
    duplicate share (distinct md5(text) vs rows), token total, and
    mean chars per canonical host.

    ONE aggregate pass over (domain, text-derived columns); the
    count-distinct rides in the same groupBy (Spark plans a bounded
    two-phase distinct aggregate, not a second corpus scan). Domain =
    host of the canonicalized URL, so ports/case/tracking junk don't
    split a domain's stats."""
    canon = canonicalize_urls(docs, url_col=url_col)
    # host stops at path OR query (a path-less URL appends '?q' right
    # after the host) and drops any :port — the report rolls up to the
    # registered host, so non-default ports don't split a domain's rows
    host = F.split(F.split(F.col("url_canon"), "://")[1], "[/?]")[0]
    domain = F.regexp_replace(host, ":[0-9]+$", "")
    t = F.col(text_col)
    tok = F.size(F.filter(F.split(t, r"\s+"), lambda x: x != F.lit("")))
    src = canon.select(
        domain.alias("domain"),
        F.md5(t).alias("__h"),
        tok.cast("long").alias("__tok"),
        F.length(t).alias("__ch"),
    )
    return src.groupBy("domain").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.countDistinct("__h").cast("long").alias("n_unique"),
        (
            F.lit(1.0)
            - F.countDistinct("__h") / F.count(F.lit(1)).cast("double")
        ).alias("dup_share"),
        F.sum("__tok").cast("long").alias("total_tokens"),
        F.avg("__ch").alias("mean_chars"),
    )


def filter_by_language(
    docs: DataFrame,
    languages: tuple | list,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep documents whose lexicon-detected language is in
    ``languages`` — the standard monolingual/allowlist cut. One
    language_id projection + a semi join back (docs keep ALL their
    columns, which the projection alone would drop)."""
    pred = language_id(docs, text_col, id_col)
    keep = pred.filter(F.col("pred_lang").isin(list(languages))).select(id_col)
    return docs.join(keep, on=id_col, how="left_semi")
