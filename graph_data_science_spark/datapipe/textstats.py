"""Text analysis for training-data pipelines: token counting, quality
scoring, language-ID heuristic, document fingerprinting.

All expressions are pure Spark SQL built-ins (JVM-side, whole-stage codegen;
no Python in the hot path) and are deliberately defined so an ANSI-SQL
oracle (DuckDB) can reproduce them bit-for-bit — see ``__spark_entry__.py``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "it", "that", "for"]
PUNCT_CLASS = r"[.,;:!?]"

# GPT-2-style pre-tokenizer pattern (contractions | space?+letters |
# space?+digits | space?+other-runs). Deliberately restricted to syntax
# that Java regex (Spark) and RE2 (DuckDB) match identically — no
# lookarounds, leftmost-first alternation only — so the oracle can count
# the same tokens bit-for-bit.
BPE_TOKEN_RE = r"'(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+"


def tokens_col(text: Column) -> Column:
    """Whitespace tokenization of the trimmed text; empty text → []."""
    return F.when(F.length(F.trim(text)) == 0, F.array().cast("array<string>")).otherwise(
        F.split(F.trim(text), r"\s+")
    )


def text_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds n_chars, n_tokens, punct_ratio, stopword_ratio, mean_token_len,
    quality, lang columns. One scan, no shuffle, no UDFs."""
    text = F.col(text_col)
    toks = tokens_col(text)
    n_chars = F.length(text)
    n_tokens = F.size(toks)
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    sum_tok_len = F.aggregate(F.transform(toks, F.length), F.lit(0), lambda a, x: a + x)
    punct_ratio = (n_chars - F.length(F.regexp_replace(text, PUNCT_CLASS, ""))) / F.greatest(
        n_chars, F.lit(1)
    )
    stopword_ratio = n_stop / F.greatest(n_tokens, F.lit(1))
    mean_token_len = sum_tok_len / F.greatest(n_tokens, F.lit(1))
    # [a-z ] character mass — cheap language-ID proxy for latin-script text.
    latin_ratio = F.length(F.regexp_replace(F.lower(text), "[^a-z ]", "")) / F.greatest(
        n_chars, F.lit(1)
    )
    quality = (
        F.lit(0.4) * F.least(n_tokens / F.lit(100.0), F.lit(1.0))
        + F.lit(0.3) * (F.lit(1.0) - punct_ratio)
        + F.lit(0.3) * F.least(mean_token_len / F.lit(8.0), F.lit(1.0))
    )
    return df.select(
        "*",
        n_chars.alias("n_chars_f"),
        n_tokens.alias("n_tokens"),
        punct_ratio.cast("double").alias("punct_ratio"),
        stopword_ratio.cast("double").alias("stopword_ratio"),
        mean_token_len.cast("double").alias("mean_token_len"),
        quality.cast("double").alias("quality"),
        F.when(latin_ratio >= 0.9, F.lit("en")).otherwise(F.lit("unk")).alias("lang_pred"),
    )


def bpe_token_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds ``n_bpe_tokens``: subword-boundary token count under the
    GPT-2-style pre-tokenizer regex (``BPE_TOKEN_RE``) — the standard
    "BPE-ish" proxy for LLM token budgeting when the real merges table
    isn't loaded. Pure column expression (regexp_extract_all + size):
    JVM-side, whole-stage codegen, one scan, no shuffle."""
    return df.withColumn(
        "n_bpe_tokens",
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(BPE_TOKEN_RE), 0)),
    )


def document_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace-normalized md5 fingerprint per document (dedup key)."""
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    return df.withColumn("fingerprint", F.md5(norm))


# Character-bigram profiles for the n-gram language-ID heuristic. Tiny,
# deterministic, integer-weighted (integer sums are bit-exact in both
# Spark and the DuckDB oracle). Weights are the classic high-frequency
# bigrams per language; this is the standard profile-intersection
# heuristic (Cavnar–Trenkle n-gram categorization), not a trained model.
LANG_BIGRAM_PROFILES: dict[str, dict[str, int]] = {
    "en": {"th": 6, "he": 5, "in": 4, "er": 3, "an": 3, " t": 4,
           "re": 2, "on": 2, "at": 2, "nd": 3},
    "fr": {"le": 5, "de": 5, "es": 4, "en": 3, " d": 4, "nt": 3,
           "ou": 3, "ai": 2, "ur": 2, "qu": 4},
    "de": {"en": 6, "er": 5, "ch": 5, "de": 3, "ei": 3, "ie": 3,
           "un": 3, "ge": 2, "sc": 3, " s": 2},
}


def language_id_bigram(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """N-gram language ID: score each document's character bigrams against
    the built-in per-language profiles; emit the argmax language (ties →
    lexicographically smallest) and its integer score, ``'unk'``/0 when no
    profile bigram occurs.

    Scale shape: one scan + an explode to |text| bigram rows, a broadcast
    join against the ~30-row profile table, and one hash aggregation on
    (doc, lang) — linear in corpus bytes, no wide shuffle, no UDFs.
    """
    from pyspark.sql import Window

    low = F.lower(F.col(text_col))
    n = F.length(low)
    bigrams = F.when(
        n >= 2,
        F.transform(F.sequence(F.lit(1), n - 1), lambda i: low.substr(i, F.lit(2))),
    ).otherwise(F.array().cast("array<string>"))
    b = df.select(F.col(id_col), F.explode(bigrams).alias("bigram"))
    spark = df.sparkSession
    prof = spark.createDataFrame(
        [(bg, lang, w) for lang, m in LANG_BIGRAM_PROFILES.items() for bg, w in m.items()],
        "bigram string, lang string, w int",
    )
    scores = (
        b.join(F.broadcast(prof), "bigram")
        .groupBy(id_col, "lang")
        .agg(F.sum("w").alias("lang_score"))
    )
    win = Window.partitionBy(id_col).orderBy(F.desc("lang_score"), F.asc("lang"))
    best = (
        scores.withColumn("_rn", F.row_number().over(win))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    return (
        df.select(id_col)
        .join(best, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("lang"), F.lit("unk")).alias("lang_bigram"),
            F.coalesce(F.col("lang_score"), F.lit(0)).cast("long").alias("lang_score"),
        )
    )


# Gopher document-quality rules (Rae et al. 2021, "Scaling Language Models:
# Methods, Analysis & Insights from Training Gopher", §A1.1 — public paper).
GOPHER_REQUIRED_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_quality(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document Gopher quality signals + the composite pass flag:

    - ``word_count`` ∈ [50, 100000]
    - ``mean_word_len`` ∈ [3, 10]
    - ``symbol_word_ratio`` (# and non-overlapping ``...`` occurrences per
      word) ≤ 0.1
    - ``bullet_line_frac`` (lines starting with -, *, or •) ≤ 0.9
    - ``ellipsis_line_frac`` (lines ending with ``...`` or ``…``) ≤ 0.3
    - ``alpha_word_frac`` (words containing ≥1 [A-Za-z]) ≥ 0.8
    - ``stopword_hits`` (distinct hits among the 8 required stop words,
      lowercased) ≥ 2

    One scan, pure column expressions (split/filter/size — codegen); the
    thresholds are the published constants. Returns every signal so
    downstream filters can re-threshold without a second scan."""
    text = F.col(text_col)
    words = tokens_col(text)
    n_words = F.size(words)
    mean_wl = F.when(
        n_words > 0,
        F.aggregate(words, F.lit(0.0), lambda a, w: a + F.length(w)) / n_words,
    ).otherwise(F.lit(0.0))
    hash_count = F.length(text) - F.length(F.replace(text, F.lit("#"), F.lit("")))
    ellipsis_count = (
        F.length(text) - F.length(F.replace(text, F.lit("..."), F.lit("")))
    ) / 3
    symbol_ratio = F.when(n_words > 0, (hash_count + ellipsis_count) / n_words).otherwise(0.0)
    lines = F.filter(F.split(text, "\n"), lambda l: F.length(F.trim(l)) > 0)
    n_lines = F.size(lines)
    bullet_frac = F.when(
        n_lines > 0,
        F.size(
            F.filter(
                lines,
                lambda l: F.substring(F.ltrim(l), 1, 1).isin("-", "*", "•"),
            )
        )
        / n_lines,
    ).otherwise(0.0)
    ellipsis_line_frac = F.when(
        n_lines > 0,
        F.size(
            F.filter(
                lines,
                lambda l: F.rtrim(l).endswith("...") | F.rtrim(l).endswith("…"),
            )
        )
        / n_lines,
    ).otherwise(0.0)
    alpha_frac = F.when(
        n_words > 0,
        F.size(F.filter(words, lambda w: w.rlike("[A-Za-z]"))) / n_words,
    ).otherwise(0.0)
    lower_words = F.transform(words, F.lower)
    stop_hits = F.size(
        F.filter(
            F.array(*[F.lit(s) for s in GOPHER_REQUIRED_STOPWORDS]),
            lambda s: F.array_contains(lower_words, s),
        )
    )
    passes = (
        (n_words >= 50)
        & (n_words <= 100_000)
        & (mean_wl >= 3.0)
        & (mean_wl <= 10.0)
        & (symbol_ratio <= 0.1)
        & (bullet_frac <= 0.9)
        & (ellipsis_line_frac <= 0.3)
        & (alpha_frac >= 0.8)
        & (stop_hits >= 2)
    )
    return df.select(
        F.col(id_col),
        n_words.cast("long").alias("word_count"),
        mean_wl.cast("double").alias("mean_word_len"),
        symbol_ratio.cast("double").alias("symbol_word_ratio"),
        bullet_frac.cast("double").alias("bullet_line_frac"),
        ellipsis_line_frac.cast("double").alias("ellipsis_line_frac"),
        alpha_frac.cast("double").alias("alpha_word_frac"),
        stop_hits.cast("long").alias("stopword_hits"),
        passes.cast("boolean").alias("gopher_pass"),
    )


def repetition_signals(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", ngram_ns: tuple = (2, 3)
) -> DataFrame:
    """Gopher repetition filters (§A1.1): duplicate-line fraction,
    duplicate-line CHARACTER fraction (characters in occurrences beyond a
    line's first, over total line characters), and per-n the character
    fraction covered by the single most frequent word n-gram.

    Shape: lines and n-grams are exploded once and aggregated per
    (doc, key) — two hash shuffles keyed by doc_id, linear in corpus
    tokens, no all-pairs anywhere. The most-frequent-gram tie-break is
    (count desc, gram asc), deterministic across engines."""
    text = F.col(text_col)
    # no persist: each branch rescans the (columnar, pruned) source rather
    # than pinning executor storage for the lifetime of a lazy result
    base = df.select(F.col(id_col).alias("doc_id"), text.alias("_t"))

    lines = base.select(
        "doc_id", F.explode(F.filter(F.split(F.col("_t"), "\n"), lambda l: F.length(F.trim(l)) > 0)).alias("line")
    )
    per_line = lines.groupBy("doc_id", "line").agg(F.count("*").alias("cnt"))
    line_stats = per_line.groupBy("doc_id").agg(
        (1.0 - F.count("*") / F.sum("cnt")).alias("dup_line_frac"),
        (
            F.sum(F.when(F.col("cnt") > 1, (F.col("cnt") - 1) * F.length("line")).otherwise(0))
            / F.sum(F.col("cnt") * F.length("line"))
        ).alias("dup_line_char_frac"),
    )

    words = tokens_col(F.col("_t"))
    out = base.select("doc_id")
    from pyspark.sql import Window

    for n in ngram_ns:
        grams_arr = F.when(
            F.size(words) >= n,
            F.transform(
                F.sequence(F.lit(1), F.size(words) - (n - 1)),
                lambda i: F.concat_ws(" ", F.slice(words, i, n)),
            ),
        ).otherwise(F.array().cast("array<string>"))
        grams = base.select("doc_id", F.explode(grams_arr).alias("gram"))
        counts = grams.groupBy("doc_id", "gram").agg(F.count("*").alias("cnt"))
        w = Window.partitionBy("doc_id").orderBy(F.desc("cnt"), F.asc("gram"))
        top = (
            counts.withColumn("_r", F.row_number().over(w))
            .filter(F.col("_r") == 1)
            .select(
                "doc_id",
                (F.col("cnt") * F.length("gram")).alias(f"_topchars{n}"),
            )
        )
        totals = grams.groupBy("doc_id").agg(F.sum(F.length("gram")).alias(f"_allchars{n}"))
        frac = (
            totals.join(top, "doc_id", "left")
            .select(
                "doc_id",
                (
                    F.coalesce(F.col(f"_topchars{n}"), F.lit(0))
                    / F.col(f"_allchars{n}")
                ).alias(f"top_{n}gram_char_frac"),
            )
        )
        out = out.join(frac, "doc_id", "left")

    result = (
        out.join(line_stats, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("dup_line_frac", F.lit(0.0)).alias("dup_line_frac"),
            F.coalesce("dup_line_char_frac", F.lit(0.0)).alias("dup_line_char_frac"),
            *[
                F.coalesce(f"top_{n}gram_char_frac", F.lit(0.0)).alias(f"top_{n}gram_char_frac")
                for n in ngram_ns
            ],
        )
    )
    return result


def vocab_top_ngrams(
    df: DataFrame,
    text_col: str = "text",
    n: int = 2,
    k: int = 50,
) -> DataFrame:
    """Corpus-level vocabulary: the k most frequent n-word grams →
    ``(gram, occurrences)``, every occurrence counted (not per-doc
    distinct), ties broken lexicographically so the cutoff is total-ordered.

    Shape at scale: explode → one map-side-combinable hash aggregate on
    uniformly-distributed gram strings → distributed top-k (TakeOrdered,
    per-partition heads then a k-row merge on the driver); no window over
    the full vocabulary.
    """
    toks = tokens_col(F.col(text_col))
    idx = F.when(
        F.size(toks) >= n, F.sequence(F.lit(0), F.size(toks) - n)
    ).otherwise(F.array().cast("array<int>"))
    grams = F.transform(idx, lambda i: F.array_join(F.slice(toks, i + 1, n), " "))
    return (
        df.select(F.explode(grams).alias("gram"))
        .groupBy("gram")
        .agg(F.count("*").alias("occurrences"))
        .orderBy(F.desc("occurrences"), F.asc("gram"))
        .limit(k)
    )


# PII patterns, restricted to syntax Java regex (Spark) and RE2 (DuckDB)
# match identically — no lookarounds, no backreferences — so the DuckDB
# oracle reproduces every match. Order matters: emails are redacted before
# phones/IPs so the address's digits can't be re-matched as a number.
PII_PATTERNS: list[tuple[str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("phone", r"\b\d{3}[-.]\d{3}[-.]\d{4}\b"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"),
]


def pii_redact(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    replacement: str = "[PII]",
) -> DataFrame:
    """Redact PII-shaped spans (emails, NNN-NNN-NNNN phones, IPv4s) and
    count each category: (id, redacted, n_email, n_phone, n_ipv4).

    Pure column expressions (sequential ``regexp_replace`` passes + one
    ``regexp_extract_all``-size count per category on the ORIGINAL text) —
    one scan, zero shuffle, whole-stage codegen; the linear-scan shape a
    100 TB corpus pass wants. Counts are measured before redaction so a
    replacement string can never create or destroy a later match.
    """
    text = F.col(text_col)
    counts = [
        F.size(F.regexp_extract_all(text, F.lit(pat), 0)).alias(f"n_{name}")
        for name, pat in PII_PATTERNS
    ]
    redacted = text
    for _, pat in PII_PATTERNS:
        redacted = F.regexp_replace(redacted, pat, replacement)
    return df.select(F.col(id_col), redacted.alias("redacted"), *counts)
