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
