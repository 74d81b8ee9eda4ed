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


def document_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace-normalized md5 fingerprint per document (dedup key)."""
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    return df.withColumn("fingerprint", F.md5(norm))
