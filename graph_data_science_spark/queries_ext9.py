"""Round-3 driver-contract queries (batch 9): LLM training-data text
pipeline completions.

- ``bpe_token_counts``: GPT-2-style pre-tokenizer regex token count
  (``datapipe/textstats.py::bpe_token_count``) — the "BPE-ish" token
  budgeting proxy; pure regexp_extract_all+size column expression, and
  the pattern is restricted to syntax Java regex (Spark) and RE2
  (DuckDB) match identically so the oracle counts the same tokens.
- ``lang_id_bigram``: character-bigram profile language ID
  (Cavnar–Trenkle-style n-gram heuristic,
  ``textstats.py::language_id_bigram``) — explode to bigrams, broadcast
  join a ~30-row integer-weight profile table, one (doc, lang) hash agg,
  argmax with deterministic tie-break; integer scores are bit-exact in
  both engines.
- ``corpus_filter_pipeline``: end-to-end training-data filter — quality
  score + language gate (``text_features``), then exact-dup removal on
  the whitespace-normalized md5 fingerprint keeping the smallest doc_id
  per duplicate group. One scan + one window; the composite a 100 TB
  curation job actually runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graph_data_science_spark.datapipe.textstats import (
    BPE_TOKEN_RE,
    LANG_BIGRAM_PROFILES,
    bpe_token_count,
    document_fingerprint,
    language_id_bigram,
    text_features,
)
from graph_data_science_spark.queries import _e, _t

# --------------------------------------------------------------------------
# BPE-ish token counting
# --------------------------------------------------------------------------


def q_bpe_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bpe_token_count(_t(spark, sf_dir, "documents")).select("doc_id", "n_bpe_tokens")


_BPE_RE_SQL = BPE_TOKEN_RE.replace("'", "''")

Q_BPE_TOKEN_COUNTS_SQL = f"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{_BPE_RE_SQL}')) AS INT) AS n_bpe_tokens
    FROM documents
"""

# --------------------------------------------------------------------------
# N-gram (character-bigram) language ID
# --------------------------------------------------------------------------


def q_lang_id_bigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    return language_id_bigram(_t(spark, sf_dir, "documents"))


_PROF_VALUES = ", ".join(
    f"('{bg}', '{lang}', {w})"
    for lang, m in LANG_BIGRAM_PROFILES.items()
    for bg, w in m.items()
)

Q_LANG_ID_BIGRAM_SQL = f"""
    WITH prof(bigram, lang, w) AS (VALUES {_PROF_VALUES}),
    b AS (
        SELECT doc_id,
               unnest(list_transform(range(1, len(l)),
                                     i -> substr(l, CAST(i AS INT), 2))) AS bigram
        FROM (SELECT doc_id, lower(text) AS l FROM documents)
    ),
    s AS (
        SELECT doc_id, lang, SUM(w) AS score
        FROM b JOIN prof USING (bigram)
        GROUP BY doc_id, lang
    ),
    r AS (
        SELECT doc_id, lang, score,
               ROW_NUMBER() OVER (PARTITION BY doc_id
                                  ORDER BY score DESC, lang ASC) AS rn
        FROM s
    )
    SELECT d.doc_id,
           COALESCE(r.lang, 'unk') AS lang_bigram,
           CAST(COALESCE(r.score, 0) AS BIGINT) AS lang_score
    FROM documents d
    LEFT JOIN (SELECT * FROM r WHERE rn = 1) r ON d.doc_id = r.doc_id
"""

# --------------------------------------------------------------------------
# End-to-end corpus filter (quality gate + language gate + exact dedup)
# --------------------------------------------------------------------------


def q_corpus_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = _t(spark, sf_dir, "documents")
    feats = text_features(docs).filter(
        (F.col("quality") >= 0.65) & (F.col("lang_pred") == "en")
    )
    fp = document_fingerprint(feats)
    win = Window.partitionBy("fingerprint").orderBy("doc_id")
    return (
        fp.withColumn("_rn", F.row_number().over(win))
        .filter(F.col("_rn") == 1)
        .select("doc_id", "n_tokens", _e(F.col("quality"), 8).alias("quality_e8"))
    )


Q_CORPUS_FILTER_SQL = """
    WITH t AS (
        SELECT doc_id, text,
               CASE WHEN len(trim(text)) = 0 THEN []::VARCHAR[]
                    ELSE regexp_split_to_array(trim(text), '\\s+') END AS toks,
               len(text) AS n_chars
        FROM documents
    ), m AS (
        SELECT doc_id, text, len(toks) AS n_tokens,
               CAST(n_chars - len(regexp_replace(text, '[.,;:!?]', '', 'g')) AS DOUBLE)
                   / GREATEST(n_chars, 1) AS punct_ratio,
               CAST(list_sum(list_transform(toks, t -> len(t))) AS DOUBLE)
                   / GREATEST(len(toks), 1) AS mean_token_len,
               CAST(len(regexp_replace(lower(text), '[^a-z ]', '', 'g')) AS DOUBLE)
                   / GREATEST(n_chars, 1) AS latin_ratio
        FROM t
    ), q AS (
        SELECT doc_id, text, n_tokens,
               0.4 * LEAST(n_tokens / 100.0, 1.0)
                 + 0.3 * (1.0 - punct_ratio)
                 + 0.3 * LEAST(mean_token_len / 8.0, 1.0) AS quality,
               CASE WHEN latin_ratio >= 0.9 THEN 'en' ELSE 'unk' END AS lang_pred
        FROM m
    ), kept AS (
        SELECT doc_id, n_tokens, quality,
               md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fingerprint
        FROM q WHERE quality >= 0.65 AND lang_pred = 'en'
    )
    SELECT doc_id, CAST(n_tokens AS INT) AS n_tokens,
           CAST(FLOOR(quality * 1e8 + 0.3183098861837907) AS BIGINT) AS quality_e8
    FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY fingerprint ORDER BY doc_id) AS rn
        FROM kept
    ) WHERE rn = 1
"""


QUERIES_EXT9 = {
    "bpe_token_counts": q_bpe_token_counts,
    "lang_id_bigram": q_lang_id_bigram,
    "corpus_filter_pipeline": q_corpus_filter,
}

ORACLES_EXT9 = {
    "bpe_token_counts": Q_BPE_TOKEN_COUNTS_SQL,
    "lang_id_bigram": Q_LANG_ID_BIGRAM_SQL,
    "corpus_filter_pipeline": Q_CORPUS_FILTER_SQL,
}
