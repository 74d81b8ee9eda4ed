"""Round-3 driver-contract queries (batch 15): Gopher corpus-quality and
repetition filters (Rae et al. 2021 §A1.1 — the standard LLM training-data
curation rules), over the documents table.

- ``gopher_quality_documents``: word-count / mean-word-length /
  symbol-ratio / bullet- and ellipsis-line fractions / alphabetic-word
  fraction / required-stop-word containment + the composite pass flag.
- ``repetition_signals_documents``: duplicate-line fraction,
  duplicate-line character fraction, and the character fraction covered
  by the most frequent word {2,3}-gram.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graph_data_science_spark.datapipe.textstats import (
    GOPHER_REQUIRED_STOPWORDS,
    gopher_quality,
    repetition_signals,
)
from graph_data_science_spark.queries import _e, _t


def q_gopher(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = gopher_quality(_t(spark, sf_dir, "documents"))
    return out.select(
        "doc_id",
        "word_count",
        _e(F.col("mean_word_len"), 6).alias("mean_word_len_e6"),
        _e(F.col("symbol_word_ratio"), 6).alias("symbol_word_ratio_e6"),
        _e(F.col("bullet_line_frac"), 6).alias("bullet_line_frac_e6"),
        _e(F.col("ellipsis_line_frac"), 6).alias("ellipsis_line_frac_e6"),
        _e(F.col("alpha_word_frac"), 6).alias("alpha_word_frac_e6"),
        "stopword_hits",
        F.col("gopher_pass").cast("int").alias("gopher_pass"),
    )


def _fe(expr: str, scale: int) -> str:
    return f"CAST(FLOOR(({expr}) * 1e{scale} + 0.3183098861837907) AS BIGINT)"


_STOPS_SQL = ", ".join(f"'{s}'" for s in GOPHER_REQUIRED_STOPWORDS)

Q_GOPHER_SQL = f"""
    WITH words AS (
        SELECT doc_id, UNNEST(regexp_split_to_array(trim(text), '\\s+')) AS w
        FROM documents WHERE len(trim(text)) > 0
    ),
    wstats AS (
        SELECT doc_id,
               COUNT(*) AS nw,
               AVG(CAST(len(w) AS DOUBLE)) AS mwl,
               SUM(CASE WHEN regexp_matches(w, '[A-Za-z]') THEN 1 ELSE 0 END) AS alpha,
               COUNT(DISTINCT CASE WHEN lower(w) IN ({_STOPS_SQL}) THEN lower(w) END) AS stops
        FROM words GROUP BY doc_id
    ),
    lines AS (
        SELECT doc_id, UNNEST(string_split(text, chr(10))) AS line FROM documents
    ),
    nonempty AS (SELECT doc_id, line FROM lines WHERE len(trim(line)) > 0),
    lstats AS (
        SELECT doc_id,
               COUNT(*) AS nl,
               SUM(CASE WHEN substr(ltrim(line), 1, 1) IN ('-', '*', '•') THEN 1 ELSE 0 END) AS bullets,
               SUM(CASE WHEN rtrim(line) LIKE '%...' OR rtrim(line) LIKE '%…' THEN 1 ELSE 0 END) AS ells
        FROM nonempty GROUP BY doc_id
    ),
    syms AS (
        SELECT doc_id,
               len(text) - len(replace(text, '#', '')) AS hashes,
               (len(text) - len(replace(text, '...', ''))) / 3.0 AS ellipses
        FROM documents
    ),
    joined AS (
        SELECT d.doc_id,
               COALESCE(w.nw, 0) AS nw,
               COALESCE(w.mwl, 0.0) AS mwl,
               CASE WHEN COALESCE(w.nw, 0) > 0
                    THEN (s.hashes + s.ellipses) / w.nw ELSE 0.0 END AS symratio,
               CASE WHEN COALESCE(l.nl, 0) > 0
                    THEN CAST(l.bullets AS DOUBLE) / l.nl ELSE 0.0 END AS bulletfrac,
               CASE WHEN COALESCE(l.nl, 0) > 0
                    THEN CAST(l.ells AS DOUBLE) / l.nl ELSE 0.0 END AS ellfrac,
               CASE WHEN COALESCE(w.nw, 0) > 0
                    THEN CAST(w.alpha AS DOUBLE) / w.nw ELSE 0.0 END AS alphafrac,
               COALESCE(w.stops, 0) AS stops
        FROM documents d
        LEFT JOIN wstats w ON w.doc_id = d.doc_id
        LEFT JOIN lstats l ON l.doc_id = d.doc_id
        JOIN syms s ON s.doc_id = d.doc_id
    )
    SELECT doc_id,
           CAST(nw AS BIGINT) AS word_count,
           {_fe("mwl", 6)} AS mean_word_len_e6,
           {_fe("symratio", 6)} AS symbol_word_ratio_e6,
           {_fe("bulletfrac", 6)} AS bullet_line_frac_e6,
           {_fe("ellfrac", 6)} AS ellipsis_line_frac_e6,
           {_fe("alphafrac", 6)} AS alpha_word_frac_e6,
           CAST(stops AS BIGINT) AS stopword_hits,
           CAST(
               nw >= 50 AND nw <= 100000 AND mwl >= 3.0 AND mwl <= 10.0
               AND symratio <= 0.1 AND bulletfrac <= 0.9 AND ellfrac <= 0.3
               AND alphafrac >= 0.8 AND stops >= 2
           AS INT) AS gopher_pass
    FROM joined
"""


def q_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = repetition_signals(_t(spark, sf_dir, "documents"))
    return out.select(
        "doc_id",
        _e(F.col("dup_line_frac"), 6).alias("dup_line_frac_e6"),
        _e(F.col("dup_line_char_frac"), 6).alias("dup_line_char_frac_e6"),
        _e(F.col("top_2gram_char_frac"), 6).alias("top_2gram_char_frac_e6"),
        _e(F.col("top_3gram_char_frac"), 6).alias("top_3gram_char_frac_e6"),
    )


def _ngram_sql(n: int) -> str:
    """Per-doc character fraction of the most frequent word n-gram."""
    return f"""
    grams{n} AS (
        SELECT doc_id,
               UNNEST(list_transform(
                   range(1, len(regexp_split_to_array(trim(text), '\\s+')) - {n} + 2),
                   i -> array_to_string(
                       (regexp_split_to_array(trim(text), '\\s+'))[i:i + {n} - 1], ' ')
               )) AS gram
        FROM documents
        WHERE len(trim(text)) > 0
          AND len(regexp_split_to_array(trim(text), '\\s+')) >= {n}
    ),
    counts{n} AS (
        SELECT doc_id, gram, COUNT(*) AS cnt FROM grams{n} GROUP BY doc_id, gram
    ),
    top{n} AS (
        SELECT doc_id, cnt * len(gram) AS topchars
        FROM (SELECT doc_id, gram, cnt,
                     ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY cnt DESC, gram ASC) AS r
              FROM counts{n})
        WHERE r = 1
    ),
    tot{n} AS (
        SELECT doc_id, SUM(len(gram)) AS allchars FROM grams{n} GROUP BY doc_id
    ),
    frac{n} AS (
        SELECT t.doc_id,
               CAST(COALESCE(p.topchars, 0) AS DOUBLE) / t.allchars AS frac
        FROM tot{n} t LEFT JOIN top{n} p ON p.doc_id = t.doc_id
    )"""


Q_REPETITION_SQL = f"""
    WITH lines AS (
        SELECT doc_id, line FROM (
            SELECT doc_id, UNNEST(string_split(text, chr(10))) AS line FROM documents
        ) WHERE len(trim(line)) > 0
    ),
    per_line AS (
        SELECT doc_id, line, COUNT(*) AS cnt FROM lines GROUP BY doc_id, line
    ),
    lstats AS (
        SELECT doc_id,
               1.0 - CAST(COUNT(*) AS DOUBLE) / SUM(cnt) AS dup_line_frac,
               CAST(SUM(CASE WHEN cnt > 1 THEN (cnt - 1) * len(line) ELSE 0 END) AS DOUBLE)
                   / SUM(cnt * len(line)) AS dup_line_char_frac
        FROM per_line GROUP BY doc_id
    ),
    {_ngram_sql(2)},
    {_ngram_sql(3)}
    SELECT d.doc_id,
           {_fe("COALESCE(l.dup_line_frac, 0.0)", 6)} AS dup_line_frac_e6,
           {_fe("COALESCE(l.dup_line_char_frac, 0.0)", 6)} AS dup_line_char_frac_e6,
           {_fe("COALESCE(f2.frac, 0.0)", 6)} AS top_2gram_char_frac_e6,
           {_fe("COALESCE(f3.frac, 0.0)", 6)} AS top_3gram_char_frac_e6
    FROM documents d
    LEFT JOIN lstats l ON l.doc_id = d.doc_id
    LEFT JOIN frac2 f2 ON f2.doc_id = d.doc_id
    LEFT JOIN frac3 f3 ON f3.doc_id = d.doc_id
"""


QUERIES_EXT15 = {
    "gopher_quality_documents": q_gopher,
    "repetition_signals_documents": q_repetition,
}

ORACLES_EXT15 = {
    "gopher_quality_documents": Q_GOPHER_SQL,
    "repetition_signals_documents": Q_REPETITION_SQL,
}
