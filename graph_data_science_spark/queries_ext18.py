"""Round-3 driver-contract queries (batch 18): corpus-hygiene sampling +
PII redaction, oracle-gated.

- ``pii_redaction_docs``: PII-shaped spans (emails, NNN-NNN-NNNN phones,
  IPv4s) redacted and counted per document (``datapipe/textstats.py:
  pii_redact``). The synthetic corpus carries no PII, so the query first
  concatenates deterministic PII derived from ``doc_id`` into each text —
  both engines build the identical augmented string, then the oracle
  replays the same regex passes (patterns restricted to the Java-regex ∩
  RE2 common dialect).
- ``quality_sample_docs``: quality-weighted down-sampling
  (``datapipe/sampling.py:weighted_sample``) — keep rate is a CASE over
  ``n_chars`` quality buckets, the draw is the portable md5 uniform, so
  DuckDB replays every keep/drop decision bit-for-bit.
- ``stratified_sample_sources``: rebalance to a target source mix
  (``datapipe/sampling.py:stratified_sample_to_target``) — the oracle
  recomputes shares/ratios/rates in CTEs with the same IEEE expression
  order and replays the draws.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graph_data_science_spark.queries import _portable_hash_sql, _t

# Shared with datapipe.textstats.PII_PATTERNS (kept literal here so the
# oracle SQL below is self-evidently the same pattern set).
_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PHONE = r"\b\d{3}[-.]\d{3}[-.]\d{4}\b"
_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"

_AUG_SQL = (
    "aug AS (SELECT doc_id, text || ' contact user' || CAST(doc_id AS VARCHAR)"
    " || '@example.com tel 555-010-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')"
    " || ' ip 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.7' AS text FROM documents)"
)


def q_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    from graph_data_science_spark.datapipe.textstats import pii_redact

    d = _t(spark, sf_dir, "documents")
    aug = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com tel 555-010-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
            F.lit(" ip 10.0."),
            (F.col("doc_id") % 256).cast("string"),
            F.lit(".7"),
        ).alias("text"),
    )
    return pii_redact(aug)


Q_PII_SQL = f"""
WITH {_AUG_SQL}
SELECT doc_id,
       regexp_replace(regexp_replace(regexp_replace(text,
           '{_EMAIL}', '[PII]', 'g'),
           '{_PHONE}', '[PII]', 'g'),
           '{_IPV4}', '[PII]', 'g') AS redacted,
       len(regexp_extract_all(text, '{_EMAIL}')) AS n_email,
       len(regexp_extract_all(text, '{_PHONE}')) AS n_phone,
       len(regexp_extract_all(text, '{_IPV4}')) AS n_ipv4
FROM aug
"""

# u(id) in [0,1): portable md5 hash (15 hex digits = 60 bits) / 16^15.
_HASH_SPACE = "1152921504606846976.0"


def _uniform_sql(seed: str) -> str:
    return f"({_portable_hash_sql('CAST(doc_id AS VARCHAR)', seed)} / {_HASH_SPACE})"


_QUALITY_RATE = (
    "CASE WHEN n_chars >= 400 THEN 0.9 WHEN n_chars >= 250 THEN 0.6 "
    "WHEN n_chars >= 150 THEN 0.3 ELSE 0.1 END"
)


def q_quality_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from graph_data_science_spark.datapipe.sampling import weighted_sample

    d = _t(spark, sf_dir, "documents")
    rate = (
        F.when(F.col("n_chars") >= 400, 0.9)
        .when(F.col("n_chars") >= 250, 0.6)
        .when(F.col("n_chars") >= 150, 0.3)
        .otherwise(0.1)
    )
    return weighted_sample(d, rate, seed="quality").select("doc_id", "n_chars")


Q_QUALITY_SAMPLE_SQL = f"""
SELECT doc_id, n_chars FROM documents
WHERE {_uniform_sql('quality')} < {_QUALITY_RATE}
"""

_MIX_TARGETS = {"src0": 0.5, "src1": 0.3, "src2": 0.2}


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from graph_data_science_spark.datapipe.sampling import stratified_sample_to_target

    d = _t(spark, sf_dir, "documents")
    out = stratified_sample_to_target(d, "source", _MIX_TARGETS, seed="mix")
    return out.select("doc_id", "source")


_TGT_SQL = " UNION ALL ".join(
    f"SELECT '{k}' AS source, {v} AS _target" for k, v in _MIX_TARGETS.items()
)

# IEEE expression order mirrors stratified_sample_to_target exactly:
# _share = _n / total; _ratio = _share / _target;
# _rate = least(1.0, min_ratio / _ratio); keep = u < _rate.
Q_STRATIFIED_SQL = f"""
WITH tgt AS ({_TGT_SQL}),
shares AS (
    SELECT d.source, COUNT(*) AS _n, ANY_VALUE(t._target) AS _target
    FROM documents d JOIN tgt t ON t.source = d.source
    GROUP BY d.source
),
ratios AS (
    SELECT source, _target,
           (_n / (SELECT SUM(_n) FROM shares)) / _target AS _ratio
    FROM shares
),
rates AS (
    SELECT source,
           least(1.0, (SELECT MIN(_ratio) FROM ratios) / _ratio) AS _rate
    FROM ratios
)
SELECT d.doc_id, d.source
FROM documents d JOIN rates r ON r.source = d.source
WHERE {_uniform_sql('mix').replace('doc_id', 'd.doc_id')} < r._rate
"""


QUERIES_EXT18 = {
    "pii_redaction_docs": q_pii_redaction,
    "quality_sample_docs": q_quality_sample,
    "stratified_sample_sources": q_stratified_sample,
}

ORACLES_EXT18 = {
    "pii_redaction_docs": Q_PII_SQL,
    "quality_sample_docs": Q_QUALITY_SAMPLE_SQL,
    "stratified_sample_sources": Q_STRATIFIED_SQL,
}


def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    from graph_data_science_spark.datapipe.packing import pack_sequences

    return pack_sequences(
        _t(spark, sf_dir, "documents"), budget=512, n_buckets=8, seed="pack"
    )


Q_PACK_SQL = f"""
WITH base AS (
    SELECT doc_id,
           CAST(CASE WHEN len(trim(text)) = 0 THEN 0
                     ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS BIGINT)
               AS n_tokens,
           {_portable_hash_sql('CAST(doc_id AS VARCHAR)', 'pack')} AS _h
    FROM documents
), c AS (
    SELECT doc_id, n_tokens, _h % 8 AS bucket,
           COALESCE(SUM(n_tokens) OVER (
               PARTITION BY _h % 8 ORDER BY _h, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prev
    FROM base
)
SELECT doc_id, n_tokens, bucket,
       CAST(FLOOR(prev / 512.0) AS BIGINT) AS seq_id,
       prev % 512 AS token_offset
FROM c
"""

QUERIES_EXT18["pack_sequences_docs"] = q_pack_sequences
ORACLES_EXT18["pack_sequences_docs"] = Q_PACK_SQL


def q_random_graph_uniform(spark: SparkSession, sf_dir: str) -> DataFrame:
    from graph_data_science_spark.graph.generate import random_graph

    g = random_graph(spark, node_count=1000, average_degree=4, distribution="uniform", seed=7)
    return g.edges.select("src", "dst")


Q_RANDOM_GRAPH_SQL = f"""
WITH nodes AS (SELECT range AS src FROM range(0, 1000)),
slots AS (SELECT src, j.range AS j FROM nodes, range(0, 4) j),
drawn AS (
    SELECT src,
           {_portable_hash_sql("CAST(src AS VARCHAR) || '_' || CAST(j AS VARCHAR)", '7:t')}
               % 1000 AS dst
    FROM slots
)
SELECT src, CASE WHEN dst = src THEN (dst + 1) % 1000 ELSE dst END AS dst
FROM drawn
"""

QUERIES_EXT18["random_graph_uniform"] = q_random_graph_uniform
ORACLES_EXT18["random_graph_uniform"] = Q_RANDOM_GRAPH_SQL


def q_to_undirected(spark: SparkSession, sf_dir: str) -> DataFrame:
    """gds.graph.relationships.toUndirected over the supplier→customer
    shipping graph (lineitem multiplicity as weight): union(reverse) then
    SUM-aggregate parallel edges (Orientation.UNDIRECTED + Aggregation.SUM,
    reference ToUndirected.java:50, Aggregation.java:31-100)."""
    from graph_data_science_spark.graph.build import aggregate_parallel_edges, to_undirected

    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    edges = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .select(
            F.col("l_suppkey").cast("long").alias("src"),
            (100000 + F.col("o_custkey")).cast("long").alias("dst"),
            F.lit(1.0).alias("weight"),
        )
    )
    und = aggregate_parallel_edges(to_undirected(edges), agg="sum")
    return und.select("src", "dst", F.col("weight").cast("long").alias("multiplicity"))


Q_TO_UNDIRECTED_SQL = """
WITH e AS (
    SELECT CAST(l_suppkey AS BIGINT) AS src,
           CAST(100000 + o_custkey AS BIGINT) AS dst,
           1.0 AS weight
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
), sym AS (
    SELECT src, dst, weight FROM e
    UNION ALL
    SELECT dst AS src, src AS dst, weight FROM e
)
SELECT src, dst, CAST(SUM(weight) AS BIGINT) AS multiplicity
FROM sym GROUP BY src, dst
"""


def q_index_inverse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """gds.graph.relationships.indexInverse: the REVERSE topology of the
    customer→order graph (reference InverseRelationships.java:51,
    Orientation.REVERSE)."""
    from graph_data_science_spark.graph.build import reverse_edges

    orders = _t(spark, sf_dir, "orders")
    edges = orders.select(
        (2000 + F.col("o_custkey")).cast("long").alias("src"),
        (100000 + F.col("o_orderkey")).cast("long").alias("dst"),
        F.lit(1.0).alias("weight"),
    )
    return reverse_edges(edges).select("src", "dst")


Q_INDEX_INVERSE_SQL = """
SELECT CAST(100000 + o_orderkey AS BIGINT) AS src,
       CAST(2000 + o_custkey AS BIGINT) AS dst
FROM orders
"""

QUERIES_EXT18["to_undirected_shipping"] = q_to_undirected
ORACLES_EXT18["to_undirected_shipping"] = Q_TO_UNDIRECTED_SQL
QUERIES_EXT18["index_inverse_orders"] = q_index_inverse
ORACLES_EXT18["index_inverse_orders"] = Q_INDEX_INVERSE_SQL


def q_msbfs_depths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Direct MSBFS oracle row (reference MultiSourceBFSAccessMethods.java:
    25-55): depths from every region-0 nation node over the supply tree,
    closed-form on the tree (depth 1 = the nation's suppliers/customers,
    depth 2 = its customers' orders; BfsConsumer never fires at depth 0)."""
    from graph_data_science_spark.algorithms.centrality_extra import msbfs_distances
    from graph_data_science_spark.queries_ext import _supply_tree_graph

    g = _supply_tree_graph(spark, sf_dir, weighted=False)
    nation = _t(spark, sf_dir, "nation")
    sources = nation.filter(F.col("n_regionkey") == 0).select(
        (10 + F.col("n_nationkey")).cast("long").alias("node_id")
    )
    return msbfs_distances(g, sources=sources).select(
        "source", "node_id", F.col("depth").cast("long").alias("depth")
    )


Q_MSBFS_SQL = """
WITH src AS (SELECT CAST(10 + n_nationkey AS BIGINT) AS source, n_nationkey
             FROM nation WHERE n_regionkey = 0)
SELECT source, CAST(50 + s_suppkey AS BIGINT) AS node_id, CAST(1 AS BIGINT) AS depth
FROM src JOIN supplier ON s_nationkey = n_nationkey
UNION ALL
SELECT source, CAST(2000 + c_custkey AS BIGINT), 1
FROM src JOIN customer ON c_nationkey = n_nationkey
UNION ALL
SELECT source, CAST(100000 + o_orderkey AS BIGINT), 2
FROM src JOIN customer ON c_nationkey = n_nationkey JOIN orders ON o_custkey = c_custkey
"""

QUERIES_EXT18["msbfs_depths_supply"] = q_msbfs_depths
ORACLES_EXT18["msbfs_depths_supply"] = Q_MSBFS_SQL


def q_ann_cosine_gemm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GEMM exact top-k must equal the brute-force oracle (same SQL as
    ann_cosine_topk): the vectorized scale path is exact, not approximate."""
    from graph_data_science_spark.datapipe.ann import cosine_topk_gemm
    from graph_data_science_spark.queries import _e

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 20)
    return cosine_topk_gemm(emb, queries, k=5).select(
        "query_id", "neighbor_id", "rank", _e(F.col("sim"), 4).alias("sim_e4")
    )


def _ann_oracle() -> dict:
    from graph_data_science_spark.queries import Q_ANN_SQL

    return {"ann_cosine_gemm_topk": Q_ANN_SQL}


QUERIES_EXT18["ann_cosine_gemm_topk"] = q_ann_cosine_gemm
ORACLES_EXT18.update(_ann_oracle())
