"""Round-3 driver-contract queries (batch 17): corpus-hygiene pipeline ops,
oracle-gated.

- ``dedup_clusters_docs``: fuzzy-dedup clusters — MinHash-LSH near-dup
  pairs fed into the ENGINE's union-by-min WCC (``datapipe/dedup.py:
  dedup_clusters``), canonical representative per cluster. The DuckDB
  oracle replays the full LSH banding in SQL (shared CTEs with
  ``lsh_candidate_pairs``) and closes the pair graph with a recursive CTE
  (tiny at verification scale), taking MIN over each node's reachable set —
  the same union-by-min fixpoint the WCC computes.
- ``contamination_docs``: train/eval decontamination — distinct 3-gram
  shingle overlap of a deterministic holdout split (doc_id % 7 == 0)
  against the remaining training corpus.
- ``vocab_top_bigrams``: corpus vocabulary — top-50 bigrams by total
  occurrence count, ties broken lexicographically (total order ⇒ identical
  cutoff set in both engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graph_data_science_spark.queries import _SHINGLES_SQL, _t
from graph_data_science_spark.queries_ext import (
    _LSH_BANDS_SQL,
    _LSH_SHINGLES_SQL,
    _LSH_SIG_SQL,
)


def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from graph_data_science_spark.datapipe.dedup import dedup_clusters

    out = dedup_clusters(_t(spark, sf_dir, "documents"), threshold=0.1)
    return out.select(
        "doc_id", "cluster", F.col("keep").cast("int").alias("keep")
    )


Q_DEDUP_CLUSTERS_SQL = f"""
    WITH RECURSIVE {_LSH_SHINGLES_SQL},
    {_LSH_SIG_SQL},
    {_LSH_BANDS_SQL},
    cand AS MATERIALIZED (
        SELECT DISTINCT la.doc_id AS a, lb.doc_id AS b
        FROM banded la JOIN banded lb ON la.band = lb.band AND la.bucket = lb.bucket
        WHERE la.doc_id < lb.doc_id
    ),
    sz AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
    verified AS MATERIALIZED (
        SELECT x.doc_id AS a, y.doc_id AS b
        FROM sh x JOIN sh y ON x.shingle = y.shingle AND x.doc_id < y.doc_id
        JOIN cand ON cand.a = x.doc_id AND cand.b = y.doc_id
        JOIN sz sa ON sa.doc_id = x.doc_id JOIN sz sb ON sb.doc_id = y.doc_id
        GROUP BY x.doc_id, y.doc_id, sa.sz, sb.sz
        HAVING CAST(COUNT(*) AS DOUBLE) / (sa.sz + sb.sz - COUNT(*)) >= 0.1
    ),
    sym AS (
        SELECT a AS u, b AS v FROM verified
        UNION SELECT b, a FROM verified
    ),
    reach(src, node) AS (
        SELECT u, u FROM sym
        UNION
        SELECT r.src, s.v FROM reach r JOIN sym s ON s.u = r.node
    ),
    clusters AS (SELECT src AS doc_id, MIN(node) AS cluster FROM reach GROUP BY src)
    SELECT d.doc_id,
           COALESCE(c.cluster, d.doc_id) AS cluster,
           CAST(COALESCE(c.cluster, d.doc_id) = d.doc_id AS INT) AS keep
    FROM (SELECT DISTINCT doc_id FROM documents) d
    LEFT JOIN clusters c ON c.doc_id = d.doc_id
"""


def q_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    from graph_data_science_spark.datapipe.dedup import cross_contamination

    docs = _t(spark, sf_dir, "documents")
    holdout = docs.filter(F.col("doc_id") % 7 == 0)
    train = docs.filter(F.col("doc_id") % 7 != 0)
    out = cross_contamination(train, holdout)
    return out.select(
        "doc_id",
        "shared_shingles",
        F.col("contaminated").cast("int").alias("contaminated"),
    )


Q_CONTAMINATION_SQL = f"""
    WITH {_SHINGLES_SQL},
    tr AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 7 <> 0),
    ho AS (SELECT doc_id, shingle FROM sh WHERE doc_id % 7 = 0),
    hits AS (
        SELECT doc_id, COUNT(*) AS shared_shingles
        FROM ho WHERE shingle IN (SELECT shingle FROM tr)
        GROUP BY doc_id
    )
    SELECT d.doc_id,
           COALESCE(h.shared_shingles, 0) AS shared_shingles,
           CAST(COALESCE(h.shared_shingles, 0) > 0 AS INT) AS contaminated
    FROM (SELECT DISTINCT doc_id FROM documents WHERE doc_id % 7 = 0) d
    LEFT JOIN hits h ON h.doc_id = d.doc_id
"""


def q_vocab_top_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    from graph_data_science_spark.datapipe.textstats import vocab_top_ngrams

    return vocab_top_ngrams(_t(spark, sf_dir, "documents"), n=2, k=50)


Q_VOCAB_SQL = """
    WITH t AS (
        SELECT regexp_split_to_array(trim(text), '\\s+') AS toks
        FROM documents WHERE len(trim(text)) > 0
    ),
    g AS (
        SELECT toks[i] || ' ' || toks[i+1] AS gram
        FROM t, UNNEST(range(1, GREATEST(len(toks), 1))) AS u(i)
        WHERE len(toks) >= 2
    )
    SELECT gram, COUNT(*) AS occurrences
    FROM g GROUP BY gram
    ORDER BY occurrences DESC, gram ASC
    LIMIT 50
"""


def q_pregel_sssp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted SSSP written as a USER program on the declarative Pregel
    API (pregel/examples.py:sssp_pregel, the reference pregel-example
    re-derived) — must produce exactly what the native operator's oracle
    expects (Q_SSSP_SQL, closed-form supply-tree distances)."""
    from graph_data_science_spark.pregel.examples import sssp_pregel
    from graph_data_science_spark.queries_ext import _supply_tree_graph

    g = _supply_tree_graph(spark, sf_dir, weighted=True)
    res = sssp_pregel(g, source=0)
    return res.state.filter(F.col("distance").isNotNull()).select(
        "node_id", F.col("distance").cast("long").alias("distance")
    )


def q_pregel_cc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components as a USER Pregel program (reference cc
    example) over the symmetrized order-chain graph — must match the
    native WCC's closed-form oracle (component = min orderkey per
    customer chain)."""
    from graph_data_science_spark.pregel.examples import connected_components_pregel
    from graph_data_science_spark.queries import _order_chain_graph
    from graph_data_science_spark.graph.build import LinkGraph

    g = _order_chain_graph(spark, sf_dir)
    sym = g.edges.union(
        g.edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "weight")
    )
    res = connected_components_pregel(
        LinkGraph(edges=sym, vertices=g.vertices, node_count=g.node_count)
    )
    return res.state.select("node_id", "component")


QUERIES_EXT17 = {
    "dedup_clusters_docs": q_dedup_clusters,
    "contamination_docs": q_contamination,
    "vocab_top_bigrams": q_vocab_top_bigrams,
    "pregel_sssp_supply_tree": q_pregel_sssp,
    "pregel_cc_order_chains": q_pregel_cc,
}


def _late_oracles() -> dict:
    # Q_SSSP_SQL lives in queries_ext, whose import may be in progress
    # when this module loads first (see queries._merge_ext note).
    from graph_data_science_spark.queries import Q_WCC_SQL
    from graph_data_science_spark.queries_ext import Q_SSSP_SQL

    return {
        "pregel_sssp_supply_tree": Q_SSSP_SQL,
        "pregel_cc_order_chains": Q_WCC_SQL,
    }


ORACLES_EXT17 = {
    "dedup_clusters_docs": Q_DEDUP_CLUSTERS_SQL,
    "contamination_docs": Q_CONTAMINATION_SQL,
    "vocab_top_bigrams": Q_VOCAB_SQL,
    **_late_oracles(),
}
