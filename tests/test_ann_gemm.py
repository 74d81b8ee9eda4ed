"""GEMM exact cosine top-k (datapipe/ann.py:cosine_topk_gemm) must agree
with the expression-path baseline (cosine_topk) — same neighbors, sims
equal to float64 summation-order noise.
"""

import os
import sys

import numpy as np
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from graph_data_science_spark.datapipe.ann import cosine_topk, cosine_topk_gemm  # noqa: E402


def _embeddings(spark, n=120, dim=16, seed=9):
    rng = np.random.default_rng(seed)
    rows = [(i, [float(x) for x in rng.standard_normal(dim)]) for i in range(n)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_gemm_matches_expression_path(spark):
    corpus = _embeddings(spark)
    queries = corpus.filter(F.col("vec_id") < 10)
    a = cosine_topk(corpus, queries, k=5).collect()
    b = cosine_topk_gemm(corpus.repartition(7), queries, k=5).collect()
    ka = {(r["query_id"], r["rank"]): r for r in a}
    kb = {(r["query_id"], r["rank"]): r for r in b}
    assert set(ka) == set(kb)
    for key, ra in ka.items():
        rb = kb[key]
        assert abs(ra["sim"] - rb["sim"]) < 1e-9
        assert ra["neighbor_id"] == rb["neighbor_id"]


def test_gemm_query_cap(spark):
    corpus = _embeddings(spark, n=30)
    try:
        cosine_topk_gemm(corpus, corpus, k=3, max_query_vectors=10)
        raise AssertionError("expected ValueError on oversized query side")
    except ValueError:
        pass
