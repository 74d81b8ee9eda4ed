"""Sequence packing (datapipe/packing.py): concatenate-then-chunk
invariants + layout independence.
"""

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from graph_data_science_spark.datapipe.packing import pack_sequences  # noqa: E402


def _docs(spark, n=200):
    # text with (id % 17 + 1) whitespace tokens
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.array_join(
            F.transform(F.sequence(F.lit(1), F.col("id") % 17 + 1), lambda i: F.lit("w")),
            " ",
        ).alias("text"),
    )


def test_pack_sequences_invariants(spark):
    budget, n_buckets = 64, 4
    out = pack_sequences(_docs(spark), budget=budget, n_buckets=n_buckets, seed="t").collect()
    assert len(out) == 200
    assert all(0 <= r["token_offset"] < budget for r in out)
    assert all(0 <= r["bucket"] < n_buckets for r in out)
    # replay the packing per bucket in plain python: offsets/seq ids must
    # equal the cumulative stream chunked every `budget` tokens
    by_bucket = {}
    for r in out:
        by_bucket.setdefault(r["bucket"], []).append(r)
    for rows in by_bucket.values():
        # the engine orders by (hash, id); offsets must be consistent with
        # SOME order — recover it by (seq_id, token_offset, doc_id)
        rows.sort(key=lambda r: (r["seq_id"], r["token_offset"], r["doc_id"]))
        cum = 0
        for r in rows:
            assert r["seq_id"] == cum // budget
            assert r["token_offset"] == cum % budget
            cum += r["n_tokens"]


def test_pack_sequences_layout_independent(spark):
    d = _docs(spark)
    a = sorted(map(tuple, pack_sequences(d, budget=64, n_buckets=4, seed="t").collect()))
    b = sorted(
        map(tuple, pack_sequences(d.repartition(13), budget=64, n_buckets=4, seed="t").collect())
    )
    assert a == b
