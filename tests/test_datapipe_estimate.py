"""Estimate coverage for the datapipe operators (r4 item: the 100 TB
components get the same spill-not-abort prediction as the algorithm
registry)."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from graph_data_science_spark.datapipe.estimate import estimate_datapipe  # noqa: E402


@pytest.mark.parametrize(
    "op", ["dedup_clusters", "lsh_cosine_topk", "pack_sequences",
           "dedup_exact", "minhash_signatures", "lsh_candidate_pairs",
           "contamination_docs", "ann_cosine_topk"]
)
def test_estimate_rows_exist_and_scale(op):
    small = estimate_datapipe(op, 1_000_000)
    big = estimate_datapipe(op, 100_000_000)
    for r in (small, big):
        assert r["bytesMin"] > 0 and r["bytesMax"] >= r["bytesMin"]
        assert r["predictedShuffleMb"] >= 0 and r["dominantStage"]
    # corpus-linear ops must scale ~100x
    assert big["bytesMax"] / small["bytesMax"] > 50


def test_estimate_knobs_move_the_model():
    base = estimate_datapipe("minhash_signatures", 10_000_000, num_hashes=64)
    more = estimate_datapipe("minhash_signatures", 10_000_000, num_hashes=256)
    assert more["predictedStateMb"] > base["predictedStateMb"] * 2
    narrow = estimate_datapipe("ann_cosine_topk", 10_000_000, dim=16, n_queries=10)
    wide = estimate_datapipe("ann_cosine_topk", 10_000_000, dim=1024, n_queries=10)
    assert wide["predictedStateMb"] > narrow["predictedStateMb"] * 10


def test_estimate_unknown_op_raises():
    with pytest.raises(KeyError):
        estimate_datapipe("no_such_op", 100)


def test_procedures_facade_exposes_datapipe_estimate(spark, tmp_path):
    from graph_data_science_spark.api import GraphCatalog, Procedures

    p = Procedures(GraphCatalog(spark, str(tmp_path / "cat")))
    r = p.estimate_datapipe("pack_sequences", 5_000_000)
    assert r["operator"] == "pack_sequences" and r["bytesMax"] > 0
