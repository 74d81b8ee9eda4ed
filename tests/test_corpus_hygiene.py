"""Corpus-hygiene pipeline ops: fuzzy dedup clusters (LSH pairs → WCC),
train/eval contamination, corpus vocabulary top-k."""

from pyspark.sql import functions as F

from graph_data_science_spark.datapipe.dedup import (
    cross_contamination,
    dedup_clusters,
)
from graph_data_science_spark.datapipe.textstats import vocab_top_ngrams


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_dedup_clusters_transitive(spark):
    # 0~1 and 1~2 are near-dups (2 shares nothing with 0 directly beyond
    # transitivity through 1); 3 is a singleton; 4 duplicates 0 exactly.
    base = "the quick brown fox jumps over the lazy dog near the river bank"
    mid = "the quick brown fox jumps over the lazy dog near the river delta"
    far = "a quick brown fox jumps over the lazy dog near the river delta"
    rows = [
        (0, base),
        (1, mid),
        (2, far),
        (3, "completely unrelated text about graph engines and spark plans here"),
        (4, base),
    ]
    out = dedup_clusters(_docs(spark, rows), threshold=0.3).orderBy("doc_id").collect()
    got = {r["doc_id"]: (r["cluster"], r["keep"]) for r in out}
    assert got[0] == (0, True)
    assert got[1] == (0, False)
    assert got[2] == (0, False)  # transitive through doc 1
    assert got[3] == (3, True)
    assert got[4] == (0, False)
    # exactly one representative per cluster
    keeps = [d for d, (c, k) in got.items() if k]
    assert sorted(keeps) == [0, 3]


def test_dedup_clusters_no_pairs(spark):
    rows = [(i, f"totally distinct document number {i} with unique words w{i}a w{i}b w{i}c") for i in range(4)]
    out = dedup_clusters(_docs(spark, rows), threshold=0.9).collect()
    assert all(r["cluster"] == r["doc_id"] and r["keep"] for r in out)


def test_cross_contamination_counts(spark):
    train = _docs(spark, [(10, "alpha beta gamma delta epsilon zeta")])
    holdout = _docs(
        spark,
        [
            (1, "alpha beta gamma delta"),  # shares 2 trigrams
            (2, "nothing in common at all here"),
            (3, ""),  # empty → 0 shingles
        ],
    )
    out = {r["doc_id"]: r for r in cross_contamination(train, holdout).collect()}
    assert out[1]["shared_shingles"] == 2 and out[1]["contaminated"]
    assert out[2]["shared_shingles"] == 0 and not out[2]["contaminated"]
    assert out[3]["shared_shingles"] == 0 and not out[3]["contaminated"]


def test_vocab_top_ngrams_order_and_ties(spark):
    rows = [
        (0, "x y x y x y"),  # "x y" ×3, "y x" ×2
        (1, "a b"),
        (2, "a b"),
        (3, "b a"),
    ]
    out = vocab_top_ngrams(_docs(spark, rows), n=2, k=3).collect()
    assert [(r["gram"], r["occurrences"]) for r in out] == [
        ("x y", 3),
        ("a b", 2),
        ("y x", 2),  # tie with "a b" broken lexicographically: a b first
    ]


def test_vocab_top_ngrams_short_docs(spark):
    rows = [(0, "solo"), (1, ""), (2, "two words")]
    out = vocab_top_ngrams(_docs(spark, rows), n=2, k=10).collect()
    assert [(r["gram"], r["occurrences"]) for r in out] == [("two words", 1)]


def test_minhash_family_matches_hashlib_replay(spark):
    """The single-digest affine MinHash family (b1 + j*b2 over md5 halves)
    must match an independent hashlib replay — this is the exact formula
    the DuckDB oracles re-express in SQL (`queries._minhash_perm_sql`)."""
    import hashlib

    from graph_data_science_spark.datapipe.dedup import minhash_signatures

    df = _docs(spark, [(7, "alpha beta gamma")])  # exactly one 3-shingle
    got = minhash_signatures(df, num_perm=4).collect()[0]
    hx = hashlib.md5(b"alpha beta gamma").hexdigest()
    b1, b2 = int(hx[0:13], 16), int(hx[13:26], 16)
    for j in range(4):
        assert got[f"h{j}"] == b1 + j * b2, (j, got[f"h{j}"], b1 + j * b2)
