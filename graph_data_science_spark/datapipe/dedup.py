"""Deduplication family for training-data pipelines.

- exact: hash-groupBy on normalized text (one shuffle on the digest);
- n-gram Jaccard: word-shingle explode → shingle join → pair aggregation —
  the exact (quadratic-in-collisions) baseline;
- MinHash + LSH: portable-hash minhash signatures, banded bucket join for
  candidates, exact-Jaccard verification — the 100 TB path (cost is linear
  in corpus + candidates, never all-pairs);
- SimHash: per-bit majority over token hashes, near-dup via band join on
  signature chunks.

Portability contract: every hash is ``int(md5(s)[:15 hex], 16)`` — Spark
``conv(substr(md5(s),1,15),16,10)`` ≡ DuckDB ``('0x'||substr(md5(s),1,15))::bigint``
— so the DuckDB oracle in ``__spark_entry__.py`` reproduces signatures
bit-for-bit. 15 hex digits < 2^60 keeps everything in signed int64.

Scale notes: the shingle→doc explode is the big intermediate (≈ tokens ×
docs); it flows straight into an aggregation (map-side combined). Shingle
hash keys distribute uniformly, so the bucket joins are skew-free by
construction; the LSH band join key includes the band id, splitting hot
buckets 1/bands further.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from graph_data_science_spark.datapipe.textstats import tokens_col


def portable_hash(col: Column, seed: int | str = "") -> Column:
    """int64 hash reproducible in any SQL engine with md5: md5 hex → int."""
    payload = F.concat(F.lit(f"{seed}:"), col) if seed != "" else col
    return F.conv(F.substring(F.md5(payload), 1, 15), 16, 10).cast("long")


def exact_dedup(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, rep_id): rep_id = min id among documents with identical
    normalized text. Keep rows where id == rep_id to dedup."""
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    keyed = df.select(F.col(id_col), F.md5(norm).alias("_k"))
    reps = keyed.groupBy("_k").agg(F.min(id_col).alias("rep_id"))
    return keyed.join(reps, "_k").select(id_col, "rep_id")


def word_shingles(df: DataFrame, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    """Distinct n-word shingles per document: (id, shingle).

    Documents with fewer than ``n`` tokens (incl. empty text) produce zero
    shingles: ``sequence(0, size-n)`` would step *downward* when size < n
    (Spark yields [0, -1, ...]) and then ``slice`` throws on start 0, so the
    index list is guarded to an empty array in that case.
    """
    toks = tokens_col(F.col(text_col))
    # shingle i = tokens[i..i+n-1] joined by single spaces, 0-based i.
    idx = F.when(
        F.size(toks) >= n, F.sequence(F.lit(0), F.size(toks) - n)
    ).otherwise(F.array().cast("array<int>"))
    shingles = F.transform(idx, lambda i: F.array_join(F.slice(toks, i + 1, n), " "))
    return (
        df.select(F.col(id_col), F.explode(shingles).alias("shingle"))
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact n-gram-Jaccard near-dup pairs (a < b, jaccard ≥ threshold)."""
    sh = word_shingles(df, id_col, text_col, n)
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("sz"))
    a = sh.select(F.col(id_col).alias("a"), "shingle")
    b = sh.select(F.col(id_col).alias("b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("c"))
    )
    sa = sizes.select(F.col(id_col).alias("a"), F.col("sz").alias("sza"))
    sb = sizes.select(F.col(id_col).alias("b"), F.col("sz").alias("szb"))
    return (
        inter.join(sa, "a").join(sb, "b")
        .select(
            "a",
            "b",
            (F.col("c") / (F.col("sza") + F.col("szb") - F.col("c"))).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 8,
    n: int = 3,
) -> DataFrame:
    """(id, h0..h{num_perm-1}): minhash over distinct word shingles with a
    portable hash family. Documents with no shingles get all-(-1).

    ONE md5 digest per shingle, not one per permutation: the digest is
    split into two independent 52-bit integers (b1, b2) and permutation
    j's hash is ``b1 + j*b2`` (Kirsch–Mitzenmacher double hashing — the
    standard single-base-hash + affine-permutation MinHash construction).
    Production LSH runs num_perm = 128+, where a digest per permutation
    multiplies the corpus-scan CPU 128×; the affine family costs one
    64-bit multiply-add per permutation instead, and stays replayable as
    pure integer SQL in any engine with md5. Max value 2^52 + 127·2^52 <
    2^59 — no int64 overflow up to num_perm = 2048."""
    sh = word_shingles(df, id_col, text_col, n)
    digest = F.md5(F.col("shingle"))
    hashed = sh.select(
        F.col(id_col),
        F.conv(F.substring(digest, 1, 13), 16, 10).cast("long").alias("_b1"),
        F.conv(F.substring(digest, 14, 13), 16, 10).cast("long").alias("_b2"),
    )
    aggs = [
        F.min(F.col("_b1") + F.lit(j) * F.col("_b2")).alias(f"h{j}") for j in range(num_perm)
    ]
    sig = hashed.groupBy(id_col).agg(*aggs)
    ids = df.select(id_col).distinct()
    return ids.join(sig, id_col, "left").select(
        id_col, *[F.coalesce(F.col(f"h{j}"), F.lit(-1)).alias(f"h{j}") for j in range(num_perm)]
    )


def lsh_candidate_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 8,
    bands: int = 4,
    n: int = 3,
    threshold: float = 0.5,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """MinHash-LSH near-dup pairs: band-bucket join for candidates, exact
    shingle-Jaccard verification ≥ threshold. Never computes all pairs.

    The verification stream is pruned *before* the pair-generating join:
    shingles are semi-joined to candidate doc ids on each side first, so a
    hot shingle shared by k docs outside the candidate set contributes 0
    rows instead of k² (the naive plan computes the full shingle-collision
    stream and only then semi-joins on (a, b), which Catalyst cannot push
    below the join that creates the pair).

    ``max_shingle_df``: optional document-frequency cap — shingles appearing
    in more than this many *candidate* documents are dropped from the
    verification join (standard MinHash practice for stop-phrase shingles).
    This makes the verified Jaccard approximate; leave None for the exact
    metric.
    """
    assert num_perm % bands == 0
    rows_per_band = num_perm // bands
    sig = minhash_signatures(df, id_col, text_col, num_perm, n)
    band_rows = []
    for b in range(bands):
        cols = [F.col(f"h{b * rows_per_band + r}") for r in range(rows_per_band)]
        band_rows.append(
            sig.select(
                F.col(id_col),
                F.lit(b).alias("band"),
                F.concat_ws("_", *[c.cast("string") for c in cols]).alias("bucket"),
            )
        )
    banded = band_rows[0]
    for br in band_rows[1:]:
        banded = banded.union(br)
    la = banded.select(F.col(id_col).alias("a"), "band", "bucket")
    lb = banded.select(F.col(id_col).alias("b"), "band", "bucket")
    cand = la.join(lb, ["band", "bucket"]).filter(F.col("a") < F.col("b")).select("a", "b").distinct()

    # Exact Jaccard verification restricted to LSH candidates. Prune the
    # shingle stream to candidate ids BEFORE the pair join (see docstring).
    sh = word_shingles(df, id_col, text_col, n)
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("sz"))
    sa = sh.select(F.col(id_col).alias("a"), "shingle").join(
        cand.select("a"), "a", "left_semi"
    )
    sb = sh.select(F.col(id_col).alias("b"), "shingle").join(
        cand.select("b"), "b", "left_semi"
    )
    if max_shingle_df is not None:
        rare = (
            sa.select(F.col("a").alias(id_col), "shingle")
            .union(sb.select(F.col("b").alias(id_col), "shingle"))
            .distinct()
            .groupBy("shingle")
            .agg(F.count("*").alias("_df"))
            .filter(F.col("_df") <= max_shingle_df)
            .select("shingle")
        )
        sa = sa.join(rare, "shingle", "left_semi")
        sb = sb.join(rare, "shingle", "left_semi")
    inter = (
        sa.join(sb, "shingle")
        .filter(F.col("a") < F.col("b"))
        .join(cand, ["a", "b"], "left_semi")
        .groupBy("a", "b")
        .agg(F.count("*").alias("c"))
    )
    out = (
        inter.join(sizes.select(F.col(id_col).alias("a"), F.col("sz").alias("sza")), "a")
        .join(sizes.select(F.col(id_col).alias("b"), F.col("sz").alias("szb")), "b")
        .select(
            "a",
            "b",
            (F.col("c") / (F.col("sza") + F.col("szb") - F.col("c"))).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return out


def dedup_clusters(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 8,
    bands: int = 4,
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Fuzzy-dedup clusters: MinHash-LSH near-dup pairs → connected
    components (the engine's union-by-min WCC) → ``(id, cluster, keep)``.

    ``cluster`` = the minimum doc id transitively reachable through
    near-dup pairs (the canonical representative); ``keep`` = this doc IS
    the representative. Filtering ``keep`` dedups the corpus while
    retaining exactly one member per near-dup cluster — the standard
    corpus-level fuzzy-dedup contract (pair-level near-dup alone cannot
    decide which of A~B~C to keep).

    Scale shape: the pair graph holds only LSH-collision survivors, so WCC
    runs over a frame that is tiny relative to the corpus (vertices =
    docs appearing in ≥1 pair); the only corpus-sized step is one left
    join assigning ``cluster = id`` to untouched docs.
    """
    from graph_data_science_spark.algorithms.wcc import wcc
    from graph_data_science_spark.graph.build import LinkGraph

    pairs = lsh_candidate_pairs(df, id_col, text_col, num_perm, bands, n, threshold)
    pair_ids = (
        pairs.select(F.col("a").cast("long").alias("node_id"))
        .union(pairs.select(F.col("b").cast("long").alias("node_id")))
        .distinct()
    )
    edges = pairs.select(
        F.col("a").cast("long").alias("src"),
        F.col("b").cast("long").alias("dst"),
        F.lit(1.0).alias("weight"),
    )
    comp = wcc(LinkGraph(edges=edges, vertices=pair_ids)).components
    return (
        df.select(F.col(id_col).cast("long").alias(id_col))
        .distinct()
        .join(comp.withColumnRenamed("node_id", id_col), id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("component"), F.col(id_col)).alias("cluster"),
            (F.coalesce(F.col("component"), F.col(id_col)) == F.col(id_col)).alias("keep"),
        )
    )


def cross_contamination(
    train: DataFrame,
    holdout: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """Train/eval decontamination check: for every holdout document, count
    distinct n-word shingles that also appear ANYWHERE in the training
    corpus → ``(id, shared_shingles, contaminated)``.

    The canonical pre-training hygiene op (n-gram overlap against eval
    sets). Shape at 100 TB: train shingles collapse to a distinct shingle
    set once (map-side combined aggregation), the overlap is one semi-join
    on uniformly-hashed shingle strings (skew-free), and the count is a
    map-side-combinable aggregate — no pair explosion anywhere.
    """
    train_sh = word_shingles(train, id_col, text_col, n).select("shingle").distinct()
    hold_sh = word_shingles(holdout, id_col, text_col, n)
    hits = (
        hold_sh.join(train_sh, "shingle", "left_semi")
        .groupBy(id_col)
        .agg(F.count("*").alias("shared_shingles"))
    )
    return (
        holdout.select(id_col)
        .distinct()
        .join(hits, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("shared_shingles"), F.lit(0)).alias("shared_shingles"),
            (F.coalesce(F.col("shared_shingles"), F.lit(0)) > 0).alias("contaminated"),
        )
    )


def simhash(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 32,
) -> DataFrame:
    """(id, simhash long): per-bit majority vote over token-occurrence
    hashes (portable). 32 bits keeps every intermediate in int64."""
    toks = df.select(F.col(id_col), F.explode(tokens_col(F.col(text_col))).alias("tok"))
    h = portable_hash(F.col("tok"), seed="simhash")
    bit_sums = [
        F.sum(
            F.when(F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, F.lit(1)).otherwise(F.lit(-1))
        ).alias(f"b{b}")
        for b in range(bits)
    ]
    agg = toks.groupBy(id_col).agg(*bit_sums)
    sig = None
    for b in range(bits):
        term = F.when(F.col(f"b{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0))
        sig = term if sig is None else sig + term
    out = agg.select(F.col(id_col), sig.cast("long").alias("simhash"))
    ids = df.select(id_col).distinct()
    return ids.join(out, id_col, "left").select(
        id_col, F.coalesce(F.col("simhash"), F.lit(0)).alias("simhash")
    )
