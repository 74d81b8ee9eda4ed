"""Sequence packing: assign documents to fixed-token-budget training
sequences (concatenate-then-chunk semantics).

The op every LLM data loader needs between "clean corpus" and "training
batches": documents are concatenated in a deterministic order and the
stream is chunked every ``budget`` tokens; each document is tagged with
the sequence it STARTS in and its token offset there.

Scale shape: documents are first scattered into ``n_buckets`` uniform
hash buckets (each bucket packs independently — at 100 TB you size
``n_buckets`` so one bucket's token stream fits a task), then ONE window
cumulative sum per bucket over the deterministic order
(portable-md5 hash, then id). No global sort, no driver state, and the
order is a pure row function, so reruns, repartitioning, and the DuckDB
oracle produce the identical packing.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from graph_data_science_spark.datapipe.dedup import portable_hash
from graph_data_science_spark.datapipe.textstats import tokens_col


def pack_sequences(
    df: DataFrame,
    budget: int = 2048,
    n_buckets: int = 256,
    seed: int | str = "pack",
    id_col: str = "doc_id",
    text_col: str = "text",
    n_tokens: Column | None = None,
) -> DataFrame:
    """(id, n_tokens, bucket, seq_id, token_offset): document → packed
    training-sequence assignment.

    ``seq_id`` = which fixed-``budget`` chunk of the bucket's concatenated
    token stream this document starts in; ``token_offset`` = its starting
    position inside that chunk. Documents longer than ``budget`` simply
    span chunks (continuation is the loader's business). ``n_tokens``
    defaults to the whitespace token count of ``text_col``; pass a column
    (e.g. a BPE count) to override.
    """
    toks = n_tokens if n_tokens is not None else F.size(tokens_col(F.col(text_col)))
    h = portable_hash(F.col(id_col).cast("string"), seed)
    base = df.select(
        F.col(id_col),
        toks.cast("long").alias("n_tokens"),
        h.alias("_h"),
        (h % n_buckets).alias("bucket"),
    )
    w = (
        Window.partitionBy("bucket")
        .orderBy("_h", id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return base.select(
        id_col,
        "n_tokens",
        "bucket",
        F.floor(prev / F.lit(float(budget))).cast("long").alias("seq_id"),
        (prev % budget).alias("token_offset"),
    )
