"""Structured Streaming ingestion: stateless edge derivation, watermarked
aggregates, and the foreachBatch snapshot-refresh PageRank loop — all run
with availableNow triggers over file sources (deterministic, no sleeps)."""

import os

from pyspark.sql import functions as F

from graph_data_science_spark.streaming.links import (
    derive_link_edges_stream,
    read_transcript_stream,
    run_incremental_pagerank,
    streaming_activity_windows,
    streaming_degree_counts,
)
from graph_data_science_spark.transcripts import synthesize_transcripts


def _write_batches(spark, base, n_batches=3, conv_per_batch=10):
    paths = []
    for b in range(n_batches):
        t = synthesize_transcripts(spark, conv_per_batch, seed=100 + b).withColumn(
            "conv_id", F.concat(F.lit(f"b{b}-"), F.col("conv_id"))
        )
        p = os.path.join(base, "in")
        t.coalesce(1).write.mode("append").parquet(p)
        paths.append(p)
    return os.path.join(base, "in")


def test_streaming_edges_and_degrees(spark, tmp_path):
    base = str(tmp_path)
    inp = _write_batches(spark, base, n_batches=2)
    stream = read_transcript_stream(spark, inp)
    assert stream.isStreaming
    edges = derive_link_edges_stream(stream)
    q = (
        edges.writeStream.format("memory")
        .queryName("edges_sink")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM edges_sink")
    batch = spark.read.parquet(inp)
    expected_reply = batch.filter(F.col("turn_idx") > 0).count()
    expected_tool = batch.filter(F.col("tool").isNotNull()).count()
    assert got.filter(F.col("dst_kind") == "turn").count() == expected_reply
    assert got.filter(F.col("dst_kind") == "tool").count() == expected_tool

    # watermarked running degrees (update mode)
    q2 = (
        streaming_degree_counts(derive_link_edges_stream(read_transcript_stream(spark, inp)))
        .writeStream.format("memory")
        .queryName("deg_sink")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    deg = spark.sql("SELECT MAX(degree) m, COUNT(*) n FROM deg_sink").collect()[0]
    assert deg["n"] > 0 and deg["m"] >= 1


def test_streaming_activity_windows(spark, tmp_path):
    inp = _write_batches(spark, str(tmp_path), n_batches=1)
    q = (
        streaming_activity_windows(read_transcript_stream(spark, inp), window="1 hour")
        .writeStream.format("memory")
        .queryName("act_sink")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # append mode only emits rows the watermark has closed; with a single
    # availableNow batch the final watermark closes all but the latest
    # windows — just assert the query ran and the schema is right.
    rows = spark.sql("SELECT * FROM act_sink")
    assert set(rows.columns) == {"win", "conv_id", "n_turns", "n_tool_calls"}


def test_incremental_pagerank_foreachbatch(spark, tmp_path):
    base = str(tmp_path)
    inp = _write_batches(spark, base, n_batches=2, conv_per_batch=8)
    store = os.path.join(base, "store")
    scores = os.path.join(base, "scores")
    ck = os.path.join(base, "ck")
    q = run_incremental_pagerank(
        spark,
        read_transcript_stream(spark, inp, max_files_per_trigger=1),
        transcript_store=store,
        scores_out=scores,
        checkpoint_dir=ck,
        max_iterations=30,
    )
    q.processAllAvailable()
    q.stop()
    out = spark.read.parquet(scores)
    # final snapshot scores cover every turn of everything ingested
    n_turns = spark.read.parquet(store).count()
    assert out.count() == n_turns
    # scores joined back by (conv_id, turn_idx): per-turn text equality
    joined = out.join(spark.read.parquet(store), ["conv_id", "turn_idx"])
    assert joined.count() == n_turns
    # warm-started incremental refreshes (batch 2+) must land on the same
    # fixpoint as a cold run over the final snapshot
    from graph_data_science_spark.algorithms import pagerank
    from graph_data_science_spark.transcripts import derive_link_graph

    tg = derive_link_graph(spark.read.parquet(store))
    cold = pagerank(tg.graph, tolerance=1e-6, max_iterations=30)
    ref = cold.scores.join(tg.turn_ids, "node_id").select("conv_id", "turn_idx", "score")
    diff = (
        out.select("conv_id", "turn_idx", F.col("score").alias("s1"))
        .join(ref.select("conv_id", "turn_idx", F.col("score").alias("s2")), ["conv_id", "turn_idx"])
        .filter(F.abs(F.col("s1") - F.col("s2")) > 1e-4)
        .count()
    )
    assert diff == 0
