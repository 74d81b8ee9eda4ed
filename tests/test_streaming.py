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


def _ts_rows(spark, rows):
    """rows: (conv_id, turn_idx, tool, ts_string)."""
    return spark.createDataFrame(
        [(c, i, "user", f"text {c} {i}", t, ts) for (c, i, t, ts) in rows],
        "conv_id string, turn_idx int, role string, text string, tool string, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))


def test_stateful_sessionization(spark, tmp_path):
    """applyInPandasWithState sessionizer: a conversation closes once the
    event-time watermark passes last_ts + gap, emitting one summary row."""
    from graph_data_science_spark.streaming.links import (
        read_transcript_stream,
        streaming_conversation_sessions,
    )

    inp = str(tmp_path / "sess_in")
    # file 1: conv a (3 turns, one tool call) around 10:00
    _ts_rows(spark, [
        ("a", 0, None, "2024-01-01 10:00:00"),
        ("a", 1, "search", "2024-01-01 10:01:00"),
        ("a", 2, None, "2024-01-01 10:02:00"),
    ]).coalesce(1).write.mode("append").parquet(inp)
    # file 2 advances event time to 12:00; file 3 to 14:00 (watermark for the
    # third micro-batch = 12:00 - 1s > 10:32 -> conv a times out and emits)
    _ts_rows(spark, [("b", 0, None, "2024-01-01 12:00:00")]).coalesce(1).write.mode(
        "append"
    ).parquet(inp)
    _ts_rows(spark, [("c", 0, None, "2024-01-01 14:00:00")]).coalesce(1).write.mode(
        "append"
    ).parquet(inp)

    stream = read_transcript_stream(spark, inp, max_files_per_trigger=1)
    q = (
        streaming_conversation_sessions(stream, gap="30 minutes", watermark="1 second")
        .writeStream.format("memory")
        .queryName("sess_sink")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {r["conv_id"]: r for r in spark.sql("SELECT * FROM sess_sink").collect()}
    assert "a" in got, f"expected conv a session, got {sorted(got)}"
    a = got["a"]
    assert a["n_turns"] == 3
    assert a["n_tool_calls"] == 1
    assert a["max_turn_idx"] == 2
    assert (a["session_end"] - a["session_start"]).total_seconds() == 120


def test_streaming_dedup_exact(spark, tmp_path):
    from graph_data_science_spark.streaming.links import streaming_dedup_exact

    inp = str(tmp_path / "dedup_in")
    _ts_rows(spark, [
        ("d1", 0, None, "2024-01-01 10:00:00"),
        ("d2", 0, None, "2024-01-01 10:00:30"),
    ]).withColumn("text", F.lit("same body")).coalesce(1).write.mode("append").parquet(inp)
    _ts_rows(spark, [
        ("d3", 0, None, "2024-01-01 10:01:00"),  # dup of the same body
        ("d4", 0, None, "2024-01-01 10:02:00"),
    ]).withColumn(
        "text", F.when(F.col("conv_id") == "d3", "same body").otherwise("unique body")
    ).coalesce(1).write.mode("append").parquet(inp)

    stream = spark.readStream.schema(
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    ).option("maxFilesPerTrigger", "1").parquet(inp)
    q = (
        streaming_dedup_exact(stream, content_col="text", watermark="1 hour")
        .writeStream.format("memory")
        .queryName("dedup_sink")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    kept = [r["conv_id"] for r in spark.sql("SELECT conv_id FROM dedup_sink").collect()]
    # one survivor for "same body" (first arrival) + the unique doc
    assert sorted(kept) == ["d1", "d4"] or sorted(kept) == ["d2", "d4"]
    assert "_digest" not in spark.sql("SELECT * FROM dedup_sink").columns
