"""Structured Streaming ingestion for the transcript link graph.

GDS has no streaming story — graphs are projected once into memory
(``graph-projection-api``). The Spark-native pipeline splits the problem
the way a 10^12-turn deployment must:

- **ingest (this module)**: a continuous ``readStream`` over arriving
  transcript files/partitions derives link edges *statelessly* (a turn's
  reply edge points to its predecessor key, a pure row-local expression;
  tool edges are row-local too), plus watermarked streaming aggregates
  (degree counts in update mode, session/activity windows) — all standard
  Structured Streaming operators;
- **analytics (the batch engine)**: iterative algorithms run on graph
  snapshots via ``foreachBatch`` — every micro-batch appends new edges to
  the edge store and recomputes PageRank on the grown snapshot from
  scratch (a superstep checkpoint taken over one snapshot is not
  resumable against a different snapshot — the lineage guard rejects it
  by design; the incremental knob is the trigger cadence). Iterative
  fixpoints are NOT expressible as a single streaming query (they need
  unbounded iteration over global state), so the snapshot-refresh
  pattern is the honest scale design, not a limitation of this engine.

Edges are keyed by NATURAL keys (conv_id/turn_idx/tool) in the stream —
dense-id assignment is a global operation (graph.ids.dense_ids) and
belongs to the snapshot job, exactly like GDS separates projection from
execution.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TRANSCRIPT_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
)

EDGE_KEYS_SCHEMA = (
    "src_conv string, src_turn int, dst_kind string, dst_conv string, "
    "dst_turn int, dst_tool string, ts timestamp"
)


def read_transcript_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream of transcript rows (parquet parts arriving in
    ``path``). On a production cluster the same call points at the Iceberg
    table / Kafka topic; the transform contract downstream is identical."""
    reader = spark.readStream.schema(TRANSCRIPT_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.parquet(path)


def derive_link_edges_stream(transcripts: DataFrame) -> DataFrame:
    """Stateless edge derivation: one output row per link, keyed naturally.

    - reply: turn i (i > 0) links to turn i-1 of the same conversation —
      row-local arithmetic, no window/join, so it streams unmodified;
    - tool: turns with a non-null tool link to the tool entity.
    """
    reply = transcripts.filter(F.col("turn_idx") > 0).select(
        F.col("conv_id").alias("src_conv"),
        F.col("turn_idx").alias("src_turn"),
        F.lit("turn").alias("dst_kind"),
        F.col("conv_id").alias("dst_conv"),
        (F.col("turn_idx") - 1).alias("dst_turn"),
        F.lit(None).cast("string").alias("dst_tool"),
        "ts",
    )
    tool = transcripts.filter(F.col("tool").isNotNull()).select(
        F.col("conv_id").alias("src_conv"),
        F.col("turn_idx").alias("src_turn"),
        F.lit("tool").alias("dst_kind"),
        F.lit(None).cast("string").alias("dst_conv"),
        F.lit(None).cast("int").alias("dst_turn"),
        F.col("tool").alias("dst_tool"),
        "ts",
    )
    return reply.unionByName(tool)


def streaming_degree_counts(edges: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Running out-degree per source turn (update-mode streaming aggregate
    with a watermark bounding state). The degree-centrality operator's
    streaming twin."""
    return (
        edges.withWatermark("ts", watermark)
        .groupBy("src_conv", "src_turn")
        .agg(F.count("*").alias("degree"))
    )


def streaming_activity_windows(
    transcripts: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Turns + tool calls per conversation per event-time window — the
    watermarked windowed aggregate the north rule's late-data handling
    calls for."""
    return (
        transcripts.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), "conv_id")
        .agg(
            F.count("*").alias("n_turns"),
            F.sum(F.when(F.col("tool").isNotNull(), 1).otherwise(0)).alias("n_tool_calls"),
        )
        .select("win", "conv_id", "n_turns", "n_tool_calls")
    )


def _duration_ms(spec: str) -> int:
    """Parse 'N unit' durations ('30 minutes', '1 hour') to milliseconds."""
    n, unit = spec.split()
    factor = {
        "millisecond": 1, "second": 1000, "minute": 60_000, "hour": 3_600_000,
        "day": 86_400_000,
    }[unit.rstrip("s")]
    return int(n) * factor


def streaming_conversation_sessions(
    transcripts: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "1 second",
) -> DataFrame:
    """Custom stateful streaming operator: sessionize conversations with
    ``applyInPandasWithState`` + event-time timeout.

    A conversation's session stays open while turns keep arriving; once the
    event-time watermark passes ``last_ts + gap`` the session closes and ONE
    summary row streams out: (conv_id, session_start, session_end, n_turns,
    n_tool_calls, max_turn_idx). State per key is a 5-field scalar tuple —
    O(open conversations), bounded by the timeout, and the kernel is pandas
    column ops over each Arrow batch (no per-row Python). This is the
    north rule's "custom stateful operator" slot: session windows with a
    per-key aggregate that built-in ``session_window`` can't carry (the
    max-turn-index column participates in the per-turn text-equality
    invariant join-back)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    gap_ms = _duration_ms(gap)
    out_schema = (
        "conv_id string, session_start timestamp, session_end timestamp, "
        "n_turns long, n_tool_calls long, max_turn_idx int"
    )
    state_schema = "start_ms long, last_ms long, n_turns long, n_tools long, max_idx int"

    def sessionize(key, pdf_iter, state):
        import pandas as pd

        if state.hasTimedOut:
            start_ms, last_ms, n_turns, n_tools, max_idx = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "conv_id": [key[0]],
                    "session_start": [pd.to_datetime(start_ms, unit="ms")],
                    "session_end": [pd.to_datetime(last_ms, unit="ms")],
                    "n_turns": [n_turns],
                    "n_tool_calls": [n_tools],
                    "max_turn_idx": [max_idx],
                }
            )
            return
        start_ms = last_ms = None
        n_turns = n_tools = 0
        max_idx = -1
        if state.exists:
            start_ms, last_ms, n_turns, n_tools, max_idx = state.get
        for pdf in pdf_iter:
            if not len(pdf):
                continue
            ts_ms = pdf["ts"].astype("int64") // 1_000_000
            n_turns += len(pdf)
            n_tools += int(pdf["tool"].notna().sum())
            lo, hi = int(ts_ms.min()), int(ts_ms.max())
            start_ms = lo if start_ms is None else min(start_ms, lo)
            last_ms = hi if last_ms is None else max(last_ms, hi)
            max_idx = max(max_idx, int(pdf["turn_idx"].max()))
        if last_ms is not None:
            state.update((start_ms, last_ms, n_turns, n_tools, max_idx))
            state.setTimeoutTimestamp(last_ms + gap_ms)

    return (
        transcripts.withWatermark("ts", watermark)
        .groupBy("conv_id")
        .applyInPandasWithState(
            sessionize, out_schema, state_schema, "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )


def streaming_dedup_exact(
    documents: DataFrame,
    content_col: str = "text",
    watermark: str = "1 hour",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming exact dedup: keep the first arrival of each content digest,
    dropping duplicates that land within the watermark horizon
    (``dropDuplicatesWithinWatermark`` — JVM-side state store keyed by the
    md5 digest, state evicted once the watermark passes, so memory is
    bounded by the dup-arrival window rather than corpus size). The
    streaming twin of ``datapipe/dedup.py``'s exact hash-groupBy."""
    return (
        documents.withColumn("_digest", F.md5(F.col(content_col).cast("binary")))
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["_digest"])
        .drop("_digest")
    )


def run_incremental_pagerank(
    spark: SparkSession,
    transcript_stream: DataFrame,
    transcript_store: str,
    scores_out: str,
    checkpoint_dir: str,
    tolerance: float = 1e-6,
    max_iterations: int = 50,
):
    """foreachBatch maintenance loop: append each micro-batch's transcript
    rows to the parquet store, then refresh PageRank on the full snapshot,
    WARM-STARTED from the previous batch's scores (``pagerank``'s
    ``initial_scores`` residual push): an unchanged graph costs one no-op
    residual superstep, and a slightly-grown snapshot costs work
    proportional to the drift, not to |V|. (A superstep checkpoint taken
    over one snapshot is still NOT resumable against a grown snapshot —
    the lineage guard rejects it by design; warm-starting is the supported
    incremental path.) Returns the StreamingQuery; callers trigger with
    availableNow for catch-up runs or processingTime for continuous
    refresh."""
    from graph_data_science_spark.algorithms.pagerank import pagerank
    from graph_data_science_spark.transcripts import derive_link_graph

    def refresh(batch_df: DataFrame, batch_id: int) -> None:
        import os as _os

        if batch_df.isEmpty():
            return
        spark_b = batch_df.sparkSession
        batch_df.write.mode("append").parquet(transcript_store)
        snapshot = spark_b.read.parquet(transcript_store)
        tg = derive_link_graph(snapshot)
        prev_scores = None
        if _os.path.isdir(scores_out):
            # Previous batch's (conv_id, turn_idx, score) joined back to
            # THIS snapshot's node ids; turns new to this batch have no
            # row and warm-start from 0 (their residual is their full
            # init mass — exactly the localized work).
            prev_scores = (
                spark_b.read.parquet(scores_out)
                .join(tg.turn_ids, ["conv_id", "turn_idx"])
                .select("node_id", "score")
            )
        res = pagerank(
            tg.graph,
            tolerance=tolerance,
            max_iterations=max_iterations,
            initial_scores=prev_scores,
        )
        (
            res.scores.join(tg.turn_ids, "node_id")
            .select("conv_id", "turn_idx", "score", F.lit(batch_id).alias("batch_id"))
            .write.mode("overwrite")
            .parquet(scores_out)
        )

    return (
        transcript_stream.writeStream.foreachBatch(refresh)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .start()
    )
