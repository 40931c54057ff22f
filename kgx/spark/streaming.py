"""Structured Streaming surface (SURVEY.md §2 B.9).

The north rule is batch (checkpoint-resumable spark-submit jobs), but
the engine also exposes the incremental-ingest path as a real
Structured Streaming job: new transcript parquet files landing in a
directory are tagged with the same single-pass Viterbi UDF and rolled
into watermarked tumbling-window mention counts. The same stage
functions are reused — DataFrame code is identical for batch and
streaming in Spark; only source/sink differ.

At production scale this is the "10^12 turns keep arriving" story:
file (or Iceberg/Kafka) source -> per-microbatch tagging ->
windowed/stateful aggregation with late-data handling -> append sink,
with exactly-once bookkeeping from the streaming checkpoint.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kgx.spark import stages

TRANSCRIPT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("role", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("tool", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)


def stream_transcripts(spark: SparkSession, input_dir: str,
                       max_files_per_trigger: int = 8) -> DataFrame:
    """File-source stream of transcript turns (new parquet files are
    the arrival unit; Iceberg/Kafka sources are drop-ins)."""
    return (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )


def stream_mentions(turns: DataFrame, tag_spans_udf) -> DataFrame:
    """Streaming tag+decode -> exploded mention rows (stateless: the
    pandas UDF runs per micro-batch exactly as in batch)."""
    clean = turns.where(
        F.col("text").isNotNull() & (F.length(F.trim(F.col("text"))) > 0)
    )
    tagged = stages.tag_spans(clean, tag_spans_udf)
    return tagged.select(
        "conv_id", "turn_idx", "ts", F.explode("spans").alias("sp")
    ).select(
        "conv_id", "turn_idx", "ts",
        F.col("sp.begin").alias("begin"),
        F.col("sp.end").alias("end"),
        F.col("sp.surface").alias("surface"),
        F.col("sp.etype").alias("etype"),
    )


def windowed_mention_counts(turns: DataFrame, tag_spans_udf,
                            window: str = "10 minutes",
                            watermark: str = "30 minutes") -> DataFrame:
    """Watermarked tumbling-window mention counts per entity type.

    Late turns beyond the watermark are dropped (documented at-most
    lateness); state for closed windows is reclaimed — this is what
    bounds memory on an unbounded stream."""
    clean = turns.where(
        F.col("text").isNotNull() & (F.length(F.trim(F.col("text"))) > 0)
    )
    tagged = stages.tag_spans(clean, tag_spans_udf)
    mentions = tagged.select(
        "ts", F.explode("spans").alias("sp")
    ).select("ts", F.col("sp.etype").alias("etype"))
    return (
        mentions.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), "etype")
        .agg(F.count("*").alias("n_mentions"))
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "etype",
            "n_mentions",
        )
    )


def run_available_now(query_df: DataFrame, checkpoint_dir: str,
                      out_table: str, output_mode: str = "append"):
    """Drain everything currently available (Trigger.AvailableNow) into
    an in-memory sink; returns the StreamingQuery after completion.
    The checkpoint dir carries source offsets -> restarting later only
    processes files that arrived in between (incremental ingest)."""
    q = (
        query_df.writeStream.format("memory")
        .queryName(out_table)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def incremental_canon_updater(spark: SparkSession, warehouse: str,
                              dict_df: DataFrame):
    """foreachBatch sink that streams the KG GRAPH forward: each
    micro-batch of mentions is merged into the accumulated canonical
    node state (B.9 'incremental link/canon').

    Per batch: new (etype, norm) nodes are diffed against the node
    table; LSH candidate edges are generated ONLY for new x all (cost
    proportional to the batch, not history); connected components are
    re-solved SEEDED with the previous converged labels plus identity
    rows for new nodes — min-label propagation from a consistent seed
    reaches the same fixpoint as a cold start but in rounds
    proportional to the changed region. State lives in versioned
    TableIO snapshots (lazily-read previous versions stay valid while
    the new one is written), so the stream is restart-safe alongside
    the source checkpoint. Final (entity_map, cc_vertices) equal the
    batch pipeline's on the same data — tests/test_streaming_canon.py."""
    from kgx.spark.io import TableIO

    io = TableIO(warehouse)

    def update(mentions_batch: DataFrame, batch_id: int) -> None:
        if mentions_batch.isEmpty():
            return
        nodes_b = stages.link_nodes(mentions_batch, dict_df)
        if io.manifest("nodes") is not None:
            nodes_prev = io.read(spark, "nodes")
            edges_prev = io.read(spark, "lsh_edges")
            labels_prev = io.read(spark, "cc_labels")
            new_only = nodes_b.join(
                nodes_prev.select("node_id"), "node_id", "left_anti"
            ).dropDuplicates(["node_id"])
            nodes_all = nodes_prev.unionByName(new_only)
            lsh_new = stages.link_lsh_edges_incremental(new_only,
                                                        nodes_all)
            edges_all = edges_prev.unionByName(lsh_new).dropDuplicates(
                ["src", "dst"]
            )
            labels0 = labels_prev.unionByName(
                new_only.select(
                    "node_id", F.col("node_id").alias("label")
                )
            )
        else:
            nodes_all = nodes_b
            edges_all = stages.link_lsh_edges(nodes_all)
            labels0 = None
        io.write(nodes_all, "nodes")
        nodes_all = io.read(spark, "nodes")
        io.write(edges_all, "lsh_edges")
        edges_all = io.read(spark, "lsh_edges")
        labels = stages.connected_components(nodes_all, edges_all,
                                             labels0=labels0)
        io.write(labels, "cc_labels")
        labels = io.read(spark, "cc_labels")
        entity_map, cc_vertices = stages.canonicalize(nodes_all, labels)
        io.write(entity_map, "entity_map")
        io.write(cc_vertices, "cc_vertices")

    return update


def run_incremental_canon(spark: SparkSession, arrivals_dir: str,
                          checkpoint_dir: str, warehouse: str,
                          tag_spans_udf, dict_df: DataFrame,
                          max_files_per_trigger: int = 1):
    """Drain currently-available transcript files through the
    incremental link/canon path (Trigger.AvailableNow); restarting
    with the same checkpoint processes only files that arrived in
    between, merging them into the same warehouse state."""
    turns = stream_transcripts(
        spark, arrivals_dir,
        max_files_per_trigger=max_files_per_trigger)
    mentions = stream_mentions(turns, tag_spans_udf)
    q = (
        mentions.writeStream
        .foreachBatch(incremental_canon_updater(spark, warehouse,
                                                dict_df))
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def conv_state_tracker(turns: DataFrame, timeout_ms: int = 0) -> DataFrame:
    """Custom stateful streaming operator via applyInPandasWithState:
    per-conversation running summary (turns seen, chars, roles, last
    turn_idx/ts) maintained across micro-batches — the building block
    for streaming conv-level features (e.g. "tag only when a conv goes
    quiet"). State lives in the streaming state store (RocksDB/HDFS-
    backed on a cluster), so it survives restarts with the checkpoint.

    Emits one updated summary row per conv per micro-batch it appears
    in. With timeout_ms > 0, idle convs time out and emit a final row
    flagged closed=true.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import (
        GroupState,
        GroupStateTimeout,
    )

    out_schema = (
        "conv_id string, n_turns bigint, n_chars bigint, "
        "n_tool_turns bigint, max_turn_idx int, closed boolean"
    )
    state_schema = (
        "n_turns bigint, n_chars bigint, n_tool_turns bigint, "
        "max_turn_idx int"
    )

    def track(key, pdfs, state: GroupState):
        (conv_id,) = key
        if state.hasTimedOut:
            n_turns, n_chars, n_tool, max_idx = state.get
            state.remove()
            yield pd.DataFrame(
                [[conv_id, n_turns, n_chars, n_tool, max_idx, True]],
                columns=["conv_id", "n_turns", "n_chars",
                         "n_tool_turns", "max_turn_idx", "closed"],
            )
            return
        n_turns, n_chars, n_tool, max_idx = (
            state.get if state.exists else (0, 0, 0, -1)
        )
        for pdf in pdfs:
            n_turns += len(pdf)
            n_chars += int(pdf["text"].fillna("").str.len().sum())
            n_tool += int((pdf["role"] == "tool").sum())
            max_idx = max(max_idx, int(pdf["turn_idx"].max()))
        state.update((n_turns, n_chars, n_tool, max_idx))
        if timeout_ms > 0:
            state.setTimeoutDuration(timeout_ms)
        yield pd.DataFrame(
            [[conv_id, n_turns, n_chars, n_tool, max_idx, False]],
            columns=["conv_id", "n_turns", "n_chars", "n_tool_turns",
                     "max_turn_idx", "closed"],
        )

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if timeout_ms > 0
        else GroupStateTimeout.NoTimeout
    )
    return turns.groupBy("conv_id").applyInPandasWithState(
        track, out_schema, state_schema, "update", timeout
    )


def dedup_turns_stream(turns: DataFrame,
                       watermark: str = "1 hour") -> DataFrame:
    """Stateful streaming dedupe (B.9): at-least-once sources can
    redeliver a turn; dropDuplicatesWithinWatermark keys on
    (conv_id, turn_idx) and reclaims state once the watermark passes —
    bounded memory on an unbounded stream, unlike dropDuplicates."""
    return turns.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["conv_id", "turn_idx"]
    )
