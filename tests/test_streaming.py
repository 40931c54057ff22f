"""Structured Streaming surface (SURVEY B.9): incremental ingest of
transcript files -> streaming tag -> watermarked windowed counts;
streaming results must equal the equivalent batch computation, and a
restart with the same checkpoint must process only newly-arrived files.
"""

import os
import shutil

import pytest
from pyspark.sql import functions as F

from kgx.spark import stages, streaming
from kgx.spark.udfs import make_tagger_spans_udf
from kgx.tagcore import TaggerArtifact


@pytest.fixture()
def stream_env(spark, t1_dir, tmp_path):
    src = tmp_path / "arrivals"
    src.mkdir()
    full = spark.read.parquet(f"{t1_dir}/transcripts.parquet")
    # two arrival batches, split by conv hash
    part = F.pmod(F.xxhash64("conv_id"), F.lit(2))
    full.where(part == 0).coalesce(1).write.parquet(str(src / "b0"))
    udf = make_tagger_spans_udf(
        spark, TaggerArtifact.load(f"{t1_dir}/tagger_v1.npz"))
    return {"spark": spark, "src": src, "full": full, "udf": udf,
            "ckpt": str(tmp_path / "ckpt")}


def _drain_counts(env, name):
    turns = streaming.stream_transcripts(env["spark"],
                                         str(env["src"] / "*"))
    agg = streaming.windowed_mention_counts(turns, env["udf"])
    q = streaming.run_available_now(agg, env["ckpt"], name,
                                    output_mode="complete")
    try:
        return {
            (r["win_start"], r["etype"]): r["n_mentions"]
            for r in env["spark"].table(name).collect()
        }
    finally:
        q.stop()


def test_streaming_equals_batch_and_resumes_incrementally(stream_env):
    env = stream_env
    spark = env["spark"]

    got1 = _drain_counts(env, "mc1")
    assert got1  # first batch produced windows

    # second arrival; restart from the same checkpoint — only the new
    # file is processed, aggregate now covers everything
    part = F.pmod(F.xxhash64("conv_id"), F.lit(2))
    env["full"].where(part == 1).coalesce(1).write.parquet(
        str(env["src"] / "b1"))
    got2 = _drain_counts(env, "mc2")

    # batch twin over the full table
    tagged = stages.tag_spans(
        env["full"].where(
            F.col("text").isNotNull()
            & (F.length(F.trim(F.col("text"))) > 0)),
        env["udf"])
    batch = (
        tagged.select("ts", F.explode("spans").alias("sp"))
        .select("ts", F.col("sp.etype").alias("etype"))
        .groupBy(F.window("ts", "10 minutes").alias("win"), "etype")
        .agg(F.count("*").alias("n"))
        .select(F.col("win.start").alias("ws"), "etype", "n")
    )
    want = {(r["ws"], r["etype"]): r["n"] for r in batch.collect()}
    assert got2 == want
    # incremental: second drain strictly extends the first
    assert set(got1) <= set(got2)
    assert sum(got1.values()) < sum(got2.values())


def test_stream_mentions_schema(stream_env):
    env = stream_env
    turns = streaming.stream_transcripts(env["spark"],
                                         str(env["src"] / "*"))
    m = streaming.stream_mentions(turns, env["udf"])
    assert m.isStreaming
    assert [f.name for f in m.schema.fields] == [
        "conv_id", "turn_idx", "ts", "begin", "end", "surface", "etype"]


def test_conv_state_tracker_accumulates_across_batches(stream_env):
    """applyInPandasWithState: per-conv state persists across two
    AvailableNow drains via the streaming checkpoint."""
    env = stream_env
    spark = env["spark"]

    def drain(name):
        turns = streaming.stream_transcripts(env["spark"],
                                             str(env["src"] / "*"))
        tracked = streaming.conv_state_tracker(turns)
        rows = []

        def sink(batch_df, _bid):
            rows.extend(r.asDict() for r in batch_df.collect())

        q = (
            tracked.writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", env["ckpt"] + "_state")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        q.stop()
        return {r["conv_id"]: r for r in rows}

    got1 = drain("cs1")
    assert got1 and all(not v["closed"] for v in got1.values())

    # arrival of the second half; same conv set may overlap
    part = F.pmod(F.xxhash64("conv_id"), F.lit(2))
    env["full"].where(part == 1).coalesce(1).write.parquet(
        str(env["src"] / "b1s"))
    got2 = drain("cs2")

    # every conv's final state equals the batch ground truth
    want = {
        r["conv_id"]: r.asDict()
        for r in env["full"].groupBy("conv_id").agg(
            F.count("*").alias("n_turns"),
            F.sum(F.length(F.coalesce("text", F.lit(""))))
            .alias("n_chars"),
            F.sum((F.col("role") == "tool").cast("bigint"))
            .alias("n_tool_turns"),
            F.max("turn_idx").alias("max_turn_idx"),
        ).collect()
    }
    merged = dict(got1)
    merged.update(got2)  # latest state per conv
    assert set(merged) == set(want)
    for cid, w in want.items():
        g = merged[cid]
        assert (g["n_turns"], g["n_chars"], g["n_tool_turns"],
                g["max_turn_idx"]) == (
            w["n_turns"], w["n_chars"], w["n_tool_turns"],
            w["max_turn_idx"]), cid


def test_stream_dedupe_within_watermark(stream_env, tmp_path):
    """Redelivered turns (same conv_id/turn_idx in a later file) must
    be dropped by dropDuplicatesWithinWatermark."""
    env = stream_env
    spark = env["spark"]
    # redeliver the SAME first batch as a new file
    first = spark.read.parquet(str(env["src"] / "b0"))
    first.coalesce(1).write.parquet(str(env["src"] / "b0_redelivered"))

    turns = streaming.stream_transcripts(spark, str(env["src"] / "*"))
    deduped = streaming.dedup_turns_stream(turns)
    rows = []

    def sink(batch_df, _bid):
        rows.extend(
            (r["conv_id"], r["turn_idx"]) for r in batch_df.collect())

    q = (
        deduped.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    q.stop()
    assert len(rows) == first.count()          # duplicates dropped
    assert len(set(rows)) == len(rows)         # all unique keys


def test_kafka_projection_roundtrip(spark):
    """parse_kafka_transcripts applied to batch Kafka-shaped rows must
    recover every turn field and fall back to the broker timestamp
    when the JSON carries no event ts — the schema half of the Kafka
    source, value-tested without a broker (the connector jar is not
    shipped here; stream_transcripts_kafka raises with a deployment
    hint instead, covered below)."""
    import datetime as dt
    import json as js

    broker_ts = dt.datetime(2026, 1, 2, 3, 4, 5)
    turns = [
        {"conv_id": "c1", "turn_idx": 0, "role": "user",
         "text": "hello", "tool": None, "ts": "2026-01-01T00:00:00"},
        {"conv_id": "c1", "turn_idx": 1, "role": "tool",
         "text": "ran", "tool": "search", "ts": None},  # -> broker ts
    ]
    records = spark.createDataFrame(
        [
            ("k".encode(), js.dumps(t).encode(), "transcripts", 0, i,
             broker_ts, 0)
            for i, t in enumerate(turns)
        ],
        "key binary, value binary, topic string, partition int, "
        "offset long, timestamp timestamp, timestampType int",
    )
    got = {
        r["turn_idx"]: r
        for r in streaming.parse_kafka_transcripts(records).collect()
    }
    assert [f.name for f in streaming.parse_kafka_transcripts(
        records).schema.fields] == [
        f.name for f in streaming.TRANSCRIPT_SCHEMA.fields]
    assert got[0]["conv_id"] == "c1" and got[0]["text"] == "hello"
    assert got[0]["ts"] == dt.datetime(2026, 1, 1)
    assert got[1]["tool"] == "search"
    assert got[1]["ts"] == broker_ts  # ingest-time fallback


def test_kafka_source_raises_deployment_hint(spark):
    """Without the connector jar the Kafka source must fail fast with
    the --packages hint, not a bare ClassNotFound."""
    with pytest.raises(RuntimeError, match="spark-sql-kafka"):
        streaming.stream_transcripts_kafka(
            spark, "localhost:9092", "transcripts")
