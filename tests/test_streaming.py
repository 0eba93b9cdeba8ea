"""Streaming incremental mode: per-batch triples equal the batch pipeline
over the same data; watermarked window agg runs on a real stream."""

import os

import pytest

from kgp.config import FixtureConfig
from kgp.fixtures import TRANSCRIPT_SCHEMA, make_transcripts
from kgp.stages.pipeline import fixture_model, run_pipeline

FX = FixtureConfig(n_conversations=16, n_entities=24)


def test_incremental_matches_batch(spark, tmp_path):
    from kgp.streaming.incremental import incremental_triples, read_incremental_triples

    rows = make_transcripts(FX)
    convs = sorted({r["conv_id"] for r in rows})
    half = set(convs[: len(convs) // 2])
    b1 = [r for r in rows if r["conv_id"] in half]
    b2 = [r for r in rows if r["conv_id"] not in half]
    indir = str(tmp_path / "in")
    os.makedirs(indir)
    spark.createDataFrame(b1, TRANSCRIPT_SCHEMA).coalesce(1).write.mode("append").parquet(indir)
    spark.createDataFrame(b2, TRANSCRIPT_SCHEMA).coalesce(1).write.mode("append").parquet(indir)

    model = fixture_model(spark, FX)
    sink = incremental_triples(spark, indir, model, str(tmp_path / "out"))
    got = {
        (r["conv_id"], r["subj"], r["pred"], r["obj"], tuple(r["src_turns"]))
        for r in read_incremental_triples(spark, sink).collect()
    }
    batch = run_pipeline(spark, spark.createDataFrame(rows, TRANSCRIPT_SCHEMA), model)
    want = {
        (r["conv_id"], r["subj"], r["pred"], r["obj"], tuple(r["src_turns"]))
        for r in batch["triples"].collect()
    }
    assert want and got == want


def test_windowed_event_counts_streaming(spark, tmp_path):
    """Run the watermarked agg as an actual stream over the events parquet."""
    from kgp.streaming.incremental import windowed_event_counts

    import shutil

    src = "/root/testdata/sf0.001/events.parquet"
    events_dir = str(tmp_path / "events_in")
    os.makedirs(events_dir)
    shutil.copy(src, os.path.join(events_dir, "part-0.parquet"))  # stream source must be a dir
    batch_events = spark.read.parquet(src)
    stream = spark.readStream.schema(batch_events.schema).parquet(events_dir)
    out = windowed_event_counts(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("wincounts")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.sql("SELECT * FROM wincounts")
    # append mode only emits windows closed by the watermark; compare those
    # against the batch computation restricted to the same windows
    want = windowed_event_counts(batch_events)
    got_rows = {tuple(r) for r in got.collect()}
    want_rows = {tuple(r) for r in want.collect()}
    assert got_rows.issubset(want_rows)
    assert len(got_rows) > 0


def test_split_conversation_converges_to_batch(spark, tmp_path):
    """Conversation-completeness is ENFORCED: every conversation's turns are
    deliberately split across two micro-batches (first half of turns in
    batch 0, rest in batch 1). The reprocess-on-fragment path must pull the
    archived earlier fragments back in, so the final read view equals the
    batch pipeline exactly — including cross-turn coref/RE pairs that span
    the split point."""
    from kgp.streaming.incremental import incremental_triples, read_incremental_triples

    fx = FixtureConfig(n_conversations=8, n_entities=24)
    rows = make_transcripts(fx)
    # split WITHIN conversations: turn_idx below/above each conv's median
    from collections import defaultdict

    by_conv = defaultdict(list)
    for r in rows:
        by_conv[r["conv_id"]].append(r)
    b1, b2 = [], []
    for conv_rows in by_conv.values():
        conv_rows.sort(key=lambda r: r["turn_idx"])
        mid = len(conv_rows) // 2
        b1.extend(conv_rows[:mid])
        b2.extend(conv_rows[mid:])
    assert b1 and b2
    indir = str(tmp_path / "in")
    os.makedirs(indir)
    spark.createDataFrame(b1, TRANSCRIPT_SCHEMA).coalesce(1).write.mode("append").parquet(indir)
    spark.createDataFrame(b2, TRANSCRIPT_SCHEMA).coalesce(1).write.mode("append").parquet(indir)

    model = fixture_model(spark, fx)
    sink = incremental_triples(
        spark, indir, model, str(tmp_path / "out"), max_files_per_batch=1
    )
    # the sink really holds >1 batch (the split was processed incrementally,
    # not as one batch) and superseded batch-0 fragments exist
    raw = spark.read.parquet(sink)
    assert raw.select("batch_id").distinct().count() > 1
    got = {
        (r["conv_id"], r["subj"], r["pred"], r["obj"], tuple(r["src_turns"]))
        for r in read_incremental_triples(spark, sink).collect()
    }
    batch = run_pipeline(spark, spark.createDataFrame(rows, TRANSCRIPT_SCHEMA), model)
    want = {
        (r["conv_id"], r["subj"], r["pred"], r["obj"], tuple(r["src_turns"]))
        for r in batch["triples"].collect()
    }
    assert want and got == want
