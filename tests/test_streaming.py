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


def test_stateful_sessionize_cross_batch(spark, tmp_path):
    """applyInPandasWithState sessionizer: session boundaries survive the
    micro-batch handoff (a session spanning two files is ONE session),
    gaps strictly greater than the threshold split, ties in ts don't,
    and the barrier closes final open sessions without counting itself."""
    import glob
    import os
    import shutil

    from pyspark.sql import functions as F

    from kgp.streaming.stateful import (
        BARRIER_EVENT_ID,
        sessionize_files_available_now,
    )

    m = 60 * 1_000_000  # one minute in micros
    mk = lambda us: F.timestamp_micros(F.lit(us)).cast("timestamp_ntz")  # noqa: E731
    batch1 = [(1, 0 * m, 1), (1, 10 * m, 2), (2, 0 * m, 3)]
    # user 1's 40m event continues the session started in batch 1 (gap 30m
    # from 10m -> exactly 30m = NOT a split; strict >)
    batch2 = [(1, 40 * m, 4), (1, 100 * m, 5), (2, 120 * m, 6)]
    barrier = [(1, 10**12, BARRIER_EVENT_ID), (2, 10**12, BARRIER_EVENT_ID)]
    flat = str(tmp_path / "in")
    os.makedirs(flat)
    for i, rows in enumerate([batch1, batch2, barrier]):
        df = spark.createDataFrame(rows, "user_id long, us long, event_id long").select(
            "user_id", F.timestamp_micros("us").cast("timestamp_ntz").alias("ts"), "event_id"
        )
        d = str(tmp_path / f"part{i}")
        df.coalesce(1).write.parquet(d)
        dst = os.path.join(flat, f"{i:02d}.parquet")
        shutil.copy(glob.glob(os.path.join(d, "*.parquet"))[0], dst)
        os.utime(dst, (1000 * (i + 1), 1000 * (i + 1)))
    sink, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    sessionize_files_available_now(spark, flat, sink, ckpt, gap_minutes=30)
    got = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in spark.read.parquet(sink).collect()
    }
    assert got == {
        # user 1: [0, 10, 40] one session (30m gap not > 30m), then [100]
        (1, 0, 40 * m, 3),
        (1, 100 * m, 100 * m, 1),
        # user 2: [0], then [120]
        (2, 0, 0, 1),
        (2, 120 * m, 120 * m, 1),
    }
