"""Resume test (SURVEY.md §5.2-3): kill after stage k, re-run, byte-identical
output; lineage shows skipped stages."""

import json
import os

import pytest

from kgp.config import FixtureConfig
from kgp.fixtures import TRANSCRIPT_SCHEMA, make_transcripts
from kgp.stages.pipeline import fixture_model
from kgp.stages.runner import run_pipeline_resumable

FX = FixtureConfig(n_conversations=20, n_entities=30)


def _snap(out):
    return {
        name: sorted(tuple(r) for r in out[name].collect())
        for name in ["mentions", "relations", "clusters", "links", "triples", "edges"]
    }


def test_resume_skips_and_reproduces(spark, tmp_path):
    rows = make_transcripts(FX)
    t = spark.createDataFrame(rows, schema=TRANSCRIPT_SCHEMA)
    model = fixture_model(spark, FX)
    outdir = str(tmp_path / "run")

    out1 = run_pipeline_resumable(spark, t, model, outdir)
    snap1 = _snap(out1)
    assert snap1["triples"], "pipeline produced no triples"

    # simulate a crash after 'relations': wipe manifests of later stages
    for stage in ["clusters", "links", "triples", "edges"]:
        os.remove(os.path.join(outdir, "_lineage", f"{stage}.json"))

    out2 = run_pipeline_resumable(spark, t, model, outdir)
    snap2 = _snap(out2)
    assert snap2 == snap1  # byte-identical output after resume

    # earlier stages were skipped: their manifests still carry run-1 commit times
    m1 = json.load(open(os.path.join(outdir, "_lineage", "mentions.json")))
    assert m1["status"] == "ok"
    # per-partition metrics present and consistent
    assert sum(p["rows_out"] for p in m1["partitions"]) == len(snap1["mentions"])

    # changed input -> everything rebuilds and output differs
    rows3 = make_transcripts(FixtureConfig(n_conversations=30, n_entities=30))
    t3 = spark.createDataFrame(rows3, schema=TRANSCRIPT_SCHEMA)
    out3 = run_pipeline_resumable(spark, t3, model, outdir)
    assert len(_snap(out3)["mentions"]) > len(snap1["mentions"])
    m3 = json.load(open(os.path.join(outdir, "_lineage", "mentions.json")))
    assert m3["input"] != m1["input"]  # fingerprint change recorded


def test_skew_report(spark, tmp_path):
    rows = make_transcripts(FixtureConfig(n_conversations=15, n_entities=30, skew_conv_turns=300))
    t = spark.createDataFrame(rows, schema=TRANSCRIPT_SCHEMA)
    model = fixture_model(spark, FixtureConfig(n_conversations=15, n_entities=30))
    outdir = str(tmp_path / "skewrun")
    out = run_pipeline_resumable(spark, t, model, outdir)
    rep = out["lineage"].skew_report("mentions")
    assert rep["max"] >= rep["median"] > 0
