"""Cluster-profile reuse points (kgp.reuse): the pipeline's and
kgat_cf_embedding's multi-consumer pins route through LineageLog stage
tables instead of localCheckpoint, with identical results — the fix for
the sf16 driver-heap finding (SCALING.md) and the executor-loss story.
"""

import json
import os

from kgp.config import FixtureConfig
from kgp.fixtures import TRANSCRIPT_SCHEMA, make_transcripts
from kgp.reuse import input_fingerprint, lineage_reuse, local_reuse
from kgp.stages.pipeline import fixture_model, run_pipeline

FX = FixtureConfig(n_conversations=20, n_entities=30)


def _snap(out, names=("mentions", "relations", "clusters", "triples", "edges")):
    return {n: sorted(tuple(r) for r in out[n].collect()) for n in names}


def test_pipeline_table_reuse_matches_local(spark, tmp_path):
    rows = make_transcripts(FX)
    t = spark.createDataFrame(rows, schema=TRANSCRIPT_SCHEMA)
    model = fixture_model(spark, FX)

    base = _snap(run_pipeline(spark, t, model))
    fp = input_fingerprint(t, None)
    reuse = lineage_reuse(spark, str(tmp_path / "stages"), fp)
    out = run_pipeline(spark, t, model, reuse=reuse)

    # identical results, identical schemas (no bucket column leaks)
    assert _snap(out) == base
    assert out["triples"].columns == ["conv_id", "subj", "pred", "obj", "src_turns"]

    # every multi-consumer pin is a committed stage table with a manifest
    ldir = str(tmp_path / "stages" / "_lineage")
    stages = {f[:-5] for f in os.listdir(ldir) if f.endswith(".json") and "buckets" not in f}
    assert {"tagged", "relations", "clusters", "triples", "graph_fwd", "graph_ids"} <= stages
    m = json.load(open(os.path.join(ldir, "tagged.json")))
    assert m["status"] == "ok" and m["input"] == fp and m["partitions"]

    # resume: a second run with the same fingerprint skips every stage
    # (run_stage short-circuits on the committed manifest) — byte-equal
    out2 = run_pipeline(spark, t, model, reuse=lineage_reuse(spark, str(tmp_path / "stages"), fp))
    assert _snap(out2) == base


def test_env_profile_selects_table_reuse(spark, tmp_path, monkeypatch):
    rows = make_transcripts(FixtureConfig(n_conversations=8, n_entities=20))
    t = spark.createDataFrame(rows, schema=TRANSCRIPT_SCHEMA)
    model = fixture_model(spark, FixtureConfig(n_conversations=8, n_entities=20))
    base = sorted(tuple(r) for r in run_pipeline(spark, t, model)["triples"].collect())

    monkeypatch.setenv("KGP_REUSE", "table")
    monkeypatch.setenv("KGP_REUSE_DIR", str(tmp_path / "envstages"))
    out = run_pipeline(spark, t, model)
    assert sorted(tuple(r) for r in out["triples"].collect()) == base
    assert os.path.isdir(str(tmp_path / "envstages" / "_lineage"))


def test_cf_embedding_table_reuse_matches_local(spark, tmp_path):
    import numpy as np

    from kgp.stages.graph import edge_softmax, kgat_cf_embedding

    rng = np.random.default_rng(11)
    n, d = 8, 4
    edges = spark.createDataFrame(
        [(int(i), int((i * 3 + 1) % n), float(rng.normal())) for i in range(2 * n)],
        "h long, t long, score double",
    )
    att = edge_softmax(edges).select("h", "t", "att")
    emb = rng.normal(size=(n, d)).tolist()
    layers = [(rng.normal(size=(d, 3)).tolist(), rng.normal(size=(d, 3)).tolist())]

    def snap(df):
        return sorted((r["h"], r["k"], round(r["val"], 9)) for r in df.collect())

    base = snap(kgat_cf_embedding(spark, att, emb, layers, reuse=local_reuse))
    table = snap(
        kgat_cf_embedding(
            spark, att, emb, layers,
            reuse=lineage_reuse(spark, str(tmp_path / "cf"), "fp-cf", bucket_on=None),
        )
    )
    assert table == base
    assert os.path.exists(str(tmp_path / "cf" / "_lineage" / "cf_layer_1.json"))


def test_adaptive_ckpt_storage_selection(monkeypatch):
    """local_reuse_for picks serialized pins above the input-size
    threshold, deserialized below, with KGP_CKPT_SER force-overriding —
    the round-5 finding: serialized pins cut the 4-core sf16 leg ~23%
    (bandwidth/residency) but cost ~7% at sf0.1 (extra copy)."""
    from kgp.reuse import local_reuse_for

    monkeypatch.delenv("KGP_CKPT_SER", raising=False)
    assert not getattr(local_reuse_for(1_000_000), "serialized", False)
    assert getattr(local_reuse_for(140_000_000), "serialized", False)
    monkeypatch.setenv("KGP_CKPT_SER", "0")
    assert not getattr(local_reuse_for(140_000_000), "serialized", False)
    monkeypatch.setenv("KGP_CKPT_SER", "1")
    assert getattr(local_reuse_for(0), "serialized", False)


def test_adaptive_ckpt_pipeline_equivalence(spark, monkeypatch):
    """Serialized vs deserialized pins are a pure storage-format choice:
    identical pipeline outputs either way."""
    from kgp.fixtures import TRANSCRIPT_SCHEMA, make_transcripts

    rows = make_transcripts(FX)
    t = spark.createDataFrame(rows, schema=TRANSCRIPT_SCHEMA)
    model = fixture_model(spark, FX)
    monkeypatch.setenv("KGP_CKPT_SER", "0")
    base = _snap(run_pipeline(spark, t, model))
    monkeypatch.setenv("KGP_CKPT_SER", "1")
    ser = _snap(run_pipeline(spark, t, model))
    assert base == ser
    monkeypatch.delenv("KGP_CKPT_SER")
    monkeypatch.setenv("KGP_CKPT_LEVEL", "disk")
    disk = _snap(run_pipeline(spark, t, model))
    assert base == disk


def test_adaptive_ckpt_level_thresholds(monkeypatch):
    """The local profile picks the pin storage level from input bytes:
    deserialized below KGP_CKPT_SER_MB, serialized UnsafeRow between the
    thresholds, DISK_ONLY above KGP_CKPT_DISK_MB (the sf16 jstack probe
    caught single-threaded MemoryStore eviction stalling all cores when
    big pins sat in the storage pool — SCALING.md round-5)."""
    from kgp.reuse import local_reuse_for

    monkeypatch.delenv("KGP_CKPT_SER", raising=False)
    monkeypatch.delenv("KGP_CKPT_LEVEL", raising=False)
    assert not hasattr(local_reuse_for(10e6), "level")  # deserialized
    assert local_reuse_for(40e6).level == "ser"
    assert local_reuse_for(150e6).level == "disk"
    monkeypatch.setenv("KGP_CKPT_LEVEL", "ser")
    assert local_reuse_for(150e6).level == "ser"  # explicit override wins
