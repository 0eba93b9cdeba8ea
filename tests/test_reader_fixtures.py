"""Reader micro-fixture integrity (S1-S7 driver-certification support):
the deterministic reference-format files parse to the expected shapes and
the P3 quarantine actually catches the corrupted rows."""

import os

from kgp.io.reader_fixtures import FIXTURE_WRITERS, ensure_reader_fixtures


def test_fixtures_deterministic(tmp_path):
    a = ensure_reader_fixtures(str(tmp_path / "a"))
    b = ensure_reader_fixtures(str(tmp_path / "b"))
    for name in FIXTURE_WRITERS:
        with open(a[name], "rb") as fa, open(b[name], "rb") as fb:
            assert fa.read() == fb.read(), name


def test_semeval_quarantine_split(spark, tmp_path):
    from kgp.io.readers import read_semeval_jsonl

    paths = ensure_reader_fixtures(str(tmp_path))
    ok, quarantine = read_semeval_jsonl(spark, paths["semeval.jsonl"])
    n_ok, n_bad = ok.count(), quarantine.count()
    assert n_bad == 6  # every 10th of 60 rows is corrupted
    assert n_ok == 54
    # quarantined rows are exactly the ones whose head name disagrees
    assert all(r["head_name"].endswith("_XX") for r in quarantine.collect())


def test_mrc_impossible_rows_regroup(spark, tmp_path):
    from pyspark.sql import functions as F

    from kgp.io.readers import read_mrc_ner_json

    paths = ensure_reader_fixtures(str(tmp_path))
    df = read_mrc_ner_json(spark, paths["mrc_ner.json"])
    rows = {r["sample_id"]: r for r in df.collect()}
    assert len(rows) == 20  # one row per sample after the i%label_num regroup
    # spans are sorted and exclusive-end (fixture writes inclusive ends)
    for r in rows.values():
        spans = [(s["start"], s["end"], s["label"]) for s in r["spans"]]
        assert spans == sorted(spans)
        assert all(e > s for s, e, _ in spans)


def test_cf_adjacency_dedups_and_skips_blank(spark, tmp_path):
    from kgp.io.readers import read_cf_adjacency

    paths = ensure_reader_fixtures(str(tmp_path))
    df = read_cf_adjacency(spark, paths["cf_train.txt"])
    rows = df.collect()
    per_user = {}
    for r in rows:
        per_user.setdefault(r["user"], []).append(r["item"])
    assert len(per_user) == 15
    for u, items in per_user.items():
        assert len(items) == len(set(items)), f"user {u} has dup items"
