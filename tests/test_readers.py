"""Reference-format reader tests over micro-fixtures (SURVEY.md §5.2-5)."""

import pytest

from kgp.fixtures import write_reference_format_fixtures


@pytest.fixture(scope="module")
def paths(tmp_path_factory):
    return write_reference_format_fixtures(str(tmp_path_factory.mktemp("reffmt")))


def test_semeval_reader(spark, paths):
    from kgp.io.readers import read_semeval_jsonl

    ok, quarantine = read_semeval_jsonl(spark, paths["semeval"])
    rows = {r["relation"]: r for r in ok.collect()}
    assert set(rows) == {"Cause-Effect(e1,e2)", "Content-Container(e1,e2)"}
    r = rows["Cause-Effect(e1,e2)"]
    assert r["head_name"] == "acme engine" and (r["head_s"], r["head_e"]) == (1, 3)
    q = quarantine.collect()
    assert len(q) == 1 and q[0]["head_name"] == "mismatch"  # P3 quarantine


def test_mrc_reader(spark, paths):
    from kgp.io.readers import read_mrc_ner_json

    rows = {r["sample_id"]: r for r in read_mrc_ner_json(spark, paths["mrc"]).collect()}
    assert len(rows) == 2
    s0 = rows[0]
    assert s0["context"] == "alice works at acme"
    spans = {(s["start"], s["end"], s["label"]) for s in s0["spans"]}
    assert spans == {(0, 1, "PER"), (3, 4, "ORG")}  # end made exclusive
    assert rows[1]["spans"] == []


def test_ccks_reader(spark, paths):
    from kgp.io.readers import read_ccks_json

    rows = read_ccks_json(spark, paths["ccks"]).collect()
    by_sentence = {r["sentence"]: r["spans"] for r in rows}
    assert {(s["start"], s["end"], s["label"]) for s in by_sentence["acme hired bob"]} == {
        (0, 1, "ORG"),
        (2, 3, "PER"),
    }
    assert by_sentence["plain text"] == []


def test_el_pairs_and_cdn(spark, paths):
    from kgp.io.readers import read_cdn_json, read_el_pairs_tsv

    pairs = read_el_pairs_tsv(spark, paths["el_pairs"]).collect()
    assert [(p["text_a"], p["text_b"], p["label"]) for p in pairs] == [
        ("fever", "high fever", 1),
        ("fever", "broken leg", 0),
    ]
    cdn = read_cdn_json(spark, paths["cdn"]).collect()
    assert cdn[0]["text"] == "fever and cough"  # trimmed
    assert cdn[0]["gold_entities"] == ["Fever", "Cough"]  # ##-split


def test_kg_cf_remap_readers(spark, paths):
    from kgp.io.readers import read_cf_adjacency, read_id_remap, read_kg_triples

    kg = read_kg_triples(spark, paths["kg"])
    assert kg.count() == 3  # raw read keeps dup; dedup is A12's job
    assert kg.dropDuplicates().count() == 2
    cf = {(r["user"], r["item"]) for r in read_cf_adjacency(spark, paths["cf"]).collect()}
    assert cf == {(0, 10), (0, 11), (0, 12), (1, 10)}  # per-user dedup, blank line skipped
    remap = {r["org_id"]: r["remap_id"] for r in read_id_remap(spark, paths["remap"]).collect()}
    assert remap == {"m.045wq1q": 0, "m.03_28m": 1}


def test_kgat_construct_matches_reference_semantics(spark, paths):
    """Graph materialization over the micro KG+CF, checked against the
    loader_kgat.py:84-148 arithmetic computed by hand."""
    from kgp.io.readers import read_cf_adjacency, read_kg_triples
    from kgp.stages.graph import kgat_construct

    kg = read_kg_triples(spark, paths["kg"])
    cf = read_cf_adjacency(spark, paths["cf"])
    out = kgat_construct(kg.withColumnRenamed("h", "h"), cf)
    edges = {(r["h"], r["r"], r["t"]) for r in out["edges"].collect()}
    # kg dedup: {(0,0,1),(1,1,2)}; n_rel=2, n_ent=3
    want = {
        (0, 2, 1), (1, 3, 2),          # forward, r+2
        (1, 4, 0), (2, 5, 1),          # reverse, r+n_rel+2
        (3, 0, 10), (3, 0, 11), (3, 0, 12), (4, 0, 10),  # interactions, user+n_ent
        (10, 1, 3), (11, 1, 3), (12, 1, 3), (10, 1, 4),  # reverse interactions
    }
    assert edges == want
    stats = out["stats"].first()
    assert stats["n_relations"] == 6
    adj = {r["h"]: r["out_edges"] for r in out["adjacency"].collect()}
    assert [(e["t"], e["r"]) for e in adj[3]] == [(10, 0), (11, 0), (12, 0)]
