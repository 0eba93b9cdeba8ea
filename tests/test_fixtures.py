"""Fixture generator invariants: determinism, disjoint vocab, shape."""

from kgp.config import FixtureConfig
from kgp.fixtures import (
    alias_dict_rows,
    make_gazetteer,
    make_transcripts,
    sanity_check_vocab,
    tagger_surfaces,
)


def test_gazetteer_deterministic_and_disjoint():
    cfg = FixtureConfig(n_entities=60)
    g1, g2 = make_gazetteer(cfg), make_gazetteer(cfg)
    assert [e.canonical for e in g1] == [e.canonical for e in g2]
    assert len({e.entity_id for e in g1}) == 60
    sanity_check_vocab(g1)


def test_alias_dict_shape():
    cfg = FixtureConfig(n_entities=40)
    rows = alias_dict_rows(make_gazetteer(cfg))
    assert all(set(r) == {"entity_name", "alias", "code", "entity_id"} for r in rows)
    # canonical form always present as its own alias
    by_ent = {}
    for r in rows:
        by_ent.setdefault(r["entity_name"], []).append(r["alias"])
    assert all(name in aliases for name, aliases in by_ent.items())


def test_variants_not_in_alias_dict():
    cfg = FixtureConfig(n_entities=40)
    g = make_gazetteer(cfg)
    aliases = {r["alias"] for r in alias_dict_rows(g)}
    variants = {v for e in g for v in e.variants}
    assert variants and not variants & aliases


def test_transcripts_shape_and_determinism():
    cfg = FixtureConfig(n_conversations=25, n_entities=40)
    r1, r2 = make_transcripts(cfg), make_transcripts(cfg)
    assert r1 == r2
    assert len(r1) >= 50
    convs = {}
    for r in r1:
        convs.setdefault(r["conv_id"], []).append(r["turn_idx"])
    for turns in convs.values():
        assert turns == list(range(len(turns)))  # contiguous, unique, ordered
    roles = {r["role"] for r in r1}
    assert roles == {"user", "assistant", "tool"}
    for r in r1:
        assert (r["tool"] is not None) == (r["role"] == "tool")


def test_skew_conversation():
    cfg = FixtureConfig(n_conversations=5, n_entities=20, skew_conv_turns=500)
    rows = make_transcripts(cfg)
    n0 = sum(1 for r in rows if r["conv_id"] == "conv-000000")
    assert n0 == 500


def test_transcripts_contain_signal():
    from kgp.functions.surrogate import TRIGGER2REL

    cfg = FixtureConfig(n_conversations=30, n_entities=40)
    g = make_gazetteer(cfg)
    rows = make_transcripts(cfg, g)
    text = " ".join(r["text"] for r in rows)
    surf = [s for s, _ in tagger_surfaces(g)]
    assert sum(1 for s in surf[:40] if s in text) > 5  # mentions planted
    assert any(t in text.split() for t in TRIGGER2REL)  # triggers planted
