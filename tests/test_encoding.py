"""Tests for P7/P8/P9 encoding ops, F3 biaffine detector, F7 attention,
A13/J7 helpers."""

import numpy as np
import pytest

from kgp.functions.encoding import (
    HEAD_CLOSE,
    HEAD_OPEN,
    HEAD_REPL,
    TAIL_OPEN,
    TAIL_REPL,
    detect_spans_biaffine,
    flat_ner_decode,
    insert_entity_markers,
    rel_position_ids,
    subtoken_labels,
)


def test_subtoken_labels_schemes():
    # words: "new" (B-LOC, 1 piece), "york" (I-LOC, 2 pieces), "rocks" (O, 2 pieces)
    labels = ["B-LOC", "I-LOC", "O"]
    pieces = [1, 2, 2]
    assert subtoken_labels(labels, pieces, "v1") == ["B-LOC", "I-LOC", "I-LOC", "O", "O"]
    assert subtoken_labels(labels, pieces, "v2") == ["B-LOC", "I-LOC", "O", "O", "O"]
    assert subtoken_labels(labels, pieces, "v3") == ["B-LOC", "I-LOC", "PAD", "O", "PAD"]
    with pytest.raises(ValueError):
        subtoken_labels(labels, pieces, "v9")


def test_insert_entity_markers():
    toks = ["a", "H1", "H2", "b", "T1", "c"]
    out, h, t = insert_entity_markers(toks, (1, 3), (4, 5), "v1")
    assert out == toks and h == (1, 3) and t == (4, 5)
    out, h, t = insert_entity_markers(toks, (1, 3), (4, 5), "v2")
    assert out == ["a", HEAD_OPEN, "H1", "H2", HEAD_CLOSE, "b", TAIL_OPEN, "T1", "[unused3]", "c"]
    assert out[h[0]] == HEAD_OPEN and out[t[0]] == TAIL_OPEN
    out, h, t = insert_entity_markers(toks, (1, 3), (4, 5), "v3")
    assert out == ["a", HEAD_REPL, "b", TAIL_REPL, "c"]
    assert h == (1, 2) and t == (3, 4)
    # tail before head in the sentence
    out2, h2, t2 = insert_entity_markers(toks, (4, 5), (1, 3), "v3")
    assert out2 == ["a", TAIL_REPL, "b", HEAD_REPL, "c"]
    assert h2 == (3, 4) and t2 == (1, 2)


def test_rel_position_ids():
    assert rel_position_ids(6, (1, 3), (4, 5)) == [0, 1, 1, 0, 2, 0]


def test_flat_ner_decode_overlap_pruning():
    cands = [(0, 3, "ORG", 1.02), (1, 2, "PER", 1.0), (4, 5, "LOC", 1.0)]
    assert flat_ner_decode(cands) == [(0, 3, "ORG"), (4, 5, "LOC")]


def test_biaffine_matches_crf_detector():
    from kgp.functions.surrogate import build_tagger_params, detect_spans, tokenize

    surfaces = [("acme corp", "ORG"), ("acme", "ORG"), ("bob smith", "PER"), ("rivertown", "LOC")]
    b, i = build_tagger_params(surfaces)
    for text in [
        "the acme corp hired bob smith in rivertown .",
        "acme ships to rivertown",
        "bob smith bob smith acme",
        "no entities at all",
    ]:
        toks = tokenize(text)
        assert detect_spans_biaffine(toks, b, i) == sorted(detect_spans(toks, b, i)), text


def test_pipeline_with_biaffine_tagger(spark):
    """The F3 detector slots behind the same interface and produces the
    same mentions on fixture data."""
    from kgp.config import FixtureConfig
    from kgp.fixtures import TRANSCRIPT_SCHEMA, make_transcripts
    from kgp.stages.assemble import assemble_documents
    from kgp.stages.mentions import detect_mentions
    from kgp.stages.pipeline import fixture_model

    fx = FixtureConfig(n_conversations=15, n_entities=24)
    t = spark.createDataFrame(make_transcripts(fx), TRANSCRIPT_SCHEMA)
    model = fixture_model(spark, fx)
    docs = assemble_documents(t)
    a = {tuple(r) for r in detect_mentions(spark, docs, model.surfaces, tagger="crf").collect()}
    b = {tuple(r) for r in detect_mentions(spark, docs, model.surfaces, tagger="biaffine").collect()}
    assert a and a == b


def test_kgat_attention(spark):
    from kgp.stages.graph import edge_softmax, kgat_attention

    rng = np.random.default_rng(3)
    E, R, W = rng.normal(size=(5, 4)), rng.normal(size=(2, 3)), rng.normal(size=(2, 3, 4))
    edges = spark.createDataFrame([(0, 0, 1), (1, 1, 2), (3, 0, 1)], "h long, r int, t long")
    out = kgat_attention(spark, edges, E, R, W).collect()
    for row in out:
        wr = W[row["r"]]
        want = float(np.tanh(wr @ E[row["h"]] + R[row["r"]]) @ (wr @ E[row["t"]]))
        assert row["score"] == pytest.approx(want)
    sm = edge_softmax(kgat_attention(spark, edges, E, R, W))
    att_by_t = {}
    for r in sm.collect():
        att_by_t.setdefault(r["t"], []).append(r["att"])
    for t, atts in att_by_t.items():
        assert sum(atts) == pytest.approx(1.0)


def test_dedup_within_group_and_mask(spark):
    from kgp.ops.dedup import dedup_within_group
    from kgp.stages.graph import mask_train_interactions

    df = spark.createDataFrame(
        [("m", "e1", 0.9), ("m", "e1", 0.8), ("m", "e2", 0.7)], "mention string, ent string, s double"
    )
    out = dedup_within_group(df, ["mention", "ent"], ["s"])
    assert out.count() == 2 and {r["s"] for r in out.collect()} == {0.8, 0.7}
    scores = spark.createDataFrame([(1, "a", 0.5), (1, "b", 0.4)], "user long, item string, s double")
    train = spark.createDataFrame([(1, "a")], "user long, item string")
    masked = mask_train_interactions(scores, train)
    assert [r["item"] for r in masked.collect()] == ["b"]


def test_subtokenize_shape():
    from kgp.functions.encoding import subtokenize

    pieces, n_pieces = subtokenize(["hi", "tokenizer", "spark"], max_piece=4)
    assert pieces == ["hi", "toke", "##nize", "##r", "spar", "##k"]
    assert n_pieces == [1, 3, 2]


def test_subtoken_label_roundtrip_all_schemes():
    from kgp.functions.encoding import (
        collapse_subtoken_labels,
        subtoken_labels,
        subtokenize,
    )
    from kgp.functions.surrogate import bio_decode, bio_encode

    toks = ["the", "acme", "corporation", "ships", "widgets", "to", "metropolis"]
    spans = [(1, 3, "ORG"), (6, 7, "LOC")]
    word_labels = bio_encode(len(toks), spans)
    _, n_pieces = subtokenize(toks, max_piece=4)
    for scheme in ("v1", "v2", "v3"):
        sub = subtoken_labels(word_labels, n_pieces, scheme)
        assert len(sub) == sum(n_pieces)
        back = collapse_subtoken_labels(sub, n_pieces, scheme)
        assert back == word_labels
        assert bio_decode(back) == spans
