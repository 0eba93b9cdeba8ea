"""Unit tests for the deterministic surrogate operators (SURVEY.md §5.2-1)."""

import itertools

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from kgp.functions.surrogate import (
    LABEL2ID,
    LABELS,
    NEG,
    REL2ID,
    TRIGGER2REL,
    _START,
    _TRANS,
    bio_decode,
    bio_encode,
    build_emissions,
    build_tagger_params,
    char_ngrams,
    detect_spans,
    jaccard,
    scan_relation,
    tokenize,
    viterbi,
)


def brute_force_decode(em):
    """Exhaustive max-sum path search for tiny sequences."""
    n, L = em.shape
    best, best_score = None, -np.inf
    for path in itertools.product(range(L), repeat=n):
        s = _START[path[0]] + em[0, path[0]]
        for t in range(1, n):
            s += _TRANS[path[t - 1], path[t]] + em[t, path[t]]
        if s > best_score:
            best, best_score = list(path), s
    return best


@given(st.integers(0, 10**9))
@settings(max_examples=30, deadline=None)
def test_viterbi_vs_brute_force(seed):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(1, 6))
    em = rng.normal(size=(n, len(LABELS)))
    assert viterbi(em) == brute_force_decode(em)


def test_viterbi_empty():
    assert viterbi(np.zeros((0, len(LABELS)))) == []


def test_bio_roundtrip():
    spans = [(0, 2, "PER"), (3, 4, "ORG"), (5, 8, "LOC")]
    seq = bio_encode(9, spans)
    assert bio_decode(seq) == spans


@given(st.lists(st.sampled_from(list(LABELS)), max_size=20))
@settings(max_examples=200, deadline=None)
def test_bio_decode_total(labels):
    # decode never crashes, and re-encoding its spans reproduces a
    # normalized BIO sequence that decodes to the same spans (idempotence)
    spans = bio_decode(labels)
    seq2 = bio_encode(len(labels), spans)
    assert bio_decode(seq2) == spans


def test_detect_spans_gazetteer():
    surfaces = [("acme corp", "ORG"), ("acme", "ORG"), ("bob smith", "PER")]
    b, i = build_tagger_params(surfaces)
    toks = tokenize("the acme corp hired bob smith today .")
    spans = detect_spans(toks, b, i)
    assert (1, 3, "ORG") in spans  # longest match wins over bare "acme"
    assert (4, 6, "PER") in spans
    assert all(s != (1, 2, "ORG") for s in spans)


def test_detect_spans_no_false_positive():
    b, i = build_tagger_params([("acme corp", "ORG")])
    # continuation token without its B cannot start an entity
    assert detect_spans(["corp", "today"], b, i) == []


def test_tokenizer_punct_and_case():
    assert tokenize("Hello, World!  (test)") == ["hello", ",", "world", "!", "(", "test", ")"]
    assert tokenize("") == []
    assert tokenize("  \t\n ") == []


def test_scan_relation():
    pid, scores = scan_relation(["then", "causes", "maybe"])
    assert pid == REL2ID["Cause-Effect(e1,e2)"]
    assert len(scores) == 19 and abs(scores.sum() - 1.0) < 1e-9
    pid2, _ = scan_relation(["nothing", "here"])
    assert pid2 == REL2ID["Other"]
    # first trigger wins
    pid3, _ = scan_relation(["causes", "stores"])
    assert pid3 == REL2ID["Cause-Effect(e1,e2)"]


def test_all_triggers_map_to_distinct_classes():
    assert len(set(TRIGGER2REL.values())) == 18
    assert "Other" not in TRIGGER2REL.values()


def test_jaccard_properties():
    assert jaccard("acme corp", "acme corp") == 1.0
    assert jaccard("acme corporation", "acme corp") > 0.35
    assert jaccard("acme corp", "zeta labs") < 0.1
    assert 0.0 <= jaccard("a", "completely different") <= 1.0


def test_char_ngrams_short_string():
    assert char_ngrams("a") == {"#a#"}


def test_tokenize_batch_matches_scalar():
    """The vectorized tokenizer must be row-identical to the scalar one."""
    import pandas as pd

    from kgp.functions.surrogate import tokenize, tokenize_batch

    samples = [
        "Hello, World!  multiple   spaces",
        "",
        "   ",
        "UPPER lower MiXeD",
        "punct:everywhere;yes(really)[ok]\"quoted\"'single'",
        "tab\tseparated\nnewline\r\nand control\x07chars\x1f.",
        "unicode café naïve 中文 tokens",
        "a.b,c!d?e;f:g(h)i[j]k",
        "trailing punctuation!",
        "!leading",
        None,
    ]
    s = pd.Series(samples)
    got = tokenize_batch(s)
    want = [tokenize(x or "") for x in samples]
    assert got == want
