"""Feature-encoding parity operators (SURVEY.md P7/P8/P9, F3).

These reproduce the reference's feature-construction semantics that sit
between tokenization and model input. The rebuilt engine's surrogate
models don't need sub-token inputs, but the operators are part of the
reference's API surface, so they ship as first-class, tested functions
(pure Python/numpy — usable inside any pandas UDF).
"""

from __future__ import annotations

import numpy as np

PAD_LABEL = "PAD"

# entity-marker tokens, matching the reference's [unused0..5] convention
HEAD_OPEN, HEAD_CLOSE = "[unused0]", "[unused1]"
TAIL_OPEN, TAIL_CLOSE = "[unused2]", "[unused3]"
HEAD_REPL, TAIL_REPL = "[unused4]", "[unused5]"


def subtoken_labels(word_labels: list[str], n_pieces: list[int], scheme: str = "v1") -> list[str]:
    """P7: word-level BIO labels -> sub-token labels under scheme v1/v2/v3.

    v1: B-X, then I-X for the word's remaining pieces (B,I,I)
    v2: B-X, then O for remaining pieces (B,O,O)
    v3: B-X, then PAD (ignored in loss) for remaining pieces (B,PAD,PAD)
    I-X words expand as I-X,<cont>,<cont> with the same continuation rule.
    Semantics per Named_Entity_Recognition README.md:16-19 /
    ner_data_utils.py:376-410 (independent implementation).
    """
    if scheme not in ("v1", "v2", "v3"):
        raise ValueError(f"unknown scheme {scheme}")
    out = []
    for label, k in zip(word_labels, n_pieces):
        if k <= 0:
            continue
        out.append(label)
        if k > 1:
            if scheme == "v3":
                cont = PAD_LABEL  # continuations ignored in loss, incl. O words
            elif scheme == "v2" or label == "O":
                cont = "O"
            else:  # v1
                cont = "I-" + label[2:]
            out.extend([cont] * (k - 1))
    return out


def subtokenize(tokens: list[str], max_piece: int = 4) -> tuple[list[str], list[int]]:
    """WordPiece-style surrogate sub-tokenizer (P5/P7 carrier): words
    longer than ``max_piece`` chars split into fixed-size pieces with
    ``##``-prefixed continuations (the reference's BasicTokenizer +
    WordPiece shape, ner_data_utils.py:376-410, without a learned vocab).
    Returns (pieces, n_pieces) with ``n_pieces[i]`` = piece count of word
    i — the alignment every sub-token relabel scheme needs."""
    pieces: list[str] = []
    n_pieces: list[int] = []
    for t in tokens:
        if len(t) <= max_piece:
            pieces.append(t)
            n_pieces.append(1)
        else:
            chunks = [t[i : i + max_piece] for i in range(0, len(t), max_piece)]
            pieces.append(chunks[0])
            pieces.extend("##" + c for c in chunks[1:])
            n_pieces.append(len(chunks))
    return pieces, n_pieces


def collapse_subtoken_labels(
    sub_labels: list[str], n_pieces: list[int], scheme: str = "v1"
) -> list[str]:
    """P7 inverse: sub-token label sequence -> word-level labels.

    Each word's label is its FIRST piece's label (the reference's
    prediction decode keeps first-piece logits and drops continuations,
    ner_format_utils.py semantics); continuation labels are scheme
    bookkeeping (I-X / O / PAD) and carry no span information. Exact
    inverse of :func:`subtoken_labels` for every scheme."""
    if scheme not in ("v1", "v2", "v3"):
        raise ValueError(f"unknown scheme {scheme}")
    out, i = [], 0
    for k in n_pieces:
        out.append(sub_labels[i])
        i += k
    return out


def insert_entity_markers(
    tokens: list[str],
    head: tuple[int, int],
    tail: tuple[int, int],
    variant: str = "v2",
) -> tuple[list[str], tuple[int, int], tuple[int, int]]:
    """P8: entity-marker insertion around/instead of the two spans.

    v1: unchanged; v2: wrap spans with open/close markers; v3: replace
    each span with a single marker token. Returns (tokens, new head span,
    new tail span). Spans are [s, e) word indexes; head/tail may be in
    either order in the sentence. Semantics per
    Relation_Extraction_and_Coreference_Resolution/data_loader.py:203-266.
    """
    (hs, he), (ts, te) = head, tail
    if variant == "v1":
        return list(tokens), head, tail
    spans = sorted([(hs, he, "head"), (ts, te, "tail")])
    out: list[str] = []
    pos = 0
    new_spans = {}
    for s, e, kind in spans:
        out.extend(tokens[pos:s])
        opener, closer, repl = (
            (HEAD_OPEN, HEAD_CLOSE, HEAD_REPL) if kind == "head" else (TAIL_OPEN, TAIL_CLOSE, TAIL_REPL)
        )
        if variant == "v2":
            start = len(out)
            out.append(opener)
            out.extend(tokens[s:e])
            out.append(closer)
            new_spans[kind] = (start, len(out))  # marker-inclusive, as the reference pools marker vectors
        elif variant == "v3":
            start = len(out)
            out.append(repl)
            new_spans[kind] = (start, start + 1)
        else:
            raise ValueError(f"unknown variant {variant}")
        pos = e
    out.extend(tokens[pos:])
    return out, new_spans["head"], new_spans["tail"]


def rel_position_ids(n: int, head: tuple[int, int], tail: tuple[int, int]) -> list[int]:
    """P9: 0 default, 1 on the head span, 2 on the tail span
    (data_loader.py:273-277)."""
    ids = [0] * n
    for i in range(head[0], min(head[1], n)):
        ids[i] = 1
    for i in range(tail[0], min(tail[1], n)):
        ids[i] = 2
    return ids


# ---------------------------------------------------------------------------
# F3: Biaffine-style span detector (alternative mention detector)
# ---------------------------------------------------------------------------


def biaffine_span_scores(tokens: list[str], b_index, i_index) -> list[tuple[int, int, str, float]]:
    """Surrogate seq x seq span scorer: every [s, e) up to length 6 whose
    token sequence is a known gazetteer surface scores 1.0 + length bonus
    (longer spans outrank their sub-spans, mirroring the trained model's
    preference for maximal spans). Sparse by construction — only scored
    candidates are returned, never the dense matrix (SURVEY.md §1.1)."""
    from kgp.functions.surrogate import tokenize  # surfaces tokenized the same way

    cands = []
    n = len(tokens)
    for s in range(n):
        types = b_index.get(tokens[s])
        if not types:
            continue
        for e in range(s + 1, min(s + 7, n + 1)):
            if e > s + 1 and not i_index.get(tokens[e - 1]):
                break
            for t in sorted(types):
                if _is_known_surface(tokens[s:e], t, b_index, i_index):
                    cands.append((s, e, t, 1.0 + 0.01 * (e - s)))
    return cands


def _is_known_surface(span_tokens, etype, b_index, i_index) -> bool:
    if etype not in b_index.get(span_tokens[0], ()):
        return False
    return all(etype in i_index.get(tok, ()) for tok in span_tokens[1:])


def flat_ner_decode(cands: list[tuple[int, int, str, float]]) -> list[tuple[int, int, str]]:
    """Greedy overlap-pruned decode (Rm2entities semantics,
    Biaffine/biaffine_utils.py:25-70 shape): sort by score desc (ties:
    earlier start, longer span, label asc — deterministic), keep a span
    iff it does not overlap any kept span."""
    kept: list[tuple[int, int, str]] = []
    for s, e, label, _ in sorted(cands, key=lambda c: (-c[3], c[0], -(c[1] - c[0]), c[2])):
        if all(e <= ks or s >= ke for ks, ke, _ in kept):
            kept.append((s, e, label))
    return sorted(kept)


def detect_spans_biaffine(tokens: list[str], b_index, i_index) -> list[tuple[int, int, str]]:
    """F3 chain: span scores -> greedy flat-NER decode. Same interface as
    surrogate.detect_spans (the CRF path)."""
    return flat_ner_decode(biaffine_span_scores(tokens, b_index, i_index))
