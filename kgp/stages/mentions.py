"""Mention detection (SURVEY.md F1/F2, P6/P7/P15): documents -> mentions.

One ``mapInPandas`` pass per Arrow batch of documents:
tokenize every turn (F1) -> gazetteer emission model (surrogate for the
BERT token tagger, CRF/modeling_bert.py:248-350) -> batch-vectorized
Viterbi (the CRF ``decode()`` path, CRF/main.py:311-318) -> BIO decode to
spans (ner_format_utils.py:23-73 semantics) -> explode to one row per
mention. The tagger parameters (token membership indexes) are built once
driver-side and shipped via broadcast, not captured per-task.

``mention_id`` is a content hash (xxhash64 over conv_id|turn_idx|start|end)
computed with the Spark builtin AFTER the UDF — cross-run stable, partition
independent (SURVEY.md §4.3(2)).

Also provides ``tokenize_turns`` — the standalone F1 tokenizer over raw
transcripts, reused by the relation stage to slice between-span tokens.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kgp.config import DEFAULT_CONFIG, PipelineConfig
from kgp.functions.surrogate import LABELS, batch_viterbi, bio_decode, tokenize_batch
from kgp.ids import spark_stable_id_expr

MENTION_SCHEMA = (
    "conv_id string, turn_idx int, start int, end int, mention string, label string"
)
TAGGED_SCHEMA = MENTION_SCHEMA + ", tokens array<string>"


def tag_turns(
    spark: SparkSession,
    documents: DataFrame,
    surfaces: list,
    cfg: PipelineConfig = DEFAULT_CONFIG,
    tagger: str = "crf",
) -> DataFrame:
    """ONE narrow pass over the turns producing two row kinds:

    - mention rows (``start`` NOT NULL, ``tokens`` NULL) — the F2 output;
    - per-turn token rows (``start`` NULL, ``tokens`` = the turn's F1
      tokens) — emitted ONLY for turns with >= 2 mentions, i.e. exactly
      the turns the relation stage can form a pair in.

    This is the fused fast path the e2e pipeline runs: the tagger already
    tokenizes every turn, so re-tokenizing the corpus for RE
    (tokenize_turns) and shuffling the FULL token table into the pair
    join would both be pure memory-bandwidth waste at scale — the
    multi-mention token table is a small fraction of the corpus and AQE
    broadcast-joins it against the pair table.

    Input is either the raw transcript/turn table (conv_id, turn_idx,
    text) — the fast path: the tagger is a NARROW map over turns, no
    shuffle and no nested-struct Arrow conversion upstream — or an
    assembled ``documents`` table (exploded back to turns JVM-side).
    Mentions are keyed by (conv_id, turn_idx) so both inputs are
    equivalent; document assembly is NOT on the tagger's critical path.

    ``surfaces``: [(surface_string, entity_type)] — the tagger's gazetteer.
    ``tagger``: "crf" (emissions + Viterbi + BIO decode, the reference's
    best path) or "biaffine" (span scorer + greedy flat-NER decode, F3) —
    both behind this one interface, as in SURVEY.md §7 slice 3.
    """
    from kgp.functions.surrogate import build_tagger_params

    params_bc = spark.sparkContext.broadcast(build_tagger_params(surfaces))
    max_len = cfg.max_seq_len
    scheme = cfg.label_scheme
    if tagger not in ("crf", "biaffine"):
        raise ValueError(f"unknown tagger {tagger}")

    if "turns" in documents.columns:  # assembled documents -> flat turns
        turns = documents.select(
            "conv_id", F.explode("turns").alias("t")
        ).select("conv_id", F.col("t.turn_idx").alias("turn_idx"), F.col("t.text").alias("text"))
    else:
        turns = documents.select("conv_id", "turn_idx", "text")

    def tag(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from kgp.functions.surrogate import build_emissions_cached, make_o_row

        b_index, i_index = params_bc.value
        o_row = make_o_row()
        row_cache: dict = {}  # token -> emission row; lives for the task
        for pdf in batches:
            conv_ids, turn_idxs, token_lists = [], [], []
            # vectorized F1 over the whole Arrow batch (same output as the
            # scalar tokenize(), property-tested)
            for conv_id, turn_idx, toks in zip(
                pdf["conv_id"], pdf["turn_idx"], tokenize_batch(pdf["text"])
            ):
                if toks:
                    conv_ids.append(conv_id)
                    turn_idxs.append(turn_idx)
                    token_lists.append(toks[:max_len])  # truncation, P5 analogue
            if tagger == "crf":
                # decode only sequences with >=1 gazetteer hit: a no-hit
                # sequence has all-O emissions, whose Viterbi path is all-O
                # and decodes to zero spans (see build_emissions_cached)
                ems, hit_idx = [], []
                for i, toks in enumerate(token_lists):
                    em, hit = build_emissions_cached(toks, b_index, i_index, row_cache, o_row)
                    if hit:
                        ems.append(em)
                        hit_idx.append(i)
                paths = batch_viterbi(ems)
                span_lists = [[] for _ in token_lists]
                for i, path in zip(hit_idx, paths):
                    span_lists[i] = bio_decode([LABELS[j] for j in path])
            else:
                from kgp.functions.encoding import detect_spans_biaffine

                span_lists = [
                    detect_spans_biaffine(toks, b_index, i_index) for toks in token_lists
                ]
            if scheme != "v1":
                # P7 on the live path: word BIO -> sub-token labels under
                # scheme v2/v3 (WordPiece-style surrogate pieces) -> first-
                # piece collapse -> word spans. The round trip must be the
                # identity (ner_data_utils.py:376-410 encode /
                # ner_format_utils.py decode contract) — the driver query
                # checks the v2 run against the word-level gold, so any
                # piece-alignment bug breaks the hash.
                from kgp.functions.encoding import (
                    collapse_subtoken_labels,
                    subtoken_labels,
                    subtokenize,
                )
                from kgp.functions.surrogate import bio_encode

                redecoded = []
                for toks, spans in zip(token_lists, span_lists):
                    word_labels = bio_encode(len(toks), spans)
                    pieces, n_pieces = subtokenize(toks)
                    # alignment check INDEPENDENT of n_pieces: word starts
                    # are the non-"##" pieces, so the piece strings alone
                    # determine the word->piece alignment. The encode/
                    # decode round trip below is the identity for ANY
                    # n_pieces (first-piece labels survive collapse), so
                    # without this check a subtokenize misalignment could
                    # never break the driver query's hash.
                    n_check = []
                    for p in pieces:
                        if p.startswith("##") and n_check:
                            n_check[-1] += 1
                        else:
                            n_check.append(1)
                    if n_check != n_pieces:
                        raise ValueError(
                            f"subtokenize misalignment: pieces imply {n_check}, "
                            f"n_pieces says {n_pieces} for tokens {toks!r}"
                        )
                    sub = subtoken_labels(word_labels, n_pieces, scheme)
                    if len(sub) != len(pieces):
                        raise ValueError(
                            f"subtoken label/piece length mismatch: "
                            f"{len(sub)} labels vs {len(pieces)} pieces"
                        )
                    back = collapse_subtoken_labels(sub, n_pieces, scheme)
                    redecoded.append(bio_decode(back))
                span_lists = redecoded
            out = {
                "conv_id": [], "turn_idx": [], "start": [], "end": [],
                "mention": [], "label": [], "tokens": [],
            }
            for cid, tix, toks, spans in zip(conv_ids, turn_idxs, token_lists, span_lists):
                for s, e, label in spans:
                    out["conv_id"].append(cid)
                    out["turn_idx"].append(tix)
                    out["start"].append(s)
                    out["end"].append(e)
                    out["mention"].append(" ".join(toks[s:e]))
                    out["label"].append(label)
                    out["tokens"].append(None)
                if len(spans) >= 2:  # a token row only where RE pairs can exist
                    out["conv_id"].append(cid)
                    out["turn_idx"].append(tix)
                    out["start"].append(None)
                    out["end"].append(None)
                    out["mention"].append(None)
                    out["label"].append(None)
                    out["tokens"].append(list(toks))
            yield pd.DataFrame(out)

    return turns.mapInPandas(tag, schema=TAGGED_SCHEMA)


def mentions_from_tagged(tagged: DataFrame) -> DataFrame:
    return tagged.where(F.col("start").isNotNull()).drop("tokens").withColumn(
        "mention_id", spark_stable_id_expr("conv_id", "turn_idx", "start", "end")
    )


def pair_turn_tokens(tagged: DataFrame) -> DataFrame:
    """(conv_id, turn_idx, tokens) for multi-mention turns only."""
    return tagged.where(F.col("start").isNull()).select("conv_id", "turn_idx", "tokens")


def detect_mentions(
    spark: SparkSession,
    documents: DataFrame,
    surfaces: list,
    cfg: PipelineConfig = DEFAULT_CONFIG,
    tagger: str = "crf",
) -> DataFrame:
    """turns/documents -> mentions (the F2 contract; see :func:`tag_turns`
    for the fused single-pass variant the pipeline composes from)."""
    return mentions_from_tagged(tag_turns(spark, documents, surfaces, cfg, tagger))


TOKENS_SCHEMA = "conv_id string, turn_idx int, tokens array<string>"


def tokenize_turns(transcripts: DataFrame) -> DataFrame:
    """Standalone F1 tokenizer over raw turns (vectorized pandas UDF)."""

    @F.pandas_udf("array<string>")
    def tok(texts: pd.Series) -> pd.Series:
        return pd.Series(tokenize_batch(texts), index=texts.index)

    return transcripts.select("conv_id", "turn_idx", tok("text").alias("tokens"))
