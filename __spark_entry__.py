"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship: full KG construction pipeline (transcripts ->
documents -> mentions -> relations -> coref clusters -> entity links ->
triples) at sf0.001, returning the triples DataFrame.

``queries()`` / ``oracle_sql()`` — one entry per operator from
SURVEY.md §2, checked side-by-side against DuckDB at sf0.01. The KG
pipeline's transcript input is synthesized deterministically per sf (see
kgp/entry_support.py); its oracle is the single-process Python oracle's
materialized gold parquet, plus real relational SQL where the operator is
SQL-expressible (doc assembly, pair joins, KGAT arithmetic, dedup family,
ANN, text stats). Coref clustering (iterative connected components) has no
SQL twin and is covered transitively: kg_clusters compares the full
distributed clustering against the oracle gold.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kgp import oracles
from kgp.config import DEFAULT_CONFIG
from kgp.entry_support import ensure_fixtures, fixture_dir, fixture_model_for, load_transcripts

CFG = DEFAULT_CONFIG
SF001 = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.01"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def _gold(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    fdir = ensure_fixtures(sf_dir)
    return spark.read.parquet(os.path.join(fdir, f"{name}.parquet"))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on sf0.001: the full KG construction pipeline."""
    from kgp.stages.pipeline import run_pipeline

    transcripts = load_transcripts(spark, SF001)
    model = fixture_model_for(spark, SF001)
    out = run_pipeline(spark, transcripts, model, CFG)
    return out["triples"].select(
        "conv_id",
        "subj",
        "pred",
        "obj",
        F.array_join(F.transform("src_turns", lambda x: x.cast("string")), ",").alias("src_turns"),
    )


# ---------------------------------------------------------------------------
# KG pipeline queries (fixture transcripts; gold = python oracle parquet)
# ---------------------------------------------------------------------------


def _q_doc_assembly(spark, sf_dir):
    from kgp.stages.assemble import assemble_documents

    docs = assemble_documents(load_transcripts(spark, sf_dir), CFG)
    return docs.select(
        "conv_id", F.col("seg").cast("long").alias("seg"),
        F.col("n_turns").cast("long").alias("n_turns"), "doc_text",
    )


_PIPE_CACHE: dict = {}


def _pipeline_outputs(spark, sf_dir):
    """Memoized per (spark app, sf_dir): several queries() entries expose
    different outputs of the same pipeline run; within one session the
    shared upstream stages (mentions, clusters) stay persisted."""
    from kgp.stages.pipeline import run_pipeline

    key = (spark.sparkContext.applicationId, os.path.normpath(sf_dir))
    if key not in _PIPE_CACHE:
        _PIPE_CACHE[key] = run_pipeline(
            spark, load_transcripts(spark, sf_dir), fixture_model_for(spark, sf_dir), CFG
        )
    return _PIPE_CACHE[key]


def _q_mentions(spark, sf_dir):
    m = _pipeline_outputs(spark, sf_dir)["mentions"]
    return m.select(
        "conv_id", F.col("turn_idx").cast("long").alias("turn_idx"),
        F.col("start").cast("long").alias("start"), F.col("end").cast("long").alias("end"),
        "mention", "label", "mention_id",
    )


def _mention_projection(m):
    return m.select(
        "conv_id", F.col("turn_idx").cast("long").alias("turn_idx"),
        F.col("start").cast("long").alias("start"), F.col("end").cast("long").alias("end"),
        "mention", "label", "mention_id",
    )


def _q_mentions_biaffine(spark, sf_dir):
    """F3: the biaffine span-scorer detector behind the same interface,
    against its own oracle gold (Biaffine/biaffine_utils.py:25-70)."""
    from kgp.stages.mentions import detect_mentions

    m = detect_mentions(
        spark, load_transcripts(spark, sf_dir),
        fixture_model_for(spark, sf_dir).surfaces, CFG, tagger="biaffine",
    )
    return _mention_projection(m)


def _q_mentions_subtok(spark, sf_dir):
    """P5/P7 live: tagger with WordPiece-style sub-tokenization + scheme-v2
    relabel + first-piece collapse; must reproduce the word-level gold
    exactly (the encode/decode round-trip contract)."""
    from dataclasses import replace

    from kgp.stages.mentions import detect_mentions

    cfg2 = replace(CFG, label_scheme="v2")
    m = detect_mentions(
        spark, load_transcripts(spark, sf_dir),
        fixture_model_for(spark, sf_dir).surfaces, cfg2,
    )
    return _mention_projection(m)


def _q_metric_span_prf(spark, sf_dir):
    """A7/J5: seqeval-style span P/R/F1 of the biaffine detector's spans
    against the CRF-path gold — one row of totals (the reference's
    global-accumulation convention, not per-sample averaging)."""
    from kgp.metrics import span_prf_df

    pred = _gold(spark, sf_dir, "gold_mentions_biaffine")
    gold = _gold(spark, sf_dir, "gold_mentions")
    return span_prf_df(pred, gold, keys=("conv_id", "turn_idx"))


def _q_metric_ann_recall(spark, sf_dir):
    """A11 + the LSH recall floor, driver-visible: per-query
    precision@10 / recall@10 / ndcg@10 of hyperplane-LSH top-k against
    the exact brute-force top-10 (ndcg rounded to 9 dp: group-sum float
    order is the only engine difference)."""
    from kgp.metrics import ranking_metrics
    from kgp.ops.similarity import cosine_topk_bruteforce, cosine_topk_lsh

    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    q = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    approx = cosine_topk_lsh(emb, q, k=10, n_planes=6, n_tables=4, dim=64, seed=42).select(
        F.col("q_id").alias("user"), F.col("vec_id").alias("item"), "rank"
    )
    truth = cosine_topk_bruteforce(emb, q, k=10).select(
        F.col("q_id").alias("user"), F.col("vec_id").alias("item")
    )
    out = ranking_metrics(approx, truth, k=10)
    return out.select(
        "user", F.col("n_hit").cast("long").alias("n_hit"),
        F.col("n_true").cast("long").alias("n_true"),
        "precision_at_k", "recall_at_k",
        F.round("ndcg_at_k", 9).alias("ndcg_at_k"),
    )


def _q_metric_el_micro_prf(spark, sf_dir):
    """A6: micro P/R/F1 (eval_el.py:309-346 global tp/np/nt accumulation)
    of the live pipeline's EL candidate set against the gold link set —
    candidates over-generate (top-k per cluster), so precision < 1 while
    recall stays 1.0: the counting machinery is exercised on a real
    disagreement, not an identity."""
    from kgp.metrics import micro_prf_df

    pred = (
        _pipeline_outputs(spark, sf_dir)["link_candidates"]
        .select("cluster_id", "entity_id")
        .distinct()
    )
    gold = _gold(spark, sf_dir, "gold_links").select("cluster_id", "entity_id").distinct()
    return micro_prf_df(pred, gold, ["cluster_id", "entity_id"])


def _q_metric_frame_acc(spark, sf_dir):
    """A8: sentence-frame accuracy (CRF/metrics_utils.py:17-35 "all slots
    correct") of a deterministically perturbed mention table against the
    CRF gold. The perturbation — drop spans with
    (start*31 + end*7 + turn_idx) % 10 == 0, relabel those ≡ 1 to PER —
    is pure arithmetic applied identically by both engines, so the frame
    join/count machinery is certified on frames that genuinely disagree."""
    from kgp.metrics import frame_accuracy_df

    gold = _gold(spark, sf_dir, "gold_mentions").select(
        "conv_id", "turn_idx", "start", "end", "label"
    )
    h = F.col("start") * 31 + F.col("end") * 7 + F.col("turn_idx")
    pred = (
        _gold(spark, sf_dir, "gold_mentions_biaffine")
        .where(h % 10 != 0)
        .select(
            "conv_id", "turn_idx", "start", "end",
            F.when(h % 10 == 1, F.lit("PER")).otherwise(F.col("label")).alias("label"),
        )
    )
    return frame_accuracy_df(pred, gold, keys=("conv_id", "turn_idx"))


def _q_metric_re_prior_acc(spark, sf_dir):
    """A9: classification accuracy (utils.py:61-65 ``(preds==labels).mean()``)
    of a label-pair-prior relation predictor — per (head_label, tail_label)
    the most frequent rel_id, ties to the smaller id — evaluated against
    the LIVE pipeline's emitted relations joined to the live mention labels
    (the oracle runs the same evaluation over the gold parquet, so relation
    and mention emission parity is re-checked through this lens)."""
    from pyspark.sql import Window

    out = _pipeline_outputs(spark, sf_dir)
    m = out["mentions"].select("mention_id", "label")
    lab = (
        out["relations"]
        .select("head_mention_id", "tail_mention_id", "rel_id")
        .join(m.select(F.col("mention_id").alias("head_mention_id"),
                       F.col("label").alias("head_label")), "head_mention_id")
        .join(m.select(F.col("mention_id").alias("tail_mention_id"),
                       F.col("label").alias("tail_label")), "tail_mention_id")
        .select("head_label", "tail_label", "rel_id")
    )
    w = Window.partitionBy("head_label", "tail_label").orderBy(
        F.desc("cnt"), F.asc("rel_id")
    )
    prior = (
        lab.groupBy("head_label", "tail_label", "rel_id")
        .agg(F.count("*").alias("cnt"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("head_label", "tail_label", F.col("rel_id").alias("prior_rel"))
    )
    scored = lab.join(F.broadcast(prior), ["head_label", "tail_label"])
    return scored.agg(
        F.count("*").alias("n_pairs"),
        F.sum((F.col("rel_id") == F.col("prior_rel")).cast("long")).alias("n_correct"),
        F.avg((F.col("rel_id") == F.col("prior_rel")).cast("double")).alias("accuracy"),
    )


def _q_relations(spark, sf_dir):
    r = _pipeline_outputs(spark, sf_dir)["relations"]
    return r.select(
        "conv_id", F.col("turn_idx").cast("long").alias("turn_idx"),
        "head_mention_id", "tail_mention_id",
        F.col("rel_id").cast("long").alias("rel_id"), "rel", "score",
    )


def _q_clusters(spark, sf_dir):
    return _pipeline_outputs(spark, sf_dir)["clusters"].select("conv_id", "mention_id", "cluster_id")


def _q_links(spark, sf_dir):
    return _pipeline_outputs(spark, sf_dir)["links"].select("cluster_id", "entity_id", "score")


def _q_el_sweep(spark, sf_dir):
    """E2: one-pass EL threshold sweep over the live pipeline's candidate
    table, evaluated against the gold link set (reference eval_el.py's
    per-θ table). The oracle runs the same sweep over the materialized
    GOLD candidates — so candidate-table parity is checked transitively."""
    from kgp.stages.linking import threshold_sweep

    cand = _pipeline_outputs(spark, sf_dir)["link_candidates"]
    gold = _gold(spark, sf_dir, "gold_links")
    return threshold_sweep(cand, gold)


def _q_triples(spark, sf_dir):
    t = _pipeline_outputs(spark, sf_dir)["triples"]
    return t.select(
        "conv_id", "subj", "pred", "obj",
        F.array_join(F.transform("src_turns", lambda x: x.cast("string")), ",").alias("src_turns"),
    )


def _q_triples_streaming(spark, sf_dir):
    """§2.9 streaming upgrade path, driver-certified END-TO-END: the
    transcripts arrive as two micro-batches (every 8th conversation's
    turns ≥ 3 arrive only in the second batch), the incremental pipeline
    archives + reprocesses split conversations (kgp/streaming/
    incremental.py), and the converged read view must equal the BATCH
    pipeline's triples — so the oracle is the same gold table kg_triples
    certifies against."""
    import tempfile

    from kgp.streaming.incremental import incremental_triples, read_incremental_triples

    t = load_transcripts(spark, sf_dir)
    conv_num = F.substring("conv_id", 6, 10).cast("int")
    late = (conv_num % 8 == 0) & (F.col("turn_idx") >= 3)
    work = tempfile.mkdtemp(prefix="kgp_stream_q_")
    indir = os.path.join(work, "in")
    t.where(~late).coalesce(1).write.mode("append").parquet(indir)
    t.where(late).coalesce(1).write.mode("append").parquet(indir)
    sink = incremental_triples(
        spark, indir, fixture_model_for(spark, sf_dir),
        os.path.join(work, "out"), max_files_per_batch=1,
    )
    out = read_incremental_triples(spark, sink)
    return out.select(
        "conv_id", "subj", "pred", "obj",
        F.array_join(F.transform("src_turns", lambda x: x.cast("string")), ",").alias("src_turns"),
    )


def _q_edges(spark, sf_dir):
    e = _pipeline_outputs(spark, sf_dir)["edges"]
    return e.select(F.col("h").cast("long"), F.col("r").cast("long"), F.col("t").cast("long"))


def _q_re_pairs(spark, sf_dir):
    from kgp.stages.pairs import re_pairs

    m = _gold(spark, sf_dir, "gold_mentions")
    return re_pairs(m, CFG).select("a_mention_id", "b_mention_id")


def _q_coref_pairs(spark, sf_dir):
    from kgp.stages.pairs import coref_pairs

    m = _gold(spark, sf_dir, "gold_mentions")
    return coref_pairs(m, CFG).select("a_mention_id", "b_mention_id")


def _q_kgat_edges(spark, sf_dir):
    from kgp.stages.graph import kgat_construct

    li = _t(spark, sf_dir, "lineitem")
    od = _t(spark, sf_dir, "orders")
    kg = li.select(
        F.col("l_partkey").cast("long").alias("h"), F.lit(0).alias("r"),
        F.col("l_suppkey").cast("long").alias("t"),
    ).distinct()
    cf = (
        od.join(li, od["o_orderkey"] == li["l_orderkey"])
        .select(F.col("o_custkey").cast("long").alias("user"), F.col("l_partkey").cast("long").alias("item"))
        .distinct()
    )
    e = kgat_construct(kg, cf)["edges"]
    return e.select(F.col("h").cast("long"), F.col("r").cast("long"), F.col("t").cast("long"))


# ---------------------------------------------------------------------------
# reference-format reader queries (S1-S7): Spark parses the raw fixture
# files; the DuckDB twin re-parses the SAME bytes (kgp/oracles.py)
# ---------------------------------------------------------------------------

FIXTURE_ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures")


def _reader_paths() -> dict[str, str]:
    from kgp.io.reader_fixtures import ensure_reader_fixtures

    return ensure_reader_fixtures(FIXTURE_ROOT)


def _q_read_semeval(spark, sf_dir):
    from kgp.io.readers import read_semeval_jsonl

    ok, _quarantine = read_semeval_jsonl(spark, _reader_paths()["semeval.jsonl"])
    return ok.select(
        F.array_join("tokens", " ").alias("sent"),
        "head_name", F.col("head_s").cast("long").alias("head_s"),
        F.col("head_e").cast("long").alias("head_e"),
        "tail_name", F.col("tail_s").cast("long").alias("tail_s"),
        F.col("tail_e").cast("long").alias("tail_e"),
        "relation",
    )


def _q_read_mrc(spark, sf_dir):
    from kgp.io.readers import read_mrc_ner_json

    df = read_mrc_ner_json(spark, _reader_paths()["mrc_ner.json"])
    return df.select("sample_id", "context", F.explode("spans").alias("sp")).select(
        "sample_id", "context",
        F.col("sp.start").cast("long").alias("start"),
        F.col("sp.end").cast("long").alias("end"),
        F.col("sp.label").alias("label"),
    )


def _q_read_ccks(spark, sf_dir):
    from kgp.io.readers import read_ccks_json

    df = read_ccks_json(spark, _reader_paths()["ccks_ner.json"])
    return df.select("sentence", F.explode("spans").alias("sp")).select(
        "sentence",
        F.col("sp.start").cast("long").alias("start"),
        F.col("sp.end").cast("long").alias("end"),
        F.col("sp.label").alias("label"),
    )


def _q_read_el_tsv(spark, sf_dir):
    from kgp.io.readers import read_el_pairs_tsv

    return read_el_pairs_tsv(spark, _reader_paths()["el_pairs.tsv"]).select(
        "text_a", "text_b", F.col("label").cast("long").alias("label")
    )


def _q_read_cdn(spark, sf_dir):
    from kgp.io.readers import read_cdn_json

    df = read_cdn_json(spark, _reader_paths()["cdn.json"])
    return df.select("text", F.explode("gold_entities").alias("gold_entity"))


def _q_read_kg_triples(spark, sf_dir):
    from kgp.io.readers import read_kg_triples

    df = read_kg_triples(spark, _reader_paths()["kg_final.txt"])
    return df.select(
        F.col("h").cast("long"), F.col("r").cast("long"), F.col("t").cast("long")
    )


def _q_read_cf_adjacency(spark, sf_dir):
    from kgp.io.readers import read_cf_adjacency

    return read_cf_adjacency(spark, _reader_paths()["cf_train.txt"])


def _q_read_id_remap(spark, sf_dir):
    from kgp.io.readers import read_id_remap

    return read_id_remap(spark, _reader_paths()["entity_remap.txt"])


# ---------------------------------------------------------------------------
# F7: KGAT attention score + softmax, end-to-end certified
# ---------------------------------------------------------------------------

_ATT_N_ENT, _ATT_N_REL = 40, 4


def _q_kgat_attention(spark, sf_dir):
    """F7 end-to-end: per-edge ``tanh(W_r e_h + e_r) . (W_r e_t)``
    (KGAT-pytorch/model/KGAT.py:111-129) composed with the A10
    per-destination softmax (helper.py:11-23), over a deterministic
    lineitem-derived edge table and fixture embedding matrices."""
    import numpy as np

    from kgp.fixtures import attention_fixture
    from kgp.stages.graph import edge_softmax, kgat_attention

    ent, rel, w = attention_fixture(_ATT_N_ENT, _ATT_N_REL)
    li = _t(spark, sf_dir, "lineitem")
    edges = li.select(
        (F.col("l_suppkey") % _ATT_N_ENT).cast("long").alias("h"),
        (F.col("l_linenumber") % _ATT_N_REL).cast("int").alias("r"),
        (F.col("l_partkey") % _ATT_N_ENT).cast("long").alias("t"),
    ).distinct()
    scored = kgat_attention(spark, edges, np.array(ent), np.array(rel), np.array(w))
    out = edge_softmax(scored)
    return out.select(
        "h", F.col("r").cast("long").alias("r"), "t",
        F.round("score", 9).alias("score"), F.round("att", 9).alias("att"),
    )


def _kgat_aggregate_impl(spark, sf_dir, aggregator: str):
    """KGAT aggregation round (KGAT-pytorch/model/KGAT.py:38-108, all
    three user-facing ``aggregation_type`` variants): attention +
    per-destination softmax (F7/A10) composed into the per-node embedding
    update over e_N = sum att * e_t — pure groupBy-sum + broadcast
    dataflow, one row per (entity, output dim). Bi-interaction:
    e_h' = leaky(W1(e_h + e_N)) + leaky(W2(e_h * e_N)); gcn drops the
    W2 term; graphsage is the concat-linear split leaky(W1 e_h + W2 e_N)."""
    import numpy as np

    from kgp.fixtures import aggregate_fixture, attention_fixture
    from kgp.stages.graph import edge_softmax, kgat_aggregate, kgat_attention

    ent, rel, w = attention_fixture(_ATT_N_ENT, _ATT_N_REL)
    w1, w2 = aggregate_fixture(d=len(ent[0]))
    li = _t(spark, sf_dir, "lineitem")
    edges = li.select(
        (F.col("l_suppkey") % _ATT_N_ENT).cast("long").alias("h"),
        (F.col("l_linenumber") % _ATT_N_REL).cast("int").alias("r"),
        (F.col("l_partkey") % _ATT_N_ENT).cast("long").alias("t"),
    ).distinct()
    scored = edge_softmax(kgat_attention(spark, edges, np.array(ent), np.array(rel), np.array(w)))
    out = kgat_aggregate(
        spark,
        scored,
        ent,
        w1,
        None if aggregator == "gcn" else w2,  # exercise the zeros default
        aggregator=aggregator,
    )
    return out.select("h", "j", F.round("e_out", 6).alias("e_out"))


def _q_kgat_aggregate(spark, sf_dir):
    return _kgat_aggregate_impl(spark, sf_dir, "bi-interaction")


def _q_kgat_aggregate_gcn(spark, sf_dir):
    return _kgat_aggregate_impl(spark, sf_dir, "gcn")


def _q_kgat_aggregate_graphsage(spark, sf_dir):
    return _kgat_aggregate_impl(spark, sf_dir, "graphsage")


_CF_EMB_DIMS = (8, 6, 4)


def _q_kgat_cf_embedding(spark, sf_dir):
    """The reference's FULL cf_embedding (KGAT-pytorch/model/KGAT.py:164-176,
    Equation 11): attention + softmax (F7/A10), then a STACK of
    bi-interaction aggregation layers (8 -> 6 -> 4, the reference's halving
    conv_dim_list shape), each L2-normalized, concatenated with the ego
    embedding into long-form (h, k, val). Layer k+1 consumes layer k as a
    DataFrame (shuffle equi-joins, no driver collect) — the shape that
    holds when the embedding table itself is big data."""
    import numpy as np

    from kgp.fixtures import attention_fixture, cf_layer_fixture
    from kgp.stages.graph import edge_softmax, kgat_attention, kgat_cf_embedding

    ent, rel, w = attention_fixture(_ATT_N_ENT, _ATT_N_REL)
    li = _t(spark, sf_dir, "lineitem")
    edges = li.select(
        (F.col("l_suppkey") % _ATT_N_ENT).cast("long").alias("h"),
        (F.col("l_linenumber") % _ATT_N_REL).cast("int").alias("r"),
        (F.col("l_partkey") % _ATT_N_ENT).cast("long").alias("t"),
    ).distinct()
    scored = edge_softmax(kgat_attention(spark, edges, np.array(ent), np.array(rel), np.array(w)))
    out = kgat_cf_embedding(spark, scored, ent, cf_layer_fixture(_CF_EMB_DIMS))
    return out.select("h", "k", F.round("val", 6).alias("val"))


_CF_SCORE_USER_MOD = 5


def _q_kgat_cf_score(spark, sf_dir):
    """The reference's cf_score (KGAT-pytorch/model/KGAT.py:179-193,
    Equation 12): eval-user x eval-item score matrix as dot products over
    the concatenated stacked cf_embedding — relational matmul (join on the
    concat dim with the eval-user side broadcast + grouped sum), exactly
    the composition calc_score runs per test batch."""
    import numpy as np

    from kgp.fixtures import attention_fixture, cf_layer_fixture
    from kgp.stages.graph import (
        edge_softmax,
        kgat_attention,
        kgat_cf_embedding,
        kgat_cf_score,
    )

    ent, rel, w = attention_fixture(_ATT_N_ENT, _ATT_N_REL)
    li = _t(spark, sf_dir, "lineitem")
    edges = li.select(
        (F.col("l_suppkey") % _ATT_N_ENT).cast("long").alias("h"),
        (F.col("l_linenumber") % _ATT_N_REL).cast("int").alias("r"),
        (F.col("l_partkey") % _ATT_N_ENT).cast("long").alias("t"),
    ).distinct()
    scored = edge_softmax(kgat_attention(spark, edges, np.array(ent), np.array(rel), np.array(w)))
    all_embed = kgat_cf_embedding(spark, scored, ent, cf_layer_fixture(_CF_EMB_DIMS))
    ids = spark.range(_ATT_N_ENT)
    users = ids.where(F.col("id") % _CF_SCORE_USER_MOD == 2).select(F.col("id").alias("user"))
    items = ids.where(F.col("id") % _CF_SCORE_USER_MOD != 2).select(F.col("id").alias("item"))
    out = kgat_cf_score(all_embed, users, items)
    return out.select("user", "item", F.round("score", 6).alias("score"))


_CF_LOSS_LAMBDA = 1e-5


def _q_kgat_cf_loss(spark, sf_dir):
    """The reference's calc_cf_loss (KGAT-pytorch/model/KGAT.py:195-219,
    Equations 12-13): BPR + L2 over the stacked concat cf_embedding for a
    deterministic DISTINCT (user, pos_item, neg_item) lineitem batch —
    three uniform equi-joins on the concat dim, one grouped sum per batch
    row, one global mean. Nothing is collected; both the batch and the
    embedding table stay distributed."""
    import numpy as np

    from kgp.fixtures import attention_fixture, cf_layer_fixture
    from kgp.stages.graph import (
        edge_softmax,
        kgat_attention,
        kgat_cf_embedding,
        kgat_cf_loss,
    )

    ent, rel, w = attention_fixture(_ATT_N_ENT, _ATT_N_REL)
    li = _t(spark, sf_dir, "lineitem")
    edges = li.select(
        (F.col("l_suppkey") % _ATT_N_ENT).cast("long").alias("h"),
        (F.col("l_linenumber") % _ATT_N_REL).cast("int").alias("r"),
        (F.col("l_partkey") % _ATT_N_ENT).cast("long").alias("t"),
    ).distinct()
    scored = edge_softmax(kgat_attention(spark, edges, np.array(ent), np.array(rel), np.array(w)))
    all_embed = kgat_cf_embedding(spark, scored, ent, cf_layer_fixture(_CF_EMB_DIMS))
    batch = li.select(
        (F.col("l_suppkey") % _ATT_N_ENT).cast("long").alias("user"),
        (F.col("l_partkey") % _ATT_N_ENT).cast("long").alias("pos_item"),
        ((F.col("l_partkey") + 13 * F.col("l_suppkey") + 7) % _ATT_N_ENT)
        .cast("long")
        .alias("neg_item"),
    ).distinct()
    return kgat_cf_loss(all_embed, batch, l2_lambda=_CF_LOSS_LAMBDA)


_TRANSR_LAMBDA = 1e-5


def _transr_scored(spark, sf_dir):
    """Deterministic (h, r, pos_t, neg_t) batch from lineitem -> per-row
    TransR scores (KGAT.py:132-156)."""
    from kgp.fixtures import attention_fixture
    from kgp.functions.losses import transr_scores

    ent, rel, w = attention_fixture(_ATT_N_ENT, _ATT_N_REL)
    li = _t(spark, sf_dir, "lineitem")
    batch = li.select(
        (F.col("l_suppkey") % _ATT_N_ENT).cast("long").alias("h"),
        (F.col("l_linenumber") % _ATT_N_REL).cast("int").alias("r"),
        (F.col("l_partkey") % _ATT_N_ENT).cast("long").alias("pos_t"),
        ((F.col("l_partkey") + 13 * F.col("l_suppkey") + 7) % _ATT_N_ENT)
        .cast("long")
        .alias("neg_t"),
    ).distinct()
    return transr_scores(spark, batch, ent, rel, w)


def _q_transr_scores(spark, sf_dir):
    """Per-triple TransR plausibility (KGAT-pytorch/model/KGAT.py:132-156,
    Equation 1): ||W_r e_h + e_r - W_r e_t||^2 for pos and neg tails over
    a deterministic lineitem-derived batch — one batched pandas UDF with
    the embedding tensors broadcast."""
    out = _transr_scored(spark, sf_dir)
    return out.select(
        "h",
        F.col("r").cast("long").alias("r"),
        "pos_t",
        "neg_t",
        F.round("pos_score", 6).alias("pos_score"),
        F.round("neg_score", 6).alias("neg_score"),
        F.round("l2_row", 6).alias("l2_row"),
    )


def _q_loss_kg_transr(spark, sf_dir):
    """The reference's calc_kg_loss (KGAT-pytorch/model/KGAT.py:152-161,
    Equation 2): mean(-logsigmoid(neg - pos)) + lambda * L2 over the
    TransR score table (stable softplus form, like loss_bpr)."""
    from kgp.functions.losses import transr_kg_loss

    return transr_kg_loss(_transr_scored(spark, sf_dir), l2_lambda=_TRANSR_LAMBDA)


# ---------------------------------------------------------------------------
# S8 Excel dict / J9 negative sampling / W5 early stopping / F8 losses
# ---------------------------------------------------------------------------

_NEG_ATTEMPTS, _NEG_SEED, _NEG_SPLIT_MOD = 12, 42, 5
_ES_EPOCHS, _ES_STEPS = 24, 3
_FOCAL_GAMMA, _DICE_SMOOTH = 2.0, 1e-4


def _q_read_excel_dict(spark, sf_dir):
    """S8: stdlib xlsx parse (binaryFile -> mapInPandas) of the ICD-dict
    workbook fixture; the oracle re-reads the CSV twin of the same rows,
    so the cross-FORMAT equality certifies the parser."""
    from kgp.io.xlsx import read_excel_dict

    return read_excel_dict(spark, _reader_paths()["icd_dict.xlsx"])


def _cf_interactions(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    od = _t(spark, sf_dir, "orders")
    return (
        od.join(li, od["o_orderkey"] == li["l_orderkey"])
        .select(
            F.col("o_custkey").cast("long").alias("user"),
            F.col("l_partkey").cast("long").alias("item"),
        )
        .distinct()
    )


def _q_cf_user_items(spark, sf_dir):
    """A3: per-user sorted distinct item set (loader_kgat.py:56-62
    ``train_user_dict``) over the CF adjacency fixture — grouped
    collect_set with a deterministic sort, emitted as a comma-joined
    string for hash-stable compare."""
    from kgp.io.readers import read_cf_adjacency

    cf = read_cf_adjacency(spark, _reader_paths()["cf_train.txt"])
    return cf.groupBy(F.col("user").cast("long").alias("user")).agg(
        F.array_join(
            F.transform(F.array_sort(F.collect_set("item")), lambda x: x.cast("string")),
            ",",
        ).alias("items")
    )


def _q_metric_triple_prf(spark, sf_dir):
    """The north-rule acceptance criterion as a driver-checked query:
    micro P/R/F1 of the DISTRIBUTED pipeline's emitted triples against
    the single-process oracle gold (the reference-twin). The oracle twin
    evaluates gold-vs-gold (identically 1.0), so the hash compare holds
    the live pipeline to exact parity — the P/R >= 0.95 contract with
    margin."""
    from kgp.metrics import micro_prf_df

    on = ["conv_id", "subj", "pred", "obj"]
    pred = _pipeline_outputs(spark, sf_dir)["triples"].select(*on).distinct()
    gold = _gold(spark, sf_dir, "gold_triples").select(*on).distinct()
    return micro_prf_df(pred, gold, on)


def _q_sessionize_streaming(spark, sf_dir):
    """§2.9 custom stateful streaming operator, driver-certified: gap
    sessionization via applyInPandasWithState (kgp/streaming/stateful.py)
    over the events table arriving as time-split micro-batches (one file
    per batch; cross-batch state handoff is exercised for every user). A
    barrier event per user closes final open sessions, so the converged
    per-user (n_events, n_sessions) must equal the BATCH lag-window
    answer — the oracle is the same sessionize SQL events_sessionize
    certifies against."""
    import glob
    import shutil
    import tempfile

    from kgp.streaming.stateful import BARRIER_EVENT_ID, sessionize_files_available_now

    ev = _t(spark, sf_dir, "events").select("user_id", "ts", "event_id")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    med = ev.select(us.alias("us")).approxQuantile("us", [0.5], 0.0)[0]
    mx = ev.agg(F.max(us)).first()[0]
    barrier = ev.select("user_id").distinct().select(
        "user_id",
        F.timestamp_micros(F.lit(mx + 10**9)).cast("timestamp_ntz").alias("ts"),
        F.lit(BARRIER_EVENT_ID).alias("event_id"),
    )
    work = tempfile.mkdtemp(prefix="kgp_sess_stream_")
    flat = os.path.join(work, "in")
    os.makedirs(flat)
    parts = [ev.where(us <= med), ev.where(us > med), barrier]
    for i, part in enumerate(parts):
        d = os.path.join(work, f"part{i}")
        part.coalesce(1).write.parquet(d)
        dst = os.path.join(flat, f"{i:02d}.parquet")
        shutil.copy(glob.glob(os.path.join(d, "*.parquet"))[0], dst)
        # FileStreamSource orders by modification time: make batch order
        # explicit (same-second writes tie and can reorder the barrier
        # before the last data file, leaving final sessions unflushed)
        os.utime(dst, (1000 * (i + 1), 1000 * (i + 1)))
    sessionize_files_available_now(
        spark, flat, os.path.join(work, "out"), os.path.join(work, "ckpt"),
        gap_minutes=30,
    )
    got = spark.read.parquet(os.path.join(work, "out"))
    return got.groupBy("user_id").agg(
        F.sum("n_events").cast("long").alias("n_events"),
        F.count("*").cast("long").alias("n_sessions"),
    )


def _q_dedup_within_group(spark, sf_dir):
    """A13: first row per group under a deterministic order (the
    reference's stateful seen-set, prepare_training_datasets.py:82-100)
    — each user's (event_type) groups keep the earliest event."""
    from kgp.ops.dedup import dedup_within_group

    ev = _t(spark, sf_dir, "events")
    out = dedup_within_group(ev, ["user_id", "event_type"], ["ts", "event_id"])
    return out.select(
        F.col("user_id").cast("long").alias("user_id"),
        "event_type",
        F.col("event_id").cast("long").alias("event_id"),
    )


_MARK_MAX_LEN = 14  # binds at sf0.01 (46 v2 rows drop) so P4 is exercised on-record


def _q_encode_markers(spark, sf_dir):
    """P8/P9/P4: entity-marker insertion v2/v3 around same-turn gold
    mention pairs (data_loader.py:203-266), rel_position_ids over the
    marked sequence (:273-277), and the marker-overflow filter (P4:
    sequences longer than max_len are dropped, as the reference drops
    sentences whose marker positions exceed max_seq_length). One
    Arrow-batched pandas pass; pair generation and the disjoint-span
    precondition are relational filters BEFORE the UDF."""
    import pandas as pd

    from kgp.functions.encoding import insert_entity_markers, rel_position_ids
    from kgp.functions.surrogate import tokenize_batch

    m = _gold(spark, sf_dir, "gold_mentions").select(
        "conv_id", "turn_idx", "start", "end", "mention_id"
    )
    t = load_transcripts(spark, sf_dir).select(
        "conv_id", F.col("turn_idx").cast("long").alias("turn_idx"), "text"
    )
    h = m.select(
        "conv_id", "turn_idx",
        F.col("start").alias("hs"), F.col("end").alias("he"),
        F.col("mention_id").alias("head_id"),
    )
    tl = m.select(
        "conv_id", "turn_idx",
        F.col("start").alias("ts"), F.col("end").alias("te"),
        F.col("mention_id").alias("tail_id"),
    )
    pairs = (
        h.join(tl, ["conv_id", "turn_idx"])
        .where(
            (F.col("head_id") < F.col("tail_id"))
            & ((F.col("he") <= F.col("ts")) | (F.col("te") <= F.col("hs")))
        )
        .join(t, ["conv_id", "turn_idx"])
    )
    cols = [
        "conv_id", "turn_idx", "head_id", "tail_id", "variant", "marked",
        "head_start", "head_end", "tail_start", "tail_end", "relpos",
    ]
    schema = (
        "conv_id string, turn_idx long, head_id long, tail_id long, "
        "variant string, marked string, head_start long, head_end long, "
        "tail_start long, tail_end long, relpos string"
    )

    def run(batches):
        for pdf in batches:
            toks_list = tokenize_batch(pdf["text"])
            rows = []
            it = pdf[
                ["conv_id", "turn_idx", "head_id", "tail_id", "hs", "he", "ts", "te"]
            ].itertuples(index=False, name=None)
            for (ci, ti, hid, tid, hs, he, ts, te), toks in zip(it, toks_list):
                for variant in ("v2", "v3"):
                    out, head, tail = insert_entity_markers(
                        toks, (hs, he), (ts, te), variant
                    )
                    if len(out) > _MARK_MAX_LEN:
                        continue  # P4 marker-overflow filter
                    rp = rel_position_ids(len(out), head, tail)
                    rows.append(
                        (ci, int(ti), int(hid), int(tid), variant, " ".join(out),
                         head[0], head[1], tail[0], tail[1],
                         ",".join(map(str, rp)))
                    )
            yield pd.DataFrame(rows, columns=cols)

    return pairs.mapInPandas(run, schema=schema)


_CF_EVAL_K, _CF_EVAL_SEED, _CF_EVAL_USER_MOD = 20, 7, 97


def _cf_eval_masked(spark, sf_dir):
    """Shared setup of the CF-eval queries: deterministic md5-derived
    train/test split + surrogate score table over eval users x full
    catalog, train interactions masked (J7 left_anti — the reference
    zeroes them, metrics.py:126-130). -> (masked scores, truth)."""
    from kgp.stages.graph import mask_train_interactions
    from kgp.stages.training import _h15

    pos = _cf_interactions(spark, sf_dir)
    users = pos.select("user").distinct().where(
        F.col("user") % _CF_EVAL_USER_MOD == 1
    )
    items = pos.select("item").distinct()
    split = pos.withColumn(
        "_s", F.pmod(_h15(F.lit("cfsplit"), F.col("user"), F.col("item")), 5)
    )
    train = split.where(F.col("_s") < 3).select("user", "item")
    test = split.where(F.col("_s") >= 3).select("user", "item")
    scores = (
        users.crossJoin(F.broadcast(items))
        .withColumn(
            "score",
            _h15(F.lit(_CF_EVAL_SEED), F.col("user"), F.col("item")).cast("double")
            / F.lit(float(2**60)),
        )
    )
    return mask_train_interactions(scores, train), test.join(users, "user")


def _cf_eval_out(ranked, truth):
    from kgp.metrics import ranking_metrics

    out = ranking_metrics(ranked, truth, k=_CF_EVAL_K)
    return out.select(
        "user",
        F.col("n_hit").cast("long").alias("n_hit"),
        F.col("n_true").cast("long").alias("n_true"),
        "precision_at_k",
        "recall_at_k",
        F.round("ndcg_at_k", 9).alias("ndcg_at_k"),
    )


def _q_kgat_cf_eval(spark, sf_dir):
    """Full-ranking CF evaluation (KGAT-pytorch/utility/metrics.py:121-146
    test procedure): for each eval user, score the FULL item catalog with
    a deterministic surrogate scorer, mask train interactions (J7), rank
    all remaining items per user (W3), and report per-user P/R/NDCG@k
    against the held-out test positives (A11). The train/test split and
    the score table are md5-derived so the DuckDB twin reproduces them
    exactly. Reference semantics is the dense cf_scores(n_users, n_items)
    matrix (KGAT.py:179-192); see _q_kgat_cf_eval_topk for the
    catalog-scale variant that never rank-materializes the full matrix."""
    from pyspark.sql.window import Window

    masked, truth = _cf_eval_masked(spark, sf_dir)
    w = Window.partitionBy("user").orderBy(F.desc("score"), F.asc("item"))
    ranked = masked.withColumn("rank", F.row_number().over(w))
    return _cf_eval_out(ranked, truth)


_CF_EVAL_SALTS = 8


def _q_kgat_cf_eval_topk(spark, sf_dir):
    """Scale-safe CF evaluation (VERDICT r4 item 7): identical metrics@k
    to _q_kgat_cf_eval without materializing the per-user full-catalog
    rank. Two-phase salted top-k: phase 1 keeps the top k of each
    (user, item-hash-salt) shard — every window partition is
    catalog/S-sized and uniform; phase 2 ranks only the surviving
    S*k rows per user. The (desc score, asc item) tie-break is total, so
    the top-k set and its ranks are identical to the full rank — the two
    queries are certified against the SAME DuckDB oracle. At 100 TB the
    full variant's per-user window holds the whole catalog in one task;
    this one bounds task state at k * catalog/S, with S sized to taste.
    Only items at rank <= k contribute to P/R/NDCG@k
    (KGAT-pytorch/utility/metrics.py:121-146 computes on the top-k
    slice), so discarding the tail below phase-1's per-shard rank k
    cannot change the output."""
    from pyspark.sql.window import Window

    masked, truth = _cf_eval_masked(spark, sf_dir)
    order = [F.desc("score"), F.asc("item")]
    w1 = Window.partitionBy("user", "_salt").orderBy(*order)
    survivors = (
        masked.withColumn("_salt", F.pmod(F.xxhash64("item"), F.lit(_CF_EVAL_SALTS)))
        .withColumn("_r", F.row_number().over(w1))
        .where(F.col("_r") <= _CF_EVAL_K)
        .drop("_salt", "_r")
    )
    w2 = Window.partitionBy("user").orderBy(*order)
    ranked = survivors.withColumn("rank", F.row_number().over(w2)).where(
        F.col("rank") <= _CF_EVAL_K
    )
    return _cf_eval_out(ranked, truth)


def _q_neg_sample(spark, sf_dir):
    """J9: bounded-rejection negative sampling (explode -> anti-join ->
    first surviving attempt) over the md5-derived TRAIN split of the
    orders x lineitem interactions, with the candidate modulus taken
    from the FULL item universe (``universe=`` — the reference's
    ``self.n_items``, loader_base.py:71-75): negatives can land on
    items unseen in the split, and rejection tests train positives
    only (loader_kgat.py:191-202)."""
    from kgp.stages.training import _h15, negative_sample_items

    pos = _cf_interactions(spark, sf_dir)
    train = pos.where(
        F.pmod(_h15(F.lit("negsplit"), F.col("user"), F.col("item")), _NEG_SPLIT_MOD)
        < _NEG_SPLIT_MOD - 1
    )
    out = negative_sample_items(
        train, attempts=_NEG_ATTEMPTS, seed=_NEG_SEED, universe=pos
    )
    return out.select(
        "user", "pos_item", "neg_item", F.col("attempt").cast("long").alias("attempt")
    )


def _q_early_stop(spark, sf_dir):
    """W5: running early-stopping decision over a deterministic
    orders-derived epoch/metric history (metric = per-bucket max: float
    order-independent on both engines)."""
    from kgp.stages.training import early_stopping_history

    od = _t(spark, sf_dir, "orders")
    hist = od.groupBy(
        (F.col("o_orderkey") % _ES_EPOCHS).cast("long").alias("epoch")
    ).agg(F.max("o_totalprice").alias("recall"))
    return early_stopping_history(hist, stopping_steps=_ES_STEPS)


def _q_loss_focal(spark, sf_dir):
    from kgp.functions.losses import focal_loss

    li = _t(spark, sf_dir, "lineitem")
    t = li.select(
        F.array(
            F.col("l_discount") * 10, F.col("l_tax") * 10, F.log(F.col("l_quantity") + 1)
        ).alias("logits"),
        (F.col("l_linenumber") % 3).cast("int").alias("label"),
    )
    return focal_loss(t, gamma=_FOCAL_GAMMA)


def _q_loss_dice(spark, sf_dir):
    from kgp.functions.losses import dice_loss

    li = _t(spark, sf_dir, "lineitem")
    t = li.select(
        F.col("l_discount").alias("p"),
        F.when(F.col("l_returnflag") == "R", 1.0).otherwise(0.0).alias("y"),
    )
    return dice_loss(t, smooth=_DICE_SMOOTH)


def _q_loss_bpr(spark, sf_dir):
    from kgp.functions.losses import bpr_loss

    li = _t(spark, sf_dir, "lineitem")
    t = li.select(
        (F.col("l_extendedprice") / 10000).alias("pos_score"),
        (F.col("l_tax") * 10).alias("neg_score"),
    )
    return bpr_loss(t)


def _q_loss_crf_nll(spark, sf_dir):
    """F8 CRF NLL: forward-algorithm logZ minus gold-path score per turn
    under the surrogate emission/transition model, one vectorized pandas
    pass. SQL twin: oracles.crf_nll_sql — a DuckDB RECURSIVE CTE over time
    steps with the alpha vector pivoted into 9 label columns (tests also
    certify the op against brute-force path enumeration)."""
    from kgp.functions.losses import crf_nll
    from kgp.functions.surrogate import tokenize

    t = load_transcripts(spark, sf_dir).select("conv_id", "turn_idx", "text")
    model = fixture_model_for(spark, sf_dir)
    # gold labels: all-O (the NLL of the null labeling — exercises the
    # identical forward pass; gold-span labelings are covered in tests)
    t = t.withColumn(
        "bio_labels",
        F.transform(F.split(F.trim("text"), r"\s+"), lambda _: F.lit("O")),
    )
    out = crf_nll(t, surfaces=model.surfaces)
    return out.select(
        "conv_id",
        F.col("turn_idx").cast("long").alias("turn_idx"),
        F.round("nll", 6).alias("nll"),
    )


# ---------------------------------------------------------------------------
# data-op queries (driver testdata views)
# ---------------------------------------------------------------------------


def _q_dedup_exact(spark, sf_dir):
    from kgp.ops.dedup import exact_dedup

    return exact_dedup(_t(spark, sf_dir, "documents"))


def _assert_no_drops(what):
    """The SQL oracle twins model NO hot-key cap, so certification is only
    valid while the caps never bind. A binding cap must fail LOUDLY here
    (turning a silent oracle divergence into an error the driver records),
    not silently drop candidates the oracle still counts."""

    def hook(n):
        if n:
            raise AssertionError(
                f"{what}: hot-key cap engaged ({n} keys dropped) but the "
                "SQL oracle models no cap — raise the cap or update the twin"
            )

    return hook


def _q_ngram_jaccard(spark, sf_dir):
    from kgp.ops.dedup import ngram_jaccard_pairs

    return ngram_jaccard_pairs(
        _t(spark, sf_dir, "documents"), n=3, threshold=0.5,
        on_drop=_assert_no_drops("dedup_ngram_jaccard max_shingle_df"),
    )


def _q_minhash_lsh(spark, sf_dir):
    from kgp.ops.dedup import minhash_lsh_pairs

    return minhash_lsh_pairs(
        _t(spark, sf_dir, "documents"), k=16, bands=4, n=3,
        on_drop=_assert_no_drops("dedup_minhash_lsh max_bucket_size"),
    )


def _q_simhash(spark, sf_dir):
    from kgp.ops.dedup import simhash60

    return simhash60(_t(spark, sf_dir, "documents"))


def _q_dedup_embedding(spark, sf_dir):
    from kgp.ops.dedup import embedding_cosine_dups

    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    # exact path opted in explicitly: this query IS the bounded-input
    # oracle baseline; the LSH default is certified by dedup_embedding_lsh
    return embedding_cosine_dups(emb, threshold=0.4, lsh_planes=0)


def _q_ann_topk(spark, sf_dir):
    from kgp.ops.similarity import cosine_topk_bruteforce

    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    q = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    out = cosine_topk_bruteforce(emb, q, k=10)
    return out.select("q_id", "vec_id", "cos", F.col("rank").cast("long").alias("rank"))


def _q_dedup_embedding_lsh(spark, sf_dir):
    """Scale path of embedding dedup (hyperplane-LSH blocking) certified
    against a full SQL twin that computes the SAME buckets."""
    from kgp.ops.dedup import embedding_cosine_dups

    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    return embedding_cosine_dups(
        emb, threshold=0.4, lsh_planes=6, lsh_tables=4, dim=64, seed=42
    )


def _q_ann_lsh(spark, sf_dir):
    from kgp.ops.similarity import cosine_topk_lsh

    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    q = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    out = cosine_topk_lsh(emb, q, k=10, n_planes=6, n_tables=4, dim=64, seed=42)
    return out.select("q_id", "vec_id", "cos", F.col("rank").cast("long").alias("rank"))


def _q_ann_ivf(spark, sf_dir):
    from kgp.ops.similarity import ivf_topk

    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    q = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    out = ivf_topk(emb, q, k=10, n_centroids=16, nprobe=4, lloyd_rounds=1)
    return out.select("q_id", "vec_id", "cos", F.col("rank").cast("long").alias("rank"))


def _q_lang_id(spark, sf_dir):
    from kgp.ops.textstats import lang_id

    out = lang_id(_t(spark, sf_dir, "documents"))
    casts = [F.col(c).cast("long").alias(c) if c.startswith("hits_") else F.col(c) for c in out.columns]
    return out.select(*casts)


def _q_quality(spark, sf_dir):
    from kgp.ops.textstats import quality_score

    return quality_score(_t(spark, sf_dir, "documents"))


def _q_token_counts(spark, sf_dir):
    from kgp.ops.textstats import token_counts

    return token_counts(_t(spark, sf_dir, "documents"))


def _q_fingerprint(spark, sf_dir):
    from kgp.ops.textstats import fingerprint

    return fingerprint(_t(spark, sf_dir, "documents"), n=3)


def _q_sessionize(spark, sf_dir):
    from pyspark.sql.window import Window

    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts").cast("timestamp"))  # ts is TIMESTAMP_NTZ in parquet
    marked = ev.withColumn(
        "new_s",
        F.when(us - F.lag(us).over(w) > 30 * 60 * 1_000_000, 1)
        .when(F.lag("ts").over(w).isNull(), 1)
        .otherwise(0),
    )
    return marked.groupBy(F.col("user_id").cast("long").alias("user_id")).agg(
        F.count("*").alias("n_events"), F.sum("new_s").cast("long").alias("n_sessions")
    )


def _q_edge_softmax(spark, sf_dir):
    from kgp.stages.graph import edge_softmax

    li = _t(spark, sf_dir, "lineitem")
    e = li.select(
        F.col("l_suppkey").cast("long").alias("h"), F.col("l_partkey").cast("long").alias("t"),
        F.col("l_discount").alias("score"),
    ).distinct()
    out = edge_softmax(e)
    return out.select("h", "t", F.round("att", 12).alias("att"))


def _q_tpch_q1(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("date"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("sum_disc_price"),
            F.count("*").alias("count_order"),
        )
    )


def _q_top_revenue(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    return (
        c.where(F.col("c_mktsegment") == "BUILDING")
        .join(o, c["c_custkey"] == o["o_custkey"])
        .join(li, li["l_orderkey"] == o["o_orderkey"])
        .groupBy(F.col("o_orderkey").cast("long").alias("o_orderkey"))
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 6).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(20)
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Dict ORDER is the coverage-rotation policy (README "Correctness
    rotation"): the driver's per-round record caps at 50 entries taken in
    iteration order, so entries are ranked by certification staleness —
    (1) never/least-recently driver-certified, (2) code changed this
    round, (3) stable-and-recently-green — and the tail holds queries
    whose code is unchanged since their last green driver row."""
    return {
        # --- (1) never / least-recently certified (r5: last green r1-r3)
        "events_sessionize_streaming": _q_sessionize_streaming,
        "dedup_minhash_lsh": _q_minhash_lsh,
        "dedup_simhash": _q_simhash,
        "dedup_embedding_cosine": _q_dedup_embedding,
        "dedup_embedding_lsh": _q_dedup_embedding_lsh,
        "ann_cosine_topk": _q_ann_topk,
        "ann_cosine_lsh": _q_ann_lsh,
        "ann_ivf": _q_ann_ivf,
        "text_lang_id": _q_lang_id,
        "text_quality": _q_quality,
        "text_token_counts": _q_token_counts,
        "text_fingerprint": _q_fingerprint,
        "events_sessionize": _q_sessionize,
        "graph_edge_softmax": _q_edge_softmax,
        "tpch_q1": _q_tpch_q1,
        "top_revenue": _q_top_revenue,
        # --- (2) code changed this round (stable softmax, universe
        # negative sampling, top-k eval, reuse-hook pins, xlsx rels)
        "kgat_neg_sample": _q_neg_sample,
        "kgat_cf_eval": _q_kgat_cf_eval,
        "kgat_cf_eval_topk": _q_kgat_cf_eval_topk,
        "kgat_attention": _q_kgat_attention,
        "kgat_aggregate": _q_kgat_aggregate,
        "kgat_aggregate_gcn": _q_kgat_aggregate_gcn,
        "kgat_aggregate_graphsage": _q_kgat_aggregate_graphsage,
        "kgat_cf_embedding": _q_kgat_cf_embedding,
        "kgat_cf_score": _q_kgat_cf_score,
        "kgat_cf_loss": _q_kgat_cf_loss,
        "kg_edges": _q_edges,
        "kg_kgat_edges": _q_kgat_edges,
        "kg_triples": _q_triples,
        "kg_triples_streaming": _q_triples_streaming,
        "read_excel_dict": _q_read_excel_dict,
        # --- (3) stable, green in r4
        "kg_doc_assembly": _q_doc_assembly,
        "kg_mentions": _q_mentions,
        "kg_mentions_biaffine": _q_mentions_biaffine,
        "kg_mentions_subtok": _q_mentions_subtok,
        "metric_span_prf": _q_metric_span_prf,
        "metric_ann_recall": _q_metric_ann_recall,
        "metric_el_micro_prf": _q_metric_el_micro_prf,
        "kg_relations": _q_relations,
        "kg_clusters": _q_clusters,
        "kg_links": _q_links,
        "el_threshold_sweep": _q_el_sweep,
        "kg_re_pairs": _q_re_pairs,
        "kg_coref_pairs": _q_coref_pairs,
        "kgat_transr_scores": _q_transr_scores,
        "loss_kg_transr": _q_loss_kg_transr,
        "dedup_exact": _q_dedup_exact,
        "dedup_ngram_jaccard": _q_ngram_jaccard,
        "dedup_within_group": _q_dedup_within_group,
        "cf_user_items": _q_cf_user_items,
        # --- tail: unchanged since their r4 green rows (rotated out if
        # the driver record caps at 50)
        "metric_frame_acc": _q_metric_frame_acc,
        "metric_re_prior_acc": _q_metric_re_prior_acc,
        "metric_triple_prf": _q_metric_triple_prf,
        "encode_markers": _q_encode_markers,
        "train_early_stop": _q_early_stop,
        "loss_focal": _q_loss_focal,
        "loss_dice": _q_loss_dice,
        "loss_bpr": _q_loss_bpr,
        "loss_crf_nll": _q_loss_crf_nll,
        "read_semeval": _q_read_semeval,
        "read_mrc": _q_read_mrc,
        "read_ccks": _q_read_ccks,
        "read_el_tsv": _q_read_el_tsv,
        "read_cdn": _q_read_cdn,
        "read_kg_triples": _q_read_kg_triples,
        "read_cf_adjacency": _q_read_cf_adjacency,
        "read_id_remap": _q_read_id_remap,
    }


def _el_thetas():
    from kgp.stages.linking import EL_SWEEP_THETAS

    return EL_SWEEP_THETAS


def _crf_nll_oracle(transcripts_path: str) -> str:
    # same surfaces fixture_model_for builds, without needing a SparkSession
    from kgp.fixtures import fixture_config_for_sf, make_gazetteer, sf_from_dir, tagger_surfaces

    sf = sf_from_dir(SF01)
    gaz = make_gazetteer(fixture_config_for_sf(sf, skew=sf >= 0.05))
    return oracles.crf_nll_sql(transcripts_path, tagger_surfaces(gaz))


def _kgat_attention_oracle() -> str:
    from kgp.fixtures import attention_fixture

    ent, rel, w = attention_fixture(_ATT_N_ENT, _ATT_N_REL)
    return oracles.kgat_attention_sql(ent, rel, w, _ATT_N_ENT, _ATT_N_REL)


def _kgat_aggregate_oracle(aggregator: str = "bi-interaction") -> str:
    from kgp.fixtures import aggregate_fixture, attention_fixture

    ent, rel, w = attention_fixture(_ATT_N_ENT, _ATT_N_REL)
    w1, w2 = aggregate_fixture(d=len(ent[0]))
    if aggregator == "gcn":
        w2 = [[0.0] * len(w1[0]) for _ in w1]  # the Spark query passes None
    return oracles.kgat_aggregate_sql(
        ent, rel, w, w1, w2, _ATT_N_ENT, _ATT_N_REL, aggregator=aggregator
    )


def _kgat_cf_loss_oracle() -> str:
    from kgp.fixtures import cf_layer_fixture

    return oracles.kgat_cf_loss_sql(
        *_transr_fixture(),
        cf_layer_fixture(_CF_EMB_DIMS),
        _ATT_N_ENT,
        _ATT_N_REL,
        _CF_LOSS_LAMBDA,
    )


def _kgat_cf_embedding_oracle() -> str:
    from kgp.fixtures import attention_fixture, cf_layer_fixture

    ent, rel, w = attention_fixture(_ATT_N_ENT, _ATT_N_REL)
    return oracles.kgat_cf_embedding_sql(
        ent, rel, w, cf_layer_fixture(_CF_EMB_DIMS), _ATT_N_ENT, _ATT_N_REL
    )


def _transr_fixture():
    from kgp.fixtures import attention_fixture

    return attention_fixture(_ATT_N_ENT, _ATT_N_REL)


def _kgat_cf_score_oracle() -> str:
    from kgp.fixtures import cf_layer_fixture

    return oracles.kgat_cf_score_sql(
        *_transr_fixture(),
        cf_layer_fixture(_CF_EMB_DIMS),
        _ATT_N_ENT,
        _ATT_N_REL,
        _CF_SCORE_USER_MOD,
    )


def oracle_sql() -> dict[str, str]:
    fdir = ensure_fixtures(SF01)
    rp = _reader_paths()

    def g(name):
        return os.path.join(fdir, f"{name}.parquet")

    return {
        "kg_doc_assembly": oracles.doc_assembly_sql(
            os.path.join(fdir, "transcripts.parquet"), CFG.max_turns_per_doc
        ),
        "kg_mentions": oracles.gold_sql(g("gold_mentions")),
        "kg_mentions_biaffine": oracles.gold_sql(g("gold_mentions_biaffine")),
        "kg_mentions_subtok": oracles.gold_sql(g("gold_mentions")),
        "metric_span_prf": oracles.metric_span_prf_sql(
            g("gold_mentions_biaffine"), g("gold_mentions")
        ),
        "metric_ann_recall": oracles.metric_ann_recall_sql(5, 10, 6, 4, 64, 42),
        "metric_el_micro_prf": oracles.metric_micro_prf_sql(
            g("gold_candidates"), g("gold_links")
        ),
        "metric_frame_acc": oracles.metric_frame_acc_sql(
            g("gold_mentions_biaffine"), g("gold_mentions")
        ),
        "metric_re_prior_acc": oracles.metric_re_prior_acc_sql(
            g("gold_relations"), g("gold_mentions")
        ),
        "kg_relations": oracles.gold_sql(g("gold_relations")),
        "kg_clusters": oracles.gold_sql(g("gold_clusters")),
        "kg_links": oracles.gold_sql(g("gold_links")),
        "el_threshold_sweep": oracles.el_threshold_sweep_sql(
            g("gold_candidates"), g("gold_links"), _el_thetas()
        ),
        "kg_triples": oracles.gold_sql(g("gold_triples")),
        "kg_triples_streaming": oracles.gold_sql(g("gold_triples")),
        "kg_edges": oracles.gold_sql(g("gold_edges")),
        "kg_re_pairs": oracles.re_pairs_sql(g("gold_mentions")),
        "kg_coref_pairs": oracles.coref_pairs_sql(g("gold_mentions"), CFG.coref_turn_window),
        "kg_kgat_edges": oracles.kgat_edges_sql(),
        "kgat_attention": _kgat_attention_oracle(),
        "kgat_aggregate": _kgat_aggregate_oracle(),
        "kgat_aggregate_gcn": _kgat_aggregate_oracle("gcn"),
        "kgat_aggregate_graphsage": _kgat_aggregate_oracle("graphsage"),
        "kgat_cf_embedding": _kgat_cf_embedding_oracle(),
        "kgat_cf_score": _kgat_cf_score_oracle(),
        "kgat_cf_loss": _kgat_cf_loss_oracle(),
        "kgat_transr_scores": oracles.transr_scores_sql(
            *_transr_fixture(), _ATT_N_ENT, _ATT_N_REL
        ),
        "loss_kg_transr": oracles.transr_kg_loss_sql(
            *_transr_fixture(), _ATT_N_ENT, _ATT_N_REL, _TRANSR_LAMBDA
        ),
        "read_semeval": oracles.read_semeval_sql(rp["semeval.jsonl"]),
        "read_mrc": oracles.read_mrc_sql(rp["mrc_ner.json"]),
        "read_ccks": oracles.read_ccks_sql(rp["ccks_ner.json"]),
        "read_el_tsv": oracles.read_el_tsv_sql(rp["el_pairs.tsv"]),
        "read_cdn": oracles.read_cdn_sql(rp["cdn.json"]),
        "read_kg_triples": oracles.read_kg_triples_sql(rp["kg_final.txt"]),
        "read_cf_adjacency": oracles.read_cf_adjacency_sql(rp["cf_train.txt"]),
        "cf_user_items": oracles.cf_user_items_sql(rp["cf_train.txt"]),
        "metric_triple_prf": oracles.metric_triple_prf_sql(g("gold_triples")),
        "read_id_remap": oracles.read_id_remap_sql(rp["entity_remap.txt"]),
        "read_excel_dict": oracles.read_excel_dict_sql(rp["icd_dict.xlsx"] + ".csv"),
        "kgat_neg_sample": oracles.neg_sample_items_sql(
            _NEG_ATTEMPTS, _NEG_SEED, split_mod=_NEG_SPLIT_MOD
        ),
        "kgat_cf_eval": oracles.kgat_cf_eval_sql(
            _CF_EVAL_K, _CF_EVAL_SEED, _CF_EVAL_USER_MOD
        ),
        # the top-k variant is DEFINED as metric-identical to the full
        # rank (total tie-break order) — same oracle certifies both
        "kgat_cf_eval_topk": oracles.kgat_cf_eval_sql(
            _CF_EVAL_K, _CF_EVAL_SEED, _CF_EVAL_USER_MOD
        ),
        "train_early_stop": oracles.early_stopping_sql(_ES_EPOCHS, _ES_STEPS),
        "loss_focal": oracles.focal_loss_sql(_FOCAL_GAMMA),
        "loss_dice": oracles.dice_loss_sql(_DICE_SMOOTH),
        "loss_bpr": oracles.bpr_loss_sql(),
        "loss_crf_nll": _crf_nll_oracle(os.path.join(fdir, "transcripts.parquet")),
        "encode_markers": oracles.encode_markers_sql(
            os.path.join(fdir, "transcripts.parquet"), g("gold_mentions"), _MARK_MAX_LEN
        ),
        "dedup_exact": oracles.dedup_exact_sql(),
        "dedup_within_group": oracles.dedup_within_group_sql(),
        "dedup_ngram_jaccard": oracles.ngram_jaccard_sql(3, 0.5),
        "dedup_minhash_lsh": oracles.minhash_lsh_sql(16, 4, 3),
        "dedup_simhash": oracles.simhash_sql(),
        "dedup_embedding_cosine": oracles.embedding_dups_sql(0.4),
        "dedup_embedding_lsh": oracles.embedding_lsh_sql(0.4, 6, 4, 64, 42),
        "ann_cosine_topk": oracles.ann_topk_sql(5, 10),
        "ann_cosine_lsh": oracles.ann_lsh_sql(5, 10, 6, 4, 64, 42),
        "ann_ivf": oracles.ann_ivf_sql(5, 10, 16, 4, 64),
        "text_lang_id": oracles.lang_id_sql(),
        "text_quality": oracles.quality_sql(),
        "text_token_counts": oracles.token_counts_sql(),
        "text_fingerprint": oracles.fingerprint_sql(3),
        "events_sessionize": oracles.sessionize_sql(30),
        "events_sessionize_streaming": oracles.sessionize_sql(30),
        "graph_edge_softmax": oracles.edge_softmax_sql(),
        "tpch_q1": oracles.tpch_q1_sql(),
        "top_revenue": oracles.top_revenue_sql(20),
    }
