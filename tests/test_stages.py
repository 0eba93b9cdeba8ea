"""Stage-level tests: batch Viterbi parity, clustering implementations
agree, lineage resume, skew handling (SURVEY.md §5.2-3/4)."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from kgp.functions.surrogate import LABELS, batch_viterbi, viterbi


@given(st.integers(0, 10**9))
@settings(max_examples=25, deadline=None)
def test_batch_viterbi_matches_single(seed):
    rng = np.random.default_rng(seed)
    ems = [rng.normal(size=(int(rng.integers(0, 9)), len(LABELS))) for _ in range(6)]
    assert batch_viterbi(ems) == [viterbi(e) for e in ems]


def test_batch_viterbi_empty():
    assert batch_viterbi([]) == []
    assert batch_viterbi([np.zeros((0, len(LABELS)))]) == [[]]


@pytest.fixture(scope="module")
def mention_graph(spark):
    """Synthetic mention/edge tables with known components."""
    mentions = spark.createDataFrame(
        [("c1", i) for i in range(1, 8)] + [("c2", 10), ("c2", 11)],
        "conv_id string, mention_id long",
    )
    edges = spark.createDataFrame(
        [("c1", 1, 2), ("c1", 2, 3), ("c1", 5, 6), ("c2", 10, 11)],
        "conv_id string, src long, dst long",
    )
    return mentions, edges


def test_unionfind_vs_hashmin(mention_graph):
    from kgp.stages.coref import cluster_hashmin, cluster_unionfind

    mentions, edges = mention_graph
    a = {(r["mention_id"], r["cluster_id"]) for r in cluster_unionfind(mentions, edges).collect()}
    b = {(r["mention_id"], r["cluster_id"]) for r in cluster_hashmin(mentions, edges).collect()}
    want = {(1, 1), (2, 1), (3, 1), (4, 4), (5, 5), (6, 5), (7, 7), (10, 10), (11, 10)}
    assert a == want
    assert b == want


def test_lineage_resume(spark, tmp_path):
    from pyspark.sql import functions as F

    from kgp.lineage import LineageLog

    log = LineageLog(str(tmp_path), n_buckets=4)
    calls = {"n": 0}

    def build():
        calls["n"] += 1
        return spark.range(100).select(
            F.concat(F.lit("conv-"), F.col("id").cast("string")).alias("conv_id"),
            F.col("id").alias("v"),
        )

    df1 = log.run_stage(spark, "stage_a", "fp1", build)
    assert calls["n"] == 1 and df1.count() == 100
    # same fingerprint -> skipped (resume path)
    df2 = log.run_stage(spark, "stage_a", "fp1", build)
    assert calls["n"] == 1 and df2.count() == 100
    # changed input -> rebuild
    log.run_stage(spark, "stage_a", "fp2", build)
    assert calls["n"] == 2
    # per-partition metrics recorded
    m = log.read_manifest("stage_a")
    assert m["rows_out"] == 100 and len(m["partitions"]) > 1
    assert log.skew_report("stage_a")["max"] >= 1


def test_assembly_skew_and_segmentation(spark):
    """One giant conversation among small ones: salted assembly produces
    segmented docs whose re-exploded turns equal the input exactly."""
    from kgp.config import PipelineConfig
    from kgp.stages.assemble import assemble_documents, explode_documents

    cfg = PipelineConfig(max_turns_per_doc=128, assembly_salt_buckets=8)
    rows = [("big", i, "user", f"turn {i}", None) for i in range(1000)]
    rows += [(f"small-{j}", i, "user", f"s{j}-{i}", None) for j in range(50) for i in range(3)]
    t = spark.createDataFrame(rows, "conv_id string, turn_idx int, role string, text string, tool string")
    docs = assemble_documents(t, cfg)
    seg_counts = {r["conv_id"]: r["n"] for r in docs.groupBy("conv_id").count().withColumnRenamed("count", "n").collect()}
    assert seg_counts["big"] == 1000 // 128 + 1  # segmented
    assert seg_counts["small-0"] == 1
    back = {(r["conv_id"], r["turn_idx"]): r["text"] for r in explode_documents(docs).collect()}
    assert len(back) == len(rows)
    for conv_id, turn_idx, _, text, _ in rows:
        assert back[(conv_id, turn_idx)] == text
    # turn order inside each doc is sorted
    for d in docs.where(docs.conv_id == "big").collect():
        idxs = [t["turn_idx"] for t in d["turns"]]
        assert idxs == sorted(idxs)


def test_coref_pairs_banding(spark):
    """Banded range-join produces exactly the gap<=W pair set."""
    from kgp.config import PipelineConfig
    from kgp.stages.pairs import coref_pairs

    cfg = PipelineConfig(coref_turn_window=3)
    rows = [("c", t, t, t + 1, f"m{t}", "PER", t * 100) for t in range(12)]
    m = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, start int, end int, mention string, label string, mention_id long"
    )
    got = {(r["a_turn_idx"], r["b_turn_idx"]) for r in coref_pairs(m, cfg).collect()}
    want = {(a, b) for a in range(12) for b in range(12) if 0 < b - a <= 3}
    assert got == want


def test_idf_recall_ranking_on_skewed_dictionary(spark):
    """J1's IDF-weighted recall (BM25 stand-in): on a dictionary skewed
    with 1100 boilerplate '... ventures group' aliases, plain unweighted
    gram Jaccard ranks a boilerplate alias above the true entity for a
    surface sharing its RARE head grams; the IDF weighting flips that
    ranking (verified both by the pure-python formula and by the engine's
    surviving top-1 candidate)."""
    from collections import defaultdict

    from pyspark.sql import functions as F

    from kgp.config import PipelineConfig
    from kgp.functions.surrogate import char_ngrams
    from kgp.stages.linking import link_clusters

    target = "kalzuqir holdings"
    surface = "kalzuqir ventures group"
    distractors = [f"q{i} ventures group" for i in range(1100)]
    aliases = [(target, "E-target")] + [(d, f"E-{i}") for i, d in enumerate(distractors)]

    # the unweighted ranking really is wrong on this dictionary
    sg = char_ngrams(surface)
    def unweighted(a):
        ag = char_ngrams(a)
        ov = len(sg & ag)
        return ov / (len(sg) + len(ag) - ov) if ov else 0.0
    assert unweighted(distractors[0]) > unweighted(target)

    alias_dict = spark.createDataFrame(
        [(a, a, "c", eid) for a, eid in aliases],
        "entity_name string, alias string, code string, entity_id string",
    )
    surfaces = spark.createDataFrame([(1, surface)], "cluster_id long, surface string")
    cfg = PipelineConfig(recall_top_k=1, link_threshold=0.2)
    links, _ = link_clusters(surfaces, alias_dict, cfg)
    got = links.collect()
    assert len(got) == 1 and got[0]["entity_id"] == "E-target"


def test_unionfind_auto_buckets_and_hard_cap(spark, mention_graph):
    """n_buckets derives from input size (per-task frame bounded at any
    scale); a single conversation blowing past 4x the bound fails LOUDLY,
    naming cluster_hashmin, instead of an opaque executor OOM."""
    from kgp.config import PipelineConfig
    from kgp.stages.coref import _auto_buckets, cluster_unionfind

    cfg = PipelineConfig()
    assert _auto_buckets(1, cfg) == cfg.cc_buckets
    assert _auto_buckets(cfg.uf_max_bucket_rows * 1000, cfg) == 1000
    # 100x input -> 100x buckets, per-task frame unchanged
    assert _auto_buckets(cfg.uf_max_bucket_rows * 100_000, cfg) == 100 * _auto_buckets(
        cfg.uf_max_bucket_rows * 1000, cfg
    )

    mentions, edges = mention_graph
    # force the derived path to actually bind: 9 mentions, 2 rows/bucket
    # -> 256 buckets floor wins, but with a tiny floor the derivation wins
    small = PipelineConfig(cc_buckets=2, uf_max_bucket_rows=3)
    got = {
        (r["mention_id"], r["cluster_id"])
        for r in cluster_unionfind(mentions, edges, small).collect()
    }
    want = {(1, 1), (2, 1), (3, 1), (4, 4), (5, 5), (6, 5), (7, 7), (10, 10), (11, 10)}
    assert got == want

    # a conversation whose mentions alone exceed 4x the bound: loud failure
    tiny = PipelineConfig(cc_buckets=2, uf_max_bucket_rows=1)
    with pytest.raises(Exception, match="cluster_hashmin"):
        cluster_unionfind(mentions, edges, tiny).collect()


def test_stop_gram_cap_in_recall_join(spark):
    """J1 stop-gram cap: grams at the IDF floor (w == 1, df >= 2^15
    aliases) are cut from candidate generation. On a dictionary where
    33k aliases share a boilerplate suffix, the cap (a) fires on_drop
    with the floor-gram count, (b) kills candidates whose ONLY overlap is
    boilerplate, (c) leaves the informative-gram ranking untouched."""
    from pyspark.sql import functions as F

    from kgp.config import PipelineConfig
    from kgp.stages.linking import link_clusters

    n_boiler = 33000  # > 2^15 distinct aliases containing the suffix grams
    aliases = [(f"q{i:05d} zzz", f"E-{i}") for i in range(n_boiler)]
    aliases.append(("kalzuqir holdings", "E-target"))
    alias_dict = spark.createDataFrame(
        [(a, a, "c", eid) for a, eid in aliases],
        "entity_name string, alias string, code string, entity_id string",
    )
    surfaces = spark.createDataFrame(
        [(1, "kalzuqir holding co"), (2, "wwww zzz")],
        "cluster_id long, surface string",
    )
    dropped = []
    cfg = PipelineConfig(recall_top_k=3, link_threshold=0.0)
    links, candidates = link_clusters(surfaces, alias_dict, cfg, on_drop=dropped.append)
    cand = candidates.collect()
    assert dropped and dropped[0] > 0
    # surface 2 shares ONLY the boilerplate ' zzz' grams -> never generated
    assert not [r for r in cand if r["surface"] == "wwww zzz"]
    # surface 1 shares rare grams -> still ranked to the true entity
    got = {r["cluster_id"]: r["entity_id"] for r in links.collect()}
    assert got == {1: "E-target"}  # cluster 2's only overlap was capped away
