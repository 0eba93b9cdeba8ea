"""End-to-end composition: transcripts -> ... -> triples + graph.

Each stage is a pure ``DataFrame -> DataFrame`` function (SURVEY.md §7
design stance); this module wires them. ``mentions`` is consumed by three
downstream branches (RE pairs, coref pairs, cluster surfaces), so it is
persisted once rather than recomputed per branch.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kgp.config import DEFAULT_CONFIG, PipelineConfig
from kgp.stages.assemble import assemble_documents
from kgp.stages.coref import (
    cluster_unionfind,
    positive_edges,
    score_coref_pairs,
)
from kgp.stages.graph import materialize_graph
from kgp.stages.linking import build_alias_artifacts, cluster_surfaces, link_clusters
from kgp.stages.mentions import mentions_from_tagged, pair_turn_tokens, tag_turns
from kgp.stages.pairs import coref_pairs, re_pairs
from kgp.stages.relations import classify_relations
from kgp.stages.triples import assemble_triples


def _default_reuse(spark: SparkSession, transcripts: DataFrame, cfg: PipelineConfig):
    """Profile-selected reuse hook for one pipeline run (kgp.reuse).

    Local profile (default): eager localCheckpoint per boundary.
    Cluster profile (KGP_REUSE=table): LineageLog stage tables keyed by
    the input+config fingerprint — executor-loss safe, resumable, zero
    block-manager residency (the sf16 16 GB-driver-heap finding in
    SCALING.md is exactly the local profile's block pins). The
    fingerprint scan only runs under the table profile."""
    import os

    from kgp.reuse import default_reuse, input_fingerprint

    if os.environ.get("KGP_REUSE") == "table":
        return default_reuse(spark, fingerprint=input_fingerprint(transcripts, cfg))
    # local profile: storage level adapts to input scale (serialized
    # pins above ~32 MB of input parquet — see kgp.reuse.local_reuse_for)
    return default_reuse(spark, input_df=transcripts)


def _run_concurrently(spark: SparkSession, *thunks) -> list:
    """Run several independent build-and-materialize thunks, each from its
    own driver thread so their Spark jobs interleave under the FAIR
    scheduler. Threads (not async handles) because actions block;
    exceptions propagate through the pool."""
    import concurrent.futures

    if len(thunks) == 1:
        return [thunks[0]()]

    def run(i_thunk):
        i, thunk = i_thunk
        sc = spark.sparkContext
        # distinct on-demand pools: with scheduler.mode=FAIR the cross-pool
        # policy is fair sharing, so neither branch's tasks queue behind
        # the other's (within one pool the default policy is still FIFO).
        # Python threads are pinned to JVM threads (PYSPARK_PIN_THREAD
        # default on), so the local property scopes to this thread's jobs.
        sc.setLocalProperty("spark.scheduler.pool", f"kgp-branch-{i}")
        try:
            return thunk()
        finally:
            sc.setLocalProperty("spark.scheduler.pool", None)

    with concurrent.futures.ThreadPoolExecutor(max_workers=len(thunks)) as pool:
        return list(pool.map(run, enumerate(thunks)))


@dataclass
class PipelineModel:
    """The broadcastable 'model' of the surrogate pipeline: gazetteer
    surfaces for the tagger, alias groups for the coref scorer, and the
    alias dictionary DataFrame for linking."""

    surfaces: list  # [(surface, entity_type)]
    surface_groups: dict  # surface -> alias-group id
    alias_dict: DataFrame


def run_pipeline(
    spark: SparkSession,
    transcripts: DataFrame,
    model: PipelineModel,
    cfg: PipelineConfig = DEFAULT_CONFIG,
    reuse=None,
) -> dict:
    # Stage boundaries are materialized AND lineage-truncated through the
    # `reuse` hook (kgp.reuse): localCheckpoint in the single-JVM profile,
    # LineageLog stage tables (the Iceberg overwritePartitions analogue)
    # under KGP_REUSE=table — which truncates the plan the same way, adds
    # fault tolerance + mid-run resume, and keeps the driver heap flat.
    # Either way the materialization keeps the logical plan of every
    # downstream query small — with plain persist() the full pipeline tree
    # is re-analyzed on every action and Catalyst planning dominates.
    # Only multi-consumer outputs are checkpointed (tagged feeds 3
    # branches, clusters 2, triples is scanned 3x by materialize_graph),
    # and EAGERLY: consumers sit in one downstream query (some under
    # broadcast-exchange threads), and only an already-materialized
    # checkpoint guarantees the producer runs exactly once.
    if reuse is None:
        reuse = _default_reuse(spark, transcripts, cfg)
    documents = assemble_documents(transcripts, cfg)
    # tagger input is raw turns (narrow map, no shuffle): mentions are
    # keyed (conv_id, turn_idx), so document assembly is a sibling
    # deliverable, not an upstream dependency of mention detection.
    # ONE fused pass emits mentions AND the multi-mention-turn token table
    # (tag_turns) — the corpus is tokenized exactly once, and the relation
    # join's token side is pair-turn-sized, not corpus-sized.
    # EAGER checkpoint: tagged feeds several consumer subtrees INSIDE one
    # downstream query (including broadcast-exchange threads); a lazy
    # checkpoint lets those subtrees race and re-run the whole tagger pass
    # per consumer (observed in the event log as a second full
    # Scan>MapInPandas under a BroadcastExchange), so the one serial job
    # here buys single-execution of the most expensive stage.
    tagged = reuse(tag_turns(spark, transcripts, model.surfaces, cfg), "tagged")
    mentions = mentions_from_tagged(tagged)
    turn_tokens = pair_turn_tokens(tagged)

    # The relation branch (pair join + classifier) and the coref branch
    # (mention count for bucket sizing + pair scoring + union-find) are
    # INDEPENDENT given `tagged`: each is built AND materialized inside
    # its own driver thread (FAIR scheduler, kgp/session.py) so their jobs
    # interleave. Neither branch saturates the executor at every instant
    # (shuffle barriers, AQE replanning, Arrow batch tails); overlapping
    # them fills those gaps — a pure win at N>1 cores, a no-op at 1 core.
    # Both subtrees read only the already-materialized `tagged`, so no
    # producer can be re-run.
    def _relations_branch():
        return reuse(classify_relations(re_pairs(mentions, cfg), turn_tokens, cfg), "relations")

    def _coref_branch():
        scored = score_coref_pairs(spark, coref_pairs(mentions, cfg), model.surface_groups, cfg)
        return reuse(cluster_unionfind(mentions, positive_edges(scored, cfg), cfg), "clusters")

    def _alias_branch():
        # linking's dictionary side depends on the alias dim ALONE: build
        # and pin it here, inside the branch window, so the gram-explode /
        # IDF / posting jobs run in scheduler gaps the other branches leave
        # instead of serially on the post-clustering critical path — and
        # the big linking query analyzes against three tiny checkpointed
        # leaves instead of the whole dictionary subtree.
        return build_alias_artifacts(model.alias_dict, cfg, materialize=True)

    relations, clusters, alias_art = _run_concurrently(
        spark, _relations_branch, _coref_branch, _alias_branch
    )

    links, candidates = link_clusters(
        cluster_surfaces(clusters, mentions), model.alias_dict, cfg, artifacts=alias_art
    )
    triples = reuse(assemble_triples(relations, clusters, links), "triples")
    edges, entity_dict, relation_dict = materialize_graph(triples, reuse=reuse)
    return {
        "documents": documents,
        "mentions": mentions,
        "turn_tokens": turn_tokens,
        "relations": relations,
        "clusters": clusters,
        "links": links,
        "link_candidates": candidates,
        "triples": triples,
        "edges": edges,
        "entity_dict": entity_dict,
        "relation_dict": relation_dict,
    }


def fixture_model(spark: SparkSession, fixture_cfg=None) -> PipelineModel:
    """PipelineModel from the deterministic fixture gazetteer."""
    from kgp.config import FixtureConfig
    from kgp.fixtures import alias_df, make_gazetteer, tagger_surfaces

    fixture_cfg = fixture_cfg or FixtureConfig()
    gaz = make_gazetteer(fixture_cfg)
    groups = {s: e.idx for e in gaz for s in e.surfaces}
    return PipelineModel(
        surfaces=tagger_surfaces(gaz),
        surface_groups=groups,
        alias_dict=alias_df(spark, fixture_cfg),
    )
