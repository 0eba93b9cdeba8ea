"""Checkpointed, resumable pipeline runner (north_rule: "resumable from
checkpoint with per-partition lineage + metrics").

Wraps the pure stage functions of kgp.stages.pipeline in LineageLog
stages: every stage writes a conv-bucketed parquet table plus a manifest
with per-partition row counts and wall time; a re-run with the same input
fingerprint skips completed stages and reads their tables back (the
production analogue is Iceberg ``overwritePartitions`` guarded by the
_lineage table — SURVEY.md §4.3(3)).

The input fingerprint is a content hash of the transcripts (sum of
per-row xxhash64 — partitioning-independent), combined with the pipeline
config, so any input or config change invalidates downstream stages.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession

from kgp.config import DEFAULT_CONFIG, PipelineConfig
from kgp.lineage import LineageLog
from kgp.stages.assemble import assemble_documents
from kgp.stages.coref import cluster_unionfind, positive_edges, score_coref_pairs
from kgp.stages.graph import materialize_graph
from kgp.stages.linking import cluster_surfaces, link_clusters
from kgp.stages.mentions import detect_mentions, tokenize_turns
from kgp.stages.pairs import coref_pairs, re_pairs
from kgp.stages.pipeline import PipelineModel
from kgp.stages.relations import classify_relations
from kgp.stages.triples import assemble_triples


# canonical definition lives in kgp.reuse (shared with run_pipeline's
# KGP_REUSE=table profile); re-exported here for existing callers
from kgp.reuse import input_fingerprint  # noqa: E402


def run_pipeline_resumable(
    spark: SparkSession,
    transcripts: DataFrame,
    model: PipelineModel,
    outdir: str,
    cfg: PipelineConfig = DEFAULT_CONFIG,
) -> dict:
    log = LineageLog(outdir, n_buckets=cfg.conv_buckets)
    fp = input_fingerprint(transcripts, cfg)
    t0 = time.time()

    documents = log.run_stage(
        spark, "documents", fp, lambda: assemble_documents(transcripts, cfg)
    )
    mentions = log.run_stage(
        spark, "mentions", fp, lambda: detect_mentions(spark, documents, model.surfaces, cfg)
    )
    turn_tokens = log.run_stage(spark, "turn_tokens", fp, lambda: tokenize_turns(transcripts))
    relations = log.run_stage(
        spark,
        "relations",
        fp,
        lambda: classify_relations(re_pairs(mentions, cfg), turn_tokens, cfg),
    )
    clusters = log.run_stage(
        spark,
        "clusters",
        fp,
        lambda: cluster_unionfind(
            mentions,
            positive_edges(
                score_coref_pairs(spark, coref_pairs(mentions, cfg), model.surface_groups, cfg),
                cfg,
            ),
            cfg,
        ),
    )
    links = log.run_stage(
        spark,
        "links",
        fp,
        lambda: link_clusters(cluster_surfaces(clusters, mentions), model.alias_dict, cfg)[0],
        bucket_on=None,
    )
    triples = log.run_stage(
        spark, "triples", fp, lambda: assemble_triples(relations, clusters, links)
    )
    edges = log.run_stage(
        spark, "edges", fp, lambda: materialize_graph(triples)[0], bucket_on=None
    )
    return {
        "documents": documents,
        "mentions": mentions,
        "relations": relations,
        "clusters": clusters,
        "links": links,
        "triples": triples,
        "edges": edges,
        "lineage": log,
        "wall_s": time.time() - t0,
    }
