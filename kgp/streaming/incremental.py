"""Incremental (streaming) mode.

The reference is pure batch (SURVEY.md §2.9); this module provides the
documented upgrade path: ``readStream`` over the transcript table +
``Trigger.AvailableNow`` + ``foreachBatch`` wrapping the SAME batch stage
functions — no operator is reimplemented for streaming. Each micro-batch
is assumed conversation-complete (conversations are keyed, not
time-windowed; an upstream sessionizer closes conversations), so per-batch
triple extraction composes by append + global dedup at read time.

Also provides a watermarked windowed aggregation over an event stream —
the Structured Streaming operator surface (event-time window + watermark
for late data) demonstrated on the testdata `events` schema.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kgp.config import DEFAULT_CONFIG, PipelineConfig
from kgp.fixtures import TRANSCRIPT_SCHEMA


def incremental_triples(
    spark: SparkSession,
    input_dir: str,
    model,
    outdir: str,
    cfg: PipelineConfig = DEFAULT_CONFIG,
):
    """Stream transcript parquet files -> append-only triples table.

    Returns the finished StreamingQuery (Trigger.AvailableNow drains all
    pending input then stops — the incremental-batch pattern).
    """
    from kgp.stages.coref import cluster_unionfind, positive_edges, score_coref_pairs
    from kgp.stages.linking import cluster_surfaces, link_clusters
    from kgp.stages.mentions import mentions_from_tagged, pair_turn_tokens, tag_turns
    from kgp.stages.pairs import coref_pairs, re_pairs
    from kgp.stages.relations import classify_relations
    from kgp.stages.triples import assemble_triples

    sink = os.path.join(outdir, "triples")
    checkpoint = os.path.join(outdir, "_checkpoint")

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        transcripts = batch_df.localCheckpoint()
        # same fused single-pass tagger as the batch pipeline
        tagged = tag_turns(spark, transcripts, model.surfaces, cfg).localCheckpoint()
        mentions = mentions_from_tagged(tagged)
        relations = classify_relations(
            re_pairs(mentions, cfg), pair_turn_tokens(tagged), cfg
        )
        clusters = cluster_unionfind(
            mentions,
            positive_edges(
                score_coref_pairs(spark, coref_pairs(mentions, cfg), model.surface_groups, cfg),
                cfg,
            ),
            cfg,
        ).localCheckpoint()
        links, _ = link_clusters(cluster_surfaces(clusters, mentions), model.alias_dict, cfg)
        triples = assemble_triples(relations, clusters, links.localCheckpoint())
        (
            triples.withColumn("batch_id", F.lit(batch_id))
            .write.mode("append")
            .parquet(sink)
        )

    stream = (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .parquet(input_dir)
        .writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    stream.awaitTermination()
    return sink


def read_incremental_triples(spark: SparkSession, sink: str) -> DataFrame:
    """Deduped global view over the appended per-batch triples."""
    return (
        spark.read.parquet(sink)
        .groupBy("conv_id", "subj", "pred", "obj")
        .agg(F.array_sort(F.flatten(F.collect_set("src_turns"))).alias("src_turns"))
        .withColumn("src_turns", F.array_distinct("src_turns"))
    )


def windowed_event_counts(
    events: DataFrame, window: str = "10 minutes", watermark: str = "30 minutes"
) -> DataFrame:
    """Watermarked event-time windowed aggregation (streaming-safe plan):
    per (window, event_type) counts + value sums; late rows beyond the
    watermark are dropped by the engine."""
    return (
        events.withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n",
            "total_value",
        )
    )
