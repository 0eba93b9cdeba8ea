"""Sub-step profile of the linking stage (tools/profile_stages.py found it
to be the most expensive stage; this isolates which join/window/UDF inside
it carries the cost)."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from pyspark.sql import functions as F

    from kgp.config import DEFAULT_CONFIG as cfg
    from kgp.entry_support import ensure_fixtures, fixture_model_for, load_transcripts
    from kgp.session import get_spark
    from kgp.stages.coref import cluster_unionfind, positive_edges, score_coref_pairs
    from kgp.stages.linking import cluster_surfaces, link_clusters
    from kgp.stages.mentions import detect_mentions
    from kgp.stages.pairs import coref_pairs
    from kgp.stages.assemble import assemble_documents

    sf_dir = os.environ.get("PROF_SF_DIR", "/root/repo/fixtures/sf1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    ensure_fixtures(sf_dir)
    spark = get_spark("kgp-prof-links", master=f"local[{cpus}]", shuffle_partitions=64)
    spark.range(1000).agg(F.sum("id")).collect()

    def step(name, fn):
        t0 = time.time()
        out = fn()
        print(f"  {name}: {round(time.time() - t0, 2)}s -> {out}", flush=True)

    transcripts = load_transcripts(spark, sf_dir)
    model = fixture_model_for(spark, sf_dir)
    documents = assemble_documents(transcripts, cfg)
    mentions = detect_mentions(spark, documents, model.surfaces, cfg).localCheckpoint()
    sp = score_coref_pairs(spark, coref_pairs(mentions, cfg), model.surface_groups, cfg)
    step("scored_pairs(count)", lambda: sp.count())
    pos = positive_edges(sp, cfg)
    step("pos_edges(count)", lambda: pos.count())
    clusters = cluster_unionfind(mentions, pos, cfg).localCheckpoint()
    step("clusters(count)", lambda: clusters.count())

    t0 = time.time()
    surfaces = cluster_surfaces(clusters, mentions).localCheckpoint()
    print(f"  cluster_surfaces(ckpt): {round(time.time() - t0, 2)}s -> {surfaces.count()}", flush=True)
    links, candidates = link_clusters(surfaces, model.alias_dict, cfg)
    step("candidates(count)", lambda: candidates.count())
    step("links(count)", lambda: links.count())
    spark.stop()


if __name__ == "__main__":
    main()
