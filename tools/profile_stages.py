"""Per-stage wall-time profile of the KG pipeline at one parallelism level.

Finds the non-scaling (serial) fraction: run with SPARK_GRAFT_CPUS=8 and
=32 on the same fixture and diff per-stage times. Each stage is forced
with the same materialization the pipeline itself uses (localCheckpoint
for multi-consumer stages, count() otherwise).

Usage: SPARK_GRAFT_CPUS=32 PROF_SF_DIR=/root/repo/fixtures/sf1 python tools/profile_stages.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from kgp.config import DEFAULT_CONFIG as cfg
    from kgp.entry_support import ensure_fixtures, fixture_model_for, load_transcripts
    from kgp.session import get_spark
    from kgp.stages.assemble import assemble_documents
    from kgp.stages.coref import cluster_unionfind, positive_edges, score_coref_pairs
    from kgp.stages.graph import materialize_graph
    from kgp.stages.linking import cluster_surfaces, link_clusters
    from kgp.stages.mentions import detect_mentions, tokenize_turns
    from kgp.stages.pairs import coref_pairs, re_pairs
    from kgp.stages.relations import classify_relations
    from kgp.stages.triples import assemble_triples

    sf_dir = os.environ.get("PROF_SF_DIR", "/root/repo/fixtures/sf1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    ensure_fixtures(sf_dir)
    spark = get_spark("kgp-prof", master=f"local[{cpus}]", shuffle_partitions=64)
    from pyspark.sql import functions as F

    spark.range(1000).agg(F.sum("id")).collect()  # warm-up

    times = {}

    def step(name, fn):
        t0 = time.time()
        out = fn()
        times[name] = round(time.time() - t0, 2)
        print(f"  {name}: {times[name]}s", flush=True)
        return out

    t_all = time.time()
    transcripts = load_transcripts(spark, sf_dir)
    model = fixture_model_for(spark, sf_dir)

    documents = assemble_documents(transcripts, cfg)
    mentions = step("mentions(ckpt)", lambda: detect_mentions(spark, documents, model.surfaces, cfg).localCheckpoint())
    turn_tokens = tokenize_turns(transcripts)
    relations = classify_relations(re_pairs(mentions, cfg), turn_tokens, cfg)
    relations = step("relations(ckpt)", lambda: relations.localCheckpoint())
    sp = score_coref_pairs(spark, coref_pairs(mentions, cfg), model.surface_groups, cfg)
    pos = positive_edges(sp, cfg)
    clusters = step("clusters(ckpt)", lambda: cluster_unionfind(mentions, pos, cfg).localCheckpoint())
    links, candidates = link_clusters(cluster_surfaces(clusters, mentions), model.alias_dict, cfg)
    links = step("links(ckpt)", lambda: links.localCheckpoint())
    triples = step("triples(ckpt)", lambda: assemble_triples(relations, clusters, links).localCheckpoint())
    edges, ed, rd = materialize_graph(triples)
    step("edges(count)", lambda: edges.count())
    n = step("triples(count)", lambda: triples.count())
    times["TOTAL"] = round(time.time() - t_all, 2)
    print(json.dumps({"cpus": int(cpus), "sf_dir": sf_dir, "n_triples": n, "times": times}))
    spark.stop()


if __name__ == "__main__":
    main()
