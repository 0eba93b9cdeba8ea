"""Plan-quality audit: dump formatted physical plans for the headline
queries and grep for the properties that matter at 100 TB:

- parquet scans show PushedFilters + pruned ReadSchema (no full-width scan
  for narrow projections)
- dimension joins are BroadcastHashJoin (alias dict, entity/relation ids,
  ANN query set) — the fact side never shuffles for them
- non-UDF stages sit inside WholeStageCodegen spans
- no CartesianProduct anywhere except the intended ANN brute-force
  crossJoin against a broadcast query set (BroadcastNestedLoopJoin)

Writes BENCH/plans/<query>.txt and prints a one-line verdict per query.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SELF_SF_DIR", "/root/testdata/sf0.01")
AUDIT = [
    "kg_doc_assembly",
    "kg_re_pairs",
    "kg_coref_pairs",
    "kg_kgat_edges",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_embedding_lsh",
    "ann_cosine_topk",
    "ann_cosine_lsh",
    "ann_ivf",
    "el_threshold_sweep",
    "text_quality",
    "events_sessionize",
    "tpch_q1",
    "top_revenue",
    "kgat_aggregate",
    "kgat_aggregate_gcn",
    "kgat_aggregate_graphsage",
    "kgat_cf_loss",
    "kgat_cf_embedding",
    "kgat_cf_score",
    "kgat_transr_scores",
    "kgat_cf_eval",
]


def main():
    import __spark_entry__ as entry
    from kgp.session import get_spark

    spark = get_spark("plan-audit", master="local[4]", shuffle_partitions=8)
    outdir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "BENCH", "plans")
    os.makedirs(outdir, exist_ok=True)
    qs = entry.queries()
    for name in AUDIT:
        df = qs[name](spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
        with open(os.path.join(outdir, f"{name}.txt"), "w") as f:
            f.write(plan)
        # formatted mode tags codegen membership as "[codegen id : N]"
        n_codegen = len(re.findall(r"\[codegen id : \d+\]", plan))
        n_bhj = len(re.findall(r"BroadcastHashJoin", plan))
        n_smj = len(re.findall(r"SortMergeJoin", plan))
        n_cart = len(re.findall(r"CartesianProduct", plan))
        pushed = "PushedFilters: \\[[^]]" in plan or bool(re.search(r"PushedFilters: \[[^\]]", plan))
        # pre-execution AQE plans omit codegen annotations; only report when present
        cg = f"codegen={n_codegen} " if n_codegen else ""
        print(
            f"{name}: {cg}bhj={n_bhj} smj={n_smj} cartesian={n_cart} "
            f"pushedFilters={'yes' if pushed else 'none'}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
