"""Graph materialization (SURVEY.md P16/P17, U1, J8, A4, A12) — the
KGAT-ready edge-list/adjacency deliverable, with exact
KGAT-pytorch/utility/loader_kgat.py:84-148 semantics rebuilt relationally.

Two layers:

- :func:`materialize_graph` — pipeline deliverable: the deduped triple set
  mapped to dense int ids (entities sorted by entity_id, relations sorted
  by name — deterministic, cross-run stable), plus reverse edges with
  ``r + n_relations`` (P16, loader_kgat.py:86-91).

- :func:`kgat_construct` — the full CF+KG union of the reference
  (loader_kgat.py:84-148): relation ids shifted by 2 to reserve 0/1 for
  the interaction edge and its reverse (P17, :95), user ids shifted past
  the entity-id space (:100-110), interaction edges injected in both
  directions (J8/U1, :113-130), and the h -> [(t, r)] adjacency aggregation
  (A4, :136-148) as a grouped collect.

Id dictionaries are tiny next to the edge set (they are in the reference
too: remap files), so id assignment sorts the *distinct* key set; the big
edge table only ever broadcast-joins against them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

EDGE_SCHEMA = "h long, r int, t long"


def _dense_ids(df: DataFrame, col: str, out: str, num_parts: int | None = None) -> DataFrame:
    """Distinct values -> contiguous ids 0..n-1 in sorted order (stable).

    Two-phase distributed assignment — never a global single-partition
    window (which would funnel the whole key set through ONE task at
    scale):

    1. range-partition the distinct key set (partition p holds keys all
       ordered before partition p+1's; RangePartitioner assigns ascending
       ranges to ascending partition ids) and pin the partitioning with a
       localCheckpoint so phases 2 and 3 see identical placement;
    2. count rows per partition and collect the TINY (<= num_parts rows)
       count table to the driver to compute cumulative offsets;
    3. number partition-locally: id = offset[pid] + row_number(within pid
       ordered by key) - 1 via a Window partitioned ON the partition id.

    Output is byte-identical to the old global-window form (global sorted
    order, ids 0..n-1) but every phase is parallel.
    """
    spark = df.sparkSession
    if num_parts is None:
        num_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    keyed = (
        df.select(col)
        .distinct()
        .repartitionByRange(num_parts, F.col(col))
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=False)  # pinned by the counts job below
    )
    counts = {
        int(r["_pid"]): int(r["c"])
        for r in keyed.groupBy("_pid").agg(F.count("*").alias("c")).collect()
    }
    rows, acc = [], 0
    for pid in sorted(counts):
        rows.append((pid, acc))
        acc += counts[pid]
    off = spark.createDataFrame(rows, "_pid int, _off long")
    w = Window.partitionBy("_pid").orderBy(col)
    return (
        keyed.join(F.broadcast(off), "_pid")
        # int keeps the historical schema (ids are dictionary-bounded, like
        # the reference's remap files); switch to long if a dictionary ever
        # nears 2^31 entries
        .withColumn(out, (F.col("_off") + F.row_number().over(w) - 1).cast("int"))
        .drop("_pid", "_off")
        # consumers broadcast-join this (tiny) dict 1-3x: lazy checkpoint
        # so the window runs once with no extra serial job barrier
        .localCheckpoint(eager=False)
    )


def entity_ids(triples: DataFrame) -> DataFrame:
    ents = triples.select(F.col("subj").alias("entity_id")).union(
        triples.select(F.col("obj").alias("entity_id"))
    )
    return _dense_ids(ents, "entity_id", "ent_int")


def relation_ids(triples: DataFrame) -> DataFrame:
    return _dense_ids(triples.select(F.col("pred")), "pred", "rel_int")


def materialize_graph(triples: DataFrame) -> tuple[DataFrame, DataFrame, DataFrame]:
    """-> (edges, entity_dict, relation_dict).

    edges: forward (h, r, t) distinct + reverse (t, r + n_rel, h) —
    loader_kgat.py:86-91 semantics over OUR extracted triples.
    """
    ents = entity_ids(triples)  # already lazily checkpointed
    rels = relation_ids(triples)
    n_rel = rels.count()
    fwd = (
        triples.join(F.broadcast(ents.withColumnRenamed("entity_id", "subj")), "subj")
        .withColumnRenamed("ent_int", "h")
        .join(F.broadcast(ents.withColumnRenamed("entity_id", "obj")), "obj")
        .withColumnRenamed("ent_int", "t")
        .join(F.broadcast(rels), "pred")
        .select("h", F.col("rel_int").alias("r"), "t")
        .dropDuplicates(["h", "r", "t"])  # A12
        # consumed twice INSIDE the union query (forward set + reverse
        # projection): eager, or both subtrees recompute it in one job
        .localCheckpoint()
    )
    rev = fwd.select(
        F.col("t").alias("h"), (F.col("r") + F.lit(n_rel)).alias("r"), F.col("h").alias("t")
    )
    return fwd.unionByName(rev), ents, rels


def kgat_construct(kg: DataFrame, cf: DataFrame) -> dict:
    """Exact loader_kgat.py:84-148 dataflow over (h, r, t) + (user, item).

    Returns dict of DataFrames: edges, adjacency, stats (single row).
    """
    kg = kg.dropDuplicates(["h", "r", "t"])  # :80
    n_rel = kg.agg(F.max("r")).first()[0] + 1  # :95-98 max-id convention
    n_ent = (
        kg.select(F.greatest(F.max("h"), F.max("t")).alias("m")).first()["m"] + 1
    )
    # reverse edges (:86-91), then shift all kg relations by 2 (:95)
    fwd = kg.select("h", (F.col("r") + F.lit(2)).alias("r"), "t")
    rev = kg.select(
        F.col("t").alias("h"), (F.col("r") + F.lit(n_rel) + F.lit(2)).alias("r"), F.col("h").alias("t")
    )
    # users shifted past entity space (:100-110); interactions as r=0 / reverse r=1 (:113-130)
    inter = cf.select(
        (F.col("user") + F.lit(n_ent)).alias("h"), F.lit(0).alias("r"), F.col("item").alias("t")
    ).dropDuplicates()
    inter_rev = inter.select(
        F.col("t").alias("h"), F.lit(1).alias("r"), F.col("h").alias("t")
    )
    edges = fwd.unionByName(rev).unionByName(inter).unionByName(inter_rev)
    adjacency = edges.groupBy("h").agg(
        F.array_sort(F.collect_list(F.struct("t", "r"))).alias("out_edges")
    )  # A4 (:136-148); sorted for determinism
    stats = edges.agg(
        F.count("*").alias("n_edges"),
        (F.greatest(F.max("h"), F.max("t")) + 1).alias("n_nodes"),
        (F.max("r") + 1).alias("n_relations"),
    )
    return {"edges": edges, "adjacency": adjacency, "stats": stats}


def kgat_attention(
    spark,
    edges: DataFrame,
    ent_emb,
    rel_emb,
    rel_w,
) -> DataFrame:
    """F7: per-edge attention score ``att = tanh(W_r e_h + e_r) . (W_r e_t)``
    (KGAT-pytorch/model/KGAT.py:111-129 semantics) as one batched pandas
    UDF over the edge table, with the embedding matrices broadcast once.

    ent_emb: (n_ent, d); rel_emb: (n_rel, d_r); rel_w: (n_rel, d_r, d).
    Compose with :func:`edge_softmax` for the A10-normalized adjacency.
    """
    import numpy as np
    import pandas as pd

    bc = spark.sparkContext.broadcast((np.asarray(ent_emb), np.asarray(rel_emb), np.asarray(rel_w)))

    @F.pandas_udf("double")
    def att(h, r, t):
        E, R, W = bc.value
        hv = E[h.to_numpy()]  # (B, d)
        tv = E[t.to_numpy()]
        ri = r.to_numpy()
        Wr = W[ri]  # (B, d_r, d)
        wh = np.einsum("bij,bj->bi", Wr, hv)
        wt = np.einsum("bij,bj->bi", Wr, tv)
        return pd.Series(np.einsum("bi,bi->b", np.tanh(wh + R[ri]), wt))

    return edges.withColumn("score", att("h", "r", "t"))


def mask_train_interactions(scores: DataFrame, train: DataFrame, keys=("user", "item")) -> DataFrame:
    """J7: drop train interactions from the candidate score table
    (the reference zeroes them, metrics.py:126-130; anti-join is the
    set-semantics equivalent for ranking)."""
    return scores.join(train, on=list(keys), how="left_anti")


def edge_softmax(edges_scored: DataFrame) -> DataFrame:
    """A10: per-destination softmax normalization of edge scores
    (KGAT-pytorch/utility/helper.py:11-23) — groupBy+join form (skew-safe
    vs a partition-wide window)."""
    denom = edges_scored.groupBy("t").agg(F.sum(F.exp("score")).alias("z"))
    return edges_scored.join(denom, "t").withColumn(
        "att", F.exp("score") / F.col("z")
    )
