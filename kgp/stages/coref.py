"""Coreference (SURVEY.md F5 + A14).

The reference models CR "similarly as a relation extraction task"
(README.md:117): a binary classifier over mention pairs. Here the pair
scorer is a batched pandas UDF (surrogate: 1.0 when both surfaces belong
to the same alias group of the broadcast dictionary or are string-equal,
else their char-ngram Jaccard — a calibrated score in [0,1] so the 0.5
threshold has the same shape as the reference's softmax cutoff).

Clustering has two implementations behind one contract
(``mentions, positive_pairs -> (conv_id, mention_id, cluster_id)`` with
``cluster_id = min(mention_id)`` for determinism):

- ``cluster_unionfind`` — per-conversation union-find via
  ``cogroup().applyInPandas``. Conversations are bounded (a 10^4-turn
  conversation's mentions fit a single task comfortably), so grouping by
  conv_id is the natural partitioning; this is the default.

- ``cluster_hashmin`` — the join-iterative "hash-min" label propagation
  (each vertex repeatedly takes the min label in its neighborhood;
  converges in O(log n) rounds). No single task ever holds a whole
  component, so this is the scale path for adversarially huge components;
  AQE handles the per-round skew. Tests assert both produce identical
  clusters.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kgp.config import DEFAULT_CONFIG, PipelineConfig
from kgp.functions.surrogate import jaccard

CLUSTER_SCHEMA = "conv_id string, mention_id long, cluster_id long"

# per-worker score cache for the coref scorer (module-level so it survives
# across Arrow batches under spark.python.worker.reuse)
_SCORER_MEMO: dict = {}


def score_coref_pairs(
    spark: SparkSession,
    pairs: DataFrame,
    surface_groups: dict,
    cfg: PipelineConfig = DEFAULT_CONFIG,
) -> DataFrame:
    """Binary coref scorer over candidate pairs -> adds ``coref_score``.

    ``surface_groups``: surface string -> alias-group id (entity index) —
    the broadcast "model" of the surrogate.

    The score depends only on the two surface strings, and surfaces come
    from a bounded vocabulary — so the UDF runs over the DISTINCT
    (a_mention, b_mention) pairs only, and the big pair table gets its
    scores via a broadcast join of that small scored-pair dim. Pair
    instances grow with the data; distinct surface pairs grow with
    vocab²·co-occurrence density. (Same O(vocab) argument as the linking
    stage's per-distinct-surface scoring.)
    """
    groups_bc = spark.sparkContext.broadcast(surface_groups)
    # stable per-model cache key, captured driver-side (worker-side
    # Broadcast objects don't expose the id)
    model_key = f"coref-{groups_bc._jbroadcast.id()}"

    @F.pandas_udf("double")
    def coref_scorer(a: pd.Series, b: pd.Series) -> pd.Series:
        groups = groups_bc.value
        # surfaces come from a closed vocabulary, so distinct (a, b) pairs
        # are few relative to pair rows; memoize across batches (the memo
        # lives for the Python worker's lifetime, bounded by vocab²·density).
        # Keyed by broadcast id: another pipeline's model must not hit it —
        # and ONLY the active model's memo is retained, so long-lived reused
        # workers (incremental foreachBatch runs a fresh broadcast per
        # microbatch) don't accumulate one dict per retired model.
        if model_key not in _SCORER_MEMO:
            _SCORER_MEMO.clear()
        memo: dict = _SCORER_MEMO.setdefault(model_key, {})
        out = []
        for x, y in zip(a, b):
            key = (x, y)
            s = memo.get(key)
            if s is None:
                gx, gy = groups.get(x), groups.get(y)
                if (gx is not None and gx == gy) or x == y:
                    s = 1.0
                else:
                    s = jaccard(x, y)
                memo[key] = s
            out.append(s)
        return pd.Series(out)

    distinct = pairs.select("a_mention", "b_mention").distinct()
    scored_dim = distinct.withColumn(
        "coref_score", coref_scorer("a_mention", "b_mention")
    )
    # no forced broadcast: the scored dim is vocab-bounded and AQE picks a
    # broadcast join when it fits, but an open surface vocabulary must be
    # able to degrade to a shuffled join instead of failing a hard-hinted
    # broadcast build
    return pairs.join(scored_dim, ["a_mention", "b_mention"])


def positive_edges(scored_pairs: DataFrame, cfg: PipelineConfig = DEFAULT_CONFIG) -> DataFrame:
    return scored_pairs.where(
        (F.col("coref_score") > cfg.coref_threshold)
        & (F.col("a_label") == F.col("b_label"))  # type-consistent clusters
    ).select(
        F.col("a_conv_id").alias("conv_id"),
        F.col("a_mention_id").alias("src"),
        F.col("b_mention_id").alias("dst"),
    )


def _auto_buckets(n_rows: int, cfg: PipelineConfig) -> int:
    """Bucket count that keeps the per-task pandas frame bounded by
    ``cfg.uf_max_bucket_rows`` at any input size (never below
    ``cfg.cc_buckets``)."""
    need = -(-max(n_rows, 1) // cfg.uf_max_bucket_rows)  # ceil div
    return max(cfg.cc_buckets, need)


def cluster_unionfind(
    mentions: DataFrame,
    edges: DataFrame,
    cfg: PipelineConfig = DEFAULT_CONFIG,
    n_buckets: int | None = None,
    n_rows_hint: int | None = None,
) -> DataFrame:
    """Bucketed per-conversation union-find (cogroup on a conv_id hash
    bucket).

    Coref edges never cross conversations, so union-find over a whole
    BUCKET of conversations is identical to running it per conversation —
    but one pandas group per bucket instead of per conv_id amortizes the
    fixed Arrow/pandas per-group cost (~ms) across thousands of
    conversations; with one group per conversation that overhead was the
    dominant cost of the whole stage at 10^5+ conversations. The bucket
    count bounds per-task memory (a bucket holds |data| / n_buckets
    mentions on average; the salted hash spreads hot conversations'
    *pairs* upstream, and a single conversation's mentions always fit —
    same argument as the per-conv variant).

    Per-task memory is O(|mentions| / n_buckets): when ``n_buckets`` is
    not given it is DERIVED from the input size (``n_rows_hint`` if the
    caller already knows it, else one count job over the — typically
    checkpointed — mention table) as
    ``max(cfg.cc_buckets, ceil(n / cfg.uf_max_bucket_rows))``, so scaling
    the input 100x scales the bucket count, not the per-task frame.
    The residual unsplittable unit is a SINGLE conversation (bucket =
    hash(conv_id)); a conversation so hot that its mentions alone exceed
    4x the bound fails loudly inside the task, naming
    :func:`cluster_hashmin` (no task ever holds a whole component there)
    instead of dying in an opaque executor OOM.
    """
    if n_buckets is not None:
        nb = n_buckets
    else:
        n = n_rows_hint if n_rows_hint is not None else mentions.count()
        nb = _auto_buckets(n, cfg)
    hard_cap = 4 * cfg.uf_max_bucket_rows

    def uf(key, mention_pdfs: pd.DataFrame, edge_pdfs: pd.DataFrame) -> pd.DataFrame:
        if len(mention_pdfs) > hard_cap:
            raise RuntimeError(
                f"union-find bucket {key} holds {len(mention_pdfs)} mentions "
                f"(> 4 x uf_max_bucket_rows={hard_cap // 4}): a single "
                "conversation exceeds the per-task bound — use "
                "kgp.stages.coref.cluster_hashmin for this input"
            )
        parent: dict = {}

        def find(x):
            root = x
            while parent.get(root, root) != root:
                root = parent[root]
            while parent.get(x, x) != x:  # path compression
                parent[x], x = root, parent[x]
            return root

        ids = list(mention_pdfs["mention_id"])
        for m in ids:
            parent.setdefault(m, m)
        for s, d in zip(edge_pdfs["src"], edge_pdfs["dst"]):
            rs, rd = find(int(s)), find(int(d))
            if rs != rd:
                # deterministic: larger root points to smaller
                if rs < rd:
                    parent[rd] = rs
                else:
                    parent[rs] = rd
        return pd.DataFrame(
            {
                "conv_id": mention_pdfs["conv_id"],
                "mention_id": ids,
                "cluster_id": [find(int(m)) for m in ids],
            }
        )

    mb = mentions.select("conv_id", "mention_id").withColumn(
        "b", F.pmod(F.xxhash64("conv_id"), F.lit(nb)).cast("int")
    )
    eb = edges.select("conv_id", "src", "dst").withColumn(
        "b", F.pmod(F.xxhash64("conv_id"), F.lit(nb)).cast("int")
    )
    return (
        mb.groupBy("b")
        .cogroup(eb.groupBy("b"))
        .applyInPandas(uf, schema=CLUSTER_SCHEMA)
    )


def cluster_hashmin(
    mentions: DataFrame, edges: DataFrame, cfg: PipelineConfig = DEFAULT_CONFIG
) -> DataFrame:
    """Join-iterative min-label propagation (scale path; no per-component task)."""
    sym = edges.select("src", "dst").union(edges.select(F.col("dst"), F.col("src"))).distinct()
    labels = mentions.select("conv_id", "mention_id", F.col("mention_id").alias("cluster_id"))
    labels = labels.localCheckpoint(eager=True)
    for _ in range(cfg.cc_max_iters):
        neigh_min = (
            labels.join(sym, labels["mention_id"] == sym["src"])
            .groupBy(F.col("dst").alias("mention_id"))
            .agg(F.min("cluster_id").alias("neigh_label"))
        )
        new = (
            labels.join(neigh_min, "mention_id", "left")
            .select(
                "conv_id",
                "mention_id",
                F.least(F.col("cluster_id"), F.coalesce("neigh_label", "cluster_id")).alias(
                    "cluster_id"
                ),
            )
        )
        new = new.localCheckpoint(eager=True)
        changed = (
            new.alias("n")
            .join(labels.alias("o"), "mention_id")
            .where(F.col("n.cluster_id") != F.col("o.cluster_id"))
            .limit(1)
            .count()
        )
        labels = new
        if changed == 0:
            break
    return labels


def canonicalize_clusters(clusters: DataFrame) -> DataFrame:
    """Re-key each component to min(mention_id) (idempotent; both
    implementations already produce min-rooted labels, this is the
    explicit invariant)."""
    rep = clusters.groupBy("cluster_id").agg(F.min("mention_id").alias("rep"))
    return clusters.join(rep, "cluster_id").select(
        "conv_id", "mention_id", F.col("rep").alias("cluster_id")
    )
