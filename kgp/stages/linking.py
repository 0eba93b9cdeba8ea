"""Entity linking (SURVEY.md J1/J2/J3, F6, W2, P14).

The reference's EL is: Elasticsearch ``match`` recall of top-128 candidates
per mention, then a BERT cross-encoder scores each (mention, candidate)
pair, then a threshold filter (eval_el.py:162-291). Rebuilt with no
external service as the **two-stage hash-join + score pass** the
north_rule names:

1. **Exact/canonical pass (J3)** — normalized surface equi-joined against
   the broadcast alias dictionary. ``entity_id = md5(entity_name--code)``
   parity with prepare_el_index.py:27-29 is carried in the dictionary.
2. **Recall join (J1)** — surfaces without an exact hit are exploded into
   distinct char-ngram shingles and hash-joined against a broadcast
   posting table (ngram -> alias); overlap counts aggregate per
   (surface, alias) into a Jaccard recall score (the BM25 stand-in), and a
   rank window keeps top-k per surface (W2, reference topk=128 ->
   cfg.recall_top_k).
3. **Score pass (F6) + threshold (P14)** — a batched pandas UDF
   (surrogate cross-encoder) rescores the survivors; ``score > θ`` keeps a
   candidate, argmax per cluster with deterministic tie-break emits the
   final link.

The dictionary is small by construction (it is in the reference too — an
ES index of entity names), so both joins are broadcast: the mention side
never shuffles for linking at any data scale.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from kgp.config import DEFAULT_CONFIG, PipelineConfig
from kgp.functions.surrogate import jaccard

LINK_SCHEMA = "cluster_id long, entity_id string, score double"


def _cross_encoder():
    @F.pandas_udf("double")
    def scorer(surface: pd.Series, alias: pd.Series) -> pd.Series:
        return pd.Series([jaccard(a, b) for a, b in zip(surface, alias)])

    return scorer


def cluster_surfaces(clusters: DataFrame, mentions: DataFrame) -> DataFrame:
    """Distinct normalized surface forms per cluster."""
    return (
        clusters.join(mentions.select("mention_id", "mention"), "mention_id")
        .select("cluster_id", F.col("mention").alias("surface"))
        .distinct()
    )


def _ngram_explode(df: DataFrame, col: str, n: int) -> DataFrame:
    """Distinct padded char-ngrams of a string column (JVM-side, no UDF;
    substring with a column start position needs the SQL expr form)."""
    return df.withColumn(
        "grams",
        F.array_distinct(
            F.expr(
                f"transform(sequence(0, greatest(length(concat('#', {col}, '#')) - {n}, 0)), "
                f"i -> substring(concat('#', {col}, '#'), i + 1, {n}))"
            )
        ),
    ).withColumn("n_grams", F.size("grams"))


def link_clusters(
    surfaces: DataFrame, alias_dict: DataFrame, cfg: PipelineConfig = DEFAULT_CONFIG
) -> tuple[DataFrame, DataFrame]:
    """-> (links, candidates). links: one best entity per cluster.

    alias_dict: (entity_name, alias, code, entity_id) — broadcast dim.
    """
    n = cfg.ngram_size
    alias_norm = alias_dict.select(F.lower(F.trim("alias")).alias("alias"), "entity_id")

    # Recall + scoring run per DISTINCT surface, not per (cluster, surface):
    # distinct surfaces are bounded by vocabulary while cluster rows grow
    # with the data, so the expensive ngram join and cross-encoder cost
    # stays O(vocab) at any input scale; results join back to clusters at
    # the end (the mention side of that join never carries candidate
    # blow-up, only the final per-surface survivors).
    surf = surfaces.select("surface").distinct()

    # --- stage 1: exact broadcast join (J3) ---
    exact_s = surf.join(
        F.broadcast(alias_norm), surf["surface"] == alias_norm["alias"]
    ).select("surface", "alias", "entity_id", F.lit(1.0).alias("score"))

    # --- stage 2: ngram recall join for the misses (J1) ---
    misses = surf.join(
        F.broadcast(alias_norm), surf["surface"] == alias_norm["alias"], "left_anti"
    )
    m_grams = _ngram_explode(misses, "surface", n).select(
        "surface", F.col("n_grams").alias("n_s"), F.explode("grams").alias("gram")
    )
    posting = _ngram_explode(alias_norm.distinct(), "alias", n).select(
        "alias", "entity_id", F.col("n_grams").alias("n_a"), F.explode("grams").alias("gram")
    )
    overlap = (
        m_grams.join(F.broadcast(posting), "gram")
        .groupBy("surface", "n_s", "alias", "entity_id", "n_a")
        .agg(F.count("*").alias("ov"))
        .withColumn("recall_score", F.col("ov") / (F.col("n_s") + F.col("n_a") - F.col("ov")))
    )
    w = Window.partitionBy("surface").orderBy(
        F.desc("recall_score"), F.asc("entity_id"), F.asc("alias")
    )
    topk = overlap.withColumn("rk", F.row_number().over(w)).where(F.col("rk") <= cfg.recall_top_k)

    # --- score pass (F6) + threshold (P14) ---
    fuzzy_s = (
        topk.withColumn("score", _cross_encoder()("surface", "alias"))
        .where(F.col("score") > cfg.link_threshold)
        .select("surface", "alias", "entity_id", "score")
    )

    # --- join per-surface candidates back to clusters ---
    cand_s = exact_s.unionByName(fuzzy_s)
    candidates = surfaces.join(cand_s, "surface").select(
        "cluster_id", "surface", "alias", "entity_id", "score"
    )

    # --- best entity per cluster (deterministic tie-break) ---
    wc = Window.partitionBy("cluster_id").orderBy(
        F.desc("score"), F.asc("entity_id"), F.asc("surface"), F.asc("alias")
    )
    links = (
        candidates.withColumn("rk", F.row_number().over(wc))
        .where(F.col("rk") == 1)
        .select("cluster_id", "entity_id", "score")
    )
    return links, candidates
