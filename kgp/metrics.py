"""Evaluation metrics (SURVEY.md A6-A11), relational form.

- micro P/R/F1 over predicted-vs-gold entity sets per sample
  (eval_el.py:309-346 accumulation: tp/np/nt summed globally, F1 from
  the totals — NOT averaged per-sample).
- seqeval-style entity-level P/R/F1 over BIO span tables
  (CRF/metrics_utils.py:8-14 semantics via exact (id,s,e,label) match).
- sentence-frame accuracy (all slots correct, metrics_utils.py:17-35).
- classification accuracy (utils.py:61-65).
- precision@k / recall@k / ndcg@k over a ranked (user, item, rank)
  table vs ground-truth items (KGAT-pytorch/utility/metrics.py:121-146);
  DCG uses the reference's (2^rel - 1) / log2(rank + 1) with binary rel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def micro_prf(pairs: DataFrame, pred_col: str = "pred", gold_col: str = "gold") -> dict:
    """pairs: one row per sample with array columns of predicted / gold ids."""
    agg = pairs.select(
        F.size(F.array_intersect(pred_col, gold_col)).alias("tp"),
        F.size(pred_col).alias("np"),
        F.size(gold_col).alias("nt"),
    ).agg(F.sum("tp").alias("tp"), F.sum("np").alias("np"), F.sum("nt").alias("nt"))
    r = agg.first()
    tp, npred, ntruth = r["tp"] or 0, r["np"] or 0, r["nt"] or 0
    p = tp / npred if npred else 0.0
    rec = tp / ntruth if ntruth else 0.0
    f1 = 2 * p * rec / (p + rec) if (p + rec) else 0.0
    return {"precision": p, "recall": rec, "f1": f1, "tp": tp, "n_pred": npred, "n_true": ntruth}


def micro_prf_df(pred: DataFrame, gold: DataFrame, on: list) -> DataFrame:
    """A6 relational core: micro P/R/F1 over long-form prediction / gold
    set tables (one row per (sample, id) member; callers pass set-semantics
    inputs, i.e. already distinct on ``on``). tp/n_pred/n_true are summed
    globally and P/R/F1 derived from the totals — the reference's
    accumulation convention (eval_el.py:309-346), NOT per-sample averaging.
    One output row: tp, n_pred, n_true, precision, recall, f1."""
    tp_df = pred.join(gold, on=list(on), how="left_semi").agg(F.count("*").alias("tp"))
    np_df = pred.agg(F.count("*").alias("n_pred"))
    nt_df = gold.agg(F.count("*").alias("n_true"))
    out = tp_df.crossJoin(np_df).crossJoin(nt_df)
    p = F.when(F.col("n_pred") > 0, F.col("tp") / F.col("n_pred")).otherwise(F.lit(0.0))
    r = F.when(F.col("n_true") > 0, F.col("tp") / F.col("n_true")).otherwise(F.lit(0.0))
    out = out.withColumn("precision", p).withColumn("recall", r)
    f1 = F.when(
        (F.col("precision") + F.col("recall")) > 0,
        2 * F.col("precision") * F.col("recall") / (F.col("precision") + F.col("recall")),
    ).otherwise(F.lit(0.0))
    return out.select("tp", "n_pred", "n_true", "precision", "recall", f1.alias("f1"))


def span_prf_df(pred_spans: DataFrame, gold_spans: DataFrame, keys=("doc_id",)) -> DataFrame:
    """Entity-level F1 as a one-row DataFrame: exact (keys, start, end,
    label) span match (J5) — the relational core of :func:`span_prf`,
    usable inside larger plans (and by the driver's SQL-checked query)."""
    return micro_prf_df(pred_spans, gold_spans, [*keys, "start", "end", "label"])


def frame_accuracy_df(pred_spans: DataFrame, gold_spans: DataFrame, keys=("doc_id",)) -> DataFrame:
    """A8: sentence-frame accuracy as a one-row DataFrame.

    A frame (one ``keys`` group, e.g. a turn) is correct iff its predicted
    span set equals its gold span set exactly — "all slots correct"
    (reference CRF/metrics_utils.py:17-35, which compares the full label
    sequence per sentence). Relationally: per frame, the matched-span
    count must equal both the predicted and the gold span count, which for
    unique spans is set equality without any cross-engine string
    canonicalization. Frames are the UNION of keys present on either side
    (a frame with spans in pred but none in gold — or vice versa — counts
    as wrong; turns with no spans on either side are vacuously correct and
    excluded on both engines). One output row: n_frames, n_correct,
    accuracy."""
    kl = list(keys)
    on = [*kl, "start", "end", "label"]
    np_t = pred_spans.groupBy(*kl).agg(F.count("*").alias("np_t"))
    nt_t = gold_spans.groupBy(*kl).agg(F.count("*").alias("nt_t"))
    tp_t = (
        pred_spans.join(gold_spans, on=on, how="left_semi")
        .groupBy(*kl)
        .agg(F.count("*").alias("tp_t"))
    )
    frames = (
        np_t.join(nt_t, on=kl, how="full_outer")
        .join(tp_t, on=kl, how="left")
        .select(
            F.coalesce("np_t", F.lit(0)).alias("np_t"),
            F.coalesce("nt_t", F.lit(0)).alias("nt_t"),
            F.coalesce("tp_t", F.lit(0)).alias("tp_t"),
        )
    )
    correct = (F.col("np_t") == F.col("nt_t")) & (F.col("tp_t") == F.col("nt_t"))
    return frames.agg(
        F.count("*").alias("n_frames"),
        F.sum(correct.cast("long")).alias("n_correct"),
    ).select(
        "n_frames",
        "n_correct",
        (F.col("n_correct") / F.col("n_frames")).alias("accuracy"),
    )


def span_prf(pred_spans: DataFrame, gold_spans: DataFrame, keys=("doc_id",)) -> dict:
    """Entity-level F1: exact (keys, start, end, label) span match (J5)."""
    r = span_prf_df(pred_spans, gold_spans, keys).first()
    return {
        "precision": r["precision"], "recall": r["recall"], "f1": r["f1"],
        "tp": r["tp"], "n_pred": r["n_pred"], "n_true": r["n_true"],
    }


def sentence_accuracy(df: DataFrame, pred_col: str = "pred_seq", gold_col: str = "gold_seq") -> float:
    """A8: fraction of samples whose full label sequence matches."""
    return df.agg(
        F.avg(F.when(F.col(pred_col) == F.col(gold_col), 1.0).otherwise(0.0))
    ).first()[0]


def accuracy(df: DataFrame, pred_col: str = "pred", gold_col: str = "label") -> float:
    """A9: (preds == labels).mean()."""
    return df.agg(F.avg((F.col(pred_col) == F.col(gold_col)).cast("double"))).first()[0]


def ranking_metrics(
    ranked: DataFrame, truth: DataFrame, k: int = 20, user_col: str = "user", item_col: str = "item"
) -> DataFrame:
    """A11: per-user precision@k / recall@k / ndcg@k, plus a global row.

    ranked: (user, item, rank) with rank 1-based; truth: (user, item).
    """
    topk = ranked.where(F.col("rank") <= k)
    hits = topk.join(
        truth.withColumn("hit", F.lit(1)), on=[user_col, item_col], how="left"
    ).withColumn("hit", F.coalesce("hit", F.lit(0)))
    n_truth = truth.groupBy(user_col).agg(F.count("*").alias("n_true"))
    # ideal DCG: hits ranked first
    per_user = (
        hits.groupBy(user_col)
        .agg(
            F.sum("hit").alias("n_hit"),
            F.sum(
                (F.pow(F.lit(2.0), F.col("hit")) - 1) / F.log2(F.col("rank") + 1)
            ).alias("dcg"),
        )
        .join(n_truth, user_col)
        .withColumn("precision_at_k", F.col("n_hit") / k)
        .withColumn("recall_at_k", F.col("n_hit") / F.col("n_true"))
    )
    # IDCG for min(n_true, k) ones at the top
    idcg = F.expr(
        f"aggregate(sequence(1, int(least(n_true, {k}))), 0.0D, (acc, i) -> acc + 1.0D / log2(i + 1))"
    )
    return per_user.withColumn("ndcg_at_k", F.col("dcg") / F.greatest(idcg, F.lit(1e-12)))
