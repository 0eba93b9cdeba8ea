"""Training-support operators: J9 negative sampling, W5 early stopping.

J9 — the reference draws negatives with a rejection loop
(``while True: cand = randint(n); if cand not in positives: break``,
KGAT-pytorch/utility/loader_kgat.py:191-202 for CF items, :247-258 for KG
tails). Distributed re-expression: propose a bounded number of
DETERMINISTIC pseudo-random candidates per positive (md5-derived, so the
DuckDB oracle twin computes the identical stream), reject via one
anti-join against the positive set, keep the first surviving attempt.
This is the standard Spark shape for "sample until not in set": the
rejection loop becomes ``explode(attempts) -> anti-join -> min(attempt)``
— no per-row Python, no driver loop, shuffle keyed on the composite
(user, candidate) so hot users spread across tasks.

W5 — ``early_stopping(recall_list, stopping_steps)``
(KGAT-pytorch/utility/helper.py:26-33): best = max of the history, taking
the FIRST epoch achieving it (list.index), stop once
``len(list) - best_step - 1 >= stopping_steps``. Re-expressed as window
functions over an (epoch, recall) history table, emitting the running
decision at every epoch (the reference evaluates it once per epoch on a
growing list). The history is metadata-scale by contract — one row per
training epoch — so the single ordered window is bounded by design, not
a scale hazard.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _h15(*cols) -> F.Column:
    """First 15 hex chars of md5 over '|'-joined args, as a non-negative
    long — the deterministic uniform stream shared with the DuckDB twin
    (same idiom as the dedup/fingerprint oracles)."""
    return F.conv(
        F.substring(F.md5(F.concat_ws("|", *cols)), 1, 15), 16, 10
    ).cast("long")


def negative_sample_items(
    cf: DataFrame,
    attempts: int = 12,
    seed: int = 42,
    user_col: str = "user",
    item_col: str = "item",
    n_items: int | None = None,
    universe: DataFrame | None = None,
) -> DataFrame:
    """One negative item per positive (user, item) interaction.

    -> (user, pos_item, neg_item, attempt): ``neg_item`` is the first
    candidate of the per-row deterministic stream that is NOT among the
    user's positives (loader_kgat.py:191-202 semantics with a bounded
    proposal budget; a row whose ``attempts`` candidates all collide is
    dropped — with attempts=12 and any realistic positives/items ratio
    the collision probability is (density)^12, i.e. never at scale).

    The candidate modulus follows the reference's ``self.n_items`` — the
    FULL item universe (train+test, loader_base.py:71-75 statistics),
    not the split being sampled: pass ``n_items`` (an explicit size) or
    ``universe`` (any DataFrame carrying ``item_col``; its max(item)+1
    becomes the modulus via a broadcast 1-row aggregate, no driver
    action). With neither, the modulus falls back to the data-derived
    max over ``cf`` itself — correct only when ``cf`` IS the full
    universe; a train-split caller that omits the universe can never
    draw items unseen in the split, a bias the reference does not have.
    Rejection tests membership in ``cf`` (the split's positives) alone,
    exactly like the reference's ``train_user_dict`` check.
    """
    user, item = F.col(user_col), F.col(item_col)
    pos = cf.select(user.alias("user"), item.alias("item")).distinct()
    if universe is not None:
        stats = universe.select(F.col(item_col).alias("item")).agg(
            (F.max("item") + 1).alias("_n_items")
        )
    elif n_items is not None:
        stats = cf.sparkSession.range(1).select(F.lit(n_items).alias("_n_items"))
    else:
        stats = pos.agg((F.max("item") + 1).alias("_n_items"))
    props = (
        pos.crossJoin(F.broadcast(stats))
        .select(
            "user",
            F.col("item").alias("pos_item"),
            F.explode(F.sequence(F.lit(1), F.lit(attempts))).alias("attempt"),
            "_n_items",
        )
        .withColumn(
            "neg_item",
            F.pmod(_h15(F.lit(seed), F.col("user"), F.col("pos_item"), F.col("attempt")), F.col("_n_items")),
        )
        .drop("_n_items")
    )
    survivors = props.join(
        pos.select("user", F.col("item").alias("neg_item")),
        ["user", "neg_item"],
        "left_anti",
    )
    w = Window.partitionBy("user", "pos_item").orderBy("attempt")
    return (
        survivors.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select("user", "pos_item", "neg_item", "attempt")
    )


def negative_sample_tails(
    kg: DataFrame, attempts: int = 12, seed: int = 42
) -> DataFrame:
    """One corrupted tail per positive (h, r, t) triple
    (loader_kgat.py:247-258: reject while ``(tail, relation) in
    kg_dict[head]`` — i.e. candidate (h, r, tail') must not be a positive
    triple). -> (h, r, t, neg_t, attempt)."""
    pos = kg.select("h", "r", "t").distinct()
    stats = pos.agg(
        (F.greatest(F.max("h"), F.max("t")) + 1).alias("_n_nodes")
    )
    props = (
        pos.crossJoin(F.broadcast(stats))
        .select(
            "h", "r", "t",
            F.explode(F.sequence(F.lit(1), F.lit(attempts))).alias("attempt"),
            "_n_nodes",
        )
        .withColumn(
            "neg_t",
            F.pmod(_h15(F.lit(seed), F.col("h"), F.col("r"), F.col("t"), F.col("attempt")), F.col("_n_nodes")),
        )
        .drop("_n_nodes")
    )
    survivors = props.join(
        pos.select("h", "r", F.col("t").alias("neg_t")),
        ["h", "r", "neg_t"],
        "left_anti",
    )
    w = Window.partitionBy("h", "r", "t").orderBy("attempt")
    return (
        survivors.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select("h", "r", "t", "neg_t", "attempt")
    )


def early_stopping_history(
    history: DataFrame,
    stopping_steps: int,
    epoch_col: str = "epoch",
    metric_col: str = "recall",
) -> DataFrame:
    """Running early-stopping decision at every epoch of a metric history.

    -> (epoch, recall, best_recall, best_epoch, should_stop): for each
    prefix [0..epoch], ``best_recall`` = max so far, ``best_epoch`` = the
    FIRST epoch achieving it (helper.py:26-33 ``list.index(max)``), and
    ``should_stop`` = (number of epochs after best) >= stopping_steps,
    evaluated exactly as ``len(recall_list) - best_step - 1``.

    One window ordered by epoch over a table with one row per training
    epoch (bounded, metadata-scale — see module docstring).
    """
    e, m = F.col(epoch_col), F.col(metric_col)
    ordered = Window.orderBy(epoch_col)
    upto = ordered.rowsBetween(Window.unboundedPreceding, 0)
    prev = ordered.rowsBetween(Window.unboundedPreceding, -1)
    new_best = m > F.coalesce(F.max(m).over(prev), F.lit(float("-inf")))
    marked = history.select(
        e.alias("epoch"),
        m.alias("recall"),
        F.row_number().over(ordered).alias("_rn"),
        new_best.alias("_new_best"),
    )
    # len - best_step - 1 == rn - rn_of_first_best (both 1-based rns)
    return marked.select(
        "epoch",
        "recall",
        F.max("recall").over(upto).alias("best_recall"),
        F.max(F.when(F.col("_new_best"), F.col("epoch"))).over(upto).alias("best_epoch"),
        (
            F.col("_rn") - F.max(F.when(F.col("_new_best"), F.col("_rn"))).over(upto)
            >= F.lit(stopping_steps)
        ).alias("should_stop"),
    )
