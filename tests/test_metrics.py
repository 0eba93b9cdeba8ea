"""Metrics library tests against hand-computed values."""

import math

import pytest


def test_micro_prf(spark):
    from kgp.metrics import micro_prf

    df = spark.createDataFrame(
        [(["a", "b"], ["a"]), (["c"], ["c", "d"]), ([], ["e"])],
        "pred array<string>, gold array<string>",
    )
    m = micro_prf(df)
    # tp=2, n_pred=3, n_true=4
    assert m["tp"] == 2 and m["n_pred"] == 3 and m["n_true"] == 4
    assert m["precision"] == pytest.approx(2 / 3)
    assert m["recall"] == pytest.approx(0.5)
    assert m["f1"] == pytest.approx(2 * (2 / 3) * 0.5 / (2 / 3 + 0.5))


def test_span_prf(spark):
    from kgp.metrics import span_prf

    pred = spark.createDataFrame(
        [(0, 0, 2, "PER"), (0, 3, 4, "ORG"), (1, 0, 1, "LOC")],
        "doc_id long, start int, end int, label string",
    )
    gold = spark.createDataFrame(
        [(0, 0, 2, "PER"), (1, 0, 1, "PER")],
        "doc_id long, start int, end int, label string",
    )
    m = span_prf(pred, gold)
    assert m["tp"] == 1 and m["precision"] == pytest.approx(1 / 3) and m["recall"] == 0.5


def test_sentence_accuracy_and_accuracy(spark):
    from kgp.metrics import accuracy, sentence_accuracy

    df = spark.createDataFrame(
        [(["B", "O"], ["B", "O"]), (["O"], ["B"])],
        "pred_seq array<string>, gold_seq array<string>",
    )
    assert sentence_accuracy(df) == pytest.approx(0.5)
    df2 = spark.createDataFrame([(1, 1), (2, 3), (4, 4)], "pred int, label int")
    assert accuracy(df2) == pytest.approx(2 / 3)


def test_ranking_metrics(spark):
    from kgp.metrics import ranking_metrics

    ranked = spark.createDataFrame(
        [(1, "a", 1), (1, "b", 2), (1, "c", 3), (2, "x", 1), (2, "y", 2)],
        "user long, item string, rank int",
    )
    truth = spark.createDataFrame(
        [(1, "a"), (1, "c"), (1, "z"), (2, "q")], "user long, item string"
    )
    out = {r["user"]: r for r in ranking_metrics(ranked, truth, k=3).collect()}
    u1 = out[1]
    assert u1["precision_at_k"] == pytest.approx(2 / 3)
    assert u1["recall_at_k"] == pytest.approx(2 / 3)
    dcg = 1 / math.log2(2) + 1 / math.log2(4)
    idcg = 1 / math.log2(2) + 1 / math.log2(3) + 1 / math.log2(4)
    assert u1["ndcg_at_k"] == pytest.approx(dcg / idcg)
    assert out[2]["n_hit"] == 0 and out[2]["ndcg_at_k"] == pytest.approx(0.0)


def test_micro_prf_df_long_form(spark):
    """A6 relational form: long-form set tables, global accumulation."""
    from kgp.metrics import micro_prf_df

    pred = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "c")], "s long, id string"
    )
    gold = spark.createDataFrame(
        [(1, "a"), (2, "c"), (2, "d"), (3, "e")], "s long, id string"
    )
    r = micro_prf_df(pred, gold, ["s", "id"]).first()
    assert (r["tp"], r["n_pred"], r["n_true"]) == (2, 3, 4)
    assert r["precision"] == pytest.approx(2 / 3)
    assert r["recall"] == pytest.approx(0.5)


def test_frame_accuracy_df(spark):
    """A8: frame correct iff the span set matches exactly; frames are the
    union of keys on either side; count/label/extra-span mismatches all
    count as wrong."""
    from kgp.metrics import frame_accuracy_df

    pred = spark.createDataFrame(
        [
            ("c", 0, 0, 1, "PER"),          # turn 0: exact match -> correct
            ("c", 1, 0, 1, "PER"),          # turn 1: label flip -> wrong
            ("c", 2, 0, 1, "PER"),          # turn 2: extra pred span -> wrong
            ("c", 2, 2, 3, "ORG"),
            ("c", 4, 0, 1, "LOC"),          # turn 4: pred-only frame -> wrong
        ],
        "conv_id string, turn_idx long, start long, end long, label string",
    )
    gold = spark.createDataFrame(
        [
            ("c", 0, 0, 1, "PER"),
            ("c", 1, 0, 1, "ORG"),
            ("c", 2, 0, 1, "PER"),
            ("c", 3, 0, 1, "PER"),          # turn 3: gold-only frame -> wrong
        ],
        "conv_id string, turn_idx long, start long, end long, label string",
    )
    r = frame_accuracy_df(pred, gold, keys=("conv_id", "turn_idx")).first()
    assert (r["n_frames"], r["n_correct"]) == (5, 1)
    assert r["accuracy"] == pytest.approx(0.2)
