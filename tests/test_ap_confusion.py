"""Average precision + confusion report
(operators/evalmetrics.average_precision / confusion_report)."""

from __future__ import annotations

import math

import pytest

from ultraviolet_spark.operators.evalmetrics import (
    average_precision,
    confusion_report,
)

pytestmark = pytest.mark.usefixtures("spark")


def _mk_ap(spark, rows):
    return spark.createDataFrame(
        [(int(i), int(s), int(y)) for i, s, y in rows],
        "id long, s long, y int")


def _ref_ap(rows):
    ordered = sorted(rows, key=lambda r: (-r[1], r[0]))
    cp, s, npos = 0, 0, 0
    for k, (_, _, y) in enumerate(ordered, start=1):
        cp += y
        if y:
            npos += 1
            s += round(cp * 1e6 / k)
    return round(s / npos / 1e6, 6) if npos else None


def test_ap_matches_sequential_reference(spark):
    rows = [(i, (i * 37) % 19, 1 if (i * 7) % 3 == 0 else 0)
            for i in range(120)]
    got = average_precision(_mk_ap(spark, rows), score_col="s",
                            label_col="y", id_col="id").head()
    assert got["ap"] == _ref_ap(rows)
    assert got["n"] == 120


def test_ap_perfect_and_inverted_ranking(spark):
    rows = [(i, 100 - i, 1 if i < 5 else 0) for i in range(20)]
    got = average_precision(_mk_ap(spark, rows), score_col="s",
                            label_col="y", id_col="id").head()
    assert got["ap"] == 1.0
    inv = [(i, i, y) for i, _, y in rows]
    got = average_precision(_mk_ap(spark, inv), score_col="s",
                            label_col="y", id_col="id").head()
    assert got["ap"] == _ref_ap(inv) < 0.3


def test_ap_punishes_imbalance_auc_shrugs_at(spark):
    # 5 positives at ranks 2,4,6,8,10 among 200: AUC stays high
    # (most negatives are below), AP collapses
    rows = []
    for i in range(200):
        s = 200 - i
        y = 1 if i in (1, 3, 5, 7, 9) else 0
        rows.append((i, s, y))
    got = average_precision(_mk_ap(spark, rows), score_col="s",
                            label_col="y", id_col="id").head()
    assert got["ap"] == _ref_ap(rows)
    assert got["ap"] < 0.6


def test_ap_no_positives_null(spark):
    rows = [(i, i, 0) for i in range(10)]
    got = average_precision(_mk_ap(spark, rows), score_col="s",
                            label_col="y", id_col="id").head()
    assert got["ap"] is None and got["n_pos"] == 0


def _mk_cr(spark, tp, fp, fn, tn):
    rows = ([(True, True)] * tp + [(True, False)] * fp
            + [(False, True)] * fn + [(False, False)] * tn)
    return spark.createDataFrame(rows, "p boolean, l boolean")


def test_confusion_reference(spark):
    tp, fp, fn, tn = 30, 10, 5, 55
    got = confusion_report(_mk_cr(spark, tp, fp, fn, tn),
                           pred_col="p", label_col="l").head()
    assert (got["tp"], got["fp"], got["fn"], got["tn"]) == (30, 10, 5, 55)
    assert got["accuracy"] == round((tp + tn) / 100, 6)
    assert got["precision_"] == round(tp / (tp + fp), 6)
    assert got["recall"] == round(tp / (tp + fn), 6)
    assert got["f1"] == round(2 * tp / (2 * tp + fp + fn), 6)
    mcc = (tp * tn - fp * fn) / math.sqrt(
        (tp + fp) * (tp + fn) * (tn + fp) * (tn + fn))
    assert got["mcc"] == round(mcc, 6)


def test_all_negative_classifier_mcc_zero_accuracy_vacuous(spark):
    # 99 negatives, 1 positive, classifier predicts all-negative:
    # accuracy 0.99 reads great, MCC is NULL (a degenerate margin) —
    # and the near-degenerate variant pins MCC ≈ 0
    got = confusion_report(_mk_cr(spark, 0, 0, 1, 99),
                           pred_col="p", label_col="l").head()
    assert got["accuracy"] == 0.99
    assert got["mcc"] is None          # tp+fp = 0 → undefined margin
    # one lucky positive prediction on a coin-flip column
    got = confusion_report(_mk_cr(spark, 1, 1, 1, 97),
                           pred_col="p", label_col="l").head()
    assert abs(got["mcc"]) < 0.6


def test_confusion_perfect_classifier(spark):
    got = confusion_report(_mk_cr(spark, 40, 0, 0, 60),
                           pred_col="p", label_col="l").head()
    assert got["f1"] == 1.0 and got["mcc"] == 1.0
