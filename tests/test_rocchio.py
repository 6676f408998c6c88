"""Rocchio nearest-centroid classifier
(operators/mlfit.rocchio_classify)."""

from __future__ import annotations

import pytest

from ultraviolet_spark.operators.mlfit import rocchio_classify

pytestmark = pytest.mark.usefixtures("spark")


def _mk(spark, rows):
    return spark.createDataFrame(
        [(int(i), lab, [float(v) for v in vec]) for i, lab, vec in rows],
        "vec_id long, label int, embedding array<float>")


def _ref(rows):
    from collections import defaultdict
    snapped = [(i, lab, [round(float(v) * 1e6) for v in vec])
               for i, lab, vec in rows]
    sums = defaultdict(lambda: None)
    counts = defaultdict(int)
    for _, lab, xm in snapped:
        if lab is None:
            continue
        if sums[lab] is None:
            sums[lab] = [0] * len(xm)
        for d, v in enumerate(xm):
            sums[lab][d] += v
        counts[lab] += 1
    cents = {lab: [round(s / counts[lab]) for s in sums[lab]]
             for lab in sums}
    out = {}
    for i, lab, xm in snapped:
        best = None
        for cid in sorted(cents):
            d = sum((a - b) ** 2 for a, b in zip(xm, cents[cid]))
            if best is None or d < best[1]:
                best = (cid, d)
        out[i] = (lab, best[0], round(best[1] / 1e12, 6))
    return out


ROWS = [
    (1, 0, [0.0, 0.1, 0.0]), (2, 0, [0.1, 0.0, 0.1]),
    (3, 1, [1.0, 1.1, 0.9]), (4, 1, [0.9, 1.0, 1.1]),
    (5, 2, [-1.0, -1.0, -1.0]), (6, 2, [-0.9, -1.1, -1.0]),
    (7, None, [1.05, 1.0, 1.0]),        # unlabeled, near class 1
    (8, None, [0.02, 0.05, 0.01]),      # unlabeled, near class 0
]


def test_matches_sequential_reference(spark):
    got = {r["vec_id"]: (r["label"], r["pred"], r["dist2"])
           for r in rocchio_classify(_mk(spark, ROWS), id_col="vec_id",
                                     vec_col="embedding",
                                     label_col="label").collect()}
    assert got == _ref(ROWS)


def test_unlabeled_scored_not_trained(spark):
    got = {r["vec_id"]: r["pred"]
           for r in rocchio_classify(_mk(spark, ROWS), id_col="vec_id",
                                     vec_col="embedding",
                                     label_col="label").collect()}
    assert got[7] == 1 and got[8] == 0
    # adding a far-away unlabeled point must not move any centroid
    noisy = ROWS + [(99, None, [50.0, 50.0, 50.0])]
    got2 = {r["vec_id"]: r["pred"]
            for r in rocchio_classify(
                _mk(spark, noisy), id_col="vec_id",
                vec_col="embedding", label_col="label").collect()}
    assert all(got2[i] == got[i] for i in got)


def test_equidistant_tie_smallest_label(spark):
    rows = [(1, 0, [0.0]), (2, 2, [2.0]), (3, None, [1.0])]
    got = {r["vec_id"]: r["pred"]
           for r in rocchio_classify(_mk(spark, rows), id_col="vec_id",
                                     vec_col="embedding",
                                     label_col="label").collect()}
    assert got[3] == 0


def test_string_labels_native_type(spark):
    """ADVICE r3: non-integer class labels must survive — pred keeps
    the label's native type instead of a hard int cast that NULLed
    string labels."""
    rows = [(1, "cat", [0.0, 0.0]), (2, "cat", [0.2, 0.0]),
            (3, "dog", [10.0, 10.0]), (4, "dog", [9.8, 10.0]),
            (5, None, [0.1, 0.1]), (6, None, [9.9, 9.9])]
    df = spark.createDataFrame(
        rows, "vec_id long, label string, embedding array<float>")
    got = {r["vec_id"]: r for r in rocchio_classify(
        df, id_col="vec_id", vec_col="embedding",
        label_col="label").collect()}
    assert got[5]["pred"] == "cat" and got[6]["pred"] == "dog"
    assert all(got[i]["pred"] is not None for i in got)
    # tie-break still "smallest label" lexicographically: a point
    # equidistant from both centroids goes to 'cat' < 'dog'
    mid_rows = rows + [(7, None, [5.0, 5.0])]
    df2 = spark.createDataFrame(
        mid_rows, "vec_id long, label string, embedding array<float>")
    got2 = {r["vec_id"]: r for r in rocchio_classify(
        df2, id_col="vec_id", vec_col="embedding",
        label_col="label").collect()}
    assert got2[7]["pred"] == "cat"
