"""Selection gains profile (operators/corpus.selection_gains)."""

from __future__ import annotations

import pytest

from ultraviolet_spark.operators.corpus import selection_gains

pytestmark = pytest.mark.usefixtures("spark")


def _mk(spark, rows):
    return spark.createDataFrame(
        [(int(s), int(w)) for s, w in rows], "score_micro long, w long")


def test_cumulative_from_top_and_completion(spark):
    rows = [(950_000, 100), (910_000, 50),    # band 9
            (450_000, 10),                     # band 4
            (50_000, 1), (20_000, 2)]          # band 0
    got = {r["band"]: r for r in selection_gains(
        _mk(spark, rows), score_micro_col="score_micro",
        weight_col="w", bins=10).collect()}
    assert len(got) == 10                      # empty bands completed
    assert got[9]["n_docs"] == 2 and got[9]["cum_docs"] == 2
    assert got[9]["cum_weight"] == 150.0
    assert got[4]["cum_docs"] == 3 and got[4]["cum_weight"] == 160.0
    assert got[0]["cum_docs"] == 5 and got[0]["frac_docs"] == 1.0
    assert got[0]["frac_weight"] == 1.0
    assert got[5]["n_docs"] == 0 and got[5]["cum_docs"] == 2
    # the gains story: top band alone holds 150/163 of the weight
    assert got[9]["frac_weight"] == round(150 / 163, 6)


def test_band_edges(spark):
    # score exactly at a band boundary goes UP (floor), 999999 capped
    rows = [(100_000, 1), (99_999, 1), (999_999, 1)]
    got = {r["band"]: r["n_docs"] for r in selection_gains(
        _mk(spark, rows), score_micro_col="score_micro",
        weight_col="w", bins=10).collect()}
    assert got[1] == 1 and got[0] == 1 and got[9] == 1
