"""Chao1 + Good-Turing (operators/textstats.vocab_richness)."""

from __future__ import annotations

import pytest

from ultraviolet_spark.operators.textstats import vocab_richness

pytestmark = pytest.mark.usefixtures("spark")


def _mk(spark, texts):
    return spark.createDataFrame([(t,) for t in texts], "text string")


def test_known_frequency_profile(spark):
    # tokens: a x4, b x2, c x1, d x1  -> V=4 N=8 f1=2 f2=1
    got = vocab_richness(_mk(spark, ["a a b c", "a a b d"])).head()
    assert (got["v_obs"], got["n_tokens"], got["f1"],
            got["f2"]) == (4, 8, 2, 1)
    assert got["chao1"] == 4 + 2 * 2 / 2      # 6.0
    assert got["gt_p0"] == 0.25


def test_f2_zero_bias_corrected_form(spark):
    # a x3, b c d singletons: f2 = 0 -> V + f1(f1-1)/2
    got = vocab_richness(_mk(spark, ["a a a b c d"])).head()
    assert got["f2"] == 0
    assert got["chao1"] == 4 + 3 * 2 / 2      # 7.0


def test_closed_vocabulary_estimates_itself(spark):
    # every type seen many times: no singletons -> chao1 = V, P0 = 0
    got = vocab_richness(_mk(spark, ["x y z"] * 10)).head()
    assert got["chao1"] == got["v_obs"] == 3
    assert got["gt_p0"] == 0.0
