"""JusText-style block classification: every context-free branch and
both smoothing rules, plus the strip-and-reassemble convenience op."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.spark

GOOD = ("the data and the index is in the archive with care for all " * 5)
MED = ("the data and the index is in the archive with care for all "
       "now please ok")   # 72 chars: >= length_low, <= length_high


def test_justext_every_branch(spark):
    from pyspark.sql import functions as F

    from ultraviolet_spark.operators.boilerplate import justext_blocks

    rows = [
        (1, 0, "home | products | about | login", 0.8),   # linky -> bad
        (1, 1, "intro", 0.0),                 # short, prev boundary -> bad
        (1, 2, GOOD, 0.0),                    # long stopwordy -> good
        (1, 3, "aside", 0.0),                 # short between goods -> good
        (1, 4, GOOD, 0.0),                    # good
        (1, 5, MED, 0.0),                     # near_good, prev good -> good
        (1, 6, "copyright corporation rights reserved worldwide privacy "
               "terms cookies settings preferences", 0.0),  # no stop -> bad
        (1, 7, MED, 0.0),                     # near_good, both edges bad -> bad
        (1, 8, "tiny link", 0.1),             # short WITH links -> bad
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, block_idx int, block string, link_density double")
    got = {r["block_idx"]: (r["cf_class"], r["class"])
           for r in justext_blocks(df).collect()}
    assert got[0] == ("bad", "bad")
    assert got[1] == ("short", "bad")
    assert got[2] == ("good", "good")
    assert got[3] == ("short", "good")
    assert got[4] == ("good", "good")
    assert got[5] == ("near_good", "good")
    assert got[6] == ("bad", "bad")
    assert got[7] == ("near_good", "bad")
    assert got[8] == ("bad", "bad")
    # feature sanity on the good block
    r = justext_blocks(df).filter(F.col("block_idx") == 2).first()
    assert r["n_chars"] > 200 and r["stop_frac"] >= 0.32


def test_justext_rejects_unknown_lang(spark):
    from ultraviolet_spark.operators.boilerplate import justext_blocks

    df = spark.createDataFrame([(1, 0, "x", 0.0)],
                               "doc_id long, block_idx int, block string, "
                               "link_density double")
    with pytest.raises(ValueError):
        justext_blocks(df, lang="xx")


def test_strip_boilerplate_reassembles_in_order(spark):
    from ultraviolet_spark.operators.boilerplate import strip_boilerplate

    text = "\n".join(["menu menu menu", GOOD, "mid", GOOD, "footer footer"])
    docs = spark.createDataFrame([(1, text), (2, "nav\nfooter\n")],
                                 "doc_id long, text string")
    out = {r["doc_id"]: r["text_content"]
           for r in strip_boilerplate(docs).collect()}
    # kept blocks in original order: good, short-between-goods, good
    assert out[1] == "\n".join([GOOD, "mid", GOOD])
    assert out[2] == ""        # all-boilerplate page survives, empty
