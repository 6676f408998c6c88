"""DOM depth profile (operators/htmltables.dom_depth_profile)."""

from __future__ import annotations

import pytest

from ultraviolet_spark.operators.htmltables import dom_depth_profile

pytestmark = pytest.mark.usefixtures("spark")


def _pages(spark, rows):
    return spark.createDataFrame(rows, "url string, html string")


def _got(spark, html):
    return dom_depth_profile(_pages(spark, [("u", html)])).head()


def test_nesting_voids_and_selfclosed(spark):
    r = _got(spark, '<html><body><div><p>x<br><img src="a"/></p>'
                    "</div></body></html>")
    # html>body>div>p = depth 4; br and img are depth-neutral
    assert (r["n_tags"], r["max_depth"], r["end_balance"]) == (10, 4, 0)


def test_stray_close_goes_negative_and_unbalanced_open(spark):
    stray = _got(spark, "<div>x</div></div>")
    assert stray["end_balance"] == -1
    unclosed = _got(spark, "<div><div>x</div>")
    assert unclosed["end_balance"] == 1 and unclosed["max_depth"] == 2


def test_comments_doctype_and_empty(spark):
    r = _got(spark, "<!DOCTYPE html><!-- note --><p>x</p>")
    # doctype/comment tokens classify as depth-neutral but count as
    # tag tokens in the walk
    assert r["max_depth"] == 1 and r["end_balance"] == 0
    empty = _got(spark, "no tags at all")
    assert (empty["n_tags"], empty["max_depth"],
            empty["end_balance"]) == (0, 0, 0)
