"""Meta-tag extraction (operators/htmltables.meta_tags)."""

from __future__ import annotations

import pytest

from ultraviolet_spark.operators.htmltables import meta_tags

pytestmark = pytest.mark.usefixtures("spark")


def _pages(spark, rows):
    return spark.createDataFrame(rows, "url string, html string")


def test_variants_order_quotes_entities(spark):
    html = (
        '<head><meta charset="utf-8">'
        '<meta property="og:title" content="A &amp;&lt;B&gt;"/>'
        "<meta content='x.jpg' property='og:image'>"
        '<meta NAME="Robots" Content="noindex, nofollow">'
        '<meta http-equiv="refresh" content="30">'
        '<meta property="og:empty" content="">'
        "</head>")
    got = (meta_tags(_pages(spark, [("u1", html)]))
           .orderBy("tag_no").collect())
    assert [(r["tag_no"], r["kind"], r["key"], r["content"])
            for r in got] == [
        (1, "property", "og:title", "A &<B>"),   # entity-decoded
        (2, "property", "og:image", "x.jpg"),    # swapped attr order
        (3, "name", "robots", "noindex, nofollow"),  # case-folded
    ]
    # charset (slot 0), http-equiv (slot 4) and empty-content (slot 5)
    # are dropped but still occupy tag slots


def test_repeated_keys_kept_in_order(spark):
    html = ('<meta property="og:image" content="a.jpg">'
            '<meta property="og:image" content="b.jpg">')
    got = (meta_tags(_pages(spark, [("u", html)]))
           .orderBy("tag_no").collect())
    assert [r["content"] for r in got] == ["a.jpg", "b.jpg"]
    assert [r["tag_no"] for r in got] == [0, 1]


def test_data_star_attributes_are_not_keys(spark):
    """ADVICE r4: a bare \\b boundary matched the 'name' inside
    data-name= (word boundary after '-'), emitting a spurious
    (kind='name', key=...) row for tags like
    <meta data-name="x" content="y">.  Pin: data-name / data-property /
    data-content never bind; a REAL key alongside them still does."""
    html = (
        '<meta data-name="x" content="y">'            # no real key → drop
        '<meta data-property="p" content="q">'        # no real key → drop
        '<meta name="author" data-content="z" content="me">'
        '<meta data-name="decoy" property="og:type" content="article">')
    got = (meta_tags(_pages(spark, [("u", html)]))
           .orderBy("tag_no").collect())
    assert [(r["tag_no"], r["kind"], r["key"], r["content"])
            for r in got] == [
        (2, "name", "author", "me"),
        (3, "property", "og:type", "article"),
    ]


def test_no_metas_no_rows(spark):
    got = meta_tags(_pages(spark, [
        ("u", "<p>meta nothing here content=\"x\"</p>")])).collect()
    assert got == []
