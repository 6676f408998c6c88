"""html_tables edge cases the q171 fixture doesn't reach."""
from __future__ import annotations

from ultraviolet_spark.operators.htmltables import html_tables


def _cells(spark, html):
    df = spark.createDataFrame([(0, html)], "doc_id long, html string")
    return {(r["table_idx"], r["row_idx"], r["col_idx"]): r["cell"]
            for r in html_tables(df).collect()}


def test_multiline_and_empty_cells(spark):
    got = _cells(spark, """
      <table>
        <tr>
          <td>a
b</td><td></td>
        </tr>
      </table>""")
    assert got[(0, 0, 0)] == "a\nb"
    assert got[(0, 0, 1)] == ""


def test_unclosed_table_matches_nothing(spark):
    assert _cells(spark, "<table><tr><td>x</td></tr>") == {}


def test_th_td_mixed_and_attrs(spark):
    got = _cells(
        spark,
        '<table border=1><tr><th scope="col">H</th>'
        "<td data-x='1'>D</td></tr></table>")
    assert got == {(0, 0, 0): "H", (0, 0, 1): "D"}


def test_entity_decode_order(spark):
    got = _cells(spark, "<table><tr><td>&amp;lt; &lt; &#39;q&#39;"
                        " &quot;w&quot; &amp;</td></tr></table>")
    # &amp;lt; decodes exactly one level to &lt;  (not <)
    assert got[(0, 0, 0)] == "&lt; < 'q' \"w\" &"


def test_inner_markup_stripped(spark):
    got = _cells(spark, "<table><tr><td><a href='u'><i>x</i></a> y"
                        "</td></tr></table>")
    assert got[(0, 0, 0)] == "x y"


def test_two_tables_indexing(spark):
    got = _cells(spark, "<table><tr><td>1</td></tr></table>junk"
                        "<table><tr><td>2</td></tr><tr><td>3</td></tr>"
                        "</table>")
    assert got == {(0, 0, 0): "1", (1, 0, 0): "2", (1, 1, 0): "3"}
