"""extract_jsonld: multi-block pages, attribute/case/newline noise on
the script tag, junk JSON surfacing as NULL variant rows, non-ld
scripts ignored, typed variant path extraction."""

from __future__ import annotations

from pyspark.sql import functions as F

from ultraviolet_spark.operators.htmltables import extract_jsonld


def _pages(spark):
    return spark.createDataFrame([
        ("a", '<html><script type="application/ld+json">'
              '{"@type": "Product", "price": 7}</script></html>'),
        # two blocks, second with upper-case tag
        ("b", '<script type="application/ld+json">{"@type":"A"}</script>'
              '<SCRIPT TYPE="application/ld+json">{"@type":"B"}</SCRIPT>'),
        # attribute noise + newlines inside the block
        ("c", '<script async type = "application/ld+json" data-x="1">\n'
              '{"@type":\n "Article"}\n</script>'),
        # junk JSON → NULL variant row (page survives)
        ("d", '<script type="application/ld+json">{"oops": </script>'),
        # plain JS script must NOT be extracted
        ("e", '<script type="text/javascript">var x = 1;</script>'),
        ("f", "<html>no scripts at all</html>"),
    ], "url string, html string")


def test_block_extraction_and_noise(spark):
    rows = extract_jsonld(_pages(spark)).collect()
    by_id = {}
    for r in rows:
        by_id.setdefault(r.id, []).append(r)
    assert set(by_id) == {"a", "b", "c", "d"}   # e, f: no rows
    assert len(by_id["b"]) == 2
    assert [r.block_no for r in sorted(by_id["b"],
                                       key=lambda r: r.block_no)] == [0, 1]
    assert len(by_id["c"]) == 1


def test_typed_paths_and_junk_null(spark):
    out = extract_jsonld(_pages(spark)).select(
        "id", "block_no",
        F.expr("cast(try_variant_get(ld, '$[\"@type\"]') as string)")
         .alias("t"),
        F.expr("cast(try_variant_get(ld, '$.price') as bigint)")
         .alias("price"),
        F.col("ld").isNull().alias("junk"))
    got = {(r.id, r.block_no): (r.t, r.price, r.junk)
           for r in out.collect()}
    assert got[("a", 0)] == ("Product", 7, False)
    assert got[("b", 0)] == ("A", None, False)
    assert got[("b", 1)] == ("B", None, False)
    assert got[("c", 0)] == ("Article", None, False)
    assert got[("d", 0)] == (None, None, True)   # junk parses to NULL


def test_pure_catalyst_plan(spark):
    out = extract_jsonld(_pages(spark))
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted")
    # no UDF of any kind (the createDataFrame source scan itself
    # mentions Python — that's the test fixture, not the operator)
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    assert "MapInPandas" not in plan
    assert ") Exchange" not in plan        # scan-stage only
