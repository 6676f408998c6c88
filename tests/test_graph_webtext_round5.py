"""Round-5 graph/webtext/ts operators: rich-club, partition
modularity, turning points, heading outline, img alt coverage."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ultraviolet_spark.operators.graph import (
    partition_modularity,
    rich_club,
)
from ultraviolet_spark.operators.htmltables import (
    heading_outline,
    img_alt_coverage,
    link_profile,
    page_weight_profile,
)
from ultraviolet_spark.operators.stats import turning_points_by_key

pytestmark = pytest.mark.usefixtures("spark")


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "src long, dst long")


# -------------------------------------------------------- rich club

def test_rich_club_oligarchy_vs_star(spark):
    """A clique of hubs each with pendant leaves: hubs (degree 4)
    interlink fully, so phi at threshold above leaf degree is 1.0;
    a pure star has NO hub-hub edges at all."""
    # K4 on 0..3 (each hub degree 3+2=5), plus 2 leaves per hub
    clique = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    leaves = [(h, 100 + 2 * h + j) for h in range(4) for j in range(2)]
    got = {r["k"]: r for r in rich_club(
        _edges(spark, clique + leaves), thresholds=[0, 2]).collect()}
    # threshold 2: only the 4 hubs (degree 5) survive; E_k = 6 = C(4,2)
    assert got[2]["n_k"] == 4 and got[2]["e_k"] == 6
    assert got[2]["phi"] == 1.0
    # threshold 0: everyone; phi = 2E/(N(N-1))
    n, e = got[0]["n_k"], got[0]["e_k"]
    assert got[0]["phi"] == pytest.approx(2 * e / (n * (n - 1)), abs=1e-6)
    star = [(0, i) for i in range(1, 9)]
    sg = {r["k"]: r for r in rich_club(
        _edges(spark, star), thresholds=[1]).collect()}
    assert sg[1]["n_k"] == 1 and sg[1]["e_k"] == 0
    assert sg[1]["phi"] is None       # N_k < 2


# ------------------------------------------------------- modularity

def test_modularity_perfect_split_and_reference(spark):
    """Two disconnected triangles, labelled by their own component:
    Q = 1/2 exactly (two communities, no inter-edges, equal halves).
    Merging everything into one community gives Q = 0."""
    tri = [(0, 1), (1, 2), (0, 2), (10, 11), (11, 12), (10, 12)]
    e = _edges(spark, tri)
    parts2 = spark.createDataFrame(
        [(n, "a" if n < 5 else "b") for n in [0, 1, 2, 10, 11, 12]],
        "node long, community string")
    got = partition_modularity(e, parts2).head()
    assert (got["m"], got["n_communities"]) == (6, 2)
    assert got["q_modularity"] == 0.5
    parts1 = spark.createDataFrame(
        [(n, "all") for n in [0, 1, 2, 10, 11, 12]],
        "node long, community string")
    assert partition_modularity(e, parts1).head()["q_modularity"] == 0.0


def test_modularity_unassigned_nodes_are_singletons(spark):
    tri = [(0, 1), (1, 2), (0, 2)]
    e = _edges(spark, tri)
    # only node 0 labelled; 1 and 2 become singletons
    parts = spark.createDataFrame([(0, "a")], "node long, community string")
    got = partition_modularity(e, parts).head()
    assert got["n_communities"] == 3
    # reference: m=3; communities {0}: e=0 d=2; {1}: e=0 d=2; {2}: same
    # Q = sum(4*3*0 - 4)/(4*9) = -12/36
    assert got["q_modularity"] == pytest.approx(-1 / 3, abs=1e-6)


# --------------------------------------------------- turning points

def test_turning_points_alternating_trend_and_reference(spark):
    rows = []
    alt = [float(i % 2) for i in range(30)]          # turns everywhere
    mono = [float(i) for i in range(30)]             # never turns
    for series, k in [(alt, "alt"), (mono, "mono")]:
        rows += [(k, i, i, v) for i, v in enumerate(series)]
    df = spark.createDataFrame(rows, "k string, t long, tb long, v double")
    got = {r["k"]: r for r in turning_points_by_key(
        df, by="k", order_col="t", value_col="v",
        tiebreak_col="tb").collect()}
    assert got["alt"]["turns"] == 28 and got["alt"]["z"] > 4
    assert got["mono"]["turns"] == 0 and got["mono"]["z"] < -4
    # exact reference for the alternating z
    n, t = 30, 28
    import math
    want = (3 * t - 2 * (n - 2)) / (3 * math.sqrt((16 * n - 29) / 90))
    assert got["alt"]["z"] == pytest.approx(want, abs=2e-6)
    # ties with a neighbour are NOT turning points (strict comparisons)
    flat = [("f", i, i, 1.0) for i in range(10)]
    df2 = spark.createDataFrame(flat, "k string, t long, tb long, v double")
    assert turning_points_by_key(
        df2, by="k", order_col="t", value_col="v",
        tiebreak_col="tb").head()["turns"] == 0


# -------------------------------------------------- heading outline

def _pages(spark, rows):
    return spark.createDataFrame(rows, "url string, html string")


def test_heading_outline_skip_and_counts(spark):
    html = ("<h1>T</h1><h2>a</h2><h3>b</h3>"
            "<H3 class='x'>c</H3><h1>z</h1>")
    got = heading_outline(_pages(spark, [("u", html)])).head()
    assert (got["n_headings"], got["n_h1"]) == (5, 2)
    assert got["first_level"] == 1
    assert got["max_skip"] == 1       # 1->2->3->3->1: deepest jump +1 = clean
    skip = heading_outline(_pages(spark, [
        ("u", "<h1>t</h1><h4>deep</h4>")])).head()
    assert skip["max_skip"] == 3
    none = heading_outline(_pages(spark, [("u", "<p>x</p>")])).head()
    assert none["n_headings"] == 0 and none["first_level"] is None
    assert none["max_skip"] is None


# ------------------------------------------------- img alt coverage

def test_img_alt_coverage_variants(spark):
    html = ("<img src='a.jpg' alt='real'>"    # covered
            '<img src="b.jpg">'               # bare
            '<img data-alt="x" src="c.jpg">'  # decoy attr: NOT covered
            '<img src="d.jpg" alt="">')       # empty alt: NOT covered
    got = img_alt_coverage(_pages(spark, [("u", html)])).head()
    assert (got["n_imgs"], got["n_with_alt"]) == (4, 1)
    assert got["coverage"] == 0.25
    empty = img_alt_coverage(_pages(spark, [("u", "<p>t</p>")])).head()
    assert empty["n_imgs"] == 0 and empty["coverage"] is None


def test_link_profile_classification(spark):
    html = ('<a href="/rel">r</a>'
            '<a href="https://me.example/abs">same</a>'
            '<a href="HTTPS://Other.Example/x" rel="nofollow">ext</a>'
            '<a data-href="https://fake.example" href="#f">frag</a>'
            '<a href="mailto:x@y.z">mail</a>')
    got = link_profile(_pages(spark, [
        ("https://me.example/p/1", html)])).head()
    # external: only the Other.Example absolute (case-insensitive
    # scheme+host); mailto/fragment/relative/same-host are internal
    assert (got["n_links"], got["n_internal"],
            got["n_external"], got["n_nofollow"]) == (5, 4, 1, 1)
    none = link_profile(_pages(spark, [
        ("https://me.example/p/2", "<p>no links</p>")])).head()
    assert none["n_links"] == 0 and none["n_external"] == 0


def test_page_weight_profile_counts(spark):
    html = ("<script>12345</script>"      # 8+5+9 = 22
            "<style>abc</style>"          # 7+3+8 = 18
            "<!--xy-->"                   # 4+2+3 = 9
            "<p>body</p>")                # 11
    got = page_weight_profile(_pages(spark, [("u", html)])).head()
    assert (got["total_chars"], got["script_chars"],
            got["style_chars"], got["comment_chars"]) == (60, 22, 18, 9)
    assert got["payload_share"] == pytest.approx(49 / 60, abs=1e-6)
    empty = page_weight_profile(_pages(spark, [("u", "")])).head()
    assert empty["payload_share"] is None
