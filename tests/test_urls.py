"""URL operators: host extraction, normalization, registrable domain,
domain rollups."""

from __future__ import annotations

from ultraviolet_spark.operators.urls import domain_stats, with_url_parts


def _parts(spark, urls):
    df = spark.createDataFrame([(i, u) for i, u in enumerate(urls)],
                               "doc_id long, url string")
    return {r["url"]: r for r in with_url_parts(df).collect()}


def test_url_parts_cases(spark):
    got = _parts(spark, [
        "https://WWW.Example.COM/a/b?utm_source=x&q=1&fbclid=y#sec",
        "http://sub.shop.co.uk/p",
        "https://example.com/only?utm_campaign=z",
        "https://example.com",
        "http://localhost/x",
    ])
    r = got["https://WWW.Example.COM/a/b?utm_source=x&q=1&fbclid=y#sec"]
    assert r["host"] == "www.example.com"
    assert r["url_norm"] == "https://www.example.com/a/b?q=1"
    assert r["domain"] == "example.com"

    r = got["http://sub.shop.co.uk/p"]
    assert r["domain"] == "shop.co.uk"
    assert r["url_norm"] == "http://sub.shop.co.uk/p"

    # query vanishes entirely when only tracking params remain
    r = got["https://example.com/only?utm_campaign=z"]
    assert r["url_norm"] == "https://example.com/only"

    # no path at all
    r = got["https://example.com"]
    assert r["url_norm"] == "https://example.com"

    # single-label host is its own domain
    assert got["http://localhost/x"]["domain"] == "localhost"


def test_domain_stats_counts_and_blocklist(spark):
    urls = [
        "https://a.com/1", "https://a.com/1?utm_source=x",  # same after norm
        "https://a.com/2",
        "https://www.b.co.uk/x", "https://b.co.uk/x",       # same domain
    ]
    df = spark.createDataFrame([(i, u) for i, u in enumerate(urls)],
                               "doc_id long, url string")
    out = {r["domain"]: r for r in
           domain_stats(df, blocklist=["b.co.uk"]).collect()}
    assert out["a.com"]["n_pages"] == 3
    assert out["a.com"]["n_urls"] == 2          # tracking dup collapsed
    assert not out["a.com"]["blocked"]
    assert out["b.co.uk"]["n_pages"] == 2
    assert out["b.co.uk"]["n_urls"] == 2        # www. kept in url_norm
    assert out["b.co.uk"]["blocked"]


def test_extract_outlinks_literals(spark):
    from ultraviolet_spark.operators.urls import extract_outlinks

    rows = [
        (1, '<a href="https://a.com/x">one</a> <a href="/rel">two</a>'
            ' <a href="http://b.co.uk/y?z=1">three</a>'),
        (2, 'no links here'),
        (3, '<a href="ftp://files.example.com/f">ftp skipped</a>'
            ' <A HREF="https://case.com/">attr case not matched</A>'),
    ]
    df = spark.createDataFrame(rows, "doc_id long, html string")
    got = {(r["doc_id"], r["link"]) for r in extract_outlinks(df).collect()}
    # absolute http(s) only; lowercase href attribute form only
    assert got == {(1, "https://a.com/x"), (1, "http://b.co.uk/y?z=1")}
    every = {(r["doc_id"], r["link"]) for r in
             extract_outlinks(df, absolute_only=False).collect()}
    assert (1, "/rel") in every and (3, "ftp://files.example.com/f") in every


def test_extract_anchors_pairs_and_filtering(spark):
    from ultraviolet_spark.operators.urls import extract_anchors

    html = ('<p><a href="https://a.com/x">First &amp; best</a>'
            '<a href="/rel">rel</a>'
            '<a class="z" href="http://b.org/y" id="k">  two\n words </a>'
            '<a href="https://c.net/z"></a></p>')
    df = spark.createDataFrame([(1, html)], "doc_id long, html string")
    rows = [(r["link"], r["anchor"]) for r in
            extract_anchors(df).orderBy("link").collect()]
    # positional zip keeps (href, text) aligned; entity decoded,
    # whitespace collapsed, empty anchor stays empty, /rel excluded
    assert rows == [("http://b.org/y", "two words"),
                    ("https://a.com/x", "First & best"),
                    ("https://c.net/z", "")]
    raw = [(r["link"], r["anchor"]) for r in
           extract_anchors(df, absolute_only=False,
                           decode_entities=False).collect()]
    assert ("/rel", "rel") in raw
    assert ("https://a.com/x", "First &amp; best") in raw


def test_extract_title_null_vs_empty(spark):
    from ultraviolet_spark.operators.urls import extract_title

    df = spark.createDataFrame(
        [(1, "<html><TITLE> A &amp; B </TITLE></html>"),
         (2, "<html><title></title></html>"),
         (3, "<html><body>no title</body></html>")],
        "doc_id long, html string")
    rows = {r["doc_id"]: r["title"] for r in extract_title(df).collect()}
    assert rows == {1: "A & B", 2: "", 3: None}


def test_blocklist_filter_semantics(spark):
    from ultraviolet_spark.operators.urls import blocklist_filter

    pages = spark.createDataFrame(
        [(1, "https://WWW.Bad.co.uk/x"),      # domain-blocked (case)
         (2, "https://sub.bad.co.uk/y"),      # subdomain -> same reg dom
         (3, "https://good.org/ads/banner"),  # pattern-blocked
         (4, "https://good.org/article"),     # clean
         (5, "https://badco.uk.evil.com/z")], # suffix spoof -> clean
        "doc_id long, url string")
    bl = spark.createDataFrame([("bad.co.uk",)], "domain string")
    rows = {r["doc_id"]: (r["blocked_domain"], r["blocked_pattern"],
                          r["keep"]) for r in
            blocklist_filter(pages, bl, url_patterns=["/ads/"]).collect()}
    assert rows == {1: (True, False, False), 2: (True, False, False),
                    3: (False, True, False), 4: (False, False, True),
                    5: (False, False, True)}


def test_blocklist_filter_plan_broadcasts(spark):
    """The domain check must be a broadcast join (never a shuffle of
    the pages side) — the 100 TB shape."""
    from ultraviolet_spark.operators.urls import blocklist_filter

    pages = spark.createDataFrame(
        [(1, "https://a.org/x")], "doc_id long, url string")
    bl = spark.createDataFrame([("b.org",)], "domain string")
    plan = (blocklist_filter(pages, bl)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


# --------------------------------------------------- RFC 3986 canonical form

def test_canonical_url_rfc_cases(spark):
    from pyspark.sql import functions as F

    from ultraviolet_spark.operators.urls import canonical_url

    cases = {
        # scheme/host case + default port + tracking + dot segments
        "HTTP://WWW.Ex.COM:80/a/b/../c/./d?utm_source=x&id=1":
            "http://www.ex.com/a/c/d?id=1",
        # unreserved escapes decode; reserved keep uppercased hex
        "https://ex.com:443/%7euser/%41/%2fq%3f": "https://ex.com/~user/A/%2Fq%3F",
        # non-default port kept; empty segments kept
        "https://ex.com:8080/a//b/": "https://ex.com:8080/a//b/",
        # leading .. clamps at root; trailing . keeps the slash
        "https://ex.com/../top/.": "https://ex.com/top/",
        "https://ex.com/a/..": "https://ex.com/",
        # empty path -> '/'
        "http://ex.com": "http://ex.com/",
        # userinfo stripped from the key
        "http://u:pw@Ex.com:81/x": "http://ex.com:81/x",
        # junk -> NULL, never a crash
        "http://ex.com/%zz": None,
        "not a url at all": None,
    }
    df = spark.createDataFrame([(u,) for u in cases], "url string")
    got = {r["url"]: r["c"] for r in
           df.select("url", canonical_url(F.col("url")).alias("c")).collect()}
    for u, want in cases.items():
        assert got[u] == want, f"{u!r}: {got[u]!r} != {want!r}"


def test_canonical_url_idempotent(spark):
    from pyspark.sql import functions as F

    from ultraviolet_spark.operators.urls import canonical_url

    urls = ["HTTP://A.COM:80/x/../y/%41?utm_campaign=z&q=1#f",
            "https://b.co.uk/%2f/./p//", "http://c.com"]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    once = df.select(canonical_url(F.col("url")).alias("c"))
    twice = once.select(canonical_url(F.col("c")).alias("c"))
    assert [r["c"] for r in once.collect()] == \
           [r["c"] for r in twice.collect()]


# ---------------------------------------------------- bitext mining

def test_bitext_candidates_pairs_and_ratio_gate(spark):
    from ultraviolet_spark.operators.urls import bitext_candidates
    rows = [
        (1, "https://a.com/en/about", "en", "x" * 100),
        (2, "https://a.com/de/about", "de", "y" * 80),   # ratio 0.8 -> in
        (3, "https://a.com/en/news",  "en", "x" * 100),
        (4, "https://a.com/de/news",  "de", "y" * 20),   # ratio 0.2 -> out
        (5, "https://a.com/fr/about", "fr", "z" * 90),   # wrong tgt lang
        (6, "https://b.com/de/about", "de", "y" * 100),  # different stem
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string, "
                                     "lang string, text string")
    got = [(r["src_id"], r["tgt_id"], r["len_ratio"])
           for r in bitext_candidates(df).collect()]
    assert got == [(1, 2, 0.8)]


def test_bitext_boundary_ratio_exactly_half_included(spark):
    from ultraviolet_spark.operators.urls import bitext_candidates
    rows = [(1, "https://a.com/en/p", "en", "x" * 50),
            (2, "https://a.com/de/p", "de", "y" * 100)]
    df = spark.createDataFrame(rows, "doc_id long, url string, "
                                     "lang string, text string")
    assert bitext_candidates(df).count() == 1


# ---------------------------------------------------------------------------
# rel=canonical + hreflang
# ---------------------------------------------------------------------------

def test_rel_canonical_resolution_rules(spark):
    from ultraviolet_spark.operators.urls import extract_rel_canonical
    rows = [
        # absolute, rel-first
        (0, "https://a.com/p0",
         '<link rel="canonical" href="https://a.com/base">'),
        # absolute, href-first + mixed case
        (1, "https://a.com/p1",
         '<link href="https://a.com/base" REL="Canonical">'),
        # root-relative resolves against own origin
        (2, "https://b.com/deep/p2", '<link rel="canonical" href="/base">'),
        # protocol-relative is ignored -> self
        (3, "https://c.com/p3", '<link rel="canonical" href="//x.com/y">'),
        # dotted-relative ignored -> self
        (4, "https://c.com/p4", '<link rel="canonical" href="../y">'),
        # stylesheet decoy only -> self
        (5, "https://c.com/p5", '<link rel="stylesheet" href="/css.css">'),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string, html string")
    got = {r["doc_id"]: r.asDict()
           for r in extract_rel_canonical(df).collect()}
    assert got[0]["canonical_target"] == "https://a.com/base"
    assert got[1]["canonical_target"] == "https://a.com/base"
    assert got[2]["canonical_target"] == "https://b.com/base"
    for i in (3, 4, 5):
        assert got[i]["canonical_target"] == f"https://c.com/p{i}", i
        assert got[i]["has_canonical"] is False, i


def test_canonical_groups_keeper_election(spark):
    from ultraviolet_spark.operators.urls import canonical_groups
    tag = '<link rel="canonical" href="https://a.com/base">'
    rows = [
        # group where the canonical page itself was crawled
        (0, "https://a.com/base", tag),
        (1, "https://a.com/dup1", tag),
        (2, "https://a.com/dup2", tag),
        # group whose target was never crawled: min-url keeper
        (3, "https://a.com/m2",
         '<link rel="canonical" href="https://a.com/missing">'),
        (4, "https://a.com/m1",
         '<link rel="canonical" href="https://a.com/missing">'),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string, html string")
    got = {r["doc_id"]: r.asDict() for r in canonical_groups(df).collect()}
    assert [got[i]["is_keeper"] for i in range(5)] == [
        True, False, False, False, True]
    assert got[0]["group_size"] == 3 and got[3]["group_size"] == 2


def test_hreflang_positional_zip_and_cluster_key(spark):
    from ultraviolet_spark.operators.urls import extract_hreflang
    html = ('<html><head>'
            '<link rel="alternate" hreflang="en" href="https://e.com/en">'
            '<link rel="alternate" hreflang="de" href="https://e.com/de">'
            '<link rel="stylesheet" href="/css.css">'
            '</head></html>')
    df = spark.createDataFrame([(7, html), (8, "<html></html>")],
                               "doc_id long, html string")
    rows = extract_hreflang(df).collect()
    got = {(r["doc_id"], r["hreflang"]): r.asDict() for r in rows}
    assert got[(7, "en")]["href"] == "https://e.com/en"
    assert got[(7, "de")]["href"] == "https://e.com/de"
    # cluster key = array_min over the page's alternates, shared by both
    assert {r["cluster_key"] for r in rows} == {"https://e.com/de"}
    # page with no alternates emits no rows
    assert all(r["doc_id"] == 7 for r in rows)


def test_discover_tracking_params(spark):
    from ultraviolet_spark.operators.urls import discover_tracking_params

    rows = [
        # 'clid' unique per occurrence across 3 hosts → flagged
        ("https://a.com/x?clid=111&page=1",),
        ("https://b.com/x?clid=222&page=1",),
        ("https://c.com/x?clid=333&page=2",),
        # 'sess' unique values but single host → NOT flagged
        ("https://a.com/y?sess=s1",),
        ("https://a.com/z?sess=s2",),
        ("https://a.com/w?sess=s3",),
        # no query at all → contributes nothing
        ("https://d.com/plain",),
        # value-less param and empty segment tolerated
        ("https://b.com/q?flash&&clid=444",),
    ]
    df = spark.createDataFrame(rows, "url string")
    got = {r.param: (r.occurrences, r.value_ndv, r.n_domains, r.flagged)
           for r in discover_tracking_params(df).collect()}
    assert got["clid"] == (4, 4, 3, True)
    assert got["page"] == (3, 2, 3, False)   # 2 ndv < 0.8·3 occurrences
    assert got["sess"] == (3, 3, 1, False)   # unique values, one host
    assert got["flash"] == (1, 1, 1, False)
    assert set(got) == {"clid", "page", "sess", "flash"}


def test_discover_tracking_params_boundary(spark):
    from ultraviolet_spark.operators.urls import discover_tracking_params

    # exactly ndv·1e6 == frac·occ at 4/5 = 0.8 → flagged (closed bound)
    rows = [(f"https://h{i % 3}.com/?k=v{i if i < 4 else 0}",)
            for i in range(5)]
    df = spark.createDataFrame(rows, "url string")
    r, = discover_tracking_params(df, ndv_frac=0.8).collect()
    assert (r.occurrences, r.value_ndv) == (5, 4) and r.flagged


def test_url_templates_normalization_rules(spark):
    from ultraviolet_spark.operators.urls import url_templates
    urls = [
        # hex rule fires BEFORE digits: 8+ hex chars → {h}, not {n}{…}
        "https://a.com/s/deadbeef01/x",
        "https://a.com/s/cafebabe99/x",
        # pure 8+-digit run is consumed by the hex rule too (documented)
        "https://a.com/id/12345678",
        # short digit runs → {n}
        "https://a.com/p/42", "https://a.com/p/7",
        # query string collapses to a bare '?'
        "https://a.com/list?page=3&sid=abc",
        "https://a.com/list?page=9",
        # no volatile tokens: template == url
        "https://a.com/about",
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = {r["template"]: (r["n_urls"], r["n_distinct"], r["example"])
           for r in url_templates(df, trap_ndv=2).collect()}
    assert got["https://a.com/s/{h}/x"] == (
        2, 2, "https://a.com/s/cafebabe99/x")
    assert got["https://a.com/id/{h}"] == (1, 1, "https://a.com/id/12345678")
    assert got["https://a.com/p/{n}"] == (2, 2, "https://a.com/p/42")
    assert got["https://a.com/list?"][0] == 2
    assert got["https://a.com/about"] == (1, 1, "https://a.com/about")


def test_url_templates_trap_flag_boundary(spark):
    from ultraviolet_spark.operators.urls import url_templates
    rows = ([(f"https://t.com/cal/{i}",) for i in range(100)]     # at ndv
            + [(f"https://t.com/p/{i % 3}",) for i in range(100)])  # bounded
    df = spark.createDataFrame(rows, "url string")
    got = {r["template"]: r for r in url_templates(
        df, trap_ndv=100).collect()}
    assert got["https://t.com/cal/{n}"]["is_trap"] is True   # ndv == 100
    assert got["https://t.com/cal/{n}"]["n_distinct"] == 100
    assert got["https://t.com/p/{n}"]["is_trap"] is False    # ndv == 3
    assert got["https://t.com/p/{n}"]["n_urls"] == 100
