"""Structured-data extraction from HTML tables — the web-table mining
step (WebTables / WDC corpus style): every ``<table>`` becomes
``(doc_id, table_idx, row_idx, col_idx, cell)`` rows with tags stripped
and the five core entities decoded.

Pure Catalyst: three chained ``regexp_extract_all`` + ``posexplode``
stages (table → tr → td/th), then tag-strip + entity decode as nested
``replace``.  DOTALL patterns, non-greedy bodies; NESTED tables are out
of scope (the inner table's markup appears inside the outer cell's raw
text — documented, and the q171 fixture synthesizes flat tables, which
is what machine-generated web tables overwhelmingly are).  Entity order
matters: ``&lt;/&gt;/&quot;/&#39;`` decode BEFORE ``&amp;`` so
double-escaped text (``&amp;lt;``) decodes one level exactly, matching
the kernel's sequential decoder semantics.

Scale notes: per-row scan-stage work, zero shuffles; the explode chain
multiplies rows by actual cell count only (no quadratic blowup — each
stage's regex consumes its slice of the document once).
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

_TABLE = r"(?s)<table[^>]*>(.*?)</table>"
_TR = r"(?s)<tr[^>]*>(.*?)</tr>"
_CELL = r"(?s)<t[dh][^>]*>(.*?)</t[dh]>"


def _decode_cell(c: Column) -> Column:
    c = F.regexp_replace(c, r"<[^>]*>", "")  # strip residual tags
    for ent, ch in (("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
                    ("&#39;", "'"), ("&amp;", "&")):  # &amp; LAST
        c = F.replace(c, F.lit(ent), F.lit(ch))
    return c


def html_tables(df: DataFrame, *, html_col: str = "html",
                id_col: str = "doc_id") -> DataFrame:
    """Explode every table cell of every document (see module
    docstring).  Indices are 0-based in document order."""
    t = (df.select(F.col(id_col).alias("doc_id"),
                   F.posexplode(F.regexp_extract_all(
                       F.col(html_col).cast("string"), F.lit(_TABLE),
                       F.lit(1))).alias("table_idx", "__t")))
    r = t.select("doc_id", "table_idx",
                 F.posexplode(F.regexp_extract_all(
                     "__t", F.lit(_TR), F.lit(1))).alias("row_idx", "__r"))
    c = r.select("doc_id", "table_idx", "row_idx",
                 F.posexplode(F.regexp_extract_all(
                     "__r", F.lit(_CELL), F.lit(1))).alias("col_idx", "__c"))
    return c.select("doc_id", "table_idx", "row_idx", "col_idx",
                    _decode_cell(F.col("__c")).alias("cell"))


def extract_jsonld(pages: DataFrame, *, html_col: str = "html",
                   id_col: str = "url") -> DataFrame:
    """Extract schema.org JSON-LD blocks (``<script
    type="application/ld+json">``) from raw HTML — the structured-
    metadata layer (Product/Article/Organization cards) that search
    and KG pipelines mine from a crawl.

    Returns one row per block: ``(id, block_no, ld)`` where ``ld`` is
    the open VARIANT parse of the block (``try_parse_json`` — a junk
    block yields a NULL variant row rather than killing the page; the
    caller can count them).  Typed fields come off via
    ``try_variant_get`` paths, so no struct schema is ever declared —
    schema.org vocabularies are open-ended by design.

    Pure Catalyst end-to-end: regexp_extract_all over the HTML (the
    script-tag match is case-insensitive, dot-matches-newline, and
    tolerates extra attributes on the tag), posexplode, try_parse_json.
    Scale: scan-stage only — no shuffle, no UDF; VARIANT shreds
    columnar in parquet when persisted."""
    pat = (r'(?is)<script[^>]*type\s*=\s*["\x27]application/ld\+json'
           r'["\x27][^>]*>(.*?)</script>')
    blocks = F.regexp_extract_all(F.col(html_col), F.lit(pat), 1)
    return (pages
            .select(F.col(id_col).alias("id"),
                    F.posexplode(blocks).alias("block_no", "__raw"))
            .select("id", F.col("block_no").cast("int").alias("block_no"),
                    F.expr("try_parse_json(__raw)").alias("ld")))


def meta_tags(pages: DataFrame, *, html_col: str = "html",
              id_col: str = "url") -> DataFrame:
    """Extract ``<meta property=…|name=… content=…>`` pairs from raw
    HTML — the social/SEO metadata layer (Open Graph ``og:*`` cards,
    ``twitter:*`` cards, ``description``/``robots`` directives) that
    link-preview and snippet pipelines mine from a crawl, completing
    the structured-metadata family next to :func:`extract_jsonld`
    (schema.org) and :func:`html_tables`.

    Returns one row per meta tag carrying BOTH a key and a content
    attribute: ``(id, tag_no, kind, key, content)`` — ``kind`` is
    ``'property'`` (OG convention) or ``'name'`` (classic), both
    lowercased; ``tag_no`` is 0-based in document order over ALL meta
    tags (so the caller can see which of two ``og:image`` tags came
    first — repeated keys are the OG array convention and every
    occurrence is kept); ``content`` is entity-decoded with the same
    sequential decoder as table cells.  Attribute ORDER inside the tag
    is free (``content`` before ``property`` is common in the wild),
    quotes may be single or double, and self-closing ``/>`` is
    tolerated.  Tags without both attributes (``charset=``,
    ``http-equiv=``) yield NULL key/content and are filtered — charset
    sniffing is :mod:`operators.charset`'s job.

    Pure Catalyst: one ``regexp_extract_all`` over the page for whole
    tags, ``posexplode``, two per-tag ``regexp_extract``s.  Scale:
    scan-stage only — no shuffle, no UDF.
    """
    tags = F.regexp_extract_all(
        F.col(html_col).cast("string"),
        F.lit(r"(?is)<meta\s[^>]*>"), F.lit(0))
    # the key attribute must START after whitespace or a quote — a bare
    # \b boundary also matches after '-', so <meta data-name="x"
    # content="y"> would emit a spurious (kind='name', key='x') pair;
    # lookbehind keeps the group indices unchanged (Java regex, and the
    # q338 oracle synthesizes rows analytically so no RE2 mirror needed)
    kv = r'(?is)(?<=[\s"\x27])(property|name)\s*=\s*["\x27]([^"\x27]*)["\x27]'
    cv = r'(?is)(?<=[\s"\x27])content\s*=\s*["\x27]([^"\x27]*)["\x27]'
    e = (pages.select(F.col(id_col).alias("id"),
                      F.posexplode(tags).alias("tag_no", "__t"))
         .select("id", F.col("tag_no").cast("int").alias("tag_no"),
                 F.lower(F.regexp_extract("__t", kv, 1)).alias("kind"),
                 F.lower(F.regexp_extract("__t", kv, 2)).alias("key"),
                 F.regexp_extract("__t", cv, 1).alias("__c")))
    return (e.filter((F.col("key") != "") & (F.col("__c") != ""))
            .select("id", "tag_no", "kind", "key",
                    _decode_cell(F.col("__c")).alias("content")))


_VOID_TAGS = ("area br col embed hr img input link meta param source "
              "track wbr").split()


def dom_depth_profile(pages: DataFrame, *, html_col: str = "html",
                      id_col: str = "url") -> DataFrame:
    """Per-page DOM nesting-depth profile from raw HTML — the
    STRUCTURE quality signal next to the text-side gates (Gopher /
    C4 / boilerplate): machine-generated chrome nests deep and
    uniformly, hand-written content shallowly; a page whose tags
    never re-balance is broken markup worth flagging before
    extraction trusts it.

    Tag walk, no parser: every ``<tag``/``</tag`` token classifies as
    +1 (opening), −1 (closing) or 0 (void elements — br/img/meta/…
    per the HTML5 void list — and explicitly self-closed ``…/>``
    tags, which never nest); depth is the running sum in document
    order and the profile is

        (id, n_tags, max_depth, end_balance)

    — ``end_balance`` ≠ 0 flags unbalanced markup (closing below
    zero clamps nothing; the signed walk is reported as-is so a
    stray ``</div>`` shows up as a NEGATIVE dip, pinned).  Pages
    with no tags report (0, 0, 0).

    Scale: one regexp_extract_all + posexplode (rows ≈ tag count),
    one (page)-partitioned ordered window for the running sum, one
    per-page agg that reuses the same partitioning.  Pure Catalyst.
    """
    tag_pat = r"(?s)<(/?)([a-zA-Z][a-zA-Z0-9]*)[^>]*?(/?)>"
    whole = F.regexp_extract_all(F.col(html_col).cast("string"),
                                 F.lit(r"(?s)<[^>]*>"), F.lit(0))
    e = (pages.select(F.col(id_col).alias("id"),
                      F.posexplode_outer(whole).alias("pos", "__t")))
    closing = F.regexp_extract("__t", tag_pat, 1) == "/"
    name = F.lower(F.regexp_extract("__t", tag_pat, 2))
    selfclosed = F.regexp_extract("__t", tag_pat, 3) == "/"
    delta = (F.when(F.col("__t").isNull(), F.lit(0))  # tagless page
             .when(name == "", F.lit(0))           # comments/doctype
             .when(closing, F.lit(-1))
             .when(selfclosed | name.isin(list(_VOID_TAGS)), F.lit(0))
             .otherwise(F.lit(1)))
    from pyspark.sql import Window

    w = (Window.partitionBy("id").orderBy("pos")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    d = (e.withColumn("__d", delta)
         .withColumn("__depth", F.sum("__d").over(w)))
    return (d.groupBy("id")
            .agg(F.sum(F.when(F.col("__t").isNotNull(), 1)
                       .otherwise(0)).cast("long").alias("n_tags"),
                 F.coalesce(F.max("__depth"), F.lit(0)).cast("long")
                 .alias("max_depth"),
                 F.coalesce(F.sum("__d"), F.lit(0)).cast("long")
                 .alias("end_balance")))


def heading_outline(pages: DataFrame, *, html_col: str = "html",
                    id_col: str = "url") -> DataFrame:
    """Per-page heading-outline profile from raw HTML — the document
    STRUCTURE signal next to :func:`dom_depth_profile` (nesting) and
    :func:`meta_tags` (metadata): a well-formed article walks h1→h2→h3
    without skipping levels; machine chrome repeats h4s with no h1;
    accessibility audits flag level SKIPS (h1 followed by h3) and
    missing/multiple h1s.

    Returns ``(id, n_headings, n_h1, first_level, max_skip)`` —
    ``first_level`` the level of the first heading in document order
    (NULL when none), ``max_skip`` the largest downward level jump
    between CONSECUTIVE headings (h1→h3 = 2; ≤1 everywhere = clean
    outline; NULL with < 2 headings).

    Pure Catalyst: one ``regexp_extract_all`` for the level digits,
    array arithmetic (zip_with of the array against its own tail) for
    the jumps.  Scan-stage only — no shuffle, no UDF.
    """
    lv = F.transform(
        F.regexp_extract_all(F.col(html_col).cast("string"),
                             F.lit(r"(?is)<h([1-6])[\s>]"), F.lit(1)),
        lambda s: s.cast("int"))
    n = F.size(lv)
    jumps = F.zip_with(F.slice(lv, 1, F.greatest(n - 1, F.lit(0))),
                       F.slice(lv, 2, F.greatest(n - 1, F.lit(0))),
                       lambda a, b: b - a)
    return pages.select(
        F.col(id_col).alias("id"),
        n.cast("long").alias("n_headings"),
        F.size(F.filter(lv, lambda x: x == 1)).cast("long")
        .alias("n_h1"),
        F.when(n > 0, F.element_at(lv, 1)).cast("int")
        .alias("first_level"),
        F.when(n >= 2, F.array_max(jumps)).cast("int")
        .alias("max_skip"))


def img_alt_coverage(pages: DataFrame, *, html_col: str = "html",
                     id_col: str = "url") -> DataFrame:
    """Per-page image alt-text coverage from raw HTML — the
    accessibility/quality gate pipelines use to score pages before
    trusting their media: ``(id, n_imgs, n_with_alt, coverage)`` with
    coverage = n_with_alt/n_imgs (NULL when imageless).

    An image counts as alt-covered iff its tag carries a NON-EMPTY
    ``alt`` attribute whose name starts after whitespace or a quote —
    the same anchored-attribute rule as :func:`meta_tags` (a bare \\b
    would false-match ``data-alt=``), quotes single or double.
    ``alt=""`` (the explicit decorative-image marker) counts as NOT
    covered here, since the profile asks "does this image carry
    text", not "is the markup valid".

    Pure Catalyst: one regexp_extract_all for whole ``<img`` tags +
    one per-tag filter regexp.  Scan-stage only.
    """
    tags = F.regexp_extract_all(
        F.col(html_col).cast("string"),
        F.lit(r"(?is)<img\s[^>]*>"), F.lit(0))
    has_alt = (r'(?is)(?<=[\s"\x27])alt\s*=\s*'
               r'["\x27][^"\x27]+["\x27]')
    n = F.size(tags)
    n_alt = F.size(F.filter(tags, lambda t: t.rlike(has_alt)))
    nz = F.when(n > 0, n.cast("double"))
    return pages.select(
        F.col(id_col).alias("id"),
        n.cast("long").alias("n_imgs"),
        n_alt.cast("long").alias("n_with_alt"),
        F.when(n > 0, F.round(n_alt.cast("double") / nz, 6))
        .alias("coverage"))


def link_profile(pages: DataFrame, *, html_col: str = "html",
                 id_col: str = "url") -> DataFrame:
    """Per-page outlink profile from raw HTML — the link-graph-side
    quality signal next to :func:`heading_outline` (structure) and
    :func:`img_alt_coverage` (media): ``(id, n_links, n_internal,
    n_external, n_nofollow)`` where external = an absolute http(s)
    href whose host differs from the PAGE's own host (taken from the
    ``id`` url), internal = everything else (relative paths,
    same-host absolutes, fragments — the crawl-scope convention), and
    nofollow counts anchors whose ``rel`` value contains
    ``nofollow``.

    Attribute names are ANCHORED after whitespace/quote (the q338
    rule — ``data-href=``/``data-rel=`` decoys never bind); quotes
    single or double.  Pure Catalyst: one regexp_extract_all for
    whole ``<a`` tags + per-tag lambda regexes; scan-stage only.
    """
    tags = F.regexp_extract_all(
        F.col(html_col).cast("string"),
        F.lit(r"(?is)<a\s[^>]*>"), F.lit(0))
    href_pat = (r'(?is)(?<=[\s"\x27])href\s*=\s*'
                r'["\x27]([^"\x27]*)["\x27]')
    nof_pat = (r'(?is)(?<=[\s"\x27])rel\s*=\s*'
               r'["\x27][^"\x27]*nofollow')
    page_host = F.lower(F.regexp_extract(
        F.col(id_col), r"^https?://([^/:]+)", 1))
    hrefs = F.transform(tags, lambda t: F.regexp_extract(t, href_pat, 1))
    is_ext = lambda h: (h.rlike("(?i)^https?://")  # noqa: E731
                        & (F.lower(F.regexp_extract(
                            h, r"(?i)^https?://([^/:]+)", 1))
                           != page_host))
    n = F.size(tags)
    n_ext = F.size(F.filter(hrefs, is_ext))
    n_nof = F.size(F.filter(tags, lambda t: t.rlike(nof_pat)))
    return pages.select(
        F.col(id_col).alias("id"),
        n.cast("long").alias("n_links"),
        (n - n_ext).cast("long").alias("n_internal"),
        n_ext.cast("long").alias("n_external"),
        n_nof.cast("long").alias("n_nofollow"))


def page_weight_profile(pages: DataFrame, *, html_col: str = "html",
                        id_col: str = "url") -> DataFrame:
    """Per-page payload-weight profile from raw HTML — how much of the
    page is code/chrome rather than markup+text: byte totals for
    ``<script>…</script>``, ``<style>…</style>`` and ``<!-- -->``
    comment blocks, plus their combined share of the page.  The
    crawl-QA twin of the TEXT-side density gates (C4/Gopher/JusText
    look at extracted text; this looks at what never becomes text).

    ``(id, total_chars, script_chars, style_chars, comment_chars,
    payload_share)`` — share = (script+style+comment)/total rounded 6,
    NULL on empty pages.  Character counts (ASCII pages = bytes);
    non-greedy DOTALL block matches, unterminated blocks count zero
    (the regex simply doesn't match — documented).

    Pure Catalyst: three regexp_extract_all + length folds over the
    match arrays.  Scan-stage only.
    """
    h = F.col(html_col).cast("string")

    def blk_chars(pat):
        return F.aggregate(
            F.transform(F.regexp_extract_all(h, F.lit(pat), F.lit(0)),
                        lambda b: F.length(b).cast("long")),
            F.lit(0).cast("long"), lambda acc, x: acc + x)

    script = blk_chars(r"(?is)<script[^>]*>.*?</script>")
    style = blk_chars(r"(?is)<style[^>]*>.*?</style>")
    comment = blk_chars(r"(?s)<!--.*?-->")
    total = F.length(h).cast("long")
    share = F.when(total > 0, F.round(
        (script + style + comment).cast("double")
        / F.when(total != 0, total).cast("double"), 6))
    return pages.select(
        F.col(id_col).alias("id"),
        total.alias("total_chars"),
        script.alias("script_chars"),
        style.alias("style_chars"),
        comment.alias("comment_chars"),
        share.alias("payload_share"))
