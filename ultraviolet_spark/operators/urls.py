"""URL operators for web-crawl pipelines: host extraction, URL
normalization (tracking-param and fragment stripping), registrable-
domain derivation, domain-level rollups and blocklist filtering.

All pure Catalyst expressions (JVM, whole-stage codegen) — scan-stage,
shuffle-free except the callers' own rollups — with exact DuckDB
mirrors in ``ultraviolet_spark.queries`` (q75/q76).

Scale notes (100 TB crawl): per-URL ops are narrow row maps; domain
rollups shuffle on the registrable domain, which is zipf-skewed on a
real crawl — pair with AQE skew handling or the salting helpers in
``operators/asof.py`` when a single domain dominates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Query parameters that identify tracking, not content (public
# convention: Google/Facebook click identifiers + utm_* campaign tags).
TRACKING_PARAM_RE = r"^(utm_[a-z]+|fbclid|gclid|msclkid)="

# Effective second-level labels under which a 2-letter ccTLD hosts
# registrations one level deeper (tiny public-suffix heuristic — the
# full Mozilla PSL is data, not code; swap in when available).
_SECOND_LEVEL = ["co", "com", "org", "net", "ac", "gov", "edu"]


def host(url: Column) -> Column:
    """Hostname (JVM built-in ``parse_url``), lowercased."""
    return F.lower(F.try_parse_url(url, F.lit("HOST")))


def _clean_query(url: Column) -> Column:
    """Query string with tracking parameters removed (NULL if none left)."""
    q = F.try_parse_url(url, F.lit("QUERY"))
    kept = F.filter(F.split(q, "&"),
                    lambda kv: ~kv.rlike(TRACKING_PARAM_RE))
    return F.when(q.isNotNull() & (F.size(kept) > 0),
                  F.array_join(kept, "&"))


def normalize_url(url: Column) -> Column:
    """Canonical URL: lowercase scheme+host, fragment dropped, tracking
    params dropped (whole query dropped if nothing else remains)."""
    scheme = F.lower(F.try_parse_url(url, F.lit("PROTOCOL")))
    path = F.try_parse_url(url, F.lit("PATH"))
    q = _clean_query(url)
    return F.concat(
        scheme, F.lit("://"), host(url),
        F.coalesce(path, F.lit("")),
        F.coalesce(F.concat(F.lit("?"), q), F.lit("")))


def registrable_domain(host_col: Column) -> Column:
    """Registrable domain: last two host labels, or last three when the
    second-to-last label is an effective second-level (co/com/org/…)
    under a 2-letter ccTLD (site.co.uk → site.co.uk, www.site.com →
    site.com)."""
    labels = F.split(host_col, r"\.")
    n = F.size(labels)
    tld = F.element_at(labels, -1)
    second = F.element_at(labels, -2)
    deep = ((n >= 3) & (F.length(tld) == 2)
            & second.isin(_SECOND_LEVEL))
    last2 = F.concat_ws(".", second, tld)
    last3 = F.concat_ws(".", F.element_at(labels, -3), second, tld)
    return F.when(n <= 2, host_col).when(deep, last3).otherwise(last2)


def with_url_parts(df: DataFrame, *, url_col: str = "url") -> DataFrame:
    """Adds ``host``, ``url_norm``, ``domain`` columns."""
    u = F.col(url_col)
    h = host(u)
    return (df.withColumn("host", h)
            .withColumn("url_norm", normalize_url(u))
            .withColumn("domain", registrable_domain(h)))


def domain_stats(df: DataFrame, *, url_col: str = "url",
                 blocklist: list[str] | None = None) -> DataFrame:
    """Per-registrable-domain rollup: page count, distinct normalized
    URLs (crawl-dup signal) and a blocklist flag.

    ``blocklist`` is a small in-query list here; at scale pass it as a
    broadcast-joined table instead.
    """
    parts = with_url_parts(df, url_col=url_col)
    blocked = (F.col("domain").isin(list(blocklist)) if blocklist
               else F.lit(False))
    return (parts.groupBy("domain")
            .agg(F.count("*").cast("long").alias("n_pages"),
                 F.countDistinct("url_norm").cast("long").alias("n_urls"))
            .withColumn("blocked", blocked))


def extract_outlinks(df: DataFrame, *, html_col: str = "html",
                     id_col: str = "doc_id",
                     absolute_only: bool = True) -> DataFrame:
    """``(id, link)`` — href targets of every anchor in the page, in
    document order (crawl-frontier / outlink-graph construction).
    Pure Catalyst ``regexp_extract_all`` in the scan stage.

    ``absolute_only`` keeps http(s) links only: relative links need the
    page's base URL to resolve — join them back to the page row when an
    outlink graph wants them.
    """
    links = F.expr(
        f"regexp_extract_all({html_col}, 'href=\"([^\"]*)\"', 1)")
    out = df.select(F.col(id_col), F.explode(links).alias("link"))
    if absolute_only:
        out = out.filter(F.col("link").rlike("^https?://"))
    return out


def blocklist_filter(df: DataFrame, blocked_domains: DataFrame,
                     *, url_patterns: list[str] | None = None,
                     url_col: str = "url") -> DataFrame:
    """URL blocklist filtering (the RefinedWeb/UT1 pipeline step):
    flags every row with ``blocked_domain`` (registrable domain appears
    in ``blocked_domains``, a 1-column ``domain`` frame),
    ``blocked_pattern`` (lowercased url matches any of
    ``url_patterns``), and ``keep`` (neither).

    Scale shape: real blocklists (UT1 ≈ 4M domains) are tiny next to
    the corpus — the domain check is a BROADCAST left join on the
    registrable domain, never a shuffle of the pages; the pattern check
    is one compiled regex alternation in the scan stage.  Callers
    filter on ``keep`` but should persist the flags: blocked-rate per
    crawl batch is a standard corpus-health metric.
    """
    from pyspark.sql.functions import broadcast

    dom = registrable_domain(host(F.col(url_col)))
    bl = (blocked_domains
          .select(F.lower(F.col("domain")).alias("__bl_domain"))
          .distinct())
    out = (df.withColumn("domain", dom)
           .join(broadcast(bl),
                 F.col("domain") == F.col("__bl_domain"), "left")
           .withColumn("blocked_domain",
                       F.col("__bl_domain").isNotNull())
           .drop("__bl_domain"))
    if url_patterns:
        alt = "|".join(f"(?:{p})" for p in url_patterns)
        out = out.withColumn(
            "blocked_pattern", F.lower(F.col(url_col)).rlike(alt))
    else:
        out = out.withColumn("blocked_pattern", F.lit(False))
    return out.withColumn(
        "keep", ~F.col("blocked_domain") & ~F.col("blocked_pattern"))


def extract_anchors(df: DataFrame, *, html_col: str = "html",
                    id_col: str = "doc_id",
                    absolute_only: bool = True,
                    decode_entities: bool = True) -> DataFrame:
    """``(id, link, anchor)`` — href target plus the anchor TEXT of
    every ``<a>`` in document order.  Anchor text is how the web
    describes the target page (the classic ranking / labeled-pair
    signal: it yields (anchor, target-url) training pairs that the
    target page's own text can't provide).

    The href/anchor scan is two ``regexp_extract_all`` passes zipped
    positionally (same pattern, groups 1 and 2 — Catalyst, scan-stage);
    ``decode_entities`` then runs the anchor through the REAL extract
    kernel (entity decode + whitespace collapse, same U+FFFD/entity
    semantics as page text extraction), so '&amp;' in an anchor matches
    the page-text form of the same string.
    """
    pat = '<a [^>]*href="([^"]*)"[^>]*>([^<]*)</a>'
    hrefs = F.expr(f"regexp_extract_all({html_col}, '{pat}', 1)")
    texts = F.expr(f"regexp_extract_all({html_col}, '{pat}', 2)")
    pairs = F.zip_with(hrefs, texts,
                       lambda l, a: F.struct(l.alias("link"),
                                             a.alias("anchor")))
    out = (df.select(F.col(id_col), F.explode(pairs).alias("__p"))
           .select(F.col(id_col), F.col("__p.link").alias("link"),
                   F.col("__p.anchor").alias("anchor")))
    if absolute_only:
        out = out.filter(F.col("link").rlike("^https?://"))
    if decode_entities:
        from ultraviolet_spark.functions.udfs import extract_text_udf
        out = out.withColumn("anchor", extract_text_udf("anchor"))
    return out


def extract_title(df: DataFrame, *, html_col: str = "html",
                  id_col: str = "doc_id") -> DataFrame:
    """``(id, title)`` — the ``<title>`` element's text, entity-decoded
    and whitespace-collapsed through the extract kernel; NULL when the
    page has no title element (distinct from an empty title)."""
    raw = F.regexp_extract(
        F.col(html_col), "(?i)<title[^>]*>([^<]*)</title>", 1)
    has = F.col(html_col).rlike("(?i)<title[^>]*>[^<]*</title>")
    from ultraviolet_spark.functions.udfs import extract_text_udf
    return df.select(
        F.col(id_col),
        F.when(has, extract_text_udf(raw)).alias("title"))


def extract_rel_canonical(df: DataFrame, *, html_col: str = "html",
                          url_col: str = "url") -> DataFrame:
    """Extract the page's ``<link rel="canonical" href=...>`` target —
    the publisher's own dedup signal (faceted/tracking/mirror URLs all
    declare one canonical page; honoring it collapses crawl duplicates
    *before* any content hashing).

    Attribute ORDER is free in real markup (``rel`` before or after
    ``href``) and the tag name/attrs are case-insensitive — two
    coalesced case-insensitive extracts cover both orders in the scan
    stage.  Targets resolve as: absolute http(s) → as-is; root-relative
    (``/path``) → against the page URL's scheme+host; anything else
    (protocol-relative, dotted-relative, javascript:) → ignored.  Adds
    ``canonical_target`` (the page's own URL when no usable canonical —
    every page then belongs to exactly one canonical group) and
    ``has_canonical``.
    """
    h, u = F.col(html_col), F.col(url_col)
    a = F.regexp_extract(
        h, '(?i)<link[^>]*rel="canonical"[^>]*href="([^"]*)"', 1)
    b = F.regexp_extract(
        h, '(?i)<link[^>]*href="([^"]*)"[^>]*rel="canonical"', 1)
    raw = F.coalesce(F.when(a != "", a), F.when(b != "", b))
    origin = F.regexp_extract(u, r"^(https?://[^/]+)", 1)
    resolved = (F.when(raw.rlike("^https?://"), raw)
                .when(raw.rlike("^/") & ~raw.rlike("^//"),
                      F.concat(origin, raw)))
    return (df.withColumn("canonical_target", F.coalesce(resolved, u))
              .withColumn("has_canonical", resolved.isNotNull()))


def canonical_groups(df: DataFrame, *, html_col: str = "html",
                     url_col: str = "url") -> DataFrame:
    """Group pages by their rel=canonical target and elect one keeper
    per group: the member whose URL *is* the target when it was
    crawled, else the lexicographic-min member (deterministic when the
    canonical page itself is missing from the crawl).  One shuffle on
    the target key; group stats are a map-side-combined count, so the
    operator scales with the number of GROUPS, not pages².  Adds
    ``group_size`` and ``is_keeper``.
    """
    t = extract_rel_canonical(df, html_col=html_col, url_col=url_col)
    g = (t.groupBy("canonical_target")
         .agg(F.count("*").cast("long").alias("group_size"),
              F.min(url_col).alias("_min_url"),
              F.max(F.when(F.col(url_col) == F.col("canonical_target"),
                           F.col(url_col))).alias("_self")))
    joined = t.join(g, "canonical_target")
    keeper = F.when(F.col("_self").isNotNull(),
                    F.col(url_col) == F.col("_self")) \
              .otherwise(F.col(url_col) == F.col("_min_url"))
    return (joined.withColumn("is_keeper", keeper)
            .drop("_min_url", "_self"))


def extract_hreflang(df: DataFrame, *, html_col: str = "html",
                     id_col: str = "doc_id") -> DataFrame:
    """``(id, hreflang, href, cluster_key)`` — one row per
    ``<link rel="alternate" hreflang=... href=...>`` declaration, the
    publisher-declared parallel-page graph (the highest-precision
    bitext-mining signal there is: the site SAYS these pages translate
    each other, no length-ratio heuristics needed).

    hreflang/href pairs are two positionally-zipped
    ``regexp_extract_all`` passes (same idiom as extract_anchors);
    ``cluster_key`` is the lexicographic-min href of the page's
    alternate set computed with ``array_min`` BEFORE the explode — in
    the scan stage, no window — so all declared members of one
    translation cluster share a key by construction.
    """
    pat = ('<link rel="alternate" hreflang="([^"]*)" '
           'href="([^"]*)"[^>]*>')
    langs = F.expr(f"regexp_extract_all({html_col}, '{pat}', 1)")
    hrefs = F.expr(f"regexp_extract_all({html_col}, '{pat}', 2)")
    pairs = F.zip_with(langs, hrefs,
                       lambda l, h: F.struct(l.alias("hreflang"),
                                             h.alias("href")))
    return (df.select(F.col(id_col),
                      F.array_min(hrefs).alias("cluster_key"),
                      F.explode(pairs).alias("__p"))
            .select(F.col(id_col),
                    F.col("__p.hreflang").alias("hreflang"),
                    F.col("__p.href").alias("href"), "cluster_key"))


def outlink_domain_stats(df: DataFrame, *, html_col: str = "html",
                         id_col: str = "doc_id") -> DataFrame:
    """Per-registrable-domain outlink rollup ``(domain, n_links,
    n_docs)`` — the link-graph aggregate crawl scheduling reads.
    Composition: extract_outlinks → host → registrable_domain →
    one map-side-combined groupBy on the domain."""
    links = extract_outlinks(df, html_col=html_col, id_col=id_col)
    dom = registrable_domain(host(F.col("link")))
    return (links.select(F.col(id_col), dom.alias("domain"))
            .groupBy("domain")
            .agg(F.count("*").cast("long").alias("n_links"),
                 F.countDistinct(id_col).cast("long").alias("n_docs")))


# ----------------------------------------------- RFC 3986 canonicalization

def _pct_normalize(s: Column) -> Column:
    """RFC 3986 §6.2.2.2 percent-encoding normalization: decode the
    escapes of UNRESERVED characters (ALPHA / DIGIT / ``-._~`` — their
    encoded and plain forms are equivalent by spec, and crawlers that
    don't fold them count the same page twice), uppercase the hex of
    everything else.  A ``%`` not followed by two hex digits passes
    through verbatim.  Pure Catalyst: split on ``%``, fix each piece,
    rejoin — no Python, no regex backtracking."""
    parts = F.split(s, "%", -1)
    head = F.element_at(parts, 1)
    rest = F.slice(parts, 2, F.greatest(F.size(parts) - 1, F.lit(0)))

    def fix(p):
        hexok = p.rlike("^[0-9A-Fa-f]{2}")
        hx = F.upper(F.substring(p, 1, 2))
        code = F.conv(hx, 16, 10).cast("int")
        unreserved = (((code >= 65) & (code <= 90))
                      | ((code >= 97) & (code <= 122))
                      | ((code >= 48) & (code <= 57))
                      | code.isin(45, 46, 95, 126))
        tail = p.substr(F.lit(3), F.length(p))
        return (F.when(~hexok, F.concat(F.lit("%"), p))
                .when(unreserved, F.concat(F.char(code), tail))
                .otherwise(F.concat(F.lit("%"), hx, tail)))

    return F.when(s.isNotNull(),
                  F.concat(head, F.array_join(F.transform(rest, fix), "")))


def _remove_dot_segments(path: Column) -> Column:
    """RFC 3986 §5.2.4 over an absolute path (empty → ``/``): ``.``
    segments vanish, ``..`` pops (never past the root), a trailing
    ``.``/``..`` leaves a trailing slash — one ``F.aggregate`` stack,
    no Python."""
    p = F.when(path.isNull() | (path == ""), F.lit("/")).otherwise(path)
    segs = F.split(p.substr(F.lit(2), F.length(p)), "/", -1)
    stack = F.aggregate(
        segs,
        F.array().cast("array<string>"),
        lambda acc, s: (
            F.when(s == ".", acc)
            .when(s == "..", F.slice(acc, 1, F.greatest(
                F.size(acc) - 1, F.lit(0))))
            .otherwise(F.concat(acc, F.array(s)))))
    # trailing '.'/'..' leaves a slash — unless everything popped away
    # ('/a/..' is '/', not '//': the root slash is already there)
    trailing = F.when(F.element_at(segs, -1).isin(".", "..")
                      & (F.size(stack) > 0),
                      F.lit("/")).otherwise(F.lit(""))
    return F.concat(F.lit("/"), F.array_join(stack, "/"), trailing)


def canonical_url(url: Column) -> Column:
    """Full canonical form for crawl-dedup keys — the RFC 3986 §6
    normalizations stacked on :func:`normalize_url`'s policy ones:

    * scheme + host lowercased; userinfo kept out of the key
    * default ports dropped (``http:80``, ``https:443``)
    * percent-encoding normalized in path AND query (unreserved
      decoded, other escapes' hex uppercased)
    * ``.``/``..`` path segments resolved; empty path → ``/``
    * fragment dropped; tracking params dropped (whole query dropped
      when nothing else remains)

    IPv6 literal hosts (``[::1]``) are out of scope (the port split is
    colon-based); pass them through :func:`normalize_url` instead.
    Unparseable URLs (malformed escapes etc.) canonicalize to NULL via
    ``try_parse_url`` — one junk URL must never kill a 100 TB job; the
    caller keeps the raw string as the fallback key.
    """
    scheme = F.lower(F.try_parse_url(url, F.lit("PROTOCOL")))
    hostport = F.element_at(F.split(
        F.try_parse_url(url, F.lit("AUTHORITY")), "@", -1), -1)
    hp = F.split(hostport, ":", -1)
    hostname = F.lower(F.element_at(hp, 1))
    port = F.when(F.size(hp) > 1, F.element_at(hp, -1))
    default = (((scheme == "http") & (port == "80"))
               | ((scheme == "https") & (port == "443")))
    portpart = F.when(port.isNotNull() & ~F.coalesce(default, F.lit(False)),
                      F.concat(F.lit(":"), port)).otherwise(F.lit(""))
    path = _remove_dot_segments(
        _pct_normalize(F.try_parse_url(url, F.lit("PATH"))))
    query = _pct_normalize(_clean_query(url))
    return F.concat(
        scheme, F.lit("://"), hostname, portpart, path,
        F.coalesce(F.concat(F.lit("?"), query), F.lit("")))


def canonicalize(df: DataFrame, *, url_col: str = "url",
                 out: str = "canonical_url") -> DataFrame:
    """``df`` + the canonical URL column — the dedup key for crawl
    frontiers and incremental re-crawl diffs."""
    return df.withColumn(out, canonical_url(F.col(url_col)))


def bitext_candidates(df: DataFrame, *, url_col: str = "url",
                      lang_col: str = "lang", text_col: str = "text",
                      id_col: str = "doc_id",
                      src_lang: str = "en", tgt_lang: str = "de",
                      min_len_ratio: float = 0.5,
                      langs: tuple = ("en", "de", "es", "fr", "zh"),
                      ) -> DataFrame:
    """Parallel-page (bitext) candidate mining — the web-mining step
    behind every translation corpus (ParaCrawl/CCMatrix shape): pages
    whose URLs differ ONLY in the language path segment
    (``/en/`` ↔ ``/de/``) are translation candidates; a character
    length-ratio gate (Fan et al. 2021 use ≥0.5) drops obvious
    non-parallels before any expensive alignment scoring.

    One equi-join on the language-stripped URL stem (hash-uniform —
    stems are per-site paths), length filter in the join projection;
    candidates ∝ true pairs, never corpus².  Downstream: embed both
    sides and cosine-gate with ``operators.similarity`` for the full
    mining pipeline.
    """
    alt = "|".join(langs)
    stem = F.regexp_replace(F.col(url_col), f"/({alt})/", "/*/")
    side = df.select(F.col(id_col), F.col(lang_col),
                     stem.alias("stem"),
                     F.length(text_col).cast("long").alias("n_chars"))
    s = (side.filter(F.col(lang_col) == src_lang)
         .select(F.col("stem"), F.col(id_col).alias("src_id"),
                 F.col("n_chars").alias("src_chars")))
    t = (side.filter(F.col(lang_col) == tgt_lang)
         .select(F.col("stem"), F.col(id_col).alias("tgt_id"),
                 F.col("n_chars").alias("tgt_chars")))
    ratio = (F.least("src_chars", "tgt_chars").cast("double")
             / F.greatest("src_chars", "tgt_chars"))
    # gate on the RAW ratio (the rounded display column would admit
    # 0.49999x cases the oracle's integer comparison rejects)
    return (s.join(t, "stem")
            .filter((ratio >= min_len_ratio) & (F.col("src_chars") > 0))
            .withColumn("len_ratio", F.round(ratio, 6))
            .select("stem", "src_id", "tgt_id", "src_chars",
                    "tgt_chars", "len_ratio"))


def discover_tracking_params(df: DataFrame, *, url_col: str = "url",
                             min_domains: int = 3,
                             ndv_frac: float = 0.8) -> DataFrame:
    """DATA-DRIVEN tracking-parameter discovery — the complement of
    :func:`normalize_url`'s fixed utm/fbclid strip list: a query
    parameter is a tracking/session candidate when its values are
    (nearly) unique per occurrence (session ids, click ids, cache
    busters) AND it spans several domains — a content parameter
    (page=3, lang=en) re-uses a small value set, and a single-site
    id param is that site's routing, not ecosystem-wide tracking.

    Flag rule, exact integer arithmetic at the boundary:
    ``value_ndv · 1e6 ≥ round(ndv_frac·1e6) · occurrences`` and
    ``n_domains ≥ min_domains``.  Returns one row per parameter key:
    ``(param, occurrences, value_ndv, n_domains, flagged)``.

    Scale: explode is scan-stage (parse_url + split); the only
    shuffle is the per-param agg — parameter-key cardinality is tiny
    next to the corpus, and the two COUNT DISTINCTs are per-key
    exact (swap for approx_count_distinct at 10^12 URLs if ±2 % is
    acceptable; the flag boundary rarely sits that close).
    """
    frac_micro = int(round(ndv_frac * 1_000_000))
    q = F.parse_url(F.col(url_col), F.lit("QUERY"))
    h = F.parse_url(F.col(url_col), F.lit("HOST"))
    kv = (df.filter(q.isNotNull() & (q != ""))
          .select(h.alias("__host"),
                  F.explode(F.split(q, "&")).alias("__kv"))
          .filter(F.col("__kv") != "")
          .select("__host",
                  F.split(F.col("__kv"), "=", 2).getItem(0)
                  .alias("param"),
                  # F.get, not getItem: a value-less param ("?flash")
                  # splits to a 1-element array and getItem(1) THROWS
                  # under ANSI mode instead of returning NULL
                  F.coalesce(F.get(F.split(F.col("__kv"), "=", 2), 1),
                             F.lit("")).alias("__val")))
    agg = (kv.groupBy("param")
           .agg(F.count("*").cast("long").alias("occurrences"),
                F.countDistinct("__val").cast("long").alias("value_ndv"),
                F.countDistinct("__host").cast("long")
                .alias("n_domains")))
    flagged = ((F.col("value_ndv") * 1_000_000
                >= F.lit(frac_micro) * F.col("occurrences"))
               & (F.col("n_domains") >= min_domains))
    return agg.withColumn("flagged", flagged)


def url_templates(df: DataFrame, *, url_col: str = "url",
                  trap_ndv: int = 100) -> DataFrame:
    """URL template mining: collapse volatile tokens in each URL's
    path so structurally identical pages share one key, then flag the
    crawler-trap shape — one template fanning out into unboundedly
    many distinct URLs (calendar pages, session ids in the path,
    infinite facet combinations).  A frontier that budgets per
    TEMPLATE instead of per URL stops a trap at ``trap_ndv`` fetches
    where a per-URL budget would crawl it forever.

    Normalization (order matters — hex first, or an 8+-digit run is
    consumed as ``{n}`` before the hex rule sees it):
    long hex runs (≥8 of ``[0-9a-f]``) → ``{h}``, digit runs → ``{n}``,
    the query string → a bare ``?`` marker (param VALUES are volatile
    by construction; q199's tracking-param discovery handles them).
    Both rewrite rules live in the Java∩RE2 regex subset and use
    global replacement (Spark replaces all matches natively; an
    oracle must pass the 'g' flag).

    Output per template: ``n_urls`` (occurrences), ``n_distinct``
    (distinct full URLs — the trap signal), ``example`` (lexicographic
    min URL, deterministic), ``is_trap``.

    Scale: pure scan-stage Catalyst rewrites + one template-key
    exchange with map-side partial aggregation; no UDF, no join.
    """
    u = F.col(url_col)
    t = F.regexp_replace(u, r"\?.*$", "?")
    t = F.regexp_replace(t, r"[0-9a-f]{8,}", "{h}")
    t = F.regexp_replace(t, r"[0-9]+", "{n}")
    return (df.select(t.alias("template"), u.alias("__u"))
            .groupBy("template")
            .agg(F.count("*").cast("long").alias("n_urls"),
                 F.countDistinct("__u").cast("long").alias("n_distinct"),
                 F.min("__u").alias("example"))
            .withColumn("is_trap", F.col("n_distinct") >= F.lit(trap_ndv)))
