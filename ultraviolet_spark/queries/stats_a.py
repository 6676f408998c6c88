"""Registry chunk: stems, sampling machinery, causal/estimation wing (q241-q280).

Split from the monolithic queries.py in round 4 (VERDICT r3 #4).
Registration order is preserved by the import sequence in
queries/__init__.py; the shared decorator/registry live in _shared.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window  # noqa: F401
from pyspark.sql import functions as F  # noqa: F401

from ultraviolet_spark.operators import dedup as D  # noqa: F401
from ultraviolet_spark.operators import similarity as S  # noqa: F401
from ultraviolet_spark.operators import textstats as X  # noqa: F401
from ultraviolet_spark.operators.asof import asof_join  # noqa: F401
from ultraviolet_spark.operators.windows import (  # noqa: F401
    dedup_latest,
    sessionize,
    with_ffill,
    with_lags,
    with_leads,
)

from ultraviolet_spark.queries._shared import (  # noqa: F401
    REGISTRY,
    QuerySpec,
    _dec,
    _t,
    q,
)

_Q241_LEXICON = [
    ("generalizations", "gener"), ("oscillators", "oscil"),
    ("agreed", "agre"), ("relational", "relat"),
    ("electrical", "electr"), ("running", "run"), ("flies", "fli"),
    ("happiness", "happi"), ("national", "nation"),
    ("computers", "comput"), ("caresses", "caress"), ("ponies", "poni"),
    ("motoring", "motor"), ("controlled", "control"), ("hopping", "hop"),
    ("sized", "size"), ("conditional", "condit"),
    ("feudalism", "feudal"), ("adoption", "adopt"), ("goodness", "good"),
]


def _q241_sql() -> str:
    vals = ", ".join(f"({i}, '{w}', '{s}')"
                     for i, (w, s) in enumerate(_Q241_LEXICON))
    return f"""
WITH lex(idx, word, stem) AS (VALUES {vals}),
d AS (SELECT doc_id, doc_id % 20 AS idx FROM documents)
SELECT l.stem,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(COUNT(DISTINCT l.word) AS BIGINT) AS n_surface_forms,
       CAST(MIN(d.doc_id) AS BIGINT) AS first_doc
FROM d JOIN lex l ON l.idx = d.idx
GROUP BY l.stem
"""


@q("q241_porter_stems", _q241_sql())
def q241(spark, sf_dir):
    """Porter stemming over a document-weighted 20-word lexicon whose
    stems are hand-derivable from the published 1980 rule tables (the
    same per-step examples tests pin individually; e.g. relational →
    step2 relate → step5a relat).  The engine runs the REAL pipeline —
    distinct-vocabulary Arrow UDF + broadcast join back (the 100 TB
    shape: 10^12 tokens cost |vocabulary| stem calls) — while the
    oracle knows only the literal expected stems, so any rule firing
    wrongly on any word changes its stem group and diverges counts.
    Surface-form counting proves the stem actually CONFLATES (running/
    runs-style merges would collapse here if the lexicon had them)."""
    from ultraviolet_spark.operators.stem import stem_tokens

    words = F.array(*[F.lit(w) for w, _ in _Q241_LEXICON])
    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.element_at(words, (F.col("doc_id") % 20 + 1).cast("int"))
         .alias("token"))
    stemmed = stem_tokens(d, col="token")
    return (stemmed.groupBy("stem")
            .agg(F.count("*").cast("long").alias("n_tokens"),
                 F.count_distinct("token").cast("long")
                  .alias("n_surface_forms"),
                 F.min("doc_id").cast("long").alias("first_doc")))


@q("q242_dictionary_phrases", """
WITH t AS (
  SELECT doc_id, lower(trim(text)) AS lt
  FROM documents WHERE length(trim(text)) > 0),
tok AS (SELECT doc_id, string_split_regex(lt, '\\s+') AS w FROM t),
bg AS (
  SELECT doc_id, w[i] AS w1, w[i+1] AS w2
  FROM (SELECT doc_id, w, unnest(generate_series(1, len(w) - 1)) AS i
        FROM tok WHERE len(w) >= 2)),
top3 AS (
  SELECT w1 || ' ' || w2 AS phrase, COUNT(*) AS c
  FROM bg WHERE w1 <> w2 GROUP BY 1
  ORDER BY c DESC, phrase ASC LIMIT 3),
norm AS (
  SELECT doc_id,
         ' ' || replace(regexp_replace(lt, '\\s+', ' ', 'g'),
                        ' ', '  ') || ' ' AS s2
  FROM t),
cnt AS (
  SELECT p.phrase, n.doc_id,
         (length(n.s2)
          - length(replace(n.s2,
                           ' ' || replace(p.phrase, ' ', '  ') || ' ',
                           '')))
         // length(' ' || replace(p.phrase, ' ', '  ') || ' ') AS c
  FROM top3 p, norm n)
SELECT phrase,
       CAST(SUM(CASE WHEN c > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_docs,
       CAST(SUM(c) AS BIGINT) AS n_hits
FROM cnt GROUP BY phrase
""")
def q242(spark, sf_dir):
    """Phrase-dictionary matching (the bad-phrase blocklist filter):
    the top-3 adjacent bigrams (w1 ≠ w2, count-then-phrase tie-break)
    become the dictionary, and every occurrence is found by the
    offset-aligned positional join — one join serves every phrase
    length, counts include overlaps, candidates are only tokens that
    appear in the (broadcast) dictionary.  The oracle finds the same
    occurrences by a DIFFERENT mechanism entirely: space-doubled
    substring counting over the normalized text (doubling makes
    adjacent occurrences stop sharing boundary spaces, so the
    non-overlapping replace() count is exact for the non-self-
    overlapping phrases w1 ≠ w2 guarantees).  A positional off-by-one,
    a missed adjacent occurrence, or a tokenization drift diverges
    n_hits."""
    from ultraviolet_spark.operators.index import dictionary_hits

    d = _t(spark, sf_dir, "documents")
    toks = (d.filter(F.length(F.trim("text")) > 0)
            .select("doc_id",
                    F.posexplode(F.split(F.lower(F.trim(F.col("text"))),
                                         r"\s+")).alias("pos", "w")))
    nxt = toks.select("doc_id", (F.col("pos") - 1).alias("pos"),
                      F.col("w").alias("w2"))
    bg = (toks.join(nxt, ["doc_id", "pos"])
          .filter(F.col("w") != F.col("w2"))
          .select(F.concat_ws(" ", "w", "w2").alias("phrase")))
    top3 = (bg.groupBy("phrase").agg(F.count("*").alias("c"))
            .orderBy(F.desc("c"), F.asc("phrase")).limit(3)
            .select("phrase"))
    hits = dictionary_hits(d, top3)
    return (hits.groupBy("phrase")
            .agg(F.count_distinct("doc_id").cast("long").alias("n_docs"),
                 F.count("*").cast("long").alias("n_hits")))


@q("q243_salted_skew_join", """
WITH ev AS (
  SELECT CASE WHEN user_id % 10 < 7 THEN 0 ELSE user_id % 20 END AS k,
         value
  FROM events),
dim AS (SELECT n_nationkey % 20 AS k, MIN(n_name) AS label
        FROM nation GROUP BY 1)
SELECT label,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_total
FROM ev JOIN dim USING (k)
GROUP BY label
""")
def q243(spark, sf_dir):
    """General salted equi-join under engineered 70%-on-one-key skew:
    events collapse ~70% of rows onto key 0, factors come from the
    measured counts (suggest_salt), the hot key's rows scatter across
    per-key slices while the small dim side replicates into every
    slice — and the RESULT is provably identical to a plain join,
    which is exactly what the oracle runs (DuckDB knows nothing about
    salting).  A lost slice, a phantom replicated row, or a hash that
    routes rows to a slice the dim side did not cover diverges counts
    and the decimal-exact value total."""
    from ultraviolet_spark.operators.skew import salted_join, suggest_salt

    ev = _t(spark, sf_dir, "events").select(
        F.when(F.col("user_id") % 10 < 7, F.lit(0))
         .otherwise(F.col("user_id") % 20).alias("k"),
        "value")
    dim = (_t(spark, sf_dir, "nation")
           .groupBy((F.col("n_nationkey") % 20).alias("k"))
           .agg(F.min("n_name").alias("label")))
    salts = suggest_salt(ev, "k", target_per_key=500)
    joined = salted_join(ev, dim, "k", salts=salts)
    return (joined.groupBy("label")
            .agg(F.count("*").cast("long").alias("n_events"),
                 F.sum(_dec("value")).cast("double").alias("value_total")))


@q("q244_cache_decisions", """
WITH d AS (
  SELECT doc_id, doc_id % 7 AS m,
         doc_id % 30 + doc_id % 1200 AS cur_age,
         CASE WHEN doc_id % 2 = 0 THEN TRUE ELSE FALSE END AS has_etag
  FROM documents),
x AS (
  SELECT doc_id, m, cur_age,
    CASE WHEN m = 0 THEN NULL
         WHEN m = 1 THEN doc_id % 900
         WHEN m = 2 THEN doc_id % 500
         WHEN m = 3 THEN 300
         WHEN m = 4 THEN 600
         WHEN m = 5 THEN (doc_id % 5000 + 1) // 10
         ELSE 0 END AS lifetime_s,
    CASE WHEN m = 0 THEN 'no-store'
         WHEN m = 1 THEN 'max-age'
         WHEN m = 2 THEN 's-maxage'
         WHEN m = 3 THEN 'max-age'
         WHEN m = 4 THEN 'expires'
         WHEN m = 5 THEN 'heuristic'
         ELSE 'none' END AS freshness_source,
    (has_etag OR m IN (3, 5)) AS validator
  FROM d)
SELECT doc_id,
       CAST(lifetime_s AS BIGINT) AS lifetime_s,
       CAST(cur_age AS BIGINT) AS cur_age_s,
       freshness_source,
       CASE WHEN m = 0 THEN 'no-store'
            WHEN m = 3 THEN 'revalidate'
            WHEN cur_age < lifetime_s THEN 'fresh'
            WHEN validator THEN 'revalidate'
            ELSE 'refetch' END AS decision
FROM x
""")
def q244(spark, sf_dir):
    """RFC 9111 cache freshness + revalidation decisions over
    synthesized header families covering the whole precedence lattice:
    no-store short-circuit, s-maxage beating a co-present max-age,
    no-cache forcing revalidation despite a fresh max-age, Expires−Date
    fallback, the 10% Last-Modified heuristic, and the bare-response
    lifetime-0 default; validators (ETag / Last-Modified) decide
    revalidate-vs-refetch for stale rows.  The engine PARSES real
    Cache-Control strings (word-boundary-guarded regex so s-maxage=N
    can never false-match max-age) and real timestamps; the oracle
    computes every expected value from doc_id arithmetic alone and
    never sees a header string — a parsing slip on any family, a
    precedence inversion, or an off-by-one in the integer age math
    diverges the per-row decisions."""
    from ultraviolet_spark.operators.http import cache_decision

    base = 1767225600
    d = _t(spark, sf_dir, "documents").select("doc_id")
    m = F.col("doc_id") % 7
    date = F.timestamp_seconds(F.lit(base) + F.col("doc_id"))
    resp = d.select(
        "doc_id",
        (F.when(m == 0, F.lit("no-store, private"))
          .when(m == 1, F.concat(F.lit("public, max-age="),
                                 F.col("doc_id") % 900))
          .when(m == 2, F.concat(F.lit("s-maxage="), F.col("doc_id") % 500,
                                 F.lit(", max-age=60")))
          .when(m == 3, F.lit("no-cache, max-age=300"))
          .when(m == 4, F.lit(None).cast("string"))
          .when(m == 5, F.lit("public"))
          .otherwise(F.lit(""))).alias("cache_control"),
        (F.col("doc_id") % 30).cast("long").alias("age_s"),
        date.alias("date"),
        F.when(m == 4, F.timestamp_seconds(
            F.lit(base) + F.col("doc_id") + 600))
         .alias("expires"),
        F.when(m.isin(3, 5), F.timestamp_seconds(
            F.lit(base) + F.col("doc_id")
            - (F.col("doc_id") % 5000 + 1))).alias("last_modified"),
        F.when(F.col("doc_id") % 2 == 0,
               F.concat(F.lit('"e'), F.col("doc_id"), F.lit('"')))
         .alias("etag"),
        F.timestamp_seconds(F.lit(base) + F.col("doc_id")
                            + F.col("doc_id") % 1200).alias("now"))
    out = cache_decision(resp)
    return out.select("doc_id", "lifetime_s", "cur_age_s",
                      "freshness_source", "decision")


@q("q245_jsonld_extract", """
WITH d AS (SELECT doc_id FROM documents),
rows_ AS (
  SELECT doc_id,
         CASE WHEN doc_id % 4 = 3 THEN NULL
              WHEN doc_id % 4 = 2 THEN 'Article'
              ELSE 'Product' END AS t,
         CASE WHEN doc_id % 4 = 3 THEN NULL
              ELSE doc_id % 997 END AS price,
         1 + CASE WHEN doc_id % 4 = 1 THEN 1 ELSE 0 END AS n_blocks
  FROM d)
SELECT COALESCE(t, 'JUNK') AS type,
       CAST(SUM(n_blocks - CASE WHEN t = 'Product'
                                 AND n_blocks = 2 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_primary,
       CAST(SUM(CASE WHEN t = 'Product' AND n_blocks = 2
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_secondary,
       CAST(SUM(CASE WHEN t IS NOT NULL THEN price * n_blocks
                     ELSE 0 END) AS BIGINT) AS price_total
FROM rows_ GROUP BY 1
""")
def q245(spark, sf_dir):
    """schema.org JSON-LD extraction from raw HTML: pages synthesize
    four families — a Product card, a page with TWO ld+json blocks
    (both must be found), an Article with a sprawling multi-line block
    and attribute noise on the script tag, and a JUNK block (truncated
    JSON) that must surface as a NULL variant, never kill the page or
    disappear.  The engine regex-extracts every block case-
    insensitively across newlines, parses to VARIANT with
    try_parse_json, and pulls @type / price via typed try_variant_get
    paths; the oracle computes the expected type histogram and
    price totals from doc_id arithmetic and never sees HTML.  A regex
    that misses the second block, chokes on the attribute noise, or a
    parse that drops junk rows diverges the counts."""
    from ultraviolet_spark.operators.htmltables import extract_jsonld

    d = _t(spark, sf_dir, "documents").select("doc_id")
    did = F.col("doc_id")
    m = did % 4
    price = (did % 997).cast("string")
    prod = F.concat(
        F.lit('<script type="application/ld+json">{"@type": "Product", '
              '"price": '), price, F.lit('}</script>'))
    two = F.concat(
        prod,
        F.lit('<p>between</p><SCRIPT TYPE="application/ld+json">'
              '{"@type": "Product", "price": '), price,
        F.lit(', "secondary": true}</SCRIPT>'))
    art = F.concat(
        F.lit('<script async type = "application/ld+json" '
              'data-x="1">\n  {"@type": "Article",\n   "price": '),
        price, F.lit('\n  }\n</script>'))
    junk = F.lit('<script type="application/ld+json">{"@type": '
                 '"Broken", </script>')
    pages = d.select(
        F.concat(F.lit("https://x.org/"), did).alias("url"),
        F.concat(
            F.lit("<html><head>"),
            F.when(m == 0, prod).when(m == 1, two)
             .when(m == 2, art).otherwise(junk),
            F.lit("</head><body>hi</body></html>")).alias("html"))
    blocks = extract_jsonld(pages)
    typed = blocks.select(
        "id", "block_no",
        F.expr("cast(try_variant_get(ld, '$[\"@type\"]') as string)")
         .alias("t"),
        F.expr("cast(try_variant_get(ld, '$.price') as bigint)")
         .alias("price"),
        F.expr("cast(try_variant_get(ld, '$.secondary') as boolean)")
         .alias("secondary"))
    return (typed.groupBy(F.coalesce("t", F.lit("JUNK")).alias("type"))
            .agg(F.sum((~F.coalesce("secondary", F.lit(False)))
                       .cast("long")).cast("long").alias("n_primary"),
                 F.sum(F.coalesce("secondary", F.lit(False))
                       .cast("long")).cast("long").alias("n_secondary"),
                 F.sum(F.coalesce("price", F.lit(0))).cast("long")
                  .alias("price_total")))


def _lpa_q246_sql() -> str:
    from ultraviolet_spark.operators.graph import (
        label_propagation_oracle_sql)
    edges = (
        "SELECT doc_id % 100 AS src, "
        "(doc_id % 100 // 10) * 10 + (doc_id * 7 + 3) % 10 AS dst "
        "FROM documents "
        "UNION SELECT doc_id % 100, (doc_id * 11 + 5) % 100 "
        "FROM documents WHERE doc_id % 13 = 0")
    inner = label_propagation_oracle_sql(edges, rounds=5)
    return (f"WITH lpa AS ({inner}) "
            f"SELECT label, CAST(COUNT(*) AS BIGINT) AS n_members, "
            f"CAST(MIN(node) AS BIGINT) AS min_node, "
            f"CAST(SUM(node) AS BIGINT) AS node_sum "
            f"FROM lpa GROUP BY label")


@q("q246_label_propagation", _lpa_q246_sql())
def q246(spark, sf_dir):
    """Deterministic synchronous label propagation over a 100-node
    graph with engineered community structure (dense within-block-of-10
    edges + sparse cross-block bridges on every 13th doc): 5 rounds of
    majority-vote label adoption with (count desc, label asc)
    tie-breaks — the published algorithm's random tie-break replaced
    by a total order so the result is a pure function of the graph.
    The community rollup (size, min node, node-id sum) puts every
    node's final label on the hook; the oracle replays the identical
    rounds as unrolled MATERIALIZED CTEs — one wrong majority or
    tie-break in ANY round cascades through label adoption and
    diverges membership sums."""
    from ultraviolet_spark.operators.graph import label_propagation

    d = _t(spark, sf_dir, "documents").select("doc_id")
    did = F.col("doc_id")
    blk = F.expr("(doc_id % 100) div 10")
    e = (d.select((did % 100).alias("src"),
                  (blk * 10 + (did * 7 + 3) % 10).alias("dst"))
         .union(d.filter(did % 13 == 0)
                .select((did % 100).alias("src"),
                        ((did * 11 + 5) % 100).alias("dst"))))
    lpa = label_propagation(e, rounds=5)
    return (lpa.groupBy("label")
            .agg(F.count("*").cast("long").alias("n_members"),
                 F.min("node").cast("long").alias("min_node"),
                 F.sum("node").cast("long").alias("node_sum")))


@q("q247_feed_parse", """
SELECT CASE WHEN doc_id % 2 = 0 THEN 'rss' ELSE 'atom' END AS dialect,
       CAST(COUNT(*) AS BIGINT) AS n_entries,
       CAST(COUNT(DISTINCT doc_id % 20) AS BIGINT) AS n_hosts,
       CAST(SUM(doc_id) AS BIGINT) AS id_sum,
       make_timestamp((1767225600 + MIN(doc_id)) * 1000000)
         AS first_pub,
       make_timestamp((1767225600 + MAX(doc_id)) * 1000000)
         AS last_pub
FROM documents
GROUP BY 1
""")
def q247(spark, sf_dir):
    """RSS 2.0 / Atom 1.0 feed parsing (the crawl-seed channel that
    surfaces new urls before sitemaps regenerate): even docs become
    RSS items (RFC 822 pubDate, day-of-week token present and — per
    the HTTP-date lesson — ignored rather than verified), odd docs
    become Atom entries (link as the href ATTRIBUTE, the classic Atom
    trap; ISO 8601 published).  Both dialects are parsed by native
    from_xml into one unified shape; the rollup recovers doc ids from
    the parsed entry urls and publish timestamps, so link extraction,
    date parsing and dialect detection are all on the hook.  The
    oracle computes everything from doc_id arithmetic and never sees
    an XML byte."""
    from ultraviolet_spark.sources.feeds import parse_feed

    base = 1767225600
    d = _t(spark, sf_dir, "documents").select("doc_id")
    did = F.col("doc_id")
    ts = F.timestamp_seconds(F.lit(base) + did)
    url = F.concat(F.lit("https://h"), did % 20,
                   F.lit(".example.org/post/"), did)
    rss = F.concat(
        F.lit('<?xml version="1.0"?><rss version="2.0"><channel>'
              "<title>f</title><item><title>T"), did,
        F.lit("</title><link>"), url, F.lit("</link><pubDate>"),
        F.date_format(ts, "EEE, dd MMM yyyy HH:mm:ss 'GMT'"),
        F.lit("</pubDate><guid>g"), did,
        F.lit("</guid></item></channel></rss>"))
    atom = F.concat(
        F.lit('<?xml version="1.0"?>'
              '<feed xmlns="http://www.w3.org/2005/Atom">'
              "<title>f</title><entry><title>T"), did,
        F.lit('</title><link href="'), url,
        F.lit('"/><published>'),
        F.date_format(ts, "yyyy-MM-dd'T'HH:mm:ss'Z'"),
        F.lit("</published><id>i"), did,
        F.lit("</id></entry></feed>"))
    feeds = d.select(
        F.concat(F.lit("h"), did % 20).alias("host"),
        F.when(did % 2 == 0, rss).otherwise(atom).alias("feed_xml"))
    parsed = parse_feed(feeds)
    return (parsed.groupBy("dialect")
            .agg(F.count("*").cast("long").alias("n_entries"),
                 F.count_distinct("host").cast("long").alias("n_hosts"),
                 F.sum(F.regexp_extract("entry_url", r"(\d+)$", 1)
                        .cast("long")).cast("long").alias("id_sum"),
                 F.min("published").alias("first_pub"),
                 F.max("published").alias("last_pub")))


@q("q248_qoi_codec_roundtrip", """
WITH img AS (
  SELECT doc_id, 3 + doc_id % 5 AS w, 2 + doc_id % 4 AS h FROM documents),
pxx AS (
  SELECT doc_id, w, h, unnest(generate_series(0, w - 1)) AS x FROM img),
pxy AS (
  SELECT doc_id, w, h, x, unnest(generate_series(0, h - 1)) AS y FROM pxx),
f AS (
  SELECT doc_id, w, h,
    round(CAST(SUM((doc_id + 11*x + 3*y) % 256) AS DOUBLE) / (w*h), 6)
      AS mean_r,
    round(CAST(SUM((2*doc_id + 5*x + 7*y) % 256) AS DOUBLE) / (w*h), 6)
      AS mean_g,
    round(CAST(SUM((7*doc_id + x + 9*y) % 256) AS DOUBLE) / (w*h), 6)
      AS mean_b
  FROM pxy GROUP BY doc_id, w, h)
SELECT doc_id AS media_id, 'qoi' AS kind,
       CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height,
       CAST(3 AS INTEGER) AS channels, mean_r, mean_g, mean_b
FROM f
""")
def q248(spark, sf_dir):
    """QOI codec round-trip (qoiformat.org — the modern minimal image
    format, completing the BMP/WAV/PNG/GIF real-codec family):
    synthesize actual QOI streams from doc_id (the gradient pixels
    exercise RUN, INDEX, DIFF, LUMA and RGB chunk types plus the
    running index hash), decode with the pure-Python chunk walker,
    emit per-channel means.  The oracle computes the expected means
    analytically and never sees a byte — a hash match proves the
    greedy encoder, every chunk decode branch, the 64-slot index and
    the wrap-around diff arithmetic are all correct."""
    from ultraviolet_spark.operators.multimodal import (
        decode_features, synthesize_qoi)

    media = synthesize_qoi(_t(spark, sf_dir, "documents").select("doc_id"))
    return (decode_features(media)
            .select("media_id", "kind", "width", "height", "channels",
                    "mean_r", "mean_g", "mean_b"))


_Q249_VOCAB = ["un", "##aff", "##able", "##ed", "##ing", "hug", "##g",
               "##s", "play", "##ful", "##ly", "walk", "run", "##n"]
_Q249_LEX = [
    ("unaffable", "un|##aff|##able"),
    ("hugging", "hug|##g|##ing"),
    ("huggs", "hug|##g|##s"),
    ("playfully", "play|##ful|##ly"),
    ("walked", "walk|##ed"),
    ("running", "run|##n|##ing"),
    ("xyz", "[UNK]"),
    ("walkzzz", "[UNK]"),
    ("play", "play"),
    ("hugs", "hug|##s"),
]


def _q249_sql() -> str:
    vals = ", ".join(f"({i}, '{w}', '{p}')"
                     for i, (w, p) in enumerate(_Q249_LEX))
    return f"""
WITH lex(idx, word, pieces) AS (VALUES {vals}),
d AS (SELECT doc_id, doc_id % 10 AS idx FROM documents)
SELECT l.word, l.pieces,
       CAST(length(l.pieces)
            - length(replace(l.pieces, '|', '')) + 1 AS BIGINT)
         AS n_pieces,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(MIN(d.doc_id) AS BIGINT) AS first_doc
FROM d JOIN lex l ON l.idx = d.idx
GROUP BY l.word, l.pieces
"""


@q("q249_wordpiece_tokens", _q249_sql())
def q249(spark, sf_dir):
    """WordPiece subword segmentation (the BERT tokenizer's greedy
    longest-match-first inference side) over a document-weighted
    lexicon whose segmentations are hand-derivable: continuation
    pieces carry ##, an unmatched cursor collapses the WHOLE word to
    [UNK] (the published all-or-nothing rule — walkzzz is [UNK], not
    walk + junk).  The engine runs the real vocabulary-route pipeline
    — distinct words through an Arrow UDF, broadcast join back — and
    the oracle knows only the literal expected piece strings, so a
    greedy tie broken short, a missing ## prefix, or a partial-emit
    bug re-segments a word and diverges the rows."""
    from ultraviolet_spark.operators.tokenize import wordpiece_tokens

    words = F.array(*[F.lit(w) for w, _ in _Q249_LEX])
    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.element_at(words, (F.col("doc_id") % 10 + 1).cast("int"))
         .alias("token"))
    segged = wordpiece_tokens(d, _Q249_VOCAB)
    return (segged
            .select("doc_id", "token",
                    F.array_join("pieces", "|").alias("pieces"),
                    F.size("pieces").cast("long").alias("n_pieces"))
            .groupBy(F.col("token").alias("word"), "pieces", "n_pieces")
            .agg(F.count("*").cast("long").alias("n_tokens"),
                 F.min("doc_id").cast("long").alias("first_doc")))


@q("q250_rate_limit_schedule", """
WITH e AS (
  SELECT user_id, ts, epoch_us(ts) AS b,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn
  FROM events),
s AS (
  SELECT user_id, b,
         MAX(b - rn * 120000000) OVER
           (PARTITION BY user_id ORDER BY rn
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         + rn * 120000000 AS su
  FROM e)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_reqs,
       make_timestamp(MAX(su)) AS last_sched,
       CAST(SUM(su - b) AS BIGINT) AS total_wait_us,
       CAST(MAX(su - b) AS BIGINT) AS max_wait_us
FROM s GROUP BY user_id
""")
def q250(spark, sf_dir):
    """Clock-based per-key rate limiting (politeness in EVENT time):
    request i serves at max(ready_i, sched_{i-1} + 120 s) — the
    recursion computed by its exact max-plus closed form sched_i =
    i·d + max_{j≤i}(ready_j − j·d), one row_number plus one running-
    max window sharing a single key exchange, exact integer µs.  The
    oracle replays the identical window algebra in DuckDB; the
    streaming twin (streaming_rate_limit, one int64 of state per key)
    is pinned ≡ this batch form across micro-batch boundaries in
    tests.  A wrong prefix max, an off-by-one in the row index, or
    float time arithmetic diverges total/max waits."""
    from ultraviolet_spark.operators.windows import rate_limit_schedule

    ev = _t(spark, sf_dir, "events").select("user_id", "ts", "event_id")
    out = rate_limit_schedule(ev, by="user_id", ready_col="ts",
                              delay_s=120, tiebreak="event_id")
    return (out.groupBy("user_id")
            .agg(F.count("*").cast("long").alias("n_reqs"),
                 F.max("sched_ts").alias("last_sched"),
                 F.sum("sched_wait_us").cast("long")
                  .alias("total_wait_us"),
                 F.max("sched_wait_us").cast("long")
                  .alias("max_wait_us")))


@q("q251_heaps_law_fit", """
WITH t AS (
  SELECT doc_id AS d,
         unnest(string_split_regex(lower(trim(text)), '\\s+')) AS token
  FROM documents WHERE length(trim(text)) > 0),
ft AS (SELECT token, MIN(d) AS first_d FROM t GROUP BY token),
npd AS (SELECT first_d AS d, COUNT(*) AS new_toks FROM ft GROUP BY 1),
cpd AS (SELECT d, COUNT(*) AS n_toks FROM t GROUP BY d),
pd_ AS (SELECT cpd.d, cpd.n_toks, COALESCE(npd.new_toks, 0) AS new_toks
        FROM cpd LEFT JOIN npd ON npd.d = cpd.d),
pts AS (
  SELECT CAST(round(ln(CAST(SUM(n_toks) OVER w AS DOUBLE)) * 1e6)
              AS BIGINT) AS x,
         CAST(round(ln(CAST(SUM(new_toks) OVER w AS DOUBLE)) * 1e6)
              AS BIGINT) AS y
  FROM pd_
  WINDOW w AS (ORDER BY d
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_points,
         CAST(SUM(x) AS BIGINT) AS sum_x,
         CAST(SUM(y) AS BIGINT) AS sum_y,
         CAST(SUM(x * x) AS BIGINT) AS sum_xx,
         CAST(SUM(x * y) AS BIGINT) AS sum_xy
  FROM pts)
SELECT n_points, sum_x, sum_y, sum_xx, sum_xy,
       round(CAST(CAST(n_points AS HUGEINT) * sum_xy
                  - CAST(sum_x AS HUGEINT) * sum_y AS DOUBLE)
             / CAST(CAST(n_points AS HUGEINT) * sum_xx
                    - CAST(sum_x AS HUGEINT) * sum_x AS DOUBLE), 6)
         AS beta
FROM s
""")
def q251(spark, sf_dir):
    """Heaps'-law vocabulary-growth fit V(n) ≈ K·n^β — the capacity-
    planning number behind every vocabulary-route operator (stemmer,
    WordPiece, postings dictionary).  The engine computes the
    cumulative (tokens, vocabulary) growth points with the DISTRIBUTED
    two-phase prefix sum (contiguous doc-range buckets, in-bucket
    cumsum, broadcast bucket offsets — no global single-partition
    window), while the oracle uses a plain global window: the integer
    points are equal by construction, so the mechanisms cross-check
    each other.  β comes from log-log OLS with each ln snapped to
    integer micro-nats before order-independent summing; the exact
    int64 sufficient statistics ship in the output next to β."""
    from ultraviolet_spark.operators.textstats import heaps_fit

    return heaps_fit(_t(spark, sf_dir, "documents"))


@q("q252_target_encoding", """
WITH e AS (
  SELECT event_id, event_type, epoch_us(ts) AS um,
         CAST(round(value * 1e6) AS BIGINT) AS t
  FROM events),
enc AS (
  SELECT event_id, event_type, t,
         COUNT(t) OVER wcat AS n_past_cat,
         COALESCE(SUM(t) OVER wcat, 0) AS s_cat,
         COUNT(t) OVER wall AS n_past_all,
         COALESCE(SUM(t) OVER wall, 0) AS s_all,
         COUNT(t) OVER wcat_all AS cat_n,
         SUM(t) OVER wcat_all AS cat_sum
  FROM e
  WINDOW wcat AS (PARTITION BY event_type ORDER BY um
                  RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
         wall AS (ORDER BY um
                  RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
         wcat_all AS (PARTITION BY event_type))
SELECT event_id, event_type, n_past_cat, n_past_all,
       CASE WHEN n_past_all > 0 THEN
         round((CAST(s_cat AS DOUBLE)
                + 20.0 * (CAST(s_all AS DOUBLE)
                          / CAST(n_past_all AS DOUBLE)))
               / (CAST(n_past_cat AS DOUBLE) + 20.0) / 1e6, 6)
       END AS enc_pit,
       CASE WHEN cat_n > 1 THEN
         round(CAST(cat_sum - t AS DOUBLE)
               / CAST(cat_n - 1 AS DOUBLE) / 1e6, 6)
       END AS enc_loo,
       cat_n - 1 AS n_other
FROM enc
""")
def q252(spark, sf_dir):
    """Leakage-safe categorical target encoding over the event stream —
    the labels-side twin of the flagship's zero-leakage feature rule.
    ``enc_pit`` is the point-in-time smoothed estimator (same-category
    mean over rows at STRICTLY earlier event time via RANGE windows on
    integer microseconds — tiebreak-free, and same-timestamp rows
    never see each other's labels — Bayesian-smoothed toward the
    strictly-earlier GLOBAL mean with pseudo-count 20, so the prior
    itself is leakage-free); ``enc_loo`` is the batch leave-one-out
    companion.  The engine computes the global expanding prior with
    the two-phase time-bucketed prefix sum (no data-sized
    single-partition window); the oracle replays it with a plain
    global range window — equal integers by construction, different
    mechanism."""
    from ultraviolet_spark.operators.targetenc import (
        loo_target_encode, pit_target_encode)

    ev = _t(spark, sf_dir, "events")
    out = pit_target_encode(ev, cat_col="event_type", ts_col="ts",
                            target_col="value", prior_weight=20)
    out = loo_target_encode(out, cat_col="event_type",
                            target_col="value")
    return out.select("event_id", "event_type", "n_past_cat",
                      "n_past_all", "enc_pit", "enc_loo", "n_other")


@q("q253_ks_mannwhitney_drift", """
WITH base AS (
  SELECT CAST(round(value * 1e6) AS BIGINT) AS v, event_type AS g
  FROM events
  WHERE event_type IN ('click', 'purchase') AND value IS NOT NULL),
pv AS (
  SELECT v,
         CAST(SUM(CASE WHEN g = 'click' THEN 1 ELSE 0 END)
              AS BIGINT) AS ca,
         CAST(SUM(CASE WHEN g = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS cb
  FROM base GROUP BY v),
c AS (
  SELECT v, ca, cb,
         CAST(SUM(ca) OVER w AS BIGINT) AS cum_a,
         CAST(SUM(cb) OVER w AS BIGINT) AS cum_b
  FROM pv
  WINDOW w AS (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
t AS (SELECT CAST(SUM(ca) AS BIGINT) AS n_a,
             CAST(SUM(cb) AS BIGINT) AS n_b FROM pv)
SELECT t.n_a, t.n_b,
       MAX(abs(c.cum_a * t.n_b - c.cum_b * t.n_a)) AS ks_num,
       round(CAST(MAX(abs(c.cum_a * t.n_b - c.cum_b * t.n_a)) AS DOUBLE)
             / CAST(t.n_a * t.n_b AS DOUBLE), 6) AS ks_stat,
       CAST(SUM(c.ca * (2 * (c.cum_b - c.cb) + c.cb)) AS BIGINT) AS u2_a,
       round(CAST(SUM(c.ca * (2 * (c.cum_b - c.cb) + c.cb)) AS DOUBLE)
             / CAST(2 * t.n_a * t.n_b AS DOUBLE), 6) AS auc_a
FROM c, t GROUP BY t.n_a, t.n_b
""")
def q253(spark, sf_dir):
    """Exact two-sample Kolmogorov–Smirnov + Mann–Whitney drift tests
    between click-values and purchase-values — binning-free CDF drift
    (KS) and the exact rank-sum effect size (U/(n·m) = AUC), both as
    exact integers (ks_num, doubled-U) until one final division.  The
    engine's prefix sums over the distinct-value frame run through the
    two-phase value-range bucketed cumsum; the oracle replays them
    with a plain global window — equal integers, different mechanism."""
    from ultraviolet_spark.operators.stats import ks_mw_tests

    return ks_mw_tests(_t(spark, sf_dir, "events"),
                       value_col="value", group_col="event_type",
                       group_a="click", group_b="purchase")


@q("q254_release_digest_drill", """
WITH a AS (SELECT doc_id, text, lang, source, n_chars FROM documents),
b AS (
  SELECT doc_id,
         CASE WHEN doc_id = 7 THEN text || ' EDITED' ELSE text END AS text,
         lang, source,
         CASE WHEN doc_id = 7 THEN n_chars + 7 ELSE n_chars END AS n_chars
  FROM documents WHERE doc_id <> 13
  UNION ALL
  SELECT (SELECT MAX(doc_id) + 1 FROM documents),
         'brand new document', 'en', 'synthetic', 18),
ha AS (
  SELECT doc_id,
         (strpos('0123456789abcdef',
                 substring(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
         + (strpos('0123456789abcdef',
                   substring(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1)
           AS bucket,
         CAST(CAST(('0x' || substr(md5(
           CAST(doc_id AS VARCHAR) || chr(31) || text || chr(31) || lang
           || chr(31) || source || chr(31) || CAST(n_chars AS VARCHAR)
         ), 1, 12)) AS UBIGINT) AS BIGINT) AS h
  FROM a),
hb AS (
  SELECT doc_id,
         (strpos('0123456789abcdef',
                 substring(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
         + (strpos('0123456789abcdef',
                   substring(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1)
           AS bucket,
         CAST(CAST(('0x' || substr(md5(
           CAST(doc_id AS VARCHAR) || chr(31) || text || chr(31) || lang
           || chr(31) || source || chr(31) || CAST(n_chars AS VARCHAR)
         ), 1, 12)) AS UBIGINT) AS BIGINT) AS h
  FROM b)
SELECT COALESCE(ha.doc_id, hb.doc_id) AS doc_id,
       COALESCE(ha.bucket, hb.bucket) AS bucket,
       CASE WHEN hb.doc_id IS NULL THEN 'removed'
            WHEN ha.doc_id IS NULL THEN 'added'
            WHEN ha.h <> hb.h THEN 'changed' END AS status
FROM ha FULL JOIN hb ON ha.doc_id = hb.doc_id
WHERE (hb.doc_id IS NULL OR ha.doc_id IS NULL OR ha.h <> hb.h)
""")
def q254(spark, sf_dir):
    """Merkle-style release audit end-to-end: release B edits doc 7,
    deletes doc 13 and appends one new document; the engine digests
    BOTH releases into 256-row (bucket, count, xor48, sum48 mod 2^48)
    frames keyed on md5(doc_id), diffs the digests at metadata cost,
    and drills row-level ONLY into the differing buckets.  The oracle
    never sees a digest — it computes the affected-doc statuses from a
    direct full join over all rows — so a hash match proves the Merkle
    mechanism missed nothing and drilled to exactly the true
    added/removed/changed set."""
    from ultraviolet_spark.operators.history import (
        digest_diff, digest_drill, release_digest)

    docs = _t(spark, sf_dir, "documents")
    newrow = docs.agg(F.max("doc_id").alias("m")).select(
        (F.col("m") + 1).alias("doc_id"),
        F.lit("brand new document").alias("text"),
        F.lit("en").alias("lang"),
        F.lit("synthetic").alias("source"),
        F.lit(18).cast("long").alias("n_chars"))
    is7 = F.col("doc_id") == 7
    rel_b = (docs.filter(F.col("doc_id") != 13)
             .withColumn("text",
                         F.when(is7, F.concat(F.col("text"),
                                              F.lit(" EDITED")))
                         .otherwise(F.col("text")))
             .withColumn("n_chars",
                         F.when(is7, F.col("n_chars") + 7)
                         .otherwise(F.col("n_chars")))
             .unionByName(newrow))
    cand = digest_diff(release_digest(docs, key_col="doc_id"),
                       release_digest(rel_b, key_col="doc_id"))
    return digest_drill(docs, rel_b, cand, key_col="doc_id")


@q("q255_purged_kfold_cv", """
WITH b AS (SELECT MIN(epoch_us(ts)) AS lo, MAX(epoch_us(ts)) AS hi
           FROM events),
f AS (SELECT CAST(t.i AS INTEGER) AS fold,
             lo + t.i * ((hi - lo) // 5 + 1) AS s,
             lo + (t.i + 1) * ((hi - lo) // 5 + 1) AS e
      FROM range(5) t(i), b),
r AS (SELECT f.fold,
             CASE WHEN ev.um >= f.s AND ev.um < f.e THEN 'test'
                  WHEN ev.um < f.s AND ev.um + 3600000000 > f.s
                    THEN 'purged'
                  WHEN ev.um >= f.e AND ev.um < f.e + 1800000000
                    THEN 'embargo'
                  ELSE 'train' END AS role,
             ev.event_id
      FROM (SELECT epoch_us(ts) AS um, event_id FROM events) ev, f)
SELECT fold, role, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(event_id) AS BIGINT) AS sum_ids
FROM r GROUP BY fold, role
""")
def q255(spark, sf_dir):
    """Purged k-fold CV with embargo over the event stream (5 folds,
    1 h label horizon, 30 min embargo) — the leakage-safe
    cross-validation split: training samples whose label window pokes
    into a fold's test range are purged, samples in the 30 min after
    it embargoed.  Output is the per-(fold, role) census with an
    id-sum witness, so one misassigned row anywhere in the k×
    expansion diverges the hash."""
    from ultraviolet_spark.operators.corpus import purged_kfold

    out = purged_kfold(_t(spark, sf_dir, "events"), ts_col="ts",
                       n_folds=5, horizon_us=3_600_000_000,
                       embargo_us=1_800_000_000)
    return (out.groupBy("fold", "role")
            .agg(F.count("*").alias("n"),
                 F.sum("event_id").alias("sum_ids")))


@q("q256_waterfill_fair_budget", """
WITH d AS (SELECT CAST(user_id AS VARCHAR) AS host,
                  CAST(COUNT(*) AS BIGINT) AS dem
           FROM events GROUP BY user_id),
tot AS (SELECT CAST(SUM(dem) AS BIGINT) AS td,
               CAST(COUNT(*) AS BIGINT) AS n FROM d),
bb AS (SELECT td // 3 AS b, n FROM tot),
r AS (SELECT host, dem,
             CAST(ROW_NUMBER() OVER (ORDER BY dem, host) AS BIGINT) AS rk,
             CAST(SUM(dem) OVER (ORDER BY dem, host
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS s
      FROM d),
sc AS (SELECT COALESCE(MAX(CASE WHEN s + dem * (bb.n - rk) <= bb.b
                                THEN rk END), 0) AS rstar,
              COALESCE(MAX(CASE WHEN s + dem * (bb.n - rk) <= bb.b
                                THEN s END), 0) AS sstar
       FROM r, bb),
lvl AS (SELECT rstar, sstar,
               CASE WHEN bb.n - rstar > 0
                    THEN (bb.b - sstar) // (bb.n - rstar)
                    ELSE 0 END AS theta,
               CASE WHEN bb.n - rstar > 0
                    THEN (bb.b - sstar) % (bb.n - rstar)
                    ELSE 0 END AS rem
        FROM sc, bb)
SELECT r.host, r.dem AS demand,
       CAST(CASE WHEN r.rk <= lvl.rstar THEN r.dem
                 WHEN r.rk - lvl.rstar <= lvl.rem THEN lvl.theta + 1
                 ELSE lvl.theta END AS BIGINT) AS alloc
FROM r, lvl
""")
def q256(spark, sf_dir):
    """Max-min fair (water-filling) allocation of a global crawl
    budget (one third of total demand) across per-user demand counts:
    small hosts get their full demand, big hosts are levelled at the
    exact integer water level θ with the mod-remainder distributed
    deterministically — no stranded budget while anyone still wants
    pages.  The engine finds θ via bucketed two-phase rank/prefix
    sums; the oracle replays the identical integer algebra with plain
    global windows."""
    from ultraviolet_spark.operators.frontier import waterfill_budget

    dem = (_t(spark, sf_dir, "events")
           .groupBy(F.col("user_id").cast("string").alias("host"))
           .agg(F.count("*").alias("demand")))
    return waterfill_budget(dem, budget="__td div 3")


@q("q257_split_conformal", """
WITH base AS (
  SELECT CAST(round(value * 1e6) AS BIGINT) AS v,
         CASE WHEN (strpos('0123456789abcdef',
                    substring(md5(CAST(event_id AS VARCHAR)), 1, 1)) - 1)
                   * 16
                 + (strpos('0123456789abcdef',
                    substring(md5(CAST(event_id AS VARCHAR)), 2, 1)) - 1)
                   < 128
              THEN 'cal' ELSE 'test' END AS side
  FROM events WHERE value IS NOT NULL),
cv AS (
  SELECT v, CAST(SUM(cnt) OVER (ORDER BY v
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS BIGINT) AS cum
  FROM (SELECT v, COUNT(*) AS cnt FROM base WHERE side = 'cal'
        GROUP BY v)),
kk AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_cal,
              ((CAST(COUNT(*) AS BIGINT) + 1) * 9 + 9) // 10 AS k
       FROM base WHERE side = 'cal'),
q AS (SELECT kk.n_cal, kk.k,
             MIN(CASE WHEN cv.cum >= kk.k THEN cv.v END) AS qhat_micro
      FROM cv, kk GROUP BY kk.n_cal, kk.k)
SELECT q.n_cal, q.k, q.qhat_micro,
       CAST(COUNT(*) AS BIGINT) AS n_test,
       CAST(SUM(CASE WHEN q.qhat_micro IS NULL OR t.v <= q.qhat_micro
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_covered,
       round(CAST(SUM(CASE WHEN q.qhat_micro IS NULL
                           OR t.v <= q.qhat_micro
                           THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE), 6) AS coverage
FROM base t, q
WHERE t.side = 'test'
GROUP BY q.n_cal, q.k, q.qhat_micro
""")
def q257(spark, sf_dir):
    """Split-conformal calibration at α = 1/10 over event values:
    md5-deterministic cal/test halves, q̂ = the ⌈(n+1)·9/10⌉-th
    smallest calibration score found by bucketed cumulative counts
    (never a global sort), and empirical test coverage — the
    distribution-free ≥ 90 % guarantee made checkable.  The rank k is
    one integer ceiling-division of exact int64s; the oracle replays
    it with a plain global cumulative window."""
    from ultraviolet_spark.operators.evalmetrics import split_conformal

    return split_conformal(_t(spark, sf_dir, "events"),
                           value_col="value", id_col="event_id",
                           a_num=1, a_den=10)


@q("q258_quantile_normalize", """
WITH ex AS (
  SELECT vec_id,
         CAST(generate_subscripts(embedding, 1) - 1 AS INTEGER) AS dim,
         CAST(round(CAST(unnest(embedding) AS DOUBLE) * 1e6) AS BIGINT)
           AS v
  FROM embeddings),
r AS (SELECT vec_id, dim, v,
             CAST(ROW_NUMBER() OVER (PARTITION BY dim
                                     ORDER BY v, vec_id) AS BIGINT) AS rk
      FROM ex),
ref AS (SELECT rk, CAST(SUM(v) AS BIGINT) AS sum_v,
               CAST(COUNT(*) AS BIGINT) AS n_dims
        FROM r GROUP BY rk)
SELECT r.vec_id, r.dim, r.rk,
       round(CAST(ref.sum_v AS DOUBLE) / CAST(ref.n_dims AS DOUBLE)
             / 1e6, 6) AS norm
FROM r JOIN ref USING (rk)
""")
def q258(spark, sf_dir):
    """Quantile normalization of the embedding matrix: every dimension
    is forced onto one shared reference distribution (the per-rank
    cross-dimension mean) — the scale fix applied before cosine/L2
    retrieval or per-dim quantization.  Ranks use the deterministic
    (value, id) total order; the engine's per-dim rank is two-phase
    ((dim, value-bucket) row_numbers + broadcast per-dim bucket
    offsets, so no dimension ever lands in a single task), while the
    oracle ranks with a plain PARTITION BY dim window — equal integers
    by construction."""
    from ultraviolet_spark.operators.vectorize import quantile_normalize

    return quantile_normalize(_t(spark, sf_dir, "embeddings"))


@q("q259_woe_information_value", """
WITH per AS (
  SELECT source AS cat,
         CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
           AS pos_c,
         CAST(SUM(CASE WHEN lang = 'en' THEN 0 ELSE 1 END) AS BIGINT)
           AS neg_c
  FROM documents GROUP BY source),
tot AS (SELECT CAST(SUM(pos_c) AS BIGINT) AS pt,
               CAST(SUM(neg_c) AS BIGINT) AS nt,
               CAST(COUNT(*) AS BIGINT) AS k FROM per),
w AS (
  SELECT cat, pos_c, neg_c,
         CAST(round((ln(CAST(2 * pos_c + 1 AS DOUBLE))
                     - ln(CAST(2 * pt + k AS DOUBLE))
                     - ln(CAST(2 * neg_c + 1 AS DOUBLE))
                     + ln(CAST(2 * nt + k AS DOUBLE))) * 1e6)
              AS BIGINT) AS woe_micro,
         pt, nt, k
  FROM per, tot)
SELECT cat, pos_c, neg_c, woe_micro,
       CAST(round((CAST(2 * pos_c + 1 AS DOUBLE)
                   / CAST(2 * pt + k AS DOUBLE)
                   - CAST(2 * neg_c + 1 AS DOUBLE)
                     / CAST(2 * nt + k AS DOUBLE))
                  * (CAST(woe_micro AS DOUBLE) / 1e6) * 1e6)
            AS BIGINT) AS iv_contrib_micro
FROM w
""")
def q259(spark, sf_dir):
    """Weight of evidence + information value of the document source
    predicting English-ness: per-source log-odds with half-count
    smoothing held exact by integer doubling, snapped once to
    micro-nats in a fixed operand order, and the IV contribution
    snapped per category BEFORE any sum so total IV is an
    order-independent integer.  Complements chi² feature selection
    with the monotone-model view."""
    from ultraviolet_spark.operators.stats import woe_iv

    return woe_iv(_t(spark, sf_dir, "documents"),
                  cat_col="source", label_expr="lang = 'en'")


@q("q260_lexical_diversity", """
WITH t AS (
  SELECT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS token
  FROM documents WHERE length(trim(text)) > 0),
freq AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS f FROM t
         GROUP BY token),
agg AS (
  SELECT CAST(SUM(f) AS BIGINT) AS n_tokens,
         CAST(COUNT(*) AS BIGINT) AS n_types,
         CAST(SUM(CASE WHEN f = 1 THEN 1 ELSE 0 END) AS BIGINT) AS v1,
         CAST(SUM(CASE WHEN f = 2 THEN 1 ELSE 0 END) AS BIGINT) AS v2,
         SUM(CAST(f AS HUGEINT) * (CAST(f AS HUGEINT) - 1)) AS sff1,
         SUM(CAST(f AS HUGEINT) * CAST(f AS HUGEINT)) AS sff
  FROM freq)
SELECT n_tokens, n_types, v1, v2,
       round(CAST(v1 AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6)
         AS p0_unseen,
       round(CAST(n_types AS DOUBLE)
             + CAST(v1 AS DOUBLE) * CAST(v1 - 1 AS DOUBLE)
               / (2.0 * CAST(v2 + 1 AS DOUBLE)), 6) AS chao1,
       round(CAST(sff1 AS DOUBLE)
             / (CAST(n_tokens AS DOUBLE)
                * (CAST(n_tokens AS DOUBLE) - 1.0)) * 1e6, 6)
         AS simpson_micro,
       round((CAST(sff AS DOUBLE) - CAST(n_tokens AS DOUBLE))
             / (CAST(n_tokens AS DOUBLE) * CAST(n_tokens AS DOUBLE))
             * 1e10, 6) AS yule_k_micro
FROM agg
""")
def q260(spark, sf_dir):
    """Lexical-diversity / vocabulary-coverage report over the corpus:
    hapax/dis-legomena counts, Good–Turing unseen mass V₁/N, the
    bias-corrected Chao1 richness lower bound, Simpson's collision
    probability and Yule's K — all from the counts-of-counts frame
    (two map-side-combined exchanges), moment sums in DECIMAL(38,0)
    because Σf² crosses int64 at web scale, divisions as fixed-order
    doubles at the very end."""
    from ultraviolet_spark.operators.textstats import lexical_diversity

    return lexical_diversity(_t(spark, sf_dir, "documents"))


@q("q261_poisson_bootstrap_ci", """
WITH base AS (
  SELECT CAST(event_id AS VARCHAR) AS id,
         CAST(round(value * 1e6) AS BIGINT) AS x
  FROM events WHERE value IS NOT NULL),
est AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
               round(CAST(SUM(CAST(x AS HUGEINT)) AS DOUBLE)
                     / CAST(COUNT(*) AS DOUBLE) / 1e6, 6) AS mean_est
        FROM base),
e AS (SELECT id, x, CAST(t.i AS BIGINT) AS b FROM base, range(40) t(i)),
ww AS (SELECT b, x,
         CAST(CAST(('0x' || substr(md5(id || ':' || CAST(b AS VARCHAR)
                                   || ':'), 1, 12)) AS UBIGINT)
              AS BIGINT) AS u
       FROM e),
per AS (SELECT b,
          SUM(CAST(((CASE WHEN u >= 103548857136060 THEN 1 ELSE 0 END) + (CASE WHEN u >= 207097714272121 THEN 1 ELSE 0 END) + (CASE WHEN u >= 258872142840152 THEN 1 ELSE 0 END) + (CASE WHEN u >= 276130285696162 THEN 1 ELSE 0 END) + (CASE WHEN u >= 280444821410164 THEN 1 ELSE 0 END) + (CASE WHEN u >= 281307728552965 THEN 1 ELSE 0 END) + (CASE WHEN u >= 281451546410098 THEN 1 ELSE 0 END) + (CASE WHEN u >= 281472091818260 THEN 1 ELSE 0 END) + (CASE WHEN u >= 281474659994280 THEN 1 ELSE 0 END)) AS HUGEINT) * x) AS swx,
          CAST(SUM(((CASE WHEN u >= 103548857136060 THEN 1 ELSE 0 END) + (CASE WHEN u >= 207097714272121 THEN 1 ELSE 0 END) + (CASE WHEN u >= 258872142840152 THEN 1 ELSE 0 END) + (CASE WHEN u >= 276130285696162 THEN 1 ELSE 0 END) + (CASE WHEN u >= 280444821410164 THEN 1 ELSE 0 END) + (CASE WHEN u >= 281307728552965 THEN 1 ELSE 0 END) + (CASE WHEN u >= 281451546410098 THEN 1 ELSE 0 END) + (CASE WHEN u >= 281472091818260 THEN 1 ELSE 0 END) + (CASE WHEN u >= 281474659994280 THEN 1 ELSE 0 END))) AS BIGINT) AS sw
        FROM ww GROUP BY b),
m AS (SELECT b, round(CAST(swx AS DOUBLE) / CAST(sw AS DOUBLE) / 1e6, 6)
               AS mean_b FROM per),
r AS (SELECT mean_b, ROW_NUMBER() OVER (ORDER BY mean_b, b) AS rk FROM m),
ci AS (SELECT MAX(CASE WHEN rk = 2 THEN mean_b END) AS ci_lo,
              MAX(CASE WHEN rk = 39 THEN mean_b END) AS ci_hi,
              CAST(COUNT(*) AS BIGINT) AS b_reps FROM r)
SELECT est.n, est.mean_est, ci.b_reps, ci.ci_lo, ci.ci_hi FROM est, ci
""")
def q261(spark, sf_dir):
    """95 % Poisson-bootstrap CI for the mean event value: B = 40
    replicates whose per-(row, replicate) Poisson(1) weights derive
    from md5 48-bit uniforms against hardcoded inverse-CDF integer
    thresholds — the resampling scheme that distributes (classical
    with-replacement draws are a global operation; Poisson weights
    are row-local), fully deterministic and engine-portable.  CI ends
    are exact order statistics of the B replicate means; the oracle
    replays every threshold comparison."""
    from ultraviolet_spark.operators.stats import poisson_bootstrap_ci

    return poisson_bootstrap_ci(_t(spark, sf_dir, "events"),
                                value_col="value", id_col="event_id",
                                n_reps=40)


@q("q262_mutual_information", """
WITH cells AS (
  SELECT lang AS a, source AS b, CAST(COUNT(*) AS BIGINT) AS n_ab
  FROM documents GROUP BY lang, source),
ma AS (SELECT a, CAST(SUM(n_ab) AS BIGINT) AS n_a FROM cells GROUP BY a),
mb AS (SELECT b, CAST(SUM(n_ab) AS BIGINT) AS n_b FROM cells GROUP BY b),
tot AS (SELECT CAST(SUM(n_ab) AS BIGINT) AS n FROM cells),
w AS (
  SELECT cells.a, cells.b, cells.n_ab, ma.n_a, mb.n_b,
         CAST(round((ln(CAST(CAST(tot.n AS HUGEINT)
                             * cells.n_ab AS DOUBLE))
                     - ln(CAST(CAST(ma.n_a AS HUGEINT)
                               * mb.n_b AS DOUBLE))) * 1e6)
              AS BIGINT) AS pmi_micro,
         tot.n
  FROM cells JOIN ma USING (a) JOIN mb USING (b), tot)
SELECT a, b, n_ab, n_a, n_b, pmi_micro,
       CAST(round(CAST(n_ab AS DOUBLE) / CAST(n AS DOUBLE)
                  * CAST(pmi_micro AS DOUBLE)) AS BIGINT)
         AS mi_contrib_micro
FROM w
""")
def q262(spark, sf_dir):
    """Mutual information between document language and source with
    the per-cell PMI decomposition: each pointwise term snaps to
    integer micro-nats in a fixed operand order, each cell's weighted
    contribution snaps BEFORE summation, so total MI is an
    order-independent integer sum.  Completes the dependence family
    (chi², WOE/IV) with the information-theoretic view."""
    from ultraviolet_spark.operators.stats import mutual_information

    return mutual_information(_t(spark, sf_dir, "documents"),
                              col_a="lang", col_b="source")


@q("q263_logreg_irls", """
WITH base AS (
  SELECT CASE WHEN event_type = 'purchase' THEN 1.0 ELSE 0.0 END AS y,
         CAST(CAST(round(value * 1e6) AS BIGINT) AS DOUBLE) / 1e6 AS x1,
         CAST(CAST(round(CAST(EXTRACT(hour FROM ts) AS DOUBLE) * 1e6)
              AS BIGINT) AS DOUBLE) / 1e6 AS x2
  FROM events WHERE value IS NOT NULL),
nb0 AS (SELECT CAST(0 AS BIGINT) AS b0m, CAST(0 AS BIGINT) AS b1m,
               CAST(0 AS BIGINT) AS b2m),
it1 AS (
  SELECT base.*, (CAST(nb0.b0m AS DOUBLE)
                  + CAST(nb0.b1m AS DOUBLE) * x1
                  + CAST(nb0.b2m AS DOUBLE) * x2) / 1e6 AS eta
  FROM base, nb0),
row1 AS (
  SELECT y, x1, x2, eta,
         1.0 / (1.0 + exp(-eta)) AS mu,
         (1.0 / (1.0 + exp(-eta)))
           * (1.0 - (1.0 / (1.0 + exp(-eta)))) AS w,
         eta + (y - (1.0 / (1.0 + exp(-eta))))
               / ((1.0 / (1.0 + exp(-eta)))
                  * (1.0 - (1.0 / (1.0 + exp(-eta))))) AS z
  FROM it1),
sum1 AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(round(w * 1e6) AS BIGINT)) AS BIGINT) AS s11,
         CAST(SUM(CAST(round(w*x1 * 1e6) AS BIGINT)) AS BIGINT) AS s12,
         CAST(SUM(CAST(round(w*x2 * 1e6) AS BIGINT)) AS BIGINT) AS s13,
         CAST(SUM(CAST(round(w*x1*x1 * 1e6) AS BIGINT)) AS BIGINT) AS s22,
         CAST(SUM(CAST(round(w*x1*x2 * 1e6) AS BIGINT)) AS BIGINT) AS s23,
         CAST(SUM(CAST(round(w*x2*x2 * 1e6) AS BIGINT)) AS BIGINT) AS s33,
         CAST(SUM(CAST(round(w*z * 1e6) AS BIGINT)) AS BIGINT) AS t1,
         CAST(SUM(CAST(round(w*z*x1 * 1e6) AS BIGINT)) AS BIGINT) AS t2,
         CAST(SUM(CAST(round(w*z*x2 * 1e6) AS BIGINT)) AS BIGINT) AS t3
  FROM row1),
dd1 AS (
  SELECT n,
         CAST(s11 AS DOUBLE) AS ds11, CAST(s12 AS DOUBLE) AS ds12,
         CAST(s13 AS DOUBLE) AS ds13, CAST(s22 AS DOUBLE) AS ds22,
         CAST(s23 AS DOUBLE) AS ds23, CAST(s33 AS DOUBLE) AS ds33,
         CAST(t1 AS DOUBLE) AS dt1, CAST(t2 AS DOUBLE) AS dt2,
         CAST(t3 AS DOUBLE) AS dt3
  FROM sum1),
mm1 AS (
  SELECT *, ds22 * ds33 - ds23 * ds23 AS m11,
            ds12 * ds33 - ds23 * ds13 AS m12,
            ds12 * ds23 - ds22 * ds13 AS m13
  FROM dd1),
dt1 AS (
  SELECT *,
    ds11 * m11 - ds12 * m12 + ds13 * m13 AS det,
    dt1 * m11 - ds12 * (dt2 * ds33 - ds23 * dt3)
      + ds13 * (dt2 * ds23 - ds22 * dt3) AS det0,
    ds11 * (dt2 * ds33 - ds23 * dt3) - dt1 * m12
      + ds13 * (ds12 * dt3 - dt2 * ds13) AS det1,
    ds11 * (ds22 * dt3 - dt2 * ds23) - ds12 * (ds12 * dt3 - dt2 * ds13)
      + dt1 * m13 AS det2
  FROM mm1),
nb1 AS (
  SELECT n,
    CASE WHEN det <> 0.0
         THEN CAST(round(det0 / det * 1e6) AS BIGINT) END AS b0m,
    CASE WHEN det <> 0.0
         THEN CAST(round(det1 / det * 1e6) AS BIGINT) END AS b1m,
    CASE WHEN det <> 0.0
         THEN CAST(round(det2 / det * 1e6) AS BIGINT) END AS b2m,
    det
  FROM dt1),
it2 AS (
  SELECT base.*, (CAST(nb1.b0m AS DOUBLE)
                  + CAST(nb1.b1m AS DOUBLE) * x1
                  + CAST(nb1.b2m AS DOUBLE) * x2) / 1e6 AS eta
  FROM base, nb1),
row2 AS (
  SELECT y, x1, x2, eta,
         1.0 / (1.0 + exp(-eta)) AS mu,
         (1.0 / (1.0 + exp(-eta)))
           * (1.0 - (1.0 / (1.0 + exp(-eta)))) AS w,
         eta + (y - (1.0 / (1.0 + exp(-eta))))
               / ((1.0 / (1.0 + exp(-eta)))
                  * (1.0 - (1.0 / (1.0 + exp(-eta))))) AS z
  FROM it2),
sum2 AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(round(w * 1e6) AS BIGINT)) AS BIGINT) AS s11,
         CAST(SUM(CAST(round(w*x1 * 1e6) AS BIGINT)) AS BIGINT) AS s12,
         CAST(SUM(CAST(round(w*x2 * 1e6) AS BIGINT)) AS BIGINT) AS s13,
         CAST(SUM(CAST(round(w*x1*x1 * 1e6) AS BIGINT)) AS BIGINT) AS s22,
         CAST(SUM(CAST(round(w*x1*x2 * 1e6) AS BIGINT)) AS BIGINT) AS s23,
         CAST(SUM(CAST(round(w*x2*x2 * 1e6) AS BIGINT)) AS BIGINT) AS s33,
         CAST(SUM(CAST(round(w*z * 1e6) AS BIGINT)) AS BIGINT) AS t1,
         CAST(SUM(CAST(round(w*z*x1 * 1e6) AS BIGINT)) AS BIGINT) AS t2,
         CAST(SUM(CAST(round(w*z*x2 * 1e6) AS BIGINT)) AS BIGINT) AS t3
  FROM row2),
dd2 AS (
  SELECT n,
         CAST(s11 AS DOUBLE) AS ds11, CAST(s12 AS DOUBLE) AS ds12,
         CAST(s13 AS DOUBLE) AS ds13, CAST(s22 AS DOUBLE) AS ds22,
         CAST(s23 AS DOUBLE) AS ds23, CAST(s33 AS DOUBLE) AS ds33,
         CAST(t1 AS DOUBLE) AS dt1, CAST(t2 AS DOUBLE) AS dt2,
         CAST(t3 AS DOUBLE) AS dt3
  FROM sum2),
mm2 AS (
  SELECT *, ds22 * ds33 - ds23 * ds23 AS m11,
            ds12 * ds33 - ds23 * ds13 AS m12,
            ds12 * ds23 - ds22 * ds13 AS m13
  FROM dd2),
dt2 AS (
  SELECT *,
    ds11 * m11 - ds12 * m12 + ds13 * m13 AS det,
    dt1 * m11 - ds12 * (dt2 * ds33 - ds23 * dt3)
      + ds13 * (dt2 * ds23 - ds22 * dt3) AS det0,
    ds11 * (dt2 * ds33 - ds23 * dt3) - dt1 * m12
      + ds13 * (ds12 * dt3 - dt2 * ds13) AS det1,
    ds11 * (ds22 * dt3 - dt2 * ds23) - ds12 * (ds12 * dt3 - dt2 * ds13)
      + dt1 * m13 AS det2
  FROM mm2),
nb2 AS (
  SELECT n,
    CASE WHEN det <> 0.0
         THEN CAST(round(det0 / det * 1e6) AS BIGINT) END AS b0m,
    CASE WHEN det <> 0.0
         THEN CAST(round(det1 / det * 1e6) AS BIGINT) END AS b1m,
    CASE WHEN det <> 0.0
         THEN CAST(round(det2 / det * 1e6) AS BIGINT) END AS b2m,
    det
  FROM dt2)
SELECT n, b0m AS beta0_micro, b1m AS beta1_micro, b2m AS beta2_micro,
       round(det, 2) AS det_rounded
FROM nb2
""")
def q263(spark, sf_dir):
    """In-engine logistic regression: P(purchase) ~ sigma(b0 + b1*value
    + b2*hour), two unrolled IRLS steps from beta = 0, every per-row
    normal-equation contribution snapped to integer micro-units BEFORE
    aggregation (partitioning-independent sums) and the 3x3 solve by
    Cramer's rule in a fixed operand order — a distributed GLM fit
    that is a pure function of the data, bit-equal to the DuckDB
    replay of both iterations."""
    from ultraviolet_spark.operators.mlfit import logreg_irls

    ev = _t(spark, sf_dir, "events")
    return logreg_irls(ev, x1_col="value",
                       x2_col=F.hour(F.col("ts").cast("timestamp")),
                       label_expr="event_type = 'purchase'", iters=2)


@q("q264_isotonic_calibration", """
WITH base AS (
  SELECT CAST(round(value * 1e6) AS BIGINT) AS s,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
  FROM events WHERE value IS NOT NULL),
bb AS (SELECT MIN(s) AS lo, MAX(s) AS hi FROM base),
binned AS (
  SELECT (s - lo) // ((hi - lo) // 64 + 1) AS bin,
         CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(y) AS BIGINT) AS pos
  FROM base, bb GROUP BY 1),
pre AS (
  SELECT bin, n, pos,
         CAST(SUM(n) OVER w AS BIGINT) AS cn,
         CAST(SUM(pos) OVER w AS BIGINT) AS cp
  FROM binned
  WINDOW w AS (ORDER BY bin
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
tri AS (
  SELECT m.bin, m.n, m.pos, l.bin AS j,
         CAST(round(CAST(h.cp - (l.cp - l.pos) AS DOUBLE)
                    / CAST(h.cn - (l.cn - l.n) AS DOUBLE) * 1e6)
              AS BIGINT) AS am
  FROM pre m
  JOIN pre l ON l.bin <= m.bin
  JOIN pre h ON h.bin >= m.bin),
mn AS (SELECT bin, n, pos, j, MIN(am) AS m FROM tri
       GROUP BY bin, n, pos, j)
SELECT bin, n, pos,
       CAST(round(CAST(pos AS DOUBLE) / CAST(n AS DOUBLE) * 1e6)
            AS BIGINT) AS raw_micro,
       CAST(MAX(m) AS BIGINT) AS fit_micro
FROM mn GROUP BY bin, n, pos
""")
def q264(spark, sf_dir):
    """Isotonic calibration of event value against purchase-ness over
    64 score bins, computed by the exact minimax identity fit_i =
    max_{j≤i} min_{k≥i} avg(y[j..k]) (≡ PAV) with every interval
    average µ-snapped BEFORE the lattice min/max so both engines
    compare integers; one data-sized pass, then bins³ tiny-frame
    algebra.  fit_micro is non-decreasing by construction."""
    from ultraviolet_spark.operators.evalmetrics import (
        isotonic_calibration)

    return isotonic_calibration(_t(spark, sf_dir, "events"),
                                score_col="value",
                                label_expr="event_type = 'purchase'",
                                n_bins=64)


@q("q265_kaplan_meier", """
WITH sp AS (
  SELECT user_id,
         MIN(epoch_us(ts)) AS t0,
         MIN(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END)
           AS pts,
         MAX(epoch_us(ts)) AS tl
  FROM events GROUP BY user_id),
obs AS (SELECT COALESCE(pts, tl) - t0 AS t, (pts IS NOT NULL) AS e
        FROM sp),
per_t AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS n_obs,
                 CAST(SUM(CASE WHEN e THEN 1 ELSE 0 END) AS BIGINT) AS d
          FROM obs GROUP BY t),
tot AS (SELECT CAST(SUM(n_obs) AS BIGINT) AS nn FROM per_t),
r AS (SELECT t, d,
             nn - CAST(COALESCE(SUM(n_obs) OVER (ORDER BY t
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  AS BIGINT) AS n_risk
      FROM per_t, tot),
dth AS (SELECT t, n_risk, d,
               CASE WHEN n_risk > d THEN
                 CAST(round((ln(CAST(n_risk - d AS DOUBLE))
                             - ln(CAST(n_risk AS DOUBLE))) * 1e6)
                      AS BIGINT) END AS step
        FROM r WHERE d > 0),
cum AS (SELECT t, n_risk, d,
               CAST(COALESCE(SUM(step) OVER (ORDER BY t
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                    0) AS BIGINT) AS lnsum
        FROM dth)
SELECT t, n_risk, d,
       CASE WHEN n_risk <> d THEN lnsum END AS ln_surv_micro,
       CASE WHEN n_risk = d THEN 0.0
            ELSE round(exp(CAST(lnsum AS DOUBLE) / 1e6), 6)
       END AS surv
FROM cum
""")
def q265(spark, sf_dir):
    """Kaplan–Meier survival of time-to-first-purchase per user, with
    users who never purchase right-censored at their last observed
    event — the survivorship-bias-free duration statistic.  Per-step
    log factors ln(n−d)−ln(n) snap to µ-nats over exact int64 risk
    counts; the running product is an integer prefix sum over death
    times via the bucketed two-phase cumsum; an exhausted risk set
    reports NULL/0.0, never a silent -inf."""
    from ultraviolet_spark.operators.survival import kaplan_meier

    ev = _t(spark, sf_dir, "events")
    um = F.unix_micros(F.col("ts").cast("timestamp"))
    sp = ev.groupBy("user_id").agg(
        F.min(um).alias("t0"),
        F.min(F.when(F.col("event_type") == "purchase", um))
        .alias("pts"),
        F.max(um).alias("tl"))
    obs = sp.select(
        (F.coalesce("pts", "tl") - F.col("t0")).alias("dur"),
        F.col("pts").isNotNull().alias("died"))
    return kaplan_meier(obs, duration_col="dur", event_col="died")


@q("q266_wasserstein_drift", """
WITH base AS (
  SELECT CAST(round(value * 1e6) AS BIGINT) AS v, event_type AS g
  FROM events
  WHERE event_type IN ('click', 'purchase') AND value IS NOT NULL),
pv AS (
  SELECT v,
         CAST(SUM(CASE WHEN g = 'click' THEN 1 ELSE 0 END)
              AS BIGINT) AS ca,
         CAST(SUM(CASE WHEN g = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS cb
  FROM base GROUP BY v),
t AS (SELECT CAST(SUM(ca) AS BIGINT) AS na,
             CAST(SUM(cb) AS BIGINT) AS nb FROM pv),
c AS (
  SELECT v,
         CAST(SUM(ca) OVER w AS BIGINT) AS cum_a,
         CAST(SUM(cb) OVER w AS BIGINT) AS cum_b,
         LEAD(v) OVER (ORDER BY v) AS next_v
  FROM pv
  WINDOW w AS (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
SELECT t.na AS n_a, t.nb AS n_b,
       round(CAST(SUM(CAST(abs(c.cum_a * t.nb - c.cum_b * t.na)
                           AS HUGEINT)
                      * COALESCE(c.next_v - c.v, 0)) AS DOUBLE)
             / CAST(t.na * t.nb AS DOUBLE) / 1e6, 6) AS w1
FROM c, t GROUP BY t.na, t.nb
""")
def q266(spark, sf_dir):
    """Exact 1-D Wasserstein-1 (earth-mover) distance between click
    and purchase value distributions — the integral drift metric next
    to KS's sup: W₁·n_a·n_b = Σ|cumA·n_b − cumB·n_a|·Δv over the
    merged support, all integers accumulated in DECIMAL(38,0)/HUGEINT,
    one fixed-order division at the end.  The engine's prefix and
    next-value gaps cross bucket boundaries via the tiny per-bucket
    frames; the oracle replays with plain global windows."""
    from ultraviolet_spark.operators.stats import w1_distance

    return w1_distance(_t(spark, sf_dir, "events"),
                       value_col="value", group_col="event_type",
                       group_a="click", group_b="purchase")


@q("q267_logrank_ab_test", """
WITH sp AS (
  SELECT user_id, MIN(epoch_us(ts)) AS t0,
         MIN(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END)
           AS pts,
         MAX(epoch_us(ts)) AS tl
  FROM events GROUP BY user_id),
obs AS (SELECT COALESCE(pts, tl) - t0 AS t, (pts IS NOT NULL) AS e,
               CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS ga
        FROM sp),
per_t AS (
  SELECT t,
         CAST(SUM(ga) AS BIGINT) AS o_a,
         CAST(SUM(1 - ga) AS BIGINT) AS o_b,
         CAST(SUM(CASE WHEN e AND ga = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS d_a,
         CAST(SUM(CASE WHEN e AND ga = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS d_b
  FROM obs GROUP BY t),
tot AS (SELECT CAST(SUM(o_a) AS BIGINT) AS na,
               CAST(SUM(o_b) AS BIGINT) AS nb FROM per_t),
r AS (
  SELECT t, d_a, d_b,
         na - CAST(COALESCE(SUM(o_a) OVER wx, 0) AS BIGINT) AS n_a,
         nb - CAST(COALESCE(SUM(o_b) OVER wx, 0) AS BIGINT) AS n_b
  FROM per_t, tot
  WINDOW wx AS (ORDER BY t
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
death AS (SELECT *, d_a + d_b AS dd, n_a + n_b AS nn FROM r
          WHERE d_a + d_b > 0),
terms AS (
  SELECT d_a, d_b,
         CASE WHEN nn > 1 THEN
           CAST(round(CAST(d_a * nn - dd * n_a AS DOUBLE)
                      / CAST(nn AS DOUBLE) * 1e6) AS BIGINT)
         ELSE 0 END AS um,
         CASE WHEN nn > 1 THEN
           CAST(round(CAST(CAST(dd AS HUGEINT) * n_a * n_b * (nn - dd)
                           AS DOUBLE)
                      / CAST(CAST(nn AS HUGEINT) * nn * (nn - 1)
                             AS DOUBLE) * 1e6) AS BIGINT)
         ELSE 0 END AS vm
  FROM death)
SELECT tot.na AS n_obs_a, tot.nb AS n_obs_b,
       CAST(SUM(d_a) AS BIGINT) AS deaths_a,
       CAST(SUM(d_b) AS BIGINT) AS deaths_b,
       CAST(SUM(um) AS BIGINT) AS u_micro,
       CAST(SUM(vm) AS BIGINT) AS v_micro,
       round((CAST(SUM(um) AS DOUBLE) / 1e6)
             * (CAST(SUM(um) AS DOUBLE) / 1e6)
             / (CAST(SUM(vm) AS DOUBLE) / 1e6), 6) AS chi2
FROM terms, tot GROUP BY tot.na, tot.nb
""")
def q267(spark, sf_dir):
    """Two-sample log-rank test on time-to-first-purchase between the
    even-user and odd-user cohorts (never-purchasers right-censored at
    their last event): per-death-time observed−expected increments and
    hypergeometric variances as exact integer numerators snapped to
    micro-units, summed order-independently; n=1 risk sets contribute
    exactly zero instead of dividing by n−1=0.  The censoring-correct
    A/B duration test."""
    from ultraviolet_spark.operators.survival import logrank_test

    ev = _t(spark, sf_dir, "events")
    um = F.unix_micros(F.col("ts").cast("timestamp"))
    sp = ev.groupBy("user_id").agg(
        F.min(um).alias("t0"),
        F.min(F.when(F.col("event_type") == "purchase", um))
        .alias("pts"),
        F.max(um).alias("tl"))
    obs = sp.select(
        (F.coalesce("pts", "tl") - F.col("t0")).alias("dur"),
        F.col("pts").isNotNull().alias("died"),
        F.when(F.col("user_id") % 2 == 0, "A").otherwise("B")
        .alias("cohort"))
    return logrank_test(obs, duration_col="dur", event_col="died",
                        group_col="cohort", group_a="A", group_b="B")


@q("q268_cuped_adjustment", """
WITH bb AS (SELECT MIN(epoch_us(ts)) AS lo, MAX(epoch_us(ts)) AS hi
            FROM events),
u AS (
  SELECT user_id,
         CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS variant,
         CAST(COALESCE(SUM(CASE WHEN epoch_us(ts) < (lo + hi) // 2
                    THEN CAST(round(value * 1e6) AS BIGINT) END), 0)
              AS BIGINT) AS x,
         CAST(COALESCE(SUM(CASE WHEN epoch_us(ts) >= (lo + hi) // 2
                    THEN CAST(round(value * 1e6) AS BIGINT) END), 0)
              AS BIGINT) AS y
  FROM events, bb GROUP BY user_id, lo, hi),
pooled AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         SUM(CAST(x AS HUGEINT)) AS sx, SUM(CAST(y AS HUGEINT)) AS sy,
         SUM(CAST(x AS HUGEINT) * x) AS sxx,
         SUM(CAST(x AS HUGEINT) * y) AS sxy,
         SUM(CAST(y AS HUGEINT) * y) AS syy
  FROM u),
pv AS (SELECT variant, CAST(COUNT(*) AS BIGINT) AS n,
              SUM(CAST(x AS HUGEINT)) AS svx,
              SUM(CAST(y AS HUGEINT)) AS svy
       FROM u GROUP BY variant)
SELECT pv.variant, pv.n,
       round(CAST(pv.svy AS DOUBLE) / CAST(pv.n AS DOUBLE) / 1e6, 6)
         AS mean_y,
       round((CAST(pv.svy AS DOUBLE) / CAST(pv.n AS DOUBLE)
              - ((CAST(p.n AS DOUBLE) * CAST(p.sxy AS DOUBLE)
                  - CAST(p.sx AS DOUBLE) * CAST(p.sy AS DOUBLE))
                 / (CAST(p.n AS DOUBLE) * CAST(p.sxx AS DOUBLE)
                    - CAST(p.sx AS DOUBLE) * CAST(p.sx AS DOUBLE)))
                * (CAST(pv.svx AS DOUBLE) / CAST(pv.n AS DOUBLE)
                   - CAST(p.sx AS DOUBLE) / CAST(p.n AS DOUBLE)))
             / 1e6, 6) AS mean_y_cuped,
       round((CAST(p.n AS DOUBLE) * CAST(p.sxy AS DOUBLE)
              - CAST(p.sx AS DOUBLE) * CAST(p.sy AS DOUBLE))
             / (CAST(p.n AS DOUBLE) * CAST(p.sxx AS DOUBLE)
                - CAST(p.sx AS DOUBLE) * CAST(p.sx AS DOUBLE)), 6)
         AS theta,
       round((CAST(p.n AS DOUBLE) * CAST(p.sxy AS DOUBLE)
              - CAST(p.sx AS DOUBLE) * CAST(p.sy AS DOUBLE))
             * (CAST(p.n AS DOUBLE) * CAST(p.sxy AS DOUBLE)
                - CAST(p.sx AS DOUBLE) * CAST(p.sy AS DOUBLE))
             / ((CAST(p.n AS DOUBLE) * CAST(p.sxx AS DOUBLE)
                 - CAST(p.sx AS DOUBLE) * CAST(p.sx AS DOUBLE))
                * (CAST(p.n AS DOUBLE) * CAST(p.syy AS DOUBLE)
                   - CAST(p.sy AS DOUBLE) * CAST(p.sy AS DOUBLE))), 6)
         AS rho2
FROM pv, pooled p
""")
def q268(spark, sf_dir):
    """CUPED variance reduction on an even/odd-user experiment: each
    user's pre-period value sum (first half of the time range) is the
    covariate, the post-period sum the metric; θ = Cov(x,y)/Var(x)
    pooled across variants from exact DECIMAL(38,0) integer moments,
    adjusted means ȳ_v − θ(x̄_v − x̄) as fixed-order doubles.  The
    unbiasedness and 1−ρ² variance-reduction properties are pinned in
    tests; here the oracle replays the identical moment algebra."""
    from ultraviolet_spark.operators.stats import cuped_adjust

    ev = _t(spark, sf_dir, "events")
    um = F.unix_micros(F.col("ts").cast("timestamp"))
    bb = ev.agg(F.min(um).alias("lo"), F.max(um).alias("hi"))
    t = F.round(F.col("value").cast("double") * 1e6).cast("long")
    cut = F.expr("(lo + hi) div 2")
    u = (ev.crossJoin(F.broadcast(bb))
         .groupBy("user_id")
         .agg(F.coalesce(F.sum(F.when(um < cut, t)), F.lit(0))
              .alias("x"),
              F.coalesce(F.sum(F.when(um >= cut, t)), F.lit(0))
              .alias("y"))
         .withColumn("variant",
                     F.when(F.col("user_id") % 2 == 0, "A")
                     .otherwise("B")))
    return cuped_adjust(u, x_col="x", y_col="y", variant_col="variant")


@q("q269_sprt_early_stopping", """
WITH d AS (
  SELECT CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS grp,
         epoch_us(ts) AS t, event_id AS i,
         CASE WHEN event_type = 'purchase' THEN 223144
              ELSE -64539 END AS inc,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS succ
  FROM events),
c AS (
  SELECT grp, succ, inc,
         CAST(ROW_NUMBER() OVER (PARTITION BY grp ORDER BY t, i)
              AS BIGINT) AS idx,
         CAST(SUM(inc) OVER (PARTITION BY grp ORDER BY t, i
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS cum
  FROM d),
agg AS (
  SELECT grp, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(succ) AS BIGINT) AS successes,
         CAST(SUM(inc) AS BIGINT) AS final_llr_micro,
         MIN(CASE WHEN cum >= 2944439 THEN idx END) AS up_i,
         MIN(CASE WHEN cum <= -2944439 THEN idx END) AS dn_i
  FROM c GROUP BY grp)
SELECT grp, n, successes, final_llr_micro,
       LEAST(up_i, dn_i) AS cross_idx,
       CASE WHEN up_i IS NOT NULL
                 AND (dn_i IS NULL OR up_i <= dn_i) THEN 'accept_h1'
            WHEN dn_i IS NOT NULL THEN 'accept_h0'
            ELSE 'continue' END AS decision
FROM agg
""")
def q269(spark, sf_dir):
    """Wald SPRT early stopping per cohort: is the purchase rate p1 =
    0.25 rather than p0 = 0.20?  Every observation moves the LLR by
    one of two precomputed µ-nat integer constants (ln(p1/p0) =
    +223144, ln(.75/.8) = −64539), boundaries ±ln 19 (α = β = 0.05);
    the whole trajectory is integer so the first-crossing observation
    index is exact.  The engine's per-cohort cumulative trajectory
    runs the (group, time-bucket) two-phase prefix; the oracle replays
    with plain partitioned windows."""
    from ultraviolet_spark.operators.stats import sprt_decision

    ev = _t(spark, sf_dir, "events").withColumn(
        "cohort", F.when(F.col("user_id") % 2 == 0, "A").otherwise("B"))
    return sprt_decision(ev, ts_col="ts", id_col="event_id",
                         success_expr="event_type = 'purchase'",
                         group_col="cohort",
                         lr1_micro=223144, lr0_micro=-64539,
                         upper_micro=2944439, lower_micro=-2944439)


@q("q270_cox_score_step", """
WITH sp AS (
  SELECT user_id, MIN(epoch_us(ts)) AS t0,
         MIN(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END)
           AS pts,
         MAX(epoch_us(ts)) AS tl,
         CAST(COUNT(*) AS BIGINT) AS x
  FROM events GROUP BY user_id),
obs AS (SELECT COALESCE(pts, tl) - t0 AS t, (pts IS NOT NULL) AS e, x
        FROM sp),
per_t AS (
  SELECT t, CAST(COUNT(*) AS BIGINT) AS o,
         CAST(SUM(x) AS BIGINT) AS sx,
         CAST(SUM(x * x) AS BIGINT) AS sxx,
         CAST(SUM(CASE WHEN e THEN 1 ELSE 0 END) AS BIGINT) AS dd,
         CAST(COALESCE(SUM(CASE WHEN e THEN x END), 0) AS BIGINT) AS sxd
  FROM obs GROUP BY t),
tot AS (SELECT CAST(SUM(o) AS BIGINT) AS n,
               CAST(SUM(sx) AS BIGINT) AS tsx,
               CAST(SUM(sxx) AS BIGINT) AS tsxx FROM per_t),
r AS (
  SELECT t, dd, sxd,
         n - CAST(COALESCE(SUM(o) OVER wx, 0) AS BIGINT) AS s0,
         tsx - CAST(COALESCE(SUM(sx) OVER wx, 0) AS BIGINT) AS s1,
         tsxx - CAST(COALESCE(SUM(sxx) OVER wx, 0) AS BIGINT) AS s2
  FROM per_t, tot
  WINDOW wx AS (ORDER BY t
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
terms AS (
  SELECT dd,
         CAST(round(CAST(CAST(sxd AS HUGEINT) * s0
                         - CAST(dd AS HUGEINT) * s1 AS DOUBLE)
                    / CAST(s0 AS DOUBLE) * 1e6) AS BIGINT) AS um,
         CAST(round(CAST(CAST(dd AS HUGEINT)
                         * (CAST(s2 AS HUGEINT) * s0
                            - CAST(s1 AS HUGEINT) * s1) AS DOUBLE)
                    / CAST(CAST(s0 AS HUGEINT) * s0 AS DOUBLE) * 1e6)
              AS BIGINT) AS im
  FROM r WHERE dd > 0)
SELECT CAST(SUM(dd) AS BIGINT) AS n_deaths,
       CAST(SUM(um) AS BIGINT) AS u_micro,
       CAST(SUM(im) AS BIGINT) AS i_micro,
       CASE WHEN CAST(SUM(im) AS BIGINT) <> 0 THEN
         round((CAST(SUM(um) AS DOUBLE) / 1e6)
               / (CAST(SUM(im) AS DOUBLE) / 1e6), 6) END AS beta1,
       CASE WHEN CAST(SUM(im) AS BIGINT) <> 0 THEN
         round((CAST(SUM(um) AS DOUBLE) / 1e6)
               * (CAST(SUM(um) AS DOUBLE) / 1e6)
               / (CAST(SUM(im) AS DOUBLE) / 1e6), 6) END AS score_chi2
FROM terms
""")
def q270(spark, sf_dir):
    """Cox proportional-hazards score test + one Newton step at β=0:
    does per-user activity (total event count, a CONTINUOUS covariate)
    predict earlier first purchase under right-censoring?  Breslow
    ties; risk-set suffix moments S0/S1/S2 from exclusive prefixes;
    per-death-time score and information increments as exact integer
    numerators µ-snapped before order-independent summation; β̂ = U/I
    and score χ² = U²/I as fixed-order doubles."""
    from ultraviolet_spark.operators.survival import cox_score_step

    ev = _t(spark, sf_dir, "events")
    um = F.unix_micros(F.col("ts").cast("timestamp"))
    sp = ev.groupBy("user_id").agg(
        F.min(um).alias("t0"),
        F.min(F.when(F.col("event_type") == "purchase", um))
        .alias("pts"),
        F.max(um).alias("tl"),
        F.count("*").alias("x"))
    obs = sp.select(
        (F.coalesce("pts", "tl") - F.col("t0")).alias("dur"),
        F.col("pts").isNotNull().alias("died"), "x")
    return cox_score_step(obs, duration_col="dur", event_col="died",
                          x_col="x")


@q("q271_competing_risks_cif", """
WITH sp AS (
  SELECT user_id, MIN(epoch_us(ts)) AS t0,
         MIN(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END)
           AS pts,
         MIN(CASE WHEN event_type = 'error' THEN epoch_us(ts) END)
           AS ets,
         MAX(epoch_us(ts)) AS tl
  FROM events GROUP BY user_id),
obs AS (
  SELECT CASE WHEN pts IS NOT NULL AND (ets IS NULL OR pts <= ets)
                THEN pts - t0
              WHEN ets IS NOT NULL THEN ets - t0
              ELSE tl - t0 END AS t,
         CASE WHEN pts IS NOT NULL AND (ets IS NULL OR pts <= ets)
                THEN 1
              WHEN ets IS NOT NULL THEN 2 ELSE 0 END AS c
  FROM sp),
per_t AS (
  SELECT t, CAST(COUNT(*) AS BIGINT) AS o,
         CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS d1,
         CAST(SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS d2
  FROM obs GROUP BY t),
tot AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM per_t),
r AS (
  SELECT t, d1, d2, d1 + d2 AS dd,
         n - CAST(COALESCE(SUM(o) OVER wx, 0) AS BIGINT) AS n_risk
  FROM per_t, tot
  WINDOW wx AS (ORDER BY t
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
dth AS (
  SELECT t, n_risk, d1, d2, dd,
         CASE WHEN n_risk > dd THEN
           CAST(round((ln(CAST(n_risk - dd AS DOUBLE))
                       - ln(CAST(n_risk AS DOUBLE))) * 1e6) AS BIGINT)
         END AS step
  FROM r WHERE dd > 0),
lnb AS (
  SELECT t, n_risk, d1, d2,
         CAST(COALESCE(SUM(step) OVER (ORDER BY t
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS ln_before
  FROM dth),
inc AS (
  SELECT t, n_risk, d1, d2,
         CAST(round(exp(CAST(ln_before AS DOUBLE) / 1e6)
                    * CAST(d1 AS DOUBLE) / CAST(n_risk AS DOUBLE)
                    * 1e6) AS BIGINT) AS i1,
         CAST(round(exp(CAST(ln_before AS DOUBLE) / 1e6)
                    * CAST(d2 AS DOUBLE) / CAST(n_risk AS DOUBLE)
                    * 1e6) AS BIGINT) AS i2
  FROM lnb)
SELECT t, n_risk, d1, d2,
       CAST(SUM(i1) OVER w AS BIGINT) AS cif1_micro,
       CAST(SUM(i2) OVER w AS BIGINT) AS cif2_micro
FROM inc
WINDOW w AS (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
             AND CURRENT ROW)
""")
def q271(spark, sf_dir):
    """Competing-risks cumulative incidence (two-cause Aalen–Johansen)
    per user: the FIRST of purchase-vs-error decides the exit cause,
    never-exiters are censored at their last event — 1 − single-cause
    KM would overstate each incidence because the competitor removes
    users first.  All-cause KM runs as the EXCLUSIVE µ-nat integer
    prefix (S at t⁻), CIF increments S(t⁻)·d_k/n snap to micro-units
    in fixed operand order, running CIFs are integer prefix sums; the
    oracle replays everything through plain global windows."""
    from ultraviolet_spark.operators.survival import competing_risks

    ev = _t(spark, sf_dir, "events")
    um = F.unix_micros(F.col("ts").cast("timestamp"))
    sp = ev.groupBy("user_id").agg(
        F.min(um).alias("t0"),
        F.min(F.when(F.col("event_type") == "purchase", um))
        .alias("pts"),
        F.min(F.when(F.col("event_type") == "error", um)).alias("ets"),
        F.max(um).alias("tl"))
    p_first = (F.col("pts").isNotNull()
               & (F.col("ets").isNull() | (F.col("pts") <= F.col("ets"))))
    obs = sp.select(
        (F.when(p_first, F.col("pts"))
         .when(F.col("ets").isNotNull(), F.col("ets"))
         .otherwise(F.col("tl")) - F.col("t0")).alias("dur"),
        F.when(p_first, 1)
        .when(F.col("ets").isNotNull(), 2).otherwise(0).alias("cause"))
    return competing_risks(obs, duration_col="dur", cause_col="cause")


@q("q272_rmst", """
WITH sp AS (
  SELECT user_id, MIN(epoch_us(ts)) AS t0,
         MIN(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END)
           AS pts,
         MAX(epoch_us(ts)) AS tl
  FROM events GROUP BY user_id),
obs AS (SELECT COALESCE(pts, tl) - t0 AS t, (pts IS NOT NULL) AS e
        FROM sp),
per_t AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS n_obs,
                 CAST(SUM(CASE WHEN e THEN 1 ELSE 0 END) AS BIGINT)
                   AS dd
          FROM obs GROUP BY t),
tot AS (SELECT CAST(SUM(n_obs) AS BIGINT) AS n,
               CAST(SUM(dd) AS BIGINT) AS nd FROM per_t),
r AS (SELECT t, dd,
             n - CAST(COALESCE(SUM(n_obs) OVER wx, 0) AS BIGINT)
               AS n_risk
      FROM per_t, tot
      WINDOW wx AS (ORDER BY t
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
dth AS (SELECT t, dd, n_risk,
               CASE WHEN n_risk > dd THEN
                 CAST(round((ln(CAST(n_risk - dd AS DOUBLE))
                             - ln(CAST(n_risk AS DOUBLE))) * 1e6)
                      AS BIGINT) END AS step
        FROM r WHERE dd > 0),
c AS (SELECT t, dd, n_risk,
             CAST(COALESCE(SUM(step) OVER (ORDER BY t
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                  0) AS BIGINT) AS lnsum,
             LEAD(t) OVER (ORDER BY t) AS next_t
      FROM dth),
terms AS (
  SELECT CASE WHEN n_risk = dd THEN CAST(0 AS BIGINT)
         ELSE CAST(round(exp(CAST(lnsum AS DOUBLE) / 1e6)
              * CAST(GREATEST(LEAST(COALESCE(next_t, 604800000000),
                                    604800000000) - t, 0) AS DOUBLE))
              AS BIGINT) END AS term
  FROM c),
hd AS (SELECT LEAST(COALESCE(MIN(t), 604800000000), 604800000000) AS h FROM dth),
ar AS (SELECT CAST(COALESCE(SUM(term), 0) AS BIGINT) AS a FROM terms)
SELECT CAST(604800000000 AS BIGINT) AS tau_us, tot.n, tot.nd AS n_deaths,
       CAST(hd.h + ar.a AS BIGINT) AS rmst_us,
       round(CAST(hd.h + ar.a AS DOUBLE)
             / CAST(604800000000 AS DOUBLE), 6) AS rmst_share
FROM tot, hd, ar
""")
def q272(spark, sf_dir):
    """Restricted mean survival time at a 7-day horizon for
    time-to-first-purchase: the area under the KM curve up to tau —
    always defined (median survival is not, when the curve never
    reaches 0.5), in the metric's own time units.  S comes from the
    µ-nat integer ln-prefix, interval lengths are exact integer µs
    clamped at tau with the W1 bucket-crossing lead, every term snaps
    to integer µs before the order-independent sum."""
    from ultraviolet_spark.operators.survival import rmst

    ev = _t(spark, sf_dir, "events")
    um = F.unix_micros(F.col("ts").cast("timestamp"))
    sp = ev.groupBy("user_id").agg(
        F.min(um).alias("t0"),
        F.min(F.when(F.col("event_type") == "purchase", um))
        .alias("pts"),
        F.max(um).alias("tl"))
    obs = sp.select(
        (F.coalesce("pts", "tl") - F.col("t0")).alias("dur"),
        F.col("pts").isNotNull().alias("died"))
    return rmst(obs, duration_col="dur", event_col="died", tau=604800000000)


@q("q273_mantel_haenszel", """
WITH cells AS (
  SELECT CAST(EXTRACT(hour FROM ts) AS INTEGER) // 6 AS stratum,
         CAST(SUM(CASE WHEN user_id % 2 = 0
                       AND event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS a,
         CAST(SUM(CASE WHEN user_id % 2 = 0
                       AND event_type <> 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS b,
         CAST(SUM(CASE WHEN user_id % 2 <> 0
                       AND event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS c,
         CAST(SUM(CASE WHEN user_id % 2 <> 0
                       AND event_type <> 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS d
  FROM events GROUP BY 1),
terms AS (
  SELECT a, b, c, d,
         CAST(round(CAST(CAST(a AS HUGEINT) * d AS DOUBLE)
                    / CAST(a + b + c + d AS DOUBLE) * 1e6)
              AS BIGINT) AS nt,
         CAST(round(CAST(CAST(b AS HUGEINT) * c AS DOUBLE)
                    / CAST(a + b + c + d AS DOUBLE) * 1e6)
              AS BIGINT) AS dt
  FROM cells),
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_strata,
         CAST(SUM(a) AS BIGINT) AS pa, CAST(SUM(b) AS BIGINT) AS pb,
         CAST(SUM(c) AS BIGINT) AS pc, CAST(SUM(d) AS BIGINT) AS pd,
         CAST(SUM(nt) AS BIGINT) AS mh_num_micro,
         CAST(SUM(dt) AS BIGINT) AS mh_den_micro
  FROM terms)
SELECT n_strata, mh_num_micro, mh_den_micro,
       CASE WHEN mh_den_micro > 0 THEN
         round(CAST(mh_num_micro AS DOUBLE)
               / CAST(mh_den_micro AS DOUBLE), 6) END AS or_mh,
       CASE WHEN pb > 0 AND pc > 0 THEN
         round(CAST(CAST(pa AS HUGEINT) * pd AS DOUBLE)
               / CAST(CAST(pb AS HUGEINT) * pc AS DOUBLE), 6)
       END AS or_naive
FROM agg
""")
def q273(spark, sf_dir):
    """Mantel–Haenszel pooled odds ratio of purchase-ness for the
    even-user cohort, stratified by 6-hour time-of-day blocks — the
    Simpson's-paradox-proof pooled effect: per-stratum a·d/n and
    b·c/n terms with exact integer numerators snap to micro-units
    before order-independent summation, OR_MH is one division, and the
    naive collapsed-table OR ships alongside so confounding is visible
    in the output."""
    from ultraviolet_spark.operators.stats import mantel_haenszel

    ev = _t(spark, sf_dir, "events").withColumn(
        "stratum",
        (F.hour(F.col("ts").cast("timestamp")) / 6).cast("int"))
    return mantel_haenszel(ev, stratum_col="stratum",
                           group_expr="user_id % 2 = 0",
                           outcome_expr="event_type = 'purchase'")


@q("q274_empirical_bayes_rates", """
WITH per AS (
  SELECT user_id AS key, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS x
  FROM events GROUP BY user_id),
base AS (
  SELECT key, n, x,
         CAST(round(CAST(x AS DOUBLE) / CAST(n AS DOUBLE) * 1e6)
              AS BIGINT) AS p_micro
  FROM per WHERE n > 0),
pr AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k,
         CAST(SUM(p_micro) AS BIGINT) AS sp,
         SUM(CAST(p_micro AS HUGEINT) * p_micro) AS spp
  FROM base),
ab AS (
  SELECT CASE WHEN v > 0 AND mu * (1.0 - mu) / v - 1.0 > 0
              THEN mu * (mu * (1.0 - mu) / v - 1.0) END AS alpha,
         CASE WHEN v > 0 AND mu * (1.0 - mu) / v - 1.0 > 0
              THEN (1.0 - mu) * (mu * (1.0 - mu) / v - 1.0)
         END AS beta
  FROM (SELECT CAST(sp AS DOUBLE) / CAST(k AS DOUBLE) / 1e6 AS mu,
               (CAST(spp AS DOUBLE) / CAST(k AS DOUBLE)
                - (CAST(sp AS DOUBLE) / CAST(k AS DOUBLE))
                  * (CAST(sp AS DOUBLE) / CAST(k AS DOUBLE))) / 1e12
                 AS v
        FROM pr))
SELECT base.key, base.n, base.x,
       round(CAST(base.x AS DOUBLE) / CAST(base.n AS DOUBLE), 6)
         AS rate_raw,
       CASE WHEN ab.alpha IS NOT NULL THEN
         round((CAST(base.x AS DOUBLE) + ab.alpha)
               / (CAST(base.n AS DOUBLE) + ab.alpha + ab.beta), 6)
       ELSE round(CAST(base.x AS DOUBLE) / CAST(base.n AS DOUBLE), 6)
       END AS rate_eb,
       round(ab.alpha, 6) AS alpha, round(ab.beta, 6) AS beta
FROM base, ab
""")
def q274(spark, sf_dir):
    """Empirical-Bayes beta-binomial shrinkage of per-user purchase
    rates: Beta(α, β) prior fitted by method of moments to the
    micro-snapped per-user proportions (exact integer moment sums),
    posterior mean (x+α)/(n+α+β) per user — small-n users shrink hard
    toward the prior, large-n users barely move; degenerate priors
    pass raw rates through with NULL α/β rather than silently
    clamping."""
    from ultraviolet_spark.operators.stats import eb_beta_binomial

    per = (_t(spark, sf_dir, "events")
           .groupBy(F.col("user_id").alias("u"))
           .agg(F.count("*").alias("n_ev"),
                F.sum(F.when(F.col("event_type") == "purchase", 1)
                      .otherwise(0)).cast("long").alias("n_buy")))
    return eb_beta_binomial(per, key_col="u", trials_col="n_ev",
                            successes_col="n_buy")


@q("q275_ratio_metric_se", """
WITH per AS (
  SELECT user_id,
         COALESCE(SUM(CASE WHEN event_type = 'purchase'
                           THEN value END), 0) AS nv,
         CAST(COUNT(*) AS BIGINT) AS dv
  FROM events GROUP BY user_id),
base AS (
  SELECT (((strpos('0123456789abcdef',
            substring(md5(CAST(user_id AS VARCHAR)), 1, 1)) - 1) * 16
           + (strpos('0123456789abcdef',
              substring(md5(CAST(user_id AS VARCHAR)), 2, 1)) - 1))
          % 64) AS b,
         CAST(round(nv * 1e6) AS BIGINT) AS u,
         CAST(round(CAST(dv AS DOUBLE) * 1e6) AS BIGINT) AS v
  FROM per),
per_b AS (
  SELECT b, CAST(COUNT(*) AS BIGINT) AS c,
         CAST(SUM(u) AS BIGINT) AS bu, CAST(SUM(v) AS BIGINT) AS bv,
         SUM(CAST(u AS HUGEINT) * u) AS buu,
         SUM(CAST(v AS HUGEINT) * v) AS bvv,
         SUM(CAST(u AS HUGEINT) * v) AS buv
  FROM base GROUP BY b),
tot AS (
  SELECT CAST(SUM(c) AS BIGINT) AS n, CAST(COUNT(*) AS BIGINT) AS bk,
         CAST(SUM(bu) AS BIGINT) AS tu, CAST(SUM(bv) AS BIGINT) AS tv,
         SUM(buu) AS suu, SUM(bvv) AS svv, SUM(buv) AS suv
  FROM per_b),
loo AS (
  SELECT CAST(round(CAST(tot.tu - per_b.bu AS DOUBLE)
                    / CAST(tot.tv - per_b.bv AS DOUBLE) * 1e6)
              AS BIGINT) AS r_loo
  FROM per_b, tot),
jk AS (
  SELECT CAST(SUM(r_loo) AS BIGINT) AS sr,
         SUM(CAST(r_loo AS HUGEINT) * r_loo) AS srr
  FROM loo)
SELECT tot.n, tot.bk AS b_buckets,
       round(CAST(tot.tu AS DOUBLE) / CAST(tot.tv AS DOUBLE), 6)
         AS ratio,
       round(sqrt((1.0 - 1.0 / CAST(tot.bk AS DOUBLE))
                  * (CAST(jk.srr AS DOUBLE) / CAST(tot.bk AS DOUBLE)
                     - (CAST(jk.sr AS DOUBLE) / CAST(tot.bk AS DOUBLE))
                       * (CAST(jk.sr AS DOUBLE)
                          / CAST(tot.bk AS DOUBLE)))
                  * CAST(tot.bk AS DOUBLE) / 1e12), 6) AS se_jack,
       round(sqrt(((CAST(tot.suu AS DOUBLE) / CAST(tot.n AS DOUBLE)
                    - (CAST(tot.tu AS DOUBLE) / CAST(tot.n AS DOUBLE))
                      * (CAST(tot.tu AS DOUBLE)
                         / CAST(tot.n AS DOUBLE)))
                   - 2.0 * (CAST(tot.tu AS DOUBLE)
                            / CAST(tot.tv AS DOUBLE))
                     * (CAST(tot.suv AS DOUBLE) / CAST(tot.n AS DOUBLE)
                        - (CAST(tot.tu AS DOUBLE)
                           / CAST(tot.n AS DOUBLE))
                          * (CAST(tot.tv AS DOUBLE)
                             / CAST(tot.n AS DOUBLE)))
                   + (CAST(tot.tu AS DOUBLE) / CAST(tot.tv AS DOUBLE))
                     * (CAST(tot.tu AS DOUBLE) / CAST(tot.tv AS DOUBLE))
                     * (CAST(tot.svv AS DOUBLE) / CAST(tot.n AS DOUBLE)
                        - (CAST(tot.tv AS DOUBLE)
                           / CAST(tot.n AS DOUBLE))
                          * (CAST(tot.tv AS DOUBLE)
                             / CAST(tot.n AS DOUBLE))))
                  / ((CAST(tot.tv AS DOUBLE) / CAST(tot.n AS DOUBLE))
                     * (CAST(tot.tv AS DOUBLE) / CAST(tot.n AS DOUBLE)))
                  / CAST(tot.n AS DOUBLE)), 6) AS se_delta
FROM tot, jk
""")
def q275(spark, sf_dir):
    """Standard error of revenue-per-event (a RATIO of sums whose
    numerator and denominator covary — naive per-row variance is
    wrong) by the delete-one-bucket jackknife over 64 md5 user
    buckets, with the closed-form delta-method SE alongside as the
    cross-check; leave-one-out ratios µ-snapped so the variance sum is
    over exact integers."""
    from ultraviolet_spark.operators.stats import ratio_jackknife

    per = (_t(spark, sf_dir, "events")
           .groupBy("user_id")
           .agg(F.coalesce(
               F.sum(F.when(F.col("event_type") == "purchase",
                            F.col("value"))), F.lit(0.0)).alias("rev"),
               F.count("*").alias("n_ev")))
    return ratio_jackknife(per, num_col="rev", den_col="n_ev",
                           id_col="user_id", n_buckets=64)


@q("q276_bh_fdr", """
WITH users AS (SELECT DISTINCT CAST(user_id AS VARCHAR) AS uid
               FROM events),
batt AS (
  SELECT uid AS test_id,
         CASE WHEN (((strpos('0123456789abcdef',
                      substring(md5(uid || 'sig'), 1, 1)) - 1) * 16
                   + (strpos('0123456789abcdef',
                      substring(md5(uid || 'sig'), 2, 1)) - 1)) < 26)
              THEN (CAST(CAST(('0x' || substr(md5(uid || ':' || 'p'),
                                              1, 12)) AS UBIGINT)
                    AS BIGINT) // 281474977) // 1000
              ELSE CAST(CAST(('0x' || substr(md5(uid || ':' || 'p'),
                                             1, 12)) AS UBIGINT)
                   AS BIGINT) // 281474977
         END AS p_micro
  FROM users),
ranked AS (
  SELECT test_id, p_micro,
         CAST(ROW_NUMBER() OVER (ORDER BY p_micro, test_id) AS BIGINT)
           AS i,
         CAST(COUNT(*) OVER () AS BIGINT) AS m
  FROM batt),
h AS (
  SELECT *,
         (CAST(p_micro AS HUGEINT) * m * 20
          <= CAST(i AS HUGEINT) * 1 * 1000000) AS hit,
         CAST(round(CAST(m AS DOUBLE) * CAST(p_micro AS DOUBLE)
                    / CAST(i AS DOUBLE)) AS BIGINT) AS q_raw
  FROM ranked),
k AS (SELECT MAX(CASE WHEN hit THEN i END) AS k FROM h),
sfx AS (
  SELECT test_id, p_micro, i, m, q_raw,
         MIN(q_raw) OVER (ORDER BY i DESC
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW) AS q_sfx
  FROM h)
SELECT sfx.test_id, round(CAST(sfx.p_micro AS DOUBLE) / 1e6, 6) AS p,
       sfx.i AS rnk, sfx.m,
       (k.k IS NOT NULL AND sfx.i <= COALESCE(k.k, -1)) AS rejected,
       round(CAST(LEAST(sfx.q_sfx, 1000000) AS DOUBLE) / 1e6, 6)
         AS q_value
FROM sfx, k
""")
def q276(spark, sf_dir):
    """Benjamini–Hochberg FDR control over a per-user test battery:
    null p-values are md5 48-bit uniforms (under H0, p IS uniform —
    the deterministic simulated null), a planted ~10 % signal block
    (md5 'sig' bucket < 26) has its p divided by 1000; BH's all-integer
    step-up rule rejects the planted block while capping the expected
    false-discovery fraction at α = 1/20.  Exact q-values alongside;
    the oracle replays every integer through plain global windows
    (cross-checking the two-phase bucketed rank/suffix machinery)."""
    from ultraviolet_spark.operators.corpus import md5_bucket256
    from ultraviolet_spark.operators.stats import bh_fdr

    users = (_t(spark, sf_dir, "events")
             .select(F.col("user_id").cast("string").alias("uid"))
             .distinct())
    u48 = F.conv(F.substring(F.md5(
        F.concat_ws(":", F.col("uid"), F.lit("p")).cast("binary")),
        1, 12), 16, 10).cast("long")
    sig = md5_bucket256(F.col("uid"), "sig") < 26
    batt = (users.withColumn("__u48", u48)
            .withColumn("__pm0", F.expr("__u48 div 281474977"))
            .withColumn("__pm", F.when(sig, F.expr("__pm0 div 1000"))
                        .otherwise(F.col("__pm0")))
            .select("uid",
                    (F.col("__pm").cast("double") / F.lit(1e6))
                    .alias("p")))
    out = bh_fdr(batt, p_col="p", id_col="uid",
                 alpha_num=1, alpha_den=20)
    return out.withColumnRenamed("rank", "rnk")


@q("q277_kmeans_fixed", """
WITH xm AS (
  SELECT vec_id AS id,
         CAST(generate_subscripts(embedding, 1) - 1 AS INTEGER) AS dim,
         CAST(round(CAST(unnest(embedding) AS DOUBLE) * 1e6) AS BIGINT)
           AS v
  FROM embeddings
  WHERE embedding IS NOT NULL AND len(embedding) > 0),
sd AS (
  SELECT id,
         CAST(ROW_NUMBER() OVER (ORDER BY md5(CAST(id AS VARCHAR)), id)
              - 1 AS INTEGER) AS cid
  FROM (SELECT DISTINCT id FROM xm)
  QUALIFY cid < 4),
c0 AS (SELECT sd.cid, xm.dim, xm.v FROM sd JOIN xm USING (id)),
a1 AS (
  SELECT x.id, c.cid,
         SUM(CAST(x.v - c.v AS HUGEINT) * (x.v - c.v)) AS d
  FROM xm x JOIN c0 c USING (dim) GROUP BY x.id, c.cid),
s1 AS (SELECT id, cid FROM a1
       QUALIFY ROW_NUMBER() OVER (PARTITION BY id
                                  ORDER BY d, cid) = 1),
u1 AS (
  SELECT s1.cid, x.dim,
         CAST(round(CAST(SUM(CAST(x.v AS HUGEINT)) AS DOUBLE)
                    / CAST(COUNT(*) AS DOUBLE)) AS BIGINT) AS v
  FROM s1 JOIN xm x USING (id) GROUP BY s1.cid, x.dim),
c1 AS (SELECT c0.cid, c0.dim, COALESCE(u1.v, c0.v) AS v
       FROM c0 LEFT JOIN u1 USING (cid, dim)),
a2 AS (
  SELECT x.id, c.cid,
         SUM(CAST(x.v - c.v AS HUGEINT) * (x.v - c.v)) AS d
  FROM xm x JOIN c1 c USING (dim) GROUP BY x.id, c.cid),
s2 AS (SELECT id, cid FROM a2
       QUALIFY ROW_NUMBER() OVER (PARTITION BY id
                                  ORDER BY d, cid) = 1),
u2 AS (
  SELECT s2.cid, x.dim,
         CAST(round(CAST(SUM(CAST(x.v AS HUGEINT)) AS DOUBLE)
                    / CAST(COUNT(*) AS DOUBLE)) AS BIGINT) AS v
  FROM s2 JOIN xm x USING (id) GROUP BY s2.cid, x.dim),
c2 AS (SELECT c1.cid, c1.dim, COALESCE(u2.v, c1.v) AS v
       FROM c1 LEFT JOIN u2 USING (cid, dim)),
af AS (
  SELECT x.id, c.cid,
         SUM(CAST(x.v - c.v AS HUGEINT) * (x.v - c.v)) AS d
  FROM xm x JOIN c2 c USING (dim) GROUP BY x.id, c.cid),
sf AS (SELECT id, cid, d FROM af
       QUALIFY ROW_NUMBER() OVER (PARTITION BY id
                                  ORDER BY d, cid) = 1)
SELECT id AS vec_id, cid AS cluster,
       round(CAST(d AS DOUBLE) / 1e12, 6) AS dist2
FROM sf
""")
def q277(spark, sf_dir):
    """Distributed Lloyd's k-means (k = 4, 2 unrolled rounds) over the
    full embeddings table — every centroid update sees EVERY row
    (unlike the FAISS-style sampled IVF train): md5-deterministic
    seeds, exact-integer distances in DECIMAL(38,0), argmin by the
    exact (distance, cid) pair, means re-snapped to micro-units per
    round; the oracle replays both rounds move-for-move as unrolled
    CTEs (exact per-row cluster + distance parity)."""
    from ultraviolet_spark.operators.mlfit import kmeans_fixed

    return kmeans_fixed(_t(spark, sf_dir, "embeddings"),
                        id_col="vec_id", vec_col="embedding",
                        k=4, rounds=2)


@q("q278_textrank_keywords", """
WITH pos AS (
  SELECT doc_id AS did,
         CAST(generate_subscripts(w, 1) AS INTEGER) AS p, unnest(w) AS t
  FROM (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS w
        FROM documents
        WHERE text IS NOT NULL AND trim(text) <> '')),
pr0 AS (
  SELECT a.t AS x, b.t AS y
  FROM pos a JOIN pos b ON a.did = b.did AND b.p = a.p + 1
  WHERE a.t <> b.t),
e AS (SELECT DISTINCT src, dst FROM (
        SELECT x AS src, y AS dst FROM pr0
        UNION ALL SELECT y, x FROM pr0)),
nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
od AS (SELECT src, COUNT(*) AS d FROM e GROUP BY src),
r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS r FROM nodes),
c1 AS (SELECT e.dst AS node, SUM((r0.r * 85) // (100 * od.d)) AS c
       FROM e JOIN r0 ON r0.node = e.src JOIN od ON od.src = e.src
       GROUP BY e.dst),
r1 AS (SELECT n.node, CAST(150000 + COALESCE(c1.c, 0) AS BIGINT) AS r
       FROM nodes n LEFT JOIN c1 ON c1.node = n.node),
c2 AS (SELECT e.dst AS node, SUM((r1.r * 85) // (100 * od.d)) AS c
       FROM e JOIN r1 ON r1.node = e.src JOIN od ON od.src = e.src
       GROUP BY e.dst),
r2 AS (SELECT n.node, CAST(150000 + COALESCE(c2.c, 0) AS BIGINT) AS r
       FROM nodes n LEFT JOIN c2 ON c2.node = n.node)
SELECT node AS token, r AS rank_micro FROM r2
""")
def q278(spark, sf_dir):
    """TextRank keyword scores over the documents corpus: PageRank
    (2 unrolled exact-integer iterations) on the adjacent-token
    co-occurrence graph — the unsupervised keyword extractor that
    rewards tokens connecting many DISTINCT contexts rather than
    merely frequent ones.  The engine builds pairs scan-stage
    (zip_with over two array slices, no positional self-join); the
    oracle rebuilds the same graph BY a positional self-join — two
    mechanisms, equal integers."""
    from ultraviolet_spark.operators.textstats import textrank_keywords

    return textrank_keywords(_t(spark, sf_dir, "documents"),
                             text_col="text", window=2, iters=2)


@q("q279_shapley_attribution", """
WITH conv AS (
  SELECT user_id AS u,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) = 1
           AS cv
  FROM events GROUP BY user_id),
chi AS (
  SELECT channel,
         CAST(ROW_NUMBER() OVER (ORDER BY channel) - 1 AS INTEGER)
           AS idx
  FROM (SELECT DISTINCT event_type AS channel FROM events
        WHERE event_type <> 'purchase' AND event_id % 3 = 0)),
um AS (
  SELECT conv.u, COALESCE(m.mask, 0) AS mask, conv.cv
  FROM conv LEFT JOIN (
    SELECT e.user_id AS u,
           bit_or(CAST(1 AS BIGINT) << chi.idx) AS mask
    FROM events e JOIN chi ON chi.channel = e.event_type
    WHERE e.event_type <> 'purchase' AND e.event_id % 3 = 0
    GROUP BY e.user_id) m USING (u)),
bym AS (SELECT mask,
               CAST(SUM(CASE WHEN cv THEN 1 ELSE 0 END) AS BIGINT)
                 AS conv
        FROM um GROUP BY mask),
kk AS (SELECT CAST(COUNT(*) AS INTEGER) AS k FROM chi),
nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM um),
ss AS (SELECT CAST(t.i AS BIGINT) AS s
       FROM range(4096) t(i), kk
       WHERE t.i < (CAST(1 AS BIGINT) << kk.k)),
zeta AS (SELECT ss.s, COALESCE(SUM(bym.conv), 0) AS conv_s
         FROM ss LEFT JOIN bym ON (bym.mask & ss.s) = bym.mask
         GROUP BY ss.s),
pr AS (
  SELECT chi.channel, zeta.s AS s0,
         (zeta.s | (CAST(1 AS BIGINT) << chi.idx)) AS s1,
         ([1,1,2,6,24,120,720,5040,40320,362880,3628800,39916800,
           479001600][bit_count(zeta.s) + 1]
          * [1,1,2,6,24,120,720,5040,40320,362880,3628800,39916800,
             479001600][kk.k - 1 - bit_count(zeta.s) + 1]) AS w
  FROM chi, zeta, kk
  WHERE ((zeta.s >> chi.idx) & 1) = 0),
raw AS (
  SELECT pr.channel,
         SUM(CAST(pr.w AS HUGEINT) * (z1.conv_s - z0.conv_s)) AS raw
  FROM pr JOIN zeta z1 ON z1.s = pr.s1 JOIN zeta z0 ON z0.s = pr.s0
  GROUP BY pr.channel)
SELECT raw.channel,
       round(CAST(raw.raw AS DOUBLE)
             / CAST([1,1,2,6,24,120,720,5040,40320,362880,3628800,
                     39916800,479001600][kk.k + 1] AS DOUBLE)
             / CAST(nn.n AS DOUBLE), 6) AS phi_share,
       nn.n AS n_users, kk.k AS n_channels
FROM raw, kk, nn
""")
def q279(spark, sf_dir):
    """Exact Shapley-value channel attribution over the events log:
    channels are the non-purchase event types a user touched (event
    stream deterministically thinned to event_id % 3 = 0 so user
    channel-sets genuinely vary), conversion is any purchase; each
    channel's credit is its average marginal contribution over every
    coalition of the other channels — all-integer factorial-weighted
    sums over the exactly-enumerated 2^K subset lattice, one double
    division at the end.  The oracle replays the full lattice."""
    from ultraviolet_spark.operators.funnel import shapley_attribution

    ev = _t(spark, sf_dir, "events")
    conv = ev.groupBy(F.col("user_id").alias("u")).agg(
        F.max(F.col("event_type") == "purchase").alias("cv"))
    touch = (ev.filter((F.col("event_type") != "purchase")
                       & (F.col("event_id") % 3 == 0))
             .select(F.col("user_id").alias("u"),
                     F.col("event_type").alias("channel")))
    allu = conv.select("u", F.lit(None).cast("string").alias("channel"),
                       "cv")
    df = (touch.join(conv, "u").select("u", "channel", "cv")
          .union(allu))
    return shapley_attribution(df, user_col="u", channel_col="channel",
                               converted_col="cv")


@q("q280_change_point", """
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS h,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY event_type, date_trunc('hour', ts)),
r AS (
  SELECT event_type, h,
         CAST(ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h)
              AS BIGINT) AS i,
         CAST(SUM(c * 1000000) OVER (PARTITION BY event_type ORDER BY h
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS s,
         CAST(SUM(c * 1000000) OVER (PARTITION BY event_type)
              AS BIGINT) AS sn,
         CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
  FROM hourly),
gg AS (
  SELECT event_type, h, i, s, sn, n,
         round(CAST(CAST(s AS HUGEINT) * n - CAST(i AS HUGEINT) * sn
                    AS DOUBLE)
               * CAST(CAST(s AS HUGEINT) * n - CAST(i AS HUGEINT) * sn
                      AS DOUBLE)
               / CAST(n AS DOUBLE) / CAST(i AS DOUBLE)
               / CAST(n - i AS DOUBLE)) AS g
  FROM r WHERE i < n),
pk AS (
  SELECT * FROM gg
  QUALIFY ROW_NUMBER() OVER (PARTITION BY event_type
                             ORDER BY g DESC, i ASC) = 1)
SELECT event_type, n, i AS tau, h AS split_at, g AS gain,
       round(CAST(s AS DOUBLE) / CAST(i AS DOUBLE) / 1e6, 6) AS mean_l,
       round(CAST(sn - s AS DOUBLE) / CAST(n - i AS DOUBLE) / 1e6, 6)
         AS mean_r
FROM pk
""")
def q280(spark, sf_dir):
    """Retrospective single mean-shift change-point per event type
    over its hourly event-count series: the split τ maximizing the
    exact between-segment sum of squares (Sτ·n − τ·Sₙ)²/(n·τ·(n−τ)) —
    integer discriminant in DECIMAL(38,0), gain as fixed-operand-order
    doubles rounded before the argmax, ties to smallest τ; the oracle
    replays identical integers through plain partitioned windows."""
    from ultraviolet_spark.operators.stats import change_point

    hourly = (_t(spark, sf_dir, "events")
              .groupBy("event_type",
                       F.date_trunc("hour", F.col("ts")).alias("h"))
              .agg(F.count("*").cast("double").alias("c")))
    return change_point(hourly, key_col="event_type", order_col="h",
                        value_col="c", tiebreak_col="h")
