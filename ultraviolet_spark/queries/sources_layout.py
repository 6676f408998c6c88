"""Registry chunk: sources, layout/skipping, tokens, multimodal (q141-q190).

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
from ultraviolet_spark.queries.crawl import _DHASH_BANDS_CTE  # noqa: E402

@q("q141_ewma_decayed_value", """
WITH p AS (
  SELECT user_id, ts, event_id,
         CAST(floor(value * 1000000) AS BIGINT) AS m
  FROM events WHERE event_type = 'purchase'),
l AS (
  SELECT user_id, COUNT(*) AS n, list(m ORDER BY ts, event_id) AS ms
  FROM p GROUP BY user_id)
SELECT user_id, CAST(n AS BIGINT) AS n,
       CAST(list_reduce(ms, (acc, v) -> (acc + v) // 2) AS BIGINT)
           AS ewma_micro
FROM l
""")
def q141(spark, sf_dir):
    """Per-user exponentially-decayed purchase value (integer EWMA,
    α=1/2, trunc-div recurrence over an explicitly ordered history) —
    bit-exact across engines where a float EWMA never is; the oracle
    folds the identical list with list_reduce."""
    from ultraviolet_spark.operators.windows import ewma_by_key

    p = (_t(spark, sf_dir, "events")
         .filter(F.col("event_type") == "purchase"))
    return ewma_by_key(p, value_col="value",
                       order_cols=["ts", "event_id"], by="user_id")


@q("q142_zorder_key", """
WITH base AS (
  SELECT o_orderkey, o_custkey & 65535 AS x,
         (CAST(o_orderdate AS DATE) - DATE '1970-01-01') & 65535 AS y
  FROM orders)
SELECT o_orderkey,
       CAST(SUM((((x >> b.b) & 1) << (2 * b.b))
                + (((y >> b.b) & 1) << (2 * b.b + 1))) AS BIGINT) AS zkey
FROM base, (SELECT unnest(generate_series(0, 15)) AS b) b
GROUP BY o_orderkey
""")
def q142(spark, sf_dir):
    """Z-order (Morton) clustering key over (customer, order-day) —
    the multi-dimensional data-skipping layout: pure integer bit
    interleaving, bit-identical in any engine (the oracle rebuilds
    every key as a bit sum).  ``write_zordered`` sorts files by this
    key so parquet min/max stats prune on either dimension
    (tests/test_layout.py quantifies the skipping)."""
    from ultraviolet_spark.plans.layout import zorder_key

    o = (_t(spark, sf_dir, "orders")
         .withColumn("x", F.col("o_custkey").bitwiseAND(F.lit(65535)))
         .withColumn("y", F.datediff(
             F.col("o_orderdate").cast("date"),
             F.lit("1970-01-01").cast("date"))
             .cast("long").bitwiseAND(F.lit(65535))))
    return o.select("o_orderkey",
                    zorder_key(["x", "y"], bits=16).alias("zkey"))


@q("q143_hll_daily_to_weekly", """
WITH h AS (
  SELECT strftime(date_trunc('week', ts), '%Y-%m-%d') AS week,
         CAST(CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 12))
              AS UBIGINT) AS BIGINT) AS h
  FROM events WHERE user_id IS NOT NULL)
SELECT week, CAST(h % 512 AS INTEGER) AS bucket,
       CAST(MAX(39 - length(ltrim(bin(h >> 9), '0')) + 1) AS INTEGER)
         AS max_rho
FROM h GROUP BY 1, 2
""")
def q143(spark, sf_dir):
    """Incremental-crawl sketch rollup: build one HLL register table
    PER DAY (the nightly delta), then MERGE the daily sketches into
    weekly ones with bucket-max — never rescanning the raw corpus.
    The oracle recomputes each week's registers from scratch; equality
    is the mergeability theorem (max is associative) verified
    cross-engine on real data."""
    from ultraviolet_spark.operators.sketches import hll_registers

    ev = (_t(spark, sf_dir, "events")
          .withColumn("day", F.date_trunc("day", "ts"))
          .withColumn("week", F.date_format(F.date_trunc("week", "ts"),
                                  "yyyy-MM-dd")))
    daily = hll_registers(ev, col="user_id", p=9, by=["week", "day"])
    return (daily.groupBy("week", "bucket")
            .agg(F.max("max_rho").alias("max_rho")))


@q("q144_streaming_asof_enrich", """
SELECT CAST(e.user_id AS VARCHAR) AS key, e.ts, c.value AS value
FROM (SELECT * FROM events WHERE event_type = 'purchase') e
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON e.user_id = c.user_id AND e.ts >= c.ts
""")
def q144(spark, sf_dir):
    """STREAMING as-of join, driver-visible: the tagged spine+feature
    event log goes through an actual readStream →
    applyInPandasWithState point-in-time enrich → memory sink, and the
    result must equal DuckDB's native batch ASOF JOIN — the streaming
    twin of q15, state = two scalars per key."""
    import os
    import tempfile
    import uuid

    from ultraviolet_spark.streaming.stateful import (
        streaming_asof_enrich, tag_spine_and_features)

    ev = _t(spark, sf_dir, "events")
    spine = (ev.filter(F.col("event_type") == "purchase")
             .select("user_id", "ts"))
    feats = (ev.filter(F.col("event_type") == "click")
             .select("user_id", "ts", "value"))
    tagged = tag_spine_and_features(spine, feats, by="user_id",
                                    ts_col="ts", val_col="value")
    tmp = tempfile.mkdtemp(prefix="uv_q144_")
    srcdir = os.path.join(tmp, "in")
    tagged.coalesce(1).write.parquet(srcdir)
    schema = spark.read.parquet(srcdir).schema
    stream = (spark.readStream.schema(schema).format("parquet")
              .load(srcdir))
    out = streaming_asof_enrich(stream, by="key", ts_col="ts",
                                val_col="value")
    name = f"uv_q144_{uuid.uuid4().hex[:8]}"
    q_ = (out.writeStream.format("memory").queryName(name)
          .outputMode("append")
          .option("checkpointLocation", os.path.join(tmp, "ckpt"))
          .trigger(availableNow=True).start())
    q_.awaitTermination(300)
    return spark.sql(f"SELECT key, ts, value FROM {name}")


@q("q145_crawl_budget", """
WITH d AS (
  SELECT source AS domain, COUNT(*) AS n_pages
  FROM documents GROUP BY source),
t AS (SELECT SUM(n_pages) AS N FROM d),
b AS (SELECT domain, n_pages,
             (n_pages * 1000) // t.N AS base,
             (n_pages * 1000) % t.N AS rem
      FROM d, t),
r AS (SELECT *, ROW_NUMBER() OVER (ORDER BY rem DESC, domain) AS rk,
             (SELECT 1000 - SUM(base) FROM b) AS leftover
      FROM b)
SELECT domain, CAST(n_pages AS BIGINT) AS n_pages,
       CAST(base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END
            AS BIGINT) AS slots
FROM r
""")
def q145(spark, sf_dir):
    """Proportional crawl-budget allocation (Hamilton largest-remainder
    apportionment): 1000 fetch slots split across domains by page
    count, Σslots = 1000 exactly — all integer arithmetic, the oracle
    recomputes every quota, remainder and rank."""
    from ultraviolet_spark.operators.frontier import crawl_budget

    d = (_t(spark, sf_dir, "documents")
         .groupBy(F.col("source").alias("domain"))
         .agg(F.count("*").alias("n_pages")))
    return crawl_budget(d, budget=1000)


@q("q146_rendezvous_sharding", """
WITH hosts AS (
  SELECT DISTINCT 'h' || (doc_id % 997) AS host FROM documents),
s AS (
  SELECT host, w.w AS w,
         CAST(('0x' || substr(md5(host || ':' || w.w), 1, 12))
              AS UBIGINT) AS score
  FROM hosts, (SELECT unnest(generate_series(0, 6)) AS w) w),
r AS (
  SELECT host, w,
         ROW_NUMBER() OVER (PARTITION BY host
                            ORDER BY score DESC, w) AS rk
  FROM s)
SELECT host, CAST(w AS INTEGER) AS worker FROM r WHERE rk = 1
""")
def q146(spark, sf_dir):
    """Rendezvous (highest-random-weight) crawler sharding: each host
    goes to the worker with the max md5(host:worker) score —
    bit-identical cross-engine, and unlike mod-N sharding a fleet
    resize moves only ~1/(k+1) of hosts (pytest-pinned minimal
    disruption)."""
    from ultraviolet_spark.operators.frontier import rendezvous_assign

    hosts = (_t(spark, sf_dir, "documents")
             .select(F.concat(F.lit("h"), (F.col("doc_id") % 997))
                     .alias("host")).distinct())
    return rendezvous_assign(hosts, n_workers=7)


@q("q147_video_frame_sample", """
WITH v AS (
  SELECT doc_id AS media_id, 10 + doc_id % 7 AS nf FROM documents),
fr AS (
  SELECT media_id, nf, f.f AS frame_no
  FROM v, (SELECT unnest(generate_series(0, 16)) AS f) f
  WHERE f.f % 3 = 0 AND f.f < nf),
b AS (
  SELECT media_id, frame_no, k.k AS k,
         (media_id * 13 + (frame_no * 12 + k.k) * 7) % 256 AS byte
  FROM fr, (SELECT unnest(generate_series(0, 11)) AS k) k)
SELECT media_id, CAST(frame_no AS INTEGER) AS frame_no,
       CAST(COUNT(*) AS BIGINT) AS n_bytes,
       CAST(SUM(byte) AS BIGINT) AS byte_sum
FROM b GROUP BY media_id, frame_no
""")
def q147(spark, sf_dir):
    """Video frame sampling through the UVMEDIA container: synthesize
    deterministic 4×3 grayscale videos, sample every 3rd frame with
    ``frame_sample``, emit per-frame byte stats — the oracle recomputes
    each sampled frame's byte sum from the synthesis formula, proving
    the header parse, frame-size math and payload slicing
    byte-exactly."""
    from ultraviolet_spark.operators.multimodal import (
        frame_byte_stats, frame_sample, synthesize_video)

    vids = synthesize_video(_t(spark, sf_dir, "documents")
                            .select("doc_id"))
    frames = frame_sample(vids, every_n=3)
    return frame_byte_stats(frames)


@q("q148_http_response_parse", """
WITH d AS (
  SELECT doc_id,
         CASE doc_id % 3 WHEN 0 THEN 200 WHEN 1 THEN 301
                         ELSE 404 END AS st,
         CASE doc_id % 4 WHEN 0 THEN 'utf-8' WHEN 1 THEN 'iso-8859-1'
                         WHEN 2 THEN 'windows-1252' ELSE NULL
         END AS cs,
         10 + doc_id % 5 AS blen,
         doc_id % 11 = 0 AS truncated
  FROM documents)
SELECT doc_id,
  CASE WHEN truncated THEN NULL ELSE st END AS status,
  CASE WHEN truncated THEN NULL ELSE '1.1' END AS http_version,
  CASE WHEN truncated THEN NULL ELSE 'text/html' END AS content_type,
  CASE WHEN truncated THEN NULL ELSE cs END AS charset_label,
  CASE WHEN truncated THEN NULL
       ELSE CAST(blen AS BIGINT) END AS content_length,
  CASE WHEN truncated THEN NULL
       ELSE CAST(blen AS BIGINT) END AS body_len,
  CASE WHEN truncated THEN NULL ELSE repeat('x', blen) END AS body_text
FROM d
""")
def q148(spark, sf_dir):
    """HTTP response-record parsing (the WARC response → pages-table
    seam): status line, version, media type, charset parameter,
    Content-Length claim and the byte-exact body split, all pure
    Catalyst over a latin-1 byte bijection.  Payloads are synthesized
    analytically from doc_id (every 11th one truncated before the
    CRLFCRLF boundary — must yield NULLs, not failures); the oracle
    never parses anything."""
    from ultraviolet_spark.operators.http import split_http_response

    d = _t(spark, sf_dir, "documents").select("doc_id")
    st = (F.when(F.col("doc_id") % 3 == 0, 200)
          .when(F.col("doc_id") % 3 == 1, 301).otherwise(404))
    cs = (F.when(F.col("doc_id") % 4 == 0, "utf-8")
          .when(F.col("doc_id") % 4 == 1, "iso-8859-1")
          .when(F.col("doc_id") % 4 == 2, "windows-1252"))
    blen = (F.lit(10) + F.col("doc_id") % 5).cast("int")
    head = F.concat(
        F.lit("HTTP/1.1 "), st.cast("string"), F.lit(" OK\r\n"),
        F.lit("Content-Type: text/html"),
        F.coalesce(F.concat(F.lit("; charset="), cs), F.lit("")),
        F.lit("\r\ncontent-length: "), blen.cast("string"),
        F.lit("\r\nX-Crawl: "), F.col("doc_id").cast("string"))
    full = F.concat(head, F.lit("\r\n\r\n"), F.repeat(F.lit("x"), blen))
    payload_str = F.when(F.col("doc_id") % 11 == 0, head).otherwise(full)
    parsed = split_http_response(
        d.withColumn("payload", F.encode(payload_str, "ISO-8859-1")),
        payload_col="payload", keep_headers=False)
    return parsed.select(
        "doc_id", "status", "http_version", "content_type",
        "charset_label", "content_length",
        F.octet_length("body").cast("long").alias("body_len"),
        F.decode("body", "ISO-8859-1").alias("body_text"))


@q("q149_bitext_mining", """
WITH side AS (
  SELECT doc_id, lang,
         'https://ex.com/*/p' || (doc_id % 250) AS stem,
         CAST(length(text) AS BIGINT) AS n_chars
  FROM documents),
s AS (SELECT stem, doc_id AS src_id, n_chars AS src_chars
      FROM side WHERE lang = 'en'),
t AS (SELECT stem, doc_id AS tgt_id, n_chars AS tgt_chars
      FROM side WHERE lang = 'de')
SELECT s.stem, s.src_id, t.tgt_id, s.src_chars, t.tgt_chars,
       round(CAST(LEAST(s.src_chars, t.tgt_chars) AS DOUBLE)
             / GREATEST(s.src_chars, t.tgt_chars), 6) AS len_ratio
FROM s JOIN t ON t.stem = s.stem
WHERE LEAST(s.src_chars, t.tgt_chars)
      >= 0.5 * GREATEST(s.src_chars, t.tgt_chars)
  AND s.src_chars > 0
""")
def q149(spark, sf_dir):
    """Parallel-page (bitext) candidate mining: en/de pages whose URLs
    differ only in the language segment, gated by the ≥0.5 character
    length ratio — the ParaCrawl-family first stage.  URLs synthesized
    from (doc_id, lang); the oracle mirrors the stem join and ratio
    arithmetic exactly."""
    from ultraviolet_spark.operators.urls import bitext_candidates

    d = (_t(spark, sf_dir, "documents")
         .withColumn("url", F.concat(
             F.lit("https://ex.com/"), F.col("lang"), F.lit("/p"),
             (F.col("doc_id") % 250).cast("string"))))
    return bitext_candidates(d, src_lang="en", tgt_lang="de")


@q("q150_luhn_card_detection", """
WITH d AS (
  SELECT doc_id,
         lpad(CAST((doc_id * 98765 + 4321) % 10000000000000000
                   AS VARCHAR), 16, '0') AS pan
  FROM documents),
v AS (
  SELECT doc_id, pan,
         list_sum(list_transform(generate_series(1, length(pan)),
           i -> CASE WHEN i % 2 = 0 THEN
                  CASE WHEN 2*CAST(substr(reverse(pan), i, 1) AS INT) > 9
                       THEN 2*CAST(substr(reverse(pan), i, 1) AS INT) - 9
                       ELSE 2*CAST(substr(reverse(pan), i, 1) AS INT) END
                ELSE CAST(substr(reverse(pan), i, 1) AS INT) END))
           % 10 AS ck
  FROM d)
SELECT doc_id, pan FROM v WHERE ck = 0
""")
def q150(spark, sf_dir):
    """Checksum-verified payment-card PII: texts synthesized with one
    dash-formatted 16-digit number each (digits analytic in doc_id),
    the detector explodes digit runs, strips separators and keeps only
    Luhn-valid PANs — the oracle recomputes the checksum in SQL, so a
    hash match proves the extraction, normalization AND the mod-10
    arithmetic.  ~10% of docs pass, exactly the ones the oracle
    predicts."""
    from ultraviolet_spark.operators.textstats import card_numbers

    pan = F.lpad(((F.col("doc_id") * 98765 + 4321)
                  % F.lit(10 ** 16)).cast("string"), 16, "0")
    fmt = F.concat_ws("-", F.substring(pan, 1, 4), F.substring(pan, 5, 4),
                      F.substring(pan, 9, 4), F.substring(pan, 13, 4))
    d = (_t(spark, sf_dir, "documents")
         .select("doc_id", F.concat(
             F.lit("order "), F.col("doc_id").cast("string"),
             F.lit(" pay with "), fmt,
             F.lit(" ref 123456789012 total 99.95")).alias("text")))
    return card_numbers(d)


@q("q151_table_stats", """
SELECT 'o_orderkey' AS "column", COUNT(*) AS n,
       COUNT(*) - COUNT(o_orderkey) AS n_null,
       COUNT(DISTINCT o_orderkey) AS n_distinct,
       CAST(MIN(o_orderkey) AS VARCHAR) AS min_str,
       CAST(MAX(o_orderkey) AS VARCHAR) AS max_str
FROM orders
UNION ALL
SELECT 'o_orderstatus', COUNT(*), COUNT(*) - COUNT(o_orderstatus),
       COUNT(DISTINCT o_orderstatus),
       CAST(MIN(o_orderstatus) AS VARCHAR),
       CAST(MAX(o_orderstatus) AS VARCHAR)
FROM orders
UNION ALL
SELECT 'o_totalprice', COUNT(*), COUNT(*) - COUNT(o_totalprice),
       COUNT(DISTINCT o_totalprice),
       CAST(MIN(o_totalprice) AS VARCHAR),
       CAST(MAX(o_totalprice) AS VARCHAR)
FROM orders
""")
def q151(spark, sf_dir):
    """ANALYZE-style exact column statistics (count / nulls / NDV /
    min / max as strings) in ONE multi-aggregate pass — the stats
    table that drives broadcast thresholds, salt factors and partition
    sizing; the oracle recomputes every statistic per column."""
    from ultraviolet_spark.operators.stats import table_stats

    o = _t(spark, sf_dir, "orders")
    return table_stats(o, cols=["o_orderkey", "o_orderstatus",
                                "o_totalprice"])


@q("q152_stupid_backoff_lm", """
WITH t AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS w
  FROM documents WHERE length(trim(text)) > 0),
tg AS (
  SELECT doc_id, w[i] AS w1, w[i+1] AS w2, w[i+2] AS w3
  FROM (SELECT doc_id, w, unnest(generate_series(1, len(w) - 2)) AS i
        FROM t WHERE len(w) >= 3)),
m123 AS (SELECT w1, w2, w3, COUNT(*) AS c123 FROM tg GROUP BY 1, 2, 3),
m12 AS (SELECT w1, w2, COUNT(*) AS c12 FROM tg GROUP BY 1, 2),
m23 AS (SELECT w2, w3, COUNT(*) AS c23 FROM tg GROUP BY 1, 2),
m2 AS (SELECT w2, COUNT(*) AS c2 FROM tg GROUP BY 1),
uni AS (SELECT unnest(w) AS u FROM t),
m3 AS (SELECT u AS w3, COUNT(*) AS c3 FROM uni GROUP BY 1),
nn AS (SELECT COUNT(*) AS n FROM uni),
s AS (
  SELECT doc_id,
    CAST(round(CASE
      WHEN COALESCE(c123, 0) > 0
        THEN ln(CAST(c123 AS DOUBLE) / c12)
      WHEN COALESCE(c23, 0) > 0
        THEN ln(0.4 * (CAST(c23 AS DOUBLE) / c2))
      ELSE ln(0.16000000000000003
              * (CAST(GREATEST(COALESCE(c3, 0), 1) AS DOUBLE) / n))
    END * 1e6) AS BIGINT) AS lp_u
  FROM tg LEFT JOIN m123 USING (w1, w2, w3)
          LEFT JOIN m12 USING (w1, w2)
          LEFT JOIN m23 USING (w2, w3)
          LEFT JOIN m2 USING (w2)
          LEFT JOIN m3 USING (w3), nn),
a AS (SELECT doc_id, COUNT(*) AS nt,
             round(-SUM(lp_u) / (COUNT(*) * 1e6), 6) AS ce
      FROM s GROUP BY doc_id)
SELECT d.doc_id, CAST(COALESCE(nt, 0) AS BIGINT) AS n_trigrams,
       COALESCE(ce, 0.0) AS sb_cross_entropy
FROM documents d LEFT JOIN a USING (doc_id)
""")
def q152(spark, sf_dir):
    """Trigram Stupid-Backoff LM scoring (Brants et al. 2007): seen
    trigram → relative frequency; else α·bigram; else α²·unigram floor
    (OOV clamps to 1/N) — the web-scale quality LM that skips
    normalization.  Self-scored on the corpus; micro-nat integer sums
    make the oracle exact.  (0.16000000000000003 is the double-exact
    value of 0.4*0.4 — the literal must match Spark's computed α².)"""
    from ultraviolet_spark.operators.textstats import sb_trigram_scores

    return sb_trigram_scores(_t(spark, sf_dir, "documents"))


@q("q153_image_resize", f"""
WITH {_DHASH_BANDS_CTE}
SELECT media_id, 'bmp' AS kind,
       CAST(9 AS INTEGER) AS width, CAST(8 AS INTEGER) AS height,
       CAST(3 AS INTEGER) AS channels,
       round(CAST(SUM(m) AS DOUBLE) / 72, 6) AS mean_b,
       round(CAST(SUM(m) AS DOUBLE) / 72, 6) AS mean_g,
       round(CAST(SUM(m) AS DOUBLE) / 72, 6) AS mean_r
FROM m GROUP BY media_id
""")
def q153(spark, sf_dir):
    """Image RESIZE (box-mean area downscale to 9×8) through the real
    codecs: synthesize gray BMPs, resize (integer floor-means,
    re-encoded as BMP), decode the RESIZED bytes again and emit
    per-channel means — the oracle recomputes every target pixel from
    the synthesis formula (same box grid as the dHash CTE), so a hash
    match proves the resize arithmetic AND the encode→decode roundtrip
    of the resized image."""
    from ultraviolet_spark.operators.multimodal import (
        decode_features, resize_images, synthesize_dhash_bmp)

    media = synthesize_dhash_bmp(
        _t(spark, sf_dir, "documents").select("doc_id"))
    small = resize_images(media, out_w=9, out_h=8)
    return (decode_features(small)
            .select("media_id", "kind", "width", "height", "channels",
                    "mean_b", "mean_g", "mean_r"))


@q("q154_ip_range_lookup", """
WITH ips AS (
  SELECT doc_id,
         ((10 * 256 + doc_id % 256) * 256 + (doc_id * 7) % 256) * 256
           + (doc_id * 13) % 256 AS ip
  FROM documents),
r(lo, hi, net) AS (VALUES
  (CAST(167772160 AS BIGINT), CAST(167837695 AS BIGINT), 'net-a'),
  (CAST(167837696 AS BIGINT), CAST(167903231 AS BIGINT), 'net-b'),
  (CAST(167968768 AS BIGINT), CAST(184549375 AS BIGINT), 'net-wide'),
  (CAST(3232235520 AS BIGINT), CAST(3232301055 AS BIGINT), 'rfc1918'))
SELECT i.doc_id, i.ip, r.net
FROM ips i JOIN r ON i.ip BETWEEN r.lo AND r.hi
""")
def q154(spark, sf_dir):
    """GeoIP-style IP-range lookup as an EQUI-join: ranges exploded
    into their /16 buckets, probe joins on ip>>16 then exact between —
    the interval join that stays a hash join at 10^12 probe rows
    (the oracle is the plain BETWEEN theta-join).  IPs derive from
    doc_id via ipv4_to_long over synthesized dotted quads, so the
    string parser is covered too."""
    from ultraviolet_spark.operators.iplookup import (
        ip_range_lookup, ipv4_to_long)

    d = (_t(spark, sf_dir, "documents")
         .select("doc_id", F.concat(
             F.lit("10."), (F.col("doc_id") % 256).cast("string"),
             F.lit("."), ((F.col("doc_id") * 7) % 256).cast("string"),
             F.lit("."), ((F.col("doc_id") * 13) % 256).cast("string"))
             .alias("ip_str"))
         .withColumn("ip", ipv4_to_long("ip_str")).drop("ip_str"))
    ranges = spark.createDataFrame(
        [(167772160, 167837695, "net-a"),
         (167837696, 167903231, "net-b"),
         (167968768, 184549375, "net-wide"),
         (3232235520, 3232301055, "rfc1918")],
        "lo long, hi long, net string")
    return ip_range_lookup(d, ranges).select("doc_id", "ip", "net")


@q("q155_universe_sample_join", """
WITH keep AS (
  SELECT DISTINCT o_orderkey AS k FROM orders
  WHERE CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 12))
             AS UBIGINT) < CAST(FLOOR(0.2 * 281474976710656) AS UBIGINT))
SELECT o.o_orderstatus, COUNT(*) AS n_items,
  CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
      AS sum_price
FROM orders o
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN keep ON keep.k = o.o_orderkey
GROUP BY o.o_orderstatus
""")
def q155(spark, sf_dir):
    """Universe (join-consistent) sampling: orders AND lineitem each
    keep the same md5-thresholded 20% key universe, so their join is
    the full join restricted to sampled keys — a row-Bernoulli sample
    would keep only 4% of pairs and bias every join aggregate.  The
    oracle applies one key filter to the exact join; equality proves
    both tables sampled the identical universe."""
    from ultraviolet_spark.operators.corpus import universe_sample

    o = universe_sample(_t(spark, sf_dir, "orders"), 0.2,
                        key_col="o_orderkey")
    li = universe_sample(_t(spark, sf_dir, "lineitem"), 0.2,
                         key_col="l_orderkey")
    return (o.join(li, o["o_orderkey"] == li["l_orderkey"])
            .groupBy("o_orderstatus")
            .agg(F.count("*").alias("n_items"),
                 F.sum(_dec("l_extendedprice")).cast("double")
                  .alias("sum_price")))


@q("q156_join_cardinality", """
WITH ca AS (SELECT o_custkey AS k, COUNT(*) AS ca FROM orders GROUP BY 1),
cb AS (SELECT c_custkey AS k, COUNT(*) AS cb FROM customer GROUP BY 1),
j AS (SELECT ca.ca, cb.cb FROM ca JOIN cb USING (k))
SELECT CAST(COALESCE(SUM(ca * cb), 0) AS BIGINT) AS join_rows,
       CAST(COUNT(*) AS BIGINT) AS matching_keys,
       CAST(COALESCE(MAX(ca * cb), 0) AS BIGINT) AS max_key_rows
FROM j
""")
def q156(spark, sf_dir):
    """Join-cardinality estimation without running the join: Σ
    count_a(k)·count_b(k) over matching keys plus the max single-key
    contribution (the skew signal that decides salting) — the planner
    pre-pass, costing only two distinct-key count shuffles.  Oracle
    recomputes the same arithmetic; the result also EQUALS the true
    orders⋈customer row count."""
    from ultraviolet_spark.operators.stats import join_cardinality

    return join_cardinality(_t(spark, sf_dir, "orders"),
                            _t(spark, sf_dir, "customer"),
                            a_key="o_custkey", b_key="c_custkey")


@q("q157_incremental_agg", """
SELECT user_id, event_type, COUNT(*) AS n,
  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events GROUP BY user_id, event_type
""")
def q157(spark, sf_dir):
    """Incremental materialized-aggregate maintenance: the events
    stream split into three crawl deltas, each folded into the stored
    per-key aggregate without rescanning history (counts/sums merge as
    monoids) — the result must equal the full GROUP BY over everything
    (the oracle).  The never-rescan exact-count sibling of q143's HLL
    rollup."""
    from ultraviolet_spark.operators.history import incremental_agg

    ev = (_t(spark, sf_dir, "events")
          .withColumn("__v", _dec("value")))
    agg = None
    for part in range(3):
        delta = ev.filter(F.col("event_id") % 3 == part)
        agg = incremental_agg(agg, delta, keys=["user_id", "event_type"],
                              sums={"sum_value": "__v"})
    return agg.select("user_id", "event_type", "n",
                      F.col("sum_value").cast("double").alias("sum_value"))


@q("q158_gif_codec_roundtrip", """
WITH img AS (
  SELECT doc_id, 3 + doc_id % 6 AS w, 2 + doc_id % 5 AS h FROM documents),
pxx AS (
  SELECT doc_id, w, h, unnest(generate_series(0, w - 1)) AS x FROM img),
pxy AS (
  SELECT doc_id, w, h, x, unnest(generate_series(0, h - 1)) AS y FROM pxx),
pix AS (
  SELECT doc_id, w, h, (doc_id + 5*x + 11*y) % 16 AS idx FROM pxy),
f AS (
  SELECT doc_id, w, h,
    round(CAST(SUM((doc_id + 17*idx) % 256) AS DOUBLE) / (w*h), 6) AS mean_r,
    round(CAST(SUM((29*idx) % 256) AS DOUBLE) / (w*h), 6) AS mean_g,
    round(CAST(SUM((3*doc_id + 43*idx) % 256) AS DOUBLE) / (w*h), 6) AS mean_b
  FROM pix GROUP BY doc_id, w, h)
SELECT doc_id AS media_id, 'gif' AS kind,
       CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height,
       CAST(3 AS INTEGER) AS channels, mean_r, mean_g, mean_b
FROM f
""")
def q158(spark, sf_dir):
    """REAL GIF codec round-trip: synthesize actual GIF89a files from
    doc_id (real LZW compression, sub-block framing, every 3rd image
    interlaced), decode with the pure-numpy GIF decoder, emit
    per-channel means.  The oracle computes the expected means
    analytically from the synthesis formula and never sees a byte — a
    hash match proves the LZW coder (variable 3..12-bit codes, width
    growth, dictionary reset), palette mapping and all four interlace
    passes are correct.  Completes the BMP/WAV/PNG/GIF real-codec set
    (q74/q97)."""
    from ultraviolet_spark.operators.multimodal import (
        decode_features, synthesize_gif)

    media = synthesize_gif(_t(spark, sf_dir, "documents").select("doc_id"))
    return (decode_features(media)
            .select("media_id", "kind", "width", "height", "channels",
                    "mean_r", "mean_g", "mean_b"))


@q("q159_winnow_fingerprints", """
WITH d AS (
  SELECT doc_id,
         lower(regexp_replace(text, '[^a-zA-Z0-9]', '', 'g')) AS norm
  FROM documents),
sized AS (
  SELECT doc_id, norm, length(norm) - 6 AS m FROM d
  WHERE length(norm) - 6 >= 8),
g AS (
  SELECT doc_id, m, norm, unnest(generate_series(1, m)) AS pos FROM sized),
h AS (
  SELECT doc_id, m, pos,
         CAST(('0x' || substr(md5(substr(norm, pos, 7)), 1, 8)) AS BIGINT) AS h
  FROM g),
wm AS (
  SELECT doc_id, m, pos AS s,
         MIN(h) OVER (PARTITION BY doc_id ORDER BY pos
                      ROWS BETWEEN CURRENT ROW AND 7 FOLLOWING) AS mh
  FROM h),
starts AS (SELECT doc_id, s, mh FROM wm WHERE s <= m - 7),
sel AS (
  SELECT h.doc_id, starts.s, MAX(h.pos) AS fp_pos, starts.mh AS fp_hash
  FROM starts JOIN h ON h.doc_id = starts.doc_id
       AND h.pos BETWEEN starts.s AND starts.s + 7 AND h.h = starts.mh
  GROUP BY h.doc_id, starts.s, starts.mh)
SELECT DISTINCT doc_id, CAST(fp_pos AS INTEGER) AS fp_pos, fp_hash FROM sel
""")
def q159(spark, sf_dir):
    """Winnowing fingerprints (Schleimer et al. 2003, the MOSS
    algorithm): per-window rightmost-min of md5 k-gram hashes (k=7,
    w=8) selected entirely inside the scan stage (array expressions,
    zero shuffle/Python).  The oracle rebuilds every k-gram hash and
    replays the window selection with SQL window functions — an
    independent implementation of the same paper."""
    from ultraviolet_spark.operators.winnow import winnow_fingerprints

    return winnow_fingerprints(_t(spark, sf_dir, "documents"),
                               k=7, w=8)


@q("q160_token_suffix_array", """
WITH d AS (
  SELECT doc_id,
         list_slice(string_split_regex(lower(trim(text)), '\\s+'), 1, 32) AS w
  FROM documents WHERE length(trim(text)) > 0),
t AS (
  SELECT doc_id, w, unnest(generate_series(1, len(w))) AS pos FROM d),
tok AS (SELECT doc_id, pos, w[pos] AS token FROM t),
r0 AS (SELECT doc_id, pos, dense_rank() OVER (ORDER BY token) AS r FROM tok),
r1 AS (SELECT a.doc_id, a.pos,
              dense_rank() OVER (ORDER BY a.r, coalesce(b.r, -1)) AS r
       FROM r0 a LEFT JOIN r0 b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1),
r2 AS (SELECT a.doc_id, a.pos,
              dense_rank() OVER (ORDER BY a.r, coalesce(b.r, -1)) AS r
       FROM r1 a LEFT JOIN r1 b ON b.doc_id = a.doc_id AND b.pos = a.pos + 2),
r4 AS (SELECT a.doc_id, a.pos,
              dense_rank() OVER (ORDER BY a.r, coalesce(b.r, -1)) AS r
       FROM r2 a LEFT JOIN r2 b ON b.doc_id = a.doc_id AND b.pos = a.pos + 4),
r8 AS (SELECT a.doc_id, a.pos,
              dense_rank() OVER (ORDER BY a.r, coalesce(b.r, -1)) AS r
       FROM r4 a LEFT JOIN r4 b ON b.doc_id = a.doc_id AND b.pos = a.pos + 8),
r16 AS (SELECT a.doc_id, a.pos,
               dense_rank() OVER (ORDER BY a.r, coalesce(b.r, -1)) AS r
        FROM r8 a LEFT JOIN r8 b ON b.doc_id = a.doc_id AND b.pos = a.pos + 16)
SELECT doc_id, CAST(pos AS INTEGER) AS pos, CAST(r AS BIGINT) AS sa_rank
FROM r16
""")
def q160(spark, sf_dir):
    """Distributed token-level suffix array (Manber–Myers prefix
    doubling, the Lee et al. 2022 substring-dedup index): global dense
    lexicographic rank of every (truncated-to-32-token) document suffix,
    computed with NO single-partition window — range-partitioned sorted
    scans + a P-row boundary prefix sum per doubling round.  The oracle
    replays the same mathematics as 5 chained global dense_rank CTEs
    (fine at oracle scale; the Spark side exists so that is never
    needed)."""
    from ultraviolet_spark.operators.suffix import token_suffix_array

    return token_suffix_array(_t(spark, sf_dir, "documents"),
                              max_tokens=32)


@q("q161_repeated_token_spans", """
WITH d AS (
  SELECT doc_id,
         list_slice(string_split_regex(lower(trim(text)), '\\s+'), 1, 32) AS w
  FROM documents WHERE length(trim(text)) > 0),
t AS (
  SELECT doc_id, w, unnest(generate_series(1, len(w))) AS pos FROM d),
sp AS (
  SELECT doc_id, pos, list_slice(w, pos, least(pos + 7, len(w))) AS sl FROM t),
cls AS (
  SELECT doc_id, pos,
         dense_rank() OVER (ORDER BY sl) AS span_class,
         count(*) OVER (PARTITION BY sl) AS n_occurrences
  FROM sp)
SELECT doc_id, CAST(pos AS INTEGER) AS pos,
       CAST(span_class AS BIGINT) AS span_class,
       CAST(n_occurrences AS BIGINT) AS n_occurrences
FROM cls WHERE n_occurrences > 1
""")
def q161(spark, sf_dir):
    """Repeated 8-token spans (Lee et al. "repeated substring of length
    ≥ L"): every position whose 8-token prefix (whole suffix if shorter)
    occurs ≥ 2× corpus-wide, derived from the resolution-8 prefix-
    doubling rank table.  The oracle is fully independent — it groups by
    the LITERAL token slice and never runs prefix doubling, so a hash
    match proves the doubling recursion groups spans exactly like direct
    slice equality."""
    from ultraviolet_spark.operators.suffix import repeated_spans

    return repeated_spans(_t(spark, sf_dir, "documents"),
                          span=8, max_tokens=32)


def _langseg_sql() -> str:
    """q162 oracle: the stopword-argmax langID of q22, applied per
    10-token chunk, then gaps-and-islands run collapse."""
    score = {l: f"len(list_intersect(cw, {X.STOPWORDS[l]!r}))"
             for l in X.LANGS}
    best = "greatest(" + ", ".join(score.values()) + ")"
    case = " ".join(f"WHEN {score[l]} = __best THEN '{l}'" for l in X.LANGS)
    return f"""
WITH d AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS w
  FROM documents WHERE length(trim(text)) > 0),
ch AS (
  SELECT doc_id, w,
         unnest(generate_series(0, CAST(ceil(len(w) / 10.0) AS INT) - 1))
           AS chunk_idx
  FROM d),
tk AS (
  SELECT doc_id, chunk_idx,
         list_slice(w, chunk_idx * 10 + 1,
                    least(chunk_idx * 10 + 10, len(w))) AS cw
  FROM ch),
sc AS (SELECT doc_id, chunk_idx, cw, {best} AS __best FROM tk),
lab AS (
  SELECT doc_id, chunk_idx,
         CASE WHEN __best > 0 THEN (CASE {case} ELSE 'und' END)
              ELSE 'und' END AS lang
  FROM sc),
g AS (
  SELECT doc_id, chunk_idx, lang,
         chunk_idx - row_number()
           OVER (PARTITION BY doc_id, lang ORDER BY chunk_idx) AS grp
  FROM lab)
SELECT doc_id, lang,
       CAST(MIN(chunk_idx) AS INTEGER) AS seg_start,
       CAST(MAX(chunk_idx) AS INTEGER) AS seg_end,
       CAST(COUNT(*) AS BIGINT) AS n_chunks
FROM g GROUP BY doc_id, lang, grp
"""


@q("q162_lang_segments", _langseg_sql())
def q162(spark, sf_dir):
    """Language-run segmentation (CCNet/mC4 per-paragraph langID over
    fixed 10-token windows): chunk → stopword-argmax langID → collapse
    consecutive same-language chunks with gaps-and-islands.  One doc_id
    exchange shared by the islands window and the run groupBy."""
    from ultraviolet_spark.operators.textstats import lang_segments

    return lang_segments(_t(spark, sf_dir, "documents"), chunk_tokens=10)


@q("q163_edit_distance_pairs", """
WITH v AS (
  SELECT DISTINCT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS word
  FROM documents WHERE length(trim(text)) > 0)
SELECT a.word AS word_a, b.word AS word_b,
       CAST(levenshtein(a.word, b.word) AS INTEGER) AS dist
FROM v a JOIN v b ON a.word < b.word
WHERE levenshtein(a.word, b.word) <= 2 AND a.word <> '' AND b.word <> ''
""")
def q163(spark, sf_dir):
    """EXACT Levenshtein-distance-≤2 pairs over the corpus vocabulary
    via FastSS deletion neighborhoods (explode ≤2-deletion variants →
    variant-key equi-join → exact verify on candidates only — recall
    1.0 by the neighborhood theorem, zero cartesian).  The oracle is
    the brute-force cross join the Spark side exists to avoid."""
    from ultraviolet_spark.operators.fuzzy import deletion_neighborhood_pairs

    d = _t(spark, sf_dir, "documents")
    vocab = (d.filter(F.length(F.trim("text")) > 0)
             .select(F.explode(F.split(F.lower(F.trim(F.col("text"))),
                                       r"\s+")).alias("word"))
             .filter(F.col("word") != ""))
    return deletion_neighborhood_pairs(vocab, col="word", max_dist=2)


@q("q164_csv_roundtrip", """
SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderdate,
       o_orderpriority,
       'a,"b"' || chr(10) || o_orderpriority || chr(9) || chr(13)
         || 'u\\u' AS payload
FROM orders
""")
def q164(spark, sf_dir):
    """CSV source/sink conformance: write orders plus a hostile payload
    column (embedded comma, RFC-4180 doubled quote, LF, TAB, CR,
    backslash, non-ASCII) as quoted CSV, read it back with the same
    explicit schema/options (multiLine, escape='\"', microsecond
    timestamp format, UTC), and return the re-read rows.  The oracle
    recomputes the expected rows straight from parquet and never sees
    the CSV — a hash match proves the writer/parser pair is lossless,
    incl. shortest-decimal double round-trip."""
    import tempfile

    from ultraviolet_spark.sources.textio import csv_roundtrip

    o = _t(spark, sf_dir, "orders")
    gnarly = o.select(
        "o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate",
        "o_orderpriority",
        F.concat(F.lit('a,"b"\n'), F.col("o_orderpriority"),
                 F.lit('\t\ru\\u')).alias("payload"))
    return csv_roundtrip(gnarly, tempfile.mkdtemp(prefix="uv_q164_"))


@q("q165_jsonl_roundtrip", """
SELECT event_id, ts, user_id, event_type, value, props,
       '{"k":"' || event_type || '"}' || chr(10) || chr(9)
         || '\\"u' || chr(8) AS payload
FROM events
""")
def q165(spark, sf_dir):
    """JSON-lines source/sink conformance: write events plus a hostile
    payload (JSON-looking text, quote, LF, TAB, backslash, backspace
    control char, non-ASCII) as JSONL, read back with the same explicit
    schema, return the re-read rows.  Stresses JSON string escaping,
    microsecond timestamp format, and full-precision double round-trip
    (events.value is a raw random double).  Oracle recomputes from
    parquet, never sees the JSON."""
    import tempfile

    from ultraviolet_spark.sources.textio import jsonl_roundtrip

    e = _t(spark, sf_dir, "events")
    gnarly = e.select(
        "event_id", "ts", "user_id", "event_type", "value", "props",
        F.concat(F.lit('{"k":"'), F.col("event_type"),
                 F.lit('"}\n\t\\"u\b')).alias("payload"))
    return jsonl_roundtrip(gnarly, tempfile.mkdtemp(prefix="uv_q165_"))


@q("q166_zipf_fit", """
WITH tk AS (
  SELECT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS t
  FROM documents WHERE length(trim(text)) > 0),
f AS (SELECT t, COUNT(*) AS f FROM tk WHERE t <> '' GROUP BY t),
r AS (SELECT f, row_number() OVER (ORDER BY f DESC, t) AS rnk FROM f),
xy AS (SELECT ln(rnk) AS x, ln(f) AS y, f FROM r),
s AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n, SUM(x) AS sx, SUM(y) AS sy,
             SUM(x*y) AS sxy, SUM(x*x) AS sxx, SUM(y*y) AS syy,
             SUM(f) AS nt
      FROM xy)
SELECT CAST(n AS BIGINT) AS n_vocab, CAST(nt AS BIGINT) AS n_tokens,
       round((n*sxy - sx*sy) / (n*sxx - sx*sx), 6) AS zipf_slope,
       round(CASE WHEN (n*syy - sy*sy) > 0
                  THEN (n*sxy - sx*sy) * (n*sxy - sx*sy)
                       / ((n*sxx - sx*sx) * (n*syy - sy*sy))
                  ELSE 1.0 END, 6) AS zipf_r2
FROM s
""")
def q166(spark, sf_dir):
    """Zipf power-law fit of the token-frequency distribution
    (least-squares ln(freq) on ln(rank)) — a corpus-quality signal;
    identical five-sum formula on both sides, rounded to 6."""
    from ultraviolet_spark.operators.stats import zipf_fit

    return zipf_fit(_t(spark, sf_dir, "documents"))


@q("q167_embedding_covariance", """
WITH qv AS (
  SELECT vec_id,
         list_transform(CAST(embedding AS DOUBLE[]),
                        v -> CAST(floor(v * 1000 + 0.5) AS BIGINT)) AS x
  FROM embeddings),
i AS (SELECT vec_id, x, unnest(generate_series(1, len(x))) AS i FROM qv),
pr AS (SELECT vec_id, x, i, unnest(generate_series(i, len(x))) AS j FROM i),
v AS (SELECT i, j, x[i] * x[j] AS xy, x[i] AS xi, x[j] AS xj FROM pr),
s AS (SELECT i, j, COUNT(*) AS n, SUM(xy) AS sxy, SUM(xi) AS sxi,
             SUM(xj) AS sxj
      FROM v GROUP BY i, j)
SELECT CAST(i AS INTEGER) AS dim_i, CAST(j AS INTEGER) AS dim_j,
       CAST(n AS BIGINT) AS n,
       CAST(n * sxy - sxi * sxj AS BIGINT) AS cov_num
FROM s
""")
def q167(spark, sf_dir):
    """Exact distributed embedding covariance (the PCA/whitening input):
    per-partition d×d Gram partials via one numpy matmul per Arrow
    batch, merged by a (dim_i, dim_j) groupBy — the shuffle moves P·d²
    tiny rows, never n·d².  Fixed-point milli-units with explicit
    half-up (q57 policy) make the numerator n·Σxy − Σx·Σy bit-exact;
    the oracle is the explode-join formulation this operator avoids."""
    from ultraviolet_spark.operators.pca import embedding_covariance_exact

    return embedding_covariance_exact(_t(spark, sf_dir, "embeddings"))


@q("q168_mad_outliers", """
WITH med AS (
  SELECT event_type, round(quantile_cont(value, 0.5), 6) AS med
  FROM events GROUP BY event_type),
m2 AS (
  SELECT e.event_type, med, COUNT(*) AS n,
         round(quantile_cont(abs(e.value - med), 0.5), 6) AS mad
  FROM events e JOIN med USING (event_type)
  GROUP BY e.event_type, med)
SELECT e.event_type, CAST(m2.n AS BIGINT) AS n, m2.med, m2.mad,
       CAST(SUM(CASE WHEN abs(e.value - m2.med) > 3.0 * m2.mad
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
FROM events e JOIN m2 USING (event_type)
GROUP BY e.event_type, m2.n, m2.med, m2.mad
""")
def q168(spark, sf_dir):
    """Robust per-group outlier accounting (median + MAD, exact
    interpolated percentiles; threshold compares against ROUNDED
    med/mad on both sides so a last-ULP interpolation difference can
    never flip the count — the q79 lesson)."""
    from ultraviolet_spark.operators.stats import mad_outliers

    return mad_outliers(_t(spark, sf_dir, "events"),
                        value_col="value", by="event_type", k=3.0)


@q("q169_target_encode_loo", """
WITH qv AS (
  SELECT event_id, event_type,
         CAST(floor(value * 1000000 + 0.5) AS BIGINT) AS q
  FROM events),
c AS (SELECT event_type, SUM(q) AS s, COUNT(*) AS n
      FROM qv GROUP BY event_type),
g AS (SELECT SUM(q) AS sg, COUNT(*) AS nn FROM qv)
SELECT qv.event_id, qv.event_type,
       CAST((c.s - qv.q) * g.nn + 10 * g.sg AS DOUBLE)
         / CAST(g.nn * (c.n - 1 + 10) * 1000000 AS DOUBLE) AS te
FROM qv JOIN c USING (event_type), g
""")
def q169(spark, sf_dir):
    """Leakage-safe leave-one-out target encoding with additive
    smoothing: micro-unit int64 sums and a multiplied-through rational
    prior make both engines divide the SAME two exact integers —
    round(6) is cosmetic, not load-bearing."""
    from ultraviolet_spark.operators.encoding import target_encode_loo

    return target_encode_loo(_t(spark, sf_dir, "events"),
                             cat_col="event_type", label_col="value",
                             id_col="event_id", m=10)


@q("q170_resample_grid_locf", """
WITH obs AS (
  SELECT user_id, ts, MAX(value) AS v FROM events GROUP BY user_id, ts),
spans AS (
  SELECT user_id, date_trunc('hour', MIN(ts)) AS t0, MAX(ts) AS t1
  FROM events GROUP BY user_id),
grid AS (
  SELECT user_id, unnest(generate_series(t0, t1, INTERVAL 6 HOUR))
    AS grid_ts
  FROM spans)
SELECT g.user_id, g.grid_ts, o.v AS last_value,
       CAST(epoch_us(g.grid_ts) - epoch_us(o.ts) AS BIGINT) AS gap_us
FROM grid g
ASOF LEFT JOIN obs o
  ON g.user_id = o.user_id AND g.grid_ts >= o.ts
""")
def q170(spark, sf_dir):
    """Regular-grid resampling with LOCF backfill: per-user 6-hour
    timestamp grid as-of-joined to the event log (backward only — zero
    temporal leakage), staleness in exact integer microseconds.  The
    oracle is DuckDB's native ASOF JOIN against a generate_series grid
    — an independent implementation of the same semantics."""
    from ultraviolet_spark.operators.history import resample_grid

    return resample_grid(_t(spark, sf_dir, "events"), by="user_id",
                         ts_col="ts", value_col="value", every_hours=6)


@q("q171_html_table_extract", """
SELECT o_orderkey AS doc_id, CAST(0 AS INTEGER) AS table_idx,
       CAST(0 AS INTEGER) AS row_idx, CAST(0 AS INTEGER) AS col_idx,
       'key' AS cell FROM orders
UNION ALL
SELECT o_orderkey, 0, 0, 1, 'status & "priority"' FROM orders
UNION ALL
SELECT o_orderkey, 0, 1, 0, CAST(o_orderkey AS VARCHAR) FROM orders
UNION ALL
SELECT o_orderkey, 0, 1, 1,
       o_orderstatus || ' <' || o_orderpriority || '>' FROM orders
UNION ALL
SELECT o_orderkey, 1, 0, 0,
       CAST(o_custkey AS VARCHAR) || ' &amp; done' FROM orders
""")
def q171(spark, sf_dir):
    """Web-table mining: synthesize two flat HTML tables per order
    (attribute-rich tags, a stray <tr>/<td> OUTSIDE any table that must
    NOT match, bold markup inside cells, entities incl. a double-escape
    that must decode exactly one level), extract every cell with the
    pure-Catalyst table→tr→cell explode chain, decode entities.  The
    oracle lists the expected cells analytically from the source
    columns and never parses markup."""
    from ultraviolet_spark.operators.htmltables import html_tables

    o = _t(spark, sf_dir, "orders")
    html = F.concat(
        F.lit('<html><body><p>stray <tr><td>ignore</td></tr></p>'
              '<table class="a"><tr class="h"><th>key</th>'
              '<th>status &amp; &quot;priority&quot;</th></tr>'
              "<tr><td id='k'>"),
        F.col("o_orderkey").cast("string"),
        F.lit("</td><td><b>"), F.col("o_orderstatus"),
        F.lit("</b> &lt;"), F.col("o_orderpriority"),
        F.lit("&gt;</td></tr></table><table><tr><td>"),
        F.col("o_custkey").cast("string"),
        F.lit(" &amp;amp; done</td></tr></table></body></html>"))
    pages = o.select(F.col("o_orderkey").alias("doc_id"),
                     html.alias("html"))
    return html_tables(pages)


@q("q172_triangle_counts", """
WITH e0 AS (
  SELECT DISTINCT doc_id % 101 AS src, (doc_id * 7 + 3) % 101 AS dst
  FROM documents
  UNION
  SELECT doc_id % 101, (doc_id * 13 + 5) % 101 FROM documents),
und AS (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
  FROM e0 WHERE src <> dst),
deg AS (
  SELECT node, COUNT(*) AS d FROM (
    SELECT a AS node FROM und UNION ALL SELECT b FROM und)
  GROUP BY node),
j AS (SELECT a, b, da.d AS da, db.d AS db
      FROM und JOIN deg da ON da.node = a JOIN deg db ON db.node = b),
ori AS (
  SELECT CASE WHEN (da < db) OR (da = db AND a < b) THEN a ELSE b END AS u,
         CASE WHEN (da < db) OR (da = db AND a < b) THEN b ELSE a END AS v,
         CASE WHEN (da < db) OR (da = db AND a < b) THEN db ELSE da END AS dv
  FROM j),
wg AS (
  SELECT e1.u, e1.v, e2.v AS vw FROM ori e1 JOIN ori e2 ON e1.u = e2.u
  WHERE (e1.dv < e2.dv) OR (e1.dv = e2.dv AND e1.v < e2.v)),
tri AS (SELECT wg.u, wg.v, wg.vw FROM wg
        JOIN ori c ON c.u = wg.v AND c.v = wg.vw),
pn AS (
  SELECT node, COUNT(*) AS n FROM (
    SELECT u AS node FROM tri UNION ALL SELECT v FROM tri
    UNION ALL SELECT vw FROM tri)
  GROUP BY node)
SELECT deg.node, CAST(COALESCE(pn.n, 0) AS BIGINT) AS n_triangles
FROM deg LEFT JOIN pn ON pn.node = deg.node
""")
def q172(spark, sf_dir):
    """Exact per-node triangle counting over the synthetic domain link
    graph (same edge synthesis as q133) via degree-ordered orientation
    — each triangle counted exactly once with plain equi-joins, wedge
    count bounded m^1.5 regardless of hub skew (Suri–Vassilvitskii)."""
    from ultraviolet_spark.operators.graph import triangle_counts

    d = _t(spark, sf_dir, "documents")
    e = (d.select((F.col("doc_id") % 101).alias("src"),
                  ((F.col("doc_id") * 7 + 3) % 101).alias("dst"))
         .unionAll(d.select((F.col("doc_id") % 101).alias("src"),
                            ((F.col("doc_id") * 13 + 5) % 101)
                            .alias("dst")))
         .distinct())
    return triangle_counts(e)


@q("q173_sitemap_parse", """
SELECT o_custkey AS doc_id,
       CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderkey)
            - 1 AS INTEGER) AS entry_idx,
       'https://ex.com/o/' || o_orderkey AS loc,
       CASE WHEN o_orderstatus = 'P' THEN NULL
            ELSE strftime(o_orderdate, '%Y-%m-%d') END AS lastmod,
       CAST(NULL AS VARCHAR) AS changefreq,
       CASE WHEN o_orderstatus = 'F' THEN '0.9' ELSE '0.5' END AS priority
FROM orders
""")
def q173(spark, sf_dir):
    """Sitemap XML parsing: synthesize one sitemaps.org <urlset> per
    customer (entries sorted by order key; 'P' orders omit <lastmod>
    to exercise the optional-tag NULL path, whitespace padding around
    values exercises trimming), parse every <url> block back out.  The
    oracle lists the expected entries analytically from orders and
    never sees XML."""
    from ultraviolet_spark.operators.sitemap import parse_sitemap

    o = _t(spark, sf_dir, "orders")
    entry = F.concat(
        F.lit("<url>\n  <loc> https://ex.com/o/"),
        F.col("o_orderkey").cast("string"),
        F.lit(" </loc>"),
        F.when(F.col("o_orderstatus") == "P", F.lit(""))
         .otherwise(F.concat(F.lit("<lastmod>"),
                             F.date_format("o_orderdate", "yyyy-MM-dd"),
                             F.lit("</lastmod>"))),
        F.lit("<priority>"),
        F.when(F.col("o_orderstatus") == "F", F.lit("0.9"))
         .otherwise(F.lit("0.5")),
        F.lit("</priority></url>"))
    xml = (o.select("o_custkey", F.struct("o_orderkey", entry.alias("e"))
                    .alias("s"))
           .groupBy("o_custkey")
           .agg(F.concat(
               F.lit('<?xml version="1.0"?><urlset>'),
               F.concat_ws("\n", F.transform(
                   F.sort_array(F.collect_list("s")), lambda s: s["e"])),
               F.lit("</urlset>")).alias("xml")))
    return parse_sitemap(xml, xml_col="xml", id_col="o_custkey")


@q("q174_postings_varint_stats", """
WITH tk AS (
  SELECT doc_id,
         unnest(string_split_regex(lower(trim(text)), '\\s+')) AS token
  FROM documents WHERE length(trim(text)) > 0),
p AS (SELECT DISTINCT token, doc_id FROM tk),
d AS (SELECT token, doc_id,
             doc_id - lag(doc_id) OVER (PARTITION BY token
                                        ORDER BY doc_id) AS gap
      FROM p),
g AS (SELECT token, COALESCE(gap, doc_id + 1) AS gap FROM d),
b AS (SELECT token,
             CASE WHEN gap < 128 THEN 1 WHEN gap < 16384 THEN 2
                  WHEN gap < 2097152 THEN 3 WHEN gap < 268435456 THEN 4
                  WHEN gap < 34359738368 THEN 5
                  WHEN gap < 4398046511104 THEN 6
                  WHEN gap < 562949953421312 THEN 7
                  WHEN gap < 72057594037927936 THEN 8
                  ELSE 9 END AS nb
      FROM g)
SELECT token, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(8 * COUNT(*) AS BIGINT) AS raw_bytes,
       CAST(SUM(nb) AS BIGINT) AS varint_bytes
FROM b GROUP BY token
""")
def q174(spark, sf_dir):
    """Delta+LEB128 posting-list storage accounting (codec sizing
    pre-pass): per-token doc-id gaps, varint byte cost per gap, all
    integer — exact cross-engine."""
    from ultraviolet_spark.operators.index import (
        build_postings, postings_compression_stats)

    return postings_compression_stats(
        build_postings(_t(spark, sf_dir, "documents")))


@q("q175_psi_drift", """
WITH ref AS (SELECT value FROM events WHERE ts < TIMESTAMP '2024-01-16'),
cur AS (SELECT value FROM events WHERE ts >= TIMESTAMP '2024-01-16'),
bd AS (SELECT list_transform(
         quantile_cont(value, [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]),
         x -> round(x, 6)) AS b
       FROM ref),
rb AS (SELECT 1 + CAST(list_sum(list_transform(
         bd.b, t -> CASE WHEN ref.value > t THEN 1 ELSE 0 END)) AS INT)
         AS bin_idx
       FROM ref, bd),
cb AS (SELECT 1 + CAST(list_sum(list_transform(
         bd.b, t -> CASE WHEN cur.value > t THEN 1 ELSE 0 END)) AS INT)
         AS bin_idx
       FROM cur, bd),
r AS (SELECT bin_idx, COUNT(*) AS ref_n FROM rb GROUP BY bin_idx),
c AS (SELECT bin_idx, COUNT(*) AS cur_n FROM cb GROUP BY bin_idx),
t AS (SELECT (SELECT SUM(ref_n) FROM r) AS rt,
             (SELECT SUM(cur_n) FROM c) AS ct),
fin AS (
  SELECT r.bin_idx, CAST(r.ref_n AS BIGINT) AS ref_n,
         CAST(COALESCE(c.cur_n, 0) AS BIGINT) AS cur_n,
         (CAST(r.ref_n + 1 AS DOUBLE) / (t.rt + 10)
          - CAST(COALESCE(c.cur_n, 0) + 1 AS DOUBLE) / (t.ct + 10))
         * ln((CAST(r.ref_n + 1 AS DOUBLE) / (t.rt + 10))
              / (CAST(COALESCE(c.cur_n, 0) + 1 AS DOUBLE) / (t.ct + 10)))
           AS psi_raw
  FROM r LEFT JOIN c USING (bin_idx), t)
SELECT bin_idx, ref_n, cur_n, round(psi_raw, 12) AS psi_term FROM fin
""")
def q175(spark, sf_dir):
    """Population Stability Index drift monitor between the first and
    second half of the event log: reference-decile bins (exact
    interpolated quantiles, boundaries rounded per the q168 policy),
    +1-smoothed per-bin terms emitted raw — same exact integers, same
    IEEE ops, bit-identical cross-engine."""
    from ultraviolet_spark.operators.stats import psi_drift

    e = _t(spark, sf_dir, "events")
    split = F.lit("2024-01-16").cast("timestamp_ntz")
    return psi_drift(e.filter(F.col("ts") < split),
                     e.filter(F.col("ts") >= split),
                     value_col="value", bins=10)


def _kappa_sql() -> str:
    """q176 oracle: Cohen's kappa between gold lang and the q22
    stopword-argmax prediction, all-integer sufficient statistics."""
    score = {l: f"len(list_intersect(string_split_regex(lower(trim(text)), "
                f"'\\s+'), {X.STOPWORDS[l]!r}))"
             for l in X.LANGS}
    best = "greatest(" + ", ".join(score.values()) + ")"
    case = " ".join(f"WHEN {score[l]} = __best THEN '{l}'" for l in X.LANGS)
    return f"""
WITH scored AS (
  SELECT lang AS a,
         CASE WHEN __best > 0 THEN (CASE {case} ELSE 'und' END)
              ELSE 'und' END AS b
  FROM (SELECT lang, text, {best} AS __best FROM documents)),
cells AS (SELECT a, b, COUNT(*) AS c FROM scored GROUP BY a, b),
ra AS (SELECT a, SUM(c) AS ra FROM cells GROUP BY a),
cbt AS (SELECT b, SUM(c) AS cb FROM cells GROUP BY b),
pe AS (SELECT COALESCE(SUM(ra.ra * cbt.cb), 0) AS pe
       FROM ra JOIN cbt ON cbt.b = ra.a),
agg AS (SELECT SUM(c) AS n,
               COALESCE(SUM(CASE WHEN a = b THEN c END), 0) AS na
        FROM cells)
SELECT CAST(n AS BIGINT) AS n, CAST(na AS BIGINT) AS n_agree,
       CAST(n * na - pe AS BIGINT) AS kappa_num,
       CAST(n * n - pe AS BIGINT) AS kappa_den,
       CASE WHEN n * n - pe <> 0
            THEN CAST(n * na - pe AS DOUBLE) / CAST(n * n - pe AS DOUBLE)
       END AS kappa
FROM agg, pe
"""


@q("q176_cohens_kappa", _kappa_sql())
def q176(spark, sf_dir):
    """Chance-corrected agreement (Cohen's kappa) between the gold lang
    column and the stopword-argmax prediction — exact integer
    sufficient statistics, one IEEE division (q169 discipline)."""
    from ultraviolet_spark.operators.evalmetrics import cohens_kappa

    d = (_t(spark, sf_dir, "documents")
         .withColumn("pred_lang", X.predict_lang(F.col("text"))))
    return cohens_kappa(d, col_a="lang", col_b="pred_lang")


@q("q177_roc_auc", """
WITH s AS (
  SELECT CAST(floor(CAST(embedding[1] AS DOUBLE) * 1000000 + 0.5)
              AS BIGINT) AS sc,
         CASE WHEN label = 1 THEN 1 ELSE 0 END AS p
  FROM embeddings),
g AS (SELECT sc, COUNT(*) AS n, SUM(p) AS np FROM s GROUP BY sc),
wq AS (SELECT np * (2 * COALESCE(SUM(n) OVER (ORDER BY sc
         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + n + 1)
         AS t, n, np
       FROM g),
a AS (SELECT SUM(t) AS r2, SUM(np) AS n_pos, SUM(n) - SUM(np) AS n_neg
      FROM wq)
SELECT CAST(n_pos AS BIGINT) AS n_pos, CAST(n_neg AS BIGINT) AS n_neg,
       CAST(r2 - n_pos * (n_pos + 1) AS BIGINT) AS auc_num,
       CAST(2 * n_pos * n_neg AS BIGINT) AS auc_den,
       CASE WHEN n_pos * n_neg > 0
            THEN CAST(r2 - n_pos * (n_pos + 1) AS DOUBLE)
                 / CAST(2 * n_pos * n_neg AS DOUBLE)
       END AS auc
FROM a
""")
def q177(spark, sf_dir):
    """Exact midrank Mann–Whitney ROC-AUC of the quantized first
    embedding component against label==1 — tie groups aggregate first
    (partial-agg shuffle), one cumulative window over the distinct-
    score table, doubled rank sums keep everything integral."""
    from ultraviolet_spark.operators.evalmetrics import roc_auc

    e = _t(spark, sf_dir, "embeddings").select(
        F.floor(F.col("embedding").getItem(0).cast("double") * 1000000
                + F.lit(0.5)).cast("long").alias("score"),
        (F.col("label") == 1).cast("int").alias("is_pos"))
    return roc_auc(e, score_col="score", label_col="is_pos")


@q("q178_jaro_winkler", """
WITH v AS (
  SELECT DISTINCT unnest(string_split_regex(lower(trim(text)), '\\s+'))
    AS word
  FROM documents WHERE length(trim(text)) > 0)
SELECT a.word AS word_a, b.word AS word_b,
       round(jaro_winkler_similarity(a.word, b.word), 6) AS jw
FROM v a JOIN v b ON a.word < b.word
WHERE a.word <> '' AND b.word <> ''
""")
def q178(spark, sf_dir):
    """Jaro–Winkler record-linkage scoring over vocabulary pairs — our
    pure-Python reference implementation (Arrow-batched over the pair
    set; at web scale this runs on BLOCKED candidates, never all-pairs)
    validated against DuckDB's independent C++ jaro_winkler_similarity,
    incl. the 0.7 boost-threshold variant choice."""
    from ultraviolet_spark.operators.fuzzy import jaro_winkler_pairs

    d = _t(spark, sf_dir, "documents")
    vocab = (d.filter(F.length(F.trim("text")) > 0)
             .select(F.explode(F.split(F.lower(F.trim(F.col("text"))),
                                       r"\s+")).alias("word"))
             .filter(F.col("word") != "").distinct())
    a = vocab.select(F.col("word").alias("word_a"))
    b = vocab.select(F.col("word").alias("word_b"))
    pairs = (a.join(b, F.col("word_a") < F.col("word_b")))
    return jaro_winkler_pairs(pairs, col_a="word_a", col_b="word_b")


@q("q179_benford_audit", """
WITH pos AS (SELECT o_totalprice AS x FROM orders WHERE o_totalprice > 0),
d AS (SELECT CAST(floor(x / power(10, floor(log10(x)))) AS INT) AS digit
      FROM pos),
obs AS (SELECT digit, COUNT(*) AS n_obs FROM d GROUP BY digit),
digits AS (SELECT unnest(generate_series(1, 9)) AS digit),
tot AS (SELECT SUM(n_obs) AS n FROM obs),
j AS (SELECT digits.digit,
             CAST(COALESCE(obs.n_obs, 0) AS BIGINT) AS n_obs,
             tot.n * log10(1.0 + 1.0 / digits.digit) AS exp
      FROM digits LEFT JOIN obs USING (digit), tot)
SELECT CAST(digit AS INTEGER) AS digit, n_obs, round(exp, 6) AS expected,
       round((n_obs - exp) * (n_obs - exp) / exp, 6) AS chi2_term
FROM j
""")
def q179(spark, sf_dir):
    """Benford first-significant-digit audit of order prices (the
    fabricated-numbers screen): per-digit observed vs n*log10(1+1/d)
    expectation + chi-square contribution, rounded per the q175
    transcendental policy."""
    from ultraviolet_spark.operators.stats import benford_digits

    return benford_digits(_t(spark, sf_dir, "orders"),
                          value_col="o_totalprice")


@q("q180_link_reciprocity", """
WITH e AS (
  SELECT DISTINCT doc_id % 101 AS src, (doc_id * 7 + 3) % 101 AS dst
  FROM documents
  UNION
  SELECT doc_id % 101, (doc_id * 13 + 5) % 101 FROM documents),
e2 AS (SELECT src, dst FROM e WHERE src <> dst),
r AS (SELECT a.src, COUNT(*) AS n_out,
             SUM(CASE WHEN b.src IS NOT NULL THEN 1 ELSE 0 END)
               AS n_reciprocal
      FROM e2 a LEFT JOIN e2 b ON b.src = a.dst AND b.dst = a.src
      GROUP BY a.src)
SELECT src AS node, CAST(n_out AS BIGINT) AS n_out,
       CAST(n_reciprocal AS BIGINT) AS n_reciprocal,
       CAST(n_reciprocal AS DOUBLE) / n_out AS reciprocity
FROM r
""")
def q180(spark, sf_dir):
    """Per-node link reciprocity (link-farm / spam-ring signal: mutual
    edges over out-degree — organic webs are heavily asymmetric, link
    farms are not).  One self-equi-join on the reversed edge key; the
    ratio is one IEEE division of exact counts (q169 discipline)."""
    d = _t(spark, sf_dir, "documents")
    e = (d.select((F.col("doc_id") % 101).alias("src"),
                  ((F.col("doc_id") * 7 + 3) % 101).alias("dst"))
         .unionAll(d.select((F.col("doc_id") % 101).alias("src"),
                            ((F.col("doc_id") * 13 + 5) % 101)
                            .alias("dst")))
         .distinct()
         .filter(F.col("src") != F.col("dst")))
    rev = e.select(F.col("src").alias("__rs"), F.col("dst").alias("__rd"))
    j = e.join(rev, (F.col("__rs") == F.col("dst"))
               & (F.col("__rd") == F.col("src")), "left")
    agg = (j.groupBy("src")
           .agg(F.count("*").cast("long").alias("n_out"),
                F.sum(F.col("__rs").isNotNull().cast("int"))
                .cast("long").alias("n_reciprocal")))
    return agg.select(
        F.col("src").alias("node"), "n_out", "n_reciprocal",
        (F.col("n_reciprocal").cast("double")
         / F.col("n_out").cast("double")).alias("reciprocity"))


@q("q181_orc_roundtrip", """
SELECT event_id, ts, user_id, event_type, value, props FROM events
""")
def q181(spark, sf_dir):
    """ORC source/sink conformance: write the events table as ORC, read
    back with explicit schema — µs TIMESTAMP_NTZ, doubles, strings all
    byte-exact.  Oracle recomputes from parquet, never reads ORC."""
    import tempfile

    from ultraviolet_spark.sources.textio import orc_roundtrip

    return orc_roundtrip(
        _t(spark, sf_dir, "events").select(
            "event_id", "ts", "user_id", "event_type", "value", "props"),
        tempfile.mkdtemp(prefix="uv_q181_"))


@q("q182_parquet_zstd_roundtrip", """
SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate,
       o_orderpriority
FROM orders
""")
def q182(spark, sf_dir):
    """Parquet zstd-codec conformance: rewrite orders under explicit
    zstd compression and read back — lossless for every logical type.
    Oracle reads the original parquet."""
    import tempfile

    from ultraviolet_spark.sources.textio import parquet_roundtrip

    return parquet_roundtrip(_t(spark, sf_dir, "orders"),
                             tempfile.mkdtemp(prefix="uv_q182_"),
                             codec="zstd")


@q("q183_window_breadth", """
SELECT o_orderkey, o_custkey,
       round(percent_rank() OVER w, 6) AS pct_rank,
       round(cume_dist() OVER w, 6) AS cume,
       nth_value(o_orderkey, 2) OVER (PARTITION BY o_custkey
         ORDER BY o_totalprice, o_orderkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
         AS second_cheapest,
       CAST(ntile(4) OVER w AS INTEGER) AS quartile
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
""")
def q183(spark, sf_dir):
    """Window-function breadth conformance: percent_rank, cume_dist,
    nth_value over an unbounded frame, and ntile — definitions agree
    exactly across engines (deterministic order via the price+key
    tiebreak)."""
    from pyspark.sql import Window

    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_totalprice",
                                                "o_orderkey")
    wf = w.rowsBetween(Window.unboundedPreceding,
                       Window.unboundedFollowing)
    return o.select(
        "o_orderkey", "o_custkey",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.nth_value("o_orderkey", 2).over(wf).alias("second_cheapest"),
        F.ntile(4).over(w).cast("int").alias("quartile"))


@q("q184_stream_stream_join", """
SELECT c.user_id, c.ts AS click_ts, p.ts AS purchase_ts,
       p.value AS purchase_value
FROM (SELECT * FROM events WHERE event_type = 'click') c
JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
  ON p.user_id = c.user_id
 AND p.ts >= c.ts
 AND p.ts <= c.ts + INTERVAL 1 HOUR
""")
def q184(spark, sf_dir):
    """Watermarked stream–stream interval join (attribution shape:
    purchases within 1h after a click, same user) through an actual
    two-source readStream → inner join → memory sink; watermarks bound
    the state store on both sides.  Must equal the plain batch theta
    join the oracle runs."""
    import os
    import tempfile
    import uuid

    from ultraviolet_spark.streaming.sessions import (
        stream_stream_interval_join)

    ev = _t(spark, sf_dir, "events")
    tmp = tempfile.mkdtemp(prefix="uv_q184_")
    cdir, pdir = os.path.join(tmp, "c"), os.path.join(tmp, "p")
    # withWatermark demands TIMESTAMP (not NTZ); the session is pinned
    # UTC so the cast is an identity relabel
    (ev.filter(F.col("event_type") == "click")
     .select("user_id", F.col("ts").cast("timestamp").alias("click_ts"))
     .coalesce(1).write.parquet(cdir))
    (ev.filter(F.col("event_type") == "purchase")
     .select(F.col("user_id").alias("p_user_id"),
             F.col("ts").cast("timestamp").alias("purchase_ts"),
             F.col("value").alias("purchase_value"))
     .coalesce(1).write.parquet(pdir))
    cs = (spark.readStream.schema(spark.read.parquet(cdir).schema)
          .format("parquet").load(cdir))
    ps = (spark.readStream.schema(spark.read.parquet(pdir).schema)
          .format("parquet").load(pdir))
    out = stream_stream_interval_join(
        cs, ps, by="user_id", right_by="p_user_id",
        left_ts="click_ts", right_ts="purchase_ts",
        max_delay="1 hour", watermark="2 hours")
    name = f"uv_q184_{uuid.uuid4().hex[:8]}"
    q_ = (out.select("user_id", "click_ts", "purchase_ts",
                     "purchase_value")
          .writeStream.format("memory").queryName(name)
          .outputMode("append")
          .option("checkpointLocation", os.path.join(tmp, "ckpt"))
          .trigger(availableNow=True).start())
    q_.awaitTermination(300)
    return spark.sql(f"SELECT * FROM {name}")


@q("q185_soundex_blocking", """
WITH w AS (
  SELECT DISTINCT unnest(string_split_regex(lower(trim(text)), '\\s+'))
    AS word
  FROM documents WHERE length(trim(text)) > 0),
s AS (SELECT word, upper(regexp_replace(word, '[^A-Za-z]', '', 'g')) AS u
      FROM w WHERE word <> '' AND regexp_matches(word, '^[A-Za-z]+$')),
c0 AS (SELECT word, u,
              translate(u, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ',
                        '01230129022455012623019202') AS c
       FROM s),
c1 AS (SELECT word, u,
  regexp_replace(regexp_replace(regexp_replace(regexp_replace(
  regexp_replace(regexp_replace(regexp_replace(regexp_replace(
    c, '0(9*0)+','0','g'), '1(9*1)+','1','g'), '2(9*2)+','2','g'),
       '3(9*3)+','3','g'), '4(9*4)+','4','g'), '5(9*5)+','5','g'),
       '6(9*6)+','6','g'), '9(9*9)+','9','g') AS c
  FROM c0)
SELECT word,
       substr(u, 1, 1) ||
       substr(replace(replace(substr(c, 2), '9', ''), '0', '') || '000',
              1, 3) AS sdx
FROM c1
""")
def q185(spark, sf_dir):
    """Phonetic blocking keys: Spark's built-in soundex vs a from-
    scratch SQL implementation of the same US-Census variant (H/W
    transparency, vowel separators, first-code suppression) built
    WITHOUT backreferences (DuckDB is RE2) via per-digit collapse
    chains — two independent implementations must agree on every
    vocabulary word."""
    d = _t(spark, sf_dir, "documents")
    vocab = (d.filter(F.length(F.trim("text")) > 0)
             .select(F.explode(F.split(F.lower(F.trim(F.col("text"))),
                                       r"\s+")).alias("word"))
             .filter(F.col("word").rlike("^[A-Za-z]+$"))
             .distinct())
    return vocab.select("word", F.soundex("word").alias("sdx"))


@q("q186_chunked_transfer_decode", """
WITH d AS (
  SELECT doc_id, CAST(1 + doc_id % 4 AS INT) AS k,
         doc_id % 13 = 0 AS trunc
  FROM documents),
e AS (
  SELECT doc_id, k, trunc,
    'd' || (doc_id % 10) || ':'
      || repeat('ab', CAST(1 + (doc_id + 1) % 3 AS INT))
      || CASE WHEN doc_id % 7 = 0
              THEN chr(13) || chr(10) || 'in' ELSE '' END || ';'
    || CASE WHEN k >= 2 THEN
         'd' || (doc_id % 10) || ':'
           || repeat('ab', CAST(1 + (doc_id + 2) % 3 AS INT))
           || CASE WHEN doc_id % 7 = 0
                   THEN chr(13) || chr(10) || 'in' ELSE '' END || ';'
       ELSE '' END
    || CASE WHEN k >= 3 THEN
         'd' || (doc_id % 10) || ':'
           || repeat('ab', CAST(1 + (doc_id + 3) % 3 AS INT))
           || CASE WHEN doc_id % 7 = 0
                   THEN chr(13) || chr(10) || 'in' ELSE '' END || ';'
       ELSE '' END
    || CASE WHEN k >= 4 THEN
         'd' || (doc_id % 10) || ':'
           || repeat('ab', CAST(1 + (doc_id + 4) % 3 AS INT))
           || CASE WHEN doc_id % 7 = 0
                   THEN chr(13) || chr(10) || 'in' ELSE '' END || ';'
       ELSE '' END AS body
  FROM d)
SELECT doc_id,
       CASE WHEN trunc THEN NULL ELSE body END AS body_text,
       CASE WHEN trunc THEN NULL ELSE k END AS n_chunks,
       NOT trunc AS chunked_ok
FROM e
""")
def q186(spark, sf_dir):
    """HTTP/1.1 chunked transfer-coding decode (RFC 9112 §7.1) as a
    pure-Catalyst bounded ``aggregate()`` fold — size-hex lines parsed
    with ``locate``+``conv``, NEVER a CRLF split (chunk data containing
    CRLF is in the synthesis on purpose).  Payloads are synthesized
    from doc_id with varying chunk counts, a chunk extension on every
    3rd doc, a trailer section on every 5th, and a missing last-chunk
    on every 13th (→ NULL body + chunked_ok=false, not a failure); the
    oracle recomputes the expected decoded body analytically and never
    sees a chunked byte."""
    from ultraviolet_spark.operators.http import dechunk

    d = _t(spark, sf_dir, "documents").select("doc_id")
    k = (F.lit(1) + F.col("doc_id") % 4).cast("int")

    def dat(j):
        return F.concat(
            F.lit("d"), (F.col("doc_id") % 10).cast("string"), F.lit(":"),
            F.repeat(F.lit("ab"), (F.lit(1) + (F.col("doc_id") + j) % 3)
                     .cast("int")),
            F.when(F.col("doc_id") % 7 == 0, F.lit("\r\nin"))
            .otherwise(F.lit("")), F.lit(";"))

    def chunk(j):
        ext = (F.when((F.lit(j) == 1) & (F.col("doc_id") % 3 == 0),
                      F.lit(";x=y")).otherwise(F.lit("")))
        body = dat(j)
        piece = F.concat(F.lower(F.hex(F.length(body))), ext,
                         F.lit("\r\n"), body, F.lit("\r\n"))
        return F.when(F.lit(j) <= k, piece).otherwise(F.lit(""))

    term = (F.when(F.col("doc_id") % 13 == 0, F.lit(""))
            .when(F.col("doc_id") % 5 == 0, F.lit("0\r\nX-T: 1\r\n\r\n"))
            .otherwise(F.lit("0\r\n\r\n")))
    payload = F.concat(chunk(1), chunk(2), chunk(3), chunk(4), term)
    out = dechunk(d.withColumn("body", F.encode(payload, "ISO-8859-1")))
    return out.select("doc_id", "body_text", "n_chunks", "chunked_ok")


@q("q187_http_date_freshness", """
WITH d AS (
  SELECT doc_id,
         CAST(doc_id % 4 AS INT) AS fmt,
         1971 + CAST(doc_id % 55 AS INT) AS y,
         1 + CAST(doc_id % 12 AS INT) AS m,
         1 + CAST(doc_id % 28 AS INT) AS dd,
         CAST(doc_id % 24 AS INT) AS hh,
         CAST(doc_id % 60 AS INT) AS mi,
         CAST((doc_id * 7) % 60 AS INT) AS ss,
         1 + CAST(doc_id % 90 AS INT) AS lm_days
  FROM documents)
SELECT doc_id, fmt,
       CASE WHEN fmt <> 3
            THEN make_timestamp(y, m, dd, hh, mi, ss) END AS parsed,
       CASE WHEN fmt <> 3
            THEN CAST(lm_days * 8640 AS BIGINT) END AS freshness_secs
FROM d
""")
def q187(spark, sf_dir):
    """HTTP-date parsing (RFC 9110 §5.6.7: IMF-fixdate, obsolete
    RFC 850 with the two-digit-year pivot, obsolete asctime with
    space-padded day) + RFC 9111 heuristic freshness (10% of the
    Last-Modified age, exact integer µs arithmetic).  Header strings
    are synthesized from doc_id components — the day-of-week token is
    deliberately wrong sometimes ('Mon,' for every row), which a
    correct parser must ignore, not verify; every 4th row is junk →
    NULL.  The oracle recomputes the expected timestamp analytically
    with make_timestamp and never parses a date string."""
    from ultraviolet_spark.operators.http import (heuristic_freshness,
                                                  parse_http_date)

    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        (F.col("doc_id") % 4).cast("int").alias("fmt"),
        (F.lit(1971) + (F.col("doc_id") % 55).cast("int")).alias("y"),
        (F.lit(1) + (F.col("doc_id") % 12).cast("int")).alias("m"),
        (F.lit(1) + (F.col("doc_id") % 28).cast("int")).alias("dd"),
        (F.col("doc_id") % 24).cast("int").alias("hh"),
        (F.col("doc_id") % 60).cast("int").alias("mi"),
        ((F.col("doc_id") * 7) % 60).cast("int").alias("ss"),
        (F.lit(1) + (F.col("doc_id") % 90).cast("int")).alias("lm_days"))
    mon = F.element_at(F.array(*[F.lit(x) for x in
        ["Jan", "Feb", "Mar", "Apr", "May", "Jun",
         "Jul", "Aug", "Sep", "Oct", "Nov", "Dec"]]), F.col("m"))
    tod = F.concat(F.lpad(F.col("hh").cast("string"), 2, "0"), F.lit(":"),
                   F.lpad(F.col("mi").cast("string"), 2, "0"), F.lit(":"),
                   F.lpad(F.col("ss").cast("string"), 2, "0"))
    d2 = F.lpad(F.col("dd").cast("string"), 2, "0")
    hdr = (F.when(F.col("fmt") == 0, F.concat(
                F.lit("Mon, "), d2, F.lit(" "), mon, F.lit(" "),
                F.col("y").cast("string"), F.lit(" "), tod, F.lit(" GMT")))
           .when(F.col("fmt") == 1, F.concat(
                F.lit("Monday, "), d2, F.lit("-"), mon, F.lit("-"),
                F.lpad((F.col("y") % 100).cast("string"), 2, "0"),
                F.lit(" "), tod, F.lit(" GMT")))
           .when(F.col("fmt") == 2, F.concat(
                F.lit("Mon "), mon, F.lit(" "),
                F.when(F.col("dd") < 10,
                       F.concat(F.lit(" "), F.col("dd").cast("string")))
                .otherwise(F.col("dd").cast("string")),
                F.lit(" "), tod, F.lit(" "), F.col("y").cast("string")))
           .otherwise(F.lit("last tuesday")))
    parsed = d.withColumn("parsed", parse_http_date(hdr))
    withlm = parsed.withColumn(
        "last_modified",
        F.expr("timestampadd(DAY, -lm_days, parsed)"))
    out = heuristic_freshness(withlm, date_col="parsed",
                              lm_col="last_modified")
    return out.select("doc_id", "fmt", "parsed", "freshness_secs")


@q("q188_rel_canonical_groups", """
WITH d AS (
  SELECT doc_id,
         'https://s' || (doc_id % 40) || '.example.com/p' || doc_id AS url,
         doc_id - doc_id % 3 AS base,
         doc_id % 11 = 0 AS nocanon,
         doc_id % 7 = 0 AS rootrel
  FROM documents),
t AS (
  SELECT doc_id, url,
         CASE WHEN nocanon THEN url
              WHEN rootrel THEN 'https://s' || (doc_id % 40)
                   || '.example.com/p' || base
              ELSE 'https://s' || (base % 40) || '.example.com/p' || base
         END AS canonical_target,
         NOT nocanon AS has_canonical
  FROM d),
g AS (
  SELECT canonical_target, CAST(COUNT(*) AS BIGINT) AS group_size,
         min(url) AS mu,
         max(CASE WHEN url = canonical_target THEN url END) AS slf
  FROM t GROUP BY canonical_target)
SELECT t.doc_id, t.url, t.canonical_target, t.has_canonical,
       g.group_size,
       CASE WHEN g.slf IS NOT NULL THEN t.url = g.slf
            ELSE t.url = g.mu END AS is_keeper
FROM t JOIN g USING (canonical_target)
""")
def q188(spark, sf_dir):
    """rel=canonical extraction + canonical-group dedup: the
    publisher's own duplicate signal, honored BEFORE any content
    hashing.  Synthesis varies attribute order (rel-first vs
    href-first), attribute-value case, root-relative vs absolute
    targets, a stylesheet <link> decoy in every page (must not match —
    [^>]* cannot cross a tag boundary), and pages with no canonical
    (self-group).  Keeper election: the target page itself when
    crawled, else lexicographic-min member.  The oracle recomputes
    targets and groups analytically and never reads markup."""
    from ultraviolet_spark.operators.urls import canonical_groups

    d = _t(spark, sf_dir, "documents").select("doc_id")
    did = F.col("doc_id")
    url = F.concat(F.lit("https://s"), (did % 40).cast("string"),
                   F.lit(".example.com/p"), did.cast("string"))
    base = (did - did % 3).cast("string")
    abs_href = F.concat(F.lit("https://s"),
                        ((did - did % 3) % 40).cast("string"),
                        F.lit(".example.com/p"), base)
    rel_href = F.concat(F.lit("/p"), base)
    relv = F.when(did % 5 == 0, F.lit("Canonical")) \
            .otherwise(F.lit("canonical"))
    tag = (F.when(did % 11 == 0, F.lit(""))
           .when(did % 7 == 0, F.concat(
               F.lit('<link rel="'), relv, F.lit('" href="'), rel_href,
               F.lit('">')))
           .when(did % 2 == 0, F.concat(
               F.lit('<link rel="'), relv, F.lit('" href="'), abs_href,
               F.lit('">')))
           .otherwise(F.concat(
               F.lit('<link href="'), abs_href, F.lit('" rel="'), relv,
               F.lit('">'))))
    html = F.concat(F.lit('<html><head><link rel="stylesheet" '
                          'href="/css.css">'), tag,
                    F.lit("</head><body>x</body></html>"))
    pages = d.select("doc_id", url.alias("url"), html.alias("html"))
    out = canonical_groups(pages)
    return out.select("doc_id", "url", "canonical_target",
                      "has_canonical", "group_size", "is_keeper")


@q("q189_hreflang_clusters", """
WITH d AS (
  SELECT doc_id, CAST(1 + doc_id % 4 AS INT) AS n,
         'https://ex.com/c' || (doc_id % 100) || '/' AS stem
  FROM documents),
e AS (
  SELECT doc_id, n, stem, s.j,
         CASE s.j WHEN 0 THEN 'en' WHEN 1 THEN 'de'
                  WHEN 2 THEN 'fr' ELSE 'es' END AS hreflang
  FROM d JOIN (SELECT unnest([0, 1, 2, 3]) AS j) s ON s.j < d.n)
SELECT doc_id, hreflang, stem || hreflang AS href,
       CASE WHEN n >= 2 THEN stem || 'de' ELSE stem || 'en' END
         AS cluster_key
FROM e
""")
def q189(spark, sf_dir):
    """hreflang alternate-cluster extraction: the publisher-declared
    parallel-page graph (highest-precision bitext signal — the site
    SAYS these pages translate each other).  One row per declared
    alternate; cluster_key is the array_min of the page's alternate
    hrefs computed BEFORE the explode, in the scan stage, no window.
    The oracle regenerates the declarations from doc_id analytically."""
    from ultraviolet_spark.operators.urls import extract_hreflang

    d = _t(spark, sf_dir, "documents").select("doc_id")
    did = F.col("doc_id")
    n = (F.lit(1) + did % 4).cast("int")
    stem = F.concat(F.lit("https://ex.com/c"), (did % 100).cast("string"),
                    F.lit("/"))
    langs = ["en", "de", "fr", "es"]

    def link(j):
        href = F.concat(stem, F.lit(langs[j]))
        piece = F.concat(F.lit('<link rel="alternate" hreflang="'),
                         F.lit(langs[j]), F.lit('" href="'), href,
                         F.lit('">'))
        return F.when(F.lit(j) < n, piece).otherwise(F.lit(""))

    html = F.concat(F.lit("<html><head>"), link(0), link(1), link(2),
                    link(3), F.lit("</head><body>x</body></html>"))
    pages = d.select("doc_id", html.alias("html"))
    return extract_hreflang(pages).select(
        "doc_id", "hreflang", "href", "cluster_key")


_Q190_PAIRS = [
    ("xn--mnchen-3ya", "münchen"), ("xn--bcher-kva", "bücher"),
    ("xn--caf-dma", "café"), ("xn--80akhbyknj4f", "испытание"),
    ("xn--fiqs8s", "中国"), ("xn--wgbh1c", "مصر"),
    ("xn--eckwd4c7cu47r2wf", "ドメイン名例"), ("xn--plda-bpa", "példa"),
    ("xn--kln-sna", "köln"), ("xn--grnland-r1a", "grønland"),
]

_Q190_ACE_CASE = "\n".join(
    f"           WHEN {i} THEN 'www.{a}.example'"
    for i, (a, _) in enumerate(_Q190_PAIRS))
_Q190_UNI_CASE = "\n".join(
    f"           WHEN {i} THEN 'www.{u}.example'"
    for i, (_, u) in enumerate(_Q190_PAIRS))


@q("q190_idn_punycode_decode", f"""
WITH d AS (
  SELECT doc_id, CAST(doc_id % 13 AS INT) AS m FROM documents),
h AS (
  SELECT doc_id, m,
         CASE m
{_Q190_ACE_CASE}
           WHEN 10 THEN 'plain.example.com'
           WHEN 11 THEN 'xn--a-zzzzzz.example'
           ELSE 'MiXeD.Case.COM'
         END AS host0
  FROM d)
SELECT doc_id,
       CASE WHEN m < 10 AND doc_id % 2 = 0 THEN upper(host0)
            ELSE host0 END AS host,
       m <= 11 AND m <> 10 AS is_idn,
       CASE WHEN m < 10 THEN (CASE m
{_Q190_UNI_CASE}
            END)
            WHEN m = 10 THEN 'plain.example.com'
            WHEN m = 11 THEN NULL
            ELSE 'mixed.case.com' END AS unicode_host
FROM h
""")
def q190(spark, sf_dir):
    """RFC 3492 Punycode / IDN decode of xn-- ACE hostnames — a
    from-scratch insertion-unsort decoder (pinned against CPython's
    independent punycode codec by a hypothesis round-trip property in
    the tests), Arrow-batched, with a Catalyst prefilter so pure-ASCII
    hosts never cross into Python.  Synthesis cycles 10 real ACE/
    Unicode label pairs (upper-cased ACE on even doc_ids — matching is
    case-insensitive), a plain-ASCII host, an invalid ACE label (→
    NULL, not a half-decoded lie), and a mixed-case ASCII host; the
    oracle maps doc_id → expected Unicode literal and never decodes
    anything."""
    from ultraviolet_spark.operators.idn import with_unicode_host

    d = _t(spark, sf_dir, "documents").select("doc_id")
    m = (F.col("doc_id") % 13).cast("int")
    ace = F.array(*[F.lit(f"www.{a}.example") for a, _ in _Q190_PAIRS])
    host0 = (F.when(m < 10, F.element_at(ace, m + 1))
             .when(m == 10, F.lit("plain.example.com"))
             .when(m == 11, F.lit("xn--a-zzzzzz.example"))
             .otherwise(F.lit("MiXeD.Case.COM")))
    host = F.when((m < 10) & (F.col("doc_id") % 2 == 0),
                  F.upper(host0)).otherwise(host0)
    out = with_unicode_host(d.withColumn("host", host))
    return out.select("doc_id", "host", "is_idn", "unicode_host")
