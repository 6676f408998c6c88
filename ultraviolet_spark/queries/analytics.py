"""Registry chunk: funnels, rankings, privacy, drift, connectors (q191-q240).

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

@q("q191_interval_overlap_join", """
WITH l AS (
  SELECT o_orderkey AS visit_id, o_custkey % 200 AS seg,
         TIMESTAMP '2024-01-01 00:00:00'
           + to_hours(CAST(o_orderkey % 3000 AS BIGINT)) AS vs,
         TIMESTAMP '2024-01-01 00:00:00'
           + to_hours(CAST(o_orderkey % 3000
                           + 1 + o_orderkey % 48 AS BIGINT)) AS ve
  FROM orders),
r AS (
  SELECT c_custkey AS campaign_id, c_custkey % 200 AS seg,
         TIMESTAMP '2024-01-01 00:00:00'
           + to_hours(CAST((c_custkey % 500) * 6 AS BIGINT)) AS cs,
         TIMESTAMP '2024-01-01 00:00:00'
           + to_hours(CAST((c_custkey % 500) * 6
                           + (1 + c_custkey % 7) * 6 AS BIGINT)) AS ce
  FROM customer)
SELECT l.seg, l.visit_id, r.campaign_id,
       greatest(l.vs, r.cs) AS overlap_start,
       least(l.ve, r.ce) AS overlap_end,
       CAST((epoch_us(least(l.ve, r.ce))
             - epoch_us(greatest(l.vs, r.cs))) // 1000000
            AS BIGINT) AS overlap_secs
FROM l JOIN r ON l.seg = r.seg AND l.vs <= r.ce AND r.cs <= l.ve
""")
def q191(spark, sf_dir):
    """Interval-overlap join (visits × campaign windows) via temporal
    bucketing: each interval explodes into the 6h buckets it touches,
    the sides equi-join on (segment, bucket), and a canonical-bucket
    predicate — keep the pair only in the bucket of greatest(start) —
    surfaces every overlapping pair exactly once with no post-join
    dedup.  Shuffle is interval-length/bucket-width linear, never
    pairs²; the oracle is the O(n·m) theta join the operator avoids."""
    from ultraviolet_spark.operators.intervals import overlap_join

    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    base = "timestamp'2024-01-01 00:00:00'"
    left = o.select(
        F.col("o_orderkey").alias("visit_id"),
        (F.col("o_custkey") % 200).alias("seg"),
        F.expr(f"timestampadd(HOUR, o_orderkey % 3000, {base})")
        .alias("vs"),
        F.expr(f"timestampadd(HOUR, o_orderkey % 3000 "
               f"+ 1 + o_orderkey % 48, {base})").alias("ve"))
    right = c.select(
        F.col("c_custkey").alias("campaign_id"),
        (F.col("c_custkey") % 200).alias("seg"),
        F.expr(f"timestampadd(HOUR, (c_custkey % 500) * 6, {base})")
        .alias("cs"),
        F.expr(f"timestampadd(HOUR, (c_custkey % 500) * 6 "
               f"+ (1 + c_custkey % 7) * 6, {base})").alias("ce"))
    out = overlap_join(left, right, key_cols=["seg"],
                       left_start="vs", left_end="ve",
                       right_start="cs", right_end="ce",
                       bucket_secs=6 * 3600)
    return out.select("seg", "visit_id", "campaign_id",
                      "overlap_start", "overlap_end", "overlap_secs")


@q("q192_funnel_conversions", """
WITH v AS (SELECT user_id, event_id, ts FROM events WHERE event_type = 'view'),
ck AS (SELECT user_id, event_id, ts FROM events WHERE event_type = 'click'),
p  AS (SELECT user_id, event_id, ts FROM events WHERE event_type = 'purchase'),
vc AS (
  SELECT v.user_id, v.event_id, v.ts,
    (SELECT min(row(ck.ts, ck.event_id)) FROM ck
      WHERE ck.user_id = v.user_id
        AND (ck.ts, ck.event_id) > (v.ts, v.event_id)) AS c1
  FROM v),
vcp AS (
  SELECT vc.*,
    (SELECT min(row(p.ts, p.event_id)) FROM p
      WHERE p.user_id = vc.user_id
        AND (p.ts, p.event_id) > ((vc.c1)[1], (vc.c1)[2])) AS c2
  FROM vc)
SELECT user_id, event_id AS anchor_id, ts AS anchor_ts,
  (c1)[1] AS step1_ts, (c2)[1] AS step2_ts,
  coalesce(epoch_us((c2)[1]) - epoch_us(ts)
             <= CAST(86400 AS BIGINT) * 1000000, false) AS converted,
  CASE WHEN coalesce(epoch_us((c2)[1]) - epoch_us(ts)
                       <= CAST(86400 AS BIGINT) * 1000000, false)
       THEN (epoch_us((c2)[1]) - epoch_us(ts)) // 1000000 END
    AS secs_to_convert
FROM vcp
""")
def q192(spark, sf_dir):
    """Ordered 3-step conversion funnel (view → click → purchase
    within 24h, first-touch greedy chain) via backward struct-min
    window chaining on ONE user exchange; the oracle replays the
    greedy choice with tuple-min correlated subqueries — a wholly
    different formulation of the same canonical chain."""
    from ultraviolet_spark.operators.funnel import funnel_conversions

    ev = _t(spark, sf_dir, "events")
    out = funnel_conversions(ev, steps=["view", "click", "purchase"],
                             horizon_secs=86400)
    return out.select("user_id", "anchor_id", "anchor_ts",
                      "step1_ts", "step2_ts", "converted",
                      "secs_to_convert")


@q("q193_cohort_retention", """
WITH f AS (SELECT user_id, min(ts) AS fts FROM events GROUP BY user_id),
e AS (
  SELECT ev.user_id,
    CAST(date_trunc('week', f.fts) AS DATE) AS cohort_week,
    (CAST(date_trunc('week', ev.ts) AS DATE)
       - CAST(date_trunc('week', f.fts) AS DATE)) // 7 AS week_offset
  FROM events ev JOIN f USING (user_id)),
a AS (SELECT cohort_week, week_offset,
        count(DISTINCT user_id) AS active_users
      FROM e GROUP BY 1, 2),
s AS (SELECT cohort_week, count(DISTINCT user_id) AS cohort_size
      FROM e WHERE week_offset = 0 GROUP BY 1)
SELECT CAST(a.cohort_week AS VARCHAR) AS cohort_week,
  a.week_offset, a.active_users, s.cohort_size,
  CAST(a.active_users AS DOUBLE) / CAST(s.cohort_size AS DOUBLE)
    AS retention
FROM a JOIN s USING (cohort_week)
""")
def q193(spark, sf_dir):
    """Cohort-retention matrix (cohort = Monday-truncated week of each
    user's first event): week_offset is exact integer epoch-day
    arithmetic (both ends week-truncated ⇒ the day gap is a multiple
    of 7, the /7 is exact), retention one IEEE division of two exact
    distinct counts — no intermediate rounding to diverge engines."""
    from ultraviolet_spark.operators.funnel import cohort_retention

    ev = _t(spark, sf_dir, "events")
    # date → 'yyyy-MM-dd' string: pandas-side date dtypes differ
    # between the two engines (object vs datetime64) even when the
    # values agree, so the compare sees a canonical string
    return cohort_retention(ev).select(
        F.col("cohort_week").cast("string").alias("cohort_week"),
        "week_offset", "active_users", "cohort_size", "retention")


@q("q194_session_path_trigrams", """
WITH gp AS (
  SELECT user_id, event_id, ts, event_type,
    epoch_us(ts) - epoch_us(lag(ts) OVER
      (PARTITION BY user_id ORDER BY ts, event_id)) AS gap_us
  FROM events),
s AS (
  SELECT user_id, event_id, ts, event_type,
    SUM(CASE WHEN gap_us IS NULL
               OR CAST(gap_us AS DOUBLE) / 1e6 > 43200.0
             THEN 1 ELSE 0 END)
      OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      AS session_id
  FROM gp),
g AS (
  SELECT event_type
      || '>' || lead(event_type, 1) OVER w
      || '>' || lead(event_type, 2) OVER w AS path,
    lead(event_type, 2) OVER w AS e3
  FROM s
  WINDOW w AS (PARTITION BY user_id, session_id ORDER BY ts, event_id))
SELECT path, count(*) AS n_occurrences
FROM g WHERE e3 IS NOT NULL
GROUP BY path
ORDER BY n_occurrences DESC, path ASC
LIMIT 20
""")
def q194(spark, sf_dir):
    """Top-20 within-session event-type trigram paths (12h session
    gap — ~3 events/session on this log; a 1h gap leaves ~1.1 and the
    report near-vacuous): n−1 lead() columns over one (user, session)
    window — no per-session array, no explode — then an 8-byte-key
    count agg and a TakeOrdered top-k; the oracle re-derives session
    ids from the gap rule and windows independently."""
    from ultraviolet_spark.operators.funnel import session_path_ngrams
    from ultraviolet_spark.operators.windows import sessionize

    ev = sessionize(_t(spark, sf_dir, "events"), by="user_id",
                    order="ts", gap_secs=43200.0, tiebreak="event_id")
    return session_path_ngrams(ev, n=3, top_k=20).select(
        "path", "n_occurrences")


@q("q195_calibration_report", """
WITH s AS (
  SELECT ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 6))::BIGINT
           % 1000000 AS p,
         CAST((('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 7, 6))::BIGINT
                 % 1000000)
              < (200000 + (('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 6))::BIGINT
                             % 1000000) * 6 // 10) AS BIGINT) AS y
  FROM documents),
b AS (
  SELECT least(p // 100000, 9) AS bin, count(*) AS n,
         CAST(SUM(y) AS BIGINT) AS n_pos,
         CAST(SUM(p) AS BIGINT) AS sum_p_micro,
         CAST(SUM((p - 1000000 * y) * (p - 1000000 * y)) AS BIGINT) AS sq
  FROM s GROUP BY 1),
t AS (
  SELECT CAST(SUM(n) AS BIGINT) AS n_total,
         CAST(SUM(abs(sum_p_micro - 1000000 * n_pos)) AS BIGINT) AS ece_num,
         CAST(SUM(sq) AS BIGINT) AS brier_num
  FROM b)
SELECT bin, n, n_pos, sum_p_micro,
  CAST(sum_p_micro AS DOUBLE) / CAST(n * 1000000 AS DOUBLE) AS mean_p,
  CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE) AS frac_pos,
  brier_num, ece_num,
  CAST(brier_num AS DOUBLE)
    / CAST(n_total * CAST(1000000000000 AS BIGINT) AS DOUBLE) AS brier,
  CAST(ece_num AS DOUBLE) / CAST(n_total * 1000000 AS DOUBLE) AS ece
FROM b, t
""")
def q195(spark, sf_dir):
    """Classifier calibration audit (reliability diagram + Brier +
    ECE) over an md5-synthesized (probability, label) pair per doc —
    label odds rise with p so the curve is non-trivial.  All sums are
    exact int64: the per-bin |mean_p − frac_pos| gap times n_b equals
    |Σp_micro − 1e6·n_pos| exactly, so the ECE numerator never sums
    doubles across bins (engine-order-dependent in the last ULP)."""
    from ultraviolet_spark.operators.evalmetrics import calibration_report

    d = _t(spark, sf_dir, "documents")
    h = F.md5(F.col("doc_id").cast("string"))
    p = F.conv(F.substring(h, 1, 6), 16, 10).cast("long") % 1_000_000
    y2 = F.conv(F.substring(h, 7, 6), 16, 10).cast("long") % 1_000_000
    base = d.select(
        p.alias("p_micro"),
        (y2 < (F.lit(200_000) + (p * 6 - (p * 6) % 10) / 10))
        .cast("long").alias("label"))
    return calibration_report(base, p_micro_col="p_micro",
                              label_col="label", bins=10).select(
        "bin", "n", "n_pos", "sum_p_micro", "mean_p", "frac_pos",
        "brier_num", "ece_num", "brier", "ece")


@q("q196_weighted_median", """
WITH per_v AS (
  SELECT l_returnflag AS rf, l_extendedprice AS v,
         CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS w
  FROM lineitem GROUP BY 1, 2),
c AS (
  SELECT rf, v,
    CAST(SUM(w) OVER (PARTITION BY rf ORDER BY v
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         AS BIGINT) AS cum,
    CAST(SUM(w) OVER (PARTITION BY rf) AS BIGINT) AS wt
  FROM per_v)
SELECT rf AS l_returnflag, CAST(max(wt) AS BIGINT) AS w_total,
       min(v) AS weighted_median
FROM c WHERE 2 * cum >= wt
GROUP BY rf
""")
def q196(spark, sf_dir):
    """Exact quantity-weighted LOWER median of extended price per
    return flag: integer 2·cum ≥ W crossing rule over the per-group
    distinct-value table (values merge before the window, full rows
    never globally sort), no interpolation or float weight sums to
    diverge engines."""
    from ultraviolet_spark.operators.stats import weighted_median

    li = _t(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice",
        F.col("l_quantity").cast("long").alias("qty"))
    return weighted_median(li, value_col="l_extendedprice",
                           weight_col="qty", by="l_returnflag").select(
        "l_returnflag", "w_total", "weighted_median")


@q("q197_domain_boilerplate_strip", """
WITH s AS (
  SELECT source, count(*) AS n_docs,
    CAST(SUM(CASE WHEN doc_id % 4 <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS ad_n,
    CAST(SUM(CASE WHEN doc_id % 5 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS promo_n
  FROM documents GROUP BY source),
f AS (
  SELECT d.doc_id, d.source,
    (s.n_docs >= 3) AS hdr_rm,
    (s.n_docs >= 3 AND s.ad_n * 1000000 >= 600000 * s.n_docs) AS ad_rm,
    (s.n_docs >= 3 AND s.promo_n * 1000000 >= 600000 * s.n_docs) AS promo_rm,
    (d.doc_id % 4 <> 0) AS has_ad, (d.doc_id % 5 = 0) AS has_promo
  FROM documents d JOIN s USING (source))
SELECT doc_id, source,
  2 + CAST(has_ad AS BIGINT) + CAST(has_promo AS BIGINT) AS n_lines,
  CAST(NOT hdr_rm AS BIGINT) + 1
    + CAST(has_ad AND NOT ad_rm AS BIGINT)
    + CAST(has_promo AND NOT promo_rm AS BIGINT) AS n_kept,
  concat_ws(chr(10),
    CASE WHEN NOT hdr_rm THEN 'HDR ' || source END,
    'BODY ' || CAST(doc_id AS VARCHAR),
    CASE WHEN has_ad AND NOT ad_rm THEN 'AD ' || source END,
    CASE WHEN has_promo AND NOT promo_rm THEN 'PROMO ' || source END)
    AS text_clean
FROM f
""")
def q197(spark, sf_dir):
    """Per-domain frequent-line boilerplate removal (the CCNet
    per-shard rule the corpus-wide line_dedup can't express: site
    chrome repeats within its site, diluted corpus-wide): synthesized
    pages carry a universal header (frac 1.0 → stripped), an 'AD'
    footer on 3/4 of a domain's docs (≥0.6 → stripped), and a rare
    'PROMO' line on 1/5 (kept); the oracle recomputes the per-domain
    vote analytically and never splits a text."""
    from ultraviolet_spark.operators.corpus import domain_boilerplate_strip

    d = _t(spark, sf_dir, "documents")
    did = F.col("doc_id").cast("string")
    text = F.concat_ws(
        "\n",
        F.concat(F.lit("HDR "), F.col("source")),
        F.concat(F.lit("BODY "), did),
        F.when(F.col("doc_id") % 4 != 0,
               F.concat(F.lit("AD "), F.col("source"))),
        F.when(F.col("doc_id") % 5 == 0,
               F.concat(F.lit("PROMO "), F.col("source"))))
    pages = d.select("doc_id", "source", text.alias("text"))
    return domain_boilerplate_strip(
        pages, domain_col="source", text_col="text", id_col="doc_id",
        min_frac=0.6, min_docs=3).select(
        "doc_id", "source", "n_lines", "n_kept", "text_clean")


@q("q198_sparse_cosine_pairs", """
WITH toks AS (
  SELECT doc_id,
         unnest(string_split_regex(lower(trim(text)), '\\s+')) AS t
  FROM documents),
tf AS (
  SELECT doc_id, t, count(*) AS tf FROM toks WHERE t <> '' GROUP BY 1, 2),
norms AS (
  SELECT doc_id, CAST(SUM(tf * tf) AS BIGINT) AS n2 FROM tf GROUP BY 1),
keep AS (
  SELECT t FROM tf GROUP BY t HAVING count(*) <= 400),
p AS (SELECT tf.* FROM tf JOIN keep USING (t)),
dots AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         CAST(SUM(a.tf * b.tf) AS BIGINT) AS dot
  FROM p a JOIN p b ON a.t = b.t AND a.doc_id < b.doc_id
  GROUP BY 1, 2)
SELECT d.id_a, d.id_b, d.dot,
  na.n2 AS norm_sq_a, nb.n2 AS norm_sq_b,
  CAST(d.dot AS DOUBLE)
    / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE)))
    AS cosine
FROM dots d
JOIN norms na ON na.doc_id = d.id_a
JOIN norms nb ON nb.doc_id = d.id_b
WHERE CAST(d.dot AS DOUBLE)
    / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE))) >= 0.8
""")
def q198(spark, sf_dir):
    """Exact tf-weighted sparse cosine pairs through the inverted
    index (AllPairs family; the sparse complement of the dense
    embedding near-dup): pairs meet only on shared tokens, df>400
    stop-tokens (80% of this 500-doc corpus) drop out of pairing
    (lower-bound cosine — the cap can only remove stop-word-inflated
    pairs, never invent one), dot/norms exact int64 and one
    deterministic IEEE op sequence for the ratio."""
    from ultraviolet_spark.operators.similarity import sparse_cosine_pairs

    return sparse_cosine_pairs(
        _t(spark, sf_dir, "documents"), threshold=0.8,
        max_df=400).select(
        "id_a", "id_b", "dot", "norm_sq_a", "norm_sq_b", "cosine")


@q("q199_discover_tracking_params", """
WITH base AS (
  SELECT doc_id, source, md5(CAST(doc_id AS VARCHAR)) AS sid
  FROM documents),
stats AS (
  SELECT 'sid' AS param, count(*) AS occurrences,
         count(DISTINCT sid) AS value_ndv,
         count(DISTINCT source) AS n_domains
  FROM base
  UNION ALL
  SELECT 'page', count(*), count(DISTINCT doc_id % 5),
         count(DISTINCT source)
  FROM base
  UNION ALL
  SELECT 'ref', count(*), count(DISTINCT source), count(DISTINCT source)
  FROM base WHERE doc_id % 3 = 0)
SELECT param, occurrences, value_ndv, n_domains,
  (value_ndv * 1000000 >= 800000 * occurrences AND n_domains >= 3)
    AS flagged
FROM stats
""")
def q199(spark, sf_dir):
    """Data-driven tracking-param discovery over synthesized URLs
    (per-doc unique 'sid' → flagged; 5-value 'page' and site-echo
    'ref' → kept): values unique per occurrence AND spanning ≥3
    domains, integer-exact at the flag boundary; the oracle
    recomputes every count from the synthesis formula and never
    parses a URL."""
    from ultraviolet_spark.operators.urls import discover_tracking_params

    d = _t(spark, sf_dir, "documents")
    did = F.col("doc_id").cast("string")
    url = F.concat(
        F.lit("https://"), F.col("source"), F.lit(".example.com/p/"),
        did, F.lit("?sid="), F.md5(did),
        F.lit("&page="), (F.col("doc_id") % 5).cast("string"),
        F.when(F.col("doc_id") % 3 == 0,
               F.concat(F.lit("&ref="), F.col("source")))
        .otherwise(F.lit("")))
    pages = d.select(url.alias("url"))
    return discover_tracking_params(pages).select(
        "param", "occurrences", "value_ndv", "n_domains", "flagged")


@q("q200_k_anonymity_audit", """
WITH cls AS (
  SELECT user_id % 50 AS age_bucket, event_type,
         count(*) AS class_size,
         count(DISTINCT json_extract_string(props, '$.k'))
           AS l_diversity
  FROM events GROUP BY 1, 2)
SELECT age_bucket, event_type,
  CAST(class_size AS BIGINT) AS class_size,
  CAST(l_diversity AS BIGINT) AS l_diversity,
  class_size < 5 AS at_risk_k,
  l_diversity < 2 AS at_risk_l
FROM cls
""")
def q200(spark, sf_dir):
    """k-anonymity / l-diversity audit of the event log under the
    quasi-identifier pair (bucketed user id, event type) with the
    JSON props key as the sensitive attribute: per-equivalence-class
    sizes, exact distinct-sensitive counts, and both at-risk flags
    (the homogeneity attack k alone misses)."""
    from ultraviolet_spark.operators.privacy import k_anonymity

    ev = _t(spark, sf_dir, "events").select(
        (F.col("user_id") % 50).alias("age_bucket"),
        "event_type",
        F.get_json_object("props", "$.k").alias("sens"))
    return k_anonymity(ev, quasi_cols=["age_bucket", "event_type"],
                       sensitive_col="sens").select(
        "age_bucket", "event_type", "class_size", "l_diversity",
        "at_risk_k", "at_risk_l")


@q("q201_rrf_fusion", """
WITH a AS (
  SELECT doc_id, row_number() OVER (ORDER BY n_chars DESC, doc_id ASC)
    AS r FROM documents),
b AS (
  SELECT doc_id, row_number() OVER (
    ORDER BY ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
      DESC, doc_id ASC) AS r
  FROM documents),
u AS (SELECT doc_id, r FROM a UNION ALL SELECT doc_id, r FROM b),
f AS (
  SELECT doc_id, count(*) AS n_lists,
         CAST(SUM(1000000000 // (60 + r)) AS BIGINT) AS rrf_nano
  FROM u GROUP BY doc_id)
SELECT doc_id, n_lists, rrf_nano,
       CAST(rrf_nano AS DOUBLE) / 1e9 AS rrf
FROM f ORDER BY rrf_nano DESC, doc_id ASC LIMIT 20
""")
def q201(spark, sf_dir):
    """Reciprocal-rank fusion of a length ranking with an md5-derived
    pseudo-relevance ranking (the calibration-free way to merge BM25
    with an embedding ranker): every 1/(60+rank) contribution is the
    exact integer 1e9 div (60+rank) so the cross-list sum never adds
    doubles in engine-dependent order; ties rank by doc_id."""
    from ultraviolet_spark.operators.index import rrf_fuse

    d = _t(spark, sf_dir, "documents")
    rank_a = d.select("doc_id", F.col("n_chars").alias("score"))
    rank_b = d.select(
        "doc_id",
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8),
               16, 10).cast("long").alias("score"))
    return rrf_fuse([rank_a, rank_b], top_k=20).select(
        "doc_id", "n_lists", "rrf_nano", "rrf")


@q("q202_schema_evolution_scan", """
SELECT source,
  count(*) AS n_rows,
  CAST(SUM(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT)
    AS n_evolved,
  CAST(SUM(n_chars) AS BIGINT) AS chars_total,
  CAST(SUM(CASE WHEN doc_id % 2 = 1 THEN doc_id % 10 END) AS BIGINT)
    AS quality_total,
  CAST(MIN(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 2 END) AS BIGINT)
    AS min_gen
FROM documents GROUP BY 1
""")
def q202(spark, sf_dir):
    """Schema-evolution conformance: documents are re-written as two
    parquet GENERATIONS under one table root (gen=1 lacks the
    ``quality_bucket`` column that gen=2 adds), read back through the
    footer-merging evolved scan, and aggregated per source.  On the
    hook: the merged schema must contain the late column, pre-evolution
    rows must surface exact NULLs for it (n_evolved counts non-nulls),
    the ``gen`` partition column must be discovered from the directory
    layout (min_gen), and no row or value may be lost across the file
    boundary.  A plain single-footer read would nondeterministically
    drop ``quality_bucket`` entirely.  The oracle recomputes everything
    from documents and never sees the evolved directory."""
    import tempfile

    from ultraviolet_spark.plans.snapshots import read_evolved

    root = tempfile.mkdtemp(prefix="uv_q202_")
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars")
    g1 = docs.filter(F.col("doc_id") % 2 == 0)
    g2 = (docs.filter(F.col("doc_id") % 2 == 1)
          .withColumn("quality_bucket", (F.col("doc_id") % 10)))
    g1.write.mode("overwrite").parquet(f"{root}/gen=1")
    g2.write.mode("overwrite").parquet(f"{root}/gen=2")
    merged = read_evolved(spark, root, required=["quality_bucket", "gen"])
    return (merged.groupBy("source")
            .agg(F.count("*").alias("n_rows"),
                 F.count("quality_bucket").cast("long").alias("n_evolved"),
                 F.sum("n_chars").cast("long").alias("chars_total"),
                 F.sum("quality_bucket").cast("long").alias("quality_total"),
                 F.min("gen").cast("long").alias("min_gen")))


@q("q203_homograph_spoofs", """
WITH hosts AS (
  SELECT doc_id,
    CASE doc_id % 11
      WHEN 0 THEN 'pаypal.com'
      WHEN 1 THEN 'gооgle.com'
      WHEN 2 THEN 'app1e.com'
      WHEN 3 THEN 'paypal.com'
      WHEN 4 THEN 'amazοn.com'
      ELSE 'site' || CAST(doc_id AS VARCHAR) || '.example' END AS host
  FROM documents)
SELECT doc_id, host,
  CASE doc_id % 11
    WHEN 0 THEN 'paypal.com' WHEN 1 THEN 'google.com'
    WHEN 2 THEN 'apple.com' WHEN 3 THEN 'paypal.com'
    WHEN 4 THEN 'amazon.com'
    ELSE translate(host, '01', 'ol') END AS skeleton,
  CASE doc_id % 11
    WHEN 0 THEN 'paypal.com' WHEN 1 THEN 'google.com'
    WHEN 2 THEN 'apple.com' WHEN 3 THEN 'paypal.com'
    WHEN 4 THEN 'amazon.com' END AS matched_brand,
  (doc_id % 11) IN (0, 1, 2, 4) AS is_spoof
FROM hosts
""")
def q203(spark, sf_dir):
    """IDN-homograph spoof detection via confusable skeletons (UTS #39
    style): hosts are synthesized with Cyrillic-а paypal, double
    Cyrillic-о google, digit-1 apple and Greek-ο amazon lookalikes plus
    an EXACT brand hit (matched but not a spoof — the false-positive
    trap) and generic hosts; the skeleton collapses the curated
    confusable set in pure Catalyst (translate, whole-stage codegen)
    and brands join broadcast.  The oracle hardcodes every spoofed
    skeleton as a literal and flags analytically from doc_id — only
    the trivial generic-branch 0/1→o/l digit fold uses the engine."""
    from ultraviolet_spark.operators.idn import spoof_report

    host = (F.when(F.col("doc_id") % 11 == 0, F.lit("pаypal.com"))
            .when(F.col("doc_id") % 11 == 1, F.lit("gооgle.com"))
            .when(F.col("doc_id") % 11 == 2, F.lit("app1e.com"))
            .when(F.col("doc_id") % 11 == 3, F.lit("paypal.com"))
            .when(F.col("doc_id") % 11 == 4, F.lit("amazοn.com"))
            .otherwise(F.concat(F.lit("site"),
                                F.col("doc_id").cast("string"),
                                F.lit(".example"))))
    pages = _t(spark, sf_dir, "documents").select("doc_id", host.alias("host"))
    return spoof_report(
        pages, ["paypal.com", "google.com", "apple.com", "amazon.com"],
    ).select("doc_id", "host", "skeleton", "matched_brand", "is_spoof")


@q("q204_ndcg_at_10", """
WITH base AS (
  SELECT doc_id, doc_id % 50 AS query_id,
         ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
           AS score,
         CASE doc_id % 4 WHEN 0 THEN 0 WHEN 1 THEN 1 WHEN 2 THEN 3
           ELSE 7 END AS gain
  FROM documents),
r AS (
  SELECT query_id, gain,
    row_number() OVER (PARTITION BY query_id
                       ORDER BY score DESC, doc_id ASC) AS rs,
    row_number() OVER (PARTITION BY query_id
                       ORDER BY gain DESC, doc_id ASC) AS rg
  FROM base),
d AS (SELECT * FROM (VALUES (1, 1000000), (2, 630930), (3, 500000),
  (4, 430677), (5, 386853), (6, 356207), (7, 333333), (8, 315465),
  (9, 301030), (10, 289065)) AS t(rk, disc)),
agg AS (
  SELECT query_id,
    CAST(COALESCE(SUM(CASE WHEN rs <= 10 THEN gain * ds.disc END), 0)
      AS BIGINT) AS dcg_micro,
    CAST(COALESCE(SUM(CASE WHEN rg <= 10 THEN gain * dg.disc END), 0)
      AS BIGINT) AS idcg_micro
  FROM r
  LEFT JOIN d ds ON ds.rk = r.rs
  LEFT JOIN d dg ON dg.rk = r.rg
  GROUP BY query_id)
SELECT query_id, dcg_micro, idcg_micro,
  CASE WHEN idcg_micro > 0
       THEN CAST(dcg_micro AS DOUBLE) / CAST(idcg_micro AS DOUBLE) END
    AS ndcg
FROM agg
""")
def q204(spark, sf_dir):
    """Per-query nDCG@10 of an md5-scored ranking against graded
    relevance (gains 0/1/3/7 from doc_id): DCG discounts are
    precomputed integer micro-units so the cross-rank sum never adds
    platform-libm log2 doubles in engine-dependent order; ties break on
    doc_id in both the scored and the ideal ordering; all-zero-gain
    queries yield NULL (0/0 is "nothing to rank", not zero quality)."""
    from ultraviolet_spark.operators.evalmetrics import ndcg_at_k

    d = _t(spark, sf_dir, "documents")
    base = d.select(
        F.col("doc_id"),
        (F.col("doc_id") % 50).alias("query_id"),
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8),
               16, 10).cast("long").alias("score"),
        F.element_at(F.array(F.lit(0), F.lit(1), F.lit(3), F.lit(7)),
                     (F.col("doc_id") % 4 + 1).cast("int")).alias("gain"))
    return ndcg_at_k(base, query_col="query_id", score_col="score",
                     gain_col="gain", id_col="doc_id", k=10).select(
        "query_id", "dcg_micro", "idcg_micro", "ndcg")


@q("q205_chi2_feature_selection", """
WITH toks AS (
  SELECT DISTINCT doc_id, doc_id % 2 AS y,
         unnest(string_split_regex(lower(trim(text)), '\\s+')) AS token
  FROM documents),
per_tok AS (
  SELECT token,
         CAST(SUM(y) AS BIGINT) AS a,
         CAST(COUNT(*) - SUM(y) AS BIGINT) AS b
  FROM toks WHERE token <> '' GROUP BY token),
tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(doc_id % 2) AS BIGINT) AS p
  FROM documents),
cont AS (
  SELECT token, a, b, (p - a) AS c, (n - p - b) AS d, n
  FROM per_tok, tot WHERE a + b >= 2),
scored AS (
  SELECT token, a, b, c, d,
    CASE WHEN (a+b)*(c+d)*(a+c)*(b+d) > 0 THEN
      CAST(n AS DOUBLE)
        * (CAST(a*d - b*c AS DOUBLE) * CAST(a*d - b*c AS DOUBLE))
        / CAST((a+b)*(c+d)*(a+c)*(b+d) AS DOUBLE)
    END AS chi2
  FROM cont)
SELECT token, a, b, c, d, chi2 FROM scored
ORDER BY chi2 DESC NULLS LAST, token ASC LIMIT 50
""")
def q205(spark, sf_dir):
    """Chi-squared feature selection of tokens against the even/odd
    doc_id label: exact int64 2×2 contingency per token (doc-distinct
    presence, min_df prunes the hapax tail), χ² emitted as one fixed
    IEEE op sequence — the square is double·double, never pow(x,2),
    which is not correctly rounded and diverges libms in the last ulp;
    all-doc tokens NULL out on the zero margin instead of dividing by
    zero; top-50 ranks with a token-ascending tiebreak."""
    from ultraviolet_spark.operators.stats import chi2_feature_selection

    d = _t(spark, sf_dir, "documents").select(
        "text", (F.col("doc_id") % 2).alias("y"))
    return chi2_feature_selection(
        d, label_col="y", text_col="text", top_k=50, min_df=2).select(
        "token", "a", "b", "c", "d", "chi2")


@q("q206_acf_by_user", """
WITH base AS (
  SELECT user_id, ts, event_id,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS x
  FROM events),
l AS (
  SELECT user_id, x,
    lead(x, 1) OVER w AS x1, lead(x, 2) OVER w AS x2,
    lead(x, 3) OVER w AS x3
  FROM base WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
g AS (
  SELECT user_id,
    CAST(count(*) AS BIGINT) AS n,
    CAST(SUM(x) AS BIGINT) AS s,
    CAST(SUM(x * x) AS BIGINT) AS s2,
    CAST(COALESCE(SUM(x * x1), 0) AS BIGINT) AS p1,
    CAST(COALESCE(SUM(CASE WHEN x1 IS NOT NULL THEN x END), 0) AS BIGINT)
      AS sa1,
    CAST(COALESCE(SUM(x1), 0) AS BIGINT) AS sb1,
    CAST(COALESCE(SUM(x * x2), 0) AS BIGINT) AS p2,
    CAST(COALESCE(SUM(CASE WHEN x2 IS NOT NULL THEN x END), 0) AS BIGINT)
      AS sa2,
    CAST(COALESCE(SUM(x2), 0) AS BIGINT) AS sb2,
    CAST(COALESCE(SUM(x * x3), 0) AS BIGINT) AS p3,
    CAST(COALESCE(SUM(CASE WHEN x3 IS NOT NULL THEN x END), 0) AS BIGINT)
      AS sa3,
    CAST(COALESCE(SUM(x3), 0) AS BIGINT) AS sb3
  FROM l GROUP BY user_id),
e AS (
  SELECT user_id, n, CAST(1 AS BIGINT) AS lag,
    n*n*p1 - n*s*(sa1+sb1) + (n-1)*s*s AS acf_num,
    n*(n*s2 - s*s) AS acf_den FROM g
  UNION ALL
  SELECT user_id, n, 2, n*n*p2 - n*s*(sa2+sb2) + (n-2)*s*s,
    n*(n*s2 - s*s) FROM g
  UNION ALL
  SELECT user_id, n, 3, n*n*p3 - n*s*(sa3+sb3) + (n-3)*s*s,
    n*(n*s2 - s*s) FROM g)
SELECT user_id, n, lag, acf_num, acf_den,
  CASE WHEN acf_den > 0
       THEN CAST(acf_num AS DOUBLE) / CAST(acf_den AS DOUBLE) END AS acf
FROM e WHERE lag < n
""")
def q206(spark, sf_dir):
    """Per-user sample autocorrelation of the event value series at
    lags 1-3 (periodicity/burstiness probe): values go exact-cents
    first, every lag's products and boundary sums are int64 sufficient
    statistics from ONE ordered window pass, and the mean terms clear
    by multiplying the biased estimator through by n² — integer
    numerator/denominator, one final IEEE division, order-independent
    by construction; constant series NULL on the zero denominator,
    lags >= series length are not emitted."""
    from ultraviolet_spark.operators.stats import acf_by_key

    ev = _t(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id",
        F.floor(F.col("value") * 100 + 0.5).cast("long").alias("x"))
    return acf_by_key(ev, key_col="user_id", order_col="ts",
                      value_col="x", tiebreak_col="event_id",
                      max_lag=3).select(
        "user_id", "n", "lag", "acf_num", "acf_den", "acf")


@q("q207_textrank_keywords", """
WITH d AS (
  SELECT string_split_regex(lower(trim(text)), '\\s+') AS l FROM documents),
ix AS (SELECT l, unnest(range(1, len(l))) AS i FROM d WHERE len(l) >= 2),
p0 AS (SELECT l[i] AS a, l[i+1] AS b FROM ix
       WHERE l[i] <> '' AND l[i+1] <> ''),
e AS (SELECT DISTINCT a, b
      FROM (SELECT a, b FROM p0 UNION ALL SELECT b, a FROM p0)),
nodes AS (SELECT DISTINCT a AS node FROM e),
od AS (SELECT a, COUNT(*) AS d FROM e GROUP BY a),
r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS r FROM nodes),
c1 AS (SELECT e.b AS node, SUM((r0.r * 85) // (100 * od.d)) AS c
       FROM e JOIN r0 ON r0.node = e.a JOIN od ON od.a = e.a
       GROUP BY e.b),
r1 AS (SELECT n.node, CAST(150000 + COALESCE(c1.c, 0) AS BIGINT) AS r
       FROM nodes n LEFT JOIN c1 ON c1.node = n.node),
c2 AS (SELECT e.b AS node, SUM((r1.r * 85) // (100 * od.d)) AS c
       FROM e JOIN r1 ON r1.node = e.a JOIN od ON od.a = e.a
       GROUP BY e.b),
r2 AS (SELECT n.node, CAST(150000 + COALESCE(c2.c, 0) AS BIGINT) AS r
       FROM nodes n LEFT JOIN c2 ON c2.node = n.node)
SELECT node AS token, r AS rank_micro FROM r2
ORDER BY rank_micro DESC, token ASC LIMIT 20
""")
def q207(spark, sf_dir):
    """TextRank keyword extraction (Mihalcea & Tarau 2004): the word
    co-occurrence graph (adjacent-token pairs, symmetrized, distinct)
    ranked by the SAME exact-integer PageRank the domain graph uses —
    graph centrality beats raw frequency because a token earns rank
    from DIVERSE neighbors, not repetition; bit-identical to the
    oracle's unrolled 2-iteration SQL regardless of partitioning, and
    the top-20 set is deterministic even at boundary ties (token-asc
    tiebreak among the degree-1 tail)."""
    from ultraviolet_spark.operators.graph import pagerank

    toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    base = (_t(spark, sf_dir, "documents").select(toks.alias("l"))
            .filter(F.size("l") >= 2))
    pairs = base.select(F.explode(F.expr(
        "transform(sequence(0, size(l)-2),"
        " i -> struct(l[i] AS a, l[i+1] AS b))")).alias("p"))
    e = (pairs.select("p.a", "p.b")
         .filter((F.col("a") != "") & (F.col("b") != "")))
    edges = e.union(
        e.select(F.col("b").alias("a"), F.col("a").alias("b"))).distinct()
    ranks = pagerank(edges, iters=2, src="a", dst="b")
    return (ranks.select(F.col("node").alias("token"), "rank_micro")
            .orderBy(F.col("rank_micro").desc(), F.col("token").asc())
            .limit(20))


@q("q208_exact_proportional_split", """
WITH c AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n FROM documents
  GROUP BY source),
w AS (SELECT * FROM (VALUES ('train', 800000, 0), ('val', 100000, 1),
  ('test', 100000, 2)) AS t(name, w, ord)),
a AS (
  SELECT source, n, name, w, ord,
         (n * w) // 1000000 AS fc, (n * w) % 1000000 AS rem
  FROM c, w),
a2 AS (
  SELECT *, n - SUM(fc) OVER (PARTITION BY source) AS leftover,
    row_number() OVER (PARTITION BY source
                       ORDER BY rem DESC, ord ASC) AS rk
  FROM a),
t AS (
  SELECT source, name, ord,
         fc + CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS target
  FROM a2),
b AS (
  SELECT source, name,
    SUM(target) OVER (PARTITION BY source ORDER BY ord) AS hi,
    SUM(target) OVER (PARTITION BY source ORDER BY ord) - target AS lo
  FROM t),
r AS (
  SELECT doc_id, source,
    row_number() OVER (PARTITION BY source
                       ORDER BY md5(CAST(doc_id AS VARCHAR)),
                                doc_id ASC) AS rn
  FROM documents)
SELECT r.doc_id, r.source, b.name AS split
FROM r JOIN b ON b.source = r.source AND r.rn > b.lo AND r.rn <= b.hi
""")
def q208(spark, sf_dir):
    """Exact 80/10/10 train/val/test assignment per source stratum via
    largest-remainder allocation: every stratum's split sizes hit the
    Hare quota exactly (floor + remainder-ranked extras, ties to the
    first-listed split) instead of the ±sqrt(n) wobble of hash-bucket
    splits, and rows map to splits in deterministic md5 order — the
    full per-document assignment is the compared result, not just the
    counts."""
    from ultraviolet_spark.operators.corpus import largest_remainder_split

    d = _t(spark, sf_dir, "documents").select("doc_id", "source")
    return largest_remainder_split(
        d, {"train": 800_000, "val": 100_000, "test": 100_000},
        by="source", id_col="doc_id").select("doc_id", "source", "split")


@q("q209_temporal_leakage_audit", """
WITH clicks AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
purch AS (
  SELECT user_id, ts AS pts FROM events WHERE event_type = 'purchase'),
back AS (
  SELECT c.ts, p.pts
  FROM clicks c ASOF LEFT JOIN purch p
    ON c.user_id = p.user_id AND c.ts >= p.pts),
fwd AS (
  SELECT c.ts,
    (SELECT min(p.pts) FROM purch p
      WHERE p.user_id = c.user_id AND p.pts >= c.ts) AS pts
  FROM clicks c),
audit AS (
  SELECT 'asof_backward' AS method,
    CAST(count(*) AS BIGINT) AS n_rows,
    CAST(count(pts) AS BIGINT) AS n_joined,
    CAST(COALESCE(SUM(CASE WHEN pts > ts THEN 1 ELSE 0 END), 0) AS BIGINT)
      AS n_violations,
    CAST(MAX(CASE WHEN pts > ts THEN epoch_us(pts) - epoch_us(ts) END)
      AS BIGINT) AS max_lead_us
  FROM back
  UNION ALL
  SELECT 'asof_forward', CAST(count(*) AS BIGINT), CAST(count(pts) AS BIGINT),
    CAST(COALESCE(SUM(CASE WHEN pts > ts THEN 1 ELSE 0 END), 0) AS BIGINT),
    CAST(MAX(CASE WHEN pts > ts THEN epoch_us(pts) - epoch_us(ts) END)
      AS BIGINT)
  FROM fwd)
SELECT method, n_rows, n_joined, n_violations, max_lead_us FROM audit
""")
def q209(spark, sf_dir):
    """Temporal-leakage audit of the as-of join (the north-rule
    zero-leakage invariant made checkable): the backward point-in-time
    join must audit to exactly zero violations, while the
    deliberately-leaky forward join of the SAME pair of streams must
    surface every future peek with its exact microsecond magnitude —
    both counts verified against an independent SQL replay, so the
    audit itself is proven, not just the join."""
    from ultraviolet_spark.operators.asof import (asof_join,
                                                  temporal_leakage_audit)

    ev = _t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts")
    purch = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("ts").alias("pts"))
    back = asof_join(clicks, purch, on="ts", by="user_id",
                     value_cols=["pts"], direction="backward")
    fwd = asof_join(clicks, purch, on="ts", by="user_id",
                    value_cols=["pts"], direction="forward")
    a = temporal_leakage_audit(back, ts_col="ts", feature_ts_col="pts",
                               label="asof_backward")
    b = temporal_leakage_audit(fwd, ts_col="ts", feature_ts_col="pts",
                               label="asof_forward")
    return a.unionAll(b).select(
        "method", "n_rows", "n_joined", "n_violations", "max_lead_us")


@q("q210_pseudonymize_tombstones", """
WITH keep AS (
  SELECT event_type,
         sha256('s3cr3t' || CAST(user_id AS VARCHAR)) AS user_id_pseu
  FROM events WHERE user_id % 13 <> 0)
SELECT event_type,
  CAST(count(*) AS BIGINT) AS n_events,
  CAST(count(DISTINCT user_id_pseu) AS BIGINT) AS n_users,
  min(user_id_pseu) AS min_pseu
FROM keep GROUP BY event_type
""")
def q210(spark, sf_dir):
    """Release-pipeline privacy pass: deletion requests (every 13th
    user) propagate through a broadcast anti-join BEFORE keyed
    pseudonymization replaces user_id with SHA-256(secret ‖ id) —
    order matters, tombstoning after pseudonymization would need the
    secret at deletion time; pseudonyms stay joinable (same id ⇒ same
    hex) but unlinkable without the key, and the per-type rollup
    (count, distinct pseudonyms, min pseudonym) pins the exact hash
    bytes against DuckDB's independent sha256."""
    from ultraviolet_spark.operators.privacy import (apply_tombstones,
                                                     pseudonymize)

    ev = _t(spark, sf_dir, "events").select("event_type", "user_id")
    tombs = (ev.select("user_id").distinct()
             .filter(F.col("user_id") % 13 == 0))
    kept = apply_tombstones(ev, tombs, key="user_id")
    pseu = pseudonymize(kept, ["user_id"], secret="s3cr3t")
    return (pseu.groupBy("event_type")
            .agg(F.count("*").cast("long").alias("n_events"),
                 F.countDistinct("user_id_pseu").cast("long")
                  .alias("n_users"),
                 F.min("user_id_pseu").alias("min_pseu")))


@q("q211_daily_trend_by_type", """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS d,
         CAST(count(*) AS BIGINT) AS y
  FROM events GROUP BY 1, 2),
b AS (
  SELECT event_type, y,
    CAST(datediff('day', DATE '1970-01-01', d) AS BIGINT)
      - MIN(CAST(datediff('day', DATE '1970-01-01', d) AS BIGINT))
          OVER (PARTITION BY event_type) AS x
  FROM daily),
g AS (
  SELECT event_type,
    CAST(count(*) AS BIGINT) AS n,
    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
    CAST(SUM(x * y) AS BIGINT) AS sxy,
    CAST(SUM(x * x) AS BIGINT) AS sxx,
    CAST(SUM(y * y) AS BIGINT) AS syy
  FROM b GROUP BY event_type)
SELECT event_type, n,
  n * sxy - sx * sy AS slope_num,
  n * sxx - sx * sx AS slope_den,
  CASE WHEN n * sxx - sx * sx > 0
       THEN CAST(n * sxy - sx * sy AS DOUBLE)
            / CAST(n * sxx - sx * sx AS DOUBLE) END AS slope,
  CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
       THEN (CAST(n * sxy - sx * sy AS DOUBLE)
             * CAST(n * sxy - sx * sy AS DOUBLE))
            / (CAST(n * sxx - sx * sx AS DOUBLE)
               * CAST(n * syy - sy * sy AS DOUBLE)) END AS r2
FROM g
""")
def q211(spark, sf_dir):
    """Per-event-type OLS trend of daily event volume (the
    is-this-stream-growing slope): five exact int64 sufficient sums
    per key, x re-based to the key's first day so products stay far
    from int64 limits, slope and r² each one IEEE division of
    integers — order- and partitioning-independent, degenerate keys
    (one day, or constant volume for r²) NULL instead of dividing by
    zero."""
    from ultraviolet_spark.operators.stats import ols_trend_by_key

    ev = _t(spark, sf_dir, "events").select(
        "event_type", F.to_date("ts").alias("d"))
    daily = (ev.groupBy("event_type", "d")
             .agg(F.count("*").cast("long").alias("y"))
             .withColumn("x", F.datediff(
                 F.col("d"), F.to_date(F.lit("1970-01-01")))))
    return ols_trend_by_key(daily, key_col="event_type", x_col="x",
                            y_col="y").select(
        "event_type", "n", "slope_num", "slope_den", "slope", "r2")


@q("q212_interleave_strata", """
WITH s AS (
  SELECT source, row_number() OVER (ORDER BY source ASC) - 1 AS sidx
  FROM (SELECT DISTINCT source FROM documents)),
k AS (SELECT count(*) AS k FROM s),
r AS (
  SELECT doc_id, source,
    row_number() OVER (PARTITION BY source
      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id ASC) - 1 AS rn
  FROM documents)
SELECT r.doc_id, r.source,
       CAST(r.rn * k.k + s.sidx AS BIGINT) AS mix_pos
FROM r JOIN s USING (source) CROSS JOIN k
""")
def q212(spark, sf_dir):
    """Deterministic round-robin training-order schedule across source
    strata: row r of stratum s mixes to position r·K+index(s) — every
    K consecutive positions cycle all K strata, computed as pure
    arithmetic on a per-stratum md5 rank plus a K-row broadcast, with
    NO global sort; the full per-document position (not a summary) is
    the compared result."""
    from ultraviolet_spark.operators.corpus import interleave_strata

    d = _t(spark, sf_dir, "documents").select("doc_id", "source")
    return interleave_strata(d, strata_col="source",
                             id_col="doc_id").select(
        "doc_id", "source", "mix_pos")


@q("q213_ring_negatives", """
WITH b AS (
  SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS h,
         ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT
           % 64 AS bk
  FROM documents),
r AS (
  SELECT doc_id, bk, h,
    row_number() OVER (PARTITION BY bk ORDER BY h ASC, doc_id ASC) - 1
      AS rn,
    count(*) OVER (PARTITION BY bk) AS m
  FROM b),
a AS (
  SELECT doc_id, bk, rn, m,
         unnest(range(1, least(3, m - 1) + 1)) AS step
  FROM r WHERE m >= 2)
SELECT a.doc_id AS anchor_id, CAST(a.step AS BIGINT) AS neg_rank,
       p.doc_id AS neg_id
FROM a JOIN r p ON p.bk = a.bk AND p.rn = (a.rn + a.step) % a.m
""")
def q213(spark, sf_dir):
    """Deterministic contrastive negative sampling by walking the
    md5-ordered ring of each anchor's hash bucket: hash order is
    unrelated to content so ring neighbors are as-if-random, yet the
    full anchor→negative pairing is a pure function of the corpus —
    byte-identical on resume, re-saltable per epoch; steps that would
    wrap onto the anchor are suppressed (no degenerate self-pairs),
    and partners resolve via one (bucket, rank) equi-join with
    16-byte shuffle keys and zero similarity computation."""
    from ultraviolet_spark.operators.corpus import ring_negatives

    d = _t(spark, sf_dir, "documents").select("doc_id")
    return ring_negatives(d, id_col="doc_id", k=3, n_buckets=64).select(
        "anchor_id", "neg_rank", "neg_id")


@q("q214_bot_regularity", """
WITH o AS (
  SELECT user_id, epoch_us(ts) // 1000000 AS s,
    lag(epoch_us(ts) // 1000000) OVER (
      PARTITION BY user_id ORDER BY ts, event_id) AS prev_s
  FROM events),
g AS (
  SELECT user_id, s - prev_s AS gap FROM o WHERE prev_s IS NOT NULL),
a AS (
  SELECT user_id,
    CAST(count(*) AS BIGINT) AS n_gaps,
    CAST(SUM(gap) AS BIGINT) AS gap_sum_s,
    CAST(SUM(gap * gap) AS BIGINT) AS gap_sq_sum_s
  FROM g GROUP BY user_id)
SELECT user_id, n_gaps, gap_sum_s, gap_sq_sum_s,
  n_gaps * gap_sq_sum_s - gap_sum_s * gap_sum_s AS cv2_num,
  gap_sum_s * gap_sum_s AS cv2_den,
  CASE WHEN gap_sum_s > 0
       THEN CAST(n_gaps * gap_sq_sum_s - gap_sum_s * gap_sum_s AS DOUBLE)
            / CAST(gap_sum_s * gap_sum_s AS DOUBLE) END AS cv2,
  (n_gaps >= 5 AND gap_sum_s > 0
   AND (n_gaps * gap_sq_sum_s - gap_sum_s * gap_sum_s) * 10
       < gap_sum_s * gap_sum_s) AS is_regular
FROM a
""")
def q214(spark, sf_dir):
    """Bot-likeness via inter-event timing regularity: humans burst,
    schedulers tick — a user whose gap coefficient-of-variation is
    tiny is a machine.  CV² = (n·Σg² − (Σg)²)/(Σg)² stays entirely in
    int64 (gaps in whole seconds, exact epoch arithmetic), and the
    flag boundary is the integer cross-multiplication cv²·10 < 1 —
    no float ever decides classification; sparse users (<5 gaps) and
    zero-length histories never flag."""
    from ultraviolet_spark.operators.stats import inter_event_regularity
    return inter_event_regularity(
        _t(spark, sf_dir, "events"), key_col="user_id", ts_col="ts",
        tiebreak_col="event_id")


@q("q215_corpus_datasheet", """
WITH toks AS (
  SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\\s+')) AS t
  FROM documents),
tk AS (SELECT doc_id, t FROM toks WHERE t <> ''),
dup AS (
  SELECT md5(text) AS h, count(*) AS c FROM documents GROUP BY md5(text))
SELECT 'n_docs' AS metric, CAST(count(*) AS BIGINT) AS value FROM documents
UNION ALL
SELECT 'n_sources', CAST(count(DISTINCT source) AS BIGINT) FROM documents
UNION ALL
SELECT 'n_langs', CAST(count(DISTINCT lang) AS BIGINT) FROM documents
UNION ALL
SELECT 'chars_total', CAST(SUM(n_chars) AS BIGINT) FROM documents
UNION ALL
SELECT 'max_doc_chars', CAST(MAX(n_chars) AS BIGINT) FROM documents
UNION ALL
SELECT 'empty_docs',
  CAST(COALESCE(SUM(CASE WHEN trim(text) = '' THEN 1 ELSE 0 END), 0)
    AS BIGINT) FROM documents
UNION ALL
SELECT 'tokens_total', CAST(count(*) AS BIGINT) FROM tk
UNION ALL
SELECT 'vocab_size', CAST(count(DISTINCT t) AS BIGINT) FROM tk
UNION ALL
SELECT 'dup_docs',
  CAST(COALESCE(SUM(CASE WHEN c >= 2 THEN c END), 0) AS BIGINT) FROM dup
UNION ALL
SELECT 'dup_classes',
  CAST(COALESCE(SUM(CASE WHEN c >= 2 THEN 1 END), 0) AS BIGINT) FROM dup
""")
def q215(spark, sf_dir):
    """Corpus datasheet — the one-page release document (Gebru et al.
    2021 'Datasheets for Datasets') as a tall exact-integer metric
    table: sizes, vocabulary, emptiness and exact-duplicate mass, each
    independently recomputed by the oracle; every metric is an int64
    so the sheet can never drift between engines."""
    d = _t(spark, sf_dir, "documents")
    tk = (d.select(F.explode(F.split(F.lower(F.trim("text")),
                                     r"\s+")).alias("t"))
          .filter(F.col("t") != ""))
    dup = d.groupBy(F.md5("text").alias("h")).agg(
        F.count("*").alias("c"))

    def one(name, df_agg):
        return df_agg.select(F.lit(name).alias("metric"),
                             F.col("v").cast("long").alias("value"))

    parts = [
        one("n_docs", d.agg(F.count("*").alias("v"))),
        one("n_sources", d.agg(F.countDistinct("source").alias("v"))),
        one("n_langs", d.agg(F.countDistinct("lang").alias("v"))),
        one("chars_total", d.agg(F.sum("n_chars").alias("v"))),
        one("max_doc_chars", d.agg(F.max("n_chars").alias("v"))),
        one("empty_docs", d.agg(F.coalesce(
            F.sum(F.when(F.trim("text") == "", 1).otherwise(0)),
            F.lit(0)).alias("v"))),
        one("tokens_total", tk.agg(F.count("*").alias("v"))),
        one("vocab_size", tk.agg(F.countDistinct("t").alias("v"))),
        one("dup_docs", dup.agg(F.coalesce(
            F.sum(F.when(F.col("c") >= 2, F.col("c"))),
            F.lit(0)).alias("v"))),
        one("dup_classes", dup.agg(F.coalesce(
            F.sum(F.when(F.col("c") >= 2, 1)), F.lit(0)).alias("v"))),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


@q("q216_interval_union_coverage", """
WITH iv AS (
  SELECT user_id, ts AS s,
         ts + to_minutes(CAST(1 + event_id % 90 AS BIGINT)) AS e
  FROM events),
o AS (
  SELECT user_id, s, e,
         max(e) OVER (PARTITION BY user_id ORDER BY s, e
                      ROWS BETWEEN UNBOUNDED PRECEDING
                      AND 1 PRECEDING) AS pm
  FROM iv),
fl AS (
  SELECT *, CASE WHEN pm IS NULL OR s > pm THEN 1 ELSE 0 END AS nf
  FROM o),
isl AS (
  SELECT *, SUM(nf) OVER (PARTITION BY user_id ORDER BY s, e
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW) AS island
  FROM fl)
SELECT user_id, MIN(s) AS span_start, MAX(e) AS span_end,
       CAST(count(*) AS BIGINT) AS n_merged,
       CAST(epoch_us(MAX(e)) - epoch_us(MIN(s)) AS BIGINT) AS span_us
FROM isl GROUP BY user_id, island
""")
def q216(spark, sf_dir):
    """Per-user visit coverage: overlapping/touching visit intervals
    (each event opens a 1–90 minute window) merged into disjoint spans
    via gaps-and-islands — the UNION complement of q191's interval
    overlap JOIN.  Span lengths are exact integer microseconds; the
    oracle replays the same running-max island construction in DuckDB.
    One user_id exchange shared by both window passes and the span
    groupBy; no self-join, no explode."""
    from ultraviolet_spark.operators.intervals import interval_union

    ev = _t(spark, sf_dir, "events")
    iv = ev.select(
        "user_id", F.col("ts").alias("s"),
        F.expr("timestampadd(MINUTE, CAST(1 + event_id % 90 AS INT), ts)")
         .alias("e"))
    return interval_union(iv, key_cols=["user_id"],
                          start_col="s", end_col="e")


@q("q217_bottomk_vocab_jaccard", """
WITH tk AS (
  SELECT DISTINCT g, md5(t) AS h FROM (
    SELECT lang AS g,
           unnest(string_split_regex(lower(trim(text)), '\\s+')) AS t
    FROM documents) WHERE t <> ''),
sig AS (
  SELECT g, h FROM (
    SELECT g, h, row_number() OVER (PARTITION BY g ORDER BY h) AS r
    FROM tk)
  WHERE r <= 64),
gs AS (SELECT DISTINCT g FROM sig),
pr AS (SELECT a.g AS g1, b.g AS g2 FROM gs a JOIN gs b ON a.g < b.g),
u AS (
  SELECT p.g1, p.g2, s.h,
         MAX(CASE WHEN s.g = p.g1 THEN 1 ELSE 0 END) AS h1,
         MAX(CASE WHEN s.g = p.g2 THEN 1 ELSE 0 END) AS h2
  FROM pr p JOIN sig s ON s.g = p.g1 OR s.g = p.g2
  GROUP BY p.g1, p.g2, s.h),
rk AS (SELECT *, row_number() OVER (PARTITION BY g1, g2 ORDER BY h) AS r
       FROM u)
SELECT g1, g2, CAST(COUNT(*) AS BIGINT) AS n_bottom,
       CAST(SUM(h1 * h2) AS BIGINT) AS n_both,
       CAST(SUM(h1 * h2) AS DOUBLE) / COUNT(*) AS jaccard_est
FROM rk WHERE r <= 64 GROUP BY g1, g2
""")
def q217(spark, sf_dir):
    """Pairwise language-vocabulary similarity from bottom-k set
    sketches (Cohen–Kaplan): per-GROUP set Jaccard, complementing the
    per-document MinHash path — the sketch is the k lexicographically
    smallest md5 digests of each language's distinct token set, so the
    estimate is a pure function of the corpus (byte-identical across
    engines, runs and cluster sizes) and the oracle replays the exact
    estimator.  One full-data pass (the distinct); the G² pair frame
    is metadata-sized."""
    from ultraviolet_spark.operators.sketches import bottomk_jaccard_pairs

    d = _t(spark, sf_dir, "documents")
    tok = (d.select(F.col("lang"),
                    F.explode(F.split(F.lower(F.trim("text")),
                                      r"\s+")).alias("t"))
           .filter(F.col("t") != ""))
    return bottomk_jaccard_pairs(tok, group_col="lang", item_col="t",
                                 k=64)


@q("q218_url_templates_traps", """
WITH u AS (
  SELECT o_orderkey AS k,
    CASE o_orderkey % 4
      WHEN 0 THEN 'https://ex.com/cal/' || CAST(2000 + o_orderkey % 50 AS VARCHAR)
                  || '/' || CAST(1 + o_orderkey % 12 AS VARCHAR)
      WHEN 1 THEN 'https://ex.com/s/' || md5(CAST(o_orderkey AS VARCHAR)) || '/home'
      WHEN 2 THEN 'https://ex.com/p/' || CAST(o_orderkey % 20 AS VARCHAR)
      ELSE 'https://ex.com/list?page=' || CAST(o_orderkey % 5000 AS VARCHAR)
    END AS url,
    CASE o_orderkey % 4
      WHEN 0 THEN 'https://ex.com/cal/{n}/{n}'
      WHEN 1 THEN 'https://ex.com/s/{h}/home'
      WHEN 2 THEN 'https://ex.com/p/{n}'
      ELSE 'https://ex.com/list?'
    END AS template
  FROM orders)
SELECT template, CAST(count(*) AS BIGINT) AS n_urls,
       CAST(count(DISTINCT url) AS BIGINT) AS n_distinct,
       MIN(url) AS example,
       count(DISTINCT url) >= 100 AS is_trap
FROM u GROUP BY template
""")
def q218(spark, sf_dir):
    """Crawler-trap detection via URL template mining: volatile path
    tokens collapse (hex runs → {h} BEFORE digit runs → {n}, query
    string → a bare '?') so a calendar/session-id/facet explosion
    shows up as ONE template with unbounded distinct URLs, while a
    bounded catalog (20 product pages) stays under the trap threshold.
    The oracle constructs every template analytically from the
    synthesis arithmetic and never runs a regex — the Spark side's
    regexp_replace chain must land the exact same strings."""
    from ultraviolet_spark.operators.urls import url_templates

    o = _t(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    url = (F.when(k % 4 == 0,
                  F.concat(F.lit("https://ex.com/cal/"),
                           (F.lit(2000) + k % 50).cast("string"),
                           F.lit("/"), (F.lit(1) + k % 12).cast("string")))
           .when(k % 4 == 1,
                 F.concat(F.lit("https://ex.com/s/"),
                          F.md5(k.cast("string")), F.lit("/home")))
           .when(k % 4 == 2,
                 F.concat(F.lit("https://ex.com/p/"),
                          (k % 20).cast("string")))
           .otherwise(
               F.concat(F.lit("https://ex.com/list?page="),
                        (k % 5000).cast("string"))))
    return url_templates(o.select(url.alias("url")), trap_ndv=100)


@q("q219_length_bucketed_batches", """
WITH b AS (
  SELECT doc_id, CAST(n_chars AS BIGINT) AS len,
         CAST(n_chars AS BIGINT) // 256 AS bucket
  FROM documents WHERE n_chars IS NOT NULL AND n_chars >= 0),
r AS (
  SELECT *, (row_number() OVER (
      PARTITION BY bucket
      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) - 1) // 16
    AS batch_idx
  FROM b)
SELECT bucket, batch_idx, CAST(count(*) AS BIGINT) AS n_seqs,
       MAX(len) AS max_len, MIN(len) AS min_len,
       CAST(SUM(len) AS BIGINT) AS tokens_real,
       CAST(count(*) * MAX(len) - SUM(len) AS BIGINT) AS padding,
       count(*) = 16 AS is_full
FROM r GROUP BY bucket, batch_idx
""")
def q219(spark, sf_dir):
    """Length-bucketed training-batch assembly with exact padding
    accounting: docs batch with similar-length peers (pad waste
    < bucket_width per sequence by construction) WITHOUT a global
    length sort — bucket = len DIV 256, md5 rank within bucket,
    batch = rank DIV 16, so batch membership is a pure function of
    data + parameters and every count in the padding ledger is int64.
    The oracle replays the identical rank arithmetic in DuckDB."""
    from ultraviolet_spark.operators.corpus import length_bucketed_batches

    return length_bucketed_batches(
        _t(spark, sf_dir, "documents"), id_col="doc_id",
        len_col="n_chars", batch_size=16, bucket_width=256)


@q("q220_compaction_plan", """
WITH f AS (
  SELECT o_orderpriority AS part,
         'f' || lpad(CAST(o_orderkey AS VARCHAR), 10, '0') AS file_path,
         CAST((o_orderkey * 7919) % 1500000 AS BIGINT) AS sz
  FROM orders),
small AS (
  SELECT part, file_path, sz,
         COALESCE(SUM(sz) OVER (PARTITION BY part ORDER BY file_path
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           // 1000000 AS group_id
  FROM f WHERE sz < 1000000),
big AS (
  SELECT part, file_path, sz,
         -row_number() OVER (PARTITION BY part ORDER BY file_path)
           AS group_id
  FROM f WHERE sz >= 1000000)
SELECT part, CAST(group_id AS BIGINT) AS group_id,
       CAST(count(*) AS BIGINT) AS n_files,
       CAST(SUM(sz) AS BIGINT) AS bytes_total,
       MIN(sz) AS bytes_min, MAX(sz) AS bytes_max,
       count(*) >= 2 AS needs_compaction, FALSE AS passthrough
FROM small GROUP BY part, group_id
UNION ALL
SELECT part, CAST(group_id AS BIGINT), CAST(1 AS BIGINT),
       sz, sz, sz, FALSE, TRUE
FROM big
""")
def q220(spark, sf_dir):
    """Small-file compaction planning over a synthesized file listing
    (the metadata-only half of OPTIMIZE / rewrite_data_files): files
    already at target size pass through untouched, the small tail bins
    by prefix-sum DIV target over deterministic path order — every bin
    lands in [target, 2·target) except the runt — and only ≥2-file
    bins are actionable.  The oracle replays the identical window
    arithmetic; the planner itself is one window over the listing,
    never over data."""
    from ultraviolet_spark.plans.layout import compaction_plan

    o = _t(spark, sf_dir, "orders")
    files = o.select(
        F.col("o_orderpriority").alias("part"),
        F.concat(F.lit("f"), F.lpad(F.col("o_orderkey").cast("string"),
                                    10, "0")).alias("file_path"),
        ((F.col("o_orderkey") * 7919) % 1500000).cast("long")
        .alias("size_bytes"))
    return compaction_plan(files, partition_cols=["part"],
                           target_bytes=1_000_000)


@q("q221_jsd_vocab_drift", """
WITH tok AS (
  SELECT g, t FROM (
    SELECT lang AS g,
           unnest(string_split_regex(lower(trim(text)), '\\s+')) AS t
    FROM documents) WHERE t <> ''),
cnt AS (SELECT g, t, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY g, t),
tot AS (SELECT g, CAST(SUM(c) AS BIGINT) AS n FROM cnt GROUP BY g),
ct AS (SELECT cnt.g, t, c, n FROM cnt JOIN tot ON cnt.g = tot.g),
j AS (
  SELECT a.g AS g1, b.g AS g2, a.c AS ca, b.c AS cb, a.n AS na, b.n AS nb,
         CAST(a.c AS DOUBLE) / CAST(a.n AS DOUBLE) AS p,
         CAST(b.c AS DOUBLE) / CAST(b.n AS DOUBLE) AS q
  FROM ct a JOIN ct b ON a.t = b.t AND a.g < b.g),
m AS (
  SELECT g1, g2, ca, cb, na, nb,
         CAST(round((p * ln(2.0 * p / (p + q))
                     + q * ln(2.0 * q / (p + q))) * 1000000.0)
              AS BIGINT) AS micro
  FROM j),
agg AS (
  SELECT g1, g2, CAST(count(*) AS BIGINT) AS n_shared,
         CAST(SUM(ca) AS BIGINT) AS a_shared,
         CAST(SUM(cb) AS BIGINT) AS b_shared,
         MAX(na) AS na, MAX(nb) AS nb,
         CAST(SUM(micro) AS BIGINT) AS jsd_micro_shared
  FROM m GROUP BY g1, g2)
SELECT g1, g2, n_shared, a_shared, b_shared, jsd_micro_shared,
       0.5 * (CAST(jsd_micro_shared AS DOUBLE) / 1000000.0
              + 0.6931471805599453
                * (1.0 - CAST(a_shared AS DOUBLE) / CAST(na AS DOUBLE))
              + 0.6931471805599453
                * (1.0 - CAST(b_shared AS DOUBLE) / CAST(nb AS DOUBLE)))
         AS jsd
FROM agg
""")
def q221(spark, sf_dir):
    """Pairwise Jensen–Shannon vocabulary drift between languages:
    shared-token KL terms rounded to integer micro-nats before the
    sum (order/partitioning-independent; JVM-vs-libm ln ULPs cannot
    cross a 0.5e-6 boundary except on astronomically exact ties), the
    one-sided vocabulary tails contributed analytically as
    ln2·(1 − shared_mass) from exact int64 sums — no outer join —
    and ln 2 hardcoded as the correctly-rounded double literal in
    both engines."""
    from ultraviolet_spark.operators.stats import jsd_drift_pairs

    d = _t(spark, sf_dir, "documents")
    tok = (d.select(F.col("lang"),
                    F.explode(F.split(F.lower(F.trim("text")),
                                      r"\s+")).alias("t"))
           .filter(F.col("t") != ""))
    return jsd_drift_pairs(tok, group_col="lang", item_col="t")


@q("q222_rbo_ranking_drift", """
WITH agg AS (
  SELECT o_orderpriority AS pri, o_custkey % 40 AS cand,
         CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
              AS BIGINT) AS cents,
         CAST(count(*) AS BIGINT) AS n
  FROM orders GROUP BY pri, cand),
rk AS (
  SELECT pri, cand,
         row_number() OVER (PARTITION BY pri
                            ORDER BY cents DESC, cand) AS ra,
         row_number() OVER (PARTITION BY pri
                            ORDER BY n DESC, cand) AS rb
  FROM agg),
wt AS (
  SELECT * FROM (VALUES
    (1, 593249326578), (2, 341249326578), (3, 227849326578),
    (4, 159809326578), (5, 113882326578), (6, 80814886578),
    (7, 56014306578), (8, 36882430578), (9, 21816078228),
    (10, 9762996348)) AS t(m, w))
SELECT pri AS query, CAST(count(*) AS BIGINT) AS n_both_topk,
       CAST(SUM(w) AS BIGINT) AS rbo_num,
       CAST(SUM(w) AS DOUBLE) / 1641330331200.0 AS rbo
FROM rk JOIN wt ON wt.m = greatest(ra, rb)
WHERE ra <= 10 AND rb <= 10
GROUP BY pri
""")
def q222(spark, sf_dir):
    """Ranking-drift monitor via rank-biased overlap: the same
    candidate pool ranked by revenue vs by order count, compared with
    top-weighted RBO@10 — per-item contributions come from a
    precomputed integer tail table (w_d/d made exact by nano-scaling
    and the lcm 2520), the per-query sum is pure int64 addition, and
    the score is one IEEE division by the normalizer that maps
    identical prefixes to exactly 1.0.  Revenue keys are exact cents
    (floor(x·100+0.5)) so neither ranking can tie-flip between
    engines."""
    from pyspark.sql import Window
    from ultraviolet_spark.operators.evalmetrics import rbo_at_k

    o = _t(spark, sf_dir, "orders")
    agg = (o.groupBy(F.col("o_orderpriority").alias("pri"),
                     (F.col("o_custkey") % 40).alias("cand"))
           .agg(F.sum(F.floor(F.col("o_totalprice") * 100 + 0.5)
                      .cast("long")).cast("long").alias("cents"),
                F.count("*").cast("long").alias("n")))
    wa = Window.partitionBy("pri").orderBy(F.col("cents").desc(),
                                           F.col("cand").asc())
    wb = Window.partitionBy("pri").orderBy(F.col("n").desc(),
                                           F.col("cand").asc())
    rk = agg.select("pri", "cand",
                    F.row_number().over(wa).alias("ra"),
                    F.row_number().over(wb).alias("rb"))
    return rbo_at_k(rk, query_col="pri", item_col="cand",
                    rank_a_col="ra", rank_b_col="rb")


@q("q223_json_schema_profile", """
WITH c AS (
  SELECT CAST(COUNT(*) FILTER (o_orderkey % 4 = 0) AS BIGINT) AS c0,
         CAST(COUNT(*) FILTER (o_orderkey % 4 = 1) AS BIGINT) AS c1,
         CAST(COUNT(*) FILTER (o_orderkey % 4 = 2) AS BIGINT) AS c2,
         CAST(COUNT(*) FILTER (o_orderkey % 4 = 3) AS BIGINT) AS c3
  FROM orders),
p AS (
  SELECT 'a' AS key, c0 + c1 + c3 AS n_present, c0 AS n_int,
         c1 AS n_double, CAST(0 AS BIGINT) AS n_bool, c3 AS n_string,
         CAST(0 AS BIGINT) AS n_array, CAST(0 AS BIGINT) AS n_object,
         CAST(0 AS BIGINT) AS n_null
  FROM c
  UNION ALL
  SELECT 'b', c0 + c2, 0, 0, 0, c0, 0, 0, c2 FROM c
  UNION ALL
  SELECT 'c', c1, 0, 0, c1, 0, 0, 0, 0 FROM c
  UNION ALL
  SELECT 'd', c2, 0, 0, 0, 0, c2, 0, 0 FROM c)
SELECT key, n_present, n_int, n_double, n_bool, n_string, n_array,
       n_object, n_null,
       CASE
         WHEN n_int = greatest(n_int, n_double, n_bool, n_string,
                               n_array, n_object, n_null) THEN 'int'
         WHEN n_double = greatest(n_int, n_double, n_bool, n_string,
                                  n_array, n_object, n_null) THEN 'double'
         WHEN n_bool = greatest(n_int, n_double, n_bool, n_string,
                                n_array, n_object, n_null) THEN 'bool'
         WHEN n_string = greatest(n_int, n_double, n_bool, n_string,
                                  n_array, n_object, n_null) THEN 'string'
         WHEN n_array = greatest(n_int, n_double, n_bool, n_string,
                                 n_array, n_object, n_null) THEN 'array'
         WHEN n_object = greatest(n_int, n_double, n_bool, n_string,
                                  n_array, n_object, n_null) THEN 'object'
         ELSE 'null'
       END AS dominant_type
FROM p
""")
def q223(spark, sf_dir):
    """JSONL-feed schema audit: per top-level key, presence + type
    histogram + dominant type under a fixed priority tiebreak.  The
    Spark side actually PARSES synthesized mixed-type JSON documents
    (int/double/string conflict on key 'a', string-vs-null on 'b',
    bool and array keys) through map<string,string> coercion; the
    oracle never touches JSON — it derives every count analytically
    from the synthesis arithmetic, so a parsing or classification bug
    cannot hide."""
    from ultraviolet_spark.operators.stats import json_schema_profile

    o = _t(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    j = (F.when(k % 4 == 0,
                F.concat(F.lit('{"a": '), (k % 100).cast("string"),
                         F.lit(', "b": "s'), (k % 7).cast("string"),
                         F.lit('"}')))
         .when(k % 4 == 1,
               F.concat(F.lit('{"a": '), (k % 100).cast("string"),
                        F.lit('.5, "c": true}')))
         .when(k % 4 == 2, F.lit('{"b": null, "d": [1,2]}'))
         .otherwise(
             F.concat(F.lit('{"a": "x'), (k % 3).cast("string"),
                      F.lit('"}'))))
    return json_schema_profile(o.select(j.alias("doc")), json_col="doc")


@q("q224_transition_matrix", """
WITH o AS (
  SELECT event_type AS from_state,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS to_state
  FROM events),
cnt AS (
  SELECT from_state, to_state, CAST(count(*) AS BIGINT) AS n
  FROM o WHERE to_state IS NOT NULL GROUP BY from_state, to_state),
st AS (SELECT DISTINCT event_type AS s FROM events),
fm AS (
  SELECT a.s AS from_state, b.s AS to_state, COALESCE(cnt.n, 0) AS n
  FROM st a CROSS JOIN st b
  LEFT JOIN cnt ON cnt.from_state = a.s AND cnt.to_state = b.s)
SELECT from_state, to_state, n,
       n + 1 AS p_num,
       CAST(SUM(n) OVER (PARTITION BY from_state)
            + COUNT(*) OVER (PARTITION BY from_state) AS BIGINT)
         AS p_den,
       CAST(n + 1 AS DOUBLE)
         / CAST(SUM(n) OVER (PARTITION BY from_state)
                + COUNT(*) OVER (PARTITION BY from_state) AS DOUBLE)
         AS p
FROM fm
""")
def q224(spark, sf_dir):
    """First-order Markov transitions between event types with
    add-one smoothing: the full S×S matrix (unseen transitions carry
    mass — that is what smoothing is for), probabilities as one IEEE
    division over exact integer sufficient statistics, the event
    order pinned by (ts, event_id) so the observed transition
    multiset is partitioning-independent."""
    from ultraviolet_spark.operators.funnel import transition_matrix

    return transition_matrix(_t(spark, sf_dir, "events"))


@q("q225_near_dup_against_corpus", """
WITH toks AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS w
  FROM documents),
sh0 AS (
  SELECT doc_id, w, unnest(generate_series(1, len(w) - 2)) AS i
  FROM toks WHERE len(w) >= 3),
sh AS (
  SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
  FROM sh0),
sz AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
com AS (
  SELECT a.doc_id AS new_id, b.doc_id AS ref_id, COUNT(*) AS n_common
  FROM sh a JOIN sh b USING (shingle)
  WHERE a.doc_id % 5 = 0 AND b.doc_id % 5 <> 0 GROUP BY 1, 2)
SELECT new_id, ref_id,
  round(CAST(n_common AS DOUBLE) / (sa.n_sh + sb.n_sh - n_common), 6)
    AS jaccard
FROM com
JOIN sz sa ON sa.doc_id = new_id
JOIN sz sb ON sb.doc_id = ref_id
WHERE CAST(n_common AS DOUBLE) / (sa.n_sh + sb.n_sh - n_common) >= 0.5
""")
def q225(spark, sf_dir):
    """Incremental-release dedup, exact path: a synthetic 'new crawl
    shard' (doc_id % 5 = 0) screened against the already-released
    rest of the corpus by exact n-gram Jaccard — pairs meet only
    through shared shingles (inverted index), never new×ref, and the
    same new doc may match many reference docs (each match is a
    reason to drop it).  This is the exact twin pinning q226's LSH
    scale path, the same q35↔q50 pattern."""
    from ultraviolet_spark.operators.dedup import ngram_jaccard_pairs_against

    d = _t(spark, sf_dir, "documents")
    return ngram_jaccard_pairs_against(
        d.filter(F.col("doc_id") % 5 == 0),
        d.filter(F.col("doc_id") % 5 != 0), n=3, threshold=0.5)


@q("q226_near_dup_against_lsh", None)  # probabilistic recall → rows-only
def q226(spark, sf_dir):
    """Scale path of q225: MinHash + banded LSH of the new shard
    against the released corpus (shared permutations so band hashes
    collide across frames), exact-verify on candidates only; at
    10^12 reference docs the banded reference index is what persists
    between increments."""
    from ultraviolet_spark.operators.dedup import minhash_lsh_pairs_against

    d = _t(spark, sf_dir, "documents")
    return minhash_lsh_pairs_against(
        d.filter(F.col("doc_id") % 5 == 0),
        d.filter(F.col("doc_id") % 5 != 0),
        n=3, num_perm=128, bands=32, threshold=0.5)


@q("q227_best_span_extraction", """
WITH u AS (
  SELECT l_orderkey AS k,
         (CAST(l_linenumber AS BIGINT) * 10000000000000
            + CAST(l_partkey AS BIGINT) * 1000000
            + CAST(l_suppkey AS BIGINT)) AS pos,
         CASE WHEN l_partkey % 3 = 0 THEN -2 ELSE 1 END AS sc
  FROM lineitem),
b AS (
  SELECT k, pos, sc,
         row_number() OVER w AS rn,
         CAST(SUM(sc) OVER (PARTITION BY k ORDER BY pos
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS BIGINT) AS cum
  FROM u WINDOW w AS (PARTITION BY k ORDER BY pos)),
p AS (
  SELECT *,
         min({'c': cum, 'r': rn}) OVER (PARTITION BY k ORDER BY pos
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm0
  FROM b),
e AS (
  SELECT k, rn, cum,
         CASE WHEN pm0 IS NULL
                OR {'c': CAST(0 AS BIGINT), 'r': CAST(0 AS BIGINT)} <= pm0
              THEN {'c': CAST(0 AS BIGINT), 'r': CAST(0 AS BIGINT)}
              ELSE pm0 END AS pm
  FROM p),
a AS (
  SELECT k, CAST(count(*) AS BIGINT) AS n_units,
         max({'s': cum - pm.c, 'nr': -rn, 'st': pm.r + 1}) AS w
  FROM e GROUP BY k)
SELECT k, n_units,
       CASE WHEN w.s > 0 THEN CAST(w.s AS BIGINT) END AS best_sum,
       CASE WHEN w.s > 0 THEN CAST(w.st AS BIGINT) END AS start_idx,
       CASE WHEN w.s > 0 THEN CAST(-w.nr AS BIGINT) END AS end_idx,
       CASE WHEN w.s > 0 THEN CAST(-w.nr - w.st + 1 AS BIGINT) END AS len
FROM a
""")
def q227(spark, sf_dir):
    """Best contiguous span per document — Kadane's maximum-sum
    subarray as two struct-window passes (keep-the-best-region
    content extraction): lineitems score +1 content / −2 boilerplate
    by part arithmetic, the winning span maximizes the exact int64
    sum with total tie rules (earliest end, then longest span via
    earliest prefix argmin), and all-negative documents keep NOTHING
    (NULL span) instead of a degenerate empty span.  Both engines run
    the identical lexicographic struct min/max.  ``pos`` is built
    from (linenumber, partkey, suppkey) because this synthetic
    lineitem does NOT keep l_linenumber unique per order (11,785
    duplicate pairs at sf0.01) — a non-unique ordering key would make
    row_number, and therefore the reported span indexes,
    partitioning-dependent."""
    from ultraviolet_spark.operators.windows import best_span

    li = _t(spark, sf_dir, "lineitem")
    units = li.select(
        F.col("l_orderkey").alias("k"),
        (F.col("l_linenumber").cast("long") * F.lit(10000000000000).cast("long")
         + F.col("l_partkey").cast("long") * 1000000
         + F.col("l_suppkey").cast("long")).alias("pos"),
        F.when(F.col("l_partkey") % 3 == 0, -2).otherwise(1).alias("sc"))
    return best_span(units, key_col="k", pos_col="pos", score_col="sc")


@q("q228_merge_upsert_cdc", """
WITH d AS (SELECT doc_id, text FROM documents),
base AS (SELECT doc_id, text FROM d WHERE doc_id % 7 <> 6),
ch AS (
  SELECT doc_id, 1 AS ts, 1 AS seq, 'I' AS op, text || ' ins' AS text
  FROM d WHERE doc_id % 7 = 6
  UNION ALL
  SELECT doc_id, 2, 1, 'U', text || ' v2' FROM d WHERE doc_id % 3 = 0
  UNION ALL
  SELECT doc_id, 3, 1, 'D', NULL FROM d WHERE doc_id % 5 = 0
  UNION ALL
  SELECT doc_id, 3, 2, 'U', text || ' back' FROM d WHERE doc_id % 10 = 5),
last AS (
  SELECT doc_id, op, text FROM (
    SELECT doc_id, op, text,
           row_number() OVER (PARTITION BY doc_id
                              ORDER BY ts DESC, seq DESC) AS rn
    FROM ch) WHERE rn = 1)
SELECT COALESCE(b.doc_id, l.doc_id) AS doc_id,
       CASE WHEN l.op IS NOT NULL THEN l.text ELSE b.text END AS text,
       CASE WHEN l.op IS NOT NULL THEN 'upserted' ELSE 'kept' END AS action
FROM base b FULL JOIN last l ON b.doc_id = l.doc_id
WHERE l.op IS NULL OR l.op <> 'D'
""")
def q228(spark, sf_dir):
    """Lakehouse MERGE (CDC apply, last-writer-wins): one change batch
    holding inserts (doc_id%7=6, keys absent from base), updates
    (%3=0), deletes (%5=0) and a same-timestamp resurrecting update
    (%10=5 at ts=3 seq=2, beating its own delete at ts=3 seq=1 on the
    commit-sequence tiebreak) is folded to one winner per key by a
    lexicographic max(struct(ts,seq,…)) and full-outer-merged into the
    base snapshot.  Keys hit by overlapping rules exercise the whole
    precedence lattice (%15=0 → U then D → gone; %10=5 → D then U →
    back).  The oracle replays the same total order with a DESC
    row_number — a different mechanism (window vs struct max), same
    contract."""
    from ultraviolet_spark.operators.history import merge_upsert

    d = F.col("doc_id")
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    base = docs.filter(d % 7 != 6)

    def ch(pred, ts, seq, op, text_col):
        return docs.filter(pred).select(
            "doc_id", F.lit(ts).alias("ts"), F.lit(seq).alias("seq"),
            F.lit(op).alias("op"), text_col.alias("text"))

    changes = (
        ch(d % 7 == 6, 1, 1, "I", F.concat("text", F.lit(" ins")))
        .unionByName(ch(d % 3 == 0, 2, 1, "U",
                        F.concat("text", F.lit(" v2"))))
        .unionByName(ch(d % 5 == 0, 3, 1, "D",
                        F.lit(None).cast("string")))
        .unionByName(ch(d % 10 == 5, 3, 2, "U",
                        F.concat("text", F.lit(" back")))))
    return merge_upsert(base, changes, key="doc_id", ts_col="ts",
                        seq_col="seq", op_col="op", payload=("text",))


@q("q229_variant_json", """
WITH j AS (
  SELECT doc_id,
         '{"id": ' || doc_id || ', "meta": {"lang": "' || lang ||
         '", "score": ' || (doc_id % 7) || '}, "tags": ["a", "t' ||
         (doc_id % 3) || '"], "flag": ' ||
         CASE WHEN doc_id % 2 = 0 THEN 'true' ELSE 'false' END ||
         CASE WHEN doc_id % 4 = 0 THEN ', "opt": null' ELSE '' END ||
         '}' AS js
  FROM documents)
SELECT doc_id,
       CAST(json_extract(js, '$.id') AS BIGINT) AS id_v,
       json_extract_string(js, '$.meta.lang') AS lang_v,
       CAST(json_extract(js, '$.meta.score') AS BIGINT) * 2 AS score2x,
       json_extract_string(js, '$.tags[1]') AS tag1,
       CAST(CAST(json_extract(js, '$.flag') AS BOOLEAN) AS BIGINT) AS flag_i,
       CAST(COALESCE(json_type(js, '$.opt') = 'NULL', FALSE) AS BIGINT)
         AS opt_isnull,
       CAST(json_extract(js, '$.nope') AS BIGINT) AS missing_v
FROM j
""")
def q229(spark, sf_dir):
    """Semi-structured VARIANT ingestion (Spark 4 ``parse_json`` /
    ``variant_get``): JSON documents land as the open VARIANT type —
    the lakehouse answer to schema-on-read — and are extracted through
    typed paths without ever declaring a struct schema.  Exercises
    nested-object paths (``$.meta.lang``), array indexing
    (``$.tags[1]``), typed casts at extraction (bigint/string/boolean),
    the JSON-null vs key-missing distinction (``is_variant_null`` over
    ``try_variant_get`` — JSON ``null`` is a present null VALUE, a
    missing key is SQL NULL), and out-of-schema access returning NULL
    (``try_variant_get('$.nope')``).  The JSON text itself is
    synthesized identically on both engines from documents columns so
    the oracle (DuckDB ``json_extract`` family) replays extraction, not
    synthesis.  VARIANT stays entirely JVM-side (no UDF): parse and
    every path-get are Catalyst expressions, and at scale the binary
    variant encoding is columnar-shredded in parquet rather than
    re-parsed per query.  Booleans cross the compare as BIGINT (the
    gate's value-hash is dtype-sensitive and the engines' bool dtypes
    differ); the missing-key probe COALESCEs to FALSE in the oracle
    because DuckDB's json_type yields NULL (not false) on absent
    paths."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "lang")
    d = F.col("doc_id")
    json_str = F.concat(
        F.lit('{"id": '), d.cast("string"),
        F.lit(', "meta": {"lang": "'), F.col("lang"),
        F.lit('", "score": '), (d % 7).cast("string"),
        F.lit('}, "tags": ["a", "t'), (d % 3).cast("string"),
        F.lit('"], "flag": '),
        F.when(d % 2 == 0, F.lit("true")).otherwise(F.lit("false")),
        F.when(d % 4 == 0, F.lit(', "opt": null')).otherwise(F.lit("")),
        F.lit("}"),
    )
    return (docs.select("doc_id", F.parse_json(json_str).alias("v"))
            .select(
                "doc_id",
                F.variant_get("v", "$.id", "bigint").alias("id_v"),
                F.variant_get("v", "$.meta.lang", "string").alias("lang_v"),
                (F.variant_get("v", "$.meta.score", "bigint") * 2)
                .alias("score2x"),
                F.variant_get("v", "$.tags[1]", "string").alias("tag1"),
                F.variant_get("v", "$.flag", "boolean").cast("bigint")
                .alias("flag_i"),
                F.expr("is_variant_null(try_variant_get(v, '$.opt'))")
                .cast("bigint").alias("opt_isnull"),
                F.try_variant_get("v", "$.nope", "bigint")
                .alias("missing_v")))


@q("q230_tfrecord_roundtrip", """
SELECT doc_id, text, lang,
       CAST((doc_id % 16) / 4.0 AS REAL) AS weight,
       CASE WHEN doc_id % 5 = 0 THEN NULL
            ELSE 'n' || (doc_id % 5) END AS opt_note,
       (doc_id % 7) + (doc_id % 11) + (doc_id % 13) AS tok_sum,
       (doc_id % 7) || ',' || (doc_id % 11) || ',' || (doc_id % 13)
         AS tok_csv
FROM documents
""")
def q230(spark, sf_dir):
    """TFRecord / ``tf.train.Example`` sink+source conformance: the
    training-data interchange edge.  Documents plus a float32 weight
    (exactly representable values — the proto's float_list is 4-byte,
    and the writer REFUSES DoubleType rather than narrow silently), a
    nullable string (NULL → absent-feature → NULL, distinct from ""),
    and an array<long> token list are serialized to sharded TFRecord
    files (md5-sharded, one file per task, masked-crc32c framing,
    map entries in sorted-key order for byte determinism), re-read via
    a binaryFile scan with BOTH CRCs of every record verified, then
    flattened (sum + csv of the token list) for the dtype-strict
    compare.  The oracle recomputes expected rows from parquet and
    never sees the TFRecord bytes — a value-hash match proves the
    serialize→frame→parse→decode pipeline lossless.  From-scratch wire
    formats (public spec); no tensorflow/protobuf/crc32c deps."""
    import tempfile

    from ultraviolet_spark.sources.tfrecord import tfrecord_roundtrip

    d = F.col("doc_id")
    src = _t(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang",
        ((d % 16) / 4.0).cast("float").alias("weight"),
        F.when(d % 5 != 0,
               F.concat(F.lit("n"), (d % 5).cast("string")))
        .alias("opt_note"),
        F.array((d % 7), (d % 11), (d % 13)).alias("tok_ids"))
    back = tfrecord_roundtrip(
        src, tempfile.mkdtemp(prefix="uv_q230_"), key_col="doc_id")
    return back.select(
        "doc_id", "text", "lang", "weight", "opt_note",
        F.aggregate("tok_ids", F.lit(0).cast("bigint"),
                    lambda a, x: a + x).alias("tok_sum"),
        F.concat_ws(",", F.transform("tok_ids",
                                     lambda x: x.cast("string")))
        .alias("tok_csv"))


@q("q231_warc_connector_pushdown", """
SELECT 'b' || (doc_id % 7) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_pages,
       CAST(SUM(octet_length(encode(text))) AS BIGINT) AS bytes_total,
       MIN(TIMESTAMP '2026-01-01' + to_seconds(doc_id)) AS first_crawl,
       MAX(TIMESTAMP '2026-01-01' + to_seconds(doc_id)) AS last_crawl
FROM documents WHERE doc_id % 3 <> 0 GROUP BY 1
""")
def q231(spark, sf_dir):
    """WARC through the registered Spark 4 Python DataSource connector
    (``uvwarc``, sources/warc_ds.py) with REAL filter pushdown: docs
    serialize to 6 member-per-record .warc.gz shards carrying 200 and
    404 responses plus metadata sidecar records, the scan pushes
    ``rec_type = 'response' AND http_status = 200`` into the source
    (Spark 4.1 ``pushFilters``; the 404/metadata payloads are dropped
    BEFORE crossing the Arrow boundary), records stream member-at-a-
    time in bounded chunks — never the binaryFile whole-file-cell
    shape that hits the 2 GiB Arrow wall on real ~1 GB crawl shards.
    The oracle recomputes the rollup analytically from documents
    (never sees a WARC byte), so gzip member streaming, header
    extraction, HTTP-status peeling, the pushed predicates AND the
    connector's Arrow batch schema are all on the hook.  Round 4
    (VERDICT r3 #7): fixture synthesis moved off the driver — the
    response rows and metadata sidecars build in Catalyst and ship
    through the distributed uvwarc sink (byte-interchangeable with
    the old build_warc shards)."""
    import tempfile

    from ultraviolet_spark.sources.warc_ds import (read_warc_ds,
                                                   write_warc_ds)

    docs = _t(spark, sf_dir, "documents")
    url = F.concat(F.lit("https://b"), F.col("doc_id") % 7,
                   F.lit(".example.org/p/"), F.col("doc_id")).alias("url")
    ts = F.timestamp_seconds(F.lit(1767225600) + F.col("doc_id")) \
          .alias("warc_ts")
    resp = docs.select(
        url, ts, F.lit("response").alias("rec_type"),
        F.when(F.col("doc_id") % 3 == 0, 404).otherwise(200)
         .cast("int").alias("http_status"),
        F.lit("text/html").alias("content_type"),
        F.encode("text", "UTF-8").alias("html"))
    meta = docs.filter(F.col("doc_id") % 10 == 0).select(
        url, ts, F.lit("metadata").alias("rec_type"),
        F.lit(None).cast("int").alias("http_status"),
        F.lit("application/json").alias("content_type"),
        F.lit(b'{"fetch":"meta"}').alias("html"))
    d = tempfile.mkdtemp(prefix="uv_q231_")
    write_warc_ds(resp.unionByName(meta), d, num_shards=6)
    pages = (read_warc_ds(spark, d)
             .filter((F.col("rec_type") == "response")
                     & (F.col("http_status") == 200)))
    return (pages
            .select(F.regexp_extract("url", r"^https://(b\d+)\.", 1)
                    .alias("bucket"),
                    "html", "warc_ts")
            .groupBy("bucket")
            .agg(F.count("*").cast("long").alias("n_pages"),
                 F.sum(F.octet_length("html")).cast("long")
                  .alias("bytes_total"),
                 F.min("warc_ts").alias("first_crawl"),
                 F.max("warc_ts").alias("last_crawl")))


@q("q232_zonemap_skipping_scan", """
SELECT l_returnflag,
  COUNT(*) AS n_rows,
  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty_total,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS price_total,
  CAST(MIN(l_partkey) AS BIGINT) AS pk_min,
  CAST(MAX(l_suppkey) AS BIGINT) AS sk_max
FROM lineitem
WHERE l_partkey BETWEEN 20 AND 400 AND l_suppkey BETWEEN 2 AND 40
GROUP BY l_returnflag
""")
def q232(spark, sf_dir):
    """Zone-map data skipping over a Z-ordered layout (plans/skipping
    .py + plans/layout.py): lineitem is materialized Z-ordered on
    (l_partkey, l_suppkey) — one ingest-time range shuffle on the
    Morton key — then a 2-D box predicate is answered through
    ``skipping_scan``: per-file min/max harvested from the parquet
    FOOTERS (distributed, O(KB)/file — the planner-side index that at
    10^6-file scale skips whole TASKS, where Spark's own pushdown only
    skips row groups after a task opened the footer), files whose
    stats prove no match are never read, and the residual predicate is
    re-applied so pruning is an optimization, never a correctness
    dependency.  The DuckDB oracle answers the same box + rollup on
    the ORIGINAL parquet — if pruning dropped one matching file (or
    kept a wrong one past the residual filter) the hashes diverge."""
    import tempfile

    from ultraviolet_spark.plans.layout import write_zordered
    from ultraviolet_spark.plans.skipping import skipping_scan

    d = tempfile.mkdtemp(prefix="uv_q232_")
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_returnflag",
        "l_quantity", "l_extendedprice")
    # bits=15 covers sf≤0.1 key ranges exactly; larger keys would wrap,
    # which degrades locality only — the residual filter keeps results
    # exact at any SF.
    write_zordered(li, d, cols=["l_partkey", "l_suppkey"], bits=15,
                   num_files=16)
    pruned = skipping_scan(spark, d, [
        ("l_partkey", "between", (20, 400)),
        ("l_suppkey", "between", (2, 40))])
    return pruned.groupBy("l_returnflag").agg(
        F.count("*").alias("n_rows"),
        F.sum(F.col("l_quantity").cast("long")).alias("qty_total"),
        F.sum(_dec("l_extendedprice")).cast("double").alias("price_total"),
        F.min("l_partkey").cast("long").alias("pk_min"),
        F.max("l_suppkey").cast("long").alias("sk_max"))


@q("q233_warc_sink_roundtrip", """
SELECT 'b' || CAST(doc_id % 7 AS VARCHAR) AS bucket,
  COUNT(*) AS n_pages,
  CAST(SUM(CASE WHEN doc_id % 3 <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_ok,
  CAST(SUM(octet_length(encode(text))) AS BIGINT) AS bytes_total,
  make_timestamp((1767225600 + MIN(doc_id)) * 1000000) AS first_crawl,
  make_timestamp((1767225600 + MAX(doc_id)) * 1000000) AS last_crawl
FROM documents
GROUP BY doc_id % 7
""")
def q233(spark, sf_dir):
    """The uvwarc WRITE path (``df.write.format("uvwarc")`` — Spark 4
    Python DataSourceArrowWriter, sources/warc_ds.py): documents
    synthesize to pages entirely in Catalyst (no driver loop), export
    through the registered sink — md5-sharded, in-shard sorted, gzip
    member per record, two-phase tmp→rename commit — and the rollup is
    computed from the READ-BACK of those shards through the connector.
    The DuckDB oracle recomputes everything analytically from
    documents and never sees a WARC byte, so the sink's record
    serialization, the commit protocol, the reader's member splitting
    AND the html byte-identity (bytes_total over re-encoded text) are
    all on the hook end-to-end."""
    import tempfile

    from ultraviolet_spark.sources.warc_ds import (
        read_warc_ds, write_warc_ds)

    pages = _t(spark, sf_dir, "documents").select(
        F.concat(F.lit("https://b"), F.col("doc_id") % 7,
                 F.lit(".example.org/p/"), F.col("doc_id")).alias("url"),
        F.timestamp_seconds(F.lit(1767225600) + F.col("doc_id"))
         .alias("warc_ts"),
        F.encode("text", "UTF-8").alias("html"),
        F.when(F.col("doc_id") % 3 == 0, 404).otherwise(200)
         .cast("int").alias("http_status"))
    d = tempfile.mkdtemp(prefix="uv_q233_")
    write_warc_ds(pages, d, num_shards=6)
    back = read_warc_ds(spark, d)
    return (back.select(
                F.regexp_extract("url", r"^https://(b\d+)\.", 1)
                 .alias("bucket"),
                "http_status", "html", "warc_ts")
            .groupBy("bucket")
            .agg(F.count("*").cast("long").alias("n_pages"),
                 F.sum((F.col("http_status") == 200).cast("long"))
                  .alias("n_ok"),
                 F.sum(F.octet_length("html")).cast("long")
                  .alias("bytes_total"),
                 F.min("warc_ts").alias("first_crawl"),
                 F.max("warc_ts").alias("last_crawl")))


@q("q234_entity_resolution", """
WITH RECURSIVE v AS (
  SELECT DISTINCT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS w
  FROM documents WHERE length(trim(text)) > 0),
vw AS (SELECT w FROM v WHERE length(w) >= 3),
nm AS (SELECT a.w || '-' || b.w AS name FROM vw a JOIN vw b ON a.w < b.w),
var AS (SELECT substr(name, 1, 3) || substr(name, 5) AS name FROM nm),
rec AS (SELECT DISTINCT name
        FROM (SELECT name FROM nm UNION ALL SELECT name FROM var)),
pairs AS (
  SELECT a.name AS na, b.name AS nb
  FROM rec a JOIN rec b ON a.name < b.name
  WHERE levenshtein(a.name, b.name) <= 1
    AND round(jaro_winkler_similarity(a.name, b.name), 6) >= 0.9),
edges AS (SELECT na AS u, nb AS v FROM pairs
          UNION SELECT nb, na FROM pairs),
reach AS (
  SELECT u, v FROM edges
  UNION
  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u),
comp AS (SELECT u AS node, LEAST(u, MIN(v)) AS component FROM reach GROUP BY u)
SELECT component AS cluster_id,
       CAST(COUNT(*) AS BIGINT) AS n_members,
       string_agg(node, '|' ORDER BY node) AS members
FROM comp GROUP BY component
HAVING COUNT(*) >= 2
""")
def q234(spark, sf_dir):
    """End-to-end entity resolution / record linkage: dirty records are
    synthesized deterministically (vocabulary word-pair names + a
    4th-char-deleted typo variant of each), then resolved by the full
    composed pipeline — FastSS deletion-neighborhood blocking (exact
    lev ≤ 1 candidates, no cartesian), Arrow-batched Jaro–Winkler
    scoring on candidates only, jw ≥ 0.9 match edges, distributed
    transitive closure, canonical keeper per entity.  The oracle
    replays every stage independently: DuckDB's C++ levenshtein +
    jaro_winkler_similarity over brute-force all-pairs and a recursive
    CTE for the closure — a different blocking mechanism (exhaustive)
    with the same exact contract, so one wrong candidate, score,
    threshold verdict or closure step diverges the hash."""
    from ultraviolet_spark.operators.fuzzy import entity_resolve

    d = _t(spark, sf_dir, "documents")
    words = (d.filter(F.length(F.trim("text")) > 0)
             .select(F.explode(F.split(F.lower(F.trim(F.col("text"))),
                                       r"\s+")).alias("w"))
             .filter(F.length("w") >= 3).distinct())
    a = words.select(F.col("w").alias("w1"))
    b = words.select(F.col("w").alias("w2"))
    names = (a.join(b, F.col("w1") < F.col("w2"))
             .select(F.concat_ws("-", "w1", "w2").alias("name")))
    variants = names.select(
        F.concat(F.substring("name", 1, 3),
                 F.expr("substring(name, 5)")).alias("name"))
    records = names.union(variants).distinct()
    return entity_resolve(records, col="name", threshold=0.9, max_dist=1)


@q("q235_kneser_ney_ce", """
WITH t AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS w
  FROM documents WHERE length(trim(text)) > 0),
bg AS (
  SELECT doc_id, w[i] AS w1, w[i+1] AS w2
  FROM (SELECT doc_id, w, unnest(generate_series(1, len(w) - 1)) AS i
        FROM t WHERE len(w) >= 2)),
m12 AS (SELECT w1, w2, COUNT(*) AS c12 FROM bg GROUP BY 1, 2),
h AS (SELECT w1, SUM(c12) AS c1, COUNT(*) AS n1f FROM m12 GROUP BY w1),
ct AS (SELECT w2, COUNT(*) AS n1b FROM m12 GROUP BY w2),
tt AS (SELECT COUNT(*) AS nbb FROM m12),
v AS (SELECT COUNT(DISTINCT u) AS vsz
      FROM (SELECT unnest(w) AS u FROM t)),
s AS (
  SELECT doc_id,
    CAST(round(ln(
      CAST(GREATEST(4 * c12 - 3, 0) AS DOUBLE) / CAST(4 * c1 AS DOUBLE)
      + (CAST(3 * n1f AS DOUBLE) / CAST(4 * c1 AS DOUBLE))
        * (CAST(n1b + 1 AS DOUBLE) / CAST(nbb + vsz + 1 AS DOUBLE))
    ) * 1e6) AS BIGINT) AS lp_u
  FROM bg JOIN m12 USING (w1, w2) JOIN h USING (w1) JOIN ct USING (w2),
       tt, v),
a AS (SELECT doc_id, COUNT(*) AS nb,
             round(-SUM(lp_u) / (COUNT(*) * 1e6), 6) AS ce
      FROM s GROUP BY doc_id)
SELECT d.doc_id, CAST(COALESCE(nb, 0) AS BIGINT) AS n_bigrams,
       COALESCE(ce, 0.0) AS kn_cross_entropy
FROM documents d LEFT JOIN a USING (doc_id)
""")
def q235(spark, sf_dir):
    """Interpolated Kneser–Ney bigram cross-entropy per document — the
    smoothing family the real CCNet/KenLM perplexity filter uses,
    complementing q86's add-k baseline: absolute discount D=3/4 kept as
    integers so every probability is a fixed composition of
    exactly-rounded IEEE divisions over exact int64 counts, continuation
    probability from distinct-HISTORY counts (the KN insight), +1/(V+1)
    OOV floor, per-bigram ln snapped to integer micro-nats before the
    order-independent sum.  The oracle replays the identical fixed IEEE
    sequence; self-scoring here, so every history is seen (the unseen-
    history backoff branch is covered by the separate-model pytest)."""
    return X.kn_cross_entropy(_t(spark, sf_dir, "documents"))


@q("q236_bitmap_index", """
WITH t AS (
  SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\\s+')) AS token
  FROM documents WHERE length(trim(text)) > 0),
td AS (SELECT DISTINCT token, doc_id FROM t),
top6 AS (SELECT token, COUNT(*) AS df FROM td GROUP BY token
         ORDER BY df DESC, token ASC LIMIT 6),
pr AS (SELECT a.token AS w1, a.df AS df1, b.token AS w2, b.df AS df2
       FROM top6 a JOIN top6 b ON a.token < b.token),
bo AS (SELECT pr.w1, pr.w2, COUNT(*) AS n_both
       FROM pr
       JOIN td x ON x.token = pr.w1
       JOIN td y ON y.token = pr.w2 AND y.doc_id = x.doc_id
       GROUP BY pr.w1, pr.w2)
SELECT w1, w2,
       CAST(df1 AS BIGINT) AS df1, CAST(df2 AS BIGINT) AS df2,
       CAST(COALESCE(n_both, 0) AS BIGINT) AS n_both,
       CAST(df1 - COALESCE(n_both, 0) AS BIGINT) AS n_w1_not_w2,
       CAST(df1 + df2 - COALESCE(n_both, 0) AS BIGINT) AS n_either,
       round(CAST(COALESCE(n_both, 0) AS DOUBLE)
             / CAST(df1 + df2 - COALESCE(n_both, 0) AS DOUBLE), 6) AS jaccard
FROM pr LEFT JOIN bo USING (w1, w2)
""")
def q236(spark, sf_dir):
    """Chunked-bitmap boolean retrieval (roaring-lite): postings for the
    top-6 document-frequency tokens are built as 63-bit words — ONE
    map-side-combined bit_or shuffle on (token, chunk), bit 63 never
    set so Spark and DuckDB int64 semantics agree — and every pairwise
    AND / ANDNOT / OR cardinality plus Jaccard is computed from
    bit_count over a chunk equi-join, no doc id ever materialized.
    The oracle is a DIFFERENT mechanism end-to-end: exact DISTINCT
    (token, doc) set joins with inclusion-exclusion for OR/ANDNOT —
    one wrong bit in any word, a missed sparse chunk on either side of
    the full-outer merge, or a sign-bit overflow diverges the hash."""
    from ultraviolet_spark.operators.index import (
        bitmap_bool_counts, bitmap_postings)

    d = _t(spark, sf_dir, "documents").filter(
        F.length(F.trim("text")) > 0)
    td = d.select(
        "doc_id",
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+"))
         .alias("token"))
    top6 = (td.groupBy("token")
            .agg(F.count_distinct("doc_id").cast("long").alias("df"))
            .orderBy(F.desc("df"), F.asc("token")).limit(6))
    a = top6.select(F.col("token").alias("w1"), F.col("df").alias("df1"))
    b = top6.select(F.col("token").alias("w2"), F.col("df").alias("df2"))
    pairs = a.join(b, F.col("w1") < F.col("w2"))   # 15-row metadata frame
    bm = bitmap_postings(
        td.join(F.broadcast(top6.select("token")), "token", "semi"),
        id_col="doc_id")
    counts = bitmap_bool_counts(bm, pairs.select("w1", "w2"))
    # df1/df2 arrive twice — from the pair frame (exact distinct counts)
    # and from the bitmap bit_count sums; returning the BITMAP ones keeps
    # the whole row on the bitmap hook, the oracle recomputes exactly
    return counts.select("w1", "w2", "df1", "df2", "n_both",
                         "n_w1_not_w2", "n_either", "jaccard")


@q("q237_cusum_changepoints", """
WITH e AS (
  SELECT user_id, ts, event_id,
         CAST(round(value * 100) AS BIGINT) AS x,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn
  FROM events),
b AS (
  SELECT *, SUM(CASE WHEN rn <= 3 THEN x ELSE 0 END)
              OVER (PARTITION BY user_id) AS base
  FROM e),
p AS (
  SELECT *,
    SUM(CASE WHEN rn > 3 THEN 3 * x - base - 3 * 100 ELSE 0 END)
      OVER w AS pu,
    SUM(CASE WHEN rn > 3 THEN base - 3 * x - 3 * 100 ELSE 0 END)
      OVER w AS pd
  FROM b
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
s AS (
  SELECT *,
    CASE WHEN rn > 3 THEN pu - LEAST(MIN(pu) OVER w, 0) ELSE 0 END AS su,
    CASE WHEN rn > 3 THEN pd - LEAST(MIN(pd) OVER w, 0) ELSE 0 END AS sd
  FROM p
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_obs,
       CAST(MAX(su) AS BIGINT) AS max_cusum_up,
       CAST(MAX(sd) AS BIGINT) AS max_cusum_down,
       CAST(SUM(CASE WHEN su > 3 * 2000 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_alarms_up,
       CAST(SUM(CASE WHEN sd > 3 * 2000 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_alarms_down,
       MIN(CASE WHEN su > 3 * 2000 OR sd > 3 * 2000 THEN ts END)
         AS first_alarm_ts
FROM s GROUP BY user_id
""")
def q237(spark, sf_dir):
    """Two-sided CUSUM changepoint detection per user over the event
    value series (Page 1954): the imperative recursion S_t = max(0,
    S_{t-1} + a_t) computed as its exact closed form P_t - min(P_0..
    P_t) over prefix sums — two window passes sharing one key
    exchange, everything in exact integer cents (baseline = SUM of the
    first 3 observations, deviations tested warmup-scaled so no float
    mean ever exists).  allowance 1.00, decision threshold 20.00.  The
    oracle replays the identical integer window algebra in DuckDB —
    one wrong prefix min, a leaked baseline row, or an off-by-one at
    the warmup boundary diverges max/alarm counts and the first-alarm
    timestamp."""
    from ultraviolet_spark.operators.windows import cusum_stats

    return cusum_stats(_t(spark, sf_dir, "events"),
                       by="user_id", order="ts", value_col="value",
                       warmup=3, allowance=100, threshold=2000,
                       scale=100, tiebreak="event_id")


def _hilbert_q238_sql() -> str:
    from ultraviolet_spark.plans.layout import hilbert_oracle_sql
    inner = hilbert_oracle_sql("l_partkey % 256", "l_suppkey % 256",
                               bits=8, source="lineitem")
    return f"""
SELECT (l_partkey % 256) // 16 AS xb, (l_suppkey % 256) // 16 AS yb,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(hkey) AS BIGINT) AS hkey_sum,
       CAST(MIN(hkey) AS BIGINT) AS hkey_min,
       CAST(MAX(hkey) AS BIGINT) AS hkey_max
FROM ({inner})
GROUP BY 1, 2
"""


@q("q238_hilbert_layout", _hilbert_q238_sql())
def q238(spark, sf_dir):
    """Hilbert-curve layout key over a 256×256 grid of (partkey,
    suppkey) — the better-locality alternative to q142's Z-order:
    consecutive Hilbert indices are ALWAYS grid neighbors, so a key
    range maps to one compact blob and per-file min/max bounds stay
    tight for 2-D box predicates.  The key is a pure scan-stage
    integer expression chain (per-level rotate/flip state machine,
    each level its own projection so the plan is linear in bits, not
    3^bits); the 16×16-block rollup puts EVERY row's key on the hook
    via sum/min/max.  The DuckDB oracle replays the identical algebra
    as an unrolled CTE chain generated by the same module — one wrong
    rotation, flip, or xor at any of the 8 levels diverges the sums."""
    from ultraviolet_spark.plans.layout import with_hilbert_key

    li = _t(spark, sf_dir, "lineitem").select(
        (F.col("l_partkey") % 256).alias("x"),
        (F.col("l_suppkey") % 256).alias("y"))
    keyed = with_hilbert_key(li, "x", "y", bits=8)
    return (keyed.groupBy(
                F.expr("x div 16").alias("xb"),
                F.expr("y div 16").alias("yb"))
            .agg(F.count("*").cast("long").alias("n_rows"),
                 F.sum("hkey").cast("long").alias("hkey_sum"),
                 F.min("hkey").cast("long").alias("hkey_min"),
                 F.max("hkey").cast("long").alias("hkey_max")))


def _kcore_q239_sql() -> str:
    from ultraviolet_spark.operators.graph import k_core_oracle_sql
    edges = ("SELECT doc_id % 101 AS src, "
             "(doc_id * doc_id + 1) % 101 AS dst FROM documents "
             "UNION SELECT doc_id % 101, "
             "(doc_id * doc_id * 3 + 2) % 101 FROM documents")
    return k_core_oracle_sql(edges, k=3, rounds=10)


@q("q239_k_core_domains", _kcore_q239_sql())
def q239(spark, sf_dir):
    """3-core of a deterministic 101-node domain link graph (Seidman
    peeling — the dense-hub / link-ring signal over a crawl's domain
    graph): 10 synchronous peel rounds, each two semi-joins of the
    shrinking survivor set plus one map-side-combined degree count —
    enough rounds to reach the true fixpoint at every tested SF (the
    sf0.01 cascade is 9 rounds deep: node removals keep dropping
    neighbors below k for 9 generations).  Quadratic-residue dst
    mixing gives the degree spread that makes peeling cascade.  The
    oracle replays the identical 10-round peel as unrolled CTEs — one
    premature or missed removal in ANY round propagates through every
    later round and diverges survivors and final degrees."""
    from ultraviolet_spark.operators.graph import k_core

    d = _t(spark, sf_dir, "documents").select("doc_id")
    e = (d.select((F.col("doc_id") % 101).alias("src"),
                  ((F.col("doc_id") * F.col("doc_id") + 1) % 101)
                  .alias("dst"))
         .union(d.select(
             (F.col("doc_id") % 101).alias("src"),
             ((F.col("doc_id") * F.col("doc_id") * 3 + 2) % 101)
             .alias("dst"))))
    return k_core(e, k=3, rounds=10)


@q("q240_arrow_ipc_roundtrip", """
SELECT doc_id % 4 AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       SUM((doc_id % 97) / 4.0) AS weight_sum,
       CAST(SUM(doc_id % 3 + 1) AS BIGINT) AS token_total,
       CAST(SUM(CASE WHEN doc_id % 5 = 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_null_notes,
       make_timestamp((1767225600 + MIN(doc_id)) * 1000000) AS first_ts,
       make_timestamp((1767225600 + MAX(doc_id)) * 1000000) AS last_ts
FROM documents GROUP BY doc_id % 4
""")
def q240(spark, sf_dir):
    """Arrow IPC (Feather v2) sink + source roundtrip: documents gain a
    float weight, a variable-length token array, a nullable note and a
    timestamp — every type family the connector polices — get written
    as md5-sharded, in-shard-sorted ``.arrow`` files through an
    EXPLICIT Arrow schema (never pandas inference: int64-with-NULL
    arrives as float64 in pandas and inference would silently write
    doubles), and the rollup is computed from the READ-BACK through the
    schema-verified scan.  The DuckDB oracle recomputes everything
    analytically from the parquet documents and never sees an IPC
    byte, so serialization, NULL fidelity, array round-tripping and
    timestamp precision are all on the hook.  Weights are quarters
    (exact binary fractions) so the double SUM is order-independent."""
    import tempfile

    from ultraviolet_spark.sources.arrowipc import arrow_ipc_roundtrip

    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        ((F.col("doc_id") % 97) / 4.0).alias("weight"),
        F.sequence(F.lit(1), F.col("doc_id") % 3 + 1).alias("tokens"),
        F.when(F.col("doc_id") % 5 == 0, F.lit(None).cast("string"))
         .otherwise(F.col("lang")).alias("note"),
        F.timestamp_seconds(F.lit(1767225600) + F.col("doc_id"))
         .alias("ts"))
    path = tempfile.mkdtemp(prefix="uv_q240_")
    back = arrow_ipc_roundtrip(d, path, key_col="doc_id", n_shards=5)
    return (back.groupBy((F.col("doc_id") % 4).alias("bucket"))
            .agg(F.count("*").cast("long").alias("n_rows"),
                 F.sum("weight").alias("weight_sum"),
                 F.sum(F.size("tokens")).cast("long").alias("token_total"),
                 F.sum(F.col("note").isNull().cast("long")).cast("long")
                  .alias("n_null_notes"),
                 F.min("ts").alias("first_ts"),
                 F.max("ts").alias("last_ts")))
