"""Registry chunk: drift, reliability, trend tests (q321-q333).

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

@q("q321_hellinger_drift", """
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
             (SELECT SUM(cur_n) FROM c) AS ct)
SELECT r.bin_idx, CAST(r.ref_n AS BIGINT) AS ref_n,
       CAST(COALESCE(c.cur_n, 0) AS BIGINT) AS cur_n,
       round(sqrt((CAST(r.ref_n + 1 AS DOUBLE) / (t.rt + 10))
                  * (CAST(COALESCE(c.cur_n, 0) + 1 AS DOUBLE)
                     / (t.ct + 10))), 12) AS bc_term
FROM r LEFT JOIN c USING (bin_idx), t
""")
def q321(spark, sf_dir):
    """Hellinger/Bhattacharyya drift between the event-log halves —
    the BOUNDED companion to q175's PSI (BC ∈ [0,1] by
    Cauchy–Schwarz, Hellinger √(1−BC) a proper metric, so thresholds
    transfer across features of different scales); identical
    reference-decile binning and smoothing, per-bin √(p·q) rounded
    to 12."""
    from ultraviolet_spark.operators.stats import hellinger_drift

    e = _t(spark, sf_dir, "events")
    split = F.lit("2024-01-16").cast("timestamp_ntz")
    return hellinger_drift(e.filter(F.col("ts") < split),
                           e.filter(F.col("ts") >= split),
                           value_col="value", bins=10)


@q("q322_cochrans_q", """
WITH per AS (
  SELECT user_id,
    MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS c0,
    MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS c1,
    MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS c2
  FROM events GROUP BY user_id),
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
    CAST(SUM(c0 + c1 + c2) AS BIGINT) AS T,
    CAST(SUM((c0 + c1 + c2) * (c0 + c1 + c2)) AS BIGINT) AS R2,
    CAST(SUM(c0) AS BIGINT) AS C0,
    CAST(SUM(c1) AS BIGINT) AS C1,
    CAST(SUM(c2) AS BIGINT) AS C2
  FROM per)
SELECT n, CAST(3 AS INT) AS k,
  round(CAST(2 * (CAST(3 * C0 - T AS HUGEINT) * (3 * C0 - T)
                  + CAST(3 * C1 - T AS HUGEINT) * (3 * C1 - T)
                  + CAST(3 * C2 - T AS HUGEINT) * (3 * C2 - T))
             AS DOUBLE)
        / NULLIF(CAST(3 * (3 * CAST(T AS HUGEINT) - R2) AS DOUBLE), 0),
        6) AS q
FROM agg
""")
def q322(spark, sf_dir):
    """Cochran's Q across the three per-user ever-did indicators
    (click / view / purchase): the k-condition extension of q318's
    McNemar — equal marginal rates across k paired binaries, with
    the centered squares kept in exact integers (k·C_j − T) and
    unanimous units contributing zero, the only-discordance-informs
    rule generalized."""
    from ultraviolet_spark.operators.stats import cochrans_q

    per = (_t(spark, sf_dir, "events")
           .groupBy("user_id")
           .agg(*[(F.max(F.when(F.col("event_type") == t, 1)
                         .otherwise(0)) == 1).alias(a)
                  for t, a in [("click", "a"), ("view", "b"),
                               ("purchase", "c")]]))
    return cochrans_q(per, cols=["a", "b", "c"]).select("n", "k", "q")


@q("q323_cronbach_alpha", """
WITH per AS (
  SELECT user_id,
    CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
         AS DOUBLE) AS x0,
    CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
         AS DOUBLE) AS x1,
    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
         AS DOUBLE) AS x2
  FROM events GROUP BY user_id),
m AS (
  SELECT CAST(round(x0 * 1e6) AS BIGINT) AS m0,
         CAST(round(x1 * 1e6) AS BIGINT) AS m1,
         CAST(round(x2 * 1e6) AS BIGINT) AS m2
  FROM per),
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
    SUM(CAST(m0 + m1 + m2 AS HUGEINT)) AS st,
    SUM(CAST(m0 + m1 + m2 AS HUGEINT) * (m0 + m1 + m2)) AS stt,
    SUM(CAST(m0 AS HUGEINT)) AS s0,
    SUM(CAST(m0 AS HUGEINT) * m0) AS ss0,
    SUM(CAST(m1 AS HUGEINT)) AS s1,
    SUM(CAST(m1 AS HUGEINT) * m1) AS ss1,
    SUM(CAST(m2 AS HUGEINT)) AS s2,
    SUM(CAST(m2 AS HUGEINT) * m2) AS ss2
  FROM m)
SELECT n, CAST(3 AS INT) AS k,
  CASE WHEN CAST(n * stt - st * st AS DOUBLE) > 0 THEN
    round(1.5 * (1.0
                 - CAST((n * ss0 - s0 * s0) + (n * ss1 - s1 * s1)
                        + (n * ss2 - s2 * s2) AS DOUBLE)
                   / NULLIF(CAST(n * stt - st * st AS DOUBLE), 0)), 6)
  END AS alpha
FROM agg
""")
def q323(spark, sf_dir):
    """Cronbach's α over the three per-user activity counts (click /
    view / purchase as a 3-item 'engagement scale'): do the items
    move together enough to average into one score?  Exact
    DECIMAL(38,0) moments of the items and the row sum in one pass,
    per-item variance terms exact integers summed order-
    independently, one fixed-order double ratio."""
    from ultraviolet_spark.operators.stats import cronbach_alpha

    per = (_t(spark, sf_dir, "events")
           .groupBy("user_id")
           .agg(*[F.sum(F.when(F.col("event_type") == t, 1)
                        .otherwise(0)).cast("double").alias(a)
                  for t, a in [("click", "x0"), ("view", "x1"),
                               ("purchase", "x2")]]))
    return cronbach_alpha(per, cols=["x0", "x1", "x2"])


def _q324_sql() -> str:
    """Friedman/W oracle: per-user doubled within-block ranks of the
    three activity counts from the 9 pairwise comparisons, then the
    all-integer tie-corrected statistic."""
    items = ["m0", "m1", "m2"]
    rank_exprs = []
    for j, mj in enumerate(items):
        below = " + ".join(
            f"(CASE WHEN {ml} < {mj} THEN 1 ELSE 0 END)"
            for ml in items)
        tied = " + ".join(
            f"(CASE WHEN {ml} = {mj} THEN 1 ELSE 0 END)"
            for ml in items)
        rank_exprs.append(
            f"CAST(2 * ({below}) + ({tied}) + 1 AS BIGINT) AS a{j}")
    k = 3
    num = " + ".join(
        f"(CAST(R{j} AS HUGEINT) - CAST(n AS HUGEINT) * {k + 1})"
        f" * (CAST(R{j} AS HUGEINT) - CAST(n AS HUGEINT) * {k + 1})"
        for j in range(k))
    return f"""
WITH per AS (
  SELECT user_id,
    CAST(round(CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0
               END) AS DOUBLE) * 1e6) AS BIGINT) AS m0,
    CAST(round(CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0
               END) AS DOUBLE) * 1e6) AS BIGINT) AS m1,
    CAST(round(CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
               END) AS DOUBLE) * 1e6) AS BIGINT) AS m2
  FROM events GROUP BY user_id),
rk AS (SELECT {', '.join(rank_exprs)} FROM per),
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
    SUM(CAST(a0 AS HUGEINT)) AS R0,
    SUM(CAST(a1 AS HUGEINT)) AS R1,
    SUM(CAST(a2 AS HUGEINT)) AS R2,
    SUM(CAST(a0 AS HUGEINT) * a0 + CAST(a1 AS HUGEINT) * a1
        + CAST(a2 AS HUGEINT) * a2) AS A2
  FROM rk)
SELECT n, CAST({k} AS INT) AS k,
  round(CAST({k - 1} * ({num}) AS DOUBLE)
        / NULLIF(CAST(A2 - CAST(n AS HUGEINT)
                      * {k * (k + 1) * (k + 1)} AS DOUBLE), 0), 6)
    AS chi2,
  round(CAST({k - 1} * ({num}) AS DOUBLE)
        / NULLIF(CAST(A2 - CAST(n AS HUGEINT)
                      * {k * (k + 1) * (k + 1)} AS DOUBLE), 0)
        / NULLIF(CAST(n AS DOUBLE) * {float(k - 1)}, 0), 6) AS w
FROM agg
"""


@q("q324_friedman_activity", _q324_sql())
def q324(spark, sf_dir):
    """Friedman test + Kendall's W over each user's within-block
    ranking of (click, view, purchase) counts: unit-level activity
    offsets cancel by construction where raw-value ANOVA sees only
    the offsets; doubled ranks 2C+t+1 from the 9 in-plan pairwise
    comparisons, tie-corrected statistic in pure integer arithmetic,
    one double division."""
    from ultraviolet_spark.operators.stats import friedman_test

    per = (_t(spark, sf_dir, "events")
           .groupBy("user_id")
           .agg(*[F.sum(F.when(F.col("event_type") == t, 1)
                        .otherwise(0)).cast("double").alias(a)
                  for t, a in [("click", "x0"), ("view", "x1"),
                               ("purchase", "x2")]]))
    return friedman_test(per, cols=["x0", "x1", "x2"])


@q("q325_runs_test", """
WITH base AS (
  SELECT user_id AS k, ts, event_id,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS x
  FROM events),
st AS (
  SELECT k, x,
         CASE WHEN lag(x) OVER (PARTITION BY k ORDER BY ts, event_id)
                IS DISTINCT FROM x THEN 1 ELSE 0 END AS nw
  FROM base),
g AS (
  SELECT k, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS n1,
         CAST(SUM(nw) AS BIGINT) AS runs
  FROM st GROUP BY k),
g2 AS (SELECT k, n, n1, CAST(n - n1 AS BIGINT) AS n0, runs FROM g)
SELECT k AS user_id, n, n1, n0, runs,
  CASE WHEN n1 > 0 AND n0 > 0 AND n >= 2
        AND CAST(2 * CAST(n1 AS HUGEINT) * n0 AS DOUBLE)
            * (CAST(2 * CAST(n1 AS HUGEINT) * n0 AS DOUBLE)
               - CAST(n AS DOUBLE))
            / NULLIF(CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                     * (CAST(n AS DOUBLE) - 1.0), 0) > 0 THEN
    round((CAST(runs AS DOUBLE)
           - (1.0 + CAST(2 * CAST(n1 AS HUGEINT) * n0 AS DOUBLE)
                    / NULLIF(CAST(n AS DOUBLE), 0)))
          / NULLIF(sqrt(CAST(2 * CAST(n1 AS HUGEINT) * n0 AS DOUBLE)
                        * (CAST(2 * CAST(n1 AS HUGEINT) * n0 AS DOUBLE)
                           - CAST(n AS DOUBLE))
                        / NULLIF(CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                                 * (CAST(n AS DOUBLE) - 1.0), 0)), 0),
          6)
  END AS z
FROM g2
""")
def q325(spark, sf_dir):
    """Wald–Wolfowitz runs test on each user's purchase/non-purchase
    event sequence (ordered by ts, event_id): do purchases cluster in
    time or alternate randomly — the sequence property the marginal
    purchase rate can't see; exact integer run counts from one lag
    pass, 2n₁n₀ in DECIMAL(38,0), fixed-order z."""
    from ultraviolet_spark.operators.stats import runs_test

    return runs_test(_t(spark, sf_dir, "events"), by="user_id",
                     order_col="ts", tiebreak_col="event_id",
                     flag_expr="event_type = 'purchase'")


@q("q326_durbin_watson", """
WITH base AS (
  SELECT user_id AS k,
         CAST(round(epoch_us(ts) / 3.6e9 * 1e6) AS BIGINT) AS x,
         CAST(round(value * 1e6) AS BIGINT) AS y,
         ts, event_id
  FROM events WHERE event_type = 'purchase' AND value IS NOT NULL),
fit AS (
  SELECT k, CAST(COUNT(*) AS BIGINT) AS n,
         SUM(CAST(x AS HUGEINT)) AS sx, SUM(CAST(y AS HUGEINT)) AS sy,
         SUM(CAST(x AS HUGEINT) * x) AS sxx,
         SUM(CAST(x AS HUGEINT) * y) AS sxy
  FROM base GROUP BY k),
ab AS (
  SELECT k, n,
    (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
     - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
    / NULLIF(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
             - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE), 0) AS b,
    sx, sy
  FROM fit),
ab2 AS (
  SELECT k, n, b,
         (CAST(sy AS DOUBLE) - b * CAST(sx AS DOUBLE))
           / NULLIF(CAST(n AS DOUBLE), 0) AS a,
         CAST(round(b * 1e6) AS BIGINT) AS slope_micro
  FROM ab),
res AS (
  SELECT base.k, ab2.n, ab2.slope_micro,
         CAST(round(CAST(y AS DOUBLE)
                    - (ab2.a + ab2.b * CAST(x AS DOUBLE))) AS BIGINT)
           AS e,
         ts, event_id
  FROM base JOIN ab2 ON ab2.k = base.k),
lagd AS (
  SELECT k, n, slope_micro, e,
         lag(e) OVER (PARTITION BY k ORDER BY ts, event_id) AS ep
  FROM res),
g AS (
  SELECT k, MAX(n) AS n, MAX(slope_micro) AS slope_micro,
         SUM(CAST(e AS HUGEINT) * e) AS see,
         SUM(CASE WHEN ep IS NOT NULL
             THEN CAST(e - ep AS HUGEINT) * (e - ep) ELSE 0 END)
           AS sdd
  FROM lagd GROUP BY k)
SELECT k AS user_id, CAST(n AS BIGINT) AS n, slope_micro,
  CASE WHEN CAST(see AS DOUBLE) > 0 AND slope_micro IS NOT NULL THEN
    round(CAST(sdd AS DOUBLE) / NULLIF(CAST(see AS DOUBLE), 0), 6)
  END AS dw
FROM g
""")
def q326(spark, sf_dir):
    """Durbin–Watson statistic of each user's purchase-value OLS
    residuals (q309's trend frame): DW ≈ 2 = trend is the whole
    story, → 0 = stretches of systematic over/under (missing
    regime), → 4 = alternation; exact-sum OLS, residuals µ-snapped
    so both DW sums are exact integers, one double division."""
    from ultraviolet_spark.operators.stats import durbin_watson_by_key

    p = (_t(spark, sf_dir, "events")
         .filter((F.col("event_type") == "purchase")
                 & F.col("value").isNotNull())
         .select("user_id", "ts", "event_id",
                 (F.unix_micros(F.col("ts").cast("timestamp"))
                  / F.lit(3.6e9)).alias("xh"), "value"))
    return durbin_watson_by_key(p, by="user_id", x_col="xh",
                                y_col="value", order_col="ts",
                                tiebreak_col="event_id")


@q("q327_sorted_neighborhood", """
WITH base AS (
  SELECT doc_id AS id,
         substr(regexp_replace(lower(text), '[^a-z0-9]', '', 'g'),
                1, 24) AS s
  FROM documents WHERE text IS NOT NULL),
ranked AS (
  SELECT id, row_number() OVER (ORDER BY s, id) AS rk FROM base),
l AS (SELECT id AS id_a, rk AS rank_a, rk + t.o AS rk2
      FROM ranked, (SELECT * FROM (VALUES (1), (2)) v(o)) t)
SELECT l.id_a, r.id AS id_b, CAST(l.rank_a AS BIGINT) AS rank_a,
       CAST(r.rk AS BIGINT) AS rank_b
FROM l JOIN ranked r ON r.rk = l.rk2
""")
def q327(spark, sf_dir):
    """Sorted-neighborhood blocking over the documents table (fuzzy
    key = first 24 alphanumeric chars of the lowercased text, window
    2): the classic O(n·w) ER candidate generator between exact
    blocking and all-pairs — near-miss keys land adjacent in the
    sort; two-phase monotone-prefix-bucket rank (no single-partition
    window), pairs from one explode+equi-join, never a range join."""
    from ultraviolet_spark.operators.fuzzy import (
        sorted_neighborhood_pairs,
    )

    d = (_t(spark, sf_dir, "documents")
         .filter(F.col("text").isNotNull()))
    return sorted_neighborhood_pairs(
        d, id_col="doc_id",
        sort_expr=("substring(regexp_replace(lower(text), "
                   "'[^a-z0-9]', ''), 1, 24)"),
        window=2)


@q("q328_wilson_intervals", """
WITH g AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN value IS NOT NULL AND value > 50
                  THEN 1 ELSE 0 END) AS BIGINT) AS successes
  FROM events GROUP BY event_type)
SELECT event_type, n, successes,
  round(CAST(successes AS DOUBLE) / CAST(n AS DOUBLE), 6) AS p_hat,
  round((CAST(successes AS DOUBLE) / CAST(n AS DOUBLE)
         + (1.96 * 1.96) / (2.0 * CAST(n AS DOUBLE)))
        / (1.0 + (1.96 * 1.96) / CAST(n AS DOUBLE))
        - (1.96 * sqrt(CAST(successes AS DOUBLE) / CAST(n AS DOUBLE)
                       * (1.0 - CAST(successes AS DOUBLE)
                                / CAST(n AS DOUBLE))
                       / CAST(n AS DOUBLE)
                       + (1.96 * 1.96)
                         / (4.0 * CAST(n AS DOUBLE)
                            * CAST(n AS DOUBLE))))
          / (1.0 + (1.96 * 1.96) / CAST(n AS DOUBLE)), 6)
    AS wilson_lo,
  round((CAST(successes AS DOUBLE) / CAST(n AS DOUBLE)
         + (1.96 * 1.96) / (2.0 * CAST(n AS DOUBLE)))
        / (1.0 + (1.96 * 1.96) / CAST(n AS DOUBLE))
        + (1.96 * sqrt(CAST(successes AS DOUBLE) / CAST(n AS DOUBLE)
                       * (1.0 - CAST(successes AS DOUBLE)
                                / CAST(n AS DOUBLE))
                       / CAST(n AS DOUBLE)
                       + (1.96 * 1.96)
                         / (4.0 * CAST(n AS DOUBLE)
                            * CAST(n AS DOUBLE))))
          / (1.0 + (1.96 * 1.96) / CAST(n AS DOUBLE)), 6)
    AS wilson_hi
FROM g
""")
def q328(spark, sf_dir):
    """Wilson score intervals for the per-event-type share of
    high-value (> 50) events: the proportion interval that stays
    inside [0,1] and stays honest at the boundaries where the Wald
    interval collapses to zero width; exact per-type counts, every
    derived quantity a fixed-order double with the z=1.96 literal
    shared verbatim."""
    from ultraviolet_spark.operators.stats import wilson_intervals

    return wilson_intervals(
        _t(spark, sf_dir, "events"), by="event_type",
        success_expr="value IS NOT NULL AND value > 50")


@q("q329_binary_segmentation", """
WITH hr AS (
  SELECT event_type AS k, date_trunc('hour', ts) AS o,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY event_type, date_trunc('hour', ts)),
b AS (SELECT k, c * 1000000 AS v, o FROM hr),
r AS (
  SELECT k,
         CAST(row_number() OVER w AS BIGINT) AS i,
         SUM(v) OVER (w ROWS UNBOUNDED PRECEDING) AS s,
         SUM(v) OVER (PARTITION BY k) AS sn,
         CAST(COUNT(*) OVER (PARTITION BY k) AS BIGINT) AS n
  FROM b WINDOW w AS (PARTITION BY k ORDER BY o)),
c1 AS (
  SELECT k, i, s, sn, n,
    round(CAST(s * n - i * sn AS DOUBLE)
          * CAST(s * n - i * sn AS DOUBLE)
          / CAST(n AS DOUBLE) / CAST(i AS DOUBLE)
          / CAST(n - i AS DOUBLE)) AS g
  FROM r WHERE i < n),
w1 AS (
  SELECT k, i AS tau1, g AS gain1, s AS s1, n
  FROM (SELECT *, row_number() OVER (PARTITION BY k
                                     ORDER BY g DESC, i ASC) AS p
        FROM c1)
  WHERE p = 1),
j AS (
  SELECT r.k, w1.tau1,
    CASE WHEN r.i <= w1.tau1 THEN 0 ELSE 1 END AS seg,
    CASE WHEN r.i <= w1.tau1 THEN r.i ELSE r.i - w1.tau1 END AS ir,
    CASE WHEN r.i <= w1.tau1 THEN w1.tau1 ELSE r.n - w1.tau1 END AS m,
    CASE WHEN r.i <= w1.tau1 THEN w1.s1 ELSE r.sn - w1.s1 END AS z,
    CASE WHEN r.i <= w1.tau1 THEN r.s ELSE r.s - w1.s1 END AS p
  FROM r JOIN w1 ON w1.k = r.k),
c2 AS (
  SELECT k, tau1, seg, ir,
    round(CAST(p * m - ir * z AS DOUBLE)
          * CAST(p * m - ir * z AS DOUBLE)
          / CAST(m AS DOUBLE) / CAST(ir AS DOUBLE)
          / CAST(m - ir AS DOUBLE)) AS g2
  FROM j WHERE ir < m),
w2 AS (
  SELECT k,
    CAST(MAX(CASE WHEN seg = 0 THEN ir END) AS BIGINT) AS tau_l,
    MAX(CASE WHEN seg = 0 THEN g2 END) AS gain_l,
    CAST(MAX(CASE WHEN seg = 1 THEN ir + tau1 END) AS BIGINT)
      AS tau_r,
    MAX(CASE WHEN seg = 1 THEN g2 END) AS gain_r
  FROM (SELECT *, row_number() OVER (PARTITION BY k, seg
                                     ORDER BY g2 DESC, ir ASC) AS p2
        FROM c2)
  WHERE p2 = 1 GROUP BY k)
SELECT w1.k AS event_type, w1.n, w1.tau1, w1.gain1,
       w2.tau_l, w2.gain_l, w2.tau_r, w2.gain_r
FROM w1 LEFT JOIN w2 ON w2.k = w1.k
""")
def q329(spark, sf_dir):
    """Depth-2 binary segmentation of per-type hourly event counts
    (up to 3 change points): the multiple-change-point extension of
    q280's single detector — both rounds share one prefix-sum pass,
    every discriminant an exact DECIMAL(38,0) integer, gains rounded
    before each argmax, ties to smallest τ; sub-segments shorter
    than 2 report NULL."""
    from ultraviolet_spark.operators.stats import binary_segmentation

    hr = (_t(spark, sf_dir, "events")
          .groupBy("event_type",
                   F.date_trunc("hour", F.col("ts")).alias("hh"))
          .agg(F.count("*").cast("double").alias("c")))
    return binary_segmentation(hr, key_col="event_type",
                               order_col="hh", value_col="c",
                               tiebreak_col="hh")


@q("q330_mann_kendall", """
WITH base AS (
  SELECT user_id AS k, ts, event_id,
         CAST(round(value * 1e6) AS BIGINT) AS v
  FROM events WHERE event_type = 'purchase' AND value IS NOT NULL),
np AS (SELECT k, CAST(COUNT(*) AS BIGINT) AS n FROM base GROUP BY k),
pairs AS (
  SELECT l.k,
         CASE WHEN r.v > l.v THEN 1 WHEN r.v < l.v THEN -1 ELSE 0 END
           AS sg
  FROM base l JOIN base r
    ON l.k = r.k AND (l.ts < r.ts
                      OR (l.ts = r.ts AND l.event_id < r.event_id))),
sa AS (SELECT k, CAST(SUM(sg) AS BIGINT) AS s FROM pairs GROUP BY k),
ties AS (
  SELECT k, CAST(SUM(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tt
  FROM (SELECT k, v, CAST(COUNT(*) AS BIGINT) AS t
        FROM base GROUP BY k, v)
  GROUP BY k),
g AS (
  SELECT np.k, np.n, COALESCE(sa.s, 0) AS s,
         CAST(np.n * (np.n - 1) * (2 * np.n + 5) - ties.tt AS BIGINT)
           AS var18
  FROM np LEFT JOIN sa ON sa.k = np.k JOIN ties ON ties.k = np.k)
SELECT k AS user_id, n, CAST(s AS BIGINT) AS s, var18,
  CASE WHEN var18 > 0 THEN
    round(CASE WHEN s > 0 THEN (CAST(s AS DOUBLE) - 1.0)
                    / NULLIF(sqrt(CAST(var18 AS DOUBLE) / 18.0), 0)
               WHEN s < 0 THEN (CAST(s AS DOUBLE) + 1.0)
                    / NULLIF(sqrt(CAST(var18 AS DOUBLE) / 18.0), 0)
               ELSE 0.0 END, 6)
  END AS z
FROM g
""")
def q330(spark, sf_dir):
    """Per-user Mann–Kendall trend test on purchase values over time:
    the hypothesis-test companion of q309's Theil–Sen slope — is
    there ANY monotone trend, distribution-free with exact
    tie-corrected variance (18·Var kept as an exact integer),
    continuity-corrected z; same-timestamp pairs are ordered by the
    unique event_id tiebreak (total order (ts, event_id)), so S is
    deterministic — see mann_kendall_by_key's docstring for how this
    relates to the textbook drop-same-time convention."""
    from ultraviolet_spark.operators.stats import mann_kendall_by_key

    p = (_t(spark, sf_dir, "events")
         .filter((F.col("event_type") == "purchase")
                 & F.col("value").isNotNull()))
    return mann_kendall_by_key(p, by="user_id", ts_col="ts",
                               value_col="value",
                               tiebreak_col="event_id")


@q("q331_bowker_symmetry", """
WITH o AS (
  SELECT user_id, event_type,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS ra,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rb
  FROM events),
fl AS (
  SELECT user_id,
         MAX(CASE WHEN ra = 1 THEN event_type END) AS a,
         MAX(CASE WHEN rb = 1 THEN event_type END) AS b
  FROM o GROUP BY user_id),
cells AS (
  SELECT a, b, CAST(COUNT(*) AS BIGINT) AS c
  FROM fl WHERE a IS NOT NULL AND b IS NOT NULL GROUP BY a, b),
up AS (SELECT a AS i, b AS j, c AS nij FROM cells WHERE a < b),
dn AS (SELECT b AS i, a AS j, c AS nji FROM cells WHERE a > b),
pairs AS (
  SELECT COALESCE(up.i, dn.i) AS i, COALESCE(up.j, dn.j) AS j,
         COALESCE(nij, 0) AS nij, COALESCE(nji, 0) AS nji
  FROM up FULL JOIN dn ON dn.i = up.i AND dn.j = up.j),
kk AS (SELECT CAST(COUNT(*) AS INT) AS k FROM
        (SELECT a AS c FROM cells UNION SELECT b FROM cells)),
nt AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM cells),
agg AS (
  SELECT CAST(COALESCE(SUM(CASE WHEN nij + nji > 0 THEN 1 ELSE 0
                            END), 0) AS BIGINT) AS n_pairs_used,
         CAST(COALESCE(SUM(COALESCE(
           CAST(round(CAST(nij - nji AS DOUBLE)
                      * CAST(nij - nji AS DOUBLE)
                      / NULLIF(CAST(nij + nji AS DOUBLE), 0) * 1e6)
                AS BIGINT), 0)), 0) AS BIGINT) AS b_micro
  FROM pairs)
SELECT n, k, n_pairs_used, b_micro,
  CASE WHEN n_pairs_used > 0 THEN
    round(CAST(b_micro AS DOUBLE) / 1e6, 6) END AS b
FROM nt, kk, agg
""")
def q331(spark, sf_dir):
    """Bowker's symmetry test on the (first event type → last event
    type) transition table per user: is every i→j start/end flow
    matched by j→i — McNemar generalized to k×k paired categories;
    exact integer numerators per unordered pair µ-snapped BEFORE the
    cross-pair sum, diagonals never contribute."""
    from ultraviolet_spark.operators.stats import bowker_test

    w_first = F.struct(F.col("ts"), F.col("event_id"))
    fl = (_t(spark, sf_dir, "events")
          .groupBy("user_id")
          .agg(F.min_by("event_type", w_first).alias("a"),
               F.max_by("event_type", w_first).alias("b")))
    return bowker_test(fl, a_col="a", b_col="b")


@q("q332_partial_correlation", """
WITH per AS (
  SELECT user_id,
    CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
         AS DOUBLE) AS x,
    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
         AS DOUBLE) AS y,
    CAST(COUNT(*) AS DOUBLE) AS z
  FROM events GROUP BY user_id),
m AS (
  SELECT CAST(round(x * 1e6) AS BIGINT) AS mx,
         CAST(round(y * 1e6) AS BIGINT) AS my,
         CAST(round(z * 1e6) AS BIGINT) AS mz
  FROM per),
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
    SUM(CAST(mx AS HUGEINT)) AS sx, SUM(CAST(my AS HUGEINT)) AS sy,
    SUM(CAST(mz AS HUGEINT)) AS sz,
    SUM(CAST(mx AS HUGEINT) * mx) AS sxx,
    SUM(CAST(my AS HUGEINT) * my) AS syy,
    SUM(CAST(mz AS HUGEINT) * mz) AS szz,
    SUM(CAST(mx AS HUGEINT) * my) AS sxy,
    SUM(CAST(mx AS HUGEINT) * mz) AS sxz,
    SUM(CAST(my AS HUGEINT) * mz) AS syz
  FROM m),
rr AS (
  SELECT n,
    CASE WHEN CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0
          AND CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
              - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) > 0 THEN
      (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
       - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
      / NULLIF(sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                       - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 0)
    END AS rxy,
    CASE WHEN CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0
          AND CAST(n AS DOUBLE) * CAST(szz AS DOUBLE)
              - CAST(sz AS DOUBLE) * CAST(sz AS DOUBLE) > 0 THEN
      (CAST(n AS DOUBLE) * CAST(sxz AS DOUBLE)
       - CAST(sx AS DOUBLE) * CAST(sz AS DOUBLE))
      / NULLIF(sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * (CAST(n AS DOUBLE) * CAST(szz AS DOUBLE)
                       - CAST(sz AS DOUBLE) * CAST(sz AS DOUBLE))), 0)
    END AS rxz,
    CASE WHEN CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
              - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) > 0
          AND CAST(n AS DOUBLE) * CAST(szz AS DOUBLE)
              - CAST(sz AS DOUBLE) * CAST(sz AS DOUBLE) > 0 THEN
      (CAST(n AS DOUBLE) * CAST(syz AS DOUBLE)
       - CAST(sy AS DOUBLE) * CAST(sz AS DOUBLE))
      / NULLIF(sqrt((CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                     - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))
                    * (CAST(n AS DOUBLE) * CAST(szz AS DOUBLE)
                       - CAST(sz AS DOUBLE) * CAST(sz AS DOUBLE))), 0)
    END AS ryz
  FROM agg)
SELECT n, round(rxy, 6) AS r_xy, round(rxz, 6) AS r_xz,
       round(ryz, 6) AS r_yz,
       round((rxy - rxz * ryz)
             / NULLIF(sqrt((1.0 - rxz * rxz) * (1.0 - ryz * ryz)), 0),
             6) AS r_xy_z
FROM rr
""")
def q332(spark, sf_dir):
    """Partial correlation of per-user click vs purchase counts
    controlling for total activity: how much of the click–purchase
    association survives once the common driver (overall activity)
    is partialled out — nine exact DECIMAL(38,0) sufficient
    statistics in one pass, every pairwise r and the partial formula
    fixed-order doubles, degenerate legs NULL."""
    from ultraviolet_spark.operators.stats import partial_correlation

    per = (_t(spark, sf_dir, "events")
           .groupBy("user_id")
           .agg(F.sum(F.when(F.col("event_type") == "click", 1)
                      .otherwise(0)).cast("double").alias("x"),
                F.sum(F.when(F.col("event_type") == "purchase", 1)
                      .otherwise(0)).cast("double").alias("y"),
                F.count("*").cast("double").alias("z")))
    return partial_correlation(per, x_col="x", y_col="y", z_col="z")


@q("q333_cramers_v", """
WITH base AS (
  SELECT lang AS a, source AS b FROM documents
  WHERE lang IS NOT NULL AND source IS NOT NULL),
cells AS (SELECT a, b, CAST(COUNT(*) AS BIGINT) AS nij
          FROM base GROUP BY a, b),
rws AS (SELECT a, CAST(SUM(nij) AS BIGINT) AS ri FROM cells GROUP BY a),
cls AS (SELECT b, CAST(SUM(nij) AS BIGINT) AS cj FROM cells GROUP BY b),
tot AS (SELECT CAST(SUM(nij) AS BIGINT) AS n FROM cells),
grid AS (
  SELECT rws.a, cls.b, rws.ri, cls.cj,
         COALESCE(cells.nij, 0) AS nij, tot.n
  FROM rws CROSS JOIN cls
  LEFT JOIN cells ON cells.a = rws.a AND cells.b = cls.b
  CROSS JOIN tot),
terms AS (
  SELECT n,
    CAST(round(CAST(CAST(n AS HUGEINT) * nij
                    - CAST(ri AS HUGEINT) * cj AS DOUBLE)
               * CAST(CAST(n AS HUGEINT) * nij
                      - CAST(ri AS HUGEINT) * cj AS DOUBLE)
               / NULLIF(CAST(CAST(n AS HUGEINT) * ri * cj AS DOUBLE),
                        0) * 1e6) AS BIGINT) AS t,
    a, b
  FROM grid),
agg AS (
  SELECT MAX(n) AS n,
         CAST(COUNT(DISTINCT a) AS INT) AS r,
         CAST(COUNT(DISTINCT b) AS INT) AS c,
         CAST(SUM(t) AS BIGINT) AS chi2m
  FROM terms)
SELECT CAST(n AS BIGINT) AS n, r, c,
  round(CAST(chi2m AS DOUBLE) / 1e6, 6) AS chi2,
  CASE WHEN least(r - 1, c - 1) > 0 THEN
    round(sqrt(CAST(chi2m AS DOUBLE) / 1e6
               / NULLIF(CAST(n AS DOUBLE)
                        * CAST(least(r - 1, c - 1) AS DOUBLE), 0)), 6)
  END AS v
FROM agg
""")
def q333(spark, sf_dir):
    """Cramér's V for the lang×source association over documents —
    the [0,1] effect size next to q262's mutual information on the
    same pair: COMPLETE r×c grid (absent cells contribute r_i·c_j/n;
    dropping them understates χ²), exact integer cell numerators
    µ-snapped before the cross-cell sum."""
    from ultraviolet_spark.operators.stats import cramers_v

    return cramers_v(_t(spark, sf_dir, "documents"),
                     a_col="lang", b_col="source")


@q("q334_kendall_tau_daily", """
WITH per AS (
  SELECT user_id AS k, date_trunc('day', ts) AS d,
         CAST(1000000 * SUM(CASE WHEN event_type = 'click'
                                 THEN 1 ELSE 0 END) AS BIGINT) AS x,
         CAST(1000000 * SUM(CASE WHEN event_type = 'purchase'
                                 THEN 1 ELSE 0 END) AS BIGINT) AS y
  FROM events GROUP BY 1, 2),
np AS (SELECT k, CAST(COUNT(*) AS BIGINT) AS n FROM per GROUP BY k),
pairs AS (
  SELECT a.k,
         CAST((CASE WHEN b.x > a.x THEN 1
                    WHEN b.x < a.x THEN -1 ELSE 0 END)
              * (CASE WHEN b.y > a.y THEN 1
                      WHEN b.y < a.y THEN -1 ELSE 0 END) AS BIGINT)
           AS sg
  FROM per a JOIN per b ON a.k = b.k AND a.d < b.d),
sa AS (SELECT k, CAST(SUM(sg) AS BIGINT) AS s FROM pairs GROUP BY k),
tx AS (SELECT k, CAST(SUM(t * (t - 1)) // 2 AS BIGINT) AS n1
       FROM (SELECT k, x, CAST(COUNT(*) AS BIGINT) AS t
             FROM per GROUP BY k, x) GROUP BY k),
ty AS (SELECT k, CAST(SUM(t * (t - 1)) // 2 AS BIGINT) AS n2
       FROM (SELECT k, y, CAST(COUNT(*) AS BIGINT) AS t
             FROM per GROUP BY k, y) GROUP BY k),
g AS (SELECT np.k, np.n, COALESCE(sa.s, 0) AS s,
             CAST(np.n * (np.n - 1) // 2 AS BIGINT) AS n0,
             tx.n1, ty.n2
      FROM np LEFT JOIN sa ON sa.k = np.k
      JOIN tx ON tx.k = np.k JOIN ty ON ty.k = np.k)
SELECT k AS user_id, n, s, n0, n1, n2,
  CASE WHEN CAST(n0 - n1 AS HUGEINT) * (n0 - n2) > 0 THEN
    round(CAST(s AS DOUBLE)
          / NULLIF(sqrt(CAST(CAST(n0 - n1 AS HUGEINT) * (n0 - n2)
                             AS DOUBLE)), 0), 6)
  END AS tau_b
FROM g
""")
def q334(spark, sf_dir):
    """Per-user Kendall τ-b between daily click and purchase counts —
    the concordant/discordant rank correlation next to q296's
    Spearman ρ (corpus-level, moment-based) and q332's partial
    correlation: do a user's clicky days tend to be their purchasey
    days, robust to any monotone re-scaling?  Exact int64 S over the
    keyed day-pair frame, integer tie corrections, DECIMAL(38,0)
    denominator product, one fixed-order double τ."""
    from ultraviolet_spark.operators.stats import kendall_tau_by_key

    e = _t(spark, sf_dir, "events")
    per = (e.groupBy(F.col("user_id"),
                     F.date_trunc("day", F.col("ts")).alias("d"))
           .agg(F.sum(F.when(F.col("event_type") == "click", 1)
                      .otherwise(0)).cast("long").alias("x"),
                F.sum(F.when(F.col("event_type") == "purchase", 1)
                      .otherwise(0)).cast("long").alias("y")))
    return kendall_tau_by_key(per, by="user_id", x_col="x", y_col="y",
                              tiebreak_col="d")


@q("q335_cohens_d_click_purchase", """
WITH base AS (
  SELECT (event_type = 'click') AS ia,
         CAST(round(value * 1e6) AS BIGINT) AS x
  FROM events
  WHERE event_type IN ('click', 'purchase') AND value IS NOT NULL),
agg AS (
  SELECT CAST(SUM(CASE WHEN ia THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
         CAST(SUM(CASE WHEN ia THEN 0 ELSE 1 END) AS BIGINT) AS n_b,
         SUM(CASE WHEN ia THEN CAST(x AS HUGEINT) ELSE 0 END) AS s_a,
         SUM(CASE WHEN ia THEN 0 ELSE CAST(x AS HUGEINT) END) AS s_b,
         SUM(CASE WHEN ia THEN CAST(x AS HUGEINT) * x ELSE 0 END) AS qa,
         SUM(CASE WHEN ia THEN 0 ELSE CAST(x AS HUGEINT) * x END) AS qb
  FROM base),
d AS (
  SELECT n_a, n_b,
    CAST(s_a AS DOUBLE) / NULLIF(CAST(n_a AS DOUBLE), 0) AS ma,
    CAST(s_b AS DOUBLE) / NULLIF(CAST(n_b AS DOUBLE), 0) AS mb,
    CAST(n_a * qa - s_a * s_a AS DOUBLE)
      / NULLIF(CAST(n_a * (n_a - 1) AS DOUBLE), 0) AS va,
    CAST(n_b * qb - s_b * s_b AS DOUBLE)
      / NULLIF(CAST(n_b * (n_b - 1) AS DOUBLE), 0) AS vb
  FROM agg),
e AS (
  SELECT *,
    sqrt((CAST(n_a - 1 AS DOUBLE) * va + CAST(n_b - 1 AS DOUBLE) * vb)
         / NULLIF(CAST(n_a + n_b - 2 AS DOUBLE), 0)) AS sp,
    (CAST(n_a - 1 AS DOUBLE) * va + CAST(n_b - 1 AS DOUBLE) * vb)
      / NULLIF(CAST(n_a + n_b - 2 AS DOUBLE), 0) AS sp2
  FROM d)
SELECT n_a, n_b,
  round(ma / 1e6, 6) AS mean_a,
  round(mb / 1e6, 6) AS mean_b,
  round(sp / 1e6, 6) AS sp,
  CASE WHEN n_a >= 2 AND n_b >= 2 AND sp2 > 0 THEN
    round((ma - mb) / NULLIF(sp, 0), 6) END AS d,
  CASE WHEN n_a >= 2 AND n_b >= 2 AND sp2 > 0 THEN
    round((ma - mb) / NULLIF(sp, 0)
          * (1.0 - 3.0 / NULLIF(CAST(4 * (n_a + n_b - 2) - 1
                                      AS DOUBLE), 0)), 6) END AS g
FROM e
""")
def q335(spark, sf_dir):
    """Cohen's d + Hedges' g between click and purchase values — the
    standardized effect size next to q299's Welch t (significance)
    and q316's randomization p: HOW BIG is the difference, in pooled
    standard deviations, with the small-sample bias correction?  One
    pass of exact DECIMAL(38,0) sufficient statistics, fixed-order
    double algebra replayed verbatim by the oracle."""
    from ultraviolet_spark.operators.stats import cohens_d

    return cohens_d(_t(spark, sf_dir, "events"), value_col="value",
                    group_col="event_type", group_a="click",
                    group_b="purchase")


@q("q336_kruskal_wallis", """
WITH base AS (
  SELECT event_type AS g, CAST(round(value * 1e6) AS BIGINT) AS v
  FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL),
cg AS (SELECT g, v, CAST(COUNT(*) AS BIGINT) AS c
       FROM base GROUP BY g, v),
pv AS (SELECT v, CAST(SUM(c) AS BIGINT) AS m FROM cg GROUP BY v),
tot AS (SELECT CAST(SUM(m) AS BIGINT) AS n FROM pv),
r AS (SELECT v, m,
        COALESCE(CAST(SUM(m) OVER (ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                 AS BIGINT), 0) AS r0
      FROM pv),
mr AS (SELECT v, m, 2 * r0 + m + 1 AS mr2 FROM r),
ss AS (SELECT SUM(CAST(m AS HUGEINT) * (mr2 - (n + 1))
                 * (mr2 - (n + 1))) AS ss2
       FROM mr, tot),
rg AS (SELECT cg.g, SUM(CAST(cg.c AS HUGEINT) * mr.mr2) AS r2,
              CAST(SUM(cg.c) AS BIGINT) AS ng
       FROM cg JOIN mr ON mr.v = cg.v GROUP BY cg.g),
tg AS (SELECT g,
         CAST((r2 - CAST(ng AS HUGEINT) * (n + 1))
              * (r2 - CAST(ng AS HUGEINT) * (n + 1)) AS DOUBLE)
           / NULLIF(CAST(ng AS DOUBLE), 0) AS t
       FROM rg, tot),
fold AS (SELECT CAST(COUNT(*) AS INTEGER) AS k,
                list_reduce(list_prepend(0.0, list(t ORDER BY g)),
                            (a, b) -> a + b) AS sb
         FROM tg)
SELECT k, n,
  CASE WHEN k >= 2 AND CAST(ss2 AS DOUBLE) > 0 THEN
    round(CAST(n - 1 AS DOUBLE) * sb
          / NULLIF(CAST(ss2 AS DOUBLE), 0), 6)
  END AS h
FROM fold, tot, ss
""")
def q336(spark, sf_dir):
    """Kruskal–Wallis H across event-type value distributions — the
    rank-robust sibling of q301's ANOVA (no normality / equal-variance
    assumptions) and the k-group generalization of q253's
    Mann–Whitney: doubled midranks from the two-phase bucketed rank
    machinery keep every sufficient statistic an exact integer; the
    only doubles are one division per group (summed by an ordered
    fold) and the final ratio, replayed verbatim by the oracle's
    global-window + list_reduce mirror."""
    from ultraviolet_spark.operators.stats import kruskal_wallis

    return kruskal_wallis(_t(spark, sf_dir, "events"),
                          value_col="value", group_col="event_type")


@q("q337_ljung_box", """
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
    CAST(COALESCE(SUM(CASE WHEN x1 IS NOT NULL THEN x END), 0)
         AS BIGINT) AS sa1,
    CAST(COALESCE(SUM(x1), 0) AS BIGINT) AS sb1,
    CAST(COALESCE(SUM(x * x2), 0) AS BIGINT) AS p2,
    CAST(COALESCE(SUM(CASE WHEN x2 IS NOT NULL THEN x END), 0)
         AS BIGINT) AS sa2,
    CAST(COALESCE(SUM(x2), 0) AS BIGINT) AS sb2,
    CAST(COALESCE(SUM(x * x3), 0) AS BIGINT) AS p3,
    CAST(COALESCE(SUM(CASE WHEN x3 IS NOT NULL THEN x END), 0)
         AS BIGINT) AS sa3,
    CAST(COALESCE(SUM(x3), 0) AS BIGINT) AS sb3
  FROM l GROUP BY user_id),
e AS (
  -- HUGEINT from the FIRST operand of every product: the n*n*p terms
  -- cross int64 at ~1-2k cent-scale events per key, and BIGINT
  -- arithmetic here would RAISE in DuckDB exactly where Spark's
  -- DECIMAL(38,0) stays exact (operators/stats.py ljung_box_by_key).
  SELECT user_id, n,
    CAST(n AS HUGEINT)*(CAST(n AS HUGEINT)*s2
                        - CAST(s AS HUGEINT)*s) AS den,
    CAST(n AS HUGEINT)*n*p1 - CAST(n AS HUGEINT)*s*(sa1+sb1)
      + CAST(n-1 AS HUGEINT)*s*s AS m1,
    CAST(n AS HUGEINT)*n*p2 - CAST(n AS HUGEINT)*s*(sa2+sb2)
      + CAST(n-2 AS HUGEINT)*s*s AS m2,
    CAST(n AS HUGEINT)*n*p3 - CAST(n AS HUGEINT)*s*(sa3+sb3)
      + CAST(n-3 AS HUGEINT)*s*s AS m3
  FROM g)
SELECT user_id, n,
  CASE WHEN n > 3 AND den > 0 THEN
    round(CAST(n * (n + 2) AS DOUBLE)
          * (CAST(m1 AS DOUBLE) * CAST(m1 AS DOUBLE)
               / NULLIF(CAST(n - 1 AS DOUBLE), 0)
             + CAST(m2 AS DOUBLE) * CAST(m2 AS DOUBLE)
               / NULLIF(CAST(n - 2 AS DOUBLE), 0)
             + CAST(m3 AS DOUBLE) * CAST(m3 AS DOUBLE)
               / NULLIF(CAST(n - 3 AS DOUBLE), 0))
          / NULLIF(CAST(den AS DOUBLE) * CAST(den AS DOUBLE), 0), 6)
  END AS q_lb
FROM e
""")
def q337(spark, sf_dir):
    """Per-user Ljung–Box Q over cent-valued event series (lags 1-3)
    — the one-number serial-correlation gate summarizing q206's ACF
    profile and formalizing what q326's Durbin–Watson sees only at
    lag 1: exact integer ACF numerators squared in DECIMAL(38,0), the
    lag sum as the literal fixed-order chain t1+t2+t3, one final
    ratio."""
    from ultraviolet_spark.operators.stats import ljung_box_by_key

    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    e = _t(spark, sf_dir, "events").withColumn("x", cents)
    return ljung_box_by_key(e, key_col="user_id", order_col="ts",
                            value_col="x", tiebreak_col="event_id",
                            max_lag=3)


@q("q338_meta_tags_extract", """
WITH d AS (SELECT doc_id AS i FROM documents),
rows_ AS (
  SELECT 'property' AS kind, 'og:title' AS meta_key,
         'Doc & Page ' || i AS content, 1 AS tag_no, i FROM d
  UNION ALL
  SELECT 'property', 'og:image', 'img' || i || '-a.jpg', 2, i
  FROM d WHERE i % 2 = 0
  UNION ALL
  SELECT 'property', 'og:image', 'img' || i || '-b.jpg', 3, i
  FROM d WHERE i % 2 = 0
  UNION ALL
  SELECT 'name', 'twitter:card', 'summary',
         2 + CASE WHEN i % 2 = 0 THEN 2 ELSE 0 END, i
  FROM d WHERE i % 3 = 0
  UNION ALL
  SELECT 'name', 'description', 'd' || (i % 7),
         2 + CASE WHEN i % 2 = 0 THEN 2 ELSE 0 END
           + CASE WHEN i % 3 = 0 THEN 1 ELSE 0 END
           + CASE WHEN i % 4 = 1 THEN 1 ELSE 0 END, i
  FROM d WHERE i % 5 = 0)
SELECT kind, meta_key,
       CAST(COUNT(*) AS BIGINT) AS n_tags,
       CAST(COUNT(DISTINCT i) AS BIGINT) AS n_pages,
       CAST(SUM(strlen(content)) AS BIGINT) AS bytes_total,
       MAX(content) AS max_content,
       CAST(MIN(tag_no) AS INTEGER) AS first_slot
FROM rows_ GROUP BY 1, 2
""")
def q338(spark, sf_dir):
    """Open Graph / twitter-card / SEO meta-tag extraction from raw
    HTML (operators/htmltables.meta_tags): pages synthesize the wild
    variants in Catalyst — a leading charset meta (no key: dropped
    but still occupying tag slot 0), an entity-escaped og:title on
    every page, TWO og:image tags on even pages (the OG array
    convention; the second has content BEFORE property), a
    single-quoted attribute-order-free twitter:card, an http-equiv
    meta (dropped, slot counted), and a description.  The oracle
    recomputes the per-(kind, key) rollup analytically — tag counts,
    page counts, decoded byte totals, lexicographic max content and
    the FIRST document-order slot per key are all on the hook."""
    from ultraviolet_spark.operators.htmltables import meta_tags

    i = F.col("doc_id")
    blank = F.lit("")
    html = F.concat(
        F.lit('<head><meta charset="utf-8">'
              '<meta property="og:title" content="Doc &amp; Page '),
        i, F.lit('"/>'),
        F.when(i % 2 == 0, F.concat(
            F.lit('<meta property="og:image" content="img'), i,
            F.lit('-a.jpg">'
                  '<meta content="img'), i,
            F.lit('-b.jpg" property="og:image">'))).otherwise(blank),
        F.when(i % 3 == 0,
               F.lit("<meta content='summary' name='twitter:card'>"))
         .otherwise(blank),
        F.when(i % 4 == 1,
               F.lit('<meta http-equiv="refresh" content="30">'))
         .otherwise(blank),
        F.when(i % 5 == 0, F.concat(
            F.lit('<meta name="description" content="d'), i % 7,
            F.lit('">'))).otherwise(blank),
        F.lit("</head>"))
    pages = (_t(spark, sf_dir, "documents")
             .select(F.concat(F.lit("https://m.example/p/"), i)
                     .alias("url"), html.alias("html")))
    mt = meta_tags(pages)
    return (mt.groupBy(F.col("kind"),
                       F.col("key").alias("meta_key"))
            .agg(F.count("*").cast("long").alias("n_tags"),
                 F.countDistinct("id").cast("long").alias("n_pages"),
                 F.sum(F.octet_length("content")).cast("long")
                  .alias("bytes_total"),
                 F.max("content").alias("max_content"),
                 F.min("tag_no").cast("int").alias("first_slot")))


@q("q339_siegel_slope", """
WITH base AS (
  SELECT user_id AS k, event_id AS tb,
         CAST(round(epoch_us(ts) / 3.6e9 * 1e6) AS BIGINT) AS x,
         CAST(round(value * 1e6) AS BIGINT) AS y
  FROM events WHERE event_type = 'purchase' AND value IS NOT NULL),
np AS (SELECT k, CAST(COUNT(*) AS BIGINT) AS n FROM base GROUP BY k),
pairs AS (
  SELECT l.k, l.tb AS ta,
         CAST(round(CAST(r.y - l.y AS DOUBLE) * 1e6
                    / CAST(r.x - l.x AS DOUBLE)) AS BIGINT) AS s
  FROM base l JOIN base r
    ON l.k = r.k AND l.tb <> r.tb AND l.x <> r.x),
rin AS (
  SELECT k, ta, s,
         row_number() OVER (PARTITION BY k, ta ORDER BY s) AS rn,
         COUNT(*) OVER (PARTITION BY k, ta) AS cnt
  FROM pairs),
inner_ AS (
  SELECT k, ta, CAST(SUM(s) // COUNT(*) AS BIGINT) AS m
  FROM rin WHERE rn = (cnt + 1) // 2 OR rn = (cnt + 2) // 2
  GROUP BY k, ta),
rout AS (
  SELECT k, ta, m,
         row_number() OVER (PARTITION BY k ORDER BY m, ta) AS rn,
         COUNT(*) OVER (PARTITION BY k) AS cnt
  FROM inner_),
outer_ AS (
  SELECT k, CAST(MAX(cnt) AS BIGINT) AS n_anchors,
         CAST(SUM(m) // COUNT(*) AS BIGINT) AS slope_micro
  FROM rout WHERE rn = (cnt + 1) // 2 OR rn = (cnt + 2) // 2
  GROUP BY k)
SELECT np.k AS user_id, np.n,
       COALESCE(outer_.n_anchors, 0) AS n_anchors, outer_.slope_micro
FROM np LEFT JOIN outer_ ON outer_.k = np.k
""")
def q339(spark, sf_dir):
    """Per-user Siegel repeated-medians purchase-value trend (µ-value
    per hour) — the 50%-breakdown rung above q309's Theil–Sen on the
    IDENTICAL frame: median over anchors of the median pairwise slope
    per anchor, per-pair snapped slopes, both medians exact
    truncating order statistics replayed with // in the oracle."""
    from ultraviolet_spark.operators.stats import siegel_slope_by_key

    p = (_t(spark, sf_dir, "events")
         .filter((F.col("event_type") == "purchase")
                 & F.col("value").isNotNull())
         .select("user_id", "event_id",
                 (F.unix_micros(F.col("ts").cast("timestamp"))
                  / F.lit(3.6e9)).alias("xh"), "value"))
    return siegel_slope_by_key(p, x_col="xh", y_col="value",
                               by="user_id", tiebreak_col="event_id")


@q("q340_jonckheere_trend", """
WITH base AS (
  SELECT event_type AS g, CAST(round(value * 1e6) AS BIGINT) AS v
  FROM events WHERE value IS NOT NULL
    AND event_type IN ('click', 'view', 'purchase')),
pv AS (
  SELECT v,
    CAST(SUM(CASE WHEN g = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS c0,
    CAST(SUM(CASE WHEN g = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS c1,
    CAST(SUM(CASE WHEN g = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
      AS c2
  FROM base GROUP BY v),
cum AS (
  SELECT v, c0, c1, c2, c0 + c1 + c2 AS m,
    COALESCE(SUM(c0) OVER w, 0) AS u0,
    COALESCE(SUM(c1) OVER w, 0) AS u1,
    COALESCE(SUM(c2) OVER w, 0) AS u2
  FROM pv WINDOW w AS (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                       AND 1 PRECEDING)),
agg AS (
  SELECT
    SUM(CAST(c1 AS HUGEINT) * (2 * CAST(u0 AS HUGEINT) + c0)
        + CAST(c2 AS HUGEINT) * (2 * CAST(u0 AS HUGEINT) + c0)
        + CAST(c2 AS HUGEINT) * (2 * CAST(u1 AS HUGEINT) + c1)) AS jt2,
    CAST(SUM(c0) AS BIGINT) AS n0, CAST(SUM(c1) AS BIGINT) AS n1x,
    CAST(SUM(c2) AS BIGINT) AS n2x,
    SUM(CAST(m AS HUGEINT) * (m - 1) * (2 * m + 5)) AS t1,
    SUM(CAST(m AS HUGEINT) * (m - 1) * (m - 2)) AS t2,
    SUM(CAST(m AS HUGEINT) * (m - 1)) AS t3
  FROM cum),
fin AS (
  SELECT *, n0 + n1x + n2x AS n,
    CAST(n0 AS HUGEINT) * n1x + CAST(n0 AS HUGEINT) * n2x
      + CAST(n1x AS HUGEINT) * n2x AS e2,
    CAST(n0 AS HUGEINT) * (n0-1) * (2*n0+5)
      + CAST(n1x AS HUGEINT) * (n1x-1) * (2*n1x+5)
      + CAST(n2x AS HUGEINT) * (n2x-1) * (2*n2x+5) AS gg1,
    CAST(n0 AS HUGEINT) * (n0-1) * (n0-2)
      + CAST(n1x AS HUGEINT) * (n1x-1) * (n1x-2)
      + CAST(n2x AS HUGEINT) * (n2x-1) * (n2x-2) AS gg2,
    CAST(n0 AS HUGEINT) * (n0-1) + CAST(n1x AS HUGEINT) * (n1x-1)
      + CAST(n2x AS HUGEINT) * (n2x-1) AS gg3
  FROM agg),
vr AS (
  SELECT *,
    CAST(CAST(n AS HUGEINT) * (n-1) * (2*n+5) - gg1 - t1 AS DOUBLE)
      / 72.0
    + CAST(gg2 * t2 AS DOUBLE)
      / NULLIF(CAST(CAST(n AS HUGEINT) * (n-1) * (n-2) AS DOUBLE)
               * 36.0, 0)
    + CAST(gg3 * t3 AS DOUBLE)
      / NULLIF(CAST(CAST(n AS HUGEINT) * (n-1) AS DOUBLE) * 8.0, 0)
      AS var
  FROM fin)
SELECT CAST(n AS BIGINT) AS n, CAST(3 AS INTEGER) AS k,
  CAST(jt2 AS BIGINT) AS jt2, CAST(e2 AS BIGINT) AS e2,
  CASE WHEN var > 0 THEN
    round(CAST(jt2 - e2 AS DOUBLE) / 2.0 / NULLIF(sqrt(var), 0), 6)
  END AS z
FROM vr
""")
def q340(spark, sf_dir):
    """Jonckheere–Terpstra ordered-alternative trend across event
    values under the funnel order click < view < purchase — the
    trend-aware companion of q336's Kruskal–Wallis: doubled JT and
    its null mean exact in DECIMAL(38,0) off the shared two-phase
    per-group cumulative machinery, full Hollander–Wolfe
    tie-corrected variance from exact integer polynomial sums, one
    fixed-order z."""
    from ultraviolet_spark.operators.stats import jonckheere_terpstra

    return jonckheere_terpstra(
        _t(spark, sf_dir, "events"), value_col="value",
        group_col="event_type", order=["click", "view", "purchase"])


@q("q341_ansari_bradley", """
WITH base AS (
  SELECT (event_type = 'click') AS ia,
         CAST(round(value * 1e6) AS BIGINT) AS v
  FROM events
  WHERE value IS NOT NULL AND event_type IN ('click', 'purchase')),
pv AS (
  SELECT v,
         CAST(SUM(CASE WHEN ia THEN 1 ELSE 0 END) AS BIGINT) AS ca,
         CAST(SUM(CASE WHEN ia THEN 0 ELSE 1 END) AS BIGINT) AS cb
  FROM base GROUP BY v),
tot AS (SELECT CAST(SUM(ca + cb) AS BIGINT) AS n FROM pv),
r AS (SELECT v, ca, cb, ca + cb AS m,
        COALESCE(CAST(SUM(ca + cb) OVER (ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                 AS BIGINT), 0) AS r0
      FROM pv),
sc AS (SELECT ca, cb, m,
         LEAST(2 * r0 + m + 1, 2 * (n + 1) - (2 * r0 + m + 1)) AS a2
       FROM r, tot),
agg AS (
  SELECT CAST(SUM(ca) AS BIGINT) AS n_a,
         CAST(SUM(cb) AS BIGINT) AS n_b,
         SUM(CAST(ca AS HUGEINT) * a2) AS A2,
         SUM(CAST(m AS HUGEINT) * a2) AS s1,
         SUM(CAST(m AS HUGEINT) * a2 * a2) AS s2
  FROM sc)
SELECT n_a, n_b, CAST(A2 AS BIGINT) AS a2,
  CASE WHEN CAST(n_a AS HUGEINT) * n_b
            * (CAST(n AS HUGEINT) * s2 - s1 * s1) > 0 THEN
    round(CAST(CAST(n AS HUGEINT) * A2
               - CAST(n_a AS HUGEINT) * s1 AS DOUBLE)
          / NULLIF(sqrt(CAST(CAST(n_a AS HUGEINT) * n_b
                             * (CAST(n AS HUGEINT) * s2 - s1 * s1)
                             AS DOUBLE)
                        / NULLIF(CAST(n - 1 AS DOUBLE), 0)), 0), 6)
  END AS z
FROM agg, tot
""")
def q341(spark, sf_dir):
    """Ansari–Bradley rank scale test between click and purchase
    values — the dispersion question q317's Brown–Forsythe asks with
    |x−median| magnitudes, answered instead with symmetric rank
    scores min(r, N+1−r): doubled midrank scores off the shared
    two-phase machinery stay exact integers, the z numerator
    N·A2 − n_a·S1 is an exact integer, and the permutation-moment
    variance is one fixed-order double expression."""
    from ultraviolet_spark.operators.stats import ansari_bradley

    return ansari_bradley(_t(spark, sf_dir, "events"),
                          value_col="value", group_col="event_type",
                          group_a="click", group_b="purchase")


@q("q342_cvm_two_sample", """
WITH base AS (
  SELECT (event_type = 'click') AS ia,
         CAST(round(value * 1e6) AS BIGINT) AS v
  FROM events
  WHERE value IS NOT NULL AND event_type IN ('click', 'purchase')),
pv AS (
  SELECT v,
         CAST(SUM(CASE WHEN ia THEN 1 ELSE 0 END) AS BIGINT) AS ca,
         CAST(SUM(CASE WHEN ia THEN 0 ELSE 1 END) AS BIGINT) AS cb
  FROM base GROUP BY v),
tot AS (SELECT CAST(SUM(ca) AS BIGINT) AS na,
               CAST(SUM(cb) AS BIGINT) AS nb FROM pv),
c AS (
  SELECT v, ca, cb, ca + cb AS m,
         CAST(SUM(ca) OVER w AS BIGINT) AS cum_a,
         CAST(SUM(cb) OVER w AS BIGINT) AS cum_b
  FROM pv WINDOW w AS (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                       AND CURRENT ROW)),
agg AS (
  SELECT SUM(CAST(m AS HUGEINT)
             * (CAST(cum_a AS HUGEINT) * nb - CAST(cum_b AS HUGEINT) * na)
             * (CAST(cum_a AS HUGEINT) * nb - CAST(cum_b AS HUGEINT) * na))
           AS tnum
  FROM c, tot)
SELECT na AS n_a, nb AS n_b,
  CAST(tnum AS DOUBLE) AS t_num,
  CASE WHEN na > 0 AND nb > 0 THEN
    round(CAST(tnum AS DOUBLE)
          / NULLIF(CAST(CAST(na AS HUGEINT) * nb * (na + nb)
                        * (na + nb) AS DOUBLE), 0), 6)
  END AS t
FROM agg, tot
""")
def q342(spark, sf_dir):
    """Two-sample Cramér–von Mises drift between click and purchase
    values — the INTEGRAL companion of q253's KS sup: the squared CDF
    gap accumulated over the whole support catches spread-out
    moderate drift that never produces one big gap.  Exact integer
    gap integrand m·(cumA·n_b − cumB·n_a)² summed in DECIMAL(38,0)
    off the shared two-phase machinery, one final division."""
    from ultraviolet_spark.operators.stats import cvm_two_sample

    return cvm_two_sample(_t(spark, sf_dir, "events"),
                          value_col="value", group_col="event_type",
                          group_a="click", group_b="purchase")


@q("q343_lepage_location_scale", """
WITH base AS (
  SELECT (event_type = 'click') AS ia,
         CAST(round(value * 1e6) AS BIGINT) AS v
  FROM events
  WHERE value IS NOT NULL AND event_type IN ('click', 'purchase')),
pv AS (
  SELECT v,
         CAST(SUM(CASE WHEN ia THEN 1 ELSE 0 END) AS BIGINT) AS ca,
         CAST(SUM(CASE WHEN ia THEN 0 ELSE 1 END) AS BIGINT) AS cb
  FROM base GROUP BY v),
tot AS (SELECT CAST(SUM(ca) AS BIGINT) AS na,
               CAST(SUM(cb) AS BIGINT) AS nb FROM pv),
c AS (
  SELECT v, ca, cb, ca + cb AS m,
         COALESCE(CAST(SUM(ca) OVER w AS BIGINT), 0) AS clta,
         COALESCE(CAST(SUM(cb) OVER w AS BIGINT), 0) AS cltb
  FROM pv WINDOW w AS (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                       AND 1 PRECEDING)),
sc AS (
  SELECT ca, cb, m, cltb,
         LEAST(2 * (clta + cltb) + m + 1,
               2 * (na + nb + 1) - (2 * (clta + cltb) + m + 1)) AS a2
  FROM c, tot),
agg AS (
  SELECT SUM(CAST(ca AS HUGEINT) * (2 * CAST(cltb AS HUGEINT) + cb))
           AS u2,
         SUM(CAST(ca AS HUGEINT) * a2) AS ab2,
         SUM(CAST(m AS HUGEINT) * a2) AS s1,
         SUM(CAST(m AS HUGEINT) * a2 * a2) AS s2,
         SUM(CAST(m AS HUGEINT) * m * m - m) AS tt
  FROM sc),
fin AS (SELECT na, nb, na + nb AS N, u2, ab2, s1, s2, tt
        FROM agg, tot),
zz AS (
  SELECT na, nb,
    CASE WHEN CAST(na AS HUGEINT) * nb
              * (CAST(N AS HUGEINT) * N * N - N - tt) > 0 THEN
      round(CAST(u2 - CAST(na AS HUGEINT) * nb AS DOUBLE) / 2.0
            / NULLIF(sqrt(CAST(CAST(na AS HUGEINT) * nb
                               * (CAST(N AS HUGEINT) * N * N - N - tt)
                               AS DOUBLE)
                          / NULLIF(CAST(12 * N * (N - 1) AS DOUBLE),
                                   0)), 0), 6)
    END AS z_w,
    CASE WHEN CAST(na AS HUGEINT) * nb
              * (CAST(N AS HUGEINT) * s2 - s1 * s1) > 0 THEN
      round(CAST(CAST(N AS HUGEINT) * ab2
                 - CAST(na AS HUGEINT) * s1 AS DOUBLE)
            / NULLIF(sqrt(CAST(CAST(na AS HUGEINT) * nb
                               * (CAST(N AS HUGEINT) * s2 - s1 * s1)
                               AS DOUBLE)
                          / NULLIF(CAST(N - 1 AS DOUBLE), 0)), 0), 6)
    END AS z_ab
  FROM fin)
SELECT na AS n_a, nb AS n_b, z_w, z_ab,
  CASE WHEN z_w IS NOT NULL AND z_ab IS NOT NULL THEN
    round(z_w * z_w + z_ab * z_ab, 6) END AS l
FROM zz
""")
def q343(spark, sf_dir):
    """Lepage omnibus location+scale drift between click and purchase
    values — z_W² + z_AB² (χ²(2) under the null): one shared
    two-phase pass yields both the tie-corrected Wilcoxon z and
    q341's Ansari–Bradley z from exact integer sufficient statistics;
    fires on a shift OR a spread change where each marginal test
    alone goes blind on the other."""
    from ultraviolet_spark.operators.stats import lepage_test

    return lepage_test(_t(spark, sf_dir, "events"),
                       value_col="value", group_col="event_type",
                       group_a="click", group_b="purchase")


@q("q344_dom_depth_profile", """
WITH d AS (SELECT doc_id AS i, doc_id % 5 AS k FROM documents)
SELECT 'https://s.example/p/' || i AS id,
       CAST(2 + k + 1 + k
            + CASE WHEN i % 2 = 0 THEN 1 ELSE 0 END
            + CASE WHEN i % 7 = 0 THEN 1 ELSE 0 END
            + 2 AS BIGINT) AS n_tags,
       CAST(2 + k AS BIGINT) AS max_depth,
       CAST(CASE WHEN i % 7 = 0 THEN -1 ELSE 0 END AS BIGINT)
         AS end_balance
FROM d
""")
def q344(spark, sf_dir):
    """DOM nesting-depth profile over synthesized pages: k = doc_id%5
    nested divs inside html>body (max depth 2+k), a void <br>, a
    self-closed <img> on even ids (both depth-neutral), and a STRAY
    </div> on every 7th page that drives end_balance to −1 — the
    broken-markup flag.  The oracle recomputes every page's
    (n_tags, max_depth, end_balance) analytically from the
    construction, so the tag classifier (closing vs void vs
    self-closed), the running-sum walk and the per-page rollup are
    all on the hook."""
    from ultraviolet_spark.operators.htmltables import dom_depth_profile

    i = F.col("doc_id")
    k = (i % 5).cast("int")
    html = F.concat(
        F.lit("<html><body>"),
        F.repeat(F.lit('<div class="x">'), k),
        F.lit("text<br>"),
        F.repeat(F.lit("</div>"), k),
        F.when(i % 2 == 0, F.lit('<img src="i.png"/>'))
         .otherwise(F.lit("")),
        F.when(i % 7 == 0, F.lit("</div>")).otherwise(F.lit("")),
        F.lit("</body></html>"))
    pages = (_t(spark, sf_dir, "documents")
             .select(F.concat(F.lit("https://s.example/p/"), i)
                     .alias("url"), html.alias("html")))
    return dom_depth_profile(pages)


@q("q345_gamma_somers", """
WITH per AS (
  SELECT user_id,
         LEAST(SUM(CASE WHEN event_type = 'click'
                        THEN 1 ELSE 0 END), 10) AS x,
         LEAST(SUM(CASE WHEN event_type = 'purchase'
                        THEN 1 ELSE 0 END), 10) AS y
  FROM events GROUP BY user_id),
cells AS (SELECT x, y, CAST(COUNT(*) AS BIGINT) AS n
          FROM per GROUP BY x, y),
tot AS (SELECT CAST(SUM(n) AS BIGINT) AS nn FROM cells),
p AS (SELECT a.x AS xa, a.y AS ya, a.n AS na,
             b.x AS xb, b.y AS yb, b.n AS nb
      FROM cells a, cells b),
agg AS (
  SELECT
    COALESCE(SUM(CASE WHEN xa < xb AND ya < yb
                      THEN CAST(na AS HUGEINT) * nb END), 0) AS c,
    COALESCE(SUM(CASE WHEN xa < xb AND ya > yb
                      THEN CAST(na AS HUGEINT) * nb END), 0) AS d,
    COALESCE(SUM(CASE WHEN xa = xb AND ya < yb
                      THEN CAST(na AS HUGEINT) * nb END), 0) AS t_x,
    COALESCE(SUM(CASE WHEN ya = yb AND xa < xb
                      THEN CAST(na AS HUGEINT) * nb END), 0) AS t_y
  FROM p)
SELECT nn AS n, CAST(c AS BIGINT) AS c, CAST(d AS BIGINT) AS d,
  CAST(t_x AS BIGINT) AS t_x, CAST(t_y AS BIGINT) AS t_y,
  CASE WHEN c + d > 0 THEN
    round(CAST(c - d AS DOUBLE) / NULLIF(CAST(c + d AS DOUBLE), 0), 6)
  END AS gamma,
  CASE WHEN c + d + t_y > 0 THEN
    round(CAST(c - d AS DOUBLE)
          / NULLIF(CAST(c + d + t_y AS DOUBLE), 0), 6)
  END AS somers_d_yx
FROM agg, tot
""")
def q345(spark, sf_dir):
    """Goodman–Kruskal γ and Somers' D between per-user capped click
    and purchase counts (ordinals 0..10) — the ordered-categorical
    association pair next to q333's nominal Cramér's V and q334's
    continuous τ-b: exact concordant/discordant/tie pair counts off
    the metadata-sized cell-pair grid in DECIMAL(38,0), two final
    divisions."""
    from ultraviolet_spark.operators.stats import gamma_somers_d

    per = (_t(spark, sf_dir, "events")
           .groupBy("user_id")
           .agg(F.least(F.sum(F.when(F.col("event_type") == "click", 1)
                              .otherwise(0)), F.lit(10)).alias("x"),
                F.least(F.sum(F.when(F.col("event_type") == "purchase",
                                     1).otherwise(0)),
                        F.lit(10)).alias("y")))
    return gamma_somers_d(per, x_col="x", y_col="y")


@q("q346_brier_decomposition", """
WITH s AS (
  SELECT ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 6))::BIGINT
           % 1000000 AS p,
         CAST((('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 7, 6))::BIGINT
                 % 1000000)
              < (200000 + (('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 6))::BIGINT
                             % 1000000) * 6 // 10) AS BIGINT) AS y
  FROM documents),
b AS (
  SELECT least(p // 100000, 9) AS bin,
         CAST(COUNT(*) AS BIGINT) AS n_k,
         CAST(SUM(y) AS BIGINT) AS p_k,
         CAST(SUM(p) AS BIGINT) AS s_k,
         SUM(CAST(p AS HUGEINT) * p) AS q_k,
         CAST(SUM(CASE WHEN y = 1 THEN p ELSE 0 END) AS BIGINT) AS sp1_k,
         SUM(CAST(p - 1000000 * y AS HUGEINT) * (p - 1000000 * y)) AS bn_k
  FROM s GROUP BY 1),
t AS (SELECT CAST(SUM(n_k) AS BIGINT) AS N,
             CAST(SUM(p_k) AS BIGINT) AS P,
             SUM(q_k) AS qt, SUM(bn_k) AS bn FROM b),
tk AS (
  SELECT bin,
    CAST((CAST(s_k AS HUGEINT) - 1000000 * p_k)
         * (CAST(s_k AS HUGEINT) - 1000000 * p_k) AS DOUBLE)
      / NULLIF(CAST(n_k AS DOUBLE), 0) AS rel_t,
    CAST((CAST(p_k AS HUGEINT) * N - CAST(P AS HUGEINT) * n_k)
         * (CAST(p_k AS HUGEINT) * N - CAST(P AS HUGEINT) * n_k)
         AS DOUBLE)
      / NULLIF(CAST(n_k AS DOUBLE), 0) AS res_t,
    CAST(CAST(s_k AS HUGEINT) * s_k AS DOUBLE)
      / NULLIF(CAST(n_k AS DOUBLE), 0) AS wbv_t,
    CAST(CAST(sp1_k AS HUGEINT) * n_k
         - CAST(s_k AS HUGEINT) * p_k AS DOUBLE)
      / NULLIF(CAST(n_k AS DOUBLE), 0) AS wbc_t
  FROM b, t),
f AS (
  SELECT
    list_reduce(list_prepend(0.0, list(rel_t ORDER BY bin)),
                (a, x) -> a + x) AS frel,
    list_reduce(list_prepend(0.0, list(res_t ORDER BY bin)),
                (a, x) -> a + x) AS fres,
    list_reduce(list_prepend(0.0, list(wbv_t ORDER BY bin)),
                (a, x) -> a + x) AS fwbv,
    list_reduce(list_prepend(0.0, list(wbc_t ORDER BY bin)),
                (a, x) -> a + x) AS fwbc
  FROM tk)
SELECT N AS n,
  round(CAST(bn AS DOUBLE) / NULLIF(CAST(N AS DOUBLE), 0) / 1e12, 6)
    AS brier,
  round(frel / NULLIF(CAST(N AS DOUBLE), 0) / 1e12, 6) AS rel,
  round(1e12 * fres
        / NULLIF(CAST(N AS DOUBLE) * CAST(N AS DOUBLE)
                 * CAST(N AS DOUBLE), 0) / 1e12, 6) AS res,
  round(1e12 * CAST(P AS DOUBLE)
        * (CAST(N AS DOUBLE) - CAST(P AS DOUBLE))
        / NULLIF(CAST(N AS DOUBLE) * CAST(N AS DOUBLE), 0) / 1e12, 6)
    AS unc,
  round((CAST(qt AS DOUBLE) - fwbv)
        / NULLIF(CAST(N AS DOUBLE), 0) / 1e12, 6) AS wbv,
  round(1e6 * fwbc / NULLIF(CAST(N AS DOUBLE), 0) / 1e12, 6) AS wbc
FROM f, t
""")
def q346(spark, sf_dir):
    """Murphy decomposition of the Brier score over q195's
    md5-synthesized (probability, label) pairs — WHY is the Brier
    what it is: reliability − resolution + uncertainty plus the two
    continuous-forecast terms (within-bin variance / covariance) that
    make BS = REL − RES + UNC + WBV − 2·WBC an exact identity
    (pinned in pytest); per-bin exact integer statistics, one double
    division per bin, ordered folds, fixed-order assembly."""
    from ultraviolet_spark.operators.evalmetrics import (
        brier_decomposition)

    d = _t(spark, sf_dir, "documents")
    h = F.md5(F.col("doc_id").cast("string"))
    p = F.conv(F.substring(h, 1, 6), 16, 10).cast("long") % 1_000_000
    y2 = F.conv(F.substring(h, 7, 6), 16, 10).cast("long") % 1_000_000
    base = d.select(
        p.alias("p_micro"),
        (y2 < (F.lit(200_000) + (p * 6 - (p * 6) % 10) / 10))
        .cast("long").alias("label"))
    return brier_decomposition(base, p_micro_col="p_micro",
                               label_col="label", bins=10)


_Q96_EDGES_CTE = """e0 AS (
  SELECT DISTINCT doc_id % 101 AS src, (doc_id * 7 + 3) % 101 AS dst
  FROM documents
  UNION
  SELECT doc_id % 101, (doc_id * 13 + 5) % 101 FROM documents),
und AS (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
  FROM e0 WHERE src <> dst),
deg AS (
  SELECT node, CAST(COUNT(*) AS BIGINT) AS d FROM (
    SELECT a AS node FROM und UNION ALL SELECT b FROM und)
  GROUP BY node)"""


@q("q347_clustering_coefficient", f"""
WITH {_Q96_EDGES_CTE},
j AS (SELECT a, b, da.d AS da, db.d AS db
      FROM und JOIN deg da ON da.node = a JOIN deg db ON db.node = b),
ori AS (
  SELECT CASE WHEN (da < db) OR (da = db AND a < b) THEN a ELSE b END AS u,
         CASE WHEN (da < db) OR (da = db AND a < b) THEN b ELSE a END AS v,
         CASE WHEN (da < db) OR (da = db AND a < b) THEN db ELSE da END
           AS dv
  FROM j),
wg AS (
  SELECT e1.u, e1.v, e2.v AS vw FROM ori e1 JOIN ori e2 ON e1.u = e2.u
  WHERE (e1.dv < e2.dv) OR (e1.dv = e2.dv AND e1.v < e2.v)),
tri AS (SELECT wg.u, wg.v, wg.vw FROM wg
        JOIN ori c ON c.u = wg.v AND c.v = wg.vw),
pn AS (
  SELECT node, CAST(COUNT(*) AS BIGINT) AS n FROM (
    SELECT u AS node FROM tri UNION ALL SELECT v FROM tri
    UNION ALL SELECT vw FROM tri)
  GROUP BY node)
SELECT deg.node, deg.d,
       CAST(COALESCE(pn.n, 0) AS BIGINT) AS n_triangles,
       CASE WHEN deg.d >= 2 THEN
         round(CAST(2 * COALESCE(pn.n, 0) AS DOUBLE)
               / NULLIF(CAST(deg.d * (deg.d - 1) AS DOUBLE), 0), 6)
       END AS c
FROM deg LEFT JOIN pn ON pn.node = deg.node
""")
def q347(spark, sf_dir):
    """Per-node local clustering coefficient over the q96/q172 domain
    graph: c = 2T/(d(d−1)) normalizes exact triangle counts by the
    possible closures — the community-density signal a raw triangle
    count can't give (a hub with many triangles can still be locally
    sparse); degree-1 nodes NULL."""
    from ultraviolet_spark.operators.graph import clustering_coefficient

    d = _t(spark, sf_dir, "documents").select("doc_id")
    e = (d.select((F.col("doc_id") % 101).alias("src"),
                  ((F.col("doc_id") * 7 + 3) % 101).alias("dst"))
         .union(d.select((F.col("doc_id") % 101).alias("src"),
                         ((F.col("doc_id") * 13 + 5) % 101).alias("dst")))
         .distinct())
    return clustering_coefficient(e)


@q("q348_degree_assortativity", f"""
WITH {_Q96_EDGES_CTE},
dup AS (SELECT a, b FROM und UNION ALL SELECT b, a FROM und),
j AS (SELECT da.d AS du, db.d AS dv
      FROM dup JOIN deg da ON da.node = dup.a
      JOIN deg db ON db.node = dup.b),
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS M,
         SUM(CAST(du AS HUGEINT)) AS sx,
         SUM(CAST(du AS HUGEINT) * du) AS sxx,
         SUM(CAST(du AS HUGEINT) * dv) AS sxy
  FROM j)
SELECT CAST(M // 2 AS BIGINT) AS m_und,
  CASE WHEN CAST(M AS HUGEINT) * sxx - sx * sx <> 0 THEN
    round(CAST(CAST(M AS HUGEINT) * sxy - sx * sx AS DOUBLE)
          / NULLIF(CAST(CAST(M AS HUGEINT) * sxx - sx * sx AS DOUBLE),
                   0), 6)
  END AS r
FROM agg
""")
def q348(spark, sf_dir):
    """Newman degree assortativity of the q96 domain graph — ONE
    number for 'do hubs link to hubs?': Pearson correlation of
    endpoint degrees over the directed doubling of the undirected
    edge list, exact DECIMAL(38,0) sums, one double division;
    web-style graphs run negative (hubs link leaves)."""
    from ultraviolet_spark.operators.graph import degree_assortativity

    d = _t(spark, sf_dir, "documents").select("doc_id")
    e = (d.select((F.col("doc_id") % 101).alias("src"),
                  ((F.col("doc_id") * 7 + 3) % 101).alias("dst"))
         .union(d.select((F.col("doc_id") % 101).alias("src"),
                         ((F.col("doc_id") * 13 + 5) % 101).alias("dst")))
         .distinct())
    return degree_assortativity(e)


@q("q349_cochran_armitage", """
WITH base AS (
  SELECT CASE event_type WHEN 'click' THEN 0 WHEN 'view' THEN 1
         ELSE 2 END AS t,
         CASE WHEN value IS NOT NULL AND value > 50 THEN 1 ELSE 0 END
           AS y
  FROM events WHERE event_type IN ('click', 'view', 'purchase')),
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(y) AS BIGINT) AS r_pos,
         CAST(SUM(t * y) AS BIGINT) AS tr,
         CAST(SUM(t) AS BIGINT) AS tn,
         CAST(SUM(t * t) AS BIGINT) AS t2n
  FROM base)
SELECT n, CAST(3 AS INTEGER) AS k, r_pos,
  CASE WHEN CAST(r_pos AS HUGEINT) * (n - r_pos)
            * (CAST(n AS HUGEINT) * t2n
               - CAST(tn AS HUGEINT) * tn) > 0 THEN
    round(sqrt(CAST(n AS DOUBLE))
          * CAST(CAST(n AS HUGEINT) * tr
                 - CAST(r_pos AS HUGEINT) * tn AS DOUBLE)
          / NULLIF(sqrt(CAST(CAST(r_pos AS HUGEINT) * (n - r_pos)
                             * (CAST(n AS HUGEINT) * t2n
                                - CAST(tn AS HUGEINT) * tn)
                             AS DOUBLE)), 0), 6)
  END AS z
FROM agg
""")
def q349(spark, sf_dir):
    """Cochran–Armitage trend in the high-value rate (value > 50)
    across the funnel order click < view < purchase — the
    binary-outcome sibling of q340's Jonckheere (which needs a
    continuous y): integer scores on the declared order, every factor
    of Z an exact integer, one double division carrying the trend
    sign."""
    from ultraviolet_spark.operators.stats import cochran_armitage

    return cochran_armitage(
        _t(spark, sf_dir, "events"), group_col="event_type",
        label_expr="value IS NOT NULL AND value > 50",
        order=["click", "view", "purchase"])


@q("q350_ks_uniformity_time_of_day", """
WITH base AS (
  SELECT CAST(epoch_us(ts) % 86400000000 // 1000000 AS BIGINT) AS v
  FROM events),
pv AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS m FROM base GROUP BY v),
tot AS (SELECT CAST(SUM(m) AS BIGINT) AS n FROM pv),
c AS (SELECT v, m,
        CAST(SUM(m) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW) AS BIGINT) AS cum
      FROM pv),
d AS (
  SELECT GREATEST(
           MAX(CAST(cum AS HUGEINT) * 86400 - CAST(n AS HUGEINT) * v),
           MAX(CAST(n AS HUGEINT) * v
               - CAST(cum - m AS HUGEINT) * 86400)) AS dnum
  FROM c, tot GROUP BY n)
SELECT n, CAST(dnum AS DOUBLE) AS d_num,
  CASE WHEN n > 0 THEN
    round(CAST(dnum AS DOUBLE)
          / NULLIF(CAST(CAST(n AS HUGEINT) * 86400 AS DOUBLE), 0), 6)
  END AS d
FROM d, tot
""")
def q350(spark, sf_dir):
    """One-sample KS uniformity of event SECOND-OF-DAY against the
    flat 0..86400 reference — the time-of-day clumping detector the
    two-sample drift battery can't express (no second sample needed):
    exact integer sup numerator max(c·W − n·v, n·v − (c−m)·W) off the
    shared two-phase cumulative machinery, one final division."""
    from ultraviolet_spark.operators.stats import ks_uniform_test

    e = _t(spark, sf_dir, "events").select(
        (F.unix_micros(F.col("ts").cast("timestamp")) % 86_400_000_000
         / F.lit(1_000_000)).cast("long").alias("sod"))
    return ks_uniform_test(e, value_col="sod", lo=0, hi=86_400)


@q("q351_hosmer_lemeshow", """
WITH s AS (
  SELECT ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 6))::BIGINT
           % 1000000 AS p,
         CAST((('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 7, 6))::BIGINT
                 % 1000000)
              < (200000 + (('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 6))::BIGINT
                             % 1000000) * 6 // 10) AS BIGINT) AS y
  FROM documents),
b AS (
  SELECT least(p // 100000, 9) AS bin,
         CAST(COUNT(*) AS BIGINT) AS n_k,
         CAST(SUM(y) AS BIGINT) AS o_k,
         CAST(SUM(p) AS BIGINT) AS s_k
  FROM s GROUP BY 1),
tk AS (
  SELECT bin, n_k,
    (s_k > 0 AND s_k < 1000000 * n_k) AS usable,
    CASE WHEN s_k > 0 AND s_k < 1000000 * n_k THEN
      CAST(CAST(n_k AS HUGEINT)
           * (1000000 * CAST(o_k AS HUGEINT) - s_k)
           * (1000000 * CAST(o_k AS HUGEINT) - s_k) AS DOUBLE)
      / NULLIF(CAST(CAST(s_k AS HUGEINT)
                    * (1000000 * CAST(n_k AS HUGEINT) - s_k)
                    AS DOUBLE), 0)
    ELSE 0.0 END AS t
  FROM b)
SELECT CAST(SUM(n_k) AS BIGINT) AS n,
  CAST(SUM(CASE WHEN usable THEN 1 ELSE 0 END) AS INTEGER)
    AS n_bins_used,
  CAST(SUM(CASE WHEN usable THEN 0 ELSE 1 END) AS INTEGER)
    AS n_degenerate,
  CASE WHEN SUM(CASE WHEN usable THEN 1 ELSE 0 END) > 0 THEN
    round(list_reduce(list_prepend(0.0, list(t ORDER BY bin)),
                      (a, x) -> a + x), 6)
  END AS hl
FROM tk
""")
def q351(spark, sf_dir):
    """Hosmer–Lemeshow calibration χ² over q195's md5-synthesized
    (probability, label) pairs — the calibration TEST next to the
    diagram (q195) and the decomposition (q346): the micro units
    cancel into the all-integer form n·(10⁶O−S)²/(S·(10⁶n−S)), one
    double division per bin, ordered fold; all-certain bins excluded
    and counted rather than clamped."""
    from ultraviolet_spark.operators.evalmetrics import hosmer_lemeshow

    d = _t(spark, sf_dir, "documents")
    h = F.md5(F.col("doc_id").cast("string"))
    p = F.conv(F.substring(h, 1, 6), 16, 10).cast("long") % 1_000_000
    y2 = F.conv(F.substring(h, 7, 6), 16, 10).cast("long") % 1_000_000
    base = d.select(
        p.alias("p_micro"),
        (y2 < (F.lit(200_000) + (p * 6 - (p * 6) % 10) / 10))
        .cast("long").alias("label"))
    return hosmer_lemeshow(base, p_micro_col="p_micro",
                           label_col="label", bins=10)


@q("q352_mean_reciprocal_rank", """
WITH r AS (
  SELECT user_id AS q,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY value DESC, event_id ASC) AS rnk
  FROM events WHERE value IS NOT NULL),
pq AS (
  SELECT q, MIN(CASE WHEN y = 1 THEN rnk END) AS fr
  FROM r GROUP BY q),
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_queries,
         CAST(SUM(CASE WHEN fr IS NOT NULL THEN 1 ELSE 0 END)
              AS BIGINT) AS n_with_hit,
         CAST(SUM(CASE WHEN fr IS NOT NULL
                       THEN CAST(round(1e6 / CAST(fr AS DOUBLE))
                                 AS BIGINT)
                       ELSE 0 END) AS BIGINT) AS rr_sum_micro
  FROM pq)
SELECT n_queries, n_with_hit, rr_sum_micro,
  round(CAST(rr_sum_micro AS DOUBLE)
        / NULLIF(CAST(n_queries AS DOUBLE), 0) / 1e6, 6) AS mrr
FROM agg
""")
def q352(spark, sf_dir):
    """Mean reciprocal rank of the first purchase under each user's
    value-desc event ranking — the first-hit metric next to q204's
    nDCG and q305's AP: per-query reciprocal ranks µ-snapped before
    the cross-query sum (order-independent exact total), no-hit
    queries contribute 0 and are counted, one final division."""
    from ultraviolet_spark.operators.evalmetrics import (
        mean_reciprocal_rank)

    e = (_t(spark, sf_dir, "events")
         .filter(F.col("value").isNotNull())
         .select("user_id", "event_id", "value",
                 (F.col("event_type") == "purchase").cast("long")
                 .alias("rel")))
    return mean_reciprocal_rank(e, query_col="user_id",
                                score_col="value", label_col="rel",
                                id_col="event_id")


@q("q353_selection_gains", """
WITH s AS (
  SELECT ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 6))::BIGINT
           % 1000000 AS score,
         CAST(len(string_split_regex(lower(trim(text)), '\\s+'))
              AS BIGINT) AS w
  FROM documents WHERE length(trim(text)) > 0),
per AS (
  SELECT least(score // 100000, 9) AS band,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         SUM(CAST(w AS HUGEINT)) AS wsum
  FROM s GROUP BY 1),
grid AS (
  SELECT t.band, COALESCE(per.n_docs, 0) AS n_docs,
         COALESCE(per.wsum, 0) AS wsum
  FROM (SELECT unnest(generate_series(0, 9)) AS band) t
  LEFT JOIN per ON per.band = t.band),
c AS (
  SELECT band, n_docs, wsum,
    CAST(SUM(n_docs) OVER wd AS BIGINT) AS cum_docs,
    SUM(wsum) OVER wd AS cw
  FROM grid WINDOW wd AS (ORDER BY band DESC ROWS BETWEEN UNBOUNDED
                          PRECEDING AND CURRENT ROW)),
t AS (SELECT MAX(cum_docs) AS tn, MAX(cw) AS tw FROM c)
SELECT band, CAST(band * 100000 AS BIGINT) AS lo_micro,
  n_docs, CAST(wsum AS DOUBLE) AS weight,
  cum_docs, CAST(cw AS DOUBLE) AS cum_weight,
  round(CAST(cum_docs AS DOUBLE) / NULLIF(CAST(tn AS DOUBLE), 0), 6)
    AS frac_docs,
  round(CAST(cw AS DOUBLE) / NULLIF(CAST(tw AS DOUBLE), 0), 6)
    AS frac_weight
FROM c, t
""")
def q353(spark, sf_dir):
    """Selection-gains curve for quality-score corpus filtering: docs
    band by an md5-derived micro quality score, weight = whitespace
    token count, and the profile reports cumulatively FROM THE TOP
    band what each threshold admits — the audit behind every 'keep
    the top X%' cut.  Fixed-width value bands (ties never split),
    empty bands completed, exact integer cumulatives off the ≤bins
    frame."""
    from ultraviolet_spark.operators.corpus import selection_gains

    d = (_t(spark, sf_dir, "documents")
         .filter(F.length(F.trim(F.col("text"))) > 0))
    h = F.md5(F.col("doc_id").cast("string"))
    score = F.conv(F.substring(h, 1, 6), 16, 10).cast("long") % 1_000_000
    toks = F.size(F.filter(
        F.split(F.lower(F.trim(F.col("text"))), r"\s+"),
        lambda t: t != "")).cast("long")
    base = d.select(score.alias("score_micro"), toks.alias("w"))
    return selection_gains(base, score_micro_col="score_micro",
                           weight_col="w", bins=10)


@q("q354_weighted_kappa", """
WITH per AS (
  SELECT user_id,
         LEAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END),
               4) AS a,
         LEAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END),
               4) AS b
  FROM events GROUP BY user_id),
cells AS (SELECT a, b, CAST(COUNT(*) AS BIGINT) AS n
          FROM per GROUP BY a, b),
r AS (SELECT a, CAST(SUM(n) AS BIGINT) AS ri FROM cells GROUP BY a),
c AS (SELECT b, CAST(SUM(n) AS BIGINT) AS cj FROM cells GROUP BY b),
tot AS (SELECT CAST(SUM(n) AS BIGINT) AS nn,
               CAST(COUNT(DISTINCT a) AS INTEGER) AS k_a,
               CAST(COUNT(DISTINCT b) AS INTEGER) AS k_b
        FROM cells),
grid AS (
  SELECT r.a, c.b, r.ri, c.cj, COALESCE(cells.n, 0) AS n
  FROM r CROSS JOIN c
  LEFT JOIN cells ON cells.a = r.a AND cells.b = c.b),
agg AS (
  SELECT SUM(CAST((a - b) * (a - b) AS HUGEINT) * n) AS wo,
         SUM(CAST((a - b) * (a - b) AS HUGEINT) * ri * cj) AS we
  FROM grid)
SELECT nn AS n, k_a, k_b,
  CASE WHEN we > 0 THEN
    round(1.0 - CAST(CAST(nn AS HUGEINT) * wo AS DOUBLE)
          / NULLIF(CAST(we AS DOUBLE), 0), 6)
  END AS kappa_w
FROM agg, tot
""")
def q354(spark, sf_dir):
    """Quadratic-weighted Cohen's κ between per-user capped click and
    view tiers (ordinals 0..4) — the ordinal agreement grade q176's
    unweighted κ can't give (one-step disagreements cost 1, four-step
    cost 16): both sides of κ_w exact DECIMAL(38,0) over the
    COMPLETED marginal grid (absent cells still owe expected
    disagreement), one division."""
    from ultraviolet_spark.operators.evalmetrics import weighted_kappa

    per = (_t(spark, sf_dir, "events")
           .groupBy("user_id")
           .agg(F.least(F.sum(F.when(F.col("event_type") == "click", 1)
                              .otherwise(0)), F.lit(4)).alias("a"),
                F.least(F.sum(F.when(F.col("event_type") == "view", 1)
                              .otherwise(0)), F.lit(4)).alias("b")))
    return weighted_kappa(per, a_col="a", b_col="b",
                          weight="quadratic")


@q("q355_vocab_richness", """
WITH t AS (
  SELECT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS tok
  FROM documents WHERE length(trim(text)) > 0),
freq AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS f
         FROM t WHERE tok <> '' GROUP BY tok),
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS v_obs,
         CAST(SUM(f) AS BIGINT) AS n_tokens,
         CAST(SUM(CASE WHEN f = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
         CAST(SUM(CASE WHEN f = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2
  FROM freq)
SELECT v_obs, n_tokens, f1, f2,
  CASE WHEN v_obs > 0 THEN
    round(CASE WHEN f2 > 0 THEN
            CAST(v_obs AS DOUBLE)
            + CAST(f1 AS DOUBLE) * CAST(f1 AS DOUBLE)
              / NULLIF(2 * CAST(f2 AS DOUBLE), 0)
          ELSE CAST(v_obs AS DOUBLE)
            + CAST(f1 AS DOUBLE) * (CAST(f1 AS DOUBLE) - 1) / 2.0
          END, 6)
  END AS chao1,
  CASE WHEN n_tokens > 0 THEN
    round(CAST(f1 AS DOUBLE) / NULLIF(CAST(n_tokens AS DOUBLE), 0), 6)
  END AS gt_p0
FROM agg
""")
def q355(spark, sf_dir):
    """Chao1 vocabulary-richness lower bound + Good–Turing unseen
    mass over the documents corpus — the asymptote estimates next to
    q251's Heaps growth fit: exact integer (V, N, f1, f2) off the
    frequency-of-frequencies tail, two fixed-order divisions; f2=0
    falls back to the bias-corrected Chao1 form."""
    from ultraviolet_spark.operators.textstats import vocab_richness

    return vocab_richness(_t(spark, sf_dir, "documents"))


@q("q356_simpson_diversity", """
WITH per AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n
             FROM documents WHERE source IS NOT NULL GROUP BY source),
agg AS (SELECT CAST(SUM(n) AS BIGINT) AS nn,
               CAST(COUNT(*) AS BIGINT) AS k,
               SUM(CAST(n AS HUGEINT) * (n - 1)) AS num
        FROM per)
SELECT nn AS n, k,
  CASE WHEN nn >= 2 THEN
    round(CAST(num AS DOUBLE)
          / NULLIF(CAST(CAST(nn AS HUGEINT) * (nn - 1) AS DOUBLE), 0),
          6) END AS d,
  CASE WHEN nn >= 2 AND num > 0 THEN
    round(CAST(CAST(nn AS HUGEINT) * (nn - 1) AS DOUBLE)
          / NULLIF(CAST(num AS DOUBLE), 0), 6) END AS inv_simpson
FROM agg
""")
def q356(spark, sf_dir):
    """Unbiased Simpson concentration of documents across sources —
    the probability two random documents share a source, with the
    inverse ('effective number of sources') next to q294's Gini and
    the entropy views: exact integer n_c(n_c−1) products in
    DECIMAL(38,0), two single divisions."""
    from ultraviolet_spark.operators.corpus import simpson_diversity

    return simpson_diversity(_t(spark, sf_dir, "documents"),
                             key_col="source")


@q("q357_dispersion_index", """
WITH per AS (
  SELECT user_id AS k,
         CAST(epoch_us(ts) // 3600000000 AS BIGINT) AS b,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events WHERE ts IS NOT NULL GROUP BY 1, 2),
g AS (
  SELECT k, CAST(SUM(c) AS BIGINT) AS n_events,
         CAST(MAX(b) - MIN(b) + 1 AS BIGINT) AS n_buckets,
         SUM(CAST(c AS HUGEINT) * c) AS c2
  FROM per GROUP BY k)
SELECT k AS user_id, n_events, n_buckets,
  CASE WHEN n_buckets >= 2 AND n_events > 0 THEN
    round(CAST(CAST(n_buckets AS HUGEINT) * c2
               - CAST(n_events AS HUGEINT) * n_events AS DOUBLE)
          / NULLIF(CAST(CAST(n_buckets AS HUGEINT) * n_events
                        AS DOUBLE), 0), 6)
  END AS d
FROM g
""")
def q357(spark, sf_dir):
    """Per-user hourly Fano factor (index of dispersion) — the
    burstiness one-liner for traffic/crawl scheduling next to q214's
    per-gap regularity features: empty hours inside the user's span
    count as zeros via span arithmetic (no grid join), the whole
    variance/mean ratio collapsing to ONE division of exact integers
    (H·Σc² − N²)/(H·N)."""
    from ultraviolet_spark.operators.stats import dispersion_index_by_key

    return dispersion_index_by_key(_t(spark, sf_dir, "events"),
                                   by="user_id", ts_col="ts",
                                   bucket_secs=3600)


@q("q358_krippendorff_alpha", """
WITH per AS (
  SELECT user_id,
         CASE WHEN SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0
                       END) >= 3 THEN 'hi'
              WHEN SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0
                       END) >= 1 THEN 'mid' ELSE 'lo' END AS a,
         CASE WHEN SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0
                       END) >= 3 THEN 'hi'
              WHEN SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0
                       END) >= 1 THEN 'mid' ELSE 'lo' END AS b
  FROM events GROUP BY user_id),
pair AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN a <> b THEN 1 ELSE 0 END) AS BIGINT)
           AS n_disagree
  FROM per),
pooled AS (
  SELECT c, CAST(COUNT(*) AS BIGINT) AS m FROM (
    SELECT a AS c FROM per UNION ALL SELECT b FROM per) GROUP BY c),
pagg AS (SELECT CAST(COUNT(*) AS BIGINT) AS k,
                SUM(CAST(m AS HUGEINT) * m) AS m2 FROM pooled)
SELECT n, k, n_disagree,
  CASE WHEN CAST(2 * n AS HUGEINT) * (2 * n) - m2 > 0 THEN
    round(1.0 - CAST(CAST(2 * n - 1 AS HUGEINT)
                     * (2 * n_disagree) AS DOUBLE)
          / NULLIF(CAST(CAST(2 * n AS HUGEINT) * (2 * n) - m2
                        AS DOUBLE), 0), 6)
  END AS alpha
FROM pair, pagg
""")
def q358(spark, sf_dir):
    """Krippendorff's α (nominal) between per-user click and view
    engagement tiers — the exchangeable-rater agreement next to
    Cohen's κ (per-rater marginals) and weighted κ (ordinal): the
    2-rater complete-data coincidence reduction
    1 − (2n−1)·2d/((2n)² − Σm²), every term exact, one division."""
    from ultraviolet_spark.operators.evalmetrics import (
        krippendorff_alpha_nominal)

    clicks = F.sum(F.when(F.col("event_type") == "click", 1)
                   .otherwise(0))
    views = F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0))
    tier = lambda c: (F.when(c >= 3, "hi").when(c >= 1, "mid")  # noqa: E731
                      .otherwise("lo"))
    per = (_t(spark, sf_dir, "events").groupBy("user_id")
           .agg(tier(clicks).alias("a"), tier(views).alias("b")))
    return krippendorff_alpha_nominal(per, a_col="a", b_col="b")


@q("q359_odds_ratio", """
WITH per AS (
  SELECT user_id,
         SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) > 0
           AS ea,
         SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) > 0
           AS eb
  FROM events GROUP BY user_id),
agg AS (
  SELECT
    CAST(SUM(CASE WHEN ea AND eb THEN 1 ELSE 0 END) AS BIGINT) AS a,
    CAST(SUM(CASE WHEN ea AND NOT eb THEN 1 ELSE 0 END) AS BIGINT)
      AS b,
    CAST(SUM(CASE WHEN NOT ea AND eb THEN 1 ELSE 0 END) AS BIGINT)
      AS c,
    CAST(SUM(CASE WHEN NOT ea AND NOT eb THEN 1 ELSE 0 END) AS BIGINT)
      AS d
  FROM per),
e AS (
  SELECT a, b, c, d,
    (CAST(a AS DOUBLE) + 0.5) * (CAST(d AS DOUBLE) + 0.5)
      / ((CAST(b AS DOUBLE) + 0.5) * (CAST(c AS DOUBLE) + 0.5)) AS orr,
    sqrt(1 / (CAST(a AS DOUBLE) + 0.5) + 1 / (CAST(b AS DOUBLE) + 0.5)
         + 1 / (CAST(c AS DOUBLE) + 0.5)
         + 1 / (CAST(d AS DOUBLE) + 0.5)) AS se
  FROM agg)
SELECT a, b, c, d,
  round(orr, 6) AS odds_ratio,
  round(ln(orr), 6) AS log_or,
  round(se, 6) AS se,
  round(exp(ln(orr) - 1.959964 * se), 6) AS ci_lo,
  round(exp(ln(orr) + 1.959964 * se), 6) AS ci_hi
FROM e
""")
def q359(spark, sf_dir):
    """Haldane-corrected odds ratio between ever-clicking and
    ever-purchasing per user — the multiplicative effect size next to
    q318's McNemar and q205's χ² ('how strongly', not just
    'associated?'): exact integer 2×2 cells, ½-corrected every cell
    unconditionally, fixed-order doubles with the 1.959964 z literal
    shared verbatim (the q328 Wilson rule)."""
    from ultraviolet_spark.operators.stats import odds_ratio_2x2

    clicks = F.sum(F.when(F.col("event_type") == "click", 1)
                   .otherwise(0))
    purch = F.sum(F.when(F.col("event_type") == "purchase", 1)
                  .otherwise(0))
    per = (_t(spark, sf_dir, "events").groupBy("user_id")
           .agg((clicks > 0).alias("ea"), (purch > 0).alias("eb")))
    return odds_ratio_2x2(per, expr_a="ea", expr_b="eb")
