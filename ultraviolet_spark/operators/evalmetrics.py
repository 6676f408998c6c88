"""Evaluation metrics computed exactly, at corpus scale — the
quality-gate numbers a data pipeline reports after every labeling or
classifier pass.

Both metrics here reduce to EXACT INTEGER sufficient statistics
(confusion counts, tie-group rank sums) and emit the final ratio as one
IEEE division of two int64s — bit-identical cross-engine, no rounding
games (the q169 discipline).

* :func:`cohens_kappa` — chance-corrected agreement between two
  categorical labelings:  κ = (N·Σdiag − Σᵢ rowᵢ·colᵢ) /
  (N² − Σᵢ rowᵢ·colᵢ), straight from the confusion matrix.
* :func:`roc_auc` — the Mann–Whitney formulation with midrank tie
  correction: AUC = (2·Σranks₊ − n₊(n₊+1)) / (2·n₊·n₋), where tied
  scores contribute their tie-group midrank.  Doubling every rank sum
  keeps the arithmetic integral.

Scale notes: kappa is two partial-agg shuffles (cells, then one row).
AUC aggregates per distinct score FIRST (partial-agg shuffle), then
runs one cumulative window over the distinct-score table — fine while
distinct scores fit a task (true for quantized/model scores); beyond
that, swap the window for the range-partitioned prefix-sum machinery in
``operators/suffix.py`` (same pattern, already scale-proven).
"""
from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def cohens_kappa(df: DataFrame, *, col_a: str, col_b: str) -> DataFrame:
    """One row ``(n, n_agree, kappa_num, kappa_den, kappa)``; kappa is
    NULL for the degenerate pe = 1 case (both labelings constant)."""
    cells = (df.groupBy(F.col(col_a).alias("__a"),
                        F.col(col_b).alias("__b"))
             .agg(F.count("*").alias("__c")))
    rows_ = cells.groupBy("__a").agg(F.sum("__c").alias("__ra"))
    cols_ = cells.groupBy("__b").agg(F.sum("__c").alias("__cb"))
    pe_num = (rows_.join(cols_, rows_["__a"] == cols_["__b"])
              .agg(F.coalesce(F.sum(F.col("__ra") * F.col("__cb")),
                              F.lit(0)).alias("__pe")))
    agg = cells.agg(
        F.sum("__c").cast("long").alias("n"),
        F.coalesce(F.sum(F.when(F.col("__a") == F.col("__b"),
                                F.col("__c"))), F.lit(0))
        .cast("long").alias("n_agree"))
    j = agg.crossJoin(F.broadcast(pe_num))
    num = F.col("n") * F.col("n_agree") - F.col("__pe")
    den = F.col("n") * F.col("n") - F.col("__pe")
    return j.select(
        "n", "n_agree",
        num.cast("long").alias("kappa_num"),
        den.cast("long").alias("kappa_den"),
        F.when(den != 0, num.cast("double") / den.cast("double"))
        .alias("kappa"))


def roc_auc(df: DataFrame, *, score_col: str, label_col: str) -> DataFrame:
    """One row ``(n_pos, n_neg, auc_num, auc_den, auc)`` — exact
    midrank Mann–Whitney AUC of integer ``score_col`` against boolean/
     0-1 ``label_col`` (1 = positive).  NULL auc if a class is empty."""
    pos = F.col(label_col).cast("long")
    g = (df.groupBy(F.col(score_col).alias("__s"))
         .agg(F.count("*").cast("long").alias("__n"),
              F.sum(pos).cast("long").alias("__p")))
    w = (Window.orderBy("__s")
         .rowsBetween(Window.unboundedPreceding, -1))
    # 2·Σ midranks of this tie group's positives
    #   = __p · (2·cum_before + __n + 1)
    cum = F.coalesce(F.sum("__n").over(w), F.lit(0))
    term = F.col("__p") * (2 * cum + F.col("__n") + 1)
    agg = (g.select(term.alias("__t"), "__n", "__p")
           .agg(F.sum("__t").cast("long").alias("__r2"),
                F.sum("__p").cast("long").alias("n_pos"),
                (F.sum("__n") - F.sum("__p")).cast("long").alias("n_neg")))
    num = F.col("__r2") - F.col("n_pos") * (F.col("n_pos") + 1)
    den = 2 * F.col("n_pos") * F.col("n_neg")
    return agg.select(
        "n_pos", "n_neg",
        num.cast("long").alias("auc_num"),
        den.cast("long").alias("auc_den"),
        F.when(den != 0, num.cast("double") / den.cast("double"))
        .alias("auc"))


def calibration_report(df: DataFrame, *, p_micro_col: str,
                       label_col: str, bins: int = 10) -> DataFrame:
    """Reliability diagram + Brier score + ECE (expected calibration
    error) for a probabilistic classifier, all from EXACT integer
    sufficient statistics.

    ``p_micro_col`` is the predicted probability in integer
    micro-units (0..1e6); ``label_col`` is 0/1.  Per fixed-width bin:
    ``n``, ``n_pos``, ``sum_p_micro``, and the two IEEE ratios
    ``mean_p`` / ``frac_pos``.  The overall scalars ride on every row:

    * Brier numerator Σ(p_micro − 1e6·y)² is an exact int64 (≤ 1e12
      per row), so ``brier = brier_num / (1e12·N)`` is one division.
    * The ECE numerator exploits n_b·|mean_p − frac_pos| ==
      |sum_p_micro_b − 1e6·n_pos_b| / 1e6 — per-bin ABSOLUTE GAPS ARE
      EXACT INTEGERS, so the cross-bin sum is order-independent
      (a float Σ over bins would be engine-order-dependent in its
      last ULP) and ``ece = ece_num / (1e6·N)`` is one division.

    One partial-agg shuffle on ≤``bins`` keys, one broadcast of the
    1-row total — no window, no second pass over the data.
    """
    width = 1_000_000 // bins
    p = F.col(p_micro_col).cast("long")
    y = F.col(label_col).cast("long")
    binned = df.select(
        F.least(F.floor(p / F.lit(width)), F.lit(bins - 1))
        .cast("long").alias("bin"),
        p.alias("__p"), y.alias("__y"),
        ((p - 1_000_000 * y) * (p - 1_000_000 * y)).alias("__sq"))
    per = (binned.groupBy("bin")
           .agg(F.count("*").cast("long").alias("n"),
                F.sum("__y").cast("long").alias("n_pos"),
                F.sum("__p").cast("long").alias("sum_p_micro"),
                F.sum("__sq").cast("long").alias("__sq_sum")))
    tot = per.agg(
        F.sum("n").cast("long").alias("__N"),
        F.sum(F.abs(F.col("sum_p_micro") - 1_000_000 * F.col("n_pos")))
        .cast("long").alias("ece_num"),
        F.sum("__sq_sum").cast("long").alias("brier_num"))
    out = per.crossJoin(F.broadcast(tot))
    return out.select(
        "bin", "n", "n_pos", "sum_p_micro",
        (F.col("sum_p_micro").cast("double")
         / (F.col("n") * 1_000_000).cast("double")).alias("mean_p"),
        (F.col("n_pos").cast("double") / F.col("n").cast("double"))
        .alias("frac_pos"),
        "brier_num", "ece_num",
        (F.col("brier_num").cast("double")
         / (F.col("__N") * F.lit(1_000_000_000_000)).cast("double"))
        .alias("brier"),
        (F.col("ece_num").cast("double")
         / (F.col("__N") * 1_000_000).cast("double")).alias("ece"))


# Exact integer DCG discounts: round(1e6 / log2(rank+1)) for ranks 1..10,
# PRECOMPUTED ONCE and embedded as literals in both engines.  Summing
# gain/log2(r+1) doubles directly would make nDCG depend on both the
# platform's libm log2 ULPs and the aggregation order; gain ×
# discount_micro is int64, so the cross-rank sum is order-independent
# and bit-identical everywhere.
NDCG_DISCOUNT_MICRO = {
    1: 1_000_000, 2: 630_930, 3: 500_000, 4: 430_677, 5: 386_853,
    6: 356_207, 7: 333_333, 8: 315_465, 9: 301_030, 10: 289_065,
}


def ndcg_at_k(df: DataFrame, *, query_col: str, score_col: str,
              gain_col: str, id_col: str, k: int = 10) -> DataFrame:
    """Per-query nDCG@k over a (query, candidate, score, graded-gain)
    table — the ranking-quality gate for a retrieval / reranking
    pipeline.

    ``dcg_micro``  = Σ over the top-k BY SCORE of gain·discount(rank)
    ``idcg_micro`` = Σ over the top-k BY GAIN  of gain·discount(rank)
    ``ndcg``       = dcg_micro / idcg_micro   (one IEEE division;
                     NULL when the query has no positive gain at all —
                     0/0 is "nothing to rank", not 0.0 quality)

    Ties break on ``id_col`` ascending in BOTH orderings so the result
    is a pure function of the data, not of partitioning.

    Scale: two rank windows partitioned by query (one exchange on
    query_col, reused by both — same partitioning), then one groupBy
    with int64 partial aggregation.  No collect, no floats until the
    final division.
    """
    if k > max(NDCG_DISCOUNT_MICRO):
        raise ValueError(
            f"k={k} exceeds the precomputed discount table "
            f"(1..{max(NDCG_DISCOUNT_MICRO)}); extend NDCG_DISCOUNT_MICRO")
    disc = F.create_map(
        *[F.lit(x) for kv in NDCG_DISCOUNT_MICRO.items() for x in kv])
    by_score = Window.partitionBy(query_col).orderBy(
        F.col(score_col).desc(), F.col(id_col).asc())
    by_gain = Window.partitionBy(query_col).orderBy(
        F.col(gain_col).desc(), F.col(id_col).asc())
    ranked = df.select(
        query_col, gain_col,
        F.row_number().over(by_score).alias("__rs"),
        F.row_number().over(by_gain).alias("__rg"))
    g = F.col(gain_col).cast("long")
    dcg_term = F.when(F.col("__rs") <= k, g * disc[F.col("__rs")]) \
                .otherwise(F.lit(0))
    idcg_term = F.when(F.col("__rg") <= k, g * disc[F.col("__rg")]) \
                 .otherwise(F.lit(0))
    out = (ranked.groupBy(query_col)
           .agg(F.sum(dcg_term).cast("long").alias("dcg_micro"),
                F.sum(idcg_term).cast("long").alias("idcg_micro")))
    return out.withColumn(
        "ndcg",
        F.when(F.col("idcg_micro") > 0,
               F.col("dcg_micro").cast("double")
               / F.col("idcg_micro").cast("double")))


def rbo_at_k(df: DataFrame, *, query_col: str, item_col: str,
             rank_a_col: str, rank_b_col: str, k: int = 10,
             p: float = 0.9) -> DataFrame:
    """Rank-biased overlap (Webber et al. 2010) between two rankings
    of the same candidate pool, truncated at depth ``k`` and
    normalized so identical prefixes score exactly 1.0 — the ranking-
    drift monitor that, unlike Kendall's tau, weights the TOP of the
    list (persistence ``p``: each deeper rank matters p× less).

    Exact-integer reformulation (no float sum, no pow() in either
    engine): RBO@k = Σ_d w_d·(|A_d ∩ B_d|/d) with w_d = (1−p)p^(d−1).
    An item at ranks (ra, rb) is inside both depth-d prefixes for
    every d ≥ max(ra, rb), so its total contribution is
    Σ_{d≥m} w_d/d with m = max(ra, rb) — a k-entry TAIL TABLE.
    Scaling w_d to nano units and multiplying by lcm(1..k) makes
    every w_d/d an exact int64, so the per-query sum is pure integer
    addition (order/partitioning-independent) and the final score is
    ONE IEEE division by the precomputed normalizer 2520·Σw_d.

    Input: one row per (query, item) with the item's 1-based rank
    under ranking A and under ranking B (NULL/0 rank = not ranked).
    Items outside both top-k contribute nothing and are filtered
    before any shuffle.

    Scale: scan-stage filter to ≤ k rows per query per side, one
    query-key exchange for the sum.
    """
    if (k, p) != (10, 0.9):
        raise NotImplementedError(
            "integer tail table precomputed for k=10, p=0.9 only — "
            "extend _RBO_WTAIL for other parameters")
    # WTAIL[m-1] = Σ_{d=m..10} round(1e9·(1−p)p^(d−1)) · (2520 // d)
    wtail = [593249326578, 341249326578, 227849326578, 159809326578,
             113882326578, 80814886578, 56014306578, 36882430578,
             21816078228, 9762996348]
    denom = 1641330331200.0  # 2520 · Σ w_d  (identical prefixes → 1.0)

    ra, rb = F.col(rank_a_col).cast("long"), F.col(rank_b_col).cast("long")
    m = F.greatest(ra, rb)
    both = (df.filter(ra.isNotNull() & rb.isNotNull()
                      & (ra >= 1) & (rb >= 1)
                      & (ra <= k) & (rb <= k))
            .select(F.col(query_col).alias("query"), m.alias("__m")))
    tbl = F.array(*[F.lit(v) for v in wtail])
    contrib = both.select("query",
                          F.element_at(tbl, F.col("__m").cast("int"))
                          .alias("__c"))
    return (contrib.groupBy("query")
            .agg(F.count("*").cast("long").alias("n_both_topk"),
                 F.sum("__c").cast("long").alias("rbo_num"))
            .withColumn("rbo", F.col("rbo_num").cast("double")
                        / F.lit(denom)))


def split_conformal(df: DataFrame, *, value_col: str, id_col: str,
                    a_num: int = 1, a_den: int = 10,
                    n_buckets: int = 64) -> DataFrame:
    """Split-conformal calibration with exact finite-sample rank
    arithmetic — the distribution-free prediction-interval machinery:
    hash-split the rows into a calibration half and a test half
    (md5-deterministic, the ``hash_split`` discipline — never RNG), take
    q̂ as the ⌈(n+1)(1−α)⌉-th smallest calibration score, and report
    empirical coverage P(test score ≤ q̂), which is guaranteed ≥ 1−α in
    expectation by exchangeability.

    α stays a RATIONAL a_num/a_den so the rank is exact:
    k = ⌈(n+1)·(a_den−a_num)/a_den⌉ computed as one integer
    ceiling-division — never a float ``ceil`` that can land one rank
    off when (n+1)(1−α) is a near-integer.  If k > n (tiny calibration
    sets / extreme α) the conformal bound is vacuous: q̂ is NULL and
    coverage 1 by definition — reported as such, not silently clamped.

    The k-th order statistic never global-sorts: per-distinct-value
    counts (one map-side-combined groupBy), value-range bucketed
    cumulative counts (two-phase prefix), then min value whose
    cumulative count reaches k.  Scores snap once to micro-units.
    """
    from ultraviolet_spark.operators.corpus import md5_bucket256

    v = F.round(F.col(value_col).cast("double") * 1e6).cast("long")
    side = F.when(md5_bucket256(F.col(id_col)) < 128, "cal") \
        .otherwise("test")
    base = (df.filter(v.isNotNull())
            .select(v.alias("v"), side.alias("side")))

    cal = base.filter(F.col("side") == "cal")
    per_v = cal.groupBy("v").agg(F.count("*").alias("c"))
    bounds = per_v.agg(F.min("v").alias("__lo"), F.max("v").alias("__hi"),
                       F.sum("c").alias("__n"))
    k_expr = F.expr(f"(( __n + 1) * {int(a_den) - int(a_num)} "
                    f"+ {int(a_den)} - 1) div {int(a_den)}")
    bounds = bounds.withColumn("__k", k_expr)
    pv = (per_v.crossJoin(F.broadcast(bounds))
          .withColumn("__b", F.expr(
              f"(v - __lo) div ((__hi - __lo) div {int(n_buckets)} + 1)")))
    w_in = (Window.partitionBy("__b").orderBy("v")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    pv = pv.withColumn("__c_in", F.sum("c").over(w_in))
    btot = pv.groupBy("__b").agg(F.sum("c").alias("__bc"))
    w_b = Window.orderBy("__b").rowsBetween(Window.unboundedPreceding, -1)
    boff = btot.select(
        "__b", F.coalesce(F.sum("__bc").over(w_b), F.lit(0)).alias("__oc"))
    pv = (pv.join(F.broadcast(boff), "__b")
          .withColumn("cum", F.col("__oc") + F.col("__c_in")))
    # q̂ = min v with cum ≥ k; NULL when k > n (vacuous bound)
    sc = (pv.agg(
        F.max("__n").alias("n_cal"), F.max("__k").alias("k"),
        F.min(F.when(F.col("cum") >= F.col("__k"), F.col("v")))
        .alias("qhat_micro")))

    test = base.filter(F.col("side") == "test")
    out = (test.crossJoin(F.broadcast(sc))
           .agg(F.max("n_cal").alias("n_cal"), F.max("k").alias("k"),
                F.max("qhat_micro").alias("qhat_micro"),
                F.count("*").alias("n_test"),
                F.sum(F.when(F.col("qhat_micro").isNull()
                             | (F.col("v") <= F.col("qhat_micro")), 1)
                      .otherwise(0)).cast("long").alias("n_covered")))
    return out.withColumn(
        "coverage",
        F.round(F.col("n_covered").cast("double")
                / F.col("n_test").cast("double"), 6))


def isotonic_calibration(df: DataFrame, *, score_col: str,
                         label_expr: str, n_bins: int = 64) -> DataFrame:
    """Isotonic (monotone non-decreasing) calibration of a score
    against a binary label — the PAV fit every production classifier
    gets before its probabilities are trusted, computed EXACTLY via
    the minimax identity instead of the sequential pool-adjacent-
    violators stack:

        fit_i = max_{j ≤ i} min_{k ≥ i} avg(label[j..k])

    which equals the PAV solution (the left derivative of the greatest
    convex minorant of the cumulative-sum diagram).  Scores first
    aggregate into ``n_bins`` equal-width bins (count, positives) —
    the data-sized pass is ONE map-side-combined groupBy; the minimax
    then runs on the bins³ frame (64³ = 262k tiny rows), with every
    interval average snapped to integer micro-units BEFORE the min/max
    so the lattice operations compare integers, not floats.  The
    µ-snap can shift a knife-edge pool boundary by at most 1e-6 —
    the price of an engine-portable exact replay, and the reason the
    DuckDB oracle matches bit-for-bit.

    Output: one row per nonempty bin with (bin, n, pos, raw_micro,
    fit_micro); fit_micro is non-decreasing in bin by construction.
    """
    from pyspark.sql import Window

    y = F.when(F.expr(label_expr), 1).otherwise(0)
    s = F.round(F.col(score_col).cast("double") * 1e6).cast("long")
    base = df.filter(s.isNotNull()).select(s.alias("s"), y.alias("y"))
    bounds = base.agg(F.min("s").alias("__lo"), F.max("s").alias("__hi"))
    binned = (base.crossJoin(F.broadcast(bounds))
              .withColumn("bin", F.expr(
                  f"(s - __lo) div ((__hi - __lo) div {int(n_bins)} + 1)"))
              .groupBy("bin")
              .agg(F.count("*").alias("n"),
                   F.sum("y").cast("long").alias("pos")))
    # prefix sums over the tiny bin frame (≤ n_bins rows)
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding,
                                          Window.currentRow)
    pre = (binned
           .withColumn("cn", F.sum("n").over(w))
           .withColumn("cp", F.sum("pos").over(w)))
    lo = pre.select(F.col("bin").alias("j"),
                    (F.col("cn") - F.col("n")).alias("n_before_j"),
                    (F.col("cp") - F.col("pos")).alias("p_before_j"))
    hi = pre.select(F.col("bin").alias("k"), F.col("cn").alias("n_to_k"),
                    F.col("cp").alias("p_to_k"))
    mid = pre.select(F.col("bin"), "n", "pos")
    tri = (mid.join(lo, lo["j"] <= mid["bin"])
           .join(hi, hi["k"] >= mid["bin"]))
    avg_micro = F.round(
        (F.col("p_to_k") - F.col("p_before_j")).cast("double")
        / (F.col("n_to_k") - F.col("n_before_j")).cast("double")
        * 1e6).cast("long")
    inner = (tri.withColumn("am", avg_micro)
             .groupBy("bin", "n", "pos", "j")
             .agg(F.min("am").alias("mn")))
    fit = (inner.groupBy("bin", "n", "pos")
           .agg(F.max("mn").alias("fit_micro")))
    raw = F.round(F.col("pos").cast("double")
                  / F.col("n").cast("double") * 1e6).cast("long")
    return (fit.withColumn("raw_micro", raw)
            .select("bin", "n", "pos", "raw_micro", "fit_micro"))


def average_precision(df: DataFrame, *, score_col: str, label_col: str,
                      id_col: str, n_buckets: int = 64) -> DataFrame:
    """Average precision (the step-function PR-AUC) of an integer
    score against a 0/1 label — the ranking metric that, unlike
    ROC-AUC, collapses under class imbalance exactly when it should:
    10 false positives above the last true hit barely move AUC on a
    10⁶-negative corpus but halve the precision terms AP is made of.

        AP = (1/n_pos) · Σ_{ranks k with a positive}  P@k

    over the TOTAL order (score desc, id asc) — the explicit unique
    tie-break the house ordering rule requires (permutation-averaged
    tie handling would make the metric a float expectation; this is
    the deterministic contract, documented).

    Exactness: the global rank and the running positive count both
    run the two-phase value-range bucket machinery (in-bucket
    row_number / cumulative sum + broadcast per-bucket offsets — no
    data-sized single-partition window); each positive's P@k =
    round(cum_pos·10⁶ / k) is snapped to a µ-integer BEFORE the
    cross-positive sum, so the total is an order-independent exact
    integer and AP is one final double division.  n_pos = 0 reports
    NULL, never 0/0.

    Output one row: (n, n_pos, ap).
    """
    from pyspark.sql import Window

    B = int(n_buckets)
    sm = F.col(score_col).cast("long")
    y = F.col(label_col).cast("long")
    base = (df.filter(sm.isNotNull() & y.isNotNull())
            .select(F.col(id_col).alias("id"), (-sm).alias("k"),
                    y.alias("y")))
    bounds = base.agg(F.min("k").alias("__lo"), F.max("k").alias("__hi"))
    b = (base.crossJoin(F.broadcast(bounds))
         .withColumn("__b", F.expr(
             f"(k - __lo) div ((__hi - __lo) div {B} + 1)")
             .cast("int")))
    w_in = Window.partitionBy("__b").orderBy("k", "id")
    wf = w_in.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    r = (b.withColumn("__rn", F.row_number().over(w_in))
         .withColumn("__cp", F.sum("y").over(wf)))
    bc = b.groupBy("__b").agg(F.count("*").alias("__c"),
                              F.sum("y").alias("__p"))
    w_off = Window.orderBy("__b").rowsBetween(Window.unboundedPreceding,
                                              -1)
    boff = bc.select(
        "__b",
        F.coalesce(F.sum("__c").over(w_off), F.lit(0)).alias("__noff"),
        F.coalesce(F.sum("__p").over(w_off), F.lit(0)).alias("__poff"))
    r = (r.join(F.broadcast(boff), "__b")
         .withColumn("__rk", (F.col("__noff") + F.col("__rn"))
                     .cast("long"))
         .withColumn("__cpos", (F.col("__poff") + F.col("__cp"))
                     .cast("long")))
    term = F.round(F.col("__cpos").cast("double") * F.lit(1e6)
                   / F.col("__rk").cast("double")).cast("long")
    agg = r.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("y").cast("long").alias("n_pos"),
        F.sum(F.when(F.col("y") == 1, term).otherwise(F.lit(0)))
        .cast("decimal(38,0)").alias("__s"))
    ap = F.when(F.col("n_pos") > 0,
                F.round(F.col("__s").cast("double")
                        / F.col("n_pos").cast("double") / F.lit(1e6), 6))
    return agg.select("n", "n_pos", ap.alias("ap"))


def confusion_report(df: DataFrame, *, pred_col: str,
                     label_col: str) -> DataFrame:
    """Binary-classification confusion matrix + the derived metrics
    in one conditional-aggregation pass: accuracy, precision, recall,
    F1 and Matthews correlation — MCC reported alongside because on
    a 99 %-negative corpus accuracy 0.99 and F1 of the all-negative
    classifier are vacuous while MCC is exactly 0 (pinned).

    tp/fp/fn/tn are exact int64 counts; every metric is a fixed-order
    double expression over them with each nullable denominator nulled
    first (empty classes report NULL, never ±inf/0-div).  MCC's
    four-factor denominator √((tp+fp)(tp+fn)(tn+fp)(tn+fn)) is
    computed in DECIMAL(38,0) then one double sqrt — n⁴ crosses
    int64 at n ≈ 2¹⁶ rows.

    Output one row: (tp, fp, fn, tn, accuracy, precision_, recall,
    f1, mcc) — precision_ spelled with the underscore because plain
    ``precision`` is a reserved word in several engines.
    """
    d38 = lambda c: c.cast("decimal(38,0)")
    nz = lambda den: F.when(den != 0, den)
    p = F.col(pred_col).cast("boolean")
    l = F.col(label_col).cast("boolean")
    cnt = lambda cond: F.sum(F.when(cond, 1).otherwise(0)).cast("long")
    agg = (df.filter(p.isNotNull() & l.isNotNull())
           .select(p.alias("__p"), l.alias("__l"))
           .agg(cnt(F.col("__p") & F.col("__l")).alias("tp"),
                cnt(F.col("__p") & ~F.col("__l")).alias("fp"),
                cnt(~F.col("__p") & F.col("__l")).alias("fn"),
                cnt(~F.col("__p") & ~F.col("__l")).alias("tn")))
    tp, fp = F.col("tp").cast("double"), F.col("fp").cast("double")
    fn, tn = F.col("fn").cast("double"), F.col("tn").cast("double")
    acc = F.round((tp + tn) / nz(tp + fp + fn + tn), 6)
    prec = F.round(tp / nz(tp + fp), 6)
    rec = F.round(tp / nz(tp + fn), 6)
    f1 = F.round(F.lit(2.0) * tp / nz(F.lit(2.0) * tp + fp + fn), 6)
    mcc_num = (d38(F.col("tp")) * d38(F.col("tn"))
               - d38(F.col("fp")) * d38(F.col("fn"))).cast("double")
    mcc_den = F.sqrt(((d38(F.col("tp")) + d38(F.col("fp")))
                      * (d38(F.col("tp")) + d38(F.col("fn")))
                      * (d38(F.col("tn")) + d38(F.col("fp")))
                      * (d38(F.col("tn")) + d38(F.col("fn"))))
                     .cast("double"))
    mcc = F.round(mcc_num / nz(mcc_den), 6)
    return agg.select("tp", "fp", "fn", "tn",
                      acc.alias("accuracy"), prec.alias("precision_"),
                      rec.alias("recall"), f1.alias("f1"),
                      mcc.alias("mcc"))


def brier_decomposition(df: DataFrame, *, p_micro_col: str,
                        label_col: str, bins: int = 10) -> DataFrame:
    """Murphy decomposition of the Brier score over fixed-width
    forecast bins — WHY is the classifier's Brier what it is:
    reliability (calibration gap — smaller is better), resolution
    (how far bin outcomes move from base rate — larger is better),
    uncertainty (the irreducible ō(1−ō)), plus the two
    generalized terms for CONTINUOUS forecasts (Stephenson et al.):
    within-bin variance and within-bin covariance, which make the
    identity EXACT rather than bin-approximate:

        BS = REL − RES + UNC + WBV − 2·WBC     (pinned in tests)

    Exactness: per-bin sufficient statistics are exact integers /
    DECIMAL(38,0) — n_k, positives P_k, Σp (S_k), Σp² (Q_k), and
    Σp over positives (SP1_k) — and every per-bin term takes exactly
    ONE double division by n_k:

        rel_k = (S_k − 10⁶P_k)²/n_k
        res_k = (P_k·N − P·n_k)²/n_k
        wbv_k = S_k²/n_k      wbc_k = (SP1_k·n_k − S_k·P_k)/n_k

    summed by an ORDERED fold over the sorted bin array (≤ ``bins``
    entries — the KW/Lepage discipline, mirrored with list_reduce),
    then assembled with the global N/P/Qtot/BrierNum scalars in fixed
    order.  Empty input → NULL fields.  One partial-agg shuffle on
    ≤ bins keys; totals ride the same ≤bins frame.

    Output one row: (n, brier, rel, res, unc, wbv, wbc) in
    probability² units rounded to 6.
    """
    width = 1_000_000 // bins
    d38 = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    nz = lambda den: F.when(den != 0, den)  # noqa: E731
    p = F.col(p_micro_col).cast("long")
    y = F.col(label_col).cast("long")
    binned = df.select(
        F.least(F.floor(p / F.lit(width)), F.lit(bins - 1))
        .cast("long").alias("bin"),
        p.alias("__p"), y.alias("__y"),
        ((p - 1_000_000 * y) * (p - 1_000_000 * y)).alias("__sq"))
    per = (binned.groupBy("bin")
           .agg(F.count("*").cast("long").alias("n_k"),
                F.sum("__y").cast("long").alias("p_k"),
                F.sum("__p").cast("long").alias("s_k"),
                F.sum(d38(F.col("__p")) * d38(F.col("__p")))
                .alias("q_k"),
                F.sum(F.when(F.col("__y") == 1, F.col("__p"))
                      .otherwise(0)).cast("long").alias("sp1_k"),
                F.sum(d38(F.col("__sq"))).alias("bn_k")))
    tot = per.agg(F.sum("n_k").cast("long").alias("N"),
                  F.sum("p_k").cast("long").alias("P"),
                  F.sum("q_k").alias("Qt"),
                  F.sum("bn_k").alias("BN"))
    j = per.crossJoin(F.broadcast(tot))
    nk = F.col("n_k").cast("double")
    rel_t = ((d38(F.col("s_k")) - d38(1_000_000 * F.col("p_k")))
             * (d38(F.col("s_k")) - d38(1_000_000 * F.col("p_k")))
             ).cast("double") / nz(nk)
    res_t = ((d38(F.col("p_k")) * d38(F.col("N"))
              - d38(F.col("P")) * d38(F.col("n_k")))
             * (d38(F.col("p_k")) * d38(F.col("N"))
                - d38(F.col("P")) * d38(F.col("n_k")))
             ).cast("double") / nz(nk)
    wbv_t = (d38(F.col("s_k")) * d38(F.col("s_k"))).cast("double") \
        / nz(nk)
    wbc_t = (d38(F.col("sp1_k")) * d38(F.col("n_k"))
             - d38(F.col("s_k")) * d38(F.col("p_k"))).cast("double") \
        / nz(nk)

    def fold(col):
        return F.aggregate(
            F.sort_array(F.collect_list(F.struct(F.col("bin").alias("b"),
                                                 col.alias("t")))),
            F.lit(0.0), lambda a, s: a + s["t"])

    agg = j.groupBy().agg(
        F.max("N").alias("n"), F.max("P").alias("pp"),
        F.max("Qt").alias("qt"), F.max("BN").alias("bn"),
        fold(rel_t).alias("__rel"), fold(res_t).alias("__res"),
        fold(wbv_t).alias("__wbv"), fold(wbc_t).alias("__wbc"))
    Nd = F.col("n").cast("double")
    brier = F.col("bn").cast("double") / nz(Nd) / F.lit(1e12)
    rel = F.col("__rel") / nz(Nd) / F.lit(1e12)
    res = (F.lit(1e12) * F.col("__res")
           / nz(Nd * Nd * Nd) / F.lit(1e12))
    unc = (F.lit(1e12) * F.col("pp").cast("double")
           * (Nd - F.col("pp").cast("double"))
           / nz(Nd * Nd) / F.lit(1e12))
    wbv = ((F.col("qt").cast("double") - F.col("__wbv"))
           / nz(Nd) / F.lit(1e12))
    wbc = (F.lit(1e6) * F.col("__wbc") / nz(Nd) / F.lit(1e12))
    ok = F.col("n") > 0
    r6 = lambda c: F.when(ok, F.round(c, 6))  # noqa: E731
    return agg.select(
        "n", r6(brier).alias("brier"), r6(rel).alias("rel"),
        r6(res).alias("res"), r6(unc).alias("unc"),
        r6(wbv).alias("wbv"), r6(wbc).alias("wbc"))


def hosmer_lemeshow(df: DataFrame, *, p_micro_col: str,
                    label_col: str, bins: int = 10) -> DataFrame:
    """Hosmer–Lemeshow calibration χ² over fixed-width forecast bins
    — the TEST companion of the reliability diagram (q195) and the
    Brier decomposition (q346): per bin, observed positives O_k
    against expected E_k = Σp, normalized by the binomial variance,

        HL = Σ_k (O_k − E_k)² / (E_k·(1 − p̄_k))
           = Σ_k n_k·(10⁶·O_k − S_k)² / (S_k·(10⁶·n_k − S_k))

    — the second form is all exact integers (micro units cancel), so
    each bin's term takes ONE double division and the cross-bin sum
    is an ordered fold (the q346 discipline).  Degenerate bins
    (S_k = 0 or S_k = 10⁶·n_k — all-certain forecasts, zero binomial
    variance) are EXCLUDED and counted in ``n_degenerate`` rather
    than dividing by zero or silently clamping; df = usable bins − 2
    by the classic convention.  Output one row:
    (n, n_bins_used, n_degenerate, hl).
    """
    width = 1_000_000 // bins
    d38 = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    nz = lambda den: F.when(den != 0, den)  # noqa: E731
    p = F.col(p_micro_col).cast("long")
    y = F.col(label_col).cast("long")
    binned = df.select(
        F.least(F.floor(p / F.lit(width)), F.lit(bins - 1))
        .cast("long").alias("bin"),
        p.alias("__p"), y.alias("__y"))
    per = (binned.groupBy("bin")
           .agg(F.count("*").cast("long").alias("n_k"),
                F.sum("__y").cast("long").alias("o_k"),
                F.sum("__p").cast("long").alias("s_k")))
    usable = ((F.col("s_k") > 0)
              & (F.col("s_k") < 1_000_000 * F.col("n_k")))
    num = (d38(1_000_000 * F.col("o_k")) - d38(F.col("s_k")))
    term = F.when(usable,
                  (d38(F.col("n_k")) * num * num).cast("double")
                  / nz((d38(F.col("s_k"))
                        * (d38(1_000_000 * F.col("n_k"))
                           - d38(F.col("s_k")))).cast("double")))
    agg = per.groupBy().agg(
        F.sum("n_k").cast("long").alias("n"),
        F.sum(F.when(usable, 1).otherwise(0)).cast("int")
        .alias("n_bins_used"),
        F.sum(F.when(usable, 0).otherwise(1)).cast("int")
        .alias("n_degenerate"),
        F.aggregate(
            F.sort_array(F.collect_list(F.struct(
                F.col("bin").alias("b"),
                F.coalesce(term, F.lit(0.0)).alias("t")))),
            F.lit(0.0), lambda a, s: a + s["t"]).alias("__hl"))
    return agg.select(
        "n", "n_bins_used", "n_degenerate",
        F.when(F.col("n_bins_used") > 0,
               F.round(F.col("__hl"), 6)).alias("hl"))


def mean_reciprocal_rank(df: DataFrame, *, query_col: str,
                         score_col: str, label_col: str,
                         id_col: str) -> DataFrame:
    """Mean reciprocal rank — the first-hit metric completing the
    ranking-eval wing next to nDCG (graded position discount) and AP
    (all-hits precision): how high does the FIRST relevant result
    sit, per query, under the total order (score desc, id asc) (the
    house explicit-tie-break rule)?

    Exactness: each query's reciprocal rank snaps to the µ-integer
    round(10⁶/r) BEFORE the cross-query sum (order-independent exact
    total — the AP discipline); queries with no relevant result
    contribute 0 (the standard convention, reported separately in
    ``n_with_hit``); MRR is one final double division.  Per-query
    ranks ride a (query)-partitioned window — candidate lists are
    upstream-bounded per the nDCG contract.

    Output one row: (n_queries, n_with_hit, rr_sum_micro, mrr).
    """
    from pyspark.sql import Window

    nz = lambda den: F.when(den != 0, den)  # noqa: E731
    w = (Window.partitionBy(query_col)
         .orderBy(F.col(score_col).desc(), F.col(id_col).asc()))
    ranked = df.select(F.col(query_col).alias("__q"),
                       F.col(label_col).cast("long").alias("__y"),
                       F.row_number().over(w).alias("__r"))
    per_q = (ranked.groupBy("__q")
             .agg(F.min(F.when(F.col("__y") == 1, F.col("__r")))
                  .alias("__fr")))
    rr = F.when(F.col("__fr").isNotNull(),
                F.round(F.lit(1e6) / F.col("__fr").cast("double"))
                .cast("long")).otherwise(F.lit(0).cast("long"))
    agg = per_q.agg(
        F.count("*").cast("long").alias("n_queries"),
        F.sum(F.when(F.col("__fr").isNotNull(), 1).otherwise(0))
        .cast("long").alias("n_with_hit"),
        F.sum(rr).cast("long").alias("rr_sum_micro"))
    return agg.select(
        "n_queries", "n_with_hit", "rr_sum_micro",
        F.round(F.col("rr_sum_micro").cast("double")
                / nz(F.col("n_queries").cast("double")) / F.lit(1e6),
                6).alias("mrr"))


def weighted_kappa(df: DataFrame, *, a_col: str, b_col: str,
                   weight: str = "quadratic") -> DataFrame:
    """Cohen's weighted κ for ORDINAL paired labels — the
    chance-corrected agreement q176's unweighted κ can't grade: when
    categories are ordered (star ratings, quality tiers), disagreeing
    by one step should cost less than disagreeing by four, and
    quadratic weights w_ij = (i−j)² make κ_w the ICC-equivalent
    standard.

        κ_w = 1 − Σ w_ij·n_ij / Σ w_ij·e_ij,   e_ij = r_i·c_j / N

    Exactness: observed disagreement Σw·n is an exact integer off the
    contingency cells; the expected side clears its /N by computing
    N·Σw·n against Σw·r_i·c_j — BOTH sides exact DECIMAL(38,0), so
    κ_w = 1 − (N·Σw·n)/(Σw·r·c) is ONE division.  The marginal grid
    is COMPLETED (absent cells still contribute expected
    disagreement — the Cramér's V completion rule; dropping them
    inflates κ).  Labels must be integral ordinals (caller maps).
    Zero expected disagreement (a single category) → NULL.
    ``weight='linear'`` uses |i−j|.

    Output one row: (n, k_a, k_b, kappa_w).
    """
    d38 = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    nz = lambda den: F.when(den != 0, den)  # noqa: E731
    a = F.col(a_col).cast("long")
    b = F.col(b_col).cast("long")
    base = (df.filter(a.isNotNull() & b.isNotNull())
            .select(a.alias("__a"), b.alias("__b")))
    cells = base.groupBy("__a", "__b").agg(
        F.count("*").cast("long").alias("__n"))
    rows = cells.groupBy("__a").agg(F.sum("__n").cast("long")
                                    .alias("__ri"))
    colsm = cells.groupBy("__b").agg(F.sum("__n").cast("long")
                                     .alias("__cj"))
    tot = cells.agg(F.sum("__n").cast("long").alias("n"),
                    F.countDistinct("__a").cast("int").alias("k_a"),
                    F.countDistinct("__b").cast("int").alias("k_b"))
    diff = F.col("__a") - F.col("__b")
    w = (diff * diff) if weight == "quadratic" else F.abs(diff)
    grid = (rows.crossJoin(colsm)
            .join(cells, ["__a", "__b"], "left")
            .withColumn("__n", F.coalesce("__n", F.lit(0).cast("long"))))
    agg = grid.agg(
        F.sum(d38(w) * d38(F.col("__n"))).alias("__wo"),
        F.sum(d38(w) * d38(F.col("__ri")) * d38(F.col("__cj")))
        .alias("__we"))
    out = agg.crossJoin(F.broadcast(tot))
    kw = F.when(F.col("__we") > 0, F.round(
        F.lit(1.0) - (d38(F.col("n")) * F.col("__wo")).cast("double")
        / nz(F.col("__we").cast("double")), 6))
    return out.select("n", "k_a", "k_b", kw.alias("kappa_w"))


def krippendorff_alpha_nominal(df: DataFrame, *, a_col: str,
                               b_col: str) -> DataFrame:
    """Krippendorff's α for NOMINAL paired labels — the agreement
    coefficient that, unlike Cohen's κ (q176, per-rater marginals)
    and the weighted κ (q354, ordinal), treats both raters as
    exchangeable draws from one pool (the coincidence-matrix view)
    and carries the small-sample (2n−1) correction:

        α = 1 − (2n−1)·2·d / ((2n)² − Σ_c m_c²)

    with d the disagreeing-pair count and m_c the POOLED label
    counts — the 2-rater complete-data reduction of the general
    coincidence formula, every term an exact integer (Σm² in
    DECIMAL(38,0)); α is ONE division.  A single pooled category
    (zero expected disagreement) → NULL.  One pair agg + one pooled-
    count agg; no window, no grid.

    Output one row: (n, k, n_disagree, alpha).
    """
    d38 = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    nz = lambda den: F.when(den != 0, den)  # noqa: E731
    base = (df.filter(F.col(a_col).isNotNull()
                      & F.col(b_col).isNotNull())
            .select(F.col(a_col).alias("__a"), F.col(b_col).alias("__b")))
    pair = base.agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.when(F.col("__a") != F.col("__b"), 1).otherwise(0))
        .cast("long").alias("n_disagree"))
    pooled = (base.select(F.col("__a").alias("__c"))
              .unionAll(base.select(F.col("__b").alias("__c")))
              .groupBy("__c").agg(F.count("*").cast("long").alias("__m")))
    pagg = pooled.agg(
        F.count("*").cast("long").alias("k"),
        F.sum(d38(F.col("__m")) * d38(F.col("__m"))).alias("__m2"))
    out = pair.crossJoin(F.broadcast(pagg))
    n2 = 2 * F.col("n")
    den = d38(n2) * d38(n2) - F.col("__m2")
    alpha = F.when(den > 0, F.round(
        F.lit(1.0)
        - (d38(n2 - 1) * d38(2 * F.col("n_disagree"))).cast("double")
        / nz(den.cast("double")), 6))
    return out.select("n", "k", "n_disagree", alpha.alias("alpha"))
