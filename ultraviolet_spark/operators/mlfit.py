"""In-engine model fitting: logistic regression by IRLS, exactly
reproducible across engines and cluster sizes.

Distributed GLM training is normally "approximately deterministic at
best" — float reduction order varies with partitioning, so two runs of
the same job give betas differing in the last ulps, and a DuckDB replay
matches nothing.  This operator makes the whole fit a pure function of
the data by the registry's exactness discipline:

* every per-row contribution to the weighted normal equations
  (w·xa·xb and w·z·xa) is snapped to an integer micro-unit BEFORE
  aggregation, so each iteration's sufficient statistics are
  order-independent int64 sums — partitioning cannot move them;
* the 3×3 weighted-least-squares solve is Cramer's rule evaluated in
  a FIXED operand order over doubles of those exact integers (the
  determinant polynomials reach ~10^49 at corpus scale, past
  DECIMAL(38); int64→double conversion is the same nearest-even in
  every engine, and identical operand trees give identical doubles);
* iterations are UNROLLED (fixed count, default 2 from β = 0) — the
  honest contract for a fixpoint-free exact replay, mirroring k-core's
  fixed-rounds mode; β snaps to micro-units between iterations.

Scale: each iteration is ONE map-side-combined pass producing a 9-sum
single row (no shuffle beyond the final partial-agg tree); β rides a
broadcast one-row frame back.  10^12 rows × 2 iterations = 2 scans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["logreg_irls", "kmeans_fixed", "ipw_ate", "aipw_ate", "logreg_by_key", "poisreg_irls"]


def _snap(col) -> F.Column:
    return F.round(col * 1e6).cast("long")


def logreg_irls(df: DataFrame, *, x1_col, x2_col, label_expr: str,
                iters: int = 2) -> DataFrame:
    """Fit P(y=1) = σ(β₀ + β₁x₁ + β₂x₂) with ``iters`` unrolled IRLS
    steps from β = 0.  ``x1_col``/``x2_col`` are Column expressions
    (snapped to micro-units on ingestion); ``label_expr`` a SQL
    boolean.  Returns one row: n, beta0_micro, beta1_micro,
    beta2_micro (and the final iteration's determinant for a
    singularity witness — det 0 means collinear features, betas NULL).
    """
    y = F.when(F.expr(label_expr), 1.0).otherwise(0.0)
    x1 = _snap(F.col(x1_col).cast("double") if isinstance(x1_col, str)
               else x1_col.cast("double"))
    x2 = _snap(F.col(x2_col).cast("double") if isinstance(x2_col, str)
               else x2_col.cast("double"))
    base = (df.filter(x1.isNotNull() & x2.isNotNull())
            .select(y.alias("y"),
                    (x1.cast("double") / F.lit(1e6)).alias("x1"),
                    (x2.cast("double") / F.lit(1e6)).alias("x2")))

    beta = None  # one-row frame (b0m, b1m, b2m) or None for β = 0

    for _ in range(int(iters)):
        if beta is None:
            it = base.withColumn("eta", F.lit(0.0))
        else:
            it = base.crossJoin(F.broadcast(beta)).withColumn(
                "eta",
                (F.col("b0m").cast("double")
                 + F.col("b1m").cast("double") * F.col("x1")
                 + F.col("b2m").cast("double") * F.col("x2"))
                / F.lit(1e6))
        it = (it
              .withColumn("mu", F.lit(1.0)
                          / (F.lit(1.0) + F.exp(-F.col("eta"))))
              .withColumn("w", F.col("mu") * (F.lit(1.0) - F.col("mu")))
              .withColumn("z", F.col("eta")
                          + (F.col("y") - F.col("mu")) / F.col("w")))
        w, x1c, x2c, z = (F.col("w"), F.col("x1"), F.col("x2"),
                          F.col("z"))
        sums = it.agg(
            F.count("*").alias("n"),
            F.sum(_snap(w)).alias("s11"),
            F.sum(_snap(w * x1c)).alias("s12"),
            F.sum(_snap(w * x2c)).alias("s13"),
            F.sum(_snap(w * x1c * x1c)).alias("s22"),
            F.sum(_snap(w * x1c * x2c)).alias("s23"),
            F.sum(_snap(w * x2c * x2c)).alias("s33"),
            F.sum(_snap(w * z)).alias("t1"),
            F.sum(_snap(w * z * x1c)).alias("t2"),
            F.sum(_snap(w * z * x2c)).alias("t3"))
        d = {c: F.col(c).cast("double")
             for c in ("s11", "s12", "s13", "s22", "s23", "s33",
                       "t1", "t2", "t3")}
        m11 = d["s22"] * d["s33"] - d["s23"] * d["s23"]
        m12 = d["s12"] * d["s33"] - d["s23"] * d["s13"]
        m13 = d["s12"] * d["s23"] - d["s22"] * d["s13"]
        det = d["s11"] * m11 - d["s12"] * m12 + d["s13"] * m13
        det0 = (d["t1"] * m11
                - d["s12"] * (d["t2"] * d["s33"] - d["s23"] * d["t3"])
                + d["s13"] * (d["t2"] * d["s23"] - d["s22"] * d["t3"]))
        det1 = (d["s11"] * (d["t2"] * d["s33"] - d["s23"] * d["t3"])
                - d["t1"] * m12
                + d["s13"] * (d["s12"] * d["t3"] - d["t2"] * d["s13"]))
        det2 = (d["s11"] * (d["s22"] * d["t3"] - d["t2"] * d["s23"])
                - d["s12"] * (d["s12"] * d["t3"] - d["t2"] * d["s13"])
                + d["t1"] * m13)
        nz = det != F.lit(0.0)
        beta = sums.select(
            F.col("n"),
            F.when(nz, F.round(det0 / det * 1e6).cast("long"))
            .alias("b0m"),
            F.when(nz, F.round(det1 / det * 1e6).cast("long"))
            .alias("b1m"),
            F.when(nz, F.round(det2 / det * 1e6).cast("long"))
            .alias("b2m"),
            det.alias("det"))
        # a singular system poisons the next iteration's eta to NULL;
        # callers read det == 0.0 as the collinearity witness
        beta = beta.select("n", "b0m", "b1m", "b2m", "det")

    return beta.select(
        "n",
        F.col("b0m").alias("beta0_micro"),
        F.col("b1m").alias("beta1_micro"),
        F.col("b2m").alias("beta2_micro"),
        F.round(F.col("det"), 2).alias("det_rounded"))


def kmeans_fixed(df: DataFrame, *, id_col: str = "vec_id",
                 vec_col: str = "embedding", k: int = 4,
                 rounds: int = 2) -> DataFrame:
    """Distributed Lloyd's k-means, exactly reproducible across engines
    and cluster sizes — the missing sibling of ``ivf_train_centroids``
    (which trains on a bounded 2048-row SAMPLE, FAISS-style): here the
    centroid updates see EVERY row, fully distributed, and the whole
    fit is a pure function of the data.

    Exactness discipline (mirrors ``logreg_irls``):

    * coordinates snap once to integer micro-units; every point-to-
      centroid distance is an exact integer Σ(x−c)² accumulated in
      DECIMAL(38,0) (Σ over 10³ dims of (2·10⁸µ)² diffs crosses int64);
    * seeding is the k rows with the smallest (md5(id), id) — a
      deterministic TakeOrdered, never RNG or partition order;
    * assignment is argmin by the exact pair (distance, cid) — no
      float can tie-break differently on another engine;
    * centroid updates re-snap: c_dim = round(Σx / n) as one fixed-
      order double division of exact integers; a cluster that loses
      all members KEEPS its previous centroid (pinned) rather than
      degenerating;
    * iterations are UNROLLED (fixed ``rounds``, default 2) — the
      fixed-rounds honesty contract shared with k-core and IRLS, so a
      DuckDB oracle can replay every integer move-for-move.

    Scale shape: assignment is SCAN-STAGE — centroids ride a broadcast
    one-row array-of-structs frame and the k·d argmin arithmetic runs
    inside ``F.aggregate`` (no row×k expansion, no shuffle); each
    update is one (cid, dim) partial-agg exchange whose reduced size is
    k·d cells regardless of corpus size.  10^12 rows × 2 rounds =
    3 scans (2 updates + final assignment).  Centroid lineage is
    lazily localCheckpoint-truncated per round (the k-core lesson:
    nested per-round plans otherwise double and Catalyst planning
    explodes long before execution does).

    Rows with NULL or empty vectors are not observations and are
    excluded.  Output per row: (id_col, cluster, dist2) with dist2 the
    squared L2 distance to the winning centroid in original units².
    """
    cents = kmeans_fixed_centroids(df, id_col=id_col, vec_col=vec_col,
                                   k=k, rounds=rounds)
    final = kmeans_assign(df, cents, id_col=id_col, vec_col=vec_col)
    return final.select(
        F.col("id").alias(id_col),
        "cluster",
        F.round(F.col("__d").cast("double") / F.lit(1e12), 6)
        .alias("dist2"))


def _kmeans_base(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    xm = F.transform(F.col(vec_col),
                     lambda v: F.round(v.cast("double") * 1e6)
                     .cast("long"))
    return (df.filter(F.col(vec_col).isNotNull()
                      & (F.size(F.col(vec_col)) > 0))
            .select(F.col(id_col).alias("id"), xm.alias("__xm")))


def _kmeans_assign_base(base: DataFrame, cents: DataFrame) -> DataFrame:
    """(id, __xm, cluster, __d): exact-integer argmin over the
    broadcast sorted centroid array — kmeans_fixed's scan-stage
    assignment, shared with the exact IVF / SemDeDup paths."""
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    one = cents.groupBy().agg(
        F.sort_array(F.collect_list(F.struct("cid", "__c")))
        .alias("__cents"))

    def d_of(carr):
        return F.aggregate(
            F.zip_with(F.col("__xm"), carr, lambda a, b: a - b),
            F.lit(0).cast("decimal(38,0)"),
            lambda s, v: s + dec(v) * dec(v))

    zero = F.struct(F.lit(-1).cast("int").alias("cid"),
                    F.lit(None).cast("decimal(38,0)").alias("d"))

    def merge(acc, c):
        d = d_of(c["__c"])
        better = (acc["cid"] == F.lit(-1)) | (d < acc["d"])
        return (F.when(better, F.struct(c["cid"].alias("cid"),
                                        d.alias("d")))
                .otherwise(acc))

    best = F.aggregate(F.col("__cents"), zero, merge)
    return (base.crossJoin(F.broadcast(one))
            .select("id", "__xm", best["cid"].alias("cluster"),
                    best["d"].alias("__d")))


def kmeans_fixed_centroids(df: DataFrame, *, id_col: str = "vec_id",
                           vec_col: str = "embedding", k: int = 4,
                           rounds: int = 2) -> DataFrame:
    """The centroid half of :func:`kmeans_fixed`, exposed so the exact
    IVF / SemDeDup paths can train on the SAME fully-deterministic,
    oracle-replayable machinery: returns ``(cid int, __c array<long>)``
    micro-unit centroids after ``rounds`` unrolled Lloyd updates (md5
    seeding, exact-integer argmin, re-snapped means, empty clusters
    keep their previous centroid — see kmeans_fixed's docstring)."""
    from pyspark.sql import Window

    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    base = _kmeans_base(df, id_col, vec_col)

    seed_h = F.md5(F.col("id").cast("string").cast("binary"))
    seeds = (base.select("id", "__xm", seed_h.alias("__h"))
             .orderBy("__h", "id").limit(int(k)))
    cents = seeds.select(
        (F.row_number().over(Window.orderBy("__h", "id")) - 1)
        .cast("int").alias("cid"),
        F.col("__xm").alias("__c"))

    for _ in range(int(rounds)):
        assigned = _kmeans_assign_base(base, cents)
        upd = (assigned.select(F.col("cluster").alias("cid"),
                               F.posexplode("__xm").alias("dim", "v"))
               .groupBy("cid", "dim")
               .agg(F.round(F.sum(dec(F.col("v"))).cast("double")
                            / F.count("*").cast("double"))
                    .cast("long").alias("__vn")))
        prev_tall = cents.select(
            "cid", F.posexplode("__c").alias("dim", "__vp"))
        merged = (prev_tall.join(upd, ["cid", "dim"], "left")
                  .select("cid", "dim",
                          F.coalesce("__vn", "__vp").alias("v")))
        cents = (merged.groupBy("cid")
                 .agg(F.transform(
                     F.sort_array(F.collect_list(F.struct("dim", "v"))),
                     lambda s: s["v"]).alias("__c"))
                 .localCheckpoint(eager=False))
    return cents


def kmeans_assign(df: DataFrame, cents: DataFrame, *,
                  id_col: str = "vec_id",
                  vec_col: str = "embedding") -> DataFrame:
    """Assign every row of ``df`` to its exact-nearest centroid from
    :func:`kmeans_fixed_centroids`: (id, __xm, cluster, __d)."""
    return _kmeans_assign_base(_kmeans_base(df, id_col, vec_col), cents)


def ipw_ate(df: DataFrame, *, treat_expr: str, outcome_col: str,
            x1_col, x2_col, iters: int = 2,
            trim_micro: int = 1000) -> DataFrame:
    """Inverse-propensity-weighted average treatment effect — the
    observational-causal estimator completing the wing next to
    Mantel–Haenszel (stratified 2×2) and CUPED (randomized variance
    reduction): when treatment is NOT randomized, the naive
    difference-in-means mixes the effect with selection (users who
    sign up were already more active); weighting each unit by
    1/P(treatment observed | x) re-balances the two arms on the
    measured covariates.

    The propensity model is the engine's own exact-replay IRLS
    logistic regression (``logreg_irls``, 2 unrolled iterations from
    β = 0) — so the ENTIRE estimator, model included, is a pure
    function of the data: e(x) = σ(β·x) snaps to a micro-integer
    clamped to [trim, 1e6−trim] (overlap trimming, the standard
    guard against exploding weights — ε = trim/1e6, default 0.001),
    per-unit weighted terms w = round(1e12/e_µ) and
    wy = round(y_µ·1e6/e_µ) snap BEFORE aggregation (order-independent
    DECIMAL(38,0) sums), and three estimators come out of the same
    integer sufficient statistics with fixed-order final divisions:

    * ``ate_naive`` — difference in raw means (the confounded number,
      shipped so the adjustment is visible);
    * ``ate_ipw`` — Horvitz–Thompson (Σ_t wy − Σ_c wy)/(N·1e6);
    * ``ate_hajek`` — self-normalized Σwy/Σw per arm (the stabilized
      estimator that tolerates propensity miscalibration).

    A singular propensity fit (det = 0, collinear covariates)
    propagates NULL estimates loudly rather than silently falling
    back to naive.  Exactness envelope: y_µ·1e6 must stay within
    2^53 (|y| ≤ ~9·10³ in original units) — use counts or means, not
    corpus-scale sums, as the outcome.

    Scale: one unit-level pass per IRLS iteration (inherited), one
    final weighted pass; betas ride one broadcast row.  Output is one
    row: (n, n_treated, beta0_micro, beta1_micro, beta2_micro,
    ate_naive, ate_ipw, ate_hajek).
    """
    d38 = lambda c: c.cast("decimal(38,0)")
    t = F.when(F.expr(treat_expr), 1).otherwise(0)
    x1 = _snap(F.col(x1_col).cast("double") if isinstance(x1_col, str)
               else x1_col.cast("double"))
    x2 = _snap(F.col(x2_col).cast("double") if isinstance(x2_col, str)
               else x2_col.cast("double"))
    y_mu = F.round(F.col(outcome_col).cast("double") * 1e6).cast("long")
    base = (df.filter(x1.isNotNull() & x2.isNotNull()
                      & y_mu.isNotNull())
            .select(t.alias("t"),
                    (x1.cast("double") / F.lit(1e6)).alias("x1"),
                    (x2.cast("double") / F.lit(1e6)).alias("x2"),
                    y_mu.alias("ym")))

    beta = logreg_irls(df, x1_col=x1_col, x2_col=x2_col,
                       label_expr=treat_expr, iters=iters)
    j = base.crossJoin(F.broadcast(
        beta.select(F.col("beta0_micro").alias("b0m"),
                    F.col("beta1_micro").alias("b1m"),
                    F.col("beta2_micro").alias("b2m"))))
    eta = (F.col("b0m").cast("double")
           + F.col("b1m").cast("double") * F.col("x1")
           + F.col("b2m").cast("double") * F.col("x2")) / F.lit(1e6)
    tm = int(trim_micro)
    # guard the clamp behind a NULL check: Spark's greatest/least SKIP
    # nulls, so a singular fit (eta NULL) would silently clamp to the
    # trim floor instead of propagating NULL loudly
    e_mu = F.when(eta.isNotNull(), F.greatest(F.lit(tm), F.least(
        F.lit(1_000_000 - tm),
        F.round(F.lit(1e6) / (F.lit(1.0) + F.exp(-eta))).cast("long"))))
    den = F.when(F.col("t") == 1, e_mu).otherwise(F.lit(1_000_000) - e_mu)
    w_mu = F.round(F.lit(1e12) / den.cast("double")).cast("long")
    wy_mu = F.round(F.col("ym").cast("double") * F.lit(1e6)
                    / den.cast("double")).cast("long")
    j = j.select("t", "ym", w_mu.alias("wm"), wy_mu.alias("wym"),
                 "b0m", "b1m", "b2m")
    agg = j.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("t").cast("long").alias("n_treated"),
        F.max("b0m").alias("beta0_micro"),
        F.max("b1m").alias("beta1_micro"),
        F.max("b2m").alias("beta2_micro"),
        F.sum(F.when(F.col("t") == 1, d38(F.col("ym")))).alias("__yt"),
        F.sum(F.when(F.col("t") == 0, d38(F.col("ym")))).alias("__yc"),
        F.sum(F.when(F.col("t") == 1, d38(F.col("wym")))).alias("__wyt"),
        F.sum(F.when(F.col("t") == 0, d38(F.col("wym")))).alias("__wyc"),
        F.sum(F.when(F.col("t") == 1, d38(F.col("wm")))).alias("__wt"),
        F.sum(F.when(F.col("t") == 0, d38(F.col("wm")))).alias("__wc"))
    n_d = F.col("n").cast("double")
    nt_d = F.col("n_treated").cast("double")
    nc_d = (F.col("n") - F.col("n_treated")).cast("double")
    naive = (F.col("__yt").cast("double") / nt_d
             - F.col("__yc").cast("double") / nc_d) / F.lit(1e6)
    ipw = (F.col("__wyt").cast("double")
           - F.col("__wyc").cast("double")) / n_d / F.lit(1e6)
    hajek = (F.col("__wyt").cast("double") / F.col("__wt").cast("double")
             - F.col("__wyc").cast("double")
             / F.col("__wc").cast("double"))
    return agg.select(
        "n", "n_treated", "beta0_micro", "beta1_micro", "beta2_micro",
        F.round(naive, 6).alias("ate_naive"),
        F.round(ipw, 6).alias("ate_ipw"),
        F.round(hajek, 6).alias("ate_hajek"))


def aipw_ate(df: DataFrame, *, treat_expr: str, outcome_col: str,
             x1_col, x2_col, iters: int = 2,
             trim_micro: int = 1000) -> DataFrame:
    """Augmented IPW (doubly-robust) average treatment effect — the
    estimator that stays consistent if EITHER the propensity model OR
    the outcome model is right (Robins, Rotnitzky & Zhao 1994,
    public), completing the causal wing above ``ipw_ate``:

        ATE = (1/n) Σ [ m̂₁(x) − m̂₀(x)
                        + t·(y − m̂₁(x))/ê(x)
                        − (1−t)·(y − m̂₀(x))/(1−ê(x)) ]

    ê from the engine's exact-replay IRLS logistic fit (trimmed
    micro-integer, the ``ipw_ate`` discipline); m̂₀/m̂₁ from one exact
    per-arm OLS pass — the same snapped-sufficient-statistics / fixed-
    operand-order Cramer solve as the IRLS inner step, with unit
    weights (16 conditional sums, ONE scan for both arms).  Every
    per-row term (the model-difference m̂₁−m̂₀ and both weighted
    corrections) snaps to a micro-integer BEFORE the order-independent
    DECIMAL(38,0) sum; one fixed-order division ends it.  Any singular
    fit (propensity or either arm's OLS) propagates NULL loudly.

    Scale: 2 IRLS scans + 1 OLS scan + 1 scoring scan; all model
    coefficients ride broadcast one-row frames.  Output one row:
    (n, n_treated, ate_aipw, b1_out_treated_micro,
    b1_out_control_micro).
    """
    d38 = lambda c: c.cast("decimal(38,0)")
    t = F.when(F.expr(treat_expr), 1).otherwise(0)
    x1 = _snap(F.col(x1_col).cast("double") if isinstance(x1_col, str)
               else x1_col.cast("double"))
    x2 = _snap(F.col(x2_col).cast("double") if isinstance(x2_col, str)
               else x2_col.cast("double"))
    y_mu = F.round(F.col(outcome_col).cast("double") * 1e6).cast("long")
    base = (df.filter(x1.isNotNull() & x2.isNotNull()
                      & y_mu.isNotNull())
            .select(t.alias("t"),
                    (x1.cast("double") / F.lit(1e6)).alias("x1"),
                    (x2.cast("double") / F.lit(1e6)).alias("x2"),
                    y_mu.alias("ym")))
    yd = F.col("ym").cast("double") / F.lit(1e6)

    # one scan: per-arm OLS sufficient statistics, µ-snapped per row
    def arm_sums(arm: int):
        c = F.col("t") == arm
        sfx = f"_{arm}"
        one = F.lit(1.0)
        return [
            F.sum(F.when(c, _snap(one))).alias(f"s11{sfx}"),
            F.sum(F.when(c, _snap(F.col("x1")))).alias(f"s12{sfx}"),
            F.sum(F.when(c, _snap(F.col("x2")))).alias(f"s13{sfx}"),
            F.sum(F.when(c, _snap(F.col("x1") * F.col("x1"))))
            .alias(f"s22{sfx}"),
            F.sum(F.when(c, _snap(F.col("x1") * F.col("x2"))))
            .alias(f"s23{sfx}"),
            F.sum(F.when(c, _snap(F.col("x2") * F.col("x2"))))
            .alias(f"s33{sfx}"),
            F.sum(F.when(c, _snap(yd))).alias(f"t1{sfx}"),
            F.sum(F.when(c, _snap(yd * F.col("x1")))).alias(f"t2{sfx}"),
            F.sum(F.when(c, _snap(yd * F.col("x2")))).alias(f"t3{sfx}"),
        ]

    sums = base.agg(*(arm_sums(0) + arm_sums(1)))

    def cramer(sfx: str):
        d = {c: F.col(f"{c}{sfx}").cast("double")
             for c in ("s11", "s12", "s13", "s22", "s23", "s33",
                       "t1", "t2", "t3")}
        m11 = d["s22"] * d["s33"] - d["s23"] * d["s23"]
        m12 = d["s12"] * d["s33"] - d["s23"] * d["s13"]
        m13 = d["s12"] * d["s23"] - d["s22"] * d["s13"]
        det = d["s11"] * m11 - d["s12"] * m12 + d["s13"] * m13
        det0 = (d["t1"] * m11
                - d["s12"] * (d["t2"] * d["s33"] - d["s23"] * d["t3"])
                + d["s13"] * (d["t2"] * d["s23"] - d["s22"] * d["t3"]))
        det1 = (d["s11"] * (d["t2"] * d["s33"] - d["s23"] * d["t3"])
                - d["t1"] * m12
                + d["s13"] * (d["s12"] * d["t3"] - d["t2"] * d["s13"]))
        det2 = (d["s11"] * (d["s22"] * d["t3"] - d["t2"] * d["s23"])
                - d["s12"] * (d["s12"] * d["t3"] - d["t2"] * d["s13"])
                + d["t1"] * m13)
        nz = det != F.lit(0.0)
        return [F.when(nz, F.round(det0 / det * 1e6).cast("long"))
                .alias(f"ob0{sfx}"),
                F.when(nz, F.round(det1 / det * 1e6).cast("long"))
                .alias(f"ob1{sfx}"),
                F.when(nz, F.round(det2 / det * 1e6).cast("long"))
                .alias(f"ob2{sfx}")]

    ols = sums.select(*(cramer("_0") + cramer("_1")))

    beta_e = logreg_irls(df, x1_col=x1_col, x2_col=x2_col,
                         label_expr=treat_expr, iters=iters)
    j = (base.crossJoin(F.broadcast(
            beta_e.select(F.col("beta0_micro").alias("b0m"),
                          F.col("beta1_micro").alias("b1m"),
                          F.col("beta2_micro").alias("b2m"))))
         .crossJoin(F.broadcast(ols)))
    eta = (F.col("b0m").cast("double")
           + F.col("b1m").cast("double") * F.col("x1")
           + F.col("b2m").cast("double") * F.col("x2")) / F.lit(1e6)
    tm = int(trim_micro)
    e_mu = F.when(eta.isNotNull(), F.greatest(F.lit(tm), F.least(
        F.lit(1_000_000 - tm),
        F.round(F.lit(1e6) / (F.lit(1.0) + F.exp(-eta))).cast("long"))))

    def mhat(sfx: str):
        return (F.col(f"ob0{sfx}").cast("double")
                + F.col(f"ob1{sfx}").cast("double") * F.col("x1")
                + F.col(f"ob2{sfx}").cast("double") * F.col("x2")) \
            / F.lit(1e6)

    mu0, mu1 = mhat("_0"), mhat("_1")
    dm = F.round((mu1 - mu0) * F.lit(1e6)).cast("long")
    corr1 = F.when(F.col("t") == 1,
                   F.round((yd - mu1) * F.lit(1e12)
                           / e_mu.cast("double")).cast("long")) \
        .otherwise(F.lit(0))
    corr0 = F.when(F.col("t") == 0,
                   F.round((yd - mu0) * F.lit(1e12)
                           / (F.lit(1_000_000) - e_mu).cast("double"))
                   .cast("long")).otherwise(F.lit(0))
    j = j.select("t", dm.alias("dm"), corr1.alias("c1"),
                 corr0.alias("c0"),
                 F.col("ob1_1").alias("__ow1"),
                 F.col("ob1_0").alias("__ow0"))
    agg = j.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("t").cast("long").alias("n_treated"),
        F.max("__ow1").alias("b1_out_treated_micro"),
        F.max("__ow0").alias("b1_out_control_micro"),
        F.sum(d38(F.col("dm"))).alias("__sdm"),
        F.sum(d38(F.col("c1"))).alias("__sc1"),
        F.sum(d38(F.col("c0"))).alias("__sc0"))
    ate = (F.col("__sdm").cast("double") + F.col("__sc1").cast("double")
           - F.col("__sc0").cast("double")) \
        / F.col("n").cast("double") / F.lit(1e6)
    return agg.select("n", "n_treated",
                      F.round(ate, 6).alias("ate_aipw"),
                      "b1_out_treated_micro", "b1_out_control_micro")


def logreg_by_key(df: DataFrame, *, key_col: str, x1_col, x2_col,
                  label_expr: str, iters: int = 2) -> DataFrame:
    """Per-key IRLS logistic regression — one exact-replay GLM per
    segment (per domain, per cohort, per source) in the same job: the
    grouped twin of ``logreg_irls``, for the pipeline shape where a
    single pooled model hides segment heterogeneity (Simpson's again)
    and fitting 10⁵ segment models one driver loop at a time is the
    scale failure.

    Identical exactness discipline per key: µ-snapped per-row normal-
    equation contributions, order-independent int64 sums, fixed-
    operand-order Cramer, unrolled iterations with β re-snapped.  Each
    iteration is ONE groupBy(key) partial-agg pass producing a 9-sum
    row per key, joined back keyed (β frames are keys-sized, never
    assumed broadcastable); singular keys carry NULL βs through
    remaining iterations and report NULL det — per-key, not
    job-fatal.

    Output per key: (key_col, n, beta0_micro, beta1_micro,
    beta2_micro, singular).  The pooled operator reports the raw
    rounded determinant; per key that value is emitted as the BOOLEAN
    ``singular`` instead — the det double's last ULP is not stable
    cross-engine when one key holds a w·z micro-snap tie (observed:
    one cohort's det differed by 2 ulps at 9.2e27 while every β
    matched), and the magnitude carries no information the flag
    doesn't.
    """
    y = F.when(F.expr(label_expr), 1.0).otherwise(0.0)
    x1 = _snap(F.col(x1_col).cast("double") if isinstance(x1_col, str)
               else x1_col.cast("double"))
    x2 = _snap(F.col(x2_col).cast("double") if isinstance(x2_col, str)
               else x2_col.cast("double"))
    base = (df.filter(x1.isNotNull() & x2.isNotNull())
            .select(F.col(key_col).alias("key"), y.alias("y"),
                    (x1.cast("double") / F.lit(1e6)).alias("x1"),
                    (x2.cast("double") / F.lit(1e6)).alias("x2")))

    beta = None  # keys-sized frame (key, b0m, b1m, b2m) or None

    for _ in range(int(iters)):
        if beta is None:
            it = base.withColumn("eta", F.lit(0.0))
        else:
            it = base.join(beta, "key").withColumn(
                "eta",
                (F.col("b0m").cast("double")
                 + F.col("b1m").cast("double") * F.col("x1")
                 + F.col("b2m").cast("double") * F.col("x2"))
                / F.lit(1e6))
        it = (it
              .withColumn("mu", F.lit(1.0)
                          / (F.lit(1.0) + F.exp(-F.col("eta"))))
              .withColumn("w", F.col("mu") * (F.lit(1.0) - F.col("mu")))
              .withColumn("z", F.col("eta")
                          + (F.col("y") - F.col("mu")) / F.col("w")))
        w, x1c, x2c, z = (F.col("w"), F.col("x1"), F.col("x2"),
                          F.col("z"))
        sums = it.groupBy("key").agg(
            F.count("*").alias("n"),
            F.sum(_snap(w)).alias("s11"),
            F.sum(_snap(w * x1c)).alias("s12"),
            F.sum(_snap(w * x2c)).alias("s13"),
            F.sum(_snap(w * x1c * x1c)).alias("s22"),
            F.sum(_snap(w * x1c * x2c)).alias("s23"),
            F.sum(_snap(w * x2c * x2c)).alias("s33"),
            F.sum(_snap(w * z)).alias("t1"),
            F.sum(_snap(w * z * x1c)).alias("t2"),
            F.sum(_snap(w * z * x2c)).alias("t3"))
        d = {c: F.col(c).cast("double")
             for c in ("s11", "s12", "s13", "s22", "s23", "s33",
                       "t1", "t2", "t3")}
        m11 = d["s22"] * d["s33"] - d["s23"] * d["s23"]
        m12 = d["s12"] * d["s33"] - d["s23"] * d["s13"]
        m13 = d["s12"] * d["s23"] - d["s22"] * d["s13"]
        det = d["s11"] * m11 - d["s12"] * m12 + d["s13"] * m13
        det0 = (d["t1"] * m11
                - d["s12"] * (d["t2"] * d["s33"] - d["s23"] * d["t3"])
                + d["s13"] * (d["t2"] * d["s23"] - d["s22"] * d["t3"]))
        det1 = (d["s11"] * (d["t2"] * d["s33"] - d["s23"] * d["t3"])
                - d["t1"] * m12
                + d["s13"] * (d["s12"] * d["t3"] - d["t2"] * d["s13"]))
        det2 = (d["s11"] * (d["s22"] * d["t3"] - d["t2"] * d["s23"])
                - d["s12"] * (d["s12"] * d["t3"] - d["t2"] * d["s13"])
                + d["t1"] * m13)
        nz = det != F.lit(0.0)
        beta = (sums.select(
            "key", F.col("n"),
            F.when(nz, F.round(det0 / det * 1e6).cast("long"))
            .alias("b0m"),
            F.when(nz, F.round(det1 / det * 1e6).cast("long"))
            .alias("b1m"),
            F.when(nz, F.round(det2 / det * 1e6).cast("long"))
            .alias("b2m"),
            det.alias("det"))
            .localCheckpoint(eager=False))

    return beta.select(
        F.col("key").alias(key_col), "n",
        F.col("b0m").alias("beta0_micro"),
        F.col("b1m").alias("beta1_micro"),
        F.col("b2m").alias("beta2_micro"),
        (F.col("det") == F.lit(0.0)).alias("singular"))


def psm_att(df: DataFrame, *, id_col: str, treat_expr: str,
            outcome_col: str, x1_col, x2_col, iters: int = 2,
            trim_micro: int = 1000, n_buckets: int = 64) -> DataFrame:
    """Propensity-score matching ATT — the third leg of the
    observational-causal wing (weighting: ``ipw_ate``/``aipw_ate``;
    stratification: ``mantel_haenszel``; matching: this): each TREATED
    unit is matched to its nearest CONTROL on the propensity axis
    (1-NN with replacement), and the average treatment effect on the
    treated is the mean matched outcome difference.

    Nearest-on-a-sorted-axis needs no pair join: with propensities as
    trimmed micro-integers (the ``ipw_ate`` IRLS + clamp discipline)
    and a (e_µ, id) total order, a treated unit's candidates are
    exactly its closest control AT-OR-BEFORE and its closest control
    STRICTLY-AFTER — two ignore-nulls window passes; the nearer by
    |Δe_µ| wins, ties to the preceding control (all integer
    comparisons).  Per-match outcome differences are exact integers
    summed in DECIMAL(38,0); one fixed-order division ends it.

    The global order runs the two-phase machinery over the KNOWN
    trimmed domain [trim, 1e6−trim] (no bounds pass): in-bucket
    ignore-nulls last/first windows at n_buckets-way parallelism plus
    two broadcast n_buckets-row boundary frames (each bucket's last /
    first control) — no single-partition window.

    Treated units with no control on either side are unmatched and
    excluded (reported via n_matched).  A singular propensity fit
    propagates NULL loudly.

    Output one row: (n, n_treated, n_matched, att).
    """
    from pyspark.sql import Window

    d38 = lambda c: c.cast("decimal(38,0)")
    B = int(n_buckets)
    t = F.when(F.expr(treat_expr), 1).otherwise(0)
    x1 = _snap(F.col(x1_col).cast("double") if isinstance(x1_col, str)
               else x1_col.cast("double"))
    x2 = _snap(F.col(x2_col).cast("double") if isinstance(x2_col, str)
               else x2_col.cast("double"))
    y_mu = F.round(F.col(outcome_col).cast("double") * 1e6).cast("long")
    base = (df.filter(x1.isNotNull() & x2.isNotNull()
                      & y_mu.isNotNull())
            .select(F.col(id_col).cast("string").alias("id"),
                    t.alias("t"),
                    (x1.cast("double") / F.lit(1e6)).alias("x1"),
                    (x2.cast("double") / F.lit(1e6)).alias("x2"),
                    y_mu.alias("ym")))
    beta = logreg_irls(df, x1_col=x1_col, x2_col=x2_col,
                       label_expr=treat_expr, iters=iters)
    j = base.crossJoin(F.broadcast(
        beta.select(F.col("beta0_micro").alias("b0m"),
                    F.col("beta1_micro").alias("b1m"),
                    F.col("beta2_micro").alias("b2m"))))
    eta = (F.col("b0m").cast("double")
           + F.col("b1m").cast("double") * F.col("x1")
           + F.col("b2m").cast("double") * F.col("x2")) / F.lit(1e6)
    tm = int(trim_micro)
    e_mu = F.when(eta.isNotNull(), F.greatest(F.lit(tm), F.least(
        F.lit(1_000_000 - tm),
        F.round(F.lit(1e6) / (F.lit(1.0) + F.exp(-eta))).cast("long"))))
    step = 1_000_000 // B + 1
    r = (j.select("id", "t", "ym", e_mu.alias("e"))
         .withColumn("__b", (F.col("e") / F.lit(step))
                     .cast("long").cast("int")))
    ce = F.when(F.col("t") == 0, F.col("e"))
    cy = F.when(F.col("t") == 0, F.col("ym"))
    w_prev = (Window.partitionBy("__b").orderBy("e", "id")
              .rowsBetween(Window.unboundedPreceding, 0))
    w_next = (Window.partitionBy("__b").orderBy("e", "id")
              .rowsBetween(1, Window.unboundedFollowing))
    r = (r.withColumn("__pe", F.last(ce, ignorenulls=True).over(w_prev))
         .withColumn("__py", F.last(cy, ignorenulls=True).over(w_prev))
         .withColumn("__ne", F.first(ce, ignorenulls=True).over(w_next))
         .withColumn("__ny", F.first(cy, ignorenulls=True)
                     .over(w_next)))
    # bucket boundary frames: each bucket's last / first control
    bnd = r.groupBy("__b").agg(
        F.max(F.when(F.col("t") == 0,
                     F.struct("e", "id", "ym"))).alias("__last_c"),
        F.min(F.when(F.col("t") == 0,
                     F.struct("e", "id", "ym"))).alias("__first_c"))
    w_bp = (Window.orderBy("__b")
            .rowsBetween(Window.unboundedPreceding, -1))
    w_bn = Window.orderBy("__b").rowsBetween(1, Window.unboundedFollowing)
    boff = bnd.select(
        "__b",
        F.last("__last_c", ignorenulls=True).over(w_bp).alias("__bp"),
        F.first("__first_c", ignorenulls=True).over(w_bn).alias("__bn"))
    r = r.join(F.broadcast(boff), "__b")
    pe = F.coalesce(F.col("__pe"), F.col("__bp.e"))
    py = F.coalesce(F.col("__py"), F.col("__bp.ym"))
    ne = F.coalesce(F.col("__ne"), F.col("__bn.e"))
    ny = F.coalesce(F.col("__ny"), F.col("__bn.ym"))
    use_prev = pe.isNotNull() & (ne.isNull()
                                 | ((F.col("e") - pe)
                                    <= (ne - F.col("e"))))
    my = F.when(use_prev, py).otherwise(ny)
    tr = r.filter(F.col("t") == 1).select(
        "ym", my.alias("my"))
    tot = r.agg(F.count("*").cast("long").alias("n"),
                F.sum("t").cast("long").alias("n_treated"))
    agg = tr.agg(
        F.sum(F.when(F.col("my").isNotNull(), 1).otherwise(0))
        .cast("long").alias("n_matched"),
        F.sum(F.when(F.col("my").isNotNull(),
                     d38(F.col("ym") - F.col("my")))).alias("__sd"))
    out = tot.crossJoin(F.broadcast(agg))
    att = (F.col("__sd").cast("double")
           / F.col("n_matched").cast("double") / F.lit(1e6))
    return out.select("n", "n_treated", "n_matched",
                      F.round(att, 6).alias("att"))


def poisreg_irls(df: DataFrame, *, x1_col, x2_col, count_expr: str,
                 iters: int = 2) -> DataFrame:
    """Poisson regression by IRLS — the COUNT-outcome GLM completing
    the family next to the logistic (binary) fit: purchases per user,
    errors per host, links per page are counts, and modeling them
    with OLS ignores the variance-mean coupling while logistic can't
    see magnitude.  log-link: E[y] = exp(β₀ + β₁x₁ + β₂x₂).

    Same exact-replay discipline as ``logreg_irls`` with the Poisson
    working quantities (µ = exp(η), w = µ, z = η + (y−µ)/µ, from
    β = 0 where µ = 1): per-row contributions µ-snapped BEFORE the
    order-independent sums, fixed-operand-order Cramer, unrolled
    iterations, singular systems report det 0 with NULL βs.  One
    map-side-combined scan per iteration.

    ``count_expr`` is a SQL expression yielding the non-negative
    count.  Output one row: (n, beta0_micro, beta1_micro,
    beta2_micro, singular) — like ``logreg_by_key``, the det
    magnitude is emitted as a BOOLEAN: the Poisson working weights
    (exp(η)) produce per-row snap ties whose det double differs in
    the last ulps cross-engine while every β matches (observed at
    1.18e41), and the magnitude carries nothing the flag doesn't.
    """
    y = F.expr(count_expr).cast("double")
    x1 = _snap(F.col(x1_col).cast("double") if isinstance(x1_col, str)
               else x1_col.cast("double"))
    x2 = _snap(F.col(x2_col).cast("double") if isinstance(x2_col, str)
               else x2_col.cast("double"))
    base = (df.filter(x1.isNotNull() & x2.isNotNull() & y.isNotNull())
            .select(y.alias("y"),
                    (x1.cast("double") / F.lit(1e6)).alias("x1"),
                    (x2.cast("double") / F.lit(1e6)).alias("x2")))

    beta = None

    for _ in range(int(iters)):
        if beta is None:
            it = base.withColumn("eta", F.lit(0.0))
        else:
            it = base.crossJoin(F.broadcast(beta)).withColumn(
                "eta",
                (F.col("b0m").cast("double")
                 + F.col("b1m").cast("double") * F.col("x1")
                 + F.col("b2m").cast("double") * F.col("x2"))
                / F.lit(1e6))
        it = (it.withColumn("mu", F.exp(F.col("eta")))
              .withColumn("w", F.col("mu"))
              .withColumn("z", F.col("eta")
                          + (F.col("y") - F.col("mu")) / F.col("mu")))
        w, x1c, x2c, z = (F.col("w"), F.col("x1"), F.col("x2"),
                          F.col("z"))
        sums = it.agg(
            F.count("*").alias("n"),
            F.sum(_snap(w)).alias("s11"),
            F.sum(_snap(w * x1c)).alias("s12"),
            F.sum(_snap(w * x2c)).alias("s13"),
            F.sum(_snap(w * x1c * x1c)).alias("s22"),
            F.sum(_snap(w * x1c * x2c)).alias("s23"),
            F.sum(_snap(w * x2c * x2c)).alias("s33"),
            F.sum(_snap(w * z)).alias("t1"),
            F.sum(_snap(w * z * x1c)).alias("t2"),
            F.sum(_snap(w * z * x2c)).alias("t3"))
        d = {c: F.col(c).cast("double")
             for c in ("s11", "s12", "s13", "s22", "s23", "s33",
                       "t1", "t2", "t3")}
        m11 = d["s22"] * d["s33"] - d["s23"] * d["s23"]
        m12 = d["s12"] * d["s33"] - d["s23"] * d["s13"]
        m13 = d["s12"] * d["s23"] - d["s22"] * d["s13"]
        det = d["s11"] * m11 - d["s12"] * m12 + d["s13"] * m13
        det0 = (d["t1"] * m11
                - d["s12"] * (d["t2"] * d["s33"] - d["s23"] * d["t3"])
                + d["s13"] * (d["t2"] * d["s23"] - d["s22"] * d["t3"]))
        det1 = (d["s11"] * (d["t2"] * d["s33"] - d["s23"] * d["t3"])
                - d["t1"] * m12
                + d["s13"] * (d["s12"] * d["t3"] - d["t2"] * d["s13"]))
        det2 = (d["s11"] * (d["s22"] * d["t3"] - d["t2"] * d["s23"])
                - d["s12"] * (d["s12"] * d["t3"] - d["t2"] * d["s13"])
                + d["t1"] * m13)
        nz = det != F.lit(0.0)
        beta = sums.select(
            F.col("n"),
            F.when(nz, F.round(det0 / det * 1e6).cast("long"))
            .alias("b0m"),
            F.when(nz, F.round(det1 / det * 1e6).cast("long"))
            .alias("b1m"),
            F.when(nz, F.round(det2 / det * 1e6).cast("long"))
            .alias("b2m"),
            det.alias("det"))

    return beta.select(
        "n",
        F.col("b0m").alias("beta0_micro"),
        F.col("b1m").alias("beta1_micro"),
        F.col("b2m").alias("beta2_micro"),
        (F.col("det") == F.lit(0.0)).alias("singular"))


def naive_bayes_classify(docs: DataFrame, *, id_col: str,
                         label_col: str, text_col: str) -> DataFrame:
    """Multinomial Naive Bayes trained AND scored in-engine — the
    counts-based text classifier every corpus-curation pipeline
    reaches for before anything gradient-shaped (fastText-style
    quality/topic gates): P(c|d) ∝ P(c)·Π P(t|c)^count, with Laplace
    smoothing over the corpus vocabulary.

    Exactness: token counts, class totals N_c and vocabulary size V
    are exact integers; every log goes through the µ-nat snap —
    w_tc = round(10⁶·(ln(n_tc+1) − ln(N_c+V))), prior_c =
    round(10⁶·(ln(n_c) − ln(N))) — so a document's class score
    prior_c + Σ_t cnt_t·w_tc is exact INTEGER arithmetic
    (order-independent; no float log-sum drift can flip an argmax).
    The unseen-pair completion never materializes vocab×classes per
    doc: tokens absent from class c share one per-class default
    w0_c = −round(10⁶·ln(N_c+V)), so

        score(d,c) = prior_c + T_d·w0_c + Σ_{observed (t,c)}
                     cnt_t·(w_tc − w0_c)

    with T_d the doc's in-vocabulary token count — ONE token-keyed
    join against the observed (token, class) delta frame plus a
    class-frame broadcast.  Tokens outside the training vocabulary
    are dropped (the standard multinomial-NB convention).  Prediction
    is argmax with ties to the SMALLEST class label (deterministic).

    Lowercased whitespace tokens (the corpus-wide convention); empty
    documents score prior-only and predict the majority class.

    Scale: model is vocab×classes-bounded (broadcast); scoring is one
    token-keyed shuffle + one (doc, class) partial agg + one
    class-count-sized argmax window per doc.

    Output: (id, label, pred, score_micro).
    """
    from pyspark.sql import Window

    toks = F.filter(F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
                    lambda t: t != "")
    base = docs.select(F.col(id_col).alias("id"),
                       F.col(label_col).alias("label"),
                       toks.alias("__t"))
    train = base.filter(F.col("label").isNotNull())
    # observed (class, token) counts, class totals, vocabulary
    ct = (train.select("label", F.explode("__t").alias("tok"))
          .groupBy("label", "tok")
          .agg(F.count("*").cast("long").alias("__ntc")))
    totals = ct.groupBy("label").agg(F.sum("__ntc").alias("__Nc"))
    vocab = ct.select("tok").distinct()
    v_n = vocab.agg(F.count("*").cast("long").alias("__V"))
    n_docs = train.agg(F.count("*").cast("long").alias("__N"))
    # LEFT-join totals: a training class whose documents are all
    # empty has no (class, token) rows, but must still be scored
    # prior-only (__Nc = 0 → w0 = -log V), not silently dropped from
    # the model (ADVICE r3)
    classes = (train.groupBy("label")
               .agg(F.count("*").cast("long").alias("__cdocs"))
               .join(totals, "label", "left")
               .withColumn("__Nc", F.coalesce(
                   F.col("__Nc"), F.lit(0).cast("long")))
               .crossJoin(F.broadcast(v_n))
               .crossJoin(F.broadcast(n_docs)))
    w0 = (-F.round(F.lit(1e6) * F.log(
        (F.col("__Nc") + F.col("__V")).cast("double")))).cast("long")
    prior = F.round(F.lit(1e6) * (
        F.log(F.col("__cdocs").cast("double"))
        - F.log(F.col("__N").cast("double")))).cast("long")
    cls = classes.select("label", w0.alias("__w0"),
                         prior.alias("__prior"))
    wtc = F.round(F.lit(1e6) * (
        F.log((F.col("__ntc") + 1).cast("double"))
        - F.log((F.col("__Nc") + F.col("__V")).cast("double"))
    )).cast("long")
    # snap w_tc BEFORE joining the class frame — cls shares the
    # totals lineage, and resolving __Nc after that self-join is
    # ambiguous
    mdl0 = (ct.join(totals, "label")
            .crossJoin(F.broadcast(v_n))
            .select("label", "tok", wtc.alias("__wtc")))
    model = (mdl0.join(F.broadcast(cls.select("label", "__w0")), "label")
             .select(F.col("label").alias("__c"), "tok",
                     (F.col("__wtc") - F.col("__w0")).alias("__delta")))
    # per-doc token counts, restricted to the training vocabulary
    dt = (base.select("id", F.explode("__t").alias("tok"))
          .join(vocab, "tok")
          .groupBy("id", "tok")
          .agg(F.count("*").cast("long").alias("__cnt")))
    td = dt.groupBy("id").agg(F.sum("__cnt").cast("long").alias("__Td"))
    obs = (dt.join(model, "tok")
           .groupBy("id", "__c")
           .agg(F.sum(F.col("__cnt") * F.col("__delta")).cast("long")
                .alias("__obs")))
    scored = (base.select("id", "label")
              .join(td, "id", "left")
              .crossJoin(F.broadcast(cls.withColumnRenamed("label",
                                                           "__c")))
              .join(obs, ["id", "__c"], "left")
              .withColumn(
                  "__score",
                  F.col("__prior")
                  + F.coalesce(F.col("__Td"), F.lit(0)) * F.col("__w0")
                  + F.coalesce(F.col("__obs"), F.lit(0))))
    w = Window.partitionBy("id").orderBy(F.desc("__score"), F.asc("__c"))
    return (scored.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .select("id", "label", F.col("__c").alias("pred"),
                    F.col("__score").alias("score_micro")))


def rocchio_classify(df: DataFrame, *, id_col: str, vec_col: str,
                     label_col: str) -> DataFrame:
    """Rocchio nearest-centroid classifier over embedding vectors —
    the geometric sibling of :func:`naive_bayes_classify` (counts)
    and the supervised sibling of :func:`kmeans_fixed` (whose
    assignment machinery this reuses verbatim): train = one per-label
    mean pass, score = exact-integer argmin distance to the k label
    centroids.

    Exactness (the kmeans_fixed discipline): coordinates snap once to
    integer micro-units; centroids re-snap per dimension
    (round(Σx/n), one fixed-order double division of exact integers);
    every point-to-centroid distance is an exact Σ(x−c)² in
    DECIMAL(38,0); the argmin scans the broadcast sorted centroid
    array with strict `<`, so ties go to the SMALLEST label —
    deterministic in every engine.  Unlabeled rows (NULL label) are
    scored but not trained on — the transductive split.

    Scale: training is one (label, dim) partial-agg exchange of k·d
    cells; scoring is SCAN-STAGE (centroids ride one broadcast row,
    the k·d argmin runs inside F.aggregate — no row×k expansion).

    Output per row: (id_col, label, pred, dist2) — dist2 in original
    units² to the winning centroid.
    """
    from pyspark.sql import Window

    dec = lambda c: c.cast("decimal(38,0)")
    xm = F.transform(F.col(vec_col),
                     lambda v: F.round(v.cast("double") * 1e6)
                     .cast("long"))
    base = (df.filter(F.col(vec_col).isNotNull()
                      & (F.size(F.col(vec_col)) > 0))
            .select(F.col(id_col).alias("id"),
                    F.col(label_col).alias("label"), xm.alias("__xm")))
    cent_tall = (base.filter(F.col("label").isNotNull())
                 .select(F.col("label").alias("cid"),
                         F.posexplode("__xm").alias("dim", "v"))
                 .groupBy("cid", "dim")
                 .agg(F.round(F.sum(dec(F.col("v"))).cast("double")
                              / F.count("*").cast("double"))
                      .cast("long").alias("c")))
    cents = (cent_tall.groupBy("cid")
             .agg(F.transform(
                 F.sort_array(F.collect_list(F.struct("dim", "c"))),
                 lambda s: s["c"]).alias("__c")))
    one = cents.groupBy().agg(
        F.sort_array(F.collect_list(F.struct("cid", "__c")))
        .alias("__cents"))

    def d_of(carr):
        return F.aggregate(
            F.zip_with(F.col("__xm"), carr, lambda a, b: a - b),
            F.lit(0).cast("decimal(38,0)"),
            lambda s, v: s + dec(v) * dec(v))

    # keep cid in the label's NATIVE type (string class labels were
    # silently NULLed by a hard int cast — ADVICE r3); the fold's
    # zero element needs a typed NULL, taken from the input schema
    label_dt = df.schema[label_col].dataType
    zero = F.struct(F.lit(None).cast(label_dt).alias("cid"),
                    F.lit(None).cast("decimal(38,0)").alias("d"))

    def merge(acc, c):
        d = d_of(c["__c"])
        better = acc["cid"].isNull() | (d < acc["d"])
        return (F.when(better, F.struct(c["cid"].alias("cid"),
                                        d.alias("d")))
                .otherwise(acc))

    best = F.aggregate(F.col("__cents"), zero, merge)
    return (base.crossJoin(F.broadcast(one))
            .select(F.col("id").alias(id_col), "label",
                    best["cid"].alias("pred"),
                    F.round(best["d"].cast("double") / F.lit(1e12), 6)
                    .alias("dist2")))
