"""Survival analysis over event streams: the Kaplan–Meier
product-limit estimator, exactly replayable.

Duration data is everywhere in a crawl/product pipeline — time to
next revisit, time to first purchase, session time-to-abandon — and
always right-censored (the observation window ends before many spells
do).  Averaging only completed spells is the classic survivorship
bias; Kaplan–Meier is the standard fix: at each distinct death time
t_i with d_i deaths out of n_i at risk,

    S(t) = Π_{t_i ≤ t} (1 − d_i / n_i).

Exactness discipline: each step's log factor
``ln(n_i − d_i) − ln(n_i)`` (exact int64 operands, fixed order) snaps
to integer micro-nats; the running product is the order-independent
prefix SUM of those integers over the distinct-death-time frame,
computed with the value-range bucketed two-phase cumsum (no
single-partition window even with 10^9 distinct durations).  ``exp``
is applied once at the end for the reported survival probability; the
integer ``ln_surv_micro`` column is the bit-exact cross-engine truth.

The final death time may exhaust the risk set (n_i = d_i): its factor
is 0 and ln is undefined — reported as ln_surv_micro NULL / surv 0.0,
never a silent -inf.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["kaplan_meier", "logrank_test", "cox_score_step",
           "competing_risks", "rmst"]


def kaplan_meier(obs: DataFrame, *, duration_col: str, event_col: str,
                 n_buckets: int = 64) -> DataFrame:
    """KM curve from (duration, event) observations; ``event_col`` is
    a boolean column — true = the event occurred (death), false =
    censored at that duration.  Returns one row per distinct DEATH
    time: (t, n_risk, d, ln_surv_micro, surv)."""
    d = obs.select(F.col(duration_col).cast("long").alias("t"),
                   F.col(event_col).cast("boolean").alias("e"))
    per_t = d.groupBy("t").agg(
        F.count("*").alias("n_obs"),
        F.sum(F.when(F.col("e"), 1).otherwise(0)).cast("long")
        .alias("d"))
    bounds = per_t.agg(F.min("t").alias("__lo"), F.max("t").alias("__hi"),
                       F.sum("n_obs").alias("__n"))
    pv = (per_t.crossJoin(F.broadcast(bounds))
          .withColumn("__b", F.expr(
              f"(t - __lo) div ((__hi - __lo) div {int(n_buckets)} + 1)")))

    # n_risk(t) = N − #observations with duration < t  (exclusive
    # prefix of n_obs), via in-bucket window + broadcast offsets
    w_in = (Window.partitionBy("__b").orderBy("t")
            .rowsBetween(Window.unboundedPreceding, -1))
    pv = pv.withColumn("__o_in",
                       F.coalesce(F.sum("n_obs").over(w_in), F.lit(0)))
    btot = pv.groupBy("__b").agg(F.sum("n_obs").alias("__bo"))
    w_b = Window.orderBy("__b").rowsBetween(Window.unboundedPreceding, -1)
    boff = btot.select(
        "__b", F.coalesce(F.sum("__bo").over(w_b), F.lit(0)).alias("__oo"))
    pv = (pv.join(F.broadcast(boff), "__b")
          .withColumn("n_risk",
                      F.col("__n") - (F.col("__oo") + F.col("__o_in"))))

    deaths = pv.filter(F.col("d") > 0)
    step = F.when(
        F.col("n_risk") > F.col("d"),
        F.round((F.log((F.col("n_risk") - F.col("d")).cast("double"))
                 - F.log(F.col("n_risk").cast("double"))) * 1e6)
        .cast("long"))
    deaths = deaths.withColumn("__step", step)
    # running sum of the step logs over death times (deaths-frame
    # prefix; reuses the same bucket column — still contiguous in t)
    w_din = (Window.partitionBy("__b").orderBy("t")
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    deaths = deaths.withColumn(
        "__s_in", F.coalesce(F.sum("__step").over(w_din), F.lit(0)))
    dtot = deaths.groupBy("__b").agg(F.sum("__step").alias("__bs"))
    doff = dtot.select(
        "__b", F.coalesce(F.sum("__bs").over(w_b), F.lit(0)).alias("__os"))
    deaths = (deaths.join(F.broadcast(doff), "__b")
              .withColumn("__lnsum", F.col("__os") + F.col("__s_in")))
    exhausted = F.col("n_risk") == F.col("d")
    return deaths.select(
        "t", "n_risk", "d",
        F.when(~exhausted, F.col("__lnsum")).alias("ln_surv_micro"),
        F.when(exhausted, F.lit(0.0))
        .otherwise(F.round(F.exp(F.col("__lnsum").cast("double")
                                 / F.lit(1e6)), 6)).alias("surv"))


def logrank_test(obs: DataFrame, *, duration_col: str, event_col: str,
                 group_col: str, group_a, group_b,
                 n_buckets: int = 64) -> DataFrame:
    """Two-sample log-rank test — the A/B workhorse for duration
    metrics (does variant A's time-to-purchase curve differ from B's?)
    that handles right-censoring correctly, unlike any mean/median of
    completed spells.

    At each distinct death time with d deaths out of n at risk
    (n_a from group A): the observed−expected increment for A is
    ``u = d_a − d·n_a/n`` and its hypergeometric variance
    ``v = d·n_a·n_b·(n−d) / (n²·(n−1))``.  Both are rationals with
    EXACT integer numerators (d_a·n − d·n_a, etc.); each snaps to
    micro-units per death time and the test sums integers —
    order-independent.  A single-subject risk set (n = 1) contributes
    exactly 0 to both by the same hypergeometric logic, handled
    explicitly instead of dividing by n−1 = 0.  The final
    χ² = U²/V is one fixed-order double expression.

    Risk counts come from two exclusive prefixes over the distinct-
    duration frame via the value-range bucketed two-phase cumsum.
    """
    from pyspark.sql import Window

    g = F.col(group_col)
    d = (obs.filter(g.isin([group_a, group_b]))
         .select(F.col(duration_col).cast("long").alias("t"),
                 F.col(event_col).cast("boolean").alias("e"),
                 F.when(g == group_a, 1).otherwise(0).alias("ga")))
    per_t = d.groupBy("t").agg(
        F.sum("ga").cast("long").alias("o_a"),
        F.sum(1 - F.col("ga")).cast("long").alias("o_b"),
        F.sum(F.when(F.col("e") & (F.col("ga") == 1), 1).otherwise(0))
        .cast("long").alias("d_a"),
        F.sum(F.when(F.col("e") & (F.col("ga") == 0), 1).otherwise(0))
        .cast("long").alias("d_b"))
    bounds = per_t.agg(F.min("t").alias("__lo"), F.max("t").alias("__hi"),
                       F.sum("o_a").alias("__na"),
                       F.sum("o_b").alias("__nb"))
    pv = (per_t.crossJoin(F.broadcast(bounds))
          .withColumn("__b", F.expr(
              f"(t - __lo) div ((__hi - __lo) div {int(n_buckets)} + 1)")))
    w_in = (Window.partitionBy("__b").orderBy("t")
            .rowsBetween(Window.unboundedPreceding, -1))
    pv = (pv.withColumn("__a_in",
                        F.coalesce(F.sum("o_a").over(w_in), F.lit(0)))
          .withColumn("__b_in",
                      F.coalesce(F.sum("o_b").over(w_in), F.lit(0))))
    btot = pv.groupBy("__b").agg(F.sum("o_a").alias("__ba"),
                                 F.sum("o_b").alias("__bb"))
    w_b = Window.orderBy("__b").rowsBetween(Window.unboundedPreceding, -1)
    boff = btot.select(
        "__b",
        F.coalesce(F.sum("__ba").over(w_b), F.lit(0)).alias("__oa"),
        F.coalesce(F.sum("__bb").over(w_b), F.lit(0)).alias("__ob"))
    pv = (pv.join(F.broadcast(boff), "__b")
          .withColumn("n_a", F.col("__na") - (F.col("__oa")
                                              + F.col("__a_in")))
          .withColumn("n_b", F.col("__nb") - (F.col("__ob")
                                              + F.col("__b_in"))))
    dd = F.col("d_a") + F.col("d_b")
    nn = F.col("n_a") + F.col("n_b")
    deaths = pv.filter(dd > 0)
    u_micro = F.when(nn > 1, F.round(
        (F.col("d_a") * nn - dd * F.col("n_a")).cast("double")
        / nn.cast("double") * 1e6).cast("long")).otherwise(F.lit(0))
    v_micro = F.when(nn > 1, F.round(
        (dd.cast("decimal(38,0)")
         * F.col("n_a").cast("decimal(38,0)")
         * F.col("n_b").cast("decimal(38,0)")
         * (nn - dd).cast("decimal(38,0)")).cast("double")
        / (nn.cast("decimal(38,0)") * nn.cast("decimal(38,0)")
           * (nn - 1).cast("decimal(38,0)")).cast("double")
        * 1e6).cast("long")).otherwise(F.lit(0))
    agg = deaths.agg(
        F.max("__na").alias("n_obs_a"), F.max("__nb").alias("n_obs_b"),
        F.sum(F.col("d_a")).alias("deaths_a"),
        F.sum(F.col("d_b")).alias("deaths_b"),
        F.sum(u_micro).cast("long").alias("u_micro"),
        F.sum(v_micro).cast("long").alias("v_micro"))
    chi2 = F.round(
        (F.col("u_micro").cast("double") / F.lit(1e6))
        * (F.col("u_micro").cast("double") / F.lit(1e6))
        / (F.col("v_micro").cast("double") / F.lit(1e6)), 6)
    return agg.withColumn("chi2", chi2)


def cox_score_step(obs: DataFrame, *, duration_col: str, event_col: str,
                   x_col: str, n_buckets: int = 64) -> DataFrame:
    """Cox proportional-hazards score test + one Newton step from
    β = 0, for a CONTINUOUS covariate — the survival regression that
    log-rank (two groups) cannot do: does higher x mean earlier
    events, correctly under right-censoring?

    At β = 0 the partial-likelihood score and information reduce to
    risk-set moments (Breslow handling of tied deaths): at each death
    time with d deaths whose covariates sum to ``sxd``, and risk-set
    suffix sums S0 = Σ1, S1 = Σx, S2 = Σx² over everyone still at
    risk,

        U += sxd − d·S1/S0
        I += d·(S2·S0 − S1²)/S0²

    Both increments are rationals with EXACT integer numerators
    (covariates enter as integers; products route through
    DECIMAL(38,0)); each snaps to micro-units per death time, the test
    sums integers, and β̂₁ = U/I, score χ² = U²/I are fixed-order
    double expressions.  Suffix sums are total − exclusive prefix via
    the bucketed two-phase cumsum.  Risk sets of one (S0 = 1) make I's
    increment exactly 0 (S2·S0 = S1²) — no special case needed, which
    the hand test pins.
    """
    from pyspark.sql import Window

    d = obs.select(F.col(duration_col).cast("long").alias("t"),
                   F.col(event_col).cast("boolean").alias("e"),
                   F.col(x_col).cast("long").alias("x"))
    per_t = d.groupBy("t").agg(
        F.count("*").alias("o"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.when(F.col("e"), 1).otherwise(0)).cast("long")
        .alias("dd"),
        F.coalesce(F.sum(F.when(F.col("e"), F.col("x"))), F.lit(0))
        .alias("sxd"))
    bounds = per_t.agg(
        F.min("t").alias("__lo"), F.max("t").alias("__hi"),
        F.sum("o").alias("__n"), F.sum("sx").alias("__sx"),
        F.sum("sxx").alias("__sxx"))
    pv = (per_t.crossJoin(F.broadcast(bounds))
          .withColumn("__b", F.expr(
              f"(t - __lo) div ((__hi - __lo) div {int(n_buckets)} + 1)")))
    w_in = (Window.partitionBy("__b").orderBy("t")
            .rowsBetween(Window.unboundedPreceding, -1))
    for c in ("o", "sx", "sxx"):
        pv = pv.withColumn(f"__{c}_in",
                           F.coalesce(F.sum(c).over(w_in), F.lit(0)))
    btot = pv.groupBy("__b").agg(F.sum("o").alias("__bo"),
                                 F.sum("sx").alias("__bsx"),
                                 F.sum("sxx").alias("__bsxx"))
    w_b = Window.orderBy("__b").rowsBetween(Window.unboundedPreceding, -1)
    boff = btot.select(
        "__b",
        F.coalesce(F.sum("__bo").over(w_b), F.lit(0)).alias("__oo"),
        F.coalesce(F.sum("__bsx").over(w_b), F.lit(0)).alias("__osx"),
        F.coalesce(F.sum("__bsxx").over(w_b), F.lit(0)).alias("__osxx"))
    pv = (pv.join(F.broadcast(boff), "__b")
          .withColumn("s0", F.col("__n")
                      - (F.col("__oo") + F.col("__o_in")))
          .withColumn("s1", F.col("__sx")
                      - (F.col("__osx") + F.col("__sx_in")))
          .withColumn("s2", F.col("__sxx")
                      - (F.col("__osxx") + F.col("__sxx_in"))))
    deaths = pv.filter(F.col("dd") > 0)
    d38 = lambda c: F.col(c).cast("decimal(38,0)")
    u_micro = F.round(
        (d38("sxd") * d38("s0") - d38("dd") * d38("s1")).cast("double")
        / F.col("s0").cast("double") * 1e6).cast("long")
    i_micro = F.round(
        (d38("dd") * (d38("s2") * d38("s0") - d38("s1") * d38("s1")))
        .cast("double")
        / (d38("s0") * d38("s0")).cast("double") * 1e6).cast("long")
    agg = deaths.agg(
        F.sum("dd").alias("n_deaths"),
        F.sum(u_micro).cast("long").alias("u_micro"),
        F.sum(i_micro).cast("long").alias("i_micro"))
    du = F.col("u_micro").cast("double") / F.lit(1e6)
    di = F.col("i_micro").cast("double") / F.lit(1e6)
    # zero information (degenerate: every death faces a singleton risk
    # set) has no defensible slope — NULL, never a 0/0 ANSI error
    has_info = F.col("i_micro") != 0
    return agg.select(
        "n_deaths", "u_micro", "i_micro",
        F.when(has_info, F.round(du / di, 6)).alias("beta1"),
        F.when(has_info, F.round(du * du / di, 6)).alias("score_chi2"))


def competing_risks(obs: DataFrame, *, duration_col: str,
                    cause_col: str, n_buckets: int = 64) -> DataFrame:
    """Cumulative incidence functions under competing risks (the
    two-cause Aalen–Johansen estimator): when a unit can exit by
    EITHER of two events (converted vs churned; purchased vs errored),
    1 − KM of a single cause overstates its incidence because the
    competitor removes units first — the CIF fixes this:

        CIF_k(t) = Σ_{tᵢ ≤ t}  S(tᵢ⁻) · d_k(tᵢ) / n(tᵢ)

    with S(t⁻) the ALL-cause Kaplan–Meier just before tᵢ.
    ``cause_col``: 0 = censored, 1 / 2 = the competing causes.

    Exactness: the all-cause KM runs as the usual µ-nat integer prefix
    (EXCLUSIVE here — S at tᵢ⁻ sums strictly-earlier steps); each CIF
    increment exp(lnS⁻)·d_k/n evaluates in fixed operand order and
    snaps to micro-units; the running CIFs are integer prefix sums.
    By construction CIF₁ + CIF₂ + S = 1 up to snap error — pinned in
    tests.  All prefixes ride the bucketed two-phase cumsum.
    """
    from pyspark.sql import Window

    d = obs.select(F.col(duration_col).cast("long").alias("t"),
                   F.col(cause_col).cast("int").alias("c"))
    per_t = d.groupBy("t").agg(
        F.count("*").alias("o"),
        F.sum(F.when(F.col("c") == 1, 1).otherwise(0)).cast("long")
        .alias("d1"),
        F.sum(F.when(F.col("c") == 2, 1).otherwise(0)).cast("long")
        .alias("d2"))
    per_t = per_t.withColumn("dd", F.col("d1") + F.col("d2"))
    bounds = per_t.agg(F.min("t").alias("__lo"), F.max("t").alias("__hi"),
                       F.sum("o").alias("__n"))
    pv = (per_t.crossJoin(F.broadcast(bounds))
          .withColumn("__b", F.expr(
              f"(t - __lo) div ((__hi - __lo) div {int(n_buckets)} + 1)")))
    w_in = (Window.partitionBy("__b").orderBy("t")
            .rowsBetween(Window.unboundedPreceding, -1))
    pv = pv.withColumn("__o_in",
                       F.coalesce(F.sum("o").over(w_in), F.lit(0)))
    btot = pv.groupBy("__b").agg(F.sum("o").alias("__bo"))
    w_b = Window.orderBy("__b").rowsBetween(Window.unboundedPreceding, -1)
    boff = btot.select(
        "__b", F.coalesce(F.sum("__bo").over(w_b), F.lit(0)).alias("__oo"))
    pv = (pv.join(F.broadcast(boff), "__b")
          .withColumn("n_risk",
                      F.col("__n") - (F.col("__oo") + F.col("__o_in"))))

    deaths = pv.filter(F.col("dd") > 0)
    step = F.when(
        F.col("n_risk") > F.col("dd"),
        F.round((F.log((F.col("n_risk") - F.col("dd")).cast("double"))
                 - F.log(F.col("n_risk").cast("double"))) * 1e6)
        .cast("long")).otherwise(F.lit(None).cast("long"))
    deaths = deaths.withColumn("__step", step)
    # EXCLUSIVE ln-prefix: S(t⁻) uses strictly earlier steps
    w_din_ex = (Window.partitionBy("__b").orderBy("t")
                .rowsBetween(Window.unboundedPreceding, -1))
    deaths = deaths.withColumn(
        "__s_in", F.coalesce(F.sum("__step").over(w_din_ex), F.lit(0)))
    dtot = deaths.groupBy("__b").agg(F.sum("__step").alias("__bs"))
    doff = dtot.select(
        "__b", F.coalesce(F.sum("__bs").over(w_b), F.lit(0)).alias("__os"))
    deaths = (deaths.join(F.broadcast(doff), "__b")
              .withColumn("__ln_before", F.col("__os") + F.col("__s_in")))
    surv_before = F.exp(F.col("__ln_before").cast("double") / F.lit(1e6))
    for k in ("1", "2"):
        inc = F.round(surv_before * F.col(f"d{k}").cast("double")
                      / F.col("n_risk").cast("double") * 1e6).cast("long")
        deaths = deaths.withColumn(f"__inc{k}", inc)
    # running CIFs: inclusive integer prefixes of the increments
    w_din = (Window.partitionBy("__b").orderBy("t")
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    for k in ("1", "2"):
        deaths = deaths.withColumn(
            f"__c{k}_in", F.sum(f"__inc{k}").over(w_din))
    ctot = deaths.groupBy("__b").agg(F.sum("__inc1").alias("__bc1"),
                                     F.sum("__inc2").alias("__bc2"))
    coff = ctot.select(
        "__b",
        F.coalesce(F.sum("__bc1").over(w_b), F.lit(0)).alias("__oc1"),
        F.coalesce(F.sum("__bc2").over(w_b), F.lit(0)).alias("__oc2"))
    deaths = deaths.join(F.broadcast(coff), "__b")
    return deaths.select(
        "t", "n_risk", "d1", "d2",
        (F.col("__oc1") + F.col("__c1_in")).alias("cif1_micro"),
        (F.col("__oc2") + F.col("__c2_in")).alias("cif2_micro"))


def rmst(obs: DataFrame, *, duration_col: str, event_col: str,
         tau: int, n_buckets: int = 64) -> DataFrame:
    """Restricted mean survival time — the area under the KM curve up
    to horizon τ: the modern effect size for duration metrics (median
    survival is undefined when the curve never reaches 0.5; RMST is
    always defined, in the metric's own time units: "expected time
    alive within the first τ").

    RMST(τ) = Σ over KM steps of S(tᵢ) · (min(tᵢ₊₁, τ) − tᵢ), plus
    the initial segment min(t₁, τ) at S = 1.  Exactness: S comes from
    the µ-nat integer ln-prefix (q265's machinery), interval lengths
    are exact integer µs clamped at τ, each term
    round(exp(lnᵢ/10⁶)·Δᵢ) snaps to an integer µs contribution before
    the order-independent sum.  Next-step gaps cross bucket boundaries
    via the per-bucket-min broadcast frame (the W₁ trick); the last
    death's open interval extends to τ.

    Returns one row: (tau_us, n, n_deaths, rmst_us, rmst_share) where
    rmst_share = rmst/τ ∈ (0, 1].
    """
    from pyspark.sql import Window

    d = obs.select(F.col(duration_col).cast("long").alias("t"),
                   F.col(event_col).cast("boolean").alias("e"))
    per_t = d.groupBy("t").agg(
        F.count("*").alias("n_obs"),
        F.sum(F.when(F.col("e"), 1).otherwise(0)).cast("long")
        .alias("dd"))
    bounds = per_t.agg(F.min("t").alias("__lo"), F.max("t").alias("__hi"),
                       F.sum("n_obs").alias("__n"),
                       F.sum("dd").alias("__nd"))
    pv = (per_t.crossJoin(F.broadcast(bounds))
          .withColumn("__b", F.expr(
              f"(t - __lo) div ((__hi - __lo) div {int(n_buckets)} + 1)")))
    w_in = (Window.partitionBy("__b").orderBy("t")
            .rowsBetween(Window.unboundedPreceding, -1))
    pv = pv.withColumn("__o_in",
                       F.coalesce(F.sum("n_obs").over(w_in), F.lit(0)))
    btot = pv.groupBy("__b").agg(F.sum("n_obs").alias("__bo"))
    w_b = Window.orderBy("__b").rowsBetween(Window.unboundedPreceding, -1)
    boff = btot.select(
        "__b", F.coalesce(F.sum("__bo").over(w_b), F.lit(0)).alias("__oo"))
    pv = (pv.join(F.broadcast(boff), "__b")
          .withColumn("n_risk",
                      F.col("__n") - (F.col("__oo") + F.col("__o_in"))))

    deaths = pv.filter(F.col("dd") > 0)
    step = F.when(
        F.col("n_risk") > F.col("dd"),
        F.round((F.log((F.col("n_risk") - F.col("dd")).cast("double"))
                 - F.log(F.col("n_risk").cast("double"))) * 1e6)
        .cast("long")).otherwise(F.lit(None).cast("long"))
    deaths = deaths.withColumn("__step", step)
    # inclusive ln prefix (S AT tᵢ governs the interval AFTER tᵢ).
    # An exhausted step (n_risk == dd, the only possible LAST death
    # time — nobody remains afterwards) means S = 0 on its interval;
    # its NULL step is skipped by sum() and its survival overridden.
    w_din = (Window.partitionBy("__b").orderBy("t")
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    deaths = deaths.withColumn(
        "__s_in", F.coalesce(F.sum("__step").over(w_din), F.lit(0)))
    dtot = deaths.groupBy("__b").agg(F.sum("__step").alias("__bs"))
    doff = dtot.select(
        "__b", F.coalesce(F.sum("__bs").over(w_b), F.lit(0)).alias("__os"))
    deaths = (deaths.join(F.broadcast(doff), "__b")
              .withColumn("__lnsum", F.col("__os") + F.col("__s_in")))
    # next death time (bucket-crossing lead, W₁ trick)
    deaths = deaths.withColumn(
        "__nx_in", F.lead("t").over(Window.partitionBy("__b")
                                    .orderBy("t")))
    dmins = deaths.groupBy("__b").agg(F.min("t").alias("__dmin"))
    dnext = dmins.select(
        "__b", F.lead("__dmin").over(Window.orderBy("__b")).alias("__nxb"))
    deaths = (deaths.join(F.broadcast(dnext), "__b")
              .withColumn("next_t", F.coalesce("__nx_in", "__nxb")))

    tau_l = F.lit(int(tau)).cast("long")
    seg_end = F.least(F.coalesce("next_t", tau_l), tau_l)
    dlen = F.greatest(seg_end - F.col("t"), F.lit(0).cast("long"))
    surv_here = F.when(F.col("n_risk") == F.col("dd"), F.lit(0.0)) \
        .otherwise(F.exp(F.col("__lnsum").cast("double") / F.lit(1e6)))
    term = F.round(surv_here * dlen.cast("double")).cast("long")
    first_t = deaths.agg(F.min("t").alias("__t1"))
    agg = deaths.agg(F.sum(term).alias("__area_after"))
    out = (bounds.crossJoin(F.broadcast(first_t))
           .crossJoin(F.broadcast(agg))
           .withColumn("__head", F.least(F.coalesce(F.col("__t1"),
                                                    tau_l), tau_l))
           .withColumn("rmst_us",
                       F.col("__head")
                       + F.coalesce("__area_after", F.lit(0))))
    return out.select(
        tau_l.alias("tau_us"),
        F.col("__n").alias("n"), F.col("__nd").alias("n_deaths"),
        "rmst_us",
        F.round(F.col("rmst_us").cast("double")
                / tau_l.cast("double"), 6).alias("rmst_share"))
