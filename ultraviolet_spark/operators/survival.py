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

__all__ = ["kaplan_meier"]


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
