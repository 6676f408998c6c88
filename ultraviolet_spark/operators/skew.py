"""Key-skew diagnostics — the measurement half of the engine's skew
story (the action half is the salted as-of join in ``operators/asof.py``
and AQE skew-join for plain equi-joins).

At 100 TB you do not discover a hot url/domain by OOM-ing an executor;
you run ``skew_report`` on the candidate shuffle key first (one
partial-aggregated count shuffle — the per-key counts frame is tiny,
one row per distinct key, so the ranking/percentile pass over it is
negligible), then feed ``suggest_salt`` straight into the join's salt
factor.

Everything here is exact and pure Catalyst.  Percentiles are DISCRETE
(value at row ``ceil(p·n)`` of the counts sorted ascending) so the
cross-engine oracle compares integers, not interpolated floats; Gini
uses the closed form over ranked counts
``G = (2·Σ i·x_i − (n+1)·Σ x) / (n·Σ x)``
with a deterministic (count, key) tiebreak.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def key_counts(df: DataFrame, key: str) -> DataFrame:
    """(key, cnt) — one partial-agg shuffle, NULL keys included as a
    group (a NULL-heavy key is the most common real skew)."""
    return df.groupBy(key).agg(F.count("*").alias("cnt"))


def hot_keys(df: DataFrame, key: str, *, top_n: int = 10) -> DataFrame:
    """Top-``top_n`` keys by count with their share of all rows,
    heaviest first (ties broken by key for determinism)."""
    counts = key_counts(df, key)
    total = counts.select(F.sum("cnt")).first()[0] or 0
    return (counts
            .withColumn("share", F.round(F.col("cnt") / F.lit(float(total)), 6))
            .orderBy(F.desc("cnt"), F.col(key))
            .limit(top_n))


def skew_report(df: DataFrame, key: str) -> DataFrame:
    """One-row skew summary of ``df`` grouped by ``key``:

    n_keys, n_rows, max_cnt, max_share, mean_cnt, p50/p90/p99_cnt
    (discrete), imbalance (max/mean — the straggler multiplier a
    perfectly hash-partitioned shuffle would see), and gini.

    Scale shape (round-4 rewrite): the old version ranked the per-key
    counts frame with a GLOBAL window — |keys|-sized, i.e. 10^9-10^12
    rows in one partition at web scale, exactly the straggler this
    operator exists to diagnose.  Every output is rank-TIEBREAK-
    INVARIANT (equal counts occupy a contiguous rank run, and both
    the percentile pick and Σ rn·cnt depend only on the run), so the
    whole report collapses onto the DISTINCT-COUNT-VALUE frame: a run
    of m keys sharing count c after r0 smaller keys contributes
    c·(m·r0 + m(m+1)/2) to the Gini rank sum (DECIMAL(38,0) — the
    rank sum crosses int64 at ~10^10 rows) and holds percentile
    position p iff r0 < ⌈p·nk⌉ ≤ r0+m.  The only window left orders
    the distinct-count frame, bounded by √(2·n_rows) rows by the
    pigeonhole argument (1+2+…+k ≤ n), and totals ride a 1-row
    broadcast frame.
    """
    counts = key_counts(df, key)
    runs = (counts.groupBy("cnt")
            .agg(F.count("*").cast("long").alias("__m")))
    w = Window.orderBy("cnt").rowsBetween(Window.unboundedPreceding, -1)
    runs = runs.withColumn("__r0",
                           F.coalesce(F.sum("__m").over(w), F.lit(0)))
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    tot = runs.agg(
        F.sum("__m").cast("long").alias("__nk"),
        F.sum(F.col("cnt") * F.col("__m")).cast("long").alias("__nr"),
        F.max("cnt").cast("long").alias("__mx"))
    j = runs.crossJoin(F.broadcast(tot))
    pos = lambda p: F.ceil(F.lit(p) * F.col("__nk"))  # noqa: E731
    pick = lambda p: F.max(  # noqa: E731
        F.when((F.col("__r0") < pos(p))
               & (pos(p) <= F.col("__r0") + F.col("__m")),
               F.col("cnt"))).cast("long")
    rnsum = F.sum(dec(F.col("cnt"))
                  * (dec(F.col("__m")) * dec(F.col("__r0"))
                     + dec(F.expr("__m * (__m + 1) div 2"))))
    agg = j.agg(
        F.max("__nk").alias("nk"), F.max("__nr").alias("nr"),
        F.max("__mx").alias("mx"),
        pick(0.5).alias("p50"), pick(0.9).alias("p90"),
        pick(0.99).alias("p99"), rnsum.alias("s"))
    return agg.select(
        F.col("nk").alias("n_keys"),
        F.col("nr").alias("n_rows"),
        F.col("mx").alias("max_cnt"),
        F.round(F.col("mx") / F.col("nr"), 6).alias("max_share"),
        F.round(F.col("nr") / F.col("nk"), 6).alias("mean_cnt"),
        F.col("p50").alias("p50_cnt"),
        F.col("p90").alias("p90_cnt"),
        F.col("p99").alias("p99_cnt"),
        F.round(F.col("mx") * F.col("nk") / F.col("nr"), 6)
         .alias("imbalance"),
        F.round((F.lit(2).cast("decimal(38,0)") * F.col("s")
                 - dec(F.col("nk") + 1) * dec(F.col("nr")))
                .cast("double")
                / (dec(F.col("nk")) * dec(F.col("nr"))).cast("double"),
                6).alias("gini"))


def suggest_salt(df: DataFrame, key: str, *,
                 target_per_key: int) -> DataFrame:
    """Per-key salt factor ``n_salts = ceil(cnt / target_per_key)`` for
    keys that exceed the target (others get 1) — the exact input shape
    the salted-join path consumes.  Only keys with n_salts > 1 are
    returned; at scale this frame is small enough to broadcast."""
    if target_per_key <= 0:
        raise ValueError(
            f"target_per_key must be positive, got {target_per_key}")
    return (key_counts(df, key)
            .withColumn("n_salts",
                        F.ceil(F.col("cnt") / F.lit(target_per_key))
                        .cast("int"))
            .filter(F.col("n_salts") > 1))


def salted_join(left: DataFrame, right: DataFrame, on: str, *,
                salts: DataFrame | None = None,
                factor: int | None = None,
                how: str = "inner",
                salt_by: str | None = None) -> DataFrame:
    """General skew-safe equi-join: semantics-identical to
    ``left.join(right, on, how)`` but hot keys' rows are spread over
    per-key salt slices so no single task owns a whole hot key — the
    generic companion to the as-of join's salting (``operators.asof``).

    Two ways to specify salting:
    * ``salts`` — the ``(key, n_salts)`` frame :func:`suggest_salt`
      produces (per-key factors; keys absent from it get factor 1).
      This is the production path: factors sized from measured counts.
    * ``factor`` — one uniform factor for every key (simple, but
      multiplies the whole right side).

    Mechanics: the BIG (left) side scatters each row into slice
    ``xxhash64(salt_by or all columns) mod n_salts`` — deterministic,
    so re-runs place rows identically; the SMALL (right) side
    replicates each row into every slice of its key.  The join key
    becomes (key, slice), restoring correctness while the shuffle
    spreads a hot key over n_salts reducers.

    ``how`` is restricted to inner/left/left_semi/left_anti: a right or
    full join would emit the REPLICATED unmatched right rows once per
    slice (n_salts phantom rows per real row).  Right-side replication
    cost is Σ n_salts over hot keys — that is why per-key factors beat
    a uniform one at scale.

    Zero-skew caveat: for already-uniform keys this adds one explode
    and a wider key for no benefit — measure with
    :func:`skew_report` first; factors of 1 make it a plain join.
    """
    if (salts is None) == (factor is None):
        raise ValueError("specify exactly one of salts / factor")
    if how not in ("inner", "left", "left_semi", "left_anti"):
        raise ValueError(
            f"salted_join supports inner/left/left_semi/left_anti, "
            f"got {how!r} — right/full would duplicate replicated "
            f"unmatched right rows")
    if factor is not None and factor < 1:
        raise ValueError(f"factor must be >= 1, got {factor}")

    if salts is not None:
        s = F.broadcast(salts.select(F.col(on).alias("__sk"),
                                     F.col("n_salts").alias("__nf")))
        lf = (left.join(s, left[on] == F.col("__sk"), "left")
              .withColumn("__nf", F.coalesce("__nf", F.lit(1)))
              .drop("__sk"))
        rf = (right.join(s, right[on] == F.col("__sk"), "left")
              .withColumn("__nf", F.coalesce("__nf", F.lit(1)))
              .drop("__sk"))
    else:
        lf = left.withColumn("__nf", F.lit(factor))
        rf = right.withColumn("__nf", F.lit(factor))

    hsrc = ([F.col(salt_by)] if salt_by
            else [F.col(c) for c in left.columns])
    lf = (lf.withColumn("__uv_salt",
                        F.pmod(F.xxhash64(*hsrc), F.col("__nf"))
                        .cast("int"))
          .drop("__nf"))
    rf = (rf.withColumn("__uv_salt",
                        F.explode(F.sequence(
                            F.lit(0), F.col("__nf") - 1).cast("array<int>")))
          .drop("__nf"))
    return lf.join(rf, [on, "__uv_salt"], how).drop("__uv_salt")
