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
    """
    counts = key_counts(df, key)
    w = Window.orderBy(F.col("cnt"), F.col(key).cast("string"))
    ranked = counts.select(
        F.col("cnt"),
        F.row_number().over(w).alias("rn"),
        F.count("*").over(Window.partitionBy()).alias("nk"))
    pos = lambda p: F.ceil(F.lit(p) * F.col("nk"))  # noqa: E731
    return ranked.agg(
        F.max("nk").cast("long").alias("n_keys"),
        F.sum("cnt").cast("long").alias("n_rows"),
        F.max("cnt").cast("long").alias("max_cnt"),
        F.round(F.max("cnt") / F.sum("cnt"), 6).alias("max_share"),
        F.round(F.sum("cnt") / F.max("nk"), 6).alias("mean_cnt"),
        F.max(F.when(F.col("rn") == pos(0.5), F.col("cnt")))
         .cast("long").alias("p50_cnt"),
        F.max(F.when(F.col("rn") == pos(0.9), F.col("cnt")))
         .cast("long").alias("p90_cnt"),
        F.max(F.when(F.col("rn") == pos(0.99), F.col("cnt")))
         .cast("long").alias("p99_cnt"),
        F.round(F.max("cnt") * F.max("nk") / F.sum("cnt"), 6)
         .alias("imbalance"),
        F.round((2 * F.sum(F.col("rn") * F.col("cnt"))
                 - (F.max("nk") + 1) * F.sum("cnt"))
                / (F.max("nk") * F.sum("cnt")), 6).alias("gini"))


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
