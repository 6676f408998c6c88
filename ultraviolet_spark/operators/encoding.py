"""Leakage-safe categorical feature encoding.

Leave-one-out target encoding is the canonical "easy to leak" feature:
the naive version includes the row's own label in its category mean and
the model memorizes it.  The LOO form subtracts the own label and
blends toward the global prior with additive smoothing ``m``:

    te_i = (S_cat − x_i + m·prior) / (n_cat − 1 + m),  prior = S_g / N

Exactness discipline (the q79/q155 lessons): labels are quantized to
micro-units with explicit half-up, every sum is int64, and the prior is
kept RATIONAL by multiplying through —

    te_i = ((S_cat − x_i)·N + m·S_g) / (N·(n_cat − 1 + m))

— so both engines divide the SAME two exact integers and the resulting
double is bit-identical.  No round() is applied: decimal rounding of
doubles is itself engine-divergent at large magnitudes (found at
sf0.01: Spark's BigDecimal half-up vs DuckDB's multiply-trick differ in
the last printed digit), while the raw IEEE quotient cannot diverge.

Scale notes: one partial-agg groupBy on the category (tiny result,
broadcast back), one 1-row global-totals frame (broadcast cross join —
the same whitelisted scalar-propagation shape as DSIR/BM25/Hamilton),
zero additional shuffles on the fact table.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def target_encode_loo(df: DataFrame, *, cat_col: str, label_col: str,
                      id_col: str, m: int = 10,
                      unit: int = 1_000_000) -> DataFrame:
    """Per-row leave-one-out target encoding (see module docstring).
    Returns ``(id_col, cat_col, te)`` with ``te`` rounded to 6."""
    assert m >= 1, "smoothing m must be >= 1 (m=0 breaks singleton cats)"
    qv = F.floor(F.col(label_col).cast("double") * unit + F.lit(0.5)) \
        .cast("long")
    base = df.select(F.col(id_col), F.col(cat_col), qv.alias("__q"))
    per_cat = (base.groupBy(cat_col)
               .agg(F.sum("__q").alias("__s"),
                    F.count("*").cast("long").alias("__n")))
    totals = base.agg(F.sum("__q").alias("__sg"),
                      F.count("*").cast("long").alias("__nn"))
    j = (base.join(F.broadcast(per_cat), cat_col)
         .crossJoin(F.broadcast(totals)))
    num = ((F.col("__s") - F.col("__q")) * F.col("__nn")
           + F.lit(int(m)) * F.col("__sg"))
    den = (F.col("__nn") * (F.col("__n") - 1 + F.lit(int(m)))
           * F.lit(int(unit)))
    # NO round(): engines disagree on decimal rounding of doubles at
    # 8-integer-digit magnitudes (BigDecimal half-up vs multiply-trick),
    # but both convert the SAME two int64s and perform the SAME IEEE
    # division — the raw double is bit-identical cross-engine.
    return j.select(
        F.col(id_col), F.col(cat_col),
        (num.cast("double") / den.cast("double")).alias("te"))
