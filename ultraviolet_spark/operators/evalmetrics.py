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
