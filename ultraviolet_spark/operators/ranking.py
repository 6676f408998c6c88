"""Preference-ranking operators: Bradley–Terry strengths from pairwise
comparisons (Bradley & Terry 1952; MM iteration per Hunter 2004, both
public) — the model behind reward-model data prep, "which variant do
raters prefer", and any tournament-style quality signal: item i beats
item j with probability θᵢ/(θᵢ+θⱼ), and the θs are fitted from the
observed win matrix.

Exactness contract (the registry discipline): strengths live as
micro-integers; each MM half of an iteration evaluates per-pair terms
round(n_ij·10¹²/(θᵢ+θⱼ)) — exact integers summed order-independently —
then θ'ᵢ = round(Wᵢ·10¹²/Dᵢ) and a renormalization to Σθ = k·10⁶,
all fixed-operand-order double algebra over exact integers, re-snapped
every step.  Iterations are UNROLLED (fixed rounds, the k-core/IRLS
honesty contract) so a DuckDB oracle replays every integer.

Scale shape: the comparison graph lives on item-vocabulary-sized
frames (pairs ≤ k²); the data-sized work is whatever counted the
comparisons.  Never-winning items converge to θ = 0 (their true MLE
limit) without guards; θ lineage is localCheckpoint-truncated per
round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["bradley_terry"]


def bradley_terry(pairs: DataFrame, *, winner_col: str = "winner",
                  loser_col: str = "loser",
                  rounds: int = 3) -> DataFrame:
    """Fit Bradley–Terry strengths from a (winner, loser) comparison
    log.  Returns one row per item: (item, wins, comparisons,
    theta_micro, rank) with rank 1 = strongest, ties broken by item.
    """
    from pyspark.sql import Window

    d38 = lambda c: c.cast("decimal(38,0)")
    w = pairs.select(F.col(winner_col).cast("string").alias("wi"),
                     F.col(loser_col).cast("string").alias("lo"))
    # unordered pair counts n_ij (i < j) + per-item win totals
    und = (w.select(F.least("wi", "lo").alias("i"),
                    F.greatest("wi", "lo").alias("j"))
           .groupBy("i", "j").agg(F.count("*").cast("long").alias("nij")))
    wins = (w.groupBy(F.col("wi").alias("item"))
            .agg(F.count("*").cast("long").alias("wins")))
    items = (und.select(F.col("i").alias("item"))
             .union(und.select(F.col("j").alias("item")))
             .distinct())
    base = (items.join(wins, "item", "left")
            .select("item",
                    F.coalesce(F.col("wins"), F.lit(0)).alias("wins")))
    comp = (und.select(F.col("i").alias("item"), "nij")
            .union(und.select(F.col("j").alias("item"), "nij"))
            .groupBy("item")
            .agg(F.sum("nij").cast("long").alias("comparisons")))
    base = base.join(comp, "item")
    k = items.agg(F.count("*").cast("long").alias("__k"))

    theta = base.select("item",
                        F.lit(1_000_000).cast("long").alias("th"))
    for _ in range(int(rounds)):
        ti = theta.select(F.col("item").alias("i"),
                          F.col("th").alias("thi"))
        tj = theta.select(F.col("item").alias("j"),
                          F.col("th").alias("thj"))
        terms = (und.join(ti, "i").join(tj, "j")
                 .withColumn("t", F.round(
                     F.col("nij").cast("double") * F.lit(1e12)
                     / (F.col("thi") + F.col("thj")).cast("double"))
                     .cast("long")))
        dsum = (terms.select(F.col("i").alias("item"), "t")
                .union(terms.select(F.col("j").alias("item"), "t"))
                .groupBy("item").agg(F.sum(d38(F.col("t")))
                                     .alias("__d")))
        raw = (base.join(dsum, "item")
               .withColumn("__raw", F.round(
                   F.col("wins").cast("double") * F.lit(1e12)
                   / F.col("__d").cast("double")).cast("long")))
        s = raw.agg(F.sum(d38(F.col("__raw"))).alias("__s"))
        theta = (raw.crossJoin(F.broadcast(s))
                 .crossJoin(F.broadcast(k))
                 .select("item", F.round(
                     F.col("__raw").cast("double")
                     * (F.col("__k").cast("double") * F.lit(1e6))
                     / F.col("__s").cast("double")).cast("long")
                     .alias("th"))
                 .localCheckpoint(eager=False))

    out = base.join(theta, "item")
    rk = F.row_number().over(
        Window.orderBy(F.col("th").desc(), F.col("item")))
    return out.select("item", "wins", "comparisons",
                      F.col("th").alias("theta_micro"),
                      rk.cast("int").alias("rank"))
