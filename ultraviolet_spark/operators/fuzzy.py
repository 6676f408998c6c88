"""Exact edit-distance joins via deletion neighborhoods (FastSS,
Bocek et al. 2007): two strings at Levenshtein distance ≤ d share at
least one common variant in their d-deletion neighborhoods, so the
all-pairs similarity join becomes

    explode each string into its ≤d-deletion variants
    → hash equi-join on the variant key
    → exact ``levenshtein`` verify on the (small) candidate set.

No cartesian product anywhere: candidate generation is linear in
strings × neighborhood size (1 + L + L(L−1)/2 for d=2), the only
shuffle is the variant-key hash join, and the exact filter touches
candidates only — the same superset-then-verify regime as the MinHash
and SimHash paths, except the final result is EXACT (the neighborhood
theorem guarantees recall 1.0, and the verify step kills every false
candidate).  Spell-candidate generation, typo-variant host clustering,
and fuzzy vocabulary matching are all this one shape.

Everything is Catalyst expressions — variant generation is a nested
``transform``/``flatten`` over character-index sequences, no Python in
any hot path.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _delete_at(s: Column, i: Column) -> Column:
    """``s`` with its ``i``-th character removed (1-based)."""
    return F.concat(F.substr(s, F.lit(1), i - 1),
                    F.substr(s, i + 1, F.length(s)))


def deletion_variants(s: Column, max_dist: int) -> Column:
    """Array of every string obtainable from ``s`` by deleting up to
    ``max_dist`` (1 or 2) characters, duplicates removed.  Includes
    ``s`` itself (0 deletions)."""
    assert max_dist in (1, 2)
    one = F.transform(
        F.sequence(F.lit(1), F.length(s)), lambda i: _delete_at(s, i))
    out = F.concat(F.array(s), one)
    if max_dist == 2:
        # delete j then i with i < j ⇔ unordered pair {i, j}
        two = F.flatten(F.transform(
            F.sequence(F.lit(2), F.greatest(F.length(s), F.lit(2))),
            lambda j: F.transform(
                F.sequence(F.lit(1), j - 1),
                lambda i: _delete_at(_delete_at(s, j), i))))
        out = F.concat(out, F.when(F.length(s) >= 2, two)
                       .otherwise(F.expr("CAST(array() AS array<string>)")))
    return F.array_distinct(out)


def deletion_neighborhood_pairs(df: DataFrame, *, col: str,
                                max_dist: int = 2) -> DataFrame:
    """EXACT all-pairs ``(a < b, levenshtein(a,b) ≤ max_dist)`` over the
    distinct values of ``col``, without a cartesian product (see module
    docstring).  Returns ``({col}_a, {col}_b, dist)``."""
    vals = df.select(F.col(col).alias("__s")).distinct()
    keyed = vals.select(
        "__s", F.explode(deletion_variants(F.col("__s"), max_dist))
        .alias("__v"))
    a, b = keyed.alias("a"), keyed.alias("b")
    cand = (a.join(b, on="__v")
            .filter(F.col("a.__s") < F.col("b.__s"))
            .select(F.col("a.__s").alias(f"{col}_a"),
                    F.col("b.__s").alias(f"{col}_b"))
            .distinct())
    dist = F.levenshtein(f"{col}_a", f"{col}_b")
    return (cand.filter(dist <= max_dist)
            .withColumn("dist", dist.cast("int")))
