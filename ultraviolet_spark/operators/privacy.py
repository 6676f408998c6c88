"""Privacy audits for release candidates — k-anonymity and
l-diversity over quasi-identifier combinations (Sweeney 2002;
Machanavajjhala et al. 2007, both public).  The PII regex scrubbers
(`operators/textstats.py`) remove direct identifiers; this measures
the RE-IDENTIFICATION surface that survives them: a row is exposed
when its quasi-identifier combination is shared by fewer than k rows
(linkage attack), or when everyone in its class shares the same
sensitive value (homogeneity attack — k-anonymous yet fully
disclosing).

Pure aggregation: one partial-agg shuffle keyed by the quasi combo
(map-side combine collapses the common classes at the scan), one
exact COUNT DISTINCT for l.  Quasi-combo cardinality is the product
of the generalized attribute domains — the caller generalizes
(bucket ages, truncate timestamps to the hour) BEFORE auditing, so
the key space is bounded by design, not by the data.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def k_anonymity(df: DataFrame, *, quasi_cols: Sequence[str],
                sensitive_col: str, k: int = 5,
                l_min: int = 2) -> DataFrame:
    """Per-equivalence-class audit: one row per distinct quasi-
    identifier combination with ``class_size``, ``l_diversity``
    (exact distinct sensitive values), ``at_risk_k`` (class smaller
    than k) and ``at_risk_l`` (fewer than ``l_min`` distinct
    sensitive values — the homogeneity attack k-anonymity alone
    misses).  NULL quasi values form their own class (NULL is a
    disclosure-relevant value, not an excuse)."""
    return (df.groupBy(*quasi_cols)
            .agg(F.count("*").cast("long").alias("class_size"),
                 F.countDistinct(sensitive_col).cast("long")
                 .alias("l_diversity"))
            .withColumn("at_risk_k", F.col("class_size") < k)
            .withColumn("at_risk_l", F.col("l_diversity") < l_min))


def k_anonymity_summary(df: DataFrame, *, quasi_cols: Sequence[str],
                        sensitive_col: str, k: int = 5,
                        l_min: int = 2) -> DataFrame:
    """One-row release gate: ``k_min`` (the dataset's actual
    k-anonymity level = smallest class), ``n_classes``, the at-risk
    class/row counts for both attacks, and ``frac_rows_at_risk`` —
    one IEEE division of two exact counts."""
    per = k_anonymity(df, quasi_cols=quasi_cols,
                      sensitive_col=sensitive_col, k=k, l_min=l_min)
    risk = F.col("at_risk_k") | F.col("at_risk_l")
    return per.agg(
        F.min("class_size").cast("long").alias("k_min"),
        F.count("*").cast("long").alias("n_classes"),
        F.sum(F.when(F.col("at_risk_k"), 1).otherwise(0))
        .cast("long").alias("n_classes_at_risk_k"),
        F.sum(F.when(F.col("at_risk_l"), 1).otherwise(0))
        .cast("long").alias("n_classes_at_risk_l"),
        F.sum(F.when(risk, F.col("class_size")).otherwise(0))
        .cast("long").alias("n_rows_at_risk"),
        (F.sum(F.when(risk, F.col("class_size")).otherwise(0))
         .cast("double") / F.sum("class_size").cast("double"))
        .alias("frac_rows_at_risk"))


def pseudonymize(df: DataFrame, cols: Sequence[str], *,
                 secret: str, suffix: str = "_pseu") -> DataFrame:
    """Keyed pseudonymization: each listed column gains a
    ``<col>_pseu`` companion holding SHA-256(secret ‖ value) and the
    original is DROPPED — the release-side replacement for direct
    identifiers that must stay JOINABLE (same value ⇒ same pseudonym,
    cross-table and cross-run under the same secret) but not
    reversible without the key.

    Plain unsalted hashing is NOT anonymization for low-entropy
    identifiers (emails and phone numbers enumerate in hours); the
    secret turns the rainbow-table attack into a keyed-guess attack.
    Rotating the secret unlinks every released pseudonym at once —
    re-release, don't re-map.  NULLs stay NULL (a hashed NULL would
    fabricate a spurious join key shared by every missing value).

    Pure Catalyst (concat + sha2) — scan-stage, shuffle-free, no
    Python.
    """
    out = df
    for c in cols:
        v = F.col(c).cast("string")
        out = out.withColumn(
            c + suffix,
            F.when(v.isNotNull(), F.sha2(F.concat(F.lit(secret), v), 256)))
        out = out.drop(c)
    return out


def apply_tombstones(df: DataFrame, tombstones: DataFrame, *,
                     key: str, tombstone_key: str | None = None) -> DataFrame:
    """Deletion-request propagation (the right-to-be-forgotten join):
    drop every row whose ``key`` appears in the tombstone table.
    LEFT ANTI join — Spark broadcasts the tombstone side when small
    (the usual case: deletion requests ≪ corpus) so the corpus never
    shuffles; at extreme tombstone volumes the same anti-join plans as
    a shuffled hash join with no code change.  Anti-join (not a
    filter against a collected set) keeps the tombstone list out of
    the driver and the plan resumable."""
    tk = tombstone_key or key
    ts = tombstones.select(F.col(tk).alias("__tomb")).distinct()
    return df.join(ts, df[key] == F.col("__tomb"), "left_anti")


def t_closeness(df: DataFrame, *, quasi_cols: Sequence[str],
                sensitive_col: str,
                t_max_micro: int = 200_000) -> DataFrame:
    """t-closeness audit (Li, Li & Venkatasubramanian 2007, public) —
    the attack surface l-diversity misses: a class can hold l distinct
    sensitive values yet still disclose, when its DISTRIBUTION over
    them is far from the corpus's (the skewness attack: 49 % cancer in
    a class vs 1 % globally is a disclosure even at l = 2).  Per
    equivalence class, the total-variation distance between the
    class's sensitive-value distribution and the global one:

        tvd(c) = ½ Σ_s |n_cs/n_c − N_s/N|
               = Σ_s |n_cs·N − N_s·n_c|  /  (2·n_c·N)

    The numerator is an EXACT integer summed per class (products in
    DECIMAL(38,0) — n_cs·N crosses int64 at ~10^10 rows), absolute
    gaps are per-s exact so the cross-s sum is order-independent, and
    tvd is one fixed-operand-order double division, rounded to 1e-6.

    NULL sensitive values form their own category (NULL is
    disclosure-relevant, the same stance as ``k_anonymity``'s NULL
    quasi classes — note ``countDistinct`` there SKIPS NULLs, so the
    two operators deliberately differ on that point).

    Scale: one (quasi, s) cell exchange (map-side combined), then the
    class × sensitive-vocabulary completion — bounded by design, like
    the quasi key space: the caller generalizes both sides BEFORE
    auditing.  Absent cells enter the sum via the completion (a class
    missing a globally-common value is itself distance).

    Output per class: (quasi…, class_size, tvd, at_risk_t) with
    ``at_risk_t`` = tvd > t_max_micro/1e6.
    """
    qc = list(quasi_cols)
    d38 = lambda c: c.cast("decimal(38,0)")
    cells = (df.groupBy(*qc, F.col(sensitive_col).alias("__s"))
             .agg(F.count("*").cast("long").alias("__n_cs")))
    cls = (cells.groupBy(*qc)
           .agg(F.sum("__n_cs").cast("long").alias("__n_c")))
    voc = (cells.groupBy("__s")
           .agg(F.sum("__n_cs").cast("long").alias("__n_s")))
    tot = cells.agg(F.sum("__n_cs").cast("long").alias("__N"))
    comp = (cls.crossJoin(F.broadcast(voc))
            .crossJoin(F.broadcast(tot)))
    cells2 = cells.select(*qc, "__s", "__n_cs")
    cond = [comp[c].eqNullSafe(cells2[c]) for c in qc]
    cond.append(comp["__s"].eqNullSafe(cells2["__s"]))
    joined = (comp.join(cells2, on=cond, how="left")
              .select(*[comp[c] for c in qc], comp["__s"],
                      "__n_c", "__n_s", "__N",
                      F.coalesce(F.col("__n_cs"), F.lit(0))
                      .alias("__n_cs")))
    per = (joined.groupBy(*qc)
           .agg(F.max("__n_c").alias("class_size"),
                F.max("__N").alias("__N"),
                F.sum(F.abs(d38(F.col("__n_cs")) * d38(F.col("__N"))
                            - d38(F.col("__n_s"))
                            * d38(F.col("__n_c")))).alias("__num")))
    tvd = F.round(F.col("__num").cast("double") / F.lit(2.0)
                  / F.col("class_size").cast("double")
                  / F.col("__N").cast("double"), 6)
    return per.select(
        *qc, F.col("class_size").cast("long").alias("class_size"),
        tvd.alias("tvd"),
        (tvd > F.lit(int(t_max_micro)) / F.lit(1e6)).alias("at_risk_t"))
