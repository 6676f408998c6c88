"""Declarative data-quality expectation suite — the Deequ/Great-
Expectations shape (Schelter et al. 2018, public) as a single
operator: a list of rules validated against a DataFrame in as few
passes as the rule mix permits, emitting one row per rule with exact
violation counts and a pass verdict.

Design for 10^12 rows:

* every ROW-LOCAL rule (not_null / range / in_set / regex) folds into
  ONE shared aggregation pass — a map-side-combined scan producing a
  single row of violation counters, unpivoted to the tall report;
  adding 50 row-local rules costs zero extra scans;
* ``unique`` pays the honest one-exchange price: a groupBy over the
  key columns (NULL keys group like values — a duplicated NULL key IS
  a duplicate) with violations = Σ(count) − #groups;
* ``subset_of`` (referential integrity) is a LEFT ANTI join against
  the reference column — broadcast when the reference is dimension-
  sized, the usual FK-check shape; NULL foreign keys are not
  references and do not violate (SQL FK semantics);
* ``range`` / ``in_set`` / ``regex`` ignore NULLs (pair them with a
  ``not_null`` rule when NULL itself is a violation) — the SQL
  constraint-check convention, documented rather than implied.

All counts are exact int64; ``passed`` = violations ≤ max_violations
(default 0).  Rule ids are deterministic strings like
``not_null(o_custkey)`` so the report is a stable join key for
regression tracking across runs.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _rule_id(r: Mapping) -> str:
    kind = r["rule"]
    if kind == "unique":
        return f"unique({','.join(r['cols'])})"
    if kind == "subset_of":
        return f"subset_of({r['col']}->{r['ref_col']})"
    if kind == "range":
        return f"range({r['col']},{r.get('min')},{r.get('max')})"
    if kind == "in_set":
        return f"in_set({r['col']})"
    if kind == "regex":
        return f"regex({r['col']})"
    return f"{kind}({r['col']})"


def validate_expectations(df: DataFrame,
                          rules: Sequence[Mapping]) -> DataFrame:
    """Validate ``rules`` against ``df``; returns the tall report
    (rule, violations, n, passed).  See module docstring for rule
    kinds and NULL semantics."""
    row_local: list[tuple[str, F.Column]] = []
    extra_frames: list[DataFrame] = []
    max_v = {r_id: int(r.get("max_violations", 0))
             for r, r_id in ((r, _rule_id(r)) for r in rules)}

    for r in rules:
        kind = r["rule"]
        rid = _rule_id(r)
        if kind == "not_null":
            row_local.append((rid, F.col(r["col"]).isNull()))
        elif kind == "range":
            c = F.col(r["col"])
            cond = F.lit(False)
            if r.get("min") is not None:
                cond = cond | (c < F.lit(r["min"]))
            if r.get("max") is not None:
                cond = cond | (c > F.lit(r["max"]))
            row_local.append((rid, c.isNotNull() & cond))
        elif kind == "in_set":
            c = F.col(r["col"])
            row_local.append(
                (rid, c.isNotNull() & ~c.isin(list(r["values"]))))
        elif kind == "regex":
            c = F.col(r["col"])
            row_local.append(
                (rid, c.isNotNull() & ~c.rlike(r["pattern"])))
        elif kind == "unique":
            cols = list(r["cols"])
            g = (df.groupBy(*cols)
                 .agg(F.count("*").alias("__c"))
                 .agg((F.sum("__c") - F.count("*")).cast("long")
                      .alias("violations"),
                      F.sum("__c").cast("long").alias("n")))
            extra_frames.append(g.select(F.lit(rid).alias("rule"),
                                         "violations", "n"))
        elif kind == "subset_of":
            ref = (r["ref_df"].select(F.col(r["ref_col"]).alias("__k"))
                   .distinct())
            fk = df.filter(F.col(r["col"]).isNotNull())
            bad = (fk.join(F.broadcast(ref),
                           fk[r["col"]] == ref["__k"], "left_anti")
                   .agg(F.count("*").cast("long").alias("violations")))
            n_f = fk.agg(F.count("*").cast("long").alias("n"))
            extra_frames.append(
                bad.crossJoin(F.broadcast(n_f))
                .select(F.lit(rid).alias("rule"), "violations", "n"))
        else:
            raise ValueError(f"unknown rule kind: {kind}")

    frames = []
    if row_local:
        aggs = [F.sum(F.when(cond, 1).otherwise(0)).cast("long")
                .alias(f"__r{i}") for i, (_, cond) in enumerate(row_local)]
        one = df.agg(*aggs, F.count("*").cast("long").alias("__n"))
        kv = []
        for i, (rid, _) in enumerate(row_local):
            kv += [F.lit(rid), F.col(f"__r{i}")]
        tall = (one.select("__n", F.explode(F.create_map(*kv))
                           .alias("rule", "violations"))
                .select("rule", "violations", F.col("__n").alias("n")))
        frames.append(tall)
    frames.extend(extra_frames)
    report = frames[0]
    for fr in frames[1:]:
        report = report.union(fr)
    thresh = F.create_map(
        *[F.lit(x) for kv2 in max_v.items() for x in kv2]) \
        if max_v else F.create_map()
    return report.select(
        "rule", "violations", "n",
        (F.col("violations")
         <= F.coalesce(thresh[F.col("rule")], F.lit(0)))
        .alias("passed"))
