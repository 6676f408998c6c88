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


def entity_resolve(records: DataFrame, *, col: str,
                   threshold: float = 0.9,
                   max_dist: int = 1) -> DataFrame:
    """End-to-end record linkage over dirty string records — the full
    Fellegi–Sunter-style pipeline composed from exact, scale-safe parts:

        FastSS deletion-neighborhood BLOCKING (exact lev ≤ d candidate
        recall, no cartesian)
        → Jaro–Winkler SCORING (Arrow-batched, candidates only)
        → ``jw ≥ threshold`` MATCH edges
        → distributed transitive closure (min-label propagation +
          pointer jumping, no driver-side graph)
        → one canonical keeper per entity (minimum string).

    Returns ``(cluster_id, n_members, members)`` for every multi-record
    entity: ``cluster_id`` is the canonical (minimum) surface form,
    ``members`` the '|'-joined sorted member list (deterministic under
    any partitioning).  Singleton records never match anything and are
    by definition already resolved, so only clusters of ≥ 2 appear.

    Scale: blocking is linear in records × neighborhood size with one
    variant-key hash join; scoring touches candidates only; the closure
    shuffles (node, label) pairs.  Nothing is quadratic in the corpus.
    """
    from ultraviolet_spark.operators.dedup import connected_components

    cand = deletion_neighborhood_pairs(records, col=col, max_dist=max_dist)
    scored = jaro_winkler_pairs(cand, col_a=f"{col}_a", col_b=f"{col}_b")
    edges = scored.filter(F.col("jw") >= threshold)
    cc = connected_components(edges, f"{col}_a", f"{col}_b")
    return (cc.groupBy(F.col("component").alias("cluster_id"))
            .agg(F.count("*").alias("n_members"),
                 F.array_join(F.array_sort(F.collect_list("node")), "|")
                 .alias("members"))
            .filter(F.col("n_members") >= 2))


def _jaro_winkler_py(a: str, b: str) -> float:
    """Reference Jaro–Winkler (standard definition: match window
    max(|a|,|b|)//2 − 1, FLOORED half-transpositions, prefix boost up
    to 4 chars, 0.1 scale, applied only when jaro > 0.7 — the exact
    variant DuckDB's C++ implementation uses, pinned by 300-case
    fuzzing in tests/test_jaro_winkler.py)."""
    la, lb = len(a), len(b)
    if la == 0 or lb == 0:
        return 0.0
    win = max(max(la, lb) // 2 - 1, 0)
    bm = [False] * lb
    am = [False] * la
    m = 0
    for i, ca in enumerate(a):
        lo, hi = max(0, i - win), min(lb, i + win + 1)
        for j in range(lo, hi):
            if not bm[j] and b[j] == ca:
                am[i] = bm[j] = True
                m += 1
                break
    if m == 0:
        return 0.0
    sa = [c for c, f in zip(a, am) if f]
    sb = [c for c, f in zip(b, bm) if f]
    # DuckDB/RapidFuzz FLOOR the half-transposition count (t = k//2,
    # not k/2.0 — found by fuzzing: odd mismatch counts are possible
    # because matched multisets permute, and the classic half-count
    # then disagrees in the 2nd decimal)
    t = sum(x != y for x, y in zip(sa, sb)) // 2
    jaro = (m / la + m / lb + (m - t) / m) / 3.0
    if jaro > 0.7:
        l = 0
        for x, y in zip(a[:4], b[:4]):
            if x != y:
                break
            l += 1
        jaro += 0.1 * l * (1.0 - jaro)
    return jaro


def jaro_winkler_pairs(df: DataFrame, *, col_a: str,
                       col_b: str) -> DataFrame:
    """Add a ``jw`` column (rounded 6) scoring each (a, b) pair —
    record-linkage scoring over an already-BLOCKED candidate set (the
    FastSS/LSH output), never all-pairs: JW is inherently a per-pair
    character walk, so it runs as an Arrow-batched pandas UDF over
    candidates only.  Validated against DuckDB's independent C++
    implementation (q178) and round(6) absorbs last-ULP float-order
    differences (magnitude ≤ 1, so the grid sits far above double ULP).
    """
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _fn(a, b):
        return pd.Series([_jaro_winkler_py(x or "", y or "")
                          for x, y in zip(a, b)])

    # module uses `from __future__ import annotations`, which turns
    # hints into strings pandas_udf cannot infer — set real ones
    _fn.__annotations__ = {"a": pd.Series, "b": pd.Series,
                           "return": pd.Series}
    jw = pandas_udf(_fn, "double")
    return df.withColumn("jw", F.round(jw(F.col(col_a), F.col(col_b)), 6))


def fs_field_weights(records: DataFrame, pairs: DataFrame, *,
                     fields: list[str],
                     anchor_col: str = "is_anchor") -> DataFrame:
    """Fellegi–Sunter (1969, public) probabilistic record-linkage
    field weights — the scoring theory behind ``entity_resolve``'s
    threshold: for each comparison field, the agreement weight
    ln(m/u) and disagreement weight ln((1−m)/(1−u)), where m is the
    agreement probability among MATCHES and u among NON-matches.  A
    field that agrees by chance half the time (u large) earns little
    credit for agreeing; a high-cardinality field that almost never
    agrees by accident earns a lot.

    Estimation without labels, exactly:

    * u_f — the chance-agreement probability of two random records —
      comes EXACTLY from the field's value histogram:
      (Σ_v c_v² − n)/(n² − n), integers in DECIMAL(38,0) (n² crosses
      int64 at n ≈ 3·10⁹); NULL is a value (null-safe agreement ⟺
      histogram counts NULLs), matching the scorer's ``<=>``;
    * m_f comes from the ANCHOR pairs (pairs the caller trusts as
      matches — a shared strong key, a verified subset): the standard
      label-free alternative to EM, and the anchor rule is explicit
      instead of hidden inside an E-step;
    * both ratios are Laplace-held-exact by integer doubling
      (p = (2a+1)/(2n+2), the woe_iv discipline) so no ln(0) exists
      even for all-distinct fields or empty anchor sets, and each
      weight is ln(a)−ln(b)−ln(c)+ln(d) in FIXED operand order
      snapped once to integer micro-nats.

    One pass over records for ALL field histograms (fields explode
    through a map, one (field, value) exchange); one pass over anchor
    pairs.  Output per field: (field, m, u, w_agree_micro,
    w_disagree_micro).
    """
    d38 = lambda c: c.cast("decimal(38,0)")
    tall = records.select(F.explode(F.create_map(
        *[x for f in fields
          for x in (F.lit(f), F.col(f).cast("string"))]))
        .alias("field", "v"))
    hist = (tall.groupBy("field", "v")
            .agg(F.count("*").cast("long").alias("c")))
    u = (hist.groupBy("field")
         .agg((F.sum(d38(F.col("c")) * d38(F.col("c")))
               - F.sum("c")).alias("__ag"),
              F.sum("c").cast("long").alias("__n")))
    u = u.select(
        "field",
        (F.lit(2) * F.col("__ag") + F.lit(1)).alias("u_num"),
        (F.lit(2) * (d38(F.col("__n")) * d38(F.col("__n"))
                     - F.col("__n")) + F.lit(2)).alias("u_den"))
    anch = pairs.filter(F.col(anchor_col))
    m_aggs = [F.sum(F.col(f"{f}_a").eqNullSafe(F.col(f"{f}_b"))
                    .cast("long")).alias(f"__a_{f}")
              for f in fields]
    m_one = anch.agg(F.count("*").cast("long").alias("__na"), *m_aggs)
    m_tall = m_one.select(
        "__na", F.explode(F.create_map(
            *[x for f in fields
              for x in (F.lit(f), F.col(f"__a_{f}"))]))
        .alias("field", "__agree"))
    m = m_tall.select(
        "field",
        (F.lit(2) * F.col("__agree") + F.lit(1)).cast("long")
        .alias("m_num"),
        (F.lit(2) * F.col("__na") + F.lit(2)).cast("long")
        .alias("m_den"))
    w = m.join(u, "field")
    ln = lambda c: F.log(c.cast("double"))
    w_a = F.round((ln(F.col("m_num")) - ln(F.col("m_den"))
                   - ln(F.col("u_num")) + ln(F.col("u_den")))
                  * F.lit(1e6)).cast("long")
    w_d = F.round((ln(F.col("m_den") - F.col("m_num"))
                   - ln(F.col("m_den"))
                   - ln(F.col("u_den") - F.col("u_num"))
                   + ln(F.col("u_den"))) * F.lit(1e6)).cast("long")
    return w.select(
        "field",
        F.round(F.col("m_num").cast("double")
                / F.col("m_den").cast("double"), 6).alias("m"),
        F.round(F.col("u_num").cast("double")
                / F.col("u_den").cast("double"), 9).alias("u"),
        w_a.alias("w_agree_micro"), w_d.alias("w_disagree_micro"))


def fs_score_pairs(pairs: DataFrame, weights: DataFrame, *,
                   fields: list[str]) -> DataFrame:
    """Score candidate pairs with Fellegi–Sunter field weights: each
    field contributes its agreement or disagreement micro-nat weight
    (null-safe agreement, matching the u estimation), the pair score
    is the exact integer sum — pairs above/below thresholds go to
    link / non-link, the band between to clerical review (the
    caller's two thresholds).  Weights ride one broadcast map row;
    scoring is scan-stage over the pairs frame.
    """
    wmap = weights.groupBy().agg(F.map_from_arrays(
        F.collect_list("field"),
        F.collect_list(F.struct("w_agree_micro", "w_disagree_micro")))
        .alias("__w"))
    j = pairs.crossJoin(F.broadcast(wmap))
    score = None
    for f in fields:
        agree = F.col(f"{f}_a").eqNullSafe(F.col(f"{f}_b"))
        term = F.when(agree, F.col("__w")[f]["w_agree_micro"]) \
            .otherwise(F.col("__w")[f]["w_disagree_micro"])
        score = term if score is None else score + term
    return (j.withColumn("score_micro", score.cast("long"))
            .drop("__w"))


def sorted_neighborhood_pairs(df: DataFrame, *, id_col: str,
                              sort_expr: str, window: int = 3,
                              n_buckets: int = 64) -> DataFrame:
    """Sorted-neighborhood blocking (Hernández & Stolfo 1995) — the
    classic O(n·w) candidate generator between exact blocking (misses
    near-misses that hash apart) and all-pairs (quadratic): sort all
    records by a fuzzy key (e.g. a name prefix, a normalized URL),
    then pair every record with its ``window`` successors in the sort
    order.  Two records whose keys are CLOSE end up adjacent even
    when no exact blocking key agrees.

    Exactness: the global rank over (sort key, id) runs the two-phase
    value-range bucket machinery over the md5-integerized key prefix
    (in-bucket row_numbers + broadcast offsets — no single-partition
    window, same as quantile_bin); pairs come from ONE
    explode(1..w) + equi-join on rank+offset — a keyed join, never a
    range join or cartesian.  Output is deterministic: the (key, id)
    total order is unique.

    Scale: n·w candidate pairs by construction; the sort key should
    be designed so true matches land within w (multi-pass with
    rotated keys is the standard recipe — call this operator once
    per key).

    Returns ``(id_a, id_b, rank_a, rank_b)`` with rank_a < rank_b ≤
    rank_a + window.
    """
    from pyspark.sql import Window

    B = int(n_buckets)
    w_ = int(window)
    key = F.expr(sort_expr).cast("string")
    # integerize the leading 12 hex of md5 ONLY for bucketing — the
    # ORDER uses the real key (bucket boundaries need not respect
    # order, offsets are computed per bucket of the key range instead)
    base = (df.select(F.col(id_col).alias("id"), key.alias("__s"))
            .filter(F.col("__s").isNotNull()))
    # two-phase rank over the (key, id) order: bucket by the key's
    # first two characters — a MONOTONE function of the sort order
    # (md5 buckets would scatter it), so in-bucket (key, id)
    # row_numbers + bucket offsets reproduce the global total order;
    # ASCII-safe sort keys documented (codepoint vs UTF-8-byte order
    # diverges for multibyte keys)
    pref = (F.coalesce(F.ascii(F.substring(F.col("__s"), 1, 1)),
                       F.lit(0)) * 256
            + F.coalesce(F.ascii(F.substring(F.col("__s"), 2, 1)),
                         F.lit(0))).cast("int")
    b = base.withColumn("__b", (pref % F.lit(65536)).cast("int"))
    w_in = Window.partitionBy("__b").orderBy("__s", "id")
    r = b.withColumn("__i", F.row_number().over(w_in))
    bc = b.groupBy("__b").agg(F.count("*").alias("__c"))
    w_off = Window.orderBy("__b").rowsBetween(Window.unboundedPreceding,
                                              -1)
    boff = bc.select("__b", F.coalesce(
        F.sum("__c").over(w_off), F.lit(0)).alias("__off"))
    ranked = (r.join(F.broadcast(boff), "__b")
              .select("id", "__s",
                      (F.col("__off") + F.col("__i")).cast("long")
                      .alias("__rk")))
    left = ranked.withColumn(
        "__o", F.explode(F.sequence(F.lit(1), F.lit(w_))))
    left = left.select(F.col("id").alias("id_a"),
                       F.col("__rk").alias("rank_a"),
                       (F.col("__rk") + F.col("__o")).alias("__rk2"))
    right = ranked.select(F.col("id").alias("id_b"),
                          F.col("__rk").alias("rank_b"))
    return (left.join(right, left["__rk2"] == right["rank_b"])
            .select("id_a", "id_b", "rank_a", "rank_b"))
