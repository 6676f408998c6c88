"""Ordered multi-step conversion funnels over an event log — the
product-analytics shape (view → click → purchase within a horizon),
and the crawl-ops shape (scheduled → fetched → parsed within SLA).

Semantics: for every occurrence of ``steps[0]`` (the anchor), the
GREEDY chain — the earliest ``steps[1]`` strictly after the anchor,
then the earliest ``steps[2]`` strictly after THAT, … — decides
conversion.  Greedy is exact for existence: by induction, the greedy
occurrence of step *i* is ≤ any valid chain's step *i*, so the greedy
chain's last timestamp is pointwise minimal and the horizon test on
it is equivalent to "∃ a chain within the horizon".  It is also the
canonical "first-touch" funnel attribution.

Implementation: k−1 window passes over ONE partitionBy(by) exchange
and one descending (order, tiebreak) sort — pass *i* computes, for
every row, ``min(struct(order, tiebreak, chainᵢ₊₁))`` over the rows
strictly after it (row frame, descending order), i.e. the earliest
step-*i* occurrence carrying its own already-computed continuation.
Catalyst collapses the passes onto the same Window exchange, so cost
is one shuffle regardless of k.  The unique ``tiebreak`` sits SECOND
in the struct so lexicographic comparison never reaches the nullable
chain tail — struct-null ordering is engine-specific and must not
decide a winner.

"Strictly after" means strictly later in (order, tiebreak) order, so
same-timestamp events resolve deterministically.  Scale: shuffle is
one row per event; per-key state is the sort buffer — key skew is
ordinary window skew (same salting levers as the as-of join).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def funnel_conversions(df: DataFrame, *, steps: Sequence[str],
                       by: str = "user_id", order: str = "ts",
                       tiebreak: str = "event_id",
                       type_col: str = "event_type",
                       horizon_secs: int) -> DataFrame:
    """One row per ``steps[0]`` occurrence: the greedy chain's
    timestamps (``step1_ts`` … — NULL from the first missing step on),
    ``converted`` (complete chain AND last step within
    ``horizon_secs`` of the anchor, closed bound), and
    ``secs_to_convert`` (floor of the exact integer-microsecond gap;
    NULL unless converted).  Rows with a NULL ``order``/``tiebreak``
    are dropped — they have no place in the total order.
    """
    if len(steps) < 2:
        raise ValueError("need at least two funnel steps")
    df = df.filter(F.col(order).isNotNull() & F.col(tiebreak).isNotNull())
    w = (Window.partitionBy(by)
         .orderBy(F.desc(order), F.desc(tiebreak))
         .rowsBetween(Window.unboundedPreceding, -1))

    chain: Column | None = None
    for i in range(len(steps) - 1, 0, -1):
        fields = [F.col(order).alias("t"), F.col(tiebreak).alias("k")]
        if chain is not None:
            fields.append(chain.alias("nxt"))
        occ = F.when(F.col(type_col) == steps[i], F.struct(*fields))
        df = df.withColumn(f"__c{i}", F.min(occ).over(w))
        chain = F.col(f"__c{i}")

    out = df.filter(F.col(type_col) == steps[0])
    path = "__c1"
    ts_cols = []
    for i in range(1, len(steps)):
        ts_cols.append(F.col(f"{path}.t").alias(f"step{i}_ts"))
        path += ".nxt"
    out = out.select(F.col(by), F.col(tiebreak).alias("anchor_id"),
                     F.col(order).alias("anchor_ts"), *ts_cols)
    last = F.col(f"step{len(steps) - 1}_ts")
    # NTZ→TS cast is identity under the engine's pinned UTC session
    gap_us = (F.unix_micros(last.cast("timestamp"))
              - F.unix_micros(F.col("anchor_ts").cast("timestamp")))
    converted = (last.isNotNull()
                 & (gap_us <= F.lit(int(horizon_secs) * 1_000_000)))
    # exact: the numerator is forced to a multiple of 1e6 before the
    # double division, so the quotient is integral and cross-engine
    # bit-stable (a raw int/int double division could land an ULP
    # under the true quotient and truncate one low)
    whole_us = gap_us - (gap_us % F.lit(1_000_000))
    return (out.withColumn("converted", converted)
               .withColumn("secs_to_convert",
                           F.when(converted, whole_us / F.lit(1_000_000))
                           .cast("long")))


def cohort_retention(df: DataFrame, *, by: str = "user_id",
                     order: str = "ts") -> DataFrame:
    """Classic cohort-retention matrix: cohort = the truncated week of
    each entity's FIRST event; one row per (cohort_week, week_offset)
    with the distinct entities active that week, the cohort size, and
    ``retention`` — one IEEE division of the two exact counts (stable
    cross-engine; no intermediate rounding).

    Shuffles: one groupBy(by) min for the cohort (map-side combine),
    one join back on ``by``, one distinct-count agg — all linear.
    ``week_offset`` is exact integer epoch-day arithmetic, never a
    float week division.
    """
    first = df.groupBy(by).agg(F.min(order).alias("__first_ts"))
    ev = df.select(by, order).join(first, by)
    cohort = F.date_trunc("week", F.col("__first_ts"))
    week = F.date_trunc("week", F.col(order))
    ev = ev.select(
        F.col(by),
        cohort.cast("date").alias("cohort_week"),
        ((F.unix_date(week.cast("date"))
          - F.unix_date(cohort.cast("date"))) / 7).cast("long")
        .alias("week_offset"))
    active = (ev.groupBy("cohort_week", "week_offset")
                .agg(F.countDistinct(by).alias("active_users")))
    sizes = (ev.filter(F.col("week_offset") == 0)
               .groupBy("cohort_week")
               .agg(F.countDistinct(by).alias("cohort_size")))
    return (active.join(sizes, "cohort_week")
            .withColumn("retention",
                        F.col("active_users").cast("double")
                        / F.col("cohort_size").cast("double")))


def session_path_ngrams(df: DataFrame, *, n: int = 3, top_k: int = 20,
                        by: str = "user_id", order: str = "ts",
                        tiebreak: str = "event_id",
                        type_col: str = "event_type",
                        session_col: str = "session_id") -> DataFrame:
    """Top-k most common length-``n`` event-type sequences within
    sessions (the "common paths" report).  Expects ``session_col``
    already assigned (``operators.windows.sessionize``).

    Implementation: n−1 ``lead()`` columns over ONE (by, session)
    window — no per-session array materialization, no explode — then
    a count groupBy on the concatenated path and a global top-k
    (TakeOrdered, no full sort).  Ties rank deterministically by path
    string.  Shuffle: one window exchange + one 8-byte-key agg.
    """
    w = (Window.partitionBy(by, session_col)
         .orderBy(F.col(order), F.col(tiebreak)))
    cols = [F.col(type_col)] + [
        F.lead(type_col, i).over(w) for i in range(1, n)]
    grams = (df.withColumn("__path", F.concat_ws(">", *cols))
               .withColumn("__last", F.lead(type_col, n - 1).over(w))
               .filter(F.col("__last").isNotNull()))
    return (grams.groupBy(F.col("__path").alias("path"))
            .agg(F.count(F.lit(1)).alias("n_occurrences"))
            .orderBy(F.desc("n_occurrences"), F.asc("path"))
            .limit(top_k))


def transition_matrix(df: DataFrame, *, key_col: str = "user_id",
                      order_col: str = "ts",
                      tiebreak_col: str = "event_id",
                      state_col: str = "event_type",
                      alpha: int = 1) -> DataFrame:
    """First-order Markov transition matrix over per-key event
    sequences, Laplace-smoothed — the "what do users do next" model
    and, fed back, an anomaly score for improbable paths.

    Emits the FULL S×S matrix (that is the point of smoothing: unseen
    transitions get mass α, not absence), with exact integer
    sufficient statistics: ``p_num = n + α``, ``p_den = row_n + α·S``
    and ``p = p_num / p_den`` as the single IEEE division — α is an
    integer count ("virtual observations"), never a float at the
    boundary.  ``tiebreak_col`` is REQUIRED: equal timestamps would
    otherwise make the observed transition multiset partitioning-
    dependent.

    Scale: the data-scale pass is ONE key exchange for the lead()
    window; the (from,to) count groupBy and the S×S completion run on
    state-vocabulary-sized frames (the S² cross join is metadata,
    like the group-pair frames elsewhere).
    """
    w = Window.partitionBy(key_col).orderBy(
        F.col(order_col).asc(), F.col(tiebreak_col).asc())
    tr = (df.select(F.col(state_col).alias("from_state"),
                    F.lead(state_col).over(w).alias("to_state"))
          .filter(F.col("to_state").isNotNull()))
    counts = tr.groupBy("from_state", "to_state").agg(
        F.count("*").cast("long").alias("n"))
    states = df.select(F.col(state_col).alias("s")).distinct()
    full = (states.select(F.col("s").alias("from_state"))
            .join(F.broadcast(states.select(F.col("s").alias("to_state"))),
                  F.lit(True))
            .join(counts, ["from_state", "to_state"], "left")
            .fillna(0, subset=["n"]))
    wf = Window.partitionBy("from_state")
    row_n = F.sum("n").over(wf)
    s_count = F.count("*").over(wf)  # == S on the completed matrix
    out = full.select(
        "from_state", "to_state", "n",
        (F.col("n") + F.lit(int(alpha))).alias("p_num"),
        (row_n + F.lit(int(alpha)) * s_count).cast("long").alias("p_den"))
    return out.withColumn(
        "p", F.col("p_num").cast("double") / F.col("p_den").cast("double"))


def shapley_attribution(df: DataFrame, *, user_col: str = "user_id",
                        channel_col: str = "channel",
                        converted_col: str = "converted",
                        max_channels: int = 12) -> DataFrame:
    """Exact Shapley-value channel attribution (Shapley 1953; Zhao et
    al. 2018 for the marketing form) — the credit split that last-touch
    / first-touch heuristics get wrong: each channel's credit is its
    AVERAGE MARGINAL CONTRIBUTION over every coalition of the other
    channels, the unique allocation satisfying efficiency, symmetry
    and the dummy axiom.

    Characteristic function: v(S) = (conversions from users whose
    touched-channel set ⊆ S) / N — "the share of conversions
    explainable by S alone".  Then

        φ_c · K! · N  =  Σ_{S ⊆ C∖{c}} |S|!·(K−1−|S|)!
                         · (conv(S∪{c}) − conv(S))

    where conv(S) counts converters with mask ⊆ S — ALL INTEGERS
    (weights are factorial products, conv are counts; the weighted sum
    runs in DECIMAL(38,0) since w·Δ·2^K crosses int64 past ~10^10
    users), with ONE fixed-order double division at the end.  No
    simulation, no sampled permutations: with K ≤ max_channels the
    2^K subset lattice is enumerated exactly.

    Scale shape: data-sized work is ONE groupBy(user) pass (channel
    bitmask via bit_or(1<<idx) + conversion flag) and one
    groupBy(mask) count — everything after runs on ≤ 2^K-row frames
    (the subset-containment zeta transform is a 2^K × 2^K tiny theta
    join; channel×subset pairs are K·2^(K−1) rows).  The channel
    vocabulary, K, and the subset lattice are all derived IN-PLAN
    (broadcast one-row K frame + exploded sequence) — no driver
    collect.  K > max_channels fails loudly at the sequence explode
    (2^K blow-up is the honest cost of exact Shapley; use sampled
    permutations beyond ~12 channels).

    Rows with NULL channel contribute no mask bit but keep the user
    in N.  Output: (channel, phi_share, n_users, n_channels) where
    phi_share sums to (conv(full) − conv(∅))/N across channels.
    """
    from math import factorial

    fact_arr = F.array(*[F.lit(factorial(i))
                         for i in range(int(max_channels) + 1)])

    # channel vocabulary with deterministic indices (tiny frame)
    chans = (df.filter(F.col(channel_col).isNotNull())
             .select(F.col(channel_col).cast("string").alias("channel"))
             .distinct())
    chans = chans.select(
        "channel",
        (F.row_number().over(Window.orderBy("channel")) - 1)
        .cast("int").alias("idx"))

    # one data pass: per-user mask + conversion
    users = (df.select(F.col(user_col).alias("u"),
                       F.col(channel_col).cast("string").alias("channel"),
                       F.col(converted_col).cast("boolean").alias("cv"))
             .join(F.broadcast(chans), "channel", "left")
             .groupBy("u")
             .agg(F.coalesce(
                      F.expr("bit_or(CASE WHEN idx IS NULL THEN 0 "
                             "ELSE CAST(1 AS BIGINT) << idx END)"),
                      F.lit(0)).alias("mask"),
                  F.max(F.coalesce(F.col("cv"), F.lit(False)))
                  .alias("cv")))
    by_mask = (users.groupBy("mask")
               .agg(F.count("*").alias("n"),
                    F.sum(F.col("cv").cast("long")).alias("conv")))

    kf = chans.agg(F.count("*").cast("int").alias("__k"))
    tot = users.agg(F.count("*").cast("long").alias("__n"))

    # subset lattice 0..2^K−1, in-plan
    subsets = (kf.select(F.explode(F.sequence(
        F.lit(0).cast("long"),
        F.expr("(CAST(1 AS BIGINT) << __k) - 1")))
        .alias("s"), "__k"))
    # zeta transform: conv(S) = Σ_{mask ⊆ S} conv[mask]  (2^K × masks
    # tiny theta join; masks frame is ≤ 2^K rows after the groupBy)
    zeta = (subsets.join(by_mask,
                         F.expr("(mask & s) = mask"), "left")
            .groupBy("s", "__k")
            .agg(F.coalesce(F.sum("conv"), F.lit(0)).alias("conv_s")))

    # (channel, subset-of-others) pairs with factorial weights
    pairs = (chans.crossJoin(zeta)
             .filter(F.expr("((s >> idx) & 1) = 0")))
    w = (F.element_at(fact_arr, F.bit_count(F.col("s")) + 1)
         * F.element_at(fact_arr,
                        F.col("__k") - 1 - F.bit_count(F.col("s")) + 1))
    with_s = pairs.select(
        "channel", "idx", "__k",
        F.col("s").alias("s0"),
        F.expr("s | (CAST(1 AS BIGINT) << idx)").alias("s1"),
        w.cast("decimal(38,0)").alias("w"))
    z1 = zeta.select(F.col("s").alias("s1"),
                     F.col("conv_s").alias("conv_s1"))
    z0 = zeta.select(F.col("s").alias("s0"),
                     F.col("conv_s").alias("conv_s0"))
    raw = (with_s.join(F.broadcast(z1), "s1").join(F.broadcast(z0), "s0")
           .groupBy("channel", "__k")
           .agg(F.sum(F.col("w")
                      * (F.col("conv_s1") - F.col("conv_s0"))
                      .cast("decimal(38,0)")).alias("__raw")))
    out = raw.crossJoin(F.broadcast(tot))
    kfact = F.element_at(fact_arr, F.col("__k") + 1)
    return out.select(
        "channel",
        F.round(F.col("__raw").cast("double")
                / kfact.cast("double") / F.col("__n").cast("double"), 6)
        .alias("phi_share"),
        F.col("__n").alias("n_users"),
        F.col("__k").cast("int").alias("n_channels"))


def association_rules(df: DataFrame, *, basket_col: str, item_col: str,
                      min_item_count: int = 1,
                      min_pair_count: int = 1) -> DataFrame:
    """Market-basket association rules A→B over (basket, item) events
    — support, confidence and lift from exact counts: which behaviors
    co-occur in the same basket (user/session) beyond what their
    individual frequencies explain.  Lift > 1 is genuine association;
    confidence alone inflates rules whose consequent is merely common
    (pinned in tests).

    The apriori property does the pruning: an infrequent ITEM cannot
    be in a frequent PAIR, so items below ``min_item_count`` are
    dropped BEFORE the pair join (the classic candidate-generation
    cut that keeps the per-basket quadratic bounded); pairs below
    ``min_pair_count`` are dropped after.  Both directions of every
    surviving pair are emitted (confidence is asymmetric; support and
    lift are shared).

    Exactness: all counts are exact integers from distinct-then-count
    aggregations; support/confidence/lift are ONE fixed-order double
    expression each over those integers, µ-snapped to *_micro columns
    (round(x·10⁶) as BIGINT) so the driver hash compares integers.
    The basket total N rides in-plan as a broadcast 1-row frame — no
    driver collect.

    Scale notes: one distinct over (basket, item) (map-side
    combined), one keyed self-join on basket for pairs (quadratic
    only in per-basket ITEM counts, already apriori-pruned), one pair
    agg; item-count frames are vocabulary-sized broadcast joins.

    Returns ``(ante, cons, n_pair, n_ante, n_cons, support_micro,
    confidence_micro, lift_micro)``.
    """
    bi = (df.select(F.col(basket_col).alias("__b"),
                    F.col(item_col).alias("__i"))
          .filter(F.col("__i").isNotNull())
          .distinct())
    n_total = bi.agg(F.countDistinct("__b").cast("long").alias("__N"))
    items = (bi.groupBy("__i").agg(F.count("*").cast("long").alias("__ni"))
             .filter(F.col("__ni") >= int(min_item_count)))
    kept = bi.join(F.broadcast(items.select("__i")), "__i")
    pairs = (kept.select("__b", F.col("__i").alias("__a"))
             .join(kept.select("__b", F.col("__i").alias("__c")), "__b")
             .filter(F.col("__a") < F.col("__c"))
             .groupBy("__a", "__c")
             .agg(F.count("*").cast("long").alias("n_pair"))
             .filter(F.col("n_pair") >= int(min_pair_count)))
    directed = pairs.select(F.col("__a").alias("ante"),
                            F.col("__c").alias("cons"), "n_pair") \
        .union(pairs.select(F.col("__c").alias("ante"),
                            F.col("__a").alias("cons"), "n_pair"))
    j = (directed
         .join(F.broadcast(items.select(F.col("__i").alias("ante"),
                                        F.col("__ni").alias("n_ante"))),
               "ante")
         .join(F.broadcast(items.select(F.col("__i").alias("cons"),
                                        F.col("__ni").alias("n_cons"))),
               "cons")
         .crossJoin(F.broadcast(n_total)))
    dN = F.col("__N").cast("double")
    dp = F.col("n_pair").cast("double")
    da = F.col("n_ante").cast("double")
    dc = F.col("n_cons").cast("double")
    return j.select(
        "ante", "cons", "n_pair", "n_ante", "n_cons",
        F.round(dp * F.lit(1e6) / dN).cast("long")
        .alias("support_micro"),
        F.round(dp * F.lit(1e6) / da).cast("long")
        .alias("confidence_micro"),
        F.round(dN * dp / (da * dc) * F.lit(1e6)).cast("long")
        .alias("lift_micro"))


def item_cosine(df: DataFrame, *, basket_col: str, item_col: str,
                min_item_count: int = 1,
                min_pair_count: int = 1) -> DataFrame:
    """Item-item cosine similarity over the binary basket-item matrix
    — the collaborative-filtering companion to
    :func:`association_rules`: cos(a,b) = n_ab / √(n_a·n_b), the
    symmetric association score item-to-item recommenders rank by
    ('users who touched a also touched b'), where lift measures
    direction-free dependence and confidence is asymmetric.

    Same exact-count machinery as the rules: distinct (basket, item),
    apriori item pruning BEFORE the pair self-join, exact integer
    n_a/n_b/n_ab, and ONE fixed-order double per pair µ-snapped to
    ``cosine_micro`` — the denominator √(n_a·n_b) computed in
    DECIMAL(38,0) before the one double sqrt (n² crosses int64 at
    ~3·10⁹ baskets).  Each unordered pair is emitted once (a < b).

    Output: (item_a, item_b, n_a, n_b, n_pair, cosine_micro).
    """
    d38 = lambda c: c.cast("decimal(38,0)")
    bi = (df.select(F.col(basket_col).alias("__b"),
                    F.col(item_col).alias("__i"))
          .filter(F.col("__i").isNotNull())
          .distinct())
    items = (bi.groupBy("__i").agg(F.count("*").cast("long").alias("__ni"))
             .filter(F.col("__ni") >= int(min_item_count)))
    kept = bi.join(F.broadcast(items.select("__i")), "__i")
    pairs = (kept.select("__b", F.col("__i").alias("item_a"))
             .join(kept.select("__b", F.col("__i").alias("item_b")),
                   "__b")
             .filter(F.col("item_a") < F.col("item_b"))
             .groupBy("item_a", "item_b")
             .agg(F.count("*").cast("long").alias("n_pair"))
             .filter(F.col("n_pair") >= int(min_pair_count)))
    j = (pairs
         .join(F.broadcast(items.select(F.col("__i").alias("item_a"),
                                        F.col("__ni").alias("n_a"))),
               "item_a")
         .join(F.broadcast(items.select(F.col("__i").alias("item_b"),
                                        F.col("__ni").alias("n_b"))),
               "item_b"))
    cos = F.round(
        F.col("n_pair").cast("double") * F.lit(1e6)
        / F.sqrt((d38(F.col("n_a")) * d38(F.col("n_b")))
                 .cast("double"))).cast("long")
    return j.select("item_a", "item_b", "n_a", "n_b", "n_pair",
                    cos.alias("cosine_micro"))
