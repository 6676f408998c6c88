"""ANALYZE-style table_stats: exact counts incl. nulls, NDV, min/max."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.spark


def test_table_stats_exact(spark):
    from ultraviolet_spark.operators.stats import table_stats
    rows = [(1, "a", None), (2, "b", 5.0), (2, None, 7.5), (4, "a", 5.0)]
    df = spark.createDataFrame(rows, "k long, s string, v double")
    got = {r["column"]: r.asDict() for r in table_stats(df).collect()}
    assert got["k"]["n"] == 4 and got["k"]["n_null"] == 0
    assert got["k"]["n_distinct"] == 3
    assert (got["k"]["min_str"], got["k"]["max_str"]) == ("1", "4")
    assert got["s"]["n_null"] == 1 and got["s"]["n_distinct"] == 2
    assert got["v"]["n_null"] == 1 and got["v"]["n_distinct"] == 2
    assert got["v"]["min_str"] == "5.0"


def test_table_stats_single_shuffle_plan(spark):
    from ultraviolet_spark.operators.stats import table_stats
    df = spark.range(100).selectExpr("id", "id % 7 AS m")
    stats = table_stats(df)
    plan = stats._jdf.queryExecution().executedPlan().toString()
    # multi-count-distinct plans as Expand + aggregates; no join stages
    assert "Join" not in plan
    assert {r["column"] for r in stats.collect()} == {"id", "m"}


def test_join_cardinality_exact_vs_real_join(spark):
    from ultraviolet_spark.operators.stats import join_cardinality
    a = spark.createDataFrame([(i % 5,) for i in range(40)], "k long")
    b = spark.createDataFrame([(i % 7,) for i in range(21)], "k long")
    got = join_cardinality(a, b, a_key="k").first()
    real = a.join(b, "k").count()
    assert got["join_rows"] == real
    assert got["matching_keys"] == 5        # keys 0..4 exist in both
    # key 0: a has 8, b has 3 -> 24 = max contribution
    assert got["max_key_rows"] == 24


def test_join_cardinality_empty_intersection(spark):
    from ultraviolet_spark.operators.stats import join_cardinality
    a = spark.createDataFrame([(1,)], "k long")
    b = spark.createDataFrame([(2,)], "k long")
    got = join_cardinality(a, b, a_key="k").first()
    assert (got["join_rows"], got["matching_keys"],
            got["max_key_rows"]) == (0, 0, 0)


def test_weighted_median_hand_case(spark):
    from ultraviolet_spark.operators.stats import weighted_median

    rows = [
        # group a: values 1(w3), 2(w1), 10(w1): W=5, crossing at cum 3
        ("a", 1.0, 3), ("a", 2.0, 1), ("a", 10.0, 1),
        # group b: even W ties exactly at the boundary: 2*cum == W
        # picks the LOWER value (1.0, cum 2 of W 4)
        ("b", 1.0, 2), ("b", 5.0, 2),
        # group c: repeated values merge before the window
        ("c", 7.0, 1), ("c", 7.0, 1), ("c", 3.0, 1),
    ]
    df = spark.createDataFrame(rows, "g string, v double, w long")
    got = {r.g: (r.w_total, r.weighted_median) for r in weighted_median(
        df, value_col="v", weight_col="w", by="g").collect()}
    assert got == {"a": (5, 1.0), "b": (4, 1.0), "c": (3, 7.0)}


def test_weighted_median_python_reference(spark):
    import random

    from ultraviolet_spark.operators.stats import weighted_median

    rng = random.Random(5)
    rows = [(str(rng.randrange(4)), float(rng.randrange(100)),
             rng.randrange(1, 9)) for _ in range(400)]
    df = spark.createDataFrame(rows, "g string, v double, w long")
    got = {r.g: (r.w_total, r.weighted_median) for r in weighted_median(
        df, value_col="v", weight_col="w", by="g").collect()}
    from collections import defaultdict
    acc = defaultdict(lambda: defaultdict(int))
    for g, v, w in rows:
        acc[g][v] += w
    for g, vw in acc.items():
        W = sum(vw.values())
        cum = 0
        for v in sorted(vw):
            cum += vw[v]
            if 2 * cum >= W:
                assert got[g] == (W, v), g
                break


def test_chi2_feature_selection_brute_force(spark):
    from ultraviolet_spark.operators.stats import chi2_feature_selection

    rows = [
        (1, "spam spam buy now"),     # label 1 docs
        (1, "buy cheap now"),
        (1, "spam offer"),
        (0, "meeting notes agenda"),  # label 0 docs
        (0, "notes from the meeting"),
        (0, "agenda buy"),
    ]
    df = spark.createDataFrame(rows, "y long, text string")
    got = {r["token"]: r for r in
           chi2_feature_selection(df, label_col="y", text_col="text",
                                  top_k=100, min_df=1).collect()}

    def brute(tok):
        a = sum(1 for y, t in rows if y == 1 and tok in t.split())
        b = sum(1 for y, t in rows if y == 0 and tok in t.split())
        c, d = 3 - a, 3 - b
        den = (a + b) * (c + d) * (a + c) * (b + d)
        n = 6
        return (a, b, c, d,
                None if den == 0 else float(n) * (float(a * d - b * c)
                                                  * float(a * d - b * c))
                / float(den))

    for tok in ["spam", "buy", "meeting", "notes", "agenda", "now"]:
        a, b, c, d, chi2 = brute(tok)
        r = got[tok]
        assert (r["a"], r["b"], r["c"], r["d"]) == (a, b, c, d)
        assert r["chi2"] == chi2
    # 'spam' is a perfect positive signal within its margin; 'buy'
    # appears both sides and must score lower
    assert got["spam"]["chi2"] > got["buy"]["chi2"]
    # within-doc duplicate ('spam spam') votes once: presence, not tf
    assert got["spam"]["a"] == 2


def test_chi2_all_doc_token_null_margin(spark):
    from ultraviolet_spark.operators.stats import chi2_feature_selection

    df = spark.createDataFrame(
        [(1, "the cat"), (0, "the dog")], "y long, text string")
    got = {r["token"]: r for r in
           chi2_feature_selection(df, label_col="y", text_col="text",
                                  top_k=10, min_df=1).collect()}
    assert got["the"]["chi2"] is None  # present in every doc: zero margin
    assert got["cat"]["chi2"] == 2.0   # perfect separator of n=2


def test_acf_matches_numpy_definition(spark):
    import numpy as np

    from ultraviolet_spark.operators.stats import acf_by_key

    rng_vals = [5, 9, 2, 8, 1, 7, 3, 9, 2, 8, 1, 7]  # deterministic
    rows = [(1, i, i, v) for i, v in enumerate(rng_vals)]
    rows += [(2, i, i, 4) for i in range(5)]          # constant series
    rows += [(3, 0, 0, 6), (3, 1, 1, 2)]              # n=2: only lag 1
    df = spark.createDataFrame(rows, "k long, t long, id long, x long")
    got = {(r["k"], r["lag"]): r for r in
           acf_by_key(df, key_col="k", order_col="t", value_col="x",
                      tiebreak_col="id", max_lag=3).collect()}

    x = np.array(rng_vals, dtype=np.float64)
    n, m = len(x), x.mean()
    c0 = ((x - m) ** 2).sum()
    for lag in (1, 2, 3):
        expect = ((x[:-lag] - m) * (x[lag:] - m)).sum() / c0
        assert abs(got[(1, lag)]["acf"] - expect) < 1e-12
    # constant series: zero variance -> NULL, never a crash
    assert all(got[(2, lag)]["acf"] is None for lag in (1, 2, 3))
    # n=2 emits only lag 1 (lag >= n suppressed)
    assert (3, 1) in got and (3, 2) not in got and (3, 3) not in got
    # biased estimator: 1 cross pair over 2 squared deviations = -0.5
    assert got[(3, 1)]["acf"] == -0.5


def test_ols_trend_matches_numpy(spark):
    import numpy as np

    from ultraviolet_spark.operators.stats import ols_trend_by_key

    xs = [10000, 10001, 10002, 10003, 10004, 10007]
    ys = [5, 7, 6, 9, 11, 14]
    rows = [("a", x, y) for x, y in zip(xs, ys)]
    rows += [("one_pt", 3, 8)]          # single point: NULL slope
    rows += [("const_y", 1, 4), ("const_y", 2, 4)]  # r2 is 0/0: NULL
    df = spark.createDataFrame(rows, "k string, x long, y long")
    got = {r["k"]: r for r in
           ols_trend_by_key(df, key_col="k", x_col="x", y_col="y").collect()}

    slope, intercept = np.polyfit(np.array(xs, float), np.array(ys, float), 1)
    assert abs(got["a"]["slope"] - slope) < 1e-9
    r = np.corrcoef(xs, ys)[0, 1]
    assert abs(got["a"]["r2"] - r * r) < 1e-9
    assert got["one_pt"]["slope"] is None and got["one_pt"]["r2"] is None
    assert got["const_y"]["slope"] == 0.0 and got["const_y"]["r2"] is None


def test_regularity_scheduler_flags_human_does_not(spark):
    from ultraviolet_spark.operators.stats import inter_event_regularity
    from datetime import datetime, timedelta
    t0 = datetime(2024, 1, 1)
    rows = []
    # bot: a perfect 60 s ticker — CV² = 0
    rows += [("bot", t0 + timedelta(seconds=60 * i), i) for i in range(10)]
    # human: bursty gaps spanning two orders of magnitude
    gaps = [1, 2, 300, 5, 900, 1, 1200, 3, 400]
    acc = 0
    rows.append(("human", t0, 0))
    for i, gp in enumerate(gaps):
        acc += gp
        rows.append(("human", t0 + timedelta(seconds=acc), i + 1))
    df = spark.createDataFrame(rows, "user_id string, ts timestamp, event_id long")
    got = {r["user_id"]: r.asDict() for r in inter_event_regularity(
        df, key_col="user_id", ts_col="ts", tiebreak_col="event_id").collect()}
    assert got["bot"]["is_regular"] is True
    assert got["bot"]["cv2_num"] == 0 and got["bot"]["cv2"] == 0.0
    assert got["human"]["is_regular"] is False
    assert got["human"]["cv2"] > 0.1
    # exact sufficient stats for the bot: 9 gaps of 60 s
    assert (got["bot"]["n_gaps"], got["bot"]["gap_sum_s"],
            got["bot"]["gap_sq_sum_s"]) == (9, 540, 9 * 3600)


def test_regularity_sparse_and_degenerate_never_flag(spark):
    from ultraviolet_spark.operators.stats import inter_event_regularity
    from datetime import datetime, timedelta
    t0 = datetime(2024, 1, 1)
    rows = []
    # sparse: 4 gaps of a perfect ticker — below min_gaps=5
    rows += [("sparse", t0 + timedelta(seconds=10 * i), i) for i in range(5)]
    # degenerate: 6 events all at the same instant — gap_sum 0
    rows += [("instant", t0, i) for i in range(6)]
    # single event: no gaps at all — key must not appear
    rows.append(("lone", t0, 0))
    df = spark.createDataFrame(rows, "user_id string, ts timestamp, event_id long")
    got = {r["user_id"]: r.asDict() for r in inter_event_regularity(
        df, key_col="user_id", ts_col="ts", tiebreak_col="event_id").collect()}
    assert set(got) == {"sparse", "instant"}
    assert got["sparse"]["is_regular"] is False      # perfect but sparse
    assert got["sparse"]["cv2"] == 0.0
    assert got["instant"]["is_regular"] is False     # Σg = 0 guard
    assert got["instant"]["cv2"] is None


def test_regularity_boundary_is_integer_exact(spark):
    from ultraviolet_spark.operators.stats import inter_event_regularity
    from datetime import datetime, timedelta
    t0 = datetime(2024, 1, 1)

    def series(uid, gaps):
        acc, out = 0, [(uid, t0, 0)]
        for i, gp in enumerate(gaps):
            acc += gp
            out.append((uid, t0 + timedelta(seconds=acc), i + 1))
        return out

    # exactly AT the boundary: cv2_num*10 == cv2_den must NOT flag
    # gaps (7,13)*3 chosen so n·Σg² − (Σg)² relates visibly; instead
    # construct: gaps of (3,3,3,3,3,4): n=6 Σg=19 Σg²=61
    # num = 6*61 - 361 = 5; den = 361; 5*10=50 < 361 → flags.
    # push to a tie: threshold_tenths param with num*10 == den*t.
    rows = series("edge", [3, 3, 3, 3, 3, 4])
    df = spark.createDataFrame(rows, "user_id string, ts timestamp, event_id long")
    r = inter_event_regularity(df, key_col="user_id", ts_col="ts",
                               tiebreak_col="event_id").first()
    assert (r["n_gaps"], r["gap_sum_s"], r["gap_sq_sum_s"]) == (6, 19, 61)
    assert r["cv2_num"] == 6 * 61 - 19 * 19 and r["cv2_den"] == 361
    assert r["is_regular"] is True                   # 50 < 361
    # strict-<: with a zero threshold num*10 < 0 is impossible, so even
    # a perfectly regular series must not flag — the comparison is
    # integer cross-multiplication, no float rounding at the boundary
    r2 = inter_event_regularity(
        df, key_col="user_id", ts_col="ts", tiebreak_col="event_id",
        cv2_threshold_tenths=0).first()
    assert r2["is_regular"] is False


def test_jsd_identical_and_disjoint_distributions(spark):
    from ultraviolet_spark.operators.stats import jsd_drift_pairs, _LN2
    rows = ([("a", t) for t in "xxyyz"] + [("b", t) for t in "xxyyz"]
            + [("a", "w"), ("b", "w")]       # keep vocab identical
            + [("c", t) for t in "ppqqr"])   # disjoint from a and b
    df = spark.createDataFrame(rows, "g string, t string")
    got = {(r["g1"], r["g2"]): r for r in jsd_drift_pairs(
        df, group_col="g", item_col="t").collect()}
    ab = got[("a", "b")]
    assert ab["jsd"] == 0.0                  # identical distributions
    assert ab["n_shared"] == 4 and ab["a_shared"] == 6
    # zero shared vocab → pair absent by contract (JSD would be ln 2)
    assert ("a", "c") not in got and ("b", "c") not in got


def test_jsd_matches_scipy_definition(spark):
    import math
    from collections import Counter
    from ultraviolet_spark.operators.stats import jsd_drift_pairs
    ta = "the cat sat on the mat the cat".split()
    tb = "the dog sat on a log the dog dog".split()
    df = spark.createDataFrame(
        [("a", t) for t in ta] + [("b", t) for t in tb], "g string, t string")
    r = jsd_drift_pairs(df, group_col="g", item_col="t").first()
    pa, pb = Counter(ta), Counter(tb)
    na, nb = len(ta), len(tb)
    vocab = set(pa) | set(pb)
    jsd = 0.0
    for t in vocab:
        p, q = pa[t] / na, pb[t] / nb
        m = (p + q) / 2
        if p:
            jsd += 0.5 * p * math.log(p / m)
        if q:
            jsd += 0.5 * q * math.log(q / m)
    # micro-nat rounding bounds the error by 0.5e-6 per shared term
    assert abs(r["jsd"] - jsd) < 1e-6 * r["n_shared"]
    assert 0.0 <= r["jsd"] <= 0.6931471805599453


def test_json_schema_profile_types_and_dominance(spark):
    from ultraviolet_spark.operators.stats import json_schema_profile
    docs = [
        '{"a": 1, "s": "hi", "f": 2.5, "b": true, "z": null}',
        '{"a": 2, "s": "yo", "arr": [1,2], "obj": {"x": 1}}',
        '{"a": "three"}',               # type conflict on a
        'not json at all',              # malformed: contributes nothing
        '{"neg": -7, "negf": -0.25}',   # signed numerics
    ]
    df = spark.createDataFrame([(d,) for d in docs], "doc string")
    got = {r["key"]: r.asDict() for r in json_schema_profile(
        df, json_col="doc").collect()}
    a = got["a"]
    assert (a["n_present"], a["n_int"], a["n_string"]) == (3, 2, 1)
    assert a["dominant_type"] == "int"
    assert got["s"]["dominant_type"] == "string"
    assert got["f"]["n_double"] == 1 and got["negf"]["n_double"] == 1
    assert got["neg"]["n_int"] == 1
    assert got["b"]["n_bool"] == 1
    assert got["z"]["n_null"] == 1 and got["z"]["dominant_type"] == "null"
    assert got["arr"]["n_array"] == 1
    assert got["obj"]["n_object"] == 1
    assert "not" not in got             # malformed rows vanish silently


def test_json_schema_profile_tiebreak_is_priority_order(spark):
    from ultraviolet_spark.operators.stats import json_schema_profile
    # one int + one string occurrence: tie → priority picks 'int'
    df = spark.createDataFrame(
        [('{"k": 5}',), ('{"k": "five"}',)], "doc string")
    r = json_schema_profile(df, json_col="doc").first()
    assert r["dominant_type"] == "int"
