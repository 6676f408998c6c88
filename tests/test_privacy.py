"""k-anonymity / l-diversity audit literal cases."""
from __future__ import annotations

from ultraviolet_spark.operators.privacy import k_anonymity, k_anonymity_summary


def _df(spark):
    rows = [
        # class (30, 'a'): 3 rows, sensitive {x, y} → k-risk only
        (30, "a", "x"), (30, "a", "x"), (30, "a", "y"),
        # class (30, 'b'): 5 rows all same sensitive → l-risk only
        *[(30, "b", "z")] * 5,
        # class (40, 'a'): 6 rows, 3 sensitive values → clean
        (40, "a", "x"), (40, "a", "x"), (40, "a", "y"),
        (40, "a", "y"), (40, "a", "z"), (40, "a", "z"),
        # NULL quasi forms its own class
        (None, "a", "x"),
    ]
    return spark.createDataFrame(rows, "age int, et string, sens string")


def test_k_anonymity_classes(spark):
    got = {(r.age, r.et): (r.class_size, r.l_diversity,
                           r.at_risk_k, r.at_risk_l)
           for r in k_anonymity(_df(spark), quasi_cols=["age", "et"],
                                sensitive_col="sens").collect()}
    assert got[(30, "a")] == (3, 2, True, False)
    assert got[(30, "b")] == (5, 1, False, True)
    assert got[(40, "a")] == (6, 3, False, False)
    assert got[(None, "a")] == (1, 1, True, True)
    assert len(got) == 4


def test_k_anonymity_summary(spark):
    r, = k_anonymity_summary(_df(spark), quasi_cols=["age", "et"],
                             sensitive_col="sens").collect()
    assert r.k_min == 1 and r.n_classes == 4
    assert r.n_classes_at_risk_k == 2 and r.n_classes_at_risk_l == 2
    # rows at risk: 3 + 5 + 1 = 9 of 15
    assert r.n_rows_at_risk == 9
    assert abs(r.frac_rows_at_risk - 9 / 15) < 1e-15


def test_pseudonymize_joinable_keyed_null_safe(spark):
    import hashlib

    from ultraviolet_spark.operators.privacy import pseudonymize

    df = spark.createDataFrame([(7, "a"), (7, "b"), (None, "c")],
                               "uid long, x string")
    out = pseudonymize(df, ["uid"], secret="k1")
    rows = {r["x"]: r["uid_pseu"] for r in out.collect()}
    assert "uid" not in out.columns  # original dropped
    expect = hashlib.sha256(b"k17").hexdigest()
    assert rows["a"] == expect == rows["b"]  # joinable: same id, same pseu
    assert rows["c"] is None                 # NULL never becomes a join key
    # different secret unlinks
    out2 = {r["x"]: r["uid_pseu"]
            for r in pseudonymize(df, ["uid"], secret="k2").collect()}
    assert out2["a"] != rows["a"]


def test_apply_tombstones_anti_join(spark):
    from ultraviolet_spark.operators.privacy import apply_tombstones

    df = spark.createDataFrame([(1,), (2,), (3,)], "uid long")
    ts = spark.createDataFrame([(2,), (2,), (9,)], "uid long")
    got = sorted(r["uid"] for r in
                 apply_tombstones(df, ts, key="uid").collect())
    assert got == [1, 3]
    plan = apply_tombstones(df, ts, key="uid") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Anti" in plan
