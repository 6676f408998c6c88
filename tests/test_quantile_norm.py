"""quantile_normalize: sequential reference equality, the defining
post-condition (every dimension ends with the SAME multiset of
values), rank-preservation within dimensions, and the no-single-dim-
window plan shape."""

from __future__ import annotations

from ultraviolet_spark.operators.vectorize import quantile_normalize

SCHEMA = "vec_id long, embedding array<float>"


def _py_qn(vecs):
    d = len(next(iter(vecs.values())))
    cols = {j: sorted((round(v[j] * 1e6), i) for i, v in vecs.items())
            for j in range(d)}
    ref = {r + 1: round(sum(cols[j][r][0] for j in range(d))
                        / d / 1e6, 6)
           for r in range(len(vecs))}
    out = {}
    for j in range(d):
        for r, (_v, i) in enumerate(cols[j]):
            out[(i, j)] = (r + 1, ref[r + 1])
    return out


def _run(spark, vecs):
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in vecs.items()], SCHEMA)
    return {(r["vec_id"], r["dim"]): (r["rk"], r["norm"])
            for r in quantile_normalize(df).collect()}


VECS = {
    0: [1.0, 100.0, -3.5],
    1: [2.0, 50.0, -3.5],     # tie in dim 2 → id tiebreak
    2: [0.5, 75.0, 10.0],
    3: [9.0, 60.0, 0.25],
}


def test_matches_sequential_reference(spark):
    assert _run(spark, VECS) == _py_qn(VECS)


def test_dimensions_share_one_distribution(spark):
    got = _run(spark, VECS)
    d = 3
    per_dim = {j: sorted(norm for (i, jj), (_r, norm) in got.items()
                         if jj == j) for j in range(d)}
    assert per_dim[0] == per_dim[1] == per_dim[2]


def test_rank_order_preserved_within_dim(spark):
    got = _run(spark, VECS)
    for j in range(3):
        vals = sorted(((round(v[j] * 1e6), i) for i, v in VECS.items()))
        ranks = [got[(i, j)][0] for _v, i in vals]
        assert ranks == sorted(ranks)


def test_no_single_dimension_window(spark):
    df = spark.createDataFrame(
        [(i, [float(i), float(-i)]) for i in range(30)], SCHEMA)
    out = quantile_normalize(df)
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "extended")
    rn_windows = [ln for ln in plan.splitlines()
                  if "Window [" in ln and "row_number()" in ln]
    assert rn_windows
    for ln in rn_windows:
        # partition spec must carry BOTH dim and the value bucket
        assert "dim#" in ln and "__b#" in ln, ln
