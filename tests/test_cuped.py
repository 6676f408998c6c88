"""cuped_adjust: sequential moment-algebra equality, the unbiasedness
of the treatment CONTRAST, and actual variance reduction on a
correlated synthetic."""

from __future__ import annotations

from ultraviolet_spark.operators.stats import cuped_adjust

SCHEMA = "variant string, x long, y long"


def _py(rows):
    n = len(rows)
    sx = sum(x for _v, x, _y in rows)
    sy = sum(y for _v, _x, y in rows)
    sxx = sum(x * x for _v, x, _y in rows)
    sxy = sum(x * y for _v, x, y in rows)
    syy = sum(y * y for _v, _x, y in rows)
    cov_n = float(n) * float(sxy) - float(sx) * float(sy)
    var_n = float(n) * float(sxx) - float(sx) * float(sx)
    vary_n = float(n) * float(syy) - float(sy) * float(sy)
    theta = cov_n / var_n
    rho2 = cov_n * cov_n / (var_n * vary_n)
    out = {}
    for v in {r[0] for r in rows}:
        vs = [(x, y) for vv, x, y in rows if vv == v]
        nv = len(vs)
        my = sum(y for _x, y in vs) / nv
        mx = sum(x for x, _y in vs) / nv
        adj = my - theta * (mx - sx / n)
        out[v] = (nv, round(my / 1e6, 6), round(adj / 1e6, 6),
                  round(theta, 6), round(rho2, 6))
    return out


def _mk(seed_rows):
    return [(v, int(x * 1e6), int(y * 1e6)) for v, x, y in seed_rows]


def test_matches_sequential_reference(spark):
    rows = _mk([("A", (i * 7) % 13, (i * 7) % 13 * 2 + (i % 5))
                for i in range(40)]
               + [("B", (i * 11) % 13, (i * 11) % 13 * 2 + (i % 3) + 1)
                  for i in range(40)])
    df = spark.createDataFrame(rows, SCHEMA)
    got = {r["variant"]: (r["n"], r["mean_y"], r["mean_y_cuped"],
                          r["theta"], r["rho2"])
           for r in cuped_adjust(df, x_col="x", y_col="y",
                                 variant_col="variant").collect()}
    assert got == _py(rows)


def test_contrast_unbiased_under_balanced_covariate(spark):
    # identical x distribution in both arms → adjustment moves both
    # means by the same amount → the A−B contrast is unchanged
    xs = [(i * 3) % 17 for i in range(60)]
    rows = _mk([("A", x, x + 2.0) for x in xs]
               + [("B", x, x + 5.0) for x in xs])
    df = spark.createDataFrame(rows, SCHEMA)
    got = {r["variant"]: r for r in
           cuped_adjust(df, x_col="x", y_col="y",
                        variant_col="variant").collect()}
    raw = got["B"]["mean_y"] - got["A"]["mean_y"]
    adj = got["B"]["mean_y_cuped"] - got["A"]["mean_y_cuped"]
    assert abs(raw - adj) < 1e-6
    assert abs(raw - 3.0) < 1e-6


def test_reduces_variance_when_correlated(spark):
    # y strongly driven by x: ρ² near 1, and the within-arm spread of
    # the adjusted values collapses
    rows = _mk([("A", float(i), float(i) * 3 + 1) for i in range(50)])
    df = spark.createDataFrame(rows, SCHEMA)
    got = cuped_adjust(df, x_col="x", y_col="y",
                       variant_col="variant").head()
    assert got["rho2"] > 0.999
    assert abs(got["theta"] - 3.0) < 1e-3
