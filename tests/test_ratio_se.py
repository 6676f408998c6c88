"""ratio_jackknife: sequential md5-replay reference equality and the
jackknife ≈ delta-method agreement on well-behaved data."""

from __future__ import annotations

import hashlib
import math

from ultraviolet_spark.operators.stats import ratio_jackknife

SCHEMA = "key long, num double, den long"
B = 64


def _bucket(i):
    return int(hashlib.md5(str(i).encode()).hexdigest()[:2], 16) % B


def _py(rows):
    from collections import defaultdict
    per = defaultdict(lambda: [0, 0, 0, 0, 0, 0])
    for k, nu, de in rows:
        u, v = round(nu * 1e6), round(float(de) * 1e6)
        s = per[_bucket(k)]
        s[0] += 1
        s[1] += u
        s[2] += v
        s[3] += u * u
        s[4] += v * v
        s[5] += u * v
    n = sum(s[0] for s in per.values())
    bk = len(per)
    tu = sum(s[1] for s in per.values())
    tv = sum(s[2] for s in per.values())
    suu = sum(s[3] for s in per.values())
    svv = sum(s[4] for s in per.values())
    suv = sum(s[5] for s in per.values())
    rl = [round((tu - s[1]) / (tv - s[2]) * 1e6) for s in per.values()]
    sr, srr = sum(rl), sum(r * r for r in rl)
    rbar = sr / bk
    var_j = (1.0 - 1.0 / bk) * (srr / bk - rbar * rbar) * bk / 1e12
    ratio = tu / tv
    mu_u, mu_v = tu / n, tv / n
    s_uu = suu / n - mu_u * mu_u
    s_vv = svv / n - mu_v * mu_v
    s_uv = suv / n - mu_u * mu_v
    var_d = (s_uu - 2.0 * ratio * s_uv
             + ratio * ratio * s_vv) / (mu_v * mu_v) / n
    return dict(n=n, b_buckets=bk, ratio=round(ratio, 6),
                se_jack=round(math.sqrt(var_j), 6),
                se_delta=round(math.sqrt(var_d), 6))


def _rows():
    rows = []
    for i in range(800):
        de = 1 + (i * 7) % 9
        nu = de * 2.5 + ((i * 13) % 11) - 5.0
        rows.append((i, float(nu), de))
    return rows


def test_matches_sequential_reference(spark):
    rows = _rows()
    df = spark.createDataFrame(rows, SCHEMA)
    got = ratio_jackknife(df, num_col="num", den_col="den",
                          id_col="key", n_buckets=B).head().asDict()
    assert got == _py(rows)


def test_jackknife_agrees_with_delta(spark):
    rows = _rows()
    df = spark.createDataFrame(rows, SCHEMA)
    got = ratio_jackknife(df, num_col="num", den_col="den",
                          id_col="key", n_buckets=B).head()
    assert got["se_jack"] > 0 and got["se_delta"] > 0
    assert 0.5 < got["se_jack"] / got["se_delta"] < 2.0
