"""eb_beta_binomial: sequential MoM reference, the ranking fix
(1/1 no longer outranks 980/1000), shrinkage monotone in n, and the
degenerate identical-rates passthrough."""

from __future__ import annotations

from ultraviolet_spark.operators.stats import eb_beta_binomial

SCHEMA = "key string, n long, x long"


def _py(rows):
    ps = [round(x / n * 1e6) for _k, n, x in rows if n > 0]
    k = len(ps)
    sp, spp = sum(ps), sum(p * p for p in ps)
    mu = sp / k / 1e6
    v = (spp / k - (sp / k) * (sp / k)) / 1e12
    alpha = beta = None
    if v > 0:
        common = mu * (1.0 - mu) / v - 1.0
        if common > 0:
            alpha, beta = mu * common, (1.0 - mu) * common
    out = {}
    for key, n, x in rows:
        raw = round(x / n, 6)
        if alpha is not None:
            eb = round((x + alpha) / (n + alpha + beta), 6)
        else:
            eb = raw
        out[key] = (n, x, raw, eb,
                    round(alpha, 6) if alpha is not None else None,
                    round(beta, 6) if beta is not None else None)
    return out


def _run(spark, rows):
    df = spark.createDataFrame(rows, SCHEMA)
    got = eb_beta_binomial(df, key_col="key", trials_col="n",
                           successes_col="x")
    return {r["key"]: (r["n"], r["x"], r["rate_raw"], r["rate_eb"],
                       r["alpha"], r["beta"]) for r in got.collect()}


ROWS = [("tiny", 1, 1), ("big", 1000, 980), ("mid", 50, 30),
        ("low", 200, 20), ("half", 10, 5), ("z", 400, 300),
        ("q", 25, 5), ("r", 8, 6)]


def test_matches_sequential_reference(spark):
    assert _run(spark, ROWS) == _py(ROWS)


def test_fixes_small_sample_ranking(spark):
    got = _run(spark, ROWS)
    # raw: the 1/1 host outranks the 980/1000 host — absurd
    assert got["tiny"][2] > got["big"][2]
    # shrunk: order corrected
    assert got["tiny"][3] < got["big"][3]
    # and the big host barely moved while tiny moved a lot
    assert abs(got["big"][3] - got["big"][2]) < 0.01
    assert abs(got["tiny"][3] - got["tiny"][2]) > 0.2


def test_identical_rates_pass_through(spark):
    rows = [(f"h{i}", 10 * (i + 1), 5 * (i + 1)) for i in range(6)]
    got = _run(spark, rows)
    for k, (n, x, raw, eb, a, b) in got.items():
        assert eb == raw and a is None and b is None
