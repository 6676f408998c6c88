"""Goodman-Kruskal gamma / Somers' D (operators/stats.gamma_somers_d)."""

from __future__ import annotations

import pytest

from ultraviolet_spark.operators.stats import gamma_somers_d

pytestmark = pytest.mark.usefixtures("spark")


def _mk(spark, pts):
    return spark.createDataFrame([(int(x), int(y)) for x, y in pts],
                                 "x long, y long")


def _ref(pts):
    c = d = tx = ty = 0
    n = len(pts)
    for i in range(n):
        for j in range(i + 1, n):
            (xa, ya), (xb, yb) = pts[i], pts[j]
            if xa == xb and ya == yb:
                continue
            if xa == xb:
                tx += 1
            elif ya == yb:
                ty += 1
            elif (xb - xa) * (yb - ya) > 0:
                c += 1
            else:
                d += 1
    gamma = round((c - d) / (c + d), 6) if c + d else None
    som = round((c - d) / (c + d + ty), 6) if c + d + ty else None
    return c, d, tx, ty, gamma, som


def test_matches_sequential_reference(spark):
    pts = [((i * 3) % 5, (i * 7) % 4) for i in range(30)]
    got = gamma_somers_d(_mk(spark, pts), x_col="x", y_col="y").head()
    c, d, tx, ty, gamma, som = _ref(pts)
    assert (got["c"], got["d"], got["t_x"], got["t_y"]) == (c, d, tx, ty)
    assert got["gamma"] == gamma and got["somers_d_yx"] == som


def test_perfect_order_and_tie_asymmetry(spark):
    mono = [(i, i) for i in range(8)]
    got = gamma_somers_d(_mk(spark, mono), x_col="x", y_col="y").head()
    assert got["gamma"] == 1.0 and got["somers_d_yx"] == 1.0
    # y ties drag Somers' D_yx below gamma (gamma ignores them)
    tied = [(0, 0), (1, 0), (2, 1), (3, 1), (4, 2)]
    got2 = gamma_somers_d(_mk(spark, tied), x_col="x", y_col="y").head()
    assert got2["gamma"] == 1.0
    assert got2["somers_d_yx"] < 1.0


def test_degenerate_null(spark):
    # single x level: no comparable pairs at all
    got = gamma_somers_d(_mk(spark, [(1, 0), (1, 1), (1, 2)]),
                         x_col="x", y_col="y").head()
    assert got["gamma"] is None and got["somers_d_yx"] is None
