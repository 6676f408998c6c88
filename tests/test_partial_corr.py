"""Partial correlation (operators/stats.partial_correlation)."""

from __future__ import annotations

import math

import pytest

from ultraviolet_spark.operators.stats import partial_correlation

pytestmark = pytest.mark.usefixtures("spark")


def _mk(spark, rows):
    return spark.createDataFrame(
        [(float(x), float(y), float(z)) for x, y, z in rows],
        "x double, y double, z double")


def _ref(rows):
    ms = [(round(x * 1e6), round(y * 1e6), round(z * 1e6))
          for x, y, z in rows]
    n = float(len(ms))

    def r(ia, ib):
        sa = float(sum(m[ia] for m in ms))
        sb = float(sum(m[ib] for m in ms))
        saa = float(sum(m[ia] * m[ia] for m in ms))
        sbb = float(sum(m[ib] * m[ib] for m in ms))
        sab = float(sum(m[ia] * m[ib] for m in ms))
        va, vb = n * saa - sa * sa, n * sbb - sb * sb
        if va <= 0 or vb <= 0:
            return None
        return (n * sab - sa * sb) / math.sqrt(va * vb)

    rxy, rxz, ryz = r(0, 1), r(0, 2), r(1, 2)
    part = (rxy - rxz * ryz) / math.sqrt(
        (1 - rxz ** 2) * (1 - ryz ** 2))
    return tuple(round(v, 6) for v in (rxy, rxz, ryz, part))


def test_matches_sequential_reference(spark):
    rows = [((i % 7) + 0.5 * (i % 3), (i % 5) + 0.25 * (i % 2), i % 4)
            for i in range(60)]
    got = partial_correlation(_mk(spark, rows), x_col="x", y_col="y",
                              z_col="z").head()
    rxy, rxz, ryz, part = _ref(rows)
    assert (got["r_xy"], got["r_xz"], got["r_yz"], got["r_xy_z"]) == \
        (rxy, rxz, ryz, part)


def test_common_driver_collapses(spark):
    # x and y are both (noisy) functions of z only: raw r_xy is high,
    # the partial collapses toward 0
    rows = [(z + 0.3 * ((i * 7) % 5), 2 * z + 0.3 * ((i * 3) % 5),
             float(z)) for i, z in enumerate([i % 20 for i in range(200)])]
    got = partial_correlation(_mk(spark, rows), x_col="x", y_col="y",
                              z_col="z").head()
    assert got["r_xy"] > 0.9
    assert abs(got["r_xy_z"]) < 0.25


def test_degenerate_legs_null(spark):
    rows = [(1.0, float(i), float(i)) for i in range(10)]
    got = partial_correlation(_mk(spark, rows), x_col="x", y_col="y",
                              z_col="z").head()
    assert got["r_xy"] is None and got["r_xy_z"] is None
    # |r_yz| = 1 → zero denominator → NULL partial
    rows = [(float(i % 3), float(i), float(i)) for i in range(12)]
    got = partial_correlation(_mk(spark, rows), x_col="x", y_col="y",
                              z_col="z").head()
    assert got["r_yz"] == 1.0
    assert got["r_xy_z"] is None
