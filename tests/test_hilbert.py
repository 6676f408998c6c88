"""with_hilbert_key: equality with the classic xy2d reference, the
Hilbert adjacency property (the one Z-order lacks), bijectivity, wrap
semantics, and the measured locality win over zorder_key on a
non-aligned file split."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from ultraviolet_spark.plans.layout import with_hilbert_key, zorder_key


def _xy2d(order, x, y):
    """Independent reference: the classic public xy2d recipe."""
    n = 1 << order
    d = 0
    s = n // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x, y = n - 1 - x, n - 1 - y
            x, y = y, x
        s //= 2
    return d


def _grid(spark, order):
    n = 1 << order
    return spark.createDataFrame(
        [(x, y) for x in range(n) for y in range(n)], "x long, y long")


def test_matches_reference_full_grid(spark):
    order = 5
    got = {(r.x, r.y): r.hkey
           for r in with_hilbert_key(_grid(spark, order), "x", "y",
                                     bits=order).collect()}
    want = {(x, y): _xy2d(order, x, y) for x, y in got}
    assert got == want


def test_adjacency_and_bijectivity(spark):
    # THE Hilbert property: bijective onto [0, n²) and every pair of
    # consecutive indices is a grid-neighbor pair (|Δx|+|Δy| == 1).
    # Z-order fails this (its diagonal jumps are why its per-file
    # bounds are looser).
    order = 4
    rows = with_hilbert_key(_grid(spark, order), "x", "y",
                            bits=order).collect()
    n = 1 << order
    inv = {r.hkey: (r.x, r.y) for r in rows}
    assert sorted(inv) == list(range(n * n))
    for d in range(1, n * n):
        (x1, y1), (x2, y2) = inv[d - 1], inv[d]
        assert abs(x1 - x2) + abs(y1 - y2) == 1, d


def test_wrap_semantics(spark):
    # values ≥ 2^bits wrap to their low bits (zorder_key contract)
    df = spark.createDataFrame([(3, 5), (3 + 16, 5 + 32)],
                               "x long, y long")
    ks = [r.hkey for r in
          with_hilbert_key(df, "x", "y", bits=4).collect()]
    assert ks[0] == ks[1]


def test_bits_guard():
    with pytest.raises(ValueError):
        with_hilbert_key(None, "x", "y", bits=0)
    with pytest.raises(ValueError):
        with_hilbert_key(None, "x", "y", bits=11)


def test_locality_beats_zorder_on_nonaligned_split(spark):
    # split the sorted full grid into 13 files (NOT a power of 4, so
    # neither curve gets perfectly aligned quadrants); the mean
    # bounding-box area per file must be no worse under Hilbert —
    # that bounding box IS the parquet min/max pruning granule.
    order = 5
    n = 1 << order
    n_files = 13
    per = (n * n) // n_files + 1

    def file_areas(key_rows):
        ordered = sorted(key_rows)          # (key, x, y)
        areas = []
        for i in range(0, len(ordered), per):
            chunk = ordered[i:i + per]
            xs = [c[1] for c in chunk]
            ys = [c[2] for c in chunk]
            areas.append((max(xs) - min(xs) + 1) * (max(ys) - min(ys) + 1))
        return sum(areas) / len(areas)

    g = _grid(spark, order)
    hil = [(r.hkey, r.x, r.y) for r in
           with_hilbert_key(g, "x", "y", bits=order).collect()]
    zor = [(r.zkey, r.x, r.y) for r in
           g.withColumn("zkey", zorder_key(["x", "y"], bits=order))
            .collect()]
    assert file_areas(hil) < file_areas(zor)


def test_hilbert_layout_prunes_both_dims(spark, tmp_path):
    # end-to-end with the zone-map machinery: a Hilbert-ordered table's
    # per-file stats must prune a 2-D box on BOTH dimensions, and the
    # pruned scan must return exactly the full scan's rows
    import pandas as pd

    from ultraviolet_spark.plans.layout import write_hilbert_ordered
    from ultraviolet_spark.plans.skipping import (
        harvest_zonemap, prune_files, skipping_scan)

    n = 64
    df = _grid(spark, 6)            # 64×64 full grid
    p = str(tmp_path / "hil")
    write_hilbert_ordered(df, p, x_col="x", y_col="y", bits=6,
                          num_files=16)
    zm = harvest_zonemap(spark, p, cols=["x", "y"])
    box = [("x", "between", (0, 7)), ("y", "between", (0, 7))]
    survivors, total = prune_files(zm, box)
    assert total == 16
    assert len(survivors) < total          # pruning bites
    got = skipping_scan(spark, p, box, zonemap=zm)
    rows = sorted((r.x, r.y) for r in got.collect())
    assert rows == [(x, y) for x in range(8) for y in range(8)]
    # each dim alone prunes too (the z-order/hilbert selling point)
    for dim in ("x", "y"):
        s, t = prune_files(zm, [(dim, "between", (0, 3))])
        assert len(s) < t, dim
