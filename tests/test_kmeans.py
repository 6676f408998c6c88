"""Distributed fixed-rounds Lloyd's k-means (operators/mlfit.kmeans_fixed).

The sequential reference replays the exact integer arithmetic (micro
snap, md5 seed order, integer distances, half-up means, (d, cid)
argmin, empty-cluster carryover) so equality is exact, not clustering-
quality-approximate.
"""

from __future__ import annotations

import hashlib

import pytest

from ultraviolet_spark.operators.mlfit import kmeans_fixed

pytestmark = pytest.mark.usefixtures("spark")


def _half_up(x: float) -> int:
    import math
    return int(math.floor(x + 0.5)) if x >= 0 else -int(math.floor(-x + 0.5))


def _ref_kmeans(rows, k, rounds):
    """rows: list of (id, [floats]).  Returns {id: (cluster, dist2)}."""
    pts = {i: [_half_up(v * 1e6) for v in vec] for i, vec in rows if vec}
    order = sorted(pts, key=lambda i: (hashlib.md5(str(i).encode())
                                       .hexdigest(), i))
    cents = {cid: list(pts[i]) for cid, i in enumerate(order[:k])}

    def argmin(x):
        best = None
        for cid in sorted(cents):
            d = sum((a - b) ** 2 for a, b in zip(x, cents[cid]))
            if best is None or (d, cid) < best:
                best = (d, cid)
        return best[1], best[0]

    for _ in range(rounds):
        groups = {}
        for i, x in pts.items():
            cid, _ = argmin(x)
            groups.setdefault(cid, []).append(x)
        for cid, members in groups.items():
            n = len(members)
            cents[cid] = [
                _half_up(sum(m[d] for m in members) / n)
                for d in range(len(members[0]))]
    out = {}
    for i, x in pts.items():
        cid, d = argmin(x)
        out[i] = (cid, round(d / 1e12, 6))
    return out


def _run(spark, rows, k, rounds):
    df = spark.createDataFrame(
        [(int(i), [float(v) for v in vec]) for i, vec in rows],
        "vec_id long, embedding array<float>")
    got = kmeans_fixed(df, k=k, rounds=rounds).collect()
    return {r["vec_id"]: (r["cluster"], r["dist2"]) for r in got}


def test_sequential_reference_equality(spark):
    # deterministic pseudo-random 3-D points (float32-safe values)
    rows = []
    for i in range(40):
        h = int(hashlib.md5(f"pt{i}".encode()).hexdigest()[:12], 16)
        rows.append((i, [((h >> (j * 8)) % 256) / 16.0 for j in range(3)]))
    got = _run(spark, rows, k=3, rounds=2)
    # reference must see the float32-rounded values the engine reads
    import numpy as np
    rows32 = [(i, list(np.array(v, dtype=np.float32).astype(float)))
              for i, v in rows]
    want = _ref_kmeans(rows32, k=3, rounds=2)
    assert got == want


def test_separated_blobs_recovered(spark):
    rows = [(i, [0.0 + i * 0.001, 0.0]) for i in range(10)]
    rows += [(100 + i, [50.0 + i * 0.001, 50.0]) for i in range(10)]
    got = _run(spark, rows, k=2, rounds=2)
    a = {got[i][0] for i in range(10)}
    b = {got[100 + i][0] for i in range(10)}
    assert len(a) == 1 and len(b) == 1 and a != b
    assert all(d < 1.0 for _, d in got.values())


def test_empty_cluster_keeps_previous_centroid(spark):
    # two distinct locations, k=3: at least one cluster ends memberless
    rows = [(i, [0.0, 0.0]) for i in range(5)]
    rows += [(10 + i, [9.0, 9.0]) for i in range(5)]
    got = _run(spark, rows, k=3, rounds=2)
    assert len(got) == 10
    rows32 = rows
    want = _ref_kmeans(rows32, k=3, rounds=2)
    assert got == want
    # every point sits exactly on its centroid after convergence
    assert all(d == 0.0 for _, d in got.values())


def test_tie_breaks_to_lowest_cid(spark):
    # a point exactly midway between the two seed centroids
    rows = [(1, [0.0, 0.0]), (2, [4.0, 0.0]), (3, [2.0, 0.0])]
    got = _run(spark, rows, k=2, rounds=0)   # rounds=0: seeds only
    want = _ref_kmeans(rows, k=2, rounds=0)
    assert got == want


def test_partitioning_invariance(spark):
    rows = []
    for i in range(30):
        h = int(hashlib.md5(f"pi{i}".encode()).hexdigest()[:12], 16)
        rows.append((i, [((h >> (j * 8)) % 128) / 4.0 for j in range(4)]))
    df = spark.createDataFrame(
        [(int(i), [float(v) for v in vec]) for i, vec in rows],
        "vec_id long, embedding array<float>")
    a = sorted(tuple(r) for r in kmeans_fixed(
        df.coalesce(1), k=3, rounds=2).collect())
    b = sorted(tuple(r) for r in kmeans_fixed(
        df.repartition(7), k=3, rounds=2).collect())
    assert a == b


def test_null_and_empty_vectors_excluded(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, None), (3, []), (4, [3.0, 4.0])],
        "vec_id long, embedding array<float>")
    got = kmeans_fixed(df, k=2, rounds=1).collect()
    assert {r["vec_id"] for r in got} == {1, 4}
