"""Benjamini–Hochberg FDR control (operators/stats.bh_fdr).

The reference implementation here is the sequential textbook procedure
over exact micro-integers — identical arithmetic to the operator's
(snap, rank, all-integer step-up, per-element-snapped q suffix-min), so
equality is exact, not approximate.
"""

from __future__ import annotations

import pytest

from ultraviolet_spark.operators.stats import bh_fdr

pytestmark = pytest.mark.usefixtures("spark")


def _ref_bh(pairs, a_num=1, a_den=20):
    """Sequential BH over (id, p) pairs; returns dict id -> row."""
    snapped = sorted(
        ((round(p * 1e6), str(i)) for i, p in pairs
         if p is not None and 0 <= round(p * 1e6) <= 1_000_000),
    )
    m = len(snapped)
    rows = {}
    k = 0
    q_raws = []
    for rank, (pm, tid) in enumerate(snapped, start=1):
        if pm * m * a_den <= rank * a_num * 1_000_000:
            k = rank
        q_raws.append(round(m * pm / rank))
    sfx = [0] * m
    run = 10**18
    for j in range(m - 1, -1, -1):
        run = min(run, q_raws[j])
        sfx[j] = min(run, 1_000_000)
    for rank, (pm, tid) in enumerate(snapped, start=1):
        rows[tid] = {
            "p": round(pm / 1e6, 6),
            "rank": rank,
            "m": m,
            "rejected": k > 0 and rank <= k,
            "q_value": round(sfx[rank - 1] / 1e6, 6),
        }
    return rows


def _run(spark, pairs, **kw):
    df = spark.createDataFrame(
        [(str(i), float(p)) for i, p in pairs], "id string, p double")
    out = bh_fdr(df, p_col="p", id_col="id", **kw).collect()
    return {r["test_id"]: r.asDict() for r in out}


def test_sequential_reference_equality(spark):
    # includes an EXACT boundary tie: with m=8, α=1/20, rank 2's
    # threshold is 2·0.05/8 = 0.0125 — p=0.0125 must be a hit (≤)
    pairs = [
        ("a", 0.001), ("b", 0.0125), ("c", 0.04), ("d", 0.2),
        ("e", 0.51), ("f", 0.9), ("g", 1.0), ("h", 0.33),
    ]
    got = _run(spark, pairs)
    want = _ref_bh(pairs)
    assert len(got) == 8
    for tid, row in got.items():
        w = want[tid]
        assert row["p"] == w["p"], tid
        assert row["rank"] == w["rank"], tid
        assert row["m"] == w["m"], tid
        assert bool(row["rejected"]) == w["rejected"], tid
        assert row["q_value"] == pytest.approx(w["q_value"], abs=0), tid
    # the boundary tie itself is rejected
    assert got["b"]["rejected"]


def test_step_up_rejects_below_k_even_without_own_hit(spark):
    # m=4, α=.05: thresholds .0125/.025/.0375/.05.  Rank 2 (p=.026)
    # FAILS its own inequality but rank 3 (p=.03) passes, so k=3 and
    # rank 2 is rejected anyway — the defining step-up property.
    pairs = [("a", 0.01), ("b", 0.026), ("c", 0.03), ("d", 0.9)]
    got = _run(spark, pairs)
    assert got["a"]["rejected"] and got["b"]["rejected"] \
        and got["c"]["rejected"]
    assert not got["d"]["rejected"]
    want = _ref_bh(pairs)
    for tid in got:
        assert bool(got[tid]["rejected"]) == want[tid]["rejected"]


def test_no_hits_means_no_rejections(spark):
    pairs = [(f"t{i}", 0.5 + i / 100) for i in range(10)]
    got = _run(spark, pairs)
    assert not any(r["rejected"] for r in got.values())
    # q-values still defined and ≤ 1
    assert all(r["q_value"] <= 1.0 for r in got.values())


def test_q_value_properties_and_reject_equivalence(spark):
    # generic battery (no knife-edge p): reject ⟺ q ≤ α, and q is
    # non-decreasing in rank
    import hashlib
    pairs = []
    for i in range(200):
        u = int(hashlib.md5(f"t{i}".encode()).hexdigest()[:12], 16)
        p = (u % 1_000_000) / 1e6
        if i % 7 == 0:
            p /= 500.0
        pairs.append((f"t{i}", p))
    got = _run(spark, pairs)
    by_rank = sorted(got.values(), key=lambda r: r["rank"])
    qs = [r["q_value"] for r in by_rank]
    assert qs == sorted(qs)
    for r in by_rank:
        assert bool(r["rejected"]) == (r["q_value"] <= 0.05), r


def test_null_and_out_of_range_excluded(spark):
    df = spark.createDataFrame(
        [("a", 0.01), ("b", None), ("c", -0.2), ("d", 1.5), ("e", 0.02)],
        "id string, p double")
    out = bh_fdr(df, p_col="p", id_col="id").collect()
    ids = {r["test_id"] for r in out}
    assert ids == {"a", "e"}
    assert all(r["m"] == 2 for r in out)


def test_partitioning_invariance(spark):
    pairs = [(f"t{i}", ((i * 37) % 100) / 100.0) for i in range(60)]
    df = spark.createDataFrame(
        [(str(i), float(p)) for i, p in pairs], "id string, p double")
    a = {tuple(sorted(r.asDict().items()))
         for r in bh_fdr(df.coalesce(1), p_col="p", id_col="id").collect()}
    b = {tuple(sorted(r.asDict().items()))
         for r in bh_fdr(df.repartition(7), p_col="p",
                         id_col="id").collect()}
    assert a == b
