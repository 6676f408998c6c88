"""Sorted-neighborhood blocking
(operators/fuzzy.sorted_neighborhood_pairs)."""

from __future__ import annotations

import pytest

from ultraviolet_spark.operators.fuzzy import sorted_neighborhood_pairs

pytestmark = pytest.mark.usefixtures("spark")


def _mk(spark, rows):
    return spark.createDataFrame(
        [(int(i), str(s)) for i, s in rows], "id long, s string")


def _ref(rows, w):
    ordered = sorted(rows, key=lambda r: (r[1], r[0]))
    out = set()
    for i, (ida, _) in enumerate(ordered):
        for j in range(i + 1, min(i + w + 1, len(ordered))):
            out.add((ida, ordered[j][0], i + 1, j + 1))
    return out


def test_matches_sequential_reference(spark):
    rows = [(i, f"key{(i * 37) % 50:03d}x{i % 7}") for i in range(80)]
    got = {(r["id_a"], r["id_b"], r["rank_a"], r["rank_b"])
           for r in sorted_neighborhood_pairs(
               _mk(spark, rows), id_col="id", sort_expr="s",
               window=3).collect()}
    assert got == _ref(rows, 3)
    assert len(got) == 3 * 80 - 6       # n·w minus the tail shortfall


def test_near_miss_keys_become_candidates(spark):
    # 'jon smith' vs 'john smith' share no exact blocking key but
    # sort adjacently → paired; an unrelated key between them would
    # still be within the window
    rows = [(1, "johnsmith"), (2, "jonsmith"), (3, "aaaa"),
            (4, "zzzz"), (5, "jonsmyth")]
    got = {(min(a, b), max(a, b)) for a, b, *_ in (
        (r["id_a"], r["id_b"]) for r in sorted_neighborhood_pairs(
            _mk(spark, rows), id_col="id", sort_expr="s",
            window=2).collect())}
    assert (1, 2) in got                # adjacent in sort order
    assert (2, 5) in got
    assert (3, 4) not in got            # far apart in the sort


def test_pair_count_is_linear_in_window(spark):
    rows = [(i, f"{i:05d}") for i in range(50)]
    for w in (1, 2, 4):
        got = sorted_neighborhood_pairs(_mk(spark, rows), id_col="id",
                                        sort_expr="s",
                                        window=w).count()
        assert got == sum(min(w, 50 - 1 - i) for i in range(50))
