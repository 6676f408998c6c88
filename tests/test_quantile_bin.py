"""quantile_bin + trimmed_stats (operators/stats.py)."""

from __future__ import annotations

import pytest

from ultraviolet_spark.operators.stats import quantile_bin, trimmed_stats

pytestmark = pytest.mark.usefixtures("spark")


def _mk(spark, vals):
    return spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(vals)],
        "id long, v double")


def test_bins_equal_frequency_and_reference(spark):
    vals = [((i * 37) % 101) / 3.0 for i in range(100)]
    out = quantile_bin(_mk(spark, vals), value_col="v", id_col="id",
                       n_bins=10).collect()
    assert len(out) == 100
    # reference: sort by (snapped value, id), bin by rank
    snapped = sorted((round(v * 1e6), i) for i, v in enumerate(vals))
    want = {i: (r, ((r - 1) * 10) // 100)
            for r, (_, i) in enumerate(snapped, start=1)}
    for row in out:
        wr, wb = want[row["id"]]
        assert (row["rank"], row["bin"]) == (wr, wb), row["id"]
    from collections import Counter
    sizes = Counter(r["bin"] for r in out)
    assert set(sizes) == set(range(10))
    assert max(sizes.values()) - min(sizes.values()) <= 1


def test_bin_monotone_in_value(spark):
    vals = [float(i) for i in range(50)]
    out = sorted(quantile_bin(_mk(spark, vals), value_col="v",
                              id_col="id", n_bins=5).collect(),
                 key=lambda r: r["value"])
    bins = [r["bin"] for r in out]
    assert bins == sorted(bins)
    assert bins[0] == 0 and bins[-1] == 4


def test_nulls_excluded(spark):
    df = spark.createDataFrame([(1, 1.0), (2, None), (3, 2.0)],
                               "id long, v double")
    out = quantile_bin(df, value_col="v", id_col="id", n_bins=2)
    assert {r["id"] for r in out.collect()} == {1, 3}


def test_trimmed_winsorized_reference(spark):
    # 18 ordinary values + two wild outliers
    vals = [float(i) for i in range(1, 19)] + [1000.0, -1000.0]
    got = trimmed_stats(_mk(spark, vals), value_col="v", id_col="id",
                        trim_num=5, trim_den=100).head()
    n = 20
    cut = (n * 5) // 100          # 1 from each end
    snapped = sorted(round(v * 1e6) for v in vals)
    kept = snapped[cut:n - cut]
    assert got["n"] == n and got["k_lo"] == 2 and got["k_hi"] == 19
    assert got["mean_trimmed"] == round(
        sum(kept) / len(kept) / 1e6, 6)
    wins = sum(kept) + cut * snapped[cut] + cut * snapped[n - cut - 1]
    assert got["mean_winsor"] == round(wins / n / 1e6, 6)
    # robustness: outliers wreck the raw mean, not the trimmed one
    assert abs(got["mean_trimmed"] - 9.5) < 0.6
    assert got["mean_raw"] == pytest.approx(sum(vals) / n, abs=1e-6)


def test_over_trim_reports_null(spark):
    got = trimmed_stats(_mk(spark, [1.0, 2.0]), value_col="v",
                        id_col="id", trim_num=1, trim_den=2).head()
    assert got["mean_trimmed"] is None and got["mean_winsor"] is None
    assert got["mean_raw"] is not None


def test_partitioning_invariance(spark):
    vals = [((i * 13) % 47) / 7.0 for i in range(200)]
    df = _mk(spark, vals)
    a = sorted(tuple(r) for r in quantile_bin(
        df.coalesce(1), value_col="v", id_col="id").collect())
    b = sorted(tuple(r) for r in quantile_bin(
        df.repartition(7), value_col="v", id_col="id").collect())
    assert a == b
    ta = trimmed_stats(df.coalesce(1), value_col="v", id_col="id").head()
    tb = trimmed_stats(df.repartition(7), value_col="v",
                       id_col="id").head()
    assert tuple(ta) == tuple(tb)
