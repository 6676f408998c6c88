"""Zone-map data skipping (plans/skipping.py): correctness (pruned
scan ≡ full scan + filter, always), conservatism (missing stats /
uncovered columns keep files), and the actual point — that a Z-ordered
layout lets a predicate on EITHER dimension skip files, where a
single-key sort gives the second dimension nothing."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from ultraviolet_spark.plans.layout import write_range_sorted, write_zordered
from ultraviolet_spark.plans.skipping import (
    harvest_zonemap, prune_files, skipping_scan)


def _mk_table(spark, n=4000):
    # Two independent uniform dims + a payload; deterministic.
    return spark.range(n).select(
        (F.col("id") * 2654435761 % 997).alias("a"),
        (F.col("id") * 40503 % 1009).alias("b"),
        (F.col("id") % 7).cast("double").alias("w"),
        F.concat(F.lit("k"), F.format_string("%05d", F.col("id"))).alias("s"),
    )


@pytest.fixture(scope="module")
def zordered(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("zm") / "zorder")
    write_zordered(_mk_table(spark), p, cols=["a", "b"], bits=10,
                   num_files=16)
    return p


def _full(spark, path, preds_expr):
    return spark.read.parquet(path).where(preds_expr)


def _sorted_pdf(df):
    pdf = df.toPandas()
    return (pdf.sort_values(list(pdf.columns)).reset_index(drop=True))


@pytest.mark.parametrize("preds,expr", [
    ([("a", "between", (100, 180))], "a >= 100 AND a <= 180"),
    ([("b", "between", (0, 90))], "b >= 0 AND b <= 90"),
    ([("a", "ge", 900), ("b", "lt", 120)], "a >= 900 AND b < 120"),
    ([("a", "eq", 500)], "a = 500"),
    ([("s", "le", "k00100")], "s <= 'k00100'"),
    ([("a", "gt", 5000)], "a > 5000"),                   # empty result
])
def test_skipping_scan_equals_full_scan(spark, zordered, preds, expr):
    got = _sorted_pdf(skipping_scan(spark, zordered, preds))
    want = _sorted_pdf(_full(spark, zordered, expr))
    pd.testing.assert_frame_equal(got, want)


def test_pruning_bites_on_both_zorder_dims(spark, zordered):
    zm = harvest_zonemap(spark, zordered, cols=["a", "b"])
    zm.cache().count()
    for col in ("a", "b"):
        survivors, total = prune_files(zm, [(col, "between", (0, 60))])
        assert total == 16
        assert 0 < len(survivors) < total, (
            f"zone map failed to prune on z-dim {col}: "
            f"{len(survivors)}/{total}")
    zm.unpersist()


def test_zorder_beats_single_key_sort_on_second_dim(spark, tmp_path):
    df = _mk_table(spark)
    lin = str(tmp_path / "linear")
    write_range_sorted(df, lin, range_by=["a"], num_partitions=16)
    zm_lin = harvest_zonemap(spark, lin, cols=["b"])
    surv_lin, tot_lin = prune_files(zm_lin, [("b", "between", (0, 60))])
    # b is uniform within every a-sorted file: nothing prunable.
    assert len(surv_lin) == tot_lin

    zo = str(tmp_path / "zo")
    write_zordered(df, zo, cols=["a", "b"], bits=10, num_files=16)
    zm_zo = harvest_zonemap(spark, zo, cols=["b"])
    surv_zo, tot_zo = prune_files(zm_zo, [("b", "between", (0, 60))])
    assert len(surv_zo) < tot_zo


def test_missing_stats_kept_conservatively(spark, tmp_path):
    p = tmp_path / "nostats"
    p.mkdir()
    t = pa.table({"a": pa.array([1, 2, 3], pa.int64())})
    pq.write_table(t, p / "part0.parquet", write_statistics=False)
    pq.write_table(pa.table({"a": pa.array([100, 200], pa.int64())}),
                   p / "part1.parquet")
    zm = harvest_zonemap(spark, str(p), cols=["a"])
    rows = {r["file"].rsplit("/", 1)[-1]: r for r in zm.collect()}
    assert rows["part0.parquet"]["has_stats"] is False
    assert rows["part1.parquet"]["has_stats"] is True
    survivors, total = prune_files(zm, [("a", "ge", 1000)])
    # part1 provably can't match (max 200); part0 must be kept.
    assert total == 2
    assert [s.rsplit("/", 1)[-1] for s in survivors] == ["part0.parquet"]
    got = _sorted_pdf(skipping_scan(spark, str(p), [("a", "ge", 1000)],
                                    zonemap=zm))
    assert got.empty


def test_all_null_file_is_provably_prunable(spark, tmp_path):
    p = tmp_path / "nulls"
    p.mkdir()
    pq.write_table(pa.table({"a": pa.array([None, None], pa.int64()),
                             "x": pa.array([1, 2], pa.int64())}),
                   p / "part0.parquet")
    pq.write_table(pa.table({"a": pa.array([5, None], pa.int64()),
                             "x": pa.array([3, 4], pa.int64())}),
                   p / "part1.parquet")
    zm = harvest_zonemap(spark, str(p), cols=["a"])
    survivors, total = prune_files(zm, [("a", "le", 100)])
    assert total == 2
    assert [s.rsplit("/", 1)[-1] for s in survivors] == ["part1.parquet"]
    # And rows with NULL a never appear in the result (residual filter
    # agrees with SQL comparison semantics).
    got = skipping_scan(spark, str(p), [("a", "le", 100)], zonemap=zm)
    assert [r["x"] for r in got.collect()] == [3]


def test_uncovered_predicate_column_keeps_everything(spark, zordered):
    zm = harvest_zonemap(spark, zordered, cols=["a"])   # no 'b' rows
    survivors, total = prune_files(zm, [("b", "lt", -1)])
    assert len(survivors) == total                       # conservative
    # ...but the scan is still CORRECT (residual filter does the work).
    assert skipping_scan(spark, zordered, [("b", "lt", -1)],
                         zonemap=zm).count() == 0


def test_empty_survivor_set_short_circuits(spark, zordered):
    df = skipping_scan(spark, zordered, [("a", "gt", 10**9)])
    assert df.count() == 0
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "LocalTableScan" in plan or "EmptyRelation" in plan or \
        "LocalRelation" in plan


def test_update_zonemap_equals_fresh_harvest(spark, tmp_path):
    from ultraviolet_spark.plans.skipping import update_zonemap

    p = tmp_path / "live"
    p.mkdir()

    def shard(name, vals):
        pq.write_table(pa.table({"a": pa.array(vals, pa.int64())}),
                       p / name)

    shard("s0.parquet", [1, 2, 3])
    shard("s1.parquet", [10, 20])
    base = harvest_zonemap(spark, str(p), cols=["a"]).toPandas()
    base_df = spark.createDataFrame(base)

    # Append two shards, retire one (retention) — the incremental
    # update must equal a from-scratch harvest of the new listing.
    shard("s2.parquet", [100, None])
    shard("s3.parquet", [7])
    (p / "s1.parquet").unlink()
    upd = _sorted_pdf(update_zonemap(spark, str(p), base_df))
    fresh = _sorted_pdf(harvest_zonemap(spark, str(p), cols=["a"]))
    pd.testing.assert_frame_equal(upd, fresh)
    # ...and only the DELTA was re-read: base rows pass through, so the
    # surviving s0 row is byte-identical to the original harvest.
    assert set(upd["file"].str.rsplit("/", n=1).str[-1]) == {
        "s0.parquet", "s2.parquet", "s3.parquet"}
    # no-op delta returns the map unchanged
    noop = _sorted_pdf(update_zonemap(
        spark, str(p), spark.createDataFrame(upd)))
    pd.testing.assert_frame_equal(noop, upd)


def test_persisted_zonemap_roundtrip_and_hidden_dir(spark, tmp_path):
    from ultraviolet_spark.plans.skipping import (
        load_zonemap, refresh_zonemap)

    p = tmp_path / "tbl"
    p.mkdir()
    pq.write_table(pa.table({"a": pa.array([1, 2], pa.int64())}),
                   p / "s0.parquet")
    assert load_zonemap(spark, str(p)) is None
    refresh_zonemap(spark, str(p), cols=["a"])   # harvests + persists
    # The persisted `_zonemap/` must NOT be listed as table data.
    zm2 = harvest_zonemap(spark, str(p), cols=["a"])
    assert {r["file"].rsplit("/", 1)[-1] for r in zm2.collect()} == {
        "s0.parquet"}
    loaded = load_zonemap(spark, str(p))
    pd.testing.assert_frame_equal(_sorted_pdf(loaded), _sorted_pdf(zm2))


def test_stale_map_never_drops_unseen_files(spark, tmp_path):
    from ultraviolet_spark.plans.skipping import refresh_zonemap

    p = tmp_path / "tbl"
    p.mkdir()
    pq.write_table(pa.table({"a": pa.array([1, 2], pa.int64())}),
                   p / "s0.parquet")
    zm = refresh_zonemap(spark, str(p), cols=["a"])
    # New shard lands AFTER the map was built; its rows match the
    # predicate.  A stale map may not hide them.
    pq.write_table(pa.table({"a": pa.array([1000, 2000], pa.int64())}),
                   p / "s1.parquet")
    got = skipping_scan(spark, str(p), [("a", "ge", 500)], zonemap=zm)
    assert sorted(r["a"] for r in got.collect()) == [1000, 2000]
    # After refresh, pruning works on the new file too (and still
    # returns identical rows).
    zm2 = refresh_zonemap(spark, str(p), cols=["a"])
    survivors, total = prune_files(zm2, [("a", "ge", 500)])
    assert total == 2 and len(survivors) == 1
    got2 = skipping_scan(spark, str(p), [("a", "ge", 500)], zonemap=zm2)
    assert sorted(r["a"] for r in got2.collect()) == [1000, 2000]


def test_no_predicates_returns_all_files(spark, zordered):
    zm = harvest_zonemap(spark, zordered, cols=["a"])
    survivors, total = prune_files(zm, [])
    assert len(survivors) == total == 16
