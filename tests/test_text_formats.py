"""CSV/JSON data formats for the snapshot store
(plans/snapshots.ParquetSnapshotFormat(data_format='csv'|'json'))."""

from __future__ import annotations

import datetime

import pytest

from ultraviolet_spark.plans.snapshots import ParquetSnapshotFormat

pytestmark = pytest.mark.usefixtures("spark")

ROWS = [
    (1, 2.5, "plain", datetime.datetime(2024, 1, 2, 3, 4, 5, 123456)),
    (2, -0.125, "", datetime.datetime(2024, 6, 7, 8, 9, 10, 999999)),
    (3, None, None, None),
    (4, 1e15 + 1.0, "commas, \"quotes\" and\ttabs",
     datetime.datetime(2024, 12, 31, 23, 59, 59, 1)),
]
SCHEMA = "id long, v double, s string, ts timestamp_ntz"


def _roundtrip(spark, tmp_path, fmt):
    store = ParquetSnapshotFormat(str(tmp_path / fmt), data_format=fmt)
    df = spark.createDataFrame(ROWS, SCHEMA)
    snap = store.write(df, "t", stage="s0", inputs_fp="fp0")
    back = store.read(spark, "t")
    assert snap.schema_json is not None
    assert back.schema == df.schema          # stored schema applied
    return {r["id"]: (r["v"], r["s"], r["ts"]) for r in back.collect()}


@pytest.mark.parametrize("fmt", ["csv", "json"])
def test_text_roundtrip_fidelity(spark, tmp_path, fmt):
    got = _roundtrip(spark, tmp_path, fmt)
    want = {i: (v, s, ts) for i, v, s, ts in ROWS}
    # microsecond timestamps, exact doubles, NULL vs empty string —
    # the three classic text-format losses, all pinned here
    assert got[1] == want[1]
    assert got[3] == (None, None, None)
    assert got[4][0] == 1e15 + 1.0
    assert got[4][2] == want[4][2]
    assert got[2][0] == -0.125
    assert got[2][2] == want[2][2]
    # CSV cannot distinguish "" from NULL even with a NULL sentinel on
    # the write side (the reader's empty-field rule wins) — documented;
    # JSON keeps them distinct
    if fmt == "json":
        assert got[2][1] == ""
    else:
        assert got[2][1] in ("", None)


@pytest.mark.parametrize("fmt", ["csv", "json"])
def test_text_lineage_and_resume(spark, tmp_path, fmt):
    store = ParquetSnapshotFormat(str(tmp_path / fmt), data_format=fmt)
    df = spark.createDataFrame(ROWS, SCHEMA)
    s0 = store.write(df, "t", stage="s0", inputs_fp="fp0")
    lin = store.lineage(spark, "t")
    assert lin.agg({"rows": "sum"}).head()[0] == len(ROWS)
    assert store.find("t", "fp0").snapshot_id == s0.snapshot_id
    # second snapshot + time travel back to the first
    store.write(df.limit(2), "t", stage="s1", inputs_fp="fp1")
    assert store.read(spark, "t").count() == 2
    assert store.read(spark, "t", snapshot_id=0).count() == len(ROWS)


def test_csv_rejects_nested(spark, tmp_path):
    store = ParquetSnapshotFormat(str(tmp_path / "c"), data_format="csv")
    df = spark.createDataFrame([(1, [1, 2])], "id long, a array<int>")
    with pytest.raises(Exception):
        store.write(df, "t", stage="s0", inputs_fp="fp0")


def test_unknown_format_rejected(tmp_path):
    with pytest.raises(ValueError):
        ParquetSnapshotFormat(str(tmp_path), data_format="avro")
