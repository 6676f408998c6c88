"""CSV/JSONL round-trip conformance beyond what the q164/q165 oracles
cover: nulls, non-finite doubles, unicode, microsecond timestamps."""
from __future__ import annotations

import datetime
import math
import tempfile

from pyspark.sql import functions as F

from ultraviolet_spark.sources.textio import csv_roundtrip, jsonl_roundtrip


def _mk(spark):
    rows = [
        (1, "plain", 1.5, datetime.datetime(2024, 1, 2, 3, 4, 5, 678901)),
        (2, 'has,"quote"\nand\tnewline', -0.1, None),
        (3, None, float("nan"), datetime.datetime(1999, 12, 31, 23, 59, 59)),
        (4, "ünïcødé — 日本語", float("inf"), datetime.datetime(2024, 6, 1)),
        (5, "trailing space ", float("-inf"),
         datetime.datetime(2024, 1, 1, 0, 0, 0, 1)),
    ]
    return spark.createDataFrame(
        rows, "id long, s string, d double, ts timestamp")


def _cmp(a, b):
    assert len(a) == len(b)
    for ra, rb in zip(a, b):
        assert ra["id"] == rb["id"]
        assert ra["s"] == rb["s"]
        da, db = ra["d"], rb["d"]
        assert (da is None and db is None) or (math.isnan(da) and
                                               math.isnan(db)) or da == db
        assert ra["ts"] == rb["ts"]


def test_jsonl_roundtrip_exact(spark):
    df = _mk(spark)
    back = jsonl_roundtrip(df, tempfile.mkdtemp(prefix="uv_tio_"))
    _cmp(df.orderBy("id").collect(), back.orderBy("id").collect())


def test_csv_roundtrip_exact(spark):
    df = _mk(spark)
    back = csv_roundtrip(df, tempfile.mkdtemp(prefix="uv_tio_"))
    a, b = df.orderBy("id").collect(), back.orderBy("id").collect()
    # CSV's one documented lossy point: a NULL string and an empty
    # string are both written as an empty field; everything else in
    # this frame must survive byte-exactly.
    for ra, rb in zip(a, b):
        assert ra["id"] == rb["id"]
        if ra["s"] is not None:
            assert ra["s"] == rb["s"]
        da, db = ra["d"], rb["d"]
        assert (da is None and db is None) or (math.isnan(da) and
                                               math.isnan(db)) or da == db
        assert ra["ts"] == rb["ts"]


def test_double_shortest_decimal(spark):
    vals = [0.1, 1 / 3, 2.0 ** -1074, 1.7976931348623157e308,
            -2.2250738585072014e-308, 123456789.123456789]
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)],
                               "id long, d double")
    for fn in (jsonl_roundtrip, csv_roundtrip):
        back = fn(df, tempfile.mkdtemp(prefix="uv_tio_"))
        got = [r["d"] for r in back.orderBy("id").collect()]
        assert got == vals, fn.__name__
