"""Arrow IPC connector: roundtrip fidelity across every supported type
family, byte determinism under any upstream partitioning, schema-drift
and corruption refusal, unsupported-type plan-time policing."""

from __future__ import annotations

import hashlib
import os

import pytest

from pyspark.sql import functions as F
from pyspark.sql import types as T

from ultraviolet_spark.sources.arrowipc import (
    arrow_ipc_roundtrip,
    arrow_schema_for,
    read_arrow_ipc,
    write_arrow_ipc,
)


def _df(spark):
    return (spark.createDataFrame(
        [(1, "a", 1.5, True, [1, 2, 3], bytearray(b"\x00\x01")),
         (2, None, None, None, None, None),
         (3, "c", -2.0, False, [], b"xyz"),
         (4, "", 0.25, True, [7], b"")],
        "id long, s string, d double, b boolean, "
        "arr array<long>, bin binary")
        .withColumn("ts", F.timestamp_seconds(F.col("id") * 1000)))


def test_roundtrip_all_type_families(spark, tmp_path):
    df = _df(spark)
    back = arrow_ipc_roundtrip(df, str(tmp_path / "t"), key_col="id",
                               n_shards=2)
    assert sorted(map(tuple, df.collect())) == \
        sorted(map(tuple, back.collect()))


def test_bytes_pure_function_of_rows(spark, tmp_path):
    df = _df(spark)
    d1, d2 = str(tmp_path / "a"), str(tmp_path / "b")
    write_arrow_ipc(df.repartition(1), d1, key_col="id", n_shards=3)
    write_arrow_ipc(df.repartition(7), d2, key_col="id", n_shards=3)

    def digests(p):
        return {f: hashlib.md5(open(os.path.join(p, f), "rb").read())
                .hexdigest() for f in sorted(os.listdir(p))}

    assert digests(d1) == digests(d2)


def test_schema_drift_refused(spark, tmp_path):
    df = _df(spark)
    p = str(tmp_path / "t")
    write_arrow_ipc(df, p, key_col="id", n_shards=1)
    drifted = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("s", T.LongType()),     # was string
        T.StructField("d", T.DoubleType()),
        T.StructField("b", T.BooleanType()),
        T.StructField("arr", T.ArrayType(T.LongType())),
        T.StructField("bin", T.BinaryType()),
        T.StructField("ts", T.TimestampType()),
    ])
    with pytest.raises(Exception, match="refusing to miscast"):
        read_arrow_ipc(spark, p, drifted).collect()


def test_corrupt_file_fails_loudly(spark, tmp_path):
    df = _df(spark)
    p = str(tmp_path / "t")
    write_arrow_ipc(df, p, key_col="id", n_shards=1)
    f = os.path.join(p, sorted(os.listdir(p))[0])
    data = open(f, "rb").read()
    open(f, "wb").write(data[: len(data) // 2])   # truncate
    with pytest.raises(Exception):
        read_arrow_ipc(spark, p, df.schema).collect()


def test_unsupported_type_refused_at_plan_time(spark):
    df = spark.createDataFrame([(1, {"k": 1})],
                               "id long, m map<string,long>")
    with pytest.raises(TypeError, match="unsupported Spark type"):
        arrow_schema_for(df.schema)
    nested = spark.createDataFrame([(1, [[1]])],
                                   "id long, a array<array<long>>")
    with pytest.raises(TypeError, match="nested arrays"):
        arrow_schema_for(nested.schema)


def test_manifest_accounts_every_row(spark, tmp_path):
    df = _df(spark)
    stats = write_arrow_ipc(df, str(tmp_path / "t"), key_col="id",
                            n_shards=3)
    assert sum(s["n_records"] for s in stats) == df.count()
    assert all(s["n_bytes"] > 0 for s in stats)
