"""ORC data format through the snapshot store (plans/snapshots.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ultraviolet_spark.plans.snapshots import ParquetSnapshotFormat

pytestmark = pytest.mark.usefixtures("spark")


def test_orc_roundtrip_and_lineage(spark, tmp_path):
    store = ParquetSnapshotFormat(str(tmp_path), data_format="orc")
    df = spark.createDataFrame(
        [(i, f"s{i % 3}", float(i) / 7.0) for i in range(100)],
        "id long, cat string, v double").repartition(4)
    snap = store.write(df, "t", stage="s1", inputs_fp="fp1")
    assert snap.n_rows == 100 and snap.n_files >= 1
    back = store.read(spark, "t")
    assert back.schema == df.schema
    assert sorted(tuple(r) for r in back.collect()) \
        == sorted(tuple(r) for r in df.collect())
    # per-file lineage rows account for every row
    lin = store.lineage(spark, "t")
    assert lin.agg(F.sum("rows")).head()[0] == 100
    assert all(r["file_path"].endswith(".orc") or ".orc" in r["file_path"]
               for r in lin.collect())


def test_orc_resume_semantics_match_parquet(spark, tmp_path):
    store = ParquetSnapshotFormat(str(tmp_path / "orc"),
                                  data_format="orc")
    df = spark.range(10).withColumn("x", F.col("id") * 2)
    s1 = store.write(df, "t", stage="a", inputs_fp="same")
    assert store.find("t", "same").snapshot_id == s1.snapshot_id
    s2 = store.write(df, "t", stage="a", inputs_fp="other")
    assert s2.snapshot_id == s1.snapshot_id + 1
    # time travel to the first snapshot still reads ORC
    assert store.read(spark, "t",
                      snapshot_id=s1.snapshot_id).count() == 10


def test_unknown_format_rejected(tmp_path):
    with pytest.raises(ValueError, match="unsupported data_format"):
        ParquetSnapshotFormat(str(tmp_path), data_format="avro")
