"""Checkpoint/resume + lineage (SURVEY.md §5.7, north_rule
resumability): a killed-and-rerun pipeline must skip completed stages
and produce identical outputs; lineage must account for every row."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ultraviolet_spark.plans.snapshots import (
    IcebergFormat,
    ParquetSnapshotFormat,
    fingerprint,
    run_stage,
)


@pytest.fixture()
def fmt(tmp_path):
    return ParquetSnapshotFormat(str(tmp_path / "warehouse"))


def test_stage_resume_skips_recompute(spark, fmt, sf_dir):
    calls = []

    def build():
        calls.append(1)
        return (spark.read.parquet(f"{sf_dir}/events.parquet")
                .groupBy("event_type").agg(F.count("*").alias("n")))

    fp = fingerprint(sf_dir, "events_by_type", {"v": 1})
    df1, resumed1 = run_stage(spark, fmt, "events_by_type", fp, build)
    assert not resumed1 and len(calls) == 1
    df2, resumed2 = run_stage(spark, fmt, "events_by_type", fp, build)
    assert resumed2 and len(calls) == 1  # build skipped on resume
    a = sorted(map(tuple, df1.collect()))
    b = sorted(map(tuple, df2.collect()))
    assert a == b


def test_changed_fingerprint_recomputes(spark, fmt, sf_dir):
    calls = []

    def build():
        calls.append(1)
        return spark.read.parquet(f"{sf_dir}/events.parquet").limit(10)

    run_stage(spark, fmt, "t", fingerprint("a"), build)
    run_stage(spark, fmt, "t", fingerprint("b"), build)
    assert len(calls) == 2
    # both snapshots retained; latest wins on plain read
    assert [s.snapshot_id for s in fmt.snapshots("t")] == [0, 1]


def test_read_pinned_snapshot(spark, fmt, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    fmt.write(ev.limit(5), "pin", stage="s", inputs_fp="v0")
    fmt.write(ev.limit(9), "pin", stage="s", inputs_fp="v1")
    assert fmt.read(spark, "pin", snapshot_id=0).count() == 5
    assert fmt.read(spark, "pin").count() == 9


def test_lineage_accounts_for_every_row(spark, fmt, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").repartition(4)
    snap = fmt.write(ev, "lin", stage="ingest", inputs_fp="x")
    lin = fmt.lineage(spark, "lin").toPandas()
    assert lin["rows"].sum() == snap.n_rows == ev.count()
    assert len(lin) == snap.n_files == 4
    assert snap.bytes > 0
    assert (lin["stage"] == "ingest").all()
    assert (lin["finished_utc"] >= lin["started_utc"]).all()


def test_iceberg_seam_detects_missing_runtime(spark):
    assert IcebergFormat.available(spark) is False
    with pytest.raises(RuntimeError, match="Iceberg runtime"):
        IcebergFormat().write(
            spark.range(1), "t", stage="s", inputs_fp="f")


def test_unified_metrics_and_lineage(spark, pages_path, tmp_path):
    """north_rule 'per-partition lineage + metrics': one queryable
    metrics table + one per-file lineage table across ALL stages of a
    checkpointed pipeline run."""
    from pyspark.sql import functions as F

    from ultraviolet_spark.pipeline import run_checkpointed_pipeline
    from ultraviolet_spark.plans.snapshots import ParquetSnapshotFormat

    pages = spark.read.parquet(pages_path)
    wh = str(tmp_path / "wh")
    out, _ = run_checkpointed_pipeline(spark, pages, wh, inputs_key=pages_path)
    fmt = ParquetSnapshotFormat(wh)

    m = fmt.metrics(spark).toPandas()
    assert set(m["table"]) == {"text_extracted", "features",
                               "features_enriched"}
    assert (m["n_rows"] == pages.count()).all()
    assert (m["bytes"] > 0).all() and (m["n_files"] > 0).all()

    lin = fmt.all_lineage(spark)
    per_table = (lin.groupBy("table")
                 .agg(F.sum("rows").alias("rows"),
                      F.count("*").alias("files")).toPandas()
                 .set_index("table"))
    for t in ("text_extracted", "features", "features_enriched"):
        assert per_table.loc[t, "rows"] == pages.count()
    # every file in metrics is accounted for in lineage
    files = m.set_index("table")["n_files"]
    for t, nf in files.items():
        assert per_table.loc[t, "files"] == nf

    # cross-stage df.observe accumulators: every stage emits 'rows' plus
    # its own in-flight metrics into ONE queryable long-format table
    # (VERDICT r2 open item — observed on the write pass, no extra jobs)
    om = fmt.observed_metrics(spark).toPandas()
    got = {(r["stage"], r["metric"]): r["value"] for _, r in om.iterrows()}
    n = pages.count()
    for stage in ("text_extracted", "features", "features_enriched"):
        assert got[(stage, "rows")] == n
    text_bytes = out.sparkSession.read.parquet(
        f"{wh}/text_extracted/data_v0").agg(
        F.sum(F.length("text"))).first()[0]
    assert got[("text_extracted", "text_bytes")] == float(text_bytes)
    assert got[("features", "total_text_len")] > 0
    assert got[("text_extracted", "min_warc_ts")] <= \
        got[("text_extracted", "max_warc_ts")]


def test_iceberg_seam_degrades_gracefully(spark):
    """No Iceberg runtime jar ships in this sandbox: available() must
    report False and write() must fail with the actionable message
    (cluster instructions), never a raw ClassNotFoundException."""
    import pytest as _pytest

    from ultraviolet_spark.plans.snapshots import IcebergFormat

    fmt = IcebergFormat()
    assert fmt.available(spark) is False
    with _pytest.raises(RuntimeError, match="iceberg-spark-runtime"):
        fmt.write(spark.range(1), "t", stage="s", inputs_fp="fp")


# ---------------------------------------------------- maintenance

def test_compact_preserves_rows_reduces_files(spark, tmp_path):
    from pyspark.sql import functions as F

    from ultraviolet_spark.plans.snapshots import ParquetSnapshotFormat
    fmt = ParquetSnapshotFormat(str(tmp_path / "wh"))
    df = spark.range(1000).select("id", (F.col("id") % 7).alias("m")) \
        .repartition(24)
    s0 = fmt.write(df, "t", stage="ingest", inputs_fp="a")
    assert s0.n_files >= 16
    s1 = fmt.compact(spark, "t", target_files=4)
    assert s1.n_files <= 4 and s1.n_rows == 1000
    a = sorted(map(tuple, fmt.read(spark, "t").collect()))
    b = sorted(map(tuple, fmt.read(spark, "t", snapshot_id=0).collect()))
    assert a == b
    # the compaction is itself a logged snapshot with lineage
    stages = {s.stage for s in fmt.snapshots("t")}
    assert "compact_v0" in stages
    assert fmt.lineage(spark, "t", snapshot_id=s1.snapshot_id).count() \
        == s1.n_files


def test_expire_snapshots_retention(spark, tmp_path):
    import pytest as _pt

    from ultraviolet_spark.plans.snapshots import ParquetSnapshotFormat
    fmt = ParquetSnapshotFormat(str(tmp_path / "wh2"))
    for i in range(3):
        fmt.write(spark.range(10 + i), "t", stage=f"s{i}", inputs_fp=str(i))
    gone = fmt.expire_snapshots("t", keep_last=1)
    assert gone == [0, 1]
    assert [s.snapshot_id for s in fmt.snapshots("t")] == [2]
    assert fmt.read(spark, "t").count() == 12
    with _pt.raises(StopIteration):
        fmt.read(spark, "t", snapshot_id=0)
    with _pt.raises(ValueError):
        fmt.expire_snapshots("t", keep_last=0)
    # next write continues the id sequence
    s = fmt.write(spark.range(5), "t", stage="s3", inputs_fp="3")
    assert s.snapshot_id == 3


def test_read_evolved_merges_generations(spark, tmp_path):
    from ultraviolet_spark.plans.snapshots import read_evolved

    root = str(tmp_path / "evolved")
    spark.createDataFrame(
        [(1, "a"), (2, "b")], "id long, source string"
    ).write.parquet(f"{root}/gen=1")
    spark.createDataFrame(
        [(3, "c", 7)], "id long, source string, quality long"
    ).write.parquet(f"{root}/gen=2")

    df = read_evolved(spark, root, required=["quality", "gen"])
    rows = {r["id"]: r for r in df.collect()}
    assert set(df.columns) == {"id", "source", "quality", "gen"}
    # pre-evolution rows surface exact NULLs, not defaults
    assert rows[1]["quality"] is None and rows[2]["quality"] is None
    assert rows[3]["quality"] == 7
    # partition discovery surfaces the generation
    assert rows[1]["gen"] == 1 and rows[3]["gen"] == 2


def test_read_evolved_required_missing_raises(spark, tmp_path):
    from ultraviolet_spark.plans.snapshots import read_evolved

    root = str(tmp_path / "pre_evolution")
    spark.createDataFrame([(1,)], "id long").write.parquet(f"{root}/gen=1")
    with pytest.raises(ValueError, match="quality"):
        read_evolved(spark, root, required=["quality"])
