"""Text-format source/sink conformance: CSV (RFC-4180 quoting) and
JSON-lines round-trips.

The value here is byte-exact FIDELITY through a lossy-looking text
format: embedded delimiters, quotes, newlines, tabs, backslashes and
non-ASCII must survive write→read unchanged; doubles must round-trip
via shortest-decimal representation; timestamps must survive with
microsecond precision under an explicit format + UTC (never the session
default).  The q164/q165 oracles recompute the expected rows straight
from parquet and never see the text files — a value-hash match proves
the codec pair is lossless.

Scale notes: both paths are plain ``df.write``/``spark.read`` — fully
parallel, one file per task, no driver involvement.  Explicit schema on
read (schema inference is a second full scan AND a correctness trap —
inferred types drift with the sample)."""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_TS_FMT = "yyyy-MM-dd HH:mm:ss.SSSSSS"

_CSV_OPTS = {
    "header": "true",
    "quote": '"',
    "escape": '"',          # RFC-4180 doubled quotes, not backslash
    "multiLine": "true",    # embedded newlines inside quoted fields
    # the univocity writer AND parser both default to trimming field
    # whitespace — disable on both sides or "x " silently becomes "x"
    "ignoreLeadingWhiteSpace": "false",
    "ignoreTrailingWhiteSpace": "false",
    "timestampFormat": _TS_FMT,
    # parquet TIMESTAMP with isAdjustedToUTC=false surfaces as
    # TIMESTAMP_NTZ, which is formatted by the *NTZ* option — without it
    # the default ms-precision formatter silently drops microseconds
    "timestampNTZFormat": _TS_FMT,
    "timeZone": "UTC",
}

_JSON_OPTS = {
    "timestampFormat": _TS_FMT,
    "timestampNTZFormat": _TS_FMT,
    "timeZone": "UTC",
}


def csv_roundtrip(df: DataFrame, path: str) -> DataFrame:
    """Write ``df`` as quoted CSV to ``path`` (overwrite), read it back
    with the SAME explicit schema and options, return the re-read
    frame."""
    w = df.write.mode("overwrite")
    for k, v in _CSV_OPTS.items():
        w = w.option(k, v)
    w.csv(path)
    spark = df.sparkSession
    r = spark.read.schema(df.schema)
    for k, v in _CSV_OPTS.items():
        r = r.option(k, v)
    return r.csv(path)


def jsonl_roundtrip(df: DataFrame, path: str) -> DataFrame:
    """Write ``df`` as JSON lines to ``path`` (overwrite), read it back
    with the SAME explicit schema, return the re-read frame."""
    w = df.write.mode("overwrite")
    for k, v in _JSON_OPTS.items():
        w = w.option(k, v)
    w.json(path)
    spark = df.sparkSession
    r = spark.read.schema(df.schema)
    for k, v in _JSON_OPTS.items():
        r = r.option(k, v)
    return r.json(path)


def orc_roundtrip(df: DataFrame, path: str) -> DataFrame:
    """Write ``df`` as ORC (overwrite), read back with the same explicit
    schema — the columnar-format sibling of the CSV/JSONL conformance
    paths (ORC is Spark-native; the q181 oracle recomputes from parquet
    and never touches the ORC files)."""
    df.write.mode("overwrite").orc(path)
    return df.sparkSession.read.schema(df.schema).orc(path)


def parquet_roundtrip(df: DataFrame, path: str, *,
                      codec: str = "zstd") -> DataFrame:
    """Write ``df`` as parquet under an explicit compression codec and
    read it back — proves the codec path (zstd/gzip/snappy) is lossless
    for every logical type in the frame."""
    (df.write.mode("overwrite").option("compression", codec)
     .parquet(path))
    return df.sparkSession.read.schema(df.schema).parquet(path)
