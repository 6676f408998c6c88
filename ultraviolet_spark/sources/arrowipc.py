"""Arrow IPC (Feather v2) sink + source — the zero-copy interchange
edge: one ``.arrow`` random-access IPC file per shard, readable by any
Arrow implementation (pandas, polars, DuckDB, Rust/Go arrow) without a
parquet decoder, and memory-mappable for local analysis of exported
training shards.

Same determinism/commit philosophy as the TFRecord and WARC sinks
(`sources/tfrecord.py`, `sources/warc_ds.py`): md5(key)-sharding plus
in-shard key sort make every shard's BYTES a pure function of
(rows, n_shards) under any upstream partitioning — the IPC file format
itself is timestamp-free, so equal tables serialize to equal bytes.
The writer converts through an EXPLICIT Arrow schema derived from the
Spark schema (never pandas inference — int64 columns with NULLs arrive
as float64 in pandas, and letting inference run would silently write
doubles); unsupported Spark types are REFUSED at plan time, not
silently coerced.  The reader verifies the embedded schema against the
expected one and fails loudly on drift or corruption (pyarrow checks
the footer magic + metadata before any data is touched).

Scale notes (100 TB): writing is one md5 shuffle + one file per task
(bytes never gather on the driver); reading is a ``binaryFile`` scan —
one task per shard, no shuffle — with mapInPandas decoding batches
incrementally.  The whole-file Arrow cell means a single shard must fit
a task (same documented bound as TFRecord; the WARC connector is the
streaming-member answer where records are independently compressed).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
import pyarrow as pa

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_SCALARS: list[tuple[type, pa.DataType]] = [
    (T.LongType, pa.int64()),
    (T.IntegerType, pa.int32()),
    (T.DoubleType, pa.float64()),
    (T.FloatType, pa.float32()),
    (T.StringType, pa.string()),
    (T.BinaryType, pa.binary()),
    (T.BooleanType, pa.bool_()),
    (T.TimestampType, pa.timestamp("us")),
]


def _pa_type(dt: T.DataType, col: str) -> pa.DataType:
    for st, pt in _SCALARS:
        if isinstance(dt, st):
            return pt
    if isinstance(dt, T.ArrayType):
        inner = _pa_type(dt.elementType, col)
        if isinstance(dt.elementType, T.ArrayType):
            raise TypeError(
                f"arrow ipc sink: nested arrays not supported ({col})")
        return pa.list_(inner)
    raise TypeError(
        f"arrow ipc sink: unsupported Spark type {dt.simpleString()} "
        f"for column '{col}' — cast or drop it explicitly (a silent "
        f"coercion would change the bytes readers see)")


def arrow_schema_for(schema: T.StructType) -> pa.Schema:
    """Explicit Arrow schema for a Spark schema; raises on any column
    the sink cannot represent faithfully."""
    return pa.schema([(f.name, _pa_type(f.dataType, f.name))
                      for f in schema.fields])


def _to_arrow(pdf: pd.DataFrame, schema: pa.Schema) -> pa.Table:
    """pandas → Arrow under the EXPLICIT schema: NaN/NaT/None → NULL,
    numpy row arrays → list values, never type inference."""
    cols = []
    for field in schema:
        vals = []
        for v in pdf[field.name]:
            if v is None or (isinstance(v, float) and pd.isna(v)) or \
                    (v is pd.NaT):
                vals.append(None)
            elif pa.types.is_list(field.type):
                vals.append(list(v))
            elif pa.types.is_binary(field.type):
                vals.append(bytes(v))
            elif pa.types.is_timestamp(field.type):
                vals.append(pd.Timestamp(v).to_pydatetime())
            else:
                vals.append(v)
        cols.append(pa.array(vals, type=field.type))
    return pa.Table.from_arrays(cols, schema=schema)


def write_arrow_ipc(df: DataFrame, path: str, *, key_col: str,
                    n_shards: int = 4) -> list[dict]:
    """Serialize ``df`` to ``n_shards`` Arrow IPC files under ``path``
    (``part-{shard:05d}.arrow``), md5(key)-sharded with rows in key
    order inside each shard.  Returns the per-shard manifest
    ``[{shard, n_records, n_bytes}]`` (bounded driver traffic)."""
    import os

    os.makedirs(path, exist_ok=True)
    pa_schema = arrow_schema_for(df.schema)      # plan-time type police
    shard = (F.conv(F.substring(F.md5(F.col(key_col).cast("string")),
                                1, 12), 16, 10)
             .cast("long") % n_shards).cast("int")

    def write_shard(key, pdf: pd.DataFrame) -> pd.DataFrame:
        sid = int(key[0])
        pdf = pdf.drop(columns=["__shard"]).sort_values(
            key_col, kind="mergesort")
        table = _to_arrow(pdf, pa_schema)
        sink = pa.BufferOutputStream()
        with pa.ipc.new_file(sink, pa_schema) as w:
            w.write_table(table)
        data = sink.getvalue().to_pybytes()
        with open(os.path.join(path, f"part-{sid:05d}.arrow"), "wb") as f:
            f.write(data)
        return pd.DataFrame({"shard": [sid], "n_records": [len(pdf)],
                             "n_bytes": [len(data)]})

    stats = (df.withColumn("__shard", shard)
             .groupBy("__shard")
             .applyInPandas(write_shard,
                            "shard int, n_records long, n_bytes long"))
    return [r.asDict() for r in stats.collect()]


def read_arrow_ipc(spark: SparkSession, path: str,
                   schema: T.StructType) -> DataFrame:
    """Distributed Arrow IPC scan: ``binaryFile`` (one task per shard,
    no shuffle) → ``mapInPandas`` decode under an explicit expected
    schema.  The embedded file schema is VERIFIED against it — schema
    drift (a re-export that changed a type) fails loudly instead of
    miscasting; truncated/corrupt files fail pyarrow's footer check
    before any data is interpreted."""
    expect = arrow_schema_for(schema)
    files = spark.read.format("binaryFile").load(path)

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            for blob in pdf["content"]:
                reader = pa.ipc.open_file(pa.BufferReader(bytes(blob)))
                got = reader.schema
                if got != expect:
                    raise ValueError(
                        f"arrow ipc: shard schema {got} != expected "
                        f"{expect} — refusing to miscast")
                for i in range(reader.num_record_batches):
                    batch = reader.get_batch(i)
                    yield batch.to_pandas()

    return files.select("content").mapInPandas(gen, schema)


def arrow_ipc_roundtrip(df: DataFrame, path: str, *, key_col: str,
                        n_shards: int = 4) -> DataFrame:
    """write → read back under the same schema."""
    write_arrow_ipc(df, path, key_col=key_col, n_shards=n_shards)
    return read_arrow_ipc(df.sparkSession, path, df.schema)
