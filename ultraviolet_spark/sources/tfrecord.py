"""TFRecord / ``tf.train.Example`` sink + source — the training-data
interchange format (public spec: TensorFlow's ``tfrecord`` framing and
the ``tensorflow/core/example/example.proto`` schema).

A 100 TB corpus leaves the analytics engine as sharded TFRecord files
feeding a trainer, so the engine owns BOTH directions, from scratch (no
tensorflow / protobuf / crc32c packages in the sandbox — and none are
needed: the wire formats are small and public):

- framing: each record is ``uint64le length | uint32le masked-crc32c of
  the 8 length bytes | payload | uint32le masked-crc32c of payload``;
  mask(crc) = ((crc >> 15) | (crc << 17)) + 0xa282ead8 (mod 2^32).
- crc32c (Castagnoli, reflected 0x82F63B78): table-driven, computed for
  a whole batch of records at once by stepping byte-position-wise over
  a length-descending-sorted record set — the numpy work per step is
  one gather + one table lookup over all still-active records, so total
  work is O(total bytes) with max(record length) python-level steps
  (records in a shard are same-order-of-magnitude, so the skew risk of
  the shrinking active set is bounded; a native ``crc32c`` wheel would
  slot in at `_crc32c_many` if one is ever present).
- ``tf.train.Example`` protobuf: minimal wire-format encoder/decoder.
  Column↔feature mapping by Spark type: long → ``int64_list`` (packed
  varints), string → ``bytes_list`` (UTF-8), binary → ``bytes_list``,
  float → ``float_list`` (packed LE float32 — the proto stores 4-byte
  floats, so doubles must be narrowed EXPLICITLY by the caller; this
  module refuses DoubleType rather than silently losing precision),
  array<long> / array<float> → multi-valued lists.  Map entries are
  serialized in sorted-key order so output bytes are a pure function of
  the rows (protobuf map order is unspecified; determinism is this
  engine's contract).

Distributed shape mirrors the WET/WAT exporters (`warc.py`): writer =
md5-shard → ``applyInPandas`` one file per shard, rows sorted within
the shard so bytes are reproducible across runs/engines/cluster sizes;
reader = ``binaryFile`` scan (one task per shard file, no shuffle) →
``mapInPandas`` parse with both CRCs of every record verified.  The
q230 oracle recomputes the expected rows straight from parquet and
never sees the TFRecord bytes — a value-hash match proves the
serialize→frame→parse→decode pipeline is lossless.
"""
from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ------------------------------------------------------------------ crc32c

_POLY = np.uint32(0x82F63B78)


def _make_table() -> np.ndarray:
    tab = np.arange(256, dtype=np.uint32)
    for _ in range(8):
        tab = np.where(tab & 1, (tab >> np.uint32(1)) ^ _POLY,
                       tab >> np.uint32(1))
    return tab


_TAB = _make_table()
_MASK_DELTA = np.uint32(0xA282EAD8)


def _crc32c_many(payloads: list[bytes]) -> np.ndarray:
    """crc32c of each payload, vectorized across the batch (see module
    docstring for the active-prefix scheme)."""
    n = len(payloads)
    if n == 0:
        return np.zeros(0, np.uint32)
    lens = np.fromiter((len(p) for p in payloads), np.int64, n)
    order = np.argsort(-lens, kind="stable")
    flat = np.frombuffer(b"".join(payloads), np.uint8)
    offs = np.zeros(n + 1, np.int64)
    np.cumsum(lens, out=offs[1:])
    starts = offs[:-1][order]
    srt = lens[order]
    asc = srt[::-1]
    crc = np.full(n, 0xFFFFFFFF, np.uint32)
    for j in range(int(srt[0]) if n else 0):
        k = n - int(np.searchsorted(asc, j + 1, side="left"))
        if k == 0:
            break
        b = flat[starts[:k] + j]
        c = crc[:k]
        crc[:k] = _TAB[(c ^ b) & np.uint32(0xFF)] ^ (c >> np.uint32(8))
    out = np.empty(n, np.uint32)
    out[order] = crc ^ np.uint32(0xFFFFFFFF)
    return out


def crc32c(data: bytes) -> int:
    """Scalar crc32c (test/reference surface; known vector
    crc32c(b'123456789') == 0xE3069283)."""
    return int(_crc32c_many([data])[0])


def _masked(crcs: np.ndarray) -> np.ndarray:
    with np.errstate(over="ignore"):
        return (((crcs >> np.uint32(15)) | (crcs << np.uint32(17)))
                + _MASK_DELTA)


# ------------------------------------------------- protobuf wire helpers

def _varint(x: int) -> bytes:
    x &= 0xFFFFFFFFFFFFFFFF  # proto int64 rides as two's-complement uint64
    out = bytearray()
    while True:
        b = x & 0x7F
        x >>= 7
        if x:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _ld(field: int, payload: bytes) -> bytes:
    """Length-delimited field (wire type 2)."""
    return _varint((field << 3) | 2) + _varint(len(payload)) + payload


def _read_varint(buf: bytes, i: int) -> tuple[int, int]:
    x = 0
    shift = 0
    while True:
        b = buf[i]
        i += 1
        x |= (b & 0x7F) << shift
        if not b & 0x80:
            return x, i
        shift += 7


# ------------------------------------------------ Example encode / decode

_KIND_BYTES, _KIND_FLOAT, _KIND_INT64 = 1, 2, 3


def _feature(kind: int, values) -> bytes:
    if kind == _KIND_BYTES:
        inner = b"".join(_ld(1, v) for v in values)
        return _ld(1, inner)
    if kind == _KIND_FLOAT:
        packed = np.asarray(values, dtype="<f4").tobytes()
        return _ld(2, _ld(1, packed))
    inner = b"".join(_varint(int(v)) for v in values)
    return _ld(3, _ld(1, inner))


def encode_example(feats: list[tuple[str, int, object]]) -> bytes:
    """``tf.train.Example`` bytes for one row.  ``feats`` is
    ``[(name, kind, values)]``; entries are emitted in sorted-name
    order regardless of input order (determinism contract)."""
    entries = b""
    for name, kind, values in sorted(feats, key=lambda t: t[0]):
        entry = _ld(1, name.encode("utf-8")) + _ld(2, _feature(kind, values))
        entries += _ld(1, entry)
    return _ld(1, entries)


def decode_example(buf: bytes) -> dict[str, tuple[int, list]]:
    """Parse Example bytes → ``{name: (kind, values)}``."""

    def fields(b: bytes) -> Iterator[tuple[int, int, object]]:
        i = 0
        while i < len(b):
            tag, i = _read_varint(b, i)
            fno, wt = tag >> 3, tag & 7
            if wt == 2:
                ln, i = _read_varint(b, i)
                yield fno, wt, b[i:i + ln]
                i += ln
            elif wt == 0:
                v, i = _read_varint(b, i)
                yield fno, wt, v
            elif wt == 5:
                yield fno, wt, b[i:i + 4]
                i += 4
            else:  # pragma: no cover - wire type 1 unused by Example
                yield fno, wt, b[i:i + 8]
                i += 8

    out: dict[str, tuple[int, list]] = {}
    for fno, _, features_msg in fields(buf):
        if fno != 1:
            continue
        for eno, _, entry in fields(features_msg):
            if eno != 1:
                continue
            name, feat = "", b""
            for kno, _, val in fields(entry):
                if kno == 1:
                    name = val.decode("utf-8")
                elif kno == 2:
                    feat = val
            for tno, _, lst in fields(feat):
                if tno == _KIND_BYTES:
                    vals = [v for fn, _, v in fields(lst) if fn == 1]
                    out[name] = (_KIND_BYTES, vals)
                elif tno == _KIND_FLOAT:
                    raw = b"".join(v if isinstance(v, bytes) else b""
                                   for fn, _, v in fields(lst) if fn == 1)
                    out[name] = (_KIND_FLOAT,
                                 np.frombuffer(raw, "<f4").tolist())
                elif tno == _KIND_INT64:
                    vals = []
                    for fn, wt, v in fields(lst):
                        if fn != 1:
                            continue
                        if wt == 2:  # packed
                            i = 0
                            while i < len(v):
                                x, i = _read_varint(v, i)
                                vals.append(x - (1 << 64)
                                            if x >= (1 << 63) else x)
                        else:
                            vals.append(v - (1 << 64)
                                        if v >= (1 << 63) else v)
                    out[name] = (_KIND_INT64, vals)
    return out


# --------------------------------------------------------------- framing

def build_tfrecord(examples: list[bytes]) -> bytes:
    """Frame serialized Examples into one TFRecord stream (batch CRCs)."""
    lens = [struct.pack("<Q", len(e)) for e in examples]
    lcrc = _masked(_crc32c_many(lens))
    dcrc = _masked(_crc32c_many(examples))
    parts = []
    for i, e in enumerate(examples):
        parts.append(lens[i])
        parts.append(struct.pack("<I", int(lcrc[i])))
        parts.append(e)
        parts.append(struct.pack("<I", int(dcrc[i])))
    return b"".join(parts)


def parse_tfrecord(data: bytes) -> list[bytes]:
    """Split a TFRecord stream into Example payloads, verifying BOTH
    crc32c fields of every record (corrupt shards fail loudly, never
    decode garbage into the training set)."""
    out: list[bytes] = []
    lens: list[bytes] = []
    want_l: list[int] = []
    want_d: list[int] = []
    i = 0
    while i < len(data):
        lb = data[i:i + 8]
        (ln,) = struct.unpack("<Q", lb)
        (lc,) = struct.unpack("<I", data[i + 8:i + 12])
        payload = data[i + 12:i + 12 + ln]
        (dc,) = struct.unpack("<I", data[i + 12 + ln:i + 16 + ln])
        out.append(payload)
        lens.append(lb)
        want_l.append(lc)
        want_d.append(dc)
        i += 16 + ln
    if out:
        got_l = _masked(_crc32c_many(lens))
        got_d = _masked(_crc32c_many(out))
        if (not np.array_equal(got_l, np.asarray(want_l, np.uint32))
                or not np.array_equal(got_d, np.asarray(want_d, np.uint32))):
            raise ValueError("tfrecord crc32c mismatch — corrupt stream")
    return out


# ------------------------------------------------------------ Spark edges

def _col_kinds(schema: T.StructType) -> list[tuple[str, int, bool]]:
    """(name, kind, is_list) per column; refuses silently-lossy types."""
    kinds = []
    for f in schema.fields:
        dt = f.dataType
        if isinstance(dt, T.ArrayType):
            inner, is_list = dt.elementType, True
        else:
            inner, is_list = dt, False
        if isinstance(inner, (T.LongType, T.IntegerType)):
            kinds.append((f.name, _KIND_INT64, is_list))
        elif isinstance(inner, T.StringType):
            kinds.append((f.name, _KIND_BYTES, is_list))
        elif isinstance(inner, T.BinaryType):
            kinds.append((f.name, _KIND_BYTES, is_list))
        elif isinstance(inner, T.FloatType):
            kinds.append((f.name, _KIND_FLOAT, is_list))
        elif isinstance(inner, T.DoubleType):
            raise TypeError(
                f"column {f.name!r}: tf.train.Example float_list stores "
                "float32 — cast to FloatType explicitly (refusing a "
                "silent precision loss)")
        else:
            raise TypeError(f"column {f.name!r}: unsupported type {dt}")
    return kinds


def _string_like(df: DataFrame, name: str) -> bool:
    return isinstance(df.schema[name].dataType, T.StringType) or (
        isinstance(df.schema[name].dataType, T.ArrayType)
        and isinstance(df.schema[name].dataType.elementType, T.StringType))


def write_tfrecord(df: DataFrame, path: str, *, key_col: str,
                   n_shards: int = 4) -> list[dict]:
    """Serialize ``df`` to ``n_shards`` TFRecord files under ``path``
    (md5(key)-sharded, rows in key order inside each shard — output
    bytes are a pure function of the rows).  Returns the per-shard
    manifest ``[{shard, n_records, n_bytes}]`` (bounded driver
    traffic)."""
    import os

    os.makedirs(path, exist_ok=True)
    kinds = _col_kinds(df.schema)
    strings = {n for n, k, _ in kinds
               if k == _KIND_BYTES and _string_like(df, n)}
    lists = {n for n, _, is_list in kinds if is_list}
    shard = (F.conv(F.substring(F.md5(F.col(key_col).cast("string")),
                                1, 12), 16, 10)
             .cast("long") % n_shards).cast("int")

    def write_shard(key, pdf: pd.DataFrame) -> pd.DataFrame:
        sid = int(key[0])
        pdf = pdf.sort_values(key_col, kind="mergesort")
        examples = []
        cols = [(n, k) for n, k, _ in kinds]
        arrays = {n: pdf[n].tolist() for n, _ in cols}
        for i in range(len(pdf)):
            feats = []
            for n, k in cols:
                v = arrays[n][i]
                if v is None:
                    vals = []
                elif n in lists:
                    vals = list(v)
                else:
                    vals = [v]
                if n in strings:
                    vals = [s.encode("utf-8") for s in vals]
                elif k == _KIND_BYTES:
                    vals = [bytes(s) for s in vals]
                feats.append((n, k, vals))
            examples.append(encode_example(feats))
        data = build_tfrecord(examples)
        with open(os.path.join(path, f"part-{sid:05d}.tfrecord"),
                  "wb") as f:
            f.write(data)
        return pd.DataFrame({"shard": [sid],
                             "n_records": [len(examples)],
                             "n_bytes": [len(data)]})

    stats = (df.withColumn("__shard", shard)
             .groupBy("__shard")
             .applyInPandas(write_shard,
                            "shard int, n_records long, n_bytes long"))
    return [r.asDict() for r in stats.collect()]


def read_tfrecord(spark: SparkSession, path: str,
                  schema: T.StructType) -> DataFrame:
    """Distributed TFRecord scan: ``binaryFile`` (one task per shard
    file, no shuffle) → ``mapInPandas`` parse+decode under an explicit
    schema (the reader never infers — inference is a second pass and a
    drift trap).  Missing features surface as NULL (scalar) / empty
    list; both CRCs of every record are verified."""
    kinds = _col_kinds(schema)
    files = spark.read.format("binaryFile").load(path)

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            for blob in pdf["content"]:
                rows: dict[str, list] = {n: [] for n, _, _ in kinds}
                for ex in parse_tfrecord(bytes(blob)):
                    dec = decode_example(ex)
                    for n, k, is_list in kinds:
                        kind_vals = dec.get(n)
                        vals = kind_vals[1] if kind_vals else []
                        if k == _KIND_BYTES and isinstance(
                                schema[n].dataType, T.StringType):
                            vals = [v.decode("utf-8") for v in vals]
                        elif (k == _KIND_BYTES and is_list
                              and isinstance(schema[n].dataType.elementType,
                                             T.StringType)):
                            vals = [v.decode("utf-8") for v in vals]
                        if is_list:
                            rows[n].append(vals)
                        else:
                            rows[n].append(vals[0] if vals else None)
                yield pd.DataFrame(rows)

    return files.select("content").mapInPandas(gen, schema)


def tfrecord_roundtrip(df: DataFrame, path: str, *, key_col: str,
                       n_shards: int = 4) -> DataFrame:
    """write → read back under the same schema (q230's subject)."""
    write_tfrecord(df, path, key_col=key_col, n_shards=n_shards)
    return read_tfrecord(df.sparkSession, path, df.schema)
