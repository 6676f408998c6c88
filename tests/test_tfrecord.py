"""TFRecord / tf.train.Example sink+source conformance (q230's operator).

The wire formats are implemented from the public specs with no
tensorflow/protobuf/crc32c dependency, so these tests pin them hard:
crc32c against the published check vector, protobuf Example against
hand-decoded structure, framing against corruption, and the Spark
write→read edge against exact row equality including the NULL vs ""
distinction and byte determinism across writer parallelism.
"""
from __future__ import annotations

import glob
import os

import numpy as np
import pytest

from pyspark.sql import functions as F
from pyspark.sql import types as T

from ultraviolet_spark.sources.tfrecord import (
    _KIND_BYTES,
    _KIND_FLOAT,
    _KIND_INT64,
    _crc32c_many,
    build_tfrecord,
    crc32c,
    decode_example,
    encode_example,
    parse_tfrecord,
    read_tfrecord,
    write_tfrecord,
)


def test_crc32c_check_vectors():
    # RFC 3720 / published Castagnoli check value
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(b"") == 0
    # 32 zero bytes — the iSCSI test vector
    assert crc32c(b"\x00" * 32) == 0x8A9136AA
    assert crc32c(b"\xff" * 32) == 0x62A8AB43


def test_crc32c_batch_matches_scalar_across_skewed_lengths():
    rng = np.random.default_rng(7)
    payloads = [rng.integers(0, 256, size=n, dtype=np.uint8).tobytes()
                for n in [0, 1, 3, 1000, 17, 64, 2, 4096]]
    batch = _crc32c_many(payloads)
    for p, got in zip(payloads, batch):
        assert int(got) == crc32c(p)


def test_example_roundtrip_kinds_and_edge_values():
    feats = [
        ("b", _KIND_BYTES, [b"", b"\x00\xff", "héllo ✓".encode()]),
        ("i", _KIND_INT64, [0, -1, 2**62, -(2**62), 127, 128]),
        ("f", _KIND_FLOAT, [0.0, -0.25, 3.5]),
    ]
    dec = decode_example(encode_example(feats))
    assert dec["b"] == (_KIND_BYTES, [b"", b"\x00\xff",
                                      "héllo ✓".encode()])
    assert dec["i"] == (_KIND_INT64, [0, -1, 2**62, -(2**62), 127, 128])
    assert dec["f"] == (_KIND_FLOAT, [0.0, -0.25, 3.5])


def test_example_bytes_deterministic_under_input_order():
    a = encode_example([("x", _KIND_INT64, [1]), ("a", _KIND_BYTES, [b"z"])])
    b = encode_example([("a", _KIND_BYTES, [b"z"]), ("x", _KIND_INT64, [1])])
    assert a == b  # sorted-key map serialization


def test_framing_roundtrip_and_corruption_detected():
    exs = [encode_example([("i", _KIND_INT64, [k])]) for k in range(5)]
    stream = build_tfrecord(exs)
    assert parse_tfrecord(stream) == exs
    for flip in (0, 9, 14):  # length field, length crc, payload
        bad = bytearray(stream)
        bad[flip] ^= 0x40
        with pytest.raises((ValueError, Exception)):
            parse_tfrecord(bytes(bad))


_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("note", T.StringType()),
    T.StructField("raw", T.BinaryType()),
    T.StructField("w", T.FloatType()),
    T.StructField("toks", T.ArrayType(T.LongType())),
])


def _frame(spark, n=40, parts=4):
    rows = [(i,
             None if i % 5 == 0 else ("" if i % 5 == 1 else f"n{i % 5}"),
             bytes([i % 256, 0, 255]),
             float(i % 16) / 4.0,
             [i % 7, i % 11])
            for i in range(n)]
    return spark.createDataFrame(rows, _SCHEMA).repartition(parts)


def test_spark_roundtrip_exact_rows(spark, tmp_path):
    src = _frame(spark)
    p = str(tmp_path / "t1")
    manifest = write_tfrecord(src, p, key_col="doc_id", n_shards=3)
    assert sum(m["n_records"] for m in manifest) == 40
    back = read_tfrecord(spark, p, _SCHEMA)
    a = {r["doc_id"]: r for r in src.collect()}
    b = {r["doc_id"]: r for r in back.collect()}
    assert set(a) == set(b)
    for k in a:
        ra, rb = a[k], b[k]
        assert rb["note"] == ra["note"]  # NULL stays NULL, "" stays ""
        assert bytes(rb["raw"]) == bytes(ra["raw"])
        assert rb["w"] == ra["w"]
        assert list(rb["toks"]) == list(ra["toks"])


def test_written_bytes_independent_of_writer_parallelism(spark, tmp_path):
    p1, p2 = str(tmp_path / "a"), str(tmp_path / "b")
    write_tfrecord(_frame(spark, parts=1), p1, key_col="doc_id", n_shards=2)
    write_tfrecord(_frame(spark, parts=7), p2, key_col="doc_id", n_shards=2)
    f1 = sorted(glob.glob(os.path.join(p1, "*.tfrecord")))
    f2 = sorted(glob.glob(os.path.join(p2, "*.tfrecord")))
    assert [os.path.basename(f) for f in f1] == \
        [os.path.basename(f) for f in f2]
    for x, y in zip(f1, f2):
        assert open(x, "rb").read() == open(y, "rb").read()


def test_double_type_refused(spark):
    df = spark.range(3).select(F.col("id").cast("double").alias("x"))
    with pytest.raises(Exception, match="float32|FloatType"):
        write_tfrecord(df, "/tmp/never", key_col="x")
