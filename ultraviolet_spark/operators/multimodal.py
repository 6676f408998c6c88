"""Multimodal (image/audio/video) column plumbing.

Media travel as opaque ``binary`` columns plus a typed metadata struct —
the same pattern as the pages table's ``html`` column.  The Spark-side
plumbing (schemas, mapInPandas batch shape, partitioning) is real and
tested; the actual codec calls are STUBBED because this container ships
no image/audio libraries:

* ``decode_media`` parses the deterministic UVMEDIA header (a fake,
  self-describing container our tests generate) and would dispatch to
  PIL/libav behind ``_codec_decode`` — which raises NotImplementedError
  for real formats, exactly as the task brief requires.

Scale notes: media blobs dominate row size — keep
``spark.sql.execution.arrow.maxRecordsPerBatch`` low (the session
factory defaults to 2000) and ``useLargeVarTypes=true`` so a batch of
blobs may exceed 2 GiB.  The stage is shuffle-free row-parallel.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T

# UVMEDIA fake container: magic(7s) kind(B) width(I) height(I) channels(B)
# rate(I) nframes(I) then payload bytes.  Plain struct.pack/unpack calls
# (a precompiled struct.Struct is not cloudpickle-able inside closures).
_MAGIC = b"UVMEDIA"
_FMT = "<7sBIIBII"
_HEADER_SIZE = struct.calcsize(_FMT)
KINDS = {0: "image", 1: "audio", 2: "video"}

MEDIA_META_SCHEMA = T.StructType([
    T.StructField("kind", T.StringType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("channels", T.IntegerType()),
    T.StructField("sample_rate", T.IntegerType()),
    T.StructField("n_frames", T.IntegerType()),
    T.StructField("payload_bytes", T.LongType()),
])

MEDIA_FEATURES_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    *MEDIA_META_SCHEMA.fields,
    T.StructField("mean_intensity", T.DoubleType()),
    T.StructField("feature_vec", T.ArrayType(T.FloatType())),
])


def pack_media(kind: int, width: int, height: int, channels: int,
               rate: int, nframes: int, payload: bytes) -> bytes:
    """Build a deterministic UVMEDIA blob (test/fixture generator)."""
    return struct.pack(_FMT, _MAGIC, kind, width, height, channels, rate, nframes) + payload


def _codec_decode(kind: str, payload: bytes) -> np.ndarray:
    """Real-codec seam.  PIL/soundfile/PyAV are not in this container,
    so only the UVMEDIA fake payload (raw uint8) is supported."""
    raise NotImplementedError(
        f"real {kind} decoding requires an image/audio library not present "
        "in this environment; UVMEDIA fake payloads are decoded inline"
    )


def _parse_headers(blobs: pd.Series) -> pd.DataFrame:
    rows = []
    for b in blobs:
        if b is None or len(b) < _HEADER_SIZE or not bytes(b).startswith(_MAGIC):
            rows.append(("unknown", 0, 0, 0, 0, 0, 0 if b is None else len(b)))
            continue
        _, kind, w, h, c, rate, nf = struct.unpack_from(_FMT, bytes(b))
        rows.append((KINDS.get(kind, "unknown"), w, h, c, rate, nf,
                     len(b) - _HEADER_SIZE))
    return pd.DataFrame(rows, columns=[f.name for f in MEDIA_META_SCHEMA.fields])


def media_features(df: DataFrame, *, id_col: str = "media_id",
                   blob_col: str = "blob", feat_dim: int = 8) -> DataFrame:
    """blob → metadata + decoded features via mapInPandas.

    For UVMEDIA blobs the payload is raw uint8 → mean intensity + a
    ``feat_dim``-bucket byte-histogram feature vector (all numpy).  Real
    formats would route through ``_codec_decode`` (stubbed)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = _parse_headers(pdf[blob_col])
            means = np.zeros(len(pdf))
            feats = []
            for i, b in enumerate(pdf[blob_col]):
                if meta["kind"].iloc[i] == "unknown" or b is None:
                    feats.append(None)
                    means[i] = np.nan
                    continue
                payload = np.frombuffer(bytes(b), dtype=np.uint8,
                                        offset=_HEADER_SIZE)
                means[i] = payload.mean() if len(payload) else np.nan
                hist = np.bincount(payload >> 5, minlength=feat_dim)[:feat_dim]
                feats.append((hist / max(len(payload), 1)).astype(np.float32))
            out = meta.copy()
            out.insert(0, id_col, pdf[id_col].to_numpy())
            out["mean_intensity"] = means
            out["feature_vec"] = feats
            yield out

    src = df.select(id_col, blob_col)
    schema = T.StructType([
        T.StructField(id_col, T.LongType()), *MEDIA_FEATURES_SCHEMA.fields[1:],
    ])
    return src.mapInPandas(gen, schema=schema)


def frame_sample(df: DataFrame, *, every_n: int = 10, id_col: str = "media_id",
                 blob_col: str = "blob") -> DataFrame:
    """Video frame sampling: explode every ``every_n``-th frame of a
    UVMEDIA video payload into (media_id, frame_no, frame binary)."""
    schema = T.StructType([
        T.StructField(id_col, T.LongType()),
        T.StructField("frame_no", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ])

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, nos, frames = [], [], []
            meta = _parse_headers(pdf[blob_col])
            for i, b in enumerate(pdf[blob_col]):
                if meta["kind"].iloc[i] != "video":
                    continue
                w, h, c = (int(meta[k].iloc[i]) for k in ("width", "height", "channels"))
                fsz = w * h * c
                nf = int(meta["n_frames"].iloc[i])
                raw = bytes(b)[_HEADER_SIZE:]
                for f in range(0, nf, every_n):
                    ids.append(pdf[id_col].iloc[i])
                    nos.append(f)
                    frames.append(raw[f * fsz:(f + 1) * fsz])
            yield pd.DataFrame({id_col: pd.Series(ids, dtype="int64"),
                                "frame_no": pd.Series(nos, dtype="int32"),
                                "frame": frames})

    return df.select(id_col, blob_col).mapInPandas(gen, schema=schema)
