"""REAL PNG codec: round-trips for every filter type and channel
count, CRC/format rejection, Spark decode_features end-to-end."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from ultraviolet_spark.operators import multimodal as M


def _img(h, w, c, seed=3):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(h, w, c), dtype=np.int64).astype(np.uint8)


@pytest.mark.parametrize("filt", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("c", [1, 2, 3, 4])
def test_roundtrip_all_filters_all_channels(filt, c):
    px = _img(5, 7, c, seed=filt * 10 + c)
    out = M.decode_png(M.make_png(px, filter_type=filt))
    assert out["width"] == 7 and out["height"] == 5
    assert out["channels"] == c
    np.testing.assert_array_equal(out["pixels"], px)


def test_roundtrip_extremes_and_2d_input():
    # all-0 / all-255 stress the mod-256 wraparound in every filter
    for val in (0, 255):
        px = np.full((4, 4, 3), val, np.uint8)
        for filt in range(5):
            got = M.decode_png(M.make_png(px, filter_type=filt))["pixels"]
            np.testing.assert_array_equal(got, px)
    gray2d = _img(3, 3, 1)[:, :, 0]
    out = M.decode_png(M.make_png(gray2d))
    np.testing.assert_array_equal(out["pixels"][:, :, 0], gray2d)


def test_multi_idat_and_1x1():
    px = _img(1, 1, 3)
    data = M.make_png(px)
    # split the IDAT into two chunks: decoders must concatenate
    sig, rest = data[:8], data[8:]
    ln, = struct.unpack_from(">I", rest, 0)
    ihdr = rest[:12 + ln]
    rest = rest[12 + ln:]
    ln2, = struct.unpack_from(">I", rest, 0)
    idat_body = rest[8:8 + ln2]
    iend = rest[12 + ln2:]
    a, b = idat_body[:3], idat_body[3:]
    split = (sig + ihdr + M._png_chunk(b"IDAT", a)
             + M._png_chunk(b"IDAT", b) + iend)
    np.testing.assert_array_equal(M.decode_png(split)["pixels"], px)


def test_rejects_bad_crc_truncation_and_foreign_formats():
    px = _img(3, 3, 3)
    data = bytearray(M.make_png(px))
    data[40] ^= 0xFF  # corrupt inside IDAT without fixing its CRC
    with pytest.raises(ValueError):
        M.decode_png(bytes(data))
    with pytest.raises(ValueError):
        M.decode_png(b"\x89PNG\r\n\x1a\n only a signature")
    with pytest.raises(ValueError):
        M.decode_png(b"GIF89a...")
    # 16-bit depth is declared unsupported, not mis-decoded
    ihdr16 = struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0)
    fake = (M._PNG_SIG + M._png_chunk(b"IHDR", ihdr16)
            + M._png_chunk(b"IDAT", zlib.compress(b"\0" * 26))
            + M._png_chunk(b"IEND", b""))
    with pytest.raises(NotImplementedError):
        M.decode_png(fake)


def test_sniff_and_decode_features_spark(spark):
    df = spark.range(0, 24).withColumnRenamed("id", "doc_id")
    media = M.synthesize_png(df)
    out = {r["media_id"]: r for r in M.decode_features(media).collect()}
    assert len(out) == 24
    for i in range(24):
        r = out[i]
        assert r["kind"] == "png"
        w, h = 3 + i % 5, 2 + i % 4
        assert (r["width"], r["height"], r["channels"]) == (w, h, 3)
        want_r = np.mean([(i + 11 * x + 3 * y) % 256
                          for x in range(w) for y in range(h)])
        assert r["mean_r"] == pytest.approx(want_r, abs=1e-6)
