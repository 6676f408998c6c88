"""REAL GIF codec: LZW round-trips (incl. 12-bit dictionary overflow
and width-growth boundaries), interlace, the canonical public 1x1 GIF,
rejection of corrupt input, and Spark decode_features end-to-end."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from ultraviolet_spark.operators import multimodal as M

# The ubiquitous public-domain 1x1 transparent-pixel GIF (spacer.gif):
# GIF89a, 2-entry global color table, graphic-control extension, one
# image whose LZW stream is the canonical 0x44 0x01 two-byte block.
# Decoding it proves conformance against bytes this repo did not write.
SPACER = (b"GIF89a\x01\x00\x01\x00\x80\x00\x00\xff\xff\xff\x00\x00\x00"
          b"!\xf9\x04\x01\x00\x00\x00\x00"
          b",\x00\x00\x00\x00\x01\x00\x01\x00\x00\x02\x02D\x01\x00;")


def _pal(p, seed=5):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(p, 3)).astype(np.uint8)


@pytest.mark.parametrize("p", [2, 4, 16, 256])
@pytest.mark.parametrize("interlace", [False, True])
def test_roundtrip_palette_sizes(p, interlace):
    rng = np.random.RandomState(p)
    idx = rng.randint(0, p, size=(9, 7)).astype(np.uint8)
    pal = _pal(p)
    out = M.decode_gif(M.make_gif(idx, pal, interlace=interlace))
    assert (out["width"], out["height"], out["channels"]) == (7, 9, 3)
    assert out["n_frames"] == 1
    np.testing.assert_array_equal(out["pixels"], pal[idx])


def test_dictionary_overflow_resets_and_12bit_codes():
    # 200x200 of 256-color noise forces width growth to 12 bits and at
    # least one mid-stream CLEAR + dictionary reset
    rng = np.random.RandomState(0)
    idx = rng.randint(0, 256, size=(200, 200)).astype(np.uint8)
    pal = _pal(256)
    np.testing.assert_array_equal(
        M.decode_gif(M.make_gif(idx, pal))["pixels"], pal[idx])


def test_long_runs_build_deep_strings():
    idx = (np.tile(np.arange(4, dtype=np.uint8), (300, 77))[:256, :256]) % 4
    pal = _pal(4)
    np.testing.assert_array_equal(
        M.decode_gif(M.make_gif(idx, pal))["pixels"], pal[idx])


def test_single_pixel_and_single_row():
    pal = _pal(2)
    for shape in [(1, 1), (1, 9), (9, 1)]:
        idx = (np.arange(shape[0] * shape[1]) % 2).astype(
            np.uint8).reshape(shape)
        out = M.decode_gif(M.make_gif(idx, pal))
        np.testing.assert_array_equal(out["pixels"], pal[idx])


@settings(max_examples=60, deadline=None)
@given(st.integers(0, 2**32 - 1), st.integers(1, 10), st.integers(1, 10),
       st.sampled_from([2, 4, 8, 16, 32, 64, 128, 256]),
       st.booleans())
def test_roundtrip_property(seed, h, w, p, interlace):
    rng = np.random.RandomState(seed % 2**31)
    idx = rng.randint(0, p, size=(h, w)).astype(np.uint8)
    pal = _pal(p, seed=seed % 1000)
    out = M.decode_gif(M.make_gif(idx, pal, interlace=interlace))
    np.testing.assert_array_equal(out["pixels"], pal[idx])


def test_canonical_public_spacer_gif():
    out = M.decode_gif(SPACER)
    assert (out["width"], out["height"], out["n_frames"]) == (1, 1, 1)
    # pixel index 0 -> first (white) palette entry
    assert out["pixels"].tolist() == [[[255, 255, 255]]]
    assert M.sniff_kind(SPACER) == "gif"


def test_multiframe_counts_and_decodes_first():
    pal = _pal(4)
    a = (np.arange(6, dtype=np.uint8) % 4).reshape(2, 3)
    b = ((np.arange(6, dtype=np.uint8) + 1) % 4).reshape(2, 3)
    one, two = M.make_gif(a, pal), M.make_gif(b, pal)
    # splice: header+GCT of `one`, image blocks of both, one trailer.
    # 13-byte header + 12-byte GCT; image block runs to the trailer.
    multi = one[:-1] + two[13 + 12:]
    out = M.decode_gif(multi)
    assert out["n_frames"] == 2
    np.testing.assert_array_equal(out["pixels"], pal[a])


def test_rejects_corrupt_truncated_and_foreign():
    pal = _pal(4)
    idx = (np.arange(12, dtype=np.uint8) % 4).reshape(3, 4)
    g = M.make_gif(idx, pal)
    with pytest.raises(ValueError):
        M.decode_gif(g[:20])  # truncated mid-descriptor
    with pytest.raises(ValueError):
        M.decode_gif(b"NOTAGIF" + g)
    with pytest.raises(ValueError):
        M.decode_gif(g[:13] + g[13 + 6:])  # GCT ripped out: stream garbage
    assert M.sniff_kind(b"GIF85a") == "unknown"


def test_decode_features_end_to_end(spark):
    from pyspark.sql import functions as F

    ids = spark.range(0, 40).select(F.col("id").alias("doc_id"))
    media = M.synthesize_gif(ids)
    rows = {r["media_id"]: r
            for r in M.decode_features(media).collect()}
    assert len(rows) == 40 and all(r["kind"] == "gif"
                                   for r in rows.values())
    for i in (0, 7, 23):  # python mirror of the synthesis formula
        w, h = 3 + i % 6, 2 + i % 5
        y, x = np.mgrid[0:h, 0:w]
        idx = (i + 5 * x + 11 * y) % 16
        j = np.arange(16)
        pal = np.stack([(i + 17 * j) % 256, (29 * j) % 256,
                        (3 * i + 43 * j) % 256], axis=-1)
        px = pal[idx].astype(np.float64)
        r = rows[i]
        assert (r["width"], r["height"]) == (w, h)
        assert r["mean_r"] == pytest.approx(round(px[..., 0].mean(), 6))
        assert r["mean_b"] == pytest.approx(round(px[..., 2].mean(), 6))
