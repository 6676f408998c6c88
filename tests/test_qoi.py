"""QOI codec: random roundtrips (RGB + RGBA), chunk-type coverage,
known byte vectors incl. the wrap-around DIFF subtlety, run splitting
at 62, corruption refusal, sniff integration."""

from __future__ import annotations

import numpy as np
import pytest

from ultraviolet_spark.operators.multimodal import (
    decode_qoi,
    make_qoi,
    sniff_kind,
)


def test_random_roundtrips():
    rng = np.random.RandomState(42)
    for ch in (3, 4):
        for shape in [(1, 1), (5, 7), (16, 16), (1, 64)]:
            px = rng.randint(0, 256, size=(*shape, ch), dtype=np.uint8)
            got = decode_qoi(make_qoi(px))
            assert got["channels"] == ch
            assert (got["pixels"] == px).all()


def test_chunk_type_coverage():
    # gradient: DIFF/LUMA; repeats: RUN + INDEX; jumps: RGB
    g = np.arange(64, dtype=np.uint8).reshape(8, 8)
    px = np.stack([g, (g + 1) % 256, (g + 2) % 256], axis=2)
    assert (decode_qoi(make_qoi(px))["pixels"] == px).all()
    flat = np.zeros((4, 100, 3), np.uint8)
    flat[:, 50:] = 200          # one long run, one RGB jump, one run
    assert (decode_qoi(make_qoi(flat))["pixels"] == flat).all()


def test_known_vectors_and_wraparound_diff():
    # (10,200,30) from (0,0,0): no diff/luma fits → OP_RGB (0xFE)
    enc = make_qoi(np.array([[[10, 200, 30]]], np.uint8))
    assert enc[:4] == b"qoif" and len(enc) == 14 + 4 + 8
    assert enc[14] == 0xFE
    # "red" (255,0,0) from (0,0,0): dr wraps to −1 → a ONE-BYTE DIFF,
    # exactly what the reference encoder's signed-char wrap emits
    enc2 = make_qoi(np.array([[[255, 0, 0]]], np.uint8))
    assert len(enc2) == 14 + 1 + 8 and enc2[14] == 0x5A
    assert (decode_qoi(enc2)["pixels"] == [[[255, 0, 0]]]).all()


def test_long_runs_split_at_62():
    px = np.full((10, 10, 3), 37, np.uint8)   # 100 identical pixels
    enc = make_qoi(px)
    # header + first-pixel chunk + run(62)+run(37) + end = tiny
    assert len(enc) < 30
    assert (decode_qoi(enc)["pixels"] == px).all()


def test_corruption_refused():
    enc = make_qoi(np.array([[[10, 200, 30]]], np.uint8))
    with pytest.raises(ValueError):
        decode_qoi(enc[:-3])                  # truncated end marker
    with pytest.raises(ValueError):
        decode_qoi(b"nope" + enc[4:])         # bad magic
    with pytest.raises(ValueError):
        decode_qoi(enc[:14])                  # no pixel data at all


def test_sniff_integration():
    enc = make_qoi(np.zeros((2, 2, 3), np.uint8))
    assert sniff_kind(enc) == "qoi"
