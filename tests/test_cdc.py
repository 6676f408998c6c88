"""Content-defined chunking: reference-equality of the vectorized
kernel, the shift-resilience property that justifies CDC, and the
min/max bound + dedup-stat contracts."""

from __future__ import annotations

import hashlib
import random

import pytest

pytestmark = pytest.mark.spark


def _ref_boundaries(buf: bytes, min_size: int, avg_size: int,
                    max_size: int) -> list[int]:
    """Byte-at-a-time reference of the documented spec."""
    from ultraviolet_spark.operators.cdc import _GEAR, _W

    n = len(buf)
    if n == 0:
        return []
    if n <= min_size:
        return [n]
    h = [0] * n
    for i in range(n):
        acc = 0
        for j in range(_W):
            if i - j < 0:
                break
            acc = (acc + (int(_GEAR[buf[i - j]]) << j)) % (1 << 64)
        h[i] = acc
    cand = [i for i in range(n) if h[i] & (avg_size - 1) == 0]
    cuts, last = [], 0
    while n - last > max_size:
        inwin = [c + 1 for c in cand
                 if last + min_size <= c + 1 <= last + max_size]
        cut = inwin[0] if inwin else last + max_size
        cuts.append(cut)
        last = cut
    cuts.append(n)
    return cuts


def test_gear_boundaries_match_reference():
    from ultraviolet_spark.operators.cdc import gear_boundaries

    rng = random.Random(7)
    for n in (0, 10, 64, 500, 3000):
        buf = bytes(rng.randrange(256) for _ in range(n))
        got = gear_boundaries(buf, min_size=64, avg_size=256, max_size=1024)
        assert got == _ref_boundaries(buf, 64, 256, 1024), n


def test_boundaries_respect_bounds_and_cover():
    from ultraviolet_spark.operators.cdc import gear_boundaries

    rng = random.Random(11)
    buf = bytes(rng.randrange(256) for _ in range(20_000))
    cuts = gear_boundaries(buf, min_size=128, avg_size=512, max_size=2048)
    assert cuts[-1] == len(buf)
    prev = 0
    for c in cuts[:-1]:
        assert 128 <= c - prev <= 2048
        prev = c


def test_shift_resilience():
    """THE CDC property: prepending bytes re-synchronizes — most chunk
    digests survive, where fixed-size chunking would lose all of them."""
    from ultraviolet_spark.operators.cdc import gear_boundaries

    rng = random.Random(13)
    base = bytes(rng.randrange(256) for _ in range(30_000))
    shifted = b"INSERTED-PREFIX!" + base

    def digests(buf):
        cuts = gear_boundaries(buf, min_size=128, avg_size=512,
                               max_size=2048)
        prev, out = 0, set()
        for c in cuts:
            out.add(hashlib.md5(buf[prev:c]).hexdigest())
            prev = c
        return out

    a, b = digests(base), digests(shifted)
    assert len(a & b) / len(a) > 0.9


def test_cdc_chunks_and_stats(spark):
    from ultraviolet_spark.operators.cdc import cdc_chunks, cdc_dedup_stats

    rng = random.Random(17)
    shared = bytes(rng.randrange(256) for _ in range(8_000))
    uniq = bytes(rng.randrange(256) for _ in range(8_000))
    rows = [(1, shared + uniq), (2, shared), (3, None), (4, b"tiny")]
    df = spark.createDataFrame(rows, "doc_id long, html binary")
    chunks = cdc_chunks(df, min_size=128, avg_size=512, max_size=2048)
    got = chunks.collect()
    assert not any(r["doc_id"] == 3 for r in got)     # nulls skipped
    tiny = [r for r in got if r["doc_id"] == 4]
    assert len(tiny) == 1 and tiny[0]["length"] == 4  # sub-min rows whole
    # byte accounting: offsets tile each doc exactly
    by_doc = {}
    for r in got:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for did, rs in by_doc.items():
        rs.sort(key=lambda r: r["chunk_no"])
        pos = 0
        for r in rs:
            assert r["offset"] == pos
            pos += r["length"]

    st = cdc_dedup_stats(chunks).first()
    assert st["bytes_total"] == 16_000 + 8_000 + 4
    # doc 2 is a byte-identical prefix of doc 1: dedup must bite
    assert st["bytes_distinct"] < st["bytes_total"] - 6_000
    assert 0 < st["dedup_ratio"] < 1
