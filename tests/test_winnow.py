"""Winnowing (MOSS) fingerprints: pure-Python reference equality, the
w+k-1 shared-substring detection guarantee, tie-break semantics,
density bounds, and the pair-matching step."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from ultraviolet_spark.operators.winnow import (
    winnow_fingerprints,
    winnow_pairs,
)

K, W = 7, 8


def _norm(text: str) -> str:
    return "".join(c for c in text if c.isascii() and c.isalnum()).lower()


def _ref_fps(text: str, k: int = K, w: int = W) -> set[tuple[int, int]]:
    """Reference winnowing straight from the paper: rightmost window
    minimum, 1-based positions, md5-prefix hashes."""
    s = _norm(text)
    m = len(s) - k + 1
    if m < w:
        return set()
    hs = [int(hashlib.md5(s[i:i + k].encode()).hexdigest()[:8], 16)
          for i in range(m)]
    out = set()
    for start in range(m - w + 1):
        window = hs[start:start + w]
        mn = min(window)
        pos = max(i for i in range(w) if window[i] == mn) + start
        out.add((pos + 1, mn))
    return out


def _spark_fps(spark, texts: list[str]) -> dict[int, set[tuple[int, int]]]:
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    rows = winnow_fingerprints(df, k=K, w=W).collect()
    got: dict[int, set] = {i: set() for i in range(len(texts))}
    for r in rows:
        got[r["doc_id"]].add((r["fp_pos"], r["fp_hash"]))
    return got


def test_matches_reference_on_mixed_texts(spark):
    texts = [
        "The quick brown fox jumps over the lazy dog, twice. " * 3,
        "short",  # below k+w-1 after norm -> no fingerprints
        "punctuation!!! should NOT shift      the--fingerprints",
        "aaaaaaaaaaaaaaaaaaaaaaaa",  # all-tie windows
        "Zebra 123 zebra 456 ZEBRA 789 zebra zebra zebra padding text",
    ]
    got = _spark_fps(spark, texts)
    for i, t in enumerate(texts):
        assert got[i] == _ref_fps(t), f"doc {i}"


@settings(max_examples=10, deadline=None)
@given(st.text(alphabet="abc XY.,0", min_size=0, max_size=120))
def test_reference_property(spark, s):
    got = _spark_fps(spark, [s])
    assert got[0] == _ref_fps(s)


def test_all_ties_select_rightmost_each_window(spark):
    # identical k-grams everywhere -> every window picks its LAST slot
    n = 30
    s = "a" * n
    m = n - K + 1
    fps = _spark_fps(spark, [s])[0]
    h = int(hashlib.md5(("a" * K).encode()).hexdigest()[:8], 16)
    assert fps == {(p, h) for p in range(W, m + 1)}


def test_detection_guarantee_and_density(spark):
    # any shared run of >= w+k-1 chars yields a shared fingerprint
    rng = np.random.RandomState(0)
    alpha = np.array(list("abcdefghijklmnopqrstuvwxyz0123456789"))
    shared = "".join(rng.choice(alpha, size=W + K - 1))  # exactly the floor
    a = "".join(rng.choice(alpha, size=150)) + shared + "".join(
        rng.choice(alpha, size=150))
    b = "".join(rng.choice(alpha, size=90)) + shared + "".join(
        rng.choice(alpha, size=200))
    got = _spark_fps(spark, [a, b])
    assert got[0] & got[1] or {h for _, h in got[0]} & {h for _, h in got[1]}
    # density: expected ~2/(w+1) of k-grams; allow a generous band
    m = len(_norm(a)) - K + 1
    assert 0.1 * m < len(got[0]) < 0.45 * m


def test_winnow_pairs_finds_the_plagiarism(spark):
    rng = np.random.RandomState(7)
    alpha = np.array(list("abcdefghijklmnopqrstuvwxyz"))
    core = "".join(rng.choice(alpha, size=60))
    texts = [
        "".join(rng.choice(alpha, size=40)) + core,       # 0: shares core
        core + "".join(rng.choice(alpha, size=40)),       # 1: shares core
        "".join(rng.choice(alpha, size=120)),             # 2: unrelated
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    fps = winnow_fingerprints(df, k=K, w=W)
    pairs = {(r["id_a"], r["id_b"]): r["shared_fps"]
             for r in winnow_pairs(fps, min_shared=2).collect()}
    assert (0, 1) in pairs and pairs[(0, 1)] >= 2
    assert all(p == (0, 1) for p in pairs)


def test_rejects_bad_params(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        winnow_fingerprints(df, k=0)
    with pytest.raises(ValueError):
        winnow_fingerprints(df, w=0)
