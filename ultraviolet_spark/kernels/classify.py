"""Codepoint-class histograms (SURVEY.md §2.1 `codepoint_classify`).

Bucket list: Unicode general-category major classes (L M N P S Z C)
plus coverage buckets (ASCII, Latin-1 supplement, other BMP, astral) —
K = 11 fixed buckets.  The reference's exact bucket list is
[REF-UNAVAILABLE] (SURVEY.md §0.1 item 4); swapping the list only
touches `CLASS_NAMES` / `_build_table`.

The per-codepoint class lookup is a single precomputed 0x110000-entry
uint8 table (built once per process from `unicodedata`, ~1 s, cached),
so classifying a batch is one fancy-index + one bincount.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

CLASS_NAMES = [
    "letter", "mark", "number", "punct", "symbol", "sep", "other",
    "ascii", "latin1", "bmp", "astral",
]
K = len(CLASS_NAMES)
_CAT_IDX = {"L": 0, "M": 1, "N": 2, "P": 3, "S": 4, "Z": 5, "C": 6}


@lru_cache(maxsize=1)
def _category_table() -> np.ndarray:
    import unicodedata

    cats = [unicodedata.category(chr(c))[0] for c in range(0x110000)]
    return np.array([_CAT_IDX.get(c, 6) for c in cats], dtype=np.uint8)


def codepoint_class_histogram(cp: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """(flat codepoints, row offsets) → int64[n_rows, K] histogram."""
    n = len(offsets) - 1
    if n == 0:
        return np.zeros((0, K), dtype=np.int64)
    table = _category_table()
    cp = np.minimum(cp.astype(np.int64, copy=False), 0x10FFFF)
    cls = table[cp].astype(np.int64)
    row_of = np.repeat(np.arange(n, dtype=np.int64), np.diff(offsets))
    hist = np.bincount(row_of * K + cls, minlength=n * K).reshape(n, K)

    plane = np.full(len(cp), 10, dtype=np.int64)          # astral
    plane[cp < 0x10000] = 9                               # bmp
    plane[cp < 0x100] = 8                                 # latin1
    plane[cp < 0x80] = 7                                  # ascii
    hist += np.bincount(row_of * K + plane, minlength=n * K).reshape(n, K)
    return hist
