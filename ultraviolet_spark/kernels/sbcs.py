"""Single-byte charset decoding (WHATWG Encoding Standard index tables).

The transcoding core (kernels/utf8,16,32) covers the Unicode encodings;
real crawled HTML additionally declares legacy single-byte charsets —
windows-1252 is the HTML5 *default* when nothing is declared.  Decoding
a single-byte charset is one LUT gather per batch: 256-entry
byte→codepoint table, ``lut[data]``, offsets unchanged (1 byte = 1
codepoint, no ill-formed sequences possible).

LUT policy follows the WHATWG Encoding Standard, not the vendor
tables: bytes the vendor left undefined (e.g. 0x81/0x8D/0x8F/0x90/0x9D
in cp1252, 0x98 in cp1251) map to the corresponding C1 control
(U+0081, …) so browsers — and this kernel — never fail on single-byte
content.  Everything else is built from CPython's codec tables at
import time, which match WHATWG for the defined range.
"""

from __future__ import annotations

import numpy as np

_I64 = np.int64


def _build_lut(codec: str) -> np.ndarray:
    lut = np.empty(256, dtype=np.int32)
    for b in range(256):
        try:
            lut[b] = ord(bytes([b]).decode(codec))
        except UnicodeDecodeError:
            # WHATWG index: vendor-undefined byte → same-valued C1 control.
            lut[b] = b
    return lut


# Canonical-name → LUT.  iso-8859-1/ascii labels resolve to windows-1252
# upstream (operators/charset.LABELS), exactly as the WHATWG label table
# does, so no separate latin-1 LUT exists on purpose.
LUTS: dict[str, np.ndarray] = {
    "windows-1252": _build_lut("cp1252"),
    "windows-1251": _build_lut("cp1251"),
    "iso-8859-2": _build_lut("iso8859-2"),
}


def sbcs_to_codepoints(data: np.ndarray, offsets: np.ndarray,
                       charset: str) -> tuple[np.ndarray, np.ndarray]:
    """(codepoints:int32, cp_offsets:int64) for a single-byte charset.
    Total work: one gather over the batch — no per-row Python."""
    lut = LUTS[charset]
    return lut[data], offsets.astype(_I64, copy=False)


def _build_rev(charset: str) -> tuple[np.ndarray, int]:
    """codepoint→byte reverse table (-1 = not in the charset image).
    The WHATWG LUT is injective (defined bytes never collide with the
    C1 fills), so the reverse is exact.  Image max is small (cp1252
    tops out at U+2122 ™), so a dense table is cheap."""
    lut = LUTS[charset]
    hi = int(lut.max()) + 1
    rev = np.full(hi, -1, dtype=np.int16)
    rev[lut] = np.arange(256, dtype=np.int16)
    return rev, hi


_REVS: dict[str, tuple[np.ndarray, int]] = {}


def codepoints_to_sbcs(cp: np.ndarray, offsets: np.ndarray,
                       charset: str) -> tuple[np.ndarray, np.ndarray]:
    """(bytes:uint8, ok:bool per row) — encode codepoints back into a
    single-byte charset.  Rows containing any codepoint outside the
    charset image are flagged ok=False (their output bytes are
    unspecified; callers must mask on ok).  One clipped gather, no
    per-row Python.  This is the reverse step mojibake repair needs:
    'Ã©' → cp1252 bytes C3 A9 → valid UTF-8 'é'."""
    key = charset
    if key not in _REVS:
        _REVS[key] = _build_rev(charset)
    rev, hi = _REVS[key]
    in_range = cp < hi
    b = rev[np.clip(cp, 0, hi - 1).astype(np.int64)]
    good = in_range & (b >= 0)
    n = len(offsets) - 1
    # per-row AND of `good` via prefix-sum difference (empty-row safe)
    if len(cp):
        csum = np.zeros(len(cp) + 1, dtype=_I64)
        np.cumsum(~good, out=csum[1:])
        bad_per_row = csum[offsets[1:]] - csum[offsets[:-1]]
    else:
        bad_per_row = np.zeros(n, dtype=_I64)
    ok = bad_per_row == 0
    return b.astype(np.uint8), ok
