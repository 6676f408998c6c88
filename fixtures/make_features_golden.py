"""Independent pandas slow-path features oracle (FIXTURES.md §4).

Computes the SURVEY.md §1.2 `features` table from a pages DataFrame
with plain per-group pandas — deliberately naive and separate from the
engine's Spark/window implementation.  Used by
tests/test_features_golden.py (numpy-allclose comparison) and to
materialize fixtures/features_golden.parquet.
"""

from __future__ import annotations

import unicodedata

import numpy as np
import pandas as pd

from fixtures.make_golden import golden_extract

_CAT_IDX = {"L": 0, "M": 1, "N": 2, "P": 3, "S": 4, "Z": 5, "C": 6}
_K = 11
_GAP = 24 * 3600.0


def _hist(s: str) -> list[int]:
    h = [0] * _K
    for c in s:
        h[_CAT_IDX.get(unicodedata.category(c)[0], 6)] += 1
        cp = ord(c)
        h[7 if cp < 0x80 else 8 if cp < 0x100 else 9 if cp < 0x10000 else 10] += 1
    return h


def _decode_auto(raw: bytes) -> tuple[str, int]:
    """(decoded text, n_replacements) mirroring BOM-sniffing decode."""
    for bom, codec in (
        (b"\xff\xfe\x00\x00", "utf-32-le"), (b"\x00\x00\xfe\xff", "utf-32-be"),
        (b"\xef\xbb\xbf", "utf-8"), (b"\xff\xfe", "utf-16-le"), (b"\xfe\xff", "utf-16-be"),
    ):
        if raw.startswith(bom):
            body = raw[len(bom):]
            dec = body.decode(codec, errors="replace")
            clean = body.decode(codec, errors="ignore")
            return dec, dec.count("�") - clean.count("�")
    dec = raw.decode("utf-8", errors="replace")
    clean = raw.decode("utf-8", errors="ignore")
    return dec, dec.count("�") - clean.count("�")


def golden_features(pages: pd.DataFrame, gap_secs: float = _GAP) -> pd.DataFrame:
    rows = []
    for _, r in pages.iterrows():
        dec, n_repl = _decode_auto(bytes(r["html"]))
        text = golden_extract(dec)
        rows.append(
            {
                "url": r["url"], "warc_ts": r["warc_ts"], "lang": r["lang"],
                "text": text, "text_len": len(text), "valid": n_repl == 0,
            }
        )
    df = pd.DataFrame(rows)
    out = []
    for url, g in df.groupby("url", sort=False):
        g = g.sort_values("warc_ts", kind="mergesort").reset_index(drop=True)
        n = len(g)
        ts = g["warc_ts"].astype("datetime64[us]").astype(np.int64) / 1e6
        gap = [np.nan] + [ts[i] - ts[i - 1] for i in range(1, n)]
        sess, sid = [], -1
        for i in range(n):
            if i == 0 or gap[i] > gap_secs:
                sid += 1
            sess.append(sid)
        lag1 = [None] + list(g["text_len"][:-1])
        ffill, last = [], None
        for i in range(n):
            if g["valid"][i]:
                last = int(g["text_len"][i])
            ffill.append(last)
        for i in range(n):
            out.append(
                {
                    "url": url,
                    "warc_ts": g["warc_ts"][i],
                    "text_len": int(g["text_len"][i]),
                    "cp_hist": _hist(g["text"][i]),
                    "lang": g["lang"][i],
                    "lang_stable_lag1": bool(i >= 1 and g["lang"][i - 1] == g["lang"][i]),
                    "lang_stable_lag2": bool(i >= 2 and g["lang"][i - 2] == g["lang"][i]),
                    "gap_secs": gap[i],
                    "session_id": sess[i],
                    "text_len_lag1": lag1[i],
                    "text_len_ffill": ffill[i],
                    "text": g["text"][i],
                }
            )
    return pd.DataFrame(out)
