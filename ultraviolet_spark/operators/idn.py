"""Internationalized domain names: RFC 3492 Punycode decode of
``xn--`` ACE labels — the step between a crawled hostname and every
human-facing / linguistic use of it (language signals from the domain,
phishing lookalike detection, display).

The decoder is written from scratch to the RFC's pseudocode (insertion
unsort with the adapt() bias schedule), not a wrapper over a codec —
and is pinned against CPython's independent ``punycode`` codec by a
hypothesis round-trip property in the tests.  Execution is an
Arrow-batched pandas UDF: hosts are short (a handful of labels), so the
per-label loop is bounded and the batch amortizes the crossing; there
is no per-ROW Python UDF (the plan audit enforces that globally).

Policy (documented, deliberate): a host whose ``xn--`` label fails to
decode — bad digit, truncated extended section, overflow, a decoded
code point outside Unicode or in the surrogate gap, or non-ASCII bytes
in the basic section — yields NULL for the whole host rather than a
half-decoded lie; ASCII-only hosts pass through unchanged.  Matching
is case-insensitive (``XN--`` counts) and the decoded label keeps the
case the extended section encodes, per RFC 3492 §3.3 (we feed
lowercased input, so output is lowercase).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

_BASE, _TMIN, _TMAX = 36, 1, 26
_SKEW, _DAMP = 38, 700
_INITIAL_BIAS, _INITIAL_N = 72, 128


def _adapt(delta: int, numpoints: int, firsttime: bool) -> int:
    delta = delta // _DAMP if firsttime else delta // 2
    delta += delta // numpoints
    k = 0
    while delta > ((_BASE - _TMIN) * _TMAX) // 2:
        delta //= _BASE - _TMIN
        k += _BASE
    return k + (((_BASE - _TMIN + 1) * delta) // (delta + _SKEW))


def _digit(c: str) -> int:
    o = ord(c)
    if 0x61 <= o <= 0x7A:          # a-z
        return o - 0x61
    if 0x30 <= o <= 0x39:          # 0-9
        return o - 0x30 + 26
    raise ValueError(f"bad punycode digit {c!r}")


def puny_decode(ext_label: str) -> str:
    """Decode one Punycode label (the part AFTER ``xn--``), already
    lowercased ASCII.  Raises ValueError on any malformation."""
    if not ext_label.isascii():
        raise ValueError("non-ASCII in ACE label")
    sep = ext_label.rfind("-")
    if sep >= 0:
        output = list(ext_label[:sep])
        ext = ext_label[sep + 1:]
    else:
        output, ext = [], ext_label
    if not ext:
        raise ValueError("empty extended section")
    i, n, bias = 0, _INITIAL_N, _INITIAL_BIAS
    pos = 0
    while pos < len(ext):
        oldi, w, k = i, 1, _BASE
        while True:
            if pos >= len(ext):
                raise ValueError("truncated extended section")
            d = _digit(ext[pos])
            pos += 1
            i += d * w
            if i > 0x7FFFFFFF:
                raise ValueError("overflow")
            t = _TMIN if k <= bias else (_TMAX if k >= bias + _TMAX
                                         else k - bias)
            if d < t:
                break
            # NOTE: the per-digit weight grows by (base - t) with THIS
            # k's threshold t — not the constant (base - tmin) that
            # adapt() uses; conflating the two decodes short labels
            # fine and corrupts longer ones (caught by the fixture
            # pairs on first run)
            w *= _BASE - t
            k += _BASE
        x = len(output) + 1
        bias = _adapt(i - oldi, x, oldi == 0)
        n += i // x
        i %= x
        if n > 0x10FFFF or 0xD800 <= n <= 0xDFFF:
            raise ValueError("code point out of range")
        output.insert(i, chr(n))
        i += 1
    return "".join(output)


def idn_decode_host(h: str | None) -> str | None:
    """Decode every ``xn--`` label of a hostname; NULL on failure."""
    if h is None:
        return None
    out = []
    for label in h.lower().split("."):
        if label.startswith("xn--"):
            try:
                decoded = puny_decode(label[4:])
            except ValueError:
                return None
            if not decoded or decoded.isascii():
                # an ACE label that decodes to pure ASCII (or nothing)
                # is forbidden by IDNA — flag, don't pass through
                return None
            out.append(decoded)
        else:
            out.append(label)
    return ".".join(out)


@pandas_udf(T.StringType())
def idn_decode_udf(s: pd.Series) -> pd.Series:
    return s.map(idn_decode_host, na_action="ignore")


def with_unicode_host(df: DataFrame, *, host_col: str = "host",
                      out_col: str = "unicode_host") -> DataFrame:
    """Adds the Unicode form of ``host_col`` (NULL for undecodable ACE
    labels) plus ``is_idn`` — whether the host carried any ``xn--``
    label at all (cheap Catalyst prefilter: the UDF only ever sees
    rows that need it, ASCII hosts never cross into Python)."""
    h = F.col(host_col)
    is_idn = F.lower(h).rlike(r"(^|\.)xn--")
    return (df.withColumn("is_idn", is_idn)
              .withColumn(out_col,
                          F.when(is_idn, idn_decode_udf(F.lower(h)))
                           .otherwise(F.lower(h))))


# --- homograph / confusable-skeleton spoof detection (UTS #39 style) ---
#
# A curated single-code-point confusable map (the high-traffic subset of
# Unicode UTS #39 confusables.txt: Cyrillic and Greek letters that render
# identically to Basic Latin in common UI fonts, plus the two classic
# ASCII typosquat digits).  Single code points only — Spark's
# ``translate`` is a 1:1 code-point substitution evaluated entirely in
# the JVM (whole-stage codegen, no Python) — so multi-char confusables
# like ``rn``→``m`` are out of scope here (documented limitation; they
# need a regexp pass and are far rarer in registered homograph attacks).
_CONF_SRC = (
    "аеорсухіјѕ"   # Cyrillic lookalikes of a e o p c y x i j s
    "ԛԝһԁѵ"        # Cyrillic lookalikes of q w h d v
    "ονρικχυ"      # Greek lookalikes of o v p i k x u
    "ıℓ"           # dotless i, script ell
    "01")          # classic typosquat digits
_CONF_DST = "aeopcyxijs" + "qwhdv" + "ovpikxu" + "il" + "ol"


def confusable_skeleton(col: Column) -> Column:
    """Lower-cased confusable skeleton of a hostname: every code point
    in the curated confusable set collapses to its Basic Latin target,
    so two strings that LOOK identical compare equal.  Pure Catalyst
    (``translate`` + ``lower``) — runs in whole-stage codegen, never
    leaves the JVM."""
    return F.translate(F.lower(col), _CONF_SRC, _CONF_DST)


def spoof_report(df: DataFrame, brands: list[str], *,
                 host_col: str = "host") -> DataFrame:
    """Flag hosts whose confusable skeleton collides with a protected
    brand domain while the host itself is NOT that brand — the IDN
    homograph attack (``xn--pypal-4ve.com`` renders as ``pаypal.com``).

    Adds ``skeleton``, ``matched_brand`` (NULL when no brand collides)
    and ``is_spoof``.  An exact (case-folded) brand hit is matched but
    NOT a spoof.  The brand list is a broadcast side — thousands of
    brands against 10^12 pages is the textbook broadcast-hash-join
    shape, zero shuffle on the page side.

    Raises if two brands share a skeleton: the report would be
    ambiguous (which brand is being spoofed?) and the caller should
    de-conflict the list instead of us picking silently.
    """
    spark = df.sparkSession
    brands_lc = [b.lower() for b in brands]
    bdf = (spark.createDataFrame([(b,) for b in brands_lc],
                                 "matched_brand string")
           .withColumn("__bskel", confusable_skeleton(F.col("matched_brand"))))
    skels = [r["__bskel"] for r in bdf.collect()]  # tiny: |brands| rows
    if len(set(skels)) != len(skels):
        raise ValueError("brand list has colliding confusable skeletons; "
                         "de-conflict it before building the report")
    out = (df.withColumn("skeleton", confusable_skeleton(F.col(host_col)))
           .join(F.broadcast(bdf),
                 F.col("skeleton") == F.col("__bskel"), "left")
           .drop("__bskel"))
    return out.withColumn(
        "is_spoof",
        F.col("matched_brand").isNotNull()
        & (F.lower(F.col(host_col)) != F.col("matched_brand")))
