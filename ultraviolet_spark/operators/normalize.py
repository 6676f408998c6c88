"""Unicode normalization (UAX #15) over text columns.

Web text arrives in mixed normalization forms (macOS filenames and some
CMSes emit NFD; fullwidth/compatibility chars are common in CJK pages),
and EVERY downstream byte-exact operator in this engine — exact dedup
(md5 of text), shingle Jaccard, line dedup, decontamination — treats
"é" (U+00E9) and "e"+U+0301 as different documents unless the corpus is
normalized first.  NFC before dedup is the standard pipeline step
(C4/CCNet normalize before hashing); NFKC additionally folds
compatibility forms (ﬁ→fi, fullwidth→ASCII) for tokenizer-friendly
text.

Implementation: a scalar ``pandas_udf`` whose per-batch loop calls only
two CPython C functions per string — ``unicodedata.is_normalized``
(the UAX #15 quick-check, O(1) for the ~100% of real web text that is
already NFC; pure-ASCII strings short-circuit inside it) and, only on
quick-check failure, ``unicodedata.normalize``.  No byte work happens
in Python-level code; this is the same "C kernel behind an Arrow batch"
shape as the transcode kernels (SURVEY.md §2.9).  At 100 TB the op is
embarrassingly parallel (per-row, no shuffle) and sits in the same
mapInArrow stage as transcode+extract.

Oracle: DuckDB ``nfc_normalize()`` implements the same UAX #15 NFC and
is byte-identical to CPython's ``unicodedata`` on the conformance
probes (verified 2026-08-18: precomposed/decomposed Latin, Hangul jamo
composition, fullwidth, ligatures, combining-mark reordering).
"""

from __future__ import annotations

import unicodedata

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

_FORMS = ("NFC", "NFD", "NFKC", "NFKD")


def _norm_series(s: pd.Series, form: str) -> pd.Series:
    is_norm = unicodedata.is_normalized
    norm = unicodedata.normalize
    out = [
        v if v is None or is_norm(form, v) else norm(form, v)
        for v in s
    ]
    return pd.Series(out, index=s.index, dtype=object)


def unicode_normalize(col: Column | str, form: str = "NFC") -> Column:
    """Column expression: ``col`` normalized to ``form`` (NFC default)."""
    if form not in _FORMS:
        raise ValueError(f"form must be one of {_FORMS}, got {form!r}")

    @pandas_udf(T.StringType())
    def _udf(s: pd.Series) -> pd.Series:
        return _norm_series(s, form)

    return _udf(F.col(col) if isinstance(col, str) else col)


def is_normalized(col: Column | str, form: str = "NFC") -> Column:
    """Boolean column: is ``col`` already in ``form``?  Quick-check only
    (no allocation for the common already-normalized case)."""
    if form not in _FORMS:
        raise ValueError(f"form must be one of {_FORMS}, got {form!r}")

    @pandas_udf(T.BooleanType())
    def _udf(s: pd.Series) -> pd.Series:
        is_norm = unicodedata.is_normalized
        return pd.Series(
            [None if v is None else is_norm(form, v) for v in s],
            index=s.index, dtype=object)

    return _udf(F.col(col) if isinstance(col, str) else col)


def normalize_corpus(df: DataFrame, *, text_col: str = "text",
                     form: str = "NFC") -> DataFrame:
    """Corpus-normalization stage: replaces ``text_col`` with its
    normalized form and adds ``was_normalized`` (true iff the original
    was already in ``form`` — the corpus-health metric worth tracking
    per crawl batch)."""
    return (df
            .withColumn("was_normalized", is_normalized(text_col, form))
            .withColumn(text_col, unicode_normalize(text_col, form)))
