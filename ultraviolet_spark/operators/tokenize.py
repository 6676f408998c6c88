"""Byte-pair encoding (Sennrich et al. 2016) — train + distributed apply.

Real BPE, not a regex approximation: initial tokens are Unicode
codepoints; each merge (a, b) → new_id rewrites the whole corpus
greedily left-to-right before the next merge applies (priority order,
exactly the reference algorithm).

- :func:`bpe_train` learns the merge table on a BOUNDED deterministic
  sample driver-side (the IVF-centroid precedent: training data small,
  application distributed).
- :func:`bpe_apply` tokenizes distributed: each Arrow batch's documents
  are concatenated into ONE flat int64 codepoint array with sentinel
  separators, and every merge is a handful of whole-array numpy ops
  (match mask → run-parity overlap resolution → scatter + mask-delete).
  No per-document Python; cost per merge is O(corpus bytes) memcpy.

Equivalence that makes this exactly verifiable: greedy BPE merge
application equals a chain of string ``replace()`` calls where merged
tokens are spelled as private-use sentinel characters — for (a, b) with
a ≠ b adjacent matches are impossible, and for a == b the keep-even-
position-in-run rule reproduces replace()'s non-rescanning left-to-right
scan.  q98's DuckDB oracle uses exactly that replace chain; the pytest
suite additionally checks a slow per-document reference implementation.

Scale notes (100 TB): apply is shuffle-free mapInPandas row
parallelism; the merge table (typically ≤ 64k entries) broadcasts with
the closure.  Flat-array rewriting keeps per-batch cost linear in bytes
× merges with vectorized constants, the same regime as the transcoding
kernels.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# first id assigned to a merged token: above any codepoint
BASE_ID = 0x110000
_SEP = -1  # document separator in the flat array; never matches a merge


def _flatten(texts: list[str]) -> tuple[np.ndarray, np.ndarray]:
    """Docs → (flat codepoint array with _SEP between docs, seg ids)."""
    if not texts:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    lens = np.fromiter((len(t) for t in texts), np.int64, count=len(texts))
    joined = "\x00".join(texts)  # placeholder separators, replaced below
    flat = np.frombuffer(joined.encode("utf-32-le"), dtype="<u4").astype(np.int64)
    seg = np.repeat(np.arange(len(texts), dtype=np.int64), lens + 1)[:flat.size]
    # mark separator slots (positions right after each doc body)
    if len(texts) > 1:
        sep_pos = np.cumsum(lens + 1)[:-1] - 1
        flat[sep_pos] = _SEP
    return flat, seg


def _merge_once(arr: np.ndarray, seg: np.ndarray, a: int, b: int,
                new_id: int) -> tuple[np.ndarray, np.ndarray]:
    """One whole-corpus greedy merge pass, fully vectorized."""
    if arr.size < 2:
        return arr, seg
    m = (arr[:-1] == a) & (arr[1:] == b)
    idx = np.flatnonzero(m)
    if idx.size == 0:
        return arr, seg
    if a == b and idx.size > 1:
        # overlapping matches come in runs of consecutive indices;
        # greedy left-to-right keeps even positions within each run
        run_start = np.concatenate(([True], np.diff(idx) != 1))
        anchor = np.maximum.accumulate(
            np.where(run_start, np.arange(idx.size), 0))
        idx = idx[(np.arange(idx.size) - anchor) % 2 == 0]
    arr = arr.copy()
    arr[idx] = new_id
    keep = np.ones(arr.size, bool)
    keep[idx + 1] = False
    return arr[keep], seg[keep]


def bpe_train(df: DataFrame, *, text_col: str = "text",
              id_col: str = "doc_id", n_merges: int = 64,
              sample_rows: int = 2048) -> list[tuple[int, int]]:
    """Learn ``n_merges`` merges from a deterministic bounded sample
    (orderBy(id) limit sample_rows — the only collect).  Tie-break:
    highest pair count, then smallest (a, b).  Returns the merge list
    in priority order; merged token i gets id ``BASE_ID + i``."""
    texts = [r[0] for r in (df.select(text_col, id_col).orderBy(id_col)
                            .limit(sample_rows).select(text_col).collect())]
    arr, seg = _flatten([t or "" for t in texts])
    merges: list[tuple[int, int]] = []
    for i in range(n_merges):
        if arr.size < 2:
            break
        valid = (arr[:-1] != _SEP) & (arr[1:] != _SEP)
        pairs = arr[:-1][valid] * (BASE_ID + n_merges) + arr[1:][valid]
        if pairs.size == 0:
            break
        uniq, counts = np.unique(pairs, return_counts=True)
        best = uniq[counts == counts.max()].min()  # deterministic tie-break
        a, b = int(best // (BASE_ID + n_merges)), int(best % (BASE_ID + n_merges))
        merges.append((a, b))
        arr, seg = _merge_once(arr, seg, a, b, BASE_ID + i)
    return merges


BPE_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("n_tokens", T.LongType()),
    T.StructField("tokens", T.ArrayType(T.LongType())),
])


def bpe_apply(df: DataFrame, merges: list[tuple[int, int]], *,
              text_col: str = "text", id_col: str = "doc_id",
              with_tokens: bool = True) -> DataFrame:
    """Distributed BPE tokenization → (doc_id, n_tokens[, tokens]).
    Merged token i (0-based position in ``merges``) has id BASE_ID+i;
    all other ids are raw codepoints."""
    merge_list = [(int(a), int(b)) for a, b in merges]

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            texts = ["" if t is None else str(t) for t in pdf[text_col]]
            arr, seg = _flatten(texts)
            for i, (a, b) in enumerate(merge_list):
                arr, seg = _merge_once(arr, seg, a, b, BASE_ID + i)
            body = arr != _SEP
            counts = np.bincount(seg[body], minlength=len(texts))
            out = pd.DataFrame({
                "doc_id": pdf[id_col].to_numpy().astype(np.int64),
                "n_tokens": counts.astype(np.int64),
            })
            if with_tokens:
                tok, sg = arr[body], seg[body]
                bounds = np.searchsorted(sg, np.arange(len(texts) + 1))
                out["tokens"] = [tok[s:e] for s, e in
                                 zip(bounds[:-1], bounds[1:])]
            else:
                out["tokens"] = None
            yield out

    return df.select(id_col, text_col).mapInPandas(gen, BPE_SCHEMA)


def wordpiece_segment(word: str, vocab: set, *,
                      unk: str = "[UNK]",
                      max_input_chars: int = 100) -> list:
    """Greedy longest-match-first WordPiece segmentation (Wu et al.
    2016 / the BERT tokenizer's inference side): repeatedly take the
    LONGEST vocab entry matching at the cursor (continuation pieces
    carry the ``##`` prefix); if no piece matches at any cursor the
    WHOLE word collapses to ``unk`` (the published all-or-nothing
    rule, not a partial emit), as does any word longer than
    ``max_input_chars`` (BERT's 100-char guard against degenerate
    inputs)."""
    if len(word) > max_input_chars:
        return [unk]
    pieces = []
    start = 0
    n = len(word)
    while start < n:
        end = n
        cur = None
        while start < end:
            sub = word[start:end]
            if start > 0:
                sub = "##" + sub
            if sub in vocab:
                cur = sub
                break
            end -= 1
        if cur is None:
            return [unk]
        pieces.append(cur)
        start = end
    return pieces


def wordpiece_tokens(tokens: DataFrame, vocab: list, *,
                     col: str = "token", out: str = "pieces",
                     unk: str = "[UNK]",
                     max_input_chars: int = 100) -> DataFrame:
    """Add the WordPiece segmentation of ``col`` as an array column by
    the vocabulary route (the stemmer's 100 TB shape): segment DISTINCT
    words only — Heaps' law bounds the vocabulary, so 10^12 tokens
    cost |vocabulary| segmentations under one Arrow-batched UDF plus a
    broadcast join back.  ``vocab`` is the subword inventory (a real
    BERT vocab is ~30k entries — a closure-shipped frozenset)."""
    import pandas as pd

    vset = frozenset(vocab)

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def _seg(s: pd.Series) -> pd.Series:
        return s.map(lambda w: None if w is None else
                     wordpiece_segment(w, vset, unk=unk,
                                       max_input_chars=max_input_chars))

    words = tokens.select(F.col(col).alias("__w")).distinct()
    segged = words.withColumn(out, _seg(F.col("__w")))
    return (tokens.join(F.broadcast(segged),
                        tokens[col] == segged["__w"], "left")
            .drop("__w"))
