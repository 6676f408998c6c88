"""Porter stemming (Porter 1980, "An algorithm for suffix stripping")
— the normalize-before-count step classic IR pipelines apply ahead of
indexing, TF-IDF and vocabulary dedup, implemented from the published
algorithm (the ORIGINAL rule set; later "Porter2/English" Snowball
revisions differ on e.g. LOGI→LOG and are deliberately not mixed in).

Scale shape: stemming is a pure function of the WORD, so the engine
stems the DISTINCT VOCABULARY (10^6-ish even at crawl scale — Heaps'
law), not the token stream: one distinct-shuffle to the vocabulary, an
Arrow-batched pandas UDF over vocabulary rows only, then a broadcast
join maps every corpus token to its stem.  Stemming 10^12 tokens costs
10^6 stem() calls plus one map-side join.

The per-word function is deliberately plain Python under a pandas UDF
(vocabulary rows, never corpus rows — the plan-audit contract): the
algorithm is a 60-branch conditional cascade where numpy vectorization
would obscure the published rules it must match letter-for-letter.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_VOWELS = set("aeiou")


def _is_cons(w: str, i: int) -> bool:
    """Porter's consonant: not a,e,i,o,u; and Y only when NOT preceded
    by a consonant (so 'toy' → t,o are c,v and y is consonant;
    'syzygy' alternates)."""
    c = w[i]
    if c in _VOWELS:
        return False
    if c == "y":
        return i == 0 or not _is_cons(w, i - 1)
    return True


def _measure(stem: str) -> int:
    """m in [C](VC){m}[V]: the number of vowel→consonant transitions."""
    m = 0
    prev_v = False
    for i in range(len(stem)):
        v = not _is_cons(stem, i)
        if prev_v and not v:
            m += 1
        prev_v = v
    return m


def _has_vowel(stem: str) -> bool:
    return any(not _is_cons(stem, i) for i in range(len(stem)))


def _ends_double_cons(w: str) -> bool:
    return (len(w) >= 2 and w[-1] == w[-2]
            and _is_cons(w, len(w) - 1))


def _ends_cvc(w: str) -> bool:
    """*o: stem ends consonant-vowel-consonant where the final
    consonant is not w, x or y."""
    if len(w) < 3:
        return False
    return (_is_cons(w, len(w) - 3)
            and not _is_cons(w, len(w) - 2)
            and _is_cons(w, len(w) - 1)
            and w[-1] not in "wxy")


def _apply_rules(w: str, rules, min_m: int) -> str:
    """Longest-match-wins within a step: the longest suffix in the list
    that matches decides; its condition failing means NO rule of the
    step fires (the paper's explicit semantics, not try-next)."""
    best = None
    for suf, rep in rules:
        if w.endswith(suf) and (best is None or len(suf) > len(best[0])):
            best = (suf, rep)
    if best is None:
        return w
    suf, rep = best
    stem = w[: len(w) - len(suf)]
    if _measure(stem) > min_m:
        return stem + rep
    return w


_STEP2 = [("ational", "ate"), ("tional", "tion"), ("enci", "ence"),
          ("anci", "ance"), ("izer", "ize"), ("abli", "able"),
          ("alli", "al"), ("entli", "ent"), ("eli", "e"),
          ("ousli", "ous"), ("ization", "ize"), ("ation", "ate"),
          ("ator", "ate"), ("alism", "al"), ("iveness", "ive"),
          ("fulness", "ful"), ("ousness", "ous"), ("aliti", "al"),
          ("iviti", "ive"), ("biliti", "ble")]
_STEP3 = [("icate", "ic"), ("ative", ""), ("alize", "al"),
          ("iciti", "ic"), ("ical", "ic"), ("ful", ""), ("ness", "")]
_STEP4 = ["al", "ance", "ence", "er", "ic", "able", "ible", "ant",
          "ement", "ment", "ent", "ion", "ou", "ism", "ate", "iti",
          "ous", "ive", "ize"]


def _step1a(w: str) -> str:
    if w.endswith("sses"):
        return w[:-2]
    if w.endswith("ies"):
        return w[:-2]
    if w.endswith("ss"):
        return w
    if w.endswith("s"):
        return w[:-1]
    return w


def _step1b(w: str) -> str:
    fired = False
    if w.endswith("eed"):
        if _measure(w[:-3]) > 0:
            w = w[:-1]
    elif w.endswith("ed") and _has_vowel(w[:-2]):
        w = w[:-2]
        fired = True
    elif w.endswith("ing") and _has_vowel(w[:-3]):
        w = w[:-3]
        fired = True
    if fired:
        if w.endswith(("at", "bl", "iz")):
            w = w + "e"
        elif (_ends_double_cons(w) and w[-1] not in "lsz"):
            w = w[:-1]
        elif _measure(w) == 1 and _ends_cvc(w):
            w = w + "e"
    return w


def _step1c(w: str) -> str:
    if w.endswith("y") and _has_vowel(w[:-1]):
        return w[:-1] + "i"
    return w


def _step2(w: str) -> str:
    return _apply_rules(w, _STEP2, 0)


def _step3(w: str) -> str:
    return _apply_rules(w, _STEP3, 0)


def _step4(w: str) -> str:
    # m > 1; ION additionally requires the stem to end s or t
    best = None
    for suf in _STEP4:
        if w.endswith(suf) and (best is None or len(suf) > len(best)):
            best = suf
    if best is not None:
        stem = w[: len(w) - len(best)]
        if _measure(stem) > 1 and (best != "ion" or
                                   (stem and stem[-1] in "st")):
            return stem
    return w


def _step5a(w: str) -> str:
    if w.endswith("e"):
        stem = w[:-1]
        m = _measure(stem)
        if m > 1 or (m == 1 and not _ends_cvc(stem)):
            return stem
    return w


def _step5b(w: str) -> str:
    if _measure(w) > 1 and _ends_double_cons(w) and w.endswith("l"):
        return w[:-1]
    return w


def porter_stem(word: str) -> str:
    """Stem one lowercase word per the original 1980 algorithm.
    Words of length ≤ 2 are returned unchanged (the conventional
    implementation guard — the paper's rules never help them).
    NOTE: the paper's rule examples ("relational → relate") illustrate
    SINGLE steps; the full pipeline continues (relate → step 5a →
    relat), matching the author's reference output (generalizations →
    gener, oscillators → oscil)."""
    w = word
    if len(w) <= 2:
        return w
    for step in (_step1a, _step1b, _step1c, _step2, _step3, _step4,
                 _step5a, _step5b):
        w = step(w)
    return w


def stem_vocabulary(words: DataFrame, *, col: str = "word",
                    out: str = "stem") -> DataFrame:
    """Stem a vocabulary frame: adds ``out``.  Arrow-batched; apply to
    DISTINCT words, then broadcast-join back to the corpus."""
    @F.pandas_udf(T.StringType())
    def _stem(s: pd.Series) -> pd.Series:
        return s.map(lambda w: porter_stem(w) if w is not None else None)

    return words.withColumn(out, _stem(F.col(col)))


def stem_tokens(tokens: DataFrame, *, col: str = "token",
                out: str = "stem") -> DataFrame:
    """Add the Porter stem of ``col`` to a token-level frame by the
    vocabulary route: distinct words → stem UDF over vocabulary rows
    only → broadcast join back (the UDF never touches corpus-scale
    rows; the join is map-side because a vocabulary fits memory)."""
    vocab = tokens.select(F.col(col).alias("__w")).distinct()
    stemmed = stem_vocabulary(vocab, col="__w", out=out)
    return (tokens.join(F.broadcast(stemmed),
                        tokens[col] == stemmed["__w"], "left")
            .drop("__w"))
