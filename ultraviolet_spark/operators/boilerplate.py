"""JusText-style boilerplate block classification (Pomikálek 2011).

Web pages are mostly chrome: navigation, footers, cookie banners, link
lists.  The JusText family classifies each text BLOCK (paragraph) by
link density, length and stopword density, then smooths the short /
near-good blocks from their neighbours' verdicts — context matters: a
short paragraph between two content paragraphs is content; the same
paragraph between two link lists is chrome.

This is the deterministic simplification of the published algorithm
(headings and the copyright-symbol rule are omitted; the two-sided
smoothing rule is stated exactly below), kept 100% Catalyst so the
whole classifier is one scan + one per-doc window — no Python, no
shuffle beyond the (doc) window partition, and every output is exactly
mirrorable in SQL (q124's DuckDB oracle recomputes it end to end).

Context-free classes (per block):

* ``link_density > max_link_density``            → ``bad``
* ``n_chars < length_low``   → ``bad`` if ``link_density > 0`` else ``short``
* ``stop_frac >= stopwords_high`` → ``good`` if ``n_chars > length_high``
  else ``near_good``
* ``stop_frac >= stopwords_low``  → ``near_good``
* otherwise                                       → ``bad``

Context-sensitive (final) classes: let ``prev_edge`` / ``next_edge`` be
the closest context-free ``good``/``bad`` verdict before / after the
block in document order (document boundaries count as ``bad``):

* ``near_good`` → ``good`` iff either edge is ``good``
* ``short``     → ``good`` iff BOTH edges are ``good``

Scale shape: features are scan-stage expressions; the smoothing is one
window partitioned by document — the natural key, bounded by the
largest single page, never by the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ultraviolet_spark.operators.textstats import STOPWORDS


def doc_blocks(docs: DataFrame, *, text_col: str = "text",
               id_col: str = "doc_id") -> DataFrame:
    """Explode documents into ``(id, block_idx, block)`` paragraph rows
    (newline-delimited; whitespace-only blocks dropped on BOTH the
    engine and oracle side so indexes stay aligned)."""
    pos = F.posexplode(F.split(F.col(text_col), "\n"))
    return (docs.select(F.col(id_col), pos.alias("block_idx", "block"))
            .filter(F.length(F.trim("block")) > 0)
            .withColumn("link_density", F.lit(0.0)))


def justext_blocks(blocks: DataFrame, *, lang: str = "en",
                   id_col: str = "doc_id", block_col: str = "block",
                   idx_col: str = "block_idx",
                   link_density_col: str = "link_density",
                   length_low: int = 70, length_high: int = 200,
                   stopwords_low: float = 0.30,
                   stopwords_high: float = 0.32,
                   max_link_density: float = 0.2) -> DataFrame:
    """Classify paragraph blocks content/boilerplate, JusText-style.

    Input: one row per block with a per-document ordering column and a
    precomputed link density (0.0 when unknown — :func:`doc_blocks`;
    the HTML pipeline can supply anchor-char fractions from
    ``extract_anchors``).  Output adds ``n_chars, n_words, stop_frac,
    cf_class, class, is_content``.
    """
    if lang not in STOPWORDS:
        raise ValueError(f"no stopword list for lang {lang!r}")
    stop = [F.lit(w) for w in STOPWORDS[lang]]

    b = F.col(block_col)
    toks = F.split(F.lower(F.trim(b)), r"\s+")
    n_words = F.size(toks).cast("long")
    n_chars = F.length(b).cast("long")
    stop_frac = (F.size(F.filter(toks, lambda t: t.isin(
        *STOPWORDS[lang]))).cast("double") / n_words)
    ld = F.col(link_density_col).cast("double")

    cf = (F.when(ld > max_link_density, "bad")
          .when((n_chars < length_low) & (ld > 0), "bad")
          .when(n_chars < length_low, "short")
          .when(stop_frac >= stopwords_high,
                F.when(n_chars > length_high, "good").otherwise("near_good"))
          .when(stop_frac >= stopwords_low, "near_good")
          .otherwise("bad"))

    out = (blocks
           .withColumn("n_chars", n_chars)
           .withColumn("n_words", n_words)
           .withColumn("stop_frac", F.round(stop_frac, 6))
           .withColumn("cf_class", cf))

    w = Window.partitionBy(id_col).orderBy(idx_col)
    edge = F.when(F.col("cf_class").isin("good", "bad"), F.col("cf_class"))
    prev_edge = F.coalesce(
        F.last(edge, ignorenulls=True).over(
            w.rowsBetween(Window.unboundedPreceding, -1)), F.lit("bad"))
    next_edge = F.coalesce(
        F.first(edge, ignorenulls=True).over(
            w.rowsBetween(1, Window.unboundedFollowing)), F.lit("bad"))

    final = (F.when(F.col("cf_class").isin("good", "bad"), F.col("cf_class"))
             .when(F.col("cf_class") == "near_good",
                   F.when((prev_edge == "good") | (next_edge == "good"),
                          "good").otherwise("bad"))
             .otherwise(  # short
                 F.when((prev_edge == "good") & (next_edge == "good"),
                        "good").otherwise("bad")))
    return (out.withColumn("class", final)
            .withColumn("is_content", F.col("class") == "good"))


def strip_boilerplate(docs: DataFrame, *, text_col: str = "text",
                      id_col: str = "doc_id", lang: str = "en",
                      **params) -> DataFrame:
    """Documents with ``text_content``: only the blocks the classifier
    keeps, re-joined with newlines in original order (docs whose every
    block is boilerplate keep an empty string — the caller's quality
    gate drops them)."""
    cls = justext_blocks(doc_blocks(docs, text_col=text_col,
                                    id_col=id_col),
                         lang=lang, id_col=id_col, **params)
    kept = (cls.filter(F.col("is_content"))
            .groupBy(id_col)
            .agg(F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(
                        F.struct("block_idx", "block"))),
                    lambda s: s["block"]), "\n").alias("text_content")))
    return (docs.join(kept, id_col, "left")
            .withColumn("text_content",
                        F.coalesce("text_content", F.lit(""))))
