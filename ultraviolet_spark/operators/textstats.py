"""Text-analysis operators for training-data pipelines (SURVEY.md §2,
task brief "text analysis" block): language-ID, quality scoring, token
counting, document fingerprinting.

All operators are pure Catalyst expressions (JVM-side, whole-stage
codegen) — no Python in the hot path — so they push down, prune, and
pipeline like any built-in.  Each has an exact ANSI-SQL equivalent in
``ultraviolet_spark.queries`` so the DuckDB oracle can verify it.

Scale notes: every operator here is a narrow per-row map — shuffle-free,
embarrassingly parallel, safe at 100 TB.  The only aggregations are the
callers' own groupBys.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Small fixed stopword lists (distinct words). Order of _LANGS is the
# deterministic tie-break for argmax language prediction.
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "with", "for"],
    "de": ["der", "die", "das", "und", "ist", "mit", "für", "ein"],
    "es": ["el", "la", "de", "y", "es", "con", "para", "un"],
    "fr": ["le", "la", "de", "et", "est", "avec", "pour", "un"],
    "zh": ["的", "了", "是", "在", "和", "有", "我", "他"],
}
LANGS = list(STOPWORDS)  # fixed order = tie-break order

PUNCT_RE = r"[.,!?;:]"
DIGIT_RE = r"[0-9]"
# BPE-ish tokenizer: words, numbers, or single non-space symbols
BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def tokens(col) -> Column:
    """Whitespace tokens of trimmed text (empty text → 1 empty token —
    callers filter empty docs first, mirroring the SQL oracle)."""
    return F.split(F.trim(col), r"\s+")


def token_count(col) -> Column:
    return F.size(tokens(col)).cast("long")


def bpe_token_count(col) -> Column:
    """Count of BPE-ish tokens (letters runs / digit runs / symbols)."""
    return F.regexp_count(col, F.lit(BPE_TOKEN_RE)).cast("long")


def punct_ratio(col) -> Column:
    return F.regexp_count(col, F.lit(PUNCT_RE)).cast("double") / F.length(col)


def digit_ratio(col) -> Column:
    return F.regexp_count(col, F.lit(DIGIT_RE)).cast("double") / F.length(col)


def stopword_hits(col, lang: str) -> Column:
    """Number of DISTINCT stopwords of ``lang`` present in the text
    (array_intersect is set-semantics on both Spark and DuckDB)."""
    toks = F.split(F.lower(F.trim(col)), r"\s+")
    return F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in STOPWORDS[lang]])))


def predict_lang(col) -> Column:
    """Argmax language over stopword-hit scores; ties broken by LANGS
    order.  Zero hits everywhere → 'und' (undetermined)."""
    scores = {l: stopword_hits(col, l) for l in LANGS}
    best = F.greatest(*scores.values())
    expr = F.lit("und")
    # build reversed so earlier langs win ties
    for l in reversed(LANGS):
        expr = F.when(scores[l] == best, F.lit(l)).otherwise(expr)
    return F.when(best > 0, expr).otherwise(F.lit("und"))


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds per-document quality-scoring columns (all JVM expressions)."""
    c = F.col(text_col)
    return (
        df.withColumn("n_tokens", token_count(c))
        .withColumn("n_bpe_tokens", bpe_token_count(c))
        .withColumn("punct_ratio", punct_ratio(c))
        .withColumn("digit_ratio", digit_ratio(c))
        .withColumn(
            "mean_token_len",
            F.length(F.regexp_replace(F.trim(c), r"\s+", "")).cast("double")
            / token_count(c),
        )
        .withColumn("pred_lang", predict_lang(c))
    )


def fingerprint(col, n_hex: int = 16) -> Column:
    """Deterministic document fingerprint: first ``n_hex`` hex chars of
    md5 over whitespace-normalized lowercase text.  md5 is identical in
    Spark and DuckDB, so this is oracle-checkable exactly."""
    norm = F.regexp_replace(F.lower(F.trim(col)), r"\s+", " ")
    return F.substring(F.md5(norm.cast("binary")), 1, n_hex)


# PII patterns restricted to the syntax subset shared by Java regex
# (Spark) and RE2 (DuckDB): character classes, bounded repetition,
# non-capturing groups, \b — no backreferences or lookaround.
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
PII_PHONE_RE = r"\b[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}\b"


def pii_counts(col) -> dict[str, Column]:
    """Per-type PII match counts for one text column."""
    return {
        "n_emails": F.regexp_count(col, F.lit(PII_EMAIL_RE)).cast("long"),
        "n_ipv4": F.regexp_count(col, F.lit(PII_IPV4_RE)).cast("long"),
        "n_phones": F.regexp_count(col, F.lit(PII_PHONE_RE)).cast("long"),
    }


def redact_pii(col) -> Column:
    """Text with PII spans replaced by typed placeholder tokens (the
    standard pre-training scrub).  Email first: its local part could
    otherwise leave digit runs that the phone pattern would re-match.
    """
    out = F.regexp_replace(col, PII_EMAIL_RE, "<EMAIL>")
    out = F.regexp_replace(out, PII_IPV4_RE, "<IP>")
    return F.regexp_replace(out, PII_PHONE_RE, "<PHONE>")


def pii_scrub(df: DataFrame, *, text_col: str = "text") -> DataFrame:
    """Adds per-doc PII counts, a ``has_pii`` flag and a redacted text
    column.  Pure Catalyst regex ops — scan-stage, shuffle-free,
    100 TB-safe; patterns live in the Java∩RE2 subset so the DuckDB
    oracle runs the literal same regexes."""
    c = F.col(text_col)
    counts = pii_counts(c)
    out = df
    for name, expr in counts.items():
        out = out.withColumn(name, expr)
    total = sum((F.col(n) for n in counts), F.lit(0).cast("long"))
    return (out.withColumn("has_pii", total > 0)
            .withColumn("text_redacted", redact_pii(c)))


def repetition_signals(df: DataFrame, *, text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """Gopher-style within-document repetition / diversity signals:

    ``(id, n_words, n_distinct, type_token_ratio, top_word_frac,
    mean_word_len)`` — the classic webtext quality gates ("fraction of
    the doc that is its most common word", type-token ratio) used to
    drop boilerplate and degenerate pages before training.

    Scale notes (100 TB): one explode + two partial-agg groupBys keyed
    on (doc, word) then (doc) — map-side combine keeps the shuffle
    proportional to DISTINCT words per doc, not doc length; the
    mean-word-length pass is a pure Catalyst array aggregate in the
    scan stage (no Python anywhere).
    """
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    t = (df.filter(F.length(F.trim(F.col(text_col))) > 0)
         .select(F.col(id_col), toks.alias("__w")))
    counts = (t.select(F.col(id_col), F.explode("__w").alias("__word"))
              .groupBy(id_col, "__word").agg(F.count("*").alias("__cnt")))
    s = counts.groupBy(id_col).agg(
        F.sum("__cnt").cast("long").alias("n_words"),
        F.count("*").cast("long").alias("n_distinct"),
        F.max("__cnt").cast("long").alias("__top_cnt"),
    )
    m = t.select(
        F.col(id_col),
        F.round(
            F.aggregate("__w", F.lit(0).cast("long"),
                        lambda acc, x: acc + F.length(x)).cast("double")
            / F.size("__w"), 6).alias("mean_word_len"),
    )
    return (
        s.join(m, on=id_col)
        .select(
            F.col(id_col), F.col("n_words"), F.col("n_distinct"),
            F.round(F.col("n_distinct").cast("double") / F.col("n_words"), 6)
             .alias("type_token_ratio"),
            F.round(F.col("__top_cnt").cast("double") / F.col("n_words"), 6)
             .alias("top_word_frac"),
            F.col("mean_word_len"),
        )
    )


def bm25_scores(df: DataFrame, terms: list[str], *, k1: float = 1.2,
                b: float = 0.75, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Okapi BM25 relevance of every document against a fixed query
    term set (Robertson/Spärck Jones, public) — the retrieval scorer a
    training pipeline uses for targeted data selection ("find docs
    about X").  ``idf = ln((N − df + 0.5)/(df + 0.5) + 1)`` (the
    Lucene non-negative variant).

    Returns ``(id, n_terms_hit, bm25)``; docs hitting no term score 0.

    Cross-engine determinism: idf and each per-term score are snapped
    to a 1e-6 grid before the per-doc sum (same scheme as
    dsir_importance).

    Scale notes (100 TB): the explode is filtered to the |Q| query
    terms scan-side, so the (doc, term) shuffle carries only matching
    occurrences; df/N/avgdl are term- or scalar-sized and travel by
    broadcast join, never collect.
    """
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    base = (df.filter(F.length(F.trim(F.col(text_col))) > 0)
            .select(F.col(id_col), toks.alias("__w")))
    lens = base.select(F.col(id_col), F.size("__w").cast("long").alias("__len"))
    scalars = lens.agg(
        F.count("*").cast("long").alias("__n"),
        (F.sum("__len").cast("double") / F.count("*")).alias("__avgdl"))
    hits = (base.select(F.col(id_col), F.explode("__w").alias("__t"))
            .filter(F.col("__t").isin(list(terms))))
    tf = hits.groupBy(id_col, "__t").agg(F.count("*").cast("long").alias("__tf"))
    dfreq = tf.groupBy("__t").agg(F.count("*").cast("long").alias("__df"))
    scored = (tf.join(F.broadcast(dfreq), on="__t")
              .join(lens, on=id_col)
              .crossJoin(F.broadcast(scalars)))
    idf = F.round(F.log(
        (F.col("__n") - F.col("__df") + 0.5) / (F.col("__df") + 0.5) + 1.0), 6)
    denom = (F.col("__tf")
             + k1 * (1.0 - b + b * F.col("__len") / F.col("__avgdl")))
    term_score = F.round(idf * (F.col("__tf") * (k1 + 1.0)) / denom, 6)
    per_doc = (scored.select(F.col(id_col), term_score.alias("__s"))
               .groupBy(id_col)
               .agg(F.count("*").cast("long").alias("n_terms_hit"),
                    F.round(F.sum("__s"), 6).alias("bm25")))
    ids = df.select(id_col)
    return (ids.join(per_doc, on=id_col, how="left")
            .select(F.col(id_col),
                    F.coalesce("n_terms_hit", F.lit(0).cast("long"))
                     .alias("n_terms_hit"),
                    F.coalesce("bm25", F.lit(0.0)).alias("bm25")))


def dup_line_stats(df: DataFrame, *, text_col: str = "text",
                   id_col: str = "doc_id", sep: str = "\n") -> DataFrame:
    """Gopher duplicate-line signals WITHIN each document: fraction of
    lines (and of line characters) that are repeats of an earlier line
    in the same doc — the boilerplate gate that drops pages made of a
    repeated menu/footer.

    Returns ``(id, n_lines, n_dup_lines, dup_line_frac, dup_char_frac)``.
    Blank lines are ignored.  Two map-side-combined groupBys keyed on
    (doc, line) then (doc) — shuffle ∝ distinct lines per doc.
    """
    lines = (df.select(F.col(id_col),
                       F.explode(F.split(F.col(text_col), sep)).alias("line"))
             .filter(F.length(F.trim(F.col("line"))) > 0))
    g = lines.groupBy(id_col, "line").agg(F.count("*").alias("__cnt"))
    chars = F.length(F.col("line"))
    return g.groupBy(id_col).agg(
        F.sum("__cnt").cast("long").alias("n_lines"),
        F.sum(F.col("__cnt") - 1).cast("long").alias("n_dup_lines"),
        F.round(F.sum(F.col("__cnt") - 1).cast("double") / F.sum("__cnt"), 6)
         .alias("dup_line_frac"),
        F.round(F.sum((F.col("__cnt") - 1) * chars).cast("double")
                / F.sum(F.col("__cnt") * chars), 6).alias("dup_char_frac"))


def top_bigram_frac(df: DataFrame, *, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Top-2-gram repetition fraction per document (Gopher repetition
    rule: drop docs whose most frequent bigram covers too much of the
    text).  ``(id, n_bigrams, top_bigram_frac)``; docs with < 2 words
    produce no row.

    Same shuffle shape as :func:`repetition_signals` — explode +
    partial-agg on (doc, bigram); bigram construction is a Catalyst
    ``transform(sequence(...))`` in the scan stage.
    """
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    t = df.select(F.col(id_col), toks.alias("w")).filter(F.size("w") >= 2)
    bg = t.select(
        F.col(id_col),
        F.explode(F.expr(
            "transform(sequence(1, size(w) - 1),"
            " i -> concat(element_at(w, i), ' ', element_at(w, i + 1)))"
        )).alias("__bigram"),
    )
    c = bg.groupBy(id_col, "__bigram").agg(F.count("*").alias("__cnt"))
    return (
        c.groupBy(id_col)
        .agg(F.sum("__cnt").cast("long").alias("n_bigrams"),
             F.max("__cnt").cast("long").alias("__top"))
        .select(F.col(id_col), F.col("n_bigrams"),
                F.round(F.col("__top").cast("double") / F.col("n_bigrams"), 6)
                 .alias("top_bigram_frac"))
    )


def lm_cross_entropy(df: DataFrame, *, model_docs: DataFrame | None = None,
                     add_k: float = 1.0, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Bigram-LM cross-entropy per document — the CCNet quality signal
    (Wenzek et al. 2020, public: score crawl text with an LM trained on
    a clean corpus; low perplexity ⇒ fluent text).  The model is an
    add-k–smoothed bigram LM estimated from ``model_docs`` (default:
    ``df`` itself, the self-scoring demonstration):

        P(w2 | w1) = (c(w1 w2) + k) / (c(w1 ·) + k · V)

    with V the model's unigram vocabulary size.  Unseen w1 backs off to
    the uniform k/(kV) = 1/V floor via the same formula (c = 0).

    Returns ``(id, n_bigrams, cross_entropy)`` where ``cross_entropy``
    = −mean ln P over the doc's bigrams (nats; perplexity = e^H —
    monotone in it, so filters threshold H directly).  Docs with < 2
    tokens score 0 with n_bigrams 0.  Each per-bigram log term is
    snapped to INTEGER micro-nats before summing, so the aggregate is
    exact integer arithmetic — order-independent across engines and
    partitionings (a float sum of rounded doubles still differs in the
    last ULP between Spark's partial-agg order and DuckDB's, measured
    flipping the 6th decimal on 3/500 docs).

    Scale notes (100 TB): bigram fan-out is scan-stage; model counts
    are two map-side-combined groupBys (shuffle ∝ distinct bigrams);
    scoring joins the doc bigrams against the model keyed on the bigram
    string; V travels as a 1-row broadcast (the scale-safe alternative
    to collect()).  In the CCNet configuration model_docs is a small
    clean corpus, so both model sides broadcast outright.
    """
    model_docs = df if model_docs is None else model_docs

    def bigrams(frame, with_id):
        toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
        t = (frame.filter(F.length(F.trim(F.col(text_col))) > 0)
             .select(*( [F.col(id_col)] if with_id else [] ),
                     toks.alias("__w"))
             .filter(F.size("__w") >= 2))
        ex = F.explode(F.expr(
            "transform(sequence(1, size(__w) - 1),"
            " i -> struct(element_at(__w, i) AS w1,"
            "             element_at(__w, i + 1) AS w2))")).alias("__bg")
        cols = ([F.col(id_col)] if with_id else []) + [ex]
        return t.select(*cols).select(
            *( [id_col] if with_id else [] ),
            F.col("__bg.w1").alias("w1"), F.col("__bg.w2").alias("w2"))

    mb = bigrams(model_docs, with_id=False)
    c12 = mb.groupBy("w1", "w2").agg(F.count("*").cast("long").alias("__c12"))
    c1 = mb.groupBy("w1").agg(F.count("*").cast("long").alias("__c1"))
    vocab = (model_docs.filter(F.length(F.trim(F.col(text_col))) > 0)
             .select(F.explode(F.split(F.lower(F.trim(F.col(text_col))),
                                       r"\s+")).alias("__u"))
             .agg(F.countDistinct("__u").cast("long").alias("__v")))

    db = bigrams(df, with_id=True)
    scored = (db.join(c12, on=["w1", "w2"], how="left")
              .join(c1, on="w1", how="left")
              .crossJoin(F.broadcast(vocab)))
    k = float(add_k)
    logp_u = F.round(F.log(
        (F.coalesce("__c12", F.lit(0)) + F.lit(k))
        / (F.coalesce("__c1", F.lit(0)) + F.lit(k) * F.col("__v")))
        * 1e6).cast("long")
    per_doc = (scored.groupBy(id_col)
               .agg(F.count("*").cast("long").alias("n_bigrams"),
                    F.round(-F.sum(logp_u)
                            / (F.count("*") * F.lit(1e6)), 6)
                     .alias("cross_entropy")))
    ids = df.select(id_col)
    return (ids.join(per_doc, on=id_col, how="left")
            .select(F.col(id_col),
                    F.coalesce("n_bigrams", F.lit(0).cast("long"))
                     .alias("n_bigrams"),
                    F.coalesce("cross_entropy", F.lit(0.0))
                     .alias("cross_entropy")))


def kn_cross_entropy(df: DataFrame, *, model_docs: DataFrame | None = None,
                     discount_num: int = 3, discount_den: int = 4,
                     text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Interpolated Kneser–Ney bigram cross-entropy per document — the
    smoothing family the REAL CCNet filter uses (KenLM is modified KN;
    Kneser & Ney 1995, Chen & Goodman 1998), complementing
    :func:`lm_cross_entropy`'s add-k baseline:

        P(w2|w1) = max(c(w1 w2) − D, 0) / c(w1·)
                   + D·N1+(w1·)/c(w1·) · Pcont(w2)
        Pcont(w2) = (N1+(·w2) + 1) / (N1+(··) + V + 1)

    with D = ``discount_num/discount_den`` (default 0.75, the classic
    absolute discount), N1+(w1·) the distinct continuations of w1,
    N1+(·w2) the distinct histories of w2 (the "how many contexts has
    this word completed" continuation count that makes KN beat add-k on
    burst words), and N1+(··) the distinct-bigram total.  Pcont carries
    a +1/(V+1) floor so scoring text with OOV words stays total; an
    unseen HISTORY w1 backs off to Pcont entirely.

    Exactness contract (cross-engine): D enters as integers, so every
    ratio is one exactly-rounded IEEE division of exact int64 operands
    — (dd·c12 − dn)/(dd·c1) etc. — composed in a FIXED operation order
    mirrored literally by the oracle SQL; each ln is snapped to integer
    micro-nats before summing (the q86/PSI/JSD grid argument: last-ULP
    libm-vs-JVM differences cannot move a transcendental across a
    0.5e-6 boundary except on astronomically exact ties).

    Returns ``(id, n_bigrams, kn_cross_entropy)``; docs with < 2 tokens
    score 0.  Scale shape identical to lm_cross_entropy: scan-stage
    bigram fan-out, map-side-combined model counts (shuffle ∝ distinct
    bigrams), bigram-keyed scoring joins, 1-row broadcast totals.
    """
    model_docs = df if model_docs is None else model_docs
    dn, dd = int(discount_num), int(discount_den)
    if not 0 < dn < dd:
        raise ValueError("discount must satisfy 0 < D < 1")

    def bigrams(frame, with_id):
        toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
        t = (frame.filter(F.length(F.trim(F.col(text_col))) > 0)
             .select(*([F.col(id_col)] if with_id else []),
                     toks.alias("__w"))
             .filter(F.size("__w") >= 2))
        ex = F.explode(F.expr(
            "transform(sequence(1, size(__w) - 1),"
            " i -> struct(element_at(__w, i) AS w1,"
            "             element_at(__w, i + 1) AS w2))")).alias("__bg")
        cols = ([F.col(id_col)] if with_id else []) + [ex]
        return t.select(*cols).select(
            *([id_col] if with_id else []),
            F.col("__bg.w1").alias("w1"), F.col("__bg.w2").alias("w2"))

    mb = bigrams(model_docs, with_id=False)
    c12 = mb.groupBy("w1", "w2").agg(F.count("*").cast("long").alias("__c12"))
    hist = c12.groupBy("w1").agg(
        F.sum("__c12").cast("long").alias("__c1"),
        F.count("*").cast("long").alias("__n1f"))
    cont = c12.groupBy("w2").agg(F.count("*").cast("long").alias("__n1b"))
    tot = c12.agg(F.count("*").cast("long").alias("__nbb"))
    vocab = (model_docs.filter(F.length(F.trim(F.col(text_col))) > 0)
             .select(F.explode(F.split(F.lower(F.trim(F.col(text_col))),
                                       r"\s+")).alias("__u"))
             .agg(F.countDistinct("__u").cast("long").alias("__v")))

    db = bigrams(df, with_id=True)
    scored = (db.join(c12, on=["w1", "w2"], how="left")
              .join(hist, on="w1", how="left")
              .join(cont, on="w2", how="left")
              .crossJoin(F.broadcast(tot))
              .crossJoin(F.broadcast(vocab)))
    # operation order is LITERALLY mirrored by the oracle SQL — change
    # one side and the 6th decimal diverges on some doc
    pc = ((F.coalesce("__n1b", F.lit(0)) + F.lit(1)).cast("double")
          / (F.col("__nbb") + F.col("__v") + F.lit(1)).cast("double"))
    c1d = (F.col("__c1") * dd).cast("double")
    p_seen = (
        F.greatest(F.coalesce("__c12", F.lit(0)) * dd - F.lit(dn),
                   F.lit(0)).cast("double") / c1d
        + (F.col("__n1f") * dn).cast("double") / c1d * pc)
    p = F.when(F.col("__c1").isNull(), pc).otherwise(p_seen)
    lp_u = F.round(F.log(p) * 1e6).cast("long")
    per_doc = (scored.groupBy(id_col)
               .agg(F.count("*").cast("long").alias("n_bigrams"),
                    F.round(-F.sum(lp_u) / (F.count("*") * F.lit(1e6)), 6)
                     .alias("kn_cross_entropy")))
    ids = df.select(id_col)
    return (ids.join(per_doc, on=id_col, how="left")
            .select(F.col(id_col),
                    F.coalesce("n_bigrams", F.lit(0).cast("long"))
                     .alias("n_bigrams"),
                    F.coalesce("kn_cross_entropy", F.lit(0.0))
                     .alias("kn_cross_entropy")))


_SENT_ABBREV = ("mr", "mrs", "ms", "dr", "prof", "st", "vs", "etc",
                "jr", "sr", "approx", "dept", "fig")
_SENT_SENTINEL = "\uE000"   # private-use: protects abbreviation dots


def split_sentences(df: DataFrame, *, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """``(id, sent_idx, sentence)`` — rule-based sentence splitting,
    the preprocessing step under sentence-level dedup / filtering /
    pair-mining.  Deterministic rules (documented, not ML):

    * boundary = terminal punctuation ``[.!?]`` (optionally followed by
      a closing quote) + whitespace + an uppercase/digit/quote opener;
    * decimal numbers never split (no whitespace after the dot);
    * a fixed abbreviation list (Mr./Dr./etc./e.g./i.e., any case)
      never splits — their dots are sentinel-swapped before the split
      and restored after.

    Pure Catalyst: three regexp_replace + one split + posexplode, all
    scan-stage, embarrassingly parallel.
    """
    s = F.col(text_col)
    # e.g. / i.e. carry an internal dot — protect both dots first
    s = F.regexp_replace(
        s, r"(?i)\b([ei])\.(g|e)\.",
        f"$1{_SENT_SENTINEL}$2{_SENT_SENTINEL}")
    s = F.regexp_replace(
        s, r"(?i)\b(" + "|".join(_SENT_ABBREV) + r")\.",
        f"$1{_SENT_SENTINEL}")
    parts = F.split(s, r"(?<=[.!?][\"']?)\s+(?=[\"'A-Z0-9])")
    return (df
            .select(F.col(id_col),
                    F.posexplode(parts).alias("sent_idx", "__s"))
            .select(F.col(id_col), "sent_idx",
                    F.regexp_replace("__s", _SENT_SENTINEL, ".")
                    .alias("sentence"))
            .filter(F.length(F.trim("sentence")) > 0))


def pmi_pairs(docs: DataFrame, *, min_pair_docs: int = 5,
              text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Doc-level co-occurrence PMI (pointwise mutual information,
    Church & Hanks 1990, public) — the collocation statistic a corpus
    audit uses to find word pairs that travel together:

        pmi(w1, w2) = ln( n_both · N / (n_w1 · n_w2) )

    over BINARY per-document occurrence (N = docs with ≥1 word,
    n_w = docs containing w, n_both = docs containing both).  Only
    pairs appearing together in ≥ ``min_pair_docs`` docs are returned
    (w1 < w2, with counts) — the support floor is also what bounds the
    join output at scale.

    Scale notes (100 TB): distinct words per doc is scan-stage; the
    pair generation is a within-doc self-join keyed on the doc id —
    output ∝ Σ (distinct words per doc)², bounded by document length,
    never corpus²; marginals are one map-side-combined groupBy; N is a
    1-row broadcast.  All counts are exact integers; the single ln per
    pair is rounded once (no float summation anywhere).
    """
    words = (docs.filter(F.length(F.trim(F.col(text_col))) > 0)
             .select(F.col(id_col),
                     F.explode(F.array_distinct(F.split(
                         F.lower(F.trim(F.col(text_col))), r"\s+")))
                      .alias("w")))
    # N as a 1-row broadcast, not a driver-side count() — keeps the
    # query lazy/composable (same pattern as dsir/bm25/lm ops)
    n_docs = (words.select(id_col).distinct()
              .agg(F.count("*").cast("long").alias("__n")))
    marg = words.groupBy("w").agg(F.count("*").cast("long").alias("n_w"))
    a = words.select(F.col(id_col), F.col("w").alias("w1"))
    b = words.select(F.col(id_col), F.col("w").alias("w2"))
    pairs = (a.join(b, on=id_col)
             .filter(F.col("w1") < F.col("w2"))
             .groupBy("w1", "w2")
             .agg(F.count("*").cast("long").alias("n_both"))
             .filter(F.col("n_both") >= min_pair_docs))
    m1 = marg.select(F.col("w").alias("w1"), F.col("n_w").alias("n_w1"))
    m2 = marg.select(F.col("w").alias("w2"), F.col("n_w").alias("n_w2"))
    return (pairs.join(m1, on="w1").join(m2, on="w2")
            .crossJoin(F.broadcast(n_docs))
            .select("w1", "w2", "n_both", "n_w1", "n_w2",
                    F.round(F.log(F.col("n_both").cast("double")
                                  * F.col("__n")
                                  / (F.col("n_w1") * F.col("n_w2"))), 6)
                     .alias("pmi")))


def char_entropy(df: DataFrame, *, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """Character-level Shannon entropy per document (nats) — the
    classic repetition/quality signal: natural prose sits ~3–4.5 nats,
    keyboard mash and repeated boilerplate collapse toward 0, base64 /
    hex blobs push past prose.  Complements the word-level Gopher gates
    (``repetition_signals``) at the sub-token level.

    Exactness: H = ln N − (Σ c·ln c)/N is computed with each ln snapped
    to INTEGER micro-nats before the sum (same order-independence trick
    as ``lm_cross_entropy`` — float partial-agg order differs between
    engines), then one identical double division.  Characters are
    UTF-16 code units on the Spark side (the ``(?!^)`` split) vs
    codepoints in DuckDB — identical for BMP text, which all testdata
    is; astral-heavy corpora should count via the classify kernel.

    Scale: one scan-stage char explode (output ∝ corpus chars) into a
    map-side-combined (id, char) count, then an (id) rollup — the same
    two-shuffle shape as every token stat here.
    """
    chars = (df.filter(F.length(text_col) > 0)
             .select(F.col(id_col),
                     F.explode(F.split(F.col(text_col), r"(?!^)"))
                     .alias("__ch"))
             # Java split with limit -1 keeps one trailing "" (the
             # lookahead also matches at end-of-string) — drop it
             .filter(F.col("__ch") != ""))
    counts = (chars.groupBy(id_col, "__ch")
              .agg(F.count("*").cast("long").alias("__c")))
    unats = F.round(F.log("__c") * 1e6).cast("long")
    per = (counts.groupBy(id_col)
           .agg(F.sum("__c").cast("long").alias("n_chars"),
                F.count("*").cast("long").alias("distinct_chars"),
                F.sum(F.col("__c") * unats).cast("long").alias("__s")))
    n = F.col("n_chars")
    h = F.round((n * F.round(F.log(n) * 1e6).cast("long") - F.col("__s"))
                / (n * F.lit(1e6)), 6)
    out = per.select(id_col, "n_chars", "distinct_chars",
                     h.alias("entropy"))
    ids = df.select(id_col)
    return (ids.join(out, on=id_col, how="left")
            .select(F.col(id_col),
                    F.coalesce("n_chars", F.lit(0).cast("long"))
                     .alias("n_chars"),
                    F.coalesce("distinct_chars", F.lit(0).cast("long"))
                     .alias("distinct_chars"),
                    F.coalesce("entropy", F.lit(0.0)).alias("entropy")))


def compression_signals(df: DataFrame, *, text_col: str = "text",
                        level: int = 6) -> DataFrame:
    """zlib compressibility per document: ``deflate_len`` and
    ``compression_ratio`` = deflate_len / raw utf-8 bytes.  Highly
    repetitive pages (templated spam, keyword stuffing) compress far
    below prose (~0.3 vs ~0.6); near-random blobs exceed 1.  A standard
    web-pipeline quality gate alongside the Gopher fractions.

    The per-batch loop calls only C zlib (the normalize.py precedent) —
    no Python bytecode per row beyond the call.  No SQL oracle exists
    (DuckDB has no deflate), so the registry entry is rows-only and the
    quantitative contract lives in pytest against an independent
    reference implementation.
    """
    import zlib

    from pyspark.sql.functions import pandas_udf

    lvl = int(level)

    @pandas_udf("long")
    def _zlen(s: pd.Series) -> pd.Series:
        return pd.Series(
            [None if v is None
             else len(zlib.compress(v.encode("utf-8"), lvl))
             for v in s], dtype="Int64", index=s.index)

    raw = F.octet_length(F.col(text_col)).cast("long")
    zl = _zlen(F.col(text_col))
    return (df.withColumn("deflate_len", zl)
            .withColumn("compression_ratio",
                        F.when(raw > 0, F.round(zl / raw, 6))))


def readability_signals(df: DataFrame, *, text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """Flesch reading-ease + Flesch–Kincaid grade per document — the
    classic curriculum/quality band signal (training-data mixes often
    bucket by readability).  Syllables use the standard vowel-group
    heuristic: count of [aeiouy]+ runs in the lowercased letters-only
    token, minus one silent final 'e' (kept when the word ends in
    'le'), floored at 1.

    Pure Catalyst (split + higher-order functions), zero shuffles, and
    every count is an exact integer the DuckDB oracle reproduces; the
    two float ratios are single identical-operand double divisions
    rounded after the fact (registry parity rule).  Sentence count is
    ``max(1, runs of [.!?])``.
    """
    letters = F.transform(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
        lambda t: F.regexp_replace(t, "[^a-z]", ""))
    words = F.filter(letters, lambda w: w != "")

    def syl(w):
        g = F.size(F.regexp_extract_all(w, F.lit("[aeiouy]+"), 0))
        silent = F.when((g > 1) & w.endswith("e") & ~w.endswith("le"),
                        F.lit(1)).otherwise(F.lit(0))
        return F.greatest(F.lit(1), g - silent)

    n_words = F.size(words).cast("long")
    n_syll = F.aggregate(words, F.lit(0).cast("long"),
                         lambda acc, w: acc + syl(w))
    n_sents = F.greatest(
        F.lit(1),
        F.size(F.regexp_extract_all(F.col(text_col),
                                    F.lit("[.!?]+"), 0))).cast("long")
    wps = n_words.cast("double") / n_sents
    spw = n_syll.cast("double") / n_words
    return df.select(
        F.col(id_col),
        n_sents.alias("n_sents"),
        n_words.alias("n_words"),
        F.coalesce(n_syll, F.lit(0)).cast("long").alias("n_syllables"),
        F.when(n_words > 0,
               F.round(F.lit(206.835) - F.lit(1.015) * wps
                       - F.lit(84.6) * spw, 6)).alias("flesch"),
        F.when(n_words > 0,
               F.round(F.lit(0.39) * wps + F.lit(11.8) * spw
                       - F.lit(15.59), 6)).alias("fk_grade"))


def luhn_valid(col) -> Column:
    """True iff the digit string passes the Luhn mod-10 checksum (ISO/
    IEC 7812) — the check that separates real card numbers from random
    digit runs, cutting the PAN-redaction false-positive rate that a
    bare ``\\d{13,19}`` regex suffers.  Pure Catalyst: one aggregate
    over the reversed digit positions, doubling every second digit and
    folding >9 back with −9."""
    c = F.col(col) if isinstance(col, str) else col
    rev = F.reverse(c)
    total = F.aggregate(
        F.sequence(F.lit(1), F.length(rev)),
        F.lit(0),
        lambda acc, i: acc + F.when(
            i % 2 == 0,
            F.when(F.substring(rev, i, 1).cast("int") * 2 > 9,
                   F.substring(rev, i, 1).cast("int") * 2 - 9)
            .otherwise(F.substring(rev, i, 1).cast("int") * 2))
            .otherwise(F.substring(rev, i, 1).cast("int")))
    return (F.length(c) >= 13) & (F.length(c) <= 19) & (total % 10 == 0)


def card_numbers(df: DataFrame, *, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """Checksum-verified payment-card detection: explode every 13-19
    digit run (allowing space/dash separators inside), strip the
    separators, keep only runs that PASS Luhn — each output row is
    ``(id, pan, luhn_ok=true)`` ready for redaction joins.  The digit
    run must not touch adjacent digits (guarded by the non-digit
    boundaries), so timestamps inside longer numbers don't alias.
    Scan-stage regex + one aggregate per candidate; candidates ∝
    digit runs, never corpus-sized shuffles."""
    runs = F.regexp_extract_all(
        F.col(text_col), F.lit(r"(?:^|[^0-9])([0-9][0-9 -]{11,21}[0-9])(?:[^0-9]|$)"), 1)
    out = (df.select(F.col(id_col), F.explode(runs).alias("__run"))
           .withColumn("pan", F.regexp_replace("__run", "[ -]", ""))
           .filter(F.col("pan").rlike("^[0-9]{13,19}$"))
           .filter(luhn_valid("pan"))
           .select(id_col, "pan"))
    return out.distinct()


def sb_trigram_scores(df: DataFrame, *, model_docs: DataFrame | None = None,
                      alpha: float = 0.4, text_col: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """Trigram Stupid-Backoff LM scoring (Brants et al. 2007 — "Large
    Language Models in Machine Translation", the web-scale LM that
    skips normalization entirely because at corpus size backoff weight
    precision stops mattering):

        S(w3|w1w2) = c(w1w2w3)/c(w1w2)             if the trigram is seen
                   = α · c(w2w3)/c(w2)             else if the bigram is
                   = α² · max(c(w3),1)/N           else (unigram floor;
                                                    OOV clamps to 1/N)

    Returns ``(id, n_trigrams, sb_cross_entropy)``: −mean ln S in nats,
    each term snapped to integer micro-nats pre-sum (the same
    order-independence idiom as ``lm_cross_entropy``; the ln argument
    is assembled identically in the oracle so the double is
    bit-identical before rounding).  Docs with < 3 tokens score 0.

    Scale: count tables are map-side-combined groupBys (shuffle ∝
    distinct n-grams); scoring is three left joins on n-gram keys plus
    a 1-row broadcast N.  In the production configuration the model
    corpus is small and clean — every model side broadcasts.
    """
    model_docs = df if model_docs is None else model_docs

    def toks(frame):
        return (frame.filter(F.length(F.trim(F.col(text_col))) > 0)
                .select(F.col(id_col),
                        F.split(F.lower(F.trim(F.col(text_col))),
                                r"\s+").alias("__w")))

    def trigrams(frame):
        t = toks(frame).filter(F.size("__w") >= 3)
        ex = F.explode(F.expr(
            "transform(sequence(1, size(__w) - 2),"
            " i -> struct(element_at(__w, i) AS w1,"
            "             element_at(__w, i + 1) AS w2,"
            "             element_at(__w, i + 2) AS w3))")).alias("__tg")
        return (t.select(F.col(id_col), ex)
                .select(id_col, "__tg.w1", "__tg.w2", "__tg.w3"))

    mt = trigrams(model_docs).drop(id_col)
    c123 = mt.groupBy("w1", "w2", "w3").agg(
        F.count("*").cast("long").alias("__c123"))
    c12 = mt.groupBy("w1", "w2").agg(
        F.count("*").cast("long").alias("__c12"))
    mu = (toks(model_docs)
          .select(F.explode("__w").alias("__u")))
    c23 = mt.groupBy("w2", "w3").agg(
        F.count("*").cast("long").alias("__c23"))
    c2 = mt.groupBy("w2").agg(F.count("*").cast("long").alias("__c2"))
    c3 = mu.groupBy(F.col("__u").alias("w3")).agg(
        F.count("*").cast("long").alias("__c3"))
    ntot = mu.agg(F.count("*").cast("long").alias("__n"))

    dt = trigrams(df)
    scored = (dt.join(c123, ["w1", "w2", "w3"], "left")
              .join(c12, ["w1", "w2"], "left")
              .join(c23, ["w2", "w3"], "left")
              .join(c2, ["w2"], "left")
              .join(c3, ["w3"], "left")
              .crossJoin(F.broadcast(ntot)))
    a = float(alpha)
    ln_s = F.when(
        F.coalesce("__c123", F.lit(0)) > 0,
        F.log(F.col("__c123").cast("double") / F.col("__c12"))
    ).when(
        F.coalesce("__c23", F.lit(0)) > 0,
        F.log(F.lit(a) * (F.col("__c23").cast("double") / F.col("__c2")))
    ).otherwise(
        F.log(F.lit(a * a)
              * (F.greatest(F.coalesce("__c3", F.lit(0)), F.lit(1))
                 .cast("double") / F.col("__n"))))
    lp_u = F.round(ln_s * 1e6).cast("long")
    per = (scored.groupBy(id_col)
           .agg(F.count("*").cast("long").alias("n_trigrams"),
                F.round(-F.sum(lp_u) / (F.count("*") * F.lit(1e6)), 6)
                 .alias("sb_cross_entropy")))
    ids = df.select(id_col)
    return (ids.join(per, id_col, "left")
            .select(F.col(id_col),
                    F.coalesce("n_trigrams", F.lit(0).cast("long"))
                     .alias("n_trigrams"),
                    F.coalesce("sb_cross_entropy", F.lit(0.0))
                     .alias("sb_cross_entropy")))


def lang_segments(df: DataFrame, *, chunk_tokens: int = 10,
                  text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Language-run segmentation of mixed-language documents (the
    CCNet/mC4 per-paragraph langID step, over fixed token windows since
    the corpus carries no paragraph marks): chunk the token stream into
    ``chunk_tokens``-sized windows, predict each chunk's language with
    the stopword-argmax model, then collapse consecutive same-language
    chunks into segments with the gaps-and-islands trick
    (``chunk_idx − row_number() over (doc, lang)`` is constant exactly
    on a run).

    Returns ``(doc_id, lang, seg_start, seg_end, n_chunks)`` — one row
    per maximal same-language run of chunks.

    Scale notes: chunking and scoring are per-row scan-stage array
    expressions; the islands window and the run groupBy both hash on
    ``doc_id`` — one exchange, reused across both steps.
    """
    c = F.col(text_col)
    toks = F.split(F.lower(F.trim(c)), r"\s+")
    n_chunks = F.ceil(F.size("__w") / F.lit(float(chunk_tokens))).cast("int")
    d = (df.filter(F.length(F.trim(c)) > 0)
         .select(F.col(id_col).alias("doc_id"), toks.alias("__w"))
         .select("doc_id",
                 F.posexplode(F.transform(
                     F.sequence(F.lit(0), n_chunks - 1),
                     lambda ci: F.concat_ws(" ", F.slice(
                         F.col("__w"), ci * chunk_tokens + 1, chunk_tokens))))
                 .alias("chunk_idx", "__chunk")))
    from pyspark.sql import Window

    scored = d.withColumn("lang", predict_lang(F.col("__chunk")))
    wl = Window.partitionBy("doc_id", "lang").orderBy("chunk_idx")
    seg = scored.withColumn(
        "__grp", F.col("chunk_idx") - F.row_number().over(wl))
    return (seg.groupBy("doc_id", "lang", "__grp")
            .agg(F.min("chunk_idx").alias("seg_start"),
                 F.max("chunk_idx").alias("seg_end"),
                 F.count("*").cast("long").alias("n_chunks"))
            .select("doc_id", "lang", "seg_start", "seg_end", "n_chunks"))


def heaps_fit(docs: DataFrame, *, id_col: str = "doc_id",
              text_col: str = "text") -> DataFrame:
    """Heaps'-law fit V(n) ≈ K·n^β of vocabulary growth — the
    capacity-planning number for every vocabulary-route operator
    (stemmer, WordPiece, postings dictionary): how fast does the
    distinct-token count grow as the corpus grows?

    Growth points are computed WITHOUT per-prefix rescans: a token's
    first document is min(doc_id) over its occurrences, so the
    cumulative vocabulary after doc d is the running sum of new-token
    counts — one groupBy(token) for first-docs, one groupBy(doc) for
    per-doc token/new-token counts, two cumulative windows over the
    doc order.  β comes from log-log OLS over the (n_d, v_d) points
    with the corpus convention for cross-engine exactness: each ln is
    snapped to integer micro-nats BEFORE summing (q86's argument —
    order-independent integer sums of per-point exactly-rounded IEEE
    values), and β is ONE double division of two exact int64s at the
    end.  Returns one row: n_points, the exact integer sufficient
    statistics (sum_x/sum_y/sum_xx/sum_xy in µ-nats), and beta.

    Scale: shuffles are (token) and (doc) partial-agg keys; the window
    runs over the per-DOC frame (one row per document, not per token).
    """
    from pyspark.sql import Window

    toks = (docs.filter(F.length(F.trim(text_col)) > 0)
            .select(F.col(id_col).alias("d"),
                    F.explode(F.split(F.lower(F.trim(F.col(text_col))),
                                      r"\s+")).alias("token")))
    per_tok = toks.groupBy("token").agg(
        F.min("d").alias("first_d"), F.count("*").alias("cf"))
    new_per_doc = per_tok.groupBy(F.col("first_d").alias("d")).agg(
        F.count("*").alias("new_toks"))
    cnt_per_doc = toks.groupBy("d").agg(F.count("*").alias("n_toks"))
    per_doc = (cnt_per_doc.join(new_per_doc, "d", "left")
               .withColumn("new_toks",
                           F.coalesce("new_toks", F.lit(0))))
    # cumulative (n_d, v_d) WITHOUT a global single-partition window:
    # the two-phase distributed prefix sum (pack_sequences pattern) —
    # contiguous doc-id range buckets (order-preserving), cumsum within
    # each, tiny exclusive cumsum of bucket totals broadcast back.  The
    # oracle replays the SAME integers with a plain window — equal by
    # construction, different mechanism.
    mx = per_doc.agg(F.max("d").alias("__mx"))
    span = F.expr("__mx div 64") + 1
    pd2 = (per_doc.crossJoin(F.broadcast(mx))
           .withColumn("__b", F.expr("d div (__mx div 64 + 1)")
                       .cast("int")))
    w_in = (Window.partitionBy("__b").orderBy("d")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    pd2 = (pd2.withColumn("__n_in", F.sum("n_toks").over(w_in))
           .withColumn("__v_in", F.sum("new_toks").over(w_in)))
    btot = pd2.groupBy("__b").agg(F.sum("n_toks").alias("__bn"),
                                  F.sum("new_toks").alias("__bv"))
    w_b = (Window.orderBy("__b")
           .rowsBetween(Window.unboundedPreceding, -1))
    boff = btot.select(
        "__b",
        F.coalesce(F.sum("__bn").over(w_b), F.lit(0)).alias("__on"),
        F.coalesce(F.sum("__bv").over(w_b), F.lit(0)).alias("__ov"))
    pts = (pd2.join(F.broadcast(boff), "__b")
           .withColumn("n", F.col("__on") + F.col("__n_in"))
           .withColumn("v", F.col("__ov") + F.col("__v_in")))
    x = F.round(F.log(F.col("n").cast("double")) * 1e6).cast("long")
    y = F.round(F.log(F.col("v").cast("double")) * 1e6).cast("long")
    pts = pts.select(x.alias("x"), y.alias("y"))
    agg = pts.agg(
        F.count("*").cast("long").alias("n_points"),
        F.sum("x").cast("long").alias("sum_x"),
        F.sum("y").cast("long").alias("sum_y"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sum_xx"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sum_xy"))
    # the OLS numerator/denominator cross n_points with the µ-nat sums
    # — past int64 (observed overflow at 500 docs) — so they go through
    # DECIMAL(38,0) (DuckDB: HUGEINT) before ONE double division
    d38 = lambda c: F.col(c).cast("decimal(38,0)")
    beta = F.round(
        (d38("n_points") * d38("sum_xy")
         - d38("sum_x") * d38("sum_y")).cast("double")
        / (d38("n_points") * d38("sum_xx")
           - d38("sum_x") * d38("sum_x")).cast("double"), 6)
    return agg.withColumn("beta", beta)


def lexical_diversity(docs: DataFrame, *, text_col: str = "text") -> DataFrame:
    """Corpus-level lexical-diversity / vocabulary-coverage report from
    exact integer sufficient statistics — the capacity numbers that
    tell a pipeline how much vocabulary it has NOT yet seen:

    * ``n_tokens`` N, ``n_types`` V, ``v1``/``v2`` hapax and dis
      legomena counts (types occurring exactly once / twice);
    * ``p0_unseen`` = V₁/N — Good–Turing's estimate of the probability
      mass of unseen types (the leave-one-out identity: singletons
      stand proxy for the not-yet-observed);
    * ``chao1`` = V + V₁·(V₁−1)/(2·(V₂+1)) — the bias-corrected Chao1
      lower bound on true vocabulary size (finite even when V₂ = 0);
    * ``simpson_micro`` = 10⁶·Σf(f−1)/(N(N−1)) — repeat-draw
      collision probability (Simpson's λ), exact integers until one
      division;
    * ``yule_k_micro`` = 10⁴·10⁶·(Σf² − N)/N² — Yule's
      characteristic K, the classic repeat-rate constant.

    Everything reduces to the counts-of-counts frame: one (token)
    partial-agg exchange for frequencies, one (frequency) partial agg
    for N_r — both map-side combined; Σf² for 10^12 tokens needs more
    than int64 (f ≤ N ~ 2^40 → f² ~ 2^80), so the moment sums
    accumulate in DECIMAL(38,0) and the divisions happen as fixed-
    order doubles at the very end.
    """
    toks = (docs.filter(F.length(F.trim(text_col)) > 0)
            .select(F.explode(F.split(F.lower(F.trim(F.col(text_col))),
                                      r"\s+")).alias("token")))
    freq = toks.groupBy("token").agg(F.count("*").alias("f"))
    d38 = F.col("f").cast("decimal(38,0)")
    agg = freq.agg(
        F.sum("f").cast("long").alias("n_tokens"),
        F.count("*").cast("long").alias("n_types"),
        F.sum(F.when(F.col("f") == 1, 1).otherwise(0)).cast("long")
        .alias("v1"),
        F.sum(F.when(F.col("f") == 2, 1).otherwise(0)).cast("long")
        .alias("v2"),
        F.sum(d38 * (d38 - 1)).cast("decimal(38,0)").alias("__sff1"),
        F.sum(d38 * d38).cast("decimal(38,0)").alias("__sff"))
    n = F.col("n_tokens").cast("double")
    return agg.select(
        "n_tokens", "n_types", "v1", "v2",
        F.round(F.col("v1").cast("double") / n, 6).alias("p0_unseen"),
        F.round(F.col("n_types").cast("double")
                + F.col("v1").cast("double")
                * (F.col("v1") - 1).cast("double")
                / (2.0 * (F.col("v2") + 1).cast("double")), 6)
        .alias("chao1"),
        F.round(F.col("__sff1").cast("double")
                / (n * (n - 1.0)) * 1e6, 6).alias("simpson_micro"),
        F.round((F.col("__sff").cast("double") - n)
                / (n * n) * 1e10, 6).alias("yule_k_micro"))


def textrank_keywords(docs: DataFrame, *, text_col: str = "text",
                      window: int = 2, iters: int = 3,
                      damping_pct: int = 85) -> DataFrame:
    """TextRank keyword scores (Mihalcea & Tarau 2004): PageRank over
    the word co-occurrence graph — two tokens are linked when they
    co-occur within ``window`` positions, and a token's importance is
    its stationary weight under the random surfer, the classic
    unsupervised keyword extractor (frequency alone over-ranks
    boilerplate words that co-occur with nothing new; TextRank rewards
    tokens that connect many DISTINCT contexts).

    Graph construction is SCAN-STAGE: for each offset δ < window the
    (token, token+δ) pairs come from ``zip_with`` over two slices of
    the token array — no self-join, no positional explode; the only
    shuffles are the pair ``distinct()`` and the joins inside the
    exact-integer ``pagerank`` power iteration (micro-unit ranks,
    floor division — bit-identical across engines and partitionings,
    reused verbatim from the link-graph operator).  The co-occurrence
    graph is undirected: each distinct pair contributes both
    directions; self-pairs (a word adjacent to itself) are dropped.

    Output: (token, rank_micro) for every token in the corpus
    vocabulary — top-k / thresholding is the caller's one extra line.
    """
    from ultraviolet_spark.operators.graph import pagerank

    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    base = (docs.filter(F.col(text_col).isNotNull()
                        & (F.trim(F.col(text_col)) != ""))
            .select(toks.alias("__w")))
    parts = []
    for d in range(1, int(window)):
        n = F.size("__w") - F.lit(d)
        zipped = F.when(
            n > 0,
            F.zip_with(F.slice("__w", 1, n),
                       F.slice("__w", F.lit(d + 1), n),
                       lambda x, y: F.struct(x.alias("a"), y.alias("b"))
                       )).otherwise(F.array())
        parts.append(base.select(F.explode(zipped).alias("p"))
                     .select(F.col("p.a").alias("x"),
                             F.col("p.b").alias("y")))
    pairs = parts[0]
    for extra in parts[1:]:
        pairs = pairs.union(extra)
    pairs = pairs.filter(F.col("x") != F.col("y"))
    edges = (pairs.select(F.col("x").alias("src"), F.col("y").alias("dst"))
             .union(pairs.select(F.col("y").alias("src"),
                                 F.col("x").alias("dst")))
             .distinct())
    pr = pagerank(edges, iters=int(iters), damping_pct=int(damping_pct))
    return pr.select(F.col("node").alias("token"), "rank_micro")


def vocab_richness(docs: DataFrame, *, text_col: str = "text") -> DataFrame:
    """Vocabulary richness / unseen-mass estimators — the "how much
    vocabulary have we NOT crawled yet" companions of Heaps' law
    (q251 fits growth observed so far; these estimate the asymptote
    and the probability mass of unseen types from the frequency-of-
    frequencies tail):

    * Chao1 richness:  V̂ = V + f₁²/(2·f₂)  (f₁ singletons, f₂
      doubletons — the classic abundance-based lower bound; f₂ = 0
      falls back to the bias-corrected f₁(f₁−1)/2 form, documented);
    * Good–Turing unseen mass:  P₀ = f₁/N — the probability the NEXT
      token is a new type, the number smoothing methods (Kneser–Ney,
      q235) are built around.

    Exactness: V, N, f₁, f₂ are exact integer counts off two
    map-side-combined aggs (token counts → frequency-of-frequency
    counts); both estimates are single fixed-order double divisions.
    Empty corpus → NULL estimates.  Scale: one token shuffle + one
    ≤N-distinct-count-frame agg (the skew_report pigeonhole: the
    frequency-of-frequencies frame is ≤ √(2N) rows).

    Output one row: (v_obs, n_tokens, f1, f2, chao1, gt_p0).
    """
    nz = lambda den: F.when(den != 0, den)  # noqa: E731
    toks = F.filter(F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
                    lambda t: t != "")
    freq = (docs.filter(F.length(F.trim(F.col(text_col))) > 0)
            .select(F.explode(toks).alias("__t"))
            .groupBy("__t").agg(F.count("*").cast("long").alias("__f")))
    agg = freq.agg(
        F.count("*").cast("long").alias("v_obs"),
        F.sum("__f").cast("long").alias("n_tokens"),
        F.sum(F.when(F.col("__f") == 1, 1).otherwise(0)).cast("long")
        .alias("f1"),
        F.sum(F.when(F.col("__f") == 2, 1).otherwise(0)).cast("long")
        .alias("f2"))
    f1d = F.col("f1").cast("double")
    chao = F.when(
        F.col("f2") > 0,
        F.col("v_obs").cast("double")
        + f1d * f1d / nz(2 * F.col("f2").cast("double"))) \
        .otherwise(F.col("v_obs").cast("double")
                   + f1d * (f1d - 1) / F.lit(2.0))
    gt = F.when(F.col("n_tokens") > 0,
                F.round(f1d / nz(F.col("n_tokens").cast("double")), 6))
    return agg.select(
        "v_obs", "n_tokens", "f1", "f2",
        F.when(F.col("v_obs") > 0, F.round(chao, 6)).alias("chao1"),
        gt.alias("gt_p0"))
