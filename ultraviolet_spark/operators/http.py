"""HTTP response-record parsing — the layer between a WARC ``response``
record's payload and the pages table's ``html`` column: Common Crawl
response records carry the raw HTTP message (status line + headers +
body), and the body split / status / content-type drive charset
sniffing (operators.charset), MIME lie detection (operators.mime) and
fetch-quality filtering.

Pure Catalyst: the payload crosses into string space through the
engine's standard latin-1 bijection (ISO-8859-1 maps byte k ↔ U+00k,
so positions and round-trips are byte-exact — same idiom as
sources/warc.py), headers are located with one instr() for the
CRLFCRLF boundary, fields with RE2∩Java-safe regexes, and the body
re-encodes to binary losslessly.  Zero shuffles, zero Python — the
operator pipelines inside the scan stage at any corpus size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _header_field(headers: Column, name: str) -> Column:
    """Case-insensitive single-valued header extract (first match),
    value trimmed of optional whitespace; NULL when absent."""
    pat = f"(?i)(?:^|\r\n){name}:[ \t]*([^\r\n]*)"
    v = F.regexp_extract(headers, pat, 1)
    return F.when(v != "", F.trim(v))


def parse_http_date(col: Column | str) -> Column:
    """Parse an HTTP-date header value (RFC 9110 §5.6.7) — any of the
    three wire formats — into a UTC timestamp, NULL for junk:

    * IMF-fixdate  ``Sun, 06 Nov 1994 08:49:37 GMT``  (the only format
      senders may produce)
    * RFC 850      ``Sunday, 06-Nov-94 08:49:37 GMT`` (obsolete, still
      crawled)
    * asctime()    ``Sun Nov  6 08:49:37 1994``        (obsolete; day
      is space-padded)

    All three are regexp-rewritten to one canonical ``dd MMM yyyy
    HH:mm:ss`` string first and parsed once: Spark's Proleptic parser
    rejects the day-of-week letter ``E`` in *parse* patterns, and the
    day name is redundant anyway, so it is stripped rather than
    verified.  RFC 850's two-digit year uses the fixed pivot
    ``yy < 70 → 20yy else 19yy`` (the practical reading of RFC 9110's
    "more than 50 years in the future MUST be interpreted as past");
    the pivot lives HERE, not in the format pattern, so it cannot
    drift with a JVM default.  Pure Catalyst, scan-stage only.
    """
    s = F.trim(F.col(col) if isinstance(col, str) else col)
    # IMF-fixdate → canonical
    imf = F.regexp_extract(
        s, r"^[A-Za-z]{3}, ([0-9]{2} [A-Za-z]{3} [0-9]{4} "
           r"[0-9]{2}:[0-9]{2}:[0-9]{2}) GMT$", 1)
    # RFC 850 → pieces (century fix applied below)
    r850 = r"^[A-Za-z]{3,9}, ([0-9]{2})-([A-Za-z]{3})-([0-9]{2}) " \
           r"([0-9]{2}:[0-9]{2}:[0-9]{2}) GMT$"
    yy = F.regexp_extract(s, r850, 3)
    r850_canon = F.when(
        F.regexp_extract(s, r850, 1) != "",
        F.concat(F.regexp_extract(s, r850, 1), F.lit(" "),
                 F.regexp_extract(s, r850, 2), F.lit(" "),
                 F.when(yy.cast("int") < 70, F.lit("20"))
                 .otherwise(F.lit("19")), yy, F.lit(" "),
                 F.regexp_extract(s, r850, 4)))
    # asctime → pieces (day may be space- or zero-padded; normalize)
    asc = r"^[A-Za-z]{3} ([A-Za-z]{3}) +([0-9]{1,2}) " \
          r"([0-9]{2}:[0-9]{2}:[0-9]{2}) ([0-9]{4})$"
    asc_canon = F.when(
        F.regexp_extract(s, asc, 1) != "",
        F.concat(F.lpad(F.regexp_extract(s, asc, 2), 2, "0"), F.lit(" "),
                 F.regexp_extract(s, asc, 1), F.lit(" "),
                 F.regexp_extract(s, asc, 4), F.lit(" "),
                 F.regexp_extract(s, asc, 3)))
    canon = F.coalesce(F.when(imf != "", imf), r850_canon, asc_canon)
    return F.try_to_timestamp(canon, F.lit("dd MMM yyyy HH:mm:ss"))


def heuristic_freshness(df: DataFrame, *, date_col: str = "date",
                        lm_col: str = "last_modified",
                        fraction_pct: int = 10) -> DataFrame:
    """RFC 9111 §4.2.2 heuristic freshness: with no explicit expiry, a
    cache may treat a response as fresh for ``fraction_pct`` % of the
    time since Last-Modified.  ``freshness_secs`` is computed in exact
    integer arithmetic — microsecond delta, integer-divided — so the
    number is bit-identical cross-engine (a double multiply by 0.1
    would not be); NULL when either timestamp is missing or the delta
    is negative (clock skew → no heuristic, per the SHOULD in the RFC).
    """
    delta_us = (F.unix_micros(F.col(date_col))
                - F.unix_micros(F.col(lm_col)))
    # integer `div`, never a double multiply: exact cross-engine
    secs = F.expr(
        f"(unix_micros({date_col}) - unix_micros({lm_col})) "
        f"* {int(fraction_pct)} div 100000000")
    return df.withColumn(
        "freshness_secs",
        F.when(delta_us >= 0, secs).cast("long"))


def dechunk(df: DataFrame, *, body_col: str = "body",
            max_chunks: int = 64) -> DataFrame:
    """Decode HTTP/1.1 chunked transfer coding (RFC 9112 §7.1) —
    ``size-hex[;ext]CRLF data CRLF`` repeated until a ``0`` last-chunk —
    into ``body_text:string`` (latin-1 space), ``n_chunks:int`` and
    ``chunked_ok:boolean``.

    Pure Catalyst: one ``aggregate()`` fold over ``sequence(1,
    max_chunks)`` carrying ``(pos, acc, n, done, ok)``; each step reads
    the size line with ``locate`` (NOT a CRLF split — chunk *data* may
    itself contain CRLF, which a split-based parse silently corrupts),
    parses the hex size with ``conv``, slices exactly ``size`` bytes and
    verifies the trailing CRLF.  Chunk extensions are skipped, trailers
    ignored (the fold stops at the last-chunk).  Malformed or truncated
    payloads and payloads with more than ``max_chunks`` chunks yield
    ``chunked_ok = false`` and a NULL body instead of a task failure —
    the bound keeps the expression finite for codegen; real crawl
    responses beyond it are flagged, not mis-decoded.  Zero shuffles,
    zero Python: the decode pipelines inside the scan stage.
    """
    s = f"decode({body_col}, 'ISO-8859-1')"
    # One chunk step.  x: struct(pos INT, acc STRING, n INT, done
    # BOOLEAN, ok BOOLEAN).  The size-line hex is capped at 7 digits
    # (≤ 0xFFFFFFF) so a hostile size claim can never overflow the
    # ANSI int cast — a longer run simply fails the regex and flags
    # the payload malformed.  ``c`` below = CRLF position of the size
    # line; ``sz`` = parsed chunk size (repeated subexpressions are
    # spelled out — SQL lambdas have no let-binding).
    c = f"locate('\\r\\n', {s}, x.pos)"
    hexs = (f"regexp_extract(substring({s}, x.pos, {c} - x.pos), "
            f"'^([0-9a-fA-F]{{1,7}})(;.*)?$', 1)")
    sz = f"cast(conv({hexs}, 16, 10) as int)"
    fail = ("named_struct('pos', x.pos, 'acc', x.acc, 'n', x.n, "
            "'done', true, 'ok', false)")
    step = f"""(x, i) -> CASE WHEN x.done THEN x
      WHEN {c} = 0 OR {hexs} = '' THEN {fail}
      WHEN {sz} = 0 THEN named_struct('pos', x.pos, 'acc', x.acc,
           'n', x.n, 'done', true, 'ok', true)
      WHEN substring({s}, {c} + 2 + {sz}, 2) != '\\r\\n' THEN {fail}
      ELSE named_struct(
        'pos', {c} + 4 + {sz},
        'acc', concat(x.acc, substring({s}, {c} + 2, {sz})),
        'n', x.n + 1, 'done', false, 'ok', false)
      END"""
    fold = (f"aggregate(sequence(1, {int(max_chunks)}), "
            f"named_struct('pos', 1, 'acc', '', "
            f"'n', 0, 'done', false, 'ok', false), {step}, "
            f"x -> named_struct('body', CASE WHEN x.ok THEN x.acc END, "
            f"'n', CASE WHEN x.ok THEN x.n END, 'ok', x.ok))")
    out = df.withColumn("_dechunk", F.expr(fold))
    return (out
            .withColumn("body_text", F.col("_dechunk.body"))
            .withColumn("n_chunks", F.col("_dechunk.n"))
            .withColumn("chunked_ok", F.col("_dechunk.ok"))
            .drop("_dechunk"))


def split_http_response(df: DataFrame, *, payload_col: str = "payload",
                        keep_headers: bool = True) -> DataFrame:
    """Parse raw HTTP response bytes into
    ``status:int, http_version:string, content_type:string,
    charset_label:string, content_length:long, body:binary`` (+
    ``headers:string`` when ``keep_headers``).

    Split rule: headers end at the first CRLFCRLF; a payload without
    one (truncated capture — common in real crawls) yields NULL status
    and a NULL body rather than a task failure.  ``charset_label`` is
    the (lowercased) charset parameter of Content-Type, feeding
    ``operators.charset.with_charset`` precedence; ``content_length``
    is the header's claim, NOT the actual body size — compare with
    ``octet_length(body)`` to detect truncation.
    """
    s = F.decode(F.col(payload_col), "ISO-8859-1")
    sep = F.instr(s, "\r\n\r\n")                     # 1-based; 0 = absent
    has = sep > 0
    headers = F.when(has, F.substring(s, F.lit(1), sep - 1))
    body_str = F.when(has, F.expr(
        f"substring(decode({payload_col}, 'ISO-8859-1'), "
        f"instr(decode({payload_col}, 'ISO-8859-1'), '\\r\\n\\r\\n') + 4)"))
    status = F.regexp_extract(headers, r"^HTTP/([0-9.]+) ([0-9]{3})", 2)
    version = F.regexp_extract(headers, r"^HTTP/([0-9.]+) ([0-9]{3})", 1)
    ctype_raw = _header_field(headers, "Content-Type")
    media = F.lower(F.trim(F.regexp_extract(ctype_raw, r"^([^;]*)", 1)))
    charset = F.lower(F.regexp_extract(
        ctype_raw, r"(?i)charset[ \t]*=[ \t]*\"?([A-Za-z0-9_.:-]+)", 1))
    clen = _header_field(headers, "Content-Length").cast("long")
    out = (df
           .withColumn("status",
                       F.when(status != "", status).cast("int"))
           .withColumn("http_version", F.when(version != "", version))
           .withColumn("content_type", F.when(media != "", media))
           .withColumn("charset_label", F.when(charset != "", charset))
           .withColumn("content_length", clen)
           .withColumn("body", F.encode(body_str, "ISO-8859-1")))
    if keep_headers:
        out = out.withColumn("headers", headers)
    return out


def cache_decision(df: DataFrame, *, cc_col: str = "cache_control",
                   age_col: str = "age_s", date_col: str = "date",
                   expires_col: str = "expires",
                   lm_col: str = "last_modified",
                   etag_col: str = "etag",
                   now_col: str = "now") -> DataFrame:
    """RFC 9111 cache freshness + revalidation decision per response —
    the recrawl-scheduler input a polite crawler derives from stored
    headers: how long was this page declared fresh, is it still fresh
    at ``now``, and if not, can we revalidate conditionally instead of
    refetching the body?

    Freshness-lifetime precedence (RFC 9111 §4.2.1, shared cache):
    ``s-maxage`` > ``max-age`` > ``Expires − Date`` > the §4.2.2
    heuristic (10 % of ``Date − Last-Modified``) > 0.  ``no-store``
    short-circuits everything (the response may not be cached at all);
    ``no-cache`` caches but always revalidates.  Current age is the
    simplified ``Age + (now − Date)`` (the transit-delay correction
    terms need per-hop request times a stored crawl does not have —
    documented simplification).

    Adds ``lifetime_s`` (NULL for no-store), ``cur_age_s``,
    ``freshness_source`` ('no-store' | 's-maxage' | 'max-age' |
    'expires' | 'heuristic' | 'none'), and ``decision``:
    'no-store' | 'fresh' | 'revalidate' (stale or no-cache, with an
    ETag/Last-Modified validator to send) | 'refetch' (stale, no
    validator — full body transfer).

    All directive parsing is Catalyst regexp over the Cache-Control
    string; all arithmetic is integer seconds/µs (a double multiply
    would differ cross-engine in the last ulp).  Directive tokens
    match case-insensitively on word boundaries, so ``max-age=60``
    inside ``s-maxage=60`` cannot false-match (the hyphen is a
    boundary — matched explicitly instead)."""
    cc = F.coalesce(F.col(cc_col), F.lit(""))
    no_store = cc.rlike(r"(?i)(^|[,\s])no-store($|[,\s])")
    no_cache = cc.rlike(r"(?i)(^|[,\s])no-cache($|[,\s=])")
    # (^|[,\s]) guards: plain \b would let "s-maxage=9" match max-age
    smax = F.regexp_extract(cc, r"(?i)(^|[,\s])s-maxage=\"?(\d+)", 2)
    mage = F.regexp_extract(cc, r"(?i)(^|[,\s])max-age=\"?(\d+)", 2)
    exp_life = F.expr(
        f"(unix_micros({expires_col}) - unix_micros({date_col})) "
        f"div 1000000")
    heur = F.expr(
        f"case when unix_micros({date_col}) >= unix_micros({lm_col}) "
        f"then (unix_micros({date_col}) - unix_micros({lm_col})) "
        f"* 10 div 100000000 else null end")
    lifetime = (F.when(no_store, F.lit(None).cast("long"))
                .when(smax != "", smax.cast("long"))
                .when(mage != "", mage.cast("long"))
                .when(F.col(expires_col).isNotNull()
                      & F.col(date_col).isNotNull(),
                      F.greatest(exp_life, F.lit(0)).cast("long"))
                .when(F.col(date_col).isNotNull()
                      & F.col(lm_col).isNotNull() & heur.isNotNull(),
                      heur.cast("long"))
                .otherwise(F.lit(0)))
    source = (F.when(no_store, "no-store")
              .when(smax != "", "s-maxage")
              .when(mage != "", "max-age")
              .when(F.col(expires_col).isNotNull()
                    & F.col(date_col).isNotNull(), "expires")
              .when(F.col(date_col).isNotNull()
                    & F.col(lm_col).isNotNull() & heur.isNotNull(),
                    "heuristic")
              .otherwise("none"))
    cur_age = (F.coalesce(F.col(age_col).cast("long"), F.lit(0))
               + F.coalesce(F.expr(
                   f"(unix_micros({now_col}) - unix_micros({date_col})) "
                   f"div 1000000"), F.lit(0)))
    has_validator = (F.col(etag_col).isNotNull()
                     | F.col(lm_col).isNotNull())
    decision = (F.when(no_store, "no-store")
                .when(no_cache, "revalidate")
                .when(cur_age < lifetime, "fresh")
                .when(has_validator, "revalidate")
                .otherwise("refetch"))
    return (df.withColumn("lifetime_s", lifetime)
              .withColumn("cur_age_s", cur_age.cast("long"))
              .withColumn("freshness_source", source)
              .withColumn("decision", decision))
