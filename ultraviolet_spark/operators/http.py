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
