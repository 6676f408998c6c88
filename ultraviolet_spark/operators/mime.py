"""MIME magic-byte sniffing (the WHATWG MIME Sniffing algorithm,
deterministic subset) — because Content-Type headers LIE on a real
crawl: HTML served as octet-stream, JPEGs as image/png, gzip bombs as
text/plain.  Pipelines route on the sniffed type, never the declared
one, and the mismatch flag itself is a quality/abuse signal.

Pure Catalyst, zero Python: binary prefix equality against `unhex`
literals for the magic table, one ISO-8859-1 decode (byte-faithful) +
one regexp for the HTML tag test, `contains` NUL probe for the
text/binary split — all scan-stage, whole-stage-codegen'd, exactly
mirrorable in SQL (q126).

Sniff order (first match wins):

1. magic table: PDF, PNG, GIF, JPEG, BMP, WEBP/WAV (RIFF+subtype),
   OGG, gzip, zip
2. HTML tag test on the first 512 bytes (WHATWG tag set, optional
   leading whitespace, tag terminated by whitespace or ``>``)
3. UTF BOM → text/plain
4. no NUL byte in the first 512 → text/plain
5. otherwise → application/octet-stream
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (sniffed mime, hex magic prefix) — longest-prefix entries first where
# one magic is a prefix of another.
MAGIC: list[tuple[str, str]] = [
    ("application/pdf", "255044462D"),        # %PDF-
    ("image/png", "89504E470D0A1A0A"),
    ("image/gif", "474946383761"),            # GIF87a
    ("image/gif", "474946383961"),            # GIF89a
    ("image/jpeg", "FFD8FF"),
    ("image/bmp", "424D"),
    ("application/ogg", "4F676753"),          # OggS
    ("application/gzip", "1F8B"),
    ("application/zip", "504B0304"),
]

# WHATWG §7.1 tag set for "HTML MIME type" identification.
_HTML_RE = (r"^[ \t\n\f\r]*<(!doctype html|html|head|script|iframe|h1"
            r"|div|font|table|a|style|title|b|body|br|p|!--)[ \t\n\f\r>]")


def sniff_mime(bin_col: Column, *, scan_bytes: int = 512) -> Column:
    """Sniffed MIME essence for a binary column (NULL input → NULL,
    empty → application/octet-stream)."""
    def prefix_is(hexs: str) -> Column:
        return (F.substring(bin_col, 1, len(hexs) // 2)
                == F.unhex(F.lit(hexs)))

    riff = prefix_is("52494646")                       # RIFF
    sub = F.substring(bin_col, 9, 4)
    expr = (F.when(F.length(bin_col) == 0,
                   F.lit("application/octet-stream"))  # nothing to sniff
            .when(riff & (sub == F.unhex(F.lit("57415645"))),
                  F.lit("audio/wav"))                  # WAVE
            .when(riff & (sub == F.unhex(F.lit("57454250"))),
                  F.lit("image/webp")))                # WEBP
    for mime, hexs in MAGIC:
        expr = expr.when(prefix_is(hexs), F.lit(mime))

    head = F.decode(F.substring(bin_col, 1, scan_bytes), "ISO-8859-1")
    bom = (prefix_is("EFBBBF") | prefix_is("FFFE") | prefix_is("FEFF"))
    return (expr
            .when(F.lower(head).rlike(_HTML_RE), F.lit("text/html"))
            .when(bom, F.lit("text/plain"))
            .when(~F.contains(head, F.lit("\x00")), F.lit("text/plain"))
            .otherwise(F.lit("application/octet-stream")))


def declared_essence(ct: Column) -> Column:
    """Lowercased media type with parameters stripped
    (``Text/HTML; charset=utf-8`` → ``text/html``)."""
    return F.lower(F.trim(F.element_at(F.split(ct, ";", 2), 1)))


def with_mime_check(df: DataFrame, *, bin_col: str = "html",
                    declared_col: str = "content_type",
                    scan_bytes: int = 512) -> DataFrame:
    """Adds ``sniffed_mime``, ``declared_mime`` (essence) and
    ``mime_ok``.  ``mime_ok`` is true when the essences agree, or when
    the sniff says text/plain and the declaration is any ``text/*``
    (a byte sniffer cannot tell css/js/csv apart — that is not a lie).
    Routing decisions should use ``sniffed_mime``; ``NOT mime_ok`` is
    the content-type-lies quality signal."""
    sniffed = sniff_mime(F.col(bin_col), scan_bytes=scan_bytes)
    declared = declared_essence(F.col(declared_col))
    ok = ((declared == sniffed)
          | ((sniffed == "text/plain") & declared.startswith("text/")))
    return (df.withColumn("sniffed_mime", sniffed)
            .withColumn("declared_mime", declared)
            .withColumn("mime_ok", F.coalesce(ok, F.lit(False))))
