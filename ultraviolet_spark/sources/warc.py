"""WARC source — the native Common Crawl container (ISO 28500 / WARC 1.0).

Common Crawl ships crawls as ``.warc.gz`` files where EVERY record is
its own gzip member and members are concatenated — so a reader can
split records by decompressing member-at-a-time without parsing
``Content-Length`` across a compressed stream.  This module provides:

- :func:`build_warc` — a deterministic writer (tests / synthetic crawls
  only; real crawls arrive already written).
- :func:`parse_warc` — bytes → ``pandas.DataFrame`` of records.  Field
  extraction is vectorized pandas ``.str`` ops over a latin-1 decode of
  the whole record batch (latin-1 is a lossless byte↔str bijection, so
  re-encoding the payload slice reproduces the original bytes exactly —
  the byte-identity invariant the engine needs for ``html``).
- :func:`read_warc` — the Spark source: ``binaryFile`` scan →
  ``mapInPandas`` (one Arrow batch of files at a time).  File-level
  granularity: gzip member decompression is a per-record loop of C
  zlib calls (inherent to the member-per-record format; Common Crawl
  readers all work this way), everything after is array-at-a-time.

Scale notes (100 TB crawl): a crawl is ~10^5 ``.warc.gz`` files of ~1 GB;
``binaryFile`` gives one task per file, so parallelism = file count and
no shuffle exists anywhere in the scan.  Per-task memory is one file's
decompressed records (bounded by WARC segment conventions); for larger
archives set ``spark.sql.files.maxPartitionBytes`` has no effect on
binaryFile — split upstream or shard files, as Common Crawl already
does.  There is no Iceberg/catalog dependency: this is the RAW
ingestion edge that feeds the pages table.
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator
from datetime import datetime, timezone
from hashlib import md5

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

WARC_VERSION = b"WARC/1.0"

WARC_SCHEMA = T.StructType([
    T.StructField("warc_file", T.StringType()),
    T.StructField("url", T.StringType()),
    T.StructField("warc_ts", T.TimestampType()),
    T.StructField("rec_type", T.StringType()),
    T.StructField("http_status", T.IntegerType()),
    T.StructField("content_type", T.StringType()),
    T.StructField("html", T.BinaryType()),
])


# ---------------------------------------------------------------- writer

def _http_head(status: int, mime: str, n: int) -> bytes:
    reason = {200: "OK", 404: "Not Found", 301: "Moved Permanently",
              503: "Service Unavailable"}.get(status, "OK")
    return (f"HTTP/1.1 {status} {reason}\r\n"
            f"Content-Type: {mime}\r\n"
            f"Content-Length: {n}\r\n\r\n").encode("ascii")


def build_record(url: str, ts: datetime, payload: bytes, *,
                 rec_type: str = "response", status: int = 200,
                 mime: str = "text/html") -> bytes:
    """One uncompressed WARC record.  ``response`` records wrap the
    payload in an HTTP/1.1 response head (as crawlers store them);
    ``resource``/``metadata`` records carry the payload verbatim."""
    if rec_type == "response":
        block = _http_head(status, mime, len(payload)) + payload
        ctype = "application/http; msgtype=response"
    else:
        block = payload
        ctype = mime
    rid = md5((url + ts.isoformat()).encode()).hexdigest()
    head = (
        WARC_VERSION + b"\r\n"
        + f"WARC-Type: {rec_type}\r\n".encode()
        + f"WARC-Record-ID: <urn:uuid:{rid}>\r\n".encode()
        + f"WARC-Date: {ts.strftime('%Y-%m-%dT%H:%M:%SZ')}\r\n".encode()
        + f"WARC-Target-URI: {url}\r\n".encode()
        + f"Content-Type: {ctype}\r\n".encode()
        + f"Content-Length: {len(block)}\r\n\r\n".encode())
    return head + block + b"\r\n\r\n"


def build_warc(records: list[dict], *, compress: bool = True) -> bytes:
    """Serialize records (dicts with url/ts/payload and optional
    rec_type/status/mime) — gzip member per record when ``compress``
    (the Common Crawl convention), plain concatenation otherwise."""
    out = []
    for r in records:
        raw = build_record(r["url"], r["ts"], r["payload"],
                           rec_type=r.get("rec_type", "response"),
                           status=r.get("status", 200),
                           mime=r.get("mime", "text/html"))
        if compress:
            co = zlib.compressobj(6, zlib.DEFLATED, 16 + zlib.MAX_WBITS)
            raw = co.compress(raw) + co.flush()
        out.append(raw)
    return b"".join(out)


# ---------------------------------------------------------------- reader

def _split_members(data: bytes) -> list[bytes]:
    """Multi-member gzip → list of decompressed members (= records for
    CC-convention files).  Non-gzip input returns ``[data]`` whole.
    A corrupt/truncated tail member is dropped (crawl files get cut);
    everything before it is kept."""
    if data[:2] != b"\x1f\x8b":
        return [data]
    members, buf = [], memoryview(data)
    while len(buf) >= 2 and bytes(buf[:2]) == b"\x1f\x8b":
        d = zlib.decompressobj(16 + zlib.MAX_WBITS)
        try:
            members.append(d.decompress(bytes(buf)))
        except zlib.error:
            break
        if not d.eof:            # truncated final member
            members.pop()
            break
        buf = memoryview(d.unused_data)
    return members


def _split_records(stream: bytes) -> list[bytes]:
    """Records out of one uncompressed stream by walking
    ``Content-Length`` (payloads may contain ``WARC/1.0`` bytes, so a
    split-on-marker would corrupt them).  O(records) loop of O(1) work."""
    recs, pos, n = [], 0, len(stream)
    while pos < n and stream[pos:pos + 5] == b"WARC/":
        hd_end = stream.find(b"\r\n\r\n", pos)
        if hd_end < 0:
            break
        head = stream[pos:hd_end].decode("latin-1")
        clen = 0
        for line in head.split("\r\n"):
            if line.lower().startswith("content-length:"):
                clen = int(line.split(":", 1)[1])
                break
        end = hd_end + 4 + clen + 4          # payload + record sep \r\n\r\n
        recs.append(stream[pos:min(end, n)])
        pos = end
    return recs


_HDR_RE = {
    "rec_type": r"(?mi)^WARC-Type:\s*(\S+)",
    "url": r"(?mi)^WARC-Target-URI:\s*(\S+)",
    "date": r"(?mi)^WARC-Date:\s*(\S+)",
    "content_type": r"(?mi)^Content-Type:\s*([^\r\n]+)",
}


def parse_warc(data: bytes) -> pd.DataFrame:
    """Bytes of one WARC(.gz) file → DataFrame(url, warc_ts, rec_type,
    http_status, content_type, html).  All field extraction is
    vectorized over the record batch; payload bytes round-trip through
    latin-1 so ``html`` is byte-identical to what was crawled."""
    members = _split_members(data)
    records: list[bytes] = []
    for m in members:
        if len(members) == 1 and m[:5] == b"WARC/":
            records.extend(_split_records(m))
        elif m[:5] == b"WARC/":
            records.append(m)
    return records_to_frame(records)


def records_to_frame(records: list[bytes]) -> pd.DataFrame:
    """Vectorized field extraction over a batch of raw WARC records
    (each one full record incl. headers) — the shared core of
    :func:`parse_warc` and the streaming ``uvwarc`` DataSource, which
    arrives at record granularity without ever holding a whole file."""
    cols = ["url", "warc_ts", "rec_type", "http_status", "content_type",
            "html"]
    if not records:
        return pd.DataFrame({c: pd.Series([], dtype=object) for c in cols})

    s = pd.Series(records).str.decode("latin-1")
    # regex/field extraction below is vectorized; the variable-length
    # header/payload splits are record-granularity comprehensions of
    # O(1) slice ops (pandas .str has no per-element stop argument)
    hd_end = s.str.find("\r\n\r\n")
    heads = pd.Series([t[:e] for t, e in zip(s, hd_end)])
    body = pd.Series([t[e + 4:] for t, e in zip(s, hd_end)])
    # strip the record separator written after Content-Length bytes
    clen = heads.str.extract(r"(?mi)^Content-Length:\s*(\d+)")[0]
    body = pd.Series([b[:int(c)] if c == c else b
                      for b, c in zip(body, clen)])

    out = pd.DataFrame(index=s.index)
    out["rec_type"] = heads.str.extract(_HDR_RE["rec_type"])[0].str.lower()
    out["url"] = heads.str.extract(_HDR_RE["url"])[0]
    out["warc_ts"] = pd.to_datetime(
        heads.str.extract(_HDR_RE["date"])[0], utc=True,
        format="%Y-%m-%dT%H:%M:%SZ", errors="coerce").dt.tz_localize(None)
    ctype = heads.str.extract(_HDR_RE["content_type"])[0].str.strip()

    # response records: peel the HTTP head off the block
    is_http = ctype.str.startswith("application/http").fillna(False)
    http_end = body.str.find("\r\n\r\n").where(is_http, -1)
    out["http_status"] = pd.to_numeric(
        body.str.extract(r"^HTTP/\d\.\d (\d{3})")[0], errors="coerce"
    ).where(is_http).astype("Int32")
    http_head = pd.Series(
        [b[:e] if e >= 0 else "" for b, e in zip(body, http_end)])
    out["content_type"] = http_head.str.extract(
        r"(?mi)^Content-Type:\s*([^\r\n]+)")[0].str.strip().where(
            is_http, ctype)
    payload = pd.Series(
        [b[e + 4:] if e >= 0 else b for b, e in zip(body, http_end)])
    out["html"] = payload.str.encode("latin-1")
    return out[cols]


def read_warc(spark: SparkSession, path: str, *,
              rec_types: tuple[str, ...] = ("response",)) -> DataFrame:
    """Distributed WARC scan: one task per file (``binaryFile``), all
    parsing executor-side in one Arrow pass, no shuffle.  Returns the
    WARC_SCHEMA frame filtered to ``rec_types`` (responses by default —
    the rows that become the pages table)."""
    files = spark.read.format("binaryFile").load(path)

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            for fname, content in zip(pdf["path"], pdf["content"]):
                rec = parse_warc(bytes(content))
                if rec_types:
                    rec = rec[rec["rec_type"].isin(rec_types)]
                rec.insert(0, "warc_file", fname)
                yield rec

    out = files.select("path", "content").mapInPandas(gen, WARC_SCHEMA)
    return out


# ------------------------------------------------------------- WET export

def write_wet(df: DataFrame, path: str, *, n_shards: int = 4,
              url_col: str = "url", ts_col: str = "warc_ts",
              text_col: str = "text", compress: bool = True) -> list[dict]:
    """WET derived-format export — Common Crawl's extracted-text
    sidecar (``*.warc.wet.gz``): one WARC ``conversion`` record per
    page, payload = the extracted text as UTF-8 ``text/plain``.

    Distributed shape: pages are md5(url)-sharded (deterministic across
    runs/engines/cluster sizes, like every split in this engine), each
    shard serialized by its own task into ONE member-per-record gzip
    file, records in (url, ts) order within the shard so output bytes
    are reproducible.  Returns the per-shard manifest
    ``[{shard, n_records, n_bytes}, ...]`` (n_shards rows — bounded
    driver traffic; no page data ever reaches the driver).
    """
    import os

    os.makedirs(path, exist_ok=True)
    shard = (F.conv(F.substring(F.md5(F.encode(F.col(url_col), "UTF-8")),
                                1, 12), 16, 10)
             .cast("long") % n_shards).cast("int")
    suffix = ".warc.wet" + (".gz" if compress else "")

    def write_shard(key, pdf: pd.DataFrame) -> pd.DataFrame:
        sid = int(key[0])
        pdf = pdf.sort_values([url_col, ts_col])
        recs = [{"url": u, "ts": t.to_pydatetime(),
                 "payload": x.encode("utf-8"),
                 "rec_type": "conversion", "mime": "text/plain"}
                for u, t, x in zip(pdf[url_col], pdf[ts_col],
                                   pdf[text_col])]
        data = build_warc(recs, compress=compress)
        with open(os.path.join(path, f"part-{sid:05d}{suffix}"),
                  "wb") as f:
            f.write(data)
        return pd.DataFrame({"shard": [sid], "n_records": [len(recs)],
                             "n_bytes": [len(data)]})

    stats = (df.select(url_col, ts_col, text_col)
             .withColumn("__shard", shard)
             .groupBy("__shard")
             .applyInPandas(write_shard,
                            "shard int, n_records long, n_bytes long"))
    return [r.asDict() for r in stats.collect()]


def read_wet(spark: SparkSession, path: str) -> DataFrame:
    """Distributed WET scan: the WARC reader filtered to ``conversion``
    records, with the payload decoded back to ``text`` through the
    engine's own UTF-8 kernel (never the JVM decoder — same U+FFFD
    policy as everything else)."""
    from ultraviolet_spark.functions.udfs import utf8_decode_udf

    recs = read_warc(spark, path, rec_types=("conversion",))
    return recs.select(
        "warc_file", "url", "warc_ts",
        utf8_decode_udf(F.col("html")).alias("text"))


# ------------------------------------------------------------- WAT export

WAT_PAYLOAD_SCHEMA = ("struct<outlinks: array<string>, title: string, "
                      "html_bytes: bigint>")


def write_wat(df: DataFrame, path: str, *, n_shards: int = 4,
              url_col: str = "url", ts_col: str = "warc_ts",
              html_col: str = "html", compress: bool = True) -> list[dict]:
    """WAT derived-format export — Common Crawl's metadata sidecar:
    one WARC ``metadata`` record per page whose payload is a JSON
    object ``{outlinks, title, html_bytes}`` (absolute hrefs in
    document order, raw ``<title>`` text, page byte size).  The JSON is
    built PURE CATALYST (``regexp_extract_all`` + ``to_json``) before
    the same md5(url)-sharded one-task-per-shard writer as
    :func:`write_wet`; returns the per-shard manifest."""
    import os

    os.makedirs(path, exist_ok=True)
    h = F.col(html_col)
    links = F.filter(
        F.expr(f"regexp_extract_all({html_col}, 'href=\"([^\"]*)\"', 1)"),
        lambda x: x.rlike("^https?://"))
    meta = F.to_json(F.struct(
        links.alias("outlinks"),
        F.when(h.rlike("(?i)<title[^>]*>[^<]*</title>"),
               F.regexp_extract(h, "(?i)<title[^>]*>([^<]*)</title>", 1))
         .alias("title"),
        F.octet_length(F.encode(h, "UTF-8")).cast("long")
         .alias("html_bytes")))
    shard = (F.conv(F.substring(F.md5(F.encode(F.col(url_col), "UTF-8")),
                                1, 12), 16, 10)
             .cast("long") % n_shards).cast("int")
    suffix = ".warc.wat" + (".gz" if compress else "")

    def write_shard(key, pdf: pd.DataFrame) -> pd.DataFrame:
        sid = int(key[0])
        pdf = pdf.sort_values([url_col, ts_col])
        recs = [{"url": u, "ts": t.to_pydatetime(),
                 "payload": m.encode("utf-8"),
                 "rec_type": "metadata", "mime": "application/json"}
                for u, t, m in zip(pdf[url_col], pdf[ts_col],
                                   pdf["__meta"])]
        data = build_warc(recs, compress=compress)
        with open(os.path.join(path, f"part-{sid:05d}{suffix}"),
                  "wb") as f:
            f.write(data)
        return pd.DataFrame({"shard": [sid], "n_records": [len(recs)],
                             "n_bytes": [len(data)]})

    stats = (df.select(url_col, ts_col, meta.alias("__meta"))
             .withColumn("__shard", shard)
             .groupBy("__shard")
             .applyInPandas(write_shard,
                            "shard int, n_records long, n_bytes long"))
    return [r.asDict() for r in stats.collect()]


def read_wat(spark: SparkSession, path: str) -> DataFrame:
    """Distributed WAT scan: metadata records parsed back to
    ``(warc_file, url, warc_ts, outlinks, title, html_bytes)`` — the
    payload decodes through the UTF-8 kernel then one ``from_json``."""
    from ultraviolet_spark.functions.udfs import utf8_decode_udf

    recs = read_warc(spark, path, rec_types=("metadata",))
    j = F.from_json(utf8_decode_udf(F.col("html")), WAT_PAYLOAD_SCHEMA)
    return recs.select("warc_file", "url", "warc_ts",
                       j["outlinks"].alias("outlinks"),
                       j["title"].alias("title"),
                       j["html_bytes"].alias("html_bytes"))
