"""``uvwarc`` — WARC as a registered Spark 4 Python DataSource.

The binaryFile scan in :mod:`.warc` is correct but carries a hard scale
ceiling: it materializes EVERY file as one Arrow cell, so a standard
~1 GB Common-Crawl ``.warc.gz`` shard becomes a >4 GB decompressed
blob in a single row and the 2 GiB Arrow cell limit is the wall.  This
module is the connector-shaped answer (``pyspark.sql.datasource``,
Spark ≥4.0; filter pushdown ≥4.1):

- **partition planning** — one :class:`InputPartition` per WARC file
  (gzip members can't be split blind: the magic bytes can occur inside
  compressed data, so record boundaries are only known by
  decompressing; Common Crawl shards at ~1 GB exactly so file count =
  parallelism, 10^5 files per crawl).
- **bounded memory** — ``read()`` streams the file through a zlib
  ``decompressobj`` member-at-a-time and yields one Arrow
  ``RecordBatch`` per ~``chunk_bytes`` of decompressed records; peak
  per-task memory is O(chunk + one record), never O(file).
- **filter pushdown** — ``pushFilters`` accepts EqualTo / In on
  ``rec_type``/``http_status``/``content_type``/``url`` and
  StringStartsWith on ``url``; accepted predicates run vectorized on
  the parsed frame BEFORE payload bytes are shipped to the JVM, so a
  ``rec_type = 'response'`` scan never serializes request/metadata
  payloads across the Arrow boundary.  Everything else is returned to
  Spark untouched (Spark keeps evaluating it post-scan).

Registration is per-session::

    spark.dataSource.register(WarcDataSource)
    spark.read.format("uvwarc").load("/crawl/segment-*/")

or use :func:`read_warc_ds` which does both.  The truncated-tail and
non-WARC-member policies are identical to :func:`.warc.parse_warc`
(drop the cut member, skip non-record members) so the two scan paths
are row-for-row interchangeable below the cell-size wall — tested.

**Relation-reuse caveat (upstream Spark 4.1 behavior, pinned in
tests/test_warc_ds.py):** a Python DataSource relation holds ONE
reader instance, and each plan's ``pushFilters`` mutates it — so after
planning ``df.filter(...)``, re-running the ORIGINAL unfiltered ``df``
replays the last plan's pushed filters (last-plan-wins).  Call
:func:`read_warc_ds` (a fresh ``.load()``) once per query instead of
branching many queries off one scan DataFrame.  Fresh loads are fully
isolated — tested.
"""

from __future__ import annotations

import glob
import os
import zlib
from collections.abc import Iterator
from dataclasses import dataclass

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    EqualTo,
    Filter,
    In,
    InputPartition,
    StringStartsWith,
)

from ultraviolet_spark.sources.warc import (
    WARC_SCHEMA,
    _split_records,
    records_to_frame,
)

_GZ_MAGIC = b"\x1f\x8b"
_DEFAULT_CHUNK = 64 << 20          # decompressed bytes per Arrow batch
_READ_BYTES = 8 << 20              # compressed bytes per file read() call

# Columns a predicate may be pushed on: flat scalars extracted from the
# record HEADER region (cheap before payload slicing).  ``html`` is
# deliberately absent — a payload predicate would force the full parse
# anyway, so it stays Spark-side.
_PUSHABLE = ("rec_type", "http_status", "content_type", "url")


def _iter_record_chunks(path: str, chunk_bytes: int
                        ) -> Iterator[list[bytes]]:
    """Stream one WARC(.gz) file as lists of raw records totaling
    ≈``chunk_bytes`` decompressed.  Member-per-record gzip (the Common
    Crawl convention) is decompressed incrementally — compressed bytes
    are read ``_READ_BYTES`` at a time and never accumulate; a corrupt
    or truncated tail member is dropped, matching ``_split_members``.
    Uncompressed ``.warc`` falls back to a whole-file read +
    ``Content-Length`` walk (rare outside test fixtures; crawls ship
    gzipped)."""
    with open(path, "rb") as f:
        head = f.read(2)
        if head != _GZ_MAGIC:
            data = head + f.read()
            recs = _split_records(data) if data[:5] == b"WARC/" else []
            out, total = [], 0
            for r in recs:
                out.append(r)
                total += len(r)
                if total >= chunk_bytes:
                    yield out
                    out, total = [], 0
            if out:
                yield out
            return

        d = zlib.decompressobj(16 + zlib.MAX_WBITS)
        cur: list[bytes] = []          # pieces of the in-flight member
        pend: list[bytes] = []         # complete records awaiting yield
        total = 0
        data = head
        eof = False
        while not eof:
            if not data:
                data = f.read(_READ_BYTES)
                if not data:
                    eof = True     # partial member in ``cur`` = cut tail
                    continue
            try:
                piece = d.decompress(data)
            except zlib.error:
                break              # corrupt tail: keep what we have
            if piece:
                cur.append(piece)
            if d.eof:
                m = b"".join(cur)
                cur = []
                data = d.unused_data
                d = zlib.decompressobj(16 + zlib.MAX_WBITS)
                if m[:5] == b"WARC/":      # skip non-record members
                    pend.append(m)
                    total += len(m)
                    if total >= chunk_bytes:
                        yield pend
                        pend, total = [], 0
            else:
                data = b""
        if pend:
            yield pend


def _filter_mask(pdf: pd.DataFrame, flt: Filter) -> pd.Series:
    """One accepted filter → boolean mask (NULL compares False, the
    SQL semantics Spark expects from a source that claimed the
    predicate)."""
    col = pdf[flt.attribute[0]]
    if isinstance(flt, EqualTo):
        return col.eq(flt.value).fillna(False).astype(bool)
    if isinstance(flt, In):
        return col.isin(list(flt.values)).fillna(False).astype(bool)
    if isinstance(flt, StringStartsWith):
        return col.str.startswith(flt.value).fillna(False).astype(bool)
    raise AssertionError(f"unpushable filter accepted: {flt!r}")


@dataclass(frozen=True)
class WarcPartition(InputPartition):
    """One WARC file = one scan task (files are the split unit)."""
    path: str


class WarcReader(DataSourceReader):
    def __init__(self, options: dict):
        path = options.get("path")
        if not path:
            raise ValueError("uvwarc: .load(path) is required")
        self._path = path
        self._chunk = int(options.get("chunk_bytes", _DEFAULT_CHUNK))
        if self._chunk <= 0:
            raise ValueError("uvwarc: chunk_bytes must be positive")
        self._accepted: list[Filter] = []

    # -- planning (driver side) ------------------------------------
    def pushFilters(self, filters: list[Filter]):
        for flt in filters:
            ok = (isinstance(flt, (EqualTo, In))
                  and len(flt.attribute) == 1
                  and flt.attribute[0] in _PUSHABLE) or (
                 isinstance(flt, StringStartsWith)
                 and flt.attribute == ("url",))
            if ok:
                self._accepted.append(flt)
            else:
                yield flt          # Spark keeps evaluating this one

    def partitions(self):
        p = self._path
        if os.path.isdir(p):
            paths = sorted(glob.glob(os.path.join(p, "*.warc*")))
        else:
            paths = sorted(glob.glob(p)) if glob.has_magic(p) else [p]
        paths = [q for q in paths if os.path.isfile(q)]
        if not paths:
            raise FileNotFoundError(f"uvwarc: no WARC files under {p!r}")
        return [WarcPartition(q) for q in paths]

    # -- execution (executor side) ----------------------------------
    def read(self, partition: WarcPartition):
        yield from _file_batches(partition.path, self._chunk,
                                 self._accepted)


def _file_batches(path: str, chunk: int, filters: list[Filter]):
    """One WARC file → Arrow RecordBatches (shared by the batch and
    stream readers; runs executor-side)."""
    import pyarrow as pa

    schema = pa.schema([
        ("warc_file", pa.string()),
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("rec_type", pa.string()),
        ("http_status", pa.int32()),
        ("content_type", pa.string()),
        ("html", pa.binary()),
    ])
    for records in _iter_record_chunks(path, chunk):
        pdf = records_to_frame(records)
        for flt in filters:
            pdf = pdf[_filter_mask(pdf, flt)]
            if not len(pdf):
                break
        if not len(pdf):
            continue
        pdf = pdf.reset_index(drop=True)
        pdf.insert(0, "warc_file", path)
        yield pa.RecordBatch.from_pandas(
            pdf, schema=schema, preserve_index=False)


class WarcStreamReader(DataSourceStreamReader):
    """Tail a crawl directory as a Structured Streaming source.

    **Offset model** — crawl shards are named monotonically (Common
    Crawl embeds segment timestamp + sequence in every filename, and
    any sane crawler writes ``tmp`` then renames), so an offset is just
    ``{"last": <basename>, "n_seen": N}``: the lexicographically
    largest filename consumed plus how many files that covers.  A
    micro-batch is the files with ``start.last < name <= end.last`` in
    sorted order, one :class:`WarcPartition` (= one executor task)
    each.  This keeps the checkpointed offset O(1) — Spark's own
    FileStreamSource instead checkpoints an ever-growing seen-file log,
    which at 10^5-file crawls is exactly the state you don't want.

    The contract is CHECKED, not assumed: at every ``partitions()``
    call the current listing must still contain exactly ``n_seen``
    files at or below ``start.last`` — a file that arrives named below
    the high-water mark (out-of-order naming) or a consumed file that
    vanished (retention deleted data the checkpoint hasn't passed)
    raises immediately rather than silently skipping records.

    Exactly-once: ``partitions(start, end)`` is a pure function of the
    immutable directory listing between two offsets, so replaying a
    micro-batch after a crash plans the identical file set; records
    within a file are deterministic by construction.  No pushdown in
    the streaming API — filter in the query (Spark evaluates it
    post-scan; payload volume per micro-batch is one file set, not a
    backlog).
    """

    def __init__(self, options: dict):
        path = options.get("path")
        if not path:
            raise ValueError("uvwarc stream: .load(path) is required")
        if not os.path.isdir(path):
            raise ValueError(
                "uvwarc stream: path must be a directory to tail, got "
                f"{path!r}")
        self._path = path
        self._chunk = int(options.get("chunk_bytes", _DEFAULT_CHUNK))
        if self._chunk <= 0:
            raise ValueError("uvwarc: chunk_bytes must be positive")

    def _listing(self) -> list[str]:
        return sorted(
            p for p in glob.glob(os.path.join(self._path, "*.warc*"))
            if os.path.isfile(p))

    def initialOffset(self) -> dict:
        # backfill-then-tail: existing files belong to the first batch
        return {"last": "", "n_seen": 0}

    def latestOffset(self) -> dict:
        files = self._listing()
        if not files:
            return {"last": "", "n_seen": 0}
        return {"last": os.path.basename(files[-1]),
                "n_seen": len(files)}

    def partitions(self, start: dict, end: dict):
        names = [(os.path.basename(p), p) for p in self._listing()]
        below = [n for n, _ in names if n <= start["last"]]
        if len(below) != start["n_seen"]:
            raise ValueError(
                "uvwarc stream: directory listing no longer matches the "
                f"checkpointed offset {start!r}: {len(below)} files at or "
                f"below the high-water mark (expected {start['n_seen']}). "
                "Either a file arrived named below the mark (crawl shard "
                "names must be monotone) or a consumed file was deleted "
                "before the checkpoint passed it.")
        return [WarcPartition(p) for n, p in names
                if start["last"] < n <= end["last"]]

    def read(self, partition: WarcPartition):
        yield from _file_batches(partition.path, self._chunk, [])

    def commit(self, end: dict) -> None:
        pass                        # nothing to clean up; files immutable


class WarcDataSource(DataSource):
    """``spark.read.format("uvwarc")`` — streaming WARC scan."""

    @classmethod
    def name(cls) -> str:
        return "uvwarc"

    def schema(self):
        return WARC_SCHEMA          # leads with warc_file

    def reader(self, schema) -> WarcReader:
        return WarcReader(self.options)

    def streamReader(self, schema) -> WarcStreamReader:
        return WarcStreamReader(self.options)


def read_warc_ds(spark: SparkSession, path: str, *,
                 chunk_bytes: int = _DEFAULT_CHUNK) -> DataFrame:
    """Register (idempotent) + read.  The returned scan supports
    predicate pushdown into the Python source — filter early.

    The pushdown conf must be on BEFORE planning or Spark 4.1 refuses
    any reader that implements ``pushFilters``.  It is planning-only
    (changes where a predicate runs, never what any query returns), so
    setting it unconditionally is safe for session-sharing callers —
    unlike a timezone this can't make another query order-dependent."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(WarcDataSource)
    return (spark.read.format("uvwarc")
            .option("chunk_bytes", str(chunk_bytes)).load(path))


def read_warc_stream(spark: SparkSession, path: str, *,
                     chunk_bytes: int = _DEFAULT_CHUNK) -> DataFrame:
    """Register (idempotent) + tail ``path`` as a streaming source —
    see :class:`WarcStreamReader` for the offset/monotone-name
    contract.  Compose with the engine's watermark/session/stateful
    streaming operators downstream."""
    spark.dataSource.register(WarcDataSource)
    return (spark.readStream.format("uvwarc")
            .option("chunk_bytes", str(chunk_bytes)).load(path))
