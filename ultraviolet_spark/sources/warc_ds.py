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
from pyspark.sql import functions as F
from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceReader,
    DataSourceStreamArrowWriter,
    DataSourceStreamReader,
    EqualTo,
    Filter,
    In,
    InputPartition,
    StringStartsWith,
    WriterCommitMessage,
)

from datetime import timezone as _tz

from ultraviolet_spark.sources.warc import (
    WARC_SCHEMA,
    _split_records,
    build_record,
    records_to_frame,
)

_UTC = _tz.utc

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


# ---------------------------------------------------------------- writer

# The sink accepts exactly this surface: 3 required columns (what a
# WARC record IS) + 3 optional header scalars.  Anything else is
# REFUSED at planning — a sink that silently drops columns corrupts a
# re-shard/export pipeline invisibly.
_SINK_REQUIRED = (("url", "string"), ("warc_ts", "timestamp"),
                  ("html", "binary"))
_SINK_OPTIONAL = {"http_status": ("int", "bigint"),
                  "rec_type": ("string",),
                  "content_type": ("string",)}


@dataclass(frozen=True)
class WarcCommitMessage(WriterCommitMessage):
    tmp: str          # "" when the task saw zero rows (no file made)
    final: str
    n_records: int


def _write_member_file(batches, tmp: str, final: str) -> WarcCommitMessage:
    """Executor-side serialization shared by the batch and streaming
    sinks: Arrow batches → one .warc.gz at ``tmp`` (gzip member per
    record via :func:`warc.build_record` — byte-interchangeable with
    the test-shard builder), removed again if the task saw zero rows
    (an empty .warc.gz is not a valid shard)."""
    n = 0
    with open(tmp, "wb") as f:
        for batch in batches:
            cols = {name: batch.column(i).to_pylist()
                    for i, name in enumerate(batch.schema.names)}
            rows = len(batch)
            stats = cols.get("http_status", [None] * rows)
            rtypes = cols.get("rec_type", [None] * rows)
            mimes = cols.get("content_type", [None] * rows)
            for u, ts, h, st, rt, mi in zip(
                    cols["url"], cols["warc_ts"], cols["html"],
                    stats, rtypes, mimes):
                if u is None or ts is None or h is None:
                    raise ValueError(
                        "uvwarc sink: url/warc_ts/html must be "
                        "non-NULL (a WARC record cannot represent "
                        "their absence; filter upstream)")
                if ts.tzinfo is not None:
                    # build_record formats naive-UTC; Arrow hands the
                    # session-UTC timestamp tz-aware.
                    ts = ts.astimezone(_UTC).replace(tzinfo=None)
                raw = build_record(
                    u, ts, bytes(h),
                    rec_type=rt or "response",
                    status=200 if st is None else int(st),
                    mime=mi or "text/html")
                co = zlib.compressobj(6, zlib.DEFLATED,
                                      16 + zlib.MAX_WBITS)
                f.write(co.compress(raw) + co.flush())
                n += 1
    if n == 0:
        os.remove(tmp)
        return WarcCommitMessage(tmp="", final=final, n_records=0)
    return WarcCommitMessage(tmp=tmp, final=final, n_records=n)


class WarcWriter(DataSourceArrowWriter):
    """``df.write.format("uvwarc")`` — one ``part-{pid:05d}.warc.gz``
    per non-empty task, gzip member per record (the Common Crawl
    convention the reader splits on), serialized by the SAME
    :func:`warc.build_record` the test-shard builder uses so writer
    output is byte-interchangeable with it.

    Commit protocol (the classic two-phase file commit): tasks write
    ``_tmp-{pid}-{attempt}`` names — underscore-hidden from any data
    listing — and the driver's ``commit`` renames winners into place
    only after EVERY task succeeded, so a failed/straggler attempt
    never leaves a half-written part visible; ``abort`` removes the
    temps.  In ``overwrite`` mode stale parts from a previous write are
    removed in ``commit`` AFTER all tasks succeeded (a failed overwrite
    leaves the old data intact, unlike delete-first).  Requires
    writer-visible shared storage for the rename, like every
    rename-committed file sink.

    Bytes are deterministic per (row multiset, partitioning): zlib's
    gzip wrapper stamps mtime=0 and record ids are content-derived.
    Use :func:`write_warc_ds` to pin the partitioning too.
    """

    def __init__(self, options, schema, overwrite: bool):
        self._path = options.get("path")
        if not self._path:
            raise ValueError("uvwarc sink requires a save path")
        names = {f.name: f.dataType.simpleString() for f in schema.fields}
        for col, want in _SINK_REQUIRED:
            if names.pop(col, None) != want:
                raise ValueError(
                    f"uvwarc sink requires column {col!r} of type {want} "
                    f"(schema has {dict(names)!r})")
        for col, typ in list(names.items()):
            if typ not in _SINK_OPTIONAL.get(col, ()):
                raise ValueError(
                    f"uvwarc sink: unsupported column {col!r} ({typ}); "
                    f"allowed optionals: {sorted(_SINK_OPTIONAL)}")
        self._overwrite = overwrite

    def write(self, batches) -> WarcCommitMessage:
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid, att = ctx.partitionId(), ctx.taskAttemptId()
        os.makedirs(self._path, exist_ok=True)
        tmp = os.path.join(self._path, f"_tmp-{pid:05d}-{att}.warc.gz")
        final = os.path.join(self._path, f"part-{pid:05d}.warc.gz")
        return _write_member_file(batches, tmp, final)

    def commit(self, messages) -> None:
        msgs = [m for m in messages if m is not None and m.tmp]
        finals = {m.final for m in msgs}
        existing = {os.path.join(self._path, n)
                    for n in os.listdir(self._path)
                    if n.startswith("part-") and n.endswith(".warc.gz")} \
            if os.path.isdir(self._path) else set()
        clash = finals & existing
        if clash and not self._overwrite:
            for m in msgs:
                os.remove(m.tmp)
            raise FileExistsError(
                f"uvwarc sink: {len(clash)} part file(s) already exist "
                f"(e.g. {sorted(clash)[0]}); use mode('overwrite')")
        for m in msgs:
            os.replace(m.tmp, m.final)
        if self._overwrite:
            for stale in sorted(existing - finals):
                os.remove(stale)

    def abort(self, messages) -> None:
        for m in messages:
            if m is not None and m.tmp and os.path.exists(m.tmp):
                os.remove(m.tmp)


class WarcStreamWriter(WarcWriter, DataSourceStreamArrowWriter):
    """``df.writeStream.format("uvwarc")`` — the streaming quadrant of
    the sink, completing batch-read / stream-read / batch-write /
    stream-write on one registered connector.

    File names are ``part-{batchId:08d}-{pid:05d}.warc.gz``: monotone
    in batch id, so the OUTPUT directory itself satisfies the
    monotone-name contract of :class:`WarcStreamReader` — a crawl
    pipeline can tail its own exports.  Exactly-once composition: the
    stream reader replans a replayed micro-batch as the identical file
    set, the serialization is deterministic (content-derived record
    ids, mtime-0 gzip), and a replayed batch's ``commit`` re-renames
    over the same final names — idempotent by byte equality, the same
    sink-side contract the TFRecord/stream-reader docs state.

    Inherits the batch writer's schema policing and two-phase
    tmp→rename commit; ``commit(messages, batchId)`` additionally
    drops any stale parts OF THAT BATCH ID left by a replay that
    planned fewer tasks."""

    def write(self, batches) -> WarcCommitMessage:
        from pyspark import TaskContext

        ctx = TaskContext.get()
        bid = ctx.getLocalProperty("streaming.sql.batchId")
        if bid is None:
            raise RuntimeError(
                "uvwarc stream sink: streaming.sql.batchId job property "
                "missing — not running inside a micro-batch?")
        pid, att = ctx.partitionId(), int(ctx.taskAttemptId())
        os.makedirs(self._path, exist_ok=True)
        tmp = os.path.join(
            self._path, f"_tmp-b{int(bid):08d}-{pid:05d}-{att}.warc.gz")
        final = os.path.join(
            self._path, f"part-{int(bid):08d}-{pid:05d}.warc.gz")
        return _write_member_file(batches, tmp, final)

    def commit(self, messages, batchId: int) -> None:
        msgs = [m for m in messages if m is not None and m.tmp]
        finals = {m.final for m in msgs}
        for m in msgs:
            os.replace(m.tmp, m.final)
        if os.path.isdir(self._path):
            prefix = f"part-{int(batchId):08d}-"
            for name in os.listdir(self._path):
                p = os.path.join(self._path, name)
                if (name.startswith(prefix) and name.endswith(".warc.gz")
                        and p not in finals):
                    os.remove(p)   # replay planned fewer tasks

    def abort(self, messages, batchId: int) -> None:
        super().abort(messages)


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

    def writer(self, schema, overwrite: bool) -> WarcWriter:
        return WarcWriter(self.options, schema, overwrite)

    def streamWriter(self, schema, overwrite: bool) -> "WarcStreamWriter":
        return WarcStreamWriter(self.options, schema, overwrite)


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


def write_warc_ds(df: DataFrame, path: str, *, num_shards: int = 8,
                  mode: str = "overwrite") -> None:
    """Deterministic WARC export through the registered sink: rows
    md5-shard on url (hash partitioning — stable across runs, cluster
    sizes and upstream partitioning) and sort within each shard on
    every sink column, so each ``part-*.warc.gz``'s BYTES are a pure
    function of (rows, num_shards) — the same shard-reproducibility
    contract as the TFRecord sink (sources/tfrecord.py).  ``num_shards``
    caps the file count: Spark re-hashes the shard key onto tasks, so
    hash-colliding buckets share one (still deterministic, still
    sorted) file and empty tasks write nothing.  WARC-Date is
    second-resolution per WARC/1.0: sub-second timestamp precision
    does not survive a roundtrip (refused nowhere — crawl timestamps
    are whole seconds by convention)."""
    df.sparkSession.dataSource.register(WarcDataSource)
    order = [c for c in ("url", "warc_ts", "rec_type", "http_status",
                         "content_type", "html") if c in df.columns]
    shard = F.crc32(F.md5(F.col("url")).cast("binary")) % num_shards
    (df.repartition(num_shards, shard)
       .sortWithinPartitions(*order)
       .write.format("uvwarc").mode(mode).save(path))


def read_warc_stream(spark: SparkSession, path: str, *,
                     chunk_bytes: int = _DEFAULT_CHUNK) -> DataFrame:
    """Register (idempotent) + tail ``path`` as a streaming source —
    see :class:`WarcStreamReader` for the offset/monotone-name
    contract.  Compose with the engine's watermark/session/stateful
    streaming operators downstream."""
    spark.dataSource.register(WarcDataSource)
    return (spark.readStream.format("uvwarc")
            .option("chunk_bytes", str(chunk_bytes)).load(path))
