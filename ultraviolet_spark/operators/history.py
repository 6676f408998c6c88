"""Feature-store history semantics: SCD2 validity intervals over crawl
observations, and point-in-time lookup against them.

The as-of join (``operators/asof.py``) answers "latest observation ≤ t"
by sorting + merging; the SCD2 form answers the same question as data:
each observation becomes a ``[valid_from, valid_to)`` interval
(``valid_to`` = next observation's timestamp, NULL while current), so a
PIT lookup is a plain interval predicate — the representation feature
stores persist, because it makes *every* historical training-set build
a self-join-free scan.  Training-set reproducibility note: a lookup at
time t returns exactly the feature version a model trained at time t
would have seen — the zero-leakage invariant, by construction (an
interval's data never includes anything after its own valid_from).

Scale: ``scd2_intervals`` is ONE window over (key, ts) — the same
url-hash exchange every other PIT feature shares.  ``pit_lookup`` is an
equi-join on the key plus the interval predicate; over a
key-bucketed layout both sides co-locate (zero extra exchange, see
plans/layout.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_intervals(df: DataFrame, *, by: str = "url",
                   order: str = "warc_ts",
                   tiebreak: str | None = None) -> DataFrame:
    """All input columns + ``valid_from`` (= ``order``), ``valid_to``
    (next observation's ``order``, NULL for the current row) and
    ``is_current``."""
    cols = [F.col(order)] + ([F.col(tiebreak)] if tiebreak else [])
    w = Window.partitionBy(by).orderBy(*cols)
    return (df
            .withColumn("valid_from", F.col(order))
            .withColumn("valid_to", F.lead(order).over(w))
            .withColumn("is_current", F.col("valid_to").isNull()))


def pit_lookup(intervals: DataFrame, probes: DataFrame, *,
               by: str = "url", ts_col: str = "ts",
               how: str = "left") -> DataFrame:
    """For each probe row, the interval row covering its timestamp
    (``valid_from ≤ ts < valid_to``, open current interval matches
    everything ≥ its valid_from).  Probes earlier than the key's first
    observation get NULL feature columns (``how='left'``) or are
    dropped (``how='inner'``).

    Equal to ``asof_join(probes, observations, direction='backward')``
    when intervals are gapless — pinned by a test — but expressed as a
    join against the STORED interval table, which is what a feature
    store executes.
    """
    if how not in ("left", "inner"):
        raise ValueError(f"how must be left|inner, got {how!r}")
    p = probes.alias("__p")
    i = intervals.alias("__i")
    cond = ((F.col(f"__p.{by}") == F.col(f"__i.{by}"))
            & (F.col(f"__i.valid_from") <= F.col(f"__p.{ts_col}"))
            & (F.col("__i.valid_to").isNull()
               | (F.col(f"__p.{ts_col}") < F.col("__i.valid_to"))))
    feat_cols = [c for c in intervals.columns if c not in probes.columns]
    return p.join(i, cond, how).select(
        *[F.col(f"__p.{c}") for c in probes.columns],
        *[F.col(f"__i.{c}") for c in feat_cols])


def snapshot_diff(old: DataFrame, new: DataFrame, *, key: str = "url",
                  fp_cols: tuple[str, ...] = ("text",)) -> DataFrame:
    """Incremental-crawl delta between two snapshots of the pages
    table: one row per key with status ``added`` / ``removed`` /
    ``changed`` / ``unchanged``.

    Content identity is md5 over the fingerprint columns (0x1F-joined,
    engine-portable), so the comparison shuffles ONE 16-byte hash per
    side, never the page bodies.  Plan shape: project→partial-free
    full-outer sort-merge join on ``key`` — a single exchange per side,
    and ZERO exchanges when both snapshots are written with
    ``plans.layout.write_bucketed(key)`` (same mechanics as the
    flagship's bucketed as-of path).  AQE handles key skew; there is
    no driver-side state, so the same plan runs at 10^12 rows.
    """
    fp = F.md5(F.concat_ws("\x1f", *[F.col(c).cast("string")
                                     for c in fp_cols]))
    o = old.select(F.col(key), fp.alias("__fp_old"))
    n = new.select(F.col(key), fp.alias("__fp_new"))
    j = o.join(n, on=key, how="full_outer")
    status = (F.when(F.col("__fp_old").isNull(), F.lit("added"))
              .when(F.col("__fp_new").isNull(), F.lit("removed"))
              .when(F.col("__fp_old") != F.col("__fp_new"),
                    F.lit("changed"))
              .otherwise(F.lit("unchanged")))
    return j.select(F.col(key), status.alias("status"))


def diff_summary(diff: DataFrame) -> DataFrame:
    """(status, n) rollup of a :func:`snapshot_diff` — the four-line
    crawl-delta report (how much re-fetch work did this crawl create)."""
    return diff.groupBy("status").agg(F.count("*").alias("n"))


def incremental_agg(prev: DataFrame | None, delta: DataFrame, *,
                    keys: list[str], count_col: str = "n",
                    sums: dict[str, str] | None = None) -> DataFrame:
    """Incremental materialized-aggregate maintenance for append-only
    data: fold a new crawl's DELTA into the stored per-key aggregate
    WITHOUT rescanning history — counts and sums are commutative
    monoids, so ``agg(old ∪ delta) = merge(agg(old), agg(delta))``.

    ``prev`` is the previously materialized aggregate (schema: keys +
    count_col + sum columns; None bootstraps), ``delta`` is raw new
    rows; ``sums`` maps output column → source column.  Shuffle ∝
    distinct keys in prev+delta, never history size — the 100 TB
    nightly-update shape (store the result via plans.snapshots and the
    whole thing is resumable + lineage-tracked).  min/max merge the
    same way; avg must be stored as (count, sum); non-monoid aggregates
    (exact distinct) need the sketch tables (operators.sketches)."""
    sums = sums or {}
    d = delta.groupBy(*keys).agg(
        F.count("*").cast("long").alias(count_col),
        *[F.sum(src).alias(out) for out, src in sums.items()])
    if prev is None:
        return d
    u = prev.select(*keys, count_col, *sums).unionByName(
        d.select(*keys, count_col, *sums))
    return u.groupBy(*keys).agg(
        F.sum(count_col).cast("long").alias(count_col),
        *[F.sum(out).alias(out) for out in sums])


def resample_grid(df: DataFrame, *, by: str = "user_id",
                  ts_col: str = "ts", value_col: str = "value",
                  every_hours: int = 6) -> DataFrame:
    """Regular-grid resampling with last-observation-carried-forward:
    per entity, generate a fixed ``every_hours`` timestamp grid spanning
    [date_trunc('hour', min ts), max ts] and as-of backfill the latest
    observation ≤ each grid point — the step that turns an irregular
    event log into the fixed-frequency matrix a sequence model trains
    on, with zero temporal leakage (backward as-of only).

    Returns ``(by, grid_ts, last_value, gap_us)`` where ``gap_us`` is
    the staleness of the carried observation in exact integer
    microseconds (NULL before the first observation, as is
    ``last_value`` — grids start at the hour-truncated minimum).

    Ties on (entity, ts) are pre-collapsed to max(value) so the as-of
    pick is deterministic on both engines.

    Scale notes: the span agg, the grid explode and the as-of all hash
    on ``by`` — the single-exchange-per-side regime of every PIT op
    here (operators/asof.py).  Grid cardinality is entities × span/step,
    independent of event count.
    """
    from ultraviolet_spark.operators.asof import asof_join

    obs = (df.groupBy(by, ts_col)
           .agg(F.max(F.col(value_col).cast("double")).alias("__v"))
           .withColumn("__obs_ts", F.col(ts_col)))  # value_cols must
    # not contain right_on itself — carry the obs ts under its own name
    spans = df.groupBy(by).agg(
        F.date_trunc("hour", F.min(ts_col)).alias("__t0"),
        F.max(ts_col).alias("__t1"))
    grid = spans.select(
        F.col(by),
        F.explode(F.sequence(
            "__t0", "__t1",
            F.expr(f"interval {int(every_hours)} hours"))).alias("grid_ts"))
    j = asof_join(grid, obs, on="grid_ts", right_on=ts_col, by=by,
                  value_cols=["__v", "__obs_ts"], direction="backward")
    return j.select(
        F.col(by), "grid_ts", F.col("__v").alias("last_value"),
        (F.unix_micros(F.col("grid_ts").cast("timestamp"))
         - F.unix_micros(F.col("__obs_ts").cast("timestamp")))
        .cast("long").alias("gap_us"))  # NTZ→TS is identity under the
        # session's pinned UTC (session.py), so the epoch diff is exact


def merge_upsert(base: DataFrame, changes: DataFrame, *,
                 key: str = "doc_id",
                 ts_col: str = "ts", seq_col: str = "seq",
                 op_col: str = "op",
                 payload: tuple[str, ...] = ("text",)) -> DataFrame:
    """Lakehouse MERGE: apply one CDC batch of I/U/D changes to a base
    snapshot, last-writer-wins — the nightly "apply today's recrawl
    deltas to the pages table" primitive that Delta/Iceberg call
    ``MERGE INTO``, expressed engine-neutrally.

    Semantics: per key, changes are totally ordered by
    ``(ts_col, seq_col)`` (``seq_col`` MUST be unique per key at equal
    timestamps — commit sequence number; the order is then total, so
    the result is partitioning-independent).  The LAST change wins:
    final op I or U → the key exists with that change's payload
    (upsert — I vs U differ only in the audit column), final op D →
    the key is absent from the result, even if it re-appeared earlier
    in the same batch.  A D followed by a later U resurrects the key.
    Base rows with no change pass through untouched.

    Returns base's schema (``key`` + ``payload``) plus ``action`` ∈
    {'kept', 'upserted'} — deleted keys simply don't appear.

    Scale: ONE partial-aggregated max(struct) shuffle collapses the
    change batch to a single row per key (map-side combine makes the
    shuffle ∝ distinct changed keys, not change rows), then ONE
    full-outer join against base on ``key`` — the same
    single-exchange-per-side shape as :func:`snapshot_diff`, and zero
    exchanges for the base side over a ``write_bucketed(key)`` layout.
    The change batch is typically ≪ base (a day's recrawl vs the
    corpus), so AQE will broadcast the collapsed side when it fits.
    """
    last = (changes.groupBy(key)
            .agg(F.max(F.struct(
                F.col(ts_col).alias("__ts"),
                F.col(seq_col).alias("__seq"),
                F.col(op_col).alias("__op"),
                *[F.col(c).alias(c) for c in payload])).alias("__w")))
    last = last.select(
        F.col(key),
        F.col("__w.__op").alias("__op"),
        *[F.col(f"__w.{c}").alias(f"__c_{c}") for c in payload])
    b = base.select(
        F.col(key), *[F.col(c).alias(f"__b_{c}") for c in payload])
    j = b.join(last, on=key, how="full_outer")
    merged = j.filter(F.col("__op").isNull() | (F.col("__op") != F.lit("D")))
    take_change = F.col("__op").isNotNull()
    return merged.select(
        F.col(key),
        *[F.when(take_change, F.col(f"__c_{c}"))
          .otherwise(F.col(f"__b_{c}")).alias(c) for c in payload],
        F.when(take_change, F.lit("upserted"))
        .otherwise(F.lit("kept")).alias("action"))


# --------------------------------------------------------------------------
# Merkle-style release digests: compare two corpus releases at metadata
# cost, then drill row-level ONLY into the buckets that differ.

def _row_h48(cols) -> F.Column:
    """48-bit content hash of a row: conv of the first 12 md5 hex chars
    over a canonical '\\x1f'-joined rendering (NULL → '\\x00' sentinel,
    so NULL never collides with empty string and concat_ws can't
    silently skip it).  48 bits keeps the value positive in both
    engines' signed arithmetic."""
    parts = [F.coalesce(F.col(c).cast("string"), F.lit("\x00"))
             for c in cols]
    canon = F.concat_ws("\x1f", *parts)
    return (F.conv(F.substring(F.md5(canon.cast("binary")), 1, 12), 16, 10)
            .cast("long"))


def release_digest(df: DataFrame, *, key_col: str,
                   cols: list[str] | None = None) -> DataFrame:
    """Per-bucket Merkle digest of a release: 256 rows of
    ``(bucket, n_rows, xor48, sum48)``.

    Buckets come from md5(key) — KEY-based, not content-based, so an
    edited document perturbs exactly its own bucket instead of
    "moving" between two.  Each bucket digests its rows order-
    independently three ways: count, XOR-fold of the 48-bit content
    hashes, and their sum mod 2^48 (the sum crosses int64 at ~2^15
    rows/bucket, so it accumulates in DECIMAL(38,0) first).  XOR alone
    is blind to any row duplicated an even number of times; count+sum
    repair exactly that class — a release differing in any one row
    changes at least one of the three with probability 1−2^-48.

    At 10^12 rows this is one scan + one 256-group partial agg; two
    releases compare as 256-row frames, and ``digest_drill`` touches
    row-level data only inside differing buckets — the log-time
    release-audit shape, vs ``snapshot_diff``'s full-corpus join.
    """
    cols = list(df.columns) if cols is None else list(cols)
    from ultraviolet_spark.operators.corpus import md5_bucket256
    b = md5_bucket256(F.col(key_col))
    h = _row_h48(cols)
    return (df.select(b.cast("int").alias("bucket"), h.alias("h48"))
            .groupBy("bucket")
            .agg(F.count("*").alias("n_rows"),
                 F.expr("bit_xor(h48)").alias("xor48"),
                 (F.sum(F.col("h48").cast("decimal(38,0)"))
                  % F.lit(2 ** 48)).cast("long").alias("sum48")))


def digest_diff(da: DataFrame, db: DataFrame) -> DataFrame:
    """Buckets whose digests differ between two releases (full outer on
    bucket; a bucket present on one side only differs by definition).
    256-row frames — driver-negligible whatever the corpus size."""
    a = da.select("bucket", F.col("n_rows").alias("n_a"),
                  F.col("xor48").alias("x_a"), F.col("sum48").alias("s_a"))
    b = db.select("bucket", F.col("n_rows").alias("n_b"),
                  F.col("xor48").alias("x_b"), F.col("sum48").alias("s_b"))
    j = a.join(b, "bucket", "full_outer")
    diff = (j.filter(
        F.col("n_a").isNull() | F.col("n_b").isNull()
        | (F.col("n_a") != F.col("n_b"))
        | (F.col("x_a") != F.col("x_b"))
        | (F.col("s_a") != F.col("s_b"))))
    return diff.select("bucket", "n_a", "n_b")


def digest_drill(a: DataFrame, b: DataFrame, buckets: DataFrame, *,
                 key_col: str, cols: list[str] | None = None) -> DataFrame:
    """Row-level diff restricted to candidate buckets: returns one row
    per affected key with status added / removed / changed.  Each side
    is pre-filtered by a broadcast semi-join on the (≤256-row) bucket
    list, so the full-outer key join only ever shuffles the slice of
    the corpus living in differing buckets."""
    cols = ([c for c in a.columns] if cols is None else list(cols))
    from ultraviolet_spark.operators.corpus import md5_bucket256
    bk = F.broadcast(buckets.select("bucket"))

    def side(df, tag):
        return (df.withColumn("bucket",
                              md5_bucket256(F.col(key_col)).cast("int"))
                .join(bk, "bucket", "left_semi")
                .select("bucket", F.col(key_col).alias("key"),
                        _row_h48(cols).alias(f"h_{tag}")))

    j = side(a, "a").withColumnRenamed("bucket", "bucket_a").join(
        side(b, "b").withColumnRenamed("bucket", "bucket_b"),
        "key", "full_outer")
    status = (F.when(F.col("h_b").isNull(), "removed")
              .when(F.col("h_a").isNull(), "added")
              .when(F.col("h_a") != F.col("h_b"), "changed"))
    return (j.withColumn("status", status)
            .filter(F.col("status").isNotNull())
            .select(F.col("key").alias(key_col),
                    F.coalesce("bucket_a", "bucket_b").alias("bucket"),
                    "status"))
