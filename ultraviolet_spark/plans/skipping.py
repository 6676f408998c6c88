"""File-level zone-map data skipping — the metadata index that turns a
Z-ordered / range-sorted layout (plans/layout.py) into actual scan
pruning.

At 10^12-document scale a table is 10^5–10^6 parquet files.  Spark's
own parquet filter pushdown only skips row groups AFTER a task has
been scheduled and opened the footer — the cluster still pays one task
per file.  A zone map is the planner-side complement (Netezza zone
maps / Postgres BRIN / the min-max half of Iceberg manifests and Delta
file stats): one metadata row per (file, column) with min / max /
null_count harvested from the parquet FOOTERS — O(KB) per file, never
the data — kept as a tiny table.  Pruning a predicate against it is a
metadata-scale query whose output, the survivor file list, is exactly
what the scan needs anyway.  Harvesting is distributed (one footer
read per executor task), so building the map over 10^6 files is a
listing-sized job, and the map itself is ~rows = files × columns,
storable and incrementally maintainable next to the table.

Safety model — conservative by construction:

* a file is skipped ONLY when its stats PROVE no row can match
  (``max < v`` for ``col >= v``, value outside ``[min, max]`` for
  equality, ...);
* missing / partial stats keep the file (``has_stats`` false);
* comparison predicates never match NULL, so an all-null file
  (``null_count == num_rows``) IS provably prunable;
* parquet writers may truncate BINARY min/max, but the spec requires
  truncated bounds to stay valid bounds (min truncates downward, max
  pads upward), so the stored ``[min, max]`` always CONTAINS the true
  range and string pruning stays conservative;
* the residual predicate is always re-applied after the pruned scan —
  the zone map is an optimization, never a correctness dependency.

Supported predicate ops: ``>= > <= < = between``, AND-combined.
Columns of long/double/string parquet physical types participate;
anything else is kept conservatively.
"""

from __future__ import annotations

import os
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_ZM_SCHEMA = T.StructType([
    T.StructField("file", T.StringType()),
    T.StructField("column", T.StringType()),
    T.StructField("kind", T.StringType()),        # long | double | string | other
    T.StructField("num_rows", T.LongType()),
    T.StructField("null_count", T.LongType()),    # NULL when any row group omits it
    T.StructField("has_stats", T.BooleanType()),
    T.StructField("min_long", T.LongType()),
    T.StructField("max_long", T.LongType()),
    T.StructField("min_dbl", T.DoubleType()),
    T.StructField("max_dbl", T.DoubleType()),
    T.StructField("min_str", T.StringType()),
    T.StructField("max_str", T.StringType()),
])

_OPS = ("ge", "gt", "le", "lt", "eq", "between")


def _list_parquet_files(path: str) -> list[str]:
    """Deterministic (sorted) listing of data files under ``path``.
    Listing is O(files) and unavoidable for ANY planner; everything
    downstream of it is metadata-scale."""
    if os.path.isfile(path):
        return [path]
    out = []
    for root, dirs, names in os.walk(path):
        # Spark/Hadoop convention: _ and . prefixed entries are metadata,
        # not data — prune the DIRS in place so a persisted `_zonemap/`
        # (or `_delta_log/`, `_SUCCESS`, ...) never masquerades as data.
        dirs[:] = [d for d in dirs if not d.startswith(("_", "."))]
        for n in names:
            if n.endswith(".parquet") and not n.startswith(("_", ".")):
                out.append(os.path.join(root, n))
    return sorted(out)


def _kind_of(physical: str, converted: str, logical) -> str:
    # Parquet physical types: INT32/INT64 → long, FLOAT/DOUBLE → double,
    # BYTE_ARRAY with a string logical/converted type → string.
    if physical in ("INT32", "INT64"):
        return "long"
    if physical in ("FLOAT", "DOUBLE"):
        return "double"
    if physical == "BYTE_ARRAY":
        txt = "STRING" in str(converted).upper() or "String" in str(logical)
        return "string" if txt else "other"
    return "other"


def _harvest_one(path: str, want: list[str] | None) -> Iterator[tuple]:
    """One footer → one tall row per requested column.  Runs executor-
    side; touches only the footer bytes (pyarrow reads the footer
    lazily — row-group data is never fetched)."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(path).metadata
    names = [md.schema.column(i).name for i in range(md.num_columns)]
    for ci, name in enumerate(names):
        if want is not None and name not in want:
            continue
        sc = md.schema.column(ci)
        kind = _kind_of(sc.physical_type, sc.converted_type, sc.logical_type)
        mins: list = []
        maxs: list = []
        nulls: int | None = 0
        ok = kind != "other"
        n_rows = 0
        for rg in range(md.num_row_groups):
            col = md.row_group(rg).column(ci)
            n = md.row_group(rg).num_rows
            n_rows += n
            if n == 0:
                continue
            st = col.statistics
            # null_count is only meaningful when the writer set it —
            # pyarrow's property is undefined otherwise (has_null_count
            # gates it), and a fabricated 0 would wrongly disqualify
            # the all-null prune below.
            rg_nulls = (st.null_count
                        if st is not None and st.has_null_count else None)
            if st is not None and st.has_min_max:
                mins.append(st.min)
                maxs.append(st.max)
            elif rg_nulls != n:
                # No min/max AND not provably all-null: this row group
                # could hold anything — the file's stats are unusable.
                ok = False
            if rg_nulls is not None and nulls is not None:
                nulls += rg_nulls
            else:
                nulls = None
        # A column whose every value is NULL in every row group has no
        # min/max by definition — that is not "missing stats", it is
        # the strongest stat there is (comparisons can never match).
        all_null = nulls is not None and nulls == n_rows
        if not ok and not all_null:
            yield (path, name, kind, n_rows, nulls, False,
                   None, None, None, None, None, None)
            continue
        lo = min(mins) if mins else None
        hi = max(maxs) if maxs else None
        row = [path, name, kind, n_rows, nulls, True,
               None, None, None, None, None, None]
        if lo is not None:
            if kind == "long":
                row[6], row[7] = int(lo), int(hi)
            elif kind == "double":
                row[8], row[9] = float(lo), float(hi)
            elif kind == "string":
                row[10], row[11] = str(lo), str(hi)
        yield tuple(row)


def _harvest_df(spark: SparkSession, files: list[str],
                cols: list[str] | None) -> DataFrame:
    fdf = spark.createDataFrame([(f,) for f in files], "file string")
    # ~256 footers per task: small enough to parallelize a big listing,
    # large enough that task overhead doesn't dominate footer reads.
    n_tasks = max(1, (len(files) + 255) // 256)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [r for f in pdf["file"] for r in _harvest_one(f, cols)]
            if rows:
                yield pd.DataFrame(rows, columns=[f.name for f in _ZM_SCHEMA])

    return fdf.repartition(n_tasks).mapInPandas(gen, schema=_ZM_SCHEMA)


def harvest_zonemap(spark: SparkSession, path: str,
                    cols: list[str] | None = None) -> DataFrame:
    """Distributed footer harvest → tall zone-map DataFrame (one row
    per file × column).  One executor task reads a batch of footers;
    at 10^6 files this is a listing-sized job, not a data-scale one."""
    files = _list_parquet_files(path)
    if not files:
        raise ValueError(f"no parquet data files under {path!r}")
    return _harvest_df(spark, files, cols)


def update_zonemap(spark: SparkSession, path: str,
                   zonemap: DataFrame,
                   cols: list[str] | None = None) -> DataFrame:
    """Incremental maintenance for a live (append-mostly) table: footers
    are read ONLY for files not yet in the map, rows for deleted files
    drop out, surviving rows pass through untouched — maintenance cost
    is proportional to the DELTA, not the table, which is the whole
    point at a crawl table growing by 10^3 shards/day on a 10^6-file
    base.  Parquet data files are immutable by convention (compaction
    writes NEW names); an in-place rewrite under the same name is
    invisible to this listing-keyed delta, as it is to every
    manifest-based table format.
    """
    listing = set(_list_parquet_files(path))
    known_rows = zonemap.select("file", "column").collect()
    known = {r["file"] for r in known_rows}
    if cols is None:
        cols = sorted({r["column"] for r in known_rows}) or None
    fresh = sorted(listing - known)
    removed = known - listing
    if not removed:
        kept = zonemap
    elif len(removed) <= 4096:
        kept = zonemap.where(~F.col("file").isin(*removed))
    else:
        # Bulk retention sweep: an IN-list of 10^5 literals would bloat
        # the plan — anti-join against the removed set instead.
        rm = spark.createDataFrame([(f,) for f in sorted(removed)],
                                   "file string")
        kept = zonemap.join(rm, "file", "left_anti")
    if not fresh:
        return kept
    return kept.unionByName(_harvest_df(spark, fresh, cols))


def save_zonemap(zonemap: DataFrame, path: str) -> None:
    """Persist the map UNDER the table at ``{path}/_zonemap`` — the
    underscore prefix keeps it invisible to Spark's data listing (and
    to :func:`_list_parquet_files`), exactly how manifest-style
    metadata lives next to a table.  The map is metadata-scale, so one
    output file keeps later loads a single-task read.

    Do NOT pass a DataFrame that lazily READS ``{path}/_zonemap``
    (e.g. a ``load_zonemap`` result): ``mode("overwrite")`` deletes
    the input's own files before the plan runs.  ``refresh_zonemap``
    materializes through the driver for exactly this reason."""
    zonemap.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(path, "_zonemap"))


def load_zonemap(spark: SparkSession, path: str) -> DataFrame | None:
    """Read a persisted map, or ``None`` if the table has none yet."""
    zp = os.path.join(path, "_zonemap")
    if not os.path.isdir(zp):
        return None
    return spark.read.schema(_ZM_SCHEMA).parquet(zp)


def refresh_zonemap(spark: SparkSession, path: str,
                    cols: list[str] | None = None) -> DataFrame:
    """Load-or-harvest, apply the incremental delta, persist, return.
    Not concurrent-writer-safe: at real table-format scale this update
    rides the manifest commit; here the overwrite is the single-writer
    maintenance job a crawl pipeline runs after each ingest batch."""
    prior = load_zonemap(spark, path)
    if prior is None:
        zm = harvest_zonemap(spark, path, cols)
    else:
        # Materialize before the overwrite: the updated plan READS the
        # old `_zonemap` files that mode("overwrite") deletes first.
        zm = update_zonemap(spark, path, prior, cols)
    pdf = zm.toPandas()
    out = spark.createDataFrame(pdf, schema=_ZM_SCHEMA)
    save_zonemap(out, path)
    return load_zonemap(spark, path)


def _can_match(op: str, v) -> F.Column:
    """Per-zonemap-row boolean: could ANY row of this file match
    ``col <op> v``, judging only by this row's typed min/max?  NULL
    stats (has_stats false) are handled by the caller."""
    def by_kind(f):
        return (F.when(F.col("kind") == "long",
                       f(F.col("min_long"), F.col("max_long")))
                 .when(F.col("kind") == "double",
                       f(F.col("min_dbl"), F.col("max_dbl")))
                 .when(F.col("kind") == "string",
                       f(F.col("min_str"), F.col("max_str")))
                 .otherwise(F.lit(True)))
    if op == "ge":
        return by_kind(lambda lo, hi: hi >= F.lit(v))
    if op == "gt":
        return by_kind(lambda lo, hi: hi > F.lit(v))
    if op == "le":
        return by_kind(lambda lo, hi: lo <= F.lit(v))
    if op == "lt":
        return by_kind(lambda lo, hi: lo < F.lit(v))
    if op == "eq":
        return by_kind(lambda lo, hi: (lo <= F.lit(v)) & (hi >= F.lit(v)))
    if op == "between":
        lo_v, hi_v = v
        return by_kind(lambda lo, hi: (hi >= F.lit(lo_v)) & (lo <= F.lit(hi_v)))
    raise ValueError(f"unknown op {op!r} (want one of {_OPS})")


def prune_files(zonemap: DataFrame,
                preds: list[tuple]) -> tuple[list[str], int]:
    """Evaluate AND-combined predicates ``[(col, op, value), ...]``
    against the zone map.  Returns ``(survivor_files, total_files)``.
    Runs as a Spark query over the metadata-scale map; only the
    survivor path list (exactly what a scan must enumerate anyway)
    reaches the driver."""
    if not preds:
        files = sorted(r["file"] for r in zonemap.select("file").distinct().collect())
        return files, len(files)
    ok = F.lit(True)
    for col, op, v in preds:
        # A zonemap row constrains only predicates on ITS column; rows
        # for other columns pass through.  All-null files are provably
        # unmatched by any comparison; missing stats keep the file.
        row_ok = (F.when(F.col("column") != col, F.lit(True))
                   .when(F.col("null_count") == F.col("num_rows"), F.lit(False))
                   .when(~F.col("has_stats"), F.lit(True))
                   .otherwise(_can_match(op, v)))
        ok = ok & F.coalesce(row_ok, F.lit(True))
    per_file = (zonemap.groupBy("file")
                .agg(F.min(ok.cast("int")).alias("keep"),
                     F.count("*").alias("n_cols")))
    rows = per_file.collect()
    # A file whose harvest lacks a predicate column entirely (cols= was
    # narrower than the predicate) contributes no row_ok=False row for
    # it, so it is kept — conservative by construction.
    survivors = sorted(r["file"] for r in rows if r["keep"] == 1)
    return survivors, len(rows)


def _residual(preds: list[tuple]) -> F.Column:
    cond = F.lit(True)
    for col, op, v in preds:
        c = F.col(col)
        if op == "between":
            cond = cond & (c >= F.lit(v[0])) & (c <= F.lit(v[1]))
        else:
            f = {"ge": c.__ge__, "gt": c.__gt__, "le": c.__le__,
                 "lt": c.__lt__, "eq": c.__eq__}[op]
            cond = cond & f(F.lit(v))
    return cond


def skipping_scan(spark: SparkSession, path: str, preds: list[tuple], *,
                  zonemap: DataFrame | None = None) -> DataFrame:
    """Zone-map-pruned scan: read only files whose stats admit a match,
    then re-apply the full predicate (pruning is file-granular; the
    residual filter restores row granularity and keeps correctness
    independent of the map)."""
    zm = zonemap if zonemap is not None else harvest_zonemap(
        spark, path, cols=sorted({c for c, _, _ in preds}))
    survivors, _total = prune_files(zm, preds)
    if zonemap is not None:
        # A caller-supplied (possibly persisted, possibly STALE) map
        # only prunes files it has stats for: anything in the live
        # listing the map has never seen MUST be scanned — otherwise a
        # lagging maintenance job would silently drop fresh data, the
        # one failure mode a skipping index is never allowed to have.
        mapped = {r["file"] for r in zm.select("file").distinct().collect()}
        unseen = [f for f in _list_parquet_files(path) if f not in mapped]
        survivors = sorted(set(survivors) | set(unseen))
    if not survivors:
        # Catalyst folds filter(false) to an empty relation — the full
        # listing is consulted for schema only, no data task runs.
        return spark.read.parquet(path).where(F.lit(False))
    return spark.read.parquet(*survivors).where(_residual(preds))
