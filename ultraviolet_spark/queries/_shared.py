"""Named query registry: every SURVEY.md §2 operator gets a Spark query
and (where SQL-expressible) a matching DuckDB oracle SQL string.

Parity rules (so the driver's row-count + schema + value-hash gate
passes deterministically):

* every computed column is aliased identically on both sides;
* money/quantity aggregates go through DECIMAL(18,2) (exact, associative)
  and are cast to DOUBLE only at the end — double SUMs would differ in
  the last ulp between engines because addition order differs;
* averages are CAST(SUM(decimal) AS DOUBLE)/COUNT so both engines do
  one identical double division;
* per-row double ratios that get averaged are round()ed after the agg;
* every window/top-k ordering carries an explicit unique tie-break key;
* timestamp gaps use integer microseconds divided by 1e6 — identical
  operands, identical result.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ultraviolet_spark.operators import dedup as D
from ultraviolet_spark.operators import similarity as S
from ultraviolet_spark.operators import textstats as X
from ultraviolet_spark.operators.asof import asof_join
from ultraviolet_spark.operators.windows import (
    dedup_latest,
    sessionize,
    with_ffill,
    with_lags,
    with_leads,
)


@dataclass
class QuerySpec:
    fn: Callable[[SparkSession, str], DataFrame]
    sql: str | None  # DuckDB oracle; None → rows-only check


REGISTRY: dict[str, QuerySpec] = {}


def q(name: str, sql: str | None):
    def deco(fn):
        def build(spark: SparkSession, sf_dir: str) -> DataFrame:
            # Pin the session timezone for EVERY registry query, not just
            # the F.window ones: ``spark.sql.session.timeZone`` is resolved
            # at execution time, so a per-query conf.set with no restore
            # (as q48/q49 once did) made results order-dependent for any
            # tz-sensitive query built earlier but executed later.  A
            # uniform UTC pin at build time makes the registry a
            # deterministic function of (query, data) under any driver
            # session; get_spark() sessions are already UTC (session.py).
            spark.conf.set("spark.sql.session.timeZone", "UTC")
            return fn(spark, sf_dir)

        build.__name__ = fn.__name__
        build.__doc__ = fn.__doc__
        REGISTRY[name] = QuerySpec(build, sql)
        return fn
    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _dec(col: str | F.Column):
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("decimal(18,2)")
