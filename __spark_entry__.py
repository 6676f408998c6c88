"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship point-in-time feature pipeline (BASELINE
north_rule): documents.parquet → deterministic Common-Crawl-style pages
(url, warc_ts, html binary in mixed encodings, lang) → numpy
transcode/validate/extract (mapInArrow) → windowed features (lags,
lang-stability, forward-fill, sessionization) → backward as-of join
against a per-url first-crawl feature source.

``queries`` / ``oracle_sql`` expose the operator registry in
ultraviolet_spark.queries — one named Spark query per SURVEY.md §2
operator with a matching DuckDB oracle where SQL-expressible.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from ultraviolet_spark.pipeline import flagship_enriched
    from ultraviolet_spark.sources.pages_from_docs import pages_from_documents

    pages = pages_from_documents(spark, "/root/testdata/sf0.001")
    return flagship_enriched(pages)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from ultraviolet_spark import queries as Q

    return Q.queries()


def oracle_sql() -> dict[str, str]:
    from ultraviolet_spark import queries as Q

    return Q.oracle_sql()
