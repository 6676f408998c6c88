"""Cluster-submission smoke job (north_rule: jobs run via spark-submit
--py-files).  Run as:

  python tools/make_pyfiles_zip.py /tmp/uvspark.zip
  spark-submit --master local[4] --py-files /tmp/uvspark.zip \
      tools/submit_smoke.py /root/testdata/sf0.001

Imports the engine ONLY from the shipped zip (no repo on sys.path),
runs the flagship + one oracle query, prints one JSON line.
"""

from __future__ import annotations

import json
import sys

from pyspark.sql import SparkSession


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = SparkSession.builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    from ultraviolet_spark.pipeline import flagship_enriched
    from ultraviolet_spark.queries import REGISTRY
    from ultraviolet_spark.sources.pages_from_docs import pages_from_documents

    pages = pages_from_documents(spark, sf_dir)
    n = flagship_enriched(pages).count()
    q1 = REGISTRY["q01_pricing_summary"].fn(spark, sf_dir).count()
    # q51 reads a committed parquet fixture — exercises the zip-extract
    # fallback in queries._read_fixture (VERDICT r2: this query used to
    # be un-runnable from inside a --py-files zip)
    q51 = REGISTRY["q51_flagship_vs_golden"].fn(spark, sf_dir).count()
    print(json.dumps({"flagship_rows": n, "q01_rows": q1, "q51_rows": q51,
                      "ok": n > 0 and q1 > 0 and q51 > 0}))


if __name__ == "__main__":
    main()
