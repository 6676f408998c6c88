"""Per-stage wall-clock profile of the flagship pipeline at a given
parallelism (diagnostic for scaling work)."""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, required=True)
    ap.add_argument("--replicate", type=int, default=192)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--text-repeat", type=int, default=1)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from ultraviolet_spark.functions.udfs import extract_stage
    from ultraviolet_spark.operators.windows import dedup_latest
    from ultraviolet_spark.operators.asof import asof_join
    from ultraviolet_spark.pipeline import feature_vector
    from ultraviolet_spark.session import get_spark
    from ultraviolet_spark.sources.pages_from_docs import pages_from_documents

    spark = get_spark("stage_profile", cores=args.cores,
                      shuffle_partitions=args.cores)
    spark.sparkContext.setLogLevel("ERROR")

    def mat(df):
        df.write.mode("overwrite").format("noop").save()

    def timed(name, build, out):
        mat(build())          # warm
        t0 = time.perf_counter()
        mat(build())
        out[name] = round(time.perf_counter() - t0, 2)

    res: dict[str, float] = {}
    pages = lambda: pages_from_documents(spark, args.sf_dir, replicate=args.replicate, text_repeat=args.text_repeat)  # noqa: E731
    timed("1_synth", pages, res)
    timed("2_synth_extract", lambda: extract_stage(pages()), res)
    timed("3_features", lambda: feature_vector(extract_stage(pages())), res)

    def full():
        f = feature_vector(extract_stage(pages()))
        src = dedup_latest(f, by=["url"], order="warc_ts", keep="first").select(
            "url", "warc_ts", F.col("text_len").alias("first_text_len"))
        return asof_join(f, src, on="warc_ts", by="url",
                         value_cols=["first_text_len"])

    timed("4_full_asof", full, res)
    print(json.dumps({"cores": args.cores, "stages": res}))


if __name__ == "__main__":
    main()
