"""Single flagship-pipeline run at a fixed parallelism (subprocess
worker for tools/scaling_bench.py).  Prints one JSON line:
{"cores": N, "pages": P, "sec": S, "pages_per_sec": R}
Timing excludes JVM/session startup and Python-worker warm-up.
"""

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
    ap.add_argument("--replicate", type=int, default=48)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--batch", type=int, default=2000,
                    help="arrow maxRecordsPerBatch — raise for small "
                         "rows, lower for multi-KB html blobs")
    ap.add_argument("--text-repeat", type=int, default=20,
                    help="tile doc text to web-realistic page size "
                         "(~10 KB at 20)")
    args = ap.parse_args()

    from bench import build_flagship
    from ultraviolet_spark.session import get_spark

    spark = get_spark("flagship_scale", cores=args.cores,
                      shuffle_partitions=args.cores,
                      extra_conf={
                          "spark.sql.execution.arrow.maxRecordsPerBatch":
                              str(args.batch),
                      })
    spark.sparkContext.setLogLevel("ERROR")

    n_pages = (spark.read.parquet(f"{args.sf_dir}/documents.parquet").count()
               * args.replicate)

    def materialize():
        (build_flagship(spark, args.sf_dir, replicate=args.replicate,
                        text_repeat=args.text_repeat)
         .write.mode("overwrite").format("noop").save())
        spark.catalog.clearCache()  # drop the per-run persisted features

    # warm-up: full pipeline once (codegen + python workers)
    (build_flagship(spark, args.sf_dir, replicate=max(args.replicate // 8, 1),
                    text_repeat=args.text_repeat)
     .write.mode("overwrite").format("noop").save())

    times = []
    for _ in range(args.runs):
        t0 = time.perf_counter()
        materialize()
        times.append(time.perf_counter() - t0)
    sec = min(times)
    print(json.dumps({
        "cores": args.cores, "pages": n_pages, "sec": round(sec, 3),
        "all_runs_sec": [round(t, 3) for t in times],
        "pages_per_sec": round(n_pages / sec, 1),
    }))


if __name__ == "__main__":
    main()
