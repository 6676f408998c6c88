"""Headline benchmark.  Runs the flagship point-in-time feature
pipeline plus representative operator queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line:

  {"metric": ..., "value": median_total_sec, "unit": "sec",
   "band": {min, max}, "passes": [...], "best_total": ...,
   "queries": {name: best_sec, ...}, "sf": ..., "pages_per_sec": ...}

The suite runs UV_BENCH_PASSES (default 3) INTERLEAVED full passes;
"value" is the median pass total (robust to this host's ±50%
minute-scale swings), "queries" are per-line minima across passes
(comparable with the r1-r3 best-of tables).

Every query is fully materialized through the `noop` sink (no IO cost,
no column-pruning shortcuts).  The flagship reads a pages table
materialized once (untimed) from documents.parquet at REPLICATE×
volume — the north-rule job READS an Iceberg/parquet pages table;
synthesizing it is input prep, not engine work — so the pages/sec
number reflects sustained engine throughput, not startup overhead.

Scaling-efficiency evidence (north_rule: ≥0.8 from N to 4N cores) is
produced by tools/scaling_bench.py, recorded in BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REPLICATE = int(os.environ.get("UV_BENCH_REPLICATE", "24"))


def _materialize(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def build_flagship(spark, sf_dir, replicate: int | None = None,
                   text_repeat: int = 1):
    """Flagship over inline-synthesized pages (correctness/smoke shape)."""
    from ultraviolet_spark.pipeline import flagship_enriched
    from ultraviolet_spark.sources.pages_from_docs import pages_from_documents

    pages = pages_from_documents(spark, sf_dir,
                                 replicate=replicate or REPLICATE,
                                 text_repeat=text_repeat)
    return flagship_enriched(pages)


def build_flagship_from_table(spark, pages_path: str):
    """Flagship over a materialized pages table — the north-rule job
    shape (the job READS an Iceberg/parquet pages table; synthesis is
    not part of the job) and the shape both benchmarks time."""
    from ultraviolet_spark.pipeline import flagship_enriched

    return flagship_enriched(spark.read.parquet(pages_path))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = -1.0

    from ultraviolet_spark import queries as Q
    from ultraviolet_spark.session import get_spark

    # shuffle partitions: this single-box host saturates its memory bus
    # at ~8 concurrent post-shuffle lanes (BASELINE.md envelope section);
    # measured 2× flagship speedup at sp=8 vs sp=32 on local[32].  On a
    # real cluster size shuffle partitions to ≤200 MB each instead.
    sp = cores if cores <= 8 else max(8, cores // 4)
    spark = get_spark("bench", cores=cores, shuffle_partitions=sp)
    spark.sparkContext.setLogLevel("ERROR")

    n_pages = (spark.read.parquet(f"{sf_dir}/documents.parquet").count()
               * REPLICATE)

    headline = [
        "q01_pricing_summary",
        "q02_top_revenue_orders",
        "q07_cumulative_spend",
        "q12_sessionize_events",
        "q15_asof_click_purchase",
        "q20_token_stats",
        "q19_exact_dup_classes",
        "q25_minhash_lsh_pairs",   # the near-dup SCALE path (q24 is its
                                   # O(n²) oracle, driver-checked at sf0.01)
        "q27_cosine_top10",
    ]

    # Materialize the two pages-table shapes (untimed — the north-rule
    # job READS the pages table; synthesis is input prep, and inlining
    # it was measured as ~55% of the old flagship wall, none of it
    # engine work).  Idempotent: reused across bench invocations.
    from ultraviolet_spark.sources.pages_from_docs import materialize_pages_table
    pages_600b = materialize_pages_table(spark, sf_dir, replicate=REPLICATE)
    pages_10kb = materialize_pages_table(spark, sf_dir,
                                         replicate=max(REPLICATE // 8, 1),
                                         text_repeat=20)

    # Warm the JVM (codegen, parquet footer cache) AND the Python worker
    # pool (Arrow serializers, numpy import in daemons) — a cold daemon
    # fork showed up as +1-2s on the first pandas-UDF line in round 1.
    # The 10 KB-page shape warms SEPARATELY: its larger Arrow batches
    # grow fresh allocator arenas + JIT tiers, measured as a 37→18→11→6s
    # progression across identical runs when warmed only at 600 B.
    from ultraviolet_spark.pipeline import flagship_enriched
    _materialize(Q.REGISTRY["q01_pricing_summary"].fn(spark, sf_dir))
    # warm on row-parallel SAMPLES of the input (limit would collapse to
    # one partition and leave the worker pool cold)
    _materialize(flagship_enriched(
        spark.read.parquet(pages_600b).sample(0.1, seed=1)))
    _materialize(flagship_enriched(
        spark.read.parquet(pages_10kb).sample(0.25, seed=1)))

    # INTERLEAVED passes (round 4, VERDICT r3 #5 — the scaling-bench
    # methodology applied to the headline): this host swings ±50% on
    # MINUTE timescales (same commit, back-to-back full runs measured
    # 14.9 vs 22.2 s), so consecutive best-of-N per line conflates a
    # slow line with a slow minute.  Instead the WHOLE suite runs
    # UV_BENCH_PASSES times; a contention burst hits one pass, not one
    # line.  Headline value = MEDIAN of pass totals (robust), with the
    # [min, max] band reported; per-line numbers stay the min across
    # passes (comparable with the r1-r3 best-of tables).
    import statistics

    passes = max(2, int(os.environ.get("UV_BENCH_PASSES", "3")))
    lines: list[tuple[str, object]] = [
        ("flagship_pit_features",
         lambda: build_flagship_from_table(spark, pages_600b)),
        ("flagship_10kb_pages",
         lambda: build_flagship_from_table(spark, pages_10kb)),
    ] + [(name, (lambda name=name: Q.REGISTRY[name].fn(spark, sf_dir)))
         for name in headline]

    per: dict[str, list[float]] = {name: [] for name, _ in lines}
    pass_totals: list[float] = []
    for _ in range(passes):
        tot = 0.0
        for name, build in lines:
            t0 = time.perf_counter()
            _materialize(build())
            dt = time.perf_counter() - t0
            spark.catalog.clearCache()
            per[name].append(dt)
            tot += dt
        pass_totals.append(round(tot, 3))

    timings = {name: round(min(ts), 3) for name, ts in per.items()}
    t_flagship = timings["flagship_pit_features"]
    t_flag_med = round(statistics.median(per["flagship_pit_features"]), 3)
    value = round(statistics.median(pass_totals), 3)
    out = {
        "metric": "headline_total_sec (flagship transcode+extract+window+asof "
                  f"over {n_pages} pages + operator suite; median of "
                  f"{passes} interleaved passes)",
        "value": value,
        "unit": "sec",
        "band": {"min": min(pass_totals), "max": max(pass_totals)},
        "passes": pass_totals,
        "best_total": round(sum(timings.values()), 3),
        "queries": timings,
        "sf": sf,
        "pages": n_pages,
        "pages_per_sec": round(n_pages / t_flag_med, 1),
        "pages_per_sec_best": round(n_pages / t_flagship, 1),
        "cores": cores,
    }
    # attach the latest N→4N scaling-efficiency measurement (north_rule
    # criterion ≥ 0.8; produced by tools/scaling_bench.py on the same
    # flagship job) so the evidence travels with the bench record
    scaling_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "tools", "scaling_latest.json")
    if os.path.exists(scaling_path):
        with open(scaling_path) as fh:
            out["scaling"] = json.load(fh)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
