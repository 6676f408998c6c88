"""ultraviolet_spark — a PySpark-native feature-engineering engine.

Re-creates the transcoding/validation semantics of the reference
(hackflame/ultraviolet — unavailable at build time, see SURVEY.md §0;
normative oracle: Unicode Standard §3.9 / RFC 3629 as implemented by
CPython codecs) as vectorized numpy kernels driven through Arrow/pandas
UDFs, plus point-in-time (as-of) joins, windowed features (lag/lead,
backfill, sessionize), skew handling, checkpoint/lineage, and a suite
of web-scale training-data operators (dedup, similarity search, text
analysis) — all expressed Spark-first on the DataFrame API.

Layout:
    kernels/    pure-numpy byte-level state machines (no Spark import)
    functions/  pandas/Arrow UDF wrappers + portable SQL-expressible fns
    operators/  as-of join, windows, dedup, similarity, skew salting
    sources/    synthetic pages generator, table-format seam, checkpoints
    plans/      explain-plan assertions and tuning helpers
    streaming/  structured-streaming surface (session windows, watermark)
"""

__version__ = "0.1.0"
