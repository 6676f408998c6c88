"""Per-stage timing of the flagship's Python-kernel hot path, outside
Spark: generate a deterministic pages sample exactly like
sources/pages_from_docs.py does, then time each kernel pass
(decode_auto → codepoints_to_utf8 → extract_text → utf8_to_codepoints →
codepoint_class_histogram) on identical Arrow-shaped buffers.

Usage: python tools/profile_flagship_kernels.py [--rows 2000]
                                                [--text-repeat 20]
"""

from __future__ import annotations

import argparse
import os
import time

os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", "1073741824")
os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", "1073741824")

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def build_sample(rows: int, text_repeat: int, sf_dir: str):
    """Mirror pages_from_docs.gen() without a SparkSession."""
    import pandas as pd

    tbl = pq.read_table(f"{sf_dir}/documents.parquet",
                        columns=["doc_id", "text", "lang"])
    pdf = tbl.to_pandas().head(rows).reset_index(drop=True)
    if text_repeat > 1:
        pdf["text"] = (pdf["text"] + " ") * text_repeat
    html_str = ("<html><head><title>doc</title></head><body><p>"
                + pdf["text"] + "</p></body></html>")
    enc_sel = (pdf["doc_id"] % 3).to_numpy()
    blobs = []
    for s, e in zip(html_str, enc_sel):
        if e == 0:
            blobs.append(s.encode("utf-8"))
        elif e == 1:
            blobs.append(b"\xff\xfe" + s.encode("utf-16-le"))
        else:
            blobs.append(b"\xfe\xff" + s.encode("utf-16-be"))
    return pa.array(blobs, type=pa.large_binary())


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=2000)
    ap.add_argument("--text-repeat", type=int, default=20)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    from ultraviolet_spark.kernels.buffers import binary_to_offsets
    from ultraviolet_spark.kernels.classify import codepoint_class_histogram
    from ultraviolet_spark.kernels.encode import codepoints_to_utf8
    from ultraviolet_spark.kernels.extract import extract_text
    from ultraviolet_spark.kernels.transcode import decode_auto
    from ultraviolet_spark.kernels.utf8 import utf8_to_codepoints

    html = build_sample(args.rows, args.text_repeat, args.sf_dir)
    data, offsets, nulls = binary_to_offsets(html)
    mb = len(data) / 1e6
    print(f"rows={args.rows} total_html={mb:.1f} MB "
          f"avg_page={len(data)/args.rows/1024:.1f} KB")

    def t(label, fn, *a):
        out = fn(*a)
        best = float("inf")
        for _ in range(args.reps):
            t0 = time.perf_counter()
            fn(*a)
            best = min(best, time.perf_counter() - t0)
        print(f"{label:28s} {best*1000:8.1f} ms   {mb/best:8.1f} MB/s(html)")
        return out, best

    (r, ), tot = (None,), 0.0
    (res, dt) = t("decode_auto", decode_auto, data, offsets)
    cp, cpo, n_repl, bom = res
    tot += dt
    (res, dt) = t("codepoints_to_utf8", codepoints_to_utf8, cp, cpo)
    u8, u8o = res
    tot += dt
    (res, dt) = t("extract_text", extract_text, u8, u8o)
    ext, exto = res
    tot += dt
    (res, dt) = t("utf8_to_codepoints(text)", utf8_to_codepoints, ext, exto)
    ecp, ecpo = res
    tot += dt
    (_, dt) = t("cp_class_histogram", codepoint_class_histogram, ecp, ecpo)
    tot += dt
    print(f"{'TOTAL kernels':28s} {tot*1000:8.1f} ms   {mb/tot:8.1f} MB/s(html)"
          f"   ({args.rows/tot:.0f} pages/s/core)")


if __name__ == "__main__":
    main()
