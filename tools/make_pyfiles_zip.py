"""Package the engine for cluster submission (north_rule: jobs run via
``spark-submit --py-files`` on multi-executor clusters).

Builds a zip containing ``ultraviolet_spark/`` and ``fixtures/`` (the
golden oracles ship so conformance checks can run cluster-side) and
prints the spark-submit invocation.

Usage: python tools/make_pyfiles_zip.py [out.zip]
"""

from __future__ import annotations

import os
import sys
import zipfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PACKAGES = ("ultraviolet_spark", "fixtures")


def build(out: str) -> str:
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for pkg in PACKAGES:
            for dirpath, _, files in os.walk(os.path.join(ROOT, pkg)):
                if "__pycache__" in dirpath:
                    continue
                for f in files:
                    if f.endswith((".py", ".parquet")):
                        p = os.path.join(dirpath, f)
                        z.write(p, os.path.relpath(p, ROOT))
    return out


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(ROOT, "uvspark.zip")
    build(out)
    print(f"wrote {out}")
    print("submit with:\n"
          f"  spark-submit --py-files {out} \\\n"
          "    --packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13 \\\n"
          "    --conf spark.sql.adaptive.enabled=true \\\n"
          "    your_job.py")


if __name__ == "__main__":
    main()
