"""Materialize the committed golden fixtures used by
q51_flagship_vs_golden (driver-visible allclose evidence for the
north_rule's "matching the reference's feature vectors"):

* fixtures/pages_golden.parquet    — deterministic synthetic pages
  (the query's INPUT; committed so the query needs no generation)
* fixtures/features_golden.parquet — the expected features, computed by
  the INDEPENDENT sequential pandas oracle (make_features_golden), not
  by the engine.

Run from the repo root: python fixtures/materialize_features_golden.py
Regenerate whenever the golden oracle or generator params change.
"""

from __future__ import annotations

import os
import sys

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fixtures.make_features_golden import golden_features  # noqa: E402
from ultraviolet_spark.sources.pages_gen import write_pages  # noqa: E402

HERE = os.path.dirname(os.path.abspath(__file__))
PAGES = os.path.join(HERE, "pages_golden.parquet")
FEATURES = os.path.join(HERE, "features_golden.parquet")

# fixed generator params — the fixture identity
PARAMS = dict(n_urls=80, max_crawls=8, seed=20240817,
              bad_frac=0.08, flip_frac=0.15, out_of_order_frac=0.02)


def main() -> None:
    write_pages(PAGES, **PARAMS)
    pages = pd.read_parquet(PAGES)
    feats = golden_features(pages)
    feats.to_parquet(FEATURES, index=False)
    print(f"wrote {PAGES} ({len(pages)} rows) and {FEATURES} ({len(feats)} rows)")


if __name__ == "__main__":
    main()
