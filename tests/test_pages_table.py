"""The benchmark job shape: flagship over a MATERIALIZED pages table
must equal flagship over inline-synthesized pages (same params) —
bench.py / tools/flagship_run.py time the table-read shape, so this
equivalence is what makes their pages/sec numbers comparable to the
correctness-checked inline path."""

from __future__ import annotations

import os

import pytest

pytestmark = pytest.mark.spark


def _canon(df):
    pdf = df.toPandas().sort_values(["url", "warc_ts"]).reset_index(drop=True)
    return pdf


def test_materialized_table_equals_inline_synth(spark, sf_dir, tmp_path):
    from ultraviolet_spark.pipeline import flagship_enriched
    from ultraviolet_spark.sources.pages_from_docs import (
        materialize_pages_table,
        pages_from_documents,
    )

    base = str(tmp_path / "pages_cache")
    path = materialize_pages_table(spark, sf_dir, replicate=2,
                                   text_repeat=3, base_dir=base)
    assert os.path.exists(os.path.join(path, "_SUCCESS"))

    want = _canon(flagship_enriched(
        pages_from_documents(spark, sf_dir, replicate=2, text_repeat=3)))
    got = _canon(flagship_enriched(spark.read.parquet(path)))

    assert list(want.columns) == list(got.columns)
    assert len(want) == len(got) > 0
    for c in want.columns:
        assert want[c].equals(got[c]), c


def test_materialize_is_idempotent(spark, sf_dir, tmp_path):
    from ultraviolet_spark.sources.pages_from_docs import (
        materialize_pages_table,
    )

    base = str(tmp_path / "pages_cache")
    p1 = materialize_pages_table(spark, sf_dir, replicate=1, base_dir=base)
    marker = os.path.join(p1, "_SUCCESS")
    mtime = os.path.getmtime(marker)
    p2 = materialize_pages_table(spark, sf_dir, replicate=1, base_dir=base)
    assert p1 == p2
    assert os.path.getmtime(marker) == mtime  # reused, not rewritten
    # distinct params get distinct tables
    p3 = materialize_pages_table(spark, sf_dir, replicate=2, base_dir=base)
    assert p3 != p1
