"""postings_compression_stats vs a real LEB128 encoder."""
from __future__ import annotations

from ultraviolet_spark.operators.index import (build_postings,
                                               postings_compression_stats)


def _leb128_len(v: int) -> int:
    assert v >= 0
    n = 1
    while v >= 128:
        v >>= 7
        n += 1
    return n


def test_varint_ladder_matches_leb128(spark):
    # doc ids chosen so gaps hit every byte-width bucket boundary
    ids = [0, 1, 128, 16384 + 128, 2097152 + 16384 + 128]
    df = spark.createDataFrame([(i, "zz") for i in ids],
                               "doc_id long, text string")
    row = postings_compression_stats(build_postings(df)).collect()[0]
    gaps = [ids[0] + 1] + [b - a for a, b in zip(ids, ids[1:])]
    assert row["token"] == "zz"
    assert row["n_docs"] == len(ids)
    assert row["raw_bytes"] == 8 * len(ids)
    assert row["varint_bytes"] == sum(_leb128_len(g) for g in gaps)


def test_adjacent_run_compresses_hard(spark):
    df = spark.createDataFrame([(i, "a b") for i in range(100)],
                               "doc_id long, text string")
    rows = {r["token"]: r
            for r in postings_compression_stats(
                build_postings(df)).collect()}
    for t in ("a", "b"):
        assert rows[t]["varint_bytes"] == 100  # all gaps are 1 → 1 byte
        assert rows[t]["raw_bytes"] == 800
