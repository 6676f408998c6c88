"""Merkle release digests: identity, single-change localization, the
even-duplicate XOR blind spot repaired by count/sum, drill statuses vs
brute force, and the broadcast-semi-join drill plan."""

from __future__ import annotations

from ultraviolet_spark.operators.history import (
    digest_diff,
    digest_drill,
    release_digest,
)

SCHEMA = "doc_id long, text string"
ROWS = [(i, f"document number {i}") for i in range(50)]


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def test_identical_releases_diff_empty(spark):
    a = _df(spark, ROWS)
    d = digest_diff(release_digest(a, key_col="doc_id"),
                    release_digest(a, key_col="doc_id"))
    assert d.count() == 0


def test_single_edit_localizes_to_one_bucket(spark):
    a = _df(spark, ROWS)
    b = _df(spark, [(i, t + " EDITED" if i == 7 else t) for i, t in ROWS])
    cand = digest_diff(release_digest(a, key_col="doc_id"),
                       release_digest(b, key_col="doc_id"))
    assert cand.count() == 1
    drill = digest_drill(a, b, cand, key_col="doc_id").collect()
    assert [(r["doc_id"], r["status"]) for r in drill] == [(7, "changed")]


def test_even_duplicate_xor_blindspot_repaired(spark):
    # duplicating a row twice leaves the XOR digest unchanged; the
    # count and sum components must still flag the bucket
    a = _df(spark, ROWS)
    b = _df(spark, ROWS + [ROWS[3], ROWS[3]])
    cand = digest_diff(release_digest(a, key_col="doc_id"),
                       release_digest(b, key_col="doc_id"))
    assert cand.count() == 1


def test_drill_statuses_match_brute_force(spark):
    a_rows = ROWS
    b_rows = ([(i, t + "!" if i % 17 == 0 else t)
               for i, t in ROWS if i % 13 != 5]
              + [(100, "new one"), (101, "new two")])
    a, b = _df(spark, a_rows), _df(spark, b_rows)
    cand = digest_diff(release_digest(a, key_col="doc_id"),
                       release_digest(b, key_col="doc_id"))
    got = {(r["doc_id"], r["status"])
           for r in digest_drill(a, b, cand, key_col="doc_id").collect()}
    da, db = dict(a_rows), dict(b_rows)
    want = {(k, "removed") for k in da if k not in db}
    want |= {(k, "added") for k in db if k not in da}
    want |= {(k, "changed") for k in da if k in db and da[k] != db[k]}
    assert got == want


def test_drill_prefilters_with_broadcast_semi_join(spark):
    a = _df(spark, ROWS)
    b = _df(spark, [(i, t + "x" if i == 3 else t) for i, t in ROWS])
    cand = digest_diff(release_digest(a, key_col="doc_id"),
                       release_digest(b, key_col="doc_id"))
    out = digest_drill(a, b, cand, key_col="doc_id")
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted")
    assert plan.count("LeftSemi") >= 2          # both sides pre-filtered
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" in plan
