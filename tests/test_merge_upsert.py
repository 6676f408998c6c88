"""merge_upsert — lakehouse MERGE (CDC apply, last-writer-wins).

Hand cases pin the precedence lattice: multiple changes per key fold
to the (ts, seq)-last one; final D deletes even after earlier
re-inserts; a later U resurrects past a D; untouched base rows pass
through; inserts need no base row.
"""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.spark


def _run(spark, base_rows, change_rows):
    from ultraviolet_spark.operators.history import merge_upsert
    base = spark.createDataFrame(base_rows, "k long, text string")
    ch = spark.createDataFrame(
        change_rows, "k long, ts long, seq long, op string, text string")
    out = merge_upsert(base, ch, key="k", ts_col="ts", seq_col="seq",
                       op_col="op", payload=("text",))
    return {r["k"]: (r["text"], r["action"]) for r in out.collect()}


def test_precedence_lattice(spark):
    base = [(1, "one"), (2, "two"), (3, "three"), (4, "four"), (5, "five")]
    changes = [
        # k=2: plain update
        (2, 1, 1, "U", "two v2"),
        # k=3: update then later delete → gone
        (3, 1, 1, "U", "three v2"),
        (3, 2, 1, "D", None),
        # k=4: delete then SAME-ts higher-seq update → resurrected
        (4, 2, 1, "D", None),
        (4, 2, 2, "U", "four back"),
        # k=6: insert (no base row), two versions → last wins
        (6, 1, 1, "I", "six"),
        (6, 2, 1, "U", "six v2"),
        # k=7: insert then delete within the batch → never appears
        (7, 1, 1, "I", "seven"),
        (7, 2, 1, "D", None),
    ]
    got = _run(spark, base, changes)
    assert got[1] == ("one", "kept")
    assert got[2] == ("two v2", "upserted")
    assert 3 not in got
    assert got[4] == ("four back", "upserted")
    assert got[5] == ("five", "kept")
    assert got[6] == ("six v2", "upserted")
    assert 7 not in got
    assert set(got) == {1, 2, 4, 5, 6}


def test_empty_batch_is_identity(spark):
    got = _run(spark, [(1, "a"), (2, "b")], [])
    assert got == {1: ("a", "kept"), 2: ("b", "kept")}


def test_delete_of_absent_key_is_noop(spark):
    got = _run(spark, [(1, "a")], [(9, 1, 1, "D", None)])
    assert got == {1: ("a", "kept")}


def test_two_shuffle_plan(spark):
    """One agg exchange for the change fold + one join exchange per
    side — no window, no extra repartition."""
    from ultraviolet_spark.operators.history import merge_upsert
    base = spark.range(100).selectExpr("id AS k", "CAST(id AS STRING) AS text")
    ch = spark.range(10).selectExpr(
        "id AS k", "1L AS ts", "1L AS seq", "'U' AS op", "'x' AS text")
    plan = merge_upsert(base, ch, key="k", payload=("text",)) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan and "Cartesian" not in plan
