"""Registry-shape invariants for the driver correctness gate.

The external driver evaluates exactly the first 50 entries of
``queries()`` (observed round 2: CORRECTNESS_r02.json keys == registry
order [0:50]).  These tests pin the contract that every driver-visible
slot carries an exact DuckDB value-hash oracle, and that the
rows-only / demoted entries still exist past the cap (they remain
covered by tools/check_oracle.py and pytest).
"""
from __future__ import annotations

import importlib

DRIVER_CAP = 50


def _entry():
    import sys
    sys.path.insert(0, "/root/repo")
    return importlib.import_module("__spark_entry__")


def test_first_50_queries_all_have_exact_oracles():
    e = _entry()
    names = list(e.queries())
    oracles = e.oracle_sql()
    visible = names[:DRIVER_CAP]
    missing = [n for n in visible if n not in oracles]
    assert missing == [], (
        f"driver-visible queries without an exact oracle: {missing}")


def test_registry_complete_and_demotions_consistent():
    from ultraviolet_spark import queries as Q

    names = list(Q.queries())
    # nothing dropped or duplicated by the reordering
    assert set(names) == set(Q.REGISTRY)
    assert len(names) == len(set(names))
    # every demoted name actually exists (no stale entries)
    assert set(Q._DEMOTED) <= set(Q.REGISTRY)
    # oracle_sql keys are a subset of queries keys with same names
    assert set(Q.oracle_sql()) <= set(names)


# Every query name that appeared in any CORRECTNESS_r01-r03.json — the
# set the hard gate had already exercised before the round-4 rotation.
_GATED_R01_R03 = {
    "q01", "q02", "q03", "q04", "q05", "q06", "q07", "q08", "q09",
    "q10", "q11", "q12", "q13", "q14", "q15", "q16", "q17", "q18",
    "q19", "q20", "q21", "q22", "q23", "q24", "q25", "q26", "q27",
    "q28", "q29", "q30", "q31", "q32", "q33", "q34", "q35", "q36",
    "q37", "q38", "q39", "q40", "q41", "q42", "q43", "q44", "q45",
    "q46", "q47", "q48", "q49", "q51", "q53", "q55", "q56", "q57",
    "q58", "q59", "q60", "q61", "q62", "q63",
}

_ANCHORS = {
    "q51_flagship_vs_golden", "q15_asof_click_purchase",
    "q61_asof_salted_hot_keys", "q40_utf8_conformance",
    "q42_extract_conformance", "q43_classify_hist",
    "q55_utf16_32_conformance", "q19_exact_dup_classes",
    "q62_checkpoint_metrics", "q63_streaming_dedup",
}


def test_round4_rotation_contract():
    """VERDICT r3 #1: the round-4 gate window keeps the 10 named anchors
    and fills the other 40 slots with exact-oracle queries absent from
    every prior CORRECTNESS file."""
    from ultraviolet_spark import queries as Q

    front = list(Q.queries())[:DRIVER_CAP]
    assert front == [n for n in Q._FRONT_50 if n in Q.REGISTRY]
    assert len(front) == DRIVER_CAP
    assert _ANCHORS <= set(front)
    fresh = [n for n in front
             if n.split("_")[0] not in _GATED_R01_R03]
    assert len(fresh) >= 40, (
        f"only {len(fresh)} never-gated queries in the window: {fresh}")
    oracles = Q.oracle_sql()
    assert all(n in oracles for n in front)


# Query-number prefixes that appeared in ANY CORRECTNESS_r01-r04.json —
# the cumulative driver-gate exposure before the round-5 rotation
# (r01-r03 set above, plus the 40 rotated in for round 4).
_GATED_R04_ONLY = {
    "q64", "q68", "q69", "q71", "q73", "q83", "q84", "q86", "q91",
    "q92", "q96", "q97", "q98", "q99", "q100", "q106", "q110", "q113",
    "q124", "q136", "q142", "q144", "q164", "q165", "q175", "q198",
    "q230", "q231", "q232", "q233", "q238", "q240", "q248", "q249",
    "q253", "q265", "q266", "q276", "q277", "q300",
}
_GATED_R01_R04 = _GATED_R01_R03 | _GATED_R04_ONLY


def test_round5_rotation_contract():
    """VERDICT r4 #1: the round-5 gate window keeps the 10 named anchors
    and fills the other 40 slots with exact-oracle queries absent from
    every CORRECTNESS_r01-r04 file — cumulative exposure keeps
    growing (100 distinct through r4, 140 after r5)."""
    from ultraviolet_spark import queries as Q

    front = list(Q.queries())[:DRIVER_CAP]
    assert front == [n for n in Q._FRONT_50 if n in Q.REGISTRY]
    assert len(front) == DRIVER_CAP
    assert _ANCHORS <= set(front)
    fresh = [n for n in front
             if n.split("_")[0] not in _GATED_R01_R04]
    assert len(fresh) >= 40, (
        f"only {len(fresh)} never-gated queries in the window: {fresh}")
    oracles = Q.oracle_sql()
    assert all(n in oracles for n in front)


def test_oracle_count_covers_cap():
    """If the registry ever shrinks below 50 oracle-backed queries the
    gate silently weakens — fail loudly instead."""
    from ultraviolet_spark import queries as Q

    n_oracle = len(Q.oracle_sql())
    assert n_oracle >= DRIVER_CAP, (
        f"only {n_oracle} oracle-backed queries; driver cap is {DRIVER_CAP}")


def test_ordered_names_stable_under_module_order():
    """Round-4 split pin (VERDICT r3 #4): queries.py became a package
    of chunk modules; the visible ordering must be a pure function of
    the registered names — _FRONT_50 verbatim, then everything else in
    numeric query order — so a chunk-module reshuffle can't silently
    reorder the driver-visible window or the mirror soak."""
    from ultraviolet_spark import queries as Q

    names = list(Q.queries())
    front = [n for n in Q._FRONT_50 if n in Q.REGISTRY]
    assert names[:len(front)] == front
    rest = names[len(front):]
    nums = [Q._qnum(n) for n in rest]
    assert nums == sorted(nums), "rest of registry not in numeric order"
    assert len(names) == len(Q.REGISTRY)


def test_chunk_modules_under_3000_lines():
    """The split's stated contract: no registry source file above
    3000 lines (the monolith was 14.6k)."""
    import os

    import ultraviolet_spark.queries as Q

    pkg = os.path.dirname(Q.__file__)
    for fn in os.listdir(pkg):
        if fn.endswith(".py"):
            n = sum(1 for _ in open(os.path.join(pkg, fn)))
            assert n < 3000, f"{fn} has {n} lines"
