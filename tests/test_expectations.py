"""Expectation suite (operators/expectations.validate_expectations)."""

from __future__ import annotations

import pytest

from ultraviolet_spark.operators.expectations import validate_expectations

pytestmark = pytest.mark.usefixtures("spark")


@pytest.fixture()
def data(spark):
    rows = [
        (1, "a", 5.0, "x1"),
        (2, "a", -1.0, "x2"),      # range violation
        (3, None, 2.0, "x3"),      # not_null violation
        (3, "b", 3.0, "zz"),       # duplicate id + regex violation
        (4, "c", 1.0, "x4"),       # in_set violation ('c')
    ]
    return spark.createDataFrame(rows, "id long, cat string, v double, "
                                 "code string")


def test_all_rule_kinds_count_exactly(spark, data):
    ref = spark.createDataFrame([("a",), ("b",)], "k string")
    rep = {r["rule"]: r for r in validate_expectations(data, [
        {"rule": "not_null", "col": "cat"},
        {"rule": "range", "col": "v", "min": 0.0},
        {"rule": "in_set", "col": "cat", "values": ["a", "b"]},
        {"rule": "regex", "col": "code", "pattern": "^x[0-9]$"},
        {"rule": "unique", "cols": ["id"]},
        {"rule": "subset_of", "col": "cat", "ref_df": ref,
         "ref_col": "k"},
    ]).collect()}
    assert rep["not_null(cat)"]["violations"] == 1
    assert rep["range(v,0.0,None)"]["violations"] == 1
    assert rep["in_set(cat)"]["violations"] == 1
    assert rep["regex(code)"]["violations"] == 1
    assert rep["unique(id)"]["violations"] == 1
    assert rep["subset_of(cat->k)"]["violations"] == 1
    assert all(not r["passed"] for r in rep.values())
    # n: row-local rules see all 5 rows; subset_of sees 4 non-null FKs
    assert rep["not_null(cat)"]["n"] == 5
    assert rep["subset_of(cat->k)"]["n"] == 4


def test_nulls_do_not_violate_value_rules(spark):
    df = spark.createDataFrame([(None, None)], "v double, s string")
    rep = {r["rule"]: r for r in validate_expectations(df, [
        {"rule": "range", "col": "v", "min": 0.0, "max": 1.0},
        {"rule": "regex", "col": "s", "pattern": "^a$"},
        {"rule": "in_set", "col": "s", "values": ["a"]},
    ]).collect()}
    assert all(r["violations"] == 0 and r["passed"]
               for r in rep.values())


def test_duplicate_null_keys_are_duplicates(spark):
    df = spark.createDataFrame([(None,), (None,), (1,)], "id long")
    rep = validate_expectations(
        df, [{"rule": "unique", "cols": ["id"]}]).head()
    assert rep["violations"] == 1 and not rep["passed"]


def test_max_violations_threshold(spark):
    df = spark.createDataFrame([(None,), (1,)], "id long")
    rep = validate_expectations(
        df, [{"rule": "not_null", "col": "id",
              "max_violations": 1}]).head()
    assert rep["violations"] == 1 and rep["passed"]


def test_clean_suite_passes(spark, data):
    rep = validate_expectations(data, [
        {"rule": "not_null", "col": "id"},
        {"rule": "range", "col": "v", "min": -10.0, "max": 10.0},
    ]).collect()
    assert all(r["passed"] for r in rep)
