"""_jaro_winkler_py vs DuckDB's C++ implementation, including random
fuzz — two fully independent implementations of the same definition."""
from __future__ import annotations

import math
import random
import string

import duckdb

from ultraviolet_spark.operators.fuzzy import _jaro_winkler_py

KNOWN = [("martha", "marhta"), ("dixon", "dicksonx"),
         ("jellyfish", "smellyfish"), ("ab", "ba"), ("crate", "trace"),
         ("abcdefghij", "abzyxwvuts"), ("duane", "dwayne"),
         ("shackleford", "shackelford"), ("", "abc"), ("abc", "abc")]


def _duck(a: str, b: str) -> float:
    return duckdb.sql(
        "SELECT jaro_winkler_similarity(?, ?)", params=[a, b]).fetchone()[0]


def test_known_vectors():
    for a, b in KNOWN:
        assert math.isclose(_jaro_winkler_py(a, b), _duck(a, b),
                            abs_tol=1e-12), (a, b)


def test_random_fuzz_vs_duckdb():
    rng = random.Random(17)
    alpha = string.ascii_lowercase[:6]  # small alphabet → many matches
    for _ in range(300):
        a = "".join(rng.choice(alpha)
                    for _ in range(rng.randrange(0, 12)))
        b = "".join(rng.choice(alpha)
                    for _ in range(rng.randrange(0, 12)))
        assert math.isclose(_jaro_winkler_py(a, b), _duck(a, b),
                            abs_tol=1e-12), (a, b)


def test_symmetry_and_bounds():
    rng = random.Random(23)
    for _ in range(100):
        a = "".join(rng.choice("abcd") for _ in range(rng.randrange(1, 9)))
        b = "".join(rng.choice("abcd") for _ in range(rng.randrange(1, 9)))
        x, y = _jaro_winkler_py(a, b), _jaro_winkler_py(b, a)
        assert math.isclose(x, y, abs_tol=1e-12)
        assert 0.0 <= x <= 1.0
