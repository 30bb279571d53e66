"""Property: the pinned pure-Python Levenshtein matches DuckDB's.

The fuzzy path's rank-identity depends on all three engines (oracle
Python, Spark ``F.levenshtein``, DuckDB ``levenshtein``) computing the
same distance. Spark-vs-oracle parity is covered end-to-end by the fuzzy
rank-identity tests; this pins oracle-vs-DuckDB over random strings so
the driver's SQL-oracle comparison can't drift.
"""

from __future__ import annotations

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st

from oracle.fuzzy import levenshtein

words = st.text(alphabet="abcdefgh01", min_size=0, max_size=12)


@settings(max_examples=200, deadline=None)
@given(words, words)
def test_levenshtein_matches_duckdb(a: str, b: str) -> None:
    got = levenshtein(a, b)
    exp = duckdb.sql(
        "SELECT levenshtein(?, ?)", params=[a, b]
    ).fetchone()[0]
    assert got == exp, f"levenshtein({a!r}, {b!r}): python {got} != duckdb {exp}"


def test_levenshtein_symmetry_and_bounds():
    for a, b in [("abc", "abd"), ("", "xyz"), ("same", "same"), ("ab", "ba")]:
        d = levenshtein(a, b)
        assert d == levenshtein(b, a)
        assert abs(len(a) - len(b)) <= d <= max(len(a), len(b))
