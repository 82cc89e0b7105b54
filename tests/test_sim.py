import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from el.sim import (
    cosine,
    is_abbreviation,
    jaro_winkler,
    levenshtein,
    name_contains,
    name_prefix,
    soundex,
    token_overlap,
)


def test_jaro_winkler_known_values():
    # standard textbook value
    assert jaro_winkler("martha", "marhta") == pytest.approx(0.9611111111, abs=1e-9)
    assert jaro_winkler("abc", "abc") == 1.0
    assert jaro_winkler("abc", "xyz") == 0.0
    assert jaro_winkler("", "abc") == 0.0


@settings(max_examples=300, deadline=None)
@given(
    st.text(alphabet="abcdefg h", min_size=0, max_size=12),
    st.text(alphabet="abcdefg h", min_size=0, max_size=12),
)
def test_jaro_winkler_matches_duckdb(s1, s2):
    """Our JW must agree with DuckDB's jaro_winkler_similarity (same
    standard parameters) — this is what makes the SQL oracle valid."""
    ours = jaro_winkler(s1, s2)
    theirs = duckdb.sql(
        "SELECT jaro_winkler_similarity(?, ?)", params=[s1, s2]
    ).fetchone()[0]
    assert ours == pytest.approx(theirs, abs=1e-12)


@settings(max_examples=200, deadline=None)
@given(
    st.text(alphabet="abcde", min_size=0, max_size=10),
    st.text(alphabet="abcde", min_size=0, max_size=10),
)
def test_levenshtein_matches_duckdb(s1, s2):
    theirs = duckdb.sql("SELECT levenshtein(?, ?)", params=[s1, s2]).fetchone()[0]
    assert levenshtein(s1, s2) == theirs


def test_soundex_known_values():
    assert soundex("Robert") == "R163"
    assert soundex("Rupert") == "R163"
    assert soundex("Ashcraft") == "A261"  # h does not separate s/c
    assert soundex("Tymczak") == "T522"
    assert soundex("Pfister") == "P236"
    assert soundex("Smith") == "S530"
    assert soundex("Smyth") == "S530"
    assert soundex("") == "0000"


def test_cosine():
    assert cosine({"a": 1, "b": 1}, {"a": 1, "b": 1}) == pytest.approx(1.0)
    assert cosine({"a": 1}, {"b": 1}) == 0.0
    assert cosine({}, {"a": 1}) == 0.0
    assert cosine({"a": 1, "b": 1}, {"a": 1}) == pytest.approx(0.7071067811, abs=1e-9)


def test_predicates():
    assert is_abbreviation("uwcc", "united western commerce council")
    assert not is_abbreviation("uw", "united")
    assert name_prefix("united western", "united western commerce council")
    assert not name_prefix("united western", "united west")
    assert name_contains("smith", "janet smith")
    assert not name_contains("smi", "janet smith")
    assert token_overlap("janet smith", "robert smith") == pytest.approx(1 / 3)
