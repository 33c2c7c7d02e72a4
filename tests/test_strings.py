"""String-metric unit tests: Jaro-Winkler against the DuckDB oracle
implementation (property-based), NYSIIS/levenshtein known values."""

from __future__ import annotations

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st

from namematch_spark.functions.strings import (jaro_winkler, levenshtein,
                                               nysiis)

NAMES = st.text(alphabet=st.characters(min_codepoint=65, max_codepoint=90),
                min_size=1, max_size=12)


# one connection for the property tests: a fresh duckdb.connect() per
# hypothesis example made these two tests ~40s of pure connect overhead
_CON = duckdb.connect()


@given(a=NAMES, b=NAMES)
@settings(max_examples=300, deadline=None)
def test_jaro_winkler_matches_duckdb(a, b):
    expected = _CON.execute(
        "SELECT jaro_winkler_similarity(?, ?)", [a, b]).fetchone()[0]
    assert abs(jaro_winkler(a, b) - expected) < 1e-12


def test_jaro_winkler_known():
    assert abs(jaro_winkler("MARTHA", "MARHTA") - 0.9611111111111111) < 1e-12
    assert abs(jaro_winkler("DWAYNE", "DUANE") - 0.84) < 1e-12
    assert jaro_winkler("SMITH", "SMITH") == 1.0


@given(a=NAMES, b=NAMES)
@settings(max_examples=200, deadline=None)
def test_levenshtein_matches_duckdb(a, b):
    expected = _CON.execute(
        "SELECT levenshtein(?, ?)", [a, b]).fetchone()[0]
    assert levenshtein(a, b) == expected


def test_nysiis_known():
    # classic NYSIIS behaviors (coded to the Taft algorithm)
    assert nysiis("KNIGHT") == nysiis("NIGHT") == "NAGT"  # KN -> NN
    assert nysiis("PHILIP") == nysiis("FILIP") == "FALAP"  # PH -> FF
    assert nysiis("SMITH") == "SNAT"
    assert nysiis("SMYTH") == "SNYT"            # Y is not a vowel
    assert nysiis("MACDONALD") == "MCDANALD"    # MAC -> MCC
    assert nysiis("") == ""
    # stability: idempotent-ish length bound and alpha-only
    for n in ["BROWN", "O'BRIEN", "GARCIA-LOPEZ", "X"]:
        code = nysiis(n)
        assert code.isalpha() or code == ""


def test_levenshtein_edges():
    assert levenshtein("", "") == 0
    assert levenshtein("", "ABC") == 3
    assert levenshtein("KITTEN", "SITTING") == 3
