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


# ---- A8 edit-op counting (reference ``counter.py:5-19``) -------------

def _apply_editops(a: str, b: str, ops) -> str:
    """python-Levenshtein editops semantics: positions refer to the
    ORIGINAL strings; replay with a running offset."""
    res = list(a)
    off = 0
    for op, i, j in ops:
        if op == "replace":
            res[i + off] = b[j]
        elif op == "insert":
            res.insert(i + off, b[j])
            off += 1
        else:  # delete
            del res[i + off]
            off -= 1
    return "".join(res)


def test_editops_known():
    from namematch_spark.operators.nameprob import editops
    assert editops("abc", "abc") == []
    assert editops("abc", "abd") == [("replace", 2, 2)]
    assert editops("ab", "abc") == [("insert", 2, 2)]
    assert editops("abc", "ab") == [("delete", 2, 2)]
    # transposition costs 2 under plain Levenshtein (no Damerau)
    assert len(editops("jhon", "john")) == 2


@given(a=NAMES, b=NAMES)
@settings(max_examples=300, deadline=None)
def test_editops_reconstruct_and_minimal(a, b):
    """The op list must (1) replay a into b and (2) be MINIMAL —
    length equal to an independent levenshtein (DuckDB's)."""
    from namematch_spark.operators.nameprob import editops
    ops = editops(a, b)
    assert _apply_editops(a, b, ops) == b
    dist = _CON.execute("SELECT levenshtein(?, ?)", [a, b]).fetchone()[0]
    assert len(ops) == dist


def test_edit_op_probs_hand_computed():
    from namematch_spark.operators.nameprob import edit_op_probs
    # pairs: (ab,ac) -> replace@1; (ab,ab) -> none; (ac,ab) -> replace@1
    counts, total = edit_op_probs(["ab", "ac", "ab"])
    assert counts == {("replace", 1, 1): 2}
    assert total == 2
