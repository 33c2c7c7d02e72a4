"""Preprocessing semantics, mirroring the reference's unit fixtures
(``/root/reference/tests/unit/test_process_input_data.py:12-128`` and
``clean_nn_string`` goldens in ``test_utils.py:8-21``)."""

from __future__ import annotations

import pyspark.sql.functions as F

from namematch_spark.operators.preprocess import preprocess

SCHEMA = ("record_id string, first_name string, last_name string, "
          "dob string, gender string, age string, uid string")


def _prep(spark, rows):
    return preprocess(spark.createDataFrame(rows, SCHEMA)).collect()


def test_name_cleaning(spark):
    rows = [("r1", "john jr", "o'brien-smith", "", "", "", ""),
            ("r2", "  mary III ", "mc donald", "", "", "", ""),
            ("r3", "ANNA-LISA", "smith sr", "", "", "", ""),
            # suffix mid-string: reference strips \bJR\b ANYWHERE
            # (utils/utils.py:210-215), not only at the end
            ("r4", "bobby jr lee", "van jr-holt", "", "", "", "")]
    out = {r["record_id"]: r for r in _prep(spark, rows)}
    assert out["r1"]["first_name"] == "JOHN"
    assert out["r1"]["last_name"] == "OBRIEN SMITH"
    assert out["r2"]["first_name"] == "MARY"
    # P9 last-name rule "MC " -> "MC" (process_input_data.py:398)
    assert out["r2"]["last_name"] == "MCDONALD"
    assert out["r3"]["first_name"] == "ANNA LISA"
    assert out["r3"]["last_name"] == "SMITH"
    assert out["r4"]["first_name"] == "BOBBY LEE"
    assert out["r4"]["last_name"] == "VAN HOLT"
    # raw values preserved for output restoration (P14)
    assert out["r1"]["tmp_raw__last_name"] == "o'brien-smith"


def test_date_check(spark):
    rows = [("d1", "A", "B", "2000-01-31", "", "", ""),
            ("d2", "A", "B", "2000-02-30", "", "", ""),   # invalid day
            ("d3", "A", "B", "not a date", "", "", ""),
            ("d4", "A", "B", "", "", "", "")]
    out = {r["record_id"]: r["dob"] for r in _prep(spark, rows)}
    assert out == {"d1": "2000-01-31", "d2": "", "d3": "", "d4": ""}


def test_numeric_and_categorical_checks(spark):
    rows = [("n1", "A", "B", "", "m", "42", ""),
            ("n2", "A", "B", "", "x", "4.5", ""),
            ("n3", "A", "B", "", "F", "abc", "")]
    out = {r["record_id"]: (r["gender"], r["age"])
           for r in _prep(spark, rows)}
    assert out["n1"] == ("M", "42")
    assert out["n2"] == ("", "4.5")   # bad category dropped, float kept
    assert out["n3"] == ("F", "")     # non-numeric age dropped


def test_drop_rules_flag_not_filter(spark):
    rows = [("x1", "JOHN", "DOE", "", "", "", "1"),
            ("x2", "JANE", "DOE", "", "", "", "2"),
            ("x3", "UNKNOWN", "SMITH", "", "", "", "3"),
            ("x4", "JOHN", "SMITH", "", "", "", "4")]
    out = {r["record_id"]: r["drop_from_nm"] for r in _prep(spark, rows)}
    assert out == {"x1": 1, "x2": 1, "x3": 1, "x4": 0}


def test_blockstring(spark):
    rows = [("b1", "peter", "hicks", "1953-07-09", "m", "68", "9")]
    r = _prep(spark, rows)[0]
    assert r["blockstring"] == "PETER::HICKS::1953-07-09"


def test_empty_input(spark):
    assert _prep(spark, []) == []
