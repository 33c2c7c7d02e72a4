"""Config-schema layer semantics, porting the reference's
preprocessing assertions (``tests/unit/test_process_input_data.py:
12-128``): geo merge, address parse, checks, set_missing, drop lists,
multi-dataset file_type stats."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from namematch_spark.schema import (DataFile, Schema, Variable,
                                    address_cols, geography_col,
                                    nn_string_stats,
                                    preprocess_with_schema)


def _one_col(spark, values, name="v"):
    return spark.createDataFrame([(v,) for v in values], f"{name} string")


def test_parse_address_cases(spark):
    # reference test_parse_address truth table (minus the word-number
    # house "Twelve Forbes Ave" — that needs the reference's lexical
    # StreetAddressParser; this engine's native-regex parser documents
    # digit-only house numbers)
    cases = [
        ("123 Main St.", "123", "main", "street"),
        ("123 Broadway", "123", "broadway", ""),
        ("", "", "", ""),
        ("123 MAIN STREET", "123", "main", "street"),
        ("123 MAIN ST", "123", "main", "street"),
        ("redacted", "", "", ""),
    ]
    df = _one_col(spark, [c[0] for c in cases], "addr")
    out = df.select(
        *[expr.alias(name) for name, expr in
          address_cols([F.col("addr")]).items()]).collect()
    for (addr, num, name, typ), row in zip(cases, out):
        assert row["address_street_number"] == num, addr
        assert row["address_street_name"] == name, addr
        assert row["address_street_type"] == typ, addr


def test_geography_merge(spark):
    # two columns -> "lat,lon" when both present (reference
    # process_geo_column); single column must already contain a comma
    df = spark.createDataFrame(
        [("41.1", "-87.6"), ("", "-87.6"), ("41.1", "")],
        "lat string, lon string")
    two = [r[0] for r in df.select(
        geography_col([F.col("lat"), F.col("lon")])).collect()]
    assert two == ["41.1,-87.6", "", ""]
    df1 = _one_col(spark, ["41.1,-87.6", "nocomma", ""], "geo")
    one = [r[0] for r in df1.select(
        geography_col([F.col("geo")])).collect()]
    assert one == ["41.1,-87.6", "", ""]


def test_schema_validation():
    with pytest.raises(ValueError, match="compare_type"):
        Variable(name="x", compare_type="Bogus", cols={"f": "x"})
    with pytest.raises(ValueError, match="column mapping"):
        Schema(data_files=[DataFile("f", "id"), DataFile("g", "id")],
               variables=[Variable(name="first_name",
                                   compare_type="String",
                                   cols={"f": "fn"}),
                          Variable(name="last_name",
                                   compare_type="String",
                                   cols={"f": "ln", "g": "ln"})])
    with pytest.raises(ValueError, match="blocking variable"):
        Schema(data_files=[DataFile("f", "id")],
               variables=[Variable(name="a", compare_type="String",
                                   cols={"f": "a"})])


def test_preprocess_with_schema_multi_dataset(spark):
    # two files with different source column names; checks applied per
    # compare_type; set_missing and drop lists honored
    f1 = spark.createDataFrame(
        [(1, " jon ", "smith", "1990-01-02", "77", "NA"),
         (2, "ANA", "DOE-LEE", "notadate", "x9", "ok")],
        "id long, fn string, ln string, d string, num string, s string")
    f2 = spark.createDataFrame(
        [(7, "BOB", "JONES", "1991-03-04", "12", "drop_me")],
        "id long, first string, last string, dob string, age string, "
        "stat string")
    schema = Schema(
        data_files=[DataFile("a", "id", "new"),
                    DataFile("b", "id", "existing")],
        variables=[
            Variable(name="first_name", compare_type="String",
                     cols={"a": "fn", "b": "first"}),
            Variable(name="last_name", compare_type="LastName",
                     cols={"a": "ln", "b": "last"}),
            Variable(name="dob", compare_type="Date",
                     check="Date - %Y-%m-%d",
                     cols={"a": "d", "b": "dob"}),
            Variable(name="age", compare_type="Numeric",
                     cols={"a": "num", "b": "age"}),
            Variable(name="status", compare_type="Categorical",
                     check=["OK", "NA", "DROP_ME"], set_missing=["NA"],
                     drop=["DROP_ME"],
                     cols={"a": "s", "b": "stat"}),
        ],
        blocking_scheme={
            "cosine_distance": {"variables": ["first_name",
                                              "last_name"]},
            "edit_distance": {"variable": "dob"},
        })
    an = preprocess_with_schema({"a": f1, "b": f2}, schema)
    rows = {r["record_id"]: r for r in an.collect()}
    assert set(rows) == {"a__1", "a__2", "b__7"}
    r1, r2, r7 = rows["a__1"], rows["a__2"], rows["b__7"]
    assert r1["first_name"] == "JON" and r1["last_name"] == "SMITH"
    assert r2["last_name"] == "DOE LEE"          # hyphen -> space
    assert r1["dob"] == "1990-01-02" and r2["dob"] == ""
    assert r1["age"] == "77" and r2["age"] == ""
    assert r1["status"] == ""                     # NA -> set_missing
    assert r2["status"] == "OK"
    assert r7["file_type"] == "existing" and r7["dataset"] == "b"
    assert r7["drop_from_nm"] == 1                # drop list fires
    assert r1["blockstring"] == "JON::SMITH::1990-01-02"
    # raw values preserved for output restore
    assert r1["tmp_raw__first_name"] == " jon "

    stats = {r["nn_string"]: r for r in nn_string_stats(
        an, ["first_name", "last_name"]).collect()}
    assert stats["JON SMITH"]["n_new"] == 1
    assert stats["JON SMITH"]["n_existing"] == 0
    assert "BOB JONES" not in stats               # dropped record
