"""Bit-parity of the opt-in pyjarowinkler JW variant against the
reference's own committed feature goldens.

The reference computes ``1 - pyjarowinkler.distance.get_jaro_distance``
(``comparison_functions.py:206-209``); that library diverges from
standard Jaro-Winkler (window ``floor(min/2)``, first-anywhere match
consumption, asymmetric two-pass matching, no boost threshold,
2-decimal rounding).  ``jaro_winkler_pyjw`` re-derives the algorithm;
this test proves parity by recomputing every jw_dist value in the
reference's golden ``data_rows.csv`` (328 values over 4 variables) from
the raw strings in its ``an.csv`` and requiring exact equality.

The engine default stays ``jw_variant="standard"`` (mirrors DuckDB's
``jaro_winkler_similarity`` so the contract oracles can value-check);
``PipelineConfig(jw_variant="pyjarowinkler")`` / config key
``jw_variant`` opts into reference bit-parity.
"""

from __future__ import annotations

import os

import pandas as pd
import pytest

REF_DATA = "/root/reference/tests/unit/data"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_DATA),
    reason="reference test data not available")

JW_VARS = [
    ("first_name", "var_first_name_jw_dist"),
    ("last_name", "var_last_name_jw_dist"),
    ("address_street_number", "var_address_street_number_jw_dist"),
    ("address_street_name", "var_address_street_name_jw_dist"),
]


def test_pyjw_matches_reference_goldens():
    from namematch_spark.functions.strings import jaro_winkler_pyjw
    an = (pd.read_csv(os.path.join(REF_DATA, "an.csv"), dtype=str)
          .fillna("").set_index("record_id"))
    dr = pd.read_csv(os.path.join(REF_DATA, "data_rows.csv"))
    checked = 0
    for col, var in JW_VARS:
        for _, row in dr.iterrows():
            golden = row.get(var)
            if pd.isna(golden):
                continue
            s1 = an.loc[row["record_id_1"], col]
            s2 = an.loc[row["record_id_2"], col]
            if not s1 or not s2:
                continue
            mine = 1 - jaro_winkler_pyjw(s1, s2)
            # goldens are float artifacts of the same `1 - round2`
            # arithmetic — exact to double precision
            assert abs(mine - golden) < 1e-12, (col, s1, s2, mine,
                                                golden)
            checked += 1
    assert checked >= 300    # 328 with the committed reference data


def test_variant_flows_through_pair_features(spark):
    """jw_variant reaches the Arrow-UDF feature stage: the two variants
    disagree on a known pair (standard keeps full precision, the
    variant rounds to 2 decimals and skips the boost threshold)."""
    from namematch_spark.functions.strings import (jaro_winkler,
                                                   jaro_winkler_pyjw)
    # DIXON vs DICKSONX: the canonical pair where rounding shows
    assert abs(jaro_winkler("DIXON", "DICKSONX")
               - jaro_winkler_pyjw("DIXON", "DICKSONX")) > 1e-6

    from namematch_spark.operators.pairs import pair_features
    rows = [("a", "b", "DIXON", "DICKSONX", "SMITH", "SMITH",
             "", "", "", "", "M", "M", "u1", "u2", 0.1)]
    cols = ["record_id_1", "record_id_2", "first_name_1", "first_name_2",
            "last_name_1", "last_name_2", "dob_1", "dob_2", "age_1",
            "age_2", "gender_1", "gender_2", "uid_1", "uid_2",
            "cos_dist"]
    from pyspark.sql import functions as F
    rp = spark.createDataFrame(rows, cols).withColumn("dr_id",
                                                      F.lit("p1"))
    std = pair_features(rp).select("var_first_name_jw_dist").first()[0]
    var = pair_features(rp, jw_variant="pyjarowinkler") \
        .select("var_first_name_jw_dist").first()[0]
    assert abs(std - (1 - jaro_winkler("DIXON", "DICKSONX"))) < 1e-12
    assert abs(var - (1 - jaro_winkler_pyjw("DIXON", "DICKSONX"))) < 1e-12
