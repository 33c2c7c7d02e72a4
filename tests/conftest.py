from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

SF_SMALL = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    from namematch_spark.session import get_spark
    s = get_spark(app_name="namematch-tests", master="local[8]",
                  conf={"spark.sql.shuffle.partitions": "8"})
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def all_names(spark):
    from namematch_spark.operators.preprocess import preprocess
    from namematch_spark.sources.records import person_records
    df = preprocess(person_records(spark, SF_SMALL)).cache()
    df.count()
    return df
