from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

SF_SMALL = "/root/testdata/sf0.001"

# Tiny-fixture suite: skip the eager cache-population count jobs (a
# production-scale perf guard against concurrent consumers recomputing
# cold cached subtrees — see blocking._scoped_cache).  At sf0.001 each
# count is pure per-job scheduler overhead against a microsecond
# subtree, and hundreds of pipeline invocations add minutes of wall
# time without changing any result.  Eager behavior itself is exercised
# by bench.py at sf0.1.
os.environ.setdefault("NM_LAZY_CACHE", "1")


@pytest.fixture(scope="session")
def spark():
    from namematch_spark.session import get_spark
    # local[8] + 8 shuffle partitions + AQE on is the measured sweet
    # spot for this suite: 4 partitions is wall-time-neutral (the tests
    # are per-JOB latency-bound, not per-task), AQE off nearly doubles
    # test_cluster (106 s -> 179 s: runtime broadcast conversion and
    # partition coalescing are net wins even at fixture scale)
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
