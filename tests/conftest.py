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
    # local[16] + 8 shuffle partitions + AQE on: the tiny fixtures are
    # per-JOB latency-bound (insensitive to master width; 4 vs 8
    # partitions wall-time-neutral; AQE off nearly doubles test_cluster
    # 106 s -> 179 s — runtime broadcast conversion and coalescing are
    # net wins even at fixture scale), but the suite's dominant COMPUTE
    # is the sf0.01 RF-golden module (2 concurrent 100-tree fits +
    # full-universe scoring): measured 109 s at local[8] vs 66 s at
    # local[16] for the same train_model_set.  8 partitions stays —
    # widening shuffles would only add task overhead to the tiny tests.
    s = get_spark(app_name="namematch-tests", master="local[16]",
                  conf={"spark.sql.shuffle.partitions": "8"})
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def pipeline_result(spark):
    """ONE full sf0.001 pipeline run (evaluate=True) shared by every
    test that needs an end-to-end artifact (f1/completeness gates,
    feature invariants, …) — each module building its own pipeline was
    the single largest duplicated cost in the suite (VERDICT r4 #7)."""
    from namematch_spark.pipeline import PipelineConfig, run_pipeline
    from namematch_spark.sources.records import person_records
    return run_pipeline(person_records(spark, SF_SMALL),
                        PipelineConfig(evaluate=True))


@pytest.fixture(scope="session")
def all_names(spark):
    from namematch_spark.operators.preprocess import preprocess
    from namematch_spark.sources.records import person_records
    df = preprocess(person_records(spark, SF_SMALL)).cache()
    df.count()
    return df
