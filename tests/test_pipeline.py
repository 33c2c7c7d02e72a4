"""End-to-end quality gate: pairwise F1 >= 0.99 on labeled pairs at the
fixed blocking key (BASELINE.json), blocking pair completeness, and
checkpoint/resume semantics."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def result(spark):
    from namematch_spark.pipeline import PipelineConfig, run_pipeline
    from namematch_spark.sources.records import person_records
    return run_pipeline(person_records(spark, SF_SMALL),
                        PipelineConfig(evaluate=True))


def test_f1_gate(result):
    pw = result.metrics["pairwise"]
    assert pw["f1"] >= 0.99, pw


def test_pair_completeness(result):
    assert result.metrics["pair_completeness"] >= 0.99


def test_cluster_count_sane(result):
    # 150 true entities at sf0.001; allow small slack
    n = result.metrics["n_clusters"]
    assert 140 <= n <= 165, n


def test_every_record_assigned(result, all_names):
    n_rec = all_names.filter(F.col("drop_from_nm") == 0).count()
    assert result.clusters.count() == n_rec
    assert result.clusters.filter(F.col("cluster_id").isNull()).count() == 0


def test_checkpoint_resume(spark, tmp_path):
    from namematch_spark.checkpoint import CheckpointManager
    ck = CheckpointManager(str(tmp_path / "ck"))
    df = spark.range(100).withColumn("v", F.col("id") * 2)
    out1 = ck.write("stage_a", df, fingerprint="f1")
    assert out1.count() == 100
    assert ck.manifest["stage_a"]["rows"] == 100

    calls = []

    def compute():
        calls.append(1)
        return df

    # same fingerprint -> no recompute
    ck2 = CheckpointManager(str(tmp_path / "ck"))
    out2 = ck2.load_or_compute(spark, "stage_a", compute, fingerprint="f1")
    assert out2.count() == 100 and calls == []
    # changed fingerprint -> recompute
    out3 = ck2.load_or_compute(spark, "stage_a", compute, fingerprint="f2")
    assert out3.count() == 100 and calls == [1]
    # downstream invalidation
    ck2.write("stage_b", df, fingerprint="x")
    ck2.invalidate_downstream(["stage_a", "stage_b"], "stage_a")
    assert "stage_b" not in ck2.manifest
