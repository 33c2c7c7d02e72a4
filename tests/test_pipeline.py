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


def test_output_and_report(result, tmp_path):
    from namematch_spark.operators.output import all_names_with_clusterid
    from namematch_spark.operators.report import generate_report
    out = all_names_with_clusterid(result.all_names, result.clusters)
    assert "cluster_id" in out.columns
    assert not [c for c in out.columns if c.startswith("tmp_raw__")]
    # raw values restored: some last names regain their hyphen
    assert out.filter(F.col("last_name").contains("-")).count() > 0
    path = generate_report(result, str(tmp_path / "report"))
    text = open(path).read()
    assert "Matching report" in text and "Cluster size" in text
    import json
    info = json.load(open(str(tmp_path / "report" / "nm_info.json")))
    assert info["counts"]["clusters"] > 0


def test_checkpoint_append(spark, tmp_path):
    from namematch_spark.checkpoint import CheckpointManager
    ck = CheckpointManager(str(tmp_path / "cka"))
    b1 = spark.range(10).withColumn("v", F.col("id"))
    b2 = spark.range(10, 25).withColumn("v", F.col("id"))
    assert ck.append("stream_stage", b1).count() == 10
    out = ck.append("stream_stage", b2)
    assert out.count() == 25
    assert ck.manifest["stream_stage"]["rows"] == 25
    assert ck.manifest["stream_stage"]["batches"] == 2


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
