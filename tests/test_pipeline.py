"""End-to-end quality gate: pairwise F1 >= 0.99 on labeled pairs at the
fixed blocking key (BASELINE.json), blocking pair completeness, and
checkpoint/resume semantics."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def result(pipeline_result):
    # session-scoped single pipeline run (conftest) — shared with the
    # feature-invariant tests so the sf0.001 pipeline builds ONCE
    return pipeline_result


def test_f1_gate(result):
    pw = result.metrics["pairwise"]
    assert pw["f1"] >= 0.99, pw


def test_pair_completeness(result):
    # U3 uncovered-pair injection (reference block.py:872-904): every
    # ground-truth pair blocking missed is appended to the candidate
    # stream, so data-row pair completeness on gt pairs is EXACTLY 1.0
    assert result.metrics["pair_completeness"] == 1.0
    assert "covered_pair" in result.data_rows.columns


def test_pair_completeness_without_injection(result):
    # the covered_pair==1 subset of the data rows IS the pre-injection
    # candidate expansion (injection only appends covered_pair=0 rows;
    # the anti-join is order-normalized so nothing duplicates) — so the
    # blocking quality gate is checkable from the shared result
    from namematch_spark.operators import blocking as B
    ml = result.must_links.filter((F.col("drop_from_nm_1") == 0)
                                  & (F.col("drop_from_nm_2") == 0))
    raw = B.pair_completeness(
        result.data_rows.filter(F.col("covered_pair") == 1)
        .select("record_id_1", "record_id_2"), ml)
    assert raw >= 0.99          # blocking alone (pre-injection)
    # injection closes the gap exactly (= metrics["pair_completeness"])
    assert result.metrics["pair_completeness"] == 1.0


def test_f1_vs_true_entities(result, spark):
    """Pairwise F1 vs the FULL hidden ground truth (``true_entity`` —
    every record, not just the ~2/3 with a revealed uid), at the same
    blocking key: for every candidate pair, predicted co-cluster vs
    true co-entity.  The BASELINE gate's reference-cluster comparison
    cannot literally run here (the reference needs sklearn + nmslib,
    absent from this environment, no installs allowed); the true-entity
    partition is the partition the reference pipeline is itself judged
    against, so matching it at F1 ≥ 0.99 is the strongest available
    evidence."""
    from namematch_spark.sources.records import person_records
    te = person_records(result.clusters.sparkSession, SF_SMALL) \
        .select("record_id", "true_entity")
    cl = result.clusters
    pairs = (
        result.data_rows.select("record_id_1", "record_id_2")
        .join(te.select(F.col("record_id").alias("record_id_1"),
                        F.col("true_entity").alias("__t1")),
              "record_id_1")
        .join(te.select(F.col("record_id").alias("record_id_2"),
                        F.col("true_entity").alias("__t2")),
              "record_id_2")
        .join(cl.select(F.col("record_id").alias("record_id_1"),
                        F.col("cluster_id").alias("__c1")),
              "record_id_1")
        .join(cl.select(F.col("record_id").alias("record_id_2"),
                        F.col("cluster_id").alias("__c2")),
              "record_id_2"))
    row = pairs.agg(
        F.sum(((F.col("__t1") == F.col("__t2"))
               & (F.col("__c1") == F.col("__c2"))).cast("int"))
        .alias("tp"),
        F.sum(((F.col("__t1") != F.col("__t2"))
               & (F.col("__c1") == F.col("__c2"))).cast("int"))
        .alias("fp"),
        F.sum(((F.col("__t1") == F.col("__t2"))
               & (F.col("__c1") != F.col("__c2"))).cast("int"))
        .alias("fn")).first()
    tp, fp, fn = row["tp"], row["fp"], row["fn"]
    prec = tp / (tp + fp)
    rec = tp / (tp + fn)
    f1 = 2 * prec * rec / (prec + rec)
    assert f1 >= 0.99, (tp, fp, fn, f1)


def test_clusters_det_golden_fixture(spark):
    """Pinned golden: the deterministic-score clustering at sf0.001
    (the er_clusters_det contract input) must reproduce the committed
    fixture exactly — regression protection for the greedy replay,
    CC, veto and triage, independent of the driver's oracle run."""
    import csv
    import os
    import __spark_entry__ as E
    got = {r["record_id"]: r["cluster_id"]
           for r in E.q_er_clusters_det(spark, SF_SMALL).collect()}
    fixture = os.path.join(os.path.dirname(__file__), "fixtures",
                           "clusters_det_sf0001.csv")
    with open(fixture) as f:
        want = {row["record_id"]: row["cluster_id"]
                for row in csv.DictReader(f)}
    assert got == want


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
