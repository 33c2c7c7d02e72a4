"""CLI driver (reference ``cli.py:74-283``): full run, per-stage
subcommands, and checkpoint resume after a "killed" run."""

from __future__ import annotations

import json
import os

import yaml

from tests.conftest import SF_SMALL


def _make_inputs(spark, tmp_path):
    """Two CSV data files with different column names, split from the
    sf0.001 person derivation."""
    from pyspark.sql import functions as F

    from namematch_spark.sources.records import person_records
    # 1/3 deterministic subsample: the CLI e2e checks stage/resume/
    # artifact semantics, not model quality — full sf0.001 tripled the
    # RF/blocking cost for no extra coverage (VERDICT r4 #7)
    recs = person_records(spark, SF_SMALL).filter(
        F.abs(F.xxhash64("record_id", F.lit(7))) % 3 == 0)
    bucket = F.abs(F.xxhash64("record_id")) % 3
    a = recs.filter(bucket != 0)
    b = (recs.filter(bucket == 0)
         .withColumnRenamed("first_name", "fname")
         .withColumnRenamed("last_name", "surname"))
    pa, pb = str(tmp_path / "a.parquet"), str(tmp_path / "b.parquet")
    a.write.mode("overwrite").parquet(pa)
    b.write.mode("overwrite").parquet(pb)
    cfg = {
        "data_files": {
            "curr": {"filepath": pa, "record_id_col": "record_id",
                     "file_type": "new"},
            "hist": {"filepath": pb, "record_id_col": "record_id",
                     "file_type": "existing"},
        },
        "variables": [
            {"name": "first_name", "compare_type": "String",
             "curr_col": "first_name", "hist_col": "fname"},
            {"name": "last_name", "compare_type": "LastName",
             "curr_col": "last_name", "hist_col": "surname"},
            {"name": "dob", "compare_type": "Date",
             "check": "Date - %Y-%m-%d",
             "curr_col": "dob", "hist_col": "dob"},
            {"name": "age", "compare_type": "Numeric",
             "curr_col": "age", "hist_col": "age"},
            {"name": "gender", "compare_type": "Categorical",
             "check": ["M", "F"],
             "curr_col": "gender", "hist_col": "gender"},
            {"name": "uid", "compare_type": "UniqueID",
             "curr_col": "uid", "hist_col": "uid"},
        ],
        "num_trees": 5,
        "name_prob": False,
    }
    cfg_path = str(tmp_path / "config.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)
    return cfg_path


def test_cli_stage_then_resume_full_run(spark, tmp_path):
    from namematch_spark.cli import main
    cfg_path = _make_inputs(spark, tmp_path)
    out = str(tmp_path / "out")
    common = ["-c", cfg_path, "--output-dir", out,
              "--keep-session", "--shuffle-partitions", "8"]

    # stage subcommand: materialize through blocking, then "die"
    assert main(["block", *common]) == 0
    ckpt = os.path.join(out, "checkpoints")
    done = {d for d in os.listdir(ckpt)
            if os.path.isdir(os.path.join(ckpt, d))}
    assert {"all_names", "must_links", "candidates"} <= done
    assert "data_rows" not in done
    mtimes = {d: os.path.getmtime(os.path.join(ckpt, d)) for d in done}

    # full run resumes: earlier stage outputs are reused, not rebuilt
    assert main(["run", *common]) == 0
    for d, t in mtimes.items():
        assert os.path.getmtime(os.path.join(ckpt, d)) == t, \
            f"stage {d} was recomputed instead of resumed"
    info = json.load(open(os.path.join(out, "nm_info.json")))
    assert info["stage"] == "all"
    # per-file outputs with cluster ids exist and carry original columns
    out_a = os.path.join(out, "curr_with_clusterid")
    assert os.path.isdir(out_a)
    df = (spark.read.option("header", True).csv(out_a))
    assert "cluster_id" in df.columns and "first_name" in df.columns
    assert df.count() > 0
    # all-names parquet with restored raw values
    an = spark.read.parquet(os.path.join(out, "all_names"))
    assert "cluster_id" in an.columns
    assert an.count() > 0
    # stage 9: report artifact (reference generate_report.py:34-55;
    # its e2e test asserts existence, test_namematcher.py:6-20)
    html = open(os.path.join(out, "matching_report.html")).read()
    for univ in ("all pairs", "exactmatch pairs",
                 "non exactmatch pairs"):
        assert univ in html, f"universe block '{univ}' missing"
    assert os.path.isfile(os.path.join(out, "matching_report.md"))
    info2 = json.load(open(os.path.join(out, "nm_info.json")))
    assert "counts" in info2 and "phat_histogram" in info2
    assert info2["counts"]["clusters"] > 0
    # M6 artifact (reference fit_model.py:81,228): written every full
    # run; header-only here (allow_clusters_w_multiple_unique_ids off)
    f0 = os.path.join(out, "flipped0_potential_edges.csv")
    assert os.path.isfile(f0)
    header = open(f0).readline().strip().split(",")
    assert {"record_id_1", "record_id_2", "phat",
            "label"} <= set(header)
