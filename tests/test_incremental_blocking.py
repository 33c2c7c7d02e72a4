"""Incremental blocking (reference ``block.py:467-532``): batch 2
queries only new-record names against the persisted band-row index;
cost scales with the batch, the candidate set matches a full rebuild
restricted to new-name pairs."""

from __future__ import annotations

import pyspark.sql.functions as F

from namematch_spark.operators.blocking import lsh_candidates
from namematch_spark.operators.incremental import (
    incremental_lsh_candidates, index_exists)


def _stats(spark, names_new, names_existing):
    rows = ([(n, 1, 0, 1) for n in names_new]
            + [(n, 0, 1, 1) for n in names_existing])
    return spark.createDataFrame(
        rows, "nn_string string, n_new int, n_existing int, n_total int")


NAMES_1 = ["JOHN SMITH", "JON SMITH", "MARY JONES", "MARY JONS",
           "ROBERT BROWN", "PATRICIA GARCIA", "LINDA WILLIAMS",
           "DAVID JOHNSON", "JAMES WILSON", "BARBARA MILLER"]
NAMES_2 = ["JOHNN SMITH", "MARY JONES JR", "MICHAEL DAVIS"]


def test_two_batch_incremental(spark, tmp_path):
    idx = str(tmp_path / "blocking_index")

    # ---- batch 1: no index yet -> full build
    s1 = _stats(spark, NAMES_1, [])
    p1, info1 = incremental_lsh_candidates(s1, idx, rows_per_band=2)
    assert info1["mode"] == "full"
    assert info1["n_queried"] == len(NAMES_1)
    assert index_exists(idx)
    full1 = {(r["nn_string_1"], r["nn_string_2"])
             for r in p1.collect()}
    # sanity: near-identical names are candidates
    assert ("JOHN SMITH", "JON SMITH") in full1

    # ---- batch 2: old names are now "existing", 3 new names arrive
    s2 = _stats(spark, NAMES_2, NAMES_1)
    p2, info2 = incremental_lsh_candidates(s2, idx, rows_per_band=2)
    assert info2["mode"] == "incremental"
    # cost ∝ new names, not the corpus
    assert info2["n_queried"] == len(NAMES_2)
    assert info2["n_new_names"] == len(NAMES_2)
    inc = {(r["nn_string_1"], r["nn_string_2"]) for r in p2.collect()}
    # every incremental pair involves a new name
    assert all(a in NAMES_2 or b in NAMES_2 for a, b in inc)
    # parity: = full rebuild over all names, restricted to pairs
    # touching a new name
    nn_all = spark.createDataFrame(
        [(n,) for n in NAMES_1 + NAMES_2], "nn_string string")
    full2 = {(r["nn_string_1"], r["nn_string_2"])
             for r in lsh_candidates(nn_all, rows_per_band=2).collect()}
    expected = {(a, b) for a, b in full2
                if a in NAMES_2 or b in NAMES_2}
    assert inc == expected
    assert expected      # non-trivial: the new typo matches old names

    # ---- batch 3: the batch-2 names are in the index now
    s3 = _stats(spark, ["JAMES WILSOM"], NAMES_1 + NAMES_2)
    p3, info3 = incremental_lsh_candidates(s3, idx, rows_per_band=2)
    assert info3["mode"] == "incremental"
    assert info3["n_queried"] == 1
    got3 = {(r["nn_string_1"], r["nn_string_2"]) for r in p3.collect()}
    assert ("JAMES WILSOM", "JAMES WILSON") in got3 \
        or ("JAMES WILSON", "JAMES WILSOM") in got3


def test_secondary_limit_triggers_rebuild(spark, tmp_path):
    idx = str(tmp_path / "blocking_index")
    s1 = _stats(spark, NAMES_1, [])
    incremental_lsh_candidates(s1, idx, rows_per_band=2)
    s2 = _stats(spark, NAMES_2, NAMES_1)
    _, info = incremental_lsh_candidates(s2, idx, rows_per_band=2,
                                         secondary_limit=2)
    assert info["mode"] == "full"
    assert info["n_index"] == len(NAMES_1) + len(NAMES_2)


def test_incremental_cli_two_batch(spark, tmp_path):
    """e2e incremental run through the CLI (reference block.py:467-532
    composed with cluster.py:140-144): month-2 blocking queries only
    the new batch's names and month-1 cluster ids stay stable."""
    import json
    import os

    import yaml

    from namematch_spark.cli import main
    from namematch_spark.sources.records import person_records
    from tests.conftest import SF_SMALL

    # 1/3 deterministic subsample — this e2e checks incremental-mode
    # semantics (index reuse, cluster-id stability), not model quality;
    # it runs TWO full pipelines, so input size costs double (r4 #7)
    recs = person_records(spark, SF_SMALL).filter(
        F.abs(F.xxhash64("record_id", F.lit(7))) % 3 == 0).cache()
    b2 = F.abs(F.xxhash64("record_id")) % 5 == 0     # ~20% arrive later
    recs.filter(~b2).write.mode("overwrite").parquet(
        str(tmp_path / "m1.parquet"))

    variables = [
        {"name": "first_name", "compare_type": "String",
         "m1_col": "first_name", "old_col": "first_name",
         "new_col": "first_name"},
        {"name": "last_name", "compare_type": "LastName",
         "m1_col": "last_name", "old_col": "last_name",
         "new_col": "last_name"},
        {"name": "dob", "compare_type": "Date",
         "check": "Date - %Y-%m-%d",
         "m1_col": "dob", "old_col": "dob", "new_col": "dob"},
        {"name": "age", "compare_type": "Numeric",
         "m1_col": "age", "old_col": "age", "new_col": "age"},
        {"name": "gender", "compare_type": "Categorical",
         "check": ["M", "F"],
         "m1_col": "gender", "old_col": "gender", "new_col": "gender"},
        {"name": "uid", "compare_type": "UniqueID",
         "m1_col": "uid", "old_col": "uid", "new_col": "uid"},
    ]
    idx = str(tmp_path / "bindex")
    out1 = str(tmp_path / "out1")
    cfg1 = {"data_files": {"m1": {
                "filepath": str(tmp_path / "m1.parquet"),
                "record_id_col": "record_id", "file_type": "new"}},
            "variables": variables, "num_trees": 5, "name_prob": False}
    with open(tmp_path / "cfg1.yaml", "w") as f:
        yaml.safe_dump(cfg1, f)
    assert main(["run", "-c", str(tmp_path / "cfg1.yaml"),
                 "--output-dir", out1, "--index-dir", idx,
                 "--keep-session", "--shuffle-partitions", "8"]) == 0
    info1 = json.load(open(os.path.join(out1, "nm_info.json")))
    assert info1["metrics"]["blocking"]["mode"] == "full"

    # month 2: month-1 records become 'existing' with their cluster id
    # as ExistingID; the held-out 20% arrive as 'new'.  record_id is
    # nickname-prefixed per run (P1) — strip to the original id.
    deprefix = F.regexp_replace("record_id", "^[^_]+__", "")
    m1_clusters = (spark.read.parquet(os.path.join(out1, "all_names"))
                   .select(deprefix.alias("record_id"), "cluster_id"))
    assert m1_clusters.count() > 0
    (recs.filter(~b2).join(m1_clusters, "record_id")
         .withColumnRenamed("cluster_id", "eid")
         .write.mode("overwrite").parquet(str(tmp_path / "old.parquet")))
    (recs.filter(b2).withColumn("eid", F.lit(""))
         .write.mode("overwrite").parquet(str(tmp_path / "new.parquet")))
    ev = {"name": "existing_id", "compare_type": "ExistingID",
          "old_col": "eid", "new_col": "eid"}
    cfg2 = {"data_files": {
                "old": {"filepath": str(tmp_path / "old.parquet"),
                        "record_id_col": "record_id",
                        "file_type": "existing"},
                "new": {"filepath": str(tmp_path / "new.parquet"),
                        "record_id_col": "record_id",
                        "file_type": "new"}},
            "variables": variables + [ev],
            "num_trees": 5, "name_prob": False}
    with open(tmp_path / "cfg2.yaml", "w") as f:
        yaml.safe_dump(cfg2, f)
    out2 = str(tmp_path / "out2")
    assert main(["run", "-c", str(tmp_path / "cfg2.yaml"),
                 "--output-dir", out2, "--index-dir", idx,
                 "--keep-session", "--shuffle-partitions", "8"]) == 0
    info2 = json.load(open(os.path.join(out2, "nm_info.json")))
    blk = info2["metrics"]["blocking"]
    assert blk["mode"] == "incremental"
    # blocking cost ∝ the new batch, not the corpus: the query set is
    # the names touched by new records (~20% of records)
    n_names_total = (recs.withColumn(
        "nn", F.concat_ws(" ", "first_name", "last_name"))
        .select("nn").distinct().count())
    assert 0 < blk["n_queried"] < 0.55 * n_names_total
    # month-1 cluster ids stay stable (G4: eid wins)
    # the month-1 CLUSTER id strings must survive verbatim (eid wins)
    an2 = (spark.read.parquet(os.path.join(out2, "all_names"))
           .select(deprefix.alias("record_id"), "cluster_id"))
    joined = (m1_clusters.withColumnRenamed("cluster_id", "cid1")
              .join(an2, "record_id"))
    n_m1 = joined.count()
    n_stable = joined.filter(F.col("cid1") == F.col("cluster_id")) \
        .count()
    assert n_m1 > 0 and n_stable >= 0.9 * n_m1
    recs.unpersist()
