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
