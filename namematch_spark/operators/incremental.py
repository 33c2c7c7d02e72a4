"""Incremental blocking — index reuse across batches (reference
``block.py:467-532`` get_indices + ``block.py:313-349``
get_query_strings + ``block.py:1432-1460`` index persistence).

The reference persists an nmslib HNSW index and, on an incremental run,
queries it only with names that appear in NEW records, building a small
secondary index for never-before-seen names; a rebuild policy caps the
secondary index.  The Spark-native analogue replaces the HNSW file with
a parquet of LSH band rows (:func:`blocking.lsh_band_rows` — the
band-bucket table IS the index):

* **query side** = band rows of names with ``n_new > 0`` only
  (``block.py:341``) — blocking cost scales with the batch, not the
  corpus;
* **index side** = the persisted band rows ∪ the genuinely-new names'
  rows (the reference's main + secondary index, ``block.py:538-560``);
* after the run the new names' rows are APPENDED to the index parquet,
  so batch N+1 reuses them;
* ``secondary_limit`` = the reference's
  ``index.secondary_index_limit`` rebuild trigger
  (``default_parameters.yaml`` / ``block.py:495-499``): when the new
  batch exceeds it, the index is rebuilt from scratch.

At 100 TB the index parquet is partitioned by ``band`` — the join on
``(band, bkey)`` shuffles only the query side when the index is
bucketed/partitioned on the same key.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from namematch_spark.operators.blocking import (DEFAULT_NUM_HASHES,
                                                lsh_band_rows)


def index_exists(path: str) -> bool:
    return os.path.isdir(path) and bool(
        [f for f in os.listdir(path) if f.endswith(".parquet")
         or f == "_SUCCESS"])


def build_blocking_index(nn: DataFrame, path: str,
                         num_hashes: int = DEFAULT_NUM_HASHES,
                         rows_per_band: int = 6) -> DataFrame:
    """Full (re)build: write every name's band rows
    (``save_main_index``, ``block.py:1432-1445``)."""
    band = lsh_band_rows(nn, num_hashes=num_hashes,
                         rows_per_band=rows_per_band)
    band.write.mode("overwrite").partitionBy("band").parquet(path)
    return band


def load_blocking_index(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def incremental_lsh_candidates(nn_stats: DataFrame, index_path: str,
                               num_hashes: int = DEFAULT_NUM_HASHES,
                               rows_per_band: int = 6,
                               max_bucket: int = 2000,
                               secondary_limit: int = 500_000,
                               ) -> tuple[DataFrame, dict]:
    """LSH candidate pairs for an incremental batch.

    ``nn_stats``: the A1 table (``nn_string, n_new, n_existing,
    n_total`` — :func:`namematch_spark.schema.nn_string_stats`).

    Returns ``(pairs, info)``: canonical ``nn_string_1 < nn_string_2``
    pairs where at least one side appears in a new record (the
    existing×existing pairs were produced by earlier batches, exactly
    the reference's incremental contract), and an info dict with
    ``mode`` (``full`` | ``incremental``) and ``n_queried``.
    """
    spark = nn_stats.sparkSession
    all_names = nn_stats.select("nn_string")

    def _full() -> tuple[DataFrame, dict]:
        band = build_blocking_index(all_names, index_path,
                                    num_hashes=num_hashes,
                                    rows_per_band=rows_per_band)
        sizes = band.groupBy("band", "bkey").agg(
            F.count("*").alias("__bn"))
        pruned = (band.join(sizes, ["band", "bkey"])
                  .filter((F.col("__bn") > 1)
                          & (F.col("__bn") <= max_bucket))
                  .drop("__bn").cache())
        l, r = pruned.alias("l"), pruned.alias("r")
        pairs = (
            l.join(r, ["band", "bkey"])
            .filter(F.col("l.nn_string") < F.col("r.nn_string"))
            .select(F.col("l.nn_string").alias("nn_string_1"),
                    F.col("r.nn_string").alias("nn_string_2"))
            .dropDuplicates(["nn_string_1", "nn_string_2"])
            .localCheckpoint(eager=True))
        pruned.unpersist()
        n = all_names.count()
        return pairs, {"mode": "full", "n_queried": n,
                       "n_index": n}

    if not index_exists(index_path):
        return _full()

    main = load_blocking_index(spark, index_path)
    query_names = nn_stats.filter(F.col("n_new") > 0) \
        .select("nn_string")
    n_queried = query_names.count()
    if n_queried >= secondary_limit:
        # reference rebuild policy: secondary index exceeds limit
        return _full()

    # secondary index: genuinely-new strings (not in the main index)
    main_names = main.select("nn_string").distinct()
    second_names = query_names.join(main_names, "nn_string",
                                    "left_anti")
    q_band = lsh_band_rows(query_names, num_hashes=num_hashes,
                           rows_per_band=rows_per_band).cache()
    second_band = q_band.join(second_names, "nn_string", "semi")
    index_band = main.select("nn_string", "band", "bkey") \
        .unionByName(second_band)

    sizes = index_band.groupBy("band", "bkey").agg(
        F.count("*").alias("__bn"))
    idx_pruned = (index_band.join(sizes, ["band", "bkey"])
                  .filter(F.col("__bn") <= max_bucket)
                  .drop("__bn"))
    q, i = q_band.alias("q"), idx_pruned.alias("i")
    pairs = (
        q.join(i, ["band", "bkey"])
        .filter(F.col("q.nn_string") != F.col("i.nn_string"))
        .select(F.least("q.nn_string", "i.nn_string")
                .alias("nn_string_1"),
                F.greatest("q.nn_string", "i.nn_string")
                .alias("nn_string_2"))
        .dropDuplicates(["nn_string_1", "nn_string_2"]))

    # materialize BEFORE appending to the index: the parquet scan under
    # ``main`` lists files lazily, so appending first would make the
    # pairs plan read the new rows twice (once via the union, once via
    # the appended files)
    pairs = pairs.localCheckpoint(eager=True)
    # persist the secondary rows so batch N+2 treats them as existing
    second_band.write.mode("append").partitionBy("band") \
        .parquet(index_path)
    q_band.unpersist()
    return pairs, {"mode": "incremental", "n_queried": n_queried,
                   "n_new_names": second_names.count()}
