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
                                                eager_cache_enabled,
                                                lsh_band_rows)


#: Index layout: ``{path}/base`` (full build) plus zero or more
#: committed ``{path}/batch_NNNN`` increments.  Each increment is
#: written to a ``{path}/_tmp_*`` staging dir first and promoted with
#: an atomic ``os.rename`` only AFTER the caller's batch output is
#: materialized — a crashed/partial append leaves only a ``_tmp_*``
#: dir the loader never reads, so band rows can never be duplicated
#: toward the ``max_bucket`` drop threshold (ADVICE r3).  On a real
#: cluster the same protocol is a cheap object-store prefix commit.

def _committed_dirs(path: str) -> list[str]:
    if not os.path.isdir(path):
        return []
    return sorted(
        os.path.join(path, d) for d in os.listdir(path)
        if (d == "base" or d.startswith("batch_"))
        and os.path.isdir(os.path.join(path, d)))


def index_exists(path: str) -> bool:
    # a base without Spark's _SUCCESS marker is a crashed partial
    # rebuild — treat it as absent so the next run rebuilds instead of
    # silently loading a truncated index (ADVICE r4)
    return any(
        d.endswith("/base")
        and os.path.exists(os.path.join(d, "_SUCCESS"))
        for d in _committed_dirs(path))


def build_blocking_index(nn: DataFrame, path: str,
                         num_hashes: int = DEFAULT_NUM_HASHES,
                         rows_per_band: int = 6) -> DataFrame:
    """Full (re)build: write every name's band rows
    (``save_main_index``, ``block.py:1432-1445``).  A rebuild clears
    prior increments — the new base supersedes them.

    Crash-safe like :func:`_commit_increment`: the new base is staged
    under ``_tmp_*`` and renamed into place only after the write
    completes, and the OLD tree is cleared only immediately before
    that rename — a crash at any point leaves either the intact old
    index or a ``_tmp_*`` dir the loader never reads (ADVICE r4).
    """
    import shutil
    import uuid
    band = lsh_band_rows(nn, num_hashes=num_hashes,
                         rows_per_band=rows_per_band)
    staging = f"{path.rstrip('/')}_tmp_{uuid.uuid4().hex[:12]}"
    try:
        band.write.mode("overwrite").partitionBy("band") \
            .parquet(os.path.join(staging, "base"))
        if os.path.isdir(path):
            shutil.rmtree(path)
        os.rename(staging, path)
    except BaseException:
        # don't leak an index-sized _tmp_* tree per failed rebuild
        # (disk-full / schema error / concurrent-rebuild rename race);
        # the loader never reads _tmp_* so removal is always safe
        shutil.rmtree(staging, ignore_errors=True)
        raise
    return band


def _commit_increment(df: DataFrame, path: str) -> None:
    """Stage-then-rename append of secondary band rows."""
    import errno
    import uuid
    staging = os.path.join(path, f"_tmp_{uuid.uuid4().hex[:12]}")
    df.write.mode("overwrite").partitionBy("band").parquet(staging)
    n = len([d for d in os.listdir(path) if d.startswith("batch_")])
    while True:
        final = os.path.join(path, f"batch_{n:04d}")
        if os.path.exists(final):    # concurrent batch took this slot
            n += 1
            continue
        try:
            os.rename(staging, final)
        except OSError as ex:
            # a concurrent writer won the slot between the exists()
            # check and the rename (rename onto a non-empty dir raises
            # rather than clobbering) — take the next slot (ADVICE r4).
            # ONLY the slot-race errnos retry: anything else (staging
            # vanished because a rebuild rmtree'd the index, EACCES,
            # ...) is persistent and would spin this loop forever.
            if ex.errno in (errno.EEXIST, errno.ENOTEMPTY):
                n += 1
                continue
            raise
        return


def load_blocking_index(spark: SparkSession, path: str) -> DataFrame:
    # one read per committed dir (each with its own band=… partition
    # discovery), unioned — a single multi-root read would conflict on
    # the differing directory structures; partition pruning on ``band``
    # still reaches every branch of the union
    dirs = _committed_dirs(path)
    df = spark.read.parquet(dirs[0])
    for d in dirs[1:]:
        df = df.unionByName(spark.read.parquet(d))
    return df


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
        # populate eagerly: the self-join's two map stages both scan
        # this cache and can run concurrently — cold, each recomputes
        # the full band lineage (see blocking._scoped_cache)
        if eager_cache_enabled():
            pruned.count()
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
    # eager for the same concurrent-consumer reason as _scoped_cache
    if eager_cache_enabled():
        q_band.count()
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

    # materialize BEFORE committing to the index: the parquet scan
    # under ``main`` lists files lazily, so committing first would make
    # the pairs plan read the new rows twice (once via the union, once
    # via the new files) — and a failure before this point must leave
    # the index untouched (stage-then-rename, see _commit_increment)
    pairs = pairs.localCheckpoint(eager=True)
    # persist the secondary rows so batch N+2 treats them as existing
    _commit_increment(second_band, index_path)
    q_band.unpersist()
    return pairs, {"mode": "incremental", "n_queried": n_queried,
                   "n_new_names": second_names.count()}


def incremental_blockstring_pairs(all_names: DataFrame,
                                  index_path: str,
                                  bars: dict | None = None,
                                  num_hashes: int = DEFAULT_NUM_HASHES,
                                  rows_per_band: int = 6,
                                  max_penalty: float = 0.1,
                                  secondary_limit: int = 500_000,
                                  ) -> tuple[DataFrame, dict]:
    """Incremental stage-3 blocking for the pipeline (reference
    ``block.py:467-532`` query-only-new-names composed with the full
    bar chain of ``candidate_blockstring_pairs``).

    ``all_names`` must carry ``file_type`` (P2): names appearing in a
    ``file_type == 'new'`` record are the query set.  The LSH leg runs
    over the persisted band-row index (split-name variants included,
    matching the full path's recall), and the deterministic-phonetic +
    exact legs are restricted to pairs touching a queried name — so a
    month-2 batch's blocking cost scales with the batch, not the
    corpus, while the emitted pairs are exactly the full rebuild's
    pairs restricted to those touching a new name.

    Returns ``(blockstring_pairs, info)`` with ``info`` from
    :func:`incremental_lsh_candidates` (mode / n_queried / …).
    """
    from namematch_spark.operators import blocking as B

    nn = B.nn_strings(all_names)
    # scoped cache: consumed by vstats and both relabel joins; released
    # with the other blocking caches at the pipeline stage boundary
    variants = B._scoped_cache(B.name_variants(nn))
    new_full = (
        all_names
        .filter((F.col("drop_from_nm") == 0)
                & (F.col("file_type") == "new"))
        .withColumn("nn_string",
                    F.concat_ws(" ", "first_name", "last_name"))
        .select("nn_string").distinct())
    # variant-level stats: n_new = how many of the variant's full
    # names appear in a new record (a true A1-style count, ADVICE r4;
    # the query-set filter only needs n_new > 0).  The index is keyed
    # on variants so split-name recall matches the full path.
    vstats = (
        variants
        .join(new_full.withColumnRenamed("nn_string", "full")
              .withColumn("__new", F.lit(1)), "full", "left")
        .groupBy("nn_string")
        .agg(F.sum(F.coalesce(F.col("__new"), F.lit(0)))
             .alias("n_new"),
             F.count("*").alias("n_total"))
        .withColumn("n_existing", F.col("n_total") - F.col("n_new")))
    pairs_v, info = incremental_lsh_candidates(
        vstats, index_path, num_hashes=num_hashes,
        rows_per_band=rows_per_band, secondary_limit=secondary_limit)
    # relabel variant pairs back to FULL-name canonical pairs (what
    # lsh_candidates does internally on the full path)
    v1 = variants.select(F.col("nn_string").alias("nn_string_1"),
                         F.col("full").alias("__f1"))
    v2 = variants.select(F.col("nn_string").alias("nn_string_2"),
                         F.col("full").alias("__f2"))
    lsh_full = (
        pairs_v.join(v1, "nn_string_1").join(v2, "nn_string_2")
        .select(F.least("__f1", "__f2").alias("nn_string_1"),
                F.greatest("__f1", "__f2").alias("nn_string_2"))
        .filter(F.col("nn_string_1") != F.col("nn_string_2"))
        .dropDuplicates(["nn_string_1", "nn_string_2"]))
    bs = B.candidate_blockstring_pairs(
        all_names, bars=bars, num_hashes=num_hashes,
        rows_per_band=rows_per_band, max_penalty=max_penalty,
        lsh_pairs=lsh_full, restrict_names=new_full)
    return bs, info
