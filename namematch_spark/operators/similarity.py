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

from namematch_spark.operators.blocking import MERSENNE_P, _lcg_pairs


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


def _hyperplane_sig(vec: Column, num_planes: int, dim: int) -> Column:
    """Deterministic random-hyperplane signature: plane p's normal has
    component j = ((a_p * (j+1) + b_p) mod P) / P - 0.5 (a fixed LCG
    stream — portable, seedless at runtime)."""
    sig = F.lit(0).cast("bigint")
    for p, (a, b) in enumerate(_lcg_pairs(num_planes, seed=777)):
        comps = [((a * (j + 1) + b) % MERSENNE_P) / MERSENNE_P - 0.5
                 for j in range(dim)]
        proj = F.aggregate(
            F.zip_with(
                vec,
                F.array(*[F.lit(float(c)) for c in comps]),
                lambda x, w: x.cast("double") * w),
            F.lit(0.0), lambda acc, x: acc + x)
        sig = sig + F.when(proj > 0, F.lit(2 ** p).cast("bigint")
                           ).otherwise(F.lit(0).cast("bigint"))
    return sig


def lsh_knn(queries: DataFrame, corpus: DataFrame, k: int = 10,
            num_planes: int = 12, dim: int | None = None,
            id_col: str = "vec_id", vec_col: str = "embedding"
            ) -> DataFrame:
    """Approximate top-k: random-hyperplane LSH buckets bound the join.

    Vectors landing in the same sign-signature bucket are compared
    exactly; recall grows with fewer planes (bigger buckets).  The scale
    path for billion-vector corpora — the bucket join replaces the cross
    join; everything else matches :func:`brute_force_knn`.
    """
    if dim is None:
        dim = len(corpus.select(vec_col).first()[0])
    q = queries.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).alias("__qv"),
                       _hyperplane_sig(F.col(vec_col), num_planes, dim)
                       .alias("__bkt"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"),
                      F.col(vec_col).alias("__cv"),
                      _hyperplane_sig(F.col(vec_col), num_planes, dim)
                      .alias("__bkt"))
    scored = (
        q.join(c, "__bkt")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("sim", cosine_sim(F.col("__qv"), F.col("__cv")))
        .select("query_id", "neighbor_id", "sim")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("sim"), F.asc("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))


def cosine_near_dup(vectors: DataFrame, threshold: float = 0.95,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    num_planes: int = 8, dim: int | None = None,
                    exact: bool = True) -> DataFrame:
    """Embedding near-duplicate pairs: cosine ≥ threshold.

    ``exact=True`` uses the all-pairs product (small corpora / oracle);
    otherwise LSH buckets bound the candidate set.
    Output: (vec_id_1, vec_id_2, sim).
    """
    a = vectors.select(F.col(id_col).alias("vec_id_1"),
                       F.col(vec_col).alias("__v1"))
    b = vectors.select(F.col(id_col).alias("vec_id_2"),
                       F.col(vec_col).alias("__v2"))
    if exact:
        cand = a.crossJoin(b)
    else:
        if dim is None:
            dim = len(vectors.select(vec_col).first()[0])
        a = a.withColumn("__bkt",
                         _hyperplane_sig(F.col("__v1"), num_planes, dim))
        b = b.withColumn("__bkt",
                         _hyperplane_sig(F.col("__v2"), num_planes, dim))
        cand = a.join(b, "__bkt")
    return (
        cand
        .filter(F.col("vec_id_1") < F.col("vec_id_2"))
        .withColumn("sim", cosine_sim(F.col("__v1"), F.col("__v2")))
        .filter(F.col("sim") >= threshold)
        .select("vec_id_1", "vec_id_2", "sim")
    )
