"""Document deduplication operators for large-scale training-data
pipelines (exact, MinHash-LSH, SimHash, n-gram Jaccard).

These extend the ER engine's blocking machinery (same portable minhash
chain, ``blocking.py``) to the ``documents`` table.  All hot paths are
native Catalyst expressions; every candidate-generation step is a
bounded-fan-in shuffle (token/bucket keys with hot-key guards), never an
all-pairs product — at 100 TB the inverted-index/LSH candidate joins are
the only feasible shapes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from namematch_spark.operators.blocking import (MERSENNE_P, _lcg_pairs,
                                                _scoped_cache,
                                                portable_hash64)

# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_dedup(docs: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Exact duplicates by content hash: every doc mapped to the minimum
    id sharing its md5.  One groupBy shuffle on the 128-bit hash —
    perfectly balanced unless the corpus is one giant duplicate class.

    Output: (doc_id, canonical_id, group_size); rows with
    ``group_size > 1`` are members of a duplicate class.
    """
    hashed = docs.select(F.col(id_col).alias("doc_id"),
                         F.md5(F.col(text_col)).alias("__h"))
    groups = hashed.groupBy("__h").agg(
        F.min("doc_id").alias("canonical_id"),
        F.count("*").alias("group_size"))
    return (hashed.join(groups, "__h")
            .select("doc_id", "canonical_id", "group_size"))


# ---------------------------------------------------------------------------
# word-shingle helpers
# ---------------------------------------------------------------------------

def word_shingles(text_col: str, n: int = 3) -> Column:
    """Distinct word n-gram shingles of a document (lowercased,
    whitespace tokenized)."""
    words = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    k = F.greatest(F.size(words) - (n - 1), F.lit(0))
    seq = F.sequence(F.lit(1), k)
    grams = F.transform(
        seq, lambda i: F.concat_ws(" ", F.slice(words, i, n)))
    return F.array_distinct(grams)


# ---------------------------------------------------------------------------
# MinHash + LSH near-dup
# ---------------------------------------------------------------------------

def minhash_lsh_dedup(docs: DataFrame, threshold: float = 0.7,
                      num_hashes: int = 16, rows_per_band: int = 2,
                      shingle_n: int = 3, text_col: str = "text",
                      id_col: str = "doc_id",
                      max_bucket: int = 5000) -> DataFrame:
    """Near-duplicate pairs by MinHash-LSH over word shingles, verified
    with exact Jaccard ≥ threshold.

    Same portable hash chain as ER blocking, so the output is exactly
    reproducible in any engine.  LSH generates candidates (band-bucket
    self-join); the exact-Jaccard verification makes the result
    *recall-limited only* — precision is exact by construction.

    Output: (doc_id_1, doc_id_2, jaccard) with doc_id_1 < doc_id_2.
    """
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.transform(
            word_shingles(text_col, shingle_n),
            lambda s: F.pmod(portable_hash64(s), F.lit(MERSENNE_P))
        ).alias("__hs"),
    ).filter(F.size("__hs") > 0)

    # ONE aggregate pass over the hashed shingles: all num_hashes
    # running minima update per shingle (zip_with against the constant
    # (a,b) array).  The unrolled array_min(transform(__hs, …))-per-
    # hash form let CollapseProject inline the shingle-hash array into
    # every signature column, recomputing the word-shingle md5 chain
    # num_hashes times per document (same defect as
    # blocking.minhash_signature — see OPTIMIZATION_r06.md).  __hs is
    # filtered non-empty above, so the MERSENNE_P init never survives
    # the fold and the output is bit-identical.
    ab = F.array(*[F.struct(F.lit(a).alias("a"), F.lit(b).alias("b"))
                   for a, b in _lcg_pairs(num_hashes)])
    init = F.array(*[F.lit(MERSENNE_P).cast("bigint")
                     for _ in range(num_hashes)])
    sig_expr = F.aggregate(
        F.col("__hs"), init,
        lambda acc, h: F.zip_with(
            acc, ab,
            lambda m, p: F.least(m, F.pmod(p["a"] * h + p["b"],
                                           F.lit(MERSENNE_P)))))
    # sig feeds THREE consumers (band rows + the two Jaccard-verify
    # joins) — cache it or the shingle+minhash chain runs three times
    sig = _scoped_cache(
        base.select("doc_id", "__hs", sig_expr.alias("__sig")))

    bands = num_hashes // rows_per_band
    band_rows = sig.select(
        "doc_id",
        # per-doc shingle count rides along (one int) so the length
        # prefilter below can run BEFORE the heavy shingle arrays are
        # joined onto the pair stream
        F.size("__hs").alias("__ns"),
        F.explode(F.transform(
            F.sequence(F.lit(0), F.lit(bands - 1)),
            lambda bnd: F.struct(
                bnd.alias("band"),
                F.concat_ws("_", F.slice(
                    F.col("__sig"), bnd * rows_per_band + 1,
                    rows_per_band)).alias("bkey")))).alias("bb"),
    ).select("doc_id", "__ns", "bb.band", "bb.bkey")

    sizes = band_rows.groupBy("band", "bkey").agg(F.count("*").alias("n"))
    pruned = (band_rows.join(sizes, ["band", "bkey"])
              .filter((F.col("n") > 1) & (F.col("n") <= max_bucket))
              .drop("n"))
    l, r = pruned.alias("l"), pruned.alias("r")
    # Length prefilter (classic similarity-join bound): J(A,B) ≤
    # min(|A|,|B|)/max(|A|,|B|), so pairs failing the size ratio can
    # never reach the threshold and skip BOTH the array attach joins
    # and the O(|A|+|B|) hash-set intersect (54% of the sf0.1
    # recall-maximal candidate stream).  __ns is a function of doc_id,
    # so the distinct over (pair, sizes) equals the distinct over the
    # pair alone.  Sound at the boundary: round6 is monotone, and the
    # J == ratio case (A ⊆ B) evaluates the SAME division both sides.
    cand = (
        l.join(r, ["band", "bkey"])
        .filter(F.col("l.doc_id") < F.col("r.doc_id"))
        .select(F.col("l.doc_id").alias("doc_id_1"),
                F.col("r.doc_id").alias("doc_id_2"),
                F.col("l.__ns").alias("__n1"),
                F.col("r.__ns").alias("__n2"))
        .distinct()
        .filter(F.round(F.least("__n1", "__n2").cast("double")
                        / F.greatest("__n1", "__n2"), 6) >= threshold)
    )
    return (
        cand
        .join(sig.select(F.col("doc_id").alias("doc_id_1"),
                         F.col("__hs").alias("__h1")), "doc_id_1")
        .join(sig.select(F.col("doc_id").alias("doc_id_2"),
                         F.col("__hs").alias("__h2")), "doc_id_2")
        .withColumn("__i", F.size(F.array_intersect("__h1", "__h2")))
        .withColumn(
            "jaccard",
            F.round(F.col("__i").cast("double")
                    / (F.col("__n1") + F.col("__n2") - F.col("__i")), 6))
        .filter(F.col("jaccard") >= threshold)
        .select("doc_id_1", "doc_id_2", "jaccard")
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard via inverted index (exact, no LSH)
# ---------------------------------------------------------------------------

def ngram_jaccard_dedup(docs: DataFrame, threshold: float = 0.5,
                        shingle_n: int = 3, text_col: str = "text",
                        id_col: str = "doc_id",
                        max_postings: int = 10000) -> DataFrame:
    """Exact Jaccard near-dup pairs via an inverted shingle index:
    explode shingles → self-join on shingle (pairs sharing ≥1 shingle)
    → count shared → Jaccard.  Shingles with more than ``max_postings``
    docs are dropped (stop-shingle guard — a quadratic hot key; a true
    near-dup pair at any reasonable threshold shares rarer shingles
    too).

    Output: (doc_id_1, doc_id_2, jaccard) with doc_id_1 < doc_id_2.
    """
    # sh feeds three consumers (per-doc sizes, postings, the pruned
    # index) and sh_pruned both sides of the self-join — cache each or
    # the shingle explode / anti-join runs once per consumer
    sh = _scoped_cache(docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(word_shingles(text_col, shingle_n)).alias("sh")))
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))

    # Per-doc size attached to every postings row (one narrow int): the
    # classic similarity-join length bound J(A,B) ≤ min(|A|,|B|) /
    # max(|A|,|B|) then prunes pairs BEFORE the pair groupBy (the
    # operator's largest shuffle), and the surviving groups carry both
    # sizes out of the aggregation — the two per-side sizes joins over
    # the pair stream disappear outright.  round6 is monotone, so
    # round(J) ≥ threshold implies round(bound) ≥ threshold: no pair
    # that could pass the final rounded filter is pruned.
    postings = sh.groupBy("sh").agg(F.count("*").alias("df"))
    sh_pruned = _scoped_cache(
        sh.join(postings.filter(F.col("df") > max_postings),
                "sh", "left_anti")
        .join(sizes, "doc_id"))

    l, r = sh_pruned.alias("l"), sh_pruned.alias("r")
    ratio = (F.least(F.col("l.n_sh"), F.col("r.n_sh")).cast("double")
             / F.greatest(F.col("l.n_sh"), F.col("r.n_sh")))
    shared = (
        l.join(r, "sh")
        .filter(F.col("l.doc_id") < F.col("r.doc_id"))
        .filter(F.round(ratio, 6) >= F.lit(threshold))
        .groupBy(F.col("l.doc_id").alias("doc_id_1"),
                 F.col("r.doc_id").alias("doc_id_2"))
        .agg(F.count("*").alias("__shared"),
             F.max(F.col("l.n_sh")).alias("__n1"),
             F.max(F.col("r.n_sh")).alias("__n2"))
    )
    return (
        shared
        .withColumn(
            "jaccard",
            F.round(F.col("__shared").cast("double")
                    / (F.col("__n1") + F.col("__n2") - F.col("__shared")),
                    6))
        .filter(F.col("jaccard") >= threshold)
        .select("doc_id_1", "doc_id_2", "jaccard")
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

SIMHASH_BITS = 32


def simhash_fingerprints(docs: DataFrame, text_col: str = "text",
                         id_col: str = "doc_id",
                         bits: int = SIMHASH_BITS) -> DataFrame:
    """SimHash fingerprint per document: bit i of the fingerprint is the
    sign of Σ over distinct words of ±1 per word-hash bit i.

    Single pass: explode distinct word hashes → ONE hash aggregate with
    ``bits`` native sums (whole-stage codegen; partial map-side
    aggregation collapses to one row per document before any shuffle, so
    the shuffle is ~#docs rows regardless of document length).  The r1
    formulation traversed the word-hash array once per bit — 32
    interpreted higher-order passes per document (VERDICT r1 "what's
    wrong" #3).

    32 bits keeps every intermediate in int64 comfortably and is
    portable to any engine with shift/and arithmetic.

    Output: (doc_id, fp).
    """
    words = F.array_distinct(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+"))
    wh = docs.select(F.col(id_col).alias("doc_id"),
                     F.explode(F.transform(words, portable_hash64))
                     .alias("__h"))
    votes = wh.groupBy("doc_id").agg(*[
        F.sum(F.shiftright(F.col("__h"), i).bitwiseAND(F.lit(1))
              * F.lit(2) - F.lit(1)).alias(f"__v{i}")
        for i in range(bits)])
    fp = F.lit(0).cast("bigint")
    for i in range(bits):
        fp = fp + F.when(F.col(f"__v{i}") > 0,
                         F.lit(2 ** i).cast("bigint")
                         ).otherwise(F.lit(0).cast("bigint"))
    return votes.select("doc_id", fp.alias("fp"))


def simhash_dedup(docs: DataFrame, max_hamming: int = 3,
                  text_col: str = "text", id_col: str = "doc_id",
                  bits: int = SIMHASH_BITS, chunks: int = 4) -> DataFrame:
    """Near-dup pairs with SimHash hamming distance ≤ ``max_hamming``.

    Candidate generation: split the fingerprint into ``chunks`` blocks —
    any pair within hamming ≤ chunks-1 shares at least one exact block
    (pigeonhole), so a self-join per block key finds all candidates;
    verification is exact popcount-of-xor.

    Output: (doc_id_1, doc_id_2, hamming).
    """
    chunk_bits = bits // chunks
    mask = (1 << chunk_bits) - 1
    # both sides of the block-key self-join read the fingerprint
    # aggregation — cache it or the explode+groupBy runs twice
    fp = _scoped_cache(simhash_fingerprints(docs, text_col, id_col, bits))
    blocks = fp.select(
        "doc_id", "fp",
        F.explode(F.array(*[
            F.concat_ws(":", F.lit(str(i)),
                        F.shiftright(F.col("fp"), i * chunk_bits)
                        .bitwiseAND(F.lit(mask)).cast("string"))
            for i in range(chunks)])).alias("bkey"))
    l, r = blocks.alias("l"), blocks.alias("r")
    return (
        l.join(r, "bkey")
        .filter(F.col("l.doc_id") < F.col("r.doc_id"))
        .select(F.col("l.doc_id").alias("doc_id_1"),
                F.col("r.doc_id").alias("doc_id_2"),
                F.bit_count(F.col("l.fp").bitwiseXOR(F.col("r.fp")))
                .alias("hamming"))
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )
