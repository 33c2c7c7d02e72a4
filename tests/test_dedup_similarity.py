"""Dedup + similarity operator semantics on hand-made corpora."""

from __future__ import annotations

import pyspark.sql.functions as F

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the quick brown fox jumps over the lazy dog"),      # exact dup of 1
    (3, "the quick brown fox leaps over the lazy dog"),      # near dup
    (4, "completely different content about spark engines"),
    (5, "spark engines process completely different content"),
]
SCHEMA = "doc_id long, text string"


def _docs(spark):
    return spark.createDataFrame(DOCS, SCHEMA)


def test_exact_dedup(spark):
    from namematch_spark.operators.dedup import exact_dedup
    res = {r["doc_id"]: (r["canonical_id"], r["group_size"])
           for r in exact_dedup(_docs(spark)).collect()}
    assert res[1] == (1, 2) and res[2] == (1, 2)
    assert res[3][1] == 1 and res[4][1] == 1


def test_minhash_lsh_finds_near_dup(spark):
    from namematch_spark.operators.dedup import minhash_lsh_dedup
    pairs = {(r["doc_id_1"], r["doc_id_2"]): r["jaccard"]
             for r in minhash_lsh_dedup(
                 _docs(spark), threshold=0.35, num_hashes=16,
                 rows_per_band=1).collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] == 1.0
    # one word changed: 4 shared of 7+7 3-gram shingles -> 4/10
    assert (1, 3) in pairs and abs(pairs[(1, 3)] - 0.4) < 1e-9
    assert (4, 5) not in pairs  # word order destroys 3-gram shingles


def test_ngram_jaccard_matches_minhash_verify(spark):
    from namematch_spark.operators.dedup import (minhash_lsh_dedup,
                                                 ngram_jaccard_dedup)
    a = {(r["doc_id_1"], r["doc_id_2"]): r["jaccard"]
         for r in ngram_jaccard_dedup(_docs(spark), threshold=0.35).collect()}
    b = {(r["doc_id_1"], r["doc_id_2"]): r["jaccard"]
         for r in minhash_lsh_dedup(_docs(spark), threshold=0.35,
                                    rows_per_band=1).collect()}
    # doc2 duplicates doc1, so (2,3) mirrors (1,3)
    assert set(a) == set(b) == {(1, 2), (1, 3), (2, 3)}
    assert a == b


def test_simhash_hamming(spark):
    from namematch_spark.operators.dedup import simhash_dedup
    pairs = {(r["doc_id_1"], r["doc_id_2"]): r["hamming"]
             for r in simhash_dedup(_docs(spark), max_hamming=3).collect()}
    assert pairs.get((1, 2)) == 0           # identical docs
    assert (1, 4) not in pairs


def test_knn_and_lsh_recall(spark):
    import numpy as np
    from namematch_spark.operators.similarity import (brute_force_knn,
                                                      lsh_knn)
    rng = np.random.RandomState(0)
    base = rng.randn(40, 8).astype("float32")
    base[1] = base[0] + 0.01 * rng.randn(8).astype("float32")  # near 0
    rows = [(i, [float(x) for x in base[i]]) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    exact = brute_force_knn(df, df, k=1).collect()
    nn = {r["query_id"]: r["neighbor_id"] for r in exact}
    assert nn[0] == 1 and nn[1] == 0
    # LSH with few planes must at least recover the planted pair
    approx = {r["query_id"]: r["neighbor_id"]
              for r in lsh_knn(df, df, dim=8, k=1, num_planes=6,
                               num_tables=4).collect()}
    assert approx.get(0) == 1


def test_lsh_near_dup_recall_gate(spark):
    # measured-recall gate for the scale path (VERDICT r1 next #5):
    # planted near-duplicates (cos >= ~0.95), multi-table LSH must
    # recover >= 90% of what the exact cross join finds at t=0.9
    import numpy as np
    from namematch_spark.operators.similarity import cosine_near_dup
    rng = np.random.RandomState(7)
    base = rng.randn(80, 16).astype("float32")
    dups = base[:40] + 0.05 * rng.randn(40, 16).astype("float32")
    vecs = np.vstack([base, dups])
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(len(vecs))]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    exact = {(r["vec_id_1"], r["vec_id_2"])
             for r in cosine_near_dup(df, threshold=0.9,
                                      exact=True).collect()}
    lsh = {(r["vec_id_1"], r["vec_id_2"])
           for r in cosine_near_dup(df, threshold=0.9, num_planes=8,
                                    num_tables=4, dim=16).collect()}
    assert exact, "fixture must contain true near-dups"
    assert lsh <= exact                      # precision exact by verify
    recall = len(lsh & exact) / len(exact)
    assert recall >= 0.9, (recall, len(exact))


def test_lsh_hot_bucket_guards(spark):
    # dense-region guards (VERDICT r4 #4): a deliberately dense cluster
    # of near-identical vectors lands in one LSH bucket per table.
    # (a) salting (bucket > salt_threshold) must NOT change results;
    # (b) max_bucket must route the dense bucket out AND report it.
    import numpy as np
    from namematch_spark.operators.similarity import (cosine_near_dup,
                                                      lsh_knn)
    rng = np.random.RandomState(3)
    center = rng.randn(8).astype("float32")
    dense = center + 0.01 * rng.randn(60, 8).astype("float32")
    sparse = rng.randn(20, 8).astype("float32")
    vecs = np.vstack([dense, sparse])
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(len(vecs))]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    kw = dict(threshold=0.99, num_planes=4, num_tables=2, dim=8)
    plain = {(r["vec_id_1"], r["vec_id_2"])
             for r in cosine_near_dup(df, salt_threshold=10_000,
                                      **kw).collect()}
    salted = {(r["vec_id_1"], r["vec_id_2"])
              for r in cosine_near_dup(df, salt_threshold=8,
                                       **kw).collect()}
    assert plain and salted == plain       # salt is result-invariant

    metrics: dict = {}
    capped = cosine_near_dup(df, max_bucket=30, metrics=metrics,
                             **kw).collect()
    assert metrics["cosine_near_dup_dropped_buckets"] > 0
    assert metrics["cosine_near_dup_dropped_rows"] >= 60
    # the 60-vector dense bucket exceeded the cap in every table ->
    # its pairs are gone; the guard fired non-silently
    assert len(capped) < len(plain)

    knn_metrics: dict = {}
    plain_knn = {(r["query_id"], r["rank"]): r["neighbor_id"]
                 for r in lsh_knn(df, df, dim=8, k=1, num_planes=4,
                                  num_tables=2,
                                  salt_threshold=10_000).collect()}
    salted_knn = {(r["query_id"], r["rank"]): r["neighbor_id"]
                  for r in lsh_knn(df, df, dim=8, k=1, num_planes=4,
                                   num_tables=2, salt_threshold=8,
                                   metrics=knn_metrics).collect()}
    assert salted_knn == plain_knn
    assert knn_metrics["lsh_knn_dropped_buckets"] == 0


def test_text_profile(spark):
    from namematch_spark.operators.textstats import text_profile
    docs = spark.createDataFrame(
        [(1, "the cat and the dog went to the market in the morning"),
         (2, "der hund ist nicht mit der katze auf das feld"),
         (3, "xyzzy plugh")],
        SCHEMA)
    res = {r["doc_id"]: r for r in text_profile(docs).collect()}
    assert res[1]["pred_lang"] == "en"
    assert res[2]["pred_lang"] == "de"
    assert res[3]["pred_lang"] == "und"
    assert res[1]["n_tokens"] == 12
    assert res[1]["fingerprint"] >= 0


def test_multimodal_stub_plumbing(spark):
    from namematch_spark.operators.multimodal import (
        docs_as_media, extract_media_features, frame_sample_plan)
    media = docs_as_media(_docs(spark))
    feats = {r["media_id"]: r for r in
             extract_media_features(media).collect()}
    assert len(feats) == 5
    r = feats["1"]
    assert r["decode_ok"] and len(r["feat"]) == 16
    assert r["n_bytes"] == len(DOCS[0][1].encode())
    import hashlib
    assert r["sha256"] == hashlib.sha256(DOCS[0][1].encode()).hexdigest()
    # identical payloads -> identical stub features (determinism)
    assert feats["1"]["feat"] == feats["2"]["feat"]
    # unsupported mime degrades, not fails
    bad = media.withColumn("mime", F.lit("application/pdf"))
    res = extract_media_features(bad).collect()
    assert all(not r["decode_ok"] for r in res)
    # frame sampling plan explodes per frame
    vid = media.withColumn("meta_duration_ms", F.lit(3500))
    plan = frame_sample_plan(vid, every_ms=1000)
    assert plan.filter(F.col("media_id") == "1").count() == 3
