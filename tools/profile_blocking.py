"""Sub-step attribution for the blocking candidates stage (guide §1:
measure before changing).  Times each intermediate of
``candidate_blockstring_pairs`` + ``add_uncovered_pairs`` in isolation
with noop sinks (§1.4) at the bench configuration.

Usage: python tools/profile_blocking.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    from bench import make_spark
    from pyspark.sql import functions as F

    from namematch_spark.operators import blocking as B
    from namematch_spark.operators.mustlinks import must_links
    from namematch_spark.operators.preprocess import preprocess
    from namematch_spark.sources.records import person_records

    spark = make_spark(CPUS)

    def t(name, fn):
        spark.sparkContext.setJobDescription(f"prof:{name}")
        t0 = time.time()
        out = fn()
        dt = time.time() - t0
        print(f"{name:35s} {dt:7.2f}s   {out}", flush=True)
        spark.sparkContext.setJobDescription(None)
        return dt

    def noop(df):
        df.write.format("noop").mode("overwrite").save()
        return "(noop)"

    t0_all = time.time()
    an = preprocess(person_records(spark, SF_DIR)) \
        .localCheckpoint(eager=True)
    print(f"all_names materialized in {time.time() - t0_all:.1f}s",
          flush=True)

    # -- individual sub-steps, each from the checkpointed all_names
    nn = B.nn_strings(an)
    t("nn_strings", lambda: nn.count())
    nn_c = B._scoped_cache(B.nn_strings(an))
    vec = B.weighted_shingle_vectors(nn_c)
    t("weighted_shingle_vectors", lambda: noop(vec))
    vec_c = B._scoped_cache(B.weighted_shingle_vectors(nn_c))
    variants = B.name_variants(nn_c)
    t("name_variants", lambda: variants.count())
    var_c = B._scoped_cache(B.name_variants(nn_c))
    vn = var_c.select("nn_string").distinct()
    t("lsh_band_rows", lambda: noop(
        B.lsh_band_rows(vn, num_hashes=24, rows_per_band=6)))
    lsh = B.lsh_candidates(vn, num_hashes=24, rows_per_band=6,
                           variants=var_c, dedup=False)
    t("lsh_candidates(dedup=False)", lambda: lsh.count())
    det = B.det_candidates(vn, variants=var_c)
    t("det_candidates", lambda: det.count())
    cands = (lsh.withColumn("det_block", F.lit(0))
             .unionByName(det)
             .groupBy("nn_string_1", "nn_string_2")
             .agg(F.max("det_block").alias("det_block")))
    t("union+groupBy(canon pairs)", lambda: cands.count())
    cands_c = cands.cache()
    cands_c.count()
    scored = B.cosine_verify(cands_c, vec_c, broadcast=False)
    t("cosine_verify(over cached)", lambda: noop(scored))
    t("penalty(commonness)", lambda: B.commonness_penalty(an).count())
    B.release_caches()
    cands_c.unpersist()

    # -- full paths (cold, as the pipeline runs them)
    t("FULL candidate_blockstring_pairs",
      lambda: noop(B.candidate_blockstring_pairs(an)))
    B.release_caches()
    ml = must_links(an)
    t("FULL cand + add_uncovered",
      lambda: noop(B.add_uncovered_pairs(
          B.candidate_blockstring_pairs(an), ml, an)))
    B.release_caches()
    spark.stop()


if __name__ == "__main__":
    main()
