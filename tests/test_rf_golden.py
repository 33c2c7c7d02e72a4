"""RF-path value anchor (VERDICT r3 missing #1).

``er_potential_links`` is rows-only in the driver contract because the
MLlib RF's fine-grained scores are not run-to-run deterministic (row
order within shuffled partitions feeds the per-tree subsampling draws).
This golden pins the score DISTRIBUTION instead: a committed 2-decimal
phat histogram (``tests/fixtures/phat_hist_sf001.csv``, sf0.01, seed
42) plus invariants that were measured identical across independent
runs — so silent MLlib behavior drift (score saturation change,
inverted probabilities, routing breakage) fails this test while benign
subsampling wobble in the near-zero buckets does not.

Reference flow being anchored: ``predict.py:88-141`` (score) +
``fit_model.py:399-404`` (train) on the same candidate universe.
"""
from __future__ import annotations

import csv
import os

import pytest
from pyspark.sql import functions as F

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                       "phat_hist_sf001.csv")
SF_001 = "/root/testdata/sf0.01"


def _golden():
    rows = list(csv.DictReader(open(FIXTURE)))
    return [(float(r["phat_bucket"]), r["label"], int(r["n"]))
            for r in rows]


@pytest.fixture(scope="module")
def scored_sf001(spark):
    from namematch_spark.operators import blocking as B
    from namematch_spark.operators.model import (score_with_model_set,
                                                 train_model_set)
    from namematch_spark.operators.pairs import (expand_bs_to_record_pairs,
                                                 pair_features)
    from namematch_spark.operators.preprocess import preprocess
    from namematch_spark.sources.records import person_records

    an = preprocess(person_records(spark, SF_001)).cache()
    rp = expand_bs_to_record_pairs(
        B.candidate_blockstring_pairs(an), an).cache()
    # X16: populate the data-rows cache EAGERLY — train_model_set fits
    # the two match models on CONCURRENT threads, and each fit against a
    # cold dr cache recomputes the whole sf0.01 blocking+feature lineage
    # itself (no cross-job computation lock); measured ~2x on this
    # fixture's setup.  rp is consumed 3x inside the feature plan (base
    # + two metric dims), so count it first, in dependency order.
    rp.count()
    dr = pair_features(rp, leven_thresh=1).cache()
    dr.count()
    ms = train_model_set(dr)
    scored = score_with_model_set(ms, dr).cache()
    yield scored, ms
    for d in (an, rp, dr, scored):
        d.unpersist()
    B.release_caches()


def test_phat_histogram_golden(scored_sf001):
    scored, ms = scored_sf001
    gold = _golden()
    g_total = sum(n for _, _, n in gold)
    g_high = sum(n for b, _, n in gold if b >= 0.9)
    g_high_pos = sum(n for b, l, n in gold if b >= 0.9 and l == "1")
    g_pos = sum(n for _, l, n in gold if l == "1")
    g_neg = sum(n for _, l, n in gold if l == "0")
    g_neg_low = sum(n for b, l, n in gold if l == "0" and b < 0.5)

    hist = (scored.groupBy(F.round("phat", 2).alias("pb"), "label")
            .agg(F.count("*").alias("n")).collect())
    total = sum(r["n"] for r in hist)
    high = sum(r["n"] for r in hist if r["pb"] >= 0.9)
    high_pos = sum(r["n"] for r in hist
                   if r["pb"] >= 0.9 and r["label"] == "1")
    neg = sum(r["n"] for r in hist if r["label"] == "0")
    neg_low = sum(r["n"] for r in hist
                  if r["label"] == "0" and r["pb"] < 0.5)

    # the candidate universe upstream of the RF is fully deterministic
    assert total == g_total
    # score-mass invariants, measured identical across independent
    # runs; 0.5% tolerance absorbs subsampling wobble at the margin
    assert abs(high - g_high) <= max(5, int(0.005 * g_high))
    # every labeled-1 pair saturates high — exact across runs
    assert high_pos == g_high_pos == g_pos
    # labeled-0 pairs: same count, and (like the golden) almost all of
    # their mass sits below 0.5
    assert neg == g_neg
    assert neg_low >= int(0.9 * g_neg_low)
    # the swept threshold lands in the saturated region
    assert 0.9 <= ms.basic.threshold <= 1.0


def test_potential_links_match_golden_threshold(scored_sf001):
    from namematch_spark.operators.model import potential_links_model_set
    scored, ms = scored_sf001
    pl = potential_links_model_set(scored, ms)
    n = pl.count()
    gold = _golden()
    # at any threshold in the [0.9, 1.0] sweep region the pass set is
    # the saturated mass plus the gt override of low-scoring labeled-1s
    g_high = sum(x for b, _, x in gold if b >= 0.9)
    assert abs(n - g_high) <= max(10, int(0.005 * g_high))
