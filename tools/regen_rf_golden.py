"""Regenerate the RF phat-histogram golden
(``tests/fixtures/phat_hist_sf001.csv``) — the committed 2-decimal
(phat_bucket, label, n) histogram that anchors the MLlib RF score
DISTRIBUTION (see ``tests/test_rf_golden.py``).

The universe is the FULL sf0.01 derivation — the same construction the
test fixture uses.  (A 1/2 record subsample was tried for suite wall
time and rejected: it leaves only 23 labeled-0 pairs, the RF saturates
every score >= 0.9, and the histogram stops anchoring the labeled-0
low-mass invariant.)  Invariants are re-verified at regeneration time
by running TWICE in independent sessions:

- total / labeled-pair counts are exact across runs (candidate
  universe upstream of the RF is fully deterministic),
- every labeled-1 pair saturates >= 0.9 in both runs,
- labeled-0 mass sits below 0.5 in both runs.

Usage: python tools/regen_rf_golden.py [out.csv]
Prints the cross-run invariant comparison; writes the FIRST run's
histogram (seed 42, the fixture convention).
"""

from __future__ import annotations

import csv
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

OUT = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "fixtures", "phat_hist_sf001.csv")
SF_001 = "/root/testdata/sf0.01"


def _one_run(run_idx: int):
    from pyspark.sql import functions as F

    from namematch_spark.operators import blocking as B
    from namematch_spark.operators.model import (score_with_model_set,
                                                 train_model_set)
    from namematch_spark.operators.pairs import (expand_bs_to_record_pairs,
                                                 pair_features)
    from namematch_spark.operators.preprocess import preprocess
    from namematch_spark.session import get_spark, stop_spark
    from namematch_spark.sources.records import person_records

    stop_spark()
    spark = get_spark(app_name=f"regen-rf-golden-{run_idx}",
                      master="local[8]",
                      conf={"spark.sql.shuffle.partitions": "8"})
    spark.sparkContext.setLogLevel("ERROR")
    an = preprocess(person_records(spark, SF_001)).cache()
    rp = expand_bs_to_record_pairs(
        B.candidate_blockstring_pairs(an), an).cache()
    dr = pair_features(rp, leven_thresh=1).cache()
    ms = train_model_set(dr)
    scored = score_with_model_set(ms, dr)
    hist = sorted(
        ((float(r["pb"]), r["label"] or "", int(r["n"]))
         for r in scored.groupBy(F.round("phat", 2).alias("pb"), "label")
         .agg(F.count("*").alias("n")).collect()))
    B.release_caches()
    stop_spark()
    return hist


def _invariants(hist):
    return {
        "total": sum(n for _, _, n in hist),
        "high": sum(n for b, _, n in hist if b >= 0.9),
        "high_pos": sum(n for b, l, n in hist if b >= 0.9 and l == "1"),
        "pos": sum(n for _, l, n in hist if l == "1"),
        "neg": sum(n for _, l, n in hist if l == "0"),
        "neg_low": sum(n for b, l, n in hist if l == "0" and b < 0.5),
    }


def main() -> None:
    a = _one_run(0)
    b = _one_run(1)
    ia, ib = _invariants(a), _invariants(b)
    print("run A:", ia)
    print("run B:", ib)
    exact = ["total", "pos", "neg"]
    for k in exact:
        assert ia[k] == ib[k], f"{k} differs across runs: {ia[k]} {ib[k]}"
    assert ia["high_pos"] == ia["pos"] and ib["high_pos"] == ib["pos"], \
        "labeled-1 saturation broken — do NOT regenerate, investigate"
    dh = abs(ia["high"] - ib["high"])
    print(f"cross-run |high| drift: {dh} "
          f"({dh / max(ia['high'], 1):.4%}; test tolerance 0.5%)")
    assert dh <= max(5, int(0.005 * ia["high"]))
    assert ia["neg_low"] >= int(0.9 * ib["neg_low"])
    with open(OUT, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["phat_bucket", "label", "n"])
        for pb, label, n in a:
            w.writerow([pb, label, n])
    print(f"wrote {OUT} ({len(a)} rows) from run A")


if __name__ == "__main__":
    main()
