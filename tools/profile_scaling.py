"""Phase-level profile of the scaling bench job.

Runs the blocking+scoring job at a given core count with the input
replication from bench.py, but split into materialized phases so the
wall time of each phase can be compared across parallelism levels —
phases whose time does not shrink with cores ARE the serial term of
the Amdahl fit.  Also times driver-side plan building (analysis +
optimization + physical planning, no execution) per phase.

Usage:  python tools/profile_scaling.py CORES OUTFILE [COPIES]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import bench  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def plan_time(df) -> float:
    t0 = time.time()
    df._jdf.queryExecution().executedPlan()
    return time.time() - t0


def run(spark, copies: int, sf_dir: str, phases: dict) -> int:
    from pyspark.sql import functions as F

    from namematch_spark.operators import blocking as B
    from namematch_spark.operators.pairs import (expand_bs_to_record_pairs,
                                                 pair_features)
    from namematch_spark.operators.preprocess import preprocess

    def mark(name, fn):
        t0 = time.time()
        out = fn()
        t1 = time.time()
        phases[name] = phases.get(name, 0.0) + t1 - t0
        phases.setdefault("__spans", []).append(
            {"phase": name, "t0": t0, "t1": t1})
        return out

    records = bench.scaled_person_records(spark, sf_dir, copies)
    an = preprocess(records).cache()
    phases["plan_an"] = plan_time(an)
    mark("exec_an", lambda: an.count())

    cand = B.candidate_blockstring_pairs(an).cache()
    phases["plan_cand"] = plan_time(cand)
    mark("exec_cand", lambda: cand.count())

    rp = expand_bs_to_record_pairs(cand, an).cache()
    phases["plan_rp"] = plan_time(rp)
    mark("exec_rp", lambda: rp.count())

    dr = pair_features(rp, leven_thresh=1)
    phases["plan_dr"] = plan_time(dr)
    n = mark("exec_dr", lambda: dr.agg(
        F.count("*").alias("n"),
        F.sum(F.pmod(F.xxhash64(*dr.columns),
                     F.lit(1_000_000_007))).alias("h"))
        .collect()[0]["n"])

    for d in (an, cand, rp):
        d.unpersist()
    B.release_caches()
    return n


def main():
    cores = int(sys.argv[1])
    outfile = sys.argv[2]
    copies = int(sys.argv[3]) if len(sys.argv) > 3 else bench.SCALE_COPIES
    phases: dict = {}
    # event logs on: per-stage wall/task metrics for serial-term hunting
    evdir = f"/tmp/spark-events-{cores}"
    os.makedirs(evdir, exist_ok=True)
    import namematch_spark.session as S
    orig = S.get_spark

    def get_spark_ev(**kw):
        kw.setdefault("conf", {})
        kw["conf"]["spark.eventLog.enabled"] = "true"
        kw["conf"]["spark.eventLog.dir"] = f"file:{evdir}"
        return orig(**kw)
    S.get_spark = get_spark_ev
    spark = bench.make_spark(cores, aqe=False,
                             partitions=bench.SCALE_PARTITIONS,
                             machine_cores=cores)
    S.get_spark = orig
    t0 = time.time()
    # warmup pass (codegen/JIT) at sf0.001, same plan shape, same JVM
    warm: dict = {}
    run(spark, copies, "/root/testdata/sf0.001", warm)
    warm_t = time.time() - t0
    t0 = time.time()
    n = run(spark, copies, SF_DIR, phases)
    total = time.time() - t0
    spark.stop()
    def _r(d: dict) -> dict:
        return {k: (round(v, 2) if isinstance(v, float) else v)
                for k, v in d.items()}
    out = {"cores": cores, "copies": copies, "pairs": n,
           "total_sec": round(total, 1),
           "warmup_sec": round(warm_t, 1),
           "phases": _r(phases), "warm_phases": _r(warm)}
    with open(outfile, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
