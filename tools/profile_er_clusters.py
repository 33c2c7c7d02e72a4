"""Best-of-N attribution probe for the er_clusters headline query
(VERDICT r4 #1): run the full pipeline at the bench configuration,
print per-stage wall times each attempt.

Usage: python tools/profile_er_clusters.py [attempts] [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

ATTEMPTS = int(sys.argv[1]) if len(sys.argv) > 1 else 3
SF_DIR = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    from bench import make_spark
    from namematch_spark.pipeline import run_pipeline
    from namematch_spark.sources.records import person_records

    results = []
    for i in range(ATTEMPTS):
        spark = make_spark(CPUS)
        t0 = time.time()
        res = run_pipeline(person_records(spark, SF_DIR))
        n = res.clusters.count()
        dt = round(time.time() - t0, 2)
        stages = dict(res.metrics["stage_seconds"])
        stages["count_action"] = round(dt - sum(stages.values()), 2)
        print(json.dumps({"attempt": i, "rows": n, "total_sec": dt,
                          "stages": stages}), flush=True)
        results.append((dt, stages))
        spark.stop()
    best = min(results)
    print(json.dumps({"best_total_sec": best[0], "best_stages": best[1]}),
          flush=True)


if __name__ == "__main__":
    main()
