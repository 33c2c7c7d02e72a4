"""Best-of-N attribution probe for the er_clusters headline query
(VERDICT r4 #1): run the full pipeline at the bench configuration,
print per-stage wall times each attempt.

Usage: python tools/profile_er_clusters.py [attempts] [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

ATTEMPTS = int(sys.argv[1]) if len(sys.argv) > 1 else 3
SF_DIR = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    # attribution math lives in bench.er_clusters_attributed — one
    # source of truth for the bench headline and this probe
    from bench import er_clusters_attributed, make_spark

    results = []
    for i in range(ATTEMPTS):
        spark = make_spark(CPUS)
        n, dt, stages = er_clusters_attributed(spark, SF_DIR)
        dt = round(dt, 2)
        print(json.dumps({"attempt": i, "rows": n, "total_sec": dt,
                          "stages": stages}), flush=True)
        results.append((dt, stages))
        spark.stop()
    # key= — bare min() would compare the stages dicts on a wall-time
    # tie and raise TypeError at the very end of a long run
    best = min(results, key=lambda r: r[0])
    print(json.dumps({"best_total_sec": best[0], "best_stages": best[1]}),
          flush=True)


if __name__ == "__main__":
    main()
