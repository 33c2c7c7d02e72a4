"""Round-6 measurement harness (guide §1: measure first; §1.4: noop
sink isolation).  ``bench.py`` is FROZEN for the driver's measurement —
this file carries the optimization round's extra instrumentation:

- per-query wall time at the bench configuration (same count() action
  the bench uses, so numbers are directly comparable), best-of-N;
- optional noop-sink timing (computes EVERY column, guide §1.4) to
  separate computation cost from what count() lets Catalyst prune;
- ``explain("formatted")`` capture into ``plans/r06/<q>_{tag}.txt``;
- per-stage attribution for er_clusters via bench.er_clusters_attributed.

Usage:
    python bench_extra.py [--plans TAG] [--noop] [--attempts N] [q ...]

With no query names: the full headline list.  Respects
$SPARK_GRAFT_SF_DIR / $SPARK_GRAFT_CPUS like the bench.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

HEADLINE = ["er_clusters", "doc_minhash_lsh", "doc_minhash_lsh_banded",
            "doc_ngram_jaccard", "doc_simhash", "doc_profile",
            "doc_dedup_exact", "emb_knn_lsh", "agg_pricing_summary",
            "win_top_orders", "join_nation_revenue", "events_hourly"]


def main() -> None:
    args = sys.argv[1:]
    plans_tag = None
    noop = False
    attempts = 1
    names: list[str] = []
    i = 0
    while i < len(args):
        a = args[i]
        if a == "--plans":
            i += 1
            plans_tag = args[i]
        elif a == "--noop":
            noop = True
        elif a == "--attempts":
            i += 1
            attempts = int(args[i])
        else:
            names.append(a)
        i += 1
    if not names:
        names = list(HEADLINE)

    from bench import er_clusters_attributed, make_spark
    spark = make_spark(CPUS)
    import __spark_entry__ as E
    qs = E.queries()

    out: dict = {"sf_dir": SF_DIR, "cpus": CPUS, "queries": {}}
    for name in names:
        best = None
        for k in range(attempts):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.time()
            if name == "er_clusters":
                n, dt, stages = er_clusters_attributed(spark, SF_DIR)
                rec = {"sec": round(dt, 2), "rows": n, "stages": stages}
            else:
                df = qs[name](spark, SF_DIR)
                if noop:
                    df.write.format("noop").mode("overwrite").save()
                    n = -1
                else:
                    n = df.count()
                rec = {"sec": round(time.time() - t0, 2), "rows": n}
            print(f"[extra] {name} attempt {k}: {rec['sec']}s "
                  f"({rec['rows']} rows)", file=sys.stderr, flush=True)
            if best is None or rec["sec"] < best["sec"]:
                best = rec
            spark.sparkContext.setJobDescription(None)
        out["queries"][name] = best
        if plans_tag and name != "er_clusters":
            os.makedirs("plans/r06", exist_ok=True)
            df = qs[name](spark, SF_DIR)
            p = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            with open(f"plans/r06/{name}_{plans_tag}.txt", "w") as f:
                f.write(p)
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
