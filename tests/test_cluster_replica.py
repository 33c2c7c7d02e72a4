"""Greedy-replay value check against an INDEPENDENT single-threaded
replica of the reference clustering loop (``cluster.py:611-726``):
sort edges (gt desc, phat desc, dr_id asc), union-find merges gated by
the automated uid constraint (``cluster.py:272-324``) with
``leven_thresh`` tolerance.  Runs on the real sf0.001 derivation with
deterministic edge scores (phat = 1 − cos_dist), i.e. the same edge
universe the driver's ``er_clusters_det`` contract query uses — but
with ``leven_thresh=1``, which the SQL oracle does not cover."""

from __future__ import annotations

import pyspark.sql.functions as F

from namematch_spark.functions.strings import levenshtein

SF = "/root/testdata/sf0.001"


def _replica(edges, uid_of, leven_thresh):
    """Reference loop replica: plain dicts + union-find, nothing shared
    with the engine's implementation."""
    def conflict(u1, u2):
        if not u1 or not u2 or u1 == u2:
            return False
        if leven_thresh is None:
            return True
        return levenshtein(u1, u2) > leven_thresh

    def compatible(uids):
        real = sorted({u for u in uids if u})
        if len(real) <= 1:
            return True
        if leven_thresh is None:
            return False
        return all(any(levenshtein(u, v) <= leven_thresh
                       for v in real if v != u) for u in real)

    parent: dict[str, str] = {}
    members: dict[str, set[str]] = {}

    def find(x):
        while parent.get(x, x) != x:
            x = parent[x]
        return x

    ordered = sorted(edges, key=lambda e: (-e["gt"], -e["phat"],
                                           e["dr_id"]))
    touched: set[str] = set()
    for e in ordered:
        r1, r2 = e["record_id_1"], e["record_id_2"]
        # the engine's pre-CC auto edge veto (gt exempt)
        if e["gt"] != 1 and conflict(uid_of.get(r1, ""),
                                     uid_of.get(r2, "")):
            continue
        touched.update((r1, r2))
        for r in (r1, r2):
            members.setdefault(r, {r})
        a, b = find(r1), find(r2)
        if a == b:
            continue
        merged = members[a] | members[b]
        if not compatible({uid_of.get(r, "") for r in merged}):
            continue
        lo, hi = (a, b) if a < b else (b, a)
        parent[hi] = lo
        members[lo] = merged
        del members[hi]
    return {r: find(r) for r in touched}


def test_replay_matches_reference_replica(spark, all_names):
    from namematch_spark.operators import blocking as B
    from namematch_spark.operators.cluster import constrained_clusters
    from namematch_spark.operators.mustlinks import must_links
    from namematch_spark.operators.pairs import expand_bs_to_record_pairs

    # the session all_names fixture IS preprocess(person_records) at SF;
    # pot/ml are each consumed twice (constrained_clusters + the replica
    # collect) — cache them or the blocking DAG executes twice
    an = all_names
    rp = expand_bs_to_record_pairs(
        B.candidate_blockstring_pairs(an), an)
    pot = rp.select(
        "dr_id", "record_id_1", "record_id_2",
        F.lit(0).alias("gt"),
        (F.lit(1.0) - F.col("cos_dist")).alias("phat")).cache()
    ml = must_links(an).filter(
        (F.col("drop_from_nm_1") == 0)
        & (F.col("drop_from_nm_2") == 0)).cache()

    got = {r["record_id"]: r["cluster_id"]
           for r in constrained_clusters(
               pot, ml, an, leven_thresh=1).collect()}

    uid_of = {r["record_id"]: r["uid"]
              for r in an.filter(F.col("drop_from_nm") == 0)
              .select("record_id", "uid").collect()}
    edges = [r.asDict() for r in pot.collect()]
    edges += [{"dr_id": f'{r["record_id_1"]}__{r["record_id_2"]}',
               "record_id_1": r["record_id_1"],
               "record_id_2": r["record_id_2"], "gt": 1, "phat": 1.0}
              for r in ml.collect()]
    want = _replica(edges, uid_of, leven_thresh=1)

    # every edge-touched record must agree; singletons = own id
    assert got.keys() >= want.keys()
    mismatches = {r: (got[r], want[r])
                  for r in want if got[r] != want[r]}
    assert not mismatches, f"{len(mismatches)} diverging: " \
        f"{dict(list(mismatches.items())[:5])}"
    for r, c in got.items():
        if r not in want:
            assert c == r          # singleton keeps its own id
    pot.unpersist()
    ml.unpersist()
