"""Stage 7 — clustering (reference: ``cluster.py``).

The reference clusters greedily and *globally sequentially*: edges sorted
by (ground-truth desc, phat desc), merged one at a time under constraint
checks, via networkx + python dicts (``cluster.py:611-726``).  That is a
single-machine design.  The distributed equivalent (per BASELINE.json):

1. **Connected components** over all valid edges via iterative
   large-star / small-star self-joins (Kiveris et al., "Connected
   Components in MapReduce and Beyond") — O(log n) rounds, each a
   groupBy/join shuffle, no driver-side graph.
2. **Component triage** — components whose records carry ≤ 1 distinct
   uid can never violate the auto cluster constraint
   (``cluster.py:272-324``): they are final as-is.  This is the vast
   majority at any scale.
3. **Greedy replay inside violating components** via ``applyInPandas``:
   the reference's edge order restricted to one component is replayed
   exactly (merges never cross components, so per-component replay is
   order-equivalent to the reference's global loop where it matters).
   Components are bounded (skew guard) so each group fits in a worker.

Cluster ids follow the reference's min-id convention
(``cluster.py:693-706``): a cluster is named by its smallest record_id.
"""

from __future__ import annotations

from typing import Callable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _canon_edges(edges: DataFrame) -> DataFrame:
    return (
        edges
        .select(F.least("record_id_1", "record_id_2").alias("src"),
                F.greatest("record_id_1", "record_id_2").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def connected_components(edges: DataFrame, nodes: DataFrame | None = None,
                         max_iter: int = 50) -> DataFrame:
    """G1 — (record_id, cluster_id) via alternating large-star/small-star.

    ``edges``: record_id_1/record_id_2 pairs.  ``nodes``: optional
    (record_id) table; nodes without edges become singleton clusters
    (``cluster.py:383-429``).  Converges in O(log n) rounds; each round
    is two shuffles.  Plans are cut with ``localCheckpoint`` every round
    — the iterative-join lineage would otherwise grow exponentially.
    """
    spark = edges.sparkSession
    e = _canon_edges(edges).localCheckpoint(eager=True)
    prev_sig: tuple = (None, None)

    for _ in range(max_iter):
        # ---- large-star: connect every neighbor > u to min(N(u) ∪ {u})
        nbrs = e.union(e.select(F.col("dst").alias("src"),
                                F.col("src").alias("dst")))
        m = (nbrs.groupBy("src")
             .agg(F.least(F.min("dst"), F.first("src")).alias("mn")))
        large = (
            nbrs.join(m, "src")
            .filter(F.col("dst") > F.col("src"))
            .select(F.col("mn").alias("src"), F.col("dst"))
            .filter(F.col("src") != F.col("dst"))
            .distinct()
        )
        # ---- small-star: connect every neighbor <= u (and u) to min
        dir_e = large.select(
            F.greatest("src", "dst").alias("src"),
            F.least("src", "dst").alias("dst"))
        m2 = (dir_e.groupBy("src")
              .agg(F.min("dst").alias("mn")))
        small = (
            dir_e.join(m2, "src")
            .select(F.col("mn").alias("new_src"), F.col("dst"), F.col("src"))
        )
        new_e = (
            small.select(F.col("new_src").alias("src"),
                         F.col("dst").alias("dst"))
            .union(small.select(F.col("new_src").alias("src"),
                                F.col("src").alias("dst")))
            .filter(F.col("src") != F.col("dst"))
            .select(F.least("src", "dst").alias("src"),
                    F.greatest("src", "dst").alias("dst"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        # convergence = the edge set is a fixed point: one cheap
        # shuffle-free agg over the just-checkpointed partitions (count +
        # order-independent hash), compared against the previous round —
        # replaces the earlier self-join probe, which cost two extra
        # shuffles per round (the CC loop's per-round job count is pure
        # overhead at any scale; see VERDICT r1 "what's wrong" #7)
        sig_row = new_e.agg(
            F.count("*").alias("n"),
            F.sum(F.pmod(F.xxhash64("src", "dst"),
                         F.lit(1_000_000_007))).alias("h")).collect()[0]
        sig = (sig_row["n"], sig_row["h"])
        e = new_e
        if sig == prev_sig:
            break
        prev_sig = sig

    assign = (
        e.select(F.col("dst").alias("record_id"),
                 F.col("src").alias("cluster_id"))
        .union(e.select(F.col("src").alias("record_id"),
                        F.col("src").alias("cluster_id")))
        .groupBy("record_id").agg(F.min("cluster_id").alias("cluster_id"))
    )
    if nodes is not None:
        singles = (
            nodes.select("record_id").distinct()
            .join(assign, "record_id", "left_anti")
            .withColumn("cluster_id", F.col("record_id"))
        )
        assign = assign.unionByName(singles)
    return assign


def _greedy_replay_factory(
        leven_thresh: int | None,
        is_valid_cluster: Callable[[set[str]], bool] | None):
    """Build the per-component greedy merge function (G3,
    ``cluster.py:650-713``).  Runs inside applyInPandas; each group is
    one connected component's edge list plus per-record uids."""
    from namematch_spark.functions.strings import levenshtein

    def uids_compatible(uids: set[str]) -> bool:
        # auto_is_valid_cluster (cluster.py:272-324): <= 1 distinct uid,
        # tolerating near-identical uids when leven_thresh is set
        real = sorted(u for u in uids if u)
        if len(real) <= 1:
            return True
        if leven_thresh is not None:
            base = real[0]
            return all(levenshtein(base, u) <= leven_thresh
                       for u in real[1:])
        return False

    def replay(pdf: pd.DataFrame) -> pd.DataFrame:
        # edge rows sorted by the reference's order: gt desc, phat desc,
        # then dr_id for a stable, deterministic tiebreak (W1)
        pdf = pdf.sort_values(["gt", "phat", "dr_id"],
                              ascending=[False, False, True])
        parent: dict[str, str] = {}
        uids: dict[str, set] = {}

        def find(x: str) -> str:
            root = x
            while parent.get(root, root) != root:
                root = parent[root]
            while parent.get(x, x) != x:
                parent[x], x = root, parent[x]
            return root

        for row in pdf.itertuples(index=False):
            # uid_1/uid_2 are the per-RECORD uids joined from all-names
            # (the reference looks uids up in the all-names table,
            # ``cluster.py:485-487`` — never from edge metadata), so
            # accumulating across rows is safe for any edge source,
            # including must-link edges.
            for rid, uid in ((row.record_id_1, row.uid_1),
                             (row.record_id_2, row.uid_2)):
                s = uids.setdefault(rid, set())
                if uid:
                    s.add(uid)
            r1, r2 = find(row.record_id_1), find(row.record_id_2)
            if r1 == r2:
                continue
            merged = uids.setdefault(r1, set()) | uids.setdefault(r2, set())
            if not uids_compatible(merged):
                continue
            # gt edges bypass the *user* constraint (reference
            # ``cluster.py``: ``edge_is_gt or is_valid_cluster(...)``);
            # the auto uid check above always applies.
            if (row.gt != 1 and is_valid_cluster is not None
                    and not is_valid_cluster(merged)):
                continue
            lo, hi = (r1, r2) if r1 < r2 else (r2, r1)
            parent[hi] = lo
            uids[lo] = merged
        out = [(rid, find(rid)) for rid in uids]
        return pd.DataFrame(out, columns=["record_id", "cluster_id"])

    return replay


def constrained_clusters(potential_edges: DataFrame,
                         must_link_edges: DataFrame,
                         all_names: DataFrame,
                         leven_thresh: int | None = None,
                         is_valid_cluster: Callable[[set[str]], bool] | None = None,
                         max_component: int = 100_000) -> DataFrame:
    """G1-G5 — full constrained clustering.

    ``potential_edges``: scored pairs with gt/phat/uid_1/uid_2 columns.
    ``must_link_edges``: ground-truth pairs (gt=1, phat=1.0).
    Returns (record_id, cluster_id) covering every non-dropped record
    (singletons get their own id).
    """
    edges = (
        potential_edges
        .select("dr_id", "record_id_1", "record_id_2", "gt", "phat")
        .unionByName(
            must_link_edges
            .select(
                F.concat_ws("__", "record_id_1", "record_id_2")
                .alias("dr_id"),
                "record_id_1", "record_id_2",
                F.lit(1).alias("gt"), F.lit(1.0).alias("phat")))
    )
    comp = connected_components(
        edges.select("record_id_1", "record_id_2"))

    # attach component id to each edge (via record_id_1 — both endpoints
    # are in the same component by construction)
    edges_c = edges.join(
        comp.withColumnRenamed("record_id", "record_id_1")
        .withColumnRenamed("cluster_id", "component_id"), "record_id_1")

    # triage: a component is "clean" when its records carry <= 1
    # distinct non-empty uid — no constraint can fire; its CC result is
    # final without replay.
    uid_per_comp = (
        comp.join(all_names.select("record_id", "uid"), "record_id")
        .filter(F.col("uid") != "")
        .groupBy("cluster_id")
        .agg(F.countDistinct("uid").alias("n_uid"))
    )
    dirty_comps = uid_per_comp.filter(F.col("n_uid") > 1).select(
        F.col("cluster_id").alias("component_id"))

    clean_assign = comp.join(
        dirty_comps.withColumnRenamed("component_id", "cluster_id"),
        "cluster_id", "left_anti")

    # skew guard: replaying a component needs it to fit in one worker
    comp_sizes = edges_c.groupBy("component_id").agg(
        F.count("*").alias("__n"))
    oversized = comp_sizes.filter(F.col("__n") > max_component)

    # replay input: per-RECORD uids joined from all-names (reference
    # ``cluster.py:485-487``) — edge metadata is NOT a reliable uid
    # source (must-link edges carry none).  Only dirty edges pay the
    # two joins, and the uid side is the record table projected to two
    # columns.
    rec_uid = all_names.select("record_id", "uid")
    dirty_edges = (
        edges_c.join(dirty_comps, "component_id", "left_semi")
        .join(oversized.select("component_id"), "component_id", "left_anti")
        .join(rec_uid.select(F.col("record_id").alias("record_id_1"),
                             F.col("uid").alias("uid_1")), "record_id_1")
        .join(rec_uid.select(F.col("record_id").alias("record_id_2"),
                             F.col("uid").alias("uid_2")), "record_id_2")
    )
    replay = _greedy_replay_factory(leven_thresh, is_valid_cluster)
    replayed = (
        dirty_edges
        .repartition("component_id")
        .groupBy("component_id")
        .applyInPandas(replay, "record_id string, cluster_id string")
        .select("record_id", "cluster_id")
    )
    # oversized dirty components fall back to unconstrained CC (reported
    # upstream via metrics; at sane uid quality these do not occur)
    oversized_assign = (
        comp.join(dirty_comps.withColumnRenamed("component_id",
                                                "cluster_id"),
                  "cluster_id", "left_semi")
        .join(oversized.withColumnRenamed("component_id", "cluster_id"),
              "cluster_id", "left_semi")
    )

    assigned = clean_assign.unionByName(replayed).unionByName(
        oversized_assign)

    singles = (
        all_names.filter(F.col("drop_from_nm") == 0)
        .select("record_id").distinct()
        .join(assigned, "record_id", "left_anti")
        .withColumn("cluster_id", F.col("record_id"))
    )
    return assigned.unionByName(singles)


def clusters_to_pairs(assignment: DataFrame) -> DataFrame:
    """Predicted co-referent pairs implied by a clustering (for pairwise
    evaluation).  Self-join on cluster_id with canonical ordering."""
    a, b = assignment.alias("a"), assignment.alias("b")
    return (
        a.join(b, F.col("a.cluster_id") == F.col("b.cluster_id"))
        .filter(F.col("a.record_id") < F.col("b.record_id"))
        .select(F.col("a.record_id").alias("record_id_1"),
                F.col("b.record_id").alias("record_id_2"))
    )
