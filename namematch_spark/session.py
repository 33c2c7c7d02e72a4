"""SparkSession factory with scale-oriented defaults.

The engine targets multi-executor clusters over ~100 TB of data; these
defaults encode the knobs that matter there (AQE, skew-join handling,
Arrow batch size for pandas UDFs, shuffle partition sizing) while staying
correct on ``local[N]`` for tests.

Reference parity: the reference pipeline hand-tunes out-of-core batch
sizes (``/root/reference/namematch/default_parameters.yaml:8-12``); in
Spark those become partition counts + Arrow batch sizes and AQE handles
runtime re-planning.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Defaults applied to every session the engine creates.  Callers may
#: override any of them via the ``conf`` argument of :func:`get_spark`.
_ENGINE_CONF: dict[str, str] = {
    # Adaptive execution: runtime coalescing, skew-join splitting, and
    # dynamic broadcast decisions — required by the 100 TB design.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Dimension tables in this engine carry no hints — AQE converts
    # shuffle joins to broadcast at runtime while the build side is
    # genuinely small; 64m keeps the distinct-name dims on the
    # broadcast path at bench scale without forcing it at 100 TB.
    "spark.sql.autoBroadcastJoinThreshold": "64m",
    # batch engine: a broadcast build may sit behind a long upstream
    # computation; the 300 s default kills legitimate low-parallelism
    # runs (observed at local[2])
    "spark.sql.broadcastTimeout": "1800",
    # Prefer shuffled-hash over sort-merge: the blocking joins stream a
    # large pair table against per-name dims — hashing the dim side
    # per partition beats sorting the pair side twice, and unlike
    # broadcast it has no serial driver-side build.
    "spark.sql.join.preferSortMergeJoin": "false",
    # Arrow transfer for pandas UDFs / applyInPandas (the feature stage).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.execution.arrow.maxRecordsPerBatch": "10000",
    # Sized for local test runs; spark-submit overrides per cluster.
    "spark.sql.shuffle.partitions": "32",
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
    # Parquet scans: keep splits bounded so a 100 TB scan parallelizes.
    "spark.sql.files.maxPartitionBytes": "128m",
    # Deterministic timestamp semantics across engines.
    "spark.sql.session.timeZone": "UTC",
    "spark.ui.enabled": "false",
    # the console progress bar redraws constantly on long jobs and
    # pollutes captured output; metrics come from the manifest instead
    "spark.ui.showConsoleProgress": "false",
}


def get_spark(
    app_name: str = "namematch-spark",
    master: str | None = None,
    conf: dict[str, str] | None = None,
) -> SparkSession:
    """Create (or fetch) a SparkSession with engine defaults applied.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (falls back to
    ``local[*]``); on a real cluster it is supplied by ``spark-submit``
    and must NOT be set here.
    """
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    builder = SparkSession.builder.appName(app_name)
    # multi-executor masters (local-cluster, standalone) spawn separate
    # python workers that need the package on their path — the same
    # role spark-submit --py-files plays on a real cluster
    builder = builder.config("spark.executorEnv.PYTHONPATH", repo_root)
    if master is None and "SPARK_GRAFT_CPUS" in os.environ:
        master = f"local[{os.environ['SPARK_GRAFT_CPUS']}]"
    if master is None:
        # under spark-submit the master arrives as the spark.master
        # system property and MUST win (builder.master would override
        # it); plain `python ...` runs fall back to local[*]
        from pyspark import SparkConf
        if not SparkConf().contains("spark.master"):
            master = "local[*]"
    if master is not None:
        builder = builder.master(master)
    merged = dict(_ENGINE_CONF)
    if conf:
        merged.update(conf)
    for k, v in merged.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def stop_spark() -> None:
    """Stop the active session (used by the bench harness to re-launch
    at a different parallelism level)."""
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
