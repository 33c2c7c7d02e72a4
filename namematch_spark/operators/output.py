"""Stage 8 — outputs (reference: ``generate_output.py``).

Two deliverables, same as the reference:

* the all-names table with ``cluster_id`` and the RAW values restored
  into the cleaned name columns (``generate_output.py:104-116``:
  ``tmp_raw__<col>`` → ``<col>``, temp columns dropped);
* one output table per input data file: the original rows plus the
  cluster id, joined through the synthesized record id
  (``generate_output.py:119-172``); rows that never got a cluster id
  are dropped with a count, like the reference's warning path.

Sinks are plain ``df.write`` (S8): csv with headers for reference
parity, parquet for scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def all_names_with_clusterid(all_names: DataFrame,
                             clusters: DataFrame) -> DataFrame:
    """G5 + raw-value restore (``generate_output.py:104-116``).
    Records outside the clustering (dropped rows) keep a NULL
    cluster_id."""
    raw_cols = [c for c in all_names.columns
                if c.startswith("tmp_raw__")]
    out = all_names.join(clusters, "record_id", "left")
    for rc in raw_cols:
        out = out.withColumn(rc[len("tmp_raw__"):], F.col(rc))
    return out.drop(*raw_cols)


def output_clusterid_tables(raw_by_file: dict[str, DataFrame],
                            schema,
                            clusters: DataFrame,
                            cluster_id_col: str = "cluster_id"
                            ) -> dict[str, DataFrame]:
    """Per-input-file outputs (``generate_output.py:119-172``): the
    ORIGINAL columns of each input file plus the cluster id, joined via
    the synthesized record id; unclustered rows are dropped (the
    reference warns and filters them)."""
    out = {}
    for df_spec in schema.data_files:
        raw = raw_by_file[df_spec.nickname]
        keyed = raw.withColumn(
            "__nm_rec_id",
            F.concat(F.lit(df_spec.nickname), F.lit("__"),
                     F.col(df_spec.record_id_col).cast("string")))
        joined = (
            keyed.join(
                clusters.select(
                    F.col("record_id").alias("__nm_rec_id"),
                    F.col("cluster_id").alias(cluster_id_col)),
                "__nm_rec_id", "left")
            .filter(F.col(cluster_id_col).isNotNull())
            .drop("__nm_rec_id")
        )
        out[df_spec.nickname] = joined
    return out


def write_outputs(tables: dict[str, DataFrame], out_dir: str,
                  fmt: str = "csv") -> None:
    """S8 sink: one directory per input file
    (``<out_dir>/<nickname>_with_clusterid``)."""
    for nickname, df in tables.items():
        path = f"{out_dir}/{nickname}_with_clusterid"
        if fmt == "csv":
            df.write.mode("overwrite").option("header", True).csv(path)
        else:
            df.write.mode("overwrite").parquet(path)
