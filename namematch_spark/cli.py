"""Command-line driver (reference: ``cli.py:15-283``).

``python -m namematch_spark.cli run -c config.yaml --output-dir out``
runs the full pipeline; per-stage subcommands (``process-input-data``,
``generate-must-links``, ``block``, ``generate-data-rows``,
``fit-model``/``predict``, ``cluster``, ``generate-output``) mirror the
reference's stage commands — each materializes up to its stage through
the checkpoint manager, so a later invocation (or a killed ``run``)
resumes instead of recomputing.

Designed for ``spark-submit --py-files namematch_spark.zip
namematch_spark/cli.py run -c config.yaml`` on a cluster: the session
is built from ``--master`` (default ``local[*]``) and standard
``spark.*`` settings can be injected with ``--conf k=v``.

Config YAML = the reference surface (``examples/command_line_usage/
config.yaml``): ``data_files`` (with ``filepath``, ``record_id_col``,
``file_type``), ``variables`` (with per-file ``<nick>_col`` maps,
``check``/``drop``/``set_missing``), optional parameters
(``leven_thresh``, ``num_trees``,
``allow_clusters_w_multiple_unique_ids``, ``blocking_scheme``).

Engine convention: the blocking scheme's two cosine variables, the
edit-distance variable and the absvalue variable are standardized onto
``first_name``/``last_name``/``dob``/``age``, the UniqueID variable
onto ``uid`` — renames only, any other declared variables ride along.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

STAGE_COMMANDS = {
    # reference cli.py subcommand -> pipeline stage to stop after
    "process-input-data": "all_names",
    "generate-must-links": "must_links",
    "block": "candidates",
    "generate-data-rows": "data_rows",
    "fit-model": "potential_links",
    "predict": "potential_links",
    "cluster": "clusters",
    "generate-output": None,          # full run + output tables
    "run": None,
}


def load_config(path: str) -> dict:
    import yaml
    with open(path) as f:
        return yaml.safe_load(f)


def build_session(args):
    from namematch_spark.session import get_spark
    conf = {"spark.sql.shuffle.partitions":
            str(args.shuffle_partitions)}
    for kv in args.conf or []:
        k, _, v = kv.partition("=")
        conf[k] = v
    return get_spark(app_name="namematch-spark",
                     master=args.master, conf=conf)


def read_data_file(spark, spec) -> "DataFrame":
    path = spec.filepath
    if path.endswith(".parquet"):
        return spark.read.parquet(path)
    # honor the config's declared delimiter (reference data_files.delim;
    # ADVICE r3: ignoring it misparses every column into one field)
    return (spark.read.option("header", True)
            .option("sep", getattr(spec, "delim", ",") or ",")
            .csv(path))


def standardize(an, schema):
    """Rename the blocking-role + UniqueID variables onto the engine's
    column convention (see module docstring)."""
    from pyspark.sql import functions as F
    bs = schema.blocking_scheme
    renames = {}
    cos = bs["cosine_distance"]["variables"]
    renames[cos[0]] = "first_name"
    renames[cos[1]] = "last_name"
    if bs.get("edit_distance", {}).get("variable"):
        renames[bs["edit_distance"]["variable"]] = "dob"
    if bs.get("absvalue_distance", {}).get("variable"):
        renames[bs["absvalue_distance"]["variable"]] = "age"
    # first UniqueID variable → engine "uid"; FURTHER UniqueID
    # variables ride along under their own names and are passed to the
    # pipeline via uid_cols (the reference loops all of them:
    # generate_must_links.py:160-184, cluster.py:304-324)
    uids = schema.uid_vars()
    if uids:
        renames[uids[0]] = "uid"
    for old, new in renames.items():
        if old != new:
            an = an.withColumnRenamed(old, new)
            if f"tmp_raw__{old}" in an.columns:
                an = an.withColumnRenamed(f"tmp_raw__{old}",
                                          f"tmp_raw__{new}")
    for required, default in (("uid", ""), ("gender", ""), ("age", ""),
                              ("dob", "")):
        if required not in an.columns:
            an = an.withColumn(required, F.lit(default))
    return an


def cmd_stage(args, stop_after: str | None, with_output: bool) -> int:
    from namematch_spark.pipeline import PipelineConfig, run_pipeline
    from namematch_spark.schema import Schema, preprocess_with_schema

    cfg_dict = load_config(args.config_file)
    schema = Schema.from_dict(cfg_dict)
    os.makedirs(args.output_dir, exist_ok=True)
    ckpt_dir = args.checkpoint_dir or os.path.join(
        args.output_dir, "checkpoints")
    if args.force and os.path.isdir(ckpt_dir):
        import shutil
        shutil.rmtree(ckpt_dir)

    pcfg = PipelineConfig(
        leven_thresh=cfg_dict.get("leven_thresh", 1),
        num_trees=cfg_dict.get("num_trees", 100),
        num_hashes=cfg_dict.get("num_hashes", 24),
        name_prob=cfg_dict.get("name_prob", True),
        jw_variant=cfg_dict.get("jw_variant", "standard"),
        allow_clusters_w_multiple_unique_ids=cfg_dict.get(
            "allow_clusters_w_multiple_unique_ids", False),
        # every UniqueID variable: the first is standardized onto
        # "uid", the rest keep their config names
        uid_cols=(["uid"] + schema.uid_vars()[1:]
                  if schema.uid_vars() else ["uid"]),
        evaluate=cfg_dict.get("evaluate", False),
        # incremental mode: --index-dir (or config key) switches the
        # candidates stage to the persisted blocking index, and an
        # ExistingID variable keeps prior cluster ids stable
        incremental_index_dir=(args.index_dir
                               or cfg_dict.get("incremental_index_dir")),
        existing_id_col=schema.existing_id_var(),
        checkpoint_dir=ckpt_dir,
    )

    spark = build_session(args)
    try:
        raw_by_file = {spec.nickname: read_data_file(spark, spec)
                       for spec in schema.data_files}
        an = standardize(
            preprocess_with_schema(raw_by_file, schema), schema)
        res = run_pipeline(an, config=pcfg, all_names=an,
                           stop_after=stop_after)
        if with_output and res.clusters is not None:
            from namematch_spark.operators.output import (
                all_names_with_clusterid, output_clusterid_tables,
                write_outputs)
            all_names_with_clusterid(res.all_names, res.clusters) \
                .write.mode("overwrite").parquet(
                    os.path.join(args.output_dir, "all_names"))
            write_outputs(
                output_clusterid_tables(raw_by_file, schema,
                                        res.clusters),
                args.output_dir, fmt=args.output_format)
            # M6 artifact (reference fit_model.py:81,228 writes
            # flipped0_potential_edges.csv every full run): labeled-0
            # pairs scored above their model's threshold.  Rows only
            # when allow_clusters_w_multiple_unique_ids (the reference
            # returns an empty frame otherwise, fit_model.py:748-749);
            # header-only CSV still written so consumers can rely on
            # the file.  Driver-side like the reference's to_csv — the
            # set is the model/label disagreement tail, small by
            # construction.
            from pyspark.sql import functions as F
            f0_cols = ["dr_id", "record_id_1", "record_id_2",
                       "model_to_use", "label", "phat"]
            f0 = res.potential_links.filter(F.col("label") == "0") \
                .select(*[c for c in f0_cols
                          if c in res.potential_links.columns])
            if not pcfg.allow_clusters_w_multiple_unique_ids:
                f0 = f0.limit(0)
            f0.toPandas().to_csv(
                os.path.join(args.output_dir,
                             "flipped0_potential_edges.csv"),
                index=False)
        info = {
            "config_file": os.path.abspath(args.config_file),
            "output_dir": os.path.abspath(args.output_dir),
            "stage": stop_after or "all",
            "metrics": res.metrics or {},
        }
        if stop_after is None and res.clusters is not None:
            # stage 9: report artifact (reference generate_report.py:
            # 34-55 renders matching_report.html every full run; its
            # e2e test asserts existence).  generate_report also
            # writes the richer nm_info.json (stage counts, phat
            # histogram, cluster sizes) — merge our run metadata in.
            from namematch_spark.operators.report import generate_report
            info["report"] = generate_report(res, args.output_dir)
            rich = os.path.join(args.output_dir, "nm_info.json")
            if os.path.isfile(rich):
                with open(rich) as f:
                    info = {**json.load(f), **info}
        with open(os.path.join(args.output_dir, "nm_info.json"),
                  "w") as f:
            json.dump(info, f, indent=2, default=str)
        print(json.dumps({"status": "ok",
                          "stage": stop_after or "all"}))
        return 0
    finally:
        if not args.keep_session:
            spark.stop()


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="namematch-spark",
        description="PySpark record-linkage pipeline "
                    "(reference-parity CLI)")
    p.add_argument("-c", "--config-file", required=True,
                   help="configuration yaml file")
    p.add_argument("--output-dir", default="output",
                   help="output folder path (default: output)")
    p.add_argument("--checkpoint-dir", default=None,
                   help="checkpoint dir (default: "
                        "<output-dir>/checkpoints)")
    p.add_argument("--index-dir", default=None,
                   help="persisted blocking-index dir — enables "
                        "incremental blocking (first run builds it; "
                        "later runs query only new names)")
    p.add_argument("-f", "--force", action="store_true",
                   help="discard existing checkpoints and recompute")
    p.add_argument("--master", default=None,
                   help="spark master (default: the spark-submit-"
                        "provided master when launched via "
                        "spark-submit, else local[*])")
    p.add_argument("--conf", action="append", metavar="K=V",
                   help="extra spark conf, repeatable")
    p.add_argument("--shuffle-partitions", type=int, default=32)
    p.add_argument("--output-format", choices=["csv", "parquet"],
                   default="csv")
    p.add_argument("--keep-session", action="store_true",
                   help=argparse.SUPPRESS)   # for in-process tests
    p.add_argument("command", choices=sorted(STAGE_COMMANDS),
                   help="run = all stages; stage subcommands mirror "
                        "the reference cli")
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    stop_after = STAGE_COMMANDS[args.command]
    with_output = args.command in ("run", "generate-output")
    return cmd_stage(args, stop_after, with_output)


if __name__ == "__main__":
    sys.exit(main())
