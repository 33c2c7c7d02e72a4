"""End-to-end record-linkage pipeline (reference: ``namematcher.py``).

The reference chains nine make-style tasks (``namematcher.py:304-311``);
here each stage is a DataFrame transform checkpointed through
:class:`~namematch_spark.checkpoint.CheckpointManager`, so a killed run
resumes at the last committed stage (the BASELINE resumability rule).

Stage spine (≙ reference modules):
  preprocess → must_links → blocking → pair features → fit/score →
  potential links → constrained clustering → output + eval
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from namematch_spark.checkpoint import CheckpointManager
from namematch_spark.operators import blocking as B
from namematch_spark.operators.cluster import (clusters_to_pairs,
                                               constrained_clusters)
from namematch_spark.operators.model import (MatchModel, pairwise_eval,
                                             potential_links, score_pairs,
                                             train_match_model)
from namematch_spark.operators.mustlinks import must_links
from namematch_spark.operators.pairs import (expand_bs_to_record_pairs,
                                             pair_features)
from namematch_spark.operators.preprocess import preprocess


@dataclass
class PipelineConfig:
    leven_thresh: int | None = 1
    bars: dict | None = None       # blocking bars (blocking.DEFAULT_BARS)
    num_hashes: int = 24
    rows_per_band: int = 4
    num_trees: int = 100
    is_valid_cluster: Callable[[set[str]], bool] | None = None
    checkpoint_dir: str | None = None
    extra: dict = field(default_factory=dict)


@dataclass
class PipelineResult:
    all_names: DataFrame
    must_links: DataFrame
    candidate_nn_pairs: DataFrame
    data_rows: DataFrame
    model: MatchModel
    potential_links: DataFrame
    clusters: DataFrame
    metrics: dict


STAGES = ["all_names", "must_links", "candidates", "data_rows",
          "potential_links", "clusters"]


def run_pipeline(records: DataFrame,
                 config: PipelineConfig | None = None) -> PipelineResult:
    """Run the full linkage over a raw person-records DataFrame
    (columns: record_id, first_name, last_name, dob, gender, age, uid).
    """
    cfg = config or PipelineConfig()
    spark = records.sparkSession
    ckpt = (CheckpointManager(cfg.checkpoint_dir)
            if cfg.checkpoint_dir else None)

    def stage(name: str, compute: Callable[[], DataFrame]) -> DataFrame:
        # Without a checkpoint dir, cache: every stage feeds multiple
        # downstream consumers (scoring + metrics), and recomputing the
        # whole upstream DAG per consumer multiplies the work.
        if ckpt is None:
            return compute().cache()
        return ckpt.load_or_compute(spark, name, compute)

    an = stage("all_names", lambda: preprocess(records))
    ml = stage("must_links", lambda: must_links(an))
    cand = stage("candidates", lambda: B.candidate_blockstring_pairs(
        an, bars=cfg.bars, num_hashes=cfg.num_hashes,
        rows_per_band=cfg.rows_per_band))
    def _data_rows() -> DataFrame:
        # the feature plan consumes the expansion three times (base +
        # two metric-dim subqueries) — materialize it once
        rp = expand_bs_to_record_pairs(cand, an).cache()
        return pair_features(rp, leven_thresh=cfg.leven_thresh)

    dr = stage("data_rows", _data_rows)

    model = train_match_model(dr, num_trees=cfg.num_trees)

    pl = stage("potential_links", lambda: potential_links(
        score_pairs(model.model, dr), model.threshold))
    clusters = stage("clusters", lambda: constrained_clusters(
        pl, ml, an, leven_thresh=cfg.leven_thresh,
        is_valid_cluster=cfg.is_valid_cluster))

    pred_pairs = clusters_to_pairs(clusters)
    metrics = {
        "model": model.eval_metrics,
        "threshold": model.threshold,
        "pair_completeness": B.pair_completeness(
            dr.select("record_id_1", "record_id_2"), ml),
        "pairwise": pairwise_eval(pred_pairs, dr),
        "n_clusters": clusters.select("cluster_id").distinct().count(),
    }
    if ckpt is not None:
        metrics["stages"] = ckpt.stats()
    return PipelineResult(
        all_names=an, must_links=ml, candidate_nn_pairs=cand,
        data_rows=dr, model=model, potential_links=pl,
        clusters=clusters, metrics=metrics)


def output_with_clusters(records: DataFrame, clusters: DataFrame
                         ) -> DataFrame:
    """G5 — final output join (``generate_output.py:104-172``)."""
    return records.join(clusters, "record_id", "left")
