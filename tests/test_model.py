"""Model registry semantics: basic + missingness model (M2), per-model
routing and thresholds (reference ``fit_model.py:566-634``,
``utils/utils.py:414-453``, ``tests/unit/test_fit_model.py:20-33``)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from namematch_spark.operators.model import (MISSINGNESS_THRESHOLD_BOOST,
                                             model_to_use_expr,
                                             potential_links_model_set,
                                             score_with_model_set,
                                             train_model_set)

FEATS = ["var_first_name_edit_dist", "var_dob_missing",
         "var_dob_edit_dist", "var_dob_day_diff", "var_age_num_diff"]


@pytest.fixture(scope="module")
def dr(spark):
    # matches: tiny distances; non-matches: large; some rows miss dob
    rows = []
    for i in range(120):
        match = i % 2 == 0
        dob_missing = i % 5 == 0
        rows.append((
            f"p{i}", f"a{i}", f"b{i}",
            0.0 if match else 6.0,                       # fn edit dist
            1.0 if dob_missing else 0.0,
            None if dob_missing else (0.0 if match else 4.0),
            None if dob_missing else (0.0 if match else 900.0),
            0.0 if match else 30.0,
            "1" if match else "0",
        ))
    return spark.createDataFrame(
        rows,
        "dr_id string, record_id_1 string, record_id_2 string, "
        "var_first_name_edit_dist double, var_dob_missing double, "
        "var_dob_edit_dist double, var_dob_day_diff double, "
        "var_age_num_diff double, label string").cache()


def test_model_set_definition(dr):
    # reference define_necessary_models: missing field -> 2 models,
    # the missingness model excludes every var_<field>_* feature
    ms = train_model_set(dr, feature_cols=FEATS, missing_field="dob",
                         num_trees=5)
    assert set(ms.models) == {"basic", "no_dob"}
    assert all(not c.startswith("var_dob_")
               for c in ms.models["no_dob"].feature_cols)
    ms1 = train_model_set(dr, feature_cols=FEATS, missing_field=None,
                          num_trees=5)
    assert set(ms1.models) == {"basic"}


def test_model_routing_and_scoring(dr):
    ms = train_model_set(dr, feature_cols=FEATS, missing_field="dob",
                         num_trees=5)
    scored = score_with_model_set(ms, dr)
    routed = {r["dr_id"]: r["model_to_use"] for r in scored.collect()}
    assert routed["p0"] == "no_dob"      # i%5==0 -> dob missing
    assert routed["p2"] == "basic"
    # both universes scored, none dropped
    assert len(routed) == 120
    pl = potential_links_model_set(scored, ms)
    got = {r["dr_id"] for r in pl.collect()}
    # separable fixture: every match survives, no non-match does
    assert got == {f"p{i}" for i in range(120) if i % 2 == 0}


def test_flipped0_and_selection_model(dr):
    from namematch_spark.operators.model import (apply_selection_weight,
                                                 flipped0_links,
                                                 train_selection_model)
    ms = train_model_set(dr, feature_cols=FEATS, missing_field=None,
                         num_trees=5)
    scored = score_with_model_set(ms, dr)
    # fixture is separable: no labeled-0 scores above threshold
    assert flipped0_links(scored, ms.basic.threshold).count() == 0
    # a labeled 0 with match-like features WOULD be flipped
    flipped = flipped0_links(scored.withColumn(
        "label", F.lit("0")), 0.0)
    assert flipped.count() == scored.count()

    sel = train_selection_model(dr, feature_cols=FEATS, num_trees=5)
    p_s = 0.25   # scalar share of match-train-eligible rows, P(s)
    weighted = apply_selection_weight(scored, sel, prob_match_train=p_s)
    row = weighted.select("dr_id", "p_selected", "phat",
                          "selection_weight").first()
    assert 0.0 <= row["p_selected"] <= 1.0
    # reference predict.py:231 — weight = (P(s)+1)/(p_selected+1)
    expected = (p_s + 1) / (row["p_selected"] + 1)
    assert abs(row["selection_weight"] - expected) < 1e-12
    # the weight is consumed as a TRAINING sample weight (reference
    # sklearn sample_weight): refit with weightCol, still separable
    from namematch_spark.operators.model import train_match_model
    m2 = train_match_model(weighted, feature_cols=FEATS, num_trees=5,
                           weight_col="selection_weight")
    assert m2.eval_metrics["recall"] == 1.0


def test_per_universe_evaluation(dr):
    # M5 universe splits (model_evaluation_functions.py:266-329): the
    # held-out metrics are reported for all / exactmatch /
    # non-exactmatch pairs at the optimized threshold
    dr_em = dr.withColumn(
        "exactmatch",
        (F.col("var_first_name_edit_dist") == 0.0).cast("int"))
    ms = train_model_set(dr_em, feature_cols=FEATS, missing_field=None,
                         num_trees=5)
    u = ms.basic.eval_metrics["universes"]
    assert set(u) == {"all pairs", "exactmatch pairs",
                      "non exactmatch pairs"}
    assert (u["exactmatch pairs"]["n_eval"]
            + u["non exactmatch pairs"]["n_eval"]
            == u["all pairs"]["n_eval"])
    # the fixture is separable: exactmatch universe is all true
    # matches, so recall there is 1.0 and baserate 1.0
    if u["exactmatch pairs"]["n_eval"]:
        assert u["exactmatch pairs"]["recall"] == 1.0
        assert u["exactmatch pairs"]["baserate"] == 1.0


def test_auc_from_hist():
    # M5 AUC (model_evaluation_functions.py:107-189) — hand-computable
    # fixture over the 2-decimal (phat, exactmatch) histograms
    from namematch_spark.operators.model import auc_from_hist
    pos = {(0.9, 1): 2, (0.5, 0): 1}
    neg = {(0.5, 1): 1, (0.1, 0): 2}
    # all pairs: P=3, N=3; bin .5 pos ties 1 same-bin neg (0.5 credit),
    # beats the 2 lower negs -> (1*(2+0.5) + 2*3) / 9
    assert abs(auc_from_hist(pos, neg) - 8.5 / 9) < 1e-12
    # per-universe: both perfectly separated
    assert auc_from_hist(pos, neg, 1) == 1.0
    assert auc_from_hist(pos, neg, 0) == 1.0
    # reversed ranking -> 0; one-class -> None
    assert auc_from_hist({(0.1, 0): 1}, {(0.9, 0): 1}) == 0.0
    assert auc_from_hist(pos, {}) is None
    # identical distributions -> 0.5 (pure ties)
    assert auc_from_hist({(0.5, 0): 4}, {(0.5, 0): 7}) == 0.5


def test_auc_reported_per_universe(dr):
    ms = train_model_set(dr, feature_cols=FEATS, missing_field=None,
                         num_trees=5)
    m = ms.basic.eval_metrics
    assert 0.0 <= m["auc"] <= 1.0
    for u in m["universes"].values():
        if u.get("n_eval"):
            assert "auc" in u or u["baserate"] in (0.0, 1.0)


def test_model_to_use_expr(spark):
    df = spark.createDataFrame([(1.0,), (0.0,)], "var_dob_missing double") \
        .withColumn("m", model_to_use_expr("dob"))
    vals = [r["m"] for r in df.collect()]
    assert vals == ["no_dob", "basic"]
    assert MISSINGNESS_THRESHOLD_BOOST == 0.2


def test_grid_search_cv(dr):
    # M1 grid parity (fit_model.py:278-299): 3-fold CV over the
    # reference's min_samples_leaf grid via MLlib CrossValidator.
    # On the 120-row fixture a 150-leaf floor forbids any split, so
    # the grid must evaluate BOTH points and pick 25.
    from namematch_spark.operators.model import (GRID_CV_FOLDS,
                                                 GRID_MIN_INSTANCES,
                                                 train_match_model)
    mm = train_match_model(dr, feature_cols=FEATS, num_trees=5,
                           grid_min_instances=GRID_MIN_INSTANCES)
    g = mm.eval_metrics["grid"]
    assert g["param"] == "minInstancesPerNode"
    assert g["grid"] == GRID_MIN_INSTANCES == [25, 150]
    assert len(g["cv_f1"]) == 2          # both grid points evaluated
    assert g["folds"] == GRID_CV_FOLDS == 3
    assert g["chosen"] == 25
    assert g["cv_f1"][0] > g["cv_f1"][1]
    # single-point grid (the bench default) records no grid block
    mm1 = train_match_model(dr, feature_cols=FEATS, num_trees=5)
    assert "grid" not in mm1.eval_metrics
