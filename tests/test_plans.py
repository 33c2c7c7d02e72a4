"""Physical-plan audits: the "is this the plan you'd want at 100x"
review as a regression gate.  No query here is executed — assertions
run on ``explain``-mode plan strings, so the whole module costs
planning time only.

What each invariant protects:

- **Column pruning** — a scan whose ReadSchema carries columns the
  query never touches re-reads them at every scale; at 100 TB the
  difference between a 2-column and a 5-column documents scan is the
  scan itself.
- **Predicate pushdown** — filters that reach the parquet reader
  (PushedFilters) skip row groups via min/max stats; filters that stay
  in the plan read everything first.
- **No Cartesian products** — every pair-generating join in the engine
  is equi-keyed (band/bucket/blockstring); a CartesianProduct node in
  any of them means a quadratic task appeared.  The only sanctioned
  BroadcastNestedLoopJoins are 1-row scalar attaches
  (``crossJoin(broadcast(total))`` — blocking.py:203, nameprob.py:165),
  which are constant-size at any scale.
- **Arrow, not row-at-a-time Python** — the feature stage's only
  Python is the NYSIIS/JW pandas UDF (ArrowEvalPython); a
  BatchEvalPython node means a ~10-100x slower per-row UDF crept in.
- **Catalyst-only preprocessing** — P1-P16 are native expressions; any
  Python eval node in the preprocess plan is a regression.
"""

from __future__ import annotations

import re

import pytest

from tests.conftest import SF_SMALL


def _plan(df, mode: str = "formatted") -> str:
    spark = df.sparkSession
    jm = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        mode)
    return df._jdf.queryExecution().explainString(jm)


def _read_schemas(plan: str) -> list[str]:
    return re.findall(r"ReadSchema: struct<([^>]*)>", plan)


@pytest.fixture(scope="module")
def plans(spark):
    """Every audited query planned exactly once (plan strings only —
    nothing executes)."""
    import __spark_entry__ as E
    from namematch_spark.operators import blocking as B
    qs = E.queries()
    out = {name: _plan(qs[name](spark, SF_SMALL))
           for name in ["doc_profile", "agg_pricing_summary",
                        "doc_minhash_lsh_banded", "doc_ngram_jaccard",
                        "doc_simhash", "emb_knn_lsh", "emb_near_dup",
                        "er_pair_features",
                        "er_preprocess", "join_nation_revenue"]}
    B.release_caches()
    return out


def test_doc_profile_prunes_and_stays_narrow(plans):
    p = plans["doc_profile"]
    schemas = _read_schemas(p)
    assert schemas, p
    cols = {c.split(":")[0] for c in schemas[0].split(",")}
    # documents has 5 columns; the profile needs exactly these two
    assert cols == {"doc_id", "text"}, cols
    # narrow projection: one stage, no shuffle
    assert "Exchange" not in p, p


def test_lineitem_filter_reaches_parquet(plans):
    p = plans["agg_pricing_summary"]
    assert re.search(r"PushedFilters:.*LessThanOrEqual\(l_shipdate", p), p
    # pruned scan: the 11-column table is read as the 6 used columns
    cols = {c.split(":")[0] for s in _read_schemas(p)
            for c in s.split(",")}
    assert "l_comment" not in cols and "l_orderkey" not in cols, cols


def test_pair_generating_plans_never_cartesian(plans):
    """Every candidate/pair join must stay equi-keyed: banded-LSH
    dedup, inverted-index Jaccard, hyperplane-LSH kNN, embedding
    near-dup, simhash blocks, ER candidate expansion + features."""
    # er_pair_features' plan CONTAINS the er_candidates subtree (pair
    # expansion plans on top of the candidate stream), so auditing it
    # covers both without building the blocking lineage twice
    for name in ["doc_minhash_lsh_banded", "doc_ngram_jaccard",
                 "doc_simhash", "emb_knn_lsh", "emb_near_dup",
                 "er_pair_features"]:
        assert "CartesianProduct" not in plans[name], \
            f"{name} plans a cross join"


def test_feature_stage_python_is_arrow_batched(plans):
    p = plans["er_pair_features"]
    # the NYSIIS/JW UDF rides Arrow batches over distinct value pairs
    assert "ArrowEvalPython" in p, p
    # a row-at-a-time Python UDF in the hot path is a 10-100x slowdown
    assert "BatchEvalPython" not in p, p


def test_preprocess_is_pure_catalyst(plans):
    p = plans["er_preprocess"]
    for node in ("ArrowEvalPython", "BatchEvalPython", "MapInPandas"):
        assert node not in p, f"preprocess plans {node}"
    # and it compiles into whole-stage-codegen spans (formatted mode
    # marks them "[codegen id : N]")
    assert "codegen id" in p, p


def test_dim_joins_broadcast_at_test_scale(plans):
    """The nation dim is hint-broadcast; customer/orders fit under the
    64m autoBroadcastJoinThreshold at this SF — no sort-merge should
    survive planning here (at 100 TB AQE re-decides per size, which is
    the point: nothing in the plan FORCES a shuffle join on a dim)."""
    p = plans["join_nation_revenue"]
    assert "BroadcastHashJoin" in p, p
    assert "CartesianProduct" not in p, p
