"""DSIR importance weights + distribution-drift metrics.

The catalog-vs-oracle gate (test_catalog_oracle.py) already pins all
four registered queries bit-for-bit against DuckDB at sf0.001; these
tests pin the SEMANTICS (weights actually separate the target domain,
PSI actually detects an injected shift and stays near zero without
one) and the scale-critical plan shapes (TakeOrderedAndProject for the
resampling top-k, broadcast joins for the vocabulary dim).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sressentials_spark.operators.curation import dsir_importance_weights
from sressentials_spark.operators.drift import histogram_drift
from sressentials_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


# --------------------------------------------------------------------------
# DSIR
# --------------------------------------------------------------------------


@pytest.fixture(scope="module")
def domain_docs(spark):
    # Two domains with disjoint-ish vocabularies: target talks about
    # spark, raw pool about cooking. 6 docs per domain.
    rows = []
    for i in range(6):
        rows.append((i, f"spark shuffle partition codegen broadcast join d{i}", "tgt"))
    for i in range(6):
        rows.append((6 + i, f"flour butter sugar oven whisk bake d{i}", "web"))
    # One pool doc that reads like the target domain — DSIR's job is to
    # pull exactly this one forward.
    rows.append((12, "spark shuffle broadcast join codegen partition", "web"))
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_dsir_separates_target_domain(domain_docs):
    w = dsir_importance_weights(domain_docs, target_source="tgt").toPandas()
    w = w.set_index("doc_id")
    tgt_like_pool_doc = w.loc[12]
    cooking = w[(w["source"] == "web") & (w.index != 12)]
    # The spark-flavored pool doc must outweigh every cooking doc...
    assert tgt_like_pool_doc["weight_micro"] > cooking["weight_micro"].max()
    # ...and be flagged target-like while the cooking docs are not.
    assert bool(tgt_like_pool_doc["target_like"])
    assert not cooking["target_like"].any()


def test_dsir_weight_is_token_count_weighted(spark):
    # Duplicating a doc's text doubles its weight exactly (weights are
    # integer micronat sums, so this is an equality, not approx).
    docs = spark.createDataFrame(
        [
            (0, "alpha beta", "tgt"),
            (1, "gamma delta", "web"),
            (2, "alpha beta alpha beta", "web"),
            (3, "alpha beta", "web"),
        ],
        "doc_id long, text string, source string",
    )
    w = (
        dsir_importance_weights(docs, target_source="tgt")
        .toPandas()
        .set_index("doc_id")["weight_micro"]
    )
    assert w.loc[2] == 2 * w.loc[3]


def test_dsir_topk_plan_is_take_ordered(spark):
    w = dsir_importance_weights(
        load_table(spark, SF, "documents"), target_source="src0"
    )
    plan = (
        w.orderBy(F.desc("weight_micro"), "doc_id")
        .limit(100)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan


def test_dsir_vocab_join_is_broadcast(spark):
    w = dsir_importance_weights(
        load_table(spark, SF, "documents"), target_source="src0"
    )
    plan = w._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


# --------------------------------------------------------------------------
# Drift
# --------------------------------------------------------------------------


def _mk_events(spark, cur_shift: float):
    # Reference cohort: values 0..99 uniform; current cohort shifted by
    # ``cur_shift``. One group.
    rows = [(float(v % 100), True) for v in range(400)]
    rows += [(float(v % 100) + cur_shift, False) for v in range(400)]
    return spark.createDataFrame(rows, "value double, is_ref boolean")


def test_drift_detects_injected_shift(spark):
    df = _mk_events(spark, cur_shift=300.0).withColumn("g", F.lit("m"))
    out = histogram_drift(
        df, split_expr="is_ref", group_col="g", value_col="value"
    ).toPandas()
    assert len(out) == 1
    row = out.iloc[0]
    assert row["psi"] > 0.25 and bool(row["drifted"])
    assert row["tvd"] > 0.5


def test_drift_near_zero_without_shift(spark):
    df = _mk_events(spark, cur_shift=0.0).withColumn("g", F.lit("m"))
    out = histogram_drift(
        df, split_expr="is_ref", group_col="g", value_col="value"
    ).toPandas()
    row = out.iloc[0]
    assert abs(row["psi"]) < 0.01 and not bool(row["drifted"])
    assert row["tvd"] < 0.01


def test_drift_extreme_values_clamp_to_edge_bins(spark):
    df = spark.createDataFrame(
        [(-50.0, True), (1e9, True), (-50.0, False), (1e9, False)],
        "value double, is_ref boolean",
    ).withColumn("g", F.lit("m"))
    out = histogram_drift(
        df, split_expr="is_ref", group_col="g", value_col="value"
    ).toPandas()
    row = out.iloc[0]
    # Identical cohorts after clamping: zero drift, nothing lost.
    assert row["n_ref"] == 2 and row["n_cur"] == 2
    assert row["psi"] == 0.0 and row["tvd"] == 0.0


def test_streaming_drift_matches_batch(spark):
    from sressentials_spark.catalog import QUERIES

    batch = QUERIES["audit_distribution_drift"](spark, SF).toPandas()
    stream = QUERIES["streaming_drift_monitor"](spark, SF).toPandas()
    b = batch.sort_values("event_type").reset_index(drop=True)
    s = stream.sort_values("event_type").reset_index(drop=True)
    assert b.equals(s)
