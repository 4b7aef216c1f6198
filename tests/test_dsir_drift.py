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


# --------------------------------------------------------------------------
# Unigram log-loss (perplexity filter)
# --------------------------------------------------------------------------


def test_unigram_logloss_orders_fluency(spark):
    from sressentials_spark.operators.curation import unigram_logloss

    # Doc 0 repeats the corpus's dominant words; doc 1 is all hapaxes.
    docs = spark.createDataFrame(
        [
            (0, "the the the cat cat"),
            (1, "zyx qwv jkl mnp rst"),
            (2, "the cat the cat the"),
        ],
        "doc_id long, text string",
    )
    out = unigram_logloss(docs).toPandas().set_index("doc_id")
    assert out.loc[0, "avg_nll_micro"] < out.loc[1, "avg_nll_micro"]
    # The rare-token doc is worse than uniform-over-vocab -> dropped.
    assert not bool(out.loc[1, "keep"])
    assert bool(out.loc[0, "keep"]) and bool(out.loc[2, "keep"])


# --------------------------------------------------------------------------
# Unicode clean/normalize
# --------------------------------------------------------------------------


def test_clean_normalize_folds_nfc_and_controls(spark):
    from sressentials_spark.operators.text import clean_normalize

    decomposed = "cafe\u0301"    # e + combining acute
    precomposed = "caf\u00e9"   # precomposed e-acute
    docs = spark.createDataFrame(
        [
            (0, decomposed),
            (1, precomposed),
            (2, "a\x00b\t\tc   d "),
            (3, "already clean"),
        ],
        "doc_id long, text string",
    )
    out = clean_normalize(docs).toPandas().set_index("doc_id")
    # NFC folds both spellings to one byte form -> identical hashes.
    assert out.loc[0, "cleaned"] == out.loc[1, "cleaned"] == "caf\u00e9"
    assert out.loc[0, "cleaned_md5"] == out.loc[1, "cleaned_md5"]
    assert bool(out.loc[0, "changed"]) and not bool(out.loc[1, "changed"])
    # Controls become separators; whitespace runs collapse; ends trim.
    assert out.loc[2, "cleaned"] == "a b c d"
    assert not bool(out.loc[3, "changed"])


def test_clean_normalize_matches_duckdb_on_unicode(spark):
    """The registered query's oracle only sees the ASCII sf corpus;
    this pins the NFC path itself against DuckDB on non-ASCII rows."""
    import duckdb

    from sressentials_spark.operators.text import (
        clean_normalize,
        clean_normalize_oracle_sql,
    )

    rows = [
        (0, "café du   monde"),
        (1, "caf\u00e9 du monde"),
        (2, "Å ring \x1f andÅ more"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = (
        clean_normalize(docs)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, ?)" for i, _ in rows)
        + ") t(doc_id, text)",
        [t for _, t in rows],
    )
    want = (
        con.execute(clean_normalize_oracle_sql())
        .fetchdf()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con.close()
    for c in ["cleaned", "cleaned_md5", "n_chars_clean", "changed"]:
        assert list(got[c]) == list(want[c]), c


def test_drift_trend_localizes_shift(spark):
    from sressentials_spark.operators.drift import histogram_drift_trend

    # Reference: uniform 0..99. Day 1 matches it, day 2 is shifted.
    rows = [(float(v % 100), True, 0) for v in range(400)]
    rows += [(float(v % 100), False, 1) for v in range(200)]
    rows += [(float(v % 100) + 300.0, False, 2) for v in range(200)]
    df = spark.createDataFrame(
        rows, "value double, is_ref boolean, day int"
    ).withColumn("g", F.lit("m"))
    out = (
        histogram_drift_trend(
            df,
            split_expr="is_ref",
            trend_expr="day",
            group_col="g",
            value_col="value",
        )
        .toPandas()
        .set_index("bucket")
    )
    assert len(out) == 2
    # Laplace smoothing with unequal cohort sizes (400 ref vs 200 cur)
    # leaves a small positive floor; well under the 0.25 alarm.
    assert not bool(out.loc[1, "drifted"]) and out.loc[1, "psi"] < 0.05
    assert bool(out.loc[2, "drifted"]) and out.loc[2, "psi"] > 0.25
    # Both days compare against the same 400-row reference.
    assert set(out["n_ref"]) == {400} and set(out["n_cur"]) == {200}


def test_drift_null_metric_values_are_dropped(spark):
    # One shared NULL gate (bin_cohorts): a NULL metric value must not
    # be clamped into bin 0 by the batch path while the streaming twin
    # drops it — all paths drop it.
    df = spark.createDataFrame(
        [(10.0, True), (None, True), (10.0, False), (None, False)],
        "value double, is_ref boolean",
    ).withColumn("g", F.lit("m"))
    out = histogram_drift(
        df, split_expr="is_ref", group_col="g", value_col="value"
    ).toPandas()
    row = out.iloc[0]
    assert row["n_ref"] == 1 and row["n_cur"] == 1
    assert row["psi"] == 0.0 and not bool(row["drifted"])


def test_drift_huge_cohorts_exact_no_bigint_wrap(spark):
    # Regression for the r8 advice item: the PSI numerator is
    # O(n_ref * n_cur * lr_micro); with ~1e11-per-bin counts the old
    # BIGINT accumulation wrapped silently (a alone is ~1e24). The
    # DECIMAL(38,0) path must agree with an exact big-int Python fold.
    import math
    from fractions import Fraction

    from sressentials_spark.operators.drift import (
        DRIFT_LR_SCALE,
        drift_from_counts,
    )

    n_bins = 10
    c_ref = [int(1e11) + 7 * i for i in range(n_bins)]
    c_cur = [int(1e11) + 13 * (n_bins - i) ** 2 for i in range(n_bins)]
    counts = spark.createDataFrame(
        [("g", i, c_ref[i], c_cur[i]) for i in range(n_bins)],
        "grp string, bin long, c_ref long, c_cur long",
    )
    out = drift_from_counts(counts, group_col="g", n_bins=n_bins).toPandas()
    assert len(out) == 1
    row = out.iloc[0]

    n_ref, n_cur = sum(c_ref), sum(c_cur)
    psi_num = 0
    for i in range(n_bins):
        a = (c_ref[i] + 1) * (n_cur + n_bins) - (c_cur[i] + 1) * (n_ref + n_bins)
        # The cross products themselves (~1e23) are what wrapped in the
        # old all-BIGINT path, long before the (cancelling) difference.
        assert (c_ref[i] + 1) * (n_cur + n_bins) > 2**63
        lr = round(
            math.log(
                ((c_ref[i] + 1) * (n_cur + n_bins))
                / ((c_cur[i] + 1) * (n_ref + n_bins))
            )
            * DRIFT_LR_SCALE
        )
        psi_num += a * lr
    d = (n_ref + n_bins) * (n_cur + n_bins)
    expected_psi = float(psi_num) / float(d) / DRIFT_LR_SCALE
    assert row["n_ref"] == n_ref and row["n_cur"] == n_cur
    # psi_num ~ 1e26 > 2**53: the double is within 1 ulp of the exact
    # rational; the DRIFTED boolean is decided in exact integer space.
    assert math.isclose(row["psi"], expected_psi, rel_tol=1e-12)
    exact_drifted = Fraction(psi_num, d * DRIFT_LR_SCALE) >= Fraction(1, 4)
    assert bool(row["drifted"]) == exact_drifted
