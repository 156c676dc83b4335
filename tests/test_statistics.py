"""Semantics tests for the round-7 statistical / mining operators — the
properties the DuckDB value oracle can't state (internal invariants, bound
checks, cross-operator consistency)."""

from __future__ import annotations

import math

import pyspark.sql.functions as F

from big_data_medical_analysis_spark import registry

QS = registry.queries()


def test_corr_matches_numpy_reference(spark, sf_dir):
    """The exact-sums Pearson r must equal numpy's corrcoef on the same
    rows (double tolerance — numpy accumulates differently)."""
    import numpy as np

    from big_data_medical_analysis_spark.sources.readers import read_table

    out = {
        r["l_returnflag"]: r["corr_qty_price"]
        for r in QS["corr_covar_price_qty"](spark, sf_dir).collect()
    }
    li = (
        read_table(spark, sf_dir, "lineitem")
        .select("l_returnflag", "l_quantity", "l_extendedprice")
        .toPandas()
    )
    for flag, grp in li.groupby("l_returnflag"):
        q = grp["l_quantity"].to_numpy()
        p = np.round(grp["l_extendedprice"].to_numpy() * 100)
        ref = np.corrcoef(q, p)[0, 1]
        assert abs(out[flag] - ref) < 1e-6


def test_regr_r2_in_unit_interval_and_slope_consistent(spark, sf_dir):
    rows = QS["regr_price_date_trend"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r["r2"] <= 1.0
        assert r["regr_n"] > 0
        # intercept = avgy - slope*avgx (both sides in dollars)
        assert abs(
            r["intercept"] - (r["regr_avgy"] - r["slope_cents_per_day"] * r["regr_avgx"] / 100.0)
        ) < 0.01


def test_median_mode_order_statistics(spark, sf_dir):
    """Median/percentiles bracket correctly and the mode is the true
    smallest argmax of the quantity histogram."""
    from big_data_medical_analysis_spark.sources.readers import read_table

    out = {r["l_returnflag"]: r for r in QS["median_mode_quantity"](spark, sf_dir).collect()}
    li = read_table(spark, sf_dir, "lineitem").select("l_returnflag", "l_quantity").toPandas()
    for flag, grp in li.groupby("l_returnflag"):
        q = sorted(int(v) for v in grp["l_quantity"])
        r = out[flag]
        assert r["p25_disc"] <= r["median_qty"] <= r["p75_cont"]
        counts: dict[int, int] = {}
        for v in q:
            counts[v] = counts.get(v, 0) + 1
        mc = max(counts.values())
        assert r["mode_qty"] == min(v for v, c in counts.items() if c == mc)


def test_entropy_bounded_by_log_types(spark, sf_dir):
    rows = QS["event_label_entropy"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert -1e-9 <= r["entropy_bits"] <= math.log2(r["n_types"]) + 1e-9


def test_forward_asof_direction_and_ties(spark, sf_dir):
    """Every matched next event is AT OR AFTER its order (>= semantics),
    and unmatched probes survive as NULLs (left join, not inner)."""
    df = QS["order_next_event_asof"](spark, sf_dir)
    assert df.filter(F.col("wait_us") < 0).count() == 0
    # the probe set is every order of users < 150 — none drop
    from big_data_medical_analysis_spark.sources.readers import read_table

    n_probes = (
        read_table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 150).count()
    )
    assert df.count() == n_probes


def test_per_group_downsample_exact_counts(spark, sf_dir):
    """Exactly min(25, group size) docs survive per source, all distinct."""
    from big_data_medical_analysis_spark.sources.readers import read_table

    out = QS["per_group_downsample"](spark, sf_dir)
    kept = {r["source"]: r["n"] for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    sizes = {
        r["source"]: r["n"]
        for r in read_table(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert set(kept) == set(sizes)
    for src, n in sizes.items():
        assert kept[src] == min(25, n)
    assert out.select("doc_id").distinct().count() == out.count()


def test_copurchase_support_bounded_by_order_count(spark, sf_dir):
    """Pair support can never exceed either brand's own order count."""
    from big_data_medical_analysis_spark.sources.readers import read_table

    pairs = QS["copurchase_brand_pairs"](spark, sf_dir)
    li = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    part = read_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    per_brand = {
        r["b"]: r["n"]
        for r in li.join(part, li["l_partkey"] == part["p_partkey"])
        .select(F.col("l_orderkey").alias("ok"), F.col("p_brand").alias("b"))
        .distinct()
        .groupBy("b")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    for r in pairs.collect():
        assert r["n_orders"] <= min(per_brand[r["brand_a"]], per_brand[r["brand_b"]])
        assert r["brand_a"] < r["brand_b"]


def test_posting_list_sorted_and_df_consistent(spark, sf_dir):
    """Each posting list is strictly increasing and its length equals df."""
    for r in QS["posting_list_index"](spark, sf_dir).collect():
        ids = [int(x) for x in r["postings"].split(",")]
        assert len(ids) == r["df"]
        assert ids == sorted(set(ids))


def test_lexical_diversity_bounds(spark, sf_dir):
    rows = QS["doc_lexical_diversity"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 1 <= r["n_types"] <= r["n_tokens"]
        assert 0.0 < r["ttr"] <= 1.0
        if r["simpson"] is not None:
            assert -1e-9 <= r["simpson"] <= 1.0 + 1e-9


def test_kaplan_meier_life_table_invariants(spark, sf_dir):
    """Life-table algebra: the first row's at-risk count equals the cohort
    size (every signup user), at-risk telescopes exactly (r_next =
    r_prev - events - censored, across duration gaps too), survival is
    monotone non-increasing from <=1.0, and the product-limit estimate
    matches an independent Python recompute of prod(1 - e/r) at every
    row (0.0 exactly on full depletion)."""
    from big_data_medical_analysis_spark.operators.statistics import (
        kaplan_meier_signup_to_purchase,
    )
    from big_data_medical_analysis_spark.sources.readers import read_table

    rows = sorted(
        kaplan_meier_signup_to_purchase(spark, sf_dir).collect(),
        key=lambda r: r.duration_days,
    )
    ev = read_table(spark, sf_dir, "events")
    cohort = (
        ev.filter(F.col("event_type") == "signup")
        .select("user_id")
        .distinct()
        .count()
    )
    assert rows[0].n_at_risk == cohort
    for prev, cur in zip(rows, rows[1:]):
        assert cur.n_at_risk == prev.n_at_risk - prev.n_event - prev.n_censored
    surv = 1.0
    for r in rows:
        surv *= 1.0 - r.n_event / r.n_at_risk
        assert abs(r.survival - round(surv, 6)) <= 2e-6
    vals = [r.survival for r in rows]
    assert vals == sorted(vals, reverse=True) and vals[0] <= 1.0


def test_logrank_exchangeable_arms_and_algebra(spark, sf_dir):
    """The md5 arm split is exchangeable by construction, so the log-rank
    statistic must be far below the 3.84 rejection bound; arm sizes
    partition the signup cohort; and observed events per arm equal the
    arm's purchase-converter count (the statistic's O column is an exact
    integer, not an estimate)."""
    from big_data_medical_analysis_spark.operators.statistics import (
        logrank_test_by_arm,
    )
    from big_data_medical_analysis_spark.sources.readers import read_table

    r = logrank_test_by_arm(spark, sf_dir).collect()[0]
    ev = read_table(spark, sf_dir, "events")
    cohort = (
        ev.filter(F.col("event_type") == "signup")
        .select("user_id")
        .distinct()
        .count()
    )
    assert r.n_a + r.n_b == cohort
    assert 0.0 <= r.logrank_chi2 < 3.84
    assert 0 <= r.observed_b <= r.n_b
    assert 0.0 <= r.expected_b <= cohort
