"""Property tests for the closing round-10 additions: exact distributed
ROC-AUC, WOE/IV encoding, BM25 ranking, reciprocal-rank fusion, and RFM
segmentation.

The oracle harness value-checks each at sf0.01; these pin the invariants a
value hash can't express (the AUC controls' known positions, WOE's
signal/null separation, BM25 membership semantics, RRF's closed-form
score, RFM partition-of-customers and score ranges).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_medical_analysis_spark.operators.analytics import (
    rfm_customer_segments,
)
from big_data_medical_analysis_spark.operators.statistics import (
    auc_mann_whitney,
    woe_iv_encoding,
)
from big_data_medical_analysis_spark.operators.text_analysis import (
    BM25_TERMS,
    BM25_TOP_K,
    RRF_K,
    RRF_POOL,
    RRF_TOP_K,
    bm25_doc_ranking,
    rrf_fusion_ranking,
)
from big_data_medical_analysis_spark.sources.readers import read_table


def test_auc_controls_sit_where_the_math_says(spark, sf_dir):
    """The indicator scorer IS the label: AUC = 1.0 exactly. The two
    label-independent scorers (full-resolution and tie-heavy coarse) sit
    near 0.5; the +25M-cent shifted scorer separates strictly better than
    both but short of perfection. Class totals agree across scorers."""
    rows = {r.scorer: r for r in auc_mann_whitney(spark, sf_dir).collect()}
    assert set(rows) == {"indicator", "price_null", "price_coarse", "price_shifted"}
    assert rows["indicator"].auc == 1.0
    for null_scorer in ("price_null", "price_coarse"):
        assert 0.4 < rows[null_scorer].auc < 0.6
    assert rows["price_shifted"].auc > max(
        rows["price_null"].auc, rows["price_coarse"].auc
    )
    assert rows["price_shifted"].auc < 1.0
    n = {(r.n_pos, r.n_neg) for r in rows.values()}
    assert len(n) == 1  # same label split under every scorer


def test_auc_indicator_matches_exact_pair_count(spark, sf_dir):
    """For the indicator scorer the U statistic is n_pos*n_neg exactly
    (every positive outranks every negative, no cross-class ties) — pins
    the two-level prefix-sum numerator against the closed form."""
    r = {x.scorer: x for x in auc_mann_whitney(spark, sf_dir).collect()}["indicator"]
    orders = read_table(spark, sf_dir, "orders")
    n_pos = orders.filter(F.col("o_orderstatus") == "F").count()
    assert r.n_pos == n_pos
    assert r.n_neg == orders.count() - n_pos


def test_woe_null_feature_flat_signal_feature_separates(spark, sf_dir):
    """The priority feature is independent of the price label: every
    value's |WOE| stays small and the feature IV (Σ iv_term) is ~0. The
    price-band feature is a deterministic function of the label's source
    quantity: its IV dominates by orders of magnitude. iv_term is always
    >= 0 up to rounding (x·ln(x/y) with x,y shares)."""
    rows = woe_iv_encoding(spark, sf_dir).collect()
    iv = {}
    for r in rows:
        iv[r.feature] = iv.get(r.feature, 0.0) + r.iv_term
        assert r.iv_term >= -1e-6
    assert set(iv) == {"priority", "price_band"}
    assert iv["priority"] < 0.05  # sf0.001 sampling noise ~0.02
    assert iv["price_band"] > 10 * max(iv["priority"], 1e-9)
    prio_woe = [abs(r.woe) for r in rows if r.feature == "priority"]
    assert max(prio_woe) < 0.5


def test_bm25_rows_hit_probe_terms_and_scores_positive(spark, sf_dir):
    """Every returned doc contains >= 1 probe term (n_terms_hit in 1..3),
    scores are positive (BM25+ idf is never negative), and the result is
    capped at the top-k."""
    rows = bm25_doc_ranking(spark, sf_dir).collect()
    assert 0 < len(rows) <= BM25_TOP_K
    docs = {
        r.doc_id: r.text
        for r in read_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id").isin([r.doc_id for r in rows]))
        .collect()
    }
    for r in rows:
        assert 1 <= r.n_terms_hit <= len(BM25_TERMS)
        assert r.score > 0
        toks = set(docs[r.doc_id].split(" "))
        assert sum(t in toks for t in BM25_TERMS) == r.n_terms_hit


def test_rrf_score_is_the_closed_form_of_its_ranks(spark, sf_dir):
    """rrf_score recomputes exactly from the reported ranks (1/(k+rank_a)
    + 1/(k+rank_b), absent side contributing 0); ranks stay within the
    candidate pool; at least one doc appears in both rankers' pools."""
    rows = rrf_fusion_ranking(spark, sf_dir).collect()
    assert 0 < len(rows) <= RRF_TOP_K
    both = 0
    for r in rows:
        expect = 0.0
        if r.rank_a is not None:
            assert 1 <= r.rank_a <= RRF_POOL
            expect += 1.0 / (RRF_K + r.rank_a)
        if r.rank_b is not None:
            assert 1 <= r.rank_b <= RRF_POOL
            expect += 1.0 / (RRF_K + r.rank_b)
        both += int(r.rank_a is not None and r.rank_b is not None)
        assert abs(r.rrf_score - expect) < 1e-6
    assert both >= 1


def test_rfm_segments_partition_customers_scores_in_range(spark, sf_dir):
    """Segment counts partition the customer dimension exactly; every
    segment code decodes to three scores in 1..4; per-segment averages
    respect the metric bounds (recency >= 0, frequency >= 1)."""
    rows = rfm_customer_segments(spark, sf_dir).collect()
    n_cust = (
        read_table(spark, sf_dir, "orders")
        .select("o_custkey")
        .distinct()
        .count()
    )
    assert sum(r.n_customers for r in rows) == n_cust
    for r in rows:
        rs, fs, ms = r.segment // 100, (r.segment // 10) % 10, r.segment % 10
        assert 1 <= rs <= 4 and 1 <= fs <= 4 and 1 <= ms <= 4
        assert r.avg_recency_days >= 0
        assert r.avg_frequency >= 1
        assert r.avg_monetary > 0


def test_gini_matches_independent_rank_sum_recompute(spark, sf_dir):
    """Per segment: total_revenue equals the direct per-customer revenue
    sum, and gini equals an independent Python recompute of
    (2*Σ rank·x − (n+1)·Σx)/(n·Σx) over the sorted values."""
    from big_data_medical_analysis_spark.operators.statistics import (
        gini_customer_concentration,
    )

    rows = {r.segment: r for r in gini_customer_concentration(spark, sf_dir).collect()}
    orders = read_table(spark, sf_dir, "orders")
    customer = read_table(spark, sf_dir, "customer")
    percust = (
        orders.join(
            customer.select("c_custkey", "c_mktsegment"),
            orders["o_custkey"] == customer["c_custkey"],
        )
        .groupBy("o_custkey", "c_mktsegment")
        .agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("v"))
        .collect()
    )
    by_seg: dict[str, list[int]] = {}
    for r in percust:
        by_seg.setdefault(r.c_mktsegment, []).append(r.v)
    assert set(by_seg) == set(rows)
    for seg, vals in by_seg.items():
        vals.sort()
        n, s = len(vals), sum(vals)
        t = sum((i + 1) * v for i, v in enumerate(vals))
        gini = (2.0 * t - (n + 1.0) * s) / (n * 1.0 * s)
        assert rows[seg].n == n
        assert abs(rows[seg].total_revenue - s / 100) < 1e-6
        assert abs(rows[seg].gini - round(gini, 6)) < 2e-6
        assert 0.0 <= rows[seg].gini < 1.0


def test_ndcg_matches_independent_recompute(spark, sf_dir):
    """DCG/IDCG/NDCG recompute exactly in Python from the per-doc probe
    stats (same grades, same ranker orderings, same 1e-12 quantization);
    NDCG stays in (0, 1]."""
    import math

    from big_data_medical_analysis_spark.operators.text_analysis import (
        NDCG_K,
        NDCG_Q,
        _bm25_perdoc,
        _bm25_scored,
        ndcg_retrieval_eval,
    )

    res = {r.ranker: r for r in ndcg_retrieval_eval(spark, sf_dir).collect()}
    assert set(res) == {"bm25", "density"}
    perdoc = _bm25_perdoc(spark, sf_dir)
    scored = {
        r.doc_id: (r.n_terms_hit, r.score)
        for r in _bm25_scored(perdoc).collect()
    }
    density = {
        r.doc_id: (r.dl, sum(r[f"tf_{t}"] for t in BM25_TERMS))
        for r in perdoc.collect()
    }

    def dcg_q(ranked):  # [(grade, rank)] -> quantized dcg
        return sum(
            math.floor((2.0 ** g - 1.0) / math.log2(rk + 1.0) * NDCG_Q)
            for g, rk in ranked
        )

    def top(pairs):  # [(sort_key, grade)] desc by (s, -doc) -> graded ranks
        best = sorted(pairs, key=lambda p: (-p[0][0], p[0][1]))[:NDCG_K]
        return [(g, i + 1) for i, ((_, _), g) in enumerate(best)]

    a = top([((s, d), g) for d, (g, s) in scored.items()])
    b = top(
        [((tf / dl, d), scored[d][0]) for d, (dl, tf) in density.items()]
    )
    ideal = top([((float(g), d), g) for d, (g, _) in scored.items()])
    iq = dcg_q(ideal)
    for name, ranked in (("bm25", a), ("density", b)):
        q = dcg_q(ranked)
        assert abs(res[name].dcg - q / NDCG_Q) < 1e-9
        assert abs(res[name].idcg - iq / NDCG_Q) < 1e-9
        assert abs(res[name].ndcg - round(q / iq, 6)) < 2e-6
        assert 0.0 < res[name].ndcg <= 1.0


def test_acf_null_series_flat_and_planted_period_detected(spark, sf_dir):
    """The uniform synthetic daily series is the null case: |acf| small at
    every lag, n_days shrinking with lag (overlap window). A planted
    period-7 series run through the SAME power-sum arithmetic scores
    acf[7] near 1 — the machinery detects periodicity when it exists."""
    from big_data_medical_analysis_spark.operators.analytics import (
        ACF_MAX_LAG,
        daily_revenue_autocorr,
    )

    rows = {r.lag: r for r in daily_revenue_autocorr(spark, sf_dir).collect()}
    assert set(rows) == set(range(1, ACF_MAX_LAG + 1))
    n_days_total = (
        read_table(spark, sf_dir, "orders")
        .select(F.to_date("o_orderdate"))
        .distinct()
        .count()
    )
    for lag in range(1, ACF_MAX_LAG + 1):
        assert abs(rows[lag].acf) < 0.2  # null series (sf0.001 noise)
        # pairs exist only where BOTH endpoints are observed days — the
        # sparse sf0.001 axis has gaps, so <=, not ==
        assert 0 < rows[lag].n_days <= n_days_total

    # planted period-7 control through the same arithmetic in Python
    vals = [100 + (50 if d % 7 == 0 else 0) for d in range(200)]
    def acf(series, lag):
        xs, ys = series[:-lag], series[lag:]
        n = len(xs)
        sx, sy = sum(xs), sum(ys)
        sxx = sum(v * v for v in xs)
        syy = sum(v * v for v in ys)
        sxy = sum(a * b for a, b in zip(xs, ys))
        return (n * sxy - sx * sy) / (
            (n * sxx - sx * sx) ** 0.5 * (n * syy - sy * sy) ** 0.5
        )
    assert acf(vals, 7) > 0.95
    assert abs(acf(vals, 3)) < 0.3


def test_blocking_audit_counts_consistent_and_recall_in_scurve_band(spark, sf_dir):
    """caught <= min(truth, candidates) <= all_pairs; recall/precision/
    reduction recompute from the counts; recall sits in the banding
    S-curve's plausible band for J >= 0.8 with 4x4 geometry (>= the
    single-threshold lower bound 0.85, well above the J=0.7 knee)."""
    from big_data_medical_analysis_spark.operators.dedup import (
        lsh_blocking_quality_audit,
    )

    r = lsh_blocking_quality_audit(spark, sf_dir).collect()[0]
    assert r.n_caught <= r.n_truth
    assert r.n_caught <= r.n_candidates
    assert r.n_candidates <= r.n_all_pairs
    assert abs(r.recall - round(r.n_caught / r.n_truth, 6)) < 1e-9
    assert abs(r.precision - round(r.n_caught / r.n_candidates, 6)) < 1e-9
    assert (
        abs(r.reduction_ratio - round(1 - r.n_candidates / r.n_all_pairs, 6))
        < 1e-9
    )
    assert 0.85 <= r.recall <= 1.0


def test_l_diversity_consistent_with_k_anonymity_groups(spark, sf_dir):
    """Same QI lattice as the k-anonymity audit: group count matches; the
    minimum distinct-sensitive count is within [1, 3] (3-value domain);
    rows at risk is 0 iff no group falls below l."""
    from big_data_medical_analysis_spark.operators.quality import (
        k_anonymity_audit,
        l_diversity_audit,
    )

    ld = l_diversity_audit(spark, sf_dir).collect()[0]
    ka = k_anonymity_audit(spark, sf_dir).collect()[0]
    assert ld.n_groups == ka.n_groups
    assert 1 <= ld.min_distinct_sensitive <= 3
    assert (ld.n_rows_at_risk == 0) == (ld.n_groups_below_l == 0)
    assert ld.n_groups_below_l <= ld.n_groups


def test_rolling_median_window_bounds_and_spike_robustness(spark, sf_dir):
    """Window counts stay within [1, 7]; every median equals a Python
    recompute over the trailing observed days (exact lower-median
    percentile_disc semantics)."""
    from big_data_medical_analysis_spark.operators.analytics import (
        ROLLMED_WINDOW,
        rolling_median_revenue,
    )

    rows = rolling_median_revenue(spark, sf_dir).collect()
    daily = {
        r.day: r.r
        for r in read_table(spark, sf_dir, "orders")
        .groupBy(
            F.floor(F.unix_timestamp(F.to_date("o_orderdate")) / 86400)
            .cast("long")
            .alias("day")
        )
        .agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("r"))
        .collect()
    }
    import datetime

    for r in rows:
        d = datetime.date.fromisoformat(r.day)
        day_idx = (d - datetime.date(1970, 1, 1)).days
        vals = sorted(
            daily[k]
            for k in daily
            if day_idx - (ROLLMED_WINDOW - 1) <= k <= day_idx
        )
        assert 1 <= r.n_days_in_window <= ROLLMED_WINDOW
        assert len(vals) == r.n_days_in_window
        # percentile_disc(0.5) = smallest value with cume_dist >= 0.5
        med = vals[(len(vals) - 1) // 2]
        assert abs(r.median_revenue - med / 100) < 1e-6


def test_weight_below_matches_brute_force_on_random_inputs(spark):
    """The two-level prefix-sum helper (shared by the AUC and Gini
    queries) equals the O(n²) brute force — Σ weight over same-group rows
    with strictly smaller order — on hypothesis-random inputs spanning
    multiple groups, duplicate (group, order) cells (the integral-order
    RANGE frame must exclude ALL ties, not a row-position-dependent
    subset), zero weights, and bucket boundaries."""
    from hypothesis import given, settings, strategies as st

    from big_data_medical_analysis_spark.operators.common import weight_below

    @settings(max_examples=12, deadline=None)
    @given(
        st.lists(
            st.tuples(
                st.sampled_from(["g1", "g2"]),
                st.integers(min_value=-20, max_value=20),  # order value
                st.integers(min_value=0, max_value=5),  # weight
            ),
            min_size=1,
            max_size=25,
        )
    )
    def check(rows):
        # raw rows, duplicates INCLUDED — the RANGE frame handles ties
        data = [
            (g, v, wgt, v // 7)  # bucket width 7, negatives cross 0
            for g, v, wgt in rows
        ]
        df = spark.createDataFrame(
            data, "grp string, val long, wgt long, bucket long"
        )
        got = sorted(
            (r.grp, r.val, r.wgt, r.below)
            for r in weight_below(df, ["grp"], "val", "wgt").collect()
        )
        want = sorted(
            (
                g,
                v,
                wgt,
                sum(w2 for g2, v2, w2 in rows if g2 == g and v2 < v),
            )
            for g, v, wgt in rows
        )
        assert got == want

    check()


def test_weight_below_string_order_path_on_distinct_cells(spark):
    """The non-numeric order-key path (ROWS frame — the SNM sort-key
    shape) matches the brute force on DISTINCT (group, order) cells,
    the contract that path documents and its callers guarantee via
    groupBy/distinct on the key — on hypothesis-random ASCII keys with
    first-char coarse buckets (exactly the SNM caller shape), including
    single-char keys, shared prefixes, and empty buckets."""
    from hypothesis import given, settings, strategies as st

    from big_data_medical_analysis_spark.operators.common import weight_below

    key_st = st.text(
        alphabet="abcdxyz", min_size=1, max_size=6
    )

    @settings(max_examples=8, deadline=None)
    @given(
        st.dictionaries(key_st, st.integers(min_value=0, max_value=5),
                        min_size=1, max_size=15)
    )
    def check(cells):
        data = [(k, w, k[:1]) for k, w in cells.items()]
        df = spark.createDataFrame(data, "k string, wgt long, bucket string")
        got = {
            r.k: r.below for r in weight_below(df, [], "k", "wgt").collect()
        }
        want = {
            k: sum(w2 for k2, w2 in cells.items() if k2 < k) for k in cells
        }
        assert got == want

    check()


def test_row_observation_reconciles_with_direct_aggregate(spark, sf_dir):
    """The in-flight Observation's metrics (riding the query's own
    execution) reconcile exactly with a direct aggregate over the same
    frame — count, null tally, and integer-cents sum."""
    from big_data_medical_analysis_spark.operators.quality import (
        with_row_observation,
    )

    ev = read_table(spark, sf_dir, "events")
    observed, obs = with_row_observation(ev)
    n_acted = observed.count()  # the action the metrics ride on
    got = obs.get
    direct = ev.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(
            sum(
                F.when(F.col(c).isNull(), 1).otherwise(0) for c in ev.columns
            )
        ).cast("long").alias("n_nulls"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("value_cents"),
    ).collect()[0]
    assert got["n_rows"] == n_acted == direct.n_rows
    assert got["n_nulls"] == direct.n_nulls
    assert got["value_cents"] == direct.value_cents


def test_clustering_coeff_consistent_with_triangle_query(spark, sf_dir):
    """Edge and triangle counts agree with triangle_count_brand_graph
    (same derivation); wedges recompute from an independent degree count;
    C stays in [0, 1] and equals the closed form."""
    from big_data_medical_analysis_spark.operators.analytics import (
        brand_graph_clustering_coeff,
        triangle_count_brand_graph,
    )

    c = brand_graph_clustering_coeff(spark, sf_dir).collect()[0]
    t = triangle_count_brand_graph(spark, sf_dir).collect()[0]
    assert c.n_edges == t.n_edges
    assert c.n_triangles == t.n_triangles
    assert 0 <= c.global_clustering <= 1
    assert abs(
        c.global_clustering - round(3.0 * c.n_triangles / c.n_wedges, 6)
    ) < 1e-9
    # every triangle contributes 3 wedges, so wedges >= 3*triangles
    assert c.n_wedges >= 3 * c.n_triangles


def test_release_gate_rows_agree_with_standalone_audits(spark, sf_dir):
    """Each gate row's metric equals its standalone audit's number, and
    `passed` is exactly metric <= threshold — including any honest FAIL
    rows (the gate must not paint failing audits green)."""
    from big_data_medical_analysis_spark.operators.quality import (
        dq_release_gate,
        k_anonymity_audit,
        l_diversity_audit,
        orders_dq_checks,
    )

    rows = {r.gate: r for r in dq_release_gate(spark, sf_dir).collect()}
    assert set(rows) == {"constraints_clean", "k_anonymity", "l_diversity"}
    dq_total = sum(
        r.n_violations for r in orders_dq_checks(spark, sf_dir).collect()
    )
    assert rows["constraints_clean"].metric == dq_total
    assert (
        rows["k_anonymity"].metric
        == k_anonymity_audit(spark, sf_dir).collect()[0].n_groups_below_k
    )
    assert (
        rows["l_diversity"].metric
        == l_diversity_audit(spark, sf_dir).collect()[0].n_groups_below_l
    )
    for r in rows.values():
        assert r.passed == (r.metric <= r.threshold)
    assert rows["constraints_clean"].passed  # clean synthetic data


def test_gini_and_auc_cells_spread_across_buckets(spark, sf_dir):
    """The two-level machinery only beats a per-group global window when
    values actually SPREAD across coarse buckets — pin >= 8 distinct
    buckets for the Gini LTV cells and for the AUC full-resolution
    scorer's cells (a too-wide width silently degenerates level 2 to one
    bucket; the original Gini setting did exactly that)."""
    from big_data_medical_analysis_spark.operators.statistics import (
        AUC_BUCKET_W,
        GINI_BUCKET_W,
    )

    orders = read_table(spark, sf_dir, "orders")
    customer = read_table(spark, sf_dir, "customer")
    ltv_buckets = (
        orders.join(customer, orders["o_custkey"] == customer["c_custkey"])
        .groupBy("o_custkey")
        .agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("v"))
        .select((F.col("v") / GINI_BUCKET_W).cast("long").alias("b"))
        .distinct()
        .count()
    )
    assert ltv_buckets >= 8
    score_buckets = (
        orders.select(
            (F.round(F.col("o_totalprice") * 100).cast("long") / AUC_BUCKET_W)
            .cast("long")
            .alias("b")
        )
        .distinct()
        .count()
    )
    assert score_buckets >= 8


def test_jackknife_se_matches_python_rederivation(spark, sf_dir):
    """SE recomputes exactly in Python from the same per-group exact sums
    (identical quantization path); mean matches the direct global mean;
    SE is positive and, for ~uniform data, well under 2% of the mean."""
    import math

    from big_data_medical_analysis_spark.operators.statistics import (
        jackknife_mean_se,
    )

    r = jackknife_mean_se(spark, sf_dir).collect()[0]
    orders = read_table(spark, sf_dir, "orders")
    customer = read_table(spark, sf_dir, "customer")
    groups = (
        orders.join(
            customer.select("c_custkey", "c_nationkey"),
            orders["o_custkey"] == customer["c_custkey"],
        )
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("s"),
        )
        .collect()
    )
    n_all = sum(x.n for x in groups)
    s_all = sum(x.s for x in groups)
    tq = [
        math.floor((s_all - x.s) / (n_all - x.n) * 1000000) for x in groups
    ]
    g = len(tq)
    ssq = sum((g * t - sum(tq)) ** 2 for t in tq)
    se = math.sqrt((g - 1.0) / g * ssq / (g * g) / 1e12) / 100
    assert r.n_groups == g and r.n_rows == n_all
    assert abs(r.mean_value - round(s_all / n_all / 100, 6)) < 1e-9
    assert abs(r.jackknife_se - round(se, 6)) < 2e-6
    assert 0 < r.jackknife_se < 0.02 * r.mean_value


def test_snm_audit_catches_all_same_key_pairs_and_reads_below_lsh(spark, sf_dir):
    """Counts are consistent; every exact-permutation pair (identical
    sorted-token key, Jaccard 1.0) is guaranteed caught (rank distance
    0); on this substitution-heavy corpus SNM's single-pass recall reads
    BELOW the LSH tier's while reducing more."""
    from big_data_medical_analysis_spark.operators.dedup import (
        N_JACCARD_PROBES,
        lsh_blocking_quality_audit,
        snm_blocking_quality_audit,
    )

    s = snm_blocking_quality_audit(spark, sf_dir).collect()[0]
    l = lsh_blocking_quality_audit(spark, sf_dir).collect()[0]
    assert s.n_caught <= s.n_truth and s.n_caught <= s.n_candidates
    assert s.n_all_pairs == l.n_all_pairs and s.n_truth == l.n_truth
    assert s.recall < l.recall
    assert s.reduction_ratio > l.reduction_ratio
    # same-key (J=1) probe pairs must all be candidates: count them and
    # verify they are within the caught set size's lower bound
    docs = read_table(spark, sf_dir, "documents")
    keyd = docs.select(
        "doc_id",
        F.concat_ws(
            " ", F.array_sort(F.array_distinct(F.split("text", " ")))
        ).alias("k"),
    ).collect()
    by_key: dict[str, list[int]] = {}
    for r in keyd:
        by_key.setdefault(r.k, []).append(r.doc_id)
    same_key_pairs = sum(
        1
        for ids in by_key.values()
        for i, a in enumerate(sorted(ids))
        for b in sorted(ids)[i + 1 :]
        if a < N_JACCARD_PROBES
    )
    assert s.n_caught >= same_key_pairs > 0


def test_snm_multipass_union_dominates_each_pass(spark, sf_dir):
    """Set algebra of the multi-pass union: caught(union) >= each pass's
    caught, candidates(union) <= sum of passes' candidates (overlap
    dedups), and union recall >= the single-pass audit's recall (the
    forward pass is one of its passes)."""
    from big_data_medical_analysis_spark.operators.dedup import (
        snm_blocking_quality_audit,
        snm_multipass_blocking_audit,
    )

    rows = {
        r["pass"]: r
        for r in snm_multipass_blocking_audit(spark, sf_dir).collect()
    }
    assert set(rows) == {"sorted", "reversed", "union"}
    u, s, rv = rows["union"], rows["sorted"], rows["reversed"]
    assert u.n_caught >= max(s.n_caught, rv.n_caught)
    assert u.n_candidates <= s.n_candidates + rv.n_candidates
    assert u.recall >= max(s.recall, rv.recall)
    single = snm_blocking_quality_audit(spark, sf_dir).collect()[0]
    assert s.n_candidates == single.n_candidates  # same forward pass
    assert u.recall >= single.recall


def test_rolling_distinct_bounds_and_exact_recompute(spark, sf_dir):
    """Window distinct is bounded below by the day's own distinct count
    and above by the window's summed daily distincts; spot-recompute the
    full series in Python from the (day,user) pairs."""
    from big_data_medical_analysis_spark.operators.analytics import (
        ROLLDIST_WINDOW,
        rolling_7d_distinct_users,
    )
    import datetime

    rows = rolling_7d_distinct_users(spark, sf_dir).collect()
    pairs = (
        read_table(spark, sf_dir, "events")
        .select(F.to_date("ts").alias("d"), "user_id")
        .distinct()
        .collect()
    )
    by_day: dict = {}
    for r in pairs:
        by_day.setdefault(r.d, set()).add(r.user_id)
    assert len(rows) == len(by_day)
    for r in rows:
        d = datetime.date.fromisoformat(r.day)
        users = set()
        for k in range(ROLLDIST_WINDOW):
            users |= by_day.get(d - datetime.timedelta(days=k), set())
        assert r.n_users_7d == len(users)
        assert r.n_users_7d >= len(by_day[d])


def test_conformal_coverage_honors_the_guarantee_band(spark, sf_dir):
    """Three-way split: train + calibrate + test partition the fact, so
    the calibration set is DISJOINT from model fitting (the
    split-conformal requirement) and n_cal + n_test < all orders — the
    train fold holds the rest. q_hat is positive; measured test coverage
    sits in the finite-sample band around the 1-alpha guarantee
    (exchangeable synthetic data => coverage ~ Binomial(n_test, >=0.9),
    so >= 0.9 - 3/sqrt(n_test) and < 1)."""
    from big_data_medical_analysis_spark.operators.statistics import (
        conformal_interval_coverage,
    )

    r = conformal_interval_coverage(spark, sf_dir).collect()[0]
    n_orders = read_table(spark, sf_dir, "orders").count()
    # md5 mod 3 folds: cal and test are each ~1/3; train holds the rest
    assert 0 < r.n_cal < n_orders
    assert 0 < r.n_test < n_orders
    assert r.n_cal + r.n_test < n_orders
    n_train = n_orders - r.n_cal - r.n_test
    for part in (n_train, r.n_cal, r.n_test):
        assert abs(part - n_orders / 3) < 0.1 * n_orders
    assert r.q_hat > 0
    assert r.n_covered <= r.n_test
    lo = (100 - r.alpha_pct) / 100 - 3.0 / (r.n_test ** 0.5)
    assert lo <= r.coverage < 1.0


def test_cuped_null_experiment_arms_agree_and_reduction_is_rho2(spark, sf_dir):
    """Null experiment: the two arms' adjusted means stay close (within a
    few SE of each other); theta and var_reduction are shared; CUPED
    preserves the pooled mean (the adjustment is mean-zero across all
    users); var_reduction in [0, 1)."""
    from big_data_medical_analysis_spark.operators.statistics import (
        cuped_adjusted_lift,
    )

    rows = {r.arm: r for r in cuped_adjusted_lift(spark, sf_dir).collect()}
    assert set(rows) == {0, 1}
    a, b = rows[0], rows[1]
    assert a.theta == b.theta and a.var_reduction == b.var_reduction
    assert 0.0 <= a.var_reduction < 1.0
    # null design: relative gap between adjusted means stays small
    gap = abs(a.mean_y_cuped - b.mean_y_cuped)
    assert gap / max(a.mean_y, 1e-9) < 0.25
    # mean-zero adjustment: pooled weighted mean is preserved
    pooled_raw = (a.mean_y * a.n_users + b.mean_y * b.n_users) / (
        a.n_users + b.n_users
    )
    pooled_adj = (
        a.mean_y_cuped * a.n_users + b.mean_y_cuped * b.n_users
    ) / (a.n_users + b.n_users)
    assert abs(pooled_raw - pooled_adj) < 0.01


def test_mde_scales_inversely_with_sqrt_n(spark):
    """MDE at sf0.001 (150 users) should exceed MDE at sf0.01 (1500
    users) by roughly sqrt(10); relative MDE is positive and the arms
    partition the users."""
    from big_data_medical_analysis_spark.operators.statistics import (
        ab_test_power_mde,
    )

    small = ab_test_power_mde(spark, "/root/testdata/sf0.001").collect()[0]
    big = ab_test_power_mde(spark, "/root/testdata/sf0.01").collect()[0]
    for r, sf in ((small, "/root/testdata/sf0.001"), (big, "/root/testdata/sf0.01")):
        n_users = (
            read_table(spark, sf, "events").select("user_id").distinct().count()
        )
        assert r.n_a + r.n_b == n_users
    expected = ((big.n_a + big.n_b) / (small.n_a + small.n_b)) ** 0.5
    ratio = small.mde_abs / big.mde_abs
    assert expected / 3 < ratio < expected * 3  # ~1/sqrt(n), variance noise
    assert small.mde_rel_pct > 0 and big.mde_rel_pct > 0


def test_perplexity_filter_planted_gibberish_scores_highest(spark, tmp_path):
    """A corpus with one planted out-of-distribution doc (tokens no other
    doc uses) must rank it at the top of the perplexity filter; in-
    distribution repeats score near the corpus floor. Runs the SAME
    operator against a synthetic parquet corpus."""
    import os

    from big_data_medical_analysis_spark.operators.text_analysis import (
        bigram_lm_perplexity_filter,
    )

    sf = str(tmp_path / "ppl_sf")
    os.makedirs(sf, exist_ok=True)
    normal = "the quick brown fox jumps over the lazy dog again and again"
    rows = [(i, normal, "en", "web", len(normal)) for i in range(40)]
    rows.append((99, "zxq vvk qpw zzj xxw qqv zkx wvq pzz jxx", "en", "web", 40))
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(os.path.join(sf, "documents.parquet"))
    res = bigram_lm_perplexity_filter(spark, sf).collect()
    assert res[0].doc_id == 99  # the gibberish doc leads
    assert res[0].perplexity > 2 * res[-1].perplexity
    for r in res[1:]:
        assert r.perplexity < res[0].perplexity


def test_embedding_diversity_matches_numpy_pairwise(spark, sf_dir):
    """avg_pairwise_cosine recomputes (to quantization tolerance) from a
    numpy O(n^2) pairwise pass over the same quantized unit vectors;
    diversity = 1 - avg; near-isotropic synthetic embeddings sit well
    away from the mode-collapse reading of ~0."""
    import math

    import numpy as np

    from big_data_medical_analysis_spark.operators.similarity import (
        DIV_Q,
        embedding_diversity_score,
    )

    rows = {r.label: r for r in embedding_diversity_score(spark, sf_dir).collect()}
    emb = read_table(spark, sf_dir, "embeddings").collect()
    by_label: dict[int, list] = {}
    for r in emb:
        v = np.asarray(r.embedding, dtype=np.float64)
        acc = 0.0
        for x in v:  # same sequential fold as the engines
            acc += x * x
        u = np.floor(v / math.sqrt(acc) * DIV_Q).astype(np.int64)
        by_label.setdefault(r.label, []).append(u)
    for label, us in by_label.items():
        n = len(us)
        if n < 2:
            continue
        m = np.stack(us).astype(np.float64)
        g = m @ m.T
        avg = (g.sum() - np.trace(g)) / (n * (n - 1)) / DIV_Q / DIV_Q
        r = rows[label]
        assert r.n_vectors == n
        assert abs(r.avg_pairwise_cosine - round(avg, 6)) < 2e-6
        assert abs(r.diversity - (1 - r.avg_pairwise_cosine)) < 2e-6
        assert r.diversity > 0.5  # synthetic embeddings are not collapsed


def test_did_null_design_reads_no_effect(spark, sf_dir):
    """Null experiment AND null treatment timing: DiD sits near 0 with
    |t| in the no-effect band; the four cell means are all positive and
    close (same distribution); SE recomputes from the cells."""
    from big_data_medical_analysis_spark.operators.statistics import (
        did_estimator,
    )

    r = did_estimator(spark, sf_dir).collect()[0]
    means = [r.mean_ctrl_pre, r.mean_ctrl_post, r.mean_treat_pre, r.mean_treat_post]
    assert all(m > 0 for m in means)
    assert max(means) / min(means) < 1.5
    assert abs(r.t_stat) < 4.0  # A/A-correct: no detectable effect
    expect_did = (r.mean_treat_post - r.mean_treat_pre) - (
        r.mean_ctrl_post - r.mean_ctrl_pre
    )
    assert abs(r.did - expect_did) < 1e-5
    assert r.se > 0


def test_forecast_metrics_recompute_and_white_noise_mase_near_one(spark, sf_dir):
    """MAPE/sMAPE/MASE recompute in Python from the daily series (same
    quantization); on this non-seasonal series the seasonal-naive MASE
    sits near 1 (no weekly signal to exploit)."""
    import math

    from big_data_medical_analysis_spark.operators.analytics import (
        FC_Q,
        FC_SEASON,
        forecast_accuracy_naive,
    )

    r = forecast_accuracy_naive(spark, sf_dir).collect()[0]
    daily = {
        x.day: x.r
        for x in read_table(spark, sf_dir, "orders")
        .groupBy(
            F.floor(F.unix_timestamp(F.to_date("o_orderdate")) / 86400)
            .cast("long")
            .alias("day")
        )
        .agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("r"))
        .collect()
    }
    fc = [
        (daily[d], daily[d - FC_SEASON])
        for d in daily
        if d - FC_SEASON in daily
    ]
    nv = [abs(daily[d] - daily[d - 1]) for d in daily if d - 1 in daily]
    n = len(fc)
    mape = sum(math.floor(abs(a - f) / a * FC_Q) for a, f in fc) / n / FC_Q * 100
    smape = (
        sum(math.floor(2.0 * abs(a - f) / (a + f) * FC_Q) for a, f in fc)
        / n
        / FC_Q
        * 100
    )
    mase = (sum(abs(a - f) for a, f in fc) / n) / (sum(nv) / len(nv))
    assert r.n_days == n
    assert abs(r.mape_pct - round(mape, 6)) < 2e-6
    assert abs(r.smape_pct - round(smape, 6)) < 2e-6
    assert abs(r.mase - round(mase, 6)) < 2e-6
    assert 0.5 < r.mase < 2.0  # white-noise-ish: seasonal naive ~ naive-1
