"""Named-query registry: the engine's public operator catalog.

Every operator in SURVEY.md §2 is exposed as a named, composable function
``(spark, sf_dir) -> DataFrame`` with, where SQL-expressible, an ANSI-SQL
oracle twin that DuckDB runs on the same parquet tables. The driver's
correctness harness compares the two (row count + schema + order-insensitive
value hash), so:

- every computed column is aliased identically in the Spark plan and SQL;
- float aggregates are rounded identically on both sides;
- timestamps are rendered to strings identically on both sides
  (Spark ``date_format`` ↔ DuckDB ``strftime``).

Non-SQL-expressible operators (Bernoulli sampling, engine-hash partitioning,
LSH over engine RNG) register with ``oracle=None`` → the driver records a
weaker rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None  # ANSI SQL for DuckDB, or None → rows-only check
    category: str

    @property
    def doc(self) -> str:
        """The query's docstring, read at ACCESS time — several operators
        substitute constants into ``__doc__`` after their ``@register``
        decorator has run (the ``.replace(...)`` lines at module bottom);
        a decoration-time snapshot would serve those consumers the raw
        {PLACEHOLDER} text (code-review r14)."""
        return (self.fn.__doc__ or "").strip()


_REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None = None, category: str = "relational"):
    """Decorator: register ``fn(spark, sf_dir) -> DataFrame`` under ``name``."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = Query(name, fn, oracle, category)
        return fn

    return deco


def _load_all() -> None:
    """Import every operator module so its @register calls run."""
    # Imported here (not at module top) to avoid import cycles: operator
    # modules import `register` from this module.
    from big_data_medical_analysis_spark.operators import (  # noqa: F401
        analytics,
        dedup,
        etl,
        multimodal,
        pipeline_twin,
        quality,
        relational,
        selection,
        similarity,
        sketches,
        statistics,
        subqueries,
        text_analysis,
        udf_surface,
    )
    from big_data_medical_analysis_spark.sources import npy_datasource  # noqa: F401
    from big_data_medical_analysis_spark.streaming import windows  # noqa: F401


# ---------------------------------------------------------------------------
# Mechanical verification-window rotation.
#
# The driver's correctness harness checks roughly the first _WINDOW queries it
# is handed (every CORRECTNESS_r*.json to date contains exactly 50 names), so
# the order of the dicts returned below is a *priority* order. Rounds 6 and 7
# both shipped a hand-edited priority tuple that led with the just-consumed
# window — the same stale-window defect twice. The priority is therefore now
# COMPUTED from the checked-in driver artifacts (CORRECTNESS_r*.json at the
# repo root) at import time:
#
#   1. queries with NO driver row ever, in registration order — except the
#      names in _DEFER_WITHIN_NEVER_CHECKED, which sort to the end of the
#      never-checked block (lowest-risk full-oracle relational patterns whose
#      building blocks are already green inside other checked queries; when
#      never-checked count exceeds the window, these are the right residue);
#   2. everything else by latest driver round ASCENDING (stalest first),
#      ties broken by registration order.
#
# When a new CORRECTNESS_rN.json lands, the next import rotates automatically:
# freshly-checked queries fall to the back, never-checked and stale ones lead.
# tests/test_entry.py pins the invariant (first min(window, never_checked)
# names are all never-checked).
# ---------------------------------------------------------------------------

_WINDOW = 50

# Editorial tiebreaker *within* the never-checked block only — everything else
# is artifact-driven. Rationale per VERDICT r7 task 1: with 54 never-checked
# and a 50-slot window, 4 must wait a round; defer the ones whose failure
# modes are already covered by green queries (plain window/rollup/aggregate
# over orders/lineitem), not the sketches/UDAFs/sources with novel surface.
_DEFER_WITHIN_NEVER_CHECKED: tuple[str, ...] = (
    "bool_count_if_flags",
    "percent_rank_cume_orders",
    "frame_value_functions",
    "time_hierarchy_rollup",
    # deferred when orders_column_profile_approx (round 8, VERDICT task 6)
    # took the 50th slot: hints change physical strategy, never semantics,
    # and the underlying join outputs are green in many checked queries
    "join_hint_strategies",
    # round-10 closing session registered 53 never-checked against the
    # 50-slot window; defer the three whose building blocks are already
    # driver-green in other queries (band join + percentile_disc via
    # rolling/gapfill family; power-sum variances via corr/regr family;
    # the k_anonymity_audit group shape) — NOT the novel-machinery ones
    # (AUC/Gini/conformal prefix sums, blocking audits, perplexity,
    # diversity, dHash), which need their first driver row
    "rolling_median_revenue",
    "ab_test_power_mde",
    "l_diversity_audit",
    # 54th never-checked (user_erasure_rewrite took a window slot — a
    # sink-job audit needs its first driver row more than RFM's CASE
    # binning over percentile_disc thresholds, whose pieces are green
    # via the decile/ntile family)
    "rfm_customer_segments",
    # 55th/56th: the DiD cells are the ab_test/CUPED combine shape
    # (both prioritized in-window) and the forecast metrics are lag
    # joins + quantized sums green via ACF/rolling-median — defer both
    "did_estimator",
    "forecast_accuracy_naive",
)

# Explicit rotation key AHEAD of plain staleness (VERDICT r9 task 1): a query
# whose implementation changed in round R but whose latest driver row predates
# R is running on an unverified code path — the driver row is the contract
# signal, so these lead the window (right after any never-checked queries).
# Maintained by hand at change time: add/update `name: round` when a round
# edits a query's value-producing code; the entry self-expires once a driver
# row >= that round lands (the comparison below), so stale entries are
# harmless. Non-value changes (plan pins, docstrings) don't belong here.
_CODE_CHANGED_ROUND: dict[str, int] = {
    # round 8/9 edits whose last driver row was r5 (VERDICT r9 audit list;
    # tools/selfcheck.py re-verified all green, but the driver row is the
    # signal of record):
    "ivf_topk": 9,
    "approx_price_quantiles": 9,
    "order_chain_recursion": 9,
    # (kmeans_lloyd_centroids' r9 entry superseded by its r12 entry below —
    # a dict literal keeps the later key, so the r9 line is removed; the
    # same convention removes the r9/r10/r13/r15 lines for the 11 names
    # re-listed in the round-16 block at the bottom)
    "null_safe_join_counts": 9,
    "prefix_filter_jaccard_join": 9,
    "bigram_pmi_collocations": 9,
    # round 10 semantics fix: running-max merge (true session_window
    # gapExpr semantics) replaced the previous-event-only gap test
    "dynamic_gap_sessions": 10,
    # round 11 ADVICE fixes: conformal moved to a TRUE 3-way split (md5
    # mod 3: train/calibrate/test — values change); NDCG oracle now
    # ranks the bm25 list on the 6-dp rounded score like the Spark side
    # (latent tie-order flake removed); AUC/Gini ride weight_below's
    # new integral-order RANGE frame (value-identical for their
    # distinct cells, re-check anyway since the frame expression
    # changed — the histogram_incremental_daily precedent)
    "conformal_interval_coverage": 11,
    "ndcg_retrieval_eval": 11,
    "auc_mann_whitney": 11,
    "gini_customer_concentration": 11,
    # round 12 build/probe wall split (VERDICT r11 task 3): pure function
    # extraction with byte-identical expressions — value-identical by
    # construction, re-check anyway per the histogram_incremental_daily
    # precedent (the code path the driver verified is no longer the one
    # that runs)
    "minhash_incremental_probe": 12,
    "ann_incremental_probe": 12,
    # (ann_adaptive_probe's r14 entry superseded by its r17 entry below;
    # dedup_components' r16 entry likewise — dict literal keeps the later
    # key, the kmeans r9/r12 precedent)
    # ------------------------------------------------------------------
    # round 16 (optimization round 1): ALL 41 queries whose value-producing
    # code was rewritten by the r16 waves (VERDICT r16 item 1 — the round
    # itself omitted these entries; added at the r17 open so the driver
    # window leads with the 31 rewrites that have no driver row on the new
    # code). The 10 with green r16 rows (ivf_pq_topk, ann_recall_audit,
    # grid_radius_join, bucketed_fact_chain, snm_multipass/snm/lsh blocking
    # audits, ann_multiprobe_audit, brand_graph_clustering_coeff,
    # image_dhash_near_dup) self-expire immediately via latest >= 16.
    # Wave 1 — map-side argmin Lloyd/PQ family + one-buffer quantiles:
    "kmeans_lloyd_centroids": 16,
    "semdedup_prune_stats": 16,
    "d4_prototype_prune": 16,
    "curated_corpus_epoch": 16,
    "pq_codebook_distortion": 16,
    "pq_adc_topk": 16,
    "ivf_pq_topk": 16,
    "ann_recall_audit": 16,
    "lineitem_price_quantiles": 16,
    # Wave 2a — first-colliding-band emission (pmh family):
    "governed_mixture_sample": 16,
    "intersource_dup_matrix": 16,
    "split_leakage_audit": 16,
    "minhash_portable_groups": 16,
    # Wave 2b — parallelism-starved stages:
    "cogrouped_user_profile": 16,
    "ngram_stats": 16,
    "grid_radius_join": 16,
    "bucketed_colocated_join": 16,
    "bucketed_fact_chain": 16,
    # Waves 3a/3c — blocking-audit subtree pins:
    "snm_multipass_blocking_audit": 16,
    "snm_blocking_quality_audit": 16,
    "lsh_blocking_quality_audit": 16,
    # Wave 3b — one-pass grouping-sets rewrites:
    "fedavg_eval_loop": 16,
    "hll_incremental_daily": 16,
    "histogram_incremental_daily": 16,
    # Wave 4a — multiprobe two-tier pins:
    "ann_multiprobe_audit": 16,
    # Wave 5a — simhash first-band emission + CC edge repartition:
    "simhash_near_dup": 16,
    "edit_distance_pairs": 16,
    # Wave 5c — basket-array mining family:
    "copurchase_brand_pairs": 16,
    "triangle_count_brand_graph": 16,
    "brand_pagerank": 16,
    "frequent_triples_apriori": 16,
    "brand_graph_clustering_coeff": 16,
    # Waves 6a/6c — fused one-crossing image kernels (png/jpeg decode
    # stats' r16 entries superseded by their r17 codec-kernel entries
    # below — dict literal keeps the later key, the kmeans precedent):
    "image_decode_stats": 16,
    "image_resize_stats": 16,
    "image_augment_fanout": 16,
    "image_dhash_near_dup": 16,
    # Wave 6b — twin synthesizes inside the fused feature pass:
    "chexpert_pipeline_twin": 16,
    "chexpert_twin_replay": 16,
    # ------------------------------------------------------------------
    # round 17 (optimization round 2) rewrites:
    # connected_components: bucketed edge table + probe-fused lazy
    # checkpoints (value-identical min-label propagation, re-check per
    # the histogram_incremental_daily precedent)
    "dedup_components": 17,
    # serve-bits + normed subtrees pinned (plan change, value-identical)
    "ann_adaptive_probe": 17,
    # LUT entropy decode in jpeg_codec (kernel parity proven brute-force,
    # 400 images + 300 malformed streams old==new; rows-only query)
    "jpeg_decode_stats": 17,
    # run-vectorized PNG unfilter (types 0/1/2; parity proven brute-force
    # on 500 images + mixed-filter streams; rows-only queries)
    "png_decode_stats": 17,
    "pkl_png_roundtrip": 17,
}

# ---------------------------------------------------------------------------
# Rotation growth cap (VERDICT r10 task 1, written rule):
#
#   net catalog growth in a round MUST stay below
#       _WINDOW − queries_owed
#   where queries_owed = (never-driver-checked) + (code-changed since
#   their last driver row) + (queries whose latest driver row is at the
#   current staleness floor). New registrations lead the priority order,
#   so every query added above that cap evicts an owed query from the
#   next driver window — exactly the lag rounds 8–10 accumulated (+56
#   queries vs 50 slots left 6 queries never checked and a 19-query
#   r5-stale tail for two rounds).
#
# tests/test_entry.py::test_rotation_growth_cap enforces this
# mechanically: the first _WINDOW names of the priority order must
# include EVERY never-checked query and EVERY code-changed-stale query.
#
# Round-13 amendment (VERDICT r12 budgeted 5 owed slots against a
# 48-query floor cohort, which the original all-inclusive cap could not
# admit): never-checked + code-changed remain HARD owed (always inside
# the window); the floor-stale tail is best-effort — it may spill past
# the window only up to the hard-owed count, and the spilled names must
# be exactly the next ones in priority order (they lead the following
# round's window), so the tail still drains mechanically.
# ---------------------------------------------------------------------------


def _repo_root() -> str:
    import os

    return os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


_LATEST_ROUNDS_CACHE: dict[str, int] | None = None


def latest_driver_rounds() -> dict[str, int]:
    """name -> latest round with a driver correctness row, from artifacts.
    Cached per process: the checked-in CORRECTNESS_r*.json set is fixed
    for a process lifetime, and queries()/oracle_sql() are called in
    loops by tests and tooling."""
    global _LATEST_ROUNDS_CACHE
    if _LATEST_ROUNDS_CACHE is not None:
        return _LATEST_ROUNDS_CACHE
    import glob
    import json
    import os
    import re

    latest: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(_repo_root(), "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as f:
                rows = json.load(f)
        except (OSError, ValueError):
            continue
        if not isinstance(rows, dict):
            continue
        for name in rows:
            latest[name] = max(latest.get(name, 0), rnd)
    _LATEST_ROUNDS_CACHE = latest
    return latest


def _priority_order(registered: list[str]) -> list[str]:
    latest = latest_driver_rounds()
    reg_index = {n: i for i, n in enumerate(registered)}
    defer_rank = {n: i for i, n in enumerate(_DEFER_WITHIN_NEVER_CHECKED)}

    def key(name: str):
        if name not in latest:  # never driver-checked: lead
            deferred = name in defer_rank
            return (0, int(deferred), defer_rank.get(name, 0), reg_index[name])
        if latest[name] < _CODE_CHANGED_ROUND.get(name, 0):
            # code changed after the last driver row: unverified path,
            # jumps ahead of plain staleness (oldest driver row first)
            return (1, 0, latest[name], reg_index[name])
        return (2, 0, latest[name], reg_index[name])

    return sorted(registered, key=key)


def all_queries() -> dict[str, Query]:
    _load_all()
    order = _priority_order(list(_REGISTRY))
    return {name: _REGISTRY[name] for name in order}


def queries() -> dict[str, QueryFn]:
    """Driver-contract shape: name -> (spark, sf_dir) -> DataFrame."""
    return {n: q.fn for n, q in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """Driver-contract shape: name -> DuckDB SQL (only where expressible)."""
    return {n: q.oracle for n, q in all_queries().items() if q.oracle is not None}
