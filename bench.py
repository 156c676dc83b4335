"""Benchmark harness: times the engine's headline queries at a scale-factor
directory and prints ONE JSON line for the driver's BENCH_r{N}.json.

    $SPARK_GRAFT_SF_DIR  data dir (default /root/testdata/sf0.1)
    $SPARK_GRAFT_CPUS    local[] threads (default 32)

Each query executes end-to-end via the `noop` sink (full plan execution, no
driver collect overhead), after a JVM warm-up pass. The printed value is the
total wall seconds across headline queries.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from big_data_medical_analysis_spark import registry
from big_data_medical_analysis_spark.session import get_spark

HEADLINE = [
    "pricing_summary",
    "nation_order_cohorts",
    "top_orders_by_segment",
    "regional_revenue",
    "customer_order_stats",
    "topk_parts_per_brand",
    "user_event_deltas",
    "moving_order_totals",
    "purchase_asof_signup",
    "event_props_json",
    "monthly_revenue",
]
# Extended headline set — appended as the operator families land.
OPTIONAL = [
    # dedup pillar
    "docs_exact_dedup",
    "simhash_near_dup",
    "minhash_lsh_candidates",
    # similarity pillar
    "cosine_topk",
    "ann_brp_lsh",
    "ivf_topk",
    # text pillar
    "doc_token_stats",
    "tfidf_top_terms",
    # streaming (batch forms)
    "tumbling_event_counts",
    "sliding_event_stats",
    "session_windows",
    # Arrow UDF surface
    "pandas_udf_revenue",
    "label_centroids",
    "model_eval_accuracy",
    # multimodal pillar
    "image_augment_fanout",
    # skew handling / reshaping / sketches
    "salted_skew_join",
    "event_type_pivot",
    "countmin_user_counts",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("bench")
    qs = registry.queries()

    N_RUNS = 2

    def run(name: str) -> float:
        # min over N_RUNS full executions: single-sample walls at this scale
        # are dominated by GC/scheduler luck (observed 0.7s vs 5.4s for the
        # same plan back-to-back); the min is the reproducible capability
        # number. Reported as "runs" in the JSON.
        best = float("inf")
        for _ in range(N_RUNS):
            t0 = time.time()
            df = qs[name](spark, sf_dir)
            df.write.mode("overwrite").format("noop").save()
            best = min(best, time.time() - t0)
        return best

    names = HEADLINE + [n for n in OPTIONAL if n in qs]
    # warm-up: JVM/codegen init on a small plan, then the Python worker pool
    # (first pandas-UDF stage pays ~2-4s of worker fork + numpy import per
    # core; that's session setup, not query cost)
    qs["pricing_summary"](spark, sf_dir).write.mode("overwrite").format("noop").save()
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _warm(x):
        return x * 1.0

    n = spark.sparkContext.defaultParallelism
    spark.range(n * 4).repartition(n).select(
        _warm(F.col("id").cast("double"))
    ).write.mode("overwrite").format("noop").save()

    times = {}
    for name in names:
        times[name] = round(run(name), 3)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": round(sum(times.values()), 3),
                "unit": "sec",
                "runs": N_RUNS,
                "queries": times,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                # round-over-round comparability: the original 11-query
                # relational headline vs the pillar extensions added later
                "headline_total": round(
                    sum(times[n] for n in HEADLINE if n in times), 3
                ),
                "optional_total": round(
                    sum(t for n, t in times.items() if n not in HEADLINE), 3
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
