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
    # multimodal pillar
    "image_augment_fanout",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("bench")
    qs = registry.queries()

    def run(name: str) -> float:
        t0 = time.time()
        df = qs[name](spark, sf_dir)
        df.write.mode("overwrite").format("noop").save()
        return time.time() - t0

    names = HEADLINE + [n for n in OPTIONAL if n in qs]
    # warm-up: JVM/codegen/Arrow init on a small plan
    qs["pricing_summary"](spark, sf_dir).write.mode("overwrite").format("noop").save()

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
