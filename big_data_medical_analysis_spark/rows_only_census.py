"""Machine-checked census of every query registered with ``oracle=None``.

The engine's correctness contract is "full DuckDB value oracle unless a
cross-engine oracle is IMPOSSIBLE" — engine RNG, engine-internal sketch or
partition state, binary codec output, or non-SQL-expressible math. COVERAGE.md
carries the prose version of this census; this module is the mechanical one:
``tests/test_entry.py`` asserts set-equality between the keys here and the
actual ``oracle=None`` registrations, so

- a future rows-only registration WITHOUT a census entry fails the suite
  (no silent weakening of the oracle discipline), and
- a stale census entry for a query that gained an oracle (or was removed)
  also fails (the census can't overstate the gap).

Each value names the impossibility class and, where one exists, the
full-oracle twin that covers the same semantics with a portable hash/closed
form. Keep the reasons one line; the long-form rationale lives in
COVERAGE.md's "Rows-only census" table.
"""

from __future__ import annotations

ROWS_ONLY_CENSUS: dict[str, str] = {
    "approx_distinct_users": (
        "HLL++ sketch values are engine-internal; twin: hll_portable_distinct"
    ),
    "approx_price_quantiles": "GK sketch merge is partition-order-sensitive",
    "stratified_sample_by": "Bernoulli sampleBy draws engine RNG",
    "random_split_shards": "randomSplit draws engine RNG",
    "deterministic_client_split": (
        "xxhash64 has no DuckDB implementation; twin: portable_client_split"
    ),
    "salted_stratified_split": "xxhash64 salting (same engine-hash gap)",
    "partition_size_profile": (
        "output IS the engine-internal partition layout"
    ),
    "fedavg_client_weights": (
        "per-client lstsq (SVD) is not SQL-expressible; twin: fedavg_rounds"
    ),
    "minhash_lsh_candidates": (
        "ml.feature.MinHashLSH seeds are engine RNG; twin: minhash_portable_groups"
    ),
    "minhash_band_groups": (
        "xxhash64 signature has no DuckDB twin; twin: minhash_portable_groups"
    ),
    "ann_brp_lsh": "BucketedRandomProjectionLSH projection is engine RNG",
    "orders_column_profile_approx": (
        "HLL++ estimates are engine-specific sketches; twin: orders_column_profile"
    ),
    "image_decode_stats": "binary codec output — no DuckDB codec path",
    "image_resize_stats": "binary codec output — no DuckDB codec path",
    "image_augment_fanout": "binary codec output — no DuckDB codec path",
    "png_decode_stats": "binary codec output — no DuckDB codec path",
    "jpeg_decode_stats": "binary codec output — no DuckDB codec path",
    "wav_decode_stats": "binary codec output — no DuckDB codec path",
    "video_frame_sample": "binary codec output — no DuckDB codec path",
    "audio_clip_stats": "binary codec output — no DuckDB codec path",
    "pkl_png_roundtrip": "binary codec output — no DuckDB codec path",
    "image_dhash_near_dup": (
        "binary codec output (numpy-RNG image content, bilinear resize) — "
        "no DuckDB codec path"
    ),
    "chexpert_pipeline_twin": (
        "binary codec output feeds the split/fed-avg/eval features — no "
        "DuckDB codec path; every non-codec stage has a full-oracle twin "
        "(csv_roundtrip_revenue, dedup_guard, portable_client_split, "
        "fedavg_rounds, model_eval_accuracy)"
    ),
}
