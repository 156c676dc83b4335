"""SemDeDup-maintainer steady-state probe (VERDICT r14 task 6): measure
that the PER-BATCH maintainer cost tracks the BATCH, not the accumulated
state — the same split-wall evidence the pmh/adx loops carry in
SCALING.md's build/probe table.

Method: bootstrap the incremental SemDeDup state at a SMALL and a LARGE
corpus size (default 2,000 vs 20,000 vectors — a 10x state gap), warm
both with one disposable fold, then time folds of the SAME fixed-size
batch (default 1,000 vectors) INTERLEAVED small/large/small/large
(min-of-2 per state) — interleaving, not back-to-back blocks, so JVM
codegen/JIT warmth accrued during one state's folds cannot one-sidedly
deflate the other's (code-review r15: the sequential form gave the
large state all of the small run's warmth, biasing the ratio toward the
flat result the probe exists to prove). The bootstrap walls are also
reported: they ARE the amortized index build, expected to scale with
the corpus.

The claim under test: batch-fold wall at 10x state / wall at 1x state
~ 1 (flat). Routing is O(batch x kc) with kc growing only as sqrt of the
bootstrap-derived k; the fine assignment and keeper screen are
(cell, fine)-keyed equi-joins whose per-vector candidates are width-
bounded (<= 128 cluster-mates), so nothing in the per-batch plan scans
the accumulated corpus.

Usage: python tools/maintainer_probe.py [small large batch]
Prints ONE JSON line; paste the row into BENCH_NOTES.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from big_data_medical_analysis_spark.operators.common import (  # noqa: E402
    per_user_tmpdir,
)
from big_data_medical_analysis_spark.session import get_spark  # noqa: E402
from big_data_medical_analysis_spark.streaming.windows import (  # noqa: E402
    make_semdedup_maintainer,
)

DIM = 64


def _emb_df(spark, n: int, seed: int, id_base: int = 0):
    rng = np.random.default_rng(seed)
    mat = rng.uniform(-1.0, 1.0, size=(n, DIM))
    rows = [
        (int(id_base + i), [float(x) for x in mat[i]]) for i in range(n)
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def build_state(spark, corpus_n: int, batch_n: int, tag: str):
    """Bootstrap one maintainer state and warm it with one disposable
    fold; returns (merge_fn, bootstrap_wall)."""
    root = os.path.join(per_user_tmpdir("spark_graft_maintainer"), tag)
    shutil.rmtree(root, ignore_errors=True)
    merge = make_semdedup_maintainer(
        os.path.join(root, "state"), os.path.join(root, "stats")
    )
    boot = _emb_df(spark, corpus_n, seed=42)
    t0 = time.time()
    merge(boot, 0)
    boot_wall = time.time() - t0
    merge(_emb_df(spark, batch_n, seed=7, id_base=10_000_000), 1)
    return merge, boot_wall


def main() -> int:
    args = [int(a) for a in sys.argv[1:]]
    small, large, batch_n = (args + [2_000, 20_000, 1_000])[:3]
    spark = get_spark("maintainer_probe")
    m_small, boot_small = build_state(spark, small, batch_n, f"s{small}")
    m_large, boot_large = build_state(spark, large, batch_n, f"l{large}")
    walls = {"small": [], "large": []}
    # interleaved timed folds: each state's samples bracket the other's,
    # so residual warmth is shared, not one-sided; every fold reads only
    # ingest_batch < batch_id, so re-timing a batch id is the
    # maintainer's own redelivery path — identical work
    for bid in (2, 3):
        for tag, merge in (("small", m_small), ("large", m_large)):
            t0 = time.time()
            merge(
                _emb_df(
                    spark, batch_n, seed=100 + bid, id_base=bid * 20_000_000
                ),
                bid,
            )
            walls[tag].append(time.time() - t0)
    fold_small = min(walls["small"])
    fold_large = min(walls["large"])
    out = {
        "metric": "semdedup_maintainer_steady_state",
        "small": {
            "corpus_n": small,
            "batch_n": batch_n,
            "bootstrap_wall_sec": round(boot_small, 3),
            "batch_fold_wall_sec": round(fold_small, 3),
        },
        "large": {
            "corpus_n": large,
            "batch_n": batch_n,
            "bootstrap_wall_sec": round(boot_large, 3),
            "batch_fold_wall_sec": round(fold_large, 3),
        },
        "state_ratio": round(large / small, 2),
        "fold_wall_ratio": round(fold_large / max(fold_small, 1e-9), 2),
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
