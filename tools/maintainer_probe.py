"""SemDeDup-maintainer steady-state probe (VERDICT r14 task 6): measure
that the PER-BATCH maintainer cost tracks the BATCH, not the accumulated
state — the same split-wall evidence the pmh/adx loops carry in
SCALING.md's build/probe table.

Method: bootstrap the incremental SemDeDup state at a SMALL and a LARGE
corpus size (default 2,000 vs 20,000 vectors — a 10x state gap), then
fold the SAME fixed-size batch (default 1,000 vectors) into each and time
the fold (min-of-2 after a warm-up fold with a disposable batch id…
batch ids: warm fold uses id 1, timed folds use ids 2/3, every fold is a
per-batch overwrite so re-running a timed id is the maintainer's own
redelivery path — identical work). The bootstrap walls are also reported:
they ARE the amortized index build, expected to scale with the corpus.

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


def probe(spark, corpus_n: int, batch_n: int, tag: str) -> dict:
    root = os.path.join(per_user_tmpdir("spark_graft_maintainer"), tag)
    shutil.rmtree(root, ignore_errors=True)
    state_dir = os.path.join(root, "state")
    stats_dir = os.path.join(root, "stats")
    merge = make_semdedup_maintainer(state_dir, stats_dir)
    boot = _emb_df(spark, corpus_n, seed=42)
    t0 = time.time()
    merge(boot, 0)
    boot_wall = time.time() - t0
    # warm fold (codegen + shuffle warm-up), then timed folds: every fold
    # reads only ingest_batch < batch_id, so each timed fold sees the
    # bootstrap state plus the prior folds' appends — the steady state
    batch = _emb_df(spark, batch_n, seed=7, id_base=10_000_000)
    merge(batch, 1)
    walls = []
    for bid in (2, 3):
        t0 = time.time()
        merge(
            _emb_df(spark, batch_n, seed=100 + bid, id_base=bid * 20_000_000),
            bid,
        )
        walls.append(time.time() - t0)
    return {
        "corpus_n": corpus_n,
        "batch_n": batch_n,
        "bootstrap_wall_sec": round(boot_wall, 3),
        "batch_fold_wall_sec": round(min(walls), 3),
    }


def main() -> int:
    args = [int(a) for a in sys.argv[1:]]
    small, large, batch_n = (args + [2_000, 20_000, 1_000])[:3]
    spark = get_spark("maintainer_probe")
    r_small = probe(spark, small, batch_n, f"s{small}")
    r_large = probe(spark, large, batch_n, f"l{large}")
    out = {
        "metric": "semdedup_maintainer_steady_state",
        "small": r_small,
        "large": r_large,
        "state_ratio": round(large / small, 2),
        "fold_wall_ratio": round(
            r_large["batch_fold_wall_sec"]
            / max(r_small["batch_fold_wall_sec"], 1e-9),
            2,
        ),
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
