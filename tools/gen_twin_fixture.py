"""Generate the pinned pipeline-twin feature fixture (round 13).

``fixtures/chexpert_twin_features.parquet`` holds one (img_id, variant,
pix_sum, n_pix) row per image x augment variant for EVERY doc_id in the
sf0.1 corpus (a superset of the sf0.01/sf0.001 id spaces, verified
below), computed by the SAME pure numpy kernels the pipeline twin's
fused Arrow pass runs (`_synth_content` content -> `decode_gray` ->
`equalize_hist` -> `augment_variants`). Everything is a deterministic
function of img_id (seeded MT19937 content, md5-seeded variants), so
regeneration on any box reproduces the committed file value-for-value —
tests/test_pipeline_twin.py pins a sample against the kernels.

Purpose (VERDICT r12 task 5): `chexpert_twin_replay` replays the twin's
entire NON-codec tail — ingest counts, dedup, client split, audits,
fed-avg trajectory, MSE — from this fixture with a FULL DuckDB value
oracle (both engines read the same committed parquet), shrinking what
the twin's rows-only census has to take on faith to exactly the codec
pass that PRODUCES these features.

Usage: python tools/gen_twin_fixture.py   (idempotent; rewrites the file)
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from big_data_medical_analysis_spark.operators.multimodal import (  # noqa: E402
    IMG_SIDE,
    augment_variants,
    decode_gray,
    equalize_hist,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIXTURE = os.path.join(REPO, "fixtures", "chexpert_twin_features.parquet")
SRC_DOCS = "/root/testdata/sf0.1/documents.parquet"


def synth_content_py(img_id: int) -> bytes:
    """Pure-python twin of multimodal._synth_content's per-row body
    (seeded MT19937, low-contrast 64..191 grayscale)."""
    rng = np.random.RandomState(int(img_id) % (2**31))
    return (
        rng.randint(64, 192, size=(IMG_SIDE, IMG_SIDE)).astype(np.uint8)
    ).tobytes()


def feature_rows(img_ids) -> dict[str, list]:
    out: dict[str, list] = {"img_id": [], "variant": [], "pix_sum": [], "n_pix": []}
    for i in img_ids:
        norm = equalize_hist(decode_gray(synth_content_py(i), IMG_SIDE, IMG_SIDE))
        nbytes = norm.tobytes()
        for v, b in enumerate(augment_variants(norm, nbytes)):
            out["img_id"].append(int(i))
            out["variant"].append(v)
            out["pix_sum"].append(int(np.frombuffer(b, np.uint8).sum(dtype=np.int64)))
            out["n_pix"].append(len(b))
    return out


def main() -> int:
    import duckdb

    ids = [r[0] for r in duckdb.sql(
        f"SELECT doc_id FROM '{SRC_DOCS}' ORDER BY doc_id"
    ).fetchall()]
    # the fixture must cover every sf the oracle harness runs
    for sf in ("0.001", "0.01"):
        extra = duckdb.sql(
            f"SELECT count(*) FROM '/root/testdata/sf{sf}/documents.parquet' "
            f"WHERE doc_id NOT IN (SELECT doc_id FROM '{SRC_DOCS}')"
        ).fetchone()[0]
        assert extra == 0, f"sf{sf} doc_ids not a subset of sf0.1 ({extra})"
    rows = feature_rows(ids)
    table = pa.table(
        {
            "img_id": pa.array(rows["img_id"], pa.int64()),
            "variant": pa.array(rows["variant"], pa.int32()),
            "pix_sum": pa.array(rows["pix_sum"], pa.int64()),
            "n_pix": pa.array(rows["n_pix"], pa.int64()),
        }
    )
    os.makedirs(os.path.dirname(FIXTURE), exist_ok=True)
    pq.write_table(table, FIXTURE, compression="zstd")
    print(f"wrote {FIXTURE}: {table.num_rows} rows over {len(ids)} images")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
