"""Property tests for the Arrow UDF surface (operators/udf_surface.py):
fed-avg server step agrees with a direct fit, client shards are disjoint
and complete, and the normalized vectors are unit-length.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from big_data_medical_analysis_spark.operators import udf_surface as U
from big_data_medical_analysis_spark.sources.readers import read_table


def test_fedavg_weighted_average_matches_numpy(spark, sf_dir):
    """The driver-side server step (weighted average of client OLS weights)
    must equal a hand computation from the same per-client fits."""
    fits = U.client_local_fits(spark, sf_dir)
    rows = fits.collect()
    assert len(rows) == 4
    w0, w1, total = U.fedavg_weights(fits)
    exp_total = sum(r.n for r in rows)
    exp_w0 = sum(r.w0 * r.n for r in rows) / exp_total
    exp_w1 = sum(r.w1 * r.n for r in rows) / exp_total
    assert total == exp_total
    assert w0 == pytest.approx(exp_w0)
    assert w1 == pytest.approx(exp_w1)


def test_client_fit_shards_cover_everything(spark, sf_dir):
    """Disjointness + completeness of the grouped-map input: Σ n over client
    fits == table rows (no row lost or double-counted by assign_client)."""
    fits = U.client_local_fits(spark, sf_dir)
    n_total = sum(r.n for r in fits.collect())
    assert n_total == read_table(spark, sf_dir, "lineitem").count()


def test_local_fit_is_real_ols():
    """_local_fit on a perfectly linear shard recovers the line exactly."""
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "client": [0] * 10,
            "l_quantity": np.arange(1.0, 11.0),
            "l_extendedprice": 3.0 + 2.5 * np.arange(1.0, 11.0),
        }
    )
    out = U._local_fit(pdf)
    assert out["w0"].iloc[0] == pytest.approx(3.0, abs=1e-6)
    assert out["w1"].iloc[0] == pytest.approx(2.5, abs=1e-6)


def test_l2_normalize_unit_length(spark, sf_dir):
    df = U.l2_normalize_vectors(spark, sf_dir).limit(50)
    for r in df.collect():
        norm = float(np.linalg.norm(np.asarray(r.unit_vec)))
        assert norm == pytest.approx(1.0, abs=1e-4)


def test_l2_normalize_registered_csv_matches_library(spark, sf_dir):
    """Registered (driver-canon CSV micro-units) form ≡ library array form."""
    lib = {
        r.vec_id: np.asarray(r.unit_vec)
        for r in U.l2_normalize_vectors(spark, sf_dir)
        .filter("vec_id < 50")
        .collect()
    }
    reg = {
        r.vec_id: np.array([int(t) for t in r.unit_vec_micro.split(",")]) / 1e6
        for r in U.embeddings_l2_normalize(spark, sf_dir)
        .filter("vec_id < 50")
        .collect()
    }
    assert lib and set(lib) == set(reg)
    for vid, arr in lib.items():
        assert np.allclose(arr, reg[vid], atol=0)


def test_round_half_away():
    arr = np.array([0.0000005, -0.0000005, 0.0000014, -0.0000016])
    out = U.round_half_away(arr, 6)
    assert out.tolist() == [0.000001, -0.000001, 0.000001, -0.000002]


def test_model_eval_prediction_matches_expression(spark, sf_dir):
    """Batch-inference UDF ≡ the equivalent Catalyst expression: the ±1
    alternating linear probe computed via pandas UDF must agree row-for-row
    with an int-scaled transform/aggregate HOF formulation."""
    from big_data_medical_analysis_spark.operators.udf_surface import (
        _binary_predict,
    )
    from big_data_medical_analysis_spark.sources.readers import read_table

    emb = read_table(spark, sf_dir, "embeddings")
    iscaled = F.transform(
        "embedding",
        lambda x, i: F.round(x.cast("double") * 1_000_000).cast("long")
        * F.when(i % 2 == 0, F.lit(1)).otherwise(F.lit(-1)),
    )
    expr_pred = (
        F.aggregate(iscaled, F.lit(0).cast("long"), lambda a, x: a + x) > 0
    ).cast("int")
    both = emb.select(
        "vec_id",
        _binary_predict("embedding").alias("udf_pred"),
        expr_pred.alias("expr_pred"),
    )
    assert both.filter(F.col("udf_pred") != F.col("expr_pred")).count() == 0
