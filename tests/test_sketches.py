"""Count-Min sketch properties (operators/sketches.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_medical_analysis_spark import registry
from big_data_medical_analysis_spark.operators import sketches as SK
from big_data_medical_analysis_spark.sources.readers import read_table


def test_countmin_never_underestimates(spark, sf_dir):
    rows = registry.queries()["countmin_user_counts"](spark, sf_dir).collect()
    assert rows
    n_total = sum(r.n_exact for r in rows)
    for r in rows:
        assert r.never_under
        assert r.n_est >= r.n_exact
        assert r.n_est <= n_total  # a bucket can never exceed the stream

    # sketch state is D×W cells regardless of input size
    ev = read_table(spark, sf_dir, "events")
    cells = SK.countmin_build(ev, "user_id")
    assert cells.count() <= SK.CM_DEPTH * SK.CM_WIDTH
    total_per_depth = {
        r.depth: r.s
        for r in cells.groupBy("depth").agg(F.sum("cnt").alias("s")).collect()
    }
    # every depth row sees every key exactly once
    assert set(total_per_depth.values()) == {ev.count()}
