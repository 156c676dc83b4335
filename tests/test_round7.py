"""Round-7 additions: portable MinHash, PageRank, portable HLL, chi-square,
grouped-agg UDAF, and the custom Python .npy data source."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from big_data_medical_analysis_spark import registry
from big_data_medical_analysis_spark.operators.sketches import HLL_M
from big_data_medical_analysis_spark.sources.npy_datasource import (
    NpyEmbeddingReader,
    npy_fixture_path,
    parse_npy_header,
)


def _q(name):
    return registry.queries()[name]


# -- portable MinHash --------------------------------------------------------


def test_minhash_portable_groups_planted_dups(spark, sf_dir):
    """Identical texts share ALL bands; the collision profile must contain
    a group per duplicated text in every band it lands in."""
    rows = _q("minhash_portable_groups")(spark, sf_dir).collect()
    # the synthetic corpus contains planted near-identical docs → nonempty
    assert rows
    for r in rows:
        assert r.group_size >= 2
        assert 0 <= r.band < 4
        # keeper is the min doc_id of the bucket by construction
        assert r.keeper_doc_id >= 0


def test_minhash_portable_identical_docs_always_collide(spark):
    from big_data_medical_analysis_spark.operators import dedup as D

    # two identical docs must produce identical 16-component signatures,
    # hence collide in all 4 bands; a third unrelated doc shouldn't.
    df = spark.createDataFrame(
        [(0, "aa bb cc dd ee"), (1, "aa bb cc dd ee"), (2, "zz yy xx ww vv")],
        ["doc_id", "text"],
    )
    toks = F.array_distinct(F.split("text", " "))
    comp0 = F.array_min(
        F.transform(
            toks,
            lambda t: F.conv(
                F.substring(F.md5(F.concat(t, F.lit(":0"))), 1, 8), 16, 10
            ).cast("long"),
        )
    )
    sigs = {r.doc_id: r.c for r in df.select("doc_id", comp0.alias("c")).collect()}
    assert sigs[0] == sigs[1]
    assert sigs[0] != sigs[2]
    assert D.PMH_BANDS * D.PMH_ROWS_PER_BAND == 16


# -- PageRank ---------------------------------------------------------------


def test_brand_pagerank_mass_and_positivity(spark, sf_dir):
    rows = _q("brand_pagerank")(spark, sf_dir).collect()
    assert rows
    total = sum(r.pagerank for r in rows)
    # fixed-iteration PageRank on a connected-ish undirected graph keeps
    # total mass 1 (no dangling nodes: every vertex has degree >= 1)
    assert abs(total - 1.0) < 1e-3
    assert all(r.pagerank > 0 for r in rows)


# -- portable HLL ------------------------------------------------------------


def test_hll_portable_registers_and_error(spark, sf_dir):
    r = _q("hll_portable_distinct")(spark, sf_dir).collect()[0]
    assert r.m == HLL_M
    assert 0 <= r.n_zero_registers < HLL_M
    assert r.hll_estimate > 0
    # sf0.001: n≈1.5k on m=1024 registers — small-range regime, raw
    # estimate biased (disclosed); still must land within 50%
    assert r.rel_error < 0.5


def test_hll_portable_error_tightens_at_n_much_larger_than_m(spark):
    r = _q("hll_portable_distinct")(spark, "/root/testdata/sf0.01").collect()[0]
    # n/m ≈ 15 → inside the ~3×(1.04/√m) band with margin
    assert r.rel_error < 0.10
    assert r.exact_distinct > 10 * HLL_M


# -- chi-square --------------------------------------------------------------


def test_chisq_dof_and_nonnegativity(spark, sf_dir):
    r = _q("chisq_event_type_segment")(spark, sf_dir).collect()[0]
    assert r.chi2 >= 0.0
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    n_types = ev.select("event_type").distinct().count()
    n_segs = (
        ev.join(cust, ev.user_id == cust.c_custkey)
        .select("c_mktsegment")
        .distinct()
        .count()
    )
    assert r.dof == (n_types - 1) * (n_segs - 1)
    assert r.n_total == ev.join(cust, ev.user_id == cust.c_custkey).count()


def test_chisq_zero_on_independent_table(spark):
    """A perfectly proportional contingency (rank-1) must give chi2 = 0."""
    from big_data_medical_analysis_spark.operators import statistics  # noqa: F401

    rows = []
    for t, tn in [("a", 1), ("b", 2)]:
        for s, sn in [("x", 3), ("y", 5)]:
            rows += [(t, s)] * (tn * sn)
    df = spark.createDataFrame(rows, ["event_type", "segment"])
    cells = df.groupBy("event_type", "segment").agg(F.count(F.lit(1)).alias("n"))
    r = cells.groupBy("event_type").agg(F.sum("n").alias("rn"))
    cl = cells.groupBy("segment").agg(F.sum("n").alias("cn"))
    tot = cells.agg(F.sum("n").alias("nn"))
    e = F.col("rn") * F.col("cn") / F.col("nn")
    chi2 = (
        cells.join(r, "event_type").join(cl, "segment").crossJoin(tot)
        .agg(F.sum(F.pow(F.col("n") - e, F.lit(2.0)) / e).alias("c"))
        .collect()[0]
        .c
    )
    assert abs(chi2) < 1e-9


# -- grouped-agg UDAF --------------------------------------------------------


def test_grouped_agg_median_matches_order_statistic(spark, sf_dir):
    rows = {
        r.o_orderpriority: r
        for r in _q("grouped_agg_median_order")(spark, sf_dir).collect()
    }
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    pri = next(iter(rows))
    vals = sorted(
        int(round(r.o_totalprice * 100))
        for r in orders.filter(F.col("o_orderpriority") == pri)
        .select("o_totalprice")
        .collect()
    )
    expect = vals[(len(vals) - 1) // 2] / 100.0
    assert rows[pri].median_order_value == pytest.approx(expect)
    assert rows[pri].n_orders == len(vals)


# -- npy data source ---------------------------------------------------------


def test_npy_header_and_partition_planning(sf_dir):
    p = npy_fixture_path(sf_dir)
    n_rows, dim, itemsize, off = parse_npy_header(p)
    assert dim == 64 and itemsize == 4 and off % 16 == 0
    r = NpyEmbeddingReader({"path": p, "n_splits": "4"})
    parts = r.partitions()
    assert [x.start for x in parts][0] == 0
    assert parts[-1].end == n_rows
    # contiguous, non-overlapping cover
    for a, b in zip(parts, parts[1:]):
        assert a.end == b.start


def test_npy_pushdown_prunes_and_passes_residue(sf_dir):
    from pyspark.sql.datasource import GreaterThanOrEqual, IsNotNull, LessThan

    p = npy_fixture_path(sf_dir)
    r = NpyEmbeddingReader({"path": p, "n_splits": "8"})
    residue = list(
        r.pushFilters(
            [
                LessThan(attribute=("vec_id",), value=40),
                GreaterThanOrEqual(attribute=("vec_id",), value=10),
                IsNotNull(attribute=("embedding",)),
            ]
        )
    )
    # the embedding filter is NOT consumable → handed back to Spark
    assert len(residue) == 1 and isinstance(residue[0], IsNotNull)
    parts = r.partitions()
    assert parts[0].start == 10 and parts[-1].end == 40
    total = sum(x.end - x.start for x in parts)
    assert total == 30


def test_npy_scan_values_match_parquet(spark, sf_dir):
    from big_data_medical_analysis_spark.sources.npy_datasource import (
        NPY_SOURCE_NAME,
        NpyEmbeddingDataSource,
    )

    try:
        spark.dataSource.register(NpyEmbeddingDataSource)
    except Exception:
        pass
    p = npy_fixture_path(sf_dir)
    got = (
        spark.read.format(NPY_SOURCE_NAME)
        .option("path", p)
        .load()
        .filter(F.col("vec_id") < 5)
        .orderBy("vec_id")
        .collect()
    )
    want = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .filter(F.col("vec_id") < 5)
        .orderBy("vec_id")
        .collect()
    )
    assert len(got) == len(want) == 5
    for g, w in zip(got, want):
        assert g.vec_id == w.vec_id
        assert np.allclose(np.array(g.embedding), np.array(w.embedding))
