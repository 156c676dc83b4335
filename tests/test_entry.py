"""Smoke tests for the driver contract surface."""

from __future__ import annotations

import importlib.util
import os

import pytest

_ENTRY_PATH = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "__spark_entry__.py")
_spec = importlib.util.spec_from_file_location("spark_entry", _ENTRY_PATH)
spark_entry = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(spark_entry)


def test_entry_returns_rows(spark):
    df = spark_entry.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "n_name" in df.columns and "revenue" in df.columns


def test_queries_and_oracles_align(spark):
    qs = spark_entry.queries()
    oracles = spark_entry.oracle_sql()
    assert qs, "no queries registered"
    # every oracle key must correspond to a registered query
    assert set(oracles) <= set(qs)


@pytest.mark.parametrize("name", ["pricing_summary", "topk_parts_per_brand", "purchase_asof_signup"])
def test_representative_queries_run(spark, sf_dir, name):
    df = spark_entry.queries()[name](spark, sf_dir)
    assert df.count() > 0
