"""Simulate the driver harness: vanilla SparkSession (none of the engine's
configs), import __spark_entry__ by file path, run entry() + sample queries,
and compare one events-touching query against its DuckDB oracle.

This is the exact surface the round driver exercises; running it catches
anything that only works under our tuned get_spark() session.
"""

from __future__ import annotations

import hashlib
import importlib.util
import math
import sys

import duckdb
from pyspark.sql import SparkSession

ENTRY = "/root/repo/__spark_entry__.py"
SF01 = "/root/testdata/sf0.01"

spec = importlib.util.spec_from_file_location("spark_entry", ENTRY)
mod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(mod)

# vanilla session — deliberately NOT get_spark()
spark = SparkSession.builder.master("local[8]").appName("driver-sim").getOrCreate()
spark.sparkContext.setLogLevel("ERROR")

df = mod.entry(spark)
rows = df.collect()
print(f"entry(): {len(rows)} rows, schema: {df.schema.simpleString()}")
assert len(rows) > 0

qs = mod.queries()
oracles = mod.oracle_sql()
print(f"queries: {len(qs)}, oracles: {len(oracles)}")

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{SF01}/{t}.parquet'")


def norm(v):
    if v is None:
        return "<NULL>"
    if isinstance(v, float):
        return "<NaN>" if math.isnan(v) else repr(round(v, 9))
    return str(v)


def vhash(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x01".join(norm(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode() + b"\n")
    return h.hexdigest()


fails = 0
for name in sys.argv[1:] or ["purchase_asof_signup", "user_event_deltas", "pricing_summary"]:
    sdf = qs[name](spark, SF01)
    srows = [tuple(r) for r in sdf.collect()]
    # The real driver canonicalizes with pandas sort_values over ALL output
    # columns, which raises TypeError on list/array cells (CORRECTNESS_r03
    # recorded 3 such ERRs while this sim passed them). Reproduce that step
    # so array-typed outputs fail HERE, not in the round artifact.
    import pandas as pd

    pd.DataFrame(srows, columns=sdf.columns).sort_values(list(sdf.columns))
    if name not in oracles:
        # rows-only contract queries: the driver records count + schema only
        print(f"rows {name}: spark={len(srows)} (no oracle)")
        continue
    res = con.sql(oracles[name])
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    ok = (
        len(srows) == len(drows)
        and sorted(sdf.columns) == sorted(dcols)
        and vhash(srows, sdf.columns) == vhash(drows, dcols)
    )
    print(f"{'ok  ' if ok else 'FAIL'} {name}: spark={len(srows)} duck={len(drows)}")
    fails += 0 if ok else 1

print("DRIVER-SIM", "FAIL" if fails else "PASS")
sys.exit(1 if fails else 0)
