"""Explicit StructType schemas for every table the engine reads.

The reference never declares a schema — ``spark.createDataFrame(pandas_df)``
infers one (``src/preprocessing_pipeline.py:264``) and UDFs default to
StringType (``:57``, ``:129``). At 100 TB, inference is a correctness and
perf hazard (a sampling scan per read, drifting types across files), so the
engine declares everything.

Table shapes follow FIXTURES.md: the driver's TPC-H-ish star schema plus
``events`` (timestamped stream), ``documents`` (text corpus), ``embeddings``
(vectors), and the reference-shaped ``labels``/``images`` fixtures that model
the CheXpert label CSV (``src/preprocessing_pipeline.py:258-268``).

Physical notes (verified against the driver parquet files):
- ``o_orderdate`` / ``l_shipdate`` are parquet TIMESTAMP(isAdjustedToUTC=false)
  → Spark ``TimestampNTZType``.
- ``events.ts`` is parquet TIMESTAMP(NANOS), which Spark's vectorized reader
  rejects outright; the reader (sources/readers.py) reads it as nanosecond
  LongType under ``spark.sql.legacy.parquet.nanosAsLong`` and normalizes to
  microsecond ``TimestampNTZType``. The *logical* EVENTS schema below is the
  post-normalization shape.
- Fields are declared nullable: parquet file fields are optional and Spark
  file sources treat read schemas as nullable regardless.
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- driver star schema -------------------------------------------------

REGION = T.StructType(
    [
        T.StructField("r_regionkey", T.IntegerType(), True),
        T.StructField("r_name", T.StringType(), True),
    ]
)

NATION = T.StructType(
    [
        T.StructField("n_nationkey", T.IntegerType(), True),
        T.StructField("n_name", T.StringType(), True),
        T.StructField("n_regionkey", T.IntegerType(), True),
    ]
)

CUSTOMER = T.StructType(
    [
        T.StructField("c_custkey", T.LongType(), True),
        T.StructField("c_name", T.StringType(), True),
        T.StructField("c_nationkey", T.IntegerType(), True),
        T.StructField("c_acctbal", T.DoubleType(), True),
        T.StructField("c_mktsegment", T.StringType(), True),
    ]
)

SUPPLIER = T.StructType(
    [
        T.StructField("s_suppkey", T.LongType(), True),
        T.StructField("s_name", T.StringType(), True),
        T.StructField("s_nationkey", T.IntegerType(), True),
        T.StructField("s_acctbal", T.DoubleType(), True),
    ]
)

PART = T.StructType(
    [
        T.StructField("p_partkey", T.LongType(), True),
        T.StructField("p_name", T.StringType(), True),
        T.StructField("p_brand", T.StringType(), True),
        T.StructField("p_type", T.StringType(), True),
        T.StructField("p_size", T.IntegerType(), True),
        T.StructField("p_retailprice", T.DoubleType(), True),
    ]
)

ORDERS = T.StructType(
    [
        T.StructField("o_orderkey", T.LongType(), True),
        T.StructField("o_custkey", T.LongType(), True),
        T.StructField("o_orderstatus", T.StringType(), True),
        T.StructField("o_totalprice", T.DoubleType(), True),
        T.StructField("o_orderdate", T.TimestampNTZType(), True),
        T.StructField("o_orderpriority", T.StringType(), True),
    ]
)

LINEITEM = T.StructType(
    [
        T.StructField("l_orderkey", T.LongType(), True),
        T.StructField("l_partkey", T.LongType(), True),
        T.StructField("l_suppkey", T.LongType(), True),
        T.StructField("l_linenumber", T.IntegerType(), True),
        T.StructField("l_quantity", T.DoubleType(), True),
        T.StructField("l_extendedprice", T.DoubleType(), True),
        T.StructField("l_discount", T.DoubleType(), True),
        T.StructField("l_tax", T.DoubleType(), True),
        T.StructField("l_returnflag", T.StringType(), True),
        T.StructField("l_linestatus", T.StringType(), True),
        T.StructField("l_shipdate", T.TimestampNTZType(), True),
    ]
)

# Logical schema after the reader's nanos→micros normalization. ``ts`` is a
# proper instant (TimestampType); the session timezone is pinned to UTC so
# renderings match the oracle's UTC-naive values.
EVENTS = T.StructType(
    [
        T.StructField("event_id", T.LongType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),  # JSON payload
    ]
)

# Physical read schema for events.parquet (TIMESTAMP(NANOS) as raw int64).
EVENTS_PHYSICAL = T.StructType(
    [
        T.StructField("event_id", T.LongType(), True),
        T.StructField("ts", T.LongType(), True),  # ns since epoch
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)

# Physical read schema for events.parquet generations with TIMESTAMP(MICROS,
# isAdjustedToUTC=false) — Spark reads those natively as TimestampNTZ; the
# reader casts to an instant under the UTC session zone.
EVENTS_PHYSICAL_NTZ = T.StructType(
    [
        T.StructField("event_id", T.LongType(), True),
        T.StructField("ts", T.TimestampNTZType(), True),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)

DOCUMENTS = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("n_chars", T.LongType(), True),
    ]
)

EMBEDDINGS = T.StructType(
    [
        T.StructField("vec_id", T.LongType(), True),
        T.StructField("embedding", T.ArrayType(T.FloatType()), True),
        T.StructField("label", T.IntegerType(), True),
    ]
)

TABLES: dict[str, T.StructType] = {
    "region": REGION,
    "nation": NATION,
    "customer": CUSTOMER,
    "supplier": SUPPLIER,
    "part": PART,
    "orders": ORDERS,
    "lineitem": LINEITEM,
    "events": EVENTS,
    "documents": DOCUMENTS,
    "embeddings": EMBEDDINGS,
}

# --- reference-shaped fixtures (FIXTURES.md §A) --------------------------
# Models the CheXpert label table: one row per X-ray, Path + finding columns
# (reference consumes these at src/federated_learning_pipeline.py:30,:61;
# `Pneumonia` is the stratification label, src/preprocessing_pipeline.py:174).

LABELS = T.StructType(
    [
        T.StructField("Path", T.StringType(), False),
        T.StructField("Cardiomegaly", T.DoubleType(), True),
        T.StructField("Pneumonia", T.DoubleType(), True),
        T.StructField("Lung Opacity", T.DoubleType(), True),
        T.StructField("Edema", T.DoubleType(), True),
        T.StructField("Consolidation", T.DoubleType(), True),
    ]
)

# Content-in-column replacement for the reference's filesystem side-effect
# model (src/preprocessing_pipeline.py:39,:51) — shaped like Spark's
# binaryFile source output.
IMAGES = T.StructType(
    [
        T.StructField("Path", T.StringType(), False),
        T.StructField("content", T.BinaryType(), True),
        T.StructField("length", T.LongType(), True),
    ]
)

LABEL_COLUMNS = ["Cardiomegaly", "Pneumonia", "Lung Opacity", "Edema", "Consolidation"]
