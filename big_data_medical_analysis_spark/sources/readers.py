"""Schema-checked source readers.

Capability parity with the reference's ingest surface — CSV label scans
(``src/preprocessing_pipeline.py:258-259``), multi-part CSV globs
(``src/federated_learning_pipeline.py:57-59``), image-file reads
(``src/preprocessing_pipeline.py:39``) — re-expressed as declarative Spark
sources so Catalyst gets pushdown and pruning:

- Parquet is the native format (columnar, predicate/column pushdown).
- CSV/JSON readers require an explicit schema (no inference in the data
  plane; the reference infers everywhere).
- ``binaryFile`` replaces in-UDF ``cv2.imread``: content arrives as a
  BinaryType column and every downstream transform is a pure function of it.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from big_data_medical_analysis_spark import schemas


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one driver table (``<sf_dir>/<name>.parquet``) with its declared schema.

    The declared schema is applied to the parquet scan so a file/declaration
    drift fails loudly at read time instead of corrupting downstream plans.

    ``events`` is special-cased: its ``ts`` column is parquet TIMESTAMP(NANOS),
    which Spark's parquet reader rejects (PARQUET_TYPE_ILLEGAL). We read it as
    a raw nanosecond int64 under ``spark.sql.legacy.parquet.nanosAsLong`` and
    normalize to microsecond TimestampNTZ with integer arithmetic (``DIV
    1000`` — float division would lose precision above 2^53 ns).
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        # SESSION-WIDE side effect, deliberate: both confs are runtime
        # SQLConfs that the engine profile (session.py) already pins; they
        # are re-asserted here because the driver's harness hands us a
        # vanilla session that cannot read events.parquet (TIMESTAMP(NANOS))
        # or render instants portably without them. They are idempotent
        # under get_spark sessions; under a foreign session, note that any
        # LATER query inherits UTC rendering — which is exactly the engine's
        # contract (all oracle comparisons assume UTC), so inheriting it is
        # correct, not accidental.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        raw = spark.read.schema(schemas.EVENTS_PHYSICAL).parquet(path)
        return raw.withColumn(
            "ts", F.timestamp_micros(F.expr("ts DIV 1000"))
        ).select([f.name for f in schemas.EVENTS.fields])
    schema = schemas.TABLES.get(name)
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.parquet(path)


def load_tables(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> dict[str, DataFrame]:
    """Load several driver tables at once; defaults to all ten."""
    names = names or list(schemas.TABLES)
    return {n: read_table(spark, sf_dir, n) for n in names}


def register_views(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> None:
    """Register the driver tables as temp views for the SQL entry point."""
    for name, df in load_tables(spark, sf_dir, names).items():
        df.createOrReplaceTempView(name)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    header: bool = True,
) -> DataFrame:
    """CSV scan with an explicit schema.

    Replaces the reference's pandas-on-the-driver ingest
    (``pd.read_csv`` → ``createDataFrame``, ``src/preprocessing_pipeline.py:258-264``)
    with a distributed scan; glob patterns (``dir/*.csv``) subsume the
    reference's manual glob+concat (``src/federated_learning_pipeline.py:57-59``).
    """
    return spark.read.schema(schema).option("header", header).csv(path)


def read_json(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """JSON-lines scan with an explicit schema."""
    return spark.read.schema(schema).json(path)


def read_binary_dir(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
) -> DataFrame:
    """Binary-file scan: one row per file with path/length/content columns.

    The declarative replacement for the reference's side-effecting
    ``cv2.imread`` inside a UDF (``src/preprocessing_pipeline.py:39,:113``):
    bytes become a first-class BinaryType column and decode happens in pure
    Arrow UDFs downstream (operators/multimodal.py).
    """
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)
