"""Custom Python Data Source (Spark 4 ``pyspark.sql.datasource`` API): a
splittable, filter-pushdown-capable reader for numpy ``.npy`` embedding
matrices — the format embedding dumps actually arrive in from training jobs.

Why this exists: the reference ingests arrays through driver-side numpy
(pandas→createDataFrame); a 100 TB embedding store can't pass through the
driver. This source gives the matrix file a real scan operator:

- **Splittable**: the npy header yields (nrows, dim, itemsize, data offset);
  row ranges are byte ranges, so one file fans out to N partitions the same
  way any splittable format does. At scale an embedding store is a DIRECTORY
  of shard files — the same partition planner then emits (file, row-range)
  pairs; a single giant file is the degenerate single-shard case.
- **Filter pushdown**: ``vec_id`` IS the row index (verified against the
  parquet twin), so ``vec_id < k`` / ``>= k`` / ``= k`` prune row ranges
  BEFORE any byte is read — predicate pushdown reaching a pure-Python
  source (gated on ``spark.sql.python.filterPushdown.enabled``; the scan is
  correct either way, Spark re-applies residual filters after the scan).
- **Arrow batches**: ``read`` yields ``pyarrow.RecordBatch`` (one per
  partition slice), not per-row tuples — the vectorized crossing, same
  discipline as every other Python boundary in this engine.

The npy fixture is materialized once per sf_dir from the parquet twin
(driver-side, test scaffolding only — at 100 TB the shards already exist;
nothing here ships table data through the driver at query time).
"""

from __future__ import annotations

import ast
import os
import struct

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    SimpleDataSourceStreamReader,
)

from big_data_medical_analysis_spark.registry import register

NPY_SOURCE_NAME = "npy_embeddings"


def parse_npy_header(path: str) -> tuple[int, int, int, int]:
    """(n_rows, dim, itemsize, data_offset) from a v1/v2 .npy header.
    Only little-endian float32 C-order 2-D matrices are accepted — the
    layout np.save writes for an embedding matrix."""
    with open(path, "rb") as f:
        magic = f.read(8)
        if magic[:6] != b"\x93NUMPY":
            raise ValueError(f"not an npy file: {path}")
        major = magic[6]
        if major == 1:
            (hlen,) = struct.unpack("<H", f.read(2))
            data_offset = 10 + hlen
        else:
            (hlen,) = struct.unpack("<I", f.read(4))
            data_offset = 12 + hlen
        header = ast.literal_eval(f.read(hlen).decode("latin1").strip())
    if header["fortran_order"] or header["descr"] not in ("<f4", "|f4"):
        raise ValueError(f"unsupported npy layout: {header}")
    n_rows, dim = header["shape"]
    return n_rows, dim, 4, data_offset


class NpyRowRange(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class NpyEmbeddingReaderBase(DataSourceReader):
    """Plain splittable reader — no ``pushFilters`` attribute, because Spark
    REFUSES to run a reader that defines it while
    ``spark.sql.python.filterPushdown.enabled`` is false (hard
    AnalysisException, not a silent fallback). Pushdown is therefore opt-in
    twice: the session conf AND ``.option("pushdown", "true")`` select the
    subclass below."""

    def __init__(self, options: dict):
        self.path = options["path"]
        self.n_splits = int(options.get("n_splits", "8"))
        self.batch_rows = int(options.get("batch_rows", "4096"))
        # pushed vec_id bounds (row-index semantics): half-open [lo, hi)
        self.lo = 0
        self.hi: int | None = None

    # -- planning ----------------------------------------------------------
    def partitions(self):
        n_rows, _, _, _ = parse_npy_header(self.path)
        lo = min(self.lo, n_rows)
        hi = n_rows if self.hi is None else min(self.hi, n_rows)
        if hi <= lo:
            return [NpyRowRange(0, 0)]
        span = hi - lo
        n = min(self.n_splits, span)
        step = -(-span // n)
        return [
            NpyRowRange(lo + i * step, min(lo + (i + 1) * step, hi))
            for i in range(n)
            if lo + i * step < hi
        ]

    # -- execution ---------------------------------------------------------
    def read(self, partition: NpyRowRange):
        if partition.end <= partition.start:
            return
        mat = np.load(self.path, mmap_mode="r")
        dim = mat.shape[1]
        for s in range(partition.start, partition.end, self.batch_rows):
            e = min(s + self.batch_rows, partition.end)
            chunk = np.ascontiguousarray(mat[s:e])
            ids = pa.array(np.arange(s, e, dtype=np.int64))
            flat = pa.array(chunk.reshape(-1), type=pa.float32())
            offsets = pa.array(
                np.arange(0, (e - s + 1) * dim, dim, dtype=np.int32)
            )
            emb = pa.ListArray.from_arrays(offsets, flat)
            yield pa.RecordBatch.from_arrays([ids, emb], ["vec_id", "embedding"])


class NpyEmbeddingReader(NpyEmbeddingReaderBase):
    """The pushdown-capable variant (see base-class note on why the two
    are separate classes)."""

    # -- pushdown ----------------------------------------------------------
    def pushFilters(self, filters):  # noqa: N802 (API name)
        """Consume vec_id range predicates (row-index semantics — each one
        tightens [lo, hi) so partition planning prunes byte ranges); yield
        everything else back as unsupported for Spark to re-apply."""
        for f in filters:
            attr = tuple(f.attribute) if hasattr(f, "attribute") else None
            if attr == ("vec_id",) and isinstance(
                f, (EqualTo, LessThan, LessThanOrEqual, GreaterThan, GreaterThanOrEqual)
            ):
                v = int(f.value)
                if isinstance(f, EqualTo):
                    self.lo = max(self.lo, v)
                    self.hi = v + 1 if self.hi is None else min(self.hi, v + 1)
                elif isinstance(f, LessThan):
                    self.hi = v if self.hi is None else min(self.hi, v)
                elif isinstance(f, LessThanOrEqual):
                    self.hi = v + 1 if self.hi is None else min(self.hi, v + 1)
                elif isinstance(f, GreaterThan):
                    self.lo = max(self.lo, v + 1)
                else:
                    self.lo = max(self.lo, v)
            else:
                yield f


class NpyEmbeddingDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return NPY_SOURCE_NAME

    def schema(self) -> str:
        return "vec_id bigint, embedding array<float>"

    def reader(self, schema) -> NpyEmbeddingReaderBase:
        if self.options.get("pushdown", "false").lower() == "true":
            return NpyEmbeddingReader(self.options)
        return NpyEmbeddingReaderBase(self.options)

    def simpleStreamReader(self, schema):  # noqa: N802 (API name)
        return NpySimpleStreamReader(self.options)


# ---------------------------------------------------------------------------
# Fixture + registered query
# ---------------------------------------------------------------------------

def _fixture_root() -> str:
    """Per-user fixture root, 0700, OWNERSHIP-VERIFIED (common.
    per_user_tmpdir): a world-shared /tmp path trusted by mtime is
    squattable — another local user pre-creates the file (or the whole
    root, which bare makedirs(exist_ok=True) would accept) with a fresh
    mtime and their bytes get served. Executors are the same user in
    local mode, and on a real cluster the fixture concept doesn't exist
    (shards are already on shared storage)."""
    from big_data_medical_analysis_spark.operators.common import (
        per_user_tmpdir,
    )

    return per_user_tmpdir("spark_graft_npy")


def npy_fixture_path(sf_dir: str) -> str:
    """Materialize <sf_dir>/embeddings.parquet as an .npy matrix once
    (row i = vec_id i — contiguity is asserted, it's what makes vec_id
    pushdown row-range pruning sound). Each writer saves to a unique
    mkstemp name in the target dir before os.replace, so concurrent
    callers never interleave writes into one tmp file and never see a
    torn fixture; a fixture older than its parquet twin is rebuilt, so a
    regenerated sf_dir can't serve stale vectors."""
    import tempfile

    tag = os.path.basename(os.path.normpath(sf_dir))
    path = os.path.join(_fixture_root(), tag, "embeddings.npy")
    src = os.path.join(sf_dir, "embeddings.parquet")
    if os.path.exists(path) and (
        not os.path.exists(src)  # twin archived: serve the cached fixture
        or os.path.getmtime(path) >= os.path.getmtime(src)
    ):
        return path
    import pyarrow.parquet as pq

    os.makedirs(os.path.dirname(path), mode=0o700, exist_ok=True)
    t = pq.read_table(src)
    df = t.to_pandas().sort_values("vec_id").reset_index(drop=True)
    if not (df["vec_id"].to_numpy() == np.arange(len(df))).all():
        raise ValueError("vec_id is not the contiguous row index")
    mat = np.stack(df["embedding"].to_numpy()).astype(np.float32)
    fd, tmp = tempfile.mkstemp(suffix=".npy", dir=os.path.dirname(path))
    try:
        with os.fdopen(fd, "wb") as f:
            np.save(f, mat)
        # mkstemp's 0600 is the right mode: the root is per-user 0700 and
        # only this user's executors (same uid in local mode) read it
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise
    return path


_NPY_HALF = 250  # sf-independent probe bound; see docstring

_NPY_SCAN_SQL = f"""
SELECT CAST(vec_id % 10 AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS n_vecs,
       CAST(sum(CAST(round(sqrt(CAST(list_sum(list_transform(embedding,
              y -> CAST(round(y::DOUBLE * 1000000) AS BIGINT)
                   * CAST(round(y::DOUBLE * 1000000) AS BIGINT)))
            AS DOUBLE))) AS BIGINT)) AS DOUBLE) / 1000000.0 AS sum_norm
FROM embeddings
WHERE vec_id < {_NPY_HALF}
GROUP BY 1
"""


@register("npy_source_norms", oracle=_NPY_SCAN_SQL, category="source")
def npy_source_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end scan through the custom Python Data Source: the
    embeddings matrix read back from .npy via ``npy_embeddings`` (row-range
    partitions, Arrow-batch rows), filtered to vec_id < {_NPY_HALF} —
    a predicate ``pushFilters`` turns into byte-range pruning when
    ``spark.sql.python.filterPushdown.enabled`` is on (set here; the plan
    is correct either way) — then aggregated to per-bucket exact-integer
    L2 norm sums that the DuckDB oracle reproduces from the PARQUET twin.
    Value-hash equality across two different physical formats and two
    engines is the roundtrip proof.

    Norm arithmetic matches the engine convention: float32 components are
    scaled to exact int64 micro-units before squaring (no fp-order drift),
    one sqrt per vector rounded back to integer micro-units, summed in
    int64.
    """
    try:
        spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    except Exception:
        pass  # unknown on older builds; scan stays correct without pushdown
    try:
        spark.dataSource.register(NpyEmbeddingDataSource)
    except Exception:
        pass  # already registered in this session
    path = npy_fixture_path(sf_dir)
    df = (
        spark.read.format(NPY_SOURCE_NAME)
        .option("path", path)
        .option("n_splits", "8")
        .option("pushdown", "true")
        .load()
        .filter(F.col("vec_id") < _NPY_HALF)
    )
    sq = F.transform(
        "embedding",
        lambda y: F.round(y.cast("double") * 1000000).cast("long")
        * F.round(y.cast("double") * 1000000).cast("long"),
    )
    norm_micro = F.round(
        F.sqrt(
            F.aggregate(
                sq, F.lit(0).cast("long"), lambda a, x: a + x
            ).cast("double")
        )
    ).cast("long")
    return (
        df.select(
            F.pmod("vec_id", F.lit(10)).cast("long").alias("bucket"),
            norm_micro.alias("nm"),
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            (F.sum("nm").cast("double") / 1000000.0).alias("sum_norm"),
        )
    )


# ---------------------------------------------------------------------------
# Streaming side: SimpleDataSourceStreamReader over the same matrix
# ---------------------------------------------------------------------------


class NpySimpleStreamReader(SimpleDataSourceStreamReader):
    """Micro-batch tail over the matrix: offset = {"row": k}; each batch
    serves the next ``stream_batch_rows`` rows. Models the arrival pattern
    of embedding shards from a training job (append-only, replayable by
    offset range — ``readBetweenOffsets`` re-serves any committed slice, so
    recovery is exactly-once). State is ONE integer; at scale the offset
    would be (shard file, row) and ``initialOffset`` would list the shard
    directory."""

    def __init__(self, options: dict):
        self.path = options["path"]
        self.batch = int(options.get("stream_batch_rows", "100"))
        self.n_rows, self.dim, _, _ = parse_npy_header(self.path)

    def initialOffset(self) -> dict:  # noqa: N802 (API name)
        return {"row": 0}

    def _slice(self, s: int, e: int):
        # a list ITERATOR: the prefetch wrapper advances it (so a bare list
        # fails) and then pickles it to ship rows to executors (so a
        # generator fails) — list iterators are the type that does both
        if e <= s:
            return iter([])
        mat = np.load(self.path, mmap_mode="r")
        chunk = np.asarray(mat[s:e], dtype=np.float32)
        return iter(
            [(int(s + i), [float(x) for x in chunk[i]]) for i in range(e - s)]
        )

    def read(self, start: dict):
        s = int(start["row"])
        e = min(s + self.batch, self.n_rows)
        return self._slice(s, e), {"row": e}

    def readBetweenOffsets(self, start: dict, end: dict):  # noqa: N802
        return self._slice(int(start["row"]), int(end["row"]))

    def commit(self, end: dict) -> None:
        pass  # no upstream to acknowledge; offsets live in the checkpoint
