"""Public column-expression library: every reusable, pure Column->Column
builder the engine defines, re-exported from the operator modules that own
them. Import surface for users composing their own queries:

    from big_data_medical_analysis_spark import functions as EF
    docs.select(EF.normalized_fingerprint("text"), EF.shingles("text"))

These are expression builders (JVM-side Catalyst trees — codegen or HOF,
never Python UDFs); the Arrow-vectorized UDF surface lives in
``operators/udf_surface.py`` and ``operators/multimodal.py``.
"""

from big_data_medical_analysis_spark.operators.common import (  # noqa: F401
    cents,
    date_str,
    money_avg,
    money_sum,
    ts_str,
)
from big_data_medical_analysis_spark.operators.dedup import (  # noqa: F401
    minhash_signature,
    normalized_fingerprint,
    shingles,
    simhash,
)
from big_data_medical_analysis_spark.operators.similarity import (  # noqa: F401
    cosine,
    int_dot,
    int_norm2,
)

__all__ = [
    # exact-arithmetic aggregation (operators/common.py)
    "cents",
    "money_sum",
    "money_avg",
    # timestamp rendering (operators/common.py)
    "ts_str",
    "date_str",
    # dedup fingerprints (operators/dedup.py)
    "normalized_fingerprint",
    "shingles",
    "simhash",
    "minhash_signature",
    # vector math (operators/similarity.py)
    "int_dot",
    "int_norm2",
    "cosine",
]
