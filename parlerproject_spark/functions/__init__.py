"""Scalar expression libraries.

Everything here is built from `pyspark.sql.functions` Column
expressions (JVM-side, whole-stage-codegen eligible) unless a
docstring explicitly says pandas_udf. Keeping the hot path out of
Python is the engine's core performance rule (SURVEY §4).
"""

from parlerproject_spark.functions.text import (
    normalize_ws,
    tokenize,
    token_count,
    quality_score,
    fingerprint_md5,
    stable_hash31,
)
from parlerproject_spark.functions.geo import dms_to_decimal
from parlerproject_spark.functions.vectors import dot, l2_norm, cosine, l2_normalize

__all__ = [
    "normalize_ws",
    "tokenize",
    "token_count",
    "quality_score",
    "fingerprint_md5",
    "stable_hash31",
    "dms_to_decimal",
    "dot",
    "l2_norm",
    "cosine",
    "l2_normalize",
]
