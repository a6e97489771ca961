"""Python UDF surface beyond scalar UDFs (SURVEY §2.10 absent-set:
UDAF via pandas GROUPED_AGG, UDTF via the Spark-4 decorator).

These exist to prove the engine exposes the full UDF story; the
standing rule still applies — anything expressible as Column
algebra stays JVM-side (both examples here are chosen to be
SQL-replicable so the DuckDB oracle can hash-check the Python path).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql.functions import pandas_udf


_geo_mean_cache = None


def geometric_mean():
    """GROUPED_AGG pandas UDAF: exp(mean(ln(x))) over positive x.
    Arrow hands each group's column as one pandas Series."""
    global _geo_mean_cache
    if _geo_mean_cache is None:
        def _gm(v: pd.Series) -> float:
            arr = v[v > 0].to_numpy(dtype="float64")
            if arr.size == 0:
                return float("nan")
            return float(np.exp(np.log(arr).mean()))
        _geo_mean_cache = pandas_udf(_gm, "double")
    return _geo_mean_cache


def sentence_udtf():
    """UDTF: one input row (id, text) → one output row per sentence.
    Lazily built (the decorator needs a live session)."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id bigint, sentence_no int, sentence string")
    class SplitSentences:
        def eval(self, doc_id, text: str):
            if not text:
                return
            parts = [s.strip() for s in text.split(". ")]
            for i, s in enumerate(parts):
                if s:
                    yield doc_id, i + 1, s

    return SplitSentences
