"""Deterministic corpus sampling and ordering.

Training pipelines need sampling that is REPRODUCIBLE (same docs in,
same docs out — across runs, engines, and cluster sizes) and
join-free. Both operators here are pure maps on a content-stable
md5-derived hash (functions.text.stable_hash31), the same family the
train/val/test split uses: no RNG state, no global coordination,
replayable by the DuckDB oracle bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from parlerproject_spark.functions.text import stable_hash31

#: hash-bucket resolution for sampling fractions (1/10000 granularity)
SAMPLE_BUCKETS = 10_000


def stratified_sample(df: DataFrame, fractions: dict[str, float], *,
                      strata_col: str, id_col: str,
                      default_fraction: float = 0.0) -> DataFrame:
    """Per-stratum deterministic sampling: a row survives iff its
    id's hash bucket (stable_hash31 % 10000) falls under its
    stratum's fraction. Used to rebalance a corpus (e.g. downsample
    over-represented languages) with zero shuffle — the filter runs
    inside the scan stage, and membership is stable as the corpus
    grows."""
    bucket = stable_hash31(F.col(id_col).cast("string")) % SAMPLE_BUCKETS
    thresh: Column = F.lit(int(default_fraction * SAMPLE_BUCKETS))
    for stratum, frac in sorted(fractions.items()):
        thresh = F.when(F.col(strata_col) == stratum,
                        F.lit(int(frac * SAMPLE_BUCKETS))).otherwise(thresh)
    return df.filter(bucket < thresh)


def deterministic_shuffle(df: DataFrame, *, id_col: str,
                          seed: str = "shuffle-v1") -> DataFrame:
    """Reproducible global shuffle: order by md5(seed || id). The
    training-data ordering op — every run (and every engine) yields
    the identical permutation, and changing `seed` re-deals it.
    Physically a range-partitioned sort on a uniformly distributed
    key: no skew by construction, scales as well as any global sort
    can. For write-out, pair with partitionBy/bucketing so shards
    stay the sort's range partitions."""
    key = F.md5(F.concat(F.lit(seed), F.lit(":"),
                         F.col(id_col).cast("string")))
    return df.orderBy(key.asc())
