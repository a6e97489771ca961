"""Skew mitigation operators.

AQE's skew-join splitting (enabled in session.py) handles sort-merge
join skew at runtime; these operators cover the cases AQE does not:
skewed AGGREGATION keys and skewed broadcast-ineligible joins.

The reference never needed this (single process), but the corpus it
targets is exactly where skew lives at scale: a handful of viral
posts dominate engagement events, stop-word shingles dominate the
dedup inverted index (dedup.py skew note), `-1` outlier topics
dominate assignments (bertopicTest.py:107 counts).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(df: DataFrame, key: str, aggs: Sequence[tuple[str, str, str]],
               *, salt_buckets: int = 16) -> DataFrame:
    """Two-phase aggregation for skewed keys.

    Phase 1 groups on (key, salt) — a hot key's rows spread over
    `salt_buckets` reducers instead of melting one. Phase 2 merges
    the per-salt partials on the true key (tiny input: buckets ×
    distinct keys).

    `aggs` is [(col, fn, alias)] with fn in {sum, count, min, max}:
    the decomposable aggregates (count re-merges as sum; avg callers
    decompose to sum+count themselves). A col of "*" with fn
    "count" counts ROWS (count(1)) — SQL count(*) semantics;
    count on a named column keeps SQL's skip-NULLs semantics, so
    pick "*" when the caller means row count (r4 verdict: counting
    a "never-null" key is a null-semantics landmine).
    """
    merge_fn = {"count": "sum", "sum": "sum", "min": "min", "max": "max"}

    def agg_expr(c, fn):
        if fn == "count" and c == "*":
            return F.count(F.lit(1))
        return getattr(F, fn)(c)

    salted = df.withColumn(
        "__salt", (F.abs(F.hash(F.monotonically_increasing_id())) % salt_buckets))
    phase1 = salted.groupBy(key, "__salt").agg(*[
        agg_expr(c, fn).alias(f"__p_{alias}") for c, fn, alias in aggs
    ])
    phase2 = phase1.groupBy(key).agg(*[
        getattr(F, merge_fn[fn])(f"__p_{alias}").alias(alias)
        for _, fn, alias in aggs
    ])
    return phase2


def salted_join(big: DataFrame, skewed_dim: DataFrame, on: str,
                *, salt_buckets: int = 8) -> DataFrame:
    """Skewed equi-join when the dim side is too big to broadcast:
    salt the big side's key, EXPLODE the dim side across all salts
    (dim rows replicate `salt_buckets`×), join on (key, salt). A hot
    key's rows now land on `salt_buckets` different reducers.

    Use only when (a) broadcast is impossible and (b) AQE's runtime
    skew split isn't available (e.g. shuffled hash join path).
    """
    big_s = big.withColumn(
        "__salt",
        (F.abs(F.hash(F.monotonically_increasing_id())) % salt_buckets).cast("int"))
    dim_s = (skewed_dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1))))
        .withColumn("__salt", F.col("__salt").cast("int")))
    out = big_s.join(dim_s, [on, "__salt"])
    return out.drop("__salt")


def split_skew_join(big: DataFrame, dim: DataFrame, on: str, *,
                    hot_threshold: int, salt_buckets: int = 8) -> DataFrame:
    """Hybrid skew join — the production pattern when a handful of
    hot keys would melt single reducers but salting EVERYTHING would
    replicate the whole dim side `salt_buckets`×: detect the hot
    keys (one key-count aggregation on the big side — key-sized
    output, broadcast back), route hot-key rows through salted_join
    (dim rows for hot keys only replicate across salts) and cold-key
    rows through the plain equi-join, union the halves.

    Result-identical to `big.join(dim, on)` for any threshold — the
    split only reshapes the shuffle. hot_threshold is rows-per-key
    on the big side; set it near (shuffle target rows per task): a
    key under it fits one reducer comfortably by definition.

    At 100 TB the hot set is small by Zipf's law, so the dim
    replication cost is |hot| × salt_buckets rows — negligible —
    while every reducer's input is bounded by max(hot_threshold,
    n_hot_key / salt_buckets).
    """
    counts = big.groupBy(on).agg(F.count(F.lit(1)).alias("__n"))
    hot = counts.filter(F.col("__n") > hot_threshold).select(on)
    big_hot = big.join(F.broadcast(hot), on, "left_semi")
    big_cold = big.join(F.broadcast(hot), on, "left_anti")
    dim_hot = dim.join(F.broadcast(hot), on, "left_semi")
    hot_joined = salted_join(big_hot, dim_hot, on,
                             salt_buckets=salt_buckets)
    cold_joined = big_cold.join(dim, on)
    return hot_joined.select(*cold_joined.columns) \
        .unionByName(cold_joined)
