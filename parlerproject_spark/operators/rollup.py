"""Incremental time-bucketed rollups + mergeable-sketch aggregation.

The 100 TB pre-aggregation pattern behind every petabyte OLAP serving
layer (the "hypertable rollup" / incremental-materialized-view
shape): keep one PARTIAL aggregate row per (time bucket, key) and
maintain it by merging deltas — a refresh touches only the buckets
the delta lands in, never the raw history. Serving reads the partial
table (days→months via re-aggregation), also never the raw events.

This works exactly when every measure is mergeable:
  count/sum      merge = sum of partials
  min/max        merge = min/max of partials
  distinct count HLL sketch        (F.hll_sketch_agg / hll_union_agg)
  set overlap    theta sketch      (F.theta_sketch_agg / theta_*)
  quantiles      KLL sketch        (F.kll_sketch_agg_* / merge)
avg derives from (sum, count) at read time; exact median does NOT
merge — that is what the KLL sketch is for.

The reference has no incremental layer (it recomputes per run); this
generalizes its per-run metrics (code/metrics, SURVEY §2.11) to the
shape a standing 100 TB corpus needs. All plans are one hash
exchange per aggregation — partial rows only, never raw data.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: partial-state measure columns produced per (bucket, keys) row
_STATE_COLS = ("n_rows", "sum_value", "min_value", "max_value")


def partial_rollup(events: DataFrame, *, bucket: F.Column,
                   key_cols: Sequence[str], value_col: str,
                   bucket_alias: str = "bucket") -> DataFrame:
    """One partial-aggregate row per (bucket, key): the mergeable
    state (count, sum, min, max) of `value_col`. One hash exchange;
    map-side partial aggregation halves the shuffle by construction.
    """
    return (events
            .groupBy(bucket.alias(bucket_alias), *key_cols)
            .agg(F.count("*").alias("n_rows"),
                 F.sum(value_col).alias("sum_value"),
                 F.min(value_col).alias("min_value"),
                 F.max(value_col).alias("max_value")))


def merge_rollups(*rollups: DataFrame) -> DataFrame:
    """Fold any number of partial tables into one — the incremental
    refresh step. Union (zero shuffle) + one re-aggregation on
    (bucket, keys); overlapping buckets merge, disjoint ones pass
    through. Associative and commutative, so deltas can land in any
    order and any batching."""
    assert rollups, "merge_rollups needs at least one input"
    out = rollups[0]
    for r in rollups[1:]:
        out = out.unionByName(r)
    group_cols = [c for c in out.columns if c not in _STATE_COLS]
    return (out.groupBy(*group_cols)
            .agg(F.sum("n_rows").alias("n_rows"),
                 F.sum("sum_value").alias("sum_value"),
                 F.min("min_value").alias("min_value"),
                 F.max("max_value").alias("max_value")))


def coarsen_rollup(rollup: DataFrame, *, bucket: F.Column,
                   key_cols: Sequence[str],
                   bucket_alias: str = "bucket") -> DataFrame:
    """Serve a coarser grain from the partial table (day rows →
    month totals): re-aggregate the PARTIALS under the coarser
    bucket expression — the raw events are never read again."""
    return (rollup
            .groupBy(bucket.alias(bucket_alias), *key_cols)
            .agg(F.sum("n_rows").alias("n_rows"),
                 F.sum("sum_value").alias("sum_value"),
                 F.min("min_value").alias("min_value"),
                 F.max("max_value").alias("max_value")))


def finalize_rollup(rollup: DataFrame) -> DataFrame:
    """Read-time derived measures: avg from (sum, count). Kept out
    of the state — avg does not merge, its components do."""
    return rollup.withColumn(
        "avg_value", F.col("sum_value") / F.col("n_rows"))


def rollup_sink(stream_events: DataFrame, path: str, *, bucket: F.Column,
                key_cols: Sequence[str], value_col: str,
                checkpoint: str, bucket_alias: str = "bucket"):
    """Maintain the partial table FROM A STREAM: each micro-batch
    aggregates to partial rows (batch-local groupBy — tiny) and lands
    them under `path`/batch=<id>. Replayed batches overwrite their own
    subdirectory, so the sink is idempotent across restarts (same
    exactly-once recipe as streaming/events.foreach_batch_sink).
    Serving merges partials at read time (`serve_rollup`); nothing
    ever rewrites history, a refresh only ADDS partial rows — the
    incremental-materialized-view maintenance loop at stream pace.
    Returns the started StreamingQuery."""
    import os

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        part = partial_rollup(batch_df, bucket=bucket, key_cols=key_cols,
                              value_col=value_col,
                              bucket_alias=bucket_alias)
        part.write.mode("overwrite").parquet(
            os.path.join(path, f"batch={batch_id}"))

    return (stream_events.writeStream.foreachBatch(write_batch)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True).start())


def serve_rollup(spark, path: str) -> DataFrame:
    """Read-side merge of every batch's partial rows → one row per
    (bucket, keys). The only full pass is over PARTIAL rows (batches
    × buckets × keys — orders of magnitude under the raw stream).
    The `batch` directory column must NOT survive into the merge
    group-by — it exists only for replay idempotency; leaving it in
    would keep per-batch rows separate instead of folding them."""
    return merge_rollups(spark.read.parquet(path).drop("batch"))


# ---------------------------------------------------------------------------
# Mergeable sketches (Apache DataSketches via Spark 4 built-ins)
# ---------------------------------------------------------------------------


def distinct_sketch_rollup(events: DataFrame, *, bucket: F.Column,
                           key_cols: Sequence[str], id_col: str,
                           lg_k: int = 12,
                           bucket_alias: str = "bucket") -> DataFrame:
    """Per-(bucket, key) HLL sketch of `id_col` — the mergeable
    distinct-count state. `lg_k=12` ⇒ ~1.6 kB per sketch, ~1.6%
    relative error; the whole partial table for a year of daily
    buckets × 1k keys is ~600 MB — served from memory while the raw
    100 TB stays cold."""
    return (events
            .groupBy(bucket.alias(bucket_alias), *key_cols)
            .agg(F.hll_sketch_agg(F.col(id_col), F.lit(lg_k))
                 .alias("hll_state")))


def merge_distinct_sketches(rollup: DataFrame, *,
                            key_cols: Sequence[str]) -> DataFrame:
    """Collapse sketch partials across buckets → one estimate per
    key. hll_union_agg merges sketch STATE (set semantics: an id
    seen in many buckets counts once) — summing per-bucket distinct
    counts would double-count movers; merging sketches cannot."""
    return (rollup.groupBy(*key_cols)
            .agg(F.hll_sketch_estimate(
                F.hll_union_agg(F.col("hll_state")))
                .alias("approx_distinct")))


def theta_segment_sketches(events: DataFrame, *, segment_col: str,
                           id_col: str) -> DataFrame:
    """One theta sketch per segment — unlike HLL, theta supports
    intersection/difference, i.e. audience-overlap algebra."""
    return (events.groupBy(segment_col)
            .agg(F.theta_sketch_agg(F.col(id_col)).alias("theta_state")))


def theta_overlap(sketches: DataFrame, *, segment_col: str,
                  seg_a: str, seg_b: str) -> DataFrame:
    """|A|, |B|, |A∩B|, |A∪B| estimates for two segments from their
    sketches alone (driver never sees ids). Two broadcast-sized
    single-row sides — the raw table is untouched."""
    a = sketches.filter(F.col(segment_col) == seg_a) \
        .select(F.col("theta_state").alias("sa"))
    b = sketches.filter(F.col(segment_col) == seg_b) \
        .select(F.col("theta_state").alias("sb"))
    both = a.crossJoin(F.broadcast(b))
    return both.select(
        F.theta_sketch_estimate(F.col("sa")).alias("n_a"),
        F.theta_sketch_estimate(F.col("sb")).alias("n_b"),
        F.theta_sketch_estimate(
            F.theta_intersection(F.col("sa"), F.col("sb"))).alias("n_both"),
        F.theta_sketch_estimate(
            F.theta_union(F.col("sa"), F.col("sb"))).alias("n_either"))


def quantile_sketch_rollup(events: DataFrame, *, bucket: F.Column,
                           key_cols: Sequence[str], value_col: str,
                           k: int = 200,
                           bucket_alias: str = "bucket") -> DataFrame:
    """Per-(bucket, key) KLL sketch of a double measure — mergeable
    quantile state (exact median/p99 do NOT merge across partials;
    the sketch is the scalable substitute)."""
    return (events
            .groupBy(bucket.alias(bucket_alias), *key_cols)
            .agg(F.kll_sketch_agg_double(
                F.col(value_col).cast("double"), F.lit(k))
                .alias("kll_state")))


def merge_quantile_sketches(rollup: DataFrame, *,
                            key_cols: Sequence[str],
                            quantiles: Sequence[float] = (0.5, 0.95, 0.99),
                            ) -> DataFrame:
    """Merge KLL partials across buckets and read out quantiles —
    columns q_50, q_95, ... per key.

    Spark exposes KLL merge only as the pairwise scalar
    `kll_sketch_merge_double` (no merge AGGREGATE, unlike
    hll_union_agg), so the cross-bucket fold is collect_list + a HOF
    reduce over the sketch buffers. Safe because the list length is
    the number of BUCKETS per key (e.g. 365 for a year of days) —
    bounded by construction, independent of row count."""
    merged = (rollup.groupBy(*key_cols)
              .agg(F.collect_list("kll_state").alias("states"))
              .withColumn(
                  "kll",
                  F.aggregate(
                      F.slice(F.col("states"), 2,
                              F.greatest(F.size("states") - 1, F.lit(0))),
                      F.element_at(F.col("states"), 1),
                      lambda acc, x: F.kll_sketch_merge_double(acc, x))))
    cols = [
        F.kll_sketch_get_quantile_double(F.col("kll"), F.lit(float(q)))
        .alias(f"q_{int(q * 100)}")
        for q in quantiles
    ]
    return merged.select(*key_cols, *cols)
