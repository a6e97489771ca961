"""Event-time operators — usable on BOTH batch and streaming frames.

Each builder takes a DataFrame (static or streaming) with an
event-time column and returns the transformed frame; the same
logical op is oracle-checked in batch (queries.py) and exercised
under `readStream` in tests (tests/test_streaming.py). That duality
is the point: Structured Streaming's incremental execution of the
identical plan replaces the reference's hand-rolled checkpoint
loops (code/embeddings.py:62-65,129-133).

Scale notes: watermarks bound state (late data beyond the horizon is
dropped, state for closed windows is evicted); session windows merge
per-key state and need the key in the groupBy to partition state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_watermark(df: DataFrame, ts_col: str = "ts",
                   delay: str = "10 minutes") -> DataFrame:
    """Bound event-time lateness; on batch frames this is a no-op
    marker (Spark ignores watermarks in batch), so builders can be
    shared verbatim.

    Watermarks demand TIMESTAMP (not NTZ); the session is pinned UTC
    (catalog.load_table), so the cast is value-identity."""
    return (df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
            .withWatermark(ts_col, delay))


def tumbling_counts(df: DataFrame, *, ts_col: str = "ts", width: str = "1 hour",
                    keys: tuple[str, ...] = ("event_type",)) -> DataFrame:
    """Non-overlapping event-time windows → count + value sum.
    Columns: window_start, *keys, cnt, total_value."""
    return (df.groupBy(F.window(ts_col, width).alias("w"), *keys)
            .agg(F.count("*").alias("cnt"),
                 F.round(F.sum("value"), 4).alias("total_value"))
            .select(F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss")
                    .alias("window_start"), *keys, "cnt", "total_value"))


def sliding_counts(df: DataFrame, *, ts_col: str = "ts", width: str = "1 hour",
                   slide: str = "30 minutes") -> DataFrame:
    """Overlapping windows (each event lands in width/slide windows).
    Columns: window_start, cnt."""
    return (df.groupBy(F.window(ts_col, width, slide).alias("w"))
            .agg(F.count("*").alias("cnt"))
            .select(F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss")
                    .alias("window_start"), "cnt"))


def session_counts(df: DataFrame, *, ts_col: str = "ts", gap: str = "5 minutes",
                   key: str = "user_id") -> DataFrame:
    """Session windows: activity runs per key separated by > gap.
    Columns: <key>, session_start, cnt.

    In streaming this is merging keyed state; in batch Catalyst
    rewrites it to the same gaps-and-islands computation the oracle
    SQL spells out (queries.py session_window_events)."""
    return (df.groupBy(F.col(key), F.session_window(ts_col, gap).alias("w"))
            .agg(F.count("*").alias("cnt"))
            .select(key,
                    F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss")
                    .alias("session_start"), "cnt"))


def read_event_stream(spark, path: str, schema) -> DataFrame:
    """File-source stream over a directory of event files — the
    idiomatic replacement for resume-at-offset ingestion: the source
    tracks processed files in the checkpoint, so restarts are
    exactly-once without any manual bookkeeping
    (vs ID_matching_metadata.py:78-83's row-count resume)."""
    return (spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 16)  # I4 rate limiting, declaratively
            .parquet(path))


def to_memory_sink(df: DataFrame, name: str, *, mode: str = "complete"):
    """Test/debug sink: materialize a streaming aggregate into an
    in-memory table. Returns the StreamingQuery."""
    return (df.writeStream.format("memory").queryName(name)
            .outputMode(mode).trigger(availableNow=True).start())


def dedup_events(df: DataFrame, *, key_cols: tuple[str, ...] = ("event_id",),
                 ts_col: str = "ts") -> DataFrame:
    """Exactly-once event dedup by key — at-least-once sources
    (replayed files, Kafka redeliveries) emit duplicates; this drops
    them. On a WATERMARKED stream Spark keeps per-key state only
    until the key's event time expires past the watermark
    (dropDuplicatesWithinWatermark — bounded state, the 100 TB
    requirement); on batch frames plain dropDuplicates is the same
    logical op. Key state is hash-partitioned, so dedup scales with
    the key space, not the stream length."""
    if df.isStreaming:
        return df.dropDuplicatesWithinWatermark(list(key_cols))
    return df.dropDuplicates(list(key_cols))


def foreach_batch_sink(df: DataFrame, write_fn, *, checkpoint: str):
    """Micro-batch sink: `write_fn(batch_df, batch_id)` runs once per
    micro-batch with a NORMAL batch DataFrame — the escape hatch for
    sinks Spark lacks connectors for (the reference's per-record
    status-log appends, S10/S12, map here). Exactly-once comes from
    the checkpoint: a restarted query re-offers a batch with the SAME
    batch_id, so an idempotent write_fn (write-by-batch-id path,
    upsert) never double-applies. Returns the StreamingQuery."""
    return (df.writeStream.foreachBatch(write_fn)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True).start())


def view_to_purchase_joins(views: DataFrame, purchases: DataFrame, *,
                           ts_col: str = "ts", within: str = "1 hour",
                           key: str = "user_id") -> DataFrame:
    """Stream-stream inner join: purchases matched to a preceding
    view by the same user within `within`. On streams BOTH sides
    must carry watermarks (passed in pre-watermarked) and the join
    condition must bound event time on both ends — that bound is
    what lets Spark expire buffered state instead of holding each
    side forever; on batch frames the same expression is a plain
    range join. Columns: user_id, view_ts, purchase_ts, value.
    """
    v = views.select(F.col(key).alias("v_user"),
                     F.col(ts_col).alias("view_ts"))
    p = purchases.select(F.col(key).alias("p_user"),
                         F.col(ts_col).alias("purchase_ts"),
                         F.col("value"))
    cond = ((F.col("v_user") == F.col("p_user"))
            & (F.col("purchase_ts") >= F.col("view_ts"))
            & (F.col("purchase_ts") <= F.col("view_ts") + F.expr(
                f"INTERVAL {within}")))
    return (v.join(p, cond)
            .select(F.col("v_user").alias(key),
                    F.date_format("view_ts", "yyyy-MM-dd HH:mm:ss")
                    .alias("view_ts"),
                    F.date_format("purchase_ts", "yyyy-MM-dd HH:mm:ss")
                    .alias("purchase_ts"), "value"))
