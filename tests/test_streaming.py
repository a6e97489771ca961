"""Structured Streaming tests — the same event-time builders the
batch oracle checks, executed incrementally from a file source with
checkpointing (SURVEY §2.9)."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from parlerproject_spark.catalog import load_table
from parlerproject_spark.streaming import events as se


@pytest.fixture(scope="module")
def event_stream_dir(spark, sf_dir):
    """Split the events table into several parquet files so the file
    source has multiple discoverable inputs."""
    d = tempfile.mkdtemp(prefix="evstream_")
    (load_table(spark, "events", sf_dir)
     .repartition(4)
     .write.mode("overwrite").parquet(d))
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _run_stream(spark, df, name):
    q = se.to_memory_sink(df, name)
    q.awaitTermination(120)
    return spark.table(name)


def test_streaming_tumbling_matches_batch(spark, sf_dir, event_stream_dir):
    batch_df = se.tumbling_counts(load_table(spark, "events", sf_dir))
    batch = {(r["window_start"], r["event_type"]): (r["cnt"], r["total_value"])
             for r in batch_df.collect()}

    schema = load_table(spark, "events", sf_dir).schema
    stream = se.read_event_stream(spark, event_stream_dir, schema)
    agg = se.tumbling_counts(se.with_watermark(stream, delay="1 hour"))
    got_df = _run_stream(spark, agg, "t_tumbling")
    got = {(r["window_start"], r["event_type"]): (r["cnt"], r["total_value"])
           for r in got_df.collect()}
    assert got == batch


def test_streaming_session_windows_run(spark, sf_dir, event_stream_dir):
    schema = load_table(spark, "events", sf_dir).schema
    stream = se.read_event_stream(spark, event_stream_dir, schema)
    sess = se.session_counts(se.with_watermark(stream, delay="30 minutes"))
    got = _run_stream(spark, sess, "t_sessions")
    assert got.count() > 0
    # sessions are per-user disjoint activity runs; counts sum to all events
    total = got.agg(F.sum("cnt").alias("s")).collect()[0]["s"]
    assert total == load_table(spark, "events", sf_dir).count()


def test_stateful_running_totals_matches_batch(spark, sf_dir, event_stream_dir):
    """applyInPandasWithState keyed state: after draining the stream,
    each user's last emitted running total equals the batch aggregate."""
    from parlerproject_spark.streaming.stateful import running_user_totals

    schema = load_table(spark, "events", sf_dir).schema
    stream = se.read_event_stream(spark, event_stream_dir, schema)
    q = (running_user_totals(stream)
         .writeStream.format("memory").queryName("t_state")
         .outputMode("update").trigger(availableNow=True).start())
    q.awaitTermination(120)

    # update mode emits one row per touched user per microbatch; the
    # row with the max events_seen is that user's final state.
    got = {r["user_id"]: (r["events_seen"], r["value_sum"])
           for r in (spark.table("t_state")
                     .withColumn("rn", F.row_number().over(
                         Window.partitionBy("user_id")
                         .orderBy(F.col("events_seen").desc())))
                     .filter("rn = 1").collect())}
    batch = {r["user_id"]: (r["n"], r["s"])
             for r in (load_table(spark, "events", sf_dir)
                       .groupBy("user_id")
                       .agg(F.count("*").alias("n"),
                            F.round(F.sum("value"), 4).alias("s")).collect())}
    assert got == batch


def test_streaming_restart_is_exactly_once(spark, sf_dir, event_stream_dir, tmp_path):
    """The reference resumes by checkpoint files (embeddings.py:32-44);
    Structured Streaming's checkpoint makes restart exactly-once: a
    second start over the same checkpoint reprocesses nothing."""
    schema = load_table(spark, "events", sf_dir).schema
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    def start():
        stream = se.read_event_stream(spark, event_stream_dir, schema)
        return (stream.select("event_id")
                .writeStream.format("parquet")
                .option("path", out).option("checkpointLocation", ckpt)
                .outputMode("append").trigger(availableNow=True).start())

    q1 = start()
    q1.awaitTermination(120)
    n1 = spark.read.parquet(out).count()
    q2 = start()  # restart over same checkpoint — no new files
    q2.awaitTermination(120)
    n2 = spark.read.parquet(out).count()
    assert n1 == load_table(spark, "events", sf_dir).count()
    assert n2 == n1


def test_streaming_watermark_drops_late_data(spark, tmp_path):
    """An event older than the watermark must NOT be counted into its
    (already finalized) window — the state-bounding contract that
    makes event-time aggregation viable at scale."""
    import datetime as dt

    d = str(tmp_path / "late_src")
    schema = ("event_id long, user_id long, event_type string, "
              "ts timestamp, value double")

    def write_rows(rows):
        spark.createDataFrame(rows, schema).coalesce(1) \
            .write.mode("append").parquet(d)

    write_rows([(1, 1, "view", dt.datetime(2021, 1, 1, 10, 5), 1.0),
                (2, 1, "view", dt.datetime(2021, 1, 1, 10, 10), 1.0),
                (3, 1, "view", dt.datetime(2021, 1, 1, 13, 30), 1.0)])
    stream = se.read_event_stream(spark, d, spark.read.parquet(d).schema)
    agg = se.tumbling_counts(se.with_watermark(stream, delay="1 hour"))
    q = (agg.writeStream.format("memory").queryName("t_late")
         .outputMode("append").start())
    try:
        q.processAllAvailable()
        # watermark is now 13:30 - 1h = 12:30; this row's 10:00 window
        # is already past it, so the row must be discarded
        write_rows([(4, 1, "view", dt.datetime(2021, 1, 1, 10, 20), 1.0)])
        q.processAllAvailable()
    finally:
        q.stop()
    got = {(r["window_start"], r["event_type"]): r["cnt"]
           for r in spark.table("t_late").collect()}
    assert got[("2021-01-01 10:00:00", "view")] == 2  # late row dropped


def test_stream_stream_join_matches_batch(spark, sf_dir, event_stream_dir):
    """Stream-stream inner join with event-time bounds on both sides
    produces exactly the rows the identical batch join produces."""
    batch_ev = load_table(spark, "events", sf_dir)
    bviews = batch_ev.filter(F.col("event_type") == "view")
    bpurch = batch_ev.filter(F.col("event_type") == "purchase")
    batch = se.view_to_purchase_joins(bviews, bpurch)
    expect = {tuple(r) for r in batch.collect()}

    schema = batch_ev.schema
    sviews = se.with_watermark(
        se.read_event_stream(spark, event_stream_dir, schema)
        .filter(F.col("event_type") == "view"), delay="2 hours")
    spurch = se.with_watermark(
        se.read_event_stream(spark, event_stream_dir, schema)
        .filter(F.col("event_type") == "purchase"), delay="2 hours")
    joined = se.view_to_purchase_joins(sviews, spurch)
    q = (joined.writeStream.format("memory").queryName("t_ssj")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(180)
    got = {tuple(r) for r in spark.table("t_ssj").collect()}
    assert got == expect and len(got) > 0


def test_streaming_dedup_drops_replayed_events(spark, sf_dir, event_stream_dir, tmp_path):
    """At-least-once replay: the same event files delivered twice must
    dedup to the batch-distinct result, with bounded (watermarked)
    key state."""
    import shutil as _sh
    d = str(tmp_path / "dup_stream")
    _sh.copytree(event_stream_dir, d)
    for f in list(__import__("pathlib").Path(event_stream_dir).glob("*.parquet")):
        _sh.copy(f, d + "/dup_" + f.name)  # every file delivered twice

    schema = load_table(spark, "events", sf_dir).schema
    stream = se.read_event_stream(spark, d, schema)
    deduped = se.dedup_events(se.with_watermark(stream, delay="1 hour"))
    got = _run_stream(spark, deduped.groupBy("event_type").count(), "t_dedup")
    batch = {r["event_type"]: r["count"]
             for r in load_table(spark, "events", sf_dir)
             .groupBy("event_type").count().collect()}
    assert {r["event_type"]: r["count"] for r in got.collect()} == batch


def test_foreach_batch_sink_idempotent_by_batch_id(spark, sf_dir, event_stream_dir, tmp_path):
    """foreachBatch: write_fn sees plain batch frames with stable
    batch ids; writing by batch-id path is the idempotence pattern."""
    out = tmp_path / "fb_out"
    out.mkdir()

    def write_fn(batch_df, batch_id):
        batch_df.groupBy("event_type").count().write.mode("overwrite") \
            .parquet(str(out / f"batch_{batch_id}"))

    schema = load_table(spark, "events", sf_dir).schema
    stream = se.read_event_stream(spark, event_stream_dir, schema)
    q = se.foreach_batch_sink(stream, write_fn,
                              checkpoint=str(tmp_path / "fb_ckpt"))
    q.awaitTermination(120)
    parts = sorted(out.glob("batch_*"))
    assert parts, "no micro-batches written"
    total = sum(r["count"] for p in parts
                for r in spark.read.parquet(str(p)).collect())
    assert total == load_table(spark, "events", sf_dir).count()


def test_stream_static_enrich_matches_batch_and_updates_dim(spark, sf_dir,
                                                            event_stream_dir,
                                                            tmp_path):
    """enrich_with_dim on a stream: per-segment counts equal the
    batch plan's, and the static side is re-resolved per micro-batch
    (a dim overwrite is visible without restarting the query)."""
    ev = load_table(spark, "events", sf_dir)
    dim_dir = str(tmp_path / "dim")
    (load_table(spark, "customer", sf_dir)
     .select(F.col("c_custkey").alias("user_id"),
             F.col("c_mktsegment").alias("segment"))
     .write.mode("overwrite").parquet(dim_dir))
    dim = spark.read.parquet(dim_dir)

    batch = {r["segment"]: r["n"]
             for r in se.enrich_with_dim(ev, dim).groupBy("segment")
             .agg(F.count("*").alias("n")).collect()}

    stream = se.read_event_stream(spark, event_stream_dir, ev.schema)
    enriched = (se.enrich_with_dim(stream, dim)
                .groupBy("segment").agg(F.count("*").alias("n")))
    got_df = _run_stream(spark, enriched, "t_enrich")
    got = {r["segment"]: r["n"] for r in got_df.collect()}
    assert got == batch


def test_batch_psi_gate_detects_drift_and_stays_quiet_on_match(spark):
    ref_src = spark.range(1000).select(
        (F.col("id") % 100).cast("double").alias("value"))
    ref = se.value_bucket_shares(ref_src)
    # same distribution → psi ~ 0, no alert
    [quiet] = se.batch_psi_gate(ref_src, ref).collect()
    assert quiet["n"] == 1000 and not quiet["alert"]
    assert abs(quiet["psi"]) < 1e-9
    # drifted batch: everything lands in the top bucket
    drifted = spark.range(500).select(
        (F.lit(90.0) + F.col("id") % 5).alias("value"))
    [hot] = se.batch_psi_gate(drifted, ref).collect()
    assert hot["alert"] and hot["psi"] > 0.2


def test_batch_psi_gate_empty_batch_is_not_drift(spark):
    ref_src = spark.range(100).select(
        (F.col("id") % 100).cast("double").alias("value"))
    ref = se.value_bucket_shares(ref_src)
    empty = ref_src.filter(F.lit(False))
    [r] = se.batch_psi_gate(empty, ref).collect()
    assert r["n"] == 0 and not r["alert"]


def test_batch_psi_gate_runs_inside_foreach_batch(spark, sf_dir,
                                                  event_stream_dir,
                                                  tmp_path):
    """The gate's intended deployment: one PSI row per micro-batch
    appended by foreachBatch; every row reflects only its batch."""
    ev = load_table(spark, "events", sf_dir)
    ref = se.value_bucket_shares(ev)
    out_dir = str(tmp_path / "psi_rows")
    ckpt = str(tmp_path / "ckpt")

    def gate(batch_df, batch_id):
        (se.batch_psi_gate(batch_df, ref)
         .withColumn("batch_id", F.lit(batch_id))
         .write.mode("append").parquet(out_dir))

    stream = se.read_event_stream(spark, event_stream_dir, ev.schema)
    q = (stream.writeStream.foreachBatch(gate)
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    rows = spark.read.parquet(out_dir).collect()
    assert len(rows) >= 1
    assert sum(r["n"] for r in rows) == ev.count()
    # whole-corpus reference vs whole-corpus batches: no alarms
    assert not any(r["alert"] for r in rows)


def test_stream_progress_recorder_captures_batches(spark, sf_dir,
                                                   event_stream_dir,
                                                   tmp_path):
    """StreamProgressRecorder (streaming/progress.py): per-batch
    rows/rates/watermark land in the listener ring, the summary
    totals match the source row count, and the JSON sidecar writes."""
    import time

    from parlerproject_spark.streaming.progress import StreamProgressRecorder

    rec = StreamProgressRecorder(max_batches=64)
    spark.streams.addListener(rec)
    try:
        schema = load_table(spark, "events", sf_dir).schema
        stream = se.read_event_stream(spark, event_stream_dir, schema)
        agg = se.tumbling_counts(se.with_watermark(stream))
        q = (agg.writeStream.format("memory").queryName("t_progress")
             .outputMode("append")
             .trigger(availableNow=True).start())
        q.awaitTermination(120)
        # listener bus is async: give it a beat to drain
        for _ in range(40):
            s = rec.summary("t_progress")
            if s["n_batches"] and s["total_input_rows"]:
                break
            time.sleep(0.25)
        s = rec.summary("t_progress")
        n_src = load_table(spark, "events", sf_dir).count()
        assert s["n_batches"] >= 1
        assert s["total_input_rows"] == n_src
        assert s["last_watermark"] is not None
        paths = rec.write(str(tmp_path))
        import json as _json
        side = _json.load(open([p for p in paths
                                if "t_progress" in p][0]))
        assert side["summary"]["total_input_rows"] == n_src
        assert len(side["batches"]) == s["n_batches"]
    finally:
        spark.streams.removeListener(rec)


def test_streaming_validation_gate_matches_batch_and_is_idempotent(
        spark, sf_dir, event_stream_dir, tmp_path):
    """validation_sink: per-batch expectation reports equal running
    expect_suite on the same rows, batch replay overwrites its own
    subdirectory, and the served union carries every batch."""
    from parlerproject_spark.operators.validation import (
        Expectation, expect_suite, serve_validation_reports,
        validation_sink)
    rules = [
        Expectation("eid_nn", "not_null", "event_id"),
        Expectation("value_range", "in_range", "value",
                    params={"lo": 0.0, "hi": 1e12}),
        Expectation("type_nn", "not_null", "event_type"),
    ]
    schema = load_table(spark, "events", sf_dir).schema
    stream = se.read_event_stream(spark, event_stream_dir, schema)
    out = str(tmp_path / "gate")
    ckpt = str(tmp_path / "ckpt")
    q = validation_sink(stream, rules, out, checkpoint=ckpt)
    q.awaitTermination(120)

    rep = serve_validation_reports(spark, out)
    batch_ids = [r["batch_id"] for r in
                 rep.select("batch_id").distinct().collect()]
    assert len(batch_ids) >= 1
    # summed per-batch counters == one-shot suite over the full table
    got = {r["rule"]: (r["nc"], r["nf"]) for r in
           rep.groupBy("rule").agg(
               F.sum("n_checked").alias("nc"),
               F.sum("n_failed").alias("nf")).collect()}
    want = {r["rule"]: (r["n_checked"], r["n_failed"]) for r in
            expect_suite(load_table(spark, "events", sf_dir),
                         rules).collect()}
    assert got == want
    # restart with the same checkpoint: no new batches, no dup rows
    n_rows = rep.count()
    q2 = validation_sink(stream, rules, out, checkpoint=ckpt)
    q2.awaitTermination(120)
    assert serve_validation_reports(spark, out).count() == n_rows
