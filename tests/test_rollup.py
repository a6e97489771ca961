"""Incremental rollup + mergeable-sketch contracts (operators/rollup).

The property that makes the module correct at 100 TB is MERGEABILITY:
partial-aggregate state combined across arbitrary delta splits must
equal the direct aggregate over the union. The exact measures get a
hash oracle too (queries.py); these tests pin the algebra itself plus
the sketch accuracy bounds no SQL oracle can express.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from parlerproject_spark.catalog import load_table
from parlerproject_spark.operators import rollup as R


def _events(spark, sf_dir):
    return load_table(spark, "events", sf_dir)


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_partial_merge_equals_direct_any_split(spark, sf_dir):
    e = _events(spark, sf_dir)
    day = F.date_trunc("day", F.col("ts"))
    direct = R.partial_rollup(e, bucket=day, key_cols=["event_type"],
                              value_col="value")
    # a deliberately lopsided 3-way split on an unrelated column
    splits = [e.filter(F.col("event_id") % 7 == 0),
              e.filter(F.col("event_id") % 7 == 1),
              e.filter(F.col("event_id") % 7 > 1)]
    merged = R.merge_rollups(*[
        R.partial_rollup(s, bucket=day, key_cols=["event_type"],
                         value_col="value") for s in splits])
    cols = ["bucket", "event_type", "n_rows"]
    assert _rows(merged, cols) == _rows(direct, cols)
    # float sums compare after rounding (association order differs)
    ds = {(r["bucket"], r["event_type"]): round(r["sum_value"], 6)
          for r in direct.collect()}
    ms = {(r["bucket"], r["event_type"]): round(r["sum_value"], 6)
          for r in merged.collect()}
    assert ds == ms


def test_coarsen_partials_equals_direct_coarse(spark, sf_dir):
    e = _events(spark, sf_dir)
    daily = R.partial_rollup(e, bucket=F.date_trunc("day", F.col("ts")),
                             key_cols=["event_type"], value_col="value",
                             bucket_alias="day")
    monthly = R.coarsen_rollup(daily,
                               bucket=F.date_trunc("month", F.col("day")),
                               key_cols=["event_type"],
                               bucket_alias="month")
    direct = R.partial_rollup(e, bucket=F.date_trunc("month", F.col("ts")),
                              key_cols=["event_type"], value_col="value",
                              bucket_alias="month")
    cols = ["month", "event_type", "n_rows", "min_value", "max_value"]
    assert _rows(monthly, cols) == _rows(direct, cols)


def test_finalize_avg_derives_from_state(spark, sf_dir):
    e = _events(spark, sf_dir)
    served = R.finalize_rollup(
        R.partial_rollup(e, bucket=F.lit(1), key_cols=["event_type"],
                         value_col="value"))
    got = {r["event_type"]: round(r["avg_value"], 6) for r in served.collect()}
    want = {r["event_type"]: round(r["avg"], 6)
            for r in e.groupBy("event_type")
                      .agg(F.avg("value").alias("avg")).collect()}
    assert got == want


def test_hll_merge_matches_direct_and_exact(spark, sf_dir):
    e = _events(spark, sf_dir)
    daily = R.distinct_sketch_rollup(
        e, bucket=F.date_trunc("day", F.col("ts")),
        key_cols=["event_type"], id_col="user_id")
    merged = {r["event_type"]: r["approx_distinct"]
              for r in R.merge_distinct_sketches(
                  daily, key_cols=["event_type"]).collect()}
    direct = {r["event_type"]: r["est"]
              for r in e.groupBy("event_type")
              .agg(F.hll_sketch_estimate(
                  F.hll_sketch_agg("user_id", F.lit(12))).alias("est"))
              .collect()}
    exact = {r["event_type"]: r["n"]
             for r in e.groupBy("event_type")
             .agg(F.countDistinct("user_id").alias("n")).collect()}
    # merging daily sketches == sketching the whole table (exact
    # equality: same deterministic sketch state either way)...
    assert merged == direct
    # ...and the estimate honors the lg_k=12 error bound comfortably
    for k, n in exact.items():
        assert abs(merged[k] - n) / n < 0.05, (k, merged[k], n)


def test_theta_overlap_tracks_exact_set_algebra(spark, sf_dir):
    e = _events(spark, sf_dir)
    sk = R.theta_segment_sketches(e, segment_col="event_type",
                                  id_col="user_id")
    est = R.theta_overlap(sk, segment_col="event_type",
                          seg_a="view", seg_b="purchase").collect()[0]
    va = e.filter(F.col("event_type") == "view") \
          .select("user_id").distinct()
    vb = e.filter(F.col("event_type") == "purchase") \
          .select("user_id").distinct()
    n_a, n_b = va.count(), vb.count()
    n_both = va.intersect(vb).count()
    n_either = va.union(vb).distinct().count()
    for name, got, want in [("n_a", est["n_a"], n_a),
                            ("n_b", est["n_b"], n_b),
                            ("n_both", est["n_both"], n_both),
                            ("n_either", est["n_either"], n_either)]:
        assert want > 0 and abs(got - want) / want < 0.05, (name, got, want)


def test_kll_merged_quantiles_close_to_exact(spark, sf_dir):
    e = _events(spark, sf_dir)
    daily = R.quantile_sketch_rollup(
        e, bucket=F.date_trunc("day", F.col("ts")),
        key_cols=["event_type"], value_col="value")
    got = {r["event_type"]: (r["q_50"], r["q_95"], r["q_99"])
           for r in R.merge_quantile_sketches(
               daily, key_cols=["event_type"]).collect()}
    # KLL guarantees RANK error (~1.3% at k=200), not value error —
    # a heavy-tailed p99 can sit far away in value space while being
    # rank-exact. Assert the empirical CDF position of each returned
    # value is within 2.5% of its target rank.
    for k, qs in got.items():
        seg = e.filter(F.col("event_type") == k)
        n = seg.count()
        for target, g in zip((0.5, 0.95, 0.99), qs):
            rank = seg.filter(F.col("value") <= g).count() / n
            assert abs(rank - target) < 0.025, (k, target, g, rank)


def test_stream_maintained_rollup_matches_batch(spark, sf_dir, tmp_path):
    """The maintenance loop end-to-end: events arriving as a stream
    keep the partial table fresh via foreachBatch; serving the
    merged partials equals the direct batch rollup over all events —
    including after a restart replays a batch (idempotent by
    batch subdirectory)."""
    from pyspark.sql import functions as F

    e = _events(spark, sf_dir)
    src = str(tmp_path / "src")
    e.repartition(4).write.mode("overwrite").parquet(src)
    # one file per micro-batch -> 4 batches, so the serve-side merge
    # provably folds partial rows ACROSS batch subdirectories
    stream = (spark.readStream.schema(e.schema)
              .option("maxFilesPerTrigger", 1).parquet(src))

    day = F.date_trunc("day", F.col("ts"))
    state = str(tmp_path / "state")
    q = R.rollup_sink(stream, state, bucket=day, key_cols=["event_type"],
                      value_col="value",
                      checkpoint=str(tmp_path / "ckpt"))
    q.awaitTermination(120)

    import os
    batches = [d for d in os.listdir(state) if d.startswith("batch=")]
    assert len(batches) >= 2, batches

    served = R.serve_rollup(spark, state)
    direct = R.partial_rollup(e, bucket=day, key_cols=["event_type"],
                              value_col="value")
    cols = ["bucket", "event_type", "n_rows"]
    assert _rows(served, cols) == _rows(direct, cols)
    ds = {(r["bucket"], r["event_type"]): round(r["sum_value"], 6)
          for r in direct.collect()}
    ss = {(r["bucket"], r["event_type"]): round(r["sum_value"], 6)
          for r in served.collect()}
    assert ds == ss


def test_hll_state_survives_parquet_roundtrip(spark, sf_dir, tmp_path):
    """The persisted-partial-table contract for sketches: the HLL
    binary state written to parquet must read back and MERGE to the
    same estimates as the in-memory path — otherwise the incremental
    serving story (state lives on disk between refreshes) is fiction."""
    e = _events(spark, sf_dir)
    daily = R.distinct_sketch_rollup(
        e, bucket=F.date_trunc("day", F.col("ts")),
        key_cols=["event_type"], id_col="user_id")
    path = str(tmp_path / "hll_state")
    daily.write.mode("overwrite").parquet(path)
    from_disk = R.merge_distinct_sketches(
        spark.read.parquet(path), key_cols=["event_type"])
    in_mem = R.merge_distinct_sketches(daily, key_cols=["event_type"])
    got = {r["event_type"]: r["approx_distinct"] for r in from_disk.collect()}
    want = {r["event_type"]: r["approx_distinct"] for r in in_mem.collect()}
    assert got == want and len(got) > 0


# Relational summaries: count-min + Bloom ----------------------------------

def test_cms_partial_merge_equals_global_and_never_undercounts(
        spark, sf_dir):
    e = _events(spark, sf_dir)
    day = F.date_trunc("day", F.col("ts"))
    merged = R.merge_cms(R.cms_rollup(e, bucket=day, key_col="user_id"))
    glob = R.merge_cms(R.cms_rollup(
        e, bucket=F.lit(0), key_col="user_id"))
    # counts are linear: per-day partials merged == one global sketch
    assert _rows(merged, ["row", "idx", "c"]) == _rows(glob,
                                                       ["row", "idx", "c"])
    est = {r["user_id"]: r["est"] for r in
           R.cms_estimate(merged, e.select("user_id").distinct(),
                          key_col="user_id").collect()}
    exact = {r["user_id"]: r["count"] for r in
             e.groupBy("user_id").count().collect()}
    n = sum(exact.values())
    for k, c in exact.items():
        assert est[k] >= c, (k, est[k], c)          # CMS never undercounts
        assert est[k] <= c + 0.01 * n, (k, est[k], c)  # eps ~ e/width
    # state is bounded by geometry, not stream size
    assert merged.count() <= R.CMS_DEPTH * R.CMS_WIDTH


def test_cms_estimates_absent_key_small(spark, sf_dir):
    e = _events(spark, sf_dir)
    merged = R.merge_cms(R.cms_rollup(e, bucket=F.lit(0),
                                      key_col="user_id"))
    probes = spark.createDataFrame([(10 ** 9 + i,) for i in range(20)],
                                   "user_id long")
    n = e.count()
    for r in R.cms_estimate(merged, probes, key_col="user_id").collect():
        # absent keys read only collision mass: bounded by eps * N
        assert r["est"] <= 0.01 * n, r


def test_bloom_dedup_output_equals_plain_anti_join(spark, sf_dir):
    e = _events(spark, sf_dir)
    seen = e.filter("event_id % 2 = 0")
    batch = e.filter("event_id % 3 = 0")
    got = _rows(R.bloom_incremental_dedup(batch, seen,
                                          key_col="event_id"),
                ["event_id"])
    want = _rows(batch.join(seen.select("event_id"), "event_id",
                            "left_anti"), ["event_id"])
    assert got == want


def test_bloom_has_no_false_negatives_and_prunes(spark):
    seen = spark.range(0, 5000).select(F.col("id").alias("k"))
    disjoint = spark.range(100000, 105000).select(F.col("id").alias("k"))
    bits = R.bloom_build(seen, key_col="k")
    nbits = bits.count()
    assert nbits <= R.BLOOM_BITS
    # every member's positions are all set (no false negatives)
    rows = F.explode(F.sequence(F.lit(0), F.lit(R.BLOOM_HASHES - 1)))
    h = F.md5(F.concat_ws(":", F.col("row").cast("string"),
                          F.col("k").cast("string")))
    pos = (F.conv(F.substring(h, 1, 8), 16, 10).cast("long")
           % F.lit(R.BLOOM_BITS))

    def nset(df):
        return (df.withColumn("row", rows).withColumn("pos", pos)
                .join(bits, "pos", "left_semi")
                .groupBy("k").agg(F.count("*").alias("n")))

    members = nset(seen)
    assert members.filter(F.col("n") < R.BLOOM_HASHES).count() == 0
    # a disjoint batch mostly misses: false-positive rate stays low
    fp = (nset(disjoint).filter(F.col("n") == R.BLOOM_HASHES).count())
    assert fp / 5000 < 0.05, fp


def test_stream_maintained_cms_matches_batch(spark, sf_dir, tmp_path):
    """Streaming heavy hitters: the stream-maintained CMS must equal
    the batch-built sketch exactly (counts are linear), so estimates
    from the served sketch inherit the never-undercount bound."""
    e = _events(spark, sf_dir)
    src = str(tmp_path / "src")
    e.repartition(4).write.mode("overwrite").parquet(src)
    stream = (spark.readStream.schema(e.schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    state = str(tmp_path / "cms")
    q = R.cms_sink(stream, state, key_col="user_id",
                   checkpoint=str(tmp_path / "ckpt"))
    q.awaitTermination(120)

    import os
    assert len([d for d in os.listdir(state)
                if d.startswith("batch=")]) >= 2

    served = R.serve_cms(spark, state)
    batch = R.merge_cms(R.cms_rollup(e, bucket=F.lit(0),
                                     key_col="user_id"))
    assert _rows(served, ["row", "idx", "c"]) == _rows(batch,
                                                       ["row", "idx", "c"])
    est = {r["user_id"]: r["est"] for r in
           R.cms_estimate(served, e.select("user_id").distinct(),
                          key_col="user_id").collect()}
    exact = {r["user_id"]: r["count"] for r in
             e.groupBy("user_id").count().collect()}
    assert all(est[k] >= c for k, c in exact.items())


def test_decayed_serve_is_merge_invariant_and_recency_biased(
        spark, sf_dir, tmp_path):
    """Decay applies per bucket at read time, so serving from
    arbitrarily-split merged partials equals serving from the direct
    rollup — and newer activity outweighs equal older activity."""
    e = _events(spark, sf_dir)
    day = F.date_trunc("day", F.col("ts"))
    now = F.to_timestamp(F.lit("2024-01-31 00:00:00"))
    direct = R.partial_rollup(e, bucket=day, key_cols=["user_id"],
                              value_col="value")
    a = R.partial_rollup(e.filter("event_id % 2 = 0"), bucket=day,
                         key_cols=["user_id"], value_col="value")
    b = R.partial_rollup(e.filter("event_id % 2 = 1"), bucket=day,
                         key_cols=["user_id"], value_col="value")
    merged = R.merge_rollups(a, b)
    sd = _rows(R.decayed_rollup_serve(direct, key_cols=["user_id"],
                                      now=now), ["user_id", "decayed_n"])
    sm = _rows(R.decayed_rollup_serve(merged, key_cols=["user_id"],
                                      now=now), ["user_id", "decayed_n"])
    assert sd == sm
    # recency bias: one recent event outweighs one old event
    toy = spark.createDataFrame(
        [("2024-01-30 12:00:00", 1), ("2024-01-02 12:00:00", 2)],
        "t string, user_id int").select(
        F.to_timestamp("t").alias("ts"), "user_id",
        F.lit(1.0).alias("value"))
    tp = R.partial_rollup(toy, bucket=F.date_trunc("day", F.col("ts")),
                          key_cols=["user_id"], value_col="value")
    out = {r["user_id"]: r["decayed_n"] for r in
           R.decayed_rollup_serve(tp, key_cols=["user_id"],
                                  now=now).collect()}
    assert out[1] > out[2]


def test_retractable_rollup_equals_recompute_after_deletes(spark):
    from pyspark.sql import functions as F

    from parlerproject_spark.operators.rollup import (merge_retractable,
                                                      retractable_rollup)
    ins = spark.createDataFrame(
        [(d, u, float(v), 1) for d, u, v in
         [(1, 10, 5.0), (1, 10, 3.0), (1, 11, 7.0), (2, 10, 2.0)]],
        "day int, user bigint, value double, op int")
    # retract one of user 10's day-1 rows and ALL of user 11's
    dels = spark.createDataFrame(
        [(1, 10, 3.0, -1), (1, 11, 7.0, -1)],
        "day int, user bigint, value double, op int")
    r1 = retractable_rollup(ins, bucket=F.col("day"),
                            key_cols=["user"], value_col="value",
                            op_col="op")
    r2 = retractable_rollup(dels, bucket=F.col("day"),
                            key_cols=["user"], value_col="value",
                            op_col="op")
    merged = {(r["bucket"], r["user"]): (r["n_rows"], r["sum_value"])
              for r in merge_retractable(r1, r2).collect()}
    # surviving rows: (1,10,5.0) and (2,10,2.0)
    assert merged == {(1, 10): (1, 5.0), (2, 10): (1, 2.0)}


def test_retractable_rollup_drops_zero_net_groups(spark):
    from pyspark.sql import functions as F

    from parlerproject_spark.operators.rollup import (merge_retractable,
                                                      retractable_rollup)
    df = spark.createDataFrame(
        [(1, 5, 4.0, 1), (1, 5, 4.0, -1)],
        "day int, user bigint, value double, op int")
    out = retractable_rollup(df, bucket=F.col("day"), key_cols=["user"],
                             value_col="value", op_col="op")
    assert out.count() == 0
    assert merge_retractable(out, out).count() == 0
