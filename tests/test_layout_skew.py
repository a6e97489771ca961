"""Skew + layout operators: correctness AND the plan-level claims."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from parlerproject_spark.catalog import load_table
from parlerproject_spark.operators import layout, skew
from parlerproject_spark.plans import inspect


def test_salted_agg_matches_plain_agg(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir)
    plain = {r["event_type"]: (r["cnt"], round(r["total"], 4))
             for r in ev.groupBy("event_type")
             .agg(F.count("*").alias("cnt"),
                  F.round(F.sum("value"), 4).alias("total")).collect()}
    salted = skew.salted_agg(
        ev, "event_type",
        [("value", "count", "cnt"), ("value", "sum", "total")],
        salt_buckets=8)
    got = {r["event_type"]: (r["cnt"], round(r["total"], 4))
           for r in salted.collect()}
    assert got == plain


def test_salted_agg_star_count_is_null_proof(spark, sf_dir):
    # Inject NULLs into `value`: ("*", "count") must count ROWS
    # (sum(1) semantics — what the oracle computes), while a named
    # column keeps skip-NULLs count semantics. Both must survive the
    # salt round-trip (r4 verdict #5).
    ev = load_table(spark, "events", sf_dir).withColumn(
        "value", F.when(F.abs(F.hash("event_id")) % 3 == 0, None)
                  .otherwise(F.col("value")))
    plain = {r["event_type"]: (r["n_rows"], r["n_vals"])
             for r in ev.groupBy("event_type")
             .agg(F.count(F.lit(1)).alias("n_rows"),
                  F.count("value").alias("n_vals")).collect()}
    salted = skew.salted_agg(
        ev, "event_type",
        [("*", "count", "n_rows"), ("value", "count", "n_vals")],
        salt_buckets=8)
    got = {r["event_type"]: (r["n_rows"], r["n_vals"])
           for r in salted.collect()}
    assert got == plain
    # the injection really produced nulls, so the two counts differ
    assert any(n_rows != n_vals for n_rows, n_vals in plain.values())


def test_salted_join_matches_plain_join(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir).select("event_id", "user_id")
    users = (load_table(spark, "events", sf_dir)
             .groupBy("user_id").agg(F.count("*").alias("user_events")))
    plain = set((r["event_id"], r["user_events"])
                for r in ev.join(users, "user_id").collect())
    got = set((r["event_id"], r["user_events"])
              for r in skew.salted_join(ev, users, "user_id").collect())
    assert got == plain


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    docs = load_table(spark, "documents", sf_dir).select("doc_id", "lang")
    embs = (load_table(spark, "embeddings", sf_dir)
            .select(F.col("vec_id").alias("doc_id"), "label"))
    layout.write_bucketed(docs, "b_docs", by="doc_id", buckets=8)
    layout.write_bucketed(embs, "b_embs", by="doc_id", buckets=8)
    # Catalyst prefers broadcast for tiny tables (and then ignores
    # bucketing entirely); disable it to expose the bucketed path —
    # at real scale neither side broadcasts and this IS the plan.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("b_docs").join(spark.table("b_embs"), "doc_id")
        plan = inspect.executed_plan(joined)
        assert "Exchange" not in plan, plan
        assert "Bucketed: true" in plan, plan
        assert joined.count() == 500
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
                       str(64 * 1024 * 1024))


def test_co_partitioned_reuses_exchange(spark, sf_dir):
    l, r = layout.co_partitioned(
        load_table(spark, "orders", sf_dir).select("o_custkey", "o_totalprice"),
        load_table(spark, "customer", sf_dir)
        .select(F.col("c_custkey").alias("o_custkey"), "c_name"),
        "o_custkey", partitions=8)
    # disable broadcast so the join must use the existing partitioning
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = l.join(r, "o_custkey")
        plan = inspect.executed_plan(joined)
        # repartition exchanges exist, but the join itself adds none:
        # 2 user repartitions and no ENSURE_REQUIREMENTS exchange
        assert plan.count("ENSURE_REQUIREMENTS") == 0, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
                       str(64 * 1024 * 1024))


def test_zorder_key_interleaves_bits(spark):
    df = spark.createDataFrame([(0b1010, 0b0101)], ["a", "b"])
    z = df.select(layout.zorder_key(["a", "b"], bits=4).alias("z")).first()["z"]
    # a owns odd positions (MSB of each round), b even:
    # a=1010, b=0101 -> z = 10 01 10 01 = 0b10011001
    assert z == 0b10011001


def test_zorder_prunes_on_either_column(spark):
    """The data-skipping claim, measured the way file skipping
    actually works: a point predicate prunes every file whose
    [min, max] on that column excludes the point. A u-sorted layout
    answers u-queries from 1 file but v-queries from ALL files;
    z-order bounds BOTH columns near sqrt(P) files. Independent
    uniform columns (hash-derived, deterministic) — on strongly
    CORRELATED columns a plain sort on the driving column is the
    better layout, which is why zorder_key is opt-in."""
    n = 1 << 14
    base = spark.range(n).select(
        F.pmod(F.xxhash64(F.col("id")), F.lit(256)).alias("ub"),
        F.pmod(F.xxhash64(F.col("id") + 1_000_000), F.lit(256)).alias("vb"))
    keyed = base.withColumn("z", layout.zorder_key(["ub", "vb"], bits=8))

    def touched(order_col):
        parts = (keyed.repartitionByRange(16, F.col(order_col))
                 .withColumn("pid", F.spark_partition_id())
                 .groupBy("pid")
                 .agg(F.min("ub").alias("ul"), F.max("ub").alias("uh"),
                      F.min("vb").alias("vl"), F.max("vb").alias("vh"))
                 .collect())
        probes = range(2, 256, 16)  # 16 deterministic point queries
        u_hits = sum(sum(1 for p in parts if p["ul"] <= q <= p["uh"])
                     for q in probes) / len(list(probes))
        v_hits = sum(sum(1 for p in parts if p["vl"] <= q <= p["vh"])
                     for q in probes) / len(list(probes))
        return u_hits, v_hits

    u_sort = touched("ub")
    z_sort = touched("z")
    # one-column sort: perfect on its own column, useless on the other
    assert u_sort[0] <= 2 and u_sort[1] >= 14, u_sort
    # z-order: BOTH columns prune to ~sqrt(16)=4 files; allow slack
    # for quadrant-straddling ranges
    assert z_sort[0] <= 8 and z_sort[1] <= 8, z_sort
    # and the v-column pruning it buys is at least 2x the sort's
    assert z_sort[1] * 2 <= u_sort[1], (z_sort, u_sort)


def test_equi_depth_bits_balances_heavy_tail(spark, sf_dir):
    """equi_depth_bits gives every bucket the same row count even on
    the heavy-tailed value column where a linear image collapses most
    rows into a few low buckets (measured in r4: linear imaging made
    z-order WORSE than a one-column sort)."""
    e = load_table(spark, "events", sf_dir).select("value")
    img = e.withColumn("b", layout.equi_depth_bits(e, "value", bits=4))
    counts = [r["n"] for r in
              img.groupBy("b").agg(F.count("*").alias("n")).collect()]
    assert len(counts) == 16
    assert max(counts) < 2 * min(counts), counts
    lin = e.withColumn("b", layout.scale_to_bits(
        "value", lo=0, hi=500, bits=4))
    lin_counts = [r["n"] for r in
                  lin.groupBy("b").agg(F.count("*").alias("n")).collect()]
    # the linear image really is lopsided on this distribution
    assert max(lin_counts) > 4 * min(lin_counts), lin_counts


def test_split_skew_join_equals_plain_join(spark):
    from pyspark.sql import functions as F

    from parlerproject_spark.operators.skew import split_skew_join
    big = spark.createDataFrame(
        [(1, i) for i in range(500)] + [(2, i) for i in range(20)]
        + [(3, i) for i in range(7)], "k bigint, v bigint")
    dim = spark.createDataFrame(
        [(1, "hot"), (2, "warm"), (3, "cold"), (9, "orphan")],
        "k bigint, label string")
    got = split_skew_join(big, dim, "k", hot_threshold=100,
                          salt_buckets=4)
    want = big.join(dim, "k")
    assert sorted(map(tuple, got.collect())) \
        == sorted(map(tuple, want.collect()))
    assert got.columns == want.columns


def test_split_skew_join_all_cold_and_all_hot_degenerate(spark):
    from parlerproject_spark.operators.skew import split_skew_join
    big = spark.createDataFrame([(i % 3, i) for i in range(60)],
                                "k bigint, v bigint")
    dim = spark.createDataFrame([(0, "a"), (1, "b"), (2, "c")],
                                "k bigint, label string")
    want = sorted(map(tuple, big.join(dim, "k").collect()))
    for thr in (10 ** 9, 0):   # nothing hot / everything hot
        got = sorted(map(tuple, split_skew_join(
            big, dim, "k", hot_threshold=thr).collect()))
        assert got == want, thr
