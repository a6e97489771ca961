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
