"""Phrase retrieval (scan vs positional index) and small-file
compaction."""

from __future__ import annotations

from pyspark.sql import functions as F

from parlerproject_spark.operators.retrieval import (
    build_positional_index,
    phrase_count,
    probe_phrase_index,
)


def _docs(spark):
    return spark.createDataFrame(
        [(1, "the hash join beats the sort merge join"),
         (2, "hash join hash join hash join"),
         (3, "a hash, join them"),          # punctuation splits: still adjacent
         (4, "join hash"),                   # wrong order
         (5, "no phrase here at all"),
         (6, "hash"),                        # shorter than the phrase
         (7, "HASH Join is case-insensitive")],
        "doc_id bigint, text string")


def test_phrase_count_scan(spark):
    got = {(r["doc_id"], r["n_matches"])
           for r in phrase_count(_docs(spark), "hash join").collect()}
    assert got == {(1, 1), (2, 3), (3, 1), (7, 1)}


def test_phrase_count_single_term_and_long_phrase(spark):
    d = _docs(spark)
    one = {(r["doc_id"], r["n_matches"])
           for r in phrase_count(d, "join").collect()}
    assert one == {(1, 2), (2, 3), (3, 1), (4, 1), (7, 1)}
    # repeated-word phrase: overlapping occurrences each count
    rep = {(r["doc_id"], r["n_matches"])
           for r in phrase_count(d, "hash join hash").collect()}
    assert rep == {(2, 2)}


def test_probe_phrase_index_matches_scan(spark, tmp_path):
    d = _docs(spark)
    path = str(tmp_path / "pidx")
    build_positional_index(d, path)
    for phrase in ["hash join", "join", "hash join hash join"]:
        scan = {(r["doc_id"], r["n_matches"])
                for r in phrase_count(d, phrase).collect()}
        idx = {(r["doc_id"], r["n_matches"])
               for r in probe_phrase_index(spark, path, phrase).collect()}
        assert idx == scan, phrase


def test_probe_phrase_index_prunes_buckets(spark, tmp_path):
    d = _docs(spark)
    path = str(tmp_path / "pidx")
    build_positional_index(d, path)
    plan = (probe_phrase_index(spark, path, "hash join")
            ._jdf.queryExecution().executedPlan().toString())
    assert "PartitionFilters: [" in plan
    assert "bucket" in plan


def test_compact_small_files_preserves_rows(spark, tmp_path):
    from parlerproject_spark.operators.layout import compact_small_files
    src = str(tmp_path / "frag")
    dst = str(tmp_path / "compact")
    df = spark.range(0, 10000).select(
        F.col("id"), (F.col("id") % 7).alias("m"))
    df.repartition(64).write.parquet(src)
    stats = compact_small_files(spark, src, dst, target_mb=128)
    assert stats["files_before"] == 64
    assert stats["files_after"] == stats["target_files"] == 1
    got = spark.read.parquet(dst)
    assert got.count() == 10000
    assert got.agg(F.sum("id")).first()[0] == 10000 * 9999 // 2


def test_compact_small_files_sorted_within(spark, tmp_path):
    from parlerproject_spark.operators.layout import compact_small_files
    src = str(tmp_path / "frag2")
    dst = str(tmp_path / "compact2")
    spark.range(0, 1000).select(
        (F.col("id") * 37 % 1000).alias("k")) \
        .repartition(16).write.parquet(src)
    compact_small_files(spark, src, dst, target_mb=128, sort_within_by=["k"])
    import pandas as pd  # noqa: F401
    pdf = spark.read.parquet(dst).toPandas()
    assert (pdf["k"].values == sorted(pdf["k"].values)).all()


def test_overwrite_partitions_touches_only_present_partitions(
        spark, tmp_path):
    import os

    from parlerproject_spark.operators.layout import overwrite_partitions
    path = str(tmp_path / "days")
    base = spark.createDataFrame(
        [("d1", 1), ("d1", 2), ("d2", 3), ("d3", 4)], "day string, v int")
    overwrite_partitions(base, path, partition_by=["day"])
    d2_files = {(f, os.path.getmtime(os.path.join(path, "day=d2", f)))
                for f in os.listdir(os.path.join(path, "day=d2"))
                if f.endswith(".parquet")}
    # replace ONLY d1 with corrected rows
    fix = spark.createDataFrame([("d1", 99)], "day string, v int")
    overwrite_partitions(fix, path, partition_by=["day"])
    got = {(r["day"], r["v"]) for r in spark.read.parquet(path).collect()}
    assert got == {("d1", 99), ("d2", 3), ("d3", 4)}
    d2_after = {(f, os.path.getmtime(os.path.join(path, "day=d2", f)))
                for f in os.listdir(os.path.join(path, "day=d2"))
                if f.endswith(".parquet")}
    assert d2_after == d2_files   # untouched files, same mtimes


def test_search_snippets_first_hit_and_counts(spark):
    from parlerproject_spark.operators.retrieval import search_snippets
    docs = spark.createDataFrame(
        [(1, "a b c hash d e join f hash"),
         (2, "nothing relevant here"),
         (3, "JOIN, first; then hash")],
        "doc_id bigint, text string")
    rows = {r["doc_id"]: r for r in
            search_snippets(docs, ["hash", "join"],
                            half_window=10).collect()}
    assert set(rows) == {1, 3}
    assert rows[1]["n_hits"] == 3
    assert rows[3]["n_hits"] == 2
    assert "hash" in rows[1]["snippet"]
    # earliest occurrence wins: doc 3 starts with 'join'
    assert rows[3]["snippet"].startswith("join")
