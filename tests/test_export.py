"""Sharded training-corpus export (operators/export.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from parlerproject_spark.operators.export import (
    shard_assignments,
    shard_manifest,
    write_training_shards,
)


def _docs(spark, n=200):
    return spark.range(0, n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("doc text number "), F.col("id").cast("string"),
                 F.lit(" with a few tokens")).alias("text"))


def test_assignments_deterministic_and_in_range(spark):
    d = _docs(spark)
    a1 = {r["doc_id"]: r["shard"] for r in
          shard_assignments(d, n_shards=8).collect()}
    a2 = {r["doc_id"]: r["shard"] for r in
          shard_assignments(d.orderBy(F.rand(7)), n_shards=8).collect()}
    assert a1 == a2                       # row-order independent
    assert set(a1.values()) <= set(range(8))
    # a different seed reshuffles membership
    a3 = {r["doc_id"]: r["shard"] for r in
          shard_assignments(d, n_shards=8, seed="other").collect()}
    assert a1 != a3


def test_write_shards_roundtrip_and_manifest(spark, tmp_path):
    d = _docs(spark)
    path = str(tmp_path / "shards")
    stats = write_training_shards(d, path, n_shards=4)
    assert stats["n_docs"] == 200
    back = spark.read.parquet(path)
    assert back.count() == 200
    assert set(back.select("shard").distinct().toPandas()["shard"]) \
        <= set(range(4))
    # the underscore manifest dir is invisible to the corpus read
    assert "checksum" not in back.columns
    man = spark.read.parquet(f"{path}/_manifest")
    assert man.agg(F.sum("n_docs")).first()[0] == 200
    # manifest checksums match an independent recompute
    want = {(r["shard"], r["checksum"]) for r in
            shard_manifest(d, n_shards=4).collect()}
    got = {(r["shard"], r["checksum"]) for r in man.collect()}
    assert got == want


def test_rewritten_export_is_identical(spark, tmp_path):
    d = _docs(spark, 120)
    p1, p2 = str(tmp_path / "a"), str(tmp_path / "b")
    write_training_shards(d, p1, n_shards=4)
    write_training_shards(d.orderBy(F.rand(3)), p2, n_shards=4)
    r1 = spark.read.parquet(p1).orderBy("doc_id").collect()
    r2 = spark.read.parquet(p2).orderBy("doc_id").collect()
    assert r1 == r2


def test_manifest_merges_across_corpus_splits(spark):
    """checksum/counts are mergeable: manifest(a ∪ b) == merge of
    manifest(a) and manifest(b) — the incremental-export property."""
    d = _docs(spark)
    a = d.filter(F.col("doc_id") < 100)
    b = d.filter(F.col("doc_id") >= 100)
    whole = {(r["shard"], r["n_docs"], r["n_tokens"], r["checksum"])
             for r in shard_manifest(d, n_shards=4).collect()}
    parts = (shard_manifest(a, n_shards=4)
             .unionByName(shard_manifest(b, n_shards=4))
             .groupBy("shard")
             .agg(F.sum("n_docs").alias("n_docs"),
                  F.sum("n_tokens").cast("long").alias("n_tokens"),
                  (F.sum("checksum") % 2147483647).cast("long")
                  .alias("checksum")))
    merged = {(r["shard"], r["n_docs"], r["n_tokens"], r["checksum"])
              for r in parts.collect()}
    assert merged == whole
