"""Metrics/manifest (S14/§2.11) + sink round-trips (S10/S11/S13/S15)."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from parlerproject_spark import metrics
from parlerproject_spark.catalog import load_table


def test_observe_and_manifest(spark, sf_dir, tmp_path):
    docs = load_table(spark, "documents", sf_dir)
    m = metrics.run_with_manifest(
        docs, name="docs_scan", out_dir=str(tmp_path),
        total_chars=F.sum("n_chars"))
    assert m.row_count == 500
    assert m.metrics["total_chars"] == docs.agg(F.sum("n_chars")).collect()[0][0]
    assert m.metrics["rows_per_sec"] > 0
    path = os.path.join(str(tmp_path), "_manifest_docs_scan.json")
    with open(path) as f:
        on_disk = json.load(f)
    assert on_disk["schema"].startswith("struct<doc_id:bigint")


def test_parquet_vector_sink_roundtrip(spark, sf_dir, tmp_path):
    """S13: the reference's float32 memmap matrix becomes a Parquet
    array<float> table — partitioned columnar storage, no
    preallocation, no flush protocol."""
    out = str(tmp_path / "vectors")
    emb = load_table(spark, "embeddings", sf_dir)
    emb.write.mode("overwrite").parquet(out)
    back = spark.read.parquet(out)
    assert back.count() == emb.count()
    assert back.schema["embedding"].dataType.simpleString() == "array<float>"


def test_csv_sink_roundtrip(spark, sf_dir, tmp_path):
    """S11: metadata.to_csv(index=False) analogue."""
    out = str(tmp_path / "csv")
    docs = load_table(spark, "documents", sf_dir).select("doc_id", "lang", "source")
    docs.write.mode("overwrite").option("header", True).csv(out)
    back = spark.read.option("header", True).csv(out)
    assert back.count() == 500
    assert back.columns == ["doc_id", "lang", "source"]


def test_partitioned_text_sink(spark, sf_dir, tmp_path):
    """S10: the file-per-record .txt sink generalizes to a
    lang-partitioned text corpus layout (partition pruning on read)."""
    out = str(tmp_path / "txt")
    docs = load_table(spark, "documents", sf_dir)
    (docs.select(F.col("lang"), F.col("text").alias("value"))
     .write.mode("overwrite").partitionBy("lang").text(out))
    langs = {d.split("=")[1] for d in os.listdir(out) if d.startswith("lang=")}
    assert langs == {"en", "es", "de", "fr", "zh"}
    only_en = spark.read.text(os.path.join(out, "lang=en"))
    n_en = load_table(spark, "documents", sf_dir).filter(F.col("lang") == "en").count()
    assert only_en.count() == n_en


def test_erase_keys_removes_subject_everywhere_with_audit(spark):
    from parlerproject_spark.operators.privacy import erase_keys
    ev = spark.createDataFrame(
        [(1, 10, "a"), (2, 10, "b"), (3, 11, "c"), (4, 12, "d")],
        "event_id bigint, user_id bigint, x string")
    docs = spark.createDataFrame(
        [(1, 10), (2, 13)], "doc_id bigint, author_id bigint")
    cleaned, audit = erase_keys(
        {"events": ev, "docs": docs},
        {"events": "user_id", "docs": "author_id"},
        [10, 11])
    assert {r["user_id"] for r in cleaned["events"].collect()} == {12}
    assert {r["author_id"] for r in cleaned["docs"].collect()} == {13}
    a = {r["table_name"]: (r["n_before"], r["n_dropped"])
         for r in audit.collect()}
    assert a == {"events": (4, 3), "docs": (2, 1)}
    # anti-join must be broadcast (key list is a deletion batch)
    plan = cleaned["events"]._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Broadcast" in plan and "LeftAnti" in plan


def test_erase_keys_string_subjects_and_single_scan_audit(spark):
    """String subject ids must join correctly (the key frame's type
    is inferred from each table's key column — an earlier version
    hardcoded bigint); duplicate keys in the request batch must not
    double-count dropped rows; and the audit plan must be ONE
    aggregate over the table scan, not an eager before/after
    double-count."""
    from parlerproject_spark.operators.privacy import erase_keys
    docs = spark.createDataFrame(
        [("u1", 1), ("u1", 2), ("u2", 3), ("u3", 4)],
        "author string, doc_id bigint")
    cleaned, audit = erase_keys(
        {"docs": docs}, {"docs": "author"}, ["u1", "u3", "u1"])
    assert {r["author"] for r in cleaned["docs"].collect()} == {"u2"}
    a = audit.collect()
    assert [tuple(r) for r in a] == [("docs", 4, 3)]
    # single-pass: the audit plan contains no more scans of the input
    # than the one left-join aggregate needs
    plan = (audit._jdf.queryExecution().executedPlan().toString()
            .split("== Initial Plan ==")[0])  # AQE dump repeats the tree
    assert plan.count("Scan ExistingRDD") <= 2  # docs + key frame
