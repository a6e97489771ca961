"""Unit tests for the scalar function libraries."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from parlerproject_spark.functions.geo import dms_to_decimal
from parlerproject_spark.functions.text import (
    fingerprint_md5,
    normalize_ws,
    quality_score,
    stable_hash31,
    token_count,
    tokenize,
)
from parlerproject_spark.functions.vectors import cosine, dot, l2_norm, l2_normalize


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0]["v"]


def test_normalize_ws_matches_python_split_join(spark):
    cases = ["  a\t\tb\n c  ", "x", "", "   ", "a  b"]
    df = spark.createDataFrame([(c,) for c in cases], ["t"])
    got = [r["n"] for r in df.select(normalize_ws("t").alias("n")).collect()]
    want = [" ".join(c.split()) for c in cases]  # htmlConverter.py:38 semantics
    assert got == want


def test_tokenize_drops_punct_and_empties(spark):
    df = spark.createDataFrame([("Hello, WORLD!  foo-bar 42",)], ["t"])
    toks = df.select(tokenize("t").alias("ts")).collect()[0]["ts"]
    assert toks == ["hello", "world", "foo", "bar", "42"]


def test_token_count(spark):
    df = spark.createDataFrame([("a b  c",), ("",), ("  ",)], ["t"])
    got = [r["n"] for r in df.select(token_count("t").alias("n")).collect()]
    assert got == [3, 0, 0]


def test_quality_score_bounds(spark, sf_dir):
    from parlerproject_spark.catalog import load_table
    docs = load_table(spark, "documents", sf_dir)
    row = docs.select(F.min(quality_score("text")).alias("lo"),
                      F.max(quality_score("text")).alias("hi")).collect()[0]
    assert 0.0 <= row["lo"] <= row["hi"] <= 1.0


def test_dms_to_decimal_reference_string(spark):
    # The exact DMS string from analysis/preview_data.ipynb cell 8.
    df = spark.createDataFrame(
        [("38 deg 55' 58.80\" N",), ("77 deg 4' 27.48\" W",), ("garbage",)], ["s"])
    got = [r["d"] for r in df.select(dms_to_decimal("s").alias("d")).collect()]
    assert abs(got[0] - (38 + 55 / 60 + 58.80 / 3600)) < 1e-9
    assert abs(got[1] - -(77 + 4 / 60 + 27.48 / 3600)) < 1e-9
    assert got[2] is None


def test_stable_hash31_matches_duckdb(spark):
    import duckdb
    words = ["spark", "engine", "parler"]
    df = spark.createDataFrame([(w,) for w in words], ["w"])
    got = {r["w"]: r["h"] for r in df.select("w", stable_hash31("w").alias("h")).collect()}
    for w in words:
        want = duckdb.sql(
            f"select ('0x' || substr(md5('{w}'), 1, 15))::bigint % 2147483647").fetchone()[0]
        assert got[w] == want


def test_fingerprint_md5_normalizes_before_hashing(spark):
    df = spark.createDataFrame([("Hello  World",), ("hello world",)], ["t"])
    fps = [r["f"] for r in df.select(fingerprint_md5("t").alias("f")).collect()]
    assert fps[0] == fps[1]


def test_vector_ops(spark):
    df = spark.createDataFrame([([3.0, 4.0], [3.0, 4.0])], ["a", "b"])
    row = df.select(dot("a", "b").alias("d"), l2_norm("a").alias("n"),
                    cosine("a", "b").alias("c"),
                    l2_normalize("a").alias("u")).collect()[0]
    assert row["d"] == 25.0
    assert row["n"] == 5.0
    assert abs(row["c"] - 1.0) < 1e-12
    assert abs(math.hypot(*row["u"]) - 1.0) < 1e-12
