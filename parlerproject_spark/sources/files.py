"""File-based scans mirroring the reference's readers.

Every reader declares its schema (no inference pass) and maps the
reference's tolerance behavior onto Spark scan modes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

# S4 — status-log table (pd.read_csv(header=None) + positional rename,
# analysis/preview_data.ipynb:116-118)
FILE_REPORT_SCHEMA = StructType([
    StructField("filename", StringType()),
    StructField("report", StringType()),
])

# S5 — image listing (download_image_files.py:15: names=['date','time',
# 'size','filename'], on_bad_lines='skip')
IMAGE_LISTING_SCHEMA = StructType([
    StructField("date", StringType()),
    StructField("time", StringType()),
    StructField("size", LongType()),
    StructField("filename", StringType()),
])


def read_file_report(spark: SparkSession, path: str) -> DataFrame:
    """S4: headerless CSV with positionally-declared columns."""
    return spark.read.csv(path, schema=FILE_REPORT_SCHEMA, header=False)


def read_image_listing(spark: SparkSession, path: str) -> DataFrame:
    """S5: named columns + malformed-row skip — Spark's DROPMALFORMED
    is the exact analogue of pandas `on_bad_lines='skip'`."""
    return spark.read.csv(path, schema=IMAGE_LISTING_SCHEMA, header=True,
                          mode="DROPMALFORMED")


def read_documents_dir(spark: SparkSession, glob_path: str) -> DataFrame:
    """S1-S3: whole-file text corpus scan → (doc_id, text).

    The reference reads one file per post (embeddings.py:13-27:
    glob → open → strip → keep if non-empty). Here: wholetext scan,
    doc_id from the file name, trim + non-empty filter. At corpus
    scale the small-files problem makes this the WRONG layout — the
    engine's canonical form is one Parquet documents table (S10
    note) — but the operator exists for parity and ingestion.
    """
    raw = (spark.read.format("text")
           .option("wholetext", True)
           .load(glob_path)
           .select(F.input_file_name().alias("path"), F.col("value")))
    return (raw.select(
        F.regexp_extract(F.col("path"), r"([^/]+)\.[a-z]+$", 1).alias("doc_id"),
        F.trim(F.col("value")).alias("text"))
        .filter(F.length(F.col("text")) > 0))


def read_ragged_json(spark: SparkSession, path: str,
                     *, sample_ratio: float = 0.1) -> DataFrame:
    """S8/U1: schema-merged scan over ragged JSON files (the 86+
    column ExifTool metadata, preview_data.ipynb cells 8/10).

    ONE spark.read.json over all files — never a per-file read +
    iterative union (the reference's quadratic pd.concat loop).
    samplingRatio bounds the inference pass; at real scale pass an
    explicit schema or use `open_map_json` instead."""
    return (spark.read
            .option("samplingRatio", sample_ratio)
            .option("primitivesAsString", True)
            .json(path))


def open_map_json(df: DataFrame, json_col: str = "value") -> DataFrame:
    """The MapType escape hatch for open key spaces (SURVEY §7.3#2):
    parse each JSON record to map<string,string> instead of a wide
    struct — no inference pass, stable schema at any corpus size,
    and the P4 key-prefix predicate works via map_keys."""
    return df.withColumn("meta", F.from_json(F.col(json_col), "map<string,string>"))


def ascii_decode_with_fallback(df: DataFrame, bin_col: str,
                               *, out_col: str = "text",
                               status_col: str = "decode_status") -> DataFrame:
    """S7: charset decode with error fallback. The reference tries
    ascii, falls back to raw bytes, and logs `encoding_error`
    (ID_matching_metadata.py:42-54). Spark's `decode` THROWS on
    malformed input (no try_ variant), so: decode latin-1 — a total
    function, every byte maps to a char — then classify ascii-ness
    with a codepoint-range regex. Same observable semantics, no
    exception path, stays in codegen."""
    lossy = F.decode(F.col(bin_col), "ISO-8859-1")
    is_ascii = lossy.rlike("^[\\x00-\\x7F]*$")
    return (df.withColumn(out_col, lossy)
            .withColumn(status_col,
                        F.when(is_ascii, F.lit("success"))
                        .otherwise(F.lit("encoding_error"))))


def write_status_log(df: DataFrame, path: str) -> None:
    """S12: durable status log — a columnar append (one file set per
    run) replacing the reference's line-append `open(p,'a+')`
    (ID_matching_metadata.py:60-64). Idempotent resume comes from
    anti-joining this log (operators.relational.anti_join), not from
    counting its rows."""
    df.write.mode("append").parquet(path)
