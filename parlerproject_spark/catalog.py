"""Declared schemas + loaders for the engine's tables.

The reference declares schemas positionally where it can
(``names=['date','time','size','filename']`` in
code/data_processing_scripts/download_image_files.py:15) and infers
everywhere else. This engine always declares: explicit StructType per
table, so scans prune columns and never pay inference. At 100 TB,
schema inference is a full extra pass over the data — never do it.

Tables are the driver's deterministic TPC-H-ish star schema plus
``events`` (stream-shaped), ``documents`` (text corpus, the analogue
of the reference's data/parler_posts_txt read by code/embeddings.py:
13-27), and ``embeddings`` (vector table, the analogue of the
reference's N×384 float32 memmap, code/embeddings.py:82-87).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
    TimestampType,
)


def _st(*fields: tuple) -> StructType:
    return StructType([StructField(n, t, True) for n, t in fields])


TABLE_SCHEMAS: dict[str, StructType] = {
    "region": _st(("r_regionkey", LongType()), ("r_name", StringType())),
    "nation": _st(
        ("n_nationkey", LongType()),
        ("n_name", StringType()),
        ("n_regionkey", LongType()),
    ),
    "customer": _st(
        ("c_custkey", LongType()),
        ("c_name", StringType()),
        ("c_nationkey", LongType()),
        ("c_acctbal", DoubleType()),
        ("c_mktsegment", StringType()),
    ),
    "supplier": _st(
        ("s_suppkey", LongType()),
        ("s_name", StringType()),
        ("s_nationkey", LongType()),
        ("s_acctbal", DoubleType()),
    ),
    "part": _st(
        ("p_partkey", LongType()),
        ("p_name", StringType()),
        ("p_brand", StringType()),
        ("p_type", StringType()),
        ("p_size", IntegerType()),
        ("p_retailprice", DoubleType()),
    ),
    "orders": _st(
        ("o_orderkey", LongType()),
        ("o_custkey", LongType()),
        ("o_orderstatus", StringType()),
        ("o_totalprice", DoubleType()),
        ("o_orderdate", TimestampType()),
        ("o_orderpriority", StringType()),
    ),
    "lineitem": _st(
        ("l_orderkey", LongType()),
        ("l_partkey", LongType()),
        ("l_suppkey", LongType()),
        ("l_linenumber", IntegerType()),
        ("l_quantity", DoubleType()),
        ("l_extendedprice", DoubleType()),
        ("l_discount", DoubleType()),
        ("l_tax", DoubleType()),
        ("l_returnflag", StringType()),
        ("l_linestatus", StringType()),
        ("l_shipdate", TimestampType()),
    ),
    # ts unit varies with the generator (timestamp[ns] in early
    # rounds, timestamp[us] since): load_table sniffs the parquet
    # footer and normalizes either to a µs TimestampNTZ, so consumers
    # always see the shape documented here. A ns source is read as
    # raw int64 (Spark has no ns type) and truncated to µs like
    # DuckDB does; a µs source is read natively.
    "events": _st(
        ("event_id", LongType()),
        ("ts", TimestampNTZType()),
        ("user_id", LongType()),
        ("event_type", StringType()),
        ("value", DoubleType()),
        ("props", StringType()),
    ),
    "documents": _st(
        ("doc_id", LongType()),
        ("text", StringType()),
        ("lang", StringType()),
        ("source", StringType()),
        ("n_chars", LongType()),
    ),
    "embeddings": _st(
        ("vec_id", LongType()),
        ("embedding", ArrayType(FloatType())),
        ("label", IntegerType()),
    ),
}

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

#: path -> parquet ts unit ("ns"/"us"); footer sniffs are per-process
_TS_UNIT_CACHE: dict[str, str] = {}


def _events_ts_unit(path: str) -> str:
    """Timestamp unit of events.ts straight from the parquet footer —
    a driver-side metadata read (no data pages), cached per path.
    Defaults to "us" if the footer can't be sniffed (pyarrow missing
    or exotic layout): µs is what every generator since r4 writes."""
    if path in _TS_UNIT_CACHE:
        return _TS_UNIT_CACHE[path]
    unit = "us"
    try:
        import pyarrow.parquet as pq

        target = path
        if os.path.isdir(path):
            parts = sorted(
                f for f in os.listdir(path)
                if f.endswith(".parquet") and not f.startswith((".", "_")))
            if parts:
                target = os.path.join(path, parts[0])
        t = pq.read_schema(target).field("ts").type
        unit = getattr(t, "unit", "us") or "us"
    except Exception:
        pass
    _TS_UNIT_CACHE[path] = unit
    return unit


def load_table(spark: SparkSession, name: str, sf_dir: str = DEFAULT_SF_DIR) -> DataFrame:
    """Scan one table with its declared schema.

    Declaring the schema (rather than letting parquet dictate) keeps
    reads stable across scale factors and lets Catalyst prune/push
    into the scan; ``.explain`` on any downstream query should show
    ``PushedFilters`` and a narrow ``ReadSchema``.
    """
    # Correctness is defined against a UTC reading of the (naive)
    # parquet timestamps; pin it even when the caller's session was
    # built elsewhere (the driver creates its own SparkSession).
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events" and _events_ts_unit(path) == "ns":
        from pyspark.sql import functions as F

        raw = StructType([
            StructField("event_id", LongType()),
            StructField("ts", LongType()),  # ns since epoch (nanosAsLong)
            StructField("user_id", LongType()),
            StructField("event_type", StringType()),
            StructField("value", DoubleType()),
            StructField("props", StringType()),
        ])
        df = spark.read.schema(raw).parquet(path)
        ts = F.timestamp_micros(F.expr("ts div 1000")).cast(TimestampNTZType())
        return df.withColumn("ts", ts)
    return spark.read.schema(TABLE_SCHEMAS[name]).parquet(path)


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    """Load every table; also registers each as a temp view so the
    ``spark.sql`` front end works side-by-side with the DataFrame API."""
    out = {}
    for name in TABLE_SCHEMAS:
        df = load_table(spark, name, sf_dir)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
