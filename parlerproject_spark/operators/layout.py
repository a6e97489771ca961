"""Physical layout operators: bucketing + partitioned tables.

At 100 TB the dominant cost of repeated joins/aggs on the same key
is the shuffle. Bucketing pre-shuffles ONCE at write time: two
tables bucketed by the same key into the same bucket count join with
ZERO exchanges (tests/test_layout.py proves it on the plan). This is
the engine's answer for the reference's repeatedly-joined keys
(filename across listing/status/metadata; doc_id across
documents/embeddings/topics).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, *, by: str, buckets: int = 32,
                   sort: bool = True) -> None:
    """Persist as a bucketed (+ sorted) managed table. Sorting within
    buckets additionally removes the sort from sort-merge joins.

    Drops any previous incarnation first — overwrite alone leaves the
    managed location behind and the next save collides on it."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "")
    if warehouse.startswith("file:"):
        import shutil
        from urllib.parse import urlparse
        shutil.rmtree(f"{urlparse(warehouse).path}/{table.lower()}",
                      ignore_errors=True)
    w = df.write.mode("overwrite").bucketBy(buckets, by)
    if sort:
        w = w.sortBy(by)
    w.saveAsTable(table)


def co_partitioned(left: DataFrame, right: DataFrame, on: str,
                   *, partitions: int = 32) -> tuple[DataFrame, DataFrame]:
    """Session-lifetime analogue of bucketing: repartition both sides
    on the join key once, so every subsequent join/groupBy on that
    key reuses the exchange (Spark's ReusedExchange / ENSURE_
    REQUIREMENTS elides the second shuffle)."""
    return (left.repartition(partitions, on),
            right.repartition(partitions, on))
