"""JVM-native per-group robust statistics.

The default implementation of per-group median/MAD z-scores. The
grouped-map applyInPandas twin (functions/py_udfs.robust_zscores)
stays as the documented custom-operator escape hatch, but it
materializes each group as one pandas frame — a heavy-hitter key OOMs
a worker at scale. This form is pure Column algebra over window
aggregates: Spark's sort-based window spills to disk, so a hot key
degrades to spilled sort, never to OOM.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def robust_zscores_native(df: DataFrame, *, key_col: str = "user_id",
                          val_col: str = "value",
                          id_col: str = "event_id") -> DataFrame:
    """Per-group robust z-score ((x - median) / MAD) as two window
    aggregates over ONE exchange.

    Both windows partition by `key_col` with no ordering, so the
    second reuses the first's hash partitioning — the physical plan
    has a single Exchange followed by two Window operators. Compare
    the applyInPandas twin: same one shuffle, but whole-group
    materialization in a Python worker.

    Median is Spark's exact interpolated percentile — the same
    definition as numpy / DuckDB quantile_cont, so all three agree
    bit-for-bit after round(, 6). Null semantics follow SQL: nulls
    are ignored by the medians, a null value yields a null z when
    MAD > 0, and a group with MAD = 0 or NULL (constant or all-null)
    emits z = 0.0 for every row. Columns: <key_col>, <id_col>, z.
    """
    w = Window.partitionBy(key_col)
    staged = df.select(
        key_col, id_col, F.col(val_col).alias("__v"),
        F.median(val_col).over(w).alias("__med"))
    staged = staged.withColumn(
        "__mad", F.median(F.abs(F.col("__v") - F.col("__med"))).over(w))
    z = (F.when(F.col("__mad") > 0,
                F.round((F.col("__v") - F.col("__med")) / F.col("__mad"), 6))
         .otherwise(F.lit(0.0)))
    return staged.select(key_col, id_col, z.alias("z"))
