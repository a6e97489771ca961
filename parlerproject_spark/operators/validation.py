"""Declarative data-quality expectations — the ingest gate a 100 TB
pipeline runs before a snapshot is allowed to feed training: assert
nullability, uniqueness, ranges, value sets, and regex shapes over a
frame and get back one small per-rule report (checked / failed /
pass-rate / verdict) instead of a crash or a silent bad partition.

Great-Expectations-shaped, Spark-first: every ROW-level rule compiles
to a conditional-aggregation expression, so an arbitrarily long rule
list over an arbitrarily wide table costs exactly ONE pass over the
data (one global aggregate with map-side partials, no shuffle wider
than a single row of counters). The only rule kind that cannot ride
that pass is `unique`, which needs a distinct count — each unique
rule adds one column-keyed aggregation (still a plain count-distinct
shuffle, no windows). Results come back as a constant-size table —
one row per rule — assembled driver-side from the single collected
counter row (a bounded, rule-count-sized read, documented).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from decimal import Decimal, ROUND_HALF_UP
from typing import Any, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_ROW_KINDS = ("not_null", "in_range", "in_set", "matches", "custom")
_KINDS = _ROW_KINDS + ("unique",)


@dataclass(frozen=True)
class Expectation:
    """One declarative rule.

    kind:
      not_null  — col IS NOT NULL
      in_range  — lo <= col <= hi (params: lo, hi; NULL fails)
      in_set    — col ∈ params["values"] (NULL fails)
      matches   — col RLIKE params["pattern"] (NULL fails)
      unique    — col has no duplicate non-NULL values
      custom    — params["predicate"] is a boolean Column; rows where
                  it is NULL or false fail
    """
    name: str
    kind: str
    col: str | None = None
    params: dict[str, Any] = field(default_factory=dict)

    def __post_init__(self):
        if self.kind not in _KINDS:
            raise ValueError(f"unknown expectation kind {self.kind!r}")
        if self.kind != "custom" and not self.col:
            raise ValueError(f"{self.kind} expectation needs a column")


def _violated(e: Expectation) -> F.Column:
    """Boolean column: True where the row VIOLATES the rule."""
    c = F.col(e.col) if e.col else None
    if e.kind == "not_null":
        return c.isNull()
    if e.kind == "in_range":
        lo, hi = e.params["lo"], e.params["hi"]
        ok = (c >= F.lit(lo)) & (c <= F.lit(hi))
        return ~F.coalesce(ok, F.lit(False))
    if e.kind == "in_set":
        vals = list(e.params["values"])
        if not vals:
            raise ValueError("in_set expectation needs a non-empty set")
        return ~F.coalesce(c.isin(vals), F.lit(False))
    if e.kind == "matches":
        return ~F.coalesce(c.rlike(e.params["pattern"]), F.lit(False))
    if e.kind == "custom":
        pred = e.params["predicate"]
        return ~F.coalesce(pred, F.lit(False))
    raise AssertionError(e.kind)


def expect_suite(df: DataFrame, rules: Sequence[Expectation],
                 spark=None) -> DataFrame:
    """Evaluate every rule and return one row per rule:
    rule, kind, col, n_checked, n_failed, pass_rate (6 dp), passed.

    n_checked is the full row count for row-level rules and the
    non-NULL row count for `unique` (NULLs are not duplicates of
    each other — the SQL UNIQUE convention; pair a not_null rule to
    forbid them). pass_rate = 1 − n_failed / n_checked (1.0 when
    n_checked = 0: an empty frame vacuously passes).

    One job for all row-level rules (single conditional aggregate),
    plus one count-distinct aggregate per unique rule. The collected
    state is ONE row of 2·|rules| counters — bounded by the suite
    size, never by the data.
    """
    if not rules:
        raise ValueError("expect_suite needs at least one rule")
    names = [r.name for r in rules]
    if len(set(names)) != len(names):
        raise ValueError("duplicate expectation names")
    spark = spark or df.sparkSession

    row_rules = [r for r in rules if r.kind != "unique"]
    uni_rules = [r for r in rules if r.kind == "unique"]

    counters: dict[str, tuple[int, int]] = {}
    if row_rules:
        aggs = [F.count(F.lit(1)).alias("__n")]
        for i, r in enumerate(row_rules):
            aggs.append(F.sum(F.when(_violated(r), 1).otherwise(0))
                        .alias(f"__f{i}"))
        row = df.agg(*aggs).collect()[0]
        for i, r in enumerate(row_rules):
            counters[r.name] = (int(row["__n"]),
                                int(row[f"__f{i}"] or 0))
    for r in uni_rules:
        row = (df.agg(
            F.count(F.col(r.col)).alias("__n"),
            F.count_distinct(F.col(r.col)).alias("__d")).collect()[0])
        n = int(row["__n"])
        counters[r.name] = (n, n - int(row["__d"] or 0))

    out_rows = []
    for r in rules:
        n, f = counters[r.name]
        # HALF_UP like Spark/DuckDB round(), not Python's banker's
        rate = 1.0 if n == 0 else float(
            Decimal(1.0 - f / n).quantize(Decimal("0.000001"),
                                          rounding=ROUND_HALF_UP))
        out_rows.append((r.name, r.kind, r.col or "", n, f,
                         rate + 0.0, f == 0))
    return spark.createDataFrame(
        out_rows,
        "rule string, kind string, col string, n_checked long, "
        "n_failed long, pass_rate double, passed boolean")


def validation_sink(stream_df: DataFrame, rules: Sequence[Expectation],
                    path: str, *, checkpoint: str):
    """Run the expectation suite on EVERY micro-batch of a stream —
    the ingest gate as a streaming citizen: each batch's per-rule
    report (one row per rule, with the batch id) lands under
    `path`/batch=<id> as parquet; replayed batches overwrite their
    own subdirectory, so restart is idempotent (the rollup_sink /
    cms_sink recipe). Serving reads the directory and has, at any
    mid-stream moment, the full per-batch gate history — which batch
    broke which rule, with counts, instead of a dead stream.

    The per-batch cost is the batch-level expect_suite contract: one
    conditional aggregate for all row-level rules plus one
    count-distinct per unique rule (uniqueness here is WITHIN-batch
    by construction — cross-batch uniqueness is a stateful dedup
    problem, `streaming.stateful` territory — and the report column
    names say so). Returns the StreamingQuery.
    """
    import os

    from pyspark.sql import functions as F

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        rep = expect_suite(batch_df, rules, spark=batch_df.sparkSession)
        (rep.withColumn("batch_id", F.lit(int(batch_id)).cast("long"))
         .coalesce(1)
         .write.mode("overwrite")
         .parquet(os.path.join(path, f"batch={batch_id}")))

    return (stream_df.writeStream.foreachBatch(write_batch)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True).start())


def serve_validation_reports(spark, path: str) -> DataFrame:
    """Read-side union of streamed per-batch gate reports.
    Columns: rule, kind, col, n_checked, n_failed, pass_rate,
    passed, batch_id."""
    return spark.read.parquet(f"{path}/batch=*")
