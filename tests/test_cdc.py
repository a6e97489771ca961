"""CDC operators: snapshot_diff classification + merge_latest upsert.

Behavioral coverage the oracle rows can't show: each change class on a
hand-built fixture, null-safe compare-column semantics, the
updates-win tiebreak at equal (version, tiebreak), and the plan shape
(snapshot_diff = exactly one join).
"""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from parlerproject_spark.operators.cdc import merge_latest, snapshot_diff


def _diff_map(spark):
    old = spark.createDataFrame([
        Row(k=1, a="x", b=1.0),   # unchanged
        Row(k=2, a="x", b=1.0),   # b changes
        Row(k=3, a="x", b=1.0),   # a and b change
        Row(k=4, a="x", b=1.0),   # removed
        Row(k=6, a=None, b=1.0),  # null -> value (a changes, null-safe)
        Row(k=7, a=None, b=1.0),  # null -> null (unchanged, null-safe)
    ])
    new = spark.createDataFrame([
        Row(k=1, a="x", b=1.0),
        Row(k=2, a="x", b=2.0),
        Row(k=3, a="y", b=3.0),
        Row(k=5, a="z", b=9.0),   # added
        Row(k=6, a="w", b=1.0),
        Row(k=7, a=None, b=1.0),
    ])
    d = snapshot_diff(old, new, key_cols=["k"], compare_cols=["a", "b"])
    return {r["k"]: (r["change"], list(r["changed_cols"]))
            for r in d.collect()}, d


def test_snapshot_diff_classes(spark):
    got, _ = _diff_map(spark)
    assert got == {
        1: ("unchanged", []),
        2: ("changed", ["b"]),
        3: ("changed", ["a", "b"]),
        4: ("removed", []),
        5: ("added", []),
        6: ("changed", ["a"]),
        7: ("unchanged", []),
    }


def _final_plan(df) -> str:
    plan = df._jdf.queryExecution().executedPlan().toString()
    # AQE's toString repeats the tree under "== Initial Plan ==";
    # count operators in the final section only.
    return plan.split("== Initial Plan ==")[0]


def test_snapshot_diff_single_join_plan(spark):
    _, d = _diff_map(spark)
    plan = _final_plan(d)
    assert plan.count("Join") == 1, plan


def test_merge_latest_semantics(spark):
    base = spark.createDataFrame([
        Row(k=1, version=1, ts=10, v="base1"),   # update at higher version wins
        Row(k=2, version=2, ts=10, v="base2"),   # base at higher version survives
        Row(k=3, version=1, ts=10, v="base3"),   # equal version+ts: update wins
        Row(k=4, version=1, ts=10, v="base4"),   # base only
    ])
    upd = spark.createDataFrame([
        Row(k=1, version=2, ts=10, v="upd1"),
        Row(k=2, version=1, ts=99, v="upd2"),
        Row(k=3, version=1, ts=10, v="upd3"),
        Row(k=5, version=1, ts=10, v="upd5"),    # insert
    ])
    m = merge_latest(base, upd, key_cols=["k"],
                     version_col="version", tiebreak_col="ts")
    got = {r["k"]: r["v"] for r in m.collect()}
    assert got == {1: "upd1", 2: "base2", 3: "upd3",
                   4: "base4", 5: "upd5"}
    assert m.count() == 5  # exactly one winner per key


def test_merge_latest_tiebreak_prefers_higher_tiebreak(spark):
    base = spark.createDataFrame([Row(k=1, version=1, ts=20, v="late_base")])
    upd = spark.createDataFrame([Row(k=1, version=1, ts=10, v="early_upd")])
    m = merge_latest(base, upd, key_cols=["k"],
                     version_col="version", tiebreak_col="ts")
    # same version, base has the NEWER tiebreak -> base wins despite src
    assert m.collect()[0]["v"] == "late_base"


def test_snapshot_diff_delta_filter_pushes_above_single_join(spark):
    _, d = _diff_map(spark)
    delta = d.filter(F.col("change") != "unchanged")
    plan = _final_plan(delta)
    assert plan.count("Join") == 1, plan
