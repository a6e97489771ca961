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


# SCD Type-2 ---------------------------------------------------------------

def test_scd2_collapses_runs_and_opens_versions(spark):
    from parlerproject_spark.operators.cdc import scd2_history
    rows = [
        (1, 100, "a"), (1, 200, "a"),   # run of a -> one version
        (1, 300, "b"),                  # change -> version 2
        (1, 400, "a"),                  # back to a -> version 3 (not merged)
        (2, 150, "x"),                  # single-state key
    ]
    df = spark.createDataFrame(rows, "k long, ts long, attr string")
    out = {(r["k"], r["version"]): r for r in
           scd2_history(df, key_cols=["k"], ts_col="ts",
                        attr_cols=["attr"]).collect()}
    assert len(out) == 4
    v1, v2, v3 = out[(1, 1)], out[(1, 2)], out[(1, 3)]
    assert (v1["attr"], v1["valid_from"], v1["valid_to"]) == ("a", 100, 300)
    assert (v2["attr"], v2["valid_from"], v2["valid_to"]) == ("b", 300, 400)
    assert (v3["attr"], v3["valid_to"], v3["is_current"]) == ("a", None, True)
    assert not v1["is_current"] and not v2["is_current"]
    assert out[(2, 1)]["is_current"] is True


def test_scd2_null_attr_is_a_state_not_a_wildcard(spark):
    from parlerproject_spark.operators.cdc import scd2_history
    rows = [(1, 100, "a"), (1, 200, None), (1, 300, None), (1, 400, "a")]
    df = spark.createDataFrame(rows, "k long, ts long, attr string")
    out = sorted((r["version"], r["attr"]) for r in
                 scd2_history(df, key_cols=["k"], ts_col="ts",
                              attr_cols=["attr"]).collect())
    # null run collapses (null-safe compare), flanked by two 'a' versions
    assert out == [(1, "a"), (2, None), (3, "a")]


def test_scd2_single_exchange_plan(spark):
    from parlerproject_spark.operators.cdc import scd2_history
    df = spark.range(100).select(
        (F.col("id") % 10).alias("k"), F.col("id").alias("ts"),
        (F.col("id") % 3).cast("string").alias("attr"))
    plan = (scd2_history(df, key_cols=["k"], ts_col="ts",
                         attr_cols=["attr"])
            ._jdf.queryExecution().executedPlan().toString())
    import re
    n_ex = len(re.findall(r"Exchange hashpartitioning", plan))
    assert n_ex == 1, plan


def test_snapshot_asof_reconstructs_past_state(spark):
    from parlerproject_spark.operators.cdc import snapshot_asof
    log = spark.createDataFrame(
        [(1, 10, "a"), (1, 20, "b"), (1, 30, "c"),
         (2, 15, "x"), (2, 40, "y")],
        "k long, v long, state string")
    snap = {r["k"]: r["state"] for r in
            snapshot_asof(log, key_cols=["k"], version_col="v",
                          tiebreak_col="v", asof=25).collect()}
    assert snap == {1: "b", 2: "x"}   # state as of v=25
    latest = {r["k"]: r["state"] for r in
              snapshot_asof(log, key_cols=["k"], version_col="v",
                            tiebreak_col="v", asof=1000).collect()}
    assert latest == {1: "c", 2: "y"}
    # before any change for key 2's first version: key absent
    early = {r["k"] for r in
             snapshot_asof(log, key_cols=["k"], version_col="v",
                           tiebreak_col="v", asof=12).collect()}
    assert early == {1}
