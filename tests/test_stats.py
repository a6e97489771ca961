"""Robust z-scores: JVM-native default vs applyInPandas escape hatch.

The two implementations must agree row-for-row (including null
handling), and the native plan must stay at ONE exchange — the whole
point of the window-aggregate form (VERDICT r2 task 4).
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from parlerproject_spark.catalog import load_table
from parlerproject_spark.functions.py_udfs import robust_zscores
from parlerproject_spark.operators.stats import robust_zscores_native


def _as_map(rows):
    return {(r["user_id"], r["event_id"]): r["z"] for r in rows}


def test_native_matches_pandas_on_events(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir)
    a = _as_map(robust_zscores_native(ev).collect())
    b = _as_map(robust_zscores(ev).collect())
    assert a.keys() == b.keys()
    for k in a:
        assert a[k] is not None and b[k] is not None, k
        assert math.isclose(a[k], b[k], abs_tol=1e-9), (k, a[k], b[k])


def test_null_values_dont_poison_group(spark):
    """ADVICE r2: a single NULL must not NaN the whole group. Both
    impls: nulls excluded from median/MAD, null value -> null z when
    MAD > 0, constant group -> z = 0.0 everywhere."""
    rows = [
        # user 1: values 1..5 with one null -> median 3, MAD 1
        (1, 10, 1.0), (1, 11, 2.0), (1, 12, 3.0), (1, 13, 4.0),
        (1, 14, 5.0), (1, 15, None),
        # user 2: constant -> MAD 0 -> z = 0.0 (even the null row)
        (2, 20, 7.0), (2, 21, 7.0), (2, 22, None),
    ]
    df = spark.createDataFrame(rows, "user_id long, event_id long, value double")
    for impl in (robust_zscores_native, robust_zscores):
        z = _as_map(impl(df).collect())
        assert z[(1, 12)] == 0.0
        assert z[(1, 14)] == 2.0
        assert z[(1, 15)] is None, impl.__name__
        assert z[(2, 20)] == 0.0
        assert z[(2, 22)] == 0.0, impl.__name__


def test_native_plan_single_exchange(spark, sf_dir):
    """Both windows partition on user_id with no ordering — the
    second must reuse the first's exchange."""
    ev = load_table(spark, "events", sf_dir)
    plan = robust_zscores_native(ev)._jdf.queryExecution() \
        .executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan
