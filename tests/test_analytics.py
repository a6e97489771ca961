"""Behavioral analytics operators (operators/analytics.py)."""

from __future__ import annotations

from datetime import datetime

import pytest

from parlerproject_spark.operators.analytics import (cohort_retention,
                                                     funnel,
                                                     rolling_features)


def _t(day, hour=0):
    return datetime(2024, 1, day, hour)


def test_funnel_ordered_strictly(spark):
    rows = [
        # u1 converts fully in order
        (1, _t(1), "view"), (1, _t(2), "click"), (1, _t(3), "purchase"),
        # u2 has all three but out of order — purchase precedes click
        (2, _t(1), "view"), (2, _t(2), "purchase"), (2, _t(3), "click"),
        # u3 stalls at depth 1
        (3, _t(1), "view"), (3, _t(2), "view"),
        # u4 never views: depth 0 despite click+purchase
        (4, _t(1), "click"), (4, _t(2), "purchase"),
        # u5: same-instant click does NOT advance (strict >)
        (5, _t(1), "view"), (5, _t(1), "click"),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_type"])
    got = {r["user_id"]: (r["depth"], r["converted"])
           for r in funnel(df, ["view", "click", "purchase"]).collect()}
    assert got[1] == (3, True)
    assert got[2] == (2, False)    # view→click matched, purchase too early
    assert got[3] == (1, False)
    assert got[4] == (0, False)
    assert got[5] == (1, False)


def test_funnel_greedy_uses_earliest_conversion(spark):
    # view@1 click@2 view@5 purchase@3: greedy chain view@1→click@2→
    # purchase@3 converts; an algorithm anchoring on the LAST view
    # would miss it
    rows = [(1, _t(1), "view"), (1, _t(2), "click"),
            (1, _t(5), "view"), (1, _t(3), "purchase")]
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_type"])
    [r] = funnel(df, ["view", "click", "purchase"]).collect()
    assert r["depth"] == 3 and r["converted"]


def test_cohort_retention_triangle(spark):
    rows = [
        (1, _t(1)), (1, _t(8)), (1, _t(15)),   # weeks 0,1,2
        (2, _t(1)), (2, _t(15)),               # weeks 0,2 (skips 1)
        (3, _t(8)),                            # later cohort, week 0 only
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts"])
    got = {(str(r["cohort"]), r["offset"]): r["n_users"]
           for r in cohort_retention(df, period="week").collect()}
    c0 = "2024-01-01"                          # Monday of week 1
    c1 = "2024-01-08"
    assert got[(c0, 0)] == 2
    assert got[(c0, 1)] == 1
    assert got[(c0, 2)] == 2
    assert got[(c1, 0)] == 1
    assert len(got) == 4


def test_rolling_features_window_and_lags(spark):
    rows = [(1, _t(d), float(d)) for d in (1, 2, 3, 12)]
    df = spark.createDataFrame(rows, ["user_id", "ts", "value"])
    got = {r["ts"]: r for r in
           rolling_features(df, days=7, n_lags=2).collect()}
    r3 = got[_t(3)]
    assert r3["roll_n"] == 3 and r3["roll_sum"] == pytest.approx(6.0)
    assert r3["roll_min"] == 1.0 and r3["roll_max"] == 3.0
    assert r3["lag_1"] == 2.0 and r3["lag_2"] == 1.0
    r12 = got[_t(12)]                 # 7-day frame excludes days 1-3
    assert r12["roll_n"] == 1 and r12["roll_sum"] == pytest.approx(12.0)
    assert r12["lag_1"] == 3.0        # lags are positional, not framed
    r1 = got[_t(1)]
    assert r1["lag_1"] is None and r1["lag_2"] is None


def test_markov_transitions_probabilities(spark):
    from parlerproject_spark.operators.analytics import markov_transitions
    rows = [
        # user 1: A -> B -> A -> C   (A->B, B->A, A->C)
        (1, _t(1), 1, "A"), (2, _t(2), 1, "B"),
        (3, _t(3), 1, "A"), (4, _t(4), 1, "C"),
        # user 2: A -> B              (A->B)
        (5, _t(1), 2, "A"), (6, _t(2), 2, "B"),
    ]
    df = spark.createDataFrame(rows, ["event_id", "ts", "user_id",
                                      "event_type"])
    got = {(r["cur"], r["nxt"]): r for r in
           markov_transitions(df, state_col="event_type").collect()}
    assert got[("A", "B")]["n"] == 2
    assert got[("A", "B")]["p"] == pytest.approx(2 / 3, abs=1e-6)
    assert got[("A", "C")]["p"] == pytest.approx(1 / 3, abs=1e-6)
    assert got[("B", "A")]["p"] == pytest.approx(1.0)
    # rows per cur-state sum to 1
    import collections
    sums = collections.defaultdict(float)
    for (cur, _), r in got.items():
        sums[cur] += r["p"]
    assert all(abs(s - 1.0) < 1e-5 for s in sums.values())


def test_item_cf_cosine_and_user_cap(spark):
    from parlerproject_spark.operators.analytics import (
        item_cooccurrence_similarity)
    import json
    rows = []
    eid = 0
    # users 1,2 both touch items 10 and 11 (once each) -> cosine 1.0
    for u in (1, 2):
        for it in (10, 11):
            eid += 1
            rows.append((eid, _t(1), u, "view", json.dumps({"k": it})))
    # user 3 touches item 10 only
    eid += 1
    rows.append((eid, _t(1), 3, "view", json.dumps({"k": 10})))
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "props"])
    got = {(r["item_a"], r["item_b"]): r["sim"] for r in
           item_cooccurrence_similarity(df, max_items_per_user=20,
                                        top_k=5).collect()}
    # vec(10) = [1,1,1] over users 1,2,3; vec(11) = [1,1,0]
    # cos = 2 / (sqrt(3) * sqrt(2))
    import math
    assert got[(10, 11)] == pytest.approx(2 / math.sqrt(6), abs=1e-6)
    assert got[(10, 11)] == got[(11, 10)]

    # hyperactive-user cap: user 4 touches 30 items; with
    # max_items_per_user=2 only the two most-touched survive
    rows4 = []
    eid = 100
    for it in range(30):
        reps = 3 if it in (20, 21) else 1
        for _ in range(reps):
            eid += 1
            rows4.append((eid, _t(1), 4, "view", json.dumps({"k": it})))
    df4 = spark.createDataFrame(
        rows4, ["event_id", "ts", "user_id", "event_type", "props"])
    pairs = item_cooccurrence_similarity(
        df4, max_items_per_user=2, top_k=5).collect()
    items = {r["item_a"] for r in pairs} | {r["item_b"] for r in pairs}
    assert items == {20, 21}


# Touch attribution ---------------------------------------------------------

def _attr_events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double")


def test_touch_attribution_first_and_last_credit(spark):
    from datetime import datetime as dt
    from parlerproject_spark.operators.analytics import touch_attribution
    ev = _attr_events(spark, [
        (1, dt(2024, 1, 1, 0), 1, "view", 0.0),
        (2, dt(2024, 1, 1, 1), 1, "click", 0.0),
        (3, dt(2024, 1, 1, 2), 1, "purchase", 10.0),
        (4, dt(2024, 1, 1, 3), 1, "purchase", 5.0),   # last touch: click
        (5, dt(2024, 1, 1, 0), 2, "purchase", 7.0),   # no prior touch
    ])
    got = {(r["model"], r["channel"]): (r["n_conv"], r["total_value"])
           for r in touch_attribution(ev).collect()}
    assert got == {("first", "view"): (2, 15.0),
                   ("last", "click"): (2, 15.0),
                   ("first", "(none)"): (1, 7.0),
                   ("last", "(none)"): (1, 7.0)}


def test_touch_attribution_conversion_never_credits_itself(spark):
    from datetime import datetime as dt
    from parlerproject_spark.operators.analytics import touch_attribution
    # two consecutive purchases: the second must NOT attribute to the
    # first purchase (conversions are not channels)
    ev = _attr_events(spark, [
        (1, dt(2024, 1, 1, 0), 1, "signup", 0.0),
        (2, dt(2024, 1, 1, 1), 1, "purchase", 1.0),
        (3, dt(2024, 1, 1, 2), 1, "purchase", 2.0),
    ])
    got = {(r["model"], r["channel"]): r["n_conv"]
           for r in touch_attribution(ev).collect()}
    assert got == {("first", "signup"): 2, ("last", "signup"): 2}


def test_srm_check_balanced_vs_skewed(spark):
    from parlerproject_spark.operators.analytics import srm_check
    import pyspark.sql.functions as SF
    base = spark.range(0, 1000).select(SF.col("id").alias("user_id"))
    [ok] = srm_check(base.withColumn("event_type", SF.lit("x"))).collect()
    assert ok["n_0"] == ok["n_1"] == 500 and not ok["srm_alarm"]
    # keep only 10% of one arm -> blatant mismatch
    skew = base.filter((SF.col("user_id") % 2 == 0)
                       | (SF.col("user_id") % 20 == 1))
    [bad] = srm_check(skew.withColumn("event_type", SF.lit("x"))).collect()
    assert bad["srm_alarm"] and bad["chi2"] > 100


class TestRfmScores:
    def test_hand_built_bands(self, spark):
        from datetime import datetime, timedelta
        import pyspark.sql.functions as F
        from parlerproject_spark.operators.analytics import rfm_scores
        t0 = datetime(2024, 1, 1)
        rows = []
        # 5 users: user u has u+1 events of value 10*(u+1), last event
        # u days after t0 -> strictly increasing F, M, recency axes
        for u in range(5):
            for i in range(u + 1):
                rows.append((u, t0 + timedelta(days=u, hours=i),
                             10.0 * (u + 1)))
        df = spark.createDataFrame(
            rows, "user_id long, ts timestamp_ntz, value double")
        out = {r.user_id: r for r in rfm_scores(
            df, asof=F.lit("2024-02-01").cast("timestamp")).collect()}
        # user 4: most recent, most frequent, highest value -> 555
        assert (out[4].r_score, out[4].f_score, out[4].m_score) == (5, 5, 5)
        assert out[4].rfm == 555
        # user 0: oldest, least frequent, lowest value -> 111
        assert out[0].rfm == 111
        # monotone in user id on every axis
        for a in ("r_score", "f_score", "m_score"):
            vals = [getattr(out[u], a) for u in range(5)]
            assert vals == sorted(vals)
        assert out[0].frequency == 1 and out[4].frequency == 5
        assert out[3].monetary == 160.0           # 4 events x 40


class TestGroupSequentialAb:
    def _df(self, spark, rows):
        from datetime import datetime, timedelta
        t0 = datetime(2024, 1, 1)
        return spark.createDataFrame(
            [(u, t0 + timedelta(days=d), t) for u, d, t in rows],
            "user_id long, ts timestamp_ntz, event_type string")

    def test_enrolled_by_cutoff_and_boundary(self, spark):
        from parlerproject_spark.operators.analytics import (
            group_sequential_ab)
        # arm = user_id % 2; user 3 only appears after look 1
        rows = [(0, 0, "view"), (1, 0, "view"), (2, 0, "purchase"),
                (3, 5, "purchase")]
        out = {r.look: r for r in group_sequential_ab(
            self._df(spark, rows),
            ["2024-01-03 00:00:00", "2024-01-10 00:00:00"]).collect()}
        l1 = out[1]
        assert (l1.n_0, l1.n_1) == (2, 1)       # user 3 not yet enrolled
        assert (l1.conv_0, l1.conv_1) == (1, 0)
        assert l1.boundary == 2.241403           # K=2 Bonferroni, not 1.96
        l2 = out[2]
        assert (l2.n_0, l2.n_1) == (2, 2) and l2.conv_1 == 1

    def test_strong_effect_crosses(self, spark):
        from parlerproject_spark.operators.analytics import (
            group_sequential_ab)
        # arm 1 always converts, arm 0 never: z explodes at one look
        rows = [(2 * i, 0, "view") for i in range(50)] \
            + [(2 * i + 1, 0, "purchase") for i in range(50)]
        out = group_sequential_ab(
            self._df(spark, rows), ["2024-01-02 00:00:00"]).collect()[0]
        assert out.crossed and out.z > out.boundary == 1.959964

    def test_null_z_when_degenerate(self, spark):
        from parlerproject_spark.operators.analytics import (
            group_sequential_ab)
        # nobody converts: pooled p = 0, se = 0 -> z null, not crossed
        rows = [(0, 0, "view"), (1, 0, "view")]
        out = group_sequential_ab(
            self._df(spark, rows), ["2024-01-02 00:00:00"]).collect()[0]
        assert out.z is None and not out.crossed


class TestCupedAdjustment:
    def test_perfect_covariate_and_unbiased_lift(self, spark):
        from datetime import datetime
        from parlerproject_spark.operators.analytics import cuped_adjustment
        pre, post = datetime(2024, 1, 10), datetime(2024, 1, 20)
        rows = []
        # y = x exactly (theta=1): CUPED removes ~all variance; arm
        # effect +5 on arm 1 survives adjustment (unbiased)
        # base depends on the PAIR index (u//2), so both arms see the
        # identical covariate distribution: cov(X, arm) = 0 exactly
        # and theta = cov(X, X + 5*arm)/var(X) = 1
        for u in range(40):
            base = float((u // 2) % 7)
            lift = 5.0 if u % 2 == 1 else 0.0
            rows += [(u, pre, base), (u, post, base + lift)]
        df = spark.createDataFrame(
            rows, "user_id long, ts timestamp_ntz, value double")
        r = cuped_adjustment(df).collect()[0]
        assert abs(r.theta - 1.0) < 1e-6
        assert abs(r.lift_raw - 5.0) < 1e-6
        assert abs(r.lift_adj - 5.0) < 1e-6      # adjustment is unbiased
        # Y' = 5*arm exactly: all covariate variance removed
        assert r.var_adj < r.var_y and r.var_reduction > 0.3


class TestAssociationRules:
    def _run(self, spark, rows, min_support=0.0):
        from parlerproject_spark.operators.analytics import association_rules
        df = spark.createDataFrame(rows, "user_id long, event_type string")
        return {(r.antecedent, r.consequent): r for r in
                association_rules(df, min_support=min_support).collect()}

    def test_hand_measures(self, spark):
        # 4 users: {a,b} x2, {a} x1, {b} x1
        rows = [(1, "a"), (1, "b"), (2, "a"), (2, "b"), (3, "a"), (4, "b")]
        out = self._run(spark, rows)
        r = out[("a", "b")]
        assert r.n_both == 2 and r.support == 0.5
        assert r.confidence == round(2 / 3, 6)
        assert r.lift == round(2 * 4 / (3 * 3), 6)
        # duplicate events must not inflate counts (baskets are sets)
        out2 = self._run(spark, rows + [(1, "a"), (1, "a")])
        assert out2[("a", "b")].n_both == 2

    def test_min_support_cut(self, spark):
        rows = [(u, "a") for u in range(99)] + [(99, "a"), (99, "b")]
        out = self._run(spark, rows, min_support=0.05)
        assert out == {}          # a-b co-occurs in 1/100 baskets only


class TestGiniCoefficient:
    def _run(self, spark, vals):
        from parlerproject_spark.operators.analytics import gini_coefficient
        df = spark.createDataFrame([(float(v),) for v in vals],
                                   "value double")
        return gini_coefficient(df).collect()[0]

    def test_equality_and_concentration_extremes(self, spark):
        assert self._run(spark, [5, 5, 5, 5]).gini == 0.0
        # all mass on one of n units -> G = (n-1)/n
        r = self._run(spark, [0, 0, 0, 10])
        assert r.gini == 0.75 and r.mean == 2.5

    def test_hand_case(self, spark):
        # y = {1,2,3}: sum|yi-yj| = 2*(1+2+1) = 8; G = 8/(2*9*2) = 2/9
        r = self._run(spark, [1, 2, 3])
        assert abs(r.gini - round(2 / 9, 6)) < 1e-9


class TestSpearmanByGroup:
    def _run(self, spark, rows):
        from parlerproject_spark.operators.analytics import spearman_by_group
        df = spark.createDataFrame(rows, "g string, x double, y double")
        return {r.g: r for r in spearman_by_group(
            df, group_col="g", x_col="x", y_col="y").collect()}

    def test_monotone_extremes(self, spark):
        rows = [("up", float(i), float(i * i)) for i in range(8)] \
            + [("down", float(i), float(-i)) for i in range(8)]
        out = self._run(spark, rows)
        # nonlinear but monotone -> rho exactly 1 (Pearson would not be)
        assert out["up"].spearman_rho == 1.0
        assert out["down"].spearman_rho == -1.0

    def test_tie_average_ranks(self, spark):
        # x ties at 1.0 get average rank 1.5 each; hand rho:
        # ranks x = [1.5, 1.5, 3], y = [1, 2, 3] -> corr = sqrt(3)/2
        import math
        rows = [("t", 1.0, 10.0), ("t", 1.0, 20.0), ("t", 2.0, 30.0)]
        r = self._run(spark, rows)["t"]
        assert abs(r.spearman_rho - round(math.sqrt(3) / 2, 6)) < 1e-9
