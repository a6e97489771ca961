"""Time-series operators (operators/timeseries.py)."""

from __future__ import annotations

from datetime import datetime

import pytest

from parlerproject_spark.operators.timeseries import (interpolate_grid,
                                                      time_weighted_avg)


def _ts(minute, second=0):
    return datetime(2024, 1, 1, 0, minute, second)


def test_time_weighted_avg_trapezoid(spark):
    # u1: v=0 for 10 min then jumps to 10 for 10 min →
    #     areas: (0+10)/2*10 + (10+10)/2*10 = 150 over 20 → 7.5
    # u2: single sample → falls back to the value
    rows = [(1, _ts(0), 0.0), (1, _ts(10), 10.0), (1, _ts(20), 10.0),
            (2, _ts(5), 42.0)]
    df = spark.createDataFrame(rows, ["user_id", "ts", "value"])
    got = {r["user_id"]: r for r in
           time_weighted_avg(df, key_col="user_id").collect()}
    assert got[1]["twa"] == pytest.approx(7.5)
    assert got[1]["n_samples"] == 3
    assert got[2]["twa"] == pytest.approx(42.0)
    assert got[2]["n_samples"] == 1


def test_time_weighted_avg_ignores_burst_overweighting(spark):
    # 60 min at v=1, then a 3-sample burst at v=100 within one
    # minute: plain avg ≈ 75, time-weighted stays near 1
    rows = [(1, _ts(0), 1.0), (1, datetime(2024, 1, 1, 1, 0), 1.0),
            (1, datetime(2024, 1, 1, 1, 0, 20), 100.0),
            (1, datetime(2024, 1, 1, 1, 0, 40), 100.0)]
    df = spark.createDataFrame(rows, ["user_id", "ts", "value"])
    [r] = time_weighted_avg(df, key_col="user_id").collect()
    assert r["twa"] < 5


def test_interpolate_grid_linear_values(spark):
    # samples at :00 (v=0) and :60 (v=60) → hourly grid hits both
    # ends exactly; a second user samples at :30/:90 → single grid
    # point at :60 interpolates halfway
    rows = [(1, _ts(0), 0.0), (1, datetime(2024, 1, 1, 1, 0), 60.0),
            (2, _ts(30), 10.0), (2, datetime(2024, 1, 1, 1, 30), 30.0)]
    df = spark.createDataFrame(rows, ["user_id", "ts", "value"])
    got = {(r["user_id"], r["grid_ts"]): r["v_interp"]
           for r in interpolate_grid(df, key_col="user_id",
                                     step_minutes=60).collect()}
    assert got[(1, _ts(0))] == pytest.approx(0.0)
    assert got[(1, datetime(2024, 1, 1, 1, 0))] == pytest.approx(60.0)
    assert got[(2, datetime(2024, 1, 1, 1, 0))] == pytest.approx(20.0)
    assert len(got) == 3


def test_interpolate_grid_duplicate_instants_averaged(spark):
    rows = [(1, _ts(0), 0.0), (1, _ts(0), 10.0),
            (1, datetime(2024, 1, 1, 2, 0), 5.0)]
    df = spark.createDataFrame(rows, ["user_id", "ts", "value"])
    got = {r["grid_ts"]: r["v_interp"]
           for r in interpolate_grid(df, key_col="user_id",
                                     step_minutes=60).collect()}
    assert got[_ts(0)] == pytest.approx(5.0)          # mean of dup instant
    assert got[datetime(2024, 1, 1, 1, 0)] == pytest.approx(5.0)
    assert got[datetime(2024, 1, 1, 2, 0)] == pytest.approx(5.0)


def test_ses_level_matches_sequential_recurrence(spark):
    from parlerproject_spark.operators.timeseries import ses_level
    xs = [3.0, 5.0, 4.0, 8.0, 2.0, 6.0]
    alpha = 0.3
    lvl = xs[0]
    for x in xs[1:]:
        lvl = alpha * x + (1 - alpha) * lvl
    df = spark.createDataFrame(
        [("u", i, x) for i, x in enumerate(xs)],
        "k string, b int, x double")
    [r] = ses_level(df, key_col="k", bucket_col="b", val_col="x",
                    alpha=alpha).collect()
    assert r["n_buckets"] == len(xs)
    assert abs(r["level"] - lvl) < 1e-6


def test_ses_level_single_point_is_itself(spark):
    from parlerproject_spark.operators.timeseries import ses_level
    df = spark.createDataFrame([("u", 0, 42.5)], "k string, b int, x double")
    [r] = ses_level(df, key_col="k", bucket_col="b", val_col="x").collect()
    assert r["level"] == 42.5


def test_ses_level_recent_values_dominate(spark):
    from parlerproject_spark.operators.timeseries import ses_level
    df = spark.createDataFrame(
        [("u", i, 0.0) for i in range(20)] + [("u", 20, 100.0)],
        "k string, b int, x double")
    [r] = ses_level(df, key_col="k", bucket_col="b", val_col="x",
                    alpha=0.5).collect()
    assert r["level"] == 50.0   # alpha * latest


class TestTheilSenTrend:
    def _run(self, spark, rows):
        from datetime import datetime, timedelta
        from parlerproject_spark.operators.timeseries import theil_sen_trend
        t0 = datetime(2024, 1, 1)
        data = [(u, t0 + timedelta(hours=h), float(v)) for u, h, v in rows]
        df = spark.createDataFrame(
            data, "user_id long, ts timestamp_ntz, value double")
        return {r.user_id: r for r in theil_sen_trend(df).collect()}

    def test_exact_line_recovery(self, spark):
        # y = 2x + 5 exactly: every pairwise slope is 2
        rows = [(1, h, 2 * h + 5) for h in range(6)]
        r = self._run(spark, rows)[1]
        assert r.slope == 2.0 and r.intercept == 5.0
        assert r.n_pairs == 15

    def test_outlier_resistance_beats_ols(self, spark):
        from datetime import datetime, timedelta
        import pyspark.sql.functions as F
        from parlerproject_spark.operators.timeseries import (linear_trend,
                                                              theil_sen_trend)
        # y = x with ONE wild outlier at the end
        rows = [(1, h, float(h)) for h in range(10)] + [(1, 10, 1000.0)]
        t0 = datetime(2024, 1, 1)
        df = spark.createDataFrame(
            [(u, t0 + timedelta(hours=h), v) for u, h, v in rows],
            "user_id long, ts timestamp_ntz, value double")
        ts = theil_sen_trend(df).collect()[0]
        ols = linear_trend(df).collect()[0]
        assert abs(ts.slope - 1.0) < 0.01      # robust: barely moves
        assert ols.slope > 10                  # OLS dragged far off

    def test_equal_timestamps_excluded(self, spark):
        # two readings at the SAME instant never pair (no 0-division);
        # remaining pairs still fit the line
        rows = [(1, 0, 0.0), (1, 0, 100.0), (1, 1, 1.0), (1, 2, 2.0)]
        r = self._run(spark, rows)[1]
        # pairs: (0h,1h),(0h,2h) x2 readings at 0h -> 5 valid pairs
        assert r.n_pairs == 5
        assert r.slope is not None


class TestTheilSenMaxPerKey:
    def _df(self, spark, rows):
        from datetime import datetime, timedelta
        t0 = datetime(2024, 1, 1)
        return spark.createDataFrame(
            [(u, t0 + timedelta(hours=h), float(v)) for u, h, v in rows],
            "user_id long, ts timestamp_ntz, value double")

    def test_cap_above_depth_is_identity(self, spark):
        from parlerproject_spark.operators.timeseries import theil_sen_trend
        rows = ([(1, h, 2 * h + 5) for h in range(6)]
                + [(2, h, -h + 3.5) for h in range(4)])
        df = self._df(spark, rows)
        uncapped = sorted(map(tuple, theil_sen_trend(df).collect()))
        capped = sorted(map(tuple,
                            theil_sen_trend(df, max_per_key=10).collect()))
        assert capped == uncapped

    def test_cap_bounds_pair_volume_deterministically(self, spark):
        from parlerproject_spark.operators.timeseries import theil_sen_trend
        # key 1 is 50 deep (hot key), key 2 is 3 deep (untouched)
        rows = ([(1, h, 3 * h + 1) for h in range(50)]
                + [(2, h, float(h)) for h in range(3)])
        df = self._df(spark, rows)
        got = {r.user_id: r
               for r in theil_sen_trend(df, max_per_key=8).collect()}
        assert got[1].n_pairs == 8 * 7 // 2          # capped at N(N-1)/2
        assert got[1].slope == 3.0                   # exact line survives
        assert got[2].n_pairs == 3                   # below cap: all pairs
        again = {r.user_id: r
                 for r in theil_sen_trend(df, max_per_key=8).collect()}
        assert {u: tuple(r) for u, r in got.items()} == \
               {u: tuple(r) for u, r in again.items()}   # md5 rank: stable


class TestAutocorrelation:
    def test_hand_cases(self, spark):
        from parlerproject_spark.operators.timeseries import (
            autocorrelation)
        import datetime as dt
        t0 = dt.datetime(2024, 1, 1)
        # key 1: perfectly alternating around the mean -> r1 = -1
        rows = [(1, t0 + dt.timedelta(hours=i), i,
                 1.0 if i % 2 == 0 else -1.0) for i in range(8)]
        # key 2: constant series -> zero variance -> null ACF
        rows += [(2, t0 + dt.timedelta(hours=i), 100 + i, 5.0)
                 for i in range(6)]
        df = spark.createDataFrame(
            rows, "user_id bigint, ts timestamp, event_id bigint, "
                  "value double")
        out = {r["user_id"]: r for r in autocorrelation(df).collect()}
        assert out[1]["n"] == 8
        assert abs(out[1]["r1"] - (-7 / 8)) < 1e-6   # Σ7 terms / Σ8
        assert abs(out[1]["r2"] - (6 / 8)) < 1e-6
        assert out[2]["r1"] is None and out[2]["r2"] is None

    def test_bounded_and_lag_terms(self, spark):
        from parlerproject_spark.operators.timeseries import (
            autocorrelation)
        ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        for r in autocorrelation(ev).collect():
            for k in ("r1", "r2", "r3"):
                if r[k] is not None:
                    assert -1.0 - 1e-9 <= r[k] <= 1.0 + 1e-9
