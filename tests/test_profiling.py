"""Dataset profiling operators (operators/profiling.py): one-pass
column profiles, key-skew reports, and bounded-memory two-pass heavy
hitters."""

from __future__ import annotations

from pyspark.sql import functions as F

from parlerproject_spark.operators.profiling import (
    heavy_hitters,
    key_skew_report,
    misra_gries_candidates,
    profile_table,
)


def test_profile_table_counts_nulls_and_distinct(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "a"), (None, "b")],
        "x bigint, s string")
    out = {r["col_name"]: r for r in
           profile_table(df, ["x", "s"]).collect()}
    assert out["x"]["n_rows"] == 4
    assert out["x"]["n_nulls"] == 1
    assert out["x"]["n_distinct"] == 3
    assert out["x"]["min_s"] == "1" and out["x"]["max_s"] == "3"
    assert out["s"]["n_nulls"] == 1
    assert out["s"]["n_distinct"] == 2
    assert out["s"]["min_s"] == "a" and out["s"]["max_s"] == "b"


def test_profile_table_approx_path_close_to_exact(spark):
    df = spark.range(0, 5000).select(
        F.col("id"), (F.col("id") % 97).alias("m"))
    out = {r["col_name"]: r for r in
           profile_table(df, ["id", "m"], approx=True).collect()}
    # HLL default rsd 5%: 97 distinct should estimate within 10
    assert abs(out["m"]["n_distinct"] - 97) <= 10
    assert abs(out["id"]["n_distinct"] - 5000) <= 5000 * 0.1


def test_key_skew_report_shares_sum_to_one_for_full_top(spark):
    df = spark.createDataFrame(
        [(k,) for k in [1] * 6 + [2] * 3 + [3] * 1], "k bigint")
    rows = key_skew_report(df, "k", top=10).collect()
    assert [r["k"] for r in rows] == [1, 2, 3]
    assert [r["n_rows"] for r in rows] == [6, 3, 1]
    assert rows[0]["share"] == 0.6
    assert rows[-1]["cum_share"] == 1.0


def _skewed(spark, n_noise=3000, hot=400):
    """One hot key amid a long tail of singletons — the MG target."""
    noise = spark.range(0, n_noise).select(
        (F.col("id") + 1000).alias("k"))
    hot_df = spark.range(0, hot).select(F.lit(7).alias("k"))
    return noise.unionByName(hot_df).repartition(8)


def test_misra_gries_summary_is_bounded_and_keeps_hot_key(spark):
    df = _skewed(spark)
    k = 10
    cands = misra_gries_candidates(df, "k", k=k)
    per_part = (cands.groupBy(F.spark_partition_id().alias("p"))
                .agg(F.count("*").alias("n")).collect())
    # each partition summary is bounded by k counters
    assert all(r["n"] <= k for r in per_part)
    assert 7 in {r["k"] for r in cands.collect()}


def test_heavy_hitters_equals_exact_group_by(spark):
    df = _skewed(spark)
    k = 10
    got = {(r["k"], r["n_rows"])
           for r in heavy_hitters(df, "k", k=k).collect()}
    n = df.count()
    want = {(r["k"], r["n"]) for r in
            df.groupBy("k").agg(F.count("*").alias("n"))
            .filter(F.col("n") * (k + 1) > n).collect()}
    assert got == want and got == {(7, 400)}


def test_heavy_hitters_ignores_nulls_in_candidates(spark):
    df = spark.createDataFrame(
        [(None,)] * 50 + [(1,)] * 30 + [(2,)] * 3, "k bigint")
    cands = misra_gries_candidates(df, "k", k=5).collect()
    assert None not in {r["k"] for r in cands}


def test_file_size_report_counts_every_file(spark, tmp_path):
    from parlerproject_spark.operators.profiling import file_size_report
    path = str(tmp_path / "t")
    spark.range(0, 1000).repartition(4).write.parquet(path)
    rows = file_size_report(spark, path).collect()
    assert len(rows) == 4
    assert sum(r["n_rows"] for r in rows) == 1000
    assert all(r["bytes"] > 0 for r in rows)


def test_schema_diff_classifies_all_changes(spark, tmp_path):
    from pyspark.sql import functions as SF

    from parlerproject_spark.operators.profiling import schema_diff
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    spark.range(3).select("id", SF.lit("x").alias("gone"),
                          SF.lit(1).alias("mut")).write.parquet(a)
    spark.range(3).select("id", SF.lit(2.5).alias("mut"),
                          SF.lit(True).alias("fresh")).write.parquet(b)
    got = {r["col_name"]: r["status"]
           for r in schema_diff(spark, a, b).collect()}
    assert got == {"id": "same", "gone": "removed",
                   "mut": "type_changed", "fresh": "added"}


class TestAssociationAudit:
    def _run(self, spark, rows):
        from parlerproject_spark.operators.profiling import association_audit
        df = spark.createDataFrame(rows, "a string, b string")
        return association_audit(df, "a", "b").collect()[0]

    def test_independent_columns_score_zero(self, spark):
        # perfectly balanced 2x2: chi2 = 0, V = 0, MI = 0
        rows = [(a, b) for a in "xy" for b in "uv" for _ in range(3)]
        r = self._run(spark, rows)
        assert (r.chi2, r.cramers_v, r.mi) == (0.0, 0.0, 0.0)
        assert r.n == 12 and r.dof == 1

    def test_perfect_association(self, spark):
        import math
        # a determines b: V = 1, MI = ln(2) (uniform 2-class)
        rows = [("x", "u")] * 4 + [("y", "v")] * 4
        r = self._run(spark, rows)
        assert r.cramers_v == 1.0
        assert abs(r.mi - round(math.log(2), 6)) < 1e-9
        assert r.chi2 == 8.0          # n * (min(R,C)-1) at V=1

    def test_hand_2x2_chi2(self, spark):
        # cells: xu=3, xv=1, yu=1, yv=3 -> chi2 = n(sum c^2/(r c) - 1)
        rows = ([("x", "u")] * 3 + [("x", "v")]
                + [("y", "u")] + [("y", "v")] * 3)
        r = self._run(spark, rows)
        expect = 8 * ((9 + 1 + 1 + 9) / 16.0 - 1.0)
        assert abs(r.chi2 - round(expect, 6)) < 1e-9
        assert r.n_a == 2 and r.n_b == 2


class TestProfileDrift:
    def test_null_and_range_movement(self, spark):
        from parlerproject_spark.operators.profiling import profile_drift
        ref = spark.createDataFrame(
            [(1, "a"), (2, "b"), (3, None), (4, "c")],
            "k bigint, v string")
        cur = spark.createDataFrame(
            [(1, None), (2, None), (9, "c"), (4, "c")],
            "k bigint, v string")
        out = {r["col_name"]: r
               for r in profile_drift(ref, cur, ["k", "v"]).collect()}
        assert out["v"]["null_rate_ref"] == 0.25
        assert out["v"]["null_rate_cur"] == 0.5
        assert out["v"]["null_rate_delta"] == 0.25
        assert out["k"]["range_changed"] is True    # max 4 -> 9
        assert out["v"]["range_changed"] is True    # min a -> c
        assert out["k"]["distinct_ref"] == 4 and out["k"]["distinct_cur"] == 4

    def test_identical_snapshots_report_no_drift(self, spark):
        from parlerproject_spark.operators.profiling import profile_drift
        df = spark.createDataFrame([(1, "x"), (2, "y")], "k bigint, v string")
        for r in profile_drift(df, df, ["k", "v"]).collect():
            assert r["null_rate_delta"] == 0.0
            assert r["range_changed"] is False
