"""PSI distribution-drift monitor (operators/stats.psi_drift)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from parlerproject_spark.operators.stats import psi_drift


def _df(spark, rows):
    return spark.createDataFrame(rows, "k string, v double")


def test_identical_distributions_score_near_zero(spark):
    rows = [("a", float(i % 20)) for i in range(400)]
    out = psi_drift(_df(spark, rows), _df(spark, rows),
                    key_col="k", val_col="v").collect()
    [r] = out
    assert abs(r["psi"]) < 1e-6
    assert r["n_ref"] == r["n_cur"] == 400


def test_shifted_distribution_flags(spark):
    ref = _df(spark, [("a", float(i % 20)) for i in range(400)])
    cur = _df(spark, [("a", float(15 + i % 5)) for i in range(400)])
    [r] = psi_drift(ref, cur, key_col="k", val_col="v").collect()
    assert r["psi"] > 0.25  # action threshold


def test_out_of_range_mass_clamps_to_edge_bins(spark):
    ref = _df(spark, [("a", float(i)) for i in range(100)])
    cur = _df(spark, [("a", 1e6)] * 50)   # far beyond ref max
    [r] = psi_drift(ref, cur, key_col="k", val_col="v").collect()
    assert math.isfinite(r["psi"]) and r["psi"] > 0.25


def test_constant_reference_column_single_bin(spark):
    ref = _df(spark, [("a", 7.0)] * 30)
    cur = _df(spark, [("a", 7.0)] * 30 + [("a", 9.0)] * 0)
    [r] = psi_drift(ref, cur, key_col="k", val_col="v").collect()
    assert math.isfinite(r["psi"]) and abs(r["psi"]) < 1e-6


def test_per_key_independence(spark):
    ref = _df(spark, [("a", float(i % 10)) for i in range(100)]
              + [("b", float(i % 10)) for i in range(100)])
    cur = _df(spark, [("a", float(i % 10)) for i in range(100)]
              + [("b", 9.0)] * 100)
    out = {r["k"]: r["psi"] for r in
           psi_drift(ref, cur, key_col="k", val_col="v").collect()}
    assert abs(out["a"]) < 1e-6
    assert out["b"] > 0.25


def test_edges_broadcast_not_shuffled(spark):
    ref = _df(spark, [("a", float(i)) for i in range(50)])
    cur = _df(spark, [("a", float(i)) for i in range(50)])
    plan = psi_drift(ref, cur, key_col="k", val_col="v") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


# KS drift -------------------------------------------------------------------

def test_ks_identical_is_zero(spark):
    from parlerproject_spark.operators.stats import ks_drift
    rows = [("a", float(i % 20)) for i in range(200)]
    [r] = ks_drift(_df(spark, rows), _df(spark, rows),
                   key_col="k", val_col="v").collect()
    assert r["ks"] == 0.0 and r["n_ref"] == r["n_cur"] == 200


def test_ks_disjoint_supports_is_one(spark):
    from parlerproject_spark.operators.stats import ks_drift
    ref = _df(spark, [("a", float(i)) for i in range(50)])
    cur = _df(spark, [("a", 1000.0 + i) for i in range(50)])
    [r] = ks_drift(ref, cur, key_col="k", val_col="v").collect()
    assert r["ks"] == 1.0


def test_ks_matches_scipy_formula_by_hand(spark):
    from parlerproject_spark.operators.stats import ks_drift
    # ref = {1,2,3,4}, cur = {3,4,5,6}: D = 0.5 at x=2
    ref = _df(spark, [("a", float(v)) for v in (1, 2, 3, 4)])
    cur = _df(spark, [("a", float(v)) for v in (3, 4, 5, 6)])
    [r] = ks_drift(ref, cur, key_col="k", val_col="v").collect()
    assert r["ks"] == 0.5


def test_ks_single_sided_key_dropped(spark):
    from parlerproject_spark.operators.stats import ks_drift
    ref = _df(spark, [("a", 1.0), ("only_ref", 2.0)])
    cur = _df(spark, [("a", 1.0)])
    out = {r["k"] for r in ks_drift(ref, cur,
                                    key_col="k", val_col="v").collect()}
    assert out == {"a"}


# Poisson bootstrap CI -------------------------------------------------------

def test_bootstrap_ci_brackets_true_mean(spark):
    from parlerproject_spark.operators.stats import bootstrap_ci
    import pyspark.sql.functions as SF
    df = spark.range(0, 2000).select(
        SF.lit("a").alias("k"), SF.col("id").alias("i"),
        ((SF.col("id") % 100) / 10.0).alias("v"))
    [r] = bootstrap_ci(df, key_col="k", val_col="v",
                       id_col="i").collect()
    assert r["ci_lo"] <= r["mean_obs"] <= r["ci_hi"]
    # width sanity: sd ~ 2.87, n=2000 -> 95% CI half-width ~ 0.126
    assert 0.05 < (r["ci_hi"] - r["ci_lo"]) < 0.5


def test_bootstrap_ci_deterministic_across_runs(spark):
    from parlerproject_spark.operators.stats import bootstrap_ci
    import pyspark.sql.functions as SF
    df = spark.range(0, 500).select(
        (SF.col("id") % 2).cast("string").alias("k"),
        SF.col("id").alias("i"), (SF.col("id") % 7).cast("double")
        .alias("v")).repartition(8)
    a = sorted(map(tuple, bootstrap_ci(
        df, key_col="k", val_col="v", id_col="i").collect()))
    b = sorted(map(tuple, bootstrap_ci(
        df.orderBy(SF.rand(5)), key_col="k", val_col="v",
        id_col="i").collect()))
    assert a == b


def test_bootstrap_ci_small_key_ranks_against_survivors(spark):
    """A 2-row key loses ~e⁻² ≈ 13.5% of its Poisson replicas to
    zero total weight, so the 97.5th rank of the NOMINAL 200 does
    not exist; ranking must use the surviving count or ci_hi
    silently collapses onto ci_lo (r5 advice). With two distinct
    values the replica means are spread, so a non-degenerate
    interval proves both ranks were found."""
    from parlerproject_spark.operators.stats import bootstrap_ci
    df = spark.createDataFrame(
        [("a", 1, 1.0), ("a", 2, 9.0)], "k string, i long, v double")
    [r] = bootstrap_ci(df, key_col="k", val_col="v", id_col="i").collect()
    assert r["ci_lo"] < r["ci_hi"]
    assert 1.0 <= r["ci_lo"] and r["ci_hi"] <= 9.0


def test_bootstrap_ci_tightens_with_n(spark):
    from parlerproject_spark.operators.stats import bootstrap_ci
    import pyspark.sql.functions as SF

    def width(n):
        df = spark.range(0, n).select(
            SF.lit("a").alias("k"), SF.col("id").alias("i"),
            ((SF.col("id") * 13 % 50) / 5.0).alias("v"))
        [r] = bootstrap_ci(df, key_col="k", val_col="v",
                           id_col="i").collect()
        return r["ci_hi"] - r["ci_lo"]

    assert width(4000) < width(250)
