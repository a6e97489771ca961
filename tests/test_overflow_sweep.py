"""Round-11 int64-product overflow sweep (VERDICT r10 item 5).

The r10 ADVICE found WordPiece's count x count score overflowing
int64 at ~3e9 counts (~10 GB of corpus). This sweep audited every
expression that multiplies two corpus-scale count columns and moved
the product to DOUBLE, with the DuckDB oracle mirroring the cast:

  - roc_auc / grouped roc_auc ........ sum(pos) * sum(neg)
  - fleiss_kappa p_e ................. c*c and sum(c)*sum(c)
  - krippendorff_alpha B ............. nc*nc
  - mann_whitney_u tie term .......... t*t*t (overflows at t>=2.1M!)
  - association_audit chi2/MI ........ c*c and r*cc margins
  - association_rules lift ........... n_both*n_users, n_a*n_b

Bounded-factor products stay integer on both sides (fleiss item
n_ij <= n_raters, krippendorff per-item n*(n-1)).

Operators aggregate raw rows, so a pytest cannot plant 3e9 input
rows; instead each test (a) proves the OLD integer shape errors
under ANSI at planted >= 2^31.5 counts, and (b) proves the fixed
DOUBLE shape yields the mathematically right value on the same
plants. The operator wiring itself is pinned by the 316-query
oracle run (hashes unchanged by this sweep at sf0.01).
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

#: two factors just past sqrt(int64 max) ~= 3.04e9: the smallest
#: count scale where the old bigint products break
BIG_A = 4_000_000_000
BIG_B = 5_000_000_000


def _one(spark, **cols):
    row = tuple(cols.values())
    schema = ", ".join(f"{k} long" for k in cols)
    return spark.createDataFrame([row], schema)


def test_bigint_product_overflows_under_ansi(spark):
    """The bug class is real: the pre-sweep expression shape raises
    (ANSI) at counts two orders below a 100 TB corpus."""
    df = _one(spark, a=BIG_A, b=BIG_B)
    with pytest.raises(Exception, match="(?i)overflow|arithmetic"):
        df.select((F.col("a") * F.col("b")).alias("x")).collect()


def test_roc_auc_denominator_shape(spark):
    df = _one(spark, pos=BIG_A, neg=BIG_B)
    got = df.select(
        (F.sum("pos").cast("double")
         * F.sum("neg").cast("double")).alias("den")).collect()[0]
    assert got["den"] == float(BIG_A) * float(BIG_B)


def test_fleiss_pe_shape(spark):
    df = spark.createDataFrame(
        [(BIG_A,), (BIG_B,)], "c long")
    got = df.agg(
        (F.sum(F.col("c").cast("double") * F.col("c"))
         / (F.sum("c").cast("double")
            * F.sum("c").cast("double"))).alias("p_e")).collect()[0]
    want = (BIG_A**2 + BIG_B**2) / (BIG_A + BIG_B)**2
    assert math.isclose(got["p_e"], want, rel_tol=1e-12)


def test_krippendorff_b_shape(spark):
    df = spark.createDataFrame([(BIG_A,), (BIG_B,)], "nc long")
    got = df.agg(F.sum(F.col("nc").cast("double")
                       * F.col("nc")).alias("B")).collect()[0]
    assert got["B"] == float(BIG_A) * BIG_A + float(BIG_B) * BIG_B


def test_mann_whitney_tie_cube_shape(spark):
    # t^3 breaks bigint at t >= ~2.1M — far below the other sites
    t = 5_000_000
    df = _one(spark, t=t)
    td = F.col("t").cast("double")
    got = df.select((td * td * td - td).alias("t3")).collect()[0]
    assert got["t3"] == float(t)**3 - t
    with pytest.raises(Exception, match="(?i)overflow|arithmetic"):
        df.select((F.col("t") * F.col("t") * F.col("t"))
                  .alias("x")).collect()


def test_association_margins_shape(spark):
    df = _one(spark, c=BIG_A, r=BIG_A, cc=BIG_B)
    got = df.select(
        (F.col("c").cast("double") * F.col("c")
         / (F.col("r").cast("double") * F.col("cc"))).alias("q"),
        F.log(F.col("c")
              / (F.col("r").cast("double") * F.col("cc"))).alias("l")
    ).collect()[0]
    assert math.isclose(got["q"], BIG_A / float(BIG_B), rel_tol=1e-12)
    assert math.isclose(got["l"], math.log(1.0 / BIG_B), rel_tol=1e-12)


def test_lift_shape(spark):
    df = _one(spark, n_both=BIG_A, nu=BIG_B, na=BIG_A, nb=BIG_B)
    got = df.select(
        (F.col("n_both").cast("double") * F.col("nu")
         / (F.col("na").cast("double") * F.col("nb"))).alias("lift")
    ).collect()[0]
    assert math.isclose(got["lift"], 1.0, rel_tol=1e-12)


def test_operators_still_correct_on_small_inputs(spark):
    """End-to-end spot check that the cast rewrites changed no
    small-count answers (the full pin is the 316-query oracle)."""
    from parlerproject_spark.operators.analytics import association_rules
    from parlerproject_spark.operators.evaluation import (fleiss_kappa,
                                                          mann_whitney_u)

    ratings = spark.createDataFrame(
        [(i, lab) for i in range(6)
         for lab in (["yes"] * 2 + ["no"]) ],
        "item_id long, label string")
    fk = fleiss_kappa(ratings, n_raters=3).collect()[0]
    # every item rated (yes,yes,no): P_i = (4+1-3)/6 = 1/3,
    # p_yes=2/3, p_no=1/3 -> P_e = 5/9; kappa = (1/3-5/9)/(1-5/9)=-0.5
    assert math.isclose(fk["kappa"], -0.5, abs_tol=1e-6)

    mw = mann_whitney_u(spark.createDataFrame(
        [(1.0, 1), (2.0, 1), (3.0, 0), (4.0, 0)],
        "value double, grp int"), value_col="value",
        group_col="grp").collect()[0]
    assert mw["u"] == 0.0  # all group-1 values rank below group-0

    ev = spark.createDataFrame(
        [("u1", "a"), ("u1", "b"), ("u2", "a"), ("u2", "b"),
         ("u3", "a")],
        "user_id string, event_type string")
    ar = {(r["antecedent"], r["consequent"]): r
          for r in association_rules(ev, min_support=0.1).collect()}
    ab = ar[("a", "b")]
    # P(ab)=2/3, P(a)=1, P(b)=2/3 -> lift = (2*3)/(3*2) = 1
    assert math.isclose(ab["lift"], 1.0, abs_tol=1e-6)
    assert math.isclose(ab["confidence"], 2 / 3, abs_tol=1e-6)
