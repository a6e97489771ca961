"""Fuzzy entity matching (operators/fuzzy.py)."""

from __future__ import annotations

from parlerproject_spark.operators.fuzzy import (fuzzy_best_match,
                                                 fuzzy_pairs)


def _df(spark):
    rows = [
        (1, "red widget"),
        (2, "redd widget"),     # 1 edit from 1 (typo in the ADJECTIVE,
                                # so the noun block still matches)
        (3, "blue widget"),     # 3 edits from 1, same block
        (4, "red bolt"),        # different block entirely
        (5, "crimson widget"),  # same block, far from everything
    ]
    return spark.createDataFrame(rows, ["k", "name"])


def test_fuzzy_pairs_blocked_and_thresholded(spark):
    got = {(r["id_a"], r["id_b"]): r["dist"]
           for r in fuzzy_pairs(_df(spark), id_col="k", text_col="name",
                                max_dist=4).collect()}
    assert got[(1, 2)] == 1
    assert got[(1, 3)] == 4        # red -> blue is 4 edits
    assert got[(2, 3)] == 4
    assert (1, 5) not in got       # dist 6 exceeds the threshold
    # cross-block pair (red bolt) never generated, whatever the dist
    assert not any(4 in p for p in got)


def test_fuzzy_best_match_picks_min_dist_then_min_id(spark):
    got = {r["k"]: (r["match_id"], r["dist"])
           for r in fuzzy_best_match(_df(spark), id_col="k",
                                     text_col="name",
                                     max_dist=4).collect()}
    assert got[1] == (2, 1)
    assert got[2] == (1, 1)
    assert got[3] == (1, 4)        # dist-4 tie between 1 and 2 → min id
    assert 4 not in got            # no same-block candidate at all
    assert 5 not in got            # nearest block-mate is 6 edits away


def test_fuzzy_best_match_deterministic_tie(spark):
    rows = [(1, "aaa"), (2, "aab"), (3, "aac")]
    df = spark.createDataFrame(rows, ["k", "name"])
    from pyspark.sql import functions as F
    got = {r["k"]: r["match_id"]
           for r in fuzzy_best_match(df, id_col="k", text_col="name",
                                     max_dist=2,
                                     block=F.lit("b")).collect()}
    # 2 and 3 are both 1 edit from each other and from 1; ties break
    # to the lowest candidate id
    assert got[2] == 1 and got[3] == 1 and got[1] == 2
