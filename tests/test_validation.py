"""expect_suite — the declarative ingest-gate expectation runner."""
from __future__ import annotations

import pytest

from parlerproject_spark.operators.validation import (
    Expectation, expect_suite)


def _report(df, rules):
    return {r["rule"]: r for r in expect_suite(df, rules).collect()}


class TestExpectSuite:
    def test_row_rules_one_pass(self, spark):
        df = spark.createDataFrame(
            [(1, 10.0, "a"), (2, 500.0, "b"), (None, -1.0, "zz"),
             (4, None, "a")],
            "id bigint, v double, tag string")
        rep = _report(df, [
            Expectation("id_nn", "not_null", "id"),
            Expectation("v_rng", "in_range", "v",
                        params={"lo": 0.0, "hi": 100.0}),
            Expectation("tag_set", "in_set", "tag",
                        params={"values": ["a", "b"]}),
            Expectation("tag_shape", "matches", "tag",
                        params={"pattern": "^[a-z]$"}),
            Expectation("v_pos", "custom",
                        params={"predicate": None}),
        ][:4])
        assert rep["id_nn"]["n_failed"] == 1
        # 500.0 out of range, -1.0 out, NULL fails -> 3
        assert rep["v_rng"]["n_failed"] == 3
        assert rep["tag_set"]["n_failed"] == 1
        assert rep["tag_shape"]["n_failed"] == 1
        assert rep["id_nn"]["n_checked"] == 4
        assert rep["v_rng"]["pass_rate"] == 0.25
        assert not rep["v_rng"]["passed"]

    def test_unique_ignores_nulls(self, spark):
        from pyspark.sql import functions as F
        df = spark.createDataFrame(
            [(1,), (1,), (2,), (None,), (None,)], "k bigint")
        rep = _report(df, [Expectation("k_uniq", "unique", "k"),
                           Expectation("k_pos", "custom",
                                       params={"predicate":
                                               F.col("k") > 0})])
        # 3 non-null checked, one duplicate pair -> 1 failed
        assert rep["k_uniq"]["n_checked"] == 3
        assert rep["k_uniq"]["n_failed"] == 1
        # custom: NULL predicate rows fail
        assert rep["k_pos"]["n_failed"] == 2

    def test_empty_frame_vacuous_pass(self, spark):
        df = spark.createDataFrame([], "k bigint")
        rep = _report(df, [Expectation("nn", "not_null", "k"),
                           Expectation("uq", "unique", "k")])
        for r in rep.values():
            assert r["n_checked"] == 0 and r["passed"]
            assert r["pass_rate"] == 1.0

    def test_validation_errors(self, spark):
        df = spark.createDataFrame([(1,)], "k bigint")
        with pytest.raises(ValueError):
            expect_suite(df, [])
        with pytest.raises(ValueError):
            expect_suite(df, [Expectation("a", "not_null", "k"),
                              Expectation("a", "unique", "k")])
        with pytest.raises(ValueError):
            Expectation("bad", "no_such_kind", "k")
        with pytest.raises(ValueError):
            Expectation("noc", "not_null")
        with pytest.raises(ValueError):
            expect_suite(df, [Expectation("s", "in_set", "k",
                                          params={"values": []})])

    def test_all_pass_report_shape(self, spark):
        df = spark.createDataFrame([(1, "x"), (2, "y")],
                                   "k bigint, s string")
        out = expect_suite(df, [
            Expectation("k_uniq", "unique", "k"),
            Expectation("s_nn", "not_null", "s")]).collect()
        assert len(out) == 2
        assert all(r["passed"] and r["pass_rate"] == 1.0 for r in out)
