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


class TestInferExpectations:
    def _frames(self, spark):
        ref = spark.createDataFrame(
            [(1, 10.0, "a"), (2, 20.0, "b"), (3, 30.0, "a"),
             (4, 40.0, "b")],
            "id bigint, v double, tag string")
        # drifted: a NULL id, an out-of-range v, a novel tag, a dup id
        cur = spark.createDataFrame(
            [(1, 10.0, "a"), (1, 99.0, "b"), (None, 25.0, "zz")],
            "id bigint, v double, tag string")
        return ref, cur

    def test_generation_contract(self, spark):
        from parlerproject_spark.operators.validation import (
            infer_expectations)
        ref, _ = self._frames(spark)
        rules = {r.name: r for r in
                 infer_expectations(ref, ["id", "v", "tag"])}
        assert set(rules) == {
            "id_not_null", "id_in_range", "id_unique",
            "v_not_null", "v_in_range", "v_unique",
            "tag_not_null", "tag_in_set"}
        assert rules["id_in_range"].params == {"lo": 1, "hi": 4}
        assert rules["v_in_range"].params == {"lo": 10.0, "hi": 40.0}
        assert rules["tag_in_set"].params == {"values": ["a", "b"]}

    def test_drifted_snapshot_trips_gate(self, spark):
        from parlerproject_spark.operators.validation import auto_gate
        ref, cur = self._frames(spark)
        rep = {r["rule"]: r
               for r in auto_gate(ref, cur, ["id", "v", "tag"]).collect()}
        assert not rep["id_not_null"]["passed"]      # NULL id
        assert rep["v_in_range"]["n_failed"] == 1    # 99.0 > 40.0
        assert rep["tag_in_set"]["n_failed"] == 1    # 'zz' novel
        assert rep["id_unique"]["n_failed"] == 1     # dup id 1
        assert rep["tag_not_null"]["passed"]
        # reference gates itself clean
        self_rep = auto_gate(ref, ref, ["id", "v", "tag"]).collect()
        assert all(r["passed"] for r in self_rep)

    def test_no_set_rule_above_cardinality_cap(self, spark):
        from parlerproject_spark.operators.validation import (
            infer_expectations)
        ref = spark.createDataFrame(
            [(str(i),) for i in range(30)], "tag string")
        names = {r.name for r in
                 infer_expectations(ref, ["tag"], set_card_max=20)}
        assert "tag_in_set" not in names
        assert names == {"tag_not_null", "tag_unique"}

    def test_suite_scans_input_once(self, spark):
        """The whole suite — row rules AND N unique rules — must plan
        as ONE aggregate over ONE scan of the input (multi-distinct →
        a shared Expand), never one extra job per unique rule."""
        from parlerproject_spark.operators.validation import (
            Expectation, _suite_agg)
        df = spark.createDataFrame(
            [(1, "a"), (2, "b"), (2, "c")], "k bigint, tag string")
        row_rules = [Expectation("k_nn", "not_null", "k")]
        uni_rules = [Expectation("k_uq", "unique", "k"),
                     Expectation("tag_uq", "unique", "tag")]
        plan = (_suite_agg(df, row_rules, uni_rules)
                ._jdf.queryExecution().executedPlan().toString())
        scans = (plan.count("LocalTableScan") + plan.count("FileScan")
                 + plan.count("Scan ExistingRDD"))
        assert scans == 1, f"expected 1 input scan, plan:\n{plan}"
        assert "Expand" in plan  # the shared multi-distinct fan-out
