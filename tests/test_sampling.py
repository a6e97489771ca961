

class TestUnimaxAllocation:
    def _counts(self, spark, rows):
        return spark.createDataFrame(rows, "source string, n_tokens bigint")

    def test_water_fill_mixes_capped_and_leveled(self, spark):
        from parlerproject_spark.operators.sampling import (
            unimax_allocation)
        cnt = self._counts(spark, [("tail", 100), ("mid", 500),
                                   ("head", 2000)])
        # budget 1500, caps = 1 epoch: tail capped at 100, then
        # level t solves 100 + 2t = 1500 -> t = 700 > 500? no:
        # 500-cap source also capped -> 100 + 500 + t = 1500 -> t=900
        out = {r["source"]: r for r in unimax_allocation(
            cnt, budget=1500.0, max_epochs=1.0).collect()}
        assert out["tail"]["capped"] and out["tail"]["alloc"] == 100.0
        assert out["mid"]["capped"] and out["mid"]["alloc"] == 500.0
        assert not out["head"]["capped"]
        assert out["head"]["alloc"] == 900.0
        assert out["head"]["epochs"] == 0.45
        total = sum(r["alloc"] for r in out.values())
        assert abs(total - 1500.0) < 1e-6

    def test_budget_exceeds_caps_all_capped(self, spark):
        from parlerproject_spark.operators.sampling import (
            unimax_allocation)
        cnt = self._counts(spark, [("a", 10), ("b", 20)])
        out = unimax_allocation(cnt, budget=1000.0,
                                max_epochs=2.0).collect()
        assert all(r["capped"] for r in out)
        assert {r["source"]: r["alloc"] for r in out} == {
            "a": 20.0, "b": 40.0}
        assert all(r["epochs"] == 2.0 for r in out)

    def test_zero_budget_and_validation(self, spark):
        from parlerproject_spark.operators.sampling import (
            unimax_allocation)
        import pytest as _pytest
        cnt = self._counts(spark, [("a", 10), ("b", 20)])
        out = unimax_allocation(cnt, budget=0.0).collect()
        assert all(r["alloc"] == 0.0 for r in out)
        with _pytest.raises(ValueError):
            unimax_allocation(cnt, budget=-1.0)

    def test_uniform_when_no_cap_binds(self, spark):
        from parlerproject_spark.operators.sampling import (
            unimax_allocation)
        cnt = self._counts(spark, [("a", 1000), ("b", 3000),
                                   ("c", 5000)])
        out = {r["source"]: r["alloc"] for r in unimax_allocation(
            cnt, budget=1500.0, max_epochs=1.0).collect()}
        assert out == {"a": 500.0, "b": 500.0, "c": 500.0}
