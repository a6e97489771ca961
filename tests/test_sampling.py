

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


# --------------------------------------------------------------------------
# Boundary-respecting harmonic packing (round 11)
# --------------------------------------------------------------------------

class TestHarmonicPacking:
    def _docs(self, spark, lengths):
        return spark.createDataFrame(
            [(i, n) for i, n in enumerate(lengths)],
            "doc_id long, n long")

    def _pack(self, spark, lengths, L=64, shards=1, small_k=8):
        from parlerproject_spark.operators.sampling import (
            pack_sequences_harmonic)
        return pack_sequences_harmonic(
            self._docs(spark, lengths), id_col="doc_id",
            tokens_col="n", seq_len=L, shards=shards,
            small_k=small_k).collect()

    def test_no_bin_exceeds_capacity(self, spark):
        import collections
        import random
        rng = random.Random(11)
        lengths = [rng.randint(1, 64) for _ in range(300)]
        rows = self._pack(spark, lengths, L=64, shards=4)
        fill = collections.Counter()
        for r in rows:
            assert not r["truncated"]
            fill[(r["shard"], r["size_class"], r["bin_no"])] += \
                r["n_tokens"]
        assert fill and max(fill.values()) <= 64
        # offsets are the exact packed positions: max offset + its
        # doc's tokens never crosses the boundary either
        end = {}
        for r in rows:
            key = (r["shard"], r["size_class"], r["bin_no"])
            end[key] = max(end.get(key, 0),
                           r["tok_offset"] + r["n_tokens"])
        assert max(end.values()) <= 64

    def test_boundary_respecting_vs_concat_chunk(self, spark):
        """concat-and-chunk splits docs across sequences; harmonic
        packing never does — the waste is the price, and it must be
        bounded (<= ~30% here, far from the 1.691 worst case)."""
        import random
        rng = random.Random(7)
        lengths = [rng.randint(1, 64) for _ in range(400)]
        rows = self._pack(spark, lengths, L=64, shards=2)
        total = sum(lengths)
        bins = {(r["shard"], r["size_class"], r["bin_no"])
                for r in rows}
        waste = len(bins) * 64 - total
        assert 0 <= waste / (len(bins) * 64) <= 0.30
        # concat-and-chunk baseline: zero padding but ~half the
        # chunk-crossing docs split — quantify the straddle count
        from parlerproject_spark.operators.sampling import pack_sequences
        cc = pack_sequences(self._docs(spark, lengths),
                            id_col="doc_id", tokens_col="n",
                            seq_len=64, shards=2).collect()
        nmap = dict(enumerate(lengths))
        straddles = sum(1 for r in cc
                        if r["tok_offset"] + nmap[r["doc_id"]] > 64)
        assert straddles > 0  # the defect harmonic packing removes

    def test_within_class_layout_is_optimal_and_near_ffd(self, spark):
        """Class-k bins hold exactly k docs (optimal within class);
        total bin count stays within 2x of exact Python FFD."""
        import collections
        import random
        rng = random.Random(3)
        lengths = [rng.randint(8, 64) for _ in range(200)]
        rows = self._pack(spark, lengths, L=64, shards=1)
        per_bin = collections.Counter()
        klass = {}
        for r in rows:
            per_bin[(r["size_class"], r["bin_no"])] += 1
            klass[(r["size_class"], r["bin_no"])] = r["size_class"]
        for key, cnt in per_bin.items():
            k = klass[key]
            if 2 <= k < 8:
                assert cnt <= k
        # exact FFD in python
        bins: list[int] = []
        for n in sorted(lengths, reverse=True):
            for i, free in enumerate(bins):
                if free >= n:
                    bins[i] -= n
                    break
            else:
                bins.append(64 - n)
        assert len(per_bin) <= 2 * len(bins)

    def test_oversized_docs_truncate_into_singletons(self, spark):
        rows = self._pack(spark, [100, 100, 10], L=64)
        big = [r for r in rows if r["n_tokens"] == 100]
        assert all(r["truncated"] and r["size_class"] == 0
                   and r["tok_offset"] == 0 for r in big)
        assert len({r["bin_no"] for r in big}) == 2  # one bin each

    def test_waste_report_arithmetic(self, spark):
        from parlerproject_spark.operators.sampling import (
            pack_sequences_harmonic, packing_waste_report)
        asg = pack_sequences_harmonic(
            self._docs(spark, [40, 40, 8, 8, 8]), id_col="doc_id",
            tokens_col="n", seq_len=64, shards=1, small_k=8)
        rep = packing_waste_report(asg, seq_len=64).collect()
        total_cap = sum(r["capacity"] for r in rep)
        total_tok = sum(r["n_tokens"] for r in rep)
        assert total_tok == 104
        assert all(r["padded_tokens"] ==
                   r["capacity"] - r["n_tokens"] for r in rep)
        assert total_cap >= total_tok
