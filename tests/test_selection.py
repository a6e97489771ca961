"""Cross-group quantile matching — calibration contract tests."""
class TestQuantileMatchScores:
    def test_hand_case_maps_group_rank_to_global_quantile(self, spark):
        from parlerproject_spark.operators.selection import (
            quantile_match_scores)
        # group a scores low (1,2,3), group b scores high (10,20,30);
        # global sorted: 1,2,3,10,20,30 (N=6)
        rows = [(1, "a", 1.0), (2, "a", 2.0), (3, "a", 3.0),
                (4, "b", 10.0), (5, "b", 20.0), (6, "b", 30.0)]
        df = spark.createDataFrame(rows, "doc_id bigint, source string, score double")
        out = {r["doc_id"]: r for r in quantile_match_scores(df).collect()}
        # pct 0, .5, 1 per group; k = floor(pct*5)+1 -> 1, 3, 6
        # both groups calibrate to the SAME global scale
        assert out[1]["calibrated"] == out[4]["calibrated"] == 1.0
        assert out[2]["calibrated"] == out[5]["calibrated"] == 3.0
        assert out[3]["calibrated"] == out[6]["calibrated"] == 30.0
        assert out[2]["pct"] == 0.5

    def test_ordering_preserved_within_group(self, spark):
        from parlerproject_spark.operators.selection import (
            quantile_match_scores)
        import random
        rng = random.Random(7)
        rows = [(i, "g%d" % (i % 3), rng.uniform(-5, 5) * (1 + i % 3))
                for i in range(90)]
        df = spark.createDataFrame(rows, "doc_id bigint, source string, score double")
        out = quantile_match_scores(df, n_buckets=8).collect()
        by_g = {}
        for r in out:
            by_g.setdefault(r["source"], []).append(r)
        n = df.count()
        for g, rs in by_g.items():
            rs.sort(key=lambda r: (r["score"], r["doc_id"]))
            cal = [r["calibrated"] for r in rs]
            assert cal == sorted(cal), g  # monotone in group rank
        # a global threshold on calibrated cuts ~the same share per group
        thr = sorted(r["calibrated"] for r in out)[n // 2]
        shares = [sum(1 for r in rs if r["calibrated"] <= thr) / len(rs)
                  for rs in by_g.values()]
        assert max(shares) - min(shares) <= 0.25, shares

    def test_single_row_group_gets_global_min(self, spark):
        from parlerproject_spark.operators.selection import (
            quantile_match_scores)
        rows = [(1, "solo", 99.0), (2, "big", 5.0), (3, "big", 7.0)]
        df = spark.createDataFrame(rows, "doc_id bigint, source string, score double")
        out = {r["doc_id"]: r for r in quantile_match_scores(df).collect()}
        # pct of a 1-row group is 0 -> global rank 1 -> global min
        assert out[1]["pct"] == 0.0
        assert out[1]["calibrated"] == 5.0
