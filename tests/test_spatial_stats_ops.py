"""Round-5 session-3 operators: grid spatial join, CUSUM, int8
quantization, mixture weights, A/B z-test, BFS distances."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from parlerproject_spark.operators.analytics import ab_test_proportions
from parlerproject_spark.operators.graph import bfs_distances
from parlerproject_spark.operators.sampling import mixture_weights
from parlerproject_spark.operators.similarity import int8_quantize
from parlerproject_spark.operators.spatial import (grid_distance_pairs,
                                                   haversine_km)
from parlerproject_spark.operators.timeseries import cusum_changepoints


def _haversine_py(lat1, lon1, lat2, lon2):
    rl1, rl2 = math.radians(lat1), math.radians(lat2)
    dlat = math.radians(lat2 - lat1) / 2
    dlon = math.radians(lon2 - lon1) / 2
    a = (math.sin(dlat) ** 2
         + math.cos(rl1) * math.cos(rl2) * math.sin(dlon) ** 2)
    return 2 * 6371.0 * math.asin(math.sqrt(a))


class TestGridDistancePairs:
    def test_matches_bruteforce_including_cell_boundaries(self, spark):
        # points straddling cell boundaries: cell_deg=1.0, pairs sit
        # in adjacent cells on purpose
        pts = [(1, 10.05, 20.05), (2, 9.95, 19.95),   # diagonal neighbors
               (3, 10.02, 20.98), (4, 10.03, 21.02),  # lon boundary
               (5, -5.0, 0.0), (6, -5.3, 0.1),        # same-ish cell
               (7, 50.0, 100.0)]                       # isolated
        df = spark.createDataFrame(pts, ["id", "lat", "lon"])
        got = {(r.id_a, r.id_b): r.dist_km
               for r in grid_distance_pairs(
                   df, radius_km=50.0, cell_deg=1.0).collect()}
        want = {}
        for i in range(len(pts)):
            for j in range(i + 1, len(pts)):
                a, b = pts[i], pts[j]
                d = round(_haversine_py(a[1], a[2], b[1], b[2]), 4)
                if d <= 50.0:
                    want[(min(a[0], b[0]), max(a[0], b[0]))] = d
        assert set(got) == set(want)
        for k in want:
            assert got[k] == pytest.approx(want[k], abs=1e-3)

    def test_no_duplicate_pairs(self, spark):
        df = spark.createDataFrame(
            [(1, 0.0, 0.0), (2, 0.001, 0.001)], ["id", "lat", "lon"])
        out = grid_distance_pairs(df, radius_km=10.0, cell_deg=1.0).collect()
        assert len(out) == 1
        assert (out[0].id_a, out[0].id_b) == (1, 2)

    def test_haversine_known_distance(self, spark):
        # Paris (48.8566, 2.3522) -> London (51.5074, -0.1278) ~ 343.5 km
        df = spark.range(1).select(
            haversine_km(F.lit(48.8566), F.lit(2.3522),
                         F.lit(51.5074), F.lit(-0.1278)).alias("d"))
        assert df.first().d == pytest.approx(343.5, abs=1.0)


class TestCusum:
    def test_detects_level_shift(self, spark):
        # 20 samples at 0, then 10 samples at +5: drift after i=20
        vals = [0.0, 0.1, -0.1, 0.05, -0.05] * 4 + [5.0, 5.1, 4.9, 5.0,
                                                    5.05, 4.95, 5.0, 5.1,
                                                    4.9, 5.0]
        rows = [Row(user_id=1, ts=float(i), event_id=i, value=v)
                for i, v in enumerate(vals)]
        out = cusum_changepoints(
            spark.createDataFrame(rows), k=0.5, h=2.0).collect()
        assert len(out) == 1
        r = out[0]
        assert r.n_events == 30
        # peak must come while the shifted segment accumulates
        assert r.peak_idx > 20
        assert r.max_cusum > 2.0
        assert r.n_alarms > 0

    def test_hand_computed_fold(self, spark):
        vals = [1.0, 2.0, 3.0, 4.0, 5.0]
        mu = 3.0
        sd = math.sqrt(sum((v - mu) ** 2 for v in vals) / 5)
        s, smax, pi, alarms = 0.0, 0.0, 0, 0
        for i, v in enumerate(vals, 1):
            s = max(0.0, s + (v - mu) / sd - 0.5)
            if s > smax:
                smax, pi = s, i
            if s > 5.0:
                alarms += 1
        rows = [Row(user_id=7, ts=float(i), event_id=i, value=v)
                for i, v in enumerate(vals)]
        r = cusum_changepoints(spark.createDataFrame(rows)).first()
        assert r.max_cusum == pytest.approx(round(smax, 6), abs=1e-6)
        assert r.peak_idx == pi
        assert r.n_alarms == alarms

    def test_drops_low_count_and_zero_variance(self, spark):
        rows = ([Row(user_id=1, ts=float(i), event_id=i, value=1.0)
                 for i in range(10)]        # zero variance
                + [Row(user_id=2, ts=float(i), event_id=i, value=float(i))
                   for i in range(3)])      # < min_events
        out = cusum_changepoints(spark.createDataFrame(rows)).collect()
        assert out == []


class TestInt8Quantize:
    def test_codes_and_mse_match_numpy(self, spark):
        import numpy as np
        vecs = [(1, [1.0, -2.0, 0.5]), (2, [0.5, 4.0, -0.25]),
                (3, [-1.0, 0.0, 1.0])]
        df = spark.createDataFrame(vecs, ["vec_id", "embedding"])
        m = np.array([v for _, v in vecs])
        scale = np.abs(m).max(axis=0) / 127.0
        codes = np.clip(np.round(m / scale), -127, 127)
        got = {r.vec_id: r for r in int8_quantize(df).collect()}
        for i, (vid, _) in enumerate(vecs):
            assert got[vid].code_sum == int(codes[i].sum())
            assert got[vid].code_abs_sum == int(np.abs(codes[i]).sum())
            mse = float(((m[i] - codes[i] * scale) ** 2).mean())
            assert got[vid].recon_mse == pytest.approx(mse, abs=1e-6)

    def test_extremes_hit_pm127_and_zero_dim(self, spark):
        df = spark.createDataFrame(
            [(1, [1.0, 0.0]), (2, [-1.0, 0.0])], ["vec_id", "embedding"])
        got = {r.vec_id: r for r in int8_quantize(df).collect()}
        # dim 0 absmax carriers quantize to +/-127; dim 1 all-zero -> 0
        assert got[1].code_sum == 127
        assert got[2].code_sum == -127


class TestMixtureWeights:
    def test_alpha_flattens_toward_uniform(self, spark):
        docs = spark.createDataFrame(
            [(i, "w " * (900 if i < 9 else 100), "big" if i < 9 else "small")
             for i in range(10)], ["doc_id", "text", "source"])
        out = {r.source: r for r in
               mixture_weights(docs, alpha=0.7).collect()}
        # alpha < 1 upsamples the small domain above its raw share
        assert out["small"].weight > out["small"].p_raw
        assert out["big"].weight < out["big"].p_raw
        assert (out["big"].weight + out["small"].weight
                == pytest.approx(1.0, abs=1e-5))

    def test_alpha_one_is_identity(self, spark):
        docs = spark.createDataFrame(
            [(1, "a b c", "x"), (2, "a", "y")],
            ["doc_id", "text", "source"])
        for r in mixture_weights(docs, alpha=1.0).collect():
            assert r.weight == pytest.approx(r.p_raw, abs=2e-6)


class TestAbTest:
    def test_hand_computed_z(self, spark):
        # arm0: users 0,2,4,6 (2 converted); arm1: users 1,3,5 (3 converted)
        rows = []
        for u in range(7):
            rows.append(Row(user_id=u, event_type="view"))
            if u in (0, 2, 1, 3, 5):
                rows.append(Row(user_id=u, event_type="purchase"))
                rows.append(Row(user_id=u, event_type="purchase"))  # dup
        r = ab_test_proportions(spark.createDataFrame(rows)).first()
        assert (r.n_0, r.n_1, r.conv_0, r.conv_1) == (4, 3, 2, 3)
        p0, p1, pp = 2 / 4, 3 / 3, 5 / 7
        se = math.sqrt(pp * (1 - pp) * (1 / 4 + 1 / 3))
        assert r.z_score == pytest.approx(round((p1 - p0) / se, 6), abs=1e-6)
        assert r.significant_95 == (abs((p1 - p0) / se) > 1.96)

    def test_degenerate_all_converted(self, spark):
        rows = [Row(user_id=u, event_type="purchase") for u in range(4)]
        r = ab_test_proportions(spark.createDataFrame(rows)).first()
        assert r.z_score is None
        assert r.significant_95 is False


class TestBfs:
    def test_hand_distances_and_hop_bound(self, spark):
        # chain 1->2->3->4->5, plus 10->11 disconnected
        edges = spark.createDataFrame(
            [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11)], ["src", "dst"])
        seeds = spark.createDataFrame([(1,)], ["node"])
        got = {r.node: r.dist
               for r in bfs_distances(edges, seeds, max_hops=3).collect()}
        assert got == {1: 0, 2: 1, 3: 2, 4: 3}  # 5 beyond budget, 10/11 unreachable

    def test_shortest_wins_on_diamond(self, spark):
        # 1->2->4 and 1->4: dist(4) must be 1
        edges = spark.createDataFrame(
            [(1, 2), (2, 4), (1, 4)], ["src", "dst"])
        seeds = spark.createDataFrame([(1,)], ["node"])
        got = {r.node: r.dist
               for r in bfs_distances(edges, seeds, max_hops=3).collect()}
        assert got[4] == 1

    def test_undirected_mode(self, spark):
        edges = spark.createDataFrame([(2, 1), (2, 3)], ["src", "dst"])
        seeds = spark.createDataFrame([(1,)], ["node"])
        got = {r.node: r.dist
               for r in bfs_distances(edges, seeds, max_hops=2,
                                      directed=False).collect()}
        assert got == {1: 0, 2: 1, 3: 2}


class TestMmr:
    def test_diversity_beats_pure_relevance(self, spark):
        from parlerproject_spark.operators.similarity import mmr_rerank
        # query q = [1, 0]; a/a2 nearly identical and most relevant;
        # b orthogonal-ish but diverse. Pure relevance picks (a, a2);
        # MMR must pick b second.
        vecs = [(1, [1.0, 0.01, 0.0]), (2, [1.0, 0.012, 0.0]),
                (3, [0.7, 0.0, 0.714])]
        df = spark.createDataFrame(vecs, ["vec_id", "embedding"])
        q = spark.createDataFrame([([1.0, 0.0, 0.0],)], ["q"])
        out = mmr_rerank(df, q, k_candidates=3, k_select=2, lam=0.3)
        got = [r.vec_id for r in out.orderBy("rank").collect()]
        assert got[0] == 1          # most relevant first
        assert got[1] == 3          # diverse pick, not the near-dup 2

    def test_ranks_and_scores_monotone_contract(self, spark):
        from parlerproject_spark.operators.similarity import mmr_rerank
        import random
        rnd = random.Random(7)
        vecs = [(i, [rnd.uniform(-1, 1) for _ in range(8)])
                for i in range(1, 30)]
        df = spark.createDataFrame(vecs, ["vec_id", "embedding"])
        q = spark.createDataFrame([([1.0] * 8,)], ["q"])
        rows = mmr_rerank(df, q, k_candidates=10, k_select=5).collect()
        assert [r.rank for r in sorted(rows, key=lambda r: r.rank)] == \
            [1, 2, 3, 4, 5]
        assert len({r.vec_id for r in rows}) == 5  # no repeats


class TestSourceOverlap:
    def test_hand_computed_jaccard(self, spark):
        # srcA docs share one 3-gram with srcB; sets sized by hand
        docs = spark.createDataFrame(
            [(1, "alpha beta gamma delta", "A"),     # grams: abg, bgd
             (2, "alpha beta gamma", "B"),           # gram: abg
             (3, "zeta eta theta", "C")],            # gram: zet
            ["doc_id", "text", "source"])
        from parlerproject_spark.operators.dedup import source_overlap_jaccard
        rows = {(r.src_a, r.src_b): r
                for r in source_overlap_jaccard(docs).collect()}
        assert set(rows) == {("A", "B")}  # C shares nothing -> absent
        r = rows[("A", "B")]
        assert (r.n_a, r.n_b, r.n_common) == (2, 1, 1)
        assert r.jaccard == 0.5

    def test_identical_sources_full_overlap(self, spark):
        docs = spark.createDataFrame(
            [(1, "one two three four", "X"), (2, "one two three four", "Y")],
            ["doc_id", "text", "source"])
        from parlerproject_spark.operators.dedup import source_overlap_jaccard
        r = source_overlap_jaccard(docs).first()
        assert r.jaccard == 1.0


def test_negative_sampling_proportional_and_deterministic(spark):
    from pyspark.sql import functions as SF

    from parlerproject_spark.operators.sampling import (
        negative_sampling_draws)
    # vocabulary: 'common' 640x, 'mid' 40x, 'rare' 10x, 'cut' 2x
    text = " ".join(["common"] * 640 + ["mid"] * 40 + ["rare"] * 10
                    + ["cut"] * 2)
    docs = spark.createDataFrame([(1, text)], "doc_id bigint, text string")
    out = negative_sampling_draws(docs, 2000, min_count=5).collect()
    assert len(out) == 2000                       # every draw matched once
    freq = {}
    for r in out:
        freq[r["token"]] = freq.get(r["token"], 0) + 1
    assert "cut" not in freq                      # min_count excluded
    # weights c^0.75: 640->127.0, 40->15.9, 10->5.6 ; shares ~.855/.107/.038
    assert freq["common"] > freq["mid"] > freq.get("rare", 0) > 0
    assert 0.75 < freq["common"] / 2000 < 0.95
    # determinism under input reorder
    again = negative_sampling_draws(
        docs.repartition(4), 2000, min_count=5).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, out))


def test_trimmed_mean_drops_exact_outlier_count(spark):
    from parlerproject_spark.operators.stats import trimmed_mean
    rows = ([("a", 1000.0)] + [("a", float(v)) for v in range(1, 20)]
            + [("a", -1000.0)])   # 21 values, floor(21*.05)=1 each side
    df = spark.createDataFrame(rows, "k string, v double")
    [r] = trimmed_mean(df, key_col="k", val_col="v", trim=0.05).collect()
    assert r["n_trimmed_each"] == 1
    assert r["n_used"] == 19
    assert r["tmean"] == 10.0
