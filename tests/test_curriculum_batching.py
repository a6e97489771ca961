"""Round-7 session-2 operators: curriculum ordering, length-bucket
batching, per-group quantile trim, robust outliers, Benford audit."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from parlerproject_spark.operators.analytics import robust_outliers
from parlerproject_spark.operators.profiling import benford_audit
from parlerproject_spark.operators.sampling import (curriculum_order,
                                                    length_bucket_batches)
from parlerproject_spark.operators.selection import quantile_band_filter


def _docs(spark, n=200):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 7 * 100 + 50).alias("n_chars"))


# ---------------------------------------------------------------- curriculum

def test_curriculum_order_is_a_permutation_visiting_bands_in_order(spark):
    d = _docs(spark).withColumn(
        "band", F.least(F.floor(F.col("n_chars") / 256), F.lit(3)))
    out = curriculum_order(d, id_col="doc_id", band_col="band",
                           shards=4).collect()
    idxs = sorted(r["order_idx"] for r in out)
    assert idxs == list(range(len(out)))          # 0-based, gap-free
    # positions are band-monotone: every band-b row precedes band-b+1
    by_idx = sorted(out, key=lambda r: r["order_idx"])
    bands = [r["band"] for r in by_idx]
    assert bands == sorted(bands)


def test_curriculum_order_matches_single_window_reference(spark):
    d = _docs(spark, 120).withColumn(
        "band", F.least(F.floor(F.col("n_chars") / 256), F.lit(3)))
    got = {r["doc_id"]: r["order_idx"]
           for r in curriculum_order(d, id_col="doc_id",
                                     band_col="band", shards=4).collect()}
    # reference: one global ordering by (band, shard, md5 key, id)
    from parlerproject_spark.functions.text import stable_hash31
    ref_rows = (d.select(
        "doc_id", "band",
        (stable_hash31(F.col("doc_id").cast("string")) % 4).alias("shard"),
        F.md5(F.concat_ws(":", F.lit("curr-v1"),
                          F.col("doc_id").cast("string"))).alias("k"))
        .orderBy("band", "shard", "k", "doc_id").collect())
    for pos, r in enumerate(ref_rows):
        assert got[r["doc_id"]] == pos


def test_curriculum_order_is_seed_sensitive_within_band(spark):
    d = _docs(spark).withColumn("band", F.lit(0))
    a = {r["doc_id"]: r["order_idx"]
         for r in curriculum_order(d, id_col="doc_id", band_col="band",
                                   seed="a").collect()}
    b = {r["doc_id"]: r["order_idx"]
         for r in curriculum_order(d, id_col="doc_id", band_col="band",
                                   seed="b").collect()}
    assert a != b
    assert sorted(a.values()) == sorted(b.values())


# ------------------------------------------------------------------ batching

def test_length_bucket_batches_full_batches_and_efficiency_bounds(spark):
    d = _docs(spark, 300)
    out = length_bucket_batches(d, id_col="doc_id", tokens_col="n_chars",
                                batch_size=16, bucket_width=128,
                                n_buckets=8, shards=2).collect()
    assert sum(r["n_docs"] for r in out) == 300
    for r in out:
        assert 1 <= r["n_docs"] <= 16
        assert 0.0 < r["pad_efficiency"] <= 1.0
        assert r["sum_tokens"] <= r["n_docs"] * r["max_tokens"]
    # only the LAST batch of a (bucket, shard) stream may be partial
    from collections import defaultdict
    streams = defaultdict(list)
    for r in out:
        streams[(r["bucket"], r["shard"])].append(r)
    for rows in streams.values():
        rows.sort(key=lambda r: r["batch_id"])
        assert [r["batch_id"] for r in rows] == list(range(len(rows)))
        for r in rows[:-1]:
            assert r["n_docs"] == 16


def test_length_bucket_batches_single_length_bucket_is_fully_packed(spark):
    d = spark.range(64).select(F.col("id").alias("doc_id"),
                               F.lit(100).alias("n_chars"))
    out = length_bucket_batches(d, id_col="doc_id", tokens_col="n_chars",
                                batch_size=8, bucket_width=128,
                                n_buckets=8, shards=1).collect()
    assert all(r["pad_efficiency"] == 1.0 for r in out)
    assert sum(r["n_docs"] for r in out) == 64


# --------------------------------------------------------------- quantile band

def test_quantile_band_filter_matches_single_window_rank(spark):
    d = spark.createDataFrame(
        [(f"s{i % 3}", i, float(i * 37 % 101)) for i in range(150)],
        ["source", "doc_id", "score"])
    out = quantile_band_filter(d, group_col="source", score_col="score",
                               id_col="doc_id", lo=0.2, hi=0.8).collect()
    import itertools
    rows = sorted(d.collect(), key=lambda r: (r["source"], r["score"],
                                              r["doc_id"]))
    expect = {}
    for src, grp in itertools.groupby(rows, key=lambda r: r["source"]):
        grp = list(grp)
        n = len(grp)
        for rank, r in enumerate(grp, start=1):
            if 0.2 * n < rank <= 0.8 * n:
                expect[r["doc_id"]] = rank
    got = {r["doc_id"]: r["rank"] for r in out}
    assert got == expect
    assert all(r["n"] == 50 for r in out)


def test_quantile_band_filter_constant_scores_keep_id_order(spark):
    d = spark.createDataFrame([("s", i, 5.0) for i in range(10)],
                              ["source", "doc_id", "score"])
    out = quantile_band_filter(d, group_col="source", score_col="score",
                               id_col="doc_id", lo=0.1, hi=0.9)
    # span == 0 → single bucket; ranks follow doc_id; keep ranks 2..9
    got = sorted((r["doc_id"], r["rank"]) for r in out.collect())
    assert got == [(i, i + 1) for i in range(1, 9)]


# --------------------------------------------------------------- MAD outliers

def test_robust_outliers_flags_only_the_spike(spark):
    vals = [10.0, 11.0, 9.0, 10.5, 9.5, 10.2, 9.8, 1000.0]
    d = spark.createDataFrame([(1, v) for v in vals], ["user_id", "value"])
    [r] = robust_outliers(d, key_col="user_id", value_col="value").collect()
    assert r["n"] == 8
    assert r["n_outliers"] == 1
    assert abs(r["med"] - 10.1) < 1e-9


def test_robust_outliers_zero_mad_flags_every_deviant(spark):
    d = spark.createDataFrame(
        [(1, 5.0)] * 6 + [(1, 7.0), (1, 3.0)], ["user_id", "value"])
    [r] = robust_outliers(d, key_col="user_id", value_col="value").collect()
    assert r["mad"] == 0.0
    assert r["n_outliers"] == 2


# -------------------------------------------------------------------- Benford

def test_benford_audit_uniform_digits_and_chi2(spark):
    # 9 values, one per leading digit, spread over magnitudes
    vals = [1.2, 23.0, 0.0031, 450.0, 5.5, 0.6, 71.0, 800.0, 9999.0]
    d = spark.createDataFrame([(v,) for v in vals], ["value"])
    out = {r["digit"]: r for r in benford_audit(d).collect()}
    assert sorted(out) == list(range(1, 10))
    assert all(r["n"] == 1 for r in out.values())
    chi2 = next(iter(out.values()))["chi2"]
    # uniform shares vs Benford expectation, n=9
    exp = 9 * sum((1 / 9 - math.log10(1 + 1 / d)) ** 2
                  / math.log10(1 + 1 / d) for d in range(1, 10))
    assert abs(chi2 - exp) < 1e-4


def test_benford_audit_excludes_zero_null_nan(spark):
    d = spark.createDataFrame(
        [(0.0,), (None,), (float("nan"),), (123.0,), (-20.0,)], ["value"])
    out = {r["digit"]: r["n"] for r in benford_audit(d).collect()}
    assert out == {1: 1, 2: 1}


# ------------------------------------------------- source minhash similarity

def test_group_minhash_similarity_identical_groups_match_fully(spark):
    from parlerproject_spark.operators.dedup import group_minhash_similarity
    rows = []
    for i in range(10):
        text = f"alpha beta gamma delta epsilon zeta eta theta doc{i} words"
        rows.append((i, "a", text))
        rows.append((i + 100, "b", text))          # b is a copy of a
        rows.append((i + 200, "c", f"totally different corpus {i} "
                                   f"unrelated tokens here now then"))
    d = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    out = {(r["src_a"], r["src_b"]): r
           for r in group_minhash_similarity(d, group_col="source").collect()}
    assert out[("a", "b")]["n_match"] == 12          # identical shingle sets
    assert out[("a", "b")]["est_jaccard"] == 1.0
    assert out[("a", "c")]["n_match"] < 12


def test_group_minhash_similarity_merges_like_a_sketch(spark):
    # signature of (a ∪ b) == elementwise min of signatures — the
    # mergeability property the 100-TB story rests on
    from parlerproject_spark.operators.dedup import (group_minhash_similarity,
                                                     minhash_signatures)
    rows = [(i, "g", f"some shared text body number {i} with tokens")
            for i in range(20)]
    d = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    half1 = d.filter(F.col("doc_id") < 10)
    half2 = d.filter(F.col("doc_id") >= 10)
    def sig(frame):
        from parlerproject_spark.operators.dedup import shingles, \
            MINHASH_A, MINHASH_B, _P31
        sh = shingles(frame, id_col="source")
        aggs = [F.min((F.col("sh") * MINHASH_A[i] + MINHASH_B[i]) % _P31)
                .alias(f"h{i}") for i in range(12)]
        [r] = sh.groupBy("doc_id").agg(*aggs).collect()
        return [r[f"h{i}"] for i in range(12)]
    full, s1, s2 = sig(d), sig(half1), sig(half2)
    assert full == [min(a, b) for a, b in zip(s1, s2)]


# ----------------------------------------------------------- vocab coverage

def test_vocab_coverage_full_vocab_means_zero_oov(spark):
    from parlerproject_spark.operators.text_analysis import group_oov_rates
    d = spark.createDataFrame(
        [(i, "s", "alpha beta gamma") for i in range(5)],
        ["doc_id", "source", "text"])
    [r] = group_oov_rates(d, vocab_size=10, group_col="source").collect()
    assert r["oov_token_rate"] == 0.0 and r["oov_type_rate"] == 0.0
    assert r["n_tokens"] == 15 and r["n_types"] == 3


def test_vocab_coverage_rates_count_occurrences_vs_types(spark):
    from parlerproject_spark.operators.text_analysis import group_oov_rates
    # corpus: 'common' x6 dominates; vocab_size=1 keeps only it
    d = spark.createDataFrame(
        [(0, "s", "common common common rare1"),
         (1, "s", "common common common rare2")],
        ["doc_id", "source", "text"])
    [r] = group_oov_rates(d, vocab_size=1, group_col="source").collect()
    assert r["n_tokens"] == 8 and r["n_types"] == 3
    assert r["oov_token_rate"] == 0.25      # 2 of 8 occurrences OOV
    assert abs(r["oov_type_rate"] - 2 / 3) < 1e-6


# ------------------------------------------------------------- linear trend

def test_linear_trend_recovers_exact_line(spark):
    from datetime import datetime
    from parlerproject_spark.operators.timeseries import linear_trend
    # y = 2*x + 5 where x is hours since 2024-01-01
    rows = [(1, datetime(2024, 1, 1, h), 2.0 * h + 5.0) for h in range(10)]
    d = spark.createDataFrame(rows, ["user_id", "ts", "value"])
    [r] = linear_trend(d).collect()
    assert r["slope"] == 2.0 and r["intercept"] == 5.0 and r["r2"] == 1.0


def test_linear_trend_degenerate_keys_yield_nulls(spark):
    from datetime import datetime
    from parlerproject_spark.operators.timeseries import linear_trend
    d = spark.createDataFrame(
        [(1, datetime(2024, 1, 2), 3.0),                  # single point
         (2, datetime(2024, 1, 2), 1.0),                  # zero time var
         (2, datetime(2024, 1, 2), 9.0)],
        ["user_id", "ts", "value"])
    out = {r["user_id"]: r for r in linear_trend(d).collect()}
    assert out[1]["slope"] is None
    assert out[2]["slope"] is None


# ------------------------------------------------------------ diff in diff

def test_diff_in_diff_recovers_injected_effect(spark):
    from datetime import datetime
    from parlerproject_spark.operators.timeseries import diff_in_diff
    rows = []
    for u in range(40):
        for day in (10, 20):                      # pre=10, post=20
            base = 10.0 + (5.0 if day == 20 else 0.0)   # common shock +5
            rows.append((u, datetime(2024, 1, day), base))
    d = spark.createDataFrame(rows, ["user_id", "ts", "value"])
    # no differential effect: did == 0 despite the +5 common shock
    [r] = diff_in_diff(d).collect()
    assert r["did"] == 0.0
    # inject +3 on treated units post-cutover only
    treated = (F.conv(F.substring(F.md5(F.col("user_id").cast("string")),
                                  1, 15), 16, 10).cast("bigint")
               % 2147483647 % 2 == 1)
    post = F.col("ts") >= F.lit("2024-01-15").cast("timestamp")
    d2 = d.withColumn("value", F.col("value")
                      + F.when(treated & post, 3.0).otherwise(0.0))
    [r2] = diff_in_diff(d2).collect()
    assert r2["did"] == 3.0


class TestUncertaintyDiverseBatch:
    def _df(self, spark, rows):
        return spark.createDataFrame(rows,
                                     "doc_id long, source string, score double")

    def test_cap_and_ordering(self, spark):
        from parlerproject_spark.operators.sampling import (
            uncertainty_diverse_batch)
        # source a: scores at exactly 0.5 (max uncertainty), 4 rows;
        # source b: further away
        rows = ([(i, "a", 0.5) for i in range(4)]
                + [(10 + i, "b", 0.4 + i * 0.01) for i in range(4)])
        out = uncertainty_diverse_batch(
            self._df(spark, rows), k=5, per_group_cap=2).collect()
        # cap bites BOTH groups: 2 + 2 survive, k=5 is not reached
        assert len(out) == 4
        a_rows = [r for r in out if r.source == "a"]
        assert len(a_rows) == 2           # cap bites
        assert [r.doc_id for r in a_rows] == [0, 1]   # id tie-break
        # most uncertain overall lead the batch
        assert out[0].uncertainty == 0.5

    def test_k_cut_is_global(self, spark):
        from parlerproject_spark.operators.sampling import (
            uncertainty_diverse_batch)
        rows = [(i, f"s{i % 10}", 0.1) for i in range(100)]
        out = uncertainty_diverse_batch(
            self._df(spark, rows), k=7, per_group_cap=100).collect()
        assert len(out) == 7
        assert [r.doc_id for r in out] == list(range(7))


class TestAssembleDialogues:
    def test_session_split_truncation_and_order(self, spark):
        from parlerproject_spark.operators.sampling import assemble_dialogues
        from pyspark.sql import functions as F
        rows = [
            # user 1, session 1: three turns within the gap
            (1, 1, "2024-01-01 10:00:00", "a"),
            (1, 2, "2024-01-01 10:10:00", "b"),
            (1, 3, "2024-01-01 10:20:00", "c"),
            # >30 min gap -> session 2
            (1, 4, "2024-01-01 11:30:00", "d"),
            # user 2: tie timestamps -> event_id breaks the order
            (2, 6, "2024-01-01 09:00:00", "y"),
            (2, 5, "2024-01-01 09:00:00", "x"),
        ]
        df = (spark.createDataFrame(
                  rows, "user_id bigint, event_id bigint, ts string, "
                        "turn string")
              .withColumn("ts", F.col("ts").cast("timestamp")))
        out = {(r["user_id"], r["session_no"]): r
               for r in assemble_dialogues(df, max_turns=2).collect()}
        assert out[(1, 1)]["transcript"] == "a | b"   # truncated at 2
        assert out[(1, 1)]["n_turns"] == 2
        assert out[(1, 2)]["transcript"] == "d"
        assert out[(2, 1)]["transcript"] == "x | y"   # id-ordered tie
        assert out[(2, 1)]["n_chars"] == 5


class TestPurgedTimeFolds:
    def test_roles_and_embargo(self, spark):
        from parlerproject_spark.operators.sampling import purged_time_folds
        from pyspark.sql import functions as F
        # 10 hourly events, 2 folds -> test windows [h0,h5), [h5,h10)
        rows = [(i, f"2024-01-01 {i:02d}:00:00") for i in range(10)]
        df = (spark.createDataFrame(rows, "event_id bigint, ts string")
              .withColumn("ts", F.col("ts").cast("timestamp")))
        out = purged_time_folds(df, n_folds=2, embargo_seconds=3600)
        rolls = {(r["fold"], r["event_id"]): r["role"]
                 for r in out.collect()}
        assert len(rolls) == 20                      # 10 rows x 2 folds
        # fold 1: hours 0-4 test (window width ~4.5h: h0-h4 inside)
        assert rolls[(1, 0)] == "test"
        assert rolls[(1, 4)] == "test"
        # hour 5 is within the 1h embargo after fold 1's window end
        assert rolls[(1, 5)] == "embargoed"
        assert rolls[(1, 9)] == "train"
        # fold 2: hour 4 embargoed before window start, hour 9 test
        assert rolls[(2, 9)] == "test"
        assert rolls[(2, 3)] == "embargoed" or rolls[(2, 4)] == "embargoed"
        assert rolls[(2, 0)] == "train"

    def test_zero_embargo_has_no_embargoed_rows(self, spark):
        from parlerproject_spark.operators.sampling import purged_time_folds
        from pyspark.sql import functions as F
        rows = [(i, f"2024-01-01 {i:02d}:00:00") for i in range(8)]
        df = (spark.createDataFrame(rows, "event_id bigint, ts string")
              .withColumn("ts", F.col("ts").cast("timestamp")))
        out = purged_time_folds(df, n_folds=4, embargo_seconds=0)
        assert out.filter(F.col("role") == "embargoed").count() == 0
        # every fold tests a disjoint, covering slice
        tests = out.filter(F.col("role") == "test")
        assert tests.count() == 8
        assert tests.select("event_id").distinct().count() == 8
