"""Incremental MinHash near-dup against a persisted store, and
canonical keep-best-per-cluster selection."""

from __future__ import annotations

from pyspark.sql import functions as F

from parlerproject_spark.operators.dedup import (
    incremental_near_dup_minhash,
    keep_best_per_cluster,
    minhash_band_buckets,
    minhash_signatures,
    ngram_jaccard_pairs,
    shingles,
    write_minhash_store,
)


def _corpus(spark):
    base = ("the quick brown fox jumps over the lazy dog and then "
            "runs far away into the deep dark forest tonight")
    return spark.createDataFrame(
        [(1, base),
         (2, base + " again"),                       # near-dup of 1
         (3, "completely different text about spark shuffles and "
             "partitions and exchanges and codegen stages today"),
         (4, base.replace("fox", "cat")),            # near-dup of 1
         (5, "short one")],
        "doc_id bigint, text string")


def test_incremental_matches_batch_pairs(spark):
    """Probing new docs against a store built from seen docs finds
    exactly the cross pairs the all-at-once batch run finds."""
    docs = _corpus(spark)
    seen = docs.filter(F.col("doc_id") <= 3)
    new = docs.filter(F.col("doc_id") >= 4)
    seen_sh = shingles(seen).repartition("doc_id")
    seen_sig = minhash_signatures(seen, _shingles_df=seen_sh)
    got = {(r["new_id"], r["seen_id"])
           for r in incremental_near_dup_minhash(
               new, minhash_band_buckets(seen_sig), seen_sh,
               threshold=0.3).collect()}
    from parlerproject_spark.operators.dedup import minhash_lsh_pairs
    batch = minhash_lsh_pairs(docs, threshold=0.3).collect()
    want = {(b, a) if b >= 4 else (a, b)
            for a, b in ((r["id_a"], r["id_b"]) for r in batch)
            if (a >= 4) != (b >= 4)}
    assert got == want
    assert (4, 1) in got


def test_persisted_store_roundtrip(spark, tmp_path):
    docs = _corpus(spark)
    seen = docs.filter(F.col("doc_id") <= 3)
    new = docs.filter(F.col("doc_id") >= 4)
    path = str(tmp_path / "mh_store")
    write_minhash_store(seen, path)
    buckets = spark.read.parquet(f"{path}/buckets")
    sh = spark.read.parquet(f"{path}/shingles")
    got = {(r["new_id"], r["seen_id"])
           for r in incremental_near_dup_minhash(
               new, buckets, sh, threshold=0.3).collect()}
    assert (4, 1) in got
    # store layout: partitioned by band for probe-side pruning
    assert (tmp_path / "mh_store" / "buckets" / "band=0").exists()


def test_incremental_excludes_self_rematch(spark):
    """A doc present in BOTH the store and the batch must not match
    itself."""
    docs = _corpus(spark)
    sh = shingles(docs).repartition("doc_id")
    sig = minhash_signatures(docs, _shingles_df=sh)
    out = incremental_near_dup_minhash(
        docs, minhash_band_buckets(sig), sh, threshold=0.9).collect()
    assert all(r["new_id"] != r["seen_id"] for r in out)


def test_keep_best_per_cluster_policy(spark):
    docs = spark.createDataFrame(
        [(1, "a" * 10), (2, "b" * 10), (3, "c" * 10), (9, "solo")],
        "doc_id bigint, text string")
    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1)], "doc_id bigint, cluster_id bigint")
    # score: pick doc 2 as best, tie between 1 and 3 below it
    score = F.when(F.col("doc_id") == 2, 1.0).otherwise(0.5)
    rows = {r["doc_id"]: r for r in keep_best_per_cluster(
        docs, clusters, score_col=score).collect()}
    assert set(rows) == {2, 9}            # winner + untouched singleton
    assert rows[2]["cluster_id"] == 1
    assert rows[9]["cluster_id"] == 9


def test_keep_best_tie_breaks_to_lowest_id(spark):
    docs = spark.createDataFrame(
        [(5, "x"), (3, "x"), (8, "x")], "doc_id bigint, text string")
    clusters = spark.createDataFrame(
        [(5, 3), (3, 3), (8, 3)], "doc_id bigint, cluster_id bigint")
    out = keep_best_per_cluster(docs, clusters,
                                score_col=F.lit(0.7)).collect()
    assert len(out) == 1 and out[0]["doc_id"] == 3


def test_keep_best_uses_quality_by_default(spark):
    docs = spark.createDataFrame(
        [(1, "Long clean alphabetic text " * 20),
         (2, "#### 1234 !!!! 9999 ####")],
        "doc_id bigint, text string")
    clusters = spark.createDataFrame(
        [(1, 1), (2, 1)], "doc_id bigint, cluster_id bigint")
    out = keep_best_per_cluster(docs, clusters).collect()
    assert len(out) == 1 and out[0]["doc_id"] == 1


def test_ngram_pairs_to_canonical_end_to_end(spark):
    docs = _corpus(spark)
    pairs = ngram_jaccard_pairs(docs, threshold=0.3)
    from parlerproject_spark.operators.dedup import duplicate_clusters
    survivors = keep_best_per_cluster(
        docs, duplicate_clusters(pairs)).collect()
    ids = {r["doc_id"] for r in survivors}
    # docs 1/2/4 collapse to one survivor; 3 and 5 remain
    assert 3 in ids and 5 in ids
    assert len(ids & {1, 2, 4}) == 1


class TestIntraDocRepeatedSpans:
    def _run(self, spark, texts, n=2):
        from parlerproject_spark.operators.dedup import (
            intra_doc_repeated_spans)
        df = spark.createDataFrame(list(enumerate(texts)),
                                   "doc_id long, text string")
        return [(r.doc_id, r.start, r.end, r.masked_tokens)
                for r in intra_doc_repeated_spans(df, n=n)
                .orderBy("doc_id", "start").collect()]

    def test_single_repeat_masks_second_occurrence(self, spark):
        # "a b" repeats at positions 1 and 4 -> mask tokens 4-5 only
        out = self._run(spark, ["a b c a b"])
        assert out == [(0, 4, 5, 2)]

    def test_adjacent_spans_merge_into_island(self, spark):
        # "a a a a": bigram "a a" at 1,2,3 -> 2 and 3 masked,
        # spans [2,3] and [3,4] merge to one island [2,4]
        out = self._run(spark, ["a a a a"])
        assert out == [(0, 2, 4, 3)]

    def test_no_repeats_no_rows_and_short_docs(self, spark):
        out = self._run(spark, ["a b c d", "x", ""])
        assert out == []

    def test_trigram_mode(self, spark):
        # "a b c" repeats (pos 1 and 5) at n=3 -> mask [5,7]
        out = self._run(spark, ["a b c x a b c"], n=3)
        assert out == [(0, 5, 7, 3)]
