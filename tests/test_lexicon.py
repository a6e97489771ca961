"""Dictionary tagging (operators/lexicon.py): counting contract,
expr/arrow equivalence, and Aho-Corasick edge cases."""

from __future__ import annotations

import pytest

from parlerproject_spark.catalog import load_table
from parlerproject_spark.operators.lexicon import (_ac_counts,
                                                   _build_automaton,
                                                   dictionary_tag)


def _rows(df):
    return sorted((r[0], r["phrase"], r["n"]) for r in df.collect())


def test_counts_hand_case(spark):
    docs = spark.createDataFrame(
        [(1, "the table scan ran a table scan twice"),
         (2, "hash join beats nested loop"),
         (3, "no matches here"),
         (4, None)],
        "doc_id bigint, text string")
    out = _rows(dictionary_tag(docs, ["table scan", "hash join"]))
    assert out == [(1, "table scan", 2), (2, "hash join", 1)]


def test_greedy_nonoverlap_self_overlapping_phrase(spark):
    # "aba" in "ababa": greedy left-to-right counts ONE (the replace
    # contract) — both impls must agree
    docs = spark.createDataFrame([(1, "ababa")], "doc_id bigint, text string")
    for impl in ("expr", "arrow"):
        out = _rows(dictionary_tag(docs, ["aba"], impl=impl))
        assert out == [(1, "aba", 1)], impl


def test_overlapping_distinct_phrases_count_independently(spark):
    docs = spark.createDataFrame([(1, "abc")], "doc_id bigint, text string")
    out = _rows(dictionary_tag(docs, ["ab", "bc"]))
    assert out == [(1, "ab", 1), (1, "bc", 1)]


def test_phrase_inside_longer_phrase(spark):
    docs = spark.createDataFrame([(1, "sort merge join x sort merge")],
                                 "doc_id bigint, text string")
    for impl in ("expr", "arrow"):
        out = _rows(dictionary_tag(
            docs, ["sort merge", "sort merge join"], impl=impl))
        assert out == [(1, "sort merge", 2),
                       (1, "sort merge join", 1)], impl


def test_expr_arrow_equivalence_on_corpus(spark, sf_dir):
    phrases = ["table scan", "hash join", "sort merge", "data stream",
               "window agg", "slow query", "fast table", "a a"]
    docs = load_table(spark, "documents", sf_dir)
    a = _rows(dictionary_tag(docs, phrases, impl="expr"))
    b = _rows(dictionary_tag(docs, phrases, impl="arrow"))
    assert a == b
    assert len(a) > 0


def test_ac_automaton_unit():
    ps = ["he", "she", "his", "hers"]
    auto = _build_automaton(ps)
    assert _ac_counts("ushers", ps, auto) == [1, 1, 0, 1]
    # "hishers" = h-i-s-h-e-r-s: his@0-2, she@2-4, he@3-4, hers@3-6
    assert _ac_counts("hishers", ps, auto) == [1, 1, 1, 1]


def test_validation(spark):
    docs = spark.createDataFrame([(1, "x")], "doc_id bigint, text string")
    with pytest.raises(ValueError):
        dictionary_tag(docs, [])
    with pytest.raises(ValueError):
        dictionary_tag(docs, ["a", "a"])
    with pytest.raises(ValueError):
        dictionary_tag(docs, ["a", ""])   # empty phrase: impls diverge
