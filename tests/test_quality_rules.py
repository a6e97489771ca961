"""Gopher + C4 named rule sets (operators/quality_rules): crafted
fixtures exercise each rule edge the word-soup oracle corpus cannot
(bullets, ellipses, contamination strings, boundary thresholds),
plus the zero-shuffle plan contract."""

from __future__ import annotations

from pyspark.sql import functions as F

from parlerproject_spark.operators.quality_rules import (c4_line_filter,
                                                         gopher_quality_flags)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _flags(spark, text, **kw):
    [r] = gopher_quality_flags(_docs(spark, [(1, text)]), **kw).collect()
    return r


def test_gopher_passes_normal_prose(spark):
    text = ("the quick brown fox jumps over the lazy dog and that "
            "dog really ought to have known better with all of it " * 4)
    r = _flags(spark, text)
    assert r["keep"] is True
    assert r["stop_hits"] >= 2 and r["pass_alpha"]


def test_gopher_word_count_band(spark):
    r = _flags(spark, "too short to have fifty words of the and that")
    assert r["pass_words"] is False and r["keep"] is False


def test_gopher_bullet_and_ellipsis_shares(spark):
    bullets = "\n".join(f"- item {i} of the list and that" for i in range(10))
    r = _flags(spark, bullets, min_words=5)
    assert r["bullet_share"] == 1.0 and r["pass_bullets"] is False
    dots = "\n".join(f"line {i} of the doc trails off..." for i in range(10))
    r2 = _flags(spark, dots, min_words=5)
    assert r2["ellipsis_share"] == 1.0 and r2["pass_ellipsis"] is False


def test_gopher_symbol_ratio_and_alpha_share(spark):
    hashy = "the of " + "# " * 30
    r = _flags(spark, hashy, min_words=5)
    assert r["pass_symbols"] is False
    assert r["pass_alpha"] is False  # '#' words have no alphabetic char


def test_gopher_stop_word_rule(spark):
    r = _flags(spark, "colorless green ideas sleep furiously " * 20)
    assert r["stop_hits"] == 0 and r["pass_stops"] is False


def test_c4_line_rules(spark):
    doc = "\n".join([
        "This is a proper sentence with enough words.",   # keep
        "Short line.",                                    # < 5 words
        "no terminal punctuation on this line here",      # no punct
        "Please enable javascript to view this page.",    # contaminated
        "Lorem ipsum dolor sit amet consectetur elit.",   # lorem
        "function() { return 42; } and more words.",      # brace
        "Another good sentence that should survive here!",
        'He said "this quoted line ends properly."',
    ])
    out = c4_line_filter(_docs(spark, [(1, doc)]), min_lines=3).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_lines"] == 8 and r["n_kept"] == 3
    assert "javascript" not in r["clean_text"].lower()
    assert "lorem" not in r["clean_text"].lower()
    assert "{" not in r["clean_text"]


def test_c4_min_lines_drops_thin_docs(spark):
    thin = ("One single good sentence with enough words here.\n"
            "And another good sentence to go with it.")
    assert c4_line_filter(_docs(spark, [(1, thin)]),
                          min_lines=3).count() == 0
    assert c4_line_filter(_docs(spark, [(1, thin)]),
                          min_lines=2).count() == 1


def test_quality_rules_plans_have_no_shuffle(spark):
    d = _docs(spark, [(1, "a b c.\nd e f.")])
    for df in (gopher_quality_flags(d), c4_line_filter(d, min_lines=0)):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
