"""Sentence-boundary RAG chunking — bucket contract tests."""
class TestSentenceChunks:
    def test_budget_bucketing_and_reassembly(self, spark):
        from parlerproject_spark.operators.text_analysis import (
            sentence_chunks)
        # sentences of 3 tokens each; budget 5 -> chunk closes at the
        # first crossing: s1 (before=0) chunk0, s2 (before=3) chunk0,
        # s3 (before=6) chunk1, s4 (before=9) chunk1
        text = "a b c. d e f. g h i. j k l"
        df = spark.createDataFrame([(1, text)], "doc_id bigint, text string")
        out = sorted(sentence_chunks(df, budget_tokens=5).collect(),
                     key=lambda r: r["chunk_id"])
        assert [r["chunk_id"] for r in out] == [0, 1]
        assert [r["n_sentences"] for r in out] == [2, 2]
        assert [r["n_tokens"] for r in out] == [6, 6]
        assert out[0]["chunk_text"] == "a b c. d e f"
        assert out[1]["chunk_text"] == "g h i. j k l"

    def test_no_mid_sentence_split_and_overshoot_bound(self, spark):
        from parlerproject_spark.operators.text_analysis import (
            sentence_chunks)
        text = ". ".join("w" * 1 + " x y z" for _ in range(10))
        df = spark.createDataFrame([(7, text)], "doc_id bigint, text string")
        out = sentence_chunks(df, budget_tokens=6).collect()
        # every chunk holds whole sentences; overshoot <= one sentence
        for r in out:
            for sent in r["chunk_text"].split(". "):
                assert len(sent.split()) == 4
            assert r["n_tokens"] <= 6 + 4
        assert sum(r["n_sentences"] for r in out) == 10

    def test_empty_and_single_sentence_docs(self, spark):
        from parlerproject_spark.operators.text_analysis import (
            sentence_chunks)
        import pytest as _pytest
        df = spark.createDataFrame(
            [(1, ""), (2, "only one sentence here")],
            "doc_id bigint, text string")
        out = sentence_chunks(df, budget_tokens=8).collect()
        assert {r["doc_id"] for r in out} == {2}
        assert out[0]["chunk_text"] == "only one sentence here"
        with _pytest.raises(ValueError):
            sentence_chunks(df, budget_tokens=0)


class TestTokenEntropy:
    def test_hand_cases(self, spark):
        import math

        from parlerproject_spark.operators.text_analysis import (
            token_entropy)
        df = spark.createDataFrame(
            [(1, "spam spam spam spam"),        # one type: H = 0
             (2, "a b c d"),                    # uniform 4: H = ln 4
             (3, "a a b"),                      # 2/3, 1/3
             (4, ""),                           # no tokens: excluded
             (5, "???")],                       # tokenizes empty: excluded
            "doc_id bigint, text string")
        out = {r["doc_id"]: r for r in token_entropy(df).collect()}
        assert set(out) == {1, 2, 3}
        assert out[1]["n_toks"] == 4 and out[1]["entropy"] == 0.0
        assert out[2]["entropy"] == round(math.log(4), 6)
        want = (2 / 3) * math.log(3 / 2) + (1 / 3) * math.log(3)
        assert abs(out[3]["entropy"] - want) < 1e-6
        assert out[3]["n_toks"] == 3

    def test_entropy_bounded_by_log_types(self, spark):
        import math

        from parlerproject_spark.operators.text_analysis import (
            token_entropy, type_token_ratio)
        docs = (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
                .limit(100))
        ent = {r["doc_id"]: r for r in token_entropy(docs).collect()}
        for r in (type_token_ratio(docs).collect()):
            e = ent[r["doc_id"]]
            n_types = round(r["ttr"] * e["n_toks"])
            assert -1e-6 <= e["entropy"] <= math.log(max(n_types, 1)) + 1e-6


class TestFormatSignals:
    def test_routes_code_vs_prose(self, spark):
        from parlerproject_spark.operators.text_analysis import (
            format_signals)
        code = ("def f(x):\n    y = x * 2;\n    if (y > 3):\n"
                "        return [y, x];\n    return {};\n")
        prose = ("The quick brown fox jumps over the lazy dog. "
                 "It was a bright cold day in April and the clocks "
                 "were striking thirteen.\nNothing unusual here.\n")
        df = spark.createDataFrame([(1, code), (2, prose), (3, "")],
                                   "doc_id bigint, text string")
        out = {r["doc_id"]: r for r in format_signals(df).collect()}
        assert set(out) == {1, 2}          # empty doc excluded
        assert out[1]["label"] == "code"
        assert out[2]["label"] == "prose"
        assert out[1]["indent_ratio"] > 0.5     # 4 of 5 lines indented
        assert out[2]["indent_ratio"] == 0.0
        assert out[1]["code_score"] > out[2]["code_score"]

    def test_signal_ranges(self, spark):
        from parlerproject_spark.operators.text_analysis import (
            format_signals)
        docs = (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
                .limit(200))
        for r in format_signals(docs).collect():
            for c in ("indent_ratio", "symbol_ratio", "digit_ratio"):
                assert 0.0 <= r[c] <= 1.0, (c, r)
            assert r["line_cv"] >= 0.0 and r["n_lines"] >= 1
