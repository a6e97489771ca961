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
