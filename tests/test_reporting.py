"""S16 reporting sinks: the five bertopicTest.py write_html outputs
(topics/docs/hierarchy/heatmap/barchart) from one fit_topics pass.
Asserts the reference's gating conditions, filenames, and that each
file is a self-contained HTML document carrying the report's data —
rendering backend (plotly vs static SVG fallback) is environment-
dependent by design."""

from __future__ import annotations

import os

from parlerproject_spark import reporting
from parlerproject_spark.catalog import load_table


def test_write_topic_reports_emits_all_five(spark, sf_dir, tmp_path):
    docs = load_table(spark, "documents", sf_dir)
    vectors = load_table(spark, "embeddings", sf_dir)
    out = reporting.write_topic_reports(docs, vectors, str(tmp_path),
                                        k=6, sample_n=200)
    assert set(out) == {"topics", "documents", "hierarchy",
                        "heatmap", "barchart"}
    for name, path in out.items():
        assert os.path.exists(path), name
        with open(path, encoding="utf-8") as fh:
            text = fh.read()
        assert "<html" in text.lower(), name
        assert len(text) > 500, name
    # reference filenames, bertopicTest.py:132-163
    assert out["topics"].endswith("bertopic_topics_visualization.html")
    assert out["heatmap"].endswith("bertopic_heatmap_visualization.html")


def test_reports_are_deterministic(spark, sf_dir, tmp_path):
    docs = load_table(spark, "documents", sf_dir)
    vectors = load_table(spark, "embeddings", sf_dir)
    a = tmp_path / "a"
    b = tmp_path / "b"
    for d in (a, b):
        reporting.write_topic_reports(docs, vectors, str(d), k=4,
                                      sample_n=50)
    for fname in (reporting.TOPICS_HTML, reporting.HEATMAP_HTML,
                  reporting.BARCHART_HTML):
        ta = (a / fname).read_text(encoding="utf-8")
        tb = (b / fname).read_text(encoding="utf-8")
        assert ta == tb, fname


def test_too_few_topics_writes_nothing(spark, tmp_path):
    docs = spark.createDataFrame(
        [(i, f"word{i} text") for i in range(12)], ["doc_id", "text"])
    vectors = spark.createDataFrame(
        [(i, [1.0, 0.0, 0.0, 0.0]) for i in range(12)],
        "vec_id long, embedding array<float>")
    # every vector identical -> k-means collapses to ONE non-empty
    # topic -> the reference's unique_topics >= 2 gate fails
    out = reporting.write_topic_reports(docs, vectors, str(tmp_path), k=4)
    assert out == {}
    assert not os.listdir(tmp_path)


def test_corpus_datasheet_writes_json_and_md(spark, sf_dir, tmp_path):
    import json

    from parlerproject_spark.reporting import write_corpus_datasheet
    out = write_corpus_datasheet(spark, sf_dir, str(tmp_path / "card"))
    card = json.load(open(out["json"]))
    srcs = card["tables"]["documents"]["sources"]
    assert srcs and all("mean_quality" in r for r in srcs)
    assert card["tables"]["events"]["profile"]
    md = open(out["md"]).read()
    assert "# Corpus datasheet" in md
    assert "refresh funnel" in md
    # deterministic: a second run writes identical content
    out2 = write_corpus_datasheet(spark, sf_dir, str(tmp_path / "card2"))
    assert open(out2["md"]).read() == md
