"""S16: HTML report sinks — the reporting layer over topic-model
output (reference: bertopicTest.py:129-165, five `write_html` sinks:
topics map, document map, hierarchy, similarity heatmap, top-word
barchart).

Spark-first split: everything unbounded happens IN Spark (topic
counts, top-n terms, the deterministic document sample), and only
BOUNDED results — k topics, k×k similarities, n≤sample_n points —
cross to the driver via `toPandas()`. At 100 TB the corpus never
moves; a report is always k-sized.

Rendering is dependency-gated like the other real-world seams: with
plotly installed each report is the interactive figure the reference
writes; without it, a self-contained static SVG with the same data —
either way one standalone .html file per sink, same filenames as the
reference. The 2D projections (topic map, document map) use a
deterministic PCA (numpy SVD with a fixed sign convention) instead of
BERTopic's UMAP, consistent with the engine's documented k-means
analogue of HDBSCAN (SURVEY §7.3.4).
"""

from __future__ import annotations

import html as _html
import os

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: reference filenames, bertopicTest.py:132-163
TOPICS_HTML = "bertopic_topics_visualization.html"
DOCS_HTML = "bertopic_documents_visualization.html"
HIERARCHY_HTML = "bertopic_hierarchy_visualization.html"
HEATMAP_HTML = "bertopic_heatmap_visualization.html"
BARCHART_HTML = "bertopic_barchart_visualization.html"


def _have_plotly() -> bool:
    try:
        import plotly  # noqa: F401
        return True
    except Exception:
        return False


def _pca_2d(mat: np.ndarray) -> np.ndarray:
    """Deterministic 2-component PCA of a (n×d) matrix: SVD of the
    centered matrix with each component's sign fixed so its largest-
    magnitude loading is positive — same picture on every run/arch."""
    x = mat - mat.mean(axis=0, keepdims=True)
    _, _, vt = np.linalg.svd(x, full_matrices=False)
    comps = vt[:2] if vt.shape[0] >= 2 else np.vstack([vt, np.zeros_like(vt)])
    for i in range(2):
        j = int(np.abs(comps[i]).argmax())
        if comps[i][j] < 0:
            comps[i] = -comps[i]
    return x @ comps.T


def _scale(vals, lo: float, hi: float, out_lo: float, out_hi: float):
    span = (hi - lo) or 1.0
    return [out_lo + (v - lo) / span * (out_hi - out_lo) for v in vals]


def _svg_doc(title: str, body: str, width: int = 760, height: int = 520) -> str:
    return (
        "<!DOCTYPE html><html><head><meta charset='utf-8'>"
        f"<title>{_html.escape(title)}</title></head><body>"
        f"<h2>{_html.escape(title)}</h2>"
        f"<svg xmlns='http://www.w3.org/2000/svg' width='{width}' "
        f"height='{height}' viewBox='0 0 {width} {height}'>{body}</svg>"
        "</body></html>")


def _write(path: str, text: str) -> str:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "w", encoding="utf-8") as fh:
        fh.write(text)
    return path


_PALETTE = ["#4e79a7", "#f28e2b", "#e15759", "#76b7b2", "#59a14f",
            "#edc948", "#b07aa1", "#ff9da7", "#9c755f", "#bab0ac"]


def _color(topic: int) -> str:
    return "#888888" if topic == -1 else _PALETTE[topic % len(_PALETTE)]


def _scatter_html(points, title: str, path: str, *, labels=None,
                  sizes=None) -> str:
    """points: list of (x, y, topic). Plotly scatter when available,
    else an SVG scatter with per-topic colors."""
    xs = [p[0] for p in points] or [0.0]
    ys = [p[1] for p in points] or [0.0]
    if _have_plotly():
        import plotly.graph_objects as go
        fig = go.Figure(go.Scatter(
            x=xs, y=ys, mode="markers",
            text=labels,
            marker={"size": sizes or 8,
                    "color": [_color(p[2]) for p in points]}))
        fig.update_layout(title=title)
        fig.write_html(path)
        return path
    sx = _scale(xs, min(xs), max(xs), 40, 720)
    sy = _scale(ys, min(ys), max(ys), 480, 40)  # y grows upward
    parts = []
    for i, (p, x, y) in enumerate(zip(points, sx, sy)):
        r = (sizes[i] if sizes else 5)
        tip = _html.escape(str(labels[i])) if labels else f"topic {p[2]}"
        parts.append(
            f"<circle cx='{x:.1f}' cy='{y:.1f}' r='{r:.1f}' "
            f"fill='{_color(p[2])}' fill-opacity='0.75'>"
            f"<title>{tip}</title></circle>")
    return _write(path, _svg_doc(title, "".join(parts)))


def topics_report(topic_info: DataFrame, centroids: list[list[float]],
                  out_dir: str) -> str:
    """2D topic map (reference visualize_topics, bertopicTest.py:131):
    one circle per topic at its PCA-projected centroid, area ∝ Count.
    topic_info is fit_topics' bounded (topic, Count, share_pct)."""
    pdf = topic_info.select("topic", "Count").toPandas()
    info = dict(zip(pdf["topic"].astype(int), pdf["Count"].astype(int)))
    xy = _pca_2d(np.array(centroids, dtype=float))
    pts, sizes, labels = [], [], []
    for t, (x, y) in enumerate(xy):
        n = info.get(t, 0)
        pts.append((float(x), float(y), t))
        sizes.append(6 + 2.5 * np.sqrt(n))
        labels.append(f"topic {t}: {n} docs")
    return _scatter_html(pts, "Topic map (PCA of centroids)",
                         os.path.join(out_dir, TOPICS_HTML),
                         labels=labels, sizes=sizes)


def documents_report(doc_topics: DataFrame, vectors: DataFrame,
                     out_dir: str, *, sample_n: int = 1000,
                     doc_id_col: str = "doc_id",
                     vec_id_col: str = "vec_id",
                     vec_col: str = "embedding") -> str:
    """2D document map (reference visualize_documents,
    bertopicTest.py:138, hide_annotations=True → points only). The
    sample is a DETERMINISTIC md5 top-n inside Spark
    (TakeOrderedAndProject — never a full collect); only sample_n
    (id, vec, topic) rows reach the driver for projection."""
    joined = (doc_topics.join(
        vectors.select(F.col(vec_id_col).alias(doc_id_col), vec_col),
        doc_id_col))
    key = F.md5(F.concat(F.lit("docviz:"), F.col(doc_id_col).cast("string")))
    pdf = (joined.orderBy(key).limit(sample_n)
           .select(doc_id_col, "topic", vec_col).toPandas())
    if len(pdf):
        xy = _pca_2d(np.array(pdf[vec_col].tolist(), dtype=float))
        pts = [(float(x), float(y), int(t))
               for (x, y), t in zip(xy, pdf["topic"])]
    else:
        pts = []
    return _scatter_html(pts, f"Document map ({len(pts)} sampled docs)",
                         os.path.join(out_dir, DOCS_HTML))


def _cosine_matrix(centroids: list[list[float]]) -> np.ndarray:
    c = np.array(centroids, dtype=float)
    norm = np.linalg.norm(c, axis=1, keepdims=True)
    norm[norm == 0] = 1.0
    u = c / norm
    return u @ u.T


def hierarchy_report(centroids: list[list[float]], out_dir: str) -> str:
    """Topic dendrogram (reference visualize_hierarchy,
    bertopicTest.py:146, gated on ≥3 topics there and here by the
    caller): driver-side single-linkage agglomeration over the k×k
    cosine matrix — k rows of metadata, never data."""
    sim = _cosine_matrix(centroids)
    k = sim.shape[0]
    active = {i: [i] for i in range(k)}
    merges = []
    d = 1.0 - sim
    while len(active) > 1:
        best, pair = None, None
        ids = sorted(active)
        for ai in range(len(ids)):
            for bi in range(ai + 1, len(ids)):
                a, b = ids[ai], ids[bi]
                dist = min(d[x][y] for x in active[a] for y in active[b])
                if best is None or dist < best:
                    best, pair = dist, (a, b)
        a, b = pair
        merges.append((active[a][:], active[b][:], float(best)))
        active[a] = active[a] + active[b]
        del active[b]
    if _have_plotly():
        import plotly.graph_objects as go
        fig = go.Figure()
        for la, lb, dist in merges:
            fig.add_trace(go.Scatter(
                x=[min(la + lb), max(la + lb)], y=[dist, dist],
                mode="lines+text", text=[f"{la}+{lb}"]))
        fig.update_layout(title="Topic hierarchy (single linkage)")
        fig.write_html(os.path.join(out_dir, HIERARCHY_HTML))
        return os.path.join(out_dir, HIERARCHY_HTML)
    rows = []
    for i, (la, lb, dist) in enumerate(merges):
        y = 40 + i * 30
        rows.append(
            f"<text x='40' y='{y}' font-size='13'>merge {sorted(la)} + "
            f"{sorted(lb)} at distance {dist:.3f}</text>")
    return _write(os.path.join(out_dir, HIERARCHY_HTML),
                  _svg_doc("Topic hierarchy (single linkage)",
                           "".join(rows),
                           height=max(120, 60 + 30 * len(merges))))


def heatmap_report(centroids: list[list[float]], out_dir: str) -> str:
    """Topic-similarity heatmap (reference visualize_heatmap,
    bertopicTest.py:154): the k×k cosine matrix."""
    sim = _cosine_matrix(centroids)
    k = sim.shape[0]
    if _have_plotly():
        import plotly.graph_objects as go
        fig = go.Figure(go.Heatmap(z=sim.tolist()))
        fig.update_layout(title="Topic similarity")
        fig.write_html(os.path.join(out_dir, HEATMAP_HTML))
        return os.path.join(out_dir, HEATMAP_HTML)
    cell = max(18, min(48, 480 // max(k, 1)))
    parts = []
    for i in range(k):
        for j in range(k):
            v = (sim[i][j] + 1) / 2  # [-1,1] -> [0,1]
            shade = int(255 - v * 215)
            parts.append(
                f"<rect x='{60 + j * cell}' y='{40 + i * cell}' "
                f"width='{cell - 1}' height='{cell - 1}' "
                f"fill='rgb({shade},{shade},255)'>"
                f"<title>sim({i},{j}) = {sim[i][j]:.3f}</title></rect>")
    size = 120 + k * cell
    return _write(os.path.join(out_dir, HEATMAP_HTML),
                  _svg_doc("Topic similarity", "".join(parts),
                           width=size, height=size))


def barchart_report(topic_words: DataFrame, out_dir: str, *,
                    top_n_topics: int = 10) -> str:
    """Top-word barchart (reference visualize_barchart,
    bertopicTest.py:162, top_n_topics=min(10, k)): horizontal bars of
    c-TF-IDF scores per topic. topic_words is fit_topics' bounded
    (topic, term, score) — the Spark side already cut it to top-n."""
    pdf = (topic_words.filter(F.col("topic") < top_n_topics)
           .orderBy("topic", F.desc("score"), "term").toPandas())
    by_topic: dict[int, list[tuple[str, float]]] = {}
    for r in pdf.itertuples(index=False):
        by_topic.setdefault(int(r.topic), []).append(
            (str(r.term), float(r.score)))
    if _have_plotly():
        import plotly.graph_objects as go
        fig = go.Figure()
        for t, words in sorted(by_topic.items()):
            fig.add_trace(go.Bar(name=f"topic {t}",
                                 x=[w for w, _ in words],
                                 y=[s for _, s in words]))
        fig.update_layout(title="Top words per topic", barmode="group")
        fig.write_html(os.path.join(out_dir, BARCHART_HTML))
        return os.path.join(out_dir, BARCHART_HTML)
    max_score = max((s for ws in by_topic.values() for _, s in ws),
                    default=1.0) or 1.0
    parts, y = [], 30
    for t, words in sorted(by_topic.items()):
        parts.append(f"<text x='20' y='{y}' font-size='14' "
                     f"font-weight='bold'>topic {t}</text>")
        y += 8
        for w, s in words:
            width = 12 + 500 * (s / max_score)
            y += 18
            parts.append(
                f"<rect x='140' y='{y - 12}' width='{width:.1f}' "
                f"height='14' fill='{_color(t)}' fill-opacity='0.8'/>"
                f"<text x='20' y='{y}' font-size='12'>"
                f"{_html.escape(w)}</text>"
                f"<text x='{145 + width:.1f}' y='{y}' font-size='10'>"
                f"{s:.4f}</text>")
        y += 22
    return _write(os.path.join(out_dir, BARCHART_HTML),
                  _svg_doc("Top words per topic", "".join(parts),
                           height=max(200, y + 20)))


def write_topic_reports(docs: DataFrame, vectors: DataFrame, out_dir: str,
                        *, k: int = 8, sample_n: int = 1000,
                        doc_id_col: str = "doc_id",
                        vec_id_col: str = "vec_id") -> dict[str, str]:
    """The full reference report flow (bertopicTest.py:120-165): fit
    topics once, then emit every sink its gates allow — topics + docs
    + heatmap + barchart need ≥2 topics and ≥10 docs, hierarchy needs
    ≥3 topics (the reference's exact conditions). Returns
    {sink: path} for what was written."""
    from parlerproject_spark.operators.topics import (fit_topics,
                                                      lloyd_centroids)

    doc_topics, topic_info, topic_words = fit_topics(
        docs, vectors, k=k, doc_id_col=doc_id_col, vec_id_col=vec_id_col)
    centroids = lloyd_centroids(vectors, k=k, id_col=vec_id_col)
    info = topic_info.toPandas()
    unique_topics = int((info["topic"] != -1).sum())
    n_docs = int(info["Count"].sum())
    out: dict[str, str] = {}
    if unique_topics >= 2 and n_docs >= 10:
        out["topics"] = topics_report(topic_info, centroids, out_dir)
        out["documents"] = documents_report(
            doc_topics, vectors, out_dir, sample_n=sample_n,
            doc_id_col=doc_id_col, vec_id_col=vec_id_col)
        if unique_topics >= 3:
            out["hierarchy"] = hierarchy_report(centroids, out_dir)
        out["heatmap"] = heatmap_report(centroids, out_dir)
        out["barchart"] = barchart_report(
            topic_words, out_dir, top_n_topics=min(10, unique_topics))
    return out


def write_corpus_datasheet(spark, sf_dir: str, out_dir: str) -> dict:
    """Dataset-card generator — the datasheet (Gebru et al. 2021)
    a corpus release ships: one JSON + one Markdown summarizing the
    corpus from already-verified engine queries (per-source
    scorecard, language mix, events profile, dedup-funnel counts).

    All numbers come from bounded aggregates (sources × metrics,
    per-column profiles) — the driver only ever collects
    report-sized tables, same contract as the topic reports above.
    Returns {"json": path, "md": path}.
    """
    import json as _json
    import os

    from parlerproject_spark import queries as Q

    reg = Q.queries()
    scorecard = [r.asDict() for r in
                 reg["source_scorecard_docs"](spark, sf_dir).collect()]
    langs = [r.asDict() for r in
             reg["language_id_docs"](spark, sf_dir)
             .groupby("lang_pred").count().collect()]
    profile = [r.asDict() for r in
               reg["profile_events_table"](spark, sf_dir).collect()]
    refresh = [r.asDict() for r in
               reg["corpus_refresh_pipeline"](spark, sf_dir).collect()]
    card = {"tables": {"documents": {"sources": scorecard,
                                     "language_mix": langs,
                                     "refresh_funnel": refresh},
                       "events": {"profile": profile}}}
    os.makedirs(out_dir, exist_ok=True)
    jpath = os.path.join(out_dir, "datasheet.json")
    with open(jpath, "w") as fh:
        _json.dump(card, fh, indent=1, sort_keys=True, default=str)
    lines = ["# Corpus datasheet", "",
             "## documents: per-source scorecard", "",
             "| source | docs | mean quality | mean tokens | dup share |",
             "|---|---|---|---|---|"]
    for r in scorecard:
        lines.append(f"| {r['source']} | {r['n_docs']} | "
                     f"{r['mean_quality']} | {r['mean_tokens']} | "
                     f"{r['dup_share']} |")
    lines += ["", "## documents: language mix", ""]
    for r in sorted(langs, key=lambda x: -x["count"]):
        lines.append(f"- {r['lang_pred']}: {r['count']}")
    lines += ["", "## documents: refresh funnel (batch -> kept)", "",
              "| source | batch | after exact | after near | kept |"
              " weight |", "|---|---|---|---|---|---|"]
    for r in refresh:
        lines.append(f"| {r['source']} | {r['n_batch']} | {r['n_exact']}"
                     f" | {r['n_near']} | {r['n_kept']} | {r['weight']} |")
    lines += ["", "## events: column profile", "",
              "| column | rows | nulls | distinct | min | max |",
              "|---|---|---|---|---|---|"]
    for r in profile:
        lines.append(f"| {r['col_name']} | {r['n_rows']} | {r['n_nulls']}"
                     f" | {r['n_distinct']} | {r['min_s']} | {r['max_s']} |")
    mpath = os.path.join(out_dir, "datasheet.md")
    with open(mpath, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    return {"json": jpath, "md": mpath}
