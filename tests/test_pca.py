"""Distributed PCA / whitening (operators/pca.py)."""

from __future__ import annotations

import numpy as np

from parlerproject_spark.catalog import load_table
from parlerproject_spark.operators.pca import (embedding_moments,
                                               pca_components, pca_project)


def _matrix(spark, sf_dir):
    rows = load_table(spark, "embeddings", sf_dir) \
        .select("vec_id", "embedding").collect()
    rows.sort(key=lambda r: r["vec_id"])
    return (np.array([r["embedding"] for r in rows], dtype=np.float64),
            [r["vec_id"] for r in rows])


def test_moments_match_numpy_cov(spark, sf_dir):
    X, _ = _matrix(spark, sf_dir)
    want = np.cov(X, rowvar=False, bias=True)      # population
    emb = load_table(spark, "embeddings", sf_dir)
    got = np.zeros_like(want)
    for r in embedding_moments(emb).collect():
        got[r["i"], r["j"]] = got[r["j"], r["i"]] = r["cov"]
    assert np.max(np.abs(got - want)) < 1e-6       # round(,6) contract


def test_components_orthonormal_and_ordered(spark, sf_dir):
    emb = load_table(spark, "embeddings", sf_dir)
    mu, comps, evals = pca_components(emb, n_components=8)
    assert comps.shape == (8, 64)
    assert np.allclose(comps @ comps.T, np.eye(8), atol=1e-6)
    assert all(evals[i] >= evals[i + 1] - 1e-12 for i in range(7))
    assert evals[0] > 0
    # sign rule: each row's largest-|entry| coordinate is positive
    for r in range(8):
        assert comps[r, np.argmax(np.abs(comps[r]))] > 0


def test_projection_matches_numpy(spark, sf_dir):
    X, ids = _matrix(spark, sf_dir)
    emb = load_table(spark, "embeddings", sf_dir)
    mu, comps, evals = pca_components(emb, n_components=4)
    got = {r["vec_id"]: np.array(r["pc"]) for r in
           pca_project(emb, mu, comps, evals).collect()}
    want = (X - mu) @ comps.T
    diff = max(np.max(np.abs(got[i] - want[n])) for n, i in enumerate(ids))
    assert diff < 1e-9


def test_whitened_output_has_identity_covariance(spark, sf_dir):
    emb = load_table(spark, "embeddings", sf_dir)
    mu, comps, evals = pca_components(emb, n_components=6)
    rows = pca_project(emb, mu, comps, evals, whiten=True).collect()
    P = np.array([r["pc"] for r in rows])
    C = np.cov(P, rowvar=False, bias=True)
    # moments are rounded to 1e-6 before eigh, so "identity" holds to
    # the tolerance that rounding propagates through the eigenvectors
    assert np.allclose(C, np.eye(6), atol=1e-2)
    assert np.allclose(np.abs(P.mean(axis=0)), 0, atol=1e-6)


class TestLandmarkProjection:
    def test_matches_numpy_spec(self, spark, sf_dir):
        from parlerproject_spark.operators.pca import (landmark_anchors,
                                                       landmark_projection)
        emb = load_table(spark, "embeddings", sf_dir)
        anchors = landmark_anchors(emb, n_anchors=4)
        assert len(anchors) == 4
        A = np.array([v for _, v in anchors])
        rows = landmark_projection(emb, n_anchors=4).orderBy("vec_id") \
            .limit(50).collect()
        for r in rows:
            v = np.array(
                emb.filter(emb.vec_id == r["vec_id"])
                .collect()[0]["embedding"], dtype=np.float64)
            for j in range(4):
                num = float((v * A[j]).sum())
                den = float(np.linalg.norm(v) * np.linalg.norm(A[j]))
                raw = num / den if den > 0 else 0.0
                exp = (np.floor(raw * 1e6 + 0.5) / 1e6 if raw >= 0
                       else np.ceil(raw * 1e6 - 0.5) / 1e6)
                assert r["proj"][j] == exp
            break  # one vector fully checked element-wise is enough here

    def test_neighborhood_preservation(self, spark):
        """The UMAP-role parity claim: cosine-NEIGHBORHOODS survive
        the projection — on data that HAS neighborhoods (clustered
        vectors; on isotropic noise there is nothing to preserve and
        no projection of any kind scores well). Two checks: Spearman
        rank correlation of pairwise cosine distances is strongly
        positive, and same-cluster pairs stay nearer in the projected
        space than cross-cluster pairs on average by a wide margin
        (the property the downstream density clusterer actually
        needs; 8 anchors cannot guarantee every single pair
        separates — neither does UMAP)."""
        from parlerproject_spark.operators.pca import landmark_projection
        rng = np.random.default_rng(13)
        centers = rng.normal(size=(4, 32)) * 3
        rows = []
        for i in range(48):
            v = centers[i % 4] + rng.normal(size=32) * 0.3
            rows.append((i, [float(x) for x in v]))
        df = spark.createDataFrame(rows,
                                   "vec_id bigint, embedding array<double>")
        orig = {i: np.array(v) for i, v in rows}
        proj = {r["vec_id"]: np.array(r["proj"], dtype=np.float64)
                for r in landmark_projection(df, n_anchors=8).collect()}
        ids = sorted(orig)

        def cosdists(vecs):
            out = []
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    a, b = vecs[ids[i]], vecs[ids[j]]
                    out.append(1 - float(a @ b)
                               / (np.linalg.norm(a) * np.linalg.norm(b)))
            return np.array(out)

        d0, d1 = cosdists(orig), cosdists(proj)
        r0 = np.argsort(np.argsort(d0)).astype(float)
        r1 = np.argsort(np.argsort(d1)).astype(float)
        rho = float(np.corrcoef(r0, r1)[0, 1])
        assert rho > 0.8, rho
        same = [(ids[i] % 4) == (ids[j] % 4)
                for i in range(len(ids)) for j in range(i + 1, len(ids))]
        same = np.array(same)
        assert d1[same].mean() * 5 < d1[~same].mean()

    def test_fit_topics_projection_wiring(self, spark, sf_dir):
        from pyspark.sql import functions as F

        from parlerproject_spark.operators.topics import fit_topics
        emb = load_table(spark, "embeddings", sf_dir).limit(200)
        docs = emb.select(emb.vec_id.alias("doc_id"),
                          F.concat(F.lit("doc "),
                                   emb.vec_id.cast("string")).alias("text"))
        doc_topics, info, words = fit_topics(
            docs, emb, k=4, max_iter=2, projection="landmark",
            projection_kwargs={"n_anchors": 4})
        out = doc_topics.collect()
        assert len(out) == 200
        assert {r["topic"] for r in out} <= set(range(4))


def test_fit_topics_projection_plus_density(spark, sf_dir):
    """The full BERTopic shape: landmark projection + density
    clustering (sampled-fit DBSCAN) — both stand-ins composed."""
    from pyspark.sql import functions as F

    from parlerproject_spark.catalog import load_table
    from parlerproject_spark.operators.topics import fit_topics

    emb = load_table(spark, "embeddings", sf_dir).limit(200)
    docs = emb.select(emb.vec_id.alias("doc_id"),
                      F.concat(F.lit("doc "),
                               emb.vec_id.cast("string")).alias("text"))
    doc_topics, info, words = fit_topics(
        docs, emb, method="density", projection="landmark",
        projection_kwargs={"n_anchors": 8},
        density_kwargs={"sample_mod": 2, "sim_threshold": 0.6,
                        "min_pts": 3, "assign_threshold": 0.3,
                        "dim": 8, "mode": "exact"})
    rows = doc_topics.collect()
    assert len(rows) == 200
    # noise label flows through; every topic is -1 or a sample id
    assert all(r["topic"] >= -1 for r in rows)
    assert info.count() >= 1


def test_projection_preserves_non_bigint_ids(spark):
    """id_col is a parameter, so the mapInPandas output schema must
    derive the id type from the input — a hardcoded bigint corrupts
    string ids (ADVICE r8). Covers both Arrow projections."""
    from parlerproject_spark.operators.pca import (landmark_projection,
                                                   pca_project)
    rows = [(f"doc-{i}", [float(i), float(i % 3), 1.0]) for i in range(12)]
    df = spark.createDataFrame(rows, "vec_id string, embedding array<double>")
    got = landmark_projection(df, n_anchors=2, id_col="vec_id",
                              vec_col="embedding").collect()
    assert sorted(r["vec_id"] for r in got) == sorted(r[0] for r in rows)
    assert all(len(r["proj"]) == 2 for r in got)
    got2 = pca_project(df, mu=[0.0, 0.0, 0.0],
                       comps=[[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]],
                       evals=[1.0, 1.0], id_col="vec_id",
                       vec_col="embedding").collect()
    assert sorted(r["vec_id"] for r in got2) == sorted(r[0] for r in rows)

def test_power_components_recover_planted_spectrum(spark):
    """power_components (the hash-oracleable twin of pca_components)
    must recover a WELL-SEPARATED spectrum exactly: planted
    orthogonal directions with variances 9 : 4 : 1 over noise."""
    import numpy as np
    from parlerproject_spark.operators.pca import power_components
    rng = np.random.default_rng(7)
    d = 16
    basis = np.linalg.qr(rng.normal(size=(d, d)))[0]
    rows = []
    for i in range(400):
        v = (3.0 * rng.normal() * basis[:, 0]
             + 2.0 * rng.normal() * basis[:, 1]
             + 1.0 * rng.normal() * basis[:, 2]
             + 0.05 * rng.normal(size=d))
        rows.append((i, [float(x) for x in v]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    mu, comps, evals = power_components(df, n_components=3)
    assert evals[0] > evals[1] > evals[2] > 0
    for r, expect_var in enumerate((9.0, 4.0, 1.0)):
        cos = abs(float(np.dot(comps[r], basis[:, r])))
        assert cos > 0.99, (r, cos)
        assert abs(evals[r] / expect_var - 1.0) < 0.25, (r, evals[r])
    G = comps @ comps.T
    assert np.allclose(G, np.eye(3), atol=1e-3)


def test_power_components_flat_spectrum_self_consistent(spark, sf_dir):
    """On the real (nearly flat-spectrum) embeddings the power twin
    cannot pin individual eigenvectors — but it must stay self-
    consistent: every eigenvalue inside the top-of-spectrum band,
    total captured variance matching eigh, components near-orthonormal,
    and the rounded mean agreeing with the eigh path's mean (the
    tight per-component claims live in the planted-spectrum test
    above — a flat spectrum has no per-component ground truth)."""
    import numpy as np
    from parlerproject_spark.catalog import load_table
    from parlerproject_spark.operators.pca import (pca_components,
                                                   power_components)
    emb = load_table(spark, "embeddings", sf_dir)
    mu_e, comps_e, evals_e = pca_components(emb, n_components=4)
    mu_p, comps_p, evals_p = power_components(emb, n_components=4)
    assert np.allclose(mu_p, mu_e, atol=1e-5)
    # a flat spectrum gives deflation no gap to bite on: individual
    # order can wobble, but every Rayleigh quotient must sit inside
    # the top-of-spectrum band and capture the same total variance
    _, _, evals_wide = pca_components(emb, n_components=6)
    assert evals_p.min() >= evals_wide[5] - 1e-3
    assert evals_p.max() <= evals_wide[0] + 1e-3
    assert abs(evals_p.sum() / evals_e[:4].sum() - 1.0) < 0.05
    # near-orthogonal (leak scales with the inverse gap; bounded)
    G = comps_p @ comps_p.T
    assert np.allclose(G, np.eye(4), atol=0.05)
    # unit-norm rows regardless of gaps
    assert np.allclose(np.diag(G), 1.0, atol=1e-3)
