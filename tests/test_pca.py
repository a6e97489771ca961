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
