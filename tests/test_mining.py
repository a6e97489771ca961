"""Contrastive hard-negative mining (operators/mining.py)."""

from __future__ import annotations

import numpy as np
import pytest

from parlerproject_spark.catalog import load_table
from parlerproject_spark.operators.mining import hard_negatives


def _reference_mine(rows, k, sim_lo=None, sim_hi=None):
    """Single-node numpy re-derivation of the deterministic spec:
    round(6) before band + ranking, ties on candidate id."""
    ids = [r[0] for r in rows]
    V = {r[0]: np.array(r[1]) for r in rows}
    G = {r[0]: r[2] for r in rows}
    out = {}
    for a in ids:
        cands = []
        for b in ids:
            if b == a or G[b] == G[a]:
                continue
            s = round(float(V[a] @ V[b]
                            / (np.linalg.norm(V[a]) * np.linalg.norm(V[b]))),
                      6)
            if sim_lo is not None and s < sim_lo:
                continue
            if sim_hi is not None and s >= sim_hi:
                continue
            cands.append((-s, b))
        cands.sort()
        out[a] = [(b, -ns, i + 1) for i, (ns, b) in enumerate(cands[:k])]
    return out


def _fixture_rows():
    rng = np.random.default_rng(11)
    rows = []
    for i in range(30):
        base = np.zeros(6)
        base[i % 3] = 1.0           # three groups along three axes
        v = base + rng.normal(0, 0.3, 6)
        rows.append((i, [float(x) for x in v], i % 3))
    return rows


def test_hard_negatives_exact_matches_reference(spark):
    rows = _fixture_rows()
    df = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    got = {}
    for r in hard_negatives(df, k=3, sim_hi=0.999).collect():
        got.setdefault(r["anchor_id"], []).append(
            (r["neg_id"], r["sim"], r["rank"]))
    for a in got:
        got[a].sort(key=lambda t: t[2])
    want = _reference_mine(rows, 3, sim_hi=0.999)
    want = {a: [(b, pytest.approx(s, abs=2e-6), rk) for b, s, rk in v]
            for a, v in want.items() if v}
    assert set(got) == set(want)
    for a in want:
        assert [t[0] for t in got[a]] == [t[0] for t in want[a]]
        assert [t[2] for t in got[a]] == [t[2] for t in want[a]]


def test_hard_negatives_never_same_group(spark, sf_dir):
    emb = load_table(spark, "embeddings", sf_dir)
    labels = {r["vec_id"]: r["label"] for r in
              emb.select("vec_id", "label").collect()}
    for r in hard_negatives(emb, k=5, sim_hi=0.98).collect():
        assert labels[r["anchor_id"]] != labels[r["neg_id"]]
        assert r["sim"] < 0.98
        assert 1 <= r["rank"] <= 5


def test_hard_negatives_cell_mode_recall(spark, sf_dir):
    """Cell-probed candidates ⊆ exact; with generous nprobe the
    selected pair set should recover most of the exact top-k."""
    emb = load_table(spark, "embeddings", sf_dir)
    exact = {(r["anchor_id"], r["neg_id"])
             for r in hard_negatives(emb, k=5, sim_hi=0.98,
                                     mode="exact").collect()}
    cell = {(r["anchor_id"], r["neg_id"])
            for r in hard_negatives(emb, k=5, sim_hi=0.98, mode="cell",
                                    num_cells=8, nprobe=4).collect()}
    # every cell-mode pair is a legal pair (band + different group is
    # enforced identically), and recall is meaningful
    recall = len(cell & exact) / len(exact)
    assert recall >= 0.5, f"recall {recall:.2f}"


def test_hard_negatives_band_floor(spark):
    rows = _fixture_rows()
    df = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    out = hard_negatives(df, k=10, sim_lo=0.2, sim_hi=0.9).collect()
    assert out
    for r in out:
        assert 0.2 <= r["sim"] < 0.9


def test_hard_negatives_bad_mode(spark):
    rows = _fixture_rows()
    df = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    with pytest.raises(ValueError):
        hard_negatives(df, k=3, mode="nope")
