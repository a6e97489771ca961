"""Unigram-LM tokenizer (operators/unigram.py) vs a pure-Python
reference implementation of the same deterministic spec."""

from __future__ import annotations

import math
import re

from parlerproject_spark.operators.unigram import (_viterbi,
                                                   segment_unigram,
                                                   train_unigram)

TOKEN_RE = re.compile(r"[a-z0-9]+")


def _ref_tokenize(text):
    return TOKEN_RE.findall(text.lower())


def _ref_train(texts, *, vocab_size, n_iters, max_piece_len, n_seed):
    wf: dict[str, int] = {}
    for t in texts:
        for w in _ref_tokenize(t):
            wf[w] = wf.get(w, 0) + 1
    score: dict[str, int] = {}
    for w, n in wf.items():
        for s in range(len(w)):
            for e in range(s + 1, min(len(w), s + max_piece_len) + 1):
                p = w[s:e]
                score[p] = score.get(p, 0) + n * len(p)
    chars = {p: c for p, c in score.items() if len(p) == 1}
    multi = sorted(((p, c) for p, c in score.items() if len(p) > 1),
                   key=lambda pc: (-pc[1], pc[0]))[:n_seed]
    pool = dict(chars)
    pool.update(dict(multi))
    total0 = sum(pool.values())

    def r6(x):   # HALF_UP at 6 dp — the operator's round_c contract
        return (math.floor(x * 1e6 + 0.5) / 1e6 if x >= 0
                else math.ceil(x * 1e6 - 0.5) / 1e6)

    vocab = {p: r6(math.log(c / total0)) for p, c in pool.items()}
    for _ in range(n_iters):
        counts: dict[str, int] = {}
        for w, n in wf.items():
            seq = _viterbi(w, vocab, max_piece_len)
            if seq is None:
                continue
            for p in seq:
                counts[p] = counts.get(p, 0) + n
        kept = sorted(((p, c) for p, c in counts.items() if len(p) > 1),
                      key=lambda pc: (-pc[1], pc[0]))
        n_chars = sum(1 for p in vocab if len(p) == 1)
        kept = kept[:max(0, vocab_size - n_chars)]
        new = dict(kept)
        for p in vocab:
            if len(p) == 1:
                new[p] = max(counts.get(p, 0), 1)
        total = sum(new.values())
        vocab = {p: r6(math.log(c / total)) for p, c in new.items()}
    return sorted(vocab.items())


TEXTS = ["the cat sat on the mat", "the cats sat", "a cat and a mat",
         "mats and cats sat", "the the the cat", "a mat for cats"] * 2


def _docs(spark):
    return spark.createDataFrame(list(enumerate(TEXTS)),
                                 ["doc_id", "text"])


def test_train_matches_reference(spark):
    got = train_unigram(_docs(spark), vocab_size=30, n_iters=2,
                        max_piece_len=5, n_seed=40)
    want = _ref_train(TEXTS, vocab_size=30, n_iters=2,
                      max_piece_len=5, n_seed=40)
    assert [p for p, _ in got] == [p for p, _ in want]
    for (p, lg), (_, lw) in zip(got, want):
        assert abs(lg - lw) < 1e-12, p


def test_vocab_always_keeps_chars_and_segments_everything(spark):
    vocab = train_unigram(_docs(spark), vocab_size=20, n_iters=2,
                          max_piece_len=5, n_seed=40)
    pieces = {p for p, _ in vocab}
    alphabet = {c for t in TEXTS for c in _ref_tokenize(t) for c in c}
    assert alphabet <= pieces
    seg = segment_unigram(_docs(spark), vocab).collect()
    assert len(seg) == len(TEXTS)
    for r in seg:
        assert r["n_pieces"] >= r["n_words"] > 0   # -1 never appears


def test_viterbi_tie_breaks():
    lp = {"a": -1.0, "aa": -2.0, "b": -1.0}
    # "aa" as one piece scores -2.0; as two chars also -2.0 —
    # tie prefers FEWER pieces
    assert _viterbi("aa", lp, 4) == ["aa"]
    assert _viterbi("ab", lp, 4) == ["a", "b"]
    assert _viterbi("ax", lp, 4) is None           # OOV char


def test_bigger_vocab_never_worsens_compression(spark):
    small = dict(train_unigram(_docs(spark), vocab_size=15, n_iters=2,
                               max_piece_len=5, n_seed=40))
    big = dict(train_unigram(_docs(spark), vocab_size=60, n_iters=2,
                             max_piece_len=5, n_seed=60))
    words = {w for t in TEXTS for w in _ref_tokenize(t)}
    n_small = sum(len(_viterbi(w, small, 5)) for w in words)
    n_big = sum(len(_viterbi(w, big, 5)) for w in words)
    assert n_big <= n_small
