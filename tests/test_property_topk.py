"""Hypothesis property tests: the exact-recall guarantee of every search
path against a float64 oracle, over adversarial generated inputs
(duplicates, ties, tiny/degenerate shapes, extreme values)."""

import numpy as np
from hypothesis import given, settings, strategies as st

from evossearch_tpu.index import exact_search
from evossearch_tpu.index.search import exact_search_host


def _oracle(emb, q, k):
    scores = emb.astype(np.float64) @ q.astype(np.float64)
    order = np.lexsort((np.arange(len(scores)), -scores))
    return order[:k]


@st.composite
def corpus_and_query(draw):
    n = draw(st.integers(1, 400))
    d = draw(st.sampled_from([4, 16, 64]))
    seed = draw(st.integers(0, 2**31 - 1))
    rng = np.random.default_rng(seed)
    emb = rng.standard_normal((n, d)).astype(np.float32)
    # inject duplicates / ties with some probability
    if draw(st.booleans()) and n > 4:
        src = rng.integers(0, n, size=n // 3)
        dst = rng.integers(0, n, size=n // 3)
        emb[dst] = emb[src]
    if draw(st.booleans()):
        emb[: n // 2] = 0.0  # zero rows -> massive score ties
    q = rng.standard_normal(d).astype(np.float32)
    k = draw(st.integers(1, min(64, n)))
    return emb, q, k


def _check(emb, q, k, idx, scores):
    """Exactness modulo f32 arithmetic: the implementation computes scores
    in float32, the oracle in float64 — indices may legitimately differ
    where f64 scores are within f32 noise of each other. Assertions:
      * returned scores are sorted descending;
      * the returned set's f64 scores match the oracle top-k's f64 scores
        to f32 tolerance (no genuinely-better row was missed);
      * indices match the oracle exactly wherever the oracle's ranking has
        a margin above f32 noise. (The lowest-index tie contract on EXACT
        ties is pinned separately by the adversarial-tie tests in
        test_search.py / test_topk_pallas.py / test_sharded_search.py.)
    """
    s64 = emb.astype(np.float64) @ q.astype(np.float64)
    oracle = _oracle(emb, q, k)
    idx = np.asarray(idx)
    assert (np.diff(scores) <= 1e-6).all()
    np.testing.assert_allclose(s64[idx], s64[oracle], atol=1e-4)
    tol = 1e-4 * max(1.0, np.abs(s64).max())
    for rank in range(k):
        prev_gap = s64[oracle[rank - 1]] - s64[oracle[rank]] if rank else np.inf
        next_gap = (
            s64[oracle[rank]] - s64[oracle[rank + 1]] if rank + 1 < len(s64)
            and rank + 1 < len(oracle) else np.inf
        )
        if prev_gap > tol and next_gap > tol:
            assert idx[rank] == oracle[rank], (rank, idx, oracle)


@settings(max_examples=40, deadline=None)
@given(corpus_and_query())
def test_device_exact_search_matches_oracle(data):
    emb, q, k = data
    scores, idx = exact_search(emb, q, k)
    _check(emb, q, k, idx, scores)


@settings(max_examples=25, deadline=None)
@given(corpus_and_query())
def test_host_scan_matches_oracle(data):
    emb, q, k = data
    scores, idx = exact_search_host(emb, q, k)
    _check(emb, q, k, idx, scores)
