"""Certified ApproxTopK fast path: exactness against the blocked oracle,
certification catching adversarial tie floods, fallback correctness.

The threshold is monkeypatched low so the fast path runs on CPU test sizes
(jax.lax.approx_max_k falls back to exact top-k on CPU, so `ok` is always
certified there; the certification LOGIC is what these tests pin)."""

import numpy as np
import pytest

import evossearch_tpu.index.search as search_mod
from evossearch_tpu.index.search import exact_search, exact_search_batch


@pytest.fixture(autouse=True)
def low_threshold(monkeypatch):
    monkeypatch.setattr(search_mod, "_FAST_PATH_MIN_ROWS", 1000)


def _oracle(emb, q, k):
    scores = emb.astype(np.float64) @ q.astype(np.float64)
    order = np.lexsort((np.arange(len(scores)), -scores))
    return order[:k]


def test_fast_path_matches_oracle():
    rng = np.random.default_rng(0)
    emb = rng.standard_normal((5000, 64)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    q = rng.standard_normal(64).astype(np.float32)
    _, idx = exact_search(emb, q, 48)
    np.testing.assert_array_equal(idx, _oracle(emb, q, 48))


def test_fast_path_batch_matches_oracle():
    rng = np.random.default_rng(1)
    emb = rng.standard_normal((4000, 32)).astype(np.float32)
    queries = rng.standard_normal((6, 32)).astype(np.float32)
    s, i = exact_search_batch(emb, queries, 20)
    for row in range(6):
        np.testing.assert_array_equal(i[row], _oracle(emb, queries[row], 20))


def test_tie_flood_stays_exact():
    """More identical max-score rows than the overfetch budget: the
    certification must detect it (ok=False on TPU) or the fallback/exact
    CPU path must still deliver the lowest-index contract."""
    emb = np.tile(np.eye(8, dtype=np.float32)[0], (2048, 1))
    q = np.eye(8, dtype=np.float32)[0]
    _, idx = exact_search(emb, q, 48)
    np.testing.assert_array_equal(idx, np.arange(48))


def test_certification_flag_logic():
    """Directly exercise _certified_topk: unique scores certify ok."""
    import jax.numpy as jnp

    rng = np.random.default_rng(2)
    scores = jnp.asarray(rng.permutation(4096).astype(np.float32)[None, :])
    ok, s, i = search_mod._certified_topk(scores, 10)
    assert bool(np.asarray(ok)[0])
    np.testing.assert_array_equal(
        np.asarray(s)[0], np.arange(4095, 4085, -1, dtype=np.float32)
    )
