"""Pallas fused top-k kernel vs the jnp oracle (interpret mode on CPU;
compiled-mode perf is exercised by bench.py on the TPU).

Exact-recall property tests per SURVEY.md §4.2: random matrices, adversarial
ties, ragged tails, unnormalized queries (kernel fuses the L2 normalize).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from evossearch_tpu.ops import fused_topk


def _oracle(emb, q, k):
    qn = q / np.linalg.norm(q)
    scores = emb.astype(np.float64) @ qn.astype(np.float64)
    order = np.lexsort((np.arange(len(scores)), -scores))
    return scores[order[:k]].astype(np.float32), order[:k]


@pytest.mark.parametrize("n,d,k,block", [
    (1000, 64, 10, 256),
    (4096, 128, 48, 512),
    (777, 128, 48, 256),     # ragged tail, k*? > n/block
    (300, 128, 48, 256),     # two tiles, k close to tile size region
])
def test_matches_oracle(n, d, k, block):
    rng = np.random.default_rng(n)
    emb = rng.standard_normal((n, d)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    q = rng.standard_normal(d).astype(np.float32) * 3.0  # unnormalized
    s, i = fused_topk(jnp.asarray(emb), jnp.asarray(q), k,
                      block_rows=block, interpret=True)
    os_, oi = _oracle(emb, q, k)
    np.testing.assert_array_equal(np.asarray(i), oi)
    np.testing.assert_allclose(np.asarray(s), os_, atol=1e-5)


def test_adversarial_ties():
    emb = np.tile(np.eye(8, dtype=np.float32)[0], (512, 1))
    q = np.eye(8, dtype=np.float32)[0]
    s, i = fused_topk(jnp.asarray(emb), jnp.asarray(q), 16,
                      block_rows=128, interpret=True)
    np.testing.assert_array_equal(np.asarray(i), np.arange(16))
    np.testing.assert_allclose(np.asarray(s), 1.0, atol=1e-6)


def test_ascending_scores_worst_case():
    # every tile beats the previous threshold -> merge on every tile
    n, d = 2048, 32
    emb = np.zeros((n, d), np.float32)
    emb[:, 0] = np.linspace(0.0, 1.0, n)  # strictly ascending
    q = np.eye(d, dtype=np.float32)[0]
    s, i = fused_topk(jnp.asarray(emb), jnp.asarray(q), 8,
                      block_rows=256, interpret=True)
    np.testing.assert_array_equal(np.asarray(i), np.arange(n - 1, n - 9, -1))


def test_all_negative_scores():
    rng = np.random.default_rng(3)
    emb = -np.abs(rng.standard_normal((500, 32))).astype(np.float32)
    q = np.abs(rng.standard_normal(32)).astype(np.float32)
    s, i = fused_topk(jnp.asarray(emb), jnp.asarray(q), 10,
                      block_rows=128, interpret=True)
    os_, oi = _oracle(emb, q, 10)
    np.testing.assert_array_equal(np.asarray(i), oi)


def test_bfloat16_matrix():
    rng = np.random.default_rng(4)
    emb = rng.standard_normal((1024, 64)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    q = emb[100].copy()
    s, i = fused_topk(jnp.asarray(emb, jnp.bfloat16), jnp.asarray(q), 5,
                      block_rows=256, interpret=True)
    assert int(np.asarray(i)[0]) == 100
