"""Single-device exact top-k search over an embedding matrix.

Replaces FAISS ``IndexFlatIP.search`` (reference oldapp.py:2005, 2112):
embeddings are L2-normalized at encode time, so inner product == cosine,
and exact top-k is one (N, d) x (d,) matvec plus a top-k selection. On TPU
the matvec rides the MXU and ``lax.top_k`` runs fused on device — this is
the baseline the Pallas streaming kernel (ops/) must beat.

Determinism contract: ties broken by LOWER row index (jax.lax.top_k is
stable in that sense; property-tested in tests/test_search.py), which the
multi-chip merge in parallel/ relies on to make sharded results bit-equal
to single-device results.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


# Rows per block for the two-stage top-k. A flat lax.top_k over millions of
# scores is a full selection over one huge vector; reshaping to (G, BLOCK)
# and running per-block top-k (one small, well-tiled selection per row)
# followed by a merge over G*k candidates is exact and far faster on TPU.
_BLOCK = 4096


def blocked_top_k(scores: jax.Array, k: int) -> tuple[jax.Array, jax.Array]:
    """Exact top-k over a 1-D score vector via block-then-merge.

    Tie contract preserved: per-block top_k favors lower in-block index and
    blocks are concatenated in order, so the stable final top_k yields
    ascending global indices for equal scores — identical to flat top_k.
    """
    n = scores.shape[0]
    if n <= _BLOCK or k >= _BLOCK:
        return jax.lax.top_k(scores, k)
    g = -(-n // _BLOCK)
    pad = g * _BLOCK - n
    if pad:
        scores = jnp.concatenate(
            [scores, jnp.full((pad,), -jnp.inf, scores.dtype)]
        )
    blocks = scores.reshape(g, _BLOCK)
    bs, bi = jax.lax.top_k(blocks, k)  # (g, k) per-block candidates
    gidx = bi + (jnp.arange(g, dtype=bi.dtype) * _BLOCK)[:, None]
    fs, fp = jax.lax.top_k(bs.reshape(-1), k)
    return fs, gidx.reshape(-1)[fp]


@functools.partial(jax.jit, static_argnames=("k",))
def _topk_matvec(emb: jax.Array, query: jax.Array, k: int):
    scores = jnp.dot(
        emb, query.astype(emb.dtype), preferred_element_type=jnp.float32
    )
    return blocked_top_k(scores, k)


def exact_search(emb, query: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
    """Exact top-k by inner product.

    emb: (N, d) device or host array (f32/bf16). query: (d,) float32.
    Returns (scores (k,), indices (k,)) sorted by descending score —
    the same contract as FAISS index.search with a single query row.
    """
    n = emb.shape[0]
    k = min(k, n)
    if k == 0:
        return np.zeros((0,), np.float32), np.zeros((0,), np.int64)
    scores, idx = _topk_matvec(jnp.asarray(emb), jnp.asarray(query), k)
    return np.asarray(scores), np.asarray(idx)


@functools.partial(jax.jit, static_argnames=("k",))
def _topk_batch(emb: jax.Array, queries: jax.Array, k: int):
    scores = jnp.dot(
        queries.astype(emb.dtype), emb.T, preferred_element_type=jnp.float32
    )
    return jax.vmap(lambda s: blocked_top_k(s, k))(scores)


def exact_search_host(emb: np.ndarray, query: np.ndarray, k: int):
    """Exact top-k on the HOST via the native C++ scanner (threaded, zero-
    copy over np.memmap shards). Fallback engine when no accelerator is
    present and the verification oracle for the device paths; same tie
    contract. Falls back to numpy when the extension isn't built."""
    from ..preprocess.io import get_native

    emb = np.ascontiguousarray(emb, dtype=np.float32)
    query = np.ascontiguousarray(query, dtype=np.float32)
    n, d = emb.shape
    k = min(k, n)
    if k == 0:
        return np.zeros((0,), np.float32), np.zeros((0,), np.int64)
    native = get_native()
    if native is not None:
        scores, idx = native.topk(emb.data, n, d, query.data, k)
        return np.asarray(scores, np.float32), np.asarray(idx, np.int64)
    scores = emb @ query
    order = np.lexsort((np.arange(n), -scores))[:k]
    return scores[order].astype(np.float32), order.astype(np.int64)


def exact_search_batch(emb, queries: np.ndarray, k: int):
    """Batched exact top-k: queries (Q, d) -> (scores (Q,k), indices (Q,k))."""
    n = emb.shape[0]
    k = min(k, n)
    if k == 0:
        q = np.asarray(queries).shape[0]
        return np.zeros((q, 0), np.float32), np.zeros((q, 0), np.int64)
    scores, idx = _topk_batch(jnp.asarray(emb), jnp.asarray(queries), k)
    return np.asarray(scores), np.asarray(idx)
