"""Round-3 fixes (VERDICT.md round 2).

Covers: the bucket-padded uncertified-row fallback (weak #5 — a fresh jit
specialization per distinct failure count was a latent compile storm).
"""

import numpy as np
import pytest

import evossearch_tpu.index.search as search_mod
from evossearch_tpu.index.search import (
    _topk_batch,
    _unpack_with_fallback,
    gather_query_rows,
    query_row_bucket,
)


def test_query_row_bucket_ladder():
    assert query_row_bucket(1) == 1
    assert query_row_bucket(2) == 8
    assert query_row_bucket(8) == 8
    assert query_row_bucket(9) == 64
    assert query_row_bucket(64) == 64
    assert query_row_bucket(65) == 128
    assert query_row_bucket(128) == 128
    assert query_row_bucket(129) == 256
    assert query_row_bucket(300) == 512


def test_gather_query_rows_pads_with_first_row():
    rng = np.random.default_rng(0)
    q = rng.standard_normal((10, 16)).astype(np.float32)
    sub, n = gather_query_rows(q, np.array([3, 7]))
    assert n == 2
    assert sub.shape == (8, 16)  # bucket for 2 failures
    np.testing.assert_array_equal(np.asarray(sub[0]), q[3])
    np.testing.assert_array_equal(np.asarray(sub[1]), q[7])
    for row in range(2, 8):  # pad rows repeat the first failed row
        np.testing.assert_array_equal(np.asarray(sub[row]), q[3])


def _packed_with_failures(emb, queries, k, fail_rows):
    """True packed result with `fail_rows` marked uncertified and their
    scores/indices garbled — the fallback must repair exactly those."""
    import jax.numpy as jnp

    s, i = (np.asarray(x) for x in _topk_batch(
        jnp.asarray(emb), jnp.asarray(queries), k
    ))
    s, i = s.copy(), i.copy()
    ok = np.ones((len(queries), 1), np.float32)
    ok[fail_rows] = 0.0
    s[fail_rows] = -1.0
    i[fail_rows] = 0
    return np.concatenate([s, i.astype(np.float32), ok], axis=1), s, i


def test_fallback_repairs_only_uncertified_rows():
    rng = np.random.default_rng(1)
    emb = rng.standard_normal((500, 32)).astype(np.float32)
    queries = rng.standard_normal((10, 32)).astype(np.float32)
    k = 5
    packed, _, _ = _packed_with_failures(emb, queries, k, [2, 5, 9])
    s, i = _unpack_with_fallback(packed, emb, queries, k)
    import jax.numpy as jnp

    es, ei = (np.asarray(x) for x in _topk_batch(
        jnp.asarray(emb), jnp.asarray(queries), k
    ))
    np.testing.assert_allclose(s, es, rtol=1e-6)
    np.testing.assert_array_equal(i, ei)


def test_fallback_compiles_are_bucket_bounded():
    """Every distinct failure count from 1..10 must reuse at most the
    ladder's bucket programs (1, 8, 64) — not one program per count."""
    rng = np.random.default_rng(2)
    emb = rng.standard_normal((300, 16)).astype(np.float32)
    queries = rng.standard_normal((10, 16)).astype(np.float32)
    k = 4
    # Warm the non-fallback shapes out of the way.
    _packed = _packed_with_failures(emb, queries, k, [0])[0]
    _unpack_with_fallback(_packed, emb, queries, k)
    before = _topk_batch._cache_size()
    for nfail in range(1, 11):
        packed, _, _ = _packed_with_failures(emb, queries, k, list(range(nfail)))
        s, i = _unpack_with_fallback(packed, emb, queries, k)
        assert (s >= -0.5).all()  # garbled rows were repaired
    grown = _topk_batch._cache_size() - before
    # counts 2..8 share bucket 8, counts 9..10 share bucket 64; bucket 1
    # was compiled in the warmup call
    assert grown <= 2, f"fallback compiled {grown} fresh programs"
