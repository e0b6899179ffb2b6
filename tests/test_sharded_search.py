"""Sharded search on a forced 8-device CPU mesh: bit-identity with the
single-device path, including adversarial ties and ragged tail shards
(SURVEY.md §4.3)."""

import jax
import numpy as np
import pytest

from evossearch_tpu.index import exact_search
from evossearch_tpu.parallel import ShardedIndex, corpus_mesh


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, "conftest must force 8 CPU devices"
    return corpus_mesh()


def _check_identical(matrix, query, k, mesh):
    s_scores, s_idx = exact_search(matrix, query, k)
    sh = ShardedIndex.from_matrix(matrix, mesh=mesh)
    d_scores, d_idx = sh.search(query, k)
    np.testing.assert_array_equal(d_idx, s_idx)
    np.testing.assert_allclose(d_scores, s_scores, atol=1e-6)


def test_matches_single_device(mesh):
    rng = np.random.default_rng(0)
    matrix = rng.standard_normal((1000, 64)).astype(np.float32)
    matrix /= np.linalg.norm(matrix, axis=1, keepdims=True)
    query = rng.standard_normal(64).astype(np.float32)
    _check_identical(matrix, query, 48, mesh)


def test_ragged_tail_shard(mesh):
    rng = np.random.default_rng(1)
    # 1003 rows over 8 shards -> rows_per_shard 126, last shard 121 valid
    matrix = rng.standard_normal((1003, 32)).astype(np.float32)
    query = rng.standard_normal(32).astype(np.float32)
    _check_identical(matrix, query, 20, mesh)


def test_adversarial_ties_bit_identical(mesh):
    # 256 identical rows: every score ties; contract = lowest global indices
    matrix = np.tile(np.eye(8, dtype=np.float32)[0], (256, 1))
    query = np.eye(8, dtype=np.float32)[0]
    sh = ShardedIndex.from_matrix(matrix, mesh=mesh)
    scores, idx = sh.search(query, 10)
    np.testing.assert_array_equal(idx, np.arange(10))
    np.testing.assert_allclose(scores, 1.0)


def test_tiny_corpus_smaller_than_k_times_shards(mesh):
    rng = np.random.default_rng(2)
    matrix = rng.standard_normal((5, 16)).astype(np.float32)  # < 8 shards
    query = rng.standard_normal(16).astype(np.float32)
    _check_identical(matrix, query, 5, mesh)


def test_k_clamped(mesh):
    rng = np.random.default_rng(3)
    matrix = rng.standard_normal((10, 16)).astype(np.float32)
    sh = ShardedIndex.from_matrix(matrix, mesh=mesh)
    scores, idx = sh.search(rng.standard_normal(16).astype(np.float32), 48)
    assert len(scores) == 10


def test_negative_scores_not_beaten_by_padding(mesh):
    # all-negative scores: padded (zero) rows would win if not masked
    rng = np.random.default_rng(4)
    matrix = -np.abs(rng.standard_normal((37, 16))).astype(np.float32)
    query = np.abs(rng.standard_normal(16)).astype(np.float32)
    _check_identical(matrix, query, 10, mesh)
    sh = ShardedIndex.from_matrix(matrix, mesh=mesh)
    scores, idx = sh.search(query, 10)
    assert (idx < 37).all()
    assert (scores < 0).all()


def test_batched_queries_match_single(mesh):
    rng = np.random.default_rng(6)
    matrix = rng.standard_normal((777, 32)).astype(np.float32)
    queries = rng.standard_normal((5, 32)).astype(np.float32)
    sh = ShardedIndex.from_matrix(matrix, mesh=mesh)
    bs, bi = sh.search_batch(queries, 12)
    for row in range(5):
        s1, i1 = exact_search(matrix, queries[row], 12)
        np.testing.assert_array_equal(bi[row], i1)
        np.testing.assert_allclose(bs[row], s1, atol=1e-6)


def test_bfloat16_corpus(mesh):
    import ml_dtypes

    rng = np.random.default_rng(5)
    matrix = rng.standard_normal((500, 32)).astype(np.float32)
    matrix /= np.linalg.norm(matrix, axis=1, keepdims=True)
    bf = matrix.astype(ml_dtypes.bfloat16)
    query = matrix[123]
    sh = ShardedIndex.from_matrix(bf, mesh=mesh)
    scores, idx = sh.search(query, 5)
    assert idx[0] == 123


class TestCertifiedShardedPath:
    """The per-shard certified ApproxTopK path (CERT_MIN_SHARD_ROWS
    lowered so the tiny CPU mesh exercises it)."""

    @pytest.fixture(autouse=True)
    def _low_threshold(self, monkeypatch):
        from evossearch_tpu.parallel import sharded_search as ss

        monkeypatch.setattr(ss, "CERT_MIN_SHARD_ROWS", 8)

    def test_matches_single_device_batched(self, mesh):
        from evossearch_tpu.index import exact_search_batch

        rng = np.random.default_rng(7)
        for n, d, q, k in ((4096, 64, 5, 48), (1003, 32, 3, 20),
                           (999, 128, 1, 64)):
            matrix = rng.standard_normal((n, d)).astype(np.float32)
            matrix /= np.linalg.norm(matrix, axis=1, keepdims=True)
            queries = rng.standard_normal((q, d)).astype(np.float32)
            sh = ShardedIndex.from_matrix(matrix, mesh=mesh)
            ds, di = sh.search_batch(queries, k)
            es, ei = exact_search_batch(matrix, queries, k)
            np.testing.assert_array_equal(di, ei)
            np.testing.assert_allclose(ds, es, atol=1e-6)

    def test_adversarial_ties_fall_back_and_stay_exact(self, mesh):
        # Mass ties defeat both certificates -> per-query exact fallback
        # must fire and the result must still honor the tie contract.
        matrix = np.tile(np.eye(8, dtype=np.float32)[0], (1024, 1))
        queries = np.tile(np.eye(8, dtype=np.float32)[0], (3, 1))
        sh = ShardedIndex.from_matrix(matrix, mesh=mesh)
        scores, idx = sh.search_batch(queries, 10)
        for row in range(3):
            np.testing.assert_array_equal(idx[row], np.arange(10))
            np.testing.assert_allclose(scores[row], 1.0)

    def test_certified_used_and_certifies_on_random_data(self, mesh):
        # On tie-free data the certificates should pass (no fallback);
        # detect by monkeypatching the blocked path to fail loudly.
        from evossearch_tpu.parallel import sharded_search as ss

        rng = np.random.default_rng(9)
        matrix = rng.standard_normal((2048, 64)).astype(np.float32)
        queries = rng.standard_normal((4, 64)).astype(np.float32)
        sh = ShardedIndex.from_matrix(matrix, mesh=mesh)

        def boom(*a, **kw):  # pragma: no cover - failure path
            raise AssertionError("exact fallback fired on tie-free data")

        import unittest.mock as mock
        with mock.patch.object(ss, "_sharded_topk_jit", boom):
            ds, di = sh.search_batch(queries, 16)
        from evossearch_tpu.index import exact_search_batch

        es, ei = exact_search_batch(matrix, queries, 16)
        np.testing.assert_array_equal(di, ei)


def test_from_reader_equals_from_matrix(tmp_path):
    """Mmap-direct placement (per-shard callbacks, no whole-corpus host
    copy) produces identical search results to from_matrix, including a
    padded tail shard and multi-file stores."""
    import numpy as np

    from evossearch_tpu.index.store import IndexReader, IndexWriter
    from evossearch_tpu.parallel import ShardedIndex

    rng = np.random.default_rng(17)
    n, d = 1003, 128  # prime-ish: tail shard padding + uneven split
    emb = rng.standard_normal((n, d)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    w = IndexWriter.create(tmp_path, model="t", dim=d, dtype_name="float32")
    paths = [f"p{i}.jpg" for i in range(n)]
    # two appends -> two shard files, exercising the cross-shard read
    w.append(emb[:600], paths[:600],
             [{"path": p, "mtime": 1.0, "size": 1} for p in paths[:600]])
    w.append(emb[600:], paths[600:],
             [{"path": p, "mtime": 1.0, "size": 1} for p in paths[600:]])
    w.finalize()
    reader = IndexReader.open(tmp_path)
    queries = rng.standard_normal((4, d)).astype(np.float32)

    a = ShardedIndex.from_reader(reader, n_devices=8)
    b = ShardedIndex.from_matrix(emb, n_devices=8)
    sa, ia = a.search_batch(queries, 15)
    sb, ib = b.search_batch(queries, 15)
    np.testing.assert_array_equal(ia, ib)
    np.testing.assert_array_equal(sa, sb)
