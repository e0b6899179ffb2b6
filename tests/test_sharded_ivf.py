"""Mesh-sharded IVF on the forced 8-device CPU mesh: full-probe equality
with the exact contract, recall at the tuned nprobe, padding/tie
semantics, bf16 buckets, and sidecar persistence (SURVEY.md §4.3)."""

import jax
import numpy as np
import pytest

from evossearch_tpu.index.search import exact_search_batch
from evossearch_tpu.parallel import ShardedIVFIndex, corpus_mesh


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, "conftest must force 8 CPU devices"
    return corpus_mesh()


def _corpus(rng, n, d, dtype=np.float32):
    m = rng.standard_normal((n, d)).astype(np.float32)
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    if dtype != np.float32:
        import ml_dtypes

        m = m.astype(ml_dtypes.bfloat16)
    return m


@pytest.fixture(scope="module")
def built(mesh):
    rng = np.random.default_rng(0)
    matrix = _corpus(rng, 4000, 64)
    idx = ShardedIVFIndex.build(
        matrix, mesh=mesh, nlist=32, bucket_factor=1.5, seed=0
    )
    return matrix, idx


def test_full_probe_equals_exact(built, mesh):
    """nprobe=nlist covers every row (buckets + spill), so the result must
    EQUAL the exact top-k under the (score desc, id asc) tie contract."""
    matrix, idx = built
    rng = np.random.default_rng(1)
    queries = rng.standard_normal((5, 64)).astype(np.float32)
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)
    es, ei = exact_search_batch(matrix, queries, 10)
    s, i = idx.search_batch(queries, 10, nprobe=idx.nlist)
    np.testing.assert_array_equal(i, ei)
    np.testing.assert_allclose(s, es, atol=1e-5)


def test_tuned_recall(built):
    matrix, idx = built
    assert 1 <= idx.tuned_nprobe <= idx.nlist
    rng = np.random.default_rng(2)
    queries = rng.standard_normal((16, 64)).astype(np.float32)
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)
    _, ei = exact_search_batch(matrix, queries, 10)
    _, ai = idx.search_batch(queries, 10)  # auto nprobe
    hits = sum(
        len(set(ai[q].tolist()) & set(ei[q].tolist())) for q in range(16)
    )
    assert hits / ei.size >= 0.9  # calibrated for 0.995; 0.9 = test floor


def test_batch_beyond_chunk(built):
    """Q > _CHUNK exercises the lax.map path; row results must equal the
    same rows searched in a small batch."""
    matrix, idx = built
    rng = np.random.default_rng(3)
    queries = rng.standard_normal((20, 64)).astype(np.float32)
    s_all, i_all = idx.search_batch(queries, 5, nprobe=4)
    s_one, i_one = idx.search_batch(queries[7:8], 5, nprobe=4)
    np.testing.assert_array_equal(i_all[7:8], i_one)
    np.testing.assert_allclose(s_all[7:8], s_one, atol=1e-6)


def test_no_duplicate_ids_and_sorted(built):
    matrix, idx = built
    rng = np.random.default_rng(4)
    q = rng.standard_normal(64).astype(np.float32)
    s, i = idx.search(q, 20)
    assert len(set(i.tolist())) == len(i)
    assert all(i >= 0)
    # (score desc, id asc): scores non-increasing; ties by ascending id
    for a in range(len(s) - 1):
        assert s[a] > s[a + 1] or (s[a] == s[a + 1] and i[a] < i[a + 1])


def test_adversarial_ties_lowest_ids(mesh):
    """All-identical rows: every score ties; the merge must surface the
    lowest global ids (the shared exact-tie contract)."""
    matrix = np.tile(np.eye(8, dtype=np.float32)[0], (400, 1))
    idx = ShardedIVFIndex.build(
        matrix, mesh=mesh, nlist=4, seed=0, tune_target=None
    )
    s, i = idx.search(np.eye(8, dtype=np.float32)[0], 10, nprobe=idx.nlist)
    np.testing.assert_array_equal(i, np.arange(10))
    np.testing.assert_allclose(s, 1.0, atol=1e-6)


def test_tiny_corpus_padding(mesh):
    """n < devices and n < k: empty shards and -1 padding must be dropped
    by search(); search_batch keeps the padded layout."""
    matrix = _corpus(np.random.default_rng(5), 5, 16)
    idx = ShardedIVFIndex.build(
        matrix, mesh=mesh, nlist=2, seed=0, tune_target=None
    )
    q = np.asarray(matrix[0], np.float32)
    s, i = idx.search(q, 48, nprobe=idx.nlist)
    assert len(i) == 5 and len(set(i.tolist())) == 5
    assert i[0] == 0  # the query's own row wins


def test_bf16_buckets(mesh):
    import ml_dtypes

    rng = np.random.default_rng(6)
    matrix = _corpus(rng, 2000, 64, dtype=ml_dtypes.bfloat16)
    idx = ShardedIVFIndex.build(
        matrix, mesh=mesh, nlist=16, seed=0, tune_target=None
    )
    assert idx.buckets.dtype == jax.numpy.bfloat16
    q = rng.standard_normal(64).astype(np.float32)
    q /= np.linalg.norm(q)
    s, i = idx.search(q, 10, nprobe=idx.nlist)
    # full probe == exact over the same bf16 store
    es, ei = exact_search_batch(matrix, q[None], 10)
    np.testing.assert_array_equal(i, ei[0])


def test_save_load_roundtrip(built, mesh, tmp_path):
    matrix, idx = built
    path = tmp_path / "ivf_mesh.npz"
    idx.save(path)
    loaded = ShardedIVFIndex.load(path, mesh=mesh)
    assert loaded is not None
    assert (loaded.n, loaded.nlist, loaded.tuned_nprobe) == (
        idx.n, idx.nlist, idx.tuned_nprobe
    )
    rng = np.random.default_rng(7)
    q = rng.standard_normal(64).astype(np.float32)
    s0, i0 = idx.search(q, 12)
    s1, i1 = loaded.search(q, 12)
    np.testing.assert_array_equal(i0, i1)
    np.testing.assert_allclose(s0, s1, atol=1e-6)


def test_load_rejects_mesh_size_mismatch(built, tmp_path):
    matrix, idx = built
    path = tmp_path / "ivf_mesh.npz"
    idx.save(path)
    small = corpus_mesh(n_devices=4)
    assert ShardedIVFIndex.load(path, mesh=small) is None


def test_load_rejects_garbage(tmp_path, mesh):
    p = tmp_path / "bad.npz"
    p.write_bytes(b"not an npz")
    assert ShardedIVFIndex.load(p, mesh=mesh) is None
