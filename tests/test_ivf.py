"""IVF approximate index: recall vs exact, spill safety, FAISS-shaped
contract (BASELINE config 5)."""

import numpy as np
import pytest

from evossearch_tpu.index import exact_search
from evossearch_tpu.index.ivf import IVFIndex


def _clustered_corpus(n=20_000, d=64, n_clusters=100, seed=0):
    """Synthetic photo-library-like corpus: clustered on the sphere."""
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((n_clusters, d))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    assign = rng.integers(0, n_clusters, n)
    emb = centers[assign] + 0.15 * rng.standard_normal((n, d))
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    return emb.astype(np.float32)


@pytest.fixture(scope="module")
def corpus():
    return _clustered_corpus()


@pytest.fixture(scope="module")
def ivf(corpus):
    return IVFIndex.build(corpus, nlist=128, iters=8)


def test_recall_at_48(corpus, ivf):
    rng = np.random.default_rng(1)
    recalls = []
    for qi in range(20):
        base = corpus[rng.integers(len(corpus))]
        q = base + 0.1 * rng.standard_normal(corpus.shape[1]).astype(np.float32)
        q /= np.linalg.norm(q)
        _, exact_idx = exact_search(corpus, q, 48)
        _, approx_idx = ivf.search(q, 48, nprobe=32)
        recalls.append(len(set(exact_idx.tolist()) & set(approx_idx.tolist())) / 48)
    mean_recall = float(np.mean(recalls))
    assert mean_recall >= 0.99, mean_recall


def test_full_probe_equals_exact(corpus, ivf):
    """nprobe == nlist must reproduce the exact result set."""
    rng = np.random.default_rng(2)
    q = rng.standard_normal(corpus.shape[1]).astype(np.float32)
    q /= np.linalg.norm(q)
    es, ei = exact_search(corpus, q, 20)
    as_, ai = ivf.search(q, 20, nprobe=ivf.nlist)
    assert set(ei.tolist()) == set(ai.tolist())
    np.testing.assert_allclose(np.sort(as_), np.sort(es), atol=1e-5)


def test_spill_rows_always_found():
    """With bucket_factor < 1 most rows spill; recall must still be exact
    for spilled vectors (they are scanned exactly)."""
    rng = np.random.default_rng(3)
    emb = rng.standard_normal((500, 32)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    ivf = IVFIndex.build(emb, nlist=4, bucket_factor=0.1, iters=3)
    assert ivf.spill.shape[0] > 0
    q = emb[250]
    _, idx = ivf.search(q, 1, nprobe=1)
    assert int(idx[0]) == 250  # top-1 self-hit regardless of bucket placement


def test_scores_descending_and_valid_ids(corpus, ivf):
    rng = np.random.default_rng(4)
    q = rng.standard_normal(corpus.shape[1]).astype(np.float32)
    s, i = ivf.search(q, 48, nprobe=8)
    assert len(s) == 48
    assert (np.diff(s) <= 1e-6).all()
    assert ((i >= 0) & (i < len(corpus))).all()
    assert len(set(i.tolist())) == 48  # no duplicates


def test_tiny_corpus():
    emb = np.eye(8, dtype=np.float32)[:5]
    ivf = IVFIndex.build(emb, nlist=2, iters=2)
    s, i = ivf.search(emb[3], 5, nprobe=2)
    assert int(i[0]) == 3
    assert len(s) == 5


def test_bf16_buckets_roundtrip_and_recall(corpus, tmp_path):
    """bf16 corpora build bf16 buckets/spill (half the IVF HBM; the
    engine passes the store dtype straight through) with f32 score math;
    the dtype survives npz save/load bit-exactly and recall@48 vs the
    exact scan of the same bf16 corpus stays at the >=0.99 contract."""
    import jax.numpy as jnp
    import ml_dtypes

    emb16 = corpus.astype(ml_dtypes.bfloat16)
    ivf16 = IVFIndex.build(emb16, nlist=128, iters=8, pre_normalized=True)
    assert ivf16.buckets.dtype == jnp.bfloat16
    assert ivf16.spill.dtype == jnp.bfloat16
    assert ivf16.centroids.dtype == jnp.float32

    rng = np.random.default_rng(11)
    emb_f = emb16.astype(np.float32)
    recalls = []
    for _ in range(10):
        q = emb_f[rng.integers(len(corpus))] + 0.1 * rng.standard_normal(
            corpus.shape[1]
        ).astype(np.float32)
        q /= np.linalg.norm(q)
        _, exact_idx = exact_search(emb_f, q, 48)
        s, approx_idx = ivf16.search(q, 48, nprobe=32)
        assert s.dtype == np.float32  # accumulation stays f32
        recalls.append(
            len(set(exact_idx.tolist()) & set(approx_idx.tolist())) / 48
        )
    assert float(np.mean(recalls)) >= 0.99, recalls

    ivf16.save(tmp_path / "ivf16.npz")
    loaded = IVFIndex.load(tmp_path / "ivf16.npz")
    assert loaded is not None and loaded.buckets.dtype == jnp.bfloat16
    q = emb_f[7] / np.linalg.norm(emb_f[7])
    s1, i1 = ivf16.search(q, 12, nprobe=16)
    s2, i2 = loaded.search(q, 12, nprobe=16)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(s1, s2, atol=1e-6)


def test_search_host_matches_device(corpus, ivf):
    """The numpy host probe (CPU-only deployment path) returns the same
    rows and scores as the device kernel for the same nprobe (distinct
    scores; both rank score desc)."""
    rng = np.random.default_rng(21)
    for _ in range(5):
        q = rng.standard_normal(corpus.shape[1]).astype(np.float32)
        q /= np.linalg.norm(q)
        ds, di = ivf.search(q, 20, nprobe=16)
        hs, hi = ivf.search_host(q, 20, nprobe=16)
        np.testing.assert_array_equal(di, hi)
        np.testing.assert_allclose(ds, hs, atol=1e-5)


def test_search_host_spill_and_short_results():
    """Host probe finds spilled rows (scanned exactly) and degrades to
    short results when one probe covers < k rows, same as the device
    path's valid-filter contract."""
    rng = np.random.default_rng(22)
    emb = rng.standard_normal((500, 32)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    ivf = IVFIndex.build(emb, nlist=50, bucket_factor=0.5, iters=3)
    assert ivf.spill.shape[0] > 0
    q = emb[123]
    s, i = ivf.search_host(q, 1, nprobe=1)
    assert int(i[0]) == 123  # self-hit even if spilled
    s, i = ivf.search_host(q, 48, nprobe=1)
    assert 0 < len(i) <= 48
    assert np.all(np.diff(s) <= 1e-6)
    np.testing.assert_allclose(s, emb[i] @ q, atol=1e-5)


def test_tuned_nprobe_calibration(corpus, ivf, tmp_path):
    """Build-time calibration must pick a small nprobe on clustered data
    (the untuned default nlist/4 gathers a quarter of the corpus) while
    keeping auto-search recall at the >=0.99 contract; the tuned value
    survives save/load."""
    assert 0 < ivf.tuned_nprobe < ivf.nlist // 4, ivf.tuned_nprobe
    rng = np.random.default_rng(7)
    hits = total = 0
    for _ in range(20):
        q = corpus[rng.integers(len(corpus))] + 0.05 * rng.standard_normal(
            corpus.shape[1]
        ).astype(np.float32)
        q /= np.linalg.norm(q)
        _, exact_idx = exact_search(corpus, q, 48)
        _, auto_idx = ivf.search(q, 48)  # auto -> tuned_nprobe
        hits += len(set(exact_idx.tolist()) & set(auto_idx.tolist()))
        total += 48
    assert hits / total >= 0.99, (hits / total, ivf.tuned_nprobe)
    ivf.save(tmp_path / "ivf.npz")
    loaded = IVFIndex.load(tmp_path / "ivf.npz")
    assert loaded is not None
    assert loaded.tuned_nprobe == ivf.tuned_nprobe


@pytest.mark.slow
def test_recall_at_scale_100k():
    """Scale recall check runnable on the CPU mesh (the full 1M validation
    runs on TPU in bench.py's bench_ivf phase): 100k clustered vectors,
    recall@48 >= 0.99 vs exact, chunked k-means (corpus > KMEANS_CHUNK
    exercises the lax.scan accumulation path)."""
    from evossearch_tpu.index.ivf import KMEANS_CHUNK, IVFIndex
    from evossearch_tpu.index.search import exact_search_host

    rng = np.random.default_rng(0)
    n, d, n_clusters = 100_000, 128, 300
    assert n > KMEANS_CHUNK
    centers = rng.standard_normal((n_clusters, d)).astype(np.float32)
    emb = centers[rng.integers(0, n_clusters, n)] + 0.25 * rng.standard_normal(
        (n, d)
    ).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    ivf = IVFIndex.build(emb, nlist=316, iters=8)

    k, hits, total = 48, 0, 0
    for qi in range(20):
        q = emb[rng.integers(0, n)] + 0.05 * rng.standard_normal(d).astype(np.float32)
        q /= np.linalg.norm(q)
        exact_s, exact_i = exact_search_host(emb, q, k)
        s, i = ivf.search(q, k)
        hits += len(set(map(int, i)) & set(map(int, exact_i)))
        total += k
    recall = hits / total
    assert recall >= 0.99, recall


def test_small_nprobe_returns_covered_rows():
    """Regression (round-2 review): with an explicit nprobe so small that
    nprobe*cap + spill < k, _ivf_search returns kk < k rows and the packed
    fetch must split at the ACTUAL half — a fixed-k split mixed scores
    with float ids (silently empty results) or crashed the valid-filter
    with an IndexError."""
    rng = np.random.default_rng(7)
    n, d = 1000, 64
    emb = rng.standard_normal((n, d)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    ivf = IVFIndex.build(emb, nlist=500, iters=4)
    q = emb[3] + 0.01 * rng.standard_normal(d).astype(np.float32)
    q = (q / np.linalg.norm(q)).astype(np.float32)
    for k in (48, 30):
        s, i = ivf.search(q, k, nprobe=1)
        assert len(s) == len(i)
        assert 0 < len(i) <= k
        assert np.all(i >= 0) and np.all(i < n)
        # returned rows must really be the best of what one probe covers:
        # scores must match a direct dot with the named rows
        np.testing.assert_allclose(s, emb[i] @ q, atol=1e-5)
        assert np.all(np.diff(s) <= 1e-6)  # descending
