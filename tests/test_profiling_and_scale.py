"""Profiling hooks produce traces; store round-trips at larger scale."""

import numpy as np

from evossearch_tpu.index import IndexReader, IndexWriter, exact_search
from evossearch_tpu.utils.profiling import annotate, capture_trace


def test_capture_trace_writes_profile(tmp_path):
    import jax.numpy as jnp

    with capture_trace(str(tmp_path)):
        with annotate("test-region"):
            (jnp.ones((64, 64)) @ jnp.ones((64, 64))).block_until_ready()
    produced = list(tmp_path.rglob("*"))
    assert any(p.is_file() for p in produced), produced


def test_capture_trace_noop_without_dir(monkeypatch):
    monkeypatch.delenv("EVOSSEARCH_PROFILE_DIR", raising=False)
    with capture_trace(None):
        pass  # must not raise or require jax


def test_store_200k_rows_roundtrip_and_search(tmp_path):
    rng = np.random.default_rng(0)
    n, d = 200_000, 64
    emb = rng.standard_normal((n, d)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    w = IndexWriter.create(tmp_path, model="m", dim=d, rows_per_shard=65536)
    step = 50_000
    for s in range(0, n, step):
        w.append(
            emb[s : s + step],
            [f"/p/{i}.jpg" for i in range(s, s + step)],
            [{"path": str(i), "mtime": 0.0, "size": 1} for i in range(s, s + step)],
        )
    w.finalize()
    r = IndexReader.open(tmp_path, verify_checksums=True)
    assert r is not None and r.count == n
    assert len(r.shard_arrays()) == 4
    q = emb[123_456]
    scores, idx = exact_search(r.embeddings(), q, 10)
    assert int(idx[0]) == 123_456
    assert scores[0] > 0.999
