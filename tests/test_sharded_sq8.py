"""Mesh-sharded SQ8 capacity tier (parallel/sharded_sq8.py).

Runs on the forced 8-CPU-device mesh (tests/conftest.py) — the standard
JAX stand-in for a TPU pod slice. The contract under test: certified
results equal the host exact scan's ranking (score desc, index asc),
shard count is invisible in the output, and uncertified queries fall
back to the host scan (never a wrong result).
"""

from __future__ import annotations

import numpy as np
import pytest

from evossearch_tpu.index.sq8 import DEFAULT_FETCH, SQ8Index
from evossearch_tpu.index.store import IndexReader, IndexWriter
from evossearch_tpu.parallel import SQ8ShardedIndex, corpus_mesh

D = 256
K = 20


def _store(folder, n, seed):
    folder.mkdir(exist_ok=True)
    rng = np.random.default_rng(seed)
    emb = rng.standard_normal((n, D)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    w = IndexWriter.create(folder, model="tiny", dim=D, dtype_name="float32")
    paths = [str(folder / f"img_{i:05d}.jpg") for i in range(n)]
    w.append(emb, paths, [{"path": p, "mtime": 1.0, "size": 1} for p in paths])
    w.finalize()
    return emb, IndexReader.open(folder)


def _oracle(emb, queries, k):
    s_all = emb @ queries.T  # f32 store: raw f32 query, like the host scan
    out_s, out_i = [], []
    for qi in range(queries.shape[0]):
        o = np.lexsort((np.arange(emb.shape[0]), -s_all[:, qi]))[:k]
        out_s.append(s_all[o, qi])
        out_i.append(o)
    return np.array(out_s), np.array(out_i)


@pytest.mark.parametrize("n,fetch", [(4096, DEFAULT_FETCH), (7000, 64)])
def test_sharded_equals_oracle_and_single_device(tmp_path, n, fetch):
    """8-shard results rank identically to the host oracle AND to the
    one-chip SQ8 tier; n=7000 also exercises tail-shard padding and a
    fetch below the per-shard candidate total (real certificates)."""
    emb, reader = _store(tmp_path / "a", n, seed=1)
    base = SQ8Index.build_from_reader(reader, fetch=fetch)
    base.tile_rows = 512  # test-sized tiles (prod default targets many-M rows)
    queries = np.random.default_rng(2).standard_normal((5, D)).astype(np.float32)
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)

    sharded = SQ8ShardedIndex(base, corpus_mesh(8))
    s, i = sharded.search_batch(queries, K)
    es, ei = _oracle(emb, queries, K)
    np.testing.assert_array_equal(i, ei)
    np.testing.assert_allclose(s, es, atol=2e-6)

    s1, i1 = base.search_batch(queries, K)
    np.testing.assert_array_equal(i, i1)


def test_sharded_mass_ties_stay_exact(tmp_path):
    """Adversarial: one row duplicated across shards hundreds of times.
    Certificates may fail (flat bound plateaus) — the fallback must keep
    results exact with the lowest-index tie rule across shard borders."""
    rng = np.random.default_rng(3)
    emb = rng.standard_normal((2048, D)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    emb[::4] = emb[0]  # 512 identical rows spread over every shard
    folder = tmp_path / "a"
    folder.mkdir()
    w = IndexWriter.create(folder, model="tiny", dim=D, dtype_name="float32")
    paths = [str(folder / f"i{i}.jpg") for i in range(2048)]
    w.append(emb, paths, [{"path": p, "mtime": 1.0, "size": 1} for p in paths])
    w.finalize()
    reader = IndexReader.open(folder)
    base = SQ8Index.build_from_reader(reader, fetch=64)
    base.tile_rows = 512
    sharded = SQ8ShardedIndex(base, corpus_mesh(8))
    q = emb[0] + 1e-4 * rng.standard_normal(D).astype(np.float32)
    q /= np.linalg.norm(q)
    s, i = sharded.search_batch(q[None].astype(np.float32), 40)
    es, ei = _oracle(emb, q[None].astype(np.float32), 40)
    np.testing.assert_array_equal(i, ei)


def test_engine_sharded_kernel_gets_sharded_sq8(monkeypatch, tmp_path):
    """SEARCH_KERNEL=sharded + over-per-chip-budget folder: the engine
    must install the mesh-sharded SQ8 tier (not the one-chip one) and
    serve exact results through it."""
    from tests.test_sq8 import _engine, _make_index
    from tests.test_sq8 import _oracle as sq8_oracle

    folder = tmp_path / "a"
    n = 24000
    emb = _make_index(folder, n, seed=4)
    # corpus/chip = 24000*256*4/8 = 3.1 MB > 2 MB budget -> over;
    # sq8/chip = 24000*264/8 = 0.79 MB <= budget -> sharded SQ8 tier
    eng = _engine(monkeypatch, tmp_path, budget_mb=2,
                  EVOSSEARCH_SEARCH_KERNEL="sharded")
    q = np.random.default_rng(5).standard_normal(D).astype(np.float32)
    q /= np.linalg.norm(q)
    s, i, _ = eng.search_embedding(str(folder), q, 10)
    es, ei = sq8_oracle(emb, q[None], 10)
    np.testing.assert_array_equal(i, ei[0])
    entry = eng._index_cache[list(eng._index_cache)[0]]
    assert isinstance(entry["sq8"], SQ8ShardedIndex)
    assert entry["device_bytes"] == n * (D + 8) // 8
    assert eng.counters.snapshot()["sq8_queries"] == 1


def test_tiny_corpus_full_fetch_no_duplicate_ids(tmp_path):
    """Regression: the kernel's tail-masked cells carry the FINITE
    sentinel np.finfo(f32).min with aliased iota ids. On a tiny corpus
    with full fetch (fetch == per-shard candidate total) those cells
    reach the global merge; filtering against -inf instead of the
    sentinel admitted them, certifying top-k results with DUPLICATE ids
    (one-chip filter: index/sq8.py). Every id must be unique and equal
    to the oracle's."""
    emb, reader = _store(tmp_path / "a", 100, seed=7)
    base = SQ8Index.build_from_reader(reader)  # default fetch 512
    base.tile_rows = 512
    sharded = SQ8ShardedIndex(base, corpus_mesh(8))
    queries = np.random.default_rng(8).standard_normal((3, D)).astype(np.float32)
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)
    s, i = sharded.search_batch(queries, 20)
    es, ei = _oracle(emb, queries, 20)
    for qi in range(3):
        assert len(set(i[qi].tolist())) == 20, f"duplicate ids: {i[qi]}"
    np.testing.assert_array_equal(i, ei)


def test_over_128_query_batches_chunk(tmp_path):
    """Both tiers must chunk batches past the kernel's 128 query lanes
    (the BlockSpec reads only the first LANES rows) instead of crashing
    or silently corrupting rows 128+."""
    emb, reader = _store(tmp_path / "a", 2048, seed=9)
    base = SQ8Index.build_from_reader(reader, fetch=64)
    base.tile_rows = 512
    queries = np.random.default_rng(10).standard_normal((130, D)).astype(np.float32)
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)
    es, ei = _oracle(emb, queries, 10)

    s1, i1 = base.search_batch(queries, 10)
    np.testing.assert_array_equal(i1, ei)

    sharded = SQ8ShardedIndex(base, corpus_mesh(8))
    s8, i8 = sharded.search_batch(queries, 10)
    np.testing.assert_array_equal(i8, ei)
