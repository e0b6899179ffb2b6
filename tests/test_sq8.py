"""SQ8 certified int8 capacity tier (index/sq8.py + ops sq8 kernel).

The exactness story rests on three legs, each tested here:
  1. the quantization bound is RIGOROUS (u >= every score any exact path
     computes for that row) — property-tested including adversarial rows;
  2. certified results equal the host exact scan bit-for-bit (same score
     function, same tie contract), and uncertified rows fall back to it;
  3. the engine routes over-HBM-budget folders through the tier, with
     sidecar persistence, staleness invalidation, and budget accounting.
"""

import json
from pathlib import Path

import numpy as np
import pytest

from evossearch_tpu.index.sq8 import (
    DEFAULT_FETCH, SQ8Index, quantize_rows,
)

D = 256


class FakeReader:
    """Minimal reader contract for SQ8Index (count/dim/dtype_name/root/
    shard_arrays)."""

    def __init__(self, emb, root="/tmp/nonexistent", dtype_name="float32",
                 shards=1):
        self._emb = emb
        self.count, self.dim = emb.shape
        self.dtype_name = dtype_name
        self.root = root

        cut = self.count // shards
        self._shards = [
            emb[i * cut : (i + 1) * cut if i < shards - 1 else self.count]
            for i in range(shards)
        ]

    def shard_arrays(self):
        return self._shards


def _oracle(emb, queries, k, bf16_query=False):
    """(score desc, index asc) top-k with the host-scan score contract."""
    qs = np.asarray(queries, np.float32)
    if bf16_query:
        import ml_dtypes

        qs = qs.astype(ml_dtypes.bfloat16).astype(np.float32)
    s = emb.astype(np.float32) @ qs.T  # (n, Q)
    out_s, out_i = [], []
    for qi in range(qs.shape[0]):
        order = np.lexsort((np.arange(emb.shape[0]), -s[:, qi]))[:k]
        out_s.append(s[order, qi])
        out_i.append(order)
    return np.array(out_s), np.array(out_i)


def test_quantize_bound_is_rigorous():
    """u = dot*scale + radd*||q|| must dominate the score every exact path
    computes: raw-f32-query scores AND bf16-quantized-query scores, for
    random, heavy-tailed, constant, zero, and denormal-ish rows."""
    import ml_dtypes

    rng = np.random.default_rng(0)
    rows = np.concatenate([
        rng.standard_normal((2000, D)).astype(np.float32),
        (rng.standard_normal((500, D)) ** 5).astype(np.float32),  # heavy tails
        np.ones((3, D), np.float32),
        np.zeros((2, D), np.float32),
        np.full((2, D), 1e-30, np.float32),
        rng.standard_normal((500, D)).astype(np.float32) * 1e-8,
    ])
    norms = np.linalg.norm(rows, axis=1, keepdims=True)
    rows = np.where(norms > 0, rows / np.maximum(norms, 1e-30), rows)
    e8, scal2 = quantize_rows(rows)
    assert e8.dtype == np.int8 and scal2.shape == (2, len(rows))

    qs = rng.standard_normal((32, D)).astype(np.float32)
    qs[0] *= 100.0  # non-unit query: the ||q|| scaling must stay rigorous
    qs[1] *= 1e-6
    qb = qs.astype(ml_dtypes.bfloat16).astype(np.float32)
    qn = np.linalg.norm(qs, axis=1)

    # the kernel's dot: int8 -> bf16 (exact) x bf16(q), f32 accumulation
    dot = e8.astype(np.float32) @ qb.T  # (n, Q)
    u = dot * scal2[0][:, None] + scal2[1][:, None] * qn[None, :]
    for target in (rows @ qs.T, rows @ qb.T):
        viol = u < target
        assert not viol.any(), (
            f"{viol.sum()} bound violations, worst "
            f"{(target - u)[viol].max():.3e}"
        )


def test_certified_equals_host_scan_f32():
    rng = np.random.default_rng(1)
    n, k = 40_000, 10
    emb = rng.standard_normal((n, D)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    reader = FakeReader(emb, shards=3)
    e8, scal2 = quantize_rows(emb)
    idx = SQ8Index(e8, scal2, reader, fetch=128, tile_rows=512)
    qs = rng.standard_normal((8, D)).astype(np.float32)
    qs /= np.linalg.norm(qs, axis=1, keepdims=True)
    s, i = idx.search_batch(qs, k)
    es, ei = _oracle(emb, qs, k)
    np.testing.assert_array_equal(i, ei)
    np.testing.assert_allclose(s, es, atol=2e-6)


def test_certified_equals_host_scan_bf16_store():
    import ml_dtypes

    rng = np.random.default_rng(2)
    n, k = 30_000, 7
    emb = rng.standard_normal((n, D)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    emb16 = emb.astype(ml_dtypes.bfloat16)
    reader = FakeReader(emb16, dtype_name="bfloat16", shards=2)
    e8, scal2 = quantize_rows(emb16.astype(np.float32))
    idx = SQ8Index(e8, scal2, reader, fetch=128, tile_rows=512)
    qs = rng.standard_normal((5, D)).astype(np.float32)
    qs /= np.linalg.norm(qs, axis=1, keepdims=True)
    s, i = idx.search_batch(qs, k)
    # the bf16 contract: rows widened, query bf16-quantized first
    es, ei = _oracle(emb16.astype(np.float32), qs, k, bf16_query=True)
    np.testing.assert_array_equal(i, ei)
    np.testing.assert_allclose(s, es, atol=2e-6)


def test_mass_ties_fall_back_and_stay_exact():
    """All-identical rows break every certificate (bounds all equal);
    the result must still be exact via the host fallback — lowest-index
    ties."""
    rng = np.random.default_rng(3)
    n, k = 4096, 6
    row = rng.standard_normal(D).astype(np.float32)
    emb = np.tile(row, (n, 1))
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    reader = FakeReader(emb)
    e8, scal2 = quantize_rows(emb)
    idx = SQ8Index(e8, scal2, reader, fetch=64, tile_rows=512)
    q = (row / np.linalg.norm(row)).astype(np.float32)
    s, i = idx.search_batch(q[None], k)
    np.testing.assert_array_equal(i[0], np.arange(k))  # lowest-index ties


def test_id_hi_lo_packing_roundtrip():
    """Candidate ids ride as f32 hi/lo pairs so corpora past 2**24 rows
    (where a single f32 stops being integer-exact) keep exact indices."""
    import jax.numpy as jnp

    from evossearch_tpu.index.sq8 import _ID_SPLIT

    ids = np.array([0, 1, 4095, 4096, 2**24 - 1, 2**24, 20_000_000,
                    2**25 + 12345], np.int64)
    hi = np.float32(ids // _ID_SPLIT)
    lo = np.float32(ids % _ID_SPLIT)
    back = hi.astype(np.int64) * _ID_SPLIT + lo.astype(np.int64)
    np.testing.assert_array_equal(back, ids)
    assert (ids // _ID_SPLIT < 2**23).all() and (_ID_SPLIT < 2**23)


def test_sidecar_roundtrip_and_anomalies(tmp_path):
    rng = np.random.default_rng(4)
    n = 5000
    emb = rng.standard_normal((n, D)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    reader = FakeReader(emb, root=str(tmp_path), shards=2)
    built = SQ8Index.build_from_reader(reader)
    loaded = SQ8Index.load(reader)
    assert loaded is not None
    np.testing.assert_array_equal(np.asarray(loaded.e8), np.asarray(built.e8))
    np.testing.assert_array_equal(loaded.scal2, built.scal2)

    # anomalies -> None (engine rebuilds): bad count, truncated bin,
    # missing meta
    meta = json.loads((tmp_path / "sq8.json").read_text())
    meta["count"] = n + 1
    (tmp_path / "sq8.json").write_text(json.dumps(meta))
    assert SQ8Index.load(reader) is None
    meta["count"] = n
    (tmp_path / "sq8.json").write_text(json.dumps(meta))
    assert SQ8Index.load(reader) is not None
    with open(tmp_path / "sq8.bin", "r+b") as f:
        f.truncate(100)
    assert SQ8Index.load(reader) is None
    (tmp_path / "sq8.json").unlink()
    assert SQ8Index.load(reader) is None


# -- engine routing ---------------------------------------------------------

from evossearch_tpu.core import Config
from evossearch_tpu.core.constants import CLIPModelSpec
from evossearch_tpu.engine import SearchEngine, _canon
from evossearch_tpu.index.store import IndexWriter

TINY = CLIPModelSpec(
    name="tiny", image_size=64, patch_size=16, vision_width=64,
    vision_layers=2, vision_heads=4, text_width=48, text_layers=2,
    text_heads=4, vocab_size=49408, context_length=77, embed_dim=256,
)


def _make_index(folder, n, seed):
    folder = Path(folder)
    folder.mkdir(exist_ok=True)
    rng = np.random.default_rng(seed)
    emb = rng.standard_normal((n, D)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    w = IndexWriter.create(folder, model="tiny", dim=D, dtype_name="float32")
    paths = [str(folder / f"img_{i:05d}.jpg") for i in range(n)]
    meta = [{"path": p, "mtime": 1.0, "size": 10} for p in paths]
    w.append(emb, paths, meta)
    w.finalize()
    return emb


def _engine(monkeypatch, tmp_path, budget_mb, **env):
    for k in ("EVOSSEARCH_CHECKPOINT", "EVOSSEARCH_BPE_VOCAB"):
        monkeypatch.delenv(k, raising=False)
    monkeypatch.setenv("EVOSSEARCH_HBM_BUDGET_MB", str(budget_mb))
    monkeypatch.setenv("EVOSSEARCH_SEARCH_KERNEL", "xla")
    monkeypatch.setenv("EVOSSEARCH_MICROBATCH_MS", "0")
    for key, val in env.items():
        monkeypatch.setenv(key, val)
    return SearchEngine(cfg=Config(env_path=tmp_path / "missing.env"),
                        spec=TINY)


def test_engine_routes_over_budget_folder_to_sq8(monkeypatch, tmp_path):
    """Corpus 8 MB > 2 MB budget; int8 sidecar ~2.06 MB... shrink: use
    n=7000 -> corpus 7 MB, sidecar 1.8 MB <= 2 MB budget: queries ride
    the SQ8 tier (counter + sidecar files + device_bytes accounting) and
    return the exact host-contract results."""
    folder = tmp_path / "a"
    emb = _make_index(folder, 7000, seed=0)
    eng = _engine(monkeypatch, tmp_path, budget_mb=2)
    q = np.random.default_rng(7).standard_normal(D).astype(np.float32)
    q /= np.linalg.norm(q)
    s, i, _ = eng.search_embedding(str(folder), q, 10)
    es, ei = _oracle(emb, q[None], 10)
    np.testing.assert_array_equal(i, ei[0])
    np.testing.assert_allclose(s, es[0], atol=2e-6)
    entry = eng._index_cache[_canon(str(folder))]
    assert "emb" not in entry
    assert entry["sq8"] is not None
    assert entry["device_bytes"] == 7000 * (D + 8)
    snap = eng.counters.snapshot()
    assert snap["sq8_queries"] == 1
    assert (folder / ".clip_index" / "sq8.bin").exists()

    # second engine process: loads the persisted sidecar instead of
    # rebuilding (build leaves no .tmp files behind)
    assert not list((folder / ".clip_index").glob("*.tmp"))
    eng2 = _engine(monkeypatch, tmp_path, budget_mb=2)
    s2, i2, _ = eng2.search_embedding(str(folder), q, 10)
    np.testing.assert_array_equal(i2, ei[0])


def test_engine_sq8_off_and_too_big_fall_to_host_scan(monkeypatch, tmp_path):
    folder = tmp_path / "a"
    emb = _make_index(folder, 7000, seed=1)
    # budget 1 MB: even the sidecar (1.8 MB) doesn't fit -> host scan
    eng = _engine(monkeypatch, tmp_path, budget_mb=1)
    q = np.random.default_rng(9).standard_normal(D).astype(np.float32)
    s, i, _ = eng.search_embedding(str(folder), q, 5)
    np.testing.assert_array_equal(i, _oracle(emb, q[None], 5)[1][0])
    entry = eng._index_cache[_canon(str(folder))]
    assert entry["sq8"] is None and entry.get("device_bytes", 0) == 0
    assert "sq8_queries" not in eng.counters.snapshot()

    # EVOSSEARCH_SQ8=off: never builds, even when it would fit
    eng2 = _engine(monkeypatch, tmp_path, budget_mb=2, EVOSSEARCH_SQ8="off")
    s, i, _ = eng2.search_embedding(str(folder), q, 5)
    np.testing.assert_array_equal(i, _oracle(emb, q[None], 5)[1][0])
    assert eng2._index_cache[_canon(str(folder))]["sq8"] is None
    assert not (folder / ".clip_index" / "sq8.json").exists()


def test_engine_sq8_sidecar_invalidated_by_reindex(monkeypatch, tmp_path):
    """Re-indexing republishes the store; the stale sidecar (older mtime)
    must be rebuilt, not served."""
    import os
    import time

    folder = tmp_path / "a"
    _make_index(folder, 7000, seed=2)
    eng = _engine(monkeypatch, tmp_path, budget_mb=2)
    q = np.random.default_rng(11).standard_normal(D).astype(np.float32)
    eng.search_embedding(str(folder), q, 5)
    sidecar = folder / ".clip_index" / "sq8.json"
    assert sidecar.exists()

    time.sleep(0.02)
    emb2 = _make_index(folder, 7000, seed=3)  # re-publish with new rows
    # ensure the manifest mtime moved past the sidecar's
    now = time.time() + 1
    os.utime(folder / ".clip_index" / "manifest.json", (now, now))
    eng2 = _engine(monkeypatch, tmp_path, budget_mb=2)
    s, i, _ = eng2.search_embedding(str(folder), q, 5)
    np.testing.assert_array_equal(i, _oracle(emb2, q[None], 5)[1][0])
    assert sidecar.stat().st_mtime >= now - 2  # rebuilt


def test_engine_sq8_batcher_path(monkeypatch, tmp_path):
    """Micro-batched submissions reach the same SQ8 route."""
    folder = tmp_path / "a"
    emb = _make_index(folder, 7000, seed=4)
    monkeypatch.setenv("EVOSSEARCH_MICROBATCH_MS", "2")
    for k in ("EVOSSEARCH_CHECKPOINT", "EVOSSEARCH_BPE_VOCAB"):
        monkeypatch.delenv(k, raising=False)
    monkeypatch.setenv("EVOSSEARCH_HBM_BUDGET_MB", "2")
    monkeypatch.setenv("EVOSSEARCH_SEARCH_KERNEL", "xla")
    eng = SearchEngine(cfg=Config(env_path=tmp_path / "missing.env"),
                       spec=TINY)
    try:
        q = np.random.default_rng(13).standard_normal(D).astype(np.float32)
        s, i, _ = eng.search_embedding(str(folder), q, 5)
        np.testing.assert_array_equal(i, _oracle(emb, q[None], 5)[1][0])
        assert eng.counters.snapshot()["sq8_queries"] >= 1
    finally:
        eng.close()


def test_engine_sq8_async_build_over_sync_threshold(monkeypatch, tmp_path):
    """Above SQ8_SYNC_ROWS the first query must NOT stall on the build:
    it serves exact results via the host scan while a daemon thread
    builds the sidecar; once published, queries ride the device tier."""
    import time

    folder = tmp_path / "a"
    emb = _make_index(folder, 7000, seed=5)
    eng = _engine(monkeypatch, tmp_path, budget_mb=2,
                  EVOSSEARCH_SQ8_SYNC_ROWS="1000")
    q = np.random.default_rng(21).standard_normal(D).astype(np.float32)
    q /= np.linalg.norm(q)
    es, ei = _oracle(emb, q[None], 10)

    s, i, _ = eng.search_embedding(str(folder), q, 10)
    np.testing.assert_array_equal(i, ei[0])  # host scan, still exact
    snap = eng.counters.snapshot()
    assert snap["sq8_async_builds"] == 1
    assert snap.get("sq8_queries", 0) == 0

    entry = eng._index_cache[_canon(str(folder))]
    deadline = time.time() + 60
    while time.time() < deadline:
        with entry["lock"]:
            if not entry.get("sq8_building") and "sq8" in entry:
                break
        time.sleep(0.02)
    assert entry.get("sq8") is not None  # build + install succeeded
    assert (folder / ".clip_index" / "sq8.bin").exists()

    s2, i2, _ = eng.search_embedding(str(folder), q, 10)
    np.testing.assert_array_equal(i2, ei[0])
    snap = eng.counters.snapshot()
    assert snap["sq8_queries"] == 1  # second query rode the tier
    assert snap["sq8_async_builds"] == 1  # no duplicate thread


def test_sq8_store_mtime_stamp_rejects_cross_generation_sidecar(tmp_path):
    """The build-time stamp pins a sidecar to its store generation: a
    build racing a re-index publishes files NEWER than the new manifest
    (the coarse file-mtime rule alone would accept them), but its bounds
    were derived from the OLD rows — load must reject on stamp mismatch
    so stale bounds can never certify wrong results."""
    from evossearch_tpu.index.store import IndexReader

    folder = tmp_path / "a"
    _make_index(folder, 500, seed=6)
    reader = IndexReader.open(folder)
    SQ8Index.build_from_reader(reader, store_mtime=123.0)
    assert SQ8Index.load(reader, store_mtime=123.0) is not None
    assert SQ8Index.load(reader, store_mtime=124.0) is None  # wrong gen
    assert SQ8Index.load(reader) is not None  # caller opts out -> coarse rule
    # pre-stamp sidecars (no store_mtime key) keep loading under any stamp
    meta_p = folder / ".clip_index" / "sq8.json"
    meta = json.loads(meta_p.read_text())
    del meta["store_mtime"]
    meta_p.write_text(json.dumps(meta))
    assert SQ8Index.load(reader, store_mtime=999.0) is not None


def test_cli_sq8_prebuild(tmp_path, capsys, monkeypatch):
    """`python -m evossearch_tpu sq8 <folder>` prebuilds the sidecar
    (no device, no model init); a second run is a fresh-sidecar no-op."""
    for k in ("EVOSSEARCH_CHECKPOINT", "EVOSSEARCH_BPE_VOCAB"):
        monkeypatch.delenv(k, raising=False)
    from evossearch_tpu.__main__ import main as cli_main

    folder = tmp_path / "a"
    _make_index(folder, 1000, seed=8)
    assert cli_main(["sq8", str(folder)]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["built"] is True and out["count"] == 1000
    assert (folder / ".clip_index" / "sq8.bin").exists()

    assert cli_main(["sq8", str(folder)]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["built"] is False

    assert cli_main(["sq8", str(tmp_path / "nope")]) == 1


def test_engine_counts_sq8_fallbacks(monkeypatch, tmp_path):
    """Uncertified queries surface as sq8_fallback_queries in /stats:
    a mass-tie corpus (flat bound plateau at the certificate boundary)
    forces fallbacks while results stay exact."""
    folder = tmp_path / "a"
    folder.mkdir()
    rng = np.random.default_rng(31)
    emb = rng.standard_normal((7000, D)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    emb[::2] = emb[0]  # 3500 identical rows: k-th score ties everywhere
    w = IndexWriter.create(folder, model="tiny", dim=D, dtype_name="float32")
    paths = [str(folder / f"i{j}.jpg") for j in range(7000)]
    w.append(emb, paths, [{"path": p, "mtime": 1.0, "size": 1} for p in paths])
    w.finalize()
    eng = _engine(monkeypatch, tmp_path, budget_mb=2)
    q = emb[0] + 1e-5 * rng.standard_normal(D).astype(np.float32)
    q = (q / np.linalg.norm(q)).astype(np.float32)
    s, i, _ = eng.search_embedding(str(folder), q, 48)
    es, ei = _oracle(emb, q[None], 48)
    np.testing.assert_array_equal(i, ei[0])
    snap = eng.counters.snapshot()
    assert snap["sq8_queries"] == 1
    assert snap.get("sq8_fallback_queries", 0) == 1  # plateau -> fallback


def test_stats_hbm_snapshot(monkeypatch, tmp_path):
    """/stats "hbm" block: budget, reserved bytes, per-folder tier list."""
    folder = tmp_path / "a"
    _make_index(folder, 7000, seed=9)
    eng = _engine(monkeypatch, tmp_path, budget_mb=2)
    q = np.random.default_rng(33).standard_normal(D).astype(np.float32)
    q /= np.linalg.norm(q)
    eng.search_embedding(str(folder), q, 5)
    snap = eng.hbm_snapshot()
    assert snap["budget_bytes"] == 2 << 20
    (fo,) = snap["folders"].values()
    assert fo["tiers"] == ["sq8"] and fo["fits_device"] is False
    assert snap["reserved_bytes"] == fo["device_bytes"] == 7000 * (D + 8)


def test_async_build_discards_install_when_entry_orphaned(
    monkeypatch, tmp_path
):
    """A background build finishing AFTER its folder was re-indexed (or
    evicted) must not install corpus-sized device arrays on the orphaned
    entry — the fresh entry rebuilds against the new store."""
    import threading
    import time

    from evossearch_tpu.index.sq8 import SQ8Index

    folder = tmp_path / "a"
    _make_index(folder, 7000, seed=41)
    eng = _engine(monkeypatch, tmp_path, budget_mb=2,
                  EVOSSEARCH_SQ8_SYNC_ROWS="1000")
    release = threading.Event()
    orig = SQ8Index.build_from_reader.__func__

    def slow_build(cls, reader, **kw):
        release.wait(30)
        return orig(cls, reader, **kw)

    monkeypatch.setattr(
        SQ8Index, "build_from_reader", classmethod(slow_build)
    )
    q = np.random.default_rng(43).standard_normal(D).astype(np.float32)
    eng.search_embedding(str(folder), q, 5)  # kicks off the async build
    entry = eng._index_cache[_canon(str(folder))]
    assert entry.get("sq8_building") is True
    eng._index_cache.pop(_canon(str(folder)))  # orphan it (re-index/evict)
    release.set()
    deadline = time.time() + 30
    while time.time() < deadline and entry.get("sq8_building"):
        time.sleep(0.02)
    assert entry.get("sq8") is None  # discarded, not installed
    assert entry.get("device_bytes", 0) == 0


def test_async_build_skips_install_when_query_already_installed(
    monkeypatch, tmp_path
):
    """build_from_reader publishes the sidecar files BEFORE the builder
    takes the entry lock; a query thread can load + install them first.
    The builder must then skip its own install — a second _install_sq8
    would double-reserve device bytes with no release path."""
    import threading
    import time

    from evossearch_tpu.index.sq8 import SQ8Index

    folder = tmp_path / "a"
    _make_index(folder, 7000, seed=51)
    eng = _engine(monkeypatch, tmp_path, budget_mb=2,
                  EVOSSEARCH_SQ8_SYNC_ROWS="1000")
    published = threading.Event()
    release = threading.Event()
    orig = SQ8Index.build_from_reader.__func__

    def racing_build(cls, reader, **kw):
        out = orig(cls, reader, **kw)  # files are on disk now
        published.set()
        release.wait(30)  # hold the builder before it takes the lock
        return out

    monkeypatch.setattr(
        SQ8Index, "build_from_reader", classmethod(racing_build)
    )
    q = np.random.default_rng(53).standard_normal(D).astype(np.float32)
    eng.search_embedding(str(folder), q, 5)  # async build kicks off
    assert published.wait(30)
    eng.search_embedding(str(folder), q, 5)  # loads the published files
    entry = eng._index_cache[_canon(str(folder))]
    assert entry.get("sq8") is not None  # query-side install happened
    need = 7000 * (D + 8)
    assert entry["device_bytes"] == need
    release.set()
    deadline = time.time() + 30
    while time.time() < deadline and entry.get("sq8_building"):
        time.sleep(0.02)
    assert entry["device_bytes"] == need  # builder did NOT double-reserve
