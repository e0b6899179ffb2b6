"""Shard store round-trip, fault tolerance, atomic publish, resume
(reference semantics: oldapp.py:92-135; SURVEY.md §4.5)."""

import json

import numpy as np

from evossearch_tpu.index import IndexReader, IndexWriter, exists, load_progress


def _write(folder, n=10, dim=8, rows_per_shard=4, dtype="float32"):
    rng = np.random.default_rng(0)
    emb = rng.standard_normal((n, dim)).astype(np.float32)
    paths = [f"/img/{i}.jpg" for i in range(n)]
    meta = [{"path": p, "mtime": float(i), "size": 100 + i} for i, p in enumerate(paths)]
    w = IndexWriter.create(folder, model="tiny", dim=dim, dtype_name=dtype,
                           rows_per_shard=rows_per_shard)
    for start in range(0, n, 3):  # uneven appends to exercise shard splits
        w.append(emb[start:start + 3], paths[start:start + 3], meta[start:start + 3])
    w.finalize()
    return emb, paths, meta


def test_roundtrip_multi_shard(tmp_path):
    emb, paths, meta = _write(tmp_path)
    r = IndexReader.open(tmp_path)
    assert r is not None
    assert r.count == 10 and r.model == "tiny"
    np.testing.assert_array_equal(np.asarray(r.embeddings()), emb)
    assert r.paths == paths
    assert r.metadata == meta
    assert len(r.shard_arrays()) == 3  # 4+4+2 rows
    assert exists(tmp_path)


def test_bfloat16_storage(tmp_path):
    emb, _, _ = _write(tmp_path, dtype="bfloat16")
    r = IndexReader.open(tmp_path)
    got = np.asarray(r.embeddings(), dtype=np.float32)
    assert np.abs(got - emb).max() < 0.01  # bf16 quantization


def test_missing_folder_not_indexed(tmp_path):
    assert IndexReader.open(tmp_path / "nope") is None
    assert not exists(tmp_path)


def test_corrupt_manifest_not_indexed(tmp_path):
    _write(tmp_path)
    (tmp_path / ".clip_index" / "manifest.json").write_text("{broken")
    assert IndexReader.open(tmp_path) is None


def test_truncated_shard_not_indexed(tmp_path):
    _write(tmp_path)
    shard = tmp_path / ".clip_index" / "shards" / "emb_00000.bin"
    shard.write_bytes(shard.read_bytes()[:-4])
    assert IndexReader.open(tmp_path) is None


def test_checksum_detects_bitrot(tmp_path):
    _write(tmp_path)
    shard = tmp_path / ".clip_index" / "shards" / "emb_00000.bin"
    raw = bytearray(shard.read_bytes())
    raw[0] ^= 0xFF
    shard.write_bytes(bytes(raw))
    assert IndexReader.open(tmp_path) is not None  # size check alone passes
    assert IndexReader.open(tmp_path, verify_checksums=True) is None


def test_metadata_optional(tmp_path):
    _write(tmp_path)
    (tmp_path / ".clip_index" / "metadata.json").unlink()
    r = IndexReader.open(tmp_path)
    assert r is not None and r.metadata is None  # back-compat (oldapp.py:123-131)


def test_reindex_preserves_comments(tmp_path):
    _write(tmp_path)
    comments = tmp_path / ".clip_index" / "comments.json"
    comments.write_text(json.dumps({"/img/1.jpg": ["[2026-01-01 00:00:00] hi"]}))
    _write(tmp_path, n=6)
    r = IndexReader.open(tmp_path)
    assert r.count == 6
    assert json.loads(comments.read_text())["/img/1.jpg"]


def test_resume_after_crash(tmp_path):
    rng = np.random.default_rng(1)
    dim = 8
    emb = rng.standard_normal((10, dim)).astype(np.float32)
    paths = [f"/img/{i}.jpg" for i in range(10)]
    meta = [{"path": p, "mtime": 0.0, "size": 1} for p in paths]
    w = IndexWriter.create(tmp_path, model="tiny", dim=dim, rows_per_shard=4)
    w.append(emb[:6], paths[:6], meta[:6])  # flushes one 4-row shard
    # "crash" here: no finalize. Progress covers only the flushed shard.
    done = load_progress(tmp_path)
    assert done == set(paths[:4])
    w2 = IndexWriter.resume(tmp_path, model="tiny", dim=dim)
    assert w2 is not None and w2.count == 4
    w2.append(emb[4:], paths[4:], meta[4:])
    w2.finalize()
    r = IndexReader.open(tmp_path)
    assert r.count == 10
    np.testing.assert_array_equal(np.asarray(r.embeddings()), emb)
    assert r.paths == paths


def test_resume_rejects_model_mismatch(tmp_path):
    w = IndexWriter.create(tmp_path, model="a", dim=4, rows_per_shard=2)
    w.append(np.zeros((2, 4), np.float32), ["x", "y"],
             [{"path": "x"}, {"path": "y"}])
    assert IndexWriter.resume(tmp_path, model="b", dim=4) is None
    assert IndexWriter.resume(tmp_path, model="a", dim=8) is None
    assert IndexWriter.resume(tmp_path, model="a", dim=4) is not None
