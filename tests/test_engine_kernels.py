"""Engine search-kernel selection: every configured kernel returns the same
exact result set (xla / pallas / host / sharded), IVF approximates it, and
checkpoint save/load round-trips."""

import numpy as np
import pytest
from PIL import Image

from evossearch_tpu.core import Config
from evossearch_tpu.core.constants import CLIPModelSpec
from evossearch_tpu.engine import SearchEngine

TINY = CLIPModelSpec(
    name="tiny", image_size=64, patch_size=16, vision_width=64,
    vision_layers=2, vision_heads=4, text_width=48, text_layers=2,
    text_heads=4, vocab_size=49408, context_length=77, embed_dim=32,
)


@pytest.fixture(scope="module")
def indexed_folder(tmp_path_factory):
    import os

    folder = tmp_path_factory.mktemp("kimgs")
    rng = np.random.default_rng(0)
    for i in range(10):
        arr = rng.integers(0, 256, (60, 80, 3), dtype=np.uint8)
        Image.fromarray(arr).save(folder / f"img_{i}.jpg", quality=90)
    os.environ["EVOSSEARCH_COMPUTE_DTYPE"] = "float32"
    eng = SearchEngine(cfg=Config(env_path=None), spec=TINY)
    assert eng.index_folder(str(folder)) == 10
    return folder


def _engine(monkeypatch, kernel=None, index_kind=None):
    monkeypatch.setenv("EVOSSEARCH_COMPUTE_DTYPE", "float32")
    if kernel:
        monkeypatch.setenv("EVOSSEARCH_SEARCH_KERNEL", kernel)
    if index_kind:
        monkeypatch.setenv("EVOSSEARCH_INDEX_KIND", index_kind)
    return SearchEngine(cfg=Config(env_path=None), spec=TINY)


@pytest.mark.parametrize("kernel", ["xla", "pallas", "host", "sharded"])
def test_all_kernels_agree(indexed_folder, monkeypatch, kernel):
    base = _engine(monkeypatch, "xla")
    q = base.encode_text("reference query")
    s0, i0, _ = base.search_embedding(str(indexed_folder), q, 5)
    eng = _engine(monkeypatch, kernel)
    s1, i1, _ = eng.search_embedding(str(indexed_folder), q, 5)
    np.testing.assert_array_equal(i1, i0)
    np.testing.assert_allclose(s1, s0, atol=1e-5)


def test_auto_kernel_resolves(indexed_folder, monkeypatch):
    eng = _engine(monkeypatch)  # auto; 8 cpu devices -> sharded
    assert eng._resolve_kernel() == "sharded"
    q = eng.encode_text("x")
    s, i, _ = eng.search_embedding(str(indexed_folder), q, 3)
    assert len(s) == 3


def test_ivf_index_kind(indexed_folder, monkeypatch):
    eng = _engine(monkeypatch, index_kind="ivf")
    q = eng.encode_text("x")
    res = eng.search_embedding(str(indexed_folder), q, 10)
    assert res is not None
    s, i, reader = res
    assert len(s) == 10 and len(set(i.tolist())) == 10


def test_ivf_sharded_kernel(indexed_folder, monkeypatch):
    """INDEX_KIND=ivf + SEARCH_KERNEL=sharded serves the mesh-sharded IVF
    (per-shard buckets, ICI merge), persists its mesh-size-specific
    sidecar, and a fresh engine reloads it without rebuilding."""
    eng = _engine(monkeypatch, kernel="sharded", index_kind="ivf")
    q = eng.encode_text("x")
    s, i, reader = eng.search_embedding(str(indexed_folder), q, 10)
    assert len(s) == 10 and len(set(i.tolist())) == 10
    entry, _ = eng._cached_index(str(indexed_folder))
    from evossearch_tpu.parallel import ShardedIVFIndex

    assert isinstance(entry.get("sharded_ivf"), ShardedIVFIndex)
    assert (reader.root / "ivf_mesh8.npz").exists()

    # agreement with the exact sharded kernel on the same store
    exact = _engine(monkeypatch, kernel="sharded")
    es, ei, _ = exact.search_embedding(str(indexed_folder), q, 10)
    assert set(i.tolist()) == set(ei.tolist())  # 10-row corpus: full recall

    # a fresh engine must LOAD the sidecar, never rebuild
    eng2 = _engine(monkeypatch, kernel="sharded", index_kind="ivf")
    monkeypatch.setattr(
        ShardedIVFIndex, "build",
        classmethod(lambda *a, **k: pytest.fail("rebuilt despite sidecar")),
    )
    s2, i2, _ = eng2.search_embedding(str(indexed_folder), q, 10)
    np.testing.assert_array_equal(i2, i)
    eng.close()
    eng2.close()
    exact.close()


def test_checkpoint_roundtrip(tmp_path):
    import jax

    from evossearch_tpu.models import init_params
    from evossearch_tpu.models.checkpoint import load_params, save_params

    params = init_params(jax.random.key(0), TINY)
    save_params(tmp_path / "ckpt.npz", params, TINY)
    loaded, spec = load_params(tmp_path / "ckpt.npz")
    assert spec == TINY
    for a, b in zip(
        jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(loaded)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
