"""End-to-end engine test: index a fixture folder, run all three search
modes (BASELINE config 1 / SURVEY §4.6 integration test), on a tiny spec."""

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


@pytest.fixture()
def fixture_folder(tmp_path, monkeypatch):
    rng = np.random.default_rng(0)
    colors = [(220, 40, 40), (40, 220, 40), (40, 40, 220), (200, 200, 40)]
    for i, c in enumerate(colors):
        arr = np.full((96, 128, 3), c, np.uint8)
        arr = (arr + rng.normal(0, 10, arr.shape)).clip(0, 255).astype(np.uint8)
        Image.fromarray(arr).save(tmp_path / f"img_{i}.jpg", quality=92)
    Image.fromarray(np.zeros((50, 50, 3), np.uint8)).save(tmp_path / "img_png.png")
    (tmp_path / "not_an_image.jpg").write_bytes(b"this is not a jpeg")
    (tmp_path / "ignored.txt").write_text("x")
    return tmp_path


@pytest.fixture()
def engine(monkeypatch, tmp_path):
    for k in ("EVOSSEARCH_CHECKPOINT", "EVOSSEARCH_BPE_VOCAB"):
        monkeypatch.delenv(k, raising=False)
    monkeypatch.setenv("EVOSSEARCH_COMPUTE_DTYPE", "float32")
    monkeypatch.setenv("EVOSSEARCH_BATCH_SIZE", "4")
    cfg = Config(env_path=tmp_path / "missing.env")
    return SearchEngine(cfg=cfg, spec=TINY)


def test_index_and_search_all_modes(engine, fixture_folder):
    assert not engine.is_indexed(fixture_folder)
    count = engine.index_folder(str(fixture_folder))
    assert count == 5  # 4 jpgs + 1 png; corrupt jpg skipped
    assert engine.is_indexed(fixture_folder)

    # text search
    res = engine.search_text(str(fixture_folder), "a red square", k=3)
    assert res is not None
    scores, idx, reader = res
    assert len(scores) == 3
    assert (np.diff(scores) <= 1e-6).all()  # descending
    assert all(0 <= i < reader.count for i in idx)
    assert reader.metadata[int(idx[0])]["size"] > 0

    # image search (by PIL) — query with an indexed image: top-1 is itself
    target = Image.open(reader.paths[2])
    s2, i2, _ = engine.search_image(str(fixture_folder), target, k=5)
    assert int(i2[0]) == 2
    assert s2[0] > 0.99  # self-similarity ~1

    # embedding search with k > n clamps
    s3, i3, _ = engine.search_embedding(
        str(fixture_folder), engine.encode_text("anything"), k=48
    )
    assert len(s3) == 5


def test_search_unindexed_returns_none(engine, tmp_path):
    assert engine.search_text(str(tmp_path), "query", 5) is None


def test_index_empty_folder_returns_zero(engine, tmp_path):
    empty = tmp_path / "empty"
    empty.mkdir()
    assert engine.index_folder(str(empty)) == 0
    assert not engine.is_indexed(empty)


def test_index_cache_invalidation(engine, fixture_folder):
    engine.index_folder(str(fixture_folder))
    res1 = engine.search_text(str(fixture_folder), "x", 2)
    # re-index (new manifest mtime) -> cache refresh, still works
    import time

    time.sleep(0.05)
    engine.index_folder(str(fixture_folder))
    res2 = engine.search_text(str(fixture_folder), "x", 2)
    np.testing.assert_array_equal(res1[1], res2[1])


def test_encode_images_batching_consistency(engine, fixture_folder):
    imgs = [Image.open(p) for p in sorted(fixture_folder.glob("*.jpg"))
            if "not_an" not in p.name]
    one_by_one = np.concatenate([engine.encode_images([im]) for im in imgs])
    batched = engine.encode_images(imgs)
    np.testing.assert_allclose(batched, one_by_one, atol=2e-5)


def test_text_embedding_cache(monkeypatch):
    """Repeated text queries reuse the cached device embedding (one
    encode dispatch, counted), and distinct texts don't collide."""
    monkeypatch.setenv("EVOSSEARCH_COMPUTE_DTYPE", "float32")
    from evossearch_tpu.core import Config
    from evossearch_tpu.engine import SearchEngine

    eng = SearchEngine(cfg=Config(env_path=None), spec=TINY)
    a1 = eng.encode_text("a red car")
    encoded_once = eng.counters.snapshot()["texts_encoded"]
    a2 = eng.encode_text("a red car")
    snap = eng.counters.snapshot()
    assert snap["texts_encoded"] == encoded_once  # no second dispatch
    assert snap.get("text_cache_hits", 0) >= 1
    np.testing.assert_array_equal(a1, a2)
    b = eng.encode_text("a blue boat")
    assert not np.allclose(a1, b)
