"""Training loop end-to-end on tiny data: loss decreases, checkpoints
round-trip, resume works, retrieval accuracy improves over random."""

import json

import numpy as np
import pytest
from PIL import Image

from evossearch_tpu.core.constants import CLIPModelSpec
from evossearch_tpu.tokenizer import CLIPTokenizer
from evossearch_tpu.train.data import PairDataset
from evossearch_tpu.train.loop import fit, retrieval_accuracy

TINY = CLIPModelSpec(
    name="tiny", image_size=32, patch_size=16, vision_width=64,
    vision_layers=2, vision_heads=4, text_width=64, text_layers=2,
    text_heads=4, vocab_size=49408, context_length=16, embed_dim=32,
)


@pytest.fixture()
def pair_folder(tmp_path):
    rng = np.random.default_rng(0)
    captions = {}
    colors = {"red": (200, 30, 30), "green": (30, 200, 30),
              "blue": (30, 30, 200), "yellow": (200, 200, 30)}
    i = 0
    for name, rgb in colors.items():
        for j in range(4):
            arr = np.full((48, 48, 3), rgb, np.uint8)
            arr = (arr + rng.normal(0, 12, arr.shape)).clip(0, 255).astype(np.uint8)
            fname = f"img_{i:03d}.jpg"
            Image.fromarray(arr).save(tmp_path / fname, quality=92)
            captions[fname] = f"a {name} square"
            i += 1
    (tmp_path / "captions.json").write_text(json.dumps(captions))
    return tmp_path


def test_fit_decreases_loss_and_checkpoints(pair_folder, tmp_path):
    ds = PairDataset(pair_folder, CLIPTokenizer(), TINY, batch_size=8, seed=0)
    assert len(ds) == 2
    params, history = fit(
        TINY, ds, epochs=6, learning_rate=3e-3,
        checkpoint_dir=tmp_path / "ck", log_every=100,
    )
    assert history[-1] < history[0]
    assert (tmp_path / "ck" / "clip.npz").exists()

    # trained model should retrieve the right caption within a batch far
    # better than chance (1/8)
    acc = retrieval_accuracy(params, TINY, ds.epoch())
    assert acc > 0.3, acc


def test_fit_resume_from_checkpoint(pair_folder, tmp_path):
    import jax

    from evossearch_tpu.models.checkpoint import load_params

    ds = PairDataset(pair_folder, CLIPTokenizer(), TINY, batch_size=8, seed=1)
    fit(TINY, ds, epochs=1, learning_rate=1e-3,
        checkpoint_dir=tmp_path / "ck", log_every=100)
    saved, _ = load_params(tmp_path / "ck" / "clip.npz")
    # resume with lr=0: returned params must equal the checkpoint exactly —
    # proving fit() started from it, not from a fresh init
    params, _ = fit(TINY, ds, epochs=1, learning_rate=0.0,
                    checkpoint_dir=tmp_path / "ck", resume=True, log_every=100)
    for a, b in zip(jax.tree_util.tree_leaves(saved),
                    jax.tree_util.tree_leaves(jax.device_get(params))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)


def test_fit_sharded_mesh(pair_folder, tmp_path):
    from evossearch_tpu.train import train_mesh

    ds = PairDataset(pair_folder, CLIPTokenizer(), TINY, batch_size=8, seed=2)
    mesh = train_mesh(model_parallel=2)
    _, history = fit(TINY, ds, epochs=1, learning_rate=1e-3, mesh=mesh,
                     log_every=100)
    assert np.isfinite(history[0])


def test_dataset_skips_missing_and_corrupt(pair_folder):
    (pair_folder / "img_000.jpg").write_bytes(b"broken")
    captions = json.loads((pair_folder / "captions.json").read_text())
    captions["ghost.jpg"] = "not on disk"
    (pair_folder / "captions.json").write_text(json.dumps(captions))
    ds = PairDataset(pair_folder, CLIPTokenizer(), TINY, batch_size=8, seed=0)
    batches = list(ds.epoch())
    total = sum(b[0].shape[0] for b in batches)
    assert 0 < total <= 15  # corrupt one skipped, ghost not listed

def test_fit_resume_restores_optimizer_state(pair_folder, tmp_path):
    """resume=True must restore the Adam moments alongside the params
    (re-initialized moments give the first post-resume steps unscaled
    updates)."""
    ds = PairDataset(pair_folder, CLIPTokenizer(), TINY, batch_size=8, seed=0)
    fit(TINY, ds, epochs=1, checkpoint_dir=tmp_path)
    assert (tmp_path / "train_state.npz").exists()
    import numpy as _np
    with _np.load(tmp_path / "train_state.npz") as data:
        moment_norms = [
            float(_np.abs(data[k]).sum()) for k in data.files if k != "epoch"
        ]
    assert any(n > 0 for n in moment_norms)  # real moments persisted

    import evossearch_tpu.train.loop as loop_mod

    restored = {}
    real = loop_mod._load_train_state

    def spy(path, template):
        out = real(path, template)
        restored["state"] = out[0]
        return out

    loop_mod._load_train_state = spy
    try:
        fit(TINY, ds, epochs=1, checkpoint_dir=tmp_path, resume=True)
    finally:
        loop_mod._load_train_state = real
    assert restored.get("state") is not None


def test_dataset_static_batches_across_mixed_sizes(tmp_path):
    """A mixed-size captioned folder must yield EXACTLY batch_size rows
    per batch with ONE unique canonical size (static shapes for the
    jitted train step)."""
    rng = np.random.default_rng(0)
    captions = {}
    for i in range(10):
        fname = f"m{i}.jpg"
        arr = rng.integers(0, 256, (40 + 3 * i, 52 + 5 * i, 3), dtype=np.uint8)
        Image.fromarray(arr).save(tmp_path / fname, quality=92)
        captions[fname] = f"photo {i}"
    (tmp_path / "captions.json").write_text(json.dumps(captions))
    ds = PairDataset(tmp_path, CLIPTokenizer(), TINY, batch_size=4, seed=0)
    shapes = set()
    for canv, a_h, a_w, idx, tokens in ds.epoch():
        assert canv.shape[0] == 4  # exact batch size, tail dropped
        assert a_h.shape[0] == 1 or np.unique(idx).size == 1  # one size
        shapes.add(canv.shape)
    assert len(shapes) == 1, shapes  # static across the epoch


def test_epoch_yields_despite_decode_failures_at_batch_size(tmp_path):
    """Regression: len(items) == batch_size with one corrupt image must
    still yield a (smaller) batch — zero batches meant fit() ran no
    steps and reported a NaN history."""
    rng = np.random.default_rng(0)
    captions = {}
    for i in range(8):
        fname = f"img_{i}.jpg"
        Image.fromarray(
            rng.integers(0, 256, (48, 48, 3), dtype=np.uint8)
        ).save(tmp_path / fname, quality=92)
        captions[fname] = f"photo {i}"
    (tmp_path / "captions.json").write_text(json.dumps(captions))
    (tmp_path / "img_0.jpg").write_bytes(b"broken")
    ds = PairDataset(tmp_path, CLIPTokenizer(), TINY, batch_size=8, seed=0)
    batches = list(ds.epoch())
    assert len(batches) == 1
    assert batches[0][0].shape[0] == 7
