"""Planar 4:2:0 JPEG indexing path: native decode, chroma-folded resample
matrices, device color conversion, builder routing.

The planar path halves the host->device canvas bytes (Y full-res + quarter
-res Cb/Cr = 1.5 B/px vs interleaved RGB's 3) — the dominant end-to-end
indexing cost on upload-bound rigs (BENCH bench_index stage split). It must
stay interchangeable with the RGB canvas path: same images, near-identical
embeddings (chroma travels box-subsampled + bicubic instead of libjpeg's
triangle upsample + bicubic, a sub-LSB difference on natural images).
"""

import numpy as np
import pytest
from PIL import Image

from evossearch_tpu.preprocess.io import get_native, load_batch_planar

D = 512


def _smooth(h=240, w=320, phase=0.0):
    """Natural-image stand-in: smooth gradients (JPEG chroma behaves like
    a photo, unlike uint8 noise which is chroma content at Nyquist)."""
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    a = (128 + 90 * np.sin(xx / 40 + phase) * np.cos(yy / 30)).clip(0, 255)
    return np.stack([a, 255 - a, np.roll(a, 7, 1)], -1).astype(np.uint8)


def _native_or_skip():
    native = get_native()
    if native is None or not hasattr(native, "decode_jpeg_planar"):
        pytest.skip("native extension unavailable")
    return native


def test_planar_decode_shapes_and_fallbacks(tmp_path):
    native = _native_or_skip()
    p = tmp_path / "a.jpg"
    Image.fromarray(_smooth()).save(p, quality=90)
    h, w, ch, cw, y, cb, cr = native.decode_jpeg_planar(p.read_bytes(), 0)
    assert (h, w) == (240, 320) and (ch, cw) == (120, 160)
    assert len(y) == h * w and len(cb) == ch * cw and len(cr) == ch * cw
    # odd dims: chroma covers the partial edge block
    po = tmp_path / "odd.jpg"
    Image.fromarray(_smooth(101, 133)).save(po, quality=90)
    h, w, ch, cw, *_ = native.decode_jpeg_planar(po.read_bytes(), 0)
    assert (h, w) == (101, 133) and (ch, cw) == (51, 67)
    # grayscale JPEG -> RGB-shaped 3-tuple fallback
    pg = tmp_path / "g.jpg"
    Image.fromarray(_smooth()[:, :, 0], mode="L").save(pg, quality=90)
    res = native.decode_jpeg_planar(pg.read_bytes(), 0)
    assert len(res) == 3 and res[:2] == (240, 320)


def test_load_batch_planar_mixed_kinds(tmp_path):
    _native_or_skip()
    jpg = tmp_path / "a.jpg"
    png = tmp_path / "b.png"
    bad = tmp_path / "c.jpg"
    Image.fromarray(_smooth()).save(jpg, quality=90)
    Image.fromarray(_smooth(64, 80)).save(png)
    bad.write_bytes(b"definitely not a jpeg")
    out = load_batch_planar([jpg, png, bad], min_short_side=0)
    assert isinstance(out[0], tuple) and out[0][0].shape == (240, 320)
    assert out[0][1].shape == (120, 160) and out[0][2].shape == (120, 160)
    assert isinstance(out[1], np.ndarray) and out[1].shape == (64, 80, 3)
    assert out[2] is None


def test_full_scale_chroma_roundtrip_close(tmp_path):
    """Planar decode + host NN-upsample + BT.601 must reproduce the RGB
    decode within a few 8-bit steps on a smooth image (the chroma samples
    recovered by the 2x2 box average are the file's stored samples)."""
    native = _native_or_skip()
    from evossearch_tpu.preprocess import planar_to_rgb_host

    p = tmp_path / "a.jpg"
    Image.fromarray(_smooth()).save(p, quality=90)
    data = p.read_bytes()
    h, w, ch, cw, y, cb, cr = native.decode_jpeg_planar(data, 0)
    rec = planar_to_rgb_host(
        np.frombuffer(y, np.uint8).reshape(h, w),
        np.frombuffer(cb, np.uint8).reshape(ch, cw),
        np.frombuffer(cr, np.uint8).reshape(ch, cw),
    )
    h2, w2, rgb = native.decode_jpeg(data, 0)
    ref = np.frombuffer(rgb, np.uint8).reshape(h2, w2, 3)
    d = np.abs(rec.astype(np.int32) - ref.astype(np.int32))
    # NN vs libjpeg triangle chroma upsampling differ most at the one hard
    # wrap seam np.roll leaves in the fixture; the mean is the real bound
    assert d.mean() < 1.0 and d.max() <= 24


def test_chroma_matrix_geometry():
    """Chroma matrices must resample the half-res plane onto the SAME
    output grid as the luma matrices: a linear ramp through either path
    lands on the same values (linear precision of the bicubic kernel),
    away from the clipped edge rows."""
    from evossearch_tpu.preprocess import (
        clip_resize_crop_chroma_matrices,
        clip_resize_crop_matrices,
    )

    for h, w in [(240, 320), (480, 640), (241, 333)]:
        ch, cw = (h + 1) // 2, (w + 1) // 2
        a_h, _ = clip_resize_crop_matrices(h, w, 224)
        a_hc, a_wc = clip_resize_crop_chroma_matrices(h, w, ch, cw, 224)
        np.testing.assert_allclose(a_hc.sum(1), 1.0, atol=1e-5)
        np.testing.assert_allclose(a_wc.sum(1), 1.0, atol=1e-5)
        ramp_full = (np.arange(h) + 0.5).astype(np.float64)
        ramp_chroma = 2.0 * (np.arange(ch) + 0.5)  # centered 4:2:0 siting
        out_full = a_h.astype(np.float64) @ ramp_full
        out_chroma = a_hc.astype(np.float64) @ ramp_chroma
        err = np.abs(out_full - out_chroma)[4:-4]
        assert err.max() < 0.05, (h, w, err.max())


def test_device_planar_matches_rgb_preprocess(tmp_path):
    """Fused planar device preprocess == RGB device preprocess within a
    fraction of an 8-bit step on a natural image."""
    native = _native_or_skip()
    import jax.numpy as jnp

    from evossearch_tpu.preprocess import (
        device_preprocess_indexed,
        device_preprocess_planar_indexed,
        prepare_batch,
        prepare_batch_planar,
    )

    p = tmp_path / "a.jpg"
    Image.fromarray(_smooth()).save(p, quality=90)
    data = p.read_bytes()
    h, w, rgb = native.decode_jpeg(data, 224)
    arr = np.frombuffer(rgb, np.uint8).reshape(h, w, 3)
    out_rgb = np.asarray(
        device_preprocess_indexed(
            *[jnp.asarray(x) for x in prepare_batch([arr], 224)]
        )
    )
    h, w, ch, cw, y, cb, cr = native.decode_jpeg_planar(data, 224)
    planes = [(
        np.frombuffer(y, np.uint8).reshape(h, w),
        np.frombuffer(cb, np.uint8).reshape(ch, cw),
        np.frombuffer(cr, np.uint8).reshape(ch, cw),
    )]
    out_p = np.asarray(
        device_preprocess_planar_indexed(
            *[jnp.asarray(x) for x in prepare_batch_planar(planes, 224)]
        )
    )
    d = np.abs(out_rgb - out_p)
    # normalized units; 1 8-bit step ~ 1/(255*std) ~ 0.015
    assert d.mean() < 0.02 and d.max() < 0.2


def test_prepare_batch_planar_validates_chroma_shape():
    from evossearch_tpu.preprocess import prepare_batch_planar

    y = np.zeros((100, 120), np.uint8)
    good = np.zeros((50, 60), np.uint8)
    bad = np.zeros((50, 61), np.uint8)
    with pytest.raises(ValueError):
        prepare_batch_planar([(y, good, bad)])
    out = prepare_batch_planar([(y, good, good)])
    assert out[0].shape == (1, 128, 128) and out[1].shape == (1, 64, 64, 2)


def _engine(monkeypatch, **env):
    monkeypatch.setenv("EVOSSEARCH_MICROBATCH_MS", "0")
    for k, v in env.items():
        monkeypatch.setenv(k, v)
    from evossearch_tpu.engine import SearchEngine

    return SearchEngine()


def test_index_folder_planar_vs_rgb_embeddings(monkeypatch, tmp_path):
    """End-to-end builder: a mixed folder indexed via the planar path must
    match the RGB path to cosine > 0.999 per image (f32 store so the
    comparison isn't polluted by bf16 quantization)."""
    _native_or_skip()
    import shutil

    from evossearch_tpu.index.store import IndexReader

    for i in range(5):
        Image.fromarray(_smooth(phase=float(i))).save(
            tmp_path / f"j{i}.jpg", quality=90
        )
    Image.fromarray(_smooth(96, 128)).save(tmp_path / "p.png")
    eng = _engine(monkeypatch, EVOSSEARCH_STORE_DTYPE="float32")
    try:
        assert eng.cfg.PLANAR_JPEG is True
        assert eng.index_folder(str(tmp_path)) == 6
        r = IndexReader.open(str(tmp_path))
        e_planar = np.asarray(r.embeddings(), np.float32).copy()
        paths_planar = [m["path"] for m in r.metadata]

        shutil.rmtree(tmp_path / ".clip_index")
        eng.cfg.PLANAR_JPEG = False
        with eng._cache_lock:
            eng._index_cache.clear()
        assert eng.index_folder(str(tmp_path)) == 6
        r2 = IndexReader.open(str(tmp_path))
        e_rgb = np.asarray(r2.embeddings(), np.float32).copy()
        assert [m["path"] for m in r2.metadata] == paths_planar
        cos = (e_planar * e_rgb).sum(1)
        assert cos.min() > 0.999, cos
        # the PNG rides the identical RGB path in both runs: bit-equal
        png_row = paths_planar.index(str(tmp_path / "p.png"))
        np.testing.assert_array_equal(e_planar[png_row], e_rgb[png_row])
    finally:
        eng.close()


def test_oversized_planar_reroutes_to_rgb(monkeypatch, tmp_path):
    """Images beyond the canvas ladder need the RGB host pre-shrink; the
    producer converts their planar decode back to RGB (rare path, exact
    via planar_to_rgb_host)."""
    _native_or_skip()
    import evossearch_tpu.preprocess as P
    from evossearch_tpu.index.store import IndexReader

    Image.fromarray(_smooth()).save(tmp_path / "a.jpg", quality=90)
    monkeypatch.setattr(P, "DEFAULT_MAX_SIDE", 100)  # force the reroute
    eng = _engine(monkeypatch, EVOSSEARCH_STORE_DTYPE="float32")
    calls = []
    orig = eng.encode_prepared

    def spy(*a, **kw):
        calls.append(a[0].shape)
        return orig(*a, **kw)

    monkeypatch.setattr(eng, "encode_prepared", spy)
    try:
        assert eng.index_folder(str(tmp_path)) == 1
        assert calls, "oversized planar image did not reroute to RGB"
        assert IndexReader.open(str(tmp_path)) is not None
    finally:
        eng.close()


def test_planar_handles_jpeg_variants(tmp_path):
    """Progressive and 4:4:4 (no chroma subsampling) JPEGs must still
    decode through the planar path — libjpeg delivers full-res chroma for
    4:4:4 and the 2x2 box average is then an honest downsample; the
    embedding-relevant content survives within the usual tolerance."""
    native = _native_or_skip()
    img = _smooth()
    base = tmp_path / "base.jpg"
    Image.fromarray(img).save(base, quality=90)
    variants = {
        "progressive": dict(quality=90, progressive=True),
        "s444": dict(quality=90, subsampling=0),
        "s422": dict(quality=90, subsampling=1),
    }
    from evossearch_tpu.preprocess import planar_to_rgb_host

    for name, kwargs in variants.items():
        p = tmp_path / f"{name}.jpg"
        Image.fromarray(img).save(p, **kwargs)
        res = native.decode_jpeg_planar(p.read_bytes(), 0)
        assert len(res) == 7, name
        h, w, ch, cw, y, cb, cr = res
        assert (h, w) == img.shape[:2] and (ch, cw) == (120, 160), name
        rec = planar_to_rgb_host(
            np.frombuffer(y, np.uint8).reshape(h, w),
            np.frombuffer(cb, np.uint8).reshape(ch, cw),
            np.frombuffer(cr, np.uint8).reshape(ch, cw),
        )
        h2, w2, rgb = native.decode_jpeg(p.read_bytes(), 0)
        ref = np.frombuffer(rgb, np.uint8).reshape(h2, w2, 3)
        d = np.abs(rec.astype(np.int32) - ref.astype(np.int32))
        assert d.mean() < 1.5, (name, d.mean())


def test_prepare_batch_planar_multi_size():
    """Two source sizes in one batch: per-unique-size matrix stacks with
    a device gather index — batched output equals per-image output."""
    import jax.numpy as jnp

    from evossearch_tpu.preprocess import (
        device_preprocess_planar_indexed,
        prepare_batch_planar,
    )

    rng = np.random.default_rng(7)

    def mk(h, w):
        return (
            rng.integers(0, 256, (h, w), dtype=np.uint8),
            rng.integers(0, 256, ((h + 1) // 2, (w + 1) // 2), dtype=np.uint8),
            rng.integers(0, 256, ((h + 1) // 2, (w + 1) // 2), dtype=np.uint8),
        )

    planes = [mk(240, 320), mk(180, 200), mk(240, 320)]
    batched = np.asarray(
        device_preprocess_planar_indexed(
            *[jnp.asarray(x) for x in prepare_batch_planar(planes, 224)]
        )
    )
    assert batched.shape == (3, 224, 224, 3)
    for i, pl in enumerate(planes):
        single = np.asarray(
            device_preprocess_planar_indexed(
                *[jnp.asarray(x) for x in prepare_batch_planar([pl], 224)]
            )
        )[0]
        np.testing.assert_allclose(batched[i], single, atol=1e-4)


def test_device_mats_cache_hits(monkeypatch, tmp_path):
    """Identical matrix stacks across batches must device_put ONCE (the
    re-upload waste the cache exists to remove)."""
    _native_or_skip()
    from evossearch_tpu.preprocess import prepare_batch_planar

    native = get_native()
    p = tmp_path / "a.jpg"
    Image.fromarray(_smooth()).save(p, quality=90)
    h, w, ch, cw, y, cb, cr = native.decode_jpeg_planar(p.read_bytes(), 224)
    plane = (
        np.frombuffer(y, np.uint8).reshape(h, w),
        np.frombuffer(cb, np.uint8).reshape(ch, cw),
        np.frombuffer(cr, np.uint8).reshape(ch, cw),
    )
    eng = _engine(monkeypatch)
    try:
        prep = prepare_batch_planar([plane], 224)
        eng.encode_prepared_planar(*prep)
        assert len(eng._mat_cache) == 1
        first = next(iter(eng._mat_cache.values()))
        eng.encode_prepared_planar(*prepare_batch_planar([plane], 224))
        assert len(eng._mat_cache) == 1  # same content -> same entry
        assert next(iter(eng._mat_cache.values())) is first
    finally:
        eng.close()


def test_encode_prepared_planar_bucket_padding(monkeypatch, tmp_path):
    """Odd batch sizes pad to the bucket ladder; the pad rows are dropped
    and real rows match the single-image result."""
    _native_or_skip()
    from evossearch_tpu.preprocess import prepare_batch_planar

    native = get_native()
    planes = []
    for i in range(3):
        p = tmp_path / f"x{i}.jpg"
        Image.fromarray(_smooth(phase=0.7 * i)).save(p, quality=90)
        h, w, ch, cw, y, cb, cr = native.decode_jpeg_planar(p.read_bytes(), 224)
        planes.append((
            np.frombuffer(y, np.uint8).reshape(h, w),
            np.frombuffer(cb, np.uint8).reshape(ch, cw),
            np.frombuffer(cr, np.uint8).reshape(ch, cw),
        ))
    eng = _engine(monkeypatch)
    try:
        out3 = eng.encode_prepared_planar(*prepare_batch_planar(planes, 224))
        out1 = eng.encode_prepared_planar(*prepare_batch_planar(planes[:1], 224))
        assert out3.shape == (3, eng.spec.embed_dim)
        np.testing.assert_allclose(out3[0], out1[0], atol=2e-5)
    finally:
        eng.close()


def test_raw420_decode_matches_rgb_oracle_on_sharp_geometries(tmp_path):
    """The raw-coefficient 4:2:0 fast path (native decode_jpeg_planar) on
    its sharpest geometries: odd iMCU block heights (the bitstream ships
    dummy padding blocks whose rows read_raw_data delivers — an
    undersized plane buffer would corrupt the last real rows), odd
    dims, and DCT-scaled decode. Planar reconstruct must stay close to
    the RGB decode of the same file, and the Y plane edge rows must not
    be padding garbage (mean |d| blows past any upsampling tolerance if
    they are)."""
    native = _native_or_skip()
    from evossearch_tpu.preprocess import planar_to_rgb_host

    for hh, ww in ((152, 224), (147, 640), (149, 151), (101, 133)):
        p = tmp_path / f"s{hh}x{ww}.jpg"
        Image.fromarray(_smooth(hh, ww)).save(p, quality=90)
        data = p.read_bytes()
        for mss in (0, 96):
            h, w, ch, cw, y, cb, cr = native.decode_jpeg_planar(data, mss)
            assert (ch, cw) == ((h + 1) // 2, (w + 1) // 2)
            rec = planar_to_rgb_host(
                np.frombuffer(y, np.uint8).reshape(h, w),
                np.frombuffer(cb, np.uint8).reshape(ch, cw),
                np.frombuffer(cr, np.uint8).reshape(ch, cw),
            )
            h2, w2, rgb = native.decode_jpeg(data, mss)
            assert (h2, w2) == (h, w)
            ref = np.frombuffer(rgb, np.uint8).reshape(h, w, 3)
            d = np.abs(rec.astype(np.int32) - ref.astype(np.int32))
            assert d.mean() < 2.0, (hh, ww, mss, d.mean())
            # last rows specifically (where padding corruption would land)
            assert d[-3:].mean() < 6.0, (hh, ww, mss, d[-3:].mean())
