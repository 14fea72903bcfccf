"""Unit tests for the NumPy preprocess chain (reference M1-M5,
src/utils/transform.py:41-89 inference path)."""

import numpy as np

from vietnamese_ocr_ray.preprocess import (
    IMG_H,
    IMG_W,
    enhance,
    enhance_params,
    invert_rescale_width,
    preprocess_batch,
    preprocess_one,
    resize_bilinear,
    smooth3,
)
from vietnamese_ocr_ray.synth import render_text


def test_invert_rescale_width_truncates_like_reference():
    # min(256, int(64/h*w)) with int() truncation (src/utils/transform.py:65)
    assert invert_rescale_width(64, 100) == 100
    assert invert_rescale_width(32, 100) == 200
    assert invert_rescale_width(32, 200) == 256  # capped
    assert invert_rescale_width(48, 10) == 13  # int(13.33) == 13


def test_output_shape_and_range():
    img = render_text("abc", 32)
    x = preprocess_one(img, "m-1")
    assert x.shape == (3, IMG_H, IMG_W)
    assert x.dtype == np.float32
    assert 0.0 <= x.min() and x.max() <= 1.0
    # all three channels identical (gray -> 3 channels, transform.py:69-70)
    assert np.array_equal(x[0], x[1]) and np.array_equal(x[1], x[2])


def test_center_pad_is_centered():
    img = render_text("ab", 64)  # content width 24 post-resize
    x = preprocess_one(img, "m-2")
    cols = np.nonzero(x[0].max(axis=0) > 0)[0]
    left, right = cols.min(), cols.max()
    # pad: left = (256-24)//2 = 116
    assert left == (IMG_W - 24) // 2
    assert right == left + 24 - 1


def test_enhance_identity_on_constant_interiors():
    # sharpness only perturbs pixels adjacent to intensity edges;
    # autocontrast is identity when 0 and 255 are both present
    img = np.full((32, 32), 128.0)
    img[0, 0] = 0.0
    img[-1, -1] = 255.0
    out = enhance(img, 1.7)
    assert out[16, 16] == 128.0


def test_smooth3_preserves_borders():
    img = np.arange(25, dtype=float).reshape(5, 5)
    out = smooth3(img)
    assert np.array_equal(out[0, :], img[0, :])
    assert np.array_equal(out[:, 0], img[:, 0])
    assert np.array_equal(out[-1, :], img[-1, :])


def test_resize_bilinear_integer_upscale_preserves_interiors():
    img = np.full((1, 8, 8), 77.0)
    out = resize_bilinear(img, 16, 16)
    assert np.all(out == 77.0)


def test_enhance_params_deterministic_per_ref():
    assert enhance_params("m-42") == enhance_params("m-42")
    i, m = enhance_params("m-42")
    assert i in (0, 1, 2)
    c = (0.1, 0.7, 1.3)[i]
    assert c <= m <= c + 0.6


def test_batch_equals_single():
    texts = ["hello", "", "a1b2c3", "zzz"]
    hs = [32, 64, 32, 64]
    refs = [f"m-{i}" for i in range(4)]
    imgs = [render_text(t, h) for t, h in zip(texts, hs)]
    xb = preprocess_batch(
        [im.tobytes() for im in imgs],
        np.array(hs),
        np.array([im.shape[1] for im in imgs]),
        refs,
    )
    # batch path produces the gray canvas; the single path expands it
    # to the reference's 3 identical channels
    xs = np.stack([preprocess_one(im, r) for im, r in zip(imgs, refs)])
    assert xb.shape == (4, 64, 256)
    assert np.array_equal(xb, xs[:, 0])


def test_preprocess_batch_band_reuse_equals_fresh():
    """The band-aware scratch path (only re-zero previously written
    columns) must be bit-equal to a freshly allocated canvas — across
    consecutive batches of different sizes on the same dirty buffer."""
    import numpy as np

    from vietnamese_ocr_ray.preprocess import IMG_H, IMG_W, preprocess_batch

    rng = np.random.default_rng(3)
    shapes = [(64, 48), (32, 20), (64, 56), (32, 28)]
    imgs, hs, ws, refs = [], [], [], []
    for i in range(300):
        h, w = shapes[i % len(shapes)]
        imgs.append(rng.integers(0, 256, (h, w), dtype=np.uint8).tobytes())
        hs.append(h)
        ws.append(w)
        refs.append(f"m-band-{i}")
    hs = np.array(hs)
    ws = np.array(ws)
    buf = np.zeros((300, IMG_H, IMG_W), np.float32)
    band = [0, 0]
    for lo, hi in [(0, 300), (50, 260), (0, 120)]:
        ref = preprocess_batch(imgs[lo:hi], hs[lo:hi], ws[lo:hi], refs[lo:hi])
        got = preprocess_batch(
            imgs[lo:hi], hs[lo:hi], ws[lo:hi], refs[lo:hi], out=buf, band=band
        )
        assert np.array_equal(ref, got[: hi - lo])
    assert 0 < band[0] < band[1] < IMG_W  # canvas edges never touched
