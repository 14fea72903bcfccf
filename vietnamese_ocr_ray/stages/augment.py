"""Optional train-time augmentation stage (SURVEY.md §2.2 M6).

The reference applies a p~0.5 albumentations pipeline during training
(src/utils/transform.py:22-43): GridDistortion, Defocus, PixelDropout,
GaussNoise, RandomBrightnessContrast, ImageCompression, then a OneOf
of [Curve | SafeRotate] and [random-position PadIfNeeded | Resize] in
random order. Extraction never uses it, so this stage is NOT part of
the flagship pipeline — it is the documented "optional seeded
map_batches stage": a NumPy reimplementation with every random draw
derived from a stable per-``media_ref`` seed, so augmented corpora are
reproducible across runs, batchings and cluster sizes.

Documented deviations from albumentations (no cv2/PIL/JPEG in this
environment, and the recognizer is a deterministic stand-in anyway):
bilinear (not cubic) geometric resampling, edge padding in the defocus
convolution, and ImageCompression approximated by level quantization
(the visible artifact of heavy JPEG) instead of an 8x8 DCT round-trip.
The `Curve` warp mirrors the reference's own numpy implementation
(src/utils/transform.py:91-125) draw-for-draw.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from vietnamese_ocr_ray.preprocess import (
    _stable_u64,
    binary_column_view,
    resize_bilinear,
)


def _remap_bilinear(img: np.ndarray, mx: np.ndarray, my: np.ndarray) -> np.ndarray:
    """Sample ``img`` at float coords (mx, my) bilinearly; outside the
    image reads as 0 (cv2.remap BORDER_CONSTANT 0 analog)."""
    h, w = img.shape
    x0 = np.floor(mx).astype(np.int64)
    y0 = np.floor(my).astype(np.int64)
    fx = (mx - x0).astype(np.float32)
    fy = (my - y0).astype(np.float32)

    def sample(yy: np.ndarray, xx: np.ndarray) -> np.ndarray:
        valid = (yy >= 0) & (yy < h) & (xx >= 0) & (xx < w)
        v = np.zeros(mx.shape, np.float32)
        v[valid] = img[yy[valid], xx[valid]]
        return v

    v00 = sample(y0, x0)
    v01 = sample(y0, x0 + 1)
    v10 = sample(y0 + 1, x0)
    v11 = sample(y0 + 1, x0 + 1)
    top = v00 * (1.0 - fx) + v01 * fx
    bot = v10 * (1.0 - fx) + v11 * fx
    return top * (1.0 - fy) + bot * fy


def curve_warp(img: np.ndarray, rng: np.random.Generator) -> np.ndarray:
    """Sinusoidal remap — the reference's custom `Curve`
    (src/utils/transform.py:91-125), same draw order: x-direction coin,
    then y-direction coin, then curve magnitude U(0.2, 0.4)."""
    h, w = img.shape[:2]
    x, y = np.meshgrid(np.arange(w), np.arange(h))
    x = (x - (w / 2)) / (w / 2)
    y = (y - (h / 2)) / (h / 2)
    sign_x = 0.1 if rng.uniform(0, 1) > 0.5 else -0.1
    x = (x + np.sin(y * 2) * sign_x).astype(np.float32)
    temp = rng.uniform(0, 1)
    curve = rng.uniform(0.2, 0.4)
    sign_y = -curve if temp > 0.5 else curve
    y = (y + np.cos(x * 2) * sign_y).astype(np.float32)
    x = (x * (w / 2)) + (w / 2)
    y = (y * (h / 2)) + (h / 2)
    return _remap_bilinear(img, x, y)


def safe_rotate(img: np.ndarray, angle_deg: float) -> np.ndarray:
    """SafeRotate analog: rotate about the center, scaled down so the
    whole rotated frame stays inside the original canvas, border 0
    (A.SafeRotate(limit, border_mode=CONSTANT), transform.py:20)."""
    h, w = img.shape
    a = np.deg2rad(angle_deg)
    c, s = float(np.cos(a)), float(np.sin(a))
    nw = abs(c) * w + abs(s) * h
    nh = abs(c) * h + abs(s) * w
    scale = min(w / nw, h / nh)
    yo, xo = np.meshgrid(
        np.arange(h, dtype=np.float32), np.arange(w, dtype=np.float32), indexing="ij"
    )
    xc = xo - (w - 1) / 2.0
    yc = yo - (h - 1) / 2.0
    inv = 1.0 / scale
    xs = (c * xc + s * yc) * inv + (w - 1) / 2.0
    ys = (-s * xc + c * yc) * inv + (h - 1) / 2.0
    return _remap_bilinear(img, xs, ys)


def grid_distortion(
    img: np.ndarray,
    rng: np.random.Generator,
    num_steps: int = 5,
    distort_limit: float = 0.1,
) -> np.ndarray:
    """A.GridDistortion(distort_limit=0.1) analog: each of num_steps
    grid cells per axis is stretched by an independent U(1-d, 1+d)
    factor; the resulting piecewise-linear coordinate map is renormalized
    to span the image and sampled bilinearly."""
    h, w = img.shape

    def axis_map(n: int) -> np.ndarray:
        factors = 1.0 + rng.uniform(-distort_limit, distort_limit, num_steps)
        widths = (n / num_steps) * factors
        xs = np.concatenate([[0.0], np.cumsum(widths)])
        xs *= (n - 1) / xs[-1]
        src_nodes = np.linspace(0, n - 1, num_steps + 1)
        return np.interp(np.arange(n), xs, src_nodes).astype(np.float32)

    mx = axis_map(w)
    my = axis_map(h)
    return _remap_bilinear(img, np.tile(mx, (h, 1)), np.tile(my[:, None], (1, w)))


def defocus(img: np.ndarray, radius: int) -> np.ndarray:
    """A.Defocus analog: normalized disc-kernel blur, edge padding.
    Vectorized as a sum of shifted views — no per-pixel Python."""
    r = int(radius)
    ys, xs = np.mgrid[-r : r + 1, -r : r + 1]
    mask = (xs * xs + ys * ys) <= r * r
    k = mask.astype(np.float32) / mask.sum()
    pad = np.pad(img.astype(np.float32), r, mode="edge")
    h, w = img.shape
    out = np.zeros((h, w), np.float32)
    for dy in range(2 * r + 1):
        for dx in range(2 * r + 1):
            if mask[dy, dx]:
                out += pad[dy : dy + h, dx : dx + w] * k[dy, dx]
    return out


def quantize_compression(img: np.ndarray, step: int) -> np.ndarray:
    """ImageCompression analog: quantize to ``step``-wide levels — the
    banding artifact of heavy JPEG without an 8x8 DCT round-trip
    (documented deviation; no JPEG codec in this environment)."""
    return np.rint(img / step) * step


def pad_or_resize(
    img: np.ndarray, rng: np.random.Generator, canvas: tuple[int, int]
) -> np.ndarray:
    """OneOf[random-position PadIfNeeded | Resize] to the canvas
    (transform.py:11-17): pad with 0 at a seeded random offset when the
    image fits, else bilinear-resize to the canvas."""
    ch, cw = canvas
    h, w = img.shape
    if rng.random() < 0.5 and h <= ch and w <= cw:
        top = int(rng.integers(0, ch - h + 1))
        left = int(rng.integers(0, cw - w + 1))
        out = np.zeros((ch, cw), np.float32)
        out[top : top + h, left : left + w] = img
        return out
    return resize_bilinear(img[None].astype(np.float32), ch, cw)[0]


def augment_image(
    img: np.ndarray,
    media_ref: str,
    *,
    dropout_prob: float = 0.01,
    drop_value: int = 255,
    noise_std: float = 10.0,
    brightness_limit: float = 0.1,
    contrast_limit: float = 0.2,
    distort_limit: float = 0.1,
    rotate_limit: float = 30.0,
    p: float = 0.5,
    geometric: bool = True,
    canvas: tuple[int, int] | None = None,
) -> np.ndarray:
    """Seeded analog of the reference's full train-time pipeline
    (src/utils/transform.py:22-43), in the reference's operator order:
    GridDistortion -> Defocus(1..3) -> PixelDropout(0.01, 255) ->
    GaussNoise(10) -> RandomBrightnessContrast(.1, .2) ->
    ImageCompression-style quantization, each with probability ``p``;
    then (``geometric=True``) the always-on OneOf pair — Curve or
    SafeRotate(±30°), and (when ``canvas`` is given) random-position
    pad-or-resize to the canvas — applied in a seeded random order.

    ``canvas=None`` keeps the input shape (unit-test / same-schema
    mode); pass ``canvas=(64, 256)`` for the reference's train canvas.
    """
    rng = np.random.default_rng(_stable_u64("aug:" + media_ref))
    out = img.astype(np.float32)
    if rng.random() < p:  # grid distortion
        out = grid_distortion(out, rng, distort_limit=distort_limit)
    if rng.random() < p:  # defocus
        out = defocus(out, int(rng.integers(1, 4)))
    if rng.random() < p:  # pixel dropout
        mask = rng.random(out.shape) < dropout_prob
        out[mask] = drop_value
    if rng.random() < p:  # gaussian noise
        out = out + rng.normal(0.0, noise_std, out.shape).astype(np.float32)
    if rng.random() < p:  # brightness / contrast
        alpha = 1.0 + rng.uniform(-contrast_limit, contrast_limit)
        beta = rng.uniform(-brightness_limit, brightness_limit) * 255.0
        out = out * alpha + beta
    if rng.random() < p:  # compression-style quantization
        out = quantize_compression(np.clip(out, 0, 255), int(rng.integers(2, 5)))
    if geometric:

        def curve_or_rotate(x: np.ndarray) -> np.ndarray:
            if rng.random() < 0.5:
                return curve_warp(x, rng)
            return safe_rotate(x, float(rng.uniform(-rotate_limit, rotate_limit)))

        if canvas is None:
            out = curve_or_rotate(out)
        elif rng.random() < 0.5:  # OneOf the two compose orders
            out = pad_or_resize(curve_or_rotate(out), rng, canvas)
        else:
            out = curve_or_rotate(pad_or_resize(out, rng, canvas))
    return np.clip(np.rint(out), 0, 255).astype(np.uint8)


class AugmentMedia:
    """Actor-pool stage over MEDIA_SCHEMA rows: replaces ``image`` with
    its seeded augmentation (and height/width when a canvas reshapes
    it). Deterministic: rerunning the stage — on any partitioning —
    produces identical bytes."""

    def __init__(self, **kwargs):
        self.kwargs = kwargs

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs = batch.column("media_ref").to_pylist()
        hs = batch.column("height").to_numpy(zero_copy_only=False)
        ws = batch.column("width").to_numpy(zero_copy_only=False)
        flat, offs = binary_column_view(batch.column("image"))
        out, oh, ow = [], [], []
        for i, ref in enumerate(refs):
            img = flat[offs[i] : offs[i + 1]].reshape(int(hs[i]), int(ws[i]))
            aug = augment_image(img, ref, **self.kwargs)
            out.append(aug.tobytes())
            oh.append(aug.shape[0])
            ow.append(aug.shape[1])
        t = batch.set_column(
            batch.schema.get_field_index("image"), "image", pa.array(out, pa.binary())
        )
        t = t.set_column(
            t.schema.get_field_index("height"),
            "height",
            pa.array(oh, batch.schema.field("height").type),
        )
        return t.set_column(
            t.schema.get_field_index("width"),
            "width",
            pa.array(ow, batch.schema.field("width").type),
        )


def augment_media(ds, concurrency=(1, 8), batch_size: int = 1024, **kwargs):

    return ds.map_batches(
        AugmentMedia,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        fn_constructor_kwargs=kwargs,
    )
