"""NumPy restatement of the reference's inference-time image pipeline
(M1-M5 in SURVEY.md §2.2). cv2 / PIL / albumentations are unavailable
in this sandbox, so each step is reimplemented once here and shared
verbatim by BOTH the single-process oracle and the Ray pipeline — the
correctness invariant is oracle/pipeline equality over this exact code.

Reference chain (src/utils/inference.py:33-42,123-134):
  grayscale -> Enhance (sharpness blend + autocontrast)
            -> InvertRescale (bitwise_not, aspect resize to H=64,
               W=min(256, int(64/h*w)), gray->3 channels)
            -> PadIfNeeded(64,256, CENTER, constant 0)
            -> Normalize(mean 0, std 1) (= /255) + ToTensorV2 (HWC->CHW)

Deliberate deviation (SURVEY.md §7.3): the reference draws Enhance's
sharpness magnitude from an unseeded RNG even at inference
(src/utils/transform.py:76-86, src/utils/inference.py:131), making its
outputs non-deterministic across runs. We derive the draw from a stable
hash of ``media_ref`` so oracle, pipeline and reruns agree.
"""

from __future__ import annotations

import hashlib

import numpy as np

IMG_H, IMG_W = 64, 256  # reference config img_size (config/swin_config.yaml:31)

_SHARPNESS_BUCKETS = (0.1, 0.7, 1.3)  # reference src/utils/transform.py:80


def _stable_u64(s: str) -> int:
    return int.from_bytes(hashlib.blake2b(s.encode(), digest_size=8).digest(), "big")


def enhance_params(media_ref: str) -> tuple[int, float]:
    """Seeded stand-in for Enhance's two RNG draws
    (index = randint(0,3); magnitude = uniform(c, c+0.6),
    reference src/utils/transform.py:81-86)."""
    rng = np.random.default_rng(_stable_u64(media_ref))
    index = int(rng.integers(0, len(_SHARPNESS_BUCKETS)))
    c = _SHARPNESS_BUCKETS[index]
    magnitude = float(rng.uniform(c, c + 0.6))
    return index, magnitude


def smooth3(img: np.ndarray) -> np.ndarray:
    """PIL SMOOTH filter: 3x3 kernel [[1,1,1],[1,5,1],[1,1,1]]/13,
    border pixels left unchanged (PIL ImageFilter semantics).

    ``img`` is float (..., H, W); vectorized over leading dims.
    """
    out = img.copy()
    if img.shape[-2] < 3 or img.shape[-1] < 3:
        return out
    c = img[..., 1:-1, 1:-1]
    acc = 5.0 * c
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            acc = acc + img[
                ..., 1 + dy : img.shape[-2] - 1 + dy, 1 + dx : img.shape[-1] - 1 + dx
            ]
    out[..., 1:-1, 1:-1] = acc / 13.0
    return out


def enhance(img: np.ndarray, magnitude: np.ndarray | float) -> np.ndarray:
    """Sharpness: out = smooth + magnitude*(img - smooth), clipped —
    ImageEnhance.Sharpness(img).enhance(m) — then autocontrast
    (reference src/utils/transform.py:87-89). Float in, float out.

    ``magnitude`` broadcasts over leading batch dims.
    """
    sm = smooth3(img)
    out = sm + np.asarray(magnitude)[..., None, None] * (img - sm)
    out = np.clip(np.rint(out), 0.0, 255.0)
    # autocontrast: linear stretch of [lo, hi] -> [0, 255] (PIL
    # ImageOps.autocontrast, cutoff 0). Identity when lo==0 and hi==255.
    lo = out.min(axis=(-2, -1), keepdims=True)
    hi = out.max(axis=(-2, -1), keepdims=True)
    scale = np.where(hi > lo, 255.0 / np.maximum(hi - lo, 1e-9), 1.0)
    out = np.clip(np.rint((out - lo) * scale), 0.0, 255.0)
    return out


def resize_bilinear(imgs: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """cv2.INTER_LINEAR-style bilinear resize, vectorized over a stack
    of same-shaped images (N, H, W) float -> (N, out_h, out_w).

    Source coordinate: (dst + 0.5) * (src/dst) - 0.5, clamped.
    """
    n, h, w = imgs.shape
    ys = np.clip((np.arange(out_h) + 0.5) * (h / out_h) - 0.5, 0, h - 1)
    xs = np.clip((np.arange(out_w) + 0.5) * (w / out_w) - 0.5, 0, w - 1)
    y0 = np.floor(ys).astype(np.int64)
    x0 = np.floor(xs).astype(np.int64)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    wy = (ys - y0)[None, :, None]
    wx = (xs - x0)[None, None, :]
    a = imgs[:, y0[:, None], x0[None, :]]
    b = imgs[:, y0[:, None], x1[None, :]]
    c = imgs[:, y1[:, None], x0[None, :]]
    d = imgs[:, y1[:, None], x1[None, :]]
    top = a * (1 - wx) + b * wx
    bot = c * (1 - wx) + d * wx
    return top * (1 - wy) + bot * wy


def invert_rescale_width(h: int, w: int) -> int:
    """Output width of InvertRescale: min(256, int(64/h*w))
    (reference src/utils/transform.py:65, incl. the int() truncation)."""
    return min(IMG_W, int(IMG_H / h * w))


def preprocess_one(img_u8: np.ndarray, media_ref: str) -> np.ndarray:
    """Full reference chain for a single grayscale uint8 (H, W) image ->
    float32 (3, 64, 256) in [0, 1]. Single-image path used by the oracle."""
    return preprocess_stack(img_u8[None, ...].astype(np.float64), [media_ref])[0]


def preprocess_stack(imgs: np.ndarray, media_refs: list[str]) -> np.ndarray:
    """Vectorized chain over a stack of SAME-SIZE images
    (N, H, W) float -> (N, 3, 64, 256) float32."""
    n, h, w = imgs.shape
    mags = np.array([enhance_params(r)[1] for r in media_refs])
    x = enhance(imgs, mags)
    x = 255.0 - x  # cv2.bitwise_not (src/utils/transform.py:64)
    new_w = invert_rescale_width(h, w)
    x = resize_bilinear(x, IMG_H, new_w)
    # center pad to (64, 256), constant 0 (A.PadIfNeeded CENTER)
    out = np.zeros((n, IMG_H, IMG_W), dtype=np.float64)
    left = (IMG_W - new_w) // 2
    out[:, :, left : left + new_w] = x
    out /= 255.0  # A.Normalize(mean 0, std 1) == /255
    # gray -> 3 identical channels (src/utils/transform.py:69-70) + HWC->CHW
    return np.repeat(out[:, None, :, :], 3, axis=1).astype(np.float32)


def preprocess_batch(
    images: list[bytes] | np.ndarray,
    heights: np.ndarray,
    widths: np.ndarray,
    media_refs: list[str],
) -> np.ndarray:
    """Batch path used by the Ray stages: variable-size raw uint8 images
    (binary column + height/width columns) -> (N, 3, 64, 256) float32.

    Images are grouped by (h, w) so each distinct shape is processed as
    one vectorized stack (no per-image Python in the numeric work).
    """
    n = len(media_refs)
    out = np.empty((n, 3, IMG_H, IMG_W), dtype=np.float32)
    shapes: dict[tuple[int, int], list[int]] = {}
    for i in range(n):
        shapes.setdefault((int(heights[i]), int(widths[i])), []).append(i)
    for (h, w), idxs in shapes.items():
        stack = np.stack(
            [
                np.frombuffer(images[i], dtype=np.uint8).reshape(h, w)
                for i in idxs
            ]
        ).astype(np.float64)
        out[idxs] = preprocess_stack(stack, [media_refs[i] for i in idxs])
    return out
