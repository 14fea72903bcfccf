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
    reference src/utils/transform.py:81-86). Derived from hash bits
    directly (cheap + stable across processes)."""
    u = _stable_u64(media_ref)
    index = u % len(_SHARPNESS_BUCKETS)
    c = _SHARPNESS_BUCKETS[index]
    frac = ((u >> 8) & 0xFFFFFF) / float(1 << 24)
    return index, c + 0.6 * frac


def smooth3(img: np.ndarray) -> np.ndarray:
    """PIL SMOOTH filter: 3x3 kernel [[1,1,1],[1,5,1],[1,1,1]]/13,
    border pixels left unchanged (PIL ImageFilter semantics).

    ``img`` is float (..., H, W); vectorized over leading dims.
    """
    out = img.copy()
    if img.shape[-2] < 3 or img.shape[-1] < 3:
        return out
    # separable 3x3 sum (integer-valued float pixels -> exact in fp32
    # regardless of summation order), + 4*center for the weighted middle
    v = img[..., :-2, :] + img[..., 1:-1, :] + img[..., 2:, :]
    s9 = v[..., :, :-2] + v[..., :, 1:-1] + v[..., :, 2:]
    c = img[..., 1:-1, 1:-1]
    out[..., 1:-1, 1:-1] = (s9 + 4.0 * c) / 13.0
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
    if np.all(lo == 0.0) and np.all(hi == 255.0):
        return out  # exact identity — skip the remap pass
    scale = np.where(hi > lo, 255.0 / np.maximum(hi - lo, 1e-9), 1.0)
    out = np.clip(np.rint((out - lo) * scale), 0.0, 255.0)
    return out


def _upscale2x_axis(x: np.ndarray, axis: int) -> np.ndarray:
    """Exact 2x bilinear upscale along one axis (weights 0.25/0.75 —
    the dst->src mapping (d+0.5)/2-0.5 gives fractional offsets of
    exactly ±0.25). Pure slicing: no gather, ~7x cheaper than the
    generic path. Bit-identical to resize_bilinear for this scale
    (dyadic weights on integer-valued pixels are exact in float32)."""
    x = np.moveaxis(x, axis, 1)
    n, h = x.shape[0], x.shape[1]
    out = np.empty((n, 2 * h) + x.shape[2:], dtype=x.dtype)
    out[:, 0] = x[:, 0]
    out[:, 2::2] = x[:, :-1] * np.float32(0.25) + x[:, 1:] * np.float32(0.75)
    out[:, 1:-1:2] = x[:, :-1] * np.float32(0.75) + x[:, 1:] * np.float32(0.25)
    out[:, -1] = x[:, -1]
    return np.moveaxis(out, 1, axis)


def resize_bilinear(imgs: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """cv2.INTER_LINEAR-style bilinear resize, vectorized over a stack
    of same-shaped images (N, H, W) float -> (N, out_h, out_w).

    Source coordinate: (dst + 0.5) * (src/dst) - 0.5, clamped.
    Fast paths: identity (no-op) and exact 2x upscale (slicing).
    """
    n, h, w = imgs.shape
    if out_h == h and out_w == w:
        return imgs
    if out_h == 2 * h and out_w == 2 * w and imgs.dtype == np.float32:
        # horizontal then vertical, matching the generic path's order
        return _upscale2x_axis(_upscale2x_axis(imgs, 2), 1)
    ys = np.clip((np.arange(out_h) + 0.5) * (h / out_h) - 0.5, 0, h - 1)
    xs = np.clip((np.arange(out_w) + 0.5) * (w / out_w) - 0.5, 0, w - 1)
    y0 = np.floor(ys).astype(np.int64)
    x0 = np.floor(xs).astype(np.int64)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    wy = (ys - y0)[None, :, None].astype(imgs.dtype)
    wx = (xs - x0)[None, None, :].astype(imgs.dtype)
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
    float32 (3, 64, 256) in [0, 1]. Single-image path used by the
    oracle; shares the gray core with the batch path, then expands
    gray -> 3 identical channels (src/utils/transform.py:69-70)."""
    gray = preprocess_gray_stack(
        img_u8[None, ...].astype(np.float32), [media_ref], IMG_W
    )[0]
    return np.repeat(gray[None, :, :], 3, axis=0)


def preprocess_gray_stack(
    imgs: np.ndarray, media_refs: list[str], out_w: int, out: np.ndarray | None = None
) -> np.ndarray:
    """Vectorized chain over a stack of SAME-SIZE images (N, H, W)
    float32 -> (N, 64, out_w) float32 in [0, 1], written into ``out``
    when given (zero extra copies). All math in float32: exact for the
    integer-valued pixels, and shared verbatim by oracle + pipeline."""
    n, h, w = imgs.shape
    mags = np.array(
        [enhance_params(r)[1] for r in media_refs], dtype=np.float32
    )
    x = enhance(imgs, mags)
    x = np.float32(255.0) - x  # cv2.bitwise_not (src/utils/transform.py:64)
    new_w = invert_rescale_width(h, w)
    x = resize_bilinear(x, IMG_H, new_w)
    # center pad to (64, out_w), constant 0 (A.PadIfNeeded CENTER)
    if out is None:
        out = np.zeros((n, IMG_H, out_w), dtype=np.float32)
    left = (out_w - new_w) // 2
    np.divide(x, np.float32(255.0), out=x)  # A.Normalize(0,1) == /255
    out[:, :, left : left + new_w] = x
    return out


def preprocess_batch(
    images,
    heights: np.ndarray,
    widths: np.ndarray,
    media_refs: list[str],
    out: np.ndarray | None = None,
) -> np.ndarray:
    """Batch path used by the Ray stages: variable-size raw uint8 images
    (binary column + height/width columns) -> (N, 64, 256) float32
    model-ready grayscale canvases.

    ``images``: a list of bytes OR a (flat_uint8, offsets) pair taken
    zero-copy from an Arrow binary column (see binary_column_view).
    Images are grouped by (h, w) — vectorized argsort grouping, one
    vectorized gather + process per distinct shape; the padded canvas is
    written in place per group. ``out``: optional reusable (>=N, 64,
    256) float32 scratch (first-touch faulting of fresh canvases is the
    dominant cost otherwise — see NOTES.md).
    """
    n = len(media_refs)
    if out is None:
        out = np.zeros((n, IMG_H, IMG_W), dtype=np.float32)
    else:
        out = out[:n]
        out.fill(0.0)
    flat = offs = None
    if isinstance(images, tuple):
        flat, offs = images
    hs = np.asarray(heights, dtype=np.int64)
    ws = np.asarray(widths, dtype=np.int64)
    keys = hs * (1 << 20) + ws
    order = np.argsort(keys, kind="stable")
    sk = keys[order]
    bounds = np.nonzero(np.concatenate([[True], sk[1:] != sk[:-1]]))[0]
    bounds = np.concatenate([bounds, [n]])
    for g in range(len(bounds) - 1):
        idxs = order[bounds[g] : bounds[g + 1]]
        h, w = int(hs[idxs[0]]), int(ws[idxs[0]])
        if flat is not None:
            # one vectorized gather per shape group (no per-image Python)
            starts = offs[idxs]
            stack = (
                flat[starts[:, None] + np.arange(h * w)[None, :]]
                .reshape(len(idxs), h, w)
                .astype(np.float32)
            )
        else:
            stack = np.empty((len(idxs), h, w), dtype=np.float32)
            for j, i in enumerate(idxs):
                stack[j] = np.frombuffer(images[i], dtype=np.uint8).reshape(h, w)
        res = preprocess_gray_stack(stack, [media_refs[i] for i in idxs], IMG_W)
        out[idxs] = res
    return out


def binary_column_view(col) -> tuple[np.ndarray, np.ndarray]:
    """Zero-copy (flat uint8 data, normalized int64 offsets) view of an
    Arrow binary column — avoids materializing per-row bytes objects."""
    import pyarrow as pa

    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    offs = np.frombuffer(arr.buffers()[1], dtype=np.int32)[
        arr.offset : arr.offset + len(arr) + 1
    ].astype(np.int64)
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
    return data, offs
