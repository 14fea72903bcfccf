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


_WS: dict[str, np.ndarray] = {}


def _ws(name: str, shape: tuple[int, ...], dtype=np.float32) -> np.ndarray:
    """Named per-process scratch buffer (grown geometrically, pages
    faulted once — first-touch faulting of fresh multi-MB arrays
    measures ~6 ms/MB here, see NOTES.md). Contents are garbage; the
    caller overwrites every element it reads. Valid until the next
    request for the SAME name."""
    n = 1
    for s in shape:
        n *= int(s)
    buf = _WS.get(name)
    if buf is None or buf.size < n:
        buf = np.zeros(int(n * 1.25) + 64, dtype=dtype)
        _WS[name] = buf
    return buf[:n].reshape(shape)


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


def _autocontrast_inplace(out: np.ndarray) -> np.ndarray:
    """PIL ImageOps.autocontrast (cutoff 0): per-image linear stretch
    of [lo, hi] -> [0, 255]; exact identity skip when every image is
    already full-range. Same values as the tail of :func:`enhance`."""
    lo = out.min(axis=(-2, -1), keepdims=True)
    hi = out.max(axis=(-2, -1), keepdims=True)
    if np.all(lo == 0.0) and np.all(hi == 255.0):
        return out
    scale = np.where(hi > lo, 255.0 / np.maximum(hi - lo, 1e-9), 1.0)
    np.subtract(out, lo, out=out)
    np.multiply(out, scale, out=out)
    np.rint(out, out=out)
    np.clip(out, 0.0, 255.0, out=out)
    return out


def _enhance_ws(img: np.ndarray, magnitude: np.ndarray) -> np.ndarray:
    """:func:`enhance` with fused in-place ops into reused scratch —
    bit-identical values (same op order; float add is commutative),
    ~2.5x less memory traffic. Returns a ``_ws``-backed array valid
    until the next ``sharp_*`` scratch request."""
    n, h, w = img.shape
    out = _ws("sharp_out", (n, h, w))
    mag = np.asarray(magnitude, dtype=np.float32)[..., None, None]
    if h < 3 or w < 3:
        np.copyto(out, img)
    else:
        v = _ws("sharp_v", (n, h - 2, w))
        np.add(img[:, :-2, :], img[:, 1:-1, :], out=v)
        v += img[:, 2:, :]
        sm = _ws("sharp_sm", (n, h - 2, w - 2))
        np.add(v[:, :, :-2], v[:, :, 1:-1], out=sm)
        sm += v[:, :, 2:]
        c = img[:, 1:-1, 1:-1]
        # sm = (s9 + 4*c)/13, then blend out_i = sm + mag*(c - sm)
        sm += np.float32(4.0) * c
        sm /= np.float32(13.0)
        oi = out[:, 1:-1, 1:-1]
        np.subtract(c, sm, out=oi)
        oi *= mag
        oi += sm
        # borders pass through: sm==img there, so blend == img
        out[:, 0, :] = img[:, 0, :]
        out[:, -1, :] = img[:, -1, :]
        out[:, :, 0] = img[:, :, 0]
        out[:, :, -1] = img[:, :, -1]
    np.rint(out, out=out)
    np.clip(out, 0.0, 255.0, out=out)
    return _autocontrast_inplace(out)


def enhance(img: np.ndarray, magnitude: np.ndarray | float) -> np.ndarray:
    """Sharpness: out = smooth + magnitude*(img - smooth), clipped —
    ImageEnhance.Sharpness(img).enhance(m) — then autocontrast
    (reference src/utils/transform.py:87-89). Float in, float out.

    ``magnitude`` broadcasts over leading batch dims.
    """
    img3 = img[None, ...] if img.ndim == 2 else img
    res = _enhance_ws(
        np.ascontiguousarray(img3, dtype=np.float32),
        np.broadcast_to(
            np.asarray(magnitude, dtype=np.float32), img3.shape[:-2]
        ),
    ).copy()  # detach from scratch
    return res[0] if img.ndim == 2 else res


def _upscale2x_axis(
    x: np.ndarray, axis: int, out: np.ndarray | None = None
) -> np.ndarray:
    """Exact 2x bilinear upscale along one axis (weights 0.25/0.75 —
    the dst->src mapping (d+0.5)/2-0.5 gives fractional offsets of
    exactly ±0.25). Pure slicing: no gather, ~7x cheaper than the
    generic path. Bit-identical to resize_bilinear for this scale
    (dyadic weights on integer-valued pixels are exact in float32).
    ``out``: optional preallocated destination (doubled along axis)."""
    x = np.moveaxis(x, axis, 1)
    n, h = x.shape[0], x.shape[1]
    if out is None:
        o = np.empty((n, 2 * h) + x.shape[2:], dtype=x.dtype)
    else:
        o = np.moveaxis(out, axis, 1)
    o[:, 0] = x[:, 0]
    o[:, 2::2] = x[:, :-1] * np.float32(0.25) + x[:, 1:] * np.float32(0.75)
    o[:, 1:-1:2] = x[:, :-1] * np.float32(0.75) + x[:, 1:] * np.float32(0.25)
    o[:, -1] = x[:, -1]
    return np.moveaxis(o, 1, axis)


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


def _gray_core(stack: np.ndarray, media_refs: list[str]) -> tuple[np.ndarray, int]:
    """Shared chain on a SAME-SIZE float32 stack (N, H, W): enhance ->
    invert -> aspect resize to H=64 -> /255. Returns a scratch-backed
    (N, 64, new_w) array (valid until the next preprocess call) and
    new_w; the caller center-pads it into a canvas. Bit-identical to
    the original chain (same op order, all float32)."""
    n, h, w = stack.shape
    mags = np.fromiter(
        (enhance_params(r)[1] for r in media_refs), np.float32, n
    )
    x = _enhance_ws(stack, mags)
    np.subtract(np.float32(255.0), x, out=x)  # cv2.bitwise_not
    new_w = invert_rescale_width(h, w)
    if IMG_H == h and new_w == w:
        pass  # identity resize
    elif IMG_H == 2 * h and new_w == 2 * w:
        tmp = _ws("up2x_tmp", (n, h, 2 * w))
        _upscale2x_axis(x, 2, out=tmp)
        x2 = _ws("up2x_out", (n, 2 * h, 2 * w))
        _upscale2x_axis(tmp, 1, out=x2)
        x = x2
    else:
        x = resize_bilinear(x, IMG_H, new_w)
    np.divide(x, np.float32(255.0), out=x)  # A.Normalize(0,1) == /255
    return x, new_w


def preprocess_gray_stack(
    imgs: np.ndarray, media_refs: list[str], out_w: int, out: np.ndarray | None = None
) -> np.ndarray:
    """Vectorized chain over a stack of SAME-SIZE images (N, H, W)
    float32 -> (N, 64, out_w) float32 in [0, 1], written into ``out``
    when given (zero extra copies). All math in float32: exact for the
    integer-valued pixels, and shared verbatim by oracle + pipeline."""
    n = imgs.shape[0]
    x, new_w = _gray_core(
        np.ascontiguousarray(imgs, dtype=np.float32), media_refs
    )
    # center pad to (64, out_w), constant 0 (A.PadIfNeeded CENTER)
    if out is None:
        out = np.zeros((n, IMG_H, out_w), dtype=np.float32)
    left = (out_w - new_w) // 2
    out[:, :, left : left + new_w] = x
    return out


def preprocess_batch(
    images,
    heights: np.ndarray,
    widths: np.ndarray,
    media_refs: list[str],
    out: np.ndarray | None = None,
    band: list[int] | None = None,
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

    ``band``: mutable [lo, hi) column extent of ``out`` that may hold
    data from a previous batch (pass ``[0, 0]`` with a freshly zeroed
    buffer). Only that slice is re-zeroed, and the band is updated in
    place to cover this batch's writes — the canvas outside every
    batch's center-padded images is never touched. ``None`` keeps the
    old full ``out.fill(0)`` behavior.
    """
    n = len(media_refs)
    if out is None:
        out = np.zeros((n, IMG_H, IMG_W), dtype=np.float32)
        band = None
    else:
        out = out[:n]
        if band is None:
            out.fill(0.0)
        elif band[1] > band[0]:
            # only the columns a previous batch touched need re-zeroing
            # (images are narrow and center-padded, so ~4/5 of the
            # canvas stays zero forever — see NOTES.md)
            out[:, :, band[0] : band[1]].fill(0.0)
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
        m = len(idxs)
        h, w = int(hs[idxs[0]]), int(ws[idxs[0]])
        if flat is not None:
            # one vectorized gather per shape group (no per-image
            # Python), staged through reused scratch (no allocations)
            starts = offs[idxs]
            idx = starts[:, None] + np.arange(h * w)[None, :]
            u8 = _ws("gather_u8", (m, h * w), np.uint8)
            np.take(flat, idx, out=u8)
            stack = _ws("gather_f32", (m, h, w))
            np.copyto(stack.reshape(m, h * w), u8, casting="unsafe")
        else:
            stack = np.empty((m, h, w), dtype=np.float32)
            for j, i in enumerate(idxs):
                stack[j] = np.frombuffer(images[i], dtype=np.uint8).reshape(h, w)
        x, new_w = _gray_core(stack, [media_refs[i] for i in idxs])
        left = (IMG_W - new_w) // 2
        out[idxs, :, left : left + new_w] = x
        if band is not None:
            band[0] = min(band[0], left) if band[1] > band[0] else left
            band[1] = max(band[1], left + new_w)
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
