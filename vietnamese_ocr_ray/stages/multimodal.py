"""Multimodal column stages — image/video payloads as opaque binary
columns with typed metadata, processed by stateful actor-pool
map_batches stages (the plumbing a 100 TB media pipeline needs:
schema, batch sizing, zero-copy extraction, per-actor state).

Codec policy in this sandbox: ``encoding="raw"`` (what synth.py
produces — C-order uint8) decodes for real; compressed codecs
(jpeg/png/...) raise ``NotImplementedError`` at the exact seam where
a real build would call PIL/cv2/ffmpeg, keeping the Ray-side contract
(schemas, actor signatures, output layout) fully testable.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from vietnamese_ocr_ray.preprocess import binary_column_view, resize_bilinear

RAW = "raw"


def _decode_views(batch: pa.Table):
    """Zero-copy per-image views (list of (h, w) uint8 arrays) from the
    flat Arrow binary buffer."""
    enc = batch.column("encoding") if "encoding" in batch.column_names else None
    if enc is not None:
        bad = pc.any(pc.not_equal(enc, RAW)).as_py()
        if bad:
            codecs = set(enc.to_pylist()) - {RAW}
            raise NotImplementedError(
                f"image codecs unavailable in this sandbox: {sorted(codecs)}"
            )
    flat, offs = binary_column_view(batch.column("image"))
    hs = batch.column("height").to_numpy(zero_copy_only=False)
    ws = batch.column("width").to_numpy(zero_copy_only=False)
    return [
        flat[offs[i] : offs[i + 1]].reshape(int(hs[i]), int(ws[i]))
        for i in range(batch.num_rows)
    ], hs, ws


class ImageFeatures:
    """Per-image scalar features (mean/std intensity, horizontal edge
    density) — the feature-extract stage shape: vectorized over each
    image, metadata-only output (no payload re-emitted)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        views, hs, ws = _decode_views(batch)
        mean = np.empty(len(views))
        std = np.empty(len(views))
        edges = np.empty(len(views))
        for i, v in enumerate(views):
            f = v.astype(np.float32)
            mean[i] = f.mean()
            std[i] = f.std()
            d = np.abs(np.diff(f, axis=1))
            edges[i] = float((d > 32).mean()) if d.size else 0.0
        return pa.table(
            {
                "media_ref": batch.column("media_ref"),
                "mean_intensity": pa.array(np.round(mean, 4)),
                "std_intensity": pa.array(np.round(std, 4)),
                "edge_density": pa.array(np.round(edges, 4)),
            }
        )


class Thumbnail:
    """Resize stage: downscale each image to height ``out_h`` keeping
    aspect (bilinear), re-emit as a raw binary column + new dims."""

    def __init__(self, out_h: int = 16):
        self.out_h = out_h

    def __call__(self, batch: pa.Table) -> pa.Table:
        views, hs, ws = _decode_views(batch)
        blobs, nh, nw = [], [], []
        for v in views:
            h, w = v.shape
            oh = min(self.out_h, h)
            ow = max(1, round(w * oh / h))
            r = resize_bilinear(v[None].astype(np.float32), oh, ow)[0]
            blobs.append(np.clip(np.rint(r), 0, 255).astype(np.uint8).tobytes())
            nh.append(oh)
            nw.append(ow)
        return pa.table(
            {
                "media_ref": batch.column("media_ref"),
                "image": pa.array(blobs, pa.binary()),
                "height": pa.array(nh, pa.int32()),
                "width": pa.array(nw, pa.int32()),
                "encoding": pa.array([RAW] * len(blobs)),
            }
        )


def sample_frames(batch: pa.Table, every_k: int = 2) -> pa.Table:
    """Frame-sample stage: a "video" row is ``n_frames`` raw frames of
    (height, width) concatenated in one binary payload; emit every k-th
    frame as its own media row (``media_ref#f<i>``) — flat_map shape,
    fully deterministic."""
    flat, offs = binary_column_view(batch.column("video"))
    hs = batch.column("height").to_numpy(zero_copy_only=False)
    ws = batch.column("width").to_numpy(zero_copy_only=False)
    nf = batch.column("n_frames").to_numpy(zero_copy_only=False)
    refs = batch.column("media_ref").to_pylist()
    out_ref, out_img, out_h, out_w = [], [], [], []
    for i in range(batch.num_rows):
        fsz = int(hs[i]) * int(ws[i])
        base = offs[i]
        for f in range(0, int(nf[i]), every_k):
            out_ref.append(f"{refs[i]}#f{f}")
            out_img.append(
                flat[base + f * fsz : base + (f + 1) * fsz].tobytes()
            )
            out_h.append(int(hs[i]))
            out_w.append(int(ws[i]))
    return pa.table(
        {
            "media_ref": pa.array(out_ref),
            "image": pa.array(out_img, pa.binary()),
            "height": pa.array(out_h, pa.int32()),
            "width": pa.array(out_w, pa.int32()),
            "encoding": pa.array([RAW] * len(out_ref)),
        }
    )


def media_features(media: rd.Dataset, concurrency=(1, 8)) -> rd.Dataset:
    return media.map_batches(
        ImageFeatures, batch_format="pyarrow", concurrency=concurrency
    )
