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
    """Per-image scalar features — the feature-extract stage shape:
    vectorized over each image, metadata-only output (no payload
    re-emitted). Emits EXACT integer moments (pixel_sum, pixel_sq_sum,
    edge_count, n_pixels — order-independent, mergeable, and
    bit-reproducible by a SQL oracle) alongside the derived float
    conveniences (mean/std intensity, horizontal edge density)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        views, hs, ws = _decode_views(batch)
        n = len(views)
        psum = np.empty(n, np.int64)
        psq = np.empty(n, np.int64)
        edges = np.empty(n, np.int64)
        npx = np.empty(n, np.int64)
        for i, v in enumerate(views):
            x = v.astype(np.int64)
            psum[i] = x.sum()
            psq[i] = (x * x).sum()
            d = np.abs(np.diff(x, axis=1))
            edges[i] = int((d > 32).sum())
            npx[i] = x.size
        safe = np.maximum(npx, 1).astype(np.float64)
        mean = psum / safe
        var = np.maximum(psq / safe - mean * mean, 0.0)
        n_adj = np.maximum(npx - hs.astype(np.int64), 1).astype(np.float64)
        return pa.table(
            {
                "media_ref": batch.column("media_ref"),
                "pixel_sum": pa.array(psum),
                "pixel_sq_sum": pa.array(psq),
                "edge_count": pa.array(edges),
                "n_pixels": pa.array(npx),
                "mean_intensity": pa.array(np.round(mean, 4)),
                "std_intensity": pa.array(np.round(np.sqrt(var), 4)),
                "edge_density": pa.array(np.round(edges / n_adj, 4)),
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


def make_videos(batch: pa.Table) -> pa.Table:
    """Deterministic synthetic "videos" from the media table — the
    video analog of synth.py's text→image renderer, built so the frame
    pipeline (frame-sample → feature-extract) is SQL-verifiable end to
    end. Every second media row (offset % 2 == 0) becomes one video of
    ``n_frames = 2 + (doc + offset) % 4`` frames; frame ``f`` is the
    base band image with every CHAR-BAND pixel darkened by ``f``
    (background 255 and terminator 0 untouched), so each frame's exact
    integer moments are closed-form deltas of the base image's:
    ``pixel_sum(f) = pixel_sum - f·n_band``,
    ``pixel_sq_sum(f) = pixel_sq_sum - 2f·S_band + f²·n_band``,
    ``edge_count(f) = edge_count`` (all band-boundary contrasts ≥ 40).
    Payload = frames concatenated C-order in one binary value (the
    container shape :func:`sample_frames` consumes)."""
    flat, offs = binary_column_view(batch.column("image"))
    hs = batch.column("height").to_numpy(zero_copy_only=False)
    ws = batch.column("width").to_numpy(zero_copy_only=False)
    refs = batch.column("media_ref").to_pylist()
    out_ref, out_vid, out_h, out_w, out_nf = [], [], [], [], []
    for i, ref in enumerate(refs):
        parts = ref.split("-")
        did, off = int(parts[1]), int(parts[2])
        if off % 2 != 0:
            continue
        base = flat[offs[i] : offs[i + 1]]
        n_frames = 2 + (did + off) % 4
        band = (base != 255) & (base != 0)
        frames = np.repeat(base[None, :], n_frames, axis=0)
        frames -= np.where(band[None, :], np.arange(n_frames, dtype=np.uint8)[:, None], 0)
        out_ref.append(f"v-{did}-{off}")
        out_vid.append(frames.tobytes())
        out_h.append(int(hs[i]))
        out_w.append(int(ws[i]))
        out_nf.append(n_frames)
    return pa.table(
        {
            "media_ref": pa.array(out_ref, pa.string()),
            "video": pa.array(out_vid, pa.binary()),
            "height": pa.array(out_h, pa.int32()),
            "width": pa.array(out_w, pa.int32()),
            "n_frames": pa.array(out_nf, pa.int32()),
            "encoding": pa.array([RAW] * len(out_ref)),
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


class ImageAHash:
    """Average-hash perceptual fingerprint (the classic aHash of image
    near-dup pipelines): mean-pool each image to an 8x8 grid with
    exact box sums (cumsum-based integral image — deterministic,
    interpolation-free), threshold at the grid mean, pack the 64 bits
    row-major into one int64. Visually identical images collide;
    unrelated ones differ in ~32 bits. Stateless per batch; metadata-
    only output (payload never re-emitted)."""

    GRID = 8

    def hash_one(self, v: np.ndarray) -> int:
        """Bit (r, c) set iff the cell's mean intensity exceeds the
        image's GLOBAL mean — stated as the integer cross-product
        ``cell_sum * n_pixels > total_sum * cell_area`` so the hash is
        exact (no float division / summation order) and restatable by
        an integer SQL oracle. Safe for images up to ~1.9e8 px
        (255 * npx^2 must fit int64)."""
        g = self.GRID
        ii = np.zeros((v.shape[0] + 1, v.shape[1] + 1), dtype=np.int64)
        np.cumsum(v, axis=0, out=ii[1:, 1:])
        np.cumsum(ii[1:, 1:], axis=1, out=ii[1:, 1:])
        ys = np.linspace(0, v.shape[0], g + 1).astype(np.int64)
        xs = np.linspace(0, v.shape[1], g + 1).astype(np.int64)
        sums = (
            ii[ys[1:], :][:, xs[1:]]
            - ii[ys[:-1], :][:, xs[1:]]
            - ii[ys[1:], :][:, xs[:-1]]
            + ii[ys[:-1], :][:, xs[:-1]]
        )
        areas = (ys[1:] - ys[:-1])[:, None] * (xs[1:] - xs[:-1])[None, :]
        total = int(ii[-1, -1])
        npx = int(v.shape[0]) * int(v.shape[1])
        bits = (sums * npx > total * areas).astype(np.uint64).ravel()
        return int(
            (bits << np.arange(64, dtype=np.uint64)).sum(dtype=np.uint64)
            .astype(np.int64)
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        views, _, _ = _decode_views(batch)
        hashes = np.fromiter(
            (self.hash_one(v) for v in views), dtype=np.int64, count=len(views)
        )
        return pa.table(
            {
                "media_ref": batch.column("media_ref"),
                "ahash": pa.array(hashes),
            }
        )


def media_ahash(media: rd.Dataset, concurrency=(1, 8)) -> rd.Dataset:
    return media.map_batches(
        ImageAHash, batch_format="pyarrow", concurrency=concurrency
    )


class ImageColHash(ImageAHash):
    """Column-profile perceptual hash: 64 x-cells x 1 y-cell, same
    integer bit rule as :class:`ImageAHash` (cell_sum * n_pixels >
    total_sum * cell_area). For wide line images (text lines, receipts,
    scans) the vertical axis is near-uniform, so the classic 8x8 grid
    collapses to 8 effective bits; the 64-cell column profile keeps a
    full 64 bits of horizontal structure and produces genuine NEAR
    collisions (small Hamming distances) between similar lines, which
    is what the banded Hamming search needs. Exact-integer → SQL-
    restatable (the driver oracles media_neardup/dedup through it)."""

    def hash_one(self, v: np.ndarray) -> int:
        x = v.astype(np.int64)
        col = x.sum(axis=0)  # column sums
        csum = np.zeros(v.shape[1] + 1, dtype=np.int64)
        np.cumsum(col, out=csum[1:])
        xs = np.linspace(0, v.shape[1], 65).astype(np.int64)
        sums = csum[xs[1:]] - csum[xs[:-1]]
        areas = int(v.shape[0]) * (xs[1:] - xs[:-1])
        total = int(csum[-1])
        npx = int(v.shape[0]) * int(v.shape[1])
        bits = (sums * npx > total * areas).astype(np.uint64)
        return int(
            (bits << np.arange(64, dtype=np.uint64)).sum(dtype=np.uint64)
            .astype(np.int64)
        )


def media_colhash(media: rd.Dataset, concurrency=(1, 8)) -> rd.Dataset:
    return media.map_batches(
        ImageColHash, batch_format="pyarrow", concurrency=concurrency
    )


# ---------------------------------------------------------------------------
# audio: raw PCM16 payloads — fully computable (no codec needed)
# ---------------------------------------------------------------------------


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 avalanche (same constants as sketch.HllSketch), used
    as the audio noise source because it is an exact-integer function
    an independent replay (the DuckDB oracle) can recompute bit-for-bit
    — a PCG stream from np.random cannot be restated in SQL."""
    z = (x + np.uint64(0x9E3779B97F4A7C15)).astype(np.uint64)
    z ^= z >> np.uint64(30)
    z *= np.uint64(0xBF58476D1CE4E5B9)
    z ^= z >> np.uint64(27)
    z *= np.uint64(0x94D049BB133111EB)
    z ^= z >> np.uint64(31)
    return z


def synth_audio(doc_ids, n_chars, sample_rate: int = 8000) -> pa.Table:
    """Deterministic per-doc PCM16 clip: a seeded sine + hash-derived
    uniform noise whose length scales with the doc's char count (one
    clip per doc; the audio analog of synth.py's text->image renderer).
    Noise sample i of doc d = splitmix64(seed(d) + i) mapped to [-1, 1)
    via its top 53 bits — exact-integer construction, so the clip bytes
    are a closed-form function of (doc_id, n_chars) the SQL oracle can
    replay."""
    refs, blobs, srs, ns = [], [], [], []
    for doc_id, nc in zip(doc_ids, n_chars):
        n = int(min(4000, 200 + 4 * int(nc)))
        seed0 = np.uint64(int(doc_id) * 2654435761 % (1 << 32))
        t = np.arange(n, dtype=np.float64)
        freq = 100.0 + (int(doc_id) % 37) * 10.0
        wave = 0.5 * np.sin(2 * np.pi * freq * t / sample_rate)
        with np.errstate(over="ignore"):
            h = _splitmix64(seed0 + np.arange(n, dtype=np.uint64))
        noise = (h >> np.uint64(11)).astype(np.float64) * 2.0**-53 * 2.0 - 1.0
        wave += 0.1 * noise
        pcm = np.clip(np.rint(wave * 32767), -32768, 32767).astype("<i2")
        refs.append(f"a-{doc_id}")
        blobs.append(pcm.tobytes())
        srs.append(sample_rate)
        ns.append(n)
    return pa.table(
        {
            "media_ref": pa.array(refs),
            "audio": pa.array(blobs, pa.binary()),
            "sample_rate": pa.array(srs, pa.int32()),
            "n_samples": pa.array(ns, pa.int32()),
            "encoding": pa.array(["pcm16le"] * len(refs)),
        }
    )


class AudioFeatures:
    """Per-clip scalar features over raw little-endian PCM16 payloads —
    REAL decode (a dtype view, no codec): duration, RMS level, peak,
    zero-crossing count. Whole-batch vectorized over the flat binary
    buffer with ``np.add.reduceat`` — no per-clip Python loop. The
    stage shape (actor pool, metadata-out) matches ImageFeatures;
    compressed codecs (mp3/opus/...) would gate at this seam exactly
    like the image decode stub."""

    SUPPORTED = "pcm16le"

    def __call__(self, batch: pa.Table) -> pa.Table:
        enc = batch.column("encoding") if "encoding" in batch.column_names else None
        if enc is not None:
            bad = set(enc.to_pylist()) - {self.SUPPORTED}
            if bad:
                raise NotImplementedError(
                    f"audio codecs unavailable in this sandbox: {sorted(bad)}"
                )
        flat, offs = binary_column_view(batch.column("audio"))
        pcm = flat.view("<i2").astype(np.float64)  # all clips, one buffer
        offs2 = offs // 2  # sample offsets
        n = batch.num_rows
        counts = (offs2[1:] - offs2[:-1]).astype(np.int64)
        starts = offs2[:-1]
        safe_starts = np.minimum(starts, max(pcm.shape[0] - 1, 0))
        sq = np.add.reduceat(pcm * pcm, safe_starts) if pcm.size else np.zeros(n)
        sq[counts == 0] = 0.0
        signs = np.signbit(pcm).astype(np.int8)
        flips = np.zeros(pcm.shape[0], dtype=np.int64)
        if pcm.size > 1:
            flips[1:] = (signs[1:] != signs[:-1]).astype(np.int64)
        # zero-crossings must not count across clip boundaries
        if pcm.size:
            flips[safe_starts] = 0
        zc = np.add.reduceat(flips, safe_starts) if pcm.size else np.zeros(n)
        zc[counts == 0] = 0
        absmax = (
            np.maximum.reduceat(np.abs(pcm), safe_starts)
            if pcm.size
            else np.zeros(n)
        )
        absmax[counts == 0] = 0.0
        sr = batch.column("sample_rate").to_numpy(zero_copy_only=False)
        rms = np.sqrt(sq / np.maximum(counts, 1))
        return pa.table(
            {
                "media_ref": batch.column("media_ref"),
                "duration_s": pa.array(
                    np.round(counts / sr.astype(np.float64), 6)
                ),
                "rms": pa.array(np.round(rms, 4)),
                "peak": pa.array(absmax.astype(np.int64)),
                "zero_crossings": pa.array(zc.astype(np.int64)),
            }
        )


def audio_features(audio: rd.Dataset, concurrency=(1, 8)) -> rd.Dataset:
    return audio.map_batches(
        AudioFeatures, batch_format="pyarrow", concurrency=concurrency
    )
