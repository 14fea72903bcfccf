"""Span-processing stages: kind-routing, text normalization, and the
stateful OCR recognition actor.

The recognition stage is a callable CLASS — Ray Data runs it as an
actor pool so the model is constructed once per worker (the analog of
loading the 269 MB checkpoint in Inference.__init__, reference
src/utils/inference.py:20-42) and reused across batches.

Per-row outputs are independent of batch composition (model property,
SURVEY.md §2.3 T3), so Ray's block/batch boundaries cannot change
results.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from vietnamese_ocr_ray.model import DeterministicRecognizer
from vietnamese_ocr_ray.preprocess import (
    IMG_H,
    IMG_W,
    binary_column_view,
    preprocess_batch,
)
from vietnamese_ocr_ray.vocab import Vocabulary

SPAN_COLS = ("doc_id", "offset", "kind", "text", "media_ref")


_PROCESS_STAGE: "RecognizeSpans | None" = None


def recognize_spans_task(batch: pa.Table) -> pa.Table:
    """Task-pool variant of RecognizeSpans: the model is cached once per
    WORKER PROCESS (module global) instead of once per actor — the same
    load-state-once semantics without reserving CPUs while idle, so the
    streaming executor can rebalance CPUs between recognition and the
    shuffles. Prefer the actor-pool class when per-worker state is
    heavyweight (real model weights, GPUs); prefer this when state is
    cheap and elasticity matters."""
    global _PROCESS_STAGE
    if _PROCESS_STAGE is None:
        _PROCESS_STAGE = RecognizeSpans()
    return _PROCESS_STAGE(batch)


def normalize_text_array(arr: pa.ChunkedArray | pa.Array) -> pa.ChunkedArray | pa.Array:
    """Pass-through normalization for text spans: unicode NFC
    (north_rule "text spans pass through normalization"; the reference
    passes label text through unmodified, src/utils/vocab.py:22)."""
    return pc.utf8_normalize(arr, form="NFC")


def fill_empty(texts: pa.Array) -> pa.Array:
    """empty prediction -> "a" (reference src/utils/inference.py:107-110)."""
    return pc.if_else(pc.equal(pc.utf8_length(texts), 0), pa.scalar("a"), texts)


def _set_text(batch: pa.Table, texts) -> pa.Table:
    return batch.set_column(
        batch.schema.get_field_index("text"), "text", texts
    )


class RecognizeSpans:
    """Fused routing stage: media spans -> preprocess + recognize +
    empty-fill; text spans -> NFC normalization. One streaming pass.

    Media payloads arrive either inline (columns image/height/width
    from an upstream join — the scale path) or via a broadcast lookup
    (``media_handle``: a ray.put ObjectRef of {media_ref: (bytes, h, w)}
    — the small-media path; fetched ONCE per actor here in __init__,
    never per batch).
    """

    def __init__(
        self,
        media_handle=None,
        vocab: Vocabulary | None = None,
        decode: str = "greedy",
        beam_width: int = 4,
    ):
        self.model = DeterministicRecognizer(vocab)
        self.decode = decode  # "greedy" (vectorized default) | "beam"
        self.beam_width = beam_width
        self.media = None
        self._canvas = np.empty((0, 1, 1), dtype=np.float32)
        self._band = [0, 0]
        if media_handle is not None:
            import ray

            self.media = ray.get(media_handle)

    def _scratch(self, n: int) -> np.ndarray:
        """Reusable canvas buffer (first-touch faulting of fresh
        allocations is expensive in this sandbox — see NOTES.md).
        ``_band`` tracks the dirty column extent so preprocess_batch
        re-zeros only what a previous batch wrote."""
        if self._canvas.shape[0] < n or self._canvas.shape[1] != IMG_H:
            self._canvas = np.zeros(
                (int(n * 1.25) + 1, IMG_H, IMG_W), dtype=np.float32
            )
            self._band = [0, 0]  # freshly zeroed
        return self._canvas

    def __call__(self, batch: pa.Table) -> pa.Table:
        is_media = pc.equal(batch.column("kind"), "media")
        media_rows = batch.filter(is_media)
        text_rows = batch.filter(pc.invert(is_media))

        text_rows = _set_text(
            text_rows, normalize_text_array(text_rows.column("text"))
        )

        if media_rows.num_rows:
            refs = media_rows.column("media_ref").to_pylist()
            if self.media is not None:
                payload = [self.media[r] for r in refs]
                imgs = [p[0] for p in payload]
                hs = np.array([p[1] for p in payload], dtype=np.int64)
                ws = np.array([p[2] for p in payload], dtype=np.int64)
            else:
                img_col = media_rows.column("image")
                nulls = pc.is_null(img_col)
                if pc.any(nulls).as_py():
                    missing = media_rows.filter(nulls).column("media_ref")
                    raise ValueError(
                        f"media payload missing for refs: {missing.to_pylist()[:5]} ..."
                    )
                imgs = binary_column_view(img_col)
                hs = media_rows.column("height").to_numpy(zero_copy_only=False)
                ws = media_rows.column("width").to_numpy(zero_copy_only=False)
            x = preprocess_batch(
                imgs, hs, ws, refs, out=self._scratch(len(refs)), band=self._band
            )
            texts = fill_empty(
                self.model.recognize_texts(
                    x, decode=self.decode, beam_width=self.beam_width
                )
            )
            media_rows = _set_text(media_rows, texts)

        out_cols = [c for c in batch.column_names if c not in ("image", "height", "width")]
        return pa.concat_tables(
            [text_rows.select(out_cols), media_rows.select(out_cols)]
        )
