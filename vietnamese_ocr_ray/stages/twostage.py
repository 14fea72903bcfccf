"""Two-stage media pipeline: detection actor pool -> recognition actor
pool — the north-star GPU shape (DBNet-style text-box detection, then
Transformer/seq2seq recognition), each stage a ``map_batches`` over
zero-copy Arrow with its own pool so detection and recognition GPUs can
be sized independently (``num_gpus`` per stage on a real cluster).

Stage 1 preprocesses raw media and detects the content box, emitting
the model-ready canvas as EXACT uint8 (canvas values are v/255 with
integer v, so the uint8 handoff is lossless) plus box geometry columns.
Stage 2 reads features from the detected boxes and decodes. Output is
identical to the fused single-stage RecognizeSpans path (tested).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from vietnamese_ocr_ray.model import DeterministicRecognizer
from vietnamese_ocr_ray.preprocess import IMG_H, IMG_W, binary_column_view, preprocess_batch
from vietnamese_ocr_ray.stages.recognize import _set_text, fill_empty, normalize_text_array
from vietnamese_ocr_ray.vocab import Vocabulary


class DetectSpans:
    """Stage 1: preprocess media payloads + detect content boxes.

    Text spans pass through untouched (canvas/box columns null).
    Output columns: + canvas (binary, 64*256 uint8), box_lo (int32),
    n_bands (int32); payload columns (image/height/width) dropped.
    """

    def __init__(self, vocab: Vocabulary | None = None):
        self.model = DeterministicRecognizer(vocab)

    def __call__(self, batch: pa.Table) -> pa.Table:
        is_media = pc.equal(batch.column("kind"), "media")
        media_rows = batch.filter(is_media)
        text_rows = batch.filter(pc.invert(is_media))
        keep = [c for c in batch.column_names if c not in ("image", "height", "width")]

        n_t = text_rows.num_rows
        text_out = text_rows.select(keep)
        text_out = text_out.append_column("canvas", pa.nulls(n_t, pa.binary()))
        text_out = text_out.append_column("box_lo", pa.nulls(n_t, pa.int32()))
        text_out = text_out.append_column("n_bands", pa.nulls(n_t, pa.int32()))

        if media_rows.num_rows:
            refs = media_rows.column("media_ref").to_pylist()
            hs = media_rows.column("height").to_numpy(zero_copy_only=False)
            ws = media_rows.column("width").to_numpy(zero_copy_only=False)
            x = preprocess_batch(
                binary_column_view(media_rows.column("image")), hs, ws, refs
            )
            lo, nbands = self.model.detect(x)
            canvas_u8 = np.rint(x * 255.0).astype(np.uint8)  # lossless: x = v/255
            flat = canvas_u8.reshape(len(refs), -1)
            offsets = np.arange(0, (len(refs) + 1) * flat.shape[1], flat.shape[1], dtype=np.int32)
            canvas_arr = pa.BinaryArray.from_buffers(
                pa.binary(),
                len(refs),
                [None, pa.py_buffer(offsets.tobytes()), pa.py_buffer(flat.tobytes())],
            )
            media_out = media_rows.select(keep)
            media_out = media_out.append_column("canvas", canvas_arr)
            media_out = media_out.append_column("box_lo", pa.array(lo, pa.int32()))
            media_out = media_out.append_column("n_bands", pa.array(nbands, pa.int32()))
        else:
            media_out = text_out.slice(0, 0)

        return pa.concat_tables([text_out, media_out])


class RecognizeBoxes:
    """Stage 2: decode text from detected boxes; normalize text spans;
    drop the stage-1 handoff columns."""

    def __init__(self, vocab: Vocabulary | None = None):
        self.model = DeterministicRecognizer(vocab)

    def __call__(self, batch: pa.Table) -> pa.Table:
        is_media = pc.equal(batch.column("kind"), "media")
        media_rows = batch.filter(is_media)
        text_rows = batch.filter(pc.invert(is_media))
        text_rows = _set_text(text_rows, normalize_text_array(text_rows.column("text")))

        if media_rows.num_rows:
            flat, offs = binary_column_view(media_rows.column("canvas"))
            n = media_rows.num_rows
            x = (
                flat[offs[0] : offs[-1]]
                .reshape(n, IMG_H, IMG_W)
                .astype(np.float32)
                / np.float32(255.0)
            )
            lo = media_rows.column("box_lo").to_numpy(zero_copy_only=False).astype(np.int32)
            nb = media_rows.column("n_bands").to_numpy(zero_copy_only=False).astype(np.int32)
            features, lengths = self.model.read_features(x, lo, nb)
            seqs, seq_len = self.model.greedy_decode(features, lengths)
            texts = fill_empty(
                self.model.vocab.decode_matrix(
                    features, np.minimum(lengths, features.shape[1])
                )
            )
            media_rows = _set_text(media_rows, texts)

        keep = [
            c
            for c in batch.column_names
            if c not in ("canvas", "box_lo", "n_bands")
        ]
        return pa.concat_tables([text_rows.select(keep), media_rows.select(keep)])
