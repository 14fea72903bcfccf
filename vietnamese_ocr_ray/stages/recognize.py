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

    # media rows per inference sub-batch: bounds the preprocess canvas
    # (MEDIA_CHUNK x 32 x 128 floats = 64 MB) so compute efficiency is
    # independent of Ray's block/bundle sizing — a 74k-span block would
    # otherwise fault a 400 MB canvas per task and fall out of cache
    # (measured 0.94 -> 1.28 ms/doc going 1024 -> 2048-doc bundles)
    MEDIA_CHUNK = 4096

    def _recognize_media(self, media_rows: pa.Table) -> pa.Table:
        """Per-row results are batch-independent (model property,
        SURVEY.md §2.3 T3), so chunking cannot change outputs."""
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
        def _slice_imgs(s: int, e: int):
            if isinstance(imgs, tuple):  # zero-copy (data, offsets) view
                data, offs = imgs
                return (data, offs[s : e + 1])
            return imgs[s:e]

        chunks = []
        for s in range(0, len(refs), self.MEDIA_CHUNK):
            e = min(s + self.MEDIA_CHUNK, len(refs))
            x = preprocess_batch(
                _slice_imgs(s, e),
                hs[s:e],
                ws[s:e],
                refs[s:e],
                out=self._scratch(e - s),
                band=self._band,
            )
            chunks.append(
                fill_empty(
                    self.model.recognize_texts(
                        x, decode=self.decode, beam_width=self.beam_width
                    )
                )
            )
        texts = (
            chunks[0]
            if len(chunks) == 1
            else pa.concat_arrays([c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c for c in chunks])
        )
        return _set_text(media_rows, texts)

    def __call__(self, batch: pa.Table) -> pa.Table:
        is_media = pc.equal(batch.column("kind"), "media")
        media_rows = batch.filter(is_media)
        text_rows = batch.filter(pc.invert(is_media))

        text_rows = _set_text(
            text_rows, normalize_text_array(text_rows.column("text"))
        )

        if media_rows.num_rows:
            media_rows = self._recognize_media(media_rows)

        out_cols = [c for c in batch.column_names if c not in ("image", "height", "width")]
        return pa.concat_tables(
            [text_rows.select(out_cols), media_rows.select(out_cols)]
        )


_PROCESS_MAPJOIN: "dict[str, RecognizeSpansMapJoin]" = {}


def recognize_spans_mapjoin_task(batch: pa.Table, bucket_dir: str) -> pa.Table:
    """Task-pool variant of RecognizeSpansMapJoin (same rationale as
    recognize_spans_task: worker-process-global state, CPU-elastic
    under the streaming executor)."""
    st = _PROCESS_MAPJOIN.get(bucket_dir)
    if st is None:
        st = _PROCESS_MAPJOIN.setdefault(
            bucket_dir, RecognizeSpansMapJoin(bucket_dir)
        )
    return st(batch)


class RecognizeSpansMapJoin(RecognizeSpans):
    """Map-side payload attach + recognition in ONE actor: media
    payloads come from the ``write_media_bucketed`` storage layout,
    each bucket file read on first touch and LRU-cached per actor.
    Payload bytes never enter any exchange and never cross a stage
    boundary — the zero-media-shuffle scale path (the cogroup /
    copartitioned modes move span rows through a bucket sort first;
    this mode recognizes in place, so with doc-complete input
    fragments the pipeline's only remaining exchange is reassembly).

    Partitioning assumptions (documented per SURVEY.md §4): the
    storage layout's bucket count bounds per-read memory — one bucket
    file must fit the actor heap; ``cache_buckets`` bounds resident
    payload (LRU eviction); read amplification is at most
    (actors x buckets touched) bucket-file reads per job, served from
    page cache / object storage range reads.
    """

    def __init__(
        self,
        bucket_dir: str,
        cache_buckets: int = 64,
        **kwargs,
    ):
        super().__init__(**kwargs)
        from vietnamese_ocr_ray.sources.storage import media_bucket_count

        self.bucket_dir = bucket_dir
        self.num_buckets = media_bucket_count(bucket_dir)
        self.cache_buckets = cache_buckets
        self._buckets: "dict[int, dict]" = {}  # insertion-ordered LRU

    def _bucket_dict(self, bk: int) -> dict:
        cached = self._buckets.pop(bk, None)
        if cached is not None:
            self._buckets[bk] = cached  # refresh LRU position
            return cached
        import os

        import pyarrow.parquet as pq

        path = os.path.join(self.bucket_dir, f"bucket={bk}.parquet")
        if os.path.exists(path):
            t = pq.read_table(
                path, columns=["media_ref", "image", "height", "width"]
            )
            d = dict(
                zip(
                    t.column("media_ref").to_pylist(),
                    zip(
                        t.column("image").to_pylist(),
                        t.column("height").to_pylist(),
                        t.column("width").to_pylist(),
                    ),
                )
            )
        else:  # no media hashed into this bucket
            d = {}
        while len(self._buckets) >= self.cache_buckets:
            self._buckets.pop(next(iter(self._buckets)))
        self._buckets[bk] = d
        return d

    def __call__(self, batch: pa.Table) -> pa.Table:
        from vietnamese_ocr_ray.stages.explode import fnv1a_bucket

        is_media = pc.equal(batch.column("kind"), "media")
        media_refs = batch.filter(is_media).column("media_ref")
        if media_refs.length():
            if isinstance(media_refs, pa.ChunkedArray):
                media_refs = media_refs.combine_chunks()
            bks = np.unique(fnv1a_bucket(media_refs, self.num_buckets))
            lookup: dict = {}
            for bk in bks:
                lookup.update(self._bucket_dict(int(bk)))
            self.media = lookup
            try:
                return super().__call__(batch)
            except KeyError as e:
                raise ValueError(
                    f"media payload missing from bucketed store "
                    f"{self.bucket_dir}: ref {e.args[0]!r}"
                ) from e
            finally:
                self.media = None
        return super().__call__(batch)
