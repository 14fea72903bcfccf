"""Pluggable span-processor registry — the engine's user-extension
surface (SURVEY.md §2.9). The reference selects its encoder by a config
string from a fixed registry (src/model/model.py:80-114); this engine
generalizes that pattern to the span level: processors are registered
per span ``kind`` and a router stage applies them batch-wise.

A processor is any callable ``pa.Table -> pa.Table`` over the rows of
one kind (payload columns included on input, ignored on output); it is
constructed ONCE per actor/worker (stateful processors load their
model in ``__init__``, exactly like RecognizeSpans). Unregistered
kinds pass through unchanged — adding a new media type to the pipeline
is one ``@register_span_processor("audio")`` away, no engine changes.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from vietnamese_ocr_ray.stages.recognize import (
    RecognizeSpans,
    _set_text,
    normalize_text_array,
)

PAYLOAD_COLS = ("image", "height", "width")

SPAN_PROCESSORS: dict[str, callable] = {}


def register_span_processor(kind: str):
    """Class/factory decorator: ``SPAN_PROCESSORS[kind] = factory``.
    The factory is called with no arguments once per router actor."""

    def deco(factory):
        SPAN_PROCESSORS[kind] = factory
        return factory

    return deco


@register_span_processor("text")
class TextNormalizer:
    """Default text processor: NFC normalization (M12)."""

    def __call__(self, rows: pa.Table) -> pa.Table:
        return _set_text(rows, normalize_text_array(rows.column("text")))


# Default media processor: the full preprocess+recognize stage —
# RecognizeSpans already handles media-only batches (its text branch
# is simply empty), so it doubles as the per-kind processor.
SPAN_PROCESSORS["media"] = RecognizeSpans


class SpanRouter:
    """Actor-pool/task stage that dispatches each batch's rows to the
    per-kind processors. ``processors`` overrides the global registry
    (a dict of kind -> zero-arg factory); construction happens here,
    once per actor, so stateful processors keep the load-once pattern.
    """

    def __init__(self, processors: dict | None = None):
        reg = SPAN_PROCESSORS if processors is None else processors
        self.procs = {k: factory() for k, factory in reg.items()}

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_cols = [c for c in batch.column_names if c not in PAYLOAD_COLS]
        kinds = batch.column("kind")
        parts = []
        for k in pc.unique(kinds).to_pylist():
            rows = batch.filter(pc.equal(kinds, k))
            proc = self.procs.get(k)
            res = proc(rows) if proc is not None else rows
            parts.append(res.select(out_cols))
        if not parts:
            return batch.select(out_cols)
        return pa.concat_tables(parts)
