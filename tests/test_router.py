"""SpanRouter registry (SURVEY.md §2.9 extension surface): default
routing equals the fused RecognizeSpans stage; custom kinds plug in
without engine changes; unregistered kinds pass through."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from vietnamese_ocr_ray.stages.recognize import RecognizeSpans
from vietnamese_ocr_ray.stages.router import (
    SPAN_PROCESSORS,
    SpanRouter,
    register_span_processor,
)


def _joined_batch(n_docs=40):
    """A batch shaped like cogroup output: text + media spans with
    payload columns attached to media rows."""
    from vietnamese_ocr_ray.synth import synth_corpus

    docs, media = synth_corpus(n_docs, seed=5)
    lookup = {
        m["media_ref"]: (m["image"], m["height"], m["width"])
        for m in media.to_pylist()
    }
    rows = []
    for d in docs.to_pylist():
        for s in d["spans"]:
            r = {
                "doc_id": d["doc_id"],
                "offset": s["offset"],
                "kind": s["kind"],
                "text": s["text"],
                "media_ref": s["media_ref"],
            }
            if s["kind"] == "media":
                img, h, w = lookup[s["media_ref"]]
                r.update(image=img, height=h, width=w)
            else:
                r.update(image=None, height=None, width=None)
            rows.append(r)
    t = pa.Table.from_pylist(rows)
    return t.set_column(
        t.schema.get_field_index("image"),
        "image",
        t.column("image").cast(pa.binary()),
    )


def _sorted(t: pa.Table) -> pa.Table:
    return t.select(sorted(t.column_names)).sort_by(
        [("doc_id", "ascending"), ("offset", "ascending")]
    )


def test_default_registry_equals_recognize_spans(ray_session):
    batch = _joined_batch()
    got = SpanRouter()(batch)
    want = RecognizeSpans()(batch)
    assert _sorted(got).equals(_sorted(want))


def test_custom_kind_plugs_in():
    @register_span_processor("shout")
    class Shouter:
        def __call__(self, rows):
            up = pc.utf8_upper(rows.column("text"))
            return rows.set_column(
                rows.schema.get_field_index("text"), "text", up
            )

    try:
        batch = pa.table(
            {
                "doc_id": ["d1", "d1"],
                "offset": pa.array([0, 1], pa.int32()),
                "kind": ["shout", "mystery"],
                "text": ["hello", "opaque"],
                "media_ref": ["", ""],
            }
        )
        out = SpanRouter()(batch).to_pylist()
        by_off = {r["offset"]: r["text"] for r in out}
        assert by_off[0] == "HELLO"  # custom processor applied
        assert by_off[1] == "opaque"  # unregistered kind passes through
    finally:
        SPAN_PROCESSORS.pop("shout", None)


def test_extract_spans_router_path_matches_default(ray_session):
    import ray.data as rd

    from vietnamese_ocr_ray.pipelines.extract import extract_spans
    from vietnamese_ocr_ray.synth import synth_corpus

    docs, media = synth_corpus(30, seed=9)
    base = extract_spans(
        rd.from_arrow(docs),
        rd.from_arrow(media),
        media_mode="cogroup",
        cogroup_buckets=8,
        num_buckets=4,
    ).to_pandas()
    routed = extract_spans(
        rd.from_arrow(docs),
        rd.from_arrow(media),
        media_mode="cogroup",
        cogroup_buckets=8,
        num_buckets=4,
        span_processors=True,
    ).to_pandas()
    base = base.sort_values("doc_id").reset_index(drop=True)
    routed = routed.sort_values("doc_id").reset_index(drop=True)
    assert base.equals(routed)
