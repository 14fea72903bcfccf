"""Hot-key skew: one media_ref shared by many spans (the deduplicated
media-store scenario) — salted cogroup must spread the load AND produce
identical results."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from vietnamese_ocr_ray.oracle import extract_oracle
from vietnamese_ocr_ray.pipelines.extract import extract_spans
from vietnamese_ocr_ray.schema import DOCS_SCHEMA
from vietnamese_ocr_ray.stages.cogroup import _media_side, _spans_side
from vietnamese_ocr_ray.synth import render_text


def _hot_corpus(n_docs=60, hot_every=2):
    """Every ``hot_every``-th media span points at ONE shared media_ref."""
    hot_ref = "m-hot"
    hot_text = "shared"
    rng = np.random.default_rng(4)
    docs, media_rows = [], {}
    media_rows[hot_ref] = hot_text
    for d in range(n_docs):
        spans = []
        for k in range(6):
            if k % 2 == 0:
                if (d + k) % hot_every == 0:
                    ref, text = hot_ref, hot_text
                else:
                    ref = f"m-{d}-{k}"
                    text = "".join(rng.choice(list("abcxyz"), 5))
                    media_rows[ref] = text
                spans.append({"kind": "media", "text": "", "media_ref": ref, "offset": k})
            else:
                spans.append({"kind": "text", "text": f"t{d}k{k}", "media_ref": "", "offset": k})
        docs.append({"doc_id": f"doc-{d:04d}", "spans": spans})
    docs_t = pa.table(
        {
            "doc_id": pa.array([d["doc_id"] for d in docs]),
            "spans": pa.array([d["spans"] for d in docs], DOCS_SCHEMA.field("spans").type),
        }
    )
    refs = sorted(media_rows)
    imgs = {r: render_text(media_rows[r], 32) for r in refs}
    media_t = pa.table(
        {
            "media_ref": pa.array(refs),
            "image": pa.array([imgs[r].tobytes() for r in refs], pa.binary()),
            "height": pa.array([32] * len(refs), pa.int32()),
            "width": pa.array([imgs[r].shape[1] for r in refs], pa.int32()),
            "truth": pa.array([media_rows[r] for r in refs]),
        }
    )
    return docs_t, media_t


def canon(rows):
    return sorted(
        (
            r["doc_id"],
            tuple((s["kind"], s["text"], s["media_ref"], s["offset"]) for s in r["spans"]),
        )
        for r in rows
    )


@pytest.mark.parametrize("salt", [1, 4])
def test_salted_cogroup_matches_oracle(ray_session, salt):
    docs_t, media_t = _hot_corpus()
    golden = canon(extract_oracle(docs_t, media_t))
    out = extract_spans(
        rd.from_arrow(docs_t),
        rd.from_arrow(media_t.drop_columns(["truth"])),
        media_mode="cogroup",
        cogroup_buckets=8,
        cogroup_salt=salt,
        num_buckets=8,
    )
    assert canon(out.take_all()) == golden


def test_salt_spreads_hot_key():
    docs_t, media_t = _hot_corpus()
    from vietnamese_ocr_ray.stages.explode import explode_batch

    spans = explode_batch(docs_t)
    salted = _spans_side(spans, num_buckets=8, salt=4)
    hot = salted.filter(
        pa.compute.equal(salted.column("media_ref"), "m-hot")
    )
    assert len(set(hot.column("bucket").to_pylist())) > 1  # spread over sub-buckets
    # payload replicated into every sub-bucket it may be needed in
    media_salted = _media_side(media_t.drop_columns(["truth"]), 8, 4, [])
    hot_defs = media_salted.filter(
        pa.compute.equal(media_salted.column("media_ref"), "m-hot")
    )
    assert hot_defs.num_rows == 4
    assert set(hot.column("bucket").to_pylist()) <= set(
        hot_defs.column("bucket").to_pylist()
    )
