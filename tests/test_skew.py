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


@pytest.mark.parametrize("compute", ["actors", "tasks"])
def test_mapjoin_matches_oracle(ray_session, tmp_path, compute):
    """media_mode='mapjoin' (payload attach inside the recognize stage
    from the bucketed store — zero media shuffle) must equal the oracle
    and therefore the cogroup path, including on the hot-key corpus."""
    import os

    import pyarrow.parquet as pq

    from vietnamese_ocr_ray.sources.storage import write_media_bucketed

    docs_t, media_t = _hot_corpus()
    golden = canon(extract_oracle(docs_t, media_t))
    mp = str(tmp_path / "media.parquet")
    pq.write_table(media_t, mp)
    bd = write_media_bucketed(mp, str(tmp_path / "bucketed"), 8)
    out = extract_spans(
        rd.from_arrow(docs_t),
        bd,
        media_mode="mapjoin",
        num_buckets=8,
        recognize_batch_size=64,  # several bucket fetches per actor
        recognize_compute=compute,
    )
    assert canon(out.take_all()) == golden


def test_mapjoin_lru_eviction_preserves_results(ray_session, tmp_path):
    """cache_buckets smaller than the buckets touched forces LRU
    eviction + re-read inside the recognize actor — results must be
    identical to the unbounded cache (the 100 TB memory-bound path)."""
    import pyarrow.parquet as pq

    from vietnamese_ocr_ray.sources.storage import write_media_bucketed
    from vietnamese_ocr_ray.stages.recognize import RecognizeSpansMapJoin
    from vietnamese_ocr_ray.stages.explode import explode_batch

    docs_t, media_t = _hot_corpus()
    golden = canon(extract_oracle(docs_t, media_t))
    mp = str(tmp_path / "media.parquet")
    pq.write_table(media_t, mp)
    bd = write_media_bucketed(mp, str(tmp_path / "bucketed"), 8)

    from vietnamese_ocr_ray.stages.explode import reassemble

    exploded = rd.from_arrow(docs_t).map_batches(
        explode_batch, batch_format="pyarrow"
    )
    out = exploded.map_batches(
        RecognizeSpansMapJoin,
        batch_format="pyarrow",
        batch_size=32,  # many small batches -> many bucket touches
        concurrency=1,  # ONE actor so its tiny cache must evict
        fn_constructor_kwargs={"bucket_dir": bd, "cache_buckets": 2},
    )
    packed = reassemble(out, num_buckets=8)
    assert canon(packed.take_all()) == golden


def test_mapjoin_missing_media_raises(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from vietnamese_ocr_ray.sources.storage import write_media_bucketed

    docs_t, media_t = _hot_corpus()
    pruned = media_t.slice(0, media_t.num_rows - 5)  # drop some payloads
    mp = str(tmp_path / "media.parquet")
    pq.write_table(pruned, mp)
    bd = write_media_bucketed(mp, str(tmp_path / "bucketed"), 8)
    out = extract_spans(
        rd.from_arrow(docs_t), bd, media_mode="mapjoin", num_buckets=8
    )
    with pytest.raises(Exception, match="media payload missing"):
        out.materialize()


def _mega_text_doc(n_spans: int) -> pa.Table:
    """One doc with ``n_spans`` text spans — enough to overflow the
    packed-row span cap (SURVEY.md §7.3's known-hard 10^6-span doc)."""
    off = np.arange(n_spans, dtype=np.int32)
    txt = np.char.add("t", off.astype("U7"))
    st = pa.StructArray.from_arrays(
        [
            pa.array(np.full(n_spans, "text"), pa.string()),
            pa.array(txt, pa.string()),
            pa.array(np.full(n_spans, ""), pa.string()),
            pa.array(off, pa.int32()),
        ],
        ["kind", "text", "media_ref", "offset"],
    )
    lst = pa.ListArray.from_arrays(
        pa.array([0, n_spans], pa.int32()),
        st.cast(DOCS_SCHEMA.field("spans").type.value_type),
    )
    return pa.table({"doc_id": pa.array(["doc-mega"]), "spans": lst})


def test_packed_row_cap_fires_and_spans_fallback(ray_session):
    """Both §7.3 branches at the REAL cap (no monkeypatch): a doc with
    MAX_SPANS_PER_DOC+1 spans must (a) fail the packed "docs" output
    with the documented error, and (b) produce the exact flat row set
    under the ``output_format="spans"`` chunked-stitching fallback."""
    import pyarrow.compute as pc
    import ray

    from vietnamese_ocr_ray.stages.explode import MAX_SPANS_PER_DOC

    n = MAX_SPANS_PER_DOC + 1
    docs_t = _mega_text_doc(n)
    handle = ray.put({})  # all-text corpus: empty media broadcast

    packed = extract_spans(
        rd.from_arrow(docs_t),
        handle,
        media_mode="broadcast",
        output_format="docs",
        num_buckets=4,
    )
    with pytest.raises(Exception, match="spans .*chunked-stitching"):
        packed.materialize()

    flat = extract_spans(
        rd.from_arrow(docs_t),
        handle,
        media_mode="broadcast",
        output_format="spans",
        num_buckets=4,
    ).materialize()
    assert flat.count() == n
    # exact row set, checked by closed-form aggregates over all rows
    # plus an exact head sample (a 10^6-row take_all would defeat the
    # point of the streaming fallback)
    agg = flat.map_batches(
        lambda b: pa.table(
            {
                "s_off": [pc.sum(b.column("offset")).as_py() or 0],
                "n_text": [
                    pc.sum(
                        pc.cast(pc.equal(b.column("kind"), "text"), pa.int64())
                    ).as_py()
                    or 0
                ],
                "n_doc": [
                    pc.sum(
                        pc.cast(
                            pc.equal(b.column("doc_id"), "doc-mega"), pa.int64()
                        )
                    ).as_py()
                    or 0
                ],
            }
        ),
        batch_format="pyarrow",
    ).to_pandas()
    assert int(agg.s_off.sum()) == n * (n - 1) // 2
    assert int(agg.n_text.sum()) == n
    assert int(agg.n_doc.sum()) == n
    head = flat.take(3)
    assert [r["offset"] for r in head] == [0, 1, 2]
    assert [r["text"] for r in head] == ["t0", "t1", "t2"]


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
