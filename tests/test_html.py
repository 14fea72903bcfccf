"""HTML main-content extraction: heuristic semantics + span contract.

Value parity vs DuckDB is covered by the oracle sweep
(test_oracle_parity.py); these tests pin the BEHAVIOR: boilerplate
blocks die, article paragraphs survive, and html_to_spans emits the
flagship interleaved-span shape.
"""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from vietnamese_ocr_ray.functions import html as H

SF = "/root/testdata/sf0.001"


def _docs_ds():
    from vietnamese_ocr_ray.sources.storage import read_parquet_clean

    return read_parquet_clean(
        f"{SF}/documents.parquet", columns=["doc_id", "text", "lang", "source"]
    )


def test_main_content_drops_boilerplate_keeps_paragraphs(ray_session):
    df = H.html_main_content(_docs_ds()).to_pandas().set_index("doc_id")
    # nav/ad/footer markers never survive the link-density filter
    joined = " ".join(df["main_text"])
    for marker in ("home nav", "click here to win", "buy now", "terms", "contact"):
        assert marker not in joined, marker
    # article text survives: main_text is a subsequence of the doc text
    import pyarrow.parquet as pq

    docs = pq.read_table(f"{SF}/documents.parquet").to_pandas().set_index("doc_id")
    kept_docs = df[df["main_text"] != ""]
    assert len(kept_docs) > 0.9 * len(df)  # almost every doc has content
    for doc_id in list(kept_docs.index[:20]):
        main = kept_docs.loc[doc_id, "main_text"]
        words_main = main.split(" ")
        words_doc = docs.loc[doc_id, "text"].split(" ")
        # every surviving word came from the document text
        assert set(words_main) <= set(words_doc), doc_id


def test_spans_shape_and_media_refs(ray_session):
    spans = H.html_to_spans(_docs_ds()).to_pandas()
    assert list(spans.columns) == ["doc_id", "offset", "kind", "text", "media_ref"]
    assert spans["offset"].dtype == np.int32
    assert set(spans["kind"]) == {"text", "media"}
    media = spans[spans["kind"] == "media"]
    # every third doc got exactly one media span with its canonical ref
    assert (media["doc_id"] % 3 == 0).all()
    assert (
        media["media_ref"] == "media://" + media["doc_id"].astype(str) + "/1"
    ).all()
    assert (media["text"] == "").all()
    text = spans[spans["kind"] == "text"]
    assert (text["media_ref"] == "").all()
    assert (text["text"].str.len() >= H.MIN_BLOCK_CHARS).all()
    # offsets are 0..n-1 per doc in emission order
    g = spans.sort_values(["doc_id", "offset"]).groupby("doc_id")["offset"]
    assert (g.min() == 0).all()
    assert ((g.max() + 1) == g.count()).all()


def test_spans_partitioning_invariant(ray_session):
    """The span extraction is per-row: block count must not change
    the result (rows are independent; repartition only reorders)."""
    base = (
        H.html_to_spans(_docs_ds())
        .to_pandas()
        .sort_values(["doc_id", "offset"])
        .reset_index(drop=True)
    )
    many = (
        H.html_to_spans(_docs_ds().repartition(13))
        .to_pandas()
        .sort_values(["doc_id", "offset"])
        .reset_index(drop=True)
    )
    assert base.equals(many)


def test_link_density_flags_boilerplate_only_page(ray_session):
    """A page that is ALL links scores ~1.0; the synth pages score
    well under the 0.5 block threshold on average."""
    dens = H.html_link_density(_docs_ds()).to_pandas()
    assert (dens["link_density"] < 0.5).all()
    assert (dens["n_links"] == 7).all()  # 3 nav + 2 ad + 2 footer


def test_html_links_extracts_all_anchors_in_order(ray_session):
    import numpy as np
    import pyarrow as pa

    from vietnamese_ocr_ray.functions.html import html_links, synth_html_array

    batch = pa.table(
        {
            "doc_id": pa.array([3, 4], pa.int64()),
            "lang": ["en", "fr"],
            "source": ["src1", "src2"],
            "text": ["hello world", "bonjour monde"],
        }
    )
    import ray.data as rd

    out = html_links(rd.from_arrow(batch)).to_pandas()
    assert len(out) == 14  # 7 anchors per page
    d3 = out[out.doc_id == 3]
    assert list(d3.link_ord) == [1, 2, 3, 4, 5, 6, 7]
    assert list(d3.href) == [
        "/home", "/l/en", "/top", "/ad1", "/ad2", "/terms", "/contact",
    ]
    assert list(d3.anchor_text)[:3] == ["home nav", "en pages", "top lists"]
