"""PDF/layout parse: the stream emits blocks OUT of reading order
(footer, margin, header, body) — the parser must recover reading
order purely from coordinates. Value parity vs DuckDB is covered by
the oracle sweep; these tests pin the layout semantics."""

import pyarrow as pa
import ray.data as rd

from vietnamese_ocr_ray.functions.pdf import pdf_spans, pdf_text, synth_pdf


def _docs():
    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([7, 11], pa.int64()),
                "text": pa.array(["alpha beta gamma", "delta"]),
                "source": pa.array(["src1", "src2"]),
            }
        )
    )


def test_pdf_spans_recover_reading_order(ray_session):
    out = (
        pdf_spans(synth_pdf(_docs()))
        .to_pandas()
        .sort_values(["doc_id", "block"])
        .reset_index(drop=True)
    )
    d7 = out[out["doc_id"] == 7]
    # reading order: header (y=720), margin note (600), body (500),
    # footer (60) — NOT the emission order (footer was emitted first)
    assert d7["text"].tolist() == [
        "src1 7",
        "fig 7 caption",
        "alpha beta gamma",
        "copyright src1",
    ]
    assert d7["y"].tolist() == [720, 600, 500, 60]
    assert d7["block"].tolist() == [0, 1, 2, 3]


def test_pdf_text_joins_in_reading_order(ray_session):
    out = pdf_text(synth_pdf(_docs())).to_pandas().set_index("doc_id")
    assert out.loc[11, "text"] == (
        "src2 11\nfig 11 caption\ndelta\ncopyright src2"
    )


def test_pdf_parse_partitioning_invariant(ray_session):
    t = pa.table(
        {
            "doc_id": pa.array(range(60), pa.int64()),
            "text": pa.array([f"w{i} body text" for i in range(60)]),
            "source": pa.array(["s"] * 60),
        }
    )
    a = (
        pdf_spans(synth_pdf(rd.from_arrow(t)))
        .to_pandas()
        .sort_values(["doc_id", "block"])
        .reset_index(drop=True)
    )
    b = (
        pdf_spans(synth_pdf(rd.from_arrow(t).repartition(7)))
        .to_pandas()
        .sort_values(["doc_id", "block"])
        .reset_index(drop=True)
    )
    assert a.equals(b)


def test_pdf_to_spans_flagship_shape(ray_session):
    from vietnamese_ocr_ray.functions.pdf import pdf_to_spans

    out = (
        pdf_to_spans(synth_pdf(_docs()))
        .to_pandas()
        .sort_values(["doc_id", "offset"])
        .reset_index(drop=True)
    )
    d7 = out[out["doc_id"] == 7]
    assert d7["kind"].tolist() == ["text", "media", "text", "text"]
    assert d7["offset"].tolist() == [0, 1, 2, 3]
    # figure block became a media span: empty text, media:// ref
    assert d7.iloc[1]["text"] == ""
    assert d7.iloc[1]["media_ref"] == "media://7/1"
    assert (d7[d7["kind"] == "text"]["media_ref"] == "").all()
