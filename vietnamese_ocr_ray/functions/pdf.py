"""PDF / layout parsing — the document-extraction operator family the
north rule names alongside HTML boilerplate strip: positioned text
blocks must be recovered from a content stream and re-ordered into
reading order (PDF streams carry NO reading order — only coordinates).

No PDF library exists in this sandbox, and the corpus has no PDF
column, so :func:`synth_pdf` derives a deterministic minimal content
stream per document with ONLY SQL-expressible string ops: four
positioned text-showing blocks (``BT /F<n> <size> Tf <x> <y> Td
(<text>) Tj ET``) emitted deliberately OUT of reading order — footer
first, then a margin note, the header, and the body — plus the
``%PDF-1.4`` header and ``%%EOF`` trailer. The parser never sees the
emission order: it extracts ``(x, y, text)`` per block and sorts by
``(y DESC, x ASC)`` (top-to-bottom, left-to-right), which is the
actual layout-analysis step. Both engines run RE2, so every operator
is value-checked end-to-end by a DuckDB oracle that rebuilds and
re-parses the same stream.

Operators (vectorized, zero per-row Python, no shuffle):

* :func:`synth_pdf` — (doc_id, pdf)
* :func:`pdf_spans` — (doc_id, block, x, y, text): one row per text
  block with its reading-order index
* :func:`pdf_text`  — (doc_id, text): blocks joined in reading order
  (the "extracted main text" a downstream corpus pipeline consumes)

A real PDF decoder drops in at the `_BLOCK_RE` extraction seam — the
rest (two-level list offsets, batch-local reading-order lexsort,
reading-order join) is format-independent layout plumbing.

Reference parity: the reference consumes pre-cropped images
(`src/dataset.py`); layout recovery is the web-scale generalization of
its "ordered spans per document" contract (SURVEY.md §2.8).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

_BLOCK_RE = (
    r"BT /F\d+ (?P<sz>\d+) Tf (?P<x>\d+) (?P<y>\d+) Td "
    r"\((?P<t>[^)]*)\) Tj"
)


def _chunked(col):
    return col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col


def synth_pdf_array(batch: pa.Table) -> pa.Array:
    """The deterministic content stream per row — string concat only,
    the exact expression :func:`pdf_sql_expr` renders for DuckDB.
    Stream order is footer, margin note, header, body: a parser that
    trusted emission order would read the page bottom-up."""
    doc_id = pc.cast(_chunked(batch.column("doc_id")), pa.string())
    source = _chunked(batch.column("source"))
    text = _chunked(batch.column("text"))
    return pc.binary_join_element_wise(
        pa.scalar("%PDF-1.4\nBT /F2 8 Tf 72 60 Td (copyright "),
        source,
        pa.scalar(") Tj ET\nBT /F1 9 Tf 400 600 Td (fig "),
        doc_id,
        pa.scalar(" caption) Tj ET\nBT /F1 12 Tf 72 720 Td ("),
        source,
        pa.scalar(" "),
        doc_id,
        pa.scalar(") Tj ET\nBT /F1 10 Tf 72 500 Td ("),
        text,
        pa.scalar(") Tj ET\n%%EOF"),
        pa.scalar(""),
    )


def pdf_sql_expr(docs: str = "documents") -> str:
    """DuckDB expression rebuilding :func:`synth_pdf_array` byte-
    identically (chr(10) newlines)."""
    return f"""
    SELECT doc_id,
      '%PDF-1.4' || chr(10)
      || 'BT /F2 8 Tf 72 60 Td (copyright ' || source || ') Tj ET' || chr(10)
      || 'BT /F1 9 Tf 400 600 Td (fig ' || doc_id::VARCHAR
      || ' caption) Tj ET' || chr(10)
      || 'BT /F1 12 Tf 72 720 Td (' || source || ' ' || doc_id::VARCHAR
      || ') Tj ET' || chr(10)
      || 'BT /F1 10 Tf 72 500 Td (' || text || ') Tj ET' || chr(10)
      || '%%EOF' AS pdf
    FROM {docs}
    """


def synth_pdf(ds: rd.Dataset) -> rd.Dataset:
    def build(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"doc_id": batch.column("doc_id"), "pdf": synth_pdf_array(batch)}
        )

    return ds.map_batches(build, batch_format="pyarrow")


def _parse_blocks(batch: pa.Table):
    """(doc_idx per block, x, y, text) flat arrays in reading order
    PER DOCUMENT: split the stream on ET, extract one positioned text
    op per piece, drop non-matching pieces (header/trailer), lexsort
    by (doc, -y, x)."""
    pdf = _chunked(batch.column("pdf"))
    pieces_list = pc.split_pattern(pdf, " ET")
    flat = pc.list_flatten(pieces_list)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    nper = pc.list_value_length(pieces_list).to_numpy(zero_copy_only=False)
    doc_idx = np.repeat(np.arange(len(nper), dtype=np.int64), nper)
    m = pc.extract_regex(flat, _BLOCK_RE)
    valid = pc.is_valid(m).to_numpy(zero_copy_only=False)
    x = np.asarray(
        pc.cast(pc.struct_field(m, "x").drop_null(), pa.int64())
    )
    y = np.asarray(
        pc.cast(pc.struct_field(m, "y").drop_null(), pa.int64())
    )
    t = pc.struct_field(m, "t").drop_null()
    doc_idx = doc_idx[valid]
    order = np.lexsort((x, -y, doc_idx))
    return doc_idx[order], x[order], y[order], t.take(pa.array(order))


def pdf_spans(ds: rd.Dataset) -> rd.Dataset:
    """(doc_id, block, x, y, text): positioned text blocks with their
    reading-order index (y descending, x ascending within a page)."""

    def parse(batch: pa.Table) -> pa.Table:
        doc_idx, x, y, t = _parse_blocks(batch)
        first = np.ones(doc_idx.shape[0], dtype=bool)
        first[1:] = doc_idx[1:] != doc_idx[:-1]
        run_start = np.nonzero(first)[0]
        run_len = np.diff(np.append(run_start, doc_idx.shape[0]))
        block = np.arange(doc_idx.shape[0], dtype=np.int64) - np.repeat(
            run_start, run_len
        )
        ids = np.asarray(pc.cast(_chunked(batch.column("doc_id")), pa.int64()))
        return pa.table(
            {
                "doc_id": pa.array(ids[doc_idx]),
                "block": pa.array(block),
                "x": pa.array(x),
                "y": pa.array(y),
                "text": t,
            }
        )

    return ds.map_batches(parse, batch_format="pyarrow")


def pdf_to_spans(ds: rd.Dataset) -> rd.Dataset:
    """The extraction front end for PDF (mirrors
    ``functions/html.html_to_spans``): one interleaved span row per
    parsed block IN READING ORDER — figure blocks (the margin-note
    convention ``fig <id> caption``) become kind='media' spans with a
    ``media://`` ref, everything else kind='text'. Output is exactly
    the flagship input shape (doc_id, offset, kind, text, media_ref)."""

    def spans(batch: pa.Table) -> pa.Table:
        doc_idx, _x, _y, t = _parse_blocks(batch)
        ids = np.asarray(pc.cast(_chunked(batch.column("doc_id")), pa.int64()))
        d = ids[doc_idx]
        is_media = np.asarray(pc.starts_with(t, "fig "), dtype=bool)
        n = d.shape[0]
        first = np.ones(n, dtype=bool)
        first[1:] = doc_idx[1:] != doc_idx[:-1]
        starts = np.nonzero(first)[0]
        offset = np.arange(n, dtype=np.int64) - np.repeat(
            starts, np.diff(np.append(starts, n))
        )
        refs = pc.binary_join_element_wise(
            pa.scalar("media://"),
            pc.cast(pa.array(d), pa.string()),
            pa.scalar("/1"),
            pa.scalar(""),
        )
        m = pa.array(is_media)
        return pa.table(
            {
                "doc_id": pa.array(d),
                "offset": pa.array(offset.astype(np.int32), pa.int32()),
                "kind": pa.array(np.where(is_media, "media", "text"), pa.string()),
                "text": pc.if_else(m, pa.scalar(""), t),
                "media_ref": pc.if_else(m, refs, pa.scalar("")),
            }
        )

    return ds.map_batches(spans, batch_format="pyarrow")


def pdf_text(ds: rd.Dataset) -> rd.Dataset:
    """(doc_id, text): block texts joined with newlines in reading
    order — the extracted document text."""

    def extract(batch: pa.Table) -> pa.Table:
        doc_idx, _, _, t = _parse_blocks(batch)
        n = doc_idx.shape[0]
        first = np.ones(n, dtype=bool)
        first[1:] = doc_idx[1:] != doc_idx[:-1]
        run_start = np.nonzero(first)[0]
        offsets = np.append(run_start, n).astype(np.int32)
        lst = pa.ListArray.from_arrays(pa.array(offsets), t)
        ids = np.asarray(pc.cast(_chunked(batch.column("doc_id")), pa.int64()))
        return pa.table(
            {
                "doc_id": pa.array(ids[doc_idx[run_start]]),
                "text": pc.binary_join(lst, pa.scalar("\n")),
            }
        )

    return ds.map_batches(extract, batch_format="pyarrow")
