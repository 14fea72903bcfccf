"""WARC-style web-archive framing over the deterministic HTML corpus
— the north rule's "web documents in archive files" input shape
(reference semantics: a directory of inputs becomes one shardable
container file; ISO 28500 WARC/1.0 record subset).

``synth_warc`` packs each document's :func:`synth_html` page into a
WARC response record (Target-URI from :func:`synth_url`) and
concatenates records into multi-record CHUNK rows — the on-disk shape
of real ``.warc`` files (many records per file). ``warc_records`` is
the fully-vectorized inverse: split on the record magic, split each
record's header block from its payload, regex-extract the headers.
Both sides are pure string concatenation, so the DuckDB oracle
rebuilds every header and payload from ``documents`` and the whole
frame + parse round trip is value-checked.

Record layout::

    WARC/1.0\r\n
    WARC-Type: response\r\n
    WARC-Record-ID: <urn:doc:ID>\r\n
    WARC-Target-URI: URL\r\n
    Content-Length: LEN\r\n
    \r\n
    HTML\r\n\r\n

Content-Length is the payload length in characters (== bytes for this
ASCII corpus, matching SQL ``length()``); the parser does not depend
on it — record and payload boundaries are unambiguous because the
synthetic HTML contains no CR/LF.

Scale shape: chunks are independent rows, so parsing shards like any
map_batches; the only shuffle is synth's chunk groupby (bounded by
``chunk_docs`` records per group). A real .warc.gz reader drops in at
the chunk-producing read — everything downstream is unchanged.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from vietnamese_ocr_ray.functions.html import synth_html_array
from vietnamese_ocr_ray.functions.url import synth_url_array

_MAGIC = "WARC/1.0\r\n"


def synth_warc(ds: rd.Dataset, chunk_docs: int = 32) -> rd.Dataset:
    """(chunk_id, warc): documents framed as multi-record WARC chunks,
    ``chunk_docs`` consecutive doc_ids per chunk, records in doc_id
    order (== SQL ``string_agg(rec, '' ORDER BY doc_id) GROUP BY
    doc_id // chunk_docs``)."""

    def build(batch: pa.Table) -> pa.Table:
        html = synth_html_array(batch)
        url = synth_url_array(batch)
        ids = pc.cast(batch.column("doc_id"), pa.int64())
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        ids_str = pc.cast(ids, pa.string())
        clen = pc.cast(pc.utf8_length(html), pa.string())
        rec = pc.binary_join_element_wise(
            pa.scalar(_MAGIC + "WARC-Type: response\r\nWARC-Record-ID: <urn:doc:"),
            ids_str,
            pa.scalar(">\r\nWARC-Target-URI: "),
            url,
            pa.scalar("\r\nContent-Length: "),
            clen,
            pa.scalar("\r\n\r\n"),
            html,
            pa.scalar("\r\n\r\n"),
            pa.scalar(""),
        )
        chunk = pc.divide(ids, pa.scalar(chunk_docs, pa.int64()))
        return pa.table({"chunk_id": chunk, "doc_id": ids, "rec": rec})

    def pack(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values("doc_id")
        return pa.table(
            {
                "chunk_id": pa.array(
                    [int(g["chunk_id"].iloc[0])], pa.int64()
                ),
                "warc": pa.array(["".join(g["rec"])], pa.string()),
            }
        )

    return (
        ds.map_batches(build, batch_format="pyarrow")
        .groupby("chunk_id")
        .map_groups(pack, batch_format="pandas")
    )


def warc_records(ds: rd.Dataset) -> rd.Dataset:
    """(doc_id, target_uri, content_length, html): vectorized WARC
    record parser — split chunks on the record magic, split each
    record's header block from its payload on the first blank line,
    regex-extract the headers. No per-record Python."""

    def parse(batch: pa.Table) -> pa.Table:
        w = batch.column("warc")
        if isinstance(w, pa.ChunkedArray):
            w = w.combine_chunks()
        parts = pc.list_flatten(pc.split_pattern(w, _MAGIC))
        rec = parts.filter(pc.greater(pc.utf8_length(parts), 0))
        hp = pc.split_pattern(rec, "\r\n\r\n", max_splits=1)
        heads = pc.list_element(hp, 0)
        payload = pc.list_element(hp, 1)
        html = pc.utf8_trim(payload, characters="\r\n")
        rid = pc.extract_regex(
            heads, r"WARC-Record-ID: <urn:doc:(?P<id>[0-9]+)>"
        )
        uri = pc.extract_regex(heads, r"WARC-Target-URI: (?P<uri>[^\r]+)")
        cl = pc.extract_regex(heads, r"Content-Length: (?P<len>[0-9]+)")
        return pa.table(
            {
                "doc_id": pc.cast(pc.struct_field(rid, "id"), pa.int64()),
                "target_uri": pc.struct_field(uri, "uri"),
                "content_length": pc.cast(
                    pc.struct_field(cl, "len"), pa.int64()
                ),
                "html": html,
            }
        )

    return ds.map_batches(parse, batch_format="pyarrow")
