"""Sliding-window document chunking — the pretraining prep step that
turns variable-length documents into fixed-size training windows
(CHUNK tokens per window, stride STRIDE, so consecutive windows
overlap by CHUNK - STRIDE tokens).

Window rule (mirrored exactly by the DuckDB oracle's
``generate_series`` lateral): a doc with n whitespace tokens emits
``1 + ceil(max(n - CHUNK, 0) / STRIDE)`` windows; window j covers
tokens ``[j*STRIDE, min(j*STRIDE + CHUNK, n))`` — full coverage, no
window that is a pure suffix of its predecessor.

Implementation is zero per-row Python: one ``split_pattern`` pass
gives per-token BYTE lengths; token start offsets inside each doc
follow from a cumsum (every separator is exactly one byte, which
holds for any utf8 content because we slice the original buffer at
byte granularity); each window is then a contiguous byte range of
the original text, gathered with one fancy-index into a fresh Arrow
string buffer. Scale shape: stateless ``map_batches``, output bytes
~ (CHUNK/STRIDE)x input — no shuffle, no state, no driver traffic.

Reference parity: beyond-reference LLM-data-pipeline surface
(SURVEY.md §2.8).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

CHUNK = 32
STRIDE = 24


def _chunked(col):
    return col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col


def doc_chunks_batch(batch: pa.Table) -> pa.Table:
    text = _chunked(batch.column("text"))
    ids = np.asarray(pc.cast(_chunked(batch.column("doc_id")), pa.int64()))

    toks = pc.split_pattern(text, " ")
    toff = np.frombuffer(toks.buffers()[1], dtype=np.int32)[
        toks.offset : toks.offset + len(toks) + 1
    ].astype(np.int64)
    n_tok = toff[1:] - toff[:-1]  # tokens per doc

    child = toks.values
    tlen = np.asarray(pc.binary_length(child), dtype=np.int64)
    # byte start of each token within its doc: cumsum(tlen+1) reset per
    # doc (separator is exactly one ' ' byte between adjacent tokens)
    step = tlen + 1
    csum = np.concatenate([[0], np.cumsum(step)])
    doc_base = csum[toff[:-1]]  # per-doc offset into the global cumsum
    tok_start = csum[:-1] - np.repeat(doc_base, n_tok)

    # windows per doc
    k = 1 + (np.maximum(n_tok - CHUNK, 0) + STRIDE - 1) // STRIDE
    total = int(k.sum())
    doc_idx = np.repeat(np.arange(len(ids)), k)
    win_off = np.concatenate([[0], np.cumsum(k)])
    chunk_id = np.arange(total, dtype=np.int64) - np.repeat(win_off[:-1], k)

    start_tok = chunk_id * STRIDE
    end_tok = np.minimum(start_tok + CHUNK, n_tok[doc_idx])
    n_win_tok = end_tok - start_tok

    # byte range of each window inside its doc (tok_start is indexed by
    # absolute child-token index, values are within-doc byte offsets)
    abs_tok = toff[:-1][doc_idx]  # absolute index of each doc's token 0
    cstart = tok_start[abs_tok + start_tok]
    last = abs_tok + end_tok - 1
    cend = tok_start[last] + tlen[last]

    # absolute byte offsets into the text data buffer
    arr = text
    soffs = np.frombuffer(arr.buffers()[1], dtype=np.int32)[
        arr.offset : arr.offset + len(arr) + 1
    ].astype(np.int64)
    data = (
        np.frombuffer(arr.buffers()[2], dtype=np.uint8)
        if arr.buffers()[2] is not None
        else np.empty(0, np.uint8)
    )
    doc_byte = soffs[:-1][doc_idx]
    a = doc_byte + cstart
    out_len = doc_byte + cend - a

    out_offs = np.concatenate([[0], np.cumsum(out_len)]).astype(np.int32)
    nbytes = int(out_offs[-1])
    idx = (
        np.arange(nbytes, dtype=np.int64)
        - np.repeat(out_offs[:-1].astype(np.int64), out_len)
        + np.repeat(a, out_len)
    )
    out_data = data[idx]
    chunk_text = pa.StringArray.from_buffers(
        total,
        pa.py_buffer(out_offs.tobytes()),
        pa.py_buffer(out_data.tobytes()),
    )

    return pa.table(
        {
            "doc_id": pa.array(ids[doc_idx]),
            "chunk_id": pa.array(chunk_id),
            "chunk_text": chunk_text,
            "n_tokens": pa.array(n_win_tok),
        }
    )


def doc_chunks(ds: rd.Dataset) -> rd.Dataset:
    return ds.map_batches(doc_chunks_batch, batch_format="pyarrow")


def chunk_sql(docs: str = "documents") -> str:
    """DuckDB oracle: same window rule via a generate_series lateral."""
    return f"""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS toks,
             len(string_split(text, ' ')) AS n
      FROM {docs}
    ),
    w AS (
      SELECT doc_id, toks, n,
             unnest(generate_series(
               0, (greatest(n - {CHUNK}, 0) + {STRIDE} - 1) // {STRIDE}))
               AS j
      FROM t
    )
    SELECT doc_id,
           j AS chunk_id,
           array_to_string(
             toks[j * {STRIDE} + 1 :
                  least(j * {STRIDE} + {CHUNK}, n)], ' ') AS chunk_text,
           CAST(least(j * {STRIDE} + {CHUNK}, n) - j * {STRIDE} AS BIGINT)
             AS n_tokens
    FROM w
    """
