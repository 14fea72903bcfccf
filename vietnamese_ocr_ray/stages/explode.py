"""Explode / reassemble stages — the two structural transforms of the
extraction pipeline.

Explode flattens each doc's span list into span-level rows (the
per-file loop of reference src/utils/inference.py:85-88, restated as a
zero-copy Arrow kernel — list_flatten + list_parent_indices — NOT a
per-row flat_map).

Reassemble is the engine's one required shuffle (the batch-dict union
of src/utils/inference.py:90 generalized): rows are hash-bucketed by
doc_id, each bucket is packed in ONE vectorized call (sort by
(doc_id, offset), run-length detect doc boundaries, build the
list<struct> column) — per-bucket Python, never per-doc Python.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from vietnamese_ocr_ray.schema import DOCS_SCHEMA, assert_schema

SPANS_TYPE = DOCS_SCHEMA.field("spans").type


def explode_batch(batch: pa.Table) -> pa.Table:
    """docs rows -> span rows (doc_id, offset, kind, text, media_ref).

    Docs with empty span lists vanish (extraction output is defined
    over docs with >=1 span).
    """
    assert_schema(batch, DOCS_SCHEMA, "docs")
    spans = batch.column("spans")
    flat = pc.list_flatten(spans)
    parent = pc.list_parent_indices(spans)
    cols = {
        "doc_id": pc.take(batch.column("doc_id"), parent),
        "offset": pc.struct_field(flat, "offset"),
        "kind": pc.struct_field(flat, "kind"),
        "text": pc.struct_field(flat, "text"),
        "media_ref": pc.struct_field(flat, "media_ref"),
    }
    # carry any extra doc-level columns (e.g. lineage _fragment)
    for name in batch.column_names:
        if name not in ("doc_id", "spans"):
            cols[name] = pc.take(batch.column(name), parent)
    return pa.table(cols)


def fnv1a_bucket(ids, num_buckets: int) -> np.ndarray:
    """Deterministic hash bucket of a string array (FNV-1a over utf8
    bytes, vectorized over character positions) — stable across
    runs/processes (Python's hash() is salted; never use it for
    partitioning)."""
    arr = ids.combine_chunks() if isinstance(ids, pa.ChunkedArray) else ids
    buf = (
        np.frombuffer(arr.buffers()[2], dtype=np.uint8)
        if arr.buffers()[2]
        else np.empty(0, np.uint8)
    )
    offs = np.frombuffer(arr.buffers()[1], dtype=np.int32)[
        arr.offset : arr.offset + len(arr) + 1
    ]
    h = np.full(len(arr), np.uint64(0xCBF29CE484222325), dtype=np.uint64)
    # strings here are short (doc-XXXXXXXX); iterate positions, not rows
    lens = offs[1:] - offs[:-1]
    maxlen = int(lens.max()) if len(lens) else 0
    prime = np.uint64(0x100000001B3)
    for i in range(maxlen):
        active = lens > i
        idx = offs[:-1][active] + i
        h[active] = (h[active] ^ buf[idx].astype(np.uint64)) * prime
    return (h % np.uint64(num_buckets)).astype(np.int32)


def add_bucket(batch: pa.Table, num_buckets: int, key: str = "doc_id") -> pa.Table:
    """Append the deterministic hash-bucket column for a shuffle key."""
    return batch.append_column(
        "bucket", pa.array(fnv1a_bucket(batch.column(key), num_buckets))
    )


MAX_SPANS_PER_DOC = 1_000_000  # guard: one doc's spans must fit one output row


def pack_bucket(group: pa.Table) -> pa.Table:
    """All span rows of one bucket -> packed docs rows.

    Sort by (doc_id, offset) — explicit order is part of the
    correctness invariant (SURVEY.md §2.6 O7) — then build the
    list<struct> column from run boundaries of doc_id.

    A doc larger than MAX_SPANS_PER_DOC is rejected with a clear error:
    the output format itself (one list<struct> row per doc) caps doc
    size; the documented fallback is chunked stitching — sort the flat
    span table by (doc_id, offset) and emit spans_exploded instead of
    packed docs (SURVEY.md §7.3).
    """
    g = group.sort_by([("doc_id", "ascending"), ("offset", "ascending")])
    st = pa.StructArray.from_arrays(
        [
            g.column("kind").combine_chunks(),
            g.column("text").combine_chunks(),
            g.column("media_ref").combine_chunks(),
            g.column("offset").combine_chunks().cast(pa.int32()),
        ],
        ["kind", "text", "media_ref", "offset"],
    )
    d = np.asarray(g.column("doc_id").to_numpy(zero_copy_only=False))
    if len(d) == 0:
        return pa.table(
            {"doc_id": pa.array([], pa.string()), "spans": pa.array([], SPANS_TYPE)}
        )
    starts = np.nonzero(np.concatenate([[True], d[1:] != d[:-1]]))[0]
    offsets = np.concatenate([starts, [len(d)]]).astype(np.int32)
    sizes = np.diff(offsets)
    if sizes.size and int(sizes.max()) > MAX_SPANS_PER_DOC:
        big = d[starts[int(np.argmax(sizes))]]
        raise ValueError(
            f"doc {big!r} has {int(sizes.max())} spans (> {MAX_SPANS_PER_DOC}); "
            "packed output caps doc size — use the chunked-stitching "
            "fallback (sorted spans_exploded output) for such corpora"
        )
    lst = pa.ListArray.from_arrays(pa.array(offsets), st.cast(SPANS_TYPE.value_type))
    cols = {"doc_id": pa.array(d[starts], pa.string()), "spans": lst}
    # doc-level extra columns (lineage): first row of each doc run
    starts_idx = pa.array(starts.astype(np.int64))
    for name in g.column_names:
        if name not in ("doc_id", "offset", "kind", "text", "media_ref"):
            cols[name] = pc.take(g.column(name), starts_idx)
    return pa.table(cols)


class PackWriteInterior:
    """Sink-fused local reassembly (the zero-shuffle pack path).

    With no exchange between explode and recognition (``mapjoin`` /
    ``broadcast`` modes), every span row is still in its input block:
    docs never straddle block boundaries EXCEPT where Ray's output
    buffer split a too-large task output — and such a split can only
    cut the doc(s) at a block's physical first/last row.  So each task
    packs its block's interior docs locally and WRITES them straight to
    the chunk's tmp dir (one parquet file per block, deterministic name
    from the block's first doc_id + row count, written via tmp +
    ``os.replace`` so lineage re-execution is idempotent), and emits
    ONLY the edge docs' span rows.  The caller routes the edge stream
    through the bucketed :func:`reassemble` shuffle — an exchange of at
    most ~2 docs per block instead of the whole corpus.

    Partitioning assumption (SURVEY.md §4): input fragments are
    doc-complete (a Lance/parquet row is a whole doc), which the read
    path guarantees; correctness does NOT depend on block sizing —
    oversized blocks only grow the edge stream.
    """

    def __init__(self, out_dir: str):
        self.out_dir = out_dir

    def __call__(self, batch: pa.Table) -> pa.Table:
        import os

        import pyarrow.parquet as pq

        if batch.num_rows == 0:
            return batch
        d = batch.column("doc_id")
        edge_ids = pa.array(
            sorted({d[0].as_py(), d[-1].as_py()}), pa.string()
        )
        edge_mask = pc.is_in(d, value_set=edge_ids)
        edges = batch.filter(edge_mask)
        interior = batch.filter(pc.invert(edge_mask))
        if interior.num_rows:
            import hashlib

            packed = pack_bucket(interior)
            # full-64-bit name key (fnv1a_bucket returns int32 — a 32-bit
            # keyspace would birthday-collide across millions of blocks
            # at corpus scale, silently overwriting a sibling pack file)
            key = hashlib.blake2b(
                f"{interior.column('doc_id')[0].as_py()}#{interior.num_rows}".encode(),
                digest_size=8,
            ).hexdigest()
            final = os.path.join(self.out_dir, f"pack-{key}.parquet")
            tmp = final + ".tmp"
            pq.write_table(packed, tmp)
            os.replace(tmp, final)
        return edges


def reassemble(ds, num_buckets: int = 64):
    """span-row Dataset -> docs Dataset via the bucketed groupby shuffle.

    ``num_buckets`` bounds per-task memory: one bucket ≈ total_rows /
    num_buckets span rows (docs never straddle buckets). A single doc
    larger than a bucket budget would need chunked stitching — the
    generator caps spans/doc instead (SURVEY.md §7.3).
    """
    ds = ds.map_batches(
        lambda b: add_bucket(b, num_buckets), batch_format="pyarrow"
    )
    packed = ds.groupby("bucket").map_groups(
        lambda g: pack_bucket(g.drop_columns(["bucket"])),
        batch_format="pyarrow",
    )
    return packed
