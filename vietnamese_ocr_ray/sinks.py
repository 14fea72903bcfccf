"""Output sinks beyond canonical Parquet.

``write_predictions_txt`` reproduces the reference's prediction file
format (``prediction/{DATE}/prediction.txt``: one
``"{filename} {text}"`` line per image, empty text replaced by ``"a"``,
src/utils/inference.py:105-121) from an extracted docs Dataset — the
media spans play the role of the images. The reference writes one
global file from a driver dict; here each block writes its own part
file (resumable, no driver materialization) and line order within a
doc follows span offset order.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc


def _format_batch(batch: pa.Table) -> pa.Table:
    spans = batch.column("spans")
    if isinstance(spans, pa.ChunkedArray):
        spans = spans.combine_chunks()
    flat = spans.values
    kind = pc.struct_field(flat, "kind")
    media = pc.equal(kind, "media")
    refs = pc.struct_field(flat, "media_ref").filter(media)
    texts = pc.struct_field(flat, "text").filter(media)
    # empty->"a" is already applied by the pipeline; keep the guard for
    # oracle-parity when formatting raw tables
    texts = pc.if_else(pc.equal(pc.utf8_length(texts), 0), pa.scalar("a"), texts)
    lines = pc.binary_join_element_wise(refs, texts, pa.scalar(" "))
    return pa.table({"line": lines})


def write_predictions_txt(extracted_ds, out_dir: str) -> str:
    """Extracted docs Dataset -> directory of prediction .txt parts."""
    os.makedirs(out_dir, exist_ok=True)

    def write_part(batch: pa.Table) -> pa.Table:
        import uuid

        t = _format_batch(batch)
        part = os.path.join(out_dir, f"prediction-{uuid.uuid4().hex[:12]}.txt")
        with open(part, "w", encoding="utf-8") as f:
            for line in t.column("line").to_pylist():
                f.write(line + "\n")
        return pa.table({"lines_written": pa.array([t.num_rows], pa.int64())})

    counts = extracted_ds.map_batches(write_part, batch_format="pyarrow")
    total = sum(r["lines_written"] for r in counts.take_all())
    return f"{out_dir} ({total} lines)"


def write_partitioned_by_key(
    ds, out_dir: str, key: str = "lang", **kwargs
) -> str:
    """Hive-partitioned parquet sink (one ``key=value/`` directory per
    key value, many files per partition): the resumable output layout
    the task brief mandates — a re-run can skip finished partitions,
    and per-key consumers read only their directory. Thin wrapper over
    ``Dataset.write_parquet(partition_cols=...)`` so the streaming
    executor writes each block as it arrives (no materialization)."""
    ds.write_parquet(out_dir, partition_cols=[key], **kwargs)
    return out_dir
