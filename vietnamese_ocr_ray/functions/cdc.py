"""Change-data-capture diff between two corpus snapshots.

:func:`snapshot_diff` classifies every doc_id across two snapshots as
``unchanged`` / ``updated`` / ``deleted`` / ``inserted`` — the merge
planner of an incremental recrawl pipeline (what changed since the
last snapshot decides what re-enters the extract/dedup stages).

Shape: tag each side, union, ONE bucketed aggregate per doc_id over
(count, side-sum, min/max content fingerprint) — content equality is
decided by the SQL-mirrored polynomial fingerprint, so shuffled bytes
per row are O(1) regardless of document size, and the whole
classification is replayable in DuckDB. The standard hashed-equality
tradeoff applies (mod-1e9+7 collision odds per changed doc).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from vietnamese_ocr_ray.functions.agg import hash_aggregate
from vietnamese_ocr_ray.functions.sampling import _poly_hash


def _tagged(ds: rd.Dataset, side: int, id_col: str, text_col: str) -> rd.Dataset:
    def tag(batch: pa.Table) -> pa.Table:
        text = batch.column(text_col)
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        return pa.table(
            {
                id_col: batch.column(id_col),
                "side": pa.array(
                    np.full(batch.num_rows, side, dtype=np.int64)
                ),
                "fp": pa.array(_poly_hash(text)),
            }
        )

    return ds.map_batches(tag, batch_format="pyarrow")


def snapshot_diff(
    old: rd.Dataset,
    new: rd.Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> rd.Dataset:
    """(id, status) for every id present in either snapshot."""
    both = _tagged(old, 0, id_col, text_col).union(
        _tagged(new, 1, id_col, text_col)
    )
    agg = hash_aggregate(
        both,
        [id_col],
        {
            "n": ("side", "count"),
            "s": ("side", "sum"),
            "lo": ("fp", "min"),
            "hi": ("fp", "max"),
        },
    )

    def classify(batch: pa.Table) -> pa.Table:
        n = batch.column("n").to_numpy(zero_copy_only=False)
        s = batch.column("s").to_numpy(zero_copy_only=False)
        same = pc.equal(batch.column("lo"), batch.column("hi"))
        status = pc.if_else(
            pa.array(n == 2),
            pc.if_else(same, pa.scalar("unchanged"), pa.scalar("updated")),
            pc.if_else(
                pa.array(s == 0), pa.scalar("deleted"), pa.scalar("inserted")
            ),
        )
        return pa.table({id_col: batch.column(id_col), "status": status})

    return agg.map_batches(classify, batch_format="pyarrow")


def merge_upsert(
    base: rd.Dataset,
    changes: rd.Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    seq_col: str = "seq",
    op_col: str = "op",
) -> rd.Dataset:
    """Iceberg-style MERGE: apply a changeset of ('upsert' | 'delete')
    operations to a base snapshot with LAST-WINS sequencing — the
    table-maintenance primitive behind incremental recrawls (base rows
    carry implicit seq 0; an id touched by several ops keeps only the
    highest-``seq`` one; a winning delete removes the id).

    Scale shape: ONE id-bucket shuffle of the tagged union; each
    bucket resolves winners with a vectorized sort + groupby-tail —
    O(1) state per id, no driver materialization. Deterministic for
    unique (id, seq) pairs (assert upstream)."""
    import pandas as pd

    from vietnamese_ocr_ray.functions.joins import key_bucket

    def tag_base(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                id_col: pc.cast(b.column(id_col), pa.int64()),
                seq_col: pa.array(np.zeros(b.num_rows, np.int64)),
                op_col: pa.array(["upsert"] * b.num_rows, pa.string()),
                text_col: b.column(text_col),
            }
        )

    def tag_changes(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                id_col: pc.cast(b.column(id_col), pa.int64()),
                seq_col: pc.cast(b.column(seq_col), pa.int64()),
                op_col: b.column(op_col),
                text_col: b.column(text_col),
            }
        )

    u = base.map_batches(tag_base, batch_format="pyarrow").union(
        changes.map_batches(tag_changes, batch_format="pyarrow")
    )

    def bucketed(b: pa.Table) -> pa.Table:
        return b.append_column(
            "_bucket",
            pa.array(key_bucket(b.column(id_col), 32).astype(np.int32)),
        )

    def resolve(g: pd.DataFrame) -> pa.Table:
        w = (
            g.sort_values([id_col, seq_col], kind="stable")
            .groupby(id_col, as_index=False)
            .tail(1)
        )
        w = w[w[op_col] != "delete"]
        return pa.Table.from_pandas(
            w[[id_col, text_col]], preserve_index=False
        ).replace_schema_metadata(None)

    return (
        u.map_batches(bucketed, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(resolve, batch_format="pandas")
    )
