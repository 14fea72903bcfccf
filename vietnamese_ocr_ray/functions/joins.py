"""Time-ordered joins the Dataset API lacks — as-of join (nearest
prior/next match per key), built the same way as stages/cogroup.py:
union both sides into one schema-aligned stream, hash-bucket by key,
and resolve each bucket with a vectorized in-memory merge (pandas
``merge_asof``, a compiled single-pass over sorted frames — zero
Python per row).

The reference engine has no temporal join; this is one of the
beyond-reference large-scale ops (attribution / sessional enrichment
over event streams). Scale shape: ONE shuffle (the bucket groupby);
bucket count sets downstream parallelism; a key's rows must fit one
bucket task's heap (same partitioning assumption as cogroup — salt or
split keys upstream if a single user exceeds that).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from vietnamese_ocr_ray.stages.explode import fnv1a_bucket


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — avalanche int keys before modulo so
    sequential ids spread across buckets."""
    z = x.astype(np.uint64, copy=True)
    z += np.uint64(0x9E3779B97F4A7C15)
    z ^= z >> np.uint64(30)
    z *= np.uint64(0xBF58476D1CE4E5B9)
    z ^= z >> np.uint64(27)
    z *= np.uint64(0x94D049BB133111EB)
    z ^= z >> np.uint64(31)
    return z


def key_bucket(arr, num_buckets: int) -> np.ndarray:
    """Deterministic bucket of a key column (string via FNV-1a,
    integer via splitmix64) — never Python hash() (salted)."""
    a = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
    if pa.types.is_string(a.type) or pa.types.is_large_string(a.type):
        return fnv1a_bucket(a, num_buckets)
    ints = a.to_numpy(zero_copy_only=False)
    return (_mix64(ints) % np.uint64(num_buckets)).astype(np.int64)


def asof_join(
    left: rd.Dataset,
    right: rd.Dataset,
    *,
    by: str,
    left_on: str,
    right_on: str,
    strict: bool = False,
    direction: str = "backward",
    num_buckets: int = 32,
) -> rd.Dataset:
    """For every left row, attach the single right row with the same
    ``by`` key and the nearest ``right_on`` <= / < ``left_on``
    (``direction="backward"``; ``strict`` excludes exact ties) —
    DuckDB/pandas ASOF semantics, inner flavour (unmatched left rows
    drop).

    Column contract: ``by`` is the only shared column name; every
    other left/right column passes through (pre-rename the right side).
    Right-side (by, right_on) pairs should be unique for a
    deterministic result (dedupe upstream otherwise).
    """
    def _arrow_types(schema) -> dict[str, pa.DataType]:
        out = {}
        for n, t in zip(schema.names, schema.types):
            if isinstance(t, pa.DataType):
                out[n] = t
            elif t is object or t is str:  # pandas-block string column
                out[n] = pa.string()
            else:
                out[n] = pa.from_numpy_dtype(t)
        return out

    l_schema = left.schema()
    r_schema = right.schema()
    l_names = list(l_schema.names)
    r_payload = [n for n in r_schema.names if n != by]
    overlap = set(l_names) & set(r_payload)
    if overlap:
        raise ValueError(f"rename right columns colliding with left: {overlap}")
    l_fields = _arrow_types(l_schema)
    r_fields = {
        n: t for n, t in _arrow_types(r_schema).items() if n != by
    }

    def left_side(batch: pa.Table) -> pa.Table:
        cols = {n: batch.column(n) for n in l_names}
        for n, t in r_fields.items():
            cols[n] = pa.nulls(batch.num_rows, t)
        cols["_side"] = pa.array(np.zeros(batch.num_rows, np.int8))
        cols["_bucket"] = pa.array(
            key_bucket(batch.column(by), num_buckets).astype(np.int32)
        )
        return pa.table(cols)

    def right_side(batch: pa.Table) -> pa.Table:
        cols = {}
        for n in l_names:
            if n == by:
                cols[n] = batch.column(by)
            else:
                cols[n] = pa.nulls(batch.num_rows, l_fields[n])
        for n in r_payload:
            cols[n] = batch.column(n)
        cols["_side"] = pa.array(np.ones(batch.num_rows, np.int8))
        cols["_bucket"] = pa.array(
            key_bucket(batch.column(by), num_buckets).astype(np.int32)
        )
        return pa.table(cols)

    def merge_bucket(group: pa.Table) -> pa.Table:
        is_left = pc.equal(group.column("_side"), 0)
        lt = group.filter(is_left).select(l_names)
        rt = group.filter(pc.invert(is_left)).select([by, *r_payload])
        out_names = l_names + r_payload
        if lt.num_rows == 0 or rt.num_rows == 0:
            return pa.table(
                {n: pa.nulls(0, (l_fields | r_fields)[n]) for n in out_names}
            )
        ldf = lt.to_pandas().sort_values(left_on, kind="stable")
        rdf = rt.to_pandas().sort_values(right_on, kind="stable")
        rdf["_hit"] = np.int8(1)
        m = pd.merge_asof(
            ldf,
            rdf,
            left_on=left_on,
            right_on=right_on,
            by=by,
            direction=direction,
            allow_exact_matches=not strict,
        )
        m = m[m["_hit"].notna()]
        # null-padding the unmatched rows floats int columns; recast
        # now that only matched rows remain
        for n, dt in rdf.dtypes.items():
            if n in m.columns and m[n].dtype != dt:
                m[n] = m[n].astype(dt)
        return pa.Table.from_pandas(m[out_names], preserve_index=False)

    u = left.map_batches(left_side, batch_format="pyarrow").union(
        right.map_batches(right_side, batch_format="pyarrow")
    )
    return u.groupby("_bucket").map_groups(merge_bucket, batch_format="pyarrow")
