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


def _ensure_schema(ds: rd.Dataset, schema: pa.Schema) -> rd.Dataset:
    """Pin the declared output schema on the lazy Dataset by unioning a
    typed zero-row seed block — ``Dataset.schema()`` then stays correct
    even when every group returns zero rows. (Known Ray limitation,
    not fixable here: ``to_pandas()`` of a fully-EMPTY dataset still
    loses columns — this Ray version drops empty blocks before the UDF
    and pandas-concat erases their schema; it affects every empty
    Dataset, e.g. a filter matching nothing, not just these joins.)"""
    return ds.union(rd.from_arrow(schema.empty_table()))


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
        return pa.Table.from_pandas(m[out_names], preserve_index=False).replace_schema_metadata(None)

    u = left.map_batches(left_side, batch_format="pyarrow").union(
        right.map_batches(right_side, batch_format="pyarrow")
    )
    out = u.groupby("_bucket").map_groups(merge_bucket, batch_format="pyarrow")
    out_schema = pa.schema(
        [pa.field(n, (l_fields | r_fields)[n]) for n in l_names + r_payload]
    )
    return _ensure_schema(out, out_schema)


def range_count_join(
    left: rd.Dataset,
    right: rd.Dataset,
    *,
    by: str,
    left_on: str,
    right_on: str,
    lo_us: int,
    hi_us: int,
    out_col: str = "n_in_range",
    num_buckets: int = 32,
) -> rd.Dataset:
    """Range join, count flavour: for every left row, the number of
    right rows with the same ``by`` key and ``right_on`` in
    ``[left_on + lo_us, left_on + hi_us)`` microseconds (left-join
    semantics — zero-match rows survive with 0).

    Same scale shape as :func:`asof_join` (one bucket shuffle); inside
    a bucket the count is two ``searchsorted`` calls on a composite
    (key, time) ordering — no Python per row or per key (falls back to
    a per-key loop only if the composite would overflow int64).
    """
    l_schema = left.schema()
    l_names = list(l_schema.names)
    l_types = dict(zip(l_schema.names, l_schema.types))

    def tag(side: int):
        def fn(batch: pa.Table) -> pa.Table:
            cols = {}
            if side == 0:
                for n in l_names:
                    cols[n] = batch.column(n)
            else:
                # right rows ride in the left schema: key + time slot
                # filled, every other left column null-padded
                for n in l_names:
                    if n == by:
                        cols[n] = batch.column(by)
                    elif n == left_on:
                        cols[n] = batch.column(right_on)
                    else:
                        cols[n] = pa.nulls(batch.num_rows, l_types[n])
            cols["_side"] = pa.array(np.full(batch.num_rows, side, np.int8))
            cols["_bucket"] = pa.array(
                key_bucket(batch.column(by), num_buckets).astype(np.int32)
            )
            return pa.table(cols)

        return fn

    def count_bucket(group: pa.Table) -> pa.Table:
        is_left = pc.equal(group.column("_side"), 0)
        lt = group.filter(is_left).select(l_names)
        rt = group.filter(pc.invert(is_left)).select([by, left_on])
        if lt.num_rows == 0:
            out = {n: pa.nulls(0, lt.schema.field(n).type) for n in l_names}
            out[out_col] = pa.nulls(0, pa.int64())
            return pa.table(out)
        l_key = np.asarray(lt.column(by))
        l_ts = np.asarray(lt.column(left_on)).astype("datetime64[us]").astype(np.int64)
        r_key = np.asarray(rt.column(by))
        r_ts = np.asarray(rt.column(left_on)).astype("datetime64[us]").astype(np.int64)
        counts = np.zeros(lt.num_rows, np.int64)
        if rt.num_rows:
            codes, inv = np.unique(np.concatenate([r_key, l_key]), return_inverse=True)
            r_code, l_code = inv[: len(r_key)], inv[len(r_key) :]
            t0 = min(int(r_ts.min()), int(l_ts.min()) + lo_us)
            span = max(int(r_ts.max()), int(l_ts.max()) + hi_us) - t0 + 2
            if len(codes) * span < (1 << 62):
                comp_r = np.sort(r_code * span + (r_ts - t0))
                lo = np.searchsorted(comp_r, l_code * span + (l_ts + lo_us - t0), "left")
                hi = np.searchsorted(comp_r, l_code * span + (l_ts + hi_us - t0), "left")
                counts = (hi - lo).astype(np.int64)
            else:  # composite overflow: per-key sorted slices
                order = np.lexsort((r_ts, r_code))
                r_code_s, r_ts_s = r_code[order], r_ts[order]
                starts = np.searchsorted(r_code_s, np.arange(len(codes)), "left")
                ends = np.searchsorted(r_code_s, np.arange(len(codes)), "right")
                for i in range(len(l_code)):
                    s, e = starts[l_code[i]], ends[l_code[i]]
                    seg = r_ts_s[s:e]
                    counts[i] = np.searchsorted(
                        seg, l_ts[i] + hi_us, "left"
                    ) - np.searchsorted(seg, l_ts[i] + lo_us, "left")
        return pa.table(
            {**{n: lt.column(n) for n in l_names}, out_col: pa.array(counts)}
        )

    u = left.map_batches(tag(0), batch_format="pyarrow").union(
        right.map_batches(tag(1), batch_format="pyarrow")
    )
    out = u.groupby("_bucket").map_groups(count_bucket, batch_format="pyarrow")
    out_schema = pa.schema(
        [
            pa.field(n, t if isinstance(t, pa.DataType) else pa.from_numpy_dtype(t))
            for n, t in l_types.items()
        ]
        + [pa.field(out_col, pa.int64())]
    )
    return _ensure_schema(out, out_schema)


def interval_join(
    left: rd.Dataset,
    right: rd.Dataset,
    *,
    by: str,
    left_on: str,
    right_on: str,
    window_us: int,
    num_buckets: int = 32,
) -> rd.Dataset:
    """Stream-stream interval join, PAIR-emitting flavour: one output
    row per (left, right) pair with equal ``by`` key and ``right_on``
    in ``[left_on, left_on + window_us)`` — the 1:N expansion of
    :func:`range_count_join` (inner semantics: left rows with no match
    drop). Same scale shape: one bucket shuffle; inside a bucket the
    pair set comes from two composite-key ``searchsorted`` calls plus
    a vectorized repeat/arange expansion — no Python per row or per
    key (per-key sorted-slice fallback only on composite overflow).
    Output columns: every left column, then the right payload
    (pre-rename collisions away; ``right_on`` must differ from every
    left name)."""
    l_schema = left.schema()
    r_schema = right.schema()
    l_names = list(l_schema.names)
    r_payload = [n for n in r_schema.names if n != by]
    overlap = set(l_names) & set(r_payload)
    if overlap:
        raise ValueError(f"rename right columns colliding with left: {overlap}")
    l_types = dict(zip(l_schema.names, l_schema.types))
    r_types = {
        n: t for n, t in zip(r_schema.names, r_schema.types) if n != by
    }
    all_types = l_types | r_types
    out_names = l_names + r_payload

    def tag(side: int):
        def fn(batch: pa.Table) -> pa.Table:
            cols = {}
            for n in l_names:
                if side == 0:
                    cols[n] = batch.column(n)
                elif n == by:
                    cols[n] = batch.column(by)
                else:
                    cols[n] = pa.nulls(batch.num_rows, l_types[n])
            for n in r_payload:
                cols[n] = (
                    batch.column(n)
                    if side == 1
                    else pa.nulls(batch.num_rows, r_types[n])
                )
            cols["_side"] = pa.array(np.full(batch.num_rows, side, np.int8))
            cols["_bucket"] = pa.array(
                key_bucket(batch.column(by), num_buckets).astype(np.int32)
            )
            return pa.table(cols)

        return fn

    def expand_bucket(group: pa.Table) -> pa.Table:
        empty = pa.table({n: pa.nulls(0, all_types[n]) for n in out_names})
        is_left = pc.equal(group.column("_side"), 0)
        lt = group.filter(is_left).select(l_names)
        rt = group.filter(pc.invert(is_left)).select([by, *r_payload])
        if lt.num_rows == 0 or rt.num_rows == 0:
            return empty
        l_key = np.asarray(lt.column(by))
        l_ts = np.asarray(lt.column(left_on)).astype("datetime64[us]").astype(np.int64)
        r_key = np.asarray(rt.column(by))
        r_ts = np.asarray(rt.column(right_on)).astype("datetime64[us]").astype(np.int64)
        codes, inv = np.unique(np.concatenate([r_key, l_key]), return_inverse=True)
        r_code, l_code = inv[: len(r_key)], inv[len(r_key) :]
        order = np.lexsort((r_ts, r_code))
        r_code_s, r_ts_s = r_code[order], r_ts[order]
        t0 = min(int(r_ts.min()), int(l_ts.min()))
        span = max(int(r_ts.max()), int(l_ts.max()) + window_us) - t0 + 2
        if len(codes) * span < (1 << 62):
            comp_r = r_code_s * span + (r_ts_s - t0)
            lo = np.searchsorted(comp_r, l_code * span + (l_ts - t0), "left")
            hi = np.searchsorted(
                comp_r, l_code * span + (l_ts + window_us - t0), "left"
            )
        else:  # composite overflow: per-key sorted slices
            k = np.arange(len(codes))
            kstart = np.searchsorted(r_code_s, k, "left")
            kend = np.searchsorted(r_code_s, k, "right")
            lo = np.empty(len(l_code), np.int64)
            hi = np.empty(len(l_code), np.int64)
            for i in range(len(l_code)):
                s, e = kstart[l_code[i]], kend[l_code[i]]
                lo[i] = s + np.searchsorted(r_ts_s[s:e], l_ts[i], "left")
                hi[i] = s + np.searchsorted(
                    r_ts_s[s:e], l_ts[i] + window_us, "left"
                )
        counts = hi - lo
        total = int(counts.sum())
        if total == 0:
            return empty
        left_idx = np.repeat(np.arange(lt.num_rows, dtype=np.int64), counts)
        starts = np.cumsum(counts) - counts
        flat = np.repeat(lo, counts) + (
            np.arange(total, dtype=np.int64) - np.repeat(starts, counts)
        )
        right_idx = order[flat]
        lt_out = lt.take(pa.array(left_idx))
        rt_out = rt.take(pa.array(right_idx))
        return pa.table(
            {
                **{n: lt_out.column(n) for n in l_names},
                **{n: rt_out.column(n) for n in r_payload},
            }
        )

    u = left.map_batches(tag(0), batch_format="pyarrow").union(
        right.map_batches(tag(1), batch_format="pyarrow")
    )
    out = u.groupby("_bucket").map_groups(expand_bucket, batch_format="pyarrow")
    out_schema = pa.schema([pa.field(n, all_types[n]) for n in out_names])
    return _ensure_schema(out, out_schema)
