"""Storage-layout & shuffle-observability operators.

- :func:`zorder_layout` — multi-dimension Z-order (Morton) clustering
  key + file assignment, the lakehouse data-layout op (Delta/Iceberg
  ``OPTIMIZE ZORDER BY``): rows whose key prefixes match land in the
  same file, so a reader filtering on EITHER dimension prunes files.
  At 100 TB this is the "write once, prune forever" layout pass —
  one vectorized key computation, one repartition-by-prefix.
- :func:`partition_stats` — per-hash-bucket row/byte counts + integer
  skew ratio over the exact bucket function the engine's shuffles use
  (functions/joins.key_bucket): the observability pass a shuffle
  planner reads BEFORE committing to a partitioning key; a skew_ppm
  of 1e6 means a perfectly balanced bucket, 32e6 means one bucket
  holds the whole table.

Both are exact-integer and SQL-replayable (bit-interleave as a sum of
shifted bits; splitmix64 via the HUGEINT split multiply).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from vietnamese_ocr_ray.functions.agg import hash_aggregate
from vietnamese_ocr_ray.functions.joins import _mix64


def zorder_key(a: np.ndarray, b: np.ndarray, bits: int = 8) -> np.ndarray:
    """Morton interleave of two ``bits``-wide non-negative ints:
    bit i of ``b`` lands at position 2i, bit i of ``a`` at 2i+1.
    Vectorized over the rows; the bit loop is O(bits), not O(rows)."""
    z = np.zeros(a.shape[0], np.int64)
    for i in range(bits):
        z |= ((b >> i) & 1) << (2 * i)
        z |= ((a >> i) & 1) << (2 * i + 1)
    return z


def zorder_layout(
    ds: rd.Dataset,
    group_col: str,
    value_col: str,
    *,
    id_col: str = "doc_id",
    value_cap: int = 255,
    cells_per_file: int = 16,
) -> rd.Dataset:
    """(id, zorder_key, file_bucket) for clustering rows by BOTH the
    categorical ``group_col`` (rank within its sorted distinct values)
    and the numeric ``value_col`` (capped at ``value_cap``). The
    distinct-group table is vocabulary-sized: one tiny aggregate, then
    a broadcast rank lookup — no shuffle of the corpus itself.
    ``file_bucket = zkey // cells_per_file`` is the write-target
    assignment (`write_parquet(partition_cols=["file_bucket"])`)."""
    groups = (
        hash_aggregate(
            ds.select_columns([group_col]), [group_col], {"n": (group_col, "count")}
        )
        .to_pandas()[group_col]
        .astype(str)
        .sort_values(kind="stable")
        .tolist()
    )
    garr = pa.array(groups, pa.string())

    def key(batch: pa.Table) -> pa.Table:
        r = (
            pc.index_in(batch.column(group_col), garr)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        v = np.minimum(
            batch.column(value_col).to_numpy(zero_copy_only=False).astype(np.int64),
            value_cap,
        )
        z = zorder_key(r, v)
        return pa.table(
            {
                id_col: batch.column(id_col),
                "zorder_key": pa.array(z),
                "file_bucket": pa.array(z // cells_per_file),
            }
        )

    return ds.map_batches(key, batch_format="pyarrow")


def partition_stats(
    ds: rd.Dataset,
    key_col: str,
    weight_col: str,
    *,
    num_buckets: int = 32,
) -> pa.Table:
    """Per-bucket (rows, weight sum, skew_ppm) under the engine's own
    integer bucket hash (splitmix64 % num_buckets). skew_ppm is the
    EXACT integer ``1e6 * n_rows * num_buckets // total_rows`` —
    1_000_000 for a perfectly even bucket. The per-bucket table is
    num_buckets rows; the only driver-side math is the final ratio."""

    def tag(batch: pa.Table) -> pa.Table:
        k = batch.column(key_col).to_numpy(zero_copy_only=False).astype(np.int64)
        bucket = (_mix64(k) % np.uint64(num_buckets)).astype(np.int64)
        return pa.table(
            {"bucket": pa.array(bucket), "w": batch.column(weight_col)}
        )

    per = (
        hash_aggregate(
            ds.map_batches(tag, batch_format="pyarrow"),
            ["bucket"],
            {"n_rows": ("bucket", "count"), "w_sum": ("w", "sum")},
        )
        .to_pandas()
        .sort_values("bucket", kind="stable")
    )
    n = per["n_rows"].to_numpy(np.int64)
    total = int(n.sum())
    return pa.table(
        {
            "bucket": pa.array(per["bucket"].to_numpy(np.int64)),
            "n_rows": pa.array(n),
            "w_sum": pa.array(per["w_sum"].to_numpy(np.int64)),
            "skew_ppm": pa.array(1_000_000 * n * num_buckets // total),
        }
    )


def zonemap_prune_stats(
    ds: rd.Dataset,
    layout_col: str,
    value_col: str,
    lo: int,
    hi: int,
    *,
    keys_per_zone: int = 512,
) -> rd.Dataset:
    """Zone-map (min/max statistics) audit: lay the table out in
    key-range zones of ``layout_col`` (``zone = key // keys_per_zone``,
    the physical clustering a sorted write produces), record each
    zone's min/max of ``value_col``, and evaluate how well those zone
    maps prune the range predicate ``lo <= value < hi``:

    - ``pruned``      — the zone map alone excludes the zone
      (max < lo or min >= hi): its file is never opened;
    - ``n_match``     — exact matching rows, so a zone with
      ``pruned = 0 AND n_match = 0`` is a FALSE-POSITIVE zone — the
      scan opened it for nothing. The ratio of those rows is the
      "should have sorted by value_col / z-ordered" signal, the audit
      run before choosing a table's layout (zorder_layout is the fix).

    Scale shape: one per-batch Arrow group_by partial per zone -> one
    zone-bounded hash aggregate (zones = key range / keys_per_zone,
    never row count). All-integer, bit-exact vs SQL.
    """

    def _as_int64(col: pa.ChunkedArray) -> np.ndarray:
        # timestamp columns must normalize to µs BEFORE the int cast:
        # pandas-written parquet defaults to ns, which would make every
        # zone's min/max miss the µs lo/hi bounds (all-pruned, n_match=0)
        # with no error.  Same unit-safety rule as joins.merge_asof /
        # isotonic_hourly.
        a = col.to_numpy(zero_copy_only=False)
        if a.dtype.kind == "M":
            a = a.astype("datetime64[us]")
        return a.astype(np.int64)

    def partial(batch: pa.Table) -> pa.Table:
        k = _as_int64(batch.column(layout_col))
        v = _as_int64(batch.column(value_col))
        t = pa.table(
            {
                "zone": pa.array(k // keys_per_zone),
                "v": pa.array(v),
                "m": pa.array(((v >= lo) & (v < hi)).astype(np.int64)),
                "one": pa.array(np.ones(k.shape[0], np.int64)),
            }
        )
        g = t.group_by("zone").aggregate(
            [("v", "min"), ("v", "max"), ("m", "sum"), ("one", "sum")]
        )
        return g.rename_columns(["zone", "v_min", "v_max", "m", "n"])

    agg = hash_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["zone"],
        {
            "min_v": ("v_min", "min"),
            "max_v": ("v_max", "max"),
            "n_match": ("m", "sum"),
            "n_rows": ("n", "sum"),
        },
    )

    def finish(t: pa.Table) -> pa.Table:
        mn = pc.cast(t.column("min_v"), pa.int64())
        mx = pc.cast(t.column("max_v"), pa.int64())
        pruned = pc.cast(
            pc.or_(
                pc.less(mx, pa.scalar(lo, pa.int64())),
                pc.greater_equal(mn, pa.scalar(hi, pa.int64())),
            ),
            pa.int64(),
        )
        n_match = pc.cast(t.column("n_match"), pa.int64())
        return pa.table(
            {
                "zone": pc.cast(t.column("zone"), pa.int64()),
                "n_rows": pc.cast(t.column("n_rows"), pa.int64()),
                "min_v": mn,
                "max_v": mx,
                "pruned": pruned,
                "n_match": n_match,
                "false_positive": pc.cast(
                    pc.and_(
                        pc.equal(pruned, pa.scalar(0, pa.int64())),
                        pc.equal(n_match, pa.scalar(0, pa.int64())),
                    ),
                    pa.int64(),
                ),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def hilbert_key(a: np.ndarray, b: np.ndarray, bits: int = 8) -> np.ndarray:
    """Distance along the order-``bits`` Hilbert curve of the point
    (a, b) — the locality-preserving alternative to Morton order
    (zorder_key): consecutive keys are always GRID NEIGHBORS, so range
    scans over the key touch spatially-contiguous cells with no Morton
    "seam jumps". Vectorized over rows; the standard rotate-and-fold
    loop runs O(bits) numpy passes (Hilbert 1891 / the classic
    iterative xy2d), not O(rows) Python."""
    x = a.astype(np.int64).copy()
    y = b.astype(np.int64).copy()
    d = np.zeros(x.shape[0], np.int64)
    s = 1 << (bits - 1)
    while s > 0:
        rx = ((x & s) > 0).astype(np.int64)
        ry = ((y & s) > 0).astype(np.int64)
        d += s * s * ((3 * rx) ^ ry)
        # quadrant rotation: where ry == 0, flip both (if rx == 1),
        # then swap x/y — all from the pre-round values
        flipx = np.where(rx == 1, s - 1 - x, x)
        flipy = np.where(rx == 1, s - 1 - y, y)
        x, y = np.where(ry == 0, flipy, x), np.where(ry == 0, flipx, y)
        s >>= 1
    return d


def hilbert_layout(
    ds: rd.Dataset,
    group_col: str,
    value_col: str,
    *,
    id_col: str = "doc_id",
    value_cap: int = 255,
    cells_per_file: int = 16,
    bits: int = 8,
) -> rd.Dataset:
    """(id, hilbert_key, file_bucket): zorder_layout's shape with the
    Hilbert curve as the space-filling order — strictly better scan
    locality (every key step is a grid neighbor) at the cost of the
    rotate/fold arithmetic. Same broadcast group-rank lookup, zero
    corpus shuffles; ``file_bucket = key // cells_per_file`` is the
    partitioned-write target."""
    groups = (
        hash_aggregate(
            ds.select_columns([group_col]), [group_col], {"n": (group_col, "count")}
        )
        .to_pandas()[group_col]
        .astype(str)
        .sort_values(kind="stable")
        .tolist()
    )
    garr = pa.array(groups, pa.string())

    def key(batch: pa.Table) -> pa.Table:
        r = (
            pc.index_in(batch.column(group_col), garr)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        v = np.minimum(
            batch.column(value_col).to_numpy(zero_copy_only=False).astype(np.int64),
            value_cap,
        )
        h = hilbert_key(r, v, bits)
        return pa.table(
            {
                id_col: batch.column(id_col),
                "hilbert_key": pa.array(h),
                "file_bucket": pa.array(h // cells_per_file),
            }
        )

    return ds.map_batches(key, batch_format="pyarrow")


def rendezvous_shards(
    ds: rd.Dataset,
    id_col: str,
    n_shards: int = 8,
    drop_shard: int = 0,
) -> rd.Dataset:
    """Rendezvous (highest-random-weight) shard assignment audit
    (Thaler & Ravishankar 1998 — the consistent-hashing scheme behind
    stable shard maps): every row goes to
    ``argmax_s splitmix64(id * P + s)``; the HRW property is that
    removing one shard relocates ONLY that shard's rows (1/n of the
    table), where a plain ``id % n`` remap relocates almost
    everything. Output per shard: row count, exact balance ppm, and
    ``n_moved`` — rows whose assignment changes when ``drop_shard``
    disappears (nonzero only for the dropped shard's rows, which is
    the audit's point).

    Vectorized: one (rows x n_shards) splitmix64 matrix per batch,
    argmax along axis 1 (first-max == smallest shard id on the
    2^-64-probability tie); per-batch bincount partials -> one
    n_shards-row groupby. SQL replays the same fold per (id, shard)
    pair and picks the max via (weight DESC, shard ASC) row_number."""
    P = 1_000_003

    def tag(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        keys = (
            ids[:, None].astype(np.uint64) * np.uint64(P)
            + np.arange(n_shards, dtype=np.uint64)[None, :]
        )
        w = _mix64(keys.reshape(-1)).reshape(keys.shape)
        shard = np.argmax(w, axis=1).astype(np.int64)
        w2 = w.copy()
        w2[:, drop_shard] = 0  # dropped shard never wins (min weight)
        shard2 = np.argmax(w2, axis=1).astype(np.int64)
        moved = (shard2 != shard).astype(np.int64)
        n = np.bincount(shard, minlength=n_shards)
        m = np.bincount(shard, weights=moved, minlength=n_shards).astype(np.int64)
        return pa.table(
            {
                "shard": pa.array(np.arange(n_shards, dtype=np.int64)),
                "n_rows": pa.array(n.astype(np.int64)),
                "n_moved": pa.array(m),
            }
        )

    agg = hash_aggregate(
        ds.map_batches(tag, batch_format="pyarrow"),
        ["shard"],
        {"n_rows": ("n_rows", "sum"), "n_moved": ("n_moved", "sum")},
        num_buckets=1,
    )

    def finish(t: pa.Table) -> pa.Table:
        n = pc.cast(t.column("n_rows"), pa.int64())
        total = pc.sum(n).as_py() or 0
        n_np = n.to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "shard": pc.cast(t.column("shard"), pa.int64()),
                "n_rows": n,
                "balance_ppm": pa.array(
                    1_000_000 * n_np * n_shards // max(total, 1)
                ),
                "n_moved": pc.cast(t.column("n_moved"), pa.int64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")
