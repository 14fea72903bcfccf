"""Distributed global rank — assign every row its 0-based position
under a total order WITHOUT collecting the table: one range sort, a
per-block row count (bare ints to the driver — metadata scale), an
exclusive scan, and a block-local arange. The same
prefix-offset pattern as ``relational.running_value_sum_rangesort`` /
``batching.shuffle_shards``; no per-key state, no block ever holds
more than its own rows.

This is the primitive behind rank-defined corpus operations: CCNet
perplexity buckets (head/middle/tail terciles of the LM score),
percentile labels, top-p% selection — anywhere "position in the
global order" must be exact and the order spans blocks.

Reference parity: beyond-reference LLM-data-pipeline surface
(SURVEY.md §2.8).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd


def global_rank(
    ds: rd.Dataset, sort_keys: list[str], out_col: str = "rank"
) -> rd.Dataset:
    """Append ``out_col``: the row's 0-based global position under
    ``sort_keys`` (make the key total — include a tiebreaker column —
    or equal keys rank in sort-placement order)."""
    import ray

    srt = ds.sort(sort_keys).materialize()
    refs = srt.to_arrow_refs()
    if not refs:
        return srt

    @ray.remote
    def nrows(t: pa.Table) -> int:
        return t.num_rows

    counts = np.array(ray.get([nrows.remote(r) for r in refs]), np.int64)
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    # drop 0-row sort partitions: they carry no ranks, and Ray's
    # pandas-block -> arrow conversion nulls the dtypes of empty blocks
    # (user_id: null), poisoning the downstream operator schema
    keep = [i for i, c in enumerate(counts) if c > 0]
    if not keep:
        return srt

    @ray.remote
    def finish(t: pa.Table, start: int) -> pa.Table:
        return t.append_column(
            out_col,
            pa.array(start + np.arange(t.num_rows, dtype=np.int64)),
        )

    return rd.from_arrow_refs(
        [finish.remote(refs[i], int(starts[i])) for i in keep]
    )


def rank_buckets(
    ds: rd.Dataset,
    sort_keys: list[str],
    labels: list[str],
    out_col: str = "bucket",
) -> rd.Dataset:
    """Split the global order into ``len(labels)`` equal-count bands
    and label every row (CCNet's head/middle/tail when ``labels`` has
    three entries and the key is an LM score): band index is
    ``rank * k // n`` — exact integer arithmetic, no float quantile
    boundary."""
    ranked = global_rank(ds, sort_keys)
    n = ranked.count()
    k = len(labels)
    lab = np.array(labels, dtype=object)

    def label(batch: pa.Table) -> pa.Table:
        r = np.asarray(batch.column("rank"))
        return batch.append_column(
            out_col, pa.array(lab[r * k // max(n, 1)], pa.string())
        )

    return ranked.map_batches(label, batch_format="pyarrow")


def prefix_sum(
    ds: rd.Dataset,
    sort_keys: list[str],
    value_col: str,
    out_col: str = "prefix",
) -> rd.Dataset:
    """Append ``out_col``: the EXCLUSIVE prefix sum of ``value_col``
    (int64) under the global ``sort_keys`` order — the distributed
    scan primitive behind rank statistics (Mann-Whitney AUC, Lorenz
    curves, cumulative-share reports). Same shape as
    :func:`global_rank`: one range sort, per-block partial sums to the
    driver as bare ints (metadata scale), exclusive scan, block-local
    cumsum."""
    import ray

    srt = ds.sort(sort_keys).materialize()
    refs = srt.to_arrow_refs()
    if not refs:
        return srt

    @ray.remote
    def block_sum(t: pa.Table) -> tuple[int, int]:
        if not t.num_rows:
            return 0, 0
        return int(np.asarray(t.column(value_col), np.int64).sum()), t.num_rows

    stats = ray.get([block_sum.remote(r) for r in refs])
    sums = np.array([s for s, _ in stats], np.int64)
    starts = np.concatenate([[0], np.cumsum(sums)[:-1]])
    # drop 0-row partitions (same empty-block dtype-nulling as global_rank)
    keep = [i for i, (_, c) in enumerate(stats) if c > 0]
    if not keep:
        return srt

    @ray.remote
    def finish(t: pa.Table, start: int) -> pa.Table:
        v = (
            np.asarray(t.column(value_col), np.int64)
            if t.num_rows
            else np.zeros(0, np.int64)
        )
        return t.append_column(out_col, pa.array(start + np.cumsum(v) - v))

    return rd.from_arrow_refs(
        [finish.remote(refs[i], int(starts[i])) for i in keep]
    )
