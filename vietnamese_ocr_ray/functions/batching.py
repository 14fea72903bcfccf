"""Training-batch construction — the last mile of an LLM data
pipeline: turning a cleaned corpus into the batches a trainer consumes.

* :func:`length_bucket_batches` — classic length-bucketed batching
  (group docs of similar token length so padding waste stays bounded,
  then cut deterministic fixed-size batches inside each bucket).
  SQL-mirrored: batch/position assignment equals a row_number window
  over (len_bucket ORDER BY doc_id).
* :func:`shuffle_shards` — deterministic epoch shuffle into training
  shards (salted-hash shard assignment + in-shard hash order), built
  on the range-sort prefix-offset pattern so no shard ever has to fit
  one task. SQL-mirrored: row_number over (shard ORDER BY hash, id).
* :func:`pack_sequences` — greedy first-fit-decreasing sequence
  packing (combine short docs into fixed token-budget bins, the
  "sample packing" trick that removes padding entirely). Deterministic
  and partitioning-invariant: docs are hash-bucketed by doc_id, each
  bucket packs independently in (desc length, asc doc_id) order, so
  bin contents depend only on the data. Packing is a heuristic with no
  SQL analog — verified by invariant tests (exactly-once assignment,
  budget respected, determinism under repartition).

Scale notes: length buckets are few (max_len / width), so the bucket
shuffle is tiny but a single bucket can hold a large corpus fraction —
per-bucket work is one vectorized sort+arange, and the
`running_value_sum_rangesort` prefix-offset pattern is the documented
fallback when one bucket outgrows a task heap. `pack_sequences`
buckets are hash-uniform (corpus/num_buckets docs each); the FFD inner
loop is Python-per-doc over a numpy bin-remaining array — bounded by
bucket size, and bins stay few because budget >> mean doc length.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from vietnamese_ocr_ray.functions.joins import key_bucket

import ray


@ray.remote
def _num_rows(t: pa.Table) -> int:
    return t.num_rows


def _with_token_counts(ds: rd.Dataset) -> rd.Dataset:
    """(doc_id, n_tokens): whitespace token count, exactly
    ``len(string_split(text, ' '))`` (spaces + 1, '' counts 1)."""

    def count(batch: pa.Table) -> pa.Table:
        n = pc.add(pc.count_substring(batch.column("text"), " "), 1)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_tokens": pc.cast(n, pa.int64()),
            }
        )

    return ds.select_columns(["doc_id", "text"]).map_batches(
        count, batch_format="pyarrow"
    )


def length_bucket_batches(
    ds: rd.Dataset,
    bucket_width: int = 8,
    batch_size: int = 32,
) -> rd.Dataset:
    """(doc_id, n_tokens, len_bucket, batch_idx, pos_in_batch):
    deterministic length-bucketed batch assignment. Docs in the same
    ``n_tokens // bucket_width`` bucket are ordered by doc_id and cut
    into consecutive ``batch_size`` batches — identical to the SQL
    row_number window, one len_bucket shuffle here."""
    counted = _with_token_counts(ds)

    def bucketize(batch: pa.Table) -> pa.Table:
        n = np.asarray(batch.column("n_tokens"), dtype=np.int64)
        return batch.append_column(
            "len_bucket", pa.array(n // bucket_width)
        )

    def assign(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values("doc_id", kind="stable")
        rn = np.arange(len(g), dtype=np.int64)
        return pa.table(
            {
                "doc_id": pa.array(g["doc_id"].to_numpy(np.int64)),
                "n_tokens": pa.array(g["n_tokens"].to_numpy(np.int64)),
                "len_bucket": pa.array(
                    g["len_bucket"].to_numpy(np.int64)
                ),
                "batch_idx": pa.array(rn // batch_size),
                "pos_in_batch": pa.array(rn % batch_size),
            }
        )

    return (
        counted.map_batches(bucketize, batch_format="pyarrow")
        .groupby("len_bucket")
        .map_groups(assign, batch_format="pandas")
    )


def shuffle_shards(
    ds: rd.Dataset,
    num_shards: int = 8,
    salt: str = "shard:",
    id_col: str = "doc_id",
) -> rd.Dataset:
    """(doc_id, shard, pos_in_shard): deterministic global shuffle into
    training shards. The shard is the salted content hash mod
    ``num_shards`` (rerun/partitioning-stable — the same no-shuffle
    contract as ``functions.sampling.hash_sample``); within a shard,
    rows order by (mixed hash, doc_id) — a data-determined pseudorandom
    order, so concatenating shards 0..S-1 IS the epoch shuffle.

    Scale shape (the ``running_value_sum_rangesort`` pattern — no
    shard-fits-one-task assumption): one global range sort on
    (shard, hash, id); a tiny per-block pass counts rows per shard
    (``num_shards`` ints per block to the driver); the driver
    exclusive-scans those counts in block order into per-(block, shard)
    starting positions; each block then adds its local arange. A shard
    is consecutive blocks after the sort, so positions are dense and
    globally correct with no per-group materialization."""
    import ray

    from vietnamese_ocr_ray.functions.sampling import _mixed_hash, _poly_hash

    def tag(batch: pa.Table) -> pa.Table:
        keys = pc.binary_join_element_wise(
            pa.scalar(salt),
            pc.cast(batch.column(id_col), pa.string()),
            pa.scalar(""),
        )
        h = _mixed_hash(_poly_hash(keys))
        return pa.table(
            {
                id_col: batch.column(id_col),
                "shard": pa.array(h % num_shards),
                "_h": pa.array(h),
            }
        )

    srt = (
        ds.select_columns([id_col])
        .map_batches(tag, batch_format="pyarrow")
        .sort(["shard", "_h", id_col])
        .materialize()
    )
    refs = srt.to_arrow_refs()
    if not refs:
        return srt.map_batches(
            lambda b: b.drop_columns(["_h"]).append_column(
                "pos_in_shard", pa.array([], pa.int64())
            ),
            batch_format="pyarrow",
        )

    @ray.remote
    def shard_counts(t: pa.Table) -> np.ndarray:
        return np.bincount(
            np.asarray(t.column("shard")), minlength=num_shards
        ).astype(np.int64)

    counts = ray.get([shard_counts.remote(r) for r in refs])
    starts: list[np.ndarray] = []
    running = np.zeros(num_shards, np.int64)
    for c in counts:  # block order == sort order
        starts.append(running.copy())
        running += c

    @ray.remote
    def finish(t: pa.Table, start: np.ndarray) -> pa.Table:
        shard = np.asarray(t.column("shard"))
        n = shard.shape[0]
        idx = np.arange(n, dtype=np.int64)
        first = np.ones(n, dtype=bool)
        first[1:] = shard[1:] != shard[:-1]
        run_start = np.nonzero(first)[0]
        run_len = np.diff(np.append(run_start, n))
        local = idx - np.repeat(idx[run_start], run_len)
        pos = local + start[shard]
        return pa.table(
            {
                id_col: t.column(id_col),
                "shard": t.column("shard"),
                "pos_in_shard": pa.array(pos),
            }
        )

    return rd.from_arrow_refs(
        [finish.remote(r, starts[i]) for i, r in enumerate(refs)]
    )


def pack_sequences(
    ds: rd.Dataset,
    budget: int = 128,
    num_buckets: int = 32,
    length_col: str | None = None,
    bucket_mode: str = "hash",
) -> rd.Dataset:
    """(doc_id, n_tokens, pack_bucket, bin_id): greedy first-fit-
    decreasing packing of docs into token-budget bins within each
    doc_id hash bucket. A doc longer than ``budget`` gets a singleton
    bin (callers chunk oversize docs first — see
    ``functions.chunk.doc_chunks``). bin_ids are dense per bucket;
    (pack_bucket, bin_id) is the global bin key.

    ``length_col`` packs by a PRECOMPUTED length instead of the
    whitespace token count — e.g. ``bpe_encode``'s ``n_pieces`` for
    tokenizer-aware packing (real trainers pack by the tokenizer's
    sequence length, not word count).

    ``bucket_mode``: "hash" (default) buckets by splitmix64/FNV of the
    key — robust to adversarial key distributions; "mod" buckets
    integer keys by ``doc_id % num_buckets`` — equally balanced for
    the usual dense/sequential id space and exactly restatable by a
    SQL oracle (the driver value-checks pack_bins through it)."""
    if length_col is not None:
        counted = ds.map_batches(
            lambda b, c=length_col: pa.table(
                {
                    "doc_id": b.column("doc_id"),
                    "n_tokens": pc.cast(b.column(c), pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
    else:
        counted = _with_token_counts(ds)

    def tag(batch: pa.Table) -> pa.Table:
        if bucket_mode == "mod":
            ids = np.asarray(
                pc.cast(
                    batch.column("doc_id").combine_chunks()
                    if isinstance(batch.column("doc_id"), pa.ChunkedArray)
                    else batch.column("doc_id"),
                    pa.int64(),
                )
            )
            bucket = ids % np.int64(num_buckets)
        else:
            bucket = key_bucket(batch.column("doc_id"), num_buckets)
        return batch.append_column(
            "pack_bucket", pa.array(bucket.astype(np.int64))
        )

    def pack(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(
            ["n_tokens", "doc_id"],
            ascending=[False, True],
            kind="stable",
        )
        lens = g["n_tokens"].to_numpy(np.int64)
        bins = np.empty(len(g), np.int64)  # bin id per doc
        remaining = np.empty(len(g), np.int64)  # capacity per open bin
        n_bins = 0
        for i, L in enumerate(lens):
            fit = remaining[:n_bins] >= L
            if fit.any():
                b = int(np.argmax(fit))  # first fit
                remaining[b] -= L
            else:
                b = n_bins
                remaining[b] = max(budget - L, 0)
                n_bins += 1
            bins[i] = b
        return pa.table(
            {
                "doc_id": pa.array(g["doc_id"].to_numpy(np.int64)),
                "n_tokens": pa.array(lens),
                "pack_bucket": pa.array(
                    g["pack_bucket"].to_numpy(np.int64)
                ),
                "bin_id": pa.array(bins),
            }
        )

    return (
        counted.map_batches(tag, batch_format="pyarrow")
        .groupby("pack_bucket")
        .map_groups(pack, batch_format="pandas")
    )


def shuffle_autocorr(
    ds: rd.Dataset,
    num_shards: int = 8,
    salt: str = "shard:",
) -> rd.Dataset:
    """Shuffle-quality audit: after the deterministic shard shuffle
    (:func:`shuffle_shards` order), how often do ADJACENT rows within a
    shard share a source? Reports the observed adjacent-same-source
    rate against the random-permutation expectation
    sum_s n_s(n_s-1) / (N(N-1)) and their ratio — clump_ratio >> 1
    means the "shuffle" still feeds the trainer source-correlated
    batches (the curriculum-leak failure mode of a bad epoch shuffle).

    Exactness: pair counts are integers; the three rates are single
    float divisions rounded to 6dp. Scale shape: the tag pass carries
    (hash, source) only; ONE shard groupby sorts each shard locally
    and emits two ints; per-source counts are a tiny aggregate."""
    import pandas as pd

    from ray.data.aggregate import Sum

    from vietnamese_ocr_ray.functions.agg import hash_aggregate
    from vietnamese_ocr_ray.functions.sampling import _mixed_hash, _poly_hash

    def tag(batch: pa.Table) -> pa.Table:
        keys = pc.binary_join_element_wise(
            pa.scalar(salt),
            pc.cast(batch.column("doc_id"), pa.string()),
            pa.scalar(""),
        )
        h = _mixed_hash(_poly_hash(keys))
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "source": batch.column("source"),
                "shard": pa.array(h % num_shards),
                "_h": pa.array(h),
            }
        )

    def shard_pairs(g: pd.DataFrame) -> pa.Table:
        s = g.sort_values(["_h", "doc_id"], kind="stable")
        src = s["source"].to_numpy()
        same = int((src[1:] == src[:-1]).sum()) if len(src) > 1 else 0
        return pa.table(
            {
                "pairs": pa.array([max(len(src) - 1, 0)], pa.int64()),
                "same": pa.array([same], pa.int64()),
            }
        )

    agg = (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(shard_pairs, batch_format="pandas")
        .aggregate(Sum("pairs", alias_name="pairs"), Sum("same", alias_name="same"))
    )
    pairs, same = int(agg["pairs"]), int(agg["same"])

    counts = hash_aggregate(
        ds.select_columns(["source"]),
        ["source"],
        {"n": ("source", "count")},
        num_buckets=4,
    ).to_pandas()
    n_s = counts["n"].to_numpy(np.int64)
    N = int(n_s.sum())
    exp_num = int((n_s * (n_s - 1)).sum())
    expected = float(exp_num) / float(N * (N - 1))
    observed = float(same) / float(pairs) if pairs else 0.0
    ratio = round(observed / expected, 6) if expected else 0.0
    return rd.from_arrow(
        pa.table(
            {
                "n_pairs": pa.array([pairs], pa.int64()),
                "n_same_source": pa.array([same], pa.int64()),
                "observed_rate": pa.array([round(observed, 6)], pa.float64()),
                "expected_rate": pa.array([round(expected, 6)], pa.float64()),
                "clump_ratio": pa.array([ratio], pa.float64()),
            }
        )
    )


def curriculum_order(ds: rd.Dataset, tiles: int = 4) -> rd.Dataset:
    """Curriculum ordering for training (Bengio 2009 easy-to-hard):
    rank documents by an exact integer difficulty proxy
    (``diff_milli = 1000 * n_chars // n_tokens`` — mean token length,
    long words ~ harder), cut the ranking into ``tiles`` curriculum
    stages, and emit the global training order — stages in sequence,
    docs WITHIN a stage in a seeded deterministic shuffle
    (splitmix64(doc_id), the engine's standard draw) so each stage is
    decorrelated from the difficulty sort without any RNG state.

    Shape: two global range sorts (the op IS an ordering op), each
    followed by per-block vectorized rank arithmetic over
    driver-scanned block sizes (a blocks-count table, never rows) —
    the value_ntile/shuffle_shards machinery. Everything is exact
    integers; SQL replays both orderings with window row_numbers.
    """
    from vietnamese_ocr_ray.functions.joins import _mix64

    def tag(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern(batch.column("text"), " ")
        ntok = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        nch = batch.column("n_chars").to_numpy(zero_copy_only=False).astype(np.int64)
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(ids),
                "diff_milli": pa.array(1000 * nch // ntok),
                "skey": pa.array(_mix64(ids).astype(np.int64)),
            }
        )

    def _block_offsets(mat) -> tuple[list, list[int], int]:
        refs = mat.to_arrow_refs()
        sizes = ray.get([_num_rows.remote(r) for r in refs])
        offs, run = [], 0
        for s in sizes:
            offs.append(run)
            run += int(s)
        return refs, offs, run

    s1 = ds.map_batches(tag, batch_format="pyarrow").sort(
        ["diff_milli", "doc_id"]
    ).materialize()
    refs1, offs1, n = _block_offsets(s1)

    @ray.remote
    def stage_block(t: pa.Table, start: int, n: int, tiles: int) -> pa.Table:
        rank = start + np.arange(t.num_rows, dtype=np.int64)
        return t.append_column("stage", pa.array(tiles * rank // n))

    staged = rd.from_arrow_refs(
        [stage_block.remote(r, offs1[i], n, tiles) for i, r in enumerate(refs1)]
    )

    s2 = staged.sort(["stage", "skey", "doc_id"]).materialize()
    refs2, offs2, _ = _block_offsets(s2)

    @ray.remote
    def rank_block(t: pa.Table, start: int) -> pa.Table:
        order = start + np.arange(t.num_rows, dtype=np.int64)
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "diff_milli": t.column("diff_milli"),
                "stage": t.column("stage"),
                "order_rank": pa.array(order),
            }
        )

    return rd.from_arrow_refs(
        [rank_block.remote(r, offs2[i]) for i, r in enumerate(refs2)]
    )
