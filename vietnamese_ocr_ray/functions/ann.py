"""Similarity search over an embedding column (list<float>).

* ``ann_bruteforce`` — exact cosine top-k: per-batch numpy matmul
  against a broadcast query vector + per-batch partial top-k, then a
  tiny global sort. The per-batch partial keeps the global sort input
  at k * num_blocks rows — the scale path for 10^12 rows.
* ``ann_lsh`` — random-hyperplane LSH variant: 2^planes buckets;
  probes the query's bucket plus all buckets within Hamming distance
  ``probe_hamming``; exact cosine within probed buckets only.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd


def _matrix(batch: pa.Table, col: str = "embedding") -> np.ndarray:
    """list<float> column -> (N, D) float64, zero-copy flatten."""
    arr = batch.column(col)
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    flat = np.asarray(pc.list_flatten(arr), dtype=np.float64)
    n = len(arr)
    return flat.reshape(n, -1)


def cosine_scores(batch: pa.Table, q: np.ndarray, id_col: str = "vec_id") -> pa.Table:
    m = _matrix(batch)
    qn = q / np.linalg.norm(q)
    norms = np.linalg.norm(m, axis=1)
    cos = (m @ qn) / np.maximum(norms, 1e-30)
    return pa.table(
        {
            id_col: batch.column(id_col),
            "cos": pa.array(np.round(cos, 6), pa.float64()),
        }
    )


def ann_bruteforce(
    ds: rd.Dataset, query: np.ndarray, k: int = 10, id_col: str = "vec_id"
) -> rd.Dataset:
    """Exact cosine top-k: vectorized scoring + per-batch partial top-k
    -> global sort+limit over the small partials."""

    def score_topk(batch: pa.Table) -> pa.Table:
        scored = cosine_scores(batch, query, id_col)
        if scored.num_rows > k:
            order = pc.sort_indices(
                scored,
                sort_keys=[("cos", "descending"), (id_col, "ascending")],
            )
            scored = scored.take(order[:k])
        return scored

    return (
        ds.select_columns([id_col, "embedding"])
        .map_batches(score_topk, batch_format="pyarrow")
        .sort(["cos", id_col], descending=[True, False])
        .limit(k)
    )


def cosine_pairs(
    ds: rd.Dataset,
    threshold: float,
    id_col: str = "vec_id",
    matrix_handle=None,
) -> rd.Dataset:
    """Embedding-cosine near-duplicate pairs (exact): the full
    normalized matrix is broadcast once (ray.put) and each batch does
    one matmul against it — O(N*B) per batch, zero Python per row.

    Scale path beyond broadcast capacity: hyperplane-bucket both sides
    (LshIndexer) and run the same matmul within buckets — same shape as
    minhash_lsh_pairs. Pair (a, b) is emitted once (a < b), with the
    cosine rounded to 6 decimals.
    """
    import ray

    if matrix_handle is None:
        rows = []
        ids = []
        for b in ds.select_columns([id_col, "embedding"]).iter_batches(
            batch_format="pyarrow"
        ):
            rows.append(_matrix(b))
            ids.append(np.asarray(b.column(id_col), dtype=np.int64))
        m = np.vstack(rows)
        all_ids = np.concatenate(ids)
        m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)
        matrix_handle = ray.put((all_ids, m))

    def find_pairs(batch: pa.Table) -> pa.Table:
        all_ids, m = ray.get(matrix_handle)
        bm = _matrix(batch)
        bm = bm / np.maximum(np.linalg.norm(bm, axis=1, keepdims=True), 1e-30)
        bids = np.asarray(batch.column(id_col), dtype=np.int64)
        cos = bm @ m.T
        np.round(cos, 6, out=cos)
        hit = cos >= threshold
        # emit each unordered pair once: batch id strictly less
        hit &= bids[:, None] < all_ids[None, :]
        r, c = np.nonzero(hit)
        return pa.table(
            {
                "vec_id_a": pa.array(bids[r]),
                "vec_id_b": pa.array(all_ids[c]),
                "cos": pa.array(cos[r, c], pa.float64()),
            }
        )

    return ds.select_columns([id_col, "embedding"]).map_batches(
        find_pairs, batch_format="pyarrow"
    )


class LshIndexer:
    """Random-hyperplane bucketer (plane matrix drawn once per actor)."""

    def __init__(self, dim: int = 64, planes: int = 12, seed: int = 13):
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal((dim, planes))

    def bucket_of(self, vecs: np.ndarray) -> np.ndarray:
        signs = (vecs @ self.planes) > 0
        weights = (1 << np.arange(self.planes.shape[1], dtype=np.int64))[None, :]
        return (signs.astype(np.int64) * weights).sum(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        b = self.bucket_of(_matrix(batch))
        return batch.append_column("bucket", pa.array(b))


def ann_lsh(
    ds: rd.Dataset,
    query: np.ndarray,
    k: int = 10,
    *,
    dim: int = 64,
    planes: int = 12,
    probe_hamming: int = 2,
    seed: int = 13,
    id_col: str = "vec_id",
) -> rd.Dataset:
    """Approximate top-k: filter to buckets near the query's bucket
    (vectorized popcount filter inside map_batches — a row-group-sized
    superset of the candidates), then exact cosine on the survivors."""
    indexer = LshIndexer(dim, planes, seed)
    qb = int(indexer.bucket_of(query[None, :])[0])

    def probe(batch: pa.Table) -> pa.Table:
        b = indexer.bucket_of(_matrix(batch))
        x = np.bitwise_xor(b, qb).astype(np.uint64)
        # vectorized popcount
        pop = np.zeros_like(x, dtype=np.int64)
        while True:
            nz = x != 0
            if not nz.any():
                break
            pop[nz] += 1
            x = x & (x - np.uint64(1))
        return batch.filter(pa.array(pop <= probe_hamming))

    candidates = ds.select_columns([id_col, "embedding"]).map_batches(
        probe, batch_format="pyarrow"
    )
    return ann_bruteforce(candidates, query, k, id_col)
