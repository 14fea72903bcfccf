"""Scalar (int8) embedding quantization — the storage path for 10^12
vectors: 4x smaller than float32 at ~0.4% max reconstruction error per
dimension (255 levels over the per-dimension range), the precursor to
product quantization (Jegou et al. 2011, sans codebooks).

Two streaming passes, Ray-Data-first:
1. fit: per-batch per-dimension min/max partials (one tiny row per
   batch), merged driver-side into a (2, D) range matrix (dimension
   count is model-bounded, never corpus-bounded);
2. encode: one vectorized map to int8 codes stored as a
   fixed-size-list column; decode is the inverse map.

``ann_bruteforce_quantized`` scans the CODES (4x less IO), decodes
per batch, and ranks by cosine — tests measure recall@k against the
exact float scan.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from ray.data.aggregate import Max, Min

from vietnamese_ocr_ray.functions.ann import _matrix


def fit_quantizer(ds: rd.Dataset, emb_col: str = "embedding") -> np.ndarray:
    """(2, D) [min; max] per dimension via per-batch partials."""

    def partial(batch: pa.Table) -> pa.Table:
        m = _matrix(batch, emb_col)
        lo = m.min(axis=0)
        hi = m.max(axis=0)
        d = m.shape[1]
        return pa.table(
            {
                "dim": pa.array(np.arange(d, dtype=np.int64)),
                "lo": pa.array(lo),
                "hi": pa.array(hi),
            }
        )

    agg = (
        ds.select_columns([emb_col])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("dim")
        .aggregate(Min("lo", alias_name="lo"), Max("hi", alias_name="hi"))
        .to_pandas()
        .sort_values("dim")
    )
    return np.vstack([agg["lo"].to_numpy(), agg["hi"].to_numpy()])


def quantize_embeddings(
    ds: rd.Dataset,
    ranges: np.ndarray,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> rd.Dataset:
    """(id, code: fixed_size_list<int8>) — one vectorized encode map."""
    import ray

    handle = ray.put(ranges)

    def encode(batch: pa.Table) -> pa.Table:
        lo, hi = ray.get(handle)
        m = _matrix(batch, emb_col)
        scale = np.maximum(hi - lo, 1e-30)
        # round-half-UP (floor(v + 0.5)), not np.rint's half-even: the
        # two differ only on exact .5 levels, and half-up is restatable
        # verbatim by the SQL oracle (DuckDB floor(v + 0.5))
        q = np.clip(
            np.floor((m - lo) / scale * 255.0 + 0.5) - 128, -128, 127
        ).astype(np.int8)
        return pa.table(
            {
                id_col: batch.column(id_col),
                "code": pa.FixedSizeListArray.from_arrays(
                    pa.array(q.reshape(-1), pa.int8()), m.shape[1]
                ),
            }
        )

    return ds.select_columns([id_col, emb_col]).map_batches(
        encode, batch_format="pyarrow"
    )


def decode_codes(batch: pa.Table, ranges: np.ndarray) -> np.ndarray:
    """int8 codes -> float64 matrix (inverse of the encode map)."""
    arr = batch.column("code")
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    q = np.asarray(arr.values, dtype=np.float64).reshape(len(arr), -1)
    lo, hi = ranges
    scale = np.maximum(hi - lo, 1e-30)
    return (q + 128.0) / 255.0 * scale + lo


def ann_bruteforce_quantized(
    codes: rd.Dataset,
    ranges: np.ndarray,
    query: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
) -> rd.Dataset:
    """Exact-scan ANN over the quantized store: decode per batch (4x
    less IO than float32), rank by cosine — approximate only through
    the quantization error (recall measured in tests)."""
    import ray

    handle = ray.put(ranges)
    qn = query / max(float(np.linalg.norm(query)), 1e-30)

    def score_topk(batch: pa.Table) -> pa.Table:
        m = decode_codes(batch, ray.get(handle))
        norms = np.maximum(np.linalg.norm(m, axis=1), 1e-30)
        cos = np.round((m @ qn) / norms, 6)
        t = pa.table(
            {
                id_col: batch.column(id_col),
                "cos": pa.array(cos, pa.float64()),
            }
        )
        if t.num_rows > k:
            order = pc.sort_indices(
                t, sort_keys=[("cos", "descending"), (id_col, "ascending")]
            )
            t = t.take(order[:k])
        return t

    return (
        codes.map_batches(score_topk, batch_format="pyarrow")
        .sort(["cos", id_col], descending=[True, False])
        .limit(k)
    )
