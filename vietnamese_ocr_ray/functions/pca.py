"""Distributed PCA over an embedding column.

The dimensionality-reduction step in front of clustering / SemDeDup /
ANN at corpus scale (reference has no analog; this is a
beyond-reference training-data op). Two streaming passes, no shuffle:

1. moment pass — every batch emits ONE packed int64 partial
   (n, sum_i, sum_{i<=j} x_i*x_j) over micro-unit-quantized values, so
   the reduce is exact integer addition and therefore
   ORDER-INDEPENDENT (the lm.py determinism contract: float reduces
   must not depend on block arrival order). Partials are
   O(dims^2 x blocks) ints; the driver merges them with Python-int
   arithmetic, so no N overflows the accumulator.
2. project pass — mean + eigenvector matrix (dims x n_components,
   KBs) broadcast once via ray.put; each batch computes
   (x - mean) @ W vectorized.

Eigenvectors come from np.linalg.eigh on the exact-integer covariance
(symmetric, so eigh not svd), ordered by eigenvalue DESC, each column
sign-fixed so its largest-|.| component is positive (lowest index on
ties) — the output is a pure function of the data, independent of
partitioning and block order.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

_QUANT = 1_000_000  # micro-units: exact int64 per-batch moments


def _batch_matrix(batch: pa.Table, vec_col: str) -> np.ndarray:
    emb = batch.column(vec_col)
    if isinstance(emb, pa.ChunkedArray):
        emb = emb.combine_chunks()
    flat = np.asarray(emb.flatten(), dtype=np.float64)
    return flat.reshape(batch.num_rows, -1)


def _moment_partial(batch: pa.Table, vec_col: str) -> pa.Table:
    x = _batch_matrix(batch, vec_col)
    q = np.round(x * _QUANT).astype(np.int64)
    iu = np.triu_indices(q.shape[1])
    # per-batch rows are bounded (<= ~1e5 x micro-unit^2), so int64
    # holds the batch-local products; cross-batch summing happens on
    # the driver in Python ints
    packed = np.concatenate(
        [
            np.array([q.shape[0]], np.int64),
            q.sum(axis=0, dtype=np.int64),
            (q.T @ q)[iu].astype(np.int64),
        ]
    )
    return pa.table(
        {
            "dims": pa.array([q.shape[1]], pa.int64()),
            "part": pa.array([packed.tobytes()], pa.binary()),
        }
    )


def pca_fit(
    ds: rd.Dataset, vec_col: str = "embedding"
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Fit pass: returns (mean, eigenvalues desc, eigenvectors as
    columns of a (dims, dims) matrix), deterministic per the module
    contract. Driver state is one (1 + dims + dims^2/2)-int vector —
    dims-bounded, never corpus-bounded."""
    parts = ds.map_batches(
        lambda b: _moment_partial(b, vec_col), batch_format="pyarrow"
    ).to_pandas()  # O(blocks) rows of dims^2 ints — bounded, deliberate

    if len(parts) == 0:  # fully-filtered input: no moments to fit
        raise ValueError("pca_fit: input dataset is empty")
    dims = int(parts["dims"].iloc[0])
    tri = dims * (dims + 1) // 2
    # Python-int accumulators: exact at any corpus size
    n = 0
    s = [0] * dims
    ss = [0] * tri
    for raw in parts["part"]:
        v = np.frombuffer(raw, np.int64)
        n += int(v[0])
        for i in range(dims):
            s[i] += int(v[1 + i])
        for t in range(tri):
            ss[t] += int(v[1 + dims + t])

    mean = np.array([si / n for si in s], np.float64) / _QUANT
    cov = np.zeros((dims, dims), np.float64)
    iu = np.triu_indices(dims)
    for t, (i, j) in enumerate(zip(iu[0], iu[1])):
        # closed form on exact integers: E[xy] - E[x]E[y] (population)
        cov[i, j] = cov[j, i] = (ss[t] / n - (s[i] / n) * (s[j] / n)) / (
            _QUANT * _QUANT
        )

    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(-evals, kind="stable")
    evals, evecs = evals[order], evecs[:, order]
    # sign convention: largest-|.| component positive (first on ties)
    for c in range(dims):
        col = evecs[:, c]
        piv = int(np.argmax(np.abs(col)))
        if col[piv] < 0:
            evecs[:, c] = -col
    return mean, evals, evecs


def pca_project(
    ds: rd.Dataset,
    n_components: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> rd.Dataset:
    """Project every vector onto the top ``n_components`` principal
    axes: one fit pass + one broadcast map pass. Output columns:
    ``id_col`` plus pc1..pcK float64 — flat columns, not a list, so
    downstream ops (quantile, histogram, join) stay columnar."""
    mean, _, evecs = pca_fit(ds, vec_col)
    handle = ray.put((mean, np.ascontiguousarray(evecs[:, :n_components])))

    def project(batch: pa.Table) -> pa.Table:
        m, w = ray.get(handle)
        x = _batch_matrix(batch, vec_col)
        xc = x - m
        # fixed-k-order accumulation instead of BLAS matmul: dgemm
        # picks its summation order from the batch SHAPE, so the same
        # row rounds differently in different block layouts (caught by
        # scripts/check_invariance.py). An explicit ascending-k loop of
        # vectorized FMAs is IEEE-deterministic per element no matter
        # how rows are batched — dims x (rows x components) work, same
        # asymptotics as the matmul for small component counts.
        proj = np.zeros((xc.shape[0], w.shape[1]), np.float64)
        for k in range(w.shape[0]):
            proj += xc[:, k : k + 1] * w[k]
        cols = {id_col: batch.column(id_col)}
        for c in range(proj.shape[1]):
            cols[f"pc{c + 1}"] = pa.array(proj[:, c], pa.float64())
        return pa.table(cols)

    return ds.map_batches(project, batch_format="pyarrow")
