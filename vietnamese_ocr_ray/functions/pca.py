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


def _fit2_closed(
    n: int, s0: int, s1: int, ss00: int, ss01: int, ss11: int
) -> tuple[float, float, float, float, float, float]:
    """Closed-form 2x2 PCA fit from exact integer moments — the
    SQL-verifiable twin of :func:`pca_fit` (the ``simhash_tokens``
    pattern): a 2x2 symmetric eigenproblem has an analytic solution
    (trace / discriminant quadratic), so every float op below is
    written in the exact order the DuckDB oracle replays it and the
    results are bit-identical doubles. Returns
    (m0, m1, w00, w10, w01, w11): mean and the two principal axes as
    columns, eigenvalue-descending, each sign-fixed so its
    largest-|.| component is positive (lowest index on ties)."""
    import math

    # float(s)/n first (one correctly-rounded div, matching SQL's
    # CAST(s AS DOUBLE)/n) — s can exceed 2^53 at corpus scale, so
    # the rounding point must be identical on both sides
    a = (float(ss00) / n - (float(s0) / n) * (float(s0) / n)) / 1e12
    b = (float(ss01) / n - (float(s0) / n) * (float(s1) / n)) / 1e12
    c = (float(ss11) / n - (float(s1) / n) * (float(s1) / n)) / 1e12
    m0 = float(s0) / n / 1e6
    m1 = float(s1) / n / 1e6
    tr = a + c
    disc = math.sqrt((a - c) * (a - c) + 4.0 * b * b)
    l1 = (tr + disc) / 2.0
    if b == 0.0:
        # already diagonal: axes are the basis vectors
        r0, r1 = (1.0, 0.0) if a >= c else (0.0, 1.0)
    else:
        nrm = math.sqrt(b * b + (l1 - a) * (l1 - a))
        r0 = b / nrm
        r1 = (l1 - a) / nrm
    flip = (abs(r0) >= abs(r1) and r0 < 0) or (abs(r1) > abs(r0) and r1 < 0)
    w00, w10 = (-r0, -r1) if flip else (r0, r1)
    # second axis: the 90-degree rotation of the first, then the same
    # sign convention (orthogonality is exact by construction)
    u0, u1 = -w10, w00
    flip = (abs(u0) >= abs(u1) and u0 < 0) or (abs(u1) > abs(u0) and u1 < 0)
    w01, w11 = (-u0, -u1) if flip else (u0, u1)
    return m0, m1, w00, w10, w01, w11


def pca_project_2d(
    ds: rd.Dataset,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dims: tuple[int, int] = (0, 1),
) -> rd.Dataset:
    """Full PCA pipeline restricted to two coordinates of the
    embedding, with a CLOSED-FORM eigensolver so the whole op —
    integer moment pass, analytic fit, broadcast projection — is
    SQL-replayable bit-for-bit (eigh is not; this query exists so the
    PCA machinery has a driver-verifiable value check alongside the
    rows-only full-dims ``embedding_pca``).

    Same scale shape as :func:`pca_project`: one streaming moment pass
    emitting a 6-int partial per batch (exact Python-int reduce on the
    driver, order-independent), one broadcast map pass; zero shuffles.
    """
    d0, d1 = dims

    def moment2(batch: pa.Table) -> pa.Table:
        x = _batch_matrix(batch, vec_col)
        # floor(x*Q + 0.5): round-half-up, replayed verbatim by the
        # SQL oracle (np.round is half-to-even, which SQL cannot state)
        q0 = np.floor(x[:, d0] * _QUANT + 0.5).astype(np.int64)
        q1 = np.floor(x[:, d1] * _QUANT + 0.5).astype(np.int64)
        return pa.table(
            {
                "n": pa.array([x.shape[0]], pa.int64()),
                "s0": pa.array([int(q0.sum())], pa.int64()),
                "s1": pa.array([int(q1.sum())], pa.int64()),
                "ss00": pa.array([int((q0 * q0).sum())], pa.int64()),
                "ss01": pa.array([int((q0 * q1).sum())], pa.int64()),
                "ss11": pa.array([int((q1 * q1).sum())], pa.int64()),
            }
        )

    parts = ds.map_batches(moment2, batch_format="pyarrow").to_pandas()
    if len(parts) == 0 or int(parts["n"].sum()) == 0:
        raise ValueError("pca_project_2d: input dataset is empty")
    # Python-int accumulators: exact at any corpus size
    n = sum(int(v) for v in parts["n"])
    s0 = sum(int(v) for v in parts["s0"])
    s1 = sum(int(v) for v in parts["s1"])
    ss00 = sum(int(v) for v in parts["ss00"])
    ss01 = sum(int(v) for v in parts["ss01"])
    ss11 = sum(int(v) for v in parts["ss11"])
    m0, m1, w00, w10, w01, w11 = _fit2_closed(n, s0, s1, ss00, ss01, ss11)

    def project(batch: pa.Table) -> pa.Table:
        x = _batch_matrix(batch, vec_col)
        x0, x1 = x[:, d0], x[:, d1]
        # expression order mirrors the SQL oracle verbatim
        pc1 = (x0 - m0) * w00 + (x1 - m1) * w10
        pc2 = (x0 - m0) * w01 + (x1 - m1) * w11
        return pa.table(
            {
                id_col: batch.column(id_col),
                "pc1": pa.array(pc1, pa.float64()),
                "pc2": pa.array(pc2, pa.float64()),
            }
        )

    return ds.map_batches(project, batch_format="pyarrow")


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


def random_projection(
    ds: rd.Dataset,
    d_out: int = 16,
    seed: int = 29,
    dim: int = 64,
    id_col: str = "vec_id",
) -> rd.Dataset:
    """Johnson-Lindenstrauss random projection (Achlioptas 2003
    Rademacher variant): y = x @ S / sqrt(d_out) with S a seeded
    +-1 sign matrix — the one-pass, zero-shuffle dimensionality
    reducer in front of ANN / clustering when even PCA's moment pass
    is too expensive. Pairwise distances are preserved within
    (1 +- eps) w.h.p. for d_out = O(ln N / eps^2).

    Determinism contract: inputs quantize to the 2^-20 grid (the
    kmeans trick), the projection is an exact INT64 matmul against
    the +-1 matrix, and sqrt(16) = 4 makes the final scale a single
    exact power-of-two division (/ 2^22) — outputs are bit-identical
    under any block layout and replay exactly in SQL with the sign
    matrix inlined as literals (the ann_lsh oracle pattern). Output
    is LONG format (vec_id, dim, y), one row per projected
    coordinate.

    Scale shape: one streaming map_batches; S is d x d_out literals
    (KBs) captured by value; no shuffle, no driver traffic."""
    assert d_out & (d_out - 1) == 0 and (d_out.bit_length() - 1) % 2 == 0, (
        "d_out must be a power of FOUR so sqrt(d_out) is a power of two"
        " and the scale stays one exact division"
    )
    from vietnamese_ocr_ray.functions.kmeans import _quantize

    signs = (
        np.random.default_rng(seed).integers(0, 2, (dim, d_out)) * 2 - 1
    ).astype(np.int64)
    shift = 20 + (d_out.bit_length() - 1) // 2  # /2^20 grid * /sqrt(d_out)
    scale = float(1 << shift)

    def project(batch: pa.Table) -> pa.Table:
        q = _quantize(_batch_matrix(batch, "embedding"))
        y = q @ signs  # exact int64 (|y| <= dim * 2^22-ish)
        n = q.shape[0]
        ids = np.repeat(
            np.asarray(batch.column(id_col), dtype=np.int64), d_out
        )
        dims = np.tile(np.arange(d_out, dtype=np.int64), n)
        return pa.table(
            {
                id_col: pa.array(ids),
                "dim": pa.array(dims),
                "y": pa.array(
                    y.reshape(-1).astype(np.float64) / scale, pa.float64()
                ),
            }
        )

    return ds.select_columns([id_col, "embedding"]).map_batches(
        project, batch_format="pyarrow"
    )
