"""Distributed k-means (Lloyd 1982) + IVF-style ANN (the inverted-file
indexing of Sivic & Zisserman 2003 / Jegou et al. 2011, sans product
quantization) over an embedding column.

k-means is the canonical iterative Ray Data algorithm shape: each round
is one streaming pass — map_batches computes per-centroid partial sums
(vectorized assignment), a tiny groupby merges partials, the driver
updates the k x d centroid matrix and re-broadcasts it. The dataset is
never materialized on the driver.

Determinism contract (the 100-TB reproducibility requirement): every
arithmetic step that crosses a merge boundary is EXACT-INTEGER on a
fixed-point grid (coordinates quantized to ``round_half_up(v * 2^20)``;
2^20 is a power of two, so the scaling multiply itself is exact in
float64), assignments are integer argmin of squared grid distances with
lowest-cid tie-break, partial sums are int64 merged as Python ints, and
the centroid update re-quantizes the exact rational mean with
``floor(s/n + 1/2) == (2s + n) fld (2n)``. Consequently the fit is
invariant to block layout, batch size and merge order — the same corpus
yields bit-identical centroids on 1 node or 256 — and the whole
iteration is replayable in SQL (see ``__ray_entry__._kmeans_cte``).
Float partial sums (the obvious implementation) make centroids
last-ulp-dependent on block boundaries, which at 10^12 rows means two
cluster sizes dedup *different* rows.

IVF search: assign every vector to its nearest centroid ("inverted
list"), probe only the ``nprobe`` closest lists for a query — the
scale path when the corpus no longer fits a brute-force scan.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from vietnamese_ocr_ray.functions.ann import _matrix, ann_bruteforce

_QBITS = 20
_QSCALE = float(1 << _QBITS)
_HASH_P = np.uint64(1099511628211)  # FNV prime, reused as poly base
_HASH_SALT = np.uint64(0x9E3779B9)


def _quantize(m: np.ndarray) -> np.ndarray:
    """Half-up fixed-point grid coords: floor(v * 2^20 + 0.5) as int64.
    The power-of-two scale makes the multiply exact, so this is the
    bit-identical counterpart of SQL ``floor(x * 1048576 + 0.5)``."""
    return np.floor(np.asarray(m, dtype=np.float64) * _QSCALE + 0.5).astype(
        np.int64
    )


def _vec_hash(q: np.ndarray, seed: int) -> np.ndarray:
    """Wrapping-polynomial hash of each row's QUANTIZED coords —
    data-determined (identical vectors hash identically regardless of
    block) and SQL-replayable (mod-2^64 fold over ``q[j]``; hashing the
    float64 bit pattern, the previous rule, has no DuckDB analog)."""
    u = np.ascontiguousarray(q, dtype=np.int64).view(np.uint64)
    with np.errstate(over="ignore"):
        h = np.full(
            u.shape[0], np.uint64(seed) * _HASH_P + _HASH_SALT, np.uint64
        )
        for j in range(u.shape[1]):
            h = h * _HASH_P + u[:, j]
    return h


def _assign_q(mq: np.ndarray, cq: np.ndarray) -> np.ndarray:
    """Integer argmin of squared grid distance, first (lowest-cid) win
    on exact ties. Per-centroid loop (k is small) instead of one BLAS
    matmul: dgemm's reduction order varies with matrix SHAPE, so a
    float-score assign could flip near-ties between a 500-row tail
    batch and a 4096-row one. Integers cannot."""
    best = np.full(mq.shape[0], np.iinfo(np.int64).max, dtype=np.int64)
    arg = np.zeros(mq.shape[0], dtype=np.int64)
    for j in range(cq.shape[0]):
        d = mq - cq[j]
        dist = np.einsum("ij,ij->i", d, d)
        better = dist < best
        arg[better] = j
        best[better] = dist[better]
    return arg


def _assign(m: np.ndarray, centroids: np.ndarray) -> np.ndarray:
    """Nearest-centroid ids for float input (quantized internally)."""
    return _assign_q(_quantize(m), _quantize(centroids))


def _probe_order(centroids: np.ndarray, query: np.ndarray) -> np.ndarray:
    """Centroid indices by ascending integer grid distance to the
    query, lowest cid first on ties — the deterministic probe rank."""
    d = _quantize(centroids) - _quantize(query)[None, :]
    dist = np.einsum("ij,ij->i", d, d)
    return np.lexsort((np.arange(centroids.shape[0]), dist))


def kmeans_fit(
    ds: rd.Dataset,
    k: int = 16,
    iters: int = 5,
    seed: int = 17,
    emb_col: str = "embedding",
) -> np.ndarray:
    """(k, d) float64 centroids, every coordinate on the 2^-20 grid.

    Init = the k rows with smallest salted polynomial hash of the
    quantized vector — deterministic AND partitioning-invariant (a
    seeded ``random_sample`` samples per block, so the init — and every
    downstream cluster id — would change with block boundaries). The
    candidate set is pruned to k per batch; only k x blocks rows reach
    the tiny global sort. Each iteration then streams the dataset once
    (exact int64 partial sums per batch, small aggregate); the driver
    holds only the k x d grid matrix. Early exit when the quantized
    centroids reach a fixed point (a further pass cannot change them,
    so a fixed-``iters`` replay yields the same result)."""
    import ray

    def init_part(batch: pa.Table) -> pa.Table:
        q = _quantize(_matrix(batch, emb_col))
        h = _vec_hash(q, seed)
        idx = np.argsort(h, kind="stable")[:k]
        return pa.table(
            {
                "h": pa.array(h[idx]),
                "vec": pa.array(list(q[idx]), pa.list_(pa.int64())),
            }
        )

    init_rows = (
        ds.select_columns([emb_col])
        .map_batches(init_part, batch_format="pyarrow")
        .sort("h")
        .limit(k)
        .take_all()
    )
    cq = np.array([r["vec"] for r in init_rows], dtype=np.int64)
    k = cq.shape[0]

    for _ in range(iters):
        handle = ray.put(cq)

        def partial(batch: pa.Table) -> pa.Table:
            c = ray.get(handle)
            q = _quantize(_matrix(batch, emb_col))
            a = _assign_q(q, c)
            sums = np.zeros((c.shape[0], q.shape[1]), dtype=np.int64)
            np.add.at(sums, a, q)
            counts = np.bincount(a, minlength=c.shape[0]).astype(np.int64)
            return pa.table(
                {
                    "cid": pa.array(np.arange(c.shape[0], dtype=np.int64)),
                    "vsum": pa.array(list(sums), pa.list_(pa.int64())),
                    "n": pa.array(counts),
                }
            )

        agg = (
            ds.select_columns([emb_col])
            .map_batches(partial, batch_format="pyarrow")
            .groupby("cid")
            .map_groups(_merge_finalize, batch_format="pyarrow")
            .take_all()
        )
        prev = cq.copy()
        for row in agg:
            if row["n"] > 0:
                cq[row["cid"]] = np.asarray(row["vec"], dtype=np.int64)
        if np.array_equal(cq, prev):
            break
    return cq.astype(np.float64) / _QSCALE


def _merge_finalize(g: pa.Table) -> pa.Table:
    """Merge one cid's partials with PYTHON-INT sums (exact at any
    scale; int64 partials are per-batch-bounded but their global sum
    need not be) and re-quantize the exact rational mean:
    round_half_up(s/n) == floor((2s + n) / (2n)) in floor division."""
    parts = [np.asarray(x, dtype=np.int64) for x in g.column("vsum").to_pylist()]
    s = [int(v) for v in parts[0]]
    for p in parts[1:]:
        for j, v in enumerate(p):
            s[j] += int(v)
    n = int(np.asarray(g.column("n")).sum())
    if n > 0:
        vec = [(2 * sj + n) // (2 * n) for sj in s]
    else:
        vec = [0] * len(s)
    return pa.table(
        {
            "cid": g.column("cid").slice(0, 1),
            "vec": pa.array([vec], pa.list_(pa.int64())),
            "n": pa.array([n], pa.int64()),
        }
    )


def assign_clusters(
    ds: rd.Dataset, centroids: np.ndarray, id_col: str = "vec_id"
) -> rd.Dataset:
    """(id, cluster) assignment — the IVF inverted-list build."""
    import ray

    handle = ray.put(np.asarray(centroids, dtype=np.float64))

    def assign(batch: pa.Table) -> pa.Table:
        c = ray.get(handle)
        a = _assign(_matrix(batch), c)
        return pa.table(
            {id_col: batch.column(id_col), "cluster": pa.array(a)}
        )

    return ds.select_columns([id_col, "embedding"]).map_batches(
        assign, batch_format="pyarrow"
    )


def build_ivf_index(
    ds: rd.Dataset,
    index_dir: str,
    *,
    n_clusters: int = 16,
    iters: int = 5,
    seed: int = 17,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> str:
    """Build-once persisted IVF index (mirrors ``write_media_bucketed``'s
    one-file-per-partition layout): fit k-means ONCE, write
    ``centroids.parquet``, and rewrite the vectors cluster-partitioned —
    ``cluster=<cid>.parquet``, one parquet file per inverted list,
    written by its own reduce task. :func:`ann_ivf_index` then reads
    ONLY the ``nprobe`` probed list files, pruning IO as well as
    compute (``ann_ivf`` without an index must still scan every block
    to evaluate the probe filter)."""
    import os

    import pyarrow.parquet as pq
    import ray

    centroids = kmeans_fit(ds, k=n_clusters, iters=iters, seed=seed, emb_col=emb_col)
    os.makedirs(index_dir, exist_ok=True)
    pq.write_table(
        pa.table(
            {
                "cid": pa.array(range(centroids.shape[0]), pa.int64()),
                "centroid": pa.array(list(centroids), pa.list_(pa.float64())),
            }
        ),
        os.path.join(index_dir, "centroids.parquet"),
    )
    handle = ray.put(centroids)

    def add_cluster(batch: pa.Table) -> pa.Table:
        c = ray.get(handle)
        a = _assign(_matrix(batch, emb_col), c)
        return batch.append_column("cluster", pa.array(a))

    def write_cluster(g: pa.Table) -> pa.Table:
        cid = g.column("cluster")[0].as_py()
        t = g.drop_columns(["cluster"])
        tmp = os.path.join(index_dir, f"_tmp-cluster={cid}.parquet")
        pq.write_table(t, tmp)
        os.replace(tmp, os.path.join(index_dir, f"cluster={cid}.parquet"))
        return pa.table({"cluster": pa.array([cid], pa.int64())})

    (
        ds.select_columns([id_col, emb_col])
        .map_batches(add_cluster, batch_format="pyarrow")
        .groupby("cluster")
        .map_groups(write_cluster, batch_format="pyarrow")
        .count()
    )
    return index_dir


def ivf_probe_files(index_dir: str, query: np.ndarray, nprobe: int) -> list[str]:
    """The <= nprobe inverted-list files nearest the query (a cluster
    can be empty and then has no file)."""
    import os

    import pyarrow.parquet as pq

    t = pq.read_table(os.path.join(index_dir, "centroids.parquet"))
    cids = np.asarray(t.column("cid"))
    centroids = np.asarray(
        [np.asarray(x) for x in t.column("centroid").to_pylist()], dtype=np.float64
    )
    order = _probe_order(centroids, np.asarray(query, dtype=np.float64))
    files = []
    for cid in cids[order[:nprobe]]:
        f = os.path.join(index_dir, f"cluster={int(cid)}.parquet")
        if os.path.exists(f):
            files.append(f)
    return files


def ann_ivf_index(
    index_dir: str,
    query: np.ndarray,
    k: int = 10,
    *,
    nprobe: int = 4,
    id_col: str = "vec_id",
) -> rd.Dataset:
    """IVF ANN over a persisted index: ONLY the probed inverted-list
    files are opened — at 10^12 vectors the scan touches nprobe/k of
    the corpus bytes instead of filtering a full pass."""
    files = ivf_probe_files(index_dir, query, nprobe)
    candidates = rd.read_parquet(files)
    return ann_bruteforce(candidates, query, k, id_col)


def ann_ivf(
    ds: rd.Dataset,
    query: np.ndarray,
    k: int = 10,
    *,
    centroids: np.ndarray | None = None,
    n_clusters: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
) -> rd.Dataset:
    """IVF ANN: filter to the ``nprobe`` inverted lists nearest the
    query, exact cosine within them (prunes ~(1 - nprobe/k) of the
    scan)."""
    import ray

    if centroids is None:
        centroids = kmeans_fit(ds, k=n_clusters)
    centroids = np.asarray(centroids, dtype=np.float64)
    qc = _probe_order(centroids, np.asarray(query, dtype=np.float64))[:nprobe]
    probe_set = set(int(x) for x in qc)
    handle = ray.put(centroids)

    def probe(batch: pa.Table) -> pa.Table:
        c = ray.get(handle)
        a = _assign(_matrix(batch), c)
        mask = np.isin(a, list(probe_set))
        return batch.filter(pa.array(mask))

    candidates = ds.select_columns([id_col, "embedding"]).map_batches(
        probe, batch_format="pyarrow"
    )
    return ann_bruteforce(candidates, query, k, id_col)


def knn_join_ivf(
    ds: rd.Dataset,
    k: int = 5,
    *,
    n_clusters: int = 8,
    nprobe: int = 2,
    iters: int = 5,
    seed: int = 17,
    id_col: str = "vec_id",
    num_buckets: int = 32,
) -> rd.Dataset:
    """Approximate k-NN SELF-join — the sub-quadratic scale path for
    :func:`~vietnamese_ocr_ray.functions.ann.knn_join_exact`: vectors
    are assigned to deterministic grid-k-means cells (inverted lists);
    each vector searches only its ``nprobe`` nearest cells, so compute
    drops from O(N^2) to ~O(N^2 * nprobe / n_clusters). Neighbors
    living outside a vector's probed cells are MISSED — recall rises
    with nprobe (nprobe == n_clusters is exact).

    Shuffle shape: ONE cluster cogroup in which each vector rides
    (nprobe + 1) times — once as a member of its own cell, nprobe
    times as a query probing nearby cells; a (query, member) candidate
    arises at most once because a member belongs to exactly one cell.
    In-cell scoring is one matmul + the packed-key partial top-k of
    knn_join_exact; the per-id merge rows are int-only.

    Determinism: the grid k-means fit, integer probe ranks (squared
    grid distance, lowest-cid tie) and packed-key selection make the
    result bit-stable under any block layout AND fully SQL-replayable
    via the _kmeans_cte oracle."""
    import pyarrow.compute as pc
    import ray

    from vietnamese_ocr_ray.functions.ann import (
        _KNN_SCHEMA,
        _knn_finish,
        _knn_partial_topk,
    )
    from vietnamese_ocr_ray.functions.joins import _ensure_schema, key_bucket

    centroids = kmeans_fit(ds, k=n_clusters, iters=iters, seed=seed)
    cq = _quantize(centroids)
    handle = ray.put(cq)

    def expand(batch: pa.Table) -> pa.Table:
        c = ray.get(handle)
        m = _matrix(batch)
        u = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)
        ids = np.asarray(
            pc.cast(
                batch.column(id_col).combine_chunks()
                if isinstance(batch.column(id_col), pa.ChunkedArray)
                else batch.column(id_col),
                pa.int64(),
            )
        )
        q = _quantize(m)
        kc = c.shape[0]
        dist = np.empty((q.shape[0], kc), dtype=np.int64)
        for j in range(kc):
            d = q - c[j]
            dist[:, j] = np.einsum("ij,ij->i", d, d)
        # (dist, cid) composite: coords < 2^21 -> dist < 2^48; exact
        comp = dist * np.int64(kc) + np.arange(kc, dtype=np.int64)[None, :]
        assigned = np.argmin(comp, axis=1)  # == _assign_q tie rule
        np_probe = min(nprobe, kc)
        if kc > np_probe:
            probes = np.argpartition(comp, np_probe - 1, axis=1)[:, :np_probe]
        else:
            probes = np.broadcast_to(
                np.arange(kc), (q.shape[0], kc)
            ).copy()
        n = q.shape[0]
        clusters = np.concatenate(
            [assigned] + [probes[:, p] for p in range(np_probe)]
        )
        roles = np.concatenate(
            [np.zeros(n, np.int8), np.ones(n * np_probe, np.int8)]
        )
        rep = np.tile(ids, np_probe + 1)
        uu = np.tile(u, (np_probe + 1, 1))
        return pa.table(
            {
                "cluster": pa.array(clusters),
                "role": pa.array(roles, pa.int8()),
                id_col: pa.array(rep),
                "uvec": pa.FixedSizeListArray.from_arrays(
                    pa.array(uu.reshape(-1), pa.float64()), u.shape[1]
                ),
            }
        )

    empty_partial = pa.table(
        {
            "vec_id": pa.array([], pa.int64()),
            "nbr": pa.array([], pa.int64()),
            "key": pa.array([], pa.int64()),
            "_bucket": pa.array([], pa.int32()),
        }
    )

    def cell_knn(g: pa.Table) -> pa.Table:
        role = np.asarray(g.column("role"))
        ids = np.asarray(g.column(id_col), dtype=np.int64)
        arr = g.column("uvec")
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        mat = np.asarray(arr.values, dtype=np.float64).reshape(len(arr), -1)
        qm = role == 1
        if not qm.any() or qm.all():
            return empty_partial
        qid, mid = ids[qm], ids[~qm]
        cos = mat[qm] @ mat[~qm].T
        np.round(cos, 6, out=cos)
        micro = np.rint(cos * 1e6).astype(np.int64)
        key = (micro << np.int64(33)) - mid[None, :]
        key[qid[:, None] == mid[None, :]] = np.int64(
            np.iinfo(np.int64).min
        )  # a query probing its own cell meets itself as a member
        a, b, kv = _knn_partial_topk(qid, key, mid, k)
        return pa.table(
            {
                "vec_id": pa.array(a),
                "nbr": pa.array(b),
                "key": pa.array(kv),
                "_bucket": pa.array(
                    key_bucket(pa.array(a), num_buckets).astype(np.int32)
                ),
            }
        )

    out = (
        ds.select_columns([id_col, "embedding"])
        .map_batches(expand, batch_format="pyarrow")
        .groupby("cluster")
        .map_groups(cell_knn, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(lambda g: _knn_finish(g, k), batch_format="pandas")
    )
    return _ensure_schema(out, _KNN_SCHEMA)


# ---------------------------------------------------------------------------
# Product quantization (Jegou, Douze & Schmid 2011) on the same
# grid-deterministic Lloyd machinery
# ---------------------------------------------------------------------------


def pq_fit(
    ds: rd.Dataset,
    n_sub: int = 4,
    ks: int = 16,
    iters: int = 3,
    seed: int = 17,
    emb_col: str = "embedding",
    dim: int = 64,
    *,
    sample_permille: int | None = None,
    sample_salt: str = "pqfit:",
    id_col: str = "vec_id",
) -> list[np.ndarray]:
    """Per-subspace codebooks: split the D dims into ``n_sub``
    contiguous subspaces and run the grid-deterministic
    :func:`kmeans_fit` independently on each slice. Codebooks are
    bit-identical under any block layout (the kmeans contract), so
    PQ codes — and therefore search results — are reproducible across
    cluster sizes.

    ``sample_permille`` trains the codebooks on a deterministic
    ``sampling.hash_sample`` subset of the rows (keyed on ``id_col``
    with ``sample_salt``) — the production PQ shape: only the ENCODE
    pass touches the full corpus, the fit streams n_sub * (1 + iters)
    passes over ~permille/1000 of it. The sample band is the same
    polynomial-hash predicate the hash_sample oracle replays, so the
    sampled fit stays SQL-verifiable end-to-end. ``None`` fits on the
    full corpus (the original oracle-replay mode, and the right call
    when the corpus is small enough that a sample would starve ks
    centroids)."""
    if sample_permille is not None:
        from vietnamese_ocr_ray.functions.sampling import hash_sample

        # materialize the sample ONCE: the fit runs n_sub * (1 + iters)
        # passes over it, and re-executing the corpus read + sample
        # filter per pass would cost more than the sampling saves. The
        # sample is permille-bounded by construction, so pinning it in
        # the object store is scale-safe (unlike materializing ds).
        fit_src = hash_sample(
            ds.select_columns([id_col, emb_col]),
            id_col,
            rate_permille=sample_permille,
            salt=sample_salt,
        ).materialize()
    else:
        fit_src = ds
    dsub = dim // n_sub
    codebooks = []
    for s in range(n_sub):
        lo = s * dsub

        def slice_sub(batch: pa.Table, lo=lo, hi=lo + dsub) -> pa.Table:
            m = _matrix(batch, emb_col)[:, lo:hi]
            return pa.table(
                {
                    "embedding": pa.FixedSizeListArray.from_arrays(
                        pa.array(m.reshape(-1), pa.float64()), hi - lo
                    )
                }
            )

        codebooks.append(
            kmeans_fit(
                fit_src.select_columns([emb_col]).map_batches(
                    slice_sub, batch_format="pyarrow"
                ),
                k=ks,
                iters=iters,
                seed=seed,
            )
        )
    return codebooks


def ann_pq(
    ds: rd.Dataset,
    query: np.ndarray,
    k: int = 10,
    n_sub: int = 4,
    ks: int = 16,
    iters: int = 3,
    seed: int = 17,
    id_col: str = "vec_id",
    *,
    sample_permille: int | None = 250,
    sample_salt: str = "pqfit:",
) -> rd.Dataset:
    """PQ approximate nearest neighbours by asymmetric distance
    (ADC): encode every vector as ``n_sub`` codebook ids, precompute
    the query's per-subspace distance table ONCE, then each vector's
    approximate distance is a sum of ``n_sub`` table lookups — the
    memory-bound scale path (a 64-dim float vector becomes n_sub
    bytes; the corpus scan streams codes, never raw vectors).

    The codebook fit DEFAULTS to a 250-permille hash_sample of the
    corpus (the production shape — at 100 TB a full-corpus fit would
    stream the corpus n_sub*(1+iters) extra times for no codebook
    quality gain); pass ``sample_permille=None`` for the full-corpus
    fit. Both modes replay in DuckDB (the sample band is the
    hash_sample polynomial predicate on ``id_col``).

    Everything is exact int64 grid arithmetic (squared 2^-20-grid
    distances), so results are bit-reproducible and the whole op —
    fit, encode, table, top-k — replays in DuckDB
    (``__ray_entry__._pq_kmeans_cte``). Output: (vec_id, adist),
    ascending (adist, vec_id), k rows."""
    import ray

    dim = int(np.asarray(query).shape[0])
    dsub = dim // n_sub
    codebooks = pq_fit(
        ds, n_sub=n_sub, ks=ks, iters=iters, seed=seed, dim=dim,
        sample_permille=sample_permille, sample_salt=sample_salt,
        id_col=id_col,
    )
    cqs = [_quantize(cb) for cb in codebooks]
    qg = _quantize(np.asarray(query, dtype=np.float64))
    tabs = []
    for s in range(n_sub):
        d = cqs[s] - qg[s * dsub : (s + 1) * dsub][None, :]
        tabs.append(np.einsum("ij,ij->i", d, d))
    handle = ray.put((cqs, tabs))

    def score(batch: pa.Table) -> pa.Table:
        cqs_b, tabs_b = ray.get(handle)
        q = _quantize(_matrix(batch))
        adist = np.zeros(q.shape[0], dtype=np.int64)
        for s, (cq, tab) in enumerate(zip(cqs_b, tabs_b)):
            a = _assign_q(q[:, s * dsub : (s + 1) * dsub], cq)
            adist += tab[a]
        t = pa.table(
            {
                id_col: pc.cast(
                    batch.column(id_col).combine_chunks()
                    if isinstance(batch.column(id_col), pa.ChunkedArray)
                    else batch.column(id_col),
                    pa.int64(),
                ),
                "adist": pa.array(adist),
            }
        )
        if t.num_rows > k:
            order = pc.sort_indices(
                t, sort_keys=[("adist", "ascending"), (id_col, "ascending")]
            )
            t = t.take(order[:k])
        return t

    return (
        ds.select_columns([id_col, "embedding"])
        .map_batches(score, batch_format="pyarrow")
        .sort(["adist", id_col])
        .limit(k)
    )


def centroid_classify(
    ds: rd.Dataset, label_col: str = "label", id_col: str = "vec_id"
) -> rd.Dataset:
    """Nearest-centroid (Rocchio) classification with confusion
    counts: fit one grid-quantized prototype per label (exact-integer
    per-label coordinate sums, the kmeans requantization
    floor(s/n + 1/2)), then assign every vector to its nearest
    prototype by integer grid argmin (lowest label on ties) and emit
    the (label, pred_label, n_vecs) confusion table — the
    pseudo-labeling / embedding-space sanity audit run after training
    an encoder.

    Scale shape: pass 1 streams per-batch (label, coordinate-sum,
    count) partials into a labels-sized groupby (labels are
    low-cardinality); prototypes broadcast once via ray.put; pass 2
    streams assignment + per-batch confusion partials into one tiny
    (label, pred) aggregate. Exact integer throughout — bit-identical
    under any layout and replayed verbatim in SQL."""
    import ray

    from vietnamese_ocr_ray.functions.agg import hash_aggregate

    def partial(batch: pa.Table) -> pa.Table:
        q = _quantize(_matrix(batch))
        lab = np.asarray(batch.column(label_col), dtype=np.int64)
        uniq, inv = np.unique(lab, return_inverse=True)
        sums = np.zeros((uniq.shape[0], q.shape[1]), dtype=np.int64)
        np.add.at(sums, inv, q)
        counts = np.bincount(inv, minlength=uniq.shape[0]).astype(np.int64)
        return pa.table(
            {
                "label": pa.array(uniq),
                "vsum": pa.array(list(sums), pa.list_(pa.int64())),
                "n": pa.array(counts),
            }
        )

    def merge(g: pa.Table) -> pa.Table:
        parts = [
            np.asarray(x, dtype=np.int64)
            for x in g.column("vsum").to_pylist()
        ]
        s = [int(v) for v in parts[0]]
        for p in parts[1:]:
            for j, v in enumerate(p):
                s[j] += int(v)
        n = int(np.asarray(g.column("n")).sum())
        vec = [(2 * sj + n) // (2 * n) for sj in s]
        return pa.table(
            {
                "label": g.column("label").slice(0, 1),
                "cq": pa.array([vec], pa.list_(pa.int64())),
            }
        )

    cent_rows = (
        ds.select_columns([label_col, "embedding"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("label")
        .map_groups(merge, batch_format="pyarrow")
        .take_all()
    )  # labels-sized
    labels = np.asarray([r["label"] for r in cent_rows], dtype=np.int64)
    order = np.argsort(labels)
    labels = labels[order]
    cq = np.asarray([cent_rows[i]["cq"] for i in order], dtype=np.int64)
    handle = ray.put((labels, cq))

    def confuse(batch: pa.Table) -> pa.Table:
        labs, c = ray.get(handle)
        q = _quantize(_matrix(batch))
        a = _assign_q(q, c)  # first-win argmin == lowest label (sorted)
        true = np.asarray(batch.column(label_col), dtype=np.int64)
        pred = labs[a]
        key = true * np.int64(1 << 32) + pred
        uniq, cnt = np.unique(key, return_counts=True)
        return pa.table(
            {
                "label": pa.array(uniq >> np.int64(32)),
                "pred_label": pa.array(uniq & np.int64(0xFFFFFFFF)),
                "n_vecs": pa.array(cnt.astype(np.int64)),
            }
        )

    return hash_aggregate(
        ds.select_columns([label_col, "embedding"]).map_batches(
            confuse, batch_format="pyarrow"
        ),
        ["label", "pred_label"],
        {"n_vecs": ("n_vecs", "sum")},
        num_buckets=8,
    )


def pq_recall_audit(
    ds: rd.Dataset,
    query: np.ndarray,
    k: int = 10,
    n_sub: int = 4,
    ks: int = 16,
    iters: int = 3,
    seed: int = 17,
) -> pa.Table:
    """PQ quality audit against exact ground truth (the lsh_recall
    pattern for the ADC path): recall@k of :func:`ann_pq` (sampled
    fit — the production default) vs the exact rounded-cosine top-k,
    plus the reciprocal rank of the exact top-1 inside the PQ list —
    the commit gate before trusting the compressed index at scale.

    Both sides are individually SQL-replayable (ann_topk's cosine
    ranking; the sampled-fit PQ chains), so the audit itself replays
    by nesting the two. Output one row: (n_hits, top1_rank, rr_ppm);
    integers only."""
    from vietnamese_ocr_ray.functions.ann import ann_bruteforce

    exact = ann_bruteforce(ds, query, k=k).to_pandas()
    pqr = ann_pq(
        ds, query, k=k, n_sub=n_sub, ks=ks, iters=iters, seed=seed
    ).to_pandas()
    ex_ids = exact["vec_id"].tolist()
    pq_ids = pqr["vec_id"].tolist()
    hits = len(set(ex_ids) & set(pq_ids))
    top1 = ex_ids[0]
    rank = pq_ids.index(top1) + 1 if top1 in pq_ids else 0
    return pa.table(
        {
            "n_hits": pa.array([hits], pa.int64()),
            "top1_rank": pa.array([rank], pa.int64()),
            "rr_ppm": pa.array(
                [1_000_000 // rank if rank else 0], pa.int64()
            ),
        }
    )
