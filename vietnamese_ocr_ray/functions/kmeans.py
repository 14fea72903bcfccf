"""Distributed k-means (Lloyd 1982) + IVF-style ANN (the inverted-file
indexing of Sivic & Zisserman 2003 / Jegou et al. 2011, sans product
quantization) over an embedding column.

k-means is the canonical iterative Ray Data algorithm shape: each round
is one streaming pass — map_batches computes per-centroid partial sums
(vectorized matmul assignment), a tiny groupby merges partials, the
driver updates the k x d centroid matrix and re-broadcasts it. The
dataset is never materialized on the driver.

IVF search: assign every vector to its nearest centroid ("inverted
list"), probe only the ``nprobe`` closest lists for a query — the
scale path when the corpus no longer fits a brute-force scan.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd


from vietnamese_ocr_ray.functions.ann import _matrix, ann_bruteforce


def _assign(m: np.ndarray, centroids: np.ndarray) -> np.ndarray:
    """Nearest-centroid ids, vectorized: argmin ||x-c||^2 =
    argmax (x.c - |c|^2/2)."""
    scores = m @ centroids.T - 0.5 * (centroids**2).sum(axis=1)[None, :]
    return np.argmax(scores, axis=1).astype(np.int64)


def _vec_hash(m: np.ndarray, seed: int) -> np.ndarray:
    """Wrapping-polynomial hash of each row's float64 BIT PATTERN —
    data-determined, so identical vectors hash identically regardless
    of which block they sit in."""
    u = np.ascontiguousarray(m, dtype=np.float64).view(np.uint64)
    p = np.uint64(1099511628211)
    h = np.full(u.shape[0], np.uint64(seed) * p + np.uint64(0x9E3779B9))
    with np.errstate(over="ignore"):
        for j in range(u.shape[1]):
            h = h * p + u[:, j]
    return h


def kmeans_fit(
    ds: rd.Dataset,
    k: int = 16,
    iters: int = 5,
    seed: int = 17,
    emb_col: str = "embedding",
) -> np.ndarray:
    """(k, d) centroids. Init = the k rows with smallest salted hash of
    the vector bytes — deterministic AND partitioning-invariant (a
    seeded ``random_sample`` samples per block, so the init — and every
    downstream cluster id — would change with block boundaries). The
    candidate set is pruned to k per batch; only k x blocks rows reach
    the tiny global sort. Each iteration then streams the dataset once
    (partial sums per batch, small aggregate)."""
    import ray

    def init_part(batch: pa.Table) -> pa.Table:
        m = _matrix(batch, emb_col)
        h = _vec_hash(m, seed)
        idx = np.argsort(h, kind="stable")[:k]
        return pa.table(
            {
                "h": pa.array(h[idx]),
                "vec": pa.array(list(m[idx]), pa.list_(pa.float64())),
            }
        )

    init_rows = (
        ds.select_columns([emb_col])
        .map_batches(init_part, batch_format="pyarrow")
        .sort("h")
        .limit(k)
        .take_all()
    )
    centroids = np.array([r["vec"] for r in init_rows], dtype=np.float64)
    k = centroids.shape[0]

    for _ in range(iters):
        handle = ray.put(centroids)

        def partial(batch: pa.Table) -> pa.Table:
            c = ray.get(handle)
            m = _matrix(batch, emb_col)
            a = _assign(m, c)
            sums = np.zeros((c.shape[0], m.shape[1]), dtype=np.float64)
            np.add.at(sums, a, m)
            counts = np.bincount(a, minlength=c.shape[0]).astype(np.int64)
            return pa.table(
                {
                    "cid": pa.array(np.arange(c.shape[0], dtype=np.int64)),
                    "vsum": pa.array(list(sums), pa.list_(pa.float64())),
                    "n": pa.array(counts),
                }
            )

        agg = (
            ds.select_columns([emb_col])
            .map_batches(partial, batch_format="pyarrow")
            .groupby("cid")
            .map_groups(_merge_partials, batch_format="pyarrow")
            .take_all()
        )
        prev = centroids.copy()
        for row in agg:
            if row["n"] > 0:
                centroids[row["cid"]] = np.asarray(row["vsum"]) / row["n"]
        # converged: a further pass cannot change assignments, so skip
        # the remaining streaming iterations (each is a full corpus scan)
        if float(np.abs(centroids - prev).max()) < 1e-9:
            break
    return centroids


def _merge_partials(g: pa.Table) -> pa.Table:
    vs = np.asarray(
        [np.asarray(x) for x in g.column("vsum").to_pylist()], dtype=np.float64
    ).sum(axis=0)
    return pa.table(
        {
            "cid": g.column("cid").slice(0, 1),
            "vsum": pa.array([vs], pa.list_(pa.float64())),
            "n": pa.array([int(np.asarray(g.column("n")).sum())], pa.int64()),
        }
    )


def assign_clusters(
    ds: rd.Dataset, centroids: np.ndarray, id_col: str = "vec_id"
) -> rd.Dataset:
    """(id, cluster) assignment — the IVF inverted-list build."""
    import ray

    handle = ray.put(centroids)

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
    order = np.argsort(-(centroids @ query - 0.5 * (centroids**2).sum(axis=1)))
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
    qc = np.argsort(-(centroids @ query - 0.5 * (centroids**2).sum(axis=1)))[:nprobe]
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
