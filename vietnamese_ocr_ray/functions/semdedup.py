"""SemDeDup — semantic deduplication (Abbas et al. 2023, "SemDeDup:
Data-efficient learning at web-scale through semantic deduplication"):
cluster embeddings with k-means, then search for near-duplicate pairs
ONLY within each cluster — turning the O(N^2) all-pairs cosine search
into k independent O((N/k)^2) problems that each fit one task.

Pipeline (all existing machinery, composed):

1. :func:`kmeans.kmeans_fit` — streaming distributed k-means
   (partial sums per batch + tiny aggregate per round).
2. One map assigns every row ``(vec_id, cluster, normalized vec)``.
3. One cluster-bucket shuffle; each reduce task runs the exact
   in-cluster cosine matmul and emits pairs ``cos >= threshold``.
4. :func:`dedup.neardup_survivors` — distributed connected components
   over the pair graph, keep min(vec_id) per component.

Partitioning assumption (documented, same as the paper's setting): a
CLUSTER fits a task heap — choose ``n_clusters`` so N/k is bounded;
skewed clusters would need a second-level split (re-cluster the big
ones), which is the documented 100 TB knob.

Recall caveat vs exact :func:`ann.cosine_pairs`: a near-dup pair
split across two clusters is missed — that is SemDeDup's accepted
trade (tests plant exact dups and verify they land together and get
removed)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from vietnamese_ocr_ray.functions.ann import _matrix
from vietnamese_ocr_ray.functions.dedup import neardup_survivors
from vietnamese_ocr_ray.functions.kmeans import _assign, kmeans_fit


def semdedup_pairs(
    ds: rd.Dataset,
    n_clusters: int = 16,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    kmeans_iters: int = 5,
) -> rd.Dataset:
    """(a, b, cos) near-dup pairs found within k-means clusters."""
    import ray

    centroids = kmeans_fit(ds, k=n_clusters, iters=kmeans_iters, emb_col=emb_col)
    handle = ray.put(centroids)

    def tag(batch: pa.Table) -> pa.Table:
        c = ray.get(handle)
        m = _matrix(batch, emb_col)  # zero-copy flatten, no row loop
        norm = np.linalg.norm(m, axis=1, keepdims=True)
        norm[norm == 0] = 1.0
        mn = m / norm
        return pa.table(
            {
                id_col: batch.column(id_col),
                "cluster": pa.array(_assign(m, c)),
                "vec": pa.FixedSizeListArray.from_arrays(
                    pa.array(mn.reshape(-1), pa.float64()), mn.shape[1]
                ),
            }
        )

    def pairs(g: pd.DataFrame) -> pa.Table:
        ids = g[id_col].to_numpy(np.int64)
        if not len(ids):
            return pa.table(
                {
                    "a": pa.array([], pa.int64()),
                    "b": pa.array([], pa.int64()),
                    "cos": pa.array([], pa.float64()),
                }
            )
        # pandas delivers the fixed-size-list column as an object array
        # of equal-length numpy views: one stack, no per-row conversion
        m = np.stack(g["vec"].to_numpy())
        sim = m @ m.T
        np.round(sim, 6, out=sim)  # round-6 BEFORE the threshold, the
        # same contract as ann.cosine_pairs — absorbs the last-ulp gap
        # between this normalized matmul and the oracle's
        # list_cosine_similarity, so the pair SET is SQL-replayable
        iu, ju = np.triu_indices(len(ids), k=1)
        hit = sim[iu, ju] >= threshold
        a, b = ids[iu[hit]], ids[ju[hit]]
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        return pa.table(
            {
                "a": pa.array(lo),
                "b": pa.array(hi),
                "cos": pa.array(sim[iu[hit], ju[hit]]),
            }
        )

    return (
        ds.select_columns([id_col, emb_col])
        .map_batches(tag, batch_format="pyarrow")
        .groupby("cluster")
        .map_groups(
            lambda g: pairs(g.drop(columns=["cluster"])),
            batch_format="pandas",
        )
    )


def semdedup(
    ds: rd.Dataset,
    n_clusters: int = 16,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> rd.Dataset:
    """Surviving rows of ``ds`` after semantic dedup (min-id survivor
    per connected near-dup component, components distributed)."""
    p = semdedup_pairs(ds, n_clusters, threshold, id_col, emb_col)
    return neardup_survivors(
        ds.select_columns([id_col]), p.select_columns(["a", "b"]), id_col=id_col
    )
