"""Graph algorithms over edge lists beyond connected components —
PageRank (Page et al. 1999) as the canonical iterative Ray Data shape
(same structure as functions/dedup._cc_rounds_broadcast): per round,
ONE map over the distributed adjacency computes per-block PARTIAL
contribution sums per destination (vectorized sorted-run reduce), the
tiny partials merge on the driver where the rank vector lives, and the
updated vector re-broadcasts. The adjacency never moves after the
initial materialize; only node-table-scale partials flow per round.

Scale note: right while the NODE set fits a worker heap (the dup-graph
regime — nodes ~ duplicates, not corpus rows). The 10^12-node variant
would shuffle contributions with the bucketed hash aggregate instead,
exactly as connected_components(broadcast=False) does for min-labels.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd


def pagerank(
    pairs: rd.Dataset,
    damping: float = 0.85,
    iters: int = 20,
    tol: float = 1e-9,
) -> rd.Dataset:
    """(node, rank) over the UNDIRECTED graph of an (a, b) edge list —
    power iteration with uniform teleport over the graph's node set;
    ranks sum to 1. Isolated nodes don't exist by construction (every
    node appears in an edge)."""
    import ray

    edges = pairs.select_columns(["a", "b"])

    def undirected(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "src": pa.concat_arrays(
                    [
                        b.column("a").combine_chunks().cast(pa.int64()),
                        b.column("b").combine_chunks().cast(pa.int64()),
                    ]
                ),
                "dst": pa.concat_arrays(
                    [
                        b.column("b").combine_chunks().cast(pa.int64()),
                        b.column("a").combine_chunks().cast(pa.int64()),
                    ]
                ),
            }
        )

    adj = edges.map_batches(undirected, batch_format="pyarrow").materialize()
    if adj.count() == 0:
        return rd.from_arrow(
            pa.table(
                {"node": pa.array([], pa.int64()), "rank": pa.array([], pa.float64())}
            )
        )

    # node set + out-degree: per-block partial counts, driver merge
    def degree_partial(b: pa.Table) -> pa.Table:
        src = np.asarray(b.column("src"))
        uniq, counts = np.unique(src, return_counts=True)
        return pa.table({"node": pa.array(uniq), "deg": pa.array(counts)})

    deg_pd = (
        adj.map_batches(degree_partial, batch_format="pyarrow")
        .to_pandas()
        .groupby("node", sort=True)["deg"]
        .sum()
    )
    keys = deg_pd.index.to_numpy(np.int64)
    deg = deg_pd.to_numpy(np.int64).astype(np.float64)
    n = keys.shape[0]
    ranks = np.full(n, 1.0 / n)

    for _ in range(iters):
        handle = ray.put((keys, ranks / deg))

        def contribute(b: pa.Table) -> pa.Table:
            k, share = ray.get(handle)
            src = np.asarray(b.column("src"))
            dst = np.asarray(b.column("dst"))
            contrib = share[np.searchsorted(k, src)]
            order = np.argsort(dst, kind="stable")
            dst_s, c_s = dst[order], contrib[order]
            change = np.ones(dst_s.shape[0], dtype=bool)
            change[1:] = dst_s[1:] != dst_s[:-1]
            starts = np.nonzero(change)[0]
            sums = np.add.reduceat(c_s, starts)
            return pa.table(
                {"node": pa.array(dst_s[starts]), "c": pa.array(sums)}
            )

        parts = adj.map_batches(contribute, batch_format="pyarrow").to_pandas()
        incoming = np.zeros(n)
        pos = np.searchsorted(keys, parts["node"].to_numpy(np.int64))
        np.add.at(incoming, pos, parts["c"].to_numpy())
        new_ranks = (1.0 - damping) / n + damping * incoming
        if float(np.abs(new_ranks - ranks).max()) < tol:
            ranks = new_ranks
            break
        ranks = new_ranks

    return rd.from_arrow(
        pa.table(
            {
                "node": pa.array(keys),
                "rank": pa.array(np.round(ranks, 9), pa.float64()),
            }
        )
    )
