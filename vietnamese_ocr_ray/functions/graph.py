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


def chain_edges(ds: rd.Dataset, id_col: str = "doc_id") -> rd.Dataset:
    """Deterministic multi-scale chain graph over the doc-id domain:
    u -- u+1 always, u -- u+10 when u % 2 = 0, u -- u+100 when
    u % 4 = 0 (targets that don't exist in the corpus drop). The
    shortcut structure gives BFS real work (shortest paths mix hop
    sizes) while keeping eccentricity small. Candidate generation is
    vectorized per batch; existence filtering is one np.isin against
    the broadcast sorted id array (ids are the small side here; at
    10^12 nodes the same filter is a bucketed semi-join on target id
    — functions/membership.py)."""
    import ray

    ids_all = np.sort(
        np.asarray(
            ds.select_columns([id_col]).to_pandas()[id_col], dtype=np.int64
        )
    )
    handle = ray.put(ids_all)

    def edges(batch: pa.Table) -> pa.Table:
        known = ray.get(handle)
        u = np.asarray(pc.cast(batch.column(id_col), pa.int64()))
        us, vs = [u], [u + 1]
        m10 = u % 2 == 0
        us.append(u[m10]); vs.append(u[m10] + 10)
        m100 = u % 4 == 0
        us.append(u[m100]); vs.append(u[m100] + 100)
        uu, vv = np.concatenate(us), np.concatenate(vs)
        keep = np.isin(vv, known)
        return pa.table({"u": pa.array(uu[keep]), "v": pa.array(vv[keep])})

    return ds.map_batches(edges, batch_format="pyarrow")


def khop_distances(
    ds: rd.Dataset, id_col: str = "doc_id", k: int = 8
) -> pa.Table:
    """BFS shortest-hop distances from the minimum node id, capped at
    ``k`` hops (the k-hop neighborhood feature of graph ML pipelines),
    over :func:`chain_edges`. Frontier BFS: each round broadcasts the
    CURRENT FRONTIER (small), streams one distributed scan over the
    edge dataset to collect its unvisited neighbors, and advances.
    Driver state is the visited set — bounded by the reached
    neighborhood, not the graph; at 10^12 edges the per-round scan
    becomes a bucketed semi-join on the frontier and the visited set
    a bucketed anti-join (the CC machinery in functions/dedup.py).

    The SQL oracle recomputes the same distances INDEPENDENTLY with a
    WITH RECURSIVE expansion over the same edge rule."""
    import ray
    from ray.data.aggregate import Min

    edges = chain_edges(ds, id_col).materialize()
    src = int(
        ds.select_columns([id_col]).to_pandas()[id_col].min()
    )
    dist: dict[int, int] = {src: 0}
    frontier = np.array([src], dtype=np.int64)
    for d in range(1, k + 1):
        fh = ray.put(np.sort(frontier))

        def neigh(batch: pa.Table) -> pa.Table:
            f = ray.get(fh)
            u = np.asarray(batch.column("u"))
            v = np.asarray(batch.column("v"))
            out = np.concatenate([v[np.isin(u, f)], u[np.isin(v, f)]])
            return pa.table({"n": pa.array(np.unique(out))})

        ndf = edges.map_batches(neigh, batch_format="pyarrow").to_pandas()
        if "n" not in ndf.columns or not len(ndf):
            break
        cand = np.unique(ndf["n"].to_numpy(np.int64))
        new = cand[~np.isin(cand, np.fromiter(dist.keys(), np.int64))]
        if not len(new):
            break
        for n in new:
            dist[int(n)] = d
        frontier = new
    nodes = np.fromiter(dist.keys(), np.int64)
    order = np.argsort(nodes)
    return pa.table(
        {
            "node": pa.array(nodes[order]),
            "d": pa.array(
                np.fromiter(dist.values(), np.int64)[order]
            ),
        }
    )


def assortativity(
    pairs: rd.Dataset, a_col: str = "vec_id_a", b_col: str = "vec_id_b"
) -> rd.Dataset:
    """Degree assortativity (Newman 2002) of an undirected edge list:
    the Pearson correlation of endpoint degrees over the DOUBLED edge
    list (each edge contributes (d_u, d_v) and (d_v, d_u)). Positive =
    hubs attach to hubs (one giant dup cluster), negative = hub-and-
    spoke duplication (one template with many one-off copies) — shapes
    that want different dedup survivor policies.

    The doubled list makes the x and y marginals identical, so
    r = (n*Sxy - Sx^2) / (n*Sxx - Sx^2) — integer moment sums (degrees
    are exact ints), ONE float division, no sqrt. Regular graphs
    (den = 0) return r = 0.0 by convention.

    Scale shape: degrees via one bucketed count aggregate; the degree
    table broadcasts (node set ~ duplicates, heap-bounded — the
    pagerank contract above; the 10^12-node variant joins degrees back
    with two bucketed cogroups instead); per-batch integer partial
    moments, ONE global Sum."""
    import ray

    from ray.data.aggregate import Sum

    from vietnamese_ocr_ray.functions.agg import hash_aggregate

    def endpoints(b: pa.Table) -> pa.Table:
        cols = [b.column(a_col), b.column(b_col)]
        cols = [
            c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
            for c in cols
        ]
        return pa.table({"vec": pa.concat_arrays(cols)})

    deg = hash_aggregate(
        pairs.map_batches(endpoints, batch_format="pyarrow"),
        ["vec"],
        {"d": ("vec", "count")},
    ).to_pandas()  # node set ~ duplicates: heap-bounded
    handle = ray.put(
        (
            pa.array(deg["vec"].to_numpy(np.int64)),
            deg["d"].to_numpy(np.int64),
        )
    )

    def moments(b: pa.Table) -> pa.Table:
        keys, dvals = ray.get(handle)
        va, vb = b.column(a_col), b.column(b_col)
        if isinstance(va, pa.ChunkedArray):
            va, vb = va.combine_chunks(), vb.combine_chunks()
        x = dvals[pc.index_in(va, value_set=keys).to_numpy()]
        y = dvals[pc.index_in(vb, value_set=keys).to_numpy()]
        # doubled edge list: (x,y) and (y,x)
        return pa.table(
            {
                "n": pa.array([2 * len(x)], pa.int64()),
                "sx": pa.array([int(x.sum() + y.sum())], pa.int64()),
                "sxy": pa.array([int(2 * (x * y).sum())], pa.int64()),
                "sxx": pa.array(
                    [int((x * x).sum() + (y * y).sum())], pa.int64()
                ),
            }
        )

    agg = pairs.map_batches(moments, batch_format="pyarrow").aggregate(
        Sum("n", alias_name="n"),
        Sum("sx", alias_name="sx"),
        Sum("sxy", alias_name="sxy"),
        Sum("sxx", alias_name="sxx"),
    )
    n, sx = int(agg["n"]), int(agg["sx"])
    sxy, sxx = int(agg["sxy"]), int(agg["sxx"])
    num = n * sxy - sx * sx
    den = n * sxx - sx * sx
    r = round(float(num) / float(den), 6) if den else 0.0
    return rd.from_arrow(
        pa.table(
            {
                "n_edges": pa.array([n // 2], pa.int64()),
                "assortativity": pa.array([r], pa.float64()),
            }
        )
    )


def transitivity(
    pairs: rd.Dataset, a_col: str = "vec_id_a", b_col: str = "vec_id_b"
) -> rd.Dataset:
    """Global clustering coefficient C = 3*triangles / wedges of an
    undirected edge list (edges canonical a < b). C near 1 = cliquey
    duplication (dedup keeps one per cluster), C near 0 = chainy
    near-dup drift (transitive-closure dedup over-merges) — the
    companion shape audit to :func:`assortativity`.

    Triangles by node-iterator wedge closure (the dup_triangles
    pattern, functions/dedup.py:1836): broadcast the sorted packed
    (u<<32)|v edge keys, and for each edge (a, b) count neighbors c of
    a with c > b whose (b, c) is also an edge — each triangle counted
    once at its minimum vertex. Wedges = sum C(d, 2) from the degree
    table. Both exact integers; ONE float division.

    Scale shape: the broadcast side is the edge list (bounded by
    duplicate pairs, not the corpus); per-batch integer partials, one
    global Sum. The 10^12-edge variant buckets wedges on the shared
    node exactly as dup_triangles documents."""
    import ray

    from ray.data.aggregate import Sum

    edf = pairs.to_pandas()  # small: duplicate pairs only
    if a_col not in edf.columns or not len(edf):
        return rd.from_arrow(
            pa.table(
                {
                    "n_triangles": pa.array([0], pa.int64()),
                    "n_wedges": pa.array([0], pa.int64()),
                    "transitivity": pa.array([0.0], pa.float64()),
                }
            )
        )
    u = edf[a_col].to_numpy(np.int64)
    v = edf[b_col].to_numpy(np.int64)
    deg = pd.concat([edf[a_col], edf[b_col]]).value_counts()
    d = deg.to_numpy(np.int64)
    wedges = int((d * (d - 1) // 2).sum())
    order = np.argsort(u, kind="stable")
    u_s, v_s = u[order], v[order]
    packed = np.sort((u_s << np.int64(32)) | v_s)
    handle = ray.put((u_s, v_s, packed))

    def count(batch: pa.Table) -> pa.Table:
        au, av, pk = ray.get(handle)
        a = np.asarray(batch.column(a_col), dtype=np.int64)
        b = np.asarray(batch.column(b_col), dtype=np.int64)
        lo = np.searchsorted(au, a, "left")
        hi = np.searchsorted(au, a, "right")
        cnt = (hi - lo).astype(np.int64)
        tot = int(cnt.sum())
        if tot == 0:
            return pa.table({"n": pa.array([0], pa.int64())})
        cum = np.concatenate([[0], np.cumsum(cnt)])
        idx = (
            np.arange(tot, dtype=np.int64)
            - np.repeat(cum[:-1], cnt)
            + np.repeat(lo, cnt)
        )
        c = av[idx]
        bb = np.repeat(b, cnt)
        keep = c > bb  # wedge (a,b,c) with b < c: close at min vertex a
        probes = (bb[keep] << np.int64(32)) | c[keep]
        n_tri = int(np.isin(probes, pk).sum())
        return pa.table({"n": pa.array([n_tri], pa.int64())})

    agg = pairs.map_batches(count, batch_format="pyarrow").aggregate(
        Sum("n", alias_name="n")
    )
    tri = int(agg["n"])
    c = round(3.0 * tri / float(wedges), 6) if wedges else 0.0
    return rd.from_arrow(
        pa.table(
            {
                "n_triangles": pa.array([tri], pa.int64()),
                "n_wedges": pa.array([wedges], pa.int64()),
                "transitivity": pa.array([c], pa.float64()),
            }
        )
    )


def label_propagation(
    pairs: rd.Dataset,
    seeds: pa.Table,
    rounds: int = 5,
    a_col: str = "vec_id_a",
    b_col: str = "vec_id_b",
) -> rd.Dataset:
    """Seeded label propagation (Zhu & Ghahramani 2002, hard-clamp
    variant) over an undirected edge list: seed nodes keep their label
    forever; each round, every still-unlabeled node adopts the
    MAJORITY label among its labeled neighbors (ties -> smallest
    label); nodes first labeled in round r report that round. The
    semi-supervised classify pass of a dup/similarity graph.

    Determinism: labels and counts are integers; the majority rule's
    tiebreak is total, so every round is a pure function of the edge
    list — bit-stable under any layout, and SQL-unrollable as
    ``rounds`` MATERIALIZED CTEs.

    Scale shape: the pagerank contract — the adjacency stays
    distributed; the label table (node-set-bounded) broadcasts per
    round; per-block partial (node, label) vote counts merge
    driver-side where the label table lives."""
    import ray

    def undirected(b: pa.Table) -> pa.Table:
        a = b.column(a_col)
        bb = b.column(b_col)
        if isinstance(a, pa.ChunkedArray):
            a, bb = a.combine_chunks(), bb.combine_chunks()
        return pa.table(
            {
                "node": pa.concat_arrays([a.cast(pa.int64()), bb.cast(pa.int64())]),
                "nbr": pa.concat_arrays([bb.cast(pa.int64()), a.cast(pa.int64())]),
            }
        )

    adj = pairs.map_batches(undirected, batch_format="pyarrow").materialize()
    labels = {
        int(v): (int(l), 0)
        for v, l in zip(
            seeds.column("vec_id").to_pylist(),
            seeds.column("label").to_pylist(),
        )
    }
    for r in range(1, rounds + 1):
        lab_keys = np.fromiter(labels.keys(), np.int64, len(labels))
        lab_vals = np.fromiter(
            (v[0] for v in labels.values()), np.int64, len(labels)
        )
        o = np.argsort(lab_keys)
        handle = ray.put((lab_keys[o], lab_vals[o]))

        def votes(b: pa.Table) -> pa.Table:
            keys, vals = ray.get(handle)
            node = np.asarray(b.column("node"), np.int64)
            nbr = np.asarray(b.column("nbr"), np.int64)
            pos = np.searchsorted(keys, nbr)
            pos = np.clip(pos, 0, len(keys) - 1)
            has = keys[pos] == nbr if len(keys) else np.zeros(len(nbr), bool)
            # votes only from labeled neighbors to UNLABELED nodes
            npos = np.searchsorted(keys, node)
            npos = np.clip(npos, 0, len(keys) - 1)
            unlab = ~(keys[npos] == node) if len(keys) else np.ones(len(node), bool)
            m = has & unlab
            if not m.any():
                return pa.table(
                    {
                        "node": pa.array([], pa.int64()),
                        "label": pa.array([], pa.int64()),
                        "c": pa.array([], pa.int64()),
                    }
                )
            t = pa.table(
                {
                    "node": pa.array(node[m]),
                    "label": pa.array(vals[pos[m]]),
                }
            )
            g = t.group_by(["node", "label"]).aggregate([("label", "count")])
            return g.rename_columns(["node", "label", "c"])

        part = adj.map_batches(votes, batch_format="pyarrow").to_pandas()
        if not len(part):
            break
        agg = part.groupby(["node", "label"], as_index=False)["c"].sum()
        agg = agg.sort_values(
            ["node", "c", "label"], ascending=[True, False, True]
        )
        win = agg.drop_duplicates("node")
        new = {
            int(n): (int(l), r)
            for n, l in zip(win["node"], win["label"])
            if int(n) not in labels
        }
        if not new:
            break
        labels.update(new)

    items = sorted(labels.items())
    return rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array([k for k, _ in items], pa.int64()),
                "label_pred": pa.array([v[0] for _, v in items], pa.int64()),
                "round_assigned": pa.array(
                    [v[1] for _, v in items], pa.int64()
                ),
            }
        )
    )


def cluster_purity(
    comps: rd.Dataset, labels: pa.Table
) -> rd.Dataset:
    """Label purity of each graph cluster: for every component (from
    :func:`~vietnamese_ocr_ray.functions.dedup.connected_components`),
    the majority label among its members (ties -> smallest label), the
    majority count, and purity = majority/size — the "did semantic
    dedup clusters respect class boundaries" audit.

    Scale shape: the component table is dup-bounded (the
    neardup_survivors small-side contract), the label lookup is a
    vectorized index_in against the broadcast (id, label) arrays, and
    the per-component majority is one lexsort + run-length pass."""
    import ray

    handle = ray.put(
        (
            pa.array(labels.column("vec_id").to_pylist(), pa.int64()),
            np.asarray(labels.column("label").to_pylist(), np.int64),
        )
    )

    def attach(b: pa.Table) -> pa.Table:
        keys, vals = ray.get(handle)
        node = b.column("node")
        if isinstance(node, pa.ChunkedArray):
            node = node.combine_chunks()
        lab = vals[pc.index_in(node, value_set=keys).to_numpy()]
        return pa.table(
            {
                "component": b.column("component"),
                "label": pa.array(lab),
            }
        )

    rows = comps.map_batches(attach, batch_format="pyarrow").to_pandas()
    if not len(rows):
        return rd.from_arrow(
            pa.table(
                {
                    "component": pa.array([], pa.int64()),
                    "size": pa.array([], pa.int64()),
                    "majority_label": pa.array([], pa.int64()),
                    "n_majority": pa.array([], pa.int64()),
                    "purity": pa.array([], pa.float64()),
                }
            )
        )
    g = (
        rows.groupby(["component", "label"], as_index=False)
        .size()
        .sort_values(
            ["component", "size", "label"], ascending=[True, False, True]
        )
    )
    win = g.drop_duplicates("component").set_index("component")
    tot = rows.groupby("component").size()
    comp = tot.index.to_numpy(np.int64)
    size = tot.to_numpy(np.int64)
    maj = win.loc[comp, "label"].to_numpy(np.int64)
    nmaj = win.loc[comp, "size"].to_numpy(np.int64)
    return rd.from_arrow(
        pa.table(
            {
                "component": pa.array(comp),
                "size": pa.array(size),
                "majority_label": pa.array(maj),
                "n_majority": pa.array(nmaj),
                "purity": pa.array(
                    np.round(nmaj / size.astype(np.float64), 6), pa.float64()
                ),
            }
        )
    )


def kcore_peel(
    pairs: rd.Dataset, k: int = 2, rounds: int = 16
) -> rd.Dataset | pa.Table:
    """``rounds``-round peel toward the k-core of the UNDIRECTED graph
    of an (a, b) edge list: each round drops every node whose degree in
    the surviving subgraph is below ``k``, then re-filters the edges.
    Output: (node, degree) of the surviving subgraph, node-sorted.

    A FIXED round count (not peel-to-fixpoint) keeps the op
    SQL-replayable as unrolled CTEs; peeling removes at least one
    "onion layer" per round, so 16 rounds converge for any graph whose
    sub-k tails are shorter than 16 hops (all test scales converge by
    round 13 — genuinely deeper graphs need ``rounds`` raised, which
    changes both engines in lockstep). Early exit when a round removes
    nothing is result-identical to running the remaining rounds.

    Scale shape: edges stay distributed; each round is one distributed
    degree partial + a node-set broadcast (the CC broadcast-mode heap
    assumption: the DUP-GRAPH node set — pair-incident docs only — is
    orders smaller than the corpus; a fully-shuffled variant would ride
    the same alternating filter with bucket cogroups instead of
    broadcast)."""
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

    empty = pa.table(
        {"node": pa.array([], pa.int64()), "degree": pa.array([], pa.int64())}
    )
    adj = edges.map_batches(undirected, batch_format="pyarrow").materialize()
    if adj.count() == 0:
        return empty

    alive: np.ndarray | None = None  # None = all nodes
    deg_pd = None
    for _ in range(rounds):
        handle = ray.put(alive)

        def degree_partial(b: pa.Table) -> pa.Table:
            keep = ray.get(handle)
            src = np.asarray(b.column("src"))
            dst = np.asarray(b.column("dst"))
            if keep is not None:
                pos_s = np.searchsorted(keep, src)
                pos_d = np.searchsorted(keep, dst)
                np.minimum(pos_s, len(keep) - 1, out=pos_s)
                np.minimum(pos_d, len(keep) - 1, out=pos_d)
                m = (keep[pos_s] == src) & (keep[pos_d] == dst)
                src = src[m]
            uniq, counts = np.unique(src, return_counts=True)
            return pa.table(
                {"node": pa.array(uniq), "deg": pa.array(counts.astype(np.int64))}
            )

        deg_df = adj.map_batches(
            degree_partial, batch_format="pyarrow"
        ).to_pandas()
        if deg_df.empty or "node" not in deg_df.columns:
            # every edge filtered away: fully-empty Datasets drop their
            # schema at to_pandas (the dedup.py:1524 gotcha)
            return empty
        deg_pd = deg_df.groupby("node", sort=True)["deg"].sum()
        new_alive = deg_pd[deg_pd >= k].index.to_numpy(np.int64)
        stable = alive is not None and len(new_alive) == len(alive)
        alive = new_alive
        if len(alive) == 0:
            return empty
        if stable:
            break

    surv = deg_pd[deg_pd.index.isin(alive)]
    # degrees are w.r.t. the edge set BEFORE this round's filter; when
    # the loop ended stable those coincide — otherwise one more pass
    if not stable:
        handle = ray.put(alive)
        final_df = adj.map_batches(
            degree_partial, batch_format="pyarrow"
        ).to_pandas()
        if final_df.empty or "node" not in final_df.columns:
            return empty
        surv = final_df.groupby("node", sort=True)["deg"].sum()
    return rd.from_arrow(
        pa.table(
            {
                "node": pa.array(surv.index.to_numpy(np.int64)),
                "degree": pa.array(surv.to_numpy(np.int64)),
            }
        )
    )


def ktruss_peel(
    pairs: rd.Dataset, k: int = 3, rounds: int = 8
) -> pa.Table:
    """``rounds``-round peel toward the k-TRUSS of the undirected
    (a, b) edge graph (Cohen 2008): each round drops every edge whose
    SUPPORT — the number of triangles it closes in the surviving
    subgraph — is below k - 2, then recomputes. The edge-based
    sibling of :func:`kcore_peel`: a k-truss is the cohesion notion a
    dedup reviewer wants when chains of borderline pairs must not
    glue clusters (every kept edge needs k - 2 independent
    witnesses). Output: (a, b, support) of surviving edges.

    Fixed round count for SQL replayability (the kcore_peel
    contract); each effective round removes >= 1 edge so ``rounds``
    bounds convergence depth at the scales at hand; a no-removal
    round is a fixpoint and exits early, result-identical. If the
    budget runs out right after a removal round, support is
    RECOMPUTED once on the final surviving edge set — the SQL oracle
    computes support fresh on whatever edges remain, so the two
    surfaces agree even without convergence.

    Scale shape: the edge LIST is pair-bounded and drives the round
    loop from the driver (the kmv/mmr driver budget — dup-graph pair
    sets are orders smaller than the corpus); the O(sum deg^2) wedge
    enumeration — the expensive part — runs as parallel Ray tasks
    over lower-endpoint chunks against a broadcast sorted edge-key
    array, each task pure numpy (triu pair expansion + searchsorted
    membership + add.at support partials). Task count auto-sizes to
    the wedge load: ``n_tasks = clamp(ceil(total_wedges / 2^21), 1,
    64)`` with cut points placed on the CUMULATIVE per-u wedge count
    (not the edge count), so one hub u with deg^2 wedges cannot
    flood a single task on a dense dup graph."""
    import ray

    edges_tbl = (
        pairs.select_columns(["a", "b"])
        .map_batches(
            lambda t: pa.table(
                {
                    "a": pc.min_element_wise(
                        pc.cast(t.column("a"), pa.int64()),
                        pc.cast(t.column("b"), pa.int64()),
                    ),
                    "b": pc.max_element_wise(
                        pc.cast(t.column("a"), pa.int64()),
                        pc.cast(t.column("b"), pa.int64()),
                    ),
                }
            ),
            batch_format="pyarrow",
        )
        .to_pandas()
        .drop_duplicates(["a", "b"])
    )
    a = edges_tbl["a"].to_numpy(np.int64)
    b = edges_tbl["b"].to_numpy(np.int64)
    keep = a != b
    a, b = a[keep], b[keep]
    order = np.lexsort((b, a))
    a, b = a[order], b[order]

    M = np.int64(1) << np.int64(32)

    @ray.remote
    def wedge_support(ua: np.ndarray, ub: np.ndarray, keys_ref) -> np.ndarray:
        """Support partials for one chunk of lower endpoints: for each
        u, all neighbor pairs (v, w), closure via sorted-key search;
        returns index-aligned add counts for the GLOBAL edge array."""
        keys = keys_ref
        out = np.zeros(keys.shape[0], np.int64)
        if ua.size == 0:
            return out
        # group boundaries over the (sorted) chunk
        starts = np.flatnonzero(np.concatenate(([True], ua[1:] != ua[:-1])))
        counts = np.diff(np.append(starts, ua.shape[0]))
        tot = int((counts * (counts - 1) // 2).sum())
        if tot == 0:
            return out
        # vectorized per-group pair expansion (repeat/arange pattern)
        gidx = np.repeat(np.arange(starts.shape[0]), counts * (counts - 1) // 2)
        within = np.arange(tot) - np.repeat(
            np.concatenate(([0], np.cumsum(counts * (counts - 1) // 2)[:-1])),
            counts * (counts - 1) // 2,
        )
        c = counts[gidx]
        # map linear index -> (i, j) with i < j in an upper triangle
        i = (
            c
            - 2
            - np.floor(
                np.sqrt(-8.0 * within + 4.0 * c * (c - 1) - 7.0) / 2.0 - 0.5
            )
        ).astype(np.int64)
        j = (
            within + i + 1 - c * (c - 1) // 2 + (c - i) * ((c - i) - 1) // 2
        ).astype(np.int64)
        base = starts[gidx]
        v = ub[base + i]
        w = ub[base + j]
        cand = v * M + w
        pos = np.searchsorted(keys, cand)
        pos = np.minimum(pos, keys.shape[0] - 1)
        closed = keys[pos] == cand
        if not closed.any():
            return out
        u = ua[base[closed]]
        v, w = v[closed], w[closed]
        for e1, e2 in ((u, v), (u, w), (v, w)):
            p = np.searchsorted(keys, e1 * M + e2)
            np.add.at(out, p, 1)
        return out

    _WEDGES_PER_TASK = 1 << 21

    def _support(a: np.ndarray, b: np.ndarray) -> np.ndarray:
        keys = a * M + b
        keys_ref = ray.put(keys)
        # per-u group extents and wedge counts (a is lexsorted)
        starts = np.flatnonzero(np.concatenate(([True], a[1:] != a[:-1])))
        counts = np.diff(np.append(starts, a.shape[0]))
        wedges = counts * (counts - 1) // 2
        total = int(wedges.sum())
        n_tasks = int(min(64, max(1, -(-total // _WEDGES_PER_TASK))))
        # cut on cumulative WEDGE load at group boundaries: equal-work
        # chunks even when one hub u carries most of the wedges
        cum = np.cumsum(wedges)
        targets = np.linspace(0, total, n_tasks + 1)[1:-1]
        gcut = np.searchsorted(cum, targets, side="left") + 1
        edge_cuts = np.unique(
            np.concatenate(
                (
                    [0],
                    np.where(gcut < starts.shape[0], starts[np.minimum(gcut, starts.shape[0] - 1)], a.shape[0]),
                    [a.shape[0]],
                )
            )
        )
        parts = ray.get(
            [
                wedge_support.remote(
                    a[edge_cuts[t] : edge_cuts[t + 1]],
                    b[edge_cuts[t] : edge_cuts[t + 1]],
                    keys_ref,
                )
                for t in range(edge_cuts.shape[0] - 1)
                if edge_cuts[t] < edge_cuts[t + 1]
            ]
        )
        return (
            np.sum(parts, axis=0)
            if parts
            else np.zeros(a.shape[0], np.int64)
        )

    supp = np.zeros(a.shape[0], np.int64)
    min_supp = k - 2
    converged = a.size == 0
    for _ in range(rounds):
        if a.size == 0:
            converged = True
            break
        supp = _support(a, b)
        alive = supp >= min_supp
        if alive.all():
            converged = True
            break
        a, b, supp = a[alive], b[alive], supp[alive]
    if not converged and a.size:
        # budget exhausted right after a removal round: refresh support
        # on the final edge set so it reflects the surviving subgraph
        # (matches the oracle's fresh recompute)
        supp = _support(a, b)
    return pa.table(
        {
            "a": pa.array(a),
            "b": pa.array(b),
            "support": pa.array(supp),
        }
    )


def dup_modularity_by_source(
    pairs: rd.Dataset, docs: rd.Dataset
) -> pa.Table:
    """Newman modularity of the near-duplicate graph under the
    SOURCE partition: per source c, its within-community edge count
    e_c, degree sum d_c, and modularity term
    ``e_c/m - (d_c/(2m))^2`` — the "does duplication stay inside
    crawls or bridge them" audit (positive terms = dup edges
    concentrate within the source; a large negative term = a source
    whose dups mostly point elsewhere, the classic mirrored-site
    signal).

    Scale shape: the pair list joins NATIVELY to the (doc_id, source)
    projection twice (pair-bounded shuffles — the source map is
    corpus-sized, never broadcast); per-batch partials emit 2 rows per
    edge ((sa, e, 1), (sb, 0, 1)) into a sources-bounded aggregate; m
    is the tiny aggregate's own sum. Exact integers until the one
    fixed-order float term, rounded to 6dp like the SQL oracle."""
    from ray.data.aggregate import Sum

    lab = pairs.select_columns(["a", "b"]).join(
        docs.select_columns(["doc_id", "source"]),
        join_type="inner",
        num_partitions=8,
        on=("a",),
        right_on=("doc_id",),
    )
    lab = lab.map_batches(
        lambda t: t.rename_columns(
            ["a", "b", "sa"]
        ),
        batch_format="pyarrow",
    ).join(
        docs.select_columns(["doc_id", "source"]),
        join_type="inner",
        num_partitions=8,
        on=("b",),
        right_on=("doc_id",),
    )

    def partial(t: pa.Table) -> pa.Table:
        sa = t.column("sa")
        sb = t.column("source")
        if isinstance(sa, pa.ChunkedArray):
            sa = sa.combine_chunks()
        if isinstance(sb, pa.ChunkedArray):
            sb = sb.combine_chunks()
        within = pc.cast(pc.equal(sa, sb), pa.int64())
        n = t.num_rows
        both = pa.table(
            {
                "source": pa.concat_arrays(
                    [sa.combine_chunks() if isinstance(sa, pa.ChunkedArray) else sa,
                     sb.combine_chunks() if isinstance(sb, pa.ChunkedArray) else sb]
                ),
                "e": pa.concat_arrays(
                    [
                        within.combine_chunks()
                        if isinstance(within, pa.ChunkedArray)
                        else within,
                        pa.array(np.zeros(n, np.int64)),
                    ]
                ),
                "d": pa.array(np.ones(2 * n, np.int64)),
            }
        )
        return both.group_by("source").aggregate(
            [("e", "sum"), ("d", "sum")]
        ).rename_columns(["source", "e", "d"])

    per = (
        lab.map_batches(partial, batch_format="pyarrow")
        .groupby("source")
        .aggregate(Sum("e", alias_name="e"), Sum("d", alias_name="d"))
        .to_pandas()
        .sort_values("source")
    )  # sources-bounded
    e = per["e"].to_numpy(np.int64)
    d = per["d"].to_numpy(np.int64)
    m = int(d.sum()) // 2
    term = np.round(
        e.astype(np.float64) / m
        - (d.astype(np.float64) / (2 * m)) * (d.astype(np.float64) / (2 * m)),
        6,
    )
    return pa.table(
        {
            "source": pa.array(per["source"].to_numpy(object), pa.string()),
            "within_edges": pa.array(e),
            "degree_sum": pa.array(d),
            "modularity_term": pa.array(term, pa.float64()),
        }
    )


def _bfs_ecc(edges: rd.Dataset, src: int, cap: int = 128):
    """(dist dict, eccentricity, farthest node) of a frontier BFS from
    ``src`` over a materialized undirected (u, v) edge dataset — the
    khop_distances loop with an arbitrary source and no artificial hop
    cap (``cap`` is a runaway bound, asserted unhit). Farthest-node
    tie-break = smallest node id."""
    import ray

    dist: dict[int, int] = {src: 0}
    frontier = np.array([src], dtype=np.int64)
    for d in range(1, cap + 1):
        fh = ray.put(np.sort(frontier))

        def neigh(batch: pa.Table) -> pa.Table:
            f = ray.get(fh)
            u = np.asarray(batch.column("u"))
            v = np.asarray(batch.column("v"))
            out = np.concatenate([v[np.isin(u, f)], u[np.isin(v, f)]])
            return pa.table({"n": pa.array(np.unique(out))})

        ndf = edges.map_batches(neigh, batch_format="pyarrow").to_pandas()
        if "n" not in ndf.columns or not len(ndf):
            break
        cand = np.unique(ndf["n"].to_numpy(np.int64))
        new = cand[~np.isin(cand, np.fromiter(dist.keys(), np.int64))]
        if not len(new):
            break
        for n in new:
            dist[int(n)] = d
        frontier = new
    else:
        raise RuntimeError(f"BFS exceeded the {cap}-hop runaway bound")
    ecc = max(dist.values())
    far = min(n for n, d in dist.items() if d == ecc)
    return dist, ecc, far


def graph_diameter_est(ds: rd.Dataset, id_col: str = "doc_id") -> pa.Table:
    """Double-sweep diameter lower bound of the :func:`chain_edges`
    graph (Magnien, Latapy & Habib 2009): BFS from the minimum node
    gives eccentricity ecc0 and a farthest node f; a second BFS from f
    gives ecc(f) — a lower bound on the diameter that is tight on
    tree-like and chain-like graphs (this one). Two frontier-BFS
    passes over the SAME materialized edge dataset; driver state is
    the reached node set. Output one row: (src, ecc_src, far_node,
    diameter_lb), all exact integers; the oracle replays both sweeps
    as chained recursive CTEs."""
    edges = chain_edges(ds, id_col).materialize()
    src = int(ds.select_columns([id_col]).to_pandas()[id_col].min())
    _, ecc0, far = _bfs_ecc(edges, src)
    _, ecc1, _ = _bfs_ecc(edges, far)
    return pa.table(
        {
            "src": pa.array([src], pa.int64()),
            "ecc_src": pa.array([ecc0], pa.int64()),
            "far_node": pa.array([far], pa.int64()),
            "diameter_lb": pa.array([ecc1], pa.int64()),
        }
    )
