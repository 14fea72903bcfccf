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
import pandas as pd
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


_PAIRS_SCHEMA = pa.schema(
    [("vec_id_a", pa.int64()), ("vec_id_b", pa.int64()), ("cos", pa.float64())]
)


def _chunk_cos_pairs(
    ids_a: np.ndarray,
    ma: np.ndarray,
    ids_b: np.ndarray,
    mb: np.ndarray,
    threshold: float,
    diagonal: bool,
) -> pa.Table:
    """All above-threshold pairs between two normalized chunks,
    each unordered pair emitted once (smaller id first).

    ``diagonal=True`` means the two chunks are the SAME chunk, so the
    strict ``id_a < id_b`` mask both dedups the symmetric (b, a) hit
    and drops self-pairs. For two DISTINCT chunks only this (i, j)
    task ever sees the pair — there is no mirror (j, i) task — so the
    mask must be ``!=`` (ids are not globally ordered across chunks)
    and the output is canonicalized to (min, max) here instead.
    """
    cos = ma @ mb.T
    np.round(cos, 6, out=cos)
    hit = cos >= threshold
    if diagonal:
        hit &= ids_a[:, None] < ids_b[None, :]
    else:
        hit &= ids_a[:, None] != ids_b[None, :]
    r, c = np.nonzero(hit)
    lo = np.minimum(ids_a[r], ids_b[c])
    hi = np.maximum(ids_a[r], ids_b[c])
    return pa.table(
        {
            "vec_id_a": pa.array(lo),
            "vec_id_b": pa.array(hi),
            "cos": pa.array(cos[r, c], pa.float64()),
        }
    )


def _chunk_arrays(t: pa.Table, id_col: str) -> tuple[np.ndarray, np.ndarray]:
    """(ids int64, normalized matrix) from a pinned chunk table."""
    arr = t.column("nvec")
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    m = np.asarray(arr.values, dtype=np.float64).reshape(len(arr), -1)
    return np.asarray(t.column(id_col), dtype=np.int64), m


def _normed_chunk_refs(
    ds: rd.Dataset, id_col: str, chunk_rows: int, extra_cols: tuple = ()
) -> list:
    """Materialize (id, unit vector[, extras]) chunks in the object
    store and return their block REFERENCES — the driver never holds
    vector data. One read pass; the row count is block metadata (free)
    for sizing the chunk repartition. Empty input returns []."""

    def norm_chunk(batch: pa.Table) -> pa.Table:
        m = _matrix(batch)
        m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)
        cols = {
            id_col: pc.cast(
                batch.column(id_col).combine_chunks()
                if isinstance(batch.column(id_col), pa.ChunkedArray)
                else batch.column(id_col),
                pa.int64(),
            ),
            "nvec": pa.FixedSizeListArray.from_arrays(
                pa.array(m.reshape(-1), pa.float64()), m.shape[1]
            ),
        }
        for c in extra_cols:
            cols[c] = batch.column(c)
        return pa.table(cols)

    src = ds.select_columns([id_col, "embedding", *extra_cols]).materialize()
    n = src.count()
    if n == 0:
        return []
    n_chunks = max(1, -(-n // chunk_rows))
    normed = (
        src.repartition(n_chunks)
        .map_batches(norm_chunk, batch_format="pyarrow", batch_size=chunk_rows)
        .materialize()
    )
    return list(normed.to_arrow_refs())


def cosine_pairs(
    ds: rd.Dataset,
    threshold: float,
    id_col: str = "vec_id",
    chunk_rows: int = 8192,
    max_tasks: int = 256,
) -> rd.Dataset:
    """Embedding-cosine near-duplicate pairs, EXACT, distributed:

    1. normalize each embedding once and materialize the (id, unit
       vector) chunks in the object store — the driver only ever holds
       block REFERENCES, never vector data;
    2. fan a dataset of chunk-pair indices (upper triangle, C*(C+1)/2
       tasks) through map_batches; each task zero-copy-reads its two
       chunks from the object store and does one matmul.

    Exact all-pairs is inherently O(N^2) compute, but it is spread
    evenly over the cluster with O(chunk_rows^2) memory per task and
    no driver materialization / full-matrix broadcast. For corpora
    where quadratic compute is unaffordable use
    :func:`cosine_pairs_lsh` (approximate, hyperplane-bucketed) —
    exactness there depends on the duplicate threshold being high.

    Pair (a, b) is emitted once (a < b), cosine rounded to 6 decimals.
    """
    import ray

    block_refs = _normed_chunk_refs(ds, id_col, chunk_rows)
    if not block_refs:
        return rd.from_arrow(_PAIRS_SCHEMA.empty_table())
    c = len(block_refs)
    ij = [(i, j) for i in range(c) for j in range(i, c)]
    pair_tbl = pa.table(
        {
            "i": pa.array([p[0] for p in ij], pa.int32()),
            "j": pa.array([p[1] for p in ij], pa.int32()),
        }
    )

    def block_pair(batch: pa.Table) -> pa.Table:
        out = []
        for i, j in zip(
            batch.column("i").to_pylist(), batch.column("j").to_pylist()
        ):
            ta = ray.get(block_refs[i])
            ids_a, ma = _chunk_arrays(ta, id_col)
            if i == j:
                ids_b, mb = ids_a, ma
            else:
                ids_b, mb = _chunk_arrays(ray.get(block_refs[j]), id_col)
            if ids_a.size and ids_b.size:
                out.append(
                    _chunk_cos_pairs(ids_a, ma, ids_b, mb, threshold, i == j)
                )
        if not out:
            return _PAIRS_SCHEMA.empty_table()
        return pa.concat_tables(out)

    return rd.from_arrow(pair_tbl).repartition(
        min(len(ij), max_tasks)
    ).map_batches(block_pair, batch_format="pyarrow")


def cosine_pairs_lsh(
    ds: rd.Dataset,
    threshold: float,
    id_col: str = "vec_id",
    *,
    dim: int = 64,
    planes: int = 8,
    tables: int = 8,
    seed: int = 13,
    num_coarse: int = 32,
) -> rd.Dataset:
    """Approximate cosine near-dup pairs — the sub-quadratic 100 TB
    path: multi-table random-hyperplane bucketing (Charikar 2002
    sign-LSH, banded like minhash) replaces the O(N^2) matmul.

    Exchange discipline: the bucket rows carry ONLY (key, id) ints —
    vectors never ride the LSH shuffle. Candidates (ids co-bucketed in
    any table) are verified exactly by joining the pair list back to
    the normalized vectors with the bucketed-cogroup shape (two
    candidate-sized shuffles + the vector table once), mirroring
    minhash's corpus-join verify. Pairs colliding in NO table are
    missed — recall rises with ``tables`` and falls with ``planes``;
    sized for high-similarity duplicates (tests/test_functions.py
    measures recall >= 0.9 on planted cos~0.999 dups)."""
    from vietnamese_ocr_ray.functions.joins import key_bucket

    plane_sets = [
        LshIndexer(dim, planes, seed + 1000 * t) for t in range(tables)
    ]

    def bucket_rows(batch: pa.Table) -> pa.Table:
        """(key, coarse, id) int rows — one per vector per table."""
        m = _matrix(batch)
        mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)
        n = m.shape[0]
        ids = np.asarray(batch.column(id_col), dtype=np.int64)
        keys = np.concatenate(
            [
                t * np.int64(1 << planes) + idx.bucket_of(mn)
                for t, idx in enumerate(plane_sets)
            ]
        )
        key_arr = pa.array(keys)
        return pa.table(
            {
                "key": key_arr,
                "coarse": pa.array(
                    (keys.astype(np.uint64) % np.uint64(num_coarse)).astype(
                        np.int32
                    )
                ),
                id_col: pa.array(np.tile(ids, tables)),
            }
        )

    rows = ds.select_columns([id_col, "embedding"]).map_batches(
        bucket_rows, batch_format="pyarrow"
    )

    def candidates(g: pd.DataFrame) -> pa.Table:
        """Pairs co-bucketed under any exact LSH key of this coarse
        bucket — run-detected after one sort, pairs via triu_indices,
        deduped within the bucket."""
        s = g.sort_values(["key", id_col], kind="stable")
        key = s["key"].to_numpy(np.int64)
        ids = s[id_col].to_numpy(np.int64)
        n = ids.shape[0]
        out_a, out_b = [], []
        if n:
            change = np.ones(n, dtype=bool)
            change[1:] = key[1:] != key[:-1]
            starts = np.nonzero(change)[0]
            sizes = np.diff(np.append(starts, n))
            for st, sz in zip(starts[sizes >= 2], sizes[sizes >= 2]):
                ii, jj = np.triu_indices(int(sz), 1)
                seg = ids[st : st + sz]
                out_a.append(seg[ii])
                out_b.append(seg[jj])
        a = np.concatenate(out_a) if out_a else np.empty(0, np.int64)
        b = np.concatenate(out_b) if out_b else np.empty(0, np.int64)
        # same id twice under one key cannot happen (ids unique per
        # table, tables have distinct key ranges); dedup pairs that
        # collide under several keys of THIS coarse bucket
        df = pd.DataFrame({"a": a, "b": b}).drop_duplicates(["a", "b"])
        return pa.table(
            {
                "a": pa.array(df["a"].to_numpy(np.int64)),
                "b": pa.array(df["b"].to_numpy(np.int64)),
            }
        )

    cand = rows.groupby("coarse").map_groups(
        lambda g: candidates(g.drop(columns=["coarse"])),
        batch_format="pandas",
    )

    # global distinct: different tables hash the same pair to different
    # coarse buckets
    distinct = (
        cand.map_batches(
            lambda b: b.append_column(
                "_b",
                pa.array(
                    key_bucket(b.column("a"), num_coarse).astype(np.int32)
                ),
            ),
            batch_format="pyarrow",
        )
        .groupby("_b")
        .map_groups(
            lambda g: pa.Table.from_pandas(
                g.drop(columns=["_b"]).drop_duplicates(["a", "b"]),
                preserve_index=False,
            ).replace_schema_metadata(None),
            batch_format="pandas",
        )
    )

    # exact verify: join the pair list back to the normalized vectors
    # (bucketed cogroup; candidate-sized payload + the vectors once)
    def cand_roles(b: pa.Table) -> pa.Table:
        a = b.column("a").combine_chunks() if isinstance(
            b.column("a"), pa.ChunkedArray) else b.column("a")
        bb = b.column("b").combine_chunks() if isinstance(
            b.column("b"), pa.ChunkedArray) else b.column("b")
        n = b.num_rows
        key = pa.concat_arrays([a, bb])
        return pa.table(
            {
                "key": key,
                "pair_a": pa.concat_arrays([a, a]),
                "pair_b": pa.concat_arrays([bb, bb]),
                "role": pa.array(
                    np.concatenate([np.zeros(n, np.int8), np.ones(n, np.int8)])
                ),
                "nvec": pa.nulls(2 * n, pa.list_(pa.float64())),
                "_bucket": pa.array(
                    key_bucket(key, num_coarse).astype(np.int32)
                ),
            }
        )

    def vec_rows(b: pa.Table) -> pa.Table:
        m = _matrix(b)
        mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)
        ids = b.column(id_col).combine_chunks() if isinstance(
            b.column(id_col), pa.ChunkedArray) else b.column(id_col)
        n = b.num_rows
        offsets = pa.array(
            np.arange(0, (n + 1) * m.shape[1], m.shape[1], dtype=np.int32)
        )
        return pa.table(
            {
                "key": pc.cast(ids, pa.int64()),
                "pair_a": pa.nulls(n, pa.int64()),
                "pair_b": pa.nulls(n, pa.int64()),
                "role": pa.array(np.full(n, -1, np.int8)),
                "nvec": pa.ListArray.from_arrays(
                    offsets, pa.array(mn.reshape(-1), pa.float64())
                ),
                "_bucket": pa.array(
                    key_bucket(pc.cast(ids, pa.int64()), num_coarse).astype(
                        np.int32
                    )
                ),
            }
        )

    def attach_vec(g: pd.DataFrame) -> pa.Table:
        candp = g[g["role"] >= 0]
        vecs = g[g["role"] < 0][["key", "nvec"]]
        m = candp[["key", "pair_a", "pair_b", "role"]].merge(
            vecs, on="key", how="inner"
        )
        flat = (
            np.concatenate(m["nvec"].to_numpy())
            if len(m)
            else np.empty(0, np.float64)
        )
        d = flat.shape[0] // max(len(m), 1)
        offsets = pa.array(
            np.arange(0, (len(m) + 1) * d, d, dtype=np.int32)
        )
        return pa.table(
            {
                "pair_a": pa.array(m["pair_a"].to_numpy(np.int64)),
                "pair_b": pa.array(m["pair_b"].to_numpy(np.int64)),
                "role": pa.array(m["role"].to_numpy(np.int8)),
                "nvec": pa.ListArray.from_arrays(offsets, pa.array(flat)),
                "_bucket": pa.array(
                    key_bucket(
                        pa.array(m["pair_a"].to_numpy(np.int64)), num_coarse
                    ).astype(np.int32)
                ),
            }
        )

    def verify(g: pd.DataFrame) -> pa.Table:
        ta = g[g["role"] == 0][["pair_a", "pair_b", "nvec"]].rename(
            columns={"nvec": "va"}
        )
        tb = g[g["role"] == 1][["pair_a", "pair_b", "nvec"]].rename(
            columns={"nvec": "vb"}
        )
        m = ta.merge(tb, on=["pair_a", "pair_b"], how="inner")
        if not len(m):
            return _PAIRS_SCHEMA.empty_table()
        va = np.vstack(m["va"].to_numpy())
        vb = np.vstack(m["vb"].to_numpy())
        cos = np.round(np.einsum("ij,ij->i", va, vb), 6)
        hit = cos >= threshold
        return pa.table(
            {
                "vec_id_a": pa.array(m["pair_a"].to_numpy(np.int64)[hit]),
                "vec_id_b": pa.array(m["pair_b"].to_numpy(np.int64)[hit]),
                "cos": pa.array(cos[hit], pa.float64()),
            }
        )

    with_vec = (
        distinct.map_batches(cand_roles, batch_format="pyarrow")
        .union(
            ds.select_columns([id_col, "embedding"]).map_batches(
                vec_rows, batch_format="pyarrow"
            )
        )
        .groupby("_bucket")
        .map_groups(
            lambda g: attach_vec(g.drop(columns=["_bucket"])),
            batch_format="pandas",
        )
    )
    return with_vec.groupby("_bucket").map_groups(
        lambda g: verify(g.drop(columns=["_bucket"])), batch_format="pandas"
    )


def label_centroids(ds: rd.Dataset, label_col: str = "label") -> rd.Dataset:
    """Per-label centroid (mean embedding), emitted as flat
    (label, dim, avg_v) rows: each batch reduces to one (label, dim)
    partial-sum row set via a single ``np.add.at`` scatter (L x D rows
    per batch, not N x D), merged by the bucketed hash aggregate, one
    final division. avg rounded to 4 decimals — Ray and SQL sum the
    same doubles in different orders, so last-bit noise must be
    absorbed (same discipline as embedding_stats)."""
    from vietnamese_ocr_ray.functions.agg import hash_aggregate

    def partial(batch: pa.Table) -> pa.Table:
        m = _matrix(batch)
        labels = np.asarray(batch.column(label_col), dtype=np.int64)
        uniq, inv = np.unique(labels, return_inverse=True)
        sums = np.zeros((uniq.shape[0], m.shape[1]), dtype=np.float64)
        np.add.at(sums, inv, m)
        counts = np.bincount(inv, minlength=uniq.shape[0]).astype(np.int64)
        nl, d = sums.shape
        return pa.table(
            {
                "label": pa.array(np.repeat(uniq, d)),
                "dim": pa.array(np.tile(np.arange(1, d + 1, dtype=np.int64), nl)),
                "s": pa.array(sums.reshape(-1)),
                "n": pa.array(np.repeat(counts, d)),
            }
        )

    agg = hash_aggregate(
        ds.select_columns([label_col, "embedding"]).map_batches(
            partial, batch_format="pyarrow"
        ),
        ["label", "dim"],
        {"s": ("s", "sum"), "n": ("n", "sum")},
    )

    def finish(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "label": pc.cast(b.column("label"), pa.int64()),
                "dim": pc.cast(b.column("dim"), pa.int64()),
                "avg_v": pc.round(
                    pc.divide(
                        b.column("s"), pc.cast(b.column("n"), pa.float64())
                    ),
                    ndigits=4,
                ),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def ann_bruteforce_multi(
    ds: rd.Dataset,
    queries: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
) -> rd.Dataset:
    """Exact cosine top-k for a BATCH of queries in one corpus pass:
    the (Q, D) query matrix is broadcast once (ray.put), each batch
    does one (B, D) x (D, Q) matmul and keeps its per-query partial
    top-k, and one small sort+group finishes — Q queries cost one scan,
    not Q scans. Result: (query_id, vec_id, cos, rank), rank 1..k."""
    import ray

    qn = queries / np.maximum(
        np.linalg.norm(queries, axis=1, keepdims=True), 1e-30
    )
    handle = ray.put(qn)

    def score_topk(batch: pa.Table) -> pa.Table:
        q = ray.get(handle)
        m = _matrix(batch)
        m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)
        cos = np.round(m @ q.T, 6)  # (B, Q)
        ids = np.asarray(batch.column(id_col), dtype=np.int64)
        nq = q.shape[0]
        kk = min(k, cos.shape[0])
        # per-query partial top-k, ties to the smaller vec_id
        order = np.lexsort((ids[:, None].repeat(nq, 1), -cos), axis=0)[:kk]
        qidx = np.tile(np.arange(nq, dtype=np.int64), kk)
        rows = order.reshape(-1)
        return pa.table(
            {
                "query_id": pa.array(qidx),
                id_col: pa.array(ids[rows]),
                "cos": pa.array(cos[rows, qidx], pa.float64()),
            }
        )

    partials = ds.select_columns([id_col, "embedding"]).map_batches(
        score_topk, batch_format="pyarrow"
    )

    def finish(g: "pd.DataFrame") -> "pd.DataFrame":
        import pandas as pd

        s = g.sort_values(
            ["query_id", "cos", id_col], ascending=[True, False, True],
            kind="stable",
        ).groupby("query_id", sort=False).head(k)
        s = s.reset_index(drop=True)
        s["rank"] = s.groupby("query_id", sort=False).cumcount() + 1
        return s

    # Q is small: one tiny final group pass over k * blocks * Q rows
    return partials.groupby("query_id").map_groups(
        finish, batch_format="pandas"
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


_KNN_SCHEMA = pa.schema(
    [("vec_id", pa.int64()), ("nbr", pa.int64()), ("cos", pa.float64())]
)

_KNN_MIN = np.int64(np.iinfo(np.int64).min)


def _knn_partial_topk(
    ids_a: np.ndarray, key: np.ndarray, ids_b: np.ndarray, k: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Per-row k best (by packed (micro-cos << 33) - nbr key) of one
    candidate matrix; masked (self) cells carry _KNN_MIN and are
    dropped. Partitions on the key DIRECTLY — negating would wrap the
    int64 _KNN_MIN self-mask to the LARGEST value and select it."""
    kk = min(k, key.shape[1])
    if key.shape[1] > kk:
        cut = key.shape[1] - kk
        idx = np.argpartition(key, cut, axis=1)[:, cut:]
    else:
        idx = np.broadcast_to(np.arange(kk), (key.shape[0], kk)).copy()
    rows = np.repeat(np.arange(key.shape[0]), kk)
    cols = idx.ravel()
    kv = key[rows, cols]
    keep = kv != _KNN_MIN
    return ids_a[rows[keep]], ids_b[cols[keep]], kv[keep]


def _knn_finish(g: pd.DataFrame, k: int) -> pa.Table:
    """Global per-id top-k over (vec_id, nbr, key) partial rows —
    lexsort on (id, key desc) + run-boundary rank; the packed key
    unpacks back to micro-cos in the high bits."""
    vid = g["vec_id"].to_numpy(np.int64)
    nbr = g["nbr"].to_numpy(np.int64)
    key = g["key"].to_numpy(np.int64)
    order = np.lexsort((-key, vid))
    vid, nbr, key = vid[order], nbr[order], key[order]
    first = np.ones(len(vid), dtype=bool)
    first[1:] = vid[1:] != vid[:-1]
    starts = np.flatnonzero(first)
    runs = np.diff(np.append(starts, len(vid)))
    rank = np.arange(len(vid)) - np.repeat(starts, runs)
    m = rank < k
    micro = (key[m] + nbr[m]) >> np.int64(33)
    return pa.table(
        {
            "vec_id": pa.array(vid[m]),
            "nbr": pa.array(nbr[m]),
            "cos": pa.array(micro.astype(np.float64) / 1e6, pa.float64()),
        }
    )


def knn_join_exact(
    ds: rd.Dataset,
    k: int = 5,
    id_col: str = "vec_id",
    chunk_rows: int = 8192,
    max_tasks: int = 256,
    num_buckets: int = 32,
) -> rd.Dataset:
    """Exact k-nearest-neighbor SELF-join over an embedding column:
    every vector gets its k most-cosine-similar neighbors (self
    excluded) — the workhorse behind SemDeDup-style clustering and
    similarity audits, as a standalone operator.

    Same distribution shape as :func:`cosine_pairs`: normalized (id,
    unit-vector) chunks pinned in the object store, chunk-pair tasks
    (upper triangle) each doing ONE matmul — O(chunk_rows^2) memory
    per task, no driver materialization. Each task emits a PARTIAL
    top-k per row in both directions of its chunk pair (a given
    (row, neighbor) combination lives in exactly one task, so partials
    never duplicate); a bucketed per-id merge selects the global
    top-k. Shuffle volume is int-only (id, nbr, micro-cos) rows,
    N x n_chunks x k total.

    Determinism contract: selection orders on (cosine ROUNDED to 6
    decimals DESC, neighbor id ASC) — both packed into one int64 key
    (micro-cos << 33 minus neighbor id, exact for |id| < 2^32) so the
    partial top-k and the final merge order identically to the SQL
    window ``row_number() OVER (PARTITION BY vec_id ORDER BY cos
    DESC, nbr)``. Ids must be non-negative and < 2^32."""
    import ray

    from vietnamese_ocr_ray.functions.joins import key_bucket

    block_refs = _normed_chunk_refs(ds, id_col, chunk_rows)
    if not block_refs:
        return rd.from_arrow(_KNN_SCHEMA.empty_table())
    c = len(block_refs)
    ij = [(i, j) for i in range(c) for j in range(i, c)]
    pair_tbl = pa.table(
        {
            "i": pa.array([p[0] for p in ij], pa.int32()),
            "j": pa.array([p[1] for p in ij], pa.int32()),
        }
    )

    def _partial_topk(ids_a, key, ids_b):
        return _knn_partial_topk(ids_a, key, ids_b, k)

    def block_pair(batch: pa.Table) -> pa.Table:
        vid, nbr, ci = [], [], []
        for i, j in zip(
            batch.column("i").to_pylist(), batch.column("j").to_pylist()
        ):
            ids_a, ma = _chunk_arrays(ray.get(block_refs[i]), id_col)
            if i == j:
                ids_b, mb = ids_a, ma
            else:
                ids_b, mb = _chunk_arrays(ray.get(block_refs[j]), id_col)
            if not (ids_a.size and ids_b.size):
                continue
            cos = ma @ mb.T
            np.round(cos, 6, out=cos)
            micro = np.rint(cos * 1e6).astype(np.int64)
            key = (micro << np.int64(33)) - ids_b[None, :]
            key[ids_a[:, None] == ids_b[None, :]] = _KNN_MIN  # self
            a, b, kv = _partial_topk(ids_a, key, ids_b)
            vid.append(a), nbr.append(b), ci.append(kv)
            if i != j:  # the mirror direction has no (j, i) task
                key_t = (micro.T << np.int64(33)) - ids_a[None, :]
                a, b, kv = _partial_topk(ids_b, key_t, ids_a)
                vid.append(a), nbr.append(b), ci.append(kv)
        if not vid:
            return pa.table(
                {
                    "vec_id": pa.array([], pa.int64()),
                    "nbr": pa.array([], pa.int64()),
                    "key": pa.array([], pa.int64()),
                    "_bucket": pa.array([], pa.int32()),
                }
            )
        v = np.concatenate(vid)
        return pa.table(
            {
                "vec_id": pa.array(v),
                "nbr": pa.array(np.concatenate(nbr)),
                "key": pa.array(np.concatenate(ci)),
                "_bucket": pa.array(
                    key_bucket(pa.array(v), num_buckets).astype(np.int32)
                ),
            }
        )

    def finish(g: pd.DataFrame) -> pa.Table:
        return _knn_finish(g, k)

    from vietnamese_ocr_ray.functions.joins import _ensure_schema

    out = (
        rd.from_arrow(pair_tbl)
        .repartition(min(len(ij), max_tasks))
        .map_batches(block_pair, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(finish, batch_format="pandas")
    )
    return _ensure_schema(out, _KNN_SCHEMA)


def mmr_select(
    ds: rd.Dataset,
    query: np.ndarray,
    k: int = 8,
    pool: int = 32,
    id_col: str = "vec_id",
) -> pa.Table:
    """Maximal Marginal Relevance diverse top-k (Carbonell &
    Goldstein 1998) at lambda = 0.5: greedily pick the candidate
    maximizing ``relevance - max(similarity to already-selected)`` —
    the standard retrieve-then-diversify selection for dedup-aware
    sampling / RAG context pruning (reference repo has no analog;
    beyond-reference curation op).

    Scale shape: stage 1 is the :func:`ann_bruteforce` pattern — one
    distributed corpus scan with per-batch partial top-``pool``
    CARRYING the embedding, then a global sort+limit over the
    pool * num_blocks partial rows. Stage 2 (the greedy loop) is
    sequential BY DEFINITION and runs on the pool-sized candidate set
    only (constant-sized, driver-side) — never on the corpus.

    Determinism contract: relevance and pairwise similarity are both
    cosine rounded to 6dp (the module's contract); the MMR score is
    ONE double subtraction of those round-6 values, ties broken by
    ascending id — replayable as k unrolled MATERIALIZED CTE rounds
    in DuckDB (the pagerank_dupgraph pattern). Rank 1's score is
    defined as its relevance (empty selected set).
    """

    def score_topp(batch: pa.Table) -> pa.Table:
        m = _matrix(batch)
        qn = query / np.linalg.norm(query)
        norms = np.linalg.norm(m, axis=1)
        cos = np.round((m @ qn) / np.maximum(norms, 1e-30), 6)
        ids = batch.column(id_col)
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        emb = batch.column("embedding")
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        t = pa.table(
            {
                id_col: ids,
                "relevance": pa.array(cos, pa.float64()),
                "embedding": emb,
            }
        )
        if t.num_rows > pool:
            order = pc.sort_indices(
                t,
                sort_keys=[
                    ("relevance", "descending"),
                    (id_col, "ascending"),
                ],
            )
            t = t.take(order[:pool])
        return t

    pool_tbl = pa.Table.from_pandas(
        ds.select_columns([id_col, "embedding"])
        .map_batches(score_topp, batch_format="pyarrow")
        .sort(["relevance", id_col], descending=[True, False])
        .limit(pool)
        .to_pandas(),
        preserve_index=False,
    )
    ids = np.asarray(pool_tbl.column(id_col), dtype=np.int64)
    relq = np.asarray(pool_tbl.column("relevance"), dtype=np.float64)
    emb = pool_tbl.column("embedding")
    if isinstance(emb, pa.ChunkedArray):
        emb = emb.combine_chunks()
    m = np.asarray(
        [np.asarray(v, np.float64) for v in emb.to_pylist()]
    )  # pool-sized (constant), not corpus-sized
    m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)
    sims = np.round(m @ m.T, 6)

    n = len(ids)
    k = min(k, n)
    selected: list[int] = []
    out_rank, out_id, out_rel, out_score = [], [], [], []
    cand = np.ones(n, dtype=bool)
    for r in range(1, k + 1):
        if r == 1:
            scores = relq.copy()
        else:
            scores = relq - sims[:, selected].max(axis=1)
        scores = np.where(cand, scores, -np.inf)
        order = np.lexsort((ids, -scores))
        pick = int(order[0])
        selected.append(pick)
        cand[pick] = False
        out_rank.append(r)
        out_id.append(int(ids[pick]))
        out_rel.append(float(relq[pick]))
        out_score.append(float(relq[pick]) if r == 1 else float(scores[pick]))
    return pa.table(
        {
            "rank": pa.array(out_rank, pa.int64()),
            id_col: pa.array(out_id, pa.int64()),
            "relevance": pa.array(out_rel, pa.float64()),
            "mmr_score": pa.array(out_score, pa.float64()),
        }
    )


def hard_negatives(
    ds: rd.Dataset,
    k: int = 3,
    id_col: str = "vec_id",
    label_col: str = "label",
    chunk_rows: int = 8192,
    max_tasks: int = 256,
    num_buckets: int = 32,
) -> rd.Dataset:
    """Hard-negative mining for contrastive/embedding training: for
    every vector, its ``k`` most-cosine-similar vectors with a
    DIFFERENT ``label_col`` — the near-miss negatives that teach a
    metric model the class boundary (same-label neighbors are masked
    exactly like self-matches in :func:`knn_join_exact`).

    Same distribution shape and determinism contract as
    :func:`knn_join_exact` (chunk-pair matmuls over object-store
    refs, packed (micro-cos << 33) - nbr keys, bucketed per-id merge);
    labels ride the normalized chunks so the mask is a vectorized
    compare, never a join."""
    import ray

    from vietnamese_ocr_ray.functions.joins import _ensure_schema, key_bucket

    block_refs = _normed_chunk_refs(
        ds, id_col, chunk_rows, extra_cols=(label_col,)
    )
    if not block_refs:
        return rd.from_arrow(_KNN_SCHEMA.empty_table())
    c = len(block_refs)
    ij = [(i, j) for i in range(c) for j in range(i, c)]
    pair_tbl = pa.table(
        {
            "i": pa.array([p[0] for p in ij], pa.int32()),
            "j": pa.array([p[1] for p in ij], pa.int32()),
        }
    )

    def _arrays(t: pa.Table):
        ids, m = _chunk_arrays(t, id_col)
        lab = np.asarray(t.column(label_col), np.int64)
        return ids, m, lab

    def block_pair(batch: pa.Table) -> pa.Table:
        vid, nbr, ci = [], [], []
        for i, j in zip(
            batch.column("i").to_pylist(), batch.column("j").to_pylist()
        ):
            ids_a, ma, la = _arrays(ray.get(block_refs[i]))
            if i == j:
                ids_b, mb, lb = ids_a, ma, la
            else:
                ids_b, mb, lb = _arrays(ray.get(block_refs[j]))
            if not (ids_a.size and ids_b.size):
                continue
            cos = ma @ mb.T
            np.round(cos, 6, out=cos)
            micro = np.rint(cos * 1e6).astype(np.int64)
            key = (micro << np.int64(33)) - ids_b[None, :]
            key[la[:, None] == lb[None, :]] = _KNN_MIN  # same-label mask
            a, b, kv = _knn_partial_topk(ids_a, key, ids_b, k)
            vid.append(a), nbr.append(b), ci.append(kv)
            if i != j:
                key_t = (micro.T << np.int64(33)) - ids_a[None, :]
                key_t[lb[:, None] == la[None, :]] = _KNN_MIN
                a, b, kv = _knn_partial_topk(ids_b, key_t, ids_a, k)
                vid.append(a), nbr.append(b), ci.append(kv)
        if not vid:
            return pa.table(
                {
                    "vec_id": pa.array([], pa.int64()),
                    "nbr": pa.array([], pa.int64()),
                    "key": pa.array([], pa.int64()),
                    "_bucket": pa.array([], pa.int32()),
                }
            )
        v = np.concatenate(vid)
        return pa.table(
            {
                "vec_id": pa.array(v),
                "nbr": pa.array(np.concatenate(nbr)),
                "key": pa.array(np.concatenate(ci)),
                "_bucket": pa.array(
                    key_bucket(pa.array(v), num_buckets).astype(np.int32)
                ),
            }
        )

    out = (
        rd.from_arrow(pair_tbl)
        .repartition(min(len(ij), max_tasks))
        .map_batches(block_pair, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(lambda g: _knn_finish(g, k), batch_format="pandas")
    )
    return _ensure_schema(out, _KNN_SCHEMA)


def zscore_outliers(ds: rd.Dataset, k: int = 20) -> rd.Dataset:
    """Top-``k`` embedding outliers by diagonal-covariance z-score:
    z2(v) = sum_i ((v_i - mu_i) / sd_i)^2 over dimensions in ASCENDING
    index order — the cheap whitened-distance outlier screen run
    before expensive semantic dedup (vectors far from the bulk are
    encoder failures / empty inputs / corrupt rows).

    Determinism contract: coordinates quantize to micro-unit int64
    (the _embedding_covariance convention) so the per-dim moment sums
    are exact; mu/sd derive from those exact integers by one fixed
    float expression; the per-row accumulation loops dims
    left-to-right (numpy axis-sums are pairwise, NOT sequential — the
    SQL list_sum is sequential, so the loop order is load-bearing).
    Selection orders on the 6dp-rounded z2 with a vec_id tiebreak.

    Scale shape: one streaming moment pass (one 2D+1-column partial
    row per batch), mu/sd broadcast as arrays, scoring is stateless
    map_batches with per-batch partial top-k bounding the final
    sort."""
    import ray

    from ray.data.aggregate import Sum

    first = ds.take(1)[0]["embedding"]
    D = len(first)

    def moments(batch: pa.Table) -> pa.Table:
        q = np.round(_matrix(batch) * 1_000_000).astype(np.int64)
        cols = {"n": pa.array([batch.num_rows], pa.int64())}
        for i in range(D):
            cols[f"s{i}"] = pa.array([int(q[:, i].sum())], pa.int64())
            cols[f"q{i}"] = pa.array(
                [int((q[:, i] * q[:, i]).sum())], pa.int64()
            )
        return pa.table(cols)

    aggs = [Sum("n", alias_name="n")]
    for i in range(D):
        aggs.append(Sum(f"s{i}", alias_name=f"s{i}"))
        aggs.append(Sum(f"q{i}", alias_name=f"q{i}"))
    agg = ds.map_batches(moments, batch_format="pyarrow").aggregate(*aggs)
    n = int(agg["n"])
    mu = np.empty(D, np.float64)
    sd = np.empty(D, np.float64)
    for i in range(D):
        s, ss = int(agg[f"s{i}"]), int(agg[f"q{i}"])
        mu[i] = float(s) / float(n)
        sd[i] = np.sqrt(float(n * ss - s * s) / float(n * (n - 1)))
    handle = ray.put((mu, sd))

    def score(batch: pa.Table) -> pa.Table:
        mu_, sd_ = ray.get(handle)
        q = np.round(_matrix(batch) * 1_000_000).astype(np.int64)
        acc = np.zeros(batch.num_rows, np.float64)
        for i in range(D):  # sequential: matches SQL list_sum order
            d = (q[:, i].astype(np.float64) - mu_[i]) / sd_[i]
            acc = acc + d * d
        out = pa.table(
            {
                "vec_id": batch.column("vec_id"),
                "z2": pa.array(np.round(acc, 6), pa.float64()),
            }
        )
        df = (
            out.to_pandas()
            .sort_values(["z2", "vec_id"], ascending=[False, True])
            .head(k)
        )
        return pa.Table.from_pandas(
            df, preserve_index=False
        ).replace_schema_metadata(None)

    return (
        ds.map_batches(score, batch_format="pyarrow")
        .sort(["z2", "vec_id"], descending=[True, False])
        .limit(k)
    )


def kcenter_select(ds: rd.Dataset, k: int = 8) -> rd.Dataset:
    """k-center coreset selection (Gonzalez 1985 farthest-point
    greedy): start from the min vec_id, then k-1 rounds of "add the
    point farthest from its nearest chosen center" — the diversity
    coreset picker (training-data subset selection / eval-set seeding),
    the geometry-only cousin of mmr_select.

    Exactness: distances are squared L2 over micro-unit-quantized
    int64 coordinates — pure integer arithmetic, so argmax (ties by
    vec_id asc) is bit-deterministic under any layout; no float enters
    until nothing (d2 stays int64 end-to-end).

    Scale shape: k-1 streaming passes; each broadcasts the <=k chosen
    centers (tiny), computes per-batch min-distance-to-centers
    vectorized, and emits ONE candidate row per batch (the batch
    argmax) — the driver reduces batch-count rows per round."""
    import ray

    first = (
        ds.map_batches(
            lambda b: pa.table(
                {"vec_id": [int(np.asarray(b.column("vec_id")).min())]}
            ),
            batch_format="pyarrow",
        )
        .to_pandas()["vec_id"]
        .min()
    )
    c0_tbl = ds.map_batches(
        lambda b: b.filter(
            pc.equal(b.column("vec_id"), pa.scalar(int(first)))
        ),
        batch_format="pyarrow",
    ).to_pandas()
    c0 = np.round(
        np.asarray(c0_tbl["embedding"].iloc[0], np.float64) * 1_000_000
    ).astype(np.int64)

    chosen_ids = [int(first)]
    chosen_vecs = [c0]
    d2s = [0]
    for _ in range(k - 1):
        handle = ray.put(
            (np.asarray(chosen_ids, np.int64), np.stack(chosen_vecs))
        )

        def best(batch: pa.Table) -> pa.Table:
            ids_c, cents = ray.get(handle)
            ids = np.asarray(batch.column("vec_id"), np.int64)
            q = np.round(_matrix(batch) * 1_000_000).astype(np.int64)
            mind = np.full(len(ids), np.iinfo(np.int64).max)
            for c in cents:
                d = q - c[None, :]
                mind = np.minimum(mind, (d * d).sum(axis=1))
            mask = ~np.isin(ids, ids_c)
            if not mask.any():
                return pa.table(
                    {
                        "vec_id": pa.array([], pa.int64()),
                        "d2": pa.array([], pa.int64()),
                        "qv": pa.array([], pa.list_(pa.int64())),
                    }
                )
            ids, mind, q = ids[mask], mind[mask], q[mask]
            o = np.lexsort((ids, -mind))[0]
            return pa.table(
                {
                    "vec_id": pa.array([int(ids[o])], pa.int64()),
                    "d2": pa.array([int(mind[o])], pa.int64()),
                    "qv": pa.array([q[o].tolist()], pa.list_(pa.int64())),
                }
            )

        cand = ds.map_batches(best, batch_format="pyarrow").to_pandas()
        cand = cand.sort_values(
            ["d2", "vec_id"], ascending=[False, True]
        ).iloc[0]
        chosen_ids.append(int(cand["vec_id"]))
        chosen_vecs.append(np.asarray(cand["qv"], np.int64))
        d2s.append(int(cand["d2"]))

    return rd.from_arrow(
        pa.table(
            {
                "round": pa.array(range(k), pa.int64()),
                "vec_id": pa.array(chosen_ids, pa.int64()),
                "d2": pa.array(d2s, pa.int64()),
            }
        )
    )


def mutual_knn_pairs(
    ds: rd.Dataset,
    k: int = 5,
    id_col: str = "vec_id",
    chunk_rows: int = 8192,
) -> rd.Dataset:
    """Reciprocal k-NN pairs: (u, v) kept iff v is in u's exact
    cosine top-k AND u is in v's — the mutual-neighbor filter that
    turns a k-NN graph into the high-precision edge set used for
    near-dup verification and graph-based corpus clustering (a
    directed k-NN edge to a hub vector is weak evidence; a RECIPROCAL
    edge is strong).

    Rides :func:`knn_join_exact` (same chunk-pair matmul plan and
    (round-6 cosine DESC, id ASC) determinism contract), then
    canonicalizes each directed edge to (min, max) and keeps the keys
    seen from BOTH directions — one int-keyed hash-aggregate over the
    N*k directed edges, so the reciprocity check shuffles edge ids and
    counts, never vectors. Output: (u, v, cos) with u < v."""
    from vietnamese_ocr_ray.functions.agg import hash_aggregate

    knn = knn_join_exact(ds, k=k, id_col=id_col, chunk_rows=chunk_rows)

    def canon(b: pa.Table) -> pa.Table:
        a = b.column(id_col).to_numpy(zero_copy_only=False)
        n = b.column("nbr").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "u": pa.array(np.minimum(a, n)),
                "v": pa.array(np.maximum(a, n)),
                "cos": b.column("cos"),
                "cnt": pa.array(np.ones(len(a), np.int64)),
            }
        )

    agg = hash_aggregate(
        knn.map_batches(canon, batch_format="pyarrow"),
        ["u", "v"],
        {"cos": ("cos", "min"), "cnt": ("cnt", "sum")},
        num_buckets=32,
    )
    return agg.filter(expr="cnt == 2").select_columns(["u", "v", "cos"])
