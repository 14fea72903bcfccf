"""Deduplication operators — exact, MinHash+LSH, SimHash, and n-gram
Jaccard — expressed Ray-Data-first:

* exact:   vectorized 64-bit content hash -> hash-partitioned groupby
           -> per-group exact-text dedup (hash collisions are harmless
           because the final match is on the text itself).
* minhash (Broder 1997's resemblance sketch + the banding LSH of
  Indyk & Motwani 1998): shingle -> minhash signature per batch (vectorized) ->
           explode to (band, band_hash, doc_id) rows -> bucket groupby
           -> candidate pairs -> exact-Jaccard verification.
* simhash (Charikar 2002): 64-bit fingerprint per doc, vectorized bit-majority.
* n-gram Jaccard: character-set Jaccard between paired rows
  (bitmask-vectorized for ASCII), DuckDB ``jaccard()``-compatible.

At 100 TB the only all-to-all moves are the groupbys on short hash
keys; signatures/pairs are tiny compared to the corpus.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

_MERSENNE = (1 << 61) - 1

# per-worker-process MinHasher cache for tasks-mode signature stages
_MINHASHER_CACHE: dict = {}


def _utf8_flat(arr: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """(normalized offsets int64, flat uint8 bytes) of a StringArray."""
    arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
    offs = np.frombuffer(arr.buffers()[1], dtype=np.int32)[
        arr.offset : arr.offset + len(arr) + 1
    ].astype(np.int64)
    data = (
        np.frombuffer(arr.buffers()[2], dtype=np.uint8)
        if arr.buffers()[2] is not None
        else np.empty(0, np.uint8)
    )
    base = offs[0]
    return offs - base, data[base : offs[-1]]


def content_hash64(arr: pa.Array) -> np.ndarray:
    """Vectorized FNV-1a-style 64-bit hash of each string (stable
    across processes — never Python's salted hash)."""
    offs, data = _utf8_flat(arr)
    n = len(offs) - 1
    h = np.full(n, np.uint64(0xCBF29CE484222325), dtype=np.uint64)
    lens = offs[1:] - offs[:-1]
    prime = np.uint64(0x100000001B3)
    maxlen = int(lens.max()) if n else 0
    # iterate character POSITIONS (bounded by max doc length), not rows
    for i in range(maxlen):
        active = lens > i
        idx = offs[:-1][active] + i
        h[active] = (h[active] ^ data[idx].astype(np.uint64)) * prime
    return h


def dedup_exact(
    ds: rd.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int = 64,
) -> rd.Dataset:
    """Keep min(id) per distinct text + copy count. Hash-BUCKET on a
    64-bit content hash (copies of a text always share a bucket) so
    each reduce task runs ONE vectorized pandas groupby over its
    bucket — per-group Python for 100k+ distinct texts is what made
    the per-hash groupby slow. Final equality is on the text itself
    (hash collisions are harmless)."""

    def add_bucket(b: pa.Table) -> pa.Table:
        h = content_hash64(b.column(text_col))
        return b.append_column(
            "_bucket", pa.array((h % np.uint64(num_buckets)).astype(np.int32))
        )

    def first_per_text(g: pd.DataFrame) -> pa.Table:
        out = (
            g.groupby(text_col, as_index=False)
            .agg(**{id_col: (id_col, "min"), "n_copies": (id_col, "size")})
        )
        return pa.Table.from_pandas(
            out[[id_col, text_col, "n_copies"]], preserve_index=False
        ).replace_schema_metadata(None)

    return (
        ds.select_columns([id_col, text_col])
        .map_batches(add_bucket, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(first_per_text, batch_format="pandas")
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def _shingle_hashes(text_bytes: np.ndarray, k: int) -> np.ndarray:
    """All k-byte rolling window hashes of one document (vectorized)."""
    n = text_bytes.shape[0]
    if n < k:
        window = np.zeros((1, k), dtype=np.uint64)
        window[0, :n] = text_bytes
    else:
        window = np.lib.stride_tricks.sliding_window_view(text_bytes, k).astype(
            np.uint64
        )
    h = np.full(window.shape[0], np.uint64(0xCBF29CE484222325), dtype=np.uint64)
    prime = np.uint64(0x100000001B3)
    for i in range(k):
        h = (h ^ window[:, i]) * prime
    return np.unique(h)


class MinHasher:
    """Stateful per-actor signature computer: the permutation
    coefficients are generated once in __init__ (actor-pool pattern),
    not per batch. Signatures are computed for the WHOLE batch in one
    vectorized pass over the flat utf8 buffer (rolling k-byte hashes at
    every position, windows crossing row boundaries masked out,
    per-row min via ``np.minimum.reduceat``)."""

    def __init__(self, num_perm: int = 64, k: int = 8, seed: int = 7):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.k = k
        self.num_perm = num_perm
        self._buf = np.empty(0, dtype=np.uint64)  # reused across batches

    def _scratch(self, rows: int) -> np.ndarray:
        """Per-actor scratch matrix: first-touch page faulting of large
        fresh allocations measures ~6 ms/MB in this sandbox, so the
        hash matrix buffer is faulted once per actor and reused."""
        need = rows * self.num_perm
        if self._buf.shape[0] < need:
            self._buf = np.empty(int(need * 1.3), dtype=np.uint64)
            self._buf[:] = 0  # touch pages now, once
        return self._buf[:need].reshape(rows, self.num_perm)

    def signature(self, shingles: np.ndarray) -> np.ndarray:
        # (S,1)*(P,) multiply-add hashing with natural u64 wraparound
        # (a u64 modulo here costs ~200ns/element in numpy — the
        # wrapping multiply is SIMD and equally valid for minhash)
        x = shingles[:, None] * self.a[None, :] + self.b[None, :]
        return x.min(axis=0)

    # windows processed per chunk: bounds the reused scratch matrix to
    # CHUNK x num_perm x 8B (~32 MB at 64 perms) — an UNchunked pass
    # over a 500 KB text batch wants a ~300 MB hash matrix, and
    # first-touch page faulting (~6 ms/MB here) then dominates the
    # whole stage on every fresh worker
    WINDOW_CHUNK = 1 << 16

    def _batch_signatures(self, offs: np.ndarray, data: np.ndarray) -> np.ndarray:
        n = len(offs) - 1
        k = self.k
        total = data.shape[0]
        sigs = np.full(
            (n, self.num_perm), np.uint64(0xFFFFFFFFFFFFFFFF), dtype=np.uint64
        )
        if total >= k:
            nwin = total - k + 1
            prime = np.uint64(0x100000001B3)
            fnv0 = np.uint64(0xCBF29CE484222325)
            all_win = np.lib.stride_tricks.sliding_window_view(data, k)
            for c0 in range(0, nwin, self.WINDOW_CHUNK):
                c1 = min(c0 + self.WINDOW_CHUNK, nwin)
                win = all_win[c0:c1].astype(np.uint64)
                h = np.full(win.shape[0], fnv0, dtype=np.uint64)
                for i in range(k):
                    h = (h ^ win[:, i]) * prime
                x = self._scratch(win.shape[0])
                np.multiply(h[:, None], self.a[None, :], out=x)
                np.add(x, self.b[None, :], out=x)
                # mask windows crossing a row boundary: window at pos p
                # is valid for row r iff p + k <= offs[r+1]
                pos = np.arange(c0, c1)
                row = np.searchsorted(offs, pos, side="right") - 1
                valid = (pos + k) <= offs[row + 1]
                x[~valid] = np.uint64(0xFFFFFFFFFFFFFFFF)
                # rows covered by this chunk, reduced on local segment
                # starts; combined into sigs with an elementwise min
                r0, r1 = row[0], row[-1]
                starts = np.maximum(offs[r0 : r1 + 1] - c0, 0)
                starts = np.minimum(starts, win.shape[0] - 1)
                red = np.minimum.reduceat(x, starts, axis=0)
                np.minimum(sigs[r0 : r1 + 1], red, out=sigs[r0 : r1 + 1])
        longest = offs[1:] - offs[:-1]
        short = np.nonzero(longest < k)[0]
        for i in short:  # rare: rows shorter than one shingle
            sigs[i] = self.signature(
                _shingle_hashes(data[offs[i] : offs[i + 1]], k)
            )
        # rows whose reduceat segment was empty/invalid handled above;
        # rows at the buffer tail with no in-row window also fall back
        tail = np.nonzero((offs[:-1] + k) > total)[0]
        for i in tail:
            if longest[i] >= k:
                sigs[i] = self.signature(
                    _shingle_hashes(data[offs[i] : offs[i + 1]], k)
                )
        return sigs

    def __call__(self, batch: pa.Table) -> pa.Table:
        offs, data = _utf8_flat(batch.column("text"))
        sigs = self._batch_signatures(offs, data)
        flat = pa.array(sigs.reshape(-1).astype(np.int64))
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "sig": pa.FixedSizeListArray.from_arrays(flat, self.num_perm),
            }
        )


def _band_rows(batch: pa.Table, bands: int) -> pa.Table:
    """signature rows -> (band, band_hash, doc_id) rows, vectorized."""
    col = batch.column("sig")
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    p = arr.type.list_size
    sig = np.asarray(arr.values, dtype=np.int64).astype(np.uint64).reshape(-1, p)
    n = len(arr)
    r = p // bands
    view = sig.reshape(n, bands, r)
    h = np.full((n, bands), np.uint64(0xCBF29CE484222325), dtype=np.uint64)
    prime = np.uint64(0x100000001B3)
    for i in range(r):
        h = (h ^ view[:, :, i]) * prime
    doc = np.repeat(np.asarray(batch.column("doc_id")), bands)
    band = np.tile(np.arange(bands, dtype=np.int32), n)
    return pa.table(
        {
            "band": pa.array(band),
            "band_hash": pa.array(h.reshape(-1).astype(np.int64)),
            "doc_id": pa.array(doc),
        }
    )


def _bucket_pairs(g: pd.DataFrame, cap: int = 200) -> pa.Table:
    """Candidate pairs within one HASH BUCKET of band rows: one sort
    locates every exact (band, band_hash) run; only multi-member runs
    (actual collision buckets) are visited, each emitting its id pairs
    with one ``triu_indices`` — no per-pair Python appends. ``cap``
    bounds degenerate hot buckets (real skew handling = salt or raise
    bands)."""
    s = g.sort_values(["band", "band_hash", "doc_id"], kind="stable")
    band = s["band"].to_numpy()
    bh = s["band_hash"].to_numpy()
    ids = s["doc_id"].to_numpy(np.int64)
    n = ids.shape[0]
    out_a, out_b = [], []
    if n:
        change = np.ones(n, dtype=bool)
        change[1:] = (band[1:] != band[:-1]) | (bh[1:] != bh[:-1])
        starts = np.nonzero(change)[0]
        sizes = np.diff(np.append(starts, n))
        multi = sizes >= 2
        for st, m in zip(starts[multi], sizes[multi]):
            mm = int(min(m, cap))
            ii, jj = np.triu_indices(mm, 1)
            seg = ids[st : st + mm]
            out_a.append(seg[ii])
            out_b.append(seg[jj])
    a = np.concatenate(out_a) if out_a else np.empty(0, np.int64)
    b = np.concatenate(out_b) if out_b else np.empty(0, np.int64)
    return pa.table({"a": pa.array(a), "b": pa.array(b)})


def jaccard_shingles(t1: str, t2: str, k: int = 4) -> float:
    b1 = np.frombuffer(t1.encode(), dtype=np.uint8)
    b2 = np.frombuffer(t2.encode(), dtype=np.uint8)
    s1 = _shingle_hashes(b1, k)
    s2 = _shingle_hashes(b2, k)
    inter = np.intersect1d(s1, s2, assume_unique=True).shape[0]
    union = s1.shape[0] + s2.shape[0] - inter
    return inter / union if union else 1.0


def minhash_lsh_pairs(
    ds: rd.Dataset,
    *,
    num_perm: int = 64,
    bands: int = 16,
    k: int = 8,
    threshold: float = 0.6,
    texts_handle=None,
) -> rd.Dataset:
    """Near-duplicate pairs: signature -> band buckets -> candidates ->
    exact shingle-Jaccard verification against ``threshold``.

    Verification modes:

    * ``texts_handle`` = ray.put({doc_id: text}): broadcast lookup —
      right while the corpus text fits a worker heap (test scale).
    * ``texts_handle=None`` (the 100 TB path): candidates are joined
      BACK to the corpus twice on doc_id (hash joins on the tiny
      candidate set), so no broadcast-texts assumption exists; only
      candidate rows ever carry text through the exchange."""
    import ray

    # tasks mode with a per-worker-process cached MinHasher: the
    # coefficients/scratch still build once per process (the actor-pool
    # benefit) but execution pays no pool spin-up and the streaming
    # executor can rebalance CPUs across the downstream sort barriers
    # (same finding as the recognize stage, bench.py).
    def sigs_fn(batch: pa.Table) -> pa.Table:
        key = (num_perm, k)
        mh = _MINHASHER_CACHE.get(key)
        if mh is None:
            mh = _MINHASHER_CACHE[key] = MinHasher(num_perm=num_perm, k=k)
        return mh(batch)

    sigs = ds.select_columns(["doc_id", "text"]).map_batches(
        sigs_fn,
        batch_format="pyarrow",
        batch_size=1024,  # bounds the per-process scratch matrix
    )
    num_coarse = 32  # coarse hash buckets: bounds map_groups call count
    band_rows = sigs.map_batches(
        lambda b: _band_rows(b, bands), batch_format="pyarrow"
    ).map_batches(
        lambda b: b.append_column(
            "bucket",
            pa.array(
                (
                    np.asarray(b.column("band_hash")).astype(np.uint64)
                    % np.uint64(num_coarse)
                ).astype(np.int32)
            ),
        ),
        batch_format="pyarrow",
    )
    candidates = band_rows.groupby("bucket").map_groups(
        lambda g: _bucket_pairs(g.drop(columns=["bucket"])),
        batch_format="pandas",
    )

    # distinct pairs (a pair can surface from several bands): bucket on
    # the first id, drop duplicates vectorized per bucket
    distinct = (
        candidates.map_batches(
            lambda b: b.append_column(
                "bucket",
                pa.array(
                    (np.asarray(b.column("a")).astype(np.int64) % num_coarse).astype(
                        np.int32
                    )
                ),
            ),
            batch_format="pyarrow",
        )
        .groupby("bucket")
        .map_groups(
            lambda g: pa.Table.from_pandas(
                g.drop(columns=["bucket"]).drop_duplicates(["a", "b"]),
                preserve_index=False,
            ).replace_schema_metadata(None),
            batch_format="pandas",
        )
    )

    _verify_rows = _verify_rows_factory(k, threshold)

    if texts_handle is not None:

        def verify(batch: pa.Table) -> pa.Table:
            texts = ray.get(texts_handle)
            ta = pa.array(
                [texts[a] for a in batch.column("a").to_pylist()], pa.string()
            )
            tb = pa.array(
                [texts[b] for b in batch.column("b").to_pylist()], pa.string()
            )
            return _verify_rows(batch, ta, tb)

        return distinct.map_batches(verify, batch_format="pyarrow")

    return verify_pairs_corpus(
        distinct, ds, k=k, threshold=threshold, num_coarse=num_coarse
    )


def _verify_rows_factory(k: int, threshold: float):
    """Batch verifier: exact shingle-set Jaccard for candidate (a, b)
    pairs, rounded to 6dp BEFORE thresholding (the SQL-replayable
    contract shared with the minhash/ssjoin oracles)."""

    def _verify_rows(
        batch: pa.Table, texts_a: pa.Array, texts_b: pa.Array
    ) -> pa.Table:
        # one vectorized pass for ALL candidate pairs of the batch
        j = np.round(jaccard_shingles_batch(texts_a, texts_b, k), 6)
        hit = j >= threshold
        filtered = batch.filter(pa.array(hit))
        return pa.table(
            {
                "a": filtered.column("a"),
                "b": filtered.column("b"),
                "jaccard": pa.array(j[hit], pa.float64()),
            }
        )

    return _verify_rows


def verify_pairs_corpus(
    distinct: rd.Dataset,
    ds: rd.Dataset,
    *,
    k: int = 8,
    threshold: float = 0.6,
    num_coarse: int = 32,
    verify_rows=None,
) -> rd.Dataset:
    """Exact shingle-Jaccard verification of candidate ``(a, b)`` pairs
    against the corpus — the 100 TB verification path shared by
    :func:`minhash_lsh_pairs` (LSH candidates) and :func:`ssjoin_pairs`
    (prefix-filter candidates).

    Shape: bucketed cogroup (Dataset.join's hash-join aggregator actors
    cost ~60-90us/row + pool spin-up on this Ray version — see
    stages/cogroup.py): shuffle 1 attaches text to each pair ROLE
    (a-side / b-side) with one key-bucket groupby of candidates u
    corpus; shuffle 2 reunites the two roles per pair and verifies.
    Both shuffles move candidate-sized data plus the corpus text once."""
    from vietnamese_ocr_ray.functions.joins import key_bucket

    _verify_rows = verify_rows or _verify_rows_factory(k, threshold)
    docs = ds.select_columns(["doc_id", "text"])

    def cand_roles(b: pa.Table) -> pa.Table:
        a = pc.cast(b.column("a").combine_chunks() if isinstance(
            b.column("a"), pa.ChunkedArray) else b.column("a"), pa.int64())
        bb = pc.cast(b.column("b").combine_chunks() if isinstance(
            b.column("b"), pa.ChunkedArray) else b.column("b"), pa.int64())
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
                "text": pa.nulls(2 * n, pa.string()),
                "_bucket": pa.array(
                    key_bucket(key, num_coarse).astype(np.int32)
                ),
            }
        )

    def corpus_rows(b: pa.Table) -> pa.Table:
        key = pc.cast(b.column("doc_id").combine_chunks() if isinstance(
            b.column("doc_id"), pa.ChunkedArray) else b.column("doc_id"),
            pa.int64())
        n = b.num_rows
        return pa.table(
            {
                "key": key,
                "pair_a": pa.nulls(n, pa.int64()),
                "pair_b": pa.nulls(n, pa.int64()),
                "role": pa.array(np.full(n, -1, np.int8)),
                "text": b.column("text"),
                "_bucket": pa.array(
                    key_bucket(key, num_coarse).astype(np.int32)
                ),
            }
        )

    def attach_text(g: pd.DataFrame) -> pa.Table:
        cand = g[g["role"] >= 0]
        corp = g[g["role"] < 0][["key", "text"]]
        m = cand[["key", "pair_a", "pair_b", "role"]].merge(
            corp, on="key", how="inner"
        )
        return pa.table(
            {
                "pair_a": pa.array(m["pair_a"].to_numpy(np.int64)),
                "pair_b": pa.array(m["pair_b"].to_numpy(np.int64)),
                "role": pa.array(m["role"].to_numpy(np.int8)),
                "text": pa.array(m["text"].to_numpy(), pa.string()),
                "_bucket": pa.array(
                    key_bucket(
                        pa.array(m["pair_a"].to_numpy(np.int64)), num_coarse
                    ).astype(np.int32)
                ),
            }
        )

    def verify_bucket(g: pd.DataFrame) -> pa.Table:
        ta = g[g["role"] == 0][["pair_a", "pair_b", "text"]].rename(
            columns={"text": "text_a"}
        )
        tb = g[g["role"] == 1][["pair_a", "pair_b", "text"]].rename(
            columns={"text": "text_b"}
        )
        m = ta.merge(tb, on=["pair_a", "pair_b"], how="inner")
        batch = pa.table(
            {
                "a": pa.array(m["pair_a"].to_numpy(np.int64)),
                "b": pa.array(m["pair_b"].to_numpy(np.int64)),
            }
        )
        return _verify_rows(
            batch,
            pa.array(m["text_a"].to_numpy(), pa.string()),
            pa.array(m["text_b"].to_numpy(), pa.string()),
        )

    with_text = (
        distinct.map_batches(cand_roles, batch_format="pyarrow")
        .union(docs.map_batches(corpus_rows, batch_format="pyarrow"))
        .groupby("_bucket")
        .map_groups(
            lambda g: attach_text(g.drop(columns=["_bucket"])),
            batch_format="pandas",
        )
    )
    return with_text.groupby("_bucket").map_groups(
        lambda g: verify_bucket(g.drop(columns=["_bucket"])),
        batch_format="pandas",
    )


def _rank_pairs(g: pd.DataFrame) -> pa.Table:
    """Candidate pairs within one hash bucket of PREFIX rows: one sort
    locates every exact rank run (docs indexing the same prefix
    element); each multi-member run emits its id pairs with one
    ``triu_indices`` plus the AllPairs length filter (a pair can only
    reach Jaccard t when ``min_size >= t_eff * max_size``). Uncapped —
    completeness is the point of the exact join; rarity ordering keeps
    prefix posting lists short (a hot run means a COMMON element sat in
    someone's prefix, which rarity ordering makes rare)."""
    s = g.sort_values(["rnk", "doc_id"], kind="stable")
    rnk = s["rnk"].to_numpy(np.int64)
    ids = s["doc_id"].to_numpy(np.int64)
    sz = s["size"].to_numpy(np.int64)
    t_eff = float(s["t_eff"].iloc[0]) if len(s) else 0.0
    n = ids.shape[0]
    out_a, out_b = [], []
    if n:
        change = np.ones(n, dtype=bool)
        change[1:] = rnk[1:] != rnk[:-1]
        starts = np.nonzero(change)[0]
        sizes = np.diff(np.append(starts, n))
        multi = sizes >= 2
        for st, m in zip(starts[multi], sizes[multi]):
            ii, jj = np.triu_indices(int(m), 1)
            seg_id = ids[st : st + m]
            seg_sz = sz[st : st + m]
            lo = np.minimum(seg_sz[ii], seg_sz[jj])
            hi = np.maximum(seg_sz[ii], seg_sz[jj])
            keep = lo >= t_eff * hi
            out_a.append(seg_id[ii][keep])
            out_b.append(seg_id[jj][keep])
    a = np.concatenate(out_a) if out_a else np.empty(0, np.int64)
    b = np.concatenate(out_b) if out_b else np.empty(0, np.int64)
    return pa.table({"a": pa.array(a), "b": pa.array(b)})


def ssjoin_pairs(
    ds: rd.Dataset,
    *,
    k: int = 8,
    threshold: float = 0.6,
    num_coarse: int = 32,
) -> rd.Dataset:
    """EXACT set-similarity self-join (Bayardo 2007 AllPairs / Xiao
    2008 PPJoin prefix filtering): every doc pair ``(a < b)`` whose
    k-byte shingle-set Jaccard >= ``threshold`` — the exact, COMPLETE
    counterpart of :func:`minhash_lsh_pairs` (same shingle universe,
    same 6dp-rounded verification, no LSH miss probability).

    Prefix filtering: elements are ordered globally by rarity
    (ascending document frequency, hash tiebreak); a doc of set size s
    indexes only its first ``p = s - ceil(t_eff*s) + 1`` elements. If
    ``J(A,B) >= t`` then ``|A∩B| >= t*max(|A|,|B|)`` (via the length
    filter ``|A| >= t*|B|``), so the two prefixes must share an
    element — pairing docs inside each indexed element's posting list
    is complete. ``t_eff = threshold - 1e-6`` absorbs both float
    rounding in ``ceil`` and the 6dp round-before-threshold contract.

    Scale shape: ONE vocabulary-bounded df aggregate collected to the
    driver for the rarity rank LUT (same contract as tfidf/chi2/bpe —
    at open-vocabulary scale swap rarity order for hash order, which
    needs no df pass at the cost of longer posting lists), then prefix
    rows ride one int-only rank-bucket shuffle, pairs dedupe on one
    candidate-sized shuffle, and verification is the shared
    :func:`verify_pairs_corpus` cogroup (corpus text moves once).
    Reference parity: beyond-reference op (the reference engine has no
    joins); semantics follow the published AllPairs/PPJoin algorithm.
    """
    import ray

    t_eff = threshold - 1e-6
    docs = ds.select_columns(["doc_id", "text"])

    # ---- pass 1: element document frequencies -> rarity rank LUT ----
    def df_partial(b: pa.Table) -> pa.Table:
        _, hs = _unique_shingles(*_utf8_flat(b.column("text")), k)
        u, c = np.unique(hs, return_counts=True)
        return pa.table(
            {"h": pa.array(u.astype(np.int64)), "df": pa.array(c)}
        )

    from vietnamese_ocr_ray.functions.agg import hash_aggregate
    from vietnamese_ocr_ray.functions.joins import key_bucket

    df_pd = hash_aggregate(
        docs.map_batches(df_partial, batch_format="pyarrow"),
        ["h"],
        {"df": ("df", "sum")},
    ).to_pandas()  # element-vocabulary-bounded (see docstring contract)
    h_arr = df_pd["h"].to_numpy(np.int64).astype(np.uint64)
    df_arr = df_pd["df"].to_numpy(np.int64)
    order = np.lexsort((h_arr, df_arr))  # rank: ascending (df, hash)
    h_by_rank = h_arr[order]
    h_sorted = np.sort(h_arr)
    # rank_of[i] = rank of h_sorted[i]
    rank_of = np.empty(len(h_arr), np.int64)
    rank_of[np.searchsorted(h_sorted, h_by_rank)] = np.arange(len(h_arr))
    lut = ray.put((h_sorted, rank_of))

    # ---- pass 2: per-doc prefix rows (rank, doc_id, size) ----
    def prefix_rows(b: pa.Table) -> pa.Table:
        h_sorted_, rank_of_ = ray.get(lut)
        rows, hs = _unique_shingles(*_utf8_flat(b.column("text")), k)
        ranks = rank_of_[np.searchsorted(h_sorted_, hs)]
        o = np.lexsort((ranks, rows))
        rows, ranks = rows[o], ranks[o]
        n = b.num_rows
        sizes = np.bincount(rows, minlength=n)
        starts = np.cumsum(sizes) - sizes
        pos = np.arange(rows.shape[0]) - np.repeat(starts, sizes)
        p = sizes - np.ceil(t_eff * sizes).astype(np.int64) + 1
        mask = pos < np.repeat(p, sizes)
        ids = np.asarray(b.column("doc_id"), dtype=np.int64)
        rnk = ranks[mask]
        return pa.table(
            {
                "rnk": pa.array(rnk),
                "doc_id": pa.array(ids[rows[mask]]),
                "size": pa.array(np.repeat(sizes, sizes)[mask]),
                "t_eff": pa.array(np.full(rnk.shape[0], t_eff)),
                "bucket": pa.array(
                    key_bucket(pa.array(rnk), num_coarse).astype(np.int32)
                ),
            }
        )

    candidates = (
        docs.map_batches(prefix_rows, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(
            lambda g: _rank_pairs(g.drop(columns=["bucket"])),
            batch_format="pandas",
        )
    )

    # distinct pairs (a pair can share several prefix elements)
    distinct = (
        candidates.map_batches(
            lambda b: b.append_column(
                "bucket",
                pa.array(
                    (
                        np.asarray(b.column("a")).astype(np.int64) % num_coarse
                    ).astype(np.int32)
                ),
            ),
            batch_format="pyarrow",
        )
        .groupby("bucket")
        .map_groups(
            lambda g: pa.Table.from_pandas(
                g.drop(columns=["bucket"]).drop_duplicates(["a", "b"]),
                preserve_index=False,
            ).replace_schema_metadata(None),
            batch_format="pandas",
        )
    )
    return verify_pairs_corpus(
        distinct, ds, k=k, threshold=threshold, num_coarse=num_coarse
    )


def connected_components(
    pairs: rd.Dataset,
    max_rounds: int | None = None,
    broadcast: bool = True,
    num_buckets: int = 32,
) -> rd.Dataset:
    """Distributed connected components over an edge list (a, b) by
    iterated min-label propagation — each round joins every node's
    current label with its neighbors' and keeps the min, until a fixed
    point.

    ``broadcast=True`` (default): the label table is shipped whole to
    workers each round — right while the dup-graph node set fits a
    worker heap; each round additionally path-compresses the label
    table driver-side (a label IS a node id, so label-of-label chains
    collapse), making observed rounds ~O(log diameter).
    ``broadcast=False``: fully-shuffled rounds (bucketed label join +
    bucketed min aggregate) — nothing but a change count ever leaves
    the cluster; the 10^12-edge path; pointer-jump compression between
    propagate rounds keeps total rounds ~O(log diameter) there too.

    ``max_rounds=None`` (default) runs to the fixed point (safety cap
    = node count + 1 — a bounded cap below the diameter silently
    mislabels long chain components; that bug shipped once, caught by
    an sf0.1 oracle check). Returns (node, component) with component =
    min node id of the cluster."""

    edges = pairs.select_columns(["a", "b"])

    def undirected(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": pa.concat_arrays(
                    [
                        b.column("a").combine_chunks().cast(pa.int64()),
                        b.column("b").combine_chunks().cast(pa.int64()),
                    ]
                ),
                "nbr": pa.concat_arrays(
                    [
                        b.column("b").combine_chunks().cast(pa.int64()),
                        b.column("a").combine_chunks().cast(pa.int64()),
                    ]
                ),
            }
        )

    adj = edges.map_batches(undirected, batch_format="pyarrow").materialize()
    if adj.count() == 0:  # empty dup graph: no rows, stable schema
        return rd.from_arrow(
            pa.table(
                {
                    "node": pa.array([], pa.int64()),
                    "component": pa.array([], pa.int64()),
                }
            )
        )

    # labels: start as self — distinct nodes via the bucketed hash
    # aggregate (min(node) per node == node), never per-node Python
    from vietnamese_ocr_ray.functions.agg import hash_aggregate

    labels = hash_aggregate(
        adj.select_columns(["node"]), ["node"], {"label": ("node", "min")}
    ).materialize()

    rounds = (
        max_rounds if max_rounds is not None else labels.count() + 1
    )
    if broadcast:
        labels = _cc_rounds_broadcast(adj, labels, rounds)
    else:
        labels = _cc_rounds_shuffled(adj, labels, rounds, num_buckets)

    return labels.map_batches(
        lambda b: pa.table(
            {"node": b.column("node"), "component": b.column("label")}
        ),
        batch_format="pyarrow",
    )


def _cc_rounds_broadcast(adj, labels, max_rounds):
    """Per round: ship the (small) label table once via ray.put, look
    neighbors up with a vectorized searchsorted, and pre-reduce the
    per-node min INSIDE each map task (one partial row per node per
    block) — the tiny partials merge on the driver, where the label
    table already lives in broadcast mode, so a round is ONE Ray op
    instead of a map + a sort-aggregate shuffle. Right while the dup
    graph's node set fits a worker heap."""
    import ray

    lab_pd = labels.to_pandas()
    order = np.argsort(lab_pd["node"].to_numpy())
    keys = lab_pd["node"].to_numpy()[order]
    vals = lab_pd["label"].to_numpy()[order].copy()

    for _ in range(max_rounds):
        handle = ray.put((keys, vals))

        def propagate(b: pa.Table) -> pa.Table:
            k, v = ray.get(handle)
            node = np.asarray(b.column("node"))
            nbr = np.asarray(b.column("nbr"))
            nbr_lab = v[np.searchsorted(k, nbr)]
            # per-block partial min per node (sorted-run reduce)
            o = np.argsort(node, kind="stable")
            node_s, lab_s = node[o], nbr_lab[o]
            change = np.ones(node_s.shape[0], dtype=bool)
            change[1:] = node_s[1:] != node_s[:-1]
            starts = np.nonzero(change)[0]
            mins = np.minimum.reduceat(lab_s, starts)
            return pa.table(
                {"node": pa.array(node_s[starts]), "cand": pa.array(mins)}
            )

        parts = (
            adj.map_batches(propagate, batch_format="pyarrow").to_pandas()
        )  # O(nodes x blocks) rows — label-table scale, driver-resident
        nbr_min = parts.groupby("node", sort=False)["cand"].min()
        pos = np.searchsorted(keys, nbr_min.index.to_numpy())
        new_vals = vals.copy()
        np.minimum.at(new_vals, pos, nbr_min.to_numpy())
        # driver-side path compression: labels are node ids, so
        # label-of-label lookups collapse chains — turns O(diameter)
        # graph rounds into ~O(log diameter)
        while True:
            comp = np.minimum(
                new_vals, new_vals[np.searchsorted(keys, new_vals)]
            )
            if np.array_equal(comp, new_vals):
                break
            new_vals = comp
        if np.array_equal(new_vals, vals):
            break
        vals = new_vals
    return rd.from_arrow(
        pa.table({"node": pa.array(keys), "label": pa.array(vals)})
    )


def _cc_rounds_shuffled(adj, labels, max_rounds, num_buckets):
    """Fully-shuffled rounds — the 10^12-edge path where even the label
    table exceeds a worker heap: neighbor labels come from a bucketed
    join (labels keyed by node meet adj keyed by nbr), the per-node min
    from the bucketed hash aggregate. Only a per-round change COUNT
    reaches the driver.

    Between edge-propagate rounds the label table pointer-jumps against
    itself (label := min(label, label-of-label), one bucketed cogroup
    per jump — labels ARE node ids, so the chase stays in-component),
    which squares the reach per jump and makes total rounds
    ~O(log diameter) instead of O(diameter) — the standard hash-to-min
    acceleration (Rastogi et al., "Finding Connected Components in
    MapReduce"); a chain component of diameter 10^6 converges in ~40
    shuffles, not 10^6."""
    from vietnamese_ocr_ray.functions.agg import hash_aggregate
    from vietnamese_ocr_ray.functions.joins import key_bucket

    def _tag(key_col: pa.Array, payload: dict, side: int, n: int) -> pa.Table:
        cols = {"key": key_col}
        cols.update(payload)
        cols["_side"] = pa.array(np.full(n, side, np.int8))
        cols["_bucket"] = pa.array(
            key_bucket(key_col, num_buckets).astype(np.int32)
        )
        return pa.table(cols)

    def _pointer_jump(labels):
        """label := min(label, label[label]) to fixpoint; one bucketed
        cogroup shuffle per jump, change COUNT only to the driver."""
        while True:
            labels = labels.materialize()
            # side 0 keyed by the node's LABEL (carrying node + label),
            # side 1 keyed by node (carrying that node's label) — the
            # inner merge hands every node its label's label.
            by_label = labels.map_batches(
                lambda b: _tag(
                    b.column("label").combine_chunks(),
                    {
                        "node": b.column("node"),
                        "label": b.column("label"),
                        "lab2": pa.nulls(b.num_rows, pa.int64()),
                    },
                    0,
                    b.num_rows,
                ),
                batch_format="pyarrow",
            )
            by_node = labels.map_batches(
                lambda b: _tag(
                    b.column("node").combine_chunks(),
                    {
                        "node": pa.nulls(b.num_rows, pa.int64()),
                        "label": pa.nulls(b.num_rows, pa.int64()),
                        "lab2": b.column("label"),
                    },
                    1,
                    b.num_rows,
                ),
                batch_format="pyarrow",
            )

            def jump(g: pd.DataFrame) -> pd.DataFrame:
                left = g[g["_side"] == 0][["key", "node", "label"]]
                right = g[g["_side"] == 1][["key", "lab2"]]
                m = left.merge(right, on="key", how="inner")
                old = m["label"].to_numpy(np.int64)
                new = np.minimum(old, m["lab2"].to_numpy(np.int64))
                return pd.DataFrame(
                    {
                        "node": m["node"].to_numpy(np.int64),
                        "label": new,
                        "changed": (new != old).astype(np.int64),
                    }
                )

            jumped = (
                by_label.union(by_node)
                .groupby("_bucket")
                .map_groups(jump, batch_format="pandas")
                .materialize()
            )
            changed = jumped.sum("changed")
            labels = jumped.select_columns(["node", "label"])
            if not changed:
                return labels

    for _ in range(max_rounds):
        labels = labels.materialize()

        adj_tagged = adj.map_batches(
            lambda b: _tag(
                b.column("nbr").combine_chunks(),
                {
                    "node": b.column("node"),
                    "label": pa.nulls(b.num_rows, pa.int64()),
                },
                0,
                b.num_rows,
            ),
            batch_format="pyarrow",
        )
        lab_tagged = labels.map_batches(
            lambda b: _tag(
                b.column("node").combine_chunks(),
                {
                    "node": pa.nulls(b.num_rows, pa.int64()),
                    "label": b.column("label"),
                },
                1,
                b.num_rows,
            ),
            batch_format="pyarrow",
        )

        def lookup(g: pd.DataFrame) -> pd.DataFrame:
            left = g[g["_side"] == 0]
            right = g[g["_side"] == 1]
            m = left[["node", "key"]].merge(
                right[["key", "label"]], on="key", how="inner"
            )
            # null-padding floats int columns in the union; recast now
            # that only matched rows remain
            return pd.DataFrame(
                {
                    "node": m["node"].to_numpy(np.int64),
                    "cand": m["label"].to_numpy(np.int64),
                }
            )

        cand = (
            adj_tagged.union(lab_tagged)
            .groupby("_bucket")
            .map_groups(lookup, batch_format="pandas")
        )
        nbr_min = hash_aggregate(
            cand, ["node"], {"nbr_min": ("cand", "min")}, num_buckets=num_buckets
        )

        m_tagged = nbr_min.map_batches(
            lambda b: _tag(
                b.column("node").combine_chunks(),
                {
                    "nbr_min": b.column("nbr_min"),
                    "label": pa.nulls(b.num_rows, pa.int64()),
                },
                0,
                b.num_rows,
            ),
            batch_format="pyarrow",
        )
        l_tagged = labels.map_batches(
            lambda b: _tag(
                b.column("node").combine_chunks(),
                {
                    "nbr_min": pa.nulls(b.num_rows, pa.int64()),
                    "label": b.column("label"),
                },
                1,
                b.num_rows,
            ),
            batch_format="pyarrow",
        )

        def update(g: pd.DataFrame) -> pd.DataFrame:
            left = g[g["_side"] == 0][["key", "nbr_min"]]
            right = g[g["_side"] == 1][["key", "label"]]
            m = left.merge(right, on="key", how="inner")
            new = np.minimum(
                m["nbr_min"].to_numpy(np.int64), m["label"].to_numpy(np.int64)
            )
            return pd.DataFrame(
                {
                    "node": m["key"].to_numpy(np.int64),
                    "label": new,
                    "changed": (new != m["label"].to_numpy(np.int64)).astype(
                        np.int64
                    ),
                }
            )

        merged = (
            m_tagged.union(l_tagged)
            .groupby("_bucket")
            .map_groups(update, batch_format="pandas")
            .materialize()
        )
        changed = merged.sum("changed")
        labels = merged.select_columns(["node", "label"])
        if not changed:
            break
        labels = _pointer_jump(labels)
    return labels


def neardup_survivors(
    ds: rd.Dataset,
    pairs: rd.Dataset,
    id_col: str = "doc_id",
    cc_broadcast: bool = True,
) -> rd.Dataset:
    """Near-duplicate REMOVAL: cluster the verified pairs by connected
    components and keep min(id) per cluster; every other member is
    dropped from ``ds`` via a broadcast anti-join (the dropped-id set is
    tiny relative to the corpus — pairs ~ duplicates, not rows).

    Components come from the DISTRIBUTED :func:`connected_components`
    (min-label propagation rounds — broadcast label table by default,
    ``cc_broadcast=False`` for the fully-shuffled 10^12-edge variant);
    only the final drop-id SET reaches the driver, and it is bounded by
    the duplicate count, not the corpus. The filter is one vectorized
    ``np.isin`` per batch against the broadcast sorted drop array."""
    import ray

    comps = connected_components(pairs, broadcast=cc_broadcast)
    drop_tbl = comps.map_batches(
        lambda b: b.filter(
            pc.not_equal(b.column("node"), b.column("component"))
        ).select(["node"]),
        batch_format="pyarrow",
    ).to_pandas()  # small: one row per DROPPED duplicate
    if len(drop_tbl) == 0 or "node" not in drop_tbl.columns:
        # zero near-dups: fully-empty Datasets can lose their schema at
        # to_pandas(), so the column probe must come before the access
        return ds
    drop_ids = np.sort(drop_tbl["node"].to_numpy(np.int64))
    handle = ray.put(drop_ids)

    def keep(batch: pa.Table) -> pa.Table:
        dropped = ray.get(handle)
        ids = np.asarray(
            pc.cast(
                batch.column(id_col).combine_chunks()
                if isinstance(batch.column(id_col), pa.ChunkedArray)
                else batch.column(id_col),
                pa.int64(),
            )
        )
        return batch.filter(pa.array(~np.isin(ids, dropped)))

    return ds.map_batches(keep, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def _unique_shingles(
    offs: np.ndarray, data: np.ndarray, k: int
) -> tuple[np.ndarray, np.ndarray]:
    """Per-row UNIQUE k-byte shingle hashes for a whole flat utf8
    buffer at once: one rolling FNV pass over every window position,
    windows crossing row boundaries masked, rows shorter than one
    shingle zero-padded (matching :func:`_shingle_hashes`), per-row
    uniqueness via one lexsort. Returns (rows, hashes) sorted by
    (row, hash) — no per-row Python."""
    n = len(offs) - 1
    lens = offs[1:] - offs[:-1]
    prime = np.uint64(0x100000001B3)
    fnv0 = np.uint64(0xCBF29CE484222325)

    rows_parts, hash_parts = [], []
    if data.shape[0] >= k:
        win = np.lib.stride_tricks.sliding_window_view(data, k).astype(np.uint64)
        h = np.full(win.shape[0], fnv0, dtype=np.uint64)
        for i in range(k):
            h = (h ^ win[:, i]) * prime
        pos = np.arange(win.shape[0])
        row = np.searchsorted(offs, pos, side="right") - 1
        valid = (pos + k) <= offs[row + 1]
        rows_parts.append(row[valid])
        hash_parts.append(h[valid])
    short = np.nonzero(lens < k)[0]
    if short.size:
        # rows shorter than one shingle: single zero-padded window each
        padded = np.zeros((short.size, k), dtype=np.uint64)
        for j in range(k):
            take = lens[short] > j
            padded[take, j] = data[offs[short][take] + j]
        h = np.full(short.size, fnv0, dtype=np.uint64)
        for j in range(k):
            h = (h ^ padded[:, j]) * prime
        rows_parts.append(short)
        hash_parts.append(h)
    rows = np.concatenate(rows_parts) if rows_parts else np.empty(0, np.int64)
    hs = np.concatenate(hash_parts) if hash_parts else np.empty(0, np.uint64)

    order = np.lexsort((hs, rows))
    rows, hs = rows[order], hs[order]
    keep = np.ones(rows.shape[0], dtype=bool)
    keep[1:] = (rows[1:] != rows[:-1]) | (hs[1:] != hs[:-1])
    return rows[keep], hs[keep]


def _paired_set_jaccard(
    ra: np.ndarray, ha: np.ndarray, rb: np.ndarray, hb: np.ndarray, n: int
) -> np.ndarray:
    """Per-row set Jaccard from (row, hash) memberships that are UNIQUE
    within each side: a (row, hash) group appearing on both sides marks
    one intersection hit."""
    ca = np.bincount(ra, minlength=n)
    cb = np.bincount(rb, minlength=n)
    rows = np.concatenate([ra, rb])
    hs = np.concatenate([ha, hb])
    order = np.lexsort((hs, rows))
    r2, h2 = rows[order], hs[order]
    dup = np.zeros(r2.shape[0], dtype=bool)
    dup[1:] = (r2[1:] == r2[:-1]) & (h2[1:] == h2[:-1])
    inter = np.bincount(r2[dup], minlength=n)
    union = ca + cb - inter
    return np.where(union > 0, inter / np.maximum(union, 1), 1.0)


def jaccard_shingles_batch(
    a_arr: pa.Array, b_arr: pa.Array, k: int = 4
) -> np.ndarray:
    """Exact shingle-set Jaccard for N (a, b) text pairs in ONE
    vectorized pass (same semantics as per-pair
    :func:`jaccard_shingles`): unique shingles per row on both sides,
    then intersections counted by detecting (row, hash) runs that
    appear on both sides of the union."""
    a_arr = a_arr.combine_chunks() if isinstance(a_arr, pa.ChunkedArray) else a_arr
    b_arr = b_arr.combine_chunks() if isinstance(b_arr, pa.ChunkedArray) else b_arr
    n = len(a_arr)
    ra, ha = _unique_shingles(*_utf8_flat(a_arr), k)
    rb, hb = _unique_shingles(*_utf8_flat(b_arr), k)
    return _paired_set_jaccard(ra, ha, rb, hb, n)


def _unique_token_hashes(col) -> tuple[np.ndarray, np.ndarray]:
    """(rows, hashes) of the DISTINCT space-split tokens of each row —
    64-bit content hashes (collision odds ~2^-64 per token pair; a
    collision would merge two distinct tokens, same tradeoff as any
    hashed set-similarity) via one vectorized pass."""
    col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    toks_list = pc.split_pattern(col, " ")
    flat = pc.list_flatten(toks_list)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    ntok = pc.list_value_length(toks_list).to_numpy(zero_copy_only=False)
    h = content_hash64(flat)
    rows = np.repeat(np.arange(len(col), dtype=np.int64), ntok)
    order = np.lexsort((h, rows))
    rows, h = rows[order], h[order]
    keep = np.ones(rows.shape[0], dtype=bool)
    keep[1:] = (rows[1:] != rows[:-1]) | (h[1:] != h[:-1])
    return rows[keep], h[keep]


def word_jaccard_batch(a_arr: pa.Array, b_arr: pa.Array) -> np.ndarray:
    """Word-SET Jaccard for N (a, b) text pairs, fully vectorized (the
    hashed twin of python ``set(a.split()) & set(b.split())``)."""
    n = len(a_arr)
    ra, ha = _unique_token_hashes(a_arr)
    rb, hb = _unique_token_hashes(b_arr)
    return _paired_set_jaccard(ra, ha, rb, hb, n)


def simhash_fps(col: pa.Array, k: int = 4) -> np.ndarray:
    """uint64 SimHash fingerprints for a whole text column (Charikar
    2002): per-bit weighted majority over UNIQUE k-byte shingle hashes
    (see :func:`_unique_shingles`), per-row bit sums via
    ``np.add.reduceat`` — no per-row Python anywhere."""
    offs, data = _utf8_flat(
        col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    )
    n = len(offs) - 1
    rows, hs = _unique_shingles(offs, data, k)

    fps = np.zeros(n, dtype=np.uint64)
    if rows.size:
        # One C unpack (LSB-first byte view) beats the 64-way
        # shift-broadcast 2x, and int32 halves the reduceat traffic vs
        # int64 — bit counts per row are far below 2^31.
        bits = np.unpackbits(
            hs[:, None].astype("<u8", copy=False).view(np.uint8),
            axis=1,
            bitorder="little",
        ).astype(np.int32)
        starts = np.searchsorted(rows, np.arange(n))
        counts = np.diff(np.concatenate([starts, [rows.shape[0]]]))
        ones = np.add.reduceat(bits, np.minimum(starts, rows.shape[0] - 1), axis=0)
        ones[counts == 0] = 0
        votes = 2 * ones - counts[:, None].astype(np.int32)
        weights = np.uint64(1) << np.arange(64, dtype=np.uint64)
        fps = ((votes > 0).astype(np.uint64) * weights[None, :]).sum(axis=1)
    return fps


def simhash_batch(batch: pa.Table, k: int = 4) -> pa.Table:
    """Hex-rendered :func:`simhash_fps` per doc (one hexlify)."""
    import binascii

    fps = simhash_fps(batch.column("text"), k)
    hex_flat = binascii.hexlify(fps.astype(">u8").tobytes())
    out = np.frombuffer(hex_flat, dtype="S16").astype("U16")
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "simhash": pa.array(out, pa.string()),
        }
    )


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized popcount of a uint64 array (bit-slab unpack)."""
    v = x.copy()
    pop = np.zeros_like(v, dtype=np.int64)
    while True:
        nz = v != 0
        if not nz.any():
            return pop
        pop[nz] += 1
        v = v & (v - np.uint64(1))


def simhash_pairs(
    ds: rd.Dataset,
    max_hamming: int = 3,
    *,
    bands: int = 4,
    k: int = 4,
    num_coarse: int = 32,
    cap: int | None = 200,
    fp_col: str | None = None,
    id_col: str = "doc_id",
) -> rd.Dataset:
    """SimHash near-duplicate pairs (Manku, Jain & Sarma 2007): two
    64-bit fingerprints within Hamming distance ``max_hamming`` must
    agree EXACTLY on at least one of ``bands`` 16-bit chunks whenever
    max_hamming < bands (pigeonhole) — so banding finds ALL such pairs,
    not a sample. Shape mirrors minhash: fingerprint per batch ->
    (band, chunk_value, doc_id, fp) rows -> coarse-bucket groupby ->
    candidate pairs via run-detection -> popcount verification ->
    bucketed distinct. Only ints ever shuffle.

    ``fp_col=None`` (default) computes token-SimHash fingerprints from
    the ``text`` column; pass ``fp_col`` to run the identical complete
    banded Hamming search over ANY precomputed int64 fingerprint
    column (e.g. the perceptual column-profile hash of image payloads
    — ``stages/multimodal.ImageColHash`` — for media near-dup).

    ``cap`` bounds the pairwise listing per exact-chunk run (a skew
    guard: a run of r same-chunk fingerprints lists r^2/2 candidate
    pairs). Runs beyond the cap are TRUNCATED — the pair set is then
    incomplete for members past the cap. ``cap=None`` disables the
    guard (complete listing; use when fingerprints are pre-distinct —
    :func:`fp_cluster_survivors` — or run sizes are known bounded)."""
    assert max_hamming < bands, "pigeonhole completeness needs bands > max_hamming"
    width = 64 // bands
    mask = np.uint64((1 << width) - 1)
    in_cols = [id_col] + (["text"] if fp_col is None else [fp_col])

    def band_rows(batch: pa.Table) -> pa.Table:
        if fp_col is None:
            fps = simhash_fps(batch.column("text"), k)
        else:
            fps = np.asarray(batch.column(fp_col), dtype=np.int64).astype(
                np.uint64
            )
        n = fps.shape[0]
        ids = np.asarray(batch.column(id_col), dtype=np.int64)
        band = np.tile(np.arange(bands, dtype=np.int64), n)
        chunk = (
            np.repeat(fps, bands)
            >> (np.tile(np.arange(bands, dtype=np.uint64), n) * np.uint64(width))
        ) & mask
        key = band * np.int64(1 << width) + chunk.astype(np.int64)
        return pa.table(
            {
                "key": pa.array(key),
                "coarse": pa.array(
                    (key.astype(np.uint64) % np.uint64(num_coarse)).astype(
                        np.int32
                    )
                ),
                "doc_id": pa.array(np.repeat(ids, bands)),
                "fp": pa.array(np.repeat(fps.astype(np.int64), bands)),
            }
        )

    def bucket_candidates(g: pd.DataFrame) -> pa.Table:
        s = g.sort_values(["key", "doc_id"], kind="stable")
        key = s["key"].to_numpy(np.int64)
        ids = s["doc_id"].to_numpy(np.int64)
        fps = s["fp"].to_numpy(np.int64).astype(np.uint64)
        n = ids.shape[0]
        out_a, out_b, out_h = [], [], []
        if n:
            change = np.ones(n, dtype=bool)
            change[1:] = key[1:] != key[:-1]
            starts = np.nonzero(change)[0]
            sizes = np.diff(np.append(starts, n))
            for st, sz in zip(starts[sizes >= 2], sizes[sizes >= 2]):
                mm = int(sz if cap is None else min(sz, cap))
                ii, jj = np.triu_indices(mm, 1)
                seg_i = ids[st : st + mm]
                seg_f = fps[st : st + mm]
                ham = _popcount64(seg_f[ii] ^ seg_f[jj])
                hit = ham <= max_hamming
                out_a.append(seg_i[ii][hit])
                out_b.append(seg_i[jj][hit])
                out_h.append(ham[hit])
        a = np.concatenate(out_a) if out_a else np.empty(0, np.int64)
        b = np.concatenate(out_b) if out_b else np.empty(0, np.int64)
        h = np.concatenate(out_h) if out_h else np.empty(0, np.int64)
        df = pd.DataFrame({"a": a, "b": b, "hamming": h}).drop_duplicates(
            ["a", "b"]
        )
        return pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(
            None
        )

    cand = (
        ds.select_columns(in_cols)
        .map_batches(band_rows, batch_format="pyarrow")
        .groupby("coarse")
        .map_groups(
            lambda g: bucket_candidates(g.drop(columns=["coarse"])),
            batch_format="pandas",
        )
    )
    # a pair can agree on chunks living in different coarse buckets
    return (
        cand.map_batches(
            lambda b: b.append_column(
                "_b",
                pa.array(
                    (np.asarray(b.column("a")).astype(np.uint64) % np.uint64(num_coarse)).astype(np.int32)
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


def fp_cluster_survivors(
    ds: rd.Dataset,
    max_hamming: int = 3,
    *,
    bands: int = 4,
    id_col: str = "doc_id",
    fp_col: str = "fp",
    score_col: str | None = None,
) -> rd.Dataset:
    """Near-dup REMOVAL over a precomputed int64 fingerprint column,
    clustered at the FINGERPRINT level: keep the min-id row of every
    connected fp cluster (rows sharing a fingerprint are Hamming-0
    near-dups and always co-cluster).

    ``score_col`` switches survivor selection from min-id to CANONICAL
    keep: the cluster member with the LARGEST score survives (ties
    break to the smallest id) — the "keep the most complete version"
    curation policy. Selection stays one distributed integer max:
    (score, -id) packs into a single int64 key, so the exchange is
    exactly as wide as the min-id path (scores must be non-negative
    ints < 2^30, ids < 2^33 — asserted per batch).

    Why fp-level instead of feeding row pairs to
    :func:`neardup_survivors`: duplicate-heavy corpora make identical
    fingerprints arbitrarily common, so ROW-pair listing is quadratic
    in cluster size — unbounded at scale, and any candidate cap
    silently under-removes (members beyond the cap get no edge at
    all). The distinct-fp graph is vocabulary-scale: the banded search
    runs complete over it, connected components are edge-bounded, and
    the only corpus-sized passes are two map_batches (tag root, keep
    survivors) plus one distributed min aggregate — no materialized
    groups anywhere.

    Heap assumptions (documented, same class as the CC broadcast label
    table): the CC label dict is pair-bounded; the survivor-id set is
    cluster-count-bounded (~distinct fingerprints)."""
    import ray

    from vietnamese_ocr_ray.functions.agg import hash_aggregate

    src = ds.materialize()  # consumed by 3 passes; fp column rides along

    def fp_id(b: pa.Table) -> pa.Table:
        return pa.table({"fpid": b.column(fp_col), "fp": b.column(fp_col)})

    distinct = hash_aggregate(
        src.select_columns([fp_col]), [fp_col], {"n": (fp_col, "count")}
    )
    pairs = simhash_pairs(
        distinct.map_batches(fp_id, batch_format="pyarrow"),
        max_hamming=max_hamming,
        bands=bands,
        fp_col="fp",
        id_col="fpid",
    )
    comps = connected_components(pairs).to_pandas()
    if len(comps) and "node" in comps.columns:
        keys = comps["node"].to_numpy(np.int64)
        vals = comps["component"].to_numpy(np.int64)
        order = np.argsort(keys)
        keys, vals = keys[order], vals[order]
    else:
        keys = np.empty(0, np.int64)
        vals = np.empty(0, np.int64)
    label_handle = ray.put((keys, vals))

    id_span = np.int64(1) << 33  # packed-key layout for score_col mode

    def tag_root(b: pa.Table) -> pa.Table:
        k, v = ray.get(label_handle)
        fp = np.asarray(b.column(fp_col), dtype=np.int64)
        if k.size:
            pos = np.minimum(np.searchsorted(k, fp), k.size - 1)
            hit = k[pos] == fp
            root = np.where(hit, v[pos], fp)
        else:
            root = fp
        out = b.append_column("_root", pa.array(root))
        if score_col is not None:
            ids = np.asarray(b.column(id_col), dtype=np.int64)
            score = np.asarray(b.column(score_col), dtype=np.int64)
            assert (ids >= 0).all() and (ids < id_span).all()
            assert (score >= 0).all() and (score < (1 << 30)).all()
            packed = score * id_span + (id_span - 1 - ids)
            out = out.append_column("_packed", pa.array(packed))
        return out

    tagged = src.map_batches(tag_root, batch_format="pyarrow").materialize()
    if score_col is None:
        surv = hash_aggregate(
            tagged.select_columns(["_root", id_col]),
            ["_root"],
            {"keep_id": (id_col, "min")},
        ).to_pandas()
        surv_ids = np.sort(surv["keep_id"].to_numpy(np.int64))
    else:
        surv = hash_aggregate(
            tagged.select_columns(["_root", "_packed"]),
            ["_root"],
            {"best": ("_packed", "max")},
        ).to_pandas()
        best = surv["best"].to_numpy(np.int64)
        surv_ids = np.sort((id_span - 1) - (best % id_span))
    surv_handle = ray.put(surv_ids)

    def keep(b: pa.Table) -> pa.Table:
        ids = ray.get(surv_handle)
        mine = np.asarray(
            pc.cast(
                b.column(id_col).combine_chunks()
                if isinstance(b.column(id_col), pa.ChunkedArray)
                else b.column(id_col),
                pa.int64(),
            )
        )
        drop = ["_root"] + (["_packed"] if score_col is not None else [])
        return b.filter(pa.array(np.isin(mine, ids))).drop_columns(drop)

    return tagged.map_batches(keep, batch_format="pyarrow")


def simhash(ds: rd.Dataset) -> rd.Dataset:
    return ds.select_columns(["doc_id", "text"]).map_batches(
        simhash_batch, batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# Character-set Jaccard between consecutive docs (DuckDB jaccard())
# ---------------------------------------------------------------------------


def charset_matrix(arr: pa.Array) -> np.ndarray:
    """(N, 128) bool presence matrix of ASCII chars — fully vectorized
    from the flat utf8 buffer."""
    offs, data = _utf8_flat(arr)
    n = len(offs) - 1
    lens = offs[1:] - offs[:-1]
    rows = np.repeat(np.arange(n, dtype=np.int64), lens)
    m = np.zeros((n, 128), dtype=bool)
    if data.size:
        m[rows, np.minimum(data, 127)] = True
    return m


def neighbor_jaccard(ds: rd.Dataset, join_partitions: int = 8) -> rd.Dataset:
    """Character-set Jaccard between doc i and doc i+1 — a deterministic
    self-join pairing (Dataset.join on doc_id+1) with the similarity
    computed as vectorized bitmask intersection/union."""
    left = ds.select_columns(["doc_id", "text"])
    right = ds.select_columns(["doc_id", "text"]).map_batches(
        lambda b: pa.table(
            {
                "doc_id_b": b.column("doc_id"),
                "join_key": pa.compute.add(b.column("doc_id"), 1),
                "text_b": b.column("text"),
            }
        ),
        batch_format="pyarrow",
    )
    joined = left.join(
        right,
        join_type="inner",
        num_partitions=join_partitions,
        on=("doc_id",),
        right_on=("join_key",),
    )

    def jac(batch: pa.Table) -> pa.Table:
        m1 = charset_matrix(batch.column("text_b"))  # doc i
        m2 = charset_matrix(batch.column("text"))  # doc i+1
        inter = (m1 & m2).sum(axis=1)
        union = (m1 | m2).sum(axis=1)
        j = np.where(union > 0, inter / np.maximum(union, 1), 1.0)
        return pa.table(
            {
                "doc_id_a": batch.column("doc_id_b"),
                "doc_id_b": batch.column("doc_id"),
                "jaccard": pa.array(np.round(j, 6), pa.float64()),
            }
        )

    return joined.map_batches(jac, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Token-level SimHash with a SQL-expressible hash (value-checked variant)
# ---------------------------------------------------------------------------

SIMHASH_P = 1_000_000_007
SIMHASH_CAP = 32  # tokens hashed on their first 32 chars (both sides)
SIMHASH_BITS = 30  # h < 2^30, so higher bits carry no signal
_POW31 = np.array([pow(31, j, SIMHASH_P) for j in range(SIMHASH_CAP)], np.int64)


def simhash_tokens_batch(batch: pa.Table) -> pa.Table:
    """30-bit SimHash over word tokens where the per-token hash is the
    polynomial sum(codepoint(c_j) * 31^j) mod 1e9+7 (j 0-based) — the
    same hash DuckDB can compute with list_transform + a 31^j literal
    table, which makes this variant fully value-checkable by the
    driver (unlike the byte-shingle rolling-hash simhash above).

    Vectorized: one weighted-mod cumsum over the flat utf8 buffer for
    ALL tokens of the batch, one bit-unpack matmul for the per-doc
    majority vote. ASCII fast path; per-doc Python fallback otherwise.
    """
    text = batch.column("text")
    toks_list = pc.split_pattern(text, " ")
    flat = pc.list_flatten(toks_list)
    flat = pc.utf8_slice_codeunits(flat, 0, SIMHASH_CAP)
    ntok = pc.list_value_length(toks_list).to_numpy(zero_copy_only=False)
    offs, data = _utf8_flat(flat.combine_chunks())
    fps = np.zeros(batch.num_rows, np.int64)
    if data.size == 0 or (data < 128).all():
        chars = data.astype(np.int64)
        lens = offs[1:] - offs[:-1]
        starts = np.repeat(offs[:-1], lens)
        local = np.arange(chars.shape[0], dtype=np.int64) - starts
        weighted = (chars * _POW31[local]) % SIMHASH_P
        csum = np.concatenate([[0], np.cumsum(weighted)])
        h = (csum[offs[1:]] - csum[offs[:-1]]) % SIMHASH_P
        # h < 2^30 (SIMHASH_P), so a LSB-first u4 byte unpack yields the
        # same bit columns as the 30-way shift-broadcast at ~2.5x the
        # speed; int32 cumsum is safe (bits sum to <= tokens-per-batch).
        bits = np.unpackbits(
            h.astype("<u4", copy=False).view(np.uint8).reshape(-1, 4),
            axis=1,
            bitorder="little",
        )[:, :SIMHASH_BITS].astype(np.int32)
        bcsum = np.concatenate(
            [np.zeros((1, SIMHASH_BITS), np.int32), np.cumsum(bits, axis=0, dtype=np.int32)]
        )
        doc_ends = np.concatenate([[0], np.cumsum(ntok)])
        ones = bcsum[doc_ends[1:]] - bcsum[doc_ends[:-1]]
        votes = 2 * ones.astype(np.int64) - ntok[:, None]
        fps = ((votes > 0) @ (1 << np.arange(SIMHASH_BITS, dtype=np.int64))).astype(
            np.int64
        )
    else:
        for i, s in enumerate(text.to_pylist()):
            votes = np.zeros(SIMHASH_BITS, np.int64)
            for tok in (s or "").split(" "):
                h = 0
                for j, c in enumerate(tok[:SIMHASH_CAP]):
                    h = (h + ord(c) * int(_POW31[j])) % SIMHASH_P
                b = (h >> np.arange(SIMHASH_BITS, dtype=np.int64)) & 1
                votes += 2 * b - 1
            fps[i] = int(
                ((votes > 0) @ (1 << np.arange(SIMHASH_BITS, dtype=np.int64)))
            )
    return pa.table({"doc_id": batch.column("doc_id"), "simhash30": pa.array(fps)})


def simhash_tokens(ds: rd.Dataset) -> rd.Dataset:
    return ds.select_columns(["doc_id", "text"]).map_batches(
        simhash_tokens_batch, batch_format="pyarrow"
    )


def word_jaccard(ds: rd.Dataset, join_partitions: int = 8) -> rd.Dataset:
    """Word-SET Jaccard between doc i and doc i+1 (the token-level
    n-gram Jaccard twin of :func:`neighbor_jaccard`'s character-set
    variant) — same deterministic self-join pairing; the per-pair set
    intersection is exact on the token strings. Windowed-pair shape:
    O(docs) pairs total; an all-pairs variant would hash-bucket tokens
    (minhash_lsh_pairs is that scale path)."""
    left = ds.select_columns(["doc_id", "text"])
    right = ds.select_columns(["doc_id", "text"]).map_batches(
        lambda b: pa.table(
            {
                "doc_id_b": b.column("doc_id"),
                "join_key": pc.add(b.column("doc_id"), 1),
                "text_b": b.column("text"),
            }
        ),
        batch_format="pyarrow",
    )
    joined = left.join(
        right,
        join_type="inner",
        num_partitions=join_partitions,
        on=("doc_id",),
        right_on=("join_key",),
    )

    def jac(batch: pa.Table) -> pa.Table:
        js = word_jaccard_batch(
            batch.column("text_b"), batch.column("text")  # doc i, doc i+1
        )
        return pa.table(
            {
                "doc_id_a": batch.column("doc_id_b"),
                "doc_id_b": batch.column("doc_id"),
                "word_jaccard": pa.array(np.round(js, 6), pa.float64()),
            }
        )

    return joined.map_batches(jac, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Incremental (cross-snapshot) dedup
# ---------------------------------------------------------------------------


def incremental_dedup(
    new_ds: rd.Dataset,
    old_ds: rd.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> rd.Dataset:
    """Cross-snapshot dedup: keep rows of ``new_ds`` whose content does
    NOT already exist in ``old_ds`` — the per-crawl ingest step of a
    continuously refreshed corpus (dedup the new snapshot against
    everything already kept, without re-shuffling the old corpus).

    Old side is reduced DISTRIBUTED to distinct 64-bit content hashes
    (per-batch partial dedup -> int-only driver collect, bounded by
    the old snapshot's distinct count, never its text bytes); the new
    side then runs :func:`membership.anti_join_keys` — a broadcast
    np.isin filter that auto-upgrades to a Bloom prefilter past 1M
    keys. At 100 TB the collected array is replaced by the bucketed
    hash anti-join (hash-partition both sides on ``content_hash64 %
    B`` — :func:`dedup_exact`'s bucket shape); the broadcast form is
    the small-side fast path.

    Equality is on the 64-bit hash (collision odds ~ n^2 / 2^64; the
    oracle's text equality agrees on any corpus this side of 10^9
    distinct docs)."""
    from vietnamese_ocr_ray.functions.membership import anti_join_keys

    def old_hashes(b: pa.Table) -> pa.Table:
        h = np.unique(content_hash64(b.column(text_col)).astype(np.int64))
        return pa.table({"_h": pa.array(h)})

    old_h = old_ds.map_batches(old_hashes, batch_format="pyarrow").to_pandas()
    keys = np.unique(old_h["_h"].to_numpy(np.int64))

    def add_hash(b: pa.Table) -> pa.Table:
        return b.append_column(
            "_h", pa.array(content_hash64(b.column(text_col)).astype(np.int64))
        )

    hashed = new_ds.map_batches(add_hash, batch_format="pyarrow")
    kept = anti_join_keys(hashed, keys, "_h")
    return kept.map_batches(
        lambda b: b.drop_columns(["_h"]), batch_format="pyarrow"
    )


def snapshot_common(
    new_ds: rd.Dataset,
    old_ds: rd.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> rd.Dataset:
    """The INTERSECT counterpart of :func:`incremental_dedup`: rows of
    ``new_ds`` whose content DOES exist in ``old_ds`` (re-crawled
    unchanged pages — the "skip reprocessing" set of a refresh
    ingest). Same scale shape: old side reduces distributed to
    distinct int64 content hashes, new side runs the broadcast/Bloom
    SEMI join; bucketed hash semi-join is the 100 TB path."""
    from vietnamese_ocr_ray.functions.membership import semi_join_keys

    def old_hashes(b: pa.Table) -> pa.Table:
        h = np.unique(content_hash64(b.column(text_col)).astype(np.int64))
        return pa.table({"_h": pa.array(h)})

    old_h = old_ds.map_batches(old_hashes, batch_format="pyarrow").to_pandas()
    keys = np.unique(old_h["_h"].to_numpy(np.int64))

    def add_hash(b: pa.Table) -> pa.Table:
        return b.append_column(
            "_h", pa.array(content_hash64(b.column(text_col)).astype(np.int64))
        )

    hashed = new_ds.map_batches(add_hash, batch_format="pyarrow")
    kept = semi_join_keys(hashed, keys, "_h")
    out = kept.map_batches(
        lambda b: b.drop_columns(["_h"]), batch_format="pyarrow"
    )
    # an all-empty result must keep its schema (typed zero-row seed —
    # Ray drops empty blocks before to_pandas)
    from vietnamese_ocr_ray.functions.joins import _ensure_schema

    s = new_ds.schema()
    return _ensure_schema(
        out, pa.schema(list(zip(s.names, s.types)))
    )


# ---------------------------------------------------------------------------
# Duplicate-graph triangle counting
# ---------------------------------------------------------------------------


def candidate_dup_edges(
    ds: rd.Dataset,
    id_col: str = "doc_id",
    key_cols: tuple[str, ...] = ("lang", "n_chars"),
    num_buckets: int = 64,
) -> rd.Dataset:
    """Edge list (u, v), u < v, for every pair of docs sharing a
    BLOCKING key (record-linkage style: candidate duplicates are
    pairs that agree on cheap invariants — here language + exact
    char length). Same bucket shape as :func:`dedup_exact` (rows
    with equal keys always share a bucket), pair generation inside
    each bucket is one vectorized repeat/arange expansion over the
    group offsets (no per-group Python; k^2 candidate rows are
    emitted but built by numpy)."""

    def add_bucket(b: pa.Table) -> pa.Table:
        n = np.asarray(pc.cast(b.column(key_cols[-1]), pa.int64()))
        return b.append_column(
            "_bucket", pa.array((n % num_buckets).astype(np.int32))
        )

    def pairs(g: pd.DataFrame) -> pa.Table:
        df = g.sort_values([*key_cols, id_col])
        ids = df[id_col].to_numpy(np.int64)
        codes = df.groupby(list(key_cols), sort=False).ngroup().to_numpy()
        n = len(codes)
        starts = np.concatenate([[0], np.flatnonzero(np.diff(codes)) + 1])
        gidx = np.searchsorted(starts, np.arange(n), side="right") - 1
        wpos = np.arange(n) - starts[gidx]
        total = int(wpos.sum())
        if total == 0:
            return pa.table(
                {
                    "u": pa.array([], pa.int64()),
                    "v": pa.array([], pa.int64()),
                }
            )
        seconds = np.repeat(np.arange(n), wpos)
        cum = np.concatenate([[0], np.cumsum(wpos)])
        firsts = np.repeat(starts[gidx], wpos) + (
            np.arange(total) - np.repeat(cum[:-1], wpos)
        )
        u, v = ids[firsts], ids[seconds]
        return pa.table(
            {
                "u": pa.array(np.minimum(u, v)),
                "v": pa.array(np.maximum(u, v)),
            }
        )

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(pairs, batch_format="pandas")
    )


def dup_triangles(ds: rd.Dataset) -> pa.Table:
    """Global triangle count of the candidate-duplicate BLOCKING
    graph (edges = doc pairs agreeing on (lang, n_chars)), by
    node-iterator wedge closure: for each edge (a, b) find broadcast
    neighbors c of a with c > b and test (b, c) membership — each
    triangle a < b < c is counted exactly once, at its minimum vertex.

    The broadcast side is the edge list itself (bounded by duplicate
    pairs, not the corpus — the same small-side bound as
    neardup_survivors' drop set), packed as sorted (u<<32)|v int64
    keys so closure is one np.isin per batch. At 10^12 edges the same
    two steps become shuffle joins: bucket wedges on the shared node,
    then bucket (b, c) candidates against edges on (b, c) — the
    key_bucket join plumbing of functions/joins.py.

    The SQL oracle computes sum(C(k,3)) over blocking-key groups —
    an INDEPENDENT algorithm (cliques, not wedges) that must agree."""
    import ray
    from ray.data.aggregate import Sum

    edges = candidate_dup_edges(ds)
    edf = edges.to_pandas()  # small: candidate pairs only
    if "u" not in edf.columns or not len(edf):
        # fully-empty Datasets lose their schema at to_pandas()
        return pa.table({"n_triangles": pa.array([0], pa.int64())})
    u = edf["u"].to_numpy(np.int64)
    v = edf["v"].to_numpy(np.int64)
    order = np.argsort(u, kind="stable")
    u_s, v_s = u[order], v[order]
    packed = np.sort((u_s << np.int64(32)) | v_s)
    handle = ray.put((u_s, v_s, packed))

    def count(batch: pa.Table) -> pa.Table:
        au, av, pk = ray.get(handle)
        a = np.asarray(batch.column("u"), dtype=np.int64)
        b = np.asarray(batch.column("v"), dtype=np.int64)
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
        rep_b = np.repeat(b, cnt)
        keep = c > rep_b
        key = (rep_b[keep] << np.int64(32)) | c[keep]
        tri = int(np.isin(key, pk).sum())
        return pa.table({"n": pa.array([tri], pa.int64())})

    agg = edges.map_batches(count, batch_format="pyarrow").aggregate(
        Sum("n", alias_name="n")
    )
    n = int(agg["n"]) if agg and agg.get("n") is not None else 0
    return pa.table({"n_triangles": pa.array([n], pa.int64())})


def _deletion_variants(toks: pa.Array) -> tuple[pa.Array, pa.Array]:
    """(token, variant) rows for FastSS blocking: each token paired
    with itself and with every single-codepoint deletion of itself.
    Arrow slice kernels per deletion position (max-token-length
    iterations over shrinking arrays) — no per-token Python. The same
    variant can arise from two deletion positions ("aa" -> "a" twice);
    callers dedup (token, variant) before pairing."""
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    lens = pc.utf8_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
    out_t = [toks]
    out_v = [toks]
    for d in range(int(lens.max(initial=0))):
        sub = toks.filter(pa.array(lens > d))
        var = pc.binary_join_element_wise(
            pc.utf8_slice_codeunits(sub, start=0, stop=d),
            pc.utf8_slice_codeunits(sub, start=d + 1, stop=1 << 30),
            "",
        )
        out_t.append(sub)
        out_v.append(var)
    return pa.concat_arrays(out_t), pa.concat_arrays(out_v)


def fuzzy_pairs_ed1(
    ds: rd.Dataset,
    text_col: str = "text",
    num_buckets: int = 64,
) -> rd.Dataset:
    """All pairs of DISTINCT whitespace tokens of the corpus at
    Levenshtein distance exactly 1, via deletion-neighborhood blocking
    (FastSS, Bocek et al. 2007 — the SymSpell candidate rule):
    ed(a, b) <= 1  iff  a == b, or one is a single deletion of the
    other, or deleting one position from each yields the same string —
    so every qualifying pair shares at least one key in
    {token} ∪ {single-deletion variants}, and candidate generation is
    O(sum token_len), never O(vocab^2). A shared key only bounds
    ed <= 2, so candidates pass an exact vectorized-DP verify.

    Scale shape: one vocabulary-bounded distinct (bucketed hash
    aggregate), variant expansion inside ``map_batches`` (avg_len + 1
    short string rows per distinct token), ONE shuffle of those
    (variant, token) rows on the variant hash, per-bucket vectorized
    pair expansion (the :func:`candidate_dup_edges` repeat/arange
    pattern) + batched edit-distance verify, and a pair-bounded
    distinct (pairs found in several buckets dedup once, globally).

    Output: (w1, w2) with w1 < w2, each pair once. Mirrors DuckDB:
    deletion variants via substr arithmetic + ``levenshtein() = 1``.
    Variants/verify are codepoint-based on both sides (byte == char
    for this ASCII corpus)."""
    from vietnamese_ocr_ray.functions.agg import hash_aggregate
    from vietnamese_ocr_ray.functions.joins import key_bucket
    from vietnamese_ocr_ray.functions.text import levenshtein_batch

    def partial_distinct(batch: pa.Table) -> pa.Table:
        toks = pc.list_flatten(pc.split_pattern(batch.column(text_col), " "))
        return pa.table({"tok": pc.unique(toks)})

    vocab = hash_aggregate(
        ds.map_batches(partial_distinct, batch_format="pyarrow"),
        ["tok"],
        {"_n": ("tok", "count")},
        num_buckets=num_buckets,
    )

    def variants(batch: pa.Table) -> pa.Table:
        t, v = _deletion_variants(batch.column("tok"))
        tbl = pa.table({"tok": t, "v": v}).group_by(["tok", "v"]).aggregate([])
        return tbl.append_column(
            "_bucket", pa.array(key_bucket(tbl.column("v"), num_buckets))
        )

    empty = pa.table(
        {"w1": pa.array([], pa.string()), "w2": pa.array([], pa.string())}
    )

    def pairs(g: pd.DataFrame) -> pa.Table:
        df = g.sort_values(["v", "tok"])
        toks = df["tok"].to_numpy()
        codes = df.groupby(["v"], sort=False).ngroup().to_numpy()
        n = len(codes)
        starts = np.concatenate([[0], np.flatnonzero(np.diff(codes)) + 1])
        gidx = np.searchsorted(starts, np.arange(n), side="right") - 1
        wpos = np.arange(n) - starts[gidx]
        total = int(wpos.sum())
        if total == 0:
            return empty
        seconds = np.repeat(np.arange(n), wpos)
        cum = np.concatenate([[0], np.cumsum(wpos)])
        firsts = np.repeat(starts[gidx], wpos) + (
            np.arange(total) - np.repeat(cum[:-1], wpos)
        )
        # tok is sorted within each variant group, so first < second
        # lexicographically already — (w1, w2) is canonical by layout
        cand = pd.DataFrame(
            {"w1": toks[firsts], "w2": toks[seconds]}
        ).drop_duplicates()  # a pair can share several variants in-bucket
        d = levenshtein_batch(cand["w1"].tolist(), cand["w2"].tolist())
        keep = cand[d == 1]
        return pa.table(
            {
                "w1": pa.array(keep["w1"].to_numpy(), pa.string()),
                "w2": pa.array(keep["w2"].to_numpy(), pa.string()),
            }
        )

    from vietnamese_ocr_ray.functions.joins import _ensure_schema

    cand = _ensure_schema(
        vocab.map_batches(variants, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(pairs, batch_format="pandas"),
        empty.schema,
    )
    # cross-bucket dedup (a pair's shared variants may hash apart)
    out = hash_aggregate(
        cand, ["w1", "w2"], {"_n": ("w1", "count")}, num_buckets=num_buckets
    ).map_batches(
        lambda b: b.select(["w1", "w2"]), batch_format="pyarrow"
    )
    return _ensure_schema(out, empty.schema)


def containment_counts_batch(
    a_arr: pa.Array, b_arr: pa.Array, k: int = 8
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(inter, n_a, n_b) distinct k-byte shingle counts for N (a, b)
    text pairs in one vectorized pass — the counting core behind both
    Jaccard and containment verification."""
    a_arr = a_arr.combine_chunks() if isinstance(a_arr, pa.ChunkedArray) else a_arr
    b_arr = b_arr.combine_chunks() if isinstance(b_arr, pa.ChunkedArray) else b_arr
    n = len(a_arr)
    ra, ha = _unique_shingles(*_utf8_flat(a_arr), k)
    rb, hb = _unique_shingles(*_utf8_flat(b_arr), k)
    ca = np.bincount(ra, minlength=n)
    cb = np.bincount(rb, minlength=n)
    rows = np.concatenate([ra, rb])
    hs = np.concatenate([ha, hb])
    order = np.lexsort((hs, rows))
    r2, h2 = rows[order], hs[order]
    dup = np.zeros(r2.shape[0], dtype=bool)
    dup[1:] = (r2[1:] == r2[:-1]) & (h2[1:] == h2[:-1])
    inter = np.bincount(r2[dup], minlength=n)
    return inter.astype(np.int64), ca.astype(np.int64), cb.astype(np.int64)


def containment_pairs(
    ds: rd.Dataset,
    *,
    k: int = 8,
    threshold: float = 0.9,
    num_coarse: int = 32,
) -> rd.Dataset:
    """EXACT asymmetric near-dup join: every doc pair (a < b) whose
    k-byte shingle-set CONTAINMENT |A∩B| / min(|A|, |B|) >= threshold
    — catches a short document embedded verbatim inside a long one,
    which Jaccard misses (union-normalized, the long side dilutes it).
    The quote/excerpt/version-prefix detector of a curation stack.

    Prefix filtering, containment flavour: if C(A,B) >= t then the
    SMALLER set misses at most (1-t)*|S| of its elements, so its
    rarity-ordered prefix of size s - ceil(t_eff*s) + 1 must intersect
    the other side's FULL set (prefix x prefix is NOT sufficient here
    — the larger side's prefix can miss the overlap entirely, hence
    prefix rows join against all element rows). No length filter
    exists for min-normalized containment.

    Scale shape: same skeleton as :func:`ssjoin_pairs` — one
    vocabulary-bounded df aggregate for the rarity LUT, element rows
    (prefix-tagged) on one int-only rank-bucket shuffle, candidate
    dedupe on a candidate-sized shuffle, exact verification via the
    shared :func:`verify_pairs_corpus` cogroup with a containment
    verifier. Posting lists of hot elements are touched only when a
    hot element lands in someone's prefix, which rarity ordering makes
    rare."""
    import ray

    from vietnamese_ocr_ray.functions.agg import hash_aggregate
    from vietnamese_ocr_ray.functions.joins import key_bucket

    t_eff = threshold - 1e-6
    docs = ds.select_columns(["doc_id", "text"])

    def df_partial(b: pa.Table) -> pa.Table:
        _, hs = _unique_shingles(*_utf8_flat(b.column("text")), k)
        u, c = np.unique(hs, return_counts=True)
        return pa.table(
            {"h": pa.array(u.astype(np.int64)), "df": pa.array(c)}
        )

    df_pd = hash_aggregate(
        docs.map_batches(df_partial, batch_format="pyarrow"),
        ["h"],
        {"df": ("df", "sum")},
    ).to_pandas()  # element-vocabulary-bounded (ssjoin contract)
    h_arr = df_pd["h"].to_numpy(np.int64).astype(np.uint64)
    df_arr = df_pd["df"].to_numpy(np.int64)
    order = np.lexsort((h_arr, df_arr))
    h_by_rank = h_arr[order]
    h_sorted = np.sort(h_arr)
    rank_of = np.empty(len(h_arr), np.int64)
    rank_of[np.searchsorted(h_sorted, h_by_rank)] = np.arange(len(h_arr))
    lut = ray.put((h_sorted, rank_of))

    def element_rows(b: pa.Table) -> pa.Table:
        h_sorted_, rank_of_ = ray.get(lut)
        rows, hs = _unique_shingles(*_utf8_flat(b.column("text")), k)
        ranks = rank_of_[np.searchsorted(h_sorted_, hs)]
        o = np.lexsort((ranks, rows))
        rows, ranks = rows[o], ranks[o]
        n = b.num_rows
        sizes = np.bincount(rows, minlength=n)
        starts = np.cumsum(sizes) - sizes
        pos = np.arange(rows.shape[0]) - np.repeat(starts, sizes)
        p = sizes - np.ceil(t_eff * sizes).astype(np.int64) + 1
        ids = np.asarray(b.column("doc_id"), dtype=np.int64)
        return pa.table(
            {
                "rnk": pa.array(ranks),
                "doc_id": pa.array(ids[rows]),
                "is_prefix": pa.array(pos < np.repeat(p, sizes)),
                "bucket": pa.array(
                    key_bucket(pa.array(ranks), num_coarse).astype(np.int32)
                ),
            }
        )

    def rank_pairs(g: pd.DataFrame) -> pa.Table:
        s = g.sort_values(["rnk", "doc_id"], kind="stable")
        rnk = s["rnk"].to_numpy(np.int64)
        ids = s["doc_id"].to_numpy(np.int64)
        pref = s["is_prefix"].to_numpy(bool)
        n = ids.shape[0]
        out_a, out_b = [], []
        if n:
            change = np.ones(n, dtype=bool)
            change[1:] = rnk[1:] != rnk[:-1]
            starts = np.nonzero(change)[0]
            sizes = np.diff(np.append(starts, n))
            multi = sizes >= 2
            for st, m in zip(starts[multi], sizes[multi]):
                seg_id = ids[st : st + m]
                seg_pref = pref[st : st + m]
                pi = np.nonzero(seg_pref)[0]
                if pi.size == 0:
                    continue
                # prefix members x ALL members (excluding self)
                a = np.repeat(seg_id[pi], m)
                b2 = np.tile(seg_id, pi.size)
                keep = a != b2
                lo = np.minimum(a[keep], b2[keep])
                hi = np.maximum(a[keep], b2[keep])
                out_a.append(lo)
                out_b.append(hi)
        if out_a:
            aa = np.concatenate(out_a)
            bb = np.concatenate(out_b)
        else:
            aa = np.empty(0, np.int64)
            bb = np.empty(0, np.int64)
        df = pd.DataFrame({"a": aa, "b": bb}).drop_duplicates()
        return pa.Table.from_pandas(
            df, preserve_index=False
        ).replace_schema_metadata(None)

    candidates = (
        docs.map_batches(element_rows, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(
            lambda g: rank_pairs(g.drop(columns=["bucket"])),
            batch_format="pandas",
        )
    )
    distinct = (
        candidates.map_batches(
            lambda b: b.append_column(
                "bucket",
                pa.array(
                    (
                        np.asarray(b.column("a")).astype(np.int64) % num_coarse
                    ).astype(np.int32)
                ),
            ),
            batch_format="pyarrow",
        )
        .groupby("bucket")
        .map_groups(
            lambda g: pa.Table.from_pandas(
                g.drop(columns=["bucket"]).drop_duplicates(["a", "b"]),
                preserve_index=False,
            ).replace_schema_metadata(None),
            batch_format="pandas",
        )
    )

    def _verify_containment(
        batch: pa.Table, texts_a: pa.Array, texts_b: pa.Array
    ) -> pa.Table:
        inter, na, nb = containment_counts_batch(texts_a, texts_b, k)
        mn = np.minimum(na, nb)
        c = np.round(
            inter / np.maximum(mn, 1).astype(np.float64), 6
        )
        hit = (c >= threshold) & (mn > 0)
        filtered = batch.filter(pa.array(hit))
        return pa.table(
            {
                "a": filtered.column("a"),
                "b": filtered.column("b"),
                "n_inter": pa.array(inter[hit]),
                "n_a": pa.array(na[hit]),
                "n_b": pa.array(nb[hit]),
                "containment": pa.array(c[hit], pa.float64()),
            }
        )

    return verify_pairs_corpus(
        distinct,
        ds,
        k=k,
        threshold=threshold,
        num_coarse=num_coarse,
        verify_rows=_verify_containment,
    )


def containment_survivors(
    ds: rd.Dataset, pairs: rd.Dataset, id_col: str = "doc_id"
) -> rd.Dataset:
    """Containment-dedup REMOVAL: for every verified containment pair,
    drop the CONTAINED side (the smaller shingle set — the excerpt /
    quote / truncated version), keeping the container; equal sizes drop
    the larger id. No clustering round is needed — the drop rule is
    per-pair (unlike Jaccard near-dup, where transitive clusters demand
    connected components).

    Scale shape: pairs are duplicate-bounded; the drop-id set reaches
    the driver (neardup_survivors' small-side contract) and the filter
    is one broadcast np.isin per batch."""
    import ray

    def drops(b: pa.Table) -> pa.Table:
        a = np.asarray(b.column("a"), np.int64)
        bb = np.asarray(b.column("b"), np.int64)
        na = np.asarray(b.column("n_a"), np.int64)
        nb = np.asarray(b.column("n_b"), np.int64)
        d = np.where(na < nb, a, np.where(nb < na, bb, np.maximum(a, bb)))
        return pa.table({"node": pa.array(d)})

    drop_tbl = pairs.map_batches(drops, batch_format="pyarrow").to_pandas()
    if len(drop_tbl) == 0 or "node" not in drop_tbl.columns:
        return ds
    drop_ids = np.unique(drop_tbl["node"].to_numpy(np.int64))
    handle = ray.put(drop_ids)

    def keep(batch: pa.Table) -> pa.Table:
        dropped = ray.get(handle)
        ids = np.asarray(
            pc.cast(
                batch.column(id_col).combine_chunks()
                if isinstance(batch.column(id_col), pa.ChunkedArray)
                else batch.column(id_col),
                pa.int64(),
            )
        )
        return batch.filter(pa.array(~np.isin(ids, dropped)))

    return ds.map_batches(keep, batch_format="pyarrow")


def _deletion_variants2(toks: pa.Array) -> tuple[pa.Array, pa.Array]:
    """(token, variant) rows for distance-2 FastSS blocking: each token
    paired with every deletion of UP TO TWO codepoints (self, all
    1-deletions, all 2-deletions). Built as one extra deletion round
    over the 1-deletion variants (a deletion of a deletion enumerates
    every 2-deletion); O(max_len^2) Arrow slice passes over shrinking
    arrays, no per-token Python. Callers dedup (token, variant)."""
    t1, v1 = _deletion_variants(toks)
    if isinstance(v1, pa.ChunkedArray):
        v1 = v1.combine_chunks()
    lens = pc.utf8_length(v1).to_numpy(zero_copy_only=False).astype(np.int64)
    out_t = [t1]
    out_v = [v1]
    for d in range(int(lens.max(initial=0))):
        keep = pa.array(lens > d)
        sub_t = t1.filter(keep)
        sub_v = v1.filter(keep)
        var = pc.binary_join_element_wise(
            pc.utf8_slice_codeunits(sub_v, start=0, stop=d),
            pc.utf8_slice_codeunits(sub_v, start=d + 1, stop=1 << 30),
            "",
        )
        out_t.append(sub_t)
        out_v.append(var)
    return pa.concat_arrays(out_t), pa.concat_arrays(out_v)


def fuzzy_pairs_ed2(
    ds: rd.Dataset,
    text_col: str = "text",
    num_buckets: int = 64,
) -> rd.Dataset:
    """All pairs of DISTINCT corpus tokens at Levenshtein distance 1 OR
    2 — the SymSpell/FastSS distance-2 join. Completeness: if
    ed(a, b) <= 2, an optimal alignment deletes the <= 2 unmatched
    positions from each side down to a COMMON string, so the pair
    shares a key in the <=2-deletion neighborhoods
    (:func:`_deletion_variants2`); candidate generation is
    O(vocab * len^2) rows, never O(vocab^2) — the reason this runs at
    100 TB where the quadratic join (the SQL oracle, fine at test
    scale) cannot. Shared keys only bound ed <= 4, so every candidate
    passes the exact vectorized-DP verify; output carries the verified
    distance.

    Same scale shape as :func:`fuzzy_pairs_ed1`: vocabulary-bounded
    distinct, in-batch variant expansion, ONE int-keyed shuffle of
    (variant, token) rows, per-bucket pair expansion + DP verify,
    pair-bounded cross-bucket dedup (min dist is unique per pair, so
    the dedup keeps consistent rows)."""
    from vietnamese_ocr_ray.functions.agg import hash_aggregate
    from vietnamese_ocr_ray.functions.joins import _ensure_schema, key_bucket
    from vietnamese_ocr_ray.functions.text import levenshtein_batch

    def partial_distinct(batch: pa.Table) -> pa.Table:
        toks = pc.list_flatten(pc.split_pattern(batch.column(text_col), " "))
        return pa.table({"tok": pc.unique(toks)})

    vocab = hash_aggregate(
        ds.map_batches(partial_distinct, batch_format="pyarrow"),
        ["tok"],
        {"_n": ("tok", "count")},
        num_buckets=num_buckets,
    )

    def variants(batch: pa.Table) -> pa.Table:  # <=2-deletion neighborhood
        t, v = _deletion_variants2(batch.column("tok"))
        tbl = pa.table({"tok": t, "v": v}).group_by(["tok", "v"]).aggregate([])
        return tbl.append_column(
            "_bucket", pa.array(key_bucket(tbl.column("v"), num_buckets))
        )

    empty = pa.table(
        {
            "w1": pa.array([], pa.string()),
            "w2": pa.array([], pa.string()),
            "dist": pa.array([], pa.int64()),
        }
    )

    def pairs(g: pd.DataFrame) -> pa.Table:
        df = g.sort_values(["v", "tok"])
        toks = df["tok"].to_numpy()
        codes = df.groupby(["v"], sort=False).ngroup().to_numpy()
        n = len(codes)
        starts = np.concatenate([[0], np.flatnonzero(np.diff(codes)) + 1])
        gidx = np.searchsorted(starts, np.arange(n), side="right") - 1
        wpos = np.arange(n) - starts[gidx]
        total = int(wpos.sum())
        if total == 0:
            return empty
        seconds = np.repeat(np.arange(n), wpos)
        cum = np.concatenate([[0], np.cumsum(wpos)])
        firsts = np.repeat(starts[gidx], wpos) + (
            np.arange(total) - np.repeat(cum[:-1], wpos)
        )
        cand = pd.DataFrame(
            {"w1": toks[firsts], "w2": toks[seconds]}
        ).drop_duplicates()
        cand = cand[cand["w1"] != cand["w2"]]
        if not len(cand):
            return empty
        d = levenshtein_batch(cand["w1"].tolist(), cand["w2"].tolist())
        keep = cand[(d >= 1) & (d <= 2)]
        return pa.table(
            {
                "w1": pa.array(keep["w1"].to_numpy(), pa.string()),
                "w2": pa.array(keep["w2"].to_numpy(), pa.string()),
                "dist": pa.array(
                    d[(d >= 1) & (d <= 2)].astype(np.int64), pa.int64()
                ),
            }
        )

    cand = _ensure_schema(
        vocab.map_batches(variants, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(pairs, batch_format="pandas"),
        empty.schema,
    )
    out = hash_aggregate(
        cand,
        ["w1", "w2"],
        {"dist": ("dist", "min")},
        num_buckets=num_buckets,
    )
    return _ensure_schema(out, empty.schema)


def snm_pairs(
    ds: rd.Dataset,
    text_col: str = "c_name",
    window: int = 5,
    max_dist: int = 2,
) -> rd.Dataset:
    """Sorted-neighborhood record linkage (Hernandez & Stolfo 1995):
    sort records by a derived blocking key (here the REVERSED string —
    suffix blocking, so ids differing in leading characters still
    cluster), slide a ``window``-row window over the sorted order, and
    verify every in-window pair with exact edit distance <= max_dist.
    The third blocking paradigm next to LSH (minhash/simhash) and
    deletion neighborhoods (fuzzy_pairs_*): candidates are O(n *
    window) BY CONSTRUCTION — the knob trades recall for a hard
    candidate bound, where FastSS trades nothing but pays O(len^2)
    keys.

    Distributed boundary contract: after the global range sort, each
    block prepends the last window-1 rows of the CONCATENATED
    preceding blocks (tiny driver-collected tails, chained so a run
    of sub-window blocks still yields the full window-1 context — a
    single previous-block tail would drop windows spanning three or
    more blocks) and only emits pairs whose SECOND element lives in
    the current block — every cross-boundary window is counted
    exactly once, none twice. Output: (w1, w2, dist) with w1 < w2
    lexicographically.
    """
    import ray

    from vietnamese_ocr_ray.functions.text import levenshtein_batch

    def tag(batch: pa.Table) -> pa.Table:
        nm = batch.column(text_col)
        if isinstance(nm, pa.ChunkedArray):
            nm = nm.combine_chunks()
        return pa.table({"nm": nm, "k": pc.utf8_reverse(nm)})

    s = ds.map_batches(tag, batch_format="pyarrow").sort(["k", "nm"]).materialize()
    refs = s.to_arrow_refs()

    @ray.remote
    def tail(t: pa.Table, n: int) -> pa.Table:
        return t.slice(max(t.num_rows - n, 0))

    tails = ray.get([tail.remote(r, window - 1) for r in refs])
    # chain the per-block tails: block i's context is the last
    # window-1 rows of blocks[0..i-1] COMBINED, not just block i-1's
    # tail (which may hold fewer than window-1 rows under a hostile
    # block layout).  Each tail carries <= window-1 rows so the
    # running concat stays driver-tiny.
    cum_tails: list[pa.Table | None] = []
    acc: pa.Table | None = None
    for t in tails:
        cum_tails.append(acc)
        if t.num_rows == 0:
            continue  # empty sort blocks may carry a fieldless schema
        acc = t if acc is None else pa.concat_tables([acc, t]).combine_chunks()
        if acc.num_rows > window - 1:
            acc = acc.slice(acc.num_rows - (window - 1))

    @ray.remote
    def pair_block(t: pa.Table, prev_tail: pa.Table | None) -> pa.Table:
        lev = levenshtein_batch
        empty = pa.table(
            {
                "w1": pa.array([], pa.string()),
                "w2": pa.array([], pa.string()),
                "dist": pa.array([], pa.int64()),
            }
        )
        if "nm" not in t.column_names:  # fieldless empty sort block
            return empty
        p = 0
        if prev_tail is not None and prev_tail.num_rows:
            p = prev_tail.num_rows
            t = pa.concat_tables([prev_tail, t]).combine_chunks()
        nm = np.asarray(t.column("nm"))
        n = nm.shape[0]
        w1s, w2s, ds_ = [], [], []
        for d in range(1, window):
            if n <= d:
                break
            a = nm[: n - d]
            b = nm[d:]
            # second element must live in THIS block (index >= p)
            sel = np.arange(d, n) >= p
            a, b = a[sel], b[sel]
            if not a.size:
                continue
            dist = lev(a.tolist(), b.tolist())
            keep = (dist >= 1) & (dist <= max_dist)
            lo = np.minimum(a[keep], b[keep])
            hi = np.maximum(a[keep], b[keep])
            w1s.append(lo)
            w2s.append(hi)
            ds_.append(dist[keep])
        if not w1s:
            return empty
        return pa.table(
            {
                "w1": pa.array(np.concatenate(w1s), pa.string()),
                "w2": pa.array(np.concatenate(w2s), pa.string()),
                "dist": pa.array(
                    np.concatenate(ds_).astype(np.int64), pa.int64()
                ),
            }
        )

    out = [
        pair_block.remote(r, cum_tails[i]) for i, r in enumerate(refs)
    ]
    res = rd.from_arrow_refs(out)
    # a pair can appear at several window offsets? no — a sorted order
    # gives each (i, j) one rank gap; but EQUAL names at several ranks
    # could duplicate (w1, w2): dedup to min dist for a stable contract
    from vietnamese_ocr_ray.functions.agg import hash_aggregate

    return hash_aggregate(res, ["w1", "w2"], {"dist": ("dist", "min")})


def bbit_minhash_pairs(
    ds: rd.Dataset,
    num_perm: int = 64,
    bands: int = 16,
    k: int = 8,
    threshold: float = 0.6,
) -> pa.Table:
    """b-bit minhash (Li & Koenig 2010, b = 1): store only the LOWEST
    bit of each of the 64 permutation minima — a 64x storage
    compression of the sketch — and estimate Jaccard from the bit
    AGREEMENT rate via the b=1 unbiased estimator
    ``J_hat = 2 * A - 1`` (collision probability of independent bits
    is 1/2, so A = 1/2 + J/2). Evaluated against the exact verified
    Jaccard on the LSH candidate pairs — the audit a 100 TB dedup run
    does before committing to the compressed sketch.

    Scale shape: signature low-bits pack to ONE uint64 per doc inside
    the same tasks-mode signature pass (bits for non-candidate docs
    are filtered out at the map stage by a broadcast id set); the
    per-pair agreement math runs on the pair-bounded table — the
    engine's documented driver budget (mmr/kmv finish class).

    Exactness: agree_bits is an integer popcount; ``est_jaccard_b1 =
    round((2 * agree - 64) / 64, 6)`` is exact at 6 decimals because
    k/64 is an exact 6-decimal rational; exact_jaccard rides from the
    SQL-checked verified pairs."""
    import ray

    pairs = minhash_lsh_pairs(
        ds, num_perm=num_perm, bands=bands, k=k, threshold=threshold,
        texts_handle=None,
    ).to_pandas()
    empty = pa.table(
        {
            "doc_id_a": pa.array([], pa.int64()),
            "doc_id_b": pa.array([], pa.int64()),
            "agree_bits": pa.array([], pa.int64()),
            "est_jaccard_b1": pa.array([], pa.float64()),
            "exact_jaccard": pa.array([], pa.float64()),
        }
    )
    if not len(pairs):
        return empty
    need = np.unique(
        np.concatenate(
            [pairs["a"].to_numpy(np.int64), pairs["b"].to_numpy(np.int64)]
        )
    )
    need_handle = ray.put(need)

    def lowbits(batch: pa.Table) -> pa.Table:
        want = ray.get(need_handle)
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        sub = batch.filter(pa.array(np.isin(ids, want)))
        if sub.num_rows == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "bits": pa.array([], pa.int64()),
                }
            )
        key = (num_perm, k)
        mh = _MINHASHER_CACHE.get(key)
        if mh is None:
            mh = _MINHASHER_CACHE[key] = MinHasher(num_perm=num_perm, k=k)
        sig_tbl = mh(sub)
        arr = sig_tbl.column("sig")
        arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
        sig = (
            np.asarray(arr.values, dtype=np.int64)
            .astype(np.uint64)
            .reshape(-1, num_perm)
        )
        packed = ((sig & np.uint64(1)) << np.arange(num_perm, dtype=np.uint64)[
            None, :
        ]).sum(axis=1, dtype=np.uint64)
        return pa.table(
            {
                "doc_id": sig_tbl.column("doc_id"),
                "bits": pa.array(packed.astype(np.int64)),
            }
        )

    bits = (
        ds.select_columns(["doc_id", "text"])
        .map_batches(lowbits, batch_format="pyarrow", batch_size=1024)
        .to_pandas()
    )
    lut = dict(
        zip(bits["doc_id"].to_numpy(np.int64), bits["bits"].to_numpy(np.uint64))
    )
    a_ids = pairs["a"].to_numpy(np.int64)
    b_ids = pairs["b"].to_numpy(np.int64)
    xa = np.array([lut[i] for i in a_ids], np.uint64)
    xb = np.array([lut[i] for i in b_ids], np.uint64)
    diff = np.bitwise_xor(xa, xb)
    agree = num_perm - np.array(
        [bin(int(x)).count("1") for x in diff], np.int64
    )
    est = np.round((2 * agree - num_perm) / num_perm, 6)
    return pa.table(
        {
            "doc_id_a": pa.array(a_ids),
            "doc_id_b": pa.array(b_ids),
            "agree_bits": pa.array(agree),
            "est_jaccard_b1": pa.array(est, pa.float64()),
            "exact_jaccard": pa.array(
                pairs["jaccard"].to_numpy(np.float64), pa.float64()
            ),
        }
    )


def dedup_threshold_curve(
    ds: rd.Dataset,
    thresholds_pct: tuple[int, ...] = (50, 60, 70, 80, 90),
    num_perm: int = 64,
    bands: int = 16,
    k: int = 8,
) -> pa.Table:
    """Threshold-calibration curve for the MinHash dedup: over the LSH
    CANDIDATE pair set (threshold-independent — banding fixes the
    recall curve), how many pairs verify at each exact-Jaccard cutoff,
    plus the per-cutoff survivor-candidate ratio in ppm. This is the
    report a curation team reads to pick the dedup threshold: the
    knee of verified-vs-cutoff is where near-dup mass ends and topical
    similarity begins.

    Scale shape: ONE LSH discovery pass (threshold 0 keeps every
    verified candidate with its exact Jaccard), then a constant-sized
    per-threshold count — the candidate table is pair-bounded. All
    counts integer; ratios are exact integer ppm."""
    pairs = minhash_lsh_pairs(
        ds, num_perm=num_perm, bands=bands, k=k, threshold=0.0,
        texts_handle=None,
    ).to_pandas()
    n_cand = len(pairs)
    j = (
        pairs["jaccard"].to_numpy(np.float64)
        if n_cand
        else np.empty(0, np.float64)
    )
    rows = []
    for t in thresholds_pct:
        n_ok = int((j >= t / 100.0).sum())
        rows.append(
            (
                int(t),
                n_cand,
                n_ok,
                1_000_000 * n_ok // n_cand if n_cand else 0,
            )
        )
    return pa.table(
        {
            "threshold_pct": pa.array([r[0] for r in rows], pa.int64()),
            "n_candidates": pa.array([r[1] for r in rows], pa.int64()),
            "n_verified": pa.array([r[2] for r in rows], pa.int64()),
            "verified_ppm": pa.array([r[3] for r in rows], pa.int64()),
        }
    )


def lsh_recall_audit(
    ds: rd.Dataset, *, k: int = 16, threshold: float = 0.6
) -> pa.Table:
    """Measured LSH RECALL against exact ground truth: the verified
    pair set from :func:`minhash_lsh_pairs` (banded LSH — can MISS
    pairs whose signatures never collide) counted against the COMPLETE
    pair set from :func:`ssjoin_pairs` (AllPairs prefix filtering —
    zero miss probability), both over the SAME k-byte shingle universe
    and the same 6dp-rounded Jaccard >= threshold verify, so
    found ⊆ true and ``recall_ppm = 1e6 * n_found // n_true`` is the
    banding scheme's true positive rate on this corpus — the number a
    dedup run quotes before trading the exact join away for LSH cost.

    Shape: two already-scale-safe discovery passes + pair-bounded
    driver counts (the kmv/mmr budget). Integer output."""
    true_pairs = ssjoin_pairs(ds, k=k, threshold=threshold).to_pandas()
    found = minhash_lsh_pairs(
        ds, k=k, threshold=threshold, texts_handle=None
    ).to_pandas()
    tset = set(zip(true_pairs["a"].astype(np.int64), true_pairs["b"].astype(np.int64)))
    fpairs = set(zip(found["a"].astype(np.int64), found["b"].astype(np.int64)))
    n_true = len(tset)
    n_found = len(fpairs & tset)
    assert fpairs <= tset, "verified LSH pairs must be a subset of exact"
    return pa.table(
        {
            "n_true": pa.array([n_true], pa.int64()),
            "n_found": pa.array([n_found], pa.int64()),
            "recall_ppm": pa.array(
                [1_000_000 * n_found // n_true if n_true else 1_000_000],
                pa.int64(),
            ),
        }
    )


def crossdoc_gram_dup(
    ds: rd.Dataset, k: int = 16, num_buckets: int = 64
) -> rd.Dataset:
    """Per-document CROSS-DOCUMENT substring duplication (the audit
    behind suffix-array exact-substring dedup, Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better"): the
    fraction of a document's DISTINCT k-byte grams that occur in at
    least one OTHER document. High dup_ppm = the document is largely
    assembled from text that exists elsewhere in the corpus — the
    candidate set an exact-substring dedup pass would cut.

    Scale shape: per-batch (doc_id, gram-hash) DISTINCT rows from one
    vectorized rolling-FNV pass over the flat utf8 buffer
    (:func:`_unique_shingles` — a doc is one row, so per-doc distinct
    is batch-local and globally exact); the ONLY exchange is the
    int-only gram-bucket shuffle (all holders of a gram share a
    bucket); each bucket reduce sorts once, marks grams held by >= 2
    docs, and emits per-doc PARTIAL (n_grams, n_dup) counts; a final
    doc-bucket aggregate folds partials. dup_ppm is integer
    floor-division, bit-stable. Output: (doc_id, n_grams,
    n_dup_grams, dup_ppm)."""
    from vietnamese_ocr_ray.functions.agg import hash_aggregate
    from vietnamese_ocr_ray.functions.joins import key_bucket

    def partial(b: pa.Table) -> pa.Table:
        arr = b.column("text")
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        offs, data = _utf8_flat(arr)
        rows, hs = _unique_shingles(offs, data, k)
        doc = np.asarray(b.column("doc_id"), dtype=np.int64)[rows]
        g = hs.view(np.int64)
        return pa.table(
            {
                "_bucket": pa.array(
                    key_bucket(pa.array(g), num_buckets).astype(np.int32)
                ),
                "g": pa.array(g),
                "doc_id": pa.array(doc),
            }
        )

    def bucket_reduce(t: pa.Table) -> pa.Table:
        g = np.asarray(t.column("g"), dtype=np.int64)
        doc = np.asarray(t.column("doc_id"), dtype=np.int64)
        order = np.argsort(g, kind="stable")
        gs, ds_ = g[order], doc[order]
        starts = np.flatnonzero(
            np.concatenate(([True], gs[1:] != gs[:-1]))
        )
        sizes = np.diff(np.append(starts, gs.shape[0]))
        dup = np.repeat(sizes >= 2, sizes).astype(np.int64)
        out = pa.table(
            {
                "doc_id": pa.array(ds_),
                "n_grams": pa.array(np.ones(ds_.shape[0], np.int64)),
                "n_dup": pa.array(dup),
            }
        )
        return out.group_by("doc_id").aggregate(
            [("n_grams", "sum"), ("n_dup", "sum")]
        ).rename_columns(["doc_id", "n_grams", "n_dup"])

    per_doc = hash_aggregate(
        ds.select_columns(["doc_id", "text"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(bucket_reduce, batch_format="pyarrow"),
        ["doc_id"],
        {"n_grams": ("n_grams", "sum"), "n_dup_grams": ("n_dup", "sum")},
        num_buckets=num_buckets,
    )

    def finish(b: pa.Table) -> pa.Table:
        ng = np.asarray(b.column("n_grams"), dtype=np.int64)
        nd = np.asarray(b.column("n_dup_grams"), dtype=np.int64)
        return pa.table(
            {
                "doc_id": pc.cast(b.column("doc_id"), pa.int64()),
                "n_grams": pa.array(ng),
                "n_dup_grams": pa.array(nd),
                "dup_ppm": pa.array(1_000_000 * nd // np.maximum(ng, 1)),
            }
        )

    return per_doc.map_batches(finish, batch_format="pyarrow").sort("doc_id")


def dedup_gram_survivors(
    ds: rd.Dataset, k: int = 16, max_dup_ppm: int = 800_000
) -> rd.Dataset:
    """The APPLY step of :func:`crossdoc_gram_dup`: keep documents
    whose cross-document gram duplication is below ``max_dup_ppm``
    (the Lee-et-al "drop docs that are mostly other documents" rule;
    0.8 is the conventional cut). Streams the audit's per-doc table
    through a threshold filter — no additional shuffle. Output:
    (doc_id, dup_ppm) of survivors, doc_id-sorted."""

    def keep(b: pa.Table) -> pa.Table:
        m = pc.less(
            pc.cast(b.column("dup_ppm"), pa.int64()),
            pa.scalar(max_dup_ppm, pa.int64()),
        )
        t = b.filter(m)
        return pa.table(
            {
                "doc_id": pc.cast(t.column("doc_id"), pa.int64()),
                "dup_ppm": pc.cast(t.column("dup_ppm"), pa.int64()),
            }
        )

    return crossdoc_gram_dup(ds, k=k).map_batches(
        keep, batch_format="pyarrow"
    )


def minhash_probe_pairs(
    ds: rd.Dataset,
    *,
    index_permille: int = 800,
    salt: str = "ix:",
    num_perm: int = 64,
    bands: int = 16,
    k: int = 8,
    threshold: float = 0.6,
    cap: int = 200,
) -> rd.Dataset:
    """INCREMENTAL near-dup: probe a batch of NEW documents against an
    already-indexed corpus without re-pairing the index against itself
    — the shape of a production dedup service ingesting a fresh crawl
    (the index's own pairs were resolved when it was built; only
    new-vs-index collisions matter now). Index membership here is the
    deterministic ``hash_sample`` band of doc_id (SQL-replayable), so
    the split — and therefore the pair set — is partitioning- and
    rerun-stable.

    Scale shape: identical to :func:`minhash_lsh_pairs` (one signature
    pass over ALL docs, one band-bucket shuffle) except the per-bucket
    expansion pairs INDEX x PROBE members only — a collision run of
    m_i index and m_p probe members emits m_i * m_p pairs instead of
    C(m_i + m_p, 2): the index-side quadratic term never exists.
    Verification is the corpus-join mode (no broadcast texts). Output:
    (a = index doc, b = probe doc, jaccard >= threshold)."""
    from vietnamese_ocr_ray.functions.sampling import FP_MOD, _poly_hash

    def role_of(ids: pa.Array) -> np.ndarray:
        keys = pc.binary_join_element_wise(
            pa.scalar(salt), pc.cast(ids, pa.string()), pa.scalar("")
        )
        fp = _poly_hash(keys)
        mixed = (fp * fp % FP_MOD) * fp % FP_MOD
        return (mixed % 1000 < index_permille).astype(np.int64)  # 1=index

    def sigs_fn(batch: pa.Table) -> pa.Table:
        key = (num_perm, k)
        mh = _MINHASHER_CACHE.get(key)
        if mh is None:
            mh = _MINHASHER_CACHE[key] = MinHasher(num_perm=num_perm, k=k)
        return mh(batch)

    sigs = ds.select_columns(["doc_id", "text"]).map_batches(
        sigs_fn, batch_format="pyarrow", batch_size=1024
    )
    num_coarse = 32

    def band_with_role(b: pa.Table) -> pa.Table:
        t = _band_rows(b, bands)
        ids = t.column("doc_id")
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        is_index = role_of(ids)
        return t.append_column("is_index", pa.array(is_index)).append_column(
            "bucket",
            pa.array(
                (
                    np.asarray(t.column("band_hash")).astype(np.uint64)
                    % np.uint64(num_coarse)
                ).astype(np.int32)
            ),
        )

    band_rows = sigs.map_batches(band_with_role, batch_format="pyarrow")

    def cross_pairs(g: pd.DataFrame) -> pa.Table:
        s = g.sort_values(
            ["band", "band_hash", "is_index", "doc_id"], kind="stable"
        )
        band = s["band"].to_numpy()
        bh = s["band_hash"].to_numpy()
        ids = s["doc_id"].to_numpy(np.int64)
        role = s["is_index"].to_numpy(np.int64)
        n = ids.shape[0]
        out_a, out_b = [], []
        if n:
            change = np.ones(n, dtype=bool)
            change[1:] = (band[1:] != band[:-1]) | (bh[1:] != bh[:-1])
            starts = np.nonzero(change)[0]
            sizes = np.diff(np.append(starts, n))
            for st, m in zip(starts, sizes):
                mm = int(min(m, cap))
                seg_role = role[st : st + mm]
                seg_ids = ids[st : st + mm]
                # probes sort first (is_index 0), index after
                npb = int((seg_role == 0).sum())
                if npb == 0 or npb == mm:
                    continue
                probe = seg_ids[:npb]
                index = seg_ids[npb:]
                ii, jj = np.meshgrid(
                    np.arange(index.shape[0]),
                    np.arange(probe.shape[0]),
                    indexing="ij",
                )
                out_a.append(index[ii.ravel()])
                out_b.append(probe[jj.ravel()])
        a = np.concatenate(out_a) if out_a else np.empty(0, np.int64)
        b = np.concatenate(out_b) if out_b else np.empty(0, np.int64)
        return pa.table({"a": pa.array(a), "b": pa.array(b)})

    candidates = band_rows.groupby("bucket").map_groups(
        lambda g: cross_pairs(g.drop(columns=["bucket"])),
        batch_format="pandas",
    )
    distinct = (
        candidates.map_batches(
            lambda b: b.append_column(
                "bucket",
                pa.array(
                    (
                        np.asarray(b.column("a")).astype(np.int64) % num_coarse
                    ).astype(np.int32)
                ),
            ),
            batch_format="pyarrow",
        )
        .groupby("bucket")
        .map_groups(
            lambda g: pa.Table.from_pandas(
                g.drop(columns=["bucket"]).drop_duplicates(["a", "b"]),
                preserve_index=False,
            ).replace_schema_metadata(None),
            batch_format="pandas",
        )
    )
    return verify_pairs_corpus(
        distinct, ds, k=k, threshold=threshold, num_coarse=num_coarse
    )
