"""Membership operators: vectorized Bloom filter (Bloom 1970) + broadcast semi/anti
joins.

The guide-pattern for semi/anti joins at scale: broadcast the key set
(exact, when it fits) or a Bloom filter of it (when it doesn't), filter
inside map_batches — no shuffle. The Bloom path is a PREFILTER: it
never drops a true member (no false negatives), so an exact residual
check only runs on the ~1% of rows the filter passes (semi) — for
anti-joins the filter alone suffices when the false-positive rate is
acceptable, else verify survivors exactly.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd


class BloomFilter:
    """Plain vectorized Bloom filter over int64/uint64 keys: k index
    hashes derived from one splitmix64 avalanche via double hashing
    (h1 + i*h2). Mergeable by OR."""

    def __init__(
        self,
        n_expected: int,
        fpr: float = 0.01,
        m: int | None = None,
        k: int | None = None,
    ):
        if m is None:
            m = int(-n_expected * np.log(fpr) / (np.log(2) ** 2)) + 64
            m = 1 << int(np.ceil(np.log2(m)))  # power of two: cheap mod
        assert m & (m - 1) == 0, "m must be a power of two"
        self.m = m
        if k is None:
            k = max(1, int(round(self.m / max(1, n_expected) * np.log(2))))
        self.k = k
        self.bits = np.zeros(self.m // 64, dtype=np.uint64)

    @staticmethod
    def _mix(h: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        h = h.astype(np.uint64).copy()
        h ^= h >> np.uint64(30)
        h *= np.uint64(0xBF58476D1CE4E5B9)
        h ^= h >> np.uint64(27)
        h1 = h * np.uint64(0x94D049BB133111EB)
        h2 = (h ^ (h >> np.uint64(31))) | np.uint64(1)
        return h1, h2

    def _positions(self, keys: np.ndarray) -> np.ndarray:
        h1, h2 = self._mix(keys)
        i = np.arange(self.k, dtype=np.uint64)[None, :]
        return ((h1[:, None] + i * h2[:, None]) % np.uint64(self.m)).astype(np.int64)

    def add(self, keys: np.ndarray) -> None:
        pos = self._positions(np.asarray(keys))
        word, bit = pos >> 6, pos & 63
        np.bitwise_or.at(
            self.bits, word.reshape(-1), np.uint64(1) << bit.reshape(-1).astype(np.uint64)
        )

    def contains(self, keys: np.ndarray) -> np.ndarray:
        pos = self._positions(np.asarray(keys))
        word, bit = pos >> 6, pos & 63
        hits = (self.bits[word] >> bit.astype(np.uint64)) & np.uint64(1)
        return hits.all(axis=1)


def anti_join_keys(
    ds: rd.Dataset,
    keys: np.ndarray,
    key_col: str,
    *,
    use_bloom: bool | None = None,
) -> rd.Dataset:
    """Rows of ``ds`` whose key_col is NOT in ``keys``. Exact: Bloom
    prefilter (no false negatives -> a row flagged 'absent' truly is)
    plus an exact np.isin check for rows the Bloom thinks are present
    (false-positive rescue)."""
    import ray

    keys = np.asarray(keys, dtype=np.int64)
    if use_bloom is None:
        use_bloom = keys.size > 1_000_000
    bloom = None
    if use_bloom:
        bloom = BloomFilter(keys.size)
        bloom.add(keys)
    handle = ray.put((keys, bloom))

    def filt(batch: pa.Table) -> pa.Table:
        ks, bf = ray.get(handle)
        col = np.asarray(batch.column(key_col), dtype=np.int64)
        if bf is not None:
            maybe = bf.contains(col)  # rows possibly in the key set
            absent = ~maybe
            # exact rescue only on the (small) maybe-set
            idx = np.nonzero(maybe)[0]
            if idx.size:
                absent[idx] = ~np.isin(col[idx], ks)
        else:
            absent = ~np.isin(col, ks)
        return batch.filter(pa.array(absent))

    return ds.map_batches(filt, batch_format="pyarrow")


def semi_join_keys(ds: rd.Dataset, keys: np.ndarray, key_col: str) -> rd.Dataset:
    """Rows of ``ds`` whose key_col IS in ``keys`` (broadcast exact)."""
    import ray

    handle = ray.put(np.asarray(keys, dtype=np.int64))

    def filt(batch: pa.Table) -> pa.Table:
        ks = ray.get(handle)
        col = np.asarray(batch.column(key_col), dtype=np.int64)
        return batch.filter(pa.array(np.isin(col, ks)))

    return ds.map_batches(filt, batch_format="pyarrow")


def bloom_semijoin_audit(
    probe: rd.Dataset,
    keys: np.ndarray,
    probe_col: str,
    k: int = 2,
) -> rd.Dataset:
    """Bloom-prefiltered semi-join AUDIT: build a Bloom filter over the
    (broadcast-small) build-side key set, probe every row of the big
    side, and report exactly how well the prefilter did — candidate
    rows, true matches, false positives, and the realized FP rate over
    the true negatives. This value-checks the whole hash path
    (splitmix64 avalanche + double hashing h1 + i*h2 against the m-bit
    table), which the exact anti/semi joins rescue away.

    Sizing is deterministic and scale-adaptive so the SQL oracle can
    replay it: m = 2^bitlen(8*n_build - 1) (the next power of two at or
    above 8 bits/key), k fixed.

    Scale shape: the key set is the broadcast small side (ray.put once,
    read per task); the probe side streams — per-batch integer partial
    counts (rows, bloom-candidates, exact matches via np.isin rescue),
    ONE global Sum aggregate; a single row reaches the driver."""
    import ray

    from ray.data.aggregate import Sum

    keys = np.unique(np.asarray(keys, dtype=np.int64))
    n_build = int(keys.size)
    m = 1 << int(8 * n_build - 1).bit_length()
    bf = BloomFilter(n_build, m=m, k=k)
    bf.add(keys)
    handle = ray.put((keys, bf))

    def partial(batch: pa.Table) -> pa.Table:
        ks, filt = ray.get(handle)
        col = np.asarray(batch.column(probe_col), dtype=np.int64)
        cand = filt.contains(col)
        match = np.zeros(len(col), dtype=bool)
        idx = np.nonzero(cand)[0]  # no false negatives: match => cand
        if idx.size:
            match[idx] = np.isin(col[idx], ks)
        return pa.table(
            {
                "n": pa.array([len(col)], pa.int64()),
                "cand": pa.array([int(cand.sum())], pa.int64()),
                "match": pa.array([int(match.sum())], pa.int64()),
            }
        )

    agg = probe.map_batches(partial, batch_format="pyarrow").aggregate(
        Sum("n", alias_name="n"),
        Sum("cand", alias_name="cand"),
        Sum("match", alias_name="match"),
    )
    n, cand, match = int(agg["n"]), int(agg["cand"]), int(agg["match"])
    fp = cand - match
    neg = n - match
    fp_rate = round(float(fp) / float(neg), 6) if neg else 0.0
    return rd.from_arrow(
        pa.table(
            {
                "n_probed": pa.array([n], pa.int64()),
                "n_build_keys": pa.array([n_build], pa.int64()),
                "m_bits": pa.array([m], pa.int64()),
                "n_candidates": pa.array([cand], pa.int64()),
                "n_matches": pa.array([match], pa.int64()),
                "n_false_positives": pa.array([fp], pa.int64()),
                "fp_rate": pa.array([fp_rate], pa.float64()),
            }
        )
    )
