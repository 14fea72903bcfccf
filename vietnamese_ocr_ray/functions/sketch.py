"""Cardinality operators.

* ``distinct_token_count`` — EXACT distributed count-distinct: per-batch
  partial dedup (the combiner that keeps the shuffle proportional to
  distinct values, not rows) -> global unique -> count.
* ``HllSketch`` / ``approx_distinct_tokens`` — HyperLogLog: one fixed
  2^p-register sketch per batch, merged by a tiny aggregate. The
  mergeable-sketch pattern for 10^12-row cardinalities where even the
  distinct set is too large to shuffle.
"""

from __future__ import annotations

import math
import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from ray.data.aggregate import Sum

from vietnamese_ocr_ray.functions.dedup import content_hash64


def distinct_token_count(ds: rd.Dataset, text_col: str = "text") -> pa.Table:
    """Exact distinct whitespace-token count (SQL-mirrorable)."""

    def partial_distinct(batch: pa.Table) -> pa.Table:
        toks = pc.list_flatten(pc.split_pattern(batch.column(text_col), " "))
        return pa.table({"tok": pc.unique(toks)})

    uniq = ds.map_batches(partial_distinct, batch_format="pyarrow").unique("tok")
    return pa.table({"n_distinct_tokens": pa.array([len(uniq)], pa.int64())})


class HllSketch:
    """Minimal HyperLogLog (Flajolet et al. 2007): p-bit register index,
    rank of remaining bits, harmonic-mean estimate with the standard
    bias constant and small-range (linear counting) correction."""

    def __init__(self, p: int = 12):
        self.p = p
        self.m = 1 << p
        self.registers = np.zeros(self.m, dtype=np.uint8)

    @staticmethod
    def _finalize(h: np.ndarray) -> np.ndarray:
        """splitmix64-style avalanche: FNV's high bits are too weak for
        register indexing (measured: 96% cardinality underestimate)."""
        h = h.copy()
        h ^= h >> np.uint64(30)
        h *= np.uint64(0xBF58476D1CE4E5B9)
        h ^= h >> np.uint64(27)
        h *= np.uint64(0x94D049BB133111EB)
        h ^= h >> np.uint64(31)
        return h

    def add_hashes(self, h: np.ndarray) -> None:
        h = self._finalize(h)
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        rest = h << np.uint64(self.p)
        # rank = leading zeros of the remaining 64-p bits + 1 (capped)
        rank = np.full(h.shape[0], 64 - self.p + 1, dtype=np.uint8)
        nz = rest != 0
        if nz.any():
            bits = rest[nz]
            lz = np.zeros(bits.shape[0], dtype=np.int64)
            cur = bits
            for shift in (32, 16, 8, 4, 2, 1):
                mask = cur < (np.uint64(1) << np.uint64(64 - shift))
                lz[mask] += shift
                cur = np.where(mask, cur << np.uint64(shift), cur)
            rank[nz] = (lz + 1).astype(np.uint8)
        np.maximum.at(self.registers, idx, rank)

    def merge(self, other: "HllSketch") -> "HllSketch":
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    def estimate(self) -> float:
        m = float(self.m)
        alpha = 0.7213 / (1.0 + 1.079 / m)
        # register sum as an EXACT integer (sum of 2^-reg scaled by
        # 2^64): the float total is then one deterministic cast +
        # divide, so any independent replay (the DuckDB oracle) that
        # builds the same integer gets the bit-identical estimate —
        # a float accumulation order would differ in the last ulp.
        counts = np.bincount(self.registers, minlength=65)
        s_int = sum(int(c) << (64 - r) for r, c in enumerate(counts) if c)
        e = alpha * m * m * 18446744073709551616.0 / float(s_int)
        zeros = int(counts[0])
        if e <= 2.5 * m and zeros:
            e = m * np.log(m / zeros)  # linear counting
        return float(e)

    def to_bytes(self) -> bytes:
        return self.registers.tobytes()

    @classmethod
    def from_bytes(cls, b: bytes, p: int = 12) -> "HllSketch":
        s = cls(p)
        s.registers = np.frombuffer(b, dtype=np.uint8).copy()
        return s


def approx_distinct_tokens(
    ds: rd.Dataset, text_col: str = "text", p: int = 12
) -> pa.Table:
    """HLL estimate of distinct tokens: one serialized sketch per batch,
    merged in a second tiny stage (sketches are designed to merge)."""
    def sketch_batch(batch: pa.Table) -> pa.Table:
        toks = pc.unique(
            pc.list_flatten(pc.split_pattern(batch.column(text_col), " "))
        )
        s = HllSketch(p)
        if len(toks):
            s.add_hashes(content_hash64(toks))
        return pa.table({"sketch": pa.array([s.to_bytes()], pa.binary())})

    merged = HllSketch(p)
    for b in ds.map_batches(sketch_batch, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        for raw in b.column("sketch").to_pylist():
            merged.merge(HllSketch.from_bytes(raw, p))
    return pa.table(
        {"approx_distinct_tokens": pa.array([int(math.floor(merged.estimate() + 0.5))], pa.int64())}
    )


# ---------------------------------------------------------------------------
# Mergeable quantile summary (the scale path for grouped quantiles)
# ---------------------------------------------------------------------------


class QuantileSummary:
    """Deterministic mergeable quantile summary: a bounded, SORTED
    sample where each kept value carries the count of raw values it
    represents (its weight). Built per batch, merged associatively
    (concat-sort + weight-preserving compaction to ``capacity``), and
    queried by weighted-rank interpolation — the Greenwald-Khanna /
    t-digest ROLE with a deliberately simple compaction whose rank
    error is bounded by (total weight / capacity) per compaction pass.

    Use where relational.value_quantiles' exact per-group sort cannot:
    groups larger than a task's heap. Everything is deterministic
    (no RNG), so reruns and different partitionings agree exactly.
    """

    __slots__ = ("capacity", "values", "weights")

    def __init__(self, capacity: int = 512, values=None, weights=None):
        self.capacity = capacity
        self.values = np.empty(0) if values is None else values
        self.weights = np.empty(0, np.int64) if weights is None else weights

    @classmethod
    def of(cls, x: np.ndarray, capacity: int = 512) -> "QuantileSummary":
        s = cls(capacity)
        v = np.sort(np.asarray(x, np.float64))
        s.values, s.weights = v, np.ones(v.shape[0], np.int64)
        s._compact()
        return s

    def merge(self, other: "QuantileSummary") -> "QuantileSummary":
        v = np.concatenate([self.values, other.values])
        w = np.concatenate([self.weights, other.weights])
        order = np.argsort(v, kind="stable")
        self.values, self.weights = v[order], w[order]
        self._compact()
        return self

    def _compact(self) -> None:
        n = self.values.shape[0]
        if n <= self.capacity:
            return
        # weighted-rank strided selection: keep the value at every
        # (total/capacity)-th unit of weight; sum weights into the kept
        # representative to stay lossless in total mass
        cum = np.cumsum(self.weights)
        total = cum[-1]
        targets = (np.arange(self.capacity, dtype=np.float64) + 0.5) * (
            total / self.capacity
        )
        idx = np.searchsorted(cum, targets, side="left")
        # the max element must stay a representative or the tail mass
        # beyond the last stride target would be dropped
        idx = np.unique(np.append(np.minimum(idx, n - 1), n - 1))
        # weight of representative i = raw mass between its rank bounds
        bounds = np.concatenate([[0], cum[idx]])
        self.values = self.values[idx]
        self.weights = np.diff(bounds).astype(np.int64)
        # searchsorted of strictly increasing targets keeps weights > 0
        assert (self.weights > 0).all() and self.weights.sum() == total

    def quantile(self, q: float) -> float:
        """Weighted-rank linear interpolation (matches numpy 'linear'
        exactly while the summary is uncompacted)."""
        cum = np.cumsum(self.weights)
        total = cum[-1]
        rank = q * (total - 1)
        # position of each kept value = midrank of its weight span
        pos = cum - 1.0 - (self.weights - 1) / 2.0
        i = np.searchsorted(pos, rank, side="right")
        if i == 0:
            return float(self.values[0])
        if i >= self.values.shape[0]:
            return float(self.values[-1])
        lo, hi = pos[i - 1], pos[i]
        f = 0.0 if hi == lo else (rank - lo) / (hi - lo)
        return float(self.values[i - 1] + f * (self.values[i] - self.values[i - 1]))

    def serialize(self) -> bytes:
        return (
            np.int64(self.capacity).tobytes()
            + np.int64(self.values.shape[0]).tobytes()
            + self.values.astype(np.float64).tobytes()
            + self.weights.astype(np.int64).tobytes()
        )

    @classmethod
    def deserialize(cls, b: bytes) -> "QuantileSummary":
        cap = int(np.frombuffer(b[:8], np.int64)[0])
        n = int(np.frombuffer(b[8:16], np.int64)[0])
        v = np.frombuffer(b[16 : 16 + 8 * n], np.float64).copy()
        w = np.frombuffer(b[16 + 8 * n : 16 + 16 * n], np.int64).copy()
        return cls(cap, v, w)


def approx_quantiles(
    ds: rd.Dataset,
    value_col: str,
    qs: tuple[float, ...] = (0.5, 0.95),
    capacity: int = 512,
) -> pa.Table:
    """Distributed approximate quantiles: one summary per batch, one
    pairwise-merge reduction — never materializes or sorts the column.
    Deterministic across reruns and partitionings."""

    def sketch_batch(batch: pa.Table) -> pa.Table:
        s = QuantileSummary.of(
            np.asarray(batch.column(value_col), np.float64), capacity
        )
        return pa.table({"sketch": pa.array([s.serialize()], pa.binary())})

    parts = ds.map_batches(sketch_batch, batch_format="pyarrow")
    merged = None
    for b in parts.iter_batches(batch_format="pyarrow"):
        for blob in b.column("sketch").to_pylist():
            s = QuantileSummary.deserialize(blob)
            merged = s if merged is None else merged.merge(s)
    if merged is None:
        return pa.table({f"p{int(q*100)}": pa.array([], pa.float64()) for q in qs})
    return pa.table(
        {f"p{int(q*100)}": pa.array([merged.quantile(q)]) for q in qs}
    )


def grouped_approx_quantiles(
    ds: rd.Dataset,
    key_col: str,
    value_col: str,
    qs: tuple[float, ...] = (0.5, 0.95),
    capacity: int = 512,
    num_buckets: int = 32,
) -> rd.Dataset:
    """Per-group approximate quantiles at unbounded group size: each
    batch emits one serialized summary per (group) it saw (the
    combiner — shuffle volume is O(groups x blocks x capacity), never
    O(rows)), groups hash-bucket, and each bucket merges its groups'
    sketches. The grouped twin of relational.value_quantiles for
    groups that no longer fit a task's heap."""
    import pandas as pd

    from vietnamese_ocr_ray.functions.joins import key_bucket

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "k": batch.column(key_col).to_pandas(),
                "v": np.asarray(batch.column(value_col), np.float64),
            }
        )
        rows_k, rows_s = [], []
        for k, g in df.groupby("k", sort=False):
            rows_k.append(k)
            rows_s.append(QuantileSummary.of(g["v"].to_numpy(), capacity).serialize())
        t = pa.table(
            {key_col: pa.array(rows_k), "sketch": pa.array(rows_s, pa.binary())}
        )
        return t.append_column(
            "_bucket",
            pa.array(key_bucket(t.column(key_col), num_buckets).astype(np.int32)),
        )

    def merge_bucket(g: pd.DataFrame) -> pd.DataFrame:
        out = {key_col: [], **{f"p{int(q*100)}": [] for q in qs}}
        for k, rows in g.groupby(key_col, sort=False):
            s = None
            for blob in rows["sketch"]:
                part = QuantileSummary.deserialize(blob)
                s = part if s is None else s.merge(part)
            out[key_col].append(k)
            for q in qs:
                out[f"p{int(q*100)}"].append(s.quantile(q))
        return pd.DataFrame(out)

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(merge_bucket, batch_format="pandas")
    )


def histogram_quantiles(
    ds: rd.Dataset,
    value_col: str,
    qs: tuple[float, ...] = (0.5, 0.95),
    inv_width: int = 4,
) -> pa.Table:
    """Fixed-grid histogram quantiles — the SQL-verifiable twin of
    :func:`approx_quantiles` (the ``simhash_tokens`` pattern: same
    role, closed-form semantics so DuckDB can replay it bit-for-bit).

    Each value maps to bucket ``floor(value * inv_width)`` —
    ``inv_width`` is a power of two, so the multiply only shifts the
    exponent and is EXACT on any IEEE double.  Bucket counts are exact
    integers (one distributed hash-aggregate), hence layout- and
    merge-order-invariant, unlike the compaction summary whose
    estimates track block boundaries.  The estimate for quantile ``q``
    is the MIDPOINT of the bucket holding rank ``floor(q * (n - 1))``
    — ``(2*bucket + 1) / (2*inv_width)``, again exact binary floats —
    so the absolute error is bounded by half the bucket width,
    ``1 / (2 * inv_width)``.

    Scale: shuffle volume is O(distinct buckets x blocks), bounded by
    the value RANGE over the grid, never by row count; the driver
    holds only the tiny bucket table (documented heap assumption:
    value range / width fits in memory — pick ``inv_width`` for the
    column's dynamic range).
    """
    import math

    from vietnamese_ocr_ray.functions.agg import hash_aggregate

    def to_buckets(batch: pa.Table) -> pa.Table:
        v = np.asarray(batch.column(value_col), np.float64)
        b = np.floor(v * inv_width).astype(np.int64)
        u, c = np.unique(b, return_counts=True)
        return pa.table(
            {"bucket": pa.array(u), "n": pa.array(c.astype(np.int64))}
        )

    buckets = hash_aggregate(
        ds.map_batches(to_buckets, batch_format="pyarrow"),
        ["bucket"],
        {"n": ("n", "sum")},
    ).to_pandas()  # bounded by value range / width, never by rows
    if len(buckets) == 0:
        return pa.table(
            {"q": pa.array([], pa.float64()), "est": pa.array([], pa.float64())}
        )
    buckets = buckets.sort_values("bucket").reset_index(drop=True)
    cum = buckets["n"].to_numpy(np.int64).cumsum()
    total = int(cum[-1])
    ests = []
    for q in qs:
        # rank and midpoint written exactly as the SQL oracle computes
        # them, so the outputs are bit-identical doubles
        rank = math.floor(q * (total - 1))
        i = int(np.searchsorted(cum, rank, side="right"))
        b = int(buckets["bucket"].iloc[i])
        ests.append((2 * b + 1) / (2 * inv_width))
    return pa.table(
        {
            "q": pa.array(list(qs), pa.float64()),
            "est": pa.array(ests, pa.float64()),
        }
    )


def grouped_histogram_quantiles(
    ds: rd.Dataset,
    key_col: str,
    value_col: str,
    qs: tuple[float, ...] = (0.5, 0.95),
    inv_width: int = 4,
) -> rd.Dataset:
    """Per-group fixed-grid histogram quantiles — the SQL-verifiable
    grouped twin of :func:`grouped_approx_quantiles`, same closed-form
    semantics as :func:`histogram_quantiles` per key (bucket =
    ``floor(value * inv_width)``, exact on any IEEE double; estimate =
    midpoint of the bucket at rank ``floor(q * (n_k - 1))``; error
    bound ``1/(2*inv_width)``).

    Scale: the per-batch combiner emits (key, bucket, count) partials
    — shuffle volume O(groups x range x blocks), never O(rows) — then
    ONE distributed hash-aggregate plus a per-key ``map_groups``
    selection, so no group's raw values ever co-locate and the driver
    never materializes anything. Output is long-format
    (key, q, est), one row per (group, quantile).
    """
    import pandas as pd

    from vietnamese_ocr_ray.functions.agg import hash_aggregate

    def to_buckets(batch: pa.Table) -> pa.Table:
        v = np.asarray(batch.column(value_col), np.float64)
        t = pa.table(
            {
                key_col: batch.column(key_col),
                "bucket": pa.array(np.floor(v * inv_width).astype(np.int64)),
            }
        )
        g = t.group_by([key_col, "bucket"]).aggregate([([], "count_all")])
        return g.rename_columns([key_col, "bucket", "n"])

    counts = hash_aggregate(
        ds.map_batches(to_buckets, batch_format="pyarrow"),
        [key_col, "bucket"],
        {"n": ("n", "sum")},
    )

    def select(g: pd.DataFrame) -> pd.DataFrame:
        import math

        g = g.sort_values("bucket")
        cum = g["n"].to_numpy(np.int64).cumsum()
        total = int(cum[-1])
        ests = []
        for q in qs:
            # rank and midpoint written exactly as the SQL oracle
            # computes them: bit-identical doubles
            rank = math.floor(q * (total - 1))
            b = int(g["bucket"].iloc[int(np.searchsorted(cum, rank, side="right"))])
            ests.append((2 * b + 1) / (2 * inv_width))
        return pd.DataFrame(
            {
                key_col: [g[key_col].iloc[0]] * len(qs),
                "q": np.asarray(qs, np.float64),
                "est": np.asarray(ests, np.float64),
            }
        )

    return counts.groupby(key_col).map_groups(select, batch_format="pandas")


# ---------------------------------------------------------------------------
# Count-Min sketch (Cormode & Muthukrishnan 2005) — heavy hitters
# ---------------------------------------------------------------------------


class CountMinSketch:
    """Count-Min: ``depth`` hash rows x ``width`` counters, point
    estimate = min over rows (one-sided: never under-counts). Mergeable
    by elementwise add, so per-batch sketches combine exactly like the
    HLL path. Row hashes derive from one 64-bit content hash via
    independent odd-multiplier mixes (no rehash of the strings)."""

    _MULTS = np.array(
        [0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F, 0x165667B19E3779F9, 0x27D4EB2F165667C5],
        dtype=np.uint64,
    )

    def __init__(self, depth: int = 4, width: int = 2048):
        assert depth <= len(self._MULTS)
        assert width > 0 and (width & (width - 1)) == 0, "width must be 2^k"
        self.depth, self.width = depth, width
        self.table = np.zeros((depth, width), np.int64)
        # take the HIGH bits of the multiplicative mix: mod-2^k of the
        # low bits is a bijection of h's low bits, which would give
        # every depth row the same collision structure
        self._shift = np.uint64(64 - (int(width).bit_length() - 1))

    def _indices(self, h: np.ndarray) -> np.ndarray:
        """(depth, n) counter indices for n item hashes."""
        with np.errstate(over="ignore"):
            mixed = h[None, :] * self._MULTS[: self.depth, None]
        return (mixed >> self._shift) % np.uint64(self.width)

    def add_hashes(self, h: np.ndarray, counts: np.ndarray) -> None:
        idx = self._indices(h.astype(np.uint64))
        for d in range(self.depth):
            np.add.at(self.table[d], idx[d].astype(np.int64), counts)

    def estimate_hashes(self, h: np.ndarray) -> np.ndarray:
        idx = self._indices(h.astype(np.uint64))
        ests = np.stack(
            [self.table[d][idx[d].astype(np.int64)] for d in range(self.depth)]
        )
        return ests.min(axis=0)

    def merge(self, other: "CountMinSketch") -> "CountMinSketch":
        self.table += other.table
        return self

    def to_bytes(self) -> bytes:
        return self.table.tobytes()

    @classmethod
    def from_bytes(cls, b: bytes, depth: int = 4, width: int = 2048) -> "CountMinSketch":
        s = cls(depth, width)
        s.table = np.frombuffer(b, np.int64).reshape(depth, width).copy()
        return s


def heavy_hitters_cms(
    ds: rd.Dataset,
    text_col: str = "text",
    k: int = 10,
    candidates_per_batch: int | None = 32,
    depth: int = 4,
    width: int = 2048,
) -> pa.Table:
    """Approximate top-``k`` tokens by total count via Count-Min.

    One pass: each batch emits (a) its serialized CMS over ALL its
    token counts and (b) its local top-``candidates_per_batch`` tokens
    (a heavy global token is heavy in some batch, so the candidate
    union covers the true top-k for any skewed stream). The driver
    merges block-count sketches (bounded, exactly the HLL shape),
    unions the candidate sets, and ranks candidates by CMS estimate
    (ties: token asc). The streaming candidate heuristic makes the
    result layout-sensitive (tail-of-top-k membership can track batch
    boundaries); ``candidates_per_batch=None`` ranks EVERY distinct
    token instead — a pure data function (layout-invariant and
    SQL-replayable, still carrying CMS collision noise) for corpora
    whose vocabulary fits the driver. tests/test_functions.py checks
    the one-sided guarantee (estimate >= true count) and exact-top-k
    recovery."""

    def sketch_batch(batch: pa.Table) -> pa.Table:
        toks = pc.list_flatten(pc.split_pattern(batch.column(text_col), " "))
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        vc = toks.value_counts()
        vals = vc.field("values")
        counts = vc.field("counts").to_numpy(zero_copy_only=False).astype(np.int64)
        s = CountMinSketch(depth, width)
        if len(vals):
            s.add_hashes(content_hash64(vals), counts)
        ncand = len(counts) if candidates_per_batch is None else candidates_per_batch
        top = np.argsort(-counts, kind="stable")[:ncand]
        return pa.table(
            {
                "sketch": pa.array([s.to_bytes()] + [None] * len(top), pa.binary()),
                "cand": pa.array([None] + vals.take(pa.array(top)).to_pylist(), pa.string()),
            }
        )

    merged = CountMinSketch(depth, width)
    cands: set[str] = set()
    for b in ds.map_batches(sketch_batch, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        for raw in b.column("sketch").to_pylist():
            if raw is not None:
                merged.merge(CountMinSketch.from_bytes(raw, depth, width))
        cands.update(c for c in b.column("cand").to_pylist() if c is not None)

    cand_arr = pa.array(sorted(cands), pa.string())
    est = merged.estimate_hashes(content_hash64(cand_arr))
    order = np.lexsort((np.asarray(cand_arr), -est))[:k]
    return pa.table(
        {
            "tok": cand_arr.take(pa.array(order)),
            "est_count": pa.array(est[order], pa.int64()),
        }
    )


def grouped_approx_distinct(
    ds: rd.Dataset,
    key_col: str,
    value_col: str,
    p: int = 12,
) -> rd.Dataset:
    """Approximate count-distinct of ``value_col`` per ``key_col``
    (grouped HLL). Each batch emits one serialized sketch per key it
    contains (keys x blocks rows of fixed 2^p bytes — NOT rows); a
    groupby merges per-key sketches with one vectorized
    register-maximum reduce. The 10^12-row grouped-cardinality path:
    no distinct set ever shuffles. Rows-only: HLL estimation error is
    not SQL-expressible; accuracy vs the exact grouped distinct is
    tested in tests/test_functions.py."""
    from vietnamese_ocr_ray.functions.dedup import content_hash64

    def sketch_batch(batch: pa.Table) -> pa.Table:
        keys = np.asarray(batch.column(key_col))
        h = content_hash64(
            batch.column(value_col).cast(pa.string())
            if not pa.types.is_string(batch.column(value_col).type)
            else batch.column(value_col)
        )
        out_k, out_s = [], []
        for k in np.unique(keys):
            s = HllSketch(p)
            s.add_hashes(h[keys == k])
            out_k.append(str(k))
            out_s.append(s.to_bytes())
        return pa.table(
            {key_col: pa.array(out_k, pa.string()), "sketch": pa.array(out_s, pa.binary())}
        )

    def merge_group(g) -> "pa.Table":
        import pandas as pd  # noqa: F401 - pandas group frame

        merged = HllSketch(p)
        for raw in g["sketch"]:
            merged.merge(HllSketch.from_bytes(raw, p))
        return pa.table(
            {
                key_col: pa.array([g[key_col].iloc[0]], pa.string()),
                "approx_distinct": pa.array(
                    [int(math.floor(merged.estimate() + 0.5))], pa.int64()
                ),
            }
        )

    return (
        ds.map_batches(sketch_batch, batch_format="pyarrow")
        .groupby(key_col)
        .map_groups(merge_group, batch_format="pandas")
    )


def cms_join_size(
    a: rd.Dataset,
    b: rd.Dataset,
    key_col: str,
    depth: int = 4,
    width: int = 2048,
) -> rd.Dataset:
    """Join-cardinality estimation by Count-Min INNER PRODUCT (Cormode
    & Muthukrishnan 2005 §4.2): |A join B on key| is estimated as
    min over depth rows d of sum_j A_d[j] * B_d[j], where A_d/B_d are
    the CMS counter rows of each side's key column — the statistic a
    distributed planner uses to size a join without touching per-key
    counts. One-sided: the estimate NEVER undercounts (hash collisions
    only add cross terms). The exact size rides along for the error
    report.

    Scale shape: each side streams once emitting sparse (depth, bucket,
    count) partials — a batch contributes at most depth*width rows —
    merged by one bucketed aggregate; the dense tables reaching the
    driver are 2 * depth * width integers regardless of data size. The
    exact side is one key-bucketed count aggregate whose per-key rows
    collapse to product partials inside the buckets.

    Key hashing: splitmix64 finalize of the int64 key (the
    functions/joins._mix64 chain), then the CountMinSketch
    odd-multiplier row mixes — all replayed by the SQL oracle."""
    import ray  # noqa: F401  (parallel import shape with siblings)

    from ray.data.aggregate import Sum

    from vietnamese_ocr_ray.functions.agg import hash_aggregate
    from vietnamese_ocr_ray.functions.joins import _mix64

    cms = CountMinSketch(depth=depth, width=width)

    def cms_partial(batch: pa.Table) -> pa.Table:
        keys = np.asarray(batch.column(key_col), np.int64)
        u, c = np.unique(keys, return_counts=True)
        idx = cms._indices(_mix64(u))  # (depth, n)
        d = np.repeat(np.arange(depth, dtype=np.int64), u.shape[0])
        j = idx.reshape(-1).astype(np.int64)
        cc = np.tile(c.astype(np.int64), depth)
        return (
            pa.table({"d": pa.array(d), "j": pa.array(j), "c": pa.array(cc)})
            .group_by(["d", "j"])
            .aggregate([("c", "sum")])
            .rename_columns(["d", "j", "c"])
        )

    def sparse(side_ds: rd.Dataset):
        return hash_aggregate(
            side_ds.map_batches(cms_partial, batch_format="pyarrow"),
            ["d", "j"],
            {"c": ("c", "sum")},
            num_buckets=8,
        ).to_pandas()  # <= depth*width rows

    ta, tb = sparse(a), sparse(b)
    dense_a = np.zeros((depth, width), np.int64)
    dense_b = np.zeros((depth, width), np.int64)
    dense_a[ta["d"].to_numpy(np.int64), ta["j"].to_numpy(np.int64)] = ta[
        "c"
    ].to_numpy(np.int64)
    dense_b[tb["d"].to_numpy(np.int64), tb["j"].to_numpy(np.int64)] = tb[
        "c"
    ].to_numpy(np.int64)
    ests = [int((dense_a[d] * dense_b[d]).sum()) for d in range(depth)]
    est = min(ests)

    # exact: per-key counts of both sides in one bucketed aggregate
    def tag(side_val: int):
        def f(batch: pa.Table) -> pa.Table:
            keys = np.asarray(batch.column(key_col), np.int64)
            u, c = np.unique(keys, return_counts=True)
            z = np.zeros_like(c)
            return pa.table(
                {
                    "key": pa.array(u),
                    "ca": pa.array(c if side_val == 0 else z),
                    "cb": pa.array(z if side_val == 0 else c),
                }
            )

        return f

    per_key = hash_aggregate(
        a.map_batches(tag(0), batch_format="pyarrow").union(
            b.map_batches(tag(1), batch_format="pyarrow")
        ),
        ["key"],
        {"ca": ("ca", "sum"), "cb": ("cb", "sum")},
    )
    prod = per_key.map_batches(
        lambda t: pa.table(
            {
                "p": pa.array(
                    [
                        int(
                            (
                                np.asarray(t.column("ca"), np.int64)
                                * np.asarray(t.column("cb"), np.int64)
                            ).sum()
                        )
                    ],
                    pa.int64(),
                )
            }
        ),
        batch_format="pyarrow",
    ).aggregate(Sum("p", alias_name="p"))
    exact = int(prod["p"])
    err = round(float(est - exact) / float(exact), 6) if exact else 0.0
    return rd.from_arrow(
        pa.table(
            {
                "exact_size": pa.array([exact], pa.int64()),
                "est_size": pa.array([est], pa.int64()),
                "overestimate": pa.array([est - exact], pa.int64()),
                "rel_error": pa.array([err], pa.float64()),
            }
        )
    )


def _kmv_partial(key_col: str, text_col: str, k: int):
    """Per-batch KMV combiner: distinct (key, token-hash) pairs
    truncated to the k smallest hashes per key — the candidate rows a
    driver-side bottom-k finish needs are always a subset of these,
    so the exchange is <= k rows per (batch, key)."""
    import pandas as pd

    def partial(batch: pa.Table) -> pa.Table:
        txt = batch.column(text_col)
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        toks = pc.split_pattern(txt, " ")
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks).to_numpy()
        keys = np.asarray(
            batch.column(key_col).to_numpy(zero_copy_only=False)
        )[parent]
        h = HllSketch._finalize(content_hash64(flat))
        df = pd.DataFrame({"k": keys, "h": h}).drop_duplicates()
        df = (
            df.sort_values(["k", "h"], kind="stable")
            .groupby("k", sort=False)
            .head(k)
        )
        return pa.table(
            {
                "k": pa.array(df["k"].to_numpy(object), pa.string()),
                "h": pa.array(df["h"].to_numpy(np.uint64), pa.uint64()),
            }
        )

    return partial


def kmv_distinct_sources(
    ds: rd.Dataset,
    key_col: str = "source",
    text_col: str = "text",
    k: int = 64,
) -> pa.Table:
    """KMV (bottom-k / k-minimum-values) distinct-token sketch per key
    plus their union (Bar-Yossef et al. 2002): keep the k smallest
    DISTINCT token-hash values per key; estimate D ~= (k-1) * 2^64 /
    h_(k) (unbiased for uniform hashes), falling back to the exact
    count when fewer than k distinct hashes exist.

    Why it earns a slot next to HLL: bottom-k sketches merge by
    set-union + re-truncate — the k smallest hashes of a union are
    always a subset of the members' bottom-k candidates — which gives
    UNION cardinality for free (the ``__union__`` row; HLL needs a
    second register array per set expression). Shuffle traffic is
    <= k rows per (batch, key): a combiner-bounded exchange, never
    proportional to rows or to the distinct set.

    Exactness contract: hashes are FNV-1a over utf8 bytes
    (dedup.content_hash64) -> splitmix64 avalanche
    (HllSketch._finalize), both already replayed verbatim by the SQL
    oracle machinery; ``n_kept`` and the k-th hash are exact integers
    and ``est_distinct`` is ONE fixed float expression over them, so
    the DuckDB replay is bit-identical."""
    # bounded driver finish: <= k * n_keys * n_blocks candidate rows
    cand = ds.map_batches(
        _kmv_partial(key_col, text_col, k), batch_format="pyarrow"
    ).to_pandas()
    rows: list[tuple] = []

    def finish(name: str, hashes: np.ndarray) -> None:
        kept = np.unique(hashes)[:k]  # sorted ascending, distinct
        n_kept = int(kept.size)
        kth = int(kept[-1]) if n_kept else 0
        if n_kept < k:
            est = float(n_kept)
        else:
            est = (k - 1) * 18446744073709551616.0 / float(kth)
        signed = kth - (1 << 64) if kth >= (1 << 63) else kth
        rows.append((name, n_kept, signed, round(est, 6)))

    for name, g in cand.groupby("k", sort=True):
        finish(str(name), g["h"].to_numpy(np.uint64))
    finish("__union__", cand["h"].to_numpy(np.uint64))
    return pa.table(
        {
            "source": pa.array([r[0] for r in rows], pa.string()),
            "n_kept": pa.array([r[1] for r in rows], pa.int64()),
            "kth_hash": pa.array([r[2] for r in rows], pa.int64()),
            "est_distinct": pa.array([r[3] for r in rows], pa.float64()),
        }
    )


def theta_overlap_sources(
    ds: rd.Dataset,
    key_col: str = "source",
    text_col: str = "text",
    k: int = 64,
) -> pa.Table:
    """Theta-sketch set-intersection between every source PAIR
    (Dasgupta et al. 2016, the DataSketches theta family): each
    source's token set is summarized by its KMV bottom-k sketch; a
    pair's overlap is estimated from the hashes BOTH sketches retain
    below ``theta = min(theta_a, theta_b)`` (theta_x = the k-th hash
    when the sketch is full, else 2^64 — an exact sketch covers its
    whole set). Estimators: ``est_intersection = n_common * 2^64 /
    theta`` and ``est_jaccard = n_common / n_union`` over the
    below-theta union.

    This is the cross-SNAPSHOT / cross-source contamination audit at
    sketch cost: the exchange is <= k rows per (batch, source) (the
    kmv_distinct_sources combiner), pairs are computed on the driver
    over n_sources * k integers — never a corpus-sized join (the exact
    alternative, source_overlap_matrix, shuffles every shingle).

    Exactness contract: same FNV-1a -> splitmix64 hash chain as
    kmv_distinct_sources (SQL-replayed verbatim); n_common / n_union
    are exact integers and both estimates are ONE fixed float
    expression over them, so the DuckDB replay is bit-identical."""
    cand = ds.map_batches(
        _kmv_partial(key_col, text_col, k), batch_format="pyarrow"
    ).to_pandas()

    sketches: dict[str, np.ndarray] = {}
    thetas: dict[str, int] = {}
    for name, g in cand.groupby("k", sort=True):
        kept = np.unique(g["h"].to_numpy(np.uint64))[:k]
        sketches[str(name)] = kept
        thetas[str(name)] = int(kept[-1]) if kept.size == k else 1 << 64

    names = sorted(sketches)
    rows = []
    for i, a in enumerate(names):
        for b in names[i + 1 :]:
            theta = min(thetas[a], thetas[b])
            if theta >= (1 << 64):
                sa, sb = sketches[a], sketches[b]
            else:
                # uint64 compare — never float-upcast against a Python
                # int >= 2^53, where rounding could flip the boundary
                t = np.uint64(theta)
                sa = sketches[a][sketches[a] < t]
                sb = sketches[b][sketches[b] < t]
            n_common = int(np.intersect1d(sa, sb).size)
            n_union = int(np.union1d(sa, sb).size)
            est_i = round(n_common * 18446744073709551616.0 / float(theta), 6)
            est_j = (
                round(n_common / n_union, 6) if n_union else 0.0
            )
            rows.append((a, b, n_common, n_union, est_i, est_j))
    return pa.table(
        {
            "src_a": pa.array([r[0] for r in rows], pa.string()),
            "src_b": pa.array([r[1] for r in rows], pa.string()),
            "n_common": pa.array([r[2] for r in rows], pa.int64()),
            "n_union": pa.array([r[3] for r in rows], pa.int64()),
            "est_intersection": pa.array([r[4] for r in rows], pa.float64()),
            "est_jaccard": pa.array([r[5] for r in rows], pa.float64()),
        }
    )


def ams_f2_tokens(
    ds: rd.Dataset, text_col: str = "text", n_estimators: int = 16
) -> pa.Table:
    """AMS second-frequency-moment sketch (Alon, Matias & Szegedy
    1996): F2 = sum over distinct tokens of count^2 — the SELF-JOIN
    SIZE of the token table, the quantity a join planner needs before
    committing to a token-keyed shuffle. Each estimator j keeps one
    counter ``Z_j = sum_t sign_j(t) * c_t`` with a pseudo-4-wise sign
    ``sign_j(t) = +-1`` from bit j of splitmix64(FNV(t)); ``Z_j^2`` is
    an unbiased F2 estimate and the mean over estimators drives the
    variance down. Exact F2 rides along for the audit.

    Scale shape: per-batch partials emit n_estimators + 1 integer
    counters (never tokens) — a combiner-bounded exchange; the exact
    F2 uses the vocabulary-bounded distinct-count aggregate. All
    integers; the mean is ONE fixed division; SQL replays sign bits
    from the same hash chain."""
    from vietnamese_ocr_ray.functions.agg import hash_aggregate
    from vietnamese_ocr_ray.functions.dedup import content_hash64

    def partial(batch: pa.Table) -> pa.Table:
        toks = pc.list_flatten(pc.split_pattern(batch.column(text_col), " "))
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        h = HllSketch._finalize(content_hash64(toks))
        bits = (
            (h[:, None] >> np.arange(n_estimators, dtype=np.uint64)[None, :])
            & np.uint64(1)
        ).astype(np.int64)
        signs = 2 * bits - 1  # (ntok, n_estimators) of +-1
        z = signs.sum(axis=0)
        return pa.table(
            {
                "est": pa.array(np.arange(n_estimators, dtype=np.int64)),
                "z": pa.array(z),
            }
        )

    zs = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("est")
        .aggregate(Sum("z", alias_name="z"))
        .to_pandas()
        .sort_values("est")
    )
    z = zs["z"].to_numpy(np.int64)
    est_mean_num = int(sum(int(x) * int(x) for x in z))  # exact

    def tok_counts(batch: pa.Table) -> pa.Table:
        toks = pc.list_flatten(pc.split_pattern(batch.column(text_col), " "))
        t = pa.table({"tok": toks})
        g = t.group_by("tok").aggregate([([], "count_all")])
        return g.rename_columns(["tok", "n"])

    counts = hash_aggregate(
        ds.map_batches(tok_counts, batch_format="pyarrow"),
        ["tok"],
        {"n": ("n", "sum")},
    ).to_pandas()
    exact_f2 = int(sum(int(n) * int(n) for n in counts["n"]))

    return pa.table(
        {
            "n_estimators": pa.array([n_estimators], pa.int64()),
            "est_f2": pa.array(
                [est_mean_num // n_estimators], pa.int64()
            ),
            "exact_f2": pa.array([exact_f2], pa.int64()),
        }
    )
