"""Corpus-level text hygiene — the C4/RefinedWeb-style cleanup ops a
web-scale training-data pipeline runs between extraction and training:

* :func:`dedup_lines` / :func:`dedup_lines_docs` — corpus-wide exact
  LINE dedup: every repeated line keeps only its first occurrence
  (global (doc_id, ord) order), docs reassemble from the survivors.
  ONE shuffle, bucketed on the line hash: all copies of a line share a
  bucket, so each reduce task resolves first-occurrence with one
  vectorized pandas transform — no per-line Python, no winners join.
* :func:`decontaminate_ngrams` — benchmark decontamination by token
  n-gram overlap (the standard 13-gram method): a doc is contaminated
  if ANY of its n-grams appears in the benchmark set. Rolling-hash
  prefilter over the flat token buffer + exact string verify on hash
  hits only; the benchmark n-gram set is benchmark-sized and ships
  once via ray.put (same contract as the whole-doc `decontaminate`).
* :func:`quantile_filter` — keep rows at or above an exact global
  quantile of an integer-valued score column. Two passes: a
  value-domain histogram (per-batch value_counts partials -> bucketed
  merge -> tiny driver table over DISTINCT score values), exact
  quantile_cont interpolation on the histogram, then a broadcast
  threshold filter. The shuffle carries one row per distinct value
  per block — never the corpus.

All SQL-mirrored (oracles in ``__ray_entry__.py``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from vietnamese_ocr_ray.functions.dedup import content_hash64
from vietnamese_ocr_ray.functions.joins import key_bucket

# (doc_id, ord) packed into one int64 order key; ord < 2^20 per doc
# (a doc with a million lines should have been split upstream)
_ORD_SCALE = 1 << 20

LINE_DELIM = " window "  # the corpus paragraph token (see html.py)
LINE_JOIN = " | "


def explode_lines(
    ds: rd.Dataset, delim: str = LINE_DELIM, text_col: str = "text"
) -> rd.Dataset:
    """(doc_id, ord, line): one row per line, flat-buffer vectorized."""

    def ex(batch: pa.Table) -> pa.Table:
        lists = pc.split_pattern(batch.column(text_col), delim)
        lists = (
            lists.combine_chunks()
            if isinstance(lists, pa.ChunkedArray)
            else lists
        )
        flat = lists.flatten()
        offs = np.asarray(lists.offsets, dtype=np.int64)
        counts = np.diff(offs)
        ids = np.asarray(batch.column("doc_id"), dtype=np.int64)
        doc = np.repeat(ids, counts)
        ords = np.arange(offs[-1], dtype=np.int64) - np.repeat(
            offs[:-1], counts
        )
        return pa.table(
            {
                "doc_id": pa.array(doc),
                "ord": pa.array(ords),
                "line": flat,
            }
        )

    return ds.map_batches(ex, batch_format="pyarrow")


def dedup_lines(
    ds: rd.Dataset, delim: str = LINE_DELIM, num_buckets: int = 64
) -> rd.Dataset:
    """Surviving (doc_id, ord, line) rows after corpus-wide exact line
    dedup (first global occurrence wins). All copies of a line hash to
    one bucket; the bucket keeps rows whose packed order key equals the
    per-line min — one vectorized transform per bucket."""
    lines = explode_lines(ds, delim)

    def add_key(batch: pa.Table) -> pa.Table:
        doc = np.asarray(batch.column("doc_id"), dtype=np.int64)
        ords = np.asarray(batch.column("ord"), dtype=np.int64)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "ord": batch.column("ord"),
                "line": batch.column("line"),
                "k": pa.array(doc * _ORD_SCALE + ords),
                "_bucket": pa.array(
                    key_bucket(batch.column("line"), num_buckets).astype(
                        np.int32
                    )
                ),
            }
        )

    def keep_first(g: pd.DataFrame) -> pa.Table:
        kmin = g.groupby("line", sort=False)["k"].transform("min")
        kept = g[g["k"] == kmin]
        return pa.table(
            {
                "doc_id": pa.array(kept["doc_id"].to_numpy(np.int64)),
                "ord": pa.array(kept["ord"].to_numpy(np.int64)),
                "line": pa.array(kept["line"].to_numpy(object), pa.string()),
            }
        )

    return (
        lines.map_batches(add_key, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(
            lambda g: keep_first(g.drop(columns=["_bucket"])),
            batch_format="pandas",
        )
    )


def dedup_lines_docs(
    ds: rd.Dataset,
    delim: str = LINE_DELIM,
    join: str = LINE_JOIN,
    num_buckets: int = 64,
) -> rd.Dataset:
    """(doc_id, text_dedup): docs reassembled from surviving lines in
    original order; a doc whose every line was seen earlier elsewhere
    keeps ''. Second bucket shuffle on doc_id; a zero-line sentinel per
    doc rides along so empties survive reassembly."""
    kept = dedup_lines(ds, delim, num_buckets)

    def tag_kept(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "ord": batch.column("ord"),
                "line": batch.column("line"),
                "_bucket": pa.array(
                    key_bucket(batch.column("doc_id"), num_buckets).astype(
                        np.int32
                    )
                ),
            }
        )

    def sentinels(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "ord": pa.array(np.full(n, -1, np.int64)),
                "line": pa.array([""] * n, pa.string()),
                "_bucket": pa.array(
                    key_bucket(batch.column("doc_id"), num_buckets).astype(
                        np.int32
                    )
                ),
            }
        )

    def reassemble(g: pd.DataFrame) -> pa.Table:
        real = g[g["ord"] >= 0].sort_values(["doc_id", "ord"], kind="stable")
        joined = (
            real.groupby("doc_id", sort=False)["line"]
            .agg(lambda s: join.join(s))
            .rename("text_dedup")
        )
        all_ids = pd.Index(g["doc_id"].unique(), name="doc_id")
        out = joined.reindex(all_ids, fill_value="").reset_index()
        return pa.table(
            {
                "doc_id": pa.array(out["doc_id"].to_numpy(np.int64)),
                "text_dedup": pa.array(
                    out["text_dedup"].to_numpy(object), pa.string()
                ),
            }
        )

    union = kept.map_batches(tag_kept, batch_format="pyarrow").union(
        ds.select_columns(["doc_id"]).map_batches(
            sentinels, batch_format="pyarrow"
        )
    )
    return union.groupby("_bucket").map_groups(
        lambda g: reassemble(g.drop(columns=["_bucket"])),
        batch_format="pandas",
    )


# ---------------------------------------------------------------------------
# n-gram benchmark decontamination
# ---------------------------------------------------------------------------

_NGRAM_P = np.uint64(1099511628211)  # FNV prime as the rolling multiplier


def _token_lists(text_col) -> tuple[pa.Array, np.ndarray]:
    toks = pc.split_pattern(text_col, " ")
    toks = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
    return toks.flatten(), np.asarray(toks.offsets, dtype=np.int64)


def _ngram_hashes(flat: pa.Array, offs: np.ndarray, n: int):
    """(position hashes uint64, valid mask) over the flat token buffer.
    Position i hashes tokens i..i+n-1; valid iff the window stays
    inside one doc."""
    th = content_hash64(flat)
    total = th.shape[0]
    if total < n:
        return np.empty(0, np.uint64), np.empty(0, bool)
    m = total - n + 1
    h = np.zeros(m, np.uint64)
    for j in range(n):
        h = h * _NGRAM_P + th[j : j + m]
    # doc index per token -> window valid iff first and last token
    # share a doc
    counts = np.diff(offs)
    doc_of = np.repeat(np.arange(counts.shape[0], dtype=np.int64), counts)
    valid = doc_of[: m] == doc_of[n - 1 : n - 1 + m]
    return h, valid


def _ngram_strings(flat: pa.Array, positions: np.ndarray, n: int) -> pa.Array:
    """The exact n-gram strings at the given flat positions (n takes +
    one join — vectorized over positions)."""
    parts = [flat.take(pa.array(positions + j)) for j in range(n)]
    return pc.binary_join_element_wise(*parts, pa.scalar(" "))


def decontaminate_ngrams(
    ds: rd.Dataset,
    bench: rd.Dataset,
    n: int = 13,
) -> rd.Dataset:
    """doc_ids of documents sharing NO token n-gram with the benchmark
    corpus. The benchmark n-gram set (hashes for the prefilter, exact
    strings for verification) is collected once on the driver —
    benchmark-sized by definition — and broadcast via ray.put; each
    corpus batch rolls its own hashes over the flat token buffer and
    builds strings only for hash hits."""
    import ray

    hs, ss = [], []
    for b in bench.iter_batches(batch_format="pyarrow"):
        flat, offs = _token_lists(
            b.column("text").combine_chunks()
            if isinstance(b.column("text"), pa.ChunkedArray)
            else b.column("text")
        )
        h, valid = _ngram_hashes(flat, offs, n)
        pos = np.nonzero(valid)[0]
        if pos.size:
            hs.append(h[pos])
            ss.append(
                np.asarray(_ngram_strings(flat, pos, n).to_pylist(), object)
            )
    bench_h = np.unique(np.concatenate(hs)) if hs else np.empty(0, np.uint64)
    bench_s = np.unique(np.concatenate(ss)) if ss else np.empty(0, object)
    handle = ray.put((bench_h, bench_s))

    def keep(batch: pa.Table) -> pa.Table:
        bh, bs = ray.get(handle)
        text = batch.column("text")
        text = (
            text.combine_chunks()
            if isinstance(text, pa.ChunkedArray)
            else text
        )
        flat, offs = _token_lists(text)
        h, valid = _ngram_hashes(flat, offs, n)
        contaminated = np.zeros(batch.num_rows, dtype=bool)
        if h.size and bh.size:
            pos_c = np.minimum(np.searchsorted(bh, h), bh.size - 1)
            maybe = valid & (bh[pos_c] == h)
            cand = np.nonzero(maybe)[0]
            if cand.size:  # exact verify only on hash hits
                strs = np.asarray(
                    _ngram_strings(flat, cand, n).to_pylist(), object
                )
                hit = np.isin(strs, bs)
                if hit.any():
                    counts = np.diff(offs)
                    doc_of = np.repeat(
                        np.arange(counts.shape[0], dtype=np.int64), counts
                    )
                    contaminated[np.unique(doc_of[cand[hit]])] = True
        return pa.table(
            {
                "doc_id": batch.column("doc_id").filter(
                    pa.array(~contaminated)
                )
            }
        )

    return ds.select_columns(["doc_id", "text"]).map_batches(
        keep, batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# cross-document duplicated n-gram coverage (exact-substring dup signal)
# ---------------------------------------------------------------------------


def _dup_ngram_positions(
    ds: rd.Dataset, n: int, num_buckets: int
) -> rd.Dataset:
    """Shuffle 1 of the exact-substring family: every valid token
    n-gram instance ships ``(gram, doc_id, pos)`` to its gram's
    bucket; a gram is duplicated iff its min and max doc_id differ.
    Duplicated instances leave as int-only ``(doc_id, pos)`` rows.
    Shared by :func:`dup_ngram_spans` (coverage report) and
    :func:`excise_dup_ngrams` (removal)."""

    def emit(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        text = (
            text.combine_chunks()
            if isinstance(text, pa.ChunkedArray)
            else text
        )
        flat, offs = _token_lists(text)
        total = len(flat)
        counts = np.diff(offs)
        if total < n:
            return pa.table(
                {
                    "gram": pa.array([], pa.string()),
                    "doc_id": pa.array([], pa.int64()),
                    "pos": pa.array([], pa.int64()),
                    "_b": pa.array([], pa.int32()),
                }
            )
        m = total - n + 1
        doc_of = np.repeat(np.arange(counts.shape[0], dtype=np.int64), counts)
        valid = doc_of[:m] == doc_of[n - 1 : n - 1 + m]
        positions = np.nonzero(valid)[0]
        grams = _ngram_strings(flat, positions, n)
        ids = np.asarray(batch.column("doc_id"), dtype=np.int64)
        doc = ids[doc_of[positions]]
        pos = positions - offs[doc_of[positions]]
        return pa.table(
            {
                "gram": grams,
                "doc_id": pa.array(doc),
                "pos": pa.array(pos),
                "_b": pa.array(
                    key_bucket(grams, num_buckets).astype(np.int32)
                ),
            }
        )

    def find_dups(g: pd.DataFrame) -> pa.Table:
        lo = g.groupby("gram", sort=False)["doc_id"].transform("min")
        hi = g.groupby("gram", sort=False)["doc_id"].transform("max")
        kept = g[lo != hi]
        return pa.table(
            {
                "doc_id": pa.array(kept["doc_id"].to_numpy(np.int64)),
                "pos": pa.array(kept["pos"].to_numpy(np.int64)),
            }
        )

    return (
        ds.select_columns(["doc_id", "text"])
        .map_batches(emit, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(
            lambda g: find_dups(g.drop(columns=["_b"])),
            batch_format="pandas",
        )
    )


def dup_ngram_spans(
    ds: rd.Dataset,
    n: int = 13,
    num_buckets: int = 64,
) -> rd.Dataset:
    """Per-document duplicated-substring coverage: ``(doc_id, n_tokens,
    dup_tokens)`` where ``dup_tokens`` counts token positions covered by
    at least one token n-gram that also appears in ANOTHER document —
    the exact-substring duplication signal of Lee et al. 2022
    ("Deduplicating Training Data Makes Language Models Better"),
    reduced to per-doc coverage fractions (callers divide).

    Distribution: two bucket shuffles, no broadcast.

    1. Every valid n-gram instance ships ``(gram, doc_id, pos)`` to the
       bucket of its gram, so all instances of a gram meet in one
       reduce task; a gram is duplicated iff its min and max doc_id
       differ (cross-doc by construction). One vectorized pandas
       transform per bucket; duplicated instances leave as int-only
       ``(doc_id, pos)`` rows.
    2. Duplicated positions bucket-shuffle on doc_id together with a
       per-doc ``(doc_id, n_tokens)`` sentinel row; each reduce task
       computes the merged-interval union length (``n*k`` minus
       clipped-overlap sum over consecutive sorted positions) in one
       numpy pass.

    Scale note: shuffle 1 carries the gram STRINGS (n tokens/row).
    At 100 TB the documented cheaper variant rolls 64-bit hashes first
    (int-only shuffle, as :func:`decontaminate_ngrams` does), then
    re-ships strings only for candidate-duplicate hashes; the string
    path here keeps the op exact in one pass and is what the SQL oracle
    checks.
    """

    dup_pos = _dup_ngram_positions(ds, n, num_buckets)

    def tag_dup(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "pos": batch.column("pos"),
                "ntok": pa.array(np.zeros(batch.num_rows, np.int64)),
                "_b": pa.array(
                    key_bucket(batch.column("doc_id"), num_buckets).astype(
                        np.int32
                    )
                ),
            }
        )

    def sentinels(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        text = (
            text.combine_chunks()
            if isinstance(text, pa.ChunkedArray)
            else text
        )
        _, offs = _token_lists(text)
        ntok = np.diff(offs)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "pos": pa.array(np.full(batch.num_rows, -1, np.int64)),
                "ntok": pa.array(ntok.astype(np.int64)),
                "_b": pa.array(
                    key_bucket(batch.column("doc_id"), num_buckets).astype(
                        np.int32
                    )
                ),
            }
        )

    def coverage(g: pd.DataFrame) -> pa.Table:
        sent = g[g["pos"] < 0]
        dup = g[g["pos"] >= 0].sort_values(
            ["doc_id", "pos"], kind="stable"
        )
        doc = dup["doc_id"].to_numpy(np.int64)
        pos = dup["pos"].to_numpy(np.int64)
        out_ids = sent["doc_id"].to_numpy(np.int64)
        covered = np.zeros(out_ids.shape[0], np.int64)
        if doc.size:
            # n per instance, minus the overlap of consecutive
            # same-doc intervals [p, p+n-1]
            same = doc[1:] == doc[:-1]
            overlap = np.where(
                same, np.clip(n - np.diff(pos), 0, None), 0
            )
            uniq, idx, k = np.unique(
                doc, return_index=True, return_counts=True
            )
            # segmented overlap sum: segment i spans pair indices
            # idx[i]..idx[i+1]-1; the pair straddling two docs is
            # already zeroed by `same`, so a plain reduceat is exact
            # (padded so the last segment stays in bounds)
            per_doc = n * k - np.add.reduceat(
                np.concatenate([overlap, [0]]), idx
            )
            order = np.searchsorted(uniq, out_ids)
            hit = (order < uniq.shape[0]) & (
                uniq[np.minimum(order, uniq.shape[0] - 1)] == out_ids
            )
            covered[hit] = per_doc[order[hit]]
        return pa.table(
            {
                "doc_id": pa.array(out_ids),
                "n_tokens": pa.array(sent["ntok"].to_numpy(np.int64)),
                "dup_tokens": pa.array(covered),
            }
        )

    union = dup_pos.map_batches(tag_dup, batch_format="pyarrow").union(
        ds.select_columns(["doc_id", "text"]).map_batches(
            sentinels, batch_format="pyarrow"
        )
    )
    return union.groupby("_b").map_groups(
        lambda g: coverage(g.drop(columns=["_b"])),
        batch_format="pandas",
    )


def excise_dup_ngrams(
    ds: rd.Dataset,
    n: int = 13,
    num_buckets: int = 64,
) -> rd.Dataset:
    """ExactSubstr REMOVAL (the act-on-it half of Lee et al. 2022):
    returns ``(doc_id, text)`` where every token position covered by a
    cross-doc duplicated token n-gram is cut out and the surviving
    tokens are rejoined with single spaces — the cleaned corpus, not
    just the coverage report (:func:`dup_ngram_spans`).

    Same two bucket shuffles: duplicated ``(doc_id, pos)`` instances
    from :func:`_dup_ngram_positions` meet their doc's full text row
    in a doc_id-bucketed reduce. Per bucket, ONE pass: concatenate the
    bucket's token domain, mark covered ranges with a +1/-1 delta
    array and a cumsum (no per-instance loops), filter the flat token
    array by the keep mask, rebuild per-doc lists from the kept
    counts, and ``binary_join`` them — all Arrow/numpy kernels. A doc
    whose every token is covered comes back as the empty string."""

    def tag_dup(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "pos": batch.column("pos"),
                "text": pa.nulls(batch.num_rows, pa.string()),
                "_b": pa.array(
                    key_bucket(batch.column("doc_id"), num_buckets).astype(
                        np.int32
                    )
                ),
            }
        )

    def carry_text(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "pos": pa.array(np.full(batch.num_rows, -1, np.int64)),
                "text": batch.column("text"),
                "_b": pa.array(
                    key_bucket(batch.column("doc_id"), num_buckets).astype(
                        np.int32
                    )
                ),
            }
        )

    def excise(g: pd.DataFrame) -> pa.Table:
        texts = g[g["pos"] < 0].sort_values("doc_id", kind="stable")
        dup = g[g["pos"] >= 0]
        ids = texts["doc_id"].to_numpy(np.int64)
        text_arr = pa.array(texts["text"].to_numpy(object), pa.string())
        flat, offs = _token_lists(text_arr)
        total = len(flat)
        ntok = np.diff(offs)
        keep = np.ones(total, dtype=bool)
        if len(dup):
            d_doc = dup["doc_id"].to_numpy(np.int64)
            d_pos = dup["pos"].to_numpy(np.int64)
            di = np.searchsorted(ids, d_doc)
            start = offs[di] + d_pos
            end = offs[di] + np.minimum(d_pos + n, ntok[di])
            delta = np.zeros(total + 1, np.int64)
            np.add.at(delta, start, 1)
            np.add.at(delta, end, -1)
            keep = np.cumsum(delta[:total]) == 0
        kept_counts = np.add.reduceat(
            keep.astype(np.int64), offs[:-1]
        ) if total else np.zeros(len(ids), np.int64)
        kept_counts[ntok == 0] = 0  # reduceat repeats on empty segments
        new_offs = np.concatenate([[0], np.cumsum(kept_counts)])
        kept_flat = flat.filter(pa.array(keep))
        lists = pa.ListArray.from_arrays(
            pa.array(new_offs, pa.int32()), kept_flat
        )
        joined = pc.binary_join(lists, pa.scalar(" "))
        return pa.table({"doc_id": pa.array(ids), "text": joined})

    union = _dup_ngram_positions(ds, n, num_buckets).map_batches(
        tag_dup, batch_format="pyarrow"
    ).union(
        ds.select_columns(["doc_id", "text"]).map_batches(
            carry_text, batch_format="pyarrow"
        )
    )
    return union.groupby("_b").map_groups(
        lambda g: excise(g.drop(columns=["_b"])),
        batch_format="pandas",
    )


# ---------------------------------------------------------------------------
# exact global-quantile threshold filter
# ---------------------------------------------------------------------------


def quantile_filter(
    ds: rd.Dataset,
    col: str = "n_chars",
    q: float = 0.9,
    id_col: str = "doc_id",
) -> rd.Dataset:
    """Rows with ``col >= quantile_cont(col, q)`` — exact, two passes.
    Pass 1 reduces to a value-domain histogram (distinct integer score
    values), pass 2 filters against the interpolated threshold. The
    threshold may fall strictly between two consecutive data values, so
    last-bit float noise cannot flip any row (both engines keep exactly
    the rows >= the upper neighbour)."""
    from vietnamese_ocr_ray.functions.agg import hash_aggregate

    def partial(batch: pa.Table) -> pa.Table:
        vc = pc.value_counts(batch.column(col))
        return pa.table(
            {
                "v": pc.struct_field(vc, "values"),
                "n": pc.cast(pc.struct_field(vc, "counts"), pa.int64()),
            }
        )

    hist = (
        hash_aggregate(
            ds.select_columns([col]).map_batches(
                partial, batch_format="pyarrow"
            ),
            ["v"],
            {"n": ("n", "sum")},
        )
        .to_pandas()
        .sort_values("v")
    )  # distinct score values only — domain-sized, not corpus-sized
    vals = hist["v"].to_numpy(np.int64)
    cnts = hist["n"].to_numpy(np.int64)
    total = int(cnts.sum())
    if total == 0:
        return ds.select_columns([id_col, col]).limit(0)
    pos = q * (total - 1)
    lo = int(np.floor(pos))
    hi = min(lo + 1, total - 1)
    cum = np.cumsum(cnts)
    v_lo = float(vals[np.searchsorted(cum, lo, side="right")])
    v_hi = float(vals[np.searchsorted(cum, hi, side="right")])
    thr = v_lo + (pos - lo) * (v_hi - v_lo)

    def keep(batch: pa.Table) -> pa.Table:
        x = np.asarray(batch.column(col), dtype=np.float64)
        return batch.filter(pa.array(x >= thr))

    return (
        ds.select_columns([id_col, col])
        .map_batches(keep, batch_format="pyarrow")
    )


def cdc_chunks(
    ds: rd.Dataset, kg: int = 8, divisor: int = 64
) -> rd.Dataset:
    """Content-defined chunking (the FastCDC/Rabin storage-dedup
    primitive, position-pure variant): cut a document before every
    byte position whose ``kg``-byte FNV gram hash is ≡ 0 mod
    ``divisor`` — identical content runs produce identical chunks at
    identical relative offsets no matter how the surrounding document
    shifted, so near-identical documents share chunk fingerprints and
    blob-level dedup falls out of a GROUP BY chunk_fp. Expected chunk
    size ≈ ``divisor`` bytes.

    Deliberately OMITS FastCDC's min/max-size clamps: those make each
    boundary depend on the previous one (a sequential scan), while the
    pure mod rule is position-parallel — every boundary is a local
    function of kg bytes, so the op vectorizes, parallelizes at any
    block layout, and replays exactly in SQL. Documented trade-off:
    pathological inputs can yield 1-byte or document-sized chunks.

    Output: (doc_id, chunk_idx, start, length, chunk_fp) with 1-based
    start and the repo's positional fingerprint
    (sum codepoint*i % 1e9+7, local i) as chunk_fp — computed here
    from two prefix sums over the flat buffer (no per-chunk pass).
    ASCII contract as simhash/winnow. Zero shuffles."""
    from vietnamese_ocr_ray.functions.sampling import FP_MOD

    fnv0 = np.uint64(0xCBF29CE484222325)
    prime = np.uint64(0x100000001B3)

    def chunk(batch: pa.Table) -> pa.Table:
        arr = batch.column("text")
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        offs = np.frombuffer(arr.buffers()[1], dtype=np.int32)[
            arr.offset : arr.offset + len(arr) + 1
        ].astype(np.int64)
        data = (
            np.frombuffer(arr.buffers()[2], dtype=np.uint8)
            if arr.buffers()[2] is not None
            else np.empty(0, np.uint8)
        )
        base = int(offs[0])
        offs = offs - base
        data = data[base : base + int(offs[-1])]
        doc_ids = np.asarray(batch.column("doc_id"), dtype=np.int64)
        lens = offs[1:] - offs[:-1]
        total = int(data.shape[0])

        # gram hashes at every global position (crossing masked later)
        cuts_mask = np.zeros(max(total, 1), dtype=bool)
        if total >= kg:
            win = np.lib.stride_tricks.sliding_window_view(data, kg).astype(
                np.uint64
            )
            h = np.full(win.shape[0], fnv0, dtype=np.uint64)
            for i in range(kg):
                h = (h ^ win[:, i]) * prime
            cuts_mask[: total - kg + 1] = (h % np.uint64(divisor)) == 0
        # a cut at global pos p is valid iff the gram lies inside its
        # row AND p is not the row's first byte
        pos = np.nonzero(cuts_mask)[0]
        row = np.searchsorted(offs, pos, side="right") - 1
        ok = (pos > offs[row]) & ((pos + kg) <= offs[row + 1])
        pos, row = pos[ok], row[ok]

        # segment starts = every row start + every cut, already sorted
        all_starts = np.concatenate([offs[:-1], pos])
        all_rows = np.concatenate(
            [np.arange(len(lens), dtype=np.int64), row]
        )
        order = np.lexsort((all_starts, all_rows))
        all_starts, all_rows = all_starts[order], all_rows[order]
        same_row = np.zeros(all_starts.shape[0], dtype=bool)
        same_row[:-1] = all_rows[1:] == all_rows[:-1]
        ends = np.where(
            same_row,
            np.concatenate([all_starts[1:], [0]]),
            offs[all_rows + 1],
        )  # exclusive
        keep = ends > all_starts  # drops empty-text rows' zero chunks
        all_starts, all_rows, ends = (
            all_starts[keep],
            all_rows[keep],
            ends[keep],
        )

        # chunk_idx: running index within each row (rows are contiguous)
        first = np.ones(all_rows.shape[0], dtype=bool)
        first[1:] = all_rows[1:] != all_rows[:-1]
        seg_firsts = np.nonzero(first)[0]
        idx = (
            np.arange(all_rows.shape[0], dtype=np.int64)
            - np.repeat(seg_firsts, np.diff(np.append(seg_firsts, len(all_rows))))
            + 1
        )

        # positional fp via two prefix sums (c_i and c_i * global_i)
        c = data.astype(np.int64)
        gi = np.arange(1, total + 1, dtype=np.int64)
        s1 = np.concatenate([[0], np.cumsum(c)])
        s2 = np.concatenate([[0], np.cumsum(c * gi)])
        a, b = all_starts, ends  # [a, b) global, 0-based
        fp = (
            (s2[b] - s2[a]) - a * (s1[b] - s1[a])
        ) % FP_MOD

        return pa.table(
            {
                "doc_id": pa.array(doc_ids[all_rows]),
                "chunk_idx": pa.array(idx),
                "start": pa.array(all_starts - offs[all_rows] + 1),
                "length": pa.array(ends - all_starts),
                "chunk_fp": pa.array(fp),
            }
        )

    return ds.map_batches(chunk, batch_format="pyarrow")


def ngram_novelty(
    ds: rd.Dataset, k: int = 8, num_buckets: int = 32
) -> rd.Dataset:
    """Per-doc n-gram novelty: the fraction of a document's DISTINCT
    k-byte shingles that appear nowhere else in the corpus (document
    frequency 1) — low novelty marks boilerplate/memorization-risk
    docs, the doc-level complement of exact-substring dedup.

    Scale shape: (shingle-hash, doc) rows ride ONE int-only
    hash-bucket shuffle; a shingle's full posting lives in one bucket,
    so within-bucket df IS global df (one sort + run-length pass, no
    second join); per-doc partials then ride one bucketed aggregate.
    Same FNV-64 hash-equality contract as minhash/ssjoin."""
    from vietnamese_ocr_ray.functions.agg import hash_aggregate
    from vietnamese_ocr_ray.functions.dedup import _unique_shingles, _utf8_flat

    def rows(b: pa.Table) -> pa.Table:
        r, h = _unique_shingles(*_utf8_flat(b.column("text")), k)
        ids = np.asarray(b.column("doc_id"), np.int64)[r]
        hi = h.astype(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(ids),
                "h": pa.array(hi),
                "bucket": pa.array(
                    (h % np.uint64(num_buckets)).astype(np.int32)
                ),
            }
        )

    def bucket_df(g: pd.DataFrame) -> pa.Table:
        s = g.sort_values("h", kind="stable")
        h = s["h"].to_numpy(np.int64)
        ids = s["doc_id"].to_numpy(np.int64)
        n = h.shape[0]
        change = np.ones(n, dtype=bool)
        change[1:] = h[1:] != h[:-1]
        starts = np.flatnonzero(change)
        runs = np.diff(np.append(starts, n))
        df = np.repeat(runs, runs)
        out = pd.DataFrame(
            {
                "doc_id": ids,
                "n_unique": (df == 1).astype(np.int64),
                "n_shingles": np.ones(n, np.int64),
            }
        ).groupby("doc_id", as_index=False, sort=False).sum()
        return pa.Table.from_pandas(out, preserve_index=False).replace_schema_metadata(None)

    per_doc = hash_aggregate(
        ds.map_batches(rows, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(
            lambda g: bucket_df(g.drop(columns=["bucket"])),
            batch_format="pandas",
        ),
        ["doc_id"],
        {"n_shingles": ("n_shingles", "sum"), "n_unique": ("n_unique", "sum")},
    )

    def finish(b: pa.Table) -> pa.Table:
        tot = np.asarray(b.column("n_shingles"), np.int64)
        uni = np.asarray(b.column("n_unique"), np.int64)
        return pa.table(
            {
                "doc_id": b.column("doc_id"),
                "n_shingles": pa.array(tot),
                "n_unique": pa.array(uni),
                "novelty": pa.array(
                    np.round(
                        uni.astype(np.float64) / tot.astype(np.float64), 6
                    ),
                    pa.float64(),
                ),
            }
        )

    return per_doc.map_batches(finish, batch_format="pyarrow")


def source_overlap_matrix(
    ds: rd.Dataset, k: int = 8, num_buckets: int = 32
) -> rd.Dataset:
    """Cross-source contamination matrix: for every source pair
    (a < b), the number of distinct k-byte shingles they share, each
    side's distinct-shingle count, and the shingle-set Jaccard — the
    cross-split leakage audit run before a train/eval split ships
    (dedup-across-snapshots' source-level cousin).

    Scale shape: per-batch distinct (shingle-hash, source) rows ride
    ONE int-keyed hash-bucket shuffle (a shingle's full source set
    lives in one bucket); within a bucket, per-shingle source sets are
    at most |sources| rows, so the self-merge emits <= |sources|^2 rows
    per shingle; pair partials (diagonal = per-source distinct counts)
    ride one tiny aggregate — |sources|^2 rows reach the driver. Same
    FNV-64 hash-equality contract as minhash/ssjoin/ngram_novelty."""
    from vietnamese_ocr_ray.functions.agg import hash_aggregate
    from vietnamese_ocr_ray.functions.dedup import _unique_shingles, _utf8_flat

    def rows(b: pa.Table) -> pa.Table:
        r, h = _unique_shingles(*_utf8_flat(b.column("text")), k)
        src = b.column("source").take(pa.array(r))
        t = pa.table({"h": pa.array(h.astype(np.int64)), "source": src})
        t = t.group_by(["h", "source"]).aggregate([])  # batch-distinct
        hh = np.asarray(t.column("h"), np.int64)
        return t.append_column(
            "_bucket",
            pa.array((hh.astype(np.uint64) % np.uint64(num_buckets)).astype(np.int32)),
        )

    def bucket_pairs(g: pd.DataFrame) -> pa.Table:
        d = g.drop_duplicates(["h", "source"])
        m = d.merge(d, on="h")
        m = m[m.source_x <= m.source_y]  # diagonal = per-source count
        out = (
            m.groupby(["source_x", "source_y"], as_index=False)
            .size()
            .rename(columns={"source_x": "a", "source_y": "b", "size": "n"})
        )
        return pa.Table.from_pandas(
            out, preserve_index=False
        ).replace_schema_metadata(None)

    pairs = hash_aggregate(
        ds.map_batches(rows, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(
            lambda g: bucket_pairs(g.drop(columns=["_bucket"])),
            batch_format="pandas",
        ),
        ["a", "b"],
        {"n": ("n", "sum")},
        num_buckets=4,
    ).to_pandas()  # <= |sources|^2 rows
    diag = (
        pairs[pairs.a == pairs.b].set_index("a")["n"].to_dict()
    )
    off = pairs[pairs.a < pairs.b].sort_values(["a", "b"])
    n_a = off["a"].map(diag).to_numpy(np.int64)
    n_b = off["b"].map(diag).to_numpy(np.int64)
    shared = off["n"].to_numpy(np.int64)
    union = n_a + n_b - shared
    return rd.from_arrow(
        pa.table(
            {
                "source_a": pa.array(off["a"].to_numpy(), pa.string()),
                "source_b": pa.array(off["b"].to_numpy(), pa.string()),
                "n_shared": pa.array(shared),
                "n_a": pa.array(n_a),
                "n_b": pa.array(n_b),
                "jaccard": pa.array(
                    np.round(shared / union.astype(np.float64), 6),
                    pa.float64(),
                ),
            }
        )
    )


def common_prefix_clusters(
    ds: rd.Dataset, prefix_chars: int = 12, min_docs: int = 3
) -> rd.Dataset:
    """Boilerplate-intro detection: cluster documents on their first
    ``prefix_chars`` CODEPOINTS and report every prefix shared by at
    least ``min_docs`` documents — the cheap template/mirror screen a
    crawl pipeline runs before the (much costlier) shingle dedup
    (docs opening with the same canned intro are template candidates
    even when their bodies diverge, which k-shingle Jaccard misses).

    Scale shape: per-batch Arrow group_by on the sliced prefix (the
    combiner bounds the shuffle by distinct prefixes per block), one
    prefix-bounded hash aggregate, threshold filter. utf8_slice is
    codepoint-based like SQL substr, so both engines cut identically
    inside multi-byte text. Output: (prefix, n_docs, min_doc_id),
    sorted by (n_docs desc, prefix)."""
    from vietnamese_ocr_ray.functions.agg import hash_aggregate

    def partial(b: pa.Table) -> pa.Table:
        pre = pc.utf8_slice_codeunits(
            b.column("text"), start=0, stop=prefix_chars
        )
        t = pa.table(
            {
                "prefix": pre,
                "doc_id": pc.cast(
                    b.column("doc_id").combine_chunks()
                    if isinstance(b.column("doc_id"), pa.ChunkedArray)
                    else b.column("doc_id"),
                    pa.int64(),
                ),
            }
        )
        return t.group_by("prefix").aggregate(
            [("doc_id", "count"), ("doc_id", "min")]
        ).rename_columns(["prefix", "n", "min_doc"])

    agg = hash_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["prefix"],
        {"n_docs": ("n", "sum"), "min_doc_id": ("min_doc", "min")},
    )

    def finish(b: pa.Table) -> pa.Table:
        keep = pc.greater_equal(
            pc.cast(b.column("n_docs"), pa.int64()),
            pa.scalar(min_docs, pa.int64()),
        )
        t = b.filter(keep)
        return pa.table(
            {
                "prefix": t.column("prefix"),
                "n_docs": pc.cast(t.column("n_docs"), pa.int64()),
                "min_doc_id": pc.cast(t.column("min_doc_id"), pa.int64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow").sort(
        ["n_docs", "prefix"], descending=[True, False]
    )
