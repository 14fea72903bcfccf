"""Distributed BPE vocabulary learning (Sennrich et al. 2016,
"Neural Machine Translation of Rare Words with Subword Units").

BPE trains on the WORD-FREQUENCY table, not the raw corpus: the
distributed work is one corpus scan reducing to (word, count) —
per-batch partial counts, then the bucketed :func:`hash_aggregate`
(shuffle carries O(distinct words per block) rows) — optionally capped
to the top ``max_words`` most frequent words (count-desc, word-asc —
deterministic), which bounds driver state the way real tokenizer
trainers do. The merge loop then runs driver-side over that
vocab-sized table (the same bounded-driver-state contract as
``quantile_filter``'s value histogram): each round counts symbol-pair
frequencies weighted by word count, picks the max pair (ties broken
lexicographically — fully deterministic), and rewrites the words.

Verification: no SQL analog (iterative merges); equality vs an
independently-written dict-based reference plus partitioning
invariance in tests/test_bpe.py.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from vietnamese_ocr_ray.functions.agg import hash_aggregate

_EOW = "</w>"


def word_counts(
    ds: rd.Dataset, text_col: str = "text", num_buckets: int = 64
) -> rd.Dataset:
    """(word, n): corpus word frequencies, one bucketed shuffle."""

    def partial(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern(batch.column(text_col), " ")
        flat = (
            toks.combine_chunks()
            if isinstance(toks, pa.ChunkedArray)
            else toks
        ).flatten()
        vc = pc.value_counts(flat)
        return pa.table(
            {
                "word": pc.struct_field(vc, "values"),
                "n": pc.cast(pc.struct_field(vc, "counts"), pa.int64()),
            }
        )

    return hash_aggregate(
        ds.select_columns([text_col]).map_batches(
            partial, batch_format="pyarrow"
        ),
        ["word"],
        {"n": ("n", "sum")},
        num_buckets=num_buckets,
    )


class BpeEncoder:
    """Actor-pool BPE application: tokenize every document with a
    learned merge table. The merge ranks live in actor state (built
    once per actor from the tiny merges table — KBs), along with a
    word→piece-count cache that persists ACROSS batches, so each
    distinct word is encoded once per actor no matter how many times
    it occurs (the word-cache trick real tokenizers use; the per-word
    merge loop is inherently sequential, but it runs only on cache
    misses — vocabulary-bounded, not corpus-bounded). Doc-level
    reduction is vectorized (pandas dict-map + segmented cumsum).

    Encode rule: greedy lowest-rank-first (the GPT-2 ``bpe()``
    formulation — repeatedly merge the present pair with the smallest
    rank), not sequential rank-order application; the two differ only
    when a later merge creates an earlier merge's pair.

    Output: (doc_id, n_tokens, n_pieces)."""

    def __init__(self, merges: list[tuple[str, str]]):
        self.ranks = {pair: i for i, pair in enumerate(merges)}
        self.cache: dict[str, int] = {}

    def _encode_len(self, word: str) -> int:
        hit = self.cache.get(word)
        if hit is not None:
            return hit
        syms = list(word) + [_EOW]
        while len(syms) > 1:
            best_rank, best_i = None, -1
            for i in range(len(syms) - 1):
                r = self.ranks.get((syms[i], syms[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank, best_i = r, i
            if best_rank is None:
                break
            syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
        n = len(syms)
        self.cache[word] = n
        return n

    def __call__(self, batch: pa.Table) -> pa.Table:
        toks_list = pc.split_pattern(batch.column("text"), " ")
        flat = pc.list_flatten(toks_list)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        ntok = pc.list_value_length(toks_list).to_numpy(zero_copy_only=False)
        for w in pc.unique(flat).to_pylist():
            self._encode_len(w or "")
        # vectorized cache lookup: corpus-sized tokens never round-trip
        # through Python — index_in against a vocab-bounded LUT array,
        # rebuilt only when the cache grew (misses above)
        if getattr(self, "_lut_n", -1) != len(self.cache):
            self._lut_keys = pa.array(list(self.cache.keys()), pa.string())
            self._lut_vals = np.fromiter(
                self.cache.values(), np.int64, len(self.cache)
            )
            self._lut_n = len(self.cache)
        idx = pc.index_in(flat, value_set=self._lut_keys).to_numpy(
            zero_copy_only=False
        )
        piece_per_tok = self._lut_vals[idx.astype(np.int64)]
        csum = np.concatenate([[0], np.cumsum(piece_per_tok)])
        ends = np.concatenate([[0], np.cumsum(ntok)])
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_tokens": pa.array(ntok.astype(np.int64)),
                "n_pieces": pa.array(csum[ends[1:]] - csum[ends[:-1]]),
            }
        )


# tasks-mode per-process encoder cache, keyed by the merge list: the
# ranks are KBs and the word->length cache is vocabulary-bounded, so a
# process-level cache gives the same across-batch reuse an actor does
# without paying per-execution pool spin-up or reserving CPUs the
# streaming executor could rebalance (the recognize_compute="tasks"
# tradeoff).
_PROCESS_ENCODERS: dict[tuple, BpeEncoder] = {}


def _encode_batch_tasks(batch: pa.Table, merges: tuple) -> pa.Table:
    enc = _PROCESS_ENCODERS.get(merges)
    if enc is None:
        enc = _PROCESS_ENCODERS[merges] = BpeEncoder(list(merges))
    return enc(batch)


def bpe_encode(
    ds: rd.Dataset,
    merges: pa.Table,
    concurrency=(1, 8),
    compute: str = "tasks",
) -> rd.Dataset:
    """(doc_id, n_tokens, n_pieces): apply a learned merge table to
    the corpus — merge ranks captured by value (merge tables are tiny
    by construction), per-process (or per-actor with
    ``compute="actors"``) word cache, zero shuffles."""
    pairs = list(
        zip(merges.column("left").to_pylist(), merges.column("right").to_pylist())
    )
    if compute == "actors":
        return ds.map_batches(
            BpeEncoder,
            fn_constructor_kwargs={"merges": pairs},
            batch_format="pyarrow",
            concurrency=concurrency,
        )
    from functools import partial

    return ds.map_batches(
        partial(_encode_batch_tasks, merges=tuple(pairs)),
        batch_format="pyarrow",
    )


def bpe_learn(
    ds: rd.Dataset,
    num_merges: int = 32,
    text_col: str = "text",
    max_words: int = 50_000,
) -> pa.Table:
    """Learn ``num_merges`` BPE merges; returns (rank, left, right,
    pair_count) ordered by rank. Words are char sequences with a
    ``</w>`` end marker (the classic formulation)."""
    wc = (
        word_counts(ds, text_col)
        .to_pandas()
        .sort_values(["n", "word"], ascending=[False, True], kind="stable")
        .head(max_words)
    )
    words = [tuple(w) + (_EOW,) for w in wc["word"].tolist()]
    freqs = wc["n"].to_numpy(np.int64)

    merges: list[tuple[str, str, int]] = []
    for _ in range(num_merges):
        pair_counts: dict[tuple[str, str], int] = {}
        for syms, f in zip(words, freqs):
            for a, b in zip(syms, syms[1:]):
                pair_counts[(a, b)] = pair_counts.get((a, b), 0) + int(f)
        if not pair_counts:
            break
        # max count, ties to the lexicographically smallest (left, right)
        (left, right), cnt = min(
            pair_counts.items(), key=lambda kv: (-kv[1], kv[0])
        )
        merges.append((left, right, cnt))
        joined = left + right
        new_words = []
        for syms in words:
            out = []
            i = 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == left
                    and syms[i + 1] == right
                ):
                    out.append(joined)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_words.append(tuple(out))
        words = new_words
    return pa.table(
        {
            "rank": pa.array(range(len(merges)), pa.int64()),
            "left": pa.array([m[0] for m in merges], pa.string()),
            "right": pa.array([m[1] for m in merges], pa.string()),
            "pair_count": pa.array([m[2] for m in merges], pa.int64()),
        }
    )
