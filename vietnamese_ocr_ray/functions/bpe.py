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
