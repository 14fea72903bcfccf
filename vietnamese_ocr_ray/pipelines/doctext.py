"""Document-text pipelines over the driver's ``documents`` table —
the SQL-checkable restatements of the engine's structural operators
(explode, ordered reassembly, vocab build, normalization) applied to
word sequences instead of span structs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd


def explode_tokens(sf_dir: str) -> rd.Dataset:
    """documents -> (doc_id, tok, ord) rows: whitespace split with
    1-based ordinality — the flat_map-explode operator, vectorized via
    Arrow list kernels (SURVEY.md §2 M11/A1 explode side)."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def explode(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern(batch.column("text"), " ")
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks)
        # 1-based position within each list, vectorized
        lens = np.asarray(pc.list_value_length(toks), dtype=np.int64)
        total = int(lens.sum())
        starts = np.repeat(np.cumsum(lens) - lens, lens)
        ords = np.arange(total, dtype=np.int64) - starts + 1
        return pa.table(
            {
                "doc_id": pc.take(batch.column("doc_id"), parent),
                "tok": flat,
                "ord": pa.array(ords),
            }
        )

    return ds.map_batches(explode, batch_format="pyarrow")


def reassemble_tokens(sf_dir: str) -> rd.Dataset:
    """Inverse of explode_tokens: groupby(doc_id) + in-group sort by
    ord + join — the ordered-reassembly operator (A1/O7). Bucketed the
    same way as the span pipeline: per-group work is vectorized pandas."""
    exploded = explode_tokens(sf_dir)

    def pack(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("ord")
        return pd.DataFrame(
            {
                "doc_id": [g["doc_id"].iloc[0]],
                "text_r": [" ".join(g["tok"].tolist())],
            }
        )

    return exploded.groupby("doc_id").map_groups(pack, batch_format="pandas")


def vocab_build(sf_dir: str) -> pa.Table:
    """Distinct characters of the corpus, sorted, id = rank + 2
    (1-based rank), mirroring the reference vocab id scheme
    (src/utils/vocab.py:10-15: position + 3 == 1-based rank + 2).
    flat_map chars -> distinct -> sort (A2 + O1)."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])

    def distinct_chars(batch: pa.Table) -> pa.Table:
        # per-batch partial distinct (combiner before the shuffle)
        arr = batch.column("text").combine_chunks()
        offs = np.frombuffer(arr.buffers()[1], dtype=np.int32)[
            arr.offset : arr.offset + len(arr) + 1
        ]
        data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)[
            offs[0] : offs[-1]
        ]
        if (data < 128).all():
            uniq = np.unique(data)
            letters = [chr(c) for c in uniq]
        else:
            # non-ASCII fallback: ONE bulk utf-8 decode of the flat
            # buffer (string offsets align on char boundaries, so the
            # concatenation is valid utf-8), re-encoded utf-32-le to a
            # fixed-width codepoint array for a vectorized unique — no
            # per-row Python; the only per-item work is chr() over the
            # BATCH-DISTINCT codepoints (alphabet-bounded)
            cps = np.frombuffer(
                data.tobytes().decode("utf-8").encode("utf-32-le"),
                dtype=np.uint32,
            )
            letters = [chr(c) for c in np.unique(cps)]
        return pa.table({"letter": pa.array(letters, pa.string())})

    uniq = ds.map_batches(distinct_chars, batch_format="pyarrow").unique("letter")
    letters = sorted(uniq)
    return pa.table(
        {
            "letter": pa.array(letters, pa.string()),
            "id": pa.array(np.arange(1, len(letters) + 1, dtype=np.int64) + 2),
        }
    )


def normalize_fill(sf_dir: str) -> rd.Dataset:
    """Pass-through normalization + empty->'a' fill over documents
    (M10 + M12): NFC, lower, trim; empty result becomes 'a'."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def norm(batch: pa.Table) -> pa.Table:
        t = pc.utf8_normalize(batch.column("text"), form="NFC")
        t = pc.utf8_lower(t)
        t = pc.utf8_trim_whitespace(t)
        t = pc.if_else(pc.equal(pc.utf8_length(t), 0), pa.scalar("a"), t)
        return pa.table({"doc_id": batch.column("doc_id"), "norm_text": t})

    return ds.map_batches(norm, batch_format="pyarrow")


def token_length_check(sf_dir: str) -> rd.Dataset:
    """Encode-length invariant (M8): n_ids == n_chars + 2 (<sos>/<eos>
    wrap) — computed from the data, not the stored n_chars column."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def enc_len(batch: pa.Table) -> pa.Table:
        n = pc.add(pc.utf8_length(batch.column("text")), pa.scalar(2))
        return pa.table(
            {"doc_id": batch.column("doc_id"), "n_ids": n.cast(pa.int64())}
        )

    return ds.map_batches(enc_len, batch_format="pyarrow")


def doc_rollup(sf_dir: str) -> rd.Dataset:
    """ROLLUP aggregation in ONE corpus pass: per-(source, lang),
    per-source subtotal, and grand-total doc/char counts. Each batch
    emits partial rows for ALL THREE levels (the rolled-up key columns
    carry the '' sentinel — Ray groupby treats it as an ordinary key,
    the oracle renders GROUP BY ROLLUP with COALESCE to the same
    sentinel), so the multi-level cube costs the same single small
    shuffle as a flat groupby: partial rows = O(levels x keys x
    blocks). Output: (source, lang, n_docs, n_chars) with '' marking
    rolled-up columns."""
    from vietnamese_ocr_ray.sources.storage import read_parquet_clean

    ds = read_parquet_clean(
        f"{sf_dir}/documents.parquet", columns=["source", "lang", "n_chars"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "source": batch.column("source").to_pylist(),
                "lang": batch.column("lang").to_pylist(),
                "n_chars": batch.column("n_chars").to_numpy(
                    zero_copy_only=False
                ),
            }
        )
        lvl0 = df.groupby(["source", "lang"], as_index=False, sort=False).agg(
            n_docs=("n_chars", "size"), n_chars=("n_chars", "sum")
        )
        lvl1 = lvl0.groupby("source", as_index=False, sort=False).agg(
            n_docs=("n_docs", "sum"), n_chars=("n_chars", "sum")
        )
        lvl1["lang"] = ""
        lvl2 = pd.DataFrame(
            {
                "source": [""],
                "lang": [""],
                "n_docs": [lvl0["n_docs"].sum()],
                "n_chars": [lvl0["n_chars"].sum()],
            }
        )
        out = pd.concat(
            [lvl0, lvl1[["source", "lang", "n_docs", "n_chars"]], lvl2],
            ignore_index=True,
        )
        out["n_docs"] = out["n_docs"].astype(np.int64)
        out["n_chars"] = out["n_chars"].astype(np.int64)
        return pa.Table.from_pandas(
            out, preserve_index=False
        ).replace_schema_metadata(None)

    from ray.data.aggregate import Sum

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["source", "lang"])
        .aggregate(Sum("n_docs", alias_name="n_docs"), Sum("n_chars", alias_name="n_chars"))
    )
