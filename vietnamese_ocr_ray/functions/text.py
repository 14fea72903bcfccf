"""Text-analysis operators over a (doc_id, text, ...) table — the
large-scale training-data-pipeline additions (language ID, quality
scoring, token counting, fingerprinting, CER) expressed as vectorized
Ray Data transforms. Every formula here is deliberately simple enough
to be mirrored exactly by an ANSI-SQL oracle (see __ray_entry__.py).

CER/Levenshtein restates the reference metric (src/utils/cer.py:4-38)
as a map_batches + Sum-aggregate pipeline instead of a driver loop.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from ray.data.aggregate import Sum

from vietnamese_ocr_ray.functions.dedup import _utf8_flat, content_hash64
from vietnamese_ocr_ray.functions.joins import _mix64

# deterministic language markers; tiebreak order en > de > es > fr
LANG_MARKERS = [
    ("en", " the "),
    ("de", " der "),
    ("es", " el "),
    ("fr", " le "),
]

STOPWORDS_PATTERN = " the "  # single marker used for the stop ratio
FP_MOD = 1_000_000_007


def _count_occurrences(arr: pa.ChunkedArray, pattern: str) -> pa.Array:
    """Non-overlapping substring occurrence count, the SQL-mirrorable
    way: (len(s) - len(replace(s, p, ''))) / len(p)."""
    replaced = pc.replace_substring(arr, pattern=pattern, replacement="")
    return pc.divide(
        pc.subtract(pc.utf8_length(arr), pc.utf8_length(replaced)),
        pa.scalar(len(pattern)),
    )


def _padded(arr):
    """' ' || text || ' ' so word-boundary markers match at the ends."""
    # NB: the LAST argument of binary_join_element_wise is the separator
    return pc.binary_join_element_wise(
        pa.scalar(" "), arr, pa.scalar(" "), pa.scalar("")
    )


def lang_id_batch(batch: pa.Table) -> pa.Table:
    """Marker-count language heuristic; argmax with fixed tiebreak."""
    padded = _padded(batch.column("text"))
    scores = np.stack(
        [
            np.asarray(_count_occurrences(padded, marker))
            for _, marker in LANG_MARKERS
        ]
    )  # (L, N)
    # tiebreak = first lang in LANG_MARKERS order with maximal score
    best = np.argmax(scores, axis=0)  # np.argmax takes the first max
    langs = np.array([l for l, _ in LANG_MARKERS])
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "lang_pred": pa.array(langs[best]),
        }
    )


def lang_id(ds: rd.Dataset) -> rd.Dataset:
    return ds.map_batches(lang_id_batch, batch_format="pyarrow")


def token_count_batch(batch: pa.Table) -> pa.Table:
    """Whitespace token count per doc: len(string_split(text, ' '))."""
    n = pc.list_value_length(pc.split_pattern(batch.column("text"), " "))
    return pa.table(
        {"doc_id": batch.column("doc_id"), "n_tokens": n.cast(pa.int64())}
    )


def token_count(ds: rd.Dataset) -> rd.Dataset:
    return ds.map_batches(token_count_batch, batch_format="pyarrow")


SUBWORD_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def subword_token_count_batch(batch: pa.Table) -> pa.Table:
    """BPE-style pre-tokenizer count: runs of letters, runs of digits,
    and single other non-space characters (the lookahead-free core of
    the GPT-2 pre-tokenizer split — RE2-safe, so Arrow's
    count_substring_regex and DuckDB's regexp_extract_all count the
    exact same matches)."""
    n = pc.count_substring_regex(batch.column("text"), SUBWORD_PATTERN)
    return pa.table(
        {"doc_id": batch.column("doc_id"), "n_subword_tokens": n.cast(pa.int64())}
    )


def subword_token_count(ds: rd.Dataset) -> rd.Dataset:
    return ds.map_batches(subword_token_count_batch, batch_format="pyarrow")


def quality_batch(batch: pa.Table) -> pa.Table:
    """Quality signals: token count, punctuation count, stopword count,
    chars-per-token — all exact-integer or single-division doubles so
    the SQL oracle reproduces them bit-for-bit."""
    text = batch.column("text")
    n_chars = pc.utf8_length(text).cast(pa.int64())
    n_tokens = pc.list_value_length(pc.split_pattern(text, " ")).cast(pa.int64())
    padded = _padded(text)
    n_stop = pa.array(
        np.asarray(_count_occurrences(padded, STOPWORDS_PATTERN)), pa.int64()
    )
    # punctuation = occurrences of '.' + ',' (exact integer counts)
    n_punct = pc.add(
        _count_occurrences(text, "."), _count_occurrences(text, ",")
    ).cast(pa.int64())
    chars_per_token = pc.divide(
        n_chars.cast(pa.float64()), pc.max_element_wise(n_tokens, 1).cast(pa.float64())
    )
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "n_chars": n_chars,
            "n_tokens": n_tokens,
            "n_stop": n_stop,
            "n_punct": n_punct,
            "chars_per_token": chars_per_token,
        }
    )


def quality_scores(ds: rd.Dataset) -> rd.Dataset:
    return ds.map_batches(quality_batch, batch_format="pyarrow")


def fingerprint_batch(batch: pa.Table) -> pa.Table:
    """Positional document fingerprint:
    sum(codepoint(c_i) * i, i 1-based) % 1e9+7 — vectorized over the
    flat utf8 buffer (ASCII fast path, per-row fallback otherwise)."""
    arr = batch.column("text").combine_chunks()
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    offs = np.frombuffer(arr.buffers()[1], dtype=np.int32)[
        arr.offset : arr.offset + len(arr) + 1
    ]
    data = (
        np.frombuffer(arr.buffers()[2], dtype=np.uint8)
        if arr.buffers()[2] is not None
        else np.empty(0, np.uint8)
    )
    n = len(arr)
    fps = np.zeros(n, dtype=np.int64)
    if data.size and (data < 128).all():
        # ASCII: byte == codepoint; one weighted cumsum over the buffer
        base = int(offs[0])
        tail = offs.astype(np.int64) - base  # normalized, tail[0] == 0
        chars = data[base : int(offs[-1])].astype(np.int64)
        lens = tail[1:] - tail[:-1]
        starts = np.repeat(tail[:-1], lens)
        local = np.arange(chars.shape[0], dtype=np.int64) - starts + 1
        csum = np.concatenate([[0], np.cumsum(chars * local)])
        fps = (csum[tail[1:]] - csum[tail[:-1]]) % FP_MOD
    else:
        for i in range(n):
            s = arr[i].as_py()
            fps[i] = sum(ord(c) * (j + 1) for j, c in enumerate(s)) % FP_MOD
    return pa.table(
        {"doc_id": batch.column("doc_id"), "fingerprint": pa.array(fps)}
    )


def fingerprint(ds: rd.Dataset) -> rd.Dataset:
    return ds.map_batches(fingerprint_batch, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# CER (reference src/utils/cer.py) as a distributed aggregate
# ---------------------------------------------------------------------------


def levenshtein_np(a: str, b: str) -> int:
    """Edit distance, numpy row-DP (reference _levenshtein_distance,
    src/utils/cer.py:4-16)."""
    if not a:
        return len(b)
    if not b:
        return len(a)
    bb = np.frombuffer(b.encode("utf-32-le"), dtype=np.uint32)
    prev = np.arange(len(bb) + 1, dtype=np.int64)
    for i, ca in enumerate(a, 1):
        cur = np.empty_like(prev)
        cur[0] = i
        cost = (bb != ord(ca)).astype(np.int64)
        np.minimum(prev[1:] + 1, prev[:-1] + cost, out=cur[1:])
        # insertion chain: cur[j] = min_k<=j (cur[k] + (j-k)), vectorized
        idx = np.arange(len(cur))
        np.minimum(cur, np.minimum.accumulate(cur - idx) + idx, out=cur)
        prev = cur
    return int(prev[-1])


def levenshtein_batch(preds: list[str], targets: list[str]) -> np.ndarray:
    """Edit distance for ALL row pairs at once: the DP advances over
    character positions of the predictions (bounded by the longest
    one) with every row's frontier updated in one numpy step — the
    per-row Python of a string-at-a-time loop never runs. The
    insertion-chain recurrence is closed per step with the
    min-accumulate trick (cur[j] = min_k<=j cur[k] + (j-k))."""
    n = len(preds)
    la = np.fromiter((len(p) for p in preds), np.int64, n)
    lb = np.fromiter((len(t) for t in targets), np.int64, n)
    res = lb.copy()  # rows with an empty prediction
    if n == 0 or la.max(initial=0) == 0:
        return res
    La, Lb = int(la.max()), int(lb.max())
    A = np.zeros((n, La), np.uint32)
    B = np.zeros((n, max(Lb, 1)), np.uint32)
    for i, p in enumerate(preds):  # C-level decode only; DP is vectorized
        if p:
            A[i, : len(p)] = np.frombuffer(p.encode("utf-32-le"), np.uint32)
    for i, t in enumerate(targets):
        if t:
            B[i, : len(t)] = np.frombuffer(t.encode("utf-32-le"), np.uint32)
    prev = np.broadcast_to(np.arange(Lb + 1, dtype=np.int64), (n, Lb + 1)).copy()
    idx = np.arange(Lb + 1, dtype=np.int64)
    cur = np.empty_like(prev)
    for i in range(1, La + 1):
        cost = (B[:, :Lb] != A[:, i - 1][:, None]).astype(np.int64)
        cur[:, 0] = i
        np.minimum(prev[:, 1:] + 1, prev[:, :-1] + cost, out=cur[:, 1:])
        np.minimum(cur, np.minimum.accumulate(cur - idx, axis=1) + idx, out=cur)
        active = la >= i
        prev[active] = cur[active]
        done = la == i
        if done.any():
            res[done] = prev[done, lb[done]]
    return res


def cer_batch(batch: pa.Table, pred_col: str, target_col: str) -> pa.Table:
    preds = [p or "" for p in batch.column(pred_col).to_pylist()]
    targets = [t or "" for t in batch.column(target_col).to_pylist()]
    errors = levenshtein_batch(preds, targets)
    totals = [len(t) for t in targets]
    return pa.table(
        {
            "errors": pa.array(errors, pa.int64()),
            "total": pa.array(totals, pa.int64()),
        }
    )


def corpus_cer(ds: rd.Dataset, pred_col: str, target_col: str) -> pa.Table:
    """Corpus CER = sum(edit errors) / sum(target chars) — the
    reference's accumulate-then-ratio (src/utils/cer.py:18-38) as
    map_batches partials + a Sum aggregate (no driver loop)."""
    partial = ds.map_batches(
        lambda b: cer_batch(b, pred_col, target_col), batch_format="pyarrow"
    )
    agg = partial.aggregate(Sum("errors", alias_name="errors"), Sum("total", alias_name="total"))
    errors, total = int(agg["errors"]), int(agg["total"])
    return pa.table(
        {
            "errors": pa.array([errors], pa.int64()),
            "total": pa.array([total], pa.int64()),
            "cer": pa.array([errors / total if total else 0.0], pa.float64()),
        }
    )


# ---------------------------------------------------------------------------
# TF-IDF (Sparck Jones 1972) — two-pass: DF shuffle + broadcast score
# ---------------------------------------------------------------------------


def tfidf_top_terms(ds: rd.Dataset, k: int = 3) -> rd.Dataset:
    """Top-``k`` TF-IDF terms per document (score = tf * ln(N / df)).

    Scale shape: term frequencies never shuffle (a document's tokens
    live inside its row, so tf completes per batch); document
    frequencies are ONE bucketed hash-aggregate over per-batch DISTINCT
    (token, doc) pairs; the resulting df table is broadcast as sorted
    arrays (vocabulary-bounded — at corpus scales where the vocabulary
    exceeds a worker heap, use :func:`tfidf_top_terms_join` — same
    output, token-bucket cogroup instead). Top-k selects on the
    UNROUNDED score (ties break on the token string) and the EMITTED
    score is rounded to 6 decimals — numpy's log and DuckDB's ln
    disagree in the last ulp for some inputs (measured at sf0.01), so
    unrounded doubles cannot hash-match."""
    import ray

    from vietnamese_ocr_ray.functions.agg import hash_aggregate

    n_docs = ds.count()

    def distinct_tokens_per_doc(batch: pa.Table) -> pa.Table:
        toks_list = pc.split_pattern(batch.column("text"), " ")
        flat = pc.list_flatten(toks_list)
        ntok = pc.list_value_length(toks_list).to_numpy(zero_copy_only=False)
        doc = np.repeat(
            np.asarray(batch.column("doc_id"), dtype=np.int64), ntok
        )
        df = (
            pa.table({"tok": flat, "doc": pa.array(doc)})
            .to_pandas()
            .drop_duplicates(["tok", "doc"])
        )
        g = df.groupby("tok", as_index=False, sort=False).agg(n=("doc", "size"))
        return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(
            None
        )

    df_tbl = hash_aggregate(
        ds.map_batches(distinct_tokens_per_doc, batch_format="pyarrow"),
        ["tok"],
        {"df": ("n", "sum")},
    ).to_pandas()  # vocabulary-bounded broadcast side
    order = np.argsort(df_tbl["tok"].to_numpy())
    handle = ray.put(
        (
            df_tbl["tok"].to_numpy()[order],
            df_tbl["df"].to_numpy(np.int64)[order],
        )
    )

    def score(batch: pa.Table) -> pa.Table:
        toks_sorted, dfs = ray.get(handle)
        toks_list = pc.split_pattern(batch.column("text"), " ")
        flat = pc.list_flatten(toks_list)
        ntok = pc.list_value_length(toks_list).to_numpy(zero_copy_only=False)
        doc = np.repeat(
            np.asarray(batch.column("doc_id"), dtype=np.int64), ntok
        )
        tf = (
            pa.table({"doc_id": pa.array(doc), "tok": flat})
            .to_pandas()
            .groupby(["doc_id", "tok"], as_index=False, sort=False)
            .size()
        )
        pos = np.searchsorted(toks_sorted, tf["tok"].to_numpy())
        idf = np.log(float(n_docs) / dfs[pos])
        tf["score"] = tf["size"].to_numpy(np.int64) * idf
        top = (
            tf.sort_values(
                ["doc_id", "score", "tok"], ascending=[True, False, True],
                kind="stable",
            )
            .groupby("doc_id", sort=False)
            .head(k)
        )
        return pa.table(
            {
                "doc_id": pa.array(top["doc_id"].to_numpy(np.int64)),
                "tok": pa.array(top["tok"].to_numpy(), pa.string()),
                "score": pa.array(
                    np.round(top["score"].to_numpy(), 6), pa.float64()
                ),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow")


def tfidf_top_terms_join(ds: rd.Dataset, k: int = 3) -> rd.Dataset:
    """:func:`tfidf_top_terms` with NO vocabulary broadcast — the path
    for corpora whose token vocabulary exceeds a worker heap. The df
    table stays a Dataset; tf rows meet it in a token-bucket cogroup
    (union + one shuffle, per-bucket vectorized left-side merge), and
    the per-doc top-k finishes in a doc-bucket groupby. Identical
    output to the broadcast variant (equality test in
    tests/test_functions.py)."""
    from vietnamese_ocr_ray.functions.agg import hash_aggregate
    from vietnamese_ocr_ray.functions.joins import key_bucket

    num_buckets = 32
    n_docs = ds.count()

    def distinct_tokens_per_doc(batch: pa.Table) -> pa.Table:
        toks_list = pc.split_pattern(batch.column("text"), " ")
        flat = pc.list_flatten(toks_list)
        ntok = pc.list_value_length(toks_list).to_numpy(zero_copy_only=False)
        doc = np.repeat(
            np.asarray(batch.column("doc_id"), dtype=np.int64), ntok
        )
        g = (
            pa.table({"tok": flat, "doc": pa.array(doc)})
            .to_pandas()
            .drop_duplicates(["tok", "doc"])
            .groupby("tok", as_index=False, sort=False)
            .agg(n=("doc", "size"))
        )
        return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(
            None
        )

    df_ds = hash_aggregate(
        ds.map_batches(distinct_tokens_per_doc, batch_format="pyarrow"),
        ["tok"],
        {"df": ("n", "sum")},
        num_buckets=num_buckets,
    )

    def tf_rows(batch: pa.Table) -> pa.Table:
        toks_list = pc.split_pattern(batch.column("text"), " ")
        flat = pc.list_flatten(toks_list)
        ntok = pc.list_value_length(toks_list).to_numpy(zero_copy_only=False)
        doc = np.repeat(
            np.asarray(batch.column("doc_id"), dtype=np.int64), ntok
        )
        tf = (
            pa.table({"doc_id": pa.array(doc), "tok": flat})
            .to_pandas()
            .groupby(["doc_id", "tok"], as_index=False, sort=False)
            .size()
        )
        t = pa.table(
            {
                "tok": pa.array(tf["tok"].to_numpy(), pa.string()),
                "doc_id": pa.array(tf["doc_id"].to_numpy(np.int64)),
                "tf": pa.array(tf["size"].to_numpy(np.int64)),
                "df": pa.nulls(len(tf), pa.int64()),
            }
        )
        return t.append_column(
            "_bucket",
            pa.array(key_bucket(t.column("tok"), num_buckets).astype(np.int32)),
        )

    def df_side(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "tok": batch.column("tok"),
                "doc_id": pa.nulls(batch.num_rows, pa.int64()),
                "tf": pa.nulls(batch.num_rows, pa.int64()),
                "df": pc.cast(batch.column("df"), pa.int64()),
            }
        )
        return t.append_column(
            "_bucket",
            pa.array(key_bucket(t.column("tok"), num_buckets).astype(np.int32)),
        )

    def attach_idf(g: pd.DataFrame) -> pa.Table:
        tf = g[g["df"].isna()][["tok", "doc_id", "tf"]]
        dfs = g[~g["df"].isna()][["tok", "df"]]
        m = tf.merge(dfs, on="tok", how="inner")
        score = m["tf"].to_numpy(np.int64) * np.log(
            float(n_docs) / m["df"].to_numpy(np.int64)
        )
        t = pa.table(
            {
                "doc_id": pa.array(m["doc_id"].to_numpy(np.int64)),
                "tok": pa.array(m["tok"].to_numpy(), pa.string()),
                "score": pa.array(score, pa.float64()),
            }
        )
        return t.append_column(
            "_bucket",
            pa.array(
                key_bucket(t.column("doc_id"), num_buckets).astype(np.int32)
            ),
        )

    def topk_per_doc(g: pd.DataFrame) -> pa.Table:
        top = (
            g.sort_values(
                ["doc_id", "score", "tok"], ascending=[True, False, True],
                kind="stable",
            )
            .groupby("doc_id", sort=False)
            .head(k)
        )
        return pa.table(
            {
                "doc_id": pa.array(top["doc_id"].to_numpy(np.int64)),
                "tok": pa.array(top["tok"].to_numpy(), pa.string()),
                "score": pa.array(
                    np.round(top["score"].to_numpy(), 6), pa.float64()
                ),
            }
        )

    scored = (
        ds.map_batches(tf_rows, batch_format="pyarrow")
        .union(df_ds.map_batches(df_side, batch_format="pyarrow"))
        .groupby("_bucket")
        .map_groups(
            lambda g: attach_idf(g.drop(columns=["_bucket"])),
            batch_format="pandas",
        )
    )
    return scored.groupby("_bucket").map_groups(
        lambda g: topk_per_doc(g.drop(columns=["_bucket"])),
        batch_format="pandas",
    )


def repetition_ratio_batch(batch: pa.Table) -> pa.Table:
    """Boilerplate/repetition signal (the Gopher-rules shape): fraction
    of token TRIGRAMS that are repeats of an earlier trigram in the
    same doc — (n - distinct) / n, 0.0 for docs with < 3 tokens.
    Vectorized: two slice-joins over the flat token buffer build every
    adjacent trigram, doc boundaries masked, per-doc distinct via one
    lexsort over 64-bit trigram hashes (collision odds ~2^-64 per
    trigram pair — the standard hashed-distinct tradeoff). NB: imports
    used by worker-executed functions live at module top — by-value
    pickling cannot cover in-function imports (verify SKILL.md)."""
    toks_list = pc.split_pattern(batch.column("text"), " ")
    flat = pc.list_flatten(toks_list)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    ntok = pc.list_value_length(toks_list).to_numpy(zero_copy_only=False)
    nb = batch.num_rows
    n = len(flat)
    total = np.maximum(ntok - 2, 0).astype(np.int64)
    distinct = np.zeros(nb, dtype=np.int64)
    if n >= 3:
        tri = pc.binary_join_element_wise(
            flat.slice(0, n - 2),
            flat.slice(1, n - 2),
            flat.slice(2, n - 2),
            pa.scalar(" "),
        )
        # trigram at flat position p belongs to doc d iff all three
        # tokens lie inside d: p and p+2 in d
        ends = np.cumsum(ntok)
        doc = np.searchsorted(ends, np.arange(n - 2), side="right")
        valid = (np.arange(n - 2) + 3) <= ends[np.minimum(doc, nb - 1)]
        h = content_hash64(tri)[valid]
        d = doc[valid]
        order = np.lexsort((h, d))
        d, h = d[order], h[order]
        first = np.ones(d.shape[0], dtype=bool)
        first[1:] = (d[1:] != d[:-1]) | (h[1:] != h[:-1])
        distinct = np.bincount(d[first], minlength=nb)
    ratio = np.where(total > 0, (total - distinct) / np.maximum(total, 1), 0.0)
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "n_trigrams": pa.array(total),
            "repetition_ratio": pa.array(np.round(ratio, 6), pa.float64()),
        }
    )


def repetition_ratio(ds: rd.Dataset) -> rd.Dataset:
    return ds.map_batches(repetition_ratio_batch, batch_format="pyarrow")


def span_corruption_batch(batch: pa.Table) -> pa.Table:
    """T5-style span-corruption pair construction (Raffel 2020 §3.1.4,
    the denoising-objective builder of an LLM pretraining pipeline),
    made DETERMINISTIC so it is SQL-replayable: token position ``p``
    belongs to corruption block ``p // 3``; every 7th block (block
    index ≡ 0 mod 7, ≈14% of tokens) is masked. The input keeps
    unmasked tokens and replaces each masked block with one sentinel
    ``<extra_id_k>`` (k = p // 21, the masked-block rank); the target
    lists each sentinel followed by the tokens it hides. Whole-batch
    vectorized on the flat token buffer: one split, integer masks,
    Arrow if_else + filter, ListArray rebuild, binary_join — no
    per-doc Python."""
    toks_list = pc.split_pattern(batch.column("text"), " ")
    flat = pc.list_flatten(toks_list)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    ntok = pc.list_value_length(toks_list).to_numpy(zero_copy_only=False).astype(np.int64)
    nb = batch.num_rows
    n = len(flat)
    ends = np.cumsum(ntok)
    starts = ends - ntok
    pos = np.arange(n, dtype=np.int64) - np.repeat(starts, ntok)
    doc = np.repeat(np.arange(nb, dtype=np.int64), ntok)
    masked = (pos // 3) % 7 == 0
    is_start = masked & (pos % 3 == 0)
    kstr = pc.cast(pa.array(pos // 21), pa.string())
    sent = pc.binary_join_element_wise(
        pa.scalar("<extra_id_"), kstr, pa.scalar(">"), pa.scalar("")
    )
    tok_in = pc.if_else(pa.array(is_start), sent, flat)
    keep_in = ~masked | is_start
    tok_tgt = pc.if_else(
        pa.array(is_start),
        pc.binary_join_element_wise(sent, flat, pa.scalar(" ")),
        flat,
    )

    def join_rows(tokens, keep):
        counts = np.bincount(doc[keep], minlength=nb)
        offs = np.zeros(nb + 1, dtype=np.int32)
        np.cumsum(counts, out=offs[1:])
        lst = pa.ListArray.from_arrays(
            pa.array(offs), tokens.filter(pa.array(keep))
        )
        return pc.binary_join(lst, pa.scalar(" "))

    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "n_masked": pa.array(np.bincount(doc[masked], minlength=nb)),
            "input_text": join_rows(tok_in, keep_in),
            "target_text": join_rows(tok_tgt, masked),
        }
    )


def span_corruption(ds: rd.Dataset) -> rd.Dataset:
    return ds.map_batches(span_corruption_batch, batch_format="pyarrow")


def fim_transform_batch(batch: pa.Table) -> pa.Table:
    """Fill-in-the-middle transform (Bavarian 2022, the code-LLM
    pretraining op), deterministic so it is SQL-replayable: docs with
    even doc_id are rewritten PSM-style —
    ``<PRE>prefix<SUF>suffix<MID>middle`` with character-third split
    points (prefix = chars [0, n/3), middle = [n/3, 2n/3), suffix =
    the rest) — odd doc_ids pass through (a 50% FIM rate). Vectorized
    flat-buffer byte slicing (== SQL substr in this corpus's ASCII
    regime); no Python over rows."""
    text = batch.column("text")
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    n = pc.binary_length(text).to_numpy(zero_copy_only=False).astype(np.int64)
    a = n // 3
    b = 2 * n // 3
    prefix = _slice_rows(text, np.zeros_like(n), a)
    middle = _slice_rows(text, a, b)
    suffix = _slice_rows(text, b, n)
    fim = pc.binary_join_element_wise(
        pa.scalar("<PRE>"), prefix, pa.scalar("<SUF>"), suffix,
        pa.scalar("<MID>"), middle, pa.scalar(""),
    )
    did = batch.column("doc_id")
    even = pc.equal(pc.bit_wise_and(did, pa.scalar(1, pa.int64())), 0)
    return pa.table(
        {
            "doc_id": did,
            "fim_applied": even,
            "text_out": pc.if_else(even, fim, text),
        }
    )


def _slice_rows(text: pa.Array, start: np.ndarray, stop: np.ndarray) -> pa.Array:
    """Per-row [start, stop) BYTE slice over the flat utf8 buffer —
    Arrow's slice kernels take scalar bounds only, so gather ranges
    with the repeat/arange trick (the chunk.py window pattern). Byte
    slicing == character slicing in this repo's documented ASCII
    regime (see the simhash SQL-twin note)."""
    soffs = np.frombuffer(text.buffers()[1], dtype=np.int32)[
        text.offset : text.offset + len(text) + 1
    ].astype(np.int64)
    data = (
        np.frombuffer(text.buffers()[2], dtype=np.uint8)
        if text.buffers()[2] is not None
        else np.empty(0, np.uint8)
    )
    lo = soffs[:-1] + start
    out_len = stop - start
    out_offs = np.zeros(len(text) + 1, dtype=np.int64)
    np.cumsum(out_len, out=out_offs[1:])
    nbytes = int(out_offs[-1])
    idx = (
        np.arange(nbytes, dtype=np.int64)
        - np.repeat(out_offs[:-1], out_len)
        + np.repeat(lo, out_len)
    )
    return pa.StringArray.from_buffers(
        len(text),
        pa.py_buffer(out_offs.astype(np.int32).tobytes()),
        pa.py_buffer(data[idx].tobytes()),
    )


def fim_transform(ds: rd.Dataset) -> rd.Dataset:
    return ds.map_batches(fim_transform_batch, batch_format="pyarrow")


def blocklist_flag_batch(
    batch: pa.Table, word_arr: pa.Array, id_col: str = "doc_id"
) -> pa.Table:
    """Multi-pattern word-blocklist flagging (the LDNOOBW-style
    common-crawl curation op): per-doc count of blocked-token
    occurrences, emitting only docs with >= 1 hit. One Arrow hash
    lookup over the exploded token stream (``pc.index_in`` against the
    broadcast word list) — per-batch cost is O(tokens) regardless of
    blocklist size, vs the O(patterns) match_substring passes a naive
    multi-pattern scan needs; per-doc fold-back is one np.bincount
    over searchsorted doc boundaries (chunk-safe, unlike
    list_parent_indices)."""
    toks_list = pc.split_pattern(batch.column("text"), " ")
    flat = pc.list_flatten(toks_list)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    ntok = pc.list_value_length(toks_list).to_numpy(zero_copy_only=False)
    nb = batch.num_rows
    hit = pc.is_valid(pc.index_in(flat, value_set=word_arr)).to_numpy(
        zero_copy_only=False
    )
    ends = np.cumsum(ntok)
    doc = np.searchsorted(ends, np.arange(len(flat)), side="right")
    n_blocked = np.bincount(doc[hit], minlength=nb).astype(np.int64)
    keep = pa.array(n_blocked > 0)
    return pa.table(
        {
            id_col: batch.column(id_col).filter(keep),
            "n_blocked": pa.array(n_blocked[n_blocked > 0]),
        }
    )


def blocklist_flag(
    ds: rd.Dataset, words: list[str], id_col: str = "doc_id"
) -> rd.Dataset:
    """Flag docs containing blocklisted words; the word list is tiny
    and captured by value (each worker deserializes it once with the
    function — the broadcast-small-side pattern, no shuffle)."""
    word_arr = pa.array(sorted(set(words)), pa.string())
    return ds.map_batches(
        lambda b: blocklist_flag_batch(b, word_arr, id_col),
        batch_format="pyarrow",
    )


def token_entropy_batch(batch: pa.Table) -> pa.Table:
    """Shannon entropy of each doc's token distribution (nats) — the
    repetition/diversity signal complementary to repetition_ratio.
    Vectorized: per-doc token counts via one lexsort over 64-bit token
    hashes, then entropy = ln(n) - (1/n) * sum(c * ln(c)) per doc.
    Rounded to 6 decimals on BOTH sides (numpy log vs SQL ln differ in
    the last ulp)."""
    toks_list = pc.split_pattern(batch.column("text"), " ")
    flat = pc.list_flatten(toks_list)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    ntok = pc.list_value_length(toks_list).to_numpy(zero_copy_only=False)
    nb = batch.num_rows
    h = content_hash64(flat)
    rows = np.repeat(np.arange(nb, dtype=np.int64), ntok)
    order = np.lexsort((h, rows))
    rows_s, h_s = rows[order], h[order]
    change = np.ones(rows_s.shape[0], dtype=bool)
    change[1:] = (rows_s[1:] != rows_s[:-1]) | (h_s[1:] != h_s[:-1])
    starts = np.nonzero(change)[0]
    counts = np.diff(np.append(starts, rows_s.shape[0])).astype(np.float64)
    # sum over distinct tokens of c*ln(c), accumulated per doc
    contrib = counts * np.log(counts)
    ent = np.zeros(nb, dtype=np.float64)
    np.add.at(ent, rows_s[starts], contrib)
    n = ntok.astype(np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        ent = np.where(n > 0, np.log(np.maximum(n, 1)) - ent / np.maximum(n, 1), 0.0)
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "token_entropy": pa.array(np.round(ent, 6), pa.float64()),
        }
    )


def token_entropy(ds: rd.Dataset) -> rd.Dataset:
    return ds.map_batches(token_entropy_batch, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# BM25 ranking (Robertson et al., Okapi BM25) — query-term search
# ---------------------------------------------------------------------------


def bm25_rank(
    ds: rd.Dataset,
    terms: tuple[str, ...] = ("spark", "dup"),
    k1: float = 1.2,
    b: float = 0.75,
    k: int = 10,
) -> rd.Dataset:
    """Top-``k`` documents by BM25 score for a fixed query.

    idf = ln(1 + (N - df + 0.5)/(df + 0.5));
    score = sum_t idf_t * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl)).

    Scale shape: corpus stats (N, sum dl) and the query-term df table
    are TWO tiny aggregates (query-sized, not vocabulary-sized) pulled
    to the driver as scalars; scoring is one stateless map_batches with
    no shuffle; only per-batch top-k candidate rows reach the final
    sort. Float discipline: tf/df/dl/N are exact integers, each
    (doc, term) subscore is one identical double expression on both
    sides, and the per-doc sum is over <= 2 terms — float addition is
    commutative, so ANY summation order matches bit-for-bit; the
    emitted score rounds to 6 decimals (log ulp) and the sort key is
    the ROUNDED score with a doc_id tie-break, keeping top-k stable.
    With 3+ query terms addition ASSOCIATIVITY would bite — extend via
    sorted-by-term summation on both sides before relaxing this.
    """
    if len(terms) > 2:
        raise ValueError("bm25_rank guarantees bit-parity only for <= 2 terms")

    def stats_partial(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern(batch.column("text"), " ")
        dl = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "n": pa.array([batch.num_rows], pa.int64()),
                "dl": pa.array([int(dl.sum())], pa.int64()),
            }
        )

    st = (
        ds.map_batches(stats_partial, batch_format="pyarrow")
        .aggregate(Sum("n", alias_name="n"), Sum("dl", alias_name="dl"))
    )
    n_docs, dl_sum = int(st["sum(n)"] if "sum(n)" in st else st["n"]), int(
        st["sum(dl)"] if "sum(dl)" in st else st["dl"]
    )
    avgdl = float(dl_sum) / float(n_docs)

    def df_partial(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern(batch.column("text"), " ")
        flat = pc.list_flatten(toks)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        nt = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        doc = np.repeat(
            np.asarray(batch.column("doc_id"), dtype=np.int64), nt
        )
        out_t, out_n = [], []
        for t in terms:
            mask = pc.equal(flat, pa.scalar(t)).to_numpy(zero_copy_only=False)
            out_t.append(t)
            out_n.append(int(np.unique(doc[mask]).shape[0]))
        return pa.table(
            {"tok": pa.array(out_t, pa.string()), "df": pa.array(out_n, pa.int64())}
        )

    df_rows = (
        ds.map_batches(df_partial, batch_format="pyarrow")
        .groupby("tok")
        .aggregate(Sum("df", alias_name="df"))
        .to_pandas()
    )
    dfs = dict(zip(df_rows["tok"], df_rows["df"].astype(np.int64)))
    # np.log(1.0 + x), NOT log1p: the SQL oracle writes ln(1.0 + x) and
    # the two differ in the last ulp for some inputs
    idf = {
        t: float(
            np.log(
                1.0
                + (n_docs - float(dfs.get(t, 0)) + 0.5) / (float(dfs.get(t, 0)) + 0.5)
            )
        )
        for t in terms
    }

    def score(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern(batch.column("text"), " ")
        flat = pc.list_flatten(toks)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        nt = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        rows = np.repeat(np.arange(batch.num_rows, dtype=np.int64), nt)
        dl = nt.astype(np.float64)
        total = np.zeros(batch.num_rows, np.float64)
        denom_dl = k1 * (1.0 - b + b * dl / avgdl)
        for t in terms:
            mask = pc.equal(flat, pa.scalar(t)).to_numpy(zero_copy_only=False)
            tf = np.zeros(batch.num_rows, np.float64)
            np.add.at(tf, rows[mask], 1.0)
            total = total + np.where(
                tf > 0, idf[t] * tf * (k1 + 1.0) / (tf + denom_dl), 0.0
            )
        keep = total > 0
        out = pa.table(
            {
                "doc_id": batch.column("doc_id").filter(pa.array(keep)),
                "bm25": pa.array(np.round(total[keep], 6), pa.float64()),
            }
        )
        # per-batch partial top-k bounds the final sort's input
        df = out.to_pandas().sort_values(
            ["bm25", "doc_id"], ascending=[False, True]
        ).head(k)
        return pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(None)

    return (
        ds.map_batches(score, batch_format="pyarrow")
        .sort(["bm25", "doc_id"], descending=[True, False])
        .limit(k)
    )


def inverted_index(ds: rd.Dataset, num_buckets: int = 32) -> rd.Dataset:
    """Inverted index build: (tok, df, postings) with postings the
    comma-joined doc_ids sorted ascending — the retrieval-index
    construction pass of a search/RAG data pipeline.

    Scale shape: the shuffle carries DISTINCT (tok, doc) pairs (per
    batch dedup first), bucketed on tok so a token's full posting list
    lands in one task; list assembly is offsets + ``pc.binary_join``
    (no per-group Python). A bucket holds ~vocab/num_buckets posting
    lists — raise num_buckets for corpora with hot vocabularies.
    """
    import pandas as pd

    from vietnamese_ocr_ray.functions.joins import key_bucket

    def pairs(batch: pa.Table) -> pa.Table:
        toks_list = pc.split_pattern(batch.column("text"), " ")
        flat = pc.list_flatten(toks_list)
        ntok = pc.list_value_length(toks_list).to_numpy(zero_copy_only=False)
        doc = np.repeat(
            np.asarray(batch.column("doc_id"), dtype=np.int64), ntok
        )
        df = (
            pd.DataFrame({"tok": np.asarray(flat), "doc_id": doc})
            .drop_duplicates()
        )
        t = pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(
            None
        )
        return t.append_column(
            "_bucket",
            pa.array(key_bucket(t.column("tok"), num_buckets).astype(np.int32)),
        )

    def build(g: pd.DataFrame) -> pa.Table:
        g = g.drop_duplicates(["tok", "doc_id"]).sort_values(
            ["tok", "doc_id"], kind="stable"
        )
        tok = g["tok"].to_numpy()
        first = np.ones(len(g), dtype=bool)
        first[1:] = tok[1:] != tok[:-1]
        runs = np.nonzero(first)[0]
        offsets = np.append(runs, len(g)).astype(np.int32)
        ids = pc.cast(pa.array(g["doc_id"].to_numpy(np.int64)), pa.string())
        lists = pa.ListArray.from_arrays(pa.array(offsets), ids)
        return pa.table(
            {
                "tok": pa.array(tok[runs], pa.string()),
                "df": pa.array(np.diff(offsets).astype(np.int64)),
                "postings": pc.binary_join(lists, pa.scalar(",")),
            }
        )

    return (
        ds.map_batches(pairs, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(
            lambda g: build(g.drop(columns=["_bucket"])), batch_format="pandas"
        )
    )


def type_token_ratio(ds: rd.Dataset) -> rd.Dataset:
    """Per-doc type-token ratio (lexical-diversity quality signal):
    (doc_id, n_tokens, n_distinct, ttr) with ttr rounded to 6 dp in
    INTEGER micro-units (half away from zero) so the value is
    bit-exact vs the SQL oracle regardless of float rounding mode.
    Fully batch-local (a doc's tokens live inside its row): no
    shuffle. Distinct counting is one lexsort + run-detect over the
    batch's flat (doc, tok) pairs — no per-row Python."""

    def ttr(batch: pa.Table) -> pa.Table:
        toks_list = pc.split_pattern(batch.column("text"), " ")
        flat = pc.list_flatten(toks_list)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        # integer token codes (exact, vectorized — no object compares)
        codes = flat.dictionary_encode().indices.to_numpy(zero_copy_only=False)
        ntok = pc.list_value_length(toks_list).to_numpy(zero_copy_only=False)
        doc = np.repeat(np.arange(batch.num_rows, dtype=np.int64), ntok)
        order = np.lexsort((codes, doc))
        sd, sf = doc[order], codes[order]
        new = np.ones(len(sd), dtype=bool)
        new[1:] = (sd[1:] != sd[:-1]) | (sf[1:] != sf[:-1])
        ndist = np.bincount(sd[new], minlength=batch.num_rows).astype(np.int64)
        nt = ntok.astype(np.int64)
        micro = (2 * 1_000_000 * ndist + nt) // (2 * nt)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_tokens": pa.array(nt),
                "n_distinct": pa.array(ndist),
                "ttr": pa.array(micro.astype(np.float64) / 1e6, pa.float64()),
            }
        )

    return ds.map_batches(ttr, batch_format="pyarrow")


def normalize_text(ds: rd.Dataset) -> rd.Dataset:
    """Canonical corpus text cleaning — the standard pre-dedup
    normalization pass: Unicode NFC, lowercase, collapse runs of
    whitespace to one space, trim. Lower/collapse/trim are single
    Arrow kernels over the flat utf8 buffer (stateless map_batches,
    zero shuffle); NFC takes an ASCII bypass — NFC is the identity on
    ASCII, and pyarrow 16's ``utf8_normalize(form="NFC")`` stops after
    decomposition (returns NFD-shaped output), so rows whose byte
    length != codepoint length (the non-ASCII ones, detected with two
    Arrow kernels) go through ``unicodedata.normalize`` row-wise —
    batch-bounded and zero for an ASCII corpus. The oracle mirrors
    each step (lower / nfc_normalize / regexp_replace / trim — RE2
    both engines). Output: (doc_id, norm_text, changed)."""
    import unicodedata

    def norm(batch: pa.Table) -> pa.Table:
        raw = batch.column("text")
        if isinstance(raw, pa.ChunkedArray):
            raw = raw.combine_chunks()
        low = pc.utf8_lower(raw)
        nonascii = pc.not_equal(pc.binary_length(low), pc.utf8_length(low))
        if pc.any(nonascii).as_py():
            mask = np.asarray(nonascii)
            vals = low.to_pylist()
            low = pa.array(
                [
                    unicodedata.normalize("NFC", s) if m else s
                    for s, m in zip(vals, mask)
                ],
                pa.string(),
            )
        out = pc.utf8_trim_whitespace(
            pc.replace_substring_regex(
                low, pattern=r"\s+", replacement=" "
            )
        )
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "norm_text": out,
                "changed": pc.cast(
                    pc.not_equal(out, raw), pa.int64()
                ),
            }
        )

    return ds.map_batches(norm, batch_format="pyarrow")


def gopher_rules_batch(batch: pa.Table) -> pa.Table:
    """Gopher-style (Rae et al. 2021, table A1) composite quality
    rules, calibrated to this corpus: minimum length, mean-word-length
    band, filler-token ('a') fraction cap (exact integer form
    a_cnt * 20 <= n, no float boundary), and a mandatory stopword
    ('the'). One split pass; per-doc token-match counts via one
    reduceat over the list offsets — zero per-row Python."""
    text = batch.column("text").combine_chunks()
    toks = pc.split_pattern(text, " ")
    n = np.asarray(pc.list_value_length(toks), dtype=np.int64)
    n_chars = np.asarray(pc.utf8_length(text), dtype=np.int64)

    toff = np.frombuffer(toks.buffers()[1], dtype=np.int32)[
        toks.offset : toks.offset + len(toks) + 1
    ].astype(np.int64)
    flat = toks.values
    is_a = np.asarray(pc.equal(flat, "a"), dtype=np.int64)
    is_the = np.asarray(pc.equal(flat, "the"), dtype=np.int64)
    # reduceat needs non-empty segments; docs here always have >=1 token
    seg = toff[:-1]
    a_cnt = np.add.reduceat(np.concatenate([is_a, [0]]), seg)
    the_cnt = np.add.reduceat(np.concatenate([is_the, [0]]), seg)
    empty = n == 0
    a_cnt[empty] = 0
    the_cnt[empty] = 0

    mean_word = (n_chars - (n - 1)) / np.maximum(n, 1)
    r_len = (n >= 30).astype(np.int64)
    r_word = ((mean_word >= 4.0) & (mean_word <= 5.0)).astype(np.int64)
    r_filler = (a_cnt * 20 <= n).astype(np.int64)
    r_stop = (the_cnt >= 1).astype(np.int64)
    kept = r_len & r_word & r_filler & r_stop
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "n_tokens": pa.array(n),
            "r_len": pa.array(r_len),
            "r_word": pa.array(r_word),
            "r_filler": pa.array(r_filler),
            "r_stop": pa.array(r_stop),
            "kept": pa.array(kept),
        }
    )


def gopher_filter(ds: rd.Dataset) -> rd.Dataset:
    """(doc_id, n_tokens, per-rule flags, kept) for every doc —
    stateless map_batches, no shuffle."""
    return ds.map_batches(gopher_rules_batch, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Winnowing fingerprints (Schleimer, Wilkerson & Aiken 2003 — the MOSS
# local document-fingerprinting scheme)
# ---------------------------------------------------------------------------


def winnow_batch(
    batch: pa.Table, kg: int = 8, w: int = 4
) -> pa.Table:
    """Selected (doc_id, pos, fp) winnowing fingerprints of each text:
    FNV-1a hashes of every ``kg``-byte window (documents shorter than
    one gram zero-padded, mirroring dedup._shingle_hashes), then in
    every run of ``w`` consecutive gram hashes keep the minimum —
    RIGHTMOST position on ties, the paper's rule — and emit the
    selected (position, hash) set DISTINCT per document. Guarantees
    any shared substring of length >= kg + w - 1 contributes a shared
    fingerprint, with ~2/(w+1) density — the plagiarism/near-dup
    screening fingerprint that, unlike MinHash, preserves match
    POSITIONS. ``pos`` is the 1-based gram index; ``fp`` is the
    16-hex-digit hash (the simhash hex convention). Documents with
    fewer than ``w`` grams emit their single minimum. ASCII contract
    as simhash: byte == codepoint, so DuckDB can replay the FNV fold
    with unicode(substr(...)).

    Vectorized: one FNV pass over the flat utf8 buffer, one
    sliding-window argmin (reversed for rightmost-tie) over gathered
    window starts; only rows shorter than kg + w - 1 bytes take the
    per-row fallback."""
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
    n = len(arr)
    lens = offs[1:] - offs[:-1]
    ng = np.maximum(lens - kg + 1, 1)  # grams per row (padded short)

    fnv0 = np.uint64(0xCBF29CE484222325)
    prime = np.uint64(0x100000001B3)
    total = int(data.shape[0])
    H = np.full(max(total, 1), np.uint64(0xFFFFFFFFFFFFFFFF), np.uint64)
    if total >= kg:
        win = np.lib.stride_tricks.sliding_window_view(data, kg).astype(
            np.uint64
        )
        h = np.full(win.shape[0], fnv0, dtype=np.uint64)
        for i in range(kg):
            h = (h ^ win[:, i]) * prime
        H[: total - kg + 1] = h

    out_row: list[np.ndarray] = []
    out_pos: list[np.ndarray] = []
    out_fp: list[np.ndarray] = []

    # vector path: rows with at least w grams, none padded
    long = np.nonzero(ng >= w)[0]
    if long.size:
        nw = ng[long] - w + 1  # winnow windows per row
        starts0 = offs[long]
        flat_starts = np.repeat(starts0, nw) + (
            np.arange(int(nw.sum()), dtype=np.int64)
            - np.repeat(np.concatenate([[0], np.cumsum(nw)[:-1]]), nw)
        )
        gather = flat_starts[:, None] + np.arange(w, dtype=np.int64)[None, :]
        WIN = H[gather]
        idx = (w - 1) - np.argmin(WIN[:, ::-1], axis=1)
        sel_glob = flat_starts + idx
        row_of = np.repeat(long, nw)
        out_row.append(row_of)
        out_pos.append(sel_glob - offs[row_of] + 1)
        out_fp.append(H[sel_glob])

    # fallback: rows with fewer than w grams (incl. zero-padded short)
    for r in np.nonzero(ng < w)[0]:
        lr = int(lens[r])
        if lr >= kg:
            hr = H[offs[r] : offs[r] + ng[r]]
        else:
            pad = np.zeros(kg, dtype=np.uint64)
            pad[:lr] = data[offs[r] : offs[r] + lr]
            hv = fnv0
            for i in range(kg):
                hv = (hv ^ pad[i]) * prime
            hr = np.array([hv], dtype=np.uint64)
        i0 = len(hr) - 1 - int(np.argmin(hr[::-1]))
        out_row.append(np.array([r], dtype=np.int64))
        out_pos.append(np.array([i0 + 1], dtype=np.int64))
        out_fp.append(hr[i0 : i0 + 1])

    if out_row:
        rows = np.concatenate(out_row)
        poss = np.concatenate(out_pos)
        fps = np.concatenate(out_fp)
    else:
        rows = poss = np.empty(0, np.int64)
        fps = np.empty(0, np.uint64)
    # distinct (row, pos) — adjacent winnow windows reselect the same
    # gram (pos < 2^32 in-batch; fp is identical for identical (row,pos))
    key = (rows << np.int64(32)) | poss
    _, uniq = np.unique(key, return_index=True)
    rows, poss, fps = rows[uniq], poss[uniq], fps[uniq]
    # vectorized uint64 -> 16-char lowercase hex (no per-row Python)
    bytes_be = fps.astype(">u8").view(np.uint8).reshape(-1, 8)
    nib = np.empty((fps.shape[0], 16), np.uint8)
    nib[:, 0::2] = bytes_be >> 4
    nib[:, 1::2] = bytes_be & 0xF
    digits = np.frombuffer(b"0123456789abcdef", np.uint8)
    hexes = digits[nib].reshape(-1).view("S16").astype("U16")
    return pa.table(
        {
            "doc_id": pa.array(doc_ids[rows]),
            "pos": pa.array(poss),
            "fp": pa.array(hexes, pa.string()),
        }
    )


def winnow_fingerprints(ds: rd.Dataset, kg: int = 8, w: int = 4) -> rd.Dataset:
    """Corpus winnowing-fingerprint table — see :func:`winnow_batch`."""
    return ds.map_batches(
        lambda b: winnow_batch(b, kg=kg, w=w), batch_format="pyarrow"
    )


def winnow_overlap(
    ds: rd.Dataset,
    kg: int = 8,
    w: int = 4,
    min_share: int = 4,
    max_df: int = 32,
    num_buckets: int = 64,
) -> rd.Dataset:
    """Near-duplicate candidate pairs by SHARED winnowing fingerprints
    (the MOSS similarity report): (doc_a, doc_b, n_shared) for every
    document pair sharing >= ``min_share`` distinct fingerprint
    values. Fingerprints with document frequency > ``max_df`` are
    dropped entirely ("stop fingerprints" — common 8-byte phrases
    would otherwise pair quadratically many unrelated docs) as are
    singletons; both rules are plain count predicates, so the DuckDB
    oracle replays them verbatim.

    Scale shape: winnow + per-doc distinct happen inside ONE
    map_batches over the corpus (a document is one row, so the
    distinct is exact batch-locally); the only exchange is the
    fp-bucket shuffle (int32 bucket of the fp hex, rows are
    (doc_id, fp) only — no text moves); per-bucket pair expansion is
    one sort + segment triu (the _bucket_pairs shape, df-capped so a
    segment emits at most max_df^2/2 pairs); the final (a, b)
    aggregation is the bucketed hash_aggregate."""
    import pandas as pd

    from vietnamese_ocr_ray.functions.agg import hash_aggregate
    from vietnamese_ocr_ray.functions.joins import key_bucket

    def partial(batch: pa.Table) -> pa.Table:
        t = winnow_batch(batch, kg=kg, w=w)
        d = t.group_by(["doc_id", "fp"]).aggregate([])
        return d.append_column(
            "_bucket",
            pa.array(key_bucket(d.column("fp"), num_buckets).astype(np.int32)),
        )

    def bucket_pairs(g: pd.DataFrame) -> pa.Table:
        s = g.sort_values(["fp", "doc_id"], kind="stable")
        fp = s["fp"].to_numpy()
        ids = s["doc_id"].to_numpy(np.int64)
        n = ids.shape[0]
        out_a, out_b = [], []
        if n:
            change = np.ones(n, dtype=bool)
            change[1:] = fp[1:] != fp[:-1]
            starts = np.nonzero(change)[0]
            sizes = np.diff(np.append(starts, n))
            multi = (sizes >= 2) & (sizes <= max_df)
            for st, m in zip(starts[multi], sizes[multi]):
                ii, jj = np.triu_indices(int(m), 1)
                seg = ids[st : st + int(m)]
                out_a.append(seg[ii])
                out_b.append(seg[jj])
        a = np.concatenate(out_a) if out_a else np.empty(0, np.int64)
        b = np.concatenate(out_b) if out_b else np.empty(0, np.int64)
        return pa.table(
            {
                "doc_a": pa.array(a),
                "doc_b": pa.array(b),
                "one": pa.array(np.ones(a.shape[0], dtype=np.int64)),
            }
        )

    pairs = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(bucket_pairs, batch_format="pandas")
    )
    agg = hash_aggregate(
        pairs, ["doc_a", "doc_b"], {"n_shared": ("one", "sum")},
        num_buckets=num_buckets,
    )
    return agg.map_batches(
        lambda b: b.filter(
            pc.greater_equal(b.column("n_shared"), pa.scalar(min_share))
        ),
        batch_format="pyarrow",
    )


GAZETTEER_TERMS = ("window", "merge sort", "query plan", "scan")


def gazetteer_spans(
    ds: rd.Dataset, terms: tuple[str, ...] = GAZETTEER_TERMS
) -> rd.Dataset:
    """Dictionary span tagging (gazetteer NER): every occurrence of
    every term as a (doc_id, term, pos) row, pos the 1-based char
    offset — the entity/keyword annotation pass of a curation
    pipeline (multi-word terms included; overlaps between different
    terms allowed, the tagger is per-term exact).

    Scale shape: one pass; for each of the P gazetteer terms (P is
    dictionary-sized, a constant) a vectorized sliding-window byte
    comparison over the batch's flat utf8 buffer — O(P x bytes) with
    no per-row Python; matches crossing row boundaries are masked by
    offset arithmetic. ASCII contract as simhash/winnow. For
    dictionary sizes where P passes hurt, the same output shape is
    served by an Aho-Corasick actor stage; this exact-layout version
    is the oracle-checkable reference."""
    terms = tuple(terms)

    def tag(batch: pa.Table) -> pa.Table:
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
        out_d, out_t, out_p = [], [], []
        for term in terms:
            tb = np.frombuffer(term.encode(), dtype=np.uint8)
            L = tb.shape[0]
            if data.shape[0] < L:
                continue
            win = np.lib.stride_tricks.sliding_window_view(data, L)
            hit = np.nonzero((win == tb).all(axis=1))[0]
            if not hit.size:
                continue
            row = np.searchsorted(offs, hit, side="right") - 1
            inside = (hit + L) <= offs[row + 1]
            hit, row = hit[inside], row[inside]
            out_d.append(doc_ids[row])
            out_t.append(np.full(hit.shape[0], term, dtype=object))
            out_p.append(hit - offs[row] + 1)
        if out_d:
            return pa.table(
                {
                    "doc_id": pa.array(np.concatenate(out_d)),
                    "term": pa.array(
                        np.concatenate(out_t), pa.string()
                    ),
                    "pos": pa.array(np.concatenate(out_p)),
                }
            )
        return pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "term": pa.array([], pa.string()),
                "pos": pa.array([], pa.int64()),
            }
        )

    return ds.map_batches(tag, batch_format="pyarrow")


def readability_batch(batch: pa.Table) -> pa.Table:
    """Flesch reading-ease per doc with a DETERMINISTIC syllable
    heuristic: syllables(word) = max(1, number of maximal [aeiou]
    vowel runs) — the standard vowel-group approximation, exact-integer
    and SQL-replayable (regexp_extract_all on the oracle side; this
    ASCII corpus keeps byte == char). The corpus has no sentence
    punctuation, so sentences := 1 per doc (documented convention);
    score = 206.835 - 1.015*words - 84.6*(syllables/words), one fixed
    float expression rounded to 6dp.

    Vectorized: one flat-utf8 pass — vowel membership mask, run starts
    (vowel & not prev-vowel), per-token bincount, per-doc reduceat. No
    per-row Python."""
    text = batch.column("text")
    toks_list = pc.split_pattern(text, " ")
    flat = pc.list_flatten(toks_list)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    ntok = pc.list_value_length(toks_list).to_numpy(zero_copy_only=False)
    offs, data = _utf8_flat(flat)
    is_vowel = np.isin(data, np.frombuffer(b"aeiou", np.uint8))
    run_start = is_vowel.copy()
    run_start[1:] &= ~is_vowel[:-1]
    # token boundaries restart runs: a token starting mid-"run" cannot
    # happen (offsets split the buffer), but a token whose first byte
    # is a vowel while the previous token ENDED in a vowel must still
    # start a run
    starts = offs[:-1]
    valid = starts < offs[1:]
    run_start[starts[valid]] = is_vowel[starts[valid]]
    char_tok = np.searchsorted(offs, np.arange(data.shape[0]), "right") - 1
    syl_tok = np.bincount(
        char_tok[run_start], minlength=len(flat)
    ) if data.shape[0] else np.zeros(len(flat), np.int64)
    syl_tok = np.maximum(syl_tok, 1)  # vowel-less words count 1
    doc_bounds = np.concatenate([[0], np.cumsum(ntok)])[:-1]
    n_syll = (
        np.add.reduceat(syl_tok, doc_bounds)
        if len(flat)
        else np.zeros(batch.num_rows, np.int64)
    )
    n_words = ntok.astype(np.int64)
    fw = n_words.astype(np.float64)
    score = np.round(206.835 - 1.015 * fw - 84.6 * (n_syll / fw), 6)
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "n_words": pa.array(n_words),
            "n_syllables": pa.array(n_syll.astype(np.int64)),
            "flesch": pa.array(score, pa.float64()),
        }
    )


def readability(ds: rd.Dataset) -> rd.Dataset:
    """Per-doc Flesch reading ease (see :func:`readability_batch`) —
    embarrassingly parallel, zero shuffles."""
    return ds.map_batches(readability_batch, batch_format="pyarrow")


def rrf_fuse(
    ds: rd.Dataset,
    terms: tuple[str, ...] = ("spark", "dup"),
    pool: int = 20,
    k: int = 10,
    rrf_k: int = 60,
) -> rd.Dataset:
    """Reciprocal-rank fusion (Cormack et al. 2009) of two retrieval
    systems for one fixed query: the BM25 ranking (:func:`bm25_rank`)
    and a raw term-frequency ranking. Each system contributes its
    top-``pool``; a doc's fused score is
    sum over systems of 1/(rrf_k + rank) (absent = no contribution);
    output = top-``k`` by (rrf desc, doc_id).

    Determinism contract: ranks are integers (each system breaks score
    ties by doc_id), so the fused score is ONE fixed-order sum of two
    exact-reciprocal doubles — bit-replayable in SQL. absent ranks
    surface as 0 in the output (never in the score).

    Scale shape: both rankings bound their shuffle with per-batch
    partial top-k (bm25_rank does; the tf ranking computes per-doc
    counts batch-locally — a doc is one row — then partial-top-k the
    same way); fusion itself touches 2*pool rows on the driver."""
    from ray.data.aggregate import Sum  # noqa: F401  (parallel import shape)

    a = (
        bm25_rank(ds, terms=terms, k=pool)
        .to_pandas()
        .sort_values(["bm25", "doc_id"], ascending=[False, True])
        .reset_index(drop=True)
    )
    a["rank_bm25"] = np.arange(1, len(a) + 1, dtype=np.int64)

    def tf_score(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern(batch.column("text"), " ")
        flat = pc.list_flatten(toks)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        nt = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        rows = np.repeat(np.arange(batch.num_rows, dtype=np.int64), nt)
        tf = np.zeros(batch.num_rows, np.int64)
        for t in terms:
            mask = pc.equal(flat, pa.scalar(t)).to_numpy(zero_copy_only=False)
            np.add.at(tf, rows[mask], 1)
        keep = tf > 0
        out = pa.table(
            {
                "doc_id": batch.column("doc_id").filter(pa.array(keep)),
                "tf": pa.array(tf[keep]),
            }
        )
        df = (
            out.to_pandas()
            .sort_values(["tf", "doc_id"], ascending=[False, True])
            .head(pool)
        )
        return pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(None)

    b = (
        ds.map_batches(tf_score, batch_format="pyarrow")
        .sort(["tf", "doc_id"], descending=[True, False])
        .limit(pool)
        .to_pandas()
        .reset_index(drop=True)
    )
    b["rank_tf"] = np.arange(1, len(b) + 1, dtype=np.int64)

    import pandas as pd

    fused = pd.merge(
        a[["doc_id", "rank_bm25"]], b[["doc_id", "rank_tf"]],
        on="doc_id", how="outer",
    )
    ra = fused["rank_bm25"].fillna(0).to_numpy(np.int64)
    rb = fused["rank_tf"].fillna(0).to_numpy(np.int64)
    score = np.where(ra > 0, 1.0 / (rrf_k + ra), 0.0) + np.where(
        rb > 0, 1.0 / (rrf_k + rb), 0.0
    )
    fused["rrf"] = np.round(score, 6)
    fused = fused.sort_values(
        ["rrf", "doc_id"], ascending=[False, True]
    ).head(k)
    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(fused["doc_id"].to_numpy(np.int64)),
                "rank_bm25": pa.array(
                    fused["rank_bm25"].fillna(0).to_numpy(np.int64)
                ),
                "rank_tf": pa.array(
                    fused["rank_tf"].fillna(0).to_numpy(np.int64)
                ),
                "rrf": pa.array(fused["rrf"].to_numpy(), pa.float64()),
            }
        )
    )


def mlm_mask_batch(batch: pa.Table) -> pa.Table:
    """BERT-style masked-LM example construction (Devlin 2018 §3.1),
    made DETERMINISTIC so it is SQL-replayable: token position ``p`` of
    document ``d`` draws ``h = splitmix64(d * 1000003 + p)``;
    ``h % 20 < 3`` selects the 15% masked set, and within it
    ``r = (h // 20) % 10`` picks the BERT 80/10/10 treatment —
    ``r <= 7`` emits ``[MASK]``, ``r == 8`` substitutes a corrupt token
    (deterministic stand-in for BERT's random-vocab draw: the token
    REVERSED — content-derived, vocabulary-free, SQL ``reverse()``),
    ``r == 9`` keeps the original (still predicted). Targets list the
    original tokens at masked positions in order.

    Whole-batch vectorized: one split, one splitmix64 pass over
    (doc, pos) keys, Arrow if_else + filter + ListArray rebuild —
    no per-doc Python. Scale: stateless map_batches, zero shuffles.
    """
    toks_list = pc.split_pattern(batch.column("text"), " ")
    flat = pc.list_flatten(toks_list)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    ntok = (
        pc.list_value_length(toks_list).to_numpy(zero_copy_only=False).astype(np.int64)
    )
    nb = batch.num_rows
    n = len(flat)
    ends = np.cumsum(ntok)
    starts = ends - ntok
    pos = np.arange(n, dtype=np.int64) - np.repeat(starts, ntok)
    doc_ids = np.asarray(batch.column("doc_id"), dtype=np.int64)
    doc = np.repeat(np.arange(nb, dtype=np.int64), ntok)
    key = np.repeat(doc_ids, ntok).astype(np.uint64) * np.uint64(1000003) + pos.astype(
        np.uint64
    )
    h = _mix64(key)
    masked = (h % np.uint64(20)) < np.uint64(3)
    r = (h // np.uint64(20)) % np.uint64(10)
    use_mask = masked & (r <= np.uint64(7))
    use_rev = masked & (r == np.uint64(8))
    out_tok = pc.if_else(
        pa.array(use_mask),
        pa.scalar("[MASK]"),
        pc.if_else(pa.array(use_rev), pc.utf8_reverse(flat), flat),
    )

    def join_rows(tokens, keep):
        counts = np.bincount(doc[keep], minlength=nb)
        offs = np.zeros(nb + 1, dtype=np.int32)
        np.cumsum(counts, out=offs[1:])
        lst = pa.ListArray.from_arrays(
            pa.array(offs), tokens.filter(pa.array(keep))
        )
        return pc.binary_join(lst, pa.scalar(" "))

    all_keep = np.ones(n, dtype=bool)
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "n_masked": pa.array(np.bincount(doc[masked], minlength=nb)),
            "masked_text": join_rows(out_tok, all_keep),
            "target_text": join_rows(flat, masked),
        }
    )


def mlm_mask(ds: rd.Dataset) -> rd.Dataset:
    return ds.map_batches(mlm_mask_batch, batch_format="pyarrow")


def max_token_run_batch(batch: pa.Table) -> pa.Table:
    """Longest consecutive run of ONE repeated token per document —
    the degenerate-repetition filter (model-generated or boilerplate
    text shows long single-token runs that trigram repetition ratios
    under-weigh). Vectorized run-length encoding over the flat token
    buffer: run breaks where the token changes OR a doc boundary
    falls; per-doc max via np.maximum.reduceat over run lengths.
    Ties on run length report the run that appears FIRST in the doc
    (SQL: min(first position) among max-length runs).
    """
    toks_list = pc.split_pattern(batch.column("text"), " ")
    flat = pc.list_flatten(toks_list)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    ntok = (
        pc.list_value_length(toks_list).to_numpy(zero_copy_only=False).astype(np.int64)
    )
    nb = batch.num_rows
    n = len(flat)
    ends = np.cumsum(ntok)
    starts = ends - ntok
    doc = np.repeat(np.arange(nb, dtype=np.int64), ntok)
    same = np.zeros(n, dtype=bool)
    if n > 1:
        eq = pc.equal(flat.slice(0, n - 1), flat.slice(1, n - 1))
        same[1:] = eq.to_numpy(zero_copy_only=False)
        same[starts[starts > 0]] = False  # doc boundary breaks a run
    run_start = np.flatnonzero(~same)  # first index of each run
    run_len = np.diff(np.append(run_start, n))
    run_doc = doc[run_start]
    max_run = np.zeros(nb, np.int64)
    run_tok_idx = np.zeros(nb, np.int64)
    if run_start.size:
        # vectorized per-doc argmax: sort runs by (doc, -len, start)
        # and keep each doc's first row — longest run, earliest on ties
        order = np.lexsort((run_start, -run_len, run_doc))
        sd = run_doc[order]
        first = np.ones(order.shape[0], dtype=bool)
        first[1:] = sd[1:] != sd[:-1]
        best = order[first]
        max_run[run_doc[best]] = run_len[best]
        run_tok_idx[run_doc[best]] = run_start[best]
    tok = pc.if_else(
        pa.array(max_run > 0),
        flat.take(pa.array(run_tok_idx)),
        pa.scalar(None, pa.string()),
    )
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "max_run": pa.array(max_run),
            "run_token": tok,
        }
    )


def max_token_run(ds: rd.Dataset) -> rd.Dataset:
    return ds.map_batches(max_token_run_batch, batch_format="pyarrow")


def prf_expand(
    ds: rd.Dataset,
    terms: tuple[str, ...] = ("spark", "dup"),
    fb_docs: int = 5,
    fb_terms: int = 3,
    k1: float = 1.2,
    b: float = 0.75,
    k: int = 10,
) -> pa.Table:
    """Pseudo-relevance-feedback retrieval (Rocchio 1971 / RM1 shape):
    round 1 ranks by BM25, the top ``fb_docs`` documents vote
    ``fb_terms`` expansion terms (highest total tf, original terms
    excluded, ties lexicographic), and round 2 re-ranks with the
    expanded query — expansion subscores at half weight (the Rocchio
    beta as an exact integer halving). The canonical "no training
    data" retrieval-quality lift, and the machinery RAG corpora run at
    ingest time to densify sparse queries.

    Float discipline — the bm25_rank upgrade: every (doc, term)
    subscore quantizes to integer NANO units (round(x * 1e9)) before
    summation, so per-doc totals are exact int64 sums in ANY term
    order and the 2-term associativity cap of bm25_rank disappears.
    idf doubles are computed once per term from exact (N, df) ints;
    quantization points are bounded by distinct (tf, dl, df) triples.

    Scale shape: two stateless scoring scans + one tf aggregate over
    the fb_docs subset (broadcast id set, fb-bounded); corpus stats
    are two scalar aggregates; only per-batch top-k candidates reach
    the final sorts."""
    import ray

    docs_pd_cols = ("doc_id", "text")

    def stats_partial(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern(batch.column("text"), " ")
        dl = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "n": pa.array([batch.num_rows], pa.int64()),
                "dl": pa.array([int(dl.sum())], pa.int64()),
            }
        )

    st = (
        ds.map_batches(stats_partial, batch_format="pyarrow")
        .aggregate(Sum("n", alias_name="n"), Sum("dl", alias_name="dl"))
    )
    n_docs = int(st.get("sum(n)", st.get("n")))
    dl_sum = int(st.get("sum(dl)", st.get("dl")))
    avgdl = float(dl_sum) / float(n_docs)

    def _dfs(term_list: tuple[str, ...]) -> dict[str, int]:
        def df_partial(batch: pa.Table) -> pa.Table:
            toks = pc.split_pattern(batch.column("text"), " ")
            flat = pc.list_flatten(toks)
            if isinstance(flat, pa.ChunkedArray):
                flat = flat.combine_chunks()
            nt = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
            doc = np.repeat(
                np.asarray(batch.column("doc_id"), dtype=np.int64), nt
            )
            out_t, out_n = [], []
            for t in term_list:
                m = pc.equal(flat, pa.scalar(t)).to_numpy(zero_copy_only=False)
                out_t.append(t)
                out_n.append(int(np.unique(doc[m]).shape[0]))
            return pa.table(
                {
                    "tok": pa.array(out_t, pa.string()),
                    "df": pa.array(out_n, pa.int64()),
                }
            )

        rows = (
            ds.map_batches(df_partial, batch_format="pyarrow")
            .groupby("tok")
            .aggregate(Sum("df", alias_name="df"))
            .to_pandas()
        )
        return dict(zip(rows["tok"], rows["df"].astype(np.int64)))

    def _score_nano(term_list, weights_half) -> "rd.Dataset":
        dfs = _dfs(term_list)
        idf = {
            t: float(
                np.log(
                    1.0
                    + (n_docs - float(dfs.get(t, 0)) + 0.5)
                    / (float(dfs.get(t, 0)) + 0.5)
                )
            )
            for t in term_list
        }

        def score(batch: pa.Table) -> pa.Table:
            toks = pc.split_pattern(batch.column("text"), " ")
            flat = pc.list_flatten(toks)
            if isinstance(flat, pa.ChunkedArray):
                flat = flat.combine_chunks()
            nt = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
            nb = batch.num_rows
            doc = np.repeat(np.arange(nb, dtype=np.int64), nt)
            dl = nt.astype(np.float64)
            total = np.zeros(nb, np.int64)
            for t in term_list:
                m = pc.equal(flat, pa.scalar(t)).to_numpy(
                    zero_copy_only=False
                )
                tf = np.bincount(doc[m], minlength=nb).astype(np.float64)
                sub = (
                    idf[t]
                    * tf
                    * (k1 + 1.0)
                    / (tf + k1 * (1.0 - b + b * dl / avgdl))
                )
                sub_nano = np.round(sub * 1e9).astype(np.int64)
                if weights_half and t in weights_half:
                    sub_nano = sub_nano // 2
                total += sub_nano
            return pa.table(
                {
                    "doc_id": batch.column("doc_id"),
                    "score_nano": pa.array(total),
                }
            )

        return ds.map_batches(score, batch_format="pyarrow")

    # round 1: original query, top fb_docs
    r1 = (
        _score_nano(terms, None)
        .sort(["score_nano", "doc_id"], descending=[True, False])
        .limit(fb_docs)
        .to_pandas()
    )
    fb_ids = set(r1["doc_id"].astype(np.int64))
    ids_handle = ray.put(np.array(sorted(fb_ids), np.int64))

    def fb_tf(batch: pa.Table) -> pa.Table:
        want = ray.get(ids_handle)
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        sub = batch.filter(pa.array(np.isin(ids, want)))
        if sub.num_rows == 0:
            return pa.table(
                {"tok": pa.array([], pa.string()), "n": pa.array([], pa.int64())}
            )
        toks = pc.list_flatten(pc.split_pattern(sub.column("text"), " "))
        t = pa.table({"tok": toks})
        g = t.group_by("tok").aggregate([([], "count_all")])
        return g.rename_columns(["tok", "n"])

    tf_rows = (
        ds.map_batches(fb_tf, batch_format="pyarrow")
        .groupby("tok")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    tf_rows = tf_rows[~tf_rows["tok"].isin(terms)]
    tf_rows = tf_rows.sort_values(
        ["n", "tok"], ascending=[False, True], kind="stable"
    ).head(fb_terms)
    expansion = tuple(tf_rows["tok"])

    # round 2: expanded query, expansion at half weight
    full = terms + expansion
    out = (
        _score_nano(full, set(expansion))
        .sort(["score_nano", "doc_id"], descending=[True, False])
        .limit(k)
        .to_pandas()
    )
    out["rank"] = np.arange(1, len(out) + 1, dtype=np.int64)
    return pa.table(
        {
            "rank": pa.array(out["rank"].to_numpy(np.int64)),
            "doc_id": pa.array(out["doc_id"].to_numpy(np.int64)),
            "score_nano": pa.array(out["score_nano"].to_numpy(np.int64)),
        }
    )


def unicode_script_profile(ds: rd.Dataset) -> rd.Dataset:
    """Per-language Unicode block profile: counts of codepoints in six
    coarse classes — ascii_letter, digit, space, punct_symbol (other
    ASCII), latin_ext (U+0080–U+024F + combining marks + Latin
    Extended Additional, the Vietnamese-diacritic ranges), other — the
    script-mix audit a multilingual curation run uses to catch
    mislabeled or transliterated documents (a 'vi' shard with no
    latin_ext mass is suspect).

    Shape: the flat utf8 buffer decodes ONCE per batch to a uint32
    codepoint array (the vocab_build fallback pattern — no per-row
    Python); class assignment is vectorized searchsorted over the
    range table; per-(lang, class) partial counts ride one
    languages-bounded aggregate. Exact integers everywhere; the SQL
    oracle classifies unicode(c) with the identical range CASE."""
    from ray.data.aggregate import Sum

    from vietnamese_ocr_ray.functions.dedup import _utf8_flat

    CLASSES = [
        "ascii_letter", "digit", "space", "punct_symbol", "latin_ext",
        "other",
    ]

    def classify(cp: np.ndarray) -> np.ndarray:
        cls = np.full(cp.shape[0], 5, np.int64)  # other
        ascii_ = cp < 128
        letter = ascii_ & (
            ((cp >= 65) & (cp <= 90)) | ((cp >= 97) & (cp <= 122))
        )
        digit = ascii_ & (cp >= 48) & (cp <= 57)
        space = (cp == 32) | (cp == 9) | (cp == 10) | (cp == 13)
        latin_ext = (
            ((cp >= 0x80) & (cp <= 0x24F))
            | ((cp >= 0x300) & (cp <= 0x36F))
            | ((cp >= 0x1E00) & (cp <= 0x1EFF))
        )
        cls[latin_ext] = 4
        cls[ascii_ & ~letter & ~digit & ~space] = 3
        cls[space] = 2
        cls[digit] = 1
        cls[letter] = 0
        return cls

    def partial(batch: pa.Table) -> pa.Table:
        arr = batch.column("text")
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        offs, data = _utf8_flat(arr)
        if data.size == 0:
            cp = np.array([], np.uint32)
            doc_lang = np.array([], object)
        else:
            s = data.tobytes().decode("utf-8")
            cp = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32)
            # map each codepoint to its row's lang: per-row CHAR counts
            # = utf8_length (codepoints, not bytes)
            nchar = pc.utf8_length(arr).to_numpy(zero_copy_only=False)
            lang = batch.column("lang").to_numpy(zero_copy_only=False)
            doc_lang = np.repeat(lang, nchar)
        cls = classify(cp.astype(np.int64))
        t = pa.table(
            {
                "lang": pa.array(doc_lang, pa.string()),
                "cls": pa.array(cls),
            }
        )
        g = t.group_by(["lang", "cls"]).aggregate(
            [("cls", "count")]
        ).rename_columns(["lang", "cls", "n"])
        return g

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["lang", "cls"])
        .aggregate(Sum("n", alias_name="n"))
    )

    def finish(b: pa.Table) -> pa.Table:
        cls = np.asarray(b.column("cls"), dtype=np.int64)
        return pa.table(
            {
                "lang": b.column("lang"),
                "char_class": pa.array(
                    [CLASSES[c] for c in cls], pa.string()
                ),
                "n_chars": pc.cast(b.column("n"), pa.int64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow").sort(
        ["lang", "char_class"]
    )


def lang_confusion(ds: rd.Dataset) -> rd.Dataset:
    """Language-ID confusion table: the marker-count heuristic's
    prediction vs the labeled lang, counted per (lang, lang_pred)
    cell — the router-quality audit run before trusting lang-id to
    shard a corpus (off-diagonal mass = misrouted documents).
    Shape: lang_id's per-batch scorer with the label carried through,
    per-batch cell partials, one (langs x langs)-bounded aggregate."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        pred = lang_id_batch(batch.select(["doc_id", "text"]))
        t = pa.table(
            {
                "lang": batch.column("lang"),
                "lang_pred": pred.column("lang_pred"),
            }
        )
        return t.group_by(["lang", "lang_pred"]).aggregate(
            [("lang", "count")]
        ).rename_columns(["lang", "lang_pred", "n"])

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["lang", "lang_pred"])
        .aggregate(Sum("n", alias_name="n_docs"))
        .map_batches(
            lambda b: pa.table(
                {
                    "lang": b.column("lang"),
                    "lang_pred": b.column("lang_pred"),
                    "n_docs": pc.cast(b.column("n_docs"), pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
        .sort(["lang", "lang_pred"])
    )


def rle_compress_ratio(ds: rd.Dataset) -> rd.Dataset:
    """Per-document run-length compressibility proxy: the number of
    maximal equal-CODEPOINT runs over the character count, in ppm —
    near 1e6 means no repetition; low values flag degenerate repeated-
    character content (the cheap cousin of max_token_run's token-level
    rule; real pipelines use a zlib ratio, whose library dependence
    makes it non-replayable — runs are exact on both engines).

    Shape: ONE bulk utf-8 -> utf-32 decode per batch (the vocab_build
    fallback pattern), vectorized boundary diff with per-row resets,
    one add.reduceat — no shuffle at all (per-doc output)."""
    from vietnamese_ocr_ray.functions.dedup import _utf8_flat

    def partial(batch: pa.Table) -> pa.Table:
        arr = batch.column("text")
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        offs, data = _utf8_flat(arr)
        nchar = pc.utf8_length(arr).to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        n = len(arr)
        if data.size:
            cp = np.frombuffer(
                data.tobytes().decode("utf-8").encode("utf-32-le"),
                dtype=np.uint32,
            ).astype(np.int64)
        else:
            cp = np.empty(0, np.int64)
        # codepoint offsets per row (cumulative char counts)
        coffs = np.concatenate(([0], np.cumsum(nchar)))
        change = np.ones(cp.shape[0], dtype=bool)
        change[1:] = cp[1:] != cp[:-1]
        change[coffs[:-1][nchar > 0]] = True  # row starts begin a run
        runs = np.zeros(n, np.int64)
        nz = nchar > 0
        if change.any():
            counts = np.add.reduceat(
                change.astype(np.int64), coffs[:-1][nz]
            )
            runs[nz] = counts
        return pa.table(
            {
                "doc_id": pc.cast(batch.column("doc_id"), pa.int64()),
                "n_chars": pa.array(nchar),
                "n_runs": pa.array(runs),
                "run_ppm": pa.array(
                    1_000_000 * runs // np.maximum(nchar, 1)
                ),
            }
        )

    return ds.map_batches(partial, batch_format="pyarrow").sort("doc_id")
