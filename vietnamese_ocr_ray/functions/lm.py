"""Corpus-trained bigram language-model scoring (CCNet-style quality
filtering: docs whose text the corpus LM finds improbable are
boilerplate / gibberish candidates — reference has no analog; this is
a beyond-reference training-data op).

Model: add-one-smoothed bigram LM trained on the corpus itself.
    p(w2 | w1) = (c(w1, w2) + 1) / (ctx(w1) + V)
with ``c`` the corpus bigram count, ``ctx(w1)`` the count of w1 as a
bigram CONTEXT (occurrences excluding doc-final positions, i.e. the
row-sum of the bigram-count table), and ``V`` the corpus distinct
token count. A document's score is the negative mean bigram
log-probability (nats) — higher = less probable = lower quality.

Determinism contract (how this stays bit-exact vs the DuckDB oracle):
each bigram's log-prob is quantized to integer micro-nats
(``round(ln(p) * 1e6)`` as int64) BEFORE the per-doc mean, so the sum
is order-independent integer arithmetic; only the final division and
6-digit round are float. numpy's log and DuckDB's ln agree far beyond
the micro-nat quantum on these inputs.

Scale shape: bigram counts are ONE bucketed hash-aggregate over
per-batch partial counts (the shuffle carries distinct bigrams per
block, not token occurrences); context counts and V derive from that
table (no second pass over the corpus). Scoring broadcasts the count
tables as sorted arrays — vocabulary-bounded, the same contract as
:func:`~vietnamese_ocr_ray.functions.text.tfidf_top_terms` (for
vocabularies beyond a worker heap, the token-bucket cogroup of
``tfidf_top_terms_join`` applies identically: score bigram rows in a
w1-bucket cogroup against the count table, then doc-bucket reduce).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from vietnamese_ocr_ray.functions.agg import hash_aggregate

_SCALE = 1_000_000  # micro-nat quantization of per-bigram log-probs


def _doc_bigrams(batch: pa.Table):
    """(doc_ids, w1, w2) flat arrays of adjacent-token pairs, doc
    boundaries masked — the vectorized slice-join of top_bigrams."""
    toks_list = pc.split_pattern(batch.column("text"), " ")
    flat = pc.list_flatten(toks_list)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    ntok = pc.list_value_length(toks_list).to_numpy(zero_copy_only=False)
    n = len(flat)
    if n < 2:
        e = pa.array([], pa.string())
        return np.array([], np.int64), e, e
    w1 = flat.slice(0, n - 1)
    w2 = flat.slice(1, n - 1)
    ends = np.cumsum(ntok) - 1
    valid = np.ones(n - 1, dtype=bool)
    valid[ends[ends < n - 1]] = False
    vmask = pa.array(valid)
    doc = np.repeat(
        np.asarray(batch.column("doc_id"), dtype=np.int64), ntok
    )[:-1][valid]
    return doc, w1.filter(vmask), w2.filter(vmask)


def bigram_counts(ds: rd.Dataset, num_buckets: int = 64) -> rd.Dataset:
    """Corpus bigram count table (w1, w2, n) — per-batch partial
    value_counts, one bucketed hash-aggregate on w1."""

    def partial(batch: pa.Table) -> pa.Table:
        _, w1, w2 = _doc_bigrams(batch)
        joined = pc.binary_join_element_wise(w1, w2, pa.scalar("\x1f"))
        vc = pc.value_counts(joined)
        pair = pc.split_pattern(
            pc.struct_field(vc, "values"), "\x1f", max_splits=1
        )
        flat = pc.list_flatten(pair)
        return pa.table(
            {
                "w1": flat.take(np.arange(0, len(flat), 2)),
                "w2": flat.take(np.arange(1, len(flat), 2)),
                "n": pc.struct_field(vc, "counts").cast(pa.int64()),
            }
        )

    return hash_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["w1", "w2"],
        {"n": ("n", "sum")},
        num_buckets=num_buckets,
    )


def pmi_collocations(
    ds: rd.Dataset, k: int = 20, min_count: int = 5
) -> rd.Dataset:
    """Top-``k`` collocations by pointwise mutual information:
    pmi(w1, w2) = ln(c12 * B / (left(w1) * right(w2))) with B the
    corpus bigram total, left/right the marginal bigram-start/-end
    counts, and a ``min_count`` support floor (rare pairs dominate raw
    PMI). Phrase mining for tokenizer / vocab construction.

    Scale shape: everything derives from the bigram-count table — two
    vocabulary-sized hash-aggregates for the marginals (never a second
    corpus pass), marginals broadcast as sorted arrays into a
    map_batches over the counts, top-k via sort+limit on the
    vocabulary-sized scored table. Selection orders on the ROUNDED
    score (matching the SQL oracle's ORDER BY of the emitted alias)
    with a (w1, w2) tiebreak."""
    import ray

    counts = bigram_counts(ds)
    left = hash_aggregate(
        counts, ["w1"], {"nl": ("n", "sum")}
    ).to_pandas()  # vocabulary-bounded
    right = hash_aggregate(counts, ["w2"], {"nr": ("n", "sum")}).to_pandas()
    total = float(left["nl"].sum())
    handle = ray.put(
        (
            pa.array(left["w1"].to_numpy(), pa.string()),
            left["nl"].to_numpy(np.int64),
            pa.array(right["w2"].to_numpy(), pa.string()),
            right["nr"].to_numpy(np.int64),
        )
    )

    def score(batch: pa.Table) -> pa.Table:
        l_key, l_n, r_key, r_n = ray.get(handle)
        batch = batch.filter(
            pc.greater_equal(batch.column("n"), pa.scalar(min_count))
        )
        w1, w2 = batch.column("w1"), batch.column("w2")
        if isinstance(w1, pa.ChunkedArray):
            w1, w2 = w1.combine_chunks(), w2.combine_chunks()
        nl = l_n[pc.index_in(w1, value_set=l_key).to_numpy()]
        nr = r_n[pc.index_in(w2, value_set=r_key).to_numpy()]
        n = np.asarray(batch.column("n"), dtype=np.int64)
        pmi = np.round(np.log(n * total / (nl * nr)), 6)
        return pa.table(
            {
                "w1": w1,
                "w2": w2,
                "n_occurrences": pa.array(n),
                "pmi": pa.array(pmi, pa.float64()),
            }
        )

    return (
        counts.map_batches(score, batch_format="pyarrow")
        .sort(["pmi", "w1", "w2"], descending=[True, False, False])
        .limit(k)
    )


def lm_score(ds: rd.Dataset) -> rd.Dataset:
    """Per-doc negative mean bigram log-prob under the corpus bigram
    LM. Output: (doc_id, n_bigrams, lm_score) for docs with >= 2
    tokens. See module docstring for the determinism contract."""
    import ray

    from vietnamese_ocr_ray.functions.sketch import distinct_token_count

    counts = bigram_counts(ds).to_pandas()  # vocabulary-bounded
    bg_key = pa.array(
        counts["w1"].to_numpy() + "\x1f" + counts["w2"].to_numpy(), pa.string()
    )
    bg_n = counts["n"].to_numpy(np.int64)

    ctx = counts.groupby("w1", as_index=False, sort=False)["n"].sum()
    ctx_key = pa.array(ctx["w1"].to_numpy(), pa.string())
    ctx_n = ctx["n"].to_numpy(np.int64)

    vocab = float(distinct_token_count(ds)["n_distinct_tokens"][0].as_py())
    handle = ray.put((bg_key, bg_n, ctx_key, ctx_n))

    def score(batch: pa.Table) -> pa.Table:
        bg_key, bg_n, ctx_key, ctx_n = ray.get(handle)
        doc, w1, w2 = _doc_bigrams(batch)
        if len(doc) == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "n_bigrams": pa.array([], pa.int64()),
                    "lm_score": pa.array([], pa.float64()),
                }
            )
        joined = pc.binary_join_element_wise(w1, w2, pa.scalar("\x1f"))
        # every doc bigram exists in the corpus counts (trained on the
        # same corpus), so index_in never returns null
        nb = bg_n[pc.index_in(joined, value_set=bg_key).to_numpy()]
        nu = ctx_n[pc.index_in(w1, value_set=ctx_key).to_numpy()]
        # micro-nat quantization BEFORE the sum (order-independent)
        q = np.round(
            np.log((nb + 1.0) / (nu + vocab)) * _SCALE
        ).astype(np.int64)
        # docs arrive contiguous in bigram order: reduce by run
        first = np.ones(len(doc), dtype=bool)
        first[1:] = doc[1:] != doc[:-1]
        runs = np.nonzero(first)[0]
        s = -np.add.reduceat(q, runs)  # positive micro-nat totals
        cnt = np.diff(np.append(runs, len(doc))).astype(np.int64)
        # 6-dp round in INTEGER micro-nats (half away from zero) — the
        # float path lands on exact .5e-6 boundaries where numpy
        # (half-even) and SQL ROUND (half-away) disagree
        r = (2 * s + cnt) // (2 * cnt)
        return pa.table(
            {
                "doc_id": pa.array(doc[runs]),
                "n_bigrams": pa.array(cnt),
                "lm_score": pa.array(
                    r.astype(np.float64) / _SCALE, pa.float64()
                ),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow")


def dsir_logratio(
    ds: rd.Dataset,
    rate_permille: int = 100,
    salt: str = "dsirtgt:",
) -> rd.Dataset:
    """DSIR-style importance weights (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling"): score every doc by
    how much more probable a TARGET-domain bigram LM finds it than the
    corpus (source) LM — docs with high log-ratio are up-weighted when
    selecting pretraining data that matches the target.

    Target set: the deterministic ``hash_sample`` band (rerun-stable,
    SQL-mirrored) — in production the target would be a curated corpus;
    the machinery is identical. Both LMs are add-one-smoothed bigram
    models (the :func:`lm_score` formulation; unseen-by-target bigrams
    get count 0). Output: ``(doc_id, n_bigrams, dsir_micro_nats)`` with
    the log-ratio sum quantized per bigram to integer micro-nats BEFORE
    summation — order-independent integer arithmetic, bit-exact vs the
    SQL oracle; callers divide by n_bigrams for a length-normalized
    weight.

    Scale shape: two vocabulary-bounded bigram-count tables (each ONE
    bucketed hash-aggregate; the target pass scans only the sampled
    band), broadcast as sorted arrays — the same worker-heap contract
    (and token-bucket cogroup escape hatch) as :func:`lm_score`."""
    import ray

    from vietnamese_ocr_ray.functions.sampling import hash_sample
    from vietnamese_ocr_ray.functions.sketch import distinct_token_count

    target = hash_sample(
        ds, "doc_id", rate_permille=rate_permille, salt=salt
    )

    def lm_tables(sub: rd.Dataset):
        counts = bigram_counts(sub).to_pandas()  # vocabulary-bounded
        key = pa.array(
            counts["w1"].to_numpy() + "\x1f" + counts["w2"].to_numpy(),
            pa.string(),
        )
        n = counts["n"].to_numpy(np.int64)
        ctx = counts.groupby("w1", as_index=False, sort=False)["n"].sum()
        return (
            key,
            n,
            pa.array(ctx["w1"].to_numpy(), pa.string()),
            ctx["n"].to_numpy(np.int64),
            float(distinct_token_count(sub)["n_distinct_tokens"][0].as_py()),
        )

    t_key, t_n, t_ckey, t_cn, t_v = lm_tables(target)
    s_key, s_n, s_ckey, s_cn, s_v = lm_tables(ds)
    handle = ray.put((t_key, t_n, t_ckey, t_cn, s_key, s_n, s_ckey, s_cn))

    def lookup(values, key_arr, n_arr):
        idx = pc.fill_null(pc.index_in(values, value_set=key_arr), -1)
        idx = idx.to_numpy(zero_copy_only=False).astype(np.int64)
        return np.where(idx >= 0, n_arr[np.maximum(idx, 0)], 0)

    def score(batch: pa.Table) -> pa.Table:
        t_key, t_n, t_ckey, t_cn, s_key, s_n, s_ckey, s_cn = ray.get(handle)
        doc, w1, w2 = _doc_bigrams(batch)
        if len(doc) == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "n_bigrams": pa.array([], pa.int64()),
                    "dsir_micro_nats": pa.array([], pa.int64()),
                }
            )
        joined = pc.binary_join_element_wise(w1, w2, pa.scalar("\x1f"))
        tb = lookup(joined, t_key, t_n)
        tc = lookup(w1, t_ckey, t_cn)
        sb = lookup(joined, s_key, s_n)  # always present (source = corpus)
        sc = lookup(w1, s_ckey, s_cn)
        q = np.round(np.log((tb + 1.0) / (tc + t_v)) * _SCALE).astype(
            np.int64
        ) - np.round(np.log((sb + 1.0) / (sc + s_v)) * _SCALE).astype(
            np.int64
        )
        first = np.ones(len(doc), dtype=bool)
        first[1:] = doc[1:] != doc[:-1]
        runs = np.nonzero(first)[0]
        s = np.add.reduceat(q, runs)
        cnt = np.diff(np.append(runs, len(doc))).astype(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(doc[runs]),
                "n_bigrams": pa.array(cnt),
                "dsir_micro_nats": pa.array(s),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow")


def kl_source_divergence(ds: rd.Dataset, num_buckets: int = 64) -> rd.Dataset:
    """Per-source KL divergence of the source's token unigram
    distribution from the corpus distribution — the domain-shift /
    contamination audit run when mixing crawl snapshots:
    KL(P_s || P_c) = sum_t p_s(t) ln(p_s(t) / p_c(t)).

    Determinism: each token's contribution is quantized to integer
    NANO-nats and the per-source reduce is an integer sum, so the
    emitted double (sum / 1e9, exact for |sum| < 2^53) is bit-equal to
    the SQL oracle with no rounding step at all.

    Scale shape: one bucketed hash-aggregate builds the (tok, source)
    count table (bucketed on tok — source alone would skew); corpus
    marginals derive from IT (no second corpus pass); the vocab-sized
    marginal broadcasts; the final reduce is sources-sized."""
    import ray

    counts = hash_aggregate(
        ds.map_batches(_source_token_counts, batch_format="pyarrow"),
        ["tok", "source"],
        {"c": ("c", "sum")},
        num_buckets=num_buckets,
    ).materialize()  # vocab x sources - bounded; reused three times

    cc = hash_aggregate(counts, ["tok"], {"cc": ("c", "sum")}).to_pandas()
    ns = hash_aggregate(counts, ["source"], {"n": ("c", "sum")}).to_pandas()
    n_corpus = float(ns["n"].sum())
    handle = ray.put(
        (
            pa.array(cc["tok"].to_numpy(), pa.string()),
            cc["cc"].to_numpy(np.int64),
            pa.array(ns["source"].to_numpy(), pa.string()),
            ns["n"].to_numpy(np.int64),
        )
    )

    def contrib(batch: pa.Table) -> pa.Table:
        cc_key, cc_n, s_key, s_n = ray.get(handle)
        tok, src = batch.column("tok"), batch.column("source")
        if isinstance(tok, pa.ChunkedArray):
            tok, src = tok.combine_chunks(), src.combine_chunks()
        c = np.asarray(batch.column("c"), dtype=np.float64)
        ccv = cc_n[pc.index_in(tok, value_set=cc_key).to_numpy()]
        nsv = s_n[pc.index_in(src, value_set=s_key).to_numpy()].astype(
            np.float64
        )
        q = np.round(
            (c / nsv) * np.log((c * n_corpus) / (nsv * ccv)) * 1e9
        ).astype(np.int64)
        return pa.table({"source": src, "q": pa.array(q)})

    kl = hash_aggregate(
        counts.map_batches(contrib, batch_format="pyarrow"),
        ["source"],
        {"q": ("q", "sum")},
        num_buckets=8,
    )

    def finish(b: pa.Table) -> pa.Table:
        _, _, s_key, s_n = ray.get(handle)
        src = b.column("source")
        if isinstance(src, pa.ChunkedArray):
            src = src.combine_chunks()
        n = s_n[pc.index_in(src, value_set=s_key).to_numpy()]
        return pa.table(
            {
                "source": src,
                "n_tokens": pa.array(n),
                "kl": pa.array(
                    np.asarray(b.column("q"), np.int64).astype(np.float64)
                    / 1e9,
                    pa.float64(),
                ),
            }
        )

    return kl.map_batches(finish, batch_format="pyarrow")


def _source_token_counts(batch: pa.Table) -> pa.Table:
    toks_list = pc.split_pattern(batch.column("text"), " ")
    flat = pc.list_flatten(toks_list)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    ntok = pc.list_value_length(toks_list).to_numpy(zero_copy_only=False)
    src = np.repeat(np.asarray(batch.column("source")), ntok)
    import pandas as pd

    g = (
        pd.DataFrame({"tok": np.asarray(flat), "source": src})
        .groupby(["tok", "source"], as_index=False, sort=False)
        .size()
        .rename(columns={"size": "c"})
    )
    return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(
        None
    )


def chi2_token_lang(
    ds: rd.Dataset, min_df: int = 5, num_buckets: int = 64
) -> rd.Dataset:
    """Chi-square token<->language association (the classic
    feature-selection statistic over a 2x2 document-frequency
    contingency table): for each (lang, tok) observed pair with
    a = docs in ``lang`` containing ``tok``, b = docs in OTHER langs
    containing it, c = docs in ``lang`` without it, d = the rest,

        chi2 = N * (a*d - b*c)^2 / ((a+b)*(c+d)*(a+c)*(b+d))

    High chi2 = the token is distributed non-independently of the
    language — the standard pick for language-discriminative
    vocabulary (Manning & Schuetze ch. 5; reference repo has no
    analog; beyond-reference corpus-analysis op).

    Determinism contract: all four cells are exact int64
    document-frequency counts; the statistic is ONE float expression
    evaluated in a fixed left-associative order on both the numpy and
    DuckDB sides ((N*diff)*diff over ((t_total)*(N-t_total))*
    (n_lang)*(N-n_lang)), rounded to 6dp. (a*d - b*c) is computed in
    int64 — exact up to ~2^31-doc corpora; beyond that regroup to
    N*a - t_total*n_lang per the docstring note in tests.

    Scale shape: per-batch doc-distinct (lang, tok) partials (Arrow
    group_by, exact because one document is one row), ONE bucketed
    hash-aggregate on (lang, tok), a vocabulary-bounded second
    aggregate for per-token totals, language totals are a
    low-cardinality aggregate; both lookup tables broadcast once via
    ray.put and applied with vectorized index_in inside map_batches —
    no second corpus pass, no per-group Python.
    """
    import ray

    def partial(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern(batch.column("text"), " ")
        ntok = np.asarray(pc.list_value_length(toks), dtype=np.int64)
        t = pa.table(
            {
                "lang": pa.array(
                    np.repeat(np.asarray(batch.column("lang")), ntok)
                ),
                "tok": pc.list_flatten(toks),
                "doc_id": pa.array(
                    np.repeat(
                        np.asarray(batch.column("doc_id"), dtype=np.int64),
                        ntok,
                    )
                ),
            }
        )
        d = t.group_by(["lang", "tok", "doc_id"]).aggregate([])
        agg = d.group_by(["lang", "tok"]).aggregate([("doc_id", "count")])
        return pa.table(
            {
                "lang": agg.column("lang"),
                "tok": agg.column("tok"),
                "n_docs": pc.cast(agg.column("doc_id_count"), pa.int64()),
            }
        )

    counts = hash_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["lang", "tok"],
        {"n_docs": ("n_docs", "sum")},
        num_buckets=num_buckets,
    )

    def lang_partial(batch: pa.Table) -> pa.Table:
        vc = pc.value_counts(batch.column("lang"))
        return pa.table(
            {
                "lang": pc.struct_field(vc, "values"),
                "n": pc.struct_field(vc, "counts").cast(pa.int64()),
            }
        )

    lang_tot = hash_aggregate(
        ds.map_batches(lang_partial, batch_format="pyarrow"),
        ["lang"],
        {"n": ("n", "sum")},
        num_buckets=8,
    ).to_pandas()  # low-cardinality: one row per language
    tok_tot = hash_aggregate(
        counts, ["tok"], {"t_total": ("n_docs", "sum")}
    ).to_pandas()  # vocabulary-bounded (same contract as pmi/tfidf)
    n_total = int(lang_tot["n"].sum())
    handle = ray.put(
        (
            pa.array(tok_tot["tok"].to_numpy(), pa.string()),
            tok_tot["t_total"].to_numpy(np.int64),
            pa.array(lang_tot["lang"].to_numpy(), pa.string()),
            lang_tot["n"].to_numpy(np.int64),
        )
    )

    def score(batch: pa.Table) -> pa.Table:
        tok_key, tok_n, lang_key, lang_n = ray.get(handle)
        tok, lang = batch.column("tok"), batch.column("lang")
        if isinstance(tok, pa.ChunkedArray):
            tok, lang = tok.combine_chunks(), lang.combine_chunks()
        t_total = tok_n[pc.index_in(tok, value_set=tok_key).to_numpy()]
        n_lang = lang_n[pc.index_in(lang, value_set=lang_key).to_numpy()]
        a = np.asarray(batch.column("n_docs"), dtype=np.int64)
        keep = (t_total >= min_df) & (t_total < n_total)
        tok, lang = tok.filter(pa.array(keep)), lang.filter(pa.array(keep))
        a, t_total, n_lang = a[keep], t_total[keep], n_lang[keep]
        b = t_total - a
        c = n_lang - a
        d = n_total - n_lang - b
        diff = a * d - b * c  # exact int64 (docstring bound)
        fN = float(n_total)
        fdiff = diff.astype(np.float64)
        num = fN * fdiff * fdiff
        den = (
            t_total.astype(np.float64)
            * (n_total - t_total).astype(np.float64)
            * n_lang.astype(np.float64)
            * (n_total - n_lang).astype(np.float64)
        )
        return pa.table(
            {
                "lang": lang,
                "tok": tok,
                "n_docs": pa.array(a),
                "chi2": pa.array(np.round(num / den, 6), pa.float64()),
            }
        )

    return counts.map_batches(score, batch_format="pyarrow")


def skipgram_pairs(
    ds: rd.Dataset, window: int = 2, k: int = 50, num_buckets: int = 64
) -> rd.Dataset:
    """Top-``k`` skip-gram co-occurrence pairs (word2vec training-pair
    statistics): directed (center, context) counts for every context
    within ``window`` tokens of the center (offset != 0, doc
    boundaries masked) — the count table behind embedding training,
    PPMI matrices and negative-sampling tables.

    Scale shape: per offset d in 1..window, two boundary-masked
    shifted views of the flat token buffer (the _doc_bigrams
    slice-join generalized to distance d) — 2*window vectorized
    passes, no per-row Python; counts ride ONE bucketed (w1, w2)
    hash-aggregate; the top-k is sort+limit on the vocab^2-bounded
    count table. Ordering: (n DESC, w1, w2)."""

    def partial(batch: pa.Table) -> pa.Table:
        toks_list = pc.split_pattern(batch.column("text"), " ")
        flat = pc.list_flatten(toks_list)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        ntok = pc.list_value_length(toks_list).to_numpy(zero_copy_only=False)
        n = len(flat)
        row = np.repeat(np.arange(len(ntok), dtype=np.int64), ntok)
        parts_w1, parts_w2 = [], []
        for d in range(1, window + 1):
            if n <= d:
                break
            a = flat.slice(0, n - d)
            b = flat.slice(d, n - d)
            same = pa.array(row[: n - d] == row[d:])
            # forward (center=a, context=b) and backward (center=b,
            # context=a) — both directions of the symmetric window
            parts_w1.append(a.filter(same))
            parts_w2.append(b.filter(same))
            parts_w1.append(b.filter(same))
            parts_w2.append(a.filter(same))
        if not parts_w1:
            return pa.table(
                {
                    "w1": pa.array([], pa.string()),
                    "w2": pa.array([], pa.string()),
                    "n": pa.array([], pa.int64()),
                }
            )
        w1 = pa.concat_arrays(
            [p.combine_chunks() if isinstance(p, pa.ChunkedArray) else p
             for p in parts_w1]
        )
        w2 = pa.concat_arrays(
            [p.combine_chunks() if isinstance(p, pa.ChunkedArray) else p
             for p in parts_w2]
        )
        joined = pc.binary_join_element_wise(w1, w2, pa.scalar("\x1f"))
        vc = pc.value_counts(joined)
        pair = pc.split_pattern(
            pc.struct_field(vc, "values"), "\x1f", max_splits=1
        )
        flat2 = pc.list_flatten(pair)
        return pa.table(
            {
                "w1": flat2.take(np.arange(0, len(flat2), 2)),
                "w2": flat2.take(np.arange(1, len(flat2), 2)),
                "n": pc.struct_field(vc, "counts").cast(pa.int64()),
            }
        )

    counts = hash_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["w1", "w2"],
        {"n": ("n", "sum")},
        num_buckets=num_buckets,
    )
    return counts.sort(
        ["n", "w1", "w2"], descending=[True, False, False]
    ).limit(k)


def negsample_table(
    ds: rd.Dataset, table_size: int = 100_000, num_buckets: int = 64
) -> pa.Table:
    """word2vec negative-sampling table (Mikolov 2013: sample negatives
    ~ unigram^0.75): per-token slot counts apportioning ``table_size``
    slots proportionally to ``count^0.75``, by EXACT-INTEGER largest-
    remainder (Hamilton) apportionment — the companion artifact to
    :func:`skipgram_pairs` for embedding training.

    Determinism contract: the 0.75 power is computed as
    ``sqrt(sqrt(n^3))`` — IEEE sqrt is correctly rounded on BOTH numpy
    and DuckDB (libm ``pow`` is not), and ``n^3`` is exact in a double
    for n <= 2^17.6 (~200k occurrences; beyond that the cube's last
    bits round, still identically on both sides). The weight is then
    quantized to 2^-20 fixed point; base slots ``T*qw // W`` and
    remainders ``T*qw - base*W`` are exact int64 (T*qw < 2^63 for any
    vocab this side of qw ~ 9e13), and the ``T - sum(base)`` leftover
    slots go to the largest remainders (token-ascending tiebreak).
    ``sum(slots) == table_size`` exactly, always.

    Scale shape: ONE bucketed hash-aggregate of per-batch partial token
    counts (shuffle carries distinct tokens per block); the
    apportionment itself is vocabulary-bounded driver work (same
    contract as bpe merges / tfidf vocab). Output: (tok, n, slots)
    sorted by tok."""

    def partial(b: pa.Table) -> pa.Table:
        toks = pc.list_flatten(pc.split_pattern(b.column("text"), " "))
        vc = pc.value_counts(toks)
        return pa.table(
            {
                "tok": pc.struct_field(vc, "values"),
                "n": pc.struct_field(vc, "counts").cast(pa.int64()),
            }
        )

    counts = hash_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["tok"],
        {"n": ("n", "sum")},
        num_buckets=num_buckets,
    ).to_pandas()  # vocabulary-bounded
    counts = counts.sort_values("tok", kind="stable").reset_index(drop=True)
    n = counts["n"].to_numpy(np.int64)
    w = np.sqrt(np.sqrt(n.astype(np.float64) ** 3))
    qw = np.floor(w * np.float64(1 << 20)).astype(np.int64)
    W = int(qw.sum())
    T = int(table_size)
    prod = T * qw  # int64-exact (see docstring bound)
    base = prod // W
    rem = prod - base * W
    leftover = T - int(base.sum())
    # largest remainders win the leftover slots; tok-ascending tiebreak
    # (counts is already tok-sorted, so stable argsort on -rem keeps it)
    order = np.argsort(-rem, kind="stable")
    extra = np.zeros(len(qw), np.int64)
    extra[order[:leftover]] = 1
    return pa.table(
        {
            "tok": pa.array(counts["tok"].to_numpy(), pa.string()),
            "n": pa.array(n),
            "slots": pa.array(base + extra),
        }
    )


def kn_bigram_lm(
    ds: rd.Dataset,
    k: int = 30,
    min_count: int = 5,
    discount: float = 0.75,
) -> rd.Dataset:
    """Top-``k`` bigrams by interpolated Kneser-Ney probability —
    the classic smoothed bigram LM (Kneser & Ney 1995; Chen & Goodman
    1999 eq. 4.18 with a fixed discount):

        p_kn(w2 | w1) = (c(w1,w2) - d) / c(w1)
                        + d * t1(w1) / c(w1) * (t2(w2) / T)

    with t1(w1) = |{w: c(w1,w) > 0}| (continuation fan-out of w1),
    t2(w2) = |{w: c(w,w2) > 0}| (continuation fan-in of w2 — the KN
    novelty: how many contexts w2 completes, not how often), and T the
    total number of distinct bigram types. Every observed bigram has
    c >= 1 > d, so the max(c - d, 0) clamp never binds on this table.

    Scale shape: identical to :func:`pmi_collocations` — everything
    derives from the bigram-count table (one corpus pass + one bucketed
    hash-aggregate); the two marginal tables are vocabulary-bounded and
    broadcast once via ray.put; top-k via sort+limit on the scored
    count table. Selection orders on the ROUNDED score with a (w1, w2)
    tiebreak, matching the SQL oracle."""
    import ray

    counts = bigram_counts(ds)
    left = hash_aggregate(
        counts, ["w1"], {"c1": ("n", "sum"), "t1": ("n", "count")}
    ).to_pandas()  # vocabulary-bounded
    right = hash_aggregate(counts, ["w2"], {"t2": ("n", "count")}).to_pandas()
    total_types = float(left["t1"].sum())
    handle = ray.put(
        (
            pa.array(left["w1"].to_numpy(), pa.string()),
            left["c1"].to_numpy(np.int64),
            left["t1"].to_numpy(np.int64),
            pa.array(right["w2"].to_numpy(), pa.string()),
            right["t2"].to_numpy(np.int64),
        )
    )

    def score(batch: pa.Table) -> pa.Table:
        l_key, l_c1, l_t1, r_key, r_t2 = ray.get(handle)
        batch = batch.filter(
            pc.greater_equal(batch.column("n"), pa.scalar(min_count))
        )
        w1, w2 = batch.column("w1"), batch.column("w2")
        if isinstance(w1, pa.ChunkedArray):
            w1, w2 = w1.combine_chunks(), w2.combine_chunks()
        li = pc.index_in(w1, value_set=l_key).to_numpy()
        c1, t1 = l_c1[li], l_t1[li]
        t2 = r_t2[pc.index_in(w2, value_set=r_key).to_numpy()]
        n = np.asarray(batch.column("n"), dtype=np.int64)
        # fixed-order float expression — the SQL oracle replays it
        # term by term so both sides round the same IEEE double
        p = (n - discount) / c1 + discount * t1 / c1 * (t2 / total_types)
        return pa.table(
            {
                "w1": w1,
                "w2": w2,
                "n_occurrences": pa.array(n),
                "p_kn": pa.array(np.round(p, 6), pa.float64()),
            }
        )

    return (
        counts.map_batches(score, batch_format="pyarrow")
        .sort(["p_kn", "w1", "w2"], descending=[True, False, False])
        .limit(k)
    )


def zipf_slope(ds: rd.Dataset, top_n: int = 100) -> rd.Dataset:
    """Zipf exponent of the corpus: OLS slope of ln(frequency) on
    ln(rank) over the ``top_n`` most frequent tokens (rank 1 = most
    frequent, ties broken by token asc). A natural-language corpus
    lands near -1; a strong departure flags TEMPLATED or synthetic
    text — a corpus-level quality audit.

    Determinism contract: each ln is rounded to integer MICRO-nats
    (the kl_source_divergence pattern) so the OLS moment sums are
    exact int64 arithmetic on both sides; the slope is then ONE float
    division of two exact integers (the 1e6 scale factors cancel).

    Scale shape: one corpus pass of per-batch partial token counts ->
    bucketed hash-aggregate over the vocabulary -> sort+limit top_n
    (tiny) -> driver OLS on ``top_n`` integers."""

    def partial(batch: pa.Table) -> pa.Table:
        toks = pc.list_flatten(pc.split_pattern(batch.column("text"), " "))
        vc = pc.value_counts(toks)
        return pa.table(
            {
                "tok": pc.struct_field(vc, "values"),
                "n": pc.struct_field(vc, "counts").cast(pa.int64()),
            }
        )

    top = (
        hash_aggregate(
            ds.map_batches(partial, batch_format="pyarrow"),
            ["tok"],
            {"n": ("n", "sum")},
        )
        .sort(["n", "tok"], descending=[True, False])
        .limit(top_n)
        .to_pandas()  # top_n rows
    )
    n_pts = len(top)
    freq = top["n"].to_numpy(np.int64)
    rank = np.arange(1, n_pts + 1, dtype=np.int64)
    x = np.round(np.log(rank.astype(np.float64)) * 1e6).astype(np.int64)
    y = np.round(np.log(freq.astype(np.float64)) * 1e6).astype(np.int64)
    sx, sy = int(x.sum()), int(y.sum())
    sxy, sxx = int((x * y).sum()), int((x * x).sum())
    num = n_pts * sxy - sx * sy
    den = n_pts * sxx - sx * sx
    # double/double (not exact-rational) division: the SQL oracle
    # casts each exact integer to DOUBLE before dividing, so do the same
    slope = round(float(num) / float(den), 6) if den else 0.0
    return rd.from_arrow(
        pa.table(
            {
                "n_points": pa.array([n_pts], pa.int64()),
                "slope": pa.array([slope], pa.float64()),
            }
        )
    )


def heaps_law(ds: rd.Dataset, checkpoints: int = 10) -> rd.Dataset:
    """Heaps'-law vocabulary-growth audit: distinct-vocabulary size at
    ``checkpoints`` value-decile prefixes of the doc_id range, plus the
    Heaps exponent beta = OLS slope of ln(vocab) on ln(n_docs) over the
    checkpoints (natural corpora land near 0.4-0.8; beta ~ 1 flags a
    near-duplicate-free random-id corpus, beta ~ 0 a templated one).

    Semantics: a token is counted in checkpoint k iff its FIRST
    occurrence (min doc_id) falls in the first k value-deciles of the
    [min, max] doc_id range; n_docs_k counts doc_ids there too. Both
    are exact integers, so the only floats are the two ln() calls per
    checkpoint, quantized to micro-nats (the zipf_slope contract) so
    the OLS moments are exact int64.

    Scale shape: one corpus pass for (token -> min doc_id) — Arrow
    group_by partial per batch, ONE bucketed hash-aggregate min (the
    shuffle moves O(distinct tokens per block)); one pruned doc_id-only
    pass for the doc decile counts; both decile histograms are
    ``checkpoints``-row tables, so the driver finish is O(K)."""
    from ray.data.aggregate import Max, Min, Sum

    K = int(checkpoints)

    def bounds_partial(batch: pa.Table) -> pa.Table:
        d = np.asarray(batch.column("doc_id"), dtype=np.int64)
        return pa.table(
            {
                "mn": pa.array([int(d.min())], pa.int64()),
                "mx": pa.array([int(d.max())], pa.int64()),
            }
        )

    b = (
        ds.select_columns(["doc_id"])
        .map_batches(bounds_partial, batch_format="pyarrow")
        .aggregate(Min("mn", alias_name="mn"), Max("mx", alias_name="mx"))
    )
    mn, mx = int(b["mn"]), int(b["mx"])
    span = mx - mn + 1

    def doc_bucket_partial(batch: pa.Table) -> pa.Table:
        d = np.asarray(batch.column("doc_id"), dtype=np.int64)
        cnt = np.bincount((d - mn) * K // span, minlength=K)
        return pa.table(
            {
                "bucket": pa.array(np.arange(K, dtype=np.int64)),
                "c": pa.array(cnt.astype(np.int64)),
            }
        )

    doc_hist = (
        hash_aggregate(
            ds.select_columns(["doc_id"]).map_batches(
                doc_bucket_partial, batch_format="pyarrow"
            ),
            ["bucket"],
            {"c": ("c", "sum")},
            num_buckets=4,
        )
        .to_pandas()
        .set_index("bucket")["c"]
        .reindex(range(K), fill_value=0)
        .to_numpy(np.int64)
    )

    def first_doc_partial(batch: pa.Table) -> pa.Table:
        toks_list = pc.split_pattern(batch.column("text"), " ")
        flat = pc.list_flatten(toks_list)
        ntok = pc.list_value_length(toks_list).to_numpy(zero_copy_only=False)
        doc = np.repeat(
            np.asarray(batch.column("doc_id"), dtype=np.int64), ntok
        )
        g = pa.table({"tok": flat, "fd": pa.array(doc)}).group_by(
            "tok"
        ).aggregate([("fd", "min")])
        return g.rename_columns(["tok", "fd"])

    first_doc = hash_aggregate(
        ds.map_batches(first_doc_partial, batch_format="pyarrow"),
        ["tok"],
        {"fd": ("fd", "min")},
    )

    def tok_bucket_partial(batch: pa.Table) -> pa.Table:
        fd = np.asarray(batch.column("fd"), dtype=np.int64)
        cnt = np.bincount((fd - mn) * K // span, minlength=K)
        return pa.table(
            {
                "bucket": pa.array(np.arange(K, dtype=np.int64)),
                "c": pa.array(cnt.astype(np.int64)),
            }
        )

    tok_hist = (
        hash_aggregate(
            first_doc.map_batches(tok_bucket_partial, batch_format="pyarrow"),
            ["bucket"],
            {"c": ("c", "sum")},
            num_buckets=4,
        )
        .to_pandas()
        .set_index("bucket")["c"]
        .reindex(range(K), fill_value=0)
        .to_numpy(np.int64)
    )

    n_docs = np.cumsum(doc_hist)
    vocab = np.cumsum(tok_hist)
    x = np.round(np.log(n_docs.astype(np.float64)) * 1e6).astype(np.int64)
    y = np.round(np.log(vocab.astype(np.float64)) * 1e6).astype(np.int64)
    sx, sy = int(x.sum()), int(y.sum())
    sxy, sxx = int((x * y).sum()), int((x * x).sum())
    num = K * sxy - sx * sy
    den = K * sxx - sx * sx
    beta = round(float(num) / float(den), 6) if den else 0.0
    return rd.from_arrow(
        pa.table(
            {
                "checkpoint": pa.array(
                    np.arange(1, K + 1, dtype=np.int64)
                ),
                "n_docs": pa.array(n_docs),
                "vocab": pa.array(vocab),
                "beta": pa.array(np.full(K, beta), pa.float64()),
            }
        )
    )


def kn_doc_logprob(ds: rd.Dataset, discount: float = 0.75) -> rd.Dataset:
    """Per-document log-probability under the corpus's own interpolated
    Kneser-Ney bigram LM (:func:`kn_bigram_lm` eq.) — the
    trained-LM perplexity filter of a curation pipeline (CCNet's
    "score every doc under an in-domain LM" stage), with training
    folded in as the same one-pass distributed bigram count.

    Every document bigram is an observed corpus bigram (train == score
    corpus), so scoring is a broadcast lookup: the (bigram -> nano-nat
    log p_kn) table is bigram-TYPE-bounded and ships once via ray.put
    (the kn_bigram_lm heap assumption; a bucketed cogroup variant
    rides functions/joins if types outgrow a worker heap). Per-doc
    score is an exact int64 sum of per-TYPE quantized weights
    ``round(ln(p_kn) * 1e9)`` — p_kn is the fixed-order float
    expression the SQL oracle replays term by term, and quantization
    happens once per bigram type on both engines, so sums match
    bit-exact. ``avg_logp_nano`` uses TRUNCATING division (DuckDB
    ``//`` truncates toward zero on negatives; numpy floors — the
    explicit trunc keeps both engines identical)."""
    import ray

    counts = bigram_counts(ds)
    cdf = counts.to_pandas()  # bigram-type-bounded
    left = (
        cdf.groupby("w1", as_index=False)
        .agg(c1=("n", "sum"), t1=("n", "size"))
    )
    right = cdf.groupby("w2", as_index=False).agg(t2=("n", "size"))
    total_types = float(left["t1"].sum())
    m = cdf.merge(left, on="w1").merge(right, on="w2")
    n = m["n"].to_numpy(np.int64)
    c1 = m["c1"].to_numpy(np.int64)
    t1 = m["t1"].to_numpy(np.int64)
    t2 = m["t2"].to_numpy(np.int64)
    p = (n - discount) / c1 + discount * t1 / c1 * (t2 / total_types)
    w_nano = np.round(np.log(p) * 1e9).astype(np.int64)
    joint = pc.binary_join_element_wise(
        pa.array(m["w1"].to_numpy(object), pa.string()),
        pa.array(m["w2"].to_numpy(object), pa.string()),
        pa.scalar("\x1f"),
    )
    handle = ray.put((joint, w_nano))

    def score(batch: pa.Table) -> pa.Table:
        keys, weights = ray.get(handle)
        toks_list = pc.split_pattern(batch.column("text"), " ")
        flat = pc.list_flatten(toks_list)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        ntok = (
            pc.list_value_length(toks_list)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        nb = batch.num_rows
        nf = len(flat)
        ends = np.cumsum(ntok)
        doc = np.repeat(np.arange(nb, dtype=np.int64), ntok)
        logp = np.zeros(nb, np.int64)
        nbi = np.maximum(ntok - 1, 0)
        if nf >= 2:
            bi = pc.binary_join_element_wise(
                flat.slice(0, nf - 1), flat.slice(1, nf - 1), pa.scalar("\x1f")
            )
            # bigram at flat position p is internal to doc d iff p+1 < end_d
            valid = (np.arange(nf - 1) + 2) <= ends[doc[: nf - 1]]
            # filter BEFORE the lookup: cross-doc bigrams may be absent
            # from the corpus table (index_in null -> non-integer numpy)
            idx = pc.index_in(
                bi.filter(pa.array(valid)), value_set=keys
            ).to_numpy(zero_copy_only=False)
            w = weights[idx.astype(np.int64)]
            logp = np.bincount(doc[: nf - 1][valid], weights=w, minlength=nb).astype(
                np.int64
            )
        # truncating division toward zero (DuckDB // semantics)
        avg = np.zeros(nb, np.int64)
        nz = nbi > 0
        q = np.abs(logp[nz]) // nbi[nz]
        avg[nz] = np.where(logp[nz] < 0, -q, q)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_bigrams": pa.array(nbi),
                "logp_nano": pa.array(logp),
                "avg_logp_nano": pa.array(avg),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow")

def kn_doc_logprob_cogroup(
    ds: rd.Dataset,
    discount: float = 0.75,
    num_buckets: int = 64,
) -> rd.Dataset:
    """:func:`kn_doc_logprob` without the bigram-table broadcast — the
    scale path when bigram TYPES outgrow a worker heap. Same output,
    bit-identical (equivalence-tested; shares the SQL oracle).

    Shape: the per-TYPE weight table ``round(ln(p_kn) * 1e9)`` is
    computed DISTRIBUTED over the bigram-count dataset (only the two
    VOCABULARY-bounded marginal tables broadcast — orders smaller than
    the bigram table); each document batch reduces to per-(doc, type)
    occurrence counts; both sides meet in ONE bigram-key-bucket
    cogroup (the minhash corpus-join pattern) where per-doc partial
    sums are exact int64; a doc-bucket hash-aggregate folds partials
    and a bucketed cogroup attaches the per-doc bigram counts. No
    stage holds more than a bucket of the weight table."""
    import ray

    from vietnamese_ocr_ray.functions.agg import hash_aggregate
    from vietnamese_ocr_ray.functions.joins import key_bucket

    counts = bigram_counts(ds)
    # vocabulary-bounded marginals (c1, t1 per w1; t2 per w2)
    left = hash_aggregate(
        counts, ["w1"], {"c1": ("n", "sum"), "t1": ("n", "count")}
    ).to_pandas()
    right = hash_aggregate(counts, ["w2"], {"t2": ("n", "count")}).to_pandas()
    total_types = float(left["t1"].sum())
    marg_handle = ray.put(
        (
            pa.array(left["w1"].to_numpy(), pa.string()),
            left["c1"].to_numpy(np.int64),
            left["t1"].to_numpy(np.int64),
            pa.array(right["w2"].to_numpy(), pa.string()),
            right["t2"].to_numpy(np.int64),
        )
    )

    SEP = "\x1f"
    empty_cg = pa.table(
        {
            "_bucket": pa.array([], pa.int32()),
            "key": pa.array([], pa.string()),
            "doc_id": pa.array([], pa.int64()),
            "cnt": pa.array([], pa.int64()),
            "w": pa.array([], pa.int64()),
            "role": pa.array([], pa.int64()),
        }
    )

    def weight_rows(batch: pa.Table) -> pa.Table:
        """(bucket, bigram key, nano-nat weight) from a counts batch —
        the distributed replacement for the driver-built table."""
        l_key, l_c1, l_t1, r_key, r_t2 = ray.get(marg_handle)
        w1, w2 = batch.column("w1"), batch.column("w2")
        if isinstance(w1, pa.ChunkedArray):
            w1, w2 = w1.combine_chunks(), w2.combine_chunks()
        li = pc.index_in(w1, value_set=l_key).to_numpy()
        c1, t1 = l_c1[li], l_t1[li]
        t2 = r_t2[pc.index_in(w2, value_set=r_key).to_numpy()]
        n = np.asarray(batch.column("n"), dtype=np.int64)
        p = (n - discount) / c1 + discount * t1 / c1 * (t2 / total_types)
        w_nano = np.round(np.log(p) * 1e9).astype(np.int64)
        key = pc.binary_join_element_wise(w1, w2, pa.scalar(SEP))
        nr = len(key)
        return pa.table(
            {
                "_bucket": pa.array(
                    key_bucket(key, num_buckets).astype(np.int32)
                ),
                "key": key,
                "doc_id": pa.array(np.full(nr, -1, np.int64)),
                "cnt": pa.array(np.zeros(nr, np.int64)),
                "w": pa.array(w_nano),
                "role": pa.array(np.zeros(nr, np.int64)),
            }
        )

    def doc_rows(batch: pa.Table) -> pa.Table:
        """(bucket, key, doc_id, occurrence count) — per-batch combine
        to one row per (doc, bigram type)."""
        doc, w1, w2 = _doc_bigrams(batch)
        if doc.size == 0:
            return empty_cg
        key = pc.binary_join_element_wise(w1, w2, pa.scalar(SEP))
        g = (
            pa.table({"key": key, "doc_id": pa.array(doc)})
            .group_by(["key", "doc_id"])
            .aggregate([("key", "count")])
            .rename_columns(["key", "doc_id", "cnt"])
        )
        k = g.column("key")
        if isinstance(k, pa.ChunkedArray):
            k = k.combine_chunks()
        nr = g.num_rows
        return pa.table(
            {
                "_bucket": pa.array(
                    key_bucket(k, num_buckets).astype(np.int32)
                ),
                "key": k,
                "doc_id": pc.cast(g.column("doc_id"), pa.int64()),
                "cnt": pc.cast(g.column("cnt"), pa.int64()),
                "w": pa.array(np.zeros(nr, np.int64)),
                "role": pa.array(np.ones(nr, np.int64)),
            }
        )

    weights_side = counts.map_batches(weight_rows, batch_format="pyarrow")
    docs_side = ds.map_batches(doc_rows, batch_format="pyarrow")

    def merge_bucket(g: pa.Table) -> pa.Table:
        role = np.asarray(g.column("role"), dtype=np.int64)
        keys = g.column("key")
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        wmask = pa.array(role == 0)
        dmask = pa.array(role == 1)
        wkeys = keys.filter(wmask)
        wvals = np.asarray(g.column("w").filter(wmask), dtype=np.int64)
        dkeys = keys.filter(dmask)
        if len(dkeys) == 0 or len(wkeys) == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "lp": pa.array([], pa.int64()),
                }
            )
        # train == score corpus: every doc bigram is a weight key
        idx = pc.index_in(dkeys, value_set=wkeys).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        cnt = np.asarray(g.column("cnt").filter(dmask), dtype=np.int64)
        doc = np.asarray(g.column("doc_id").filter(dmask), dtype=np.int64)
        part = cnt * wvals[idx]
        t = pa.table({"doc_id": pa.array(doc), "lp": pa.array(part)})
        return t.group_by("doc_id").aggregate([("lp", "sum")]).rename_columns(
            ["doc_id", "lp"]
        )

    logp = hash_aggregate(
        weights_side.union(docs_side)
        .groupby("_bucket")
        .map_groups(merge_bucket, batch_format="pyarrow"),
        ["doc_id"],
        {"lp": ("lp", "sum")},
        num_buckets=num_buckets,
    )

    def nbi_rows(batch: pa.Table) -> pa.Table:
        toks_list = pc.split_pattern(batch.column("text"), " ")
        ntok = (
            pc.list_value_length(toks_list)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        return pa.table(
            {
                "doc_id": pc.cast(batch.column("doc_id"), pa.int64()),
                "n_bigrams": pa.array(np.maximum(ntok - 1, 0)),
                "_bucket": pa.array(
                    key_bucket(
                        pc.cast(batch.column("doc_id"), pa.int64()),
                        num_buckets,
                    ).astype(np.int32)
                ),
                "role": pa.array(np.ones(batch.num_rows, np.int64)),
                "lp": pa.array(np.zeros(batch.num_rows, np.int64)),
            }
        )

    def logp_rows(batch: pa.Table) -> pa.Table:
        d = pc.cast(batch.column("doc_id"), pa.int64())
        return pa.table(
            {
                "doc_id": d,
                "n_bigrams": pa.array(
                    np.zeros(batch.num_rows, np.int64)
                ),
                "_bucket": pa.array(
                    key_bucket(d, num_buckets).astype(np.int32)
                ),
                "role": pa.array(np.zeros(batch.num_rows, np.int64)),
                "lp": pc.cast(batch.column("lp"), pa.int64()),
            }
        )

    def attach(g: pa.Table) -> pa.Table:
        role = np.asarray(g.column("role"), dtype=np.int64)
        doc = np.asarray(g.column("doc_id"), dtype=np.int64)
        lp = np.asarray(g.column("lp"), dtype=np.int64)
        nbi = np.asarray(g.column("n_bigrams"), dtype=np.int64)
        dmask = role == 1
        ddoc, dnbi = doc[dmask], nbi[dmask]
        ldoc, llp = doc[~dmask], lp[~dmask]
        # docs with zero in-corpus bigrams have no logp row -> 0
        pos = np.searchsorted(np.sort(ldoc), ddoc)
        order = np.argsort(ldoc, kind="stable")
        ls, lv = ldoc[order], llp[order]
        got = np.zeros(ddoc.shape[0], np.int64)
        inb = pos < ls.shape[0]
        hit = np.zeros(ddoc.shape[0], dtype=bool)
        hit[inb] = ls[pos[inb]] == ddoc[inb]
        got[hit] = lv[pos[hit]]
        avg = np.zeros(ddoc.shape[0], np.int64)
        nz = dnbi > 0
        q = np.abs(got[nz]) // dnbi[nz]
        avg[nz] = np.where(got[nz] < 0, -q, q)
        return pa.table(
            {
                "doc_id": pa.array(ddoc),
                "n_bigrams": pa.array(dnbi),
                "logp_nano": pa.array(got),
                "avg_logp_nano": pa.array(avg),
            }
        )

    return (
        ds.select_columns(["doc_id", "text"])
        .map_batches(nbi_rows, batch_format="pyarrow")
        .union(logp.map_batches(logp_rows, batch_format="pyarrow"))
        .groupby("_bucket")
        .map_groups(attach, batch_format="pyarrow")
    )


def bigram_entropy_rate(ds: rd.Dataset) -> rd.Dataset:
    """Corpus bigram CONDITIONAL entropy rate H(W2 | W1) in nats —
    the LM-difficulty / templatedness audit (natural prose lands in
    the 4-7 nat range for word bigrams; a near-zero rate means the
    next word is almost determined, the classic boilerplate corpus
    smell; compare zipf_slope for the unigram-shape version).

        H = -(1/N) * sum_{w1,w2} c(w1,w2) * (ln c(w1,w2) - ln c1(w1))

    Determinism: both logs quantize to integer NANO-nats PER BIGRAM
    TYPE (the kn_doc_logprob convention — coarse enough that a
    last-ulp ln() divergence cannot flip a rounded weight), the
    weighted sum is exact int64, and the single division to DOUBLE
    happens once at the end, so Ray and DuckDB agree bit-for-bit.

    Scale shape: the bigram count table comes from the one-pass
    distributed aggregate (:func:`bigram_counts`); the left marginal
    is vocabulary-bounded and broadcast; per-batch weighted partials
    reduce to two scalars. Output: (n_bigrams, n_types,
    entropy_rate_nats)."""
    import ray
    from ray.data.aggregate import Sum

    counts = bigram_counts(ds)
    left = hash_aggregate(
        counts, ["w1"], {"c1": ("n", "sum")}
    ).to_pandas()  # vocabulary-bounded
    handle = ray.put(
        (
            pa.array(left["w1"].to_numpy(), pa.string()),
            left["c1"].to_numpy(np.int64),
        )
    )

    def partial(batch: pa.Table) -> pa.Table:
        l_key, l_c1 = ray.get(handle)
        w1 = batch.column("w1")
        if isinstance(w1, pa.ChunkedArray):
            w1 = w1.combine_chunks()
        c1 = l_c1[pc.index_in(w1, value_set=l_key).to_numpy()]
        n = np.asarray(batch.column("n"), dtype=np.int64)
        w = np.round(
            (np.log(n.astype(np.float64)) - np.log(c1.astype(np.float64)))
            * 1e9
        ).astype(np.int64)
        return pa.table(
            {
                "s": pa.array([int((n * w).sum())], pa.int64()),
                "n_bi": pa.array([int(n.sum())], pa.int64()),
                "n_types": pa.array([len(n)], pa.int64()),
            }
        )

    agg = counts.map_batches(partial, batch_format="pyarrow").aggregate(
        Sum("s", alias_name="s"),
        Sum("n_bi", alias_name="n_bi"),
        Sum("n_types", alias_name="n_types"),
    )
    s, n_bi = int(agg["s"]), int(agg["n_bi"])
    h = round(-(float(s) / float(n_bi)) / 1e9, 6) if n_bi else 0.0
    return rd.from_arrow(
        pa.table(
            {
                "n_bigrams": pa.array([n_bi], pa.int64()),
                "n_types": pa.array([int(agg["n_types"])], pa.int64()),
                "entropy_rate_nats": pa.array([h], pa.float64()),
            }
        )
    )


def hapax_ratio(ds: rd.Dataset) -> rd.Dataset:
    """Per-language hapax legomena ratio: the fraction of token TYPES
    occurring exactly once — the vocabulary-freshness audit next to
    heaps_law (natural corpora run 0.4–0.6; near 0 flags templated
    text, near 1 a random-id corpus). Exact integers + one ppm
    floor-division.

    Scale shape: per-batch (lang, tok) count partials -> ONE
    vocabulary-bounded hash aggregate -> a langs-sized per-lang count
    pass. Output: (lang, n_types, n_hapax, hapax_ppm)."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        toks_list = pc.split_pattern(batch.column("text"), " ")
        flat = pc.list_flatten(toks_list)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        ntok = pc.list_value_length(toks_list).to_numpy(zero_copy_only=False)
        lang = np.repeat(
            batch.column("lang").to_numpy(zero_copy_only=False), ntok
        )
        t = pa.table({"lang": pa.array(lang, pa.string()), "tok": flat})
        return t.group_by(["lang", "tok"]).aggregate(
            [("tok", "count")]
        ).rename_columns(["lang", "tok", "n"])

    counts = hash_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["lang", "tok"],
        {"n": ("n", "sum")},
    )

    def per_lang(b: pa.Table) -> pa.Table:
        n = np.asarray(b.column("n"), dtype=np.int64)
        t = pa.table(
            {
                "lang": b.column("lang"),
                "types": pa.array(np.ones(n.shape[0], np.int64)),
                "hapax": pa.array((n == 1).astype(np.int64)),
            }
        )
        return t.group_by("lang").aggregate(
            [("types", "sum"), ("hapax", "sum")]
        ).rename_columns(["lang", "types", "hapax"])

    agg = (
        counts.map_batches(per_lang, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(Sum("types", alias_name="types"), Sum("hapax", alias_name="hapax"))
    )

    def finish(b: pa.Table) -> pa.Table:
        ty = np.asarray(b.column("types"), dtype=np.int64)
        hp = np.asarray(b.column("hapax"), dtype=np.int64)
        return pa.table(
            {
                "lang": b.column("lang"),
                "n_types": pa.array(ty),
                "n_hapax": pa.array(hp),
                "hapax_ppm": pa.array(1_000_000 * hp // np.maximum(ty, 1)),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow").sort("lang")
