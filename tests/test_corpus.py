"""Corpus-hygiene ops: planted-case semantics (value parity vs DuckDB
is covered by the oracle sweep)."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from vietnamese_ocr_ray.functions import corpus as C


def _ds(rows):
    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
            }
        )
    )


def test_line_dedup_keeps_first_occurrence_only(ray_session):
    ds = _ds(
        [
            (1, "alpha beta window shared line window tail one"),
            (2, "shared line window alpha beta window middle"),
            (3, "unique only"),
        ]
    )
    kept = C.dedup_lines(ds).to_pandas().sort_values(["doc_id", "ord"])
    got = {(r.doc_id, r.ord): r.line for r in kept.itertuples()}
    # doc 1 keeps all three lines (first occurrences)
    assert got[(1, 0)] == "alpha beta"
    assert got[(1, 1)] == "shared line"
    assert got[(1, 2)] == "tail one"
    # doc 2 loses 'shared line' and 'alpha beta', keeps 'middle'
    assert [k for k in got if k[0] == 2] == [(2, 2)]
    assert got[(2, 2)] == "middle"
    assert got[(3, 0)] == "unique only"


def test_line_dedup_docs_reassembles_and_keeps_empty_docs(ray_session):
    ds = _ds(
        [
            (1, "first window second"),
            (2, "first window second"),  # fully duplicated doc
        ]
    )
    out = (
        C.dedup_lines_docs(ds)
        .to_pandas()
        .set_index("doc_id")["text_dedup"]
        .to_dict()
    )
    assert out == {1: "first | second", 2: ""}


def test_decontaminate_ngrams_flags_shared_13gram(ray_session):
    toks = " ".join(f"t{i}" for i in range(13))
    ds = _ds(
        [
            (1, "prefix " + toks + " suffix"),  # shares the 13-gram
            (2, "totally different words " + " ".join(f"u{i}" for i in range(13))),
            (3, toks[:-1] + "X"),  # 12 tokens shared + one changed
        ]
    )
    bench = _ds([(99, "lead " + toks)])
    clean = C.decontaminate_ngrams(ds, bench).to_pandas()["doc_id"].tolist()
    assert sorted(clean) == [2, 3]


def test_quantile_filter_exact_count(ray_session):
    n = 1000
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(np.arange(n), pa.int64()),
                "n_chars": pa.array(np.arange(n), pa.int64()),
            }
        )
    )
    out = C.quantile_filter(ds, "n_chars", 0.9).to_pandas()
    # quantile_cont(0..999, 0.9) = 899.1 -> keep 900..999
    assert sorted(out["n_chars"]) == list(range(900, 1000))


def test_dup_ngram_spans_counts_cross_doc_coverage(ray_session):
    # docs 1 and 2 share tokens s0..s13 (two overlapping 13-grams at
    # positions 0 and 1 in doc 1 -> 14 covered tokens); doc 3 repeats a
    # 13-gram only within itself (not cross-doc -> 0); doc 4 is clean.
    shared = " ".join(f"s{i}" for i in range(14))
    selfrep = " ".join(f"r{i}" for i in range(13))
    ds = _ds(
        [
            (1, shared + " tail1 tail2"),
            (2, "head1 " + shared),
            (3, selfrep + " gap " + selfrep),
            (4, "plain short doc"),
        ]
    )
    out = (
        C.dup_ngram_spans(ds, n=13)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert out.loc[1, "dup_tokens"] == 14
    assert out.loc[1, "n_tokens"] == 16
    assert out.loc[2, "dup_tokens"] == 14
    assert out.loc[3, "dup_tokens"] == 0
    assert out.loc[4, "dup_tokens"] == 0


def test_dup_ngram_spans_partitioning_invariant(ray_session):
    shared = " ".join(f"s{i}" for i in range(20))
    rows = [(i, f"u{i} " + shared + f" v{i}") for i in range(12)] + [
        (50 + i, f"only unique tokens here w{i}") for i in range(8)
    ]
    a = (
        C.dup_ngram_spans(_ds(rows), n=13, num_buckets=16)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    b = (
        C.dup_ngram_spans(
            _ds(rows).repartition(7), n=13, num_buckets=16
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert a.equals(b)
    # every doc holding the shared run is fully covered on that run
    assert (a.set_index("doc_id").loc[range(12), "dup_tokens"] == 20).all()


def test_excise_dup_ngrams_planted(ray_session):
    """ExactSubstr removal semantics on planted duplicates: a 3-gram
    shared across two docs is cut from BOTH (symmetric removal), a doc
    that is entirely one duplicated gram excises to the empty string,
    and untouched docs come back byte-identical."""
    from vietnamese_ocr_ray.functions.corpus import excise_dup_ngrams

    docs = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
            "text": pa.array(
                [
                    "aa bb cc dd ee",        # shares "bb cc dd" via doc 1
                    "xx bb cc dd yy zz",     # same gram, middle
                    "bb cc dd",              # IS the gram -> empty
                    "unique words only here", # untouched
                ]
            ),
        }
    )
    out = (
        excise_dup_ngrams(rd.from_arrow(docs), n=3)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["text"].tolist() == [
        "aa ee",
        "xx yy zz",
        "",
        "unique words only here",
    ]


def test_excise_dup_ngrams_random_vs_python_reference(ray_session):
    """200 random docs from a tiny alphabet (dense gram collisions,
    heavy overlap, repeated tokens inside one doc) — the vectorized
    delta/cumsum excision must equal an independent per-doc Python
    reference on every row."""
    import numpy as np

    from vietnamese_ocr_ray.functions.corpus import excise_dup_ngrams

    rng = np.random.default_rng(11)
    words = ["a", "b", "c", "d"]
    n_gram = 3
    texts = [
        " ".join(rng.choice(words, rng.integers(1, 12)))
        for _ in range(200)
    ]
    docs = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts),
        }
    )

    # Python reference: brute-force gram census + per-doc coverage
    toks = [t.split(" ") for t in texts]
    census = {}
    for d, tk in enumerate(toks):
        for p in range(len(tk) - n_gram + 1):
            g = tuple(tk[p : p + n_gram])
            census.setdefault(g, set()).add(d)
    want = []
    for d, tk in enumerate(toks):
        covered = [False] * len(tk)
        for p in range(len(tk) - n_gram + 1):
            g = tuple(tk[p : p + n_gram])
            if len(census[g]) > 1:
                for j in range(p, p + n_gram):
                    covered[j] = True
        want.append(" ".join(t for t, c in zip(tk, covered) if not c))

    out = (
        excise_dup_ngrams(rd.from_arrow(docs), n=n_gram)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["text"].tolist() == want


def test_cdc_chunks_shift_invariant_sharing(ray_session):
    """The CDC property: inserting a prefix shifts chunk OFFSETS but
    interior chunk fingerprints (content) still match between the two
    documents; chunks tile the document exactly."""
    import numpy as np

    from vietnamese_ocr_ray.functions.corpus import cdc_chunks

    rng = np.random.default_rng(23)
    body = "".join(
        rng.choice(list("abcdefgh "), size=600)
    )
    texts = [body, "PREFIX-INSERTED-" + body, ""]
    t = pa.table(
        {
            "doc_id": pa.array(range(3), pa.int64()),
            "text": pa.array(texts),
        }
    )
    out = cdc_chunks(rd.from_arrow(t).repartition(2)).to_pandas()

    # tiling: starts/lengths reconstruct each non-empty doc exactly
    for did in (0, 1):
        g = out[out.doc_id == did].sort_values("chunk_idx")
        assert g.start.iloc[0] == 1
        assert (
            g.start.iloc[1:].to_numpy()
            == (g.start + g.length).iloc[:-1].to_numpy()
        ).all()
        assert int((g.start + g.length).iloc[-1]) - 1 == len(texts[did])
        # substring fingerprint check on one middle chunk
        r = g.iloc[len(g) // 2]
        s = texts[did][int(r.start) - 1 : int(r.start) - 1 + int(r.length)]
        assert r.chunk_fp == sum(
            ord(c) * (i + 1) for i, c in enumerate(s)
        ) % 1_000_000_007
    # empty doc emits nothing
    assert (out.doc_id == 2).sum() == 0
    # content sharing despite the shifted prefix: interior fps overlap
    f0 = set(out[out.doc_id == 0].chunk_fp)
    f1 = set(out[out.doc_id == 1].chunk_fp)
    shared = f0 & f1
    assert len(shared) >= max(1, len(f0) // 2), (len(shared), len(f0))
