"""BPE learning: equality vs an independently-written dict-based
reference (collections.Counter over raw token lists, no word-frequency
table) plus determinism under repartitioning."""

from collections import Counter

import pyarrow as pa
import ray.data as rd

from vietnamese_ocr_ray.functions.bpe import bpe_learn


def _reference_bpe(texts, num_merges):
    """Independent formulation: operates on the full token multiset
    (not a word-count table), merges via string scan."""
    words = []
    for t in texts:
        for w in t.split(" "):
            words.append(list(w) + ["</w>"])
    merges = []
    for _ in range(num_merges):
        pairs = Counter()
        for w in words:
            for i in range(len(w) - 1):
                pairs[(w[i], w[i + 1])] += 1
        if not pairs:
            break
        best = sorted(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        (a, b), c = best
        merges.append((a, b, c))
        for w in words:
            i = 0
            while i < len(w) - 1:
                if w[i] == a and w[i + 1] == b:
                    w[i : i + 2] = [a + b]
                else:
                    i += 1
    return merges


def _ds(texts):
    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    )


TEXTS = [
    "low lower lowest newer new news",
    "wider wide widest lower low low",
    "new newer news wide wider widest",
    "low low low new new wide",
]


def test_bpe_matches_independent_reference(ray_session):
    got = bpe_learn(_ds(TEXTS), num_merges=12).to_pandas()
    want = _reference_bpe(TEXTS, 12)
    assert len(got) == 12
    for i, (a, b, c) in enumerate(want):
        row = got.iloc[i]
        assert (row["left"], row["right"], row["pair_count"]) == (a, b, c), (
            i,
            (row["left"], row["right"], row["pair_count"]),
            (a, b, c),
        )


def test_bpe_partitioning_invariant(ray_session):
    a = bpe_learn(_ds(TEXTS * 5), num_merges=8).to_pandas()
    b = bpe_learn(_ds(TEXTS * 5).repartition(7), num_merges=8).to_pandas()
    assert a.equals(b)


def test_bpe_max_words_cap_is_deterministic(ray_session):
    a = bpe_learn(_ds(TEXTS), num_merges=5, max_words=4).to_pandas()
    b = bpe_learn(_ds(TEXTS).repartition(3), num_merges=5, max_words=4).to_pandas()
    assert a.equals(b)


def _reference_encode_len(word, ranks):
    """Independent lowest-rank-first encoder (GPT-2 bpe() rule) using
    a pair-set formulation instead of index scanning."""
    syms = list(word) + ["</w>"]
    while len(syms) > 1:
        candidates = [
            (ranks[(a, b)], i)
            for i, (a, b) in enumerate(zip(syms, syms[1:]))
            if (a, b) in ranks
        ]
        if not candidates:
            break
        _, i = min(candidates)
        syms = syms[:i] + [syms[i] + syms[i + 1]] + syms[i + 2 :]
    return len(syms)


def test_bpe_encode_matches_independent_reference(ray_session):
    from vietnamese_ocr_ray.functions.bpe import bpe_encode

    merges = bpe_learn(_ds(TEXTS), num_merges=12)
    ranks = {
        (l, r): i
        for i, (l, r) in enumerate(
            zip(merges.column("left").to_pylist(), merges.column("right").to_pylist())
        )
    }
    out = bpe_encode(_ds(TEXTS), merges).to_pandas().set_index("doc_id")
    for doc_id, t in enumerate(TEXTS):
        toks = t.split(" ")
        want = sum(_reference_encode_len(w, ranks) for w in toks)
        assert out.loc[doc_id, "n_tokens"] == len(toks)
        assert out.loc[doc_id, "n_pieces"] == want, (doc_id, t)
    # merges compress: pieces < chars+1 for merged words
    assert (out["n_pieces"] < out.index.map(lambda i: len(TEXTS[i]) + 2)).all()


def test_bpe_encode_partitioning_invariant(ray_session):
    from vietnamese_ocr_ray.functions.bpe import bpe_encode

    merges = bpe_learn(_ds(TEXTS * 5), num_merges=8)
    a = (
        bpe_encode(_ds(TEXTS * 5), merges)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    b = (
        bpe_encode(_ds(TEXTS * 5).repartition(7), merges)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert a.equals(b)


def test_bpe_fertility_hand_corpus(ray_session, tmp_path):
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    import __ray_entry__ as entry

    texts = ["aaaa aaaa", "bb bb bb"]
    t = pa.table(
        {
            "doc_id": pa.array([0, 1], pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(["en", "de"]),
            "source": pa.array(["s", "s"]),
            "n_chars": pa.array([len(x) for x in texts], pa.int64()),
        }
    )
    pq.write_table(t, tmp_path / "documents.parquet")
    out = entry._bpe_fertility(str(tmp_path)).to_pandas().set_index("lang")
    # 24 merges on this corpus collapse each word to 1 piece
    assert out.loc["en", "n_pieces"] == 2 and out.loc["de", "n_pieces"] == 3
    assert abs(out.loc["en", "fertility"] - round(9 / 2, 6)) < 1e-9
    assert abs(out.loc["de", "fertility"] - round(8 / 3, 6)) < 1e-9
