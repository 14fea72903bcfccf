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
