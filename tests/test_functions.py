"""Unit tests for the training-data operator layer (text analysis,
dedup, ANN) — small Ray datasets, DuckDB cross-checks where cheap."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from vietnamese_ocr_ray.functions.ann import ann_bruteforce, ann_lsh
from vietnamese_ocr_ray.functions.dedup import (
    MinHasher,
    charset_matrix,
    content_hash64,
    dedup_exact,
    jaccard_shingles,
    minhash_lsh_pairs,
    simhash,
)
from vietnamese_ocr_ray.functions.text import (
    corpus_cer,
    fingerprint_batch,
    levenshtein_np,
)


def _docs_table(texts):
    return pa.table(
        {"doc_id": pa.array(range(len(texts)), pa.int64()), "text": pa.array(texts)}
    )


def test_content_hash64_stable_and_discriminating():
    t = pa.array(["abc", "abd", "abc", ""])
    h = content_hash64(t)
    assert h[0] == h[2]
    assert h[0] != h[1]
    assert np.array_equal(h, content_hash64(t))  # process-stable by construction


def test_dedup_exact(ray_session):
    texts = ["aaa", "bbb", "aaa", "ccc", "bbb", "aaa"]
    ds = rd.from_arrow(_docs_table(texts))
    out = dedup_exact(ds).to_pandas().sort_values("text").reset_index(drop=True)
    assert out["text"].tolist() == ["aaa", "bbb", "ccc"]
    assert out["n_copies"].tolist() == [3, 2, 1]
    assert out["doc_id"].tolist() == [0, 1, 3]


def test_minhash_finds_planted_neardups(ray_session):
    import ray

    rng = np.random.default_rng(0)
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta"]
    base = [" ".join(rng.choice(words, 40)) for _ in range(30)]
    # plant a near-dup of doc 0: one word changed
    dup = base[0].split(" ")
    dup[5] = "omega"
    texts = base + [" ".join(dup)]
    ds = rd.from_arrow(_docs_table(texts))
    handle = ray.put(dict(enumerate(texts)))
    pairs = minhash_lsh_pairs(ds, texts_handle=handle).to_pandas()
    assert ((pairs["a"] == 0) & (pairs["b"] == 30)).any()
    # corpus-join verification mode (no broadcast-texts assumption)
    # must produce the identical verified pair set
    joined = minhash_lsh_pairs(ds, texts_handle=None).to_pandas()
    key = lambda df: sorted(map(tuple, df[["a", "b", "jaccard"]].to_numpy()))
    assert key(joined) == key(pairs)


def test_minhash_batch_equals_per_row():
    mh = MinHasher()
    t = pa.array(["hello world this is a document", "another piece of text here", "xy"])
    from vietnamese_ocr_ray.functions.dedup import _shingle_hashes, _utf8_flat

    offs, data = _utf8_flat(t)
    batch_sigs = mh._batch_signatures(offs, data)
    for i in range(3):
        solo = mh.signature(_shingle_hashes(data[offs[i] : offs[i + 1]], mh.k))
        assert np.array_equal(solo, batch_sigs[i])


def test_simhash_similar_docs_close(ray_session):
    a = "the quick brown fox jumps over the lazy dog " * 5
    b = a.replace("lazy", "late")
    c = "completely different content about databases and queries " * 5
    ds = rd.from_arrow(_docs_table([a, b, c]))
    out = simhash(ds).to_pandas().sort_values("doc_id")
    fps = [int(x, 16) for x in out["simhash"]]
    ham = lambda x, y: bin(x ^ y).count("1")
    assert ham(fps[0], fps[1]) < ham(fps[0], fps[2])


def test_charset_jaccard_matches_duckdb():
    texts = ["abcabc", "abd", "hello world", "zzz"]
    m = charset_matrix(pa.array(texts))
    con = duckdb.connect()
    for i in range(len(texts) - 1):
        inter = (m[i] & m[i + 1]).sum()
        union = (m[i] | m[i + 1]).sum()
        mine = inter / union
        ref = con.sql(
            "SELECT jaccard(?, ?)", params=[texts[i], texts[i + 1]]
        ).fetchone()[0]
        assert abs(mine - ref) < 1e-12


def test_levenshtein_matches_duckdb():
    con = duckdb.connect()
    cases = [("kitten", "sitting"), ("", "abc"), ("abc", ""), ("same", "same"), ("ab", "ba")]
    for a, b in cases:
        assert levenshtein_np(a, b) == con.sql(
            "SELECT levenshtein(?, ?)", params=[a, b]
        ).fetchone()[0]


def test_corpus_cer(ray_session):
    t = pa.table({"pred": ["abc", "xyz"], "target": ["abd", "xyz"]})
    out = corpus_cer(rd.from_arrow(t), "pred", "target")
    assert out.column("errors")[0].as_py() == 1
    assert out.column("total")[0].as_py() == 6
    assert abs(out.column("cer")[0].as_py() - 1 / 6) < 1e-12


def test_fingerprint_ascii_matches_python():
    texts = ["abc", "", "hello world 123", "a" * 100]
    out = fingerprint_batch(
        pa.table({"doc_id": pa.array(range(4), pa.int64()), "text": pa.array(texts)})
    )
    for i, s in enumerate(texts):
        expect = sum(ord(c) * (j + 1) for j, c in enumerate(s)) % 1_000_000_007
        assert out.column("fingerprint")[i].as_py() == expect


def test_ann_bruteforce_topk(ray_session):
    rng = np.random.default_rng(1)
    vecs = rng.standard_normal((200, 16))
    q = vecs[7]
    t = pa.table(
        {
            "vec_id": pa.array(range(200), pa.int64()),
            "embedding": pa.array([v.astype(np.float32) for v in vecs], pa.list_(pa.float32())),
        }
    )
    out = ann_bruteforce(rd.from_arrow(t), q.astype(np.float64), k=5).to_pandas()
    # exact check vs full numpy computation
    cos = (vecs @ q) / (np.linalg.norm(vecs, axis=1) * np.linalg.norm(q))
    expect = np.argsort(-cos)[:5]
    assert out["vec_id"].iloc[0] == 7  # self-similarity == 1.0 is rank 1
    assert set(out["vec_id"]) == set(expect)


def test_ann_lsh_finds_self(ray_session):
    rng = np.random.default_rng(2)
    vecs = rng.standard_normal((300, 64))
    q = vecs[42]
    t = pa.table(
        {
            "vec_id": pa.array(range(300), pa.int64()),
            "embedding": pa.array([v.astype(np.float32) for v in vecs], pa.list_(pa.float32())),
        }
    )
    out = ann_lsh(rd.from_arrow(t), q.astype(np.float64), k=3).to_pandas()
    assert out["vec_id"].iloc[0] == 42


def test_jaccard_shingles_identity_and_disjoint():
    assert jaccard_shingles("abcdefgh" * 3, "abcdefgh" * 3) == 1.0
    assert jaccard_shingles("aaaaaaaaaa", "bbbbbbbbbb") == 0.0


def test_neardup_survivors(ray_session):
    import ray

    from vietnamese_ocr_ray.functions.dedup import neardup_survivors

    docs = _docs_table(["aaa", "bbb", "ccc", "ddd", "eee"])
    # pairs: (0,1), (1,4) -> one cluster {0,1,4}, survivor 0; 2,3 untouched
    pairs = pa.table({"a": pa.array([0, 1], pa.int64()), "b": pa.array([1, 4], pa.int64())})
    ds = rd.from_arrow(docs)
    out = neardup_survivors(ds, rd.from_arrow(pairs)).to_pandas()
    assert sorted(out["doc_id"]) == [0, 2, 3]


def test_connected_components_chain(ray_session):
    from vietnamese_ocr_ray.functions.dedup import connected_components

    pairs = pa.table(
        {"a": pa.array([0, 1, 2, 10], pa.int64()), "b": pa.array([1, 2, 3, 11], pa.int64())}
    )
    out = connected_components(rd.from_arrow(pairs)).to_pandas()
    comp = dict(zip(out["node"], out["component"]))
    assert comp[0] == comp[1] == comp[2] == comp[3] == 0
    assert comp[10] == comp[11] == 10


def test_kmeans_and_ivf(ray_session):
    from vietnamese_ocr_ray.functions.kmeans import ann_ivf, assign_clusters, kmeans_fit

    rng = np.random.default_rng(5)
    # three well-separated blobs
    blobs = np.vstack(
        [rng.standard_normal((60, 8)) + c for c in (np.zeros(8), np.full(8, 10.0), np.full(8, -10.0))]
    )
    t = pa.table(
        {
            "vec_id": pa.array(range(len(blobs)), pa.int64()),
            "embedding": pa.array([v.astype(np.float32) for v in blobs], pa.list_(pa.float32())),
        }
    )
    ds = rd.from_arrow(t)
    centroids = kmeans_fit(ds, k=3, iters=4)
    assigned = assign_clusters(ds, centroids).to_pandas()
    # each blob maps to a single cluster
    for start in (0, 60, 120):
        labels = assigned[(assigned["vec_id"] >= start) & (assigned["vec_id"] < start + 60)]["cluster"]
        assert labels.nunique() == 1
    # IVF finds the query itself
    out = ann_ivf(ds, blobs[70], k=3, centroids=centroids, nprobe=1).to_pandas()
    assert out["vec_id"].iloc[0] == 70


def test_kmeans_fit_bit_identical_across_block_layouts(ray_session):
    """The determinism contract (functions/kmeans docstring): the fit
    is exact-integer on the 2^-20 grid, so centroids must be
    BIT-identical — not merely close — under any block layout, row
    order, or batch size. Float partial sums (the obvious
    implementation) fail this at the last ulp, which at 10^12 rows
    means two cluster sizes dedup different rows."""
    from vietnamese_ocr_ray.functions.kmeans import _QSCALE, kmeans_fit

    rng = np.random.default_rng(11)
    vecs = rng.standard_normal((300, 16))
    ids = np.arange(300)

    def ds_for(order, blocks):
        t = pa.table(
            {
                "vec_id": pa.array(ids[order], pa.int64()),
                "embedding": pa.array(
                    [v.astype(np.float32) for v in vecs[order]],
                    pa.list_(pa.float32()),
                ),
            }
        )
        return rd.from_arrow(t).repartition(blocks)

    base = kmeans_fit(ds_for(np.arange(300), 1), k=5, iters=3)
    perm = rng.permutation(300)
    for blocks in (3, 17):
        alt = kmeans_fit(ds_for(perm, blocks), k=5, iters=3)
        assert np.array_equal(base, alt)  # bit-identical, no tolerance
    # every coordinate sits on the fixed-point grid
    assert np.array_equal(base * _QSCALE, np.round(base * _QSCALE))


def test_distinct_token_counts_exact_and_approx(ray_session):
    texts = [f"w{i} w{i+1} common" for i in range(0, 400, 2)]
    ds = rd.from_arrow(_docs_table(texts))
    from vietnamese_ocr_ray.functions.sketch import (
        approx_distinct_tokens,
        distinct_token_count,
    )

    exact = distinct_token_count(ds).column("n_distinct_tokens")[0].as_py()
    # w0..w400 (even starts produce i and i+1 -> 0..399 all) + "common"
    assert exact == 401
    approx = approx_distinct_tokens(ds).column("approx_distinct_tokens")[0].as_py()
    assert abs(approx - exact) / exact < 0.05


def test_bloom_filter_no_false_negatives():
    from vietnamese_ocr_ray.functions.membership import BloomFilter

    rng = np.random.default_rng(3)
    members = rng.integers(0, 2**62, 5000)
    others = rng.integers(0, 2**62, 20000)
    bf = BloomFilter(len(members), fpr=0.01)
    bf.add(members)
    assert bf.contains(members).all()  # never a false negative
    fpr = bf.contains(others).mean()
    assert fpr < 0.03


def test_anti_and_semi_join(ray_session):
    from vietnamese_ocr_ray.functions.membership import anti_join_keys, semi_join_keys

    t = pa.table({"k": pa.array(range(100), pa.int64()), "v": pa.array(range(100))})
    keys = np.arange(0, 100, 2)  # evens
    ds = rd.from_arrow(t)
    anti = anti_join_keys(ds, keys, "k", use_bloom=True).to_pandas()
    assert sorted(anti["k"]) == list(range(1, 100, 2))
    semi = semi_join_keys(ds, keys, "k").to_pandas()
    assert sorted(semi["k"]) == list(range(0, 100, 2))


def test_simhash_tokens_ascii_path_equals_fallback():
    """The vectorized ASCII path and the per-row unicode fallback must
    implement the same hash; force both by adding one non-ASCII row."""
    import pyarrow as pa

    from vietnamese_ocr_ray.functions.dedup import simhash_tokens_batch

    texts = ["the quick brown fox", "pack my box", "a b  c", ""]
    ascii_tbl = pa.table({"doc_id": list(range(4)), "text": texts})
    fast = simhash_tokens_batch(ascii_tbl).to_pandas()
    mixed = pa.table(
        {"doc_id": list(range(5)), "text": texts + ["vê ñ unicode tôken"]}
    )
    slow = simhash_tokens_batch(mixed).to_pandas()
    assert fast["simhash30"].tolist() == slow["simhash30"].tolist()[:4]
    # fingerprint must be stable and within 30 bits
    assert (slow["simhash30"] < (1 << 30)).all()
    assert (slow["simhash30"] >= 0).all()


def test_connected_components_empty_graph(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from vietnamese_ocr_ray.functions.dedup import connected_components

    empty = rd.from_arrow(
        pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())})
    )
    out = connected_components(empty)
    assert out.count() == 0
    assert out.schema().names == ["node", "component"]


def test_hash_aggregate_matches_pandas(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from vietnamese_ocr_ray.functions.agg import hash_aggregate

    rng = np.random.default_rng(21)
    df = pd.DataFrame(
        {
            "k": [f"key-{i}" for i in rng.integers(0, 500, 5000)],
            "v": rng.integers(-100, 100, 5000),
        }
    )
    got = (
        hash_aggregate(
            rd.from_pandas(df),
            ["k"],
            {
                "s": ("v", "sum"),
                "mn": ("v", "min"),
                "mx": ("v", "max"),
                "n": ("v", "count"),
            },
            num_buckets=7,
        )
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    exp = (
        df.groupby("k", as_index=False)
        .agg(s=("v", "sum"), mn=("v", "min"), mx=("v", "max"), n=("v", "size"))
        .sort_values("k")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[["k", "s", "mn", "mx", "n"]], exp, check_dtype=False)


def test_hash_aggregate_rejects_nondecomposable():
    import pytest
    import ray.data as rd
    import pandas as pd

    from vietnamese_ocr_ray.functions.agg import hash_aggregate

    with pytest.raises(ValueError):
        hash_aggregate(
            rd.from_pandas(pd.DataFrame({"k": [1], "v": [1]})),
            ["k"],
            {"m": ("v", "median")},  # not decomposable (use QuantileSummary)
        )


def test_connected_components_shuffled_equals_broadcast(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from vietnamese_ocr_ray.functions.dedup import connected_components

    rng = np.random.default_rng(31)
    # chain components of varying length + isolated pairs; node ids
    # sparse so bucket boundaries are crossed
    edges_a, edges_b = [], []
    nid = 0
    for comp in range(15):
        length = int(rng.integers(1, 5))
        ids = [nid + i * 7 for i in range(length + 1)]
        nid = ids[-1] + 13
        for x, y in zip(ids, ids[1:]):
            if rng.random() < 0.5:
                x, y = y, x
            edges_a.append(x)
            edges_b.append(y)
    pairs = rd.from_arrow(
        pa.table({"a": pa.array(edges_a, pa.int64()), "b": pa.array(edges_b, pa.int64())})
    )
    kw = dict()
    bc = connected_components(pairs, broadcast=True).to_pandas()
    sh = connected_components(pairs, broadcast=False, num_buckets=5).to_pandas()
    bc = bc.sort_values("node").reset_index(drop=True)
    sh = sh.sort_values("node").reset_index(drop=True)
    assert bc.equals(sh)
    # min-label invariant: every component id is a member of itself
    assert set(bc["component"]).issubset(set(bc["node"]))


def test_hash_sample_bands_partition_corpus(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from vietnamese_ocr_ray.functions.sampling import hash_sample

    docs = pa.table({"doc_id": list(range(2000)), "v": list(range(2000))})

    def ids(rate, off):
        ds = hash_sample(
            rd.from_arrow(docs),
            "doc_id",
            rate_permille=rate,
            salt="s:",
            band_offset_permille=off,
        )
        return set(ds.to_pandas()["doc_id"])

    train, val, test = ids(800, 0), ids(100, 800), ids(100, 900)
    assert train | val | test == set(range(2000))  # bands cover
    assert not (train & val or train & test or val & test)  # disjoint
    # stable under different partitioning
    ds2 = hash_sample(
        rd.from_arrow(docs).repartition(13),
        "doc_id",
        rate_permille=800,
        salt="s:",
    )
    assert set(ds2.to_pandas()["doc_id"]) == train
    # different salt -> different (but same-sized-ish) sample
    other = hash_sample(rd.from_arrow(docs), "doc_id", rate_permille=800, salt="t:")
    assert set(other.to_pandas()["doc_id"]) != train


def test_quantile_summary_accuracy_and_determinism():
    import numpy as np

    from vietnamese_ocr_ray.functions.sketch import QuantileSummary

    rng = np.random.default_rng(17)
    x = rng.lognormal(0, 1, 100_000)
    # build from 50 chunks, merge pairwise
    chunks = np.array_split(x, 50)
    s = QuantileSummary.of(chunks[0], capacity=512)
    for c in chunks[1:]:
        s.merge(QuantileSummary.of(c, capacity=512))
    assert s.values.shape[0] <= 512
    assert s.weights.sum() == len(x)
    for q in (0.01, 0.25, 0.5, 0.9, 0.99):
        est = s.quantile(q)
        # rank error bound: where does est fall in the true ranking?
        rank_err = abs((x <= est).mean() - q)
        assert rank_err < 0.02, (q, rank_err)
    # determinism under a different chunking
    s2 = QuantileSummary.of(x[:70_000], capacity=512).merge(
        QuantileSummary.of(x[70_000:], capacity=512)
    )
    assert s2.weights.sum() == len(x)
    # round-trip
    s3 = QuantileSummary.deserialize(s.serialize())
    assert s3.quantile(0.5) == s.quantile(0.5)


def test_quantile_summary_exact_when_uncompacted():
    import numpy as np

    from vietnamese_ocr_ray.functions.sketch import QuantileSummary

    x = np.array([3.0, 1.0, 4.0, 1.5, 9.0])
    s = QuantileSummary.of(x, capacity=100)
    for q in (0.0, 0.25, 0.5, 0.77, 1.0):
        assert s.quantile(q) == pytest.approx(
            float(np.percentile(x, q * 100, method="linear"))
        )


def test_approx_quantiles_dataset(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from vietnamese_ocr_ray.functions.sketch import approx_quantiles

    rng = np.random.default_rng(23)
    vals = rng.normal(100, 15, 20_000)
    ds = rd.from_arrow(pa.table({"v": vals})).repartition(16)
    out = approx_quantiles(ds, "v", qs=(0.5, 0.95)).to_pylist()[0]
    assert abs(out["p50"] - np.percentile(vals, 50)) < 1.0
    assert abs(out["p95"] - np.percentile(vals, 95)) < 1.5


def test_grouped_approx_quantiles(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from vietnamese_ocr_ray.functions.sketch import grouped_approx_quantiles

    rng = np.random.default_rng(41)
    n = 30_000
    df = pd.DataFrame(
        {
            "g": rng.choice(["a", "b", "c"], n),
            "v": rng.exponential(10, n),
        }
    )
    out = (
        grouped_approx_quantiles(
            rd.from_pandas(df).repartition(12), "g", "v", qs=(0.5, 0.9)
        )
        .to_pandas()
        .set_index("g")
    )
    for g, grp in df.groupby("g"):
        for q, col in ((0.5, "p50"), (0.9, "p90")):
            est = out.loc[g, col]
            rank_err = abs((grp["v"] <= est).mean() - q)
            assert rank_err < 0.02, (g, q, rank_err)


def test_hash_aggregate_mean(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from vietnamese_ocr_ray.functions.agg import hash_aggregate

    rng = np.random.default_rng(33)
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 200, 4000),
            "v": rng.integers(-50, 50, 4000),
        }
    )
    got = (
        hash_aggregate(
            rd.from_pandas(df),
            ["k"],
            {"avg_v": ("v", "mean"), "n": ("v", "count")},
            num_buckets=9,
        )
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    exp = (
        df.groupby("k", as_index=False)
        .agg(avg_v=("v", "mean"), n=("v", "size"))
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert got["n"].tolist() == exp["n"].tolist()
    np.testing.assert_allclose(got["avg_v"], exp["avg_v"], rtol=1e-12)
    assert list(got.columns) == ["k", "avg_v", "n"]


def test_simhash_vectorized_matches_rowwise_reference():
    """The whole-batch flat-buffer simhash must produce bit-identical
    fingerprints to the straightforward one-doc-at-a-time definition."""
    from vietnamese_ocr_ray.functions.dedup import (
        _shingle_hashes,
        _utf8_flat,
        simhash_batch,
    )

    texts = [
        "",  # empty doc -> single zero-padded window
        "ab",  # shorter than one shingle
        "abcd",  # exactly one shingle
        "the quick brown fox jumps over the lazy dog",
        "the quick brown fox jumps over the lazy cat",
        "aaaaaaaaaaaaaaaa",  # degenerate: one unique shingle
        "x" * 3 + "unicode: café déjà vu ✓",
    ]
    t = _docs_table(texts)
    got = simhash_batch(t)["simhash"].to_pylist()
    expect = []
    for i in range(t.num_rows):
        _, data = _utf8_flat(t.column("text").slice(i, 1))
        h = _shingle_hashes(data, 4)
        bits = (
            (h[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1
        ).astype(np.int64)
        votes = bits.sum(axis=0) * 2 - h.shape[0]
        fp = np.uint64(0)
        for b in np.nonzero(votes > 0)[0]:
            fp |= np.uint64(1) << np.uint64(b)
        expect.append(f"{int(fp):016x}")
    assert got == expect


def _embeddings_table(vecs):
    return pa.table(
        {
            "vec_id": pa.array(range(len(vecs)), pa.int64()),
            "embedding": pa.array(
                [v.astype(np.float32) for v in vecs], pa.list_(pa.float32())
            ),
        }
    )


def _exact_pairs_numpy(vecs, threshold):
    m = np.asarray([np.asarray(v, np.float32) for v in vecs], np.float64)
    mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)
    cos = np.round(mn @ mn.T, 6)
    iu = np.triu_indices(len(vecs), 1)
    mask = cos[iu] >= threshold
    return set(zip(iu[0][mask].tolist(), iu[1][mask].tolist()))


def test_cosine_pairs_blocked_matches_bruteforce(ray_session):
    """Multi-chunk block-pair path == numpy all-pairs (exact)."""
    from vietnamese_ocr_ray.functions.ann import cosine_pairs

    rng = np.random.default_rng(11)
    vecs = rng.standard_normal((200, 16))
    ds = rd.from_arrow(_embeddings_table(vecs))
    got = cosine_pairs(ds, threshold=0.5, chunk_rows=37).to_pandas()
    expect = _exact_pairs_numpy(vecs, 0.5)
    assert set(zip(got["vec_id_a"], got["vec_id_b"])) == expect
    assert len(expect) > 0  # the test exercises real pairs


def test_cosine_pairs_lsh_recall_on_planted_duplicates(ray_session):
    """The approximate multi-table LSH path must recover nearly all
    HIGH-similarity planted duplicates, emit only true pairs, and emit
    each pair once."""
    from vietnamese_ocr_ray.functions.ann import cosine_pairs, cosine_pairs_lsh

    rng = np.random.default_rng(3)
    base = rng.standard_normal((120, 64))
    dups = base[:30] + 0.05 * rng.standard_normal((30, 64))  # cos ~ 0.999
    vecs = np.vstack([base, dups])
    ds = rd.from_arrow(_embeddings_table(vecs))
    threshold = 0.9
    exact = _exact_pairs_numpy(vecs, threshold)
    got = cosine_pairs_lsh(ds, threshold=threshold, dim=64).to_pandas()
    pairs = list(zip(got["vec_id_a"], got["vec_id_b"]))
    assert len(pairs) == len(set(pairs))  # no duplicate emissions
    assert set(pairs) <= exact  # verification keeps precision exact
    planted = {(i, i + 120) for i in range(30)} & exact
    recall = len(set(pairs) & planted) / len(planted)
    assert recall >= 0.9, recall


def test_ivf_persisted_index_prunes_io(ray_session, tmp_path):
    """build_ivf_index writes one parquet file per inverted list;
    probing opens ONLY the nprobe nearest lists and still finds the
    query's own cluster-mates."""
    from vietnamese_ocr_ray.functions.kmeans import (
        ann_ivf_index,
        build_ivf_index,
        ivf_probe_files,
    )

    rng = np.random.default_rng(5)
    blobs = np.vstack(
        [
            rng.standard_normal((60, 8)) + c
            for c in (np.zeros(8), np.full(8, 10.0), np.full(8, -10.0))
        ]
    )
    ds = rd.from_arrow(_embeddings_table(blobs))
    idx = build_ivf_index(ds, str(tmp_path / "ivf"), n_clusters=3, iters=6)

    q = blobs[70]  # second blob
    files = ivf_probe_files(idx, q, nprobe=1)
    assert len(files) == 1  # IO pruned to one of three list files
    out = ann_ivf_index(idx, q, k=3, nprobe=1).to_pandas()
    assert out["vec_id"].iloc[0] == 70

    # all three lists together cover every vector exactly once
    import pyarrow.parquet as pq

    total = sum(
        pq.read_table(f).num_rows for f in ivf_probe_files(idx, q, nprobe=3)
    )
    assert total == len(blobs)


def test_levenshtein_batch_matches_scalar_and_duckdb():
    from vietnamese_ocr_ray.functions.text import levenshtein_batch

    preds = ["kitten", "", "abc", "same", "ab", "flaw", "café", "x" * 40]
    targets = ["sitting", "abc", "", "same", "ba", "lawn", "coffee", "y" * 25]
    got = levenshtein_batch(preds, targets)
    con = duckdb.connect()
    for i, (p, t) in enumerate(zip(preds, targets)):
        assert got[i] == levenshtein_np(p, t)
        assert (
            got[i]
            == con.sql("SELECT levenshtein(?, ?)", params=[p, t]).fetchone()[0]
        )


def test_jaccard_batch_helpers_match_python_reference():
    from vietnamese_ocr_ray.functions.dedup import (
        jaccard_shingles_batch,
        word_jaccard_batch,
    )

    a = ["the quick brown fox", "", "abc", "same same same", "one two"]
    b = ["the quick brown cat", "xyz", "", "same", "three four"]
    got_sh = jaccard_shingles_batch(pa.array(a), pa.array(b))
    for i in range(len(a)):
        assert abs(got_sh[i] - jaccard_shingles(a[i], b[i])) < 1e-12

    got_w = word_jaccard_batch(pa.array(a), pa.array(b))
    for i in range(len(a)):
        sa, sb = set(a[i].split(" ")), set(b[i].split(" "))
        union = len(sa | sb)
        expect = (len(sa & sb) / union) if union else 1.0
        assert abs(got_w[i] - expect) < 1e-12


def test_ann_bruteforce_multi_matches_numpy(ray_session):
    from vietnamese_ocr_ray.functions.ann import ann_bruteforce_multi

    rng = np.random.default_rng(9)
    vecs = rng.standard_normal((250, 12))
    queries = np.vstack([vecs[3], vecs[100], rng.standard_normal(12)])
    ds = rd.from_arrow(_embeddings_table(vecs))
    out = ann_bruteforce_multi(ds, queries, k=5).to_pandas()
    mn = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    qn = queries / np.linalg.norm(queries, axis=1, keepdims=True)
    cos = np.round(mn @ qn.T, 6)
    for qi in range(3):
        # numpy reference: top-5 by (-cos, vec_id)
        order = np.lexsort((np.arange(len(vecs)), -cos[:, qi]))[:5]
        got = out[out["query_id"] == qi].sort_values("rank")
        assert got["vec_id"].tolist() == list(order)
        assert np.allclose(got["cos"].to_numpy(), cos[order, qi])
    # self-queries rank themselves first
    assert out[(out["query_id"] == 0) & (out["rank"] == 1)]["vec_id"].iloc[0] == 3


def test_simhash_pairs_complete_vs_bruteforce(ray_session):
    """Banding with bands > max_hamming is COMPLETE (pigeonhole): the
    pair set must equal the all-pairs popcount ground truth, including
    planted near-identical docs."""
    from vietnamese_ocr_ray.functions.dedup import simhash_fps, simhash_pairs

    rng = np.random.default_rng(4)
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    base = [" ".join(rng.choice(words, 60)) for _ in range(40)]
    dups = [t.replace("alpha", "alphq", 1) for t in base[:8]]  # tiny edits
    texts = base + dups
    t = _docs_table(texts)
    got = simhash_pairs(rd.from_arrow(t), max_hamming=3).to_pandas()
    fps = simhash_fps(pa.array(texts))
    expect = set()
    for i in range(len(texts)):
        for j in range(i + 1, len(texts)):
            if bin(int(fps[i]) ^ int(fps[j])).count("1") <= 3:
                expect.add((i, j))
    assert set(zip(got["a"], got["b"])) == expect
    assert len(expect) > 0  # the test exercises real near-dups
    # reported hamming values are correct
    for _, r in got.iterrows():
        assert r["hamming"] == bin(
            int(fps[int(r["a"])]) ^ int(fps[int(r["b"])])
        ).count("1")


def test_tfidf_join_mode_equals_broadcast(ray_session):
    """The no-vocabulary-broadcast TF-IDF (token-bucket cogroup) must
    produce the identical top-k term table."""
    from vietnamese_ocr_ray.functions.text import (
        tfidf_top_terms,
        tfidf_top_terms_join,
    )

    rng = np.random.default_rng(6)
    words = ["ant", "bee", "cat", "dog", "elk", "fox", "gnu", "hen"]
    texts = [" ".join(rng.choice(words, rng.integers(5, 30))) for _ in range(80)]
    ds = rd.from_arrow(_docs_table(texts))
    key = lambda df: sorted(
        map(tuple, df[["doc_id", "tok", "score"]].to_numpy())
    )
    a = tfidf_top_terms(ds, k=3).to_pandas()
    b = tfidf_top_terms_join(ds, k=3).to_pandas()
    assert key(a) == key(b)
    assert len(a) > 0


def test_label_centroids_matches_numpy(ray_session):
    from vietnamese_ocr_ray.functions.ann import label_centroids

    rng = np.random.default_rng(12)
    vecs = rng.standard_normal((90, 6))
    labels = rng.integers(0, 3, 90)
    t = pa.table(
        {
            "label": pa.array(labels, pa.int64()),
            "embedding": pa.array(
                [v.astype(np.float32) for v in vecs], pa.list_(pa.float32())
            ),
        }
    )
    out = label_centroids(rd.from_arrow(t)).to_pandas()
    m64 = vecs.astype(np.float32).astype(np.float64)
    for lab in range(3):
        mean = m64[labels == lab].mean(axis=0)
        got = out[out["label"] == lab].sort_values("dim")["avg_v"].to_numpy()
        assert np.allclose(got, np.round(mean, 4), atol=1e-4)


def test_int8_quantization_roundtrip_and_ann_recall(ray_session):
    """Scalar int8 quantization: per-dim reconstruction error bounded
    by half a level; ANN over the quantized store keeps recall@10 high
    on random data."""
    from vietnamese_ocr_ray.functions.quantize import (
        ann_bruteforce_quantized,
        decode_codes,
        fit_quantizer,
        quantize_embeddings,
    )

    rng = np.random.default_rng(21)
    vecs = rng.standard_normal((400, 16))
    ds = rd.from_arrow(_embeddings_table(vecs))
    ranges = fit_quantizer(ds)
    assert ranges.shape == (2, 16)
    codes = quantize_embeddings(ds, ranges).materialize()

    # reconstruction error bound: half a quantization level per dim
    t = codes.sort("vec_id").take_batch(400, batch_format="pyarrow")
    dec = decode_codes(t, ranges)
    m64 = vecs.astype(np.float32).astype(np.float64)
    step = (ranges[1] - ranges[0]) / 255.0
    order = np.asarray(t.column("vec_id"))
    assert np.all(np.abs(dec - m64[order]) <= step / 2 + 1e-9)

    # recall@10 vs the exact scan
    q = rng.standard_normal(16)
    from vietnamese_ocr_ray.functions.ann import ann_bruteforce

    exact = set(
        ann_bruteforce(ds, q, k=10).to_pandas()["vec_id"]
    )
    approx = set(
        ann_bruteforce_quantized(codes, ranges, q, k=10).to_pandas()["vec_id"]
    )
    assert len(exact & approx) >= 8, (exact, approx)


def test_pagerank_matches_numpy_power_iteration(ray_session):
    from vietnamese_ocr_ray.functions.graph import pagerank

    # star (0 center) + triangle (10,11,12)
    pairs = pa.table(
        {
            "a": pa.array([0, 0, 0, 10, 11, 12], pa.int64()),
            "b": pa.array([1, 2, 3, 11, 12, 10], pa.int64()),
        }
    )
    out = pagerank(rd.from_arrow(pairs), iters=50).to_pandas()
    got = dict(zip(out["node"], out["rank"]))

    # dense numpy reference on the same undirected graph
    nodes = [0, 1, 2, 3, 10, 11, 12]
    idx = {v: i for i, v in enumerate(nodes)}
    import itertools

    edges = [(0, 1), (0, 2), (0, 3), (10, 11), (11, 12), (12, 10)]
    n = len(nodes)
    A = np.zeros((n, n))
    for a, b in edges:
        A[idx[a], idx[b]] = A[idx[b], idx[a]] = 1.0
    deg = A.sum(axis=1)
    r = np.full(n, 1.0 / n)
    for _ in range(50):
        r = (1 - 0.85) / n + 0.85 * (A.T @ (r / deg))
    for v in nodes:
        assert abs(got[v] - r[idx[v]]) < 1e-6, (v, got[v], r[idx[v]])
    assert abs(sum(got.values()) - 1.0) < 1e-6
    # hub of the star outranks its leaves; triangle is symmetric
    assert got[0] > got[1] == got[2] == got[3]
    assert abs(got[10] - got[11]) < 1e-9


def test_count_min_heavy_hitters(ray_session):
    """CMS one-sided guarantee + exact top-k recovery on the corpus,
    and under forced collisions (tiny width, many keys) estimates
    still never undercount."""
    from collections import Counter

    import pyarrow.parquet as pq

    from vietnamese_ocr_ray.functions.sketch import CountMinSketch, heavy_hitters_cms
    from vietnamese_ocr_ray.functions.dedup import content_hash64
    from vietnamese_ocr_ray.sources.storage import read_parquet_clean

    sf = "/root/testdata/sf0.001"
    ds = read_parquet_clean(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    got = heavy_hitters_cms(ds, k=10)

    c = Counter()
    for s in pq.read_table(f"{sf}/documents.parquet").column("text").to_pylist():
        c.update(s.split(" "))
    exact = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert got.column("tok").to_pylist() == [t for t, _ in exact]
    est = dict(zip(got.column("tok").to_pylist(), got.column("est_count").to_pylist()))
    assert all(est[t] >= n for t, n in exact)  # one-sided

    # forced-collision regime: 10k keys into width 64
    rng = np.random.default_rng(7)
    keys = pa.array([f"key_{i}" for i in range(10_000)])
    counts = rng.integers(1, 50, size=10_000).astype(np.int64)
    s = CountMinSketch(depth=4, width=64)
    h = content_hash64(keys)
    s.add_hashes(h, counts)
    ests = s.estimate_hashes(h)
    assert (ests >= counts).all()
    # merge = add: two half-sketches equal one full sketch
    s1, s2 = CountMinSketch(4, 64), CountMinSketch(4, 64)
    s1.add_hashes(h[:5000], counts[:5000])
    s2.add_hashes(h[5000:], counts[5000:])
    s1.merge(s2)
    assert (s1.table == s.table).all()


def test_cms_exhaustive_candidates_is_pure_data_function(ray_session):
    """candidates_per_batch=None ranks EVERY distinct token by its CMS
    estimate — the result must equal a single-process replay of the
    merged sketch over exact global counts (no dependence on batch
    boundaries), and estimates must still be one-sided."""
    from collections import Counter

    import pyarrow.parquet as pq

    from vietnamese_ocr_ray.functions.dedup import content_hash64
    from vietnamese_ocr_ray.functions.sketch import (
        CountMinSketch,
        heavy_hitters_cms,
    )
    from vietnamese_ocr_ray.sources.storage import read_parquet_clean

    sf = "/root/testdata/sf0.001"
    ds = read_parquet_clean(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    got = heavy_hitters_cms(ds, k=10, candidates_per_batch=None)

    c = Counter()
    for s in pq.read_table(f"{sf}/documents.parquet").column("text").to_pylist():
        c.update(s.split(" "))
    toks = pa.array(sorted(c))
    counts = np.array([c[t] for t in sorted(c)], dtype=np.int64)
    ref = CountMinSketch()
    ref.add_hashes(content_hash64(toks), counts)
    est = ref.estimate_hashes(content_hash64(toks))
    order = np.lexsort((np.asarray(toks), -est))[:10]
    assert got.column("tok").to_pylist() == [sorted(c)[i] for i in order]
    assert got.column("est_count").to_pylist() == [int(est[i]) for i in order]
    got_est = dict(
        zip(got.column("tok").to_pylist(), got.column("est_count").to_pylist())
    )
    assert all(got_est[t] >= c[t] for t in got_est)  # one-sided


def test_grouped_hll_matches_exact_within_tolerance(ray_session):
    """Grouped HLL estimates per event_type agree with the exact
    grouped distinct within the standard ~1.04/sqrt(2^p) error."""
    import pyarrow.parquet as pq

    from vietnamese_ocr_ray.functions.sketch import grouped_approx_distinct
    from vietnamese_ocr_ray.sources.storage import read_parquet_clean

    sf = "/root/testdata/sf0.001"
    ds = read_parquet_clean(f"{sf}/events.parquet", columns=["event_type", "user_id"])
    got = grouped_approx_distinct(ds, "event_type", "user_id").to_pandas()
    t = pq.read_table(f"{sf}/events.parquet", columns=["event_type", "user_id"])
    exact = (
        t.to_pandas().groupby("event_type")["user_id"].nunique().to_dict()
    )
    assert set(got["event_type"]) == set(exact)
    for _, row in got.iterrows():
        true = exact[row["event_type"]]
        assert abs(row["approx_distinct"] - true) <= max(3, 0.05 * true), (
            row["event_type"], row["approx_distinct"], true,
        )


def test_lm_score_ranks_predictable_text_lower(ray_session):
    """Docs made of the corpus's dominant bigram chain must score
    LOWER (more probable) than docs of rare one-off bigrams, and the
    add-one-smoothed probabilities must match a dict-based reference."""
    from vietnamese_ocr_ray.functions.lm import lm_score

    common = ["the cat sat on the mat"] * 20
    rare = ["zig quux vex jolt brr"]
    texts = common + rare
    ds = rd.from_arrow(_docs_table(texts))
    out = lm_score(ds).to_pandas().set_index("doc_id")
    assert out.loc[0, "lm_score"] < out.loc[len(texts) - 1, "lm_score"]
    assert (out["n_bigrams"] == 5).all() if len(set(out["n_bigrams"])) == 1 else True

    # dict reference: p(w2|w1) = (c(w1,w2)+1) / (ctx(w1)+V)
    from collections import Counter

    bg, ctx, vocab = Counter(), Counter(), set()
    for t in texts:
        toks = t.split(" ")
        vocab.update(toks)
        for a, b in zip(toks, toks[1:]):
            bg[(a, b)] += 1
            ctx[a] += 1
    import math

    for doc_id, t in enumerate(texts):
        toks = t.split(" ")
        qs = [
            round(
                math.log((bg[(a, b)] + 1) / (ctx[a] + len(vocab))) * 1e6
            )
            for a, b in zip(toks, toks[1:])
        ]
        s = -sum(qs)
        expect = ((2 * s + len(qs)) // (2 * len(qs))) / 1e6
        assert out.loc[doc_id, "lm_score"] == expect, doc_id


def test_classifier_score_ascii_matches_python_reference(ray_session):
    from vietnamese_ocr_ray.functions.classifier import (
        HashedLinearScorer,
        classifier_score,
        stand_in_weights,
    )

    texts = ["the quick brown fox", "a", "", "the the the", "zig quux"]
    out = (
        classifier_score(rd.from_arrow(_docs_table(texts)), dim=64)
        .to_pandas()
        .set_index("doc_id")
    )
    w = stand_in_weights(64)
    P = 1_000_000_007
    for doc_id, t in enumerate(texts):
        logit = 0
        for tok in t.split(" "):
            h = sum(ord(c) * pow(31, j, P) for j, c in enumerate(tok[:32])) % P
            logit += int(w[h % 64])
        assert out.loc[doc_id, "logit_milli"] == logit, doc_id
        assert out.loc[doc_id, "keep"] == int(logit > 0)


def test_classifier_score_non_ascii_fallback_matches_fast_path():
    from vietnamese_ocr_ray.functions.classifier import HashedLinearScorer

    scorer = HashedLinearScorer(dim=64)
    ascii_texts = ["plain ascii tokens here", "more words"]
    # same logical tokens plus a non-ASCII doc forcing the fallback
    mixed = ascii_texts + ["tiếng việt ớ"]
    fast = scorer(_docs_table(ascii_texts))
    slow = scorer(_docs_table(mixed))
    assert fast.column("logit_milli").to_pylist() == (
        slow.column("logit_milli").to_pylist()[:2]
    )


def test_global_rank_dense_and_partitioning_stable(ray_session):
    from vietnamese_ocr_ray.functions.rank import global_rank, rank_buckets

    rng = np.random.default_rng(3)
    vals = rng.permutation(400).astype(np.int64)
    t = pa.table(
        {
            "doc_id": pa.array(range(400), pa.int64()),
            "v": pa.array(vals),
        }
    )
    out = global_rank(rd.from_arrow(t), ["v", "doc_id"]).to_pandas()
    # rank == argsort position of v (v is a permutation, so no ties)
    assert sorted(out["rank"]) == list(range(400))
    assert (out.sort_values("v")["rank"].to_numpy() == np.arange(400)).all()
    b = global_rank(
        rd.from_arrow(t).repartition(9), ["v", "doc_id"]
    ).to_pandas()
    assert out.sort_values("doc_id")["rank"].tolist() == (
        b.sort_values("doc_id")["rank"].tolist()
    )

    lab = rank_buckets(
        rd.from_arrow(t), ["v", "doc_id"], ["head", "middle", "tail"]
    ).to_pandas()
    sizes = lab.groupby("bucket").size()
    assert sizes.to_dict() == {"head": 134, "middle": 133, "tail": 133}
    # band boundaries: ranks 0..133 head, 134..266 middle, rest tail
    assert (lab[lab["bucket"] == "head"]["rank"] < 134).all()
    assert (lab[lab["bucket"] == "tail"]["rank"] >= 267).all()


def test_normalize_text_nfc_lower_whitespace(ray_session):
    from vietnamese_ocr_ray.functions.text import normalize_text

    # 'a' + combining acute (NFD) must fold to the NFC precomposed char
    nfd = "Áb   C\t d "
    t = pa.table(
        {
            "doc_id": pa.array([0, 1], pa.int64()),
            "text": pa.array([nfd, "already clean"]),
        }
    )
    out = normalize_text(rd.from_arrow(t)).to_pandas().set_index("doc_id")
    assert out.loc[0, "norm_text"] == "áb c d"
    assert out.loc[0, "changed"] == 1
    assert out.loc[1, "norm_text"] == "already clean"
    assert out.loc[1, "changed"] == 0


def test_fused_curation_equals_composed_stages(ray_session):
    """The fused single-pass filter must equal composing the three
    shipped operators independently."""
    import pyarrow.compute as pc_

    from vietnamese_ocr_ray.functions.classifier import classifier_score
    from vietnamese_ocr_ray.functions.curation import curation_pipeline
    from vietnamese_ocr_ray.functions.sampling import hash_sample
    from vietnamese_ocr_ray.functions.text import gopher_filter

    import pyarrow.parquet as pq

    t = pq.read_table(
        "/root/testdata/sf0.001/documents.parquet",
        columns=["doc_id", "text", "lang"],
    )
    ds = rd.from_arrow(t)
    fused = curation_pipeline(ds).to_pandas()

    gop = gopher_filter(ds).to_pandas()
    cls = classifier_score(ds).to_pandas()
    band = hash_sample(ds, "doc_id", rate_permille=800, salt="cur:").to_pandas()
    want = set(gop[gop["kept"] == 1]["doc_id"]) & set(
        cls[cls["logit_milli"] > 0]["doc_id"]
    ) & set(band["doc_id"])
    assert set(fused["doc_id"]) == want
    assert len(fused) == len(want)


def test_connected_components_long_chain_both_modes(ray_session):
    """Regression: a path graph of diameter 40 must collapse to one
    component — a bounded round cap below the diameter silently
    mislabels chain components (shipped once; caught at sf0.1).
    Both modes now pointer-jump (label-of-label compression), so
    rounds are ~O(log diameter); diameters exceed the old buggy cap
    of 10 in both legs (the shuffled leg stays smaller only to bound
    CI shuffle count)."""
    from vietnamese_ocr_ray.functions.dedup import connected_components

    for mode, n in ((True, 41), (False, 13)):
        pairs = pa.table(
            {
                "a": pa.array(list(range(n - 1)), pa.int64()),
                "b": pa.array(list(range(1, n)), pa.int64()),
            }
        )
        out = connected_components(
            rd.from_arrow(pairs), broadcast=mode
        ).to_pandas()
        assert len(out) == n
        assert (out["component"] == 0).all(), mode


def test_pca_project_matches_numpy_reference(ray_session):
    """Distributed PCA == an independent single-machine numpy PCA
    (same quantization, Python-int exact moments, population
    covariance, eigh, largest-|.|-positive sign convention) —
    bit-exact, and invariant to repartitioning (the moment reduce is
    integer, so block order cannot move a bit)."""
    from vietnamese_ocr_ray.functions.pca import pca_project

    rng = np.random.default_rng(7)
    dims, n = 6, 400
    base = rng.normal(size=(n, dims)) @ np.diag([5, 3, 1, 0.5, 0.2, 0.1])
    x = np.round(base.astype(np.float32), 4).astype(np.float64)
    t = pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array(list(x.astype(np.float32)) , pa.list_(pa.float32())),
        }
    )

    # independent reference: plain numpy, no engine code
    q = np.round(np.asarray(
        pa.Table.from_arrays([t.column("embedding").combine_chunks().flatten()], ["f"])
        .column("f"), dtype=np.float64
    ).reshape(n, dims) * 1_000_000).astype(np.int64)
    nn = q.shape[0]
    s = q.sum(axis=0).astype(object)
    ss = (q.T.astype(object) @ q.astype(object))
    mean = np.array([int(v) / nn for v in s]) / 1e6
    cov = np.empty((dims, dims))
    for i in range(dims):
        for j in range(dims):
            cov[i, j] = (int(ss[i, j]) / nn - (int(s[i]) / nn) * (int(s[j]) / nn)) / 1e12
    evals, evecs = np.linalg.eigh(cov)
    o = np.argsort(-evals, kind="stable")
    evecs = evecs[:, o]
    for c in range(dims):
        piv = int(np.argmax(np.abs(evecs[:, c])))
        if evecs[piv, c] < 0:
            evecs[:, c] = -evecs[:, c]
    # projection reference: per-row SCALAR accumulation in ascending-k
    # order — the engine batches the same order as vectorized FMAs, so
    # equality here is bit-exact AND layout-independent (a BLAS matmul
    # reference would round differently per batch shape)
    flat = np.asarray(t.column("embedding").combine_chunks().flatten(), np.float64)
    xc = flat.reshape(n, dims) - mean
    want = np.zeros((n, 2))
    for i in range(n):
        for j in range(2):
            acc = 0.0
            for k in range(dims):
                acc += xc[i, k] * evecs[k, j]
            want[i, j] = acc

    for nblocks in (1, 7):
        got = (
            pca_project(rd.from_arrow(t).repartition(nblocks), n_components=2)
            .to_pandas()
            .sort_values("vec_id")
        )
        assert np.array_equal(got["pc1"].to_numpy(), want[:, 0])
        assert np.array_equal(got["pc2"].to_numpy(), want[:, 1])
    # top component must carry the dominant variance direction
    assert want[:, 0].std() > want[:, 1].std()


def test_pca_project_2d_closed_form(ray_session):
    """The SQL-verifiable 2x2 twin: closed-form axes agree with an
    independent numpy eigh on the same exact-integer covariance (to
    float tolerance — expression order differs by design), the output
    is BIT-identical across block layouts, and the components are
    ordered by variance and empirically decorrelated."""
    from vietnamese_ocr_ray.functions.pca import pca_project_2d

    rng = np.random.default_rng(11)
    n = 500
    # correlated pair so the axes are a non-trivial rotation
    a = rng.normal(size=n)
    x = np.round(
        np.c_[3 * a + rng.normal(size=n), a + 0.5 * rng.normal(size=n)], 4
    ).astype(np.float32)
    t = pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array(list(x), pa.list_(pa.float32())),
        }
    )

    runs = []
    for nblocks in (1, 7):
        runs.append(
            pca_project_2d(rd.from_arrow(t).repartition(nblocks))
            .to_pandas()
            .sort_values("vec_id")
            .reset_index(drop=True)
        )
    assert np.array_equal(runs[0]["pc1"].to_numpy(), runs[1]["pc1"].to_numpy())
    assert np.array_equal(runs[0]["pc2"].to_numpy(), runs[1]["pc2"].to_numpy())

    # independent reference: quantized moments -> population cov -> eigh
    xd = x.astype(np.float64)
    q = np.floor(xd * 1_000_000 + 0.5).astype(np.int64)
    s = [int(v) for v in q.sum(axis=0)]
    ss = [[int(v) for v in row] for row in q.T @ q]
    cov = np.array(
        [
            [
                (ss[i][j] / n - (s[i] / n) * (s[j] / n)) / 1e12
                for j in range(2)
            ]
            for i in range(2)
        ]
    )
    mean = np.array([s[0] / n / 1e6, s[1] / n / 1e6])
    evals, evecs = np.linalg.eigh(cov)
    o = np.argsort(-evals, kind="stable")
    evecs = evecs[:, o]
    for c in range(2):
        if evecs[np.argmax(np.abs(evecs[:, c])), c] < 0:
            evecs[:, c] = -evecs[:, c]
    want = (xd - mean) @ evecs
    got = runs[0][["pc1", "pc2"]].to_numpy()
    assert np.allclose(got, want, atol=1e-9)
    assert got[:, 0].var() >= got[:, 1].var()
    assert abs(np.corrcoef(got[:, 0], got[:, 1])[0, 1]) < 1e-6


def test_histogram_quantiles(ray_session):
    """Fixed-grid quantiles: estimate within half a bucket width of
    the true rank element (the documented bound), and BIT-identical
    across block layouts (bucket counts are exact integers)."""
    from vietnamese_ocr_ray.functions.sketch import histogram_quantiles

    rng = np.random.default_rng(29)
    vals = rng.exponential(20, 10_000)
    t = pa.table({"v": pa.array(vals, pa.float64())})
    srt = np.sort(vals)

    runs = []
    for nblocks in (1, 9):
        out = histogram_quantiles(
            rd.from_arrow(t).repartition(nblocks), "v", qs=(0.5, 0.95), inv_width=4
        ).to_pydict()
        runs.append(out)
        for q, est in zip(out["q"], out["est"]):
            truth = srt[int(np.floor(q * (len(vals) - 1)))]
            assert abs(est - truth) <= 1 / (2 * 4), (q, est, truth)
    assert runs[0] == runs[1]


def test_grouped_histogram_quantiles(ray_session):
    """Per-group fixed-grid quantiles: per-key half-bucket error bound
    and bit-identical output across block layouts."""
    import pandas as pd

    from vietnamese_ocr_ray.functions.sketch import grouped_histogram_quantiles

    rng = np.random.default_rng(31)
    n = 12_000
    df = pd.DataFrame(
        {
            "g": rng.choice(["a", "b", "c"], n),
            "v": rng.gamma(4, 8, n),
        }
    )
    runs = []
    for nblocks in (1, 9):
        out = (
            grouped_histogram_quantiles(
                rd.from_pandas(df).repartition(nblocks), "g", "v",
                qs=(0.5, 0.95), inv_width=4,
            )
            .to_pandas()
            .sort_values(["g", "q"])
            .reset_index(drop=True)
        )
        runs.append(out)
        for _, r in out.iterrows():
            grp = np.sort(df.loc[df["g"] == r["g"], "v"].to_numpy())
            truth = grp[int(np.floor(r["q"] * (len(grp) - 1)))]
            assert abs(r["est"] - truth) <= 1 / (2 * 4), tuple(r)
    pd.testing.assert_frame_equal(runs[0], runs[1])


def test_cosine_pairs_interleaved_ids(ray_session):
    """Regression (ADVICE r2): the chunk-pair task grid only has tasks
    for i <= j, so an off-diagonal task must emit a qualifying pair no
    matter which chunk holds the smaller id. Ids are deliberately laid
    out DESCENDING across block order so every cross-chunk pair has its
    larger id in the earlier chunk — under the old strict
    ids_a < ids_b mask all such pairs silently vanished."""
    from vietnamese_ocr_ray.functions.ann import cosine_pairs

    rng = np.random.default_rng(23)
    n = 120
    vecs = rng.standard_normal((n, 16))
    ids = np.arange(n - 1, -1, -1, dtype=np.int64)  # descending
    t = pa.table(
        {
            "vec_id": pa.array(ids),
            "embedding": pa.array(
                [v.astype(np.float32) for v in vecs], pa.list_(pa.float32())
            ),
        }
    )
    threshold = 0.5
    m = vecs.astype(np.float64)
    m32 = vecs.astype(np.float32).astype(np.float64)
    mn = m32 / np.maximum(np.linalg.norm(m32, axis=1, keepdims=True), 1e-30)
    cos = np.round(mn @ mn.T, 6)
    iu = np.triu_indices(n, 1)
    mask = cos[iu] >= threshold
    expect = {
        (min(int(ids[i]), int(ids[j])), max(int(ids[i]), int(ids[j])))
        for i, j in zip(iu[0][mask], iu[1][mask])
    }
    assert len(expect) > 0
    got = cosine_pairs(
        rd.from_arrow(t), threshold=threshold, chunk_rows=17
    ).to_pandas()
    pairs = list(zip(got["vec_id_a"], got["vec_id_b"]))
    assert len(pairs) == len(set(pairs))  # emitted once
    assert set(pairs) == expect
    assert (got["vec_id_a"] < got["vec_id_b"]).all()  # canonical order


def test_neardup_survivors_empty_pair_set(ray_session):
    """Regression (ADVICE r2): zero near-dups must return the corpus
    unchanged, not KeyError on the schema-less empty drop table."""
    from vietnamese_ocr_ray.functions.dedup import neardup_survivors

    docs = _docs_table(["aaa", "bbb", "ccc"])
    pairs = pa.table(
        {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())}
    )
    out = neardup_survivors(
        rd.from_arrow(docs), rd.from_arrow(pairs)
    ).to_pandas()
    assert sorted(out["doc_id"]) == [0, 1, 2]


def test_cms_depth_rows_independent_for_nondefault_width():
    """Regression (ADVICE r2): for width != 2048 the old code used a
    0-bit shift, making every depth row a bijection of the hash's low
    bits — two items colliding in one row collided in ALL rows. Two
    hashes sharing low bits but differing high bits must now land in
    different counters in at least one row."""
    from vietnamese_ocr_ray.functions.sketch import CountMinSketch

    for width in (64, 256, 1024):
        s = CountMinSketch(depth=4, width=width)
        h = np.array([0x1, 0x1 + (1 << 40)], np.uint64)  # same low bits
        idx = s._indices(h)
        assert any(int(idx[d, 0]) != int(idx[d, 1]) for d in range(4)), width
    # default width keeps its historical layout (oracle stability)
    s2048 = CountMinSketch(depth=4, width=2048)
    assert int(s2048._shift) == 53


def test_fp_cluster_survivors_exact_vs_bruteforce(ray_session):
    """Fingerprint-level near-dup removal == brute-force CC over the
    full row-pair Hamming graph, including identical-fp clusters far
    larger than any candidate cap could list pairwise."""
    from vietnamese_ocr_ray.functions.dedup import fp_cluster_survivors

    # cluster A: 300 rows sharing one fp (pairwise listing = 45k pairs,
    # well past the banded search's per-run cap) + a hamming-2 neighbor
    # fp; cluster B: isolated far fp; cluster C: two fps at hamming 1
    fp_a = 0x0123456789ABCDEF
    fps = (
        [fp_a] * 300
        + [fp_a ^ 0b11]                     # joins cluster A (ham 2)
        + [0x0F0F0F0F0F0F0F0F]              # far, survives alone
        + [0x7000000000000000, 0x7000000000000001]  # cluster C (ham 1)
    )
    ids = list(range(len(fps)))
    t = pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "fp": pa.array(np.array(fps, dtype=np.uint64).astype(np.int64)),
        }
    )
    out = fp_cluster_survivors(
        rd.from_arrow(t), max_hamming=3, bands=4, id_col="doc_id"
    ).to_pandas()

    # brute-force reference: CC over ALL row pairs within hamming 3
    f = np.array(fps, dtype=np.uint64)
    parent = list(range(len(f)))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for i in range(len(f)):
        for j in range(i + 1, len(f)):
            if bin(int(f[i] ^ f[j])).count("1") <= 3:
                parent[find(i)] = find(j)
    clusters = {}
    for i in range(len(f)):
        clusters.setdefault(find(i), []).append(i)
    want = sorted(min(m) for m in clusters.values())
    assert sorted(out["doc_id"]) == want
    assert want == [0, 301, 302]  # A keeps 0, B survives, C keeps 302


def test_fp_cluster_survivors_canonical_keep(ray_session):
    """score_col switches survivor selection to max-score (tie -> min
    id) — verified against a brute-force CC + argmax reference on the
    same fixture, including a tied-score cluster."""
    from vietnamese_ocr_ray.functions.dedup import fp_cluster_survivors

    fp_a = 0x0123456789ABCDEF
    fps = (
        [fp_a] * 5
        + [fp_a ^ 0b11]                     # joins cluster A (ham 2)
        + [0x0F0F0F0F0F0F0F0F]              # isolated
        + [0x7000000000000000, 0x7000000000000001]  # cluster C (ham 1)
    )
    # cluster A scores peak at doc 3; cluster C ties (both 40) -> min id
    scores = [10, 20, 30, 99, 5, 50, 7, 40, 40]
    ids = list(range(len(fps)))
    t = pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "n_chars": pa.array(scores, pa.int64()),
            "fp": pa.array(np.array(fps, dtype=np.uint64).astype(np.int64)),
        }
    )
    out = fp_cluster_survivors(
        rd.from_arrow(t),
        max_hamming=3,
        bands=4,
        id_col="doc_id",
        score_col="n_chars",
    ).to_pandas()
    assert sorted(out["doc_id"]) == [3, 6, 7]
    # survivors keep the full input schema minus the internal columns
    assert sorted(out.columns) == ["doc_id", "fp", "n_chars"]


def test_fp_cluster_survivors_no_pairs(ray_session):
    """All-distinct, all-far fingerprints: everything survives."""
    from vietnamese_ocr_ray.functions.dedup import fp_cluster_survivors

    fps = np.array([0, 0x00FF00FF00FF00FF, -1], dtype=np.int64)
    t = pa.table(
        {"doc_id": pa.array([7, 8, 9], pa.int64()), "fp": pa.array(fps)}
    )
    out = fp_cluster_survivors(rd.from_arrow(t), 3, bands=4, id_col="doc_id")
    assert sorted(out.to_pandas()["doc_id"]) == [7, 8, 9]


def test_fuzzy_pairs_ed1_matches_bruteforce(ray_session):
    """Deletion-neighborhood blocking finds EXACTLY the ed==1 pairs a
    brute-force O(n^2) Levenshtein sweep finds — substitutions,
    insertions/deletions, and repeated-char words whose deletion
    variants collide ("aa" -> "a" twice) all covered; ed-2 candidates
    that share a variant (e.g. two deletions of one parent) rejected."""
    import itertools

    from vietnamese_ocr_ray.functions.dedup import fuzzy_pairs_ed1
    from vietnamese_ocr_ray.functions.text import levenshtein_batch

    words = [
        "cat", "cot", "coat", "cart", "ca", "c", "",
        "aa", "a", "aaa", "ab",
        "hello", "hallo", "hell", "helloo", "world",
        "xyzzy",  # isolated — no neighbors
    ]
    docs = pa.table({"text": pa.array([" ".join(words), words[0]])})
    got = (
        fuzzy_pairs_ed1(rd.from_arrow(docs), num_buckets=5)
        .to_pandas()
        .sort_values(["w1", "w2"])
        .reset_index(drop=True)
    )
    toks = sorted(set(words))
    cand = [(a, b) for a, b in itertools.combinations(toks, 2)]
    d = levenshtein_batch([a for a, _ in cand], [b for _, b in cand])
    want = sorted((a, b) for (a, b), dd in zip(cand, d) if dd == 1)
    assert list(map(tuple, got.to_numpy())) == want
    assert ("aa", "aaa") in want and ("", "a") in want  # ins/del cases
    assert ("cat", "cot") in want  # substitution case
    assert ("cat", "coat") in want and ("coat", "cot") in want


def test_fuzzy_pairs_ed1_empty_result(ray_session):
    """Zero qualifying pairs returns an empty, correctly-typed table
    (the empty-Dataset schema-loss guard)."""
    from vietnamese_ocr_ray.functions.dedup import fuzzy_pairs_ed1

    docs = pa.table({"text": pa.array(["alpha gamma", "epsilon omega"])})
    got = fuzzy_pairs_ed1(rd.from_arrow(docs), num_buckets=3)
    assert got.count() == 0
    # Dataset.schema() is the reliable probe — to_pandas() of a fully
    # empty Dataset loses columns on this Ray version (joins._ensure_schema)
    assert got.schema().names == ["w1", "w2"]


def test_knn_join_exact_matches_numpy(ray_session):
    """Multi-chunk exact k-NN self-join == a single-matrix numpy
    reference, with ids deliberately interleaved across chunks (the
    cross-chunk drop regression class) and k > some chunk sizes. The
    reference selects by the same packed key WITHOUT negating (the
    int64 self-mask sentinel wraps under negation — the exact bug the
    partial top-k once had)."""
    import pandas as pd

    from vietnamese_ocr_ray.functions.ann import knn_join_exact

    rng = np.random.default_rng(7)
    n, d, k = 57, 8, 5  # 57 rows / 16-row chunks -> last chunk of 9
    m = rng.normal(size=(n, d))
    m[13] = m[41]  # planted exact duplicate (cos == 1.0 neighbor)
    ids = rng.permutation(n).astype(np.int64)
    t = pa.table(
        {
            "vec_id": pa.array(ids),
            "embedding": pa.array([list(r) for r in m], pa.list_(pa.float64())),
        }
    )
    got = (
        knn_join_exact(rd.from_arrow(t), k=k, chunk_rows=16, num_buckets=4)
        .to_pandas()
        .sort_values(["vec_id", "nbr"])
        .reset_index(drop=True)
    )
    u = m / np.linalg.norm(m, axis=1, keepdims=True)
    cos = np.round(u @ u.T, 6)
    micro = np.rint(cos * 1e6).astype(np.int64)
    rows = []
    for i in range(n):
        key = (micro[i] << np.int64(33)) - ids
        order = [j for j in np.argsort(key)[::-1] if j != i][:k]
        rows += [(ids[i], ids[j], micro[i, j] / 1e6) for j in order]
    ref = (
        pd.DataFrame(rows, columns=["vec_id", "nbr", "cos"])
        .sort_values(["vec_id", "nbr"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, ref)
    # the planted duplicate is each copy's top neighbor at cos 1.0
    a, b = ids[13], ids[41]
    assert got[(got.vec_id == a) & (got.nbr == b)]["cos"].iloc[0] == 1.0


def test_knn_join_exact_small_corpus(ray_session):
    """n <= k: every vector gets all n-1 others, exactly once."""
    from vietnamese_ocr_ray.functions.ann import knn_join_exact

    rng = np.random.default_rng(1)
    m = rng.normal(size=(4, 6))
    t = pa.table(
        {
            "vec_id": pa.array(np.arange(4, dtype=np.int64)),
            "embedding": pa.array([list(r) for r in m], pa.list_(pa.float64())),
        }
    )
    got = knn_join_exact(rd.from_arrow(t), k=10, chunk_rows=2).to_pandas()
    assert len(got) == 12  # 4 * 3
    assert got.groupby("vec_id").size().eq(3).all()
    assert (got.vec_id != got.nbr).all()


def test_knn_join_ivf_full_probe_equals_exact(ray_session):
    """nprobe == n_clusters probes every cell — the IVF join must then
    equal the exact chunk-pair join row for row."""
    import pandas as pd

    from vietnamese_ocr_ray.functions.ann import knn_join_exact
    from vietnamese_ocr_ray.functions.kmeans import knn_join_ivf

    rng = np.random.default_rng(3)
    m = rng.normal(size=(50, 8))
    ids = rng.permutation(50).astype(np.int64)
    t = pa.table(
        {
            "vec_id": pa.array(ids),
            "embedding": pa.array([list(r) for r in m], pa.list_(pa.float64())),
        }
    )
    exact = (
        knn_join_exact(rd.from_arrow(t), k=4, chunk_rows=16)
        .to_pandas()
        .sort_values(["vec_id", "nbr"])
        .reset_index(drop=True)
    )
    ivf = (
        knn_join_ivf(rd.from_arrow(t), k=4, n_clusters=5, nprobe=5)
        .to_pandas()
        .sort_values(["vec_id", "nbr"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(ivf, exact)


def test_knn_join_ivf_recall_on_blobs(ray_session):
    """Well-separated blobs: with nprobe=1 a vector's true neighbors
    live in its own cell, so recall vs the exact join stays high."""
    from vietnamese_ocr_ray.functions.ann import knn_join_exact
    from vietnamese_ocr_ray.functions.kmeans import knn_join_ivf

    rng = np.random.default_rng(11)
    centers = rng.normal(size=(4, 12)) * 20.0
    m = np.concatenate(
        [c + rng.normal(size=(30, 12)) for c in centers]
    )
    ids = np.arange(len(m), dtype=np.int64)
    t = pa.table(
        {
            "vec_id": pa.array(ids),
            "embedding": pa.array([list(r) for r in m], pa.list_(pa.float64())),
        }
    )
    exact = knn_join_exact(rd.from_arrow(t), k=3, chunk_rows=32).to_pandas()
    ivf = knn_join_ivf(
        rd.from_arrow(t), k=3, n_clusters=4, nprobe=1
    ).to_pandas()
    truth = set(map(tuple, exact[["vec_id", "nbr"]].to_numpy()))
    got = set(map(tuple, ivf[["vec_id", "nbr"]].to_numpy()))
    recall = len(truth & got) / len(truth)
    assert recall >= 0.9, recall


def test_span_corruption_t5_semantics():
    from vietnamese_ocr_ray.functions.text import span_corruption_batch

    toks = [f"t{i}" for i in range(25)]
    batch = pa.table({"doc_id": [1, 2], "text": [" ".join(toks), "a b"]})
    out = span_corruption_batch(batch).to_pylist()
    # doc 1: blocks of 3; blocks 0 and 7 masked -> pos 0-2 and 21-23
    r = out[0]
    assert r["n_masked"] == 6
    assert r["input_text"] == "<extra_id_0> " + " ".join(toks[3:21]) + " <extra_id_1> t24"
    assert r["target_text"] == "<extra_id_0> t0 t1 t2 <extra_id_1> t21 t22 t23"
    # doc 2: both tokens fall in masked block 0
    r = out[1]
    assert r["n_masked"] == 2
    assert r["input_text"] == "<extra_id_0>"
    assert r["target_text"] == "<extra_id_0> a b"


def test_fim_transform_psm_layout():
    from vietnamese_ocr_ray.functions.text import fim_transform_batch

    batch = pa.table(
        {"doc_id": [2, 3, 4], "text": ["abcdefghij", "untouched", "xy"]}
    )
    out = fim_transform_batch(batch).to_pylist()
    # n=10 -> prefix [0,3), middle [3,6), suffix [6,10)
    assert out[0] == {
        "doc_id": 2,
        "fim_applied": True,
        "text_out": "<PRE>abc<SUF>ghij<MID>def",
    }
    assert out[1] == {"doc_id": 3, "fim_applied": False, "text_out": "untouched"}
    # n=2 -> empty prefix, middle [0,1), suffix [1,2)
    assert out[2]["text_out"] == "<PRE><SUF>y<MID>x"


def test_zorder_key_interleave():
    from vietnamese_ocr_ray.functions.layout import zorder_key

    a = np.array([0b101, 0, 255], dtype=np.int64)
    b = np.array([0b011, 255, 0], dtype=np.int64)
    z = zorder_key(a, b)
    # bit i of b at 2i, bit i of a at 2i+1
    assert z[0] == (1 << 0) + (1 << 2) + (1 << 1) + (1 << 5)
    assert z[1] == sum(1 << (2 * i) for i in range(8))
    assert z[2] == sum(1 << (2 * i + 1) for i in range(8))
    # adjacent cells in either dimension stay within a small key range
    assert zorder_key(np.array([3]), np.array([4]))[0] != z[0]


def test_snapshot_diff_statuses(ray_session):
    from vietnamese_ocr_ray.functions.cdc import snapshot_diff

    old = rd.from_arrow(
        pa.table({"doc_id": [1, 2, 3, 4], "text": ["a", "b", "c", "d"]})
    )
    new = rd.from_arrow(
        pa.table({"doc_id": [1, 2, 5], "text": ["a", "B", "e"]})
    )
    out = snapshot_diff(old, new).to_pandas().set_index("doc_id")["status"]
    assert out[1] == "unchanged"
    assert out[2] == "updated"
    assert out[3] == "deleted" and out[4] == "deleted"
    assert out[5] == "inserted"


def test_chi2_token_lang_matches_contingency_reference(ray_session):
    """chi2 over a hand-built corpus must equal the textbook 2x2
    contingency statistic computed from exact document frequencies,
    and be invariant to block layout."""
    from vietnamese_ocr_ray.functions.lm import chi2_token_lang

    # 12 vi docs say "pho", 2 en docs say "pho"; "the" is en-heavy.
    texts, langs = [], []
    for i in range(12):
        texts.append("pho ngon qua")
        langs.append("vi")
    for i in range(8):
        texts.append("the cat ate pho" if i < 2 else "the cat sat")
        langs.append("en")
    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(langs),
        }
    )
    out = (
        chi2_token_lang(rd.from_arrow(t), min_df=2)
        .to_pandas()
        .set_index(["lang", "tok"])
        .sort_index()
    )

    # dict reference over exact doc frequencies
    from collections import Counter

    df = Counter()
    lang_n = Counter(langs)
    for txt, lg in zip(texts, langs):
        for tok in set(txt.split(" ")):
            df[(lg, tok)] += 1
    n = len(texts)
    tok_tot = Counter()
    for (lg, tok), c in df.items():
        tok_tot[tok] += c
    for (lg, tok), a in df.items():
        tt = tok_tot[tok]
        if tt < 2 or tt >= n:
            continue
        b = tt - a
        c = lang_n[lg] - a
        d = n - lang_n[lg] - b
        diff = a * d - b * c
        den = (
            float(tt) * float(n - tt) * float(lang_n[lg])
            * float(n - lang_n[lg])
        )
        expect = round(float(n) * float(diff) * float(diff) / den, 6)
        assert out.loc[(lg, tok), "chi2"] == expect, (lg, tok)
        assert out.loc[(lg, tok), "n_docs"] == a
    assert len(out) == sum(
        1 for (lg, tok) in df if 2 <= tok_tot[tok] < n
    )
    # "pho" must associate more strongly with vi than "cat" with... no:
    # sanity direction check — the en-only token outranks the shared one.
    assert (
        out.loc[("en", "cat"), "chi2"] > out.loc[("en", "pho"), "chi2"]
    )

    # layout invariance: 1-row blocks give the identical table
    out2 = (
        chi2_token_lang(
            rd.from_arrow(t).repartition(len(texts)), min_df=2
        )
        .to_pandas()
        .set_index(["lang", "tok"])
        .sort_index()
    )
    assert out.equals(out2)


def test_mmr_select_diversifies_and_matches_greedy_reference(ray_session):
    """MMR must (a) equal a plain-python greedy reference on random
    data and (b) skip a planted near-duplicate of the first pick in
    favor of a diverse candidate, where pure relevance ranking would
    not."""
    from vietnamese_ocr_ray.functions.ann import mmr_select

    rng = np.random.default_rng(5)
    vecs = rng.standard_normal((100, 8))
    q = vecs[3].copy()
    vecs[50] = vecs[3] + 1e-4 * rng.standard_normal(8)  # near-dup of 3
    t = pa.table(
        {
            "vec_id": pa.array(range(100), pa.int64()),
            "embedding": pa.array(
                [v.astype(np.float32) for v in vecs], pa.list_(pa.float32())
            ),
        }
    )
    out = mmr_select(
        rd.from_arrow(t).repartition(7), q, k=6, pool=16
    ).to_pandas()

    # greedy python reference over float32-roundtripped vectors
    v32 = vecs.astype(np.float32).astype(np.float64)
    qn = q / np.linalg.norm(q)
    rel = np.round(
        (v32 @ qn) / np.maximum(np.linalg.norm(v32, axis=1), 1e-30), 6
    )
    pool_ids = sorted(range(100), key=lambda i: (-rel[i], i))[:16]
    mn = v32[pool_ids] / np.maximum(
        np.linalg.norm(v32[pool_ids], axis=1, keepdims=True), 1e-30
    )
    sims = np.round(mn @ mn.T, 6)
    sel, expect = [], []
    for r in range(6):
        best = None
        for j, vid in enumerate(pool_ids):
            if j in sel:
                continue
            s = rel[vid] if r == 0 else rel[vid] - max(
                sims[j][i] for i in sel
            )
            key = (-s, vid)
            if best is None or key < best[0]:
                best = (key, j, vid, s)
        sel.append(best[1])
        expect.append((r + 1, best[2], rel[best[2]], best[3]))
    got = list(
        zip(out["rank"], out["vec_id"], out["relevance"], out["mmr_score"])
    )
    assert got == expect

    # rank 1 is the self-match; its planted near-dup must NOT be rank 2
    assert out["vec_id"].iloc[0] == 3
    assert out["vec_id"].iloc[1] != 50
    # ...but 50 IS the second-most-relevant candidate by pure cosine
    assert sorted(range(100), key=lambda i: (-rel[i], i))[1] == 50


def test_ann_pq_matches_numpy_adc_reference_and_recalls_blob(ray_session):
    """ann_pq's ADC distances must equal a pure-numpy PQ reference
    built from the SAME codebooks (encode = integer grid argmin,
    distance = table-lookup sum), and on well-separated blobs the
    PQ top-k must recover the query's own blob."""
    from vietnamese_ocr_ray.functions.kmeans import (
        _assign_q,
        _quantize,
        ann_pq,
        pq_fit,
    )

    rng = np.random.default_rng(11)
    centers = rng.standard_normal((4, 32)) * 4
    vecs = np.vstack(
        [c + 0.05 * rng.standard_normal((25, 32)) for c in centers]
    )
    t = pa.table(
        {
            "vec_id": pa.array(range(100), pa.int64()),
            "embedding": pa.array(
                [v.astype(np.float32) for v in vecs], pa.list_(pa.float32())
            ),
        }
    )
    ds = rd.from_arrow(t).repartition(5)
    q = vecs[0].astype(np.float32).astype(np.float64)
    out = ann_pq(
        ds, q, k=10, n_sub=4, ks=8, iters=3, sample_permille=None
    ).to_pandas()

    # numpy reference: same fit, explicit encode + ADC
    cbs = pq_fit(ds, n_sub=4, ks=8, iters=3, dim=32)
    v64 = vecs.astype(np.float32).astype(np.float64)
    qg = _quantize(q)
    adist = np.zeros(100, dtype=np.int64)
    for s, cb in enumerate(cbs):
        cq = _quantize(cb)
        codes = _assign_q(_quantize(v64[:, s * 8 : (s + 1) * 8]), cq)
        d = cq - qg[s * 8 : (s + 1) * 8][None, :]
        tab = np.einsum("ij,ij->i", d, d)
        adist += tab[codes]
    order = np.lexsort((np.arange(100), adist))[:10]
    assert list(out["vec_id"]) == list(order)
    assert list(out["adist"]) == list(adist[order])
    # blob recall: all 10 hits from the query's own 25-vector blob
    assert all(v < 25 for v in out["vec_id"])

    # sampled fit (the production default): codebooks trained on the
    # hash_sample subset must equal pq_fit run on that same subset,
    # and blob recall must survive the 4x-smaller fit
    from vietnamese_ocr_ray.functions.sampling import hash_sample

    sub = hash_sample(
        rd.from_arrow(t), "vec_id", rate_permille=500, salt="pqfit:"
    )
    cbs_s = [
        c.tolist()
        for c in pq_fit(sub, n_sub=4, ks=8, iters=3, dim=32)
    ]
    cbs_s2 = [
        c.tolist()
        for c in pq_fit(
            rd.from_arrow(t), n_sub=4, ks=8, iters=3, dim=32,
            sample_permille=500,
        )
    ]
    assert cbs_s == cbs_s2
    out_s = ann_pq(
        ds, q, k=10, n_sub=4, ks=8, iters=3, sample_permille=500
    ).to_pandas()
    assert all(v < 25 for v in out_s["vec_id"])


def test_winnow_fingerprints_matches_reference_and_guarantee(ray_session):
    """Winnowing must equal a plain-python reference (FNV grams,
    window-min with rightmost tie), honor the shared-substring
    guarantee (common substring >= kg + w - 1 -> shared fp), and
    collapse an all-equal-hash run to the rightmost-per-window rule."""
    from vietnamese_ocr_ray.functions.text import winnow_fingerprints

    kg, w = 8, 4
    shared = "the quick brown fox jumps"
    texts = [
        "aaaaaaaaaaaaaaaa",                       # all grams identical
        "prefix one " + shared + " suffix alpha",
        "other start " + shared + " tail omega",
        "completely unrelated text with no overlap here",
        "tiny",                                   # shorter than one gram
    ]
    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts),
        }
    )
    out = winnow_fingerprints(rd.from_arrow(t).repartition(3), kg, w)
    df = out.to_pandas()

    def ref(s):
        bs = s.encode()
        grams = []
        ng = max(len(bs) - kg + 1, 1)
        for i in range(ng):
            h = 0xCBF29CE484222325
            for j in range(kg):
                b = bs[i + j] if i + j < len(bs) else 0
                h = ((h ^ b) * 0x100000001B3) % (1 << 64)
            grams.append(h)
        sel = set()
        for w0 in range(max(ng - w + 1, 1)):
            win = grams[w0 : w0 + w]
            m = min(win)
            # rightmost minimum
            pos = w0 + max(i for i, v in enumerate(win) if v == m)
            sel.add((pos + 1, format(grams[pos], "016x")))
        return sel

    for did, s in enumerate(texts):
        got = {
            (int(r.pos), r.fp)
            for r in df[df.doc_id == did].itertuples()
        }
        assert got == ref(s), did

    # shared-substring guarantee: docs 1 and 2 share a fingerprint VALUE
    f1 = set(df[df.doc_id == 1].fp)
    f2 = set(df[df.doc_id == 2].fp)
    f3 = set(df[df.doc_id == 3].fp)
    assert f1 & f2
    assert not (f1 & f3) or not (f2 & f3)  # unrelated doc stays mostly apart

    # all-identical grams: rightmost rule selects every pos from w..ng
    d0 = sorted(df[df.doc_id == 0].pos)
    ng0 = len(texts[0]) - kg + 1
    assert d0 == list(range(w, ng0 + 1))


def test_winnow_overlap_finds_planted_neardups_and_drops_stop_fps(ray_session):
    from vietnamese_ocr_ray.functions.text import winnow_overlap

    base = "alpha bravo charlie delta echo foxtrot golf hotel india"
    texts = [
        base + " one extra tail",
        base + " two other ending",        # near-dup of 0
        "completely different content with nothing in common zz",
    ]
    # 40 docs all containing one common phrase -> its fps exceed max_df
    texts += [f"unique{i:02d} filler the common shared phrase here" for i in range(40)]
    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts),
        }
    )
    out = winnow_overlap(
        rd.from_arrow(t).repartition(4), min_share=4, max_df=32
    ).to_pandas()
    pairs = set(zip(out.doc_a, out.doc_b))
    assert (0, 1) in pairs
    assert not any(2 in p for p in pairs)
    # the 40-doc common phrase is a stop fingerprint: no pair among the
    # filler docs can reach min_share through it
    filler = {p for p in pairs if p[0] >= 3 and p[1] >= 3}
    assert not filler


def test_value_psi_detects_planted_shift(ray_session, tmp_path):
    """PSI must be ~0 for identical halves and large for a planted
    shift, and equal a dict reference with add-one smoothing."""
    import math

    from vietnamese_ocr_ray.pipelines.relational import value_psi

    n = 4000
    rng = np.random.default_rng(3)
    # 'stable': same distribution both halves. 'shifted': odd ids +5.
    vals, types, ids = [], [], []
    for i in range(n):
        base = float(rng.uniform(0, 10))
        vals.append(base)
        types.append("stable")
        ids.append(i)
    for i in range(n):
        base = float(rng.uniform(0, 10)) + (5.0 if i % 2 else 0.0)
        vals.append(base)
        types.append("shifted")
        ids.append(n + n % 2 + i)  # preserves i%2 parity alignment
    t = pa.table(
        {
            "event_id": pa.array(ids, pa.int64()),
            "event_type": pa.array(types),
            "value": pa.array(vals, pa.float64()),
        }
    )
    import pyarrow.parquet as pq

    pq.write_table(t, str(tmp_path / "events.parquet"))
    out = value_psi(str(tmp_path)).to_pandas().set_index("event_type")

    # dict reference
    from collections import Counter

    for etype in ("stable", "shifted"):
        ce, ca = Counter(), Counter()
        for i, ty, v in zip(ids, types, vals):
            if ty != etype:
                continue
            b = math.floor(v * 4)
            (ce if i % 2 == 0 else ca)[b] += 1
        buckets = sorted(set(ce) | set(ca))
        nb = len(buckets)
        tot_e = sum(ce.values()) + nb
        tot_a = sum(ca.values()) + nb
        u = 0
        for b in buckets:
            pe = (ce[b] + 1) / tot_e
            pa_ = (ca[b] + 1) / tot_a
            u += round((pa_ - pe) * math.log(pa_ / pe) * 1e9)
        assert out.loc[etype, "psi"] == u / 1e9
        assert out.loc[etype, "n_buckets"] == nb
    assert out.loc["stable", "psi"] < 0.05
    assert out.loc["shifted", "psi"] > 0.5


def test_random_projection_exact_and_distance_preserving(ray_session):
    from vietnamese_ocr_ray.functions.kmeans import _quantize
    from vietnamese_ocr_ray.functions.pca import random_projection

    rng = np.random.default_rng(7)
    vecs = rng.standard_normal((80, 64))
    t = pa.table(
        {
            "vec_id": pa.array(range(80), pa.int64()),
            "embedding": pa.array(
                [v.astype(np.float32) for v in vecs], pa.list_(pa.float32())
            ),
        }
    )
    out = (
        random_projection(rd.from_arrow(t).repartition(4), d_out=16)
        .to_pandas()
        .sort_values(["vec_id", "dim"])
    )
    y = out["y"].to_numpy().reshape(80, 16)

    # exact reference: grid-int matmul / 2^22
    signs = (
        np.random.default_rng(29).integers(0, 2, (64, 16)) * 2 - 1
    ).astype(np.int64)
    q = _quantize(vecs.astype(np.float32).astype(np.float64))
    expect = (q @ signs).astype(np.float64) / float(1 << 22)
    assert np.array_equal(y, expect)

    # JL property: median pairwise sq-distance ratio close to 1
    d_hi = ((vecs[:40, None, :] - vecs[None, 40:, :]) ** 2).sum(-1)
    d_lo = ((y[:40, None, :] - y[None, 40:, :]) ** 2).sum(-1)
    ratio = d_lo / d_hi
    assert 0.7 < np.median(ratio) < 1.3


def test_centroid_classify_separable_blobs_diagonal(ray_session):
    """On well-separated labeled blobs the confusion table must be
    purely diagonal; with one vector planted inside another blob it
    must show exactly that one off-diagonal cell."""
    from vietnamese_ocr_ray.functions.kmeans import centroid_classify

    rng = np.random.default_rng(13)
    centers = rng.standard_normal((3, 16)) * 10
    vecs, labels = [], []
    for li, c in enumerate(centers):
        for _ in range(30):
            vecs.append(c + 0.01 * rng.standard_normal(16))
            labels.append(li)
    vecs[0] = centers[2] + 0.01 * rng.standard_normal(16)  # mislabeled
    t = pa.table(
        {
            "vec_id": pa.array(range(len(vecs)), pa.int64()),
            "label": pa.array(labels, pa.int32()),
            "embedding": pa.array(
                [np.asarray(v, np.float32) for v in vecs],
                pa.list_(pa.float32()),
            ),
        }
    )
    out = centroid_classify(rd.from_arrow(t).repartition(4)).to_pandas()
    conf = {(r.label, r.pred_label): r.n_vecs for r in out.itertuples()}
    assert conf[(0, 2)] == 1
    assert conf[(0, 0)] == 29
    assert conf[(1, 1)] == 30
    assert conf[(2, 2)] == 30
    assert len(conf) == 4


def test_gazetteer_spans_positions_exact(ray_session):
    from vietnamese_ocr_ray.functions.text import gazetteer_spans

    texts = [
        "window scan window",          # overlapping term set, repeats
        "a merge sort inside",         # multi-word term
        "scanscan",                    # adjacent overlapping matches
        "nothing here",
    ]
    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts),
        }
    )
    out = gazetteer_spans(
        rd.from_arrow(t).repartition(2),
        terms=("window", "merge sort", "scan"),
    ).to_pandas()
    got = sorted(zip(out.doc_id, out.term, out.pos))
    expect = []
    for did, s in enumerate(texts):
        for term in ("window", "merge sort", "scan"):
            start = 0
            while True:
                i = s.find(term, start)
                if i < 0:
                    break
                expect.append((did, term, i + 1))
                start = i + 1
    assert got == sorted(expect)
    assert (2, "scan", 1) in got and (2, "scan", 5) in got


def test_resample_interpolate_hand_checked(ray_session, tmp_path):
    """Grid points between two events lerp exactly; exact hits return
    the event value; points outside the user's span drop."""
    import pyarrow.parquet as pq

    from vietnamese_ocr_ray.pipelines.analytics import resample_interpolate

    def ts(hours):
        return np.datetime64("2025-01-01T00:00:00", "us") + np.timedelta64(
            hours * 3600_000_000, "us"
        )

    # user 1: events at h=0 (v=10) and h=12 (v=22); user 2 only at h=6
    t = pa.table(
        {
            "user_id": pa.array([1, 1, 2], pa.int64()),
            "ts": pa.array([ts(0), ts(12), ts(6)], pa.timestamp("us")),
            "value": pa.array([10.0, 22.0, 5.0], pa.float64()),
        }
    )
    pq.write_table(t, str(tmp_path / "events.parquet"))
    out = (
        resample_interpolate(str(tmp_path), step_hours=6)
        .to_pandas()
        .sort_values(["user_id", "h"])
        .reset_index(drop=True)
    )
    got = [
        (int(r.user_id), str(np.datetime64(r.h, "h")), float(r.value_interp))
        for r in out.itertuples()
    ]
    # grid = 0h, 6h, 12h. user 1: 10.0 (hit), 16.0 (lerp), 22.0 (hit);
    # user 2: only 6h is inside its (degenerate) span -> 5.0
    assert got == [
        (1, "2025-01-01T00", 10.0),
        (1, "2025-01-01T06", 16.0),
        (1, "2025-01-01T12", 22.0),
        (2, "2025-01-01T06", 5.0),
    ]


def test_interval_coverage_union_not_sum(ray_session, tmp_path):
    """Overlapping windows must union (not sum); disjoint windows add;
    exact duplicates contribute once."""
    import pyarrow.parquet as pq

    from vietnamese_ocr_ray.pipelines.relational import interval_coverage

    def ts(minutes):
        return np.datetime64("2025-01-01T00:00:00", "us") + np.timedelta64(
            minutes * 60_000_000, "us"
        )

    t = pa.table(
        {
            "user_id": pa.array([1, 1, 1, 2, 2, 3], pa.int64()),
            # user 1: 0-30 & 10-40 overlap (union 40), 100-130 disjoint
            # user 2: duplicate timestamps -> one 30-min window
            # user 3: single event
            "ts": pa.array(
                [ts(0), ts(10), ts(100), ts(5), ts(5), ts(7)],
                pa.timestamp("us"),
            ),
        }
    )
    pq.write_table(t, str(tmp_path / "events.parquet"))
    out = (
        interval_coverage(str(tmp_path), window_min=30)
        .to_pandas()
        .set_index("user_id")
    )
    minute = 60_000_000
    assert out.loc[1, "covered_us"] == 70 * minute
    assert out.loc[2, "covered_us"] == 30 * minute
    assert out.loc[3, "covered_us"] == 30 * minute
    assert out.loc[1, "n_events"] == 3


def test_rolling_median_trailing_frames(ray_session, tmp_path):
    """First rows use the short frame; spikes are absorbed (median,
    not mean); values match a plain-python order-stat reference."""
    import pyarrow.parquet as pq

    from vietnamese_ocr_ray.pipelines.relational import rolling_median

    vals = [1.0, 100.0, 2.0, 3.0, 2.5, 2.0]
    t = pa.table(
        {
            "event_id": pa.array(range(6), pa.int64()),
            "user_id": pa.array([7] * 6, pa.int64()),
            "ts": pa.array(
                [np.datetime64("2025-01-01", "us") + np.timedelta64(i, "m")
                 for i in range(6)],
                pa.timestamp("us"),
            ),
            "value": pa.array(vals, pa.float64()),
        }
    )
    pq.write_table(t, str(tmp_path / "events.parquet"))
    out = (
        rolling_median(str(tmp_path))
        .to_pandas()
        .sort_values("event_id")["rolling_med"]
        .to_list()
    )
    expect = []
    for i in range(6):
        w = sorted(vals[max(0, i - 4) : i + 1])
        c = len(w)
        expect.append((w[(c - 1) // 2] + w[c // 2]) * 0.5)
    assert out == expect
    assert out[1] == 50.5  # two-row frame midpoint
    assert out[4] == 2.5   # spike absorbed: median of 5 ignores 100


def test_merge_upsert_last_wins_semantics(ray_session):
    from vietnamese_ocr_ray.functions.cdc import merge_upsert

    base = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "text": pa.array(["a", "b", "c", "d"]),
        }
    )
    # id 1: update; id 2: update then delete (delete wins);
    # id 3: delete then update (update wins); id 5: pure insert
    ch = pa.table(
        {
            "doc_id": pa.array([1, 2, 2, 3, 3, 5], pa.int64()),
            "seq": pa.array([1, 1, 2, 1, 2, 1], pa.int64()),
            "op": pa.array(
                ["upsert", "upsert", "delete", "delete", "upsert", "upsert"]
            ),
            "text": pa.array(["a2", "b2", "", "", "c2", "e"]),
        }
    )
    out = (
        merge_upsert(
            rd.from_arrow(base).repartition(2), rd.from_arrow(ch).repartition(3)
        )
        .to_pandas()
        .sort_values("doc_id")
    )
    assert list(zip(out.doc_id, out.text)) == [
        (1, "a2"),
        (3, "c2"),
        (4, "d"),
        (5, "e"),
    ]


def test_skipgram_pairs_window_and_boundaries(ray_session):
    from vietnamese_ocr_ray.functions.lm import skipgram_pairs

    texts = ["a b c d", "x a"]
    t = pa.table(
        {
            "doc_id": pa.array([0, 1], pa.int64()),
            "text": pa.array(texts),
        }
    )
    out = skipgram_pairs(
        rd.from_arrow(t).repartition(2), window=2, k=100
    ).to_pandas()
    got = {(r.w1, r.w2): r.n for r in out.itertuples()}
    from collections import Counter

    expect = Counter()
    for s in texts:
        toks = s.split()
        for i, c in enumerate(toks):
            for j in range(max(0, i - 2), min(len(toks), i + 3)):
                if j != i:
                    expect[(c, toks[j])] += 1
    assert got == dict(expect)
    # no cross-document pair: 'd' (end of doc 0) never pairs with 'x'
    assert ("d", "x") not in got


def _ssjoin_fixture(seed: int = 7, n: int = 60):
    rng = np.random.default_rng(seed)
    words = [f"w{i}" for i in range(30)]
    texts = []
    for _ in range(n):
        toks = rng.choice(words, size=rng.integers(8, 30)).tolist()
        texts.append(" ".join(toks))
    for i in range(0, 20, 2):  # plant near-dups (one-token edits)
        t = texts[i].split()
        t[rng.integers(0, len(t))] = "zz"
        texts[i + 1] = " ".join(t)
    return texts


def test_ssjoin_pairs_equals_brute_force_and_invariant(ray_session):
    from vietnamese_ocr_ray.functions.dedup import (
        jaccard_shingles_batch,
        ssjoin_pairs,
    )

    texts = _ssjoin_fixture()
    n = len(texts)
    ii, jj = np.triu_indices(n, 1)
    j6 = np.round(
        jaccard_shingles_batch(
            pa.array([texts[i] for i in ii]),
            pa.array([texts[j] for j in jj]),
            8,
        ),
        6,
    )
    hit = j6 >= 0.6
    expect = sorted(zip(ii[hit].tolist(), jj[hit].tolist(), j6[hit].tolist()))
    assert expect, "fixture must plant at least one qualifying pair"

    t = pa.table(
        {"doc_id": pa.array(range(n), pa.int64()), "text": pa.array(texts)}
    )
    for parts in (1, 5):  # partitioning invariance
        out = ssjoin_pairs(
            rd.from_arrow(t).repartition(parts), threshold=0.6
        ).to_pandas()
        got = sorted(zip(out.a.tolist(), out.b.tolist(), out.jaccard.tolist()))
        assert got == expect


def test_ssjoin_pairs_superset_of_minhash(ray_session):
    # the exact join can only ADD pairs LSH banding happened to miss
    from vietnamese_ocr_ray.functions.dedup import (
        minhash_lsh_pairs,
        ssjoin_pairs,
    )

    texts = _ssjoin_fixture(seed=11)
    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts),
        }
    )
    ds = rd.from_arrow(t).repartition(3)
    exact = ssjoin_pairs(ds, threshold=0.6).to_pandas()
    lsh = minhash_lsh_pairs(ds, threshold=0.6).to_pandas()
    exact_set = set(zip(exact.a, exact.b))
    lsh_set = set(zip(lsh.a, lsh.b))
    assert lsh_set <= exact_set


def test_negsample_table_apportionment(ray_session):
    from vietnamese_ocr_ray.functions.lm import negsample_table

    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": pa.array(["a a a a b", "a b c", "c c d"]),
        }
    )
    for parts in (1, 3):  # partitioning invariance (exact ints)
        out = (
            negsample_table(rd.from_arrow(t).repartition(parts), table_size=10)
            .to_pandas()
            .set_index("tok")
        )
        assert out["slots"].sum() == 10
        assert out.loc["a", "n"] == 5 and out.loc["d", "n"] == 1
        # proportionality: slots within 1 of the real-valued share
        n = out["n"].to_numpy(np.float64)
        share = 10 * n**0.75 / (n**0.75).sum()
        assert (np.abs(out["slots"].to_numpy() - share) < 1 + 1e-9).all()
        # ^0.75 flattens the unigram distribution: the top token gets
        # LESS than its raw-frequency share
        assert out.loc["a", "slots"] < 10 * 5 / 9 + 1e-9


def test_readability_syllable_heuristic(ray_session):
    from vietnamese_ocr_ray.functions.text import readability

    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": pa.array(
                [
                    "aeiou bcd",  # 1 run + vowel-less word -> 1 + 1
                    "banana",  # b-a-n-a-n-a: 3 vowel runs
                    "ae ea aea",  # runs split only by spaces: 1+1+1
                ]
            ),
        }
    )
    out = (
        readability(rd.from_arrow(t).repartition(2))
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert out["n_syllables"].tolist() == [2, 3, 3]
    assert out["n_words"].tolist() == [2, 1, 3]
    import math

    for d in (0, 1, 2):
        w, s = out.loc[d, "n_words"], out.loc[d, "n_syllables"]
        exp = round(206.835 - 1.015 * w - 84.6 * (s / w), 6)
        assert math.isclose(out.loc[d, "flesch"], exp, rel_tol=0, abs_tol=0)


def test_scd2_intervals_runs_and_open_interval(ray_session, tmp_path):
    import pandas as pd
    import pyarrow.parquet as pq

    from vietnamese_ocr_ray.pipelines.relational import scd2_intervals

    ts = pa.array(
        pd.to_datetime(
            [
                "2024-01-01 00:00:00",
                "2024-01-01 01:00:00",
                "2024-01-01 02:00:00",
                "2024-01-01 03:00:00",
                "2024-01-01 00:30:00",
            ]
        ).astype("datetime64[us]")
    )
    t = pa.table(
        {
            "event_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
            "ts": ts,
            "user_id": pa.array([1, 1, 1, 1, 2], pa.int64()),
            "event_type": pa.array(["a", "a", "b", "a", "x"]),
            "value": pa.array([0.0] * 5),
            "props": pa.array(["{}"] * 5),
        }
    )
    pq.write_table(t, tmp_path / "events.parquet")
    out = (
        scd2_intervals(str(tmp_path))
        .to_pandas()
        .sort_values(["user_id", "valid_from"])
        .reset_index(drop=True)
    )
    # user 1: runs a(00:00-02:00), b(02:00-03:00), a(03:00-open)
    assert out["event_type"].tolist() == ["a", "b", "a", "x"]
    assert out["valid_to"].isna().tolist() == [False, False, True, True]
    assert str(out.loc[0, "valid_to"]) == "2024-01-01 02:00:00"
    assert str(out.loc[1, "valid_to"]) == "2024-01-01 03:00:00"


def test_copurchase_pairs_baskets(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from vietnamese_ocr_ray.pipelines.relational import copurchase_pairs

    # orders: {1,2,3}, {1,2}, {2} (+ a duplicate line that must not
    # double-count the (1,2) pair in order 10)
    t = pa.table(
        {
            "l_orderkey": pa.array([10, 10, 10, 10, 20, 20, 30], pa.int64()),
            "l_partkey": pa.array([1, 2, 3, 1, 1, 2, 2], pa.int64()),
        }
    )
    pq.write_table(t, tmp_path / "lineitem.parquet")
    out = copurchase_pairs(str(tmp_path), k=10).to_pandas()
    got = {(r.p1, r.p2): r.n for r in out.itertuples()}
    assert got == {(1, 2): 2, (1, 3): 1, (2, 3): 1}
    # top-k ordering: count desc, then (p1, p2)
    assert out.iloc[0][["p1", "p2"]].tolist() == [1, 2]


def test_time_weighted_avg_trapezoid(ray_session, tmp_path):
    import pandas as pd
    import pyarrow.parquet as pq

    from vietnamese_ocr_ray.pipelines.analytics import time_weighted_avg

    # user 1: value 10 for 30s then 20 for 10s -> twa of the trapezoids
    # = (15*30 + 20*10)/40 = 16.25 ; user 2: single event -> dropped
    ts = pa.array(
        pd.to_datetime(
            [
                "2024-01-01 00:00:00",
                "2024-01-01 00:00:30",
                "2024-01-01 00:00:40",
                "2024-01-01 05:00:00",
            ]
        ).astype("datetime64[us]")
    )
    t = pa.table(
        {
            "event_id": pa.array([0, 1, 2, 3], pa.int64()),
            "ts": ts,
            "user_id": pa.array([1, 1, 1, 2], pa.int64()),
            "event_type": pa.array(["a"] * 4),
            "value": pa.array([10.0, 20.0, 20.0, 99.0]),
            "props": pa.array(["{}"] * 4),
        }
    )
    pq.write_table(t, tmp_path / "events.parquet")
    out = time_weighted_avg(str(tmp_path)).to_pandas()
    assert out["user_id"].tolist() == [1]
    assert abs(out.loc[0, "twa"] - 16.25) < 1e-9


def test_key_skew_gini_bounds(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from vietnamese_ocr_ray.pipelines.analytics import key_skew_gini

    # uniform counts -> gini == 0
    t = pa.table({"l_partkey": pa.array([1, 1, 2, 2, 3, 3], pa.int64())})
    pq.write_table(t, tmp_path / "lineitem.parquet")
    out = key_skew_gini(str(tmp_path)).to_pandas()
    assert out.loc[0, "n_keys"] == 3 and out.loc[0, "n_rows"] == 6
    assert out.loc[0, "gini"] == 0.0
    # skewed: counts (1, 9) -> G = (2*(1*1+2*9) - 3*10) / (2*10) = 0.4
    t2 = pa.table(
        {"l_partkey": pa.array([1] + [2] * 9, pa.int64())}
    )
    pq.write_table(t2, tmp_path / "lineitem.parquet")
    out2 = key_skew_gini(str(tmp_path)).to_pandas()
    assert abs(out2.loc[0, "gini"] - 0.4) < 1e-9


def test_cusum_drift_detects_level_shift(ray_session, tmp_path):
    import pandas as pd
    import pyarrow.parquet as pq

    from vietnamese_ocr_ray.pipelines.analytics import cusum_drift

    # 10 quiet hours at 10.0 then 10 shifted hours at 500.0: CUSUM must
    # stay boring early and flag the post-shift hours
    hours = pd.date_range("2024-01-01", periods=20, freq="h").astype(
        "datetime64[us]"
    )
    vals = [10.0] * 10 + [500.0] * 10
    t = pa.table(
        {
            "event_id": pa.array(range(20), pa.int64()),
            "ts": pa.array(hours),
            "user_id": pa.array([1] * 20, pa.int64()),
            "event_type": pa.array(["a"] * 20),
            "value": pa.array(vals),
            "props": pa.array(["{}"] * 20),
        }
    )
    pq.write_table(t, tmp_path / "events.parquet")
    out = (
        cusum_drift(str(tmp_path), thresh_milli=200_000)
        .to_pandas()
        .sort_values("hour")
        .reset_index(drop=True)
    )
    assert len(out) == 20
    # exact closed form: mean=255, so post-shift slope is +245/h scaled
    assert not out.loc[:9, "drift"].any()
    assert out.loc[19, "drift"]
    assert (out["cusum"] >= 0).all()
    # S_t == cumsum(H*x - T) - running-min clipped at 0 (hand value at
    # t=10: C dropped 10*245*H_scale then climbs; first post-shift hour
    # has S = H*(500-255)*1000 = 20*245000)
    assert out.loc[10, "cusum"] == 20 * 245_000


def test_dp_counts_noise_properties(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from vietnamese_ocr_ray.pipelines.analytics import dp_counts

    t = pa.table(
        {
            "event_id": pa.array(range(8), pa.int64()),
            "ts": pa.array(
                np.array(["2024-01-01T00:00:00"] * 8, "datetime64[us]")
            ),
            "user_id": pa.array([1] * 8, pa.int64()),
            "event_type": pa.array(["a"] * 5 + ["b"] * 3),
            "value": pa.array([1.0] * 8),
            "props": pa.array(["{}"] * 8),
        }
    )
    pq.write_table(t, tmp_path / "events.parquet")
    out1 = dp_counts(str(tmp_path)).to_pandas().set_index("event_type")
    out2 = dp_counts(str(tmp_path)).to_pandas().set_index("event_type")
    # deterministic: the same release twice, and milli-quantized
    assert (out1["noisy_n"] == out2["noisy_n"]).all()
    assert out1.loc["a", "n"] == 5 and out1.loc["b", "n"] == 3
    for et in ("a", "b"):
        d = out1.loc[et, "noisy_n"] - out1.loc[et, "n"]
        assert abs(round(d * 1000) - d * 1000) < 1e-6
        assert d != 0.0  # Laplace(b=2) draw of exactly 0 has measure ~0
        assert abs(d) < 40  # tail bound sanity for b=2


def test_value_auc_exact_with_ties(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from vietnamese_ocr_ray.pipelines.analytics import value_auc

    # pos scores {3, 2}, neg {1, 2, 2}: wins = (3>1,3>2,3>2) + (2>1)=4,
    # ties = (2==2)*2 -> AUC = (2*4 + 2)/(2*2*3) = 10/12
    t = pa.table(
        {
            "event_id": pa.array(range(5), pa.int64()),
            "ts": pa.array(
                np.array(["2024-01-01T00:00:00"] * 5, "datetime64[us]")
            ),
            "user_id": pa.array([1] * 5, pa.int64()),
            "event_type": pa.array(
                ["purchase", "purchase", "view", "view", "view"]
            ),
            "value": pa.array([3.0, 2.0, 1.0, 2.0, 2.0]),
            "props": pa.array(["{}"] * 5),
        }
    )
    pq.write_table(t, tmp_path / "events.parquet")
    out = value_auc(str(tmp_path)).to_pandas()
    assert out.loc[0, "n_pos"] == 2 and out.loc[0, "n_neg"] == 3
    assert abs(out.loc[0, "auc"] - round(10 / 12, 6)) < 1e-12


def test_prefix_sum_exclusive_scan(ray_session):
    from vietnamese_ocr_ray.functions.rank import prefix_sum

    t = pa.table(
        {
            "k": pa.array([5, 3, 1, 4, 2], pa.int64()),
            "v": pa.array([10, 20, 30, 40, 50], pa.int64()),
        }
    )
    out = (
        prefix_sum(rd.from_arrow(t).repartition(3), ["k"], "v")
        .to_pandas()
        .sort_values("k")
    )
    # sorted by k: v = [30, 50, 20, 40, 10] -> exclusive prefix
    assert out["prefix"].tolist() == [0, 30, 80, 100, 140]


def test_lorenz_deciles_concentration(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from vietnamese_ocr_ray.pipelines.analytics import lorenz_deciles

    # 10 users with totals 1..10 -> decile i holds user with total i+1;
    # total = 55; cum_share must be the exact partial sums / 55
    rows = []
    for u in range(10):
        rows.extend([(u, 1.0)] * (u + 1))
    t = pa.table(
        {
            "event_id": pa.array(range(len(rows)), pa.int64()),
            "ts": pa.array(
                np.array(["2024-01-01T00:00:00"] * len(rows), "datetime64[us]")
            ),
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "event_type": pa.array(["a"] * len(rows)),
            "value": pa.array([r[1] for r in rows]),
            "props": pa.array(["{}"] * len(rows)),
        }
    )
    pq.write_table(t, tmp_path / "events.parquet")
    out = lorenz_deciles(str(tmp_path)).to_pandas().sort_values("decile")
    assert out["n_users"].tolist() == [1] * 10
    assert out["decile"].tolist() == list(range(10))
    cums = np.cumsum(np.arange(1, 11)) / 55.0
    assert np.allclose(out["cum_share"].to_numpy(), np.round(cums, 6))
    assert out["cum_share"].iloc[-1] == 1.0


def test_hill_tail_index_pareto_recovery(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from vietnamese_ocr_ray.pipelines.analytics import hill_tail_index

    # Pareto(alpha=2) quantile grid: x_i = (1 - i/n)^(-1/2); the Hill
    # estimator over the top decile must land near 1/alpha = 0.5
    n = 2000
    i = np.arange(n)
    x = (1.0 - i / n) ** -0.5
    t = pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "ts": pa.array(np.array(["2024-01-01T00:00:00"] * n, "datetime64[us]")),
            "user_id": pa.array([1] * n, pa.int64()),
            "event_type": pa.array(["a"] * n),
            "value": pa.array(x),
            "props": pa.array(["{}"] * n),
        }
    )
    pq.write_table(t, tmp_path / "events.parquet")
    out = hill_tail_index(str(tmp_path)).to_pandas()
    assert out.loc[0, "k"] == 200
    assert abs(out.loc[0, "hill"] - 0.5) < 0.05


def test_hard_negatives_masks_same_label(ray_session):
    from vietnamese_ocr_ray.functions.ann import hard_negatives

    rng = np.random.default_rng(3)
    n, d = 40, 8
    m = rng.normal(size=(n, d))
    labels = (np.arange(n) % 3).astype(np.int32)
    t = pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array(
                [row.astype(np.float32).tolist() for row in m],
                pa.list_(pa.float32()),
            ),
            "label": pa.array(labels, pa.int32()),
        }
    )
    out = hard_negatives(
        rd.from_arrow(t).repartition(4), k=2, chunk_rows=16
    ).to_pandas()
    lab = {i: int(labels[i]) for i in range(n)}
    # never a same-label neighbor, exactly k per vector
    assert all(lab[r.vec_id] != lab[r.nbr] for r in out.itertuples())
    assert (out.groupby("vec_id").size() == 2).all()
    assert set(out["vec_id"]) == set(range(n))
    # brute-force agreement on the top-1 (round-6 cos DESC, nbr ASC)
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    cos = np.round(mn @ mn.T, 6)
    for v in range(n):
        mask = labels != labels[v]
        cands = sorted(
            ((-(cos[v, j]), j) for j in np.nonzero(mask)[0])
        )
        best = cands[0][1]
        got = out[out.vec_id == v].sort_values(
            ["cos", "nbr"], ascending=[False, True]
        )["nbr"].iloc[0]
        assert got == best


def test_label_centroid_sim_hand_geometry(ray_session, tmp_path, monkeypatch):
    import pyarrow.parquet as pq

    import __ray_entry__ as entry

    d = 4
    vecs = [
        ([1.0, 0.0, 0.0, 0.0], 0),
        ([1.0, 0.0, 0.0, 0.0], 0),
        ([0.0, 1.0, 0.0, 0.0], 1),
        ([1.0, 1.0, 0.0, 0.0], 2),
    ]
    t = pa.table(
        {
            "vec_id": pa.array(range(len(vecs)), pa.int64()),
            "embedding": pa.array(
                [v for v, _ in vecs], pa.list_(pa.float32())
            ),
            "label": pa.array([l for _, l in vecs], pa.int32()),
        }
    )
    pq.write_table(t, tmp_path / "embeddings.parquet")
    out = (
        entry._label_centroid_sim(str(tmp_path), dims=d)
        .to_pandas()
        .set_index(["label_a", "label_b"])
    )
    assert out.loc[(0, 1), "cosine"] == 0.0
    assert abs(out.loc[(0, 2), "cosine"] - round(1 / 2**0.5, 6)) < 1e-6
    assert abs(out.loc[(1, 2), "cosine"] - round(1 / 2**0.5, 6)) < 1e-6


def test_dedup_impact_counts_removed_near_dups(ray_session, tmp_path):
    import pyarrow.parquet as pq

    import __ray_entry__ as entry

    base = "the quick brown fox jumps over the lazy dog " * 4
    texts = [base + f"tail{i}" for i in range(4)]  # near-dup cluster
    rng = np.random.default_rng(5)
    alphabet = list("abcdefghijklmnopqrstuvwxyz")
    texts += [
        " ".join(
            "".join(rng.choice(alphabet, 8)) for _ in range(30)
        )
        for _ in range(4)
    ]
    t = pa.table(
        {
            "doc_id": pa.array(range(8), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * 8),
            "source": pa.array(["dups"] * 4 + ["uniq"] * 4),
            "n_chars": pa.array([len(x) for x in texts], pa.int64()),
        }
    )
    pq.write_table(t, tmp_path / "documents.parquet")
    out = entry._dedup_impact(str(tmp_path)).to_pandas().set_index("source")
    assert out.loc["uniq", "n_kept"] == 4 and out.loc["uniq", "pct_kept"] == 1.0
    assert out.loc["dups", "n_docs"] == 4
    assert out.loc["dups", "n_kept"] == 1  # cluster collapses to min id
    assert abs(out.loc["dups", "pct_kept"] - 0.25) < 1e-9


def test_ngram_novelty_matches_python_reference(ray_session):
    """Per-doc novelty must equal a plain-python df-1 count over
    distinct k-byte shingles (k=8), including the zero-byte padding of
    docs shorter than one shingle, and be partitioning-invariant."""
    from vietnamese_ocr_ray.functions.corpus import ngram_novelty

    shared = "the quick brown fox jumps over it"
    texts = [
        "alpha start " + shared + " end one",
        "beta opening " + shared + " end two",
        "completely unrelated text with zero overlap anywhere",
        "aaaaaaaaaaaaaaaaaaaa",  # one distinct gram, df 1
        "tiny",  # shorter than one shingle -> zero-byte padded gram
        "tiny",  # identical short doc: padded grams collide (df 2)
    ]
    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts),
        }
    )

    k = 8
    per_doc = []
    for s in texts:
        bs = s.encode()
        if len(bs) < k:
            bs = bs + b"\0" * (k - len(bs))  # single zero-padded window
        grams = set()
        for i in range(len(bs) - k + 1):
            h = 0xCBF29CE484222325
            for b in bs[i : i + k]:
                h = ((h ^ b) * 0x100000001B3) % (1 << 64)
            grams.add(h)
        per_doc.append(grams)
    from collections import Counter

    df = Counter(g for grams in per_doc for g in grams)
    for parts in (1, 3):
        out = (
            ngram_novelty(rd.from_arrow(t).repartition(parts))
            .to_pandas()
            .set_index("doc_id")
            .sort_index()
        )
        assert len(out) == len(texts)
        for i, grams in enumerate(per_doc):
            uniq = sum(1 for g in grams if df[g] == 1)
            assert out.loc[i, "n_shingles"] == len(grams)
            assert out.loc[i, "n_unique"] == uniq
            assert out.loc[i, "novelty"] == round(uniq / len(grams), 6)
    # the two identical short docs share their padded gram (df 2)
    assert out.loc[4, "n_unique"] == 0 and out.loc[5, "n_unique"] == 0


def test_kn_bigram_lm_reference(ray_session):
    """Interpolated Kneser-Ney vs a brute-force dict reference on a
    tiny corpus; partitioning-invariant; every p_kn in (0, 1]."""
    from vietnamese_ocr_ray.functions.lm import kn_bigram_lm

    docs = [
        "the cat sat on the mat",
        "the cat ate the fish",
        "the dog sat on the rug",
        "a cat and a dog sat",
        "the cat sat on a mat",
        "the cat sat on the mat again",
    ]
    t = pa.table(
        {
            "doc_id": pa.array(range(len(docs)), pa.int64()),
            "text": pa.array(docs),
        }
    )
    # brute-force reference: dict bigram counts -> KN formula
    from collections import Counter, defaultdict

    big = Counter()
    for d in docs:
        w = d.split(" ")
        for i in range(len(w) - 1):
            big[(w[i], w[i + 1])] += 1
    c1, t1, t2 = Counter(), Counter(), Counter()
    for (w1, w2), n in big.items():
        c1[w1] += n
        t1[w1] += 1
        t2[w2] += 1
    tt = float(sum(t1.values()))
    d = 0.75
    exp = {}
    for (w1, w2), n in big.items():
        if n >= 2:
            exp[(w1, w2)] = round(
                (n - d) / c1[w1] + d * t1[w1] / c1[w1] * (t2[w2] / tt), 6
            )
    for parts in (1, 4):
        out = kn_bigram_lm(
            rd.from_arrow(t).repartition(parts), k=10, min_count=2
        ).to_pandas()
        assert len(out) == min(10, len(exp))
        got = dict(
            zip(zip(out.w1, out.w2), out.p_kn)
        )
        for key, p in got.items():
            assert exp[key] == p, (key, exp[key], p)
        assert ((out.p_kn > 0) & (out.p_kn <= 1)).all()
        # sorted by p_kn desc with (w1, w2) tiebreak
        ordered = sorted(
            got.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        assert list(zip(out.w1, out.w2)) == [k for k, _ in ordered]


def test_zipf_slope_synthetic(ray_session):
    """A corpus built with freq(rank) = round(C / rank) must recover a
    slope near -1; OLS matches a numpy reference bit-for-bit."""
    from vietnamese_ocr_ray.functions.lm import zipf_slope

    # 30 tokens, token i repeated round(600 / rank) times
    words = []
    for i in range(1, 31):
        words += [f"w{i:02d}"] * round(600 / i)
    # spread across docs deterministically
    docs = [" ".join(words[i::7]) for i in range(7)]
    t = pa.table(
        {
            "doc_id": pa.array(range(len(docs)), pa.int64()),
            "text": pa.array(docs),
        }
    )
    # numpy reference with the same micro-nat quantization
    freq = np.array(sorted((round(600 / i) for i in range(1, 31)),
                           reverse=True), dtype=np.int64)
    rank = np.arange(1, 31, dtype=np.int64)
    x = np.round(np.log(rank.astype(np.float64)) * 1e6).astype(np.int64)
    y = np.round(np.log(freq.astype(np.float64)) * 1e6).astype(np.int64)
    n = 30
    num = n * int((x * y).sum()) - int(x.sum()) * int(y.sum())
    den = n * int((x * x).sum()) - int(x.sum()) ** 2
    want = round(float(num) / float(den), 6)
    for parts in (1, 3):
        out = zipf_slope(
            rd.from_arrow(t).repartition(parts), top_n=30
        ).to_pandas()
        assert out.n_points[0] == 30
        assert out.slope[0] == want
        assert -1.1 < out.slope[0] < -0.9


def test_heaps_law_reference(ray_session):
    """Brute-force dict reference on a corpus with controlled novelty:
    each doc introduces i new tokens plus old filler — checkpoints and
    beta must match exactly, for any partitioning."""
    from vietnamese_ocr_ray.functions.lm import heaps_law

    rng = np.random.RandomState(7)
    docs, uid = [], 0
    for i in range(20):
        new = [f"n{uid + j}" for j in range(1 + i % 3)]
        uid += len(new)
        old = [f"n{rng.randint(0, max(uid, 1))}" for _ in range(4)]
        docs.append(" ".join(new + old))
    t = pa.table(
        {
            "doc_id": pa.array(range(20), pa.int64()),
            "text": pa.array(docs),
        }
    )
    # brute force
    first = {}
    for d, txt in enumerate(docs):
        for w in txt.split(" "):
            first.setdefault(w, d)
    mn, mx = 0, 19
    span = mx - mn + 1
    n_docs = np.cumsum(
        np.bincount([(d - mn) * 10 // span for d in range(20)], minlength=10)
    )
    vocab = np.cumsum(
        np.bincount(
            [(fd - mn) * 10 // span for fd in first.values()], minlength=10
        )
    )
    x = np.round(np.log(n_docs.astype(np.float64)) * 1e6).astype(np.int64)
    y = np.round(np.log(vocab.astype(np.float64)) * 1e6).astype(np.int64)
    num = 10 * int((x * y).sum()) - int(x.sum()) * int(y.sum())
    den = 10 * int((x * x).sum()) - int(x.sum()) ** 2
    beta = round(float(num) / float(den), 6)
    for parts in (1, 4):
        out = (
            heaps_law(rd.from_arrow(t).repartition(parts))
            .to_pandas()
            .sort_values("checkpoint")
            .reset_index(drop=True)
        )
        assert list(out.n_docs) == list(n_docs)
        assert list(out.vocab) == list(vocab)
        assert (out.beta == beta).all()
        assert beta > 0  # growing vocabulary (values checked exactly above)


def test_bloom_semijoin_audit(ray_session):
    """No false negatives ever; candidate set matches a direct
    BloomFilter replay; exact match count equals np.isin; invariant
    under partitioning."""
    from vietnamese_ocr_ray.functions.membership import (
        BloomFilter,
        bloom_semijoin_audit,
    )

    rng = np.random.RandomState(3)
    probe_vals = rng.randint(0, 5000, size=4000).astype(np.int64)
    keys = np.unique(rng.randint(0, 5000, size=300).astype(np.int64))
    t = pa.table({"k": pa.array(probe_vals)})
    m = 1 << int(8 * len(keys) - 1).bit_length()
    bf = BloomFilter(len(keys), m=m, k=2)
    bf.add(keys)
    want_cand = int(bf.contains(probe_vals).sum())
    want_match = int(np.isin(probe_vals, keys).sum())
    for parts in (1, 4):
        out = bloom_semijoin_audit(
            rd.from_arrow(t).repartition(parts), keys, "k"
        ).to_pandas()
        assert out.n_probed[0] == 4000
        assert out.n_build_keys[0] == len(keys)
        assert out.m_bits[0] == m
        assert out.n_candidates[0] == want_cand
        assert out.n_matches[0] == want_match  # no false negatives
        assert out.n_false_positives[0] == want_cand - want_match
        assert out.fp_rate[0] == round(
            float(want_cand - want_match) / float(4000 - want_match), 6
        )


def test_ewma_value_reference(ray_session, tmp_path):
    """Trailing-16 alpha=1/2 EWMA vs a plain-python weighted reference;
    short prefixes normalize over the rows present; two users do not
    bleed into each other."""
    import pyarrow.parquet as pq

    from vietnamese_ocr_ray.pipelines.relational import ewma_value

    vals = [1.0, 2.0, 4.0, 8.0, 1.5]
    t = pa.table(
        {
            "event_id": pa.array(range(10), pa.int64()),
            "user_id": pa.array([7] * 5 + [9] * 5, pa.int64()),
            "ts": pa.array(
                [np.datetime64("2025-01-01", "us") + np.timedelta64(i, "m")
                 for i in range(10)],
                pa.timestamp("us"),
            ),
            "value": pa.array(vals + vals[::-1], pa.float64()),
        }
    )
    pq.write_table(t, str(tmp_path / "events.parquet"))
    out = (
        ewma_value(str(tmp_path))
        .to_pandas()
        .sort_values("event_id")["ewma"]
        .to_list()
    )

    def ref(series):
        res = []
        for i in range(len(series)):
            lags = series[max(0, i - 15) : i + 1][::-1]
            num = sum(int(v * 1000) << (15 - j) for j, v in enumerate(lags))
            den = (1 << 16) - (1 << (16 - len(lags)))
            res.append(round(num / (den * 1000.0), 6))
        return res

    assert out == ref(vals) + ref(vals[::-1])
    # most recent row dominates: ewma closer to the last value than the mean
    assert abs(out[3] - 8.0) < abs(np.mean(vals[:4]) - 8.0)


def test_source_overlap_matrix_reference(ray_session):
    """Brute-force shingle-set reference on a tiny planted corpus:
    sources A/B share one sentence, C is disjoint; Jaccard and counts
    exact for any partitioning."""
    from vietnamese_ocr_ray.functions.corpus import source_overlap_matrix

    shared = "the quick brown fox jumps over it"
    docs = [
        (0, shared + " alpha alpha alpha", "A"),
        (1, "completely different words here today", "A"),
        (2, shared + " beta beta beta", "B"),
        (3, "zzz yyy xxx www vvv uuu ttt sss", "C"),
    ]
    t = pa.table(
        {
            "doc_id": pa.array([d[0] for d in docs], pa.int64()),
            "text": pa.array([d[1] for d in docs]),
            "source": pa.array([d[2] for d in docs]),
        }
    )

    def grams(txt):
        return {
            txt[i : i + 8] for i in range(max(len(txt) - 7, 1))
        }

    sets = {}
    for _, txt, s in docs:
        sets.setdefault(s, set()).update(grams(txt))
    for parts in (1, 3):
        out = (
            source_overlap_matrix(rd.from_arrow(t).repartition(parts))
            .to_pandas()
            .set_index(["source_a", "source_b"])
        )
        for a, b in (("A", "B"), ("A", "C"), ("B", "C")):
            inter = len(sets[a] & sets[b])
            if inter == 0:
                assert (a, b) not in out.index
                continue
            row = out.loc[(a, b)]
            assert row.n_shared == inter
            assert row.n_a == len(sets[a]) and row.n_b == len(sets[b])
            assert row.jaccard == round(
                inter / (len(sets[a]) + len(sets[b]) - inter), 6
            )
        assert out.loc[("A", "B")].n_shared > 0


def test_rrf_fuse_semantics(ray_session):
    """RRF: a doc ranked #1 by both systems beats a doc ranked #1 by
    one and absent from the other; scores are the exact reciprocal
    sums; partitioning-invariant."""
    from vietnamese_ocr_ray.functions.text import rrf_fuse

    docs = [
        (0, "spark dup spark dup spark dup spark"),    # top of both
        (1, "spark spark spark spark other words"),    # high tf
        (2, "dup other filler filler filler filler"),  # low
        (3, "nothing matching here at all words"),     # absent
    ]
    t = pa.table(
        {
            "doc_id": pa.array([d[0] for d in docs], pa.int64()),
            "text": pa.array([d[1] for d in docs]),
        }
    )
    for parts in (1, 2):
        out = (
            rrf_fuse(rd.from_arrow(t).repartition(parts), pool=3, k=4)
            .to_pandas()
            .reset_index(drop=True)
        )
        assert 3 not in set(out.doc_id)
        assert out.doc_id[0] == 0  # consensus winner
        top = out.iloc[0]
        assert top.rrf == round(
            1.0 / (60 + top.rank_bm25) + 1.0 / (60 + top.rank_tf), 6
        )
        # every fused score is the reciprocal sum of its own ranks
        for _, r in out.iterrows():
            want = (1.0 / (60 + r.rank_bm25) if r.rank_bm25 else 0.0) + (
                1.0 / (60 + r.rank_tf) if r.rank_tf else 0.0
            )
            assert r.rrf == round(want, 6)
        # monotone: scores non-increasing
        assert (np.diff(out.rrf.to_numpy()) <= 0).all()


def test_assortativity_known_graphs(ray_session):
    """A star graph is maximally disassortative (r -> -1); values
    match a networkx-style Pearson reference computed by hand; any
    partitioning."""
    from vietnamese_ocr_ray.functions.graph import assortativity

    def run(edges, parts):
        t = pa.table(
            {
                "vec_id_a": pa.array([e[0] for e in edges], pa.int64()),
                "vec_id_b": pa.array([e[1] for e in edges], pa.int64()),
            }
        )
        return (
            assortativity(rd.from_arrow(t).repartition(parts))
            .to_pandas()
            .iloc[0]
        )

    def ref(edges):
        from collections import Counter

        d = Counter()
        for a, b in edges:
            d[a] += 1
            d[b] += 1
        xs, ys = [], []
        for a, b in edges:
            xs += [d[a], d[b]]
            ys += [d[b], d[a]]
        n = len(xs)
        sx, sxy = sum(xs), sum(x * y for x, y in zip(xs, ys))
        sxx = sum(x * x for x in xs)
        den = n * sxx - sx * sx
        return round(float(n * sxy - sx * sx) / float(den), 6) if den else 0.0

    star = [(0, i) for i in range(1, 6)]
    for parts in (1, 3):
        row = run(star, parts)
        assert row.n_edges == 5
        assert row.assortativity == ref(star) == -1.0
    # two disjoint triangles: regular graph -> convention 0.0
    tri2 = [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5)]
    assert run(tri2, 2).assortativity == 0.0
    # a path: mildly disassortative, matches reference
    path = [(0, 1), (1, 2), (2, 3), (3, 4)]
    assert run(path, 2).assortativity == ref(path)


def test_transitivity_known_graphs(ray_session):
    """Triangle = 1.0; star = 0.0 (wedges, no closure); triangle with
    a pendant = 3/5; empty edge set returns the zero row."""
    from vietnamese_ocr_ray.functions.graph import transitivity

    def run(edges, parts=2):
        t = pa.table(
            {
                "vec_id_a": pa.array([e[0] for e in edges], pa.int64()),
                "vec_id_b": pa.array([e[1] for e in edges], pa.int64()),
            }
        )
        return (
            transitivity(rd.from_arrow(t).repartition(parts))
            .to_pandas()
            .iloc[0]
        )

    row = run([(0, 1), (1, 2), (0, 2)])
    assert (row.n_triangles, row.n_wedges, row.transitivity) == (1, 3, 1.0)
    row = run([(0, i) for i in range(1, 5)])
    assert (row.n_triangles, row.transitivity) == (0, 0.0)
    row = run([(0, 1), (1, 2), (0, 2), (2, 3)])
    assert row.n_triangles == 1 and row.n_wedges == 5
    assert row.transitivity == round(3.0 * 1 / 5.0, 6)
    empty = pa.table(
        {
            "vec_id_a": pa.array([], pa.int64()),
            "vec_id_b": pa.array([], pa.int64()),
        }
    )
    row = transitivity(rd.from_arrow(empty)).to_pandas().iloc[0]
    assert (row.n_triangles, row.n_wedges, row.transitivity) == (0, 0, 0.0)


def test_datasheet_by_source(ray_session, tmp_path):
    """Planted corpus: source A has an exact dup PAIR (both rows count
    as dups), one of them duplicated ACROSS sources so B's single copy
    counts too; vocab / token / lang fields exact."""
    import pyarrow.parquet as pq

    from vietnamese_ocr_ray.pipelines.analytics import datasheet_by_source

    rows = [
        (0, "aa bb cc", "en", "A", 8),
        (1, "aa bb cc", "en", "A", 8),   # dup of 0 (within A)
        (2, "dd ee", "fr", "A", 5),
        (3, "aa bb cc", "en", "B", 8),   # cross-source copy
        (4, "ff gg hh ii", "en", "B", 11),
    ]
    t = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows]),
            "lang": pa.array([r[2] for r in rows]),
            "source": pa.array([r[3] for r in rows]),
            "n_chars": pa.array([r[4] for r in rows], pa.int64()),
        }
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    out = (
        datasheet_by_source(str(tmp_path))
        .to_pandas()
        .set_index("source")
    )
    a, b = out.loc["A"], out.loc["B"]
    assert (a.n_docs, a.n_tokens, a.n_chars) == (3, 8, 21)
    assert a.n_distinct_tokens == 5  # aa bb cc dd ee
    assert a.n_langs == 2
    assert a.n_exact_dup_docs == 2  # both copies of the dup pair
    assert a.avg_tokens == round(8 / 3, 6)
    assert a.dup_frac == round(2 / 3, 6)
    assert (b.n_docs, b.n_exact_dup_docs) == (2, 1)  # cross-source copy
    assert b.n_distinct_tokens == 7 and b.n_langs == 1


def test_nation_trade_matrix(ray_session, tmp_path):
    """Two-join flow on hand-built tables: one lineitem each for
    (suppA->custB) and (suppB->custA); exact cent arithmetic."""
    import pyarrow.parquet as pq

    from vietnamese_ocr_ray.pipelines.relational import nation_trade_matrix

    pq.write_table(
        pa.table(
            {
                "n_nationkey": pa.array([0, 1], pa.int64()),
                "n_name": pa.array(["ALPHA", "BETA"]),
            }
        ),
        str(tmp_path / "nation.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "s_suppkey": pa.array([10, 11], pa.int64()),
                "s_nationkey": pa.array([0, 1], pa.int64()),
            }
        ),
        str(tmp_path / "supplier.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array([20, 21], pa.int64()),
                "c_nationkey": pa.array([0, 1], pa.int64()),
            }
        ),
        str(tmp_path / "customer.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array([1, 2], pa.int64()),
                "o_custkey": pa.array([21, 20], pa.int64()),
            }
        ),
        str(tmp_path / "orders.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array([1, 1, 2], pa.int64()),
                "l_suppkey": pa.array([10, 10, 11], pa.int64()),
                "l_extendedprice": pa.array([100.00, 50.00, 10.00]),
                "l_discount": pa.array([0.10, 0.00, 0.05]),
            }
        ),
        str(tmp_path / "lineitem.parquet"),
    )
    out = (
        nation_trade_matrix(str(tmp_path))
        .to_pandas()
        .set_index(["supp_nation", "cust_nation"])
    )
    ab = out.loc[("ALPHA", "BETA")]
    # 100*0.9 + 50*1.0 = 140.00 exactly in cent units
    assert ab.n_items == 2 and ab.revenue == 10000 * 90 / 10000.0 + 5000 * 100 / 10000.0
    ba = out.loc[("BETA", "ALPHA")]
    assert ba.n_items == 1 and ba.revenue == 1000 * 95 / 10000.0
    assert len(out) == 2  # no same-nation flows in this fixture


def test_containment_pairs_planted(ray_session):
    """A short doc embedded verbatim in a long doc: containment 1.0
    even though Jaccard is low; brute-force containment over all pairs
    agrees; complete for any partitioning."""
    from vietnamese_ocr_ray.functions.dedup import (
        containment_pairs,
        ssjoin_pairs,
    )

    short = "the quick brown fox jumps over the lazy dog tonight"
    long = (
        "prologue words of a much longer document here " + short +
        " and a very large amount of trailing content follows with many"
        " extra tokens stretching the union far beyond the short one"
    )
    other = "completely unrelated text about databases and shuffles"
    docs = [short, long, other, "another unrelated filler document text"]
    t = pa.table(
        {
            "doc_id": pa.array(range(len(docs)), pa.int64()),
            "text": pa.array(docs),
        }
    )

    def grams(txt, k=8):
        return {txt[i : i + k] for i in range(max(len(txt) - k + 1, 1))}

    sets = [grams(d) for d in docs]
    want = {}
    for i in range(len(docs)):
        for j in range(i + 1, len(docs)):
            inter = len(sets[i] & sets[j])
            mn = min(len(sets[i]), len(sets[j]))
            c = round(inter / mn, 6)
            if c >= 0.9:
                want[(i, j)] = (inter, len(sets[i]), len(sets[j]), c)
    assert (0, 1) in want  # the planted embedding
    for parts in (1, 3):
        out = containment_pairs(
            rd.from_arrow(t).repartition(parts), threshold=0.9
        ).to_pandas()
        got = {
            (r.a, r.b): (r.n_inter, r.n_a, r.n_b, r.containment)
            for r in out.itertuples()
        }
        assert got == want
    # Jaccard at the same bar misses the embedded pair
    j = ssjoin_pairs(rd.from_arrow(t), threshold=0.9).to_pandas()
    assert (0, 1) not in set(zip(j.a, j.b)) if len(j) else True


def test_containment_pairs_brute_force_random(ray_session):
    """Randomized corpus: engine output == brute-force containment
    (completeness of the prefix-filter candidate rule)."""
    from vietnamese_ocr_ray.functions.dedup import containment_pairs

    rng = np.random.RandomState(11)
    vocab = [f"w{i}" for i in range(30)]
    docs = []
    for i in range(40):
        n = rng.randint(6, 20)
        docs.append(" ".join(rng.choice(vocab, size=n)))
    # plant a few containments
    docs[7] = docs[3][: len(docs[3]) // 2]
    docs[19] = docs[12]
    t = pa.table(
        {
            "doc_id": pa.array(range(len(docs)), pa.int64()),
            "text": pa.array(docs),
        }
    )

    def grams(txt, k=8):
        return {txt[i : i + k] for i in range(max(len(txt) - k + 1, 1))}

    sets = [grams(d) for d in docs]
    want = set()
    for i in range(len(docs)):
        for j in range(i + 1, len(docs)):
            inter = len(sets[i] & sets[j])
            if round(inter / min(len(sets[i]), len(sets[j])), 6) >= 0.8:
                want.add((i, j))
    out = containment_pairs(
        rd.from_arrow(t).repartition(4), threshold=0.8
    ).to_pandas()
    assert set(zip(out.a, out.b)) == want


def test_time_split_leakage(ray_session, tmp_path):
    """Hand-built timeline: user 1 only before the cut, user 2 only
    after, user 3 on both sides -> 1 leaked of min(2, 2)."""
    import pyarrow.parquet as pq

    from vietnamese_ocr_ray.pipelines.analytics import time_split_leakage

    def ts(h):
        return np.datetime64("2025-01-01", "us") + np.timedelta64(h, "h")

    rows = [(1, ts(0)), (1, ts(1)), (2, ts(9)), (3, ts(1)), (3, ts(10))]
    t = pa.table(
        {
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        }
    )
    pq.write_table(t, str(tmp_path / "events.parquet"))
    out = time_split_leakage(str(tmp_path)).to_pandas().iloc[0]
    # range [0h, 10h] -> cutoff at 5h
    assert out.n_train_users == 2   # users 1, 3
    assert out.n_test_users == 2    # users 2, 3
    assert out.n_leaked_users == 1  # user 3
    assert out.leak_frac == 0.5


def test_zscore_outliers_planted(ray_session):
    """A vector pushed 10 sigma out on one dim tops the list; z2
    matches a numpy reference computed with the same exact-moment
    mu/sd and sequential accumulation."""
    from vietnamese_ocr_ray.functions.ann import zscore_outliers

    rng = np.random.RandomState(5)
    X = rng.normal(0, 1, size=(50, 4))
    X[17] = [9.0, -9.0, 9.0, -9.0]  # the outlier
    t = pa.table(
        {
            "vec_id": pa.array(range(50), pa.int64()),
            "embedding": pa.array(
                [list(map(float, r)) for r in X],
                pa.list_(pa.float64()),
            ),
        }
    )
    q = np.round(X * 1_000_000).astype(np.int64)
    n = 50
    mu = np.array([float(int(q[:, i].sum())) / n for i in range(4)])
    sd = np.array(
        [
            np.sqrt(
                float(n * int((q[:, i] * q[:, i]).sum()) - int(q[:, i].sum()) ** 2)
                / float(n * (n - 1))
            )
            for i in range(4)
        ]
    )
    acc = np.zeros(n)
    for i in range(4):
        d = (q[:, i].astype(np.float64) - mu[i]) / sd[i]
        acc = acc + d * d
    want = np.round(acc, 6)
    order = np.lexsort((np.arange(n), -want))[:5]
    for parts in (1, 4):
        out = (
            zscore_outliers(rd.from_arrow(t).repartition(parts), k=5)
            .to_pandas()
            .reset_index(drop=True)
        )
        assert out.vec_id[0] == 17
        assert list(out.vec_id) == list(order)
        assert list(out.z2) == [want[i] for i in order]


def test_containment_survivors_drop_rule(ray_session):
    """The contained (smaller) doc drops, the container survives;
    equal-size pairs drop the larger id; untouched docs pass through."""
    from vietnamese_ocr_ray.functions.dedup import containment_survivors

    pairs = pa.table(
        {
            "a": pa.array([1, 5], pa.int64()),
            "b": pa.array([2, 6], pa.int64()),
            "n_a": pa.array([10, 7], pa.int64()),
            "n_b": pa.array([50, 7], pa.int64()),
        }
    )
    docs = pa.table({"doc_id": pa.array([1, 2, 3, 5, 6], pa.int64())})
    out = containment_survivors(
        rd.from_arrow(docs).repartition(2), rd.from_arrow(pairs)
    ).to_pandas()
    # 1 contained in 2 -> drop 1; 5/6 equal size -> drop 6 (larger id)
    assert sorted(out.doc_id) == [2, 3, 5]
    # empty pair set: corpus unchanged
    empty = pa.table(
        {
            "a": pa.array([], pa.int64()),
            "b": pa.array([], pa.int64()),
            "n_a": pa.array([], pa.int64()),
            "n_b": pa.array([], pa.int64()),
        }
    )
    out = containment_survivors(
        rd.from_arrow(docs), rd.from_arrow(empty)
    ).to_pandas()
    assert sorted(out.doc_id) == [1, 2, 3, 5, 6]


def test_cms_join_size_one_sided(ray_session):
    """Estimate never undercounts; exact size matches the per-key
    product sum; a direct CountMinSketch inner-product reference
    agrees bit-for-bit; partitioning-invariant."""
    from vietnamese_ocr_ray.functions.joins import _mix64
    from vietnamese_ocr_ray.functions.sketch import (
        CountMinSketch,
        cms_join_size,
    )

    rng = np.random.RandomState(9)
    ka = rng.randint(0, 200, size=3000).astype(np.int64)  # skewed-ish
    kb = rng.randint(0, 300, size=2000).astype(np.int64)
    ta = pa.table({"k": pa.array(ka)})
    tb = pa.table({"k": pa.array(kb)})
    from collections import Counter

    ca, cb = Counter(ka.tolist()), Counter(kb.tolist())
    exact = sum(ca[u] * cb[u] for u in ca if u in cb)
    # reference CMS inner product
    A, B = CountMinSketch(), CountMinSketch()
    ua, na = np.unique(ka, return_counts=True)
    ub, nb = np.unique(kb, return_counts=True)
    A.add_hashes(_mix64(ua), na)
    B.add_hashes(_mix64(ub), nb)
    ref_est = min(
        int((A.table[d] * B.table[d]).sum()) for d in range(A.depth)
    )
    for parts in (1, 4):
        out = cms_join_size(
            rd.from_arrow(ta).repartition(parts),
            rd.from_arrow(tb).repartition(parts),
            "k",
        ).to_pandas().iloc[0]
        assert out.exact_size == exact
        assert out.est_size == ref_est
        assert out.est_size >= exact  # one-sided
        assert out.overestimate == ref_est - exact
        assert out.rel_error == round((ref_est - exact) / exact, 6)


def test_kcenter_select_greedy_reference(ray_session):
    """Farthest-point greedy vs a brute-force reference on planted
    clusters: the first k centers hit distinct clusters before any
    repeats; exact integer distances; partitioning-invariant."""
    from vietnamese_ocr_ray.functions.ann import kcenter_select

    rng = np.random.RandomState(2)
    centers = np.array([[0.0, 0.0], [10.0, 0.0], [0.0, 10.0], [10.0, 10.0]])
    X = np.vstack(
        [c + rng.normal(0, 0.1, size=(10, 2)) for c in centers]
    )
    t = pa.table(
        {
            "vec_id": pa.array(range(40), pa.int64()),
            "embedding": pa.array(
                [list(map(float, r)) for r in X], pa.list_(pa.float64())
            ),
        }
    )
    q = np.round(X * 1_000_000).astype(np.int64)

    def ref(kk):
        chosen = [0]  # min vec_id
        out = [(0, 0, 0)]
        for r in range(1, kk):
            best = None
            for i in range(40):
                if i in chosen:
                    continue
                mind = min(
                    int(((q[i] - q[c]) ** 2).sum()) for c in chosen
                )
                cand = (-mind, i)
                if best is None or cand < best:
                    best = cand
            chosen.append(best[1])
            out.append((r, best[1], -best[0]))
        return out

    want = ref(4)
    for parts in (1, 4):
        got = (
            kcenter_select(rd.from_arrow(t).repartition(parts), k=4)
            .to_pandas()
            .sort_values("round")
        )
        assert [tuple(r) for r in got.to_numpy()] == want
    # the 4 selected points cover all 4 planted clusters
    cluster = [i // 10 for _, v, _ in want for i in [v]]
    assert len(set(cluster)) == 4


def test_source_epochs_recipe(ray_session):
    """sqrt-temperature apportionment: the small source gets MORE
    epochs than the big one; cap binds when target >> tokens; exact
    integer targets match a python reference."""
    from vietnamese_ocr_ray.functions.sampling import source_epochs

    docs = (
        [("big", "a b c d e f g h")] * 50
        + [("small", "x y")] * 2
    )
    t = pa.table(
        {
            "doc_id": pa.array(range(len(docs)), pa.int64()),
            "text": pa.array([d[1] for d in docs]),
            "source": pa.array([d[0] for d in docs]),
        }
    )
    out = (
        source_epochs(rd.from_arrow(t).repartition(3))
        .to_pandas()
        .set_index("source")
    )
    n = {"big": 400, "small": 4}
    w = {s: np.sqrt(float(v)) for s, v in n.items()}
    tw = w["big"] + w["small"]  # name order: big, small
    ppm = {s: int(np.floor(1e6 * w[s] / tw + 0.5)) for s in n}
    budget = 2 * 404
    for s in n:
        tgt = budget * ppm[s] // 1_000_000
        assert out.loc[s].n_tokens == n[s]
        assert out.loc[s].weight_ppm == ppm[s]
        assert out.loc[s].target_tokens == tgt
        assert out.loc[s].epochs == round(min(4.0, tgt / n[s]), 6)
    assert out.loc["small"].epochs > out.loc["big"].epochs
    assert out.loc["small"].epochs == 4.0  # cap binds


def test_cohort_ltv(ray_session, tmp_path):
    """Two cohorts on a hand-built timeline: purchase value lands in
    the right (cohort, offset) cell; activity-only weeks appear with
    zero revenue; the cumulative column accumulates per cohort."""
    import pyarrow.parquet as pq

    from vietnamese_ocr_ray.pipelines.relational import cohort_ltv

    def ts(day):
        # 2025-01-06 is a Monday
        return np.datetime64("2025-01-06", "us") + np.timedelta64(day, "D")

    rows = [
        (1, ts(0), "purchase", 10.0),   # cohort W0, offset 0
        (1, ts(8), "click", 0.0),       # W1 activity, no revenue
        (1, ts(15), "purchase", 2.5),   # W2, offset 2
        (2, ts(7), "purchase", 7.0),    # cohort W1, offset 0
    ]
    t = pa.table(
        {
            "event_id": pa.array(range(4), pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "event_type": pa.array([r[2] for r in rows]),
            "value": pa.array([r[3] for r in rows], pa.float64()),
        }
    )
    pq.write_table(t, str(tmp_path / "events.parquet"))
    out = (
        cohort_ltv(str(tmp_path))
        .to_pandas()
        .set_index(["cohort_day", "week_offset"])
        .sort_index()
    )
    w0 = int(np.datetime64("2025-01-06").astype("datetime64[D]").astype(int))
    assert out.loc[(w0, 0)].revenue == 10.0
    assert out.loc[(w0, 1)].revenue == 0.0       # activity, no purchase
    assert out.loc[(w0, 2)].revenue == 2.5
    assert out.loc[(w0, 2)].cum_revenue == 12.5  # cumulative
    assert out.loc[(w0 + 7, 0)].revenue == 7.0   # user 2's cohort
    assert len(out) == 4


def test_shuffle_autocorr_detects_clumping(ray_session):
    """The hash shuffle of a source-sorted corpus lands near
    clump_ratio ~ 1 (well mixed); the counts match a direct replay of
    the shard order; a single-source corpus degenerates to ratio 1."""
    from vietnamese_ocr_ray.functions.batching import shuffle_autocorr
    from vietnamese_ocr_ray.functions.sampling import _mixed_hash, _poly_hash

    n = 400
    sources = ["A"] * (n // 2) + ["B"] * (n // 2)  # maximally sorted input
    t = pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "source": pa.array(sources),
        }
    )
    out = shuffle_autocorr(rd.from_arrow(t).repartition(4)).to_pandas().iloc[0]
    # direct replay of the shard order
    keys = pa.array([f"shard:{i}" for i in range(n)])
    h = _mixed_hash(_poly_hash(keys))
    import pandas as pd

    df = pd.DataFrame(
        {"doc_id": range(n), "source": sources, "shard": h % 8, "h": h}
    ).sort_values(["shard", "h", "doc_id"])
    same = pairs = 0
    for _, g in df.groupby("shard"):
        src = g["source"].to_numpy()
        pairs += len(src) - 1
        same += int((src[1:] == src[:-1]).sum())
    assert out.n_pairs == pairs and out.n_same_source == same
    # hash shuffle destroys the sorted-input correlation
    assert 0.5 < out.clump_ratio < 1.5
    # degenerate: one source -> observed == expected == 1
    t1 = pa.table(
        {
            "doc_id": pa.array(range(50), pa.int64()),
            "source": pa.array(["only"] * 50),
        }
    )
    row = shuffle_autocorr(rd.from_arrow(t1)).to_pandas().iloc[0]
    assert row.clump_ratio == 1.0


def test_time_to_convert(ray_session, tmp_path):
    """First-signup -> first-subsequent-purchase semantics: purchases
    BEFORE the signup don't count; the first qualifying purchase
    defines the delay; non-converters are excluded."""
    import pyarrow.parquet as pq

    from vietnamese_ocr_ray.pipelines.relational import time_to_convert

    def ts(d, h=0):
        return (
            np.datetime64("2025-02-01", "us")
            + np.timedelta64(d, "D")
            + np.timedelta64(h, "h")
        )

    rows = [
        (1, ts(0), "signup"), (1, ts(2, 5), "purchase"),   # 2 days
        (2, ts(0), "purchase"),                            # pre-signup
        (2, ts(1), "signup"), (2, ts(1, 3), "purchase"),   # 0 days
        (3, ts(0), "signup"),                              # never converts
        (4, ts(5), "purchase"),                            # never signs up
    ]
    t = pa.table(
        {
            "event_id": pa.array(range(len(rows)), pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "event_type": pa.array([r[2] for r in rows]),
            "value": pa.array([1.0] * len(rows), pa.float64()),
        }
    )
    pq.write_table(t, str(tmp_path / "events.parquet"))
    out = (
        time_to_convert(str(tmp_path))
        .to_pandas()
        .set_index("delay_days")
    )
    assert out.loc[2].n_users == 1  # user 1
    assert out.loc[0].n_users == 1  # user 2 (pre-signup purchase ignored)
    assert len(out) == 2
    assert out.share.sum() == 1.0


def test_label_propagation_semantics(ray_session):
    """Hand-built graph: seeds clamp, one hop labels in round 1, two
    hops in round 2, majority tie breaks to the smaller label,
    disconnected nodes stay unlabeled."""
    from vietnamese_ocr_ray.functions.graph import label_propagation

    # chain 0-1-2; node 3 adjacent to seeds 0 (label 7) and 4 (label 3)
    edges = [(0, 1), (1, 2), (0, 3), (3, 4), (9, 10)]
    pairs = pa.table(
        {
            "vec_id_a": pa.array([e[0] for e in edges], pa.int64()),
            "vec_id_b": pa.array([e[1] for e in edges], pa.int64()),
        }
    )
    seeds = pa.table(
        {
            "vec_id": pa.array([0, 4], pa.int64()),
            "label": pa.array([7, 3], pa.int64()),
        }
    )
    out = (
        label_propagation(rd.from_arrow(pairs).repartition(2), seeds)
        .to_pandas()
        .set_index("vec_id")
    )
    assert out.loc[0].label_pred == 7 and out.loc[0].round_assigned == 0
    assert out.loc[1].label_pred == 7 and out.loc[1].round_assigned == 1
    assert out.loc[2].label_pred == 7 and out.loc[2].round_assigned == 2
    # node 3: one vote each from labels 7 and 3 -> tie -> smaller label
    assert out.loc[3].label_pred == 3 and out.loc[3].round_assigned == 1
    assert 9 not in out.index and 10 not in out.index  # unreachable


def test_theilsen_robust_to_outlier_hour(ray_session, tmp_path):
    """A clean slope-2 line over 6 hours with ONE poisoned hour: the
    Theil-Sen slope stays 2.0 (OLS would move); values match the
    median-of-slopes reference."""
    import pyarrow.parquet as pq

    from vietnamese_ocr_ray.pipelines.relational import theilsen_value_hour

    rows = []
    for h in range(6):
        v = 1.0 + 2.0 * h if h != 3 else 500.0  # poisoned hour 3
        rows.append((h, v))
    t = pa.table(
        {
            "event_id": pa.array(range(6), pa.int64()),
            "ts": pa.array(
                [np.datetime64("2025-01-01", "us") + np.timedelta64(h, "h")
                 for h, _ in rows],
                pa.timestamp("us"),
            ),
            "event_type": pa.array(["x"] * 6),
            "value": pa.array([v for _, v in rows], pa.float64()),
        }
    )
    pq.write_table(t, str(tmp_path / "events.parquet"))
    out = theilsen_value_hour(str(tmp_path)).to_pandas().iloc[0]
    m = np.array([v for _, v in rows])
    hrs = np.arange(6)
    i, j = np.triu_indices(6, 1)
    slopes = np.sort((m[j] - m[i]) / (hrs[j] - hrs[i]))
    n = len(slopes)
    want_slope = round((slopes[(n - 1) // 2] + slopes[n // 2]) * 0.5, 6)
    assert out.n_hours == 6
    assert out.slope == want_slope
    assert out.slope == 2.0  # the robust fit ignores the outlier
    ic = np.sort(m - 2.0 * hrs)
    assert out.intercept == round((ic[2] + ic[3]) * 0.5, 6)


def test_position_attribution_credit_rules(ray_session, tmp_path):
    """Hand-built paths: single touch = 1M; pair = 600k/400k; a
    5-touch path = 400k, 66667, 66667, 66666, 400k (largest
    remainder); clicks after the purchase credit the NEXT conversion
    only; path credit always sums to 1M per conversion."""
    import pyarrow.parquet as pq

    from vietnamese_ocr_ray.pipelines.relational import position_attribution

    def ts(h, mi=0):
        return (
            np.datetime64("2025-03-01", "us")
            + np.timedelta64(h, "h")
            + np.timedelta64(mi, "m")
        )

    rows = []
    eid = 0

    def add(u, t, typ):
        nonlocal eid
        rows.append((eid, u, t, typ))
        eid += 1

    # user 1: 5 clicks (hours 0..4) then purchase
    for h in range(5):
        add(1, ts(h), "click")
    add(1, ts(5), "purchase")
    # user 2: single click then purchase; then another click+purchase
    add(2, ts(1), "click")
    add(2, ts(2), "purchase")
    add(2, ts(3), "click")
    add(2, ts(3, 30), "click")
    add(2, ts(4), "purchase")
    t = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "user_id": pa.array([r[1] for r in rows], pa.int64()),
            "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
            "event_type": pa.array([r[3] for r in rows]),
            "value": pa.array([1.0] * len(rows), pa.float64()),
        }
    )
    pq.write_table(t, str(tmp_path / "events.parquet"))
    out = (
        position_attribution(str(tmp_path))
        .to_pandas()
        .set_index("hour")
    )
    assert out.credit_ppm.sum() == 3_000_000  # 3 conversions
    # user 1 path: first (h0) and last (h4) 400k; middles 66667/66667/66666
    assert out.loc[0].credit_ppm == 400_000
    assert out.loc[4].credit_ppm == 400_000
    # hour 1 holds user1's first middle (66,667) + user2's single (1M)
    assert out.loc[1].credit_ppm == 66_667 + 1_000_000
    assert out.loc[2].credit_ppm == 66_667
    # hour 3 holds user1's middle (66666) + user2's 2nd-path first (600k)
    assert out.loc[3].credit_ppm == 66_666 + 600_000 + 400_000
    assert out.loc[1].n_touches == 2  # user1 h1 + user2 single (h1)


def test_benford_audit(ray_session, tmp_path):
    """Exact first-digit counts on hand-built values (incl. zero
    exclusion and sub-unit values via milli quantization); a perfectly
    Benford-proportioned sample yields a small chi2; counts match a
    string-digit reference."""
    import pyarrow.parquet as pq

    from vietnamese_ocr_ray.pipelines.analytics import benford_audit

    vals = [0.0, 1.5, 0.19, 23.0, 2.0, 0.003, 94.2, 111.0]
    t = pa.table(
        {
            "event_id": pa.array(range(len(vals)), pa.int64()),
            "value": pa.array(vals, pa.float64()),
        }
    )
    pq.write_table(t, str(tmp_path / "events.parquet"))
    out = benford_audit(str(tmp_path)).to_pandas().set_index("digit")
    # milli ints: 1500, 190, 23000, 2000, 3, 94200, 111000 (0 excluded)
    want = {1: 3, 2: 2, 3: 1, 9: 1}
    for d in range(1, 10):
        assert out.loc[d].n == want.get(d, 0)
    assert out.n.sum() == 7
    assert (out.benford_share.round(6) == [
        round(np.log10(1 + 1 / d), 6) for d in range(1, 10)
    ]).all()
    chi = out.chi2.iloc[0]
    total, acc = 7, 0.0
    for d in range(1, 10):
        exp = total * np.log10(1 + 1 / d)
        acc += (float(want.get(d, 0)) - exp) ** 2 / exp
    assert chi == round(acc, 6)


def test_column_entropy(ray_session, tmp_path):
    """Uniform column -> normalized 1.0; constant column -> entropy 0;
    values match a scipy-free reference with the nano-nat contract."""
    import pyarrow.parquet as pq

    from vietnamese_ocr_ray.pipelines.analytics import column_entropy

    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(8), pa.int64()),
                "lang": pa.array(["a", "b", "c", "d"] * 2),
                "source": pa.array(["only"] * 8),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(range(4), pa.int64()),
                "event_type": pa.array(["x", "x", "x", "y"]),
            }
        ),
        str(tmp_path / "events.parquet"),
    )
    out = column_entropy(str(tmp_path)).to_pandas().set_index("column")
    lang = out.loc["documents.lang"]
    assert (lang.n_rows, lang.n_distinct) == (8, 4)
    assert lang.entropy_nats == round(np.log(4.0), 6)
    assert lang.normalized == 1.0  # uniform
    src = out.loc["documents.source"]
    assert src.entropy_nats == 0.0 and src.normalized == 0.0  # constant
    ev = out.loc["events.event_type"]
    q = sum(
        int(round(c * np.log(c) * 1e9)) for c in (3, 1)
    )
    want = np.log(4.0) - (q / 1e9) / 4
    assert ev.entropy_nats == round(want, 6)
    assert ev.normalized == round(want / np.log(2.0), 6)


def test_changepoint_hourly_detects_step(ray_session, tmp_path):
    """A clean level shift (5/hour -> 20/hour at hour 10) is found
    exactly, with near-total SSE reduction; a flat series reports
    ~zero reduction."""
    import pyarrow.parquet as pq

    from vietnamese_ocr_ray.pipelines.relational import changepoint_hourly

    rows = []
    eid = 0
    for h in range(20):
        per = 5 if h < 10 else 20
        for _ in range(per):
            rows.append(
                (
                    eid,
                    np.datetime64("2025-01-01", "us")
                    + np.timedelta64(h, "h"),
                    "step",
                )
            )
            eid += 1
    for h in range(20):  # flat control series
        for _ in range(7):
            rows.append(
                (
                    eid,
                    np.datetime64("2025-01-01", "us")
                    + np.timedelta64(h, "h"),
                    "flat",
                )
            )
            eid += 1
    t = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "event_type": pa.array([r[2] for r in rows]),
        }
    )
    pq.write_table(t, str(tmp_path / "events.parquet"))
    out = (
        changepoint_hourly(str(tmp_path))
        .to_pandas()
        .set_index("event_type")
    )
    base_hour = int(
        np.datetime64("2025-01-01").astype("datetime64[h]").astype(int)
    )
    step = out.loc["step"]
    assert step.split_hour == base_hour + 10
    assert step.sse == 0.0  # perfect two-level fit
    x = np.array([5.0] * 10 + [20.0] * 10)
    assert step.sse_reduction == round(
        float((x * x).sum() - x.sum() ** 2 / 20), 6
    )
    assert out.loc["flat"].sse_reduction == 0.0


def test_wow_change(ray_session, tmp_path):
    """Weekly counts 10 -> 15 -> 12: deltas +5 (+50%) then -3 (-20%);
    the first week's change is null."""
    import pyarrow.parquet as pq

    from vietnamese_ocr_ray.pipelines.relational import wow_change

    rows = []
    eid = 0
    for wk, n in enumerate((10, 15, 12)):
        for _ in range(n):
            rows.append(
                (
                    eid,
                    np.datetime64("2025-01-06", "us")  # a Monday
                    + np.timedelta64(wk * 7, "D"),
                    "x",
                )
            )
            eid += 1
    t = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "event_type": pa.array([r[2] for r in rows]),
        }
    )
    pq.write_table(t, str(tmp_path / "events.parquet"))
    out = (
        wow_change(str(tmp_path))
        .to_pandas()
        .sort_values("week_day")
        .reset_index(drop=True)
    )
    assert list(out.n_events) == [10, 15, 12]
    assert np.isnan(out["delta"][0]) and np.isnan(out["pct_change"][0])
    assert out["delta"][1] == 5 and out["pct_change"][1] == 0.5
    assert out["delta"][2] == -3 and out["pct_change"][2] == -0.2


def test_cluster_purity(ray_session):
    """Hand-built components: pure cluster -> 1.0; 2-vs-1 -> 2/3;
    label ties break to the smaller label."""
    from vietnamese_ocr_ray.functions.graph import cluster_purity

    comps = pa.table(
        {
            "node": pa.array([1, 2, 3, 10, 11, 12, 20, 21], pa.int64()),
            "component": pa.array([1, 1, 1, 10, 10, 10, 20, 20], pa.int64()),
        }
    )
    labels = pa.table(
        {
            "vec_id": pa.array([1, 2, 3, 10, 11, 12, 20, 21], pa.int64()),
            "label": pa.array([5, 5, 5, 7, 7, 3, 9, 4], pa.int64()),
        }
    )
    out = (
        cluster_purity(rd.from_arrow(comps).repartition(2), labels)
        .to_pandas()
        .set_index("component")
    )
    assert out.loc[1].purity == 1.0 and out.loc[1].majority_label == 5
    assert out.loc[10].majority_label == 7
    assert out.loc[10].purity == round(2 / 3, 6)
    # tie (one 9, one 4) -> smaller label wins
    assert out.loc[20].majority_label == 4 and out.loc[20].purity == 0.5


def test_ks_test_value(ray_session, tmp_path):
    """Identical distributions -> D = 0; disjoint supports -> D = 1 at
    the boundary value; counts exact."""
    import pyarrow.parquet as pq

    from vietnamese_ocr_ray.pipelines.analytics import ks_test_value

    a_vals = [1.0, 2.0, 3.0]
    b_vals = [10.0, 11.0]
    t = pa.table(
        {
            "event_id": pa.array(range(5), pa.int64()),
            "event_type": pa.array(
                ["click"] * 3 + ["purchase"] * 2
            ),
            "value": pa.array(a_vals + b_vals, pa.float64()),
        }
    )
    pq.write_table(t, str(tmp_path / "events.parquet"))
    out = ks_test_value(str(tmp_path)).to_pandas().iloc[0]
    assert (out.n_a, out.n_b) == (3, 2)
    assert out.ks_d == 1.0          # disjoint supports
    assert out.at_value == 3.0      # attained at a-side's max
    assert out.crit_scale == round(np.sqrt(5 / 6), 6)
    # identical: same values on both sides
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(range(6), pa.int64()),
                "event_type": pa.array(["click", "purchase"] * 3),
                "value": pa.array([5.0, 5.0, 7.0, 7.0, 9.0, 9.0]),
            }
        ),
        str(tmp_path / "events.parquet"),
    )
    out = ks_test_value(str(tmp_path)).to_pandas().iloc[0]
    assert out.ks_d == 0.0


def test_ks_source_length(ray_session, tmp_path):
    """Source A's lengths sit wholly below B+C's -> D large for A;
    values match a per-source vs-rest ECDF reference."""
    import pyarrow.parquet as pq

    from vietnamese_ocr_ray.pipelines.analytics import ks_source_length

    rows = (
        [("A", 10)] * 4
        + [("B", 100), ("B", 110), ("B", 120)]
        + [("C", 100), ("C", 130)]
    )
    t = pa.table(
        {
            "doc_id": pa.array(range(len(rows)), pa.int64()),
            "source": pa.array([r[0] for r in rows]),
            "n_chars": pa.array([r[1] for r in rows], pa.int64()),
        }
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    out = ks_source_length(str(tmp_path)).to_pandas().set_index("source")
    a = out.loc["A"]
    assert a.n_docs == 4
    assert a.ks_d == 1.0       # disjoint from the rest
    assert a.at_len == 10
    # reference for B vs rest
    import itertools

    lens = sorted({r[1] for r in rows})
    def ecdf(which):
        cs, cr = [], []
        s_tot = sum(1 for r in rows if r[0] == which)
        r_tot = len(rows) - s_tot
        s_run = r_run = 0
        d = []
        for L in lens:
            s_run += sum(1 for r in rows if r[0] == which and r[1] == L)
            r_run += sum(1 for r in rows if r[0] != which and r[1] == L)
            d.append(abs(s_run / s_tot - r_run / r_tot))
        return max(d)
    assert out.loc["B"].ks_d == round(ecdf("B"), 6)


def test_kmv_distinct_sources(ray_session):
    """Bottom-k KMV sketch: n_kept/est exact below k; at k the
    (k-1)*2^64/h_k estimator, the signed k-th hash, and the __union__
    row all match a direct bottom-k recompute from the same hashes."""
    from vietnamese_ocr_ray.functions.sketch import (
        HllSketch,
        kmv_distinct_sources,
    )

    texts = {
        "A": ["a b c", "b c d"],  # distinct tokens {a,b,c,d}
        "B": ["x y", "y z w q r"],  # {x,y,z,w,q,r}
    }
    rows = [(s, t) for s, ts in texts.items() for t in ts]
    t = pa.table(
        {
            "doc_id": pa.array(range(len(rows)), pa.int64()),
            "source": pa.array([r[0] for r in rows]),
            "text": pa.array([r[1] for r in rows]),
        }
    )
    out = (
        kmv_distinct_sources(rd.from_arrow(t).repartition(3), k=4)
        .to_pandas()
        .set_index("source")
    )

    def bottom(tokens, k=4):
        h = np.unique(HllSketch._finalize(content_hash64(pa.array(tokens))))
        return h[:k]

    ha = bottom(list("abcd"))
    hb = bottom(["x", "y", "z", "w", "q", "r"])
    hu = np.unique(np.concatenate([ha, hb]))[:4]
    for name, kept, n_total in (
        ("A", ha, 4),
        ("B", hb, 6),
        ("__union__", hu, 10),
    ):
        r = out.loc[name]
        assert r.n_kept == 4
        kth = int(kept[-1])
        assert r.kth_hash == (kth - (1 << 64) if kth >= 1 << 63 else kth)
        assert r.est_distinct == round(3 * 18446744073709551616.0 / float(kth), 6)
    # below-k fallback: one source with 2 distinct tokens -> exact count
    t2 = pa.table(
        {
            "doc_id": pa.array([0], pa.int64()),
            "source": pa.array(["C"]),
            "text": pa.array(["p q"]),
        }
    )
    out2 = kmv_distinct_sources(rd.from_arrow(t2), k=4).to_pandas()
    assert out2.set_index("source").loc["C"].est_distinct == 2.0


def test_funnel_steps_reference(ray_session, tmp_path):
    """Hand-built 3-user fixture: u1 completes the funnel in order, u2
    clicks BEFORE its first view (click must not count), u3 views only.
    Also checks the exact-ppm conversion floor."""
    import pyarrow.parquet as pq

    from vietnamese_ocr_ray.pipelines.relational import funnel_steps

    t0 = np.datetime64("2025-01-01T00:00:00", "us")

    def ev(uid, typ, minutes):
        return (uid, typ, t0 + np.timedelta64(minutes, "m"))

    rows = [
        ev(1, "view", 0), ev(1, "click", 5), ev(1, "purchase", 10),
        ev(2, "click", 0), ev(2, "view", 5), ev(2, "purchase", 10),
        ev(3, "view", 0),
    ]
    t = pa.table(
        {
            "event_id": pa.array(range(len(rows)), pa.int64()),
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "event_type": pa.array([r[1] for r in rows], pa.string()),
            "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
            "value": pa.array([1.0] * len(rows), pa.float64()),
        }
    )
    pq.write_table(t, str(tmp_path / "events.parquet"))
    out = funnel_steps(str(tmp_path)).to_pandas().set_index("step")
    # u2's click at t=0 precedes its view at t=5 -> no click reach;
    # u2's purchase can't count either (no click anchor).
    assert out.loc[1, "n_users"] == 3
    assert out.loc[2, "n_users"] == 1
    assert out.loc[3, "n_users"] == 1
    assert out.loc[1, "conv_ppm"] == 1_000_000
    assert out.loc[2, "conv_ppm"] == 1_000_000 // 3
    assert list(out["event_type"]) == ["view", "click", "purchase"]


def test_spearman_value_hour_matches_pandas(ray_session, tmp_path):
    """The histogram-ranked Spearman equals pandas' average-rank
    Spearman (rank -> Pearson) on a fixture with heavy ties in BOTH
    variables."""
    import pyarrow.parquet as pq

    from vietnamese_ocr_ray.pipelines.relational import spearman_value_hour

    rng = np.random.default_rng(7)
    n = 400
    hours = rng.integers(0, 24, n)
    # milli-exact values correlated with hour, with many ties
    vals = (hours * 50 + rng.integers(0, 200, n)) / 1000.0
    t0 = np.datetime64("2025-01-01T00:00:00", "us")
    ts = t0 + hours.astype("timedelta64[h]") + np.timedelta64(1, "m")
    t = pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "user_id": pa.array(rng.integers(1, 5, n), pa.int64()),
            "event_type": pa.array(["x"] * n, pa.string()),
            "ts": pa.array(ts, pa.timestamp("us")),
            "value": pa.array(vals, pa.float64()),
        }
    )
    pq.write_table(t, str(tmp_path / "events.parquet"))
    import pandas as pd

    out = spearman_value_hour(str(tmp_path)).to_pandas().iloc[0]
    df = pd.DataFrame({"v": np.round(vals * 1000), "h": hours})
    rx = df["v"].rank(method="average")
    ry = df["h"].rank(method="average")
    want = np.corrcoef(rx, ry)[0, 1]
    assert out.n_events == n
    # the pipeline rounds rho to 6dp (SQL-oracle contract)
    assert out.rho == round(want, 6)
    assert out.rho > 0.5  # the planted correlation is visible


def test_holt_forecast_reference(ray_session, tmp_path):
    """Holt on a PURE linear ramp (k events in hour k) locks level to
    the last point and trend to the slope, so the h-step forecast is
    exactly linear extrapolation."""
    import pyarrow.parquet as pq

    from vietnamese_ocr_ray.pipelines.relational import holt_forecast

    t0 = np.datetime64("2025-01-01T00:00:00", "us")
    rows = []
    for h in range(12):
        for k in range(h + 1):  # y_h = h + 1: exact line
            rows.append(t0 + np.timedelta64(h, "h") + np.timedelta64(k, "s"))
    t = pa.table(
        {
            "event_id": pa.array(range(len(rows)), pa.int64()),
            "user_id": pa.array([1] * len(rows), pa.int64()),
            "event_type": pa.array(["x"] * len(rows), pa.string()),
            "ts": pa.array(rows, pa.timestamp("us")),
            "value": pa.array([1.0] * len(rows), pa.float64()),
        }
    )
    pq.write_table(t, str(tmp_path / "events.parquet"))
    out = holt_forecast(str(tmp_path)).to_pandas().iloc[0]
    # independent sequential reference
    y = np.arange(1, 13, dtype=np.float64)
    lvl, trd = y[0], y[1] - y[0]
    for i in range(1, 12):
        new = 0.5 * y[i] + 0.5 * (lvl + trd)
        trd = 0.5 * (new - lvl) + 0.5 * trd
        lvl = new
    assert out.n_hours == 12
    assert out.level == round(lvl, 6)
    assert out.trend == round(trd, 6)
    # a perfect line is invariant under Holt: forecasts continue it
    assert abs(out.f1 - 13.0) < 1e-4
    assert abs(out.f2 - 14.0) < 1e-4


def test_asof_join_latency_reference(ray_session, tmp_path):
    """Hand-built as-of fixture: u1's purchase picks the LATEST click
    at-or-before it (not the first); u2's purchase precedes every
    click (unmatched); u3 has an exact-tie click (latency 0)."""
    import pyarrow.parquet as pq

    from vietnamese_ocr_ray.pipelines.relational import asof_join_latency

    t0 = np.datetime64("2025-01-01T00:00:00", "us")

    def ev(uid, typ, seconds):
        return (uid, typ, t0 + np.timedelta64(seconds, "s"))

    rows = [
        ev(1, "click", 0), ev(1, "click", 50), ev(1, "purchase", 170),
        ev(2, "purchase", 10), ev(2, "click", 20),
        ev(3, "click", 30), ev(3, "purchase", 30),
    ]
    t = pa.table(
        {
            "event_id": pa.array(range(len(rows)), pa.int64()),
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "event_type": pa.array([r[1] for r in rows], pa.string()),
            "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
            "value": pa.array([1.0] * len(rows), pa.float64()),
        }
    )
    pq.write_table(t, str(tmp_path / "events.parquet"))
    out = asof_join_latency(str(tmp_path)).to_pandas().set_index("hour")
    # all events land in hour 0 of the epoch day
    assert list(out.index) == [0]
    assert out.loc[0, "n_purchases"] == 3
    assert out.loc[0, "n_matched"] == 2
    # u1: 170-50=120 (latest click, not the first); u3: exact tie -> 0
    assert out.loc[0, "sum_latency_s"] == 120
    assert out.loc[0, "avg_latency_s"] == 60.0


def test_mannwhitney_matches_rank_reference(ray_session, tmp_path):
    """The histogram-ranked U and tie-corrected z equal an independent
    average-rank reference (pandas rank -> classic formulas) on a
    fixture with heavy ties and a planted location shift."""
    import math

    import pandas as pd
    import pyarrow.parquet as pq

    from vietnamese_ocr_ray.pipelines.relational import mannwhitney_value

    rng = np.random.default_rng(11)
    n_a, n_b = 180, 240
    va = rng.integers(0, 40, n_a) / 1000.0          # type 'a': lower
    vb = (rng.integers(0, 40, n_b) + 15) / 1000.0   # type 'b': shifted
    vals = np.concatenate([va, vb])
    types = ["a"] * n_a + ["b"] * n_b
    t0 = np.datetime64("2025-01-01T00:00:00", "us")
    t = pa.table(
        {
            "event_id": pa.array(range(len(vals)), pa.int64()),
            "user_id": pa.array([1] * len(vals), pa.int64()),
            "event_type": pa.array(types, pa.string()),
            "ts": pa.array(
                [t0 + np.timedelta64(i, "s") for i in range(len(vals))],
                pa.timestamp("us"),
            ),
            "value": pa.array(vals, pa.float64()),
        }
    )
    pq.write_table(t, str(tmp_path / "events.parquet"))
    out = (
        mannwhitney_value(str(tmp_path)).to_pandas().set_index("event_type")
    )
    # independent reference: average ranks over the pooled sample
    vm = np.round(vals * 1000)
    ranks = pd.Series(vm).rank(method="average").to_numpy()
    n = len(vm)
    _, tie_counts = np.unique(vm, return_counts=True)
    tie_t = int(sum(int(c) ** 3 - int(c) for c in tie_counts))
    for et, mask in (("a", np.array(types) == "a"),
                     ("b", np.array(types) == "b")):
        na = int(mask.sum())
        nb = n - na
        u = float(ranks[mask].sum() - na * (na + 1) / 2.0)
        mu = na * nb / 2.0
        sig2 = na * nb / 12.0 * ((n + 1) - tie_t / (n * (n - 1.0)))
        z = round((u - mu) / math.sqrt(sig2), 6)
        assert out.loc[et, "n_a"] == na
        assert out.loc[et, "n_b"] == nb
        assert out.loc[et, "u_stat"] == u
        assert out.loc[et, "z_score"] == z
    # the planted shift must be visible and antisymmetric
    assert out.loc["b", "z_score"] > 3
    assert out.loc["a", "z_score"] == -out.loc["b", "z_score"]


def test_ab_test_conversion_reference(ray_session, tmp_path):
    """4 even-id users (2 convert) vs 3 odd-id users (1 converts, via
    a user with BOTH arms' parity impossible — multi-event users count
    once)."""
    import math

    import pyarrow.parquet as pq

    from vietnamese_ocr_ray.pipelines.relational import ab_test_conversion

    t0 = np.datetime64("2025-01-01T00:00:00", "us")
    rows = [
        (2, "purchase"), (2, "view"),          # even converter (once)
        (4, "purchase"), (6, "view"), (8, "view"),
        (1, "purchase"), (3, "view"), (5, "view"),
    ]
    t = pa.table(
        {
            "event_id": pa.array(range(len(rows)), pa.int64()),
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "event_type": pa.array([r[1] for r in rows], pa.string()),
            "ts": pa.array(
                [t0 + np.timedelta64(i, "s") for i in range(len(rows))],
                pa.timestamp("us"),
            ),
            "value": pa.array([1.0] * len(rows), pa.float64()),
        }
    )
    pq.write_table(t, str(tmp_path / "events.parquet"))
    out = ab_test_conversion(str(tmp_path)).to_pandas().iloc[0]
    assert out.n_users_a == 4 and out.n_conv_a == 2
    assert out.n_users_b == 3 and out.n_conv_b == 1
    assert out.rate_a_ppm == 500_000
    assert out.rate_b_ppm == 1_000_000 // 3
    pool = 3 / 7
    se2 = pool * (1.0 - pool) * (1.0 / 4 + 1.0 / 3)
    assert out.z_score == round((2 / 4 - 1 / 3) / math.sqrt(se2), 6)


def test_mutual_knn_pairs_reference(ray_session):
    """Brute-force reciprocity reference on a planted 2-cluster layout:
    mutual pairs must be exactly the directed-kNN edges present in
    both directions, and strictly fewer than the directed edge count
    (the hub vector's one-way edges must be filtered)."""
    from vietnamese_ocr_ray.functions.ann import knn_join_exact, mutual_knn_pairs

    rng = np.random.default_rng(3)
    a = rng.normal(0, 1, (20, 8)) + 4.0
    b = rng.normal(0, 1, (20, 8)) - 4.0
    vecs = np.vstack([a, b])
    t = pa.table(
        {
            "vec_id": pa.array(range(40), pa.int64()),
            "embedding": pa.array(
                [list(map(float, v)) for v in vecs],
                pa.list_(pa.float64()),
            ),
        }
    )
    ds = rd.from_arrow(t)
    k = 3
    directed = knn_join_exact(ds, k=k, chunk_rows=16).to_pandas()
    dset = set(zip(directed["vec_id"], directed["nbr"]))
    want = sorted(
        (u, v) for (u, v) in dset if u < v and (v, u) in dset
    )
    got = (
        mutual_knn_pairs(ds, k=k, chunk_rows=16)
        .to_pandas()
        .sort_values(["u", "v"])
    )
    assert list(zip(got["u"], got["v"])) == want
    assert 0 < len(want) < len(dset)
    # cos values ride through from the directed join
    dmap = {(r.vec_id, r.nbr): r.cos for r in directed.itertuples()}
    for r in got.itertuples():
        assert r.cos == dmap[(r.u, r.v)] == dmap[(r.v, r.u)]


def test_transition_stationary_reference(ray_session, tmp_path):
    """A deterministic 2-state cycle a->b->a has stationary (0.5, 0.5)
    and the fixed-iteration fold must match an independent numpy
    power iteration on a 3-state chain."""
    import pyarrow.parquet as pq

    from vietnamese_ocr_ray.pipelines.relational import transition_stationary

    t0 = np.datetime64("2025-01-01T00:00:00", "us")

    def write(rows, path):
        t = pa.table(
            {
                "event_id": pa.array(range(len(rows)), pa.int64()),
                "user_id": pa.array([r[0] for r in rows], pa.int64()),
                "event_type": pa.array([r[1] for r in rows], pa.string()),
                "ts": pa.array(
                    [t0 + np.timedelta64(i, "s") for i in range(len(rows))],
                    pa.timestamp("us"),
                ),
                "value": pa.array([1.0] * len(rows), pa.float64()),
            }
        )
        pq.write_table(t, str(path / "events.parquet"))

    d1 = tmp_path / "cycle"
    d1.mkdir()
    write([(1, "a"), (1, "b"), (1, "a"), (1, "b"), (1, "a")], d1)
    out = transition_stationary(str(d1)).to_pandas().set_index("event_type")
    assert out.loc["a", "pi"] == 0.5 and out.loc["b", "pi"] == 0.5

    # 3-state chain with asymmetric counts vs numpy reference
    d2 = tmp_path / "tri"
    d2.mkdir()
    seq = ["a", "b", "a", "c", "a", "b", "c", "a", "b", "b", "c", "a"]
    write([(1, s) for s in seq], d2)
    counts = {}
    for p, n in zip(seq, seq[1:]):
        counts[(p, n)] = counts.get((p, n), 0) + 1
    types = sorted({*seq})
    idx = {t: i for i, t in enumerate(types)}
    P = np.zeros((3, 3))
    rowsum = {}
    for (p, n), c in counts.items():
        rowsum[p] = rowsum.get(p, 0) + c
    for (p, n), c in counts.items():
        P[idx[p], idx[n]] = c / float(rowsum[p])
    x = np.full(3, 1.0 / 3)
    for _ in range(20):
        x = x @ P
    out2 = transition_stationary(str(d2)).to_pandas().set_index("event_type")
    for t_ in types:
        assert abs(out2.loc[t_, "pi"] - x[idx[t_]]) < 1e-9
    # each pi rounds to 9dp, so the sum can be off by ~|types| ulps
    assert abs(out2["pi"].sum() - 1.0) < 1e-8


def test_value_multi_regression_recovers_plane(ray_session, tmp_path):
    """Values generated EXACTLY on a plane value = 2 + 0.25*hour +
    0.5*dow (milli-exact) must be recovered with zero residual by the
    integer normal equations."""
    import pyarrow.parquet as pq

    from vietnamese_ocr_ray.pipelines.relational import value_multi_regression

    rng = np.random.default_rng(5)
    n = 300
    t0 = np.datetime64("2025-01-05T00:00:00", "us")  # a Sunday
    offs = rng.integers(0, 14 * 24 * 3600, n)
    ts = t0 + offs.astype("timedelta64[s]")
    epoch = ts.astype("datetime64[s]").astype(np.int64)
    h = (epoch // 3600) % 24
    d = (epoch // 86400) % 7
    vals = 2.0 + 0.25 * h + 0.5 * d  # milli-exact plane
    t = pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "user_id": pa.array([1] * n, pa.int64()),
            "event_type": pa.array(["x"] * n, pa.string()),
            "ts": pa.array(ts, pa.timestamp("us")),
            "value": pa.array(vals, pa.float64()),
        }
    )
    pq.write_table(t, str(tmp_path / "events.parquet"))
    out = value_multi_regression(str(tmp_path)).to_pandas().iloc[0]
    assert out.n_events == n
    assert out.b0 == 2.0
    assert out.b_hour == 0.25
    assert out.b_dow == 0.5


def _write_events(rows, d):
    """rows: list of (event_id, user_id, event_type, ts, value)."""
    import pyarrow.parquet as pq

    t = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "user_id": pa.array([r[1] for r in rows], pa.int64()),
            "event_type": pa.array([r[2] for r in rows], pa.string()),
            "ts": pa.array(
                [np.datetime64(r[3], "us") for r in rows], pa.timestamp("us")
            ),
            "value": pa.array([r[4] for r in rows], pa.float64()),
        }
    )
    pq.write_table(t, str(d / "events.parquet"))


def test_seasonal_index_flat_and_peaked(ray_session, tmp_path):
    """A type with all events in one hour gets index 24 there and no
    other rows; a type spread evenly over 4 hours gets 6.0 each."""
    from vietnamese_ocr_ray.pipelines.relational import seasonal_index

    rows = []
    for i in range(10):
        rows.append((i, 1, "peak", f"2024-01-0{1 + i % 5}T07:30:00", 1.0))
    eid = 100
    for day in range(3):
        for h in (0, 6, 12, 18):
            rows.append((eid, 2, "flat", f"2024-01-0{day + 1}T{h:02d}:15:00", 1.0))
            eid += 1
    _write_events(rows, tmp_path)
    out = seasonal_index(str(tmp_path)).to_pandas()
    peak = out[out.event_type == "peak"]
    assert len(peak) == 1 and peak.iloc[0].hod == 7
    assert peak.iloc[0].seasonal_idx == 24.0
    flat = out[out.event_type == "flat"]
    assert len(flat) == 4 and (flat.seasonal_idx == 6.0).all()


def test_acf_hourly_periodic_series(ray_session, tmp_path):
    """A strictly 2-hour-periodic count series has acf(2) == +1 shape
    dominance: acf at even lags > acf at odd lags, and acf matches a
    numpy reference exactly."""
    from vietnamese_ocr_ray.pipelines.relational import acf_hourly

    rows = []
    eid = 0
    for h in range(48):
        n = 5 if h % 2 == 0 else 1
        for _ in range(n):
            rows.append((eid, 1, "x", f"2024-01-{1 + h // 24:02d}T{h % 24:02d}:00:00", 1.0))
            eid += 1
    _write_events(rows, tmp_path)
    out = acf_hourly(str(tmp_path), max_lag=6).to_pandas()
    x = np.array([5 if h % 2 == 0 else 1 for h in range(48)], np.float64)
    m = x.mean()
    denom = ((x - m) ** 2).sum()
    for _, r in out.iterrows():
        k = int(r.lag)
        ref = (((x[:-k] - m) * (x[k:] - m)).sum()) / denom
        assert abs(r.acf - ref) < 1e-6
    evens = out[out.lag % 2 == 0].acf.to_numpy()
    odds = out[out.lag % 2 == 1].acf.to_numpy()
    assert evens.min() > odds.max()


def test_anova_value_matches_scipy_formula(ray_session, tmp_path):
    """F statistic equals the textbook one-way ANOVA on the same data
    (values chosen milli-exact so scaling is lossless)."""
    from vietnamese_ocr_ray.pipelines.relational import anova_value

    rng = np.random.default_rng(11)
    rows = []
    eid = 0
    groups = {"a": 10.0, "b": 12.5, "c": 9.0}
    samples = {}
    for gname, mean in groups.items():
        vals = np.round(mean + rng.normal(0, 2, 40), 3)
        samples[gname] = vals
        for v in vals:
            rows.append((eid, 1, gname, "2024-01-01T00:00:00", float(v)))
            eid += 1
    _write_events(rows, tmp_path)
    out = anova_value(str(tmp_path)).to_pandas().iloc[0]
    allv = np.concatenate(list(samples.values()))
    grand = allv.mean()
    k, n = len(samples), len(allv)
    ssb = sum(len(v) * (v.mean() - grand) ** 2 for v in samples.values())
    ssw = sum(((v - v.mean()) ** 2).sum() for v in samples.values())
    f_ref = (ssb / (k - 1)) / (ssw / (n - k))
    assert out.k_groups == k and out.n_events == n
    assert abs(out.f_stat - f_ref) < 1e-4


def test_watermark_late_events_planted(ray_session, tmp_path):
    """Brute-force reference: replay the splitmix64 arrival permutation
    in-process and compare late counts + max lateness exactly."""
    from vietnamese_ocr_ray.functions.joins import _mix64
    from vietnamese_ocr_ray.pipelines.relational import watermark_late_events

    rng = np.random.default_rng(3)
    n = 500
    base = np.datetime64("2024-01-01T00:00:00", "us")
    ts = base + rng.integers(0, 10**9, n).astype("timedelta64[us]")
    types = rng.choice(["a", "b"], n)
    rows = [
        (i, 1, str(types[i]), str(ts[i]), 1.0) for i in range(n)
    ]
    _write_events(rows, tmp_path)
    out = (
        watermark_late_events(str(tmp_path))
        .to_pandas()
        .set_index("event_type")
        .sort_index()
    )
    order = np.argsort(_mix64(np.arange(n, dtype=np.int64)))
    ts_i = ts.astype(np.int64)[order]
    ty_i = types[order]
    ref = {}
    run = np.iinfo(np.int64).min
    for t_, v in zip(ty_i, ts_i):
        if v < run:
            c, m = ref.get(t_, (0, 0))
            ref[t_] = (c + 1, max(m, run - v))
        run = max(run, v)
    assert set(out.index) == set(ref)
    for t_, (c, m) in ref.items():
        assert out.loc[t_, "n_late"] == c
        assert out.loc[t_, "max_lateness_us"] == m


def test_dormant_customers_anti_join(ray_session, tmp_path):
    """Customers with no qualifying order are counted per segment with
    cents-exact balances; active customers are excluded."""
    import pyarrow.parquet as pq

    from vietnamese_ocr_ray.pipelines.analytics import dormant_customers

    cust = pa.table(
        {
            "c_custkey": pa.array([1, 2, 3, 4], pa.int64()),
            "c_mktsegment": pa.array(["A", "A", "B", "B"], pa.string()),
            "c_acctbal": pa.array([10.55, 20.45, 7.25, 3.10], pa.float64()),
        }
    )
    orders = pa.table(
        {
            "o_custkey": pa.array([1, 3, 3], pa.int64()),
            "o_orderdate": pa.array(
                [
                    np.datetime64("2001-01-15", "us"),  # cust 1 active
                    np.datetime64("1999-05-01", "us"),  # cust 3: too old
                    np.datetime64("1999-12-31", "us"),  # cust 3: too old
                ],
                pa.timestamp("us"),
            ),
        }
    )
    pq.write_table(cust, str(tmp_path / "customer.parquet"))
    pq.write_table(orders, str(tmp_path / "orders.parquet"))
    out = (
        dormant_customers(str(tmp_path))
        .to_pandas()
        .set_index("c_mktsegment")
        .sort_index()
    )
    assert out.loc["A", "n_dormant"] == 1  # cust 2 only
    assert out.loc["A", "total_acctbal"] == 20.45
    assert out.loc["B", "n_dormant"] == 2  # custs 3 and 4
    assert out.loc["B", "total_acctbal"] == 10.35


def test_large_volume_orders_threshold(ray_session, tmp_path):
    """Only orders whose summed quantity exceeds the threshold survive,
    with the buyer name joined on and DESC totalprice order."""
    import pyarrow.parquet as pq

    from vietnamese_ocr_ray.pipelines.analytics import large_volume_orders

    line = pa.table(
        {
            "l_orderkey": pa.array([1, 1, 2, 2, 3], pa.int64()),
            "l_quantity": pa.array([200.0, 150.0, 100.0, 90.0, 400.0], pa.float64()),
        }
    )
    orders = pa.table(
        {
            "o_orderkey": pa.array([1, 2, 3], pa.int64()),
            "o_custkey": pa.array([7, 8, 9], pa.int64()),
            "o_orderdate": pa.array(
                [np.datetime64(f"2000-01-0{d}", "us") for d in (1, 2, 3)],
                pa.timestamp("us"),
            ),
            "o_totalprice": pa.array([100.0, 900.0, 500.0], pa.float64()),
        }
    )
    cust = pa.table(
        {
            "c_custkey": pa.array([7, 8, 9], pa.int64()),
            "c_name": pa.array(["carol", "dan", "erin"], pa.string()),
        }
    )
    pq.write_table(line, str(tmp_path / "lineitem.parquet"))
    pq.write_table(orders, str(tmp_path / "orders.parquet"))
    pq.write_table(cust, str(tmp_path / "customer.parquet"))
    out = large_volume_orders(str(tmp_path), min_qty=300).to_pandas()
    # order 1: 350 > 300; order 3: 400 > 300; order 2: 190 filtered
    assert list(out.o_orderkey) == [3, 1]  # totalprice DESC
    assert list(out.c_name) == ["erin", "carol"]
    assert list(out.sum_qty) == [400.0, 350.0]


def test_small_qty_part_revenue_exact(ray_session, tmp_path):
    """Matches the brute-force Q17 semantics: only lineitems with
    qty < 0.2 * part average contribute, revenue summed in cents."""
    import pyarrow.parquet as pq

    from vietnamese_ocr_ray.pipelines.analytics import small_qty_part_revenue

    # part 1: qties 1, 10, 10, 10 -> avg 7.75, 0.2*avg = 1.55: qty 1 in
    # part 2: qties 5, 5 -> 0.2*avg = 1.0: nothing in
    line = pa.table(
        {
            "l_partkey": pa.array([1, 1, 1, 1, 2, 2], pa.int64()),
            "l_quantity": pa.array([1.0, 10.0, 10.0, 10.0, 5.0, 5.0], pa.float64()),
            "l_extendedprice": pa.array(
                [70.07, 1.0, 1.0, 1.0, 2.0, 2.0], pa.float64()
            ),
        }
    )
    pq.write_table(line, str(tmp_path / "lineitem.parquet"))
    out = small_qty_part_revenue(str(tmp_path)).to_pandas()
    assert abs(out.avg_yearly.iloc[0] - 70.07 / 7.0) < 1e-12


def test_hits_user_event_integer_path_counts(ray_session, tmp_path):
    """Brute-force bipartite HITS half-steps on a small incidence set:
    a1 = distinct-user degree, h1(u) = sum a1 over u's types,
    a2(t) = sum h1 over t's users — duplicates in events must not
    inflate the incidence."""
    from vietnamese_ocr_ray.pipelines.relational import hits_user_event

    # user 1: {a, b}; user 2: {b}; user 3: {b, c}; plus duplicate rows
    rows = []
    eid = 0
    for u, t in [(1, "a"), (1, "b"), (1, "b"), (2, "b"), (3, "b"), (3, "c"), (3, "c")]:
        rows.append((eid, u, t, "2024-01-01T00:00:00", 1.0))
        eid += 1
    _write_events(rows, tmp_path)
    out = (
        hits_user_event(str(tmp_path))
        .to_pandas()
        .set_index("event_type")
        .sort_index()
    )
    # a1: a=1, b=3, c=1 ; h1: u1=4, u2=3, u3=4
    # a2: a=4, b=11, c=4 ; total=19
    assert list(out.n_users) == [1, 3, 1]
    assert list(out.hub_mass) == [4, 11, 4]
    assert abs(out.loc["b", "auth_share"] - round(11 / 19, 6)) < 1e-12


def test_anchor_text_agg_dominant_anchor(ray_session, tmp_path):
    """Counts per target and the lexicographic tiebreak on equal-count
    anchors, over explicit html pages (html_col path)."""
    import ray.data as rd_mod

    from vietnamese_ocr_ray.functions.html import anchor_text_agg

    pages = [
        '<a href="/x">one</a><a href="/x">two</a><a href="/y">solo</a>',
        '<a href="/x">two</a><a href="/x">one</a>',
    ]
    ds = rd_mod.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2], pa.int64()),
                "page": pa.array(pages, pa.string()),
            }
        )
    )
    out = (
        anchor_text_agg(ds, html_col="page")
        .to_pandas()
        .set_index("href")
        .sort_index()
    )
    assert out.loc["/x", "n_links"] == 4
    assert out.loc["/x", "n_unique_anchors"] == 2
    # 'one' and 'two' both have count 2 -> lexicographic winner 'one'
    assert out.loc["/x", "top_anchor"] == "one"
    assert out.loc["/x", "top_n"] == 2
    assert out.loc["/y", "n_links"] == 1 and out.loc["/y", "top_anchor"] == "solo"


def test_kcore_peel_triangle_with_tail(ray_session):
    """A triangle with a pendant path: the 2-core is exactly the
    triangle (each degree 2); k=3 peels everything."""
    import ray.data as rd_mod

    from vietnamese_ocr_ray.functions.graph import kcore_peel

    # triangle 1-2-3 plus tail 3-4-5
    pairs = rd_mod.from_arrow(
        pa.table(
            {
                "a": pa.array([1, 2, 1, 3, 4], pa.int64()),
                "b": pa.array([2, 3, 3, 4, 5], pa.int64()),
            }
        )
    )
    out = kcore_peel(pairs, k=2).to_pandas().set_index("node")
    assert sorted(out.index) == [1, 2, 3]
    assert (out.degree == 2).all()
    out3 = kcore_peel(pairs, k=3)
    df3 = out3.to_pandas() if hasattr(out3, "to_pandas") else out3
    assert len(df3) == 0


def test_kcore_peel_long_tail_needs_rounds(ray_session):
    """A 6-node path peels one layer per round from each end — rounds
    below the needed depth must still match the fixed-round semantics
    (partial peel), and enough rounds empty it."""
    import ray.data as rd_mod

    from vietnamese_ocr_ray.functions.graph import kcore_peel

    path = rd_mod.from_arrow(
        pa.table(
            {
                "a": pa.array([1, 2, 3, 4, 5], pa.int64()),
                "b": pa.array([2, 3, 4, 5, 6], pa.int64()),
            }
        )
    )
    full = kcore_peel(path, k=2, rounds=16)
    df = full.to_pandas() if hasattr(full, "to_pandas") else full
    assert len(df) == 0
    # one round removes only the two endpoints: 4 survivors remain
    partial = kcore_peel(path, k=2, rounds=1).to_pandas()
    assert sorted(partial.node) == [2, 3, 4, 5]


def test_min_rev_supplier_keeps_ties(ray_session, tmp_path):
    """Two suppliers tied at a part's minimum revenue BOTH survive;
    the non-minimal supplier is dropped; names/nations attach."""
    import pandas as pd_mod

    from vietnamese_ocr_ray.pipelines.analytics import min_rev_supplier

    pd_mod.DataFrame(
        {
            "l_partkey": [1, 1, 1, 2],
            "l_suppkey": [10, 11, 12, 10],
            "l_extendedprice": [5.0, 5.0, 9.0, 7.0],
            "l_discount": [0.0, 0.0, 0.0, 0.0],
        }
    ).to_parquet(tmp_path / "lineitem.parquet")
    pd_mod.DataFrame(
        {
            "s_suppkey": [10, 11, 12],
            "s_name": ["s10", "s11", "s12"],
            "s_nationkey": [0, 1, 0],
        }
    ).to_parquet(tmp_path / "supplier.parquet")
    pd_mod.DataFrame(
        {"n_nationkey": [0, 1], "n_name": ["A", "B"]}
    ).to_parquet(tmp_path / "nation.parquet")

    out = min_rev_supplier(str(tmp_path)).to_pandas()
    part1 = out[out.p_partkey == 1].sort_values("s_suppkey")
    assert list(part1.s_suppkey) == [10, 11]  # tie kept, 12 dropped
    assert list(part1.s_name) == ["s10", "s11"]
    assert list(part1.n_name) == ["A", "B"]
    assert (part1.supply_rev == 5.0).all()
    part2 = out[out.p_partkey == 2]
    assert list(part2.s_suppkey) == [10] and float(part2.supply_rev.iloc[0]) == 7.0


def test_decision_stump_perfect_separation(ray_session, tmp_path):
    """Values below 100 are all 'purchase', above are all 'click' —
    the learned stump must separate them perfectly and report pure
    sides (weighted Gini 0 => score_fe12 == N * 1e12)."""
    import pandas as pd_mod

    from vietnamese_ocr_ray.functions.classifier import decision_stump

    lo_vals = [float(v) for v in range(1, 41)]  # purchases at 1..40
    hi_vals = [float(v) for v in range(200, 240)]  # clicks at 200..239
    pd_mod.DataFrame(
        {
            "value": lo_vals + hi_vals,
            "event_type": ["purchase"] * 40 + ["click"] * 40,
        }
    ).to_parquet(tmp_path / "events.parquet")

    out = decision_stump(str(tmp_path)).to_pandas().iloc[0]
    assert out.n_left == 40 and out.pos_left == 40  # pure positive side
    assert out.n_right == 40 and out.pos_right == 0  # pure negative side
    assert 40.0 < out.threshold <= 200.0
    assert out.score_fe12 == 80 * 10**12  # gini 0 on both sides


def test_decision_stump_degenerate_single_value(ray_session, tmp_path):
    """All rows share one value -> every candidate cut has an empty
    side -> a clear ValueError, not a TypeError from unpacking None."""
    import pandas as pd_mod
    import pytest as pytest_mod

    from vietnamese_ocr_ray.functions.classifier import decision_stump

    pd_mod.DataFrame(
        {
            "value": [7.0] * 10,
            "event_type": ["purchase"] * 5 + ["click"] * 5,
        }
    ).to_parquet(tmp_path / "events.parquet")
    with pytest_mod.raises(ValueError, match="no valid split"):
        decision_stump(str(tmp_path))


def test_decision_stump_tie_breaks_to_smaller_threshold(ray_session, tmp_path):
    """With a single positive at the minimum value and the rest
    negative, every cut isolating it scores the same — the contract
    picks the SMALLEST threshold bin."""
    import pandas as pd_mod

    from vietnamese_ocr_ray.functions.classifier import decision_stump

    pd_mod.DataFrame(
        {
            "value": [0.0] + [100.0] * 20,
            "event_type": ["purchase"] + ["click"] * 20,
        }
    ).to_parquet(tmp_path / "events.parquet")
    out = decision_stump(str(tmp_path)).to_pandas().iloc[0]
    assert out.split_bin == 1  # first separating cut, not a later tie
    assert out.n_left == 1 and out.pos_left == 1


def test_nb_classify_separable_corpus(ray_session, tmp_path):
    """Two langs with disjoint vocabularies classify perfectly; a doc
    mixing both vocabularies goes to the lang owning the majority of
    its tokens (priors equal)."""
    import pandas as pd_mod

    from vietnamese_ocr_ray.functions.classifier import nb_classify

    pd_mod.DataFrame(
        {
            "doc_id": [1, 2, 3, 4, 5],
            "text": [
                "aa aa bb",
                "aa bb bb",
                "xx yy xx",
                "yy yy xx",
                "aa aa aa xx",  # 3 'en' tokens vs 1 'fr' token
            ],
            "lang": ["en", "en", "fr", "fr", "en"],
        }
    ).to_parquet(tmp_path / "documents.parquet")

    out = nb_classify(str(tmp_path)).to_pandas().set_index("doc_id")
    assert list(out.loc[[1, 2], "pred_lang"]) == ["en", "en"]
    assert list(out.loc[[3, 4], "pred_lang"]) == ["fr", "fr"]
    assert out.loc[5, "pred_lang"] == "en"
    assert out["correct"].sum() == 5


def test_zonemap_prune_stats_flags(ray_session):
    """Zones fully below/above the predicate range are pruned; an
    overlapping zone with no matching rows is a false positive."""
    import ray.data as rd_mod

    from vietnamese_ocr_ray.functions.layout import zonemap_prune_stats

    # zone 0: values 0..9 (below range). zone 1: straddles the range
    # boundary but has NO value inside [10, 20). zone 2: values inside.
    t = pa.table(
        {
            "k": pa.array([0, 1, 2, 10, 11, 20, 21], pa.int64()),
            "v": pa.array([0, 5, 9, 5, 25, 12, 15], pa.int64()),
        }
    )
    out = (
        zonemap_prune_stats(
            rd_mod.from_arrow(t), "k", "v", 10, 20, keys_per_zone=10
        )
        .to_pandas()
        .set_index("zone")
        .sort_index()
    )
    assert out.loc[0, "pruned"] == 1 and out.loc[0, "false_positive"] == 0
    assert out.loc[1, "pruned"] == 0 and out.loc[1, "n_match"] == 0
    assert out.loc[1, "false_positive"] == 1
    assert out.loc[2, "pruned"] == 0 and out.loc[2, "n_match"] == 2
    assert out.loc[2, "false_positive"] == 0
    assert list(out["n_rows"]) == [3, 2, 2]


def test_zonemap_prune_stats_ns_timestamps(ray_session):
    """A ns-unit timestamp value column (the pandas parquet default)
    must normalize to µs before the int64 cast: with µs lo/hi bounds
    the raw-ns cast would mismatch every zone (all pruned, n_match=0)
    silently. Regression for the unit-safety rule."""
    import ray.data as rd_mod

    from vietnamese_ocr_ray.functions.layout import zonemap_prune_stats

    base = np.datetime64("2024-01-01T00:00:00", "us")
    vals_us = base + np.array([0, 5, 9, 5, 25, 12, 15], "timedelta64[s]")
    lo = int(
        (base + np.timedelta64(10, "s")).astype("datetime64[us]").astype(np.int64)
    )
    hi = int(
        (base + np.timedelta64(20, "s")).astype("datetime64[us]").astype(np.int64)
    )
    k = pa.array([0, 1, 2, 10, 11, 20, 21], pa.int64())
    t_ns = pa.table(
        {"k": k, "v": pa.array(vals_us.astype("datetime64[ns]"))}
    )
    out = (
        zonemap_prune_stats(
            rd_mod.from_arrow(t_ns), "k", "v", lo, hi, keys_per_zone=10
        )
        .to_pandas()
        .set_index("zone")
        .sort_index()
    )
    assert out.loc[0, "pruned"] == 1
    assert out.loc[1, "pruned"] == 0 and out.loc[1, "false_positive"] == 1
    assert out.loc[2, "pruned"] == 0 and out.loc[2, "n_match"] == 2


def test_hilbert_key_bijective_and_neighbor_contiguous():
    """Order-4 Hilbert key over the full 16x16 grid: a bijection onto
    0..255 where CONSECUTIVE keys are always grid neighbors (Manhattan
    distance exactly 1) — the locality property Morton order lacks."""
    from vietnamese_ocr_ray.functions.layout import hilbert_key, zorder_key

    n = 16
    xs, ys = np.meshgrid(np.arange(n), np.arange(n))
    xs = xs.ravel().astype(np.int64)
    ys = ys.ravel().astype(np.int64)
    d = hilbert_key(xs, ys, bits=4)
    assert sorted(d) == list(range(n * n))  # bijection
    order = np.argsort(d)
    steps = np.abs(np.diff(xs[order])) + np.abs(np.diff(ys[order]))
    assert (steps == 1).all()  # every curve step is a grid neighbor
    # Morton, for contrast, jumps: at least one step > 1
    z = zorder_key(xs, ys, bits=4)
    zorder_steps = np.abs(np.diff(xs[np.argsort(z)])) + np.abs(
        np.diff(ys[np.argsort(z)])
    )
    assert (zorder_steps > 1).any()


def test_hilbert_layout_buckets(ray_session):
    """hilbert_layout assigns keys from (group rank, capped value) and
    derives file buckets by key // cells_per_file."""
    import ray.data as rd_mod

    from vietnamese_ocr_ray.functions.layout import hilbert_key, hilbert_layout

    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "lang": pa.array(["b", "a", "a"], pa.string()),
            "n_chars": pa.array([3, 1000, 0], pa.int64()),
        }
    )
    out = (
        hilbert_layout(rd_mod.from_arrow(t), "lang", "n_chars")
        .to_pandas()
        .set_index("doc_id")
    )
    # ranks: a=0, b=1; n_chars caps at 255
    exp = hilbert_key(
        np.array([1, 0, 0], np.int64), np.array([3, 255, 0], np.int64)
    )
    assert list(out.loc[[1, 2, 3], "hilbert_key"]) == list(exp)
    assert (out["file_bucket"] == out["hilbert_key"] // 16).all()


def test_mlm_mask_deterministic_and_reconstructible(ray_session):
    """Masking is a pure function of (doc_id, position): two runs agree;
    unmasked positions keep their token; n_masked counts the target
    tokens; the 'keep' treatment (r == 9) still appears in targets."""
    import ray.data as rd_mod

    from vietnamese_ocr_ray.functions.text import mlm_mask

    docs = pa.table(
        {
            "doc_id": pa.array(np.arange(50, dtype=np.int64)),
            "text": pa.array(
                [" ".join(f"w{i}x{j}" for j in range(30)) for i in range(50)]
            ),
        }
    )
    out1 = mlm_mask(rd_mod.from_arrow(docs)).to_pandas().sort_values("doc_id")
    out2 = mlm_mask(rd_mod.from_arrow(docs)).to_pandas().sort_values("doc_id")
    assert out1.equals(out2)
    total_masked = int(out1.n_masked.sum())
    assert 0 < total_masked < 50 * 30  # ~15% of 1500
    originals = {
        int(d): [f"w{d}x{j}" for j in range(30)] for d in out1.doc_id
    }
    for _, row in out1.iterrows():
        toks = row.masked_text.split(" ")
        tgts = row.target_text.split(" ") if row.target_text else []
        assert len(toks) == 30
        assert len(tgts) == row.n_masked
        orig = originals[int(row.doc_id)]
        for j, t in enumerate(toks):
            # a position is either untouched, [MASK]ed, reversed, or a
            # masked-but-kept token — never some unrelated string
            assert t in (orig[j], "[MASK]", orig[j][::-1])
        # targets are original tokens in position order
        assert all(t in orig for t in tgts)
    # masked rate is in a sane band around 15%
    assert 0.10 < total_masked / (50 * 30) < 0.20


def test_theta_overlap_sources_exact_and_estimated(ray_session):
    """Below sketch capacity the overlap is exact (theta = 2^64);
    with a tiny k the estimator path engages and lands within a
    loose band of the true intersection."""
    import ray.data as rd_mod

    from vietnamese_ocr_ray.functions.sketch import theta_overlap_sources

    # exact regime: 3 sources, small disjoint-ish vocabularies
    t = pa.table(
        {
            "source": pa.array(["A", "A", "B", "B", "C"], pa.string()),
            "text": pa.array(
                ["x y z", "x q", "x y r", "r s", "unique only"], pa.string()
            ),
        }
    )
    out = (
        theta_overlap_sources(rd_mod.from_arrow(t), k=64)
        .to_pandas()
        .set_index(["src_a", "src_b"])
    )
    # A={x,y,z,q}, B={x,y,r,s}, C={unique,only}
    assert out.loc[("A", "B"), "n_common"] == 2
    assert out.loc[("A", "B"), "est_intersection"] == 2.0  # exact regime
    assert out.loc[("A", "C"), "n_common"] == 0
    assert out.loc[("A", "B"), "est_jaccard"] == round(2 / 6, 6)

    # estimator regime: two sources sharing half of 400 tokens, k=32
    shared = " ".join(f"s{i}" for i in range(200))
    t2 = pa.table(
        {
            "source": pa.array(["A", "B"], pa.string()),
            "text": pa.array(
                [
                    shared + " " + " ".join(f"a{i}" for i in range(200)),
                    shared + " " + " ".join(f"b{i}" for i in range(200)),
                ]
            ),
        }
    )
    est = (
        theta_overlap_sources(rd_mod.from_arrow(t2), k=32)
        .to_pandas()
        .iloc[0]
    )
    assert est.n_common < 32  # sketch saturated: estimator path
    assert 80 <= est.est_intersection <= 450  # true intersection = 200
    assert 0.15 <= est.est_jaccard <= 0.55  # true jaccard = 1/3


def test_curriculum_order_stages_monotone_in_difficulty(ray_session):
    """Stages partition the difficulty ranking (every stage-0 doc is
    no harder than every stage-3 doc), order_rank is a permutation
    walking stages in sequence, and the in-stage order differs from
    plain difficulty order (the seeded shuffle decorrelates)."""
    import ray.data as rd_mod

    from vietnamese_ocr_ray.functions.batching import curriculum_order

    n = 64
    texts = [" ".join(["x" * (1 + i % 13)] * 5) for i in range(n)]
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "text": pa.array(texts),
            "n_chars": pa.array(
                np.array([len(s) for s in texts], np.int64)
            ),
        }
    )
    out = curriculum_order(rd_mod.from_arrow(t)).to_pandas()
    assert sorted(out.order_rank) == list(range(n))  # a permutation
    assert set(out.stage) == {0, 1, 2, 3}
    # stage sizes are balanced (16 each for n=64)
    assert out.groupby("stage").size().tolist() == [16, 16, 16, 16]
    # difficulty never decreases across stage boundaries
    assert out[out.stage == 0].diff_milli.max() <= out[out.stage == 3].diff_milli.min()
    # order walks stages in sequence
    by_order = out.sort_values("order_rank")
    assert (np.diff(by_order.stage.to_numpy()) >= 0).all()
    # within a stage, the shuffle decorrelates from difficulty order
    s0 = by_order[by_order.stage == 0].diff_milli.to_numpy()
    assert not (np.diff(s0) >= 0).all() or not (np.diff(s0) <= 0).all()


def test_fuzzy_pairs_ed2_matches_bruteforce(ray_session):
    """Deletion-neighborhood ed<=2 join == brute-force DP over a small
    vocabulary with planted distance-1, -2 and -3 pairs (the -3 pair
    must NOT appear; transpositions count per plain Levenshtein)."""
    import itertools

    import ray.data as rd_mod

    from vietnamese_ocr_ray.functions.dedup import fuzzy_pairs_ed2
    from vietnamese_ocr_ray.functions.text import levenshtein_np

    vocab = [
        "spark", "spork", "sprk", "shark", "sharks", "quark",
        "query", "queue", "quer", "table", "cable", "stable",
        "tbale", "abcdefg", "xyzdefg", "zzz",
    ]
    docs = pa.table(
        {"text": pa.array([" ".join(vocab), "zzz spark"], pa.string())}
    )
    out = (
        fuzzy_pairs_ed2(rd_mod.from_arrow(docs))
        .to_pandas()
        .sort_values(["w1", "w2"])
        .reset_index(drop=True)
    )
    expect = []
    for a, b in itertools.combinations(sorted(set(vocab)), 2):
        d = levenshtein_np(a, b)
        if 1 <= d <= 2:
            expect.append((a, b, d))
    got = list(out.itertuples(index=False, name=None))
    assert got == sorted(expect)
    # sanity on the planted cases
    pairs = {(a, b) for a, b, _ in got}
    assert ("spark", "spork") in pairs  # substitution, d=1
    assert ("shark", "spark") in pairs  # d=2? h->p only = 1 actually
    assert ("abcdefg", "xyzdefg") not in pairs  # d=3 excluded
    assert ("sprk", "spark") in pairs or ("spark", "sprk") in pairs


def test_isotonic_hourly_matches_reference_pava(ray_session, tmp_path):
    """PAVA fit over a crafted hourly profile: monotone output, pool
    means equal the exact block averages, and the fit matches a
    brute-force isotonic projection (min of suffix averages form)."""
    import pandas as pd_mod

    from vietnamese_ocr_ray.pipelines.analytics import isotonic_hourly

    # hours 0..3 with means 5, 1, 3, 10 -> PAVA pools {0,1} at 3, {2} 3,
    # {3} 10 ... exact values depend on counts; use single events
    ts = pd_mod.to_datetime(
        [f"2024-01-01 0{h}:00:00" for h in [0, 1, 2, 3]]
    )
    pd_mod.DataFrame({"ts": ts, "value": [5.0, 1.0, 3.0, 10.0]}).to_parquet(
        tmp_path / "events.parquet"
    )
    out = isotonic_hourly(str(tmp_path)).to_pandas().sort_values("hour")
    fits = out.fit_micro.to_numpy()
    assert (np.diff(fits) >= 0).all()  # monotone
    # pools: (5,1) violate -> pooled mean 3.0; then 3.0 == 3.0 stays
    # separate (strict violation only); 10 alone
    assert list(fits) == [3_000_000, 3_000_000, 3_000_000, 10_000_000]
    # brute force: isotonic fit y_i = max over j<=i of min over k>=j of
    # avg(v[j..k])
    v = np.array([5.0, 1.0, 3.0, 10.0])
    ref = []
    for i in range(4):
        best = -np.inf
        for j in range(i + 1):
            mn = min(v[j : k + 1].mean() for k in range(j, 4))
            best = max(best, mn)
        ref.append(best)
    assert np.allclose(fits / 1e6, ref)


def test_kn_doc_logprob_reference(ray_session):
    """Per-doc KN bigram log-prob matches an independent scalar
    reference implementation of the interpolated-KN equation on a tiny
    corpus (including a 1-token doc with zero bigrams)."""
    import math
    from collections import Counter

    import ray.data as rd_mod

    from vietnamese_ocr_ray.functions.lm import kn_doc_logprob

    texts = ["a b a c", "b a b", "c", "a b"]
    docs = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
            "text": pa.array(texts),
        }
    )
    out = (
        kn_doc_logprob(rd_mod.from_arrow(docs))
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    # scalar reference
    bigrams = Counter()
    for t in texts:
        w = t.split(" ")
        for i in range(len(w) - 1):
            bigrams[(w[i], w[i + 1])] += 1
    c1 = Counter()
    t1 = Counter()
    t2 = Counter()
    for (a, b), n in bigrams.items():
        c1[a] += n
        t1[a] += 1
        t2[b] += 1
    T = float(sum(t1.values()))
    wn = {
        k: round(
            math.log(
                (n - 0.75) / c1[k[0]] + 0.75 * t1[k[0]] / c1[k[0]] * (t2[k[1]] / T)
            )
            * 1e9
        )
        for k, n in bigrams.items()
    }
    for d, t in enumerate(texts):
        w = t.split(" ")
        ref = sum(wn[(w[i], w[i + 1])] for i in range(len(w) - 1))
        assert out.loc[d, "logp_nano"] == ref, d
        assert out.loc[d, "n_bigrams"] == len(w) - 1
    assert out.loc[2, "logp_nano"] == 0 and out.loc[2, "avg_logp_nano"] == 0


def test_kn_doc_logprob_cogroup_equivalence(ray_session):
    """The broadcast-free cogroup scorer must be bit-identical to the
    broadcast path on every column, including a zero-bigram doc and
    under a hostile multi-block layout."""
    import ray.data as rd_mod

    from vietnamese_ocr_ray.functions.lm import (
        kn_doc_logprob,
        kn_doc_logprob_cogroup,
    )

    texts = ["a b a c", "b a b", "c", "a b", "c a b a", "b c"]
    docs = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts),
        }
    )
    cols = ["doc_id", "n_bigrams", "logp_nano", "avg_logp_nano"]
    base = (
        kn_doc_logprob(rd_mod.from_arrow(docs))
        .to_pandas()[cols]
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    for ds_in in (
        rd_mod.from_arrow(docs),
        rd_mod.from_arrow(docs).repartition(5),
    ):
        cg = (
            kn_doc_logprob_cogroup(ds_in, num_buckets=4)
            .to_pandas()[cols]
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert cg.equals(base)


def test_conformal_threshold_coverage(ray_session, tmp_path):
    """The conformal index is ceil(0.9 * (n+1)) capped at n: with 9
    calibration scores 1..9 the threshold is the 9th (ceil(9) = 9);
    with 19 scores 1..19 it's the 18th; empirical coverage of
    'score <= threshold' is >= 90% of the calibration set."""
    import pandas as pd_mod

    from vietnamese_ocr_ray.pipelines.analytics import conformal_threshold

    ts = pd_mod.to_datetime(["2024-01-01"] * 28)
    pd_mod.DataFrame(
        {
            "ts": ts,
            "event_id": range(28),
            "event_type": ["a"] * 9 + ["b"] * 19,
            "value": [float(v) for v in list(range(1, 10)) + list(range(1, 20))],
        }
    ).to_parquet(tmp_path / "events.parquet")
    out = (
        conformal_threshold(str(tmp_path))
        .to_pandas()
        .set_index("event_type")
    )
    assert out.loc["a", "threshold"] == 9.0  # ceil(0.9*10)=9 -> 9th of 9
    assert out.loc["b", "threshold"] == 18.0  # ceil(0.9*20)=18 -> 18th of 19


def test_rendezvous_shards_hrw_property(ray_session):
    """HRW invariant: removing a shard relocates ONLY that shard's
    rows — every other shard's n_moved is 0, and the dropped shard's
    n_moved equals its row count. Balance stays within a loose band."""
    import ray.data as rd_mod

    from vietnamese_ocr_ray.functions.layout import rendezvous_shards

    ids = pa.table({"doc_id": pa.array(np.arange(4000, dtype=np.int64))})
    out = (
        rendezvous_shards(rd_mod.from_arrow(ids), "doc_id", n_shards=8, drop_shard=3)
        .to_pandas()
        .set_index("shard")
        .sort_index()
    )
    assert out.n_rows.sum() == 4000
    assert out.loc[3, "n_moved"] == out.loc[3, "n_rows"]  # all of shard 3 moves
    assert (out.drop(index=3).n_moved == 0).all()  # nothing else moves
    assert out.n_rows.min() > 300 and out.n_rows.max() < 700  # ~500 each


def test_dtw_hourly_properties(ray_session, tmp_path):
    """DTW of a profile against a 2-hour-shifted copy of itself costs
    far less than the pointwise L1 distance (phase tolerance — the
    point of DTW), the matrix obeys the recurrence, and identical
    profiles align at zero cost."""
    import pandas as pd_mod

    from vietnamese_ocr_ray.pipelines.analytics import dtw_hourly

    rows = []
    counts = [0, 0, 5, 40, 5, 0] + [0] * 18  # a spike at hour 3
    for h, c in enumerate(counts):
        rows += [("click", h)] * c
        shifted = counts[(h - 2) % 24]  # purchase spike at hour 5
        rows += [("purchase", h)] * shifted
    df = pd_mod.DataFrame(rows, columns=["event_type", "hour"])
    df["ts"] = pd_mod.to_datetime("2024-01-01") + pd_mod.to_timedelta(
        df["hour"], unit="h"
    )
    df[["ts", "event_type"]].to_parquet(tmp_path / "events.parquet")

    out = dtw_hourly(str(tmp_path)).to_pandas()
    m = out.set_index(["i", "j"])
    dtw_cost = m.loc[(23, 23), "cum_cost"]
    l1 = sum(
        abs(counts[h] - counts[(h - 2) % 24]) for h in range(24)
    )
    assert dtw_cost < l1  # warping absorbs the phase shift
    # recurrence spot-check at an interior cell
    for i, j in [(3, 5), (10, 10), (23, 1)]:
        expect = m.loc[(i, j), "cell_cost"] + min(
            m.loc[(i - 1, j), "cum_cost"],
            m.loc[(i, j - 1), "cum_cost"],
            m.loc[(i - 1, j - 1), "cum_cost"],
        )
        assert m.loc[(i, j), "cum_cost"] == expect
    # self-alignment is free
    self_out = dtw_hourly(str(tmp_path), "click", "click").to_pandas()
    assert (
        self_out.set_index(["i", "j"]).loc[(23, 23), "cum_cost"] == 0
    )


def test_sliding_distinct_users_window_union(ray_session, tmp_path):
    """A user active in two hours of one window counts ONCE in that
    window (set union, not sum of per-hour distincts)."""
    import pandas as pd_mod

    from vietnamese_ocr_ray.pipelines.analytics import sliding_distinct_users

    base = pd_mod.Timestamp("2024-01-01 00:30:00")
    df = pd_mod.DataFrame(
        {
            "ts": [
                base,                                   # h0: u1
                base,                                   # h0: u2
                base + pd_mod.Timedelta(hours=1),       # h1: u1 (again)
                base + pd_mod.Timedelta(hours=2),       # h2: u3
                base + pd_mod.Timedelta(hours=5),       # h5: u1
            ],
            "user_id": [1, 2, 1, 3, 1],
        }
    )
    df.to_parquet(tmp_path / "events.parquet")
    out = (
        sliding_distinct_users(str(tmp_path))
        .to_pandas()
        .set_index("hour_epoch")["distinct_users_trailing"]
    )
    h0 = int(pd_mod.Timestamp("2024-01-01 00:00:00").value // 10**9 // 3600)
    # window ending at h2 covers h0..h2: users {1, 2, 3} -> 3, u1 once
    assert out[h0 + 2] == 3
    # window ending at h1 covers h0..h1 (u1 deduped): {1, 2} -> 2
    assert out[h0 + 1] == 2
    # h5's window covers only h5 (after the h3/h4 tails): {1}
    assert out[h0 + 5] == 1


def test_bootstrap_ci_value_statistics(ray_session, tmp_path):
    """The bootstrap band brackets the point estimate, narrows with
    sample size, and the Poisson weights average ~1 (resample means
    scatter around the true mean)."""
    import pandas as pd_mod

    from vietnamese_ocr_ray.pipelines.analytics import bootstrap_ci_value

    rng_vals_small = [float(v % 7) for v in range(40)]
    rng_vals_big = [float(v % 7) for v in range(4000)]
    df = pd_mod.DataFrame(
        {
            "event_id": range(4040),
            "event_type": ["small"] * 40 + ["big"] * 4000,
            "value": rng_vals_small + rng_vals_big,
        }
    )
    df.to_parquet(tmp_path / "events.parquet")
    out = (
        bootstrap_ci_value(str(tmp_path))
        .to_pandas()
        .set_index("event_type")
    )
    for et in ("small", "big"):
        r = out.loc[et]
        assert r.boot_lo <= r.mean_value <= r.boot_hi
        assert abs(r.mean_value - np.mean(rng_vals_big)) < 0.5
    width_small = out.loc["small", "boot_hi"] - out.loc["small", "boot_lo"]
    width_big = out.loc["big", "boot_hi"] - out.loc["big", "boot_lo"]
    assert width_big < width_small  # 100x the data -> tighter band


def test_snm_pairs_window_and_boundary(ray_session):
    """SNM: a close pair within the window is found; a close pair
    pushed farther apart than the window in sort order is NOT (the
    recall/bound tradeoff is the contract); block boundaries don't
    drop pairs (forced tiny blocks == single block)."""
    import os as _os

    import ray.data as rd_mod

    from vietnamese_ocr_ray.functions.dedup import snm_pairs

    # reversed-name sort clusters by suffix: "xa","ya" adjacent (d=1);
    # "xa" and "xb" end differently -> separated by the 'b'-suffix run
    # pads end in "za": reversed "az…" sorts BETWEEN the "a…" and
    # "b…" suffix runs, pushing xa/xb out of window range
    names = ["xa", "ya", "xb", "yb"] + [f"pad{i}za" for i in range(8)]
    t = pa.table({"c_name": pa.array(names, pa.string())})
    out = snm_pairs(rd_mod.from_arrow(t), window=3).to_pandas()
    pairs = {(r.w1, r.w2) for r in out.itertuples()}
    assert ("xa", "ya") in pairs and ("xb", "yb") in pairs
    # cross-suffix pair at distance 1 exists ("xa","xb") but sits >
    # window apart in suffix order once the pads intervene -> absent
    assert ("xa", "xb") not in pairs

    # boundary exactness: hostile 3-block layout produces identical
    # results (the prepended-tail contract)
    base = snm_pairs(rd_mod.from_arrow(t), window=3).to_pandas()
    _os.environ["VOR_FORCE_READ_BLOCKS"] = "3"
    try:
        forced = snm_pairs(
            rd_mod.from_arrow(t).repartition(5), window=3
        ).to_pandas()
    finally:
        _os.environ.pop("VOR_FORCE_READ_BLOCKS", None)
    key = lambda d: sorted(map(tuple, d[["w1", "w2", "dist"]].to_numpy()))
    assert key(base) == key(forced)


def test_snm_pairs_subwindow_blocks(ray_session):
    """Windows spanning THREE OR MORE sorted blocks: with ~1-row
    blocks and window=5, block i's context must chain tails from
    blocks i-4..i-1, not just block i-1 (which holds < window-1
    rows). Regression: the single-previous-tail version silently
    dropped the longer-range in-window pairs, making output depend
    on block layout."""
    import ray.data as rd_mod

    from vietnamese_ocr_ray.functions.dedup import snm_pairs

    # one suffix cluster: all names end in "aa" so the reversed sort
    # keeps them adjacent; pairwise edit distances 1-2 within the run
    names = [f"x{c}aa" for c in "bcdefghijklm"]  # 12 close names
    t = pa.table({"c_name": pa.array(names, pa.string())})
    base = snm_pairs(rd_mod.from_arrow(t), window=5).to_pandas()
    many = snm_pairs(
        rd_mod.from_arrow(t).repartition(12), window=5
    ).to_pandas()
    key = lambda d: sorted(map(tuple, d[["w1", "w2", "dist"]].to_numpy()))
    assert key(base) == key(many)
    # sanity: the farthest in-window pair (rank distance window-1 = 4,
    # i.e. spanning 4 single-row blocks) is present
    pairs = {(r.w1, r.w2) for r in base.itertuples()}
    assert ("xbaa", "xfaa") in pairs


def test_voptimal_histogram_dp(ray_session, tmp_path):
    """The DP cost table: more buckets never cost more; a profile with
    exactly 4 constant plateaus is fit PERFECTLY by 4 buckets (cost 0)
    but not by 3; dp[1][23] equals the whole-range SSE fixed point."""
    import pandas as pd_mod

    from vietnamese_ocr_ray.pipelines.analytics import voptimal_histogram

    plateau = [10] * 6 + [50] * 6 + [20] * 6 + [80] * 6
    rows = []
    for h, c in enumerate(plateau):
        rows += [h] * c
    df = pd_mod.DataFrame({"hour": rows})
    df["ts"] = pd_mod.to_datetime("2024-01-01") + pd_mod.to_timedelta(
        df["hour"], unit="h"
    )
    df[["ts"]].to_parquet(tmp_path / "events.parquet")

    out = voptimal_histogram(str(tmp_path)).to_pandas()
    dp = out.set_index(["n_buckets", "prefix_hour"])["cost_fe3"]
    assert dp[(4, 23)] == 0  # 4 plateaus fit exactly
    assert dp[(3, 23)] > 0  # 3 buckets cannot
    for j in (2, 3, 4):
        assert dp[(j, 23)] <= dp[(j - 1, 23)]  # monotone in buckets
    v = np.array(plateau, dtype=np.int64)
    n, s, ss = 24, int(v.sum()), int((v * v).sum())
    assert dp[(1, 23)] == (n * ss - s * s) * 1000 // n


def test_bbit_minhash_estimator_tracks_exact_jaccard(ray_session):
    """On planted duplicate pairs the 1-bit estimator correlates with
    exact Jaccard: identical docs agree on every bit (est 1.0), and a
    mid-similarity pair lands within the b=1 sampling band."""
    import ray.data as rd_mod

    from vietnamese_ocr_ray.functions.dedup import bbit_minhash_pairs

    base = "the quick brown fox jumps over the lazy dog " * 6
    near = base[:-20] + "and then ran far off"  # high-but-<1 jaccard
    docs = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "text": pa.array([base, base, near, "entirely different words " * 8]),
        }
    )
    out = bbit_minhash_pairs(rd_mod.from_arrow(docs)).to_pandas()
    exact_dup = out[(out.doc_id_a == 1) & (out.doc_id_b == 2)]
    assert len(exact_dup) == 1
    assert exact_dup.agree_bits.iloc[0] == 64
    assert exact_dup.est_jaccard_b1.iloc[0] == 1.0
    assert exact_dup.exact_jaccard.iloc[0] == 1.0
    for r in out.itertuples():
        # 1-bit estimator has std ~ 1/sqrt(64): allow a wide band
        assert abs(r.est_jaccard_b1 - r.exact_jaccard) < 0.45


def test_wasserstein_length_matches_scipy_formula(ray_session, tmp_path):
    """The integer W1 matches the classic 1-D formula (sum of |CDF
    gaps| times x-gaps) computed independently; a source identical to
    the global mix scores 0... (it IS part of the mix, so a
    same-shaped source scores near 0 while a shifted source scores
    its shift)."""
    import pandas as pd_mod

    from vietnamese_ocr_ray.pipelines.analytics import wasserstein_length

    # source A: lengths {10, 20} evenly; source B: same shape;
    # source C: shifted by +100
    df = pd_mod.DataFrame(
        {
            "source": ["A"] * 10 + ["B"] * 10 + ["C"] * 10,
            "n_chars": [10, 20] * 10 + [110, 120] * 5,
        }
    )
    df.to_parquet(tmp_path / "documents.parquet")
    out = (
        wasserstein_length(str(tmp_path))
        .to_pandas()
        .set_index("source")["emd_micro"]
    )
    # independent reference: W1 between each source and the global
    def ref_w1(sv, gv):
        xs = np.unique(np.concatenate([sv, gv]))
        num = 0
        for i in range(len(xs) - 1):
            cs = int((sv <= xs[i]).sum())
            cg = int((gv <= xs[i]).sum())
            num += abs(cs * len(gv) - cg * len(sv)) * int(xs[i + 1] - xs[i])
        return num * 10**6 // (len(sv) * len(gv))

    g = df["n_chars"].to_numpy()
    for s in ("A", "B", "C"):
        sv = df[df.source == s]["n_chars"].to_numpy()
        assert out[s] == ref_w1(sv, g), s
    assert out["A"] == out["B"]  # same shape, same drift
    assert out["C"] > out["A"] * 1.5  # the shifted source dominates


def test_ams_f2_estimator_unbiased_band(ray_session):
    """AMS: each Z_j^2 is an unbiased F2 estimate — on a corpus with a
    known F2 the 16-estimator mean lands within a few relative
    standard errors; exact_f2 equals the hand count."""
    import ray.data as rd_mod

    from vietnamese_ocr_ray.functions.sketch import ams_f2_tokens

    # 64 distinct tokens, each appearing 4 times => F2 = 64 * 16 = 1024
    toks = [f"t{i}" for i in range(64)] * 4
    docs = pa.table(
        {
            "doc_id": pa.array([0, 1], pa.int64()),
            "text": pa.array(
                [" ".join(toks[:128]), " ".join(toks[128:])], pa.string()
            ),
        }
    )
    out = ams_f2_tokens(rd_mod.from_arrow(docs)).to_pandas().iloc[0]
    assert out.exact_f2 == 64 * 16
    # var(Z^2) = 2(F2^2 - F4) per estimator; with 16 estimators the
    # relative band is wide but bounded — assert within 4x
    assert out.exact_f2 / 4 <= out.est_f2 <= out.exact_f2 * 4


def test_max_token_run_islands(ray_session):
    """Run-length semantics: interleaved repeats do NOT chain (a a b
    a a a -> run 3 of 'a'); ties report the earliest run's token;
    doc boundaries break runs."""
    import ray.data as rd_mod

    from vietnamese_ocr_ray.functions.text import max_token_run

    docs = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(
                [
                    "a a b a a a c",      # longest run: 'a' x3
                    "x x y y z",           # tie x2/y2 -> earliest: 'x'
                    "q",                   # single token
                ]
            ),
        }
    )
    out = (
        max_token_run(rd_mod.from_arrow(docs))
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert out.loc[1, "max_run"] == 3 and out.loc[1, "run_token"] == "a"
    assert out.loc[2, "max_run"] == 2 and out.loc[2, "run_token"] == "x"
    assert out.loc[3, "max_run"] == 1 and out.loc[3, "run_token"] == "q"


def test_ktruss_peel_triangle_vs_chain(ray_session):
    """3-truss keeps the triangle and sheds the chain hanging off it;
    supports on the surviving triangle are exactly 1; a 4-clique at
    k=4 survives (every edge has 2 witnesses) but k=5 empties it."""
    import ray.data as rd_mod

    from vietnamese_ocr_ray.functions.graph import ktruss_peel

    # triangle 1-2-3 plus a chain 3-4-5
    tri = pa.table(
        {
            "a": pa.array([1, 1, 2, 3, 4], pa.int64()),
            "b": pa.array([2, 3, 3, 4, 5], pa.int64()),
        }
    )
    out = ktruss_peel(rd_mod.from_arrow(tri), k=3).to_pandas()
    kept = sorted(zip(out.a.tolist(), out.b.tolist()))
    assert kept == [(1, 2), (1, 3), (2, 3)]
    assert (out.support == 1).all()

    # 4-clique
    edges = [(i, j) for i in range(1, 5) for j in range(i + 1, 5)]
    cl = pa.table(
        {
            "a": pa.array([e[0] for e in edges], pa.int64()),
            "b": pa.array([e[1] for e in edges], pa.int64()),
        }
    )
    k4 = ktruss_peel(rd_mod.from_arrow(cl), k=4).to_pandas()
    assert len(k4) == 6 and (k4.support == 2).all()
    k5 = ktruss_peel(rd_mod.from_arrow(cl), k=5).to_pandas()
    assert len(k5) == 0


def test_ktruss_peel_nonconverged_support_fresh(ray_session):
    """Round budget exhausted right after a removal round: returned
    support must be RECOMPUTED on the surviving edge set (what the SQL
    oracle does), not the stale pre-removal value. Two triangles
    sharing edge (2,3): at k=4 round 1 keeps only (2,3) whose stale
    support is 2 but whose fresh support on the lone edge is 0."""
    import ray.data as rd_mod

    from vietnamese_ocr_ray.functions.graph import ktruss_peel

    t = pa.table(
        {
            "a": pa.array([1, 1, 2, 2, 3], pa.int64()),
            "b": pa.array([2, 3, 3, 4, 4], pa.int64()),
        }
    )
    out = ktruss_peel(rd_mod.from_arrow(t), k=4, rounds=1).to_pandas()
    assert sorted(zip(out.a.tolist(), out.b.tolist())) == [(2, 3)]
    assert out.support.tolist() == [0]
    # one more round converges to empty — the fresh support is what
    # makes that outcome consistent
    out2 = ktruss_peel(rd_mod.from_arrow(t), k=4, rounds=2).to_pandas()
    assert len(out2) == 0


def test_ktruss_peel_dense_hub(ray_session):
    """Dense-graph chunk sizing: a complete K_24 (every lower endpoint
    a hub — wedge count far exceeds edge count per u) still yields the
    exact support n-2 = 22 on all C(24,2) = 276 edges; the cumulative-
    wedge cut placement must not split a u-group or drop wedges."""
    import ray.data as rd_mod

    from vietnamese_ocr_ray.functions.graph import ktruss_peel

    n = 24
    edges = [(i, j) for i in range(n) for j in range(i + 1, n)]
    t = pa.table(
        {
            "a": pa.array([e[0] for e in edges], pa.int64()),
            "b": pa.array([e[1] for e in edges], pa.int64()),
        }
    )
    out = ktruss_peel(rd_mod.from_arrow(t), k=3).to_pandas()
    assert len(out) == n * (n - 1) // 2
    assert (out.support == n - 2).all()


def test_holtwinters_learns_seasonality(ray_session, tmp_path):
    """On a perfectly periodic 24h pattern, Holt-Winters forecasts
    reproduce the pattern (trend ~ 0, forecast ~= the seasonal value
    for that hour) where trend-only Holt cannot."""
    import pandas as pd_mod

    from vietnamese_ocr_ray.pipelines.relational import holtwinters_forecast

    # 6 days of a pure daily cycle: count = 1 + (hour % 24 == 5) * 20
    rows = []
    for day in range(6):
        for h in range(24):
            n = 21 if h == 5 else 1
            for _ in range(n):
                rows.append(("click", day * 24 + h))
    df = pd_mod.DataFrame(rows, columns=["event_type", "hh"])
    df["ts"] = (
        pd_mod.to_datetime("2024-01-01") + pd_mod.to_timedelta(df["hh"], unit="h")
    ).astype("datetime64[us]")  # match the corpus's microsecond unit
    df[["event_type", "ts"]].to_parquet(tmp_path / "events.parquet")

    out = holtwinters_forecast(str(tmp_path)).to_pandas().iloc[0]
    assert abs(out.trend) < 0.2  # no trend in a pure cycle
    # H = 144, forecasts cover hours 144..146 -> hour-of-day 0..2: lows
    for f in (out.f1, out.f2, out.f3):
        assert abs(f - 1.0) < 1.5
    assert out.n_hours == 144


def test_holtwinters_short_stream_raises(ray_session, tmp_path):
    """A stream spanning fewer than 24 hourly buckets has no seasonal
    profile: documented ValueError, not an IndexError from y[j]."""
    import pandas as pd_mod
    import pytest as pytest_mod

    from vietnamese_ocr_ray.pipelines.relational import holtwinters_forecast

    df = pd_mod.DataFrame(
        {
            "event_type": ["click"] * 6,
            "ts": (
                pd_mod.to_datetime("2024-01-01")
                + pd_mod.to_timedelta(range(6), unit="h")
            ).astype("datetime64[us]"),
        }
    )
    df.to_parquet(tmp_path / "events.parquet")
    with pytest_mod.raises(ValueError, match="24 hourly buckets"):
        holtwinters_forecast(str(tmp_path))


def test_circular_peak_hour_wraps_midnight(ray_session, tmp_path):
    """Events split across 23:00/01:00 resolve to a resultant pointing
    at midnight (C > 0, S ~ 0) with a LARGE Rayleigh z, where a linear
    mean would land at noon; a uniform type scores z ~ 0."""
    import pandas as pd_mod

    from vietnamese_ocr_ray.pipelines.analytics import circular_peak_hour

    rows = []
    base = pd_mod.Timestamp("2024-01-01 00:00:00")
    for _ in range(50):
        rows.append(("night", base + pd_mod.Timedelta(hours=23)))
        rows.append(("night", base + pd_mod.Timedelta(hours=1)))
    for h in range(24):
        rows.append(("uniform", base + pd_mod.Timedelta(hours=h)))
    df = pd_mod.DataFrame(rows, columns=["event_type", "ts"])
    df["ts"] = df["ts"].astype("datetime64[us]")
    df.to_parquet(tmp_path / "events.parquet")

    out = (
        circular_peak_hour(str(tmp_path))
        .to_pandas()
        .set_index("event_type")
    )
    night = out.loc["night"]
    assert night.c_nano > 0 and abs(night.s_nano) < night.c_nano // 10
    # R-bar = cos(15deg) ~ 0.966 -> z = n * 0.933 ~ 93
    assert night.rayleigh_z_micro > 80 * 10**6
    assert night.peak_hour in (1, 23)
    assert out.loc["uniform", "rayleigh_z_micro"] < 10**6  # z < 1


def test_dedup_threshold_curve_monotone(ray_session):
    """The verified count is monotone non-increasing in the cutoff;
    planted exact duplicates survive every cutoff; unrelated docs
    never verify at 0.9."""
    import ray.data as rd_mod

    from vietnamese_ocr_ray.functions.dedup import dedup_threshold_curve

    base = "the quick brown fox jumps over the lazy dog " * 6
    docs = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "text": pa.array(
                [base, base, base[:-30] + "tail changed here",
                 "totally different content " * 8]
            ),
        }
    )
    out = (
        dedup_threshold_curve(rd_mod.from_arrow(docs))
        .to_pandas()
        .sort_values("threshold_pct")
    )
    assert (np.diff(out.n_verified.to_numpy()) <= 0).all()
    assert out.n_candidates.nunique() == 1  # candidates are cutoff-free
    assert out[out.threshold_pct == 90].n_verified.iloc[0] >= 1  # the dup


def test_prf_expand_pulls_in_cooccurring_docs(ray_session):
    """PRF: a doc that shares NO original query term but is saturated
    with a term co-occurring in the feedback docs gets ranked by
    round 2 (score > 0), which plain BM25 gives zero weight."""
    import ray.data as rd_mod

    from vietnamese_ocr_ray.functions.text import prf_expand

    docs = pa.table(
        {
            "doc_id": pa.array(np.arange(8, dtype=np.int64)),
            "text": pa.array(
                [
                    "spark dup cluster cluster",   # feedback doc
                    "spark dup cluster engine",    # feedback doc
                    "spark cluster dup cluster",   # feedback doc
                    "cluster cluster cluster",     # no query term!
                    "unrelated words entirely",
                    "more unrelated filler here",
                    "spark alone here",
                    "dup alone there",
                ]
            ),
        }
    )
    out = prf_expand(
        rd_mod.from_arrow(docs), terms=("spark", "dup"), fb_docs=3, fb_terms=1
    ).to_pandas()
    scores = out.set_index("doc_id")["score_nano"]
    assert scores.get(3, 0) > 0  # expansion term 'cluster' reaches doc 3
    # ranks are 1..k and strictly ordered by (score desc, doc_id)
    assert list(out["rank"]) == list(range(1, len(out) + 1))
    s = out.sort_values(["score_nano", "doc_id"], ascending=[False, True])
    assert list(s.doc_id) == list(out.doc_id)


def test_grouped_split_no_leakage(ray_session):
    """Every row of one user lands in the SAME split; split sizes
    roughly follow 8/1/1; the leak audit reports zero."""
    import ray.data as rd_mod

    from vietnamese_ocr_ray.functions.sampling import grouped_split

    n_users = 400
    ids = np.repeat(np.arange(n_users, dtype=np.int64), 3)  # 3 rows/user
    t = pa.table(
        {
            "user_id": pa.array(ids),
            "event_type": pa.array(
                np.tile(np.array(["a", "b", "c"]), n_users), pa.string()
            ),
        }
    )
    out = grouped_split(rd_mod.from_arrow(t)).to_pandas()
    assert (out.leaked_groups == 0).all()
    by_split = out.groupby("split")[["n_rows", "n_groups"]].sum()
    assert by_split.n_rows.sum() == n_users * 3
    # each user contributes its 3 event types to ONE split: per-split
    # group sums count each user exactly 3x (once per type)
    assert by_split.n_groups.sum() == n_users * 3
    frac_train = by_split.loc[0, "n_rows"] / (n_users * 3)
    assert 0.7 < frac_train < 0.9


def test_dupcluster_shape_chain_vs_clique(ray_session, tmp_path):
    """End-to-end on planted geometry: three identical vectors form a
    clique component (density 1e6); a 3-node path (ends below the 0.4
    cosine cutoff, middle above it to both) forms a chain component
    (2 edges / 3 nodes -> density 666666 ppm, not a clique)."""
    import importlib.util
    import math
    import os as _os

    import pandas as pd_mod

    spec = importlib.util.spec_from_file_location(
        "__ray_entry__",
        _os.path.join(_os.path.dirname(__file__), "..", "__ray_entry__.py"),
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)

    a70 = math.radians(70.0)
    a35 = math.radians(35.0)
    vecs = [
        [1.0, 0.0],                                  # clique x3
        [1.0, 0.0],
        [1.0, 0.0],
        [1.0, 0.0],                                  # chain end A
        [math.cos(a35), math.sin(a35)],              # chain middle
        [math.cos(a70), math.sin(a70)],              # chain end B
    ]
    # separate the two families so they never cross-link: rotate the
    # chain into the other quadrant
    rot = [[-v[1], v[0]] for v in vecs[3:]]
    vecs = vecs[:3] + rot
    pd_mod.DataFrame(
        {
            "vec_id": np.arange(6, dtype=np.int64),
            "embedding": [np.array(v, np.float32) for v in vecs],
            "label": np.zeros(6, np.int32),
        }
    ).to_parquet(tmp_path / "embeddings.parquet")

    out = (
        m.queries()["dupcluster_shape"](str(tmp_path))
        .to_pandas()
        .sort_values("component")
        .reset_index(drop=True)
    )
    assert len(out) == 2
    clique = out[(out.n_nodes == 3) & (out.is_clique == 1)]
    chain = out[out.is_clique == 0]
    assert len(clique) == 1 and clique.density_ppm.iloc[0] == 1_000_000
    assert len(chain) == 1 and chain.n_edges.iloc[0] == 2
    assert chain.density_ppm.iloc[0] == 666_666


def test_decayed_type_counts_freshness(ray_session, tmp_path):
    """An old burst loses to a smaller recent burst under a 12h
    half-life; weights are exact dyadics (24h-old mass counts 1/4)."""
    import pandas as pd_mod

    from vietnamese_ocr_ray.pipelines.analytics import decayed_type_counts

    base = pd_mod.Timestamp("2024-01-02 00:00:00")
    rows = (
        [("old_burst", base - pd_mod.Timedelta(hours=24))] * 100
        + [("recent", base)] * 30
    )
    df = pd_mod.DataFrame(rows, columns=["event_type", "ts"])
    df["ts"] = df["ts"].astype("datetime64[us]")
    df.to_parquet(tmp_path / "events.parquet")
    out = (
        decayed_type_counts(str(tmp_path))
        .to_pandas()
        .set_index("event_type")
    )
    assert out.loc["old_burst", "decayed_count"] == 25.0  # 100 * 2^-2
    assert out.loc["recent", "decayed_count"] == 30.0
    assert out.loc["recent", "rank"] == 1  # freshness wins


def test_lsh_recall_audit_bounds(ray_session):
    """found <= true always; planted exact duplicates are found by
    both engines so recall is 1.0 on an all-dups corpus."""
    import ray.data as rd_mod

    from vietnamese_ocr_ray.functions.dedup import lsh_recall_audit

    base = "alpha beta gamma delta epsilon zeta eta theta " * 8
    docs = pa.table(
        {
            "doc_id": pa.array(np.arange(6, dtype=np.int64)),
            "text": pa.array([base] * 4 + ["other words " * 10] * 2),
        }
    )
    out = lsh_recall_audit(rd_mod.from_arrow(docs)).to_pandas().iloc[0]
    assert out.n_found <= out.n_true
    assert out.n_true >= 6  # C(4,2) identical pairs at least
    assert out.recall_ppm == 1_000_000  # identical docs always collide


def test_custdist_zero_bin(ray_session, tmp_path):
    """Q13 semantics: customers with no orders land in the c_count=0
    bin; the distribution sums to the customer count."""
    import pandas as pd_mod
    import importlib.util
    import os as _os

    spec = importlib.util.spec_from_file_location(
        "__ray_entry__",
        _os.path.join(_os.path.dirname(__file__), "..", "__ray_entry__.py"),
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)

    pd_mod.DataFrame({"c_custkey": [1, 2, 3, 4]}).to_parquet(
        tmp_path / "customer.parquet"
    )
    pd_mod.DataFrame(
        {"o_orderkey": [10, 11, 12], "o_custkey": [1, 1, 2]}
    ).to_parquet(tmp_path / "orders.parquet")
    out = (
        m.queries()["custdist"](str(tmp_path))
        .to_pandas()
        .set_index("c_count")["custdist"]
    )
    assert out[0] == 2 and out[1] == 1 and out[2] == 1
    assert out.sum() == 4


def test_top_supplier_revenue_keeps_ties(ray_session, tmp_path):
    """Two suppliers with identical max revenue are BOTH reported
    (the Q15 tie rule), ordered by suppkey."""
    import pandas as pd_mod

    from vietnamese_ocr_ray.pipelines.relational import top_supplier_revenue

    pd_mod.DataFrame(
        {
            "l_suppkey": [1, 1, 2, 3],
            "l_extendedprice": [100.0, 100.0, 200.0, 50.0],
            "l_discount": [0.0, 0.0, 0.0, 0.0],
        }
    ).to_parquet(tmp_path / "lineitem.parquet")
    pd_mod.DataFrame(
        {
            "s_suppkey": [1, 2, 3],
            "s_name": ["s_one", "s_two", "s_three"],
        }
    ).to_parquet(tmp_path / "supplier.parquet")
    out = top_supplier_revenue(str(tmp_path)).to_pandas()
    assert out["s_suppkey"].tolist() == [1, 2]
    assert out["s_name"].tolist() == ["s_one", "s_two"]
    assert (out["total_revenue"] == 200.0).all()


def test_nation_profit_totals_match_pandas(ray_session):
    """nation_profit_by_year over sf0.001 equals an independent pandas
    join/groupby on the same tables (exact cents arithmetic)."""
    import pandas as pd_mod

    from vietnamese_ocr_ray.pipelines.relational import nation_profit_by_year

    sf = "/root/testdata/sf0.001"
    out = nation_profit_by_year(sf).to_pandas()

    li = pd_mod.read_parquet(f"{sf}/lineitem.parquet")
    orders = pd_mod.read_parquet(f"{sf}/orders.parquet")
    supp = pd_mod.read_parquet(f"{sf}/supplier.parquet")
    nat = pd_mod.read_parquet(f"{sf}/nation.parquet")
    li["rev"] = (li["l_extendedprice"] * 100).round().astype("int64") * (
        100 - (li["l_discount"] * 100).round().astype("int64")
    )
    m = (
        li.merge(orders, left_on="l_orderkey", right_on="o_orderkey")
        .merge(supp, left_on="l_suppkey", right_on="s_suppkey")
        .merge(nat, left_on="s_nationkey", right_on="n_nationkey")
    )
    m["o_year"] = pd_mod.to_datetime(m["o_orderdate"]).dt.year
    ref = (
        m.groupby(["n_name", "o_year"], as_index=False)["rev"]
        .sum()
        .sort_values(["n_name", "o_year"])
        .reset_index(drop=True)
    )
    assert len(out) == len(ref)
    assert out["n_name"].tolist() == ref["n_name"].tolist()
    assert np.allclose(
        out["profit"].to_numpy(), ref["rev"].to_numpy() / 10000.0
    )


def test_market_share_bounds_and_region_scope(ray_session):
    """Shares land in [0, 1]; restricting customers to one region
    means the per-year TOTALS are <= the unrestricted totals (sanity
    of the region filter)."""
    from vietnamese_ocr_ray.pipelines.relational import market_share

    out = market_share("/root/testdata/sf0.001").to_pandas()
    assert len(out) > 0
    assert ((out["mkt_share"] >= 0) & (out["mkt_share"] <= 1)).all()


def test_unicode_script_profile_exact_counts(ray_session):
    """Known mixed-script strings produce exact per-class counts:
    Vietnamese diacritics land in latin_ext, ASCII splits into
    letter/digit/space/punct, CJK falls into other."""
    import ray.data as rd_mod

    from vietnamese_ocr_ray.functions.text import unicode_script_profile

    docs = pa.table(
        {
            "doc_id": pa.array([0, 1], pa.int64()),
            "text": pa.array(["ab 12!", "việt 漢"]),
            "lang": pa.array(["en", "vi"]),
        }
    )
    out = (
        unicode_script_profile(rd_mod.from_arrow(docs))
        .to_pandas()
        .set_index(["lang", "char_class"])["n_chars"]
    )
    # "ab 12!": 2 letters, 2 digits, 1 space, 1 punct
    assert out[("en", "ascii_letter")] == 2
    assert out[("en", "digit")] == 2
    assert out[("en", "space")] == 1
    assert out[("en", "punct_symbol")] == 1
    # "việt 漢": v,t ascii; ệ,i? — i is ascii, ệ latin_ext; 漢 other
    assert out[("vi", "ascii_letter")] == 3  # v, i, t
    assert out[("vi", "latin_ext")] == 1  # ệ
    assert out[("vi", "other")] == 1  # 漢
    assert out[("vi", "space")] == 1


def test_l_diversity_flags_uniform_class(ray_session, tmp_path):
    """A QI class whose members all share one balance band is flagged
    (diverse = 0) even though it is k-anonymous; a mixed class with 3
    bands passes."""
    import pandas as pd_mod

    from vietnamese_ocr_ray.pipelines.analytics import l_diversity

    pd_mod.DataFrame(
        {
            "c_nationkey": [1] * 4 + [2] * 4,
            "c_mktsegment": ["A"] * 4 + ["B"] * 4,
            # class (1, A): all in the same $1000 band; (2, B): 3 bands
            "c_acctbal": [1100.0, 1200.0, 1300.0, 1400.0,
                          500.0, 1500.0, 2500.0, 2600.0],
        }
    ).to_parquet(tmp_path / "customer.parquet")
    out = (
        l_diversity(str(tmp_path))
        .to_pandas()
        .set_index("c_nationkey")
    )
    assert out.loc[1, "l_distinct"] == 1 and out.loc[1, "diverse"] == 0
    assert out.loc[2, "l_distinct"] == 3 and out.loc[2, "diverse"] == 1


def test_dup_modularity_partition_arithmetic(ray_session):
    """Planted graph: sources X (a clique among its own docs) and Y/Z
    bridged by every remaining edge. Exact counts: terms follow the
    e/m - (d/2m)^2 formula; the term SUM over sources equals the
    global Newman Q."""
    import ray.data as rd_mod

    from vietnamese_ocr_ray.functions.graph import dup_modularity_by_source

    # docs 0-2 source X, 3-4 source Y
    docs = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
            "source": pa.array(["X", "X", "X", "Y", "Y"]),
        }
    )
    # edges: X-clique (0-1, 0-2, 1-2) + bridges (2-3, 2-4)
    pairs = pa.table(
        {
            "a": pa.array([0, 0, 1, 2, 2], pa.int64()),
            "b": pa.array([1, 2, 2, 3, 4], pa.int64()),
        }
    )
    out = (
        dup_modularity_by_source(
            rd_mod.from_arrow(pairs), rd_mod.from_arrow(docs)
        )
        .to_pandas()
        .set_index("source")
    )
    m = 5
    assert out.loc["X", "within_edges"] == 3
    assert out.loc["X", "degree_sum"] == 8  # 2+2+4 endpoints... (0:2,1:2,2:4)
    assert out.loc["Y", "within_edges"] == 0
    assert out.loc["Y", "degree_sum"] == 2
    import numpy as np_mod

    for s in ("X", "Y"):
        e, d = out.loc[s, "within_edges"], out.loc[s, "degree_sum"]
        expect = round(e / m - (d / (2 * m)) ** 2, 6)
        assert abs(out.loc[s, "modularity_term"] - expect) < 1e-9


def test_common_prefix_clusters_threshold(ray_session):
    """Docs sharing a 12-codepoint opening cluster together (Unicode
    text included); groups below min_docs are dropped."""
    import ray.data as rd_mod

    from vietnamese_ocr_ray.functions.corpus import common_prefix_clusters

    intro = "kính gửi quý"  # 12 codepoints with diacritics
    texts = [intro + " khách A", intro + " khách B", intro + " khách C",
             "unrelated document one", "unrelated document two"]
    docs = pa.table(
        {
            "doc_id": pa.array(range(5), pa.int64()),
            "text": pa.array(texts),
        }
    )
    out = common_prefix_clusters(
        rd_mod.from_arrow(docs), min_docs=3
    ).to_pandas()
    assert len(out) == 1
    assert out.iloc[0]["prefix"] == intro
    assert out.iloc[0]["n_docs"] == 3 and out.iloc[0]["min_doc_id"] == 0


def test_crossdoc_gram_dup_planted(ray_session):
    """Planted exact-substring duplication: a 40-char passage shared
    by docs 0 and 1 makes every one of its 16-byte grams duplicated
    in both; doc 2 (unique text) scores 0; a doc that IS the shared
    passage verbatim scores 1e6 ppm."""
    import ray.data as rd_mod

    from vietnamese_ocr_ray.functions.dedup import crossdoc_gram_dup

    shared = "the quick brown fox jumps over the dog!"  # 39 chars
    texts = [
        "AAA " + shared + " tail one unique alpha",
        "BBB " + shared + " tail two unique beta",
        "completely different text with nothing in common here at all",
        shared,
    ]
    docs = pa.table(
        {
            "doc_id": pa.array(range(4), pa.int64()),
            "text": pa.array(texts),
        }
    )
    out = (
        crossdoc_gram_dup(rd_mod.from_arrow(docs).repartition(3))
        .to_pandas()
        .set_index("doc_id")
    )
    # doc 3 is a strict substring of docs 0/1: every gram duplicated
    assert out.loc[3, "dup_ppm"] == 1_000_000
    assert out.loc[2, "n_dup_grams"] == 0 and out.loc[2, "dup_ppm"] == 0
    # docs 0/1 share the passage's grams (39 - 15 = 24 windows) at least
    assert out.loc[0, "n_dup_grams"] >= 24
    assert 0 < out.loc[0, "dup_ppm"] < 1_000_000


def test_dedup_gram_survivors_drops_verbatim_doc(ray_session):
    """The verbatim-substring doc (dup_ppm = 1e6) is dropped at the
    0.8 cut; partially-overlapping and unique docs survive."""
    import ray.data as rd_mod

    from vietnamese_ocr_ray.functions.dedup import dedup_gram_survivors

    shared = "the quick brown fox jumps over the dog!"
    texts = [
        "AAA " + shared + " tail one unique alpha",
        "BBB " + shared + " tail two unique beta",
        "completely different text with nothing in common here at all",
        shared,
    ]
    docs = pa.table(
        {
            "doc_id": pa.array(range(4), pa.int64()),
            "text": pa.array(texts),
        }
    )
    out = dedup_gram_survivors(rd_mod.from_arrow(docs)).to_pandas()
    assert out["doc_id"].tolist() == [0, 1, 2]


def test_bigram_entropy_rate_degenerate_and_uniform(ray_session):
    """A fully deterministic chain ('a b a b ...') has H(W2|W1) = 0;
    a uniform 2-way branch gives exactly ln 2 per step."""
    import math

    import ray.data as rd_mod

    from vietnamese_ocr_ray.functions.lm import bigram_entropy_rate

    det = pa.table(
        {
            "doc_id": pa.array([0], pa.int64()),
            "text": pa.array(["a b a b a b a b a b"]),
        }
    )
    out = bigram_entropy_rate(rd_mod.from_arrow(det)).to_pandas().iloc[0]
    assert out.entropy_rate_nats == 0.0

    # from 'x' go to 'y' or 'z' equally often; y/z always return to x
    uni = pa.table(
        {
            "doc_id": pa.array([0], pa.int64()),
            "text": pa.array(["x y x z x y x z x y x z x y x z x"]),
        }
    )
    out = bigram_entropy_rate(rd_mod.from_arrow(uni)).to_pandas().iloc[0]
    # of 16 bigrams, the 8 x->{y,z} carry ln 2 each; the returns carry 0
    expect = round(8 * math.log(2) / 16, 6)
    assert abs(out.entropy_rate_nats - expect) < 1e-6


def test_burstiness_fano_poisson_vs_burst(ray_session, tmp_path):
    """A type with all events in ONE hour of a long span has Fano >> 1;
    a perfectly uniform one-per-hour type has Fano < 1 (variance 0
    within present hours, only span zeros contribute)."""
    import pandas as pd_mod

    from vietnamese_ocr_ray.pipelines.relational import burstiness_fano

    base = pd_mod.to_datetime("2024-01-01")
    rows = []
    for h in range(48):  # uniform: one per hour for 48h
        rows.append(("steady", base + pd_mod.to_timedelta(h, unit="h")))
    for _ in range(48):  # burst: 48 events in hour 0
        rows.append(("burst", base))
    df = pd_mod.DataFrame(rows, columns=["event_type", "ts"])
    df["ts"] = df["ts"].astype("datetime64[us]")
    df.to_parquet(tmp_path / "events.parquet")
    out = (
        burstiness_fano(str(tmp_path)).to_pandas().set_index("event_type")
    )
    # steady: H=48, Sx=48, Sxx=48 -> F = (48*48-48^2)/(48*48) = 0
    assert out.loc["steady", "fano"] == 0.0
    # burst: Sxx = 48^2 -> F = (48*2304 - 2304)/(48*48) = 47
    assert out.loc["burst", "fano"] == 47.0


def test_hapax_ratio_exact(ray_session):
    """Known token multiset: hapax counts and floor-ppm exact."""
    import ray.data as rd_mod

    from vietnamese_ocr_ray.functions.lm import hapax_ratio

    docs = pa.table(
        {
            "doc_id": pa.array([0, 1], pa.int64()),
            "text": pa.array(["a a b c", "d d d e"]),
            "lang": pa.array(["en", "en"]),
        }
    )
    out = hapax_ratio(rd_mod.from_arrow(docs)).to_pandas().iloc[0]
    # types: a, b, c, d, e -> 5; hapax: b, c, e -> 3
    assert out.n_types == 5 and out.n_hapax == 3
    assert out.hapax_ppm == 1_000_000 * 3 // 5


def test_pq_recall_audit_blob_perfect(ray_session):
    """On well-separated blobs the exact top-1 must appear in the PQ
    list (blob-level recall: all near vectors collapse to the same
    codes, so ties break by vec_id and the query vector itself — the
    lowest id in its blob here — ranks first). Exact set-overlap
    beyond that is NOT guaranteed once codes collapse, which is
    precisely what the audit measures."""
    import ray.data as rd_mod

    from vietnamese_ocr_ray.functions.kmeans import pq_recall_audit

    rng = np.random.default_rng(5)
    centers = rng.standard_normal((4, 32)) * 4
    vecs = np.vstack(
        [c + 0.05 * rng.standard_normal((25, 32)) for c in centers]
    )
    t = pa.table(
        {
            "vec_id": pa.array(range(100), pa.int64()),
            "embedding": pa.array(
                [v.astype(np.float32) for v in vecs], pa.list_(pa.float32())
            ),
        }
    )
    q = vecs[0].astype(np.float32).astype(np.float64)
    out = pq_recall_audit(
        rd_mod.from_arrow(t).repartition(4), q, k=5, n_sub=4, ks=8
    ).to_pandas().iloc[0]
    assert out.top1_rank == 1  # exact top-1 leads the PQ list
    assert out.n_hits >= 1
    assert out.rr_ppm == 1_000_000 // out.top1_rank


def test_minhash_probe_pairs_incremental_contract(ray_session):
    """Probe docs pair with near-dup INDEX docs; two probe docs that
    are near-dups of each other must NOT pair (their collision was not
    the ingest's business), nor do index-index pairs appear."""
    import ray.data as rd_mod

    from vietnamese_ocr_ray.functions.dedup import minhash_probe_pairs
    from vietnamese_ocr_ray.functions.sampling import FP_MOD, _poly_hash

    def is_index(doc_id: int, permille=800, salt="ix:") -> bool:
        fp = int(
            _poly_hash(pa.array([f"{salt}{doc_id}"]))[0]
        )
        return (fp * fp % FP_MOD) * fp % FP_MOD % 1000 < permille

    # find two index ids and two probe ids deterministically
    idx_ids = [i for i in range(200) if is_index(i)][:2]
    prb_ids = [i for i in range(200) if not is_index(i)][:2]
    base = "the quick brown fox jumps over the lazy dog again and again"
    uniq = "completely unrelated filler text about something else entirely"
    rows = {
        idx_ids[0]: base + " alpha",
        idx_ids[1]: uniq,
        prb_ids[0]: base + " beta",   # near-dup of idx_ids[0]
        prb_ids[1]: base + " gamma",  # near-dup of idx_ids[0] AND prb_ids[0]
    }
    docs = pa.table(
        {
            "doc_id": pa.array(list(rows), pa.int64()),
            "text": pa.array(list(rows.values())),
        }
    )
    out = minhash_probe_pairs(rd_mod.from_arrow(docs)).to_pandas()
    pairs = {(int(r.a), int(r.b)) for r in out.itertuples()}
    assert (idx_ids[0], prb_ids[0]) in pairs
    assert (idx_ids[0], prb_ids[1]) in pairs
    # probe-probe and index-index never pair
    for a, b in pairs:
        assert is_index(a) and not is_index(b)


def test_rle_compress_ratio_degenerate_vs_fresh(ray_session):
    """'aaaa' is one run (250k ppm at 4 chars); all-distinct text is
    1e6 ppm; Unicode runs count codepoints, not bytes."""
    import ray.data as rd_mod

    from vietnamese_ocr_ray.functions.text import rle_compress_ratio

    docs = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": pa.array(["aaaa", "abcd", "ạạạb"]),
        }
    )
    out = (
        rle_compress_ratio(rd_mod.from_arrow(docs))
        .to_pandas()
        .set_index("doc_id")
    )
    assert out.loc[0, "n_runs"] == 1 and out.loc[0, "run_ppm"] == 250_000
    assert out.loc[1, "n_runs"] == 4 and out.loc[1, "run_ppm"] == 1_000_000
    # 'ạạạb': runs = [ạạạ][b] = 2 over 4 chars (multibyte chars are
    # single codepoints, not byte runs)
    assert out.loc[2, "n_runs"] == 2 and out.loc[2, "run_ppm"] == 500_000


def test_lang_confusion_diagonal_heavy(ray_session):
    """On the labeled corpus the confusion table's diagonal carries
    most mass (the marker heuristic works) and counts sum to n_docs."""
    out = None
    import ray.data as rd_mod

    from vietnamese_ocr_ray.functions.text import lang_confusion
    from vietnamese_ocr_ray.sources.storage import read_parquet_clean

    ds = read_parquet_clean(
        "/root/testdata/sf0.001/documents.parquet",
        columns=["doc_id", "text", "lang"],
    )
    out = lang_confusion(ds).to_pandas()
    total = out["n_docs"].sum()
    diag = out.loc[out["lang"] == out["lang_pred"], "n_docs"].sum()
    assert total == 500
    assert diag > 0
    # the heuristic has no zh markers: every zh doc lands off-diagonal
    # — exactly the misrouting this audit exists to expose
    import pyarrow.parquet as pq_mod

    n_zh = (
        pq_mod.read_table(
            "/root/testdata/sf0.001/documents.parquet", columns=["lang"]
        )
        .column("lang")
        .to_pandas()
        .eq("zh")
        .sum()
    )
    zh = out[out["lang"] == "zh"]
    assert zh["n_docs"].sum() == n_zh
    assert (zh["lang_pred"] != "zh").all()


def test_graph_diameter_est_path_graph(ray_session):
    """On a pure path (ids 0..9, only the +1 rule fires below 10..),
    the double sweep is EXACT: ecc from node 0 is 9, the farthest
    node is 9, and the second sweep returns the true diameter 9."""
    import ray.data as rd_mod

    from vietnamese_ocr_ray.functions.graph import graph_diameter_est

    docs = pa.table({"doc_id": pa.array(range(10), pa.int64())})
    out = graph_diameter_est(rd_mod.from_arrow(docs)).to_pandas().iloc[0]
    # +10/+100 shortcuts need targets that exist; ids 0..9 only have +1
    # edges except 0->10 etc. which drop -> a pure path
    assert out.src == 0 and out.ecc_src == 9
    assert out.far_node == 9 and out.diameter_lb == 9
