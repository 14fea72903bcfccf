"""Property-based tests (hypothesis): the renderer/recognizer inversion
must hold for EVERY alphabet text and height, and the vectorized
Levenshtein must equal a brute-force reference DP."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from vietnamese_ocr_ray.functions.text import levenshtein_np
from vietnamese_ocr_ray.model import DeterministicRecognizer
from vietnamese_ocr_ray.preprocess import preprocess_one
from vietnamese_ocr_ray.synth import render_text
from vietnamese_ocr_ray.vocab import ALPHABET, MAX_TEXT_LEN, Vocabulary

_MODEL = DeterministicRecognizer()

alphabet_text = st.text(alphabet=ALPHABET, min_size=0, max_size=MAX_TEXT_LEN)


@settings(max_examples=60, deadline=None)
@given(text=alphabet_text, height=st.sampled_from([32, 64]), ref=st.integers(0, 10**9))
def test_render_recognize_inversion(text, height, ref):
    img = render_text(text, height)
    x = preprocess_one(img, f"m-{ref}")
    assert _MODEL.recognize_texts(x[None])[0].as_py() == text


@settings(max_examples=100, deadline=None)
@given(a=st.text(max_size=12), b=st.text(max_size=12))
def test_levenshtein_matches_bruteforce(a, b):
    def ref_dp(p, r):
        dp = [[0] * (len(r) + 1) for _ in range(len(p) + 1)]
        for i in range(len(p) + 1):
            dp[i][0] = i
        for j in range(len(r) + 1):
            dp[0][j] = j
        for i in range(1, len(p) + 1):
            for j in range(1, len(r) + 1):
                if p[i - 1] == r[j - 1]:
                    dp[i][j] = dp[i - 1][j - 1]
                else:
                    dp[i][j] = min(dp[i - 1][j], dp[i][j - 1], dp[i - 1][j - 1]) + 1
        return dp[-1][-1]

    assert levenshtein_np(a, b) == ref_dp(a, b)


@settings(max_examples=50, deadline=None)
@given(text=alphabet_text)
def test_vocab_roundtrip(text):
    v = Vocabulary()
    assert v.decode(v.encode(text)) == text


@settings(max_examples=30, deadline=None)
@given(
    texts=st.lists(alphabet_text, min_size=1, max_size=8),
    height=st.sampled_from([32, 64]),
)
def test_batch_recognition_matches_per_row(texts, height):
    imgs = [render_text(t, height) for t in texts]
    x = np.stack([preprocess_one(im, f"m-{i}") for i, im in enumerate(imgs)])
    batch_out = _MODEL.recognize_texts(x).to_pylist()
    assert batch_out == texts


def test_fnv_bucket_deterministic_across_processes():
    # fnv1a_bucket must be content-derived (Python's hash() is salted)
    import pyarrow as pa

    from vietnamese_ocr_ray.stages.explode import fnv1a_bucket

    arr = pa.array(["doc-1", "doc-2", "m-33-0", ""])
    b = fnv1a_bucket(arr, 64)
    assert list(b) == list(fnv1a_bucket(arr, 64))
    # regression pin: values must never change across releases (they
    # define partition placement for resume)
    assert b.dtype == np.int32


@given(
    st.lists(
        st.tuples(
            st.integers(0, 5),            # key
            st.integers(0, 200),          # left time
        ),
        min_size=1,
        max_size=40,
    ),
    st.lists(
        st.tuples(
            st.integers(0, 6),
            st.integers(0, 200),
        ),
        min_size=1,
        max_size=40,
        unique=True,
    ),
)
@settings(max_examples=12, deadline=None)
def test_asof_join_matches_merge_asof(ray_session, left_rows, right_rows):
    import pandas as pd
    import ray.data as rd

    from vietnamese_ocr_ray.functions.joins import asof_join

    left = pd.DataFrame(left_rows, columns=["k", "t"]).assign(
        lv=lambda d: range(len(d))
    )
    right = (
        pd.DataFrame(right_rows, columns=["k", "rt"])
        .drop_duplicates(["k", "rt"])
        .assign(rv=lambda d: range(len(d)))
    )
    got = (
        asof_join(
            rd.from_pandas(left),
            rd.from_pandas(right),
            by="k",
            left_on="t",
            right_on="rt",
            num_buckets=3,
        )
        .to_pandas()
    )
    exp = pd.merge_asof(
        left.sort_values("t", kind="stable"),
        right.sort_values("rt", kind="stable").assign(_hit=1),
        left_on="t",
        right_on="rt",
        by="k",
        direction="backward",
    )
    exp = exp[exp["_hit"].notna()].drop(columns="_hit")
    exp[["rt", "rv"]] = exp[["rt", "rv"]].astype("int64")
    exp = exp.sort_values(["k", "t", "lv"]).reset_index(drop=True)
    if len(exp) == 0:
        # Ray loses the schema of fully-empty datasets at to_pandas
        # (see joins._ensure_schema docstring) — check emptiness only
        assert len(got) == 0
        return
    got = got.sort_values(["k", "t", "lv"]).reset_index(drop=True)
    assert got[exp.columns.tolist()].values.tolist() == exp.values.tolist()


@given(
    st.lists(st.tuples(st.integers(0, 4), st.integers(0, 100)), min_size=1, max_size=30),
    st.lists(st.tuples(st.integers(0, 5), st.integers(0, 100)), min_size=0, max_size=30),
    st.integers(0, 20),
)
@settings(max_examples=10, deadline=None)
def test_range_count_join_matches_bruteforce_prop(ray_session, lrows, rrows, width):
    import pandas as pd
    import ray.data as rd

    from vietnamese_ocr_ray.functions.joins import range_count_join

    left = pd.DataFrame(lrows, columns=["k", "t"]).assign(lv=lambda d: range(len(d)))
    left["t"] = left["t"].astype("datetime64[us]")
    right = pd.DataFrame(rrows, columns=["k", "rt"])
    if len(right) == 0:
        right = pd.DataFrame({"k": pd.array([], dtype="int64"), "rt": pd.array([], dtype="int64")})
    right["rt"] = right["rt"].astype("datetime64[us]")
    got = (
        range_count_join(
            rd.from_pandas(left),
            rd.from_pandas(right),
            by="k",
            left_on="t",
            right_on="rt",
            lo_us=0,
            hi_us=width + 1,
            num_buckets=3,
        )
        .to_pandas()
        .sort_values("lv")["n_in_range"]
        .tolist()
    )
    lo, hi = pd.Timedelta(microseconds=0), pd.Timedelta(microseconds=width + 1)
    exp = [
        int(((right.k == r.k) & (right.rt >= r.t + lo) & (right.rt < r.t + hi)).sum())
        for r in left.itertuples()
    ]
    assert got == exp


@given(
    st.lists(
        st.tuples(st.sampled_from(["a", "b", "c", "d"]), st.integers(-50, 50)),
        min_size=1,
        max_size=50,
    )
)
@settings(max_examples=10, deadline=None)
def test_hash_aggregate_matches_pandas_prop(ray_session, rows):
    import pandas as pd
    import ray.data as rd

    from vietnamese_ocr_ray.functions.agg import hash_aggregate

    df = pd.DataFrame(rows, columns=["k", "v"])
    got = (
        hash_aggregate(
            rd.from_pandas(df),
            ["k"],
            {"s": ("v", "sum"), "mn": ("v", "min"), "n": ("v", "count")},
            num_buckets=3,
        )
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    exp = (
        df.groupby("k", as_index=False)
        .agg(s=("v", "sum"), mn=("v", "min"), n=("v", "size"))
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert got[["k", "s", "mn", "n"]].astype(object).values.tolist() == exp.astype(object).values.tolist()


@given(st.lists(st.text(alphabet="abc XYZ09", max_size=40), min_size=1, max_size=10))
@settings(max_examples=20, deadline=None)
def test_simhash_tokens_matches_python_reference(texts):
    import pyarrow as pa

    from vietnamese_ocr_ray.functions.dedup import (
        SIMHASH_BITS,
        SIMHASH_CAP,
        SIMHASH_P,
        _POW31,
        simhash_tokens_batch,
    )

    t = pa.table({"doc_id": list(range(len(texts))), "text": texts})
    got = simhash_tokens_batch(t).column("simhash30").to_pylist()
    for i, s in enumerate(texts):
        votes = [0] * SIMHASH_BITS
        for tok in s.split(" "):
            h = 0
            for j, c in enumerate(tok[:SIMHASH_CAP]):
                h = (h + ord(c) * int(_POW31[j])) % SIMHASH_P
            for b in range(SIMHASH_BITS):
                votes[b] += 1 if (h >> b) & 1 else -1
        fp = sum(1 << b for b in range(SIMHASH_BITS) if votes[b] > 0)
        assert got[i] == fp, (s, got[i], fp)


@settings(max_examples=40, deadline=None)
@given(
    pairs=st.lists(
        st.tuples(st.text(max_size=20), st.text(max_size=20)),
        min_size=1,
        max_size=12,
    )
)
def test_levenshtein_batch_matches_scalar_property(pairs):
    from vietnamese_ocr_ray.functions.text import levenshtein_batch

    preds = [p for p, _ in pairs]
    targets = [t for _, t in pairs]
    got = levenshtein_batch(preds, targets)
    for i, (p, t) in enumerate(pairs):
        assert got[i] == levenshtein_np(p, t)


@settings(max_examples=40, deadline=None)
@given(
    pairs=st.lists(
        st.tuples(st.text(max_size=30), st.text(max_size=30)),
        min_size=1,
        max_size=10,
    )
)
def test_jaccard_batches_match_scalars_property(pairs):
    import pyarrow as pa

    from vietnamese_ocr_ray.functions.dedup import (
        jaccard_shingles,
        jaccard_shingles_batch,
        word_jaccard_batch,
    )

    a = pa.array([p for p, _ in pairs], pa.string())
    b = pa.array([t for _, t in pairs], pa.string())
    got_sh = jaccard_shingles_batch(a, b)
    got_w = word_jaccard_batch(a, b)
    for i, (p, t) in enumerate(pairs):
        assert abs(got_sh[i] - jaccard_shingles(p, t)) < 1e-12
        sa, sb = set(p.split(" ")), set(t.split(" "))
        union = len(sa | sb)
        expect = (len(sa & sb) / union) if union else 1.0
        assert abs(got_w[i] - expect) < 1e-12


# --- round-2 web-op kernels -------------------------------------------------

words = st.lists(
    st.text(
        alphabet=st.characters(min_codepoint=33, max_codepoint=0x2FF),
        min_size=1,
        max_size=8,
    ).filter(lambda w: " " not in w),
    min_size=1,
    max_size=120,
)


@settings(max_examples=60, deadline=None)
@given(toks=words)
def test_chunk_windows_match_python_reference(toks):
    import pyarrow as pa

    from vietnamese_ocr_ray.functions.chunk import CHUNK, STRIDE, doc_chunks_batch

    text = " ".join(toks)
    t = pa.table(
        {"doc_id": pa.array([1], pa.int64()), "text": pa.array([text])}
    )
    out = doc_chunks_batch(t)
    n = len(toks)
    k = 1 + max(0, -(-(n - CHUNK) // STRIDE)) if n > CHUNK else 1
    assert out.num_rows == k
    for j in range(k):
        want = toks[j * STRIDE : j * STRIDE + CHUNK]
        assert out.column("chunk_text").to_pylist()[j] == " ".join(want)
        assert out.column("n_tokens").to_pylist()[j] == len(want)


@settings(max_examples=60, deadline=None)
@given(
    body=st.text(
        alphabet=st.characters(min_codepoint=32, max_codepoint=0x2FF),
        max_size=60,
    ).filter(lambda s: "@" not in s),
    doc_id=st.integers(0, 10**6),
)
def test_pii_synth_redact_roundtrip(body, doc_id):
    """Whatever the body text, the planted PII is found and redacted,
    and the body survives redaction untouched (it contains no '@';
    digit runs in the body may legitimately match phone/IP forms, so
    counts are >= the planted ones but the email count is exact)."""
    import pyarrow as pa

    from vietnamese_ocr_ray.functions.pii import pii_redact_batch

    t = pa.table(
        {
            "doc_id": pa.array([doc_id], pa.int64()),
            "source": pa.array(["web"]),
            "text": pa.array([body]),
        }
    )
    out = pii_redact_batch(t)
    assert out.column("n_emails").to_pylist() == [1]
    assert out.column("n_phones").to_pylist()[0] >= 1
    assert out.column("n_ips").to_pylist()[0] >= 1
    clean = out.column("clean_text").to_pylist()[0]
    assert "<EMAIL>" in clean and "<IP>" in clean and "<PHONE>" in clean
    assert "@" not in clean


@settings(max_examples=60, deadline=None)
@given(
    h=st.integers(2, 40),
    w=st.integers(2, 40),
    seed=st.integers(0, 10**9),
)
def test_perceptual_hashes_match_naive_reference(h, w, seed):
    """ImageAHash / ImageColHash integer bit rule == a naive per-cell
    double loop (cell_sum * n_pixels > total * cell_area) for ANY
    image shape, including cells whose floor boundaries collapse to
    zero width."""
    from vietnamese_ocr_ray.stages.multimodal import ImageAHash, ImageColHash

    rng = np.random.default_rng(seed)
    v = rng.integers(0, 256, (h, w), np.uint8)
    x = v.astype(np.int64)
    total = int(x.sum())
    npx = h * w

    def naive(grid_y, grid_x):
        ys = [int(np.floor(h * r / grid_y)) for r in range(grid_y + 1)]
        xs = [int(np.floor(w * c / grid_x)) for c in range(grid_x + 1)]
        bits = 0
        k = 0
        for r in range(grid_y):
            for c in range(grid_x):
                s = int(x[ys[r] : ys[r + 1], xs[c] : xs[c + 1]].sum())
                area = (ys[r + 1] - ys[r]) * (xs[c + 1] - xs[c])
                if s * npx > total * area:
                    bits |= 1 << k
                k += 1
        return int(np.uint64(bits).astype(np.int64))

    assert ImageAHash().hash_one(v) == naive(8, 8)
    assert ImageColHash().hash_one(v) == naive(1, 64)


@settings(max_examples=150, deadline=None)
@given(
    data=st.lists(
        st.tuples(
            st.floats(-8, 8, allow_nan=False, width=32),
            st.floats(-8, 8, allow_nan=False, width=32),
        ),
        min_size=1,
        max_size=64,
    )
)
def test_fit2_closed_matches_eigh_property(data):
    """The closed-form 2x2 eigensolver (pca.py::_fit2_closed) must, for
    ANY exact integer moments derived from real data: return exactly
    orthogonal unit axes, satisfy the eigen equation for the top axis,
    and agree with numpy eigh's dominant direction whenever the
    spectrum isn't near-degenerate."""
    from vietnamese_ocr_ray.functions.pca import _fit2_closed

    x = np.asarray(data, np.float64)
    q = np.floor(x * 1_000_000 + 0.5).astype(np.int64)
    n = len(q)
    s0, s1 = int(q[:, 0].sum()), int(q[:, 1].sum())
    ss00 = int((q[:, 0].astype(object) * q[:, 0]).sum())
    ss01 = int((q[:, 0].astype(object) * q[:, 1]).sum())
    ss11 = int((q[:, 1].astype(object) * q[:, 1]).sum())
    m0, m1, w00, w10, w01, w11 = _fit2_closed(n, s0, s1, ss00, ss01, ss11)

    # exact rotation construction: dot is EXACTLY zero in floats
    assert w00 * w01 + w10 * w11 == 0.0
    assert abs(w00 * w00 + w10 * w10 - 1.0) < 1e-12
    assert abs(w01 * w01 + w11 * w11 - 1.0) < 1e-12
    # sign convention: largest-|.| component of each axis positive
    for u0, u1 in ((w00, w10), (w01, w11)):
        assert (u0 if abs(u0) >= abs(u1) else u1) >= 0

    a = (ss00 / n - (s0 / n) * (s0 / n)) / 1e12
    b = (ss01 / n - (s0 / n) * (s1 / n)) / 1e12
    c = (ss11 / n - (s1 / n) * (s1 / n)) / 1e12
    A = np.array([[a, b], [b, c]])
    evals, evecs = np.linalg.eigh(A)
    scale = max(abs(evals[0]), abs(evals[1]), 1e-30)
    # top-axis eigen equation (residual relative to the spectrum)
    lam1 = float(evals[1])
    r = A @ np.array([w00, w10]) - lam1 * np.array([w00, w10])
    assert np.abs(r).max() <= 1e-9 * scale + 1e-18
    # direction agreement with eigh outside near-degeneracy
    if (evals[1] - evals[0]) > 1e-6 * scale:
        assert abs(np.dot(evecs[:, 1], [w00, w10])) > 1 - 1e-6


@given(
    words=st.lists(
        st.text(alphabet="abcx", min_size=0, max_size=5),
        min_size=1,
        max_size=25,
    ),
    buckets=st.sampled_from([2, 3, 7]),
)
@settings(max_examples=12, deadline=None)
def test_fuzzy_pairs_ed1_matches_bruteforce_prop(ray_session, words, buckets):
    """Deletion-neighborhood blocking == brute-force O(n^2) over ANY
    small vocabulary (tiny alphabet maximizes collisions: repeated
    chars, empty strings, substitution/insert/delete chains)."""
    import itertools

    import pyarrow as pa
    import ray.data as rd

    from vietnamese_ocr_ray.functions.dedup import fuzzy_pairs_ed1
    from vietnamese_ocr_ray.functions.text import levenshtein_np

    docs = pa.table({"text": pa.array([" ".join(words)])})
    df = fuzzy_pairs_ed1(rd.from_arrow(docs), num_buckets=buckets).to_pandas()
    # to_pandas() of a fully-empty Dataset loses columns (known Ray
    # limitation, joins._ensure_schema) — empty means "no pairs"
    got = (
        sorted(map(tuple, df[["w1", "w2"]].to_numpy())) if len(df) else []
    )
    toks = sorted(set(words))
    want = sorted(
        (a, b)
        for a, b in itertools.combinations(toks, 2)
        if levenshtein_np(a, b) == 1
    )
    assert got == want


@given(
    rows=st.integers(3, 24),
    k=st.integers(1, 6),
    chunk=st.sampled_from([4, 7, 16]),
    seed=st.integers(0, 10**6),
)
@settings(max_examples=10, deadline=None)
def test_knn_join_exact_matches_bruteforce_prop(
    ray_session, rows, k, chunk, seed
):
    """Chunked k-NN join == full-matrix selection on the identical
    packed key, over any (n, k, chunk) shape — including chunks
    smaller than k and duplicate vectors."""
    import pyarrow as pa
    import ray.data as rd

    from vietnamese_ocr_ray.functions.ann import knn_join_exact

    rng = np.random.default_rng(seed)
    m = rng.normal(size=(rows, 5))
    m[rows // 2] = m[0]  # planted duplicate vector
    ids = rng.permutation(rows).astype(np.int64)
    t = pa.table(
        {
            "vec_id": pa.array(ids),
            "embedding": pa.array(
                [list(r) for r in m], pa.list_(pa.float64())
            ),
        }
    )
    got = sorted(
        map(
            tuple,
            knn_join_exact(rd.from_arrow(t), k=k, chunk_rows=chunk)
            .to_pandas()
            .to_numpy(),
        )
    )
    u = m / np.linalg.norm(m, axis=1, keepdims=True)
    micro = np.rint(np.round(u @ u.T, 6) * 1e6).astype(np.int64)
    ref = []
    for i in range(rows):
        key = (micro[i] << np.int64(33)) - ids
        order = [j for j in np.argsort(key)[::-1] if j != i][:k]
        ref += [(ids[i], ids[j], micro[i, j] / 1e6) for j in order]
    assert got == sorted(ref)
