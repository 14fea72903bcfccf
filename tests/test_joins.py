"""asof_join semantics: strict/inclusive matching, inner-drop of
unmatched rows, per-key isolation, bucketing invariance."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from vietnamese_ocr_ray.functions.joins import asof_join, key_bucket


def _sides():
    left = pa.table(
        {
            "k": pa.array([1, 1, 1, 2, 3], pa.int64()),
            "t": pa.array([10, 20, 30, 15, 7], pa.int64()),
            "lv": pa.array(["a", "b", "c", "d", "e"]),
        }
    )
    right = pa.table(
        {
            "k": pa.array([1, 1, 2, 4], pa.int64()),
            "rt": pa.array([10, 25, 5, 1], pa.int64()),
            "rv": pa.array([100, 200, 300, 400], pa.int64()),
        }
    )
    return left, right


def _run(strict, num_buckets=4):
    left, right = _sides()
    out = asof_join(
        rd.from_arrow(left),
        rd.from_arrow(right),
        by="k",
        left_on="t",
        right_on="rt",
        strict=strict,
        num_buckets=num_buckets,
    )
    return (
        out.to_pandas()
        .sort_values(["k", "t"])
        .reset_index(drop=True)
    )


def test_asof_inclusive(ray_session):
    df = _run(strict=False)
    # k=1: t=10 -> rt=10 (exact allowed), t=20 -> rt=10, t=30 -> rt=25
    # k=2: t=15 -> rt=5; k=3 unmatched drops; right k=4 never appears
    assert df[["k", "t", "rv"]].values.tolist() == [
        [1, 10, 100],
        [1, 20, 100],
        [1, 30, 200],
        [2, 15, 300],
    ]
    assert df["rv"].dtype == np.int64  # no float-via-NaN leakage


def test_asof_strict(ray_session):
    df = _run(strict=True)
    # exact tie at t=10 now excluded -> that left row drops
    assert df[["k", "t", "rv"]].values.tolist() == [
        [1, 20, 100],
        [1, 30, 200],
        [2, 15, 300],
    ]


def test_asof_bucket_count_invariant(ray_session):
    assert _run(False, num_buckets=1).equals(_run(False, num_buckets=7))


def test_asof_matches_pandas_reference(ray_session):
    rng = np.random.default_rng(7)
    n_l, n_r = 500, 300
    left = pd.DataFrame(
        {
            "k": rng.integers(0, 20, n_l),
            "t": rng.integers(0, 10_000, n_l),
            "lv": np.arange(n_l),
        }
    )
    right = pd.DataFrame(
        {
            "k": rng.integers(0, 25, n_r),
            "rt": rng.integers(0, 10_000, n_r),
            "rv": np.arange(n_r),
        }
    ).drop_duplicates(subset=["k", "rt"])
    got = (
        asof_join(
            rd.from_pandas(left),
            rd.from_pandas(right),
            by="k",
            left_on="t",
            right_on="rt",
        )
        .to_pandas()
        .sort_values(["k", "t", "lv"])
        .reset_index(drop=True)
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
    exp[["rt", "rv"]] = exp[["rt", "rv"]].astype(np.int64)
    exp = exp.sort_values(["k", "t", "lv"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[exp.columns.tolist()], exp)


def test_key_bucket_spreads_sequential_ints():
    b = key_bucket(pa.array(np.arange(1000, dtype=np.int64)), 8)
    counts = np.bincount(b, minlength=8)
    assert counts.min() > 60  # splitmix avalanche, not id % buckets


def _range_ref(left, right, lo, hi):
    import pandas as pd

    out = []
    lo, hi = pd.Timedelta(microseconds=lo), pd.Timedelta(microseconds=hi)
    for _, lr in left.iterrows():
        seg = right[
            (right.k == lr.k) & (right.rt >= lr.t + lo) & (right.rt < lr.t + hi)
        ]
        out.append(len(seg))
    return out


def test_range_count_join_matches_bruteforce(ray_session):
    import pandas as pd

    from vietnamese_ocr_ray.functions.joins import range_count_join

    rng = np.random.default_rng(11)
    left = pd.DataFrame(
        {"k": rng.integers(0, 10, 200), "t": rng.integers(0, 1000, 200).astype("datetime64[us]"), "lv": np.arange(200)}
    )
    right = pd.DataFrame(
        {"k": rng.integers(0, 12, 300), "rt": rng.integers(0, 1000, 300).astype("datetime64[us]")}
    )
    got = (
        range_count_join(
            rd.from_pandas(left),
            rd.from_pandas(right),
            by="k",
            left_on="t",
            right_on="rt",
            lo_us=0,
            hi_us=50,
            num_buckets=5,
        )
        .to_pandas()
        .sort_values("lv")
        .reset_index(drop=True)
    )
    assert got["n_in_range"].tolist() == _range_ref(left, right, 0, 50)


def test_range_count_join_empty_right(ray_session):
    import pandas as pd

    from vietnamese_ocr_ray.functions.joins import range_count_join

    left = pd.DataFrame(
        {"k": [1, 2], "t": np.array([10, 20], "datetime64[us]"), "lv": [0, 1]}
    )
    right = pd.DataFrame({"k": np.array([], np.int64), "rt": np.array([], "datetime64[us]")})
    got = range_count_join(
        rd.from_pandas(left),
        rd.from_pandas(right),
        by="k",
        left_on="t",
        right_on="rt",
        lo_us=0,
        hi_us=100,
    ).to_pandas()
    assert sorted(got["n_in_range"].tolist()) == [0, 0]


def test_customer_order_counts_left_semantics(ray_session, tmp_path):
    """Zero-order customers must survive the distributed left-outer
    join with n_orders = 0 (the driver testdata has no unmatched keys,
    so the oracle comparison alone cannot prove left semantics)."""
    import pyarrow.parquet as pq

    from vietnamese_ocr_ray.pipelines.relational import customer_order_counts

    pq.write_table(
        pa.table({"c_custkey": pa.array([1, 2, 3, 4], pa.int64())}),
        str(tmp_path / "customer.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array([10, 11, 12], pa.int64()),
                "o_custkey": pa.array([1, 1, 3], pa.int64()),
            }
        ),
        str(tmp_path / "orders.parquet"),
    )
    out = (
        customer_order_counts(str(tmp_path))
        .to_pandas()
        .set_index("c_custkey")["n_orders"]
        .to_dict()
    )
    assert out == {1: 2, 2: 0, 3: 1, 4: 0}


def test_interval_join_matches_bruteforce(ray_session):
    from vietnamese_ocr_ray.functions.joins import interval_join

    rng = np.random.default_rng(11)
    base = np.datetime64("2025-01-01T00:00:00", "us")
    lts = base + rng.integers(0, 3_600_000_000 * 10, 200).astype("timedelta64[us]")
    rts = base + rng.integers(0, 3_600_000_000 * 10, 300).astype("timedelta64[us]")
    lkey = rng.integers(0, 7, 200)
    rkey = rng.integers(0, 7, 300)
    W = 1_800_000_000  # 30 min
    left = pa.table(
        {
            "lid": pa.array(range(200), pa.int64()),
            "k": pa.array(lkey),
            "lts": pa.array(lts),
        }
    )
    right = pa.table(
        {
            "rid": pa.array(range(300), pa.int64()),
            "k": pa.array(rkey),
            "rts": pa.array(rts),
        }
    )
    out = interval_join(
        rd.from_arrow(left),
        rd.from_arrow(right),
        by="k",
        left_on="lts",
        right_on="rts",
        window_us=W,
    ).to_pandas()
    # brute force reference
    want = set()
    li = lts.astype(np.int64)
    ri = rts.astype(np.int64)
    for i in range(200):
        for j in range(300):
            if lkey[i] == rkey[j] and li[i] <= ri[j] < li[i] + W:
                want.add((i, j))
    got = set(zip(out["lid"], out["rid"]))
    assert got == want
    assert len(out) == len(want)
    # partitioning invariance
    out2 = interval_join(
        rd.from_arrow(left).repartition(5),
        rd.from_arrow(right).repartition(3),
        by="k",
        left_on="lts",
        right_on="rts",
        window_us=W,
    ).to_pandas()
    assert set(zip(out2["lid"], out2["rid"])) == want
