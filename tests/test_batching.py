"""Training-batch construction: length-bucketed batching (value parity
vs DuckDB is covered by the oracle sweep) and sequence-packing
invariants (packing is a heuristic — no SQL analog)."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from vietnamese_ocr_ray.functions import batching as B


def _docs(texts, start_id=0):
    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(
                    list(range(start_id, start_id + len(texts))), pa.int64()
                ),
                "text": pa.array(texts, pa.string()),
            }
        )
    )


def test_length_buckets_cut_fixed_batches(ray_session):
    # 70 docs of 3 tokens -> one bucket (3 // 8 == 0), batches of 32:
    # 32 + 32 + 6, positions dense in doc_id order
    ds = _docs(["a b c"] * 70)
    out = (
        B.length_bucket_batches(ds, bucket_width=8, batch_size=32)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert (out["len_bucket"] == 0).all()
    assert out["batch_idx"].tolist() == [i // 32 for i in range(70)]
    assert out["pos_in_batch"].tolist() == [i % 32 for i in range(70)]


def test_length_buckets_partitioning_invariant(ray_session):
    texts = [" ".join(["t"] * (1 + i % 37)) for i in range(200)]
    a = (
        B.length_bucket_batches(_docs(texts))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    b = (
        B.length_bucket_batches(_docs(texts).repartition(9))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert a.equals(b)


def test_pack_sequences_respects_budget_and_assigns_once(ray_session):
    texts = [" ".join(["t"] * n) for n in [100, 60, 50, 40, 30, 20, 10, 5]]
    ds = _docs(texts)
    out = B.pack_sequences(ds, budget=128, num_buckets=1).to_pandas()
    # exactly-once
    assert sorted(out["doc_id"]) == list(range(8))
    fills = out.groupby(["pack_bucket", "bin_id"])["n_tokens"].sum()
    assert (fills <= 128).all()
    # FFD packs the 315 total tokens into few bins (>= ceil bound of 3)
    assert fills.index.size <= 4


def test_pack_sequences_oversize_doc_gets_singleton_bin(ray_session):
    texts = [" ".join(["t"] * 300), "a b", "c d"]
    out = B.pack_sequences(_docs(texts), budget=128, num_buckets=1).to_pandas()
    big_bin = out.loc[out["n_tokens"] == 300, "bin_id"].iloc[0]
    assert (out[out["bin_id"] == big_bin]["doc_id"] == 0).all()


def test_shuffle_shards_cover_and_positions(ray_session):
    ds = _docs(["x"] * 97)
    out = B.shuffle_shards(ds, num_shards=4).to_pandas()
    # every doc lands in exactly one shard
    assert sorted(out["doc_id"]) == list(range(97))
    # positions are dense 0..n-1 within each shard
    for _, g in out.groupby("shard"):
        assert sorted(g["pos_in_shard"]) == list(range(len(g)))
    # shards are reasonably balanced (hash-based, 97 docs over 4)
    sizes = out.groupby("shard").size()
    assert sizes.min() >= 10


def test_shuffle_shards_partitioning_invariant(ray_session):
    texts = ["t"] * 150
    a = (
        B.shuffle_shards(_docs(texts))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    b = (
        B.shuffle_shards(_docs(texts).repartition(7))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert a.equals(b)


def test_pack_sequences_partitioning_invariant(ray_session):
    rng = np.random.default_rng(7)
    texts = [" ".join(["t"] * int(n)) for n in rng.integers(1, 120, 300)]
    a = (
        B.pack_sequences(_docs(texts), budget=128)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    b = (
        B.pack_sequences(_docs(texts).repartition(11), budget=128)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert a.equals(b)


def test_pack_sequences_length_col(ray_session):
    # pack by a precomputed length column instead of whitespace count
    t = pa.table(
        {
            "doc_id": pa.array(range(6), pa.int64()),
            "n_pieces": pa.array([100, 60, 50, 40, 20, 8], pa.int64()),
        }
    )
    out = B.pack_sequences(
        rd.from_arrow(t), budget=128, num_buckets=1, length_col="n_pieces"
    ).to_pandas()
    assert sorted(out["doc_id"]) == list(range(6))
    fills = out.groupby(["pack_bucket", "bin_id"])["n_tokens"].sum()
    assert (fills <= 128).all()
    # lengths came from the column, not token splitting
    assert set(out["n_tokens"]) == {100, 60, 50, 40, 20, 8}
