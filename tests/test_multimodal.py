"""Multimodal stages: raw decode views, features vs numpy reference,
thumbnail geometry + losslessness at 2x, frame sampling, codec gate."""

import numpy as np
import pyarrow as pa
import pytest

from vietnamese_ocr_ray.stages.multimodal import (
    ImageFeatures,
    Thumbnail,
    _decode_views,
    sample_frames,
)


def _media_batch(n=6, seed=11):
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        h, w = int(rng.integers(8, 40)), int(rng.integers(8, 40))
        rows.append(
            {
                "media_ref": f"m-{i}",
                "image": rng.integers(0, 256, (h, w), np.uint8).tobytes(),
                "height": h,
                "width": w,
                "encoding": "raw",
            }
        )
    t = pa.Table.from_pylist(rows)
    return t.set_column(
        t.schema.get_field_index("image"),
        "image",
        t.column("image").cast(pa.binary()),
    )


def test_features_match_numpy_reference():
    batch = _media_batch()
    out = ImageFeatures()(batch).to_pylist()
    views, _, _ = _decode_views(batch)
    for row, v in zip(out, views):
        f = v.astype(np.float64)
        x = v.astype(np.int64)
        assert row["pixel_sum"] == int(x.sum())
        assert row["pixel_sq_sum"] == int((x * x).sum())
        assert row["n_pixels"] == x.size
        d = np.abs(np.diff(x, axis=1))
        assert row["edge_count"] == int((d > 32).sum())
        assert row["mean_intensity"] == pytest.approx(round(float(f.mean()), 4))
        assert row["std_intensity"] == pytest.approx(round(float(f.std()), 4))
        assert row["edge_density"] == pytest.approx(
            round(float((d > 32).mean()), 4)
        )


def test_codec_gate_raises():
    batch = _media_batch()
    enc = ["raw"] * (batch.num_rows - 1) + ["jpeg"]
    batch = batch.set_column(
        batch.schema.get_field_index("encoding"), "encoding", pa.array(enc)
    )
    with pytest.raises(NotImplementedError, match="jpeg"):
        ImageFeatures()(batch)


def test_thumbnail_geometry_and_chaining():
    batch = _media_batch()
    out = Thumbnail(out_h=16)(batch)
    assert out.column_names == ["media_ref", "image", "height", "width", "encoding"]
    for r in out.to_pylist():
        assert r["height"] <= 16
        assert len(r["image"]) == r["height"] * r["width"]
    # output is itself a valid media batch (stage chaining)
    ImageFeatures()(out)


def test_sample_frames_explodes_deterministically():
    rng = np.random.default_rng(5)
    h, w, nf = 4, 6, 7
    video = rng.integers(0, 256, (nf, h, w), np.uint8)
    batch = pa.table(
        {
            "media_ref": ["v-0"],
            "video": pa.array([video.tobytes()], pa.binary()),
            "height": pa.array([h], pa.int32()),
            "width": pa.array([w], pa.int32()),
            "n_frames": pa.array([nf], pa.int32()),
        }
    )
    out = sample_frames(batch, every_k=3)
    assert out.column("media_ref").to_pylist() == ["v-0#f0", "v-0#f3", "v-0#f6"]
    for i, f in enumerate([0, 3, 6]):
        got = np.frombuffer(out.column("image")[i].as_py(), np.uint8).reshape(h, w)
        assert np.array_equal(got, video[f])
    # sampled frames feed the image stages directly
    ImageFeatures()(out)


def test_make_videos_frames_are_exact_band_shifts():
    from vietnamese_ocr_ray.stages.multimodal import make_videos
    from vietnamese_ocr_ray.synth import pick_height, render_text

    rows = []
    for did, off, w in [(3, 0, "abc"), (3, 2, "zz9"), (4, 1, "skip"), (7, 4, "q")]:
        ref = f"m-{did}-{off}"
        h = pick_height(ref)
        img = render_text(w, h)
        rows.append(
            {
                "media_ref": ref,
                "image": img.tobytes(),
                "height": h,
                "width": img.shape[1],
            }
        )
    t = pa.Table.from_pylist(rows)
    t = t.set_column(
        t.schema.get_field_index("image"),
        "image",
        t.column("image").cast(pa.binary()),
    )
    vids = make_videos(t)
    # odd offsets are dropped; refs renamed v-<doc>-<off>
    assert vids.column("media_ref").to_pylist() == ["v-3-0", "v-3-2", "v-7-4"]
    assert vids.column("n_frames").to_pylist() == [2 + (3 + 0) % 4, 2 + (3 + 2) % 4, 2 + (7 + 4) % 4]
    for row, src in zip(vids.to_pylist(), [rows[0], rows[1], rows[3]]):
        base = np.frombuffer(src["image"], np.uint8)
        frames = np.frombuffer(row["video"], np.uint8).reshape(row["n_frames"], -1)
        band = (base != 255) & (base != 0)
        for f in range(row["n_frames"]):
            expect = np.where(band, base - f, base)
            assert np.array_equal(frames[f], expect), (row["media_ref"], f)
            # frame moment deltas are the closed form the SQL oracle uses
            assert int(frames[f].astype(np.int64).sum()) == int(
                base.astype(np.int64).sum()
            ) - f * int(band.sum())
    # frames chain straight into the image stages
    ImageFeatures()(sample_frames(vids, every_k=2))


def test_media_features_dataset_roundtrip(ray_session, tmp_path):
    import pyarrow.parquet as pq
    import ray.data as rd

    from vietnamese_ocr_ray.stages.multimodal import media_features

    batch = _media_batch(50)
    pq.write_table(batch, str(tmp_path / "media.parquet"))
    out = media_features(rd.read_parquet(str(tmp_path))).to_pandas()
    assert len(out) == 50
    assert set(out.columns) == {
        "media_ref",
        "pixel_sum",
        "pixel_sq_sum",
        "edge_count",
        "n_pixels",
        "mean_intensity",
        "std_intensity",
        "edge_density",
    }


def test_audio_features_match_per_clip_reference(ray_session):
    """Batched reduceat audio features == straightforward one-clip
    numpy computation; boundary flips must not leak across clips."""
    import numpy as np
    import pyarrow as pa

    import ray.data as rd

    from vietnamese_ocr_ray.stages.multimodal import (
        AudioFeatures,
        audio_features,
        synth_audio,
    )

    t = synth_audio(list(range(1, 9)), [0, 10, 50, 200, 999, 5, 1, 77])
    out = audio_features(rd.from_arrow(t).repartition(2), concurrency=2).to_pandas()
    out = out.set_index("media_ref")
    for i in range(t.num_rows):
        pcm = np.frombuffer(t.column("audio")[i].as_py(), "<i2").astype(
            np.float64
        )
        ref = t.column("media_ref")[i].as_py()
        sr = t.column("sample_rate")[i].as_py()
        assert out.loc[ref, "duration_s"] == round(len(pcm) / sr, 6)
        assert out.loc[ref, "rms"] == round(
            float(np.sqrt((pcm * pcm).mean())), 4
        )
        assert out.loc[ref, "peak"] == int(np.abs(pcm).max())
        signs = np.signbit(pcm)
        assert out.loc[ref, "zero_crossings"] == int(
            (signs[1:] != signs[:-1]).sum()
        )

    # unsupported codec gates at the decode seam
    bad = t.set_column(
        t.schema.get_field_index("encoding"),
        "encoding",
        pa.array(["mp3"] * t.num_rows),
    )
    import pytest

    with pytest.raises(NotImplementedError):
        AudioFeatures()(bad)


def test_ahash_collides_on_duplicates_separates_unrelated(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from vietnamese_ocr_ray.stages.multimodal import media_ahash
    from vietnamese_ocr_ray.synth import render_text

    a = render_text("sametext", 32)
    b = render_text("sametext", 32)  # identical render
    c = render_text("different", 32)
    t = pa.table(
        {
            "media_ref": pa.array(["m-a", "m-b", "m-c"]),
            "image": pa.array(
                [a.tobytes(), b.tobytes(), c.tobytes()], pa.binary()
            ),
            "height": pa.array([a.shape[0], b.shape[0], c.shape[0]], pa.int32()),
            "width": pa.array([a.shape[1], b.shape[1], c.shape[1]], pa.int32()),
        }
    )
    out = media_ahash(rd.from_arrow(t)).to_pandas().set_index("media_ref")
    assert out.loc["m-a", "ahash"] == out.loc["m-b", "ahash"]
    diff = np.uint64(out.loc["m-a", "ahash"]) ^ np.uint64(out.loc["m-c", "ahash"])
    assert bin(int(diff)).count("1") >= 8  # well separated


def test_ahash_partitioning_invariant(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from vietnamese_ocr_ray.stages.multimodal import media_ahash
    from vietnamese_ocr_ray.synth import synth_corpus

    _, media = synth_corpus(24, seed=11)
    cols = media.select(["media_ref", "image", "height", "width"])
    one = media_ahash(rd.from_arrow(cols)).to_pandas()
    many = media_ahash(rd.from_arrow(cols).repartition(6)).to_pandas()
    a = one.sort_values("media_ref").reset_index(drop=True)
    b = many.sort_values("media_ref").reset_index(drop=True)
    assert a.equals(b)


def test_simhash_pairs_over_ahash_finds_duplicate_images(ray_session):
    """Media near-dup end-to-end: identical renders pair at Hamming 0
    through the banded search running on PRECOMPUTED aHash
    fingerprints (simhash_pairs(fp_col=...)); an unrelated image pairs
    with neither."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from vietnamese_ocr_ray.functions.dedup import simhash_pairs
    from vietnamese_ocr_ray.stages.multimodal import media_ahash
    from vietnamese_ocr_ray.synth import render_text

    a = render_text("sametext", 32)
    b = render_text("sametext", 32)
    c = render_text("different", 32)
    t = pa.table(
        {
            "mid": pa.array([1, 2, 3], pa.int64()),
            "media_ref": pa.array(["m-0-1", "m-0-2", "m-0-3"]),
            "image": pa.array(
                [a.tobytes(), b.tobytes(), c.tobytes()], pa.binary()
            ),
            "height": pa.array([a.shape[0], b.shape[0], c.shape[0]], pa.int32()),
            "width": pa.array([a.shape[1], b.shape[1], c.shape[1]], pa.int32()),
        }
    )
    fps = media_ahash(rd.from_arrow(t)).to_pandas()
    packed = pa.table(
        {
            "mid": pa.array([1, 2, 3], pa.int64()),
            "ahash": pa.array(fps.sort_values("media_ref")["ahash"].to_numpy(np.int64)),
        }
    )
    pairs = simhash_pairs(
        rd.from_arrow(packed), max_hamming=3, fp_col="ahash", id_col="mid"
    ).to_pandas()
    assert sorted(map(tuple, pairs[["a", "b"]].to_numpy())) == [(1, 2)]
    assert pairs["hamming"].tolist() == [0]


def test_colhash_near_collides_on_similar_lines():
    """The 64-cell column-profile hash keeps horizontal structure: the
    same word hashes identically, a one-char-different word lands
    NEARBY (small Hamming), and an unrelated word lands far — the
    property the banded Hamming near-dup search needs (the classic 8x8
    aHash collapses to 8 effective bits on row-uniform band images)."""
    import numpy as np

    from vietnamese_ocr_ray.stages.multimodal import ImageColHash
    from vietnamese_ocr_ray.synth import render_text

    hh = ImageColHash()

    def fp(word, h=32):
        return np.uint64(hh.hash_one(render_text(word, h)))

    def ham(a, b):
        return bin(int(a ^ b)).count("1")

    assert fp("processing") == fp("processing")
    near = ham(fp("processing"), fp("prucessing"))  # one band changed
    far = ham(fp("processing"), fp("zzzzzzzzzz"))
    assert 0 < near <= 8, near
    assert far > near, (far, near)


def test_media_neardup_family_end_to_end(ray_session):
    """Driver-facing media near-dup queries over a small corpus:
    fingerprint pairs are distinct-fp level with image counts, and the
    dedup keeps exactly one image per fingerprint cluster (min mid)."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "__ray_entry__", "/root/repo/__ray_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    sf = "/root/testdata/sf0.001"
    pairs = mod.queries()["media_neardup_ahash"](sf).to_pandas()
    assert set(pairs.columns) == {"fp_a", "fp_b", "hamming", "n_a", "n_b"}
    assert (pairs["fp_a"] < pairs["fp_b"]).all()
    assert (pairs["hamming"].between(1, 7)).all()
    assert (pairs["n_a"] >= 1).all() and (pairs["n_b"] >= 1).all()

    kept = mod.queries()["dedup_media_ahash"](sf).to_pandas()
    # one survivor per fp-cluster; survivors are a subset of the corpus
    ah = mod.queries()["media_ahash"](sf).to_pandas()
    assert 0 < len(kept) < len(ah)
    assert set(kept.columns) == {"media_ref", "height", "width"}
    assert kept["media_ref"].is_unique
