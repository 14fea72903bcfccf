"""Tests for the auxiliary operators: augmentation (M6), ConcatAug
(M7), single-image predict (app.py analog), prediction.txt sink (S5)."""

import os

import numpy as np
import pyarrow as pa

import ray.data as rd

from vietnamese_ocr_ray.model import DeterministicRecognizer
from vietnamese_ocr_ray.pipelines.extract import predict_single
from vietnamese_ocr_ray.preprocess import preprocess_one
from vietnamese_ocr_ray.sinks import write_predictions_txt
from vietnamese_ocr_ray.stages.augment import augment_image, augment_media
from vietnamese_ocr_ray.synth import concat_augment, render_text, synth_corpus


def test_augment_deterministic_per_ref():
    img = render_text("hello", 32)
    a = augment_image(img, "m-1")
    b = augment_image(img, "m-1")
    c = augment_image(img, "m-2")
    assert np.array_equal(a, b)
    assert a.shape == img.shape
    assert not np.array_equal(a, c)  # different seed -> different draws


def test_augment_stage_partitioning_invariant(ray_session):
    _, media = synth_corpus(20, seed=3)
    ds1 = augment_media(rd.from_arrow(media).repartition(2), concurrency=2, batch_size=4)
    ds2 = augment_media(rd.from_arrow(media), concurrency=1, batch_size=100)
    r1 = {r["media_ref"]: r["image"] for r in ds1.take_all()}
    r2 = {r["media_ref"]: r["image"] for r in ds2.take_all()}
    assert r1 == r2  # deterministic regardless of batch/actor layout


def test_concat_augment_is_recognizer_invertible():
    _, media = synth_corpus(60, seed=5, empty_text_fraction=0.0)
    cat = concat_augment(media, 10, seed=9)
    assert cat.num_rows == 10
    model = DeterministicRecognizer()
    for r in cat.to_pylist():
        img = np.frombuffer(r["image"], np.uint8).reshape(r["height"], r["width"])
        x = preprocess_one(img, r["media_ref"])
        got = model.recognize_texts(x[None])[0].as_py()
        assert got == r["truth"]


def test_predict_single_matches_batch_path():
    img = render_text("xyz42", 64)
    assert predict_single(img, "m-9") == "xyz42"
    # empty -> "a" fill on the single path (src/utils/inference.py:107-110)
    assert predict_single(render_text("", 32), "m-0") == "a"


def test_write_predictions_txt(ray_session, tmp_path):
    spans_type = pa.list_(
        pa.struct(
            [
                ("kind", pa.string()),
                ("text", pa.string()),
                ("media_ref", pa.string()),
                ("offset", pa.int32()),
            ]
        )
    )
    docs = pa.table(
        {
            "doc_id": pa.array(["d1"]),
            "spans": pa.array(
                [
                    [
                        {"kind": "media", "text": "hello", "media_ref": "m-1", "offset": 0},
                        {"kind": "text", "text": "skip", "media_ref": "", "offset": 1},
                        {"kind": "media", "text": "", "media_ref": "m-2", "offset": 2},
                    ]
                ],
                spans_type,
            ),
        }
    )
    out = str(tmp_path / "pred")
    write_predictions_txt(rd.from_arrow(docs), out)
    lines = []
    for f in sorted(os.listdir(out)):
        with open(os.path.join(out, f), encoding="utf-8") as fh:
            lines += [l.rstrip("\n") for l in fh]
    assert lines == ["m-1 hello", "m-2 a"]


def test_augment_new_ops_unit():
    """Each M6 geometric/photometric op: shape, determinism, and the
    specific invariant that defines it."""
    from vietnamese_ocr_ray.stages.augment import (
        curve_warp,
        defocus,
        grid_distortion,
        pad_or_resize,
        quantize_compression,
        safe_rotate,
    )

    img = render_text("samplewords", 48).astype(np.float32)

    # curve: shape-preserving, seeded-deterministic, actually warps
    rng = np.random.default_rng(1)
    c1 = curve_warp(img, np.random.default_rng(1))
    c2 = curve_warp(img, np.random.default_rng(1))
    assert c1.shape == img.shape and np.array_equal(c1, c2)
    assert not np.array_equal(c1, img)

    # rotate: zero angle is identity (bilinear at integer coords)
    assert np.allclose(safe_rotate(img, 0.0), img)
    r = safe_rotate(img, 20.0)
    assert r.shape == img.shape and not np.array_equal(r, img)

    # grid distortion: shape-preserving warp
    g = grid_distortion(img, np.random.default_rng(2))
    assert g.shape == img.shape and not np.array_equal(g, img)

    # defocus: mean-preserving-ish smoothing reduces variance
    d = defocus(img, 2)
    assert d.shape == img.shape and d.var() < img.var()

    # quantization: multiples of the step
    q = quantize_compression(img, 4)
    assert np.all(q % 4 == 0)

    # pad-or-resize: always lands on the canvas
    for seed in range(4):
        pr = pad_or_resize(img, np.random.default_rng(seed), (64, 256))
        assert pr.shape == (64, 256)


def test_augment_canvas_mode_partitioning_invariant(ray_session):
    """The full reference pipeline shape (canvas mode changes
    height/width) stays deterministic across batch/actor layouts, and
    the output schema reflects the new geometry."""
    _, media = synth_corpus(16, seed=7)
    kw = dict(canvas=(64, 256))
    ds1 = augment_media(rd.from_arrow(media).repartition(2), concurrency=2, batch_size=4, **kw)
    ds2 = augment_media(rd.from_arrow(media), concurrency=1, batch_size=100, **kw)
    r1 = {r["media_ref"]: (r["image"], r["height"], r["width"]) for r in ds1.take_all()}
    r2 = {r["media_ref"]: (r["image"], r["height"], r["width"]) for r in ds2.take_all()}
    assert r1 == r2
    assert all(h == 64 and w == 256 for (_, h, w) in r1.values())


def test_demo_cli_single_record(capsys):
    """app.py analog: CLI demo renders, predicts, round-trips."""
    import json as _json

    from vietnamese_ocr_ray.__main__ import main

    assert main(["demo", "--text", "xyz9"]) == 0
    out = _json.loads(capsys.readouterr().out.strip())
    assert out["text"] == "xyz9" and out["match"] is True


def test_running_sum_rangesort_hot_key(ray_session, tmp_path, monkeypatch):
    """One user bigger than any single block: the range-sort prefix
    algorithm must stitch the per-block cumsums exactly (this is the
    case the bucketed variant's one-key-one-task assumption excludes)."""
    import pandas as pd
    import pyarrow.parquet as pq

    from vietnamese_ocr_ray.pipelines.relational import (
        running_value_sum_rangesort,
    )

    rng = np.random.default_rng(0)
    n = 5000
    users = np.concatenate(
        [np.full(n, 7, np.int64), rng.integers(100, 110, 500)]
    )
    df = pd.DataFrame(
        {
            "event_id": np.arange(len(users), dtype=np.int64),
            "user_id": users,
            "ts": pd.to_datetime(
                rng.integers(0, 10**9, len(users)), unit="s"
            ),
            "value": np.round(rng.uniform(0, 10, len(users)), 3),
            "event_type": "x",
        }
    )
    # many small files -> many blocks -> the hot user spans several
    for i in range(16):
        pq.write_table(
            pa.Table.from_pandas(
                df.iloc[i::16].reset_index(drop=True), preserve_index=False
            ),
            str(tmp_path / f"part{i}.parquet"),
        )
    (tmp_path / "events.parquet").mkdir()
    for i in range(16):
        (tmp_path / f"part{i}.parquet").rename(
            tmp_path / "events.parquet" / f"part{i}.parquet"
        )
    out = running_value_sum_rangesort(str(tmp_path)).to_pandas()
    s = df.sort_values(["user_id", "ts", "event_id"], kind="stable")
    units = np.rint(s["value"].to_numpy() * 1000).astype(np.int64)
    expect = (
        pd.Series(units).groupby(s["user_id"].to_numpy()).cumsum().to_numpy()
        / 1000.0
    )
    got = out.set_index("event_id").loc[s["event_id"]]["running_value"].to_numpy()
    assert np.array_equal(got, expect)


def test_sample_exact_k_partitioning_stable(ray_session):
    """The exact-k sample must be the SAME row set regardless of how
    the input is partitioned (the property that makes it a reproducible
    web-scale split)."""
    import pyarrow as pa

    from vietnamese_ocr_ray.functions.sampling import sample_exact_k

    t = pa.table(
        {
            "doc_id": pa.array(range(1000), pa.int64()),
            "lang": pa.array(["en"] * 1000),
        }
    )
    a = sample_exact_k(rd.from_arrow(t), "doc_id", 50, salt="s:").to_pandas()
    b = sample_exact_k(
        rd.from_arrow(t).repartition(13), "doc_id", 50, salt="s:"
    ).to_pandas()
    assert sorted(a["doc_id"]) == sorted(b["doc_id"])
    assert len(a) == 50
    # different salt -> different draw
    c = sample_exact_k(rd.from_arrow(t), "doc_id", 50, salt="t:").to_pandas()
    assert sorted(c["doc_id"]) != sorted(a["doc_id"])


def test_weighted_sample_prefers_heavy_rows(ray_session):
    """Across many salts, rows with 10x weight must be sampled far more
    often than light rows (Efraimidis-Spirakis inclusion ~ weight)."""
    import pyarrow as pa

    from vietnamese_ocr_ray.functions.sampling import weighted_sample_k

    n = 200
    weights = np.where(np.arange(n) < 20, 100, 10)  # 20 heavy rows
    t = pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "w": pa.array(weights, pa.int64()),
        }
    )
    heavy_hits = light_hits = 0
    for s in range(8):
        out = weighted_sample_k(
            rd.from_arrow(t), "doc_id", "w", 40, salt=f"s{s}:"
        ).to_pandas()
        heavy_hits += (out["doc_id"] < 20).sum()
        light_hits += (out["doc_id"] >= 20).sum()
    # heavy rows are 10% of rows but ~10x weight: expect them to win
    # far beyond their count share (exp. ~50% of picks vs 10% unweighted)
    assert heavy_hits / (heavy_hits + light_hits) > 0.3


def test_mixture_sample_explicit_quotas_and_invariance(ray_session):
    """Explicit-dict mixture: per-group counts equal min(quota, group
    size); hash-rule mode is partitioning-stable."""
    from vietnamese_ocr_ray.functions.sampling import mixture_sample

    t = pa.table(
        {
            "doc_id": pa.array(range(300), pa.int64()),
            "source": pa.array(
                ["a"] * 100 + ["b"] * 100 + ["c"] * 100
            ),
        }
    )
    quotas = {"a": 10, "b": 250, "c": 0}
    out = mixture_sample(
        rd.from_arrow(t), "doc_id", "source", quotas=quotas
    ).to_pandas()
    sizes = out.groupby("source").size().to_dict()
    assert sizes == {"a": 10, "b": 100}  # b capped by group size, c dropped
    assert out["doc_id"].is_unique

    a = (
        mixture_sample(rd.from_arrow(t), "doc_id", "source")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    b = (
        mixture_sample(rd.from_arrow(t).repartition(11), "doc_id", "source")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert a.equals(b)


def test_render_text_rejects_unsupported_chars():
    import pytest

    from vietnamese_ocr_ray.synth import render_text

    with pytest.raises(ValueError, match="unsupported characters"):
        render_text("has space", 64)


def test_cohort_retention_multi_cohort(ray_session, tmp_path):
    """Users starting in different weeks land in different cohorts;
    per-(cohort, offset) active-user counts match a pandas replay.
    Data planted so a user can be active in a week, skip one, and
    return (offset gaps preserved) and so two cohorts overlap in
    calendar weeks (cohort != calendar grouping)."""
    import pandas as pd
    import pyarrow.parquet as pq

    from vietnamese_ocr_ray.pipelines.relational import cohort_retention

    base = np.datetime64("2024-01-01T12:00:00", "us")  # a Monday
    week = np.timedelta64(7, "D").astype("timedelta64[us]")
    rows = []  # (user, ts)
    # cohort A (week 0): u1 active weeks 0,1,3; u2 active weeks 0,2
    rows += [(1, base), (1, base + week), (1, base + 3 * week)]
    rows += [(2, base + np.timedelta64(3, "D").astype("timedelta64[us]")),
             (2, base + 2 * week)]
    # cohort B (week 1): u3 active weeks 1,2; u4 active week 1 only
    rows += [(3, base + week), (3, base + 2 * week), (4, base + week)]
    df = pd.DataFrame(
        {
            "user_id": [r[0] for r in rows],
            "ts": [r[1] for r in rows],
        }
    )
    (tmp_path / "events.parquet").mkdir()
    for i in range(3):  # multiple files -> cross-batch distinct path
        pq.write_table(
            pa.Table.from_pandas(
                df.iloc[i::3].reset_index(drop=True), preserve_index=False
            ),
            str(tmp_path / "events.parquet" / f"part{i}.parquet"),
        )
    out = (
        cohort_retention(str(tmp_path))
        .to_pandas()
        .sort_values(["cohort_week", "week_offset"])
        .reset_index(drop=True)
    )
    wk = df["ts"].dt.floor("D") - pd.to_timedelta(
        (df["ts"].dt.dayofweek), unit="D"
    )
    uw = pd.DataFrame({"u": df["user_id"], "w": wk}).drop_duplicates()
    firsts = uw.groupby("u")["w"].min().rename("c")
    j = uw.join(firsts, on="u")
    j["off"] = ((j["w"] - j["c"]).dt.days // 7).astype(np.int64)
    ref = (
        j.groupby(["c", "off"], as_index=False)
        .size()
        .rename(columns={"c": "cohort_week", "off": "week_offset",
                         "size": "n_users"})
        .sort_values(["cohort_week", "week_offset"])
        .reset_index(drop=True)
    )
    ref["n_users"] = ref["n_users"].astype(np.int64)
    out["cohort_week"] = out["cohort_week"].astype("datetime64[ns]")
    pd.testing.assert_frame_equal(out, ref)
    assert out["cohort_week"].nunique() == 2  # two distinct cohorts


def test_labels_tsv_roundtrip_format(ray_session, tmp_path):
    """write_labels_tsv emits the reference's exact label-store shape
    (headerless 'filename\\ttext' lines, no quoting) and
    read_labels_tsv parses it back losslessly, dropping the trailing
    empty line the way src/utils/vocab.py's split does."""
    import pyarrow.parquet as pq

    from vietnamese_ocr_ray.sources.storage import (
        read_labels_tsv,
        write_labels_tsv,
    )

    t = pa.table(
        {
            "media_ref": pa.array(["m-0-0", "m-0-3", "m-7-0"]),
            "truth": pa.array(["xin", "chao", "vietnam"]),
            "other": pa.array([1, 2, 3]),
        }
    )
    mdir = tmp_path / "media"
    mdir.mkdir()
    pq.write_table(t, str(mdir / "part0.parquet"))
    tsv = str(tmp_path / "labels.tsv")
    write_labels_tsv(str(mdir), tsv)
    raw = open(tsv, "rb").read()
    assert raw == b"m-0-0\txin\nm-0-3\tchao\nm-7-0\tvietnam\n"
    back = read_labels_tsv(tsv).to_pandas().sort_values("ref")
    assert list(back["ref"]) == ["m-0-0", "m-0-3", "m-7-0"]
    assert list(back["truth"]) == ["xin", "chao", "vietnam"]


def test_blocklist_flag_counts_and_edges(ray_session):
    """Word-level blocklist: exact per-doc occurrence counts, docs with
    zero hits dropped, substring NON-matches ('sparky' is not 'spark'),
    empty docs survive the flat-buffer fold."""
    from vietnamese_ocr_ray.functions.text import blocklist_flag

    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "text": pa.array(
                [
                    "spark slow spark",   # 3 hits
                    "sparky slowly",      # substring only: 0 hits
                    "",                   # empty doc: 0 hits
                    "dup",                # 1 hit
                    "clean words here",   # 0 hits
                ]
            ),
        }
    )
    out = (
        blocklist_flag(rd.from_arrow(t), ["spark", "slow", "dup"])
        .to_pandas()
        .sort_values("doc_id")
    )
    assert list(out["doc_id"]) == [1, 4]
    assert list(out["n_blocked"]) == [3, 1]
