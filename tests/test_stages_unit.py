"""Unit tests for individual stages outside full pipelines: detect /
recognize-boxes handoff, HLL partition invariance, cogroup bucket
edge cases, non-ASCII text handling."""

import numpy as np
import pyarrow as pa

from vietnamese_ocr_ray.functions.sketch import HllSketch
from vietnamese_ocr_ray.model import DeterministicRecognizer
from vietnamese_ocr_ray.preprocess import preprocess_one
from vietnamese_ocr_ray.stages.twostage import DetectSpans, RecognizeBoxes
from vietnamese_ocr_ray.synth import render_text


def _media_batch(texts, heights):
    imgs = [render_text(t, h) for t, h in zip(texts, heights)]
    n = len(texts)
    return pa.table(
        {
            "doc_id": pa.array([f"d{i}" for i in range(n)]),
            "offset": pa.array(np.zeros(n, np.int32)),
            "kind": pa.array(["media"] * n),
            "text": pa.array([""] * n),
            "media_ref": pa.array([f"m-{i}" for i in range(n)]),
            "image": pa.array([im.tobytes() for im in imgs], pa.binary()),
            "height": pa.array(heights, pa.int32()),
            "width": pa.array([im.shape[1] for im in imgs], pa.int32()),
        }
    )


def test_detect_then_recognize_boxes_roundtrip():
    texts = ["hello", "", "abc123", "z" * 30]
    batch = _media_batch(texts, [32, 64, 32, 64])
    detected = DetectSpans()(batch)
    assert set(detected.column_names) >= {"canvas", "box_lo", "n_bands"}
    out = RecognizeBoxes()(detected)
    assert "canvas" not in out.column_names
    got = dict(zip(out.column("media_ref").to_pylist(), out.column("text").to_pylist()))
    assert got == {"m-0": "hello", "m-1": "a", "m-2": "abc123", "m-3": "z" * 30}


def test_detect_boxes_match_model_detect():
    texts = ["abc", "defg"]
    batch = _media_batch(texts, [32, 32])
    detected = DetectSpans()(batch)
    model = DeterministicRecognizer()
    for i, t in enumerate(texts):
        x = preprocess_one(render_text(t, 32), f"m-{i}")
        lo, nb = model.detect(x[None])
        assert detected.column("box_lo")[i].as_py() == int(lo[0])
        assert detected.column("n_bands")[i].as_py() == len(t) + 1


def test_hll_partition_invariance():
    from vietnamese_ocr_ray.functions.dedup import content_hash64

    toks = pa.array([f"tok{i}" for i in range(20000)])
    h = content_hash64(toks)
    one = HllSketch(12)
    one.add_hashes(h)
    # any partitioning + merge must give the identical registers
    parts = [HllSketch(12) for _ in range(4)]
    for i, s in enumerate(parts):
        s.add_hashes(h[i::4])
    merged = parts[0]
    for s in parts[1:]:
        merged.merge(s)
    assert np.array_equal(one.registers, merged.registers)


def test_cogroup_handles_empty_and_text_only_buckets():
    from vietnamese_ocr_ray.stages.cogroup import _join_bucket

    # bucket containing only text spans
    g = pa.table(
        {
            "doc_id": pa.array(["d1"]),
            "offset": pa.array([0], pa.int32()),
            "kind": pa.array(["text"]),
            "text": pa.array(["hello"]),
            "media_ref": pa.array([""]),
            "image": pa.nulls(1, pa.binary()),
            "height": pa.nulls(1, pa.int32()),
            "width": pa.nulls(1, pa.int32()),
            "bucket": pa.array([3], pa.int32()),
        }
    )
    out = _join_bucket(g)
    assert out.num_rows == 1
    assert out.column("text")[0].as_py() == "hello"


def test_non_ascii_fallbacks():
    # fingerprint + vocab build paths must survive non-ASCII text
    from vietnamese_ocr_ray.functions.text import fingerprint_batch

    texts = ["tiếng việt", "日本語テキスト", "plain ascii"]
    out = fingerprint_batch(
        pa.table({"doc_id": pa.array(range(3), pa.int64()), "text": pa.array(texts)})
    )
    for i, s in enumerate(texts):
        expect = sum(ord(c) * (j + 1) for j, c in enumerate(s)) % 1_000_000_007
        assert out.column("fingerprint")[i].as_py() == expect


def test_pack_write_interior_idempotent_under_reexecution(tmp_path):
    """Lineage re-execution replays a pack task on the same block: the
    deterministic file name must make the second write an overwrite,
    never a duplicate (no Ray session needed — pure block logic)."""
    import os

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from vietnamese_ocr_ray.schema import DOCS_SCHEMA
    from vietnamese_ocr_ray.stages.explode import PackWriteInterior

    n = 30
    rows = []
    for d in range(10):
        for off in range(3):
            rows.append(
                {
                    "doc_id": f"doc-{d:04d}",
                    "offset": off,
                    "kind": "text",
                    "text": f"t{d}.{off}",
                    "media_ref": "",
                }
            )
    batch = pa.table(
        {
            "doc_id": pa.array([r["doc_id"] for r in rows]),
            "offset": pa.array([r["offset"] for r in rows], pa.int32()),
            "kind": pa.array([r["kind"] for r in rows]),
            "text": pa.array([r["text"] for r in rows]),
            "media_ref": pa.array([r["media_ref"] for r in rows]),
        }
    )
    out = str(tmp_path / "packs")
    os.makedirs(out)
    stage = PackWriteInterior(out)
    edges1 = stage(batch)
    files1 = sorted(os.listdir(out))
    edges2 = stage(batch)  # replayed task
    files2 = sorted(os.listdir(out))
    assert files1 == files2 and len(files1) == 1
    assert edges1.equals(edges2)
    # edge docs = first+last of the raw block; interior = the other 8
    assert set(edges1.column("doc_id").to_pylist()) == {
        "doc-0000",
        "doc-0009",
    }
    packed = pq.read_table(os.path.join(out, files1[0]))
    assert packed.num_rows == 8
    assert packed.schema.field("spans").type == DOCS_SCHEMA.field("spans").type
