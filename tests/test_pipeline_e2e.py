"""E2E: Ray pipeline vs single-process oracle — span-sequence equality
(kind, text, media_ref, order) per document, both media modes, plus the
skew corpus and the interrupt-and-resume contract."""

import os
import shutil

import pytest

from vietnamese_ocr_ray.oracle import extract_oracle
from vietnamese_ocr_ray.pipelines.extract import (
    extract_spans,
    media_lookup,
    run_extract,
)
from vietnamese_ocr_ray.sources.storage import read_docs, read_media
from vietnamese_ocr_ray.synth import synth_corpus, write_corpus


def canon(rows):
    return sorted(
        (
            (
                r["doc_id"],
                tuple(
                    (s["kind"], s["text"], s["media_ref"], s["offset"])
                    for s in r["spans"]
                ),
            )
            for r in rows
        ),
    )


@pytest.fixture(scope="module")
def corpus(tmp_path_factory, ray_session):
    docs, media = synth_corpus(150, seed=11)
    out = str(tmp_path_factory.mktemp("corpus"))
    docs_dir, media_dir = write_corpus(docs, media, out, n_fragments=4)
    golden = canon(extract_oracle(docs, media))
    return docs, media, docs_dir, media_dir, golden


@pytest.mark.parametrize("mode", ["broadcast", "join"])
def test_pipeline_matches_oracle(corpus, mode, ray_session):
    docs, media, docs_dir, media_dir, golden = corpus
    m = (
        read_media(media_dir)
        if mode == "join"
        else media_lookup(os.path.join(media_dir, "media-00000.parquet"))
    )
    out = extract_spans(
        read_docs(docs_dir), m, media_mode=mode, join_partitions=4, num_buckets=8
    )
    assert canon(out.take_all()) == golden


def test_skewed_corpus(ray_session, tmp_path):
    """One doc with hundreds of media spans among small docs."""
    docs, media = synth_corpus(
        40, seed=3, skew_fraction=0.1, skew_spans=150, shuffle_storage_order=True
    )
    docs_dir, media_dir = write_corpus(docs, media, str(tmp_path), n_fragments=2)
    golden = canon(extract_oracle(docs, media))
    out = extract_spans(
        read_docs(docs_dir),
        media_lookup(os.path.join(media_dir, "media-00000.parquet")),
        media_mode="broadcast",
        num_buckets=4,
    )
    assert canon(out.take_all()) == golden


def test_resume_produces_identical_output(ray_session, tmp_path):
    """Interrupt after K fragments (simulated by a first partial run),
    resume, and compare against an uninterrupted run — outputs must be
    identical, finished fragments must not be reprocessed."""
    import pyarrow.parquet as pq

    docs, media = synth_corpus(80, seed=5)
    docs_dir, media_dir = write_corpus(docs, media, str(tmp_path / "in"), n_fragments=4)
    media_path = os.path.join(media_dir, "media-00000.parquet")

    full_dir = str(tmp_path / "full")
    s_full = run_extract(
        docs_dir, media_path, full_dir, chunk_fragments=2, media_mode="broadcast"
    )
    assert s_full["fragments_processed"] == 4

    # partial run: only the first chunk (simulate interrupt by limiting
    # the fragment list through a trimmed input dir)
    part_in = str(tmp_path / "part_in")
    os.makedirs(part_in)
    frags = sorted(f for f in os.listdir(docs_dir) if f.endswith(".parquet"))
    for f in frags[:2]:
        shutil.copy(os.path.join(docs_dir, f), os.path.join(part_in, f))
    resumed_dir = str(tmp_path / "resumed")
    s1 = run_extract(
        part_in, media_path, resumed_dir, chunk_fragments=2, media_mode="broadcast"
    )
    assert s1["fragments_processed"] == 2
    # now "restart" with the full input — finished fragments skipped
    for f in frags[2:]:
        shutil.copy(os.path.join(docs_dir, f), os.path.join(part_in, f))
    s2 = run_extract(
        part_in, media_path, resumed_dir, chunk_fragments=2, media_mode="broadcast"
    )
    assert s2["fragments_done_prior"] == 2
    assert s2["fragments_processed"] == 2

    def read_all(d):
        tabs = []
        for root, _, files in os.walk(d):
            for f in sorted(files):
                if f.endswith(".parquet"):
                    tabs.append(pq.read_table(os.path.join(root, f)))
        import pyarrow as pa

        return canon(pa.concat_tables(tabs).to_pylist())

    assert read_all(full_dir) == read_all(resumed_dir)
    # third run is a no-op
    s3 = run_extract(
        part_in, media_path, resumed_dir, chunk_fragments=2, media_mode="broadcast"
    )
    assert s3["fragments_processed"] == 0


def test_local_reassembly_matches_shuffle(ray_session, tmp_path):
    """reassembly='local' (sink-fused per-block pack + edge-doc stitch,
    the certified cluster configuration) must produce the exact doc set
    of the shuffle reassembly, across both shuffle-free media modes."""
    import pyarrow.parquet as pq

    from vietnamese_ocr_ray.sources.storage import write_media_bucketed

    docs, media = synth_corpus(120, seed=17)
    # zero-span docs produce no span rows and drop in EVERY reassembly
    # mode (seed 17 has two; the oracle drops them identically)
    n_nonempty = sum(1 for s in docs.column("spans").to_pylist() if s)
    docs_dir, media_dir = write_corpus(
        docs, media, str(tmp_path / "in"), n_fragments=4
    )
    media_path = os.path.join(media_dir, "media-00000.parquet")
    bucketed = write_media_bucketed(
        media_path, str(tmp_path / "bucketed"), 8
    )

    def read_all(d):
        import pyarrow as pa

        tabs = []
        for root, _, files in os.walk(d):
            for f in sorted(files):
                if f.endswith(".parquet"):
                    tabs.append(pq.read_table(os.path.join(root, f)))
        return canon(pa.concat_tables(tabs).to_pylist())

    ref_dir = str(tmp_path / "shuffle")
    run_extract(
        docs_dir, bucketed, ref_dir,
        chunk_fragments=100, media_mode="mapjoin", reassembly="shuffle",
    )
    golden = read_all(ref_dir)

    for mode, mpath in (("mapjoin", bucketed), ("broadcast", media_path)):
        out_dir = str(tmp_path / f"local-{mode}")
        s = run_extract(
            docs_dir, mpath, out_dir,
            chunk_fragments=100, media_mode=mode, reassembly="local",
        )
        assert s["rows_out"] == n_nonempty == 118
        assert read_all(out_dir) == golden

    # cogroup scatters spans across blocks: local pack must refuse
    with pytest.raises(ValueError, match="requires a shuffle-free"):
        run_extract(
            docs_dir, media_path, str(tmp_path / "bad"),
            chunk_fragments=100, media_mode="cogroup", reassembly="local",
        )


def test_manifest_records_lineage(ray_session, tmp_path):
    import json

    docs, media = synth_corpus(30, seed=9)
    docs_dir, media_dir = write_corpus(docs, media, str(tmp_path / "in"), n_fragments=2)
    out_dir = str(tmp_path / "out")
    run_extract(
        docs_dir,
        os.path.join(media_dir, "media-00000.parquet"),
        out_dir,
        chunk_fragments=1,
        media_mode="broadcast",
    )
    with open(os.path.join(out_dir, "_manifest.jsonl")) as f:
        recs = [json.loads(l) for l in f if l.strip()]
    assert len(recs) == 2
    for r in recs:
        assert r["status"] == "done"
        assert r["rows_in"] > 0
        assert r["rows_out"] <= r["rows_in"]  # empty docs dropped
        assert r["model_version"]
        assert os.path.isdir(r["output_uri"])


def test_resume_copartitioned_mode(ray_session, tmp_path):
    """Interrupt-and-resume holds for the bucketed-storage media mode:
    resumed output == uninterrupted output, fragments skipped."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from vietnamese_ocr_ray.sources.storage import write_media_bucketed

    docs, media = synth_corpus(60, seed=29)
    docs_dir, media_dir = write_corpus(docs, media, str(tmp_path / "in"), n_fragments=4)
    bucket_dir = str(tmp_path / "media_bucketed")
    write_media_bucketed(media_dir, bucket_dir, num_buckets=8)

    full_dir = str(tmp_path / "full")
    s_full = run_extract(
        docs_dir, bucket_dir, full_dir, chunk_fragments=2, media_mode="copartitioned"
    )
    assert s_full["fragments_processed"] == 4

    part_in = str(tmp_path / "part_in")
    os.makedirs(part_in)
    frags = sorted(f for f in os.listdir(docs_dir) if f.endswith(".parquet"))
    for f in frags[:2]:
        shutil.copy(os.path.join(docs_dir, f), os.path.join(part_in, f))
    resumed_dir = str(tmp_path / "resumed")
    s1 = run_extract(
        part_in, bucket_dir, resumed_dir, chunk_fragments=2, media_mode="copartitioned"
    )
    assert s1["fragments_processed"] == 2
    for f in frags[2:]:
        shutil.copy(os.path.join(docs_dir, f), os.path.join(part_in, f))
    s2 = run_extract(
        part_in, bucket_dir, resumed_dir, chunk_fragments=2, media_mode="copartitioned"
    )
    assert s2["fragments_done_prior"] == 2
    assert s2["fragments_processed"] == 2

    def read_all(d):
        tabs = []
        for root, _, files in os.walk(d):
            for f in sorted(files):
                if f.endswith(".parquet"):
                    tabs.append(pq.read_table(os.path.join(root, f)))
        t = pa.concat_tables(tabs)
        return canon(t.drop_columns([c for c in ["_fragment"] if c in t.column_names]).to_pylist())

    assert read_all(full_dir) == read_all(resumed_dir)
