"""The flagship extraction pipeline (SURVEY.md §3.1 restated
Ray-Data-first):

    read docs (Lance-layout Parquet, columns pruned)
      -> explode spans (vectorized Arrow kernel)
      -> kind-route:  text  -> NFC normalization
                      media -> payload join -> preprocess -> recognizer
                               actor pool -> decode -> empty->"a" fill
      -> groupby(doc_id) + per-group sort(offset) reassembly shuffle
      -> write partitioned Parquet + per-fragment lineage manifest

Four media-payload strategies (measured trade-offs in
BENCH/BASELINE.md):

* ``media_mode="cogroup"`` (default, the 100 TB path): one sort-based
  bucket shuffle unions span rows with the media table and performs an
  exact per-bucket pyarrow hash join (stages/cogroup.py). ONE pass over
  the input, one cheap shuffle, one reassembly shuffle; media bytes are
  moved exactly once and never collected on any single node.

* ``media_mode="join"``: Ray-native hash join, same semantics (kept for
  parity; measured ~60x more shuffle CPU per row on this Ray version).

* ``media_mode="broadcast"``: the media payload dict is ray.put ONCE by
  the driver and fetched once per recognition actor — zero join
  shuffle. Correct only while the media table fits a worker heap
  (small-side broadcast rule); intended for dictionary-sized media.

* ``media_mode="copartitioned"``: media pre-partitioned on storage by
  ``write_media_bucketed``; span rows shuffle to their bucket and each
  reduce task reads its OWN media bucket file — payload bytes never
  enter the exchange (-53%% exchange bytes measured; the media-heavy
  scale path).

Skew: exploding first turns doc-level skew (one doc with 10^3 media
spans) into span-level rows; the bucket shuffle plus optional salting
(``cogroup_salt``) spread them across the actor pool, so dense docs do
not serialize recognition. Reassembly re-concentrates a doc on one
bucket by necessity (output is per-doc); buckets hold ~rows/B docs, and
``output_format="spans"`` removes the per-doc row-size cap entirely.
"""

from __future__ import annotations

import os
import shutil
import time

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data as rd

from vietnamese_ocr_ray.model import MODEL_VERSION
from vietnamese_ocr_ray.sources.storage import (
    fragment_id,
    list_fragments,
    read_docs,
    read_media,
)
from vietnamese_ocr_ray.stages.explode import explode_batch, reassemble
from vietnamese_ocr_ray.stages.recognize import RecognizeSpans
from vietnamese_ocr_ray.state.manifest import Manifest


def default_pool(cpus: int) -> tuple[int, int]:
    """Recognition actor-pool sizing for a node/cluster with ``cpus``
    CPUs: min = cpus/4 (warm start), max = 3/4 of the CPUs — a pool
    that reserves every CPU starves the read/shuffle stages and the
    pipeline serializes (observed as a hang at concurrency == cpus)."""
    return (max(1, cpus // 4), max(2, (cpus * 3) // 4))


def extract_spans(
    docs: rd.Dataset,
    media: "rd.Dataset | dict | None",
    *,
    media_mode: str = "cogroup",
    join_partitions: int = 8,
    cogroup_buckets: int = 64,
    cogroup_salt: int = 1,
    recognize_batch_size: int = 512,
    recognize_concurrency=(1, 32),
    recognize_compute: str = "actors",
    num_buckets: int = 64,
    lineage_fields: list[pa.Field] | None = None,
    vocab=None,
    output_format: str = "docs",
    two_stage: bool = False,
    span_processors: "dict | bool | None" = None,
    decode: str = "greedy",
) -> rd.Dataset:
    """docs Dataset (+ media payloads) -> extracted docs Dataset.

    ``media``: a Dataset of MEDIA_SCHEMA rows (cogroup/join modes) or a
    ray.ObjectRef / dict of {media_ref: (bytes, h, w)} (broadcast mode).

    Modes (measured trade-offs in BENCH/BASELINE.md):
      * cogroup (default, scale path): split text/media branches; media
        spans meet payloads via one sort-based bucket shuffle + exact
        per-bucket pyarrow join; ``cogroup_buckets`` also sets the
        recognition stage's parallelism.
      * join: Ray-native hash join (same semantics; measured ~60x more
        shuffle CPU per row on this Ray version — kept for parity).
      * broadcast: payload dict shipped once per actor; zero media
        shuffle; only for dictionary-sized media tables.

    ``lineage_fields``: typed extra doc-level columns (e.g. _fragment)
    to carry end-to-end.

    ``decode``: "greedy" (vectorized reference path, default) or
    "beam" (width-``4`` scored beam search in the recognize actors;
    top-1 == greedy for the deterministic stand-in, tested e2e —
    reference family: seq2seq beam decoding).

    ``output_format``: "docs" (default) packs per-doc span lists via the
    reassembly shuffle; "spans" is the chunked-stitching fallback for
    corpora whose largest docs exceed a packable row (SURVEY.md §7.3) —
    a globally sorted flat (doc_id, offset, kind, text, media_ref)
    table with identical content, no per-doc row-size cap.
    """

    if decode != "greedy" and two_stage:
        raise ValueError(
            "decode='beam' is a RecognizeSpans option; the two-stage "
            "detect/recognize path decodes greedily (RecognizeBoxes)"
        )

    def finish(recognized_ds):
        if output_format == "spans":
            return recognized_ds.sort(["doc_id", "offset"])
        if output_format == "recognized":
            # raw recognized span rows in block order — the input to
            # run_extract's sink-fused local reassembly (PackWriteInterior)
            return recognized_ds
        if output_format != "docs":
            raise ValueError(f"unknown output_format {output_format!r}")
        return reassemble(recognized_ds, num_buckets=num_buckets)

    exploded = docs.map_batches(explode_batch, batch_format="pyarrow")

    if media_mode == "mapjoin":
        # zero-media-shuffle: payload attach happens INSIDE the
        # recognize actors from the write_media_bucketed layout (LRU
        # bucket cache per actor) — no exchange before reassembly at
        # all.  The cluster scale path: the cogroup/copartitioned
        # bucket sort's cross-node block fetches disappear entirely.
        if not isinstance(media, str):
            raise TypeError("media_mode='mapjoin' needs the bucketed media DIR")
        from vietnamese_ocr_ray.stages.recognize import (
            RecognizeSpansMapJoin,
            recognize_spans_mapjoin_task,
        )

        if recognize_compute == "tasks" and vocab is None and decode == "greedy":
            recognized = exploded.map_batches(
                recognize_spans_mapjoin_task,
                batch_format="pyarrow",
                batch_size=recognize_batch_size,
                fn_kwargs={"bucket_dir": media},
            )
        else:
            recognized = exploded.map_batches(
                RecognizeSpansMapJoin,
                batch_format="pyarrow",
                batch_size=recognize_batch_size,
                concurrency=recognize_concurrency,
                fn_constructor_kwargs={
                    "bucket_dir": media,
                    "vocab": vocab,
                    "decode": decode,
                },
            )
        return finish(recognized)

    if media_mode == "copartitioned":
        # map-side bucketed join against write_media_bucketed storage:
        # only span rows shuffle; payload bytes never enter the exchange
        if not isinstance(media, str):
            raise TypeError(
                "media_mode='copartitioned' needs the bucketed media DIR"
            )
        if cogroup_salt > 1:
            raise ValueError(
                "copartitioned mode cannot salt at read time — hot keys "
                "must be split when writing the bucketed layout "
                "(write_media_bucketed with more buckets)"
            )
        from vietnamese_ocr_ray.stages.cogroup import cogroup_media_copartitioned

        joined = cogroup_media_copartitioned(exploded, media)
        if two_stage:
            from vietnamese_ocr_ray.stages.twostage import DetectSpans, RecognizeBoxes

            detected = joined.map_batches(
                DetectSpans,
                batch_format="pyarrow",
                batch_size=recognize_batch_size,
                concurrency=recognize_concurrency,
                fn_constructor_kwargs={"vocab": vocab},
            )
            recognized = detected.map_batches(
                RecognizeBoxes,
                batch_format="pyarrow",
                batch_size=recognize_batch_size,
                concurrency=recognize_concurrency,
                fn_constructor_kwargs={"vocab": vocab},
            )
        elif recognize_compute == "tasks" and vocab is None and decode == "greedy":
            from vietnamese_ocr_ray.stages.recognize import recognize_spans_task

            recognized = joined.map_batches(
                recognize_spans_task,
                batch_format="pyarrow",
                batch_size=recognize_batch_size,
            )
        else:
            recognized = joined.map_batches(
                RecognizeSpans,
                batch_format="pyarrow",
                batch_size=recognize_batch_size,
                concurrency=recognize_concurrency,
                fn_constructor_kwargs={"vocab": vocab, "decode": decode},
            )
        return finish(recognized)

    if media_mode == "cogroup":
        if not isinstance(media, rd.Dataset):
            raise TypeError("media_mode='cogroup' needs a media Dataset")
        from vietnamese_ocr_ray.stages.cogroup import cogroup_media

        joined = cogroup_media(
            exploded,
            media,
            num_buckets=cogroup_buckets,
            extra_fields=lineage_fields,
            salt=cogroup_salt,
        )
        if two_stage:
            # north-star GPU shape: detection pool then recognition pool,
            # independently sizable (num_gpus per stage on a real cluster)
            from vietnamese_ocr_ray.stages.twostage import DetectSpans, RecognizeBoxes

            detected = joined.map_batches(
                DetectSpans,
                batch_format="pyarrow",
                batch_size=recognize_batch_size,
                concurrency=recognize_concurrency,
                fn_constructor_kwargs={"vocab": vocab},
            )
            recognized = detected.map_batches(
                RecognizeBoxes,
                batch_format="pyarrow",
                batch_size=recognize_batch_size,
                concurrency=recognize_concurrency,
                fn_constructor_kwargs={"vocab": vocab},
            )
        elif span_processors is not None:
            # user-extension surface (SURVEY.md §2.9): per-kind
            # processor registry routed by SpanRouter. True = the
            # global SPAN_PROCESSORS registry; a dict = explicit
            # kind -> factory overrides.
            from vietnamese_ocr_ray.stages.router import SpanRouter

            recognized = joined.map_batches(
                SpanRouter,
                batch_format="pyarrow",
                batch_size=recognize_batch_size,
                concurrency=recognize_concurrency,
                fn_constructor_kwargs={
                    "processors": None if span_processors is True else span_processors
                },
            )
        elif recognize_compute == "tasks" and vocab is None and decode == "greedy":
            from vietnamese_ocr_ray.stages.recognize import recognize_spans_task

            recognized = joined.map_batches(
                recognize_spans_task,
                batch_format="pyarrow",
                batch_size=recognize_batch_size,
            )
        else:
            recognized = joined.map_batches(
                RecognizeSpans,
                batch_format="pyarrow",
                batch_size=recognize_batch_size,
                concurrency=recognize_concurrency,
                fn_constructor_kwargs={"vocab": vocab, "decode": decode},
            )
        return finish(recognized)

    if media_mode == "join":
        if not isinstance(media, rd.Dataset):
            raise TypeError("media_mode='join' needs a media Dataset")
        joined = exploded.join(
            media,
            join_type="left_outer",
            num_partitions=join_partitions,
            on=("media_ref",),
        )
        recognized = joined.map_batches(
            RecognizeSpans,
            batch_format="pyarrow",
            batch_size=recognize_batch_size,
            concurrency=recognize_concurrency,
            fn_constructor_kwargs={"vocab": vocab, "decode": decode},
        )
    elif media_mode == "broadcast":
        import ray

        handle = media
        if isinstance(media, dict):
            handle = ray.put(media)
        recognized = exploded.map_batches(
            RecognizeSpans,
            batch_format="pyarrow",
            batch_size=recognize_batch_size,
            concurrency=recognize_concurrency,
            fn_constructor_kwargs={"media_handle": handle, "vocab": vocab, "decode": decode},
        )
    else:
        raise ValueError(f"unknown media_mode {media_mode!r}")

    return finish(recognized)


import functools


@functools.lru_cache(maxsize=1)
def _predict_model():
    """predict_single is the interactive path (app.py): cache the model
    across calls instead of rebuilding per image."""
    from vietnamese_ocr_ray.model import DeterministicRecognizer

    return DeterministicRecognizer()


def predict_single(image, media_ref: str = "predict") -> str:
    """Single-image predict path (app.py:52-61 ->
    src/utils/inference.py:52-64): one grayscale uint8 (H, W) array
    through the same preprocess + greedy-decode semantics, including
    the empty->"a" fill. No Dataset round-trip for one row — exactly as
    the reference calls the model directly from Streamlit."""
    import numpy as np

    from vietnamese_ocr_ray.preprocess import preprocess_one

    model = _predict_model()
    x = preprocess_one(np.asarray(image, dtype=np.uint8), media_ref)
    text = model.recognize_texts(x[None])[0].as_py()
    return text if text else "a"


def media_lookup(media_path: str) -> dict:
    """Load a (small) media table into a broadcastable lookup dict."""
    t = pq.read_table(
        media_path, columns=["media_ref", "image", "height", "width"]
    )
    return {
        r: (img, h, w)
        for r, img, h, w in zip(
            t.column("media_ref").to_pylist(),
            t.column("image").to_pylist(),
            t.column("height").to_pylist(),
            t.column("width").to_pylist(),
        )
    }


def run_extract(
    docs_path: str,
    media_path: str,
    out_dir: str,
    *,
    chunk_fragments: int = 8,
    media_mode: str = "cogroup",
    read_blocks: int = 0,
    reassembly: str = "shuffle",
    **pipeline_kwargs,
) -> dict:
    """Resumable driver loop: process input fragments in chunks, write
    each chunk's output atomically (tmp dir + rename), record one
    manifest line per finished fragment. A rerun skips finished
    fragments exactly and produces byte-identical remaining output.

    ``reassembly``: "shuffle" (default) routes recognized spans through
    the bucketed groupby pack; "local" (requires media_mode mapjoin or
    broadcast — the shuffle-free modes) packs each block's interior
    docs in the sink and stitches only block-edge docs, the certified
    zero-shuffle cluster configuration (BENCH/BASELINE.md round 5). On
    a multi-node cluster ``out_dir`` must be shared storage in local
    mode (pack tasks write from workers).

    Returns summary {fragments_total, fragments_done_prior,
    fragments_processed, rows_in, rows_out}.
    """
    fragments = list_fragments(docs_path)
    manifest = Manifest(os.path.join(out_dir, "_manifest.jsonl"))
    done = manifest.done_fragments()
    pending = [f for f in fragments if fragment_id(f) not in done]
    os.makedirs(out_dir, exist_ok=True)
    # clean tmp leftovers of a crashed run
    for name in os.listdir(out_dir):
        if name.startswith("_tmp-"):
            shutil.rmtree(os.path.join(out_dir, name), ignore_errors=True)

    summary = {
        "fragments_total": len(fragments),
        "fragments_done_prior": len(done),
        "fragments_processed": 0,
        "rows_in": 0,
        "rows_out": 0,
    }

    if reassembly == "local":
        # sink-fused pack consumes raw recognized span rows
        pipeline_kwargs = {**pipeline_kwargs, "output_format": "recognized"}

    broadcast_handle = None
    if media_mode == "broadcast":
        import ray

        broadcast_handle = ray.put(media_lookup(media_path))

    for i in range(0, len(pending), chunk_fragments):
        chunk_t0 = time.perf_counter()
        chunk = pending[i : i + chunk_fragments]
        chunk_name = f"part-{fragment_id(chunk[0])}"
        rows_in = {
            fragment_id(f): pq.ParquetFile(f).metadata.num_rows for f in chunk
        }

        # read with lineage: ONE read over the whole chunk's files with
        # include_paths, deriving _fragment from the path column. (A
        # union of per-fragment reads — the previous shape — multiplies
        # block count by fragment count: at 64 fragments the downstream
        # sort shuffle degenerated to ~4096 sub-row blocks whose
        # per-task scheduling dominated wall time on a multi-node
        # cluster; at 10^5 Lance fragments it would never finish.)
        def tag_fragment(b: pa.Table) -> pa.Table:
            paths = b.column("path")
            if isinstance(paths, pa.ChunkedArray):
                paths = paths.combine_chunks()
            # fragment_id == basename without extension
            base = pc.replace_substring_regex(
                paths, pattern=r"^.*/", replacement=""
            )
            fid = pc.replace_substring_regex(
                base, pattern=r"\.[^.]*$", replacement=""
            )
            return b.drop_columns(["path"]).append_column(
                "_fragment", pc.cast(fid, pa.string())
            )

        # read_blocks: fixed input block count (cpu-independent) — Ray's
        # sort shuffle makes one physical partition per input block, so
        # the default many-tiny-blocks read starves the shuffle with
        # per-partition overhead (the bench.py override_num_blocks=48
        # finding); 0 = Ray's automatic sizing
        read_kwargs = (
            {"override_num_blocks": read_blocks} if read_blocks else {}
        )
        ds = read_docs(
            list(chunk), include_paths=True, **read_kwargs
        ).map_batches(tag_fragment, batch_format="pyarrow")

        if media_mode in ("copartitioned", "mapjoin"):
            # media_path is the write_media_bucketed directory
            result = extract_spans(
                ds,
                media_path,
                media_mode=media_mode,
                **pipeline_kwargs,
            )
        elif media_mode in ("join", "cogroup"):
            media_ds = read_media(media_path)
            result = extract_spans(
                ds,
                media_ds,
                media_mode=media_mode,
                lineage_fields=[pa.field("_fragment", pa.string())],
                **pipeline_kwargs,
            )
        else:
            result = extract_spans(
                ds, broadcast_handle, media_mode="broadcast", **pipeline_kwargs
            )

        tmp = os.path.join(out_dir, f"_tmp-{chunk_name}")
        final = os.path.join(out_dir, chunk_name)
        shutil.rmtree(tmp, ignore_errors=True)
        shutil.rmtree(final, ignore_errors=True)
        if reassembly == "local":
            # Sink-fused local pack (PackWriteInterior): each task packs
            # and writes its block's interior docs directly; only the
            # ~2-docs-per-block edge stream rides the bucketed
            # reassembly shuffle.  Valid whenever spans never left their
            # input block (mapjoin/broadcast modes); the chunk-level
            # tmp-dir + rename atomicity and the manifest are unchanged.
            if media_mode not in ("mapjoin", "broadcast"):
                raise ValueError(
                    "reassembly='local' requires a shuffle-free media "
                    "mode (mapjoin or broadcast) — cogroup/join/"
                    "copartitioned scatter spans across blocks"
                )
            from vietnamese_ocr_ray.stages.explode import (
                PackWriteInterior,
                reassemble,
            )

            os.makedirs(tmp, exist_ok=True)
            edges = result.map_batches(
                PackWriteInterior(tmp),  # instance => task pool
                batch_size=None,
                batch_format="pyarrow",
            )
            stitched = reassemble(
                edges, num_buckets=pipeline_kwargs.get("num_buckets", 64)
            )
            stitched.write_parquet(tmp)
            result = stitched  # stats handle below covers the full chain
        else:
            result.write_parquet(tmp)
        if os.environ.get("VNOCR_STATS"):
            import sys as _sys

            print(result.stats(), file=_sys.stderr, flush=True)
        os.rename(tmp, final)

        # lineage metrics: per-fragment output doc counts (column-pruned
        # metadata read of what was just written — no recompute)
        out_frag = pq.read_table(final, columns=["_fragment"])
        counts = pc.value_counts(out_frag.column("_fragment"))
        rows_out = {
            d["values"]: d["counts"] for d in counts.to_pylist()
        }
        # wall_s is the CHUNK's wall time (fragments in one chunk share
        # a pipeline run, so it repeats on each of the chunk's records;
        # divide by len(chunk) for a per-fragment estimate)
        chunk_wall = round(time.perf_counter() - chunk_t0, 3)
        records = [
            {
                "fragment_id": fid,
                "status": "done",
                "rows_in": rows_in[fid],
                "rows_out": int(rows_out.get(fid, 0)),
                "model_version": MODEL_VERSION,
                "output_uri": final,
                "wall_s": chunk_wall,
            }
            for fid in (fragment_id(f) for f in chunk)
        ]
        manifest.append(records)
        summary["fragments_processed"] += len(chunk)
        summary["rows_in"] += sum(rows_in.values())
        summary["rows_out"] += int(out_frag.num_rows)

    return summary
