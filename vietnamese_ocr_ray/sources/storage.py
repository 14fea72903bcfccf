"""Format-pluggable table IO.

Physical storage in this sandbox is Parquet with the Lance logical
schema (pylance is not importable); when ``lance`` IS importable the
readers switch to ``ray.data.read_lance`` and fragments become real
Lance fragments. Everything downstream keys on an abstract
``fragment_id`` (here: the parquet file stem) so a Lance backend drops
in without touching the manifest/resume logic.
"""

from __future__ import annotations

import os

import ray.data as rd


def _lance_available() -> bool:
    try:
        import lance  # noqa: F401

        return True
    except ImportError:
        return False


def list_fragments(path: str) -> list[str]:
    """Deterministic fragment listing of a table directory (or a single
    file). Fragment id = file stem. Accepts both ``*.parquet`` names
    and Ray's extension-less ``part-*`` data files (what the resumable
    extract writer produces), skipping manifests / in-progress temp
    files (``_``-prefixed)."""
    if os.path.isfile(path):
        return [path]
    return sorted(
        os.path.join(path, f)
        for f in os.listdir(path)
        if not f.startswith("_")
        and (f.endswith(".parquet") or f.startswith("part-"))
    )


def fragment_id(path: str) -> str:
    return os.path.splitext(os.path.basename(path))[0]


def read_parquet_clean(path, **kwargs) -> rd.Dataset:
    """``read_parquet`` with file-level schema metadata stripped. The
    driver testdata parquet carries a ``pandas`` metadata dict that
    makes ``pa.Schema`` UNHASHABLE (pyarrow 16), defeating Ray's
    block-schema dedup fast path and flooding logs with "Failed to
    hash the schemas" warnings in every shuffle.

    Preferred path: hand the scanner a metadata-free PROJECTED schema
    (read once from the first file's footer) so even the read task's
    internal block concats see hashable schemas. Fallback: a zero-copy
    ``replace_schema_metadata(None)`` map fused with the read.

    Also sizes the block count from on-disk bytes (~8 MB/block,
    16..1024) unless the caller overrides: Ray's default parallelism
    heuristic splits these small driver tables into 64+ blocks whose
    per-task overhead dominates downstream maps (same fix as
    :func:`read_media`); at real scale the byte-based count grows with
    the data."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    try:
        first = path[0] if isinstance(path, (list, tuple)) else path
        if os.path.isdir(first):
            first = list_fragments(first)[0]
        full = pq.read_schema(first).remove_metadata()
        cols = kwargs.get("columns")
        schema = pa.schema([full.field(n) for n in cols]) if cols else full
        forced = os.environ.get("VOR_FORCE_READ_BLOCKS")
        if forced:
            # test-only knob: scripts/check_invariance.py re-runs every
            # query under a hostile block layout to prove results don't
            # depend on partitioning
            kwargs["override_num_blocks"] = int(forced)
        elif "override_num_blocks" not in kwargs:
            try:
                files = (
                    list(path)
                    if isinstance(path, (list, tuple))
                    else (list_fragments(path) if os.path.isdir(path) else [path])
                )
                total = sum(os.path.getsize(f) for f in files)
                kwargs["override_num_blocks"] = int(
                    min(1024, max(16, -(-total // (8 << 20))))
                )
            except OSError:
                pass
        return rd.read_parquet(path, schema=schema, **kwargs)
    except Exception:
        return rd.read_parquet(path, **kwargs).map_batches(
            lambda b: b.replace_schema_metadata(None), batch_format="pyarrow"
        )


def read_docs(path: str | list[str], **kwargs) -> rd.Dataset:
    """Read the interleaved docs table (DOCS_SCHEMA)."""
    if _lance_available() and isinstance(path, str) and path.endswith(".lance"):
        return rd.read_lance(path, **kwargs)
    return rd.read_parquet(path, **kwargs)


def read_media(path: str | list[str], with_truth: bool = False, **kwargs) -> rd.Dataset:
    """Read the media payload table; the test-only ``truth`` column is
    pruned at the read unless explicitly requested.

    Block count is sized from the on-disk bytes (~64 MB/block, min 8):
    Ray's default parallelism heuristic splits small tables into
    hundreds of tiny blocks, and tiny blocks are pure per-task overhead
    in the downstream co-group shuffle."""
    cols = ["media_ref", "image", "height", "width"] + (
        ["truth"] if with_truth else []
    )
    if _lance_available() and isinstance(path, str) and path.endswith(".lance"):
        return rd.read_lance(path, columns=cols, **kwargs)
    forced = os.environ.get("VOR_FORCE_READ_BLOCKS")
    if forced:
        kwargs["override_num_blocks"] = int(forced)
    elif "override_num_blocks" not in kwargs:
        try:
            files = list_fragments(path) if isinstance(path, str) else list(path)
            total = sum(os.path.getsize(f) for f in files)
            kwargs["override_num_blocks"] = max(8, -(-total // (64 << 20)))
        except OSError:
            pass
    return rd.read_parquet(path, columns=cols, **kwargs)


def write_media_bucketed(
    media_path: str, out_dir: str, num_buckets: int
) -> str:
    """Rewrite the media table hash-partitioned by
    ``fnv1a_bucket(media_ref, num_buckets)`` — one parquet file per
    bucket (``bucket=<i>.parquet``). This is the storage layout the
    ``media_mode="copartitioned"`` join relies on: span rows shuffle to
    their bucket, the media payload NEVER moves through the exchange
    (each reduce task reads exactly its bucket file — a map-side
    bucketed join, the Hive-bucketing / Lance-fragment-colocation
    pattern).

    Distributed write: one groupby shuffle of the media table, each
    bucket group written by its own task.
    """
    import pyarrow as pa
    import pyarrow.parquet as pq

    from vietnamese_ocr_ray.stages.explode import fnv1a_bucket

    os.makedirs(out_dir, exist_ok=True)

    def add_bucket(b: pa.Table) -> pa.Table:
        bk = fnv1a_bucket(b.column("media_ref"), num_buckets)
        return b.append_column("bucket", pa.array(bk.astype("int32")))

    def write_bucket(g: pa.Table) -> pa.Table:
        bk = g.column("bucket")[0].as_py()
        t = g.drop_columns(["bucket"])
        tmp = os.path.join(out_dir, f"_tmp-bucket={bk}.parquet")
        pq.write_table(t, tmp)
        os.replace(tmp, os.path.join(out_dir, f"bucket={bk}.parquet"))
        return pa.table({"bucket": pa.array([bk], pa.int32())})

    written = (
        read_media(media_path, with_truth=True)
        .map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(write_bucket, batch_format="pyarrow")
        .count()
    )
    with open(os.path.join(out_dir, "_BUCKETS"), "w") as f:
        f.write(str(num_buckets))
    assert written <= num_buckets
    return out_dir


def media_bucket_count(bucket_dir: str) -> int:
    with open(os.path.join(bucket_dir, "_BUCKETS")) as f:
        return int(f.read().strip())


def compact_fragments(
    in_dir: str,
    out_dir: str,
    target_mb: int = 64,
) -> dict:
    """Small-file compaction — the maintenance op every parquet/Lance
    lake needs after many incremental (resumable-chunk) writes:
    fragments are greedily grouped by on-disk size up to ``target_mb``
    per output file (deterministic: sorted fragment order), and each
    group is rewritten by its OWN Ray task (read only its members,
    write one file, atomic rename). Row content and order within a
    group are preserved; a ``_COMPACTION`` manifest records the
    group -> source mapping for lineage."""
    import json

    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray

    frags = list_fragments(in_dir)
    if not frags:
        raise ValueError(f"no parquet fragments under {in_dir}")
    groups: list[list[str]] = [[]]
    acc = 0
    target = target_mb << 20
    for f in frags:
        sz = os.path.getsize(f)
        if groups[-1] and acc + sz > target:
            groups.append([])
            acc = 0
        groups[-1].append(f)
        acc += sz

    os.makedirs(out_dir, exist_ok=True)

    @ray.remote
    def write_group(i: int, members: list[str]) -> dict:
        tables = [pq.read_table(m) for m in members]
        t = pa.concat_tables(tables)
        tmp = os.path.join(out_dir, f"_tmp-compact-{i:05d}.parquet")
        pq.write_table(t, tmp)
        final = os.path.join(out_dir, f"compact-{i:05d}.parquet")
        os.replace(tmp, final)
        return {
            "file": os.path.basename(final),
            "rows": t.num_rows,
            "sources": [fragment_id(m) for m in members],
        }

    results = ray.get(
        [write_group.remote(i, g) for i, g in enumerate(groups)]
    )
    manifest = {
        "n_inputs": len(frags),
        "n_outputs": len(groups),
        "rows": int(sum(r["rows"] for r in results)),
        "groups": results,
    }
    with open(os.path.join(out_dir, "_COMPACTION"), "w") as f:
        json.dump(manifest, f)
    return manifest


def write_labels_tsv(media_dir: str, path: str) -> str:
    """Write the reference's TSV label store — one ``filename\\ttext``
    line per image (the format ``src/utils/vocab.py:5-9`` splits on
    ``\\n`` then ``\\t``) — from the media table's (media_ref, truth)
    columns. Label sidecars are small-side by design (the reference
    holds the whole dict in memory), so this is a single headerless
    driver-side file; quoting disabled for line-split fidelity."""
    import pyarrow.csv as pacsv
    import pyarrow.parquet as pq

    t = pq.read_table(media_dir, columns=["media_ref", "truth"])
    pacsv.write_csv(
        t,
        path,
        write_options=pacsv.WriteOptions(
            include_header=False, delimiter="\t", quoting_style="none"
        ),
    )
    return path


def read_labels_tsv(path: str | list[str]) -> rd.Dataset:
    """S2 — the reference's TSV label reader (``filename\\ttext``
    lines, trailing empty line dropped; src/utils/vocab.py:5-9) as a
    Ray Data source: ``read_csv`` with tab delimiter and an explicit
    headerless schema (ref, truth). At scale this shards over files
    and byte ranges like any Arrow CSV scan."""
    from pyarrow import csv as pacsv

    return rd.read_csv(
        path,
        read_options=pacsv.ReadOptions(column_names=["ref", "truth"]),
        parse_options=pacsv.ParseOptions(delimiter="\t", quote_char=False),
    )


def write_docs_jsonl(ds: rd.Dataset, out_dir: str) -> str:
    """Write (doc_id, text) documents as partitioned JSONL — the
    interchange format LLM data pipelines exchange (one object per
    line, utf-8). Ray's json datasink writes one file per block, so
    the layout stays resumable/shardable like the parquet sinks."""
    ds.select_columns(["doc_id", "text"]).write_json(out_dir)
    return out_dir


def read_docs_jsonl(path: str | list[str]) -> rd.Dataset:
    """Read a JSONL documents table written by :func:`write_docs_jsonl`
    (or any {"doc_id": int, "text": str} line format)."""
    return rd.read_json(path)


def write_docs_jsonl_resumable(
    docs_path: str,
    out_dir: str,
    *,
    columns: tuple[str, ...] = ("doc_id", "text"),
    on_fragment=None,
) -> dict:
    """JSONL interchange sink with the SAME fragment-manifest + tmp-
    rename atomicity as the parquet extract path (pipelines/extract.py
    ``run_extract``): one output directory per input fragment, written
    to ``_tmp-*`` then atomically renamed, one manifest line appended
    AFTER the rename.  A rerun skips finished fragments exactly and the
    surviving files are byte-identical (each fragment is read as ONE
    block in source order, so line order is deterministic; at scale a
    Lance fragment is block-sized by construction).

    ``on_fragment(fid)`` is called after each committed fragment —
    fault-injection hook for the interrupt/resume test.

    Returns {fragments_total, fragments_done_prior, fragments_written,
    rows_out}.
    """
    import shutil
    import time

    import pyarrow.parquet as pq

    from vietnamese_ocr_ray.state.manifest import Manifest

    fragments = list_fragments(docs_path)
    manifest = Manifest(os.path.join(out_dir, "_manifest.jsonl"))
    done = manifest.done_fragments()
    pending = [f for f in fragments if fragment_id(f) not in done]
    os.makedirs(out_dir, exist_ok=True)
    for name in os.listdir(out_dir):  # crashed-run leftovers
        if name.startswith("_tmp-"):
            shutil.rmtree(os.path.join(out_dir, name), ignore_errors=True)

    summary = {
        "fragments_total": len(fragments),
        "fragments_done_prior": len(done),
        "fragments_written": 0,
        "rows_out": 0,
    }
    for frag in pending:
        fid = fragment_id(frag)
        t0 = time.perf_counter()
        rows_in = pq.ParquetFile(frag).metadata.num_rows
        tmp = os.path.join(out_dir, f"_tmp-part-{fid}")
        final = os.path.join(out_dir, f"part-{fid}")
        shutil.rmtree(tmp, ignore_errors=True)
        shutil.rmtree(final, ignore_errors=True)
        rd.read_parquet(
            [frag], columns=list(columns), override_num_blocks=1
        ).write_json(tmp)
        os.rename(tmp, final)
        manifest.append(
            [
                {
                    "fragment_id": fid,
                    "status": "done",
                    "rows_in": rows_in,
                    "rows_out": rows_in,
                    "model_version": "jsonl-sink",
                    "output_uri": final,
                    "wall_s": round(time.perf_counter() - t0, 3),
                }
            ]
        )
        summary["fragments_written"] += 1
        summary["rows_out"] += rows_in
        if on_fragment is not None:
            on_fragment(fid)
    return summary
