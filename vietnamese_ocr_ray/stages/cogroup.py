"""Sort-based co-group join of spans with the media payload table —
one read, one shuffle.

Why not ``Dataset.join``: measured on this Ray version, the hash-join
aggregator actors cost ~60-90 us of CPU per row, while the sort-based
groupby shuffle moves the same rows for ~1-2 us/row. So the scale path
unions the span stream with the media table into one schema-aligned
stream, hash-buckets it, and performs an exact in-memory
``pyarrow.Table.join`` per bucket (C++ hash join, zero Python per row).

Bucketing key: media spans bucket on ``media_ref`` (to meet their
payload rows, which bucket the same way); text spans bucket on
``doc_id`` (they need no alignment — doc_id spreads them evenly and
keeps the single shuffle instead of a separate branch + union + second
read of the input). The bucket count directly sets the parallelism of
the downstream recognition stage.

Partitioning assumption: one bucket's media payloads + span rows fit a
task's heap (bucket count is chosen from data size; media payloads are
the dominant term).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from vietnamese_ocr_ray.stages.explode import fnv1a_bucket

PAYLOAD_COLS = ("image", "height", "width")


def _spans_side(batch: pa.Table, num_buckets: int, salt: int) -> pa.Table:
    """Exploded span rows -> union schema (payload columns null) with
    the bucket column. Extra (lineage) columns are carried through.

    Salting (hot-key skew): with ``salt`` S > 1, a media span's bucket
    is base_bucket*S + hash(doc_id, offset) % S — a media_ref shared by
    millions of spans (deduplicated media store) spreads over S
    sub-buckets instead of serializing on one; its payload row is
    replicated to all S sub-buckets by ``_media_side``."""
    n = batch.num_rows
    is_media = pc.equal(batch.column("kind"), "media")
    key = pc.if_else(is_media, batch.column("media_ref"), batch.column("doc_id"))
    base = fnv1a_bucket(key, num_buckets).astype(np.int64)
    if salt > 1:
        sub = fnv1a_bucket(batch.column("doc_id"), salt).astype(np.int64)
        sub = (sub + np.asarray(batch.column("offset")).astype(np.int64)) % salt
        bucket = base * salt + sub
    else:
        bucket = base
    cols = {name: batch.column(name) for name in batch.column_names}
    cols["image"] = pa.nulls(n, pa.binary())
    cols["height"] = pa.nulls(n, pa.int32())
    cols["width"] = pa.nulls(n, pa.int32())
    cols["bucket"] = pa.array(bucket.astype(np.int32))
    return pa.table(cols)


def _media_side(
    batch: pa.Table, num_buckets: int, salt: int, extra_fields: list[pa.Field]
) -> pa.Table:
    """Media payload rows -> union schema (span columns null); with
    salting, each payload row is replicated into every salt sub-bucket
    of its base bucket (small side of the skew trade)."""
    n = batch.num_rows
    cols = {
        "doc_id": pa.nulls(n, pa.string()),
        "offset": pa.nulls(n, pa.int32()),
        "kind": pa.nulls(n, pa.string()),
        "text": pa.nulls(n, pa.string()),
        "media_ref": batch.column("media_ref"),
    }
    for f in extra_fields:
        cols[f.name] = pa.nulls(n, f.type)
    cols["image"] = batch.column("image")
    cols["height"] = batch.column("height")
    cols["width"] = batch.column("width")
    base = fnv1a_bucket(batch.column("media_ref"), num_buckets).astype(np.int64)
    if salt > 1:
        t = pa.table(cols)
        idx = pa.array(np.repeat(np.arange(n, dtype=np.int64), salt))
        t = t.take(idx)
        bucket = (
            np.repeat(base, salt) * salt
            + np.tile(np.arange(salt, dtype=np.int64), n)
        )
        return t.append_column("bucket", pa.array(bucket.astype(np.int32)))
    cols["bucket"] = pa.array(base.astype(np.int32))
    return pa.table(cols)


def _join_bucket(group: pa.Table) -> pa.Table:
    """One bucket: split payload-definition rows from span rows; media
    spans get their payload via an exact pyarrow hash join; text spans
    pass straight through (payload columns stay null)."""
    g = group.drop_columns(["bucket"])
    is_def = pc.is_null(g.column("doc_id"))
    defs = g.filter(is_def).select(["media_ref", *PAYLOAD_COLS])
    spans = g.filter(pc.invert(is_def))
    is_media = pc.equal(spans.column("kind"), "media")
    media_spans = spans.filter(is_media).drop_columns(list(PAYLOAD_COLS))
    text_spans = spans.filter(pc.invert(is_media))
    if media_spans.num_rows == 0:
        return text_spans
    joined = media_spans.join(defs, keys="media_ref", join_type="left outer")
    # align column order for concat
    joined = joined.select(text_spans.column_names)
    if text_spans.num_rows == 0:
        return joined
    return pa.concat_tables([text_spans, joined])


def cogroup_media(
    spans: rd.Dataset,
    media: rd.Dataset,
    num_buckets: int = 96,
    extra_fields: list[pa.Field] | None = None,
    salt: int = 1,
) -> rd.Dataset:
    """Exploded span rows x media table -> span rows with payload
    columns attached to media spans (null for text spans).

    ``extra_fields``: typed lineage columns on the span side (passed
    explicitly — deriving them from the Dataset schema would trigger an
    execution). ``salt`` > 1 spreads hot media_refs over salt
    sub-buckets (payload rows replicated salt times)."""
    extra_fields = extra_fields or []
    left = spans.map_batches(
        lambda b: _spans_side(b, num_buckets, salt), batch_format="pyarrow"
    )
    right = media.map_batches(
        lambda b: _media_side(b, num_buckets, salt, extra_fields),
        batch_format="pyarrow",
    )
    u = left.union(right)
    return u.groupby("bucket").map_groups(_join_bucket, batch_format="pyarrow")


def _spans_bucket_only(batch: pa.Table, num_buckets: int) -> pa.Table:
    """Span rows -> + bucket column (media spans by media_ref, text by
    doc_id) WITHOUT payload null-padding — the copartitioned join never
    moves payload bytes through the shuffle."""
    is_media = pc.equal(batch.column("kind"), "media")
    key = pc.if_else(is_media, batch.column("media_ref"), batch.column("doc_id"))
    bucket = fnv1a_bucket(key, num_buckets)
    return batch.append_column("bucket", pa.array(bucket.astype(np.int32)))


def cogroup_media_copartitioned(
    spans: rd.Dataset, bucket_dir: str
) -> rd.Dataset:
    """Map-side bucketed join against a media table pre-partitioned by
    ``write_media_bucketed``: ONLY the (light) span rows shuffle; each
    bucket task reads its own media bucket file from storage — the
    image payload never enters the exchange. At 100 TB this is the
    difference between shuffling the corpus' media bytes and shuffling
    ~1% of them.

    Requires the storage layout's bucket count (read from the
    ``_BUCKETS`` marker); output schema == :func:`cogroup_media`.
    """
    import pyarrow.parquet as pq

    from vietnamese_ocr_ray.sources.storage import media_bucket_count

    num_buckets = media_bucket_count(bucket_dir)

    def join_bucket(group: pa.Table) -> pa.Table:
        bk = group.column("bucket")[0].as_py()
        g = group.drop_columns(["bucket"])
        n = g.num_rows
        is_media = pc.equal(g.column("kind"), "media")
        media_spans = g.filter(is_media)
        text_spans = g.filter(pc.invert(is_media))
        tcols = {name: text_spans.column(name) for name in text_spans.column_names}
        tcols["image"] = pa.nulls(text_spans.num_rows, pa.binary())
        tcols["height"] = pa.nulls(text_spans.num_rows, pa.int32())
        tcols["width"] = pa.nulls(text_spans.num_rows, pa.int32())
        text_out = pa.table(tcols)
        if media_spans.num_rows == 0:
            return text_out
        path = os.path.join(bucket_dir, f"bucket={bk}.parquet")
        if os.path.exists(path):
            defs = pq.read_table(path, columns=["media_ref", *PAYLOAD_COLS])
        else:  # no media landed in this bucket: left join yields nulls
            defs = pa.table(
                {
                    "media_ref": pa.array([], pa.string()),
                    "image": pa.array([], pa.binary()),
                    "height": pa.array([], pa.int32()),
                    "width": pa.array([], pa.int32()),
                }
            )
        joined = media_spans.join(defs, keys="media_ref", join_type="left outer")
        joined = joined.select(text_out.column_names)
        if text_spans.num_rows == 0:
            return joined
        return pa.concat_tables([text_out, joined])

    bucketed = spans.map_batches(
        lambda b: _spans_bucket_only(b, num_buckets), batch_format="pyarrow"
    )
    return bucketed.groupby("bucket").map_groups(
        join_bucket, batch_format="pyarrow"
    )
