"""Arrow schemas for every table the engine reads or writes.

The reference keeps its data model implicit (dict-of-tensors keyed by
file name, reference src/utils/inference.py:83-89); here every dataset
has a fixed, explicit ``pyarrow.Schema`` asserted at the read boundary.

Physical storage is Parquet with the Lance logical layout (pylance is
not importable in this sandbox; sources/storage.py picks ``read_lance``
when it is).
"""

from __future__ import annotations

import pyarrow as pa

# One span of an interleaved document. kind is "text" or "media".
SPAN_STRUCT = pa.struct(
    [
        pa.field("kind", pa.string()),
        pa.field("text", pa.string()),
        pa.field("media_ref", pa.string()),
        pa.field("offset", pa.int32()),
    ]
)

# Input / output docs table (BASELINE.json input_hint shape).
DOCS_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("spans", pa.list_(SPAN_STRUCT)),
    ]
)

# Media payload store. ``image`` is raw uint8 grayscale H*W bytes
# (row-major); the reference's file-per-image directory
# (src/utils/inference.py:45,125) becomes rows with a binary column.
MEDIA_SCHEMA = pa.schema(
    [
        pa.field("media_ref", pa.string()),
        pa.field("image", pa.binary()),
        pa.field("height", pa.int32()),
        pa.field("width", pa.int32()),
        pa.field("truth", pa.string()),  # test-only ground truth; never read by the pipeline
    ]
)

# Exploded span rows (intermediate) — the per-file loop of
# reference src/utils/inference.py:85-88, flattened.
SPANS_EXPLODED_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("offset", pa.int32()),
        pa.field("kind", pa.string()),
        pa.field("text", pa.string()),
        pa.field("media_ref", pa.string()),
    ]
)

# Reassembled output (same layout as DOCS_SCHEMA; media spans carry
# recognized text — reference prediction.txt rows,
# src/utils/inference.py:105-121).
EXTRACTED_SCHEMA = DOCS_SCHEMA

# Vocabulary sidecar (reference src/utils/vocab.py:14-15,33-39).
VOCAB_SCHEMA = pa.schema(
    [
        pa.field("letter", pa.string()),
        pa.field("id", pa.int32()),
    ]
)


def assert_schema(table: pa.Table, schema: pa.Schema, name: str = "table") -> None:
    """Fail fast when a table does not carry the expected columns/types.

    Extra columns are allowed (e.g. lineage columns); missing or
    mistyped ones are an error.
    """
    for field in schema:
        idx = table.schema.get_field_index(field.name)
        if idx < 0:
            raise ValueError(f"{name}: missing column {field.name!r}")
        actual = table.schema.field(idx).type
        if actual != field.type:
            raise ValueError(
                f"{name}.{field.name}: expected {field.type}, got {actual}"
            )
