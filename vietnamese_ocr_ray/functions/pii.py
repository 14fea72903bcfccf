"""PII detection and redaction — the training-data hygiene operator a
web-scale corpus pipeline runs before anything else ships (emails,
phone numbers, IP addresses -> typed placeholder tokens).

The corpus is synthetic and contains no PII, so :func:`synth_pii`
derives a deterministic contaminated text per document with ONLY
SQL-expressible string ops (concat + integer arithmetic on doc_id):
an email whose local part and domain derive from doc_id/source, a
US-style 7-digit phone, and a dotted-quad IP. Every operator here is
therefore value-checkable end-to-end by a DuckDB oracle that rebuilds
the same contaminated text from the ``documents`` view — both engines
run RE2, so pattern semantics agree byte-for-byte.

Operators (all vectorized Arrow regex kernels, zero per-row Python):

* :func:`synth_pii`   — (doc_id, source, text): text with planted PII
* :func:`pii_redact`  — (doc_id, clean_text, n_emails, n_phones,
  n_ips): per-doc match counts on the original text + sequential
  redaction email -> ip -> phone (placeholders are digit-free, so
  later passes cannot re-match inside earlier replacements)
* :func:`pii_stats`   — per-source totals (sum of counts + docs with
  any PII), one small hash aggregate

Scale shape: redaction is a stateless ``map_batches`` (no shuffle, no
state, no driver traffic); the stats reduce is a per-batch partial
sum into a tiny per-source groupby — the same partial/combine shape
as ``functions/agg.py``.

Reference parity: the reference has no PII stage (it is an OCR repo);
this family is part of the beyond-reference LLM-data-pipeline surface
(SURVEY.md §2.8).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

# RE2 patterns, shared verbatim with the DuckDB oracle strings in
# __ray_entry__.py (both engines are RE2 — keep these in sync).
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IP_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
PHONE_RE = r"\b[0-9]{3}-[0-9]{4}\b"


def _chunked(col):
    return col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col


def synth_pii_array(batch: pa.Table) -> pa.Array:
    """The deterministic contaminated text for each row — string concat
    + integer arithmetic only, the exact expression
    :func:`pii_sql_expr` renders for DuckDB."""
    text = _chunked(batch.column("text"))
    source = _chunked(batch.column("source"))
    ids = _chunked(batch.column("doc_id"))
    ids_s = pc.cast(ids, pa.string())
    ids_np = np.asarray(pc.cast(ids, pa.int64()))
    # 4-digit phone suffix without padding: 1000 + doc_id % 9000
    phone = pc.cast(pa.array(1000 + ids_np % 9000), pa.string())
    oct2 = pc.cast(pa.array(ids_np % 200), pa.string())
    oct3 = pc.cast(pa.array((ids_np // 7) % 200), pa.string())
    oct4 = pc.cast(pa.array(ids_np % 250), pa.string())
    return pc.binary_join_element_wise(
        text,
        pa.scalar(" contact user"),
        ids_s,
        pa.scalar("@mail-"),
        source,
        pa.scalar(".com call 555-"),
        phone,
        pa.scalar(" from 10."),
        oct2,
        pa.scalar("."),
        oct3,
        pa.scalar("."),
        oct4,
        pa.scalar(" end"),
        pa.scalar(""),
    )


def pii_sql_expr(docs: str = "documents") -> str:
    """DuckDB expression rebuilding :func:`synth_pii_array`'s text."""
    return f"""
      text || ' contact user' || CAST(doc_id AS VARCHAR)
        || '@mail-' || source || '.com call 555-'
        || CAST(1000 + doc_id % 9000 AS VARCHAR)
        || ' from 10.' || CAST(doc_id % 200 AS VARCHAR)
        || '.' || CAST((doc_id // 7) % 200 AS VARCHAR)
        || '.' || CAST(doc_id % 250 AS VARCHAR) || ' end'
    """


def synth_pii(ds: rd.Dataset) -> rd.Dataset:
    """(doc_id, source, text) with planted PII."""

    def build(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "source": batch.column("source"),
                "text": synth_pii_array(batch),
            }
        )

    return ds.map_batches(build, batch_format="pyarrow")


def pii_redact_batch(batch: pa.Table) -> pa.Table:
    """Counts on the original text, then sequential redaction.

    Email first (its domain would otherwise be half-eaten by the IP
    pass on numeric domains), then IP (dotted digits), then phone
    (dashed digits). Placeholders contain no digits or '@', so no
    pass can match inside a previous pass's replacement.
    """
    text = synth_pii_array(batch)
    n_emails = pc.cast(pc.count_substring_regex(text, EMAIL_RE), pa.int64())
    n_phones = pc.cast(pc.count_substring_regex(text, PHONE_RE), pa.int64())
    n_ips = pc.cast(pc.count_substring_regex(text, IP_RE), pa.int64())
    clean = pc.replace_substring_regex(
        text, pattern=EMAIL_RE, replacement="<EMAIL>"
    )
    clean = pc.replace_substring_regex(clean, pattern=IP_RE, replacement="<IP>")
    clean = pc.replace_substring_regex(
        clean, pattern=PHONE_RE, replacement="<PHONE>"
    )
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "clean_text": clean,
            "n_emails": n_emails,
            "n_phones": n_phones,
            "n_ips": n_ips,
        }
    )


def pii_redact(ds: rd.Dataset) -> rd.Dataset:
    return ds.map_batches(pii_redact_batch, batch_format="pyarrow")


def pii_stats(ds: rd.Dataset) -> rd.Dataset:
    """Per-source PII totals: one per-batch partial groupby, then a
    tiny per-source hash aggregate (sources are low-cardinality)."""

    def partial(batch: pa.Table) -> pa.Table:
        red = pii_redact_batch(batch)
        any_pii = pc.cast(
            pc.or_(
                pc.greater(red.column("n_emails"), 0),
                pc.or_(
                    pc.greater(red.column("n_phones"), 0),
                    pc.greater(red.column("n_ips"), 0),
                ),
            ),
            pa.int64(),
        )
        t = pa.table(
            {
                "source": batch.column("source"),
                "emails": red.column("n_emails"),
                "phones": red.column("n_phones"),
                "ips": red.column("n_ips"),
                "docs_with_pii": any_pii,
            }
        )
        return (
            t.group_by("source")
            .aggregate(
                [
                    ("emails", "sum"),
                    ("phones", "sum"),
                    ("ips", "sum"),
                    ("docs_with_pii", "sum"),
                ]
            )
            .rename_columns(
                ["source", "emails", "phones", "ips", "docs_with_pii"]
            )
        )

    partials = ds.map_batches(partial, batch_format="pyarrow")
    out = partials.groupby("source").sum(
        ["emails", "phones", "ips", "docs_with_pii"]
    )
    return out.map_batches(
        lambda b: b.rename_columns(
            ["source", "emails", "phones", "ips", "docs_with_pii"]
        ),
        batch_format="pyarrow",
    )
