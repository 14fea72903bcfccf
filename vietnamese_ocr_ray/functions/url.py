"""URL parsing and per-domain aggregation — the domain-level filtering
axis of a CommonCrawl-style corpus pipeline (crawl curation keeps or
drops whole registered domains by aggregate quality).

The corpus has no URL column, so :func:`synth_url` derives a
deterministic URL per document with ONLY SQL-expressible ops (concat,
integer arithmetic, CASE): ~13 hosts per source across two public
suffixes (``.com`` and the two-level ``.co.uk``), a lang-prefixed
path, and a query string on every third doc. Every operator is
value-checked end-to-end by a DuckDB oracle that rebuilds the same
URL from the ``documents`` view (both engines run RE2).

Operators (all vectorized Arrow kernels, zero per-row Python):

* :func:`synth_url`    — (doc_id, url)
* :func:`url_parse`    — (doc_id, scheme, host, registered_domain,
  path, has_query): one ``extract_regex`` pass + a public-suffix-aware
  registered-domain rule (last 3 labels under ``.co.uk``, else last 2)
* :func:`domain_stats` — per-registered-domain doc count, total chars,
  and query-string fraction: per-batch partial groupby then a tiny
  domain-level hash aggregate (domains are low-cardinality relative
  to docs — the partial/combine shape of ``functions/agg.py``)

Scale shape: parse is a stateless ``map_batches``; the stats reduce
shuffles one tiny row per (batch, domain). At 100 TB the domain count
(~10^7) still fits a hash aggregate; no driver traffic.

Reference parity: beyond-reference LLM-data-pipeline surface
(SURVEY.md §2.8); the reference has no web provenance concept.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

URL_RE = r"^(?P<scheme>https?)://(?P<host>[^/]+)(?P<path>/[^?]*)(?P<q>\?.*)?$"
_COUK_DOM_RE = r"[^.]+\.co\.uk$"
_COM_DOM_RE = r"[^.]+\.[^.]+$"


def _chunked(col):
    return col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col


def synth_url_array(batch: pa.Table) -> pa.Array:
    """The deterministic URL for each row — the exact expression
    :func:`url_sql_expr` renders for DuckDB."""
    source = _chunked(batch.column("source"))
    lang = _chunked(batch.column("lang"))
    ids = _chunked(batch.column("doc_id"))
    ids_np = np.asarray(pc.cast(ids, pa.int64()))
    hostn = pc.cast(pa.array(ids_np % 13), pa.string())
    tld = pc.if_else(
        pa.array(ids_np % 4 == 0), pa.scalar(".co.uk"), pa.scalar(".com")
    )
    query = pc.if_else(
        pa.array(ids_np % 3 == 0),
        pc.binary_join_element_wise(
            pa.scalar("?ref="),
            pc.cast(pa.array(ids_np % 5), pa.string()),
            pa.scalar(""),
        ),
        pa.scalar(""),
    )
    return pc.binary_join_element_wise(
        pa.scalar("https://www."),
        source,
        pa.scalar("-"),
        hostn,
        tld,
        pa.scalar("/"),
        lang,
        pa.scalar("/article/"),
        pc.cast(ids, pa.string()),
        query,
        pa.scalar(""),
    )


def url_sql_expr(docs: str = "documents") -> str:
    """DuckDB expression rebuilding :func:`synth_url_array`'s URL."""
    return """
      'https://www.' || source || '-' || CAST(doc_id % 13 AS VARCHAR)
        || CASE WHEN doc_id % 4 = 0 THEN '.co.uk' ELSE '.com' END
        || '/' || lang || '/article/' || CAST(doc_id AS VARCHAR)
        || CASE WHEN doc_id % 3 = 0
                THEN '?ref=' || CAST(doc_id % 5 AS VARCHAR) ELSE '' END
    """


def synth_url(ds: rd.Dataset) -> rd.Dataset:
    def build(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"doc_id": batch.column("doc_id"), "url": synth_url_array(batch)}
        )

    return ds.map_batches(build, batch_format="pyarrow")


def _parse_url_columns(url: pa.Array) -> dict[str, pa.Array]:
    parts = pc.extract_regex(url, URL_RE)
    host = pc.struct_field(parts, "host")
    # registered domain: last 3 labels under the two-level .co.uk
    # suffix, else last 2 (the CASE the oracle mirrors)
    reg = pc.if_else(
        pc.ends_with(host, ".co.uk"),
        pc.extract_regex(host, f"(?P<d>{_COUK_DOM_RE})").field("d"),
        pc.extract_regex(host, f"(?P<d>{_COM_DOM_RE})").field("d"),
    )
    return {
        "scheme": pc.struct_field(parts, "scheme"),
        "host": host,
        "registered_domain": reg,
        "path": pc.struct_field(parts, "path"),
        "has_query": pc.cast(
            pc.greater(
                pc.utf8_length(pc.struct_field(parts, "q")), 0
            ),
            pa.int64(),
        ),
    }


def url_parse(ds: rd.Dataset) -> rd.Dataset:
    """(doc_id, scheme, host, registered_domain, path, has_query)."""

    def parse(batch: pa.Table) -> pa.Table:
        cols = _parse_url_columns(synth_url_array(batch))
        return pa.table({"doc_id": batch.column("doc_id"), **cols})

    return ds.map_batches(parse, batch_format="pyarrow")


def domain_stats(ds: rd.Dataset) -> rd.Dataset:
    """Per-registered-domain: docs, total chars, docs with a query
    string — partial per-batch groupby, then the domain-level combine."""

    def partial(batch: pa.Table) -> pa.Table:
        cols = _parse_url_columns(synth_url_array(batch))
        t = pa.table(
            {
                "registered_domain": cols["registered_domain"],
                "docs": pa.array(np.ones(batch.num_rows, np.int64)),
                "total_chars": pc.cast(
                    pc.utf8_length(_chunked(batch.column("text"))), pa.int64()
                ),
                "with_query": cols["has_query"],
            }
        )
        return (
            t.group_by("registered_domain")
            .aggregate(
                [("docs", "sum"), ("total_chars", "sum"), ("with_query", "sum")]
            )
            .rename_columns(
                ["registered_domain", "docs", "total_chars", "with_query"]
            )
        )

    partials = ds.map_batches(partial, batch_format="pyarrow")
    out = partials.groupby("registered_domain").sum(
        ["docs", "total_chars", "with_query"]
    )
    return out.map_batches(
        lambda b: b.rename_columns(
            ["registered_domain", "docs", "total_chars", "with_query"]
        ),
        batch_format="pyarrow",
    )


def domain_filter(ds: rd.Dataset, min_docs: int = 2, min_avg_chars: int = 250) -> rd.Dataset:
    """Domain-level corpus curation: keep docs whose registered domain
    has at least ``min_docs`` documents AND average length >=
    ``min_avg_chars`` (evaluated integer-exact as total_chars >=
    min_avg_chars * docs — no float boundary). Two stages: the
    :func:`domain_stats` aggregate, then a broadcast semi-join of the
    kept-domain set (domains are the small side; at 10^7+ domains the
    same filter runs as the Bloom-prefiltered membership join of
    functions/membership.py)."""
    import ray

    stats = domain_stats(ds)

    def keep_domains(b: pa.Table) -> pa.Table:
        docs = np.asarray(b.column("docs"))
        chars = np.asarray(b.column("total_chars"))
        m = (docs >= min_docs) & (chars >= min_avg_chars * docs)
        return b.filter(pa.array(m)).select(["registered_domain"])

    kdf = stats.map_batches(keep_domains, batch_format="pyarrow").to_pandas()
    # fully-empty Datasets lose their schema at to_pandas()
    kept = (
        kdf["registered_domain"].to_numpy()
        if "registered_domain" in kdf.columns
        else np.array([], dtype=object)
    )
    handle = ray.put(np.sort(kept.astype(object)))

    def filt(batch: pa.Table) -> pa.Table:
        dom = _parse_url_columns(synth_url_array(batch))["registered_domain"]
        keep_set = ray.get(handle)
        m = np.isin(np.asarray(dom).astype(object), keep_set)
        out = batch.filter(pa.array(m)).select(["doc_id"])
        return out.append_column(
            "registered_domain",
            pa.array(np.asarray(dom).astype(object)[m]),
        )

    return ds.map_batches(filt, batch_format="pyarrow")


def domain_cap(ds: rd.Dataset, k: int = 10, salt: str = "cap:") -> rd.Dataset:
    """Per-domain document cap (the MassiveText/RefinedWeb source-
    balancing rule: no single site may dominate the corpus): keep at
    most ``k`` docs per registered domain, chosen by smallest salted
    mixed hash — deterministic, rerun/partitioning-stable, SQL-mirrored
    (QUALIFY row_number <= k). One (doc_id, domain) projection, then
    :func:`~vietnamese_ocr_ray.functions.sampling.sample_k_per_group`'s
    partial-top-k shape: the shuffle carries k x domains x blocks rows,
    never the corpus."""
    from vietnamese_ocr_ray.functions.sampling import sample_k_per_group

    def project(batch: pa.Table) -> pa.Table:
        cols = _parse_url_columns(synth_url_array(batch))
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "registered_domain": cols["registered_domain"],
            }
        )

    parsed = ds.map_batches(project, batch_format="pyarrow")
    return sample_k_per_group(
        parsed, "doc_id", "registered_domain", k, salt=salt
    )
