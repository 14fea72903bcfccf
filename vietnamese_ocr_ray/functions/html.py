"""HTML main-content extraction — the web-extraction operator family
(boilerplate strip, link-density DOM heuristics, interleaved-span
emission) expressed as vectorized Ray Data transforms.

The corpus has no raw-HTML column, so :func:`synth_html` derives a
deterministic page per document with ONLY SQL-expressible string ops
(concat / replace / CASE) — nav, ad and footer boilerplate blocks
(anchor-dense), an ``<article>`` whose paragraphs come from the doc
text, and a media ``<img>`` for every third doc. Every operator here is
therefore value-checkable end-to-end by a DuckDB oracle that rebuilds
the same HTML from the ``documents`` view (oracles in
``__ray_entry__.py``; both engines use RE2 regexes, so the dialects
agree).

Operators (all flat-buffer vectorized, zero per-row Python):

* :func:`synth_html`        — (doc_id, html)
* :func:`strip_html_tags`   — naive full-page text (tags -> ' ')
* :func:`html_link_density` — per-page anchor statistics
* :func:`html_main_content` — block-level boilerplate removal: split
  on structural tags, score each block by stripped-text length and
  anchor-character density, keep content blocks, rejoin
* :func:`html_to_spans`     — the extraction front end: one interleaved
  (doc_id, offset, kind, text, media_ref) span row per kept content
  block / media tag, i.e. exactly the flagship input shape

The scale shape is trivially right: every operator is a stateless
``map_batches`` over the page column — no shuffle, no state, no
driver traffic; block/anchor work rides two levels of Arrow list
offsets (pieces per page, anchors per piece) with reduceat sums.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

# paragraphs split on this token (SQL: replace(text, ...)); chosen from
# the synthetic vocabulary so pages get several paragraphs
_PARA_TOKEN = " window "
_PARA_SEP = "</p><p>"

# structural tags that delimit blocks for the boilerplate heuristic
_BLOCK_RE = r"</?(?:html|head|title|body|nav|div|article|footer|p)[^>]*>"
_ANCHOR_RE = r"<a [^>]*>([^<]*)</a>"  # well-formed (synth guarantees)
_TAG_RE = r"<[^>]*>"

# content-block acceptance: enough stripped text, low anchor density
MIN_BLOCK_CHARS = 20
MAX_LINK_DENSITY_NUM = 2  # keep iff anchor_chars * 2 < text_chars


def _chunked(col):
    return col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col


def synth_html_array(batch: pa.Table) -> pa.Array:
    """The deterministic page for each row — string-concat only, the
    exact expression `html_sql_expr` renders for DuckDB."""
    doc_id = pc.cast(_chunked(batch.column("doc_id")), pa.string())
    lang = _chunked(batch.column("lang"))
    source = _chunked(batch.column("source"))
    paras = pc.replace_substring(
        _chunked(batch.column("text")), pattern=_PARA_TOKEN, replacement=_PARA_SEP
    )
    ids_np = np.asarray(
        pc.cast(_chunked(batch.column("doc_id")), pa.int64())
    )
    img = pc.if_else(
        pa.array(ids_np % 3 == 0),
        pc.binary_join_element_wise(
            pa.scalar('<img src="media://'), doc_id, pa.scalar('/1">'), pa.scalar("")
        ),
        pa.scalar(""),
    )
    return pc.binary_join_element_wise(
        pa.scalar("<html><head><title>"),
        source,
        pa.scalar(" "),
        doc_id,
        pa.scalar('</title></head><body><nav><a href="/home">home nav</a> '),
        pa.scalar('<a href="/l/'),
        lang,
        pa.scalar('">'),
        lang,
        pa.scalar(' pages</a> <a href="/top">top lists</a></nav>'),
        pa.scalar('<div><a href="/ad1">click here to win</a> '),
        pa.scalar('<a href="/ad2">buy now best deal</a></div>'),
        pa.scalar("<article><h1>"),
        source,
        pa.scalar(" "),
        doc_id,
        pa.scalar("</h1><p>"),
        paras,
        pa.scalar("</p>"),
        img,
        pa.scalar('</article><footer><a href="/terms">terms</a> '),
        pa.scalar('<a href="/contact">contact</a> (c) '),
        source,
        pa.scalar("</footer></body></html>"),
        pa.scalar(""),  # separator
    )


def html_sql_expr(docs: str = "documents") -> str:
    """The DuckDB expression producing byte-identical pages from the
    ``documents`` view — prepend as a CTE to every HTML oracle."""
    return f"""
    SELECT doc_id,
      '<html><head><title>' || source || ' ' || doc_id::VARCHAR
      || '</title></head><body><nav><a href="/home">home nav</a> '
      || '<a href="/l/' || lang || '">' || lang
      || ' pages</a> <a href="/top">top lists</a></nav>'
      || '<div><a href="/ad1">click here to win</a> '
      || '<a href="/ad2">buy now best deal</a></div>'
      || '<article><h1>' || source || ' ' || doc_id::VARCHAR || '</h1><p>'
      || replace(text, '{_PARA_TOKEN}', '{_PARA_SEP}') || '</p>'
      || CASE WHEN doc_id % 3 = 0
              THEN '<img src="media://' || doc_id::VARCHAR || '/1">'
              ELSE '' END
      || '</article><footer><a href="/terms">terms</a> '
      || '<a href="/contact">contact</a> (c) ' || source
      || '</footer></body></html>' AS html
    FROM {docs}
    """


def synth_html(ds: rd.Dataset) -> rd.Dataset:
    """(doc_id, html) — deterministic page per document."""

    def build(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"doc_id": batch.column("doc_id"), "html": synth_html_array(batch)}
        )

    return ds.map_batches(build, batch_format="pyarrow")


def _strip_squeeze_trim(arr: pa.Array) -> pa.Array:
    """tags -> ' ', runs of spaces -> one, trim — the naive text view."""
    no_tags = pc.replace_substring_regex(arr, pattern=_TAG_RE, replacement=" ")
    squeezed = pc.replace_substring_regex(no_tags, pattern=" +", replacement=" ")
    return pc.utf8_trim(squeezed, characters=" ")


def strip_html_tags(ds: rd.Dataset) -> rd.Dataset:
    """(doc_id, text): the whole page with tags removed — the
    pre-heuristic baseline ('boilerplate kept')."""

    def strip(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "text": _strip_squeeze_trim(synth_html_array(batch)),
            }
        )

    return ds.map_batches(strip, batch_format="pyarrow")


def _anchor_char_sums(pieces: pa.Array) -> np.ndarray:
    """Per piece: total characters of anchor TEXT (the link-density
    numerator). Second-level flat buffer: split each piece on '<a ',
    regex-extract the '...>text</a>' head of every sub-piece, sum
    lengths back per piece with one reduceat."""
    n = len(pieces)
    if n == 0:
        return np.empty(0, np.int64)
    subs = pc.split_pattern(pieces, "<a ")
    subs = subs.combine_chunks() if isinstance(subs, pa.ChunkedArray) else subs
    flat = subs.flatten()
    # '^[^>]*>(text)</a>' only matches sub-pieces that FOLLOW '<a ...',
    # never the head piece (its first '>' is a tag close, not an anchor
    # open); non-matches extract null -> length 0
    ext = pc.extract_regex(flat, r"^[^>]*>(?P<t>[^<]*)</a>")
    txt = pc.fill_null(pc.struct_field(ext, "t"), "")
    lens = np.asarray(pc.utf8_length(txt), dtype=np.int64)
    offs = np.asarray(subs.offsets, dtype=np.int64)
    out = np.zeros(n, np.int64)
    nonempty = offs[:-1] < offs[-1]
    if lens.size:
        sums = np.add.reduceat(lens, np.minimum(offs[:-1], lens.size - 1))
        out[nonempty & (offs[:-1] < offs[1:])] = sums[
            nonempty & (offs[:-1] < offs[1:])
        ]
    return out


def html_links(ds: rd.Dataset, html_col: str | None = None) -> rd.Dataset:
    """(doc_id, link_ord, href, anchor_text) — one row per anchor, in
    page order: the LINK-GRAPH builder (what PageRank/host-graph
    pipelines consume from an extraction pass). Same second-level
    flat-buffer parse as the link-density signal: split on '<a ', one
    anchored regex per sub-piece, ordinals via run-length cumcount —
    no per-row Python. ``html_col`` parses an existing page column
    (e.g. WARC output) instead of re-synthesizing."""

    def links(batch: pa.Table) -> pa.Table:
        if html_col is not None:
            html = _chunked(batch.column(html_col))
        else:
            html = synth_html_array(batch)
        subs = pc.split_pattern(html, "<a ")
        subs = (
            subs.combine_chunks() if isinstance(subs, pa.ChunkedArray) else subs
        )
        flat = subs.flatten()
        ext = pc.extract_regex(
            flat, r'^href="(?P<h>[^"]*)"[^>]*>(?P<t>[^<]*)</a>'
        )
        href = pc.struct_field(ext, "h")
        txt = pc.struct_field(ext, "t")
        valid = pc.is_valid(href).to_numpy(zero_copy_only=False)
        offs = np.asarray(subs.offsets, dtype=np.int64)
        counts = np.diff(offs)
        doc_rep = np.repeat(
            np.asarray(pc.cast(_chunked(batch.column("doc_id")), pa.int64())),
            counts,
        )
        vdoc = doc_rep[valid]
        new_run = np.ones(vdoc.shape[0], dtype=bool)
        new_run[1:] = vdoc[1:] != vdoc[:-1]
        run_starts = np.flatnonzero(new_run)
        run_lens = np.diff(np.append(run_starts, vdoc.shape[0]))
        ords = (
            np.arange(vdoc.shape[0], dtype=np.int64)
            - np.repeat(run_starts, run_lens)
            + 1
        )
        vmask = pa.array(valid)
        return pa.table(
            {
                "doc_id": pa.array(vdoc),
                "link_ord": pa.array(ords),
                "href": href.filter(vmask),
                "anchor_text": txt.filter(vmask),
            }
        )

    return ds.map_batches(links, batch_format="pyarrow")


def html_link_density(ds: rd.Dataset) -> rd.Dataset:
    """(doc_id, n_links, anchor_chars, text_chars, link_density):
    page-level anchor statistics, the classic boilerplate signal."""

    def stats(batch: pa.Table) -> pa.Table:
        html = synth_html_array(batch)
        n_links = pc.cast(pc.count_substring(html, "<a "), pa.int64())
        anchor = _anchor_char_sums(html)
        text_chars = np.asarray(
            pc.utf8_length(_strip_squeeze_trim(html)), dtype=np.int64
        )
        dens = np.round(anchor / np.maximum(text_chars, 1), 6)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_links": n_links,
                "anchor_chars": pa.array(anchor),
                "text_chars": pa.array(text_chars),
                "link_density": pa.array(dens, pa.float64()),
            }
        )

    return ds.map_batches(stats, batch_format="pyarrow")


def _block_pieces(batch: pa.Table, html_col: str | None = None):
    """Split each page into structural blocks. Returns (doc_ids int64
    per piece, flat piece array, per-piece ordinal 1-based, stripped
    text, anchor char sums, keep mask). ``html_col`` names a column
    holding already-materialized pages (e.g. parsed out of a WARC
    record); None re-synthesizes the deterministic page from the
    document columns."""
    if html_col is not None:
        html = _chunked(batch.column(html_col))
    else:
        html = synth_html_array(batch)
    pieces = pc.split_pattern_regex(html, _BLOCK_RE)
    pieces = (
        pieces.combine_chunks() if isinstance(pieces, pa.ChunkedArray) else pieces
    )
    flat = pieces.flatten()
    offs = np.asarray(pieces.offsets, dtype=np.int64)
    counts = np.diff(offs)
    doc_ids = np.repeat(
        np.asarray(pc.cast(_chunked(batch.column("doc_id")), pa.int64())), counts
    )
    ords = np.arange(offs[-1], dtype=np.int64) - np.repeat(offs[:-1], counts) + 1
    txt = _strip_squeeze_trim(flat)
    txt_len = np.asarray(pc.utf8_length(txt), dtype=np.int64)
    anchor = _anchor_char_sums(flat)
    keep = (txt_len >= MIN_BLOCK_CHARS) & (
        MAX_LINK_DENSITY_NUM * anchor < txt_len
    )
    return doc_ids, flat, ords, txt, anchor, keep


def html_main_content(
    ds: rd.Dataset, html_col: str | None = None
) -> rd.Dataset:
    """(doc_id, main_text): boilerplate-stripped page text. Blocks
    (split on structural tags) survive iff their stripped text is long
    enough AND anchor characters are under half of it — nav/ad/footer
    blocks are anchor-dense and die, titles are short and die, article
    paragraphs survive. Survivors rejoin in document order with ' '.
    ``html_col`` extracts from an existing page column (e.g. WARC
    output) instead of re-synthesizing the deterministic page."""

    def extract(batch: pa.Table) -> pa.Table:
        doc_ids, _flat, _ords, txt, _anchor, keep = _block_pieces(
            batch, html_col
        )
        kept_docs = doc_ids[keep]
        kept_txt = txt.filter(pa.array(keep))
        # pieces are emitted in document order; docs are contiguous.
        # ListArray over the kept runs + one binary_join per doc.
        ids = np.asarray(pc.cast(_chunked(batch.column("doc_id")), pa.int64()))
        starts = np.searchsorted(kept_docs, ids, side="left")
        ends = np.searchsorted(kept_docs, ids, side="right")
        # searchsorted needs sorted kept_docs; doc order within a batch
        # is whatever the block scan produced (contiguous runs). Sort
        # run starts via argsort of first occurrence instead:
        if not (np.diff(kept_docs) >= 0).all():
            order = np.argsort(kept_docs, kind="stable")
            kept_docs = kept_docs[order]
            kept_txt = kept_txt.take(pa.array(order))
            starts = np.searchsorted(kept_docs, ids, side="left")
            ends = np.searchsorted(kept_docs, ids, side="right")
        offsets = np.zeros(len(ids) + 1, np.int64)
        # list offsets must be monotone; build per-doc slices explicitly
        lengths = ends - starts
        offsets[1:] = np.cumsum(lengths)
        take_idx = np.repeat(starts, lengths) + (
            np.arange(int(lengths.sum()), dtype=np.int64)
            - np.repeat(offsets[:-1], lengths)
        )
        gathered = kept_txt.take(pa.array(take_idx))
        lists = pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()), gathered
        )
        joined = pc.binary_join(lists, pa.scalar(" "))
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "main_text": pc.fill_null(joined, ""),
            }
        )

    return ds.map_batches(extract, batch_format="pyarrow")


def html_to_spans(ds: rd.Dataset) -> rd.Dataset:
    """The extraction front end: one interleaved span row per surviving
    content block (kind='text') or media tag (kind='media'), offset =
    0-based emission order within the doc — exactly the flagship input
    shape (doc_id, offset, kind, text, media_ref)."""

    def spans(batch: pa.Table) -> pa.Table:
        doc_ids, flat, _ords, txt, _anchor, keep_text = _block_pieces(batch)
        is_media = np.asarray(
            pc.starts_with(flat, '<img src="'), dtype=bool
        )
        emit = is_media | (keep_text & ~is_media)
        doc_e = doc_ids[emit]
        media_e = is_media[emit]
        txt_e = txt.filter(pa.array(emit))
        # media_ref: the src attribute of the img piece
        ref_ext = pc.extract_regex(
            flat.filter(pa.array(emit)), r'^<img src="(?P<r>[^"]*)">'
        )
        refs = pc.fill_null(pc.struct_field(ref_ext, "r"), "")
        # 0-based offset within each doc over EMITTED spans (docs are
        # contiguous runs in emission order)
        n = doc_e.shape[0]
        first = np.ones(n, dtype=bool)
        first[1:] = doc_e[1:] != doc_e[:-1]
        starts = np.nonzero(first)[0]
        offset = np.arange(n, dtype=np.int64) - np.repeat(
            starts, np.diff(np.append(starts, n))
        )
        kind = np.where(media_e, "media", "text")
        return pa.table(
            {
                "doc_id": pa.array(doc_e),
                "offset": pa.array(offset.astype(np.int32), pa.int32()),
                "kind": pa.array(kind, pa.string()),
                "text": pc.if_else(pa.array(media_e), pa.scalar(""), txt_e),
                "media_ref": pc.if_else(
                    pa.array(~media_e), pa.scalar(""), refs
                ),
            }
        )

    return ds.map_batches(spans, batch_format="pyarrow")


def html_boilerplate_stats(ds: rd.Dataset) -> rd.Dataset:
    """Per source: total raw-text chars vs main-content chars and the
    boilerplate fraction — partial sums per batch, one tiny groupby."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        raw_len = np.asarray(
            pc.utf8_length(_strip_squeeze_trim(synth_html_array(batch))),
            dtype=np.int64,
        )
        doc_ids, _flat, _ords, txt, _anchor, keep = _block_pieces(batch)
        kept_len = np.asarray(pc.utf8_length(txt), dtype=np.int64)
        kept_len = np.where(keep, kept_len, 0)
        # main chars per doc = sum of kept block lens + joining spaces
        uniq, inv = np.unique(doc_ids, return_inverse=True)
        sums = np.zeros(uniq.shape[0], np.int64)
        np.add.at(sums, inv, kept_len)
        nblocks = np.zeros(uniq.shape[0], np.int64)
        np.add.at(nblocks, inv, keep.astype(np.int64))
        main = sums + np.maximum(nblocks - 1, 0)  # ' ' joins
        ids = np.asarray(pc.cast(_chunked(batch.column("doc_id")), pa.int64()))
        pos = np.searchsorted(uniq, ids)
        src = _chunked(batch.column("source")).to_pandas()
        import pandas as pd

        df = pd.DataFrame(
            {"source": src, "raw": raw_len, "main": main[pos]}
        )
        g = df.groupby("source", as_index=False).agg(
            raw_chars=("raw", "sum"), main_chars=("main", "sum"),
            n_docs=("raw", "size"),
        )
        return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(
            None
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("source")
        .aggregate(
            Sum("raw_chars", alias_name="raw_chars"),
            Sum("main_chars", alias_name="main_chars"),
            Sum("n_docs", alias_name="n_docs"),
        )
    )

    def finish(b: pa.Table) -> pa.Table:
        raw = np.asarray(b.column("raw_chars"), dtype=np.int64)
        main = np.asarray(b.column("main_chars"), dtype=np.int64)
        frac = np.round(1.0 - main / np.maximum(raw, 1), 6)
        return pa.table(
            {
                "source": b.column("source"),
                "raw_chars": pa.array(raw),
                "main_chars": pa.array(main),
                "n_docs": pc.cast(b.column("n_docs"), pa.int64()),
                "boilerplate_frac": pa.array(frac, pa.float64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def anchor_text_agg(ds: rd.Dataset, html_col: str | None = None) -> rd.Dataset:
    """Anchor-text corpus per link target: for every href, the total
    inbound link count, the number of DISTINCT anchor strings, and the
    dominant anchor (highest count, lexicographic tiebreak) with its
    count — the aggregation web-search / link-graph pipelines run over
    extracted anchors to build per-URL anchor-text documents.

    Scale shape: rides :func:`html_links` (flat-buffer parse), then
    ONE (href, anchor_text)-keyed partial/combiner aggregate — the
    shuffle carries one row per distinct (target, anchor) pair per
    block, never one per link — and a per-href argmax group step whose
    group sizes are bounded by anchor variety, not corpus size."""
    import pandas as pd

    from ray.data.aggregate import Sum

    links = html_links(ds, html_col=html_col)

    def partial(b: pa.Table) -> pa.Table:
        df = (
            pa.table(
                {
                    "href": _chunked(b.column("href")),
                    "anchor_text": _chunked(b.column("anchor_text")),
                }
            )
            .to_pandas()
            .groupby(["href", "anchor_text"], as_index=False)
            .size()
            .rename(columns={"size": "n"})
        )
        return pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(None)

    counts = (
        links.map_batches(partial, batch_format="pyarrow")
        .groupby(["href", "anchor_text"])
        .aggregate(Sum("n", alias_name="n"))
    )

    def per_href(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["n", "anchor_text"], ascending=[False, True])
        return pa.table(
            {
                "href": pa.array([g["href"].iloc[0]], pa.string()),
                "n_links": pa.array([int(g["n"].sum())], pa.int64()),
                "n_unique_anchors": pa.array([len(g)], pa.int64()),
                "top_anchor": pa.array([g["anchor_text"].iloc[0]], pa.string()),
                "top_n": pa.array([int(g["n"].iloc[0])], pa.int64()),
            }
        )

    return counts.groupby("href").map_groups(per_href, batch_format="pandas")
