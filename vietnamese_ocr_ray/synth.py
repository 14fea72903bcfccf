"""Deterministic synthetic corpus generation.

Two generators share one renderer:

* ``synth_from_documents`` — derives an interleaved docs table + media
  table from the driver's ``documents.parquet`` with arithmetic simple
  enough that a DuckDB SQL oracle can state the EXPECTED extraction
  output exactly (word k of the cleaned text becomes span k; every 3rd
  span is a media span whose rendered image the recognizer inverts back
  to the word). Runs as a Ray Data pipeline (distributed rendering).

* ``synth_corpus`` — in-memory pytest/bench generator with edge-case
  knobs: empty docs, empty-text media spans (exercises the ""->"a"
  fill, reference src/utils/inference.py:107-110), out-of-order span
  storage (reassembly must sort by offset), many-media skewed docs
  (SURVEY.md §4 skew case).

The renderer is the inverse of model.DeterministicRecognizer: each char
is a constant-intensity vertical band (one terminator band appended);
pre-resize geometry is chosen so the reference resize
(min(256, int(64/h*w)), src/utils/transform.py:65) lands bands exactly
on 8-px boundaries for heights {16, 32, 64}.
"""

from __future__ import annotations

import hashlib
import os
import re

import numpy as np
import pyarrow as pa

from vietnamese_ocr_ray.model import BAND_W, LEVEL0, LEVEL_STEP
# top-level import: _docs_batch runs inside Ray workers, and an
# in-function import breaks by-value pickling from a foreign cwd
from vietnamese_ocr_ray.schema import DOCS_SCHEMA
from vietnamese_ocr_ray.vocab import ALPHABET, MAX_TEXT_LEN, Vocabulary

_VOCAB = Vocabulary()
# 64/h integral -> exact band alignment after resize; h>=32 keeps band
# width >=4 px so band-center pixels are never adjacent to an intensity
# edge (the sharpness filter only perturbs edge-adjacent pixels).
_HEIGHTS = (32, 64)

# SQL-mirrored text cleaning (see oracle_sql in __ray_entry__.py):
#   regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g') then split ' +'
_CLEAN_RE = re.compile(r"[^a-z0-9 ]")
_SPLIT_RE = re.compile(r" +")
MEDIA_EVERY = 3  # 1-based word index % 3 == 1 -> media span


def clean_words(text: str) -> list[str]:
    cleaned = _CLEAN_RE.sub(" ", text.lower())
    return [w[:MAX_TEXT_LEN] for w in _SPLIT_RE.split(cleaned) if w != ""]


def _ref_u64(s: str) -> int:
    return int.from_bytes(hashlib.blake2b(s.encode(), digest_size=8).digest(), "big")


def pick_height(media_ref: str) -> int:
    """Deterministic per-ref height, SQL-MIRRORED: refs are always
    "m-<doc>-<offset>", and the height derives from the two integers so
    a DuckDB oracle can restate it exactly
    (``CASE WHEN (doc_id*7 + off) % 2 = 0 THEN 32 ELSE 64 END`` — see
    the media oracles in __ray_entry__.py). Non-conforming refs fall
    back to a content hash (test corpora with free-form refs)."""
    parts = media_ref.split("-")
    if len(parts) == 3 and parts[1].isdigit() and parts[2].isdigit():
        return _HEIGHTS[(int(parts[1]) * 7 + int(parts[2])) % len(_HEIGHTS)]
    return _HEIGHTS[_ref_u64(media_ref) % len(_HEIGHTS)]


def render_text(text: str, height: int) -> np.ndarray:
    """text -> grayscale uint8 (height, width) band image.

    White background; char bands at gray 255-(LEVEL0+idx0*LEVEL_STEP);
    black terminator band. Margins keep a 255 row at the border and the
    terminator keeps a 0 at the border so the reference's autocontrast
    is an exact identity (preprocess.enhance).
    """
    if len(text) > MAX_TEXT_LEN:
        raise ValueError(f"text longer than {MAX_TEXT_LEN}: {text!r}")
    bad = sorted({c for c in text if c not in _VOCAB.letter_to_idx})
    if bad:
        raise ValueError(
            f"unsupported characters {bad!r}: the synthetic band "
            f"renderer covers single TOKENS over the corpus charset "
            f"(media spans are one word each — split multi-word input "
            f"with synth.clean_words first)"
        )
    bw = height * BAND_W // 64  # pre-resize band width: 2 / 4 / 8 px
    nbands = len(text) + 1
    img = np.full((height, nbands * bw), 255, dtype=np.uint8)
    margin = height // 8
    lo, hi = margin, height - margin
    for i, ch in enumerate(text):
        idx0 = _VOCAB.letter_to_idx[ch] - 3
        gray = 255 - (LEVEL0 + idx0 * LEVEL_STEP)
        img[lo:hi, i * bw : (i + 1) * bw] = gray
    img[lo:hi, len(text) * bw : nbands * bw] = 0  # terminator
    return img


# ---------------------------------------------------------------------------
# SQL-mirrored generator over the driver's documents table
# ---------------------------------------------------------------------------


def _docs_batch(batch: pa.Table) -> pa.Table:
    """documents rows -> interleaved docs rows (doc_id, spans)."""
    doc_ids = batch.column("doc_id").to_pylist()
    texts = batch.column("text").to_pylist()
    out_ids, out_spans = [], []
    for did, text in zip(doc_ids, texts):
        ds = f"doc-{did}"
        spans = []
        for k, w in enumerate(clean_words(text)):
            if k % MEDIA_EVERY == 0:
                spans.append(
                    {"kind": "media", "text": "", "media_ref": f"m-{did}-{k}", "offset": k}
                )
            else:
                spans.append(
                    {"kind": "text", "text": w, "media_ref": "", "offset": k}
                )
        out_ids.append(ds)
        out_spans.append(spans)
    return pa.table(
        {
            "doc_id": pa.array(out_ids, pa.string()),
            "spans": pa.array(out_spans, DOCS_SCHEMA.field("spans").type),
        }
    )


def _media_batch(batch: pa.Table) -> pa.Table:
    """documents rows -> media rows (one per media span, rendered)."""
    doc_ids = batch.column("doc_id").to_pylist()
    texts = batch.column("text").to_pylist()
    refs, imgs, hs, ws, truths = [], [], [], [], []
    for did, text in zip(doc_ids, texts):
        for k, w in enumerate(clean_words(text)):
            if k % MEDIA_EVERY != 0:
                continue
            ref = f"m-{did}-{k}"
            h = pick_height(ref)
            img = render_text(w, h)
            refs.append(ref)
            imgs.append(img.tobytes())
            hs.append(h)
            ws.append(img.shape[1])
            truths.append(w)
    return pa.table(
        {
            "media_ref": pa.array(refs, pa.string()),
            "image": pa.array(imgs, pa.binary()),
            "height": pa.array(hs, pa.int32()),
            "width": pa.array(ws, pa.int32()),
            "truth": pa.array(truths, pa.string()),
        }
    )


def synth_from_documents(documents_path: str, out_dir: str) -> tuple[str, str]:
    """Distributed generation: documents.parquet -> out_dir/{docs,media}
    Parquet directories. Requires an active Ray session (caller-owned).

    Returns (docs_dir, media_dir).
    """
    import ray.data as rd

    docs_dir = os.path.join(out_dir, "docs")
    media_dir = os.path.join(out_dir, "media")
    src = rd.read_parquet(documents_path, columns=["doc_id", "text"])
    src.map_batches(_docs_batch, batch_format="pyarrow").write_parquet(docs_dir)
    src = rd.read_parquet(documents_path, columns=["doc_id", "text"])
    src.map_batches(_media_batch, batch_format="pyarrow").write_parquet(media_dir)
    return docs_dir, media_dir


# v3: bumped when the corpus derivation changes (r3: SQL-mirrored
# pick_height) so a stale cached corpus can never leak across rounds
_CACHE_ROOT = "/tmp/vnocr_cache_v3"


def ensure_corpus(sf_dir: str, cache_root: str = _CACHE_ROOT) -> tuple[str, str]:
    """Idempotent cached synth_from_documents for a testdata sf dir."""
    tag = os.path.basename(os.path.normpath(sf_dir))
    out = os.path.join(cache_root, tag)
    marker = os.path.join(out, "_SUCCESS")
    docs_dir = os.path.join(out, "docs")
    media_dir = os.path.join(out, "media")
    if os.path.exists(marker):
        return docs_dir, media_dir
    os.makedirs(out, exist_ok=True)
    synth_from_documents(os.path.join(sf_dir, "documents.parquet"), out)
    with open(marker, "w") as f:
        f.write("ok")
    return docs_dir, media_dir


# ---------------------------------------------------------------------------
# Edge-case/knobbed generator (pytest + bench)
# ---------------------------------------------------------------------------


def synth_corpus(
    n_docs: int,
    seed: int = 42,
    *,
    max_spans: int = 12,
    media_fraction: float = 0.4,
    skew_fraction: float = 0.01,
    skew_spans: int = 200,
    empty_doc_fraction: float = 0.02,
    empty_text_fraction: float = 0.02,
    shuffle_storage_order: bool = True,
) -> tuple[pa.Table, pa.Table]:
    """Seeded in-memory (docs, media) tables with edge cases.

    Offsets remain the semantic 0..n-1 positions but span STORAGE order
    inside the list is shuffled when ``shuffle_storage_order`` — the
    reassembly sort by offset is part of the correctness invariant
    (SURVEY.md §2.6 O7).
    """
    rng = np.random.default_rng(seed)
    letters = np.array(list(ALPHABET))
    doc_ids, doc_spans = [], []
    m_refs, m_imgs, m_h, m_w, m_truth = [], [], [], [], []

    for d in range(n_docs):
        did = f"doc-{d:08d}"
        r = rng.random()
        if r < empty_doc_fraction:
            doc_ids.append(did)
            doc_spans.append([])
            continue
        if rng.random() < skew_fraction:
            n_spans = skew_spans
            media_p = 0.9  # many-media skewed doc
        else:
            n_spans = int(rng.integers(1, max_spans + 1))
            media_p = media_fraction
        spans = []
        for k in range(n_spans):
            if rng.random() < empty_text_fraction:
                text = ""
            else:
                ln = int(rng.integers(1, MAX_TEXT_LEN + 1))
                text = "".join(rng.choice(letters, size=ln))
            if rng.random() < media_p:
                ref = f"m-{d:08d}-{k}"
                h = pick_height(ref)
                img = render_text(text, h)
                m_refs.append(ref)
                m_imgs.append(img.tobytes())
                m_h.append(h)
                m_w.append(img.shape[1])
                m_truth.append(text)
                spans.append(
                    {"kind": "media", "text": "", "media_ref": ref, "offset": k}
                )
            else:
                spans.append(
                    {"kind": "text", "text": text, "media_ref": "", "offset": k}
                )
        if shuffle_storage_order and len(spans) > 1:
            order = rng.permutation(len(spans))
            spans = [spans[i] for i in order]
        doc_ids.append(did)
        doc_spans.append(spans)

    docs = pa.table(
        {
            "doc_id": pa.array(doc_ids, pa.string()),
            "spans": pa.array(doc_spans, DOCS_SCHEMA.field("spans").type),
        }
    )
    media = pa.table(
        {
            "media_ref": pa.array(m_refs, pa.string()),
            "image": pa.array(m_imgs, pa.binary()),
            "height": pa.array(m_h, pa.int32()),
            "width": pa.array(m_w, pa.int32()),
            "truth": pa.array(m_truth, pa.string()),
        }
    )
    return docs, media


def concat_augment(
    media: pa.Table, n_pairs: int, seed: int = 42
) -> pa.Table:
    """ConcatAug analog (SURVEY.md §2.2 M7, reference
    src/utils/concat_aug.py:25-43): sample two rendered images,
    height-match, horizontally concatenate, label = concatenated labels.

    Band-world specifics: the first image's terminator band is stripped
    before concatenation so the result is again a well-formed band image
    (recognizer-invertible); pairs are drawn from SAME-height images and
    skipped when the combined label would exceed the decode cap
    (reference images are free-form pixels; ours must stay decodable).
    """
    rng = np.random.default_rng(seed)
    refs = media.column("media_ref").to_pylist()
    imgs = media.column("image").to_pylist()
    hs = media.column("height").to_pylist()
    ws = media.column("width").to_pylist()
    truths = media.column("truth").to_pylist()
    o_refs, o_imgs, o_h, o_w, o_truth = [], [], [], [], []
    made = tries = 0
    while made < n_pairs and tries < n_pairs * 20:
        tries += 1
        i, j = rng.integers(0, len(refs), 2)
        if hs[i] != hs[j]:
            continue
        label = truths[i] + truths[j]
        if len(label) > MAX_TEXT_LEN:
            continue
        h = hs[i]
        bw = h * BAND_W // 64
        a = np.frombuffer(imgs[i], np.uint8).reshape(h, ws[i])
        b = np.frombuffer(imgs[j], np.uint8).reshape(h, ws[j])
        cat = np.concatenate([a[:, : ws[i] - bw], b], axis=1)
        ref = f"cat-{made:08d}"
        o_refs.append(ref)
        o_imgs.append(cat.tobytes())
        o_h.append(h)
        o_w.append(cat.shape[1])
        o_truth.append(label)
        made += 1
    return pa.table(
        {
            "media_ref": pa.array(o_refs, pa.string()),
            "image": pa.array(o_imgs, pa.binary()),
            "height": pa.array(o_h, pa.int32()),
            "width": pa.array(o_w, pa.int32()),
            "truth": pa.array(o_truth, pa.string()),
        }
    )


def write_corpus(
    docs: pa.Table, media: pa.Table, out_dir: str, n_fragments: int = 4
) -> tuple[str, str]:
    """Write (docs, media) as fragmented Parquet dirs (fragment = file,
    the unit of resume in state/manifest.py)."""
    import pyarrow.parquet as pq

    docs_dir = os.path.join(out_dir, "docs")
    media_dir = os.path.join(out_dir, "media")
    os.makedirs(docs_dir, exist_ok=True)
    os.makedirs(media_dir, exist_ok=True)
    n = docs.num_rows
    step = max(1, -(-n // n_fragments))
    for i in range(0, n, step):
        pq.write_table(
            docs.slice(i, step), os.path.join(docs_dir, f"frag-{i // step:05d}.parquet")
        )
    pq.write_table(media, os.path.join(media_dir, "media-00000.parquet"))
    return docs_dir, media_dir
