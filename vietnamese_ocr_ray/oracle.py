"""Single-process oracle: a faithful restatement of the reference
predict path (predict.py -> src/utils/inference.py:44-121 ->
src/model/model.py:202-233) over the shared deterministic stand-in
model. This is the golden-output producer the Ray pipeline is tested
against — it deliberately keeps the reference's control flow (chunked
batch loop, dict merge, dict-shrinking autoregressive decode, special
strip, empty->"a" fill) instead of anything vectorized.

Mapping from the reference's world to the interleaved-docs world:
  directory of image files  -> media spans of all docs (listdir order
                               becomes storage order of spans)
  label/prediction per file -> recognized text per media span
  result dict union         -> per-doc reassembly ordered by offset
"""

from __future__ import annotations

import unicodedata

import numpy as np
import pyarrow as pa

from vietnamese_ocr_ray.model import DeterministicRecognizer
from vietnamese_ocr_ray.preprocess import preprocess_one
from vietnamese_ocr_ray.vocab import EOS, MAX_DECODE_STEPS, SOS


def _autoregressive_forward(model, dict_img, dict_target):
    """Dict-based greedy decode mirroring src/model/model.py:202-233:
    encoder once per image, then <=32 steps; sequences whose last id is
    <eos> are popped from the working dicts each step; at the cap,
    leftovers are flushed."""
    dict_out = {}
    keys = list(dict_img.keys())
    stacked = np.stack([dict_img[k] for k in keys])
    features, lengths = model.encode(stacked)
    dict_enc = {k: (features[i], int(lengths[i])) for i, k in enumerate(keys)}
    target = dict(dict_target)
    c = 0
    while c < MAX_DECODE_STEPS:
        for k in list(target.keys()):
            if target[k][-1] == EOS:
                dict_out[k] = target.pop(k)
                dict_enc.pop(k)
        if not dict_enc:
            break
        for k in list(target.keys()):
            feats, ln = dict_enc[k]
            logits = model.step_logits(feats, ln, len(target[k]) - 1)
            target[k] = target[k] + [int(np.argmax(logits))]
        c += 1
        if c == MAX_DECODE_STEPS:
            for k in list(target.keys()):
                dict_out[k] = target.pop(k)
                dict_enc.pop(k)
    return dict_out


def predict_media(
    media_items: list[tuple[str, bytes, int, int]],
    model: DeterministicRecognizer | None = None,
    batch_size: int = 32,
) -> dict[str, str]:
    """The reference _predict_batch loop (src/utils/inference.py:67-103):
    chunk into batch_size (default 32, src/utils/inference.py:44),
    preprocess each image individually, decode, merge dicts, then strip
    specials. Returns {media_ref: text} (pre empty-fill)."""
    model = model or DeterministicRecognizer()
    dict_target: dict[str, list[int]] = {}
    if batch_size == -1:
        chunks = [media_items]
    else:
        chunks = [
            media_items[i : i + batch_size]
            for i in range(0, len(media_items), batch_size)
        ]
    for chunk in chunks:
        if not chunk:
            continue
        dict_img = {}
        dict_tgt = {}
        for ref, img_bytes, h, w in chunk:
            img = np.frombuffer(img_bytes, dtype=np.uint8).reshape(h, w)
            dict_img[ref] = preprocess_one(img, ref)
            dict_tgt[ref] = [SOS]
        out = _autoregressive_forward(model, dict_img, dict_tgt)
        dict_target = dict_target | out  # src/utils/inference.py:90
    # decode: strip specials, join (src/utils/inference.py:97-103)
    return {k: model.vocab.decode(v) for k, v in dict_target.items()}


def extract_oracle(
    docs: pa.Table,
    media: pa.Table,
    model: DeterministicRecognizer | None = None,
    batch_size: int = 32,
) -> list[dict]:
    """Full extraction oracle: docs + media tables -> list of
    {doc_id, spans:[{kind,text,media_ref,offset}...]} sorted by doc_id,
    spans ordered by offset. Media spans carry recognized text with the
    empty->"a" fill (src/utils/inference.py:105-121); text spans are
    NFC-normalized pass-through. Docs with zero spans are dropped
    (extraction output contains only docs with >=1 span)."""
    model = model or DeterministicRecognizer()
    media_lut = {
        r["media_ref"]: (r["image"], r["height"], r["width"])
        for r in media.to_pylist()
    }
    # enumerate media spans in storage order (the listdir analog)
    items = []
    doc_rows = docs.to_pylist()
    for row in doc_rows:
        for span in row["spans"]:
            if span["kind"] == "media":
                ref = span["media_ref"]
                img, h, w = media_lut[ref]
                items.append((ref, img, h, w))
    preds = predict_media(items, model, batch_size)
    out = []
    for row in sorted(doc_rows, key=lambda r: r["doc_id"]):
        spans = []
        for span in sorted(row["spans"], key=lambda s: s["offset"]):
            if span["kind"] == "media":
                text = preds[span["media_ref"]]
                if len(text) == 0:
                    text = "a"  # src/utils/inference.py:107-110
                spans.append(
                    {
                        "kind": "media",
                        "text": text,
                        "media_ref": span["media_ref"],
                        "offset": span["offset"],
                    }
                )
            else:
                spans.append(
                    {
                        "kind": "text",
                        "text": unicodedata.normalize("NFC", span["text"]),
                        "media_ref": "",
                        "offset": span["offset"],
                    }
                )
        if spans:
            out.append({"doc_id": row["doc_id"], "spans": spans})
    return out
