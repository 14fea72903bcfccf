"""Deterministic training analog for the stand-in recognizer (SURVEY
§2.3 T5, reference src/model/trainer.py:29-168 + src/utils/
lr_scheduler.py) — the optimization loop restated Ray-Data-first and
testable without torch.

What the reference trains is a 269 MB seq2seq model; what the stand-in
"recognizes" is the per-character band LEVEL table (model.py LEVEL0 +
idx0 * LEVEL_STEP). The trainable state here is therefore that table:
a (vocab,) vector of band intensities, initialized uninformative and
regressed onto the observed band levels of the labeled corpus. Every
reference training semantic has a faithful analog:

| reference (file:line)                          | here |
|---|---|
| teacher forcing (model.py:174-186)             | the TRUE char id indexes the table during the update (predictions never feed back) |
| MSE-ish CE loss per step (trainer.py:107-111)  | 0.5*(table[c] - obs)^2, epoch loss from EXACT integer moment aggregates |
| AdamW/SGD step (trainer.py:112-116)            | table[c] += lr * (mean_obs_c - table[c]) (the exact gradient step on the quadratic) |
| OneCycleLR (trainer.py:88-93)                  | onecycle_lr(): linear warmup to max_lr, cosine anneal to max_lr/final_div |
| per-epoch reshuffle (dataloader.py:36)         | seeded random_shuffle(epoch) (update itself is order-independent: exact integer partials) |
| train/val 99/1 split (dataloader.py:19-21)     | salted-hash 99/1 split of media refs |
| per-epoch val CER (trainer.py:131-134)         | corpus_cer over TableRecognizer(learned table) predictions |
| best-checkpoint keep, cer <= best (135-143)    | best.json written when epoch CER <= best so far |
| checkpoint dict save/resume (146-168, 67-93)   | JSON checkpoint {table, epoch, best_cer}; resume continues bit-identically |

Distribution shape (100 TB-safe): each epoch is ONE map_batches pass
emitting per-character exact integer partials (sum of observed levels,
sum of squares, count — vocab-bounded rows, order-independent), one
tiny vocab-sized aggregate, a driver-side table update (the "optimizer
state" is vocab-sized, like the reference's), and one eval pass
(recognize + CER Sum aggregate). No corpus-sized state ever leaves the
cluster.
"""

from __future__ import annotations

import json
import math
import os

import numpy as np
import pyarrow as pa
import ray.data as rd

from vietnamese_ocr_ray.model import (
    BAND_W,
    SAMPLE_ROW,
    DeterministicRecognizer,
    )
from vietnamese_ocr_ray.preprocess import binary_column_view, preprocess_batch
from vietnamese_ocr_ray.vocab import PAD, Vocabulary


def onecycle_lr(
    step: int,
    total_steps: int,
    max_lr: float = 0.9,
    pct_start: float = 0.3,
    div_factor: float = 25.0,
    final_div_factor: float = 1e4,
) -> float:
    """OneCycleLR shape (reference src/model/trainer.py:88-93 /
    torch.optim.lr_scheduler.OneCycleLR semantics): linear warmup from
    max_lr/div_factor to max_lr over the first pct_start of steps,
    then cosine anneal down to max_lr/final_div_factor."""
    if total_steps <= 1:
        return max_lr
    warm = max(1, int(round(total_steps * pct_start)))
    lo0 = max_lr / div_factor
    lo1 = max_lr / final_div_factor
    if step < warm:
        return lo0 + (max_lr - lo0) * step / warm
    t = (step - warm) / max(total_steps - 1 - warm, 1)
    return lo1 + (max_lr - lo1) * 0.5 * (1.0 + math.cos(math.pi * min(t, 1.0)))


class TableRecognizer(DeterministicRecognizer):
    """Stand-in recognizer whose band-level table is LEARNED: each
    detected band maps to the NEAREST entry of ``levels`` (never a
    DecodeError — an untrained table yields wrong-but-valid text, which
    is what the CER metric needs to measure progress)."""

    def __init__(self, levels: np.ndarray, vocab: Vocabulary | None = None):
        super().__init__(vocab)
        self.levels = np.asarray(levels, dtype=np.float64)

    def read_features(self, batch, lo, nbands):
        row = (
            batch[:, SAMPLE_ROW, :]
            if batch.ndim == 3
            else batch[:, 0, SAMPLE_ROW, :]
        )
        x = row.astype(np.float64) * 255.0
        n, w = x.shape
        lo = lo.astype(np.int64)
        lengths = (nbands.astype(np.int64) - 1).astype(np.int32)
        max_chars = int(lengths.max(initial=0))
        if max_chars == 0:
            return np.full((n, 1), PAD, np.int32), lengths
        cols = lo[:, None] + BAND_W * np.arange(max_chars)[None, :] + BAND_W // 2
        vals = x[np.arange(n)[:, None], np.minimum(cols, w - 1)]
        idx0 = np.abs(vals[:, :, None] - self.levels[None, None, :]).argmin(
            axis=2
        )
        active = np.arange(max_chars)[None, :] < lengths[:, None]
        features = np.where(active, idx0 + 3, PAD).astype(np.int32)
        return features, lengths


def _observed_levels(batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    """(char_idx0, observed_level int64) pairs for every labeled band
    of a (media_ref, image, height, width, truth) batch — the
    teacher-forced 'forward pass' reading what the model would see."""
    vocab = Vocabulary()
    flat, offs = binary_column_view(batch.column("image"))
    hs = np.asarray(batch.column("height"), dtype=np.int64)
    ws = np.asarray(batch.column("width"), dtype=np.int64)
    refs = batch.column("media_ref").to_pylist()
    truths = batch.column("truth").to_pylist()
    prep = preprocess_batch((flat, offs), hs, ws, refs)  # (N, 64, 256)
    x = prep[:, SAMPLE_ROW, :].astype(np.float64) * 255.0
    mask = x >= 20.0
    lo = mask.argmax(axis=1)
    chars, obs = [], []
    for i, t in enumerate(truths):
        if not t:
            continue
        cols = lo[i] + BAND_W * np.arange(len(t)) + BAND_W // 2
        v = np.rint(x[i, np.minimum(cols, x.shape[1] - 1)]).astype(np.int64)
        c = np.array([vocab.letter_to_idx[ch] - 3 for ch in t], dtype=np.int64)
        chars.append(c)
        obs.append(v)
    if not chars:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    return np.concatenate(chars), np.concatenate(obs)


def _epoch_partials(batch: pa.Table) -> pa.Table:
    """Per-char EXACT integer moment partials (s, ss, n) — the whole
    epoch 'gradient' reduces to vocab-bounded rows, so the update is
    order-independent and bit-deterministic under any partitioning."""
    c, v = _observed_levels(batch)
    if c.size == 0:
        return pa.table(
            {
                "char": pa.array([], pa.int64()),
                "s": pa.array([], pa.int64()),
                "ss": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
            }
        )
    uniq, inv = np.unique(c, return_inverse=True)
    s = np.zeros(uniq.shape[0], np.int64)
    ss = np.zeros(uniq.shape[0], np.int64)
    np.add.at(s, inv, v)
    np.add.at(ss, inv, v * v)
    n = np.bincount(inv, minlength=uniq.shape[0]).astype(np.int64)
    return pa.table(
        {
            "char": pa.array(uniq),
            "s": pa.array(s),
            "ss": pa.array(ss),
            "n": pa.array(n),
        }
    )


def _split_val(ds: rd.Dataset, val_permille: int = 10) -> tuple[rd.Dataset, rd.Dataset]:
    """Deterministic salted 99/1 train/val split by media_ref
    (reference dataloader.py:19-21's shuffled 99/1 slice)."""
    from vietnamese_ocr_ray.functions.joins import key_bucket

    def part(batch: pa.Table, want_val: bool) -> pa.Table:
        b = key_bucket(batch.column("media_ref"), 1000)
        keep = (b < val_permille) == want_val
        return batch.filter(pa.array(keep))

    train = ds.map_batches(
        lambda b: part(b, False), batch_format="pyarrow"
    )
    val = ds.map_batches(lambda b: part(b, True), batch_format="pyarrow")
    return train, val


def _val_cer(val: rd.Dataset, levels: np.ndarray) -> float:
    """Corpus CER of TableRecognizer(levels) over the val split."""
    import ray

    from vietnamese_ocr_ray.functions.text import corpus_cer

    handle = ray.put(np.asarray(levels, np.float64))

    def predict(batch: pa.Table) -> pa.Table:
        model = TableRecognizer(ray.get(handle))
        flat, offs = binary_column_view(batch.column("image"))
        hs = np.asarray(batch.column("height"), dtype=np.int64)
        ws = np.asarray(batch.column("width"), dtype=np.int64)
        refs = batch.column("media_ref").to_pylist()
        prep = preprocess_batch((flat, offs), hs, ws, refs)
        texts = model.recognize_texts(prep)
        return pa.table(
            {"pred": texts, "target": batch.column("truth")}
        )

    preds = val.map_batches(predict, batch_format="pyarrow")
    t = corpus_cer(preds, "pred", "target")
    return float(t.column("cer")[0].as_py())


def train_standin(
    media: rd.Dataset,
    epochs: int = 5,
    max_lr: float = 0.9,
    init_level: float = 128.0,
    checkpoint_dir: str | None = None,
    resume: bool = False,
    seed: int = 42,
    stop_after_epoch: int | None = None,
) -> pa.Table:
    """Run the deterministic training loop; returns the per-epoch
    metrics table (epoch, lr, loss, cer_val, is_best) — the analog of
    the reference's per-epoch print + best-checkpoint keep.

    ``checkpoint_dir`` + ``resume=True`` continues from the saved
    state bit-identically (trainer.py:67-93 resume semantics); the lr
    schedule is always computed against the FULL ``epochs`` horizon, so
    an interrupted run (``stop_after_epoch``) resumes on the same
    schedule the uninterrupted run would have followed.
    """
    vocab = Vocabulary()
    nlevels = vocab.vocab_size - 3
    table = np.full(nlevels, float(init_level), np.float64)
    best = float("inf")
    start_epoch = 0
    if checkpoint_dir and resume:
        p = os.path.join(checkpoint_dir, "last.json")
        if os.path.exists(p):
            with open(p) as f:
                st = json.load(f)
            table = np.asarray(st["table"], np.float64)
            best = float(st["best_cer"])
            start_epoch = int(st["epoch"]) + 1

    train, val = _split_val(media.select_columns(
        ["media_ref", "image", "height", "width", "truth"]
    ))
    end_epoch = epochs if stop_after_epoch is None else min(
        epochs, stop_after_epoch + 1
    )
    rows = []
    for epoch in range(start_epoch, end_epoch):
        lr = onecycle_lr(epoch, epochs, max_lr)
        # per-epoch reshuffle (O3): semantically a no-op for the exact
        # integer partials, kept to mirror the reference's data order
        shuffled = train.random_shuffle(seed=seed + epoch)
        agg = (
            shuffled.map_batches(_epoch_partials, batch_format="pyarrow")
            .groupby("char")
            .sum(["s", "ss", "n"])
            .to_pandas()
        )
        chars = agg["char"].to_numpy(np.int64)
        s = agg["sum(s)"].to_numpy(np.int64)
        ss = agg["sum(ss)"].to_numpy(np.int64)
        n = agg["sum(n)"].to_numpy(np.int64)
        # exact epoch loss at the PRE-update table, from integer moments:
        # sum 0.5*(table[c] - obs)^2 = 0.5*(n*t^2 - 2*t*s + ss)
        t_c = table[chars]
        total_n = int(n.sum())
        loss = float(
            0.5 * (n * t_c * t_c - 2.0 * t_c * s + ss).sum() / max(total_n, 1)
        )
        # teacher-forced gradient step toward the per-char mean level
        table[chars] += lr * (s / np.maximum(n, 1) - t_c)
        cer = _val_cer(val, table)
        is_best = cer <= best  # reference keeps on <=, trainer.py:135-137
        if is_best:
            best = cer
        rows.append((epoch, round(lr, 9), round(loss, 6), cer, is_best))
        if checkpoint_dir:
            os.makedirs(checkpoint_dir, exist_ok=True)
            state = {
                "table": table.tolist(),
                "epoch": epoch,
                "best_cer": best,
                "model_version": "table-standin-v1",
            }
            with open(os.path.join(checkpoint_dir, "last.json"), "w") as f:
                json.dump(state, f)
            if is_best:
                with open(os.path.join(checkpoint_dir, "best.json"), "w") as f:
                    json.dump(state, f)
    return pa.table(
        {
            "epoch": pa.array([r[0] for r in rows], pa.int64()),
            "lr": pa.array([r[1] for r in rows], pa.float64()),
            "loss": pa.array([r[2] for r in rows], pa.float64()),
            "cer_val": pa.array([r[3] for r in rows], pa.float64()),
            "is_best": pa.array([r[4] for r in rows], pa.bool_()),
        }
    )
