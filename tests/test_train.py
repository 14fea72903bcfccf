"""Deterministic training analog (SURVEY §2.3 T5): OneCycle schedule
shape, teacher-forced convergence to the true band-level table,
best-checkpoint keep, and bit-identical resume."""

import json

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from vietnamese_ocr_ray.model import LEVEL0, LEVEL_STEP
from vietnamese_ocr_ray.synth import synth_corpus
from vietnamese_ocr_ray.train import TableRecognizer, onecycle_lr, train_standin
from vietnamese_ocr_ray.vocab import Vocabulary


def _media(n=200, seed=7):
    _, media = synth_corpus(
        n, seed=seed, media_fraction=0.9, empty_text_fraction=0.0
    )
    return rd.from_arrow(media)


def test_onecycle_shape():
    total, max_lr = 10, 0.9
    lrs = [onecycle_lr(s, total, max_lr) for s in range(total)]
    warm = round(total * 0.3)
    assert lrs[0] == pytest.approx(max_lr / 25)  # warmup floor
    assert lrs[warm] == pytest.approx(max_lr)  # peak at warmup end
    assert lrs[-1] == pytest.approx(max_lr / 1e4)  # cosine floor
    assert all(a <= b + 1e-12 for a, b in zip(lrs[:warm], lrs[1 : warm + 1]))
    assert all(a >= b - 1e-12 for a, b in zip(lrs[warm:-1], lrs[warm + 1 :]))


def test_training_converges_to_true_band_table(ray_session, tmp_path):
    """The lr=1.0 peak step is the exact minimizer of the quadratic, so
    CER must hit 0 at the peak epoch and the learned table must equal
    the renderer's true levels; loss is non-increasing and the best
    checkpoint records the minimum CER."""
    ck = str(tmp_path / "ck")
    out = train_standin(
        _media(), epochs=5, max_lr=1.0, checkpoint_dir=ck
    ).to_pandas()
    assert out["epoch"].tolist() == [0, 1, 2, 3, 4]
    assert (out["loss"].diff().dropna() <= 1e-9).all()  # non-increasing
    assert out["cer_val"].iloc[-1] == 0.0
    assert out["loss"].iloc[-1] == 0.0
    assert out["is_best"].iloc[-1]  # <= keep semantics
    best = json.load(open(f"{ck}/best.json"))
    assert best["best_cer"] == out["cer_val"].min()
    nlevels = Vocabulary().vocab_size - 3
    true_levels = LEVEL0 + LEVEL_STEP * np.arange(nlevels, dtype=np.float64)
    learned = np.asarray(json.load(open(f"{ck}/last.json"))["table"])
    # chars present in the corpus converge exactly; absent ones stay put
    seen = np.abs(learned - 128.0) > 1e-9
    assert seen.any()
    assert np.allclose(learned[seen], true_levels[seen])


def test_resume_is_bit_identical(ray_session, tmp_path):
    """Interrupt after 2 epochs, resume for the remaining 3: metrics
    rows and the final table must equal the uninterrupted 5-epoch run
    (reference resume semantics, trainer.py:67-93)."""
    ck_a = str(tmp_path / "a")
    ck_b = str(tmp_path / "b")
    full = train_standin(
        _media(), epochs=5, max_lr=1.0, checkpoint_dir=ck_a
    ).to_pandas()
    # interrupt the same 5-epoch run after epoch 1 (the schedule horizon
    # stays 5 — resuming with a shrunken horizon would change the lr path)
    train_standin(
        _media(), epochs=5, max_lr=1.0, checkpoint_dir=ck_b,
        stop_after_epoch=1,
    )
    tail = train_standin(
        _media(), epochs=5, max_lr=1.0, checkpoint_dir=ck_b, resume=True
    ).to_pandas()
    assert tail["epoch"].tolist() == [2, 3, 4]
    assert tail.reset_index(drop=True).equals(
        full[full["epoch"] >= 2].reset_index(drop=True)
    )
    ta = json.load(open(f"{ck_a}/last.json"))["table"]
    tb = json.load(open(f"{ck_b}/last.json"))["table"]
    assert ta == tb  # bit-identical


def test_table_recognizer_nearest_level_is_robust():
    """A slightly-off learned table must still classify every band to
    the right char (nearest-level decision boundary is LEVEL_STEP/2)."""
    from vietnamese_ocr_ray.preprocess import preprocess_one
    from vietnamese_ocr_ray.synth import render_text

    nlevels = Vocabulary().vocab_size - 3
    true_levels = LEVEL0 + LEVEL_STEP * np.arange(nlevels, dtype=np.float64)
    rng = np.random.default_rng(3)
    off = true_levels + rng.uniform(-1.2, 1.2, nlevels)  # < STEP/2 away
    m = TableRecognizer(off)
    x = np.stack(
        [preprocess_one(render_text(t, 32), f"m-{i}") for i, t in
         enumerate(["hello", "a", "0z9"])]
    )
    assert m.recognize_texts(x).to_pylist() == ["hello", "a", "0z9"]
