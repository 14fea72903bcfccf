"""Unit tests for the deterministic recognizer — greedy decode
semantics mirror reference src/model/model.py:202-233."""

import numpy as np
import pytest

from vietnamese_ocr_ray.model import DecodeError, DeterministicRecognizer
from vietnamese_ocr_ray.preprocess import preprocess_one
from vietnamese_ocr_ray.synth import render_text
from vietnamese_ocr_ray.vocab import EOS, MAX_TEXT_LEN, PAD, SOS, Vocabulary


@pytest.fixture(scope="module")
def model():
    return DeterministicRecognizer()


def _prep(texts, heights=None):
    heights = heights or [32] * len(texts)
    return np.stack(
        [
            preprocess_one(render_text(t, h), f"m-{i}")
            for i, (t, h) in enumerate(zip(texts, heights))
        ]
    )


def test_recognition_inverts_rendering(model):
    texts = ["hello", "", "a", "x" * MAX_TEXT_LEN, "0123456789"]
    x = _prep(texts, [32, 64, 32, 64, 32])
    out = model.recognize_texts(x).to_pylist()
    # note: empty stays empty here; the ""->"a" fill is a separate stage
    assert out == texts


def test_batch_composition_independence(model):
    """Per-row output must not depend on which rows share the batch —
    the invariant that makes Ray block boundaries semantically free
    (reference analog: fixed-size padded inputs + per-row argmax)."""
    texts = ["abc", "de", "fgh1", "", "zz"]
    full = model.recognize_texts(_prep(texts)).to_pylist()
    for i, t in enumerate(texts):
        solo = model.recognize_texts(_prep([t], [32])).to_pylist()
        assert solo[0] == full[i]


def test_greedy_decode_stops_on_eos_and_caps_at_32(model):
    # sequence of length 3 -> [sos, c1, c2, c3, eos]
    feats = np.full((1, 31), PAD, dtype=np.int32)
    feats[0, :3] = [5, 6, 7]
    seqs, lens = model.greedy_decode(feats, np.array([3], dtype=np.int32))
    assert lens[0] == 5
    assert list(seqs[0, :5]) == [SOS, 5, 6, 7, EOS]
    # max-length content (31 chars) -> eos lands exactly at the 32-step cap
    feats31 = np.full((1, 31), 9, dtype=np.int32)
    seqs, lens = model.greedy_decode(feats31, np.array([31], dtype=np.int32))
    assert lens[0] == 33  # sos + 31 chars + eos
    assert seqs[0, 32] == EOS


def test_decode_error_on_garbage(model):
    x = np.zeros((1, 3, 64, 256), dtype=np.float32)
    with pytest.raises(DecodeError):
        model.encode(x)


def test_vectorized_equals_dict_loop(model):
    """greedy_decode (vectorized) must equal the oracle's dict-based
    reference-style loop for every row."""
    from vietnamese_ocr_ray.oracle import _autoregressive_forward

    texts = ["abc", "", "q" * 30, "7x"]
    x = _prep(texts, [32, 64, 32, 64])
    feats, lens = model.encode(x)
    seqs, seq_lens = model.greedy_decode(feats, lens)
    dict_img = {f"k{i}": x[i] for i in range(len(texts))}
    dict_tgt = {f"k{i}": [SOS] for i in range(len(texts))}
    out = _autoregressive_forward(model, dict_img, dict_tgt)
    for i in range(len(texts)):
        assert list(seqs[i, : seq_lens[i]]) == out[f"k{i}"]


def test_beam_top1_equals_greedy_every_width(model):
    """The stand-in has a strict per-step argmax, so beam search must
    return exactly the greedy path for every width — the same
    renderer-inversion property, via the scored-hypothesis machinery."""
    texts = ["abc", "", "q" * 30, "7x", "hello"]
    x = _prep(texts, [32, 64, 32, 64, 32])
    want = [s.as_py() for s in model.recognize_texts(x)]
    for width in (1, 2, 4):
        got = [
            s.as_py()
            for s in model.recognize_texts(x, decode="beam", beam_width=width)
        ]
        assert got == want, width


def test_beam_beats_width1_on_score_trap():
    """Real beam machinery: with prefix-conditioned logits where the
    greedy first step leads to a poor finish, width-1 falls into the
    trap and width-2 recovers the higher-scoring path."""
    A, B = 3, 4

    class Trap(DeterministicRecognizer):
        def step_logits(self, features_row, length, t, prefix=()):
            logits = np.full(self.vocab.vocab_size, -10.0, np.float32)
            if t == 0:
                logits[A] = 2.0
                logits[B] = 1.9
            elif prefix and prefix[0] == A:
                logits[EOS] = -5.0  # the trap: A's only finish is weak
            else:
                logits[EOS] = 3.0
            return logits

    m = Trap()
    feats = np.zeros((1, 31), np.int32)
    lens = np.array([2], np.int32)
    seq1, len1 = m.beam_decode(feats, lens, width=1)
    seq2, len2 = m.beam_decode(feats, lens, width=2)
    assert seq1[0, 1] == A  # greedy-by-machinery takes the bait
    assert seq2[0, 1] == B  # beam keeps the runner-up and wins
    assert seq2[0, 2] == EOS


def test_beam_recognize_content_longer_than_feature_width():
    """Regression (ADVICE r2): a prefix-conditioned plug-in (subclassed
    step_logits) may legally emit up to MAX_DECODE_STEPS content tokens
    even when the encoder's feature width is narrower; the beam output
    buffer must be sized for both."""
    from vietnamese_ocr_ray.vocab import MAX_DECODE_STEPS

    class LongTalker(DeterministicRecognizer):
        def encode(self, batch):
            n = batch.shape[0]
            return np.zeros((n, 4), np.int32), np.ones(n, np.int32)

        def step_logits(self, features_row, length, t, prefix=()):
            logits = np.full(self.vocab.vocab_size, -10.0, np.float32)
            logits[3] = 1.0  # always emit content, never <eos>
            return logits

    m = LongTalker()
    x = np.zeros((2, 64, 256), np.float32)
    ids, lens = m.recognize(x, decode="beam", beam_width=2)
    assert lens.tolist() == [MAX_DECODE_STEPS, MAX_DECODE_STEPS]
    assert ids.shape[1] >= MAX_DECODE_STEPS
    assert (ids[:, :MAX_DECODE_STEPS] == 3).all()


def test_from_checkpoint_gates_at_the_load_seam():
    """Real-weights ingestion (reference src/utils/inference.py:21-28)
    is a documented one-function swap: without torch the classmethod
    must raise NotImplementedError AT the load seam, naming the path,
    not fail obscurely downstream."""
    with pytest.raises(NotImplementedError, match="checkpoint"):
        DeterministicRecognizer.from_checkpoint(
            "/root/reference/checkpoint/model.pt"
        )
