"""Deterministic NumPy stand-in for the reference OCR model.

The reference checkpoint is a Git-LFS stub (no real weights available),
so "match the reference's predict outputs" is operationalized as:
reimplement the predict *semantics* exactly — encoder runs once per
image (reference src/model/model.py:206-207), then a greedy
autoregressive decode seeded with [<sos>], stopping per-sequence on
<eos>, hard-capped at 32 steps with leftovers flushed
(src/model/model.py:202-233) — over a deterministic model shared by the
single-process oracle and the Ray pipeline.

The stand-in "weights": the synthetic corpus renderer (synth.py) draws
each character of the ground-truth text as a constant-intensity vertical
band; the encoder reads the band levels back from the preprocessed
(3, 64, 256) tensor. Band centers survive the full reference preprocess
chain exactly (sharpness blending only touches pixels adjacent to
intensity edges; bilinear resize of constant interiors is constant;
autocontrast is identity because every rendered image contains a 0 and
a 255 pixel), so recognition inverts rendering exactly and per-row
results are independent of batch composition — the property the
reference's dynamic batch-shrink decode also guarantees (SURVEY.md §2.3
T3), which is what makes Ray block boundaries unable to change output.
"""

from __future__ import annotations

import numpy as np

from vietnamese_ocr_ray.vocab import (
    EOS,
    MAX_DECODE_STEPS,
    PAD,
    SOS,
    Vocabulary,
)

# Band geometry (post-resize coordinate space, shared with synth.py's
# renderer). One 8-px band per character + one terminator band.
BAND_W = 8
SAMPLE_ROW = 32
LEVEL0 = 40  # inverted intensity of char index 0
LEVEL_STEP = 4  # intensity step between consecutive char indices
TERMINATOR_LEVEL = 255  # inverted intensity of the terminator band
DETECT_THRESH = 20.0  # content-column detection threshold (pad/background ~ 0)

MODEL_VERSION = "det-numpy-v1"


class DecodeError(ValueError):
    """A preprocessed image did not carry a valid band encoding."""


class DeterministicRecognizer:
    """encode() + greedy_decode() with the reference's decode semantics.

    Stateful-by-design: constructed once per worker/actor (the analog of
    loading the 269 MB checkpoint in Inference.__init__, reference
    src/utils/inference.py:20-42).
    """

    def __init__(self, vocab: Vocabulary | None = None):
        self.vocab = vocab or Vocabulary()
        self.model_version = MODEL_VERSION

    @classmethod
    def from_checkpoint(cls, path: str) -> "DeterministicRecognizer":
        """THE real-weights seam (reference src/utils/inference.py:21-28:
        ``torch.load(path)`` -> dict with state_dict / config / vocab
        maps -> build OCRTransformerModel -> load_state_dict -> eval).

        Swapping real weights into this engine is this one function: a
        torch build reads the checkpoint dict here, constructs the
        encoder/decoder, pulls letter_to_idx/idx_to_letter into a
        Vocabulary, and returns an object with the same encode()/
        greedy_decode()/beam_decode()/recognize() surface. In this
        sandbox torch is unavailable and the bundled checkpoint is a
        Git-LFS stub, so the seam raises NotImplementedError at the
        exact load point — mirroring the compressed-codec gates in
        stages/multimodal.py. The deterministic stand-in is constructed
        via ``DeterministicRecognizer()`` instead; MODEL_VERSION rides
        the lineage manifest so outputs are attributable either way.
        """
        try:
            import torch  # noqa: F401
        except ImportError as e:
            raise NotImplementedError(
                "torch unavailable in this sandbox: real checkpoint "
                f"ingestion ({path!r}) is gated at this seam; construct "
                "DeterministicRecognizer() for the stand-in model"
            ) from e
        raise NotImplementedError(
            "real checkpoint ingestion: torch.load(path) -> state_dict/"
            "config/vocab -> model build (reference "
            "src/utils/inference.py:21-28) — implement when real weights "
            "and torch are present"
        )

    # ---- stage 1: detection (text-box localization analog) ----------
    def detect(self, batch: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Locate the content region per image — the stand-in for a
        DBNet-style detection stage: (N, 64, 256) or (N, 3, 64, 256)
        float in [0,1] -> (box_lo (N,) int32 first content column,
        n_bands (N,) int32). Vectorized; DecodeError on empty images."""
        row = batch[:, SAMPLE_ROW, :] if batch.ndim == 3 else batch[:, 0, SAMPLE_ROW, :]
        x = row.astype(np.float64) * 255.0
        n, w = x.shape
        mask = x >= DETECT_THRESH
        if not mask.any(axis=1).all():
            raise DecodeError("image with no detectable content bands")
        lo = mask.argmax(axis=1)
        hi = (w - 1) - mask[:, ::-1].argmax(axis=1)
        width = hi - lo + 1
        nbands = np.rint(width / BAND_W).astype(np.int64)
        if (nbands < 1).any() or (nbands > MAX_DECODE_STEPS).any():
            raise DecodeError("band count out of range")
        return lo.astype(np.int32), nbands.astype(np.int32)

    # ---- stage 2 feature read (given detected boxes) ----------------
    def read_features(
        self, batch: np.ndarray, lo: np.ndarray, nbands: np.ndarray
    ) -> tuple[np.ndarray, np.ndarray]:
        """Recognition-stage feature extraction from detected boxes."""
        row = batch[:, SAMPLE_ROW, :] if batch.ndim == 3 else batch[:, 0, SAMPLE_ROW, :]
        x = row.astype(np.float64) * 255.0
        n, w = x.shape
        lo = lo.astype(np.int64)
        lengths = (nbands.astype(np.int64) - 1).astype(np.int32)
        max_chars = MAX_DECODE_STEPS - 1
        cols = lo[:, None] + BAND_W * np.arange(max_chars)[None, :] + BAND_W // 2
        vals = x[np.arange(n)[:, None], np.minimum(cols, w - 1)]
        idx0 = np.rint((vals - LEVEL0) / LEVEL_STEP).astype(np.int64)
        active = np.arange(max_chars)[None, :] < lengths[:, None]
        nletters = self.vocab.vocab_size - 3
        bad = active & (
            (idx0 < 0)
            | (idx0 >= nletters)
            | (np.abs(vals - (LEVEL0 + idx0 * LEVEL_STEP)) > LEVEL_STEP / 2.0)
        )
        if bad.any():
            raise DecodeError("unquantizable band level (OOV glyph?)")
        features = np.where(active, idx0 + 3, PAD).astype(np.int32)
        return features, lengths

    # ---- fused encoder (single-stage path) --------------------------
    def encode(self, batch: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Run the "encoder" once per image (analog of
        src/model/model.py:207): (N, 3, 64, 256) CHW float32 in [0,1]
        — or the equivalent (N, 64, 256) gray canvas (channels are
        identical by construction, transform.py:69-70) ->
        (features (N, 31) int32 char ids, lengths (N,) int32).

        Fully vectorized; raises DecodeError on malformed content.
        """
        lo, nbands = self.detect(batch)
        return self.read_features(batch, lo, nbands)

    # ---- per-step head (used by the oracle's dict-based loop) -------
    def step_logits(
        self,
        features_row: np.ndarray,
        length: int,
        t: int,
        prefix: tuple[int, ...] = (),
    ) -> np.ndarray:
        """Logits for decode step ``t`` of one sequence: argmax equals
        the next token (features[t] while t < length, then <eos>).
        Mirrors the last-position logits slice of
        src/model/model.py:223-225. ``prefix`` (tokens already decoded
        beyond <sos>) is ignored by the stand-in — its next-token
        distribution is prefix-independent, which is exactly why greedy
        inverts the renderer — but beam search passes it so
        prefix-conditioned models (a real seq2seq head) plug in."""
        logits = np.zeros(self.vocab.vocab_size, dtype=np.float32)
        nxt = int(features_row[t]) if t < length else EOS
        logits[nxt] = 1.0
        return logits

    # ---- vectorized greedy decode (the Ray pipeline path) -----------
    def greedy_decode(self, features: np.ndarray, lengths: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Autoregressive greedy decode, vectorized with a done-mask —
        the batch analog of the reference's dict-shrinking loop
        (src/model/model.py:209-232): start [<sos>], append argmax per
        step, a sequence leaves the batch when its last id is <eos>,
        hard cap MAX_DECODE_STEPS appended tokens, leftovers flushed.

        Returns (sequences (N, 1+32) int32 including <sos> and any
        <eos>, seq_lengths (N,) int32 = total ids per row).
        """
        n = features.shape[0]
        seqs = np.full((n, 1 + MAX_DECODE_STEPS), PAD, dtype=np.int32)
        seqs[:, 0] = SOS
        seq_len = np.ones(n, dtype=np.int32)
        done = np.zeros(n, dtype=bool)
        for c in range(MAX_DECODE_STEPS):
            # sequences whose last token is <eos> leave the working set
            done |= seqs[np.arange(n), seq_len - 1] == EOS
            if done.all():
                break
            active = np.nonzero(~done)[0]
            if c < features.shape[1]:
                nxt = np.where(c < lengths[active], features[active, c], EOS)
            else:
                nxt = np.full(len(active), EOS, dtype=np.int32)
            seqs[active, seq_len[active]] = nxt
            seq_len[active] += 1
        return seqs, seq_len

    # ---- beam decode (reference family: seq2seq beam search) --------
    def beam_decode(
        self, features: np.ndarray, lengths: np.ndarray, width: int = 4
    ) -> tuple[np.ndarray, np.ndarray]:
        """Width-``width`` beam search with the same stopping semantics
        as :meth:`greedy_decode` (start [<sos>], per-hypothesis <eos>
        stop, MAX_DECODE_STEPS cap): hypotheses are scored by summed
        log-softmax of :meth:`step_logits`, expanded with the top
        ``width`` tokens per step, PRUNED by sum score, and finally
        selected by LENGTH-NORMALIZED score (mean logp — without the
        normalization every negative-logp model prefers the one-step
        <eos> hypothesis over any longer path, the standard beam
        length bias). Ties break to the lexicographically-smaller
        token sequence everywhere, so the search is deterministic.

        For THIS stand-in each step has a strict argmax, so beam top-1
        provably equals greedy for every width — asserted in tests,
        which also exercise the machinery on a crafted score trap
        (subclassed step_logits) where width>1 must beat greedy. The
        per-sequence Python loop is deliberate: beam is an OPTION on
        the actor-pool decode stage (one model per actor), not the
        vectorized default path."""
        n = features.shape[0]
        out = np.full((n, 1 + MAX_DECODE_STEPS), PAD, dtype=np.int32)
        out[:, 0] = SOS
        out_len = np.ones(n, dtype=np.int32)
        for i in range(n):
            # hypotheses: (score, ids tuple beyond <sos>, finished)
            beams = [(0.0, (), False)]
            for t in range(MAX_DECODE_STEPS):
                nxt_beams = []
                for score, ids, fin in beams:
                    if fin:
                        nxt_beams.append((score, ids, True))
                        continue
                    logits = self.step_logits(
                        features[i], int(lengths[i]), t, prefix=ids
                    )
                    e = np.exp(logits - logits.max())
                    logp = np.log(e / e.sum())
                    order = np.lexsort((np.arange(logits.shape[0]), -logp))
                    for tok in order[:width]:
                        tok = int(tok)
                        nxt_beams.append(
                            (
                                score + float(logp[tok]),
                                ids + (tok,),
                                tok == EOS,
                            )
                        )
                # prune: best `width` by SUM score, then smaller sequence
                nxt_beams.sort(key=lambda b: (-b[0], b[1]))
                beams = nxt_beams[:width]
                if all(b[2] for b in beams):
                    break
            best = min(
                beams, key=lambda b: (-b[0] / max(len(b[1]), 1), b[1])
            )[1]
            out[i, 1 : 1 + len(best)] = best
            out_len[i] = 1 + len(best)
        return out, out_len

    # ---- end-to-end batch recognition -------------------------------
    def recognize(
        self, batch: np.ndarray, decode: str = "greedy", beam_width: int = 4
    ) -> tuple[np.ndarray, np.ndarray]:
        """images -> (content char-id matrix (N, 31), lengths) after
        decode + special strip. ``decode="greedy"`` (default, the
        vectorized reference path: because greedy_decode appends
        exactly features[:length] then <eos> (or hits the 32-step cap),
        the stripped content equals features[:, :min(length, 32)] —
        asserted equivalent to the explicit loop in tests) or
        ``decode="beam"`` (width-``beam_width`` search; top-1 == greedy
        for the stand-in, asserted in tests)."""
        features, lengths = self.encode(batch)
        if decode == "beam":
            seqs, seq_len = self.beam_decode(features, lengths, beam_width)
            n = seqs.shape[0]
            # beam content can legally reach MAX_DECODE_STEPS tokens
            # (a prefix-conditioned step_logits subclass may emit more
            # than the stand-in's features width), so size for both
            ids = np.full(
                (n, max(features.shape[1], MAX_DECODE_STEPS)),
                PAD,
                dtype=np.int32,
            )
            content_len = np.zeros(n, dtype=np.int32)
            for i in range(n):
                content = [
                    t for t in seqs[i, 1 : seq_len[i]] if t >= 3
                ]  # strip <sos>/<eos>/<pad>, order preserved
                ids[i, : len(content)] = content
                content_len[i] = len(content)
            return ids, content_len
        seqs, seq_len = self.greedy_decode(features, lengths)
        # strip specials vectorized: content ids are >= 3, in order
        content_len = np.minimum(lengths, MAX_DECODE_STEPS).astype(np.int32)
        return features, content_len

    def recognize_texts(
        self, batch: np.ndarray, decode: str = "greedy", beam_width: int = 4
    ):
        """images -> Arrow string array of recognized texts."""
        ids, lengths = self.recognize(batch, decode=decode, beam_width=beam_width)
        return self.vocab.decode_matrix(ids, lengths)
