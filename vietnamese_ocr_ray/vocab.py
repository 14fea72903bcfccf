"""Character vocabulary — faithful restatement of the reference's
``Vocabulary`` (reference src/utils/vocab.py:4-39) without torch.

Semantics preserved exactly:
  * ids are ``sorted(distinct_chars)`` position + 3
  * specials: <sos>=0, <eos>=1, <pad>=2
  * encode(s) = [<sos>] + ids + [<eos>]
  * decode(ids) strips all three specials and joins

Deviation (documented, SURVEY.md §7.3): the reference maps unknown
characters to ``None`` (src/utils/vocab.py:26) which crashes later —
we raise an explicit ``OOVError`` at encode time instead.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

SOS, EOS, PAD = 0, 1, 2
SPECIALS = {SOS: "<sos>", EOS: "<eos>", PAD: "<pad>"}

# Fixed corpus alphabet for the deterministic stand-in model (the
# reference bakes its vocab into the checkpoint; ours is a constant so
# the renderer, recognizer, oracle and SQL oracles all agree).
ALPHABET = "".join(sorted("abcdefghijklmnopqrstuvwxyz0123456789"))

# Reference decode cap: at most 32 greedy steps (src/model/model.py:209),
# i.e. <=31 content chars before <eos> fits within the cap.
MAX_DECODE_STEPS = 32
MAX_TEXT_LEN = 30


class OOVError(ValueError):
    """Raised when encoding meets a character outside the vocabulary."""


class Vocabulary:
    def __init__(self, chars: str = ALPHABET):
        vocab = sorted(set(chars))
        self.letters = vocab
        self.letter_to_idx = {l: i + 3 for i, l in enumerate(vocab)}
        self.idx_to_letter = {i + 3: l for i, l in enumerate(vocab)}
        self.letter_to_idx["<sos>"] = SOS
        self.letter_to_idx["<eos>"] = EOS
        self.letter_to_idx["<pad>"] = PAD
        self.idx_to_letter[SOS] = "<sos>"
        self.idx_to_letter[EOS] = "<eos>"
        self.idx_to_letter[PAD] = "<pad>"
        self.vocab_size = len(vocab) + 3
        # numpy lookup table for vectorized decode: id -> char
        self._id_to_char = np.array(
            ["", "", ""] + vocab, dtype="U1"
        )  # specials decode to "" (stripped)

    def encode(self, s: str) -> list[int]:
        """[<sos>] + char ids + [<eos>] (reference src/utils/vocab.py:25-27)."""
        try:
            ids = [self.letter_to_idx[c] for c in s]
        except KeyError as e:
            raise OOVError(f"character {e.args[0]!r} not in vocabulary") from None
        return [SOS] + ids + [EOS]

    def decode(self, ids) -> str:
        """Strip <sos>/<eos>/<pad>, join chars (reference src/utils/vocab.py:28-31)."""
        return "".join(
            self.idx_to_letter[int(i)]
            for i in ids
            if int(i) not in (SOS, EOS, PAD)
        )

    def decode_matrix(self, ids: np.ndarray, lengths: np.ndarray) -> pa.Array:
        """Vectorized batch decode: (N, L) id matrix + per-row content
        lengths -> Arrow string array, zero Python-per-row string work.

        ``ids[r, :lengths[r]]`` must hold content ids (>=3).
        """
        n = ids.shape[0]
        lengths = lengths.astype(np.int64)
        take_mask = np.arange(ids.shape[1])[None, :] < lengths[:, None]
        flat = ids[take_mask].astype(np.int64)
        if flat.size and (flat.min() < 3 or flat.max() >= self.vocab_size):
            raise OOVError("decode_matrix: id outside content range")
        chars = self._id_to_char[flat]
        data = "".join(chars.tolist()).encode("utf-8")  # ASCII alphabet: 1 byte/char
        offsets = np.zeros(n + 1, dtype=np.int32)
        np.cumsum(lengths, out=offsets[1:])
        return pa.StringArray.from_buffers(
            n, pa.py_buffer(offsets.tobytes()), pa.py_buffer(data)
        )

    def to_arrow(self) -> pa.Table:
        """Vocab sidecar table (schema.VOCAB_SCHEMA)."""
        return pa.table(
            {
                "letter": pa.array(self.letters, pa.string()),
                "id": pa.array(
                    [self.letter_to_idx[l] for l in self.letters], pa.int32()
                ),
            }
        )


DEFAULT_VOCAB = Vocabulary()
