"""Unit tests for the vocabulary (reference src/utils/vocab.py semantics)."""

import numpy as np
import pytest

from vietnamese_ocr_ray.vocab import (
    ALPHABET,
    EOS,
    MAX_DECODE_STEPS,
    PAD,
    SOS,
    OOVError,
    Vocabulary,
)


def test_ids_are_sorted_position_plus_3():
    v = Vocabulary("cab")
    assert v.letter_to_idx == {
        "a": 3,
        "b": 4,
        "c": 5,
        "<sos>": 0,
        "<eos>": 1,
        "<pad>": 2,
    }
    assert v.vocab_size == 6


def test_encode_wraps_with_sos_eos():
    v = Vocabulary("ab")
    assert v.encode("ba") == [SOS, 4, 3, EOS]
    assert v.encode("") == [SOS, EOS]


def test_decode_strips_all_specials():
    v = Vocabulary("ab")
    assert v.decode([SOS, 3, PAD, 4, EOS, PAD]) == "ab"
    assert v.decode([SOS, EOS]) == ""


def test_roundtrip_full_alphabet():
    v = Vocabulary()
    s = ALPHABET[:MAX_DECODE_STEPS - 2]
    assert v.decode(v.encode(s)) == s


def test_oov_is_explicit_error():
    # the reference maps OOV to None and crashes later
    # (src/utils/vocab.py:26); we raise at encode time
    v = Vocabulary("ab")
    with pytest.raises(OOVError):
        v.encode("abc")


def test_decode_matrix_matches_scalar_decode():
    v = Vocabulary()
    ids = np.array([[3, 4, 5, 0], [10, 2, 2, 2], [3, 3, 3, 3]], dtype=np.int32)
    lengths = np.array([3, 1, 0])
    out = v.decode_matrix(ids, lengths).to_pylist()
    assert out[0] == v.decode([3, 4, 5])
    assert out[1] == v.decode([10])
    assert out[2] == ""


def test_vocab_build_non_ascii_vectorized(ray_session, tmp_path):
    """The non-ASCII fallback (bulk utf-8 -> utf-32 decode, vectorized
    unique) must produce exactly the sorted distinct characters of a
    Vietnamese corpus — identical to the per-row Python set it
    replaced — with rank+2 ids."""
    import pandas as pd

    from vietnamese_ocr_ray.pipelines.doctext import vocab_build

    texts = ["xin chào", "việt nam", "cà phê sữa đá", "hà nội ơi"]
    pd.DataFrame({"text": texts}).to_parquet(tmp_path / "documents.parquet")
    out = vocab_build(str(tmp_path)).to_pandas()
    expect = sorted({c for s in texts for c in s})
    assert list(out["letter"]) == expect
    assert list(out["id"]) == [i + 3 for i in range(len(expect))]
