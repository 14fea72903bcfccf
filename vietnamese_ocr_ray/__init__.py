"""vietnamese_ocr_ray — a Ray-Data-native OCR/extraction engine.

A from-scratch re-expression of the data-processing capabilities of the
reference repo ``datvodinh/vietnamese-ocr`` (see /root/reference) as an
idiomatic Ray Data pipeline over Lance-layout tables of interleaved
text + media documents:

    (doc_id: string,
     spans: list<struct<kind: string, text: string,
                        media_ref: string, offset: int32>>)

Media spans flow through the reference's OCR predict semantics
(preprocess -> encode -> greedy autoregressive decode <=32 steps ->
special-token strip -> empty->"a" fill); text spans pass through
normalization; per-document span sequences are reassembled ordered by
``offset``.

Library code NEVER calls ``ray.init()`` / ``ray.shutdown()`` — sessions
are owned by the caller (driver / bench / test fixture).
"""

from vietnamese_ocr_ray import compat as _compat

_compat.install()  # schema-stable shuffle shims (see compat.py)

from vietnamese_ocr_ray.vocab import Vocabulary, ALPHABET
from vietnamese_ocr_ray.model import DeterministicRecognizer
from vietnamese_ocr_ray.pipelines.extract import (
    extract_spans,
    predict_single,
    run_extract,
)

__all__ = [
    "Vocabulary",
    "ALPHABET",
    "DeterministicRecognizer",
    "extract_spans",
    "run_extract",
    "predict_single",
]

__version__ = "0.1.0"
