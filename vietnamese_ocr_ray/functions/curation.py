"""Fused corpus-curation filter — the RefinedWeb/MassiveText front
half (quality rules -> model score -> reproducible subsample) as ONE
actor-pool ``map_batches`` pass.

Each stage is already a shipped, SQL-checked operator (Gopher rules:
``functions/text.gopher_rules_batch``; hashed-BoW classifier:
``functions/classifier``; hash-band sampling:
``functions/sampling.hash_sample``). Running them as separate
Datasets would stream the corpus three times; at 100 TB the right
plan is OPERATOR FUSION — all three predicates evaluate on the same
in-memory Arrow batch, the corpus is read once, nothing shuffles, and
the only state (the classifier weight table) is built once per actor.
This module is that fused plan; the driver value-checks the composed
result end-to-end against a single nested-CTE oracle.

Output: (doc_id, lang, n_tokens, logit_milli) for surviving docs.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from vietnamese_ocr_ray.functions.classifier import (
    _token_hashes,
    stand_in_weights,
)
from vietnamese_ocr_ray.functions.sampling import (
    FP_MOD,
    _poly_hash,
)
from vietnamese_ocr_ray.functions.text import gopher_rules_batch


class FusedCurationFilter:
    """Gopher rules AND classifier logit > 0 AND salted hash band —
    one pass, one filter."""

    def __init__(
        self,
        dim: int = 512,
        rate_permille: int = 800,
        salt: str = "cur:",
    ):
        self.dim = dim
        self.rate = rate_permille
        self.salt = salt
        self.weights = stand_in_weights(dim)

    def __call__(self, batch: pa.Table) -> pa.Table:
        gop = gopher_rules_batch(batch)
        kept = np.asarray(gop.column("kept"), dtype=bool)

        h, ntok = _token_hashes(batch)
        w_flat = self.weights[h % self.dim]
        csum = np.concatenate([[0], np.cumsum(w_flat)])
        ends = np.concatenate([[0], np.cumsum(ntok)])
        logit = csum[ends[1:]] - csum[ends[:-1]]

        keys = pc.binary_join_element_wise(
            pa.scalar(self.salt),
            pc.cast(batch.column("doc_id"), pa.string()),
            pa.scalar(""),
        )
        fp = _poly_hash(keys)
        band = (fp * fp % FP_MOD) * fp % FP_MOD % 1000

        keep = kept & (logit > 0) & (band < self.rate)
        b = batch.filter(pa.array(keep))
        return pa.table(
            {
                "doc_id": b.column("doc_id"),
                "lang": b.column("lang"),
                "n_tokens": pa.array(ntok[keep]),
                "logit_milli": pa.array(logit[keep]),
            }
        )


def curation_pipeline(
    ds: rd.Dataset,
    dim: int = 512,
    rate_permille: int = 800,
    concurrency=(1, 8),
) -> rd.Dataset:
    """The fused single-scan curation filter over (doc_id, text,
    lang)."""
    return ds.map_batches(
        FusedCurationFilter,
        fn_constructor_kwargs={"dim": dim, "rate_permille": rate_permille},
        batch_format="pyarrow",
        concurrency=concurrency,
    )
