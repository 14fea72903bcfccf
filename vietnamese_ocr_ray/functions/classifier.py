"""Hashed-feature linear quality-classifier inference — the
"run a learned quality classifier over every document" stage of a web
corpus pipeline (CCNet / RefinedWeb style). The model here is a
deterministic stand-in (no trained artifacts exist in this sandbox):
hashed bag-of-words features and a pseudo-random integer weight table
derived from the feature index. The Ray shape is the real thing — a
stateful actor-pool stage whose weight table is built ONCE per actor
in ``__init__`` and whose per-batch inference is fully vectorized —
and the arithmetic is SQL-mirrored so the driver value-checks every
logit bit-exact.

Model:

* feature bucket  ``b(tok) = h31(tok) % dim`` with ``h31`` the
  31-polynomial token hash of ``functions/dedup.simhash_tokens_batch``
  (tokens capped at 32 chars; SQL: list_transform + a 31^j literal
  table)
* weight          ``w[b] = mixed(poly('w:' || b)) % 2001 - 1000``
  integer milli-units in [-1000, 1000] (the salted cubed polynomial of
  ``functions/sampling``)
* logit           ``logit_milli(doc) = sum over tokens of w[b(tok)]``
  — an order-independent int64 sum, so reduces are exact
* decision        ``keep = logit_milli > 0``

Scale shape: stateless per doc given the weight table; ``dim`` int64
weights (KBs) live in actor state, never re-shipped per batch; zero
shuffles. Swapping the stand-in weights for a real model's is a
one-line change in ``__init__`` (load from a checkpoint path) — the
inference path is identical.

Reference parity: beyond-reference LLM-data-pipeline surface
(SURVEY.md §2.8); the reference has no corpus-quality concept.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from vietnamese_ocr_ray.functions.dedup import (
    SIMHASH_CAP,
    SIMHASH_P,
    _POW31,
    _utf8_flat,
)
from vietnamese_ocr_ray.functions.sampling import _mixed_hash, _poly_hash


def _token_hashes(batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    """(flat token hashes, tokens-per-doc) for a batch — the same
    31-polynomial / 32-char-cap hash as simhash_tokens_batch, one
    weighted-mod cumsum over the flat utf8 buffer (ASCII fast path,
    per-token Python fallback otherwise)."""
    toks_list = pc.split_pattern(batch.column("text"), " ")
    flat = pc.list_flatten(toks_list)
    flat = pc.utf8_slice_codeunits(flat, 0, SIMHASH_CAP)
    ntok = pc.list_value_length(toks_list).to_numpy(zero_copy_only=False)
    offs, data = _utf8_flat(flat.combine_chunks())
    if data.size == 0 or (data < 128).all():
        chars = data.astype(np.int64)
        lens = offs[1:] - offs[:-1]
        starts = np.repeat(offs[:-1], lens)
        local = np.arange(chars.shape[0], dtype=np.int64) - starts
        weighted = (chars * _POW31[local]) % SIMHASH_P
        csum = np.concatenate([[0], np.cumsum(weighted)])
        h = (csum[offs[1:]] - csum[offs[:-1]]) % SIMHASH_P
    else:
        toks = flat.to_pylist()
        h = np.fromiter(
            (
                sum(ord(c) * int(_POW31[j]) for j, c in enumerate(t or ""))
                % SIMHASH_P
                for t in toks
            ),
            np.int64,
            count=len(toks),
        )
    return h, ntok.astype(np.int64)


def stand_in_weights(dim: int, salt: str = "w:") -> np.ndarray:
    """The deterministic milli-unit weight table: one salted cubed
    polynomial hash per feature index, mapped into [-1000, 1000]."""
    idx = pa.array([f"{salt}{j}" for j in range(dim)], pa.string())
    return (_mixed_hash(_poly_hash(idx)) % 2001 - 1000).astype(np.int64)


class HashedLinearScorer:
    """Actor-pool inference stage: weight table built once per actor,
    vectorized hashed-BoW logit per document per batch."""

    def __init__(self, dim: int = 512, salt: str = "w:"):
        self.dim = dim
        self.weights = stand_in_weights(dim, salt)

    def __call__(self, batch: pa.Table) -> pa.Table:
        h, ntok = _token_hashes(batch)
        w_flat = self.weights[h % self.dim]
        csum = np.concatenate([[0], np.cumsum(w_flat)])
        ends = np.concatenate([[0], np.cumsum(ntok)])
        logit = csum[ends[1:]] - csum[ends[:-1]]
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "logit_milli": pa.array(logit),
                "keep": pa.array((logit > 0).astype(np.int64)),
            }
        )


# tasks-mode per-process scorer cache: the weight table is KBs and
# derivable in O(dim), so pinning it in a dedicated actor pool buys
# nothing while the pool spin-up dominates small runs (Ray Data actor
# pools are per-execution) and its reserved CPUs can't be rebalanced
# by the streaming executor — the same tradeoff recognize_compute=
# "tasks" documents. A real learned model (GPU-resident weights) is
# when compute="actors" pays.
_PROCESS_SCORERS: dict[tuple[int, str], HashedLinearScorer] = {}


def _score_batch_tasks(batch: pa.Table, dim: int, salt: str) -> pa.Table:
    scorer = _PROCESS_SCORERS.get((dim, salt))
    if scorer is None:
        scorer = _PROCESS_SCORERS[(dim, salt)] = HashedLinearScorer(dim, salt)
    return scorer(batch)


def classifier_score(
    ds: rd.Dataset,
    dim: int = 512,
    concurrency=(1, 8),
    compute: str = "tasks",
) -> rd.Dataset:
    """(doc_id, logit_milli, keep) for every document.

    ``compute="tasks"`` (default) caches the weight table once per
    worker PROCESS; ``compute="actors"`` pins it in an actor pool
    (the shape for expensive/GPU-resident real-model state)."""
    if compute == "actors":
        return ds.map_batches(
            HashedLinearScorer,
            fn_constructor_kwargs={"dim": dim},
            batch_format="pyarrow",
            concurrency=concurrency,
        )
    from functools import partial

    return ds.map_batches(
        partial(_score_batch_tasks, dim=dim, salt="w:"),
        batch_format="pyarrow",
    )


# ---------------------------------------------------------------------------
# Decision-stump learning: distributed histogram, exact-integer split search
# ---------------------------------------------------------------------------


def decision_stump(
    sf_dir: str, target: str = "purchase", nbins: int = 64
) -> "pa.Table":
    """Learn the best single-threshold split of ``value`` predicting
    ``event_type == target`` — the CART root-node computation, the
    one-feature case of distributed tree learning (and the classic
    "1R" baseline classifier).

    Distributed shape: pass 1 is a (min, max) aggregate over exact
    integer milli-values; pass 2 is a per-batch (bin, label) bincount
    partial -> one tiny Sum groupby (2 * nbins rows cross the wire per
    block, never rows). The candidate scan runs driver-side over the
    ``nbins``-row histogram — constant-sized, like every argmin this
    engine keeps on the driver.

    Exactness: weighted-Gini argmax is done in unbounded Python ints.
    Minimizing weighted Gini == maximizing
    ``S(t) = (aL^2+bL^2)/nL + (aR^2+bR^2)/nR``; scores are compared via
    the integer fixed-point ``(p * 10^12) // q`` with
    ``p = (aL^2+bL^2)*nR + (aR^2+bR^2)*nL`` and ``q = nL*nR`` — the SQL
    oracle replays the same HUGEINT arithmetic, so the chosen split is
    bit-identical (ties break toward the smaller threshold). Empty
    sides are not candidates.

    Binning: ``bin = (v - lo) * nbins // (hi - lo + 1)`` over
    non-negative ints — floor == truncate, so numpy and DuckDB ``//``
    agree.
    """
    from ray.data.aggregate import Max, Min, Sum

    from vietnamese_ocr_ray.sources.storage import read_parquet_clean

    ds = read_parquet_clean(
        f"{sf_dir}/events.parquet", columns=["value", "event_type"]
    )

    def to_milli(b: pa.Table) -> pa.Table:
        v = pc.cast(
            pc.round(pc.multiply(b.column("value"), pa.scalar(1000.0))),
            pa.int64(),
        )
        return pa.table(
            {"v": v, "y": pc.equal(b.column("event_type"), pa.scalar(target))}
        )

    milli = ds.map_batches(to_milli, batch_format="pyarrow")
    mm = milli.aggregate(Min("v"), Max("v"))
    lo, hi = int(mm["min(v)"]), int(mm["max(v)"])
    span = hi - lo + 1

    def hist_partial(b: pa.Table) -> pa.Table:
        v = b.column("v").to_numpy(zero_copy_only=False)
        y = b.column("y").to_numpy(zero_copy_only=False)
        bins = (v - lo) * nbins // span
        pos = np.bincount(bins[y], minlength=nbins)
        tot = np.bincount(bins, minlength=nbins)
        return pa.table(
            {
                "bin": pa.array(np.arange(nbins, dtype=np.int64)),
                "a": pa.array(pos.astype(np.int64)),
                "n": pa.array(tot.astype(np.int64)),
            }
        )

    hist = (
        milli.map_batches(hist_partial, batch_format="pyarrow")
        .groupby("bin")
        .aggregate(Sum("a", alias_name="a"), Sum("n", alias_name="n"))
        .to_pandas()
        .sort_values("bin")
    )
    a = np.zeros(nbins, np.int64)
    n = np.zeros(nbins, np.int64)
    a[hist["bin"].to_numpy()] = hist["a"].to_numpy()
    n[hist["bin"].to_numpy()] = hist["n"].to_numpy()
    A, N = int(a.sum()), int(n.sum())

    best = None  # (score_fe12, -t) maximized; tie -> smaller t
    ca = cn = 0
    for t in range(1, nbins):
        ca += int(a[t - 1])
        cn += int(n[t - 1])
        n_l, a_l = cn, ca
        n_r, a_r = N - cn, A - ca
        if n_l == 0 or n_r == 0:
            continue
        b_l, b_r = n_l - a_l, n_r - a_r
        p = (a_l * a_l + b_l * b_l) * n_r + (a_r * a_r + b_r * b_r) * n_l
        q = n_l * n_r
        score = (p * 10**12) // q
        if best is None or score > best[0] or (score == best[0] and t < best[1]):
            best = (score, t, n_l, a_l, n_r, a_r)
    if best is None:
        # degenerate input: every row lands in one bin (single distinct
        # value / span < nbins collapse), so no candidate split has two
        # non-empty sides — there is no stump to fit
        raise ValueError(
            "decision_stump: no valid split — all values fall in a "
            f"single bin (lo={lo}, hi={hi}, nbins={nbins}); a stump "
            "needs at least two non-empty sides"
        )
    score, t, n_l, a_l, n_r, a_r = best
    thr_milli = lo + (t * span + nbins - 1) // nbins  # smallest v in bin >= t
    return pa.table(
        {
            "split_bin": pa.array([t], pa.int64()),
            "threshold": pa.array([thr_milli / 1000.0], pa.float64()),
            "n_left": pa.array([n_l], pa.int64()),
            "pos_left": pa.array([a_l], pa.int64()),
            "n_right": pa.array([n_r], pa.int64()),
            "pos_right": pa.array([a_r], pa.int64()),
            "score_fe12": pa.array([score], pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# Multinomial Naive Bayes: distributed count training, broadcast scoring
# ---------------------------------------------------------------------------


def nb_classify(sf_dir: str) -> rd.Dataset:
    """Train a multinomial Naive Bayes lang model on the corpus's own
    (text, lang) pairs and classify every document — the fastText-style
    supervised lang-ID / quality-tagging stage of a curation pipeline,
    with training folded in (counts are one distributed aggregate).

    Shape: token counts per (lang, tok) come from per-batch Arrow
    group_by partials -> one vocab-bounded groupby; the learned weight
    table (vocab x langs, Laplace-smoothed log-likelihoods + priors) is
    vocab-bounded and ships ONCE via ray.put; scoring is a stateless
    map_batches — flat token split, one weight-matrix gather, one
    segment-sum per doc. No shuffle touches document rows.

    Determinism: weights quantize to integer MICRO-nats
    (round(ln(p) * 1e6), the zipf_slope convention — coarse enough that
    a last-ulp ln() divergence between numpy and DuckDB cannot flip a
    rounded weight); per-doc scores are exact int64 sums of those
    integers, and argmax ties break toward the lexicographically
    smallest lang, replayed in SQL by (score DESC, lang ASC).
    """
    import ray
    from ray.data.aggregate import Sum

    from vietnamese_ocr_ray.sources.storage import read_parquet_clean

    docs = read_parquet_clean(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    )

    def count_partial(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern(b.column("text"), " ")
        flat = pc.list_flatten(toks)
        ntok = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        lang = pa.array(
            np.repeat(np.asarray(b.column("lang")), ntok), pa.string()
        )
        g = (
            pa.table({"lang": lang, "tok": flat})
            .group_by(["lang", "tok"])
            .aggregate([([], "count_all")])
        )
        return g.rename_columns(["lang", "tok", "n"])

    counts = (
        docs.map_batches(count_partial, batch_format="pyarrow")
        .groupby(["lang", "tok"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    pri = (
        docs.map_batches(
            lambda b: pa.table(
                {"lang": b.column("lang"), "nd": np.ones(b.num_rows, np.int64)}
            ),
            batch_format="pyarrow",
        )
        .groupby("lang")
        .aggregate(Sum("nd", alias_name="nd"))
        .to_pandas()
    )

    langs = sorted(pri["lang"])
    lang_idx = {l: i for i, l in enumerate(langs)}
    vocab = sorted(counts["tok"].unique())
    tok_idx = {t: i for i, t in enumerate(vocab)}
    V, L = len(vocab), len(langs)
    cmat = np.zeros((V, L), np.int64)
    cmat[
        counts["tok"].map(tok_idx).to_numpy(),
        counts["lang"].map(lang_idx).to_numpy(),
    ] = counts["n"].to_numpy()
    ctot = cmat.sum(axis=0)
    n_docs = int(pri["nd"].sum())
    nd = np.zeros(L, np.int64)
    nd[pri["lang"].map(lang_idx).to_numpy()] = pri["nd"].to_numpy()

    wmat = np.round(
        np.log((cmat + 1).astype(np.float64) / (ctot + V).astype(np.float64))
        * 1e6
    ).astype(np.int64)
    prior = np.round(np.log(nd / float(n_docs)) * 1e6).astype(np.int64)
    model = ray.put((tok_idx, wmat, prior, np.array(langs)))

    def score(b: pa.Table) -> pa.Table:
        tidx, W, P, larr = ray.get(model)
        toks = pc.split_pattern(b.column("text"), " ")
        flat = pc.list_flatten(toks).to_pandas()
        ntok = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        idx = flat.map(tidx).to_numpy(np.int64)  # corpus-trained: no misses
        gathered = W[idx]  # (ntok_flat, L)
        bounds = np.concatenate(([0], np.cumsum(ntok)))[:-1]
        sums = np.add.reduceat(gathered, bounds, axis=0)
        sums[ntok == 0] = 0  # reduceat repeats rows on empty segments
        scores = sums + P[None, :]
        best = np.argmax(scores, axis=1)  # first max == smallest lang
        return pa.table(
            {
                "doc_id": b.column("doc_id"),
                "true_lang": b.column("lang"),
                "pred_lang": pa.array(larr[best], pa.string()),
                "score_micro": pa.array(
                    scores[np.arange(len(best)), best], pa.int64()
                ),
                "correct": pa.array(
                    (
                        np.asarray(b.column("lang")) == larr[best]
                    ).astype(np.int64)
                ),
            }
        )

    return docs.map_batches(score, batch_format="pyarrow")
