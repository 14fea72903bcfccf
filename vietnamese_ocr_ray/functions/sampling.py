"""Deterministic hash-based sampling — the web-scale reproducible
split. `random_shuffle`+`split_at_indices` (O2) needs a full shuffle
and is seed-order dependent; at 100 TB the standard pattern is a
content-hash predicate: ``keep iff h(key, salt) % D < rate``. It is
embarrassingly parallel (a map_batches filter, no shuffle), stable
across reruns/partitionings/cluster sizes, and composable (disjoint
rate bands give train/val/test without coordination).

The hash is the same SQL-expressible polynomial used by
functions/text.fingerprint (sum of codepoint*position mod 1e9+7 over
the salted key string), so the driver value-checks the exact sampled
row set against DuckDB — not just its size.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from vietnamese_ocr_ray.functions.dedup import _utf8_flat

FP_MOD = 1_000_000_007
MIX_OFFSET = 123_456_789  # forces the cube past FP_MOD even for tiny fps


def _mixed_hash(fp: np.ndarray) -> np.ndarray:
    """(fp + OFFSET)^3 mod p — the ORDERING hash for exact-k sampling.
    The raw polynomial is near-monotone for short keys (a cube below p
    never wraps), so smallest-hash selection would just pick the
    shortest ids; the offset guarantees >= 27 modular wraps for every
    input. 64-bit safe: (p + OFFSET)^2 < 2^63. SQL-mirrored verbatim
    in the oracles."""
    x = fp + MIX_OFFSET
    return (x * x % FP_MOD) * x % FP_MOD


def _poly_hash(arr: pa.Array) -> np.ndarray:
    """sum(codepoint(c_i) * i, 1-based) % 1e9+7 per string — identical
    to functions/text.fingerprint_batch (ASCII fast path + fallback).

    NB: worker-executed code must never import the package INSIDE a
    function — cloudpickle ships these functions by value, and a lazy
    in-function package import fails on workers whose interpreter
    never had the repo on sys.path (the driver may be launched from a
    foreign cwd)."""
    a = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
    offs, data = _utf8_flat(a)
    n = len(a)
    out = np.zeros(n, np.int64)
    if data.size == 0 or (data < 128).all():
        chars = data.astype(np.int64)
        lens = offs[1:] - offs[:-1]
        starts = np.repeat(offs[:-1], lens)
        local = np.arange(chars.shape[0], dtype=np.int64) - starts + 1
        csum = np.concatenate([[0], np.cumsum(chars * local)])
        out = (csum[offs[1:]] - csum[offs[:-1]]) % FP_MOD
    else:
        for i in range(n):
            s = a[i].as_py() or ""
            out[i] = sum(ord(c) * (j + 1) for j, c in enumerate(s)) % FP_MOD
    return out


def hash_sample(
    ds: rd.Dataset,
    key_col: str,
    *,
    rate_permille: int,
    salt: str = "",
    band_offset_permille: int = 0,
) -> rd.Dataset:
    """Keep rows where ``h(salt + str(key)) % 1000`` falls in
    ``[band_offset, band_offset + rate_permille)`` — an exact,
    shuffle-free, rerun-stable sample of ~rate_permille/1000 of the
    data. Non-overlapping bands partition the corpus (train/val/test).
    """
    if not 0 <= rate_permille <= 1000:
        raise ValueError("rate_permille must be in [0, 1000]")
    lo = band_offset_permille
    hi = band_offset_permille + rate_permille

    def keep(batch: pa.Table) -> pa.Table:
        keys = pc.binary_join_element_wise(
            pa.scalar(salt),
            pc.cast(batch.column(key_col), pa.string()),
            pa.scalar(""),
        )
        fp = _poly_hash(keys)
        # cube mod p before banding: the raw polynomial is linear in the
        # codepoints, so similar keys cluster (measured 18% in a 30%
        # band over sequential ids); fp^3 mod p mixes to ~29% while
        # staying SQL-expressible in 64-bit arithmetic
        mixed = (fp * fp % FP_MOD) * fp % FP_MOD
        band = mixed % 1000
        mask = (band >= lo) & (band < hi)
        return batch.filter(pa.array(mask))

    return ds.map_batches(keep, batch_format="pyarrow")


def sample_exact_k(
    ds: rd.Dataset,
    key_col: str,
    k: int,
    *,
    salt: str = "",
) -> rd.Dataset:
    """EXACTLY-k deterministic sample: the k rows whose salted mixed
    hash is smallest (ties break on the key) — a distributed
    order-by-hash without shuffling the corpus: each batch keeps its
    local k smallest (so the global sort sees only k * blocks rows),
    then one tiny sort+limit finishes. Rerun-, partitioning- and
    cluster-size-stable; changing ``salt`` redraws the sample. The
    hash is the same SQL-mirrored cubed polynomial as hash_sample, so
    the oracle reproduces the exact row set."""

    def local_topk(batch: pa.Table) -> pa.Table:
        keys = pc.binary_join_element_wise(
            pa.scalar(salt),
            pc.cast(batch.column(key_col), pa.string()),
            pa.scalar(""),
        )
        mixed = _mixed_hash(_poly_hash(keys))
        t = batch.append_column("_h", pa.array(mixed))
        if t.num_rows > k:
            order = pc.sort_indices(
                t, sort_keys=[("_h", "ascending"), (key_col, "ascending")]
            )
            t = t.take(order[:k])
        return t

    return (
        ds.map_batches(local_topk, batch_format="pyarrow")
        .sort(["_h", key_col])
        .limit(k)
        .map_batches(lambda b: b.drop_columns(["_h"]), batch_format="pyarrow")
    )


def sample_k_per_group(
    ds: rd.Dataset,
    key_col: str,
    group_col: str,
    k: int,
    *,
    salt: str = "",
    num_buckets: int = 32,
) -> rd.Dataset:
    """STRATIFIED exactly-k sample: the k rows with smallest salted
    mixed hash WITHIN EACH GROUP (ties on the key) — per-batch partial
    top-k per group bounds the shuffle at k x groups x blocks rows,
    then one bucketed per-group finish. Deterministic and
    partitioning-stable like :func:`sample_exact_k`."""
    from vietnamese_ocr_ray.functions.joins import key_bucket

    def add_hash(batch: pa.Table) -> pa.Table:
        keys = pc.binary_join_element_wise(
            pa.scalar(salt),
            pc.cast(batch.column(key_col), pa.string()),
            pa.scalar(""),
        )
        mixed = _mixed_hash(_poly_hash(keys))
        return batch.append_column("_h", pa.array(mixed))

    def partial_topk(df):
        s = df.sort_values([group_col, "_h", key_col], kind="stable")
        s = s.groupby(group_col, sort=False).head(k)
        s["_bucket"] = key_bucket(
            pa.Array.from_pandas(s[group_col]), num_buckets
        ).astype(np.int32)
        return pa.Table.from_pandas(s, preserve_index=False).replace_schema_metadata(
            None
        )

    def final_topk(g):
        s = g.sort_values([group_col, "_h", key_col], kind="stable")
        s = s.groupby(group_col, sort=False).head(k)
        out = s.drop(columns=["_h", "_bucket"])
        return pa.Table.from_pandas(out, preserve_index=False).replace_schema_metadata(
            None
        )

    return (
        ds.map_batches(add_hash, batch_format="pyarrow")
        .map_batches(partial_topk, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(final_topk, batch_format="pandas")
    )


def mixture_sample(
    ds: rd.Dataset,
    key_col: str,
    group_col: str,
    *,
    quotas: dict | None = None,
    base: int = 5,
    spread: int = 11,
    salt: str = "mix:",
    quota_salt: str = "q:",
    num_buckets: int = 32,
) -> rd.Dataset:
    """DoReMi / MassiveText-style mixture construction: keep at most
    ``quota(group)`` rows per group (source / language / domain),
    chosen by smallest salted mixed hash — the variable-k
    generalization of :func:`sample_k_per_group`, giving a
    deterministic, rerun/partitioning-stable corpus with target
    per-group proportions.

    The quota is an explicit ``{group: k}`` dict (captured by value —
    mixture tables are small) or, by default, derived from the group
    NAME: ``base + mixed(poly(quota_salt + group)) % spread`` — the
    SQL-mirrored rule the driver value-checks. Scale shape is
    sample_k_per_group's: per-batch partial top-k bounds the shuffle
    at max-quota x groups x blocks rows."""
    from vietnamese_ocr_ray.functions.joins import key_bucket

    def add_hash(batch: pa.Table) -> pa.Table:
        keys = pc.binary_join_element_wise(
            pa.scalar(salt),
            pc.cast(batch.column(key_col), pa.string()),
            pa.scalar(""),
        )
        mixed = _mixed_hash(_poly_hash(keys))
        return batch.append_column("_h", pa.array(mixed))

    def row_quotas(groups) -> np.ndarray:
        if quotas is not None:
            return groups.map(quotas).fillna(0).to_numpy(np.int64)
        names = pc.binary_join_element_wise(
            pa.scalar(quota_salt),
            pc.cast(pa.Array.from_pandas(groups), pa.string()),
            pa.scalar(""),
        )
        return base + _mixed_hash(_poly_hash(names)) % spread

    def trim(df):
        s = df.sort_values([group_col, "_h", key_col], kind="stable")
        keep = (
            s.groupby(group_col, sort=False).cumcount().to_numpy(np.int64)
            < row_quotas(s[group_col])
        )
        return s[keep]

    def partial_topk(df):
        s = trim(df)
        s["_bucket"] = key_bucket(
            pa.Array.from_pandas(s[group_col]), num_buckets
        ).astype(np.int32)
        return pa.Table.from_pandas(s, preserve_index=False).replace_schema_metadata(
            None
        )

    def final_topk(g):
        out = trim(g).drop(columns=["_h", "_bucket"])
        return pa.Table.from_pandas(out, preserve_index=False).replace_schema_metadata(
            None
        )

    return (
        ds.map_batches(add_hash, batch_format="pyarrow")
        .map_batches(partial_topk, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(final_topk, batch_format="pandas")
    )


def weighted_sample_k(
    ds: rd.Dataset,
    key_col: str,
    weight_col: str,
    k: int,
    *,
    salt: str = "",
) -> rd.Dataset:
    """Exactly-k WEIGHTED sample without replacement (Efraimidis &
    Spirakis 2006): inclusion probability proportional to the weight,
    via the order key ``-ln(u) / w`` with the uniform u derived from
    the salted mixed hash — deterministic, shuffle-free (per-batch
    partial top-k, k x blocks global sort), rerun- and
    partitioning-stable, and SQL-mirrored (same ln expression) so the
    oracle reproduces the exact row set."""

    def local_topk(batch: pa.Table) -> pa.Table:
        keys = pc.binary_join_element_wise(
            pa.scalar(salt),
            pc.cast(batch.column(key_col), pa.string()),
            pa.scalar(""),
        )
        mixed = _mixed_hash(_poly_hash(keys))
        u = (mixed.astype(np.float64) + 1.0) / (FP_MOD + 1.0)  # (0, 1]
        w = np.maximum(
            batch.column(weight_col).to_numpy(zero_copy_only=False).astype(
                np.float64
            ),
            1e-30,
        )
        ekey = -np.log(u) / w
        t = batch.append_column("_e", pa.array(ekey, pa.float64()))
        if t.num_rows > k:
            order = pc.sort_indices(
                t, sort_keys=[("_e", "ascending"), (key_col, "ascending")]
            )
            t = t.take(order[:k])
        return t

    return (
        ds.map_batches(local_topk, batch_format="pyarrow")
        .sort(["_e", key_col])
        .limit(k)
        .map_batches(lambda b: b.drop_columns(["_e"]), batch_format="pyarrow")
    )


def stratified_sample(
    ds: rd.Dataset,
    key_col: str,
    group_col: str,
    rates_permille: dict,
    *,
    default_permille: int = 0,
    salt: str = "strat:",
) -> rd.Dataset:
    """Per-STRATUM rate split (the multilingual-corpus construction
    op: oversample low-resource languages, downsample the head): keep
    a row iff its salted hash band falls below the row's GROUP rate —
    :func:`hash_sample` with a per-group threshold. The rate table is
    captured by value (strata tables are vocabulary-sized); unlisted
    groups get ``default_permille``. Shuffle-free, rerun- and
    partitioning-stable, SQL-mirrored (CASE over the same cubed
    polynomial)."""
    groups = pa.array(list(rates_permille.keys()), pa.string())
    rates = np.asarray(list(rates_permille.values()), dtype=np.int64)

    def keep(batch: pa.Table) -> pa.Table:
        keys = pc.binary_join_element_wise(
            pa.scalar(salt),
            pc.cast(batch.column(key_col), pa.string()),
            pa.scalar(""),
        )
        band = _mixed_hash(_poly_hash(keys)) % 1000
        gi = pc.index_in(batch.column(group_col), groups)
        gi_np = gi.to_numpy(zero_copy_only=False)
        thr = np.where(
            np.isnan(gi_np.astype(np.float64)),
            default_permille,
            rates[np.nan_to_num(gi_np, nan=0).astype(np.int64)],
        )
        return batch.filter(pa.array(band < thr))

    return ds.map_batches(keep, batch_format="pyarrow")


def source_temperature_weights(
    ds: rd.Dataset, group_col: str, *, alpha_sqrt: bool = True
) -> pa.Table:
    """Temperature-flattened mixture weights (the multilingual LM
    sampling rule p_i ∝ n_i^alpha, Conneau 2019): per-group doc
    counts -> alpha = 0.5 weights -> parts-per-million shares. Uses
    sqrt (IEEE-exact) rather than an arbitrary pow so the float path
    is bit-replayable in SQL; the share denominator sums in
    group-name order on both sides. Distributed count aggregate; the
    final normalization touches only group-cardinality rows."""
    from vietnamese_ocr_ray.functions.agg import hash_aggregate

    counts = (
        hash_aggregate(
            ds.select_columns([group_col]), [group_col], {"n_docs": (group_col, "count")}
        )
        .to_pandas()
        .sort_values(group_col, kind="stable")
        .reset_index(drop=True)
    )
    w = np.sqrt(counts["n_docs"].to_numpy(np.float64))
    total = float(np.sum(w))  # name-ordered sum — replayed verbatim in SQL
    ppm = np.floor(1e6 * w / total + 0.5).astype(np.int64)
    return pa.table(
        {
            group_col: pa.array(counts[group_col].astype(str), pa.string()),
            "n_docs": pa.array(counts["n_docs"].to_numpy(np.int64)),
            "weight_ppm": pa.array(ppm),
        }
    )


def source_epochs(
    ds: rd.Dataset,
    *,
    budget_factor: int = 2,
    cap: float = 4.0,
) -> pa.Table:
    """Data-recipe repetition factors (the LLaMA-style mixing table):
    token budget B = budget_factor x corpus tokens is apportioned to
    sources by temperature-flattened weights (p_i ∝ sqrt(tokens_i),
    the source_temperature_weights rule over TOKENS), and each
    source's epoch count is its target divided by its own tokens,
    capped at ``cap`` (never repeat a tiny source unboundedly).

    Exactness: token counts are exact ints; the sqrt weights are
    IEEE-exact; ppm shares and targets use integer floor(x + 0.5) /
    floor division; the final epochs value is one least()/division
    expression replayed verbatim in SQL.

    Scale shape: ONE pruned corpus pass of per-batch (source, tokens)
    partials into a bucketed aggregate; the finish touches
    |sources| rows on the driver."""
    from vietnamese_ocr_ray.functions.agg import hash_aggregate

    def partial(batch: pa.Table) -> pa.Table:
        nt = pc.list_value_length(
            pc.split_pattern(batch.column("text"), " ")
        ).cast(pa.int64())
        t = pa.table({"source": batch.column("source"), "n": nt})
        return (
            t.group_by("source")
            .aggregate([("n", "sum")])
            .rename_columns(["source", "n"])
        )

    counts = (
        hash_aggregate(
            ds.map_batches(partial, batch_format="pyarrow"),
            ["source"],
            {"n_tokens": ("n", "sum")},
            num_buckets=4,
        )
        .to_pandas()
        .sort_values("source", kind="stable")
        .reset_index(drop=True)
    )
    n = counts["n_tokens"].to_numpy(np.int64)
    w = np.sqrt(n.astype(np.float64))
    total_w = float(np.sum(w))  # name-ordered sum — replayed in SQL
    ppm = np.floor(1e6 * w / total_w + 0.5).astype(np.int64)
    budget = int(budget_factor) * int(n.sum())
    target = budget * ppm // 1_000_000
    epochs = np.minimum(
        float(cap), target.astype(np.float64) / n.astype(np.float64)
    )
    return pa.table(
        {
            "source": pa.array(counts["source"].astype(str), pa.string()),
            "n_tokens": pa.array(n),
            "weight_ppm": pa.array(ppm),
            "target_tokens": pa.array(target),
            "epochs": pa.array(np.round(epochs, 6), pa.float64()),
        }
    )


def grouped_split(
    ds: rd.Dataset,
    group_col: str = "user_id",
    *,
    val_buckets: int = 1,
    test_buckets: int = 1,
    n_buckets: int = 10,
) -> rd.Dataset:
    """GROUP-LEVEL train/val/test assignment: every row of one group
    (user) lands in the SAME split — the leakage-free split an
    event/interaction dataset needs (a row-level split leaks a user's
    behavior across train and eval; time_split_leakage measures that
    failure, this op prevents it). Split = splitmix64(group) % 10:
    buckets 0..7 train, 8 val, 9 test by default.

    Output per (split, event_type): rows and exact DISTINCT group
    count, plus ``leaked_groups`` — groups seen in more than one split
    (0 by construction; emitted as a DATA-derived audit, not an
    assumption, so a regression in the hash path would surface here).

    Shape: one stateless assignment pass; distinct-group counts ride a
    (group, split, type)-bounded aggregate; everything integer."""
    from vietnamese_ocr_ray.functions.agg import hash_aggregate
    from vietnamese_ocr_ray.functions.joins import _mix64

    train_hi = n_buckets - val_buckets - test_buckets

    def assign(b: pa.Table) -> pa.Table:
        g = b.column(group_col).to_numpy(zero_copy_only=False).astype(np.int64)
        bucket = (_mix64(g) % np.uint64(n_buckets)).astype(np.int64)
        split = np.where(
            bucket < train_hi,
            0,
            np.where(bucket < train_hi + val_buckets, 1, 2),
        ).astype(np.int64)
        return pa.table(
            {
                "grp": pa.array(g),
                "split": pa.array(split),
                "event_type": b.column("event_type"),
                "n": pa.array(np.ones(len(g), np.int64)),
            }
        )

    rows = ds.map_batches(assign, batch_format="pyarrow")
    per_grp = hash_aggregate(
        rows, ["grp", "split", "event_type"], {"n_rows": ("n", "sum")}
    )

    def summarize(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "split": b.column("split"),
                "event_type": b.column("event_type"),
                "n_rows": b.column("n_rows"),
                "one": pa.array(np.ones(b.num_rows, np.int64)),
            }
        )
        g = t.group_by(["split", "event_type"]).aggregate(
            [("n_rows", "sum"), ("one", "sum")]
        )
        return g.rename_columns(["split", "event_type", "n_rows", "n_groups"])

    from ray.data.aggregate import Sum

    per_split = (
        per_grp.map_batches(summarize, batch_format="pyarrow")
        .groupby(["split", "event_type"])
        .aggregate(Sum("n_rows", alias_name="n_rows"),
                   Sum("n_groups", alias_name="n_groups"))
    )

    # leakage audit: a group with >1 DISTINCT split (must be 0).
    # Two-stage: global (grp, split) dedup first — a per-batch dedup
    # alone would recount the same split seen from two batches
    grp_split = hash_aggregate(
        per_grp.map_batches(
            lambda b: pa.table(
                {"grp": b.column("grp"), "split": b.column("split")}
            ),
            batch_format="pyarrow",
        ),
        ["grp", "split"],
        {"_n": ("split", "count")},
    )
    leak_partial = hash_aggregate(
        grp_split, ["grp"], {"n_splits": ("split", "count")}
    )
    agg_res = leak_partial.map_batches(
        lambda b: pa.table(
            {
                "l": pa.array(
                    [
                        int(
                            (
                                pc.cast(b.column("n_splits"), pa.int64())
                                .to_numpy(zero_copy_only=False)
                                > 1
                            ).sum()
                        )
                    ],
                    pa.int64(),
                )
            }
        ),
        batch_format="pyarrow",
    ).aggregate(Sum("l", alias_name="l"))
    leaked = int(agg_res.get("l", agg_res.get("sum(l)", 0)))

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "split": pc.cast(t.column("split"), pa.int64()),
                "event_type": t.column("event_type"),
                "n_rows": pc.cast(t.column("n_rows"), pa.int64()),
                "n_groups": pc.cast(t.column("n_groups"), pa.int64()),
                "leaked_groups": pa.array(
                    np.full(t.num_rows, leaked, np.int64)
                ),
            }
        )

    return per_split.map_batches(finish, batch_format="pyarrow")
