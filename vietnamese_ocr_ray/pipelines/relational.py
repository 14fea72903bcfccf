"""Relational operator demos over the TPC-H-ish driver tables —
filter/project/aggregate/sort/join/window expressed Ray-Data-first.

Numeric discipline for oracle comparability: monetary sums are
accumulated as exact integers (cents / basis points) so Ray and DuckDB
produce bit-identical doubles after one final division — never compare
independently-accumulated floating sums.

Aggregations pre-aggregate inside map_batches (one partial row per key
per batch) before the small groupby — the partial/combiner pattern that
keeps the all-to-all exchange tiny at scale.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from ray.data.aggregate import Count, Max, Sum

from vietnamese_ocr_ray.sources.storage import read_parquet_clean


def _cents(arr, scale: int) -> pa.Array:
    """round(x * scale) as int64 — exact for fixed-decimal inputs."""
    return pc.cast(pc.round(pc.multiply(arr, pa.scalar(float(scale)))), pa.int64())


def _chunk2(col):
    """Combine a possibly-chunked column to one Array."""
    return col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col


def pricing_summary(sf_dir: str, cutoff: str = "1998-09-01") -> rd.Dataset:
    """TPC-H Q1 shape: filter shipdate < cutoff, group by
    (returnflag, linestatus), exact-integer sums + derived averages.

    Partial aggregation: each batch emits one row per key; the shuffle
    moves O(keys * blocks) rows, not O(rows). The finish (divisions to
    doubles) runs as a map_batches projection so the result streams out
    as a Dataset like every other relational query — no driver-side
    materialization.
    """
    cut = np.datetime64(cutoff, "us")
    ds = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=[
            "l_returnflag",
            "l_linestatus",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
            "l_shipdate",
        ],
        # row filter pushed into the parquet scanner: non-matching rows
        # (and whole row groups, via statistics) never leave storage
        filter=pc.field("l_shipdate") < cut,
    )

    def partial(batch: pa.Table) -> pa.Table:
        b = batch
        qty = _cents(b.column("l_quantity"), 1)
        price_c = _cents(b.column("l_extendedprice"), 100)
        disc_bp = _cents(b.column("l_discount"), 100)
        # revenue in 1e-4 units: price_cents * (100 - disc_hundredths)
        rev = pc.multiply(price_c, pc.subtract(pa.scalar(100, pa.int64()), disc_bp))
        t = pa.table(
            {
                "l_returnflag": b.column("l_returnflag"),
                "l_linestatus": b.column("l_linestatus"),
                "q": qty,
                "p": price_c,
                "r": rev,
            }
        )
        g = t.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [("q", "sum"), ("p", "sum"), ("r", "sum"), ("q", "count")]
        )
        return g.rename_columns(
            ["l_returnflag", "l_linestatus", "q", "p", "r", "n"]
        )

    partials = ds.map_batches(partial, batch_format="pyarrow")
    final = partials.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        Sum("q", alias_name="sq"),
        Sum("p", alias_name="sp"),
        Sum("r", alias_name="sr"),
        Sum("n", alias_name="n"),
    )

    def finish(t: pa.Table) -> pa.Table:
        sq = pc.cast(t.column("sq"), pa.int64())
        sp = pc.cast(t.column("sp"), pa.int64())
        sr = pc.cast(t.column("sr"), pa.int64())
        n = pc.cast(t.column("n"), pa.int64())
        sq_f = pc.cast(sq, pa.float64())
        sp_f = pc.cast(sp, pa.float64())
        n_f = pc.cast(n, pa.float64())
        base_price = pc.divide(sp_f, pa.scalar(100.0))
        return pa.table(
            {
                "l_returnflag": t.column("l_returnflag"),
                "l_linestatus": t.column("l_linestatus"),
                # float64, not int64: the oracle's sum(l_quantity) is a
                # DOUBLE sum, and the driver's value-hash is
                # dtype-sensitive (int 5 != float 5.0). Whole-number
                # quantities make the cast exact below 2^53.
                "sum_qty": sq_f,
                "sum_base_price": base_price,
                "sum_disc_price": pc.divide(
                    pc.cast(sr, pa.float64()), pa.scalar(10000.0)
                ),
                "count_order": n,
                "avg_qty": pc.divide(sq_f, n_f),
                "avg_price": pc.divide(base_price, n_f),
            }
        )

    return final.map_batches(finish, batch_format="pyarrow")


def top_revenue_orders(sf_dir: str, k: int = 10) -> rd.Dataset:
    """Revenue per order (exact integer units) -> global top-k:
    per-batch partial sums, small groupby, sort+limit."""
    ds = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
    )

    def partial(batch: pa.Table) -> pa.Table:
        price_c = _cents(batch.column("l_extendedprice"), 100)
        disc = _cents(batch.column("l_discount"), 100)
        rev = pc.multiply(price_c, pc.subtract(pa.scalar(100, pa.int64()), disc))
        t = pa.table({"l_orderkey": batch.column("l_orderkey"), "rev": rev})
        return t.group_by("l_orderkey").aggregate([("rev", "sum")]).rename_columns(
            ["l_orderkey", "rev"]
        )

    # 150k distinct orders: Ray's sort-aggregate pays per-GROUP Python
    # in the reduce (~5 s here); the bucketed hash aggregate reduces
    # per BUCKET with one vectorized pandas groupby (~2 s, same result)
    from vietnamese_ocr_ray.functions.agg import hash_aggregate

    per_order = hash_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["l_orderkey"],
        {"rev_units": ("rev", "sum")},
    )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_orderkey": batch.column("l_orderkey"),
                "revenue": pc.divide(
                    pc.cast(batch.column("rev_units"), pa.float64()),
                    pa.scalar(10000.0),
                ),
            }
        )

    return per_order.map_batches(finish, batch_format="pyarrow").sort(
        ["revenue", "l_orderkey"], descending=[True, False]
    ).limit(k)


def nation_customer_stats(sf_dir: str) -> rd.Dataset:
    """Broadcast inner join (J1 analog — the reference's filename ->
    label dict probe, src/utils/vocab.py:22): customer x nation x
    region with the small sides shipped once via ray.put, then a
    pre-aggregated groupby."""
    import ray

    nation = pa.Table.from_pandas(
        pd.read_parquet(f"{sf_dir}/nation.parquet"), preserve_index=False
    )
    region = pa.Table.from_pandas(
        pd.read_parquet(f"{sf_dir}/region.parquet"), preserve_index=False
    )
    lut = nation.to_pandas().merge(
        region.to_pandas(), left_on="n_regionkey", right_on="r_regionkey"
    )[["n_nationkey", "n_name", "r_name"]]
    handle = ray.put(lut)

    class JoinNation:
        def __init__(self):
            self.lut = ray.get(handle)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            m = batch.merge(
                self.lut, left_on="c_nationkey", right_on="n_nationkey"
            )
            m["acctbal_c"] = (m["c_acctbal"] * 100).round().astype("int64")
            g = m.groupby(["n_name", "r_name"], as_index=False).agg(
                n_customers=("c_custkey", "size"), bal=("acctbal_c", "sum")
            )
            return g

    ds = read_parquet_clean(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_nationkey", "c_acctbal"],
    )
    partials = ds.map_batches(JoinNation, batch_format="pandas", concurrency=(1, 4))
    final = partials.groupby(["n_name", "r_name"]).aggregate(
        Sum("n_customers", alias_name="n_customers"),
        Sum("bal", alias_name="bal_units"),
    )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "n_name": batch.column("n_name"),
                "r_name": batch.column("r_name"),
                "n_customers": batch.column("n_customers"),
                "total_acctbal": pc.divide(
                    pc.cast(batch.column("bal_units"), pa.float64()),
                    pa.scalar(100.0),
                ),
            }
        )

    return final.map_batches(finish, batch_format="pyarrow")


def order_priority_counts(sf_dir: str) -> rd.Dataset:
    """Large-side hash join demo: orders x customer (Dataset.join) ->
    counts per (mktsegment, orderpriority)."""
    orders = read_parquet_clean(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey", "o_orderpriority"]
    )
    customer = read_parquet_clean(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    )
    joined = orders.join(
        customer,
        join_type="inner",
        num_partitions=8,
        on=("o_custkey",),
        right_on=("c_custkey",),
    )
    return (
        joined.groupby(["c_mktsegment", "o_orderpriority"])
        .aggregate(Count(alias_name="n_orders"))
    )


def window_aggregate(sf_dir: str, window_sec: int = 3600) -> rd.Dataset:
    """Tumbling event-time window (streaming-shaped op the reference
    lacks; Ray Data has no watermarks so this is batch windowing):
    floor(epoch/window) per event_type, count + exact-integer value sum."""
    ds = read_parquet_clean(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type", "value"]
    )

    def add_window(batch: pa.Table) -> pa.Table:
        epoch = pc.divide(
            pc.cast(batch.column("ts"), pa.int64()), pa.scalar(1_000_000)
        )  # us -> s
        win = pc.multiply(
            pc.floor(
                pc.divide(pc.cast(epoch, pa.float64()), pa.scalar(float(window_sec)))
            ),
            pa.scalar(float(window_sec)),
        )
        return pa.table(
            {
                "event_type": batch.column("event_type"),
                "window_start": pc.cast(win, pa.int64()),
                "value_c": _cents(batch.column("value"), 1000),
            }
        )

    return (
        ds.map_batches(add_window, batch_format="pyarrow")
        .groupby(["event_type", "window_start"])
        .aggregate(Count(alias_name="n_events"), Sum("value_c", alias_name="value_units"))
        .map_batches(
            lambda b: pa.table(
                {
                    "event_type": b.column("event_type"),
                    "window_start": b.column("window_start"),
                    "n_events": b.column("n_events"),
                    "sum_value": pc.divide(
                        pc.cast(b.column("value_units"), pa.float64()),
                        pa.scalar(1000.0),
                    ),
                }
            ),
            batch_format="pyarrow",
        )
    )


def sliding_window_aggregate(
    sf_dir: str, size_sec: int = 7200, step_sec: int = 3600
) -> rd.Dataset:
    """Sliding event-time windows (size 2h, step 1h): each event lands
    in size/step windows — the explode is a vectorized row duplication
    inside map_batches, then the same pre-aggregated groupby as the
    tumbling case. (Ray Data has no watermarks; this is batch windowing
    over the full log.)"""
    assert size_sec % step_sec == 0
    per_event = size_sec // step_sec
    ds = read_parquet_clean(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type", "value"]
    )

    def explode_windows(batch: pa.Table) -> pa.Table:
        epoch = pc.divide(
            pc.cast(batch.column("ts"), pa.int64()), pa.scalar(1_000_000)
        )
        sec = np.asarray(epoch)
        base = (sec // step_sec) * step_sec
        n = batch.num_rows
        # window starts: base - k*step for k in 0..per_event-1
        starts = (
            base[:, None] - np.arange(per_event, dtype=np.int64)[None, :] * step_sec
        ).reshape(-1)
        etype = pc.take(
            batch.column("event_type"),
            pa.array(np.repeat(np.arange(n, dtype=np.int64), per_event)),
        )
        vals = np.repeat(
            np.asarray(_cents(batch.column("value"), 1000)), per_event
        )
        return pa.table(
            {
                "event_type": etype,
                "window_start": pa.array(starts),
                "value_c": pa.array(vals),
            }
        )

    return (
        ds.map_batches(explode_windows, batch_format="pyarrow")
        .groupby(["event_type", "window_start"])
        .aggregate(Count(alias_name="n_events"), Sum("value_c", alias_name="value_units"))
        .map_batches(
            lambda b: pa.table(
                {
                    "event_type": b.column("event_type"),
                    "window_start": b.column("window_start"),
                    "n_events": b.column("n_events"),
                    "sum_value": pc.divide(
                        pc.cast(b.column("value_units"), pa.float64()),
                        pa.scalar(1000.0),
                    ),
                }
            ),
            batch_format="pyarrow",
        )
    )


def sessionize(sf_dir: str, gap_sec: int = 1800, num_buckets: int = 32) -> rd.Dataset:
    """Session windows per user (gap-based). Shuffle on
    key_bucket(user_id) — NOT per-user groups — and reduce each bucket
    with one vectorized pass: sort by (user, ts), flag session starts
    (first row of a user, or gap > threshold), one cython groupby-sum
    of the flags. Per-group Python never runs; a bucket's users must
    fit one task's heap (salt/split upstream otherwise)."""
    from vietnamese_ocr_ray.functions.joins import key_bucket

    ds = read_parquet_clean(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])

    def add_bucket(b: pa.Table) -> pa.Table:
        return b.append_column(
            "_bucket",
            pa.array(key_bucket(b.column("user_id"), num_buckets).astype(np.int32)),
        )

    def count_sessions(g: pd.DataFrame) -> pd.DataFrame:
        s = g.sort_values(["user_id", "ts"], kind="stable")
        ts = s["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        user = s["user_id"].to_numpy()
        new_session = np.ones(len(s), dtype=np.int64)
        same_user = user[1:] == user[:-1]
        small_gap = (ts[1:] - ts[:-1]) <= gap_sec * 1_000_000
        new_session[1:][same_user & small_gap] = 0
        return (
            pd.DataFrame({"user_id": user, "n_sessions": new_session})
            .groupby("user_id", as_index=False, sort=False)["n_sessions"]
            .sum()
        )

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(
            lambda g: count_sessions(g.drop(columns=["_bucket"])),
            batch_format="pandas",
        )
    )


def event_type_stats(sf_dir: str) -> rd.Dataset:
    """Mean aggregate (A4 analog, src/utils/statistic.py:8-14): exact
    integer sum + count per event_type, one final division."""
    ds = read_parquet_clean(f"{sf_dir}/events.parquet", columns=["event_type", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "event_type": batch.column("event_type"),
                "v": _cents(batch.column("value"), 1000),
            }
        )
        return t.group_by("event_type").aggregate(
            [("v", "sum"), ("v", "count")]
        ).rename_columns(["event_type", "v", "n"])

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(Sum("v", alias_name="v"), Sum("n", alias_name="n"))
        .map_batches(
            lambda b: pa.table(
                {
                    "event_type": b.column("event_type"),
                    "n_events": b.column("n"),
                    "avg_value": pc.divide(
                        pc.divide(pc.cast(b.column("v"), pa.float64()), pa.scalar(1000.0)),
                        pc.cast(b.column("n"), pa.float64()),
                    ),
                }
            ),
            batch_format="pyarrow",
        )
    )


def parts_by_brand(sf_dir: str) -> rd.Dataset:
    """Projection + grouped aggregate over part: count, max size and
    exact-integer average retail price per brand."""
    ds = read_parquet_clean(
        f"{sf_dir}/part.parquet", columns=["p_brand", "p_size", "p_retailprice"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "p_brand": batch.column("p_brand"),
                "price_c": _cents(batch.column("p_retailprice"), 100),
                "p_size": batch.column("p_size"),
            }
        )
        return t.group_by("p_brand").aggregate(
            [("price_c", "sum"), ("p_size", "max"), ("p_size", "count")]
        ).rename_columns(["p_brand", "price_c", "max_size", "n"])

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("p_brand")
        .aggregate(
            Sum("price_c", alias_name="price_units"),
            Max("max_size", alias_name="max_size"),
            Sum("n", alias_name="n_parts"),
        )
        .map_batches(
            lambda b: pa.table(
                {
                    "p_brand": b.column("p_brand"),
                    "n_parts": b.column("n_parts"),
                    "max_size": pc.cast(b.column("max_size"), pa.int64()),
                    "avg_price": pc.divide(
                        pc.divide(
                            pc.cast(b.column("price_units"), pa.float64()),
                            pa.scalar(100.0),
                        ),
                        pc.cast(b.column("n_parts"), pa.float64()),
                    ),
                }
            ),
            batch_format="pyarrow",
        )
    )


def supplier_nation_balance(sf_dir: str) -> rd.Dataset:
    """supplier x nation broadcast join -> per-nation supplier count and
    exact-integer total account balance."""
    import ray

    nation = pd.read_parquet(f"{sf_dir}/nation.parquet")[["n_nationkey", "n_name"]]
    handle = ray.put(nation)

    class JoinNation:
        def __init__(self):
            self.lut = ray.get(handle)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            m = batch.merge(self.lut, left_on="s_nationkey", right_on="n_nationkey")
            m["bal_c"] = (m["s_acctbal"] * 100).round().astype("int64")
            return m.groupby("n_name", as_index=False).agg(
                n_suppliers=("s_suppkey", "size"), bal_c=("bal_c", "sum")
            )

    ds = read_parquet_clean(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey", "s_acctbal"]
    )
    return (
        ds.map_batches(JoinNation, batch_format="pandas", concurrency=(1, 4))
        .groupby("n_name")
        .aggregate(
            Sum("n_suppliers", alias_name="n_suppliers"),
            Sum("bal_c", alias_name="bal_units"),
        )
        .map_batches(
            lambda b: pa.table(
                {
                    "n_name": b.column("n_name"),
                    "n_suppliers": b.column("n_suppliers"),
                    "total_acctbal": pc.divide(
                        pc.cast(b.column("bal_units"), pa.float64()), pa.scalar(100.0)
                    ),
                }
            ),
            batch_format="pyarrow",
        )
    )


def orders_by_month(sf_dir: str) -> rd.Dataset:
    """Date-function coverage: orders per month (YYYY-MM string) and
    exact-integer total price."""
    ds = read_parquet_clean(
        f"{sf_dir}/orders.parquet", columns=["o_orderdate", "o_totalprice"]
    )

    def add_month(batch: pa.Table) -> pa.Table:
        months = (
            np.asarray(batch.column("o_orderdate"))
            .astype("datetime64[M]")
            .astype(str)
        )
        return pa.table(
            {
                "month": pa.array(months, pa.string()),
                "price_c": _cents(batch.column("o_totalprice"), 100),
            }
        )

    return (
        ds.map_batches(add_month, batch_format="pyarrow")
        .groupby("month")
        .aggregate(Count(alias_name="n_orders"), Sum("price_c", alias_name="price_units"))
        .map_batches(
            lambda b: pa.table(
                {
                    "month": b.column("month"),
                    "n_orders": b.column("n_orders"),
                    "total_price": pc.divide(
                        pc.cast(b.column("price_units"), pa.float64()),
                        pa.scalar(100.0),
                    ),
                }
            ),
            batch_format="pyarrow",
        )
    )


def value_quantiles(sf_dir: str, num_buckets: int = 8) -> rd.Dataset:
    """Grouped exact quantiles (p50/p95 of value per event_type):
    shuffle on key_bucket(event_type), then ONE vectorized pass per
    bucket — sort by (key, value), locate group boundaries, and
    linear-interpolate every group's quantiles at once (numpy's exact
    type-7 lerp, the SQL quantile_cont definition, so results match
    bit-for-bit after rounding). Scale path for huge groups:
    t-digest/KLL sketches (functions/sketch.py) instead of the exact
    per-group sort."""
    from vietnamese_ocr_ray.functions.joins import key_bucket

    ds = read_parquet_clean(f"{sf_dir}/events.parquet", columns=["event_type", "value"])

    def add_bucket(b: pa.Table) -> pa.Table:
        return b.append_column(
            "_bucket",
            pa.array(
                key_bucket(b.column("event_type"), num_buckets).astype(np.int32)
            ),
        )

    def q(g: pd.DataFrame) -> pd.DataFrame:
        s = g.sort_values(["event_type", "value"], kind="stable")
        v = s["value"].to_numpy()
        keys = s["event_type"].to_numpy()
        starts = np.nonzero(
            np.concatenate([[True], keys[1:] != keys[:-1]])
        )[0]
        cnt = np.diff(np.concatenate([starts, [len(v)]]))
        out = {"event_type": keys[starts]}
        for frac, name in ((0.5, "p50"), (0.95, "p95")):
            pos = frac * (cnt - 1)
            lo = np.floor(pos).astype(np.int64)
            t = pos - lo
            hi = np.minimum(lo + 1, cnt - 1)
            a, b = v[starts + lo], v[starts + hi]
            diff = b - a
            r = a + diff * t
            m = t >= 0.5  # numpy _lerp's symmetric branch — bit-exact
            r[m] = b[m] - diff[m] * (1.0 - t[m])
            out[name] = [round(float(x), 6) for x in r]  # rows = groups
        return pd.DataFrame(out)

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(
            lambda g: q(g.drop(columns=["_bucket"])), batch_format="pandas"
        )
    )


def value_winsorized(sf_dir: str, lo_q: float = 0.05, hi_q: float = 0.95) -> rd.Dataset:
    """Per-group winsorization (robust-stats outlier clipping): each
    event's value clipped to its event_type's exact [p05, p95]. Two
    phases: (1) the value_quantiles machinery computes per-type exact
    lerp quantiles — the collected bounds table is GROUP-cardinality
    (handful of rows), the legitimate driver-side materialization; (2)
    a shuffle-free broadcast clip pass over the stream. Oracle:
    quantile_cont per type (bit-equal to the numpy lerp) + least/
    greatest."""
    from vietnamese_ocr_ray.functions.joins import key_bucket

    ds = read_parquet_clean(
        f"{sf_dir}/events.parquet", columns=["event_id", "event_type", "value"]
    )

    def add_bucket(b: pa.Table) -> pa.Table:
        return b.append_column(
            "_bucket",
            pa.array(key_bucket(b.column("event_type"), 8).astype(np.int32)),
        )

    def q(g: pd.DataFrame) -> pd.DataFrame:
        s = g.sort_values(["event_type", "value"], kind="stable")
        v = s["value"].to_numpy()
        keys = s["event_type"].to_numpy()
        starts = np.nonzero(np.concatenate([[True], keys[1:] != keys[:-1]]))[0]
        cnt = np.diff(np.concatenate([starts, [len(v)]]))
        out = {"event_type": keys[starts]}
        for frac, name in ((lo_q, "lo"), (hi_q, "hi")):
            pos = frac * (cnt - 1)
            lo = np.floor(pos).astype(np.int64)
            t = pos - lo
            hi = np.minimum(lo + 1, cnt - 1)
            a, b = v[starts + lo], v[starts + hi]
            diff = b - a
            r = a + diff * t
            m = t >= 0.5  # numpy _lerp's symmetric branch — bit-exact
            r[m] = b[m] - diff[m] * (1.0 - t[m])
            out[name] = r
        return pd.DataFrame(out)

    bounds = (
        ds.drop_columns(["event_id"])
        .map_batches(add_bucket, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(lambda g: q(g.drop(columns=["_bucket"])), batch_format="pandas")
        .to_pandas()
    )
    types = pa.array(bounds["event_type"].astype(str), pa.string())
    lo_v = bounds["lo"].to_numpy(np.float64)
    hi_v = bounds["hi"].to_numpy(np.float64)

    def clip(b: pa.Table) -> pa.Table:
        gi = pc.index_in(b.column("event_type"), types).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        v = b.column("value").to_numpy(zero_copy_only=False)
        w = np.minimum(np.maximum(v, lo_v[gi]), hi_v[gi])
        return pa.table(
            {
                "event_id": b.column("event_id"),
                "event_type": b.column("event_type"),
                "value": b.column("value"),
                "value_w": pa.array(np.round(w, 6)),
            }
        )

    return ds.map_batches(clip, batch_format="pyarrow")


def max_doc_len(sf_dir: str) -> rd.Dataset:
    """Global/grouped max (A3 analog, src/utils/vocab.py:16-19)."""
    ds = read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["lang", "n_chars"])
    return ds.groupby("lang").aggregate(
        Max("n_chars", alias_name="max_chars"), Count(alias_name="n_docs")
    )


def split_sample(sf_dir: str, seed: int = 42, train_frac: float = 0.99) -> pa.Table:
    """Seeded shuffle + proportional split (O2 analog,
    src/utils/dataloader.py:18-21): returns split sizes (the split
    CONTENT is seed-dependent; the sizes are exact)."""
    ds = read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    n = ds.count()
    n_train = int(n * train_frac)
    shuffled = ds.random_shuffle(seed=seed)
    train, val = shuffled.split_at_indices([n_train])
    return pa.table(
        {
            "split": pa.array(["train", "val"]),
            "n_rows": pa.array([train.count(), val.count()], pa.int64()),
        }
    )


def purchase_attribution(sf_dir: str) -> rd.Dataset:
    """As-of join demo (marketing attribution): each purchase event is
    matched to the SAME user's most recent STRICTLY-prior click.
    Oracle: DuckDB ``ASOF JOIN`` with ``l.ts > r.ts``.

    Both sides come off the parquet scanner with the event_type filter
    pushed down — non-matching row groups never leave storage."""
    from vietnamese_ocr_ray.functions.joins import asof_join

    cols = ["event_id", "user_id", "ts"]
    purchases = read_parquet_clean(
        f"{sf_dir}/events.parquet",
        columns=cols,
        filter=pc.field("event_type") == "purchase",
    )
    clicks = read_parquet_clean(
        f"{sf_dir}/events.parquet",
        columns=cols,
        filter=pc.field("event_type") == "click",
    ).map_batches(
        lambda b: b.rename_columns(["click_event_id", "user_id", "click_ts"]),
        batch_format="pyarrow",
    )
    joined = asof_join(
        purchases,
        clicks,
        by="user_id",
        left_on="ts",
        right_on="click_ts",
        strict=True,
    )

    def finish(b: pa.Table) -> pa.Table:
        gap = pc.subtract(
            pc.cast(b.column("ts"), pa.int64()),
            pc.cast(b.column("click_ts"), pa.int64()),
        )
        return pa.table(
            {
                "event_id": b.column("event_id"),
                "user_id": b.column("user_id"),
                "ts": b.column("ts"),
                "click_event_id": b.column("click_event_id"),
                "gap_us": gap,
            }
        )

    return joined.map_batches(finish, batch_format="pyarrow")


def top_events_per_type(sf_dir: str, k: int = 3) -> rd.Dataset:
    """Top-k per group with a partial-top-k combiner: each batch keeps
    at most k rows per event_type (so the shuffle moves O(k * types *
    blocks) rows, not O(rows)), then one tiny per-type group finishes.
    Ties break on event_id for a deterministic result."""
    ds = read_parquet_clean(
        f"{sf_dir}/events.parquet", columns=["event_type", "event_id", "value"]
    )

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        s = batch.sort_values(
            ["event_type", "value", "event_id"],
            ascending=[True, False, True],
            kind="stable",
        )
        return s.groupby("event_type", sort=False).head(k)

    def final(g: pd.DataFrame) -> pd.DataFrame:
        s = g.sort_values(["value", "event_id"], ascending=[False, True]).head(k)
        s = s.reset_index(drop=True)
        s["rank"] = np.arange(1, len(s) + 1, dtype=np.int64)
        return s[["event_type", "rank", "event_id", "value"]]

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("event_type")
        .map_groups(final, batch_format="pandas")
    )


def signup_click_follow(sf_dir: str) -> rd.Dataset:
    """Range-join demo: for every signup event, how many clicks the
    same user made in the following hour (left semantics — zero-click
    signups kept). Oracle: LEFT JOIN with a BETWEEN range condition."""
    from vietnamese_ocr_ray.functions.joins import range_count_join

    signups = read_parquet_clean(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "ts"],
        filter=pc.field("event_type") == "signup",
    )
    clicks = read_parquet_clean(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts"],
        filter=pc.field("event_type") == "click",
    ).map_batches(
        lambda b: b.rename_columns(["user_id", "click_ts"]),
        batch_format="pyarrow",
    )
    return range_count_join(
        signups,
        clicks,
        by="user_id",
        left_on="ts",
        right_on="click_ts",
        lo_us=0,
        hi_us=3_600_000_000,
        out_col="n_clicks_1h",
    )


def distinct_users_per_type(sf_dir: str) -> rd.Dataset:
    """Grouped COUNT DISTINCT with a partial-dedup combiner: each batch
    emits its distinct (event_type, user_id) pairs (the shuffle moves
    O(distinct pairs per block), not O(rows)), the small per-type group
    counts uniques."""
    ds = read_parquet_clean(f"{sf_dir}/events.parquet", columns=["event_type", "user_id"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.drop_duplicates(["event_type", "user_id"])

    def final(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "event_type": [g["event_type"].iloc[0]],
                "n_users": [int(g["user_id"].nunique())],
            }
        )

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("event_type")
        .map_groups(final, batch_format="pandas")
    )


def running_value_sum(sf_dir: str) -> rd.Dataset:
    """Cumulative window per key (sum OVER (PARTITION BY user ORDER BY
    ts)): shuffle on key_bucket(user_id), then ONE sort + one cython
    groupby-cumsum per bucket — per-user Python frames never exist.
    Exact-integer accumulation (value scaled to 1e-3 units) so Ray and
    the SQL window agree bit-for-bit. Partitioning assumption: a
    bucket's users fit one task's heap (salt/split upstream otherwise)."""
    ds = read_parquet_clean(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts", "value"]
    )

    from vietnamese_ocr_ray.functions.joins import key_bucket

    num_buckets = 32

    def add_bucket(b: pa.Table) -> pa.Table:
        return b.append_column(
            "_bucket",
            pa.array(key_bucket(b.column("user_id"), num_buckets).astype(np.int32)),
        )

    def cumulate(g: pd.DataFrame) -> pd.DataFrame:
        # one bucket = many users: sort once, one cython groupby-cumsum
        s = g.sort_values(["user_id", "ts", "event_id"], kind="stable")
        units = np.rint(s["value"].to_numpy() * 1000.0).astype(np.int64)
        s = s[["event_id", "user_id", "ts"]].reset_index(drop=True)
        s["running_value"] = (
            pd.Series(units).groupby(s["user_id"].to_numpy()).cumsum().to_numpy()
            / 1000.0
        )
        return s

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(
            lambda g: cumulate(g.drop(columns=["_bucket"])),
            batch_format="pandas",
        )
    )


def events_hourly(sf_dir: str) -> rd.Dataset:
    """Time-bucketed histogram (date_trunc-to-hour) with exact-integer
    value sums — the partial/combiner pattern over a derived time key."""
    ds = read_parquet_clean(f"{sf_dir}/events.parquet", columns=["ts", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch.column("ts").to_numpy(zero_copy_only=False)
        hour = ts.astype("datetime64[h]").astype("datetime64[us]")
        t = pa.table(
            {
                "hour": pa.array(hour),
                "v": _cents(batch.column("value"), 1000),
            }
        )
        return t.group_by("hour").aggregate(
            [("v", "sum"), ("v", "count")]
        ).rename_columns(["hour", "v", "n"])

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("hour")
        .aggregate(Sum("v", alias_name="v"), Sum("n", alias_name="n"))
        .map_batches(
            lambda b: pa.table(
                {
                    "hour": b.column("hour"),
                    "n_events": b.column("n"),
                    "total_value": pc.divide(
                        pc.cast(b.column("v"), pa.float64()), pa.scalar(1000.0)
                    ),
                }
            ),
            batch_format="pyarrow",
        )
    )


def order_status_pivot(sf_dir: str) -> rd.Dataset:
    """Conditional-aggregation pivot: one row per month, one count
    column per order status (the CASE-WHEN pivot shape — wide output
    from a single pass, no per-status scan)."""
    ds = read_parquet_clean(
        f"{sf_dir}/orders.parquet", columns=["o_orderdate", "o_orderstatus"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch.column("o_orderdate").to_numpy(zero_copy_only=False)
        month = ts.astype("datetime64[M]").astype("datetime64[us]")
        st = batch.column("o_orderstatus").to_numpy(zero_copy_only=False)
        t = pa.table(
            {
                "month": pa.array(month),
                "n_open": pa.array((st == "O").astype(np.int64)),
                "n_filled": pa.array((st == "F").astype(np.int64)),
                "n_partial": pa.array((st == "P").astype(np.int64)),
            }
        )
        return t.group_by("month").aggregate(
            [("n_open", "sum"), ("n_filled", "sum"), ("n_partial", "sum")]
        ).rename_columns(["month", "n_open", "n_filled", "n_partial"])

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("month")
        .aggregate(
            Sum("n_open", alias_name="n_open"),
            Sum("n_filled", alias_name="n_filled"),
            Sum("n_partial", alias_name="n_partial"),
        )
    )


def event_lag(sf_dir: str, num_buckets: int = 32) -> rd.Dataset:
    """LAG window (prev event of the same user): shuffle on
    key_bucket(user_id), ONE sort per bucket, previous-row columns via
    shifted views masked at user boundaries — rows without a
    predecessor drop (inner-lag semantics, like the SQL QUALIFY
    filter). Exact integer gap in microseconds."""
    from vietnamese_ocr_ray.functions.joins import key_bucket

    ds = read_parquet_clean(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts"]
    )

    def add_bucket(b: pa.Table) -> pa.Table:
        return b.append_column(
            "_bucket",
            pa.array(key_bucket(b.column("user_id"), num_buckets).astype(np.int32)),
        )

    def lag(g: pd.DataFrame) -> pa.Table:
        s = g.sort_values(["user_id", "ts", "event_id"], kind="stable")
        user = s["user_id"].to_numpy()
        ev = s["event_id"].to_numpy(np.int64)
        ts = s["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        same = np.zeros(len(s), dtype=bool)
        same[1:] = user[1:] == user[:-1]
        prev_ev = np.empty_like(ev)
        prev_ts = np.empty_like(ts)
        prev_ev[1:] = ev[:-1]
        prev_ts[1:] = ts[:-1]
        return pa.table(
            {
                "event_id": pa.array(ev[same]),
                "user_id": pa.array(user[same]),
                "prev_event_id": pa.array(prev_ev[same]),
                "gap_us": pa.array(ts[same] - prev_ts[same]),
            }
        )

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(
            lambda g: lag(g.drop(columns=["_bucket"])), batch_format="pandas"
        )
    )


def rolling_avg(
    sf_dir: str, window_rows: int = 4, num_buckets: int = 32
) -> rd.Dataset:
    """Rolling row-window mean per user (AVG OVER ... ROWS BETWEEN
    ``window_rows``-1 PRECEDING AND CURRENT ROW): one sort + one
    exact-integer cumsum per bucket; each row's window sum is a cumsum
    difference with the window start clamped to the user's first row
    (np.maximum.accumulate locates run starts) — zero per-row Python,
    bit-exact vs the SQL window over scaled integers."""
    from vietnamese_ocr_ray.functions.joins import key_bucket

    ds = read_parquet_clean(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts", "value"]
    )

    def add_bucket(b: pa.Table) -> pa.Table:
        return b.append_column(
            "_bucket",
            pa.array(key_bucket(b.column("user_id"), num_buckets).astype(np.int32)),
        )

    def roll(g: pd.DataFrame) -> pa.Table:
        s = g.sort_values(["user_id", "ts", "event_id"], kind="stable")
        user = s["user_id"].to_numpy()
        units = np.rint(s["value"].to_numpy() * 1000.0).astype(np.int64)
        n = len(s)
        idx = np.arange(n, dtype=np.int64)
        new_user = np.ones(n, dtype=bool)
        new_user[1:] = user[1:] != user[:-1]
        run_start = np.maximum.accumulate(np.where(new_user, idx, 0))
        lo = np.maximum(idx - (window_rows - 1), run_start)
        csum = np.concatenate([[0], np.cumsum(units)])
        win_sum = csum[idx + 1] - csum[lo]
        win_cnt = idx + 1 - lo
        return pa.table(
            {
                "event_id": pa.array(s["event_id"].to_numpy(np.int64)),
                "user_id": pa.array(user),
                "rolling_avg": pa.array(
                    win_sum / 1000.0 / win_cnt, pa.float64()
                ),
            }
        )

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(
            lambda g: roll(g.drop(columns=["_bucket"])), batch_format="pandas"
        )
    )


def click_purchase_pairs(sf_dir: str, window_sec: int = 3600) -> rd.Dataset:
    """Stream-stream interval join demo: every (click, purchase) pair
    for the same user with the purchase inside the hour after the
    click — the 1:N pair-emitting flavour (functions/joins.interval_join);
    both sides filter-pushed at the scanner."""
    from vietnamese_ocr_ray.functions.joins import interval_join

    clicks = read_parquet_clean(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "ts"],
        filter=pc.field("event_type") == "click",
    ).map_batches(
        lambda b: b.rename_columns(["click_event_id", "user_id", "click_ts"]),
        batch_format="pyarrow",
    )
    purchases = read_parquet_clean(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "ts"],
        filter=pc.field("event_type") == "purchase",
    ).map_batches(
        lambda b: b.rename_columns(
            ["purchase_event_id", "user_id", "purchase_ts"]
        ),
        batch_format="pyarrow",
    )
    return interval_join(
        clicks,
        purchases,
        by="user_id",
        left_on="click_ts",
        right_on="purchase_ts",
        window_us=window_sec * 1_000_000,
    )


def event_funnel(sf_dir: str, num_buckets: int = 32) -> rd.Dataset:
    """Click -> purchase conversion funnel WITHOUT per-user event
    scans: "did any purchase follow the user's first click?" reduces
    to mergeable extremes — ``max(purchase ts) >= min(click ts)`` —
    so the whole funnel is per-batch min/max partials plus one bucketed
    aggregate (the hash_aggregate shape), never a sorted per-user
    replay. Output: (user_id, first_click, converted) for users who
    entered the funnel (have >= 1 click)."""
    from vietnamese_ocr_ray.functions.agg import hash_aggregate

    ds = read_parquet_clean(
        f"{sf_dir}/events.parquet", columns=["ts", "user_id", "event_type"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        keep = pc.is_in(
            batch.column("event_type"),
            value_set=pa.array(["click", "purchase"], pa.string()),
        )
        b = batch.filter(keep)
        ts = b.column("ts").to_numpy(zero_copy_only=False)
        is_click = np.asarray(pc.equal(b.column("event_type"), "click"))
        # side-specific sentinels keep min/max mergeable per column
        far_future = np.datetime64("9999-01-01", "us")
        far_past = np.datetime64("1677-09-22", "us")
        t = pa.table(
            {
                "user_id": b.column("user_id"),
                "min_click": pa.array(np.where(is_click, ts, far_future)),
                "max_purch": pa.array(np.where(~is_click, ts, far_past)),
            }
        )
        return t.group_by("user_id").aggregate(
            [("min_click", "min"), ("max_purch", "max")]
        ).rename_columns(["user_id", "min_click", "max_purch"])

    agg = hash_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["user_id"],
        {"min_click": ("min_click", "min"), "max_purch": ("max_purch", "max")},
        num_buckets=num_buckets,
    )

    def finish(b: pa.Table) -> pa.Table:
        mc = b.column("min_click").to_numpy(zero_copy_only=False)
        mp = b.column("max_purch").to_numpy(zero_copy_only=False)
        far_future = np.datetime64("9999-01-01", "us")
        entered = mc < far_future  # user has at least one click
        out = pa.table(
            {
                "user_id": b.column("user_id"),
                "first_click": pa.array(mc),
                "converted": pa.array((mp >= mc).astype(np.int64)),
            }
        )
        return out.filter(pa.array(entered))

    return agg.map_batches(finish, batch_format="pyarrow")


def click_purchase_matrix(sf_dir: str, num_buckets: int = 32) -> rd.Dataset:
    """FULL OUTER join shape at scale: per-(user, hour) click counts
    against purchase counts, keys present on EITHER side kept with an
    exact 0 fill. The Ray-native formulation: a full outer join of two
    aggregates IS union + grouped sum — each side's partial rows carry
    a zero for the other side's measure, so the whole op costs ONE
    bucketed shuffle (hash_aggregate) and never builds a join hash
    table or nulls to resolve. The oracle states the same result as
    FULL OUTER JOIN + COALESCE."""
    from vietnamese_ocr_ray.functions.agg import hash_aggregate

    ds = read_parquet_clean(
        f"{sf_dir}/events.parquet", columns=["ts", "user_id", "event_type"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        et = batch.column("event_type")
        keep = pc.is_in(
            et, value_set=pa.array(["click", "purchase"], pa.string())
        )
        b = batch.filter(keep)
        ts = b.column("ts").to_numpy(zero_copy_only=False)
        is_click = np.asarray(pc.equal(b.column("event_type"), "click"))
        t = pa.table(
            {
                "user_id": b.column("user_id"),
                "hour": pa.array(ts.astype("datetime64[h]").astype("datetime64[us]")),
                "n_click": pa.array(is_click.astype(np.int64)),
                "n_purchase": pa.array((~is_click).astype(np.int64)),
            }
        )
        return t.group_by(["user_id", "hour"]).aggregate(
            [("n_click", "sum"), ("n_purchase", "sum")]
        ).rename_columns(["user_id", "hour", "n_click", "n_purchase"])

    return hash_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["user_id", "hour"],
        {"n_click": ("n_click", "sum"), "n_purchase": ("n_purchase", "sum")},
        num_buckets=num_buckets,
    )


def customer_order_counts(sf_dir: str, num_buckets: int = 32) -> rd.Dataset:
    """LEFT OUTER join shape at scale: customers with their order count,
    zero-order customers kept. The orders side pre-aggregates to one
    row per customer (bucketed hash aggregate), then both sides meet in
    a key-bucket cogroup (union + one shuffle) resolved by a vectorized
    per-bucket left merge — no broadcast assumption on either side."""
    from vietnamese_ocr_ray.functions.agg import hash_aggregate
    from vietnamese_ocr_ray.functions.joins import key_bucket

    counts = hash_aggregate(
        read_parquet_clean(
            f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderkey"]
        ),
        ["o_custkey"],
        {"n": ("o_orderkey", "count")},
        num_buckets=num_buckets,
    )
    customers = read_parquet_clean(
        f"{sf_dir}/customer.parquet", columns=["c_custkey"]
    )

    def tag_customers(b: pa.Table) -> pa.Table:
        key = b.column("c_custkey").combine_chunks() if isinstance(
            b.column("c_custkey"), pa.ChunkedArray
        ) else b.column("c_custkey")
        return pa.table(
            {
                "key": pc.cast(key, pa.int64()),
                "n": pa.nulls(b.num_rows, pa.int64()),
                "_side": pa.array(np.zeros(b.num_rows, np.int8)),
                "_bucket": pa.array(
                    key_bucket(key, num_buckets).astype(np.int32)
                ),
            }
        )

    def tag_counts(b: pa.Table) -> pa.Table:
        key = b.column("o_custkey").combine_chunks() if isinstance(
            b.column("o_custkey"), pa.ChunkedArray
        ) else b.column("o_custkey")
        return pa.table(
            {
                "key": pc.cast(key, pa.int64()),
                "n": pc.cast(b.column("n"), pa.int64()),
                "_side": pa.array(np.ones(b.num_rows, np.int8)),
                "_bucket": pa.array(
                    key_bucket(key, num_buckets).astype(np.int32)
                ),
            }
        )

    def left_merge(g: pd.DataFrame) -> pa.Table:
        left = g[g["_side"] == 0][["key"]]
        right = g[g["_side"] == 1][["key", "n"]]
        m = left.merge(right, on="key", how="left")
        return pa.table(
            {
                "c_custkey": pa.array(m["key"].to_numpy(np.int64)),
                "n_orders": pa.array(
                    m["n"].fillna(0).to_numpy(np.int64)
                ),
            }
        )

    return (
        customers.map_batches(tag_customers, batch_format="pyarrow")
        .union(counts.map_batches(tag_counts, batch_format="pyarrow"))
        .groupby("_bucket")
        .map_groups(
            lambda g: left_merge(g.drop(columns=["_bucket"])),
            batch_format="pandas",
        )
    )


def window_debounce(
    sf_dir: str, window_sec: int = 3600, num_buckets: int = 32
) -> rd.Dataset:
    """Windowed dedup ("debounce"): keep each user's FIRST event per
    tumbling window (min ts, event_id tiebreak) — the
    keep-one-per-key-per-period shape of streaming dedup, batch form.
    One key-bucket shuffle; each bucket reduces with one sort + one
    boundary mask — no per-group Python."""
    from vietnamese_ocr_ray.functions.joins import key_bucket

    ds = read_parquet_clean(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts"]
    )

    def add_cols(b: pa.Table) -> pa.Table:
        epoch = pc.divide(pc.cast(b.column("ts"), pa.int64()), pa.scalar(1_000_000))
        win = pc.multiply(
            pc.cast(
                pc.floor(
                    pc.divide(
                        pc.cast(epoch, pa.float64()), pa.scalar(float(window_sec))
                    )
                ),
                pa.int64(),
            ),
            pa.scalar(window_sec, pa.int64()),
        )
        return pa.table(
            {
                "event_id": b.column("event_id"),
                "user_id": b.column("user_id"),
                "ts": b.column("ts"),
                "window_start": win,
                "_bucket": pa.array(
                    key_bucket(b.column("user_id"), num_buckets).astype(np.int32)
                ),
            }
        )

    def first_per_window(g: pd.DataFrame) -> pa.Table:
        s = g.sort_values(
            ["user_id", "window_start", "ts", "event_id"], kind="stable"
        )
        u = s["user_id"].to_numpy()
        w = s["window_start"].to_numpy()
        first = np.ones(len(s), dtype=bool)
        first[1:] = (u[1:] != u[:-1]) | (w[1:] != w[:-1])
        s = s[first]
        return pa.table(
            {
                "event_id": pa.array(s["event_id"].to_numpy(np.int64)),
                "user_id": pa.array(s["user_id"].to_numpy(np.int64)),
                "window_start": pa.array(s["window_start"].to_numpy(np.int64)),
            }
        )

    return (
        ds.map_batches(add_cols, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(
            lambda g: first_per_window(g.drop(columns=["_bucket"])),
            batch_format="pandas",
        )
    )


def running_value_sum_rangesort(sf_dir: str) -> rd.Dataset:
    """Cumulative per-user sum with NO per-key-fits-one-task
    assumption — the hot-key-safe window algorithm:

    1. global range sort on (user_id, ts, event_id) — a user larger
       than a task's heap simply spans several consecutive blocks;
    2. one small pass per block computes its per-user integer totals
       (O(distinct users per block) rows — label-table scale);
    3. the driver exclusive-scans those totals in block order into a
       per-(block, user) starting offset;
    4. each block adds its LOCAL cumsum to its broadcast offset.

    Steps 2/4 are raw Ray tasks over the sorted blocks — the one place
    the Dataset API genuinely can't express the semantics (a task must
    know its block's global POSITION). Output is bit-identical to
    :func:`running_value_sum` (same SQL window oracle)."""
    import ray

    ds = (
        read_parquet_clean(
            f"{sf_dir}/events.parquet",
            columns=["event_id", "user_id", "ts", "value"],
        )
        .sort(["user_id", "ts", "event_id"])
        .materialize()
    )
    refs = ds.to_arrow_refs()

    @ray.remote
    def block_totals(t: pa.Table) -> pa.Table:
        user = np.asarray(t.column("user_id"))
        units = np.rint(
            t.column("value").to_numpy(zero_copy_only=False) * 1000.0
        ).astype(np.int64)
        uniq, inv = np.unique(user, return_inverse=True)
        sums = np.bincount(inv, weights=units).astype(np.int64)
        return pa.table({"user_id": pa.array(uniq), "total": pa.array(sums)})

    totals = ray.get([block_totals.remote(r) for r in refs])
    offsets: list[dict] = []
    running: dict[int, int] = {}
    for t in totals:  # block order == sort order
        offsets.append(dict(running))
        for u, s in zip(
            np.asarray(t.column("user_id")), np.asarray(t.column("total"))
        ):
            running[int(u)] = running.get(int(u), 0) + int(s)

    @ray.remote
    def finish(t: pa.Table, start: dict) -> pa.Table:
        user = np.asarray(t.column("user_id"))
        units = np.rint(
            t.column("value").to_numpy(zero_copy_only=False) * 1000.0
        ).astype(np.int64)
        csum = np.cumsum(units)
        # per-user local cumsum: subtract the running total as of the
        # user's first row of this block
        first = np.ones(user.shape[0], dtype=bool)
        first[1:] = user[1:] != user[:-1]
        starts_idx = np.nonzero(first)[0]
        base = csum[starts_idx] - units[starts_idx]
        local = csum - np.repeat(base, np.diff(np.append(starts_idx, len(user))))
        off = np.array(
            [start.get(int(u), 0) for u in user[starts_idx]], np.int64
        )
        total = local + np.repeat(off, np.diff(np.append(starts_idx, len(user))))
        return pa.table(
            {
                "event_id": t.column("event_id"),
                "user_id": t.column("user_id"),
                "ts": t.column("ts"),
                "running_value": pa.array(total / 1000.0, pa.float64()),
            }
        )

    out = [finish.remote(r, offsets[i]) for i, r in enumerate(refs)]
    return rd.from_arrow_refs(out)


def value_mad(sf_dir: str, num_buckets: int = 8) -> rd.Dataset:
    """Grouped robust dispersion: median absolute deviation of value
    per event_type (median of |x - median(x)|, both medians exact
    type-7 interpolation == SQL quantile_cont). One key-bucket shuffle;
    each bucket computes every group's two medians with two sorted
    passes and the boundary-lerp trick from value_quantiles — no
    per-group Python."""
    from vietnamese_ocr_ray.functions.joins import key_bucket

    ds = read_parquet_clean(
        f"{sf_dir}/events.parquet", columns=["event_type", "value"]
    )

    def add_bucket(b: pa.Table) -> pa.Table:
        return b.append_column(
            "_bucket",
            pa.array(
                key_bucket(b.column("event_type"), num_buckets).astype(np.int32)
            ),
        )

    def _group_median(keys: np.ndarray, v: np.ndarray) -> tuple:
        """(group keys, medians) for a (key, value) pair sorted by
        (key, value) — vectorized over all groups at once."""
        starts = np.nonzero(
            np.concatenate([[True], keys[1:] != keys[:-1]])
        )[0]
        cnt = np.diff(np.concatenate([starts, [len(v)]]))
        pos = 0.5 * (cnt - 1)
        lo = np.floor(pos).astype(np.int64)
        t = pos - lo
        hi = np.minimum(lo + 1, cnt - 1)
        a, b = v[starts + lo], v[starts + hi]
        diff = b - a
        r = a + diff * t
        m = t >= 0.5  # numpy _lerp's symmetric branch — bit-exact
        r[m] = b[m] - diff[m] * (1.0 - t[m])
        return keys[starts], r

    def mad(g: pd.DataFrame) -> pa.Table:
        s = g.sort_values(["event_type", "value"], kind="stable")
        keys = s["event_type"].to_numpy()
        v = s["value"].to_numpy()
        gk, med = _group_median(keys, v)
        dev = np.abs(v - med[np.searchsorted(gk, keys)])
        o = np.lexsort((dev, keys))
        gk2, mad_v = _group_median(keys[o], dev[o])
        return pa.table(
            {
                "event_type": pa.array(gk2, pa.string()),
                "mad": pa.array(
                    [round(float(x), 6) for x in mad_v], pa.float64()
                ),
            }
        )

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(
            lambda g: mad(g.drop(columns=["_bucket"])), batch_format="pandas"
        )
    )


def value_hour_corr(sf_dir: str) -> rd.Dataset:
    """Pearson correlation of event value vs hour-of-day, per
    event_type — computed from EXACT integer sums (value scaled 1e3,
    hour 0..23; all five sums fit int64) so Ray and the SQL oracle
    evaluate the identical closed-form expression on identical
    integers: r = (n*Sxy - Sx*Sy) / sqrt((n*Sxx - Sx^2)(n*Syy - Sy^2)).
    The partial/combiner shape: one tiny row per (type, batch)."""
    ds = read_parquet_clean(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts", "value"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        x = _cents(batch.column("value"), 1000).to_numpy(zero_copy_only=False)
        epoch = (
            pc.divide(pc.cast(batch.column("ts"), pa.int64()), pa.scalar(1_000_000))
            .to_numpy(zero_copy_only=False)
        )
        h = (epoch // 3600) % 24
        t = pa.table(
            {
                "event_type": batch.column("event_type"),
                "sx": pa.array(x),
                "sy": pa.array(h),
                "sxx": pa.array(x * x),
                "syy": pa.array(h * h),
                "sxy": pa.array(x * h),
            }
        )
        return t.group_by("event_type").aggregate(
            [
                ("sx", "count"),
                ("sx", "sum"),
                ("sy", "sum"),
                ("sxx", "sum"),
                ("syy", "sum"),
                ("sxy", "sum"),
            ]
        ).rename_columns(
            ["event_type", "n", "sx", "sy", "sxx", "syy", "sxy"]
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("sx", alias_name="sx"),
            Sum("sy", alias_name="sy"),
            Sum("sxx", alias_name="sxx"),
            Sum("syy", alias_name="syy"),
            Sum("sxy", alias_name="sxy"),
        )
    )

    def finish(b: pa.Table) -> pa.Table:
        n = np.asarray(b.column("n"), dtype=np.float64)
        sx = np.asarray(b.column("sx"), dtype=np.float64)
        sy = np.asarray(b.column("sy"), dtype=np.float64)
        sxx = np.asarray(b.column("sxx"), dtype=np.float64)
        syy = np.asarray(b.column("syy"), dtype=np.float64)
        sxy = np.asarray(b.column("sxy"), dtype=np.float64)
        r = (n * sxy - sx * sy) / np.sqrt(
            (n * sxx - sx * sx) * (n * syy - sy * sy)
        )
        return pa.table(
            {
                "event_type": b.column("event_type"),
                "corr_value_hour": pa.array(
                    [round(float(x), 6) for x in r], pa.float64()
                ),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def value_stddev(sf_dir: str) -> rd.Dataset:
    """Sample stddev of value per event_type from EXACT integer moment
    sums (value scaled 1e3): both engines evaluate the identical
    closed form sqrt((n*sxx - sx^2)/(n*(n-1)))/1000 on identical
    integers-as-doubles — bit-exact before the final round. Same
    partial/combiner shape as value_hour_corr."""
    ds = read_parquet_clean(
        f"{sf_dir}/events.parquet", columns=["event_type", "value"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        x = _cents(batch.column("value"), 1000).to_numpy(zero_copy_only=False)
        t = pa.table(
            {
                "event_type": batch.column("event_type"),
                "sx": pa.array(x),
                "sxx": pa.array(x * x),
            }
        )
        return t.group_by("event_type").aggregate(
            [("sx", "count"), ("sx", "sum"), ("sxx", "sum")]
        ).rename_columns(["event_type", "n", "sx", "sxx"])

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("sx", alias_name="sx"),
            Sum("sxx", alias_name="sxx"),
        )
    )

    def finish(b: pa.Table) -> pa.Table:
        n = np.asarray(b.column("n"), dtype=np.float64)
        sx = np.asarray(b.column("sx"), dtype=np.float64)
        sxx = np.asarray(b.column("sxx"), dtype=np.float64)
        sd = np.sqrt((n * sxx - sx * sx) / (n * (n - 1))) / 1000.0
        return pa.table(
            {
                "event_type": b.column("event_type"),
                "n_events": pc.cast(b.column("n"), pa.int64()),
                "stddev_value": pa.array(
                    [round(float(v), 6) for v in sd], pa.float64()
                ),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def event_lead(sf_dir: str, num_buckets: int = 32) -> rd.Dataset:
    """LEAD window (next event of the same user) — the mirror of
    :func:`event_lag`: one bucket shuffle, one sort per bucket,
    next-row columns via shifted views masked at user boundaries; rows
    without a successor drop."""
    from vietnamese_ocr_ray.functions.joins import key_bucket

    ds = read_parquet_clean(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts"]
    )

    def add_bucket(b: pa.Table) -> pa.Table:
        return b.append_column(
            "_bucket",
            pa.array(key_bucket(b.column("user_id"), num_buckets).astype(np.int32)),
        )

    def lead(g: pd.DataFrame) -> pa.Table:
        s = g.sort_values(["user_id", "ts", "event_id"], kind="stable")
        user = s["user_id"].to_numpy()
        ev = s["event_id"].to_numpy(np.int64)
        ts = s["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        same = np.zeros(len(s), dtype=bool)
        same[:-1] = user[:-1] == user[1:]
        nxt_ev = np.empty_like(ev)
        nxt_ts = np.empty_like(ts)
        nxt_ev[:-1] = ev[1:]
        nxt_ts[:-1] = ts[1:]
        return pa.table(
            {
                "event_id": pa.array(ev[same]),
                "user_id": pa.array(user[same]),
                "next_event_id": pa.array(nxt_ev[same]),
                "gap_us": pa.array(nxt_ts[same] - ts[same]),
            }
        )

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(
            lambda g: lead(g.drop(columns=["_bucket"])), batch_format="pandas"
        )
    )


def user_first_last(sf_dir: str, num_buckets: int = 32) -> rd.Dataset:
    """first_value/last_value per user over (ts, event_id) order — the
    distributed argmin/argmax combiner: each batch keeps only its
    per-user first and last candidate rows (plus a count), the bucketed
    reduce re-runs the same boundary pick over candidates. The shuffle
    carries <= 2 rows per user per block, never the events."""
    from vietnamese_ocr_ray.functions.joins import key_bucket

    ds = read_parquet_clean(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "ts", "value"],
    )

    def candidates(df: pd.DataFrame, n_col: np.ndarray) -> pd.DataFrame:
        """First+last row per user of a frame SORTED by
        (user, ts, event_id); the user's total n lands on its first
        row (0 elsewhere) so sums survive re-reduction."""
        user = df["user_id"].to_numpy()
        first = np.ones(len(df), dtype=bool)
        first[1:] = user[1:] != user[:-1]
        last = np.ones(len(df), dtype=bool)
        last[:-1] = first[1:]
        keep = first | last
        runs = np.nonzero(first)[0]
        n_row = np.zeros(len(df), dtype=np.int64)
        n_row[runs] = np.add.reduceat(np.asarray(n_col, np.int64), runs)
        out = df[keep].copy()
        out["n"] = n_row[keep]
        return out

    def partial(batch: pa.Table) -> pa.Table:
        df = pa.Table.to_pandas(batch)
        df = df.sort_values(["user_id", "ts", "event_id"], kind="stable")
        out = candidates(df, np.ones(len(df), np.int64))
        return pa.Table.from_pandas(out, preserve_index=False).replace_schema_metadata(
            None
        )

    def add_bucket(b: pa.Table) -> pa.Table:
        return b.append_column(
            "_bucket",
            pa.array(key_bucket(b.column("user_id"), num_buckets).astype(np.int32)),
        )

    def reduce_bucket(g: pd.DataFrame) -> pa.Table:
        s = g.sort_values(["user_id", "ts", "event_id"], kind="stable")
        cand = candidates(s, s["n"].to_numpy(np.int64))
        user = cand["user_id"].to_numpy(np.int64)
        first = np.ones(len(cand), dtype=bool)
        first[1:] = user[1:] != user[:-1]
        # one row out per user: first row + its matching last row (the
        # run is 1 row when first == last)
        runs = np.nonzero(first)[0]
        ends = np.append(runs[1:], len(cand)) - 1
        ev = cand["event_id"].to_numpy(np.int64)
        val = cand["value"].to_numpy(np.float64)
        n = cand["n"].to_numpy(np.int64)
        totals = np.add.reduceat(n, runs)
        return pa.table(
            {
                "user_id": pa.array(user[runs]),
                "n_events": pa.array(totals),
                "first_event_id": pa.array(ev[runs]),
                "first_val": pa.array(val[runs], pa.float64()),
                "last_event_id": pa.array(ev[ends]),
                "last_val": pa.array(val[ends], pa.float64()),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .map_batches(add_bucket, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(
            lambda g: reduce_bucket(g.drop(columns=["_bucket"])),
            batch_format="pandas",
        )
    )


def first_seen_cumulative(sf_dir: str) -> rd.Dataset:
    """Daily new users + running total (user-growth curve): per-user
    min ts via one bucketed hash-aggregate (the shuffle carries one
    row per user per block), daily counts over the user-sized table,
    and the cumulative sum on the days-sized result in a single block
    — the classic first-seen decomposition that avoids any windowed
    COUNT(DISTINCT) over the raw events."""
    from vietnamese_ocr_ray.functions.agg import hash_aggregate

    ds = read_parquet_clean(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts"]
    )
    first = hash_aggregate(ds, ["user_id"], {"first_ts": ("ts", "min")})

    def to_day(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "first_day": pc.strftime(b.column("first_ts"), format="%Y-%m-%d"),
                "n": pa.array(np.ones(b.num_rows, np.int64)),
            }
        )

    daily = hash_aggregate(
        first.map_batches(to_day, batch_format="pyarrow"),
        ["first_day"],
        {"new_users": ("n", "sum")},
        num_buckets=8,
    )

    def cumsum(b: pa.Table) -> pa.Table:
        b = b.sort_by([("first_day", "ascending")])
        nu = b.column("new_users").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "first_day": pc.cast(b.column("first_day"), pa.string()),
                "new_users": pa.array(nu),
                "cumulative_users": pa.array(np.cumsum(nu)),
            }
        )

    # days-sized table: one block, one vectorized cumsum
    return daily.repartition(1).map_batches(cumsum, batch_format="pyarrow")


def lang_embedding_join(sf_dir: str) -> rd.Dataset:
    """Cross-table metadata join: per-language vector count and mean
    L2 norm for embeddings whose vec_id matches a doc_id. The doc
    metadata (doc_id -> lang) broadcasts once via ray.put (the
    metadata side is orders of magnitude smaller than the vectors);
    norms are one zero-copy matmul-free numpy pass per batch; the
    reduce is a tiny groupby on lang."""
    import ray
    from ray.data.aggregate import Count, Sum

    from vietnamese_ocr_ray.functions.ann import _matrix

    docs = read_parquet_clean(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"]
    ).to_pandas()
    handle = ray.put(
        (
            pa.array(docs["doc_id"].to_numpy(np.int64)),
            pa.array(docs["lang"].to_numpy(), pa.string()),
        )
    )

    ds = read_parquet_clean(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )

    def norms(batch: pa.Table) -> pa.Table:
        ids, langs = ray.get(handle)
        vec_id = batch.column("vec_id")
        if isinstance(vec_id, pa.ChunkedArray):
            vec_id = vec_id.combine_chunks()
        pos = pc.index_in(vec_id, value_set=ids)
        keep = pc.is_valid(pos).to_numpy(zero_copy_only=False)
        m = _matrix(batch)[keep]
        lang = langs.take(pos.filter(pa.array(keep)))
        return pa.table(
            {
                "lang": lang,
                "norm": pa.array(np.linalg.norm(m, axis=1), pa.float64()),
            }
        )

    agg = (
        ds.map_batches(norms, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(Count(alias_name="n_vecs"), Sum("norm", alias_name="s"))
    )
    return agg.map_batches(
        lambda b: pa.table(
            {
                "lang": b.column("lang"),
                "n_vecs": b.column("n_vecs"),
                "avg_norm": pc.round(
                    pc.divide(
                        b.column("s"), pc.cast(b.column("n_vecs"), pa.float64())
                    ),
                    ndigits=4,
                ),
            }
        ),
        batch_format="pyarrow",
    )


def events_profile(sf_dir: str) -> pa.Table:
    """Single-row column profile of the events table (the schema-audit
    op a pipeline runs before touching a new drop of data): row count,
    ts/value ranges, exact integer value sum, exact distinct user and
    event-type counts.

    Scale shape: ONE pruned pass for the scalar stats (per-batch
    one-row partials -> a global Min/Max/Sum aggregate, driver gets a
    single dict) plus one distinct pass per key column (per-batch
    unique -> distributed groupby-count; only the COUNT reaches the
    driver, never the value set). min/max over doubles and the
    milli-unit integer sum are order-independent, so the result is
    bit-stable under any partitioning."""
    from ray.data.aggregate import Min

    ds = read_parquet_clean(
        f"{sf_dir}/events.parquet",
        columns=["ts", "user_id", "event_type", "value"],
    )

    def partial(batch: pa.Table) -> pa.Table:
        ts = pc.cast(batch.column("ts"), pa.int64())
        v = batch.column("value")
        return pa.table(
            {
                "n": pa.array([batch.num_rows], pa.int64()),
                "min_ts_us": pa.array([pc.min(ts).as_py()], pa.int64()),
                "max_ts_us": pa.array([pc.max(ts).as_py()], pa.int64()),
                "min_value": pa.array([pc.min(v).as_py()], pa.float64()),
                "max_value": pa.array([pc.max(v).as_py()], pa.float64()),
                "v_milli": pa.array(
                    [int(np.asarray(_cents(v, 1000)).sum())], pa.int64()
                ),
            }
        )

    agg = ds.map_batches(partial, batch_format="pyarrow").aggregate(
        Sum("n", alias_name="n"),
        Min("min_ts_us", alias_name="min_ts_us"),
        Max("max_ts_us", alias_name="max_ts_us"),
        Min("min_value", alias_name="min_value"),
        Max("max_value", alias_name="max_value"),
        Sum("v_milli", alias_name="v_milli"),
    )

    def n_distinct(col: str) -> int:
        return (
            ds.map_batches(
                lambda b, c=col: pa.table({c: pc.unique(b.column(c))}),
                batch_format="pyarrow",
            )
            .groupby(col)
            .count()
            .count()
        )

    return pa.table(
        {
            "n_events": pa.array([agg["n"]], pa.int64()),
            "min_ts_us": pa.array([agg["min_ts_us"]], pa.int64()),
            "max_ts_us": pa.array([agg["max_ts_us"]], pa.int64()),
            "min_value": pa.array([agg["min_value"]], pa.float64()),
            "max_value": pa.array([agg["max_value"]], pa.float64()),
            "sum_value": pa.array([agg["v_milli"] / 1000.0], pa.float64()),
            "distinct_users": pa.array([n_distinct("user_id")], pa.int64()),
            "distinct_event_types": pa.array(
                [n_distinct("event_type")], pa.int64()
            ),
        }
    )


def promo_revenue(sf_dir: str, month: str = "1995-09") -> pa.Table:
    """TPC-H Q14 shape: percent of one month's discounted revenue from
    PROMO-type parts. The part side is reduced to a broadcast sorted
    partkey array + promo bitmask (ray.put once, searchsorted lookup
    per batch — never a shuffle; at 10^9 parts the same query becomes
    the bucketed cogroup join of functions/joins.py); lineitem streams
    with a pruned, shipdate-filtered read. Revenue in exact integer
    1e-4 units (cents x (100 - disc_cents)), one final division."""
    import ray

    part = read_parquet_clean(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_type"]
    )

    def part_partial(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "p_partkey": batch.column("p_partkey"),
                "is_promo": pc.cast(
                    pc.starts_with(batch.column("p_type"), "PROMO"),
                    pa.int8(),
                ),
            }
        )

    pdf = part.map_batches(part_partial, batch_format="pyarrow").to_pandas()
    keys = pdf["p_partkey"].to_numpy(np.int64)
    order = np.argsort(keys)
    handle = ray.put((keys[order], pdf["is_promo"].to_numpy(np.int8)[order]))

    lo, hi = f"{month}-01", "1995-10-01"
    ds = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_extendedprice", "l_discount", "l_shipdate"],
    )

    lo_us = int(np.datetime64(lo, "us").astype(np.int64))
    hi_us = int(np.datetime64(hi, "us").astype(np.int64))

    def partial(batch: pa.Table) -> pa.Table:
        sd = pc.cast(batch.column("l_shipdate"), pa.int64())
        mask = pc.and_(
            pc.greater_equal(sd, pa.scalar(lo_us, pa.int64())),
            pc.less(sd, pa.scalar(hi_us, pa.int64())),
        )
        batch = batch.filter(mask)
        price_c = _cents(batch.column("l_extendedprice"), 100)
        disc = _cents(batch.column("l_discount"), 100)
        rev = np.asarray(
            pc.multiply(price_c, pc.subtract(pa.scalar(100, pa.int64()), disc))
        )
        pk, promo = ray.get(handle)
        idx = np.searchsorted(pk, np.asarray(batch.column("l_partkey")))
        is_promo = promo[idx].astype(bool)
        return pa.table(
            {
                "promo_rev": pa.array([int(rev[is_promo].sum())], pa.int64()),
                "total_rev": pa.array([int(rev.sum())], pa.int64()),
            }
        )

    agg = ds.map_batches(partial, batch_format="pyarrow").aggregate(
        Sum("promo_rev", alias_name="promo_rev"),
        Sum("total_rev", alias_name="total_rev"),
    )
    promo, total = int(agg["promo_rev"]), int(agg["total_rev"])
    return pa.table(
        {
            "promo_revenue_pct": pa.array(
                [100.0 * promo / total if total else 0.0], pa.float64()
            ),
            "promo_rev": pa.array([promo / 10000.0], pa.float64()),
            "total_rev": pa.array([total / 10000.0], pa.float64()),
        }
    )


def global_median(sf_dir: str, col: str = "value") -> pa.Table:
    """EXACT global median of events.value by distributed selection
    (iterative histogram refinement, the classic k-th-order-statistic
    shape): each round streams one pruned pass that histograms the
    surviving value range into 1024 buckets (per-batch partial counts
    -> one tiny bucket groupby), the driver narrows to the bucket(s)
    holding the target ranks, and only when the surviving range holds
    < 4096 values are the actual values collected and selected. No
    sort, no full materialization — O(rounds) streaming passes with
    int-only driver traffic, converging geometrically (1024x per
    round).

    Interpolation for even n matches DuckDB quantile_cont bit-for-bit
    (lower + (upper - lower) * 0.5, not (a + b) / 2)."""
    from ray.data.aggregate import Max, Min

    B = 1024
    ds = read_parquet_clean(f"{sf_dir}/events.parquet", columns=[col])

    def one_row(batch: pa.Table) -> pa.Table:
        v = batch.column(col)
        return pa.table(
            {
                "n": pa.array([batch.num_rows], pa.int64()),
                "mn": pa.array([pc.min(v).as_py()], pa.float64()),
                "mx": pa.array([pc.max(v).as_py()], pa.float64()),
            }
        )

    agg = ds.map_batches(one_row, batch_format="pyarrow").aggregate(
        Sum("n", alias_name="n"),
        Min("mn", alias_name="mn"),
        Max("mx", alias_name="mx"),
    )
    n = int(agg["n"])
    if n == 0:
        return pa.table({"median": pa.array([None], pa.float64())})
    targets = [(n - 1) // 2] if n % 2 else [n // 2 - 1, n // 2]

    lo, hi = float(agg["mn"]), float(agg["mx"])
    below = 0  # exact count of values strictly below lo
    in_range = n
    while in_range > 4096:
        edges = np.linspace(lo, hi, B + 1)
        edges[-1] = np.nextafter(hi, np.inf)  # keep max inside

        def hist(batch: pa.Table, e=edges, a=lo, b=hi) -> pa.Table:
            v = np.asarray(batch.column(col), dtype=np.float64)
            v = v[(v >= a) & (v <= b)]
            idx = np.clip(np.searchsorted(e, v, side="right") - 1, 0, B - 1)
            cnt = np.bincount(idx, minlength=B)
            return pa.table(
                {
                    "bucket": pa.array(np.arange(B, dtype=np.int64)),
                    "cnt": pa.array(cnt.astype(np.int64)),
                }
            )

        h = (
            ds.map_batches(hist, batch_format="pyarrow")
            .groupby("bucket")
            .sum("cnt")
            .to_pandas()
            .sort_values("bucket")
        )
        counts = np.zeros(B, np.int64)
        counts[h["bucket"].to_numpy()] = h["sum(cnt)"].to_numpy()
        cum = below + np.concatenate([[0], np.cumsum(counts)])
        b_lo = int(np.searchsorted(cum, targets[0], side="right") - 1)
        b_hi = int(np.searchsorted(cum, targets[-1], side="right") - 1)
        below = int(cum[b_lo])
        new_lo, new_hi = float(edges[b_lo]), float(edges[b_hi + 1])
        in_range = int(cum[b_hi + 1] - cum[b_lo])
        if (new_lo, new_hi) == (lo, hi):
            break  # range can no longer shrink (mass on one value)
        lo, hi = new_lo, new_hi

    def collect(batch: pa.Table, a=lo, b=hi) -> pa.Table:
        v = np.asarray(batch.column(col), dtype=np.float64)
        return pa.table({"v": pa.array(v[(v >= a) & (v <= b)])})

    vals = np.sort(
        ds.map_batches(collect, batch_format="pyarrow")
        .to_pandas()["v"]
        .to_numpy(np.float64)
    )
    picked = [float(vals[t - below]) for t in targets]
    if len(picked) == 1:
        med = picked[0]
    else:
        med = picked[0] + (picked[1] - picked[0]) * 0.5
    return pa.table({"median": pa.array([med], pa.float64())})


def value_hour_regression(sf_dir: str) -> rd.Dataset:
    """Least-squares fit value ~ a + b*hour_of_day per event_type,
    from the same EXACT integer moment sums as value_hour_corr
    (value scaled 1e3, hour 0..23): slope and intercept are evaluated
    as the identical closed forms b = (n*Sxy - Sx*Sy)/(n*Syy - Sy^2),
    a = (Sx - b*Sy)/n on identical integers-as-doubles in both
    engines, then scaled back by 1e-3 and rounded to 6dp. The
    partial/combiner shape: one tiny row per (type, batch)."""
    ds = read_parquet_clean(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts", "value"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        x = _cents(batch.column("value"), 1000).to_numpy(zero_copy_only=False)
        epoch = (
            pc.divide(pc.cast(batch.column("ts"), pa.int64()), pa.scalar(1_000_000))
            .to_numpy(zero_copy_only=False)
        )
        h = (epoch // 3600) % 24
        t = pa.table(
            {
                "event_type": batch.column("event_type"),
                "sx": pa.array(x),
                "sy": pa.array(h),
                "syy": pa.array(h * h),
                "sxy": pa.array(x * h),
            }
        )
        return t.group_by("event_type").aggregate(
            [
                ("sx", "count"),
                ("sx", "sum"),
                ("sy", "sum"),
                ("syy", "sum"),
                ("sxy", "sum"),
            ]
        ).rename_columns(["event_type", "n", "sx", "sy", "syy", "sxy"])

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("sx", alias_name="sx"),
            Sum("sy", alias_name="sy"),
            Sum("syy", alias_name="syy"),
            Sum("sxy", alias_name="sxy"),
        )
    )

    def finish(b: pa.Table) -> pa.Table:
        n = np.asarray(b.column("n"), dtype=np.float64)
        sx = np.asarray(b.column("sx"), dtype=np.float64)
        sy = np.asarray(b.column("sy"), dtype=np.float64)
        syy = np.asarray(b.column("syy"), dtype=np.float64)
        sxy = np.asarray(b.column("sxy"), dtype=np.float64)
        slope = (n * sxy - sx * sy) / (n * syy - sy * sy) / 1000.0
        intercept = (sx / 1000.0 - slope * 1000.0 * sy / 1000.0) / n
        return pa.table(
            {
                "event_type": b.column("event_type"),
                "slope": pa.array(
                    [round(float(v), 6) for v in slope], pa.float64()
                ),
                "intercept": pa.array(
                    [round(float(v), 6) for v in intercept], pa.float64()
                ),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def hourly_anomaly(sf_dir: str) -> rd.Dataset:
    """Per-type hourly event-rate z-scores (the monitoring op that
    flags traffic anomalies): hourly counts per event_type through the
    partial/combiner shape, then per-type sample mean/std from EXACT
    integer count moments (counts are ints, so k/s1/s2 are exact and
    both engines evaluate the identical closed form). The final
    per-type pass is a map_groups over a table of size hours x types
    — negligible next to the first aggregate."""
    ds = read_parquet_clean(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        epoch = (
            pc.divide(pc.cast(batch.column("ts"), pa.int64()), pa.scalar(1_000_000))
            .to_numpy(zero_copy_only=False)
        )
        hr = (epoch // 3600) * 3600
        t = pa.table(
            {"event_type": batch.column("event_type"), "hr": pa.array(hr)}
        )
        return t.group_by(["event_type", "hr"]).aggregate(
            [("hr", "count")]
        ).rename_columns(["event_type", "hr", "n"])

    hourly = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "hr"])
        .aggregate(Sum("n", alias_name="n"))
    )

    def z_per_type(g: pd.DataFrame) -> pa.Table:
        n = g["n"].to_numpy(np.int64)
        k = float(len(n))
        s1 = float(n.sum())
        s2 = float((n * n).sum())
        std = np.sqrt((k * s2 - s1 * s1) / (k * (k - 1))) if k > 1 else np.nan
        z = (n.astype(np.float64) - s1 / k) / std
        out = pd.DataFrame(
            {
                "event_type": g["event_type"],
                "hr": g["hr"].astype(np.int64),
                "n": n,
                "z": np.round(z, 6),
            }
        )
        return pa.Table.from_pandas(out, preserve_index=False).replace_schema_metadata(
            None
        )

    return hourly.groupby("event_type").map_groups(
        z_per_type, batch_format="pandas"
    )


def event_transitions(sf_dir: str, num_buckets: int = 32) -> rd.Dataset:
    """Markov transition counts between consecutive event types per
    user (the session-flow matrix a product-analytics pipeline feeds
    into funnel models): shuffle on key_bucket(user_id), one sort per
    bucket, shifted-view previous-type masked at user boundaries, then
    per-bucket partial (prev, next) counts into a tiny global combine
    — transitions shuffle as counts, never as rows."""
    from vietnamese_ocr_ray.functions.joins import key_bucket

    ds = read_parquet_clean(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "ts", "event_type"],
    )

    def add_bucket(b: pa.Table) -> pa.Table:
        return b.append_column(
            "_bucket",
            pa.array(key_bucket(b.column("user_id"), num_buckets).astype(np.int32)),
        )

    def transitions(g: pd.DataFrame) -> pa.Table:
        s = g.sort_values(["user_id", "ts", "event_id"], kind="stable")
        user = s["user_id"].to_numpy()
        et = s["event_type"].to_numpy()
        same = np.zeros(len(s), dtype=bool)
        same[1:] = user[1:] == user[:-1]
        prev = np.empty_like(et)
        prev[1:] = et[:-1]
        df = (
            pd.DataFrame({"prev_type": prev[same], "event_type": et[same]})
            .groupby(["prev_type", "event_type"], as_index=False)
            .size()
            .rename(columns={"size": "n"})
        )
        return pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(
            None
        )

    partials = (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(
            lambda g: transitions(g.drop(columns=["_bucket"])),
            batch_format="pandas",
        )
    )
    out = partials.groupby(["prev_type", "event_type"]).aggregate(
        Sum("n", alias_name="n")
    )
    return out.map_batches(
        lambda b: b.rename_columns(["prev_type", "event_type", "n"]),
        batch_format="pyarrow",
    )


def docs_page(sf_dir: str, page: int = 2, page_size: int = 20) -> pa.Table:
    """Deterministic pagination (ORDER BY n_chars DESC, doc_id LIMIT k
    OFFSET p*k): each batch keeps only its local top-(offset+limit)
    rows — a vectorized argsort head, the classic distributed top-k
    with the offset folded into k — so the final exact selection sees
    at most (offset+limit) x blocks rows, never the corpus."""
    need = (page + 1) * page_size
    ds = read_parquet_clean(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"]
    )

    def partial_topk(batch: pa.Table) -> pa.Table:
        nc = np.asarray(batch.column("n_chars"))
        ids = np.asarray(batch.column("doc_id"))
        order = np.lexsort((ids, -nc))[:need]
        return pa.table(
            {"doc_id": pa.array(ids[order]), "n_chars": pa.array(nc[order])}
        )

    small = ds.map_batches(partial_topk, batch_format="pyarrow").to_pandas()
    final = small.sort_values(
        ["n_chars", "doc_id"], ascending=[False, True], kind="stable"
    ).iloc[page * page_size : need]
    return pa.Table.from_pandas(
        final.reset_index(drop=True), preserve_index=False
    ).replace_schema_metadata(None)


def event_type_share(sf_dir: str) -> pa.Table:
    """Ratio-to-report: each event type's share of all events. One
    partial/combine count aggregate; the share division runs on the
    tiny per-type table with the global total from the same pass."""
    ds = read_parquet_clean(f"{sf_dir}/events.parquet", columns=["event_type"])

    def partial(batch: pa.Table) -> pa.Table:
        vc = pc.value_counts(batch.column("event_type"))
        return pa.table(
            {
                "event_type": pc.struct_field(vc, "values"),
                "n": pc.struct_field(vc, "counts").cast(pa.int64()),
            }
        )

    counts = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
        .sort_values("event_type")
    )
    n = counts["n"].to_numpy(np.int64)
    share = n.astype(np.float64) / float(n.sum())
    return pa.table(
        {
            "event_type": pa.array(counts["event_type"].to_numpy().astype(object)),
            "n": pa.array(n),
            "share": pa.array(share, pa.float64()),
        }
    )


def long_docs_pushdown(sf_dir: str, min_chars: int = 400) -> rd.Dataset:
    """Predicate + projection pushdown at the READ: the row filter
    (n_chars >= min_chars) and column list go to the parquet scanner
    itself, so non-matching row groups and unused columns never leave
    storage — the IO-pruning shape every 100 TB scan needs (a filter
    applied after a full-column read is wrong at scale)."""
    ds = read_parquet_clean(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "lang", "n_chars"],
        filter=(pc.field("n_chars") >= min_chars),
    )
    # the scanner guarantees row-group pruning; the residual per-batch
    # mask keeps exact row semantics for row groups that straddle the
    # threshold
    return ds.map_batches(
        lambda b: b.filter(pc.greater_equal(b.column("n_chars"), min_chars)),
        batch_format="pyarrow",
    )


def geo_mean_value(sf_dir: str) -> rd.Dataset:
    """Geometric mean of value per event_type (the multiplicative
    average a latency/price pipeline wants): each row's ln(value) is
    quantized to integer micro-nats BEFORE the sum (the lm.py
    determinism contract — order-independent int64 arithmetic; numpy
    log and DuckDB ln agree far beyond the quantum), one
    partial/combine aggregate, then exp of the mean with a 6dp round
    absorbing final-ulp divergence.

    Non-positive values are EXCLUDED on both sides (geometric mean is
    defined on positive support): ln(0) = -inf quantizes to the int64
    sentinel, and a handful of such rows silently overflow the sum
    into an unbounded-Python-int object column — shipped once, caught
    by the sf0.1 sweep (the first zero-valued events appear there)."""
    ds = read_parquet_clean(
        f"{sf_dir}/events.parquet", columns=["event_type", "value"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        v = np.asarray(batch.column("value"), dtype=np.float64)
        et = batch.column("event_type").to_numpy(zero_copy_only=False)
        pos = v > 0
        v, et = v[pos], et[pos]
        q = np.round(np.log(v) * 1_000_000).astype(np.int64)
        t = pa.table({"event_type": pa.array(et), "s": pa.array(q)})
        return t.group_by("event_type").aggregate(
            [("s", "count"), ("s", "sum")]
        ).rename_columns(["event_type", "n", "s"])

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(Sum("n", alias_name="n"), Sum("s", alias_name="s"))
    )

    def finish(b: pa.Table) -> pa.Table:
        n = np.asarray(b.column("n"), dtype=np.float64)
        s = np.asarray(b.column("s"), dtype=np.float64)
        gm = np.exp(s / 1_000_000.0 / n)
        return pa.table(
            {
                "event_type": b.column("event_type"),
                "geo_mean": pa.array(
                    [round(float(x), 6) for x in gm], pa.float64()
                ),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def cohort_retention(sf_dir: str, num_buckets: int = 32) -> rd.Dataset:
    """Weekly cohort retention: users are grouped by the Monday-start
    week of their FIRST event (their cohort); ``n_users`` counts how
    many of each cohort were active (>= 1 event) ``week_offset`` weeks
    later. The classic "enrich a stream with a per-group aggregate"
    shape, Ray-native and join-free on the raw stream:

    * one corpus pass emits per-batch DISTINCT (user, active-week)
      pairs — the cohort is just the smallest of a user's distinct
      weeks, so no separate min-ts side is needed;
    * ONE user-bucket shuffle (rows bounded by distinct (user, week)
      pairs, never raw events) resolves each user's first week with a
      run-boundary scan and emits (cohort, offset) count partials;
    * a (cohorts x offsets)-bounded hash aggregate finishes.

    Week arithmetic matches DuckDB ``date_trunc('week', ts)``:
    Monday-start day numbers (1970-01-01 was a Thursday)."""
    from vietnamese_ocr_ray.functions.agg import hash_aggregate
    from vietnamese_ocr_ray.functions.joins import key_bucket

    ds = read_parquet_clean(
        f"{sf_dir}/events.parquet", columns=["ts", "user_id"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        us = (
            batch.column("ts")
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
        )
        days = us // 86_400_000_000
        dow = (days + 3) % 7  # Monday=0; epoch day 0 was a Thursday
        week = days - dow
        user = batch.column("user_id").to_numpy(zero_copy_only=False)
        uw = np.unique(
            np.stack([user.astype(np.int64), week], axis=1), axis=0
        )
        return pa.table(
            {
                "user_id": pa.array(uw[:, 0]),
                "week": pa.array(uw[:, 1]),
                "_bucket": pa.array(
                    key_bucket(pa.array(uw[:, 0]), num_buckets).astype(
                        np.int32
                    )
                ),
            }
        )

    def bucket_counts(g: pd.DataFrame) -> pa.Table:
        df = g.drop_duplicates(["user_id", "week"])  # cross-batch dups
        u = df["user_id"].to_numpy(np.int64)
        w = df["week"].to_numpy(np.int64)
        order = np.lexsort((w, u))
        u, w = u[order], w[order]
        first = np.ones(len(u), dtype=bool)
        first[1:] = u[1:] != u[:-1]
        starts = np.flatnonzero(first)
        runs = np.diff(np.append(starts, len(u)))
        cohort = np.repeat(w[starts], runs)
        off = (w - cohort) // 7
        out = (
            pd.DataFrame({"cohort": cohort, "week_offset": off})
            .groupby(["cohort", "week_offset"], as_index=False)
            .size()
        )
        return pa.table(
            {
                "cohort": pa.array(out["cohort"].to_numpy(np.int64)),
                "week_offset": pa.array(
                    out["week_offset"].to_numpy(np.int64)
                ),
                "n": pa.array(out["size"].to_numpy(np.int64)),
            }
        )

    agg = hash_aggregate(
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(bucket_counts, batch_format="pandas"),
        ["cohort", "week_offset"],
        {"n_users": ("n", "sum")},
        num_buckets=8,
    )

    def finish(b: pa.Table) -> pa.Table:
        days = np.asarray(b.column("cohort"), dtype=np.int64)
        # timestamp[us] midnight Monday — the events_hourly convention
        # (DuckDB DATE and date32 stringify differently in pandas)
        wk = days.astype("datetime64[D]").astype("datetime64[us]")
        return pa.table(
            {
                "cohort_week": pa.array(wk),
                "week_offset": b.column("week_offset"),
                "n_users": b.column("n_users"),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def value_psi(sf_dir: str, num_buckets: int = 16) -> rd.Dataset:
    """Population Stability Index per event_type — the standard
    distribution-drift audit between two populations (here the
    deterministic halves ``event_id % 2``):

        PSI = sum_buckets (p_a - p_e) * ln(p_a / p_e)

    over fixed power-of-two value buckets (floor(value * 4), IEEE-exact
    on both engines) with add-one (Laplace) smoothing so every observed
    bucket contributes a finite term. PSI > 0.2 conventionally flags a
    shifted feature; run when mixing crawl snapshots or comparing a new
    extraction run against the previous one.

    Determinism: bucket counts are exact integers; each bucket's term
    is quantized to integer nano-nats (the kl_source_divergence
    contract) and reduced by integer sum, so the emitted double is
    bit-equal to the SQL oracle. Scale shape: one bucketed
    hash-aggregate of (event_type, bucket, side-count) partials —
    bucket cardinality is value-range-bounded, never row-bounded; the
    PSI finish touches the tiny (type x bucket) table only."""
    from vietnamese_ocr_ray.functions.agg import hash_aggregate

    ds = read_parquet_clean(
        f"{sf_dir}/events.parquet", columns=["event_id", "event_type", "value"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        v = np.asarray(batch.column("value"), dtype=np.float64)
        b = np.floor(v * 4.0).astype(np.int64)
        side = (
            np.asarray(batch.column("event_id"), dtype=np.int64) % 2
        ).astype(np.int64)
        t = pa.table(
            {
                "event_type": batch.column("event_type"),
                "bucket": pa.array(b),
                "ce": pa.array((side == 0).astype(np.int64)),
                "ca": pa.array(side),
            }
        )
        g = t.group_by(["event_type", "bucket"]).aggregate(
            [("ce", "sum"), ("ca", "sum")]
        )
        return pa.table(
            {
                "event_type": g.column("event_type"),
                "bucket": g.column("bucket"),
                "ce": pc.cast(g.column("ce_sum"), pa.int64()),
                "ca": pc.cast(g.column("ca_sum"), pa.int64()),
            }
        )

    counts = hash_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["event_type", "bucket"],
        {"ce": ("ce", "sum"), "ca": ("ca", "sum")},
        num_buckets=num_buckets,
    )

    def finish(g) -> pa.Table:
        ce = g["ce"].to_numpy(np.int64)
        ca = g["ca"].to_numpy(np.int64)
        n_b = len(g)
        tot_e = int(ce.sum()) + n_b
        tot_a = int(ca.sum()) + n_b
        pe = (ce + 1).astype(np.float64) / float(tot_e)
        pa_ = (ca + 1).astype(np.float64) / float(tot_a)
        u = np.round((pa_ - pe) * np.log(pa_ / pe) * 1e9).astype(np.int64)
        return pa.table(
            {
                "event_type": pa.array([g["event_type"].iloc[0]]),
                "n_buckets": pa.array([n_b], pa.int64()),
                "psi": pa.array([int(u.sum()) / 1e9], pa.float64()),
            }
        )

    return counts.groupby("event_type").map_groups(
        finish, batch_format="pandas"
    )


def interval_coverage(sf_dir: str, window_min: int = 30) -> rd.Dataset:
    """Per-user total ACTIVE time: the length of the UNION of the
    ``window_min``-minute activity intervals [ts, ts + W) — the
    classic sweep-line interval-union aggregate (overlapping windows
    must not double-count, so a plain sum is wrong; this is the
    engagement-time metric every event pipeline eventually needs).

    Exact int64 microsecond arithmetic end-to-end (no floats): each
    event contributes max(0, end - max(start, running-max of prior
    ends)), replayed in SQL as a ROWS-window MAX. Tie order among
    identical timestamps is immaterial (equal windows contribute 0).

    Scale shape: ONE user-bucket shuffle; inside each bucket a
    vectorized sort + grouped cummax/shift; output is users-sized."""
    from vietnamese_ocr_ray.functions.joins import key_bucket

    w_us = window_min * 60_000_000
    ds = read_parquet_clean(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts"]
    )

    def side(batch: pa.Table) -> pa.Table:
        u = pc.cast(batch.column("user_id"), pa.int64())
        return pa.table(
            {
                "user_id": u,
                "s": pa.array(
                    np.asarray(batch.column("ts"), "datetime64[us]").astype(
                        np.int64
                    )
                ),
                "_bucket": pa.array(
                    key_bucket(u, 32).astype(np.int32)
                ),
            }
        )

    def cover(g) -> pa.Table:
        g = g.sort_values(["user_id", "s"], kind="stable").reset_index(
            drop=True
        )
        s = g["s"].to_numpy(np.int64)
        en = s + w_us
        g = g.assign(en=en)
        g["cm"] = g.groupby("user_id")["en"].cummax()
        pm = g.groupby("user_id")["cm"].shift(1).to_numpy()
        start_eff = np.where(np.isnan(pm), s, np.maximum(s, np.nan_to_num(pm)))
        contrib = np.maximum(en - start_eff.astype(np.int64), 0)
        out = (
            g.assign(c=contrib)
            .groupby("user_id", as_index=False)
            .agg(covered_us=("c", "sum"), n_events=("c", "size"))
        )
        return pa.table(
            {
                "user_id": pa.array(out["user_id"].to_numpy(np.int64)),
                "n_events": pa.array(out["n_events"].to_numpy(np.int64)),
                "covered_us": pa.array(
                    out["covered_us"].to_numpy(np.int64)
                ),
            }
        )

    return (
        ds.map_batches(side, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(cover, batch_format="pandas")
    )


def rolling_median(
    sf_dir: str, window: int = 5, num_buckets: int = 32
) -> rd.Dataset:
    """Per-user TRAILING-WINDOW MEDIAN of value (frame = current row +
    the 4 preceding, ordered by (ts, event_id)) — the robust twin of
    rolling_avg for spike-tolerant smoothing. Medians are order
    statistics of the window's doubles averaged as (lo + hi) * 0.5 —
    NB: DuckDB's WINDOWED quantile_cont midpoints that way, unlike its
    aggregate quantile_cont's lo + (hi - lo) * 0.5 (the value_quantiles
    contract); the two differ in the last ulp — so results are
    bit-equal to the windowed oracle.

    Scale shape: ONE user-bucket shuffle; inside each bucket the
    window matrix is ``window`` grouped vectorized shifts (no per-user
    Python), one row-wise sort of an (n, window) matrix, fancy-index
    order stats."""
    from vietnamese_ocr_ray.functions.joins import key_bucket

    ds = read_parquet_clean(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "ts", "value"],
    )

    def side(b: pa.Table) -> pa.Table:
        return b.append_column(
            "_bucket",
            pa.array(
                key_bucket(b.column("user_id"), num_buckets).astype(np.int32)
            ),
        )

    def med(g) -> pa.Table:
        g = g.sort_values(
            ["user_id", "ts", "event_id"], kind="stable"
        ).reset_index(drop=True)
        cols = [
            g.groupby("user_id")["value"].shift(k).to_numpy()
            for k in range(window)
        ]
        m = np.stack(cols, axis=1)  # (n, window); NaN outside the frame
        s = np.sort(m, axis=1)  # NaN sorts last
        c = window - np.isnan(m).sum(axis=1)
        rows = np.arange(len(g))
        lo = s[rows, (c - 1) // 2]
        hi = s[rows, c // 2]
        return pa.table(
            {
                "event_id": pa.array(g["event_id"].to_numpy(np.int64)),
                "user_id": pa.array(g["user_id"].to_numpy(np.int64)),
                "rolling_med": pa.array((lo + hi) * 0.5, pa.float64()),
            }
        )

    return (
        ds.map_batches(side, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(med, batch_format="pandas")
    )


def scd2_intervals(sf_dir: str, num_buckets: int = 32) -> rd.Dataset:
    """Slowly-changing-dimension (SCD type 2) interval build: collapse
    each user's event_type stream into validity intervals — one row
    per run of consecutive equal attribute values, ``valid_from`` = the
    run's first event ts, ``valid_to`` = the next run's first ts (NULL
    = the open/current run). The dimension-table maintenance op every
    warehouse ingest needs; deterministic order (ts, event_id).

    Scale shape: ONE user-bucket shuffle (key_bucket — never per-user
    Python groups); each bucket is one vectorized pass: sort, shifted
    run-change compare, next-start gather. A bucket's users must fit a
    task's heap (salt/split upstream otherwise)."""
    from vietnamese_ocr_ray.functions.joins import key_bucket

    ds = read_parquet_clean(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "event_type", "ts", "event_id"],
    )

    def add_bucket(b: pa.Table) -> pa.Table:
        return b.append_column(
            "_bucket",
            pa.array(key_bucket(b.column("user_id"), num_buckets).astype(np.int32)),
        )

    def intervals(g: pd.DataFrame) -> pd.DataFrame:
        s = g.sort_values(["user_id", "ts", "event_id"], kind="stable")
        user = s["user_id"].to_numpy(np.int64)
        et = s["event_type"].to_numpy()
        ts = s["ts"].to_numpy().astype("datetime64[us]")
        n = len(s)
        start = np.ones(n, dtype=bool)
        start[1:] = (user[1:] != user[:-1]) | (et[1:] != et[:-1])
        idx = np.nonzero(start)[0]
        out = pd.DataFrame(
            {
                "user_id": user[idx],
                "event_type": et[idx],
                "valid_from": ts[idx],
            }
        )
        nxt = pd.Series(pd.NaT, index=out.index, dtype="datetime64[us]")
        if len(idx) > 1:
            same = user[idx[1:]] == user[idx[:-1]]
            nxt.iloc[:-1] = pd.Series(ts[idx[1:]]).where(pd.Series(same))
        out["valid_to"] = nxt
        return out

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(
            lambda g: intervals(g.drop(columns=["_bucket"])),
            batch_format="pandas",
        )
    )


def copurchase_pairs(
    sf_dir: str, k: int = 50, num_buckets: int = 32
) -> rd.Dataset:
    """Market-basket co-occurrence: top-``k`` part pairs appearing in
    the same order (the Apriori/fp-growth pair-counting step every
    recommender bootstrap runs). Basket = the DISTINCT parts of one
    order; pairs canonical (p1 < p2); ordering (n DESC, p1, p2).

    Scale shape: ONE orderkey-bucket shuffle co-locates each basket;
    per bucket one vectorized pass (sort, run-detect baskets, per-run
    ``triu_indices`` — basket sizes are bounded at ~7 lines in this
    schema, so pair fan-out is a small constant); pair counts ride the
    bucketed hash-aggregate; top-k is sort+limit on the count table."""
    from vietnamese_ocr_ray.functions.agg import hash_aggregate
    from vietnamese_ocr_ray.functions.joins import key_bucket

    ds = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    )

    def add_bucket(b: pa.Table) -> pa.Table:
        return b.append_column(
            "_bucket",
            pa.array(
                key_bucket(b.column("l_orderkey"), num_buckets).astype(np.int32)
            ),
        )

    def basket_pairs(g: pd.DataFrame) -> pa.Table:
        s = g.drop_duplicates(["l_orderkey", "l_partkey"]).sort_values(
            ["l_orderkey", "l_partkey"], kind="stable"
        )
        ok = s["l_orderkey"].to_numpy(np.int64)
        pk = s["l_partkey"].to_numpy(np.int64)
        n = ok.shape[0]
        out_a, out_b = [], []
        if n:
            change = np.ones(n, dtype=bool)
            change[1:] = ok[1:] != ok[:-1]
            starts = np.nonzero(change)[0]
            sizes = np.diff(np.append(starts, n))
            for st, m in zip(starts[sizes >= 2], sizes[sizes >= 2]):
                ii, jj = np.triu_indices(int(m), 1)
                seg = pk[st : st + m]
                out_a.append(seg[ii])
                out_b.append(seg[jj])
        a = np.concatenate(out_a) if out_a else np.empty(0, np.int64)
        b = np.concatenate(out_b) if out_b else np.empty(0, np.int64)
        u, c = np.unique(a * np.int64(1) * (1 << 32) + b, return_counts=True)
        # partkeys < 2^31 in this schema: pack (p1, p2) into one int64
        # for the partial count, unpack for the exchange
        return pa.table(
            {
                "p1": pa.array((u >> 32).astype(np.int64)),
                "p2": pa.array((u & ((1 << 32) - 1)).astype(np.int64)),
                "n": pa.array(c.astype(np.int64)),
            }
        )

    counts = hash_aggregate(
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(
            lambda g: basket_pairs(g.drop(columns=["_bucket"])),
            batch_format="pandas",
        ),
        ["p1", "p2"],
        {"n": ("n", "sum")},
    )
    return counts.sort(["n", "p1", "p2"], descending=[True, False, False]).limit(k)


def ewma_value(
    sf_dir: str, window: int = 16, num_buckets: int = 32
) -> rd.Dataset:
    """Trailing-window exponentially-weighted moving average of value
    per user (alpha = 1/2), ordered by (ts, event_id): weight 2^-(j+1)
    on the j-th lag, truncated at ``window`` rows and normalized over
    the rows actually present. The time-series smoother the untruncated
    recursion s_i = a*v_i + (1-a)*s_{i-1} approximates — truncation
    keeps every weight a POWER OF TWO, so scaling by 2^W makes the
    numerator an exact int64 dot product and the denominator the exact
    geometric sum 2^W - 2^(W-w); one float division per row.

    Scale shape: the rolling_avg contract — one user-bucket shuffle,
    per-bucket sort, W vectorized shifted adds with run-start clamping
    (zero per-row Python)."""
    from vietnamese_ocr_ray.functions.joins import key_bucket

    W = int(window)
    ds = read_parquet_clean(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "ts", "value"],
    )

    def add_bucket(b: pa.Table) -> pa.Table:
        return b.append_column(
            "_bucket",
            pa.array(key_bucket(b.column("user_id"), num_buckets).astype(np.int32)),
        )

    def ewma(g: pd.DataFrame) -> pa.Table:
        s = g.sort_values(["user_id", "ts", "event_id"], kind="stable")
        user = s["user_id"].to_numpy()
        u = np.rint(s["value"].to_numpy() * 1000.0).astype(np.int64)
        n = len(s)
        idx = np.arange(n, dtype=np.int64)
        new_user = np.ones(n, dtype=bool)
        new_user[1:] = user[1:] != user[:-1]
        run_start = np.maximum.accumulate(np.where(new_user, idx, 0))
        num = np.zeros(n, dtype=np.int64)
        for j in range(W):
            valid = idx - j >= run_start
            num[valid] += u[idx[valid] - j] << (W - 1 - j)
        wlen = np.minimum(idx - run_start + 1, W)
        den = (np.int64(1) << W) - (np.int64(1) << (W - wlen))
        return pa.table(
            {
                "event_id": pa.array(s["event_id"].to_numpy(np.int64)),
                "user_id": pa.array(user),
                "ewma": pa.array(
                    np.round(num / (den * 1000.0), 6), pa.float64()
                ),
            }
        )

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(
            lambda g: ewma(g.drop(columns=["_bucket"])), batch_format="pandas"
        )
    )


def nation_trade_matrix(sf_dir: str) -> rd.Dataset:
    """TPC-H Q7-shaped trade-flow matrix: exact-integer revenue between
    every (supplier nation, customer nation) pair. The multi-join
    showcase: two LARGE-side native hash joins (lineitem x orders on
    orderkey, then x customer on custkey) with the DIMENSION sides
    (supplier -> nationkey, nation -> name) broadcast once via ray.put
    — the join graph a warehouse query planner would pick, expressed as
    Ray Data operators.

    Scale shape: lineitem pre-aggregates to (orderkey, supp_nation)
    partials BEFORE the first join (the shuffle carries ~|orders| rows,
    not |lineitem|); revenue units are exact int64 cents x (100 -
    disc); the final (25 x 25)-key aggregate is one bucketed
    hash-aggregate; one division to DOUBLE at the end."""
    import ray

    from vietnamese_ocr_ray.functions.agg import hash_aggregate

    supplier = read_parquet_clean(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    ).to_pandas()
    nation = read_parquet_clean(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    ).to_pandas()
    supp_handle = ray.put(
        (
            pa.array(supplier["s_suppkey"].to_numpy(np.int64)),
            supplier["s_nationkey"].to_numpy(np.int64),
        )
    )
    nation_map = dict(zip(nation["n_nationkey"], nation["n_name"]))

    li = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )

    def partial(batch: pa.Table) -> pa.Table:
        keys, nat = ray.get(supp_handle)
        price_c = _cents(batch.column("l_extendedprice"), 100)
        disc = _cents(batch.column("l_discount"), 100)
        rev = pc.multiply(
            price_c, pc.subtract(pa.scalar(100, pa.int64()), disc)
        )
        sk = batch.column("l_suppkey")
        if isinstance(sk, pa.ChunkedArray):
            sk = sk.combine_chunks()
        sn = nat[pc.index_in(sk, value_set=keys).to_numpy()]
        t = pa.table(
            {
                "l_orderkey": batch.column("l_orderkey"),
                "supp_nation_key": pa.array(sn),
                "rev": rev,
                "n": pa.array(np.ones(batch.num_rows, np.int64)),
            }
        )
        return t.group_by(["l_orderkey", "supp_nation_key"]).aggregate(
            [("rev", "sum"), ("n", "sum")]
        ).rename_columns(["l_orderkey", "supp_nation_key", "rev", "n"])

    per_order = li.map_batches(partial, batch_format="pyarrow")
    orders = read_parquet_clean(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    )
    j1 = per_order.join(
        orders,
        join_type="inner",
        num_partitions=8,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )
    customer = read_parquet_clean(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    )
    j2 = j1.join(
        customer,
        join_type="inner",
        num_partitions=8,
        on=("o_custkey",),
        right_on=("c_custkey",),
    )

    def keyed(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "supp_nation_key": batch.column("supp_nation_key"),
                "cust_nation_key": batch.column("c_nationkey").cast(pa.int64()),
                "rev": batch.column("rev"),
                "n": batch.column("n"),
            }
        )

    agg = hash_aggregate(
        j2.map_batches(keyed, batch_format="pyarrow"),
        ["supp_nation_key", "cust_nation_key"],
        {"rev_units": ("rev", "sum"), "n_items": ("n", "sum")},
        num_buckets=8,
    )

    def finish(batch: pa.Table) -> pa.Table:
        sn = [
            nation_map[k]
            for k in np.asarray(batch.column("supp_nation_key"), np.int64)
        ]
        cn = [
            nation_map[k]
            for k in np.asarray(batch.column("cust_nation_key"), np.int64)
        ]
        return pa.table(
            {
                "supp_nation": pa.array(sn, pa.string()),
                "cust_nation": pa.array(cn, pa.string()),
                "n_items": batch.column("n_items"),
                "revenue": pc.divide(
                    pc.cast(batch.column("rev_units"), pa.float64()),
                    pa.scalar(10000.0),
                ),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def cohort_ltv(sf_dir: str, num_buckets: int = 32) -> rd.Dataset:
    """Weekly-cohort lifetime value: users are cohorted by the
    Monday-start week of their FIRST event (any type); purchase value
    accrues to (cohort, week_offset) cells, reported per-week and
    cumulatively — the revenue companion of cohort_retention.

    Exactness: value rides as milli-unit int64 from the scan; the only
    floats are the two final /1000.0 casts. Week arithmetic is the
    cohort_retention convention (epoch-day Monday truncation).

    Scale shape: one pass emits per-batch (user, week, milli) partials
    (all active weeks, zero value for non-purchase activity, so cells
    with engagement but no revenue still appear); ONE user-bucket
    shuffle resolves first weeks; a (cohorts x offsets)-bounded
    aggregate finishes; the cumulative sum runs on that tiny table."""
    from vietnamese_ocr_ray.functions.agg import hash_aggregate
    from vietnamese_ocr_ray.functions.joins import key_bucket

    ds = read_parquet_clean(
        f"{sf_dir}/events.parquet",
        columns=["ts", "user_id", "event_type", "value"],
    )

    def partial(batch: pa.Table) -> pa.Table:
        us = (
            batch.column("ts")
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
        )
        days = us // 86_400_000_000
        week = days - ((days + 3) % 7)
        user = batch.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        is_p = pc.equal(
            batch.column("event_type"), pa.scalar("purchase")
        ).to_numpy(zero_copy_only=False)
        vm = np.where(
            is_p,
            np.rint(batch.column("value").to_numpy(zero_copy_only=False) * 1000.0),
            0.0,
        ).astype(np.int64)
        t = pa.table(
            {
                "user_id": pa.array(user),
                "week": pa.array(week),
                "v": pa.array(vm),
            }
        )
        g = t.group_by(["user_id", "week"]).aggregate(
            [("v", "sum")]
        ).rename_columns(["user_id", "week", "v"])
        return g.append_column(
            "_bucket",
            pa.array(
                key_bucket(g.column("user_id"), num_buckets).astype(np.int32)
            ),
        )

    def bucket_cells(g: pd.DataFrame) -> pa.Table:
        uw = g.groupby(["user_id", "week"], as_index=False)["v"].sum()
        cohort = uw.groupby("user_id")["week"].transform("min")
        out = pd.DataFrame(
            {
                "cohort": cohort.to_numpy(np.int64),
                "week_offset": (
                    (uw["week"].to_numpy(np.int64) - cohort.to_numpy(np.int64))
                    // 7
                ),
                "vm": uw["v"].to_numpy(np.int64),
            }
        ).groupby(["cohort", "week_offset"], as_index=False)["vm"].sum()
        return pa.Table.from_pandas(
            out, preserve_index=False
        ).replace_schema_metadata(None)

    cells = (
        hash_aggregate(
            ds.map_batches(partial, batch_format="pyarrow")
            .groupby("_bucket")
            .map_groups(
                lambda g: bucket_cells(g.drop(columns=["_bucket"])),
                batch_format="pandas",
            ),
            ["cohort", "week_offset"],
            {"vm": ("vm", "sum")},
            num_buckets=4,
        )
        .to_pandas()
        .sort_values(["cohort", "week_offset"])
        .reset_index(drop=True)
    )
    cum = cells.groupby("cohort")["vm"].cumsum().to_numpy(np.int64)
    return rd.from_arrow(
        pa.table(
            {
                "cohort_day": pa.array(cells["cohort"].to_numpy(np.int64)),
                "week_offset": pa.array(
                    cells["week_offset"].to_numpy(np.int64)
                ),
                "revenue": pa.array(
                    cells["vm"].to_numpy(np.int64).astype(np.float64) / 1000.0,
                    pa.float64(),
                ),
                "cum_revenue": pa.array(
                    cum.astype(np.float64) / 1000.0, pa.float64()
                ),
            }
        )
    )


def time_to_convert(sf_dir: str, num_buckets: int = 32) -> rd.Dataset:
    """Funnel-latency histogram: for every user whose first 'signup'
    is followed (at or after) by a 'purchase', the whole-day delay
    between the two firsts — reported as exact per-day user counts
    plus each day's share of converters. The funnel-latency report a
    growth pipeline publishes next to cohort_retention.

    Exactness: all timestamps ride as integer microseconds, the day
    bucket is integer floor division, counts are exact; share is one
    rounded division. Scale shape: a pruned two-type scan, ONE
    user-bucket shuffle (rows bounded by signup/purchase events), a
    per-day aggregate whose key space is the delay range in days."""
    from vietnamese_ocr_ray.functions.agg import hash_aggregate
    from vietnamese_ocr_ray.functions.joins import key_bucket

    ds = read_parquet_clean(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_type"],
        filter=(pc.field("event_type") == "signup")
        | (pc.field("event_type") == "purchase"),
    )

    def tag(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": batch.column("user_id"),
                "us": pc.cast(batch.column("ts"), pa.int64()),
                "is_signup": pc.equal(
                    batch.column("event_type"), pa.scalar("signup")
                ),
                "_bucket": pa.array(
                    key_bucket(batch.column("user_id"), num_buckets).astype(
                        np.int32
                    )
                ),
            }
        )

    def bucket_delays(g: pd.DataFrame) -> pa.Table:
        s = (
            g[g["is_signup"]]
            .groupby("user_id")["us"]
            .min()
            .rename("su")
        )
        p = g[~g["is_signup"]].merge(
            s, left_on="user_id", right_index=True, how="inner"
        )
        p = p[p["us"] >= p["su"]]
        if not len(p):
            return pa.table(
                {
                    "delay_days": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                }
            )
        first_p = p.groupby("user_id").agg(pu=("us", "min"), su=("su", "min"))
        days = (
            (first_p["pu"].to_numpy(np.int64) - first_p["su"].to_numpy(np.int64))
            // 86_400_000_000
        )
        u, c = np.unique(days, return_counts=True)
        return pa.table(
            {"delay_days": pa.array(u), "n": pa.array(c.astype(np.int64))}
        )

    hist = (
        hash_aggregate(
            ds.map_batches(tag, batch_format="pyarrow")
            .groupby("_bucket")
            .map_groups(
                lambda g: bucket_delays(g.drop(columns=["_bucket"])),
                batch_format="pandas",
            ),
            ["delay_days"],
            {"n_users": ("n", "sum")},
            num_buckets=4,
        )
        .to_pandas()
        .sort_values("delay_days")
        .reset_index(drop=True)
    )
    total = int(hist["n_users"].sum())
    return rd.from_arrow(
        pa.table(
            {
                "delay_days": pa.array(hist["delay_days"].to_numpy(np.int64)),
                "n_users": pa.array(hist["n_users"].to_numpy(np.int64)),
                "share": pa.array(
                    np.round(
                        hist["n_users"].to_numpy(np.int64) / float(total), 6
                    ),
                    pa.float64(),
                ),
            }
        )
    )


def theilsen_value_hour(sf_dir: str) -> rd.Dataset:
    """Theil-Sen ROBUST fit of hourly-mean value ~ hour_of_day per
    event_type — the breakdown-resistant companion of
    value_hour_regression (one poisoned hour moves OLS, not the
    median-of-slopes): slope = median over hour pairs (i < j) of
    (m_j - m_i)/(j - i); intercept = median over hours of
    (m_i - slope*i).

    Exactness: hourly means derive from exact milli-unit sums and
    counts by ONE fixed division; the pairwise slopes are single float
    expressions; medians are order statistics with the (lo + hi) * 0.5
    midpoint convention, so both engines select identical doubles.

    Scale shape: ONE distributed (event_type, hour) exact-integer
    aggregate (tiny partials per batch); the pairwise stage runs on a
    |types| x 24-row table — slopes are C(24,2)=276 per type no matter
    how many events streamed in."""
    from vietnamese_ocr_ray.functions.agg import hash_aggregate

    ds = read_parquet_clean(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts", "value"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        vm = _cents(batch.column("value"), 1000).to_numpy(zero_copy_only=False)
        epoch = pc.divide(
            pc.cast(batch.column("ts"), pa.int64()), pa.scalar(1_000_000)
        ).to_numpy(zero_copy_only=False)
        h = (epoch // 3600) % 24
        t = pa.table(
            {
                "event_type": batch.column("event_type"),
                "hour": pa.array(h),
                "vm": pa.array(vm),
            }
        )
        return t.group_by(["event_type", "hour"]).aggregate(
            [("vm", "sum"), ("vm", "count")]
        ).rename_columns(["event_type", "hour", "vm", "n"])

    hourly = (
        hash_aggregate(
            ds.map_batches(partial, batch_format="pyarrow"),
            ["event_type", "hour"],
            {"vm": ("vm", "sum"), "n": ("n", "sum")},
            num_buckets=4,
        )
        .to_pandas()
        .sort_values(["event_type", "hour"])
    )

    def median_mid(v: np.ndarray) -> float:
        s = np.sort(v)
        n = len(s)
        lo, hi = s[(n - 1) // 2], s[n // 2]
        return (lo + hi) * 0.5

    rows = []
    for et, g in hourly.groupby("event_type", sort=True):
        hrs = g["hour"].to_numpy(np.int64)
        m = g["vm"].to_numpy(np.int64).astype(np.float64) / (
            g["n"].to_numpy(np.int64) * 1000.0
        )
        i, j = np.triu_indices(len(hrs), 1)
        slopes = (m[j] - m[i]) / (hrs[j] - hrs[i]).astype(np.float64)
        slope = median_mid(slopes)
        intercept = median_mid(m - slope * hrs.astype(np.float64))
        rows.append((et, len(hrs), round(slope, 6), round(intercept, 6)))
    return rd.from_arrow(
        pa.table(
            {
                "event_type": pa.array([r[0] for r in rows], pa.string()),
                "n_hours": pa.array([r[1] for r in rows], pa.int64()),
                "slope": pa.array([r[2] for r in rows], pa.float64()),
                "intercept": pa.array([r[3] for r in rows], pa.float64()),
            }
        )
    )


def position_attribution(sf_dir: str, num_buckets: int = 32) -> rd.Dataset:
    """Position-based (40/20/40) multi-touch attribution: every click
    between a user's previous purchase and their next purchase is a
    touch on that conversion's path; the first and last touch each get
    400,000 ppm of the credit, middles split the remaining 200,000 by
    exact largest-remainder ints (a single touch takes the full
    1,000,000). Credits aggregate by the CLICK's hour-of-day — "which
    hours actually drive conversions", the multi-touch upgrade of
    last-touch purchase_attribution.

    Exactness: ppm credits are exact integers end-to-end. Scale shape:
    the two filtered streams ride ONE user-bucket shuffle; paths
    resolve per bucket with vectorized forward merge_asof + lag (no
    per-row Python); a 24-key aggregate finishes."""
    from vietnamese_ocr_ray.functions.agg import hash_aggregate
    from vietnamese_ocr_ray.functions.joins import key_bucket

    ds = read_parquet_clean(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "ts", "event_type"],
        filter=(pc.field("event_type") == "click")
        | (pc.field("event_type") == "purchase"),
    )

    def tag(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": batch.column("event_id"),
                "user_id": batch.column("user_id"),
                "us": pc.cast(batch.column("ts"), pa.int64()),
                "is_click": pc.equal(
                    batch.column("event_type"), pa.scalar("click")
                ),
                "_bucket": pa.array(
                    key_bucket(batch.column("user_id"), num_buckets).astype(
                        np.int32
                    )
                ),
            }
        )

    def bucket_credit(g: pd.DataFrame) -> pa.Table:
        clicks = g[g["is_click"]].sort_values(
            ["us", "event_id"], kind="stable"
        )
        purch = g[~g["is_click"]].sort_values(
            ["us", "event_id"], kind="stable"
        )
        if not len(clicks) or not len(purch):
            return pa.table(
                {
                    "hour": pa.array([], pa.int64()),
                    "n_touches": pa.array([], pa.int64()),
                    "credit_ppm": pa.array([], pa.int64()),
                }
            )
        purch = purch.assign(
            prev_us=purch.groupby("user_id")["us"].shift(1)
        )
        m = pd.merge_asof(
            clicks[["user_id", "us", "event_id"]].sort_values("us", kind="stable"),
            purch[["user_id", "us", "event_id", "prev_us"]]
            .sort_values("us", kind="stable")
            .rename(
                columns={
                    "us": "p_us",
                    "event_id": "p_id",
                    "prev_us": "p_prev",
                }
            ),
            left_on="us",
            right_on="p_us",
            by="user_id",
            direction="forward",
            allow_exact_matches=False,
        )
        m = m[m["p_id"].notna()]
        m = m[m["p_prev"].isna() | (m["us"] > m["p_prev"])]
        if not len(m):
            return pa.table(
                {
                    "hour": pa.array([], pa.int64()),
                    "n_touches": pa.array([], pa.int64()),
                    "credit_ppm": pa.array([], pa.int64()),
                }
            )
        m = m.sort_values(["user_id", "p_id", "us", "event_id"], kind="stable")
        key = (
            m["user_id"].to_numpy(np.int64),
            m["p_id"].to_numpy(np.int64),
        )
        n = len(m)
        new = np.ones(n, bool)
        new[1:] = (key[0][1:] != key[0][:-1]) | (key[1][1:] != key[1][:-1])
        starts = np.flatnonzero(new)
        sizes = np.diff(np.append(starts, n))
        size_r = np.repeat(sizes, sizes)
        pos = np.arange(n) - np.repeat(starts, sizes)
        credit = np.zeros(n, np.int64)
        single = size_r == 1
        credit[single] = 1_000_000
        multi = ~single
        first = multi & (pos == 0)
        last = multi & (pos == size_r - 1)
        credit[first | last] = 400_000
        mid = multi & ~first & ~last
        mcount = size_r - 2
        with np.errstate(divide="ignore", invalid="ignore"):
            base = np.where(mcount > 0, 200_000 // np.maximum(mcount, 1), 0)
            rem = np.where(mcount > 0, 200_000 % np.maximum(mcount, 1), 0)
        midx = pos - 1
        credit[mid] = base[mid] + (midx[mid] < rem[mid]).astype(np.int64)
        # two-touch paths: 400k + 400k only sums to 800k — give the
        # undistributed 200k to the FIRST touch (deterministic)
        two_first = multi & (size_r == 2) & (pos == 0)
        credit[two_first] += 200_000
        hour = (m["us"].to_numpy(np.int64) // 3_600_000_000) % 24
        df = pd.DataFrame(
            {"hour": hour, "n": np.ones(n, np.int64), "credit": credit}
        ).groupby("hour", as_index=False).agg(
            n_touches=("n", "sum"), credit_ppm=("credit", "sum")
        )
        return pa.Table.from_pandas(
            df, preserve_index=False
        ).replace_schema_metadata(None)

    return hash_aggregate(
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(
            lambda g: bucket_credit(g.drop(columns=["_bucket"])),
            batch_format="pandas",
        ),
        ["hour"],
        {"n_touches": ("n_touches", "sum"), "credit_ppm": ("credit_ppm", "sum")},
        num_buckets=4,
    )


def changepoint_hourly(sf_dir: str) -> rd.Dataset:
    """Single-changepoint detection (binary segmentation, SSE cost)
    per event_type over the hourly event-count series: the split that
    minimizes SSE_left + SSE_right, reported with the variance
    reduction — the monitoring primitive behind "did traffic change
    shape at hour H".

    Determinism: hourly counts are exact ints; each candidate split's
    cost is the identical double expression (q - s*s/n per side, sides
    summed left+right) evaluated from exact integer prefix sums; the
    argmin ties to the SMALLEST split hour.

    Scale shape: one distributed (type, hour) count aggregate (the
    theilsen shape); the candidate scan is |hours| per type on the
    driver regardless of event volume."""
    from vietnamese_ocr_ray.functions.agg import hash_aggregate

    ds = read_parquet_clean(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        epoch = pc.divide(
            pc.cast(batch.column("ts"), pa.int64()), pa.scalar(1_000_000)
        ).to_numpy(zero_copy_only=False)
        hour = epoch // 3600
        t = pa.table(
            {"event_type": batch.column("event_type"), "hour": pa.array(hour)}
        )
        return t.group_by(["event_type", "hour"]).aggregate(
            [("hour", "count")]
        ).rename_columns(["event_type", "hour", "n"])

    hourly = (
        hash_aggregate(
            ds.map_batches(partial, batch_format="pyarrow"),
            ["event_type", "hour"],
            {"n": ("n", "sum")},
            num_buckets=4,
        )
        .to_pandas()
        .sort_values(["event_type", "hour"])
    )

    rows = []
    for et, g in hourly.groupby("event_type", sort=True):
        x = g["n"].to_numpy(np.int64).astype(np.float64)
        hrs = g["hour"].to_numpy(np.int64)
        n = len(x)
        s = np.cumsum(x)
        q = np.cumsum(x * x)
        st, qt = s[-1], q[-1]
        sse_total = qt - st * st / n
        best = (np.inf, -1)
        for k in range(1, n):  # split BEFORE index k
            sl, ql, nl = s[k - 1], q[k - 1], k
            sr, qr, nr = st - sl, qt - ql, n - k
            sse = (ql - sl * sl / nl) + (qr - sr * sr / nr)
            if sse < best[0]:
                best = (sse, k)
        k = best[1]
        rows.append(
            (
                et,
                n,
                int(hrs[k]),
                round(best[0], 6),
                round(sse_total - best[0], 6),
            )
        )
    return rd.from_arrow(
        pa.table(
            {
                "event_type": pa.array([r[0] for r in rows], pa.string()),
                "n_hours": pa.array([r[1] for r in rows], pa.int64()),
                "split_hour": pa.array([r[2] for r in rows], pa.int64()),
                "sse": pa.array([r[3] for r in rows], pa.float64()),
                "sse_reduction": pa.array(
                    [r[4] for r in rows], pa.float64()
                ),
            }
        )
    )


def wow_change(sf_dir: str) -> rd.Dataset:
    """Week-over-week traffic deltas per event_type: weekly counts
    (Monday-start, the cohort_retention convention) with the absolute
    and percent change vs the previous observed week — the KPI digest
    shape. Exact integer counts; pct is one rounded division (NULL for
    a type's first week).

    Scale shape: one distributed (type, week) count aggregate; the
    lag runs on the |types| x |weeks| table."""
    from vietnamese_ocr_ray.functions.agg import hash_aggregate

    ds = read_parquet_clean(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        us = (
            batch.column("ts")
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
        )
        days = us // 86_400_000_000
        week = days - ((days + 3) % 7)
        t = pa.table(
            {"event_type": batch.column("event_type"), "week": pa.array(week)}
        )
        return t.group_by(["event_type", "week"]).aggregate(
            [("week", "count")]
        ).rename_columns(["event_type", "week", "n"])

    weekly = (
        hash_aggregate(
            ds.map_batches(partial, batch_format="pyarrow"),
            ["event_type", "week"],
            {"n": ("n", "sum")},
            num_buckets=4,
        )
        .to_pandas()
        .sort_values(["event_type", "week"])
        .reset_index(drop=True)
    )
    prev = weekly.groupby("event_type")["n"].shift(1)
    delta = weekly["n"] - prev
    pct = np.where(
        prev.notna(),
        np.round(
            delta.to_numpy(np.float64) / prev.to_numpy(np.float64), 6
        ),
        np.nan,
    )
    return rd.from_arrow(
        pa.table(
            {
                "event_type": pa.array(
                    weekly["event_type"].to_numpy(), pa.string()
                ),
                "week_day": pa.array(weekly["week"].to_numpy(np.int64)),
                "n_events": pa.array(weekly["n"].to_numpy(np.int64)),
                "delta": pa.array(
                    delta.to_numpy(np.float64), pa.float64()
                ),
                "pct_change": pa.array(pct, pa.float64()),
            }
        )
    )


def funnel_steps(
    sf_dir: str,
    steps: tuple = ("view", "click", "purchase"),
    num_buckets: int = 32,
) -> rd.Dataset:
    """Ordered funnel analysis: a user reaches step k iff an event of
    step k's type occurs AT OR AFTER the user's first-reach time of
    step k-1 (step 1 = the user's first event of that type). Reports
    per-step reached-user counts and the conversion from step 1 in
    exact integer ppm — the classic product-analytics funnel the
    reference's event tooling has no analog for.

    Exactness: first-reach times are min() over int64 epoch-us; the
    >= chaining and the ppm floor division are integer ops, so both
    engines agree bit-for-bit.

    Scale shape: the filtered event stream rides ONE user-bucket
    shuffle; each bucket resolves its users' whole chain vectorized
    (groupby-min + merge per step, no per-row Python); only
    |steps|-row partial counts leave the buckets."""
    from vietnamese_ocr_ray.functions.agg import hash_aggregate
    from vietnamese_ocr_ray.functions.joins import key_bucket

    type_filter = None
    for s in steps:
        e = pc.field("event_type") == s
        type_filter = e if type_filter is None else (type_filter | e)
    ds = read_parquet_clean(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_type"],
        filter=type_filter,
    )

    def tag(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": batch.column("user_id"),
                "us": pc.cast(batch.column("ts"), pa.int64()),
                "event_type": batch.column("event_type"),
                "_bucket": pa.array(
                    key_bucket(batch.column("user_id"), num_buckets).astype(
                        np.int32
                    )
                ),
            }
        )

    def bucket_counts(g: pd.DataFrame) -> pa.Table:
        cur = (
            g[g["event_type"] == steps[0]]
            .groupby("user_id", as_index=False)["us"]
            .min()
            .rename(columns={"us": "prev"})
        )
        ns = [len(cur)]
        for s in steps[1:]:
            sub = g[g["event_type"] == s].merge(cur, on="user_id")
            sub = sub[sub["us"] >= sub["prev"]]
            cur = (
                sub.groupby("user_id", as_index=False)["us"]
                .min()
                .rename(columns={"us": "prev"})
            )
            ns.append(len(cur))
        return pa.table(
            {
                "step": pa.array(
                    np.arange(1, len(steps) + 1, dtype=np.int64)
                ),
                "n": pa.array(np.asarray(ns, np.int64)),
            }
        )

    totals = (
        hash_aggregate(
            ds.map_batches(tag, batch_format="pyarrow")
            .groupby("_bucket")
            .map_groups(bucket_counts, batch_format="pandas"),
            ["step"],
            {"n": ("n", "sum")},
            num_buckets=4,
        )
        .to_pandas()
        .sort_values("step")
        .reset_index(drop=True)
    )
    n = totals["n"].to_numpy(np.int64)
    first = int(n[0]) if len(n) else 0
    conv = (
        (n * 1_000_000) // first if first > 0 else np.zeros(len(n), np.int64)
    )
    return rd.from_arrow(
        pa.table(
            {
                "step": pa.array(totals["step"].to_numpy(np.int64)),
                "event_type": pa.array(list(steps), pa.string()),
                "n_users": pa.array(n),
                "conv_ppm": pa.array(conv.astype(np.int64)),
            }
        )
    )


def spearman_value_hour(sf_dir: str) -> rd.Dataset:
    """Spearman rank correlation between value and hour-of-day per
    event_type — the rank-based (monotone-association) companion of
    the Pearson value_hour_corr: ties get AVERAGE ranks, carried
    DOUBLED so they stay exact integers (2*avg_rank = 2*cum_before +
    tie_count + 1).

    Exactness: value quantizes to milli-units, so ranks derive from a
    (vm -> count) histogram by exact cumulative sums; all five moment
    sums are exact (arbitrary-precision Python int here, HUGEINT in
    SQL); rho is ONE fixed float expression num / (sqrt(dx) * sqrt(dy))
    over them, rounded to 6dp.

    Scale shape: one corpus pass of per-batch (event_type, vm, hour)
    partial counts -> bucketed hash-aggregate bounded by distinct
    (type, milli-value, hour) combos -> O(distinct) driver finish.
    No per-event sort: ranking over a value HISTOGRAM replaces the
    global sort a naive Spearman needs."""
    import math

    from vietnamese_ocr_ray.functions.agg import hash_aggregate

    ds = read_parquet_clean(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts", "value"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        vm = _cents(batch.column("value"), 1000).to_numpy(zero_copy_only=False)
        epoch = pc.divide(
            pc.cast(batch.column("ts"), pa.int64()), pa.scalar(1_000_000)
        ).to_numpy(zero_copy_only=False)
        h = (epoch // 3600) % 24
        t = pa.table(
            {
                "event_type": batch.column("event_type"),
                "vm": pa.array(vm),
                "hour": pa.array(h),
            }
        )
        return t.group_by(["event_type", "vm", "hour"]).aggregate(
            [("vm", "count")]
        ).rename_columns(
            ["event_type", "vm", "hour", "n"]
        ).replace_schema_metadata(None)

    g = (
        hash_aggregate(
            ds.map_batches(partial, batch_format="pyarrow"),
            ["event_type", "vm", "hour"],
            {"n": ("n", "sum")},
            num_buckets=8,
        )
        .to_pandas()
        .sort_values(["event_type", "vm", "hour"])
    )

    def doubled_ranks(keys: np.ndarray, cnt: np.ndarray):
        """keys ascending-unique, cnt totals -> doubled average rank."""
        cum = np.cumsum(cnt) - cnt
        return 2 * cum + cnt + 1

    rows = []
    for et, t in g.groupby("event_type", sort=True):
        vt = t.groupby("vm", sort=True)["n"].sum()
        ht = t.groupby("hour", sort=True)["n"].sum()
        vk = vt.index.to_numpy(np.int64)
        hk = ht.index.to_numpy(np.int64)
        r2v = doubled_ranks(vk, vt.to_numpy(np.int64))
        r2h = doubled_ranks(hk, ht.to_numpy(np.int64))
        x = r2v[np.searchsorted(vk, t["vm"].to_numpy(np.int64))]
        y = r2h[np.searchsorted(hk, t["hour"].to_numpy(np.int64))]
        c = t["n"].to_numpy(np.int64)
        # arbitrary-precision int moments (HUGEINT on the SQL side)
        n = int(c.sum())
        sx = sum(int(a) * int(b) for a, b in zip(c, x))
        sy = sum(int(a) * int(b) for a, b in zip(c, y))
        sxy = sum(int(a) * int(b) * int(d) for a, b, d in zip(c, x, y))
        sxx = sum(int(a) * int(b) * int(b) for a, b in zip(c, x))
        syy = sum(int(a) * int(b) * int(b) for a, b in zip(c, y))
        num = n * sxy - sx * sy
        dx = n * sxx - sx * sx
        dy = n * syy - sy * sy
        rho = (
            round(float(num) / (math.sqrt(float(dx)) * math.sqrt(float(dy))), 6)
            if dx > 0 and dy > 0
            else 0.0
        )
        rows.append((et, n, rho))
    return rd.from_arrow(
        pa.table(
            {
                "event_type": pa.array([r[0] for r in rows], pa.string()),
                "n_events": pa.array([r[1] for r in rows], pa.int64()),
                "rho": pa.array([r[2] for r in rows], pa.float64()),
            }
        )
    )


def holt_forecast(
    sf_dir: str,
    alpha: float = 0.5,
    beta: float = 0.5,
    horizon: int = 3,
) -> rd.Dataset:
    """Holt's linear-trend exponential smoothing over the hourly event
    count series per event_type (missing hours count 0 over the GLOBAL
    hour range), plus a ``horizon``-step linear forecast — the trend
    upgrade of the single-parameter ewma_value.

    Determinism contract: y is an exact integer series; the recursion
        l_i = alpha*y_i + (1-alpha)*(l_{i-1} + t_{i-1})
        t_i = beta*(l_i - l_{i-1}) + (1-beta)*t_{i-1}
    (l_0 = y_0, t_0 = y_1 - y_0) is replayed float-op-for-float-op by
    a recursive CTE on the SQL side — SEQUENTIAL order is the spec, so
    both engines round identically at every step.

    Scale shape: events reduce to a (type, hour)-bounded exact-count
    aggregate (the theilsen contract); the recursion runs driver-side
    over at most |types| x |hours| points — bounded by calendar span,
    not row count."""
    from vietnamese_ocr_ray.functions.agg import hash_aggregate

    ds = read_parquet_clean(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        # unit-safe: normalize to datetime64[us] BEFORE the int cast so
        # ns-unit parquet (pandas default) buckets identically
        epoch = (
            batch.column("ts")
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
            // 1_000_000
        )
        h = epoch // 3600
        t = pa.table(
            {
                "event_type": batch.column("event_type"),
                "h": pa.array(h),
                "n": pa.array(np.ones(len(h), np.int64)),
            }
        )
        return t.group_by(["event_type", "h"]).aggregate(
            [("n", "sum")]
        ).rename_columns(["event_type", "h", "n"])

    hourly = (
        hash_aggregate(
            ds.map_batches(partial, batch_format="pyarrow"),
            ["event_type", "h"],
            {"n": ("n", "sum")},
            num_buckets=8,
        )
        .to_pandas()
        .sort_values(["event_type", "h"])
    )
    hmin = int(hourly["h"].min())
    hmax = int(hourly["h"].max())
    H = hmax - hmin + 1
    rows = []
    for et, t in hourly.groupby("event_type", sort=True):
        y = np.zeros(H, np.int64)
        y[t["h"].to_numpy(np.int64) - hmin] = t["n"].to_numpy(np.int64)
        lvl = float(y[0])
        trd = float(y[1]) - float(y[0])
        for i in range(1, H):
            new = alpha * float(y[i]) + (1.0 - alpha) * (lvl + trd)
            trd = beta * (new - lvl) + (1.0 - beta) * trd
            lvl = new
        fc = [round(lvl + (k + 1) * trd, 6) for k in range(horizon)]
        rows.append((et, H, round(lvl, 6), round(trd, 6), fc))
    out = {
        "event_type": pa.array([r[0] for r in rows], pa.string()),
        "n_hours": pa.array([r[1] for r in rows], pa.int64()),
        "level": pa.array([r[2] for r in rows], pa.float64()),
        "trend": pa.array([r[3] for r in rows], pa.float64()),
    }
    for k in range(horizon):
        out[f"f{k + 1}"] = pa.array([r[4][k] for r in rows], pa.float64())
    return rd.from_arrow(pa.table(out))


def asof_join_latency(sf_dir: str, num_buckets: int = 32) -> rd.Dataset:
    """Distributed AS-OF JOIN: each 'purchase' event joins the SAME
    user's most recent 'click' at-or-before it, and matched latencies
    roll up per purchase hour-of-day — the event-attribution join Ray
    Data has no native operator for (the custom-operator case the
    design brief calls out explicitly).

    Semantics: backward as-of on integer epoch-us, partitioned by
    user; per-event latency floors to whole seconds BEFORE summing so
    both engines add identical integers. Unmatched purchases count in
    n_purchases but not n_matched.

    Scale shape: a two-type pruned scan rides ONE user-bucket shuffle;
    each bucket sorts only its own users' rows and resolves the as-of
    with a vectorized pandas merge_asof (per-user via the `by` key) —
    the canonical "groupby key, sort within partition, scan once"
    distributed as-of plan. Only per-hour partial sums (<=24 rows per
    bucket) leave the buckets."""
    from vietnamese_ocr_ray.functions.agg import hash_aggregate
    from vietnamese_ocr_ray.functions.joins import key_bucket

    ds = read_parquet_clean(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_type"],
        filter=(pc.field("event_type") == "purchase")
        | (pc.field("event_type") == "click"),
    )

    def tag(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": batch.column("user_id"),
                "us": pc.cast(batch.column("ts"), pa.int64()),
                "is_p": pc.equal(
                    batch.column("event_type"), pa.scalar("purchase")
                ),
                "_bucket": pa.array(
                    key_bucket(batch.column("user_id"), num_buckets).astype(
                        np.int32
                    )
                ),
            }
        )

    def bucket_asof(g: pd.DataFrame) -> pa.Table:
        p = g[g["is_p"]].sort_values("us", kind="stable")
        c = (
            g[~g["is_p"]]
            .sort_values("us", kind="stable")
            .rename(columns={"us": "cus"})
        )
        if not len(p):
            return pa.table(
                {
                    "hour": pa.array([], pa.int64()),
                    "n_purchases": pa.array([], pa.int64()),
                    "n_matched": pa.array([], pa.int64()),
                    "sum_latency_s": pa.array([], pa.int64()),
                }
            )
        m = pd.merge_asof(
            p[["user_id", "us"]],
            c[["user_id", "cus"]],
            left_on="us",
            right_on="cus",
            by="user_id",
            direction="backward",
        )
        hour = (m["us"].to_numpy(np.int64) // 1_000_000 // 3600) % 24
        matched = m["cus"].notna().to_numpy()
        lat = np.zeros(len(m), np.int64)
        lat[matched] = (
            m["us"].to_numpy(np.int64)[matched]
            - m["cus"].to_numpy("float64")[matched].astype(np.int64)
        ) // 1_000_000
        out = (
            pd.DataFrame(
                {
                    "hour": hour,
                    "n_purchases": np.ones(len(m), np.int64),
                    "n_matched": matched.astype(np.int64),
                    "sum_latency_s": lat,
                }
            )
            .groupby("hour", as_index=False)
            .sum()
        )
        return pa.Table.from_pandas(
            out, preserve_index=False
        ).replace_schema_metadata(None)

    agg = (
        hash_aggregate(
            ds.map_batches(tag, batch_format="pyarrow")
            .groupby("_bucket")
            .map_groups(bucket_asof, batch_format="pandas"),
            ["hour"],
            {
                "n_purchases": ("n_purchases", "sum"),
                "n_matched": ("n_matched", "sum"),
                "sum_latency_s": ("sum_latency_s", "sum"),
            },
            num_buckets=4,
        )
        .to_pandas()
        .sort_values("hour")
    )
    nm = agg["n_matched"].to_numpy(np.int64)
    sl = agg["sum_latency_s"].to_numpy(np.int64)
    avg = np.where(nm > 0, np.round(sl / np.maximum(nm, 1), 6), 0.0)
    return rd.from_arrow(
        pa.table(
            {
                "hour": pa.array(agg["hour"].to_numpy(np.int64)),
                "n_purchases": pa.array(
                    agg["n_purchases"].to_numpy(np.int64)
                ),
                "n_matched": pa.array(nm),
                "sum_latency_s": pa.array(sl),
                "avg_latency_s": pa.array(avg, pa.float64()),
            }
        )
    )


def mannwhitney_value(sf_dir: str) -> rd.Dataset:
    """Mann-Whitney U rank-sum test of each event_type's value
    distribution against ALL OTHER types pooled — the nonparametric
    location-shift companion of ks_test_value, with the textbook
    tie-corrected normal approximation.

    Exactness: values quantize to milli-units, so ranks come from the
    COMBINED (vm -> count) histogram as doubled average ranks
    (2*cum_before + tie + 1 — exact integers, the spearman_value_hour
    device); U, the tie term sum(t^3 - t), and all counts stay exact
    integers, and z is ONE fixed float expression over them rounded
    to 6dp — replayed operator-for-operator in SQL.

    Scale shape: one corpus pass of (event_type, vm) partial counts ->
    a hash-aggregate bounded by distinct (type, milli-value) pairs ->
    O(distinct) driver finish. The histogram rank trick removes the
    global per-event sort a naive rank-sum needs."""
    import math

    from vietnamese_ocr_ray.functions.agg import hash_aggregate

    ds = read_parquet_clean(
        f"{sf_dir}/events.parquet", columns=["event_type", "value"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        vm = _cents(batch.column("value"), 1000)
        t = pa.table(
            {"event_type": batch.column("event_type"), "vm": vm}
        )
        g = t.group_by(["event_type", "vm"]).aggregate([([], "count_all")])
        return g.rename_columns(["event_type", "vm", "n"])

    g = (
        hash_aggregate(
            ds.map_batches(partial, batch_format="pyarrow"),
            ["event_type", "vm"],
            {"n": ("n", "sum")},
            num_buckets=8,
        )
        .to_pandas()
        .sort_values(["vm", "event_type"])
    )
    tot = g.groupby("vm", sort=True)["n"].sum()
    vk = tot.index.to_numpy(np.int64)
    cnt = tot.to_numpy(np.int64)
    cum = np.cumsum(cnt) - cnt
    r2 = 2 * cum + cnt + 1  # doubled average rank per distinct vm
    n = int(cnt.sum())
    # tie correction term sum(t^3 - t) over tie groups (exact int)
    tie_t = int(sum(int(t) ** 3 - int(t) for t in cnt))
    rows = []
    for et, t in g.groupby("event_type", sort=True):
        pos = np.searchsorted(vk, t["vm"].to_numpy(np.int64))
        c = t["n"].to_numpy(np.int64)
        n_a = int(c.sum())
        n_b = n - n_a
        r2_a = int(sum(int(a) * int(b) for a, b in zip(c, r2[pos])))
        u2 = r2_a - n_a * (n_a + 1)  # doubled U statistic, exact int
        u = u2 / 2.0
        mu = n_a * n_b / 2.0
        sig2 = (
            n_a * n_b / 12.0 * ((n + 1) - tie_t / (n * (n - 1.0)))
        )
        z = round((u - mu) / math.sqrt(sig2), 6) if sig2 > 0 else 0.0
        rows.append((et, n_a, n_b, u, z))
    return rd.from_arrow(
        pa.table(
            {
                "event_type": pa.array([r[0] for r in rows], pa.string()),
                "n_a": pa.array([r[1] for r in rows], pa.int64()),
                "n_b": pa.array([r[2] for r in rows], pa.int64()),
                "u_stat": pa.array([r[3] for r in rows], pa.float64()),
                "z_score": pa.array([r[4] for r in rows], pa.float64()),
            }
        )
    )


def ab_test_conversion(sf_dir: str) -> rd.Dataset:
    """Deterministic A/B conversion readout: users split into two arms
    by user_id parity (the hash-split every experimentation pipeline
    runs), conversion = the user has >=1 'purchase' event; reports per
    -arm user and converter counts, exact ppm rates, and the pooled
    two-proportion z statistic.

    Exactness: arm assignment and all four counts are exact integers;
    rates are integer ppm floors; z is ONE fixed float expression over
    the counts, rounded to 6dp — identical in SQL.

    Scale shape: per-batch (user, arm, converted) partials collapse to
    per-user flags through ONE user-bounded hash-aggregate (max over
    flags), then a 2-row arm rollup; nothing larger than the user set
    ever shuffles."""
    import math

    from vietnamese_ocr_ray.functions.agg import hash_aggregate

    ds = read_parquet_clean(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_type"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        conv = pc.cast(
            pc.equal(batch.column("event_type"), pa.scalar("purchase")),
            pa.int64(),
        )
        t = pa.table({"user_id": batch.column("user_id"), "conv": conv})
        g = t.group_by(["user_id"]).aggregate([("conv", "max")])
        return g.rename_columns(["user_id", "conv"])

    users = hash_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["user_id"],
        {"conv": ("conv", "max")},
        num_buckets=8,
    )

    def arm_partial(batch: pa.Table) -> pa.Table:
        uid = batch.column("user_id").to_numpy(zero_copy_only=False)
        conv = batch.column("conv").to_numpy(zero_copy_only=False)
        arm = uid % 2
        t = pa.table(
            {
                "arm": pa.array(arm.astype(np.int64)),
                "n_conv": pa.array(conv.astype(np.int64)),
            }
        )
        return t.group_by("arm").aggregate(
            [("arm", "count"), ("n_conv", "sum")]
        ).rename_columns(["arm", "n_users", "n_conv"])

    arms = (
        hash_aggregate(
            users.map_batches(arm_partial, batch_format="pyarrow"),
            ["arm"],
            {"n_users": ("n_users", "sum"), "n_conv": ("n_conv", "sum")},
            num_buckets=2,
        )
        .to_pandas()
        .sort_values("arm")
        .set_index("arm")
    )
    na = int(arms.loc[0, "n_users"]) if 0 in arms.index else 0
    ca = int(arms.loc[0, "n_conv"]) if 0 in arms.index else 0
    nb = int(arms.loc[1, "n_users"]) if 1 in arms.index else 0
    cb = int(arms.loc[1, "n_conv"]) if 1 in arms.index else 0
    if na > 0 and nb > 0:
        pool = (ca + cb) / (na + nb)
        se2 = pool * (1.0 - pool) * (1.0 / na + 1.0 / nb)
        z = (
            round((ca / na - cb / nb) / math.sqrt(se2), 6)
            if se2 > 0
            else 0.0
        )
    else:
        z = 0.0
    return rd.from_arrow(
        pa.table(
            {
                "n_users_a": pa.array([na], pa.int64()),
                "n_conv_a": pa.array([ca], pa.int64()),
                "rate_a_ppm": pa.array(
                    [ca * 1_000_000 // na if na else 0], pa.int64()
                ),
                "n_users_b": pa.array([nb], pa.int64()),
                "n_conv_b": pa.array([cb], pa.int64()),
                "rate_b_ppm": pa.array(
                    [cb * 1_000_000 // nb if nb else 0], pa.int64()
                ),
                "z_score": pa.array([z], pa.float64()),
            }
        )
    )


def transition_stationary(sf_dir: str, iters: int = 20) -> rd.Dataset:
    """Stationary distribution of the per-user event-type Markov chain
    (the long-run state mix implied by event_transitions): row-
    normalized transition probabilities, then a FIXED 20-step power
    iteration x <- x P from the uniform start — the session-flow
    equilibrium readout next to funnel/retention.

    Determinism contract: transition counts and row sums are exact
    integers; each P entry is ONE division; each iteration accumulates
    x[i] * P[i][j] SEQUENTIALLY in (prev_type, next_type) sort order —
    DuckDB's list_sum over list(... ORDER BY ...) is a sequential fold
    (the zscore_outliers device), so both engines round identically at
    every step. Every type in this corpus has outgoing transitions;
    a dangling type would need a self-loop patch (documented, untested
    here by construction).

    Scale shape: transitions ride the event_transitions plan (ONE
    user-bucket shuffle, counts not rows); the iteration itself runs
    on the |types|^2 matrix — driver-side by construction, bounded by
    the type vocabulary, not the corpus."""
    counts = event_transitions(sf_dir).to_pandas()
    rowsum = counts.groupby("prev_type")["n"].sum()
    types = sorted(
        set(counts["prev_type"]) | set(counts["event_type"])
    )
    # P as a dict keyed (prev, next) -> one-division probability
    p = {
        (r.prev_type, r.event_type): r.n / float(rowsum[r.prev_type])
        for r in counts.itertuples()
    }
    x = {t: 1.0 / len(types) for t in types}
    keys = sorted(p)  # (prev, next) sort order = the fold order
    for _ in range(iters):
        nxt = {t: 0.0 for t in types}
        for pt, nt in keys:
            nxt[nt] = nxt[nt] + x[pt] * p[(pt, nt)]
        x = nxt
    return rd.from_arrow(
        pa.table(
            {
                "event_type": pa.array(types, pa.string()),
                "pi": pa.array(
                    [round(x[t], 9) for t in types], pa.float64()
                ),
            }
        )
    )


def value_multi_regression(sf_dir: str) -> rd.Dataset:
    """Two-feature least squares per event_type: value ~ b0 + b1*hour
    + b2*dow (hour-of-day 0..23, day-of-week 0..6 from the epoch-us
    day), solved by Cramer's rule on EXACT integer normal equations —
    the multi-regressor upgrade of value_hour_regression.

    Exactness: y rides as milli-units, so X'X and X'y entries are
    exact integers (arbitrary-precision Python here, HUGEINT in SQL);
    the six 3x3 determinants are exact-integer polynomials expanded in
    ONE fixed term order, and each coefficient is a single
    float(det_k)/float(det) * 1e-3 expression rounded to 6dp.

    Scale shape: the partial/combiner moment pattern — one 10-number
    row per (type, batch) leaves each task; the solve is O(|types|)."""
    from vietnamese_ocr_ray.functions.agg import hash_aggregate

    ds = read_parquet_clean(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts", "value"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        y = _cents(batch.column("value"), 1000).to_numpy(zero_copy_only=False)
        epoch = pc.divide(
            pc.cast(batch.column("ts"), pa.int64()), pa.scalar(1_000_000)
        ).to_numpy(zero_copy_only=False)
        h = (epoch // 3600) % 24
        d = (epoch // 86_400) % 7
        t = pa.table(
            {
                "event_type": batch.column("event_type"),
                "n": pa.array(np.ones(len(y), np.int64)),
                "sh": pa.array(h),
                "sd": pa.array(d),
                "shh": pa.array(h * h),
                "shd": pa.array(h * d),
                "sdd": pa.array(d * d),
                "sy": pa.array(y),
                "shy": pa.array(h * y),
                "sdy": pa.array(d * y),
            }
        )
        cols = ["n", "sh", "sd", "shh", "shd", "sdd", "sy", "shy", "sdy"]
        return t.group_by("event_type").aggregate(
            [(c, "sum") for c in cols]
        ).rename_columns(["event_type", *cols])

    agg = (
        hash_aggregate(
            ds.map_batches(partial, batch_format="pyarrow"),
            ["event_type"],
            {
                c: (c, "sum")
                for c in (
                    "n", "sh", "sd", "shh", "shd", "sdd", "sy", "shy", "sdy"
                )
            },
            num_buckets=4,
        )
        .to_pandas()
        .sort_values("event_type")
    )

    def det3(a11, a12, a13, a21, a22, a23, a31, a32, a33):
        """Fixed-order cofactor expansion along the first row."""
        return (
            a11 * (a22 * a33 - a23 * a32)
            - a12 * (a21 * a33 - a23 * a31)
            + a13 * (a21 * a32 - a22 * a31)
        )

    rows = []
    for r in agg.itertuples():
        n, sh, sd = int(r.n), int(r.sh), int(r.sd)
        shh, shd, sdd = int(r.shh), int(r.shd), int(r.sdd)
        sy, shy, sdy = int(r.sy), int(r.shy), int(r.sdy)
        det = det3(n, sh, sd, sh, shh, shd, sd, shd, sdd)
        if det != 0:
            d0 = det3(sy, sh, sd, shy, shh, shd, sdy, shd, sdd)
            d1 = det3(n, sy, sd, sh, shy, shd, sd, sdy, sdd)
            d2 = det3(n, sh, sy, sh, shh, shy, sd, shd, sdy)
            b0 = round(float(d0) / float(det) * 1e-3, 6)
            b1 = round(float(d1) / float(det) * 1e-3, 6)
            b2 = round(float(d2) / float(det) * 1e-3, 6)
        else:
            b0 = b1 = b2 = 0.0
        rows.append((r.event_type, n, b0, b1, b2))
    return rd.from_arrow(
        pa.table(
            {
                "event_type": pa.array([r[0] for r in rows], pa.string()),
                "n_events": pa.array([r[1] for r in rows], pa.int64()),
                "b0": pa.array([r[2] for r in rows], pa.float64()),
                "b_hour": pa.array([r[3] for r in rows], pa.float64()),
                "b_dow": pa.array([r[4] for r in rows], pa.float64()),
            }
        )
    )


def seasonal_index(sf_dir: str) -> rd.Dataset:
    """Hour-of-day seasonality index per event type: 24 * share of the
    type's events landing in each hour-of-day (1.0 = flat). Counts are
    exact integers; the index is ONE float expression per output row,
    so Ray and the SQL oracle agree bit-for-bit before the round.
    Partial/combiner: each batch emits <= types x 24 rows."""
    ds = read_parquet_clean(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch.column("ts").to_numpy(zero_copy_only=False)
        hod = (
            ts.astype("datetime64[h]").astype(np.int64) % 24
        ).astype(np.int64)
        t = pa.table(
            {"event_type": batch.column("event_type"), "hod": pa.array(hod)}
        )
        return t.group_by(["event_type", "hod"]).aggregate(
            [("hod", "count")]
        ).rename_columns(["event_type", "hod", "n"])

    counts = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "hod"])
        .aggregate(Sum("n", alias_name="n"))
    )

    def per_type(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values("hod")
        n = g["n"].to_numpy(np.int64)
        tot = int(n.sum())
        idx = 24.0 * n.astype(np.float64) / float(tot)
        return pa.table(
            {
                "event_type": pa.Array.from_pandas(g["event_type"]),
                "hod": pa.array(g["hod"].to_numpy(np.int64)),
                "n_events": pa.array(n),
                "seasonal_idx": pa.array(
                    [round(float(v), 6) for v in idx], pa.float64()
                ),
            }
        )

    return counts.groupby("event_type").map_groups(
        per_type, batch_format="pandas"
    )


def acf_hourly(sf_dir: str, max_lag: int = 24) -> rd.Dataset:
    """Autocorrelation of the hourly event-count series at lags
    1..max_lag. The distributed pass reduces events to per-hour exact
    integer counts (bounded by the time span, not rows); the ACF is a
    CLOSED-FORM float expression over integer sums — lagged
    cross-products, head/tail partial sums and global moments are all
    exact ints, so both engines evaluate the identical expression:

        r_k = (C_k - m*(H_k + T_k) + (n-k)*m^2) / (Sxx - m*Sx)

    with m = Sx/n (the only float), C_k = sum x_t*x_{t+k},
    H_k = sum_{t<n-k} x_t, T_k = sum_{t>=k} x_t over the hour-indexed
    dense series (missing hours count 0)."""
    ds = read_parquet_clean(f"{sf_dir}/events.parquet", columns=["ts"])

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch.column("ts").to_numpy(zero_copy_only=False)
        h = ts.astype("datetime64[h]").astype(np.int64)
        hours, n = np.unique(h, return_counts=True)
        return pa.table(
            {"h": pa.array(hours), "n": pa.array(n.astype(np.int64))}
        )

    counts = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("h")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
        .sort_values("h")
    )
    h = counts["h"].to_numpy(np.int64)
    lo, hi = int(h.min()), int(h.max())
    x = np.zeros(hi - lo + 1, np.int64)
    x[h - lo] = counts["n"].to_numpy(np.int64)
    n = len(x)
    sx = int(x.sum())
    sxx = int((x * x).sum())
    m = float(sx) / float(n)
    denom = float(sxx) - m * float(sx)
    rows = []
    for k in range(1, max_lag + 1):
        ck = int((x[:-k] * x[k:]).sum())
        hk = int(x[:-k].sum())
        tk = int(x[k:].sum())
        r = (float(ck) - m * float(hk + tk) + float(n - k) * m * m) / denom
        rows.append((k, ck, round(r, 6)))
    return rd.from_arrow(
        pa.table(
            {
                "lag": pa.array([r[0] for r in rows], pa.int64()),
                "cross_sum": pa.array([r[1] for r in rows], pa.int64()),
                "acf": pa.array([r[2] for r in rows], pa.float64()),
            }
        )
    )


def anova_value(sf_dir: str) -> rd.Dataset:
    """One-way ANOVA F-test of value across event types. Per-group
    moments (n, sum, sum-of-squares of milli-value) are exact integers;
    SSB/SSW accumulate SEQUENTIALLY in event_type order on both sides
    (numpy here; list_sum over an ORDER BY list in SQL) so the float
    reduction order is pinned — the zscore_outliers contract."""
    ds = read_parquet_clean(
        f"{sf_dir}/events.parquet", columns=["event_type", "value"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        x = _cents(batch.column("value"), 1000).to_numpy(zero_copy_only=False)
        t = pa.table(
            {
                "event_type": batch.column("event_type"),
                "sx": pa.array(x),
                "sxx": pa.array(x * x),
            }
        )
        return t.group_by("event_type").aggregate(
            [("sx", "count"), ("sx", "sum"), ("sxx", "sum")]
        ).rename_columns(["event_type", "n", "sx", "sxx"])

    g = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("sx", alias_name="sx"),
            Sum("sxx", alias_name="sxx"),
        )
        .to_pandas()
        .sort_values("event_type")
    )
    ng = g["n"].to_numpy(np.int64)
    sxg = g["sx"].to_numpy(np.int64)
    sxxg = g["sxx"].to_numpy(np.int64)
    n = int(ng.sum())
    sx = int(sxg.sum())
    k = len(ng)
    grand = float(sx) / float(n)
    ssb = 0.0
    ssw = 0.0
    # sequential accumulation in event_type order (matches list_sum)
    for i in range(k):
        mg = float(sxg[i]) / float(ng[i])
        ssb = ssb + float(ng[i]) * (mg - grand) * (mg - grand)
        ssw = ssw + (float(sxxg[i]) - float(ng[i]) * mg * mg)
    f_stat = (ssb / float(k - 1)) / (ssw / float(n - k))
    return rd.from_arrow(
        pa.table(
            {
                "k_groups": pa.array([k], pa.int64()),
                "n_events": pa.array([n], pa.int64()),
                "f_stat": pa.array([round(f_stat, 6)], pa.float64()),
            }
        )
    )


def watermark_late_events(sf_dir: str, bucket_bits: int = 7) -> rd.Dataset:
    """Streaming watermark audit over a SIMULATED out-of-order arrival
    stream: arrival order is the splitmix64 permutation of event_id (a
    bijection, so the order is total and deterministic), and an event
    is late if its ts is older than the running max ts of all
    previously-arrived events. Two distributed passes, no global sort:
    (1) bucket by the TOP bits of the arrival key (contiguous arrival
    ranges), per-bucket max ts -> the driver folds the tiny per-bucket
    maxima into exclusive prefix watermarks; (2) re-scan marks lateness
    against the bucket-local prefix max floored by the carried-in
    watermark. Output: per event_type late count + max lateness (exact
    integer us). The SQL oracle replays the same splitmix64 permutation
    via split-multiply mod-2^64 arithmetic."""
    from vietnamese_ocr_ray.functions.joins import _mix64

    shift = np.uint64(64 - bucket_bits)
    ds = read_parquet_clean(
        f"{sf_dir}/events.parquet", columns=["event_id", "event_type", "ts"]
    )

    def bucket_max(b: pa.Table) -> pa.Table:
        eid = np.asarray(b.column("event_id"), np.int64)
        arrival = _mix64(eid)
        ts = b.column("ts").to_numpy(zero_copy_only=False).astype(
            "datetime64[us]"
        ).astype(np.int64)
        bk = (arrival >> shift).astype(np.int64)
        t = pa.table({"bk": pa.array(bk), "ts": pa.array(ts)})
        return t.group_by("bk").aggregate([("ts", "max")]).rename_columns(
            ["bk", "ts"]
        )

    bmax = (
        ds.map_batches(bucket_max, batch_format="pyarrow")
        .groupby("bk")
        .aggregate(Max("ts", alias_name="ts"))
        .to_pandas()
        .sort_values("bk")
    )
    bks = bmax["bk"].to_numpy(np.int64)
    maxes = bmax["ts"].to_numpy(np.int64)
    # exclusive prefix max: watermark carried INTO each bucket
    carried = np.empty(len(bks), np.int64)
    carried[0] = np.iinfo(np.int64).min
    if len(bks) > 1:
        carried[1:] = np.maximum.accumulate(maxes)[:-1]
    wm = {int(b): int(c) for b, c in zip(bks, carried)}
    import ray as _ray

    handle = _ray.put(wm)

    def add_bucket(b: pa.Table) -> pa.Table:
        eid = np.asarray(b.column("event_id"), np.int64)
        arrival = _mix64(eid)
        t = b.append_column("_arrival", pa.array(arrival, pa.uint64()))
        return t.append_column(
            "_bucket", pa.array((arrival >> shift).astype(np.int64))
        )

    def mark_late(g: pd.DataFrame) -> pa.Table:
        water = _ray.get(handle)
        s = g.sort_values("_arrival")
        ts = s["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        bk = int(s["_bucket"].iloc[0])
        prior = np.empty(len(s), np.int64)
        prior[0] = water[bk]
        if len(s) > 1:
            prior[1:] = np.maximum(
                np.maximum.accumulate(ts)[:-1], water[bk]
            )
        late = ts < prior
        if not late.any():
            return pa.table(
                {
                    "event_type": pa.array([], pa.string()),
                    "n_late": pa.array([], pa.int64()),
                    "max_lateness_us": pa.array([], pa.int64()),
                }
            )
        df = pd.DataFrame(
            {
                "event_type": s["event_type"].to_numpy()[late],
                "lateness": (prior - ts)[late],
            }
        ).groupby("event_type", as_index=False).agg(
            n_late=("lateness", "size"), max_lateness_us=("lateness", "max")
        )
        return pa.table(
            {
                "event_type": pa.Array.from_pandas(df["event_type"]),
                "n_late": pa.array(df["n_late"].to_numpy(np.int64)),
                "max_lateness_us": pa.array(
                    df["max_lateness_us"].to_numpy(np.int64)
                ),
            }
        )

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(
            lambda g: mark_late(g), batch_format="pandas"
        )
        .groupby("event_type")
        .aggregate(
            Sum("n_late", alias_name="n_late"),
            Max("max_lateness_us", alias_name="max_lateness_us"),
        )
        .map_batches(
            lambda b: pa.table(
                {
                    "event_type": b.column("event_type"),
                    "n_late": pc.cast(b.column("n_late"), pa.int64()),
                    "max_lateness_us": pc.cast(
                        b.column("max_lateness_us"), pa.int64()
                    ),
                }
            ),
            batch_format="pyarrow",
        )
    )


def hits_user_event(sf_dir: str, num_buckets: int = 32) -> rd.Dataset:
    """Bipartite HITS over the user -> event_type incidence graph with
    EXACT integer path counts: h0(user) = 1, a1(type) = #distinct users
    touching it, h1(user) = sum of a1 over the user's types, a2(type) =
    sum of h1 over the type's users — i.e. two unnormalized HITS half-
    steps (a2 counts length-3 paths type<-user<-type'<-user'), then ONE
    normalization at the very end, so every distributed sum is an
    integer and the single float division is bit-replayable in SQL.

    Scale shape: distinct (user, type) pairs via one hash_aggregate
    (keyspace = incidence pairs, not events); a1 is types-bounded and
    broadcast; h1 + the per-type contributions happen inside ONE
    user-bucket group pass; a2 is a types-sized groupby."""
    import ray as _ray

    from vietnamese_ocr_ray.functions.agg import hash_aggregate
    from vietnamese_ocr_ray.functions.joins import key_bucket

    ds = read_parquet_clean(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_type"]
    )

    def pair_partial(b: pa.Table) -> pa.Table:
        g = (
            b.select(["user_id", "event_type"])
            .group_by(["user_id", "event_type"])
            .aggregate([])
        )
        return g.append_column("n", pa.array(np.ones(g.num_rows, np.int64)))

    pairs = hash_aggregate(
        ds.map_batches(pair_partial, batch_format="pyarrow"),
        ["user_id", "event_type"],
        {"n": ("n", "max")},
        num_buckets=num_buckets,
    )

    # a1: distinct-user degree per type — types-bounded, broadcast once
    a1_pd = (
        pairs.map_batches(
            lambda b: b.group_by("event_type")
            .aggregate([("n", "sum")])
            .rename_columns(["event_type", "d"]),
            batch_format="pyarrow",
        )
        .groupby("event_type")
        .aggregate(Sum("d", alias_name="d"))
        .to_pandas()
        .sort_values("event_type")
    )
    a1 = {t: int(d) for t, d in zip(a1_pd["event_type"], a1_pd["d"])}
    handle = _ray.put(a1)

    def add_bucket(b: pa.Table) -> pa.Table:
        return b.append_column(
            "_bucket",
            pa.array(key_bucket(b.column("user_id"), num_buckets).astype(np.int32)),
        )

    def user_bucket(g: pd.DataFrame) -> pa.Table:
        lut = _ray.get(handle)
        d = g["event_type"].map(lut).to_numpy(np.int64)
        # h1 per user = sum of a1 over the user's types; every pair row
        # then contributes its user's h1 to its type
        h1 = g.assign(d=d).groupby("user_id")["d"].transform("sum")
        out = (
            g.assign(h=h1.to_numpy(np.int64))
            .groupby("event_type", as_index=False)
            .agg(m=("h", "sum"))
        )
        return pa.Table.from_pandas(out, preserve_index=False).replace_schema_metadata(None)

    a2 = (
        pairs.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(
            lambda g: user_bucket(g.drop(columns=["_bucket"])),
            batch_format="pandas",
        )
        .groupby("event_type")
        .aggregate(Sum("m", alias_name="m"))
        .to_pandas()
        .sort_values("event_type")
    )
    total = int(a2["m"].sum())
    m = a2["m"].to_numpy(np.int64)
    return rd.from_arrow(
        pa.table(
            {
                "event_type": pa.Array.from_pandas(a2["event_type"]),
                "n_users": pa.array(
                    [a1[t] for t in a2["event_type"]], pa.int64()
                ),
                "hub_mass": pa.array(m),
                "auth_share": pa.array(
                    [round(float(v) / float(total), 6) for v in m],
                    pa.float64(),
                ),
            }
        )
    )


def holtwinters_forecast(sf_dir: str, horizon: int = 3) -> rd.Dataset:
    """Holt-Winters ADDITIVE-SEASONAL smoothing (period 24 hours,
    alpha = beta = gamma = 0.5) over the hourly count series per
    event_type, plus a ``horizon``-step forecast carrying the seasonal
    term — the seasonality upgrade of holt_forecast for the daily
    cycles every event stream has.

    Determinism contract (the holt_forecast pattern, extended): y is
    exact integer counts on the global hour grid; init is ONE float
    division (l_0 = sum(first 24) / 24, t_0 = 0 — documented
    simplification; s_j = y_j - l_0) and every recursion step is a
    fixed dyadic (0.5) float expression replayed sub-expression for
    sub-expression by a recursive CTE whose state carries the 24
    seasonal values as a LIST column. SEQUENTIAL order is the spec.

    Scale shape: identical to holt_forecast — a (type, hour)-bounded
    count aggregate, then a driver recursion over calendar-bounded
    points."""
    from vietnamese_ocr_ray.functions.agg import hash_aggregate

    ds = read_parquet_clean(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        # unit-safe: normalize to datetime64[us] BEFORE the int cast so
        # ns-unit parquet (pandas default) buckets identically
        epoch = (
            batch.column("ts")
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
            // 1_000_000
        )
        h = epoch // 3600
        t = pa.table(
            {
                "event_type": batch.column("event_type"),
                "h": pa.array(h),
                "n": pa.array(np.ones(len(h), np.int64)),
            }
        )
        return t.group_by(["event_type", "h"]).aggregate(
            [("n", "sum")]
        ).rename_columns(["event_type", "h", "n"])

    hourly = (
        hash_aggregate(
            ds.map_batches(partial, batch_format="pyarrow"),
            ["event_type", "h"],
            {"n": ("n", "sum")},
            num_buckets=8,
        )
        .to_pandas()
        .sort_values(["event_type", "h"])
    )
    hmin = int(hourly["h"].min())
    hmax = int(hourly["h"].max())
    H = hmax - hmin + 1
    if H < 24:
        # additive-seasonal init needs one full 24-hour season; a
        # shorter stream has no defined seasonal profile, and letting
        # it through would diverge from the SQL oracle (which degrades
        # via a short seas list instead of an IndexError). Fail loudly.
        raise ValueError(
            "holtwinters_forecast: event stream spans only "
            f"{H} hour(s); >= 24 hourly buckets are required to "
            "initialize the seasonal component"
        )
    rows = []
    for et, t in hourly.groupby("event_type", sort=True):
        y = np.zeros(H, np.int64)
        y[t["h"].to_numpy(np.int64) - hmin] = t["n"].to_numpy(np.int64)
        lvl = float(int(y[:24].sum())) / 24.0
        trd = 0.0
        s = [float(y[j]) - lvl for j in range(24)]
        for i in range(24, H):
            idx = i % 24
            yi = float(y[i])
            lnew = 0.5 * (yi - s[idx]) + 0.5 * (lvl + trd)
            trd = 0.5 * (lnew - lvl) + 0.5 * trd
            s[idx] = 0.5 * (yi - lnew) + 0.5 * s[idx]
            lvl = lnew
        fc = [
            round(lvl + (k + 1) * trd + s[(H + k) % 24], 6)
            for k in range(horizon)
        ]
        rows.append((et, H, round(lvl, 6), round(trd, 6), fc))
    out = {
        "event_type": pa.array([r[0] for r in rows], pa.string()),
        "n_hours": pa.array([r[1] for r in rows], pa.int64()),
        "level": pa.array([r[2] for r in rows], pa.float64()),
        "trend": pa.array([r[3] for r in rows], pa.float64()),
    }
    for k in range(horizon):
        out[f"f{k + 1}"] = pa.array([r[4][k] for r in rows], pa.float64())
    return rd.from_arrow(pa.table(out))


def revenue_change(
    sf_dir: str,
    date_lo: str = "1995-01-01",
    date_hi: str = "1997-01-01",
    disc_lo_c: int = 5,
    disc_hi_c: int = 7,
    max_qty: int = 24,
) -> rd.Dataset:
    """TPC-H Q6 shape (forecasting revenue change): the revenue that
    would be recovered by eliminating small discounts — sum of
    ``l_extendedprice * l_discount`` over a shipdate window for
    lineitems with discount in a cents band and quantity below a cap.

    Scale shape: pure streaming filter + two-scalar aggregate — no
    shuffle at all; predicates push into the batch filter right after
    the pruned 4-column read. Revenue accumulates in exact integer
    1e-4 dollar units (cents x discount-hundredths); ONE division to
    DOUBLE at the end, so Ray and DuckDB agree bit-for-bit."""
    ds = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_extendedprice", "l_discount", "l_quantity", "l_shipdate"],
    )
    lo_us = int(np.datetime64(date_lo, "us").astype(np.int64))
    hi_us = int(np.datetime64(date_hi, "us").astype(np.int64))

    def partial(batch: pa.Table) -> pa.Table:
        sd = pc.cast(batch.column("l_shipdate"), pa.int64())
        disc = _cents(batch.column("l_discount"), 100)
        qty = _cents(batch.column("l_quantity"), 1)
        mask = pc.and_(
            pc.and_(
                pc.greater_equal(sd, pa.scalar(lo_us, pa.int64())),
                pc.less(sd, pa.scalar(hi_us, pa.int64())),
            ),
            pc.and_(
                pc.and_(
                    pc.greater_equal(disc, pa.scalar(disc_lo_c, pa.int64())),
                    pc.less_equal(disc, pa.scalar(disc_hi_c, pa.int64())),
                ),
                pc.less(qty, pa.scalar(max_qty, pa.int64())),
            ),
        )
        b = batch.filter(mask)
        price_c = _cents(b.column("l_extendedprice"), 100)
        d = _cents(b.column("l_discount"), 100)
        rev = pc.multiply(price_c, d)
        s = pc.sum(rev)
        return pa.table(
            {
                "rev_units": pa.array(
                    [int(s.as_py() or 0)], pa.int64()
                ),
                "n": pa.array([b.num_rows], pa.int64()),
            }
        )

    agg = ds.map_batches(partial, batch_format="pyarrow").aggregate(
        Sum("rev_units", alias_name="rev_units"), Sum("n", alias_name="n")
    )
    return rd.from_arrow(
        pa.table(
            {
                "n_items": pa.array([int(agg["n"])], pa.int64()),
                "revenue_delta": pa.array(
                    [int(agg["rev_units"]) / 10000.0], pa.float64()
                ),
            }
        )
    )


def returned_item_report(sf_dir: str, k: int = 20) -> rd.Dataset:
    """TPC-H Q10 shape (returned-item reporting): top-``k`` customers
    by revenue lost to returned lineitems (l_returnflag = 'R'), with
    nation name attached.

    Scale shape: lineitem pre-aggregates returned revenue PER ORDER
    before any join (the shuffle carries ~|orders with returns| rows,
    never lineitem); one native hash join to orders recovers custkey;
    a second per-customer hash aggregate; nation names attach from the
    25-row broadcast map; top-k via sort+limit. Revenue in exact
    integer 1e-4 units; ties break on c_custkey ascending."""
    import ray

    from vietnamese_ocr_ray.functions.agg import hash_aggregate

    li = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=[
            "l_orderkey", "l_extendedprice", "l_discount", "l_returnflag"
        ],
    )

    def per_order(batch: pa.Table) -> pa.Table:
        b = batch.filter(
            pc.equal(batch.column("l_returnflag"), pa.scalar("R"))
        )
        price_c = _cents(b.column("l_extendedprice"), 100)
        disc = _cents(b.column("l_discount"), 100)
        rev = pc.multiply(
            price_c, pc.subtract(pa.scalar(100, pa.int64()), disc)
        )
        t = pa.table(
            {
                "l_orderkey": pc.cast(_chunk2(b.column("l_orderkey")), pa.int64()),
                "rev": rev,
            }
        )
        return t.group_by("l_orderkey").aggregate(
            [("rev", "sum")]
        ).rename_columns(["l_orderkey", "rev"])

    order_rev = hash_aggregate(
        li.map_batches(per_order, batch_format="pyarrow"),
        ["l_orderkey"],
        {"rev": ("rev", "sum")},
    )
    orders = read_parquet_clean(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    )
    j = order_rev.join(
        orders,
        join_type="inner",
        num_partitions=8,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )
    per_cust = hash_aggregate(
        j.map_batches(
            lambda b: pa.table(
                {
                    "c_custkey": pc.cast(
                        _chunk2(b.column("o_custkey")), pa.int64()
                    ),
                    "rev": pc.cast(_chunk2(b.column("rev")), pa.int64()),
                }
            ),
            batch_format="pyarrow",
        ),
        ["c_custkey"],
        {"rev": ("rev", "sum")},
    )

    cust = read_parquet_clean(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_name", "c_nationkey"],
    ).to_pandas()
    nation = read_parquet_clean(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    ).to_pandas()
    nname = dict(zip(nation["n_nationkey"], nation["n_name"]))
    ckeys = cust["c_custkey"].to_numpy(np.int64)
    order_ = np.argsort(ckeys)
    handle = ray.put(
        (
            ckeys[order_],
            cust["c_name"].to_numpy(object)[order_],
            np.array(
                [nname[n] for n in cust["c_nationkey"]], dtype=object
            )[order_],
        )
    )

    def attach(b: pa.Table) -> pa.Table:
        keys, names, nations = ray.get(handle)
        ck = np.asarray(b.column("c_custkey"), dtype=np.int64)
        idx = np.searchsorted(keys, ck)
        return pa.table(
            {
                "c_custkey": pa.array(ck),
                "c_name": pa.array(names[idx].tolist(), pa.string()),
                "n_name": pa.array(nations[idx].tolist(), pa.string()),
                "revenue": pc.divide(
                    pc.cast(_chunk2(b.column("rev")), pa.float64()),
                    pa.scalar(10000.0),
                ),
            }
        )

    return (
        per_cust.map_batches(attach, batch_format="pyarrow")
        .sort(["revenue", "c_custkey"], descending=[True, False])
        .limit(k)
    )


def rich_light_buyers(sf_dir: str, max_orders: int = 5) -> rd.Dataset:
    """TPC-H Q22 shape (global sales opportunity), re-keyed to this
    corpus's columns: per nation, the customers whose account balance
    exceeds the global average POSITIVE balance yet who placed fewer
    than ``max_orders`` orders — count and total balance.

    Scale shape: pass 1 computes the global positive-balance average
    as two exact-integer scalars (no shuffle); pass 2 unions customer
    rows with per-batch (custkey, order-count) partials from orders
    and folds them in ONE custkey-bucket hash aggregate (never a
    broadcast of the customer or order set); the nation rollup is a
    25-row aggregate. Balances in exact integer cents; the avg
    threshold comparison is integer cross-multiplied (bal_c * n_pos >
    sum_c) so no float rounds before the final division."""
    from vietnamese_ocr_ray.functions.agg import hash_aggregate

    cust = read_parquet_clean(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_nationkey", "c_acctbal"],
    )

    def bal_partial(batch: pa.Table) -> pa.Table:
        bal = _cents(batch.column("c_acctbal"), 100)
        pos = pc.filter(bal, pc.greater(bal, pa.scalar(0, pa.int64())))
        return pa.table(
            {
                "s": pa.array([int(pc.sum(pos).as_py() or 0)], pa.int64()),
                "n": pa.array([len(pos)], pa.int64()),
            }
        )

    g = cust.map_batches(bal_partial, batch_format="pyarrow").aggregate(
        Sum("s", alias_name="s"), Sum("n", alias_name="n")
    )
    sum_c, n_pos = int(g["s"]), int(g["n"])

    def cust_rows(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "c_custkey": pc.cast(
                    _chunk2(batch.column("c_custkey")), pa.int64()
                ),
                "nationkey": pc.cast(
                    _chunk2(batch.column("c_nationkey")), pa.int64()
                ),
                "bal_c": _cents(batch.column("c_acctbal"), 100),
                "n_orders": pa.array(
                    np.zeros(batch.num_rows, np.int64)
                ),
            }
        )

    orders = read_parquet_clean(
        f"{sf_dir}/orders.parquet", columns=["o_custkey"]
    )

    def order_rows(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "c_custkey": pc.cast(
                    _chunk2(batch.column("o_custkey")), pa.int64()
                )
            }
        )
        g = t.group_by("c_custkey").aggregate(
            [("c_custkey", "count")]
        ).rename_columns(["c_custkey", "n_orders"])
        nr = g.num_rows
        return pa.table(
            {
                "c_custkey": g.column("c_custkey"),
                "nationkey": pa.array(np.full(nr, -1, np.int64)),
                "bal_c": pa.array(np.zeros(nr, np.int64)),
                "n_orders": pc.cast(g.column("n_orders"), pa.int64()),
            }
        )

    merged = hash_aggregate(
        cust.map_batches(cust_rows, batch_format="pyarrow").union(
            orders.map_batches(order_rows, batch_format="pyarrow")
        ),
        ["c_custkey"],
        {
            "nationkey": ("nationkey", "max"),
            "bal_c": ("bal_c", "max"),
            "n_orders": ("n_orders", "sum"),
        },
    )

    def pick(batch: pa.Table) -> pa.Table:
        bal = np.asarray(batch.column("bal_c"), dtype=np.int64)
        no = np.asarray(batch.column("n_orders"), dtype=np.int64)
        # integer cross-multiply: bal > sum/n  <=>  bal * n > sum
        keep = (bal * n_pos > sum_c) & (no < max_orders)
        b = batch.filter(pa.array(keep))
        t = pa.table(
            {
                "nationkey": b.column("nationkey"),
                "n_cust": pa.array(
                    np.ones(b.num_rows, np.int64)
                ),
                "bal_c": b.column("bal_c"),
            }
        )
        return t.group_by("nationkey").aggregate(
            [("n_cust", "sum"), ("bal_c", "sum")]
        ).rename_columns(["nationkey", "n_cust", "bal_c"])

    final = (
        merged.map_batches(pick, batch_format="pyarrow")
        .groupby("nationkey")
        .aggregate(
            Sum("n_cust", alias_name="n_cust"),
            Sum("bal_c", alias_name="bal_c"),
        )
    )

    def finish(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "nationkey": pc.cast(b.column("nationkey"), pa.int64()),
                "n_customers": pc.cast(b.column("n_cust"), pa.int64()),
                "total_acctbal": pc.divide(
                    pc.cast(b.column("bal_c"), pa.float64()),
                    pa.scalar(100.0),
                ),
            }
        )

    return final.map_batches(finish, batch_format="pyarrow").sort("nationkey")


def top_supplier_revenue(sf_dir: str) -> rd.Dataset:
    """TPC-H Q15 shape (top supplier): every supplier whose lineitem
    revenue equals the global maximum (ties all kept), with name
    attached. Shape: per-batch per-suppkey partials -> one
    supplier-bounded hash aggregate -> the max is read off the tiny
    result on the driver and filtered without another pass; names
    attach from the supplier-sized broadcast lut. Exact integer 1e-4
    revenue units; one division at the end."""
    import ray

    from vietnamese_ocr_ray.functions.agg import hash_aggregate

    li = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_suppkey", "l_extendedprice", "l_discount"],
    )

    def partial(b: pa.Table) -> pa.Table:
        price_c = _cents(b.column("l_extendedprice"), 100)
        disc = _cents(b.column("l_discount"), 100)
        rev = pc.multiply(
            price_c, pc.subtract(pa.scalar(100, pa.int64()), disc)
        )
        t = pa.table(
            {
                "s_suppkey": pc.cast(_chunk2(b.column("l_suppkey")), pa.int64()),
                "rev": rev,
            }
        )
        return t.group_by("s_suppkey").aggregate(
            [("rev", "sum")]
        ).rename_columns(["s_suppkey", "rev"])

    per_supp = hash_aggregate(
        li.map_batches(partial, batch_format="pyarrow"),
        ["s_suppkey"],
        {"rev": ("rev", "sum")},
    ).to_pandas()  # supplier-bounded
    best = int(per_supp["rev"].max())
    top = per_supp[per_supp["rev"] == best].sort_values("s_suppkey")

    supp = pd.read_parquet(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_name"]
    )
    names = dict(
        zip(supp["s_suppkey"].to_numpy(np.int64), supp["s_name"])
    )
    return rd.from_arrow(
        pa.table(
            {
                "s_suppkey": pa.array(
                    top["s_suppkey"].to_numpy(np.int64)
                ),
                "s_name": pa.array(
                    [names[k] for k in top["s_suppkey"]], pa.string()
                ),
                "total_revenue": pa.array(
                    top["rev"].to_numpy(np.int64) / 10000.0, pa.float64()
                ),
            }
        )
    )


def _order_year_custnation(sf_dir: str):
    """(o_orderkey -> (order year, customer nationkey)) broadcast
    pieces shared by the Q8/Q9 shapes below: orders and customer are
    joined NATIVELY (never broadcast — customer is corpus-sized), and
    only the per-order 2-int result ships onward."""
    orders = read_parquet_clean(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
    )
    customer = read_parquet_clean(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    )
    j = orders.join(
        customer,
        join_type="inner",
        num_partitions=8,
        on=("o_custkey",),
        right_on=("c_custkey",),
    )

    def shrink(b: pa.Table) -> pa.Table:
        ts = (
            b.column("o_orderdate")
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[Y]")
            .astype(np.int64)
            + 1970
        )
        return pa.table(
            {
                "o_orderkey": pc.cast(_chunk2(b.column("o_orderkey")), pa.int64()),
                "o_year": pa.array(ts),
                "cust_nation": pc.cast(
                    _chunk2(b.column("c_nationkey")), pa.int64()
                ),
            }
        )

    return j.map_batches(shrink, batch_format="pyarrow")


def nation_profit_by_year(sf_dir: str) -> rd.Dataset:
    """TPC-H Q9 shape re-keyed to this corpus (no partsupp cost
    column): lineitem revenue attributed to the SUPPLIER's nation per
    order year. Shape: lineitem pre-aggregates (orderkey,
    supplier-nation) partials via the broadcast suppkey->nationkey
    array (supplier-bounded, the nation_trade_matrix pattern); ONE
    native join against the order-year table; final
    (nation x year)-bounded aggregate. Exact integer units
    end-to-end; names from the 25-row nation map."""
    import ray

    from vietnamese_ocr_ray.functions.agg import hash_aggregate

    supplier = read_parquet_clean(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    ).to_pandas()
    keys = supplier["s_suppkey"].to_numpy(np.int64)
    order = np.argsort(keys)
    supp_handle = ray.put(
        (keys[order], supplier["s_nationkey"].to_numpy(np.int64)[order])
    )
    nation = read_parquet_clean(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    ).to_pandas()
    nmap = dict(zip(nation["n_nationkey"], nation["n_name"]))

    li = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )

    def partial(b: pa.Table) -> pa.Table:
        sk, nat = ray.get(supp_handle)
        price_c = _cents(b.column("l_extendedprice"), 100)
        disc = _cents(b.column("l_discount"), 100)
        rev = pc.multiply(
            price_c, pc.subtract(pa.scalar(100, pa.int64()), disc)
        )
        idx = np.searchsorted(
            sk, np.asarray(b.column("l_suppkey"), dtype=np.int64)
        )
        t = pa.table(
            {
                "l_orderkey": pc.cast(_chunk2(b.column("l_orderkey")), pa.int64()),
                "supp_nation": pa.array(nat[idx]),
                "rev": rev,
            }
        )
        return t.group_by(["l_orderkey", "supp_nation"]).aggregate(
            [("rev", "sum")]
        ).rename_columns(["l_orderkey", "supp_nation", "rev"])

    per_order = li.map_batches(partial, batch_format="pyarrow")
    oy = _order_year_custnation(sf_dir)
    j = per_order.join(
        oy,
        join_type="inner",
        num_partitions=8,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )
    agg = hash_aggregate(
        j.map_batches(
            lambda b: pa.table(
                {
                    "supp_nation": pc.cast(
                        _chunk2(b.column("supp_nation")), pa.int64()
                    ),
                    "o_year": pc.cast(_chunk2(b.column("o_year")), pa.int64()),
                    "rev": pc.cast(_chunk2(b.column("rev")), pa.int64()),
                }
            ),
            batch_format="pyarrow",
        ),
        ["supp_nation", "o_year"],
        {"rev": ("rev", "sum")},
        num_buckets=8,
    )

    def finish(b: pa.Table) -> pa.Table:
        nk = np.asarray(b.column("supp_nation"), dtype=np.int64)
        return pa.table(
            {
                "n_name": pa.array([nmap[k] for k in nk], pa.string()),
                "o_year": pc.cast(b.column("o_year"), pa.int64()),
                "profit": pc.divide(
                    pc.cast(_chunk2(b.column("rev")), pa.float64()),
                    pa.scalar(10000.0),
                ),
            }
        )

    return (
        agg.map_batches(finish, batch_format="pyarrow")
        .sort(["n_name", "o_year"])
    )


def market_share(
    sf_dir: str, region: str = "ASIA", nation: str = "NATION_2"
) -> rd.Dataset:
    """TPC-H Q8 shape (national market share): within orders placed by
    customers of ``region``'s nations, the share of lineitem revenue
    supplied by ``nation``, per order year. Shape: the same
    (orderkey, supplier-nation) lineitem pre-aggregate as
    nation_profit_by_year, one native join to the order-year +
    customer-nation table, then a years-bounded exact-integer
    aggregate of (nation revenue, total revenue); one division per
    year at the end, rounded to 6dp on both engines."""
    import ray

    from vietnamese_ocr_ray.functions.agg import hash_aggregate

    nat_df = read_parquet_clean(
        f"{sf_dir}/nation.parquet",
        columns=["n_nationkey", "n_name", "n_regionkey"],
    ).to_pandas()
    reg = read_parquet_clean(
        f"{sf_dir}/region.parquet", columns=["r_regionkey", "r_name"]
    ).to_pandas()
    region_key = int(reg.loc[reg["r_name"] == region, "r_regionkey"].iloc[0])
    region_nations = set(
        nat_df.loc[nat_df["n_regionkey"] == region_key, "n_nationkey"]
        .astype(int)
        .tolist()
    )
    nation_key = int(
        nat_df.loc[nat_df["n_name"] == nation, "n_nationkey"].iloc[0]
    )

    supplier = read_parquet_clean(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    ).to_pandas()
    keys = supplier["s_suppkey"].to_numpy(np.int64)
    order = np.argsort(keys)
    supp_handle = ray.put(
        (keys[order], supplier["s_nationkey"].to_numpy(np.int64)[order])
    )

    li = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )

    def partial(b: pa.Table) -> pa.Table:
        sk, nat = ray.get(supp_handle)
        price_c = _cents(b.column("l_extendedprice"), 100)
        disc = _cents(b.column("l_discount"), 100)
        rev = pc.multiply(
            price_c, pc.subtract(pa.scalar(100, pa.int64()), disc)
        )
        idx = np.searchsorted(
            sk, np.asarray(b.column("l_suppkey"), dtype=np.int64)
        )
        t = pa.table(
            {
                "l_orderkey": pc.cast(_chunk2(b.column("l_orderkey")), pa.int64()),
                "supp_nation": pa.array(nat[idx]),
                "rev": rev,
            }
        )
        return t.group_by(["l_orderkey", "supp_nation"]).aggregate(
            [("rev", "sum")]
        ).rename_columns(["l_orderkey", "supp_nation", "rev"])

    j = li.map_batches(partial, batch_format="pyarrow").join(
        _order_year_custnation(sf_dir),
        join_type="inner",
        num_partitions=8,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )
    rn = np.array(sorted(region_nations), np.int64)

    def year_partial(b: pa.Table) -> pa.Table:
        cn = np.asarray(b.column("cust_nation"), dtype=np.int64)
        keep = np.isin(cn, rn)
        bb = b.filter(pa.array(keep))
        sn = np.asarray(bb.column("supp_nation"), dtype=np.int64)
        rev = np.asarray(bb.column("rev"), dtype=np.int64)
        t = pa.table(
            {
                "o_year": pc.cast(_chunk2(bb.column("o_year")), pa.int64()),
                "nat_rev": pa.array(np.where(sn == nation_key, rev, 0)),
                "tot_rev": pa.array(rev),
            }
        )
        return t.group_by("o_year").aggregate(
            [("nat_rev", "sum"), ("tot_rev", "sum")]
        ).rename_columns(["o_year", "nat_rev", "tot_rev"])

    agg = hash_aggregate(
        j.map_batches(year_partial, batch_format="pyarrow"),
        ["o_year"],
        {"nat_rev": ("nat_rev", "sum"), "tot_rev": ("tot_rev", "sum")},
        num_buckets=4,
    )

    def finish(b: pa.Table) -> pa.Table:
        nr = np.asarray(b.column("nat_rev"), dtype=np.int64)
        tr = np.asarray(b.column("tot_rev"), dtype=np.int64)
        return pa.table(
            {
                "o_year": pc.cast(b.column("o_year"), pa.int64()),
                "mkt_share": pa.array(
                    np.round(
                        nr.astype(np.float64) / tr.astype(np.float64), 6
                    ),
                    pa.float64(),
                ),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow").sort("o_year")


def burstiness_fano(sf_dir: str) -> rd.Dataset:
    """Per-event-type burstiness (Fano factor) of the hourly count
    series over the corpus's global hour span, missing hours counted
    as 0: ``F = Var(x) / Mean(x)`` (population). F ~ 1 is Poisson
    arrivals; F >> 1 flags bursty / campaign-driven types (the
    traffic-shape audit next to circular_peak_hour and cusum_drift).

    Exactness: with H = global hour-span, Sx = total events and Sxx =
    sum of squared hourly counts (absent hours contribute 0 to both),
    F = (H * Sxx - Sx^2) / (H * Sx) — one float division of exact
    int64 sums, rounded to 6dp on both engines. Scale shape: ONE
    per-batch (type, hour) count partial into a span-bounded
    aggregate; the finish is types-sized."""
    from ray.data.aggregate import Max, Min
    from vietnamese_ocr_ray.functions.agg import hash_aggregate

    ds = read_parquet_clean(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        epoch = (
            batch.column("ts")
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
            // 1_000_000
        )
        h = epoch // 3600
        t = pa.table(
            {"event_type": batch.column("event_type"), "h": pa.array(h)}
        )
        return t.group_by(["event_type", "h"]).aggregate(
            [("h", "count")]
        ).rename_columns(["event_type", "h", "n"])

    hourly = hash_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["event_type", "h"],
        {"n": ("n", "sum")},
        num_buckets=8,
    )
    mm = hourly.aggregate(Min("h"), Max("h"))
    H = int(mm["max(h)"]) - int(mm["min(h)"]) + 1

    def moments(b: pa.Table) -> pa.Table:
        n = np.asarray(b.column("n"), dtype=np.int64)
        t = pa.table(
            {
                "event_type": b.column("event_type"),
                "sx": pa.array(n),
                "sxx": pa.array(n * n),
            }
        )
        return t.group_by("event_type").aggregate(
            [("sx", "sum"), ("sxx", "sum")]
        ).rename_columns(["event_type", "sx", "sxx"])

    agg = (
        hourly.map_batches(moments, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(Sum("sx", alias_name="sx"), Sum("sxx", alias_name="sxx"))
    )

    def finish(b: pa.Table) -> pa.Table:
        sx = np.asarray(b.column("sx"), dtype=np.int64)
        sxx = np.asarray(b.column("sxx"), dtype=np.int64)
        fano = np.round(
            (H * sxx.astype(np.float64) - sx.astype(np.float64) * sx)
            / (H * sx.astype(np.float64)),
            6,
        )
        return pa.table(
            {
                "event_type": b.column("event_type"),
                "n_events": pa.array(sx),
                "n_hours": pa.array(np.full(sx.shape[0], H, np.int64)),
                "fano": pa.array(fano, pa.float64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow").sort("event_type")
