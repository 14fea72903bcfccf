"""Multi-way join and advanced-aggregate demos over the driver tables.

Complements pipelines/relational.py with the shapes a warehouse-style
workload adds on top of single-join queries: 3-5 table join trees
(TPC-H Q3/Q5 analogs), JSON field extraction, higher statistical
moments, ROLLUP grouping sets, cohort set-intersection, grouped
argmax/mode, and fixed-bin histograms.

Scale discipline (same rules as relational.py):
- every big-big join is ONE key-bucket cogroup (union + groupby on a
  hash bucket, vectorized per-bucket merge) — no Dataset.join actors,
  no broadcast of a large side;
- genuinely small sides (supplier key->nation lut, the 25-row nation
  table) ship once via ray.put and are documented as such;
- monetary/metric sums accumulate as exact integers so Ray and the
  DuckDB oracle produce bit-identical doubles after one final division
  (third moments split into hi/lo int64 words so the int64 Sum cannot
  overflow at any corpus size — recombined exactly as Python ints in
  the finish);
- aggregates pre-reduce per batch before any shuffle.

Reference anchor: these generalize the reference's dict-join + running
mean utilities (src/utils/vocab.py:22, src/utils/statistic.py:8-14) to
multi-table trees — WHAT is computed stays relational, HOW is Ray Data
cogroups and partial/combiner aggregation.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd
from ray.data.aggregate import Sum

from vietnamese_ocr_ray.functions.agg import hash_aggregate
from vietnamese_ocr_ray.functions.joins import key_bucket
from vietnamese_ocr_ray.pipelines.relational import _cents
from vietnamese_ocr_ray.sources.storage import read_parquet_clean


def _chunk(col) -> pa.Array:
    return col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col


# ---------------------------------------------------------------------------
# TPC-H Q3 shape: segment customers -> open orders -> line revenue, top-k
# ---------------------------------------------------------------------------


def shipping_priority(
    sf_dir: str,
    segment: str = "BUILDING",
    cutoff: str = "1998-07-01",
    k: int = 10,
    num_buckets: int = 32,
) -> rd.Dataset:
    """Top-k open orders by outstanding revenue for one market segment
    (TPC-H Q3 shape): customer ⋈ orders ⋈ lineitem with date filters on
    both fact tables.

    Join tree as two bucket cogroups:
      1. orders(filtered) semi-join customer(segment) on custkey —
         customer side is only (custkey) ints after the segment filter,
         but still streams through the shuffle (no broadcast: segments
         are ~1/5 of all customers, huge at scale);
      2. per-order revenue (hash_aggregate over lineitem partials)
         inner-join the surviving orders on orderkey.
    Final sort is over the per-order aggregate (orders-sized, not
    lineitem-sized) and k rows leave the cluster.
    """
    cut = np.datetime64(cutoff, "us")

    cust = read_parquet_clean(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_mktsegment"],
        filter=pc.field("c_mktsegment") == segment,
    )
    orders = read_parquet_clean(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"],
        filter=pc.field("o_orderdate") < cut,
    )

    def tag_cust(b: pa.Table) -> pa.Table:
        key = pc.cast(_chunk(b.column("c_custkey")), pa.int64())
        n = b.num_rows
        return pa.table(
            {
                "key": key,
                "o_orderkey": pa.nulls(n, pa.int64()),
                "o_orderdate": pa.nulls(n, pa.timestamp("us")),
                "o_orderpriority": pa.nulls(n, pa.string()),
                "_side": pa.array(np.zeros(n, np.int8)),
                "_bucket": pa.array(key_bucket(key, num_buckets).astype(np.int32)),
            }
        )

    def tag_orders(b: pa.Table) -> pa.Table:
        key = pc.cast(_chunk(b.column("o_custkey")), pa.int64())
        return pa.table(
            {
                "key": key,
                "o_orderkey": pc.cast(_chunk(b.column("o_orderkey")), pa.int64()),
                "o_orderdate": _chunk(b.column("o_orderdate")),
                "o_orderpriority": _chunk(b.column("o_orderpriority")),
                "_side": pa.array(np.ones(b.num_rows, np.int8)),
                "_bucket": pa.array(key_bucket(key, num_buckets).astype(np.int32)),
            }
        )

    def semi_bucket(g: pd.DataFrame) -> pa.Table:
        keep = g.loc[g["_side"] == 0, "key"].to_numpy(np.int64)
        rows = g[g["_side"] == 1]
        mask = np.isin(rows["key"].to_numpy(np.int64), keep)
        rows = rows[mask]
        return pa.table(
            {
                "o_orderkey": pa.array(rows["o_orderkey"].to_numpy(np.int64)),
                "o_orderdate": pa.Array.from_pandas(
                    rows["o_orderdate"], type=pa.timestamp("us")
                ),
                # explicit type: from_pandas of an all-filtered (empty)
                # object column would otherwise infer pa.null()
                "o_orderpriority": pa.Array.from_pandas(
                    rows["o_orderpriority"], type=pa.string()
                ),
            }
        )

    seg_orders = (
        cust.map_batches(tag_cust, batch_format="pyarrow")
        .union(orders.map_batches(tag_orders, batch_format="pyarrow"))
        .groupby("_bucket")
        .map_groups(
            lambda g: semi_bucket(g.drop(columns=["_bucket"])),
            batch_format="pandas",
        )
    )

    # per-order outstanding revenue in exact 1e-4 units
    line = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"],
        filter=pc.field("l_shipdate") > cut,
    )

    def rev_partial(b: pa.Table) -> pa.Table:
        price_c = _cents(b.column("l_extendedprice"), 100)
        disc = _cents(b.column("l_discount"), 100)
        rev = pc.multiply(price_c, pc.subtract(pa.scalar(100, pa.int64()), disc))
        t = pa.table(
            {"l_orderkey": pc.cast(_chunk(b.column("l_orderkey")), pa.int64()), "rev": rev}
        )
        return t.group_by("l_orderkey").aggregate([("rev", "sum")]).rename_columns(
            ["l_orderkey", "rev"]
        )

    order_rev = hash_aggregate(
        line.map_batches(rev_partial, batch_format="pyarrow"),
        ["l_orderkey"],
        {"rev": ("rev", "sum")},
        num_buckets=num_buckets,
    )

    def tag_rev(b: pa.Table) -> pa.Table:
        key = pc.cast(_chunk(b.column("l_orderkey")), pa.int64())
        n = b.num_rows
        return pa.table(
            {
                "key": key,
                "rev": pc.cast(_chunk(b.column("rev")), pa.int64()),
                "o_orderdate": pa.nulls(n, pa.timestamp("us")),
                "o_orderpriority": pa.nulls(n, pa.string()),
                "_side": pa.array(np.zeros(n, np.int8)),
                "_bucket": pa.array(key_bucket(key, num_buckets).astype(np.int32)),
            }
        )

    def tag_seg(b: pa.Table) -> pa.Table:
        key = pc.cast(_chunk(b.column("o_orderkey")), pa.int64())
        n = b.num_rows
        return pa.table(
            {
                "key": key,
                "rev": pa.nulls(n, pa.int64()),
                "o_orderdate": _chunk(b.column("o_orderdate")),
                "o_orderpriority": _chunk(b.column("o_orderpriority")),
                "_side": pa.array(np.ones(n, np.int8)),
                "_bucket": pa.array(key_bucket(key, num_buckets).astype(np.int32)),
            }
        )

    def inner_bucket(g: pd.DataFrame) -> pa.Table:
        left = g[g["_side"] == 0][["key", "rev"]]
        right = g[g["_side"] == 1][["key", "o_orderdate", "o_orderpriority"]]
        m = left.merge(right, on="key", how="inner")
        return pa.table(
            {
                "o_orderkey": pa.array(m["key"].to_numpy(np.int64)),
                "revenue": pa.array(
                    m["rev"].to_numpy(np.int64).astype(np.float64) / 1e4
                ),
                "o_orderdate": pa.Array.from_pandas(
                    m["o_orderdate"], type=pa.timestamp("us")
                ),
                # explicit type: an empty inner-join result would
                # otherwise infer pa.null() for the object column
                "o_orderpriority": pa.Array.from_pandas(
                    m["o_orderpriority"], type=pa.string()
                ),
            }
        )

    joined = (
        order_rev.map_batches(tag_rev, batch_format="pyarrow")
        .union(seg_orders.map_batches(tag_seg, batch_format="pyarrow"))
        .groupby("_bucket")
        .map_groups(
            lambda g: inner_bucket(g.drop(columns=["_bucket"])),
            batch_format="pandas",
        )
    )
    # deterministic top-k: revenue desc, orderkey asc tie-break
    return joined.sort(["revenue", "o_orderkey"], descending=[True, False]).limit(k)


# ---------------------------------------------------------------------------
# TPC-H Q5 shape: revenue per nation where customer and supplier co-located
# ---------------------------------------------------------------------------


def local_supplier_volume(
    sf_dir: str,
    date_lo: str = "1996-01-01",
    date_hi: str = "1997-01-01",
    num_buckets: int = 32,
) -> rd.Dataset:
    """Revenue per nation from orders in [date_lo, date_hi) where the
    customer and the line's supplier share a nation (TPC-H Q5 shape,
    all nations): customer ⋈ orders ⋈ lineitem ⋈ supplier ⋈ nation.

    Two bucket cogroups move the big tables once each:
      1. orders(date range) ⋈ customer on custkey -> orders with
         c_nationkey;
      2. lineitem pre-aggregated to (orderkey, s_nationkey, rev) —
         supplier key->nationkey is a genuinely small broadcast lut
         (2 int columns, suppkey-cardinality) — ⋈ those orders on
         orderkey, keeping only co-located rows.
    Partial sums per nation leave each bucket; the final groupby is
    25 rows. Nation names attach from the 25-row broadcast table.
    """
    lo, hi = np.datetime64(date_lo, "us"), np.datetime64(date_hi, "us")

    supp = pd.read_parquet(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    )
    nation = pd.read_parquet(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    )
    supp_handle = ray.put(
        dict(
            zip(
                supp["s_suppkey"].to_numpy(np.int64),
                supp["s_nationkey"].to_numpy(np.int64),
            )
        )
    )
    nation_names = dict(
        zip(nation["n_nationkey"].to_numpy(np.int64), nation["n_name"])
    )

    orders = read_parquet_clean(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
        filter=(pc.field("o_orderdate") >= lo) & (pc.field("o_orderdate") < hi),
    )
    cust = read_parquet_clean(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    )

    def tag_cust(b: pa.Table) -> pa.Table:
        key = pc.cast(_chunk(b.column("c_custkey")), pa.int64())
        return pa.table(
            {
                "key": key,
                "payload": pc.cast(_chunk(b.column("c_nationkey")), pa.int64()),
                "_side": pa.array(np.zeros(b.num_rows, np.int8)),
                "_bucket": pa.array(key_bucket(key, num_buckets).astype(np.int32)),
            }
        )

    def tag_orders(b: pa.Table) -> pa.Table:
        key = pc.cast(_chunk(b.column("o_custkey")), pa.int64())
        return pa.table(
            {
                "key": key,
                "payload": pc.cast(_chunk(b.column("o_orderkey")), pa.int64()),
                "_side": pa.array(np.ones(b.num_rows, np.int8)),
                "_bucket": pa.array(key_bucket(key, num_buckets).astype(np.int32)),
            }
        )

    def attach_nation(g: pd.DataFrame) -> pa.Table:
        cust_rows = g[g["_side"] == 0]
        lut = dict(
            zip(
                cust_rows["key"].to_numpy(np.int64),
                cust_rows["payload"].to_numpy(np.int64),
            )
        )
        rows = g[g["_side"] == 1]
        keys = rows["key"].to_numpy(np.int64)
        nat = np.array([lut.get(k, -1) for k in keys], np.int64)
        return pa.table(
            {
                "o_orderkey": pa.array(rows["payload"].to_numpy(np.int64)),
                "c_nationkey": pa.array(nat),
            }
        )

    orders_nat = (
        cust.map_batches(tag_cust, batch_format="pyarrow")
        .union(orders.map_batches(tag_orders, batch_format="pyarrow"))
        .groupby("_bucket")
        .map_groups(
            lambda g: attach_nation(g.drop(columns=["_bucket"])),
            batch_format="pandas",
        )
    )

    line = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )

    class RevBySuppNation:
        """Stateful partial: supplier lut fetched once per actor."""

        def __init__(self):
            self.lut = ray.get(supp_handle)

        def __call__(self, b: pa.Table) -> pa.Table:
            price_c = _cents(b.column("l_extendedprice"), 100)
            disc = _cents(b.column("l_discount"), 100)
            rev = pc.multiply(
                price_c, pc.subtract(pa.scalar(100, pa.int64()), disc)
            )
            supp_keys = _chunk(b.column("l_suppkey")).to_numpy(zero_copy_only=False)
            lut = self.lut
            nat = np.array([lut[k] for k in supp_keys], np.int64)
            t = pa.table(
                {
                    "l_orderkey": pc.cast(_chunk(b.column("l_orderkey")), pa.int64()),
                    "s_nationkey": pa.array(nat),
                    "rev": rev,
                }
            )
            return t.group_by(["l_orderkey", "s_nationkey"]).aggregate(
                [("rev", "sum")]
            ).rename_columns(["l_orderkey", "s_nationkey", "rev"])

    line_rev = hash_aggregate(
        line.map_batches(RevBySuppNation, batch_format="pyarrow", concurrency=(1, 8)),
        ["l_orderkey", "s_nationkey"],
        {"rev": ("rev", "sum")},
        num_buckets=num_buckets,
    )

    def tag_line(b: pa.Table) -> pa.Table:
        key = pc.cast(_chunk(b.column("l_orderkey")), pa.int64())
        return pa.table(
            {
                "key": key,
                "nat": pc.cast(_chunk(b.column("s_nationkey")), pa.int64()),
                "rev": pc.cast(_chunk(b.column("rev")), pa.int64()),
                "_side": pa.array(np.zeros(b.num_rows, np.int8)),
                "_bucket": pa.array(key_bucket(key, num_buckets).astype(np.int32)),
            }
        )

    def tag_onat(b: pa.Table) -> pa.Table:
        key = pc.cast(_chunk(b.column("o_orderkey")), pa.int64())
        return pa.table(
            {
                "key": key,
                "nat": pc.cast(_chunk(b.column("c_nationkey")), pa.int64()),
                "rev": pa.nulls(b.num_rows, pa.int64()),
                "_side": pa.array(np.ones(b.num_rows, np.int8)),
                "_bucket": pa.array(key_bucket(key, num_buckets).astype(np.int32)),
            }
        )

    def colocated_partial(g: pd.DataFrame) -> pa.Table:
        left = g[g["_side"] == 0][["key", "nat", "rev"]]
        right = g[g["_side"] == 1][["key", "nat"]].rename(columns={"nat": "cnat"})
        m = left.merge(right, on="key", how="inner")
        m = m[m["nat"].to_numpy(np.int64) == m["cnat"].to_numpy(np.int64)]
        out = m.groupby("nat", as_index=False).agg(rev=("rev", "sum"))
        return pa.table(
            {
                "nationkey": pa.array(out["nat"].to_numpy(np.int64)),
                "rev": pa.array(out["rev"].to_numpy(np.int64)),
            }
        )

    per_nation = (
        line_rev.map_batches(tag_line, batch_format="pyarrow")
        .union(orders_nat.map_batches(tag_onat, batch_format="pyarrow"))
        .groupby("_bucket")
        .map_groups(
            lambda g: colocated_partial(g.drop(columns=["_bucket"])),
            batch_format="pandas",
        )
        .groupby("nationkey")
        .aggregate(Sum("rev", alias_name="rev"))
    )

    def finish(b: pa.Table) -> pa.Table:
        keys = _chunk(b.column("nationkey")).to_numpy(zero_copy_only=False)
        names = [nation_names[k] for k in keys]
        return pa.table(
            {
                "n_name": pa.array(names, pa.string()),
                "revenue": pc.divide(
                    pc.cast(b.column("rev"), pa.float64()), pa.scalar(10000.0)
                ),
            }
        )

    return per_nation.map_batches(finish, batch_format="pyarrow").sort(
        "revenue", descending=True
    )


# ---------------------------------------------------------------------------
# JSON field extraction (vectorized regex over a string column)
# ---------------------------------------------------------------------------


def json_extract_stats(sf_dir: str) -> rd.Dataset:
    """Extract the integer field k from the events' JSON props column
    with one vectorized regex (pc.extract_regex — no per-row json.loads)
    and aggregate per event_type: count, exact integer sum, mean."""
    ds = read_parquet_clean(
        f"{sf_dir}/events.parquet", columns=["event_type", "props"]
    )

    def partial(b: pa.Table) -> pa.Table:
        ext = pc.extract_regex(_chunk(b.column("props")), r'"k":\s*(?P<k>-?\d+)')
        k = pc.cast(pc.struct_field(ext, "k"), pa.int64())
        t = pa.table(
            {
                "event_type": b.column("event_type"),
                "k": k,
                "one": pa.array(np.ones(b.num_rows, np.int64)),
            }
        )
        g = t.group_by("event_type").aggregate([("k", "sum"), ("one", "sum")])
        return pa.table(
            {
                "event_type": g.column("event_type"),
                # coalesce: an all-null group sums to null in Arrow but 0
                # in the pandas partial this replaces; n counts ALL rows
                # (null k included), hence the ones column, not count(k)
                "s": pc.coalesce(g.column("k_sum"), pa.scalar(0, pa.int64())),
                "n": g.column("one_sum"),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(Sum("s", alias_name="s"), Sum("n", alias_name="n"))
        .map_batches(
            lambda b: pa.table(
                {
                    "event_type": b.column("event_type"),
                    "n_events": pc.cast(b.column("n"), pa.int64()),
                    "sum_k": pc.cast(b.column("s"), pa.int64()),
                    "avg_k": pc.divide(
                        pc.cast(b.column("s"), pa.float64()),
                        pc.cast(b.column("n"), pa.float64()),
                    ),
                }
            ),
            batch_format="pyarrow",
        )
    )


# ---------------------------------------------------------------------------
# Grouped skewness from exact integer moment sums (hi/lo split vs overflow)
# ---------------------------------------------------------------------------


def value_skewness(sf_dir: str) -> rd.Dataset:
    """Population skewness of value per event_type from exact integer
    moment sums (cents). sum(v^3) would overflow int64 at large corpus
    sizes (v^3 ~ 3.5e13 per row), so each batch splits its cube sum
    into hi/lo 2^32 words; the two int64 Sums stay exact to ~1e15 rows
    per type and the finish recombines hi*2^32+lo as exact Python ints.
    DuckDB's BIGINT sum promotes to HUGEINT, so both sides compute the
    identical double formula from identical exact sums; ROUND(.,6) on
    both sides absorbs the last-ulp pow() difference."""
    ds = read_parquet_clean(f"{sf_dir}/events.parquet", columns=["event_type", "value"])

    def partial(b: pa.Table) -> pa.Table:
        v = _cents(b.column("value"), 100).to_numpy(zero_copy_only=False)
        t = pa.table(
            {
                "event_type": b.column("event_type"),
                "s1": pa.array(v),
                "s2": pa.array(v * v),
                "c3": pa.array(v * v * v),
            }
        )
        g = t.group_by("event_type").aggregate(
            [("s1", "sum"), ("s2", "sum"), ("c3", "sum"), ("s1", "count")]
        )
        c3 = g.column("c3_sum").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "event_type": g.column("event_type"),
                "s1": g.column("s1_sum"),
                "s2": g.column("s2_sum"),
                "n": g.column("s1_count"),
                "s3_hi": pa.array(c3 >> 32),
                "s3_lo": pa.array(c3 & np.int64(0xFFFFFFFF)),
            }
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(
            Sum("s1", alias_name="s1"),
            Sum("s2", alias_name="s2"),
            Sum("s3_hi", alias_name="s3_hi"),
            Sum("s3_lo", alias_name="s3_lo"),
            Sum("n", alias_name="n"),
        )
    )

    def finish(b: pa.Table) -> pa.Table:
        out_skew = []
        for s1, s2, hi, lo, n in zip(
            b.column("s1").to_pylist(),
            b.column("s2").to_pylist(),
            b.column("s3_hi").to_pylist(),
            b.column("s3_lo").to_pylist(),
            b.column("n").to_pylist(),
        ):
            s3 = (int(hi) << 32) + int(lo)  # exact Python int
            # identical formula text to the SQL oracle (cents scale)
            mean = s1 / n
            m2 = s2 / n - mean * mean
            m3 = s3 / n - 3.0 * mean * (s2 / n) + 2.0 * mean * mean * mean
            out_skew.append(round(m3 / m2**1.5, 6))
        return pa.table(
            {
                "event_type": b.column("event_type"),
                "n_events": pc.cast(b.column("n"), pa.int64()),
                "skewness": pa.array(out_skew, pa.float64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# ROLLUP grouping sets
# ---------------------------------------------------------------------------

_ROLLUP_SENTINEL = "\x00"


def _sent_col(n: int) -> pa.Array:
    return pa.array([_ROLLUP_SENTINEL] * n, pa.string())


def _nchars_level(t: pa.Table, keys: list) -> pa.Table:
    """(n, chars) per key set — the rollup/cube per-batch building
    block, column order (keys..., n, chars); n counts rows (chars is
    non-null)."""
    g = t.group_by(keys).aggregate([("chars", "count"), ("chars", "sum")])
    return g.rename_columns([*keys, "n", "chars"]).select(
        [*keys, "n", "chars"]
    )


def rollup_lang_source(sf_dir: str) -> rd.Dataset:
    """GROUP BY ROLLUP(lang, source) over documents: doc counts and
    exact char sums at (lang, source), (lang) and grand-total levels.
    One map_batches emits all three levels pre-aggregated per batch
    (3x the per-batch key rows, not 3 passes), one small groupby
    merges. NULL group keys travel as a sentinel through the shuffle
    (Ray's sort-based groupby and null keys don't mix) and convert
    back to real NULLs in the finish."""
    ds = read_parquet_clean(
        f"{sf_dir}/documents.parquet", columns=["lang", "source", "n_chars"]
    )

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "lang": pc.cast(_chunk(b.column("lang")), pa.string()),
                "source": pc.cast(_chunk(b.column("source")), pa.string()),
                "chars": pc.cast(_chunk(b.column("n_chars")), pa.int64()),
            }
        )
        lvl2 = _nchars_level(t, ["lang", "source"])
        l1 = _nchars_level(t, ["lang"])
        lvl1 = pa.table(
            {
                "lang": l1.column("lang"),
                "source": _sent_col(l1.num_rows),
                "n": l1.column("n"),
                "chars": l1.column("chars"),
            }
        )
        lvl0 = pa.table(
            {
                "lang": _sent_col(1),
                "source": _sent_col(1),
                "n": pa.array([t.num_rows], pa.int64()),
                "chars": pa.array(
                    [int(pc.sum(t.column("chars")).as_py() or 0)], pa.int64()
                ),
            }
        )
        return pa.concat_tables([lvl2, lvl1, lvl0]).combine_chunks()

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["lang", "source"])
        .aggregate(Sum("n", alias_name="n"), Sum("chars", alias_name="chars"))
    )

    def finish(b: pa.Table) -> pa.Table:
        lang = _chunk(b.column("lang"))
        source = _chunk(b.column("source"))
        sent = pa.scalar(_ROLLUP_SENTINEL)
        return pa.table(
            {
                "lang": pc.if_else(pc.equal(lang, sent), pa.scalar(None, pa.string()), lang),
                "source": pc.if_else(
                    pc.equal(source, sent), pa.scalar(None, pa.string()), source
                ),
                "n_docs": pc.cast(b.column("n"), pa.int64()),
                "sum_chars": pc.cast(b.column("chars"), pa.int64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Cohort set-intersection (INTERSECT without a shuffle join)
# ---------------------------------------------------------------------------


def cohort_intersect(
    sf_dir: str, type_a: str = "purchase", type_b: str = "error"
) -> rd.Dataset:
    """Users with at least one event of BOTH types (SQL INTERSECT of
    the two cohorts). One pass: per-batch distinct (user, flag_a,
    flag_b), bucketed max-merge, filter both flags — user rows shuffle
    once as 3 ints, never the events."""
    ds = read_parquet_clean(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "event_type"],
        filter=pc.field("event_type").isin([type_a, type_b]),
    )

    def partial(b: pa.Table) -> pa.Table:
        et = _chunk(b.column("event_type"))
        t = pa.table(
            {
                "user_id": _chunk(b.column("user_id")),
                "a": pc.cast(pc.equal(et, pa.scalar(type_a)), pa.int64()),
                "b": pc.cast(pc.equal(et, pa.scalar(type_b)), pa.int64()),
            }
        )
        return t.group_by("user_id").aggregate(
            [("a", "max"), ("b", "max")]
        ).rename_columns(["user_id", "a", "b"])

    both = hash_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["user_id"],
        {"a": ("a", "max"), "b": ("b", "max")},
    )

    def keep_both(b: pa.Table) -> pa.Table:
        mask = pc.and_(
            pc.equal(b.column("a"), pa.scalar(1, pa.int64())),
            pc.equal(b.column("b"), pa.scalar(1, pa.int64())),
        )
        return pa.table(
            {"user_id": pc.cast(_chunk(b.filter(mask).column("user_id")), pa.int64())}
        )

    return both.map_batches(keep_both, batch_format="pyarrow").sort("user_id")


# ---------------------------------------------------------------------------
# Grouped mode (most frequent token per language)
# ---------------------------------------------------------------------------


def mode_token_per_lang(sf_dir: str) -> rd.Dataset:
    """Most frequent whitespace token per language, ties broken by the
    lexicographically smallest token. Token counts reduce via the
    bucketed hash aggregate (vocabulary-sized shuffle, not corpus-
    sized); a per-batch top-1 partial then shrinks the vocabulary table
    to one candidate row per (batch, lang) before the tiny final pick."""
    ds = read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["lang", "text"])

    def explode_counts(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern(_chunk(b.column("text")), " ")
        flat = pc.list_flatten(toks)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        nt = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        lang = np.repeat(
            _chunk(b.column("lang")).to_numpy(zero_copy_only=False), nt
        )
        t = pa.table({"lang": pa.array(lang), "tok": flat})
        return t.group_by(["lang", "tok"]).aggregate(
            [("lang", "count")]
        ).rename_columns(["lang", "tok", "n"])

    counts = hash_aggregate(
        ds.map_batches(explode_counts, batch_format="pyarrow"),
        ["lang", "tok"],
        {"n": ("n", "sum")},
    )

    def top1_partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["lang", "n", "tok"], ascending=[True, False, True])
        return df.drop_duplicates("lang", keep="first")

    def top1_final(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["n", "tok"], ascending=[False, True])
        return g.head(1)[["lang", "tok", "n"]].rename(
            columns={"tok": "top_token", "n": "n_occurrences"}
        )

    return (
        counts.map_batches(top1_partial, batch_format="pandas")
        .groupby("lang")
        .map_groups(top1_final, batch_format="pandas")
    )


# ---------------------------------------------------------------------------
# Grouped argmax (event_type of each user's highest-value event)
# ---------------------------------------------------------------------------


def argmax_user_event(sf_dir: str, num_buckets: int = 32) -> rd.Dataset:
    """Per user: the event_type, value and timestamp of their maximum-
    value event (ties: earliest ts, then smallest event_id — a total
    order, so the answer is unique). Per-batch argmax partial first
    (one candidate row per (batch, user)), then one key-bucket shuffle
    and a vectorized per-bucket sort+first — per-user Python never
    runs."""
    ds = read_parquet_clean(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "event_type", "value", "ts", "event_id"],
    )

    def best(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(
            ["user_id", "value", "ts", "event_id"],
            ascending=[True, False, True, True],
        )
        return df.drop_duplicates("user_id", keep="first")

    def partial(b: pa.Table) -> pa.Table:
        # vectorized per-batch top-1 per user: lexsort mirrors best()'s
        # (user asc, value desc, ts asc, event_id asc) stable order,
        # then keep each user's first row via the boundary mask
        uid = b.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        val = b.column("value").to_numpy(zero_copy_only=False).astype(np.float64)
        ts = (
            b.column("ts")
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
        )
        eid = b.column("event_id").to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((eid, ts, -val, uid))
        u_sorted = uid[order]
        first = np.concatenate(([True], u_sorted[1:] != u_sorted[:-1]))
        out = b.take(pa.array(order[first]))
        return out.append_column(
            "_bucket",
            pa.array(
                key_bucket(out.column("user_id"), num_buckets).astype(np.int32)
            ),
        )

    def merge(g: pd.DataFrame) -> pa.Table:
        out = best(g)[["user_id", "event_type", "value", "ts"]]
        out = out.rename(
            columns={"event_type": "best_type", "value": "best_value", "ts": "best_ts"}
        )
        return pa.Table.from_pandas(out, preserve_index=False).replace_schema_metadata(None)

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(
            lambda g: merge(g.drop(columns=["_bucket"])), batch_format="pandas"
        )
    )


# ---------------------------------------------------------------------------
# Fixed-bin histogram
# ---------------------------------------------------------------------------


def value_histogram(
    sf_dir: str, bin_width_cents: int = 2500, num_bins: int = 14
) -> rd.Dataset:
    """Fixed-width histogram of event value (cents/2500 = 25-unit bins,
    top bin open). Per-batch bincount partials -> one tiny Sum groupby;
    bin edges in exact integer cents so Ray and SQL bucket identically."""
    ds = read_parquet_clean(f"{sf_dir}/events.parquet", columns=["value"])

    def partial(b: pa.Table) -> pa.Table:
        cents = _cents(b.column("value"), 100).to_numpy(zero_copy_only=False)
        bins = np.minimum(cents // bin_width_cents, num_bins - 1)
        counts = np.bincount(bins, minlength=num_bins)
        return pa.table(
            {
                "bin": pa.array(np.arange(num_bins, dtype=np.int64)),
                "n": pa.array(counts.astype(np.int64)),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("bin")
        .aggregate(Sum("n", alias_name="n"))
        .map_batches(
            lambda b: pa.table(
                {
                    "bin": pc.cast(b.column("bin"), pa.int64()),
                    "lo_value": pc.cast(
                        pc.multiply(b.column("bin"), pa.scalar(25, pa.int64())),
                        pa.float64(),
                    ),
                    "n_events": pc.cast(b.column("n"), pa.int64()),
                }
            # globally-empty bins drop, mirroring plain GROUP BY semantics
            ).filter(pc.greater(pc.cast(b.column("n"), pa.int64()), 0)),
            batch_format="pyarrow",
        )
    )


# ---------------------------------------------------------------------------
# Exact NTILE window (rank-based, hot-partition-safe)
# ---------------------------------------------------------------------------


def _rank_blocks(t: pa.Table, start: dict, totals: dict):
    """(0-based global rank, partition size) per row of one block of a
    dataset range-sorted by (event_type, ...). ``start`` is this
    block's per-partition exclusive-scan offset, ``totals`` the global
    partition sizes — both tiny (blocks x partitions)."""
    et = np.asarray(t.column("event_type"))
    first = np.ones(et.shape[0], dtype=bool)
    first[1:] = et[1:] != et[:-1]
    starts_idx = np.nonzero(first)[0]
    seg_len = np.diff(np.append(starts_idx, len(et)))
    local = np.arange(len(et), dtype=np.int64) - np.repeat(starts_idx, seg_len)
    off = np.array([start.get(e, 0) for e in et[starts_idx]], np.int64)
    rank = local + np.repeat(off, seg_len)
    n = np.repeat(np.array([totals[e] for e in et[starts_idx]], np.int64), seg_len)
    return rank, n


def _sorted_event_blocks(sf_dir: str):
    """Range-sort events by (event_type, value, event_id) and compute
    each block's per-partition rank offsets: the shared machinery
    behind the exact rank-based windows (ntile, percent_rank). One
    global sort; everything else is per-block + a tiny driver scan."""
    import ray

    ds = (
        read_parquet_clean(
            f"{sf_dir}/events.parquet",
            columns=["event_id", "event_type", "value"],
        )
        .sort(["event_type", "value", "event_id"])
        .materialize()
    )
    refs = ds.to_arrow_refs()

    @ray.remote
    def block_counts(t: pa.Table):
        et = np.asarray(t.column("event_type"))
        uniq, counts = np.unique(et, return_counts=True)
        return list(zip(uniq.tolist(), counts.tolist()))

    per_block = ray.get([block_counts.remote(r) for r in refs])
    offsets: list[dict] = []
    running: dict[str, int] = {}
    for rows in per_block:  # block order == sort order
        offsets.append(dict(running))
        for et, n in rows:
            running[et] = running.get(et, 0) + int(n)
    return refs, offsets, dict(running)


def value_ntile(sf_dir: str, tiles: int = 4) -> rd.Dataset:
    """Exact SQL ``ntile(tiles)`` of every event within its event_type,
    ordered by (value, event_id). ntile needs each row's GLOBAL rank in
    its partition, so per-key bucketing doesn't help a hot partition;
    this reuses the range-sort prefix technique of
    ``running_value_sum_rangesort``: one global range sort, per-block
    partition counts, a driver exclusive-scan over the tiny
    (blocks x partitions) count table, then per-block vectorized rank ->
    tile arithmetic. A partition bigger than any task's heap just spans
    consecutive blocks."""
    import ray

    refs, offsets, totals = _sorted_event_blocks(sf_dir)

    @ray.remote
    def finish(t: pa.Table, start: dict, totals: dict, tiles: int) -> pa.Table:
        rank, n = _rank_blocks(t, start, totals)
        q, rem = n // tiles, n % tiles
        big = rem * (q + 1)  # rows covered by the (q+1)-sized tiles
        tile = np.where(
            rank < big, rank // np.maximum(q + 1, 1), rem + (rank - big) // np.maximum(q, 1)
        )
        return pa.table(
            {
                "event_id": t.column("event_id"),
                "event_type": t.column("event_type"),
                "value": t.column("value"),
                "quartile": pa.array((tile + 1).astype(np.int64)),
            }
        )

    out = [finish.remote(r, offsets[i], totals, tiles) for i, r in enumerate(refs)]
    return rd.from_arrow_refs(out)


def value_percent_rank(sf_dir: str) -> rd.Dataset:
    """Exact SQL ``percent_rank()`` within event_type ordered by
    (value, event_id): rank/(n-1) from the same range-sort prefix
    machinery as :func:`value_ntile`. The order is total, so rank ==
    row_number and both sides divide the same exact integers —
    bit-identical doubles, no rounding needed."""
    import ray

    refs, offsets, totals = _sorted_event_blocks(sf_dir)

    @ray.remote
    def finish(t: pa.Table, start: dict, totals: dict) -> pa.Table:
        rank, n = _rank_blocks(t, start, totals)
        denom = np.maximum(n - 1, 1).astype(np.float64)
        return pa.table(
            {
                "event_id": t.column("event_id"),
                "event_type": t.column("event_type"),
                "value": t.column("value"),
                "pct_rank": pa.array(rank.astype(np.float64) / denom),
            }
        )

    out = [finish.remote(r, offsets[i], totals) for i, r in enumerate(refs)]
    return rd.from_arrow_refs(out)


# ---------------------------------------------------------------------------
# Time-grid resample with forward fill (ASOF against a generated grid)
# ---------------------------------------------------------------------------


def resample_ffill(sf_dir: str, step_hours: int = 6) -> rd.Dataset:
    """Per-user time-series resample: a regular ``step_hours`` grid
    spanning the corpus time range, each grid point carrying the user's
    most recent event value at-or-before it (inner ASOF semantics —
    grid points before a user's first event drop, exactly DuckDB's
    ``ASOF JOIN``).

    Scale shape: grid bounds are one tiny min/max aggregate (two driver
    scalars); the user dimension stays a Dataset (distinct via the
    bucketed hash aggregate) and each user batch cross-produces its
    grid rows locally, so the grid is GENERATED distributed, never
    collected; the fill itself is the existing bucketed asof_join (one
    shuffle, compiled per-bucket merge)."""
    from vietnamese_ocr_ray.functions.joins import asof_join

    events = read_parquet_clean(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "value"]
    )

    def ts_bounds(b: pa.Table) -> pa.Table:
        ts = _chunk(b.column("ts"))
        return pa.table({"lo": [pc.min(ts).as_py()], "hi": [pc.max(ts).as_py()]})

    # tiny driver scalars: grid lo/hi, truncated to the hour
    import ray.data.aggregate as rda

    agg = events.map_batches(ts_bounds, batch_format="pyarrow").aggregate(
        rda.Min("lo", alias_name="lo"), rda.Max("hi", alias_name="hi")
    )
    lo = np.datetime64(agg["lo"], "us")
    hi = np.datetime64(agg["hi"], "us")
    hour = np.timedelta64(3600_000_000, "us")
    lo_h = (lo.astype("int64") // hour.astype("int64")) * hour.astype("int64")
    hi_h = (hi.astype("int64") // hour.astype("int64")) * hour.astype("int64")
    grid_us = np.arange(lo_h, hi_h + 1, step_hours * hour.astype("int64"), dtype=np.int64)

    users = hash_aggregate(
        events, ["user_id"], {"n": ("ts", "count")}
    )

    def cross_grid(b: pa.Table) -> pa.Table:
        u = pc.cast(_chunk(b.column("user_id")), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        h = len(grid_us)
        return pa.table(
            {
                "user_id": pa.array(np.repeat(u, h)),
                "h": pa.array(
                    np.tile(grid_us, len(u)).view("datetime64[us]"),
                    pa.timestamp("us"),
                ),
            }
        )

    grid = users.map_batches(cross_grid, batch_format="pyarrow")

    right = events.map_batches(
        lambda b: pa.table(
            {
                "user_id": pc.cast(_chunk(b.column("user_id")), pa.int64()),
                "ev_ts": _chunk(b.column("ts")),
                "last_value": _chunk(b.column("value")),
            }
        ),
        batch_format="pyarrow",
    )
    joined = asof_join(
        grid, right, by="user_id", left_on="h", right_on="ev_ts",
        direction="backward",
    )
    return joined.map_batches(
        lambda b: b.select(["user_id", "h", "last_value"]),
        batch_format="pyarrow",
    )


def cube_lang_source(sf_dir: str) -> rd.Dataset:
    """GROUP BY CUBE(lang, source): ROLLUP's levels plus the
    (NULL, source) margin. Same one-pass shape as
    :func:`rollup_lang_source` — each batch emits all four pre-reduced
    levels, one small groupby merges, sentinels become NULLs at the
    finish."""
    ds = read_parquet_clean(
        f"{sf_dir}/documents.parquet", columns=["lang", "source", "n_chars"]
    )

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "lang": pc.cast(_chunk(b.column("lang")), pa.string()),
                "source": pc.cast(_chunk(b.column("source")), pa.string()),
                "chars": pc.cast(_chunk(b.column("n_chars")), pa.int64()),
            }
        )
        lvl2 = _nchars_level(t, ["lang", "source"])
        l1 = _nchars_level(t, ["lang"])
        lvl_lang = pa.table(
            {
                "lang": l1.column("lang"),
                "source": _sent_col(l1.num_rows),
                "n": l1.column("n"),
                "chars": l1.column("chars"),
            }
        )
        ls = _nchars_level(t, ["source"])
        lvl_src = pa.table(
            {
                "lang": _sent_col(ls.num_rows),
                "source": ls.column("source"),
                "n": ls.column("n"),
                "chars": ls.column("chars"),
            }
        )
        lvl0 = pa.table(
            {
                "lang": _sent_col(1),
                "source": _sent_col(1),
                "n": pa.array([t.num_rows], pa.int64()),
                "chars": pa.array(
                    [int(pc.sum(t.column("chars")).as_py() or 0)], pa.int64()
                ),
            }
        )
        return pa.concat_tables(
            [lvl2, lvl_lang, lvl_src, lvl0]
        ).combine_chunks()

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["lang", "source"])
        .aggregate(Sum("n", alias_name="n"), Sum("chars", alias_name="chars"))
    )

    def finish(b: pa.Table) -> pa.Table:
        lang = _chunk(b.column("lang"))
        source = _chunk(b.column("source"))
        sent = pa.scalar(_ROLLUP_SENTINEL)
        return pa.table(
            {
                "lang": pc.if_else(pc.equal(lang, sent), pa.scalar(None, pa.string()), lang),
                "source": pc.if_else(
                    pc.equal(source, sent), pa.scalar(None, pa.string()), source
                ),
                "n_docs": pc.cast(b.column("n"), pa.int64()),
                "sum_chars": pc.cast(b.column("chars"), pa.int64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Ordered string aggregation (LISTAGG)
# ---------------------------------------------------------------------------


def sources_per_lang(sf_dir: str) -> rd.Dataset:
    """Per language: its distinct sources as one comma-joined, sorted
    string (SQL string_agg DISTINCT ... ORDER BY). Distinct pairs
    reduce via the bucketed hash aggregate (pair-cardinality shuffle),
    then one vectorized per-lang sort+join over the tiny result."""
    ds = read_parquet_clean(
        f"{sf_dir}/documents.parquet", columns=["lang", "source"]
    )

    def distinct_pairs(b: pa.Table) -> pa.Table:
        g = (
            b.select(["lang", "source"])
            .group_by(["lang", "source"])
            .aggregate([])
        )
        return g.append_column("one", pa.array(np.ones(g.num_rows, np.int64)))

    pairs = hash_aggregate(
        ds.map_batches(distinct_pairs, batch_format="pyarrow"),
        ["lang", "source"],
        {"n": ("one", "max")},
    )

    def join_sources(g: pd.DataFrame) -> pd.DataFrame:
        srcs = sorted(g["source"])
        return pd.DataFrame(
            {
                "lang": [g["lang"].iloc[0]],
                "n_sources": np.array([len(srcs)], np.int64),
                "sources": [",".join(srcs)],
            }
        )

    return pairs.groupby("lang").map_groups(join_sources, batch_format="pandas")


# ---------------------------------------------------------------------------
# Windowed distinct count + cohort retention
# ---------------------------------------------------------------------------


def hourly_active_users(sf_dir: str) -> rd.Dataset:
    """Distinct active users per UTC hour. Per-batch distinct
    (hour, user) pairs first (the combiner: the shuffle carries pair
    cardinality, not events), then the bucketed hash aggregate counts
    per hour after a second distinct — exact, no sketch."""
    ds = read_parquet_clean(
        f"{sf_dir}/events.parquet", columns=["ts", "user_id"]
    )

    def pairs(b: pa.Table) -> pa.Table:
        ts = _chunk(b.column("ts")).to_numpy(zero_copy_only=False)
        hour = (ts.astype("datetime64[h]")).astype("datetime64[us]")
        t = pa.table(
            {"hour": pa.array(hour), "user_id": _chunk(b.column("user_id"))}
        )
        return t.group_by(["hour", "user_id"]).aggregate([])

    def count_bucket(g: pd.DataFrame) -> pa.Table:
        d = g.drop_duplicates(["hour", "user_id"])
        out = d.groupby("hour", as_index=False).agg(n_users=("user_id", "size"))
        out["n_users"] = out["n_users"].astype(np.int64)
        return pa.Table.from_pandas(out, preserve_index=False).replace_schema_metadata(None)

    def add_bucket(b: pa.Table) -> pa.Table:
        hour = _chunk(b.column("hour"))
        return b.append_column(
            "_bucket",
            pa.array(key_bucket(pc.cast(hour, pa.int64()), 32).astype(np.int32)),
        )

    return (
        ds.map_batches(pairs, batch_format="pyarrow")
        .map_batches(add_bucket, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(
            lambda g: count_bucket(g.drop(columns=["_bucket"])),
            batch_format="pandas",
        )
    )


def retention_cohorts(sf_dir: str) -> rd.Dataset:
    """Classic cohort retention: users grouped by their first-event
    day-index (cohort), counted distinct per (cohort_day, activity_day
    offset). Three exact stages, all pre-reduced: (1) first-event day
    per user — bucketed hash-aggregate min; (2) cohort day joins back
    to each user's distinct activity days in a key-bucket cogroup (the
    user dimension shuffles as 2 ints); (3) distinct-pair counts per
    (cohort_day, day_offset) — a tiny final groupby."""
    epoch_day = np.timedelta64(86_400_000_000, "us").astype("int64")

    ds = read_parquet_clean(
        f"{sf_dir}/events.parquet", columns=["ts", "user_id"]
    )

    def user_days(b: pa.Table) -> pa.Table:
        ts = _chunk(b.column("ts")).to_numpy(zero_copy_only=False)
        day = ts.astype("int64") // epoch_day
        t = pa.table(
            {"user_id": _chunk(b.column("user_id")), "day": pa.array(day)}
        )
        return t.group_by(["user_id", "day"]).aggregate([])

    days = ds.map_batches(user_days, batch_format="pyarrow")
    first_day = hash_aggregate(
        days, ["user_id"], {"cohort_day": ("day", "min")}
    )

    num_buckets = 32

    def tag_first(b: pa.Table) -> pa.Table:
        key = pc.cast(_chunk(b.column("user_id")), pa.int64())
        return pa.table(
            {
                "key": key,
                "day": pc.cast(_chunk(b.column("cohort_day")), pa.int64()),
                "_side": pa.array(np.zeros(b.num_rows, np.int8)),
                "_bucket": pa.array(key_bucket(key, num_buckets).astype(np.int32)),
            }
        )

    def tag_days(b: pa.Table) -> pa.Table:
        key = pc.cast(_chunk(b.column("user_id")), pa.int64())
        return pa.table(
            {
                "key": key,
                "day": pc.cast(_chunk(b.column("day")), pa.int64()),
                "_side": pa.array(np.ones(b.num_rows, np.int8)),
                "_bucket": pa.array(key_bucket(key, num_buckets).astype(np.int32)),
            }
        )

    def offsets_bucket(g: pd.DataFrame) -> pa.Table:
        first = g[g["_side"] == 0][["key", "day"]].rename(columns={"day": "cohort"})
        acts = g[g["_side"] == 1][["key", "day"]]
        m = acts.merge(first, on="key", how="inner")
        m["day_offset"] = m["day"] - m["cohort"]
        out = (
            m.drop_duplicates(["cohort", "day_offset", "key"])
            .groupby(["cohort", "day_offset"], as_index=False)
            .agg(n=("key", "size"))
        )
        return pa.table(
            {
                "cohort_day": pa.array(out["cohort"].to_numpy(np.int64)),
                "day_offset": pa.array(out["day_offset"].to_numpy(np.int64)),
                "n": pa.array(out["n"].to_numpy(np.int64)),
            }
        )

    partials = (
        first_day.map_batches(tag_first, batch_format="pyarrow")
        .union(days.map_batches(tag_days, batch_format="pyarrow"))
        .groupby("_bucket")
        .map_groups(
            lambda g: offsets_bucket(g.drop(columns=["_bucket"])),
            batch_format="pandas",
        )
    )
    return (
        partials.groupby(["cohort_day", "day_offset"])
        .aggregate(Sum("n", alias_name="n"))
        .map_batches(
            lambda b: pa.table(
                {
                    "cohort_day": pc.cast(b.column("cohort_day"), pa.int64()),
                    "day_offset": pc.cast(b.column("day_offset"), pa.int64()),
                    "n_users": pc.cast(b.column("n"), pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
    )


def resample_interpolate(sf_dir: str, step_hours: int = 6) -> rd.Dataset:
    """Per-user LINEAR-INTERPOLATION resample — the twin of
    :func:`resample_ffill` for continuous signals: each grid point
    carries lerp(prev event, next event) at its timestamp, dropping
    grid points outside a user's event span (inner semantics both
    directions, exactly two DuckDB ASOF JOINs).

    Determinism: the lerp is ONE fixed-order float expression over
    exact int64 microsecond deltas and the raw stored doubles
    (vp + (vn - vp) * (dt1 / dt2)), with the exact-hit (dt2 == 0)
    case pinned to vp — bit-equal on both engines. Scale shape: grid
    generation as in resample_ffill (distributed cross-product, never
    collected); TWO bucketed asof_join shuffles (backward + forward);
    the lerp is a zero-shuffle map_batches on the joined stream."""
    from vietnamese_ocr_ray.functions.joins import asof_join

    events = read_parquet_clean(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "value"]
    )

    def ts_bounds(b: pa.Table) -> pa.Table:
        ts = _chunk(b.column("ts"))
        return pa.table(
            {"lo": [pc.min(ts).as_py()], "hi": [pc.max(ts).as_py()]}
        )

    import ray.data.aggregate as rda

    agg = events.map_batches(ts_bounds, batch_format="pyarrow").aggregate(
        rda.Min("lo", alias_name="lo"), rda.Max("hi", alias_name="hi")
    )
    lo = np.datetime64(agg["lo"], "us")
    hi = np.datetime64(agg["hi"], "us")
    hour = np.timedelta64(3600_000_000, "us").astype("int64")
    lo_h = (lo.astype("int64") // hour) * hour
    hi_h = (hi.astype("int64") // hour) * hour
    grid_us = np.arange(lo_h, hi_h + 1, step_hours * hour, dtype=np.int64)

    users = hash_aggregate(events, ["user_id"], {"n": ("ts", "count")})

    def cross_grid(b: pa.Table) -> pa.Table:
        u = pc.cast(_chunk(b.column("user_id")), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        return pa.table(
            {
                "user_id": pa.array(np.repeat(u, len(grid_us))),
                "h": pa.array(
                    np.tile(grid_us, len(u)).view("datetime64[us]"),
                    pa.timestamp("us"),
                ),
            }
        )

    grid = users.map_batches(cross_grid, batch_format="pyarrow")

    def right(b: pa.Table, ts_name: str, v_name: str) -> pa.Table:
        return pa.table(
            {
                "user_id": pc.cast(_chunk(b.column("user_id")), pa.int64()),
                ts_name: _chunk(b.column("ts")),
                v_name: _chunk(b.column("value")),
            }
        )

    prev = asof_join(
        grid,
        events.map_batches(
            lambda b: right(b, "tp", "vp"), batch_format="pyarrow"
        ),
        by="user_id", left_on="h", right_on="tp", direction="backward",
    )
    both = asof_join(
        prev,
        events.map_batches(
            lambda b: right(b, "tn", "vn"), batch_format="pyarrow"
        ),
        by="user_id", left_on="h", right_on="tn", direction="forward",
    )

    def lerp(b: pa.Table) -> pa.Table:
        h = np.asarray(b.column("h"), dtype="datetime64[us]").astype(np.int64)
        tp = np.asarray(b.column("tp"), dtype="datetime64[us]").astype(np.int64)
        tn = np.asarray(b.column("tn"), dtype="datetime64[us]").astype(np.int64)
        vp = np.asarray(b.column("vp"), dtype=np.float64)
        vn = np.asarray(b.column("vn"), dtype=np.float64)
        dt2 = tn - tp
        frac = (h - tp).astype(np.float64) / np.where(
            dt2 == 0, 1, dt2
        ).astype(np.float64)
        v = np.where(dt2 == 0, vp, vp + (vn - vp) * frac)
        return pa.table(
            {
                "user_id": b.column("user_id"),
                "h": b.column("h"),
                "value_interp": pa.array(v, pa.float64()),
            }
        )

    return both.map_batches(lerp, batch_format="pyarrow")


def source_hhi(sf_dir: str) -> rd.Dataset:
    """Herfindahl-Hirschman concentration of SOURCES within each
    language: HHI = sum_s (n_{lang,s} / n_lang)^2 — the
    mixture-diversity audit (HHI -> 1 means one crawl source dominates
    a language, a known overfitting risk when sampling by language).

    Determinism: the numerator sum_s n_{lang,s}^2 and denominator
    n_lang^2 are EXACT integers; the single final division is the only
    float op, so both engines emit the identical double. Scale shape:
    one bucketed (lang, source) hash-aggregate of per-batch partials;
    the HHI finish touches the languages x sources table only."""
    from vietnamese_ocr_ray.functions.agg import hash_aggregate

    ds = read_parquet_clean(
        f"{sf_dir}/documents.parquet", columns=["lang", "source"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["lang", "source"]).aggregate([([], "count_all")])
        return pa.table(
            {
                "lang": g.column("lang"),
                "source": g.column("source"),
                "n": pc.cast(g.column("count_all"), pa.int64()),
            }
        )

    counts = hash_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["lang", "source"],
        {"n": ("n", "sum")},
        num_buckets=8,
    )

    def finish(g) -> pa.Table:
        n = g["n"].to_numpy(np.int64)
        tot = int(n.sum())
        sq = int((n * n).sum())
        return pa.table(
            {
                "lang": pa.array([g["lang"].iloc[0]]),
                "n_sources": pa.array([len(g)], pa.int64()),
                "n_docs": pa.array([tot], pa.int64()),
                "hhi": pa.array(
                    [sq / float(tot * tot)], pa.float64()
                ),
            }
        )

    return counts.groupby("lang").map_groups(finish, batch_format="pandas")


def k_anonymity(sf_dir: str, k: int = 8) -> rd.Dataset:
    """k-anonymity audit over the (nationkey, mktsegment) quasi-
    identifier pair: per equivalence class its size and whether it
    meets the ``k`` threshold — the privacy gate run before releasing
    a user-level extract. Scale shape: per-batch partial counts, one
    small groupby (QI-class-bounded), flag column; no row-level data
    leaves the scan."""
    ds = read_parquet_clean(
        f"{sf_dir}/customer.parquet", columns=["c_nationkey", "c_mktsegment"]
    )

    def partial(b: pa.Table) -> pa.Table:
        return b.group_by(["c_nationkey", "c_mktsegment"]).aggregate(
            [("c_nationkey", "count")]
        ).rename_columns(["c_nationkey", "c_mktsegment", "n"])

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["c_nationkey", "c_mktsegment"])
        .aggregate(Sum("n", alias_name="n"))
        .map_batches(
            lambda b: b.append_column(
                "k_anonymous",
                pc.greater_equal(b.column("n"), pa.scalar(k)),
            ),
            batch_format="pyarrow",
        )
    )


def time_weighted_avg(sf_dir: str, num_buckets: int = 32) -> rd.Dataset:
    """Per-user time-weighted average of ``value`` (trapezoidal rule
    over the event timeline) — the correct "average state" metric for
    irregularly sampled streams, where the arithmetic mean over-weights
    bursts. Second-resolution timestamps and milli-quantized values
    keep every partial an exact int64 (per-pair product <= ~1e13; the
    SQL oracle accumulates the identical integers), one float division
    + 6dp round at the end. Users with < 2 events or zero span drop.

    Scale shape: ONE user-bucket shuffle, per bucket one vectorized
    pass (sort by (user, ts, event_id), shifted diffs, masked pair
    products, cython groupby-sum)."""
    ds = read_parquet_clean(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "value", "event_id"],
    )

    def add_bucket(b: pa.Table) -> pa.Table:
        return b.append_column(
            "_bucket",
            pa.array(key_bucket(b.column("user_id"), num_buckets).astype(np.int32)),
        )

    def twa(g: pd.DataFrame) -> pd.DataFrame:
        s = g.sort_values(["user_id", "ts", "event_id"], kind="stable")
        user = s["user_id"].to_numpy(np.int64)
        tsec = s["ts"].to_numpy().astype("datetime64[us]").astype(np.int64) // 1_000_000
        mv = np.asarray(_cents(pa.Array.from_pandas(s["value"]), 1000))
        same = user[1:] == user[:-1]
        dt = (tsec[1:] - tsec[:-1])[same]
        pairsum = (mv[1:] + mv[:-1])[same]
        u = user[1:][same]
        agg = pd.DataFrame(
            {"user_id": u, "numer": pairsum * dt, "denom": dt}
        ).groupby("user_id", as_index=False, sort=False).sum()
        agg = agg[agg["denom"] > 0]
        return pd.DataFrame(
            {
                "user_id": agg["user_id"],
                "twa": np.round(
                    agg["numer"].to_numpy(np.float64)
                    / (2000.0 * agg["denom"].to_numpy(np.float64)),
                    6,
                ),
            }
        )

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(
            lambda g: twa(g.drop(columns=["_bucket"])), batch_format="pandas"
        )
    )


def key_skew_gini(sf_dir: str) -> rd.Dataset:
    """Partition-skew audit: Gini coefficient of the per-partkey row
    counts of lineitem — the one-number answer to "will this key
    shuffle hot-spot?". Exact integers end-to-end (ascending-count
    ranks via the distributed global_rank; ties contribute identically
    under any tie order, so the statistic is deterministic), one float
    division + 6dp round. Output: (n_keys, n_rows, gini).

    Scale shape: counts ride one bucketed hash-aggregate; the rank pass
    sorts only the KEY-COUNT table (distinct-key-sized, not row-sized);
    final reduce is three exact integer sums."""
    from vietnamese_ocr_ray.functions.rank import global_rank

    ds = read_parquet_clean(f"{sf_dir}/lineitem.parquet", columns=["l_partkey"])

    def partial(b: pa.Table) -> pa.Table:
        u, c = np.unique(np.asarray(b.column("l_partkey"), np.int64), return_counts=True)
        return pa.table({"key": pa.array(u), "c": pa.array(c.astype(np.int64))})

    counts = hash_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["key"],
        {"c": ("c", "sum")},
    )
    ranked = global_rank(counts, ["c", "key"], out_col="rank")

    def moments(b: pa.Table) -> pa.Table:
        c = np.asarray(b.column("c"), np.int64)
        r = np.asarray(b.column("rank"), np.int64) + 1  # 1-based
        return pa.table(
            {
                "n_keys": pa.array([np.int64(len(c))]),
                "total": pa.array([c.sum()]),
                "rc": pa.array([(r * c).sum()]),
            }
        )

    def finish(b: pa.Table) -> pa.Table:
        n = int(pc.sum(b.column("n_keys")).as_py() or 0)
        tot = int(pc.sum(b.column("total")).as_py() or 0)
        rc = int(pc.sum(b.column("rc")).as_py() or 0)
        gini = (2.0 * rc - (n + 1.0) * tot) / (float(n) * tot) if n and tot else 0.0
        return pa.table(
            {
                "n_keys": pa.array([n], pa.int64()),
                "n_rows": pa.array([tot], pa.int64()),
                "gini": pa.array([round(gini, 6)], pa.float64()),
            }
        )

    return ranked.map_batches(moments, batch_format="pyarrow").repartition(1).map_batches(
        finish, batch_format="pyarrow"
    )


def cusum_drift(
    sf_dir: str, thresh_milli: int = 200_000, num_buckets: int = 8
) -> rd.Dataset:
    """CUSUM changepoint/drift detection per event_type over hourly
    value sums (Page 1954), exact-integer end-to-end via the closed
    form ``S_t = C_t - min(0, min_{j<=t} C_j)`` with
    ``C = cumsum(H*x_t - T)`` — the per-type deviation series scaled by
    the hour count H so the target mean T/H never becomes a float.
    ``drift`` flags hours where S_t exceeds ``thresh_milli * H``
    (threshold stated in milli-value units, scale-matched to S).
    Observed hours only (gaps contribute nothing, documented).

    Scale shape: hourly sums ride one bucketed hash-aggregate (the
    shuffle carries (type, hour) cells, not events); per-type totals
    are a type-bounded broadcast; the sequential scan is one vectorized
    cumsum/cummin per type (744 cells/month — driver never loops)."""
    ds = read_parquet_clean(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts", "value"]
    )

    def hourly(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "event_type": b.column("event_type"),
                "hour": pc.floor_temporal(b.column("ts"), unit="hour"),
                "x": _cents(b.column("value"), 1000),
            }
        )
        return t.group_by(["event_type", "hour"]).aggregate(
            [("x", "sum")]
        ).rename_columns(["event_type", "hour", "x"])

    cells = hash_aggregate(
        ds.map_batches(hourly, batch_format="pyarrow"),
        ["event_type", "hour"],
        {"x": ("x", "sum")},
        num_buckets=num_buckets,
    )

    def scan(g: pd.DataFrame) -> pd.DataFrame:
        s = g.sort_values("hour", kind="stable")
        x = s["x"].to_numpy(np.int64)
        hh = np.int64(len(x))
        tot = x.sum()
        c = np.cumsum(hh * x - tot)
        mn = np.minimum(np.minimum.accumulate(c), 0)
        cusum = c - mn
        return pd.DataFrame(
            {
                "event_type": s["event_type"],
                "hour": s["hour"],
                "cusum": cusum,
                "drift": cusum > np.int64(thresh_milli) * hh,
            }
        )

    return cells.groupby("event_type").map_groups(scan, batch_format="pandas")


def dp_counts(sf_dir: str, epsilon: float = 0.5) -> rd.Dataset:
    """Differential-privacy count release (Dwork 2006 Laplace
    mechanism) per event_type, with DETERMINISTIC noise so the release
    is reproducible and SQL-replayable: the noise draw's uniform comes
    from splitmix64(FNV-1a(event_type)) top 53 bits (the HLL family's
    exact hash chain), mapped through the Laplace inverse CDF
    ``-b * sign(u - 1/2) * ln(1 - 2|u - 1/2|)`` with ``b = 1/epsilon``,
    then quantized to integer milli-units BEFORE the release sum (the
    only float op pair is one ln + one division, replayed verbatim by
    the oracle; a seeded-not-random mechanism is a calibration/audit
    artifact, not a production privacy guarantee — document the seed).

    Scale shape: per-batch partial counts -> one tiny grouped sum;
    noise is a vectorized map over the group-bounded count table."""
    from vietnamese_ocr_ray.functions.dedup import content_hash64

    ds = read_parquet_clean(f"{sf_dir}/events.parquet", columns=["event_type"])

    def partial(b: pa.Table) -> pa.Table:
        vc = pc.value_counts(b.column("event_type").combine_chunks())
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
    )

    def add_noise(b: pa.Table) -> pa.Table:
        et = b.column("event_type")
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        n = np.asarray(b.column("n"), np.int64)
        h = content_hash64(et).astype(np.uint64)
        z = h ^ (h >> np.uint64(30))
        z = z * np.uint64(0xBF58476D1CE4E5B9)
        z ^= z >> np.uint64(27)
        z = z * np.uint64(0x94D049BB133111EB)
        z ^= z >> np.uint64(31)
        u = (z >> np.uint64(11)).astype(np.float64) * 2.0**-53
        d = u - 0.5
        noise = -(1.0 / epsilon) * np.sign(d) * np.log(1.0 - 2.0 * np.abs(d))
        milli = np.floor(noise * 1000.0 + 0.5).astype(np.int64)
        return pa.table(
            {
                "event_type": et,
                "n": pa.array(n),
                "noisy_n": pa.array(
                    n.astype(np.float64) + milli.astype(np.float64) / 1000.0,
                    pa.float64(),
                ),
            }
        )

    return counts.map_batches(add_noise, batch_format="pyarrow")


def value_auc(sf_dir: str, positive: str = "purchase") -> rd.Dataset:
    """Mann-Whitney AUC of ``value`` as a ranking score for
    ``event_type == positive`` — the model-free separability metric
    every scoring pipeline reports, EXACT: with milli-quantized scores,
    ``AUC = (2*wins + ties) / (2*P*N)`` where wins = positive-negative
    pairs with pos score strictly greater and ties = equal-score
    pairs — all exact int64 counts, one final division + 6dp round.

    Scale shape: per-batch partial (score, pos/neg) counts -> one
    bucketed hash-aggregate (distinct-score-bounded table) -> the
    distributed :func:`~vietnamese_ocr_ray.functions.rank.prefix_sum`
    scan gives every score its count of strictly-smaller negatives ->
    three exact integer moments reduce to one row. No driver loops, no
    quadratic pair expansion."""
    from vietnamese_ocr_ray.functions.rank import prefix_sum

    ds = read_parquet_clean(
        f"{sf_dir}/events.parquet", columns=["event_type", "value"]
    )

    def partial(b: pa.Table) -> pa.Table:
        mv = np.asarray(_cents(b.column("value"), 1000), np.int64)
        pos = pc.equal(b.column("event_type"), pa.scalar(positive)).to_numpy(
            zero_copy_only=False
        )
        t = pa.table(
            {
                "mv": pa.array(mv),
                "np": pa.array(pos.astype(np.int64)),
                "nn": pa.array((~pos).astype(np.int64)),
            }
        )
        return t.group_by("mv").aggregate(
            [("np", "sum"), ("nn", "sum")]
        ).rename_columns(["mv", "np", "nn"])

    counts = hash_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["mv"],
        {"np": ("np", "sum"), "nn": ("nn", "sum")},
    )
    scanned = prefix_sum(counts, ["mv"], "nn", out_col="nn_less")

    def moments(b: pa.Table) -> pa.Table:
        np_ = np.asarray(b.column("np"), np.int64)
        nn = np.asarray(b.column("nn"), np.int64)
        less = np.asarray(b.column("nn_less"), np.int64)
        return pa.table(
            {
                "wins": pa.array([(np_ * less).sum()]),
                "ties": pa.array([(np_ * nn).sum()]),
                "p": pa.array([np_.sum()]),
                "n": pa.array([nn.sum()]),
            }
        )

    def finish(b: pa.Table) -> pa.Table:
        wins = int(pc.sum(b.column("wins")).as_py() or 0)
        ties = int(pc.sum(b.column("ties")).as_py() or 0)
        p = int(pc.sum(b.column("p")).as_py() or 0)
        n = int(pc.sum(b.column("n")).as_py() or 0)
        auc = (
            round(float(2 * wins + ties) / (2.0 * float(p) * float(n)), 6)
            if p and n
            else 0.5
        )
        return pa.table(
            {
                "n_pos": pa.array([p], pa.int64()),
                "n_neg": pa.array([n], pa.int64()),
                "auc": pa.array([auc], pa.float64()),
            }
        )

    return (
        scanned.map_batches(moments, batch_format="pyarrow")
        .repartition(1)
        .map_batches(finish, batch_format="pyarrow")
    )


def lorenz_deciles(sf_dir: str) -> rd.Dataset:
    """Lorenz-curve decile table of per-user value concentration: users
    ranked ascending by their exact milli-quantized value total, split
    into 10 equal-count bands (``rank*10 // n`` — no float quantile
    boundary), each band's share and cumulative share of total value —
    the concentration audit behind "top 10% of users drive X%".

    Scale shape: per-user sums ride one bucketed hash-aggregate;
    :func:`~vietnamese_ocr_ray.functions.rank.global_rank` assigns
    positions without collecting (user-table-sized sort); the decile
    reduce is 10 rows."""
    from vietnamese_ocr_ray.functions.rank import global_rank

    ds = read_parquet_clean(
        f"{sf_dir}/events.parquet", columns=["user_id", "value"]
    )

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "user_id": pc.cast(_chunk(b.column("user_id")), pa.int64()),
                "mv": _cents(b.column("value"), 1000),
            }
        )
        return t.group_by("user_id").aggregate([("mv", "sum")]).rename_columns(
            ["user_id", "mv"]
        )

    sums = hash_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["user_id"],
        {"mv": ("mv", "sum")},
    )
    ranked = global_rank(sums, ["mv", "user_id"])
    n = ranked.count()

    def decile(b: pa.Table) -> pa.Table:
        r = np.asarray(b.column("rank"), np.int64)
        mv = np.asarray(b.column("mv"), np.int64)
        t = pa.table(
            {
                "decile": pa.array(r * 10 // max(n, 1)),
                "n_users": pa.array(np.ones(r.shape[0], np.int64)),
                "dsum": pa.array(mv),
            }
        )
        return t.group_by("decile").aggregate(
            [("n_users", "sum"), ("dsum", "sum")]
        ).rename_columns(["decile", "n_users", "dsum"])

    def finish(b: pa.Table) -> pa.Table:
        g = (
            b.group_by("decile")
            .aggregate([("n_users", "sum"), ("dsum", "sum")])
            .rename_columns(["decile", "n_users", "dsum"])
            .sort_by("decile")
        )
        dsum = g.column("dsum").to_numpy(zero_copy_only=False).astype(np.int64)
        tot = float(dsum.sum())
        return pa.table(
            {
                "decile": pc.cast(g.column("decile"), pa.int64()),
                "n_users": pc.cast(g.column("n_users"), pa.int64()),
                "value_share": pa.array(
                    np.round(dsum.astype(np.float64) / tot, 6), pa.float64()
                ),
                "cum_share": pa.array(
                    np.round(np.cumsum(dsum).astype(np.float64) / tot, 6),
                    pa.float64(),
                ),
            }
        )

    return (
        ranked.map_batches(decile, batch_format="pyarrow")
        .repartition(1)
        .map_batches(finish, batch_format="pyarrow")
    )


def hill_tail_index(sf_dir: str) -> rd.Dataset:
    """Hill estimator of the value distribution's tail index over the
    top-decile exceedances: ``H = (1/k) * sum ln(x_(i) / x_(k+1))`` for
    the k = n//10 largest milli-quantized positive values — the
    heavy-tail audit behind "can I mean-aggregate this column or do I
    need winsorizing" (value_winsorized / value_mad are the companions).

    Determinism contract: the order statistic x_(k+1) comes from the
    exact global rank (value ties at the boundary contribute identical
    VALUES whichever rows the tiebreak picks); each log ratio is
    quantized to integer micro-nats (floor(x*1e6 + 0.5)) BEFORE the
    order-independent integer sum; one division + 6dp round at the end.

    Scale shape: one row-sized range sort (global_rank — order
    statistics need it), then two metadata-sized reads (threshold row,
    integer moment partials)."""
    from vietnamese_ocr_ray.functions.rank import global_rank

    ds = read_parquet_clean(
        f"{sf_dir}/events.parquet", columns=["event_id", "value"]
    )

    def mvs(b: pa.Table) -> pa.Table:
        mv = np.asarray(_cents(b.column("value"), 1000), np.int64)
        keep = mv > 0
        return pa.table(
            {
                "mv": pa.array(mv[keep]),
                "event_id": pc.filter(b.column("event_id"), pa.array(keep)),
            }
        )

    ranked = global_rank(
        ds.map_batches(mvs, batch_format="pyarrow"), ["mv", "event_id"]
    )
    n = ranked.count()
    k = n // 10
    thresh = ranked.filter(
        expr=f"rank == {n - k - 1}"
    ).to_pandas()["mv"].iloc[0]

    def qsum(b: pa.Table) -> pa.Table:
        r = np.asarray(b.column("rank"), np.int64)
        mv = np.asarray(b.column("mv"), np.int64)
        top = r >= n - k
        q = np.floor(
            np.log(mv[top].astype(np.float64) / float(thresh)) * 1e6 + 0.5
        ).astype(np.int64)
        return pa.table({"q": pa.array([q.sum()]), "cnt": pa.array([np.int64(top.sum())])})

    def finish(b: pa.Table) -> pa.Table:
        q = int(pc.sum(b.column("q")).as_py() or 0)
        cnt = int(pc.sum(b.column("cnt")).as_py() or 0)
        hill = round(float(q) / (float(cnt) * 1e6), 6) if cnt else 0.0
        return pa.table(
            {
                "k": pa.array([cnt], pa.int64()),
                "thresh_milli": pa.array([int(thresh)], pa.int64()),
                "hill": pa.array([hill], pa.float64()),
            }
        )

    return (
        ranked.map_batches(qsum, batch_format="pyarrow")
        .repartition(1)
        .map_batches(finish, batch_format="pyarrow")
    )


def datasheet_by_source(sf_dir: str, num_buckets: int = 32) -> rd.Dataset:
    """Per-source dataset card (Gebru et al. 2021 "datasheets" rollup):
    doc/token/char volumes, distinct-token vocabulary, language spread,
    mean doc length, and the exact-duplicate fraction — the one-page
    summary a curation run publishes next to each source it ships.

    All counts are exact integers; the two ratios are single float
    divisions rounded to 6 dp. Scale shape: three corpus passes, each
    shuffling far less than the corpus — (1) per-source scalar partials
    (sources x blocks rows), (2) batch-distinct (token, source) pairs
    into one bucketed count, (3) content-hash-bucketed text counts (the
    dedup_exact shuffle shape) where a text's global copy count decides
    dup membership inside its bucket, re-attributed to sources by the
    per-(hash, source) partial counts that rode along."""
    from vietnamese_ocr_ray.functions.dedup import content_hash64

    ds = read_parquet_clean(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text", "lang", "source", "n_chars"],
    )

    # pass 1: per-source scalars (docs, tokens, chars) + distinct langs
    def scalars(b: pa.Table) -> pa.Table:
        nt = pc.list_value_length(
            pc.split_pattern(b.column("text"), " ")
        ).cast(pa.int64())
        t = pa.table(
            {
                "source": b.column("source"),
                "n_docs": pa.array(np.ones(b.num_rows, np.int64)),
                "n_tokens": nt,
                "n_chars": b.column("n_chars").cast(pa.int64()),
            }
        )
        return (
            t.group_by("source")
            .aggregate(
                [("n_docs", "sum"), ("n_tokens", "sum"), ("n_chars", "sum")]
            )
            .rename_columns(["source", "n_docs", "n_tokens", "n_chars"])
        )

    per = hash_aggregate(
        ds.map_batches(scalars, batch_format="pyarrow"),
        ["source"],
        {
            "n_docs": ("n_docs", "sum"),
            "n_tokens": ("n_tokens", "sum"),
            "n_chars": ("n_chars", "sum"),
        },
        num_buckets=4,
    ).to_pandas()

    # distinct languages per source (tiny key space)
    langs = (
        hash_aggregate(
            ds.map_batches(
                lambda b: pa.table(
                    {"source": b.column("source"), "lang": b.column("lang")}
                )
                .group_by(["source", "lang"])
                .aggregate([]),
                batch_format="pyarrow",
            ),
            ["source", "lang"],
            {"c": ("lang", "count")},
            num_buckets=4,
        )
        .to_pandas()
        .groupby("source")
        .size()
    )

    # pass 2: distinct tokens per source
    def tok_pairs(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern(b.column("text"), " ")
        flat = pc.list_flatten(toks)
        nt = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        src = b.column("source").take(
            pa.array(np.repeat(np.arange(b.num_rows, dtype=np.int64), nt))
        )
        return (
            pa.table({"tok": flat, "source": src})
            .group_by(["tok", "source"])
            .aggregate([])
        )

    vocab = (
        hash_aggregate(
            ds.map_batches(tok_pairs, batch_format="pyarrow"),
            ["tok", "source"],
            {"c": ("tok", "count")},
            num_buckets=num_buckets,
        )
        .map_batches(
            lambda b: pa.table({"source": b.column("source")})
            .group_by("source")
            .aggregate([("source", "count")])
            .rename_columns(["source", "n"]),
            batch_format="pyarrow",
        )
        .to_pandas()
        .groupby("source")["n"]
        .sum()
    )

    # pass 3: exact-dup docs per source (content-hash bucket shuffle)
    def hash_rows(b: pa.Table) -> pa.Table:
        h = content_hash64(b.column("text")).astype(np.int64)
        t = (
            pa.table({"h": pa.array(h), "source": b.column("source")})
            .group_by(["h", "source"])
            .aggregate([("h", "count")])
            .rename_columns(["h", "source", "c"])
        )
        hh = np.asarray(t.column("h"), np.int64)
        return t.append_column(
            "_bucket",
            pa.array(
                (hh.astype(np.uint64) % np.uint64(num_buckets)).astype(
                    np.int32
                )
            ),
        )

    def bucket_dups(g: pd.DataFrame) -> pa.Table:
        tot = g.groupby("h")["c"].transform("sum")
        dup = g[tot >= 2]
        out = (
            dup.groupby("source", as_index=False)["c"]
            .sum()
            .rename(columns={"c": "n_dup"})
        )
        # explicit cast: a bucket with no duplicate hashes yields an
        # empty frame whose object column would infer pa.null()
        return (
            pa.Table.from_pandas(out, preserve_index=False)
            .replace_schema_metadata(None)
            .cast(pa.schema([("source", pa.string()), ("n_dup", pa.int64())]))
        )

    dups = (
        ds.map_batches(hash_rows, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(
            lambda g: bucket_dups(g.drop(columns=["_bucket"])),
            batch_format="pandas",
        )
        .to_pandas()
    )
    dup_map = (
        dups.groupby("source")["n_dup"].sum().to_dict()
        if len(dups) and "source" in dups.columns
        else {}
    )

    per = per.sort_values("source").reset_index(drop=True)
    n_docs = per["n_docs"].to_numpy(np.int64)
    n_tokens = per["n_tokens"].to_numpy(np.int64)
    n_dup = per["source"].map(dup_map).fillna(0).to_numpy(np.int64)
    return rd.from_arrow(
        pa.table(
            {
                "source": pa.array(per["source"].to_numpy(), pa.string()),
                "n_docs": pa.array(n_docs),
                "n_tokens": pa.array(n_tokens),
                "n_chars": pa.array(per["n_chars"].to_numpy(np.int64)),
                "n_distinct_tokens": pa.array(
                    per["source"].map(vocab.to_dict()).to_numpy(np.int64)
                ),
                "n_langs": pa.array(
                    per["source"].map(langs.to_dict()).to_numpy(np.int64)
                ),
                "n_exact_dup_docs": pa.array(n_dup),
                "avg_tokens": pa.array(
                    np.round(n_tokens / n_docs.astype(np.float64), 6),
                    pa.float64(),
                ),
                "dup_frac": pa.array(
                    np.round(n_dup / n_docs.astype(np.float64), 6),
                    pa.float64(),
                ),
            }
        )
    )


def time_split_leakage(sf_dir: str, num_buckets: int = 32) -> rd.Dataset:
    """Temporal split-leakage audit: split events at the midpoint of
    the observed time range (train = before, test = at/after) and
    count users present on BOTH sides — the entity-leakage check a
    time-based train/eval split must publish (a user in both halves
    leaks behavioral signal across the cut).

    Exactness: the cutoff is integer microseconds ((min+max) // 2 of
    epoch-us), side membership is an integer compare, and the three
    user counts come from ONE bucketed distinct-(user, side) aggregate
    — the leak fraction is the only float, one rounded division.

    Scale shape: one pruned min/max pass, then one pass emitting
    batch-distinct (user_id, side) pairs into a user-bucketed count;
    per-user rows collapse to three scalars inside the buckets, so the
    driver sees num_buckets partial rows."""
    from ray.data.aggregate import Max, Min, Sum

    ds = read_parquet_clean(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts"]
    )

    def bounds(b: pa.Table) -> pa.Table:
        u = pc.cast(b.column("ts"), pa.int64())
        return pa.table(
            {
                "mn": pa.array([pc.min(u).as_py()], pa.int64()),
                "mx": pa.array([pc.max(u).as_py()], pa.int64()),
            }
        )

    bb = ds.map_batches(bounds, batch_format="pyarrow").aggregate(
        Min("mn", alias_name="mn"), Max("mx", alias_name="mx")
    )
    cutoff = (int(bb["mn"]) + int(bb["mx"])) // 2

    def sides(b: pa.Table) -> pa.Table:
        u = np.asarray(pc.cast(b.column("ts"), pa.int64()), np.int64)
        t = pa.table(
            {
                "user_id": b.column("user_id"),
                "side": pa.array((u >= cutoff).astype(np.int8)),
            }
        ).group_by(["user_id", "side"]).aggregate([])
        uid = np.asarray(t.column("user_id"), np.int64)
        return t.append_column(
            "_bucket",
            pa.array(
                (uid.astype(np.uint64) % np.uint64(num_buckets)).astype(
                    np.int32
                )
            ),
        )

    def bucket_counts(g: pd.DataFrame) -> pa.Table:
        d = g.drop_duplicates(["user_id", "side"])
        per = d.groupby("user_id")["side"].agg(["count", "min"])
        both = int((per["count"] == 2).sum())
        train = int(((per["count"] == 2) | (per["min"] == 0)).sum())
        test = int((per["count"] == 2).sum() + (per["min"] == 1).sum())
        return pa.table(
            {
                "train": pa.array([train], pa.int64()),
                "test": pa.array([test], pa.int64()),
                "both": pa.array([both], pa.int64()),
            }
        )

    agg = (
        ds.map_batches(sides, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(
            lambda g: bucket_counts(g.drop(columns=["_bucket"])),
            batch_format="pandas",
        )
        .aggregate(
            Sum("train", alias_name="train"),
            Sum("test", alias_name="test"),
            Sum("both", alias_name="both"),
        )
    )
    train, test, both = int(agg["train"]), int(agg["test"]), int(agg["both"])
    leak = round(float(both) / float(min(train, test)), 6) if min(train, test) else 0.0
    return rd.from_arrow(
        pa.table(
            {
                "cutoff_us": pa.array([cutoff], pa.int64()),
                "n_train_users": pa.array([train], pa.int64()),
                "n_test_users": pa.array([test], pa.int64()),
                "n_leaked_users": pa.array([both], pa.int64()),
                "leak_frac": pa.array([leak], pa.float64()),
            }
        )
    )


def benford_audit(sf_dir: str) -> rd.Dataset:
    """Benford's-law first-digit audit of event values (the classic
    fabricated-data forensic): observed counts of the first
    significant digit of the milli-unit integer value vs the Benford
    expectation log10(1 + 1/d), plus the chi-square statistic.

    Exactness: digits come from the exact milli int (zero values are
    excluded — they have no leading digit); counts are integers; the
    expectation and chi-square accumulate in ASCENDING digit order as
    one fixed float expression per digit.

    Scale shape: one pruned pass of per-batch 9-bin partial counts,
    one tiny aggregate; the chi-square runs on 9 numbers."""
    from ray.data.aggregate import Sum

    ds = read_parquet_clean(f"{sf_dir}/events.parquet", columns=["value"])

    def partial(batch: pa.Table) -> pa.Table:
        vm_arr = pc.abs(_cents(batch.column("value"), 1000))
        vm_arr = vm_arr.filter(pc.greater(vm_arr, pa.scalar(0)))
        # first significant digit = first character of the decimal
        # string — exact, no float magnitude arithmetic
        digit = np.asarray(
            pc.cast(
                pc.utf8_slice_codeunits(
                    pc.cast(vm_arr, pa.string()), 0, 1
                ),
                pa.int64(),
            ),
            np.int64,
        )
        cnt = np.bincount(digit, minlength=10)[1:]
        return pa.table(
            {
                "digit": pa.array(np.arange(1, 10, dtype=np.int64)),
                "n": pa.array(cnt.astype(np.int64)),
            }
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("digit")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
        .sort_values("digit")
        .reset_index(drop=True)
    )
    n = agg["n"].to_numpy(np.int64)
    total = int(n.sum())
    chi2 = 0.0
    shares = []
    for d in range(1, 10):  # ascending digit order: fixed float order
        exp = float(total) * np.log10(1.0 + 1.0 / float(d))
        obs = float(int(n[d - 1]))
        chi2 = chi2 + (obs - exp) * (obs - exp) / exp
        shares.append(round(np.log10(1.0 + 1.0 / float(d)), 6))
    return rd.from_arrow(
        pa.table(
            {
                "digit": pa.array(range(1, 10), pa.int64()),
                "n": pa.array(n),
                "observed_share": pa.array(
                    np.round(n / float(total), 6), pa.float64()
                ),
                "benford_share": pa.array(shares, pa.float64()),
                "chi2": pa.array(
                    np.full(9, round(chi2, 6)), pa.float64()
                ),
            }
        )
    )


def column_entropy(sf_dir: str) -> rd.Dataset:
    """Categorical-column profile across the warehouse: for each of
    documents.lang, documents.source, events.event_type — row count,
    distinct count, exact Shannon entropy (nats) and the normalized
    entropy / ln(n_distinct) (1.0 = uniform; near 0 = one value
    dominates). The schema-profiling pass a pipeline runs on a new
    data drop before choosing partition keys.

    Determinism: each distinct value's c*ln(c) quantizes to integer
    NANO-nats (the kl_source_divergence contract) so the sum is
    order-independent; the entropy is then one fixed float expression.

    Scale shape: one bucketed count aggregate per column (key spaces
    are the categorical vocabularies); the entropy math runs on
    |distinct| rows on the driver."""
    from vietnamese_ocr_ray.functions.agg import hash_aggregate

    specs = [
        ("documents", "lang"),
        ("documents", "source"),
        ("events", "event_type"),
    ]
    rows = []
    for table, col in specs:
        counts = (
            hash_aggregate(
                read_parquet_clean(
                    f"{sf_dir}/{table}.parquet", columns=[col]
                ),
                [col],
                {"n": (col, "count")},
                num_buckets=4,
            )
            .to_pandas()
            .sort_values(col)
        )
        c = counts["n"].to_numpy(np.int64)
        n = int(c.sum())
        k = len(c)
        q = np.round(
            c.astype(np.float64) * np.log(c.astype(np.float64)) * 1e9
        ).astype(np.int64)
        ent_raw = np.log(float(n)) - (float(int(q.sum())) / 1e9) / n
        ent = round(ent_raw, 6)
        norm = round(ent_raw / np.log(float(k)), 6) if k > 1 else 0.0
        rows.append((f"{table}.{col}", n, k, ent, norm))
    return rd.from_arrow(
        pa.table(
            {
                "column": pa.array([r[0] for r in rows], pa.string()),
                "n_rows": pa.array([r[1] for r in rows], pa.int64()),
                "n_distinct": pa.array([r[2] for r in rows], pa.int64()),
                "entropy_nats": pa.array(
                    [r[3] for r in rows], pa.float64()
                ),
                "normalized": pa.array([r[4] for r in rows], pa.float64()),
            }
        )
    )


def ks_test_value(
    sf_dir: str, type_a: str = "click", type_b: str = "purchase"
) -> rd.Dataset:
    """Two-sample Kolmogorov-Smirnov distance between the value
    distributions of two event types — the distribution-drift test
    (PSI's nonparametric sibling; value_psi bins, KS doesn't). Reports
    D = max |F_a - F_b| over observed values, the value where it is
    attained (smallest on ties), and the asymptotic critical scale
    sqrt((n_a + n_b) / (n_a * n_b)).

    Exactness: values quantize to exact milli ints, so the ECDFs are
    exact rationals evaluated with one fixed float expression per
    distinct value; the argmax ties to the smallest value. The
    per-value count table is VALUE-DOMAIN-bounded (milli units of a
    bounded metric), not row-bounded — the driver finish is O(domain).

    Scale shape: one pruned two-type scan of per-batch (value, side)
    count partials, one bucketed aggregate, domain-sized driver scan."""
    from vietnamese_ocr_ray.functions.agg import hash_aggregate

    ds = read_parquet_clean(
        f"{sf_dir}/events.parquet",
        columns=["event_type", "value"],
        filter=(pc.field("event_type") == type_a)
        | (pc.field("event_type") == type_b),
    )

    def partial(batch: pa.Table) -> pa.Table:
        vm = np.asarray(_cents(batch.column("value"), 1000), np.int64)
        is_a = pc.equal(
            batch.column("event_type"), pa.scalar(type_a)
        ).to_numpy(zero_copy_only=False)
        t = pa.table(
            {
                "vm": pa.array(vm),
                "ca": pa.array(is_a.astype(np.int64)),
                "cb": pa.array((~is_a).astype(np.int64)),
            }
        )
        return t.group_by("vm").aggregate(
            [("ca", "sum"), ("cb", "sum")]
        ).rename_columns(["vm", "ca", "cb"])

    hist = (
        hash_aggregate(
            ds.map_batches(partial, batch_format="pyarrow"),
            ["vm"],
            {"ca": ("ca", "sum"), "cb": ("cb", "sum")},
        )
        .to_pandas()
        .sort_values("vm")
        .reset_index(drop=True)
    )
    na = int(hist["ca"].sum())
    nb = int(hist["cb"].sum())
    fa = np.cumsum(hist["ca"].to_numpy(np.int64)).astype(np.float64) / float(na)
    fb = np.cumsum(hist["cb"].to_numpy(np.int64)).astype(np.float64) / float(nb)
    d = np.abs(fa - fb)
    i = int(np.lexsort((hist["vm"].to_numpy(np.int64), -d))[0])
    crit = np.sqrt((na + nb) / (float(na) * float(nb)))
    return rd.from_arrow(
        pa.table(
            {
                "n_a": pa.array([na], pa.int64()),
                "n_b": pa.array([nb], pa.int64()),
                "ks_d": pa.array([round(float(d[i]), 6)], pa.float64()),
                "at_value": pa.array(
                    [round(int(hist["vm"][i]) / 1000.0, 6)], pa.float64()
                ),
                "crit_scale": pa.array(
                    [round(float(crit), 6)], pa.float64()
                ),
            }
        )
    )


def ks_source_length(sf_dir: str) -> rd.Dataset:
    """Per-source distribution-shift audit: the Kolmogorov-Smirnov
    distance between each source's doc-length (n_chars) distribution
    and the REST of the corpus — sources whose length profile deviates
    hardest are the first place curation bugs (truncation, boilerplate
    injection) show up. One row per source, D with smallest-length
    argmax tiebreak.

    Exactness: n_chars is already an exact int; per-(length, source)
    counts ride one bucketed aggregate whose key space is bounded by
    the LENGTH DOMAIN x sources, not rows; each source's ECDF pair is
    a fixed float expression on the driver."""
    from vietnamese_ocr_ray.functions.agg import hash_aggregate

    ds = read_parquet_clean(
        f"{sf_dir}/documents.parquet", columns=["source", "n_chars"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "source": batch.column("source"),
                "len": pc.cast(_chunk(batch.column("n_chars")), pa.int64()),
            }
        )
        return t.group_by(["source", "len"]).aggregate(
            [("len", "count")]
        ).rename_columns(["source", "len", "n"])

    counts = (
        hash_aggregate(
            ds.map_batches(partial, batch_format="pyarrow"),
            ["source", "len"],
            {"n": ("n", "sum")},
        )
        .to_pandas()
        .sort_values(["source", "len"])
    )
    total_by_len = counts.groupby("len")["n"].sum()
    lengths = np.sort(total_by_len.index.to_numpy(np.int64))
    tot = total_by_len.loc[lengths].to_numpy(np.int64)
    n_all = int(tot.sum())
    rows = []
    for src, g in counts.groupby("source", sort=True):
        cs = np.zeros(len(lengths), np.int64)
        idx = np.searchsorted(lengths, g["len"].to_numpy(np.int64))
        cs[idx] = g["n"].to_numpy(np.int64)
        n_s = int(cs.sum())
        rest = tot - cs
        n_r = n_all - n_s
        fs = np.cumsum(cs).astype(np.float64) / float(n_s)
        fr = np.cumsum(rest).astype(np.float64) / float(n_r)
        d = np.abs(fs - fr)
        i = int(np.lexsort((lengths, -d))[0])
        rows.append(
            (src, n_s, round(float(d[i]), 6), int(lengths[i]))
        )
    return rd.from_arrow(
        pa.table(
            {
                "source": pa.array([r[0] for r in rows], pa.string()),
                "n_docs": pa.array([r[1] for r in rows], pa.int64()),
                "ks_d": pa.array([r[2] for r in rows], pa.float64()),
                "at_len": pa.array([r[3] for r in rows], pa.int64()),
            }
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q18 shape: large-volume orders (pre-aggregate -> tiny broadcast)
# ---------------------------------------------------------------------------
def large_volume_orders(
    sf_dir: str, min_qty: int = 300, num_buckets: int = 32
) -> rd.Dataset:
    """Orders whose total lineitem quantity exceeds ``min_qty``, with
    the buyer's name attached (TPC-H Q18 shape).

    Scale shape: the lineitem scan pre-reduces per batch (one row per
    orderkey per batch), the per-order totals ride ONE hash_aggregate
    bucket shuffle, and only the QUALIFYING set — selectivity-bounded
    by the threshold (TPC-H Q18 qualifies ~0.001% of orders) — is
    broadcast via ray.put to filter the orders and customer streams.
    Neither big table is ever collected; the driver touches only the
    qualifying rows. Quantities are whole numbers, summed as exact
    int64 so the qualifying set is bit-stable under any partitioning.
    """
    line = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_quantity"]
    )

    def qty_partial(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "l_orderkey": pc.cast(_chunk(b.column("l_orderkey")), pa.int64()),
                "q": _cents(b.column("l_quantity"), 1),
            }
        )
        return t.group_by("l_orderkey").aggregate([("q", "sum")]).rename_columns(
            ["l_orderkey", "q"]
        )

    totals = hash_aggregate(
        line.map_batches(qty_partial, batch_format="pyarrow"),
        ["l_orderkey"],
        {"q": ("q", "sum")},
        num_buckets=num_buckets,
    ).map_batches(
        lambda b: b.filter(pc.greater(b.column("q"), min_qty)),
        batch_format="pyarrow",
    )

    # qualifying set: threshold-bounded, tiny by construction — safe to
    # pin once in the object store and look up per batch
    qual = totals.to_pandas()
    qkeys = qual["l_orderkey"].to_numpy(np.int64)
    order_idx = np.argsort(qkeys)
    qkeys = qkeys[order_idx]
    qsums = qual["q"].to_numpy(np.int64)[order_idx]
    handle = ray.put((qkeys, qsums))

    orders = read_parquet_clean(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"],
    )

    def pick_orders(b: pa.Table) -> pa.Table:
        keys, sums = ray.get(handle)
        ok = np.asarray(pc.cast(_chunk(b.column("o_orderkey")), pa.int64()))
        pos = np.searchsorted(keys, ok)
        pos_c = np.minimum(pos, len(keys) - 1) if len(keys) else pos
        mask = (len(keys) > 0) & (pos < len(keys)) & (keys[pos_c] == ok)
        t = b.filter(pa.array(mask))
        mk = np.asarray(pc.cast(_chunk(t.column("o_orderkey")), pa.int64()))
        sq = sums[np.searchsorted(keys, mk)] if len(mk) else np.zeros(0, np.int64)
        return pa.table(
            {
                "o_orderkey": pc.cast(_chunk(t.column("o_orderkey")), pa.int64()),
                "o_custkey": pc.cast(_chunk(t.column("o_custkey")), pa.int64()),
                "o_orderdate": _chunk(t.column("o_orderdate")),
                "o_totalprice": _chunk(t.column("o_totalprice")),
                # DOUBLE to mirror the oracle's sum(l_quantity)
                "sum_qty": pa.array(sq.astype(np.float64)),
            }
        )

    picked = orders.map_batches(pick_orders, batch_format="pyarrow").to_pandas()

    # buyer names: stream customer, keep only the qualifying custkeys
    ckeys = np.unique(picked["o_custkey"].to_numpy(np.int64))
    chandle = ray.put(ckeys)
    cust = read_parquet_clean(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name"]
    )

    def pick_cust(b: pa.Table) -> pa.Table:
        keys = ray.get(chandle)
        ck = np.asarray(pc.cast(_chunk(b.column("c_custkey")), pa.int64()))
        pos = np.searchsorted(keys, ck)
        pos_c = np.minimum(pos, len(keys) - 1) if len(keys) else pos
        mask = (len(keys) > 0) & (pos < len(keys)) & (keys[pos_c] == ck)
        return b.filter(pa.array(mask))

    names = cust.map_batches(pick_cust, batch_format="pyarrow").to_pandas()
    out = picked.merge(
        names, left_on="o_custkey", right_on="c_custkey", how="left"
    ).sort_values(["o_totalprice", "o_orderkey"], ascending=[False, True])
    return rd.from_arrow(
        pa.table(
            {
                "c_name": pa.Array.from_pandas(out["c_name"], type=pa.string()),
                "o_custkey": pa.array(out["o_custkey"].to_numpy(np.int64)),
                "o_orderkey": pa.array(out["o_orderkey"].to_numpy(np.int64)),
                "o_orderdate": pa.Array.from_pandas(
                    out["o_orderdate"], type=pa.timestamp("us")
                ),
                "o_totalprice": pa.array(out["o_totalprice"].to_numpy(np.float64)),
                "sum_qty": pa.array(out["sum_qty"].to_numpy(np.float64)),
            }
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q17 shape: small-quantity revenue (agg -> cogroup join back)
# ---------------------------------------------------------------------------
def small_qty_part_revenue(sf_dir: str, num_buckets: int = 32) -> rd.Dataset:
    """Average yearly revenue lost if orders below 20% of a part's
    average quantity were no longer taken (TPC-H Q17 shape).

    The per-part average is NOT broadcast (parts are a big dimension at
    scale): the per-part (count, sum_qty) aggregate and the lineitem
    rows meet in ONE partkey-bucket cogroup, and the below-threshold
    test runs as exact integer arithmetic — ``5 * qty * cnt < sum_qty``
    is ``qty < 0.2 * avg`` without ever forming the float average, so
    Ray and the SQL oracle agree bit-for-bit. Revenue accumulates in
    integer cents; one division at the end.
    """
    line = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_quantity", "l_extendedprice"],
    )

    def agg_partial(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "l_partkey": pc.cast(_chunk(b.column("l_partkey")), pa.int64()),
                "sq": _cents(b.column("l_quantity"), 1),
                "cnt": pa.array(np.ones(b.num_rows, np.int64)),
            }
        )
        return t.group_by("l_partkey").aggregate(
            [("sq", "sum"), ("cnt", "sum")]
        ).rename_columns(["l_partkey", "sq", "cnt"])

    part_stats = hash_aggregate(
        line.map_batches(agg_partial, batch_format="pyarrow"),
        ["l_partkey"],
        {"sq": ("sq", "sum"), "cnt": ("cnt", "sum")},
        num_buckets=num_buckets,
    )

    def tag_stats(b: pa.Table) -> pa.Table:
        key = pc.cast(_chunk(b.column("l_partkey")), pa.int64())
        return pa.table(
            {
                "key": key,
                "sq": pc.cast(_chunk(b.column("sq")), pa.int64()),
                "cnt": pc.cast(_chunk(b.column("cnt")), pa.int64()),
                "_side": pa.array(np.zeros(b.num_rows, np.int8)),
                "_bucket": pa.array(key_bucket(key, num_buckets).astype(np.int32)),
            }
        )

    def tag_line(b: pa.Table) -> pa.Table:
        key = pc.cast(_chunk(b.column("l_partkey")), pa.int64())
        return pa.table(
            {
                "key": key,
                "sq": _cents(b.column("l_quantity"), 1),  # qty rides in sq
                "cnt": _cents(b.column("l_extendedprice"), 100),  # cents in cnt
                "_side": pa.array(np.ones(b.num_rows, np.int8)),
                "_bucket": pa.array(key_bucket(key, num_buckets).astype(np.int32)),
            }
        )

    def bucket_rev(g: pd.DataFrame) -> pa.Table:
        stats = g[g["_side"] == 0]
        rows = g[g["_side"] == 1]
        merged = rows.merge(
            stats[["key", "sq", "cnt"]].rename(
                columns={"sq": "part_sq", "cnt": "part_cnt"}
            ),
            on="key",
            how="inner",
        )
        qty = merged["sq"].to_numpy(np.int64)
        price_c = merged["cnt"].to_numpy(np.int64)
        keep = 5 * qty * merged["part_cnt"].to_numpy(np.int64) < merged[
            "part_sq"
        ].to_numpy(np.int64)
        return pa.table({"rev_c": pa.array([int(price_c[keep].sum())], pa.int64())})

    tagged = (
        part_stats.map_batches(tag_stats, batch_format="pyarrow")
        .union(line.map_batches(tag_line, batch_format="pyarrow"))
        .groupby("_bucket")
        .map_groups(
            lambda g: bucket_rev(g.drop(columns=["_bucket"])),
            batch_format="pandas",
        )
    )
    total = tagged.aggregate(Sum("rev_c", alias_name="s"))["s"]
    return rd.from_arrow(
        pa.table({"avg_yearly": pa.array([float(total) / 100.0 / 7.0], pa.float64())})
    )


# ---------------------------------------------------------------------------
# Anti-join: dormant customers (no orders since a cutoff), per segment
# ---------------------------------------------------------------------------
def dormant_customers(
    sf_dir: str, since: str = "2000-01-01", num_buckets: int = 32
) -> rd.Dataset:
    """Per-market-segment count + total balance of customers with NO
    order on/after ``since`` — the NOT EXISTS / anti-join shape.

    Scale shape: recent orders pre-reduce to per-batch DISTINCT
    custkeys, then both sides meet in ONE custkey-bucket cogroup where
    the anti-join is a vectorized np.isin per bucket — no broadcast of
    either side, no driver materialization of the big tables. Balances
    accumulate in integer cents.
    """
    cut = np.datetime64(since, "us")
    orders = read_parquet_clean(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderdate"],
        filter=pc.field("o_orderdate") >= cut,
    )

    def tag_active(b: pa.Table) -> pa.Table:
        key = np.unique(np.asarray(pc.cast(_chunk(b.column("o_custkey")), pa.int64())))
        n = len(key)
        return pa.table(
            {
                "key": pa.array(key),
                "c_mktsegment": pa.nulls(n, pa.string()),
                "bal_c": pa.nulls(n, pa.int64()),
                "_side": pa.array(np.ones(n, np.int8)),
                "_bucket": pa.array(
                    key_bucket(pa.array(key), num_buckets).astype(np.int32)
                ),
            }
        )

    cust = read_parquet_clean(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_mktsegment", "c_acctbal"],
    )

    def tag_cust(b: pa.Table) -> pa.Table:
        key = pc.cast(_chunk(b.column("c_custkey")), pa.int64())
        return pa.table(
            {
                "key": key,
                "c_mktsegment": _chunk(b.column("c_mktsegment")),
                "bal_c": _cents(b.column("c_acctbal"), 100),
                "_side": pa.array(np.zeros(b.num_rows, np.int8)),
                "_bucket": pa.array(key_bucket(key, num_buckets).astype(np.int32)),
            }
        )

    def bucket_anti(g: pd.DataFrame) -> pa.Table:
        active = g.loc[g["_side"] == 1, "key"].to_numpy(np.int64)
        custs = g[g["_side"] == 0]
        mask = ~np.isin(custs["key"].to_numpy(np.int64), active)
        kept = custs[mask]
        if not len(kept):
            return pa.table(
                {
                    "c_mktsegment": pa.array([], pa.string()),
                    "n_dormant": pa.array([], pa.int64()),
                    "bal_c": pa.array([], pa.int64()),
                }
            )
        agg = kept.groupby("c_mktsegment", as_index=False).agg(
            n_dormant=("key", "size"), bal_c=("bal_c", "sum")
        )
        return pa.table(
            {
                "c_mktsegment": pa.Array.from_pandas(
                    agg["c_mktsegment"], type=pa.string()
                ),
                "n_dormant": pa.array(agg["n_dormant"].to_numpy(np.int64)),
                "bal_c": pa.array(agg["bal_c"].to_numpy(np.int64)),
            }
        )

    per_bucket = (
        cust.map_batches(tag_cust, batch_format="pyarrow")
        .union(orders.map_batches(tag_active, batch_format="pyarrow"))
        .groupby("_bucket")
        .map_groups(
            lambda g: bucket_anti(g.drop(columns=["_bucket"])),
            batch_format="pandas",
        )
    )
    final = per_bucket.groupby("c_mktsegment").aggregate(
        Sum("n_dormant", alias_name="n_dormant"),
        Sum("bal_c", alias_name="bal_c"),
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "c_mktsegment": t.column("c_mktsegment"),
                "n_dormant": pc.cast(t.column("n_dormant"), pa.int64()),
                "total_acctbal": pc.divide(
                    pc.cast(pc.cast(t.column("bal_c"), pa.int64()), pa.float64()),
                    pa.scalar(100.0),
                ),
            }
        )

    return final.map_batches(finish, batch_format="pyarrow").sort("c_mktsegment")


def min_rev_supplier(sf_dir: str, num_buckets: int = 32) -> rd.Dataset:
    """For every part, the supplier(s) with the MINIMUM total supply
    revenue over all its line items (TPC-H Q2's correlated-min join
    shape, re-keyed to the tables this corpus ships: lineitem is the
    part<->supplier fact). Ties keep every minimal supplier.

    Shape: per-batch partial sums per (partkey, suppkey) -> ONE
    partkey-bucket shuffle; inside a bucket every supplier of a part is
    co-located, so the final (part, supp) sums, the per-part min, and
    the tie filter are one vectorized pandas pass — the correlated
    subquery never re-scans. Supplier name / nation attach from
    genuinely-small broadcast luts (suppkey-cardinality, 2 columns).
    Revenue accumulates in exact integer 1e-4 units; one division at
    the end keeps Ray and the SQL oracle bit-identical.

    Reference anchor: generalizes the reference's dict min-tracking
    (src/utils/statistic.py:8-14 best-metric keep) to a grouped
    correlated min over a fact table.
    """
    supp = pd.read_parquet(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_name", "s_nationkey"]
    )
    nation = pd.read_parquet(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    )
    name_lut = dict(zip(supp["s_suppkey"].to_numpy(np.int64), supp["s_name"]))
    nk = dict(
        zip(
            supp["s_suppkey"].to_numpy(np.int64),
            supp["s_nationkey"].to_numpy(np.int64),
        )
    )
    nname = dict(zip(nation["n_nationkey"].to_numpy(np.int64), nation["n_name"]))
    supp_handle = ray.put((name_lut, nk, nname))

    line = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )

    def partial(b: pa.Table) -> pa.Table:
        price_c = _cents(b.column("l_extendedprice"), 100)
        disc = _cents(b.column("l_discount"), 100)
        rev = pc.multiply(price_c, pc.subtract(pa.scalar(100, pa.int64()), disc))
        key = pc.cast(_chunk(b.column("l_partkey")), pa.int64())
        t = pa.table(
            {
                "l_partkey": key,
                "l_suppkey": pc.cast(_chunk(b.column("l_suppkey")), pa.int64()),
                "rev": rev,
            }
        )
        g = t.group_by(["l_partkey", "l_suppkey"]).aggregate(
            [("rev", "sum")]
        ).rename_columns(["l_partkey", "l_suppkey", "rev"])
        return g.append_column(
            "_bucket",
            pa.array(
                key_bucket(g.column("l_partkey"), num_buckets).astype(np.int32)
            ),
        )

    def min_pick(g: pd.DataFrame) -> pa.Table:
        names, nks, nnames = ray.get(supp_handle)
        agg = g.groupby(["l_partkey", "l_suppkey"], as_index=False).agg(
            rev=("rev", "sum")
        )
        mn = agg.groupby("l_partkey")["rev"].transform("min")
        win = agg[agg["rev"] == mn]
        skeys = win["l_suppkey"]
        return pa.table(
            {
                "p_partkey": pa.Array.from_pandas(win["l_partkey"]),
                "s_suppkey": pa.Array.from_pandas(skeys),
                "s_name": pa.Array.from_pandas(skeys.map(names)).cast(pa.string()),
                "n_name": pa.Array.from_pandas(
                    skeys.map(nks).map(nnames)
                ).cast(pa.string()),
                "supply_rev": pc.divide(
                    pc.cast(pa.Array.from_pandas(win["rev"]), pa.float64()),
                    pa.scalar(10000.0),
                ),
            }
        )

    return (
        line.map_batches(partial, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(min_pick, batch_format="pandas")
    )


def isotonic_hourly(sf_dir: str) -> pa.Table:
    """Isotonic (monotone non-decreasing) regression of mean event
    value on hour-of-day — PAVA, the pool-adjacent-violators algorithm
    (Barlow 1972; the probability-calibration / monotone-feature-fit
    step of an ML data pipeline).

    Distributed shape: ONE per-batch (hour, sum_milli, count) partial
    -> a 24-row groupby; PAVA runs on the driver over that
    constant-sized table (the engine's standard driver-side argmin
    budget). Exactness: pool means never materialize as floats —
    violations compare via integer cross-multiplication
    (s_i * c_j > s_j * c_i, unbounded Python ints) and the emitted fit
    is the exact integer floor ``fit_micro = 1000 * pool_sum //
    pool_cnt``. The isotonic fit is the unique projection onto the
    monotone cone, so the SQL oracle's different-but-convergent merge
    ORDER (leftmost violator per unrolled round) reaches bit-identical
    per-hour values.
    """
    from vietnamese_ocr_ray.sources.storage import read_parquet_clean

    ds = read_parquet_clean(f"{sf_dir}/events.parquet", columns=["ts", "value"])

    def partial(b: pa.Table) -> pa.Table:
        ts = b.column("ts").to_numpy(zero_copy_only=False).astype("datetime64[us]")
        hour = (ts.astype(np.int64) // 3_600_000_000) % 24
        v = _cents(b.column("value"), 1000).to_numpy(zero_copy_only=False)
        t = pa.table(
            {
                "hour": pa.array(hour),
                "s": pa.array(v),
                "c": pa.array(np.ones(len(hour), np.int64)),
            }
        )
        g = t.group_by("hour").aggregate([("s", "sum"), ("c", "sum")])
        return g.rename_columns(["hour", "s", "c"])

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("hour")
        .aggregate(Sum("s", alias_name="s"), Sum("c", alias_name="c"))
        .to_pandas()
        .sort_values("hour")
    )
    hours = agg["hour"].to_numpy(np.int64)
    sums = [int(x) for x in agg["s"]]
    cnts = [int(x) for x in agg["c"]]

    # classic PAVA stack: pools of (sum, cnt, n_hours); merge while the
    # top-of-stack mean exceeds the incoming pool's mean (exact
    # cross-multiplied comparison)
    pools: list[list[int]] = []
    for s, c in zip(sums, cnts):
        cur = [s, c, 1]
        while pools and pools[-1][0] * cur[1] > cur[0] * pools[-1][1]:
            top = pools.pop()
            cur = [top[0] + cur[0], top[1] + cur[1], top[2] + cur[2]]
        pools.append(cur)
    fit = np.empty(len(hours), np.int64)
    i = 0
    for s, c, n in pools:
        fit[i : i + n] = 1000 * s // c
        i += n

    return pa.table(
        {
            "hour": pa.array(hours),
            "n_events": pa.array(np.array(cnts, np.int64)),
            "sum_milli": pa.array(np.array(sums, np.int64)),
            "fit_micro": pa.array(fit),
        }
    )


def conformal_threshold(sf_dir: str, alpha_ppm: int = 100_000) -> rd.Dataset:
    """Split-conformal calibration threshold per event_type (Vovk;
    Angelopoulos & Bates 2021 eq. 1): the ceil((n+1)(1-alpha))-th
    smallest calibration score — the exact order statistic that makes
    the conformal set have >= 1-alpha coverage. This is the
    calibration step of an ML-with-guarantees data pipeline, and an
    exact DISTRIBUTED SELECTION: one global range sort by
    (event_type, value, event_id) (the value_ntile machinery), then
    each block keeps only the row whose global in-partition rank IS
    its partition's conformal index — no driver materialization of
    anything but the blocks-count table.

    Exactness: ``k = ceil((1 - alpha) * (n + 1))`` is computed as the
    pure integer ``((1e6 - alpha_ppm) * (n + 1) + 999999) // 1e6``
    (capped at n), so Ray and SQL pick the identical row; the emitted
    threshold is that row's raw double."""
    import ray

    refs, offsets, totals = _sorted_event_blocks(sf_dir)
    scale = 1_000_000
    keep_ppm = scale - alpha_ppm

    @ray.remote
    def pick(t: pa.Table, start: dict, totals: dict) -> pa.Table:
        rank, n = _rank_blocks(t, start, totals)
        k = np.minimum((keep_ppm * (n + 1) + scale - 1) // scale, n)
        sel = rank == (k - 1)
        sub = t.filter(pa.array(sel))
        return pa.table(
            {
                "event_type": sub.column("event_type"),
                "n_events": pa.array(n[sel]),
                "threshold": sub.column("value"),
            }
        )

    out = [pick.remote(r, offsets[i], totals) for i, r in enumerate(refs)]
    return rd.from_arrow_refs(out)


def dtw_hourly(
    sf_dir: str, type_a: str = "click", type_b: str = "purchase"
) -> pa.Table:
    """Dynamic-time-warping alignment between two event types'
    hour-of-day count profiles (Sakoe & Chiba 1978) — the elastic
    profile-similarity measure a monitoring pipeline uses where a
    pointwise distance would punish phase shift. Emits the FULL 24x24
    cumulative DP matrix (cost = |count_a[i] - count_b[j]|,
    cum = cost + min(up, left, diag)) so the whole recurrence is
    value-checked — the alignment cost is the (23, 23) cell and any
    path can be derived from the matrix without a tie-break contract.

    Distributed shape: one (event_type, hour) integer count aggregate
    (48 rows cross the wire); the O(24^2) DP runs on the driver —
    constant-sized by construction. All-integer, bit-exact; the SQL
    oracle replays the DP as 47 unrolled anti-diagonal CTEs.
    """
    from vietnamese_ocr_ray.sources.storage import read_parquet_clean

    ds = read_parquet_clean(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type"]
    )

    def partial(b: pa.Table) -> pa.Table:
        ts = b.column("ts").to_numpy(zero_copy_only=False).astype("datetime64[us]")
        hour = (ts.astype(np.int64) // 3_600_000_000) % 24
        t = pa.table(
            {
                "event_type": b.column("event_type"),
                "hour": pa.array(hour),
                "n": pa.array(np.ones(len(hour), np.int64)),
            }
        )
        g = t.group_by(["event_type", "hour"]).aggregate([("n", "sum")])
        return g.rename_columns(["event_type", "hour", "n"])

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "hour"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    prof = {}
    for t in (type_a, type_b):
        v = np.zeros(24, np.int64)
        sub = agg[agg["event_type"] == t]
        v[sub["hour"].to_numpy(np.int64)] = sub["n"].to_numpy(np.int64)
        prof[t] = v
    a, b = prof[type_a], prof[type_b]

    cost = np.abs(a[:, None] - b[None, :])
    cum = np.zeros((24, 24), np.int64)
    for i in range(24):
        for j in range(24):
            best = 0
            if i or j:
                cands = []
                if i:
                    cands.append(cum[i - 1, j])
                if j:
                    cands.append(cum[i, j - 1])
                if i and j:
                    cands.append(cum[i - 1, j - 1])
                best = min(cands)
            cum[i, j] = cost[i, j] + best

    ii, jj = np.meshgrid(np.arange(24), np.arange(24), indexing="ij")
    return pa.table(
        {
            "i": pa.array(ii.ravel().astype(np.int64)),
            "j": pa.array(jj.ravel().astype(np.int64)),
            "cell_cost": pa.array(cost.ravel().astype(np.int64)),
            "cum_cost": pa.array(cum.ravel().astype(np.int64)),
        }
    )


def sliding_distinct_users(sf_dir: str, window_hours: int = 3) -> rd.Dataset:
    """EXACT distinct users over a trailing ``window_hours`` wall-clock
    window, per hour bucket — the "rolling reach" metric. Distinct
    counts do NOT merge across buckets (|A ∪ B| != |A| + |B|), so the
    engine replicates distinct (hour, user) PAIRS forward into each
    window they cover (window_hours small rows per pair, the standard
    set-replication trick) and counts distinct per target hour —
    shuffle traffic is O(distinct pairs * window), never O(events).

    Per-batch Arrow distinct partial -> pair-bounded groupby dedup ->
    vectorized window replication -> one count-distinct aggregate; all
    integers."""
    from vietnamese_ocr_ray.functions.agg import hash_aggregate
    from vietnamese_ocr_ray.sources.storage import read_parquet_clean

    ds = read_parquet_clean(f"{sf_dir}/events.parquet", columns=["ts", "user_id"])

    def pair_partial(b: pa.Table) -> pa.Table:
        ts = b.column("ts").to_numpy(zero_copy_only=False).astype("datetime64[us]")
        hour = ts.astype(np.int64) // 3_600_000_000  # absolute hour epoch
        t = pa.table(
            {
                "hour": pa.array(hour),
                "user_id": pc.cast(_chunk(b.column("user_id")), pa.int64()),
            }
        )
        return t.group_by(["hour", "user_id"]).aggregate([])

    pairs = hash_aggregate(
        ds.map_batches(pair_partial, batch_format="pyarrow"),
        ["hour", "user_id"],
        {"_n": ("hour", "count")},
    )

    def replicate(b: pa.Table) -> pa.Table:
        h = b.column("hour").to_numpy(zero_copy_only=False).astype(np.int64)
        u = b.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        n = h.shape[0]
        tgt = (h[:, None] + np.arange(window_hours)[None, :]).reshape(-1)
        usr = np.repeat(u, window_hours)
        return pa.table({"win_hour": pa.array(tgt), "user_id": pa.array(usr)})

    # distinct (win_hour, user) then count per hour — a user active in
    # two source hours of one window must count once
    dedup = hash_aggregate(
        pairs.map_batches(replicate, batch_format="pyarrow"),
        ["win_hour", "user_id"],
        {"_n": ("user_id", "count")},
    )

    counts = hash_aggregate(
        dedup.map_batches(
            lambda b: pa.table(
                {
                    "win_hour": b.column("win_hour"),
                    "one": pa.array(np.ones(b.num_rows, np.int64)),
                }
            ),
            batch_format="pyarrow",
        ),
        ["win_hour"],
        {"n_users": ("one", "sum")},
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "hour_epoch": pc.cast(t.column("win_hour"), pa.int64()),
                "distinct_users_trailing": pc.cast(
                    t.column("n_users"), pa.int64()
                ),
            }
        )

    return counts.map_batches(finish, batch_format="pyarrow")


# Poisson(1) CDF quantized to u64 thresholds: a draw h ~ U[0, 2^64)
# gets bootstrap weight w = #{k: T_k <= h} (inverse-CDF, capped at 9).
# The table is a fixed shared literal — both engines count the same
# integer comparisons, so resample weights are bit-identical.
POISSON1_T = (
    6786177901268885504,
    13572355802537771008,
    16965444753172213760,
    18096474403383695360,
    18379231815936565248,
    18435783298447138816,
    18445208545532233728,
    18446555009401532416,
    18446723317385195520,
)


def bootstrap_ci_value(sf_dir: str, n_reps: int = 32) -> pa.Table:
    """Distributed Poisson bootstrap (Chamandy et al. 2012, the
    Google-scale bootstrap) of the mean event value per event_type:
    instead of resampling rows WITH replacement (impossible to
    coordinate across workers), each row enters resample ``b`` with an
    independent Poisson(1) weight drawn from
    ``splitmix64(event_id * n_reps + b)`` — one pass, no shuffle of
    rows, exact integer (weight * value) partials per
    (event_type, rep). The emitted band is the 2nd..(B-1)th order
    statistic of the B resample means (the central (B-2)/B bootstrap
    band; percentile-t refinements ride the same machinery).

    Exactness: weights are integer comparisons against the shared
    POISSON1_T literals; per-rep sums are int64; each mean is ONE
    fixed division; order statistics are picked over identical
    doubles. Driver touches only the (types x B) table."""
    from vietnamese_ocr_ray.functions.agg import hash_aggregate
    from vietnamese_ocr_ray.functions.joins import _mix64
    from vietnamese_ocr_ray.sources.storage import read_parquet_clean

    ds = read_parquet_clean(
        f"{sf_dir}/events.parquet", columns=["event_id", "event_type", "value"]
    )
    thr = np.array(POISSON1_T, np.uint64)

    def partial(b: pa.Table) -> pa.Table:
        ids = b.column("event_id").to_numpy(zero_copy_only=False).astype(np.int64)
        v = _cents(b.column("value"), 1000).to_numpy(zero_copy_only=False)
        et = np.asarray(b.column("event_type"))
        keys = ids[:, None].astype(np.uint64) * np.uint64(n_reps) + np.arange(
            n_reps, dtype=np.uint64
        )[None, :]
        h = _mix64(keys.reshape(-1)).reshape(keys.shape)
        w = np.searchsorted(thr, h.reshape(-1), side="right").reshape(h.shape)
        # per (event_type, rep) partials: S = sum w*v, N = sum w; plus
        # the raw point-estimate sums riding as rep = -1
        t = pa.table(
            {
                "event_type": pa.array(np.repeat(et, n_reps)),
                "rep": pa.array(
                    np.tile(np.arange(n_reps, dtype=np.int64), len(ids))
                ),
                "s": pa.array((w * v[:, None]).reshape(-1).astype(np.int64)),
                "n": pa.array(w.reshape(-1).astype(np.int64)),
            }
        )
        g = t.group_by(["event_type", "rep"]).aggregate(
            [("s", "sum"), ("n", "sum")]
        )
        g = g.rename_columns(["event_type", "rep", "s", "n"])
        raw = pa.table(
            {
                "event_type": pa.array(et),
                "rep": pa.array(np.full(len(ids), -1, np.int64)),
                "s": pa.array(v),
                "n": pa.array(np.ones(len(ids), np.int64)),
            }
        )
        graw = raw.group_by(["event_type", "rep"]).aggregate(
            [("s", "sum"), ("n", "sum")]
        )
        return pa.concat_tables(
            [g, graw.rename_columns(["event_type", "rep", "s", "n"])]
        )

    agg = hash_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["event_type", "rep"],
        {"s": ("s", "sum"), "n": ("n", "sum")},
    ).to_pandas()

    rows = []
    for et, g in agg.groupby("event_type", sort=True):
        raw = g[g["rep"] == -1].iloc[0]
        reps = g[g["rep"] >= 0]
        means = np.sort(
            reps["s"].to_numpy(np.float64)
            / reps["n"].to_numpy(np.float64)
            / 1000.0
        )
        rows.append(
            (
                str(et),
                int(raw["n"]),
                float(raw["s"]) / float(raw["n"]) / 1000.0,
                float(means[1]),
                float(means[n_reps - 2]),
            )
        )
    return pa.table(
        {
            "event_type": pa.array([r[0] for r in rows], pa.string()),
            "n_events": pa.array([r[1] for r in rows], pa.int64()),
            "mean_value": pa.array([r[2] for r in rows], pa.float64()),
            "boot_lo": pa.array([r[3] for r in rows], pa.float64()),
            "boot_hi": pa.array([r[4] for r in rows], pa.float64()),
        }
    )


def voptimal_histogram(sf_dir: str, n_buckets: int = 4) -> pa.Table:
    """V-optimal histogram construction over the 24 hourly event
    counts (Jagadish et al. 1998 — the DP a query optimizer runs to
    choose histogram bucket boundaries minimizing total within-bucket
    variance). Emits the FULL DP cost table dp[j][i] = minimal cost of
    splitting hours 0..i into j buckets — value-checking every
    recurrence cell (the dtw_hourly trick: no backtrack tie-break
    contract needed; boundaries are derivable from the table).

    Distributed shape: one (hour, count) integer aggregate; the
    O(k * 24^2) DP is driver-side constant work. Exactness: segment
    cost is the integer fixed point ``sse_fe3(l, r) = ((n * ss - s^2)
    * 1000) // n`` over exact prefix sums (HUGEINT in SQL, unbounded
    ints here); DP sums/mins over those integers are bit-exact.
    """
    from vietnamese_ocr_ray.sources.storage import read_parquet_clean

    ds = read_parquet_clean(f"{sf_dir}/events.parquet", columns=["ts"])

    def partial(b: pa.Table) -> pa.Table:
        ts = b.column("ts").to_numpy(zero_copy_only=False).astype("datetime64[us]")
        hour = (ts.astype(np.int64) // 3_600_000_000) % 24
        c = np.bincount(hour, minlength=24)
        return pa.table(
            {
                "hour": pa.array(np.arange(24, dtype=np.int64)),
                "n": pa.array(c.astype(np.int64)),
            }
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("hour")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
        .sort_values("hour")
    )
    counts = np.zeros(24, np.int64)
    counts[agg["hour"].to_numpy(np.int64)] = agg["n"].to_numpy(np.int64)
    v = [int(x) for x in counts]

    def sse_fe3(l: int, r: int) -> int:
        seg = v[l : r + 1]
        n = len(seg)
        s = sum(seg)
        ss = sum(x * x for x in seg)
        return (n * ss - s * s) * 1000 // n

    INF = 1 << 62
    dp = [[INF] * 24 for _ in range(n_buckets + 1)]
    for i in range(24):
        dp[1][i] = sse_fe3(0, i)
    for j in range(2, n_buckets + 1):
        for i in range(j - 1, 24):
            dp[j][i] = min(
                dp[j - 1][m] + sse_fe3(m + 1, i) for m in range(j - 2, i)
            )

    js, is_, costs = [], [], []
    for j in range(1, n_buckets + 1):
        for i in range(24):
            if dp[j][i] < INF:
                js.append(j)
                is_.append(i)
                costs.append(dp[j][i])
    return pa.table(
        {
            "n_buckets": pa.array(np.array(js, np.int64)),
            "prefix_hour": pa.array(np.array(is_, np.int64)),
            "cost_fe3": pa.array(np.array(costs, np.int64)),
        }
    )


def wasserstein_length(sf_dir: str) -> pa.Table:
    """Exact 1-D Wasserstein-1 (earth mover's) distance between each
    SOURCE's document-length distribution and the GLOBAL one — the
    strongest of the drift metrics this engine ships (KS sees the max
    CDF gap, PSI sees binned ratios; W1 integrates the whole CDF gap
    and is the standard "how much work to reshape this source's
    distribution" number in data-mixing papers).

    W1 = integral |F_s(x) - F_g(x)| dx over the length axis — computed
    EXACTLY on integers: per-(source, length) counts (a bounded
    aggregate: sources x distinct lengths), step-function CDFs, and
    ``num = sum |cumS * nG - cumG * nS| * gap`` with one final fixed
    division ``emd_micro = num * 1e6 // (nS * nG)``. No sampling, no
    binning. The grid math runs on the bounded count table
    driver-side; SQL replays it with window cumsums over the same
    grid."""
    from vietnamese_ocr_ray.sources.storage import read_parquet_clean

    ds = read_parquet_clean(
        f"{sf_dir}/documents.parquet", columns=["source", "n_chars"]
    )

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "source": b.column("source"),
                "len": pc.cast(_chunk(b.column("n_chars")), pa.int64()),
                "n": pa.array(np.ones(b.num_rows, np.int64)),
            }
        )
        g = t.group_by(["source", "len"]).aggregate([("n", "sum")])
        return g.rename_columns(["source", "len", "n"])

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["source", "len"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    lengths = np.sort(agg["len"].unique())
    gaps = np.diff(lengths)  # weight of CDF segment starting at x_i
    gcnt = np.zeros(len(lengths), np.int64)
    gmap = {x: i for i, x in enumerate(lengths)}
    for _, r in agg.iterrows():
        gcnt[gmap[r["len"]]] += int(r["n"])
    n_g = int(gcnt.sum())
    cum_g = np.cumsum(gcnt)

    rows = []
    for src, g in agg.groupby("source", sort=True):
        scnt = np.zeros(len(lengths), np.int64)
        for _, r in g.iterrows():
            scnt[gmap[r["len"]]] = int(r["n"])
        n_s = int(scnt.sum())
        cum_s = np.cumsum(scnt)
        num = int(
            np.sum(
                np.abs(
                    cum_s[:-1].astype(object) * n_g
                    - cum_g[:-1].astype(object) * n_s
                )
                * gaps.astype(object)
            )
        )
        rows.append((str(src), n_s, num * 10**6 // (n_s * n_g)))
    return pa.table(
        {
            "source": pa.array([r[0] for r in rows], pa.string()),
            "n_docs": pa.array([r[1] for r in rows], pa.int64()),
            "emd_micro": pa.array([r[2] for r in rows], pa.int64()),
        }
    )


# cos/sin of hour-of-day angles quantized to integer nano-units — a
# fixed shared literal table (like POISSON1_T) so both engines do pure
# integer arithmetic; round-half-even at 1e9 from IEEE doubles.
HOUR_COS_NANO = (
    1000000000, 965925826, 866025404, 707106781, 500000000, 258819045,
    0, -258819045, -500000000, -707106781, -866025404, -965925826,
    -1000000000, -965925826, -866025404, -707106781, -500000000,
    -258819045, 0, 258819045, 500000000, 707106781, 866025404, 965925826,
)
HOUR_SIN_NANO = (
    0, 258819045, 500000000, 707106781, 866025404, 965925826,
    1000000000, 965925826, 866025404, 707106781, 500000000, 258819045,
    0, -258819045, -500000000, -707106781, -866025404, -965925826,
    -1000000000, -965925826, -866025404, -707106781, -500000000,
    -258819045,
)


def circular_peak_hour(sf_dir: str) -> pa.Table:
    """Circular (directional) statistics of event times per
    event_type: the hour-of-day is an ANGLE, so "when does this event
    concentrate" must not average 23:00 and 01:00 to noon. Computes
    the resultant vector (C, S) = sum of per-hour unit vectors
    weighted by counts, the Rayleigh uniformity statistic
    ``z = R^2 / n`` (z_micro exact-integer scaled — large z rejects
    "uniform over the day"), and the modal hour.

    Exactness: unit vectors come from the shared HOUR_COS/SIN_NANO
    integer literals; C, S and z_micro are pure integer arithmetic
    (HUGEINT in SQL); peak_hour ties break toward the smaller hour.
    Distributed shape: one (type, hour) count aggregate; everything
    after is a 24-row table."""
    from vietnamese_ocr_ray.sources.storage import read_parquet_clean

    ds = read_parquet_clean(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts"]
    )

    def partial(b: pa.Table) -> pa.Table:
        ts = b.column("ts").to_numpy(zero_copy_only=False).astype("datetime64[us]")
        hour = (ts.astype(np.int64) // 3_600_000_000) % 24
        t = pa.table(
            {
                "event_type": b.column("event_type"),
                "hour": pa.array(hour),
                "n": pa.array(np.ones(len(hour), np.int64)),
            }
        )
        g = t.group_by(["event_type", "hour"]).aggregate([("n", "sum")])
        return g.rename_columns(["event_type", "hour", "n"])

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "hour"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    rows = []
    for et, g in agg.groupby("event_type", sort=True):
        cnt = np.zeros(24, np.int64)
        cnt[g["hour"].to_numpy(np.int64)] = g["n"].to_numpy(np.int64)
        n = int(cnt.sum())
        C = int(sum(int(c) * HOUR_COS_NANO[h] for h, c in enumerate(cnt)))
        S = int(sum(int(c) * HOUR_SIN_NANO[h] for h, c in enumerate(cnt)))
        z_micro = (C * C + S * S) * 10**6 // (n * 10**18)
        peak = int(np.argmax(cnt))  # first max == smallest hour
        rows.append((str(et), n, C, S, z_micro, peak))
    return pa.table(
        {
            "event_type": pa.array([r[0] for r in rows], pa.string()),
            "n_events": pa.array([r[1] for r in rows], pa.int64()),
            "c_nano": pa.array([r[2] for r in rows], pa.int64()),
            "s_nano": pa.array([r[3] for r in rows], pa.int64()),
            "rayleigh_z_micro": pa.array([r[4] for r in rows], pa.int64()),
            "peak_hour": pa.array([r[5] for r in rows], pa.int64()),
        }
    )


def decayed_type_counts(sf_dir: str, half_life_hours: int = 12) -> pa.Table:
    """Exponentially time-decayed event counts per type, as of the
    stream's last hour — the freshness-weighted counter a streaming
    ranker keeps (recent activity dominates, stale mass fades with a
    ``half_life_hours`` half-life). Decay is quantized to HOUR steps
    so every weight is the exact dyadic ``2^-(age_hours //
    half_life)``; per-type sums accumulate as EXACT integers
    ``sum(2^(k_max - k))`` (unbounded here, HUGEINT in SQL) and the
    emitted double is ONE deterministic cast + division — no float
    accumulation order anywhere.

    Shape: one (type, age-bucket) count aggregate (calendar-bounded),
    driver finish over that tiny table."""
    from vietnamese_ocr_ray.functions.agg import hash_aggregate
    from vietnamese_ocr_ray.sources.storage import read_parquet_clean

    ds = read_parquet_clean(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts"]
    )

    def partial(b: pa.Table) -> pa.Table:
        ts = b.column("ts").to_numpy(zero_copy_only=False).astype("datetime64[us]")
        hour = ts.astype(np.int64) // 3_600_000_000
        t = pa.table(
            {"event_type": b.column("event_type"), "h": pa.array(hour)}
        )
        return t.group_by(["event_type", "h"]).aggregate(
            [("h", "count")]
        ).rename_columns(["event_type", "h", "n"])

    hourly = hash_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["event_type", "h"],
        {"n": ("n", "sum")},
        num_buckets=8,
    ).to_pandas()
    hmax = int(hourly["h"].max())
    kmax = int((hmax - int(hourly["h"].min())) // half_life_hours)
    rows = []
    for et, g in hourly.groupby("event_type", sort=True):
        acc = 0
        for _, r in g.iterrows():
            k = (hmax - int(r["h"])) // half_life_hours
            acc += int(r["n"]) << (kmax - k)
        rows.append((str(et), int(g["n"].sum()), acc))
    scale = float(1 << kmax)
    out = sorted(rows, key=lambda r: (-(r[2]), r[0]))
    return pa.table(
        {
            "event_type": pa.array([r[0] for r in out], pa.string()),
            "n_events": pa.array([r[1] for r in out], pa.int64()),
            "decayed_count": pa.array(
                [float(r[2]) / scale for r in out], pa.float64()
            ),
            "rank": pa.array(
                np.arange(1, len(out) + 1, dtype=np.int64)
            ),
        }
    )


def l_diversity(sf_dir: str, l_min: int = 3, band_cents: int = 100_000) -> rd.Dataset:
    """l-diversity audit over the (nationkey, mktsegment) quasi-
    identifier classes (k_anonymity's companion): per equivalence
    class, the number of DISTINCT sensitive values — account balance
    bucketed to $1000 bands — and whether it meets ``l_min``. A class
    can be k-anonymous yet expose its members if every row shares one
    sensitive value; this is the check that catches it.

    Scale shape: per-batch Arrow distinct over (QI, band) — the
    combiner bounds the shuffle by distinct (class x band), not rows —
    then one class-bounded aggregate counts bands per class. Bands are
    exact integer floor-division of cents (DuckDB // on the same
    non-negative shifted value)."""
    from vietnamese_ocr_ray.functions.agg import hash_aggregate

    ds = read_parquet_clean(
        f"{sf_dir}/customer.parquet",
        columns=["c_nationkey", "c_mktsegment", "c_acctbal"],
    )

    def partial(b: pa.Table) -> pa.Table:
        bal = _cents(b.column("c_acctbal"), 100).to_numpy(zero_copy_only=False)
        # shift non-negative before the floor-division so numpy and
        # DuckDB // agree (both truncate toward zero on >= 0)
        band = (bal + 10_000_000) // band_cents
        t = pa.table(
            {
                "c_nationkey": pc.cast(
                    _chunk(b.column("c_nationkey")), pa.int64()
                ),
                "c_mktsegment": b.column("c_mktsegment"),
                "band": pa.array(band),
            }
        )
        g = t.group_by(["c_nationkey", "c_mktsegment", "band"]).aggregate([])
        return g.append_column(
            "one", pa.array(np.ones(g.num_rows, np.int64))
        )

    distinct = hash_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["c_nationkey", "c_mktsegment", "band"],
        {"one": ("one", "max")},
    )

    def count_bands(b: pa.Table) -> pa.Table:
        return b.group_by(["c_nationkey", "c_mktsegment"]).aggregate(
            [("one", "sum")]
        ).rename_columns(["c_nationkey", "c_mktsegment", "n_bands"])

    agg = (
        distinct.map_batches(count_bands, batch_format="pyarrow")
        .groupby(["c_nationkey", "c_mktsegment"])
        .aggregate(Sum("n_bands", alias_name="n_bands"))
    )

    def finish(b: pa.Table) -> pa.Table:
        nb = pc.cast(b.column("n_bands"), pa.int64())
        return pa.table(
            {
                "c_nationkey": pc.cast(b.column("c_nationkey"), pa.int64()),
                "c_mktsegment": b.column("c_mktsegment"),
                "l_distinct": nb,
                "diverse": pc.cast(
                    pc.greater_equal(nb, pa.scalar(l_min, pa.int64())),
                    pa.int64(),
                ),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow").sort(
        ["c_nationkey", "c_mktsegment"]
    )
