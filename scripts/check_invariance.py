"""Partitioning-invariance harness: the SQL-oracle gate proves VALUES;
this proves the complementary axis — that no query's result depends on
the physical block layout. Every queries() entry runs twice in one Ray
session: once with the normal byte-sized read layout, once with
``VOR_FORCE_READ_BLOCKS`` forcing every parquet read into a hostile
block count (default 3 — small, odd, and far from the tuned sizes, so
batch boundaries, partial-aggregate shapes, and shuffle fan-ins all
move). The two results must be identical after canonicalization
(column-name sort + all-column row sort), bit-exact.

This is the harness version of the determinism contract the engine
claims everywhere (content-hash-seeded draws, order-independent
integer reduces): a query whose output moves when only the layout
moves is a latent at-scale bug of exactly the connected-components
round-cap class.

Usage: python scripts/check_invariance.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))  # repo root: __ray_entry__
sys.path.insert(0, _HERE)  # sibling: check_contract

from check_contract import canon, to_pandas  # noqa: E402

# Ops whose OUTPUT is layout-sensitive by documented design (each must
# say so in its query docstring); everything else must be invariant.
KNOWN_LAYOUT_SENSITIVE: dict[str, str] = {
    "heavy_hitters_cms": (
        "per-batch candidate generation: the candidate UNION depends on "
        "batch boundaries; the one-sided CMS estimate guarantee holds "
        "regardless (tested), but tail-of-top-k membership can move"
    ),
    "approx_quantiles": (
        "compaction-sketch estimates: which elements survive compaction "
        "tracks block boundaries; the rank-error bound (tested vs exact) "
        "holds for ANY layout — the bound, not the bits, is the contract"
    ),
}


def main() -> None:
    import ray

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    forced_blocks = os.environ.get("VOR_INVARIANCE_BLOCKS", "3")

    ray.init(
        address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR"
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as mod

    qs = mod.queries()
    failed, skipped = [], []
    import time

    for name, fn in qs.items():
        if only and name not in only:
            continue
        if name in KNOWN_LAYOUT_SENSITIVE and not only:
            skipped.append(name)
            print(f"skip  {name}: {KNOWN_LAYOUT_SENSITIVE[name]}")
            continue
        t0 = time.perf_counter()
        try:
            os.environ.pop("VOR_FORCE_READ_BLOCKS", None)
            base = canon(to_pandas(fn(sf_dir)))
            os.environ["VOR_FORCE_READ_BLOCKS"] = forced_blocks
            alt = canon(to_pandas(fn(sf_dir)))
        except Exception as e:  # noqa: BLE001 - report and continue
            import traceback

            traceback.print_exc()
            print(f"FAIL  {name}: raised {type(e).__name__}: {e}")
            failed.append(name)
            continue
        finally:
            os.environ.pop("VOR_FORCE_READ_BLOCKS", None)
        dt = time.perf_counter() - t0
        if list(base.columns) != list(alt.columns):
            print(f"FAIL  {name}: columns moved {list(base.columns)} vs {list(alt.columns)}")
            failed.append(name)
        elif len(base) != len(alt):
            print(f"FAIL  {name}: rows moved {len(base)} vs {len(alt)}")
            failed.append(name)
        elif not base.equals(alt):
            diff = (base != alt).any(axis=1)
            print(f"FAIL  {name}: {int(diff.sum())}/{len(base)} rows moved")
            print("default layout:\n", base[diff].head(3))
            print(f"{forced_blocks}-block layout:\n", alt[diff].head(3))
            failed.append(name)
        else:
            print(f"ok    {name}: invariant ({len(base)} rows)  [{dt:.1f}s]")

    ray.shutdown()
    if failed:
        print("FAILED:", failed)
        sys.exit(1)
    print(f"all invariant ({len(skipped)} documented layout-sensitive skips)")


if __name__ == "__main__":
    main()
