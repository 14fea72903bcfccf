"""Two-cluster-size scaling evidence via REAL multi-process Ray clusters.

The north rule asks for the extraction job run via ``ray job submit``
on fixed N-node and 4N-node clusters with throughput scaling
efficiency >= 0.8 between them. This sandbox has one host, so the
closest honest approximation is two genuinely separate ``ray start``
process clusters on it:

  - size N : 1 head process, --node-cpus CPUs (default 7)
  - size 4N: 1 head process + 3 worker-node processes (--node-cpus
             each) = 4 OS-process "nodes", each with its OWN plasma
             object store, so every cross-node block transfer really
             serializes through shared memory the way a NIC-backed
             cluster would (minus the wire).  Default 7 CPUs/node: the
             4-node leg then leaves 4 host cores for the 4 raylets +
             stores + driver, the way a real node reserves cores for
             its daemons — at 8/node the 4-node leg alone oversubscribes
             the 32-core host, charging it a ~20% penalty no real
             cluster pays (measured eff 0.80 -> 0.95).

Each leg submits ``scripts/job_extract.py`` to the running cluster —
through ``ray job submit`` when the job agent is available (requires
the ray[default] dashboard extras), else as a driver process attached
with RAY_ADDRESS — runs the identical flagship pipeline over the
identical corpus, and records wall time from the job's own summary
line. Efficiency = (thr_4N / thr_N) / (cpus_4N / cpus_N).

Usage:
    python scripts/cluster_scaling.py [--sf-dir /root/testdata/sf0.1]
        [--pairs 1] [--quick] [--mode mapjoin|copartitioned|cogroup]

Round-5 configuration (the certified path): ``--mode mapjoin`` +
``--reassembly local`` — media payloads attach inside the recognize
stage from the ``write_media_bucketed`` layout and per-block packs are
written in the sink, so the only exchange left is the ~2-docs-per-block
edge stitch.  Corpus is sf0.1 x64 (vs the bench's x16): per-leg fixed
cost (~2-3 s of driver connect/plan/manifest) caps a ~8 s leg at ~0.55
efficiency no matter how well the pipeline scales, so the measurement
must be throughput-dominated.  ``--mode cogroup`` reproduces the r4
shuffle-heavy configuration for comparison.

Prints one JSON line (the BENCH/BASELINE.md evidence record). The
corpus is synthesized once under /tmp and reused; output dirs are
fresh per leg so the resume manifest never short-circuits a timing.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PORT = 6380  # off the default 6379 to avoid colliding with strays


def memcpy_gbs() -> float:
    import numpy as np

    a = np.ones(12_500_000)
    b = np.empty_like(a)
    np.copyto(b, a)  # fault both buffers untimed
    t = time.perf_counter()
    for _ in range(5):
        np.copyto(b, a)
    return round(0.5 / (time.perf_counter() - t), 2)


def sh(cmd: list[str], env: dict | None = None, check: bool = True) -> str:
    r = subprocess.run(
        cmd, capture_output=True, text=True, env=env, cwd=REPO
    )
    if check and r.returncode != 0:
        raise RuntimeError(
            f"{' '.join(cmd)} failed rc={r.returncode}\n{r.stdout}\n{r.stderr}"
        )
    return r.stdout


def cluster_env() -> dict:
    env = dict(os.environ)
    env.pop("RAY_ADDRESS", None)  # preset 'local' would bypass the cluster
    env["RAY_DISABLE_IMPORT_WARNING"] = "1"
    # worker processes of ray-start node processes inherit the raylet's
    # env; the package must be importable there (no runtime_env pip in
    # this sandbox, so PYTHONPATH is the shipping mechanism)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return env


def start_cluster(head_cpus: int, worker_cpus: list[int]) -> str:
    env = cluster_env()
    sh(["ray", "stop", "--force"], env=env, check=False)
    time.sleep(2)
    # modest fixed object stores: one host shares its memory across all
    # node processes, so the 30%-each default would overcommit
    store = str(8 * 1024**3)
    sh(
        [
            "ray", "start", "--head", f"--port={PORT}",
            f"--num-cpus={head_cpus}", f"--object-store-memory={store}",
            # 16 MB object-manager chunks (default 5 MB): the shuffle
            # moves multi-MB media-payload blocks between node object
            # stores, and the default chunking left the transfer
            # latency-bound (4-node leg measured 14.5 -> 11.6 s)
            '--system-config={"object_manager_default_chunk_size":16777216}',
        ],
        env=env,
    )
    addr = f"127.0.0.1:{PORT}"
    for cpus in worker_cpus:
        sh(
            [
                "ray", "start", f"--address={addr}",
                f"--num-cpus={cpus}", f"--object-store-memory={store}",
            ],
            env=env,
        )
    return addr


def stop_cluster() -> None:
    sh(["ray", "stop", "--force"], env=cluster_env(), check=False)
    time.sleep(1)


def submit_job(
    addr: str, docs_dir: str, media_dir: str, out_dir: str, tag: str,
    mode: str = "mapjoin", read_blocks: int = 192,
) -> dict:
    """Run job_extract against the cluster; prefer `ray job submit`,
    fall back to a driver process attached via RAY_ADDRESS (same
    pipeline, same cluster — only the submission plumbing differs)."""
    shutil.rmtree(out_dir, ignore_errors=True)
    job_argv = [
        "python", "scripts/job_extract.py",
        "--docs", docs_dir, "--media", media_dir,
        "--out", out_dir,
        "--mode", mode,
        # bench-matched knobs: one resumable chunk (the per-chunk
        # pipeline spin-up is fixed cost, not throughput), the measured
        # cogroup bucket count, and tasks-mode recognize (actor pools
        # reserve CPUs through the sort barrier — see bench.py).
        # mode=mapjoin (r5 default): media payloads attach INSIDE the
        # recognize stage from the write_media_bucketed layout, so the
        # only remaining exchange is the reassembly sort — the r4
        # decomposition blamed the scaling gap entirely on cross-store
        # block fetch in the two sort shuffles, and this removes the
        # bigger one (r4 ran --mode cogroup; pass it to reproduce).
        "--chunk-fragments", "100000",
        "--cogroup-buckets", "768",
        "--recognize-compute", "tasks",
        # ~3 read blocks per fragment at x64 (192): recognize tasks of
        # ~2k docs — coarse enough to amortize per-task cost (finer
        # granularity measured slower on both legs), fine enough that
        # neither leg starves
        "--read-blocks", str(read_blocks),
        "--recognize-batch-size", "2048",
        # zero-shuffle reassembly: pack per block in the sink, stitch
        # only block-edge docs through the bucketed shuffle
        "--reassembly", "local" if mode in ("mapjoin", "broadcast") else "shuffle",
    ]
    env = cluster_env()
    env["RAY_ADDRESS"] = f"ray://{addr}"  # not used by job submit path
    submit_mode = "ray-job-submit"
    r = subprocess.run(
        [
            "ray", "job", "submit", f"--address=http://127.0.0.1:8265",
            "--working-dir", REPO, "--", *job_argv,
        ],
        capture_output=True, text=True, cwd=REPO, env=cluster_env(),
        timeout=3600,
    )
    out = r.stdout
    if r.returncode != 0:
        # no job agent (ray[data]-only install) — attach a driver instead
        submit_mode = "driver-attach"
        env = cluster_env()
        env["RAY_ADDRESS"] = addr
        r = subprocess.run(
            job_argv, capture_output=True, text=True, cwd=REPO, env=env,
            timeout=3600,
        )
        if r.returncode != 0:
            raise RuntimeError(f"job failed:\n{r.stdout}\n{r.stderr}")
        out = r.stdout
    line = [l for l in out.splitlines() if l.startswith("{")][-1]
    summary = json.loads(line)
    summary["submit_mode"] = submit_mode
    summary["tag"] = tag
    return summary


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--sf-dir", default=os.environ.get(
        "GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    p.add_argument("--pairs", type=int, default=1)
    p.add_argument("--quick", action="store_true",
                   help="sf0.001 corpus, 1 pair")
    p.add_argument("--node-cpus", type=int, default=7,
                   help="CPUs per node PROCESS (both legs). Default 7: "
                        "the 4-node leg then uses 28 worker CPUs and "
                        "leaves 4 host cores for the 4 raylets + plasma "
                        "stores + driver, the way a real node reserves "
                        "cores for its daemons; 8 oversubscribes the "
                        "32-core host on the 4-node leg only, charging "
                        "a ~20% penalty to leg B that no real cluster "
                        "pays (measured: eff 0.80 at 8 -> 0.95 at 7)")
    p.add_argument("--factor", type=int, default=64,
                   help="docs replication factor (throughput-dominated "
                        "regime; fixed per-leg cost is ~2-3 s)")
    p.add_argument("--mode", default="mapjoin",
                   choices=["mapjoin", "copartitioned", "cogroup"],
                   help="media join mode for the cluster job "
                        "(mapjoin = zero-media-shuffle scale path)")
    args = p.parse_args()
    sf_dir = "/root/testdata/sf0.001" if args.quick else args.sf_dir

    # the bench-replicated corpus (same input as the extract_e2e
    # headline: sf docs replicated with distinct doc_ids, media shared)
    # at x64 (vs the bench's x16) so both legs are throughput-dominated:
    # per-leg fixed cost (driver connect + plan + manifest) is ~2-3 s,
    # which at x16 caps the measurable efficiency of a ~8 s leg-B at
    # ~0.55 regardless of pipeline quality
    factor = 1 if args.quick else args.factor
    prep_env = dict(cluster_env())
    prep_env["RAY_ADDRESS"] = "local"
    out = sh(
        [
            sys.executable, "-c",
            (
                f"import sys; sys.path.insert(0, {REPO!r}); "
                f"import bench; "
                f"print('\\n'.join(bench._replicated_corpus({sf_dir!r}, {factor})))"
            ),
        ],
        env=prep_env,
    )
    docs_dir, media_dir = [l for l in out.splitlines() if l.strip()][-2:]
    # ~3 read blocks per fragment keeps recognize tasks ~2k docs each
    read_blocks = max(48, factor * 3)
    out = sh(
        [
            sys.executable, "-c",
            (
                f"import sys; sys.path.insert(0, {REPO!r}); "
                f"import bench; "
                f"print('\\n'.join(bench._replicated_corpus({sf_dir!r}, 1)))"
            ),
        ],
        env=prep_env,
    )
    warm_docs = [l for l in out.splitlines() if l.strip()][-2]

    if args.mode in ("mapjoin", "copartitioned"):
        # one-time storage-layout prep (the Hive-bucketing / Lance
        # colocation analog — a property of how the corpus is laid out,
        # not of any single job): hash-partition the media table by
        # media_ref.  Cached next to the corpus cache.
        bucketed = media_dir.rstrip("/") + "-bucketed-64"
        if not os.path.exists(os.path.join(bucketed, "_BUCKETS")):
            sh(
                [
                    sys.executable, "-c",
                    (
                        f"import sys; sys.path.insert(0, {REPO!r}); "
                        f"import ray; ray.init(address='local', num_cpus=8, include_dashboard=False); "
                        f"from vietnamese_ocr_ray.sources.storage import write_media_bucketed; "
                        f"write_media_bucketed({media_dir!r}, {bucketed!r}, 64); "
                        f"ray.shutdown()"
                    ),
                ],
                env=prep_env,
            )
        media_dir = bucketed

    pairs = []
    for i in range(1 if args.quick else args.pairs):
        probe_before = memcpy_gbs()
        # leg A: 1-process cluster, 8 cpus. First run is an UNTIMED
        # warmup (worker spawn on every node + page cache), the bench
        # discipline; the second, fresh-output run is the measurement.
        nc = args.node_cpus
        addr = start_cluster(nc, [])
        # warmup on the x1 corpus: spawns every node's workers and
        # faults imports without paying a full-corpus untimed pass
        submit_job(addr, warm_docs, media_dir, "/tmp/vnocr_cluster_warm",
                   "warm", mode=args.mode, read_blocks=48)
        a = submit_job(
            addr, docs_dir, media_dir, f"/tmp/vnocr_cluster_out_a{i}",
            f"N={nc}", mode=args.mode, read_blocks=read_blocks,
        )
        stop_cluster()
        # leg B: 4-process cluster, node_cpus each (4N)
        addr = start_cluster(nc, [nc, nc, nc])
        submit_job(addr, warm_docs, media_dir, "/tmp/vnocr_cluster_warm",
                   "warm", mode=args.mode, read_blocks=48)
        b = submit_job(
            addr, docs_dir, media_dir, f"/tmp/vnocr_cluster_out_b{i}",
            f"4N={4*nc}", mode=args.mode, read_blocks=read_blocks,
        )
        stop_cluster()
        probe_after = memcpy_gbs()
        thr_a = a["rows_in"] / a["elapsed_s"]
        thr_b = b["rows_in"] / b["elapsed_s"]
        eff = (thr_b / thr_a) / (b["cluster_cpus"] / a["cluster_cpus"])
        pairs.append(
            {
                "n_small": a, "n_big": b,
                "docs_per_sec_small": round(thr_a, 1),
                "docs_per_sec_big": round(thr_b, 1),
                "efficiency": round(eff, 3),
                "host_memcpy_gbs_before": probe_before,
                "host_memcpy_gbs_after": probe_after,
            }
        )
        print(json.dumps(pairs[-1]), flush=True)

    effs = sorted(p["efficiency"] for p in pairs)
    record = {
        "metric": "cluster_scaling_efficiency",
        "value": effs[len(effs) // 2],
        "unit": "ratio",
        "cluster_shape": f"1x{args.node_cpus}cpu-node vs 4x{args.node_cpus}cpu-nodes (separate ray start processes, own object stores)",
        "pairs": pairs,
        "mode": args.mode,
        "sf_dir": sf_dir,
    }
    print(json.dumps(record), flush=True)
    if not args.quick:
        record["stamp"] = time.strftime("%Y-%m-%d %H:%M:%S")
        out_path = os.path.join(REPO, "BENCH", "cluster_scaling_r5.jsonl")
        with open(out_path, "a", encoding="utf-8") as f:
            f.write(json.dumps(record) + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
