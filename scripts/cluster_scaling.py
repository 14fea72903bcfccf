"""Two-cluster-size scaling evidence via REAL multi-process Ray clusters.

The north rule asks for the extraction job run via ``ray job submit``
on fixed N-node and 4N-node clusters with throughput scaling
efficiency >= 0.8 between them. This sandbox has one host, so the
closest honest approximation is two genuinely separate ``ray start``
process clusters on it:

  - size N : 1 head process, 8 CPUs
  - size 4N: 1 head process (8 CPUs) + 3 worker-node processes
             (8 CPUs each) = 4 OS-process "nodes", 32 CPUs total,
             each node with its OWN plasma object store, so every
             cross-node block transfer really serializes through
             shared memory the way a NIC-backed cluster would
             (minus the wire).

Each leg submits ``scripts/job_extract.py`` to the running cluster —
through ``ray job submit`` when the job agent is available (requires
the ray[default] dashboard extras), else as a driver process attached
with RAY_ADDRESS — runs the identical flagship pipeline over the
identical corpus, and records wall time from the job's own summary
line. Efficiency = (thr_4N / thr_N) / (cpus_4N / cpus_N).

Usage:
    python scripts/cluster_scaling.py [--sf-dir /root/testdata/sf0.1]
        [--pairs 1] [--quick]

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
    addr: str, docs_dir: str, media_dir: str, out_dir: str, tag: str
) -> dict:
    """Run job_extract against the cluster; prefer `ray job submit`,
    fall back to a driver process attached via RAY_ADDRESS (same
    pipeline, same cluster — only the submission plumbing differs)."""
    shutil.rmtree(out_dir, ignore_errors=True)
    job_argv = [
        "python", "scripts/job_extract.py",
        "--docs", docs_dir, "--media", media_dir,
        "--out", out_dir,
        # bench-matched knobs: one resumable chunk (the per-chunk
        # pipeline spin-up is fixed cost, not throughput), the measured
        # cogroup bucket count, and tasks-mode recognize (actor pools
        # reserve CPUs through the sort barrier — see bench.py)
        "--chunk-fragments", "100000",
        "--cogroup-buckets", "768",
        "--recognize-compute", "tasks",
        "--read-blocks", "48",
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
    args = p.parse_args()
    sf_dir = "/root/testdata/sf0.001" if args.quick else args.sf_dir

    # the bench-replicated corpus (same input as the extract_e2e
    # headline: sf docs x16 with distinct doc_ids, media shared) so
    # the legs are throughput-dominated, not pipeline-spin-up-bound
    factor = 1 if args.quick else 16
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

    pairs = []
    for i in range(1 if args.quick else args.pairs):
        probe_before = memcpy_gbs()
        # leg A: 1-process cluster, 8 cpus. First run is an UNTIMED
        # warmup (worker spawn on every node + page cache), the bench
        # discipline; the second, fresh-output run is the measurement.
        addr = start_cluster(8, [])
        submit_job(addr, docs_dir, media_dir, "/tmp/vnocr_cluster_warm", "warm")
        a = submit_job(
            addr, docs_dir, media_dir, f"/tmp/vnocr_cluster_out_a{i}", "N=8"
        )
        stop_cluster()
        # leg B: 4-process cluster, 8 cpus each (4N = 32)
        addr = start_cluster(8, [8, 8, 8])
        submit_job(addr, docs_dir, media_dir, "/tmp/vnocr_cluster_warm", "warm")
        b = submit_job(
            addr, docs_dir, media_dir, f"/tmp/vnocr_cluster_out_b{i}", "4N=32"
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
        "cluster_shape": "1x8cpu-node vs 4x8cpu-nodes (separate ray start processes, own object stores)",
        "pairs": pairs,
        "sf_dir": sf_dir,
    }
    print(json.dumps(record), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
