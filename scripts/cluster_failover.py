"""Node-failure drill for the flagship extraction job on a REAL
multi-process Ray cluster — the north rule's resumability story,
exercised the hard way:

1. start a 4-node process cluster (1 head + 3 worker-node processes,
   8 CPUs each, own object stores);
2. submit `scripts/job_extract.py` over the bench corpus;
3. SIGKILL one worker node's raylet mid-run (a machine dying);
4. observe the outcome:
   - Ray retries the dead node's tasks on the survivors and the job
     completes with FULL output (task-level fault tolerance), or
   - the job dies, and a rerun with the same --out resumes from the
     per-fragment lineage manifest, skipping finished fragments.
   Either way the final output must be row-complete, and the script
   verifies it against an undisturbed reference run.

Usage: python scripts/cluster_failover.py [--sf-dir /root/testdata/sf0.1]
       [--kill-after 6] [--quick]
Prints one JSON record for BENCH/BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))

from cluster_scaling import (  # noqa: E402
    cluster_env,
    sh,
    start_cluster,
    stop_cluster,
)


def raylet_pids() -> set[int]:
    out = subprocess.run(
        ["pgrep", "-f", "raylet/raylet"], capture_output=True, text=True
    ).stdout
    if not out.strip():
        out = subprocess.run(
            ["pgrep", "-x", "raylet"], capture_output=True, text=True
        ).stdout
    return {int(p) for p in out.split()}


def launch_job(docs_dir: str, media_dir: str, out_dir: str):
    env = cluster_env()
    env["RAY_ADDRESS"] = "127.0.0.1:6380"
    return subprocess.Popen(
        [
            sys.executable, "scripts/job_extract.py",
            "--docs", docs_dir, "--media", media_dir, "--out", out_dir,
            "--chunk-fragments", "4",  # several chunks -> a mid-run kill
            "--cogroup-buckets", "768",
            "--recognize-compute", "tasks",
        ],
        cwd=REPO, env=env,
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
    )


def rows_out(out_dir: str) -> int:
    import pyarrow.parquet as pq

    total = 0
    for root, _dirs, files in os.walk(out_dir):
        for f in files:
            if f.endswith(".parquet"):
                total += pq.ParquetFile(os.path.join(root, f)).metadata.num_rows
    return total


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    p.add_argument("--kill-after", type=float, default=6.0)
    p.add_argument("--quick", action="store_true")
    p.add_argument(
        "--kill-head", action="store_true",
        help="kill the whole cluster mid-job (driver dies too) and "
        "prove the MANIFEST-RESUME branch on a fresh cluster",
    )
    args = p.parse_args()
    sf_dir = "/root/testdata/sf0.001" if args.quick else args.sf_dir
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

    record: dict = {"metric": "cluster_failover", "sf_dir": sf_dir}

    # reference run (undisturbed) for the row-count ground truth
    start_cluster(8, [8, 8, 8])
    ref_out = "/tmp/vnocr_failover_ref"
    shutil.rmtree(ref_out, ignore_errors=True)
    proc = launch_job(docs_dir, media_dir, ref_out)
    stdout, stderr = proc.communicate(timeout=1800)
    assert proc.returncode == 0, stderr[-2000:]
    ref_rows = rows_out(ref_out)
    record["reference_rows_out"] = ref_rows
    stop_cluster()

    # drill run
    start_cluster(8, [8, 8, 8])
    time.sleep(2)
    pids_before = raylet_pids()
    drill_out = "/tmp/vnocr_failover_drill"
    shutil.rmtree(drill_out, ignore_errors=True)
    t0 = time.perf_counter()
    proc = launch_job(docs_dir, media_dir, drill_out)
    time.sleep(args.kill_after)
    if args.kill_head:
        # total-loss branch: the whole cluster (and with it the
        # attached driver) dies mid-job; a FRESH cluster must resume
        # from the per-fragment manifest, skipping finished fragments
        stop_cluster()
        try:
            proc.kill()
        except Exception:
            pass
        proc.communicate(timeout=60)
        record["killed"] = "entire-cluster (head included)"
        record["killed_after_s"] = args.kill_after
        start_cluster(8, [8, 8, 8])
        proc = launch_job(docs_dir, media_dir, drill_out)
        stdout, stderr = proc.communicate(timeout=1800)
        assert proc.returncode == 0, stderr[-2000:]
        line = [l for l in stdout.splitlines() if l.startswith("{")][-1]
        record["outcome"] = "resumed-from-manifest"
        record["summary"] = json.loads(line)
        record["fragments_skipped_on_resume"] = record["summary"][
            "fragments_done_prior"
        ]
    else:
        victims = sorted(raylet_pids() & pids_before)
        # kill the HIGHEST pid = the last worker node started — never
        # the head
        victim = victims[-1]
        os.kill(victim, signal.SIGKILL)
        record["killed_raylet_pid"] = victim
        record["killed_after_s"] = args.kill_after
        stdout, stderr = proc.communicate(timeout=1800)
        first_rc = proc.returncode
        record["job_exit_after_kill"] = first_rc
        if first_rc == 0:
            line = [l for l in stdout.splitlines() if l.startswith("{")][-1]
            record["outcome"] = "completed-despite-node-death"
            record["summary"] = json.loads(line)
        else:
            # resume path: rerun with the SAME out dir on the (now
            # 3-node) cluster; the manifest must skip finished fragments
            proc = launch_job(docs_dir, media_dir, drill_out)
            stdout, stderr = proc.communicate(timeout=1800)
            assert proc.returncode == 0, stderr[-2000:]
            line = [l for l in stdout.splitlines() if l.startswith("{")][-1]
            record["outcome"] = "resumed-from-manifest"
            record["summary"] = json.loads(line)
            record["fragments_skipped_on_resume"] = record["summary"][
                "fragments_done_prior"
            ]
    record["wall_s_total"] = round(time.perf_counter() - t0, 1)
    drill_rows = rows_out(drill_out)
    record["drill_rows_out"] = drill_rows
    record["row_complete"] = bool(drill_rows == ref_rows)
    stop_cluster()
    print(json.dumps(record), flush=True)
    return 0 if record["row_complete"] else 1


if __name__ == "__main__":
    sys.exit(main())
