"""Fault-tolerance semantics: Ray retries a map task whose WORKER DIED and the
pipeline still produces exactly-once output (no dropped or duplicated
rows) — the property a 256-node run leans on when workers die."""

import os
import tempfile

import pyarrow as pa
import ray.data as rd


def test_task_retry_exactly_once(ray_session):
    marker = os.path.join(
        tempfile.mkdtemp(prefix="vnocr_retry_"), "failed_once"
    )

    def flaky(batch: pa.Table) -> pa.Table:
        # KILL the first worker process that ever runs a task (a real
        # worker-death system failure, which Ray Data retries — unlike
        # user exceptions, which fail the dataset); the marker file is
        # cross-process state shared by the retry
        try:
            fd = os.open(marker, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            os.close(fd)
            os._exit(1)  # simulated worker crash
        except FileExistsError:
            pass
        return pa.table(
            {"doc_id": batch.column("doc_id"), "twice": pa.array(
                [v * 2 for v in batch.column("doc_id").to_pylist()],
                pa.int64(),
            )}
        )

    t = pa.table({"doc_id": pa.array(list(range(100)), pa.int64())})
    out = (
        rd.from_arrow(t)
        .repartition(4)
        .map_batches(flaky, batch_format="pyarrow")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["doc_id"].tolist() == list(range(100))  # nothing lost
    assert out["twice"].tolist() == [2 * i for i in range(100)]  # no dup
    assert os.path.exists(marker)  # the failure really happened
