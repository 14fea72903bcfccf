"""Checkpoint manifest: per-fragment lineage records enabling exact
resume of unfinished fragments (north_rule; the reference has NO
predict-time resume — it reruns from scratch into a fresh dated dir,
src/utils/inference.py:17,48 — this is new design per SURVEY.md §4).

One JSONL record per completed input fragment:
    {fragment_id, status, rows_in, rows_out, model_version, output_uri,
     wall_s}
(wall_s = wall time of the chunk the fragment was processed in — the
per-partition metric the north rule names alongside lineage.)

Records are appended atomically (single write + flush of one line)
AFTER the fragment's output directory has been atomically renamed into
place, so a crash at any point leaves either no record (fragment will
be redone idempotently) or a complete one.
"""

from __future__ import annotations

import json
import os


class Manifest:
    def __init__(self, path: str):
        self.path = path

    def load(self) -> dict[str, dict]:
        records: dict[str, dict] = {}
        if os.path.exists(self.path):
            with open(self.path, encoding="utf-8") as f:
                for line in f:
                    line = line.strip()
                    if not line:
                        continue
                    rec = json.loads(line)
                    records[rec["fragment_id"]] = rec
        return records

    def done_fragments(self) -> set[str]:
        return {
            fid
            for fid, rec in self.load().items()
            if rec.get("status") == "done"
        }

    def append(self, records: list[dict]) -> None:
        os.makedirs(os.path.dirname(self.path) or ".", exist_ok=True)
        with open(self.path, "a", encoding="utf-8") as f:
            for rec in records:
                f.write(json.dumps(rec, sort_keys=True) + "\n")
            f.flush()
            os.fsync(f.fileno())
