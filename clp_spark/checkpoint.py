"""Per-partition checkpointing, lineage and metrics — resumable compress.

The reference tracks compression jobs/tasks in a MySQL job table and
commits archives atomically per task
(job_orchestration/scheduler/compress/compression_scheduler.py;
streaming_archive metadata commits). Our Spark equivalent: input rows
hash into `num_checkpoint_buckets` url-buckets; each bucket's parse
output commits atomically (parquet dir write + manifest record written
only after success). A re-run skips committed buckets — per-sink counts
are exactly-once under kill/retry because downstream stages read only
committed bucket outputs and are deterministic given them.

The manifest doubles as lineage + metrics: one JSON line per
(run_id, phase, bucket) with rows/bytes/wall_ms.
"""

from __future__ import annotations

import json
import os
import time
import uuid


class RunManifest:
    def __init__(self, out_dir: str):
        self.out_dir = out_dir
        self.path = os.path.join(out_dir, "_manifest.jsonl")
        os.makedirs(out_dir, exist_ok=True)

    def committed(self, phase: str) -> set:
        """Bucket keys already committed for a phase."""
        done = set()
        if os.path.exists(self.path):
            with open(self.path) as f:
                for line in f:
                    rec = json.loads(line)
                    if rec["phase"] == phase and rec.get("committed"):
                        done.add(rec["bucket"])
        return done

    def commit(self, phase: str, bucket, run_id: str, **metrics) -> None:
        rec = {
            "run_id": run_id,
            "phase": phase,
            "bucket": bucket,
            "committed": True,
            "ts": time.time(),
            **metrics,
        }
        # single-writer append; on a cluster this would be an Iceberg
        # snapshot commit / a driver-side metadata table append
        with open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")
            f.flush()
            os.fsync(f.fileno())

    @staticmethod
    def new_run_id() -> str:
        return uuid.uuid4().hex[:12]

    def records(self) -> list[dict]:
        if not os.path.exists(self.path):
            return []
        with open(self.path) as f:
            return [json.loads(line) for line in f]
