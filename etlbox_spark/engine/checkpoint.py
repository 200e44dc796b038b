"""Checkpoint / lineage / metrics (M5, BASELINE.json:14).

A checkpoint is a single JSON file, atomically replaced after each epoch
commit, carrying per-epoch, per-bucket offsets (max event_seq + row
count), per-action row counts, and the snapshot version produced — the
"per-partition lineage + metrics enabling resumable replay". The lake's
``committed_epochs`` set is the source of truth for exactly-once; the
checkpoint is the fast-resume index + audit trail on top of it.
"""

from __future__ import annotations

import json
import os
import uuid
from typing import Any

from .merge import MergeResult


class Checkpoint:
    def __init__(self, path: str):
        self.path = path

    def load(self) -> dict[str, Any]:
        if not os.path.exists(self.path):
            return {"last_epoch": None, "epochs": {}}
        with open(self.path, encoding="utf-8") as f:
            return json.load(f)

    def last_epoch(self) -> int | None:
        return self.load()["last_epoch"]

    def record(self, result: MergeResult) -> None:
        state = self.load()
        state["epochs"][str(result.epoch_id)] = {
            "version": result.version,
            "skipped": result.skipped,
            "counts": result.counts,
            "changed_buckets": result.changed_buckets,
            "offsets": {str(k): v for k, v in result.offsets.items()},
        }
        prev = state["last_epoch"]
        state["last_epoch"] = result.epoch_id if prev is None else max(prev, result.epoch_id)
        os.makedirs(os.path.dirname(self.path) or ".", exist_ok=True)
        tmp = f"{self.path}.tmp.{uuid.uuid4().hex[:8]}"
        with open(tmp, "w", encoding="utf-8") as f:
            json.dump(state, f, sort_keys=True)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, self.path)
