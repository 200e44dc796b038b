"""Checkpoint record() latency vs epoch count (r05 continuation).

The legacy checkpoint rewrote + fsynced the ENTIRE per-epoch lineage
JSON on every record() — O(state size) per epoch, O(epochs²) over a
tail's lifetime. The bounded format appends one journal line and
rewrites only [lo, hi] runs + a KEEP_RECENT window, so record() is flat
in history length.

Pure Python (no Spark). For each history size N this seeds a checkpoint
with N epochs, then times SAMPLES further record() calls under (a) the
legacy algorithm (reproduced inline — full-state rewrite, exactly the
pre-r05-continuation code path) and (b) the bounded implementation.
Writes BENCH_CHECKPOINT.json. Scratch on /dev/shm.

Usage: python tools/bench_checkpoint.py [max_epochs] (default 100_000)
"""

import json
import os
import shutil
import sys
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etlbox_spark.engine.checkpoint import Checkpoint  # noqa: E402
from etlbox_spark.engine.merge import MergeResult  # noqa: E402

SCRATCH = "/dev/shm/bench_checkpoint"
SAMPLES = 50


def _res(ep: int) -> MergeResult:
    return MergeResult(
        epoch_id=ep,
        version=ep + 1,
        skipped=False,
        counts={"insert": 100, "update": 20, "delete": 3},
        changed_buckets=list(range(8)),
        offsets={b: {"max_seq": ep * 1000 + b, "rows": 12} for b in range(8)},
    )


def _legacy_record(path: str, result: MergeResult) -> None:
    """The pre-bounded algorithm, verbatim: load full state, add the
    entry, dump + fsync the whole thing."""
    if os.path.exists(path):
        with open(path, encoding="utf-8") as f:
            state = json.load(f)
    else:
        state = {"last_epoch": None, "epochs": {}}
    state["epochs"][str(result.epoch_id)] = {
        "version": result.version,
        "skipped": result.skipped,
        "counts": result.counts,
        "changed_buckets": result.changed_buckets,
        "offsets": {str(k): v for k, v in result.offsets.items()},
    }
    prev = state["last_epoch"]
    state["last_epoch"] = result.epoch_id if prev is None else max(prev, result.epoch_id)
    tmp = f"{path}.tmp.{uuid.uuid4().hex[:8]}"
    with open(tmp, "w", encoding="utf-8") as f:
        json.dump(state, f, sort_keys=True)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


def main() -> None:
    max_epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    shutil.rmtree(SCRATCH, ignore_errors=True)
    os.makedirs(SCRATCH)
    points = []
    for n in [s for s in (1_000, 10_000, max_epochs) if s <= max_epochs]:
        # seed legacy state at N epochs directly (replaying N legacy
        # record()s at 100k would itself take O(N^2) — the pathology)
        legacy_path = os.path.join(SCRATCH, f"legacy_{n}.json")
        state = {
            "last_epoch": n - 1,
            "epochs": {
                str(e): {
                    "version": e + 1,
                    "skipped": False,
                    "counts": {"insert": 100, "update": 20, "delete": 3},
                    "changed_buckets": list(range(8)),
                    "offsets": {str(b): {"max_seq": e * 1000 + b, "rows": 12} for b in range(8)},
                }
                for e in range(n)
            },
        }
        with open(legacy_path, "w") as f:
            json.dump(state, f, sort_keys=True)
        # fewer samples at large N: one legacy record() at 100k epochs is
        # seconds BY CONSTRUCTION (the pathology being measured)
        legacy_samples = max(5, min(SAMPLES, 500_000 // n))
        t0 = time.perf_counter()
        for ep in range(n, n + legacy_samples):
            _legacy_record(legacy_path, _res(ep))
        legacy_ms = (time.perf_counter() - t0) / legacy_samples * 1e3

        ck = Checkpoint(os.path.join(SCRATCH, f"bounded_{n}.json"))
        # seed the bounded checkpoint by replaying — O(1) per record
        for ep in range(n):
            ck.record(_res(ep))
        t0 = time.perf_counter()
        for ep in range(n, n + SAMPLES):
            ck.record(_res(ep))
        bounded_ms = (time.perf_counter() - t0) / SAMPLES * 1e3

        points.append(
            {
                "epochs": n,
                "legacy_record_ms": round(legacy_ms, 2),
                "bounded_record_ms": round(bounded_ms, 3),
                "legacy_state_bytes": os.path.getsize(legacy_path),
                "bounded_state_bytes": os.path.getsize(ck.path),
                "journal_bytes": os.path.getsize(ck.journal_path),
            }
        )
        print(json.dumps(points[-1]))

    last = points[-1]
    out = {
        "metric": "checkpoint_record_speedup_at_max_epochs",
        "value": round(last["legacy_record_ms"] / max(last["bounded_record_ms"], 1e-9), 1),
        "unit": "x",
        "samples_per_point": SAMPLES,
        "points": points,
    }
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "BENCH_CHECKPOINT.json"), "w") as f:
        f.write(json.dumps(out) + "\n")
    print(json.dumps(out))
    shutil.rmtree(SCRATCH, ignore_errors=True)


if __name__ == "__main__":
    main()
