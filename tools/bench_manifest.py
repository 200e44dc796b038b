"""Metadata-layer scaling bench (VERDICT r04 #1 'Done' criterion).

Proves commit + snapshot-read latency stays FLAT as the live file count
grows to 50k — the regime where the old single-JSON manifest (full file
list + inline blooms re-serialized per commit and per CAS retry) broke
first at 100x scale. Metadata-only by design: entries are fabricated
(path/bucket/rows/khash stats/bloom, exactly the dict shape
``_write_data`` emits) and pushed through the REAL commit path
(``_publish_epoch_with_rebase`` → delta record → CAS link), so the
numbers measure the manifest protocol, not parquet I/O.

Measured per milestone file count:
* ``commit_ms``      — one MoR delta commit (64 new files) end-to-end
* ``cold_read_ms``   — ``manifest()`` with the process cache cleared
                       (checkpoint parse + ≤interval record replays)
* ``warm_read_ms``   — ``manifest()`` cache hit (the per-epoch case)
* ``legacy_write_ms``— serializing the FULL state to JSON, i.e. what
                       every commit used to write (the r04 design)

Usage: python tools/bench_manifest.py [max_files] [files_per_commit]
Writes BENCH_MANIFEST.json (one JSON line) and prints it.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import types as T  # noqa: E402  (pure-Python, no JVM)

from etlbox_spark.engine.lake import (  # noqa: E402
    _MANIFEST_CACHE,
    _MANIFEST_CACHE_LOCK,
    LakeTable,
    _bloom_build,
)

SCHEMA = T.StructType(
    [
        T.StructField("k", T.StringType(), False),
        T.StructField("v", T.StringType(), True),
    ]
)
N_BUCKETS = 1024
KEYS_PER_FILE = 100


def _clear_cache() -> None:
    with _MANIFEST_CACHE_LOCK:
        _MANIFEST_CACHE.clear()


def _fake_entries(commit_no: int, n_files: int) -> list[dict]:
    """Entry dicts of exactly the shape _write_data returns, with
    deterministic khash stats + a real (deterministically built) bloom —
    so legacy full-state serialization pays the same bloom bytes the old
    format did."""
    out = []
    for i in range(n_files):
        seed = (commit_no * 1_000_003 + i) & 0xFFFFFFFFFFFFFFFF
        hashes = [
            (seed * 6364136223846793005 + j * 1442695040888963407)
            & 0xFFFFFFFFFFFFFFFF
            for j in range(KEYS_PER_FILE)
        ]
        out.append(
            {
                "path": f"data/d{commit_no}-e{commit_no}/bucket_p={i % N_BUCKETS}/part-{seed:016x}.parquet",
                "bucket": i % N_BUCKETS,
                "rows": KEYS_PER_FILE,
                "schema_version": 1,
                "khash_min": min(hashes) - (1 << 63),
                "khash_max": max(hashes) - (1 << 63),
                "khash_bloom": _bloom_build(hashes),
                "kind": "delta",
            }
        )
    return out


def _commit(t: LakeTable, epoch: int, entries: list[dict]) -> float:
    m = t.manifest()
    t0 = time.perf_counter()
    t._publish_epoch_with_rebase(m, epoch, None, entries, None, "epoch-delta")
    return (time.perf_counter() - t0) * 1e3


def main() -> None:
    max_files = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    per_commit = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    root = "/tmp/etlbox_spark_bench_manifest"
    shutil.rmtree(root, ignore_errors=True)
    t = LakeTable.create(root, SCHEMA, ["k"], N_BUCKETS, properties={"write.mode": "mor"})

    milestones = [m for m in (1_000, 5_000, 10_000, 25_000, 50_000) if m <= max_files]
    points = []
    n_files = 0
    epoch = 0
    for target in milestones:
        while n_files + per_commit <= target:
            _commit(t, epoch, _fake_entries(epoch, per_commit))
            epoch += 1
            n_files += per_commit
        commit_times = []
        for _ in range(5):
            commit_times.append(_commit(t, epoch, _fake_entries(epoch, per_commit)))
            epoch += 1
            n_files += per_commit
        m = t.manifest()
        _clear_cache()
        t0 = time.perf_counter()
        cold = t.manifest()
        cold_ms = (time.perf_counter() - t0) * 1e3
        assert len(cold.files) == len(m.files) == n_files, (len(cold.files), n_files)
        t0 = time.perf_counter()
        t.manifest()
        warm_ms = (time.perf_counter() - t0) * 1e3
        t0 = time.perf_counter()
        payload = m.to_json()  # the old format's per-commit write
        legacy_ms = (time.perf_counter() - t0) * 1e3
        rec_size = os.path.getsize(t._vpath(t.latest_version()))
        points.append(
            {
                "files": n_files,
                "commit_ms": round(statistics.median(commit_times), 2),
                "cold_read_ms": round(cold_ms, 2),
                "warm_read_ms": round(warm_ms, 4),
                "legacy_write_ms": round(legacy_ms, 2),
                "record_bytes": rec_size,
                "legacy_bytes": len(payload),
            }
        )
    first, last = points[0], points[-1]
    out = {
        "metric": "manifest_commit_ms_median",
        "value": last["commit_ms"],
        "unit": "ms",
        "n_buckets": N_BUCKETS,
        "files_per_commit": per_commit,
        "points": points,
        "commit_flatness_last_vs_first": round(
            last["commit_ms"] / max(first["commit_ms"], 1e-9), 2
        ),
        "legacy_write_ratio_at_max": round(
            last["legacy_write_ms"] / max(last["commit_ms"], 1e-9), 2
        ),
    }
    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "BENCH_MANIFEST.json"), "w") as f:
        f.write(json.dumps(out) + "\n")
    print(json.dumps(out))
    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
