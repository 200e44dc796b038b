#!/usr/bin/env python
"""Deep-audit scaling bench: sequential vs distributed footer scan.

``fsck(deep=True)`` opens one parquet footer per live file of the
latest snapshot — sequential on the driver that is O(#files) wall, the
audit's own version of the single-JSON-manifest bound the round-5
metadata layer removed. This bench builds a table whose latest snapshot
references N REAL parquet files (each with its own khash column, footer
stats and inline bloom, committed through the real CAS path) and times
the whole audit both ways:

* ``seq_s``  — ``fsck(deep=True)`` (driver-sequential footer reads)
* ``dist_s`` — ``fsck(deep=True, spark=...)`` (one mapInPandas job)

Both must agree on ok/errors/checked counts (asserted). Files are
small and page-cache-warm, so the numbers measure per-file OPEN+PARSE
and per-entry bloom work, not cold disk — the regime that favors the
sequential scan; the distributed win at 10k warm files is therefore a
LOWER bound on the win against real (cold, remote) storage.

Usage: python tools/bench_fsck.py [max_files] [files_per_commit]
Writes BENCH_FSCK.json (one JSON line) and prints it.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow as pa  # noqa: E402
import pyarrow.parquet as pq  # noqa: E402
from pyspark.sql import types as T  # noqa: E402

from etlbox_spark.engine.lake import (  # noqa: E402
    KHASH_COL,
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


def _make_file(root: str, commit_no: int, i: int) -> dict:
    """Write one REAL parquet data file with its own deterministic khash
    values; return the manifest entry (same shape _write_data emits,
    stats and bloom derived from the actual file contents)."""
    seed = (commit_no * 1_000_003 + i * 7919 + 1) & 0xFFFFFFFFFFFFFFFF
    hashes = [
        (((seed * 6364136223846793005 + j * 1442695040888963407) & 0xFFFFFFFFFFFFFFFF) - (1 << 63))
        for j in range(KEYS_PER_FILE)
    ]
    rel = f"data/d{commit_no}/bucket_p={i % N_BUCKETS}/part-{seed:016x}.parquet"
    abspath = os.path.join(root, rel)
    os.makedirs(os.path.dirname(abspath), exist_ok=True)
    tbl = pa.table(
        {
            "k": [f"k{seed:x}-{j}" for j in range(KEYS_PER_FILE)],
            "v": ["x" for _ in range(KEYS_PER_FILE)],
            KHASH_COL: pa.array(hashes, type=pa.int64()),
        }
    )
    pq.write_table(tbl, abspath)
    return {
        "path": rel,
        "bucket": i % N_BUCKETS,
        "rows": KEYS_PER_FILE,
        "schema_version": 1,
        "khash_min": min(hashes),
        "khash_max": max(hashes),
        "khash_bloom": _bloom_build(hashes),
        "kind": "delta",
    }


def main() -> None:
    max_files = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
    per_commit = int(sys.argv[2]) if len(sys.argv) > 2 else 250
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    root = "/tmp/etlbox_spark_bench_fsck"
    shutil.rmtree(root, ignore_errors=True)
    t = LakeTable.create(root, SCHEMA, ["k"], N_BUCKETS, properties={"write.mode": "mor"})

    from etlbox_spark.session import get_spark

    spark = get_spark(master=f"local[{cpus}]", shuffle_partitions=cpus)

    milestones = [m for m in (1_000, 5_000, 10_000, 25_000, 50_000) if m <= max_files]
    points = []
    n_files = 0
    epoch = 0
    for target in milestones:
        while n_files < target:
            entries = [_make_file(root, epoch, i) for i in range(per_commit)]
            m = t.manifest()
            t._publish_epoch_with_rebase(m, epoch, None, entries, None, "epoch-delta")
            epoch += 1
            n_files += per_commit
        # compact metadata so both modes pay the same (small) chain cost
        t.vacuum(keep_versions=2, grace_s=-1.0)

        # two timed runs per mode: the first distributed run at each new
        # scale carries JIT/codegen warm-up — report both, compare bests
        seq_runs, dist_runs = [], []
        for _ in range(2):
            t0 = time.perf_counter()
            seq = t.fsck(deep=True)
            seq_runs.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            dist = t.fsck(deep=True, spark=spark)
            dist_runs.append(time.perf_counter() - t0)
        assert seq["ok"] and dist["ok"], (seq["errors"][:3], dist["errors"][:3])
        assert seq["checked"] == dist["checked"], (seq["checked"], dist["checked"])
        assert seq["checked"]["footers"] >= n_files
        points.append(
            {
                "files": n_files,
                "seq_s": round(min(seq_runs), 2),
                "dist_s": round(min(dist_runs), 2),
                "seq_runs": [round(x, 2) for x in seq_runs],
                "dist_runs": [round(x, 2) for x in dist_runs],
                "speedup": round(min(seq_runs) / min(dist_runs), 2),
            }
        )
        print(f"  {points[-1]}", file=sys.stderr)

    out = {
        "metric": "deep fsck wall: sequential driver scan vs one mapInPandas job",
        "unit": "sec",
        "cpus": cpus,
        "keys_per_file": KEYS_PER_FILE,
        "points": points,
        "note": "files page-cache-warm; distributed speedup is a lower bound vs cold/remote storage",
    }
    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "BENCH_FSCK.json"), "w") as f:
        json.dump(out, f)
        f.write("\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
