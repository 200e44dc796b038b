#!/usr/bin/env python
"""Write-amplification study: copy-on-write vs merge-on-read commits.

The headline bench replays epochs that are ~20% of the whole stream —
there COW is fine (each bucket is mostly rewritten anyway). The regime
that matters at 10^10 events is the opposite: a SMALL epoch against a
BIG table, where COW rewrites multi-MB buckets to change a few rows.
This harness measures exactly that:

  1. seed both tables (cow + mor) with one large epoch;
  2. apply K small update epochs (M rows each, keys drawn from the
     table) to both;
  3. report per-epoch wall time and BYTES WRITTEN per epoch, plus the
     MOR compaction cost and post-compaction read parity.

Usage: python tools/bench_mor.py [seed_events] [k_epochs] [rows_per_epoch]
Writes BENCH_MOR.json and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql import types as T  # noqa: E402

from etlbox_spark.engine.gen import gen_events, write_events  # noqa: E402
from etlbox_spark.engine.lake import LakeTable  # noqa: E402
from etlbox_spark.engine.merge import apply_epoch  # noqa: E402
from etlbox_spark.engine.spec import MergeMode, MergeSpec  # noqa: E402
from etlbox_spark.session import get_spark  # noqa: E402

REPO_FILES_SCHEMA = T.StructType(
    [
        T.StructField("repo", T.StringType(), False),
        T.StructField("path", T.StringType(), False),
        T.StructField("commit", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("content", T.StringType(), True),
    ]
)

EVENTS_SCHEMA = T.StructType(
    [T.StructField("event_seq", T.LongType(), False), T.StructField("op", T.StringType(), False)]
    + list(REPO_FILES_SCHEMA.fields)
)


def _tree_bytes(root: str) -> int:
    total = 0
    for dirpath, _dirs, files in os.walk(root):
        for fn in files:
            total += os.path.getsize(os.path.join(dirpath, fn))
    return total


def main() -> None:
    seed_n = int(sys.argv[1]) if len(sys.argv) > 1 else 400_000
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    m = int(sys.argv[3]) if len(sys.argv) > 3 else 2_000
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
    spark = get_spark("bench_mor", master=f"local[{cpus}]", shuffle_partitions=cpus)
    spec = MergeSpec()

    work = tempfile.mkdtemp(prefix="bench_mor_", dir="/dev/shm" if os.path.isdir("/dev/shm") else None)
    try:
        ev_dir = os.path.join(work, "events")
        write_events(
            gen_events(spark, seed_n, n_repos=max(50, seed_n // 5_000),
                       paths_per_repo=500, epoch_size=seed_n, seed=42),
            ev_dir,
        )
        seed = spark.read.parquet(ev_dir)

        tables = {}
        for mode in ("cow", "mor"):
            t = LakeTable.create(
                os.path.join(work, mode), REPO_FILES_SCHEMA, ["repo", "path"],
                n_buckets=max(cpus, 32), properties={"write.mode": mode},
            )
            apply_epoch(spark, t, seed, spec, MergeMode.DELTA, 0)
            tables[mode] = t

        # deterministic small batches: the table's keys ordered by key,
        # a sliding window of M per epoch, content stamped per epoch
        keys = (
            tables["cow"].read(spark, with_bucket=False)
            .select("repo", "path").orderBy("repo", "path").limit(k * m).collect()
        )
        base_seq = seed_n + 1
        out: dict = {"seed_events": seed_n, "k_epochs": k, "rows_per_epoch": m,
                     "cpus": cpus, "modes": {}}
        for mode, t in tables.items():
            walls, bytes_w = [], []
            for i in range(k):
                batch_keys = keys[i * m:(i + 1) * m]
                rows = [
                    (base_seq + i * m + j, "update", r.repo, r.path,
                     f"c{i:03d}", "py", f"content-e{i}-{r.repo}/{r.path}")
                    for j, r in enumerate(batch_keys)
                ]
                df = spark.createDataFrame(rows, EVENTS_SCHEMA)
                b0 = _tree_bytes(t._data_dir)
                t0 = time.perf_counter()
                apply_epoch(spark, t, df, spec, MergeMode.DELTA, i + 1)
                walls.append(round(time.perf_counter() - t0, 3))
                bytes_w.append(_tree_bytes(t._data_dir) - b0)
            entry = {
                "epoch_wall_s": walls,
                "epoch_bytes_written": bytes_w,
                "total_wall_s": round(sum(walls), 3),
                "total_bytes_written": sum(bytes_w),
                "rows_changed_total": k * m,
            }
            if mode == "mor":
                t0 = time.perf_counter()
                stats = t.compact(spark)
                entry["compact_s"] = round(time.perf_counter() - t0, 3)
                entry["compact_stats"] = stats
            out["modes"][mode] = entry

        # parity: both tables identical after the same stream
        a = {(r.repo, r.path): r.content
             for r in tables["cow"].read(spark, with_bucket=False).collect()}
        b = {(r.repo, r.path): r.content
             for r in tables["mor"].read(spark, with_bucket=False).collect()}
        out["state_match"] = a == b
        cw, mw = out["modes"]["cow"], out["modes"]["mor"]
        out["write_amplification_cow_vs_mor"] = round(
            cw["total_bytes_written"] / max(mw["total_bytes_written"], 1), 2
        )
        with open("BENCH_MOR.json", "w") as f:
            json.dump(out, f, indent=1)
        print(json.dumps(out))
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
