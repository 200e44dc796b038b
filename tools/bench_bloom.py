#!/usr/bin/env python
"""Point-probe pruning micro-benchmark: per-delta-file Bloom filters
(write.bloom=delta, the default) vs min/max hash ranges alone
(write.bloom=none) on a MoR table with a deep delta backlog.

Why this is the scale lever: a MoR bucket accumulates one small delta
file per epoch between compactions. File-level min/max key-hash ranges
prune only near-single-key files — tens of uniformly-hashed keys span
nearly the whole 64-bit range — so without blooms a point probe reads
the bucket's ENTIRE backlog. The bloom is per-key membership: the probe
reads the base file plus only the delta files that can hold the key
(false positives ~1%). On a 100 TB table the backlog is thousands of
files; this fixture is sized so the effect is measurable on one box.

Usage: python tools/bench_bloom.py [base_rows] [epochs] [rows_per_epoch]
Writes BENCH_BLOOM.json at the repo root and prints the JSON.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SCRATCH = "/dev/shm/etlbox_bloom" if os.path.isdir("/dev/shm") else "/tmp/etlbox_bloom"


def main() -> None:
    base_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    rows_per_epoch = int(sys.argv[3]) if len(sys.argv) > 3 else 500
    n_buckets = 16
    n_probe_keys = 20
    reps = 5

    from pyspark.sql import functions as F

    from etlbox_spark.engine.lake import BUCKET_COL, MOR_OP_COL, LakeTable
    from etlbox_spark.functions.hashing import bucket_expr
    from etlbox_spark.session import get_spark
    from tests.conftest import REPO_FILES_SCHEMA

    spark = get_spark(
        "bench_bloom", master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]",
        shuffle_partitions=8,
    )
    shutil.rmtree(SCRATCH, ignore_errors=True)

    def rows_df(lo: int, hi: int, tag: str):
        # deterministic synthetic rows keyed (r{i%97}, p{i})
        return (
            spark.range(lo, hi)
            .select(
                F.concat(F.lit("r"), (F.col("id") % 97).cast("string")).alias("repo"),
                F.concat(F.lit("p"), F.col("id").cast("string")).alias("path"),
                F.lit("c0").alias("commit"),
                F.lit("py").alias("lang"),
                F.concat(F.lit(tag), F.col("id").cast("string")).alias("content"),
            )
            .withColumn(BUCKET_COL, bucket_expr(n_buckets, "repo", "path"))
        )

    result: dict[str, dict] = {}
    tables = {}
    for mode in ("delta", "none"):
        t = LakeTable.create(
            os.path.join(SCRATCH, mode), REPO_FILES_SCHEMA, ["repo", "path"],
            n_buckets, properties={"write.mode": "mor", "write.bloom": mode},
        )
        t.commit_buckets(rows_df(0, base_rows, "base"), list(range(n_buckets)), epoch_id=0)
        for e in range(epochs):
            # each epoch updates a disjoint slice of existing keys
            lo = (e * rows_per_epoch) % base_rows
            d = rows_df(lo, lo + rows_per_epoch, f"e{e}_").withColumn(
                MOR_OP_COL, F.lit("upsert")
            )
            bs = [r[0] for r in d.select(BUCKET_COL).distinct().collect()]
            t.commit_delta_buckets(d, bs, epoch_id=1 + e)
        tables[mode] = t

    # same probe keys for both tables: keys updated by scattered epochs
    probe = [("r" + str(i % 97), "p" + str(i)) for i in range(0, base_rows, base_rows // n_probe_keys)][:n_probe_keys]

    for mode, t in tables.items():
        m = t.manifest()
        deltas = [e for e in m.files if e.get("kind") == "delta"]
        # file-level pruning evidence, per single-key probe (median over keys)
        from etlbox_spark.functions.hashing import key_hash

        hs = [
            int(r[0])
            for r in spark.createDataFrame(probe, "repo string, path string")
            .select(key_hash("repo", "path"))
            .collect()
        ]
        kept_per_key = sorted(len(LakeTable._prune_by_khash(deltas, [h])) for h in hs)
        walls = []
        for _ in range(reps):
            t0 = time.monotonic()
            rows = t.lookup_keys(spark, probe).collect()
            walls.append(time.monotonic() - t0)
        assert len(rows) == len(probe), (mode, len(rows))
        result[mode] = {
            "delta_files_total": len(deltas),
            "delta_files_kept_per_single_key_median": kept_per_key[len(kept_per_key) // 2],
            "delta_files_kept_per_single_key_max": kept_per_key[-1],
            "lookup_wall_s_runs": [round(w, 3) for w in walls],
            "lookup_wall_s_median": round(sorted(walls)[len(walls) // 2], 3),
        }

    out = {
        "fixture": {
            "base_rows": base_rows, "epochs": epochs,
            "rows_per_epoch": rows_per_epoch, "n_buckets": n_buckets,
            "probe_keys": n_probe_keys, "reps": reps,
        },
        "bloom": result["delta"],
        "minmax_only": result["none"],
        "file_prune_ratio": round(
            result["none"]["delta_files_kept_per_single_key_median"]
            / max(1, result["delta"]["delta_files_kept_per_single_key_median"]),
            1,
        ),
        "wall_speedup": round(
            result["none"]["lookup_wall_s_median"]
            / max(1e-9, result["delta"]["lookup_wall_s_median"]),
            2,
        ),
    }
    print(json.dumps(out))
    with open(os.path.join(REPO, "BENCH_BLOOM.json"), "w", encoding="utf-8") as f:
        json.dump(out, f, indent=1)
    shutil.rmtree(SCRATCH, ignore_errors=True)


if __name__ == "__main__":
    main()
