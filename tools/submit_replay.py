#!/usr/bin/env python
"""spark-submit entrypoint for the binlog replay (BASELINE.json:6
"deployed via spark-submit --py-files on N and 4N executor clusters").

Cluster:
    zip -r etlbox_spark.zip etlbox_spark
    spark-submit --master <cluster> --py-files etlbox_spark.zip \
        tools/submit_replay.py --events /data/binlog --lake /data/lake \
        --create --mode delta --checkpoint /data/ckpt.json

Local (this sandbox):
    python tools/submit_replay.py --master 'local[32]' \
        --events /tmp/events --lake /tmp/lake --create

The job is restart-safe: re-submitting after any failure resumes from
the checkpoint, already-committed epochs no-op via the lake's epoch
markers, and the final table state converges to the same bytes
(per-row sha256(content) — see tests/test_replay_oracle.py).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import types as T


def repo_files_schema() -> T.StructType:
    return T.StructType(
        [
            T.StructField("repo", T.StringType(), False),
            T.StructField("path", T.StringType(), False),
            T.StructField("commit", T.StringType(), True),
            T.StructField("lang", T.StringType(), True),
            T.StructField("content", T.StringType(), True),
        ]
    )


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--events", required=True, help="binlog landing zone (epoch=N/ parquet dirs)")
    p.add_argument("--lake", required=True, help="lake table root")
    p.add_argument("--create", action="store_true", help="create the table if absent")
    p.add_argument("--mode", default="delta",
                   choices=["full", "delta", "no_deletions", "only_updates", "inserts_only"])
    p.add_argument("--checkpoint", default=None, help="engine checkpoint JSON path")
    p.add_argument("--delta-dir", default=None, help="where to write the change-delta log")
    p.add_argument("--buckets", type=int, default=256, help="key-hash bucket count for new tables")
    p.add_argument("--write-mode", default="cow", choices=["cow", "mor"],
                   help="new-table commit strategy: copy-on-write or merge-on-read")
    p.add_argument("--compact-after", type=int, default=0,
                   help="mor only: auto-compact a bucket once it holds this many delta files")
    p.add_argument("--key-cols", default="repo,path")
    p.add_argument("--seq-col", default="event_seq")
    p.add_argument("--op-col", default="op")
    p.add_argument("--compare-cols", default="commit,lang,content")
    p.add_argument("--streaming", action="store_true",
                   help="drain via Structured Streaming availableNow instead of the epoch loop")
    p.add_argument("--master", default=None, help="override master (local runs only; "
                   "under spark-submit leave unset)")
    args = p.parse_args(argv)

    from etlbox_spark.engine import Checkpoint, LakeTable, MergeMode, MergeSpec, replay
    from etlbox_spark.session import get_spark

    spark = get_spark("etlbox_spark_replay", master=args.master)

    key_cols = args.key_cols.split(",")
    spec = MergeSpec(
        key_cols=tuple(key_cols),
        seq_col=args.seq_col,
        op_col=args.op_col,
        compare_cols=tuple(args.compare_cols.split(",")),
    )
    mode = MergeMode(args.mode)

    lake = (
        LakeTable.create(args.lake, repo_files_schema(), key_cols, n_buckets=args.buckets,
                         properties={"write.mode": args.write_mode,
                                     **({"compact.max.deltas.per.bucket": args.compact_after}
                                        if args.compact_after else {})})
        if args.create and not LakeTable(args.lake).exists()
        else LakeTable.load(args.lake)
    )
    ckpt = Checkpoint(args.checkpoint) if args.checkpoint else None

    if args.streaming:
        from etlbox_spark.streaming.tail import tail_available_now

        events_schema = spark.read.parquet(args.events).schema
        tail_available_now(
            spark, lake, f"{args.events}/epoch=*", events_schema, spec, mode,
            stream_checkpoint_dir=f"{args.lake}/_stream_ckpt",
            engine_checkpoint=ckpt, delta_dir=args.delta_dir,
        )
        results = []
    else:
        results = replay(spark, lake, args.events, spec, mode,
                         delta_dir=args.delta_dir, checkpoint=ckpt)

    summary = {
        "epochs_applied": sum(1 for r in results if not r.skipped),
        "epochs_skipped": sum(1 for r in results if r.skipped),
        "final_version": lake.latest_version(),
        "final_rows": lake.row_count(),
        "counts": [
            {"epoch": r.epoch_id, **r.counts} for r in results if not r.skipped
        ],
    }
    print(json.dumps(summary))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
