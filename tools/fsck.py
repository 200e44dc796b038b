"""CLI table audit: ``python tools/fsck.py <table_root> [--deep]``.

Prints the fsck report as JSON; exit code 0 when the table is
consistent, 1 when errors were found (warnings/orphans don't fail).
See etlbox_spark/engine/fsck.py for the checks.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etlbox_spark.engine.lake import LakeTable  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("root", help="lake table root directory")
    ap.add_argument(
        "--deep",
        action="store_true",
        help="also open parquet footers of the latest snapshot "
        "(rows/stats/bloom cross-checks; O(#files) footer reads)",
    )
    ap.add_argument(
        "--delta-dir",
        default=None,
        help="change-log directory to audit against the lake's commit "
        "state (epoch-dir/marker agreement, maintenance sets)",
    )
    ap.add_argument(
        "--spark",
        action="store_true",
        help="with --deep: distribute the footer scan as one Spark job "
        "(local[*]) instead of sequential driver reads",
    )
    args = ap.parse_args()
    spark = None
    if args.spark and args.deep:
        from etlbox_spark.session import get_spark

        spark = get_spark(master="local[*]")
    report = LakeTable.load(args.root).fsck(
        deep=args.deep, delta_dir=args.delta_dir, spark=spark
    )
    print(json.dumps(report, indent=1, sort_keys=True))
    return 0 if report["ok"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
