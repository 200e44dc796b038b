"""Change-feed planning latency vs epoch count (r05 continuation).

`read_changes` groups epochs into schema generations before reading, so
its planning cost is one schema probe per epoch in the range. The legacy
probe was `spark.read.parquet(dir).schema` — a full file-source
inference (~50-100 ms driver wall each), which made a full-history
replay of a 10^5-epoch log spend HOURS planning before reading a row.
The probe now reads Spark's own schema JSON from one parquet footer per
dir (~0.2 ms, no Spark job) and fans out as one Arrow-batched Spark job
past the measured ~16k-dir crossover (`merge._probe_dir_schemas` /
`_PROBE_DISTRIBUTE_THRESHOLD` — the fan-out is a flat ~2.5-3 s job, so
the driver loop wins below that).

This bench builds a synthetic committed change log (one template epoch
dir written by Spark with the real change-row schema, copied N times —
identical bytes are fine: planning cost depends only on dir count) and
measures, at each N:

* legacy per-dir `spark.read` probe (measured on a 128-dir sample,
  reported per-dir and extrapolated to N — running it at full N at
  10^4+ would take minutes by construction);
* the new driver-side footer probe, full N;
* the new distributed probe, full N (threshold forced to 0);
* end-to-end `read_changes` plan+collect over the full history.

Writes BENCH_LOG_TAIL.json (one JSON object). Not part of bench.py's
frozen subtotal — a tools/ study like bench_manifest/bench_fsck.

Usage: python tools/bench_log_tail.py [max_epochs] (default 8192)
"""

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etlbox_spark.engine import merge  # noqa: E402
from etlbox_spark.session import get_spark  # noqa: E402

SCRATCH = "/dev/shm/bench_log_tail"
LEGACY_SAMPLE = 128


def build_log(spark, root: str, n_epochs: int) -> None:
    os.makedirs(root, exist_ok=True)
    template = os.path.join(root, "epoch=0")
    if not os.path.isdir(template):
        df = spark.createDataFrame(
            [("r0", f"f{i}.py", "c0", "python", "print(1)", 3, 100 + i, "insert") for i in range(64)],
            "repo string, path string, commit string, lang string, content string, "
            "bucket int, seq long, action string",
        )
        df.coalesce(1).write.mode("overwrite").parquet(template)
    have = sum(1 for n in os.listdir(root) if n.startswith("epoch="))
    for e in range(have, n_epochs):
        shutil.copytree(template, os.path.join(root, f"epoch={e}"))


def main() -> None:
    max_epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        app_name="bench_log_tail", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    shutil.rmtree(SCRATCH, ignore_errors=True)
    points = []
    sizes = [n for n in (512, 2048, max_epochs) if n <= max_epochs]
    for n in sizes:
        root = os.path.join(SCRATCH, "log")
        build_log(spark, root, n)
        dirs = [os.path.join(root, f"epoch={e}") for e in range(n)]

        t0 = time.perf_counter()
        for d in dirs[:LEGACY_SAMPLE]:
            spark.read.parquet(d).schema  # noqa: B018 — the probe IS the work
        legacy_per_dir_ms = (time.perf_counter() - t0) / LEGACY_SAMPLE * 1e3

        t0 = time.perf_counter()
        schemas = [merge._dir_schema_json(d) for d in dirs]
        driver_probe_s = time.perf_counter() - t0
        assert all(s is not None for s in schemas)

        t0 = time.perf_counter()
        dist = merge._probe_dirs_distributed(spark, dirs)
        distributed_probe_s = time.perf_counter() - t0
        assert dist == schemas

        # noop sink, not count(): count() lets Catalyst prune the
        # payload columns out of the scan (CLAUDE.md gotcha) — the
        # full-history figure must price the actual read
        t0 = time.perf_counter()
        merge.read_changes(spark, root).write.format("noop").mode("overwrite").save()
        read_changes_s = time.perf_counter() - t0
        assert merge.read_changes(spark, root).count() == n * 64  # untimed

        points.append(
            {
                "epochs": n,
                "legacy_probe_ms_per_dir": round(legacy_per_dir_ms, 2),
                "legacy_probe_extrapolated_s": round(legacy_per_dir_ms * n / 1e3, 1),
                "driver_probe_s": round(driver_probe_s, 3),
                "distributed_probe_s": round(distributed_probe_s, 3),
                "read_changes_full_history_s": round(read_changes_s, 2),
            }
        )
        print(json.dumps(points[-1]))

    last = points[-1]
    out = {
        "metric": "change_feed_planning_speedup_at_max_epochs",
        "value": round(
            last["legacy_probe_extrapolated_s"] / max(last["driver_probe_s"], 1e-9), 1
        ),
        "unit": "x",
        "points": points,
    }
    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "BENCH_LOG_TAIL.json"), "w") as f:
        f.write(json.dumps(out) + "\n")
    print(json.dumps(out))
    shutil.rmtree(SCRATCH, ignore_errors=True)


if __name__ == "__main__":
    main()
