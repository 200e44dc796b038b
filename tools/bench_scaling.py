#!/usr/bin/env python
"""Scaling-efficiency evidence harness (BASELINE.json north_rule).

The rule requires throughput scaling efficiency >= 0.8 between N and 4N
executors. No real cluster exists in this sandbox, so (per the driver's
protocol, BASELINE.md) we run the SAME merge-apply replay on the SAME
pre-generated binlog at two parallelism levels — local[8] and local[32]
— in fresh JVMs, and report sustained events/sec at both plus

    efficiency = (throughput_32 / throughput_8) / 4

Methodology notes (why this is a fair proxy):
* Events are generated ONCE (deterministic seed) and reused by both
  runs; the 125 GB page cache holds the input for both, so neither run
  pays cold I/O the other doesn't.
* Each measurement is a fresh ``python bench.py`` subprocess (fresh
  JVM); *sustained* throughput excludes epoch 0, which carries JVM +
  whole-stage-codegen warm-up that a long-running 10^10-event tail
  never sees.
* Epochs are large (millions of events) so per-epoch fixed costs
  (driver round-trips, commit protocol, stage scheduling) amortize the
  way they would at design scale.

Usage: python tools/bench_scaling.py [n_events] [n_epochs]
Writes BENCH.md at the repo root and prints the JSON result.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
# tmpfs scratch: on a real cluster every node brings its own disks, so
# storage bandwidth scales with cluster size; a single box's one disk
# does not. RAM-backed scratch is the honest single-box analog (and the
# input fits the page cache for both runs either way).
_DEFAULT_SCRATCH = "/dev/shm/etlbox_scaling" if os.path.isdir("/dev/shm") else "/tmp/etlbox_scaling"
SCRATCH = os.environ.get("SPARK_GRAFT_SCALING_DIR", _DEFAULT_SCRATCH)


def run(cmd: list[str], env: dict[str, str]) -> str:
    print(f"[scaling] $ {' '.join(cmd)} (cpus={env.get('SPARK_GRAFT_CPUS')})",
          file=sys.stderr, flush=True)
    p = subprocess.run(cmd, cwd=REPO, env=env, stdout=subprocess.PIPE, text=True)
    if p.returncode != 0:
        raise RuntimeError(f"{cmd} failed rc={p.returncode}")
    lines = p.stdout.strip().splitlines()
    return lines[-1] if lines else ""


def main() -> None:
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 24_000_000
    n_epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    n_small = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    n_big = int(sys.argv[4]) if len(sys.argv) > 4 else 4 * (int(sys.argv[3]) if len(sys.argv) > 3 else 8)
    events_dir = os.path.join(SCRATCH, f"events_{n_events}_{n_epochs}")

    base_env = {k: v for k, v in os.environ.items()}
    base_env["PYTHONPATH"] = REPO
    # scratch + shuffle dirs on the same RAM-backed storage as the input,
    # and a heap big enough that 32 concurrent tasks never GC-thrash
    base_env.setdefault("TMPDIR", os.path.dirname(SCRATCH) or "/tmp")
    base_env.setdefault("SPARK_LOCAL_DIRS", base_env["TMPDIR"])
    base_env.setdefault("SPARK_GRAFT_DRIVER_MEM", "64g")

    if not os.path.isdir(events_dir):
        shutil.rmtree(SCRATCH, ignore_errors=True)
        gen_code = (
            "import sys; sys.path.insert(0, %r);"
            "from etlbox_spark.session import get_spark;"
            "from etlbox_spark.engine.gen import gen_events, write_events;"
            "s = get_spark('gen', master='local[32]', shuffle_partitions=32);"
            "write_events(gen_events(s, %d, n_repos=%d, paths_per_repo=500,"
            " epoch_size=%d, seed=42), %r); s.stop()"
            % (REPO, n_events, max(50, n_events // 5_000),
               n_events // n_epochs, events_dir)
        )
        run([sys.executable, "-c", gen_code], base_env)

    n_rounds = int(sys.argv[5]) if len(sys.argv) > 5 else 1

    def cpu_times() -> tuple[int, int]:
        """(steal, total) jiffies from /proc/stat — co-tenant CPU theft
        is the dominant noise source on this VM and must be MEASURED,
        not guessed, to justify excluding a contaminated leg."""
        with open("/proc/stat") as f:
            parts = f.readline().split()
        vals = [int(x) for x in parts[1:]]
        steal = vals[7] if len(vals) > 7 else 0
        return steal, sum(vals)

    def leg(cpus: int) -> dict:
        env = dict(base_env)
        env.update(
            SPARK_GRAFT_CPUS=str(cpus),
            SPARK_GRAFT_BENCH_QUERIES="0",
            SPARK_GRAFT_BENCH_EVENTS_DIR=events_dir,
            # this harness does its own round alternation + medians; one
            # replay per leg keeps the legs short so co-tenant noise is
            # less likely to span a whole small/big pair
            SPARK_GRAFT_BENCH_ROUNDS="1",
            SPARK_GRAFT_BENCH_MOR_ROUNDS="0",
        )
        s0, t0 = cpu_times()
        out = json.loads(run([sys.executable, "bench.py"], env))["merge_apply"]
        s1, t1 = cpu_times()
        out["steal_pct"] = round(100.0 * (s1 - s0) / max(t1 - t0, 1), 2)
        print(f"[scaling] local[{cpus}]: {out['sustained_events_per_sec']:,.0f}"
              f" ev/s sustained ({out['events_per_sec']:,.0f} total), "
              f"steal {out['steal_pct']}%",
              file=sys.stderr, flush=True)
        return out

    # alternating legs, fresh JVM each, same pre-generated input; medians
    # across rounds defend the margin against per-leg noise (r01's three
    # rounds scored 0.837/0.869/0.63 — single runs are not trustworthy)
    small_runs, big_runs, steals, last = [], [], [], None
    for _ in range(n_rounds):
        last = {n_small: leg(n_small), n_big: leg(n_big)}
        small_runs.append(last[n_small]["sustained_events_per_sec"])
        big_runs.append(last[n_big]["sustained_events_per_sec"])
        steals.append([last[n_small]["steal_pct"], last[n_big]["steal_pct"]])

    def median(xs: list[float]) -> float:
        s = sorted(xs)
        mid = len(s) // 2
        return s[mid] if len(s) % 2 else (s[mid - 1] + s[mid]) / 2

    ts, tb = median(small_runs), median(big_runs)
    ratio = n_big / n_small
    eff = (tb / ts) / ratio
    summary = {
        "n_events": last[n_big]["n_events"],
        "n_epochs": n_epochs,
        "pair": [n_small, n_big],
        "rounds": n_rounds,
        "protocol": "alternating legs, fresh JVM each, same pre-generated input",
        f"local{n_small}_events_per_sec_runs": small_runs,
        f"local{n_big}_events_per_sec_runs": big_runs,
        f"local{n_small}_median": ts,
        f"local{n_big}_median": tb,
        "steal_pct_per_round": steals,
        "per_round_efficiency": [
            round((b / s) / ratio, 3) for s, b in zip(small_runs, big_runs)
        ],
        "speedup": round(tb / ts, 3),
        "scaling_efficiency": round(eff, 3),
        "target": 0.8,
        "pass": eff >= 0.8,
        "detail": last,
    }
    print(json.dumps(summary))
    out_json = os.path.join(REPO, f"BENCH_SCALING_{n_small}_{n_big}.json")
    with open(out_json, "w", encoding="utf-8") as f:
        json.dump(summary, f, indent=1)
    print(f"[scaling] wrote {out_json} (efficiency={eff:.3f}; "
          f"see BENCH.md for the consolidated report)", file=sys.stderr)


if __name__ == "__main__":
    main()
