#!/usr/bin/env python
"""Benchmark harness (SURVEY.md §6 / §7 M6) — the driver's feedback loop.

Runs two workloads on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON
line to stdout:

1. **Headline: CDC merge-apply replay** (the BASELINE.json metric).
   Generates the deterministic synthetic binlog (seed 42, zipf repo skew,
   duplicate delivery) scaled to SF — ``n_events = SF * 4*10^7`` — into a
   scratch dir once, then replays every epoch through the engine
   (LWW dedupe → bucket-pruned full-outer classify → commit → delta log)
   in DELTA (binlog) mode, **multiple rounds into fresh lakes** (VERDICT
   r02 #1: this host's memory-bus contention swings single-shot numbers
   by >2x, so the headline is the MEDIAN across rounds, and each round
   records /proc/stat steal + wall dispersion so a contaminated run
   SELF-FLAGS via ``contention_flags`` instead of silently mispricing
   the engine). Replay runs both commit strategies:
   copy-on-write (primary) and merge-on-read + periodic compaction
   (the design-scale write path, VERDICT r02 #7), reported separately.
   *Sustained* = last half of each round's epochs (JVM/codegen warm-up
   excluded) and INCLUDES compaction landing inside that window
   (ADVICE r02).
2. **Operator queries** from ``__spark_entry__.queries()`` — a
   representative subset covering joins, aggregation, windows, CDC
   classification, text dedup, and ANN. Each is materialized via the
   noop sink (full plan execution, no driver collect overhead).

Env knobs:
  SPARK_GRAFT_SF_DIR       input tables dir  (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS         local[] core count (default 32)
  SPARK_GRAFT_BENCH_QUERIES=0     merge-replay only (used by the
                                  local[8]-vs-local[32] scaling harness,
                                  tools/bench_scaling.py)
  SPARK_GRAFT_BENCH_EVENTS[_DIR]  event count / reuse a generated stream
  SPARK_GRAFT_BENCH_EPOCHS        epochs for the generated stream (default 5
                                  — r01/r02-comparable big-epoch protocol;
                                  see the epoch-count note in the code)
  SPARK_GRAFT_BENCH_ROUNDS        CoW replay rounds   (default 5, r04+)
  SPARK_GRAFT_BENCH_MOR_SMALL=0   skip the small-epoch/large-table MoR leg
  SPARK_GRAFT_BENCH_SMALL_*       small-epoch leg knobs (SEED/EPOCHS/ROWS)
  SPARK_GRAFT_BENCH_MOR_ROUNDS    MoR replay rounds   (default 2; 0 = off)
  SPARK_GRAFT_BENCH_WRITE_MODE    force primary mode  (default cow)
  SPARK_GRAFT_BENCH_COMPACT_EVERY MoR compaction period in epochs (default 4)
"""

from __future__ import annotations

import json
import os
import re
import shutil
import sys
import tempfile
import time

from pyspark.sql import types as T

# representative operator subset (full inventory is checked for
# correctness by tools/check_contract.py; bench times the headliners)
HEADLINE_QUERIES = [
    "q1_pricing_summary",
    "lookup",
    "aggregation",
    "top_k_per_group",
    "window_running",
    "windowed_counts",
    "session_windows",
    "dedupe_lww",
    "cdc_merge_full",
    "cdc_merge_delta",
    "dedup_exact",
    "dedup_minhash_lsh",
    "corpus_dedup_survivors",
    "ann_cosine_topk",
    "ann_ivf_topk",
    "token_count",
    "lang_id",
]

REPO_FILES_SCHEMA = T.StructType(
    [
        T.StructField("repo", T.StringType(), False),
        T.StructField("path", T.StringType(), False),
        T.StructField("commit", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("content", T.StringType(), True),
    ]
)


def _sf_of(sf_dir: str) -> float:
    m = re.search(r"sf([0-9.]+)", os.path.basename(os.path.normpath(sf_dir)))
    return float(m.group(1)) if m else 0.1


def _force(df) -> None:
    """Materialize the whole plan without driver-side row transfer."""
    df.write.format("noop").mode("overwrite").save()


def _cpu_times() -> tuple[int, int]:
    """(steal, total) jiffies — co-tenant CPU theft is this VM's dominant
    noise source (BENCH.md) and must be measured, not guessed."""
    with open("/proc/stat") as f:
        parts = f.readline().split()
    vals = [int(x) for x in parts[1:]]
    return (vals[7] if len(vals) > 7 else 0), sum(vals)


def _median(xs: list[float]) -> float:
    s = sorted(xs)
    mid = len(s) // 2
    return s[mid] if len(s) % 2 else (s[mid - 1] + s[mid]) / 2


def _dir_bytes(root: str) -> int:
    total = 0
    for dirpath, _dirs, files in os.walk(root):
        for fn in files:
            try:
                total += os.path.getsize(os.path.join(dirpath, fn))
            except OSError:
                pass
    return total


def _replay_round(
    spark, events_dir: str, per_epoch_rows: dict[int, int], n_buckets: int,
    write_mode: str, compact_every: int, work: str, tag: str,
) -> dict:
    """One full replay of all epochs into a FRESH lake; returns metrics.
    The lake + delta scratch are deleted before returning (bytes written
    are recorded first), so rounds never contend for page cache."""
    from etlbox_spark.engine.gen import list_epochs
    from etlbox_spark.engine.lake import LakeTable
    from etlbox_spark.engine.runner import replay
    from etlbox_spark.engine.spec import MergeMode, MergeSpec

    lake_root = os.path.join(work, f"lake_{tag}")
    delta_dir = os.path.join(work, f"delta_{tag}")
    lake = LakeTable.create(
        lake_root,
        schema=REPO_FILES_SCHEMA,
        key_cols=["repo", "path"],
        n_buckets=n_buckets,
        properties={"write.mode": write_mode},
    )
    spec = MergeSpec()  # (repo,path) keys, event_seq order, content compare
    epochs = list_epochs(events_dir)
    epoch_s: list[float] = []
    compact_s: list[float] = []
    actions: dict[str, int] = {}
    s0, t0 = _cpu_times()
    for i, ep in enumerate(epochs):
        t_ep = time.perf_counter()
        (res,) = replay(
            spark, lake, events_dir, spec, MergeMode.DELTA,
            delta_dir=delta_dir, epochs=[ep],
        )
        epoch_s.append(time.perf_counter() - t_ep)
        for k, v in res.counts.items():
            actions[k] = actions.get(k, 0) + v
        c = 0.0
        if compact_every and (i + 1) % compact_every == 0:
            t_c = time.perf_counter()
            lake.compact(spark)
            c = time.perf_counter() - t_c
        compact_s.append(c)
    s1, t1 = _cpu_times()

    wall = sum(epoch_s) + sum(compact_s)
    # sustained = steady state: the first half of the epochs carries
    # JVM/JIT/codegen warm-up that a long-running 10^10-event tail
    # amortizes to nothing; compaction triggered INSIDE the sustained
    # window is real steady-state cost and counts (ADVICE r02)
    h = max(1, len(epochs) // 2)
    sus_ev = sum(per_epoch_rows[e] for e in epochs[h:]) or sum(per_epoch_rows.values())
    sus_s = (sum(epoch_s[h:]) + sum(compact_s[h:])) or wall
    if any(e.get("kind") == "delta" for e in lake.manifest().files):
        final_rows = lake.read(spark).count()  # manifest stats overcount w/ live deltas
    else:
        final_rows = lake.row_count()
    out = {
        "wall_s": round(wall, 3),
        "sustained_events_per_sec": round(sus_ev / sus_s, 1),
        "epoch_s": [round(x, 3) for x in epoch_s],
        "compact_s": round(sum(compact_s), 3),
        "steal_pct": round(100.0 * (s1 - s0) / max(t1 - t0, 1), 2),
        "bytes_written": _dir_bytes(os.path.join(lake_root, "data")),
        "final_rows": final_rows,
        "actions": actions,
    }
    shutil.rmtree(lake_root, ignore_errors=True)
    shutil.rmtree(delta_dir, ignore_errors=True)
    return out


def _summarize(mode: str, rounds: list[dict], n_events: int, n_epochs: int) -> dict:
    walls = [r["wall_s"] for r in rounds]
    sus = [r["sustained_events_per_sec"] for r in rounds]
    steals = [r["steal_pct"] for r in rounds]
    flags = []
    if max(steals) > 1.0:
        flags.append(f"cpu steal up to {max(steals)}% — co-tenant contention")
    if len(walls) >= 2 and max(walls) / max(min(walls), 1e-9) > 1.3:
        flags.append(
            f"round wall dispersion {max(walls) / min(walls):.2f}x — host noise; trust medians"
        )
    return {
        "write_mode": mode,
        "n_events": n_events,
        "n_epochs": n_epochs,
        "rounds": len(rounds),
        "wall_s": _median(walls),
        "events_per_sec": round(n_events / _median(walls), 1),
        "sustained_events_per_sec": _median(sus),
        "wall_s_runs": walls,
        "sustained_runs": sus,
        "steal_pct_runs": steals,
        "compact_s_runs": [r["compact_s"] for r in rounds],
        "bytes_written_runs": [r["bytes_written"] for r in rounds],
        "epoch_s": rounds[-1]["epoch_s"],
        "final_rows": rounds[-1]["final_rows"],
        "actions": rounds[-1]["actions"],
        "contended": bool(flags),
        "contention_flags": flags,
    }


def bench_merge_replay(spark, sf: float, n_buckets: int, log) -> tuple[dict, dict | None]:
    from etlbox_spark.engine.gen import gen_events, write_events

    work = tempfile.mkdtemp(prefix="etlbox_bench_")
    try:
        events_dir = os.environ.get("SPARK_GRAFT_BENCH_EVENTS_DIR")
        if not events_dir:
            # 4e7 * SF (4M at sf0.1): epochs big enough that per-epoch
            # fixed costs (driver round-trips, commit protocol) amortize
            # the way they do at design scale
            n_events = int(os.environ.get("SPARK_GRAFT_BENCH_EVENTS", 0)) or max(
                int(sf * 40_000_000), 20_000
            )
            # Epoch count prices the per-commit fixed cost (each CoW epoch
            # rewrites its touched buckets): on the SAME 4.08M-event input
            # the identical engine measures ~35-39s at 5 epochs vs ~48-59s
            # at 8 (A/B-bisected against the r02 engine — both equal under
            # a fixed harness, so the gap is pure protocol). Default 5 =
            # r01/r02 continuity + the big-epoch regime a binlog tail
            # actually runs at design scale; cross-round medians (not more
            # epochs) supply the sample count. The 24M-event scaling study
            # keeps its 8-epoch protocol via SPARK_GRAFT_BENCH_EVENTS_DIR.
            n_bench_epochs = int(os.environ.get("SPARK_GRAFT_BENCH_EPOCHS", "5"))
            # keyspace scales with the stream so the op mix stays CDC-like
            events_dir = os.path.join(work, "events")
            ev = gen_events(
                spark,
                n_events,
                n_repos=max(50, n_events // 5_000),
                paths_per_repo=500,
                epoch_size=max(n_events // n_bench_epochs, 1),
                seed=42,
            )
            write_events(ev, events_dir)  # setup: binlog landing, untimed

        per_epoch_rows = {
            int(r[0]): int(r[1])
            for r in spark.read.parquet(events_dir).groupBy("epoch").count().collect()
        }
        n_events = sum(per_epoch_rows.values())  # delivered incl. dup re-delivery
        n_epochs = len(per_epoch_rows)

        primary_mode = os.environ.get("SPARK_GRAFT_BENCH_WRITE_MODE", "cow")
        compact_every = int(os.environ.get("SPARK_GRAFT_BENCH_COMPACT_EVERY", "4"))
        # 5 rounds (was 3): VERDICT r03 #5 — the r03 CoW median stood on 3
        # rounds with round 1 flagged contended; 5 rounds give a clean
        # median ± spread even when one round is stolen from
        rounds = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_ROUNDS", "5")))
        mor_rounds = int(os.environ.get("SPARK_GRAFT_BENCH_MOR_ROUNDS", "2"))

        def run_mode(mode: str, n_rounds: int) -> dict:
            ce = compact_every if mode == "mor" else 0
            rs = []
            for r in range(n_rounds):
                out = _replay_round(
                    spark, events_dir, per_epoch_rows, n_buckets, mode, ce, work,
                    f"{mode}{r}",
                )
                rs.append(out)
                log(
                    f"{mode} round {r}: {out['wall_s']:.1f}s wall, "
                    f"{out['sustained_events_per_sec']:,.0f} ev/s sustained, "
                    f"steal {out['steal_pct']}%"
                )
            return _summarize(mode, rs, n_events, n_epochs)

        primary = run_mode(primary_mode, rounds)
        log(
            f"merge replay [{primary_mode}]: median {primary['wall_s']:.1f}s"
            f" = {primary['events_per_sec']:,.0f} ev/s total, "
            f"{primary['sustained_events_per_sec']:,.0f} ev/s sustained over "
            f"{rounds} rounds; flags {primary['contention_flags'] or 'none'}"
        )
        mor = None
        if mor_rounds > 0 and primary_mode != "mor":
            mor = run_mode("mor", mor_rounds)
            cow_b = _median(primary["bytes_written_runs"])
            mor_b = _median(mor["bytes_written_runs"])
            mor["write_bytes_vs_cow"] = round(mor_b / max(cow_b, 1), 4)
            log(
                f"merge replay [mor+compact@{compact_every}]: median {mor['wall_s']:.1f}s, "
                f"{mor['sustained_events_per_sec']:,.0f} ev/s sustained; wrote "
                f"{mor_b / 1e6:,.0f} MB vs CoW {cow_b / 1e6:,.0f} MB "
                f"({mor['write_bytes_vs_cow']:.2f}x)"
            )
        return primary, mor
    finally:
        shutil.rmtree(work, ignore_errors=True)


def bench_mor_small_epochs(spark, cpus: int, log) -> dict:
    """VERDICT r03 #6: the small-epoch/LARGE-table regime — where MoR's
    write-amplification win actually lives. The headline replay's epochs
    touch ~20% of the table each (CoW rewrites those buckets anyway →
    bytes parity, write_bytes_vs_cow ≈ 1.1); a binlog tail at design
    scale instead lands TINY epochs on a big table, where CoW rewrites
    multi-MB buckets to change a few rows. Trimmed replica of
    tools/bench_mor.py (BENCH_MOR.json is the full study): seed both
    modes with one large epoch, apply K small update epochs to each,
    report bytes written + the amplification ratio + state parity.
    """
    from etlbox_spark.engine.gen import gen_events, write_events
    from etlbox_spark.engine.lake import LakeTable
    from etlbox_spark.engine.merge import apply_epoch
    from etlbox_spark.engine.spec import MergeMode, MergeSpec

    seed_n = int(os.environ.get("SPARK_GRAFT_BENCH_SMALL_SEED", "400000"))
    k = int(os.environ.get("SPARK_GRAFT_BENCH_SMALL_EPOCHS", "6"))
    m = int(os.environ.get("SPARK_GRAFT_BENCH_SMALL_ROWS", "2000"))
    spec = MergeSpec()
    ev_schema = T.StructType(
        [T.StructField("event_seq", T.LongType(), False),
         T.StructField("op", T.StringType(), False)]
        + list(REPO_FILES_SCHEMA.fields)
    )
    work = tempfile.mkdtemp(
        prefix="bench_small_", dir="/dev/shm" if os.path.isdir("/dev/shm") else None
    )
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
        keys = (
            tables["cow"].read(spark, with_bucket=False)
            .select("repo", "path").orderBy("repo", "path").limit(k * m).collect()
        )
        out: dict = {"seed_events": seed_n, "k_epochs": k, "rows_per_epoch": m,
                     "modes": {}}
        for mode, t in tables.items():
            walls, bytes_w = [], []
            for i in range(k):
                rows = [
                    (seed_n + 1 + i * m + j, "update", r.repo, r.path,
                     f"c{i:03d}", "py", f"content-e{i}-{r.repo}/{r.path}")
                    for j, r in enumerate(keys[i * m:(i + 1) * m])
                ]
                df = spark.createDataFrame(rows, ev_schema)
                b0 = _dir_bytes(t._data_dir)
                t0 = time.perf_counter()
                apply_epoch(spark, t, df, spec, MergeMode.DELTA, i + 1)
                walls.append(round(time.perf_counter() - t0, 3))
                bytes_w.append(_dir_bytes(t._data_dir) - b0)
            out["modes"][mode] = {
                "total_wall_s": round(sum(walls), 3),
                "total_bytes_written": sum(bytes_w),
            }
            if mode == "mor":
                t0 = time.perf_counter()
                t.compact(spark)
                out["modes"][mode]["compact_s"] = round(time.perf_counter() - t0, 3)
        a = {(r.repo, r.path): r.content
             for r in tables["cow"].read(spark, with_bucket=False).collect()}
        b = {(r.repo, r.path): r.content
             for r in tables["mor"].read(spark, with_bucket=False).collect()}
        out["state_match"] = a == b
        out["write_amplification_cow_vs_mor"] = round(
            out["modes"]["cow"]["total_bytes_written"]
            / max(out["modes"]["mor"]["total_bytes_written"], 1), 2
        )
        log(
            f"mor small-epoch regime: CoW wrote "
            f"{out['modes']['cow']['total_bytes_written'] / 1e6:,.0f} MB vs MoR "
            f"{out['modes']['mor']['total_bytes_written'] / 1e6:,.0f} MB "
            f"({out['write_amplification_cow_vs_mor']}x amplification), "
            f"state_match={out['state_match']}"
        )
        return out
    finally:
        shutil.rmtree(work, ignore_errors=True)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    run_queries = os.environ.get("SPARK_GRAFT_BENCH_QUERIES", "1") != "0"
    sf = _sf_of(sf_dir)

    def log(msg: str) -> None:
        print(f"[bench] {msg}", file=sys.stderr, flush=True)

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from etlbox_spark.session import get_spark

    spark = get_spark("etlbox_spark_bench", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warm-up

    queries_s: dict[str, float] = {}

    merge, mor = bench_merge_replay(spark, sf, n_buckets=max(cpus, 32), log=log)
    queries_s["merge_apply_replay"] = merge["wall_s"]
    if mor is not None:
        queries_s["merge_apply_mor"] = mor["wall_s"]

    if run_queries:
        import __spark_entry__ as entry_mod

        qs = entry_mod.queries()
        for name in HEADLINE_QUERIES:
            t0 = time.perf_counter()
            _force(qs[name](spark, sf_dir))
            dt = time.perf_counter() - t0
            queries_s[name] = round(dt, 3)
            log(f"{name:24s} {dt:7.2f}s")

    small = None
    if run_queries and os.environ.get("SPARK_GRAFT_BENCH_MOR_SMALL", "1") != "0":
        small = bench_mor_small_epochs(spark, cpus, log)
        queries_s["mor_small_epochs"] = round(
            small["modes"]["cow"]["total_wall_s"]
            + small["modes"]["mor"]["total_wall_s"]
            + small["modes"]["mor"].get("compact_s", 0.0), 3
        )

    total = round(sum(queries_s.values()), 3)
    # r04 adds suite entries (corpus_dedup_survivors, ann_ivf_topk,
    # mor_small_epochs) — `value` grows by construction, NOT by engine
    # regression. `value_r03_comparable` sums exactly the r03 suite so
    # cross-round comparison stays protocol-clean (CLAUDE.md: bisect
    # protocol before engine).
    r03_set = {
        "merge_apply_replay", "merge_apply_mor", "q1_pricing_summary", "lookup",
        "aggregation", "top_k_per_group", "window_running", "windowed_counts",
        "session_windows", "dedupe_lww", "cdc_merge_full", "cdc_merge_delta",
        "dedup_exact", "dedup_minhash_lsh", "ann_cosine_topk", "token_count",
        "lang_id",
    }
    out = {
        "metric": "headline suite wall time (CDC merge-apply replay + operator queries)",
        "value": total,
        "value_r03_comparable": round(
            sum(v for k, v in queries_s.items() if k in r03_set), 3
        ),
        "unit": "sec",
        "queries": queries_s,
        "sf": sf,
        "cpus": cpus,
        "merge_apply": merge,
    }
    if mor is not None:
        out["merge_apply_mor"] = mor
    if small is not None:
        out["mor_small_epochs"] = small
    print(json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
