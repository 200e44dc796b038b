"""Watermarked windows + stateful sessionization (streaming/windows.py).

Strategy: a hand-built event set with known session/window structure is
written as individual parquet files with increasing mtimes, so the file
stream source (maxFilesPerTrigger=1) replays them as ordered
micro-batches. Batch-mode runs of the SAME expressions are the oracle:
the streaming results must converge to them as sentinel events advance
the watermark. The trailing sentinel sessions staying open (and only
flushing via event-time timeout) is asserted, not worked around — that
is the unbounded-stream contract.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from etlbox_spark.streaming.windows import (
    run_to_parquet_available_now,
    session_windows,
    stateful_sessionize,
    windowed_counts,
)

BASE = 1_609_459_200  # 2021-01-01 UTC
GAP_S = 1800
# (repo, offset_s): sessions at gap=1800 -> A: (0..1200, 3ev) (5000..5600,
# 2ev) (10000, 1ev); B: three single-event sessions
REAL = [
    ("repo_a", 0), ("repo_a", 600), ("repo_a", 1200),
    ("repo_a", 5000), ("repo_a", 5600), ("repo_a", 10000),
    ("repo_b", 0), ("repo_b", 4000), ("repo_b", 8000),
]
SENTINEL_1 = 100_000  # closes every real session by gap
FILES = [REAL[0:3], REAL[3:6], REAL[6:9], [("repo_a", SENTINEL_1), ("repo_b", SENTINEL_1)]]


def _write_file(path: str, rows: list[tuple[str, int]], mtime: int) -> None:
    table = pa.table(
        {
            # tz-aware: Spark reads bare timestamp("us") as TIMESTAMP_NTZ,
            # which withWatermark rejects (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE)
            "ts": pa.array(
                [(BASE + off) * 1_000_000 for _, off in rows],
                pa.timestamp("us", tz="UTC"),
            ),
            "repo": pa.array([r for r, _ in rows], pa.string()),
            "path": pa.array([f"p{off % 3}" for _, off in rows], pa.string()),
            "op": pa.array(["delete" if off == 1200 else "insert" for _, off in rows]),
        }
    )
    pq.write_table(table, path)
    os.utime(path, (mtime, mtime))


def _populate(d: str) -> str:
    for i, rows in enumerate(FILES):
        _write_file(os.path.join(d, f"f{i}.parquet"), rows, 1_700_000_000 + i * 10)
    return d


@pytest.fixture(scope="module")
def stream_dir(tmp_path_factory):
    """Read-only copy for the batch-mode tests."""
    return _populate(str(tmp_path_factory.mktemp("win_events")))


@pytest.fixture()
def own_stream(spark, tmp_path):
    """Fresh event dir per streaming test (tests append sentinel files,
    which must not leak into each other's source listings)."""
    d = str(tmp_path / "events")
    os.makedirs(d, exist_ok=True)
    _populate(d)
    schema = spark.read.parquet(d).schema

    def _mk(extra_files: dict[str, list[tuple[str, int]]] | None = None, mtime0: int = 0):
        for j, (name, rows) in enumerate((extra_files or {}).items()):
            _write_file(os.path.join(d, name), rows, mtime0 + j)
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(d)
        )

    _mk.events_dir = d
    return _mk


def _batch_real(spark, stream_dir):
    df = spark.read.parquet(stream_dir)
    return df.filter(F.col("ts") < F.timestamp_seconds(F.lit(BASE + SENTINEL_1)))


def test_windowed_counts_batch(spark, stream_dir):
    rows = {
        (r["window_start"].timestamp(), r["repo"]): (r["n_events"], r["n_deletes"])
        for r in windowed_counts(_batch_real(spark, stream_dir), watermark=None).collect()
    }
    assert rows[(float(BASE + 0), "repo_a")] == (1, 0)
    assert rows[(float(BASE + 1200), "repo_a")] == (1, 1)  # the op=delete event
    assert rows[(float(BASE + 4800), "repo_a")] == (1, 0)  # ts=5000
    assert rows[(float(BASE + 5400), "repo_a")] == (1, 0)  # ts=5600
    assert sum(n for n, _ in rows.values()) == len(REAL)


def test_windowed_counts_stream_converges_to_batch(spark, stream_dir, own_stream, tmp_path):
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    def drain(extra=None, mtime0=0):
        stream = own_stream(extra, mtime0)
        run_to_parquet_available_now(
            windowed_counts(stream, window_duration="10 minutes", watermark="30 minutes"),
            out, ckpt,
        )

    drain()
    # append mode: a window emits only once the watermark passes its end,
    # and emission happens on a LATER batch — two more sentinel files
    # push the watermark far past every real window
    drain({"g0.parquet": [("repo_a", 200_000)]}, 1_700_001_000)
    drain({"g1.parquet": [("repo_a", 300_000)]}, 1_700_002_000)

    got = {
        (r["window_start"], r["repo"]): (r["n_events"], r["n_deletes"])
        for r in spark.read.parquet(out).collect()
        # real windows only: the sentinel's own window starts at 99600
        if r["window_start"].timestamp() < BASE + 50_000
    }
    want = {
        (r["window_start"], r["repo"]): (r["n_events"], r["n_deletes"])
        for r in windowed_counts(_batch_real(spark, stream_dir), watermark=None).collect()
    }
    assert got == want
    # exactly-once per window within the run: no duplicate appends
    n_out = spark.read.parquet(out).count()
    assert n_out == len(set(
        (r["window_start"], r["repo"]) for r in spark.read.parquet(out).collect()
    ))


def test_session_windows_batch(spark, stream_dir):
    got = {
        (r["repo"], r["session_start"].timestamp() - BASE): r["n_events"]
        for r in session_windows(_batch_real(spark, stream_dir), gap="30 minutes").collect()
    }
    assert got == {
        ("repo_a", 0.0): 3, ("repo_a", 5000.0): 2, ("repo_a", 10000.0): 1,
        ("repo_b", 0.0): 1, ("repo_b", 4000.0): 1, ("repo_b", 8000.0): 1,
    }


def test_stateful_sessionize_stream(spark, stream_dir, own_stream, tmp_path):
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    def drain(extra=None, mtime0=0):
        stream = own_stream(extra, mtime0)
        run_to_parquet_available_now(
            stateful_sessionize(stream, gap_seconds=GAP_S, watermark="30 minutes"),
            out, ckpt,
        )

    # drain 1: f0..f3 as four micro-batches — sessions span batches (A's
    # first session spans f0/f1), so state carry-over is exercised; the
    # sentinel closes every real session BY GAP within the run
    drain()
    got = {
        (r["repo"], r["session_start"].timestamp() - BASE): (
            r["session_last"].timestamp() - BASE, r["n_events"])
        for r in spark.read.parquet(out).collect()
    }
    assert got == {
        ("repo_a", 0.0): (1200.0, 3), ("repo_a", 5000.0): (5600.0, 2),
        ("repo_a", 10000.0): (10000.0, 1),
        ("repo_b", 0.0): (0.0, 1), ("repo_b", 4000.0): (4000.0, 1),
        ("repo_b", 8000.0): (8000.0, 1),
    }, "closed sessions must match the batch session_window oracle"

    # the sentinel sessions are still OPEN (nothing later arrived): only
    # repo_a gets more data below; repo_b's must flush via event-time
    # TIMEOUT once the watermark passes last+gap
    drain({"g0.parquet": [("repo_a", 200_000)]}, 1_700_001_000)
    # watermark after g0 = 200000-1800; next batch fires B's timeout
    drain({"g1.parquet": [("repo_a", 300_000)]}, 1_700_002_000)

    got2 = {
        (r["repo"], r["session_start"].timestamp() - BASE)
        for r in spark.read.parquet(out).collect()
    }
    assert ("repo_b", float(SENTINEL_1)) in got2, "idle key must flush via timeout"
    assert ("repo_a", float(SENTINEL_1)) in got2  # closed by gap vs ts=200000
    # the closed-session multiset agrees with the declarative
    # session_window oracle on the shared real prefix: same starts, same
    # counts (session_windows reports end=last+gap, ours reports last)
    batch = {
        (r["repo"], r["session_start"].timestamp() - BASE): r["n_events"]
        for r in session_windows(_batch_real(spark, stream_dir), gap="30 minutes").collect()
    }
    stream_real = {
        (r["repo"], r["session_start"].timestamp() - BASE): r["n_events"]
        for r in spark.read.parquet(out).collect()
        if r["session_start"].timestamp() - BASE < 50_000
    }
    assert stream_real == batch


def test_stateful_sessionize_out_of_order_batches(spark, tmp_path):
    """ADVICE r03: a late-but-within-watermark batch whose events PRECEDE
    (repo_x) or SPAN (repo_y) the carried open session must interval-merge
    like F.session_window — not glue a distinct earlier session onto the
    carried one, and not keep the carried start as session_start."""
    d = str(tmp_path / "events")
    os.makedirs(d)
    batches = [
        # b0 opens: x@10000, y@5000
        [("repo_x", 10000), ("repo_y", 5000)],
        # b1 late data: x events 2000/2500 form a DISTINCT earlier session
        # (10000-2500 > gap); y events 3500/6500 each within gap of the
        # carried 5000 — the carried session BRIDGES them into one
        [("repo_x", 2000), ("repo_x", 2500), ("repo_y", 3500), ("repo_y", 6500)],
        # sentinel closes every real session by gap
        [("repo_x", SENTINEL_1), ("repo_y", SENTINEL_1)],
    ]
    for i, rows in enumerate(batches):
        _write_file(os.path.join(d, f"b{i}.parquet"), rows, 1_700_000_000 + i * 10)
    schema = spark.read.parquet(d).schema
    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(d)
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    run_to_parquet_available_now(
        # 4h watermark so the b1 stragglers are late-but-IN-watermark
        stateful_sessionize(stream, gap_seconds=GAP_S, watermark="4 hours"),
        out, ckpt,
    )
    got = {
        (r["repo"], r["session_start"].timestamp() - BASE): (
            r["session_last"].timestamp() - BASE, r["n_events"])
        for r in spark.read.parquet(out).collect()
    }
    assert got == {
        ("repo_x", 2000.0): (2500.0, 2),   # distinct earlier session, own start
        ("repo_x", 10000.0): (10000.0, 1),
        ("repo_y", 3500.0): (6500.0, 3),   # carried 5000 bridges 3500+6500
    }
    # and the closed set equals the declarative batch oracle on real events
    real = spark.read.parquet(d).filter(
        F.col("ts") < F.timestamp_seconds(F.lit(BASE + 50_000)))
    oracle = {
        (r["repo"], r["session_start"].timestamp() - BASE): r["n_events"]
        for r in session_windows(real, gap="30 minutes").collect()
    }
    assert {(k, s): n for (k, s), (_, n) in got.items()} == oracle
