"""Optimistic concurrent commits (lake._publish CAS + rebase rules).

The lake's concurrency contract: ONE ingest writer plus any number of
concurrent maintenance jobs. Before r04 the manifest publish was
last-writer-wins (`os.replace`), so a compaction racing the ingest
writer silently dropped one side's commit — the classic lost update the
Delta paper's log protocol exists to prevent. Now the manifest link is a
CAS; these tests drive every conflict arm:

* epoch commit loses the CAS to a compact  → rebase + retry (compaction
  is a logical no-op, the derived rows stay exact)
* two replayers race the SAME epoch        → idempotent convergence
* a second ingest writer (different epoch) → loud ConcurrentCommitError
* epoch racing a rebucket                  → loud ConcurrentCommitError
* real threads: ingest stream vs a compaction loop → state equals the
  serial replay oracle
"""

from __future__ import annotations

import threading
import time

import pytest

from etlbox_spark.engine import (
    ConcurrentCommitError,
    LakeTable,
    MergeMode,
    MergeSpec,
    apply_epoch,
)
from etlbox_spark.engine.lake import LakeTable as LT

from .conftest import EVENTS_SCHEMA, REPO_FILES_SCHEMA, ev

SPEC = MergeSpec(compare_cols=("content",))

EPOCHS = [
    [ev(1, "insert", "p1", "a1"), ev(2, "insert", "p2", "b1"), ev(3, "insert", "p3", "c1")],
    [ev(10, "update", "p2", "b2"), ev(11, "delete", "p1"), ev(12, "insert", "p4", "d1")],
    [ev(20, "insert", "p1", "a2"), ev(21, "update", "p4", "d2"), ev(22, "delete", "p3")],
]
FINAL = {("r0", "p1"): "a2", ("r0", "p2"): "b2", ("r0", "p4"): "d2"}


def _mk(tmp_path, name, mor=True):
    props = {"write.mode": "mor"} if mor else {}
    return LakeTable.create(
        str(tmp_path / name), REPO_FILES_SCHEMA, ["repo", "path"], 4, properties=props
    )


def _apply(spark, t, rows, epoch):
    return apply_epoch(
        spark, t, spark.createDataFrame(rows, EVENTS_SCHEMA), SPEC, MergeMode.DELTA, epoch
    )


def _state(spark, t):
    return {(r.repo, r.path): r.content for r in t.read(spark).collect()}


def _inject_once_before_epoch_publish(monkeypatch, action):
    """Patch LakeTable._publish so the FIRST epoch/epoch-delta publish is
    preceded by `action(table)` — a concurrent commit that wins the CAS
    the victim was about to take. Subsequent publishes run clean."""
    real = LT._publish
    state = {"armed": True}

    def racing(self, m):
        if m.operation.startswith("epoch") and state["armed"]:
            state["armed"] = False
            action(self)
        return real(self, m)

    monkeypatch.setattr(LT, "_publish", racing)
    return state


def test_epoch_rebases_over_concurrent_compact(spark, tmp_path, monkeypatch):
    t = _mk(tmp_path, "t")
    _apply(spark, t, EPOCHS[0], 0)
    _apply(spark, t, EPOCHS[1], 1)  # leaves delta files to fold
    v_before = t.latest_version()

    state = _inject_once_before_epoch_publish(
        monkeypatch, lambda tab: tab.compact(spark)
    )
    res = _apply(spark, t, EPOCHS[2], 2)
    assert not state["armed"]  # the race actually fired

    # the compact won v_before+1; the rebased epoch landed at +2
    assert res.version == v_before + 2
    ops = {h["version"]: h["operation"] for h in t.history()}
    assert ops[v_before + 1] == "compact"
    assert ops[v_before + 2] == "epoch-delta"
    assert t.is_committed(2)
    assert _state(spark, t) == FINAL


def test_same_epoch_replayers_converge(spark, tmp_path, monkeypatch):
    """Two replayers racing the SAME epoch id (crash-recovery double-run):
    the CAS loser reloads, sees the epoch committed, and no-ops."""
    t = _mk(tmp_path, "t")
    _apply(spark, t, EPOCHS[0], 0)

    def replay_same_epoch(tab):
        # the "other replayer": full epoch-1 apply that wins the CAS
        _apply(spark, tab, EPOCHS[1], 1)

    state = _inject_once_before_epoch_publish(monkeypatch, replay_same_epoch)
    res = _apply(spark, t, EPOCHS[1], 1)
    assert not state["armed"]

    assert t.manifest().committed_epochs.count(1) == 1
    assert _state(spark, t) == {("r0", "p2"): "b2", ("r0", "p3"): "c1", ("r0", "p4"): "d1"}
    assert res.version == t.latest_version()


def test_second_ingest_writer_conflicts_loudly(spark, tmp_path, monkeypatch):
    """A DIFFERENT epoch committed concurrently means two ingest writers:
    the loser's classification is stale — it must abort, not rebase."""
    t = _mk(tmp_path, "t")
    _apply(spark, t, EPOCHS[0], 0)

    _inject_once_before_epoch_publish(
        monkeypatch, lambda tab: _apply(spark, tab, EPOCHS[2], 7)
    )
    with pytest.raises(ConcurrentCommitError, match="ONE ingest writer"):
        _apply(spark, t, EPOCHS[1], 1)

    # the loser left no trace: the winner's state stands, epoch 1 absent
    assert t.is_committed(7) and not t.is_committed(1)
    # ...and the stream can resume cleanly against the new snapshot
    _apply(spark, t, EPOCHS[1], 8)


def test_epoch_conflicts_with_concurrent_rebucket(spark, tmp_path, monkeypatch):
    t = _mk(tmp_path, "t")
    _apply(spark, t, EPOCHS[0], 0)

    _inject_once_before_epoch_publish(
        monkeypatch, lambda tab: tab.rebucket(spark, 8)
    )
    with pytest.raises(ConcurrentCommitError):
        _apply(spark, t, EPOCHS[1], 1)
    assert t.manifest().n_buckets == 8  # rebucket won, table intact


def test_threaded_ingest_vs_compaction_loop(spark, tmp_path):
    """Real interleaving: an ingest thread replays the stream while a
    maintenance thread compacts in a loop. Exactly the production
    deployment (ingest job + table-maintenance job); the final state
    must equal a serial replay, every epoch committed exactly once."""
    t = _mk(tmp_path, "t")
    serial = _mk(tmp_path, "serial")
    for i, rows in enumerate(EPOCHS):
        _apply(spark, serial, rows, i)

    errors: list[BaseException] = []
    done = threading.Event()

    def ingest():
        try:
            for i, rows in enumerate(EPOCHS):
                _apply(spark, t, rows, i)
        except BaseException as e:  # noqa: BLE001 — surfaced below
            errors.append(e)
        finally:
            done.set()

    def maintain():
        while not done.is_set():
            try:
                t.compact(spark)
            except ConcurrentCommitError:
                pass  # acceptable for maintenance: retry next round
            except BaseException as e:  # noqa: BLE001
                errors.append(e)
                return
            time.sleep(0.05)

    ti, tm = threading.Thread(target=ingest), threading.Thread(target=maintain)
    ti.start(), tm.start()
    ti.join(timeout=300), tm.join(timeout=300)
    assert not errors, errors

    assert _state(spark, t) == _state(spark, serial) == FINAL
    assert sorted(t.manifest().committed_epochs) == [0, 1, 2]
    # compaction interleaved with ingest leaves content identical after
    # a final fold too
    t.compact(spark)
    assert _state(spark, t) == FINAL


def test_vacuum_spares_inflight_commit_under_concurrent_compact(spark, tmp_path, monkeypatch):
    """The lost-update arm vacuum alone can't see: an epoch's data files
    are written (unreferenced), then a concurrent compact publishes —
    advancing the latest manifest's mtime PAST them — and a vacuum with
    zero grace runs before the epoch's manifest lands. The in-flight
    marker must floor the cutoff so the epoch's files survive."""
    t = _mk(tmp_path, "t")
    _apply(spark, t, EPOCHS[0], 0)
    _apply(spark, t, EPOCHS[1], 1)  # deltas for the compact to fold

    real = LT._publish
    state = {"armed": True}

    def racing(self, m):
        if m.operation.startswith("epoch") and state["armed"]:
            state["armed"] = False
            self.compact(spark)
            self.vacuum(keep_versions=1, grace_s=0.0)
        return real(self, m)

    monkeypatch.setattr(LT, "_publish", racing)
    _apply(spark, t, EPOCHS[2], 2)
    assert not state["armed"]
    # the scan proves the files survived; the values prove correctness
    assert _state(spark, t) == FINAL


def test_vacuum_sweeps_stale_inflight_markers(spark, tmp_path):
    import os

    t = _mk(tmp_path, "t")
    _apply(spark, t, EPOCHS[0], 0)
    meta = str(tmp_path / "t" / "meta")
    marker = os.path.join(meta, "_inflight.deadbeef")
    with open(marker, "w"):
        pass
    os.utime(marker, (1, 1))  # a crashed writer from long ago
    t.vacuum(keep_versions=1, inflight_max_age_s=3600.0)
    assert not os.path.exists(marker), "stale marker must not block vacuum forever"


def test_overwrite_detects_concurrent_rebucket(spark, tmp_path, monkeypatch):
    """overwrite derives its bucket range from a pinned manifest; a
    rebucket landing before the commit would leave the extra buckets'
    files live — it must conflict, not silently keep stale rows."""
    t = _mk(tmp_path, "t", mor=False)
    _apply(spark, t, EPOCHS[0], 0)

    real_commit = LT.commit_buckets
    state = {"armed": True}

    def racing_commit(self, df, changed, epoch_id, new_schema=None, base_version=None):
        if state["armed"]:
            state["armed"] = False
            self.rebucket(spark, 8)
        return real_commit(
            self, df, changed, epoch_id, new_schema=new_schema, base_version=base_version
        )

    monkeypatch.setattr(LT, "commit_buckets", racing_commit)
    from etlbox_spark.engine import BUCKET_COL
    from etlbox_spark.functions.hashing import bucket_expr

    repl = spark.createDataFrame(
        [("r9", "p9", "c9", "py", "z")], REPO_FILES_SCHEMA
    ).withColumn(BUCKET_COL, bucket_expr(8, "repo", "path"))
    with pytest.raises(ConcurrentCommitError):
        t.overwrite(repl, 5)
    assert not state["armed"]
    assert t.manifest().n_buckets == 8  # rebucket won; overwrite aborted


def test_history_records_operations(spark, tmp_path):
    t = _mk(tmp_path, "t")
    _apply(spark, t, EPOCHS[0], 0)
    t.compact(spark)
    t.rebucket(spark, 8)
    ops = [h["operation"] for h in t.history()]
    assert ops[-1] == "create" and "compact" in ops and "rebucket" in ops
    assert ops[0] == "rebucket"  # newest first
    versions = [h["version"] for h in t.history()]
    assert versions == sorted(versions, reverse=True)
