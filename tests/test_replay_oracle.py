"""Randomized (seeded) stream replay vs pure-Python oracle (SURVEY.md §5.2
item 4) + checkpoint/resume (item 2) + the ghost-tombstone regression.
"""

from __future__ import annotations

import hashlib

import pandas as pd

from etlbox_spark.engine import Checkpoint, LakeTable, MergeMode, MergeSpec, apply_epoch, replay
from etlbox_spark.engine.gen import gen_events, list_epochs, write_events

from .conftest import EVENTS_SCHEMA, REPO_FILES_SCHEMA, ev


def _oracle(events_dir: str) -> dict:
    pdf = pd.read_parquet(events_dir).sort_values("event_seq")
    state: dict = {}
    for r in pdf.itertuples():
        k = (r.repo, r.path)
        if r.op == "delete":
            state.pop(k, None)
        else:
            state[k] = r.content
    return state


def test_seeded_replay_matches_python_oracle(spark, tmp_path):
    ev_dir = str(tmp_path / "events")
    write_events(
        gen_events(spark, n_events=3000, n_repos=15, paths_per_repo=40, epoch_size=1000),
        ev_dir,
    )
    t = LakeTable.create(str(tmp_path / "lake"), REPO_FILES_SCHEMA, ["repo", "path"], 16)
    spec = MergeSpec()
    ckpt = Checkpoint(str(tmp_path / "ckpt.json"))

    # simulate a crash after two epochs, then resume with a fresh process
    replay(spark, t, ev_dir, spec, MergeMode.DELTA, checkpoint=ckpt, epochs=[0, 1])
    res = replay(spark, t, ev_dir, spec, MergeMode.DELTA, checkpoint=Checkpoint(str(tmp_path / "ckpt.json")))
    assert [r.skipped for r in res[:2]] == [True, True]

    state = _oracle(ev_dir)
    snap = {(r.repo, r.path): r.content for r in t.read(spark).collect()}
    assert set(snap) == set(state)
    for k, v in state.items():
        assert hashlib.sha256(snap[k].encode()).hexdigest() == hashlib.sha256(v.encode()).hexdigest()

    # full re-replay without checkpoint: every epoch no-ops via lake markers
    v0 = t.latest_version()
    res2 = replay(spark, t, ev_dir, spec, MergeMode.DELTA)
    assert all(r.skipped for r in res2)
    assert t.latest_version() == v0

    # checkpoint carries per-bucket lineage for every applied epoch
    st = ckpt.load()
    assert st["epochs"]["0"]["offsets"]  # per-partition offsets present
    assert st["epochs"]["0"]["counts"]["insert"] > 0


def test_tombstone_then_reinsert_then_tombstone(spark, tmp_path):
    """Regression: a no-op tombstone of an absent key must not write a
    ghost row (found by e2e oracle verification, fixed in classify.__keep)."""
    t = LakeTable.create(str(tmp_path / "lake"), REPO_FILES_SCHEMA, ["repo", "path"], 8)
    spec = MergeSpec(compare_cols=("content",))

    def run(rows, epoch):
        df = spark.createDataFrame(rows, EVENTS_SCHEMA)
        return apply_epoch(spark, t, df, spec, MergeMode.DELTA, epoch)

    run([ev(1, "insert", "p1", "A")], 0)
    run([ev(2, "delete", "p1")], 1)
    # insert then delete within one epoch: LWW resolves to tombstone of absent
    run([ev(3, "insert", "p1", "B"), ev(4, "delete", "p1")], 2)
    assert t.read(spark).count() == 0
    assert t.row_count() == 0


def test_epoch_listing(spark, tmp_path):
    ev_dir = str(tmp_path / "events")
    write_events(gen_events(spark, n_events=2500, epoch_size=1000), ev_dir)
    assert list_epochs(ev_dir) == [0, 1, 2]


def test_rollback_bad_epoch_then_replay_converges(spark, tmp_path):
    """The CDC bad-epoch escape hatch: epochs 2-3 turn out poisoned ->
    rollback to the post-epoch-1 snapshot -> re-replay. The reverted
    epoch markers make the re-replay exactly-once-correct: 0-1 no-op,
    2-3 re-apply, and the final state equals the straight-through run
    (and the pure-Python oracle)."""
    ev_dir = str(tmp_path / "events")
    write_events(
        gen_events(spark, n_events=2000, n_repos=10, paths_per_repo=30, epoch_size=500),
        ev_dir,
    )
    t = LakeTable.create(str(tmp_path / "lake"), REPO_FILES_SCHEMA, ["repo", "path"], 8)
    spec = MergeSpec()
    res = replay(spark, t, ev_dir, spec, MergeMode.DELTA)
    good_v = res[1].version  # snapshot right after epoch 1
    final = {(r.repo, r.path): r.content for r in t.read(spark).collect()}

    t.rollback(good_v)
    assert t.manifest().committed_epochs == [0, 1]
    res2 = replay(spark, t, ev_dir, spec, MergeMode.DELTA)
    assert [r.skipped for r in res2] == [True, True, False, False]
    snap = {(r.repo, r.path): r.content for r in t.read(spark).collect()}
    assert snap == final == _oracle(ev_dir)


def test_rollback_then_replay_with_same_checkpoint_reapplies(spark, tmp_path):
    """fast_resume must not outrank the lake's epoch markers: after a
    rollback, a re-replay reusing the SAME checkpoint file (the realistic
    operator move — nobody remembers to delete it) still re-applies the
    rolled-back epochs, because the resume shortcut is gated on the
    intersection of checkpoint-done and manifest-committed epochs."""
    ev_dir = str(tmp_path / "events")
    write_events(
        gen_events(spark, n_events=2000, n_repos=10, paths_per_repo=30, epoch_size=500),
        ev_dir,
    )
    t = LakeTable.create(str(tmp_path / "lake"), REPO_FILES_SCHEMA, ["repo", "path"], 8)
    spec = MergeSpec()
    ck = Checkpoint(str(tmp_path / "c.json"))
    res = replay(spark, t, ev_dir, spec, MergeMode.DELTA, checkpoint=ck)
    good_v = res[1].version
    final = {(r.repo, r.path): r.content for r in t.read(spark).collect()}

    t.rollback(good_v)
    res2 = replay(spark, t, ev_dir, spec, MergeMode.DELTA, checkpoint=ck)
    assert [r.skipped for r in res2] == [True, True, False, False]
    assert {(r.repo, r.path): r.content for r in t.read(spark).collect()} == final
    # the checkpoint now records the re-applied epochs' fresh versions
    assert ck.load()["epochs"]["3"]["version"] == res2[3].version > good_v
