"""Structured-Streaming binlog tail (SURVEY.md §2.8 v2 path).

The availableNow drain must produce the exact same final table state as
the manual epoch-loop replay of the same events, and re-draining after
completion must be a no-op (exactly-once across foreachBatch retries via
the lake's epoch markers — the streaming layer only batches).
"""

from __future__ import annotations

import pytest

from etlbox_spark.engine import Checkpoint, LakeTable, MergeMode, MergeSpec, replay
from etlbox_spark.engine.gen import gen_events, write_events
from etlbox_spark.streaming.tail import tail_available_now

from .conftest import REPO_FILES_SCHEMA

SPEC = MergeSpec()


@pytest.fixture(scope="module")
def event_stream(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("stream") / "events"
    ev = gen_events(spark, n_events=3000, n_repos=15, paths_per_repo=40, epoch_size=1000)
    write_events(ev, str(d))
    return str(d)


def _final_state(spark, t):
    return {(r.repo, r.path): r.content for r in t.read(spark).collect()}


def test_stream_tail_matches_batch_replay(spark, tmp_path, event_stream):
    events_schema = spark.read.parquet(event_stream).schema

    t_batch = LakeTable.create(str(tmp_path / "batch"), REPO_FILES_SCHEMA, ["repo", "path"], 8)
    replay(spark, t_batch, event_stream, SPEC, MergeMode.DELTA)

    t_stream = LakeTable.create(str(tmp_path / "stream"), REPO_FILES_SCHEMA, ["repo", "path"], 8)
    ckpt = Checkpoint(str(tmp_path / "engine_ckpt.json"))
    tail_available_now(
        spark,
        t_stream,
        f"{event_stream}/epoch=*",
        events_schema,
        SPEC,
        stream_checkpoint_dir=str(tmp_path / "stream_ckpt"),
        engine_checkpoint=ckpt,
    )
    assert _final_state(spark, t_stream) == _final_state(spark, t_batch)
    assert len(ckpt.load()["epochs"]) >= 1


def test_stream_redrain_is_noop(spark, tmp_path, event_stream):
    events_schema = spark.read.parquet(event_stream).schema
    t = LakeTable.create(str(tmp_path / "t"), REPO_FILES_SCHEMA, ["repo", "path"], 8)
    args = (spark, t, f"{event_stream}/epoch=*", events_schema, SPEC)
    tail_available_now(*args, stream_checkpoint_dir=str(tmp_path / "ck"))
    v1 = t.latest_version()
    state1 = _final_state(spark, t)
    # same stream checkpoint: Spark sees no new files -> no batches at all
    tail_available_now(*args, stream_checkpoint_dir=str(tmp_path / "ck"))
    assert t.latest_version() == v1
    # fresh stream checkpoint: batches re-fire, but the lake's epoch
    # markers make each one a no-op commit
    tail_available_now(*args, stream_checkpoint_dir=str(tmp_path / "ck2"))
    assert _final_state(spark, t) == state1
    assert t.manifest().committed_epochs == sorted(set(t.manifest().committed_epochs))
