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


def test_stream_tail_processing_time_live(spark, tmp_path, event_stream):
    """True unbounded tail (round 4): a processingTime-triggered query
    stays ALIVE — files landing after start are merged continuously, and
    the state converges to the epoch-loop replay of whatever has landed.
    The query is stopped only at the end (it would run forever)."""
    import shutil as _sh
    import time as _t

    from etlbox_spark.streaming.tail import tail_processing_time

    events_schema = spark.read.parquet(event_stream).schema
    live_dir = tmp_path / "live_events"
    live_dir.mkdir()
    epochs = sorted((p for p in __import__("pathlib").Path(event_stream).iterdir()
                     if p.name.startswith("epoch=")), key=lambda p: p.name)
    assert len(epochs) >= 3
    # first epoch present BEFORE start; the rest land while the query runs
    _sh.copytree(epochs[0], live_dir / epochs[0].name)

    t = LakeTable.create(str(tmp_path / "t"), REPO_FILES_SCHEMA, ["repo", "path"], 8)
    q = tail_processing_time(
        spark, t, f"{live_dir}/epoch=*", events_schema, SPEC,
        stream_checkpoint_dir=str(tmp_path / "ck"), interval="300 milliseconds",
    )
    try:
        def oracle(upto):
            ref = LakeTable.create(str(tmp_path / f"ref{upto}"),
                                   REPO_FILES_SCHEMA, ["repo", "path"], 8)
            replay(spark, ref, event_stream, SPEC, MergeMode.DELTA,
                   epochs=list(range(upto + 1)))
            return _final_state(spark, ref)

        def converged(want, timeout_s=60):
            deadline = _t.monotonic() + timeout_s
            while _t.monotonic() < deadline:
                if _final_state(spark, t) == want:
                    return True
                _t.sleep(0.5)
            return False

        assert converged(oracle(0)), "initial epoch never merged"
        # land two more epochs while the query is live
        _sh.copytree(epochs[1], live_dir / epochs[1].name)
        _sh.copytree(epochs[2], live_dir / epochs[2].name)
        assert converged(oracle(2)), "late-landing epochs never merged"
    finally:
        q.stop()
        q.awaitTermination()


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


def test_stream_changes_feed(spark, tmp_path, event_stream):
    """Streaming CDC-out: a consumer drains the committed delta log via
    stream_changes, matches the batch read_changes result, and a second
    drain with the same source checkpoint delivers ONLY newly committed
    epochs (incremental consumption)."""
    from etlbox_spark.engine.merge import read_changes
    from etlbox_spark.streaming.tail import stream_changes

    events_schema = spark.read.parquet(event_stream).schema
    t = LakeTable.create(str(tmp_path / "t"), REPO_FILES_SCHEMA, ["repo", "path"], 8)
    d = str(tmp_path / "delta")
    replay(spark, t, event_stream, SPEC, MergeMode.DELTA,
           checkpoint=Checkpoint(str(tmp_path / "c.json")), epochs=[0, 1],
           delta_dir=d)

    change_schema = spark.read.parquet(f"{d}/epoch=0").schema

    def drain():
        # foreachBatch collector: the memory sink cannot recover from a
        # checkpoint, and checkpointed incremental consumption is the
        # point of this test
        rows = []
        q = (
            stream_changes(spark, d, change_schema)
            .writeStream.foreachBatch(lambda df, _bid: rows.extend(df.collect()))
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True).start()
        )
        q.awaitTermination()
        return rows

    got = drain()
    want = read_changes(spark, d)
    g = sorted([r["epoch"], r["repo"], r["path"], r["action"], r["content"]]
               for r in got)
    w = sorted([r["epoch"], r["repo"], r["path"], r["action"], r["content"]]
               for r in want.collect())
    assert g == w and len(g) > 0

    # commit one more epoch, drain again with the SAME checkpoint: only
    # epoch 2's rows arrive (source offsets skip consumed files)
    replay(spark, t, event_stream, SPEC, MergeMode.DELTA,
           checkpoint=Checkpoint(str(tmp_path / "c.json")), delta_dir=d)
    inc = drain()
    assert {int(r["epoch"]) for r in inc} == {2}
    assert len(inc) == read_changes(spark, d, from_epoch=2).count()


def test_live_cdc_in_to_cdc_out_chain(spark, tmp_path, event_stream):
    """The full CDC chain, live: a processingTime tail ingests binlog
    files landing over time (CDC-in) while a checkpointed stream_changes
    consumer drains the delta log mid-flight (CDC-out). Every drain must
    surface only epochs the lake has committed, and the accumulated feed
    must converge to the batch read_changes of everything ingested."""
    import shutil as _sh
    import time as _t
    from pathlib import Path

    from etlbox_spark.engine.merge import read_changes
    from etlbox_spark.streaming.tail import stream_changes, tail_processing_time

    events_schema = spark.read.parquet(event_stream).schema
    live_dir = tmp_path / "live_events"
    live_dir.mkdir()
    epochs = sorted((p for p in Path(event_stream).iterdir()
                     if p.name.startswith("epoch=")), key=lambda p: p.name)
    _sh.copytree(epochs[0], live_dir / epochs[0].name)

    t = LakeTable.create(str(tmp_path / "t"), REPO_FILES_SCHEMA, ["repo", "path"], 8)
    d = str(tmp_path / "delta")
    q = tail_processing_time(
        spark, t, f"{live_dir}/epoch=*", events_schema, SPEC,
        stream_checkpoint_dir=str(tmp_path / "ck_in"), delta_dir=d,
        interval="300 milliseconds",
    )
    seen = []

    def drain():
        import os
        if not os.path.isdir(d) or not any(
            n.startswith("epoch=") for n in os.listdir(d)
            if os.path.isdir(os.path.join(d, n))
        ):
            return
        change_schema = spark.read.parquet(
            sorted(p for p in Path(d).iterdir() if p.name.startswith("epoch="))[0].as_posix()
        ).schema
        rows = []
        dq = (
            stream_changes(spark, d, change_schema)
            .writeStream.foreachBatch(lambda df, _b: rows.extend(df.collect()))
            .option("checkpointLocation", str(tmp_path / "ck_out"))
            .trigger(availableNow=True).start()
        )
        dq.awaitTermination()
        # mid-flight consistency: everything the consumer sees is a
        # committed epoch at drain time
        committed = set(t.manifest().committed_epochs)
        assert {int(r["epoch"]) for r in rows} <= committed
        seen.extend(rows)

    try:
        # land source epochs one at a time (files landing together would
        # legitimately batch into ONE micro-batch = one log epoch; the
        # chain guarantees exactly-once per micro-batch, not per file)
        def wait_for(epoch_set, timeout_s=90):
            deadline = _t.monotonic() + timeout_s
            while {int(r["epoch"]) for r in seen} != epoch_set and _t.monotonic() < deadline:
                _t.sleep(0.5); drain()

        def land(src):
            # atomic landing: copytree directly into the watched glob can
            # be listed MID-COPY by the 300ms trigger, splitting one
            # source epoch across two micro-batches (= two log epochs)
            import os as _os
            stage = tmp_path / ("stage_" + src.name)
            _sh.copytree(src, stage)
            _os.rename(stage, live_dir / src.name)

        wait_for({0})
        land(epochs[1])
        wait_for({0, 1})
        land(epochs[2])
        wait_for({0, 1, 2})
    finally:
        q.stop()
        q.awaitTermination()

    assert {int(r["epoch"]) for r in seen} == {0, 1, 2}, "feed never converged"
    want = read_changes(spark, d)
    g = sorted([int(r["epoch"]), r["repo"], r["path"], r["action"]] for r in seen)
    w = sorted([int(r["epoch"]), r["repo"], r["path"], r["action"]] for r in want.collect())
    assert g == w  # exactly-once: no duplicates across incremental drains
