"""Dead-letter routing in the merge core (MergeSpec.on_malformed) —
the ETLBox LinkErrorTo analog applied to the binlog tail: events that
would corrupt the merge (NULL key, NULL seq, NULL/unknown op) are
quarantined or fail fast, per policy, BEFORE the LWW window so a
malformed event can never outrank a valid one.
"""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from etlbox_spark.engine import (
    LakeTable,
    MergeMode,
    MergeSpec,
    apply_epoch,
    read_quarantine,
)
from etlbox_spark.engine.merge import expire_changes

from .conftest import EVENTS_SCHEMA, REPO_FILES_SCHEMA

# EVENTS_SCHEMA cols: event_seq, op, repo, path, commit, lang, content, ...
_NULLABLE_EVENTS = T.StructType(
    [T.StructField(f.name, f.dataType, True) for f in EVENTS_SCHEMA.fields]
)


def _t(tmp_path):
    return LakeTable.create(str(tmp_path / "t"), REPO_FILES_SCHEMA, ["repo", "path"], 8)


def _ev(seq, op, repo, path, content):
    base = {f.name: None for f in _NULLABLE_EVENTS.fields}
    base.update(event_seq=seq, op=op, repo=repo, path=path,
                commit="c", lang="py", content=content)
    return tuple(base[f.name] for f in _NULLABLE_EVENTS.fields)


_BAD = [
    _ev(10, "insert", None, "p9", "NULLKEY"),   # NULL key col
    _ev(None, "insert", "r9", "p9", "NULLSEQ"),  # NULL seq
    _ev(11, "obliterate", "r8", "p8", "BADOP"),  # unknown op
    _ev(12, None, "r7", "p7", "NULLOP"),         # NULL op
]
_GOOD = [
    _ev(1, "insert", "r0", "p1", "A"),
    _ev(2, "insert", "r0", "p2", "B"),
    _ev(3, "delete", "r0", "p2", None),
    _ev(4, "upsert", "r1", "p1", "C"),
]


def test_quarantine_routes_bad_and_merges_good(spark, tmp_path):
    t = _t(tmp_path)
    d = str(tmp_path / "delta")
    spec = MergeSpec(compare_cols=("content",), on_malformed="quarantine")
    df = spark.createDataFrame(_GOOD + _BAD, _NULLABLE_EVENTS)
    res = apply_epoch(spark, t, df, spec, MergeMode.DELTA, 0, delta_dir=d)
    assert res.counts["quarantine"] == 4
    got = {(r.repo, r.path): r.content for r in t.read(spark).collect()}
    assert got == {("r0", "p1"): "A", ("r1", "p1"): "C"}

    q = read_quarantine(spark, d).collect()
    assert {(r.repo, r.path, r.content) for r in q} == {
        (None, "p9", "NULLKEY"), ("r9", "p9", "NULLSEQ"),
        ("r8", "p8", "BADOP"), ("r7", "p7", "NULLOP"),
    }
    # the quarantine log is invisible to the change feed's listing
    from etlbox_spark.engine import read_changes
    assert {int(r.epoch) for r in read_changes(spark, d).collect()} == {0}
    # epoch bounds work; out-of-range is an empty frame, not an error
    assert read_quarantine(spark, d, from_epoch=1).count() == 0


def test_fail_policy_raises_with_sample(spark, tmp_path):
    t = _t(tmp_path)
    spec = MergeSpec(compare_cols=("content",), on_malformed="fail")
    df = spark.createDataFrame(_GOOD + _BAD[:1], _NULLABLE_EVENTS)
    with pytest.raises(ValueError, match="malformed event"):
        apply_epoch(spark, t, df, spec, MergeMode.DELTA, 0)
    # nothing committed: the epoch is all-or-nothing under "fail"
    assert t.manifest().committed_epochs == []
    # a clean batch under the same policy applies normally
    ok = spark.createDataFrame(_GOOD, _NULLABLE_EVENTS)
    apply_epoch(spark, t, ok, spec, MergeMode.DELTA, 0)
    assert t.manifest().committed_epochs == [0]


def test_ignore_policy_is_default_and_zero_cost(spark, tmp_path):
    """Default trusts upstream (no extra jobs, no behavior change): the
    valid rows merge exactly as without the feature."""
    t = _t(tmp_path)
    spec = MergeSpec(compare_cols=("content",))
    assert spec.on_malformed == "ignore"
    df = spark.createDataFrame(_GOOD, _NULLABLE_EVENTS)
    res = apply_epoch(spark, t, df, spec, MergeMode.DELTA, 0)
    assert "quarantine" not in res.counts
    got = {(r.repo, r.path): r.content for r in t.read(spark).collect()}
    assert got == {("r0", "p1"): "A", ("r1", "p1"): "C"}


def test_quarantine_lww_cannot_be_outranked_by_malformed(spark, tmp_path):
    """A malformed event with a HIGHER seq than a valid one for the same
    key must not win the LWW window — routing happens before dedupe."""
    t = _t(tmp_path)
    spec = MergeSpec(compare_cols=("content",), on_malformed="quarantine")
    rows = [
        _ev(1, "insert", "r0", "p1", "GOOD"),
        _ev(9, "obliterate", "r0", "p1", "EVIL-HIGHER-SEQ"),
    ]
    apply_epoch(spark, t, spark.createDataFrame(rows, _NULLABLE_EVENTS),
                spec, MergeMode.DELTA, 0, delta_dir=str(tmp_path / "d"))
    got = {(r.repo, r.path): r.content for r in t.read(spark).collect()}
    assert got == {("r0", "p1"): "GOOD"}


def test_quarantine_invisible_until_commit_no_phantoms(spark, tmp_path):
    """The rename protocol (mirrors the delta log's): dead letters from a
    crashed attempt are invisible to read_quarantine, a clean retry of
    that epoch leaves no phantom rows, and a clean-retry's stale
    in-flight dir is swept by retention."""
    import os

    from etlbox_spark.engine.merge import _route_malformed

    t = _t(tmp_path)
    d = str(tmp_path / "delta")
    os.makedirs(d, exist_ok=True)
    spec = MergeSpec(compare_cols=("content",), on_malformed="quarantine")

    # crashed attempt: routing ran (quarantine written in-flight), but the
    # epoch never committed — the dead letters must not be visible
    df_bad = spark.createDataFrame(_GOOD + _BAD, _NULLABLE_EVENTS)
    good, n = _route_malformed(spark, d, df_bad, spec, 0)
    assert n == 4
    assert read_quarantine(spark, d).count() == 0  # in-flight is invisible

    # upstream fixed the feed; the retry of epoch 0 is clean and commits —
    # the crashed attempt's rows must not linger as phantoms (the clean
    # retry's own overwrite clears the stale in-flight dir)
    df_ok = spark.createDataFrame(_GOOD, _NULLABLE_EVENTS)
    apply_epoch(spark, t, df_ok, spec, MergeMode.DELTA, 0, delta_dir=d)
    assert read_quarantine(spark, d).count() == 0
    assert not os.path.exists(os.path.join(d, "_quarantine", "_inflight-epoch-0"))

    # a crashed attempt that is NEVER retried is retention's job — and
    # only once AGED (a live retry of an old epoch may be mid-write, the
    # delta log's own in-flight rule): fresh dirs survive the sweep
    import time

    _route_malformed(spark, d, df_bad, spec, 5)  # crashed, never retried
    inflight = os.path.join(d, "_quarantine", "_inflight-epoch-5")
    assert os.path.exists(inflight)
    expire_changes(d, before_epoch=6)
    assert os.path.exists(inflight)  # fresh -> spared
    old = time.time() - 2 * 86400
    os.utime(inflight, (old, old))
    expire_changes(d, before_epoch=6)
    assert not os.path.exists(inflight)  # aged -> swept

    # a committed epoch WITH bad rows becomes visible atomically
    apply_epoch(spark, t, df_bad, spec, MergeMode.DELTA, 1, delta_dir=d)
    assert read_quarantine(spark, d).count() == 4
    assert {int(r.epoch) for r in read_quarantine(spark, d).collect()} == {1}


def test_read_quarantine_empty_range_schema_stable(spark, tmp_path):
    """An empty range must carry the same columns as a non-empty one
    (read_changes rule), so a consumer's select/union doesn't break the
    first time nothing was quarantined in range."""
    t = _t(tmp_path)
    d = str(tmp_path / "delta")
    spec = MergeSpec(compare_cols=("content",), on_malformed="quarantine")
    df = spark.createDataFrame(_GOOD + _BAD, _NULLABLE_EVENTS)
    apply_epoch(spark, t, df, spec, MergeMode.DELTA, 0, delta_dir=d)
    full = read_quarantine(spark, d)
    empty = read_quarantine(spark, d, from_epoch=5)
    assert empty.count() == 0
    assert [f.name for f in empty.schema.fields] == [f.name for f in full.schema.fields]
    # the shared select pattern works on both
    assert empty.select("repo", "path", "epoch").count() == 0


def test_quarantine_retry_overwrites_and_retention_sweeps(spark, tmp_path):
    """Crash-retry idempotence: re-applying an epoch whose commit never
    landed overwrites its quarantine dir (no duplicate dead letters);
    expire_changes sweeps quarantine epochs with the change log."""
    t = _t(tmp_path)
    d = str(tmp_path / "delta")
    spec = MergeSpec(compare_cols=("content",), on_malformed="quarantine")
    df = spark.createDataFrame(_GOOD + _BAD, _NULLABLE_EVENTS)
    apply_epoch(spark, t, df, spec, MergeMode.DELTA, 0, delta_dir=d)
    # simulate the pre-commit crash by unmarking: re-apply the same epoch
    # onto a FRESH table with the same delta_dir (the realistic retry is
    # same-table; content-wise the overwrite is what matters)
    t2 = LakeTable.create(str(tmp_path / "t2"), REPO_FILES_SCHEMA, ["repo", "path"], 8)
    apply_epoch(spark, t2, df, spec, MergeMode.DELTA, 0, delta_dir=d)
    assert read_quarantine(spark, d, to_epoch=0).count() == 4  # not 8

    apply_epoch(spark, t2, spark.createDataFrame(_BAD[:2], _NULLABLE_EVENTS),
                spec, MergeMode.DELTA, 1, delta_dir=d)
    assert read_quarantine(spark, d).count() == 6
    res = expire_changes(d, before_epoch=1)
    assert read_quarantine(spark, d).count() == 2
    assert {int(r.epoch) for r in read_quarantine(spark, d).collect()} == {1}
