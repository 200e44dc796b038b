"""Lake maintenance: re-bucketing (layout evolution) and vacuum
(expire_snapshots + orphan removal analog). Copy-on-write commits replace
whole buckets, so the ≤1-live-file-per-bucket invariant makes classic
small-file compaction unnecessary — asserted here too."""

from __future__ import annotations

import os

from etlbox_spark.engine import LakeTable, MergeMode, MergeSpec, apply_epoch
from etlbox_spark.functions.hashing import content_sha256

from .conftest import EVENTS_SCHEMA, REPO_FILES_SCHEMA, ev

SPEC = MergeSpec(compare_cols=("content",))


def _apply_n_epochs(spark, t, n=4):
    for epoch in range(n):
        rows = [ev(epoch * 10 + i, "insert", f"p{epoch}_{i}", f"v{epoch}_{i}")
                for i in range(3)]
        apply_epoch(spark, t, spark.createDataFrame(rows, EVENTS_SCHEMA),
                    SPEC, MergeMode.DELTA, epoch)


def _state(spark, t, version=None):
    return {
        (r.repo, r.path): (r.content, r.sha)
        for r in t.read(spark, version=version).withColumn("sha", content_sha256()).collect()
    }


def test_no_intra_bucket_fragmentation(spark, tmp_path):
    """COW invariant: after any number of epochs, each bucket has at most
    one live file (small-file compaction is structurally unnecessary)."""
    t = LakeTable.create(str(tmp_path / "t"), REPO_FILES_SCHEMA, ["repo", "path"], 2)
    _apply_n_epochs(spark, t)
    per_bucket: dict[int, int] = {}
    for e in t.manifest().files:
        per_bucket[e["bucket"]] = per_bucket.get(e["bucket"], 0) + 1
    assert all(n == 1 for n in per_bucket.values())


def test_rebucket_preserves_content_and_markers(spark, tmp_path):
    t = LakeTable.create(str(tmp_path / "t"), REPO_FILES_SCHEMA, ["repo", "path"], 2)
    _apply_n_epochs(spark, t)
    before = _state(spark, t)
    m = t.manifest()
    v = t.rebucket(spark, 8)
    m2 = t.manifest()
    assert m2.version == v and m2.n_buckets == 8
    assert {e["bucket"] for e in m2.files} <= set(range(8))
    assert _state(spark, t) == before
    assert m2.committed_epochs == m.committed_epochs
    assert m2.total_rows == m.total_rows
    assert t.rebucket(spark, 8) == v  # same count -> no-op


def test_rebucket_then_merge_continues(spark, tmp_path):
    t = LakeTable.create(str(tmp_path / "t"), REPO_FILES_SCHEMA, ["repo", "path"], 2)
    _apply_n_epochs(spark, t, n=2)
    t.rebucket(spark, 4)
    rows = [ev(100, "update", "p0_0", "patched"), ev(101, "delete", "p1_1")]
    apply_epoch(spark, t, spark.createDataFrame(rows, EVENTS_SCHEMA),
                SPEC, MergeMode.DELTA, 50)
    got = {k[1]: v[0] for k, v in _state(spark, t).items()}
    assert got["p0_0"] == "patched" and "p1_1" not in got


def test_vacuum_reclaims_unreferenced_files(spark, tmp_path):
    t = LakeTable.create(str(tmp_path / "t"), REPO_FILES_SCHEMA, ["repo", "path"], 2)
    _apply_n_epochs(spark, t)
    t.rebucket(spark, 4)
    latest_state = _state(spark, t)
    n_before = sum(len(files) for _, _, files in os.walk(t._data_dir))
    stats = t.vacuum(keep_versions=1)
    assert stats["files_deleted"] > 0 and stats["manifests_deleted"] > 0
    n_after = sum(len(files) for _, _, files in os.walk(t._data_dir))
    assert n_after < n_before
    assert _state(spark, t) == latest_state  # current snapshot intact
    # vacuum is idempotent
    stats2 = t.vacuum(keep_versions=1)
    assert stats2["files_deleted"] == 0 and stats2["manifests_deleted"] == 0


def test_vacuum_dry_run_reports_without_touching(spark, tmp_path):
    """VACUUM DRY RUN analog: identical counts, zero side effects — every
    file, manifest and marker survives; the subsequent real vacuum
    deletes exactly what the dry run reported."""
    import time

    t = LakeTable.create(str(tmp_path / "t"), REPO_FILES_SCHEMA, ["repo", "path"], 2)
    _apply_n_epochs(spark, t)
    t.rebucket(spark, 4)
    # a stale marker that a REAL vacuum would sweep
    stale = os.path.join(t._meta_dir, "_inflight.deadbeef")
    open(stale, "w").close()
    os.utime(stale, (time.time() - 999, time.time() - 999))

    def snapshot():
        return sorted(
            os.path.join(dp, f)
            for root in (t._data_dir, t._meta_dir)
            for dp, _, fs in os.walk(root)
            for f in fs
        )

    before = snapshot()
    dry = t.vacuum(keep_versions=1, inflight_max_age_s=100, dry_run=True)
    assert dry["files_deleted"] > 0 and dry["manifests_deleted"] > 0
    assert snapshot() == before  # nothing touched, marker included
    real = t.vacuum(keep_versions=1, inflight_max_age_s=100)
    assert real == dry  # the dry run's report was exact
    assert not os.path.exists(stale)


def test_vacuum_keeps_time_travel_window(spark, tmp_path):
    t = LakeTable.create(str(tmp_path / "t"), REPO_FILES_SCHEMA, ["repo", "path"], 2)
    _apply_n_epochs(spark, t, n=3)
    v_latest = t.latest_version()
    prev_state = _state(spark, t, version=v_latest - 1)
    t.vacuum(keep_versions=2)
    assert _state(spark, t, version=v_latest - 1) == prev_state  # kept version readable
