"""Control-flow task surface (SURVEY.md §2.10): the ETLBox ControlFlow
verbs over the lake + Spark catalog."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from etlbox_spark.engine import MergeMode, MergeSpec, apply_epoch
from etlbox_spark.tasks import (
    LoadProcess,
    create_table_task,
    create_view_task,
    drop_table_task,
    get_table_definition_task,
    if_table_exists_task,
    row_count_task,
    sql_scalar_task,
    sql_task,
)

from .conftest import EVENTS_SCHEMA, REPO_FILES_SCHEMA, ev

SPEC = MergeSpec(compare_cols=("content",))


def _seeded(spark, tmp_path):
    t = create_table_task(str(tmp_path / "t"), REPO_FILES_SCHEMA, ["repo", "path"], 4)
    rows = [ev(1, "insert", "p1", "Test1"), ev(2, "insert", "p2", "Test2"),
            ev(3, "insert", "p3", "Test3")]
    apply_epoch(spark, t, spark.createDataFrame(rows, EVENTS_SCHEMA), SPEC, MergeMode.DELTA, 0)
    return t


def test_ddl_and_introspection(spark, tmp_path):
    root = str(tmp_path / "t")
    assert not if_table_exists_task(root)
    t = _seeded(spark, tmp_path)
    assert if_table_exists_task(root)
    assert row_count_task(root) == 3
    schema = get_table_definition_task(root)
    assert [f.name for f in schema.fields] == ["repo", "path", "commit", "lang", "content"]
    drop_table_task(root)
    assert not if_table_exists_task(root)


def test_truncate_then_row_count(spark, tmp_path):
    from etlbox_spark.tasks import truncate_table_task

    t = _seeded(spark, tmp_path)
    assert row_count_task(t.root) == 3
    truncate_table_task(t.root, epoch_id=99)
    assert row_count_task(t.root) == 0


def test_alter_table_properties(spark, tmp_path):
    from etlbox_spark.tasks import alter_table_properties_task

    t = _seeded(spark, tmp_path)
    v = alter_table_properties_task(t.root, {"write.sort.cols": "khash"})
    assert t.manifest().properties["write.sort.cols"] == "khash"
    assert alter_table_properties_task(t.root, unset=["write.sort.cols"]) == v + 1
    assert "write.sort.cols" not in t.manifest().properties
    assert row_count_task(t.root) == 3  # metadata-only: data untouched


def test_sql_over_view(spark, tmp_path):
    t = _seeded(spark, tmp_path)
    create_view_task(spark, t.root, "repo_files_v")
    n = sql_scalar_task(spark, "SELECT count(*) FROM repo_files_v")
    assert n == 3
    rows = sql_task(
        spark, "SELECT path, content FROM repo_files_v WHERE path = 'p2'"
    ).collect()
    assert [(r.path, r.content) for r in rows] == [("p2", "Test2")]


def test_time_travel_view(spark, tmp_path):
    """create_view_task(version=) — the SQL face of time travel: the
    pinned view keeps serving the old snapshot after a newer epoch
    commits; an unpinned view tracks the registration-time snapshot."""
    t = _seeded(spark, tmp_path)
    v1 = t.latest_version()
    apply_epoch(
        spark, t,
        spark.createDataFrame([ev(9, "update", "p2", "Test2b")], EVENTS_SCHEMA),
        SPEC, MergeMode.DELTA, 1,
    )
    create_view_task(spark, t.root, "rf_now")
    create_view_task(spark, t.root, "rf_v1", version=v1)
    assert sql_scalar_task(
        spark, "SELECT content FROM rf_now WHERE path = 'p2'") == "Test2b"
    assert sql_scalar_task(
        spark, "SELECT content FROM rf_v1 WHERE path = 'p2'") == "Test2"


def test_delete_where_task(spark, tmp_path):
    from etlbox_spark.tasks import delete_where_task

    t = _seeded(spark, tmp_path)
    res = delete_where_task(spark, t.root, "content = 'Test2'")
    assert res["rows_deleted"] == 1
    assert row_count_task(t.root) == 2


def test_fsck_task(spark, tmp_path):
    from etlbox_spark.tasks import fsck_task

    t = _seeded(spark, tmp_path)
    report = fsck_task(t.root, deep=True)
    assert report["ok"] and report["orphans"] == []


def test_load_process_journal(tmp_path):
    lp = LoadProcess(str(tmp_path / "log" / "loads.jsonl"), "nightly_merge")
    lp.start(epoch=7).end(rows_in=100, rows_out=98)
    lp2 = LoadProcess(str(tmp_path / "log" / "loads.jsonl"), "nightly_merge")
    lp2.start(epoch=8)
    lp2.abort("simulated failure")
    events = [(e["event"], e["process"]) for e in lp2.entries()]
    assert events == [
        ("start", "nightly_merge"), ("end", "nightly_merge"),
        ("start", "nightly_merge"), ("abort", "nightly_merge"),
    ]
    assert lp2.entries()[1]["rows_out"] == 98
    assert lp2.entries()[1]["duration_s"] is not None


def test_rollback_table_task(spark, tmp_path):
    from etlbox_spark.tasks import rollback_table_task, truncate_table_task

    t = _seeded(spark, tmp_path)
    good_v = t.latest_version()
    truncate_table_task(t.root, epoch_id=99)
    assert row_count_task(t.root) == 0
    rollback_table_task(t.root, good_v)
    assert row_count_task(t.root) == 3
