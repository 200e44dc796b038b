"""Mid-stream schema evolution through the merge core (SURVEY.md §7 M4;
BASELINE.json:6 "applies schema evolution (column add/type-widen)").

Epoch 0 lands the v1 shape; epoch 1 arrives with a new column and a
widened type. apply_epoch must bump the table schema, null-backfill old
rows on read, and keep merge semantics intact across the generations.
"""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from etlbox_spark.engine import LakeTable, MergeMode, MergeSpec, apply_epoch, evolve_schema

BASE_SCHEMA = T.StructType(
    [
        T.StructField("repo", T.StringType(), False),
        T.StructField("path", T.StringType(), False),
        T.StructField("content", T.StringType(), True),
        T.StructField("stars", T.IntegerType(), True),
    ]
)

SPEC = MergeSpec(compare_cols=("content",))


def _events_schema(extra=None, stars_type=T.IntegerType()):
    fields = [
        T.StructField("event_seq", T.LongType(), False),
        T.StructField("op", T.StringType(), False),
        T.StructField("repo", T.StringType(), False),
        T.StructField("path", T.StringType(), False),
        T.StructField("content", T.StringType(), True),
        T.StructField("stars", stars_type, True),
    ]
    return T.StructType(fields + (extra or []))


def test_evolve_schema_add_and_widen():
    batch = _events_schema(
        extra=[T.StructField("size_bytes", T.LongType(), True)],
        stars_type=T.LongType(),
    )
    out = evolve_schema(BASE_SCHEMA, batch, SPEC)
    assert out is not None
    by_name = {f.name: f.dataType for f in out.fields}
    assert by_name["size_bytes"] == T.LongType()          # column add
    assert by_name["stars"] == T.LongType()               # int -> long widen
    assert by_name["content"] == T.StringType()           # untouched
    # engine columns (op, event_seq) never leak into the table schema
    assert "op" not in by_name and "event_seq" not in by_name
    # already-covered batch -> no-op
    assert evolve_schema(out, batch, SPEC) is None


def test_evolve_schema_never_narrows():
    wide = T.StructType(
        [f if f.name != "stars" else T.StructField("stars", T.LongType(), True)
         for f in BASE_SCHEMA.fields]
    )
    narrow_batch = _events_schema(stars_type=T.IntegerType())
    assert evolve_schema(wide, narrow_batch, SPEC) is None


def test_mid_stream_column_add_and_widen(spark, tmp_path):
    t = LakeTable.create(str(tmp_path / "t"), BASE_SCHEMA, ["repo", "path"], 4)

    e0 = spark.createDataFrame(
        [(1, "insert", "r0", "a.py", "v1", 3), (2, "insert", "r0", "b.py", "v1", 7)],
        _events_schema(),
    )
    apply_epoch(spark, t, e0, SPEC, MergeMode.DELTA, 0)
    assert t.manifest().current_schema_version == 1

    # epoch 1: stars widened to long, size_bytes added; b.py updated
    e1 = spark.createDataFrame(
        [(3, "update", "r0", "b.py", "v2", 2**40, 123),
         (4, "insert", "r0", "c.py", "v1", 1, 456)],
        _events_schema(extra=[T.StructField("size_bytes", T.LongType(), True)],
                       stars_type=T.LongType()),
    )
    apply_epoch(spark, t, e1, SPEC, MergeMode.DELTA, 1)

    m = t.manifest()
    assert m.current_schema_version == 2
    by_name = {f.name: f.dataType for f in m.schema().fields}
    assert by_name["stars"] == T.LongType()
    assert by_name["size_bytes"] == T.LongType()

    rows = {r.path: r for r in t.read(spark).collect()}
    assert rows["b.py"].content == "v2" and rows["b.py"].stars == 2**40
    assert rows["b.py"].size_bytes == 123
    # a.py untouched in epoch 1: old-generation file aligned to new schema
    assert rows["a.py"].stars == 3 and rows["a.py"].size_bytes is None
    assert rows["c.py"].size_bytes == 456

    # epoch 2 arrives back in the OLD shape (no size_bytes, int stars):
    # schema stays v2, missing column lands as null for the new row
    e2 = spark.createDataFrame(
        [(5, "insert", "r0", "d.py", "v1", 9)], _events_schema(),
    )
    apply_epoch(spark, t, e2, SPEC, MergeMode.DELTA, 2)
    assert t.manifest().current_schema_version == 2
    rows = {r.path: r for r in t.read(spark).collect()}
    assert rows["d.py"].size_bytes is None and rows["d.py"].stars == 9
    # earlier generations still correct after the third write
    assert rows["b.py"].size_bytes == 123 and rows["a.py"].size_bytes is None


def test_numeric_key_at_mismatched_width_keeps_bucket(spark, tmp_path):
    """ADVICE r01: xxhash64 hashes int and long differently, so a numeric
    key arriving wider than the table type must be canonicalized BEFORE
    bucketing — otherwise DELTA mode never scans the stored row's bucket
    and the same logical key duplicates as an insert."""
    schema = T.StructType([
        T.StructField("user_id", T.IntegerType(), False),
        T.StructField("content", T.StringType(), True),
    ])
    spec = MergeSpec(key_cols=("user_id",), compare_cols=("content",))
    t = LakeTable.create(str(tmp_path / "t"), schema, ["user_id"], 8)

    ev_schema_int = T.StructType([
        T.StructField("event_seq", T.LongType(), False),
        T.StructField("op", T.StringType(), False),
        T.StructField("user_id", T.IntegerType(), False),
        T.StructField("content", T.StringType(), True),
    ])
    e0 = spark.createDataFrame([(1, "insert", 42, "v1")], ev_schema_int)
    apply_epoch(spark, t, e0, spec, MergeMode.DELTA, 0)

    # same logical key arrives as LONG
    ev_schema_long = T.StructType([
        T.StructField("event_seq", T.LongType(), False),
        T.StructField("op", T.StringType(), False),
        T.StructField("user_id", T.LongType(), False),
        T.StructField("content", T.StringType(), True),
    ])
    e1 = spark.createDataFrame([(2, "update", 42, "v2")], ev_schema_long)
    res = apply_epoch(spark, t, e1, spec, MergeMode.DELTA, 1)

    rows = t.read(spark).collect()
    assert len(rows) == 1, f"duplicate key rows: {rows}"
    assert rows[0].content == "v2"
    assert res.counts == {"update": 1}
    # key column type is NOT widened (bucket layout pinned to table type)
    assert t.manifest().schema()["user_id"].dataType == T.IntegerType()


def test_read_changes_spans_schema_evolution(spark, tmp_path):
    """The change feed must survive a mid-stream column add + widen:
    Spark's mergeSchema refuses int->long across files, so read_changes
    groups epochs into schema generations and aligns them (typed nulls
    for pre-evolution epochs, upcasts for widened columns)."""
    from etlbox_spark.engine.merge import read_changes

    t = LakeTable.create(str(tmp_path / "t"), BASE_SCHEMA, ["repo", "path"], 4)
    d = str(tmp_path / "delta")
    e0 = spark.createDataFrame(
        [(1, "insert", "r0", "a.py", "v1", 3)], _events_schema()
    )
    apply_epoch(spark, t, e0, SPEC, MergeMode.DELTA, 0, delta_dir=d)
    e1 = spark.createDataFrame(
        [(3, "update", "r0", "a.py", "v2", 2**40, 123)],
        _events_schema(extra=[T.StructField("size_bytes", T.LongType(), True)],
                       stars_type=T.LongType()),
    )
    apply_epoch(spark, t, e1, SPEC, MergeMode.DELTA, 1, delta_dir=d)

    feed = read_changes(spark, d)
    by = {f.name: f.dataType for f in feed.schema.fields}
    assert by["stars"] == T.LongType()  # widened across the whole feed
    assert by["size_bytes"] == T.LongType()  # added column visible everywhere
    rows = {int(r.epoch): r for r in feed.collect()}
    assert rows[0].action == "insert" and rows[0].stars == 3
    assert rows[0].size_bytes is None  # pre-evolution epoch: typed null
    assert rows[1].action == "update" and rows[1].stars == 2**40
    assert rows[1].size_bytes == 123

    # bounded range that selects only the pre-evolution generation still
    # reports that generation's own schema without error
    old = read_changes(spark, d, to_epoch=0)
    assert {int(r.epoch) for r in old.collect()} == {0}

    # caught-up consumer (from_epoch past the head) = EMPTY feed with the
    # newest generation's schema, not an error — it's the steady state of
    # the documented tailing pattern
    ahead = read_changes(spark, d, from_epoch=99)
    assert ahead.count() == 0
    assert {f.name: f.dataType for f in ahead.schema.fields}["stars"] == T.LongType()

    # only a log with no committed epochs at all is an error
    import pytest as _pt
    with _pt.raises(FileNotFoundError):
        read_changes(spark, str(tmp_path / "nonexistent"))


def test_rollback_across_type_widen_then_reapply(spark, tmp_path):
    """Rollback across a schema evolution: the target snapshot's schema
    HISTORY is restored (current_schema_version reverts with the files),
    old-generation reads keep working, and re-applying the widening
    epoch re-evolves the schema and converges on the pre-rollback state."""
    t = LakeTable.create(str(tmp_path / "t"), BASE_SCHEMA, ["repo", "path"], 4)
    e0 = spark.createDataFrame(
        [(1, "insert", "r0", "a.py", "v1", 3)], _events_schema(),
    )
    apply_epoch(spark, t, e0, SPEC, MergeMode.DELTA, 0)
    v1 = t.latest_version()

    wide = _events_schema(extra=[T.StructField("size_bytes", T.LongType(), True)],
                          stars_type=T.LongType())
    e1 = spark.createDataFrame([(2, "update", "r0", "a.py", "v2", 2**40, 99)], wide)
    apply_epoch(spark, t, e1, SPEC, MergeMode.DELTA, 1)
    assert t.manifest().current_schema_version == 2
    want = {r.path: (r.content, r.stars, r.size_bytes) for r in t.read(spark).collect()}

    t.rollback(v1)
    m = t.manifest()
    assert m.current_schema_version == 1
    assert {f.name for f in m.schema().fields} == {"repo", "path", "content", "stars"}
    rows = {r.path: r for r in t.read(spark).collect()}
    assert rows["a.py"].content == "v1" and rows["a.py"].stars == 3
    assert not hasattr(rows["a.py"], "size_bytes")

    # the widening epoch re-applies: schema re-evolves, state converges
    apply_epoch(spark, t, e1, SPEC, MergeMode.DELTA, 1)
    assert t.manifest().current_schema_version == 2
    got = {r.path: (r.content, r.stars, r.size_bytes) for r in t.read(spark).collect()}
    assert got == want
