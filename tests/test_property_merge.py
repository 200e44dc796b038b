"""Property-based merge semantics (hypothesis): ANY sequence of
insert/update/delete events over a tiny keyspace, split arbitrarily into
epochs, must replay through the engine to exactly the dict a pure-Python
fold produces — including per-row sha256(content) — and the delta log must
record only real transitions.

Spark jobs are slow per example, so we run few, fat examples: each
hypothesis case is a full multi-epoch replay.
"""

from __future__ import annotations

import hashlib

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from etlbox_spark.engine import LakeTable, MergeMode, MergeSpec, apply_epoch
from etlbox_spark.functions.hashing import content_sha256

from .conftest import EVENTS_SCHEMA, REPO_FILES_SCHEMA

SPEC = MergeSpec(compare_cols=("content",))

# events over 2 repos x 3 paths, content from a 3-letter alphabet
_event = st.tuples(
    st.sampled_from(["insert", "update", "delete"]),
    st.sampled_from(["r0", "r1"]),
    st.sampled_from(["a.py", "b.py", "c.py"]),
    st.sampled_from(["x", "y", "z"]),
)
_stream = st.lists(_event, min_size=1, max_size=40)
_cuts = st.lists(st.integers(min_value=1, max_value=39), max_size=3)


def _rows(events):
    out = []
    for seq, (op, repo, path, content) in enumerate(events):
        if op == "delete":
            out.append((seq, op, repo, path, None, None, None))
        else:
            out.append((seq, op, repo, path, f"c{seq}", "py", content))
    return out


def _oracle(events):
    state = {}
    for _seq, (op, repo, path, content) in enumerate(events):
        k = (repo, path)
        if op == "delete":
            state.pop(k, None)
        else:
            state[k] = content
    return state


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(events=_stream, cuts=_cuts)
def test_any_stream_replays_to_oracle_state(spark, tmp_path_factory, events, cuts):
    tmp = tmp_path_factory.mktemp("prop")
    t = LakeTable.create(str(tmp / "t"), REPO_FILES_SCHEMA, ["repo", "path"], 4)

    # arbitrary epoch boundaries (sorted unique cut points)
    rows = _rows(events)
    bounds = sorted({c for c in cuts if c < len(rows)})
    pieces, prev = [], 0
    for b in [*bounds, len(rows)]:
        if b > prev:
            pieces.append(rows[prev:b])
            prev = b

    for ep, piece in enumerate(pieces):
        apply_epoch(spark, t, spark.createDataFrame(piece, EVENTS_SCHEMA),
                    SPEC, MergeMode.DELTA, ep, delta_dir=str(tmp / "d"))

    want = _oracle(events)
    got = {
        (r.repo, r.path): (r.content, r.sha)
        for r in t.read(spark).withColumn("sha", content_sha256()).collect()
    }
    assert set(got) == set(want)
    for k, content in want.items():
        assert got[k][0] == content
        assert got[k][1] == hashlib.sha256(content.encode()).hexdigest()

    # idempotent re-replay of every epoch: nothing changes
    v = t.latest_version()
    for ep, piece in enumerate(pieces):
        apply_epoch(spark, t, spark.createDataFrame(piece, EVENTS_SCHEMA),
                    SPEC, MergeMode.DELTA, ep, delta_dir=str(tmp / "d"))
    assert t.latest_version() == v


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(events=_stream, cuts=_cuts, compact_at=st.integers(min_value=0, max_value=3))
def test_any_stream_replays_to_oracle_state_mor(
    spark, tmp_path_factory, events, cuts, compact_at
):
    """Same property under merge-on-read commits, with a compaction
    injected at an arbitrary epoch boundary: ANY stream, ANY epoch split,
    ANY compaction point must still fold to the pure-Python oracle state,
    and re-replay must be a no-op."""
    tmp = tmp_path_factory.mktemp("prop_mor")
    t = LakeTable.create(str(tmp / "t"), REPO_FILES_SCHEMA, ["repo", "path"], 4,
                         properties={"write.mode": "mor"})

    rows = _rows(events)
    bounds = sorted({c for c in cuts if c < len(rows)})
    pieces, prev = [], 0
    for b in [*bounds, len(rows)]:
        if b > prev:
            pieces.append(rows[prev:b])
            prev = b

    for ep, piece in enumerate(pieces):
        apply_epoch(spark, t, spark.createDataFrame(piece, EVENTS_SCHEMA),
                    SPEC, MergeMode.DELTA, ep)
        if ep == compact_at:
            t.compact(spark)

    want = _oracle(events)
    got = {
        (r.repo, r.path): (r.content, r.sha)
        for r in t.read(spark).withColumn("sha", content_sha256()).collect()
    }
    assert set(got) == set(want)
    for k, content in want.items():
        assert got[k][0] == content
        assert got[k][1] == hashlib.sha256(content.encode()).hexdigest()

    # idempotent re-replay on the (possibly compacted) MOR table
    v = t.latest_version()
    for ep, piece in enumerate(pieces):
        apply_epoch(spark, t, spark.createDataFrame(piece, EVENTS_SCHEMA),
                    SPEC, MergeMode.DELTA, ep)
    assert t.latest_version() == v
    # compacting everything yields the same state with ≤1 file per bucket
    t.compact(spark)
    got2 = {(r.repo, r.path): r.content for r in t.read(spark).collect()}
    assert got2 == {k: v[0] for k, v in got.items()}
