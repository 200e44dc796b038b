"""Property-based robustness of the integrity audit (hypothesis):
``fsck`` exists to be pointed at DAMAGED tables, so for ANY combination
of on-disk corruptions — deleted / truncated / byte-flipped / garbage-
rewritten / renamed files anywhere under the table root or the change
log — it must return a report, never raise and never hang. When a
corruption touches state fsck audits (metadata, data files, the change
log), the report must additionally not be silently clean unless the
damage was provably benign (an orphan/warning-class target or bytes
parquet never reads: truncation and mid-file flips can land in dead
zones between the footer and the read row groups, and a renamed data
file is pure-warning surface — so the hard assertion is raised only
for metadata-record damage, where every byte is parsed).

Spark builds the fixture once; each example fuzzes a fresh copy of the
tree driver-side (fsck's default pass is pure metadata, so examples are
cheap). ``derandomize``: a pass is a pass forever (CLAUDE.md).
"""

from __future__ import annotations

import json
import os
import shutil

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from etlbox_spark.engine import LakeTable, MergeMode, MergeSpec, apply_epoch

from .conftest import EVENTS_SCHEMA, REPO_FILES_SCHEMA, ev

SPEC = MergeSpec(compare_cols=("content",))

EPOCHS = [
    [ev(1, "insert", "p1", "a1"), ev(2, "insert", "p2", "b1"), ev(3, "insert", "p3", "c1")],
    [ev(10, "update", "p2", "b2"), ev(11, "delete", "p1"), ev(12, "insert", "p4", "d1")],
    [ev(20, "insert", "p1", "a2"), ev(21, "update", "p4", "d2"), ev(22, "delete", "p3")],
]


@pytest.fixture(scope="module")
def pristine(spark, tmp_path_factory):
    """One rich table + change log: MoR deltas (inline blooms), an
    emitting delete_where (maintenance set), a tag, a vacuum (writes a
    compaction checkpoint sidecar)."""
    base = tmp_path_factory.mktemp("fsck_fuzz")
    root, delta = str(base / "t"), str(base / "log")
    t = LakeTable.create(
        root, REPO_FILES_SCHEMA, ["repo", "path"], 4, properties={"write.mode": "mor"}
    )
    for i, rows in enumerate(EPOCHS):
        apply_epoch(
            spark, t, spark.createDataFrame(rows, EVENTS_SCHEMA), SPEC,
            MergeMode.DELTA, i, delta_dir=delta,
        )
    t.delete_where(spark, "path = 'p2'", emit_changes=True, delta_dir=delta)
    t.tag("release", t.latest_version())
    t.vacuum(keep_versions=2, grace_s=-1.0)
    r = t.fsck(deep=True, delta_dir=delta)
    assert r["ok"], r["errors"]
    return base


def _targets(root: str) -> list:
    out = []
    for dirpath, _dirs, files in os.walk(root):
        for fn in sorted(files):
            out.append(os.path.join(dirpath, fn))
    return sorted(out)


# (mutation kind, position fraction) — applied to a target picked by index
_corruption = st.tuples(
    st.sampled_from(
        ["delete", "truncate", "flip", "garbage", "jsonlist", "rename", "mangle"]
    ),
    st.integers(min_value=0, max_value=10_000),  # target index (mod #files)
    st.floats(min_value=0.0, max_value=1.0),     # offset/length fraction
)


def _apply(kind: str, path: str, frac: float) -> None:
    size = os.path.getsize(path)
    if kind == "delete":
        os.remove(path)
    elif kind == "truncate":
        with open(path, "r+b") as f:
            f.truncate(int(size * frac))
    elif kind == "flip":
        if size == 0:
            return
        off = min(size - 1, int(size * frac))
        with open(path, "r+b") as f:
            f.seek(off)
            b = f.read(1)
            f.seek(off)
            f.write(bytes([b[0] ^ 0xFF]))
    elif kind == "garbage":
        with open(path, "w", encoding="utf-8") as f:
            f.write('{"version": "yes", "parent": []')
    elif kind == "jsonlist":
        # valid JSON, wrong shape — a non-object record must be
        # contained as TypeError, not AttributeError (_manifest_from_dict)
        with open(path, "w", encoding="utf-8") as f:
            f.write("[1, 2, 3]")
    elif kind == "mangle":
        # structured tamper: keep valid JSON, type-mangle one field —
        # the class byte-flips can't reach (files→strings, properties→
        # list, epochs→mixed types / absurd runs, version→string)
        if not path.endswith(".json"):
            return
        try:
            with open(path, encoding="utf-8") as f:
                doc = json.load(f)
        except (json.JSONDecodeError, UnicodeDecodeError, OSError):
            return
        if not isinstance(doc, dict) or not doc:
            return
        keys = sorted(doc)
        k = keys[int(frac * 1000) % len(keys)]
        mangles = [
            "not-an-object",
            ["x"],
            {"a": 1},
            [[0, 10**15]],
            [1, "two", None],
            -1,
        ]
        doc[k] = mangles[int(frac * 7919) % len(mangles)]
        with open(path, "w", encoding="utf-8") as f:
            json.dump(doc, f)
    elif kind == "rename":
        os.replace(path, path + ".fuzzed")


@settings(
    max_examples=60,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(_corruption, min_size=1, max_size=3))
def test_fsck_never_raises_on_corruption(pristine, tmp_path_factory, corruptions):
    work = tmp_path_factory.mktemp("fuzzcase")
    shutil.copytree(pristine / "t", work / "t")
    shutil.copytree(pristine / "log", work / "log")
    root, delta = str(work / "t"), str(work / "log")
    meta_damage = False
    for kind, idx, frac in corruptions:
        files = _targets(str(work))
        if not files:
            break
        path = files[idx % len(files)]
        rel = os.path.relpath(path, str(work))
        if rel.startswith(os.path.join("t", "meta")) and kind != "rename":
            # every metadata byte is parsed => damage must surface
            # (renames are orphan/stray-file surface, warning-class)
            meta_damage = True
        _apply(kind, path, frac)
    try:
        t = LakeTable.load(root)
    except FileNotFoundError:
        return  # pointer destroyed — documented load failure, not a hang
    report = t.fsck(deep=True, delta_dir=delta)
    assert isinstance(report, dict) and "ok" in report and "errors" in report
    if meta_damage and report["ok"]:
        # the ONLY benign metadata mutations are those that leave every
        # retained record byte-identical in meaning; a full re-audit of
        # the pristine copy must then also be clean AND agree on counts
        clean = LakeTable.load(str(pristine / "t")).fsck(
            deep=True, delta_dir=str(pristine / "log")
        )
        assert report["checked"] == clean["checked"], (
            "metadata damage vanished without an error or a checked-count change"
        )
