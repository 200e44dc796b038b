"""Per-file key-hash Bloom filters (lake.py _bloom_build /
_prune_by_khash bloom level).

Why this exists: file-level min/max hash ranges prune a MoR delta
backlog only while each delta holds very few keys — a delta file with
even ~tens of uniformly-hashed keys spans nearly the whole 64-bit range,
so every point probe reads every delta of its bucket. The Bloom filter
is per-key membership, so a probe skips exactly the delta files that
don't contain the key (Iceberg puffin / Parquet bloom analog, stored
inline in the manifest; compaction drops the entries).

The invariant under test: NO FALSE NEGATIVES ever (pruning is an
optimization, never a filter) — every file that holds a probed key,
including tombstones, survives pruning; and on overlapping hash ranges
(where min/max prunes nothing) the bloom level does the pruning.
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from etlbox_spark.engine import LakeTable
from etlbox_spark.engine.lake import (
    BUCKET_COL,
    MOR_OP_COL,
    _bloom_build,
    _bloom_may_contain,
)
from etlbox_spark.functions.hashing import bucket_expr, key_hash

from .conftest import REPO_FILES_SCHEMA


# ------------------------------------------------------------- unit level


def test_bloom_no_false_negatives_and_low_fp():
    rng = random.Random(42)
    members = [rng.getrandbits(64) - (1 << 63) for _ in range(500)]
    bloom = _bloom_build(members)
    assert bloom is not None
    for h in members:
        assert _bloom_may_contain(bloom, [h]), "false negative"
    # ~10 bits/key, k=7 → fp ≈ 1%; allow generous slack
    others = [rng.getrandbits(64) - (1 << 63) for _ in range(2000)]
    others = [h for h in others if h not in set(members)]
    fp = sum(1 for h in others if _bloom_may_contain(bloom, [h]))
    assert fp / len(others) < 0.05, f"fp rate {fp / len(others):.3f}"


def test_bloom_deterministic_and_order_independent():
    hs = list(range(-100, 100))
    a = _bloom_build(hs)
    shuffled = list(hs)
    random.Random(7).shuffle(shuffled)
    b = _bloom_build(shuffled)
    assert a == b


def test_bloom_edge_cases():
    assert _bloom_build([]) is None
    assert _bloom_build([None]) is None
    # above the size cap the filter is skipped, never truncated
    assert _bloom_build(list(range(100_000))) is None
    one = _bloom_build([12345])
    assert one is not None and _bloom_may_contain(one, [999, 12345])


# ------------------------------------------------------ lake integration


def _rows_df(spark, rows, n_buckets):
    df = spark.createDataFrame(rows, REPO_FILES_SCHEMA)
    return df.withColumn(BUCKET_COL, bucket_expr(n_buckets, "repo", "path"))


def _key_hash_of(spark, repo, path):
    return int(
        spark.createDataFrame([(repo, path)], "repo string, path string")
        .select(key_hash("repo", "path"))
        .collect()[0][0]
    )


def test_bloom_prunes_overlapping_range_deltas(spark, tmp_path):
    """Each delta epoch writes 20 uniformly-hashed keys into ONE bucket's
    file, so every delta file's [min,max] hash range overlaps every
    other's — the range level keeps them all. The bloom level must keep
    only the delta files actually containing the probed key."""
    t = LakeTable.create(
        str(tmp_path / "bl"), REPO_FILES_SCHEMA, ["repo", "path"], n_buckets=1
    )
    base = _rows_df(
        spark, [(f"r{i}", f"p{i}", "c0", "py", f"base{i}") for i in range(100)], 1
    )
    t.commit_buckets(base, [0], epoch_id=0)

    for e in range(5):
        rows = [
            (f"r{e * 20 + i}", f"p{e * 20 + i}", "c1", "py", f"new{e * 20 + i}")
            for i in range(20)
        ]
        d = _rows_df(spark, rows, 1).withColumn(MOR_OP_COL, F.lit("upsert"))
        t.commit_delta_buckets(d, [0], epoch_id=100 + e)

    m = t.manifest()
    deltas = [e for e in m.files if e.get("kind") == "delta"]
    assert len(deltas) == 5 and all("khash_bloom" in e for e in deltas)

    # key r50/p50 was written by epoch 102 (index 2) only
    h = _key_hash_of(spark, "r50", "p50")
    # range level alone keeps (nearly) all deltas — overlapping ranges
    in_range = [
        e for e in deltas if e["khash_min"] <= h <= e["khash_max"]
    ]
    assert len(in_range) >= 3, "fixture too small to demonstrate overlap"
    kept = LakeTable._prune_by_khash(deltas, [h])
    assert any("-e102-" in e["path"] for e in kept), "false negative: owner pruned"
    assert len(kept) <= 2, f"bloom kept {len(kept)} of 5 delta files"

    got = {(r.repo, r.path, r.content) for r in t.lookup_keys(spark, [("r50", "p50")]).collect()}
    assert got == {("r50", "p50", "new50")}


def test_bloom_admits_tombstones(spark, tmp_path):
    """A probe of a deleted key MUST read the tombstone's delta file
    (bloom contains the key's hash) — otherwise the stale base row
    would resurface."""
    t = LakeTable.create(
        str(tmp_path / "ts"), REPO_FILES_SCHEMA, ["repo", "path"], n_buckets=1
    )
    base = _rows_df(
        spark, [(f"r{i}", f"p{i}", "c0", "py", f"base{i}") for i in range(10)], 1
    )
    t.commit_buckets(base, [0], epoch_id=0)
    d = _rows_df(spark, [("r3", "p3", None, None, None)], 1).withColumn(
        MOR_OP_COL, F.lit("delete")
    )
    t.commit_delta_buckets(d, [0], epoch_id=1)

    h = _key_hash_of(spark, "r3", "p3")
    deltas = [e for e in t.manifest().files if e.get("kind") == "delta"]
    assert LakeTable._prune_by_khash(deltas, [h]) == deltas
    assert t.lookup_keys(spark, [("r3", "p3")]).count() == 0


def test_bloom_property_modes(spark, tmp_path):
    import pytest

    rows = [(f"r{i}", f"p{i}", "c0", "py", f"x{i}") for i in range(5)]
    # none: delta entries carry no bloom
    t0 = LakeTable.create(
        str(tmp_path / "none"), REPO_FILES_SCHEMA, ["repo", "path"], 1,
        properties={"write.bloom": "none"},
    )
    t0.commit_buckets(_rows_df(spark, rows, 1), [0], epoch_id=0)
    d = _rows_df(spark, rows[:2], 1).withColumn(MOR_OP_COL, F.lit("upsert"))
    t0.commit_delta_buckets(d, [0], epoch_id=1)
    assert not any("khash_bloom" in e for e in t0.manifest().files)

    # all: base files carry blooms too (they fit the size cap here)
    t1 = LakeTable.create(
        str(tmp_path / "all"), REPO_FILES_SCHEMA, ["repo", "path"], 1,
        properties={"write.bloom": "all"},
    )
    t1.commit_buckets(_rows_df(spark, rows, 1), [0], epoch_id=0)
    assert all("khash_bloom" in e for e in t1.manifest().files)

    with pytest.raises(ValueError, match="write.bloom"):
        LakeTable.create(
            str(tmp_path / "bad"), REPO_FILES_SCHEMA, ["repo", "path"], 1,
            properties={"write.bloom": "yes"},
        )
