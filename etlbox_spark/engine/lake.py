"""From-scratch Iceberg-*semantics* lake tables on plain Parquet (M0).

No Iceberg/Delta/Hudi jars ship with this PySpark install (SURVEY.md §1.2),
so the table format is ours. It provides exactly the guarantees the engine
needs (BASELINE.json:6,14):

* **Atomic commits** — a snapshot is a JSON manifest ``meta/v{N}.json``;
  the *only* mutation visible to readers is the atomic ``os.replace`` of
  the ``meta/_latest`` pointer. A crash anywhere before the pointer swap
  leaves the previous snapshot intact (orphan data files are ignored).
* **Idempotent / exactly-once epochs** — each manifest carries the set of
  ``committed_epochs``; committing an epoch already in the set is a no-op,
  so replay after failure converges to the identical table state.
* **Copy-on-write at bucket granularity** — rows are hash-bucketed by the
  logical key; a commit rewrites only the buckets it touches, untouched
  buckets' files carry over by reference. This is what keeps a merge of a
  small epoch cheap on a 100 TB table: the scan and the write are pruned
  to touched buckets (partition pruning lives in the manifest, not in
  directory listing).
* **Schema evolution** — the manifest stores every schema version; each
  data file records the schema version it was written under. Reads align
  old files to the current schema (missing columns → null backfill,
  widened types → cast), so column-add and type-widen never rewrite data.
* **Time travel (for tests)** — any ``meta/v{N}.json`` can be read back.

Commit protocol follows the Delta Lake paper's optimistic protocol
(PAPERS.md) restricted to a single writer (the epoch runner is the only
writer; Spark executors write data files but never metadata).

Layout::

    <root>/
      meta/v1.json  v2.json ...   # immutable snapshot manifests
      meta/_latest                # pointer file, atomic-rename'd
      data/c{version}-e{epoch}/bucket_p=<K>/part-*.parquet

Data files keep ``bucket`` as a *regular* column (single-valued per file,
so parquet row-group stats make bucket filters free) while the write is
directory-partitioned on a ``bucket_p`` copy — this lets the manifest map
file → bucket without relying on Spark partition-discovery over mixed
directory layouts.
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import dataclass, field
from typing import Any

import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

BUCKET_COL = "bucket"
_WRITE_PARTITION_COL = "bucket_p"


def _atomic_write(path: str, payload: str) -> None:
    tmp = f"{path}.tmp.{uuid.uuid4().hex[:8]}"
    with open(tmp, "w", encoding="utf-8") as f:
        f.write(payload)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)  # atomic on POSIX


@dataclass
class Manifest:
    version: int
    key_cols: list[str]
    n_buckets: int
    current_schema_version: int
    # schema_version (str key, JSON) -> StructType.jsonValue()
    schemas: dict[str, Any]
    # file entries: {path (rel to root), bucket, rows, schema_version}
    files: list[dict[str, Any]]
    committed_epochs: list[int]
    parent: int | None = None
    properties: dict[str, Any] = field(default_factory=dict)

    def schema(self, version: int | None = None) -> T.StructType:
        v = version if version is not None else self.current_schema_version
        return T.StructType.fromJson(self.schemas[str(v)])

    def to_json(self) -> str:
        return json.dumps(self.__dict__, sort_keys=True, indent=1)

    @staticmethod
    def from_json(s: str) -> "Manifest":
        return Manifest(**json.loads(s))

    @property
    def total_rows(self) -> int:
        return sum(f["rows"] for f in self.files)


class LakeTable:
    """A single lake table rooted at a directory. Single-writer."""

    def __init__(self, root: str):
        self.root = root

    # ---------------------------------------------------------------- meta
    @property
    def _meta_dir(self) -> str:
        return os.path.join(self.root, "meta")

    @property
    def _data_dir(self) -> str:
        return os.path.join(self.root, "data")

    def _pointer_path(self) -> str:
        return os.path.join(self._meta_dir, "_latest")

    def exists(self) -> bool:
        return os.path.exists(self._pointer_path())

    def latest_version(self) -> int:
        with open(self._pointer_path(), encoding="utf-8") as f:
            return int(f.read().strip())

    def manifest(self, version: int | None = None) -> Manifest:
        v = version if version is not None else self.latest_version()
        with open(os.path.join(self._meta_dir, f"v{v}.json"), encoding="utf-8") as f:
            return Manifest.from_json(f.read())

    def _publish(self, m: Manifest) -> None:
        """Write manifest v{N}, then atomically swap the pointer."""
        os.makedirs(self._meta_dir, exist_ok=True)
        mpath = os.path.join(self._meta_dir, f"v{m.version}.json")
        _atomic_write(mpath, m.to_json())
        _atomic_write(self._pointer_path(), str(m.version))

    # -------------------------------------------------------------- create
    @staticmethod
    def create(
        root: str,
        schema: T.StructType,
        key_cols: list[str],
        n_buckets: int = 32,
        properties: dict[str, Any] | None = None,
    ) -> "LakeTable":
        """CreateTableTask analog (SURVEY.md §2.10). Data schema must NOT
        include the bucket column — the engine derives it from key_cols."""
        if BUCKET_COL in schema.names:
            raise ValueError(f"schema must not contain reserved column {BUCKET_COL!r}")
        for k in key_cols:
            if k not in schema.names:
                raise ValueError(f"key column {k!r} not in schema")
        t = LakeTable(root)
        if t.exists():
            raise FileExistsError(f"table already exists at {root}")
        os.makedirs(t._data_dir, exist_ok=True)
        m = Manifest(
            version=0,
            key_cols=list(key_cols),
            n_buckets=n_buckets,
            current_schema_version=1,
            schemas={"1": schema.jsonValue()},
            files=[],
            committed_epochs=[],
            parent=None,
            properties=properties or {},
        )
        t._publish(m)
        return t

    @staticmethod
    def load(root: str) -> "LakeTable":
        t = LakeTable(root)
        if not t.exists():
            raise FileNotFoundError(f"no lake table at {root}")
        return t

    def drop(self) -> None:
        """DropTableTask analog — removes the pointer (data left for GC)."""
        os.remove(self._pointer_path())

    # ---------------------------------------------------------------- read
    def _stored_schema(self, m: Manifest, schema_version: int) -> T.StructType:
        """On-disk schema of files at a schema version: data cols + bucket."""
        s = m.schema(schema_version)
        return T.StructType(list(s.fields) + [T.StructField(BUCKET_COL, T.IntegerType(), False)])

    def read(
        self,
        spark: SparkSession,
        buckets: list[int] | None = None,
        version: int | None = None,
        with_bucket: bool = True,
    ) -> DataFrame:
        """Read a snapshot, pruned to ``buckets`` if given.

        Pruning happens here, against the manifest's file list — Spark
        never even sees files of untouched buckets (manifest-level
        partition pruning, the lake analog of Iceberg's).
        """
        m = self.manifest(version)
        entries = m.files
        if buckets is not None:
            bset = set(buckets)
            entries = [e for e in entries if e["bucket"] in bset]

        cur = m.schema()
        out_cols = ([*cur.names, BUCKET_COL] if with_bucket else list(cur.names))

        if not entries:
            return spark.createDataFrame([], self._stored_schema(m, m.current_schema_version)).select(*out_cols)

        # group files by schema version; align old generations to current
        by_ver: dict[int, list[str]] = {}
        for e in entries:
            by_ver.setdefault(e["schema_version"], []).append(os.path.join(self.root, e["path"]))

        parts: list[DataFrame] = []
        for ver, paths in sorted(by_ver.items()):
            df = spark.read.schema(self._stored_schema(m, ver)).parquet(*paths)
            # null-backfill added columns, cast widened columns
            exprs = []
            for fld in cur.fields:
                if fld.name in df.columns:
                    exprs.append(F.col(fld.name).cast(fld.dataType).alias(fld.name))
                else:
                    exprs.append(F.lit(None).cast(fld.dataType).alias(fld.name))
            exprs.append(F.col(BUCKET_COL))
            parts.append(df.select(*exprs))
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)
        return df.select(*out_cols)

    def is_committed(self, epoch_id: int) -> bool:
        return epoch_id in self.manifest().committed_epochs

    # --------------------------------------------------------------- write
    def _write_data(self, df: DataFrame, commit_dir_name: str) -> list[dict[str, Any]]:
        """Write rows (must carry BUCKET_COL) under data/<commit_dir>/,
        one directory per bucket; return manifest file entries."""
        out = os.path.join(self._data_dir, commit_dir_name)
        (
            # range-partition on bucket: ~one reducer per bucket (hash
            # repartition collides buckets onto shared reducers, leaving
            # stragglers + idle slots), so partitionBy emits one file per
            # bucket per commit and the manifest stays compact
            df.withColumn(_WRITE_PARTITION_COL, F.col(BUCKET_COL))
            .repartitionByRange(F.col(BUCKET_COL))
            # overwrite: until the manifest references this directory it
            # is garbage by definition, and a crashed attempt leaves one
            # behind — error-if-exists would make the RETRY of a failed
            # epoch fail (found by tests/test_crash_injection.py)
            .write.mode("overwrite")
            .partitionBy(_WRITE_PARTITION_COL)
            .parquet(out)
        )
        entries: list[dict[str, Any]] = []
        for d in sorted(os.listdir(out)):
            if not d.startswith(f"{_WRITE_PARTITION_COL}="):
                continue
            bucket = int(d.split("=", 1)[1])
            bdir = os.path.join(out, d)
            for fn in sorted(os.listdir(bdir)):
                if not fn.endswith(".parquet"):
                    continue
                fpath = os.path.join(bdir, fn)
                rows = pq.ParquetFile(fpath).metadata.num_rows
                if rows == 0:
                    continue
                entries.append(
                    {
                        "path": os.path.relpath(fpath, self.root),
                        "bucket": bucket,
                        "rows": rows,
                        "schema_version": None,  # stamped by caller
                    }
                )
        return entries

    def commit_buckets(
        self,
        df: DataFrame,
        changed_buckets: list[int],
        epoch_id: int,
        new_schema: T.StructType | None = None,
    ) -> int:
        """Replace the contents of ``changed_buckets`` with ``df`` (which
        must hold *all* surviving rows of exactly those buckets, incl. the
        ``bucket`` column), atomically, stamped with ``epoch_id``.

        Idempotent: if ``epoch_id`` is already committed this is a no-op.
        Returns the new (or current) snapshot version.
        """
        m = self.manifest()
        if epoch_id in m.committed_epochs:
            return m.version
        new_ver = m.version + 1
        schemas = dict(m.schemas)
        cur_sv = m.current_schema_version
        if new_schema is not None and new_schema.jsonValue() != m.schema().jsonValue():
            cur_sv += 1
            schemas[str(cur_sv)] = new_schema.jsonValue()

        changed = set(changed_buckets)
        keep = [e for e in m.files if e["bucket"] not in changed]
        new_entries: list[dict[str, Any]] = []
        if changed:
            new_entries = self._write_data(df, f"c{new_ver}-e{epoch_id}")
            for e in new_entries:
                e["schema_version"] = cur_sv
                if e["bucket"] not in changed:
                    raise RuntimeError(
                        f"commit wrote bucket {e['bucket']} outside changed set {sorted(changed)}"
                    )
        nm = Manifest(
            version=new_ver,
            key_cols=m.key_cols,
            n_buckets=m.n_buckets,
            current_schema_version=cur_sv,
            schemas=schemas,
            files=keep + new_entries,
            committed_epochs=sorted([*m.committed_epochs, epoch_id]),
            parent=m.version,
            properties=m.properties,
        )
        self._publish(nm)
        return new_ver

    def overwrite(self, df: DataFrame, epoch_id: int) -> int:
        """Truncate-and-reload fast path (ETLBox UseTruncateMethod,
        SURVEY.md §4): replace the whole table in one atomic commit."""
        m = self.manifest()
        if epoch_id in m.committed_epochs:
            return m.version
        all_buckets = list(range(m.n_buckets))
        return self.commit_buckets(df, all_buckets, epoch_id)

    def truncate(self, epoch_id: int) -> int:
        """TruncateTableTask analog: new empty snapshot."""
        m = self.manifest()
        if epoch_id in m.committed_epochs:
            return m.version
        nm = Manifest(
            version=m.version + 1,
            key_cols=m.key_cols,
            n_buckets=m.n_buckets,
            current_schema_version=m.current_schema_version,
            schemas=dict(m.schemas),
            files=[],
            committed_epochs=sorted([*m.committed_epochs, epoch_id]),
            parent=m.version,
            properties=m.properties,
        )
        self._publish(nm)
        return nm.version

    # -------------------------------------------------------- maintenance
    def rebucket(self, spark: SparkSession, new_n_buckets: int) -> int:
        """Change the key-hash bucket count (layout evolution).

        Copy-on-write commits replace whole buckets, so this table never
        fragments within a bucket (≤ 1 live file each) — the maintenance
        op that matters at scale is instead growing the bucket count as
        the table grows (32 buckets at GBs vs thousands at 100 TB: a
        bucket is the unit of commit rewrite, snapshot pruning and merge
        parallelism). Rewrites every row under the new bucket function in
        one atomic commit; logical content untouched, epoch markers
        preserved, so subsequent merges are unaffected. Crash mid-way
        leaves the old manifest live (orphans reclaimed by vacuum).
        """
        from ..functions.hashing import bucket_expr

        m = self.manifest()
        if new_n_buckets == m.n_buckets:
            return m.version
        df = self.read(spark, with_bucket=False).withColumn(
            BUCKET_COL, bucket_expr(new_n_buckets, *m.key_cols)
        )
        new_ver = m.version + 1
        entries = self._write_data(df, f"rebucket-v{new_ver}")
        for e in entries:
            e["schema_version"] = m.current_schema_version
        nm = Manifest(
            version=new_ver,
            key_cols=m.key_cols,
            n_buckets=new_n_buckets,
            current_schema_version=m.current_schema_version,
            schemas=dict(m.schemas),
            files=entries,
            committed_epochs=list(m.committed_epochs),
            parent=m.version,
            properties=m.properties,
        )
        self._publish(nm)
        return new_ver

    def vacuum(self, keep_versions: int = 1) -> dict[str, int]:
        """Delete data files referenced only by manifests older than the
        newest ``keep_versions`` (Iceberg expire_snapshots + orphan-file
        removal). Time travel remains possible within the kept window.
        Returns {files_deleted, manifests_deleted, bytes_freed}."""
        latest = self.latest_version()
        keep = set(range(max(0, latest - keep_versions + 1), latest + 1))
        referenced: set[str] = set()
        for v in keep:
            for e in self.manifest(v).files:
                referenced.add(os.path.normpath(os.path.join(self.root, e["path"])))
        stats = {"files_deleted": 0, "manifests_deleted": 0, "bytes_freed": 0}
        for dirpath, _dirs, files in os.walk(self._data_dir):
            for fn in files:
                p = os.path.normpath(os.path.join(dirpath, fn))
                if p not in referenced:
                    stats["bytes_freed"] += os.path.getsize(p)
                    os.remove(p)
                    stats["files_deleted"] += 1
        for fn in os.listdir(self._meta_dir):
            if fn.startswith("v") and fn.endswith(".json"):
                try:
                    v = int(fn[1:-5])
                except ValueError:
                    continue
                if v not in keep:
                    os.remove(os.path.join(self._meta_dir, fn))
                    stats["manifests_deleted"] += 1
        return stats

    # ------------------------------------------------------- introspection
    def row_count(self) -> int:
        """RowCountTask analog — manifest stats, no scan."""
        return self.manifest().total_rows

    def schema(self, version: int | None = None) -> T.StructType:
        return self.manifest().schema(version)
