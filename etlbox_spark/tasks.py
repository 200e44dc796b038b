"""Control-flow tasks (SURVEY.md §2.10) — ETLBox's ControlFlow/Logging
verb surface re-expressed over the lake layer + Spark catalog.

Reference parity [U ETLBox/src/Toolbox/ControlFlow/*.cs]:
CreateTableTask / DropTableTask / TruncateTableTask / RowCountTask /
IfTableOrViewExistsTask / GetTableDefinitionTask / CreateViewTask /
SqlTask, plus the StartLoadProcess/EndLoadProcess logging pair. ETLBox
executes these against an external RDBMS; here the "database" is the
lake (our from-scratch Iceberg-semantics tables) and Spark's temp-view
catalog, so each task is a thin, explicit verb — the value is the
stable API surface, not the one-liner bodies.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from .engine.lake import LakeTable


# ------------------------------------------------------------------ DDL
def create_table_task(
    root: str, schema: T.StructType, key_cols: list[str], n_buckets: int = 32
) -> LakeTable:
    """CreateTableTask: create an empty lake table (errors if present)."""
    return LakeTable.create(root, schema, key_cols, n_buckets=n_buckets)


def drop_table_task(root: str) -> None:
    """DropTableTask: drop the table (pointer removed, data left for GC)."""
    LakeTable.load(root).drop()


def truncate_table_task(root: str, epoch_id: int) -> int:
    """TruncateTableTask: new empty snapshot (data files retained for
    time travel); returns the new version."""
    return LakeTable.load(root).truncate(epoch_id)


def alter_table_properties_task(
    root: str, props: dict | None = None, unset: list[str] | None = None
) -> int:
    """CreateTableTask.Alter analog, scoped to the properties the lake
    actually honors (ALTER TABLE SET/UNSET TBLPROPERTIES): retune write
    layout (``write.sort.cols``, ``write.parquet.block.size``), commit
    strategy (``write.mode``) or compaction policy on a LIVE table —
    metadata-only commit, next write picks it up. Returns the version."""
    return LakeTable.load(root).set_properties(props, unset=unset)


def rollback_table_task(root: str, to_version: int) -> int:
    """RESTORE TABLE ... VERSION AS OF analog: metadata-only commit that
    re-references snapshot ``to_version``'s files, schema AND epoch
    markers — the bad-epoch escape hatch (rolled-back epochs re-apply on
    the next replay, earlier epochs stay no-ops). Returns the version."""
    return LakeTable.load(root).rollback(to_version)


def delete_where_task(spark: SparkSession, root: str, condition: str) -> dict:
    """DELETE FROM <table> WHERE <condition> analog: rewrites only the
    buckets holding matching rows (SQL NULL semantics — NULL-condition
    rows are kept); revertable via ``rollback_table_task``. Returns
    {rows_deleted, buckets_rewritten, version}."""
    return LakeTable.load(root).delete_where(spark, condition)


def fsck_task(
    root: str,
    deep: bool = False,
    delta_dir: str | None = None,
    spark: SparkSession | None = None,
) -> dict:
    """Read-only integrity audit (engine/fsck.py): manifest chain,
    checkpoint agreement, file liveness, bloom membership (``deep``),
    tag pins, orphans, and — with ``delta_dir`` — the change log's
    rename-protocol invariants. Returns the report dict. With ``spark``
    and ``deep=True`` the footer scan runs distributed."""
    return LakeTable.load(root).fsck(deep=deep, delta_dir=delta_dir, spark=spark)


def create_view_task(
    spark: SparkSession, root: str, view_name: str, version: int | None = None
) -> DataFrame:
    """CreateViewTask: register a snapshot as a temp view so SqlTask-style
    SQL can address it. ``version`` pins a retained older snapshot —
    the SQL face of time travel (SELECT ... VERSION AS OF): the view
    keeps serving that snapshot's rows even as new epochs commit."""
    df = LakeTable.load(root).read(spark, with_bucket=False, version=version)
    df.createOrReplaceTempView(view_name)
    return df


# -------------------------------------------------------- introspection
def if_table_exists_task(root: str) -> bool:
    """IfTableOrViewExistsTask."""
    return LakeTable(root).exists()


def row_count_task(root: str) -> int:
    """RowCountTask — manifest row counts, no scan (the lake's analog of
    SELECT COUNT(*): exact because every commit records per-file rows)."""
    return LakeTable.load(root).row_count()


def get_table_definition_task(root: str, version: int | None = None) -> T.StructType:
    """GetTableDefinitionTask: the (versioned) table schema."""
    return LakeTable.load(root).schema(version)


# ------------------------------------------------------------ ad-hoc SQL
def sql_task(spark: SparkSession, sql: str) -> DataFrame:
    """SqlTask.ExecuteReader: run SQL over registered views. Spark (not
    an external DB) parses/optimizes — the reference delegated exactly
    the same way (SURVEY.md §3.1 EP3)."""
    return spark.sql(sql)


def sql_scalar_task(spark: SparkSession, sql: str) -> Any:
    """SqlTask.ExecuteScalar: first column of the first row."""
    row = spark.sql(sql).first()
    return None if row is None else row[0]


# ---------------------------------------------------------- load logging
class LoadProcess:
    """StartLoadProcessTask / EndLoadProcessTask analog: appends one JSON
    line per lifecycle event to a log file (the lineage/metrics journal —
    BASELINE.json:14). Timestamps are wall-clock here because the journal
    is operational metadata, never data-path input (determinism rule)."""

    def __init__(self, log_path: str, name: str):
        self.log_path = log_path
        self.name = name
        self._t0: float | None = None

    def _emit(self, event: str, **extra: Any) -> None:
        os.makedirs(os.path.dirname(self.log_path) or ".", exist_ok=True)
        with open(self.log_path, "a", encoding="utf-8") as f:
            f.write(json.dumps({"process": self.name, "event": event, **extra}) + "\n")

    def start(self, **extra: Any) -> "LoadProcess":
        self._t0 = time.time()
        self._emit("start", **extra)
        return self

    def end(self, **metrics: Any) -> None:
        dur = None if self._t0 is None else round(time.time() - self._t0, 3)
        self._emit("end", duration_s=dur, **metrics)

    def abort(self, reason: str) -> None:
        self._emit("abort", reason=reason)

    def entries(self) -> list[dict[str, Any]]:
        if not os.path.exists(self.log_path):
            return []
        with open(self.log_path, encoding="utf-8") as f:
            return [json.loads(line) for line in f if line.strip()]
