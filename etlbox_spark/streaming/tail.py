"""Structured-Streaming binlog tail (SURVEY.md §2.8 v2 path).

``readStream`` over the event landing zone → ``foreachBatch`` →
``apply_epoch``; ``availableNow`` drains everything currently present and
stops (the micro-batch loop with Spark-managed source offsets). Watermarks
are unnecessary for correctness here: the merge is idempotent under
re-delivery and ordered by event_seq (late data = replay, handled by LWW
+ epoch markers), so the streaming layer only supplies batching +
source-offset checkpointing; the lake's epoch markers remain the
exactly-once authority across foreachBatch retries.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import types as T

from ..engine.checkpoint import Checkpoint
from ..engine.lake import LakeTable
from ..engine.merge import apply_epoch
from ..engine.spec import MergeMode, MergeSpec


def _start_tail(
    spark: SparkSession,
    lake: LakeTable,
    events_glob: str,
    events_schema: T.StructType,
    spec: MergeSpec,
    mode: MergeMode,
    stream_checkpoint_dir: str | None,
    engine_checkpoint: Checkpoint | None,
    delta_dir: str | None,
    epoch_offset: int,
    max_files_per_trigger: int | None,
    trigger_kwargs: dict,
):
    """Shared core of both tail modes — the epoch-id contract
    (``epoch_offset + batch_id`` → lake marker no-op on retry) is
    safety-critical and must not fork between them."""

    def _apply(batch_df, batch_id: int) -> None:
        res = apply_epoch(
            spark, lake, batch_df, spec, mode, epoch_offset + int(batch_id), delta_dir=delta_dir
        )
        if engine_checkpoint is not None:
            engine_checkpoint.record(res)

    reader = spark.readStream.schema(events_schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(events_glob)
    writer = stream.writeStream.foreachBatch(_apply).trigger(**trigger_kwargs)
    if stream_checkpoint_dir is not None:
        writer = writer.option("checkpointLocation", stream_checkpoint_dir)
    return writer.start()


def tail_available_now(
    spark: SparkSession,
    lake: LakeTable,
    events_glob: str,
    events_schema: T.StructType,
    spec: MergeSpec,
    mode: MergeMode = MergeMode.DELTA,
    stream_checkpoint_dir: str | None = None,
    engine_checkpoint: Checkpoint | None = None,
    delta_dir: str | None = None,
    epoch_offset: int = 0,
    max_files_per_trigger: int | None = None,
) -> None:
    """Drain all currently-available event files through the merge core.

    Epoch ids are ``epoch_offset + batch_id``; a foreachBatch retry of a
    batch id that already committed no-ops via the lake epoch marker —
    this is what makes the sink exactly-once even though foreachBatch
    itself is at-least-once.

    RERUN CONTRACT — batch ids (and so epoch ids) come from the STREAM
    checkpoint: a rerun with the SAME ``stream_checkpoint_dir`` resumes
    Spark's source offsets and batches only NEW files under fresh batch
    ids (the incremental tail). A rerun WITHOUT one (or with a fresh
    dir) restarts batch ids at 0, which is safe ONLY as a pure re-drain
    of an unchanged file set (every batch no-ops via its marker —
    idempotence, tested): if new files landed since, they ride in a
    batch whose epoch id is already committed and are silently dropped
    by the marker. To pick up new files, keep the checkpoint dir, or
    bump ``epoch_offset`` past the lake's max committed epoch.
    """
    q = _start_tail(
        spark, lake, events_glob, events_schema, spec, mode,
        stream_checkpoint_dir, engine_checkpoint, delta_dir, epoch_offset,
        max_files_per_trigger, {"availableNow": True},
    )
    q.awaitTermination()


def tail_processing_time(
    spark: SparkSession,
    lake: LakeTable,
    events_glob: str,
    events_schema: T.StructType,
    spec: MergeSpec,
    mode: MergeMode = MergeMode.DELTA,
    stream_checkpoint_dir: str | None = None,
    engine_checkpoint: Checkpoint | None = None,
    delta_dir: str | None = None,
    epoch_offset: int = 0,
    interval: str = "1 second",
    max_files_per_trigger: int | None = None,
):
    """TRUE unbounded tail (round 4 — the one §2.8 item previously out of
    scope): identical foreachBatch merge core, but a ``processingTime``
    trigger keeps the query ALIVE — binlog files landing after start are
    picked up by the file source, batched, and merged continuously until
    the caller ``.stop()``s the returned ``StreamingQuery``.

    Exactly-once is still the LAKE's property, not the sink's: epoch id =
    ``epoch_offset + batch_id``, so a foreachBatch retry (at-least-once)
    of a committed batch no-ops via the epoch marker, and a restart with
    the same ``stream_checkpoint_dir`` resumes from Spark's source
    offsets with the same batch-id sequence. State at any instant equals
    an epoch-loop replay of the files the source has consumed — the
    pytest drives convergence against exactly that oracle.

    The ``tail_available_now`` rerun contract applies identically: a
    restart without the same ``stream_checkpoint_dir`` restarts batch
    ids at 0 and silently no-ops new files into committed epoch ids.
    """
    return _start_tail(
        spark, lake, events_glob, events_schema, spec, mode,
        stream_checkpoint_dir, engine_checkpoint, delta_dir, epoch_offset,
        max_files_per_trigger, {"processingTime": interval},
    )


def stream_changes(
    spark: SparkSession,
    delta_dir: str,
    change_schema: T.StructType,
    max_files_per_trigger: int | None = None,
):
    """Streaming CDC-out: a ``readStream`` over the committed delta log,
    so a downstream consumer processes change epochs continuously (the
    streaming face of ``engine.merge.read_changes``).

    The file source's partition discovery recurses into ``epoch=N`` dirs
    (``epoch`` rides along as a column — it is appended to
    ``change_schema`` automatically) and picks up NEW epoch dirs as the
    tail commits them; in-flight attempts live under
    ``_inflight-epoch-N`` names the listing skips, so only committed
    epochs ever reach the consumer. Exactly-once remains the consumer's
    checkpoint responsibility (epoch id + Spark source offsets), exactly
    like the ingest side.

    ``change_schema`` is the change-row schema of the CURRENT table
    generation (keys + payload + bucket + seq + action). Column ADDS
    evolve cleanly (pre-evolution epochs surface typed nulls); a numeric
    WIDEN mid-range is a parquet physical-type change the fixed-schema
    streaming source cannot align — consume the historical range with
    ``read_changes`` (which re-aligns generations) and start the stream
    from the first post-widen epoch.

    Returns the streaming DataFrame; the caller attaches its sink and
    trigger.
    """
    full = T.StructType(
        list(change_schema.fields) + [T.StructField("epoch", T.IntegerType(), True)]
    )
    reader = spark.readStream.schema(full)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(delta_dir)


def stream_maintenance_changes(
    spark: SparkSession,
    delta_dir: str,
    change_schema: T.StructType,
    max_files_per_trigger: int | None = None,
):
    """Streaming face of ``engine.merge.read_maintenance_changes`` (r05):
    a ``readStream`` over ``{delta_dir}/_maint`` picking up the change
    sets ``delete_where(emit_changes=True)`` / ``rollback(emit_changes=
    True)`` commit — so a mirror that tails ``stream_changes`` can tail
    erasures through the SAME machinery instead of never seeing them.
    The underscore parent keeps these dirs out of the epoch stream's
    listing; in-flight attempts (``_inflight-v{V}-{token}``) are skipped
    here for the same reason, so only committed sets are ever consumed.

    ``change_schema`` = table columns + bucket; ``action`` /
    ``after_epoch`` data columns and the ``version`` partition column
    are appended automatically. Ordering contract as in
    ``read_maintenance_changes``: apply set V after epochs ≤ its
    ``after_epoch``."""
    import os

    full = T.StructType(
        list(change_schema.fields)
        + [
            T.StructField("action", T.StringType(), True),
            T.StructField("after_epoch", T.LongType(), True),
            T.StructField("version", T.IntegerType(), True),
        ]
    )
    reader = spark.readStream.schema(full)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(os.path.join(delta_dir, "_maint"))
