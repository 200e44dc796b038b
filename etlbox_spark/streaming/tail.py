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
    """

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
    writer = stream.writeStream.foreachBatch(_apply).trigger(availableNow=True)
    if stream_checkpoint_dir is not None:
        writer = writer.option("checkpointLocation", stream_checkpoint_dir)
    q = writer.start()
    q.awaitTermination()
