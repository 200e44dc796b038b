"""Joins, lookup, cross join (SURVEY.md §2.4).

Reference parity: LookupTransformation [U ETLBox/src/Toolbox/DataFlow/
LookupTransformation.cs] (full-cache hash probe ⇒ broadcast hash join),
MergeJoin [U .../MergeJoin.cs] (keyed or positional zip), CrossJoin
[U .../CrossJoin.cs] (one side buffered ⇒ broadcast nested loop).
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def lookup(
    df: DataFrame,
    lookup_df: DataFrame,
    match_cols: Sequence[str],
    retrieve_cols: Mapping[str, str] | Sequence[str],
    how: str = "left",
    cache_mode: str = "full",
) -> DataFrame:
    """Enrich rows from a lookup source. ``retrieve_cols`` maps source
    column → output alias (RetrieveColumn analog).

    ``cache_mode`` mirrors ETLBox's LookupTransformation cache modes:

    * ``"full"`` (default) — the 1.x full-cache in-memory probe, exactly a
      **broadcast** hash left-join: the dim side ships to every executor,
      the fact side never shuffles.
    * ``"partial"`` — the 2.x partial-cache mode for dim tables too big to
      hold in memory: a plain shuffled sort-merge join, where only the
      keys each partition actually probes co-locate with it (the Spark
      analog of fetching rows on demand). Forced via the ``merge`` hint so
      the plan is deterministic regardless of stats.
    * ``"auto"`` — no hint: Catalyst/AQE picks broadcast vs shuffle from
      size stats (the right default when callers can't know the dim size).
    """
    if cache_mode not in ("full", "partial", "auto"):
        raise ValueError(f"unknown cache_mode {cache_mode!r}")
    if not isinstance(retrieve_cols, Mapping):
        retrieve_cols = {c: c for c in retrieve_cols}
    small = lookup_df.select(
        *match_cols, *[F.col(src).alias(dst) for src, dst in retrieve_cols.items()]
    )
    # dedupe the lookup side on match keys (ETLBox keeps first match)
    small = small.dropDuplicates(list(match_cols))
    if cache_mode == "full":
        small = F.broadcast(small)
    elif cache_mode == "partial":
        small = small.hint("merge")
    return df.join(small, on=list(match_cols), how=how)


def merge_join(left: DataFrame, right: DataFrame, on: Sequence[str], how: str = "inner") -> DataFrame:
    """Keyed merge-join: Catalyst picks sort-merge/shuffled-hash/broadcast
    by stats + AQE; we do not hand-schedule (SURVEY.md §4)."""
    return left.join(right, on=list(on), how=how)


def global_positions(df: DataFrame, order_cols: Sequence[str], pos_col: str = "__pos") -> DataFrame:
    """1-based global position under ``order_cols`` total order —
    WITHOUT a single-partition window (VERDICT r01: `Window.orderBy` with
    no partitionBy funnels the whole input through ONE task).

    Distributed zipWithIndex idiom, pure DataFrame ops:
      1. range-repartition + sort within partitions (ascending partition
         ids hold ascending key ranges — one ordinary shuffle);
      2. ``monotonically_increasing_id`` after the sort: documented
         layout = partition id in the upper bits, a 0-based contiguous
         record counter in the lower 33, so the per-partition row number
         is ``mid & (2^33-1)`` with no window at all;
      3. per-partition counts (one tiny job, ≤ one row per partition)
         → cumulative offsets broadcast back and added.
    The shuffle map stage is reused between the count job and the main
    job (shuffle-stage reuse), so the input is range-shuffled once.
    """
    order = [F.col(c) for c in order_cols]
    part = df.repartitionByRange(*order).sortWithinPartitions(*order)
    tmp = part.withColumn("__mid", F.monotonically_increasing_id()).withColumn(
        "__pid", F.shiftrightunsigned("__mid", 33).cast("int")
    ).withColumn("__rn", F.col("__mid").bitwiseAND(F.lit((1 << 33) - 1)))
    counts = sorted(
        (int(r[0]), int(r[1])) for r in tmp.groupBy("__pid").count().collect()
    )
    offs, acc = [], 0
    for pid, cnt in counts:
        offs.append((pid, acc))
        acc += cnt
    off_df = df.sparkSession.createDataFrame(offs or [(0, 0)], "__pid int, __off long")
    return (
        tmp.join(F.broadcast(off_df), on="__pid", how="left")
        .withColumn(pos_col, F.coalesce(F.col("__off"), F.lit(0)) + F.col("__rn") + 1)
        .drop("__mid", "__pid", "__rn", "__off")
    )


def merge_join_positional(
    left: DataFrame,
    right: DataFrame,
    left_order: Sequence[str],
    right_order: Sequence[str],
) -> DataFrame:
    """The reference's 1.x MergeJoin zips two streams *by arrival order*.
    Distributed translation: explicit order → global position → equi-join
    on the position (arrival order is undefined on a cluster, so the
    order columns make the semantics deterministic). Positions come from
    ``global_positions`` — scale-safe, no single-partition exchange."""
    l2 = global_positions(left, left_order)
    r2 = global_positions(right, right_order)
    return l2.join(r2, on="__pos", how="inner").drop("__pos")


def cross_join(left: DataFrame, right: DataFrame, broadcast_right: bool = True) -> DataFrame:
    """Cartesian product; the reference buffers one side in memory, the
    Spark analog is broadcasting the small side."""
    r = F.broadcast(right) if broadcast_right else right
    return left.crossJoin(r)
