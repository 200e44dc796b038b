"""Joins, lookup, cross join (SURVEY.md §2.4).

Reference parity: LookupTransformation [U ETLBox/src/Toolbox/DataFlow/
LookupTransformation.cs] (full-cache hash probe ⇒ broadcast hash join),
MergeJoin [U .../MergeJoin.cs] (keyed or positional zip), CrossJoin
[U .../CrossJoin.cs] (one side buffered ⇒ broadcast nested loop).
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def lookup(
    df: DataFrame,
    lookup_df: DataFrame,
    match_cols: Sequence[str],
    retrieve_cols: Mapping[str, str] | Sequence[str],
    how: str = "left",
) -> DataFrame:
    """Enrich rows from a (small) lookup source — ETLBox's full-cache
    in-memory probe is exactly a **broadcast** hash left-join, so the dim
    side never shuffles the fact side. ``retrieve_cols`` maps source
    column → output alias (RetrieveColumn analog)."""
    if not isinstance(retrieve_cols, Mapping):
        retrieve_cols = {c: c for c in retrieve_cols}
    small = lookup_df.select(
        *match_cols, *[F.col(src).alias(dst) for src, dst in retrieve_cols.items()]
    )
    # dedupe the lookup side on match keys (ETLBox keeps first match)
    small = small.dropDuplicates(list(match_cols))
    return df.join(F.broadcast(small), on=list(match_cols), how=how)


def merge_join(left: DataFrame, right: DataFrame, on: Sequence[str], how: str = "inner") -> DataFrame:
    """Keyed merge-join: Catalyst picks sort-merge/shuffled-hash/broadcast
    by stats + AQE; we do not hand-schedule (SURVEY.md §4)."""
    return left.join(right, on=list(on), how=how)


def merge_join_positional(
    left: DataFrame,
    right: DataFrame,
    left_order: Sequence[str],
    right_order: Sequence[str],
) -> DataFrame:
    """The reference's 1.x MergeJoin zips two streams *by arrival order*.
    Distributed translation: explicit order → row_number → equi-join on
    the position (arrival order is undefined on a cluster, so the order
    columns make the semantics deterministic)."""
    lw = Window.orderBy(*[F.col(c) for c in left_order])
    rw = Window.orderBy(*[F.col(c) for c in right_order])
    l2 = left.withColumn("__pos", F.row_number().over(lw))
    r2 = right.withColumn("__pos", F.row_number().over(rw))
    return l2.join(r2, on="__pos", how="inner").drop("__pos")


def cross_join(left: DataFrame, right: DataFrame, broadcast_right: bool = True) -> DataFrame:
    """Cartesian product; the reference buffers one side in memory, the
    Spark analog is broadcasting the small side."""
    r = F.broadcast(right) if broadcast_right else right
    return left.crossJoin(r)
