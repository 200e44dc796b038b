"""Skew-handling operators (BASELINE.json:6 "Skew on hot repos is handled
by key salting plus AQE-aware repartitioning"; SURVEY.md §4 partitioning).

Where salting lives in this engine:

* The merge core's LWW dedupe needs NO explicit salting — it is a
  ``groupBy(key).agg(max_by(...))`` whose map-side partial aggregation
  collapses a hot key to one row per input partition *before* the
  exchange (etlbox_spark/engine/merge.py module doc). The classify join
  relies on AQE skew-join splitting.
* Explicit salting is for aggregations whose per-key state does NOT
  collapse map-side — high-cardinality aggregates (collect_set,
  percentile sketches) over zipf keys, where one reducer would
  otherwise receive the whole hot key. That is what
  ``salted_aggregation`` provides: the classic two-phase shuffle —
  phase 1 aggregates (key, salt), phase 2 merges the ≤ n_salts partial
  rows per key. The partials must be MERGEABLE (sum/min/max/count —
  phase 2 combines per-salt results): a ``count_distinct`` partial
  salted by a row-level source OVERCOUNTS values that appear under
  several salts — that shape needs ``salted_count_distinct`` below,
  which salts by the distinct column itself so per-salt sets are
  disjoint.

The salt must come from a column that distributes rows WITHIN a key
(the event_seq / id), never from rand() — determinism is an engine-wide
invariant (reproducible replay, SURVEY.md §7).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import salt_expr

SALT_COL = "__salt"


def with_salt(df: DataFrame, salt_source: str, n_salts: int) -> DataFrame:
    """Deterministic salt in [0, n_salts) from an existing row-level
    column (e.g. the event sequence number) — the shared engine-wide
    derivation (``functions.hashing.salt_expr``)."""
    return df.withColumn(SALT_COL, salt_expr(salt_source, n_salts))


def salted_aggregation(
    df: DataFrame,
    group_cols: Sequence[str],
    partial_aggs: Sequence[Column],
    merge_aggs: Sequence[Column],
    salt_source: str,
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation for skewed group keys.

    ``partial_aggs`` run per (group, salt) — each must ``.alias()`` the
    intermediate column AND be mergeable by its ``merge_aggs``
    counterpart (sum/min/max/count compose; ``count_distinct`` does NOT
    — a value appearing under several salts is counted once per salt;
    use ``salted_count_distinct``, which salts by the distinct column).
    ``merge_aggs`` combine the ≤ n_salts partials per group and must
    alias the final columns. Example::

        salted_aggregation(
            events, ["repo"],
            partial_aggs=[F.sum("value").alias("s"), F.count(F.lit(1)).alias("c")],
            merge_aggs=[F.sum("s").alias("total"), F.sum("c").alias("rows")],
            salt_source="event_seq",
        )

    Phase 1's shuffle spreads a hot key over n_salts reducers; phase 2
    shuffles only n_salts rows per key — at 10^10 events a hot repo goes
    from one 10^8-row reducer to n_salts ~10^6-row reducers.
    """
    keys = list(group_cols)
    p1 = with_salt(df, salt_source, n_salts).groupBy(*keys, SALT_COL).agg(*partial_aggs)
    return p1.groupBy(*keys).agg(*merge_aggs)


def salted_count_distinct(
    df: DataFrame,
    group_cols: Sequence[str],
    distinct_col: str,
    out_col: str = "n_distinct",
    n_salts: int = 16,
) -> DataFrame:
    """Exact count-distinct under key skew: salt by the DISTINCT column
    (same value → same salt, so phase-2 union of per-salt distinct sets
    is disjoint and the counts just add)."""
    keys = list(group_cols)
    p1 = (
        df.withColumn(SALT_COL, salt_expr(distinct_col, n_salts))
        .groupBy(*keys, SALT_COL)
        .agg(F.count_distinct(F.col(distinct_col)).alias("__pc"))
    )
    return p1.groupBy(*keys).agg(F.sum("__pc").cast("long").alias(out_col))


def repartition_by_key(df: DataFrame, key_cols: Sequence[str], n_partitions: int) -> DataFrame:
    """Explicit key-hash repartition (pre-shuffle co-location so a
    downstream join/agg on the same keys reuses the exchange)."""
    return df.repartition(n_partitions, *[F.col(c) for c in key_cols])
