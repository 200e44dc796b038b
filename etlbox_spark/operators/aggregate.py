"""Aggregation / blocking ops / sort / distinct (SURVEY.md §2.5).

Reference parity: Aggregation [U ETLBox/src/Toolbox/DataFlow/
Aggregation.cs] (GroupColumn/AggregateColumn Sum|Min|Max|Count, hash agg,
final-only), BlockTransformation [U .../BlockTransformation.cs] (whole
dataset barrier), Sort [U .../Sort.cs], Distinct [U .../Distinct.cs].

The reference's hash-dict aggregation maps to groupBy().agg() — which is
strictly stronger at scale: Spark does map-side partial aggregation then
a key shuffle, instead of one in-memory dict.
"""

from __future__ import annotations

from collections.abc import Callable, Mapping, Sequence

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# no "first": without an ordering it returns a partition-order-dependent
# survivor — the determinism invariant (CLAUDE.md) bans that in data
# paths. Callers wanting a deterministic representative use
# operators.dedupe.dedupe_lww (ordered max_by) or min/min_by.
_AGG_FNS = {"sum": F.sum, "min": F.min, "max": F.max, "count": F.count, "avg": F.avg,
            "count_distinct": F.countDistinct}


def aggregation(
    df: DataFrame,
    group_cols: Sequence[str],
    measures: Mapping[str, tuple[str, str]] | Mapping[str, Column],
) -> DataFrame:
    """GroupColumn/AggregateColumn analog.

    ``measures`` maps output alias → (fn_name, input_col) for the
    reference's Sum|Min|Max|Count surface, or → a ready Column for
    arbitrary expressions (the AggregationAction analog, but still
    JVM-side)."""
    aggs = []
    for alias, m in measures.items():
        if isinstance(m, tuple):
            fn, col = m
            aggs.append(_AGG_FNS[fn](col).alias(alias))
        else:
            aggs.append(m.alias(alias))
    if group_cols:
        return df.groupBy(*group_cols).agg(*aggs)
    return df.agg(*aggs)


def grouped_pandas_agg(
    df: DataFrame,
    group_cols: Sequence[str],
    fn: Callable[[pd.DataFrame], pd.DataFrame],
    schema,
) -> DataFrame:
    """Custom AggregationAction via applyInPandas (Arrow grouped-map) —
    the sanctioned slow path for non-expressible aggregations."""
    return df.groupBy(*group_cols).applyInPandas(fn, schema=schema)


def block_transformation(
    df: DataFrame,
    fn: Callable[[pd.DataFrame], pd.DataFrame],
    schema,
) -> DataFrame:
    """BlockTransformation analog. The reference buffers ALL rows on one
    thread; a faithful copy would be collect() — a driver bottleneck. We
    run the function per-partition via mapInPandas. Functions needing a
    true global view should be re-expressed as (aggregate → broadcast →
    map), e.g. ``center_on_global_mean`` below. Same Arrow-batch shape
    as ``rows.pandas_transform`` — delegate, don't fork."""
    from .rows import pandas_transform

    return pandas_transform(df, fn, schema)


def center_on_global_mean(df: DataFrame, col: str, out_col: str) -> DataFrame:
    """The canonical BlockTransformation use-case (normalize by a global
    statistic) done scale-correctly: one tiny aggregate, broadcast
    cross-join, map — no single-partition window, no collect."""
    tmp = "__mean"
    while tmp in df.columns:  # a user column named __mean must survive
        tmp += "_"
    stats = df.agg(F.avg(col).alias(tmp))
    return (
        df.crossJoin(F.broadcast(stats))
        .withColumn(out_col, F.col(col) - F.col(tmp))
        .drop(tmp)
    )


def sort(df: DataFrame, cols: Sequence[Column | str]) -> DataFrame:
    """Total sort — Spark range-partitions then sorts per partition."""
    return df.orderBy(*cols)


def distinct(df: DataFrame, cols: Sequence[str] | None = None) -> DataFrame:
    """Hash-dedupe on DistinctColumns (all columns if None). Arbitrary
    survivor per key, like the reference; for deterministic last-writer
    semantics use operators.dedupe.dedupe_lww."""
    return df.dropDuplicates(list(cols)) if cols else df.distinct()
