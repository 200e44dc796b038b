"""Row-level transformations (SURVEY.md §2.3).

Reference parity (upstream layout, see SURVEY.md §0 for citation rules):
RowTransformation [U ETLBox/src/Toolbox/DataFlow/RowTransformation.cs],
RowDuplication [U .../RowDuplication.cs], RowMultiplication
[U .../RowMultiplication.cs], ColumnRename [U .../ColumnRename.cs].

The reference applies a C# ``Func<TIn,TOut>`` per row on TPL threads; we
express the same 1→1 / 1→N shapes as Catalyst column expressions so they
stay inside whole-stage codegen. Arbitrary Python logic goes through
``pandas_transform`` (Arrow-vectorized), never a row-at-a-time UDF
(BASELINE.json:15).
"""

from __future__ import annotations

from collections.abc import Callable, Mapping

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def row_transformation(df: DataFrame, columns: Mapping[str, Column], keep: bool = True) -> DataFrame:
    """1→1 transform: add/replace columns from expressions.

    ``keep=False`` projects only the given columns (filter+project idiom).
    """
    if keep:
        return df.withColumns(dict(columns))
    return df.select(*[expr.alias(name) for name, expr in columns.items()])


def pandas_transform(df: DataFrame, fn: Callable[[pd.DataFrame], pd.DataFrame], schema) -> DataFrame:
    """RowTransformation escape hatch for non-expressible logic:
    Arrow-batched, per-partition (mapInPandas) — the allowed slow path."""

    def _it(batches):
        for pdf in batches:
            yield fn(pdf)

    return df.mapInPandas(_it, schema=schema)


def row_duplication(df: DataFrame, predicate: Column | None = None, copies: int = 2) -> DataFrame:
    """Emit each row ``copies`` times (optionally only rows matching
    ``predicate``; non-matching rows pass through once). Expressed as
    explode over ``array_repeat`` — stays distributed, no union-induced
    double scan, and ``copies=0`` DROPS matching rows (empty array →
    explode emits nothing; the previous ``sequence(1, n)`` form counted
    DOWN for n < 1 and silently doubled them instead)."""
    n = F.when(predicate, F.lit(copies)).otherwise(F.lit(1)) if predicate is not None else F.lit(copies)
    tmp = "__dup"
    while tmp in df.columns:
        tmp += "_"
    return df.withColumn(tmp, F.explode(F.array_repeat(F.lit(1), n))).drop(tmp)


def row_multiplication(df: DataFrame, out_col: str, elements: Column, keep_empty: bool = False) -> DataFrame:
    """1→N flatten: ``elements`` must be an array expression; each element
    becomes one output row (explode / explode_outer)."""
    ex = F.explode_outer(elements) if keep_empty else F.explode(elements)
    return df.withColumn(out_col, ex)


def column_rename(df: DataFrame, mapping: Mapping[str, str], drop_unmapped: bool = False) -> DataFrame:
    """Rename (and optionally prune to) mapped columns."""
    if drop_unmapped:
        return df.select(*[F.col(old).alias(new) for old, new in mapping.items()])
    return df.withColumnsRenamed(dict(mapping))
