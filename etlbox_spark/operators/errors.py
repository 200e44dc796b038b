"""Error-output routing — ETLBox ``LinkErrorTo`` parity.

Every ETLBox dataflow component can route faulting rows to an error sink
carrying the exception text and the serialized row
[U ETLBox/src/Definitions/DataFlow/ErrorHandler.cs]. Spark has no per-row
exception hook (and per-row Python is banned here), so the idiom becomes
*declared* failure conditions evaluated as column expressions over one
shared plan: ``try_cast`` / ``from_xml`` null-detection and arbitrary
predicates produce a reason column; the good branch and the error branch
are two filters of the same DataFrame (Catalyst computes the checks once
per branch scan, shuffle-free, no Python in the row path).

The error branch carries ``error_reason`` (first failing check — the
ExceptionMessage analog) and ``error_row`` (JSON of the original row —
the RowAsJson analog).
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ERROR_REASON_COL = "error_reason"
ERROR_ROW_COL = "error_row"


def route_errors(
    df: DataFrame,
    checks: Sequence[tuple[Column, str]],
    row_cols: Sequence[str] | None = None,
    include_row_json: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """Split ``df`` into (good, errors) on declared failure conditions.

    ``checks`` is a list of (fails_when, reason); a row is an error when
    any condition holds, and ``error_reason`` reports the FIRST failing
    reason (matching ETLBox, which faults a row on the first thrown
    exception). ``row_cols`` limits which columns land in ``error_row``
    (defaults to all input columns).

    Three-valued logic: a check whose condition evaluates to SQL NULL
    does NOT fail the row (SQL ``WHERE`` semantics — NULL is not true).
    When NULL inputs should fail, say so in the condition: add an
    ``isNull()`` arm or wrap with ``F.coalesce(cond, F.lit(True))`` —
    ``cast_or_route`` below shows the pattern (its null-guard makes
    "input present, cast result absent" explicit).
    """
    for taken in (ERROR_REASON_COL, ERROR_ROW_COL):
        if taken in df.columns:
            # silently overwriting a prior pass's routing columns would
            # lose user data (the good branch drops ERROR_REASON_COL)
            raise ValueError(
                f"input already has a {taken!r} column — rename it (or "
                "drop a previous route's columns) before re-routing"
            )
    reason = F.coalesce(
        *[F.when(cond, F.lit(r)) for cond, r in checks], F.lit(None).cast("string")
    )
    marked = df.withColumn(ERROR_REASON_COL, reason)
    good = marked.where(F.col(ERROR_REASON_COL).isNull()).drop(ERROR_REASON_COL)
    bad = marked.where(F.col(ERROR_REASON_COL).isNotNull())
    if include_row_json:
        cols = list(row_cols) if row_cols is not None else list(df.columns)
        bad = bad.withColumn(ERROR_ROW_COL, F.to_json(F.struct(*cols)))
    return good, bad


def cast_or_route(
    df: DataFrame,
    casts: Mapping[str, str],
    include_row_json: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """Typed-ingest idiom: ``try_cast`` each column; rows where any cast
    fails (non-null input → null output) route to the error branch with
    reason ``cast_failed:<col>``; good rows carry the cast columns.

    This is how dirty CSV/JSON lands typed without killing the job —
    the ETLBox pattern of a destination's error link catching conversion
    exceptions, minus the per-row exception machinery.
    """
    tmp = df
    checks: list[tuple[Column, str]] = []
    for c, t in casts.items():
        tmp = tmp.withColumn(f"__try_{c}", F.col(c).try_cast(t))
        checks.append(
            (F.col(c).isNotNull() & F.col(f"__try_{c}").isNull(), f"cast_failed:{c}")
        )
    good, bad = route_errors(tmp, checks, row_cols=df.columns, include_row_json=include_row_json)
    for c in casts:
        good = good.withColumn(c, F.col(f"__try_{c}"))
    drop = [f"__try_{c}" for c in casts]
    return good.drop(*drop), bad.drop(*drop)
