"""Multicast / conditional routing (SURVEY.md §2.3-2.4).

Reference parity: Multicast [U ETLBox/src/Toolbox/DataFlow/Multicast.cs]
(TPL BroadcastBlock 1→N copy), and LinkTo(target, predicate) routing [K].

In Spark a DataFrame is a lazy plan, so "multicast" is just reusing the
plan. ``persist`` defaults to False: branch actions re-use the upstream's
shuffle files via Spark's cross-job shuffle-stage reuse, and the columnar
cache build measured 4-8x slower than recompute-with-reuse on this
workload (see engine/merge.py module doc). Set ``persist=True`` only for
an expensive NON-shuffle upstream (e.g. a pandas-UDF featurizer) fanned
to many branches.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def multicast(
    df: DataFrame,
    branches: Sequence[Callable[[DataFrame], DataFrame]],
    persist: bool = False,
) -> list[DataFrame]:
    """Fan one stream out to N independent branch pipelines.

    ``persist=True`` caches the UPSTREAM (``df`` itself — persist()
    marks the caller's own DataFrame) and the cache lives until the
    caller runs ``df.unpersist()`` after materializing the branches;
    nothing here can know when the last branch action has run. Leaving
    it cached for a long-lived session accumulates storage pressure —
    the same measured reason persist defaults off (module doc)."""
    src = df.persist() if persist else df
    return [b(src) for b in branches]


def conditional_split(df: DataFrame, predicate: Column) -> tuple[DataFrame, DataFrame]:
    """LinkTo-predicate routing: (matching, non-matching). NULL predicate
    rows go to the non-matching branch (SQL three-valued logic)."""
    return df.where(predicate), df.where(~F.coalesce(predicate, F.lit(False)))
