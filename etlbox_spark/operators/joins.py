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
from pyspark.sql import types as T


def _orderable(dt: T.DataType) -> bool:
    """Whether min/min_by can totally order a value of this type — maps
    (at any nesting depth) cannot be compared in Spark."""
    if isinstance(dt, T.MapType):
        return False
    if isinstance(dt, T.StructType):
        return all(_orderable(f.dataType) for f in dt.fields)
    if isinstance(dt, T.ArrayType):
        return _orderable(dt.elementType)
    return True


def lookup(
    df: DataFrame,
    lookup_df: DataFrame,
    match_cols: Sequence[str],
    retrieve_cols: Mapping[str, str] | Sequence[str],
    how: str = "left",
    cache_mode: str = "full",
    order_col: str | None = None,
) -> DataFrame:
    """Enrich rows from a lookup source. ``retrieve_cols`` maps source
    column → output alias (RetrieveColumn analog).

    **Duplicate match keys in the lookup side are resolved
    deterministically** (VERDICT r03 #1). ETLBox's LookupTransformation
    keeps the *first* match, which is well-defined in its single-threaded
    push graph; Spark's ``dropDuplicates`` keeps an *arbitrary*
    partition-order-dependent row, which would silently violate the
    engine's determinism-everywhere invariant. Instead:

    * ``order_col`` given — the surviving dim row per key is the one with
      the **lowest** ``order_col`` (``min_by``), the distributed analog of
      "first in source order". Ties on ``order_col`` fall back to the
      smallest payload struct.
    * ``order_col`` omitted — the survivor is the lexicographically
      smallest retrieve-payload struct (``min`` over a struct is a total
      deterministic order), so two runs always enrich identically even
      with duplicate-key dims.

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
    # the deterministic survivor is a min over the retrieve-payload
    # struct — a map-typed payload has no total order and would fail deep
    # inside Spark's analyzer with an opaque error (VERDICT r04 nit):
    # name the offending column instead
    dtypes = {f.name: f.dataType for f in lookup_df.schema.fields}
    # order_col enters the same min_by ordering struct as the payload, so
    # it needs the same orderability guard (a map-typed order_col would
    # resurface the opaque analyzer error this check exists to replace)
    candidates = list(retrieve_cols) + ([order_col] if order_col else [])
    bad = [c for c in candidates if c in dtypes and not _orderable(dtypes[c])]
    if bad:
        raise ValueError(
            f"lookup column(s) {bad} are map-typed (not orderable): the "
            "deterministic dup-key survivor needs a total order over the "
            "ordering struct — cast the map to a struct/json string, or "
            "drop it from retrieve_cols/order_col"
        )
    aliases = list(retrieve_cols.values())
    small = lookup_df.select(
        *match_cols,
        *[F.col(src).alias(dst) for src, dst in retrieve_cols.items()],
        *([F.col(order_col).alias("__ord")] if order_col else []),
    )
    # dedupe the lookup side on match keys with a DETERMINISTIC survivor
    # (never dropDuplicates — arbitrary row per key). groupBy + min/min_by
    # is a partial (map-side combining) aggregate, so the dim side still
    # never shuffles more than one row per key per partition.
    payload = F.struct(*[F.col(a) for a in aliases])
    if order_col:
        # first-match analog: lowest order_col wins; payload-struct min
        # breaks order ties so the result is total-ordered either way
        agg = F.min_by(payload, F.struct(F.col("__ord"), payload))
    else:
        agg = F.min(payload)
    small = small.groupBy(*match_cols).agg(agg.alias("__p"))
    small = small.select(*match_cols, *[F.col(f"__p.{a}").alias(a) for a in aliases])
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
    reserved = {"__mid", "__pid", "__rn", "__off", pos_col}
    used = sorted(reserved & set(df.columns))
    if used:
        # the withColumn/drop dance below would silently replace-then-
        # remove a caller's column of the same name (the as_of_join rule)
        raise ValueError(f"global_positions: reserved column names in input: {used}")
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
    ``global_positions`` — scale-safe, no single-partition exchange.

    Shared column names are refused up front: the position join would
    emit BOTH sides' column under one name, and every later reference
    throws AMBIGUOUS_REFERENCE far from this call site (as_of_join's
    collision rule)."""
    clash = sorted(set(left.columns) & set(right.columns))
    if clash:
        raise ValueError(
            f"merge_join_positional: columns {clash} exist on both sides — "
            "rename one side before zipping"
        )
    l2 = global_positions(left, left_order)
    r2 = global_positions(right, right_order)
    return l2.join(r2, on="__pos", how="inner").drop("__pos")


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    right_seq: str | None = None,
    segment_width: int | None = None,
) -> DataFrame:
    """As-of join (not in the reference; a first-class custom operator):
    each left row is enriched with the LATEST right row whose
    ``right_ts`` <= ``left_ts`` within the same key group — the
    event-time enrichment every CDC/feature pipeline needs (attach the
    dimension version that was current when the event happened).

    Spark-first shape: NOT a theta-join (``l.ts >= r.ts`` explodes into a
    per-key cartesian before aggregation). Instead the classic
    union-and-fill: tag both sides, sort each key group once by
    (ts, side, seq), and carry the right payload forward with
    ``last(ignorenulls)`` over a running window — one shuffle on the key,
    O(n log n) per group, windows partitioned by key so parallelism is
    the keyspace. At equal timestamps the right row sorts first, so an
    event sees a same-instant version (<= semantics); ``right_seq``
    breaks ties among same-timestamp right rows deterministically
    (highest wins).

    **Skew** (VERDICT r03 #4): a per-key window serializes each key into
    ONE task and AQE cannot split a window, so a zipf-hot key bounds the
    whole stage. ``segment_width`` (in ts units; numeric ts required)
    enables the two-level scan: windows partition by (key, ts-segment) —
    parallelism = keys × active segments — and a second, tiny pass
    carries the last right version ACROSS segment boundaries (one row
    per (key, segment), so the hot key's sequential structure shrinks
    from its row count to its segment count). Result-identical to the
    unsegmented path (tests/test_skew.py); pick W so a hot key spreads
    over ~cores segments. Measured on a 90%-hot-key fixture in BENCH.md.
    """
    on = list(on)
    if segment_width is not None and int(segment_width) < 1:
        # 0 dies mid-job with an ANSI divide-by-zero; a NEGATIVE width
        # silently inverts segment order, so the boundary carry would
        # enrich events with FUTURE dimension versions
        raise ValueError(f"as_of_join: segment_width must be >= 1, got {segment_width}")
    rpayload = [c for c in right.columns if c not in {*on, right_ts}]
    # fail fast on silent column collisions (ADVICE r02): a right payload
    # column shadowing a left column would emit BOTH under one name, and
    # engine work columns already present on either side would be
    # overwritten mid-plan
    clash = sorted(set(rpayload) & set(left.columns))
    if clash:
        raise ValueError(
            f"as_of_join: right payload columns {clash} collide with left "
            "columns — rename one side before joining"
        )
    reserved = {"__r", "__ts", "__side", "__rseq", "__seg", "__rl", "__carry"}
    used = sorted(reserved & (set(left.columns) | set(right.columns)))
    if used:
        raise ValueError(f"as_of_join: reserved engine column names in input: {used}")
    # the right payload travels as ONE nullable struct, so the fill picks
    # whole right ROWS — per-column fills would stitch together columns
    # from different versions whenever a payload value is null
    rstruct = T.StructType([f for f in right.schema.fields if f.name in rpayload])
    seq = F.col(right_seq) if right_seq else F.lit(0)

    l2 = left.select(
        *[F.col(c) for c in left.columns],
        F.lit(None).cast(rstruct).alias("__r"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast("long").alias("__rseq"),
    )
    r2 = right.select(
        *[F.col(c) for c in on],
        *[F.lit(None).cast(t).alias(c) for c, t in left.dtypes if c not in on],
        F.struct(*[F.col(c) for c in rpayload]).alias("__r"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        seq.cast("long").alias("__rseq"),
    )
    u = l2.unionByName(r2)
    if segment_width is None:
        w = (
            Window.partitionBy(*on)
            .orderBy("__ts", "__side", "__rseq")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        filled = u.select(
            *[F.col(c) for c in left.columns],
            "__side",
            F.last("__r", ignorenulls=True).over(w).alias("__r"),
        )
        return (
            filled.where(F.col("__side") == 1)
            .select(
                *[F.col(c) for c in left.columns],
                *[F.col(f"__r.{c}").alias(c) for c in rpayload],
            )
        )

    # segmented two-level scan: within-segment fill at (key, seg)
    # parallelism, then the boundary carry — per (key, seg) the last
    # right version (max_by, partial agg), cumulated ACROSS segments by a
    # window whose row count is segments-per-key, not rows-per-key
    u = u.withColumn(
        "__seg", F.floor(F.col("__ts") / F.lit(int(segment_width))).cast("long")
    )
    w_in = (
        Window.partitionBy(*on, "__seg")
        .orderBy("__ts", "__side", "__rseq")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.select(
        *[F.col(c) for c in left.columns],
        "__side",
        "__seg",
        F.last("__r", ignorenulls=True).over(w_in).alias("__r"),
    )
    rlast = (
        u.where(F.col("__side") == 0)
        .groupBy(*on, "__seg")
        .agg(F.max_by("__r", F.struct(F.col("__ts"), F.col("__rseq"))).alias("__rl"))
    )
    segs = u.select(*on, "__seg").distinct()
    w_seg = (
        Window.partitionBy(*on)
        .orderBy("__seg")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = segs.join(rlast, on=[*on, "__seg"], how="left").select(
        *on, "__seg", F.last("__rl", ignorenulls=True).over(w_seg).alias("__carry")
    )
    return (
        filled.where(F.col("__side") == 1)
        .join(carry, on=[*on, "__seg"], how="left")
        # coalesce whole right ROWS (structs), never per column — a null
        # payload FIELD must not fall through to an older version's value
        .withColumn("__r", F.coalesce(F.col("__r"), F.col("__carry")))
        .select(
            *[F.col(c) for c in left.columns],
            *[F.col(f"__r.{c}").alias(c) for c in rpayload],
        )
    )


def range_join_points(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bucket_width: int,
    on: Sequence[str] = (),
) -> DataFrame:
    """Point-in-interval range join (not in the reference; first-class
    custom operator): rows of ``points`` matched to every interval with
    ``start <= point <= end``, optionally also equi-keyed on ``on``.

    Spark-first shape: NOT the naive theta-join (Catalyst plans
    ``p BETWEEN s AND e`` as a nested-loop cartesian — O(n·m)). Instead
    each interval explodes into the coarse buckets of width W it covers,
    each point maps to its single bucket, and the match becomes an
    EQUI-join on (bucket, keys) followed by the exact BETWEEN filter —
    cost O(intervals · span/W + points), shuffle-partitioned by bucket.
    Pick W near the median interval length (≈1 bucket per interval).
    A point meets an interval in exactly one bucket (its own), so no
    dedup pass is needed.
    """
    on = list(on)
    used = sorted({"__b"} & (set(points.columns) | set(intervals.columns)))
    if used:
        raise ValueError(f"range_join_points: reserved column names in input: {used}")
    w = F.lit(int(bucket_width))
    iv = intervals.withColumn(
        "__b",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / w).cast("long"),
                F.floor(F.col(end_col) / w).cast("long"),
            )
        ),
    )
    pt = points.withColumn("__b", F.floor(F.col(point_col) / w).cast("long"))
    return (
        pt.join(iv, on=["__b", *on])
        .where(F.col(point_col).between(F.col(start_col), F.col(end_col)))
        .drop("__b")
    )


def cross_join(left: DataFrame, right: DataFrame, broadcast_right: bool = True) -> DataFrame:
    """Cartesian product; the reference buffers one side in memory, the
    Spark analog is broadcasting the small side."""
    r = F.broadcast(right) if broadcast_right else right
    return left.crossJoin(r)
