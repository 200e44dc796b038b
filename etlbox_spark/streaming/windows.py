"""Watermarked event-time windows + custom stateful sessionization
(SURVEY.md §2.8 — the unbounded-stream side of the streaming surface).

The CDC tail (``tail.py``) needs no watermark: the merge is idempotent
and LWW-ordered by ``event_seq``, so late data is just replay. These
operators cover the OTHER streaming workload a binlog feeds — event-time
analytics over the change stream itself — where state must be bounded
for the pipeline to survive an unbounded 10^10-event tail:

* ``windowed_counts`` — tumbling/sliding event-time aggregation. The
  watermark bounds the state store: a (window, key) entry is dropped —
  and, in append mode, emitted exactly once — as soon as the watermark
  passes the window end. Pure built-in exprs; partial aggregation per
  micro-batch; the same expression tree runs in batch mode for
  backfills (identical semantics, no watermark needed).
* ``session_windows`` — gap-based sessions via the native
  ``F.session_window`` (JVM-side session merge in the state store; the
  declarative path — prefer this to custom state when the payload is an
  aggregate).
* ``stateful_sessionize`` — the same sessions via
  ``applyInPandasWithState`` (Arrow-batched, one state row per key):
  the escape-hatch pattern for session payloads the built-in cannot
  express (e.g. carrying arbitrary per-session accumulators). State is
  O(open sessions), not O(events); idle keys are flushed by event-time
  timeout, so a key that goes quiet does not pin state forever.

Scale notes: all three shuffle once on the grouping key per
micro-batch; watermark + timeout are what keep the state store from
growing with stream length — the difference between "runs for a day"
and "runs forever".
"""

from __future__ import annotations

from typing import Iterable, Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def windowed_counts(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    keys: Iterable[str] = ("repo",),
    window_duration: str = "10 minutes",
    slide: str | None = None,
    watermark: str | None = "30 minutes",
    aggs: "dict[str, Column] | None" = None,
) -> DataFrame:
    """Event-time windowed per-key rollup.

    Works identically on a streaming DataFrame (watermarked, append
    output: each window emits once, when the watermark passes its end)
    and on a batch DataFrame for backfill (``watermark=None`` — the
    expression tree is the same, so backfill and live paths cannot
    drift). ``aggs`` overrides the default binlog-shaped aggregates
    (event/delete counts + approximate path cardinality).
    """
    df = events
    if watermark is not None and df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    win = (
        F.window(ts_col, window_duration, slide)
        if slide is not None
        else F.window(ts_col, window_duration)
    )
    if aggs is None:
        aggs = {
            "n_events": F.count(F.lit(1)),
            "n_deletes": F.sum(F.when(F.col("op") == "delete", 1).otherwise(0)),
            "n_paths_approx": F.approx_count_distinct("path"),
        }
    keys = list(keys)
    return (
        df.groupBy(win.alias("w"), *[F.col(k) for k in keys])
        .agg(*[v.alias(k) for k, v in aggs.items()])
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            *keys,
            *aggs.keys(),
        )
    )


def session_windows(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    keys: Iterable[str] = ("repo",),
    gap: str = "30 minutes",
    watermark: str | None = "1 hour",
) -> DataFrame:
    """Gap-based sessions via the built-in session window (declarative
    path; the JVM state store merges overlapping sessions and closes a
    session once the watermark passes last-event + gap)."""
    df = events
    if watermark is not None and df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    keys = list(keys)
    return (
        df.groupBy(F.session_window(ts_col, gap).alias("s"), *[F.col(k) for k in keys])
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            *keys,
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            "n_events",
        )
    )


SESSION_SCHEMA = T.StructType(
    [
        T.StructField("repo", T.StringType(), False),
        T.StructField("session_start", T.TimestampType(), False),
        T.StructField("session_last", T.TimestampType(), False),
        T.StructField("n_events", T.LongType(), False),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_ms", T.LongType(), False),
        T.StructField("last_ms", T.LongType(), False),
        T.StructField("n", T.LongType(), False),
    ]
)


def stateful_sessionize(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    key: str = "repo",
    gap_seconds: int = 1800,
    watermark: str = "1 hour",
) -> DataFrame:
    """Custom stateful sessionization over an unbounded stream.

    ``applyInPandasWithState`` with one state row per key — the pattern
    for session payloads beyond what ``session_window`` aggregates can
    carry. Emits a row per CLOSED session (closed by a gap within the
    stream, or by event-time timeout once the watermark passes
    last-event + gap). The trailing open session per key stays in state
    until more data or its timeout arrives — exactly the unbounded-
    stream contract.

    Arrow-batched per micro-batch; state is (start, last, n) — O(live
    keys), independent of stream length.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    gap_ms = gap_seconds * 1000

    def fn(key_tuple, pdfs, state) -> Iterator:
        import numpy as np
        import pandas as pd

        (key_val,) = key_tuple

        def to_rows(sessions: "list[tuple[int, int, int]]") -> "pd.DataFrame":
            return pd.DataFrame(
                {
                    "repo": [key_val] * len(sessions),
                    "session_start": pd.to_datetime([s[0] for s in sessions], unit="ms"),
                    "session_last": pd.to_datetime([s[1] for s in sessions], unit="ms"),
                    "n_events": [s[2] for s in sessions],
                }
            )

        if state.hasTimedOut:
            start_ms, last_ms, n = state.get
            state.remove()
            yield to_rows([(start_ms, last_ms, n)])
            return

        # segment the batch vectorized: sorted event times, session
        # boundary wherever the inter-event gap exceeds gap_ms
        arrs = [
            pdf[ts_col].to_numpy().astype("datetime64[ms]").astype("int64")
            for pdf in pdfs
            if len(pdf)
        ]
        if not arrs:
            if state.exists:
                state.setTimeoutTimestamp(state.get[1] + gap_ms)
            return
        ts = np.sort(np.concatenate(arrs))
        seg = np.cumsum(np.concatenate([[0], (np.diff(ts) > gap_ms).astype("int64")]))
        starts = ts[np.concatenate([[True], np.diff(seg) > 0])]
        lasts = ts[np.concatenate([np.diff(seg) > 0, [True]])]
        counts = np.bincount(seg)
        sessions = [(int(s), int(l), int(n)) for s, l, n in zip(starts, lasts, counts)]

        # stitch the carried-over open session by FULL interval merge
        # (ADVICE r03): a late-but-within-watermark batch can deliver
        # segments that PRECEDE, span, or follow the carried session, so
        # naive "first segment within gap → extend" both merges logically
        # distinct earlier sessions and keeps the wrong session_start.
        # Insert the carried interval, sort by start, and linearly merge
        # adjacent intervals whose gap is <= gap_ms — exactly the
        # F.session_window merge rule, valid for any in-watermark order.
        if state.exists:
            sessions.append(tuple(state.get))
            sessions.sort()
            merged = [sessions[0]]
            for s in sessions[1:]:
                cur = merged[-1]
                if s[0] - cur[1] <= gap_ms:
                    merged[-1] = (cur[0], max(cur[1], s[1]), cur[2] + s[2])
                else:
                    merged.append(s)
            sessions = merged

        closed, open_ = sessions[:-1], sessions[-1]
        if closed:
            yield to_rows(closed)
        state.update(open_)
        # flush the open session if the key then goes idle: time out at
        # last-event + gap (event time; Spark clamps it to > watermark)
        state.setTimeoutTimestamp(open_[1] + gap_ms)

    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(key)
        .applyInPandasWithState(
            fn,
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def run_to_parquet_available_now(
    stream_df: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    output_mode: str = "append",
) -> None:
    """Drain a streaming DataFrame to parquet with availableNow.

    foreachBatch + append write (not the parquet sink) so the same
    helper serves any output mode; exactly-once for analytics sinks is
    the lake's job (tail.py) — this is the fire-and-forget metrics path.
    """

    def _write(batch_df, _batch_id: int) -> None:
        batch_df.write.mode("append").parquet(out_dir)

    q = (
        stream_df.writeStream.foreachBatch(_write)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
