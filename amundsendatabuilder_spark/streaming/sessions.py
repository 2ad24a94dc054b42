"""Streaming sessionization — a custom stateful operator on
``applyInPandasWithState``.

The batch twin lives in ``functions/sessionize.py`` (two windows + one
agg).  This is the Structured-Streaming form: per-user session state
kept by the engine's state store, events merged into open sessions as
micro-batches arrive, and a session EMITTED (append) only once the
event-time watermark proves no further event can extend it
(``end + gap < watermark``).  Out-of-order events inside the watermark
delay are handled by interval-merging, so arrival order never changes
the result — the emitted sessions are exactly what the batch operator
computes on the same data.

Per the engine's no-per-row-Python rule this is the sanctioned
exception surface: ``applyInPandasWithState`` is Arrow-batched — each
(user, micro-batch) group crosses the JVM↔Python boundary as columnar
pandas frames, not rows.  Session values are accumulated in integer
cents (exact; no float summation drift), matching the batch operator's
``decimal(18,2)`` sums.

State per user: the next session sequence number plus the open-session
interval list (bounded by the watermark delay ÷ gap, typically a
handful).  An event-time timeout is registered at the earliest moment
the oldest open session could close, so sessions flush even for users
who never send another event; once a user has no open sessions their
state row (just the next session number) survives ``idle_ttl_minutes``
of event time and is then REMOVED — the store stays O(users active
within the idle TTL), the property that makes this run indefinitely on
an unbounded 100 TB/day stream.  A user returning after TTL expiry
restarts at ``session_seq`` 1 (documented trade: global per-user
numbering forever would require unbounded state).
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("session_seq", LongType()),
    StructField("start_us", LongType()),
    StructField("end_us", LongType()),
    StructField("n_events", LongType()),
    StructField("sum_cents", LongType()),
])

STATE_SCHEMA = StructType([
    StructField("next_seq", LongType()),
    StructField("starts", ArrayType(LongType())),
    StructField("ends", ArrayType(LongType())),
    StructField("counts", ArrayType(LongType())),
    StructField("cents", ArrayType(LongType())),
])


def _merge_intervals(
    sessions: list[list[int]], gap_us: int
) -> list[list[int]]:
    """Merge [start, end, n, cents] intervals whose gap is <= gap_us
    (strictly-greater gaps split — same rule as the batch operator)."""
    sessions.sort(key=lambda s: (s[0], s[1]))
    out: list[list[int]] = []
    for s in sessions:
        if out and s[0] - out[-1][1] <= gap_us:
            last = out[-1]
            last[1] = max(last[1], s[1])
            last[2] += s[2]
            last[3] += s[3]
        else:
            out.append(list(s))
    return out


def _make_session_fn(gap_us: int, idle_ttl_ms: int):
    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            next_seq, starts, ends, counts, cents = state.get
            open_sessions = [
                [starts[i], ends[i], counts[i], cents[i]]
                for i in range(len(starts))
            ]
        else:
            next_seq, open_sessions = 1, []

        if not state.hasTimedOut:
            import numpy as np

            for pdf in pdfs:
                if len(pdf) == 0:
                    continue
                ts_us = pdf["ts"].values.astype("datetime64[us]").astype("int64")
                # HALF-AWAY-FROM-ZERO, matching Spark's decimal(18,2)
                # cast in the batch operator (numpy .round() is
                # half-to-even and would drift by a cent on e.g. 0.125)
                v = pdf["value"].astype("float64").values
                vals = (np.sign(v) * np.floor(np.abs(v) * 100 + 0.5)).astype("int64")
                for t, c in zip(ts_us.tolist(), vals.tolist()):
                    open_sessions.append([int(t), int(t), 1, int(c)])
            open_sessions = _merge_intervals(open_sessions, gap_us)
        else:
            # drain the (empty) iterator contract
            for _ in pdfs:
                pass

        wm_us = state.getCurrentWatermarkMs() * 1000
        closed = [s for s in open_sessions if s[1] + gap_us < wm_us]
        open_sessions = [s for s in open_sessions if s[1] + gap_us >= wm_us]

        rows = []
        for s in closed:
            rows.append((user_id, next_seq, s[0], s[1], s[2], s[3]))
            next_seq += 1

        if not open_sessions and state.hasTimedOut and not rows:
            # pure idle-ttl expiry (no session just flushed): drop the
            # state row entirely
            # so the store stays O(users active within idle_ttl) — the
            # user's session_seq restarts at 1 if they ever return
            state.remove()
        else:
            state.update((
                next_seq,
                [s[0] for s in open_sessions],
                [s[1] for s in open_sessions],
                [s[2] for s in open_sessions],
                [s[3] for s in open_sessions],
            ))
            if open_sessions:
                # earliest instant the oldest open session could close
                state.setTimeoutTimestamp(
                    min(s[1] for s in open_sessions) // 1000
                    + gap_us // 1000 + 1
                )
            else:
                # nothing open: keep next_seq for idle_ttl, then expire
                state.setTimeoutTimestamp(
                    state.getCurrentWatermarkMs() + idle_ttl_ms
                )
        if rows:
            yield pd.DataFrame(
                rows, columns=[f.name for f in OUTPUT_SCHEMA.fields]
            )

    return fn


def streaming_sessionize(
    events: DataFrame,
    gap_minutes: int = 30,
    watermark_delay: str = "10 minutes",
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    idle_ttl_minutes: int = 7 * 24 * 60,
) -> DataFrame:
    """Sessionize a STREAMING event frame (append-mode output).

    Returns a streaming DataFrame of closed sessions with schema
    ``(user_id, session_seq, start_us, end_us, n_events, sum_cents)``;
    a session appears exactly once, when the watermark passes its end
    by more than the gap.  ``sum_cents`` is the exact value sum × 100
    (divide by 100.0 — or cast to decimal — for the batch operator's
    ``sum_value``).
    """
    gap_us = int(gap_minutes) * 60 * 1_000_000
    from pyspark.sql.types import TimestampNTZType, TimestampType

    src = events
    if isinstance(src.schema[ts_col].dataType, TimestampNTZType):
        # watermarks need an instant; session tz is fixed (UTC in this
        # engine's sessions) so the cast is a pure relabel
        src = src.withColumn(ts_col, F.col(ts_col).cast(TimestampType()))
    return (
        src.withWatermark(ts_col, watermark_delay)
        .select(
            F.col(user_col).cast("long").alias("user_id"),
            F.col(ts_col).alias("ts"),
            F.col(value_col).cast("double").alias("value"),
        )
        .groupBy("user_id")
        .applyInPandasWithState(
            _make_session_fn(gap_us, int(idle_ttl_minutes) * 60_000),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
