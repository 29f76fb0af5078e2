"""Custom stateful streaming operator: event sessionization
(``applyInPandasWithState``).

The reference's only stateful op is key-dedupe (SURVEY.md ST5); this goes
beyond it with the canonical custom-state example a security pipeline needs —
gap-based sessionization of an event stream (per-entity activity sessions for
beaconing/exfil detection).  State per key = the one open session; arriving
events close any session whose successor gap exceeds ``gap_minutes`` (emitted
immediately), the trailing session stays open in state and is flushed by
event-time timeout once the watermark passes.
"""

from __future__ import annotations

import datetime as dt
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

SESSION_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("session_start", T.TimestampType()),
    T.StructField("session_end", T.TimestampType()),
    T.StructField("n_events", T.LongType()),
    T.StructField("closed_by", T.StringType()),  # 'gap' | 'timeout'
])

_STATE_SCHEMA = "start LONG, last LONG, n LONG"  # epoch micros + count


def _from_us(us: int) -> dt.datetime:
    return dt.datetime.fromtimestamp(us / 1_000_000, tz=dt.timezone.utc).replace(
        tzinfo=None
    )


def sessionize(
    events: DataFrame,
    gap_minutes: int = 30,
    watermark: str = "1 hour",
    id_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Gap-based sessions over a (possibly streaming) events DataFrame."""
    gap_us = gap_minutes * 60 * 1_000_000

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            start, last, n = state.get
            state.remove()
            yield pd.DataFrame(
                [(user_id, _from_us(start), _from_us(last), n, "timeout")],
                columns=["user_id", "session_start", "session_end", "n_events",
                         "closed_by"],
            )
            return

        ts_list: list[int] = []
        for pdf in pdfs:
            ts_list.extend(int(v.value // 1000) for v in pd.to_datetime(pdf[ts_col]))
        ts_list.sort()
        if state.exists:
            start, last, n = state.get
        else:
            start = last = ts_list[0]
            n = 0
        closed = []
        for t in ts_list:
            if t <= last:
                # late event (cross-batch out-of-order within the watermark):
                # it belongs to the open session if within the gap of its
                # start — extend backwards, never regress `last` (a regressed
                # `last` would fabricate gap closes with end < start)
                if t >= start - gap_us:
                    start = min(start, t)
                    n += 1
                continue
            if t - last > gap_us:
                closed.append((user_id, _from_us(start), _from_us(last), n, "gap"))
                start, n = t, 0
            last = t
            n += 1
        state.update((start, last, n))
        state.setTimeoutTimestamp(last // 1000 + gap_minutes * 60 * 1000)
        if closed:
            yield pd.DataFrame(
                closed,
                columns=["user_id", "session_start", "session_end", "n_events",
                         "closed_by"],
            )

    grouped = events.withWatermark(ts_col, watermark).groupBy(id_col)
    return grouped.applyInPandasWithState(
        fn,
        outputStructType=SESSION_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
