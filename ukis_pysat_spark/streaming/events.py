"""Stateful streaming sessionization (applyInPandasWithState +
event-time timeout) — the streaming twin of operators/events.sessionize.

One state cell per user holds the OPEN session (start/last timestamps,
counts, value sum) plus the count of sessions already closed (the
session ordinal survives session closure, so `session_idx` matches the
batch operator's numbering).  A session closes two ways:

- a new event arrives past the gap -> the open session is emitted and a
  new one starts (same micro-batch or a later one);
- the event-time WATERMARK passes (last event + gap) -> the event-time
  timeout fires and the idle session is emitted without needing another
  event for that user.

Late events inside the still-open session merge into it; events later
than a CLOSED session cannot reopen it (append-mode emission is
immutable) — choose the watermark delay to bound that, exactly the
trade Structured Streaming prescribes.  State is per-user and tiny, so
the state store scales with the user dimension, not the event volume.
"""

from __future__ import annotations

from typing import Any, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
import pyspark.sql.functions as F

OUT_SCHEMA = (
    "user_id long, session_idx long, n_events long, start_us long, "
    "end_us long, duration_us long, sum_value double"
)
# start_us == -1 marks "no open session" (the cell persists so the
# session ordinal survives closure)
STATE_SCHEMA = (
    "start_us long, last_us long, n_events long, sum_value double, n_closed long"
)


def _make_sessionize_fn(gap_us: int):
    def fn(key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            start, last, n_ev, sval, n_closed = state.get
        else:
            start, last, n_ev, sval, n_closed = -1, -1, 0, 0.0, 0

        def row(s, e, n, v, n_before):
            # 1-based ordinal, matching the batch operator's running sum
            return {
                "user_id": user_id, "session_idx": n_before + 1, "n_events": n,
                "start_us": s, "end_us": e, "duration_us": e - s,
                "sum_value": v,
            }

        out = []
        if state.hasTimedOut:
            if start >= 0:
                out.append(row(start, last, n_ev, sval, n_closed))
                start, last, n_ev, sval, n_closed = -1, -1, 0, 0.0, n_closed + 1
            state.update((start, last, n_ev, sval, n_closed))
            return iter([pd.DataFrame(out)] if out else [])

        rows = [pdf for pdf in pdfs if len(pdf)]
        if rows:
            pdf = pd.concat(rows, ignore_index=True).sort_values(["ts", "event_id"])
            us = pdf["ts"].values.astype("datetime64[us]").astype(np.int64)
            vals = pdf["value"].values.astype(np.float64)
            # vectorized segmentation: the Python loop below is over
            # SESSIONS, never events
            merge0 = start >= 0 and us[0] - last <= gap_us
            new_seg = np.empty(us.size, dtype=bool)
            new_seg[0] = True
            new_seg[1:] = np.diff(us) > gap_us
            idxs = np.nonzero(new_seg)[0]
            ends = np.append(idxs[1:], us.size)
            counts = ends - idxs
            sums = np.add.reduceat(vals, idxs)
            firsts = us[idxs]
            lasts = us[ends - 1]
            k0 = 0
            if merge0:  # first segment extends the open session
                start = min(start, int(firsts[0]))  # late arrivals
                last = max(last, int(lasts[0]))
                n_ev += int(counts[0])
                sval += float(sums[0])
                k0 = 1
            elif start >= 0:  # gap before the batch: close the open one
                out.append(row(start, last, n_ev, sval, n_closed))
                n_closed += 1
                start = -1
            if k0 < idxs.size:
                if start >= 0 and merge0:
                    # open session closes before segment k0 starts
                    out.append(row(start, last, n_ev, sval, n_closed))
                    n_closed += 1
                for k in range(k0, idxs.size - 1):
                    out.append(
                        row(int(firsts[k]), int(lasts[k]), int(counts[k]),
                            float(sums[k]), n_closed)
                    )
                    n_closed += 1
                klast = idxs.size - 1
                start, last = int(firsts[klast]), int(lasts[klast])
                n_ev, sval = int(counts[klast]), float(sums[klast])
        state.update((start, last, n_ev, sval, n_closed))
        if start >= 0:
            # close when the watermark passes the gap after the last
            # event; a late batch may find that moment already behind
            # the watermark — Spark rejects past timestamps, so clamp
            # to just past the current watermark (fires next batch)
            due = last // 1000 + gap_us // 1000
            wm = state.getCurrentWatermarkMs()
            state.setTimeoutTimestamp(max(due, wm + 1))
        return iter([pd.DataFrame(out)] if out else [])

    return fn


def stream_sessionize(
    events: DataFrame,
    gap_minutes: float = 30.0,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Event stream (ts, user_id, event_id, value) -> closed sessions,
    append mode.  `watermark` bounds how late an event may arrive and
    still merge into its (open) session."""
    gap_us = int(gap_minutes * 60_000_000)
    # watermarks require TIMESTAMP; NTZ event times cast through the
    # session's UTC zone (same convention as the batch operator)
    ev = events.withColumn("ts", F.col("ts").cast("timestamp"))
    keyed = (
        ev.withWatermark("ts", watermark)
        .select("ts", "user_id", "event_id", "value")
        .groupBy("user_id")
    )
    return keyed.applyInPandasWithState(
        _make_sessionize_fn(gap_us),
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
