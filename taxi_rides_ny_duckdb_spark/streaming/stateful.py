"""Custom stateful streaming operators via ``applyInPandasWithState``
(EXTENSION — the reference is batch-only, SURVEY §2.9).

Where ``streaming/jobs.py`` composes built-in stateful operators
(windowed aggs, session_window, dropDuplicatesWithinWatermark), these
are *arbitrary* per-key state machines: the per-group update function is
Python over Arrow-batched pandas frames, state is an explicit
user-defined struct persisted in the state store across micro-batches
(and across restarts via the checkpoint).

Scale notes:
- State is partitioned by the grouping key across executors — per-key
  state must stay small and bounded (a few scalars here), not a buffer
  of rows.
- ``GroupStateTimeout.EventTimeTimeout`` + the stream's watermark bound
  both state lifetime and out-of-order tolerance: a key's state is
  finalized (emitted + removed) once the watermark passes its deadline,
  so state size tracks the number of *live* keys, not all keys ever.
- The Arrow boundary is per group per batch — keep the update function
  vectorized (pandas ops over the whole frame, no row loops).
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

RUNNING_TOTALS_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)

_RUNNING_TOTALS_STATE = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)


def running_user_totals(events: DataFrame) -> DataFrame:
    """Running per-user (count, sum-of-value) updated every micro-batch.

    The built-in streaming aggregation can maintain the same numbers,
    but only this form lets the update step host arbitrary logic
    (conditional resets, rate limits, per-key models). Output mode is
    ``update``: one row per touched key per batch, carrying the running
    totals so far."""

    def update(
        key: Tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].fillna(0.0).sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        RUNNING_TOTALS_SCHEMA,
        _RUNNING_TOTALS_STATE,
        "update",
        GroupStateTimeout.NoTimeout,
    )


INACTIVITY_SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)

# Timestamps kept as epoch-MICROSECOND longs in state (full event-time
# precision; the emitted session bounds must equal the batch twin's
# min/max ts exactly). Only the timeout API speaks epoch-ms.
_INACTIVITY_STATE = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("end_us", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)


def inactivity_sessions(
    events: DataFrame, gap_minutes: int = 30, watermark: str = "1 hour"
) -> DataFrame:
    """Custom sessionization as a per-user state machine: a session is
    open while events keep arriving within ``gap_minutes``; it is
    emitted exactly once — *closed by event-time timeout* — when the
    watermark passes last_event + gap. This is the
    ``applyInPandasWithState`` analog of ``F.session_window`` (batch
    twin: ``operators/windows.sessionize``), and the template for
    session logic the built-in can't express (caps on session length,
    emit-on-open, per-session ML features).

    Output mode ``append``: closed sessions only."""
    gap_ms = gap_minutes * 60_000

    def update(
        key: Tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            start_us, end_us, n, total = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "session_start": [pd.Timestamp(start_us, unit="us")],
                    "session_end": [pd.Timestamp(end_us, unit="us")],
                    "n_events": [n],
                    "total_value": [total],
                }
            )
            return
        pdf = pd.concat(list(pdfs)).sort_values("ts")
        ts_us = (pdf["ts"].astype("int64") // 1_000).reset_index(drop=True)
        val = pdf["value"].fillna(0.0).reset_index(drop=True)
        # segment within the batch: a new session starts where the gap
        # from the previous event exceeds the threshold. Gap compared on
        # truncated epoch SECONDS — identical to the batch twin's
        # unix_timestamp() arithmetic (operators/windows.sessionize), so
        # boundary events land in the same session in both paths.
        seg = ((ts_us // 1_000_000).diff() > gap_ms // 1000).cumsum()
        closed: list[tuple[int, int, int, float]] = []
        open_state = state.get if state.exists else None
        for _, idx in seg.groupby(seg).groups.items():
            lo, hi = int(ts_us[idx].min()), int(ts_us[idx].max())
            n_, tot_ = len(idx), float(val[idx].sum())
            if open_state is not None and (
                lo // 1_000_000 - open_state[1] // 1_000_000 <= gap_ms // 1000
            ):
                # extends the carried-over open session
                open_state = (
                    min(open_state[0], lo),
                    max(open_state[1], hi),
                    open_state[2] + n_,
                    open_state[3] + tot_,
                )
            else:
                if open_state is not None:
                    closed.append(open_state)
                open_state = (lo, hi, n_, tot_)
        # the last segment stays open, pending more events or timeout
        state.update(open_state)
        # deadline must sit above the current watermark or Spark rejects
        # it; a clamped deadline just fires on the next batch
        state.setTimeoutTimestamp(
            max(open_state[1] // 1000 + gap_ms, state.getCurrentWatermarkMs() + 1)
        )
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [key[0]] * len(closed),
                    "session_start": [pd.Timestamp(s, unit="us") for s, *_ in closed],
                    "session_end": [pd.Timestamp(e, unit="us") for _, e, *_ in closed],
                    "n_events": [n for *_, n, _t in closed],
                    "total_value": [t for *_, t in closed],
                }
            )

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            INACTIVITY_SESSION_SCHEMA,
            _INACTIVITY_STATE,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )


def streaming_funnel(
    events: DataFrame,
    stages: tuple = ("view", "click", "purchase"),
) -> DataFrame:
    """First-touch funnel as a per-user streaming state machine — the
    stateful twin of ``operators/windows.funnel_stages`` (same strict
    ts-ordering semantics, same output columns).

    State per user: one SORTED event-time list (epoch µs) per stage,
    holding only that stage's events. Appending the batch's stage
    events and RE-WALKING the funnel from the lists each batch makes
    the operator exact under ANY arrival order — a late stage-1 event
    arriving after a stage-2 event was processed still lands in its
    list and the next walk finds the correct chain, which a
    current-best-timestamps state machine cannot do (an earlier
    predecessor can retroactively validate a previously-useless
    successor). That exactness is what the multi-batch out-of-order
    test pins.

    State bound: per-user stage-event counts — the per-key analog of
    the batch operator's user-grain frames. Production deployments
    cap the horizon with an event-time timeout that finalizes a
    user's funnel when the watermark passes (the
    ``inactivity_sessions`` pattern); the contract run is a finite
    drop, so no timeout is attached here.

    Output mode ``update``: one row per TOUCHED user per batch with
    the funnel so far; over a single availableNow batch that is
    exactly the batch funnel. Users who never performed ``stages[0]``
    emit nothing (matching the batch operator's inner first stage).
    """
    out_schema = T.StructType(
        [T.StructField("user_id", T.LongType())]
        + [T.StructField(f"{s}_us", T.LongType()) for s in stages]
        + [T.StructField("stages_completed", T.LongType())]
    )
    state_schema = T.StructType(
        [
            T.StructField(f"s{i}", T.ArrayType(T.LongType()))
            for i in range(len(stages))
        ]
    )
    n_stages = len(stages)

    def update(
        key: Tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        import bisect

        lists = (
            [list(x) for x in state.get]
            if state.exists
            else [[] for _ in range(n_stages)]
        )
        for pdf in pdfs:
            us = pdf["ts"].values.astype("datetime64[us]").astype("int64")
            types = pdf["event_type"].values
            for i, stage in enumerate(stages):
                hit = us[types == stage]
                if len(hit):
                    lists[i].extend(int(v) for v in hit)
        for lst in lists:
            lst.sort()
        state.update(tuple(lists))
        if not lists[0]:
            return
        times: list = [lists[0][0]]
        t_prev = times[0]
        for i in range(1, n_stages):
            if t_prev is None:
                times.append(None)
                continue
            j = bisect.bisect_right(lists[i], t_prev)
            t_prev = lists[i][j] if j < len(lists[i]) else None
            times.append(t_prev)
        row = {"user_id": [key[0]]}
        for s, t in zip(stages, times):
            row[f"{s}_us"] = [t]
        row["stages_completed"] = [sum(1 for t in times if t is not None)]
        yield pd.DataFrame(row)

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        out_schema,
        state_schema,
        "update",
        GroupStateTimeout.NoTimeout,
    )
