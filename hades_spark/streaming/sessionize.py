"""Custom stateful streaming operator: gap-based sessionization.

The reference has no true streaming state (SURVEY §2.9), but a web-scale
ingest pipeline needs at least one custom stateful operator; this is the
canonical one: group events per user, close a session after ``gap`` of
inactivity, emit (user, session_start, session_end, n_events).

Two execution modes from the SAME session logic:
- batch: window/lag expression (deterministic, oracle-friendly);
- streaming: ``applyInPandasWithState`` with per-group timeout state —
  the GroupState pattern for operators Structured Streaming lacks.
"""

from __future__ import annotations

import datetime as dt

import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = ("user_id long, session_start timestamp, "
                  "session_end timestamp, n_events long")


def sessionize_batch(events: DataFrame, gap_minutes: int = 30,
                     user_col: str = "user_id",
                     ts_col: str = "ts") -> DataFrame:
    """Gap-based sessions over a batch frame: lag() marks session starts,
    a running sum assigns session ids, then one aggregate per session."""
    w = Window.partitionBy(user_col).orderBy(ts_col)
    gap = F.lit(gap_minutes * 60)
    # cast through TIMESTAMP: parquet NTZ timestamps don't cast to long
    epoch = F.col(ts_col).cast("timestamp").cast("long")
    prev_epoch = F.lag(F.col(ts_col)).over(w).cast("timestamp").cast("long")
    marked = events.withColumn(
        "_new", (epoch - prev_epoch > gap).cast("int"),
    ).withColumn("_new", F.coalesce("_new", F.lit(1)))
    sid = F.sum("_new").over(
        Window.partitionBy(user_col).orderBy(ts_col)
        .rowsBetween(Window.unboundedPreceding, 0))
    return (
        marked.withColumn("_sid", sid)
        .groupBy(user_col, "_sid")
        .agg(F.min(ts_col).alias("session_start"),
             F.max(ts_col).alias("session_end"),
             F.count("*").cast("bigint").alias("n_events"))
        .drop("_sid")
    )


def _make_session_fn(gap_seconds: int, timeout_ms: int):
    """Build the applyInPandasWithState body with the CALLER's gap (the
    same ``gap_minutes`` the batch twin takes — previously 1800s was
    hardcoded here, so non-default gaps silently diverged)."""

    def _session_fn(key, pdf_iter, state: GroupState):
        (user_id,) = key
        times: list[dt.datetime] = list(state.get()[0]) if state.exists else []
        for pdf in pdf_iter:
            times.extend(pdf["ts"].tolist())
        if state.hasTimedOut:
            times.sort()
            sessions = []
            cur = [times[0]] if times else []
            for t in times[1:]:
                if (t - cur[-1]).total_seconds() > gap_seconds:
                    sessions.append(cur)
                    cur = [t]
                else:
                    cur.append(t)
            if cur:
                sessions.append(cur)
            state.remove()
            yield pd.DataFrame({
                "user_id": [user_id] * len(sessions),
                "session_start": [s[0] for s in sessions],
                "session_end": [s[-1] for s in sessions],
                "n_events": [len(s) for s in sessions],
            })
        else:
            state.update((times,))
            state.setTimeoutDuration(timeout_ms)
            yield pd.DataFrame(
                columns=["user_id", "session_start", "session_end",
                         "n_events"])

    return _session_fn


def sessionize_stream(events: DataFrame, gap_minutes: int = 30,
                      timeout_ms: int = 60_000) -> DataFrame:
    """Streaming variant: per-user GroupState with processing-time timeout.
    ``events`` must be a streaming frame with (user_id, ts).

    SEMANTICS CAVEAT (documented, inherent to processing-time timeouts):
    sessions are emitted when the USER's stream goes quiet for
    ``timeout_ms`` of processing time — an ingest lull longer than the
    timeout closes and emits the session-so-far, so a session whose
    event-time gap is under ``gap_minutes`` can be emitted in fragments
    if its events arrive more than ``timeout_ms`` apart. The batch twin
    (``sessionize_batch``) is the exact-result authority; raise
    ``timeout_ms`` (or re-sessionize emitted fragments batch-side) when
    exact streaming parity matters more than emission latency."""
    return events.groupBy("user_id").applyInPandasWithState(
        _make_session_fn(gap_minutes * 60, timeout_ms),
        outputStructType=SESSION_SCHEMA,
        stateStructType="times array<timestamp>",
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
