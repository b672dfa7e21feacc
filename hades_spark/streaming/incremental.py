"""Watermark-based incremental processing.

The reference's sync loop persists a ``last_sync`` watermark doc plus a
bounded ``sync_history`` ring buffer and resumes with ``--incremental``
(``sync.py:106-135, 231-356``); duplicates are skipped on conflict
(``:664-688``). Restated:

- **batch-incremental** (the primary mode — matches the reference, keeps
  exact resume simple, SURVEY §7.4.4): read ``WHERE ts > watermark``,
  process, advance the watermark atomically with the output write.
- **structured streaming** (`incremental_stream`): the same pipeline shape
  as a ``readStream`` source with event-time watermarking for late data —
  used when the input actually arrives continuously.

State files are JSON-on-disk here; on a cluster they'd be a one-row table.
"""

from __future__ import annotations

import datetime as dt
import json
from pathlib import Path

from pyspark.sql import DataFrame, functions as F

HISTORY_LIMIT = 100  # ring buffer size, matching the reference


class WatermarkStore:
    """Persisted high-water mark + bounded run history (atomic tmp-rename,
    ``state_manager.py:84-117`` pattern)."""

    def __init__(self, path: str):
        self.path = Path(path)

    def read(self) -> str | None:
        if not self.path.exists():
            return None
        return json.loads(self.path.read_text()).get("last_sync")

    def advance(self, new_wm: str, rows: int) -> None:
        state = {"last_sync": None, "sync_history": []}
        if self.path.exists():
            state = json.loads(self.path.read_text())
        state["last_sync"] = new_wm
        state.setdefault("sync_history", []).append(
            {"watermark": new_wm, "rows": rows}
        )
        state["sync_history"] = state["sync_history"][-HISTORY_LIMIT:]
        tmp = self.path.with_suffix(".tmp")
        tmp.write_text(json.dumps(state))
        tmp.rename(self.path)


def incremental_batch(
    df: DataFrame,
    store: WatermarkStore,
    ts_col: str = "ts",
    inclusive_boundary: bool = False,
) -> tuple[DataFrame, callable]:
    """-> (delta_df, commit). ``delta_df`` holds only rows past the stored
    watermark; call ``commit()`` after the downstream write succeeds to
    advance the watermark to the delta's max timestamp (at-least-once with
    idempotent sinks => exactly-once results).

    The delta is CACHED so the rows ``commit()`` measures are the same
    rows the caller wrote — re-planning from a live source between the two
    actions could otherwise advance the watermark past rows that were
    never written. ``commit()`` unpersists it.

    Boundary semantics: the default strict ``>`` never re-reads boundary
    rows BUT loses a late row that shares the exact boundary timestamp
    (two events in the same microsecond at the watermark edge).
    ``inclusive_boundary=True`` uses ``>=`` instead — boundary rows are
    re-read once per run and must be deduped by an idempotent sink
    (``upsert_by_key``), which is the reference's own
    reprocess-and-skip-on-conflict pattern (``sync.py:664-688``)."""
    wm = store.read()
    if wm is None:
        delta = df
    else:
        boundary = F.lit(wm).cast("timestamp")
        delta = df.filter(
            F.col(ts_col) >= boundary if inclusive_boundary
            else F.col(ts_col) > boundary)
    delta = delta.cache()

    def commit() -> int:
        agg = delta.agg(
            F.max(ts_col).alias("mx"), F.count("*").alias("n")).collect()[0]
        if agg["mx"] is not None:
            mx = agg["mx"]
            if isinstance(mx, dt.datetime):
                mx = mx.strftime("%Y-%m-%d %H:%M:%S.%f")
            store.advance(str(mx), agg["n"])
        delta.unpersist()
        return agg["n"]

    return delta, commit


def windowed_event_counts(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window_dur: str = "10 minutes",
    watermark: str = "30 minutes",
    streaming: bool = False,
) -> DataFrame:
    """Tumbling-window counts; identical expression works on a batch frame
    and a ``readStream`` frame (where the watermark drops late data)."""
    src = events.withWatermark(ts_col, watermark) if streaming else events
    return (
        src.groupBy(F.window(ts_col, window_dur).alias("w"), F.col(key_col))
        .agg(F.count("*").alias("cnt"))
        .select(F.col("w.start").alias("window_start"), key_col, "cnt")
    )


def windowed_distinct_users(
    events: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    key_col: str = "event_type",
    window_dur: str = "10 minutes",
    watermark: str = "30 minutes",
    streaming: bool = False,
    exact: bool = False,
) -> DataFrame:
    """Tumbling-window DISTINCT-user counts — the cardinality twin of
    ``windowed_event_counts``. Default is ``approx_count_distinct``
    (HLL++), which is the only distinct aggregate Structured Streaming
    can run incrementally (exact count_distinct needs the full value set
    per open window — unbounded state); ``exact=True`` is the batch-mode
    verification twin. One expression serves both engines/modes."""
    if exact and streaming:
        raise ValueError("exact=True requires streaming=False: Spark "
                         "rejects exact distinct aggregation over a "
                         "stream (unbounded per-window state)")
    agg = (F.count_distinct(F.col(user_col)) if exact
           else F.approx_count_distinct(F.col(user_col)))
    src = events.withWatermark(ts_col, watermark) if streaming else events
    return (
        src.groupBy(F.window(ts_col, window_dur).alias("w"), F.col(key_col))
        .agg(agg.alias("n_users"))
        .select(F.col("w.start").alias("window_start"), key_col, "n_users")
    )
