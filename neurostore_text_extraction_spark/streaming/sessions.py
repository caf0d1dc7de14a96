"""Streaming sessionization with watermarks (SURVEY.md §2.10 optional
depth: the reference is batch-only, but the engine's event tables are
stream-shaped — this is the Structured Streaming form of the batch
`event_sessions` query).

Two implementations, both late-data-safe behind a watermark:

- :func:`session_counts`: built-in ``F.session_window`` gap sessions —
  the declarative path (state management, gap merging and watermark
  eviction are Spark's, not ours).
- :func:`session_counts_stateful`: ``applyInPandasWithState`` with an
  explicit per-user state object and processing-time timeout — the
  custom-stateful-operator template for semantics session_window can't
  express (e.g. value-dependent gaps, cross-field session invariants).

Both run identically over a batch DataFrame (session_window works in
batch; the stateful form is exercised with a stream in tests), so the
batch oracle can pin the semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def session_counts(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
    user_col: str = "user_id",
    ts_col: str = "ts",
    streaming: bool = True,
) -> DataFrame:
    """Events per (user, gap-session): one row per closed session with
    start/end and event count. On a stream, rows emit once the
    watermark passes the session end (append mode)."""
    src = events.withWatermark(ts_col, watermark) if streaming else events
    return (
        src.groupBy(F.col(user_col), F.session_window(F.col(ts_col), gap))
        .agg(F.count("*").cast("long").alias("n_events"))
        .select(
            user_col,
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )


def session_counts_stateful(
    events: DataFrame,
    gap_seconds: int = 1800,
    watermark: str = "1 hour",
    user_col: str = "user_id",
    ts_col: str = "ts",
):
    """Custom stateful sessionization via ``applyInPandasWithState``:
    per-user state = (session_start, last_ts, n_events); an event past
    the gap closes the open session and emits it. Event-time timeout
    flushes the final open session once the watermark passes."""
    import pandas as pd

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = (
        f"{user_col} string, session_start timestamp, "
        "session_end timestamp, n_events long"
    )
    state_schema = "start long, last long, n long"

    def update(key, pdfs, state: GroupState):
        (user,) = key
        rows = []
        if state.hasTimedOut:
            start, last, n = state.get
            rows.append((user, start, last, n))
            state.remove()
        else:
            start, last, n = state.get if state.exists else (None, None, 0)
            events_ts = []
            for pdf in pdfs:
                events_ts.extend(int(t.value // 1_000_000_000) for t in pdf[ts_col])
            for t in sorted(events_ts):
                if start is None:
                    start, last, n = t, t, 1
                elif t - last > gap_seconds:
                    rows.append((user, start, last, n))
                    start, last, n = t, t, 1
                else:
                    last, n = max(last, t), n + 1
            if start is not None:
                state.update((start, last, n))
                state.setTimeoutTimestamp((last + gap_seconds) * 1000)
        out = pd.DataFrame(
            rows, columns=[user_col, "session_start", "session_end", "n_events"]
        )
        if not out.empty:
            out["session_start"] = pd.to_datetime(out["session_start"], unit="s")
            out["session_end"] = pd.to_datetime(out["session_end"], unit="s")
        yield out

    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(user_col)
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
