"""Custom stateful streaming operator: gap-based sessionization.

North-star extension: the canonical "operator Spark lacks" implemented
with ``applyInPandasWithState`` (SURVEY §0 — custom stateful streaming
ops are the (b) tier after DataFrame composition). Batch-mode
sessionization (window lag/gap cumsum) lives in queries/relational.py
and is oracle-checked; this is the streaming twin that maintains open
sessions across micro-batches with timeout-based emission.

Semantics:
- events for a user belong to one session while consecutive gaps are
  ≤ ``gap_seconds``; a larger gap closes the session and opens a new
  one (same rule as the batch query).
- state per user: (session_start, last_ts, n_events, sum_value);
  closed sessions are EMITTED, the open session stays in state.
- a processing-time timeout flushes idle users' open sessions.

Scale notes: state is O(active users), keyed and shuffled once per
micro-batch by user_id; each group's pandas frame is one user's new
events (bounded per batch). This is the applyInPandasWithState
contract — the same shape the reference daemon achieves with
row-trigger queues (daemon/embedding_jobs.rs), minus the Postgres
machinery.
"""

from __future__ import annotations

from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
        T.StructField("closed_by", T.StringType()),  # gap | timeout
    ]
)

# state tuple: (session_start_epoch_us, last_ts_epoch_us, n_events, sum_value)
STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("last_us", T.LongType()),
        T.StructField("n", T.LongType()),
        T.StructField("sv", T.DoubleType()),
    ]
)


def _emit(user_id, start_us, end_us, n, sv, closed_by) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "user_id": [user_id],
            "session_start": [pd.Timestamp(start_us, unit="us")],
            "session_end": [pd.Timestamp(end_us, unit="us")],
            "n_events": [n],
            "sum_value": [sv],
            "closed_by": [closed_by],
        }
    )


def make_sessionizer(
    gap_seconds: int = 1800,
    idle_timeout_ms: int = 60000,
    use_timeout: bool = True,
):
    """Build the (key, pdf_iter, state) → pdf_iter function for
    ``applyInPandasWithState``; exposed separately so unit tests can
    drive it without a streaming query. ``use_timeout=False`` skips
    ``setTimeoutDuration`` (required when the query is configured with
    ``NoTimeout``)."""
    gap_us = gap_seconds * 1_000_000

    def fn(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            if state.exists:
                start_us, last_us, n, sv = state.get
                state.remove()
                yield _emit(user_id, start_us, last_us, n, sv, "timeout")
            return

        frames = [p for p in pdfs if len(p)]
        if not frames:
            if state.exists and use_timeout:
                state.setTimeoutDuration(idle_timeout_ms)
            return
        rows = pd.concat(frames, ignore_index=True)
        rows = rows.sort_values("ts", kind="stable")
        # normalize to µs regardless of the arriving resolution
        # (Arrow hands datetime64[us]; plain pandas uses [ns])
        ts_us = rows["ts"].astype("datetime64[us]").astype("int64")
        vals = rows["value"].fillna(0.0)

        if state.exists:
            start_us, last_us, n, sv = state.get
        else:
            start_us = last_us = int(ts_us.iloc[0])
            n, sv = 0, 0.0

        for t, v in zip(ts_us, vals):
            t = int(t)
            if n > 0 and t - last_us > gap_us:
                yield _emit(user_id, start_us, last_us, n, sv, "gap")
                start_us, n, sv = t, 0, 0.0
            if n == 0:
                start_us = t
            n += 1
            sv += float(v)
            # late events (t < last_us) stay in-session; the session
            # end only moves forward
            last_us = max(last_us, t)

        state.update((start_us, last_us, n, sv))
        if use_timeout:
            state.setTimeoutDuration(idle_timeout_ms)

    return fn


def streaming_sessionize(
    events: DataFrame,
    gap_seconds: int = 1800,
    idle_timeout_ms: int = 60000,
    timeout: str = "none",
) -> DataFrame:
    """Attach the stateful sessionizer to a STREAMING events frame
    (columns: user_id, ts, value). Returns the session output stream.

    ``timeout="processing"`` enables idle-session flushing via
    ProcessingTimeTimeout. Default is ``"none"``: on Spark 4.1.2
    local[*] the timeout-triggered batch deadlocks inside
    ChecksumCheckpointFileManager (state-store abort awaits a checksum
    future that never completes — reproduced with a 5-line stateful
    query, independent of this operator; the timeout PATH itself is
    unit-tested via make_sessionizer). Open sessions without timeout
    are emitted on the next event or drained by the caller at stop.
    """
    use_timeout = timeout == "processing"
    conf = (
        GroupStateTimeout.ProcessingTimeTimeout
        if use_timeout
        else GroupStateTimeout.NoTimeout
    )
    return (
        events.select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            make_sessionizer(gap_seconds, idle_timeout_ms, use_timeout),
            outputStructType=SESSION_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=conf,
        )
    )
