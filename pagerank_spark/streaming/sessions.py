"""Stateful streaming sessionization: gap-based session windows over an
event stream.

The batch operator (operators/sessions.py) sessionizes a complete log with
two Window passes; a LIVE event stream needs the Structured Streaming
formulation: per-user state carrying the open session, an event-time
WATERMARK bounding lateness, and an ``EventTimeTimeout`` that closes a
session once the watermark passes its last event + gap — the canonical
``applyInPandasWithState`` custom stateful operator (the exact shape the
Spark docs model session windows with).

Semantics (same gap rule as the batch operator):
  * events within ``gap`` of the session's last event extend it;
  * a >gap jump INSIDE one micro-batch closes the earlier session
    immediately (emitted in that batch's output);
  * a session with no qualifying successor closes when the WATERMARK
    passes ``last_event + gap`` (the timeout path) — so closed sessions
    are final: an event that could still legally extend one is, by the
    watermark contract, not yet late enough to have been dropped;
  * events older than the watermark are dropped by Spark before the
    state function sees them (standard late-data discipline);
  * the stream's trailing sessions stay open (nothing advances the
    watermark past them) — inherent to append-mode streaming, pinned in
    tests.

Scale shape: one exchange — the groupBy(user_id) the state store already
hash-partitions — and per-key state is ONE open-session row
(start_us, last_us, n_events): 10^9 concurrently-active users cost ~40
bytes each across the cluster's state backend. The per-batch work is an
Arrow-batched pandas fold over each user's events, never row-at-a-time
Python.
"""

from __future__ import annotations

from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_OUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("session_start", T.TimestampType(), False),
        T.StructField("session_end", T.TimestampType(), False),
        T.StructField("n_events", T.LongType(), False),
    ]
)

SESSION_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType(), False),
        T.StructField("last_us", T.LongType(), False),
        T.StructField("n_events", T.LongType(), False),
    ]
)

_US = 1_000_000


def _make_session_fn(gap_us: int):
    def fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        uid = int(key[0])
        closed: list[tuple[int, int, int]] = []

        if state.hasTimedOut:
            s, l, n = state.get
            closed.append((s, l, n))
            state.remove()
        else:
            batch = pd.concat(list(pdfs), ignore_index=True)
            # exact integer microseconds — no float timestamp wobble
            ts = sorted(int(v.value // 1000) for v in batch["ts"])
            if state.exists:
                cur = list(state.get)
            else:
                # first-ever event opens an empty session the fold fills
                cur = [ts[0], ts[0], 0]
            for t in ts:
                if t - cur[1] > gap_us:
                    closed.append((cur[0], cur[1], cur[2]))
                    cur = [t, t, 1]
                else:
                    cur[1] = max(cur[1], t)
                    cur[2] += 1
            state.update((cur[0], cur[1], cur[2]))
            state.setTimeoutTimestamp((cur[1] + gap_us) // 1000)

        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [uid] * len(closed),
                    "session_start": [pd.Timestamp(s, unit="us") for s, _, _ in closed],
                    "session_end": [pd.Timestamp(l, unit="us") for _, l, _ in closed],
                    "n_events": [n for _, _, n in closed],
                }
            )

    return fn


def streaming_sessionize(
    events: DataFrame,
    gap_minutes: float = 30.0,
    watermark: str = "10 minutes",
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Closed session windows (user_id, session_start, session_end,
    n_events) over a streaming (user_id, ts) event frame — gap-based, with
    ``watermark`` bounding event lateness. See module docstring for the
    exact close rules; the first event of a user's first batch initializes
    the session (n_events counts every event exactly once)."""
    gap_us = int(round(gap_minutes * 60)) * _US
    keyed = events.withWatermark(ts_col, watermark).select(
        F.col(user_col).cast("long").alias("user_id"),
        F.col(ts_col).alias("ts"),
    )
    return keyed.groupBy("user_id").applyInPandasWithState(
        _make_session_fn(gap_us),
        outputStructType=SESSION_OUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def write_session_log(
    sessions: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    available_now: bool = False,
):
    """Append-only parquet session log (exactly-once via the streaming
    checkpoint; a restarted query resumes open sessions from the state
    store)."""
    w = (
        sessions.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()
