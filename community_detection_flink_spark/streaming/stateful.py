"""Custom stateful streaming operators (``applyInPandasWithState``).

The reference has no true streaming (its "stream" is id-range
micro-batches over a bounded DataSet, ``CSVGraph.scala:47-103``); the
engine's windowed aggregations (``streaming/windows.py``) cover the
declarative stateful surface.  This module covers the IMPERATIVE one:
operators whose per-key state machine Spark's built-ins can't express —
implemented the Structured-Streaming-native way, with
``applyInPandasWithState`` (Arrow-batched per key-group, event-time
timeouts driven by the watermark).

Two operators:

* ``sessionize_stateful`` — per-user session assembly with explicit
  state.  Semantically identical to ``windows.session_agg``
  (``session_window`` with the same gap; an event exactly ``gap`` after
  the previous one STARTS a new session), which makes it
  cross-checkable: the streaming run must emit exactly the batch
  answer (pinned by ``tests/test_stateful_streaming.py``).  It exists
  because real pipelines outgrow ``session_window`` the moment a
  session needs custom close logic (caps, carried aggregates, emit
  partial on size) — this is the template.
* ``streaming_first_seen`` — keyed streaming dedup: emit only the
  first occurrence of each key, state = seen marker with an event-time
  TTL.  The streaming twin of ``operators/dedup.py::exact_dedup``; at
  100 TB/day the TTL bounds state size, which is what makes keyed
  dedup feasible at all on an unbounded stream.

Scale notes: state lives in the executor state store partitioned by
the grouping key (one shuffle per micro-batch, same key → same
partition every batch, so state never moves); Arrow batches per key
group keep the Python boundary vectorized; event-time timeouts mean
state is dropped deterministically by watermark, not by wall clock.

Why not ``transformWithStateInPandas`` (Spark 4's successor API with
typed state handles and timers): its driver worker imports
``google.protobuf``, which is broken in this container
(``ImportError: cannot import name 'descriptor'`` — verified, and
``pip install`` is unavailable), so every query fails at worker init
with STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE.  The operators
here stick to ``applyInPandasWithState``, which has no protobuf
dependency; porting them to the new API is a mechanical
StatefulProcessor wrapper once the environment carries protobuf.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_OUTPUT_SCHEMA = (
    "user_id LONG, session_start LONG, n_events LONG, sum_value DOUBLE"
)
_SESSION_STATE_SCHEMA = "start_ns LONG, last_ns LONG, n LONG, cents LONG"

FIRST_SEEN_OUTPUT_SCHEMA = "key STRING, first_ts LONG, event_id LONG"
_FIRST_SEEN_STATE_SCHEMA = "first_ns LONG, event_id LONG"


def _close(user_id: int, start_ns: int, n: int, cents: int) -> dict:
    return {
        "user_id": user_id,
        "session_start": start_ns // 1_000_000_000,
        "n_events": n,
        # exact: summed in integer cents (matches session_agg's
        # decimal(18,2)-backed sum bit-for-bit after the double cast)
        "sum_value": cents / 100.0,
    }


def _make_session_fn(gap_ns: int):
    def fn(key, pdf_iter, state: GroupState):
        (user_id,) = key
        if state.hasTimedOut:
            start_ns, last_ns, n, cents = state.get
            state.remove()
            yield pd.DataFrame([_close(user_id, start_ns, n, cents)])
            return

        chunks = [p for p in pdf_iter if len(p)]
        if not chunks:
            return
        pdf = pd.concat(chunks).sort_values("ts")
        # normalize to ns: Arrow may hand pandas datetime64[us] or [ns]
        ts_ns = pdf["ts"].astype("datetime64[ns]").astype("int64").to_numpy()
        cents_col = (pdf["value"] * 100).round().astype("int64").to_numpy()

        if state.exists:
            start_ns, last_ns, n, cents = state.get
        else:
            start_ns = last_ns = int(ts_ns[0])
            n = 0
            cents = 0

        closed: list[dict] = []
        for t, c in zip(ts_ns.tolist(), cents_col.tolist()):
            # strict >: session_window merges an event exactly `gap`
            # after the previous one (its [ts, ts+gap) window is
            # adjacent and Spark merges adjacent sessions)
            if n > 0 and t - last_ns > gap_ns:
                closed.append(_close(user_id, start_ns, n, cents))
                start_ns, n, cents = t, 0, 0
            n += 1
            cents += c
            last_ns = max(last_ns, t)
        state.update((start_ns, last_ns, n, cents))
        # event-time timeout at session close (strictly above the
        # current watermark, as the state API requires)
        timeout_ms = max(
            last_ns // 1_000_000 + gap_ns // 1_000_000 + 1,
            state.getCurrentWatermarkMs() + 1,
        )
        state.setTimeoutTimestamp(timeout_ms)
        if closed:
            yield pd.DataFrame(closed)

    return fn


def sessionize_stateful(
    events: DataFrame, gap_minutes: int = 30, watermark: str = "2 hours"
) -> DataFrame:
    """Per-user sessions over a STREAMING frame with explicit state.

    ``events`` needs columns (ts TIMESTAMP, user_id LONG, value
    DOUBLE).  Emits one row per CLOSED session (append semantics):
    a session closes when a later event of the same user arrives
    ``>= gap`` after its last event, or when the watermark passes
    ``last event + gap`` (event-time timeout).  Output schema matches
    ``windows.session_agg`` so the two paths cross-check.
    """
    stream = events.withWatermark("ts", watermark)
    gap_ns = gap_minutes * 60 * 1_000_000_000
    return (
        stream.select("ts", "user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _make_session_fn(gap_ns),
            outputStructType=SESSION_OUTPUT_SCHEMA,
            stateStructType=_SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def _make_first_seen_fn(ttl_ns: int):
    def fn(key, pdf_iter, state: GroupState):
        (k,) = key
        if state.hasTimedOut:
            state.remove()
            return
        chunks = [p for p in pdf_iter if len(p)]
        if not chunks:
            return
        pdf = pd.concat(chunks).sort_values("ts")
        first_row = pdf.iloc[0]
        first_ns = int(pd.Timestamp(first_row["ts"]).value)
        if state.exists:
            # Duplicate inside TTL: drop the whole batch, whatever its
            # timestamps.  An out-of-order EARLIER occurrence is also
            # suppressed (never re-emitted) — the emitted row stays the
            # canonical "first seen", matching the append-mode contract
            # documented on ``streaming_first_seen``.  State is left
            # untouched so the TTL anchor equals the emitted row.
            return
        state.update((first_ns, int(first_row["event_id"])))
        state.setTimeoutTimestamp(
            max(
                first_ns // 1_000_000 + ttl_ns // 1_000_000,
                state.getCurrentWatermarkMs() + 1,
            )
        )
        yield pd.DataFrame(
            [
                {
                    "key": k,
                    "first_ts": first_ns // 1_000_000_000,
                    "event_id": int(first_row["event_id"]),
                }
            ]
        )

    return fn


def streaming_first_seen(
    events: DataFrame,
    key_col: str,
    ttl_minutes: int = 24 * 60,
    watermark: str = "2 hours",
) -> DataFrame:
    """Keyed streaming dedup: first occurrence of each ``key_col``
    value within a TTL window (state dropped by event-time timeout —
    bounded state on an unbounded stream).

    Caveat (documented, inherent to streaming dedup): occurrences are
    judged in micro-batch arrival order within the watermark; an
    out-of-order EARLIER duplicate arriving in a later batch after the
    first was already emitted is suppressed, not retracted.
    """
    stream = events.withWatermark("ts", watermark)
    ttl_ns = ttl_minutes * 60 * 1_000_000_000
    return (
        stream.select(
            F.col(key_col).cast("string").alias("key"), "ts", "event_id"
        )
        .groupBy("key")
        .applyInPandasWithState(
            _make_first_seen_fn(ttl_ns),
            outputStructType=FIRST_SEEN_OUTPUT_SCHEMA,
            stateStructType=_FIRST_SEEN_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
