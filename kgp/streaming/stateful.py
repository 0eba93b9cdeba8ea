"""Custom stateful streaming operator: gap sessionization via
``applyInPandasWithState`` (SURVEY.md §2.9's scale path for per-entity
ordered aggregation over unbounded input).

The batch engine computes sessions with a lag window
(``__spark_entry__._q_sessionize`` / oracles.sessionize_sql); on a real
stream that window is unbounded state. This operator keeps ONE small
state tuple per user — (session_start, last_ts, n_events) in epoch
micros — and emits every CLOSED session as soon as an event arrives past
the gap. A sentinel barrier event (event_id = -1, timestamp past every
real event) closes the remaining open sessions deterministically, which
is how the driver query converges the stream to the batch answer without
wall-clock timeouts (GroupStateTimeout stays NoTimeout — processing-time
timeouts are nondeterministic under test).

Semantics parity with the batch twin: events sorted by (ts, event_id)
per user, strict ``gap > gap_minutes`` in microseconds, ties in ts stay
in one session. Scale shape: state is O(users) x 3 longs, each
micro-batch shuffles once on user_id, and the pandas function is
vectorized per Arrow group batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = "user_id long, session_start long, session_end long, n_events long"
_STATE_SCHEMA = "start long, last long, n long"
BARRIER_EVENT_ID = -1


def sessionize_stream(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Streaming (user_id, ts, event_id) -> closed sessions
    (user_id, session_start, session_end, n_events), timestamps as epoch
    micros. ``events`` must be a streaming DataFrame with those columns;
    rows with event_id == BARRIER_EVENT_ID close any open session and are
    not counted."""
    import pandas as pd

    gap_us = gap_minutes * 60 * 1_000_000

    def fn(key, pdfs, state: GroupState):
        (uid,) = key
        if state.exists:
            start, last, n = state.get
            if n == 0:
                start = last = None
        else:
            start = last = None
            n = 0
        pdf = pd.concat(list(pdfs), ignore_index=True)
        pdf = pdf.sort_values(["ts_us", "event_id"])
        rows = []
        for ts, eid in zip(pdf["ts_us"].tolist(), pdf["event_id"].tolist()):
            if eid == BARRIER_EVENT_ID:
                if n:
                    rows.append((uid, start, last, n))
                start, last, n = None, None, 0
                continue
            if last is not None and ts - last > gap_us:
                rows.append((uid, start, last, n))
                start, n = None, 0
            if start is None:
                start = ts
            n += 1
            last = ts
        state.update((start if n else -1, last if n else -1, n))
        yield pd.DataFrame(
            rows, columns=["user_id", "session_start", "session_end", "n_events"]
        )

    prepared = events.select(
        F.col("user_id").cast("long").alias("user_id"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        F.col("event_id").cast("long").alias("event_id"),
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        fn,
        SESSION_SCHEMA,
        _STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )


def sessionize_files_available_now(
    spark,
    indir: str,
    sink: str,
    checkpoint: str,
    gap_minutes: int = 30,
    max_files_per_batch: int = 1,
) -> None:
    """Run the stateful sessionizer over a directory of parquet event
    files as an AvailableNow stream (one file per micro-batch by default,
    so cross-batch state handoff is actually exercised), appending closed
    sessions to ``sink``."""
    schema = spark.read.parquet(indir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", str(max_files_per_batch))
        .parquet(indir)
    )
    out = sessionize_stream(stream, gap_minutes=gap_minutes)
    q = (
        out.writeStream.trigger(availableNow=True)
        .option("checkpointLocation", checkpoint)
        .format("parquet")
        .option("path", sink)
        .outputMode("append")
        .start()
    )
    q.awaitTermination()
