"""Sessionization — batch and custom-stateful-streaming forms.

The batch form is pure window math (lag → gap flag → running session index
→ per-session aggregate) and carries a DuckDB oracle twin in
``__spark_entry__`` like any other operator. The streaming form is the same
semantics as a CUSTOM STATEFUL OPERATOR via ``applyInPandasWithState`` —
per-user open-session state carried across micro-batches, closed sessions
emitted when the event gap exceeds the timeout. The two are equality-tested
(tests/test_streaming.py): streaming closed sessions == batch sessions minus
each user's final (still-open) session.

Scale shape: batch = ONE shuffle on the user key (window + aggregate fuse);
streaming = state store keyed by user, O(users) state, each micro-batch
touches only the users present in it.
"""

from __future__ import annotations

import pandas as pd  # module-level: pandas_udf/applyInPandas type hints

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

SESSION_SCHEMA = (
    "user_id bigint, session_start timestamp, session_end timestamp, "
    "n_events bigint, total_value double"
)
# session state carries epoch MICROSECONDS as int64 — float seconds cannot
# represent µs-precision event times exactly (float64 resolution at 2024
# epochs is ~240 ns) and ns-precision pandas timestamps fail the Arrow cast
_STATE_SCHEMA = "start bigint, last bigint, n bigint, total double"


def sessionize(
    df: DataFrame, user_col: str = "user_id", ts_col: str = "ts",
    id_col: str = "event_id", value_col: str = "value", gap_minutes: int = 30,
) -> DataFrame:
    """Batch sessionization: split each user's event stream at gaps larger
    than ``gap_minutes``; one row per session."""
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col).asc(), F.col(id_col).asc())
    # microsecond gap math — unix_timestamp() truncates to whole seconds,
    # which would disagree with the µs-exact streaming kernel on boundary gaps
    gap = F.unix_micros(ts_col) - F.unix_micros(F.lag(ts_col).over(w))
    marked = df.withColumn(
        "_new", F.when(gap > gap_minutes * 60 * 1_000_000, 1).otherwise(0)
    ).withColumn("_sess", F.sum("_new").over(w))
    return (
        marked.groupBy(F.col(user_col).alias("user_id"), "_sess")
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count("*").alias("n_events"),
            F.sum(value_col).alias("total_value"),
        )
        .drop("_sess")
    )


def _session_fn(gap_seconds: float):
    """applyInPandasWithState kernel: per-user open-session state, emit
    closed sessions. State = (start, last, n, total) as epoch seconds."""

    gap_us = int(gap_seconds * 1_000_000)

    def fn(key, pdfs, state):
        rows = pd.concat(list(pdfs))
        rows = rows.sort_values(["ts", "event_id"])
        if state.exists:
            start, last, n, total = state.get
        else:
            start = None
            last, n, total = 0, 0, 0.0
        closed = []
        for ts, val in zip(rows["ts"], rows["value"]):
            t = ts.value // 1000  # pandas ns → epoch µs (exact int math)
            if start is None:
                start, last, n, total = t, t, 1, float(val)
            elif t - last > gap_us:
                closed.append((key[0], start, last, int(n), float(total)))
                start, last, n, total = t, t, 1, float(val)
            else:
                last, n, total = t, n + 1, total + float(val)
        state.update((int(start), int(last), int(n), float(total)))
        yield pd.DataFrame(
            [
                {
                    "user_id": u,
                    "session_start": pd.Timestamp(s, unit="us"),
                    "session_end": pd.Timestamp(e, unit="us"),
                    "n_events": c,
                    "total_value": v,
                }
                for u, s, e, c, v in closed
            ],
            columns=["user_id", "session_start", "session_end", "n_events", "total_value"],
        )

    return fn


def sessionize_stream(
    spark: SparkSession, sf_dir: str, out_dir: str, gap_minutes: int = 30
):
    """Streaming sessionization of the events table replayed as a file
    stream. Emits CLOSED sessions (append mode); per-user open-session
    state persists in the streaming state store across micro-batches.
    Returns the StreamingQuery (availableNow trigger)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("pathGlobFilter", "events.parquet")
        .parquet(f"{sf_dir}")
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    out = stream.groupBy("user_id").applyInPandasWithState(
        _session_fn(gap_minutes * 60),
        outputStructType=SESSION_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return (
        out.writeStream.outputMode("append")
        .format("parquet")
        .option("path", f"{out_dir}/sessions")
        .option("checkpointLocation", f"{out_dir}/_ckpt_sessions")
        .trigger(availableNow=True)
        .start()
    )
