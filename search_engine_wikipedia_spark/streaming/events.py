"""Structured-Streaming event operators (the continuous-ingest side of
a 100 TB pipeline).

The reference engine is batch-only; a web-scale deployment ingests a
live event/page stream alongside the static dump.  These operators are
written as PLAIN TRANSFORMS over a DataFrame — the same function runs

* in batch (``spark.read.parquet`` — what the DuckDB oracles check, so
  the windowing semantics are correctness-gated), and
* as a stream (``spark.readStream`` + watermark + ``writeStream``,
  exercised end-to-end by ``tests/test_streaming.py`` with an
  ``availableNow`` trigger and a memory sink: stream result == batch
  result on the same input).

Operators
---------
* ``windowed_counts``  — tumbling event-time window per event_type
  (``F.window``): the canonical streaming aggregation.
* ``sessionize``       — per-user session windows with a gap timeout
  (``F.session_window``): Spark's native session semantics (window end
  = last event + gap).
* ``running_user_totals`` — custom stateful operator via
  ``applyInPandasWithState`` (streaming) with a batch-equivalent
  groupBy for the oracle: per-user running event count / value sum.

Scale notes: both window aggs shuffle on (window ∩ key) — bounded
state with watermarks; the stateful op keys state by user_id (RocksDB
state store in production).  Nothing collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# ts is TIMESTAMP_NTZ in the driver parquet (naive, tz-independent —
# the DuckDB oracle sees the same wall-clock values)
EVENTS_SCHEMA = ("event_id long, ts timestamp_ntz, user_id long, "
                 "event_type string, value double, props string")


def windowed_counts(events: DataFrame, window: str = "1 hour") -> DataFrame:
    """Tumbling-window counts per event type.

    → (window_start, window_end, event_type, n_events, sum_value);
    sums rounded to 6 decimals so the SQL oracle agrees exactly.
    Works identically on a batch or streaming DataFrame (for streams,
    apply ``withWatermark`` upstream — see ``stream_windowed_counts``).
    """
    return (
        events.groupBy(F.window("ts", window), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type", "n_events", "sum_value",
        )
    )


def sessionize(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Per-user session windows: a session extends while consecutive
    events are < ``gap`` apart; session end = last event + gap
    (Spark ``session_window`` semantics, mirrored by the oracle's
    lag/cumsum formulation).

    → (user_id, session_start, session_end, n_events, sum_value).
    """
    return (
        events.groupBy(F.session_window("ts", gap), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events", "sum_value",
        )
    )


def user_totals_batch(events: DataFrame) -> DataFrame:
    """Batch twin of the stateful per-user accumulator:
    (user_id, n_events, sum_value)."""
    return events.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 6).alias("sum_value"),
    )


# ---------------------------------------------------------------------------
# Streaming entry points
# ---------------------------------------------------------------------------
def read_event_stream(spark, path: str, max_files_per_trigger: int | None = None
                      ) -> DataFrame:
    """``readStream`` over a parquet event feed (schema pinned — a
    streaming source cannot infer)."""
    reader = spark.readStream.schema(EVENTS_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def _instant_ts(stream: DataFrame) -> DataFrame:
    """Watermarks require an instant (TIMESTAMP) event-time column;
    the feed's naive TIMESTAMP_NTZ is interpreted in the session
    timezone (self-consistent for windowing/eviction)."""
    return stream.withColumn("ts", F.col("ts").cast("timestamp"))


def stream_windowed_counts(stream: DataFrame, window: str = "1 hour",
                           watermark: str = "2 hours") -> DataFrame:
    """Watermarked tumbling aggregation: late events beyond
    ``watermark`` are dropped and window state is evicted — bounded
    state for an unbounded stream."""
    return windowed_counts(
        _instant_ts(stream).withWatermark("ts", watermark), window)


def stream_sessionize(stream: DataFrame, gap: str = "30 minutes",
                      watermark: str = "2 hours") -> DataFrame:
    return sessionize(
        _instant_ts(stream).withWatermark("ts", watermark), gap)


STATE_SCHEMA = "n_events long, sum_value double"
TOTALS_SCHEMA = "user_id long, n_events long, sum_value double"


def running_user_totals(stream: DataFrame) -> DataFrame:
    """Custom stateful operator (``applyInPandasWithState``): per-user
    running (n_events, sum_value), emitting the updated total on every
    trigger.  The batch oracle is ``user_totals_batch`` — after the
    final trigger the latest emitted row per user equals the batch
    aggregate."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdfs, state: GroupState):
        n, s = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            s += float(pdf["value"].sum())
        state.update((n, s))
        yield pd.DataFrame({
            "user_id": [key[0]],
            "n_events": [n],
            "sum_value": [round(s, 6)],
        })

    return (
        stream.groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=TOTALS_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
