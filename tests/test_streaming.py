"""Structured Streaming: the streaming plans must produce exactly the
batch results on the same input (availableNow trigger → memory sink),
including the applyInPandasWithState custom stateful operator."""

import pytest
from pyspark.sql import functions as F

from search_engine_wikipedia_spark.streaming import events as ev

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def feed_dir(spark, tmp_path_factory):
    """The event table split into 4 files — with maxFilesPerTrigger=1
    the stream processes them over multiple triggers, exercising real
    incremental state updates."""
    d = str(tmp_path_factory.mktemp("event_feed"))
    (spark.read.parquet(f"{SF_DIR}/events.parquet")
     .repartition(4).write.mode("overwrite").parquet(d))
    return d


def _run_stream(df, name, mode, timeout=180):
    q = (df.writeStream.format("memory").queryName(name)
         .outputMode(mode).trigger(availableNow=True).start())
    q.awaitTermination(timeout)
    assert not q.isActive


def _rowset(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_stream_windowed_counts_equals_batch(spark, feed_dir):
    batch = ev.windowed_counts(spark.read.parquet(feed_dir), "1 hour")
    stream = ev.windowed_counts(
        ev.read_event_stream(spark, feed_dir, max_files_per_trigger=1),
        "1 hour",
    )
    _run_stream(stream, "win_complete", "complete")
    got = spark.table("win_complete")
    cols = ["window_start", "window_end", "event_type", "n_events",
            "sum_value"]
    assert _rowset(got, cols) == _rowset(batch, cols)


def test_stream_sessionize_equals_batch(spark, feed_dir):
    batch = ev.sessionize(spark.read.parquet(feed_dir), "30 minutes")
    stream = ev.sessionize(
        ev.read_event_stream(spark, feed_dir, max_files_per_trigger=2),
        "30 minutes",
    )
    _run_stream(stream, "sess_complete", "complete")
    got = spark.table("sess_complete")
    cols = ["user_id", "session_start", "session_end", "n_events",
            "sum_value"]
    assert _rowset(got, cols) == _rowset(batch, cols)


def test_watermark_append_emits_only_finalized_windows(spark, feed_dir):
    """Append mode with a watermark emits exactly the windows whose end
    ≤ final watermark (max event time − delay) — bounded state; the
    late tail stays open and is NOT emitted."""
    stream = ev.stream_windowed_counts(
        ev.read_event_stream(spark, feed_dir), "1 hour", watermark="2 hours")
    _run_stream(stream, "win_append", "append")
    got = spark.table("win_append")
    # batch twin under the same instant-cast the watermark path applies
    batch = ev.windowed_counts(
        ev._instant_ts(spark.read.parquet(feed_dir)), "1 hour")
    cols = ["window_start", "window_end", "event_type", "n_events",
            "sum_value"]
    got_rows, batch_rows = set(_rowset(got, cols)), set(_rowset(batch, cols))
    assert got_rows, "append mode emitted nothing"
    assert got_rows <= batch_rows           # never wrong, only withheld
    max_ts = spark.read.parquet(feed_dir).agg(F.max("ts")).first()[0]
    import datetime as dt

    wm = max_ts - dt.timedelta(hours=2)
    for r in batch_rows - got_rows:         # withheld ⇒ not yet final
        assert r[1] > wm, r


def test_stateful_running_totals_converge_to_batch(spark, feed_dir):
    """applyInPandasWithState per-user accumulator: the LAST update per
    user (counts grow monotonically → max) equals the batch aggregate."""
    stream = ev.running_user_totals(
        ev.read_event_stream(spark, feed_dir, max_files_per_trigger=1))
    _run_stream(stream, "totals_update", "update")
    final = (
        spark.table("totals_update")
        .groupBy("user_id")
        .agg(F.max("n_events").alias("n_events"),
             F.max("sum_value").alias("sum_value"))
    )
    batch = ev.user_totals_batch(spark.read.parquet(feed_dir))
    cols = ["user_id", "n_events", "sum_value"]
    f = {r["user_id"]: r for r in final.collect()}
    b = {r["user_id"]: r for r in batch.collect()}
    assert set(f) == set(b)
    for u, r in b.items():
        assert f[u]["n_events"] == r["n_events"], u
        assert abs(f[u]["sum_value"] - r["sum_value"]) < 1e-6, u
