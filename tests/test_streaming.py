"""Streaming-vs-batch parity tests (SURVEY.md §2.9): the same
window specs must produce identical results under readStream
(availableNow → memory sink) and the batch operators."""

from __future__ import annotations

from top_produce_etl_spark.io.sources import load_table
from top_produce_etl_spark.operators.eventtime import (
    session_window_agg,
    tumbling_window_agg,
)
from top_produce_etl_spark.streaming.jobs import (
    run_windowed_counts_stream,
    sessionize_batch,
)

from pyspark.sql import functions as F


def test_stream_tumbling_counts_equal_batch(spark, sf_dir):
    batch = tumbling_window_agg(
        load_table(spark, sf_dir, "events"),
        "ts",
        "1 day",
        ["event_type"],
        [F.count(F.lit(1)).alias("n_events")],
    ).select("window_start", "window_end", "event_type", "n_events")

    stream = run_windowed_counts_stream(
        spark, sf_dir, sink_table="t_stream_counts"
    )

    b = sorted(tuple(r) for r in batch.collect())
    s = sorted(tuple(r) for r in stream.collect())
    assert b == s and len(b) > 0


def test_applyinpandas_sessionize_matches_session_window(spark, sf_dir):
    """The custom applyInPandas sessionizer must reproduce the
    built-in session_window exactly (same gap semantics)."""
    events = load_table(spark, sf_dir, "events")
    builtin = session_window_agg(
        events, "ts", "30 minutes", ["user_id"], [F.count(F.lit(1)).alias("n_events")]
    ).select("user_id", "session_start", "session_end", "n_events")
    custom = sessionize_batch(events, "30 minutes")

    b = sorted(tuple(r) for r in builtin.collect())
    c = sorted(tuple(r) for r in custom.collect())
    assert b == c and len(b) > 100
