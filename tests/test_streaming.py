"""Structured Streaming tests: drive the event stream operators to
completion over the sf0.001 events parquet via a memory sink, and
check the tumbling aggregation agrees with its batch twin (Spark's
unified model makes them the same transformation)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spark_query_engine import streaming as ST
from spark_query_engine.queries import load


@pytest.fixture(scope="module")
def events_stream(spark, sf_dir):
    return ST.stream_from_parquet_dir(spark, f"{sf_dir}/events.parquet")


def test_stream_is_streaming(events_stream):
    assert events_stream.isStreaming
    assert dict(events_stream.dtypes)["ts"].startswith("timestamp")


def test_tumbling_stream_matches_batch(spark, sf_dir, events_stream):
    agg = ST.tumbling_counts(events_stream, "1 hour", "30 minutes")
    ST.run_to_memory_sink(agg, "tumbling_out", mode="append")
    got = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in spark.sql("SELECT * FROM tumbling_out").collect()
    }

    batch = (
        load(spark, sf_dir, "events")
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("v"),
        )
        .select(F.col("window.start").alias("ws"), "event_type", "n", "v")
    )
    want = {(r["ws"], r["event_type"]): (r["n"], r["v"]) for r in batch.collect()}

    # watermark may hold back the final (incomplete) windows in append
    # mode; every emitted window must match the batch result exactly
    assert len(got) > 0
    for key, val in got.items():
        # stream ts is TimestampType (UTC session) vs batch NTZ: compare
        # by naive wall value
        batch_key = (key[0].replace(tzinfo=None), key[1])
        assert want[batch_key] == val, key


def test_stateful_running_totals_matches_batch(spark, sf_dir, events_stream):
    """applyInPandasWithState per-user running totals: after draining
    the (single-file) stream, the last emission per user must equal
    the batch groupBy totals."""
    out = ST.running_user_totals(events_stream)
    ST.run_to_memory_sink(out, "running_out", mode="update")
    got = {
        r["user_id"]: (r["n_events"], r["total_value"])
        for r in spark.sql("SELECT * FROM running_out").collect()
    }

    batch = (
        load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.coalesce(F.col("value"), F.lit(0.0))), 2).alias("v"),
        )
    )
    want = {r["user_id"]: (r["n"], r["v"]) for r in batch.collect()}
    assert got == want


def test_session_stream_runs(spark, events_stream):
    sess = ST.sessionize_stream(events_stream, gap="30 minutes")
    ST.run_to_memory_sink(sess, "session_out", mode="append")
    rows = spark.sql("SELECT * FROM session_out").collect()
    assert len(rows) > 0
    assert all(r["session_end"] >= r["session_start"] for r in rows)
    assert all(r["n_events"] >= 1 for r in rows)
