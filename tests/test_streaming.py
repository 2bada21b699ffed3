"""Streaming operator tests: batch/stream agreement with AvailableNow trigger
over the driver's events parquet."""

import os

import pytest
from pyspark.sql import functions as F

from sedona_iceberg_extension_spark import streaming as S


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    from sedona_iceberg_extension_spark.sources import load_table
    return load_table(spark, sf_dir, "events")


def test_windowed_counts_batch(events):
    out = S.windowed_event_counts(events, window="1 hour")
    rows = out.collect()
    assert len(rows) > 0
    assert sum(r["n_events"] for r in rows) == events.count()


def test_sessionize_batch(events):
    out = S.sessionize(events, gap="30 minutes")
    rows = out.collect()
    assert len(rows) > 0
    assert sum(r["n_events"] for r in rows) == events.count()
    # session windows are disjoint per user and ordered
    by_user = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append((r["session_start"], r["session_end"]))
    for spans in by_user.values():
        spans.sort()
        for (s1, e1), (s2, _) in zip(spans, spans[1:]):
            assert e1 <= s2


def test_stream_matches_batch(spark, events, sf_dir, tmp_path):
    """availableNow streaming run over the same parquet produces the same
    windowed counts as the batch path (late-data watermark honored)."""
    from sedona_iceberg_extension_spark.sources import stream_table
    stream = stream_table(spark, sf_dir, "events")
    out = S.windowed_event_counts(stream, window="1 hour", watermark="10 years")
    q = (out.writeStream.format("memory").queryName("win_counts")
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {(r["window_start"], r["event_type"]): r["n_events"]
           for r in spark.sql("SELECT * FROM win_counts").collect()}
    want = {(r["window_start"], r["event_type"]): r["n_events"]
            for r in S.windowed_event_counts(events, window="1 hour").collect()}
    assert got == want


def test_stateful_running_totals_stream(spark, events, sf_dir):
    from sedona_iceberg_extension_spark.sources import stream_table
    stream = stream_table(spark, sf_dir, "events")
    out = S.running_user_totals_stateful(stream)
    q = (out.writeStream.format("memory").queryName("running_totals")
         .outputMode("update").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {r["user_id"]: (r["n_events"], r["total_value"])
           for r in spark.sql(
               "SELECT user_id, max(n_events) n_events, max(total_value) total_value "
               "FROM running_totals GROUP BY user_id").collect()}
    want = {r["user_id"]: (r["n"], r["t"]) for r in
            events.groupBy("user_id").agg(
                F.count(F.lit(1)).alias("n"), F.sum("value").alias("t")).collect()}
    assert set(got) == set(want)
    for u in want:
        assert got[u][0] == want[u][0]
        assert got[u][1] == pytest.approx(want[u][1])
