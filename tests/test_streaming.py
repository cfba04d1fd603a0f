"""Structured Streaming smoke + batch-equivalence tests: the streaming
jobs drained with availableNow must reproduce the batch operators'
answers on the static events table (SURVEY.md §2.10)."""

from __future__ import annotations

from synthetic_data_pipeline_spark.operators.events import (
    q30_tumbling_hourly,
    q35_first_event_per_user_type,
)
from synthetic_data_pipeline_spark.streaming.jobs import (
    dedup_first_events,
    run_available_now,
    session_counts,
    stream_events,
    tumbling_counts,
)


def test_tumbling_stream_equals_batch(spark, sf_dir):
    stream = tumbling_counts(stream_events(spark, sf_dir))
    got = run_available_now(stream, mode="complete").collect()
    want = q30_tumbling_hourly(spark, sf_dir).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))


def test_session_stream_runs(spark, sf_dir):
    stream = session_counts(stream_events(spark, sf_dir))
    got = run_available_now(stream, mode="complete")
    assert got.count() > 0
    # every (user, session) holds at least one event
    assert got.filter("n_events < 1").count() == 0


def test_dedup_stream_matches_batch_count(spark, sf_dir):
    stream = dedup_first_events(stream_events(spark, sf_dir))
    got = run_available_now(stream, mode="append")
    want = q35_first_event_per_user_type(spark, sf_dir)
    assert got.count() == want.count()
    # same (user_id, event_type) key set survives
    g = {(r.user_id, r.event_type) for r in got.collect()}
    w = {(r.user_id, r.event_type) for r in want.collect()}
    assert g == w
