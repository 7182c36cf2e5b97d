"""Streaming tier semantics: stream results must equal their batch twins
(the correctness contract for B60-B63, since streaming execution itself
can't be DuckDB-checked)."""

from __future__ import annotations

from pyspark.sql import functions as F

from lookup_transform_spark import LookupSpec, registry
from lookup_transform_spark.streaming import (
    read_events_stream,
    run_to_memory,
    stream_dedup_within_watermark,
    stream_static_lookup,
    stream_tumbling_window,
)

SF = "/root/testdata/sf0.001"


def test_stream_static_lookup_equals_batch(spark):
    ev = read_events_stream(spark, SF).select("event_id", "user_id")
    cust = spark.read.parquet(f"{SF}/customer.parquet")
    spec = LookupSpec("customer", "user_id", "c_custkey", "c_mktsegment", "segment")
    got = run_to_memory(stream_static_lookup(ev, cust, spec), "t_sl")

    batch_ev = registry._events(spark, SF).select("event_id", "user_id")
    want = spec.apply(batch_ev, cust)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_stream_tumbling_equals_batch_twin(spark):
    ev = read_events_stream(spark, SF)
    got = run_to_memory(
        stream_tumbling_window(ev), "t_tw", output_mode="complete"
    ).select("w_start", "event_type", "n_events")
    want = registry.QUERIES["window_tumbling"](spark, SF).select(
        "w_start", "event_type", "n_events"
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_stream_dedup_one_row_per_key(spark):
    ev = read_events_stream(spark, SF).select("event_id", "user_id", "ts")
    got = run_to_memory(stream_dedup_within_watermark(ev, ["user_id"]), "t_dd")
    n_users = (
        registry._events(spark, SF).select("user_id").distinct().count()
    )
    assert got.count() == n_users
    assert got.select("user_id").distinct().count() == n_users


def test_stream_session_windows_merge(spark):
    from lookup_transform_spark.streaming import stream_session_window

    ev = read_events_stream(spark, SF)
    got = run_to_memory(
        stream_session_window(ev), "t_sw", output_mode="complete"
    )
    # session count must equal the batch sessionize twin's session count
    want = registry.QUERIES["session_window_agg"](spark, SF)
    assert got.count() == want.count()
    # every session holds >= 1 event and ends after it starts
    bad = got.filter(
        (F.col("n_events") < 1) | (F.col("session_end") <= F.col("session_start"))
    )
    assert bad.count() == 0
