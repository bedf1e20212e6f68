"""Sliding-window streaming equality (completes streaming parity for
all three window shapes) + registry re-entrancy."""

from __future__ import annotations

from oculus_data_pipeline_spark.queries import get_queries
from oculus_data_pipeline_spark.sources.tables import load_table
from oculus_data_pipeline_spark.streaming.ingest import read_events_stream
from oculus_data_pipeline_spark.streaming.windows import sliding_window_agg


def test_streaming_sliding_equals_batch(spark, sf_dir):
    batch = {
        tuple(r)
        for r in sliding_window_agg(load_table(spark, sf_dir, "events")).collect()
    }
    stream = sliding_window_agg(
        read_events_stream(spark, f"{sf_dir}/events.parquet"), watermark="2 hours"
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("sliding_out")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {tuple(r) for r in spark.sql("SELECT * FROM sliding_out").collect()}
    assert got == batch


def test_registry_reentrant(spark, sf_dir):
    """The driver may call a query more than once in one session
    (temp-view re-registration, cached subtrees) — results must be
    stable."""
    qs = get_queries()
    for name in ("q34_grouping_sets", "q32_minhash_lsh_pairs"):
        r1 = sorted(map(tuple, qs[name](spark, sf_dir).collect()), key=repr)
        r2 = sorted(map(tuple, qs[name](spark, sf_dir).collect()), key=repr)
        assert r1 == r2, name


def test_stream_stream_join_equals_batch(spark, sf_dir):
    from oculus_data_pipeline_spark.streaming.joins import purchases_with_recent_views

    batch = {
        tuple(r)
        for r in purchases_with_recent_views(
            load_table(spark, sf_dir, "events")
        ).collect()
    }
    assert batch, "no purchase-view pairs in testdata?"
    stream = purchases_with_recent_views(
        read_events_stream(spark, f"{sf_dir}/events.parquet")
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("ssjoin_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {tuple(r) for r in spark.sql("SELECT * FROM ssjoin_out").collect()}
    assert got == batch
