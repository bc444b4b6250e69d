"""Structured Streaming surface: windowed aggregation and custom stateful
sessionization, checked against their batch equivalents."""
import shutil

import pytest
from pyspark.sql import functions as F

from dask_relabeling_spark.plans.relational import t
from dask_relabeling_spark.streaming.events import (sessionize_batch,
                                                    sessionize_stateful,
                                                    windowed_event_counts)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture()
def events_stream_dir(spark, tmp_path):
    # stream source needs a directory; re-materialize events with proper
    # (micros) timestamps there
    out = str(tmp_path / "events_stream")
    t(spark, SF_DIR, "events").filter(F.col("user_id") < 8) \
        .coalesce(1).write.parquet(out)
    yield out
    shutil.rmtree(out, ignore_errors=True)


def test_streaming_windowed_counts_matches_batch(spark, events_stream_dir):
    batch_df = spark.read.parquet(events_stream_dir)
    expected = {tuple(r) for r in
                windowed_event_counts(batch_df).collect()}

    stream = spark.readStream.schema(batch_df.schema) \
        .parquet(events_stream_dir)
    q = (windowed_event_counts(stream)
         .writeStream.format("memory").queryName("win_counts")
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {tuple(r) for r in spark.sql("SELECT * FROM win_counts").collect()}
    assert got == expected


def test_stateful_sessionize_emits_closed_sessions(spark, events_stream_dir):
    batch_df = spark.read.parquet(events_stream_dir)
    sessions = sessionize_batch(batch_df).collect()
    # within one micro-batch the stateful operator emits every session
    # except each user's trailing (still-open) one
    last_idx = {}
    for r in sessions:
        last_idx[r.user_id] = max(last_idx.get(r.user_id, 0), r.session_idx)
    expected = {(r.user_id, r.session_idx, r.n_events, r.first_event,
                 r.last_event)
                for r in sessions if r.session_idx != last_idx[r.user_id]}

    stream = spark.readStream.schema(batch_df.schema) \
        .parquet(events_stream_dir)
    q = (sessionize_stateful(stream, idle_timeout=False)
         .writeStream.format("memory").queryName("sessions")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {tuple(r) for r in spark.sql(
        "SELECT user_id, session_idx, n_events, first_event, last_event "
        "FROM sessions").collect()}
    assert got == expected


def test_streaming_dedup_bounded_state(spark, tmp_path):
    import shutil
    from dask_relabeling_spark.streaming.events import dedup_exact_stream
    src = str(tmp_path / "dup_events")
    ev = t(spark, SF_DIR, "events").filter(F.col("user_id") < 8)
    # duplicate every row: dedup must return each event exactly once
    ev.unionAll(ev).coalesce(1).write.parquet(src)
    try:
        batch_df = spark.read.parquet(src)
        expected = batch_df.dropDuplicates(["event_id"]).count()
        stream = spark.readStream.schema(batch_df.schema).parquet(src)
        q = (dedup_exact_stream(stream, key_cols=("event_id",))
             .writeStream.format("memory").queryName("dedup_stream")
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination(120)
        got = spark.sql(
            "SELECT count(*) AS n, count(DISTINCT event_id) AS d "
            "FROM dedup_stream").first()
        assert (got.n, got.d) == (expected, expected)
    finally:
        shutil.rmtree(src, ignore_errors=True)


def test_stream_stream_attribution_matches_batch(spark, events_stream_dir):
    from dask_relabeling_spark.streaming.events import (
        streaming_view_click_attribution, view_click_attribution)
    batch_df = spark.read.parquet(events_stream_dir)
    expected = {tuple(r) for r in view_click_attribution(
        batch_df.filter(F.col("event_type") == "view"),
        batch_df.filter(F.col("event_type") == "click")).collect()}
    assert expected, "fixture must produce at least one attribution pair"

    stream = spark.readStream.schema(batch_df.schema) \
        .parquet(events_stream_dir)
    q = (streaming_view_click_attribution(stream)
         .writeStream.format("memory").queryName("attrib")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {tuple(r) for r in spark.sql("SELECT * FROM attrib").collect()}
    assert got == expected


def test_foreach_batch_sink_idempotent_on_replay(spark, tmp_path):
    """Re-running a batch id (the crash-replay case) must not duplicate
    rows in the sink directory."""
    from dask_relabeling_spark.streaming.events import idempotent_batch_sink
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    spark.range(10).selectExpr("id", "id * 2 AS v").write.parquet(src)
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    q = (stream.writeStream.foreachBatch(idempotent_batch_sink(out))
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    assert got.count() == 10
    # simulate the replay: same batch_id written again -> same contents
    sink = idempotent_batch_sink(out)
    sink(spark.read.parquet(src), 0)
    replayed = spark.read.parquet(out)
    assert replayed.count() == 10
    assert sorted(r["id"] for r in replayed.collect()) == list(range(10))


def test_incremental_dedup_stream_matches_batch(spark, tmp_path):
    import shutil
    from dask_relabeling_spark.operators.dedup import incremental_new_docs
    from dask_relabeling_spark.streaming.events import (
        incremental_dedup_stream)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    seen = docs.filter(F.col("doc_id") % 10 != 7)
    batch = docs.filter(F.col("doc_id") % 10 == 7)
    src = str(tmp_path / "incoming_docs")
    batch.coalesce(2).write.parquet(src)
    try:
        expected = sorted(map(tuple,
                              incremental_new_docs(batch, seen).collect()))
        stream = spark.readStream.schema(batch.schema).parquet(src)
        q = (incremental_dedup_stream(stream, seen)
             .writeStream.format("memory").queryName("inc_dedup")
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination(120)
        got = sorted(map(tuple, spark.sql(
            "SELECT fingerprint, id FROM inc_dedup").collect()))
        assert got == expected and len(got) > 0
    finally:
        shutil.rmtree(src, ignore_errors=True)
