"""Structured Streaming operators over an events stream.

The reference is purely batch (SURVEY §2.2: no watermarks/state anywhere),
so this module is part of the engine's *extension* surface: the same
windowed aggregation and sessionization semantics offered both as batch
DataFrame ops (oracle-checkable) and as streaming plans (``readStream`` →
watermark → windowed agg / ``applyInPandasWithState``).
"""
from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_GAP_MIN = 30


def windowed_event_counts(df: DataFrame, window: str = "1 hour") -> DataFrame:
    """Tumbling-window counts/sums per event type.  Works identically on a
    batch DataFrame and a streaming one (add ``with_watermark`` for
    streams).

    NULL-ts rows are not on the timeline: ``F.window`` itself injects an
    ``isnotnull(ts)`` filter, so they are excluded — the registered
    oracle mirrors this with an explicit ``WHERE ts IS NOT NULL``
    (DuckDB's ``date_trunc`` would otherwise keep a NULL bucket the
    Spark plan never produces; round-12 dirty-corpus fuzz).

    The value sum rides exact finite-only DECIMAL(27,9) partials and
    is rounded AS a DECIMAL (the seed-131 convention, see
    ``plans.relational.finite_or_null``): round-15's tie-injection
    audit showed a 5-decimal dirty value lands ``round(sum, 4)`` on a
    true half, where the engines' DOUBLE rounds split."""
    # lazy import: plans -> llm -> streaming.events at package import
    # time, so a module-level import back into plans would be circular
    from ..plans.relational import finite_or_null
    return (df.groupBy(F.window("ts", window).alias("w"), "event_type")
            .agg(F.count("*").alias("n_events"),
                 F.round(F.sum(finite_or_null("value")
                               .cast("decimal(27,9)")), 4)
                 .cast("double").alias("total_value"))
            .select(F.col("w.start").alias("window_start"), "event_type",
                    "n_events", "total_value"))


def streaming_windowed_counts(stream: DataFrame,
                              window: str = "1 hour",
                              watermark: str = "2 hours") -> DataFrame:
    """Streaming plan: watermarked tumbling window — late rows beyond the
    watermark are dropped, state is bounded (the 100 TB-friendly contract).
    """
    return windowed_event_counts(stream.withWatermark("ts", watermark),
                                 window)


def dedup_exact_stream(stream: DataFrame, key_cols=("fingerprint",),
                       ts_col: str = "ts",
                       watermark: str = "1 hour") -> DataFrame:
    """Streaming exact dedup: keep the first row per key, with state
    bounded by the watermark (``dropDuplicatesWithinWatermark`` purges a
    key's entry once the watermark passes it — without that, a dedup over
    an unbounded stream accumulates state forever, which at 100 TB/day of
    documents is the difference between a working pipeline and an OOM).
    The batch equivalent is ``dropDuplicates`` on the same keys."""
    return (stream.withWatermark(ts_col, watermark)
            .dropDuplicatesWithinWatermark(list(key_cols)))


def sessionize_batch(df: DataFrame, gap_min: int = SESSION_GAP_MIN
                     ) -> DataFrame:
    """Batch sessionization: a session breaks when the gap to the previous
    event of the same user exceeds ``gap_min`` minutes.  Pure window
    functions (lag + conditional cumsum) — fully SQL-expressible, so it
    doubles as the oracle for the stateful streaming variant.

    NULL-ts events belong to no session (they cannot be placed on the
    timeline) and are excluded EXPLICITLY: without the filter the two
    engines sessionize them differently — Spark's window sorts NULLs
    first (each opens a session break), DuckDB's sorts them last (each
    joins the user's final session) — a silent per-user session-count
    divergence (round-12 dirty-corpus fuzz).  The streaming twin
    agrees: a watermarked stream drops NULL-event-time rows."""
    df = df.filter(F.col("ts").isNotNull())
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("long") - \
        F.lag(F.col("ts").cast("long")).over(w)
    new_sess = F.when(gap.isNull() | (gap > gap_min * 60), 1).otherwise(0)
    with_sess = df.withColumn(
        "session_idx", F.sum(new_sess).over(
            w.rowsBetween(Window.unboundedPreceding, 0)))
    return (with_sess.groupBy("user_id", "session_idx")
            .agg(F.count("*").alias("n_events"),
                 F.min("event_id").alias("first_event"),
                 F.max("event_id").alias("last_event")))


_SESSION_STATE_SCHEMA = "last_ts LONG, session_idx LONG, n LONG, first_ev LONG, last_ev LONG"
_SESSION_OUT_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("session_idx", T.LongType()),
    T.StructField("n_events", T.LongType()),
    T.StructField("first_event", T.LongType()),
    T.StructField("last_event", T.LongType()),
])


def sessionize_stateful(stream: DataFrame, gap_min: int = SESSION_GAP_MIN,
                        idle_timeout: bool = True) -> DataFrame:
    """Custom stateful streaming operator: per-user session tracking with
    ``applyInPandasWithState`` (processing-time timeout closes idle
    sessions).  The genuinely-not-SQL part of the streaming surface.

    ``idle_timeout=False`` disables the processing-time timeout (useful
    with ``trigger(availableNow=True)``, which otherwise never terminates
    while timeouts are registered); trailing open sessions then stay in
    state instead of being force-closed.
    """

    def fn(key: Tuple, pdfs: Iterator[pd.DataFrame], state: GroupState):
        (user_id,) = key
        if state.hasTimedOut:
            last_ts, sess, n, fe, le = state.get
            state.remove()
            yield pd.DataFrame([{"user_id": user_id, "session_idx": sess,
                                 "n_events": n, "first_event": fe,
                                 "last_event": le}])
            return
        rows = pd.concat(list(pdfs)).sort_values(["ts", "event_id"])
        if state.exists:
            last_ts, sess, n, fe, le = state.get
        else:
            last_ts, sess, n, fe, le = None, 0, 0, None, None
        closed = []
        # zip over pre-extracted int arrays: iterrows materializes a
        # Series per row and dominated this loop's profile.  The ns->s
        # conversion FLOORS; for pre-1970 timestamps with sub-second
        # parts that differs from truncation toward zero — matching
        # Spark's own timestamp->long cast (floor), which the batch
        # twin sessionize_batch uses, so the two paths agree on the
        # full domain
        if rows["ts"].isna().any():
            # NaT would silently become the int64 sentinel (a huge
            # negative epoch) and corrupt session boundaries; the old
            # pd.Timestamp path raised here, so keep failing loudly
            raise ValueError(
                f"sessionize: null ts for user_id={user_id}")
        ts_arr = (rows["ts"].astype("datetime64[ns]").astype("int64")
                  // 1_000_000_000)
        for ts, ev in zip(ts_arr.tolist(),
                          rows["event_id"].astype("int64").tolist()):
            if last_ts is None or ts - last_ts > gap_min * 60:
                if n > 0:
                    closed.append({"user_id": user_id, "session_idx": sess,
                                   "n_events": n, "first_event": fe,
                                   "last_event": le})
                sess, n, fe, le = sess + 1, 0, None, None
            n += 1
            fe = ev if fe is None else fe
            le = ev
            last_ts = ts
        state.update((last_ts, sess, n, fe, le))
        if idle_timeout:
            state.setTimeoutDuration(gap_min * 60 * 1000)
        if closed:
            yield pd.DataFrame(closed)

    conf = GroupStateTimeout.ProcessingTimeTimeout if idle_timeout \
        else GroupStateTimeout.NoTimeout
    return (stream.groupBy("user_id").applyInPandasWithState(
        fn, outputStructType=_SESSION_OUT_SCHEMA,
        stateStructType=_SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=conf))


ATTR_WINDOW_MIN = 30


def view_click_attribution(views: DataFrame, clicks: DataFrame,
                           window_min: int = ATTR_WINDOW_MIN) -> DataFrame:
    """All (view, click) attribution pairs: a click joins every view by
    the same user in the preceding ``window_min`` minutes.  Identical
    code path for batch and streaming inputs — on streams, watermark both
    sides first (`streaming_view_click_attribution`), and the time-bound
    join condition is exactly what lets Spark purge join state (an
    unbounded-interval stream-stream join would buffer forever).

    Batch physical plan: equi-join on user_id with the range condition as
    a residual predicate — one shuffle, no interval explosion."""
    v = views.select(F.col("user_id").alias("v_user"),
                     F.col("event_id").alias("view_id"),
                     F.col("ts").alias("view_ts"))
    c = clicks.select(F.col("user_id").alias("c_user"),
                      F.col("event_id").alias("click_id"),
                      F.col("ts").alias("click_ts"))
    cond = ((F.col("v_user") == F.col("c_user")) &
            (F.col("view_ts") <= F.col("click_ts")) &
            (F.col("view_ts") >= F.col("click_ts")
             - F.expr(f"INTERVAL {window_min} MINUTES")))
    return (v.join(c, cond)
            .select(F.col("c_user").alias("user_id"),
                    "view_id", "click_id"))


def streaming_view_click_attribution(events_stream: DataFrame,
                                     window_min: int = ATTR_WINDOW_MIN,
                                     watermark: str = "2 hours") -> DataFrame:
    """Watermarked stream-stream interval join.  Both sides carry a
    watermark and the join range is bounded, so view-side state is
    dropped once `click watermark - window_min` passes it."""
    views = (events_stream.filter(F.col("event_type") == "view")
             .withWatermark("ts", watermark))
    clicks = (events_stream.filter(F.col("event_type") == "click")
              .withWatermark("ts", watermark))
    return view_click_attribution(views, clicks, window_min)


def idempotent_batch_sink(out_dir: str, fmt: str = "parquet"):
    """Exactly-once lake sink for ``foreachBatch``: each micro-batch
    lands in its own ``batch_id=N/`` directory, written atomically by
    Spark's file committer.  After a crash-and-restart the checkpoint
    replays the last unacknowledged batch with the SAME batch_id — the
    rewrite overwrites only that one directory, so downstream readers of
    ``out_dir`` never see duplicates (at-least-once replay + idempotent
    per-batch target = exactly-once contents).  This is the standard
    Structured Streaming pattern for sinks without transactional
    support.

    Use: ``stream.writeStream.foreachBatch(idempotent_batch_sink(d))``
    with ``option("checkpointLocation", ...)``."""
    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        (batch_df.write.format(fmt).mode("overwrite")
         .save(f"{out_dir}/batch_id={batch_id}"))
    return write_batch


def incremental_dedup_stream(stream: DataFrame, seen: DataFrame,
                             id_col: str = "doc_id",
                             text_col: str = "text") -> DataFrame:
    """Streaming ingest dedup: each micro-batch LEFT-ANTI joins the
    STATIC already-ingested corpus on the content fingerprint
    (stream-static anti joins are stateless — no watermark needed; the
    static side is re-planned per micro-batch, so a snapshot refresh
    picks up newly-ingested fingerprints).  Exactly the batch operator
    ``operators.dedup.incremental_new_docs`` applied to a streaming
    frame — the batch-equivalence the tests assert.  Compose with
    ``dedup_exact_stream`` upstream to also dedup WITHIN the stream."""
    from ..operators.dedup import incremental_new_docs
    return incremental_new_docs(stream, seen,
                                id_col=id_col, text_col=text_col)
