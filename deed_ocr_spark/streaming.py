"""Incremental ingest via Structured Streaming.

The reference's incremental story is batch retry over a filesystem ledger
(SURVEY.md §2.8 — mapped to state.py). For a continuously-arriving corpus
(the training-data-pipeline case) the same extraction kernels also run
unchanged under Structured Streaming: a file/Iceberg streaming source of
``(doc_id, spans)`` rows → the stateless ``mapInArrow`` kernel → an
append sink with checkpointing. Exactly-once comes from the streaming
checkpoint (source offsets + file-sink manifest), complementing the batch
ledger.

Extraction itself needs no stateful operators (per-document, stateless);
``stream_sessionize`` below is the engine's custom STATEFUL streaming
operator — ``applyInPandasWithState`` keyed by user, carrying
(last_event_ms, session/event counters) across micro-batches with the
exact w3 gap semantics, so the incremental totals equal the batch query
on the union of all batches (tested).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from deed_ocr_spark.extract import SPANS_OUT_DDL, extract_spans_batches_arrow

SPANS_SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField(
            "spans",
            ArrayType(
                StructType(
                    [
                        StructField("kind", StringType()),
                        StructField("text", StringType()),
                        StructField("media_ref", StringType()),
                        StructField("offset", IntegerType()),
                    ]
                )
            ),
        ),
    ]
)


def stream_extract_spans(spark: SparkSession, input_dir: str) -> DataFrame:
    """Streaming DataFrame of extracted spans from a parquet file source —
    the same mapInArrow columnar-explode kernel as the batch job, so the
    two paths cannot drift (byte-identical by the batch equality tests)."""
    src = (
        spark.readStream.schema(SPANS_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(input_dir)
        .select("doc_id", "spans")
    )
    return src.mapInArrow(extract_spans_batches_arrow, SPANS_OUT_DDL)


# --- stateful streaming: incremental sessionization --------------------------
SESSION_GAP_MS = 1_800_000  # same 30-min gap as the batch w3_sessionize

EVENTS_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)

SESSION_OUT_DDL = "user_id bigint, n_sessions bigint, n_events bigint"
SESSION_STATE_DDL = "last_ms bigint, n_sessions bigint, n_events bigint"


def _sessionize_group(key, pdf_iter, state):
    """applyInPandasWithState kernel: fold this micro-batch's events for one
    user into the carried (last_ms, n_sessions, n_events) state.

    Same ladder as w3_sessionize: a session starts on the first event ever
    or when the gap to the previous event exceeds SESSION_GAP_MS. Events
    within a micro-batch are ordered by (ms, event_id); correctness across
    batches assumes per-user arrival in time order (the file-source case
    here) — a production late-data story would add a watermark + reconcile.
    """
    import pandas as pd

    if state.exists:
        last_ms, n_sessions, n_events = state.get
    else:
        last_ms, n_sessions, n_events = -1, 0, 0
    chunks = [pdf for pdf in pdf_iter if len(pdf)]
    if chunks:
        rows = pd.concat(chunks).sort_values(["ms", "event_id"])
        for ms in rows["ms"].astype("int64"):
            if last_ms < 0 or ms - last_ms > SESSION_GAP_MS:
                n_sessions += 1
            last_ms = int(ms)
            n_events += 1
        state.update((last_ms, n_sessions, n_events))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_sessions": [n_sessions], "n_events": [n_events]}
        )


def stream_sessionize(spark: SparkSession, input_dir: str) -> DataFrame:
    """Streaming per-user session/event counters over an events file source
    (update-mode stream: each micro-batch emits the new running totals for
    the users it touched)."""
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupStateTimeout

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    src = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .parquet(input_dir)
        .select(
            "user_id",
            "event_id",
            F.unix_millis(F.col("ts").cast("timestamp")).alias("ms"),
        )
    )
    return src.groupBy("user_id").applyInPandasWithState(
        _sessionize_group,
        SESSION_OUT_DDL,
        SESSION_STATE_DDL,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_sessionize_stream(
    spark: SparkSession,
    input_dir: str,
    checkpoint_dir: str,
    out_dir: str,
):
    """availableNow catch-up run; update-mode rows land in a parquet log via
    foreachBatch (checkpoint-recoverable, unlike the memory sink). Each row
    is a user's running total as of that micro-batch; the CURRENT total per
    user is the row with the highest n_events (monotone per user)."""
    from pyspark.sql import functions as F

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.withColumn("batch_id", F.lit(batch_id)).write.mode(
            "append"
        ).parquet(out_dir)

    return (
        stream_sessionize(spark, input_dir)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )


# --- watermarked sessionization: late-data-correct session finalization ------
WSESSION_OUT_DDL = (
    "user_id bigint, sess_start timestamp, sess_end timestamp, n_events bigint"
)
# open session intervals carried per user, as parallel arrays (merged by the
# gap rule each batch; bounded by watermark eviction, never by corpus size)
WSESSION_STATE_DDL = "starts array<bigint>, ends array<bigint>, counts array<bigint>"


def _wsessionize_group(key, pdf_iter, state):
    """applyInPandasWithState kernel with EventTimeTimeout: exact session
    records under late data.

    Unlike ``_sessionize_group`` (which assumes per-user time-ordered
    arrival), this keeps every OPEN session interval (start_ms, end_ms,
    n_events) in state and merges each micro-batch's events into them by
    the same gap rule as batch w3_sessionize (gap > SESSION_GAP_MS starts a
    new session). A session is finalized — emitted exactly once — only when
    the watermark passes ``end + gap``: Spark has already dropped any event
    older than the watermark, so no surviving event can extend it. Late
    events WITHIN the watermark land in their correct session before it
    finalizes, even if they bridge two open intervals into one. The
    event-time timeout finalizes sessions for users with no new arrivals.

    State is bounded: a user holds only intervals whose end is within one
    gap+watermark of the max event time — O(active sessions), independent
    of history length. This is the production late-data answer flagged in
    the r2 sessionize docstring.
    """
    import pandas as pd

    gap = SESSION_GAP_MS
    if state.exists:
        starts, ends, counts = state.get
        intervals = [list(iv) for iv in zip(starts, ends, counts)]
    else:
        intervals = []
    if not state.hasTimedOut:
        for pdf in pdf_iter:
            for ms in pdf["ms"].astype("int64"):
                intervals.append([int(ms), int(ms), 1])
    intervals.sort()
    merged = []
    for s, e, c in intervals:
        if merged and s - merged[-1][1] <= gap:
            merged[-1][1] = max(merged[-1][1], e)
            merged[-1][2] += c
        else:
            merged.append([s, e, c])
    wm = state.getCurrentWatermarkMs()
    done = [iv for iv in merged if iv[1] + gap < wm]
    open_ = [iv for iv in merged if iv[1] + gap >= wm]
    if open_:
        state.update(
            (
                [iv[0] for iv in open_],
                [iv[1] for iv in open_],
                [iv[2] for iv in open_],
            )
        )
        # fire once the watermark can finalize the oldest open interval;
        # open_ guarantees min_end + gap >= wm, so the timestamp is legal
        state.setTimeoutTimestamp(min(iv[1] for iv in open_) + gap + 1)
    else:
        state.remove()
    if done:
        yield pd.DataFrame(
            {
                "user_id": [key[0]] * len(done),
                "sess_start": pd.to_datetime([iv[0] for iv in done], unit="ms"),
                "sess_end": pd.to_datetime([iv[1] for iv in done], unit="ms"),
                "n_events": [iv[2] for iv in done],
            }
        )


def stream_sessionize_watermarked(
    spark: SparkSession, input_dir: str, watermark: str = "30 minutes"
) -> DataFrame:
    """Finalized (user_id, sess_start, sess_end, n_events) session records
    over an events file source, append-mode, late-data-correct up to
    ``watermark``."""
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupStateTimeout

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    src = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .parquet(input_dir)
        .withWatermark("ts", watermark)
        .select(
            "user_id",
            "ts",
            F.unix_millis(F.col("ts").cast("timestamp")).alias("ms"),
        )
    )
    return src.groupBy("user_id").applyInPandasWithState(
        _wsessionize_group,
        WSESSION_OUT_DDL,
        WSESSION_STATE_DDL,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def run_wsessionize_stream(
    spark: SparkSession,
    input_dir: str,
    checkpoint_dir: str,
    out_dir: str,
    watermark: str = "30 minutes",
):
    """availableNow catch-up run; finalized sessions append to a parquet
    sink exactly once (file-sink manifest + checkpoint offsets)."""
    return (
        stream_sessionize_watermarked(spark, input_dir, watermark)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


# --- watermarked windowed aggregation: the late-data story -------------------
def stream_windowed_counts(
    spark: SparkSession,
    input_dir: str,
    window_dur: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Event-time tumbling-window counts per event_type with a watermark.

    The watermark is what makes an unbounded stream's aggregation state
    bounded: rows later than (max event time seen − watermark) are dropped,
    and a window's state is evicted once the watermark passes its end — at
    which point append mode emits the finalized row exactly once. Late rows
    WITHIN the watermark still merge into their window before it finalizes.
    Counters are partial-aggregated map-side per micro-batch; the shuffle
    key is (window, event_type), the same bounded-cardinality shape as the
    batch a-queries.
    """
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    src = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .parquet(input_dir)
        .withWatermark("ts", watermark)
    )
    return (
        src.groupBy(F.window("ts", window_dur), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.col("value").cast("double")), 4).alias("sum_value"),
        )
        .select(
            F.col("window.start").alias("win_start"),
            F.col("window.end").alias("win_end"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def run_windowed_stream(
    spark: SparkSession,
    input_dir: str,
    checkpoint_dir: str,
    out_dir: str,
    window_dur: str = "10 minutes",
    watermark: str = "30 minutes",
):
    """availableNow catch-up run of the watermarked windowed counts; append
    mode → each finalized window lands in the parquet sink exactly once
    (the file-sink manifest + source offsets in the checkpoint make
    re-runs exactly-once)."""
    return (
        stream_windowed_counts(spark, input_dir, window_dur, watermark)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def run_stream(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Start (or catch up) the streaming extraction.

    ``available_now=True`` processes everything currently in ``input_dir``
    and stops — the incremental batch idiom (run-on-schedule). With False
    it runs continuously on new files.
    """
    writer = (
        stream_extract_spans(spark, input_dir)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
