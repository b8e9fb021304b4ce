"""Structured Streaming ingest: same kernels, incremental arrival,
exactly-once across restarts via the streaming checkpoint."""

from deed_ocr_spark.corpus import corpus_df, doc_id_for, gen_doc
from deed_ocr_spark.golden import extract_doc
from deed_ocr_spark.streaming import run_stream


def _write_batch(spark, path, lo, hi):
    # ids [lo, hi) — distinct parquet files simulate incremental arrival
    df = corpus_df(spark, hi, seed=21, n_partitions=1).filter(
        f"doc_id >= '{doc_id_for(lo)}'"
    )
    df.write.mode("append").parquet(path)


def test_streaming_matches_golden_and_is_incremental(spark, tmp_path):
    inp = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    _write_batch(spark, inp, 0, 20)
    q = run_stream(spark, inp, out, ckpt)
    q.awaitTermination(120)

    first = spark.read.parquet(out)
    assert first.select("doc_id").distinct().count() == 20

    # second arrival: only the new docs are processed (checkpoint advances)
    _write_batch(spark, inp, 20, 30)
    q2 = run_stream(spark, inp, out, ckpt)
    q2.awaitTermination(120)

    rows = spark.read.parquet(out).collect()
    got = {}
    for r in rows:
        got.setdefault(r["doc_id"], []).append(
            (r["order"], r["kind"], r["text"], r["media_ref"], r["src_kind"])
        )
    assert len(got) == 30
    for doc_id, seq in got.items():
        seq.sort()
        assert seq == extract_doc(gen_doc(doc_id, 21)["spans"]), doc_id
        # exactly-once: no duplicated orders from the re-run
        assert len({o for o, *_ in seq}) == len(seq)


def test_watermarked_window_drops_too_late_keeps_within(spark, tmp_path):
    """Watermark semantics end-to-end: a late row inside the watermark
    merges into its window; a row later than the watermark is dropped; each
    finalized window is emitted exactly once (append mode).

    Wave 1 sets max event time 12:05 → watermark 11:35. Wave 2 carries a
    within-watermark late row (11:45), a too-late row (10:00 — dropped),
    and a fresh row (13:00) advancing the watermark to 12:30. Wave 3
    (14:00) flushes the remaining finalized windows."""
    import datetime as dt

    from pyspark.sql import functions as F

    from deed_ocr_spark.streaming import EVENTS_SCHEMA, run_windowed_stream

    in_dir = str(tmp_path / "ev_in")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "win_out")

    def ts(h, m):
        return dt.datetime(2026, 1, 1, h, m, tzinfo=dt.timezone.utc)

    def write_wave(rows):
        spark.createDataFrame(
            [(i, t, 1, k, 1.0, None) for i, (t, k) in enumerate(rows)],
            EVENTS_SCHEMA,
        ).coalesce(1).write.mode("append").parquet(in_dir)

    write_wave([(ts(12, 0), "click"), (ts(12, 5), "click")])
    run_windowed_stream(spark, in_dir, ckpt, out).awaitTermination(120)

    write_wave([(ts(11, 45), "view"), (ts(10, 0), "click"), (ts(13, 0), "view")])
    run_windowed_stream(spark, in_dir, ckpt, out).awaitTermination(120)

    write_wave([(ts(14, 0), "click")])
    run_windowed_stream(spark, in_dir, ckpt, out).awaitTermination(120)

    got = {
        (r["win_start"].strftime("%H:%M"), r["event_type"]): r["n"]
        for r in spark.read.parquet(out).collect()
    }
    assert got.get(("12:00", "click")) == 2  # on-time window, emitted once
    assert got.get(("11:40", "view")) == 1  # late but within watermark
    assert ("10:00", "click") not in got  # beyond the watermark: dropped
    # the 13:00 window is only finalized (and emitted) after wave 3 advanced
    # the watermark past 13:10
    assert got.get(("13:00", "view")) == 1
    # exactly-once: no window/type pair appears twice in the sink
    n_rows = spark.read.parquet(out).count()
    assert n_rows == len(got)


def test_stateful_sessionize_matches_batch(spark, tmp_path):
    """applyInPandasWithState sessionization: two availableNow catch-up runs
    over time-split event waves must end at exactly the batch w3_sessionize
    totals on the full table (state carried across batches AND restarts)."""
    from pyspark.sql import functions as F

    from deed_ocr_spark.queries.relational import w3_sessionize
    from deed_ocr_spark.streaming import run_sessionize_stream

    sf = "/root/testdata/sf0.001"
    events = spark.read.parquet(f"{sf}/events.parquet")
    cut = events.selectExpr("percentile_approx(ts, 0.5) p").collect()[0]["p"]
    in_dir = str(tmp_path / "events_in")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "sessions_out")

    # wave 1: first half by time (per-user time order preserved globally)
    events.filter(F.col("ts") <= cut).coalesce(2).write.mode("overwrite").parquet(in_dir)
    run_sessionize_stream(spark, in_dir, ckpt, out).awaitTermination()
    n_wave1 = spark.read.parquet(out).count()
    assert n_wave1 > 0

    # wave 2: the rest lands later; restart from the same checkpoint — the
    # per-user state must survive the restart
    events.filter(F.col("ts") > cut).coalesce(2).write.mode("append").parquet(in_dir)
    run_sessionize_stream(spark, in_dir, ckpt, out).awaitTermination()

    # current totals = the row with the highest n_events per user (monotone)
    got = {
        r["user_id"]: (r["n_sessions"], r["n_events"])
        for r in spark.read.parquet(out)
        .groupBy("user_id")
        .agg(
            F.max_by("n_sessions", "n_events").alias("n_sessions"),
            F.max("n_events").alias("n_events"),
        )
        .collect()
    }
    expected = {
        r["user_id"]: (r["n_sessions"], r["n_events"])
        for r in w3_sessionize(spark, sf).collect()
    }
    assert got == expected


def test_watermarked_sessionize_late_merge_bridge_and_exactly_once(spark, tmp_path):
    """EventTimeTimeout sessionization: late-within-watermark events merge
    into (and can BRIDGE) open sessions; too-late events are dropped; each
    finalized session is emitted exactly once, via the timeout path for
    users with no new arrivals.

    Watermark delay 30 min, session gap 30 min. Wave 1: user 1 at
    12:00/12:10 (one open session); user 4 at 12:00 and 12:34 (two open
    sessions, gap 34 min); global watermark after the wave = 12:04. Wave 2:
    user 1 late 12:05 (within watermark — merges); user 4 late 12:17
    (bridges its two sessions into one 12:00–12:34 session); user 2 at
    18:00 advances the watermark to 17:30 (availableNow's trailing
    no-data batch then finalizes user 1/4 via the timeout path). Wave 3:
    user 1 at 11:00 is BEYOND the watermark (dropped — no spurious new
    session may appear); user 2 at 23:00 advances the watermark to 22:30,
    flushing user 2's 18:00 session. Wave 4: user 3 at 23:59 stays open —
    open sessions must not reach the append sink."""
    import datetime as dt

    from deed_ocr_spark.streaming import EVENTS_SCHEMA, run_wsessionize_stream

    in_dir = str(tmp_path / "ev_in")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "sess_out")

    def ts(h, m):
        return dt.datetime(2026, 1, 1, h, m, tzinfo=dt.timezone.utc)

    def write_wave(rows):
        spark.createDataFrame(
            [(i, t, u, "click", 1.0, None) for i, (u, t) in enumerate(rows)],
            EVENTS_SCHEMA,
        ).coalesce(1).write.mode("append").parquet(in_dir)

    def run():
        run_wsessionize_stream(spark, in_dir, ckpt, out).awaitTermination(120)

    write_wave([(1, ts(12, 0)), (1, ts(12, 10)), (4, ts(12, 0)), (4, ts(12, 34))])
    run()
    write_wave([(1, ts(12, 5)), (4, ts(12, 17)), (2, ts(18, 0))])
    run()
    write_wave([(1, ts(11, 0)), (2, ts(23, 0))])
    run()
    write_wave([(3, ts(23, 59))])
    run()

    rows = spark.read.parquet(out).collect()
    got = {
        (r["user_id"], r["sess_start"].strftime("%H:%M"),
         r["sess_end"].strftime("%H:%M"), r["n_events"])
        for r in rows
    }
    assert (1, "12:00", "12:10", 3) in got  # late merged, too-late dropped
    assert (4, "12:00", "12:34", 3) in got  # late event bridged two sessions
    assert (2, "18:00", "18:00", 1) in got  # flushed by wave 3's watermark
    # still-open sessions (23:00, 23:59) must NOT be in the sink yet, and no
    # session may appear twice (exactly-once append)
    assert len(rows) == 3


def test_watermarked_sessionize_equals_batch_after_flush(spark, tmp_path):
    """Cross-check against the oracle-backed batch query: feed the whole
    sf0.001 events table in one wave (watermark 0 → everything merges),
    then a far-future sentinel event to advance the watermark past every
    session. The finalized session records, re-aggregated per user, must
    equal batch w3_sessionize exactly — same gap rule, different engine
    path (stateful streaming vs window+lag)."""
    import datetime as dt

    from pyspark.sql import functions as F

    from deed_ocr_spark.queries.relational import w3_sessionize
    from deed_ocr_spark.streaming import EVENTS_SCHEMA, run_wsessionize_stream

    sf = "/root/testdata/sf0.001"
    in_dir = str(tmp_path / "ev_in")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "sess_out")

    events = spark.read.parquet(f"{sf}/events.parquet")
    events.coalesce(2).write.mode("overwrite").parquet(in_dir)
    run_wsessionize_stream(spark, in_dir, ckpt, out).awaitTermination(300)

    far = events.agg(F.max("ts")).collect()[0][0] + dt.timedelta(days=10)
    spark.createDataFrame(
        [(0, far, 999_999_999, "flush", 0.0, None)], EVENTS_SCHEMA
    ).coalesce(1).write.mode("append").parquet(in_dir)
    run_wsessionize_stream(spark, in_dir, ckpt, out).awaitTermination(300)

    got = {
        r["user_id"]: (r["n_sessions"], r["n_events"])
        for r in spark.read.parquet(out)
        .filter(F.col("user_id") != 999_999_999)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.sum("n_events").alias("n_events"),
        )
        .collect()
    }
    expected = {
        r["user_id"]: (r["n_sessions"], r["n_events"])
        for r in w3_sessionize(spark, sf).collect()
    }
    assert got == expected
