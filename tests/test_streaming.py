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
