"""Checkpoint/resume tests (SURVEY.md §5.2-5).

Simulates a mid-job crash (run truncated to a bucket subset), resumes, and
asserts: no duplicate spans, full-output equality with a single-shot run,
and state-ledger monotonicity — the reference's retry semantics
(/root/reference/deed_ocr/utils/retry_helper.py:186-222) as anti-join.
"""

import pytest
from pyspark.sql import functions as F

from deed_ocr_spark.corpus import corpus_df
from deed_ocr_spark.state import done_buckets, run_extraction_job

N_DOCS = 80
N_BUCKETS = 8


@pytest.fixture()
def dirs(tmp_path):
    return str(tmp_path / "out"), str(tmp_path / "state")


def _collect_spans(spark, out_dir):
    return sorted(
        (r["doc_id"], r["order"], r["kind"], r["text"], r["media_ref"])
        for r in spark.read.parquet(out_dir).collect()
    )


def test_crash_resume_exactly_once(spark, dirs, tmp_path):
    out_dir, state_dir = dirs
    df = corpus_df(spark, N_DOCS, seed=7, n_partitions=4)

    # Run 1 "crashes" after 3 of 8 buckets.
    run_extraction_job(
        spark, df, out_dir, state_dir, run_id="r1",
        n_buckets=N_BUCKETS, only_buckets=[0, 1, 2],
    )
    done = done_buckets(spark, state_dir)
    assert sorted(r["part_bucket"] for r in done.collect()) == [0, 1, 2]
    partial = _collect_spans(spark, out_dir)
    assert partial  # something committed

    # Run 2 resumes: processes only pending buckets.
    stats = run_extraction_job(
        spark, df, out_dir, state_dir, run_id="r2", n_buckets=N_BUCKETS
    )
    assert stats["buckets_done"] == N_BUCKETS
    resumed = _collect_spans(spark, out_dir)

    # Single-shot reference run into a fresh location.
    out2, state2 = str(tmp_path / "out2"), str(tmp_path / "state2")
    run_extraction_job(spark, df, out2, state2, run_id="solo", n_buckets=N_BUCKETS)
    solo = _collect_spans(spark, out2)

    assert resumed == solo  # no dupes, no gaps
    # ledger monotone: every bucket done exactly once, r1 rows not rewritten
    state = spark.read.parquet(state_dir)
    per_bucket = state.filter(F.col("status") == "done").groupBy("part_bucket").count()
    assert all(r["count"] == 1 for r in per_bucket.collect())
    assert state.filter(F.col("run_id") == "r1").count() == 3
    assert state.filter(F.col("run_id") == "r2").count() == N_BUCKETS - 3


def test_rerun_after_done_is_noop(spark, dirs):
    out_dir, state_dir = dirs
    df = corpus_df(spark, 20, seed=9, n_partitions=2)
    run_extraction_job(spark, df, out_dir, state_dir, run_id="a", n_buckets=4)
    before = _collect_spans(spark, out_dir)
    run_extraction_job(spark, df, out_dir, state_dir, run_id="b", n_buckets=4)
    after = _collect_spans(spark, out_dir)
    assert before == after
    state = spark.read.parquet(state_dir)
    assert state.filter(F.col("run_id") == "b").count() == 0  # nothing pending


def test_metrics_ledger_counts(spark, dirs):
    out_dir, state_dir = dirs
    df = corpus_df(spark, 30, seed=11, n_partitions=2)
    stats = run_extraction_job(spark, df, out_dir, state_dir, run_id="m", n_buckets=4)
    assert stats["docs"] == 30
    out = spark.read.parquet(out_dir)
    assert stats["spans"] == out.count()
    state = spark.read.parquet(state_dir)
    row = state.agg(
        F.sum("pages_parsed").alias("p"), F.sum("ocr_regions").alias("o")
    ).collect()[0]
    assert row["p"] == out.filter(F.col("src_kind") == "pdf_page").count()
    assert row["o"] == out.filter(F.col("src_kind") == "ocr_region").count()
