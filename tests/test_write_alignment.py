"""Bucket-aligned sink writes (job.repartition_for_bucketed_write).

A ``partitionBy(part_bucket)`` write without alignment emits one file per
(task, bucket) pair — the small-file storm whose commit cost anti-scales.
The job aligns its single exchange to the sink instead: these tests pin
the per-bucket file bound (1 file per wave by default, ``files_per_bucket``
with a task-count target), output equality across alignments, and that
resume keeps the bound.
"""

import os

from deed_ocr_spark.corpus import corpus_df
from deed_ocr_spark.state import run_extraction_job

N_DOCS = 120
N_BUCKETS = 8


def _files_per_bucket(out_dir):
    counts = {}
    for name in os.listdir(out_dir):
        if name.startswith("part_bucket="):
            b = int(name.split("=", 1)[1])
            counts[b] = sum(
                1
                for f in os.listdir(os.path.join(out_dir, name))
                if f.endswith(".parquet")
            )
    return counts


def _rows(spark, out_dir):
    return sorted(
        (r["doc_id"], r["order"], r["kind"], r["text"], r["media_ref"])
        for r in spark.read.parquet(out_dir).collect()
    )


def test_one_file_per_bucket_by_default(spark, tmp_path):
    out, state = str(tmp_path / "out"), str(tmp_path / "state")
    df = corpus_df(spark, N_DOCS, seed=23, n_partitions=6)
    run_extraction_job(spark, df, out, state, run_id="w1", n_buckets=N_BUCKETS)
    counts = _files_per_bucket(out)
    assert counts and all(c == 1 for c in counts.values()), counts


def test_task_target_bounds_files_and_preserves_rows(spark, tmp_path):
    out1, state1 = str(tmp_path / "o1"), str(tmp_path / "s1")
    out2, state2 = str(tmp_path / "o2"), str(tmp_path / "s2")
    df = corpus_df(spark, N_DOCS, seed=29, n_partitions=6)
    run_extraction_job(spark, df, out1, state1, run_id="a", n_buckets=N_BUCKETS)
    # n_partitions=16 over 8 buckets → 2 slices per bucket → ≤2 files each
    run_extraction_job(
        spark, df, out2, state2, run_id="b", n_buckets=N_BUCKETS, n_partitions=16
    )
    counts = _files_per_bucket(out2)
    assert counts and all(1 <= c <= 2 for c in counts.values()), counts
    assert _rows(spark, out1) == _rows(spark, out2)


def test_resume_keeps_per_bucket_bound(spark, tmp_path):
    out, state = str(tmp_path / "out"), str(tmp_path / "state")
    df = corpus_df(spark, N_DOCS, seed=31, n_partitions=6)
    run_extraction_job(
        spark, df, out, state, run_id="r1", n_buckets=N_BUCKETS,
        only_buckets=[0, 1, 2],
    )
    run_extraction_job(spark, df, out, state, run_id="r2", n_buckets=N_BUCKETS)
    counts = _files_per_bucket(out)
    assert counts and all(c == 1 for c in counts.values()), counts
