"""Small-file compaction tests (deed_ocr_spark/compact.py).

Fragment a bucketed span output across several write waves (the state
machinery's dynamic-partition-overwrite sink appends task-sized files per
wave), then assert compaction: (a) plans only genuinely fragmented
buckets, (b) rewrites them to the binpacked file count, (c) preserves
rows byte-for-byte, (d) is idempotent (second run plans nothing), and
(e) leaves non-candidate partitions' files physically untouched.
"""

import os

import pytest
from pyspark.sql import functions as F

from deed_ocr_spark.compact import compact_output, plan_compaction
from deed_ocr_spark.corpus import corpus_df
from deed_ocr_spark.job import extract_spans, with_partition_bucket

N_DOCS = 120
N_BUCKETS = 4


def _bucket_files(out_dir):
    files = {}
    for name in os.listdir(out_dir):
        if not name.startswith("part_bucket="):
            continue
        b = int(name.split("=", 1)[1])
        files[b] = sorted(
            f
            for f in os.listdir(os.path.join(out_dir, name))
            if f.endswith(".parquet")
        )
    return files


def _rows(spark, out_dir):
    return sorted(
        (r["doc_id"], r["order"], r["kind"], r["text"], r["media_ref"])
        for r in spark.read.parquet(out_dir).collect()
    )


@pytest.fixture()
def fragmented_out(spark, tmp_path):
    """Write the same bucketed output in 3 waves of distinct docs so every
    bucket partition holds several small files."""
    out_dir = str(tmp_path / "out")
    df = with_partition_bucket(
        extract_spans(corpus_df(spark, N_DOCS, seed=11, n_partitions=4)),
        N_BUCKETS,
    )
    # three disjoint doc_id waves, appended — each wave adds files per bucket
    for wave in range(3):
        (
            df.filter(F.pmod(F.xxhash64("doc_id"), F.lit(3)) == wave)
            .repartition(4)
            .write.mode("append")
            .partitionBy("part_bucket")
            .parquet(out_dir)
        )
    return out_dir


def test_compaction_binpacks_preserves_rows_and_is_idempotent(
    spark, fragmented_out
):
    out_dir = fragmented_out
    before_rows = _rows(spark, out_dir)
    before_files = _bucket_files(out_dir)
    assert all(len(v) >= 3 for v in before_files.values()), "fixture not fragmented"

    plans = plan_compaction(spark, out_dir, target_bytes=128 << 20)
    # tiny partitions → every fragmented bucket binpacks to ONE file
    assert {p.part_bucket for p in plans} == set(before_files)
    assert all(p.target_files == 1 and p.n_files >= 3 for p in plans)

    res = compact_output(spark, out_dir, target_bytes=128 << 20)
    assert res["compacted_buckets"] == len(plans)

    after_files = _bucket_files(out_dir)
    assert set(after_files) == set(before_files)
    assert all(len(v) == 1 for v in after_files.values())
    assert _rows(spark, out_dir) == before_rows

    # idempotent: nothing left to plan, second run is a no-op
    assert plan_compaction(spark, out_dir, target_bytes=128 << 20) == []
    res2 = compact_output(spark, out_dir, target_bytes=128 << 20)
    assert res2["compacted_buckets"] == 0
    assert _bucket_files(out_dir) == after_files


def test_compaction_leaves_healthy_partitions_untouched(spark, tmp_path):
    out_dir = str(tmp_path / "out")
    base = with_partition_bucket(
        extract_spans(corpus_df(spark, N_DOCS, seed=13, n_partitions=4)),
        N_BUCKETS,
    ).cache()
    # bucket 0: single healthy file; other buckets: fragmented in 3 waves
    (
        base.filter("part_bucket = 0")
        .coalesce(1)
        .write.mode("append")
        .partitionBy("part_bucket")
        .parquet(out_dir)
    )
    for wave in range(3):
        (
            base.filter("part_bucket <> 0")
            .filter(F.pmod(F.xxhash64("doc_id"), F.lit(3)) == wave)
            .repartition(4)
            .write.mode("append")
            .partitionBy("part_bucket")
            .parquet(out_dir)
        )
    base.unpersist()

    before_rows = _rows(spark, out_dir)
    healthy_before = _bucket_files(out_dir)[0]
    assert len(healthy_before) == 1

    plans = plan_compaction(spark, out_dir, target_bytes=128 << 20)
    assert 0 not in {p.part_bucket for p in plans} and plans

    compact_output(spark, out_dir, target_bytes=128 << 20)
    # bucket 0's physical file is byte-level untouched (same name kept)
    assert _bucket_files(out_dir)[0] == healthy_before
    assert _rows(spark, out_dir) == before_rows


def test_multi_file_target_respects_per_bucket_cap(spark, tmp_path):
    """A bucket whose bytes exceed target_bytes binpacks to >1 file but
    never more than ceil(bytes/target)."""
    out_dir = str(tmp_path / "out")
    df = with_partition_bucket(
        extract_spans(corpus_df(spark, 200, seed=17, n_partitions=4)), 2
    )
    for wave in range(4):
        (
            df.filter(F.pmod(F.xxhash64("doc_id"), F.lit(4)) == wave)
            .repartition(3)
            .write.mode("append")
            .partitionBy("part_bucket")
            .parquet(out_dir)
        )
    before_rows = _rows(spark, out_dir)
    # derive a target that demands ~3 output files per bucket — strictly
    # between 1 and the current file count, so the multi-file path runs
    sizes = {
        b: sum(
            os.path.getsize(os.path.join(out_dir, f"part_bucket={b}", f))
            for f in files
        )
        for b, files in _bucket_files(out_dir).items()
    }
    target = max(1, min(sizes.values()) // 3)
    stats = {
        p.part_bucket: p for p in plan_compaction(spark, out_dir, target_bytes=target)
    }
    assert stats, "expected candidates at the derived target"
    assert any(p.target_files > 1 for p in stats.values())
    compact_output(spark, out_dir, target_bytes=target)
    after = _bucket_files(out_dir)
    for b, p in stats.items():
        assert 1 <= len(after[b]) <= p.target_files
    assert _rows(spark, out_dir) == before_rows
