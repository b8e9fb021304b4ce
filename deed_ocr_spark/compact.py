"""Small-file compaction for the bucketed span output.

The parquet analog of Iceberg's ``rewrite_data_files`` (binpack)
maintenance action. Every extraction / resume wave (state.py) writes
task-sized files into each ``part_bucket=N`` partition via dynamic
partition overwrite; at 10^12-doc scale a long-lived output accumulates
per-wave small files and every downstream scan pays a per-file open +
footer-read cost. Compaction rewrites only the offending partitions,
binpacked to a target file size, through the SAME dynamic-partition-
overwrite commit the job itself uses — so it is idempotent, atomic per
partition, and safe to run concurrently with readers (writers must be
quiesced, as with any non-catalog parquet rewrite; on a real Iceberg
catalog this whole module collapses into
``CALL system.rewrite_data_files(...)``, which does the swap under a
snapshot commit instead).

Reference analog: none — the reference writes one output directory per
document (workflow.py:332-482) and never re-binpacks; this is scale
infrastructure the Spark engine needs and the reference's design never
faces. Planning is driver-side but bounded by the bucket count (same
budget as the state ledger — buckets are the only driver-visible
cardinality in the whole job); the rewrite itself is one distributed
Spark job over just the candidate buckets.
"""

from __future__ import annotations

import math
from typing import Dict, List, NamedTuple

from pyspark.sql import DataFrame, SparkSession, functions as F

DEFAULT_TARGET_BYTES = 128 << 20  # Iceberg's write.target-file-size default


class BucketPlan(NamedTuple):
    part_bucket: int
    n_files: int
    bytes: int
    target_files: int


def _partition_file_stats(spark: SparkSession, out_dir: str) -> Dict[int, List[int]]:
    """{bucket: [file sizes]} via the Hadoop FileSystem API (works for any
    scheme the session can read). One listing per bucket directory —
    driver cost is O(n_buckets + n_files-listed), the same metadata budget
    an Iceberg planner spends reading the manifest list."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    path_cls = jvm.org.apache.hadoop.fs.Path
    root = path_cls(out_dir)
    fs = root.getFileSystem(conf)
    stats: Dict[int, List[int]] = {}
    for entry in fs.listStatus(root):
        name = entry.getPath().getName()
        if not (entry.isDirectory() and name.startswith("part_bucket=")):
            continue
        bucket = int(name.split("=", 1)[1])
        sizes = [
            f.getLen()
            for f in fs.listStatus(entry.getPath())
            if f.isFile() and f.getPath().getName().endswith(".parquet")
        ]
        if sizes:
            stats[bucket] = sizes
    return stats


def plan_compaction(
    spark: SparkSession,
    out_dir: str,
    target_bytes: int = DEFAULT_TARGET_BYTES,
    min_files: int = 2,
) -> List[BucketPlan]:
    """Buckets whose partition holds more files than its data needs:
    ``n_files > max(ceil(bytes / target_bytes), 1)`` and at least
    ``min_files`` files (a single file is never rewritten)."""
    plans: List[BucketPlan] = []
    for bucket, sizes in sorted(_partition_file_stats(spark, out_dir).items()):
        total = sum(sizes)
        target_files = max(1, math.ceil(total / target_bytes))
        if len(sizes) >= min_files and len(sizes) > target_files:
            plans.append(BucketPlan(bucket, len(sizes), total, target_files))
    return plans


def compact_output(
    spark: SparkSession,
    out_dir: str,
    target_bytes: int = DEFAULT_TARGET_BYTES,
    min_files: int = 2,
) -> dict:
    """Rewrite every over-fragmented bucket partition binpacked to
    ``target_bytes``. Returns counters; a second invocation is a no-op
    (the rewritten partitions no longer qualify).

    File-count control without losing determinism: each row gets a slice
    ``pmod(xxhash64(doc_id), target_files(bucket))`` and the rewrite
    shuffles on ``(part_bucket, slice)`` — a task may receive several
    (bucket, slice) groups (hash collisions merely merge slices into one
    file, never split them), so each bucket lands in at most
    ``target_files`` files. The write uses dynamic partition overwrite:
    only the candidate partitions are replaced, everything else is
    untouched — identical commit semantics to the extraction job's sink.
    """
    plans = plan_compaction(spark, out_dir, target_bytes, min_files)
    if not plans:
        return {"compacted_buckets": 0, "files_before": 0, "target_files": 0}

    buckets = [p.part_bucket for p in plans]
    target_map = F.create_map(
        *[F.lit(x) for p in plans for x in (p.part_bucket, p.target_files)]
    )
    df = (
        spark.read.parquet(out_dir)
        .filter(F.col("part_bucket").isin(buckets))
        .withColumn(
            # tuple-hash (doc_id, 1): decorrelated from part_bucket's
            # xxhash64(doc_id) — same-hash mod-k would collapse slices
            # whenever k divides the bucket count (see job.py)
            "_slice",
            F.pmod(
                F.xxhash64(F.col("doc_id"), F.lit(1)),
                target_map[F.col("part_bucket")],
            ),
        )
    )
    total_target = sum(p.target_files for p in plans)
    (
        df.repartition(total_target, "part_bucket", "_slice")
        .drop("_slice")
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("part_bucket")
        .parquet(out_dir)
    )
    return {
        "compacted_buckets": len(plans),
        "files_before": sum(p.n_files for p in plans),
        "target_files": total_target,
    }
