"""Checkpoint/state table with exactly-once resume semantics.

Models the reference's retry ledger (error_summary.json written at
/root/reference/deed_ocr/workflow.py:371-385, scanned by
utils/retry_helper.py:15-111, resume candidates at :186-222) as a table —
the canonical Spark idiom (SURVEY.md §2.8):

* the input is bucketed by ``pmod(xxhash64(doc_id), n_buckets)`` — a pure
  function of doc_id, so buckets are stable across runs;
* output spans are written ``partitionBy(part_bucket)`` with *dynamic
  partition overwrite* — re-extracting a bucket atomically replaces its
  files (kernels are pure ⇒ idempotent), never duplicates;
* the state table commits AFTER the data write (data-before-state
  ordering ⇒ a crash between the two re-runs the bucket, which is safe);
* resume = left_anti join of input buckets against ``status='done'`` state
  rows (J4 in SURVEY §2.3) — finished buckets are never recomputed.

Storage is parquet here (the sandbox has no Iceberg catalog jars); the
layout and commit protocol are Iceberg-shaped: swapping the writes to
``writeTo(...).overwritePartitions()`` on a real catalog is mechanical.
"""

from __future__ import annotations

import os
import time
from typing import Optional

from pyspark.sql import DataFrame, SparkSession, functions as F

from deed_ocr_spark import __version__
from deed_ocr_spark.job import extract_spans, partition_metrics, with_partition_bucket

STATE_SCHEMA_DDL = (
    "run_id string, part_bucket int, status string, docs bigint, "
    "spans_emitted bigint, pages_parsed bigint, ocr_regions bigint, "
    "span_errors bigint, error_kind string, lineage string, committed_at double"
)


def read_state(spark: SparkSession, state_dir: str) -> Optional[DataFrame]:
    # cheap existence probe first: avoids the JVM logging a PATH_NOT_FOUND
    # stack trace on every first run (local paths; remote URIs fall through
    # to the try/except)
    if "://" not in state_dir and not os.path.exists(state_dir):
        return None
    try:
        return spark.read.parquet(state_dir)
    except Exception:
        return None  # first run: no ledger yet


def done_buckets(spark: SparkSession, state_dir: str) -> Optional[DataFrame]:
    state = read_state(spark, state_dir)
    if state is None:
        return None
    return state.filter(F.col("status") == "done").select("part_bucket").distinct()


def run_extraction_job(
    spark: SparkSession,
    input_df: DataFrame,
    out_dir: str,
    state_dir: str,
    run_id: str,
    n_buckets: int = 32,
    n_partitions: int = 0,
    lineage: str = "",
    only_buckets: Optional[list] = None,
) -> dict:
    """Run (or resume) the extraction job. Returns job counters.

    ``only_buckets`` exists for fault-injection tests: it truncates the run
    after a subset of buckets, simulating a mid-job crash.
    """
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    bucketed = with_partition_bucket(input_df.select("doc_id", "spans"), n_buckets)

    # Pending = all buckets minus the ledger's done set. The done set is
    # tiny (≤ n_buckets rows) so it collects to the driver; the input-side
    # restriction stays a broadcast anti-join (never a collect of doc ids).
    done = done_buckets(spark, state_dir)
    done_ids = set() if done is None else {r["part_bucket"] for r in done.collect()}
    pending_ids = [
        b
        for b in range(n_buckets)
        if b not in done_ids and (only_buckets is None or b in only_buckets)
    ]
    if not pending_ids:
        return _job_counters(spark, state_dir)
    pending = bucketed.filter(F.col("part_bucket").isin(pending_ids))

    # Bucket is recomputed from doc_id after the kernel (pure function —
    # cheaper than carrying it through the Arrow channel, and no join).
    spans_out = with_partition_bucket(
        extract_spans(pending, n_partitions=n_partitions), n_buckets
    )

    # 1) data commit: dynamic overwrite replaces exactly the re-run buckets
    spans_out.write.mode("overwrite").partitionBy("part_bucket").parquet(out_dir)

    # 2) state commit (after data): per-bucket metrics ledger. The re-read
    # is partition-PRUNED to the buckets this run wrote (at 100 TB a full
    # output re-scan here would dwarf the job); buckets that held no
    # documents still get a done row so resume never re-schedules them.
    written = spark.read.parquet(out_dir).filter(
        F.col("part_bucket").isin(pending_ids)
    )
    pending_df = spark.createDataFrame(
        [(b,) for b in pending_ids], "part_bucket int"
    )
    metrics = (
        pending_df.join(partition_metrics(written), "part_bucket", "left")
        .fillna(0, ["docs", "spans_emitted", "pages_parsed", "ocr_regions", "span_errors"])
        .fillna("", ["error_kind"])
        .withColumns(
            {
                "run_id": F.lit(run_id),
                "status": F.lit("done"),
                "lineage": F.lit(lineage or f"code={__version__}"),
                "committed_at": F.lit(time.time()),
            }
        )
    )
    metrics.select(
        "run_id",
        "part_bucket",
        "status",
        "docs",
        "spans_emitted",
        "pages_parsed",
        "ocr_regions",
        "span_errors",
        "error_kind",
        "lineage",
        "committed_at",
    ).write.mode("append").parquet(state_dir)

    return _job_counters(spark, state_dir)


def _job_counters(spark: SparkSession, state_dir: str) -> dict:
    state = spark.read.parquet(state_dir)
    row = (
        state.filter(F.col("status") == "done")
        .agg(
            F.countDistinct("part_bucket").alias("buckets_done"),
            F.sum("docs").alias("docs"),
            F.sum("spans_emitted").alias("spans"),
        )
        .collect()[0]
    )
    return {
        "buckets_done": row["buckets_done"],
        "docs": row["docs"],
        "spans": row["spans"],
    }
