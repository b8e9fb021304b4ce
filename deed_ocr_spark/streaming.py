"""Incremental ingest via Structured Streaming.

The reference's incremental story is batch retry over a filesystem ledger
(SURVEY.md §2.8 — mapped to state.py). For a continuously-arriving corpus
(the training-data-pipeline case) the same extraction kernels also run
unchanged under Structured Streaming: a file/Iceberg streaming source of
``(doc_id, spans)`` rows → the stateless ``mapInPandas`` kernel → an
append sink with checkpointing. Exactly-once comes from the streaming
checkpoint (source offsets + file-sink manifest), complementing the batch
ledger.

No watermarks/stateful operators are needed: extraction is per-document
and stateless, so late data is simply processed when it arrives.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from deed_ocr_spark.extract import SPANS_OUT_DDL, extract_spans_batch

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
    """Streaming DataFrame of extracted spans from a parquet file source."""
    src = (
        spark.readStream.schema(SPANS_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(input_dir)
        .select("doc_id", "spans")
    )
    return src.mapInPandas(extract_spans_batch, SPANS_OUT_DDL)


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
