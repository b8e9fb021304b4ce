"""Extraction-pipeline and multimodal queries (non-SQL-expressible).

These run the engine's own kernels (mapInPandas) over the deterministic
synthetic interleaved corpus. No oracle_sql entries — the driver records
rows-only checks; semantic correctness is covered by the golden-executor
test suite (tests/test_golden_spark_parity.py) instead.
"""

from __future__ import annotations

import zlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from deed_ocr_spark.corpus import corpus_df
from deed_ocr_spark.job import extract_spans, extract_summaries

CORPUS_SEED = 42


def _corpus_size(sf_dir: str) -> int:
    # scale the synthetic interleaved corpus with the testdata tier
    if "0.001" in sf_dir:
        return 200
    if "0.01" in sf_dir:
        return 1000
    return 10000


def _corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    return corpus_df(spark, _corpus_size(sf_dir), seed=CORPUS_SEED)


# --- X1: the flagship — full interleaved-span extraction ---------------------
def x1_extract_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    return extract_spans(_corpus(spark, sf_dir))


# --- X2: per-document summaries (reference merge semantics, fused) -----------
def x2_doc_summaries(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = extract_summaries(_corpus(spark, sf_dir))
    # arrays → stable string form so the driver's rows-only check is tidy
    return out.select(
        "doc_id",
        "n_pages",
        "n_spans",
        "n_media",
        "combined_chars",
        F.array_join("legal_description_block", "␞").alias("legal_descriptions"),
        F.array_join("trs", "␞").alias("trs"),
    )


# --- M1: multimodal plumbing — media decode stub over mapInPandas ------------
MEDIA_META_DDL = (
    "doc_id string, media_ref string, width int, height int, n_bytes bigint, codec string"
)


def _fake_decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Deterministic stand-in for an image-decode kernel.

    The real decode (PIL/libvips) is unavailable in this container, so the
    pixel work is STUBBED with a crc32-derived fake; everything Spark-side
    — binary-safe schema, Arrow batching, vectorized shape — is real. Swap
    ``_fake_decode`` internals for actual decode on a cluster with the
    imaging libs shipped via --archives.
    """
    for pdf in batches:
        if not len(pdf):
            continue
        crc = pdf["media_ref"].map(lambda r: zlib.crc32(r.encode("utf-8")))
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "media_ref": pdf["media_ref"],
                "width": (64 + (crc % 1024)).astype("int32"),
                "height": (64 + ((crc // 1024) % 1024)).astype("int32"),
                "n_bytes": (1000 + (crc % 100000)).astype("int64"),
                "codec": pd.Series(
                    ["png" if c % 2 == 0 else "jpeg" for c in crc], dtype="object"
                ),
            }
        )


def m1_media_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    spans = extract_spans(_corpus(spark, sf_dir))
    media = spans.filter(F.col("kind") == "media_ref").select("doc_id", "media_ref")
    return media.mapInPandas(_fake_decode, MEDIA_META_DDL)


QUERIES = {
    "x1_extract_spans": x1_extract_spans,
    "x2_doc_summaries": x2_doc_summaries,
    "m1_media_metadata": m1_media_metadata,
}

ORACLES: dict = {}
