"""Signature materialization — the production form of the dedup pipeline.

Inside one composed query, reused subtrees (shingle rows, MinHash
signatures, winnowing fingerprints) are persisted in the session cache
(queries/textpipe.py::_persisted). A multi-QUERY curation pipeline instead
computes them once and writes them as their own tables: every downstream
near-dup / candidate-pair / keep-list query then scans the narrow
signature table (at 100 TB it is a small fraction of the corpus width, so
joins never touch document text again), nothing is recomputed, and no
executor cache residency is required across jobs. On an Iceberg catalog
these would be maintained incrementally per snapshot (see state.py's
commit-protocol notes); here they are plain parquet directories.

Reference analog: the reference recomputes per-document work on every run
and guards it with its retry ledger (utils/retry_helper.py); signature
tables are the corpus-level equivalent for the dedup family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from deed_ocr_spark.queries.textpipe import (
    _minhash_sig_from,
    _band_pairs_from,
    _shingle_rows,
    d12_winnow_fingerprints,
    ngram_jaccard_pairs_from,
    winnow_dup_pairs_from,
)

SHINGLES = "shingles"
MINHASH_SIGS = "minhash_sigs"
WINNOW_FPS = "winnow_fps"


def materialize_signatures(
    spark: SparkSession, sf_dir: str, out_dir: str
) -> dict[str, str]:
    """One pass over the corpus per signature family, each written to its
    own parquet table. The MinHash signatures are derived from the
    just-written shingle table (not a second tokenize pass), so the corpus
    text is scanned exactly twice in total: once for shingles, once for
    winnowing fingerprints."""
    paths = {
        SHINGLES: f"{out_dir}/{SHINGLES}",
        MINHASH_SIGS: f"{out_dir}/{MINHASH_SIGS}",
        WINNOW_FPS: f"{out_dir}/{WINNOW_FPS}",
    }
    _shingle_rows(spark, sf_dir).write.mode("overwrite").parquet(paths[SHINGLES])
    sh = spark.read.parquet(paths[SHINGLES])
    _minhash_sig_from(sh).write.mode("overwrite").parquet(paths[MINHASH_SIGS])
    d12_winnow_fingerprints(spark, sf_dir).write.mode("overwrite").parquet(
        paths[WINNOW_FPS]
    )
    return paths


def minhash_band_pairs_from_tables(spark: SparkSession, out_dir: str) -> DataFrame:
    """d9 over the materialized signature table (no corpus scan at all)."""
    return _band_pairs_from(spark.read.parquet(f"{out_dir}/{MINHASH_SIGS}"))


def ngram_jaccard_pairs_from_tables(
    spark: SparkSession, out_dir: str, threshold: float = 0.5
) -> DataFrame:
    """d7 over the materialized shingle table — the plan reads parquet
    twice (candidates + intersection join), never re-tokenizes, and needs
    no session cache."""
    return ngram_jaccard_pairs_from(
        spark.read.parquet(f"{out_dir}/{SHINGLES}"), threshold=threshold
    )


def winnow_dup_pairs_from_tables(
    spark: SparkSession, out_dir: str, min_shared: int = 1, max_df: int = 64
) -> DataFrame:
    """d13 over the materialized fingerprint table."""
    return winnow_dup_pairs_from(
        spark.read.parquet(f"{out_dir}/{WINNOW_FPS}"),
        min_shared=min_shared,
        max_df=max_df,
    )
