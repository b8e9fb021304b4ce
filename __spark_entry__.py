"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship interleaved-span extraction on the
sf0.001 tier; ``queries()``/``oracle_sql()`` expose the operator coverage
from SURVEY.md §2 plus the training-data pipeline ops (dedup family,
similarity search, text analysis, multimodal plumbing). Exactly 50 queries
are registered — the driver's CORRECTNESS gate records at most 50 rows
(see docs/COVERAGE.md, "Driver registry sizing") — 43 of them
oracle-backed (including the e7 recall gauge: the measurement itself is
reproduced in DuckDB, j6's native DuckDB ASOF JOIN, and d16's
recursive-CTE connected components). Oracle-less entries (x1/x2/x4/x5/m1,
d13, a12) are the non-SQL-expressible kernel pipelines, the
engine-native-hash winnowing pairs, and the HLL sketch — each covered by
golden / agreement / parity tests in tests/ instead.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full extraction over the deterministic interleaved corpus
    at the sf0.001 tier (driver checks rows>0, stable schema)."""
    from deed_ocr_spark.queries.extraction import x1_extract_spans

    return x1_extract_spans(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from deed_ocr_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from deed_ocr_spark.queries import ORACLES

    return dict(ORACLES)
