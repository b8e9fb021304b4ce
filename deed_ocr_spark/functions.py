"""Scalar (Series→Series) pandas UDF surface over the text kernels.

SURVEY.md §2.9 maps each reference per-row unit to a Spark UDF KIND; the
engine's hot paths are ``mapInPandas`` (doc → spans fan-out) and
``applyInPandas`` (grouped merge, x3) — this module completes the matrix
with the Arrow-vectorized SCALAR kind, for composing kernel semantics
into arbitrary DataFrame expressions (e.g. cleaning a column in place in
a relational pipeline without a kernel pass). Each UDF delegates to the
same pure kernel function the batch path uses, so the two can never
drift — pinned by agreement tests (tests/test_pandas_udfs.py) against
both the scalar kernel and the relational regexp form.

Reference anchors: watermark cleanup workflow.py:711-726; confidence
extractors/llm.py:143-165.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType, StringType

# note: returnType as DataType OBJECTS, not DDL strings — string parsing
# would require an active SparkSession at import time


@pandas_udf(StringType())
def clean_watermarks_udf(texts: pd.Series) -> pd.Series:
    """Reference watermark cleanup as an Arrow scalar UDF (byte-parity
    with kernels/textops.clean_watermarks — same function per element)."""
    from deed_ocr_spark.kernels.textops import clean_watermarks_series

    return clean_watermarks_series(texts.fillna(""))


@pandas_udf(DoubleType())
def traditional_confidence_udf(
    match_text: pd.Series, full_text: pd.Series
) -> pd.Series:
    """Reference confidence score (base 0.5, +0.2 header proximity within
    500 chars, +0.1 per length tier, cap 0.9) as an Arrow scalar UDF."""
    from deed_ocr_spark.kernels.legal import traditional_confidence

    return pd.Series(
        [
            traditional_confidence(m or "", t or "")
            for m, t in zip(match_text, full_text)
        ],
        dtype="float64",
    )


@pandas_udf(StringType())
def strip_html_udf(raw_html: pd.Series) -> pd.Series:
    """Main-content extraction (text/link-density heuristic) as an Arrow
    scalar UDF — same kernel as the extraction path's html spans."""
    from deed_ocr_spark.kernels.html import strip_html_boilerplate

    return raw_html.fillna("").map(strip_html_boilerplate)
