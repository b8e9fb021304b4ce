"""Scalar pandas-UDF surface (deed_ocr_spark/functions.py) agreement tests.

The Series→Series UDFs must agree exactly with (a) the pure kernel
functions they wrap and (b) where one exists, the relational formulation
(p7's regexp chain) — completing the SURVEY §2.9 UDF-kind matrix
(mapInPandas and applyInPandas are covered by the extraction/x3 suites,
applyInPandasWithState by streaming)."""

from pyspark.sql import functions as F

from deed_ocr_spark.functions import (
    clean_watermarks_udf,
    strip_html_udf,
    traditional_confidence_udf,
)
from deed_ocr_spark.kernels.html import strip_html_boilerplate
from deed_ocr_spark.kernels.legal import traditional_confidence
from deed_ocr_spark.kernels.textops import clean_watermarks

SF = "/root/testdata/sf0.001"


def test_clean_watermarks_udf_matches_kernel_and_relational(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(80)
    rows = docs.select(
        "doc_id", "text", clean_watermarks_udf("text").alias("via_udf")
    ).collect()
    assert rows
    for r in rows:
        assert r["via_udf"] == clean_watermarks(r["text"])


def test_clean_watermarks_udf_matches_p7_query(spark):
    """p7's oracle-backed relational regexp chain (which emits
    md5/length of the cleaned text) and the UDF must agree on every
    document."""
    from deed_ocr_spark.queries.relational import p7_watermark_clean

    rel = {
        r["doc_id"]: (r["clean_md5"], r["clean_len"])
        for r in p7_watermark_clean(spark, SF).collect()
    }
    udf = {
        r["doc_id"]: (r["m"], r["n"])
        for r in spark.read.parquet(f"{SF}/documents.parquet")
        .select(
            "doc_id",
            F.md5(clean_watermarks_udf("text")).alias("m"),
            F.length(clean_watermarks_udf("text")).cast("bigint").alias("n"),
        )
        .collect()
    }
    assert rel and set(rel) == set(udf)
    assert all(rel[k] == udf[k] for k in rel)


def test_confidence_udf_matches_kernel(spark):
    df = spark.createDataFrame(
        [
            ("Lot 42, Block B, RIVERSIDE ESTATES",
             "LEGAL DESCRIPTION: Lot 42, Block B, RIVERSIDE ESTATES"),
            ("x" * 150, "y" * 600 + "x" * 150),
            ("x" * 250, "legal description " + "x" * 250),
            ("short", "no headers at all"),
            (None, None),
        ],
        "m string, t string",
    )
    rows = df.select(
        "m", "t", traditional_confidence_udf("m", "t").alias("c")
    ).collect()
    for r in rows:
        assert r["c"] == traditional_confidence(r["m"] or "", r["t"] or "")


def test_strip_html_udf_matches_kernel(spark):
    frags = [
        "<div><p>This paragraph is long enough to be kept as main content "
        "of the page.</p></div><nav><a href='/x'>home</a></nav>",
        "<ul><li><a href='/a'>a</a></li><li><a href='/b'>b</a></li></ul>",
        "plain text without any markup that still clears the length gate",
        "",
    ]
    df = spark.createDataFrame([(f,) for f in frags], "h string")
    rows = df.select("h", strip_html_udf("h").alias("s")).collect()
    for r in rows:
        assert r["s"] == strip_html_boilerplate(r["h"])
