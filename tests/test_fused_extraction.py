"""Fused generate+extract kernels (round-7 optimization).

x2/x4/x5 fuse corpus generation and extraction into ONE mapInPandas so
span payloads never cross the Python↔JVM Arrow boundary twice. These
tests hold the fused forms row-identical to the unfused two-stage
pipeline (range → mapInPandas(generate) → mapInArrow(extract)) that the
golden/parity suites were written against.
"""

from pyspark.sql import functions as F

from deed_ocr_spark.corpus import corpus_df
from deed_ocr_spark.job import extract_summaries
from deed_ocr_spark.queries.extraction import (
    CORPUS_SEED,
    _corpus_size,
    _fused_summaries,
    x5_descriptions_confident,
)

SF = "/root/testdata/sf0.001"


def _rows(df):
    return {tuple(r) for r in df.collect()}


def test_fused_summaries_match_unfused(spark):
    unfused = extract_summaries(
        corpus_df(spark, _corpus_size(SF), seed=CORPUS_SEED)
    )
    fused = _fused_summaries(spark, SF)
    cols = [
        "doc_id",
        "n_pages",
        "n_spans",
        "n_media",
        "combined_chars",
        F.array_join("legal_description_block", "␞"),
        F.array_join("trs", "␞"),
        "details_json",
    ]
    assert _rows(fused.select(*cols)) == _rows(unfused.select(*cols))
    assert fused.count() == _corpus_size(SF)


def test_fused_descriptions_match_unfused(spark):
    from deed_ocr_spark.extract import (
        DESC_OUT_DDL,
        extract_descriptions_batches_arrow,
    )

    src = corpus_df(spark, _corpus_size(SF), seed=CORPUS_SEED).select(
        "doc_id", "spans"
    )
    unfused = src.mapInArrow(
        extract_descriptions_batches_arrow, DESC_OUT_DDL
    ).filter(F.col("confidence") > 0.5)
    fused = x5_descriptions_confident(spark, SF)
    assert _rows(fused) == _rows(unfused)
    assert fused.count() > 0


def test_fused_plan_single_python_stage(spark):
    """The fused x4 plan carries exactly ONE Python-eval node and no
    Exchange — generation and extraction share a worker."""
    from deed_ocr_spark.queries.extraction import x4_doc_details

    plan = str(
        x4_doc_details(spark, SF)._jdf.queryExecution().executedPlan()
    )
    assert plan.count("MapInPandas") == 1, plan
    assert "MapInArrow" not in plan, plan
    assert "Exchange" not in plan, plan
