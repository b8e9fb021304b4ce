"""The fused mapInPandas merge (x2) and the grouped applyInPandas merge
(x3) must agree exactly — two physical strategies, one semantics."""

from deed_ocr_spark.queries.extraction import x2_doc_summaries, x3_doc_summaries_grouped

SF = "/root/testdata/sf0.001"


def test_fused_and_grouped_summaries_agree(spark):
    fused = {tuple(r) for r in x2_doc_summaries(spark, SF).collect()}
    grouped = {tuple(r) for r in x3_doc_summaries_grouped(spark, SF).collect()}
    assert fused == grouped
    assert len(fused) > 0
