"""End-to-end example: generate → extract → resume → query.

Run:  python examples/extract_and_query.py
"""

import tempfile

from pyspark.sql import functions as F

from deed_ocr_spark.corpus import corpus_df
from deed_ocr_spark.job import extract_spans, extract_summaries
from deed_ocr_spark.session import get_spark
from deed_ocr_spark.state import run_extraction_job


def main():
    spark = get_spark("example", master="local[4]")
    work = tempfile.mkdtemp(prefix="deed_ocr_example_")
    out, state = f"{work}/spans", f"{work}/state"

    # 1. a deterministic interleaved corpus (in production: Iceberg table)
    docs = corpus_df(spark, 500, seed=42)

    # 2. checkpointed extraction with exactly-once resume
    stats = run_extraction_job(spark, docs, out, state, run_id="demo", n_buckets=16)
    print("job:", stats)

    # 3. the extracted spans table
    spans = spark.read.parquet(out)
    spans.orderBy("doc_id", "order").show(8, truncate=60)

    # 4. per-document summaries (legal descriptions, TRS — the reference's
    #    final_result analog), fused extraction+merge, no shuffle
    extract_summaries(docs).filter(F.size("legal_description_block") > 0).show(
        4, truncate=80
    )

    # 5. re-run = no-op resume (ledger says every bucket is done)
    print("resume:", run_extraction_job(spark, docs, out, state, run_id="demo2", n_buckets=16))

    # 6. ad-hoc analysis over extracted spans
    spans.groupBy("src_kind").agg(
        F.count("*").alias("spans"), F.avg(F.length("text")).alias("avg_chars")
    ).show()
    spark.stop()


if __name__ == "__main__":
    main()
