"""Bucketed-table co-located join: the shuffle-elimination story.

At 100 TB the expensive joins (docs ⋈ signatures, docs ⋈ scores) should be
bucket-co-located so neither side shuffles. This test writes two derived
tables bucketed by doc_id into the session warehouse and asserts the join
plan contains NO Exchange — the physical property the design relies on.
Results must equal the plain (shuffling) join exactly.
"""

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.01"
N_BUCKETS = 8


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    left = docs.select("doc_id", "n_chars")
    right = docs.select(
        "doc_id", F.md5("text").alias("text_md5"), F.length("text").alias("len2")
    )
    spark.sql("DROP TABLE IF EXISTS b_left")
    spark.sql("DROP TABLE IF EXISTS b_right")
    (
        left.write.bucketBy(N_BUCKETS, "doc_id").sortBy("doc_id")
        .mode("overwrite").saveAsTable("b_left")
    )
    (
        right.write.bucketBy(N_BUCKETS, "doc_id").sortBy("doc_id")
        .mode("overwrite").saveAsTable("b_right")
    )
    yield "b_left", "b_right"
    spark.sql("DROP TABLE IF EXISTS b_left")
    spark.sql("DROP TABLE IF EXISTS b_right")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    lname, rname = bucketed_tables
    # disable broadcast so the plan exercises the big-table (sort-merge)
    # path — at 100 TB neither side broadcasts, and THAT is the join the
    # bucketing must keep shuffle-free
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table(lname).join(spark.table(rname), "doc_id")
        plan = joined._sc._jvm.PythonSQLUtils.explainString(
            joined._jdf.queryExecution(), "formatted"
        )
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)

    # and the co-located join returns exactly the plain join's rows
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plain = (
        docs.select("doc_id", "n_chars")
        .join(
            docs.select(
                "doc_id", F.md5("text").alias("text_md5"),
                F.length("text").alias("len2"),
            ),
            "doc_id",
        )
    )
    assert sorted(map(tuple, joined.collect())) == sorted(map(tuple, plain.collect()))
