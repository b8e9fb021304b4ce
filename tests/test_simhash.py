"""d6 (md5, oracle-portable) vs d6b (xxhash64, production) SimHash twins.

Different hash families give different signatures, but both are valid
SimHash instances over the same token multiset — so they must agree on the
*behavioral* contract: identical texts collide exactly, near-duplicates sit
at small Hamming distance, unrelated documents at large distance, and the
distance ORDERING of (dup, near-dup, unrelated) matches between schemes.
"""

import pytest
from pyspark.sql import functions as F

from deed_ocr_spark.queries.textpipe import d6_simhash, d6b_simhash_fast

BASE = (
    "the quick brown fox jumps over the lazy dog while seventeen "
    "magistrates review the quarterly land conveyance records in the "
    "county annex building every autumn afternoon without exception"
)


@pytest.fixture(scope="module")
def sim_tables(spark, tmp_path_factory):
    docs = [
        (0, BASE),
        (1, BASE),  # exact duplicate of 0
        (2, BASE.replace("autumn", "spring")),  # near-dup: one token changed
        (
            3,
            "completely unrelated payload about orbital mechanics solar "
            "panels and battery chemistry telemetry downlinked from the "
            "spacecraft during commissioning phase operations yesterday",
        ),
    ]
    sf_dir = tmp_path_factory.mktemp("simhash")
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    df = df.withColumn("n_chars", F.length("text").cast("bigint"))
    df.write.mode("overwrite").parquet(f"{sf_dir}/documents.parquet")
    d6 = {r["doc_id"]: r["simhash"] for r in d6_simhash(spark, str(sf_dir)).collect()}
    d6b = {r["doc_id"]: r["simhash"] for r in d6b_simhash_fast(spark, str(sf_dir)).collect()}
    return d6, d6b


def _ham(a, b):
    return bin(a ^ b).count("1")


def test_exact_duplicates_collide_in_both(sim_tables):
    d6, d6b = sim_tables
    assert d6[0] == d6[1]
    assert d6b[0] == d6b[1]


def test_near_dup_closer_than_unrelated_in_both(sim_tables):
    d6, d6b = sim_tables
    for sig in (d6, d6b):
        near = _ham(sig[0], sig[2])
        far = _ham(sig[0], sig[3])
        assert near < far, (near, far)
        assert near <= 4  # one token flipped out of ~25


def test_signatures_are_16_bit(sim_tables):
    d6, d6b = sim_tables
    for sig in (d6, d6b):
        assert all(0 <= v < (1 << 16) for v in sig.values())


def test_d6b_plan_is_integer_hashaggregate(spark):
    """The production twin must stay in int ops: xxhash64 + shift/mask →
    HashAggregate, no md5/substring string machinery in the plan."""
    plan = (
        d6b_simhash_fast(spark, "/root/testdata/sf0.001")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "xxhash64" in plan
    assert "md5" not in plan
    assert "HashAggregate" in plan
