"""e6 embedding near-dup: plant duplicates in a synthetic embeddings table
and verify the LSH-bucketed pipeline finds exactly them (the driver
testdata has no true near-dups — random 64-dim vectors — so the live query
correctly returns empty there)."""

import numpy as np
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from deed_ocr_spark.queries.similarity import e6_embedding_neardup

SCHEMA = StructType(
    [
        StructField("vec_id", LongType()),
        StructField("embedding", ArrayType(FloatType())),
        StructField("label", IntegerType()),
    ]
)


def test_planted_duplicates_found(spark, tmp_path):
    rng = np.random.RandomState(7)
    base = rng.randn(40, 16).astype("float32")
    rows = [(i, [float(x) for x in base[i]], 0) for i in range(40)]
    # plant: 100 == 3 exactly; 101 ≈ 7 with tiny noise
    rows.append((100, [float(x) for x in base[3]], 0))
    noisy = base[7] + rng.randn(16).astype("float32") * 0.01
    rows.append((101, [float(x) for x in noisy], 0))
    sf_dir = str(tmp_path)
    spark.createDataFrame(rows, SCHEMA).write.parquet(f"{sf_dir}/embeddings.parquet")

    pairs = {
        (r["vec_a"], r["vec_b"]): r["cos_sim"]
        for r in e6_embedding_neardup(
            spark, sf_dir, threshold=0.95, plant_dups=False
        ).collect()
    }
    assert (3, 100) in pairs and pairs[(3, 100)] == 1.0
    assert (7, 101) in pairs and pairs[(7, 101)] > 0.99
    # nothing else is a near-dup at 0.95
    assert set(pairs) == {(3, 100), (7, 101)}


def test_e6_driver_tier_recovers_all_planted_pairs(spark):
    """The driver-tier run (plant_dups=True) must return exactly one pair
    per planted duplicate — a live recall check, not a vacuous 0-row one."""
    from pyspark.sql import functions as F

    out = e6_embedding_neardup(spark, "/root/testdata/sf0.001").collect()
    got = {(r["vec_a"], r["vec_b"]) for r in out}
    expected = {(v, v + 1_000_000) for v in range(0, 500, 10)}
    assert got == expected
    assert all(r["cos_sim"] >= 0.8 for r in out)


def test_e7_ann_recall_meets_target(spark):
    """One gauge, three rows: both index families clear recall 0.8 on the
    near-orthogonal worst case, and the clustered fixture shows the
    realistic operating point (recall ≥0.9 at candidate fraction ≤0.1)."""
    from deed_ocr_spark.queries.similarity import e7_ann_recall

    rows = {r["method"]: r for r in e7_ann_recall(spark, "/root/testdata/sf0.001").collect()}
    assert set(rows) == {"lsh", "ivf", "lsh_clustered"}
    for r in rows.values():
        assert r["n_queries"] == 500 and r["topk"] == 3
        # the tradeoff is visible: candidates are a strict subset of all pairs
        assert 0.0 < r["candidate_fraction"] < 1.0
    assert rows["lsh"]["recall"] >= 0.8
    assert rows["ivf"]["recall"] >= 0.8
    assert rows["lsh_clustered"]["recall"] >= 0.9
    assert rows["lsh_clustered"]["candidate_fraction"] <= 0.1


def test_e4_bucket_cap_bounds_candidates(spark):
    """bucket_cap must bound the candidate side regardless of bucket skew:
    with cap=8 no (tbl,bucket) contributes more than 8 candidate vectors."""
    from deed_ocr_spark.queries.common import t
    from deed_ocr_spark.queries.similarity import _ann_candidates

    e = t(spark, "/root/testdata/sf0.001", "embeddings")
    pairs = _ann_candidates(
        e.select("vec_id", "embedding"), n_planes=2, n_tables=1, bucket_cap=8
    )
    from pyspark.sql import functions as F

    per_q = pairs.groupBy("qid").agg(F.count(F.lit(1)).alias("n")).collect()
    # 1 table × 4 buckets, cap 8: each query sees at most 8 candidates
    assert per_q and all(r["n"] <= 8 for r in per_q)


def test_e7_sampled_gauge_bounds_ground_truth(spark):
    """With a small max_queries the gauge still reports sane recall and the
    ground-truth side shrinks to the sample (n_queries == ceil-sampled)."""
    from deed_ocr_spark.queries.similarity import e7_ann_recall

    rows = {
        r["method"]: r
        for r in e7_ann_recall(spark, "/root/testdata/sf0.001", max_queries=50).collect()
    }
    assert rows["lsh"]["n_queries"] == 50  # 500 vecs / mod 10
    assert rows["lsh"]["recall"] >= 0.7  # small sample, looser floor


def test_e5_list_cap_bounds_inverted_lists(spark):
    """With list_cap=8 each probed cell contributes at most 8 candidates,
    so no query can see more than nprobe*8 candidate pairs."""
    from pyspark.sql import functions as F

    from deed_ocr_spark.queries.similarity import e5_ivf_ann_topk

    big_k = 10**6  # effectively "all candidates" — isolates the cap
    per_q = (
        e5_ivf_ann_topk(
            spark, "/root/testdata/sf0.001", k_cells=4, nprobe=2,
            topk=big_k, list_cap=8,
        )
        .groupBy("qid")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    assert per_q and all(r["n"] <= 16 for r in per_q)
