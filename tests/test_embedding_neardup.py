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
        for r in e6_embedding_neardup(spark, sf_dir, threshold=0.95).collect()
    }
    assert (3, 100) in pairs and pairs[(3, 100)] == 1.0
    assert (7, 101) in pairs and pairs[(7, 101)] > 0.99
    # nothing else is a near-dup at 0.95
    assert set(pairs) == {(3, 100), (7, 101)}
