"""Benchmark harness. Prints ONE JSON line:

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": <sf>, "docs_per_sec": ...}

Headline: end-to-end extraction throughput (docs/sec) over the skewed
synthetic interleaved corpus (the BASELINE.json metric), plus wall time for
the heavy relational/pipeline queries at $SPARK_GRAFT_SF_DIR.

Scaling evidence (north_rule: efficiency ≥0.8 from N→4N): run

    python bench.py --scaling

which executes the same extraction at local[8] and local[32] on the same
pre-materialized input and reports throughput at both plus efficiency
(see BENCH.md).
"""

from __future__ import annotations

import json
import os
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
BENCH_DOCS = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "8000"))
SEED = 42

BENCH_QUERIES = [
    "a4_pricing_summary",
    "j2_join_agg",
    "j1_range_join",
    "w2_topk_per_group",
    "d1_dedup_exact",
    "d6_simhash",
    "d8_minhash_sig",
    "d9_minhash_band_pairs",
    "e1_cosine_topk",
    "p7_watermark_clean",
]


def _sf_label(sf_dir: str) -> float:
    for part in sf_dir.rstrip("/").split("/"):
        if part.startswith("sf"):
            try:
                return float(part[2:])
            except ValueError:
                pass
    return -1.0


def _materialize_corpus(spark, n_docs: int) -> str:
    path = f"/tmp/bench_corpus_{n_docs}_{SEED}.parquet"
    if not os.path.exists(path):
        from deed_ocr_spark.corpus import corpus_df

        corpus_df(spark, n_docs, seed=SEED).write.mode("overwrite").parquet(path)
    return path


def _run_extraction(spark, corpus_path: str, n_partitions: int) -> tuple[float, int]:
    from deed_ocr_spark.job import extract_spans

    df = spark.read.parquet(corpus_path)
    t0 = time.time()
    n_spans = extract_spans(df, n_partitions=n_partitions).count()
    return time.time() - t0, n_spans


def bench_main() -> None:
    from deed_ocr_spark.queries import QUERIES
    from deed_ocr_spark.session import get_spark

    spark = get_spark("bench", master=f"local[{CPUS}]", shuffle_partitions=CPUS)
    results: dict[str, float] = {}

    corpus_path = _materialize_corpus(spark, BENCH_DOCS)
    # warm the JVM/Python workers so the headline isn't startup time
    _run_extraction(spark, corpus_path, n_partitions=CPUS * 2)
    ext_sec, n_spans = _run_extraction(spark, corpus_path, n_partitions=CPUS * 2)
    results["x1_extract_spans"] = round(ext_sec, 3)
    docs_per_sec = BENCH_DOCS / ext_sec

    for name in BENCH_QUERIES:
        fn = QUERIES[name]
        t0 = time.time()
        df = fn(spark, SF_DIR)
        df.count()
        results[name] = round(time.time() - t0, 3)

    total = round(sum(results.values()), 3)
    print(
        json.dumps(
            {
                "metric": "extraction+pipeline wall time (headline: docs/sec extraction)",
                "value": total,
                "unit": "sec",
                "queries": results,
                "sf": _sf_label(SF_DIR),
                "docs_per_sec": round(docs_per_sec, 1),
                "bench_docs": BENCH_DOCS,
                "spans": n_spans,
                "cpus": CPUS,
            }
        )
    )
    spark.stop()


def scaling_main() -> None:
    """Same job, same input, two parallelism levels → scaling efficiency."""
    from deed_ocr_spark.session import get_spark

    lo, hi = 8, 32
    out = {}
    # materialize once with the hi session config but fixed layout
    spark = get_spark("bench-prep", master=f"local[{hi}]")
    corpus_path = _materialize_corpus(spark, BENCH_DOCS)
    spark.stop()

    for cores in (lo, hi):
        spark = get_spark(f"bench-scale-{cores}", master=f"local[{cores}]",
                          shuffle_partitions=cores)
        _run_extraction(spark, corpus_path, n_partitions=cores * 2)  # warm
        sec, _ = _run_extraction(spark, corpus_path, n_partitions=cores * 2)
        out[cores] = BENCH_DOCS / sec
        spark.stop()

    eff = (out[hi] / out[lo]) / (hi / lo)
    print(
        json.dumps(
            {
                "metric": "scaling efficiency local[8]→local[32]",
                "docs_per_sec": {str(k): round(v, 1) for k, v in out.items()},
                "core_ratio": hi / lo,
                "throughput_ratio": round(out[hi] / out[lo], 3),
                "efficiency": round(eff, 3),
                "bench_docs": BENCH_DOCS,
            }
        )
    )


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        scaling_main()
    else:
        bench_main()
