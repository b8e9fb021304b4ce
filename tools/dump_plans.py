"""Dump .explain('formatted') for the bench/registry queries to plans/r07/.

Usage: python tools/dump_plans.py <suffix> [query ...]
Writes plans/r07/<name>_<suffix>.txt.  Measurement-free (plans only).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")


def main():
    if len(sys.argv) < 2:
        print(__doc__)
        sys.exit(2)
    suffix = sys.argv[1]
    names = sys.argv[2:]
    from deed_ocr_spark.queries import QUERIES as _REG
    from deed_ocr_spark.queries.textpipe import d6b_simhash_fast
    from deed_ocr_spark.session import get_spark

    QUERIES = {**_REG, "d6b_simhash_fast": d6b_simhash_fast}
    if not names:
        names = list(QUERIES)
    spark = get_spark("plans", shuffle_partitions=32)
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r07")
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = QUERIES[name](spark, SF_DIR)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(plan)
        n_ex = plan.count("Exchange")
        print(f"{name:30s} exchanges={n_ex}")
    spark.stop()


if __name__ == "__main__":
    main()
