"""Shared helpers for the driver-gate queries.

Oracle-parity rules (every query here is compared against DuckDB by
row-count + schema + order-insensitive value hash):

* never sum raw doubles — cast to DECIMAL first (exact), cast the result
  back to DOUBLE (one deterministic rounding) so both engines emit
  bit-identical doubles with a plain ``double`` schema;
* ratios only over already-exact operands (IEEE division is deterministic);
* timestamps never appear in output; session timezone pinned to UTC so
  timestamp *filters* agree with DuckDB's UTC-naive timestamps;
* every computed column aliased identically in Spark and SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def rebalanced(df: DataFrame, *keys: str) -> DataFrame:
    """Hash-repartition a scan that cannot parallelize on its own.

    Parquet assigns at most one task per file (row groups bound the real
    split count below that), so a compute-heavy stage fed by a few-file
    table runs on a few cores no matter the byte-range splits — the
    sandbox testdata tables are SINGLE files with 1–6 row groups, i.e.
    1–6-way compute on a 32-core box. The repartition is applied only when
    the file count is below the cluster's parallelism (the
    textpipe._docs_rebalanced heuristic): at production scale the scan has
    thousands of splits and this exchange disappears from the plan.
    Callers project to the needed columns FIRST so the exchange carries
    only them (guide §2.3)."""
    spark = df.sparkSession
    par = spark.sparkContext.defaultParallelism
    if len(df.inputFiles()) < par:
        df = df.repartition(par, *keys)
    return df
