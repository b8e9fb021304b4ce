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
