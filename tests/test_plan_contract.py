"""Registry-wide physical-plan contract.

test_plans.py locks specific high-value plans (d7/d13 signature scans,
j1's equi-key range join, the zero-exchange extraction). This module
asserts the GLOBAL invariants every registered query must satisfy — the
properties that make the 100 TB story true regardless of which query a
user runs:

* no ``CartesianProduct`` and no ``BroadcastNestedLoopJoin`` — nothing in
  the registry may quietly degrade to an all-pairs comparison (the d9/e4
  discipline, enforced everywhere);
* no ``InMemoryTableScan`` — registered paths are cache-free; durable
  reuse goes through content-keyed parquet tables (signatures.py /
  multimodal.ensure_media_table), never session-cache residency (the
  round-3 d7 regression class);
* no ``BatchEvalPython`` — when Python runs it is Arrow-vectorized
  (MapInArrow / MapInPandas / ArrowEvalPython), never a row-at-a-time
  pickle loop.

A new query added to the registry is covered automatically.
"""

import pytest

from deed_ocr_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"

FORBIDDEN = (
    "CartesianProduct",
    "BroadcastNestedLoopJoin",
    "InMemoryTableScan",
    "BatchEvalPython",
)

# The ONE legitimate nested-loop shape: crossJoin(F.broadcast(<constant>))
# of a tiny createDataFrame frame (one query vector, a hyperplane set, a
# centroid table — O(10) rows) onto the scan. That is a map-side broadcast
# with per-row work proportional to the constant's size — linear in the
# corpus, no shuffle, exactly what a 1000-executor plan wants. Queries
# listed here may carry BroadcastNestedLoopJoin; everything else may not,
# and CartesianProduct stays banned everywhere (an UNBROADCAST nested
# loop would show up as CartesianProduct and still fail).
CONSTANT_BROADCAST_OK = {
    "e1_cosine_topk",  # one query vector          (similarity.py:49)
    "e2_lsh_buckets",  # hyperplane constants      (similarity.py:65)
    "e4_lsh_ann_topk",  # hyperplane constants     (similarity.py:486)
    "e5_ivf_ann_topk",  # centroid constants       (similarity.py:592)
    "e6_embedding_neardup",  # hyperplane constants (similarity.py:486)
}


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_registered_plan_obeys_scale_contract(spark, name):
    plan = _plan(QUERIES[name](spark, SF))
    for marker in FORBIDDEN:
        if marker == "BroadcastNestedLoopJoin" and name in CONSTANT_BROADCAST_OK:
            continue
        assert marker not in plan, f"{name}: {marker} in physical plan"
