"""d15_contamination: DuckDB-oracle value equality (the same rigor as the
driver's CORRECTNESS gate, run here because the 50-row registry is full)
plus the scale-shape plan audit — the benchmark side must broadcast and the
corpus side must never cross-join."""

import duckdb

from deed_ocr_spark.queries.textpipe import _SHINGLES_SQL, d15_contamination

SF = "/root/testdata/sf0.01"

ORACLE_SQL = f"""
    WITH sh AS ({_SHINGLES_SQL}),
    bench AS (SELECT doc_id AS bench_id, sh FROM sh WHERE doc_id % 97 = 0),
    corpus AS (SELECT * FROM sh WHERE doc_id % 97 <> 0)
    SELECT c.doc_id, b.bench_id, count(*) AS shared_shingles
    FROM corpus c JOIN bench b USING (sh)
    GROUP BY c.doc_id, b.bench_id
    HAVING count(*) >= 3
"""


def test_contamination_matches_duckdb(spark):
    got = {
        (r["doc_id"], r["bench_id"], r["shared_shingles"])
        for r in d15_contamination(spark, SF).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM parquet_scan('{SF}/documents.parquet')"
    )
    want = set(map(tuple, con.execute(ORACLE_SQL).fetchall()))
    con.close()
    assert got == want and len(got) > 0


def test_contamination_plan_broadcasts_bench_side(spark):
    plan = (
        d15_contamination(spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "documents.parquet" not in plan, "must read the shingle table, not re-tokenize"
