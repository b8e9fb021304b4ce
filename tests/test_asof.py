"""asof_join vs DuckDB's native ASOF JOIN on the events table, plus
semantics edges (ties, tolerance, row-atomic payload carry) and a plan
audit (one exchange, no range-join explosion)."""

import duckdb
import pytest
from pyspark.sql import functions as F

from deed_ocr_spark.queries.asof import asof_join

SF = "/root/testdata/sf0.001"


def _sides(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    left = ev.filter(F.col("event_id") % 2 == 1).select(
        "event_id", "user_id", F.col("ts").alias("l_ts")
    )
    right = ev.filter(F.col("event_id") % 2 == 0).select(
        "user_id",
        F.col("ts").alias("r_ts"),
        F.col("event_id").alias("r_event_id"),
        F.col("value").alias("r_value"),
    )
    return left, right


def _oracle(how):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM parquet_scan('{SF}/events.parquet')"
    )
    join_kw = "ASOF JOIN" if how == "inner" else "ASOF LEFT JOIN"
    rows = con.execute(
        f"""
        WITH l AS (SELECT event_id, user_id, ts AS l_ts FROM events
                   WHERE event_id % 2 = 1),
             r AS (SELECT user_id, ts AS r_ts, event_id AS r_event_id,
                          value AS r_value FROM events WHERE event_id % 2 = 0)
        SELECT l.event_id, r.r_event_id, r.r_value
        FROM l {join_kw} r
          ON l.user_id = r.user_id AND l.l_ts >= r.r_ts
        """
    ).fetchall()
    con.close()
    return {r[0]: (r[1], r[2]) for r in rows}


@pytest.mark.parametrize("how", ["inner", "left"])
def test_asof_join_matches_duckdb(spark, how):
    left, right = _sides(spark)
    got_rows = asof_join(
        left, right, on=["user_id"], left_ts="l_ts", right_ts="r_ts",
        right_cols=["r_event_id", "r_value"], how=how,
    ).collect()
    got = {r["event_id"]: (r["r_event_id"], r["r_value"]) for r in got_rows}
    expected = _oracle(how)
    assert len(got_rows) == len(got), "duplicate left rows emitted"
    assert got == expected


def test_asof_tie_and_tolerance_and_atomic_payload(spark):
    import datetime as dt

    def ts(m):
        return dt.datetime(2026, 1, 1, 12, m, tzinfo=dt.timezone.utc)

    left = spark.createDataFrame(
        [(1, 10, ts(10)), (2, 10, ts(30)), (3, 10, ts(5)), (4, 20, ts(10))],
        "lid int, k int, l_ts timestamp",
    )
    # key 10: right rows at :00 (v=1.0, tag='a') and :10 (v=NULL, tag='b');
    # key 20: no right rows at all
    right = spark.createDataFrame(
        [(10, ts(0), 1.0, "a"), (10, ts(10), None, "b")],
        "k int, r_ts timestamp, v double, tag string",
    )
    out = {
        r["lid"]: (r["v"], r["tag"])
        for r in asof_join(
            left, right, on=["k"], left_ts="l_ts", right_ts="r_ts",
            right_cols=["v", "tag"], how="left",
        ).collect()
    }
    # tie at :10 matches the :10 right row; its NULL v must NOT be papered
    # over by the older row's 1.0 (row-atomic payload)
    assert out[1] == (None, "b")
    assert out[2] == (None, "b")
    assert out[3] == (1.0, "a")  # :05 is before :10, latest is :00
    assert out[4] == (None, None)  # keyless left row survives how='left'

    # tolerance: 15 minutes voids the :30 left row's match (:10 is 20 min old)
    out_tol = {
        r["lid"]: r["tag"]
        for r in asof_join(
            left, right, on=["k"], left_ts="l_ts", right_ts="r_ts",
            right_cols=["v", "tag"], how="inner",
            tolerance=F.expr("INTERVAL 15 MINUTES"),
        ).collect()
    }
    assert set(out_tol) == {1, 3}
    assert out_tol[1] == "b" and out_tol[3] == "a"


def test_asof_payload_named_ts_and_reserved_names(spark):
    """Round-4 ADVICE: a right payload column literally named 'ts' used to
    collide with the struct's internal timestamp field (ambiguous m['ts']);
    the internal field is now __asof_rts, and __asof_* user names are
    rejected up front."""
    import datetime as dt

    def ts(m):
        return dt.datetime(2026, 1, 1, 12, m, tzinfo=dt.timezone.utc)

    left = spark.createDataFrame(
        [(1, 10, ts(10))], "lid int, k int, l_ts timestamp"
    )
    right = spark.createDataFrame(
        [(10, ts(0), ts(0), 7.0)], "k int, r_ts timestamp, ts timestamp, v double"
    )
    row = asof_join(
        left, right, on=["k"], left_ts="l_ts", right_ts="r_ts",
        right_cols=["ts", "v"], how="inner",
        tolerance=F.expr("INTERVAL 1 HOUR"),
    ).collect()
    # (collected timestamps are tz-naive; compare on the minute field)
    assert len(row) == 1 and row[0]["ts"].minute == 0 and row[0]["v"] == 7.0

    with pytest.raises(ValueError, match="reserved"):
        asof_join(
            left, right.withColumnRenamed("ts", "__asof_rts"),
            on=["k"], left_ts="l_ts", right_ts="r_ts",
            right_cols=["__asof_rts"],
        )


def test_asof_plan_single_exchange_no_range_join(spark):
    left, right = _sides(spark)
    plan = asof_join(
        left, right, on=["user_id"], left_ts="l_ts", right_ts="r_ts",
        right_cols=["r_value"],
    )._jdf.queryExecution().executedPlan().toString()
    # the scalable shape: window over one hash exchange; no join at all
    assert "Window" in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert plan.count("hashpartitioning(user_id") >= 1
