"""Relational operator coverage (SURVEY.md §2) over the driver testdata.

Each query maps to a SURVEY §2 operator id (in the function name) and has a
DuckDB oracle in ORACLES. Plans are declarative DataFrame ops — Catalyst
does pushdown/pruning/broadcast; `.explain` audits live in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from deed_ocr_spark.queries.common import rebalanced, t


# --- P1/P6: filter + project (predicate pushdown reaches the scan) -------
def p1_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "documents")
        .filter((F.col("lang").isin("en", "de")) & (F.col("n_chars") > 200))
        .select("doc_id", "lang", "n_chars")
    )


# --- P2/F-regex: regex extraction over text ------------------------------
def p2_regex_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.regexp_extract(F.col("text"), r"^(\w+)", 1).alias("first_word"),
        F.regexp_count(F.col("text"), F.lit(r"\bthe\b")).cast("bigint").alias("n_the"),
        F.regexp_count(F.col("text"), F.lit(r"\bjoin\b")).cast("bigint").alias("n_join"),
    )


# --- P7/F2/F3/F4: watermark cleanup as relational expressions ------------
# (the reference semantics of workflow.py:711-726 expressed as a
# regexp_replace chain; the kernel path keeps it in-UDF for byte parity,
# this proves the relational form agrees with ANSI SQL)
def p7_watermark_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    cleaned = F.trim(
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(
                    F.regexp_replace(F.col("text"), F.lit("UNOFFICIAL COPY"), F.lit("")),
                    F.lit("UNO"),
                    F.lit(""),
                ),
                F.lit(r"\n\s*\n\s*\n"),
                F.lit("\n\n"),
            ),
            F.lit(" +"),
            F.lit(" "),
        )
    )
    return d.select(
        "doc_id",
        F.md5(cleaned).alias("clean_md5"),
        F.length(cleaned).cast("bigint").alias("clean_len"),
    )


# --- P8: confidence scoring, exact kernel semantics (llm.py:143-165) ------
# The reference scores a regex match against its document: base 0.5, +0.2
# if ANY of the three header keywords occurs within 500 chars of the match
# (first-occurrence positions, break-on-hit ≡ OR), +0.1 per length
# threshold (>100, >200), capped at 0.9. The documents table is word salad
# with no headers, so to make every branch OBSERVABLE the query derives a
# deterministic scored corpus (e6's planted-fixture discipline): a header
# keyword is planted at a doc_id-dependent distance (padding 0..800 chars,
# straddling the 500 threshold both ways) and the "match" is a
# doc_id-dependent slice (requested length 80..259, straddling both length
# thresholds). Same formula as kernels/legal.py:traditional_confidence —
# held to it by tests/test_p8_kernel_parity.py.
def p8_confidence_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    full = (
        F.when(
            F.col("doc_id") % 4 == 0,
            F.concat(F.lit("LEGAL DESCRIPTION: "), F.col("text")),
        )
        .when(
            F.col("doc_id") % 4 == 1,
            F.concat(
                F.col("text"),
                F.expr("repeat(' pad', CAST(doc_id % 200 AS INT))"),
                F.lit(" described as follows"),
            ),
        )
        .when(
            F.col("doc_id") % 4 == 2,
            F.concat(
                F.lit("Property Description"),
                F.expr("repeat(' pad', CAST(doc_id % 200 AS INT))"),
                F.col("text"),
            ),
        )
        .otherwise(F.col("text"))
    )
    scored = (
        d.select("doc_id", full.alias("full_text"))
        .withColumn(
            "mt",
            F.expr(
                "substring(full_text, 1 + CAST(doc_id % 40 AS INT),"
                " 80 + CAST(doc_id % 180 AS INT))"
            ),
        )
        .withColumn("mpos", F.expr("locate(mt, full_text)"))
        .withColumn("h1", F.expr("locate('legal description', lower(full_text))"))
        .withColumn("h2", F.expr("locate('property description', lower(full_text))"))
        .withColumn("h3", F.expr("locate('described as follows', lower(full_text))"))
    )
    near = (
        ((F.col("h1") > 0) & (F.abs(F.col("mpos") - F.col("h1")) < 500))
        | ((F.col("h2") > 0) & (F.abs(F.col("mpos") - F.col("h2")) < 500))
        | ((F.col("h3") > 0) & (F.abs(F.col("mpos") - F.col("h3")) < 500))
    )
    conf = (
        F.lit(0.5)
        + F.when(near, 0.2).otherwise(0.0)
        + F.when(F.length("mt") > 100, 0.1).otherwise(0.0)
        + F.when(F.length("mt") > 200, 0.1).otherwise(0.0)
    )
    return scored.select(
        "doc_id",
        F.length("mt").cast("bigint").alias("match_len"),
        F.least(conf, F.lit(0.9)).alias("confidence"),
    )


# --- P9: error categorization (workflow.py:65-110 taxonomy shape) ---------
def p9_error_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events")
    kind = (
        F.when(F.col("event_type") != "error", "none")
        .when(F.col("value") < 50, "timeout")
        .when(F.col("value") < 100, "rate_limit")
        .when(F.col("value") < 150, "network")
        .when(F.col("value") < 200, "server_error")
        .otherwise("unknown")
    )
    return (
        e.select(kind.alias("error_kind"))
        .groupBy("error_kind")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# --- A1: ordered concat per group (page-text concat shape) ---------------
def a1_ordered_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events")
    return e.groupBy("user_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("event_id", "event_type"))),
                lambda x: x["event_type"],
            ),
            "|",
        ).alias("type_seq")
    )


# --- A4/A10: grouped sums with decimal-exact arithmetic (TPC-H Q1 shape) --
def a4_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = t(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast("decimal(18,2)")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(18,2)")
    return (
        l.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).cast("double").alias("sum_qty"),
            F.sum(price).cast("double").alias("sum_base_price"),
            F.sum((price * (F.lit(1).cast("decimal(18,2)") - disc)).cast("decimal(28,4)"))
            .cast("double")
            .alias("sum_disc_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# --- A6 / set-op: distinct ------------------------------------------------
def a6_distinct_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return t(spark, sf_dir, "documents").select("lang", "source").distinct()


# --- A9: max_by -----------------------------------------------------------
def a9_max_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events")
    return e.groupBy("user_id").agg(
        F.max_by("event_type", "event_id").alias("last_type"),
        F.max(F.col("value").cast("decimal(18,2)")).cast("double").alias("max_value"),
    )


# --- J2: equi join + agg (broadcast the small dim) ------------------------
def j2_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    return (
        o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("revenue"),
        )
    )


# --- J4: resume anti-join (the checkpoint idiom) --------------------------
def j4_resume_antijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer")
    done = t(spark, sf_dir, "events").select(F.col("user_id").alias("c_custkey")).distinct()
    return c.join(F.broadcast(done), "c_custkey", "left_anti").select("c_custkey", "c_name")


# --- J1: equi + range predicate join --------------------------------------
def j1_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = t(spark, sf_dir, "lineitem")
    # Deliberate join strategy (guide §3.1): both sides are fact-sized (no
    # broadcast), but orders is the smaller — SHUFFLE_HASH builds its hash
    # table per partition and skips BOTH sides' sorts that the default
    # sort-merge pays; the range predicate stays a residual on the
    # l_orderkey equi-join either way (plan-locked in tests/test_plans.py).
    # The build side cannot spill, but o_orderkey is UNIQUE on orders, so
    # no hot key can concentrate build rows: per-partition build size is
    # |orders|/shuffle.partitions, which production bounds by sizing the
    # shuffle width (the same knob that sizes every other partition).
    o = t(spark, sf_dir, "orders").hint("SHUFFLE_HASH")
    return (
        l.join(o, (l["l_orderkey"] == o["o_orderkey"]) & (l["l_shipdate"] > o["o_orderdate"]))
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_late_lines"))
    )




# --- J6: as-of join (time-series point-in-time lookup) ----------------------
def j6_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each odd event (query), the latest even event (state) of the
    same user at or before its timestamp — the canonical point-in-time
    lookup, via the union-marker single-shuffle operator in queries/asof.py
    (no range-join explosion). Right timestamps are unique per user in this
    corpus; with ties the operator keeps the last right row in (ts, marker)
    window order. Oracle: DuckDB's native ASOF JOIN."""
    from deed_ocr_spark.queries.asof import asof_join

    ev = t(spark, sf_dir, "events")
    left = ev.filter(F.col("event_id") % 2 == 1).select(
        "event_id", "user_id", F.col("ts").alias("l_ts")
    )
    right = ev.filter(F.col("event_id") % 2 == 0).select(
        "user_id",
        F.col("ts").alias("r_ts"),
        F.col("event_id").alias("r_event_id"),
        F.col("value").alias("r_value"),
    )
    return asof_join(
        left, right, on=["user_id"], left_ts="l_ts", right_ts="r_ts",
        right_cols=["r_event_id", "r_value"], how="inner",
    ).select("event_id", "user_id", "r_event_id", "r_value")




# --- W2/W4: top-k per group via window ------------------------------------
def w2_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Project to the three live columns, then hash-repartition on the
    # window key when the scan cannot parallelize (single-file table —
    # see common.rebalanced): the window's own exchange is keyed the same,
    # so the plan still has exactly ONE Exchange, but the sort feeding
    # WindowGroupLimit runs at full width instead of at the scan's 1–6
    # tasks. At production split counts the repartition vanishes and the
    # engine's partial WindowGroupLimit (map-side top-k) is unchanged.
    l = rebalanced(
        t(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_linenumber", "l_extendedprice"
        ),
        "l_orderkey",
    )
    w = Window.partitionBy("l_orderkey").orderBy(
        F.col("l_extendedprice").desc(), F.col("l_linenumber").asc()
    )
    return (
        l.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("l_orderkey", "l_linenumber", "l_extendedprice", "rk")
    )


# --- W-window + lag: sessionization ----------------------------------------
def w3_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    # parquet timestamps arrive as TIMESTAMP_NTZ; with the session pinned to
    # UTC the cast reads them as UTC instants, matching DuckDB's naive epoch
    e = t(spark, sf_dir, "events").withColumn(
        "ms", F.unix_millis(F.col("ts").cast("timestamp"))
    )
    w = Window.partitionBy("user_id").orderBy("ms", "event_id")
    gap = F.col("ms") - F.lag("ms", 1).over(w)
    return (
        e.withColumn("new_sess", F.when(gap.isNull() | (gap > 1800000), 1).otherwise(0))
        .groupBy("user_id")
        .agg(
            F.sum("new_sess").cast("bigint").alias("n_sessions"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


# --- J2+: multi-way join chains (Catalyst join reordering / broadcast) ------
def j3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: customer ⋈ orders ⋈ lineitem, segment filter,
    top revenue orders. Decimal-exact revenue for oracle parity."""
    c = t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    # orders is the smaller fact side — shuffled-hash instead of the
    # default sort-merge skips both sides' sorts (the j1 rationale)
    o = t(spark, sf_dir, "orders").hint("SHUFFLE_HASH")
    l = t(spark, sf_dir, "lineitem")
    rev = (
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1).cast("decimal(18,2)") - F.col("l_discount").cast("decimal(18,2)"))
    ).cast("decimal(28,4)")
    return (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .groupBy("o_orderkey", "o_orderpriority")
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey").asc())
        .limit(10)
    )


def j5_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 5-way join through region→nation→customer→orders→
    lineitem; revenue per nation. Small dims broadcast."""
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = t(spark, sf_dir, "nation")
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    l = t(spark, sf_dir, "lineitem")
    rev = (
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1).cast("decimal(18,2)") - F.col("l_discount").cast("decimal(18,2)"))
    ).cast("decimal(28,4)")
    return (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .groupBy("n_name")
        .agg(
            F.sum(rev).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# --- F8: lenient JSON parsing (ocr/gemini_ocr.py:160-196 analog) ------------
def f8_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parse the JSON props column; malformed/missing keys become NULL
    (the lenient-parse discipline — nulls, never exceptions)."""
    e = t(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("bigint")
    return e.groupBy("event_type").agg(
        F.sum(k).alias("k_sum"),
        F.count(k).alias("k_present"),
        F.count(F.lit(1)).alias("n"),
    )


# --- engine extras beyond the reference: rollup, pivot, approx-distinct -----
def a11_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS / ROLLUP over (lang, source) — subtotal rows carry
    NULLs, marked with grouping level for unambiguous hashing."""
    d = t(spark, sf_dir, "documents")
    return (
        d.rollup("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("chars"),
            F.grouping_id().cast("int").alias("lvl"),
        )
    )


def a13_pivot_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot event_type → per-user columns. Expressed as conditional
    aggregation (the portable form; Spark's .pivot() compiles to the same
    physical plan for a known value list)."""
    e = t(spark, sf_dir, "events")
    types = ["click", "view", "signup", "purchase", "error"]
    aggs = [
        F.sum(F.when(F.col("event_type") == ty, 1).otherwise(0))
        .cast("bigint")
        .alias(f"n_{ty}")
        for ty in types
    ]
    return e.groupBy("user_id").agg(*aggs)


def a12_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HLL) — sketch values are engine-specific so
    this stays rows-only; the exact companion is the oracle-backed
    a12b_distinct_parts (same grouping, plain countDistinct)."""
    l = t(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey").alias("approx_parts"),
    )


def a12b_distinct_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact countDistinct twin of a12 — SQL-expressible, so it carries the
    full rows+schema+hash oracle check (the HLL sketch alone cannot)."""
    l = t(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("exact_parts"),
    )


# --- set ops (SURVEY §2.6): union + except with distinct semantics ---------
def u1_union_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer").select(F.col("c_custkey").alias("k"))
    s = t(spark, sf_dir, "supplier").select(F.col("s_suppkey").alias("k"))
    e = t(spark, sf_dir, "events").select(F.col("user_id").alias("k"))
    return c.union(s).distinct().subtract(e.distinct())


# --- W4/W5: deterministic global sort + limit -------------------------------
def w4_sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .select("o_orderkey", "o_totalprice")
        .limit(10)
    )


# --- F5: format_string templating (page-separator shape, workflow.py:221) ---
def f5_format_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.format_string(
            "--- Page %d --- [%s]", (F.col("doc_id") % 30) + 1, F.col("lang")
        ).alias("page_header"),
    )


ORACLES = {
    "a12b_distinct_parts": """
        SELECT l_returnflag, count(DISTINCT l_partkey) AS exact_parts
        FROM lineitem GROUP BY l_returnflag
    """,
    "p1_filter_project": """
        SELECT doc_id, lang, n_chars FROM documents
        WHERE lang IN ('en','de') AND n_chars > 200
    """,
    "p2_regex_extract": r"""
        SELECT doc_id,
               regexp_extract(text, '^(\w+)', 1) AS first_word,
               CAST(length(regexp_extract_all(text, '\bthe\b')) AS BIGINT) AS n_the,
               CAST(length(regexp_extract_all(text, '\bjoin\b')) AS BIGINT) AS n_join
        FROM documents
    """,
    "p7_watermark_clean": r"""
        WITH c AS (
          SELECT doc_id,
                 trim(regexp_replace(regexp_replace(
                        replace(replace(text, 'UNOFFICIAL COPY', ''), 'UNO', ''),
                        '\n\s*\n\s*\n', E'\n\n', 'g'),
                      ' +', ' ', 'g')) AS cleaned
          FROM documents)
        SELECT doc_id, md5(cleaned) AS clean_md5,
               CAST(length(cleaned) AS BIGINT) AS clean_len
        FROM c
    """,
    "p8_confidence_score": """
        -- exact kernel formula (llm.py:143-165): planted headers, 1-based
        -- first-occurrence positions (strpos ≡ Spark locate; both offset by
        -- 1 vs Python find, so the |Δ|<500 proximity is identical), all
        -- operands DOUBLE so IEEE addition order matches Spark
        WITH aug AS (
          SELECT doc_id,
                 CASE
                   WHEN doc_id % 4 = 0 THEN 'LEGAL DESCRIPTION: ' || text
                   WHEN doc_id % 4 = 1 THEN text
                        || repeat(' pad', CAST(doc_id % 200 AS INT))
                        || ' described as follows'
                   WHEN doc_id % 4 = 2 THEN 'Property Description'
                        || repeat(' pad', CAST(doc_id % 200 AS INT)) || text
                   ELSE text END AS full_text
          FROM documents),
        m AS (
          SELECT doc_id, full_text,
                 substring(full_text, 1 + CAST(doc_id % 40 AS INT),
                           80 + CAST(doc_id % 180 AS INT)) AS mt
          FROM aug),
        pos AS (
          SELECT doc_id, mt,
                 strpos(full_text, mt) AS mpos,
                 strpos(lower(full_text), 'legal description') AS h1,
                 strpos(lower(full_text), 'property description') AS h2,
                 strpos(lower(full_text), 'described as follows') AS h3
          FROM m)
        SELECT doc_id,
               CAST(length(mt) AS BIGINT) AS match_len,
               least(CAST(0.5 AS DOUBLE)
                     + CASE WHEN (h1 > 0 AND abs(mpos - h1) < 500)
                              OR (h2 > 0 AND abs(mpos - h2) < 500)
                              OR (h3 > 0 AND abs(mpos - h3) < 500)
                            THEN CAST(0.2 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END
                     + CASE WHEN length(mt) > 100
                            THEN CAST(0.1 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END
                     + CASE WHEN length(mt) > 200
                            THEN CAST(0.1 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END,
                     CAST(0.9 AS DOUBLE)) AS confidence
        FROM pos
    """,
    "p9_error_classify": """
        SELECT CASE WHEN event_type <> 'error' THEN 'none'
                    WHEN value < 50 THEN 'timeout'
                    WHEN value < 100 THEN 'rate_limit'
                    WHEN value < 150 THEN 'network'
                    WHEN value < 200 THEN 'server_error'
                    ELSE 'unknown' END AS error_kind,
               count(*) AS n
        FROM events GROUP BY 1
    """,
    "a1_ordered_concat": """
        SELECT user_id, string_agg(event_type, '|' ORDER BY event_id) AS type_seq
        FROM events GROUP BY user_id
    """,
    "a4_pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
               CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
                    AS DECIMAL(28,4))) AS DOUBLE) AS sum_disc_price,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
    """,
    "a6_distinct_pairs": "SELECT DISTINCT lang, source FROM documents",
    "a9_max_by": """
        SELECT user_id, max_by(event_type, event_id) AS last_type,
               CAST(max(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS max_value
        FROM events GROUP BY user_id
    """,
    "j2_join_agg": """
        SELECT c_mktsegment, count(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment
    """,
    "j4_resume_antijoin": """
        SELECT c_custkey, c_name FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM events e WHERE e.user_id = c.c_custkey)
    """,
    "j1_range_join": """
        SELECT o_orderpriority, count(*) AS n_late_lines
        FROM lineitem JOIN orders
          ON l_orderkey = o_orderkey AND l_shipdate > o_orderdate
        GROUP BY o_orderpriority
    """,
    "j6_asof_join": """
        WITH l AS (SELECT event_id, user_id, ts AS l_ts FROM events
                   WHERE event_id % 2 = 1),
             r AS (SELECT user_id, ts AS r_ts, event_id AS r_event_id,
                          value AS r_value FROM events WHERE event_id % 2 = 0)
        SELECT l.event_id, l.user_id, r.r_event_id, r.r_value
        FROM l ASOF JOIN r
          ON l.user_id = r.user_id AND l.l_ts >= r.r_ts
    """,
    "w2_topk_per_group": """
        SELECT l_orderkey, l_linenumber, l_extendedprice, rk FROM (
          SELECT l_orderkey, l_linenumber, l_extendedprice,
                 row_number() OVER (PARTITION BY l_orderkey
                                    ORDER BY l_extendedprice DESC, l_linenumber ASC) AS rk
          FROM lineitem) WHERE rk <= 3
    """,
    "w3_sessionize": """
        WITH g AS (
          SELECT user_id, event_id, epoch_ms(ts) AS ms,
                 epoch_ms(ts) - lag(epoch_ms(ts)) OVER
                   (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id) AS gap
          FROM events)
        SELECT user_id,
               CAST(SUM(CASE WHEN gap IS NULL OR gap > 1800000 THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions,
               count(*) AS n_events
        FROM g GROUP BY user_id
    """,
}

ORACLES["j3_shipping_priority"] = """
    SELECT o_orderkey, o_orderpriority,
           CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
                AS DECIMAL(28,4))) AS DOUBLE) AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    WHERE c_mktsegment = 'BUILDING'
    GROUP BY o_orderkey, o_orderpriority
    ORDER BY revenue DESC, o_orderkey ASC
    LIMIT 10
"""
ORACLES["j5_nation_revenue"] = """
    SELECT n_name,
           CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
                AS DECIMAL(28,4))) AS DOUBLE) AS revenue,
           count(*) AS n_lines
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
    GROUP BY n_name
"""
ORACLES["f8_json_extract"] = """
    SELECT event_type,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
           count(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS k_present,
           count(*) AS n
    FROM events GROUP BY event_type
"""
ORACLES["a11_rollup"] = """
    SELECT lang, source, count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS chars,
           CAST(GROUPING(lang) * 2 + GROUPING(source) AS INT) AS lvl
    FROM documents GROUP BY ROLLUP(lang, source)
"""
ORACLES["a13_pivot_counts"] = """
    SELECT user_id,
           CAST(SUM(CASE WHEN event_type = 'click'    THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
           CAST(SUM(CASE WHEN event_type = 'view'     THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
           CAST(SUM(CASE WHEN event_type = 'signup'   THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
           CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
           CAST(SUM(CASE WHEN event_type = 'error'    THEN 1 ELSE 0 END) AS BIGINT) AS n_error
    FROM events GROUP BY user_id
"""
ORACLES["u1_union_except"] = """
    SELECT k FROM (
      SELECT c_custkey AS k FROM customer
      UNION
      SELECT s_suppkey AS k FROM supplier)
    EXCEPT
    SELECT user_id AS k FROM events
"""
ORACLES["w4_sort_limit"] = """
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10
"""
ORACLES["f5_format_string"] = """
    SELECT doc_id,
           printf('--- Page %d --- [%s]', (doc_id % 30) + 1, lang) AS page_header
    FROM documents
"""

QUERIES = {
    "f8_json_extract": f8_json_extract,
    "a11_rollup": a11_rollup,
    "a12_approx_distinct": a12_approx_distinct,
    "a12b_distinct_parts": a12b_distinct_parts,
    "a13_pivot_counts": a13_pivot_counts,
    "j3_shipping_priority": j3_shipping_priority,
    "j5_nation_revenue": j5_nation_revenue,
    "u1_union_except": u1_union_except,
    "w4_sort_limit": w4_sort_limit,
    "f5_format_string": f5_format_string,
    "p1_filter_project": p1_filter_project,
    "p2_regex_extract": p2_regex_extract,
    "p7_watermark_clean": p7_watermark_clean,
    "p8_confidence_score": p8_confidence_score,
    "p9_error_classify": p9_error_classify,
    "a1_ordered_concat": a1_ordered_concat,
    "a4_pricing_summary": a4_pricing_summary,
    "a6_distinct_pairs": a6_distinct_pairs,
    "a9_max_by": a9_max_by,
    "j2_join_agg": j2_join_agg,
    "j4_resume_antijoin": j4_resume_antijoin,
    "j1_range_join": j1_range_join,
    "j6_asof_join": j6_asof_join,
    "w2_topk_per_group": w2_topk_per_group,
    "w3_sessionize": w3_sessionize,
}
