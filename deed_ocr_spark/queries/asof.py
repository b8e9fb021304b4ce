"""As-of join: for each left row, the most recent right row at or before
its timestamp, per key.

A classic time-series operator Spark lacks natively (the task's custom-
operator example list names it). The naive formulation — a range join
``l.ts >= r.ts`` + max-per-group — explodes to O(|L|·|R|) per key before
aggregation kills it. This implementation is the scalable union-marker
form:

1. union left (marker 1) and right (marker 0) rows on the join key,
2. one shuffle: window per key ordered by (ts, marker),
3. ``last(payload_struct, ignorenulls=True)`` over UNBOUNDED
   PRECEDING..CURRENT carries the latest right ROW (atomically — payload
   columns never mix across right rows, even when some are null) forward
   to every later left row,
4. keep the left rows.

Cost is one exchange + one sort — the same shape as a regular shuffle
join, independent of how many right rows precede each left row, so it
survives 100x data. Ties (right.ts == left.ts) match, like DuckDB /
pandas ``merge_asof(allow_exact_matches=True)``: the marker orders right
rows before left rows at equal timestamps. A ``tolerance`` bounds how old
the matched right row may be (the match is voided when right_ts <
left_ts - tolerance).

Oracle: DuckDB's native ``ASOF JOIN`` (tests/test_asof.py) — inner and
left variants, value-equal per row on the events table.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window

_TS = "__asof_ts"
_MARK = "__asof_is_left"
_PAY = "__asof_payload"
# collision-proof struct field for the right timestamp: a payload column
# named 'ts' must not create a duplicate struct field (ambiguous m['ts'])
_RTS = "__asof_rts"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    right_cols: Sequence[str],
    how: str = "inner",
    tolerance: Optional[Column] = None,
) -> DataFrame:
    """For each left row: the latest right row with ``right_ts <= left_ts``
    per ``on`` key. ``right_cols`` are the right-side payload columns to
    carry (must not collide with left column names). ``how`` is ``inner``
    (drop left rows with no match) or ``left`` (keep them, null payload).
    ``tolerance``: a Column comparable with the timestamp difference (e.g.
    ``F.expr("INTERVAL 1 HOUR")``); matches older than ``left_ts -
    tolerance`` are voided.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how!r}")
    on = list(on)
    right_cols = list(right_cols)
    dup = set(right_cols) & set(left.columns)
    if dup:
        raise ValueError(f"right_cols collide with left columns: {sorted(dup)}")
    reserved = sorted(
        {
            c
            for c in (*right_cols, *on, *left.columns, left_ts, right_ts)
            if c.startswith("__asof_")
        }
    )
    if reserved:
        # a left column named __asof_ts would be silently overwritten by
        # the internal timestamp; __asof_valid would collide in the output
        # projection — fail fast on ANY side
        raise ValueError(f"__asof_* names are reserved: {reserved}")

    l_side = left.withColumn(_TS, F.col(left_ts)).withColumn(_MARK, F.lit(1))
    r_side = (
        right.select(*on, F.col(right_ts).alias(_TS), *right_cols)
        # the whole right row as one struct: carried atomically so a null
        # payload column in the LATEST right row is never papered over by
        # an older row's value
        .withColumn(_PAY, F.struct(F.col(_TS).alias(_RTS), *right_cols))
        .select(*on, _TS, _PAY)
        .withColumn(_MARK, F.lit(0))
    )
    unioned = l_side.unionByName(r_side, allowMissingColumns=True)

    w = (
        Window.partitionBy(*on)
        .orderBy(F.col(_TS).asc(), F.col(_MARK).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    m = F.last(_PAY, ignorenulls=True).over(w)
    valid = m.isNotNull()
    if tolerance is not None:
        valid = valid & (m[_RTS] >= F.col(_TS) - tolerance)

    left_cols = [c for c in left.columns]
    out = (
        unioned.select(
            *left_cols,
            F.col(_MARK).alias(_MARK),
            *[F.when(valid, m[c]).alias(c) for c in right_cols],
            valid.alias("__asof_valid"),
        )
        .filter(F.col(_MARK) == 1)
        .drop(_MARK)
    )
    if how == "inner":
        out = out.filter(F.col("__asof_valid"))
    return out.drop("__asof_valid")
