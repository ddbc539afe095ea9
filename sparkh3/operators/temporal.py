"""Temporal operators Spark's join/groupBy surface lacks as built-ins:
as-of joins and gap-based sessionization (the brief's canonical
"custom operator" examples — each expressed as a composition of native
window functions, not a UDF).

As-of join uses the union-and-carry-forward construction: tag both
sides, union, and in ONE window per key carry the right side's last
values forward onto left rows. That is a single shuffle on the join key
— the same exchange a plain equi-join would pay — instead of a range
join (O(n*m) candidate pairs) or a per-key Python loop. Sessionization
is the classic lag -> gap flag -> running-sum-of-flags window chain.
Both are exactly reproducible in standard SQL, so they carry full
DuckDB oracles (DuckDB's native ASOF JOIN gates ours).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join", "sessionize"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: list[str] | None = None,
    how: str = "inner",
) -> DataFrame:
    """For every left row, attach the right row with the largest
    ``right_ts <= left_ts`` for the same ``on`` key (DuckDB/kdb ASOF
    semantics; ties at equal ts match). ``how='inner'`` drops left rows
    with no prior right row, ``'left'`` keeps them with nulls.

    Output: all left columns + the chosen right ``value_cols``.

    100 TB shape: one exchange on the key + one window — the right
    side's values ride the same shuffle as the left rows (no broadcast
    needed, no range-join candidate blowup, no driver involvement).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how}")
    if value_cols is None:
        value_cols = [
            c for c in right.columns if c not in (on, right_ts)
        ]
    overlap = [c for c in value_cols if c in left.columns]
    if overlap:
        raise ValueError(
            f"value_cols {overlap} collide with left columns — alias them"
        )
    lhs = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_src"),
        *[F.col(c) for c in left.columns],
        *[F.lit(None).alias(f"_v_{c}") for c in value_cols],
    )
    rhs = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_src"),
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) for c in left.columns],
        *[F.col(c).alias(f"_v_{c}") for c in value_cols],
    )
    # right rows sort BEFORE left rows at equal ts so `<=` ties match
    w = (
        Window.partitionBy("_k")
        .orderBy(F.col("_ts").asc(), F.col("_src").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = lhs.unionByName(rhs)
    for c in value_cols:
        carried = carried.withColumn(
            f"_v_{c}", F.last(f"_v_{c}", ignorenulls=True).over(w)
        )
    out = carried.filter(F.col("_src") == 1).select(
        *[F.col(c) for c in left.columns],
        *[F.col(f"_v_{c}").alias(c) for c in value_cols],
    )
    if how == "inner":
        cond = None
        for c in value_cols:
            nn = F.col(c).isNotNull()
            cond = nn if cond is None else (cond | nn)
        if cond is not None:
            out = out.filter(cond)
    return out


def sessionize(
    events: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    order_tiebreak: str | None = None,
) -> DataFrame:
    """Gap-based sessions: within each key (ordered by ts), a new
    session starts when the gap from the previous event exceeds
    ``gap_seconds``. Adds ``session_seq`` (1-based per key).

    Integer microsecond arithmetic end-to-end, so session boundaries
    are bit-exact across engines. One window chain per key — no
    self-join, no UDF.
    """
    if gap_seconds <= 0:
        raise ValueError(f"gap_seconds must be positive, got {gap_seconds}")
    order = [F.col("_us").asc()]
    if order_tiebreak:
        order.append(F.col(order_tiebreak).asc())
    w = Window.partitionBy(key).orderBy(*order)
    wsum = w.rowsBetween(Window.unboundedPreceding, 0)
    gap_us = int(gap_seconds) * 1_000_000
    # tz-free epoch micros: NTZ timestamps diff against the NTZ epoch
    # (unix_micros would force a session-timezone interpretation and
    # break cross-engine boundary parity), LTZ uses unix_micros directly
    if dict(events.dtypes).get(ts_col) == "timestamp_ntz":
        us = F.expr(
            "timestampdiff(MICROSECOND, "
            f"TIMESTAMP_NTZ '1970-01-01 00:00:00', `{ts_col}`)"
        )
    else:
        us = F.unix_micros(F.col(ts_col))
    e = events.withColumn("_us", us)
    new_flag = (
        F.col("_us") - F.lag("_us", 1).over(w) > F.lit(gap_us)
    ).cast("int")
    return (
        e.withColumn("_new", F.coalesce(new_flag, F.lit(1)))
        .withColumn("session_seq", F.sum("_new").over(wsum))
        .drop("_new")
    )
