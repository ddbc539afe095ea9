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

__all__ = [
    "asof_join",
    "sessionize",
    "time_rollup",
    "hopping_rollup",
    "funnel",
    "interval_join",
    "resample_ffill",
    "transition_matrix",
    "cohort_retention",
]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: list[str] | None = None,
    how: str = "inner",
    right_tiebreak: str | None = None,
) -> DataFrame:
    """For every left row, attach the right row with the largest
    ``right_ts <= left_ts`` for the same ``on`` key (DuckDB/kdb ASOF
    semantics; ties at equal ts match). ``how='inner'`` drops left rows
    with no prior right row, ``'left'`` keeps them with nulls.

    Output: all left columns + the chosen right ``value_cols``. The
    right row is carried ATOMICALLY (one struct per row), so nulls
    inside value columns never stitch values from different right rows,
    and the match indicator is the row itself — a matched row whose
    values are all null still matches. ``right_tiebreak`` names a right
    column that deterministically orders right rows sharing (key, ts)
    (largest wins); without it, equal-ts right rows tie arbitrarily
    (exactly like SQL ASOF JOIN).

    100 TB shape: one exchange on the key + one window — the right
    side's values ride the same shuffle as the left rows (no broadcast
    needed, no range-join candidate blowup, no driver involvement).

    Skew boundary (documented, by design): the carry window is ONE
    partition per join key, so a single pathological key (10^9 rows on
    one key) serializes into one task — the same shape as SQL engines'
    ASOF implementations. Completion at ~10^6 rows/key is exercised by
    tests/test_temporal.py::TestHotKey; for keys far beyond that,
    pre-bucket by a coarse time range and carry each bucket's last right
    row across the boundary, or thin the right side first.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how}")
    # the union-and-carry construction reserves these working names; a
    # left column with one of them would alias-collide and corrupt the
    # window ordering — reject up front (same policy as value_cols overlap)
    reserved = ("_k", "_ts", "_src", "_tb", "_vrow")
    clash = [c for c in reserved if c in left.columns]
    if clash:
        raise ValueError(
            f"left columns {clash} collide with asof_join's reserved "
            f"working columns {reserved} — rename them first"
        )
    if value_cols is None:
        value_cols = [
            c for c in right.columns if c not in (on, right_ts)
        ]
    overlap = [c for c in value_cols if c in left.columns]
    if overlap:
        raise ValueError(
            f"value_cols {overlap} collide with left columns — alias them"
        )
    if "_rts" in value_cols:
        raise ValueError(
            "value_cols may not contain '_rts' (reserved struct field "
            "carrying the matched right timestamp)"
        )
    # the whole right row rides ONE struct (never-null for right rows:
    # the ts field guarantees that even with all value_cols null)
    row_struct = F.struct(
        F.col(right_ts).alias("_rts"),
        *[F.col(c).alias(c) for c in value_cols],
    )
    tb = (
        F.col(right_tiebreak)
        if right_tiebreak is not None
        else F.lit(0)
    )
    # a null right timestamp never matches (DuckDB/kdb ASOF semantics);
    # unfiltered it would sort nulls-first and carry as a bogus "prior"
    # row for every left row with no genuine match
    rhs = right.filter(F.col(right_ts).isNotNull()).select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_src"),
        tb.alias("_tb"),
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) for c in left.columns],
        row_struct.alias("_vrow"),
    )
    # left rows carry typed nulls for the right-side slots (_tb never
    # orders left-vs-right — _src already does)
    vrow_t = rhs.schema["_vrow"].dataType
    tb_t = rhs.schema["_tb"].dataType
    lhs = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_src"),
        F.lit(None).cast(tb_t).alias("_tb"),
        *[F.col(c) for c in left.columns],
        F.lit(None).cast(vrow_t).alias("_vrow"),
    )
    # right rows sort BEFORE left rows at equal ts so `<=` ties match;
    # _tb orders equal-ts right rows (last = largest wins)
    w = (
        Window.partitionBy("_k")
        .orderBy(F.col("_ts").asc(), F.col("_src").asc(), F.col("_tb").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = lhs.unionByName(rhs, allowMissingColumns=False).withColumn(
        "_vrow", F.last("_vrow", ignorenulls=True).over(w)
    )
    out = carried.filter(F.col("_src") == 1)
    if how == "inner":
        out = out.filter(F.col("_vrow").isNotNull())
    return out.select(
        *[F.col(c) for c in left.columns],
        *[F.col(f"_vrow.{c}").alias(c) for c in value_cols],
    )


def sessionize(
    events: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    order_tiebreak: str | None = None,
) -> DataFrame:
    """Gap-based sessions: within each key (ordered by ts), a new
    session starts when the gap from the previous event exceeds
    ``gap_seconds``. Adds ``session_seq`` (1-based per key) and
    ``ts_us`` (the event's epoch microseconds — the integer the gap
    logic ran on, kept so downstream session aggregates stay in exact
    integer arithmetic).

    One window chain per key — no self-join, no UDF. Like asof_join,
    the windows put one partition per key (see the skew-boundary note
    there; hot-key completion exercised in
    tests/test_temporal.py::TestHotKey).
    """
    if gap_seconds <= 0:
        raise ValueError(f"gap_seconds must be positive, got {gap_seconds}")
    order = [F.col("ts_us").asc()]
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
    e = events.withColumn("ts_us", us)
    new_flag = (
        F.col("ts_us") - F.lag("ts_us", 1).over(w) > F.lit(gap_us)
    ).cast("int")
    return (
        e.withColumn("_new", F.coalesce(new_flag, F.lit(1)))
        .withColumn("session_seq", F.sum("_new").over(wsum))
        .drop("_new")
    )


def _epoch_us(events: DataFrame, ts_col: str):
    """tz-free epoch microseconds (same derivation sessionize uses):
    NTZ diffs against the NTZ epoch, LTZ uses unix_micros."""
    if dict(events.dtypes).get(ts_col) == "timestamp_ntz":
        return F.expr(
            "timestampdiff(MICROSECOND, "
            f"TIMESTAMP_NTZ '1970-01-01 00:00:00', `{ts_col}`)"
        )
    return F.unix_micros(F.col(ts_col))


def time_rollup(
    events: DataFrame,
    grains_us: dict[str, int],
    key: str = "event_type",
    value_col: str = "value",
    ts_col: str = "ts",
) -> DataFrame:
    """Hierarchical time-bucket rollup (the continuous-aggregate /
    hypertable-rollup pattern): bucket events at the FINEST grain with
    pure integer arithmetic (``ts_us - ts_us % grain``, tz-free, exact
    in any engine), then derive every coarser grain by re-aggregating
    the previous grain's output — the raw stream is scanned once, each
    coarser rollup reads only the (tiny) finer aggregate. Returns
    (grain, bucket_us, key, n_events, sum_value) for every grain.

    ``grains_us`` maps grain name -> bucket width in microseconds;
    every coarser width must be an integer multiple of the finest
    (validated) so buckets nest exactly.

    100 TB shape: one shuffle on (bucket, key) at the finest grain
    (map-side partial combine); each coarser level is a shuffle over
    the previous AGGREGATE (buckets x keys rows, not events). This is
    the chained-H3-parent-rollup trick on the time axis.

    Data-model contract (shared with cohort_retention and the hopping
    rollup): timestamps are non-negative epoch-µs. ``%`` truncates
    toward zero, so a pre-1970 event would land in a right-closed,
    mislabeled bucket — floor the division upstream for such data."""
    if not grains_us:
        raise ValueError("grains_us must name at least one grain")
    items = sorted(grains_us.items(), key=lambda kv: kv[1])
    finest = items[0][1]
    if finest <= 0:
        raise ValueError("grain widths must be positive microseconds")
    for name, width in items[1:]:
        if width % finest != 0:
            raise ValueError(
                f"grain {name} ({width}) is not a multiple of the "
                f"finest grain ({finest}) — buckets would not nest"
            )
    us = _epoch_us(events, ts_col)
    name0, w0 = items[0]
    cur = (
        events.select(
            (us - us % F.lit(w0)).alias("bucket_us"), F.col(key).alias("key")
        , F.col(value_col).alias("_v"))
        .groupBy("bucket_us", "key")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("_v"), 6).alias("sum_value"),
        )
    )
    out = cur.select(F.lit(name0).alias("grain"), "*")
    for name, width in items[1:]:
        b = F.col("bucket_us") - F.col("bucket_us") % F.lit(width)
        cur = (
            cur.groupBy(b.alias("bucket_us"), "key")
            .agg(
                F.sum("n_events").alias("n_events"),
                F.round(F.sum("sum_value"), 6).alias("sum_value"),
            )
        )
        out = out.unionByName(cur.select(F.lit(name).alias("grain"), "*"))
    return out


def hopping_rollup(
    events: DataFrame,
    width_us: int,
    slide_us: int,
    key: str = "event_type",
    value_col: str = "value",
    ts_col: str = "ts",
) -> DataFrame:
    """Hopping (sliding) window aggregate — the overlapping-window
    shape `time_rollup`'s tumbling buckets cannot express (moving
    averages, trailing-hour counts refreshed every few minutes). Each
    event lands in exactly ``width_us / slide_us`` windows (validated
    integer multiple, epoch-aligned starts); window membership is pure
    integer arithmetic — ``start = (ts - ts % slide) - i*slide`` for
    hop index i — so every output row reproduces in any SQL engine
    (Spark's built-in ``F.window(slideDuration=...)`` has the same
    alignment but a struct/timestamp output; streams should use that,
    batch oracle parity uses this). Returns
    (window_start_us, key, n_events, sum_value); windows cover
    [start, start + width).

    100 TB shape: the explode fan-out is the declared width/slide
    ratio (a handful), then ONE (window, key) shuffle with map-side
    partial combine — identical profile to a tumbling rollup with
    width/slide times the rows."""
    if width_us <= 0 or slide_us <= 0:
        raise ValueError("width_us and slide_us must be positive")
    if width_us % slide_us != 0:
        raise ValueError(
            f"width_us ({width_us}) must be an integer multiple of "
            f"slide_us ({slide_us}) — otherwise windows are not "
            "epoch-alignable"
        )
    n_hops = width_us // slide_us
    us = _epoch_us(events, ts_col)
    anchor = us - us % F.lit(slide_us)
    hopped = events.select(
        anchor.alias("_anchor"),
        F.col(key).alias("key"),
        F.col(value_col).alias("_v"),
        F.explode(F.sequence(F.lit(0), F.lit(n_hops - 1))).alias("_i"),
    )
    return (
        hopped.select(
            (
                F.col("_anchor")
                - F.col("_i").cast("long") * F.lit(slide_us).cast("long")
            ).alias("window_start_us"),
            "key",
            "_v",
        )
        .groupBy("window_start_us", "key")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("_v"), 6).alias("sum_value"),
        )
    )


def funnel(
    events: DataFrame,
    steps: list[str],
    within_us: int | None = None,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Sequential conversion funnel: for each user, the EARLIEST time
    they completed step k strictly after their step-(k-1) completion
    (first-touch semantics — the canonical product-analytics funnel).
    ``within_us`` optionally bounds each step-to-step gap. Returns one
    row per step: (step, step_name, n_users) with n_users
    monotonically non-increasing.

    100 TB shape: step 1 is one (user, min ts) partial aggregate; each
    later step is ONE equi-join of the event stream against the
    previous step's |users|-row aggregate plus another partial min —
    len(steps)-1 joins total, every intermediate bounded by the user
    count, never events x events. The same chain written as SQL CTEs
    is the oracle."""
    if not steps:
        raise ValueError("steps must name at least one event type")
    if within_us is not None and within_us <= 0:
        raise ValueError(f"within_us must be positive, got {within_us}")
    us = _epoch_us(events, ts_col)
    e = events.select(
        F.col(user_col).alias("_u"),
        F.col(type_col).alias("_t"),
        us.alias("_us"),
    )
    reached = (
        e.filter(F.col("_t") == steps[0])
        .groupBy("_u")
        .agg(F.min("_us").alias("_prev"))
        .localCheckpoint(eager=True)
    )
    counts = [(1, steps[0], reached.count())]
    for k, name in enumerate(steps[1:], start=2):
        nxt = e.filter(F.col("_t") == name).join(reached, "_u")
        cond = F.col("_us") > F.col("_prev")
        if within_us is not None:
            cond = cond & (F.col("_us") - F.col("_prev") <= within_us)
        reached = (
            nxt.filter(cond)
            .groupBy("_u")
            .agg(F.min("_us").alias("_prev"))
            .localCheckpoint(eager=True)
        )
        counts.append((k, name, reached.count()))
    spark = events.sparkSession
    return spark.createDataFrame(
        counts, "step int, step_name string, n_users long"
    )


def interval_join(
    events: DataFrame,
    intervals: DataFrame,
    event_ts: str = "ts",
    start_us: str = "start_us",
    end_us: str = "end_us",
    on: str | None = None,
    bucket_us: int = 3_600_000_000,
    how: str = "inner",
    max_buckets_per_interval: int = 10_000,
) -> DataFrame:
    """Point-in-interval join: every event row matched to every
    interval row with ``start_us <= event_ts(us) <= end_us`` (inclusive
    both ends), optionally also requiring equality on ``on``.

    Spark has no native range join, and the naive expression is a
    cartesian product with a residual filter — O(|events| * |intervals|)
    candidate pairs. This operator grid-buckets time instead: each
    interval explodes to the ``bucket_us``-grid buckets it covers
    (``F.sequence`` — native, no UDF), each event maps to exactly ONE
    bucket, and the match becomes an equi-join on (bucket [, key]) with
    the exact BETWEEN residual. A (event, interval) pair can meet in at
    most one bucket — the event's — so no post-join dedup is needed.

    100 TB shape: one shuffle of each side keyed on the bucket (the
    event side's exchange is the same one an equi-join would pay);
    candidate pairs are confined to co-bucketed rows, so cost follows
    actual temporal overlap, not the cross product. Skewed buckets
    (everything in one hour) fall back to AQE skew-join handling like
    any other hot equi-key. ``max_buckets_per_interval`` bounds the
    explode fan-out (a [0, +inf) interval would otherwise enumerate the
    whole grid): intervals wider than that raise, and the right fix is
    a coarser ``bucket_us`` for that workload.

    ``how='left'`` keeps unmatched events with null interval columns.
    Column names must be disjoint across the two inputs (validated) —
    rename before joining, as with any equi-join.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how}")
    if bucket_us <= 0:
        raise ValueError("bucket_us must be positive")
    overlap = set(events.columns) & set(intervals.columns) - {on}
    if overlap:
        raise ValueError(
            f"overlapping column names {sorted(overlap)} — rename one side"
        )
    # the grid construction reserves these working names on each side —
    # a pre-existing one would be silently overwritten by withColumn and
    # returned corrupted (same policy as asof_join's reserved names)
    clash = [
        c
        for c in ("_b", "_ev_us")
        if c in events.columns or c in intervals.columns
    ]
    if clash:
        raise ValueError(
            f"columns {clash} collide with interval_join's reserved "
            "working columns ('_b', '_ev_us') — rename them first"
        )
    for c in (start_us, end_us):
        if c not in intervals.columns:
            raise ValueError(f"intervals has no column {c!r}")
    w = F.lit(int(bucket_us))
    s, e = F.col(start_us), F.col(end_us)
    bad = intervals.filter(
        s.isNull() | e.isNull() | (e < s)
        | (((e - e % w) - (s - s % w)) / w >= max_buckets_per_interval)
    ).limit(1)
    if bad.count():
        raise ValueError(
            "intervals contain null/inverted bounds or spans wider than "
            f"max_buckets_per_interval={max_buckets_per_interval} "
            f"buckets of {bucket_us}us — widen bucket_us or split them"
        )
    iv = intervals.withColumn(
        "_b", F.explode(F.sequence(s - s % w, e - e % w, w))
    )
    us = _epoch_us(events, event_ts)
    ev = events.withColumn("_ev_us", us).withColumn(
        "_b", F.col("_ev_us") - F.col("_ev_us") % w
    )
    cond = (ev["_b"] == iv["_b"]) & ev["_ev_us"].between(iv[start_us], iv[end_us])
    if on is not None:
        cond = cond & (ev[on] == iv[on])
    out = ev.join(iv, cond, how)
    return out.select(
        *[ev[c] for c in events.columns],
        *[iv[c] for c in intervals.columns if on is None or c != on],
    )


def resample_ffill(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    step_us: int = 3_600_000_000,
) -> DataFrame:
    """Regularize an irregular time series per key onto a fixed grid
    with forward fill: one row per (key, bucket) for EVERY bucket from
    the key's first to last observation, carrying the last observed
    value across gaps. Returns (key, bucket, value, is_gap).

    Stages: per-key (min, max) bucket aggregate -> sequence() + explode
    builds the dense grid (the explode fan-out is bounded by the key's
    time span over step, not by row count) -> left join the per-bucket
    aggregate (SUM of the value inside each bucket, rounded so both
    engines agree bit-for-bit) -> last(ignorenulls) window carries
    values forward. Two shuffles total (grid agg + window), both on the
    key — at 100 TB the grid never materializes wider than span/step
    rows per key, and the window state is one value. No UDF.
    """
    if step_us <= 0:
        raise ValueError(f"step_us must be positive, got {step_us}")
    us = _epoch_us(df, ts_col)
    bucketed = df.select(
        F.col(key_col).alias("_k"),
        (us - F.pmod(us, F.lit(step_us))).alias("_b"),
        F.col(value_col).alias("_v"),
    )
    obs = bucketed.groupBy("_k", "_b").agg(
        F.round(F.sum("_v"), 6).alias("_obs")
    )
    span = bucketed.groupBy("_k").agg(
        F.min("_b").alias("_lo"), F.max("_b").alias("_hi")
    )
    grid = span.select(
        "_k",
        F.explode(
            F.sequence(F.col("_lo"), F.col("_hi"), F.lit(step_us))
        ).alias("_b"),
    )
    w = (
        Window.partitionBy("_k")
        .orderBy("_b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = grid.join(obs, ["_k", "_b"], "left").select(
        F.col("_k").alias(key_col),
        F.col("_b").alias("bucket"),
        F.last("_obs", ignorenulls=True).over(w).alias("value"),
        F.col("_obs").isNull().alias("is_gap"),
    )
    return filled


def transition_matrix(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    state_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """First-order Markov transition statistics over per-key event
    sequences: for every observed (from_state, to_state) pair, the
    transition count and probability (count / all transitions leaving
    from_state). Returns (from_state, to_state, n, prob) with prob
    rounded to 6 decimals — an exact integer ratio, so engine-portable.

    One lag window per key (ordered by timestamp with a deterministic
    tiebreaker — required for cross-engine reproducibility when
    timestamps collide) + one aggregate. The window shuffles on the
    key; the aggregate state is |states|^2 rows however large the
    input.
    """
    us = _epoch_us(df, ts_col)
    w = Window.partitionBy(key_col).orderBy(us.asc(), F.col(tiebreak_col).asc())
    steps = (
        df.select(
            F.col(state_col).alias("to_state"),
            F.lag(F.col(state_col)).over(w).alias("from_state"),
        )
        .filter(F.col("from_state").isNotNull())
    )
    counts = steps.groupBy("from_state", "to_state").agg(
        F.count("*").alias("n")
    )
    totals = Window.partitionBy("from_state")
    return counts.select(
        "from_state",
        "to_state",
        "n",
        F.round(
            F.col("n").cast("double") / F.sum("n").over(totals), 6
        ).alias("prob"),
    )


def cohort_retention(
    df: DataFrame,
    width_us: int,
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Cohort retention matrix: users are cohorted by the time bucket
    of their FIRST event, and each cell counts how many of a cohort's
    users were active again `offset` buckets later. Returns
    (cohort_us, offset, n_users) where cohort_us is the cohort
    bucket's epoch-µs start; offset 0 row is the cohort size.

    Shape: (user, bucket) pairs are distinct-ed first (one hash
    aggregate — the activity set is tiny vs the raw event stream),
    the per-user first bucket comes from ONE window over that already
    deduplicated set, and the final aggregate needs no countDistinct:
    after the distinct, every (user, cohort, offset) is unique by
    construction, so a plain count(*) is the user count. Bucket math
    is exact integer floor-division of epoch-µs (decimal-backed, full
    int64 range, floors for pre-epoch data) — reproducible in any
    engine.
    """
    if width_us <= 0:
        raise ValueError(f"width_us must be positive, got {width_us}")
    us = _epoch_us(df, ts_col)
    # genuinely integral floor division (ADVICE r5): the former
    # (us / width).cast('long') routed through a double — exact only
    # below 2^53 and truncating (not flooring) for negative epochs.
    # Decimal division + floor is exact over the full int64 range and
    # matches the docstring's (and the DuckDB twin's) floor semantics;
    # for the non-negative fixture timestamps the values are identical.
    bucket = F.floor(
        us.cast("decimal(38,0)") / F.lit(int(width_us)).cast("decimal(38,0)")
    ).cast("long")
    active = df.select(
        F.col(user_col).alias("_u"),
        bucket.alias("_b"),
    ).distinct()
    w = Window.partitionBy("_u")
    offs = active.withColumn("_cb", F.min("_b").over(w))
    return (
        offs.groupBy(
            (F.col("_cb") * F.lit(int(width_us))).alias("cohort_us"),
            (F.col("_b") - F.col("_cb")).alias("offset"),
        )
        .agg(F.count("*").alias("n_users"))
    )
