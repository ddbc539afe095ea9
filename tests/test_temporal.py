"""As-of join and sessionization (operators/temporal.py) vs brute force."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from sparkh3.operators import temporal


def _ts(m):
    return dt.datetime(2024, 1, 1) + dt.timedelta(minutes=m)


class TestAsofJoin:
    def _data(self, spark):
        left = spark.createDataFrame(
            [(1, 1, _ts(10)), (2, 1, _ts(30)), (3, 2, _ts(5)), (4, 3, _ts(50))],
            "lid long, k long, ts timestamp",
        )
        right = spark.createDataFrame(
            [(101, 1, _ts(10), 1.0), (102, 1, _ts(20), 2.0),
             (103, 2, _ts(7), 3.0), (104, 9, _ts(1), 4.0)],
            "rid long, k long, ts timestamp, v double",
        )
        return left, right

    def test_inner_with_tie(self, spark):
        left, right = self._data(spark)
        out = {
            r.lid: (r.rid, r.v)
            for r in temporal.asof_join(
                left, right, on="k", value_cols=["rid", "v"]
            ).collect()
        }
        # lid1 ties ts(10) -> rid101; lid2 -> latest <= ts(30) = rid102;
        # lid3 (k=2, ts5) has no prior view -> dropped; lid4 key absent
        assert out == {1: (101, 1.0), 2: (102, 2.0)}

    def test_left_keeps_unmatched(self, spark):
        left, right = self._data(spark)
        out = {
            r.lid: r.rid
            for r in temporal.asof_join(
                left, right, on="k", value_cols=["rid", "v"], how="left"
            ).collect()
        }
        assert out == {1: 101, 2: 102, 3: None, 4: None}

    def test_validation(self, spark):
        left, right = self._data(spark)
        with pytest.raises(ValueError, match="how"):
            temporal.asof_join(left, right, on="k", how="outer")
        with pytest.raises(ValueError, match="collide"):
            temporal.asof_join(
                left, right.withColumnRenamed("rid", "lid"), on="k"
            )
        # a left column named like an internal working column would
        # alias-collide and corrupt the carry window — rejected up front
        with pytest.raises(ValueError, match="reserved"):
            temporal.asof_join(
                left.withColumnRenamed("lid", "_vrow"), right, on="k"
            )
        with pytest.raises(ValueError, match="_rts"):
            temporal.asof_join(
                left,
                right.withColumnRenamed("v", "_rts"),
                on="k",
                value_cols=["rid", "_rts"],
            )


class TestSessionize:
    def test_gaps_and_sequence(self, spark):
        ev = spark.createDataFrame(
            [(1, 1, _ts(0)), (2, 1, _ts(10)), (3, 1, _ts(60)),
             (4, 1, _ts(65)), (5, 2, _ts(0))],
            "event_id long, user_id long, ts timestamp",
        )
        out = temporal.sessionize(
            ev, gap_seconds=1800, order_tiebreak="event_id"
        )
        seqs = {r.event_id: r.session_seq for r in out.collect()}
        # user 1: events at 0,10 (session 1), 60,65 (gap 50min -> session 2)
        assert seqs == {1: 1, 2: 1, 3: 2, 4: 2, 5: 1}
        with pytest.raises(ValueError):
            temporal.sessionize(ev, gap_seconds=0)


class TestAsofReviewRegressions:
    def test_null_values_carry_atomically(self, spark):
        """A right row with NULL value columns must match as itself —
        never stitch values from an older right row."""
        left = spark.createDataFrame(
            [(1, 1, _ts(30))], "lid long, k long, ts timestamp"
        )
        right = spark.createDataFrame(
            [(101, 1, _ts(10), 1.0), (102, 1, _ts(20), None)],
            "rid long, k long, ts timestamp, v double",
        )
        out = temporal.asof_join(
            left, right, on="k", value_cols=["rid", "v"]
        ).collect()
        assert len(out) == 1
        assert out[0].rid == 102 and out[0].v is None

    def test_all_null_right_row_still_inner_matches(self, spark):
        left = spark.createDataFrame(
            [(1, 1, _ts(30))], "lid long, k long, ts timestamp"
        )
        right = spark.createDataFrame(
            [(1, _ts(10), None)], "k long, ts timestamp, v double"
        )
        out = temporal.asof_join(
            left, right, on="k", value_cols=["v"]
        ).collect()
        assert len(out) == 1 and out[0].v is None

    def test_equal_ts_tiebreak_deterministic(self, spark):
        left = spark.createDataFrame(
            [(1, 1, _ts(30))], "lid long, k long, ts timestamp"
        )
        right = spark.createDataFrame(
            [(101, 1, _ts(20), 1.0), (102, 1, _ts(20), 2.0)],
            "rid long, k long, ts timestamp, v double",
        )
        for _ in range(3):
            out = temporal.asof_join(
                left, right, on="k",
                value_cols=["rid", "v"], right_tiebreak="rid",
            ).collect()
            assert out[0].rid == 102 and out[0].v == 2.0


class TestEdgeUdfMixedRes:
    def test_mixed_resolution_batch(self, spark):
        import numpy as np

        from sparkh3 import functions as H3F
        from sparkh3.kernel import geo as kgeo
        from sparkh3.kernel import traversal as tv

        c7 = kgeo.latlng_to_cell(np.array([35.0]), np.array([139.0]), 7)[0]
        c9 = kgeo.latlng_to_cell(np.array([52.0]), np.array([13.0]), 9)[0]
        d7 = tv.edge_destination(tv.origin_to_directed_edges(c7)[:1])[0]
        d9 = tv.edge_destination(tv.origin_to_directed_edges(c9)[:1])[0]
        df = spark.createDataFrame(
            [(int(np.int64(c7)), int(np.int64(d7))),
             (int(np.int64(c9)), int(np.int64(d9)))],
            "o long, d long",
        )
        rows = (
            df.withColumn("e", H3F.cells_to_edge_udf()(F.col("o"), F.col("d")))
            .withColumn("d2", H3F.edge_destination_udf()(F.col("e")))
            .collect()
        )
        for r in rows:
            assert r.e is not None and r.d2 == r.d


class TestHotKey:
    """The documented skew boundary of the one-partition-per-key window
    construction: a single hot key holding ~10^6 rows must COMPLETE and
    stay correct (it serializes into one task by design — these tests
    pin that the shape degrades in wall-clock only, not in correctness)."""

    def test_sessionize_hot_key_1m(self, spark):
        n = 1_000_000
        jump = 100_000
        # one hot key; events 1s apart with a 1000s gap every `jump`
        # rows -> exactly n/jump sessions of `jump` events each
        e = (
            spark.range(n)
            .select(
                F.lit(1).alias("user_id"),
                F.timestamp_micros(
                    (F.col("id") + (F.col("id") / jump).cast("long") * 1000)
                    * 1_000_000
                ).alias("ts"),
            )
        )
        out = temporal.sessionize(e, key="user_id", ts_col="ts", gap_seconds=10)
        agg = (
            out.groupBy("session_seq")
            .count()
            .orderBy("session_seq")
            .collect()
        )
        assert len(agg) == n // jump
        assert all(r["count"] == jump for r in agg)

    def test_asof_hot_key_500k(self, spark):
        n = 500_000
        left = spark.range(n).select(
            F.col("id").alias("lid"),
            F.lit(1).alias("k"),
            F.timestamp_micros(F.col("id") * 1_000_000).alias("ts"),
        )
        right = spark.createDataFrame(
            [(1, i * 100_000, float(i)) for i in range(5)],
            "k long, sec long, v double",
        ).select("k", F.timestamp_micros(F.col("sec") * 1_000_000).alias("ts"), "v")
        out = temporal.asof_join(left, right, on="k", value_cols=["v"])
        assert out.count() == n
        # each left row matches the floor(sec/100k) right row
        bad = out.filter(
            F.col("v") != (F.col("lid") / 100_000).cast("long").cast("double")
        ).count()
        assert bad == 0


class TestTimeRollup:
    def test_hour_day_chain(self, spark):
        base = dt.datetime(2024, 1, 1, 0, 0, 0)
        rows = [
            # two events in hour 0, one in hour 1 (same day), one next day
            (1, base + dt.timedelta(minutes=5), "a", 1.0),
            (2, base + dt.timedelta(minutes=50), "a", 2.0),
            (3, base + dt.timedelta(hours=1, minutes=1), "a", 4.0),
            (4, base + dt.timedelta(days=1, minutes=1), "a", 8.0),
        ]
        ev = spark.createDataFrame(
            rows, "event_id long, ts timestamp, event_type string, value double"
        )
        out = temporal.time_rollup(
            ev, {"hour": 3_600_000_000, "day": 86_400_000_000}
        )
        got = {
            (r.grain, r.bucket_us): (r.n_events, r.sum_value)
            for r in out.collect()
        }
        day0 = 1704067200 * 1_000_000
        hour = 3_600_000_000
        assert got[("hour", day0)] == (2, 3.0)
        assert got[("hour", day0 + hour)] == (1, 4.0)
        assert got[("day", day0)] == (3, 7.0)
        assert got[("day", day0 + 24 * hour)] == (1, 8.0)

    def test_validation(self, spark):
        ev = spark.createDataFrame(
            [], "event_id long, ts timestamp, event_type string, value double"
        )
        with pytest.raises(ValueError, match="nest"):
            temporal.time_rollup(ev, {"h": 3_600_000_000, "x": 5_000_000_000})
        with pytest.raises(ValueError, match="at least one"):
            temporal.time_rollup(ev, {})

    def test_coarse_grain_reuses_hourly_exchange(self, spark):
        """The day branch re-aggregates the hourly AGGREGATE — at
        runtime AQE reuses the hourly shuffle (ReusedExchange), so the
        raw event stream is bucketed once."""
        ev = spark.read.parquet(
            "/root/testdata/sf0.001/events.parquet"
        )
        out = temporal.time_rollup(
            ev, {"hour": 3_600_000_000, "day": 86_400_000_000}
        )
        out.collect()
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert plan.count("ReusedExchange") >= 1, plan


class TestHoppingRollup:
    def test_overlapping_membership(self, spark):
        base = dt.datetime(2024, 1, 1, 0, 0, 0)
        rows = [
            # 00:05 -> windows starting 00:00 and 23:30 (prev day)
            (1, base + dt.timedelta(minutes=5), "a", 1.0),
            # 00:40 -> windows starting 00:30 and 00:00
            (2, base + dt.timedelta(minutes=40), "a", 2.0),
        ]
        ev = spark.createDataFrame(
            rows, "event_id long, ts timestamp, event_type string, value double"
        )
        out = temporal.hopping_rollup(
            ev, width_us=3_600_000_000, slide_us=1_800_000_000
        )
        got = {
            r.window_start_us: (r.n_events, r.sum_value)
            for r in out.collect()
        }
        day0 = 1704067200 * 1_000_000
        half = 1_800_000_000
        assert got[day0] == (2, 3.0)           # both inside [00:00, 01:00)
        assert got[day0 - half] == (1, 1.0)    # only 00:05 in [23:30, 00:30)
        assert got[day0 + half] == (1, 2.0)    # only 00:40 in [00:30, 01:30)
        # every event appears in exactly width/slide = 2 windows
        assert sum(n for n, _ in got.values()) == 2 * len(rows)

    def test_degenerates_to_tumbling_when_slide_equals_width(self, spark):
        ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        hop = temporal.hopping_rollup(
            ev, width_us=3_600_000_000, slide_us=3_600_000_000
        )
        tum = temporal.time_rollup(ev, {"hour": 3_600_000_000}).select(
            F.col("bucket_us").alias("window_start_us"),
            "key",
            "n_events",
            "sum_value",
        )
        assert sorted(map(tuple, hop.collect())) == sorted(
            map(tuple, tum.collect())
        )

    def test_validations(self, spark):
        ev = spark.createDataFrame(
            [], "event_id long, ts timestamp, event_type string, value double"
        )
        with pytest.raises(ValueError, match="multiple"):
            temporal.hopping_rollup(ev, width_us=100, slide_us=33)
        with pytest.raises(ValueError, match="positive"):
            temporal.hopping_rollup(ev, width_us=0, slide_us=1)


class TestFunnel:
    def _ev(self, spark, rows):
        return spark.createDataFrame(
            [
                (u, t, dt.datetime(2024, 1, 1) + dt.timedelta(minutes=m))
                for u, t, m in rows
            ],
            "user_id long, event_type string, ts timestamp",
        )

    def test_first_touch_ordering(self, spark):
        ev = self._ev(
            spark,
            [
                (1, "a", 0), (1, "b", 10), (1, "c", 20),   # full funnel
                (2, "b", 0), (2, "a", 5),                  # b BEFORE a: no step 2
                (3, "a", 0), (3, "c", 5),                  # skips b: stops at 1
                (4, "b", 0),                               # never did a
            ],
        )
        got = {
            r.step_name: r.n_users
            for r in temporal.funnel(ev, ["a", "b", "c"]).collect()
        }
        assert got == {"a": 3, "b": 1, "c": 1}

    def test_within_bound_and_first_touch_pin(self, spark):
        # user 1's FIRST 'a' is at t=0; the later a@40 must NOT re-arm
        # the window for b@45 (first-touch semantics)
        ev = self._ev(
            spark,
            [(1, "a", 0), (1, "a", 40), (1, "b", 45), (2, "a", 0), (2, "b", 5)],
        )
        got = {
            r.step_name: r.n_users
            for r in temporal.funnel(
                ev, ["a", "b"], within_us=10 * 60 * 1_000_000
            ).collect()
        }
        assert got == {"a": 2, "b": 1}

    def test_validations(self, spark):
        ev = self._ev(spark, [])
        with pytest.raises(ValueError, match="at least one"):
            temporal.funnel(ev, [])
        with pytest.raises(ValueError, match="within_us"):
            temporal.funnel(ev, ["a"], within_us=0)


class TestIntervalJoin:
    def _events(self, spark, n=200):
        return spark.createDataFrame(
            [(i, dt.datetime(2024, 1, 1) + dt.timedelta(minutes=17 * i))
             for i in range(n)],
            "event_id long, ts timestamp_ntz",
        )

    def _intervals(self, spark):
        base = int(dt.datetime(2024, 1, 1).timestamp() * 0)  # NTZ epoch math below
        # NTZ epoch-us of 2024-01-01 00:00:00
        ntz_us = int(
            (dt.datetime(2024, 1, 1) - dt.datetime(1970, 1, 1)).total_seconds()
        ) * 1_000_000 + base
        rows = [
            (j, ntz_us + j * 7_200_000_000, ntz_us + j * 7_200_000_000 + 3_600_000_000)
            for j in range(8)
        ]
        return spark.createDataFrame(
            rows, "interval_id long, start_us long, end_us long"
        )

    def test_matches_bruteforce(self, spark):
        ev, iv = self._events(spark), self._intervals(spark)
        got = {
            (r.interval_id, r.event_id)
            for r in temporal.interval_join(ev, iv).collect()
        }
        us = temporal._epoch_us(ev, "ts")
        brute = {
            (r.interval_id, r.event_id)
            for r in ev.withColumn("_us", us)
            .crossJoin(iv)
            .filter(F.col("_us").between(F.col("start_us"), F.col("end_us")))
            .collect()
        }
        assert got == brute and len(got) > 0

    def test_no_cartesian_in_plan(self, spark):
        ev, iv = self._events(spark), self._intervals(spark)
        plan = (
            temporal.interval_join(ev, iv)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan

    def test_left_keeps_unmatched(self, spark):
        ev, iv = self._events(spark), self._intervals(spark)
        out = temporal.interval_join(ev, iv, how="left")
        n_ev = ev.count()
        matched = temporal.interval_join(ev, iv).count()
        unmatched = out.filter(F.col("interval_id").isNull()).count()
        assert out.count() == matched + unmatched
        assert unmatched == n_ev - temporal.interval_join(ev, iv).select(
            "event_id"
        ).distinct().count()

    def test_key_equality(self, spark):
        ev = self._events(spark).withColumn(
            "k", (F.col("event_id") % 2).cast("long")
        )
        iv = self._intervals(spark).withColumn(
            "k", (F.col("interval_id") % 2).cast("long")
        )
        got = temporal.interval_join(ev, iv, on="k")
        us = temporal._epoch_us(ev, "ts")
        brute = (
            ev.withColumn("_us", us)
            .crossJoin(iv.select(
                "interval_id", "start_us", "end_us",
                F.col("k").alias("_ik")))
            .filter(
                F.col("_us").between(F.col("start_us"), F.col("end_us"))
                & (F.col("k") == F.col("_ik"))
            )
        )
        assert {(r.interval_id, r.event_id) for r in got.collect()} == {
            (r.interval_id, r.event_id) for r in brute.collect()
        }
        assert "k" in got.columns and got.columns.count("k") == 1

    def test_validations(self, spark):
        ev, iv = self._events(spark), self._intervals(spark)
        with pytest.raises(ValueError, match="overlapping"):
            temporal.interval_join(
                ev.withColumn("start_us", F.lit(0)), iv
            )
        with pytest.raises(ValueError, match="inverted|null|wider"):
            temporal.interval_join(
                ev,
                spark.createDataFrame(
                    [(0, 100, 50)],
                    "interval_id long, start_us long, end_us long",
                ),
            )
        with pytest.raises(ValueError, match="wider"):
            temporal.interval_join(
                ev,
                spark.createDataFrame(
                    [(0, 0, 10**15)],
                    "interval_id long, start_us long, end_us long",
                ),
                max_buckets_per_interval=10,
            )


class TestResampleFfill:
    def test_dense_grid_and_forward_fill(self, spark):
        from datetime import datetime

        from sparkh3.operators.temporal import resample_ffill

        rows = [
            (1, datetime(2024, 1, 1, 0, 10), 2.0),
            (1, datetime(2024, 1, 1, 0, 50), 3.0),  # same bucket -> sum 5
            (1, datetime(2024, 1, 1, 3, 5), 7.0),   # 2-hour gap
            (2, datetime(2024, 1, 1, 5, 0), 1.0),
        ]
        df = spark.createDataFrame(rows, ["k", "ts", "v"])
        got = {
            (r.k, r.bucket, r.value, r.is_gap)
            for r in resample_ffill(df, "k", "ts", "v").collect()
        }
        h = 3_600_000_000
        base = int(
            datetime(2024, 1, 1).timestamp() * 0
        )  # buckets are tz-free epoch us; compute from known epoch
        t0 = 1704067200 * 1_000_000  # 2024-01-01T00:00:00Z
        assert got == {
            (1, t0, 5.0, False),
            (1, t0 + h, 5.0, True),
            (1, t0 + 2 * h, 5.0, True),
            (1, t0 + 3 * h, 7.0, False),
            (2, t0 + 5 * h, 1.0, False),
        }

    def test_single_observation_single_row(self, spark):
        from datetime import datetime

        from sparkh3.operators.temporal import resample_ffill

        df = spark.createDataFrame(
            [(9, datetime(2024, 6, 1, 12, 30), 4.5)], ["k", "ts", "v"]
        )
        out = resample_ffill(df, "k", "ts", "v").collect()
        assert len(out) == 1 and out[0].is_gap is False

    def test_step_validation(self, spark):
        from sparkh3.operators.temporal import resample_ffill

        with pytest.raises(ValueError):
            resample_ffill(None, "k", "ts", "v", step_us=0)


class TestTransitionMatrix:
    def test_counts_probs_and_tiebreak(self, spark):
        from datetime import datetime

        from sparkh3.operators.temporal import transition_matrix

        t = datetime(2024, 1, 1, 0, 0)
        t2 = datetime(2024, 1, 1, 0, 1)
        rows = [
            # user 1: a -> b -> a (b,a share ts; event_id breaks tie)
            (1, t, "a", 10),
            (1, t2, "b", 11),
            (1, t2, "a", 12),
            # user 2: a -> c
            (2, t, "a", 20),
            (2, t2, "c", 21),
        ]
        df = spark.createDataFrame(rows, ["u", "ts", "state", "eid"])
        got = {
            (r.from_state, r.to_state, r.n, r.prob)
            for r in transition_matrix(df, "u", "ts", "state", "eid").collect()
        }
        assert got == {
            ("a", "b", 1, 0.5),
            ("a", "c", 1, 0.5),
            ("b", "a", 1, 1.0),
        }

    def test_single_event_users_produce_nothing(self, spark):
        from datetime import datetime

        from sparkh3.operators.temporal import transition_matrix

        df = spark.createDataFrame(
            [(1, datetime(2024, 1, 1), "a", 1)], ["u", "ts", "state", "eid"]
        )
        assert transition_matrix(df, "u", "ts", "state", "eid").count() == 0


class TestCohortRetention:
    def test_small_matrix(self, spark):
        # users: A first day 0 (active d0, d2), B first day 0 (d0 only,
        # two events same day -> one activity row), C first day 1 (d1, d3)
        day = 86_400_000_000
        rows = [
            ("A", _ts(0)), ("A", _ts(2 * 1440)),
            ("B", _ts(5)), ("B", _ts(30)),
            ("C", _ts(1440)), ("C", _ts(3 * 1440)),
        ]
        ev = spark.createDataFrame(rows, "user_id string, ts timestamp")
        out = {
            (r.cohort_us, r.offset): r.n_users
            for r in temporal.cohort_retention(ev, width_us=day).collect()
        }
        d0 = 1704067200000000  # 2024-01-01 epoch-us
        assert out == {
            (d0, 0): 2,          # A + B cohort size
            (d0, 2): 1,          # A back on day 2
            (d0 + day, 0): 1,    # C cohort
            (d0 + day, 2): 1,    # C back on day 3 (offset 2)
        }

    def test_offset_zero_is_cohort_size(self, spark):
        ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        out = temporal.cohort_retention(ev, width_us=86_400_000_000)
        sizes = out.filter(F.col("offset") == 0).agg(
            F.sum("n_users")
        ).collect()[0][0]
        n_users = ev.select("user_id").distinct().count()
        assert sizes == n_users
        # no cell may exceed its cohort's size
        c = {r.cohort_us: r.n_users
             for r in out.filter(F.col("offset") == 0).collect()}
        for r in out.collect():
            assert r.n_users <= c[r.cohort_us]

    def test_bad_width(self, spark):
        ev = spark.createDataFrame(
            [("A", _ts(0))], "user_id string, ts timestamp"
        )
        with pytest.raises(ValueError):
            temporal.cohort_retention(ev, width_us=0)


class TestTemporalGuardrails:
    def test_asof_null_right_ts_never_matches(self, spark):
        """A null right timestamp must not carry as a 'prior' match
        (DuckDB ASOF semantics)."""
        left = spark.createDataFrame(
            [("k", _ts(10))], "k string, ts timestamp"
        )
        right = spark.createDataFrame(
            [("k", None, 111.0), ("k", _ts(20), 222.0)],
            "k string, ts timestamp, v double",
        )
        out = temporal.asof_join(left, right, "k", how="inner").collect()
        assert out == []  # only a null-ts and a LATER row exist
        out2 = temporal.asof_join(left, right, "k", how="left").collect()
        assert len(out2) == 1 and out2[0].v is None

    def test_interval_join_reserved_columns_rejected(self, spark):
        ev = spark.createDataFrame(
            [(1, _ts(0), 5)], "event_id long, ts timestamp, _b long"
        )
        iv = spark.createDataFrame(
            [(1, 0, 10**9)], "iv_id long, s long, e long"
        )
        with pytest.raises(ValueError, match="reserved"):
            temporal.interval_join(ev, iv, "ts", "s", "e")
