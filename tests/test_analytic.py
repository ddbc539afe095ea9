"""Skyline and fixed-point trend-fit: exactness vs brute force /
NumPy references."""

import numpy as np
import pytest

from sparkh3.operators.analytic import _frontier_indices, skyline
from sparkh3.operators.profile import group_trend_fit


def _brute_skyline(rows, n_min):
    out = []
    for a in rows:
        dominated = False
        for b in rows:
            if b is a:
                continue
            av = list(a[:n_min]) + [-v for v in a[n_min:]]
            bv = list(b[:n_min]) + [-v for v in b[n_min:]]
            if all(x <= y for x, y in zip(bv, av)) and any(
                x < y for x, y in zip(bv, av)
            ):
                dominated = True
                break
        if not dominated:
            out.append(a)
    return out


class TestFrontierKernel:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    @pytest.mark.parametrize("d", [1, 2, 3])
    def test_matches_brute_force(self, seed, d):
        rng = np.random.RandomState(seed)
        vals = rng.randint(0, 12, size=(300, d)).astype(np.float64)
        got = set(map(int, _frontier_indices(vals)))
        want = set()
        for i in range(len(vals)):
            le = (vals <= vals[i]).all(axis=1)
            lt = (vals < vals[i]).any(axis=1)
            if not (le & lt).any():
                want.add(i)
        assert got == want

    def test_duplicates_all_kept_and_chunk_boundaries(self):
        # more duplicates than one chunk, all on the frontier
        vals = np.zeros((1300, 2))
        vals[1200:] = [5.0, 5.0]  # dominated block
        got = _frontier_indices(vals)
        assert sorted(got) == list(range(1200))

    def test_empty(self):
        assert _frontier_indices(np.empty((0, 2))).size == 0


class TestSkyline:
    def test_two_criteria_vs_brute(self, spark):
        rows = [
            (1, 10.0, 5),
            (2, 10.0, 5),   # duplicate frontier point -> both kept
            (3, 12.0, 7),
            (4, 11.0, 7),   # dominates 3
            (5, 9.0, 1),
            (6, 13.0, 2),   # dominated by 3/4/5? price high, size low
            (7, 9.0, 5),    # dominates 1/2/5
        ]
        df = spark.createDataFrame(rows, ["id", "price", "size"])
        got = {
            r.id
            for r in skyline(
                df, minimize=["price"], maximize=["size"]
            ).collect()
        }
        want = set()
        for rid, p, s in rows:
            dominated = any(
                bp <= p and bs >= s and (bp < p or bs > s)
                for bid, bp, bs in rows
                if bid != rid
            )
            if not dominated:
                want.add(rid)
        assert got == want

    def test_random_matches_not_exists(self, spark):
        rng = np.random.RandomState(7)
        rows = [
            (i, float(rng.randint(0, 30)), int(rng.randint(0, 30)))
            for i in range(400)
        ]
        df = spark.createDataFrame(rows, ["id", "a", "b"]).repartition(7)
        got = {
            r.id for r in skyline(df, minimize=["a", "b"]).collect()
        }
        vals = np.array([[r[1], r[2]] for r in rows])
        want = set()
        for i in range(len(rows)):
            le = (vals <= vals[i]).all(axis=1)
            lt = (vals < vals[i]).any(axis=1)
            if not (le & lt).any():
                want.add(rows[i][0])
        assert got == want

    def test_validation(self, spark):
        df = spark.createDataFrame([(1, 2.0)], ["id", "x"])
        with pytest.raises(ValueError):
            skyline(df)
        with pytest.raises(ValueError):
            skyline(df, minimize=["nope"])


class TestTrendFit:
    def test_matches_numpy_lstsq(self, spark):
        xs = list(range(20))
        ys = [3 * x + 7 + ((x * 37) % 5 - 2) for x in xs]
        df = spark.createDataFrame(
            [("g", x, y) for x, y in zip(xs, ys)], ["g", "x", "y"]
        )
        row = group_trend_fit(df, "g", "x", "y").collect()[0]
        slope, intercept = np.polyfit(xs, ys, 1)
        assert row.n == 20
        assert abs(row.slope - slope) < 1e-9
        assert abs(row.intercept - intercept) < 1e-9

    def test_degenerate_group_null(self, spark):
        df = spark.createDataFrame(
            [("g", 5, 1), ("g", 5, 9)], ["g", "x", "y"]
        )
        row = group_trend_fit(df, "g", "x", "y").collect()[0]
        assert row.slope is None and row.intercept is None


class TestGroupZscore:
    def test_known_values(self, spark):
        from sparkh3.operators.profile import group_zscore

        # group g: values 10, 20, 30 -> mean 20, sample std 10
        df = spark.createDataFrame(
            [(1, "g", 10), (2, "g", 20), (3, "g", 30), (4, "h", 7)],
            "id long, grp string, v long",
        )
        out = {r.id: (r.z, r.is_outlier)
               for r in group_zscore(df, "v", "grp", threshold=0.5).collect()}
        assert out[1] == (-1.0, True)
        assert out[2] == (0.0, False)
        assert out[3] == (1.0, True)
        # singleton group: null z, never an outlier
        assert out[4] == (None, False)

    def test_zero_variance_group(self, spark):
        from sparkh3.operators.profile import group_zscore

        df = spark.createDataFrame(
            [(1, "g", 5), (2, "g", 5)], "id long, grp string, v long"
        )
        out = group_zscore(df, "v", "grp").collect()
        assert all(r.z is None and r.is_outlier is False for r in out)

    def test_matches_numpy(self, spark):
        from sparkh3.operators.profile import group_zscore

        rng = np.random.RandomState(7)
        vals = rng.randint(0, 1000, size=200).tolist()
        df = spark.createDataFrame(
            [(i, "g", int(v)) for i, v in enumerate(vals)],
            "id long, grp string, v long",
        )
        out = {r.id: r.z for r in group_zscore(df, "v", "grp").collect()}
        arr = np.array(vals, dtype=np.float64)
        exp = (arr - arr.mean()) / arr.std(ddof=1)
        for i, e in enumerate(exp):
            assert abs(out[i] - round(e, 6)) < 2e-6


class TestSkylineNulls:
    def test_null_criterion_incomparable(self, spark):
        """A NULL criterion value is incomparable (SQL NOT EXISTS
        three-valued logic): the row is kept and never dominates."""
        from sparkh3.operators.analytic import skyline

        df = spark.createDataFrame(
            [(1, 1.0, 1.0), (2, None, 0.5), (3, 2.0, 2.0)],
            "id long, a double, b double",
        )
        ids = {r.id for r in skyline(df, minimize=["a", "b"]).collect()}
        # row 3 dominated by row 1; row 2 incomparable (null a) -> kept
        assert ids == {1, 2}


class TestProfileGuardrails:
    def test_trend_fit_large_group_no_overflow(self, spark):
        """Closing products run in exact decimal: int64 products
        (n*Σxy etc.) would silently wrap for large groups."""
        import numpy as np

        from sparkh3.operators.profile import group_trend_fit

        n = 5000
        xs = np.arange(n) % 720
        ys = 1000 * xs + 500_000  # exact linear, large y
        df = spark.createDataFrame(
            [("g", int(x), int(y)) for x, y in zip(xs, ys)],
            "g string, x long, y long",
        )
        row = group_trend_fit(df, "g", "x", "y").collect()[0]
        assert row.slope == 1000.0 and row.intercept == 500000.0

    def test_zscore_null_group_rows_survive(self, spark):
        from sparkh3.operators.profile import group_zscore

        df = spark.createDataFrame(
            [(1, None, 10), (2, None, 20), (3, "g", 7)],
            "id long, grp string, v long",
        )
        out = {r.id: (r.z, r.is_outlier)
               for r in group_zscore(df, "v", "grp", 0.5).collect()}
        assert len(out) == 3  # null-group rows NOT dropped
        assert out[1][0] is not None  # standardized within null group
        assert out[3] == (None, False)  # singleton
