"""edit_distance_join: exactness vs the brute-force cross join,
short-string block coverage, and threshold edge cases."""

import pytest
from pyspark.sql import functions as F

from sparkh3.operators.fuzzy import edit_distance_join


def _brute(spark, rows, tau):
    df = spark.createDataFrame(rows, ["sid", "s"])
    a = df.select(F.col("sid").alias("id_a"), F.col("s").alias("sa"))
    b = df.select(F.col("sid").alias("id_b"), F.col("s").alias("sb"))
    return {
        (r.id_a, r.id_b, r.dist)
        for r in a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("dist", F.levenshtein("sa", "sb"))
        .filter(F.col("dist") <= tau)
        .collect()
    }


WORDS = [
    (1, "gradient descent"),
    (2, "gradient descend"),   # 2 subs? (t->d is 1 sub + len same) -> 1
    (3, "gradiant descent"),   # 1 sub
    (4, "stochastic descent"),
    (5, "grodient descent"),   # 1 sub of #1, 2 of #3
    (6, "completely different phrase"),
    (7, "abc"),                # short-gram block (d <= q*tau)
    (8, "abd"),                # dist 1 from #7
    (9, "ab"),                 # dist 1 from #7/#8
    (10, "xyz"),
    (11, ""),                  # empty string
    (12, "a"),
    (13, "gradient descent"),  # identical twin of #1 -> dist 0
    (14, "aaaa"),              # repeated grams (distinct-gram count 1)
    (15, "aaab"),
]


@pytest.mark.parametrize("tau", [0, 1, 2])
def test_matches_brute_force(spark, tau):
    df = spark.createDataFrame(WORDS, ["sid", "s"])
    got = {
        (r.id_a, r.id_b, r.dist)
        for r in edit_distance_join(df, max_dist=tau, q=2).collect()
    }
    assert got == _brute(spark, WORDS, tau)


def test_q3_matches_brute_force(spark):
    df = spark.createDataFrame(WORDS, ["sid", "s"])
    got = {
        (r.id_a, r.id_b, r.dist)
        for r in edit_distance_join(df, max_dist=2, q=3).collect()
    }
    assert got == _brute(spark, WORDS, 2)


def test_short_block_pairs_survive(spark):
    # every string here has <= q*tau distinct grams: the prefix filter
    # offers no guarantee, so these pairs MUST come from the short block
    rows = [(1, "ab"), (2, "ba"), (3, "abc"), (4, "b"), (5, "cab")]
    df = spark.createDataFrame(rows, ["sid", "s"])
    got = {
        (r.id_a, r.id_b, r.dist)
        for r in edit_distance_join(df, max_dist=2, q=2).collect()
    }
    assert got == _brute(spark, rows, 2)
    assert (1, 2, 2) in got


def test_validation():
    with pytest.raises(ValueError):
        edit_distance_join(None, max_dist=-1)
    with pytest.raises(ValueError):
        edit_distance_join(None, q=0)
