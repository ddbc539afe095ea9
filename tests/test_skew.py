"""Skew-salted aggregation correctness (result identical to plain groupBy)."""

from pyspark.sql import functions as F

from sparkh3.operators import skew


def test_salted_count_matches_plain(spark):
    # heavy skew: 90% of rows on one key
    df = spark.range(0, 5000).withColumn(
        "cell",
        F.when(F.col("id") % 10 < 9, F.lit("hot")).otherwise(
            F.concat(F.lit("c"), (F.col("id") % 50).cast("string"))
        ),
    ).withColumn("v", F.col("id") % 7)
    got = skew.salted_cell_count(df, "cell", value_col="v", n_salt=8)
    plain = df.groupBy("cell").agg(
        F.count("*").alias("n"), F.sum("v").alias("sum_v")
    )
    j = got.join(plain.withColumnRenamed("n", "n2").withColumnRenamed("sum_v", "s2"), "cell", "full")
    bad = j.filter(
        (F.col("n") != F.col("n2")) | (F.col("sum_v") != F.col("s2"))
    ).count()
    assert bad == 0
    assert got.count() == plain.count()


def test_hot_key_detection(spark):
    df = spark.range(0, 20000).withColumn(
        "cell",
        F.when(F.col("id") % 5 < 4, F.lit("mega")).otherwise(
            (F.col("id") % 1000).cast("string")
        ),
    )
    hot = skew.detect_hot_keys(df, "cell", sample_fraction=0.2)
    assert "mega" in hot


def test_single_dominant_key_detected(spark):
    from sparkh3.operators.skew import detect_hot_keys

    df = spark.createDataFrame(
        [("hot",)] * 2000, "cell string"
    )
    assert detect_hot_keys(df, "cell", sample_fraction=1.0) == ["hot"]


def test_identical_rows_spread_across_salts(spark):
    """Skewed data is duplicate-heavy; a content-hash salt put every
    identical row in ONE bucket (no spreading at all)."""
    from pyspark.sql import functions as F

    from sparkh3.operators.skew import salted_cell_count

    df = spark.createDataFrame(
        [("hot", 1)] * 800, "cell string, v long"
    ).repartition(8)
    out = salted_cell_count(df, "cell", "v", hot_keys=["hot"])
    row = out.collect()[0]
    assert (row.n, row.sum_v) == (800, 800)
    # inspect the partial stage directly: >1 distinct salt bucket
    salted = df.withColumn(
        "_salt",
        F.pmod(F.monotonically_increasing_id(), F.lit(16)),
    )
    assert salted.select("_salt").distinct().count() > 1
