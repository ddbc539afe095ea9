"""Model-based quality filtering: a distributed logistic-regression
classifier over hashed token features — the "train a small linear
classifier on a trusted corpus, score the crawl" pass (GPT-3/LLaMA-style
quality filters, fastText-ish feature hashing), expressed relationally.

The model is a fixed-width weight vector (the feature-hashing trick caps
the vocabulary at ``n_features`` buckets), trained by full-batch gradient
descent where EVERY iteration is two partial-aggregated shuffles over an
id-and-bucket-only pair list:

  margins:  pairs ⋈ broadcast(weights)  → groupBy(doc)    sum
  gradient: pairs ⋈ residuals(doc)      → groupBy(bucket)  avg

Document text is touched exactly once (tokenize → hash → count, then
localCheckpoint); the weight vector (n_features floats) is a driver-held
dimension table, broadcast each round — the same discipline as the IVF
codebook. No Python UDF anywhere; at 100 TB each iteration is the same
join profile as BM25 scoring.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sparkh3.operators.textops import tokens


def hashed_token_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_features: int = 1024,
) -> DataFrame:
    """(id, bucket, cnt, n_tok) hashed bag-of-words rows: tokens map to
    ``xxhash64 mod n_features`` buckets, counts are L1-normalized at
    scoring time via n_tok (length invariance). Non-negative pmod via
    ((h % n) + n) % n — portable arithmetic."""
    n = F.lit(int(n_features))
    ex = df.select(
        F.col(id_col).alias("_id"),
        F.explode(tokens(F.col(text_col))).alias("_tok"),
    ).withColumn("_b", ((F.xxhash64("_tok") % n) + n) % n)
    counts = ex.groupBy("_id", "_b").agg(F.count("*").alias("_cnt"))
    totals = ex.groupBy("_id").agg(F.count("*").alias("_ntok"))
    return counts.join(totals, "_id").select(
        F.col("_id"), F.col("_b"), F.col("_cnt"), F.col("_ntok")
    )


def _weights_df(spark, w: list[float]) -> DataFrame:
    return spark.createDataFrame(
        [(i, float(x)) for i, x in enumerate(w)], "_b long, _w double"
    )


def logreg_train(
    df: DataFrame,
    label_col: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_features: int = 1024,
    iters: int = 20,
    lr: float = 2.0,
    l2: float = 1e-4,
) -> dict:
    """Full-batch logistic regression on hashed token features.
    ``label_col`` must be 0/1 (int or boolean). Returns
    ``{"weights": [...], "bias": float, "n_features": int}`` — a plain
    dict, serializable next to a manifest table.

    Deterministic up to floating-point summation order (Spark partial
    aggregates); the decision DIRECTION is stable, exact scores can
    differ in the last ulps run-to-run."""
    if iters < 1:
        raise ValueError("iters must be >= 1")
    spark = df.sparkSession
    # null-text docs produce no token pairs, so they would drop out of
    # the margins while still inflating n_docs — exclude them from the
    # TRAINING population entirely (scoring still handles them:
    # bias-only margin)
    df = df.filter(F.col(text_col).isNotNull())
    labeled = df.select(
        F.col(id_col).alias("_id"),
        F.col(label_col).cast("double").alias("_y"),
    ).filter(F.col("_y").isNotNull())
    pairs = (
        hashed_token_pairs(df, text_col, id_col, n_features)
        .withColumn("_x", F.col("_cnt").cast("double") / F.col("_ntok"))
        .join(labeled, "_id")
        .select("_id", "_b", "_x", "_y")
        # the pair list feeds every GD round twice — materialize once
        .localCheckpoint(eager=True)
    )
    n_docs = labeled.count()
    if n_docs == 0:
        raise ValueError("no labeled rows")
    w = [0.0] * int(n_features)
    bias = 0.0
    for _ in range(int(iters)):
        wdf = _weights_df(spark, w)
        margins = (
            pairs.join(F.broadcast(wdf), "_b")
            .groupBy("_id", "_y")
            .agg((F.sum(F.col("_x") * F.col("_w")) + F.lit(bias)).alias("_m"))
        )
        resid = margins.select(
            "_id",
            (F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("_m"))) - F.col("_y"))
            .alias("_r"),
        )
        grad_rows = (
            pairs.join(resid, "_id")
            .groupBy("_b")
            .agg((F.sum(F.col("_x") * F.col("_r")) / F.lit(n_docs)).alias("_g"))
            .collect()
        )
        gbias = (
            resid.agg((F.sum("_r") / F.lit(n_docs)).alias("_g")).collect()[0][
                "_g"
            ]
        )
        for r in grad_rows:
            j = int(r["_b"])
            w[j] -= lr * (float(r["_g"]) + l2 * w[j])
        bias -= lr * float(gbias)
    return {"weights": w, "bias": bias, "n_features": int(n_features)}


def logreg_score(
    df: DataFrame,
    model: dict,
    text_col: str = "text",
    id_col: str = "doc_id",
    score_col: str = "quality_prob",
    decimals: int = 6,
) -> DataFrame:
    """Score documents with a trained model: (id_col, score_col) with
    sigmoid probabilities. One tokenize pass + one broadcast join +
    one per-doc aggregate; docs whose every token hashes to a
    zero-weight bucket still score (sigmoid(bias))."""
    spark = df.sparkSession
    pairs = hashed_token_pairs(
        df, text_col, id_col, model["n_features"]
    ).withColumn("_x", F.col("_cnt").cast("double") / F.col("_ntok"))
    wdf = _weights_df(spark, model["weights"])
    bias = float(model["bias"])
    margins = (
        pairs.join(F.broadcast(wdf), "_b")
        .groupBy("_id")
        .agg((F.sum(F.col("_x") * F.col("_w")) + F.lit(bias)).alias("_m"))
    )
    # left join: docs with no tokens at all keep the bias-only score
    base = df.select(F.col(id_col).alias("_id")).distinct()
    return (
        base.join(margins, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            F.round(
                F.lit(1.0)
                / (
                    F.lit(1.0)
                    + F.exp(-F.coalesce(F.col("_m"), F.lit(bias)))
                ),
                decimals,
            ).alias(score_col),
        )
    )
