"""Distributed logistic-regression quality classifier."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from sparkh3.operators import classifier


@pytest.fixture(scope="module")
def labeled(spark):
    rows = []
    for i in range(30):
        # positives carry the "premium" marker mixed with shared filler
        rows.append(
            Row(
                doc_id=i,
                text=f"premium quality prose number {i} with careful words",
                y=1,
            )
        )
        rows.append(
            Row(
                doc_id=100 + i,
                text=f"spammy junk click now number {i} with careful words",
                y=0,
            )
        )
    return spark.createDataFrame(rows)


@pytest.fixture(scope="module")
def model(labeled):
    return classifier.logreg_train(labeled, "y", n_features=256, iters=15)


class TestLogReg:
    def test_separable_corpus_separates(self, labeled, model):
        assert len(model["weights"]) == 256
        scored = classifier.logreg_score(labeled, model).join(
            labeled.select("doc_id", "y"), "doc_id"
        )
        rows = scored.collect()
        pos = [r.quality_prob for r in rows if r.y == 1]
        neg = [r.quality_prob for r in rows if r.y == 0]
        assert min(pos) > max(neg)  # perfectly separable -> clean margin
        acc = sum(
            1
            for r in rows
            if (r.quality_prob >= 0.5) == (r.y == 1)
        ) / len(rows)
        assert acc == 1.0

    def test_score_out_of_sample(self, model, spark):
        unseen = spark.createDataFrame(
            [
                Row(doc_id=900, text="premium careful prose indeed"),
                Row(doc_id=901, text="spammy junk click here"),
            ]
        )
        got = {
            r.doc_id: r.quality_prob
            for r in classifier.logreg_score(unseen, model).collect()
        }
        assert got[900] > got[901]

    def test_hashed_pairs_shape(self, spark):
        df = spark.createDataFrame([Row(doc_id=1, text="a a b")])
        rows = classifier.hashed_token_pairs(df, n_features=64).collect()
        assert sum(r._cnt for r in rows) == 3
        assert all(0 <= r._b < 64 and r._ntok == 3 for r in rows)

    def test_validation(self, labeled):
        with pytest.raises(ValueError, match="iters"):
            classifier.logreg_train(labeled, "y", iters=0)
        with pytest.raises(ValueError, match="labeled"):
            classifier.logreg_train(labeled.filter("y = 5"), "y")
