"""Training-data text operators over the documents table: deduplication
(exact, MinHash-LSH, SimHash), n-gram Jaccard, language-ID heuristic,
quality scoring, token counting, fingerprinting.

Everything that a DuckDB oracle can replicate uses only deterministic
native column algebra (split/filter/length arithmetic). MinHash/SimHash
use Spark's native xxhash64 (JVM, codegen) — deterministic within the
engine, verified by property tests instead of a SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

STOPWORDS = {
    "en": ["the", "a", "of", "and", "to"],
    "data": ["data", "table", "row", "column", "key"],
    "query": ["query", "join", "filter", "sort", "group"],
}


def tokens(text: Column) -> Column:
    """Whitespace tokens (native)."""
    return F.split(F.trim(text), " +")


def token_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    return df.withColumn("n_tokens", F.size(tokens(F.col(text_col))))


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length/word statistics + a composite quality score — all native,
    SQL-replicable arithmetic."""
    t = F.col(text_col)
    toks = tokens(t)
    n_tok = F.size(toks)
    n_chars = F.length(t)
    avg_word_len = (n_chars - n_tok + 1).cast("double") / n_tok
    uniq_ratio = F.size(F.array_distinct(toks)).cast("double") / n_tok
    return (
        df.withColumn("n_chars_q", n_chars)
        .withColumn("n_tokens", n_tok)
        .withColumn("avg_word_len", F.round(avg_word_len, 6))
        .withColumn("uniq_token_ratio", F.round(uniq_ratio, 6))
        .withColumn(
            "quality",
            F.round(
                F.least(n_tok.cast("double") / F.lit(50.0), F.lit(1.0))
                * uniq_ratio,
                6,
            ),
        )
    )


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-ratio language/domain heuristic — native, SQL-replicable."""
    toks = tokens(F.col(text_col))
    scores = {}
    for name, words in STOPWORDS.items():
        arr = F.array(*[F.lit(w) for w in words])
        scores[name] = F.size(F.filter(toks, lambda x: F.array_contains(arr, x)))
    df = df.withColumn("score_en", scores["en"])
    df = df.withColumn("score_data", scores["data"])
    df = df.withColumn("score_query", scores["query"])
    guess = (
        F.when(
            (F.col("score_en") >= F.col("score_data"))
            & (F.col("score_en") >= F.col("score_query")),
            F.lit("en"),
        )
        .when(F.col("score_data") >= F.col("score_query"), F.lit("data"))
        .otherwise(F.lit("query"))
    )
    return df.withColumn("lang_guess", guess)


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact duplicate groups: one keeper (min id) per distinct text.

    Hash-groupBy — partial aggregation map-side; at 100 TB this is the
    canonical first dedup pass (shuffle keyed on the text hash).
    """
    return df.groupBy(text_col).agg(
        F.min(id_col).alias("keeper_id"),
        F.count("*").alias("dup_count"),
    )


def ngrams(text: Column, n: int) -> Column:
    """Word n-gram shingles (native: sequence + slice)."""
    toks = tokens(text)
    return F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
    )


def doc_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """64-bit content fingerprint (native xxhash64)."""
    return df.withColumn("fingerprint", F.xxhash64(F.col(text_col)))


def minhash_signature(text: Column, n_hashes: int = 16, shingle_n: int = 3) -> Column:
    """MinHash signature: per hash j, min over shingles of
    xxhash64(shingle, seed=j). Native higher-order functions, no UDF."""
    sh = ngrams(text, shingle_n)

    def _hash_for(seed: int):
        return lambda s: F.xxhash64(s, F.lit(seed))

    mins = [
        F.array_min(F.transform(sh, _hash_for(j))) for j in range(n_hashes)
    ]
    return F.array(*mins)


def minhash_lsh_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 16,
    bands: int = 4,
    jaccard_threshold: float = 0.5,
    shingle_n: int = 3,
) -> DataFrame:
    """Near-duplicate pairs via MinHash banding + exact n-gram Jaccard
    verification. Returns (id_a, id_b, jaccard) with id_a < id_b.

    Scale shape: signature is a narrow map; banding explodes to
    `bands` rows/doc; the candidate self-join shuffles only on band
    buckets (hot buckets are bounded by band width); verification is a
    set-intersection on the joined pair only.
    """
    rows_per_band = n_hashes // bands

    def _hash_for(seed: int):
        return lambda s: F.xxhash64(s, F.lit(seed))

    # materialize shingles once; the 16 per-seed mins reference the column
    # (vs inlining the split/slice chain 16x into each array_min)
    base = (
        df.select(F.col(id_col).alias("_id"), F.col(text_col).alias("_text"))
        .withColumn("_shingles", ngrams(F.col("_text"), shingle_n))
        .withColumn(
            "_sig",
            F.array(
                *[
                    F.array_min(F.transform(F.col("_shingles"), _hash_for(j)))
                    for j in range(n_hashes)
                ]
            ),
        )
        .drop("_shingles")
    )
    banded = base.withColumn(
        "_band", F.explode(F.array(*[F.lit(b) for b in range(bands)]))
    ).withColumn(
        "_bucket",
        F.xxhash64(
            F.concat_ws(
                ",",
                F.col("_band"),
                *[
                    F.element_at(F.col("_sig"), F.col("_band") * rows_per_band + i + 1)
                    for i in range(rows_per_band)
                ],
            )
        ),
    )
    a = banded.select(
        F.col("_id").alias("id_a"), F.col("_text").alias("_ta"), "_bucket"
    )
    b = banded.select(
        F.col("_id").alias("id_b"), F.col("_text").alias("_tb"), "_bucket"
    )
    pairs = (
        a.join(b, "_bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "_ta", "_tb")
        .distinct()
    )
    ga = ngrams(F.col("_ta"), shingle_n)
    gb = ngrams(F.col("_tb"), shingle_n)
    inter = F.size(F.array_intersect(F.array_distinct(ga), F.array_distinct(gb)))
    union = F.size(F.array_union(ga, gb))
    out = pairs.withColumn(
        "jaccard", F.round(inter.cast("double") / union, 6)
    ).filter(F.col("jaccard") >= jaccard_threshold)
    return out.select("id_a", "id_b", "jaccard")


def simhash(text: Column, shingle_n: int = 2, bits: int = 32) -> Column:
    """SimHash over shingle hashes — native: per bit, sign of the sum of
    bit contributions (+1/-1) across shingles. Prefer simhash_from_hashes
    over a materialized hash column in pipelines (avoids re-evaluating
    the shingle chain per bit)."""
    sh = ngrams(text, shingle_n)
    return simhash_from_hashes(F.transform(sh, lambda s: F.xxhash64(s)), bits)


def simhash_from_hashes(hashes: Column, bits: int = 32) -> Column:
    def _merge_for(bit: int):
        mask = 1 << bit
        return lambda acc, h: acc + F.when(
            h.bitwiseAND(F.lit(mask)) != 0, F.lit(1)
        ).otherwise(F.lit(-1))

    bit_cols = []
    for b in range(bits):
        contrib = F.aggregate(hashes, F.lit(0).cast("long"), _merge_for(b))
        bit_cols.append(
            F.when(contrib > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
            * F.lit(1 << b).cast("long")
        )
    out = bit_cols[0]
    for c in bit_cols[1:]:
        out = out + c
    return out


def simhash_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    bits: int = 32,
) -> DataFrame:
    """Near-dup pairs with SimHash Hamming distance <= max_hamming,
    candidate-joined on 4 hash bands (each band exact-matches for any
    pair within Hamming distance 3 of a 32-bit hash)."""
    base = (
        df.select(F.col(id_col).alias("_id"), F.col(text_col).alias("_text"))
        .withColumn(
            "_hashes",
            F.transform(ngrams(F.col("_text"), 2), lambda s: F.xxhash64(s)),
        )
        .withColumn("_sh", simhash_from_hashes(F.col("_hashes"), bits=bits))
        .drop("_text", "_hashes")
    )
    band_w = bits // 4
    banded = base.withColumn(
        "_band", F.explode(F.array(*[F.lit(i) for i in range(4)]))
    ).withColumn(
        "_key",
        F.concat_ws(
            ":",
            F.col("_band"),
            F.expr(f"shiftrightunsigned(_sh, _band * {band_w})").bitwiseAND(
                F.lit((1 << band_w) - 1)
            ),
        ),
    )
    a = banded.select(F.col("_id").alias("id_a"), F.col("_sh").alias("_sa"), "_key")
    b = banded.select(F.col("_id").alias("id_b"), F.col("_sh").alias("_sb"), "_key")
    pairs = (
        a.join(b, "_key")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "_sa", "_sb")
        .distinct()
    )
    ham = F.bit_count(F.col("_sa").bitwiseXOR(F.col("_sb")))
    return (
        pairs.withColumn("hamming", ham)
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
