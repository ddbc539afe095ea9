"""Exact edit-distance (Levenshtein) self-join via q-gram prefix
filtering (Ed-Join, Xiao/Wang/Lin VLDB'08; q-gram count bound from
Gravano et al. VLDB'01): all string pairs within edit distance tau,
with NO false negatives, without the all-pairs cross join.

Why this is exact: one edit operation (insert/delete/substitute)
destroys at most q of a string's distinct q-grams, so ed(s, t) <= tau
implies s and t share at least d_s - q*tau distinct grams (d_s = s's
distinct-gram count). By the prefix-filter principle (same lemma the
AllPairs set-similarity join uses — operators/setsim.py), any two
multisets forced to overlap in >= d - q*tau elements must collide
inside their first q*tau + 1 elements under ONE global element order.
Strings with d <= q*tau distinct grams get no such guarantee; they are
split off and paired brute-force against every length-compatible
string (a vanishing fraction — only strings shorter than ~q*(tau+1)
characters land there).

Why this shape at 100 TB: the candidate generator equi-joins on PREFIX
grams only, and the global order is ascending document frequency, so
the join fan-out follows the RAREST grams of each string — hot grams
("e ", "th") never produce candidates. Explode volume is bounded at
q*tau + 1 rows per string regardless of string length. Verification
(native JVM levenshtein) runs only on surviving candidates after the
|len(s) - len(t)| <= tau length band. No UDF anywhere; the whole
operator is shuffle-bounded by the prefix join.

Reference analog: H3-Pandas has no string operators — this extends the
dedup family (textops.py minhash/simhash, setsim.py exact Jaccard)
with the character-level near-dup join an LLM-corpus pipeline needs
for title/URL canonicalization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["edit_distance_join"]


def _distinct_qgrams(col, q: int):
    """Distinct q-grams of a string as an array; strings shorter than q
    contribute their whole text as the single gram (substring truncates
    at the end in both Spark and DuckDB)."""
    return F.array_distinct(
        F.transform(
            F.sequence(
                F.lit(1), F.greatest(F.length(col) - F.lit(q - 1), F.lit(1))
            ),
            lambda i: F.substring(col, i, q),
        )
    )


def edit_distance_join(
    df: DataFrame,
    max_dist: int = 2,
    q: int = 2,
    id_col: str = "sid",
    str_col: str = "s",
) -> DataFrame:
    """All unordered pairs (id_a < id_b) of rows whose strings are
    within Levenshtein distance ``max_dist``. Returns
    (id_a, id_b, dist). Exact: prefix-gram candidates for long strings,
    brute-force block for strings with <= q*max_dist distinct grams,
    both verified with the native JVM levenshtein.

    Caller contract: ids unique. Identical strings under different ids
    are legitimate distance-0 pairs; dedupe upstream if the input is
    multiplicity-heavy (the lane does) or the output is row-quadratic
    per repeated string.
    """
    if max_dist < 0:
        raise ValueError(f"max_dist must be >= 0, got {max_dist}")
    if q < 1:
        raise ValueError(f"q must be >= 1, got {q}")
    tau = max_dist
    prefix_size = q * tau + 1

    base = df.select(
        F.col(id_col).alias("_id"),
        F.col(str_col).alias("_s"),
        _distinct_qgrams(F.col(str_col), q).alias("_grams"),
    ).withColumn("_d", F.size("_grams"))

    longs = base.filter(F.col("_d") > q * tau)
    shorts = base.filter(F.col("_d") <= q * tau).select(
        F.col("_id").alias("_sid"),
        F.col("_s").alias("_ss"),
        F.length("_s").alias("_slen"),
    )

    flat = longs.select("_id", F.explode("_grams").alias("_g"))
    gfreq = flat.groupBy("_g").agg(F.count("*").alias("_gf"))
    # one global gram order: document frequency asc, gram asc (total,
    # deterministic) — the prefix keeps each string's rarest grams
    rank = Window.partitionBy("_id").orderBy(
        F.col("_gf").asc(), F.col("_g").asc()
    )
    pref = (
        flat.join(gfreq, "_g")
        .withColumn("_r", F.row_number().over(rank))
        .filter(F.col("_r") <= prefix_size)
        .select("_id", "_g")
    )
    cand_long = (
        pref.alias("a")
        .join(pref.alias("b"), "_g")
        .filter(F.col("a._id") < F.col("b._id"))
        .select(F.col("a._id").alias("_ida"), F.col("b._id").alias("_idb"))
        .distinct()
    )

    sides = base.select("_id", "_s", F.length("_s").alias("_len"))
    sa = sides.select(
        F.col("_id").alias("_ida"),
        F.col("_s").alias("_sa"),
        F.col("_len").alias("_lena"),
    )
    sb = sides.select(
        F.col("_id").alias("_idb"),
        F.col("_s").alias("_sb"),
        F.col("_len").alias("_lenb"),
    )
    verified_long = (
        cand_long.join(sa, "_ida")
        .join(sb, "_idb")
        .filter(F.abs(F.col("_lena") - F.col("_lenb")) <= tau)
        .withColumn("dist", F.levenshtein("_sa", "_sb"))
        .filter(F.col("dist") <= tau)
        .select("_ida", "_idb", "dist")
    )

    # short-gram block: no prefix guarantee, so pair each short string
    # with EVERY length-compatible string (short strings are <=
    # ~q*(tau+1) chars, so the length band keeps this block tiny); the
    # broadcast is dimension-sized by construction
    short_pairs = (
        F.broadcast(shorts)
        .join(
            sides,
            (F.abs(F.col("_slen") - F.col("_len")) <= tau)
            & (F.col("_sid") != F.col("_id")),
        )
        .withColumn("dist", F.levenshtein("_ss", "_s"))
        .filter(F.col("dist") <= tau)
        .select(
            F.least("_sid", "_id").alias("_ida"),
            F.greatest("_sid", "_id").alias("_idb"),
            "dist",
        )
        .distinct()
    )

    return (
        verified_long.unionByName(short_pairs)
        .distinct()
        .select(
            F.col("_ida").alias("id_a"),
            F.col("_idb").alias("id_b"),
            F.col("dist").cast("long").alias("dist"),
        )
    )
