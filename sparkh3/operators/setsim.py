"""Exact set-similarity self-join via prefix filtering (Chaudhuri et
al. ICDE'06 SSJoin; Bayardo et al. WWW'07 AllPairs): all document pairs
whose DISTINCT-token Jaccard similarity meets a threshold, with NO false
negatives — the exact counterpart to the probabilistic MinHash-LSH pass.

Why this shape at 100 TB: the candidate join keys on PREFIX tokens only.
Under one global token order (rarest first), a set of size n keeps a
prefix of n - ceil(t*n) + 1 tokens; two sets with Jaccard >= t MUST
share a prefix token (if the prefixes were disjoint, the intersection
would fit inside one set's suffix of ceil(t*n) - 1 tokens, too small to
reach t). Ordering by ascending document frequency makes those prefix
tokens the RAREST ones, so the equi-join fan-out per token is tiny —
the quadratic blow-up of joining on shared tokens collapses to the rare
tail, while stop-word-like tokens never generate candidates. Verification
then computes exact Jaccard on the two token arrays for surviving pairs
only. Thresholds are rational (p/q) and all prefix arithmetic is
integer, so the operator's decisions are engine-portable and the DuckDB
oracle (a brute-force cross join) matches exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .textops import tokens

__all__ = ["jaccard_similarity_join"]


def jaccard_similarity_join(
    df: DataFrame,
    threshold_p: int = 1,
    threshold_q: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """All unordered pairs (id_a < id_b) with distinct-token Jaccard
    >= threshold_p/threshold_q. Returns (id_a, id_b, n_common, jaccard)
    with jaccard rounded to 6 decimals.

    Stages: one tokenize -> distinct (id, token); global token document
    frequencies (partially aggregated); per-document rarity rank window;
    prefix equi-join (the only pair-producing step — fan-out follows
    rare-token frequencies, not set sizes); exact array verify on the
    candidates. Note the tokenizer maps an empty/whitespace-only text
    to the single '' token (a size-1 set, NOT dropped) — blank
    documents therefore pair with each other at jaccard 1.0, exactly
    like the oracle's tokenizer; filter blanks upstream if that is not
    wanted.
    """
    if not (0 < threshold_p <= threshold_q):
        raise ValueError(
            f"threshold must satisfy 0 < p <= q, got {threshold_p}/{threshold_q}"
        )
    p, q = threshold_p, threshold_q

    toks = df.select(
        F.col(id_col).alias("_id"),
        F.array_distinct(tokens(F.col(text_col))).alias("_set"),
    )
    flat = toks.select("_id", F.explode("_set").alias("_t"))
    dfreq = flat.groupBy("_t").agg(F.count("*").alias("_df"))
    # rarity rank inside each document under ONE global order (df asc,
    # token asc — total, deterministic); prefix keeps the rarest tokens
    rank = Window.partitionBy("_id").orderBy(
        F.col("_df").asc(), F.col("_t").asc()
    )
    ranked = (
        flat.join(dfreq, "_t")
        .withColumn("_r", F.row_number().over(rank))
        .withColumn("_n", F.count("*").over(Window.partitionBy("_id")))
    )
    # prefix length = n - ceil(p*n/q) + 1, all-integer: ceil(a/b) =
    # (a + b - 1) div b on non-negatives
    ceil_tn = (F.col("_n") * p + F.lit(q - 1)) / F.lit(q)
    prefix_len = F.col("_n") - F.floor(ceil_tn).cast("long") + F.lit(1)
    pref = ranked.filter(F.col("_r") <= prefix_len).select("_id", "_t")
    cand = (
        pref.alias("a")
        .join(pref.alias("b"), "_t")
        .filter(F.col("a._id") < F.col("b._id"))
        .select(
            F.col("a._id").alias("_ida"), F.col("b._id").alias("_idb")
        )
        .distinct()
    )
    sa = toks.select(
        F.col("_id").alias("_ida"), F.col("_set").alias("_seta")
    )
    sb = toks.select(
        F.col("_id").alias("_idb"), F.col("_set").alias("_setb")
    )
    inter = F.size(F.array_intersect("_seta", "_setb"))
    union = F.size("_seta") + F.size("_setb") - inter
    return (
        cand.join(sa, "_ida")
        .join(sb, "_idb")
        .withColumn("n_common", inter.cast("long"))
        # integer cross-multiplication: q*i >= p*u  <=>  i/u >= p/q
        .filter(F.col("n_common") * q >= F.lit(p) * union)
        .select(
            F.col("_ida").alias("id_a"),
            F.col("_idb").alias("id_b"),
            "n_common",
            F.round(
                F.col("n_common").cast("double") / union.cast("double"), 6
            ).alias("jaccard"),
        )
    )
