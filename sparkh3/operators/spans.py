"""Span-column operators for the interleaved documents table.

Per-row invariant (BASELINE.json input_hint): every pipeline must
preserve the spans sequence (kind, text, media_ref, order) exactly —
``span_fingerprint`` gives a canonical per-doc digest to assert it.

All span ops are native Column algebra (higher-order array functions) —
no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def extract_geometry(df: DataFrame, spans_col: str = "spans") -> DataFrame:
    """Pull (lat, lng) doubles from the first 'geo' span
    ("lat_e6,lng_e6" integer microdegrees in span.text)."""
    geo = F.filter(F.col(spans_col), lambda s: s["kind"] == F.lit("geo"))
    first = F.element_at(geo, 1)
    parts = F.split(first["text"], ",")
    return (
        df.withColumn("lat", F.element_at(parts, 1).cast("long") / F.lit(1000000.0))
        .withColumn("lng", F.element_at(parts, 2).cast("long") / F.lit(1000000.0))
    )


def span_fingerprint(spans_col: str = "spans") -> Column:
    """Canonical digest of the (kind, text, media_ref, order) sequence.
    Null fields encode as an explicit sentinel — concat_ws SKIPS nulls,
    which would make (text=NULL, media_ref='r') and (text='r',
    media_ref=NULL) collide and let exactly the field-shift corruption
    this digest exists to catch pass the invariant. (Sentinel \\x00
    never occurs in the span data model.)"""
    canon = F.transform(
        F.col(spans_col),
        lambda s: F.concat_ws(
            "\x1f",
            F.coalesce(s["kind"], F.lit("\x00")),
            F.coalesce(s["text"], F.lit("\x00")),
            F.coalesce(s["media_ref"], F.lit("\x00")),
        ),
    )
    return F.sha2(F.concat_ws("\x1e", canon), 256)


def span_stats(df: DataFrame, spans_col: str = "spans") -> DataFrame:
    """Per-doc span statistics — native higher-order functions."""
    c = F.col(spans_col)
    return (
        df.withColumn("n_spans", F.size(c))
        .withColumn(
            "n_text_spans",
            F.size(F.filter(c, lambda s: s["kind"] == F.lit("text"))),
        )
        .withColumn(
            "n_media_spans",
            F.size(F.filter(c, lambda s: s["kind"] == F.lit("media"))),
        )
        .withColumn(
            "text_len",
            F.aggregate(
                F.filter(c, lambda s: s["kind"] == F.lit("text")),
                F.lit(0),
                lambda acc, s: acc + F.length(s["text"]),
            ),
        )
    )
