"""Custom stateful streaming operator: continuously-maintained per-cell
accumulators via ``applyInPandasWithState`` (the Structured Streaming
shape for state that windowed aggregation can't express — here a
monotone running total per H3 cell across micro-batches, emitted as an
update stream).

State is keyed by the cell id, so at cluster scale it shards with the
shuffle partitioning of the key and checkpoints with the query — the
same durability story as the batch layer's ledger.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from .. import functions as H3F

_OUT_SCHEMA = StructType(
    [
        StructField("cell", StringType()),
        StructField("n_total", LongType()),
        StructField("sum_value", DoubleType()),
    ]
)
_STATE_SCHEMA = StructType(
    [StructField("n", LongType()), StructField("s", DoubleType())]
)


def stateful_cell_totals(
    stream: DataFrame,
    resolution: int,
    lat_col: str = "lat",
    lng_col: str = "lng",
    value_col: str = "value",
) -> DataFrame:
    """Per-cell running (count, sum) maintained across micro-batches.

    Emits one update row per cell per batch in which it received data —
    i.e. the current lifetime totals, not the batch deltas (what a
    windowed agg cannot express without re-reading history).
    """
    h3_col = f"h3_{resolution:02d}"
    cells = stream.withColumn(
        h3_col,
        H3F.latlng_to_cell_udf(resolution)(F.col(lat_col), F.col(lng_col)),
    ).select(F.col(h3_col).alias("cell"), F.col(value_col).alias("value"))

    def update(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (cell,) = key
        n, s = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            s += float(pdf["value"].sum())
        state.update((n, s))
        yield pd.DataFrame(
            {"cell": [cell], "n_total": [n], "sum_value": [s]}
        )

    return cells.groupBy("cell").applyInPandasWithState(
        update,
        _OUT_SCHEMA,
        _STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )
