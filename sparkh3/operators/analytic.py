"""Skyline (Pareto-frontier) query — Börzsönyi/Kossmann/Stocker,
ICDE 2001: the rows not dominated by any other row, where "a dominates
b" means a is no worse on every criterion and strictly better on at
least one. The canonical multi-criteria shortlist operator (cheapest
AND largest, highest-quality AND shortest, ...) that SQL can only
express as a quadratic NOT EXISTS.

Why this shape at 100 TB: dominance is checked in two prune stages.
Stage 1 computes the LOCAL skyline of every partition with a
vectorized NumPy scan — sound because any global-skyline row is also a
local-skyline row of its partition (a dominator somewhere implies a
dominator in some partition... of itself), so stage 1 only ever drops
globally-dominated rows. The per-partition scan sorts lexicographically
(a dominator always sorts before its victim) and tests each chunk
against the running frontier, so its cost tracks the frontier size,
not n². Stage 2 runs the same scan once over the union of local
skylines — for realistic correlated data the frontier is tiny (O(log n)
expected for independent dimensions), so the finalize stage is a
single small task. Anti-correlated worst cases degrade to a large
frontier, not to a wrong answer (documented caveat: stage 2 is
single-task by design; shard it with a grid partitioner if a frontier
ever exceeds one executor's memory).
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

__all__ = ["skyline"]

_CHUNK = 512


def _frontier_indices(vals: np.ndarray) -> np.ndarray:
    """Indices of the non-dominated rows of an all-minimize matrix.
    Lexicographic sort guarantees any dominator of row r appears before
    r, so one forward pass against the running frontier is exact.
    Identical rows never dominate each other (no strict coordinate) and
    are all kept."""
    n = vals.shape[0]
    if n == 0:
        return np.empty(0, dtype=np.int64)
    order = np.lexsort(vals.T[::-1])
    sv = vals[order]
    front = np.empty((0, vals.shape[1]), dtype=vals.dtype)
    keep_sorted: list[np.ndarray] = []
    for lo in range(0, n, _CHUNK):
        chunk = sv[lo : lo + _CHUNK]
        if front.shape[0]:
            le_all = (front[:, None, :] <= chunk[None, :, :]).all(axis=2)
            lt_any = (front[:, None, :] < chunk[None, :, :]).any(axis=2)
            dominated = (le_all & lt_any).any(axis=0)
        else:
            dominated = np.zeros(chunk.shape[0], dtype=bool)
        # resolve intra-chunk dominance among the still-alive rows
        alive = np.flatnonzero(~dominated)
        if alive.size:
            sub = chunk[alive]
            le_all = (sub[:, None, :] <= sub[None, :, :]).all(axis=2)
            lt_any = (sub[:, None, :] < sub[None, :, :]).any(axis=2)
            dom_in = (le_all & lt_any).any(axis=0)
            alive = alive[~dom_in]
        mask = np.zeros(chunk.shape[0], dtype=bool)
        mask[alive] = True
        keep_sorted.append(mask)
        if alive.size:
            survivors = chunk[alive]
            front = np.concatenate([front, survivors])
    keep = np.concatenate(keep_sorted)
    return order[np.flatnonzero(keep)]


def skyline(
    df: DataFrame,
    minimize: Sequence[str] = (),
    maximize: Sequence[str] = (),
) -> DataFrame:
    """Rows of ``df`` not dominated under the given criteria (at least
    one of minimize/maximize required; other columns ride along).
    Exact; duplicates of a frontier point are all kept. A NULL
    criterion value is incomparable (it becomes NaN, every comparison
    false): the row is never dominated and never dominates — exactly
    the SQL ``NOT EXISTS`` oracle's three-valued-logic behavior."""
    crit = list(minimize) + list(maximize)
    if not crit:
        raise ValueError("skyline needs at least one criterion column")
    missing = [c for c in crit if c not in df.columns]
    if missing:
        raise ValueError(f"criterion columns not in DataFrame: {missing}")
    n_min = len(minimize)
    schema = df.schema

    def prune(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        parts = [b for b in batches if len(b)]
        if not parts:
            return
        pdf = pd.concat(parts, ignore_index=True)
        vals = pdf[crit].to_numpy(dtype=np.float64, copy=True)
        vals[:, n_min:] *= -1.0  # maximize -> minimize
        yield pdf.iloc[_frontier_indices(vals)]

    local = df.mapInPandas(prune, schema=schema)
    # finalize: one pass over the (small) union of local frontiers.
    # repartition(1), NOT coalesce(1): coalesce is a narrow dependency
    # that would collapse stage 1 into the single finalize task,
    # serializing the per-partition scans; the shuffle barrier keeps
    # stage 1 parallel and moves only the local frontiers
    return local.repartition(1).mapInPandas(prune, schema=schema)
