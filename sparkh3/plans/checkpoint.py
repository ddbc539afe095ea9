"""Per-partition checkpointed stages with a lineage ledger (north rule:
"checkpoints per-partition with lineage + row-count metrics so it
resumes mid-run").

A stage splits its input into deterministic shards (pmod(xxhash64(key),
n_shards)), runs the transform shard-by-shard, and writes each shard's
output plus a ledger record:

    <ckpt_root>/<stage>/shard=<k>/       parquet output
    <ckpt_root>/<stage>/_ledger/<k>.json {shard, rows_in, rows_out,
                                          wall_s, input_fingerprint,
                                          lineage {...}}

On re-run, shards whose ledger record exists with a matching input
fingerprint are skipped — the stage resumes exactly where it died. The
fingerprint is a shard-level content digest (count + xor of row hashes),
so stale checkpoints from changed inputs re-run instead of being reused.

At cluster scale each shard is a partition-range job; the ledger lives
on shared storage. The driver-side loop is over shards (bounded, e.g.
32-1024), not rows.
"""

from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _all_shard_fingerprints(sharded: DataFrame, n_shards: int) -> dict[int, dict]:
    """Fingerprint every shard in ONE groupBy pass — not one full input
    scan per shard. Digest = (count, xor of row hashes, SUM of folded
    row hashes): xor alone cancels rows with even multiplicity (a shard
    of [A,A] and one of [B,B] share count 2 and xor 0), so the
    order-independent sum is carried as the multiplicity-sensitive
    component (exact decimal — no overflow at any shard size)."""
    data_cols = [c for c in sharded.columns if c != "_shard"]
    h_expr = (
        "xxhash64(struct(" + ", ".join(f"`{c}`" for c in data_cols) + "))"
    )
    rows = (
        sharded.groupBy("_shard")
        .agg(
            F.count("*").alias("n"),
            F.coalesce(F.expr(f"bit_xor({h_expr})"), F.lit(0)).alias("h"),
            F.coalesce(
                F.sum(
                    F.expr(f"pmod({h_expr}, 2147483648)").cast(
                        "decimal(28,0)"
                    )
                ),
                F.lit(0),
            ).alias("s"),
        )
        .collect()
    )
    fps = {
        int(r["_shard"]): {
            "rows": r["n"],
            "digest": int(r["h"]),
            "sum": int(r["s"]),
        }
        for r in rows
    }
    for k in range(n_shards):
        fps.setdefault(k, {"rows": 0, "digest": 0, "sum": 0})
    return fps


def run_stage(
    input_df: DataFrame,
    stage: str,
    transform: Callable[[DataFrame], DataFrame],
    ckpt_root: str,
    shard_key: str,
    n_shards: int = 8,
    fail_on_shard: int | None = None,
) -> DataFrame:
    """Run `transform` per shard with checkpoint/resume.

    `fail_on_shard` injects a failure after that many completed shards —
    used by the resume test.
    """
    spark = input_df.sparkSession
    root = Path(ckpt_root) / stage
    ledger_dir = root / "_ledger"
    ledger_dir.mkdir(parents=True, exist_ok=True)
    # a resume against a checkpoint laid down with a DIFFERENT shard
    # count would both mis-route the fingerprint comparison and leave
    # stale shard=<k> dirs (k >= n_shards) that the final read would
    # double-count — reject it up front
    for p in ledger_dir.glob("*.json"):
        prev = json.loads(p.read_text())["lineage"]["n_shards"]
        if prev != n_shards:
            raise ValueError(
                f"checkpoint stage '{stage}' was laid down with "
                f"n_shards={prev}, re-run requested n_shards={n_shards} "
                "— clear the stage directory or keep the shard count"
            )
        break
    sharded = input_df.withColumn(
        "_shard", F.pmod(F.xxhash64(F.col(shard_key)), F.lit(n_shards))
    ).persist()
    fps = _all_shard_fingerprints(sharded, n_shards)
    completed = 0
    for k in range(n_shards):
        ledger_file = ledger_dir / f"{k}.json"
        shard_df = sharded.filter(F.col("_shard") == k).drop("_shard")
        fp = fps[k]
        if ledger_file.exists():
            rec = json.loads(ledger_file.read_text())
            if rec["input_fingerprint"] == fp:
                continue  # resume: shard already done with identical input
        if fail_on_shard is not None and completed >= fail_on_shard:
            sharded.unpersist()
            raise RuntimeError(f"injected failure before shard {k}")
        t0 = time.time()
        out = transform(shard_df).persist()
        rows_out = out.count()
        out_path = root / f"shard={k}"
        out.write.mode("overwrite").parquet(str(out_path))
        out.unpersist()
        # the ledger's rows_out must describe the DURABLE output: verify
        # the written files actually contain the counted rows before
        # recording the shard as done (a partial/failed write must not
        # be skipped as complete on resume)
        written = spark.read.parquet(str(out_path)).count()
        if written != rows_out:
            raise RuntimeError(
                f"checkpoint stage '{stage}' shard {k}: wrote {written} "
                f"rows but transform produced {rows_out}"
            )
        rec = {
            "shard": k,
            "rows_in": fp["rows"],
            "rows_out": rows_out,
            "wall_s": round(time.time() - t0, 3),
            "input_fingerprint": fp,
            "lineage": {
                "stage": stage,
                "shard_key": shard_key,
                "n_shards": n_shards,
                "transform": getattr(transform, "__name__", str(transform)),
            },
            "ts": time.time(),
        }
        tmp = ledger_dir / f"{k}.json.tmp"
        tmp.write_text(json.dumps(rec))
        tmp.replace(ledger_file)
        completed += 1
    sharded.unpersist()
    # explicit shard list, not a glob: a glob would adopt stale
    # shard dirs left by runs with other parameters
    return spark.read.parquet(
        *[str(root / f"shard={k}") for k in range(n_shards)]
    )


def stage_metrics(ckpt_root: str, stage: str) -> list[dict]:
    ledger_dir = Path(ckpt_root) / stage / "_ledger"
    out = []
    for p in sorted(ledger_dir.glob("*.json")):
        out.append(json.loads(p.read_text()))
    return out
