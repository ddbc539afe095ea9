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


def _shard_fingerprint(df: DataFrame) -> dict:
    row = df.select(
        F.count("*").alias("n"),
        F.coalesce(
            F.expr(
                "bit_xor(xxhash64(struct("
                + ", ".join(f"`{c}`" for c in df.columns)
                + ")))"
            ),
            F.lit(0),
        ).alias("h"),
    ).first()
    return {"rows": row["n"], "digest": int(row["h"])}


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
    sharded = input_df.withColumn(
        "_shard", F.pmod(F.xxhash64(F.col(shard_key)), F.lit(n_shards))
    ).persist()
    completed = 0
    for k in range(n_shards):
        ledger_file = ledger_dir / f"{k}.json"
        shard_df = sharded.filter(F.col("_shard") == k).drop("_shard")
        fp = _shard_fingerprint(shard_df)
        if ledger_file.exists():
            rec = json.loads(ledger_file.read_text())
            if rec["input_fingerprint"] == fp:
                continue  # resume: shard already done with identical input
        if fail_on_shard is not None and completed >= fail_on_shard:
            sharded.unpersist()
            raise RuntimeError(f"injected failure before shard {k}")
        t0 = time.time()
        out = transform(shard_df)
        out_path = root / f"shard={k}"
        out.write.mode("overwrite").parquet(str(out_path))
        rows_out = spark.read.parquet(str(out_path)).count()
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
    return spark.read.parquet(str(root / "shard=*"))


def stage_metrics(ckpt_root: str, stage: str) -> list[dict]:
    ledger_dir = Path(ckpt_root) / stage / "_ledger"
    out = []
    for p in sorted(ledger_dir.glob("*.json")):
        out.append(json.loads(p.read_text()))
    return out
