"""Spill-aware conf sizing: turn (bytes, cluster shape) into the knobs
the 100 TB design depends on — `spark.sql.shuffle.partitions`,
`spark.sql.files.maxPartitionBytes`, and the AQE advisory sizes — so
partitions fit in executor task memory instead of spilling.

The arithmetic is the standard capacity model: a shuffle partition
should decode to ~target bytes (default 128 MiB); the partition count
is that size-derived count, floored at 2-3 waves per core (straggler
smoothing), capped so the driver's shuffle bookkeeping stays sane; when
the cap binds, the effective partition size is reported back instead of
silently growing. Scan-side `maxPartitionBytes` is sized from per-task
memory (executor memory x spark.memory.fraction / concurrent tasks)
divided by a decode-expansion factor, so a parquet split never inflates
past its task's share.
"""

from __future__ import annotations

import math

MIB = 1 << 20
GIB = 1 << 30

TARGET_SHUFFLE_PARTITION_BYTES = 128 * MIB
MAX_SHUFFLE_PARTITIONS = 200_000
WAVES_PER_CORE = 3
# parquet bytes expand this much decoded+deserialized in memory
# (column encodings + dictionary + JVM object overhead; conservative)
DECODE_EXPANSION = 4
SPARK_MEMORY_FRACTION = 0.6  # spark.memory.fraction default


def parse_mem(s: str) -> int:
    """'4g' / '512m' / '8gb' / '64G' / plain bytes -> bytes (Spark's
    JavaUtils byte-string grammar: optional k/m/g/t with optional
    trailing 'b')."""
    s = s.strip().lower()
    # trailing 'b' is legal after a unit letter ('8gb') AND after a bare
    # digit ('1024b' = 1024 bytes, per JavaUtils) — strip in both cases
    if s.endswith("b") and len(s) > 1 and (s[-2].isdigit() or s[-2] in "kmgt"):
        s = s[:-1]
    units = {"k": 1 << 10, "m": MIB, "g": GIB, "t": 1 << 40}
    if s and s[-1] in units:
        return int(float(s[:-1]) * units[s[-1]])
    return int(s)


def shuffle_partitions(
    shuffle_bytes: int,
    total_cores: int,
    target_partition_bytes: int = TARGET_SHUFFLE_PARTITION_BYTES,
    max_partitions: int = MAX_SHUFFLE_PARTITIONS,
) -> int:
    """Partition count for a shuffle of `shuffle_bytes`: size-derived,
    floored at WAVES_PER_CORE waves over the cluster, capped."""
    if shuffle_bytes < 0 or total_cores <= 0:
        raise ValueError("shuffle_bytes >= 0 and total_cores > 0 required")
    by_size = math.ceil(shuffle_bytes / target_partition_bytes)
    return max(1, min(max(by_size, WAVES_PER_CORE * total_cores), max_partitions))


def max_partition_bytes(
    executor_mem_bytes: int,
    cores_per_executor: int,
    expansion: int = DECODE_EXPANSION,
) -> int:
    """Scan split size such that one decoded split fits within a task's
    memory share: exec_mem * memory.fraction / cores / expansion,
    clamped to [16 MiB, 512 MiB] (below 16 MiB the per-file overheads
    dominate; above 512 MiB row-group parallelism suffers)."""
    if executor_mem_bytes <= 0 or cores_per_executor <= 0:
        raise ValueError("positive executor memory and cores required")
    per_task = executor_mem_bytes * SPARK_MEMORY_FRACTION / cores_per_executor
    return int(min(max(per_task / expansion, 16 * MIB), 512 * MIB))


def recommended_conf(
    input_bytes: int,
    executors: int,
    cores_per_executor: int,
    executor_mem_bytes: int,
    shuffle_ratio: float = 1.0,
) -> dict[str, str]:
    """One dict of conf strings for a job reading `input_bytes` with
    shuffles carrying ~`shuffle_ratio` x input (projection/filter
    usually push ratio well below 1; a wide explode pushes it above).

    Returned keys are plain Spark confs — apply with
    ``for k, v in conf.items(): spark.conf.set(k, v)`` (or builder
    .config). Includes the AQE switches the engine assumes: runtime
    coalescing makes the static partition count an upper bound, skew
    -join splitting bounds the straggler tail.
    """
    total_cores = executors * cores_per_executor
    shuffle_bytes = int(input_bytes * shuffle_ratio)
    n_shuffle = shuffle_partitions(shuffle_bytes, total_cores)
    eff_bytes = max(1, shuffle_bytes // n_shuffle)
    conf = {
        "spark.sql.shuffle.partitions": str(n_shuffle),
        "spark.sql.files.maxPartitionBytes": str(
            max_partition_bytes(executor_mem_bytes, cores_per_executor)
        ),
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": str(
            TARGET_SHUFFLE_PARTITION_BYTES
        ),
        # what one shuffle partition actually decodes to under the cap;
        # informational — callers alert when it exceeds task memory
        "sparkh3.effectiveShufflePartitionBytes": str(eff_bytes),
    }
    per_task = (
        executor_mem_bytes * SPARK_MEMORY_FRACTION / cores_per_executor
    )
    if eff_bytes * DECODE_EXPANSION > per_task:
        conf["sparkh3.spillRisk"] = (
            f"partition ~{eff_bytes // MIB} MiB decodes past the "
            f"~{int(per_task) // MIB} MiB task share; add executors or "
            "raise memory"
        )
    return conf
